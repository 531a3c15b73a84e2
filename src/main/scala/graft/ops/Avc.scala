package graft.ops

/** Pure-JVM H.264/AVC sequence-parameter-set (SPS) metadata: an
  * exp-Golomb bit-reader over the RBSP (emulation-prevention bytes
  * removed) extracting profile, level, and the CODED picture
  * dimensions including frame cropping — no slice/frame decode (the
  * JDK ships no H.264 codec). Combined with the [[Mp4]] box walk
  * (the avcC sample-entry box carries the SPS verbatim), video
  * tracks report their real bitstream dimensions/profile rather than
  * the container's display hints.
  *
  * SPS grammar (ITU-T H.264 §7.3.2.1.1): profile_idc u(8),
  * constraint flags u(8), level_idc u(8), then ue(v)/se(v)
  * exp-Golomb fields; width = (pic_width_in_mbs_minus1+1)·16 −
  * (crop_left+crop_right)·CropUnitX, height = (2−frame_mbs_only)·
  * (pic_height_in_map_units_minus1+1)·16 − (crop_top+crop_bottom)·
  * CropUnitY, with crop units 2/2 for the 4:2:0 chroma format
  * (§7.4.2.1.1). High-profile branches (chroma_format_idc, bit
  * depths, scaling lists) are parsed and skipped correctly. */
object Avc {

  final case class SpsInfo(profileIdc: Int, levelIdc: Int, width: Int,
                          height: Int, frameMbsOnly: Boolean)

  /** MSB-first bit reader over an RBSP byte array. Reads past the end
    * raise; callers catch and map to None (truncated NAL). */
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteI = pos >> 3
        if (byteI >= b.length) throw new IndexOutOfBoundsException
        v = (v << 1) | ((b(byteI) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    /** ue(v): count leading zeros, read that many more bits. */
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 31) throw new IndexOutOfBoundsException
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    /** se(v): signed mapping (k+1)/2 with alternating sign. */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Strip emulation-prevention bytes: 00 00 03 → 00 00 (§7.4.1). */
  private def rbsp(b: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length - from)
    var i = from
    var zeros = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      if (zeros >= 2 && v == 3) zeros = 0 // skip the emulation byte
      else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private val HighProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** Parse an SPS NAL (with or without its 1-byte NAL header; both
    * accepted — a leading byte whose nal_unit_type is 7 is skipped).
    * None when the bits don't parse or yield non-positive dimensions.
    * NOTE the SPS grammar has no magic number, so arbitrary bytes CAN
    * decode to a syntactically-valid SPS — callers must establish
    * SPS-ness structurally (here: extraction from an avcC record,
    * [[spsFromAvcC]]); the parser's guarantee is totality (never
    * throws) plus exactness on real SPS bits. */
  def parseSps(nal: Array[Byte]): Option[SpsInfo] = {
    if (nal == null || nal.length < 4) return None
    val start = if ((nal(0) & 0x1f) == 7 && (nal(0) & 0x80) == 0) 1 else 0
    try {
      val r = new BitReader(rbsp(nal, start))
      val profile = r.u(8)
      r.u(8) // constraint flags + reserved
      val level = r.u(8)
      r.ue() // seq_parameter_set_id
      var chromaFormat = 1 // 4:2:0 default for non-high profiles
      if (HighProfiles(profile)) {
        chromaFormat = r.ue()
        if (chromaFormat == 3) r.u(1) // separate_colour_plane_flag
        r.ue(); r.ue() // bit_depth_luma/chroma_minus8
        r.u(1) // qpprime_y_zero_transform_bypass
        if (r.u(1) == 1) { // seq_scaling_matrix_present
          val n = if (chromaFormat != 3) 8 else 12
          var i = 0
          while (i < n) {
            if (r.u(1) == 1) { // seq_scaling_list_present[i]
              val size = if (i < 6) 16 else 64
              var last = 8; var next = 8; var j = 0
              while (j < size) {
                if (next != 0) next = (last + r.se() + 256) % 256
                if (next != 0) last = next
                j += 1
              }
            }
            i += 1
          }
        }
      }
      r.ue() // log2_max_frame_num_minus4
      val pocType = r.ue()
      if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
      else if (pocType == 1) {
        r.u(1); r.se(); r.se()
        val n = r.ue()
        var i = 0
        while (i < n) { r.se(); i += 1 }
      }
      r.ue() // max_num_ref_frames
      r.u(1) // gaps_in_frame_num_value_allowed
      val widthMbs = r.ue() + 1
      val heightMapUnits = r.ue() + 1
      val frameMbsOnly = r.u(1) == 1
      if (!frameMbsOnly) r.u(1) // mb_adaptive_frame_field_flag
      r.u(1) // direct_8x8_inference_flag
      var cl = 0; var cr = 0; var ct = 0; var cb = 0
      if (r.u(1) == 1) { // frame_cropping_flag
        cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
      }
      // crop units (§7.4.2.1.1): 4:2:0 → x=2, y=2·(2−frame_mbs_only);
      // 4:2:2 → x=2,y=1·…; 4:4:4/monochrome → x=1
      val cux = if (chromaFormat == 1 || chromaFormat == 2) 2 else 1
      val cuy = (if (chromaFormat == 1) 2 else 1) * (if (frameMbsOnly) 1 else 2)
      val w = widthMbs * 16 - (cl + cr) * cux
      val h = (if (frameMbsOnly) 1 else 2) * heightMapUnits * 16 - (ct + cb) * cuy
      if (w <= 0 || h <= 0) None
      else Some(SpsInfo(profile, level, w, h, frameMbsOnly))
    } catch {
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------------------
  // Minimal writer — test/oracle fixture synthesis.
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def u(v: Int, n: Int): BitWriter = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
      this
    }
    def ue(v: Int): BitWriter = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(0, len - 1); u(k, len)
    }
    /** rbsp_trailing_bits: stop bit + zero-pad to a byte boundary. */
    def trailing(): Array[Byte] = {
      u(1, 1)
      if (nBits != 0) { cur <<= (8 - nBits); out.write(cur) }
      out.toByteArray
    }
  }

  /** Minimal Baseline-style SPS for arbitrary EVEN dimensions (coded
    * size rounds up to 16, the remainder expressed as right/bottom
    * cropping — exactly how real encoders emit e.g. 1920×1080).
    * Emulation prevention is NOT needed: every multi-byte run this
    * writer can emit contains a set bit in each byte pair (profile
    * 66/77, level ≥ 10, small ue fields) — asserted defensively. */
  def buildSps(width: Int, height: Int, profileIdc: Int = 66,
               levelIdc: Int = 30, withNalHeader: Boolean = true): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      "even dimensions required (4:2:0 crop units)")
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    val cr = (wMbs * 16 - width) / 2
    val cb = (hMbs * 16 - height) / 2
    val w = new BitWriter
    w.u(profileIdc, 8)
    w.u(0, 8) // constraint flags
    w.u(levelIdc, 8)
    w.ue(0) // seq_parameter_set_id
    if (HighProfiles(profileIdc)) {
      w.ue(1) // chroma_format_idc 4:2:0
      w.ue(0); w.ue(0) // bit_depth_luma/chroma_minus8
      w.u(0, 1) // qpprime_y_zero_transform_bypass
      w.u(0, 1) // seq_scaling_matrix_present
    }
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(2) // pic_order_cnt_type 2 (no further POC fields)
    w.ue(1) // max_num_ref_frames
    w.u(0, 1) // gaps_in_frame_num
    w.ue(wMbs - 1)
    w.ue(hMbs - 1)
    w.u(1, 1) // frame_mbs_only_flag
    w.u(1, 1) // direct_8x8_inference_flag
    if (cr > 0 || cb > 0) {
      w.u(1, 1) // frame_cropping_flag
      w.ue(0); w.ue(cr); w.ue(0); w.ue(cb)
    } else w.u(0, 1)
    w.u(0, 1) // vui_parameters_present_flag
    val body = w.trailing()
    // defensive: this writer must never need emulation prevention
    var i = 0
    while (i + 2 < body.length) {
      require(!(body(i) == 0 && body(i + 1) == 0 && (body(i + 2) & 0xfc) == 0),
        "writer produced a start-code-like run; add emulation prevention")
      i += 1
    }
    if (withNalHeader) Array(0x67.toByte) ++ body else body
  }

  /** avcC (AVCDecoderConfigurationRecord, ISO 14496-15 §5.3.3.1)
    * wrapping one SPS and zero PPS — the box payload the MP4 writer
    * embeds in its avc1 sample entry. */
  def buildAvcC(sps: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val body = if ((sps(0) & 0x1f) == 7) sps else Array(0x67.toByte) ++ sps
    out.write(1) // configurationVersion
    out.write(body(1)) // AVCProfileIndication
    out.write(body(2)) // profile_compatibility
    out.write(body(3)) // AVCLevelIndication
    out.write(0xff) // 6 reserved bits + lengthSizeMinusOne=3
    out.write(0xe1) // 3 reserved bits + numOfSequenceParameterSets=1
    out.write((body.length >> 8) & 0xff)
    out.write(body.length & 0xff)
    out.write(body, 0, body.length)
    out.write(0) // numOfPictureParameterSets
    out.toByteArray
  }

  /** First SPS NAL inside an avcC payload, if well-formed. */
  def spsFromAvcC(avcc: Array[Byte]): Option[Array[Byte]] = {
    if (avcc == null || avcc.length < 8 || avcc(0) != 1) return None
    val n = avcc(5) & 0x1f
    if (n < 1) return None
    val len = ((avcc(6) & 0xff) << 8) | (avcc(7) & 0xff)
    if (8 + len > avcc.length) return None
    Some(java.util.Arrays.copyOfRange(avcc, 8, 8 + len))
  }
}
