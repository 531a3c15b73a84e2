package graft.ops

/** Pure-JVM MPEG audio (MP3) FRAME-HEADER metadata: sync-word scan,
  * version/layer/bitrate/samplerate table decode, frame walk, and
  * Xing/Info VBR-header detection — no sample decode (the JDK ships
  * no MPEG audio codec; see [[Multimodal.decodeStub]] for where a
  * real decoder call would batch). This upgrades compressed audio
  * from "opaque bytes + sha" to metadata-real: duration, bitrate,
  * sample rate, channel mode, and CBR/VBR are exactly the fields an
  * audio-corpus curation pass filters and stratifies on.
  *
  * Header grammar (ISO/IEC 11172-3 §2.4.1.3): 32 bits big-endian —
  * 11-bit sync (all ones), 2-bit version id (00=2.5, 10=2, 11=1),
  * 2-bit layer (01=III, 10=II, 11=I), protection bit, 4-bit bitrate
  * index, 2-bit sample-rate index, padding bit, private bit, 2-bit
  * channel mode. Frame length (bytes): Layer I
  * (12·bitrate/samplerate + padding)·4; Layers II/III
  * samplesPerFrame/8·bitrate/samplerate + padding. The walk counts
  * frames by stepping exact frame lengths from the first sync; a
  * leading ID3v2 tag (syncsafe 28-bit size) is skipped. All
  * arithmetic is integer with a pinned operation order so a SQL
  * oracle can recompute duration/bitrate from build parameters
  * exactly. */
object Mp3 {

  /** kbit/s by [versionRow][bitrateIndex]; row 0 = MPEG1 Layer III,
    * row 1 = MPEG2/2.5 Layer III (the low-rate table). Index 0 is
    * "free format" and 15 is invalid — both rejected. */
  private val BitrateKbps: Array[Array[Int]] = Array(
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1))

  /** Hz by [versionId][sampleRateIndex]; versionId is the raw 2-bit
    * field (00=MPEG2.5, 01=reserved, 10=MPEG2, 11=MPEG1). */
  private val SampleRateHz: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000, -1),
    Array(-1, -1, -1, -1),
    Array(22050, 24000, 16000, -1),
    Array(44100, 48000, 32000, -1))

  final case class Mp3Info(version: String, sampleRateHz: Int,
                           bitrateKbps: Int, channels: Int,
                           nFrames: Long, isVbr: Boolean) {
    /** Samples per Layer-III frame: 1152 for MPEG1, 576 for
      * MPEG2/2.5 (LSF halves the granule count). */
    def samplesPerFrame: Int = if (version == "1") 1152 else 576
    /** Integer-exact: frames·spf·1000 / rate — the same expression
      * (same order, floor division) the oracle evaluates. */
    def durationMs: Long =
      if (sampleRateHz <= 0) 0L
      else nFrames * samplesPerFrame.toLong * 1000L / sampleRateHz
  }

  private def isSync(b: Array[Byte], o: Int): Boolean =
    (b(o) & 0xff) == 0xff && (b(o + 1) & 0xe0) == 0xe0

  /** Decode one header at `o`; None unless it is a valid Layer-III
    * header with defined bitrate/samplerate. Returns (info-of-frame,
    * frameLengthBytes). */
  private def frameAt(b: Array[Byte], o: Int): Option[(Mp3Info, Int)] = {
    if (o + 4 > b.length || !isSync(b, o)) return None
    val h1 = b(o + 1) & 0xff
    val h2 = b(o + 2) & 0xff
    val h3 = b(o + 3) & 0xff
    val versionId = (h1 >> 3) & 0x3
    val layer = (h1 >> 1) & 0x3
    if (versionId == 1 || layer != 1) return None // reserved / not Layer III
    val brIdx = (h2 >> 4) & 0xf
    val srIdx = (h2 >> 2) & 0x3
    val padding = (h2 >> 1) & 0x1
    val mode = (h3 >> 6) & 0x3
    val row = if (versionId == 3) 0 else 1
    val kbps = BitrateKbps(row)(brIdx)
    val rate = SampleRateHz(versionId)(srIdx)
    if (kbps <= 0 || rate <= 0) return None
    val spf = if (versionId == 3) 1152 else 576
    val len = spf / 8 * kbps * 1000 / rate + padding
    if (len < 4) return None
    val version = versionId match {
      case 3 => "1"
      case 2 => "2"
      case _ => "2.5"
    }
    val channels = if (mode == 3) 1 else 2
    Some((Mp3Info(version, rate, kbps, channels, 0L, isVbr = false), len))
  }

  /** Byte offset just past a leading ID3v2 tag (syncsafe 28-bit size
    * + 10-byte header, +10 more with a footer), 0 if none. */
  private def id3End(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    val flags = b(5) & 0xff
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    10 + size + (if ((flags & 0x10) != 0) 10 else 0)
  }

  /** Offset of the Xing/Info VBR header inside the first frame: after
    * the side information (MPEG1: 32 bytes stereo / 17 mono; LSF: 17
    * stereo / 9 mono), relative to the frame start (+4 header). */
  private def xingOffset(version: String, channels: Int): Int =
    (version, channels) match {
      case ("1", 1) => 4 + 17
      case ("1", _) => 4 + 32
      case (_, 1) => 4 + 9
      case (_, _) => 4 + 17
    }

  /** Parse frame-header metadata; None when no valid Layer-III sync
    * is found. Walks every frame (exact lengths), so `nFrames` and
    * the derived duration are exact even for VBR streams; `isVbr` is
    * true when a Xing tag is present OR any frame's bitrate index
    * differs from the first. `bitrateKbps` is the FIRST frame's —
    * the nominal rate for CBR, the seed rate for VBR. */
  def parseMeta(b: Array[Byte]): Option[Mp3Info] = {
    if (b == null || b.length < 4) return None
    var o = id3End(b)
    // resync scan: tolerate leading garbage up to the first valid
    // header — one frameAt per offset (holding the Option in a var;
    // a guard-and-rematch loop would decode every candidate header
    // twice on sync-less garbage that walks the whole cell)
    var hit: Option[(Mp3Info, Int)] = None
    while (hit.isEmpty && o + 4 <= b.length) {
      hit = frameAt(b, o)
      if (hit.isEmpty) o += 1
    }
    hit match {
      case None => None
      case Some((first, len0)) =>
        val xo = o + xingOffset(first.version, first.channels)
        val xing = xo + 4 <= b.length &&
          ((b(xo) == 'X' && b(xo + 1) == 'i' && b(xo + 2) == 'n' && b(xo + 3) == 'g') ||
            (b(xo) == 'I' && b(xo + 1) == 'n' && b(xo + 2) == 'f' && b(xo + 3) == 'o'))
        var n = 0L
        var vbr = xing
        // Long cursor: cur + frameLen on a near-2 GiB cell would wrap
        // Int negative and index out of bounds in frameAt's sync check
        var cur: Long = o
        var curLen = len0
        var ok = true
        while (ok) {
          n += 1
          cur += curLen
          val next = if (cur + 4 > b.length) None else frameAt(b, cur.toInt)
          next match {
            case Some((fi, l)) if fi.sampleRateHz == first.sampleRateHz =>
              if (fi.bitrateKbps != first.bitrateKbps) vbr = true
              curLen = l
            case _ => ok = false
          }
        }
        Some(first.copy(nFrames = n, isVbr = vbr))
    }
  }

  // ------------------------------------------------------------------
  // Minimal writer — test/oracle fixture synthesis (a real pipeline
  // ingests externally-produced files; the writer exists so specs and
  // the cross-engine oracle can pin the parser against known values).
  // ------------------------------------------------------------------

  private def headerBytes(versionId: Int, brIdx: Int, srIdx: Int,
                          padding: Int, mono: Boolean): Array[Byte] = {
    val h1 = 0xe0 | (versionId << 3) | (1 << 1) | 1 // sync tail, Layer III, no CRC
    val h2 = (brIdx << 4) | (srIdx << 2) | (padding << 1)
    val h3 = (if (mono) 3 else 0) << 6
    Array(0xff.toByte, h1.toByte, h2.toByte, h3.toByte)
  }

  /** Build `nFrames` valid Layer-III frames (zero payload) at the
    * given table indices. `mpeg1` selects MPEG1 vs MPEG2 tables;
    * `withId3` prefixes a minimal ID3v2 tag of `id3Bytes` payload;
    * `vbrStep` > 0 alternates the bitrate index by that step (a
    * synthetic VBR stream). The first frame never carries a Xing tag
    * (the payload is zeros), so VBR-ness comes from the per-frame
    * index variation — both detection paths are spec-tested. */
  def buildFrames(mpeg1: Boolean, brIdx: Int, srIdx: Int, nFrames: Int,
                  mono: Boolean = false, withId3: Boolean = false,
                  id3Bytes: Int = 32, vbrStep: Int = 0): Array[Byte] = {
    val versionId = if (mpeg1) 3 else 2
    val row = if (mpeg1) 0 else 1
    val spf = if (mpeg1) 1152 else 576
    val rate = SampleRateHz(versionId)(srIdx)
    require(rate > 0, s"bad srIdx $srIdx")
    val out = new java.io.ByteArrayOutputStream()
    if (withId3) {
      out.write(Array('I', 'D', '3', 4, 0, 0).map(_.toByte))
      out.write(Array((id3Bytes >> 21) & 0x7f, (id3Bytes >> 14) & 0x7f,
        (id3Bytes >> 7) & 0x7f, id3Bytes & 0x7f).map(_.toByte))
      out.write(new Array[Byte](id3Bytes))
    }
    var i = 0
    while (i < nFrames) {
      val bi0 = brIdx + (if (vbrStep > 0 && i % 2 == 1) vbrStep else 0)
      val bi = math.min(bi0, 14)
      val kbps = BitrateKbps(row)(bi)
      require(kbps > 0, s"bad brIdx $bi")
      val len = spf / 8 * kbps * 1000 / rate // padding 0
      out.write(headerBytes(versionId, bi, srIdx, padding = 0, mono))
      out.write(new Array[Byte](len - 4))
      i += 1
    }
    out.toByteArray
  }
}
