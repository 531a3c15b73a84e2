package graft.ops

/** Pure-JVM FLAC: STREAMINFO metadata (the lossless-audio leg of the
  * media-metadata family) plus REAL frame-level encode/decode of the
  * mono 16-bit subset — CONSTANT, VERBATIM, and FIXED-predictor
  * subframes with Rice-coded residuals, CRC-8 frame headers and
  * CRC-16 frame trailers, all per RFC 9639 (§8.2 STREAMINFO, §9
  * frames, §9.2.7 Rice coding). FLAC is lossless, so decode(encode(s))
  * == s bit-for-bit — the oracle property the flacdecode query pins
  * against the signal formula without ever touching bytes.
  *
  * Boundary (declared): LPC subframes, stereo decorrelation, and
  * bps ≠ 16 are not decoded (→ None) — the [[FrameDecoder]] registry
  * discipline: a real subset decoder with the unsupported branches
  * explicit, not a fixture-only parser. Metadata parse
  * ([[Flac.parseMeta]]) remains total on garbage. */
object Flac {

  /** Big-endian bit writer (FLAC packs all fields MSB-first). */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def write(v: Long, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        acc = (acc << 1) | ((v >> b) & 1L).toInt; n += 1
        if (n == 8) { buf.write(acc & 0xff); acc = 0; n = 0 }
        b -= 1
      }
    }
    /** Rice/unary quotient: q zero-bits then a terminating 1
      * (RFC 9639 §9.2.7.1). */
    def writeUnary(q: Int): Unit = { write(0L, q); write(1L, 1) }
    def align(): Unit = if (n != 0) write(0L, 8 - n)
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  /** Big-endian bit reader; [[fail]] flags any out-of-bounds read. */
  private final class BitReader(b: Array[Byte], var pos: Long) {
    var fail = false
    def read(bits: Int): Long = {
      var v = 0L; var i = 0
      while (i < bits) {
        val byteIx = (pos >> 3).toInt
        if (byteIx >= b.length) { fail = true; return 0L }
        v = (v << 1) | ((b(byteIx) >> (7 - (pos & 7L).toInt)) & 1)
        pos += 1; i += 1
      }
      v
    }
    def readUnary(): Int = {
      var q = 0
      while (!fail && read(1) == 0L) {
        q += 1
        if (q > (1 << 20)) { fail = true; return 0 } // garbage guard
      }
      q
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
  }

  /** CRC-8, poly 0x07, init 0 (FLAC frame-header checksum). */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) {
      c ^= b(i) & 0xff
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff
        else (c << 1) & 0xff; k += 1 }
      i += 1
    }
    c
  }

  /** CRC-16, poly 0x8005, init 0 (FLAC whole-frame checksum). */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) {
      c ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
        else (c << 1) & 0xffff; k += 1 }
      i += 1
    }
    c
  }

  private def zigzag(r: Long): Long = if (r >= 0) 2 * r else -2 * r - 1
  private def unzigzag(m: Long): Long =
    if ((m & 1) == 0) m >> 1 else -((m + 1) >> 1)

  /** Subframe plan for one block of the [[encode]] fixture walk. */
  sealed trait SubframeKind
  case object SfConstant extends SubframeKind
  case object SfVerbatim extends SubframeKind
  final case class SfFixed(order: Int, riceK: Int) extends SubframeKind

  /** Encode mono 16-bit samples as a real FLAC stream, one frame per
    * `blockSize` samples (fixed-blocksize strategy; the last frame
    * may be short). Per block: CONSTANT when all samples are equal,
    * else VERBATIM for block 0 (and any block a 4-bit Rice parameter
    * cannot hold — quotient blowup guard), else FIXED order-2 with
    * one Rice partition (partition order 0) whose parameter is the
    * bit length of the mean zigzag residual, capped at 14. Frame
    * headers carry 8-bit (blocksize−1), rate/bps/channel from
    * STREAMINFO, UTF-8-coded frame number, CRC-8; frames end
    * byte-aligned with CRC-16. */
  def encode(sampleRateHz: Int, samples: Array[Int],
             blockSize: Int = 64): Array[Byte] = {
    require(blockSize >= 8 && blockSize <= 256, s"bad block size $blockSize")
    require(samples.forall(s => s >= -32768 && s <= 32767), "not 16-bit")
    val out = new java.io.ByteArrayOutputStream()
    out.write(buildStreamInfo(sampleRateHz, 1, 16, samples.length.toLong,
      blockSize))
    val nf = (samples.length + blockSize - 1) / blockSize
    var f = 0
    while (f < nf) {
      val from = f * blockSize
      val len = math.min(blockSize, samples.length - from)
      require(f < 128, s"frame number $f needs multi-byte UTF-8")
      val head = Array[Byte](0xff.toByte, 0xf8.toByte, 0x60.toByte,
        0x08.toByte, f.toByte, (len - 1).toByte, 0)
      head(6) = crc8(head, 0, 6).toByte
      val bw = new BitWriter
      head.foreach(b => bw.write(b & 0xffL, 8))
      val kind = planSubframe(samples, from, len)
      kind match {
        case SfConstant =>
          bw.write(0x00L, 8) // pad|type 000000|wasted 0
          bw.write(samples(from).toLong & 0xffffL, 16)
        case SfVerbatim =>
          bw.write(0x02L, 8) // type 000001
          var t = 0
          while (t < len) {
            bw.write(samples(from + t).toLong & 0xffffL, 16); t += 1 }
        case SfFixed(order, k) =>
          bw.write((0x08L | order.toLong) << 1, 8) // type 001ooo
          var t = 0
          while (t < order) {
            bw.write(samples(from + t).toLong & 0xffffL, 16); t += 1 }
          bw.write(0L, 2) // residual method 00: 4-bit Rice
          bw.write(0L, 4) // partition order 0 -> one partition
          bw.write(k.toLong, 4)
          t = order
          while (t < len) {
            val m = zigzag(fixedResidual(samples, from, t, order))
            bw.writeUnary((m >> k).toInt)
            bw.write(m & ((1L << k) - 1), k)
            t += 1
          }
      }
      val frame = bw.bytes
      val c16 = crc16(frame, 0, frame.length)
      out.write(frame)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      f += 1
    }
    out.toByteArray
  }

  private def fixedResidual(s: Array[Int], from: Int, t: Int,
                            order: Int): Long = order match {
    case 0 => s(from + t).toLong
    case 1 => s(from + t).toLong - s(from + t - 1)
    case 2 => s(from + t).toLong - 2L * s(from + t - 1) + s(from + t - 2)
    case _ => throw new IllegalArgumentException(s"order $order")
  }

  private def planSubframe(s: Array[Int], from: Int, len: Int): SubframeKind = {
    var const = true
    var t = 1
    while (const && t < len) { const = s(from + t) == s(from); t += 1 }
    if (const) return SfConstant
    if (from == 0 || len <= 2) return SfVerbatim
    // mean-zigzag Rice parameter, capped; blown-up quotients -> verbatim
    var sum = 0L; var maxm = 0L
    t = 2
    while (t < len) {
      val m = zigzag(fixedResidual(s, from, t, 2))
      sum += m; if (m > maxm) maxm = m
      t += 1
    }
    val mean = sum / math.max(1, len - 2)
    val k = math.min(14, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, mean)).toInt)
    if ((maxm >> k) > 48) SfVerbatim else SfFixed(2, k)
  }

  /** Decoded stream: registers the flacdecode query pins (samples
    * stay in the kernel — only these aggregates ever shuffle). */
  final case class FlacAudio(info: FlacInfo, samples: Array[Int],
                             nFrames: Int, nConstant: Int,
                             nVerbatim: Int, nFixed: Int)

  /** Decode a mono 16-bit FLAC stream written by any spec-conforming
    * encoder using CONSTANT / VERBATIM / FIXED subframes (Rice
    * method 0, any partition order whose partitions divide evenly).
    * Verifies sync, header CRC-8, and frame CRC-16; any violation,
    * truncation, sample-count mismatch with STREAMINFO, or an
    * unsupported branch (LPC, stereo, bps ≠ 16, Rice escape) returns
    * None — the all-frames-or-nothing corrupt-media contract. */
  def decode(b: Array[Byte]): Option[FlacAudio] = {
    val info = parseMeta(b) match {
      case Some(i) if i.channels == 1 && i.bitsPerSample == 16 &&
        i.totalSamples > 0 && i.totalSamples <= (1 << 24) => i
      case _ => return None
    }
    // frame region starts after the last metadata block
    var o = 4L
    var last = false
    while (!last) {
      if (o + 4 > b.length) return None
      val oi = o.toInt
      last = (b(oi) & 0x80) != 0
      val len = ((b(oi + 1) & 0xff) << 16) | ((b(oi + 2) & 0xff) << 8) |
        (b(oi + 3) & 0xff)
      o = oi + 4L + len
    }
    val out = new Array[Int](info.totalSamples.toInt)
    var filled = 0
    var nC = 0; var nV = 0; var nF = 0; var frames = 0
    while (filled < out.length) {
      val fs = o.toInt
      if (fs + 7 > b.length) return None
      if ((b(fs) & 0xff) != 0xff || (b(fs + 1) & 0xfe) != 0xf8) return None
      val bsCode = (b(fs + 2) & 0xf0) >> 4
      val rateCode = b(fs + 2) & 0x0f
      val chanCode = (b(fs + 3) & 0xf0) >> 4
      val sizeCode = (b(fs + 3) & 0x0e) >> 1
      if (chanCode != 0 || sizeCode != 4 || rateCode != 0) return None
      // UTF-8 coded number: accept 1-byte (our subset writes < 128)
      if ((b(fs + 4) & 0x80) != 0) return None
      var p = fs + 5
      val blockLen = bsCode match {
        case 1 => 192
        case 6 => val v = (b(p) & 0xff) + 1; p += 1; v
        case 7 => val v = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1
          p += 2; v
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case c if c >= 8 => 256 << (c - 8)
        case _ => return None // 0 is reserved
      }
      if (crc8(b, fs, p) != (b(p) & 0xff)) return None
      p += 1
      val n = math.min(blockLen, out.length - filled)
      if (n != blockLen) return None // short non-final frame
      val br = new BitReader(b, p.toLong * 8)
      val sfHead = br.read(8)
      if ((sfHead & 0x80L) != 0 || (sfHead & 1L) != 0) return None
      val typ = ((sfHead >> 1) & 0x3f).toInt
      if (typ == 0) { // CONSTANT
        val v = (br.read(16) << 48 >> 48).toInt
        var t = 0
        while (t < n) { out(filled + t) = v; t += 1 }
        nC += 1
      } else if (typ == 1) { // VERBATIM
        var t = 0
        while (t < n) {
          out(filled + t) = (br.read(16) << 48 >> 48).toInt; t += 1 }
        nV += 1
      } else if ((typ & 0x38) == 0x08) { // FIXED, order in low 3 bits
        val order = typ & 0x07
        if (order > 4 || order > n) return None
        var t = 0
        while (t < order) {
          out(filled + t) = (br.read(16) << 48 >> 48).toInt; t += 1 }
        if (br.read(2) != 0L) return None // only Rice 4-bit method
        val po = br.read(4).toInt
        val nPart = 1 << po
        // partitions must divide the block; first partition drops warmup
        if (blockLen % nPart != 0 || blockLen / nPart <= order) return None
        var part = 0
        t = order
        while (part < nPart) {
          val k = br.read(4).toInt
          if (k == 15) return None // escape unsupported
          val partEnd = (part + 1) * (blockLen / nPart)
          while (t < partEnd) {
            val q = br.readUnary()
            val m = (q.toLong << k) | br.read(k)
            val r = unzigzag(m)
            val pred = order match {
              case 0 => 0L
              case 1 => out(filled + t - 1).toLong
              case 2 => 2L * out(filled + t - 1) - out(filled + t - 2)
              case 3 => 3L * out(filled + t - 1) - 3L * out(filled + t - 2) +
                out(filled + t - 3)
              case 4 => 4L * out(filled + t - 1) - 6L * out(filled + t - 2) +
                4L * out(filled + t - 3) - out(filled + t - 4)
            }
            val v = pred + r
            if (v < -32768 || v > 32767) return None
            out(filled + t) = v.toInt
            t += 1
          }
          part += 1
        }
        nF += 1
      } else return None // LPC or reserved
      if (br.fail) return None
      br.alignByte()
      val end = (br.pos >> 3).toInt
      if (end + 2 > b.length) return None
      val c16 = ((b(end) & 0xff) << 8) | (b(end + 1) & 0xff)
      if (crc16(b, fs, end) != c16) return None
      filled += n
      frames += 1
      o = end + 2L
    }
    // all-frames-or-nothing: trailing bytes after the final frame are
    // corruption (appended garbage), not a decodable stream
    if (o != b.length) return None
    Some(FlacAudio(info, out, frames, nC, nV, nF))
  }

  final case class FlacInfo(sampleRateHz: Int, channels: Int,
                            bitsPerSample: Int, totalSamples: Long,
                            minBlockSize: Int, maxBlockSize: Int) {
    def durationMs: Long =
      if (sampleRateHz <= 0) 0L else totalSamples * 1000L / sampleRateHz
  }

  /** Parse STREAMINFO; None when the bytes are not a FLAC stream or
    * carry no STREAMINFO block. Unknown blocks are skipped by length;
    * the walk is total on garbage. */
  def parseMeta(b: Array[Byte]): Option[FlacInfo] = {
    if (b == null || b.length < 8 || b(0) != 'f' || b(1) != 'L' ||
      b(2) != 'a' || b(3) != 'C') return None
    // Long offsets: p + len on a near-2 GiB cell would wrap Int
    // negative and index out of bounds, breaking totality-on-garbage
    var o = 4L
    var last = false
    while (!last && o + 4 <= b.length) {
      val oi = o.toInt
      val h = b(oi) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((b(oi + 1) & 0xff) << 16) | ((b(oi + 2) & 0xff) << 8) |
        (b(oi + 3) & 0xff)
      val p = oi + 4
      // Long compare: Int p + 34 would wrap negative on a
      // near-Int.MaxValue cell and pass the bound it must fail
      if (typ == 0 && p.toLong + 34 <= b.length && len >= 34) {
        val minBs = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
        val maxBs = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        // bytes p+10..p+17: rate(20) | chan-1(3) | bps-1(5) | samples(36)
        val rate = ((b(p + 10) & 0xff) << 12) | ((b(p + 11) & 0xff) << 4) |
          ((b(p + 12) & 0xff) >> 4)
        val chan = ((b(p + 12) >> 1) & 0x7) + 1
        val bps = (((b(p + 12) & 0x1) << 4) | ((b(p + 13) & 0xff) >> 4)) + 1
        var samples = (b(p + 13) & 0xf).toLong
        var i = 0
        while (i < 4) { samples = (samples << 8) | (b(p + 14 + i) & 0xff); i += 1 }
        return Some(FlacInfo(rate, chan, bps, samples, minBs, maxBs))
      }
      o = p.toLong + len
    }
    None
  }

  /** Minimal valid FLAC header: magic + one (last) STREAMINFO block;
    * md5 zeroed, no frames (metadata-only fixture). */
  def buildStreamInfo(sampleRateHz: Int, channels: Int, bitsPerSample: Int,
                      totalSamples: Long, blockSize: Int = 4096): Array[Byte] = {
    require(sampleRateHz > 0 && sampleRateHz < (1 << 20))
    require(channels >= 1 && channels <= 8)
    require(bitsPerSample >= 4 && bitsPerSample <= 32)
    require(totalSamples >= 0 && totalSamples < (1L << 36))
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(0x80) // last block, type 0 (STREAMINFO)
    out.write(0); out.write(0); out.write(34)
    out.write(blockSize >> 8); out.write(blockSize & 0xff) // min block
    out.write(blockSize >> 8); out.write(blockSize & 0xff) // max block
    (1 to 6).foreach(_ => out.write(0)) // min/max frame size unknown
    out.write((sampleRateHz >> 12) & 0xff)
    out.write((sampleRateHz >> 4) & 0xff)
    out.write(((sampleRateHz & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bitsPerSample - 1) >> 4) & 0x1))
    out.write((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf).toInt)
    (3 to 0 by -1).foreach(s => out.write(((totalSamples >> (8 * s)) & 0xff).toInt))
    (1 to 16).foreach(_ => out.write(0)) // md5 of unencoded audio
    out.toByteArray
  }
}
