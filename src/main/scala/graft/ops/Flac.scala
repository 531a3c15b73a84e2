package graft.ops

/** Pure-JVM FLAC: STREAMINFO metadata (the lossless-audio leg of the
  * media-metadata family) plus REAL frame-level encode/decode of the
  * 8/12/16/20/24-bit subset — CONSTANT, VERBATIM, FIXED-predictor,
  * and LPC subframes with Rice-coded residuals, wasted-bits
  * extraction (upscaled sources encode at their true width, RFC 9639
  * §9.2.2), mono and stereo (independent, left/side, right/side,
  * mid/side channel decorrelation, the side channel at bps+1 bits),
  * CRC-8 frame headers and CRC-16 frame trailers, all per RFC 9639
  * (§8.2 STREAMINFO, §9 frames, §9.2.7 Rice coding, §10.2
  * interchannel decorrelation). FLAC is lossless,
  * so decode(encode(s)) == s bit-for-bit — the oracle property the
  * flacdecode queries pin against the signal formula without ever
  * touching bytes. The LPC encoder computes real coefficients
  * (windowless autocorrelation → Levinson–Durbin → precision-12
  * quantization); losslessness never depends on their quality
  * because residuals are taken against the same integer predictor
  * the decoder runs.
  *
  * Boundary (declared): bps outside {8, 12, 16, 20, 24} (the
  * streamable-subset grid the frame-header size code expresses
  * directly) is not decoded (→ None) — the [[FrameDecoder]] registry
  * discipline: a real subset decoder with the unsupported branches
  * explicit, not a fixture-only parser. r14 closed the former
  * >2-channel and Rice-escape notches: 3-8 channels decode as
  * independent subframes (the spec's only surround assignment) and
  * escape partitions (§9.2.7.2) decode raw-width residuals, with the
  * encoder emitting them on quotient blowup instead of the old
  * whole-subframe VERBATIM fallback. Metadata parse
  * ([[Flac.parseMeta]]) remains total on garbage. */
object Flac {

  /** Big-endian bit writer (FLAC packs all fields MSB-first). */
  private[ops] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def write(v: Long, bits: Int): Unit = {
      // byte-at-a-time MSB-first packing (r14 optimization round):
      // same bit stream as the former 1-bit-per-iteration loop —
      // each chunk is the next `take` bits of v, high bits first —
      // at ~one iteration per output byte instead of per bit.
      var rem = bits
      while (rem > 0) {
        val take = { val space = 8 - n; if (rem < space) rem else space }
        acc = (acc << take) |
          ((v >>> (rem - take)) & ((1L << take) - 1L)).toInt
        n += take
        rem -= take
        if (n == 8) { buf.write(acc & 0xff); acc = 0; n = 0 }
      }
    }
    /** Rice/unary quotient: q zero-bits then a terminating 1
      * (RFC 9639 §9.2.7.1). */
    def writeUnary(q: Int): Unit = { write(0L, q); write(1L, 1) }
    def align(): Unit = if (n != 0) write(0L, 8 - n)
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  /** Big-endian bit reader; [[fail]] flags any out-of-bounds read. */
  private[ops] final class BitReader(b: Array[Byte], var pos: Long) {
    var fail = false
    def read(bits: Int): Long = {
      // byte-at-a-time MSB-first extraction (r14 optimization
      // round): identical bit semantics to the former
      // 1-bit-per-iteration loop — each chunk is the next `take`
      // bits of the stream, appended high-first — at ~one iteration
      // per byte touched. On out-of-bounds the same observable state
      // results: fail set, 0 returned, pos stopped at the end of the
      // last whole byte (the old loop could only run out at a byte
      // boundary, and every decode path discards results on fail).
      var v = 0L; var rem = bits
      while (rem > 0) {
        val byteIx = (pos >> 3).toInt
        if (byteIx >= b.length) { fail = true; return 0L }
        val avail = 8 - (pos & 7L).toInt
        val take = if (rem < avail) rem else avail
        v = (v << take) |
          (((b(byteIx) & 0xff) >>> (avail - take)) & ((1 << take) - 1))
        pos += take; rem -= take
      }
      v
    }
    def readUnary(): Int = {
      // byte-at-a-time zero-run scan (r14 optimization round): skips
      // whole zero bytes and finds the terminating 1 via
      // numberOfLeadingZeros instead of one read(1) call per bit.
      // Same quotient and final pos (first bit after the 1); the
      // garbage guard trips at byte rather than bit granularity, but
      // past 2^20 the only observable outcome either way is
      // fail=true and a discarded frame.
      var q = 0
      while (true) {
        val byteIx = (pos >> 3).toInt
        if (byteIx >= b.length) { fail = true; return 0 }
        val off = (pos & 7L).toInt
        val cur = (b(byteIx) & 0xff) & (0xff >>> off)
        if (cur == 0) {
          q += 8 - off; pos += 8 - off
          if (q > (1 << 20)) { fail = true; return 0 } // garbage guard
        } else {
          val zeros = (java.lang.Integer.numberOfLeadingZeros(cur) - 24) - off
          q += zeros; pos += zeros + 1
          if (q > (1 << 20)) { fail = true; return 0 } // garbage guard
          return q
        }
      }
      0 // unreachable
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
  /** FIXED subframe whose one partition uses the Rice ESCAPE code
    * (RFC 9639 §9.2.7.2): parameter 0b1111, then a 5-bit width, then
    * the residuals raw two's-complement — the spec's answer to
    * quotient blowup, replacing the old VERBATIM fallback. */
  final case class SfFixedEscape(order: Int, width: Int)
    extends SubframeKind
  final case class SfLpc(order: Int, precision: Int, shift: Int,
                         coefs: Array[Long], riceK: Int)
    extends SubframeKind

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
             blockSize: Int = 64, bps: Int = 16): Array[Byte] = {
    require(blockSize >= 8 && blockSize <= 256, s"bad block size $blockSize")
    val szc = sizeCodeOf(bps)
    val (lo, hi) = (-(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    require(samples.forall(s => s >= lo && s <= hi), s"not $bps-bit")
    val out = new java.io.ByteArrayOutputStream()
    out.write(buildStreamInfo(sampleRateHz, 1, bps, samples.length.toLong,
      blockSize))
    val nf = (samples.length + blockSize - 1) / blockSize
    var f = 0
    while (f < nf) {
      val from = f * blockSize
      val len = math.min(blockSize, samples.length - from)
      require(f < 128, s"frame number $f needs multi-byte UTF-8")
      val head = Array[Byte](0xff.toByte, 0xf8.toByte, 0x60.toByte,
        (szc << 1).toByte, f.toByte, (len - 1).toByte, 0)
      head(6) = crc8(head, 0, 6).toByte
      val bw = new BitWriter
      head.foreach(b => bw.write(b & 0xffL, 8))
      writeSubframeAuto(bw, samples, from, len, bps,
        planSubframe(samples, from, len))
      val frame = bw.bytes
      val c16 = crc16(frame, 0, frame.length)
      out.write(frame)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      f += 1
    }
    out.toByteArray
  }

  private def writeSubframe(bw: BitWriter, s: Array[Int], from: Int,
                            len: Int, bits: Int,
                            kind: SubframeKind, wasted: Int = 0): Unit = {
    val mask = (1L << bits) - 1
    // subframe header: pad(1) | type(6) | wasted flag(1), then the
    // wasted count minus one in unary (RFC 9639 §9.2.2); `bits` is
    // the EFFECTIVE width (caller already subtracted `wasted`)
    def hdr(typ: Long): Unit = {
      bw.write((typ << 1) | (if (wasted > 0) 1L else 0L), 8)
      if (wasted > 0) bw.writeUnary(wasted - 1)
    }
    kind match {
      case SfConstant =>
        hdr(0x00L)
        bw.write(s(from).toLong & mask, bits)
      case SfVerbatim =>
        hdr(0x01L)
        var t = 0
        while (t < len) { bw.write(s(from + t).toLong & mask, bits)
          t += 1 }
      case SfFixed(order, k) =>
        hdr(0x08L | order.toLong) // type 001ooo
        var t = 0
        while (t < order) { bw.write(s(from + t).toLong & mask, bits)
          t += 1 }
        bw.write(0L, 2) // residual method 00: 4-bit Rice
        bw.write(0L, 4) // partition order 0 -> one partition
        bw.write(k.toLong, 4)
        t = order
        while (t < len) {
          val m = zigzag(fixedResidual(s, from, t, order))
          bw.writeUnary((m >> k).toInt)
          bw.write(m & ((1L << k) - 1), k)
          t += 1
        }
      case SfFixedEscape(order, w) =>
        hdr(0x08L | order.toLong) // type 001ooo
        var t = 0
        while (t < order) { bw.write(s(from + t).toLong & mask, bits)
          t += 1 }
        bw.write(0L, 2) // residual method 00: 4-bit Rice
        bw.write(0L, 4) // partition order 0 -> one partition
        bw.write(15L, 4) // ESCAPE parameter
        bw.write(w.toLong, 5)
        t = order
        while (t < len) {
          val r = fixedResidual(s, from, t, order)
          if (w > 0) bw.write(r & ((1L << w) - 1), w)
          t += 1
        }
      case SfLpc(order, prec, shift, coefs, k) =>
        hdr(0x20L | (order - 1).toLong) // type 1ooooo
        var t = 0
        while (t < order) { bw.write(s(from + t).toLong & mask, bits)
          t += 1 }
        bw.write((prec - 1).toLong, 4)
        bw.write(shift.toLong, 5) // non-negative by construction
        coefs.foreach(c => bw.write(c & ((1L << prec) - 1), prec))
        bw.write(0L, 2) // residual method 00: 4-bit Rice
        bw.write(0L, 4) // partition order 0
        bw.write(k.toLong, 4)
        t = order
        while (t < len) {
          val m = zigzag(s(from + t).toLong -
            lpcPredict(s, from, t, coefs, shift))
          bw.writeUnary((m >> k).toInt)
          bw.write(m & ((1L << k) - 1), k)
          t += 1
        }
    }
  }

  /** Frame-header sample-size code (RFC 9639 §9.1.3) for the bps
    * subset this codec speaks. */
  private def sizeCodeOf(bps: Int): Int = bps match {
    case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
    case _ => throw new IllegalArgumentException(s"unsupported bps $bps")
  }

  /** Common trailing-zero width of a block (0 for an all-zero block —
    * that's CONSTANT anyway), capped so at least one significant bit
    * remains: the wasted-bits count real encoders extract from
    * upscaled sources (e.g. 12-bit ADC samples shipped as 16-bit). */
  private def wastedBits(s: Array[Int], from: Int, len: Int,
                         bits: Int): Int = {
    var or = 0
    var t = 0
    while (t < len) { or |= s(from + t); t += 1 }
    if (or == 0) 0
    else math.min(java.lang.Integer.numberOfTrailingZeros(or), bits - 1)
  }

  /** [[writeSubframe]] with wasted-bit extraction: when every sample
    * in the block shares `w` trailing zero bits, shift down and
    * encode at width `bits − w` with the wasted header (RFC 9639
    * §9.2.2). The plan (kind, Rice k, LPC coefs) is computed by the
    * caller on the ORIGINAL values — kinds are shift-invariant,
    * k is merely conservative for the smaller residuals, and the
    * LPC analysis is scale-invariant; residuals are recomputed from
    * the shifted values inside [[writeSubframe]], so losslessness
    * never depends on the plan's provenance. */
  private def writeSubframeAuto(bw: BitWriter, s: Array[Int], from: Int,
                                len: Int, bits: Int,
                                kind: SubframeKind): Unit = {
    val w = wastedBits(s, from, len, bits)
    if (w == 0) writeSubframe(bw, s, from, len, bits, kind)
    else {
      val t = new Array[Int](len)
      var i = 0
      while (i < len) { t(i) = s(from + i) >> w; i += 1 }
      writeSubframe(bw, t, 0, len, bits - w, kind, w)
    }
  }

  private def lpcPredict(s: Array[Int], from: Int, t: Int,
                         coefs: Array[Long], shift: Int): Long = {
    var acc = 0L
    var j = 0
    while (j < coefs.length) {
      acc += coefs(j) * s(from + t - 1 - j); j += 1
    }
    acc >> shift
  }

  /** Real LPC analysis for one block: windowless autocorrelation →
    * Levinson–Durbin → precision-bit quantization with a
    * non-negative 5-bit shift (RFC 9639 §9.2.5). Falls back to the
    * CONSTANT/VERBATIM/FIXED plan when the block is degenerate or
    * the Rice quotients would blow up — losslessness never depends
    * on the analysis, only the residual/predictor agreement. */
  private def planLpcSubframe(s: Array[Int], from: Int, len: Int,
                              order: Int, precision: Int): SubframeKind = {
    var const = true
    var t = 1
    while (const && t < len) { const = s(from + t) == s(from); t += 1 }
    if (const) return SfConstant
    if (len <= 2 * order + 1) return planSubframe(s, from, len)
    // autocorrelation (doubles, fixed order -> deterministic)
    val r = new Array[Double](order + 1)
    var k = 0
    while (k <= order) {
      var acc = 0.0
      var i = k
      while (i < len) { acc += s(from + i).toDouble * s(from + i - k)
        i += 1 }
      r(k) = acc
      k += 1
    }
    if (r(0) <= 0.0) return planSubframe(s, from, len)
    // Levinson-Durbin recursion
    val a = new Array[Double](order + 1)
    var err = r(0)
    var m = 1
    while (m <= order) {
      var acc = r(m)
      var j = 1
      while (j < m) { acc -= a(j) * r(m - j); j += 1 }
      if (err <= 0.0) return planSubframe(s, from, len)
      val kk = acc / err
      // in-place update with the symmetric pair trick
      j = 1
      while (j <= m / 2) {
        val tmp = a(j) - kk * a(m - j)
        a(m - j) = a(m - j) - kk * a(j)
        a(j) = tmp
        j += 1
      }
      a(m) = kk
      err *= (1.0 - kk * kk)
      m += 1
    }
    var cmax = 0.0
    m = 1
    while (m <= order) { cmax = math.max(cmax, math.abs(a(m))); m += 1 }
    if (cmax == 0.0 || cmax.isNaN || cmax.isInfinite)
      return planSubframe(s, from, len)
    val shift = math.min(15,
      math.max(0, precision - 2 - Math.getExponent(cmax)))
    val lo = -(1L << (precision - 1)); val hi = (1L << (precision - 1)) - 1
    val coefs = Array.tabulate(order)(j => math.max(lo,
      math.min(hi, Math.round(a(j + 1) * (1L << shift)))))
    // Rice parameter from the mean zigzag residual, blowup-guarded
    var sum = 0L; var maxm = 0L
    t = order
    while (t < len) {
      val mm = zigzag(s(from + t).toLong - lpcPredict(s, from, t, coefs, shift))
      sum += mm; if (mm > maxm) maxm = mm
      t += 1
    }
    val mean = sum / math.max(1, len - order)
    val rk = math.min(14, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, mean)).toInt)
    if ((maxm >> rk) > 48) planSubframe(s, from, len)
    else SfLpc(order, precision, shift, coefs, rk)
  }

  /** Encode mono 16-bit samples with REAL LPC subframes (Levinson–
    * Durbin analysis at `order`, precision-12 quantized coefficients)
    * where the analysis holds, CONSTANT for flat blocks, and the
    * FIXED/VERBATIM plan as fallback. Same framing contract as
    * [[encode]]. */
  def encodeLpc(sampleRateHz: Int, samples: Array[Int],
                blockSize: Int = 64, order: Int = 4,
                bps: Int = 16): Array[Byte] = {
    require(blockSize >= 8 && blockSize <= 256, s"bad block size $blockSize")
    require(order >= 1 && order <= 8, s"bad LPC order $order")
    val szc = sizeCodeOf(bps)
    val (lo, hi) = (-(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    require(samples.forall(s => s >= lo && s <= hi), s"not $bps-bit")
    val out = new java.io.ByteArrayOutputStream()
    out.write(buildStreamInfo(sampleRateHz, 1, bps, samples.length.toLong,
      blockSize))
    val nf = (samples.length + blockSize - 1) / blockSize
    var f = 0
    while (f < nf) {
      val from = f * blockSize
      val len = math.min(blockSize, samples.length - from)
      require(f < 128, s"frame number $f needs multi-byte UTF-8")
      val head = Array[Byte](0xff.toByte, 0xf8.toByte, 0x60.toByte,
        (szc << 1).toByte, f.toByte, (len - 1).toByte, 0)
      head(6) = crc8(head, 0, 6).toByte
      val bw = new BitWriter
      head.foreach(b => bw.write(b & 0xffL, 8))
      writeSubframeAuto(bw, samples, from, len, bps,
        planLpcSubframe(samples, from, len, order, 12))
      val frame = bw.bytes
      val c16 = crc16(frame, 0, frame.length)
      out.write(frame)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      f += 1
    }
    out.toByteArray
  }

  /** Encode a 16-bit STEREO pair as a real FLAC stream, cycling the
    * four channel assignments per block — independent, left/side,
    * right/side, mid/side (RFC 9639 §10.2; block b uses assignment
    * b mod 4) — so every decorrelation path is on the wire. The side
    * channel is 17-bit as the spec requires. Subframes follow the
    * [[encode]] plan per channel (LPC when `useLpc`). */
  def encodeStereo(sampleRateHz: Int, left: Array[Int], right: Array[Int],
                   blockSize: Int = 64, useLpc: Boolean = false,
                   bps: Int = 16): Array[Byte] = {
    require(blockSize >= 8 && blockSize <= 256, s"bad block size $blockSize")
    require(left.length == right.length, "channel length mismatch")
    val szc = sizeCodeOf(bps)
    val (slo, shi) = (-(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    require(left.forall(s => s >= slo && s <= shi) &&
      right.forall(s => s >= slo && s <= shi), s"not $bps-bit")
    val out = new java.io.ByteArrayOutputStream()
    out.write(buildStreamInfo(sampleRateHz, 2, bps, left.length.toLong,
      blockSize))
    def plan(s: Array[Int], from: Int, len: Int): SubframeKind =
      if (useLpc) planLpcSubframe(s, from, len, 4, 12)
      else planSubframe(s, from, len)
    val side = Array.tabulate(left.length)(t => left(t) - right(t))
    val mid = Array.tabulate(left.length)(t => (left(t) + right(t)) >> 1)
    val nf = (left.length + blockSize - 1) / blockSize
    var f = 0
    while (f < nf) {
      val from = f * blockSize
      val len = math.min(blockSize, left.length - from)
      require(f < 128, s"frame number $f needs multi-byte UTF-8")
      val chanCode = (f % 4) match {
        case 0 => 1  // independent L, R
        case 1 => 8  // left/side
        case 2 => 9  // side/right
        case _ => 10 // mid/side
      }
      val (ch0, ch1, b0, b1) = chanCode match {
        case 1 => (left, right, bps, bps)
        case 8 => (left, side, bps, bps + 1)
        case 9 => (side, right, bps + 1, bps)
        case _ => (mid, side, bps, bps + 1)
      }
      val head = Array[Byte](0xff.toByte, 0xf8.toByte, 0x60.toByte,
        ((chanCode << 4) | (szc << 1)).toByte, f.toByte, (len - 1).toByte, 0)
      head(6) = crc8(head, 0, 6).toByte
      val bw = new BitWriter
      head.foreach(b => bw.write(b & 0xffL, 8))
      writeSubframeAuto(bw, ch0, from, len, b0, plan(ch0, from, len))
      writeSubframeAuto(bw, ch1, from, len, b1, plan(ch1, from, len))
      val frame = bw.bytes
      val c16 = crc16(frame, 0, frame.length)
      out.write(frame)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      f += 1
    }
    out.toByteArray
  }

  /** Encode an N-channel (1 ≤ N ≤ 8) clip with INDEPENDENT
    * subframes per channel — RFC 9639's only assignment beyond
    * stereo (decorrelation is a two-channel concept; surround FLAC
    * is N independent subframes per frame, chanCode = N − 1). Same
    * framing/bps/wasted-bit contract as [[encode]]; per-channel
    * plans (LPC when `useLpc`). Output of [[decode]] interleaves
    * c0, c1, …, cN−1 per sample time. */
  def encodeMulti(sampleRateHz: Int, channels: Seq[Array[Int]],
                  blockSize: Int = 64, useLpc: Boolean = false,
                  bps: Int = 16): Array[Byte] = {
    require(channels.nonEmpty && channels.size <= 8,
      s"channel count ${channels.size} not in [1, 8]")
    require(blockSize >= 8 && blockSize <= 256, s"bad block size $blockSize")
    val n0 = channels.head.length
    require(channels.forall(_.length == n0), "channel length mismatch")
    val szc = sizeCodeOf(bps)
    val (lo, hi) = (-(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    channels.foreach(ch =>
      require(ch.forall(s => s >= lo && s <= hi), s"not $bps-bit"))
    val nCh = channels.size
    val out = new java.io.ByteArrayOutputStream()
    out.write(buildStreamInfo(sampleRateHz, nCh, bps, n0.toLong,
      blockSize))
    def plan(ch: Array[Int], from: Int, len: Int): SubframeKind =
      if (useLpc) planLpcSubframe(ch, from, len, 4, 12)
      else planSubframe(ch, from, len)
    val nf = (n0 + blockSize - 1) / blockSize
    var f = 0
    while (f < nf) {
      val from = f * blockSize
      val len = math.min(blockSize, n0 - from)
      require(f < 128, s"frame number $f needs multi-byte UTF-8")
      val head = Array[Byte](0xff.toByte, 0xf8.toByte, 0x60.toByte,
        (((nCh - 1) << 4) | (szc << 1)).toByte, f.toByte,
        (len - 1).toByte, 0)
      head(6) = crc8(head, 0, 6).toByte
      val bw = new BitWriter
      head.foreach(b => bw.write(b & 0xffL, 8))
      channels.foreach(ch =>
        writeSubframeAuto(bw, ch, from, len, bps, plan(ch, from, len)))
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
    // mean-zigzag Rice parameter, capped; blown-up quotients take the
    // spec's ESCAPE partition (raw residuals at a fixed width) rather
    // than the old whole-subframe VERBATIM fallback
    var sum = 0L; var maxm = 0L
    var maxAbs = 0L
    t = 2
    while (t < len) {
      val r = fixedResidual(s, from, t, 2)
      val m = zigzag(r)
      sum += m; if (m > maxm) maxm = m
      val a = math.abs(r); if (a > maxAbs) maxAbs = a
      t += 1
    }
    val mean = sum / math.max(1, len - 2)
    val k = math.min(14, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, mean)).toInt)
    if ((maxm >> k) > 48) {
      // signed width for the largest |residual| (+1 for the sign)
      val w = 65 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, maxAbs)).toInt
      SfFixedEscape(2, math.min(31, w))
    } else SfFixed(2, k)
  }

  /** Decoded stream: registers the flacdecode query pins (samples
    * stay in the kernel — only these aggregates ever shuffle).
    * `samples` is channel-interleaved for stereo; the subframe-kind
    * counts count SUBFRAMES (== frames for mono). */
  final case class FlacAudio(info: FlacInfo, samples: Array[Int],
                             nFrames: Int, nConstant: Int,
                             nVerbatim: Int, nFixed: Int,
                             nLpc: Int = 0)

  /** One decoded subframe into `out` (Long workspace — 17-bit side
    * channels and LPC accumulators need headroom); returns the kind
    * tag 0/1/2/3 = constant/verbatim/fixed/lpc, or -1 on any
    * malformation. */
  private def decodeSubframe(br: BitReader, out: Array[Long], n: Int,
                             width: Int): Int = {
    val sfHead = br.read(8)
    if ((sfHead & 0x80L) != 0) return -1
    // wasted bits (RFC 9639 §9.2.2): flag bit, then count-1 in unary;
    // the subframe decodes at the reduced width and every sample is
    // shifted back up at the end
    val wasted = if ((sfHead & 1L) != 0) br.readUnary() + 1 else 0
    val bits = width - wasted
    if (bits <= 0 || br.fail) return -1
    def sext(v: Long): Long = (v << (64 - bits)) >> (64 - bits)
    val lo = -(1L << (bits - 1)); val hi = (1L << (bits - 1)) - 1
    def shiftUp(): Unit = if (wasted > 0) {
      var t = 0
      while (t < n) { out(t) = out(t) << wasted; t += 1 }
    }
    val typ = ((sfHead >> 1) & 0x3f).toInt
    def residuals(order: Int, pred: Int => Long): Boolean = {
      if (br.read(2) != 0L) return false // only Rice 4-bit method
      val po = br.read(4).toInt
      val nPart = 1 << po
      // partitions must divide the block; first partition drops warmup
      if (n % nPart != 0 || n / nPart <= order) return false
      var part = 0
      var t = order
      while (part < nPart) {
        val k = br.read(4).toInt
        val partEnd = (part + 1) * (n / nPart)
        if (k == 15) {
          // ESCAPE partition (RFC 9639 §9.2.7.2): 5-bit width, then
          // raw two's-complement residuals (width 0 = all zero)
          val w = br.read(5).toInt
          while (t < partEnd) {
            val r = if (w == 0) 0L
              else (br.read(w) << (64 - w)) >> (64 - w)
            val v = pred(t) + r
            if (v < lo || v > hi || br.fail) return false
            out(t) = v
            t += 1
          }
        } else {
          while (t < partEnd) {
            val q = br.readUnary()
            val m = (q.toLong << k) | br.read(k)
            val v = pred(t) + unzigzag(m)
            if (v < lo || v > hi || br.fail) return false
            out(t) = v
            t += 1
          }
        }
        part += 1
      }
      true
    }
    if (typ == 0) { // CONSTANT
      val v = sext(br.read(bits))
      var t = 0
      while (t < n) { out(t) = v; t += 1 }
      shiftUp(); 0
    } else if (typ == 1) { // VERBATIM
      var t = 0
      while (t < n) { out(t) = sext(br.read(bits)); t += 1 }
      shiftUp(); 1
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      if (order > n) return -1
      var t = 0
      while (t < order) { out(t) = sext(br.read(bits)); t += 1 }
      val ok = residuals(order, t => order match {
        case 0 => 0L
        case 1 => out(t - 1)
        case 2 => 2L * out(t - 1) - out(t - 2)
        case 3 => 3L * out(t - 1) - 3L * out(t - 2) + out(t - 3)
        case _ => 4L * out(t - 1) - 6L * out(t - 2) +
          4L * out(t - 3) - out(t - 4)
      })
      if (ok) { shiftUp(); 2 } else -1
    } else if ((typ & 0x20) != 0) { // LPC, order-1 in low 5 bits
      val order = (typ & 0x1f) + 1
      if (order > n) return -1
      var t = 0
      while (t < order) { out(t) = sext(br.read(bits)); t += 1 }
      val prec = br.read(4).toInt + 1
      if (prec == 16) return -1 // 0b1111 is invalid
      val shift = ((br.read(5) << 59) >> 59).toInt
      if (shift < 0) return -1 // negative shift is reserved
      val coefs = new Array[Long](order)
      var j = 0
      while (j < order) {
        coefs(j) = (br.read(prec) << (64 - prec)) >> (64 - prec); j += 1 }
      val ok = residuals(order, t => {
        var acc = 0L
        var i = 0
        while (i < order) { acc += coefs(i) * out(t - 1 - i); i += 1 }
        acc >> shift
      })
      if (ok) { shiftUp(); 3 } else -1
    } else -1 // reserved type
  }

  /** Decode an 8/12/16/20/24-bit mono or stereo FLAC stream written
    * by any spec-conforming encoder using CONSTANT / VERBATIM /
    * FIXED / LPC subframes (Rice method 0, any partition order whose
    * partitions divide evenly), wasted bits, and any channel
    * assignment (independent, left/side, right/side, mid/side — side
    * channels at bps+1 per the spec). Verifies sync, header CRC-8,
    * and frame CRC-16; any violation, truncation, trailing garbage,
    * sample-count mismatch with STREAMINFO, or an unsupported branch
    * (bps outside the grid, > 8 channels) returns None — the
    * all-frames-or-nothing corrupt-media contract. Multi-channel
    * output is interleaved c0..cN-1 per sample time (stereo: L,R). */
  def decode(b: Array[Byte]): Option[FlacAudio] = {
    val info = parseMeta(b) match {
      case Some(i) if i.channels >= 1 && i.channels <= 8 &&
        Set(8, 12, 16, 20, 24).contains(i.bitsPerSample) &&
        i.totalSamples > 0 &&
        i.totalSamples * i.channels <= (1 << 24) => i
      case _ => return None
    }
    val nCh = info.channels
    val bps = info.bitsPerSample
    val szc = sizeCodeOf(bps)
    val sampLo = -(1L << (bps - 1)); val sampHi = (1L << (bps - 1)) - 1
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
    val total = info.totalSamples.toInt
    val out = new Array[Int](total * nCh)
    var filled = 0 // per-channel (interchannel) samples decoded
    var nC = 0; var nV = 0; var nF = 0; var nL = 0; var frames = 0
    val chans = Array.fill(nCh)(new Array[Long](256))
    while (filled < total) {
      val fs = o.toInt
      if (fs + 7 > b.length) return None
      if ((b(fs) & 0xff) != 0xff || (b(fs + 1) & 0xfe) != 0xf8) return None
      val bsCode = (b(fs + 2) & 0xf0) >> 4
      val rateCode = b(fs + 2) & 0x0f
      val chanCode = (b(fs + 3) & 0xf0) >> 4
      val sizeCode = (b(fs + 3) & 0x0e) >> 1
      if (sizeCode != szc || rateCode != 0) return None
      // nCh >= 3: only the independent assignment exists in the spec
      // (decorrelation is a stereo-only concept, chanCode = nCh - 1)
      val stereoMode =
        if (nCh == 1 && chanCode == 0) 0
        else if (nCh == 2 &&
          (chanCode == 1 || (chanCode >= 8 && chanCode <= 10))) chanCode
        else if (nCh >= 3 && chanCode == nCh - 1) chanCode
        else return None
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
      if (blockLen > 65536) return None
      if (chans(0).length < blockLen) {
        var ci = 0
        while (ci < nCh) { chans(ci) = new Array[Long](blockLen); ci += 1 }
      }
      if (crc8(b, fs, p) != (b(p) & 0xff)) return None
      p += 1
      val n = math.min(blockLen, total - filled)
      if (n != blockLen) return None // short non-final frame
      val br = new BitReader(b, p.toLong * 8)
      var c = 0
      while (c < nCh) {
        val side = nCh == 2 && ((stereoMode == 8 && c == 1) ||
          (stereoMode == 9 && c == 0) || (stereoMode == 10 && c == 1))
        val kind = decodeSubframe(br, chans(c), n,
          if (side) bps + 1 else bps)
        kind match {
          case 0 => nC += 1
          case 1 => nV += 1
          case 2 => nF += 1
          case 3 => nL += 1
          case _ => return None
        }
        c += 1
      }
      if (br.fail) return None
      var t = 0
      if (nCh == 1) {
        while (t < n) {
          val v = chans(0)(t)
          if (v < sampLo || v > sampHi) return None
          out(filled + t) = v.toInt
          t += 1
        }
      } else if (nCh == 2) {
        val ch0 = chans(0); val ch1 = chans(1)
        while (t < n) {
          val (l, r) = stereoMode match {
            case 1 => (ch0(t), ch1(t))
            case 8 => (ch0(t), ch0(t) - ch1(t))
            case 9 => (ch1(t) + ch0(t), ch1(t))
            case _ =>
              val lr = (ch0(t) << 1) | (ch1(t) & 1L)
              ((lr + ch1(t)) >> 1, (lr - ch1(t)) >> 1)
          }
          if (l < sampLo || l > sampHi || r < sampLo || r > sampHi)
            return None
          out((filled + t) * 2) = l.toInt
          out((filled + t) * 2 + 1) = r.toInt
          t += 1
        }
      } else {
        while (t < n) {
          var c = 0
          while (c < nCh) {
            val v = chans(c)(t)
            if (v < sampLo || v > sampHi) return None
            out((filled + t) * nCh + c) = v.toInt
            c += 1
          }
          t += 1
        }
      }
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
    Some(FlacAudio(info, out, frames, nC, nV, nF, nL))
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
