package graft.ops

/** Pure-JVM IMA ADPCM in WAV (format tag 0x11) — the LOSSY audio
  * codec leg of the honest-decode family (telephony/game audio;
  * 4 bits per sample). Unlike FLAC, decode(encode(s)) ≠ s — what the
  * oracle pins instead is the DECODER STATE MACHINE itself: encoder
  * and decoder share one predictor/step-index recurrence (the encoder
  * predicts from its own decoded output, the standard IMA design), so
  * a SQL replay of that recurrence from the signal formula reproduces
  * every decoded sample, the quantization error included, without
  * touching a byte.
  *
  * Block layout (WAV-IMA mono, blockAlign 36): 4-byte header
  * [predictor int16 LE | step index u8 | reserved 0] carrying sample
  * 0 verbatim, then 32 bytes of 4-bit codes (low nibble first) for
  * samples 1..64 — [[SamplesPerBlock]] = 65. The encoder RESETS the
  * step index to 0 at each block header (legal: the header exists
  * precisely so decoders never need cross-block state), which is what
  * keeps the oracle's recurrence per-block — 64 recursion steps
  * regardless of clip length, blocks parallel. */
object Adpcm {

  /** The IMA step-size table (89 entries, IMA ADPCM spec). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)

  /** Step-index adjustment per 3-bit magnitude code. */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** The step table as a DuckDB list literal (for oracle replay). */
  val StepTableSql: String = StepTable.mkString("[", ", ", "]")

  /** Index table as a DuckDB list literal. */
  val IndexTableSql: String = IndexTable.mkString("[", ", ", "]")

  val SamplesPerBlock = 65
  val BlockAlign = 36

  /** One encode/decode step of the shared recurrence: given state
    * (pred, idx) and the target sample, returns (code, newPred,
    * newIdx). The decoder applies the same delta arithmetic to the
    * code, so newPred IS the decoded sample. */
  def step(pred: Int, idx: Int, sample: Int): (Int, Int, Int) = {
    val st = StepTable(idx)
    var diff = sample - pred
    val sign = if (diff < 0) 8 else 0
    if (diff < 0) diff = -diff
    var code = 0
    if (diff >= st) { code |= 4; diff -= st }
    if (diff >= (st >> 1)) { code |= 2; diff -= st >> 1 }
    if (diff >= (st >> 2)) code |= 1
    val delta = (st >> 3) + (if ((code & 4) != 0) st else 0) +
      (if ((code & 2) != 0) st >> 1 else 0) +
      (if ((code & 1) != 0) st >> 2 else 0)
    val p0 = if (sign != 0) pred - delta else pred + delta
    val p = math.max(-32768, math.min(32767, p0))
    val ni = math.max(0, math.min(88, idx + IndexTable(code)))
    (code | sign, p, ni)
  }

  /** Decode one 4-bit code against state (pred, idx). */
  def decodeStep(pred: Int, idx: Int, code: Int): (Int, Int) = {
    val st = StepTable(idx)
    val delta = (st >> 3) + (if ((code & 4) != 0) st else 0) +
      (if ((code & 2) != 0) st >> 1 else 0) +
      (if ((code & 1) != 0) st >> 2 else 0)
    val p0 = if ((code & 8) != 0) pred - delta else pred + delta
    val p = math.max(-32768, math.min(32767, p0))
    val ni = math.max(0, math.min(88, idx + IndexTable(code & 7)))
    (p, ni)
  }

  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  /** Encode mono 16-bit samples (length a multiple of
    * [[SamplesPerBlock]]) as a WAV-IMA-ADPCM file: RIFF/WAVE, fmt
    * (tag 0x11, extra u16 samplesPerBlock), fact (true sample count),
    * data (blocks). */
  def encode(sampleRateHz: Int, samples: Array[Int]): Array[Byte] = {
    require(samples.length % SamplesPerBlock == 0 && samples.nonEmpty,
      s"sample count ${samples.length} not a multiple of $SamplesPerBlock")
    require(samples.forall(s => s >= -32768 && s <= 32767), "not 16-bit")
    val nBlocks = samples.length / SamplesPerBlock
    val dataLen = nBlocks * BlockAlign
    val out = new java.io.ByteArrayOutputStream()
    // RIFF size = bytes after this field: "WAVE" (4) + fmt chunk
    // (8-byte header + 20-byte body = 28) + fact (12) + data header
    // (8) + payload
    out.write("RIFF".getBytes); le32(out, 4 + 28 + 12 + 8 + dataLen)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(out, 20)
    le16(out, 0x11); le16(out, 1) // IMA ADPCM, mono
    le32(out, sampleRateHz)
    // byte rate: blocks per second * blockAlign (integer, nominal)
    le32(out, sampleRateHz * BlockAlign / SamplesPerBlock)
    le16(out, BlockAlign); le16(out, 4) // bits per sample
    le16(out, 2); le16(out, SamplesPerBlock) // cbSize, samplesPerBlock
    out.write("fact".getBytes); le32(out, 4); le32(out, samples.length)
    out.write("data".getBytes); le32(out, dataLen)
    var b = 0
    while (b < nBlocks) {
      val base = b * SamplesPerBlock
      var pred = samples(base)
      var idx = 0
      le16(out, pred & 0xffff); out.write(idx); out.write(0)
      var t = 1
      while (t < SamplesPerBlock) {
        val (c1, p1, i1) = step(pred, idx, samples(base + t))
        pred = p1; idx = i1
        val (c2, p2, i2) =
          if (t + 1 < SamplesPerBlock) step(pred, idx, samples(base + t + 1))
          else (0, pred, idx)
        pred = p2; idx = i2
        out.write((c1 & 0xf) | ((c2 & 0xf) << 4)) // low nibble first
        t += 2
      }
      b += 1
    }
    out.toByteArray
  }

  final case class AdpcmAudio(sampleRateHz: Int, samples: Array[Int],
                              nBlocks: Int)

  private def rdLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Decode a mono WAV-IMA-ADPCM stream: RIFF walk (unknown chunks
    * skipped), fmt tag 0x11 / mono / 4-bit / blockAlign 36 /
    * samplesPerBlock 65 verified, fact-count samples decoded through
    * the state machine. Any malformation, truncation, out-of-range
    * header index, or unsupported variant → None (all-frames-or-
    * nothing). */
  def decode(b: Array[Byte]): Option[AdpcmAudio] = {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
      b(10) != 'V' || b(11) != 'E') return None
    var o = 12L
    var rate = 0; var spb = 0; var fmtOk = false
    var nSamples = -1L
    var dataOff = -1L; var dataLen = -1L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val id = new String(b, oi, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = rdLe32(b, oi + 4)
      val p = oi + 8
      id match {
        case "fmt " if len >= 20 && p + 20 <= b.length =>
          val tag = rdLe16(b, p)
          val chan = rdLe16(b, p + 2)
          rate = rdLe32(b, p + 4).toInt
          val ba = rdLe16(b, p + 12)
          val bps = rdLe16(b, p + 14)
          spb = rdLe16(b, p + 18)
          fmtOk = tag == 0x11 && chan == 1 && bps == 4 &&
            ba == BlockAlign && spb == SamplesPerBlock
        case "fact" if len >= 4 && p + 4 <= b.length =>
          nSamples = rdLe32(b, p)
        case "data" =>
          dataOff = p.toLong; dataLen = len
        case _ => ()
      }
      o = p.toLong + len + (len & 1) // RIFF chunks are 2-byte aligned
    }
    if (!fmtOk || nSamples <= 0 || dataOff < 0 ||
      dataOff + dataLen > b.length) return None
    if (nSamples % SamplesPerBlock != 0) return None
    val nBlocks = (nSamples / SamplesPerBlock).toInt
    if (dataLen != nBlocks.toLong * BlockAlign) return None
    val out = new Array[Int](nSamples.toInt)
    var blk = 0
    while (blk < nBlocks) {
      val base = (dataOff + blk.toLong * BlockAlign).toInt
      var pred = (rdLe16(b, base) << 16) >> 16 // sign-extend
      var idx = b(base + 2) & 0xff
      if (idx > 88 || b(base + 3) != 0) return None
      val so = blk * SamplesPerBlock
      out(so) = pred
      var t = 1
      var nb = base + 4
      while (t < SamplesPerBlock) {
        val byte = b(nb) & 0xff
        val (p1, i1) = decodeStep(pred, idx, byte & 0xf)
        pred = p1; idx = i1
        out(so + t) = pred
        if (t + 1 < SamplesPerBlock) {
          val (p2, i2) = decodeStep(pred, idx, byte >> 4)
          pred = p2; idx = i2
          out(so + t + 1) = pred
        }
        t += 2; nb += 1
      }
      blk += 1
    }
    Some(AdpcmAudio(rate, out, nBlocks))
  }
}
