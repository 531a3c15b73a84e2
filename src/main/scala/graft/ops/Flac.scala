package graft.ops

/** Pure-JVM FLAC STREAMINFO metadata (the lossless-audio leg of the
  * media-metadata family): `fLaC` magic, metadata-block walk
  * ([last(1)|type(7)][u24 length]), and the packed STREAMINFO
  * bitfields — sample rate (20 bits), channels−1 (3), bits-per-
  * sample−1 (5), total samples (36) — per RFC 9639 §8.2. No frame
  * decode; duration is integer-exact (samples·1000 / rate) so a SQL
  * oracle can recompute it from build parameters. */
object Flac {

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
