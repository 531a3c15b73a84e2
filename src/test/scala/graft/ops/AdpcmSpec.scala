package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** IMA-ADPCM ([[Adpcm]]): the shared encode/decode recurrence, WAV
  * container round-trip, quantization-quality bound, and the
  * all-frames-or-nothing corruption contract. */
class AdpcmSpec extends AnyFunSuite {

  private def sig(seed: Int, n: Int): Array[Int] =
    Array.tabulate(n)(t => (seed * 131 + t * t * 7 + t * 13) % 65536 - 32768)

  test("encode/decode round-trips the container and the decoded " +
    "samples equal a direct state-machine replay (encoder predicts " +
    "from its own decoded output)") {
    val s = sig(7, 65 * 4)
    val a = Adpcm.decode(Adpcm.encode(8000, s)).get
    assert(a.sampleRateHz == 8000 && a.nBlocks == 4 &&
      a.samples.length == s.length)
    // replay: per block, pred = s(block start), idx = 0, then step()
    val want = new Array[Int](s.length)
    for (b <- 0 until 4) {
      var pred = s(b * 65); var idx = 0
      want(b * 65) = pred
      for (t <- 1 until 65) {
        val (_, p, i) = Adpcm.step(pred, idx, s(b * 65 + t))
        pred = p; idx = i
        want(b * 65 + t) = pred
      }
    }
    assert(a.samples.toSeq == want.toSeq)
    // block-0 sample is verbatim; later samples track within the
    // codec's step-bounded error on this (harsh, wideband) signal
    assert(a.samples(0) == s(0) && a.samples(65) == s(65))
  }

  test("on a smooth signal the 4-bit codec tracks closely (mean " +
    "abs error well under the max step)") {
    val s = Array.tabulate(65 * 2)(t => (t * 50) % 4096 - 2048)
    val a = Adpcm.decode(Adpcm.encode(8000, s)).get
    val mae = s.indices.map(t => math.abs(s(t) - a.samples(t))).sum /
      s.length.toDouble
    assert(mae < 200, s"mean abs error $mae")
  }

  test("decode step clamps predictor and index at both ends") {
    // drive pred to the rails with max-magnitude codes
    var pred = 32000; var idx = 88
    val (p1, _) = Adpcm.decodeStep(pred, idx, 0x7) // +big
    assert(p1 == 32767)
    val (p2, _) = Adpcm.decodeStep(-32000, 88, 0xf) // -big
    assert(p2 == -32768)
    val (_, i1) = Adpcm.decodeStep(0, 0, 0x0) // index -1 clamps to 0
    assert(i1 == 0)
    val (_, i2) = Adpcm.decodeStep(0, 88, 0x7) // index +8 clamps to 88
    assert(i2 == 88)
  }

  test("malformed streams return None: wrong tag, truncation, bad " +
    "header index, stereo, non-multiple fact count") {
    val s = sig(3, 65 * 2)
    val good = Adpcm.encode(8000, s)
    assert(Adpcm.decode(good).isDefined)
    assert(Adpcm.decode(good.take(good.length - 5)).isEmpty, "truncated")
    assert(Adpcm.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Adpcm.decode(Codecs.encodeWavMono(8000,
      Array[Short](1, 2, 3))).isEmpty, "PCM WAV is not ADPCM")
    // corrupt the per-block step index past 88
    val badIdx = good.clone()
    // find data chunk: header is fixed-layout here (12+28+12+8)
    val dataOff = 12 + 28 + 12 + 8
    badIdx(dataOff + 2) = 99.toByte
    assert(Adpcm.decode(badIdx).isEmpty, "index > 88 must fail")
    assert(Adpcm.decode(null).isEmpty)
  }

  test("RIFF chunk size declares the true file length (external WAV " +
    "tools trust it): size field == bytes.length - 8") {
    for (blocks <- Seq(1, 2, 5)) {
      val b = Adpcm.encode(8000, sig(7, 65 * blocks))
      val declared = (b(4) & 0xffL) | ((b(5) & 0xffL) << 8) |
        ((b(6) & 0xffL) << 16) | ((b(7) & 0xffL) << 24)
      assert(declared == b.length - 8,
        s"RIFF size $declared vs ${b.length - 8} at $blocks blocks")
    }
  }
}
