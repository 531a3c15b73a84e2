package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** FLAC STREAMINFO bitfield parser vs the minimal writer. */
class FlacSpec extends AnyFunSuite {

  test("parseMeta round-trips buildStreamInfo across field boundaries " +
    "(20-bit rate, 3-bit channels, 5-bit bps, 36-bit samples)") {
    for {
      rate <- Seq(8000, 44100, 48000, 96000, 192000, (1 << 20) - 1)
      chan <- Seq(1, 2, 8)
      bps <- Seq(4, 16, 24, 32)
      samples <- Seq(0L, 1L, 44100L, (1L << 36) - 1)
    } {
      val m = Flac.parseMeta(Flac.buildStreamInfo(rate, chan, bps, samples)).get
      assert(m == Flac.FlacInfo(rate, chan, bps, samples, 4096, 4096),
        s"($rate,$chan,$bps,$samples)")
      assert(m.durationMs == samples * 1000L / rate)
    }
  }

  test("non-STREAMINFO leading blocks are skipped; garbage returns None") {
    val core = Flac.buildStreamInfo(44100, 2, 16, 88200L)
    // splice a padding block (type 1) before STREAMINFO
    val padded = core.take(4) ++
      Array[Byte](1, 0, 0, 3, 0, 0, 0) ++ core.drop(4)
    assert(Flac.parseMeta(padded) == Flac.parseMeta(core))
    assert(Flac.parseMeta("fLaCxx".getBytes).isEmpty)
    assert(Flac.parseMeta("not flac at all".getBytes).isEmpty)
    assert(Flac.parseMeta(core.take(20)).isEmpty)
    assert(Flac.parseMeta(null).isEmpty)
  }
}
