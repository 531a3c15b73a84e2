package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** MPEG audio frame-header parser vs the minimal writer — sync scan,
  * table decode, exact frame walk, VBR detection; no sample decode. */
class Mp3Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("parseMeta round-trips buildFrames across the full table grid " +
    "(both versions, every bitrate/samplerate index, mono+stereo)") {
    for {
      mpeg1 <- Seq(true, false)
      brIdx <- 1 to 14
      srIdx <- 0 to 2
      mono <- Seq(true, false)
    } {
      val n = 7
      val b = Mp3.buildFrames(mpeg1, brIdx, srIdx, n, mono = mono)
      val m = Mp3.parseMeta(b).get
      val rates = if (mpeg1) Array(44100, 48000, 32000)
      else Array(22050, 24000, 16000)
      val kbps = (if (mpeg1)
        Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
      else
        Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)) (brIdx)
      val spf = if (mpeg1) 1152 else 576
      assert(m.version == (if (mpeg1) "1" else "2"))
      assert(m.sampleRateHz == rates(srIdx), s"$mpeg1 $brIdx $srIdx")
      assert(m.bitrateKbps == kbps)
      assert(m.channels == (if (mono) 1 else 2))
      assert(m.nFrames == n.toLong)
      assert(!m.isVbr)
      assert(m.durationMs == n.toLong * spf * 1000L / rates(srIdx))
    }
  }

  test("a leading ID3v2 tag (syncsafe size) is skipped; leading garbage " +
    "resyncs; pure garbage and truncation return None") {
    val core = Mp3.buildFrames(mpeg1 = true, brIdx = 9, srIdx = 0, nFrames = 5)
    val tagged = Mp3.buildFrames(mpeg1 = true, brIdx = 9, srIdx = 0,
      nFrames = 5, withId3 = true, id3Bytes = 200)
    assert(Mp3.parseMeta(tagged).get == Mp3.parseMeta(core).get)
    // garbage prefix without a sync pattern — the scan walks past it
    val junk = "this is not audio ".getBytes ++ core
    assert(Mp3.parseMeta(junk).get.nFrames == 5L)
    assert(Mp3.parseMeta("plain text, no sync".getBytes).isEmpty)
    assert(Mp3.parseMeta(core.take(3)).isEmpty)
    assert(Mp3.parseMeta(null).isEmpty)
    // 0xFF run: sync bits present but the layer field reads Layer I
    // and the bitrate index is invalid (1111) → rejected, not mis-parsed
    assert(Mp3.parseMeta(Array.fill[Byte](64)(0xff.toByte)).isEmpty)
  }

  test("frame walk is exact for VBR (alternating bitrate index) and " +
    "flags is_vbr; truncated tail frames stop the count") {
    val vbr = Mp3.buildFrames(mpeg1 = true, brIdx = 5, srIdx = 1,
      nFrames = 9, vbrStep = 3)
    val m = Mp3.parseMeta(vbr).get
    assert(m.isVbr && m.nFrames == 9L && m.bitrateKbps == 64)
    // cut the last frame's header off mid-way: the walk counts 8 whole
    // frames plus the orphan header-less bytes are ignored
    val cbr = Mp3.buildFrames(mpeg1 = false, brIdx = 8, srIdx = 2, nFrames = 4)
    val frameLen = 72 * 64 * 1000 / 16000 // MPEG2 idx8=64kbps @16kHz
    val cut = cbr.take(cbr.length - frameLen + 2)
    assert(Mp3.parseMeta(cut).get.nFrames == 3L)
  }

  test("mp3BuildColumn -> mp3MetaColumn Spark round-trip matches the " +
    "scalar parser row-for-row") {
    val s = spark
    import s.implicits._
    val df = (1L to 60L).map { i =>
      (i, i % 2 == 0, (i % 12 + 1).toInt, (i % 3).toInt,
        (1 + i % 17).toInt, i % 5 == 0, if (i % 4 == 0) 2 else 0)
    }.toDF("id", "mpeg1", "br", "sr", "nf", "mono", "vbr")
    val built = Multimodal.mp3BuildColumn(df, "mpeg1", "br", "sr", "nf",
      "mono", "vbr")
    val out = Multimodal.mp3MetaColumn(built, "media")
      .select("id", "mpeg1", "br", "sr", "nf", "mono", "vbr", "mp3.*")
      .collect()
    assert(out.length == 60)
    out.foreach { r =>
      val expect = Mp3.parseMeta(Mp3.buildFrames(r.getBoolean(1),
        r.getInt(2), r.getInt(3), r.getInt(4), mono = r.getBoolean(5),
        vbrStep = r.getInt(6))).get
      assert(r.getString(7) == expect.version)
      assert(r.getInt(8) == expect.sampleRateHz)
      assert(r.getInt(9) == expect.bitrateKbps)
      assert(r.getInt(10) == expect.channels)
      assert(r.getLong(11) == expect.nFrames)
      assert(r.getLong(12) == expect.durationMs)
      assert(r.getBoolean(13) == expect.isVbr)
    }
  }
}
