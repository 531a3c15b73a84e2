package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** H.264 SPS exp-Golomb parser vs the minimal writer, the avcC
  * wrapper, and the MP4-embedded Spark round-trip — bitstream
  * metadata only, no frame decode. */
class AvcSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("parseSps round-trips buildSps for mb-aligned and cropped " +
    "dimensions across baseline/main/high profiles") {
    for {
      (w, h) <- Seq((1920, 1080), (1280, 720), (640, 360), (320, 240),
        (16, 16), (1918, 1078), (354, 290), (2, 2))
      profile <- Seq(66, 77, 100)
    } {
      val sps = Avc.buildSps(w, h, profile, levelIdc = 41)
      val m = Avc.parseSps(sps).get
      assert(m.width == w && m.height == h, s"($w,$h,$profile) -> $m")
      assert(m.profileIdc == profile && m.levelIdc == 41)
      assert(m.frameMbsOnly)
    }
  }

  test("NAL header optional; truncated/degenerate NALs return None " +
    "and arbitrary bytes never throw (the SPS grammar has no magic — " +
    "callers pass avcC-extracted NALs, where SPS-ness is structural)") {
    val sps = Avc.buildSps(640, 480)
    assert(Avc.parseSps(sps.drop(1)) == Avc.parseSps(sps)) // headerless
    assert(Avc.parseSps(sps.take(4)).isEmpty)
    assert(Avc.parseSps(null).isEmpty)
    assert(Avc.parseSps(Array[Byte](0x67, 0, 0, 0, 0, 0)).isEmpty)
    // totality fuzz: a deterministic pseudo-random byte soup must
    // parse-or-None, never throw
    var seed = 0x9e3779b97f4a7c15L
    (1 to 200).foreach { n =>
      val b = new Array[Byte](n % 64 + 4)
      b.indices.foreach { i =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        b(i) = (seed >>> 56).toByte
      }
      Avc.parseSps(b) // must not throw
    }
  }

  test("emulation-prevention bytes are stripped before bit reading") {
    // craft an RBSP whose encoded form contains 00 00 03: take a
    // valid SPS and verify inserting 03 after any 00 00 run parses to
    // the same fields (the writer asserts it never NEEDS one, so
    // inject manually into a synthetic run)
    val sps = Avc.buildSps(1920, 1080, 100, 41)
    val withEp = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var zeros = 0
      sps.foreach { b =>
        if (zeros == 2) { out += 3; zeros = 0 }
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      out.toArray
    }
    assert(Avc.parseSps(withEp) == Avc.parseSps(sps))
  }

  test("avcC wraps and unwraps the SPS; Mp4.parseMeta surfaces the " +
    "bitstream dimensions next to the container's display hints") {
    val sps = Avc.buildSps(1918, 1078, 100, 40)
    val avcc = Avc.buildAvcC(sps)
    assert(Avc.spsFromAvcC(avcc).map(Avc.parseSps(_).get) ==
      Some(Avc.SpsInfo(100, 40, 1918, 1078, frameMbsOnly = true)))
    val mp4 = Mp4.buildMinimal(1000L, 4000L, 1920, 1088, "avc1", "vide",
      2048, avcC = Some(avcc))
    val m = Mp4.parseMeta(mp4).get
    val t = m.tracks.head
    assert(t.width == 1920 && t.height == 1088) // container hint
    assert(t.sps.contains(Avc.SpsInfo(100, 40, 1918, 1078,
      frameMbsOnly = true))) // bitstream truth
    // without avcC the sps fields stay empty
    val plain = Mp4.buildMinimal(1000L, 4000L, 1920, 1088, "hev1", "vide", 1)
    assert(Mp4.parseMeta(plain).get.tracks.head.sps.isEmpty)
  }

  test("avcMp4BuildColumn -> mp4MetaColumn Spark round-trip recovers " +
    "exact SPS dimensions for every row") {
    val s = spark
    import s.implicits._
    val df = (1L to 40L).map { i =>
      (i, 1000L + i * 10, (2 * (i % 317 + 50)).toInt,
        (2 * (i % 173 + 40)).toInt,
        Seq(66, 77, 100)((i % 3).toInt), Seq(30, 31, 40, 41, 51)((i % 5).toInt),
        (100 + i).toInt)
    }.toDF("id", "dur", "w", "h", "profile", "level", "mdat")
    val built = Multimodal.avcMp4BuildColumn(df, "dur", "w", "h",
      "profile", "level", "mdat")
    val out = Multimodal.mp4MetaColumn(built, "media")
      .select("w", "h", "profile", "level",
        "mp4.width", "mp4.height", "mp4.sps_profile", "mp4.sps_level",
        "mp4.sps_width", "mp4.sps_height")
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      val (w, h) = (r.getInt(0), r.getInt(1))
      assert(r.getInt(4) == (w + 15) / 16 * 16) // container: mb-rounded
      assert(r.getInt(5) == (h + 15) / 16 * 16)
      assert(r.getInt(6) == r.getInt(2) && r.getInt(7) == r.getInt(3))
      assert(r.getInt(8) == w && r.getInt(9) == h) // SPS: exact
    }
  }
}
