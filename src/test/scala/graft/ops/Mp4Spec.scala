package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** ISO BMFF box-walk parser vs the minimal writer, plus the Spark
  * column round-trip — container metadata only, no frame decode. */
class Mp4Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("parseMeta round-trips buildMinimal exactly (duration, dims, " +
    "codec 4cc, handler, mdat size, integer bitrate)") {
    val b = Mp4.buildMinimal(timescale = 1000L, durationTicks = 2500L,
      width = 640, height = 360, codec = "avc1", handler = "vide",
      mdatBytes = 10000)
    val m = Mp4.parseMeta(b).get
    assert(m.timescale == 1000L && m.durationTicks == 2500L)
    assert(m.durationMs == 2500L)
    assert(m.mdatBytes == 10000L)
    assert(m.bitrateBps == 10000L * 8 * 1000 / 2500)
    assert(m.tracks == List(Mp4.TrackInfo("vide", "avc1", 640, 360)))
  }

  test("non-1000 timescale converts to ms via integer tick math") {
    val b = Mp4.buildMinimal(90000L, 90000L * 7 + 45000L, 1920, 1080,
      "hev1", "vide", 1)
    val m = Mp4.parseMeta(b).get
    assert(m.durationMs == 7500L)
    assert(m.tracks.head.width == 1920 && m.tracks.head.height == 1080)
  }

  test("64-bit largesize mdat parses (the >4GiB header form)") {
    val b = Mp4.buildMinimal(1000L, 1000L, 320, 240, "vp09", "vide",
      4096, largeMdat = true)
    val m = Mp4.parseMeta(b).get
    assert(m.mdatBytes == 4096L, s"largesize mdat: ${m.mdatBytes}")
  }

  test("unknown boxes are skipped by size; garbage and truncation " +
    "return None instead of throwing") {
    val core = Mp4.buildMinimal(1000L, 1500L, 64, 64, "avc1", "vide", 8)
    // prepend a 'free' box and append an unknown box — still parses
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 1, 2, 3, 4)
    val unk = Array[Byte](0, 0, 0, 9, 'x', 'y', 'z', 'w', 0)
    val m = Mp4.parseMeta(free ++ core ++ unk).get
    assert(m.durationMs == 1500L && m.tracks.head.codec == "avc1")
    assert(Mp4.parseMeta("not an mp4 at all, just text bytes".getBytes).isEmpty)
    assert(Mp4.parseMeta(core.take(20)).isEmpty) // truncated mid-moov
    assert(Mp4.parseMeta(Array.fill[Byte](64)(-1)).isEmpty)
    assert(Mp4.parseMeta(null).isEmpty)
    // a TRUNCATED version-1 mvhd (28-byte payload, v1 needs 32) at the
    // very end of the buffer: the v1 read would index past the array —
    // must degrade to the in-bounds v0 read, never throw
    val bb = java.nio.ByteBuffer.allocate(44)
    bb.putInt(44).put("moov".getBytes) // moov box wrapping everything
    bb.putInt(36).put("mvhd".getBytes) // mvhd: 8 hdr + 28 payload
    bb.put(1.toByte) // version 1
    // 27 remaining payload bytes stay zero
    val truncated = bb.array()
    assert(Mp4.parseMeta(truncated).isEmpty ||
      Mp4.parseMeta(truncated).nonEmpty) // totality: no throw
  }

  test("Spark column round-trip: build per-row MP4s, parse them back, " +
    "fields match the source parameters row-for-row") {
    import spark.implicits._
    val src = Seq((1L, 3000L, 320, 240, "avc1", 999),
      (2L, 7000L, 1280, 720, "hev1", 123456),
      (3L, 60000L, 16, 16, "vp09", 1))
      .toDF("id", "dur_ms", "w", "h", "codec", "mdat")
    val got = Multimodal.mp4MetaColumn(
      Multimodal.mp4BuildColumn(src, "dur_ms", "w", "h", "codec", "mdat"),
      "media")
      .select("id", "dur_ms", "w", "h", "codec", "mdat", "mp4.*")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      val r = got(id)
      assert(r.getAs[Long]("duration_ms") == r.getAs[Long]("dur_ms"))
      assert(r.getAs[Int]("width") == r.getAs[Int]("w"))
      assert(r.getAs[Int]("height") == r.getAs[Int]("h"))
      assert(r.getAs[String]("codec") == r.getAs[String]("codec"))
      assert(r.getAs[Long]("mdat_bytes") == r.getAs[Int]("mdat").toLong)
      assert(r.getAs[Int]("n_tracks") == 1)
      assert(r.getAs[String]("handler") == "vide")
    }
  }
}
