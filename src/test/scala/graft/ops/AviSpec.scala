package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The round-11 honest-codec widening: AVI container parse/write
  * round-trips, REAL pixel decode for uncompressed DIB and Microsoft
  * RLE8 through ImageIO's BMP reader (the [[Avi.frameToBmp]] re-wrap),
  * codec-independent features, and the [[FrameDecoder]] null
  * contract on corrupt frames. */
class AviSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def pattern(k: Int): Array[Byte] = {
    val gray = new Array[Byte](32 * 32)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        gray(y * 32 + x) = if ((y / 4) * 8 + (x / 4) < k) -1 else 0
        x += 1
      }
      y += 1
    }
    gray
  }

  test("buildAvi → parseMeta/frames round-trip for both codecs; " +
    "garbage and metadata-less bytes parse to None") {
    val fs = Seq(pattern(9), pattern(20), pattern(33))
    val dib = Avi.buildAvi(32, 32, 40000L,
      fs.map(Avi.encodeDib24(32, 32, _)), 0)
    val rle = Avi.buildAvi(32, 32, 40000L,
      fs.map(Avi.encodeRle8(32, 32, _)), 1)
    val mi = Avi.parseMeta(dib).get
    assert(mi.width == 32 && mi.height == 32 && mi.nFrames == 3 &&
      mi.usPerFrame == 40000L && mi.codec == "dib" && mi.bpp == 24)
    assert(mi.durationMs == 120L)
    val ri = Avi.parseMeta(rle).get
    assert(ri.codec == "mrle" && ri.bpp == 8)
    assert(Avi.frames(dib).get.length == 3)
    assert(Avi.frames(rle).get.length == 3)
    // frame chunks round-trip byte-exact
    val (o0, l0) = Avi.frames(dib).get.head
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(dib, o0, o0 + l0),
      Avi.encodeDib24(32, 32, fs.head)))
    assert(Avi.parseMeta(Array.tabulate[Byte](64)(_.toByte)).isEmpty)
    assert(Avi.parseMeta(null).isEmpty)
    assert(Avi.frames("RIFF....AVI ".getBytes).isEmpty)
    // strict validators accept every writer output...
    assert(fs.forall(f => Avi.rle8Valid(Avi.encodeRle8(32, 32, f), 32, 32)))
    assert(fs.forall(f =>
      Avi.encodeDib24(32, 32, f).length == Avi.dibRasterSize(32, 32, 24)))
    // ...and reject truncation, dangling half-pairs, and missing EOD
    val ok = Avi.encodeRle8(32, 32, fs.head)
    assert(!Avi.rle8Valid(java.util.Arrays.copyOf(ok, ok.length - 2), 32, 32))
    assert(!Avi.rle8Valid(java.util.Arrays.copyOf(ok, ok.length - 1), 32, 32))
    assert(!Avi.rle8Valid(Array[Byte](40, 1), 32, 32)) // run, no EOD
  }

  test("ImageIO really decodes both codecs through the BMP re-wrap: " +
    "pattern k ⇒ aHash 2^k − 1, identical for raw DIB and RLE8") {
    for (k <- Seq(1, 9, 20, 33, 63)) {
      val info24 = Avi.AviInfo(32, 32, 40000L, 1, "DIB ", 24, 0L)
      val info8 = Avi.AviInfo(32, 32, 40000L, 1, "mrle", 8, 1L)
      val hDib = Codecs.aHash64(
        Avi.frameToBmp(info24, Avi.encodeDib24(32, 32, pattern(k))))
      val hRle = Codecs.aHash64(
        Avi.frameToBmp(info8, Avi.encodeRle8(32, 32, pattern(k))))
      assert(hDib.contains((1L << k) - 1), s"k=$k dib=$hDib")
      assert(hRle === hDib, s"k=$k rle=$hRle dib=$hDib")
    }
  }

  test("AviFrames is a BUILT-IN decoder for 'avi'/'dib'/'mrle': real " +
    "frame features, the -1.0 absent-frame sentinel, and null on a " +
    "corrupt mid-clip frame (all-frames-or-nothing)") {
    val good = Avi.buildAvi(32, 32, 40000L,
      Seq(pattern(9), pattern(20)).map(Avi.encodeDib24(32, 32, _)), 0)
    // mid-clip corrupt frame: an RLE8 stream of garbage escapes that
    // the BMP reader rejects
    val corrupt = Avi.buildAvi(32, 32, 40000L,
      Seq(Avi.encodeRle8(32, 32, pattern(9)),
        Array.tabulate[Byte](7)(i => (i * 17 + 3).toByte),
        Avi.encodeRle8(32, 32, pattern(33))), 1)
    val out = FrameDecoder.forCodec("avi")
      .decodeBatch(Array(good, corrupt, null), 4)
    assert(out(0) != null)
    assert(out(0)(0) == ((1L << 9) - 1).toDouble)
    assert(out(0)(1) == ((1L << 20) - 1).toDouble)
    assert(out(0)(2) == -1.0 && out(0)(3) == -1.0)
    assert(out(1) == null,
      s"corrupt clip decoded: ${Option(out(1)).map(_.toSeq)}")
    assert(out(2) == null)
  }

  test("aviPatternColumn end-to-end through decodeColumn: mixed " +
    "DIB/RLE8 rows produce the formula features via the seam") {
    val s = spark
    import s.implicits._
    val df = Multimodal.aviPatternColumn(
      Seq((1L, 9, 20, 33, 0), (2L, 39, 8, 12, 1))
        .toDF("id", "k0", "k1", "k2", "rle"),
      Seq("k0", "k1", "k2"), "rle")
    val got = Multimodal.decodeColumn(df, "media", "avi", featDim = 3)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(9, 20, 33).map(k => ((1L << k) - 1).toDouble))
    assert(got(2L) == Seq(39, 8, 12).map(k => ((1L << k) - 1).toDouble))
  }
}
