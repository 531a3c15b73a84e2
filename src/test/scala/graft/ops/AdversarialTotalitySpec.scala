package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Adversarial totality: crafted 32-bit offsets/counts near
  * Int.MaxValue must make the binary parsers ([[Archive]], [[Sniff]],
  * [[Exif]]) return degraded-but-total results — never wrap an Int
  * bounds check and throw — and [[Robots.decisionColumn]] must survive
  * null path values. Each test byte-patches REAL fixtures built by the
  * repo's own encoders, plus a sliding 4-byte 0x7FFFFFFE overwrite
  * fuzz across the whole fixture. */
class AdversarialTotalitySpec extends AnyFunSuite {

  private def patch32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xff).toByte
    b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte
    b(o + 3) = ((v >> 24) & 0xff).toByte
  }
  private def read32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private val zipDocs = Seq(
    ("a.txt", "hello archive world".getBytes(UTF_8)),
    ("b.txt", ("second member " * 20).getBytes(UTF_8)))

  test("ZIP: crafted EOCD central-directory offset near 2^32 yields " +
    "empty, not AIOOBE") {
    val zip = Archive.buildZip(zipDocs, _ => true)
    for (bad <- Seq(0xfffffff0L, 0x80000010L, 0x7ffffffeL)) {
      val z = zip.clone()
      patch32(z, z.length - 22 + 16, bad)
      assert(Archive.parseZip(z) == Vector.empty)
    }
  }

  test("ZIP: crafted local-header offset / sizes flip ok=false on that " +
    "member; others still verify") {
    val zip = Archive.buildZip(zipDocs, _ => false)
    val cdOff = read32(zip, zip.length - 22 + 16).toInt
    // entry 0's local-header offset -> near-max garbage
    val z1 = zip.clone(); patch32(z1, cdOff + 42, 0x7ffffff0L)
    val m1 = Archive.parseZip(z1)
    assert(m1.map(_.name) == Vector("a.txt", "b.txt"))
    assert(!m1(0).ok && m1(1).ok)
    // entry 0's compressed size -> dataOff+compSize would wrap an Int
    val z2 = zip.clone(); patch32(z2, cdOff + 20, 0x7ffffff0L)
    val m2 = Archive.parseZip(z2)
    assert(!m2(0).ok && m2(1).ok)
    // entry 0's uncompressed size -> 2 GiB declaration must not allocate
    val z3 = zip.clone(); patch32(z3, cdOff + 24, 0x7ffffffeL)
    val m3 = Archive.parseZip(z3)
    assert(!m3(0).ok && m3(1).ok)
  }

  test("ZIP: sliding 4-byte 0x7FFFFFFE overwrite at every offset stays " +
    "total") {
    val zip = Archive.buildZip(zipDocs, i => i % 2 == 0)
    var i = 0
    while (i + 4 <= zip.length) {
      val z = zip.clone()
      patch32(z, i, 0x7ffffffeL)
      Archive.parseZip(z) // must not throw; result content is unconstrained
      i += 1
    }
  }

  test("Sniff: RIFF/WAVE chunk size near Int.MaxValue must not wrap " +
    "the walk cursor") {
    val junk = new Array[Byte](32)
    "RIFF".getBytes(UTF_8).copyToArray(junk, 0)
    patch32(junk, 4, 24L)
    "WAVE".getBytes(UTF_8).copyToArray(junk, 8)
    "JUNK".getBytes(UTF_8).copyToArray(junk, 12)
    patch32(junk, 16, 0x7ffffff4L) // 8 + sz wraps Int; Long walk must not
    assert(Sniff.detect(junk) == "wav")
    // and a fuzz across a real ADPCM-WAV fixture
    val wav = Adpcm.encode(8000, Array.tabulate(260)(i => i * 37 % 251 - 125))
    var i = 0
    while (i + 4 <= wav.length) {
      val w = wav.clone()
      patch32(w, i, 0x7ffffffeL)
      Sniff.detect(w)
      i += 1
    }
  }

  test("EXIF: crafted IFD pointer / sliding overwrite keeps parse and " +
    "stripGps total in both byte orders") {
    val base = Codecs.encodeJpeg(8, 8, Array.fill(8 * 8 * 3)(96.toByte))
    for (be <- Seq(false, true)) {
      val jpeg = Exif.withExif(base, Exif.tiffBytes(be, "MakerX", "M9", 3,
        "2014:01:01 00:00:00", "2015:06:15 12:00:00", Some((51507L, -123L))))
      // locate the TIFF header (after the Exif marker's 6-byte tag)
      val tag = "Exif".getBytes(UTF_8)
      var at = -1
      var i = 0
      while (at < 0 && i + 6 <= jpeg.length) {
        if (jpeg(i) == tag(0) && jpeg(i + 1) == tag(1) &&
          jpeg(i + 2) == tag(2) && jpeg(i + 3) == tag(3) &&
          jpeg(i + 4) == 0 && jpeg(i + 5) == 0) at = i + 6
        i += 1
      }
      assert(at > 0)
      // IFD0 pointer (TIFF offset 4) -> 0x7FFFFFFE: None, not AIOOBE
      val j1 = jpeg.clone(); patch32(j1, at + 4, 0x7ffffffeL)
      assert(Exif.parse(j1).isEmpty)
      // sliding 4-byte overwrite across the entire file
      var o = 0
      while (o + 4 <= jpeg.length) {
        val j = jpeg.clone()
        patch32(j, o, 0x7ffffffeL)
        Exif.parse(j)
        Exif.stripGps(j)
        o += 1
      }
    }
  }

  test("Robots.decisionColumn: null path and null robots text decide " +
    "without NPE") {
    val spark = SparkTestSession.spark
    val schema = StructType(Seq(
      StructField("robots", StringType, nullable = true),
      StructField("path", StringType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row("User-agent: *\nDisallow: /private\n", null),
      Row(null, "/private/x"),
      Row(null, null),
      Row("User-agent: *\nDisallow: /private\n", "/private/x"))
    val df = spark.createDataFrame(rows, schema)
    val out = Robots.decisionColumn(df, "robots", "path", "graftbot")
      .collect().map(r => r.getBoolean(2)).toSeq
    // null robots => allow; null path => "" which no /-rule matches
    assert(out == Seq(true, true, true, false))
  }
}
