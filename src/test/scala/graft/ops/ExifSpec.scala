package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** EXIF ([[Exif]]): TIFF round-trip in both byte orders, millidegree-
  * exact GPS rationals, the GPS-strip privacy contract (fields kept,
  * location gone, scan data untouched, canonical 114-byte saving),
  * and totality on garbage. */
class ExifSpec extends AnyFunSuite {

  private val base = Codecs.encodeJpeg(8, 8, Array.fill(8 * 8 * 3)(96.toByte))

  private def build(be: Boolean, gps: Option[(Long, Long)],
                    orient: Int = 3): Array[Byte] =
    Exif.withExif(base, Exif.tiffBytes(be, "MakerX", "M9", orient,
      "2014:01:01 00:00:00", "2015:06:15 12:00:00", gps))

  test("round-trips all fields in both byte orders, GPS sign via " +
    "N/S/E/W refs, millidegree-exact") {
    for (be <- Seq(false, true); (lat, lon) <- Seq(
        (51507L, -123L), (-33868L, 151209L), (0L, 0L), (-90000L, 180000L))) {
      val e = Exif.parse(build(be, Some((lat, lon)))).get
      assert(e.bigEndian == be && e.make == "MakerX" && e.model == "M9")
      assert(e.orientation == 3)
      assert(e.dateTime == "2014:01:01 00:00:00")
      assert(e.dateTimeOriginal == "2015:06:15 12:00:00")
      assert(e.gpsLatMilli.contains(lat) && e.gpsLonMilli.contains(lon),
        s"be=$be lat=$lat lon=$lon got=${e.gpsLatMilli}/${e.gpsLonMilli}")
    }
  }

  test("no-GPS build parses with hasGps=false and no GPS IFD bytes") {
    val e = Exif.parse(build(false, None)).get
    assert(!e.hasGps && e.gpsLonMilli.isEmpty && e.make == "MakerX")
    // the GPS block costs exactly 114 bytes: 12 (IFD0 pointer entry)
    // + 54 (4-entry GPS IFD) + 48 (two 3-rational payloads)
    assert(build(false, Some((1234L, -5678L))).length ==
      build(false, None).length + 114)
  }

  test("stripGps removes exactly the canonical GPS block, keeps every " +
    "other field, and leaves non-APP1 bytes identical") {
    for (be <- Seq(false, true)) {
      val withGps = build(be, Some((-48858L, 2294L)))
      val (cleaned, removed) = Exif.stripGps(withGps)
      assert(removed == 114)
      val e = Exif.parse(cleaned).get
      assert(!e.hasGps && e.bigEndian == be && e.make == "MakerX" &&
        e.model == "M9" && e.orientation == 3 &&
        e.dateTimeOriginal == "2015:06:15 12:00:00")
      assert(java.util.Arrays.equals(Exif.dropApp1(withGps),
        Exif.dropApp1(cleaned)))
      // idempotent: a second strip is a no-op
      val (again, r2) = Exif.stripGps(cleaned)
      assert(r2 == 0 && (again eq cleaned))
    }
  }

  test("total on garbage: truncation, bad TIFF magic, absent APP1") {
    assert(Exif.parse(null).isEmpty)
    assert(Exif.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(Exif.parse(base).isEmpty) // plain JPEG, no EXIF
    val good = build(false, Some((1L, 2L)))
    for (cut <- Seq(4, 20, 60, good.length - base.length))
      assert(Exif.parse(good.take(cut)).isEmpty ||
        Exif.parse(good.take(cut)).isDefined) // never throws
    // corrupt the TIFF magic (offset: SOI2 + APP0 + 4 marker/len + 6 id)
    val bad = good.clone()
    val app1 = findApp1(bad)
    bad(app1 + 10) = 0x77 // 'II' -> 'Iw'
    assert(Exif.parse(bad).isEmpty)
    // stripGps on garbage returns the input untouched
    val junk = Array.fill[Byte](32)(0x42)
    val (same, r) = Exif.stripGps(junk)
    assert(r == 0 && (same eq junk))
  }

  test("withExif replaces an existing APP1 instead of stacking a " +
    "second one") {
    val twice = Exif.withExif(build(false, Some((7L, 8L))),
      Exif.tiffBytes(false, "Other", "Z", 1,
        "2020:01:01 00:00:00", "2020:01:01 00:00:00", None))
    val e = Exif.parse(twice).get
    assert(e.make == "Other" && !e.hasGps)
    assert(countApp1(twice) == 1)
  }

  private def findApp1(b: Array[Byte]): Int = {
    var o = 2
    while (o + 4 <= b.length) {
      if ((b(o) & 0xff) == 0xff && (b(o + 1) & 0xff) == 0xe1) return o
      val len = ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      o += 2 + len
    }
    -1
  }

  private def countApp1(b: Array[Byte]): Int = {
    var o = 2; var n = 0
    var going = true
    while (going && o + 4 <= b.length && (b(o) & 0xff) == 0xff) {
      val m = b(o + 1) & 0xff
      if (m == 0xda || m == 0xd9) going = false
      else {
        if (m == 0xe1) n += 1
        o += 2 + (((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff))
      }
    }
    n
  }
}
