package graft.ops

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM EXIF (TIFF-in-JPEG APP1) metadata: marker-segment walk,
  * both TIFF byte orders, IFD0 → Exif-IFD → GPS-IFD pointer chase,
  * ASCII/SHORT/LONG/RATIONAL value decode — and the privacy op a
  * training-data pipeline actually runs: GPS-coordinate STRIPPING
  * with the image scan data untouched (EXIF GPS is the canonical
  * location-PII channel in crawled images; curation pipelines strip
  * it before archiving). References: CIPA DC-008 / TIFF 6.0 (tag
  * ids, type sizes, IFD layout), ISO/IEC 10918-1 Annex B (JPEG
  * marker framing).
  *
  * The parser is total on garbage: any out-of-bounds offset, short
  * segment, or missing header yields None / an absent field, never a
  * throw. The strip is parse-then-reserialize: a canonical APP1 is
  * rebuilt from the parsed fields minus the GPS IFD (writer shared
  * with the fixture builder), so stripped output is well-formed by
  * construction whatever the input layout was.
  *
  * Scale shape: per-row byte work behind partition-local batched
  * maps (see [[Multimodal.exifMetaColumn]]); bytes never shuffle. */
object Exif {

  final case class ExifInfo(bigEndian: Boolean, make: String,
                            model: String, orientation: Int,
                            dateTime: String, dateTimeOriginal: String,
                            gpsLatMilli: Option[Long],
                            gpsLonMilli: Option[Long]) {
    def hasGps: Boolean = gpsLatMilli.isDefined
  }

  // TIFF tag ids (DC-008 §4.6.3-4.6.6)
  private val TagMake = 0x010f
  private val TagModel = 0x0110
  private val TagOrientation = 0x0112
  private val TagDateTime = 0x0132
  private val TagExifIfd = 0x8769
  private val TagGpsIfd = 0x8825
  private val TagDateTimeOriginal = 0x9003
  private val TagGpsLatRef = 0x0001
  private val TagGpsLat = 0x0002
  private val TagGpsLonRef = 0x0003
  private val TagGpsLon = 0x0004

  // ------------------------------------------------------------ writer

  private final class W(bigEndian: Boolean) {
    val out = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit =
      if (bigEndian) { u8(v >> 8); u8(v) } else { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit =
      if (bigEndian) { u16((v >> 16).toInt); u16(v.toInt) }
      else { u16(v.toInt); u16((v >> 16).toInt) }
    def raw(b: Array[Byte]): Unit = out.write(b)
    def size: Int = out.size()
    def bytes: Array[Byte] = out.toByteArray
  }

  /** One IFD entry: tag, TIFF type, count, and either an inline
    * value (≤ 4 bytes) or a payload placed in the ext area. */
  private sealed trait Entry { def tag: Int }
  private case class EShort(tag: Int, v: Int) extends Entry
  private case class ELong(tag: Int, v: Long) extends Entry
  private case class EAscii(tag: Int, s: String) extends Entry
  private case class ERat3(tag: Int, a: (Long, Long), b: (Long, Long),
                           c: (Long, Long)) extends Entry

  /** Serialize one IFD at `at` (offset from TIFF origin): entry table
    * + next-IFD pointer 0 + ext payloads. Returns the serialized
    * bytes (payload offsets already absolute-from-origin). */
  private def ifdBytes(entries: Seq[Entry], at: Int,
                       bigEndian: Boolean): Array[Byte] = {
    val w = new W(bigEndian)
    val extBase = at + 2 + entries.size * 12 + 4
    val ext = new W(bigEndian)
    w.u16(entries.size)
    entries.sortBy(_.tag).foreach {
      case EShort(t, v) =>
        w.u16(t); w.u16(3); w.u32(1L)
        // SHORT inline: value in the first 2 bytes of the 4-byte slot
        w.u16(v); w.u16(0)
      case ELong(t, v) => w.u16(t); w.u16(4); w.u32(1L); w.u32(v)
      case EAscii(t, s) =>
        val b = s.getBytes(US_ASCII) :+ 0.toByte
        w.u16(t); w.u16(2); w.u32(b.length.toLong)
        if (b.length <= 4) { w.raw(b ++ new Array[Byte](4 - b.length)) }
        else { w.u32((extBase + ext.size).toLong); ext.raw(b) }
      case ERat3(t, a, b, c) =>
        w.u16(t); w.u16(5); w.u32(3L)
        w.u32((extBase + ext.size).toLong)
        Seq(a, b, c).foreach { case (n, d) => ext.u32(n); ext.u32(d) }
    }
    w.u32(0L) // next IFD
    w.bytes ++ ext.bytes
  }

  private def gpsRat(milli: Long): (ERat3, String, String) = {
    val a = math.abs(milli)
    (ERat3(0, (a / 1000, 1L), (a % 1000 * 60, 1000L), (0L, 1L)),
      if (milli >= 0) "N" else "S", if (milli >= 0) "E" else "W")
  }

  /** Canonical APP1 EXIF payload (after the `Exif\0\0` id): TIFF
    * header + IFD0 (Make/Model/Orientation/DateTime + Exif-IFD
    * pointer + optional GPS-IFD pointer) + Exif IFD
    * (DateTimeOriginal) + GPS IFD (lat/lon refs + 3-rational DMS,
    * millidegree-exact under the writer's (deg, min·60/1000, 0)
    * layout). */
  def tiffBytes(bigEndian: Boolean, make: String, model: String,
                orientation: Int, dateTime: String,
                dateTimeOriginal: String,
                gps: Option[(Long, Long)]): Array[Byte] = {
    val h = new W(bigEndian)
    if (bigEndian) { h.u8('M'); h.u8('M') } else { h.u8('I'); h.u8('I') }
    h.u16(42); h.u32(8L)
    // fixed-point layout: IFD0 at 8; sizes are computable up front
    val ifd0Entries0 = Seq[Entry](EAscii(TagMake, make),
      EAscii(TagModel, model), EShort(TagOrientation, orientation),
      EAscii(TagDateTime, dateTime), ELong(TagExifIfd, 0L)) ++
      (if (gps.isDefined) Seq(ELong(TagGpsIfd, 0L)) else Nil)
    val ifd0Size = ifdBytes(ifd0Entries0, 8, bigEndian).length
    val exifAt = 8 + ifd0Size
    val exifEntries = Seq[Entry](EAscii(TagDateTimeOriginal, dateTimeOriginal))
    val exifSize = ifdBytes(exifEntries, exifAt, bigEndian).length
    val gpsAt = exifAt + exifSize
    val ifd0 = ifdBytes(ifd0Entries0.map {
      case ELong(TagExifIfd, _) => ELong(TagExifIfd, exifAt.toLong)
      case ELong(TagGpsIfd, _) => ELong(TagGpsIfd, gpsAt.toLong)
      case e => e
    }, 8, bigEndian)
    val gpsIfd = gps.map { case (latM, lonM) =>
      val (latR, latRef, _) = gpsRat(latM)
      val (lonR, _, lonRef) = gpsRat(lonM)
      ifdBytes(Seq(EAscii(TagGpsLatRef, latRef), latR.copy(tag = TagGpsLat),
        EAscii(TagGpsLonRef, lonRef), lonR.copy(tag = TagGpsLon)),
        gpsAt, bigEndian)
    }.getOrElse(Array.emptyByteArray)
    h.bytes ++ ifd0 ++ ifdBytes(exifEntries, exifAt, bigEndian) ++ gpsIfd
  }

  /** Insert (or replace) the EXIF APP1 right after SOI (and after an
    * existing APP0/JFIF segment if present — the DC-008 placement). */
  def withExif(jpeg: Array[Byte], tiff: Array[Byte]): Array[Byte] = {
    if (jpeg == null || jpeg.length < 2 ||
      (jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8) return jpeg
    val stripped = dropApp1(jpeg)
    var at = 2
    if (stripped.length >= at + 4 && (stripped(at) & 0xff) == 0xff &&
      (stripped(at + 1) & 0xff) == 0xe0)
      at += 2 + (((stripped(at + 2) & 0xff) << 8) | (stripped(at + 3) & 0xff))
    val payload = "Exif".getBytes(US_ASCII) ++ Array[Byte](0, 0) ++ tiff
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    stripped.take(at) ++ seg ++ stripped.drop(at)
  }

  /** The JPEG minus its EXIF APP1 segment(s); scan data untouched. */
  def dropApp1(jpeg: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(jpeg.length)
    out.write(jpeg, 0, 2)
    var o = 2
    var inSegments = true
    while (inSegments && o + 4 <= jpeg.length) {
      if ((jpeg(o) & 0xff) != 0xff) inSegments = false
      else {
        val marker = jpeg(o + 1) & 0xff
        if (marker == 0xda || marker == 0xd9) inSegments = false // SOS/EOI
        else {
          val len = ((jpeg(o + 2) & 0xff) << 8) | (jpeg(o + 3) & 0xff)
          val end = o + 2 + len
          if (end > jpeg.length) inSegments = false
          else {
            val isExif = marker == 0xe1 && len >= 8 &&
              jpeg(o + 4) == 'E' && jpeg(o + 5) == 'x' &&
              jpeg(o + 6) == 'i' && jpeg(o + 7) == 'f'
            if (!isExif) out.write(jpeg, o, end - o)
            o = end
          }
        }
      }
    }
    if (o < jpeg.length) out.write(jpeg, o, jpeg.length - o)
    out.toByteArray
  }

  // ------------------------------------------------------------ parser

  private final class R(b: Array[Byte], origin: Int, bigEndian: Boolean) {
    // Long arithmetic: a crafted offset/count near Int.MaxValue (e.g. an
    // ASCII tag declaring cnt 0x7FFFFFF0) must wrap-proof fail, not pass
    // the check and AIOOBE in the read — parse/stripGps stay total.
    def ok(o: Int, n: Int): Boolean =
      o >= 0 && n >= 0 && origin.toLong + o + n <= b.length
    def u16(o: Int): Int = {
      val i = origin + o
      if (bigEndian) ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      else (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    }
    def u32(o: Int): Long =
      if (bigEndian) ((u16(o) & 0xffffL) << 16) | (u16(o + 2) & 0xffffL)
      else (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
    def ascii(o: Int, n: Int): String = {
      var hi = 0
      while (hi < n && b(origin + o + hi) != 0) hi += 1
      new String(b, origin + o, hi, US_ASCII)
    }
  }

  private val TypeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8)

  /** All (tag → value offset·type·count) entries of the IFD at `at`,
    * bounds-checked; None on malformed structure. */
  private def ifdEntries(r: R, at: Int): Option[Map[Int, (Int, Int, Int)]] = {
    if (!r.ok(at, 2)) return None
    val n = r.u16(at)
    if (n > 256 || !r.ok(at + 2, n * 12 + 4)) return None
    Some((0 until n).map { i =>
      val eo = at + 2 + i * 12
      val tag = r.u16(eo)
      val tpe = r.u16(eo + 2)
      val cnt = r.u32(eo + 4).toInt
      // Long product: a crafted 32-bit count must not wrap the size
      // into the 1..4 inline range and misroute the value offset
      val size = TypeSize.getOrElse(tpe, 0).toLong * cnt
      val vo = if (size > 0 && size <= 4) eo + 8 else r.u32(eo + 8).toInt
      tag -> (vo, tpe, cnt)
    }.toMap)
  }

  private def asciiTag(r: R, e: Map[Int, (Int, Int, Int)], tag: Int): String =
    e.get(tag) match {
      case Some((vo, 2, cnt)) if cnt > 0 && r.ok(vo, cnt) => r.ascii(vo, cnt)
      case _ => ""
    }

  private def shortTag(r: R, e: Map[Int, (Int, Int, Int)], tag: Int): Int =
    e.get(tag) match {
      case Some((vo, 3, cnt)) if cnt >= 1 && r.ok(vo, 2) => r.u16(vo)
      case _ => 0
    }

  private def longTag(r: R, e: Map[Int, (Int, Int, Int)], tag: Int): Option[Int] =
    e.get(tag) match {
      case Some((vo, 4, cnt)) if cnt >= 1 && r.ok(vo, 4) => Some(r.u32(vo).toInt)
      case _ => None
    }

  /** DMS rationals → millidegrees, integer-exact for the writer's
    * (deg, min·60/1000, 0) layout: deg·1000 + num_min·1000/(60·den). */
  private def ratMilli(r: R, e: Map[Int, (Int, Int, Int)], tag: Int): Option[Long] =
    e.get(tag) match {
      case Some((vo, 5, cnt)) if cnt >= 3 && r.ok(vo, 24) =>
        val dN = r.u32(vo); val dD = math.max(1L, r.u32(vo + 4))
        val mN = r.u32(vo + 8); val mD = math.max(1L, r.u32(vo + 12))
        val sN = r.u32(vo + 16); val sD = math.max(1L, r.u32(vo + 20))
        Some(dN * 1000 / dD + mN * 1000 / (60 * mD) + sN * 1000 / (3600 * sD))
      case _ => None
    }

  /** Parse the EXIF APP1 of a JPEG (None when absent/malformed). */
  def parse(jpeg: Array[Byte]): Option[ExifInfo] = {
    if (jpeg == null || jpeg.length < 4 ||
      (jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8) return None
    var o = 2
    var tiffAt = -1
    var tiffLimit = -1
    while (tiffAt < 0 && o + 4 <= jpeg.length && (jpeg(o) & 0xff) == 0xff) {
      val marker = jpeg(o + 1) & 0xff
      if (marker == 0xda || marker == 0xd9) o = jpeg.length
      else {
        val len = ((jpeg(o + 2) & 0xff) << 8) | (jpeg(o + 3) & 0xff)
        val end = o + 2 + len
        if (end > jpeg.length) o = jpeg.length
        else {
          if (marker == 0xe1 && len >= 14 && jpeg(o + 4) == 'E' &&
            jpeg(o + 5) == 'x' && jpeg(o + 6) == 'i' &&
            jpeg(o + 7) == 'f' && jpeg(o + 8) == 0 && jpeg(o + 9) == 0) {
            tiffAt = o + 10; tiffLimit = end
          }
          o = end
        }
      }
    }
    if (tiffAt < 0) return None
    val big = (jpeg(tiffAt) & 0xff) == 'M' && (jpeg(tiffAt + 1) & 0xff) == 'M'
    val lil = (jpeg(tiffAt) & 0xff) == 'I' && (jpeg(tiffAt + 1) & 0xff) == 'I'
    if (!big && !lil) return None
    // reader clamped to the APP1 segment, not the whole file
    val seg = java.util.Arrays.copyOfRange(jpeg, tiffAt, tiffLimit)
    val r = new R(seg, 0, big)
    if (!r.ok(2, 6) || r.u16(2) != 42) return None
    val ifd0At = r.u32(4).toInt
    ifdEntries(r, ifd0At).map { e0 =>
      val exifE = longTag(r, e0, TagExifIfd)
        .flatMap(at => ifdEntries(r, at)).getOrElse(Map.empty)
      val gpsE = longTag(r, e0, TagGpsIfd)
        .flatMap(at => ifdEntries(r, at)).getOrElse(Map.empty)
      val latAbs = ratMilli(r, gpsE, TagGpsLat)
      val lonAbs = ratMilli(r, gpsE, TagGpsLon)
      val latSign = if (asciiTag(r, gpsE, TagGpsLatRef) == "S") -1L else 1L
      val lonSign = if (asciiTag(r, gpsE, TagGpsLonRef) == "W") -1L else 1L
      ExifInfo(big, asciiTag(r, e0, TagMake), asciiTag(r, e0, TagModel),
        shortTag(r, e0, TagOrientation), asciiTag(r, e0, TagDateTime),
        asciiTag(r, exifE, TagDateTimeOriginal),
        latAbs.map(_ * latSign), lonAbs.map(_ * lonSign))
    }
  }

  /** Strip GPS: parse, then reserialize the canonical APP1 with the
    * GPS IFD removed (scan data byte-identical). Returns the new
    * bytes and the byte count removed (0 when no EXIF GPS present).
    *
    * The reserialization is deliberately LOSSY beyond the canonical
    * fields (Make/Model/Orientation/DateTime/DateTimeOriginal): any
    * other IFD0/Exif-IFD tags — exposure, ISO, maker notes, thumbnail
    * IFD — are dropped rather than carried through unparsed. That errs
    * in the privacy-safe direction (an unparsed maker note can itself
    * embed GPS), at the cost of metadata fidelity on real-world JPEGs;
    * the "every non-location field intact" property is exact only for
    * APP1s limited to the canonical field set (e.g. this repo's own
    * writer). */
  def stripGps(jpeg: Array[Byte]): (Array[Byte], Int) =
    parse(jpeg) match {
      case Some(info) if info.hasGps =>
        val cleaned = withExif(jpeg, tiffBytes(info.bigEndian, info.make,
          info.model, info.orientation, info.dateTime,
          info.dateTimeOriginal, None))
        (cleaned, jpeg.length - cleaned.length)
      case _ => (jpeg, 0)
    }
}
