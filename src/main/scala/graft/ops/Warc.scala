package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Pure-JVM WARC (Web ARChive, ISO 28500) ingestion — the container
  * format of web-scale training corpora (Common Crawl ships ~100 TB
  * of .warc.gz per monthly crawl). A crawl file is a sequence of
  * records, each `WARC/1.0\r\n` + named headers + `\r\n\r\n` + a
  * `Content-Length`-delimited body + `\r\n\r\n`; the .gz form
  * concatenates one gzip member per record (the JDK's
  * `GZIPInputStream` reads concatenated members transparently, so
  * one streaming inflate covers both the member-per-record and the
  * single-member layout).
  *
  * The record walk is strictly Content-Length-driven (never a body
  * scan — bodies are arbitrary bytes), tolerant of a missing final
  * CRLF pair, and total on garbage (parse stops at the first
  * malformed header block). For `response` records the HTTP payload
  * is split into status line / headers / entity body, so the text a
  * curation pipeline wants comes out directly.
  *
  * Scale shape: files arrive via Spark's `binaryFile` source (or any
  * binary column); record extraction is a per-partition flatMap —
  * one file's records never leave their partition, and nothing
  * file-sized lands on the driver. At 100 TB the unit of parallelism
  * is the WARC file (Common Crawl: ~1 GB each, ~80k files/crawl),
  * exactly how a 1000-executor cluster wants the split. */
object Warc {

  final case class WarcRecord(warcType: String, targetUri: String,
                              recordId: String, contentType: String,
                              contentLength: Long, httpStatus: Int,
                              body: Array[Byte],
                              refersTo: String = "",
                              payloadDigest: String = "") {
    def bodyText: String = new String(body, UTF_8)
  }

  /** Inflate when gzipped (incl. concatenated members), else pass
    * through. */
  def gunzipAll(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 2 ||
      (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return b
    // initial capacity: 4x compressed size, clamped to 64 MiB — the
    // stream grows as needed; b.length*4 as a plain Int would overflow
    // negative on ~0.5 GiB inputs (real .warc.gz files are ~1 GiB)
    val out = new ByteArrayOutputStream(
      math.min(b.length.toLong * 4L, 64L << 20).toInt)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(b), 64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch {
      // truncated/corrupt member: keep the records inflated so far —
      // the walk below is total on partial bytes
      case _: java.io.IOException => ()
    }
    out.toByteArray
  }

  /** Header block [from, blank line); returns (map lower-cased keys,
    * offsetPastBlankLine) or None when no CRLFCRLF terminator exists
    * within `limit` bytes. Values keep their case. */
  private def headerBlock(b: Array[Byte], from: Int, limit: Int)
      : Option[(Map[String, String], Int)] = {
    val hi = math.min(b.length, from + limit)
    var i = from
    var end = -1
    while (end < 0 && i + 3 < hi) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        end = i
      i += 1
    }
    if (end < 0) return None
    val text = new String(b, from, end - from, ISO_8859_1)
    val hs = text.split("\r\n").iterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase ->
        line.substring(c + 1).trim)
    }.toMap
    Some((hs, end + 4))
  }

  /** Parse every record in a (possibly gzipped) WARC file. The walk
    * is Content-Length-driven; a record with a malformed header block
    * or length ends the walk (never throws, never loops). A header
    * block with no CRLFCRLF terminator within `headerLimit` bytes
    * counts as malformed — NOTE this truncates the REMAINDER of the
    * file, not just the one record (without a parsed Content-Length
    * there is no resync point; scanning forward for the next "WARC/"
    * could land inside a payload). Raise `headerLimit` for archives
    * with oversized headers; the 64 KiB default clears every header
    * Common Crawl emits by ~3 orders of magnitude. */
  def parseAll(fileBytes: Array[Byte],
               headerLimit: Int = 64 * 1024): List[WarcRecord] = {
    val b = gunzipAll(fileBytes)
    val out = scala.collection.mutable.ListBuffer.empty[WarcRecord]
    var o = 0
    var ok = b != null
    while (ok) {
      // skip inter-record CRLFs
      while (o < b.length && (b(o) == '\r' || b(o) == '\n')) o += 1
      if (o + 8 > b.length ||
        new String(b, o, 5, ISO_8859_1) != "WARC/") ok = false
      else {
        // version line ends at CRLF; headers follow
        var vEnd = o
        while (vEnd + 1 < b.length &&
          !(b(vEnd) == '\r' && b(vEnd + 1) == '\n')) vEnd += 1
        headerBlock(b, vEnd + 2, headerLimit) match {
          case None => ok = false
          case Some((hs, bodyAt)) =>
            val len = hs.get("content-length").flatMap(s =>
              scala.util.Try(s.toLong).toOption).getOrElse(-1L)
            if (len < 0 || bodyAt + len > b.length) ok = false
            else {
              val warcType = hs.getOrElse("warc-type", "")
              val payload =
                java.util.Arrays.copyOfRange(b, bodyAt, bodyAt + len.toInt)
              // response records wrap an HTTP message: split off the
              // status line + headers, surface the entity body
              val (status, body) =
                if (warcType == "response" && payload.length >= 5 &&
                  new String(payload, 0, 5, ISO_8859_1) == "HTTP/") {
                  headerBlock(payload, 0, payload.length) match {
                    case Some((_, entityAt)) =>
                      val line1 = new String(payload, 0,
                        math.min(payload.length, 64), ISO_8859_1)
                      val st = line1.split(" ").lift(1)
                        .flatMap(s => scala.util.Try(s.toInt).toOption)
                        .getOrElse(0)
                      (st, java.util.Arrays.copyOfRange(payload, entityAt,
                        payload.length))
                    case None => (0, payload)
                  }
                } else (0, payload)
              out += WarcRecord(warcType,
                hs.getOrElse("warc-target-uri", ""),
                hs.getOrElse("warc-record-id", ""),
                hs.getOrElse("content-type", ""), len, status, body,
                hs.getOrElse("warc-refers-to", ""),
                hs.getOrElse("warc-payload-digest", ""))
              o = bodyAt + len.toInt
            }
        }
      }
    }
    out.toList
  }

  // ------------------------------------------------------------------
  // Minimal writer — test/oracle fixture synthesis (member-per-record
  // gzip, the Common Crawl layout).
  // ------------------------------------------------------------------

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(b); gz.finish(); gz.close()
    out.toByteArray
  }

  private def record(warcType: String, uri: String, id: String,
                     contentType: String, payload: Array[Byte],
                     extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val h = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $warcType\r\n")
      .append(if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "")
      .append(s"WARC-Record-ID: <urn:uuid:$id>\r\n")
    extraHeaders.foreach { case (k, v) => h.append(s"$k: $v\r\n") }
    val hb = h
      .append(s"Content-Type: $contentType\r\n")
      .append(s"Content-Length: ${payload.length}\r\n\r\n")
      .toString.getBytes(ISO_8859_1)
    hb ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  /** Deterministic payload digest of a page text: the repo's 60-bit
    * token hash rendered as the digest header value (stands in for
    * WARC's sha1-base32 — what matters is that response and revisit
    * records of identical payloads carry the SAME value, which is
    * all the resolution join uses). */
  def payloadDigest(text: String): String =
    "graft:" + java.lang.Long.toHexString(TextHashFns.tokenHash60(text))

  /** Response record carrying WARC-Payload-Digest — the form a
    * dedup-at-crawl-time writer emits, so later revisits can point
    * at it. Byte layout otherwise identical to [[responseRecord]]. */
  def responseRecordDigest(uri: String, id: String,
                           text: String): Array[Byte] = {
    val entity = text.getBytes(UTF_8)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${entity.length}\r\n\r\n").getBytes(ISO_8859_1) ++
      entity
    record("response", uri, id, "application/http; msgtype=response",
      http, Seq("WARC-Payload-Digest" -> payloadDigest(text)))
  }

  /** REVISIT record (WARC 1.1 §6.7.2, the identical-payload-digest
    * profile — Common Crawl's crawl-time dedup): no payload, just the
    * digest of (and a reference to) the earlier capture. Storage cost
    * is the header block alone, whatever the page size. */
  def revisitRecord(uri: String, id: String, refersTo: String,
                    digest: String): Array[Byte] =
    record("revisit", uri, id, "application/http; msgtype=response",
      Array.emptyByteArray, Seq(
        "WARC-Refers-To" -> s"<urn:uuid:$refersTo>",
        "WARC-Payload-Digest" -> digest,
        "WARC-Profile" ->
          "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"))

  /** A .warc.gz with crawl-time dedup: docs whose `revisitOf` is set
    * write as REVISIT records (digest + reference, empty payload);
    * the rest as digest-carrying responses. */
  def buildFileRevisit(docs: Seq[(String, String, String, Option[String])],
                       gzip: Boolean = true): Array[Byte] = {
    val info = record("warcinfo", "", "warcinfo-0",
      "application/warc-fields",
      "software: graft-warc-writer/1.0\r\n".getBytes(ISO_8859_1))
    val members = info +: docs.map {
      case (uri, id, text, Some(ref)) =>
        revisitRecord(uri, id, ref, payloadDigest(text))
      case (uri, id, text, None) =>
        responseRecordDigest(uri, id, text)
    }
    if (gzip) members.map(gzipMember).reduce(_ ++ _)
    else members.reduce(_ ++ _)
  }

  /** One response record: WARC headers wrapping an HTTP/1.1 200
    * message whose entity body is `text`. */
  def responseRecord(uri: String, id: String, text: String): Array[Byte] = {
    val entity = text.getBytes(UTF_8)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${entity.length}\r\n\r\n").getBytes(ISO_8859_1) ++ entity
    record("response", uri, id, "application/http; msgtype=response", http)
  }

  /** A .warc.gz file: leading warcinfo + one response record per
    * (uri, id, text), each its own gzip member (Common Crawl layout);
    * `gzip = false` writes the plain concatenation. */
  def buildFile(docs: Seq[(String, String, String)],
                gzip: Boolean = true): Array[Byte] = {
    val info = record("warcinfo", "", "warcinfo-0",
      "application/warc-fields",
      "software: graft-warc-writer/1.0\r\n".getBytes(ISO_8859_1))
    val members = info +: docs.map { case (uri, id, text) =>
      responseRecord(uri, id, text)
    }
    if (gzip) members.map(gzipMember).reduce(_ ++ _)
    else members.reduce(_ ++ _)
  }
}
