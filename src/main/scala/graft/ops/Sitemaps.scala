package graft.ops

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamException}

/** sitemaps.org XML sitemaps — the crawl-side twin of [[Robots]]: a
  * site publishes the URLs it WANTS crawled (with freshness hints)
  * in `<urlset>` files, sharded behind a `<sitemapindex>` when large
  * (the protocol caps one file at 50k URLs, so every big site is an
  * index of shards — exactly the layout a distributed frontier
  * ingests in parallel, one shard per task). Beyond the reference
  * surface; builder/parser pair follows the [[Xml]] discipline: the
  * repo's writer produces real escaped documents, the parser is a
  * forward-only StAX walk (DTD/external entities disabled — crawled
  * XML is adversarial), total on damage (entries fully parsed before
  * a fault survive; an entry missing `<loc>` surfaces `ok = false`).
  *
  * Scale shape: one sitemap blob parses partition-locally to its
  * entry rows; bytes never shuffle. Frontier construction is then
  * [[Url.canonicalize]] + distinct + a robots gate — see
  * q_pipeline_frontier. */
object Sitemaps {

  /** One `<url>` entry. `priority10` = priority scaled by 10 (the
    * protocol's one-decimal 0.0–1.0 range made integer-exact);
    * -1 when absent/unparsable. `lastmod`/`changefreq` "" when
    * absent. `ok` = loc present. */
  final case class Entry(loc: String, lastmod: String, changefreq: String,
                         priority10: Int, ok: Boolean)

  /** One `<sitemap>` entry of a `<sitemapindex>`. */
  final case class IndexEntry(loc: String, lastmod: String)

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val Ns = "http://www.sitemaps.org/schemas/sitemap/0.9"

  /** Render a `<urlset>`. Optional fields render only when present
    * (lastmod/changefreq nonEmpty, priority10 in 0..10). */
  def buildUrlset(entries: Seq[Entry]): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"").append(Ns).append("\">\n")
    entries.foreach { e =>
      sb.append("  <url>\n    <loc>").append(esc(e.loc)).append("</loc>\n")
      if (e.lastmod.nonEmpty)
        sb.append("    <lastmod>").append(esc(e.lastmod)).append("</lastmod>\n")
      if (e.changefreq.nonEmpty)
        sb.append("    <changefreq>").append(esc(e.changefreq))
          .append("</changefreq>\n")
      if (e.priority10 >= 0 && e.priority10 <= 10)
        sb.append("    <priority>")
          .append(if (e.priority10 == 10) "1.0" else "0." + e.priority10)
          .append("</priority>\n")
      sb.append("  </url>\n")
    }
    sb.append("</urlset>\n")
    sb.toString.getBytes(UTF_8)
  }

  /** Render a `<sitemapindex>`. */
  def buildIndex(entries: Seq[IndexEntry]): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<sitemapindex xmlns=\"").append(Ns).append("\">\n")
    entries.foreach { e =>
      sb.append("  <sitemap>\n    <loc>").append(esc(e.loc))
        .append("</loc>\n")
      if (e.lastmod.nonEmpty)
        sb.append("    <lastmod>").append(esc(e.lastmod)).append("</lastmod>\n")
      sb.append("  </sitemap>\n")
    }
    sb.append("</sitemapindex>\n")
    sb.toString.getBytes(UTF_8)
  }

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f
  }

  private def parsePriority10(s: String): Int = {
    val t = s.trim
    val d = try t.toDouble catch { case _: NumberFormatException => -1.0 }
    if (d < 0.0 || d > 1.0) -1 else math.round(d * 10).toInt
  }

  /** Every fully-formed `<url>` before any stream fault, in document
    * order. Damage is a cut, not a crash ([[Xml.parseDump]]
    * contract). A `<sitemapindex>` parses to empty — use
    * [[parseIndex]] for those. */
  def parseUrlset(b: Array[Byte]): Vector[Entry] = {
    if (b == null || b.length == 0) return Vector.empty
    val out = Vector.newBuilder[Entry]
    var r: javax.xml.stream.XMLStreamReader = null
    try {
      r = factory.createXMLStreamReader(new ByteArrayInputStream(b))
      var inUrl = false
      var loc = ""; var lastmod = ""; var freq = ""; var prio = -1
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            if (!inUrl && name == "url") {
              inUrl = true; loc = ""; lastmod = ""; freq = ""; prio = -1
            } else if (inUrl) name match {
              case "loc" => loc = r.getElementText.trim
              case "lastmod" => lastmod = r.getElementText.trim
              case "changefreq" => freq = r.getElementText.trim
              case "priority" => prio = parsePriority10(r.getElementText)
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (inUrl && r.getLocalName == "url") {
              out += Entry(loc, lastmod, freq, prio, loc.nonEmpty)
              inUrl = false
            }
          case _ => ()
        }
      }
      out.result()
    } catch {
      case _: XMLStreamException => out.result()
      case _: RuntimeException => out.result()
    } finally {
      if (r != null) try r.close() catch { case _: XMLStreamException => () }
    }
  }

  /** Every `<sitemap>` of a `<sitemapindex>` before any fault. */
  def parseIndex(b: Array[Byte]): Vector[IndexEntry] = {
    if (b == null || b.length == 0) return Vector.empty
    val out = Vector.newBuilder[IndexEntry]
    var r: javax.xml.stream.XMLStreamReader = null
    try {
      r = factory.createXMLStreamReader(new ByteArrayInputStream(b))
      var inSm = false
      var loc = ""; var lastmod = ""
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            if (!inSm && name == "sitemap") {
              inSm = true; loc = ""; lastmod = ""
            } else if (inSm) name match {
              case "loc" => loc = r.getElementText.trim
              case "lastmod" => lastmod = r.getElementText.trim
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (inSm && r.getLocalName == "sitemap") {
              out += IndexEntry(loc, lastmod)
              inSm = false
            }
          case _ => ()
        }
      }
      out.result()
    } catch {
      case _: XMLStreamException => out.result()
      case _: RuntimeException => out.result()
    } finally {
      if (r != null) try r.close() catch { case _: XMLStreamException => () }
    }
  }
}
