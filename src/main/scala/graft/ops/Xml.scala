package graft.ops

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamException}

/** MediaWiki-style XML dump source — the ingestion container for the
  * big public wiki/forum corpora (Wikipedia, StackExchange dumps):
  * one `<mediawiki>` document holding a `<siteinfo>` header and a
  * stream of `<page>` elements, each with title/ns/id and a
  * `<revision>` carrying id/timestamp/contributor/text. Beyond the
  * reference surface (Henbun ingests none of these containers); the
  * builder/parser pair follows the [[Archive]] discipline — the
  * repo's own writer produces REAL dumps (escaping included), the
  * parser is a streaming record walk, and the oracle recomputes every
  * aggregate from the build formulas.
  *
  * Parsing is `javax.xml.stream` (StAX) — a forward-only cursor, so a
  * multi-GB dump never materializes a DOM; partition-local like every
  * codec column here. DTDs and external entities are disabled
  * (crawled XML is adversarial input — no XXE, no entity-expansion
  * bombs). Total on damage: a malformed byte stream yields the pages
  * fully parsed before the fault (XMLStreamException is a cut, not a
  * crash), and a page missing required fields surfaces with
  * `ok = false` rather than poisoning the dump. */
object Xml {

  /** One parsed `<page>`: MediaWiki grain. `ok` = all required fields
    * present and numeric fields parsed. */
  final case class Page(id: Long, ns: Int, title: String, revId: Long,
                        timestamp: String, contributor: String,
                        text: String, redirect: Boolean, ok: Boolean)

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

  /** Build a dump. Pages render in input order; `redirect` pages get
    * a self-closing `<redirect title="..."/>` element (attribute
    * escaping exercised), text/title are entity-escaped. */
  def buildDump(pages: Seq[Page], siteName: String = "graftwiki"): Array[Byte] = {
    val sb = new StringBuilder(1024)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<mediawiki xml:lang=\"en\">\n")
    sb.append("  <siteinfo>\n    <sitename>").append(esc(siteName))
      .append("</sitename>\n    <dbname>graft</dbname>\n  </siteinfo>\n")
    pages.foreach { p =>
      sb.append("  <page>\n")
      sb.append("    <title>").append(esc(p.title)).append("</title>\n")
      sb.append("    <ns>").append(p.ns).append("</ns>\n")
      sb.append("    <id>").append(p.id).append("</id>\n")
      if (p.redirect)
        sb.append("    <redirect title=\"").append(esc(p.title))
          .append(" (target)\"/>\n")
      sb.append("    <revision>\n")
      sb.append("      <id>").append(p.revId).append("</id>\n")
      sb.append("      <timestamp>").append(esc(p.timestamp))
        .append("</timestamp>\n")
      sb.append("      <contributor>\n        <username>")
        .append(esc(p.contributor))
        .append("</username>\n      </contributor>\n")
      sb.append("      <text bytes=\"")
        .append(p.text.getBytes(UTF_8).length)
        .append("\">").append(esc(p.text)).append("</text>\n")
      sb.append("    </revision>\n")
      sb.append("  </page>\n")
    }
    sb.append("</mediawiki>\n")
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

  /** Streaming record walk: every fully-formed `<page>` before any
    * stream fault, in document order. Pages with missing/garbled
    * required fields come back `ok = false` (title and text default
    * to "", numerics to -1) — curation wants to COUNT what it can't
    * read, the [[Archive.parseZip]] contract. */
  def parseDump(b: Array[Byte]): Vector[Page] = {
    if (b == null || b.length == 0) return Vector.empty
    val out = Vector.newBuilder[Page]
    // reader creation itself parses the XML declaration — a damaged
    // prolog must yield empty, not throw (creation inside the try)
    var r: javax.xml.stream.XMLStreamReader = null
    try {
      r = factory.createXMLStreamReader(new ByteArrayInputStream(b))
      var inPage = false
      var inRevision = false
      var inContributor = false
      var title = ""; var text = ""; var timestamp = ""; var user = ""
      var id = -1L; var revId = -1L; var ns = Int.MinValue
      var redirect = false
      def num(s: String): Long =
        try s.trim.toLong catch { case _: NumberFormatException => -1L }
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            if (!inPage && name == "page") {
              inPage = true; inRevision = false; inContributor = false
              title = ""; text = ""; timestamp = ""; user = ""
              id = -1L; revId = -1L; ns = Int.MinValue; redirect = false
            } else if (inPage) name match {
              case "revision" => inRevision = true
              case "contributor" => inContributor = true
              case "redirect" => redirect = true
              case "title" => title = r.getElementText
              case "ns" => ns = num(r.getElementText).toInt
              case "id" =>
                val v = num(r.getElementText)
                if (inRevision) { if (revId < 0) revId = v }
                else if (id < 0) id = v
              case "timestamp" => if (inRevision) timestamp = r.getElementText
              case "username" => if (inContributor) user = r.getElementText
              case "text" => if (inRevision) text = r.getElementText
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "page" if inPage =>
                val ok = id >= 0 && revId >= 0 && ns != Int.MinValue &&
                  title.nonEmpty && timestamp.nonEmpty
                out += Page(id, if (ns == Int.MinValue) -1 else ns, title,
                  revId, timestamp, user, text, redirect, ok)
                inPage = false
              case "revision" => inRevision = false
              case "contributor" => inContributor = false
              case _ => ()
            }
          case _ => ()
        }
      }
      out.result()
    } catch {
      case _: XMLStreamException => out.result() // damage cut, not crash
      case _: RuntimeException => out.result() // woodstox wraps some faults
    } finally {
      if (r != null) try r.close() catch { case _: XMLStreamException => () }
    }
  }
}
