package graft.ops

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamException}

/** EPUB source — books, the highest-quality long-form corpus a
  * training pipeline ingests. An EPUB is an OCF container (a ZIP
  * whose FIRST member is an uncompressed `mimetype`) holding
  * `META-INF/container.xml` → an OPF package document (metadata +
  * manifest + spine) → XHTML chapters. The reading ORDER is the
  * spine's, not the archive's — a reader that walks zip order
  * shuffles the book.
  *
  * Composes the repo's verified pieces end to end: [[Archive]] ZIP
  * walk (CRC-checked inflate), the [[Xml]]-style hardened StAX
  * cursor for container/OPF (DTD and external entities off), and
  * [[Html.extractText]] for chapter text (entity decode included).
  *
  * Totality: damage is a cut — a chapter the spine references but
  * the archive lacks (or whose CRC fails) is skipped and `ok` drops;
  * garbage yields `Book("", Vector.empty, ok = false)`. */
object Epub {

  final case class Book(title: String, chapters: Vector[String],
                        ok: Boolean)

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f
  }

  private val Mimetype = "application/epub+zip"

  // ------------------------------------------------------------ write

  /** A complete OCF/EPUB container: stored `mimetype` first, then
    * container.xml, the OPF (dc:title metadata, manifest items in
    * ARCHIVE order, spine idrefs in `spineOrder` — pass a
    * permutation to make reading order differ from zip order), then
    * the chapter XHTML files. `chapterLines(i)` are the text lines
    * of chapter i, XML-escaped into one `<p>` each. */
  def build(title: String, chapterLines: Seq[Seq[String]],
            spineOrder: Seq[Int]): Array[Byte] = {
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val container =
      """<?xml version="1.0"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        | <rootfiles>
        |  <rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
        | </rootfiles>
        |</container>
        |""".stripMargin
    val manifest = chapterLines.indices.map(i =>
      s"""  <item id="c$i" href="ch$i.xhtml" media-type="application/xhtml+xml"/>""")
      .mkString("\n")
    val spine = spineOrder.map(i => s"""  <itemref idref="c$i"/>""")
      .mkString("\n")
    val opf =
      s"""<?xml version="1.0"?>
         |<package version="3.0" xmlns="http://www.idpf.org/2007/opf">
         | <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
         |  <dc:title>${esc(title)}</dc:title>
         | </metadata>
         | <manifest>
         |$manifest
         | </manifest>
         | <spine>
         |$spine
         | </spine>
         |</package>
         |""".stripMargin
    val chapters = chapterLines.zipWithIndex.map { case (lines, i) =>
      val paras = lines.map(l => s"  <p>${esc(l)}</p>").mkString("\n")
      (s"OEBPS/ch$i.xhtml",
        ("<?xml version=\"1.0\"?>\n" +
          "<html xmlns=\"http://www.w3.org/1999/xhtml\">\n" +
          s"<head></head>\n<body>\n$paras\n</body>\n</html>\n")
          .getBytes(UTF_8))
    }
    val members = Seq(
      ("mimetype", Mimetype.getBytes(UTF_8)),
      ("META-INF/container.xml", container.getBytes(UTF_8)),
      ("OEBPS/content.opf", opf.getBytes(UTF_8))) ++ chapters
    // OCF: the mimetype member MUST be first and STORED
    Archive.buildZip(members, i => i != 0)
  }

  // ------------------------------------------------------------ parse

  /** Pulls `(attr of elem, text of textElem)` pairs out of one XML
    * member with the hardened cursor. Total: malformed XML yields
    * what was read before the fault. */
  private def walk(xml: Array[Byte])(
      f: (String, javax.xml.stream.XMLStreamReader) => Unit): Unit = {
    val r = factory.createXMLStreamReader(
      new ByteArrayInputStream(xml), "UTF-8")
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT)
          f(r.getLocalName, r)
      }
    } catch {
      case _: XMLStreamException => ()
      case _: RuntimeException => ()
    } finally r.close()
  }

  /** Total parse: title + chapter texts in SPINE order. */
  def parse(b: Array[Byte]): Book = {
    val members = Archive.parseZip(b)
    if (members.isEmpty) return Book("", Vector.empty, ok = false)
    val byName = members.iterator.map(m => m.name -> m).toMap
    val mimeOk = members.head.name == "mimetype" &&
      members.head.ok && !members.head.deflated &&
      members.head.text == Mimetype
    // container.xml -> OPF path
    var opfPath: String = null
    byName.get("META-INF/container.xml").filter(_.ok).foreach { m =>
      walk(m.body) { (name, r) =>
        if (name == "rootfile" && opfPath == null) {
          val p = r.getAttributeValue(null, "full-path")
          if (p != null) opfPath = p
        }
      }
    }
    if (opfPath == null) return Book("", Vector.empty, ok = false)
    val opfDir = {
      val i = opfPath.lastIndexOf('/')
      if (i < 0) "" else opfPath.take(i + 1)
    }
    var title = ""
    val hrefs = scala.collection.mutable.HashMap.empty[String, String]
    val spine = scala.collection.mutable.ArrayBuffer.empty[String]
    byName.get(opfPath).filter(_.ok).foreach { m =>
      walk(m.body) { (name, r) =>
        name match {
          case "title" =>
            try { if (title.isEmpty) title = r.getElementText }
            catch { case _: XMLStreamException => () }
          case "item" =>
            val id = r.getAttributeValue(null, "id")
            val href = r.getAttributeValue(null, "href")
            if (id != null && href != null) hrefs(id) = href
          case "itemref" =>
            val idref = r.getAttributeValue(null, "idref")
            if (idref != null) spine += idref
          case _ => ()
        }
      }
    }
    var missing = false
    val chapters = spine.iterator.flatMap { idref =>
      val m = hrefs.get(idref)
        .flatMap(h => byName.get(opfDir + h)).filter(_.ok)
      if (m.isEmpty) missing = true
      m.map(mm => Html.extractText(mm.text))
    }.toVector
    Book(title, chapters,
      ok = mimeOk && title.nonEmpty && spine.nonEmpty && !missing)
  }
}
