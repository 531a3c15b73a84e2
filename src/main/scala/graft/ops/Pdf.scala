package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{DataFormatException, Deflater, Inflater}

/** PDF text extraction — the single biggest unstructured-corpus
  * format a training-data pipeline ingests after HTML (papers,
  * reports, books). Builder/parser pair on the [[Archive]]/[[Xml]]
  * discipline: the repo's writer produces REAL PDFs (correct xref
  * byte offsets, FlateDecode and raw content streams, direct and
  * indirect /Length, escaped literal strings, Tj and TJ show
  * operators), and the parser is the real thing a PDF consumer runs:
  * `startxref` → xref table (with /Prev chains for incrementally
  * updated files) → trailer → /Root → page-tree walk → per-page
  * content-stream decode → text-operator scan.
  *
  * Extraction contract (deterministic, oracle-recomputable): each
  * BT..ET block contributes the concatenation of the strings its
  * show operators (Tj, TJ array items, ', ") paint — ' and " prefix
  * a newline, TJ kern numbers are ignored; a page's text is its
  * blocks joined with '\n'. No font/CMap decoding: strings are
  * carried as UTF-8 bytes by the writer and decoded as UTF-8 (the
  * fixture convention, declared — real-world CID/Type0 fonts would
  * need a /ToUnicode walk, the same honest boundary class as the
  * external-codec seam).
  *
  * Totality: damage is a cut, not a crash. A broken xref falls back
  * to a linear `N G obj` scan (the classic reader-repair path); a
  * page whose content fails to decode contributes pages parsed
  * before it; garbage yields `Doc(Vector.empty, 0, ok = false)`.
  *
  * Scale shape: one blob parses partition-locally to its page rows;
  * bytes never shuffle ([[Multimodal.pdfPagesColumn]]). */
object Pdf {

  /** One page to write: `blocks` render as one BT..ET each (a block
    * with spaces renders as a TJ array with kern numbers, else a
    * single Tj); `flate` compresses the content stream;
    * `indirectLength` stores /Length as a separate integer object
    * (the layout streaming writers emit). */
  final case class PageSpec(blocks: Vector[String], flate: Boolean,
                            indirectLength: Boolean)

  final case class Page(text: String, flate: Boolean)

  /** `size` = trailer /Size (object count + 1); `ok` = xref + root +
    * page tree all resolved; `updated` = the newest trailer carries
    * /Prev, i.e. the file was incrementally updated and the reader
    * walked an xref chain; `xrefStream` = at least one section in
    * the chain was a PDF 1.5 cross-reference stream. */
  final case class Doc(pages: Vector[Page], size: Int, ok: Boolean,
                       updated: Boolean = false,
                       xrefStream: Boolean = false)

  // ------------------------------------------------------------ write

  private def escStr(s: String): Array[Byte] = {
    val raw = s.getBytes(UTF_8)
    val out = new ByteArrayOutputStream(raw.length + 8)
    raw.foreach { b =>
      b match {
        case '(' => out.write('\\'); out.write('(')
        case ')' => out.write('\\'); out.write(')')
        case '\\' => out.write('\\'); out.write('\\')
        case '\n' => out.write('\\'); out.write('n')
        case '\r' => out.write('\\'); out.write('r')
        case '\t' => out.write('\\'); out.write('t')
        case x => out.write(x)
      }
    }
    out.toByteArray
  }

  private def renderBlock(block: String, y: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(block.length + 48)
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    w(s"BT /F1 12 Tf 72 $y Td ")
    val words = block.split(" ", -1)
    if (words.length == 1) {
      w("("); out.write(escStr(block)); w(") Tj")
    } else {
      // TJ array: each non-last item carries its trailing space so
      // concatenation restores the block exactly; kern numbers
      // between items exercise the mixed-array path
      w("[")
      var i = 0
      while (i < words.length) {
        if (i > 0) w(" -18 ")
        w("(")
        out.write(escStr(if (i == words.length - 1) words(i)
        else words(i) + " "))
        w(")")
        i += 1
      }
      w("] TJ")
    }
    w(" ET\n")
    out.toByteArray
  }

  /** Rendered (and, per the spec, possibly deflated) content stream
    * bytes for one page. */
  private def renderContentData(p: PageSpec): Array[Byte] = {
    val c = new ByteArrayOutputStream(256)
    p.blocks.zipWithIndex.foreach { case (b, i) =>
      c.write(renderBlock(b, 720 - 16 * i))
    }
    if (p.flate) deflate(c.toByteArray) else c.toByteArray
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream(b.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Page object + content stream (+ integer /Length object when
    * `indirectLength`) for `p`, starting at object number `pageNum`;
    * every object offset is reported through `register`. Returns the
    * number of objects written (2 or 3). Shared by [[build]] and
    * [[appendUpdate]] so the two generations cannot drift. */
  private def writePageObjs(out: ByteArrayOutputStream, p: PageSpec,
                            pageNum: Int,
                            register: (Int, Long) => Unit): Int = {
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    def begin(n: Int): Unit = {
      register(n, out.size().toLong); w(s"$n 0 obj\n")
    }
    val data = renderContentData(p)
    val contentNum = pageNum + 1
    begin(pageNum)
    w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 3 0 R >> >> " +
      s"/Contents $contentNum 0 R >>\nendobj\n")
    begin(contentNum)
    val lenPart =
      if (p.indirectLength) s"/Length ${contentNum + 1} 0 R"
      else s"/Length ${data.length}"
    val filterPart = if (p.flate) " /Filter /FlateDecode" else ""
    w(s"<< $lenPart$filterPart >>\nstream\n")
    out.write(data)
    w("\nendstream\nendobj\n")
    if (p.indirectLength) {
      begin(contentNum + 1); w(s"${data.length}\nendobj\n")
      3
    } else 2
  }

  /** PNG Up (predictor 12) filtering for a cross-reference stream:
    * each `cols`-byte row becomes tag byte 2 + (row − previous row).
    * What every mainstream 1.5 writer applies before Flate. */
  private def pngUp(data: Array[Byte], cols: Int): Array[Byte] = {
    val nRows = data.length / cols
    val out = new Array[Byte]((cols + 1) * nRows)
    var r = 0
    while (r < nRows) {
      out(r * (cols + 1)) = 2
      var c = 0
      while (c < cols) {
        val cur = data(r * cols + c) & 0xff
        val up = if (r == 0) 0 else data((r - 1) * cols + c) & 0xff
        out(r * (cols + 1) + 1 + c) = ((cur - up) & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  /** Inverse of the PNG row predictors (tags 0–4, 1-byte samples) —
    * a conforming reader must accept any of them whatever the writer
    * used. Returns the reconstructed rows, tags stripped. */
  private def pngUnpredict(data: Array[Byte], cols: Int): Array[Byte] = {
    if (cols <= 0) return Array.emptyByteArray
    val nRows = data.length / (cols + 1)
    val out = new Array[Byte](cols * nRows)
    var r = 0
    while (r < nRows) {
      val tag = data(r * (cols + 1)) & 0xff
      var c = 0
      while (c < cols) {
        val x = data(r * (cols + 1) + 1 + c) & 0xff
        val left = if (c == 0) 0 else out(r * cols + c - 1) & 0xff
        val up = if (r == 0) 0 else out((r - 1) * cols + c) & 0xff
        val ul = if (r == 0 || c == 0) 0
        else out((r - 1) * cols + c - 1) & 0xff
        val rec = tag match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            x + (if (pa <= pb && pa <= pc) left
            else if (pb <= pc) up else ul)
          case _ => x
        }
        out(r * cols + c) = (rec & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  /** A complete single-generation PDF 1.4 with a correct xref table.
    * Objects: 1 catalog, 2 pages root, 3 font, then per page a page
    * object + content stream (+ an integer /Length object when
    * `indirectLength`). */
  def build(pages: Seq[PageSpec]): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    def beginObj(): Int = {
      offsets += out.size().toLong
      val n = offsets.length
      w(s"$n 0 obj\n")
      n
    }
    w("%PDF-1.4\n")
    // object numbers are assigned in write order; pages start at 4
    val pageNums = pages.indices.map { i =>
      4 + pages.take(i).map(p => if (p.indirectLength) 3 else 2).sum
    }
    beginObj(); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj()
    w("<< /Type /Pages /Kids [" +
      pageNums.map(n => s"$n 0 R").mkString(" ") +
      s"] /Count ${pages.length} >>\nendobj\n")
    beginObj()
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    pages.foreach { p =>
      val pageNum = offsets.length + 1
      writePageObjs(out, p, pageNum,
        (_, off) => { offsets += off; () })
    }
    val xrefPos = out.size()
    val size = offsets.length + 1
    w(s"xref\n0 $size\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $size /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Incremental update (PDF 32000-1 §7.5.6): appends `pages` to a
    * document WITHOUT touching its existing bytes — the layout
    * annotation tools and signing workflows actually emit. New page
    * and content objects continue the numbering; the pages root
    * (object 2) is REWRITTEN at a new offset under its original
    * object number; a second xref section lists only the changed
    * objects and its trailer chains to the previous table via /Prev.
    * A reader that fails to walk the chain newest-first loses either
    * the new pages or the catalog/font — [[parse]]'s newest-wins
    * table ordering is exactly what this layout tests. */
  def appendUpdate(base: Array[Byte], pages: Seq[PageSpec]): Array[Byte] = {
    val r = new Reader(base)
    r.loadXref()
    val oldKids: Vector[Int] = r.resolve(r.fetch(2)) match {
      case VDict(d) => d.get("Kids") match {
        case Some(VArr(ks)) => ks.collect { case VRef(n) => n }
        case _ => Vector.empty
      }
      case _ => Vector.empty
    }
    val oldSize = r.trailer.get("Size") match {
      case Some(n: VNum) => n.toLong.toInt
      case _ => return base
    }
    if (r.firstXrefAt < 0) return base
    val out = new ByteArrayOutputStream(base.length + 512)
    out.write(base)
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    // (objNum, offset) in write order: new pages first, then object 2
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var next = oldSize
    val newRefs = pages.map { p =>
      val pageNum = next
      next += writePageObjs(out, p, pageNum,
        (n, off) => { offsets += ((n, off)); () })
      pageNum
    }
    val rootOff = out.size().toLong
    w("2 0 obj\n<< /Type /Pages /Kids [" +
      (oldKids ++ newRefs).map(n => s"$n 0 R").mkString(" ") +
      s"] /Count ${oldKids.length + newRefs.length} >>\nendobj\n")
    val xrefPos = out.size()
    w("xref\n")
    w(f"2 1\n$rootOff%010d 00000 n \n")
    w(s"$oldSize ${offsets.length}\n")
    offsets.foreach { case (_, o) => w(f"$o%010d 00000 n \n") }
    w(s"trailer\n<< /Size $next /Root 1 0 R /Prev ${r.firstXrefAt} " +
      s">>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** A complete PDF 1.5 document — the layout virtually every
    * post-2005 writer emits: dict objects (catalog, pages root, font,
    * page dicts, indirect /Length ints) packed into ONE object
    * stream (/Type /ObjStm), content streams top-level, and a
    * CROSS-REFERENCE STREAM (/Type /XRef, W [1 3 1], FlateDecode
    * under the PNG Up predictor) in place of the classic table, with
    * its dict doubling as the trailer. Same object numbering as
    * [[build]] so the two forms share the /Size arithmetic modulo
    * the two extra container objects. */
  def buildXrefStream(pages: Seq[PageSpec]): Array[Byte] = {
    val per = pages.map(p => if (p.indirectLength) 3 else 2)
    val pageNums = pages.indices.map(i => 4 + per.take(i).sum)
    val objStmNum = 4 + per.sum
    val xrefNum = objStmNum + 1
    val packed = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    packed += ((1, "<< /Type /Catalog /Pages 2 0 R >>"))
    packed += ((2, "<< /Type /Pages /Kids [" +
      pageNums.map(n => s"$n 0 R").mkString(" ") +
      s"] /Count ${pages.length} >>"))
    packed += ((3,
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    val out = new ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    val offsets = scala.collection.mutable.HashMap.empty[Int, Long]
    w("%PDF-1.5\n")
    pages.zipWithIndex.foreach { case (p, i) =>
      val pageNum = pageNums(i)
      val contentNum = pageNum + 1
      packed += ((pageNum,
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          "/Resources << /Font << /F1 3 0 R >> >> " +
          s"/Contents $contentNum 0 R >>"))
      val data = renderContentData(p)
      offsets(contentNum) = out.size().toLong
      val lenPart =
        if (p.indirectLength) s"/Length ${contentNum + 1} 0 R"
        else s"/Length ${data.length}"
      val filterPart = if (p.flate) " /Filter /FlateDecode" else ""
      w(s"$contentNum 0 obj\n<< $lenPart$filterPart >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
      if (p.indirectLength)
        packed += ((contentNum + 1, s"${data.length}"))
    }
    // object stream: "num offset" pair header, then the serialized
    // objects; /Length is DIRECT (it must bootstrap the reader)
    val stmBody = new ByteArrayOutputStream(256)
    val header = new StringBuilder
    packed.foreach { case (n, s) =>
      header.append(n).append(' ').append(stmBody.size()).append(' ')
      stmBody.write(s.getBytes(UTF_8)); stmBody.write('\n')
    }
    val hb = header.toString.getBytes(UTF_8)
    val stmData = deflate(hb ++ stmBody.toByteArray)
    offsets(objStmNum) = out.size().toLong
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${packed.length} " +
      s"/First ${hb.length} /Filter /FlateDecode " +
      s"/Length ${stmData.length} >>\nstream\n")
    out.write(stmData)
    w("\nendstream\nendobj\n")
    val xrefPos = out.size().toLong
    val cols = 5 // W = [1 3 1]
    val rows = new ByteArrayOutputStream((xrefNum + 1) * cols)
    def row(t: Int, f2: Long, f3: Int): Unit = {
      rows.write(t)
      rows.write(((f2 >> 16) & 0xff).toInt)
      rows.write(((f2 >> 8) & 0xff).toInt)
      rows.write((f2 & 0xff).toInt)
      rows.write(f3 & 0xff)
    }
    val packedIdx = packed.zipWithIndex
      .map { case ((n, _), i) => n -> i }.toMap
    (0 to xrefNum).foreach { n =>
      if (n == 0) row(0, 0L, 255)
      else packedIdx.get(n) match {
        case Some(i) => row(2, objStmNum.toLong, i)
        case None => row(1, offsets.getOrElse(n, 0L), 0)
      }
    }
    val xData = deflate(pngUp(rows.toByteArray, cols))
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1} /W [1 3 1] " +
      "/Root 1 0 R /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $cols >> " +
      s"/Length ${xData.length} >>\nstream\n")
    out.write(xData)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------ parse

  private sealed trait V
  private final case class VNum(v: Double) extends V {
    def toLong: Long = v.toLong
  }
  private final case class VName(v: String) extends V
  private final case class VStr(v: String) extends V
  private final case class VArr(v: Vector[V]) extends V
  private final case class VDict(v: Map[String, V]) extends V
  private final case class VRef(num: Int) extends V
  private final case class VStream(dict: Map[String, V],
                                   raw: Array[Byte]) extends V
  private case object VOther extends V

  private final class Lexer(val b: Array[Byte], var pos: Int) {
    def ok: Boolean = pos >= 0 && pos < b.length
    def peek: Int = if (ok) b(pos) & 0xff else -1
    private def isWs(c: Int) =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    private def isDelim(c: Int) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
        c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      var going = true
      while (going && ok) {
        val c = peek
        if (isWs(c)) pos += 1
        else if (c == '%') { while (ok && peek != '\n' && peek != '\r') pos += 1 }
        else going = false
      }
    }
    def keyword(): String = {
      skipWs()
      val start = pos
      while (ok && !isWs(peek) && !isDelim(peek)) pos += 1
      new String(b, start, pos - start, UTF_8)
    }
    def tryLong(): Option[Long] = {
      skipWs()
      val start = pos
      if (ok && (peek == '+' || peek == '-')) pos += 1
      val ds = pos
      while (ok && peek >= '0' && peek <= '9') pos += 1
      if (pos == ds) { pos = start; None }
      else if (ok && peek == '.') { pos = start; None }
      else try Some(new String(b, start, pos - start, UTF_8).toLong)
      catch { case _: NumberFormatException => pos = start; None }
    }

    def value(depth: Int): V = {
      if (depth > 48) return VOther
      skipWs()
      if (!ok) return VOther
      peek match {
        case '/' =>
          pos += 1
          val start = pos
          while (ok && !isWs(peek) && !isDelim(peek)) pos += 1
          VName(new String(b, start, pos - start, UTF_8))
        case '(' => VStr(literalString())
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') dict(depth)
          else VStr(hexString())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[V]
          skipWs()
          while (ok && peek != ']') {
            items += value(depth + 1); skipWs()
          }
          if (ok) pos += 1
          VArr(items.result())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          numberOrRef()
        case _ =>
          keyword() match {
            case "true" | "false" | "null" => VOther
            case "" => pos += 1; VOther // skip an undigestable byte
            case _ => VOther
          }
      }
    }

    private def numberOrRef(): V = {
      val start = pos
      tryLong() match {
        case Some(n) =>
          val save = pos
          tryLong() match {
            case Some(_) =>
              skipWs()
              if (ok && peek == 'R' &&
                (pos + 1 >= b.length || isWs(b(pos + 1) & 0xff) ||
                  isDelim(b(pos + 1) & 0xff))) {
                pos += 1
                VRef(n.toInt)
              } else { pos = save; VNum(n.toDouble) }
            case None => pos = save; VNum(n.toDouble)
          }
        case None =>
          // real number
          pos = start
          if (ok && (peek == '+' || peek == '-')) pos += 1
          val ds = pos
          while (ok && ((peek >= '0' && peek <= '9') || peek == '.')) pos += 1
          if (pos == ds) { pos += 1; VOther }
          else try VNum(new String(b, start, pos - start, UTF_8).toDouble)
          catch { case _: NumberFormatException => VOther }
      }
    }

    def literalString(): String = {
      // pos at '('
      pos += 1
      val out = new ByteArrayOutputStream(32)
      var depth = 1
      while (ok && depth > 0) {
        val c = peek; pos += 1
        c match {
          case '(' => depth += 1; out.write('(')
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
          case '\\' =>
            if (ok) {
              val e = peek; pos += 1
              e match {
                case 'n' => out.write('\n')
                case 'r' => out.write('\r')
                case 't' => out.write('\t')
                case 'b' => out.write('\b')
                case 'f' => out.write('\f')
                case '\n' => () // line continuation
                case '\r' => if (ok && peek == '\n') pos += 1
                case d if d >= '0' && d <= '7' =>
                  var v = d - '0'
                  var k = 0
                  while (k < 2 && ok && peek >= '0' && peek <= '7') {
                    v = v * 8 + (peek - '0'); pos += 1; k += 1
                  }
                  out.write(v & 0xff)
                case other => out.write(other)
              }
            }
          case x => out.write(x)
        }
      }
      new String(out.toByteArray, UTF_8)
    }

    private def hexString(): String = {
      // pos at '<'
      pos += 1
      val out = new ByteArrayOutputStream(16)
      var hi = -1
      while (ok && peek != '>') {
        val c = peek; pos += 1
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out.write(hi * 16 + v); hi = -1 }
        }
      }
      if (ok) pos += 1
      if (hi >= 0) out.write(hi * 16) // odd count: pad with 0
      new String(out.toByteArray, UTF_8)
    }

    private def dict(depth: Int): V = {
      pos += 2 // <<
      val m = Map.newBuilder[String, V]
      skipWs()
      while (ok && peek != '>') {
        if (peek == '/') {
          pos += 1
          val start = pos
          while (ok && !isWs(peek) && !isDelim(peek)) pos += 1
          val key = new String(b, start, pos - start, UTF_8)
          m += key -> value(depth + 1)
        } else pos += 1 // tolerate junk between entries
        skipWs()
      }
      if (pos + 1 < b.length && b(pos) == '>' && b(pos + 1) == '>') pos += 2
      VDict(m.result())
    }
  }

  private final class Reader(b: Array[Byte]) {
    private val table = scala.collection.mutable.HashMap.empty[Int, Long]
    /** Type-2 entries from a cross-reference stream: object N lives
      * at index `idx` inside object stream `stm`. */
    private val inStream =
      scala.collection.mutable.HashMap.empty[Int, (Int, Int)]
    private val memo = scala.collection.mutable.HashMap.empty[Int, V]
    private val loadedStms = scala.collection.mutable.HashSet.empty[Int]
    var trailer: Map[String, V] = Map.empty
    var xrefOk = false
    /** True when any section in the chain was a PDF 1.5
      * cross-reference STREAM rather than a classic table. */
    var sawXrefStream = false
    /** Byte offset the tail `startxref` pointed at (the NEWEST xref
      * section) — what an incremental update must chain to via /Prev. */
    var firstXrefAt: Long = -1L

    def loadXref(): Unit = {
      val tailStart = math.max(0, b.length - 256)
      // ISO-8859-1: 1 byte = 1 char, so the string index IS the byte
      // offset — a UTF-8 decode here shifts the index whenever the
      // tail window overlaps a content stream with multi-byte text
      val tail = new String(b, tailStart, b.length - tailStart,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val sx = tail.lastIndexOf("startxref")
      if (sx < 0) return
      val lx = new Lexer(b, tailStart + sx + "startxref".length)
      lx.tryLong() match {
        case Some(first) =>
          firstXrefAt = first
          var at = first
          var hops = 0
          while (at >= 0 && at < b.length && hops < 8) {
            hops += 1
            at = loadSection(at.toInt)
          }
          xrefOk = table.nonEmpty && hops > 0
        case None => ()
      }
    }

    /** Parses one xref section at `off` — a classic `xref` table OR a
      * PDF 1.5 cross-reference stream — and returns the /Prev offset
      * or -1. Earlier sections in the chain win (newest first), which
      * also makes hybrid chains (a classic incremental update over a
      * stream-xref base, or vice versa) just work. */
    private def loadSection(off: Int): Long = {
      val lx = new Lexer(b, off)
      val save = lx.pos
      if (lx.keyword() != "xref") { lx.pos = save
        return loadStreamSection(off)
      }
      var going = true
      while (going) {
        val save = lx.pos
        (lx.tryLong(), lx.tryLong()) match {
          case (Some(start), Some(count)) if count >= 0 && count < 1000000 =>
            var i = 0L
            while (i < count) {
              (lx.tryLong(), lx.tryLong()) match {
                case (Some(o), Some(_)) =>
                  lx.skipWs()
                  val kind = lx.peek
                  lx.pos += 1
                  val objNum = (start + i).toInt
                  if (kind == 'n' && o >= 0 && o < b.length &&
                    !table.contains(objNum))
                    table(objNum) = o
                case _ => i = count // malformed entry: cut the section
              }
              i += 1
            }
          case _ =>
            lx.pos = save
            going = false
        }
      }
      if (lx.keyword() != "trailer") return -1L
      lx.value(0) match {
        case VDict(d) =>
          if (trailer.isEmpty) trailer = d
          d.get("Prev") match {
            case Some(n: VNum) => n.toLong
            case _ => -1L
          }
        case _ => -1L
      }
    }

    /** Parses a PDF 1.5 cross-reference STREAM at `off`: /W field
      * widths, optional /Index subsections, type-1 (offset) and
      * type-2 (object-stream member) entries, the stream dict doubling
      * as the trailer. Returns /Prev or -1. */
    private def loadStreamSection(off: Int): Long = {
      objectAt(off, 0) match {
        case VStream(d, raw) if d.get("Type").contains(VName("XRef")) =>
          val ws = d.get("W") match {
            case Some(VArr(a)) =>
              a.collect { case n: VNum => n.toLong.toInt }
            case _ => return -1L
          }
          if (ws.length < 3 || ws.exists(w => w < 0 || w > 8)) return -1L
          val data = decodeStream(d, raw)
          val size = d.get("Size") match {
            case Some(n: VNum) => n.toLong.toInt
            case _ => 0
          }
          val index: Vector[(Int, Int)] = d.get("Index") match {
            case Some(VArr(a)) =>
              a.collect { case n: VNum => n.toLong.toInt }
                .grouped(2).collect { case Seq(s, c) => (s, c) }.toVector
            case _ => Vector((0, size))
          }
          val rowW = ws.sum
          var p = 0
          def field(w: Int): Long = {
            var v = 0L; var k = 0
            while (k < w) { v = (v << 8) | (data(p) & 0xff); p += 1; k += 1 }
            v
          }
          index.foreach { case (start, count) =>
            var i = 0
            while (i < count && rowW > 0 && p + rowW <= data.length) {
              val t = if (ws(0) == 0) 1L else field(ws(0))
              val f2 = field(ws(1))
              val f3 = field(ws(2))
              val objNum = start + i
              if (!table.contains(objNum) && !inStream.contains(objNum)) {
                if (t == 1L && f2 >= 0 && f2 < b.length)
                  table(objNum) = f2
                else if (t == 2L) inStream(objNum) = (f2.toInt, f3.toInt)
              }
              i += 1
            }
          }
          sawXrefStream = true
          if (trailer.isEmpty) trailer = d
          d.get("Prev") match {
            case Some(n: VNum) => n.toLong
            case _ => -1L
          }
        case _ => -1L
      }
    }

    /** Repair path: linear scan for `N G obj` headers. */
    def scanObjects(): Unit = {
      var i = 0
      val pat = "obj".getBytes(UTF_8)
      while (i + 2 < b.length) {
        if (b(i) == pat(0) && b(i + 1) == pat(1) && b(i + 2) == pat(2)) {
          // walk back over ws, gen, ws, num
          var j = i - 1
          def back(p: Int, digit: Boolean): Int = {
            var k = p
            while (k >= 0 && (if (digit) b(k) >= '0' && b(k) <= '9'
            else b(k) == ' ' || b(k) == '\n' || b(k) == '\r')) k -= 1
            k
          }
          val g1 = back(j, digit = false)
          val g0 = back(g1, digit = true)
          if (g0 < g1) {
            val n1 = back(g0, digit = false)
            val n0 = back(n1, digit = true)
            if (n0 < n1 && (n0 < 0 || !(b(n0) >= '0' && b(n0) <= '9'))) {
              try {
                val num = new String(b, n0 + 1, n1 - n0, UTF_8).trim.toInt
                if (!table.contains(num)) table(num) = (n0 + 1).toLong
              } catch { case _: NumberFormatException => () }
            }
          }
        }
        i += 1
      }
    }

    /** Parse the `N G obj` at byte offset `off`. */
    private def objectAt(off: Int, depth: Int): V = {
      val lx = new Lexer(b, off)
      (lx.tryLong(), lx.tryLong()) match {
        case (Some(_), Some(_)) =>
          if (lx.keyword() != "obj") VOther
          else {
            val v = lx.value(0)
            v match {
              case VDict(d) =>
                // stream?
                val save = lx.pos
                if (lx.keyword() == "stream") {
                  if (lx.ok && lx.peek == '\r') lx.pos += 1
                  if (lx.ok && lx.peek == '\n') lx.pos += 1
                  val len = resolve(d.getOrElse("Length", VOther),
                    depth + 1) match {
                    case n: VNum => n.toLong
                    case _ => -1L
                  }
                  val start = lx.pos.toLong
                  if (len >= 0 && start + len <= b.length)
                    VStream(d, java.util.Arrays.copyOfRange(
                      b, start.toInt, (start + len).toInt))
                  else VOther
                } else { lx.pos = save; v }
              case other => other
            }
          }
        case _ => VOther
      }
    }

    /** Filter chain for a cross-reference or object stream:
      * FlateDecode, then the PNG predictor when /DecodeParms asks. */
    private def decodeStream(d: Map[String, V], raw: Array[Byte])
        : Array[Byte] = {
      val data = d.get("Filter") match {
        case Some(VName("FlateDecode")) => inflate(raw)
        case Some(VArr(fs)) if fs.contains(VName("FlateDecode")) =>
          inflate(raw)
        case _ => raw
      }
      d.get("DecodeParms") match {
        case Some(VDict(p)) =>
          val pred = p.get("Predictor") match {
            case Some(n: VNum) => n.toLong.toInt
            case _ => 1
          }
          val cols = p.get("Columns") match {
            case Some(n: VNum) => n.toLong.toInt
            case _ => 1
          }
          if (pred >= 10) pngUnpredict(data, cols) else data
        case _ => data
      }
    }

    /** Decode one /Type /ObjStm and memoize every object the xref
      * assigned to it (newest-wins: an object a NEWER section placed
      * elsewhere is not overwritten). */
    private def loadObjStm(stm: Int, depth: Int): Unit = {
      if (depth > 16 || !loadedStms.add(stm)) return
      fetch(stm, depth + 1) match {
        case VStream(d, raw)
          if d.get("Type").contains(VName("ObjStm")) =>
          val data = decodeStream(d, raw)
          val n = d.get("N") match {
            case Some(x: VNum) => x.toLong.toInt
            case _ => 0
          }
          val first = d.get("First") match {
            case Some(x: VNum) => x.toLong.toInt
            case _ => 0
          }
          val hdr = new Lexer(data, 0)
          var i = 0
          while (i < n) {
            (hdr.tryLong(), hdr.tryLong()) match {
              case (Some(num), Some(off)) =>
                val at = first + off
                val objNum = num.toInt
                if (at >= 0 && at < data.length &&
                  !memo.contains(objNum) &&
                  inStream.get(objNum).exists(_._1 == stm))
                  memo(objNum) = new Lexer(data, at.toInt).value(0)
              case _ => i = n
            }
            i += 1
          }
        case _ => ()
      }
    }

    def fetch(num: Int, depth: Int = 0): V = {
      if (depth > 16) return VOther
      memo.get(num) match {
        case Some(v) => v
        case None =>
          val v = table.get(num) match {
            case Some(off) => objectAt(off.toInt, depth)
            case None =>
              inStream.get(num) match {
                case Some((stm, _)) =>
                  loadObjStm(stm, depth)
                  memo.getOrElse(num, VOther)
                case None => VOther
              }
          }
          memo(num) = v
          v
      }
    }

    def resolve(v: V, depth: Int = 0): V = v match {
      case VRef(n) if depth <= 16 => resolve(fetch(n, depth + 1), depth + 1)
      case other => other
    }

    /** Lowest-numbered /Type /Catalog object, or -1 — the reader-
      * repair root when the trailer is unreadable. */
    def findCatalog(): Int = {
      val nums = table.keys.toArray
      java.util.Arrays.sort(nums)
      var i = 0
      while (i < nums.length) {
        fetch(nums(i)) match {
          case VDict(d) if d.get("Type").contains(VName("Catalog")) =>
            return nums(i)
          case _ => ()
        }
        i += 1
      }
      -1
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](4096)
    try {
      var guard = 0
      while (!inf.finished() && guard < (1 << 16)) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) guard = 1 << 16 // truncated
        else out.write(buf, 0, n)
        guard += 1
      }
      out.toByteArray
    } catch {
      case _: DataFormatException => out.toByteArray
    } finally inf.end()
  }

  /** Text-operator scan of one decoded content stream:
    * BT..ET blocks joined with '\n'. */
  private[ops] def extractText(content: Array[Byte]): String = {
    val lx = new Lexer(content, 0)
    val blocks = Vector.newBuilder[String]
    var cur: java.lang.StringBuilder = null
    var lastArr: Vector[V] = Vector.empty
    var lastStr: String = null
    while (lx.ok) {
      lx.skipWs()
      if (!lx.ok) ()
      else lx.peek match {
        case '(' => lastStr = lx.literalString()
        case '[' =>
          lx.value(0) match {
            case VArr(items) => lastArr = items
            case _ => ()
          }
        case '<' =>
          lx.value(0) match {
            case VStr(s) => lastStr = s
            case _ => ()
          }
        case '/' => lx.value(0)
        case c if c == '+' || c == '-' || c == '.' ||
          (c >= '0' && c <= '9') => lx.value(0)
        case '\'' =>
          lx.pos += 1
          if (cur != null && lastStr != null) {
            cur.append('\n'); cur.append(lastStr)
          }
        case '"' =>
          lx.pos += 1
          if (cur != null && lastStr != null) {
            cur.append('\n'); cur.append(lastStr)
          }
        case _ =>
          lx.keyword() match {
            case "BT" => cur = new java.lang.StringBuilder()
            case "ET" =>
              if (cur != null) blocks += cur.toString
              cur = null
            case "Tj" =>
              if (cur != null && lastStr != null) cur.append(lastStr)
            case "TJ" =>
              if (cur != null) lastArr.foreach {
                case VStr(s) => cur.append(s)
                case _ => ()
              }
            case "" => lx.pos += 1
            case _ => ()
          }
      }
    }
    blocks.result().mkString("\n")
  }

  /** Total parse: pages in tree order with their extracted text. */
  def parse(b: Array[Byte]): Doc = {
    if (b == null || b.length < 8) return Doc(Vector.empty, 0, ok = false)
    try {
      val r = new Reader(b)
      r.loadXref()
      if (!r.xrefOk) r.scanObjects()
      val rootRef = r.trailer.get("Root") match {
        case Some(VRef(n)) => n
        case _ =>
          // repair path: linear object scan, then take the object
          // whose dict is /Type /Catalog as the root
          r.scanObjects()
          r.findCatalog()
      }
      val size = r.trailer.get("Size") match {
        case Some(n: VNum) => n.toLong.toInt
        case _ => 0
      }
      val root = if (rootRef >= 0) r.fetch(rootRef) else VOther
      val pagesRef = root match {
        case VDict(d) => d.get("Pages")
        case _ => None
      }
      val pages = Vector.newBuilder[Page]
      var walked = 0
      def walk(v: V, depth: Int): Unit = {
        if (depth > 32 || walked > 100000) return
        r.resolve(v) match {
          case VDict(d) =>
            d.get("Type") match {
              case Some(VName("Pages")) =>
                r.resolve(d.getOrElse("Kids", VOther)) match {
                  case VArr(kids) => kids.foreach(walk(_, depth + 1))
                  case _ => ()
                }
              case Some(VName("Page")) =>
                walked += 1
                val contents = d.get("Contents") match {
                  case Some(VArr(cs)) => cs
                  case Some(c) => Vector(c)
                  case None => Vector.empty
                }
                var flate = false
                val body = new ByteArrayOutputStream(256)
                contents.foreach { c =>
                  r.resolve(c) match {
                    case VStream(sd, raw) =>
                      val isFlate = sd.get("Filter") match {
                        case Some(VName("FlateDecode")) => true
                        case Some(VArr(fs)) =>
                          fs.contains(VName("FlateDecode"))
                        case _ => false
                      }
                      if (isFlate) flate = true
                      body.write(if (isFlate) inflate(raw) else raw)
                    case _ => ()
                  }
                }
                pages += Page(extractText(body.toByteArray), flate)
              case _ => ()
            }
          case _ => ()
        }
      }
      pagesRef.foreach(walk(_, 0))
      val ps = pages.result()
      Doc(ps, size, ok = r.trailer.nonEmpty && ps.nonEmpty,
        updated = r.trailer.contains("Prev"),
        xrefStream = r.sawXrefStream)
    } catch {
      case _: RuntimeException => Doc(Vector.empty, 0, ok = false)
    }
  }
}
