package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** PDF source ([[Pdf]]): writer/reader round-trip across the
  * flate x indirect-length grid, literal-string escaping, TJ-array
  * reassembly, incremental updates (/Prev xref chain, newest-wins
  * object override), the trailer /Size formula the q_source_pdf
  * oracle replays, content-stream operator coverage (', ", hex
  * strings), and totality on truncation/corruption/garbage. */
class PdfSpec extends AnyFunSuite {

  private def spec(blocks: String*)(flate: Boolean = false,
                                    ind: Boolean = false) =
    Pdf.PageSpec(blocks.toVector, flate, ind)

  test("round-trips text through every flate x indirectLength cell") {
    for (flate <- Seq(false, true); ind <- Seq(false, true)) {
      val pages = Seq(
        spec("single")(flate, ind),
        spec("two words", "second block here")(flate, ind))
      val doc = Pdf.parse(Pdf.build(pages))
      assert(doc.ok, s"flate=$flate ind=$ind")
      assert(doc.pages.map(_.text) ==
        Vector("single", "two words\nsecond block here"))
      assert(doc.pages.forall(_.flate == flate))
      assert(doc.size == 4 + 2 * (if (ind) 3 else 2))
      assert(!doc.updated)
    }
  }

  test("escapes parens, backslash, newline and tab through the " +
    "literal-string path, and non-ASCII UTF-8 survives") {
    val tricky = "k(v)=\\x (a) \\\\ end\ttab\nnl café 中文"
    val doc = Pdf.parse(Pdf.build(Seq(spec(tricky)())))
    assert(doc.ok && doc.pages.head.text == tricky)
    // the raw bytes really contain escape sequences, not bare parens
    val s = new String(Pdf.build(Seq(spec("a(b)c")())), UTF_8)
    assert(s.contains("a\\(b\\)c"))
  }

  test("TJ arrays reassemble blocks exactly: kern numbers ignored, " +
    "carried spaces restored, multi-space runs preserved") {
    val blocks = Vector("alpha beta  gamma", "x", " lead and trail ")
    val doc = Pdf.parse(Pdf.build(Seq(Pdf.PageSpec(blocks, flate = false,
      indirectLength = false))))
    assert(doc.ok && doc.pages.head.text == blocks.mkString("\n"))
  }

  test("incremental update: base bytes untouched, /Prev chain walked " +
    "newest-first, pages root override wins, size formula holds") {
    val base = Pdf.build(Seq(spec("page one body")(flate = true)))
    val upd = Pdf.appendUpdate(base,
      Seq(spec("page two body")(), spec("page three body")(ind = true)))
    // a true incremental update never rewrites existing bytes
    assert(upd.length > base.length &&
      java.util.Arrays.equals(upd.take(base.length), base))
    val doc = Pdf.parse(upd)
    assert(doc.ok && doc.updated)
    assert(doc.pages.map(_.text) ==
      Vector("page one body", "page two body", "page three body"))
    assert(doc.pages.map(_.flate) == Vector(true, false, false))
    // base: 3 shared + 2 objs; update: +2 (direct) +3 (indirect)
    assert(doc.size == 4 + 2 + 2 + 3)
    // the base alone still parses as its own single-page generation
    val b = Pdf.parse(base)
    assert(b.ok && !b.updated && b.pages.map(_.text) ==
      Vector("page one body"))
  }

  test("PDF 1.5: cross-reference stream + object stream round-trips " +
    "across the flate x indirectLength grid, size formula holds") {
    for (flate <- Seq(false, true); ind <- Seq(false, true)) {
      val pages = Seq(
        spec("xref stream page café")(flate, ind),
        spec("two words here", "block two")(flate, ind))
      val doc = Pdf.parse(Pdf.buildXrefStream(pages))
      assert(doc.ok && doc.xrefStream && !doc.updated,
        s"flate=$flate ind=$ind")
      assert(doc.pages.map(_.text) ==
        Vector("xref stream page café", "two words here\nblock two"))
      // 3 shared dicts + per-page objects + ObjStm + XRef stream
      assert(doc.size == 6 + 2 * (if (ind) 3 else 2))
    }
    // the classic form never reports a stream xref
    assert(!Pdf.parse(Pdf.build(Seq(spec("x")()))).xrefStream)
  }

  test("hybrid chain: a classic incremental update over a 1.5 " +
    "stream-xref base walks both section kinds newest-first") {
    val base = Pdf.buildXrefStream(Seq(spec("stream base page")(
      flate = true)))
    val upd = Pdf.appendUpdate(base, Seq(spec("classic update page")()))
    assert(java.util.Arrays.equals(upd.take(base.length), base))
    val doc = Pdf.parse(upd)
    assert(doc.ok && doc.updated && doc.xrefStream)
    assert(doc.pages.map(_.text) ==
      Vector("stream base page", "classic update page"))
  }

  test("content-stream operator coverage: ' and \" prefix a newline, " +
    "hex strings decode, stray operators are skipped") {
    val content = ("BT (first) Tj (second) ' <414243> Tj " +
      "1 0 0 1 72 700 Tm (third) \" ET").getBytes(UTF_8)
    assert(Pdf.extractText(content) == "first\nsecondABC\nthird")
  }

  test("total on damage: truncations, byte corruption, garbage, " +
    "empty and null never throw") {
    val rnd = new scala.util.Random(7)
    for (good <- Seq(
      Pdf.build(Seq(spec("alpha beta")(flate = true),
        spec("gamma")(ind = true))),
      Pdf.buildXrefStream(Seq(spec("alpha beta")(flate = true),
        spec("gamma")(ind = true))))) {
      for (k <- 0 until good.length by math.max(1, good.length / 41)) {
        val doc = Pdf.parse(good.take(k)) // never throws
        assert(doc.pages.length <= 2)
      }
      for (_ <- 0 until 200) {
        val b = good.clone()
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        Pdf.parse(b) // never throws; any recovered prefix is fine
      }
    }
    for (_ <- 0 until 50) {
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      assert(!Pdf.parse(junk).ok)
    }
    assert(!Pdf.parse(null).ok && !Pdf.parse(Array.emptyByteArray).ok)
  }

  test("a zeroed xref offset cuts that page, not the document") {
    val good = Pdf.build(Seq(spec("aaa")(), spec("bbb")()))
    val s = new String(good, UTF_8)
    // corrupt the startxref target so the table never loads: the
    // linear N-G-obj repair scan must still find the objects
    val sx = s.lastIndexOf("startxref")
    val broken = (s.substring(0, sx) + "startxref\n999999999\n%%EOF\n")
      .getBytes(UTF_8)
    val doc = Pdf.parse(broken)
    // linear scan finds the objects, findCatalog restores the root:
    // full text recovery, but the doc is flagged not-ok
    assert(!doc.ok && doc.pages.map(_.text) == Vector("aaa", "bbb"))
  }
}
