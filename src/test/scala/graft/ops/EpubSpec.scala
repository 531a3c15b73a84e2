package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** EPUB source ([[Epub]]): OCF container rules (stored-first
  * mimetype), container.xml → OPF → spine walk, SPINE-order chapter
  * extraction (not zip order), entity round-trip through the XHTML
  * escape + HTML extract, and totality on damage. */
class EpubSpec extends AnyFunSuite {

  private val chapters = Seq(
    Seq("Chapter one opens", "a & b < c mixed"),
    Seq("Chapter two follows", "plain line"),
    Seq("Chapter three ends", "x > y again"))

  test("round-trips title and chapters; spine order rules, not " +
    "archive order") {
    val fwd = Epub.parse(Epub.build("Book A", chapters, Seq(0, 1, 2)))
    assert(fwd.ok && fwd.title == "Book A")
    assert(fwd.chapters == Vector(
      "Chapter one opens\na & b < c mixed",
      "Chapter two follows\nplain line",
      "Chapter three ends\nx > y again"))
    val rev = Epub.parse(Epub.build("Book B", chapters, Seq(2, 1, 0)))
    assert(rev.ok && rev.chapters == fwd.chapters.reverse)
  }

  test("OCF discipline: mimetype is the FIRST member and STORED; a " +
    "deflated or wrong mimetype drops ok but text still extracts") {
    val good = Epub.build("T", chapters.take(1), Seq(0))
    val members = Archive.parseZip(good)
    assert(members.head.name == "mimetype" && !members.head.deflated)
    assert(members.head.text == "application/epub+zip")
    // rebuild with everything deflated: same content, ok must drop
    val rebuilt = Archive.buildZip(
      members.map(m => (m.name, m.body)), _ => true)
    val doc = Epub.parse(rebuilt)
    assert(!doc.ok && doc.chapters.nonEmpty)
  }

  test("a spine entry whose chapter is missing from the archive is " +
    "skipped and flags ok=false") {
    val good = Epub.build("T", chapters, Seq(0, 1, 2))
    val members = Archive.parseZip(good)
      .filterNot(_.name == "OEBPS/ch1.xhtml")
    val rebuilt = Archive.buildZip(
      members.map(m => (m.name, m.body)),
      i => members(i).name != "mimetype")
    val doc = Epub.parse(rebuilt)
    assert(!doc.ok)
    assert(doc.chapters == Vector(
      "Chapter one opens\na & b < c mixed",
      "Chapter three ends\nx > y again"))
  }

  test("total on damage: truncation, corruption, garbage, empty, " +
    "null never throw") {
    val good = Epub.build("T", chapters, Seq(1, 0, 2))
    for (k <- 0 until good.length by math.max(1, good.length / 31))
      Epub.parse(java.util.Arrays.copyOf(good, k)) // never throws
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 150) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Epub.parse(b)
    }
    assert(!Epub.parse(null).ok)
    assert(!Epub.parse(Array.emptyByteArray).ok)
    assert(!Epub.parse("not a zip at all".getBytes(UTF_8)).ok)
  }
}
