package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** XML dump source ([[Xml]]): build/parse round-trip at the page
  * grain, entity escaping, revision-vs-page id scoping, redirect
  * detection, totality on truncation/garbage, and the XXE/DTD
  * hardening contract. */
class XmlSpec extends AnyFunSuite {

  private def mk(id: Long, text: String, redirect: Boolean = false) =
    Xml.Page(id, (id % 3).toInt, s"P&$id", id * 7 + 3,
      f"2024-01-${id % 28 + 1}%02dT${id % 24}%02d:00:00Z",
      s"user_${id % 50}", text, redirect, ok = true)

  private val pages = Vector(
    mk(1L, "plain body text"),
    mk(2L, "escapes: 5 < 6 && 7 > 2 \"quoted\" body", redirect = true),
    mk(3L, ""),
    mk(44L, "multi\nline\n  indented body"))

  test("round-trips every field through build -> StAX parse, " +
    "escaping included") {
    val got = Xml.parseDump(Xml.buildDump(pages))
    assert(got.size == 4 && got.forall(_.ok))
    got.zip(pages).foreach { case (g, p) =>
      assert(g.id == p.id && g.ns == p.ns && g.title == p.title)
      assert(g.revId == p.revId && g.timestamp == p.timestamp)
      assert(g.contributor == p.contributor)
      assert(g.text == p.text, s"text mismatch for page ${p.id}")
      assert(g.redirect == p.redirect)
    }
    // the raw bytes really contain entities, not raw specials
    val s = new String(Xml.buildDump(pages), UTF_8)
    assert(s.contains("P&amp;1") && s.contains("5 &lt; 6 &amp;&amp; 7 &gt; 2"))
  }

  test("revision id never clobbers page id (scope walk), and a page " +
    "missing required fields surfaces ok=false") {
    val xml = ("<mediawiki><page><title>T</title><ns>0</ns><id>9</id>" +
      "<revision><id>77</id><timestamp>2024-01-01T00:00:00Z</timestamp>" +
      "<text>b</text></revision></page>" +
      // second page: no <ns>, no revision id
      "<page><title>U</title><id>10</id><revision>" +
      "<timestamp>2024-01-02T00:00:00Z</timestamp><text>c</text>" +
      "</revision></page></mediawiki>").getBytes(UTF_8)
    val got = Xml.parseDump(xml)
    assert(got.size == 2)
    assert(got(0).ok && got(0).id == 9L && got(0).revId == 77L)
    assert(!got(1).ok && got(1).id == 10L && got(1).revId == -1L)
  }

  test("total on damage: truncation keeps fully-parsed pages, " +
    "garbage/null/empty yield empty") {
    val full = Xml.buildDump(pages)
    // cut inside page 3's region: pages 1-2 must survive
    val cutAt = new String(full, UTF_8).indexOf("P&amp;3")
    val got = Xml.parseDump(java.util.Arrays.copyOfRange(full, 0, cutAt))
    assert(got.map(_.id) == Vector(1L, 2L))
    assert(Xml.parseDump(null).isEmpty)
    assert(Xml.parseDump(Array.emptyByteArray).isEmpty)
    assert(Xml.parseDump("not xml at all".getBytes(UTF_8)).isEmpty)
    // byte-fuzz: flipping any single byte never throws
    var i = 0
    while (i < full.length) {
      val b = full.clone()
      b(i) = (b(i) ^ 0x55).toByte
      Xml.parseDump(b)
      i += 37 // stride keeps the loop cheap; coverage across regions
    }
  }

  test("DTD and external entities are refused (XXE hardening)") {
    val xxe = ("<?xml version=\"1.0\"?><!DOCTYPE mediawiki [" +
      "<!ENTITY xxe SYSTEM \"file:///etc/passwd\">]>" +
      "<mediawiki><page><title>&xxe;</title><ns>0</ns><id>1</id>" +
      "<revision><id>8</id><timestamp>t</timestamp><text>b</text>" +
      "</revision></page></mediawiki>").getBytes(UTF_8)
    val got = Xml.parseDump(xxe)
    // either the DTD is rejected outright (no pages) or the entity
    // stays unresolved — the file's contents must never appear
    assert(got.forall(p => !p.title.contains("root:")))
  }
}
