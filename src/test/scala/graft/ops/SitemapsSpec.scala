package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** sitemaps.org build/parse ([[Sitemaps]]): urlset and sitemapindex
  * round-trips, entity escaping through `<loc>`, optional-field
  * handling, priority quantization, and damage totality. */
class SitemapsSpec extends AnyFunSuite {

  private val entries = Vector(
    Sitemaps.Entry("http://a.com/p?x=1&y=2", "2024-01-05", "daily", 7,
      ok = true),
    Sitemaps.Entry("http://b.com/q", "", "", -1, ok = true),
    Sitemaps.Entry("http://c.com/r", "2024-02-28", "monthly", 10,
      ok = true))

  test("urlset round-trip: loc escaping, optional fields, priority " +
    "one-decimal quantization") {
    val got = Sitemaps.parseUrlset(Sitemaps.buildUrlset(entries))
    assert(got == entries) // '&' in loc survived escape/unescape
    val xml = new String(Sitemaps.buildUrlset(entries), UTF_8)
    assert(xml.contains("&amp;y=2") && !xml.contains("<lastmod></lastmod>"))
    assert(xml.contains("<priority>1.0</priority>")) // 10 renders 1.0
  }

  test("sitemapindex round-trip") {
    val idx = Vector(
      Sitemaps.IndexEntry("http://a.com/sitemap-0.xml", "2024-01-01"),
      Sitemaps.IndexEntry("http://a.com/sitemap-1.xml", ""))
    assert(Sitemaps.parseIndex(Sitemaps.buildIndex(idx)) == idx)
    // an index parses to zero urlset entries and vice versa
    assert(Sitemaps.parseUrlset(Sitemaps.buildIndex(idx)).isEmpty)
    assert(Sitemaps.parseIndex(Sitemaps.buildUrlset(entries)).isEmpty)
  }

  test("priority parse: out-of-range and garbage -> -1") {
    val xml = ("<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>http://x/1</loc><priority>0.55</priority></url>" +
      "<url><loc>http://x/2</loc><priority>2.0</priority></url>" +
      "<url><loc>http://x/3</loc><priority>abc</priority></url>" +
      "</urlset>").getBytes(UTF_8)
    val got = Sitemaps.parseUrlset(xml)
    assert(got.map(_.priority10) == Vector(6, -1, -1)) // 0.55 rounds to 6
  }

  test("totality: null, empty, truncation cut, missing loc, garbage") {
    assert(Sitemaps.parseUrlset(null).isEmpty)
    assert(Sitemaps.parseUrlset(Array.emptyByteArray).isEmpty)
    val whole = Sitemaps.buildUrlset(entries)
    // cut after the second </url>: the first two entries survive
    val cutAt = new String(whole, UTF_8).indexOf("</url>",
      new String(whole, UTF_8).indexOf("</url>") + 1) + 6
    val cut = java.util.Arrays.copyOfRange(whole, 0, cutAt)
    assert(Sitemaps.parseUrlset(cut) == entries.take(2))
    val noLoc = ("<?xml version=\"1.0\"?><urlset><url>" +
      "<lastmod>2024-01-01</lastmod></url></urlset>").getBytes(UTF_8)
    val e = Sitemaps.parseUrlset(noLoc)
    assert(e.size == 1 && !e.head.ok)
    assert(Sitemaps.parseUrlset("<<<not xml>>>".getBytes(UTF_8)).isEmpty)
    assert(Sitemaps.parseIndex("<<<not xml>>>".getBytes(UTF_8)).isEmpty)
    // a DOCTYPE (XXE vector) must not parse entities or throw
    val dtd = ("<?xml version=\"1.0\"?><!DOCTYPE urlset [<!ENTITY x " +
      "\"boom\">]><urlset><url><loc>http://x/&x;</loc></url></urlset>")
      .getBytes(UTF_8)
    Sitemaps.parseUrlset(dtd) // must not throw; content may be cut
  }
}
