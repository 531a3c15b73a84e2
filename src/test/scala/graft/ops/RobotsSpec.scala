package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** robots.txt ([[Robots]]): RFC 9309 group selection, longest-match
  * precedence with Allow winning ties, wildcard/anchor semantics,
  * stacked user-agent lines, and totality on malformed input. */
class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# comment
      |User-agent: alphabot
      |User-agent: betabot
      |Disallow: /x
      |
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /tmp/*
      |Allow: /exact$
      |Crawl-delay: 2.5
      |Weird-directive: ignored
      |""".stripMargin

  private val g = Robots.parse(txt)

  test("group selection: specific agent (case-insensitive, stacked " +
    "user-agent lines) shadows the star group") {
    assert(Robots.decide(g, "AlphaBot", "/private/anything")._1)
    assert(!Robots.decide(g, "betabot", "/x/sub")._1)
    assert(!Robots.decide(g, "otherbot", "/private/anything")._1)
  }

  test("longest pattern wins; Allow wins length ties; no match allows") {
    assert(!Robots.decide(g, "c", "/private/x")._1)
    assert(Robots.decide(g, "c", "/private/ok/deep")._1)
    assert(Robots.decide(g, "c", "/elsewhere")._1)
    // tie: Allow and Disallow of equal length -> allowed
    val tie = Robots.parse(
      "User-agent: *\nDisallow: /ab\nAllow: /ab\n")
    assert(Robots.decide(tie, "c", "/ab")._1)
  }

  test("wildcards and the $ anchor") {
    assert(!Robots.decide(g, "c", "/tmp/z")._1)
    assert(Robots.decide(g, "c", "/tmpfile")._1) // /tmp/* needs the slash
    assert(Robots.decide(g, "c", "/exact")._1)
    // anchored pattern must match the WHOLE path
    val a = Robots.parse("User-agent: *\nDisallow: /exact$\n")
    assert(!Robots.decide(a, "c", "/exact")._1)
    assert(Robots.decide(a, "c", "/exactly")._1)
    val w = Robots.parse("User-agent: *\nDisallow: /a*/b$\n")
    assert(!Robots.decide(w, "c", "/aXYZ/b")._1)
    assert(Robots.decide(w, "c", "/aXYZ/bc")._1)
  }

  test("crawl-delay rides the chosen group; absent elsewhere") {
    assert(Robots.decide(g, "c", "/anything")._2 == 2.5)
    assert(Robots.decide(g, "alphabot", "/y")._2 == 0.0)
  }

  test("total on malformed/empty input; empty file allows everything") {
    assert(Robots.parse(null).isEmpty)
    assert(Robots.decide(Robots.parse(""), "c", "/x")._1)
    val junk = Robots.parse(
      "%%%\nDisallow: /orphan-before-any-group\nUser-agent *\nfoo\n")
    assert(Robots.decide(junk, "c", "/orphan-before-any-group")._1)
    // rules before any user-agent line are dropped (no open group)
    val mixed = Robots.parse("Disallow: /a\nUser-agent: *\nDisallow: /b\n")
    assert(Robots.decide(mixed, "c", "/a")._1)
    assert(!Robots.decide(mixed, "c", "/b")._1)
  }
}
