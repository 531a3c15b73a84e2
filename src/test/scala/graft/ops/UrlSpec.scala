package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization ([[Url]]): RFC 3986 section 6 syntax-based
  * normalization — every rule individually, composition on the
  * fixture spellings the oracle queries rely on, and totality. */
class UrlSpec extends AnyFunSuite {

  test("scheme and host lowercase; fragment stripped") {
    assert(Url.canonicalize("HTTP://ExAmple.CoM/Path#Frag") ==
      "http://example.com/Path")
    // path case is PRESERVED (paths are case-sensitive)
    assert(Url.canonicalize("https://A.B/CaSe") == "https://a.b/CaSe")
  }

  test("default ports drop; explicit ports keep; leading zeros strip") {
    assert(Url.canonicalize("http://h.com:80/x") == "http://h.com/x")
    assert(Url.canonicalize("https://h.com:443/x") == "https://h.com/x")
    assert(Url.canonicalize("ftp://h.com:21/x") == "ftp://h.com/x")
    assert(Url.canonicalize("http://h.com:8080/x") == "http://h.com:8080/x")
    assert(Url.canonicalize("http://h.com:08080/x") == "http://h.com:8080/x")
    assert(Url.canonicalize("https://h.com:80/x") == "https://h.com:80/x")
  }

  test("percent-normalization: unreserved decode, reserved uppercase, " +
    "invalid escapes literal") {
    assert(Url.canonicalize("http://h.com/f%6fo") == "http://h.com/foo")
    assert(Url.canonicalize("http://h.com/a%2fb") == "http://h.com/a%2Fb")
    assert(Url.canonicalize("http://h.com/%7Euser") == "http://h.com/~user")
    assert(Url.canonicalize("http://h.com/100%zz") == "http://h.com/100%zz")
    assert(Url.canonicalize("http://h.com/end%2") == "http://h.com/end%2")
    assert(Url.canonicalize("http://h.com/?x=%41&y=%2B") ==
      "http://h.com/?x=A&y=%2B")
  }

  test("dot-segment removal, %2E included; trailing dot segment " +
    "leaves a slash") {
    assert(Url.canonicalize("http://h.com/a/b/../c/./d") ==
      "http://h.com/a/c/d")
    assert(Url.canonicalize("http://h.com/a/%2E%2E/b") == "http://h.com/b")
    assert(Url.canonicalize("http://h.com/a/b/..") == "http://h.com/a/")
    assert(Url.canonicalize("http://h.com/a/b/.") == "http://h.com/a/b/")
    assert(Url.canonicalize("http://h.com/../a") == "http://h.com/a")
    assert(Url.canonicalize("http://h.com/a//b/../c") == "http://h.com/a//c")
    // dotted FILENAMES are not dot segments
    assert(Url.canonicalize("http://h.com/v1.2/.well-known") ==
      "http://h.com/v1.2/.well-known")
  }

  test("empty path gets /; empty query drops; query content survives") {
    assert(Url.canonicalize("http://h.com") == "http://h.com/")
    assert(Url.canonicalize("http://h.com?") == "http://h.com/")
    assert(Url.canonicalize("http://h.com?b=2&a=1") ==
      "http://h.com/?b=2&a=1") // order preserved — sorting changes semantics
  }

  test("host trailing dot strips; userinfo and IPv6 survive; " +
    "embedded whitespace strips") {
    assert(Url.canonicalize("http://h.com./x") == "http://h.com/x")
    assert(Url.canonicalize("http://u:p@H.com/x") == "http://u:p@h.com/x")
    assert(Url.canonicalize("http://[2001:DB8::1]:80/x") ==
      "http://[2001:db8::1]/x")
    assert(Url.canonicalize(" http://h.com/a\tb\n ") == "http://h.com/ab")
  }

  test("totality: null, garbage, schemeless, non-hierarchical") {
    assert(Url.canonicalize(null) == null)
    assert(Url.canonicalize("") == "")
    assert(Url.canonicalize("not a url") == "not a url")
    assert(Url.canonicalize("MAILTO:User@Host") == "mailto:User@Host")
    assert(Url.canonicalize("//proto-relative/x") == "//proto-relative/x")
    assert(Url.canonicalize("1http://bad-scheme/x") == "1http://bad-scheme/x")
  }

  test("hostOf / pathOf split the frontier keys") {
    assert(Url.hostOf("http://u@h.com:81/a/b?q=1") == "h.com")
    assert(Url.pathOf("http://h.com:81/a/b?q=1") == "/a/b?q=1")
    assert(Url.pathOf("http://h.com") == "/")
    assert(Url.hostOf("nope") == "")
  }

  test("fixture contract: both messy spellings reduce to the oracle's " +
    "canonical formula, for every residue class") {
    (0L until 60L).foreach { id =>
      val port = if (id % 3 == 1) ":8080" else ""
      val scheme = if (id % 2 == 1) "https" else "http"
      val q = if (id % 4 == 0) s"?q=$id&x=A" else ""
      val want =
        s"$scheme://example${id % 20}.com$port/a/c${id % 5}/foo/page$id%2Fx$q"
      assert(Url.canonicalize(Multimodal.messyUrl1(id)) == want, s"m1 id=$id")
      assert(Url.canonicalize(Multimodal.messyUrl2(id)) == want, s"m2 id=$id")
    }
  }
}
