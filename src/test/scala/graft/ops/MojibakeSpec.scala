package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Mojibake repair ([[Mojibake]]): single and double misdecode
  * inversion, the C1-control-byte case, clean-text stability, and
  * the false-positive surface documented by design. */
class MojibakeSpec extends AnyFunSuite {

  test("inverts a single Latin-1 misdecode") {
    assert(Mojibake.fix("caf\u00c3\u00a9") == ("caf\u00e9", 1))
    // em dash: misdecode spells C1 control chars U+0080/U+0094
    assert(Mojibake.fix("a\u00e2\u0080\u0094b") == ("a\u2014b", 1))
  }

  test("double-encoded text needs exactly two passes") {
    // moji(moji(\u00e9)): bytes C3 83 C2 A9
    assert(Mojibake.fix("\u00c3\u0083\u00c2\u00a9") == ("\u00e9", 2))
  }

  test("clean text is untouched: ASCII, real accents, beyond-Latin-1") {
    assert(Mojibake.fix("plain ascii") == ("plain ascii", 0))
    assert(Mojibake.fix("caf\u00e9") == ("caf\u00e9", 0))
    assert(Mojibake.fix("em \u2014 dash") == ("em \u2014 dash", 0))
    assert(Mojibake.fix("") == ("", 0))
    assert(Mojibake.fix(null)._2 == 0)
  }

  test("each pass strictly shortens, and the bound caps runaway input") {
    val (once, n1) = Mojibake.fix("x \u00c3\u00a9 y", maxPasses = 1)
    assert(once == "x \u00e9 y" && n1 == 1)
    // triple-encoded: bound 3 unwinds all the way to the accent
    val triple = new String("\u00c3\u0083\u00c2\u00a9"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Mojibake.fix(triple) == ("\u00e9", 3))
  }

  test("the documented false-positive surface: Latin-1 text that " +
    "legitimately spells valid UTF-8 is repaired (by design)") {
    val (fixed, n) = Mojibake.fix("literal \u00c3\u00a9 in prose")
    assert(n == 1 && fixed == "literal \u00e9 in prose")
  }
}
