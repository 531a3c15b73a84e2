package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** HTML → text extraction: single-scan strip semantics. */
class HtmlSpec extends AnyFunSuite {

  test("tags strip, block tags break lines, inline tags do not split " +
    "words, script/style vanish WITH contents, comments vanish") {
    val html = "<html><head><title>T</title>" +
      "<style>p { color: red }</style>" +
      "<script>if (a < b) { alert('<p>not text</p>'); }</script>" +
      "</head><body><!-- hidden --><p>para <b>one</b></p>" +
      "<p>w<i>or</i>d</p></body></html>"
    assert(Html.extractText(html) == "T\npara one\nword")
  }

  test("a <script> whose body contains another '<script>' still ends " +
    "at the first </script>") {
    val html = "<script>var s = \"<script>\";</script>after"
    assert(Html.extractText(html) == "after")
  }

  test("character references: named, decimal, hex; unknown and " +
    "unterminated stay literal") {
    assert(Html.extractText("a &amp; b &lt;c&gt; &quot;d&quot; e&nbsp;f") ==
      "a & b <c> \"d\" e f")
    assert(Html.extractText("&#65;&#x42;&#x63;") == "ABc")
    assert(Html.extractText("&copy; 2026 &bogus; x & y &amp") ==
      "&copy; 2026 &bogus; x & y &amp")
    // astral-plane codepoints decode to surrogate PAIRS, not a
    // truncated 16-bit char; NUL and out-of-range stay literal
    assert(Html.extractText("&#128512;&#x1F600;") == "😀😀")
    assert(Html.extractText("&#0; &#1114112;") == "&#0; &#1114112;")
  }

  test("a bare '<' in prose is text, not a tag that swallows content " +
    "(the HTML5 tokenizer rule: markup opens only before letter//!?)") {
    assert(Html.extractText("He said 5 < 6 > 4 holds") ==
      "He said 5 < 6 > 4 holds")
    assert(Html.extractText("x < y with no later gt") ==
      "x < y with no later gt")
    assert(Html.extractText("a <b>bold</b> < 3") == "a bold < 3")
    assert(Html.extractText("tail <") == "tail <")
  }

  test("a '>' inside a quoted attribute value does not end the tag " +
    "(no leaked attribute remainder in the extracted text)") {
    assert(Html.extractText("""x <img alt="a > b"> y""") == "x y")
    assert(Html.extractText("""x <img alt='a > b'> y""") == "x y")
    // mixed quotes: the other quote char inside a quoted value is data
    assert(Html.extractText("""x <a title="it's > fine">link</a> y""") ==
      "x link y")
    // unterminated quote degrades like an unterminated tag (to EOF)
    assert(Html.extractText("""x <img alt="oops > y""") == "x")
  }

  test("whitespace normalizes: runs collapse, lines trim, blank lines " +
    "drop; unterminated tags/comments never throw") {
    assert(Html.extractText("<div>  a   b  </div>\n\n\n<div> c </div>") ==
      "a b\nc")
    assert(Html.extractText("text <unclosed") == "text")
    assert(Html.extractText("<!-- never closed ...") == "")
    assert(Html.extractText("<style>never closed") == "")
    assert(Html.extractText(null) == "")
    // totality fuzz on pseudo-random soups containing < & ; -
    var seed = 42L
    val alphabet = "<>&;#-ab /!\n\"'".toCharArray
    (1 to 300).foreach { n =>
      val sb = new StringBuilder
      (0 until n % 97).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append(alphabet(((seed >>> 33) % alphabet.length).toInt))
      }
      Html.extractText(sb.toString) // must not throw
    }
  }

  test("buildPage round-trips: title, nav items, escaped body (markup " +
    "chars survive), footer — in document order") {
    val body = "x < y && z > \"w\"  double  spaced"
    val got = Html.extractText(Html.buildPage("My Title", Seq(body),
      Seq("Home", "About")))
    assert(got == "My Title\nHome\nAbout\n" +
      "x < y && z > \"w\" double spaced\n&copy; example inc")
    // empty body line drops cleanly
    val got2 = Html.extractText(Html.buildPage("T", Seq("   "), Seq("N")))
    assert(got2 == "T\nN\n&copy; example inc")
  }
}
