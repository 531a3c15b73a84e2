package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** SRT/WebVTT source ([[Subtitles]]): millisecond-exact timecode
  * round-trip in both comma and dot forms, VTT NOTE/STYLE/id/settings
  * handling, inline-tag stripping, hour-optional times, and totality
  * on damage. */
class SubtitlesSpec extends AnyFunSuite {

  private val cues = Vector(
    Subtitles.Cue(0L, 1500L, "first cue"),
    Subtitles.Cue(61234L, 65999L, "two lines here\nsecond line"),
    Subtitles.Cue(3661007L, 3700123L, "hour-range cue é 中文"))

  test("SRT round-trip: counters, comma timecodes, multi-line text") {
    val b = Subtitles.buildSrt(cues)
    val s = new String(b, UTF_8)
    assert(s.contains("00:01:01,234 --> 00:01:05,999"))
    assert(s.contains("01:01:01,007"))
    assert(Subtitles.parse(b) == cues)
  }

  test("VTT round-trip: magic, dot timecodes, NOTE blocks, cue ids " +
    "and settings skipped, italic markup stripped") {
    val b = Subtitles.buildVtt(cues, notes = true, italic = _ % 2 == 0)
    val s = new String(b, UTF_8)
    assert(s.startsWith("WEBVTT\n"))
    assert(s.contains("00:01:01.234 --> 00:01:05.999"))
    assert(s.contains("NOTE") && s.contains("cue-2"))
    assert(s.contains("position:10%"))
    assert(s.contains("<i>first cue</i>"))
    assert(Subtitles.parse(b) == cues) // tags stripped, text identical
  }

  test("hour-optional VTT times, lone '<' preserved, STYLE blocks " +
    "skipped") {
    val vtt = ("WEBVTT\n\nSTYLE\n::cue { color: red }\n\n" +
      "05:10.500 --> 05:12.000\na < b and x <3 y\n\n").getBytes(UTF_8)
    val got = Subtitles.parse(vtt)
    assert(got == Vector(
      Subtitles.Cue(310500L, 312000L, "a < b and x <3 y")))
  }

  test("total on damage: truncation is a cut, malformed time lines " +
    "skip their cue, garbage/empty/null yield nothing") {
    val good = Subtitles.buildSrt(cues)
    for (k <- 0 until good.length by math.max(1, good.length / 29)) {
      val got = Subtitles.parse(java.util.Arrays.copyOf(good, k))
      // every fully-recovered cue is exact; the cut can land mid-text,
      // so the LAST recovered cue may carry a prefix of its original
      // (real files legitimately omit the final blank line, so an
      // unterminated last cue must parse)
      assert(got.size <= cues.size)
      got.zip(cues).zipWithIndex.foreach { case ((g, c), i) =>
        if (i + 1 < got.size) assert(g == c, s"cut at $k cue $i")
        else {
          // a byte cut mid-codepoint decodes to U+FFFD — drop it
          // before the prefix check
          val t = g.text.stripSuffix("�")
          assert(g.startMs == c.startMs && g.endMs == c.endMs &&
            c.text.startsWith(t), s"cut at $k last cue")
        }
      }
    }
    val bad = ("1\n00:00:00,000 --> junk\nlost cue\n\n" +
      "2\n00:00:05,000 --> 00:00:06,000\nkept cue\n\n").getBytes(UTF_8)
    assert(Subtitles.parse(bad) ==
      Vector(Subtitles.Cue(5000L, 6000L, "kept cue")))
    assert(Subtitles.parse(null).isEmpty)
    assert(Subtitles.parse(Array.emptyByteArray).isEmpty)
    assert(Subtitles.parse("random prose, no cues".getBytes(UTF_8)).isEmpty)
  }
}
