package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property laws for the round-7 media/ingestion parsers — driver-
  * side kernels, no Spark, so these run wide and fast. */
class MediaPropSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("Avc: buildSps -> parseSps is the identity on (w, h, profile, " +
    "level) for ANY even dimensions and profile class") {
    val gen = for {
      w <- Gen.choose(1, 2048).map(_ * 2)
      h <- Gen.choose(1, 1088).map(_ * 2)
      profile <- Gen.oneOf(66, 77, 88, 100, 110, 122, 244)
      level <- Gen.choose(10, 62)
    } yield (w, h, profile, level)
    check(Prop.forAll(gen) { case (w, h, profile, level) =>
      Avc.parseSps(Avc.buildSps(w, h, profile, level))
        .contains(Avc.SpsInfo(profile, level, w, h, frameMbsOnly = true))
    })
  }

  test("Flac: buildStreamInfo -> parseMeta is the identity over the " +
    "full packed-field ranges") {
    val gen = for {
      rate <- Gen.choose(1, (1 << 20) - 1)
      chan <- Gen.choose(1, 8)
      bps <- Gen.choose(4, 32)
      samples <- Gen.choose(0L, (1L << 36) - 1)
    } yield (rate, chan, bps, samples)
    check(Prop.forAll(gen) { case (rate, chan, bps, samples) =>
      Flac.parseMeta(Flac.buildStreamInfo(rate, chan, bps, samples))
        .contains(Flac.FlacInfo(rate, chan, bps, samples, 4096, 4096))
    })
  }

  test("Mp3: buildFrames -> parseMeta recovers version/rate/bitrate/" +
    "channels and the EXACT frame count for any table point") {
    val gen = for {
      mpeg1 <- Gen.oneOf(true, false)
      br <- Gen.choose(1, 14)
      sr <- Gen.choose(0, 2)
      nf <- Gen.choose(1, 40)
      mono <- Gen.oneOf(true, false)
    } yield (mpeg1, br, sr, nf, mono)
    check(Prop.forAll(gen) { case (mpeg1, br, sr, nf, mono) =>
      val m = Mp3.parseMeta(Mp3.buildFrames(mpeg1, br, sr, nf,
        mono = mono)).get
      m.nFrames == nf.toLong && !m.isVbr &&
        m.version == (if (mpeg1) "1" else "2") &&
        m.channels == (if (mono) 1 else 2)
    })
  }

  test("Warc: buildFile -> parseAll round-trips ANY body text " +
    "(unicode, CRLF runs, empty) with exact byte lengths, gzip or not") {
    val gen = for {
      docs <- Gen.nonEmptyListOf(Gen.zip(
        Gen.alphaNumStr.map("https://e.x/" + _),
        Gen.oneOf(Gen.alphaNumStr,
          Gen.listOf(Gen.oneOf('a', ' ', '\r', '\n', 'é', '中', '&', '<'))
            .map(_.mkString))))
      gz <- Gen.oneOf(true, false)
    } yield (docs, gz)
    check(Prop.forAll(gen) { case (docs, gz) =>
      val in = docs.zipWithIndex.map { case ((u, t), i) => (u, s"id$i", t) }
      val recs = Warc.parseAll(Warc.buildFile(in, gzip = gz))
      val resp = recs.filter(_.warcType == "response")
      recs.length == in.length + 1 &&
        resp.map(_.bodyText) == in.map(_._3) &&
        resp.map(_.targetUri) == in.map(_._1) &&
        resp.zip(in).forall { case (r, (_, _, t)) =>
          r.body.length == t.getBytes("UTF-8").length }
    }, n = 100)
  }

  test("Html: extractText(buildPage) never contains markup, always " +
    "starts with the title line, and is stable under double wrap") {
    // body alphabet excludes '<'/'>' so any markup-ish string in the
    // OUTPUT could only come from a broken strip (the escape/decode
    // round-trip of markup chars is covered by HtmlSpec directly)
    val line = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
      ' ', '&', ';', '#', '"', '\''))).map(_.mkString)
    val gen = Gen.zip(Gen.alphaNumStr, line, Gen.listOf(Gen.alphaNumStr))
    check(Prop.forAll(gen) { case (title, body, nav) =>
      val got = Html.extractText(Html.buildPage(title, Seq(body), nav))
      val lines = got.split('\n')
      !got.contains("<") && !got.contains(">") &&
        !got.contains("tracker") && !got.contains("boilerplate chrome") &&
        (title.trim.isEmpty || lines.head == title.trim)
    }, n = 150)
  }
}
