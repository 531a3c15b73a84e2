package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Magic-byte sniffing ([[Sniff]]): every format routed to its label
  * through the repo's own encoders, the discrimination edges (PCM vs
  * ADPCM WAV, text vs binary, gzip vs zip), and garbage totality. */
class SniffSpec extends AnyFunSuite {

  private val gray = Array.tabulate[Byte](8 * 8)(i => (i * 4 - 128).toByte)
  private val rgb = Array.tabulate[Byte](8 * 8 * 3)(i => (i - 96).toByte)
  private val pcm = Array.tabulate(130)(t => (t * 211) % 8192 - 4096)

  test("each real encoder's output routes to its own label") {
    assert(Sniff.detect(Codecs.encodeJpeg(8, 8, rgb)) == "jpeg")
    assert(Sniff.detect(Codecs.encodeImage(8, 8, rgb, "png")) == "png")
    assert(Sniff.detect(Gif.encodeAnimated(8, 8, Seq(gray))) == "gif")
    assert(Sniff.detect(Codecs.encodeBmp(8, 8, rgb)) == "bmp")
    assert(Sniff.detect(Codecs.encodeWavMono(8000, pcm.map(_.toShort))) == "wav")
    assert(Sniff.detect(Adpcm.encode(8000, pcm)) == "adpcm-wav")
    assert(Sniff.detect(Flac.encode(8000, pcm)) == "flac")
    assert(Sniff.detect(Mp3.buildFrames(mpeg1 = true, brIdx = 5,
      srIdx = 0, nFrames = 1)) == "mp3")
    assert(Sniff.detect(Mp3.buildFrames(mpeg1 = true, brIdx = 5,
      srIdx = 0, nFrames = 1, withId3 = true)) == "mp3")
    assert(Sniff.detect(Mp4.buildMinimal(1000L, 2000L, 16, 16, "avc1",
      "vide", 32)) == "mp4")
    assert(Sniff.detect(Avi.buildAvi(8, 8, 40000L,
      Seq(Avi.encodeDib24(8, 8, gray)), 0)) == "avi")
    assert(Sniff.detect(Archive.buildZip(Seq(("a", "x".getBytes(UTF_8))),
      _ => true)) == "zip")
    val gz = { val b = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(b)
      g.write("hello".getBytes(UTF_8)); g.close(); b.toByteArray }
    assert(Sniff.detect(gz) == "gzip")
    assert(Sniff.detect(Warc.gunzipAll(Archive.buildTarGz(
      Seq(("a", "x".getBytes(UTF_8))), _ => 0L))) == "tar")
    assert(Sniff.detect("plain text, naturally".getBytes(UTF_8)) == "text")
    assert(Sniff.detect("unicode: ÿ — ✓".getBytes(UTF_8)) == "text")
    assert(Sniff.detect(Xml.buildDump(Seq(Xml.Page(1L, 0, "T", 10L,
      "2024-01-01T00:00:00Z", "u", "b", redirect = false,
      ok = true)))) == "xml")
    // PDF routes on %PDF- BEFORE the UTF-8 text fallback: a raw
    // (uncompressed-stream) PDF is often valid UTF-8 end to end
    assert(Sniff.detect(Pdf.build(Seq(Pdf.PageSpec(Vector("ascii body"),
      flate = false, indirectLength = false)))) == "pdf")
    assert(Sniff.detect(Pdf.build(Seq(Pdf.PageSpec(Vector("x"),
      flate = true, indirectLength = true)))) == "pdf")
    assert(Sniff.detect(Mbox.build(Seq(Mbox.MsgSpec("a@b", Vector("l@x"),
      "s", encodeSubject = false, "d", "<m@x>", 0, "body",
      None)))) == "mbox")
    // prose that merely starts with "From " stays text: the mbox
    // route needs the paired From: header
    assert(Sniff.detect("From here to there, a story.\nChapter 1."
      .getBytes(UTF_8)) == "text")
    assert(Sniff.detect(Subtitles.buildVtt(Seq(Subtitles.Cue(0L, 900L,
      "c")), notes = false, _ => false)) == "vtt")
    assert(Sniff.detect(Subtitles.buildSrt(Seq(Subtitles.Cue(0L, 900L,
      "c")))) == "srt")
    // a numbered list is NOT SubRip: the counter line must be
    // followed by a comma timecode
    assert(Sniff.detect("1\nfirst item\n2\nsecond item\n"
      .getBytes(UTF_8)) == "text")
    assert(Sniff.detect(Epub.build("B", Seq(Seq("x")), Seq(0))) == "epub")
    // an ordinary zip (even one containing a file CALLED mimetype
    // later) stays zip: the OCF check is offset-exact
    assert(Sniff.detect(Archive.buildZip(Seq(
      ("a.txt", "x".getBytes(UTF_8)),
      ("mimetype", "application/epub+zip".getBytes(UTF_8))),
      _ => false)) == "zip")
  }

  test("discrimination edges: NUL or invalid UTF-8 is binary, control " +
    "soup is binary, empty is empty") {
    assert(Sniff.detect("has a \u0000 nul".getBytes(UTF_8)) == "binary")
    assert(Sniff.detect(Array[Byte](0x41, 0x42, 0xc0.toByte, 0x28)) == "binary")
    assert(Sniff.detect(Array.tabulate[Byte](24)(i => (i % 7).toByte)) == "binary")
    assert(Sniff.detect(Array.emptyByteArray) == "empty")
    assert(Sniff.detect(null) == "empty")
    // overlong encoding and surrogate range rejected
    assert(!Sniff.validUtf8(Array[Byte](0xe0.toByte, 0x80.toByte, 0x80.toByte)))
    assert(!Sniff.validUtf8(Array[Byte](0xed.toByte, 0xa0.toByte, 0x80.toByte)))
  }

  test("a WARC record file sniffs as warc, its .gz form as gzip") {
    val plain = Warc.buildFile(Seq(("https://x/1", "1", "body")), gzip = false)
    val gzipped = Warc.buildFile(Seq(("https://x/1", "1", "body")))
    assert(Sniff.detect(plain) == "warc")
    assert(Sniff.detect(gzipped) == "gzip")
  }
}
