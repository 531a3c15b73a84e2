package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** ID3v2.3 ([[Id3]]): text-frame round-trip in both declared
  * encodings, v2.3 plain frame sizes under a syncsafe header size,
  * totality on damage, and interop with [[Mp3]]'s tag-skip. */
class Id3Spec extends AnyFunSuite {

  test("round-trips TIT2/TPE1/TALB/TYER in ISO-8859-1") {
    val t = Id3.parse(Id3.buildTag("My Title", "Artist X", "Album Y",
      1987, utf16Title = false)).get
    assert(t.title == "My Title" && t.artist == "Artist X" &&
      t.album == "Album Y" && t.year == 1987)
    assert(t.nFrames == 4 && t.nUtf16 == 0)
  }

  test("UTF-16 title with BOM decodes; frame sizes stay plain 32-bit " +
    "(not syncsafe) so a >127-byte frame still walks") {
    val long = "T" * 200 // UTF-16 payload 403 bytes: bit 7 set in size
    val tag = Id3.buildTag(long, "a", "b", 2001, utf16Title = true)
    val t = Id3.parse(tag).get
    assert(t.title == long && t.nUtf16 == 1 && t.nFrames == 4)
    assert(t.tagBytes == tag.length)
  }

  test("header size IS syncsafe: a tag over 16 KiB round-trips") {
    val big = "x" * 20000
    val tag = Id3.buildTag(big, "a", "b", 1999, utf16Title = false)
    val t = Id3.parse(tag).get
    assert(t.title == big && t.tagBytes == tag.length)
  }

  test("total on damage: truncation keeps earlier frames, bad frame " +
    "id stops the walk, garbage returns None") {
    assert(Id3.parse(null).isEmpty)
    assert(Id3.parse("MP3junk".getBytes).isEmpty)
    val tag = Id3.buildTag("Ti", "Ar", "Al", 1990, utf16Title = false)
    // cut mid-TALB: TIT2 + TPE1 survive
    val cut = java.util.Arrays.copyOf(tag, tag.length - 20)
    val t = Id3.parse(cut).get
    assert(t.title == "Ti" && t.artist == "Ar" && t.album == "")
    val bad = tag.clone()
    bad(10) = '!' // corrupt the first frame id
    assert(Id3.parse(bad).get.nFrames == 0)
  }

  test("Mp3.parseMeta still finds audio frames past a real v2.3 tag") {
    val media = Id3.buildTag("T", "A", "B", 2010, utf16Title = true) ++
      Mp3.buildFrames(mpeg1 = true, brIdx = 5, srIdx = 0, nFrames = 7)
    val m = Mp3.parseMeta(media).get
    assert(m.nFrames == 7 && m.version == "1")
    assert(Id3.parse(media).get.title == "T")
  }
}
