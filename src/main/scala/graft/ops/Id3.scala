package graft.ops

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16, UTF_16LE}

/** Pure-JVM ID3v2.3 tag metadata (informal standard id3v2.3.0,
  * §3.1-3.3): header + text-frame walk with both declared text
  * encodings (0 = ISO-8859-1, 1 = UTF-16 with BOM) — the provenance
  * channel of crawled audio (title/artist/album/year are what an
  * audio-corpus curation pass stratifies and attributes by).
  * [[Mp3]] stops at SKIPPING the tag to find audio frames; this
  * parser reads it.
  *
  * The walk is total on garbage: a malformed frame header, an
  * overrunning size, or a bad encoding byte stops the walk and
  * keeps the frames recovered so far. Frame sizes are v2.3 plain
  * 32-bit big-endian (only the HEADER size field is syncsafe —
  * mixing the two is the classic ID3 parser bug; the spec makes
  * v2.4 frame sizes syncsafe, v2.3 not).
  *
  * Scale shape: per-row byte work behind partition-local batched
  * maps (see [[Multimodal.id3MetaColumn]]); bytes never shuffle. */
object Id3 {

  final case class Id3Info(title: String, artist: String, album: String,
                           year: Int, nFrames: Int, nUtf16: Int,
                           tagBytes: Int)

  /** Build an ID3v2.3.0 tag with TIT2/TPE1/TALB/TYER text frames.
    * `utf16Title` writes TIT2 as encoding 1 (UTF-16 LE with BOM) so
    * the parse path proves both encodings. */
  def buildTag(title: String, artist: String, album: String, year: Int,
               utf16Title: Boolean): Array[Byte] = {
    def frame(id: String, text: String, utf16: Boolean): Array[Byte] = {
      val payload =
        if (utf16) 1.toByte +: (Array[Byte](0xff.toByte, 0xfe.toByte) ++
          text.getBytes(UTF_16LE))
        else 0.toByte +: text.getBytes(ISO_8859_1)
      val out = new Array[Byte](10 + payload.length)
      id.getBytes(ISO_8859_1).copyToArray(out, 0)
      val n = payload.length
      out(4) = (n >>> 24).toByte; out(5) = (n >>> 16).toByte
      out(6) = (n >>> 8).toByte; out(7) = n.toByte
      // out(8), out(9): frame flags 0
      payload.copyToArray(out, 10)
      out
    }
    val frames = frame("TIT2", title, utf16Title) ++
      frame("TPE1", artist, utf16 = false) ++
      frame("TALB", album, utf16 = false) ++
      frame("TYER", year.toString, utf16 = false)
    val n = frames.length
    Array[Byte]('I', 'D', '3', 3, 0, 0,
      ((n >>> 21) & 0x7f).toByte, ((n >>> 14) & 0x7f).toByte,
      ((n >>> 7) & 0x7f).toByte, (n & 0x7f).toByte) ++ frames
  }

  /** Parse a leading ID3v2.3 tag (None when absent/malformed at the
    * header level; frame-level damage stops the walk, keeping the
    * frames before it). */
  def parse(b: Array[Byte]): Option[Id3Info] = {
    if (b == null || b.length < 10 ||
      b(0) != 'I' || b(1) != 'D' || b(2) != '3') return None
    if ((b(6) | b(7) | b(8) | b(9)) < 0) return None // non-syncsafe size
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val end = math.min(b.length, 10 + size)
    var o = 10
    var title = ""; var artist = ""; var album = ""; var year = 0
    var nFrames = 0; var nUtf16 = 0
    var going = true
    while (going && o + 10 <= end) {
      val id = new String(b, o, 4, ISO_8859_1)
      if (!id.forall(c => c.isUpper || c.isDigit)) going = false
      else {
        val n = ((b(o + 4) & 0xff) << 24) | ((b(o + 5) & 0xff) << 16) |
          ((b(o + 6) & 0xff) << 8) | (b(o + 7) & 0xff)
        if (n < 1 || o + 10 + n > end) going = false
        else {
          val enc = b(o + 10) & 0xff
          val text = enc match {
            case 0 => new String(b, o + 11, n - 1, ISO_8859_1)
            case 1 =>
              nUtf16 += 1
              new String(b, o + 11, n - 1, UTF_16) // BOM-driven
            case _ => going = false; ""
          }
          if (going) {
            nFrames += 1
            id match {
              case "TIT2" => title = text
              case "TPE1" => artist = text
              case "TALB" => album = text
              case "TYER" =>
                year = if (text.forall(_.isDigit) && text.nonEmpty &&
                  text.length <= 8) text.toInt else 0
              case _ => ()
            }
          }
          o += 10 + n
        }
      }
    }
    Some(Id3Info(title, artist, album, year, nFrames, nUtf16, 10 + size))
  }
}
