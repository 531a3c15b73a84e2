package graft.ops

/** Magic-byte media-format detection — the FIRST pass a crawled-blob
  * pipeline runs on every opaque byte column (Content-Type headers
  * lie; the bytes don't). Pure prefix/structure checks in a pinned
  * priority order, no decode: container formats are recognized by
  * their signatures (ISO BMFF `ftyp`, RIFF fourcc discrimination,
  * PK/gzip/ustar framing, ID3-or-sync for MP3), text by strict UTF-8
  * validation, everything else `binary`. Total on garbage and on
  * empty/null input (`empty`).
  *
  * The label set matches the repo's real parsers — every sniffed
  * format has a decoder/walker behind it ([[Codecs]], [[Mp3]],
  * [[Mp4]], [[Flac]], [[Gif]], [[Avi]], [[Archive]], [[Warc]]), so
  * sniff → route → parse is an end-to-end story, not a lookup table.
  */
object Sniff {

  private def has(b: Array[Byte], at: Int, sig: Int*): Boolean =
    at + sig.length <= b.length &&
      sig.indices.forall(i => (b(at + i) & 0xff) == sig(i))

  private def ascii(b: Array[Byte], at: Int, s: String): Boolean =
    at + s.length <= b.length &&
      s.indices.forall(i => (b(at + i) & 0xff) == s.charAt(i).toInt)

  /** Detect the format of `b`; one of jpeg/png/gif/bmp/wav/avi/
    * adpcm-wav/flac/mp3/mp4/zip/epub/gzip/tar/warc/xml/pdf/vtt/srt/
    * mbox/text/binary/empty. */
  def detect(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "empty"
    if (has(b, 0, 0xff, 0xd8, 0xff)) return "jpeg"
    if (has(b, 0, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)) return "png"
    if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) return "gif"
    if (ascii(b, 0, "BM")) return "bmp"
    if (ascii(b, 0, "RIFF") && b.length >= 12) {
      if (ascii(b, 8, "WAVE")) {
        // fmt tag discriminates PCM WAV from IMA-ADPCM WAV: walk to
        // the fmt chunk and read the 16-bit codec id
        var o = 12L // Long walk: a crafted chunk size near Int.MaxValue
        //            must not wrap the cursor negative (totality contract)
        while (o + 8 <= b.length) {
          val oi = o.toInt
          val sz = (b(oi + 4) & 0xff) | ((b(oi + 5) & 0xff) << 8) |
            ((b(oi + 6) & 0xff) << 16) | ((b(oi + 7) & 0xff) << 24)
          if (ascii(b, oi, "fmt ") && o + 10 <= b.length) {
            val codec = (b(oi + 8) & 0xff) | ((b(oi + 9) & 0xff) << 8)
            return if (codec == 0x11) "adpcm-wav" else "wav"
          }
          if (sz < 0) return "wav"
          o += 8L + sz + (sz & 1)
        }
        return "wav"
      }
      if (ascii(b, 8, "AVI ")) return "avi"
    }
    if (ascii(b, 0, "fLaC")) return "flac"
    if (b.length >= 12 && ascii(b, 4, "ftyp")) return "mp4"
    if (ascii(b, 0, "ID3")) return "mp3"
    // bare MPEG audio sync: 11 set bits + a valid layer field
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0 &&
      (b(1) & 0x06) != 0) return "mp3"
    if (has(b, 0, 0x50, 0x4b, 0x03, 0x04) ||
      has(b, 0, 0x50, 0x4b, 0x05, 0x06)) {
      // OCF convention: an EPUB's first member is a STORED "mimetype"
      // whose name sits at offset 30 and content right after — the
      // fixed-offset check real sniffers use
      if (ascii(b, 30, "mimetype") &&
        ascii(b, 38, "application/epub+zip")) return "epub"
      return "zip"
    }
    if (has(b, 0, 0x1f, 0x8b)) return "gzip"
    if (ascii(b, 257, "ustar")) return "tar"
    if (ascii(b, 0, "WARC/")) return "warc"
    if (ascii(b, 0, "<?xml")) return "xml"
    if (ascii(b, 0, "%PDF-")) return "pdf"
    if (ascii(b, 0, "WEBVTT")) return "vtt"
    // SubRip has no magic: a bare counter line followed by a comma
    // timecode line is its structural signature
    if (b.length >= 32 && b(0) >= '0' && b(0) <= '9') {
      var i = 0
      while (i < 16 && b(i) >= '0' && b(i) <= '9') i += 1
      if (i < 16 && b(i) == '\n' &&
        ascii(b, i + 3, ":") && ascii(b, i + 6, ":") &&
        ascii(b, i + 9, ",") && ascii(b, i + 13, " --> ")) return "srt"
    }
    // mboxrd: the RFC 4155 envelope line plus an RFC 5322 From:
    // header nearby — the structural pair keeps ordinary prose that
    // merely starts with "From " out of the mailbox route
    if (ascii(b, 0, "From ")) {
      val win = math.min(b.length - 6, 1024)
      var i = 0
      while (i < win) {
        if (b(i) == '\n' && ascii(b, i + 1, "From: ")) return "mbox"
        i += 1
      }
    }
    if (validUtf8(b)) "text" else "binary"
  }

  /** Structural UTF-8 validity alone (RFC 3629: no overlongs, no
    * surrogates, ≤ U+10FFFF) — the building block [[Mojibake]] needs,
    * where control bytes are fine as long as the sequences are. */
  def structuralUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false
      else if (c < 0xe0) {
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) {
        if (i + 2 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80) return false
        val cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        if (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += 3
      } else if (c < 0xf5) {
        if (i + 3 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        if (cp < 0x10000 || cp > 0x10ffff) return false
        i += 4
      } else return false
    }
    true
  }

  /** Strict UTF-8 validation (RFC 3629: no overlongs, no surrogates,
    * ≤ U+10FFFF) with a no-NUL, mostly-printable requirement — the
    * text-vs-binary discriminator curation actually wants (a blob of
    * valid-UTF-8-by-accident control bytes is not text). */
  def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    var printable = 0L
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c == 0) return false
      else if (c < 0x80) {
        if (c >= 0x20 || c == '\n' || c == '\r' || c == '\t') printable += 1
        i += 1
      } else if (c < 0xc2) return false // continuation/overlong lead
      else if (c < 0xe0) {
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        printable += 1; i += 2
      } else if (c < 0xf0) {
        if (i + 2 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80) return false
        val cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        if (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)) return false
        printable += 1; i += 3
      } else if (c < 0xf5) {
        if (i + 3 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        if (cp < 0x10000 || cp > 0x10ffff) return false
        printable += 1; i += 4
      } else return false
    }
    // ≥ 90% printable among decoded units
    n == 0 || printable * 10L >= charCount(b) * 9L
  }

  /** Decoded code-point count (assumes the validity walk passed). */
  private def charCount(b: Array[Byte]): Long = {
    var i = 0; var k = 0L
    while (i < b.length) {
      val c = b(i) & 0xff
      i += (if (c < 0x80) 1 else if (c < 0xe0) 2 else if (c < 0xf0) 3 else 4)
      k += 1
    }
    k
  }
}
