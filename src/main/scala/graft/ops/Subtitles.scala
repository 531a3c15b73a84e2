package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

/** SRT + WebVTT subtitle source — the video-text alignment container
  * a multimodal pipeline ingests next to the frames (captioned-clip
  * corpora ship one of these per video). Builder/parser pair on the
  * [[Archive]]/[[Pdf]]/[[Mbox]] discipline: the writer emits real
  * SubRip (1-based numeric counters, `HH:MM:SS,mmm --> HH:MM:SS,mmm`
  * comma timecodes, blank-line cue separation) and real WebVTT
  * (`WEBVTT` magic, DOT timecodes, optional cue identifiers, cue
  * SETTINGS after the time line, NOTE comment blocks, inline
  * `<i>`/`<b>` markup); the parser extracts plain cue text
  * (tags stripped — the training-data contract), millisecond-exact
  * times, and is total on damage (a malformed cue is skipped, a
  * truncated file yields the cues before the cut, garbage yields
  * none).
  *
  * Scale shape: one blob parses partition-locally to its cue rows;
  * bytes never shuffle ([[Multimodal.subtitleCuesColumn]]). */
object Subtitles {

  final case class Cue(startMs: Long, endMs: Long, text: String)

  private def pad(n: Long, w: Int): String = {
    val s = n.toString
    "0" * math.max(0, w - s.length) + s
  }

  private def ts(ms: Long, sep: Char): String =
    pad(ms / 3600000, 2) + ":" + pad(ms / 60000 % 60, 2) + ":" +
      pad(ms / 1000 % 60, 2) + sep + pad(ms % 1000, 3)

  // ------------------------------------------------------------ write

  /** SubRip: `idx\nstart --> end\ntext...\n\n` per cue. */
  def buildSrt(cues: Seq[Cue]): Array[Byte] = {
    val sb = new StringBuilder(cues.length * 64)
    cues.zipWithIndex.foreach { case (c, i) =>
      sb.append(i + 1).append('\n')
      sb.append(ts(c.startMs, ',')).append(" --> ")
        .append(ts(c.endMs, ',')).append('\n')
      sb.append(c.text).append("\n\n")
    }
    sb.toString.getBytes(UTF_8)
  }

  /** WebVTT: header, optional NOTE blocks between cues, cue ids,
    * position/line SETTINGS on the time line, and inline markup —
    * `italic` wraps the whole cue text in `<i>…</i>` (the parser
    * must strip it). */
  def buildVtt(cues: Seq[Cue], notes: Boolean,
               italic: Int => Boolean): Array[Byte] = {
    val sb = new StringBuilder(cues.length * 72 + 16)
    sb.append("WEBVTT\n\n")
    if (notes) sb.append("NOTE\nbuilt by the fixture writer\n\n")
    cues.zipWithIndex.foreach { case (c, i) =>
      if (notes && i == 1) sb.append("NOTE mid-file comment\n\n")
      sb.append("cue-").append(i + 1).append('\n')
      sb.append(ts(c.startMs, '.')).append(" --> ")
        .append(ts(c.endMs, '.'))
      if (i % 2 == 0) sb.append(" position:10%,line-left align:left")
      sb.append('\n')
      val t = if (italic(i)) "<i>" + c.text + "</i>" else c.text
      sb.append(t).append("\n\n")
    }
    sb.toString.getBytes(UTF_8)
  }

  // ------------------------------------------------------------ parse

  /** `HH:MM:SS,mmm` / `HH:MM:SS.mmm` / VTT's hour-optional
    * `MM:SS.mmm`; -1 when malformed. */
  private[ops] def parseTs(s: String): Long = {
    val parts = s.trim.split("[:]")
    if (parts.length < 2 || parts.length > 3) return -1L
    val secMs = parts.last.split("[.,]")
    if (secMs.length != 2) return -1L
    // both formats mandate exactly 3 millisecond digits and 2-digit
    // seconds — rejecting shorter fields keeps a truncated timestamp
    // from silently parsing as a different time
    if (secMs(1).length != 3 || secMs(0).length != 2) return -1L
    try {
      val h = if (parts.length == 3) parts(0).toLong else 0L
      val m = parts(parts.length - 2).toLong
      val sec = secMs(0).toLong
      val ms = secMs(1).toLong
      if (m > 59 || sec > 59) -1L
      else ((h * 60 + m) * 60 + sec) * 1000 + ms
    } catch { case _: NumberFormatException => -1L }
  }

  private val Tag = "</?[A-Za-z][^>]*>".r

  private[ops] def stripTags(s: String): String = Tag.replaceAllIn(s, "")

  private def parseCues(lines: Array[String], vtt: Boolean)
      : Vector[Cue] = {
    val out = Vector.newBuilder[Cue]
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.isEmpty || (vtt && (line.startsWith("NOTE") ||
        line.startsWith("STYLE") || line.startsWith("REGION")))) {
        // skip blank lines and VTT comment/style blocks wholesale
        if (line.nonEmpty) {
          i += 1
          while (i < lines.length && lines(i).nonEmpty) i += 1
        } else i += 1
      } else {
        // a cue: optional id/counter line(s), then the time line
        var j = i
        while (j < lines.length && lines(j).nonEmpty &&
          !lines(j).contains("-->")) j += 1
        if (j >= lines.length || lines(j).isEmpty) {
          // no time line in this block: malformed, skip the block
          i = j
          while (i < lines.length && lines(i).nonEmpty) i += 1
        } else {
          val tl = lines(j)
          val arrow = tl.indexOf("-->")
          val start = parseTs(tl.take(arrow))
          // cue settings follow the end time after whitespace
          val endField = tl.drop(arrow + 3).trim.takeWhile(c =>
            c != ' ' && c != '\t')
          val end = parseTs(endField)
          var k = j + 1
          val text = new StringBuilder
          while (k < lines.length && lines(k).nonEmpty) {
            if (text.nonEmpty) text.append('\n')
            text.append(stripTags(lines(k)))
            k += 1
          }
          if (start >= 0 && end >= 0)
            out += Cue(start, end, text.toString)
          i = k
        }
      }
    }
    out.result()
  }

  /** Total parse of either format: WebVTT when the magic leads,
    * SubRip otherwise. Returns cues in file order. */
  def parse(b: Array[Byte]): Vector[Cue] = {
    if (b == null || b.length == 0) return Vector.empty
    val text = new String(b, UTF_8)
    val vtt = text.startsWith("WEBVTT")
    val lines = text.split("\n", -1).map(_.stripSuffix("\r"))
    val body = if (vtt) lines.drop(1) else lines
    try parseCues(body, vtt)
    catch { case _: RuntimeException => Vector.empty }
  }
}
