package graft.ops

/** Pure-JVM HTML → text extraction: the curation step between raw
  * crawl payloads ([[Warc]] response bodies) and a `documents`
  * table. A single left-to-right character scan (no regex, no DOM):
  * `<script>`/`<style>` elements are dropped WITH their contents,
  * comments and tags are removed, block-level tags break lines,
  * the standard named + numeric character references are decoded,
  * and whitespace is normalized (runs collapse to one space, ≥1
  * blank line collapses to one newline). Deterministic and total on
  * arbitrary input — unterminated tags/comments/entities degrade to
  * literal text or end-of-input, never throw.
  *
  * Scale shape: a per-row map over a string/binary column (used via
  * `Dataset.mapPartitions` or a plain Column pipeline caller), so it
  * composes with the WARC record flatten into a full ingest pipeline
  * where page bytes never leave their partition. */
object Html {

  private val BlockTags = Set("p", "div", "br", "li", "ul", "ol", "h1",
    "h2", "h3", "h4", "h5", "h6", "tr", "table", "section", "article",
    "header", "footer", "nav", "blockquote", "pre", "hr", "title")

  private val DropTags = Set("script", "style")

  private val NamedRefs = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** Lower-cased tag name starting at `i` (just past '<' and any
    * '/'), empty if not a name character. */
  private def tagName(s: String, i: Int): String = {
    var j = i
    while (j < s.length && (s(j).isLetterOrDigit)) j += 1
    s.substring(i, j).toLowerCase
  }

  /** Index of the '>' that closes the tag opened just before `from`,
    * honoring single/double-quoted attribute values — a '>' inside
    * `alt="a > b"` is attribute text, not the tag end (a bare
    * indexOf would cut the tag early and leak `b">` into the
    * extracted prose). An unterminated quote runs to end-of-input
    * (-1), matching the unterminated-tag degrade path. */
  private def tagEnd(s: String, from: Int): Int = {
    var j = from
    var quote: Char = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j
      j += 1
    }
    -1
  }

  /** Extract readable text. Tags break words only when block-level
    * (inline `<b>`, `<a>` do not split a word — matching how
    * browsers render). */
  def extractText(html: String): String = {
    if (html == null) return ""
    val out = new java.lang.StringBuilder(html.length / 2)
    var i = 0
    val n = html.length
    var dropUntil: String = null // inside <script>/<style>
    while (i < n) {
      val c = html.charAt(i)
      // HTML5 tokenizer rule: '<' opens markup only before a letter,
      // '/', '!' or '?' — a bare '<' in prose ("5 < 6") is TEXT, not
      // a tag whose content silently vanishes to the next '>'
      val opensMarkup = c == '<' && i + 1 < n && {
        val c1 = html.charAt(i + 1)
        c1.isLetter || c1 == '/' || c1 == '!' || c1 == '?'
      }
      if (opensMarkup) {
        if (i + 3 < n && html.charAt(i + 1) == '!' &&
          html.charAt(i + 2) == '-' && html.charAt(i + 3) == '-') {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val isClose = i + 1 < n && html.charAt(i + 1) == '/'
          val name = tagName(html, if (isClose) i + 2 else i + 1)
          val e = tagEnd(html, i + 1)
          if (dropUntil != null) {
            if (isClose && name == dropUntil) dropUntil = null
            i = if (e < 0) n else e + 1
          } else {
            if (!isClose && DropTags(name)) dropUntil = name
            if (BlockTags(name)) out.append('\n')
            i = if (e < 0) n else e + 1
          }
        }
      } else if (dropUntil != null) {
        i += 1
      } else if (c == '&') {
        // references are ≤ 10 chars — bound the ';' scan to that
        // window (an unbounded indexOf over '&'-dense input would be
        // quadratic in the document)
        var sc = -1
        var j = i + 1
        val jMax = math.min(n, i + 11)
        while (sc < 0 && j < jMax) {
          if (html.charAt(j) == ';') sc = j
          j += 1
        }
        if (sc > i) {
          val ref = html.substring(i + 1, sc)
          val decoded: Option[String] =
            if (ref.startsWith("#x") || ref.startsWith("#X"))
              scala.util.Try(Integer.parseInt(ref.drop(2), 16)).toOption
                .filter(cp => cp > 0 && cp <= 0x10ffff)
                .map(cp => new String(Character.toChars(cp)))
            else if (ref.startsWith("#"))
              scala.util.Try(ref.drop(1).toInt).toOption
                .filter(cp => cp > 0 && cp <= 0x10ffff)
                .map(cp => new String(Character.toChars(cp)))
            else NamedRefs.get(ref).map(_.toString)
          decoded match {
            case Some(s) => out.append(s); i = sc + 1
            case None => out.append(c); i += 1 // literal '&'
          }
        } else { out.append(c); i += 1 }
      } else {
        out.append(c)
        i += 1
      }
    }
    normalizeWhitespace(out.toString)
  }

  /** Spaces/tabs collapse to one space; line boundaries survive as
    * single newlines; leading/trailing space per line trimmed; blank
    * lines dropped. Pattern precompiled — this runs per LINE of every
    * crawled page on the ingest hot path. */
  private val Ws = java.util.regex.Pattern.compile("[ \\t\\r\\u00a0]+")
  private def normalizeWhitespace(s: String): String =
    s.split('\n').iterator
      .map(l => Ws.matcher(l).replaceAll(" ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")

  // ------------------------------------------------------------------
  // Minimal writer — test/oracle fixture synthesis.
  // ------------------------------------------------------------------

  /** Escape text for embedding in HTML (the inverse of the decode
    * path, so round-trips are exact even for markup-looking text). */
  def escape(text: String): String =
    text.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** A template page: title, nav boilerplate, one paragraph per body
    * line, a script and a comment that must vanish. */
  def buildPage(title: String, bodyLines: Seq[String],
                navItems: Seq[String]): String = {
    val nav = navItems.map(x => s"<li><a href='#'>${escape(x)}</a></li>")
      .mkString
    val paras = bodyLines.map(l => s"  <p>${escape(l)}</p>\n").mkString
    s"""<!DOCTYPE html><html><head><title>${escape(title)}</title>
       |<style>body { color: #000; }</style>
       |<script>var tracker = "evil&nasty<script>";</script>
       |</head><body>
       |<!-- boilerplate chrome -->
       |<nav><ul>$nav</ul></nav>
       |<div class="main">
       |$paras</div>
       |<footer>&copy; example&nbsp;inc</footer>
       |</body></html>""".stripMargin
  }
}
