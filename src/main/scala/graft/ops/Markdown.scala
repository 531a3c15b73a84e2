package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markdown → text extraction — the curation step for wiki/README/
  * forum corpora, complementing [[Html]] for crawl payloads: fenced
  * code blocks drop (code is not prose), inline code / emphasis /
  * links / images keep their readable text, structural markers
  * (ATX headings, blockquotes, list bullets, horizontal rules)
  * strip, and whitespace normalizes.
  *
  * Unlike [[Html]]'s hand-scanner, this is a pure REGEXP CHAIN over a
  * string column: every pattern uses only constructs with identical
  * semantics in Spark's Java regex and DuckDB's RE2 (leftmost-first
  * alternation, non-greedy repetition, inline (?s)/(?m) flags,
  * character classes; NO lookaround, NO backreference-in-pattern,
  * NO possibly-empty match — the places the engines could diverge),
  * so the extraction is cross-engine verifiable end to end.
  *
  * Scale shape: a codegen'd per-row map — no shuffle, no join, no
  * state; composes into any ingest pipeline with the text staying in
  * its partition. Known degrades (documented, deterministic): an
  * unterminated fence stays literal; nested blockquotes lose one
  * `>` level per document pass; underscore emphasis is left alone on
  * purpose (stripping `_` would corrupt snake_case identifiers).
  */
object Markdown {

  /** (pattern, Spark `$1` replacement, DuckDB `\1` replacement),
    * applied strictly in order — fences before inline code (a fence
    * body may contain backticks), images before links (a link match
    * would otherwise eat the image's trailing `)`), markers before
    * whitespace normalization. */
  private val Chain: Seq[(String, String, String)] = Seq(
    // line-terminator normalization FIRST: Java's (?m) ^/$ match
    // around \r, NEL (U+0085) and LS/PS (U+2028/9) while RE2's match
    // only \n, so every multiline rule below would diverge on CRLF
    // or unicode-linebreak input unless the text is \n-only by the
    // time they run. (The class chars are SCALA-level \u escapes —
    // the source file stays plain text and both engines receive the
    // literal characters; a regex-level \uXXXX escape would be
    // Java-only, RE2 spells it \x{XXXX}.)
    ("\\r\\n|[\\r\u0085\u2028\u2029]", "\n", "\n"),
    ("(?s)```.*?```", " ", " "), // fenced code dropped with contents
    ("`([^`\\n]*)`", "$1", "\\1"), // inline code keeps its text
    ("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1", "\\1"), // image -> alt text
    ("\\[([^\\]]*)\\]\\([^)]*\\)", "$1", "\\1"), // link -> anchor text
    ("(?m)^#{1,6}[ \\t]+", "", ""), // ATX heading marker
    ("(?m)^[ \\t]*>[ \\t]?", "", ""), // blockquote marker
    ("(?m)^[ \\t]*(-{3,}|\\*{3,}|_{3,})[ \\t]*$", "", ""), // rule line
    ("(?m)^[ \\t]*[-*+][ \\t]+", "", ""), // unordered list bullet
    ("(?m)^[ \\t]*[0-9]+\\.[ \\t]+", "", ""), // ordered list marker
    ("\\*{1,3}([^*\\n]+)\\*{1,3}", "$1", "\\1"), // *emphasis* kept
    ("[ \\t]+", " ", " "), // space runs collapse
    (" ?\\n ?", "\n", "\n"), // spaces hugging a break
    ("\\n{3,}", "\n\n", "\n\n"), // blank-line runs collapse
    // string-anchored trim: \A/\z, NOT ^/$ — Java's unflagged $ is
    // \Z (before a final newline) while RE2's is \z; with the
    // terminator normalization above this keeps the whole chain
    // divergence-free. Regex form keeps the build clear of Spark's
    // deprecated two-arg trim.
    ("\\A[ \\n\\t]+|[ \\n\\t]+\\z", "", ""))

  /** Splice a pattern/replacement into a single-quoted SQL literal.
    * All current chain entries are quote-free, but a future edit
    * containing `'` would otherwise silently emit broken oracle SQL —
    * escape per the SQL rule (`'` → `''`). */
  private def sq(s: String): String = s.replace("'", "''")

  /** Extracted prose. Total on arbitrary input — a pure function of
    * the string, never throws. */
  def extractText(md: Column): Column =
    Chain.foldLeft(md) { case (c, (pat, rep, _)) =>
      regexp_replace(c, pat, rep)
    }

  /** DuckDB mirror of [[extractText]] — same chain, same order; RE2
    * takes the inline flags in the pattern and `g` as the flag
    * argument. */
  def ExtractTextSql(col: String): String =
    Chain.foldLeft(col) { case (c, (pat, _, rep)) =>
      s"regexp_replace($c, '${sq(pat)}', '${sq(rep)}', 'g')"
    }

  /** Structure profile of the RAW markdown — the quality signals a
    * markdown corpus filters on (prose-vs-markup balance). Counting
    * patterns are lookaround-free (RE2 has none): links are counted
    * inclusive of images and corrected by subtraction. */
  private val HeadingPat = "(?m)^#{1,6}[ \\t]"
  private val FencePat = "(?s)```.*?```"
  private val ImagePat = "!\\[[^\\]]*\\]\\("
  private val LinkAllPat = "\\[[^\\]]*\\]\\("
  private val ListItemPat = "(?m)^[ \\t]*[-*+][ \\t]"

  def structure(md: Column): Column = {
    val images = regexp_count(md, lit(ImagePat)).cast("long")
    struct(
      regexp_count(md, lit(HeadingPat)).cast("long").as("n_headings"),
      regexp_count(md, lit(FencePat)).cast("long").as("n_fences"),
      images.as("n_images"),
      (regexp_count(md, lit(LinkAllPat)).cast("long") - images)
        .as("n_links"),
      regexp_count(md, lit(ListItemPat)).cast("long").as("n_list_items"))
  }

  /** DuckDB mirrors of the [[structure]] fields over `col`. */
  def StructureSql(col: String): Map[String, String] = {
    def cnt(pat: String) = s"len(regexp_extract_all($col, '${sq(pat)}'))"
    Map(
      "n_headings" -> cnt(HeadingPat),
      "n_fences" -> cnt(FencePat),
      "n_images" -> cnt(ImagePat),
      "n_links" -> s"(${cnt(LinkAllPat)} - ${cnt(ImagePat)})",
      "n_list_items" -> cnt(ListItemPat))
  }
}
