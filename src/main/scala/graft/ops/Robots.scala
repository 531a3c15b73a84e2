package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{BooleanType, DoubleType, StructType}

/** robots.txt (RFC 9309 Robots Exclusion Protocol) parsing and
  * matching — the crawl-compliance stage upstream of every web
  * corpus: a pipeline that ingests pages its robots.txt disallowed
  * ships data it was asked not to take. Implements the RFC's group
  * model (user-agent lines open a group; a crawler obeys the group
  * naming it specifically, else the `*` group), longest-match rule
  * precedence with Allow winning ties, `*` wildcards and the `$`
  * end anchor, plus the de-facto `Crawl-delay` extension.
  *
  * The parser is line-oriented and total: unknown directives and
  * malformed lines are skipped, comments stripped, keys
  * case-insensitive. An empty/absent file allows everything (the
  * RFC default).
  *
  * Scale shape: robots files are per-HOST (a tiny dimension next to
  * the URL corpus); [[decisionColumn]] parses each distinct file
  * once per partition via a memo keyed on the text, so the per-URL
  * work is just the rule match. Bytes/text never shuffle. */
object Robots {

  final case class Rule(pattern: String, allow: Boolean)
  final case class Group(agents: Vector[String], rules: Vector[Rule],
                         crawlDelay: Option[Double])

  def parse(text: String): Vector[Group] = {
    if (text == null) return Vector.empty
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inGroupHeader = false // consecutive user-agent lines stack
    var open = false
    def flush(): Unit = {
      if (open) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
      open = false
    }
    text.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inGroupHeader) flush()
            agents :+= value.toLowerCase
            inGroupHeader = true; open = true
          case "allow" | "disallow" if open =>
            inGroupHeader = false
            if (value.nonEmpty) rules :+= Rule(value, key == "allow")
          case "crawl-delay" if open =>
            inGroupHeader = false
            delay = try Some(value.toDouble) catch {
              case _: NumberFormatException => delay }
          case _ => inGroupHeader = false
        }
      }
    }
    flush()
    groups.result()
  }

  /** RFC 9309 §2.2.1: the group for `agent` is the one naming it
    * (case-insensitive token match), else the `*` group; multiple
    * matching groups merge. */
  def groupFor(groups: Vector[Group], agent: String): Option[Group] = {
    val a = agent.toLowerCase
    val specific = groups.filter(_.agents.contains(a))
    val chosen =
      if (specific.nonEmpty) specific
      else groups.filter(_.agents.contains("*"))
    if (chosen.isEmpty) None
    else Some(Group(chosen.head.agents,
      chosen.flatMap(_.rules),
      chosen.flatMap(_.crawlDelay).headOption))
  }

  /** Does `pattern` (with `*` wildcards, optional trailing `$`
    * anchor) match a prefix of `path`? RFC 9309 §2.2.3. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    // greedy segment match: split on '*', find segments in order
    val segs = p.split("\\*", -1)
    var pos = 0
    var i = 0
    var ok = true
    while (ok && i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (path.startsWith(seg, 0)) pos = seg.length else ok = false
      } else if (i == segs.length - 1 && anchored) {
        // last segment must match at the very end
        if (path.length - pos >= seg.length && path.endsWith(seg))
          pos = path.length
        else ok = false
      } else {
        val at = path.indexOf(seg, pos)
        if (at >= 0) pos = at + seg.length else ok = false
      }
      i += 1
    }
    ok && (!anchored || pos == path.length)
  }

  /** Longest-match decision (RFC 9309 §2.2.2): among matching rules
    * the longest PATTERN wins; on equal length Allow wins; no match
    * allows. Returns (allowed, crawlDelay). */
  def decide(groups: Vector[Group], agent: String, path: String)
      : (Boolean, Double) =
    groupFor(groups, agent) match {
      case None => (true, 0.0)
      case Some(g) =>
        var bestLen = -1
        var allow = true
        g.rules.foreach { r =>
          if (r.pattern.length > bestLen && matches(r.pattern, path)) {
            bestLen = r.pattern.length; allow = r.allow
          } else if (r.pattern.length == bestLen && !allow &&
            r.allow && matches(r.pattern, path)) {
            allow = true
          }
        }
        (allow, g.crawlDelay.getOrElse(0.0))
    }

  /** Append `allowed` + `crawl_delay` columns from a robots-text
    * column and a path column: per-partition memo keyed on the
    * robots text, so each distinct per-host file parses once per
    * partition and the per-URL cost is the match alone. */
  def decisionColumn(df: DataFrame, robotsCol: String, pathCol: String,
                     agent: String, allowedCol: String = "allowed",
                     delayCol: String = "crawl_delay"): DataFrame = {
    val schema = df.schema.add(allowedCol, BooleanType, nullable = false)
      .add(delayCol, DoubleType, nullable = false)
    val ri = df.schema.fieldIndex(robotsCol)
    val pi = df.schema.fieldIndex(pathCol)
    df.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, Vector[Group]]
      it.map { row =>
        val txt = row.getString(ri)
        val groups = memo.getOrElseUpdate(if (txt == null) "" else txt,
          parse(txt))
        // null path → "" (matches the null-robots handling above):
        // decide's prefix matcher must never see a null
        val p = row.getString(pi)
        val (ok, delay) = decide(groups, agent, if (p == null) "" else p)
        Row.fromSeq(row.toSeq ++ Seq(ok, delay))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
