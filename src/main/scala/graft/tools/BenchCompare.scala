package graft.tools

/** Pure compare/merge logic for the bench contention + drift guard.
  *
  * Round-9 compared each query against the LAST committed artifact,
  * which ratchets (sub-2x drifts re-baseline silently). Round 10
  * replaced that with a per-query best-ever MINIMUM table
  * (BENCH_BEST.json) — monotone, contention-proof — but summing
  * 10 rounds of per-query minima produces an optimistic compound
  * that every honest single run trails (+13% "drift" on a run whose
  * actual quiesced total IMPROVED round-over-round), and the write
  * path was not sf-gated, so a full run at a different scale factor
  * silently discarded the accumulated sf0.1 minima.
  *
  * Round 11 fixes both with a v2 table keyed by scale factor that
  * keeps a bounded OBSERVATION HISTORY per query instead of a bare
  * minimum:
  *
  * {{{ {"format":2,"sfs":{
  *      "<sfDir>":{"q_a":[0.95,1.02],"q_b":[0.5]}, ...}} }}}
  *
  *  - best(q)   = min(obs)            — the contention guard's 2x
  *    reference, same semantics as round 10 (minima only go down,
  *    contention only inflates, so merging any run is safe);
  *  - spread(q) = MAD(obs) floored    — the per-query noise model;
  *  - baseline(q) = median(obs)       — a typical honest committed
  *    run, immune to min-compounding (the round-10 verdict's
  *    "compare vs the best single artifact, not the min-per-query
  *    sum": the median over committed observations IS a realistic
  *    single-artifact value, and unlike "best artifact" it is
  *    well-defined when the query set grows across rounds).
  *
  * The drift section now reports nowTotal vs the median baseline and
  * per-query flags fire only when now > median + 2*spread — so
  * `over_5pct` means "this run is slower than a typical committed
  * run", not "slower than a 10-round lucky compound". Contended
  * observations are NOT appended to the history (they would inflate
  * the median and spread the guard depends on); the round-10 "any
  * run is safe to merge" property held only for the minimum. */
object BenchCompare {

  /** Extract the per-query times from a BENCH_*.json payload. Only
    * q_-prefixed keys participate — the elbo/rff optimizer segments
    * have their own best-of-3 discipline and different units across
    * rounds (iters vs secs), so they stay out of the guard. */
  def parseQueryTimes(txt: String): Map[String, Double] =
    "\"(q_[a-z0-9_]+)\":([0-9]+\\.[0-9]+)".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** [[parseQueryTimes]] gated on the artifact's scale factor:
    * times are only comparable at the SAME sf (the round-10 lesson —
    * the first seeding merged an sf0.001 artifact and six queries'
    * "best-ever" became physically unreachable at sf0.1, flagging
    * reproducible quiet-machine runs as contended). An artifact
    * whose `"sf"` field differs contributes nothing. */
  def parseQueryTimesForSf(txt: String, sfDir: String)
      : Map[String, Double] =
    if (txt.contains("\"sf\":\"" + sfDir + "\"")) parseQueryTimes(txt)
    else Map.empty

  // ---- v2 observation-history table ------------------------------

  /** Max observations kept per query: enough for a stable median/MAD,
    * small enough that one bad epoch ages out within a few rounds. */
  val HistCap = 8

  /** Parse every sf section of a v2 BENCH_BEST.json. A v1 file
    * (flat `{"sf":...,"queries":{...}}`) degrades to one section
    * whose per-query history is the single recorded minimum. */
  def parseAllSfs(txt: String): Map[String, Map[String, Vector[Double]]] =
    if (txt.contains("\"format\":2")) {
      // each sf block: "<dir>":{"q_a":[..],"q_b":[..]} — the inner
      // maps contain no braces (arrays use brackets), so a
      // non-greedy block regex is unambiguous
      "\"([^\"]+)\":\\{((?:\"q_[a-z0-9_]+\":\\[[0-9.,]*\\],?)*)\\}".r
        .findAllMatchIn(txt).map { m =>
          val obs = "\"(q_[a-z0-9_]+)\":\\[([0-9.,]*)\\]".r
            .findAllMatchIn(m.group(2)).map { q =>
              q.group(1) -> q.group(2).split(',').iterator
                .filter(_.nonEmpty).map(_.toDouble).toVector
            }.toMap
          m.group(1) -> obs
        }.toMap
    } else {
      "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map { m =>
        Map(m.group(1) ->
          parseQueryTimes(txt).map { case (k, v) => k -> Vector(v) })
      }.getOrElse(Map.empty)
    }

  /** Serialize the full table back to v2 JSON (sf sections and query
    * keys sorted for stable diffs). */
  def renderAllSfs(all: Map[String, Map[String, Vector[Double]]]): String = {
    def fmt(v: Double): String = "%.3f".format(v)
    val sfs = all.toSeq.sortBy(_._1).map { case (sf, qs) =>
      "\"" + sf + "\":" + qs.toSeq.sortBy(_._1).map { case (q, obs) =>
        "\"" + q + "\":" + obs.map(fmt).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    }.mkString(",\n")
    s"""{"format":2,"sfs":{\n$sfs}}"""
  }

  /** Append this run's times to the history (oldest dropped past
    * [[HistCap]]). Contended/errored queries must be excluded by the
    * caller — a contended time would inflate the median and spread
    * the guard depends on. Queries new to the table pass through. */
  def appendObs(table: Map[String, Vector[Double]],
                now: Map[String, Double],
                cap: Int = HistCap): Map[String, Vector[Double]] =
    (table.keySet ++ now.keySet).iterator.map { k =>
      val h = table.getOrElse(k, Vector.empty) ++ now.get(k)
      k -> h.takeRight(cap)
    }.toMap

  /** Best-ever = min over history — the contention reference. */
  def bestOf(obs: Vector[Double]): Double = obs.min

  def medianOf(obs: Vector[Double]): Double = {
    val s = obs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Per-query noise: MAD of the history, floored at
    * max(20 ms, 5% of best) so a short history (or a freakishly
    * stable one) doesn't make every honest 30 ms wobble a flag. */
  def spreadOf(obs: Vector[Double]): Double = {
    val med = medianOf(obs)
    val mad = medianOf(obs.map(x => math.abs(x - med)))
    math.max(mad, math.max(0.02, 0.05 * bestOf(obs)))
  }

  /** Per-query minimum merge (legacy shape — still what the
    * contention guard consumes, via bestOf over the seeded table). */
  def mergeBest(prior: Map[String, Double],
                now: Map[String, Double]): Map[String, Double] =
    (prior.keySet ++ now.keySet).iterator.map { k =>
      k -> math.min(prior.getOrElse(k, Double.MaxValue),
        now.getOrElse(k, Double.MaxValue))
    }.toMap

  final case class Drift(baselineTotal: Double, nowTotal: Double,
    pct: Double, flagged: Seq[String])

  /** Cumulative drift of the common query set vs the MEDIAN baseline
    * (not the min-compound — see class doc), plus per-query flags
    * where now > median + 2*spread: the flag anchors at the TYPICAL
    * committed value, not the lucky one-off minimum (a best-anchored
    * flag fires on every honest run whose best was an outlier low —
    * the same optimism the drift total fix removes). The 2x-vs-best
    * contention guard still covers gross inflation separately.
    * Contended keys are excluded from both (their inflation is
    * already reported). */
  def drift(table: Map[String, Vector[Double]],
            now: Map[String, Double],
            contendedKeys: Set[String]): Drift = {
    val common = ((table.keySet intersect now.keySet) -- contendedKeys)
      .toSeq.sorted
    val b = common.iterator.map(k => medianOf(table(k))).sum
    val n = common.iterator.map(now).sum
    val flagged = common.filter { k =>
      now(k) > medianOf(table(k)) + 2.0 * spreadOf(table(k))
    }
    Drift(b, n, if (b > 0) (n - b) / b else 0.0, flagged)
  }

  /** True when a query's current best-of-N time exceeds the guard
    * threshold vs its best-ever prior. */
  def isContended(now: Double, bestEver: Double,
                  factor: Double = 2.0): Boolean = now > factor * bestEver
}
