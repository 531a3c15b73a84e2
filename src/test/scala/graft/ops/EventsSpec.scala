package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join and sessionization: checked against brute-force
  * in-memory oracles, including the edge cases the fixture data lacks
  * (equal-ts ties, unmatched keys, empty right side). */
class EventsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (id, key, ts, value) — deliberate ties: right rows at the exact
  // left ts, and two right rows at the same (key, ts)
  private val leftRows = Seq(
    (1L, 1L, 100L, 10.0), (2L, 1L, 200L, 20.0), (3L, 1L, 50L, 5.0),
    (4L, 2L, 150L, 15.0), (5L, 3L, 400L, 40.0))
  private val rightRows = Seq(
    (11L, 1L, 100L, 1.0), // exact-ts match for left id=1
    (12L, 1L, 180L, 2.0),
    (13L, 2L, 150L, 3.0), (14L, 2L, 150L, 4.0), // (key,ts) tie: max seq wins
    (15L, 4L, 10L, 9.0)) // key absent on the left

  private def naiveAsof(l: (Long, Long, Long, Double)) = {
    val cand = rightRows.filter(r => r._2 == l._2 && r._3 <= l._3)
    if (cand.isEmpty) None
    else Some(cand.maxBy(r => (r._3, r._1))) // latest ts, then max seq
  }

  test("asofJoin matches the brute-force oracle incl. exact-ts and " +
    "same-ts-tie semantics; unmatched rows keep null payloads") {
    val l = leftRows.toDF("event_id", "user_id", "ts", "value")
    val r = rightRows.toDF("event_id", "user_id", "ts", "value")
    val out = Events.asofJoin(l, r, "user_id", "ts", "event_id",
      Seq("event_id", "value"))
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet
    val want = leftRows.map { lr =>
      val m = naiveAsof(lr)
      (lr._1, m.map(_._1), m.map(_._4))
    }.toSet
    assert(out == want)
    // id=1 sees the exact-ts purchase; id=4 (tie) sees seq 14
    assert(out.contains((1L, Some(11L), Some(1.0))))
    assert(out.contains((4L, Some(14L), Some(4.0))))
    assert(out.contains((5L, None, None)), "no purchase for key 3")
  }

  test("asofJoin with an empty right side is a pure left projection " +
    "with null payloads") {
    val l = leftRows.toDF("event_id", "user_id", "ts", "value")
    val r = rightRows.toDF("event_id", "user_id", "ts", "value")
      .where(lit(false))
    val out = Events.asofJoin(l, r, "user_id", "ts", "event_id",
      Seq("value"))
    assert(out.count() == leftRows.size)
    assert(out.where(col("asof_value").isNotNull).count() == 0)
  }

  test("sessionize splits on gaps > threshold and session_idx is a " +
    "1-based per-key counter; sessionStats spans are exact") {
    // key 1: gaps 10, 100(new), 10 → sessions [a,b],[c,d]
    val rows = Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 110L),
      (4L, 1L, 120L), (5L, 2L, 1000L)).toDF("event_id", "user_id", "ts")
    val s = Events.sessionize(rows, "user_id", "ts", "event_id",
      gapNanos = 50L)
    val got = s.select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    val stats = Events.sessionStats(s, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(stats == Map((1L, 1L) -> (2L, 10L), (1L, 2L) -> (2L, 10L),
      (2L, 1L) -> (1L, 0L)))
  }

  test("rangeJoinBucketed equals the brute-force containment join and " +
    "never plans a nested loop") {
    val ev = graft.ops.Events.load(spark, "/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "ts", "event_type")
    val half = 30L * 60 * 1000000000L
    val points = ev.where(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts")
    val intervals = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        (col("ts") - half).as("lo"), (col("ts") + half).as("hi"))
    val got = Events.rangeJoinBucketed(points, intervals, "user_id", "ts",
      "lo", "hi", bucketNs = 2 * half)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "range join must bucket into a hash join")
    val gotPairs = got.select("event_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ps = points.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ws = intervals.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = (for {
      p <- ps; w <- ws
      if p._2 == w._1 && p._3 >= w._3 && p._3 <= w._4
    } yield (p._1, w._2)).toSet
    assert(gotPairs == want)
    assert(want.nonEmpty, "fixture should produce containments")
  }

  test("fixture events: every non-purchase row's as-of purchase is " +
    "the true latest-at-or-before purchase (sampled check)") {
    val ev = graft.ops.Events.load(spark, "/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "ts", "event_type", "value")
    val left = ev.where(col("event_type") =!= "purchase")
    val right = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val out = Events.asofJoin(left, right, "user_id", "ts", "event_id",
      Seq("event_id")).cache()
    val purchases = right.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sample = out.orderBy("event_id").limit(200).collect()
    sample.foreach { r =>
      val (uid, ts) = (r.getLong(1), r.getLong(2))
      val want = purchases.filter(p => p._1 == uid && p._2 <= ts)
        .sortBy(p => (p._2, p._3)).lastOption.map(_._3)
      val got = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(got == want, s"event ${r.getLong(0)}")
    }
  }

  test("tumblingAgg buckets by exact int64 window math (driver " +
    "oracle), one hash aggregate, no window function") {
    val rows = Seq( // (key, ts, value) straddling window boundaries
      ("a", 0L, 1.0), ("a", 9L, 2.0), ("a", 10L, 3.0), ("a", 19L, 4.0),
      ("a", 20L, 5.0), ("b", 5L, 6.0), ("b", 25L, 7.0))
      .toDF("k", "ts", "v")
    val got = Events.tumblingAgg(rows, "ts", 10L, Seq("k"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val want = Seq(("a", 0L, 3.0, 2L), ("a", 10L, 7.0, 2L),
      ("a", 20L, 5.0, 1L), ("b", 0L, 6.0, 1L), ("b", 20L, 7.0, 1L))
    want.foreach { case (k, ws, sv, n) =>
      assert(got((ws, k)) == (n, sv), s"window ($k, $ws)")
    }
    assert(got.size == want.size)
    // real fixture: every event lands in exactly one window
    val ev = graft.ops.Events.load(spark, "/root/testdata/sf0.001/events.parquet")
    val w = Events.tumblingAgg(ev, "ts", 86400000000000L,
      Seq("event_type"), col("value"))
    assert(w.agg(sum("n")).as[Long].head() == ev.count())
    val plan = w.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "tumblingAgg must not plan a Window")
  }

  test("funnel: strictly-after step semantics, missing steps are null, " +
    "out-of-order users never convert") {
    // u1: clean v->c->p; u2: click BEFORE view only (no t2); u3: view
    // only; u4: v->c but the purchase ties the click timestamp
    // exactly (strictly-after excludes it)
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "click"), (2L, 20L, "view"),
      (3L, 10L, "view"),
      (4L, 10L, "view"), (4L, 20L, "click"), (4L, 20L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val f = Events.funnel(ev, "user_id", "ts", Seq(
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.get(1), r.get(2), r.get(3)))).toMap
    assert(f(1L) == ((10L, 20L, 30L)))
    assert(f(2L) == ((20L, null, null)), "click before view must not count")
    assert(f(3L) == ((10L, null, null)))
    assert(f(4L) == ((10L, 20L, null)), "purchase at t2 is not AFTER t2")
    assert(f.size == 4)
  }

  test("eventPaths: runs crossing a session gap are excluded, counts " +
    "match brute force, and the key sorts exactly once") {
    import spark.implicits._
    val h = 3600L * 1000000000L
    // user 1: A B C D within one session, then a gap, then E F G
    // user 2: A B (too short for n=3)
    val ev = Seq(
      (1L, 1L * h, 1L, "A"), (1L, 2L * h, 2L, "B"), (1L, 3L * h, 3L, "C"),
      (1L, 4L * h, 4L, "D"),
      (1L, 100L * h, 5L, "E"), (1L, 101L * h, 6L, "F"),
      (1L, 102L * h, 7L, "G"),
      (2L, 1L * h, 8L, "A"), (2L, 2L * h, 9L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.eventPaths(ev, "user_id", "ts", "event_id",
        "event_type", 3, gapNanos = 6L * h)
      .select("step1", "step2", "step3", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    // in-session 3-runs: ABC, BCD, EFG — and nothing else (no CDE/DEF
    // across the gap, nothing from user 2)
    assert(got == Map(("A", "B", "C") -> 1L, ("B", "C", "D") -> 1L,
      ("E", "F", "G") -> 1L), s"got $got")
    val plan = Events.eventPaths(ev, "user_id", "ts", "event_id",
        "event_type", 3, gapNanos = 6L * h)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val keySorts = "Sort \\[user_id".r.findAllIn(plan).size
    assert(keySorts == 1, s"$keySorts key sorts, want 1:\n$plan")
  }

  test("ewma: recurrence matches a driver fold per key, forecast lags " +
    "by one event, and the plan is one exchange + sort (no Window)") {
    val ev = graft.ops.Events.load(spark, "/root/testdata/sf0.001/events.parquet")
    val got = Events.ewma(ev, "user_id", "ts", "event_id", "value", 0.3)
    val rows = got.select("user_id", "ts", "event_id", "value", "ewma",
        "forecast").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    // driver replay: same (ts, seq) order, same literal recurrence
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (_, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3))
      var e = 0.0
      var first = true
      ord.foreach { case (_, _, _, v, ge, gfc) =>
        val fc = if (first) None else Some(e)
        e = if (first) v else 0.3 * v + (1.0 - 0.3) * e
        first = false
        assert(ge == e, s"ewma $ge != $e")
        assert(gfc == fc, s"forecast $gfc != $fc")
      }
    }
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window op expected:\n$plan")
    assert(plan.split("Exchange").length - 1 == 1,
      s"exactly one exchange expected:\n$plan")
  }

  test("decayedMass: quantized weights sum order-independently, " +
    "decay halves mass per half-life, and now-events weigh ~1") {
    import spark.implicits._
    val tau = 1000000.0 // 1 s in µs
    val rows = Seq((0L, "a"), (693147L, "a"), (1386294L, "b"))
      .toDF("tsu", "k") // 0, τ·ln2, 2τ·ln2 before the reference
    val ref = lit(1386294L)
    val got = graft.ops.Events
      .decayedMass(rows, col("tsu"), Seq("k"), ref, tau)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val s = graft.ops.Stats.FxScale.toDouble
    def fp(dtu: Long): Long = math.floor(math.exp(-dtu / tau) * s).toLong
    // key a: half-life-old (w≈0.5) + quarter-life... exact replay:
    assert(got("a") == fp(1386294L) + fp(693147L))
    assert(got("b") == fp(0L) && got("b") == s.toLong)
    // order independence: same totals under any partitioning
    val got13 = graft.ops.Events
      .decayedMass(rows.repartition(13), col("tsu"), Seq("k"), ref, tau)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got13 == got)
  }

  test("cusum: clamped drift sums match a driver fold, detect a " +
    "sustained level shift a single residual misses, and the plan " +
    "stays one exchange + sort") {
    import spark.implicits._
    val ev = graft.ops.Events.load(spark, "/root/testdata/sf0.001/events.parquet")
    val got = Events.cusum(ev, "user_id", "ts", "event_id", "value",
      50.0, 25.0)
    val rows = got.select("user_id", "ts", "event_id", "value",
        "cusum_hi", "cusum_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      var hi = 0.0; var lo = 0.0
      rs.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, v, gh, gl) =>
        hi = math.max(0.0, hi + (v - 50.0 - 25.0))
        lo = math.max(0.0, lo + (50.0 - 25.0 - v))
        assert(gh == hi, s"hi $gh != $hi")
        assert(gl == lo, s"lo $gl != $lo")
      }
    }
    // a +8 level shift (under the slack-sized single-step residual)
    // accumulates: no single step moves hi by more than 3, but the
    // drift trips a threshold no single residual reaches
    val shifted = (1 to 60).map(i =>
      (1L, i.toLong, i.toLong, if (i <= 30) 50.0 else 58.0))
      .toDF("user_id", "ts", "event_id", "value")
    val d = Events.cusum(shifted, "user_id", "ts", "event_id", "value",
      50.0, 5.0).select("event_id", "cusum_hi").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(d(30L) == 0.0, "pre-shift hi must be clamped at 0")
    assert(d(60L) == 30 * 3.0, "post-shift drift must accumulate")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") &&
      plan.split("Exchange").length - 1 == 1, s"plan shape:\n$plan")
  }

  test("Events.load normalizes a TIMESTAMP ts to epoch-nanos and " +
    "passes a long ts through unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("evload").toFile
    tmp.deleteOnExit()
    // micros-timestamp fixture: 2026-01-02T03:04:05.123456Z
    val us = 1767323045123456L
    spark.sql(s"SELECT 1L AS event_id, timestamp_micros(${us}L) AS ts")
      .write.mode("overwrite").parquet(s"$tmp/tsu")
    val loaded = Events.load(spark, s"$tmp/tsu")
    assert(loaded.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(loaded.head().getAs[Long]("ts") == us * 1000L)
    // long fixture passes through bit-identically
    Seq((1L, us * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/tsl")
    assert(Events.load(spark, s"$tmp/tsl").head().getAs[Long]("ts") ==
      us * 1000L)
  }

  test("Events.load on a TIMESTAMP_NTZ fixture (isAdjustedToUTC=false, " +
    "the real testdata shape) is session-timezone independent") {
    val tmp = java.nio.file.Files.createTempDirectory("evntz").toFile
    tmp.deleteOnExit()
    // NTZ literal 2026-01-02T03:04:05.123456 — read AS UTC must give:
    val us = 1767323045123456L
    spark.sql("SELECT 1L AS event_id, " +
      "TIMESTAMP_NTZ'2026-01-02 03:04:05.123456' AS ts")
      .write.mode("overwrite").parquet(s"$tmp/ntz")
    val savedTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/Los_Angeles", "Asia/Tokyo")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val loaded = Events.load(spark, s"$tmp/ntz")
        assert(loaded.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        assert(loaded.head().getAs[Long]("ts") == us * 1000L,
          s"NTZ normalization drifted under session tz $tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", savedTz)
  }

  test("asofJoin edge semantics: null-key rows never match each other, " +
    "the left needs no seq column, and reserved names fail fast") {
    val s = spark
    import s.implicits._
    val left = Seq((Some(1L), 100L, "a"), (None: Option[Long], 100L, "b"))
      .toDF("k", "ts", "tag") // no event_id on the left
    val right = Seq((Some(1L), 50L, 1L, 10.0),
      (None: Option[Long], 40L, 2L, 99.0)).toDF("k", "ts", "event_id", "v")
    val out = Events.asofJoin(left, right, "k", "ts", "event_id", Seq("v"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out("a").contains(10.0))
    // SQL ASOF equality: null key = null key is NOT a match
    assert(out("b").isEmpty, s"null-key left must stay unmatched: $out")
    val clash = left.withColumnRenamed("tag", "__p")
    val e = intercept[IllegalArgumentException] {
      Events.asofJoin(clash, right, "k", "ts", "event_id", Seq("v"))
    }
    assert(e.getMessage.contains("reserves"))
  }

  test("transitions: an X -> null-type transition is counted; only " +
    "true end-of-stream rows are excluded") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L, 1L, Some("x")), (1L, 2L, 2L, None),
      (1L, 3L, 3L, Some("y"))).toDF("k", "ts", "seq", "et")
    val m = Events.transitions(df, "k", "ts", "seq", "et")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))
        -> r.getLong(2)).toMap
    assert(m.get((Some("x"), None)).contains(1L), s"$m")
    assert(m.get((None, Some("y"))).contains(1L), s"$m")
    assert(m.size == 2)
  }

  test("cusum/ewma normalize the metric: integer value columns fold " +
    "as doubles and null-metric rows are excluded, not a crash") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L, 1L, Some(5)), (1L, 2L, 2L, None),
      (1L, 3L, 3L, Some(7))).toDF("k", "ts", "seq", "v")
    val cu = Events.cusum(df, "k", "ts", "seq", "v",
      target = 4.0, slack = 0.0).select("ts", "cusum_hi")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(cu.map(_._1).toSeq == Seq(1L, 3L)) // null row excluded
    assert(cu.map(_._2).toSeq == Seq(1.0, 4.0)) // 5-4, then +7-4
    val ew = Events.ewma(df, "k", "ts", "seq", "v", alpha = 0.5)
      .select("ts", "ewma").as[(Long, Double)].collect().sortBy(_._1)
    assert(ew.map(_._2).toSeq == Seq(5.0, 6.0))
  }

  test("decayedMass clamps clock-skewed future events at weight 1 " +
    "instead of overflowing the fixed-point aggregate") {
    val s = spark
    import s.implicits._
    // one event 100*tau in the FUTURE of the reference point
    val df = Seq((1L, "t", 0L), (2L, "t", 100000000L))
      .toDF("id", "et", "tsu")
    val out = Events.decayedMass(df, col("tsu"), Seq("et"), lit(0L),
      tauMicros = 1e6).collect()
    val fp = out.head.getLong(2)
    assert(fp == 2L * graft.ops.Stats.FxScale,
      s"past event at ref + future event both weigh 1.0: $fp")
  }
}
