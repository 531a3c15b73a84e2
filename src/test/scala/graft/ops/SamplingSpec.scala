package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling and packing: hash-determinism, ingest stability, rate
  * monotonicity, and the contiguous-layout invariants. */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("sampleByHash is deterministic, rate-monotone, and stable " +
    "under corpus growth") {
    val d = docs.select("doc_id", "source").cache()
    val at20 = Sampling.sampleByHash(d, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val at20b = Sampling.sampleByHash(d, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(at20 == at20b, "same rate must give the same set")
    val at50 = Sampling.sampleByHash(d, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(at20.subsetOf(at50), "raising the rate only ADDS rows")
    // ingest stability: sampling a grown corpus keeps the old sample
    val grown = d.unionByName(d.select((col("doc_id") + 1000000L)
      .as("doc_id"), col("source")))
    val grownSample = Sampling.sampleByHash(grown, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(grownSample.filter(_ < 1000000L) == at50,
      "growth must not disturb prior membership")
  }

  test("stratifiedSample applies per-group rates (empirically near " +
    "the target, exactly reproducible)") {
    val d = docs.select("doc_id", "source").cache()
    val rates = Map("src0" -> 0.0, "src1" -> 1.0)
    val kept = Sampling.stratifiedSample(d, "doc_id", "source",
      rates, 0.5)
    val bySrc = kept.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0"), "rate 0 keeps nothing")
    val src1Total = d.where(col("source") === "src1").count()
    assert(bySrc.get("src1").contains(src1Total), "rate 1 keeps all")
  }

  test("groupSplit: split is a pure function of the group (rows of a " +
    "group never straddle), cuts land near the rates, and val/test " +
    "are disjoint") {
    val rows = (1L to 20000L).map(i => (i, i % 4000)) // 4000 groups x 5
    val df = rows.toDF("id", "grp")
    val sp = Sampling.groupSplit(df, "grp", 0.1, 0.1)
    // a group maps to exactly one split
    val straddle = sp.groupBy("grp")
      .agg(countDistinct(col("split")).as("ns"))
      .where(col("ns") > 1).count()
    assert(straddle == 0L)
    val byn = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byn.values.sum == 20000L)
    // hash cuts: each 10% bucket within ±3% absolute of its rate
    assert(math.abs(byn("val") / 20000.0 - 0.1) < 0.03, byn.toString)
    assert(math.abs(byn("test") / 20000.0 - 0.1) < 0.03, byn.toString)
    // deterministic across runs/partitionings
    val again = Sampling.groupSplit(df.repartition(13), "grp", 0.1, 0.1)
      .select("id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val first = sp.select("id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == first)
  }

  test("sampleFixedN: exact size, deterministic, and NESTED (n=50 ⊂ " +
    "n=200); plans as TakeOrdered, not a global sort") {
    val d = docs.select("doc_id", "source")
    val at50 = Sampling.sampleFixedN(d, "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    val at200 = Sampling.sampleFixedN(d, "doc_id", 200)
      .select("doc_id").as[Long].collect().toSet
    assert(at50.size == 50 && at200.size == 200)
    assert(at50.subsetOf(at200), "fixed-n samples must nest")
    val again = Sampling.sampleFixedN(d, "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(again == at50)
    val q = Sampling.sampleFixedN(d, "doc_id", 50)
    q.collect()
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "fixed-n sampling must plan as per-partition top-n, not a sort")
  }

  test("sampleWeighted: exact size, deterministic, and weight-biased " +
    "(weighted sample is longer on average than uniform)") {
    val d = docs.select("doc_id", "n_chars")
    val w = Sampling.sampleWeighted(d, "doc_id", col("n_chars"), 80)
    val rows = w.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == 80 && rows.map(_._1).distinct.length == 80)
    val again = Sampling.sampleWeighted(d, "doc_id", col("n_chars"), 80)
      .select("doc_id").as[Long].collect().toSet
    assert(again == rows.map(_._1).toSet)
    val uniform = Sampling.sampleFixedN(d, "doc_id", 80)
      .select("n_chars").as[Long].collect()
    assert(rows.map(_._2).sum > uniform.sum,
      "length-weighting must overrepresent long docs")
    // infinite-weight row always wins a slot
    val boosted = d.withColumn("w",
      when(col("doc_id") === 7L, 1e12).otherwise(col("n_chars").cast("double")))
    val top = Sampling.sampleWeighted(boosted, "doc_id", col("w"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(top.contains(7L))
  }

  test("domainCap: bounds every group at cap, keeps each group's " +
    "smallest hash draws, nests across caps, and never plans a Window") {
    val d = docs.select("doc_id", "source", "n_chars").cache()
    val capped = Sampling.domainCap(d, "doc_id", "source", 25)
    val bySrc = capped.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = d.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      assert(bySrc(src) == math.min(n, 25L),
        s"$src: kept ${bySrc(src)} of $n at cap 25")
    }
    // survivors are exactly the smallest hash draws per group
    val draws = d.select(col("source"), col("doc_id"),
        Sampling.hashFraction(col("doc_id")).as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expect = draws.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._3, r._2)).take(25).map(_._2)
    }.toSet
    val got = capped.select("doc_id").as[Long].collect().toSet
    assert(got == expect, "survivor set must match the driver oracle")
    // nested: the cap-10 set is a subset of the cap-25 set
    val at10 = Sampling.domainCap(d, "doc_id", "source", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(at10.subsetOf(got), "caps must nest")
    // scale shape: bounded aggregate, not a rank Window
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "domainCap must not plan a Window")
    assert(plan.contains("top_k"), "domainCap must use the TopK aggregate")
  }

  test("packSequences: offsets are a contiguous per-shard layout and " +
    "window indices follow from them") {
    val p = Sampling.packSequences(docs, "doc_id", "text", 64, 3).cache()
    val shards = p.select("shard").distinct().as[Long].collect()
    assert(shards.nonEmpty && shards.forall(s => s >= 0 && s < 3))
    shards.foreach { s =>
      val rows = p.where(col("shard") === s)
        .orderBy("doc_id")
        .select("start_off", "n_tokens", "first_window", "last_window")
        .collect()
      var expect = 0L
      rows.foreach { r =>
        assert(r.getLong(0) == expect,
          s"start_off must be the running token count in shard $s")
        expect += r.getLong(1)
        assert(r.getLong(2) == r.getLong(0) / 64)
        assert(r.getLong(3) == (r.getLong(0) + r.getLong(1) - 1) / 64)
      }
    }
    // the union of windows covers exactly ceil(tokens/window) per shard
    val agg = p.groupBy("shard").agg(sum("n_tokens").as("t"),
      (max("last_window") + 1).as("w")).collect()
    agg.foreach(r =>
      assert(r.getLong(2) == (r.getLong(1) + 63) / 64))
  }

  test("packNoSplit: serial replay matches the kernel exactly, no bin " +
    "overflows the window, bins are dense + monotone, truncation is " +
    "min(n, window)") {
    val W = 64
    // append a doc longer than the window to exercise truncation
    val d = docs.select("doc_id", "text").unionByName(
      Seq((900001L, Seq.fill(W + 9)("tok").mkString(" ")))
        .toDF("doc_id", "text"))
    val p = Sampling.packNoSplit(d, "doc_id", "text", W, 3).cache()
    val rows = p.select("shard", "doc_id", "n_tokens", "t", "bin",
        "truncated")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    rows.foreach { case (_, _, n, t, _, trunc) =>
      assert(t == math.min(n, W.toLong))
      assert(trunc == (n > W))
    }
    // serial replay per shard — the gold contract
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      var bin = 0L; var fill = 0L; var first = true
      rs.sortBy(_._2).foreach { case (_, id, _, t, gotBin, _) =>
        if (first) { first = false; fill = t }
        else if (fill + t <= W) fill += t
        else { bin += 1; fill = t }
        assert(gotBin == bin,
          s"doc $id in shard $shard: kernel bin $gotBin, replay $bin")
      }
    }
    // no bin exceeds the window; bins dense per shard
    val over = p.groupBy("shard", "bin").agg(sum("t").as("ft"))
      .where(col("ft") > W).count()
    assert(over == 0L, "a packed bin must never exceed the window")
    p.groupBy("shard").agg(countDistinct(col("bin")).as("nb"),
        (max("bin") + 1).as("mx")).collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(2), "dense bins"))
  }

  test("lengthBucketBatches: batches stay within size, slots are " +
    "dense in id order, a batch never mixes buckets, and bucket is " +
    "ceil(n/granularity)") {
    val G = 16; val B = 8
    val p = Sampling.lengthBucketBatches(docs, "doc_id", "text", G, B, 3)
      .cache()
    val rows = p.select("shard", "bucket", "doc_id", "n_tokens",
        "batch", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    rows.foreach { case (_, bucket, _, n, _, pos) =>
      assert(bucket == (n + G - 1) / G)
      assert(pos >= 0 && pos < B)
    }
    // within each (shard, bucket): id order fills batch 0 slot 0.. in
    // sequence — batch*B+pos is exactly the 0-based rank
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
      val ranks = rs.sortBy(_._3).map(r => r._5 * B + r._6)
      assert(ranks.toSeq == rs.indices.map(_.toLong).toSeq,
        "batch*B+pos must be the id-order rank")
    }
    // no batch exceeds B docs
    val over = p.groupBy("shard", "bucket", "batch")
      .agg(count(lit(1)).as("n")).where(col("n") > B).count()
    assert(over == 0L)
  }

  test("unimaxAllocation: hand-computed water-filling on a 3-language " +
    "corpus; budget filled to within quantization; unsaturated langs " +
    "share one level") {
    val mk = (lang: String, n: Int) =>
      (1 to n).map(i => (s"$lang-$i", lang, Seq.fill(1)("t").mkString(" ")))
    // token counts 10 / 100 / 1000 via one-token docs
    val d = (mk("aa", 10) ++ mk("bb", 100) ++ mk("cc", 1000))
      .toDF("id", "lang", "text")
    val a = Sampling.unimaxAllocation(d, "lang",
        size(TextAnalysis.tokens(col("text"))).cast("long"), 2L, 5L, 2)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // caps [20,200,2000], B = 2*1110/5 = 444; k=2 (20+40<=444,
    // 220+200<=444, 2220>444), tq = (444-220)/1 = 224
    assert(a.toSeq == Seq(("aa", 10L, 20L, 20L, true),
      ("bb", 100L, 200L, 200L, true), ("cc", 1000L, 2000L, 224L, false)))
    assert(a.map(_._4).sum == 444L, "water-filling fills the budget")
    // budget >= sum(cap) saturates everyone
    val all = Sampling.unimaxAllocation(d, "lang",
        size(TextAnalysis.tokens(col("text"))).cast("long"), 10L, 1L, 2)
      .collect()
    assert(all.forall(_.getBoolean(4)), "ample budget saturates all")
    all.foreach(r => assert(r.getLong(3) == r.getLong(2)))
  }

  test("gopherFlags: each rule fires on a crafted violating doc and " +
    "keep is their conjunction") {
    val good = (Seq.fill(10)("the") ++ Seq.fill(20)("merge")).mkString(" ")
    val short = "the merge sort"
    val longWords = Seq.fill(30)("antidisestablishment").mkString(" ")
    val noStop = Seq.fill(30)("merge").mkString(" ")
    val rows = Seq((1L, good), (2L, short), (3L, longWords), (4L, noStop))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.gopherFlags(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(rows(1L).getBoolean(6), "good doc passes")
    assert(!rows(2L).getBoolean(3) && !rows(2L).getBoolean(6), "short fails len")
    assert(!rows(3L).getBoolean(4) && !rows(3L).getBoolean(6), "long words fail")
    assert(!rows(4L).getBoolean(5) && !rows(4L).getBoolean(6), "no stopwords")
  }

  test("c4Flags: line rules (terminal punct + min words, trimmed), " +
    "page rules (min kept lines + badword markers), cleaned rejoin") {
    val goodLine = "a perfectly fine sentence with many words inside."
    val rows = Seq(
      (1L, Seq(goodLine, "does this question line survive the filter?",
        "the quoted closer has plenty of words \"").mkString("\n")),
      (2L, Seq(goodLine, "short line.", "no terminal punctuation here at all",
        goodLine).mkString("\n")),
      (3L, Seq(goodLine, goodLine, goodLine, "lorem ipsum dolor sit amet.")
        .mkString("\n")),
      (4L, Seq(goodLine, goodLine, "we ship JavaScript bundles today.")
        .mkString("\n")),
      (5L, Seq(goodLine, goodLine, "a brace { hides in this line too.")
        .mkString("\n")),
      (6L, "trailing spaces after the period still count.   \n" +
        "  leading spaces get trimmed before the check.\n" + goodLine),
      (7L, ""))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.c4Flags(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    def kept(id: Long) = rows(id).getLong(1)
    def total(id: Long) = rows(id).getLong(2)
    def keep(id: Long) = rows(id).getBoolean(3)
    assert(kept(1L) == 3 && total(1L) == 3 && keep(1L))
    assert(kept(2L) == 2 && total(2L) == 4 && !keep(2L), "min kept lines")
    assert(kept(3L) == 4 && !keep(3L), "lorem ipsum page dropped")
    assert(kept(4L) == 3 && !keep(4L), "javascript marker (case-insens)")
    assert(kept(5L) == 3 && !keep(5L), "curly brace page dropped")
    assert(kept(6L) == 3 && keep(6L), "trim before last-char/word checks")
    assert(kept(7L) == 0 && total(7L) == 1 && !keep(7L))
    // cleaned keeps ORIGINAL (untrimmed) surviving lines in order
    assert(rows(6L).getString(0).startsWith(
      "trailing spaces after the period still count.   \n  leading"))
    assert(rows(7L).getString(0) == "")
  }

  test("scriptProfile: range buckets, first-max dominant, astral " +
    "chars count once as other, empty text is none") {
    val rows = Seq(
      (1L, "привет мир"), (2L, "你好世界"), (3L, "hello мир 你好 123"),
      (4L, "😀 ok"), (5L, ""), (6L, "3 14 15"))
      .toDF("id", "text")
      .select(col("id"),
        graft.ops.TextHashExpressions.scriptProfile(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    def dom(id: Long) = rows(id).getString(10)
    assert(dom(1L) == "cyrillic" && rows(1L).getLong(1) == 9)
    assert(dom(2L) == "cjk" && rows(2L).getLong(3) == 4)
    // ties/mixes: latin 5 beats cyrillic 3 and cjk 2, first-max order
    assert(dom(3L) == "latin" && rows(3L).getLong(0) == 5 &&
      rows(3L).getLong(7) == 3)
    // the emoji is ONE codepoint of 'other', not two surrogate chars
    assert(rows(4L).getLong(9) == 1 && dom(4L) == "latin")
    assert(dom(5L) == "none")
    assert(dom(6L) == "none" && rows(6L).getLong(7) == 5)
  }

  test("repeatFactorSample: copy counts bracket the factor, epochs " +
    "index 0..n-1 densely, f<1 down-samples, f=1 is identity, " +
    "deterministic") {
    val d = docs.select("doc_id", "source").cache()
    val f = Map("src0" -> 2.4, "src1" -> 0.3, "src2" -> 1.0)
    val out = Sampling.repeatFactorSample(d, "doc_id", "source", f, 1.0)
      .cache()
    // per-doc copy counts: every src0 doc appears 2 or 3 times with
    // epochs exactly 0..n-1; src1 docs appear 0 or 1 times
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), min("epoch").as("lo"),
        max("epoch").as("hi"))
      .collect()
    perDoc.foreach { r =>
      val (src, n, lo, hi) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo == 0L && hi == n - 1,
        s"epochs must be dense 0..n-1, got [$lo,$hi] for n=$n")
      src match {
        case "src0" => assert(n == 2L || n == 3L)
        case "src1" => assert(n == 1L) // 0-copy docs have no rows
        case _      => assert(n == 1L)
      }
    }
    // empirical mean copy count near the factor (binomial fractional)
    val n0 = d.where(col("source") === "src0").count()
    val c0 = out.where(col("source") === "src0").count()
    assert(math.abs(c0.toDouble / n0 - 2.4) < 0.35,
      s"src0 mean copies ${c0.toDouble / n0} too far from 2.4")
    val n1 = d.where(col("source") === "src1").count()
    val c1 = out.where(col("source") === "src1").count()
    assert(c1 < n1, "f<1 must drop rows")
    // f = 1.0 is exact identity membership (no draw dependence)
    val src2 = out.where(col("source") === "src2")
    assert(src2.count() == d.where(col("source") === "src2").count())
    // deterministic: a second run is the same multiset
    val again = Sampling.repeatFactorSample(d, "doc_id", "source", f, 1.0)
    assert(out.select("doc_id", "epoch").except(
      again.select("doc_id", "epoch")).isEmpty)
    out.unpersist(); d.unpersist()
  }

  test("groupKFold: fold is a pure function of the group key, folds " +
    "partition the corpus, sizes are near-balanced, and a group never " +
    "straddles folds") {
    val d = docs.select(col("doc_id"), col("source")).cache()
    val k = 5
    val out = Sampling.groupKFold(d, "source", k).cache()
    // total partition: every row gets exactly one fold in [0, k)
    assert(out.count() == d.count())
    assert(out.where(col("fold") < 0 || col("fold") >= k).count() == 0)
    // group-pure: every source maps to ONE fold
    val perGroup = out.groupBy("source")
      .agg(countDistinct(col("fold")).as("nf"))
    assert(perGroup.where(col("nf") > 1).count() == 0,
      "a group key must never straddle folds")
    // determinism: a second run assigns identically
    val again = Sampling.groupKFold(d, "source", k)
    assert(out.select("doc_id", "fold").except(
      again.select("doc_id", "fold")).isEmpty)
    // keyed by doc_id (many small groups) the folds are near-balanced
    val byDoc = Sampling.groupKFold(d, "doc_id", k)
      .groupBy("fold").count().collect().map(_.getLong(1))
    val n = d.count().toDouble
    byDoc.foreach(c => assert(math.abs(c / n - 1.0 / k) < 0.1,
      s"fold share ${c / n} too far from ${1.0 / k}"))
    out.unpersist(); d.unpersist()
  }

  test("doremi reweighting: mixture weight is strictly monotone in " +
    "domain loss, rates realize the up-weighting, and the kept set " +
    "is deterministic") {
    val out = graft.SparkEntry.queries("q_sample_doremi")(spark,
      "/root/testdata/sf0.001").collect()
    assert(out.length >= 2, "fixture must have several sources")
    // q = exp(nll - mn)/Z is strictly increasing in nll: the harder
    // the domain, the larger its mixture share
    val byNll = out.sortBy(_.getAs[Double]("nll"))
    byNll.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("q") <= b.getAs[Double]("q"),
        s"q must not decrease with nll: ${a.getAs[String]("source")} vs " +
          b.getAs[String]("source"))
    }
    out.foreach { r =>
      assert(r.getAs[Double]("rate") >= 0.0 &&
        r.getAs[Double]("rate") <= 1.0)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    val again = graft.SparkEntry.queries("q_sample_doremi")(spark,
      "/root/testdata/sf0.001").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  /** Reference implementation of the budget prefix: per-source sort
    * on (score desc, id asc), keep while running nt sum fits
    * floor(mass·num/den). Used to pin selectBudget's refinement. */
  private def budgetPrefixRef(rows: Seq[(String, Double, Long, Long)],
                              num: Long, den: Long): Set[Long] =
    rows.groupBy(_._1).flatMap { case (_, g) =>
      val budget = g.map(_._3).sum * num / den
      var cum = 0L
      g.sortBy(r => (-r._2, r._4)).takeWhile { r =>
        cum += r._3; cum <= budget
      }.map(_._4)
    }.toSet

  private def runSelect(rows: Seq[(String, Double, Long, Long)],
                        num: Long, den: Long, buckets: Int,
                        cap: Long): Set[Long] =
    Sampling.selectBudget(
        rows.toDF("source", "score", "nt", "doc_id"),
        "source", "score", "nt", "doc_id", num, den,
        buckets = buckets, cap = cap)
      .select("doc_id").as[Long].collect().toSet

  test("selectBudget matches the sort-window prefix with refinement " +
    "forced (tiny cap), across sources, ties, and zero-nt docs") {
    // 3 sources x 200 docs; scores collide in blocks of 4 (forces the
    // id axis inside a block when the cut lands there); a few nt=0
    // docs; distinct per-source score offsets
    val rows = for {
      s <- 0 until 3; i <- 0 until 200
    } yield (s"src$s", (i / 4).toDouble / 7.0 + s * 0.001,
      if (i % 17 == 0) 0L else (i % 13 + 1).toLong,
      (s * 1000 + i).toLong)
    for ((num, den) <- Seq((2L, 5L), (1L, 3L), (9L, 10L), (1L, 1000L))) {
      val got = runSelect(rows, num, den, buckets = 4, cap = 3)
      val want = budgetPrefixRef(rows, num, den)
      assert(got === want, s"num=$num den=$den")
    }
  }

  test("selectBudget: one giant exact-score tie goes straight to id " +
    "refinement and still matches") {
    val rows = (0 until 500).map(i =>
      ("only", 0.25, (i % 7 + 1).toLong, i.toLong))
    val got = runSelect(rows, 1L, 2L, buckets = 4, cap = 3)
    assert(got === budgetPrefixRef(rows, 1L, 2L))
  }

  test("selectBudget: budget >= mass keeps everything; large cap " +
    "degenerates to the exact window") {
    val rows = (0 until 50).map(i =>
      (s"s${i % 2}", i.toDouble, 2L, i.toLong))
    assert(runSelect(rows, 3L, 2L, 8, 4) === rows.map(_._4).toSet)
    assert(runSelect(rows, 1L, 3L, 8, 100000) ===
      budgetPrefixRef(rows, 1L, 3L))
  }

  test("selectBudget plan: the only sort/window sits on the bounded " +
    "boundary branch, never the data grain") {
    val rows = (0 until 400).map(i =>
      ("s", i.toDouble / 3.0, 1L, i.toLong))
    val kept = Sampling.selectBudget(
      rows.toDF("source", "score", "nt", "doc_id"),
      "source", "score", "nt", "doc_id", 1L, 2L, buckets = 4, cap = 3)
    // optimized LOGICAL plan (the physical tree hides behind AQE):
    // exactly one Window — the boundary running sum — whose input is
    // the boundary-interval filter, and zero Sort nodes anywhere (a
    // logical Sort would mean an orderBy over the data grain; the
    // window's own sort is physical and bounded by the filter)
    import org.apache.spark.sql.catalyst.plans.logical
    val opt = kept.queryExecution.optimizedPlan
    val windows = opt.collect { case w: logical.Window => w }
    assert(windows.size === 1)
    assert(opt.collect { case s: logical.Sort => s }.isEmpty,
      "no orderBy over the data grain")
    val below = windows.head.child.toString
    assert(below.contains("_blo") || below.contains("_tie"),
      "window must sit above the boundary-interval filter")
  }
}
