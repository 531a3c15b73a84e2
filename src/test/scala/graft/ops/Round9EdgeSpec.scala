package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge contracts for the round-9 operators: dense shuffle ranks and
  * cross-epoch decorrelation, exact epoch counts for saturated UniMax
  * languages, bottom-k with no pairs, and cluster adoption through a
  * diverted template bucket. */
class Round9EdgeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("epochShuffle: ranks are dense 0..n-1 within every (epoch, " +
    "shard); shard assignment decorrelates across epochs") {
    val s = spark
    import s.implicits._
    val df = (1L to 400L).map(i => (i, s"doc $i")).toDF("id", "t")
    val out = Sampling.epochShuffle(df, "id", nShards = 4, epochs = 2)
      .select("id", "epoch", "shard", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 800)
    // dense ranks per group
    out.groupBy(r => (r._2, r._3)).foreach { case (g, rows) =>
      val ranks = rows.map(_._4).sorted
      assert(ranks.sameElements(0L until rows.length.toLong), s"group $g")
    }
    // decorrelation: a meaningful fraction of docs change shards
    // between epochs (P[same] = 1/4 under independence; allow slack)
    val byId = out.groupBy(_._1).map { case (_, rows) =>
      rows.find(_._2 == 0L).get._3 == rows.find(_._2 == 1L).get._3
    }
    val sameFrac = byId.count(identity).toDouble / byId.size
    assert(sameFrac < 0.45, s"shards too correlated across epochs: $sameFrac")
  }

  test("unimaxRealize: a language whose epoch cap binds emits EXACTLY " +
    "epochCap copies of every doc (f lands on the integer, no draw)") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, "a", "w1 w2 w3 w4 w5"), (2L, "a", "x1 x2 x3 x4 x5")) ++
      (10L until 110L).map(i => (i, "b", (1 to 10).map(j => s"t${i}_$j").mkString(" ")))
    val df = rows.toDF("id", "lang", "text")
    val tok = size(split(col("text"), " ")).cast("long")
    // budget = mass/2 = 505; cap_a = 30 <= headroom -> a saturates
    val alloc = Sampling.unimaxAllocation(df, "lang", tok, 1L, 2L, 3)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(alloc("a") == ((30L, true)), s"$alloc")
    val out = Sampling.unimaxRealize(df, "id", "lang", tok, 1L, 2L, 3)
      .where(col("lang") === "a")
      .groupBy("id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L), s"$out")
  }

  test("bottomKOverlap: a single group yields zero pair rows, not an " +
    "error or a self-pair") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).map(i => ("only", i)).toDF("g", "k")
    assert(Sketches.bottomKOverlap(df, col("g"), col("k"), 16).count() == 0L)
  }

  test("assignToClusters: an exact duplicate of a DIVERTED template " +
    "family still adopts its cluster (group-edge rule); novel docs " +
    "become their own singletons") {
    val s = spark
    import s.implicits._
    // 8 identical docs -> every band bucket has 8 members > cap=3:
    // pair path fully diverted, cluster exists via exact-sig edges
    val template = "alpha beta gamma delta epsilon zeta eta theta"
    val archive = (1L to 8L).map(i => (i, template)).toDF("doc_id", "text")
    val batch = Seq(
      (100L, template), // exact dup of the diverted family
      (101L, "completely novel content nothing shared here at all"))
      .toDF("doc_id", "text")
    val got = Dedup.assignToClusters(batch, archive, "text", "doc_id",
        maxBucket = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got(100L) == ((1L, true)), s"${got(100L)}")
    assert(got(101L) == ((101L, false)), s"${got(101L)}")
  }

  test("q_pack_dpo: pair count equals Σ floor(m/2) over (source, " +
    "bucket) computed independently, and every margin is nonnegative " +
    "(chosen is never the lower-quality doc)") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q_pack_dpo")(s, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.nonEmpty)
    out.values.foreach { case (np, margin) =>
      assert(np > 0 && margin >= 0L)
    }
    // independent pair count: bucket sizes via a straight groupBy
    val expected = s.read.parquet(s"$d/documents.parquet")
      .groupBy(col("source"), pmod(TextAnalysis.tokenHash(
        concat(col("doc_id").cast("string"), lit("#dpo"))), lit(8L)).as("b"))
      .agg(count(lit(1)).as("m"))
      .groupBy("source").agg(sum(floor(col("m") / 2)).as("np"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.view.mapValues(_._1).toMap == expected)
  }

  test("q_dedup_soft: total effective doc mass equals the cluster " +
    "count (Σ 1/sz over members telescopes to one per cluster)") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val eff = graft.SparkEntry.queries("q_dedup_soft")(s, d)
      .agg(sum(col("eff_docs"))).collect()(0).getDouble(0)
    val nClusters = graft.SparkEntry.queries("q_dedup_clusters")(s, d)
      .collect()(0).getAs[Long]("n_clusters")
    assert(math.abs(eff - nClusters) < 1e-3, s"$eff vs $nClusters")
  }

  test("kmvSetOps: a union that fits in k estimates EXACTLY (sketch = " +
    "set); a union that overflows k estimates within the ±1/√k band") {
    val s = spark
    import s.implicits._
    // groups: tiny (20 keys) ∪ tiny2 (20 keys, 10 shared) fits k=64;
    // big1/big2: 4000 keys each, 2000 shared — overflows k
    val rows =
      (1L to 20L).map(i => ("tinyA", i)) ++
      (11L to 30L).map(i => ("tinyB", i)) ++
      (1L to 4000L).map(i => ("big1", i * 2654435761L % 1000003L)) ++
      (2001L to 6000L).map(i => ("big2", i * 2654435761L % 1000003L))
    val df = rows.toDF("g", "k")
    val out = Sketches.kmvSetOps(df, col("g"),
        // spread keys over the 60-bit space via the portable hash
        graft.ops.TextAnalysis.tokenHash(col("k").cast("string")), 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val tiny = out(("tinyA", "tinyB"))
    assert(tiny.getAs[Double]("est_union") ==
      tiny.getAs[Long]("exact_union").toDouble)
    assert(tiny.getAs[Double]("est_inter") ==
      tiny.getAs[Long]("exact_inter").toDouble)
    val big = out(("big1", "big2"))
    val eu = big.getAs[Double]("est_union")
    val xu = big.getAs[Long]("exact_union").toDouble
    // 3σ ≈ 3/√64 = 37.5% relative error bound
    assert(math.abs(eu - xu) / xu < 0.375, s"est_union $eu vs $xu")
    val ei = big.getAs[Double]("est_inter")
    val xi = big.getAs[Long]("exact_inter").toDouble
    assert(math.abs(ei - xi) / xi < 0.5, s"est_inter $ei vs $xi")
  }

  test("chatTemplate: markers strip back to the original text, masked " +
    "+ unmasked = n, T ∈ {2,4} for n ≥ 4, and short docs render as a " +
    "single unmasked user turn") {
    val s = spark
    import s.implicits._
    val df = (Seq((1L, "a b"), (2L, ""), (3L, "x y z")) ++
      (10L to 60L).map(i =>
        (i, (1 to (i % 13 + 4).toInt).map(j => s"w${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), col("text"),
        Sampling.chatTemplate(col("text"), col("doc_id")).as("c"))
      .select(col("doc_id"), col("text"), col("c.t"), col("c.masked"),
        col("c.rendered"))
      .collect()
    out.foreach { r =>
      val (id, text, t, masked, rend) =
        (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
          r.getString(4))
      val n = if (text.isEmpty) 1 else text.split(" ", -1).length
      // roundtrip: dropping markers recovers the original tokens
      val stripped = rend.split(" ", -1)
        .filterNot(w => w == "<|user|>" || w == "<|assistant|>" || w == "<|eos|>")
        .mkString(" ")
      assert(stripped == text, s"doc $id roundtrip")
      if (n >= 4) {
        assert(t == 2 || t == 4, s"doc $id t=$t")
        // every turn's marker present the right number of times
        assert(rend.split(" ").count(_ == "<|user|>") == t / 2)
        assert(rend.split(" ").count(_ == "<|assistant|>") == t / 2)
        // mask partitions the tokens: assistant turns hold the rest
        val userToks = (0 until t by 2).map(i =>
          ((i + 1) * n) / t - (i * n) / t).sum
        assert(masked + userToks == n, s"doc $id mask arithmetic")
        assert(masked >= 1, s"doc $id has an empty assistant span")
      } else {
        assert(t == 1 && masked == 0L, s"doc $id short-doc contract")
        assert(rend == s"<|user|> $text <|eos|>")
      }
    }
  }
}
