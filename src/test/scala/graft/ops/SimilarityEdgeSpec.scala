package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Degenerate-input semantics and new-kernel equivalence for the
  * similarity ops: zero-norm embeddings (NaN cosine), null vectors,
  * and the multi-probe cell kernel. */
class SimilarityEdgeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def vecs(rows: (Long, Seq[Double])*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("a zero-norm embedding never poisons top-1 (NaN would rank " +
    "above every real cosine) and never emits near-dup pairs") {
    val df = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.9, 0.1),
      3L -> Seq(0.0, 0.0))
    val top1 = Similarity.cosineTop1(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // 1 and 2 pick each other (~0.994), never NaN from vector 3
    assert(top1(1L).exists(c => c > 0.9 && c <= 1.0), s"$top1")
    assert(top1(2L).exists(c => c > 0.9 && c <= 1.0), s"$top1")
    // the zero vector itself has no direction: all its cosines are
    // null, so its max is null
    assert(top1(3L).isEmpty, s"$top1")
    val pairs = Similarity.cosineNearDups(df, "vec_id", "embedding",
      threshold = 0.5, exact = true).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)), "zero vector must not pair with anyone")
    val ann = Similarity.annTop1(df, "vec_id", "embedding", nBits = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(!ann.values.exists(_.exists(_.isNaN)), s"$ann")
  }

  test("hardNegativeTriplets rejects non-numeric ids fast (the -id " +
    "argmax trick would silently null them)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.hardNegativeTriplets(df, "vec_id", "embedding", 0.9)
    }
    assert(e.getMessage.contains("numeric id"))
  }

  test("NearestCellsExpr == the array_sort spec for every probe count, " +
    "including ties broken by centroid id") {
    val s = spark
    import s.implicits._
    val cents = Array(0L -> Seq(0.0, 0.0), 1L -> Seq(1.0, 0.0),
      2L -> Seq(0.0, 1.0), 3L -> Seq(1.0, 1.0), 4L -> Seq(1.0, 0.0))
    // centroids 1 and 4 are identical → every query ties them; the
    // (dist, cid) order must pick 1 before 4
    val df = (1L to 40L).map(i =>
      (i, Seq(math.sin(i.toDouble) * 1.5, math.cos(i.toDouble * 0.7))))
      .toDF("vec_id", "embedding")
    for (probes <- 1 to 5) {
      def canon(r: org.apache.spark.sql.DataFrame) =
        r.select("vec_id", "cell").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val kernel = canon(Similarity.probeCellsForTest(df, "vec_id",
        "embedding", cents, probes))
      val spec = canon(Similarity.withProbesSpec(df, "vec_id",
        "embedding", cents, probes))
      assert(kernel == spec, s"probes=$probes")
      assert(kernel.size == 40 * probes)
    }
  }

  test("fused VecCosineOrNull == the composed three-kernel spec on " +
    "regular, zero-norm, NaN-element, null, and unequal-length inputs " +
    "(double AND float element types)") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Long, Seq[Double], Seq[Double])] = Seq(
      (1L, Seq(1.0, 2.0, -3.0), Seq(0.5, -0.25, 1.0)),
      (2L, Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)), // zero norm → null
      (3L, Seq(1.0, Double.NaN, 2.0), Seq(1.0, 1.0, 1.0)), // NaN → null
      (4L, Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0)), // common prefix
      (5L, null, Seq(1.0, 0.0, 0.0)), // null input → null
      (6L, Seq(1e-8, 0.0, 0.0), Seq(0.0, 1e-8, 0.0))) // tiny but valid
    def check(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(col("id"),
        Similarity.cosineOrNull(col("a"), col("b")).as("k"),
        Similarity.cosineOrNullSpec(col("a"), col("b")).as("s"))
        .collect().foreach { r =>
          assert(r.isNullAt(1) == r.isNullAt(2), s"id=${r.getLong(0)}")
          if (!r.isNullAt(1))
            assert(java.lang.Double.compare(r.getDouble(1),
              r.getDouble(2)) == 0, s"id=${r.getLong(0)}")
        }
    check(rows.toDF("id", "a", "b"))
    check(rows.toDF("id", "a", "b").select(col("id"),
      col("a").cast("array<float>").as("a"),
      col("b").cast("array<float>").as("b")))
  }

  test("lshBucketSpec matches the kernel on null embeddings (both " +
    "null) — a null row vanishes from bucket joins identically") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(0.5, -0.25, 1.0)), (2L, null))
      .toDF("vec_id", "embedding")
    val both = df.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 4).as("k"),
      Similarity.lshBucketSpec(col("embedding"), 4).as("s")).collect()
    both.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2))
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(2))
    }
    assert(both.count(_.isNullAt(1)) == 1)
  }

  test("bitextMine: the ratio margin suppresses hubs (a vector close " +
    "to EVERYTHING margins ~1; a genuinely aligned pair margins high) " +
    "and the mining is deterministic") {
    val s = spark
    import s.implicits._
    // 64-d crowd sharing a dominant lean direction (dim 0, weight 3 —
    // so every sign-hyperplane bucket agrees and the bucket join sees
    // all cross pairs): x0 (side 0) is EXACTLY y0 (side 1) — a true
    // translation pair; x1..x3 only ever match at crowd similarity.
    // The ratio margin separates them: the aligned pair scores
    // 1/avgK > 1, the crowd pairs score cos below their own kNN
    // average (< 1) — the hubness suppression a raw cosine threshold
    // lacks (all the cosines here are a close .9 vs 1.0).
    def unit(main: Int): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      v(main) = 1.0
      v(0) += 3.0
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val rows = Seq(
      (0L, unit(5), 0),
      (1L, unit(1), 0), (2L, unit(2), 0), (3L, unit(3), 0),
      (10L, unit(5), 1), // y0 == x0 exactly
      (11L, unit(4), 1))
      .toDF("vec_id", "embedding", "side")
    val mined = Similarity.bitextMine(rows, "vec_id", "embedding",
      "side", k = 2, nBits = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(5))).toMap
    // the true pair: best match is the exact copy, margin 1/.95 ≈ 1.05
    assert(mined(0L)._1 == 10L && mined(0L)._2 > 1.03, s"$mined")
    // crowd vectors: cos .9 below their own kNN average -> margin < 1
    Seq(1L, 2L, 3L).foreach { x =>
      assert(mined(x)._2 < 1.0,
        s"crowd pair must margin below 1: $mined")
    }
    val again = Similarity.bitextMine(rows, "vec_id", "embedding",
      "side", k = 2, nBits = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(5))).toMap
    assert(again == mined)
  }
}
