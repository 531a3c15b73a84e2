package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Edge semantics for the sketch/sampling family: empty inputs,
  * null/NaN measurements, disjoint-group set algebra, weight domain. */
class SketchEdgeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("bottomKOverlap: exact when k >= |union| (the estimator " +
    "degrades to exact set Jaccard), close for k < |union|, and " +
    "repeated keys never eat signature slots") {
    val s = spark
    import s.implicits._
    // A = {0..599}, B = {300..899}: |A∩B| = 300, |A∪B| = 900, J = 1/3.
    // Keys are scrambled via a multiplicative hash so the bottom-k is
    // a uniform sample, and EVERY key appears 3x (distinctness).
    def h(i: Long) = (i * 2654435761L) % 1000003L
    val rows = (0 until 600).flatMap(i => Seq.fill(3)(("A", h(i)))) ++
      (300 until 900).flatMap(i => Seq.fill(3)(("B", h(i))))
    val df = rows.toDF("g", "k")
    val exact = Sketches.bottomKOverlap(df, col("g"), col("k"), 1024)
      .collect().head
    assert(exact.getAs[Long]("n_a") == 600 &&
      exact.getAs[Long]("n_b") == 600, s"$exact")
    assert(exact.getAs[Long]("k_used") == 900, s"$exact")
    assert(exact.getAs[Long]("n_inter") == 300, s"$exact")
    assert(exact.getAs[Double]("est_jaccard") == 0.33333, s"$exact")
    val est = Sketches.bottomKOverlap(df, col("g"), col("k"), 128)
      .collect().head
    assert(est.getAs[Long]("k_used") == 128, s"$est")
    val j = est.getAs[Double]("est_jaccard")
    // ±~3/sqrt(128) tolerance band around 1/3
    assert(j > 0.33333 - 0.27 && j < 0.33333 + 0.27, s"est J = $j")
  }

  test("hllSetAlgebra reports EVERY group pair — two small groups " +
    "sharing zero registers get inter_est ~ 0, not a missing row") {
    val s = spark
    import s.implicits._
    // two singleton groups: whp their single keys hash to different
    // buckets, plus a third larger group
    val df = Seq(("a", "k1"), ("b", "zzz9"), ("c", "x1"), ("c", "x2"),
      ("c", "x3")).toDF("g", "k")
    val regs = Sketches.hllRegistersBy(df, col("g"), col("k"))
    val out = Sketches.hllSetAlgebra(regs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(5))).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")),
      s"all 3 pairs required: ${out.keySet}")
    val (ca, cb, inter) = out(("a", "b"))
    assert(ca > 0.5 && ca < 2.0 && cb > 0.5 && cb < 2.0)
    assert(inter >= 0.0 && inter < 1.0, s"disjoint pair: $inter")
  }

  test("null keys are not set elements: the estimate matches the " +
    "null-free input and an all-null group estimates ~ 0 rows absent") {
    val s = spark
    import s.implicits._
    val withNulls = Seq(("g", Option("a")), ("g", Option("b")),
      ("g", None: Option[String])).toDF("grp", "k")
    val clean = Seq(("g", "a"), ("g", "b")).toDF("grp", "k")
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllCardinalityBy(df, col("grp"), col("k"))
        .select("hll_estimate").head().getDouble(0)
    assert(est(withNulls) == est(clean))
  }

  test("amsF2 and histogramQuantiles on empty input return EMPTY " +
    "frames (the global agg row would crash element_at under ANSI)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "k")
    val sketch = Sketches.amsBuild(empty, col("k"))
    assert(Sketches.amsF2(sketch).count() == 0)
    val emptyD = Seq.empty[(Long, Double)].toDF("id", "x")
    assert(Sketches.histogramQuantiles(emptyD, col("x"), 0, 10, 8,
      Seq(0.5)).count() == 0)
  }

  test("amsJoinSize estimates the exact equi-join cardinality " +
    "within the AGMS error bound on a skewed multiset pair, is " +
    "symmetric, and degenerates to amsF2 on identical sides") {
    val s = spark
    import s.implicits._
    // skewed multiplicities: key i appears i times on side A,
    // (11 - i) times on side B -> exact join = sum i * (11 - i)
    val a = (1 to 10).flatMap(i => Seq.fill(i)(s"k$i")).toDF("k")
    val b = (1 to 10).flatMap(i => Seq.fill(11 - i)(s"k$i")).toDF("k")
    val exact = (1 to 10).map(i => i * (11 - i)).sum.toDouble
    val skA = Sketches.amsBuild(a, col("k"))
    val skB = Sketches.amsBuild(b, col("k"))
    val est = Sketches.amsJoinSize(skA, skB)
      .head().getDouble(0)
    // depth 4 / width 64 on 10 keys: collisions are rare, the
    // estimate lands well within 3x the F2-bound band
    assert(math.abs(est - exact) <= 0.5 * exact,
      s"est $est vs exact $exact")
    val sym = Sketches.amsJoinSize(skB, skA).head().getDouble(0)
    assert(sym == est)
    val self = Sketches.amsJoinSize(skA, skA).head().getDouble(0)
    val f2 = Sketches.amsF2(skA).head().getDouble(0)
    assert(self == f2)
  }

  test("amsJoinSize zero-fills depth rows with no overlapping cells: " +
    "disjoint key sets estimate 0.0 instead of misaligning the " +
    "median or throwing under ANSI element_at") {
    val s = spark
    import s.implicits._
    // disjoint singletons: every (r, p) cell pair misses, so the
    // inner join on (r, p) yields NO depth rows at all
    val skA = Sketches.amsBuild(Seq("only_a").toDF("k"), col("k"))
    val skB = Sketches.amsBuild(Seq("only_b").toDF("k"), col("k"))
    val est = Sketches.amsJoinSize(skA, skB).collect()
    assert(est.length == 1 && est(0).getDouble(0) == 0.0, est.toSeq)
    // partial overlap small enough that some depth rows can still
    // miss: the median must come from a FULL depth-length array
    // (exactly depth elements after the zero-fill)
    val skC = Sketches.amsBuild(Seq("shared", "only_c").toDF("k"),
      col("k"))
    val skD = Sketches.amsBuild(Seq("shared").toDF("k"), col("k"))
    val cd = Sketches.amsJoinSize(skC, skD).head().getDouble(0)
    // |C join D| = 1; with depth 4 / width 64 on 2 keys the unbiased
    // per-row products are in {-1, 0, 1, 2}: the median is bounded
    assert(cd >= -1.0 && cd <= 2.0, cd)
  }

  test("NaN and null measurements are excluded from histograms " +
    "instead of counting as bucket-0 / null-bucket mass") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1.0), Some(9.0), None, Some(Double.NaN))
      .toDF("x")
    val h = Sketches.histogram(df, col("x"), 0, 10, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(1L -> 1L, 9L -> 1L), s"$h")
  }

  test("quantile labels are distinct and stable: p50/p90 unchanged, " +
    "sub-percent quantiles get their own names") {
    assert(Sketches.quantileLabel(0.5) == "p50")
    assert(Sketches.quantileLabel(0.9) == "p90")
    assert(Sketches.quantileLabel(0.995) == "p99_5")
    assert(Sketches.quantileLabel(0.25) == "p25")
    assert(Sketches.quantileLabel(0.2549) == "p25_49")
    assert(Sketches.quantileLabel(0.29) == "p29")
  }

  test("sampleWeighted raises on non-positive weights instead of " +
    "silently promoting the worst rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2.0), (2L, -0.5)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.sampleWeighted(df, "id", col("w"), 1).collect()
    }
    assert(e.getMessage.contains("weight must be > 0") ||
      Option(e.getCause).exists(_.getMessage.contains("weight must be > 0")))
    val ok = Sampling.sampleWeighted(df.where(col("w") > 0), "id",
      col("w"), 1).collect()
    assert(ok.length == 1 && ok.head.getLong(0) == 1L)
  }
}
