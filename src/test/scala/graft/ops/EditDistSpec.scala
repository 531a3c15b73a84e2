package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9b ops: edit-distance-verified pairs, χ² independence, and
  * windowed histogram quantiles — semantics pinned on fixtures with
  * hand-computed expectations. */
class EditDistSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Textbook Levenshtein for the spec side. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("editVerifiedPairs: planted near-dup family is found with the " +
    "exact Levenshtein distance; unrelated docs produce no pair") {
    // two docs one substitution apart (token sets overlap enough for
    // the band join), one unrelated doc
    val base = "query line sort key agg table part window stream merge " +
      "big customer join scan value data column filter group batch"
    val nearA = base
    val nearB = base.replace("sort", "sorz")
    val other = "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii " +
      "hh gg"
    val df = Seq((1L, nearA), (2L, nearB), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.editVerifiedPairs(df, "text", "doc_id",
      maxBucket = 10, prefixLen = 120)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    val expected = lev(nearA.take(120), nearB.take(120))
    assert(pairs.head._3 === expected)
    // Spark's builtin agrees with the textbook DP on the full strings
    val sLev = Seq((nearA, nearB)).toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).head().getInt(0)
    assert(sLev === lev(nearA, nearB))
  }

  test("q_stats_chisq computes the textbook chi-square on a known " +
    "2x2 contingency table (n(ad-bc)^2 / marginals = 20/3)") {
    val tmp = java.nio.file.Files.createTempDirectory("chisq").toString
    val rows = Seq.fill(10)(("A", "x")) ++ Seq.fill(20)(("A", "y")) ++
      Seq.fill(20)(("B", "x")) ++ Seq.fill(10)(("B", "y"))
    rows.zipWithIndex
      .map { case ((s0, l0), i) => (i.toLong, s"t $i", l0, s0, 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val r = graft.SparkEntry.queries("q_stats_chisq")(spark, tmp).head()
    assert(r.getAs[Long]("n") === 60L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Long]("n_cells") === 4L)
    assert(math.abs(r.getAs[Double]("chisq") - 20.0 / 3.0) < 1e-4)
  }

  test("histogramQuantilesBy on one group equals the ungrouped " +
    "histogramQuantiles (the By axis adds nothing at group count 1)") {
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.toDF("v").withColumn("g", lit("only"))
    val by = Sketches.histogramQuantilesBy(df, col("g"), col("v"),
      lo = 0.0, hi = 512.0, nBuckets = 64, qs = Seq(0.5, 0.9)).head()
    val un = Sketches.histogramQuantiles(df, col("v"),
      lo = 0.0, hi = 512.0, nBuckets = 64, qs = Seq(0.5, 0.9)).head()
    assert(by.getAs[Long]("n") === 100L)
    assert(by.getAs[Double]("p50") === un.getAs[Double]("p50"))
    assert(by.getAs[Double]("p90") === un.getAs[Double]("p90"))
    assert(by.getAs[Double]("p50") <= by.getAs[Double]("p90"))
  }
}
