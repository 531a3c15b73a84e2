package graft.ops

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics contracts for the governance/uncertainty queries on
  * PLANTED corpora (the oracle rows pin exact values on the driver
  * testdata; these fixtures pin the *decision boundaries*): forget-
  * propagation must promote the best survivor exactly when the
  * canonical is removed, report a cluster lost exactly when every
  * member is removed, and a constant corpus must collapse the
  * bootstrap CI to the point estimate. */
class ForgetSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Writes a documents.parquet under a fresh temp dir and returns
    * the dir (the query contract takes a testdata directory). */
  private def corpus(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val dir = java.nio.file.Files
      .createTempDirectory("forget_fixture").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_pipeline_forget: canonical-removed promotes the best " +
    "survivor; fully-removed clusters are lost; untouched clusters " +
    "keep their canonical") {
    // removal list = doc_id % 17 == 3 -> {3, 20, 37, 54}
    val dupA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val dupB = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val dupC = "one two three four five six seven eight nine ten"
    val rows = Seq(
      // promote cluster: canonical 3 (max chars) removed -> 5 promoted
      (3L, dupA, "en", "s0", 100L),
      (5L, dupA, "en", "s0", 90L),
      (6L, dupA, "en", "s0", 80L),
      // lost singleton
      (20L, "unique text about removal requests and nothing else at all",
        "en", "s0", 60L),
      // lost pair: both members removed
      (37L, dupB, "en", "s1", 70L),
      (54L, dupB, "en", "s1", 70L),
      // untouched cluster: canonical 1 survives
      (1L, dupC, "en", "s1", 50L),
      (2L, dupC, "en", "s1", 50L),
      // untouched singletons
      (7L, "completely different words live here in this tiny document",
        "en", "s2", 58L),
      (8L, "yet another standalone sentence with its own vocabulary set",
        "en", "s2", 59L))
    val dir = corpus(rows)
    val r = SparkEntry.queries("q_pipeline_forget")(spark, dir).head()
    assert(r.getAs[Long]("n_requested") == 4L)
    assert(r.getAs[Long]("n_touched") == 3L)
    assert(r.getAs[Long]("n_lost") == 2L)
    assert(r.getAs[Long]("n_promoted") == 1L)
    // clusters {3,5,6} {20} {37,54} {1,2} {7} {8}: 4 survive removal
    assert(r.getAs[Long]("n_kept_after") == 4L)
    // new canonicals: 5 (promoted), 1, 7, 8
    assert(r.getAs[Long]("keep_id_sum_after") == 21L)
  }

  test("q_stats_bootstrap: a constant corpus collapses every " +
    "replicate mean to the constant — CI == point estimate") {
    val rows = (0L until 40L).map(i =>
      (i, s"doc number $i", "en", "s0", 250L))
    val dir = corpus(rows)
    val r = SparkEntry.queries("q_stats_bootstrap")(spark, dir).head()
    assert(r.getAs[Double]("mean_pt") == 250.0)
    assert(r.getAs[Double]("ci_lo") == 250.0)
    assert(r.getAs[Double]("ci_hi") == 250.0)
    assert(r.getAs[Long]("n_docs") == 40L)
  }

  test("q_stats_bootstrap: CI brackets the point estimate and has " +
    "positive width on a spread corpus") {
    val rows = (0L until 200L).map(i =>
      (i, s"doc number $i", "en", "s0", 100L + 3L * (i % 100)))
    val dir = corpus(rows)
    val r = SparkEntry.queries("q_stats_bootstrap")(spark, dir).head()
    val (lo, pt, hi) = (r.getAs[Double]("ci_lo"),
      r.getAs[Double]("mean_pt"), r.getAs[Double]("ci_hi"))
    assert(lo < pt && pt < hi, s"CI [$lo, $hi] must bracket $pt")
    assert(hi - lo < 60.0, "CI implausibly wide for n=200, sd~87")
  }

  test("q_stats_kappa: agreement beyond chance on a length-bucketed " +
    "corpus; bounded by definition") {
    // spread across all three buckets so chance agreement is low
    val rows = (0L until 120L).map(i =>
      (i, s"doc number $i", "en", s"s${i % 2}", 60L + 4L * (i % 120)))
    val dir = corpus(rows)
    val rs = SparkEntry.queries("q_stats_kappa")(spark, dir).collect()
    assert(rs.length == 2)
    rs.foreach { r =>
      val (pb, pe, k) = (r.getAs[Double]("p_bar"),
        r.getAs[Double]("p_exp"), r.getAs[Double]("kappa"))
      assert(pb >= 0.0 && pb <= 1.0 && pe >= 0.0 && pe <= 1.0)
      assert(k > 0.2 && k <= 1.0,
        s"80%-faithful raters must agree well beyond chance, got $k")
    }
  }
}
