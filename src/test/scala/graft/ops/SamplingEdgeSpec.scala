package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The two memory-documented domain contracts of the per-group
  * sampling family, pinned as tests (they were previously risk notes):
  * null-group join semantics and the topQuantileByGroup all-below-lo
  * group domain. Both behaviors are shared verbatim with the DuckDB
  * oracles (USING joins drop nulls identically), so these tests are
  * the cross-engine contract, not just implementation detail. */
class SamplingEdgeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "grp", "score")
  }

  test("null-group contract: temperatureSample DROPS null-group rows " +
    "(rate join), stratifiedSample applies defaultRate to them " +
    "(when-chain) — the documented asymmetry") {
    val df = docs(
      (1L, "a", 0.5), (2L, "a", 0.6), (3L, "a", 0.7), (4L, "a", 0.8),
      (5L, null, 0.5), (6L, null, 0.6))
    // rate 1.0 everywhere: survival is decided purely by the group
    // plumbing, not the hash draw
    val temp = Sampling.temperatureSample(df, "id", "grp",
      alpha = 1.0, targetRows = 1e9)
    assert(temp.where(col("grp").isNull).count() == 0,
      "null groups must never match the per-group rate join")
    assert(temp.count() == 4)
    val strat = Sampling.stratifiedSample(df, "id", "grp",
      Map("a" -> 1.0), defaultRate = 1.0)
    assert(strat.where(col("grp").isNull).count() == 2,
      "when-chain path must give null groups the default rate")
    val stratNone = Sampling.stratifiedSample(df, "id", "grp",
      Map("a" -> 1.0), defaultRate = 0.0)
    assert(stratNone.where(col("grp").isNull).count() == 0)
  }

  test("topQuantileByGroup drops null-group rows entirely (threshold " +
    "join semantics)") {
    val df = docs(
      (1L, "a", 0.1), (2L, "a", 0.5), (3L, "a", 0.9), (4L, "a", 0.95),
      (5L, null, 0.99), (6L, null, 0.98))
    val kept = Sampling.topQuantileByGroup(df, "grp", "score",
      q = 0.5, lo = 0.0, hi = 1.0, nBuckets = 64)
    assert(kept.where(col("grp").isNull).count() == 0,
      "null groups never match the per-group threshold join")
    assert(kept.where(col("grp") === "a").count() > 0)
  }

  test("topQuantileByGroup all-below-lo domain: a group whose scores " +
    "ALL lie below lo clamps into bucket 0 and is dropped entirely " +
    "(threshold interpolates >= lo > every score) — choose lo at or " +
    "below the score floor") {
    val df = docs(
      // group 'low': every score below lo = 0.0
      (1L, "low", -3.0), (2L, "low", -2.0), (3L, "low", -1.0),
      // group 'ok': in-range scores, must survive normally
      (4L, "ok", 0.2), (5L, "ok", 0.6), (6L, "ok", 0.9))
    val kept = Sampling.topQuantileByGroup(df, "grp", "score",
      q = 0.5, lo = 0.0, hi = 1.0, nBuckets = 64)
    assert(kept.where(col("grp") === "low").count() == 0,
      "all-below-lo group must drop entirely (the documented domain)")
    assert(kept.where(col("grp") === "ok").count() > 0)
    // with lo chosen at the score floor the same group participates
    val keptLo = Sampling.topQuantileByGroup(df, "grp", "score",
      q = 0.5, lo = -3.0, hi = 1.0, nBuckets = 64)
    assert(keptLo.where(col("grp") === "low").count() > 0,
      "lo at the score floor restores within-group ranking")
  }
}
