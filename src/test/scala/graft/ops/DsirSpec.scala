package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling: weights favor target-like documents,
  * the resample shifts the mix toward the target domain, and the
  * weighting stage is a pure map (no join, no exchange). */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("importance weights separate target from raw and the resample " +
    "shifts the mix toward the target domain") {
    val d = docs.cache()
    val target = col("source") === "src0"
    val ratios = Dsir.logRatios(d, "text", target)
    val w = Dsir.importanceWeights(d, "text", ratios).cache()
    val byIsTarget = w.groupBy(target.as("t"))
      .agg(avg(col("log_w") / col("n_feats")).as("aw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byIsTarget(true) > byIsTarget(false),
      s"target docs must score higher per-feature: $byIsTarget")
    // resampling at n = quarter corpus: the target-source share among
    // selected docs must exceed its share in the corpus
    val n = (d.count() / 4).toInt
    val sel = Dsir.resample(w, "doc_id", n).cache()
    val selShare = sel.where(target).count().toDouble / n
    val rawShare = d.where(target).count().toDouble / d.count()
    assert(selShare > rawShare,
      s"selected target share $selShare must exceed corpus $rawShare")
    // deterministic: the same call selects the same set
    val again = Dsir.resample(w, "doc_id", n)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sel.select("doc_id").as[Long].collect().toSet)
  }

  test("weighting is a pure one-scan map (ratio table inlined — no " +
    "join or exchange) and selection plans as TakeOrdered") {
    val ratios = Array.tabulate(Dsir.NumBuckets)(b => (b % 7) * 0.01)
    val w = Dsir.importanceWeights(docs, "text", ratios)
    val wPlan = w.queryExecution.executedPlan.toString
    assert(!wPlan.contains("Exchange") && !wPlan.contains("Join"),
      s"weighting must not shuffle or join:\n$wPlan")
    val sel = Dsir.resample(w, "doc_id", 10)
    sel.collect()
    assert(sel.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "resample must plan as per-partition top-n")
  }

  test("native bucket and weight kernels equal the composable specs " +
    "bit for bit on the fixture corpus") {
    val diff = docs.select(
        Dsir.bucketList(col("text")).as("k"),
        Dsir.bucketListSpec(col("text")).as("s"))
      .where(not(col("k") <=> col("s")))
      .count()
    assert(diff == 0, s"$diff docs disagree between kernel and spec")
    val ratios = Array.tabulate(Dsir.NumBuckets)(b => (b % 13) * 0.03 - 0.15)
    val kern = Dsir.importanceWeights(docs, "text", ratios)
      .select("doc_id", "log_w", "n_feats").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val spec = Dsir.importanceWeightsSpec(docs, "text", ratios)
      .select("doc_id", "log_w", "n_feats").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(kern == spec, "fused weight kernel must equal the fold spec")
  }

  test("empty text is one empty token (the shared whitespace-split " +
    "convention); single-token docs keep exactly one unigram feature") {
    val rows = Seq((1L, ""), (2L, "merge"), (3L, "merge sort"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(rows, "text",
      Array.fill(Dsir.NumBuckets)(0.5))
    val got = w.select("doc_id", "n_feats").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L, "empty string -> the single '' token")
    assert(got(2L) == 1L, "one token -> one unigram, no bigram")
    assert(got(3L) == 3L, "two tokens -> two unigrams + one bigram")
    // log_w is feature count x 0.5 under the flat ratio table
    val lw = w.where(col("doc_id") === 3L).select("log_w")
      .as[Double].head()
    assert(math.abs(lw - 1.5) < 1e-12)
  }
}
