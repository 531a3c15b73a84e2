package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The inference engine trains a Bayesian logistic regression over
  * the deterministic text features, and the trained posterior scores
  * the corpus in one scan — end-to-end across both halves of the
  * library. */
class QualityClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("trains to separate quality classes, tightens the posterior, " +
    "and the tape scoring sweep equals the Column scoring map") {
    // distill the (near-linearly-separable) composite quality
    // threshold so a linear classifier can genuinely learn it
    val rule = TextAnalysis.qualityScore(col("text")) >= 0.7
    val data = QualityClassifier.withLabel(
      QualityClassifier.withFeatures(docs, "text"), "text", rule)
      .select("doc_id", "f_len", "f_stop", "f_punct", "f_wl", "label")
      .cache()
    val classes = data.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(classes.keySet == Set(0.0, 1.0) && classes.values.forall(_ > 50),
      s"fixture must have both classes in bulk: $classes")

    val trained = QualityClassifier.train(data, maxiter = 600, lr = 0.05)
    val w = trained.meanWeights
    assert(w.length == 5 && w.forall(java.lang.Double.isFinite))

    // posterior-mean scores separate the classes
    val scored = data.withColumn("score", QualityClassifier.score(w))
    val acc = scored.where((col("score") >= 0.5) === (col("label") === 1.0))
      .count().toDouble / data.count()
    assert(acc >= 0.8, s"posterior-mean accuracy $acc below floor")
    val sep = scored.groupBy("label").agg(avg("score").as("s"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(sep(1.0) > sep(0.0) + 0.2,
      s"scores must separate the classes: $sep")

    // the data was informative where the signal lives: the bias and
    // the dominant features tighten well below the Normal(0,1)
    // anchor; weakly-identified directions may stay near the prior
    // (that is the point of being Bayesian), but none should inflate
    val scales = trained.scaleWeights
    assert(scales(0) < 0.5 && scales.min < 0.3,
      s"posterior scales ${scales.toSeq} did not shrink")
    assert(scales.forall(_ < 1.2),
      s"posterior scales ${scales.toSeq} inflated past the prior")

    // the mapPartitions tape sweep (draws = 0 -> posterior mean) and
    // the pure-Column scoring map are the same function
    val viaTape = trained.attachScore(data, "tape_score")
      .select("doc_id", "tape_score")
    val both = scored.select(col("doc_id"), col("score"))
      .join(viaTape, "doc_id")
      .select(abs(col("score") - col("tape_score")).as("d"))
      .agg(max("d")).as[Double].head()
    assert(both < 1e-9, s"tape vs Column scoring drift: $both")
  }
}
