package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the pre-shuffle: tables bucketed on the join key join
  * with NO exchange on either side — the co-located-join layout a 100
  * TB corpus would persist once and join against many times (doc ids ↔
  * quality/dedup/embedding side tables). */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("bucketed co-located join has no shuffle exchange; the " +
    "unbucketed control does") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text")
    docs.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_docs_b")
    docs.select(col("doc_id"),
        graft.ops.TextAnalysis.qualityScore(col("text")).as("q"))
      .write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_quality_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the probe is the JOIN alone: bucketed layout must make it
      // exchange-free end to end (a later groupBy on another key
      // shuffles by design, so keep it out of the asserted plan)
      val j = spark.table("graft_docs_b")
        .join(spark.table("graft_quality_b"), "doc_id")
        .select("doc_id", "source", "q")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"),
        "scan did not use the bucketed layout")

      // control: the same join over raw parquet must shuffle
      val qual = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.qualityScore(col("text")).as("q"))
      val ctrl = docs.join(qual, "doc_id")
        .select("doc_id", "source", "q")
      ctrl.collect()
      val ctrlPlan = ctrl.queryExecution.executedPlan.toString
      assert(ctrlPlan.contains("Exchange"),
        "control join unexpectedly shuffle-free — test has no teeth")

      // and the results agree
      def summarize(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("source").agg(count(lit(1)).as("n"),
            round(avg("q"), 5).as("avg_q"))
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(summarize(j) == summarize(ctrl))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_docs_b")
      spark.sql("DROP TABLE IF EXISTS graft_quality_b")
    }
  }
}
