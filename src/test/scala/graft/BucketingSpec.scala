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

  test("incremental-ingest dedup against a PERSISTED bucketed archive " +
    "signature table: the anti-join reads the archive without " +
    "re-signaturing or shuffling it, and matches the recomputed path") {
    import graft.ops.Dedup
    val sigCols = (0 until Dedup.NumPerms).map(i => s"sig$i")
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // steady state: the archive's DISTINCT signature set is bucketed
    // on the full signature ONCE at ingest time
    Dedup.minhashSignatures(corpus, "text", "doc_id")
      .select(sigCols.map(col): _*).distinct()
      .write.mode("overwrite")
      .bucketBy(8, sigCols.head, sigCols.tail: _*)
      .saveAsTable("graft_archive_sigs_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      // a batch: half re-ingested dups, half genuinely new docs
      val dups = corpus.limit(10)
      val fresh = (1 to 10).map(i =>
        (800000L + i, s"entirely fresh batch document number $i with words"))
        .toDF("doc_id", "text")
      val batch = dups.unionByName(fresh)
      val survivors = Dedup.minhashSignatures(batch, "text", "doc_id")
        .join(spark.table("graft_archive_sigs_b"), sigCols, "left_anti")
      survivors.collect()
      val plan = survivors.queryExecution.executedPlan.toString
      // the archive side: bucketed scan with no exchange above it —
      // only the (tiny) batch side shuffles to align with the buckets.
      // Probe: the same anti-join against an UNBUCKETED copy of the
      // same signatures needs strictly more exchanges (the archive
      // re-shuffle the bucketed layout amortizes away).
      assert(plan.contains("Bucketed: true"),
        s"archive signatures not read from the bucketed layout:\n$plan")
      spark.table("graft_archive_sigs_b").write.mode("overwrite")
        .saveAsTable("graft_archive_sigs_plain")
      val ctrl = Dedup.minhashSignatures(batch, "text", "doc_id")
        .join(spark.table("graft_archive_sigs_plain"), sigCols, "left_anti")
      ctrl.collect()
      val nEx = "Exchange".r.findAllIn(plan).size
      val nExCtrl = "Exchange".r
        .findAllIn(ctrl.queryExecution.executedPlan.toString).size
      assert(nEx < nExCtrl,
        s"bucketed archive saved no exchanges ($nEx vs $nExCtrl)")
      // correctness: identical to anti-joining freshly recomputed
      // archive signatures
      val want = Dedup.newAgainstCorpus(batch, corpus, "text", "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val got = survivors.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(got == want)
      assert(got.forall(_ >= 800000L) && got.size == 10,
        s"expected exactly the fresh docs to survive, got $got")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_archive_sigs_b")
      spark.sql("DROP TABLE IF EXISTS graft_archive_sigs_plain")
    }
  }
}
