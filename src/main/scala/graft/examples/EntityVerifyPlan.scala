package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dumps the .explain("formatted") of the τ=2 VERIFIED-EDGE subplan
  * (candidatePairsSplit2 + the two name-verify joins) — the stage
  * that runs EAGERLY inside the CC closure and is therefore invisible
  * in the registered queries' committed plan dumps. r14 optimization
  * evidence for the verify-join strategy (SMJ → shuffle-hash).
  * Usage: runMain graft.examples.EntityVerifyPlan <suffix> */
object EntityVerifyPlan {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "now"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("k"), col("c_name"),
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"))
    val rec = base.select((col("k") * 2).as("rid"),
        col("c_name").as("name"), col("nat"), col("seg"))
      .unionByName(base.select((col("k") * 2 + 1).as("rid"),
        col("c_name").as("name"), col("nat"), col("seg")))
      .withColumn("key", substring(col("name"), 10, 10))
    val cand = graft.ops.Entity.candidatePairsSplit2(
      rec, "rid", "key", Seq("nat", "seg"))
    val names = rec.select(col("rid"), col("name"))
    // mirror Entity.resolveWith's verify stage — keep in sync with
    // that method. The r14 shuffle_hash experiment on these joins
    // was REJECTED: the dumped plan (entity_verify_join.txt) shows
    // the planner already BROADCASTS the name side at bench scale,
    // which the hint would forcibly downgrade to SHJ + two extra
    // exchanges of the candidate-pair side; at the 100x fixture
    // (names past the broadcast threshold, SMJ vs hinted SHJ) the
    // delta measured only ~6% inside noisy regimes (129 vs 137 s
    // min-of-3) — not worth losing the small-scale broadcast
    // (entity_verify_join_shj_rejected.txt is the hinted plan).
    // r15: mirror resolveWith's size-gated shuffle_hash hint (the
    // quiesced 100x A/B in VerifyJoinAB reads SHJ ~5% faster once the
    // name side is past broadcast; below the gate the plan here shows
    // the broadcast the gate preserves)
    val gate = sys.env
      .getOrElse("SPARK_GRAFT_SHJ_ABOVE_BYTES", (16L << 20).toString).toLong
    val nameSide =
      if (names.queryExecution.optimizedPlan.stats.sizeInBytes >
        BigInt(gate)) names.hint("shuffle_hash")
      else names
    val verified = cand
      .join(nameSide.select(col("rid").as("id_a"), col("name").as("__na")),
        "id_a")
      .join(nameSide.select(col("rid").as("id_b"), col("name").as("__nb")),
        "id_b")
      .where(levenshtein(col("__na"), col("__nb")) <= 2)
      .select("id_a", "id_b")
    val txt = verified.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val dir = java.nio.file.Paths.get("plans/r15")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(
      dir.resolve(s"entity_verify_join_$suffix.txt"), txt)
    println(s"wrote plans/r15/entity_verify_join_$suffix.txt")
    spark.stop()
  }
}
