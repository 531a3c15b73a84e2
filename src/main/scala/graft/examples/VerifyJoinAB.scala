package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** τ=2 verify-join strategy A/B at $SPARK_GRAFT_SF_DIR (r15, VERDICT
  * item 6): times the verified-edge subplan (candidatePairsSplit2 +
  * the two name joins) with the stock planner choice vs a
  * shuffle_hash hint on the name side, alternating min-of-3, on a
  * quiesced host — the r14 experiment read only ~6% inside a load-15
  * regime. Also prints the name-side optimizedPlan stats, the input
  * to any size-gated hint. */
object VerifyJoinAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("k"), col("c_name"),
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        substring(col("c_name"), 10, 9).as("dg"),
        (col("c_custkey") % 9).cast("int").as("p0"),
        ((col("c_custkey") % 9 + 3) % 9).cast("int").as("p1"))
    def subAt(dgc: org.apache.spark.sql.Column,
              p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(dgc.substr(lit(1), p),
        ((dgc.substr(p + 1, lit(1)).cast("int") + 1) % 10).cast("string"),
        dgc.substr(p + 2, lit(9)))
    def delAt(dgc: org.apache.spark.sql.Column,
              p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(dgc.substr(lit(1), p), dgc.substr(p + 2, lit(9)))
    val sub0 = subAt(col("dg"), col("p0"))
    val dirtyDigits = when(col("k") % 7 === 0, subAt(sub0, col("p1")))
      .when(col("k") % 3 === 1, sub0)
      .when(col("k") % 3 === 2, delAt(col("dg"), col("p0")))
      .otherwise(col("dg"))
    val rec = base.select((col("k") * 2).as("rid"),
        col("c_name").as("name"), col("nat"), col("seg"))
      .unionByName(base.select((col("k") * 2 + 1).as("rid"),
        concat(lit("Customer#"), dirtyDigits).as("name"),
        col("nat"), col("seg")))
      .withColumn("key", substring(col("name"), 10, 10))

    val names = rec.select(col("rid"), col("name"))
    println(s"names stats sizeInBytes = " +
      s"${names.queryExecution.optimizedPlan.stats.sizeInBytes}")

    def verified(nameSide: DataFrame): DataFrame = {
      val cand = graft.ops.Entity.candidatePairsSplit2(
        rec, "rid", "key", Seq("nat", "seg"))
      cand
        .join(nameSide.select(col("rid").as("id_a"),
          col("name").as("__na")), "id_a")
        .join(nameSide.select(col("rid").as("id_b"),
          col("name").as("__nb")), "id_b")
        .where(levenshtein(col("__na"), col("__nb")) <= 2)
        .select("id_a", "id_b")
    }
    def run(tag: String, nameSide: DataFrame): Unit = {
      val t0 = System.nanoTime()
      verified(nameSide).write.format("noop").mode("overwrite").save()
      println(f"verify[$tag]: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    run("warmup", names)
    for (_ <- 1 to 3) {
      run("stock", names)
      run("shj", names.hint("shuffle_hash"))
    }
    spark.stop()
  }
}
