package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the τ=2 entity-resolution plan: explode-only,
  * candidate join, verify, and full resolve — attributes the
  * q_dedup_entity_tau2 constant to its stages at sf0.1. */
object Tau2Probe {
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

    val runs = sys.env.getOrElse("TAU2_RUNS", "3").toInt
    val stages = sys.env.getOrElse("TAU2_STAGES", "").split(",").filter(_.nonEmpty).toSet
    def time(label: String)(f: => Long): Unit =
      if (stages.nonEmpty && !stages.contains(label)) () else
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }

    time("rec")(rec.count())
    val exploded = rec.where(col("key").isNotNull)
      .select(col("rid"), col("nat"), col("seg"),
        explode(graft.ops.EntityKeyExpressions.keyHashesCol(
          col("key"), graft.ops.EntityKeyFns.Probe2)).as("__bk"))
    time("explode")(exploded.count())
    val cand = graft.ops.Entity.candidatePairsSplit2(
      rec, "rid", "key", Seq("nat", "seg"))
    time("cand")(cand.count())
    val names = rec.select(col("rid"), col("name"))
    val verified = cand
      .join(names.select(col("rid").as("id_a"), col("name").as("__na")), "id_a")
      .join(names.select(col("rid").as("id_b"), col("name").as("__nb")), "id_b")
      .where(levenshtein(col("__na"), col("__nb")) <= 2)
      .select("id_a", "id_b")
    time("verified")(verified.count())
    val comp = graft.ops.Dedup.connectedComponents(verified, "id_a", "id_b")
    time("closure")(comp.count())
    time("resolve")(graft.ops.Entity.resolve(
      rec, "rid", "key", "name", Seq("nat", "seg"), tau = 2).count())
    cand.explain("formatted")
    spark.stop()
  }
}
