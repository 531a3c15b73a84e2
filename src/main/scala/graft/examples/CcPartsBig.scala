package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Companion measurement to [[CcWidthAB]]: what partition count does
  * the REAL τ=2 query's lazy verified-edge frame hand the closure —
  * i.e. the loop width the pre-r14 partitioner logic actually used at
  * the 100× fixture. */
object CcPartsBig {
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
    def subAt(dgc: Column, p: Column): Column =
      concat(dgc.substr(lit(1), p),
        ((dgc.substr(p + 1, lit(1)).cast("int") + 1) % 10).cast("string"),
        dgc.substr(p + 2, lit(9)))
    def delAt(dgc: Column, p: Column): Column =
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
    val cand = graft.ops.Entity.candidatePairsSplit2(
      rec, "rid", "key", Seq("nat", "seg"))
    val names = rec.select(col("rid"), col("name"))
    val verified = cand
      .join(names.select(col("rid").as("id_a"), col("name").as("__na")),
        "id_a")
      .join(names.select(col("rid").as("id_b"), col("name").as("__nb")),
        "id_b")
      .where(levenshtein(col("__na"), col("__nb")) <= 2)
      .select("id_a", "id_b")
    import spark.implicits._
    val canon = verified
      .select(greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("u"),
        least(col("id_a").cast("long"), col("id_b").cast("long")).as("v"))
      .where(col("u") =!= col("v"))
      .as[(Long, Long)].rdd
    println(s"MEASURE verified-canon parts=${canon.getNumPartitions} (old loop width)")
    spark.stop()
  }
}
