package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe (r14 optimization round): what partition count
  * does the minhash-family CC closure's edge RDD actually carry at a
  * given scale — i.e. how wide does the loop's shared HashPartitioner
  * end up? Measured: 9,775 edges / 1 partition at sf0.1, 500,902 / 4
  * at the 100× docs fixture — AQE's coalescing of the canonicalize
  * DISTINCT already right-sizes the loop, which is why the
  * count-driven resize experiment was rejected (see [[CcWidthAB]]). */
object CcParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = graft.ops.Dedup.minhashSignatures(d0, "text", "doc_id")
      .persist()
    val cand = graft.ops.Dedup.minhashCandidatesAndOversizeFromSigs(
      sigs, "doc_id", 50)._1
      .where(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    val sigNames = (0 until graft.ops.Dedup.NumPerms).map(i => s"sig$i")
    val groupMins = sigs.groupBy(sigNames.map(col): _*)
      .agg(min(col("doc_id")).as("__keep"))
    val groupEdges = sigs.join(groupMins, sigNames)
      .where(col("doc_id") =!= col("__keep"))
      .select(col("doc_id").as("id_a"), col("__keep").as("id_b"))
    val canon = cand.union(groupEdges)
      .select(greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("u"),
        least(col("id_a").cast("long"), col("id_b").cast("long")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    import spark.implicits._
    val rdd = canon.as[(Long, Long)].rdd
    println(s"MEASURE minhash edges=${rdd.count()} parts=${rdd.getNumPartitions} defaultPar=${spark.sparkContext.defaultParallelism}")
    sigs.unpersist()
    spark.stop()
  }
}
