package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: band-bucket size distribution of the MinHash
  * LSH over a documents dir — quantifies the candidate-pair count the
  * UNCAPPED pair join would face (Σ over buckets of n·(n−1)/2). */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bands = graft.ops.Dedup.bandRowsOf(docs, "text", "doc_id")
    val sizes = bands.groupBy("band", "band_key")
      .agg(count(lit(1)).as("n"))
    val stats = sizes.agg(count(lit(1)).as("buckets"),
      max(col("n")).as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).cast("long").as("pairs"))
      .collect()(0)
    println(s"dir=$dir buckets=${stats.getLong(0)} " +
      s"max_bucket=${stats.getLong(1)} candidate_pairs=${stats.getLong(2)}")
    spark.stop()
  }
}
