package graft.examples
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q_text_pmi A/B at scale (r15, VERDICT item 5): the 12-scan plan
  * relies on ReuseExchange deduplicating the cpair/ctok count-table
  * subtrees at runtime; the pin (cache hook) lost at sf0.1 in r14.
  * This probe times both forms alternating, min-of-3 each, at
  * whatever $SPARK_GRAFT_SF_DIR points to — the 100× decision input. */
object PmiAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def pin(df: DataFrame): DataFrame =
      graft.core.CacheRegistry.track(df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def run(tag: String, cache: DataFrame => DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        graft.ops.NgramLm.pmiCollocations(docs, "text", "doc_id",
            cache = cache)
          .select(col("rank"), col("spelling"), col("cp"),
            round(col("pmi"), 5).as("pmi"))
          .orderBy("rank").count()
        println(f"pmi[$tag]: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      } finally graft.core.CacheRegistry.drain()
    }
    run("warmup", identity)
    for (_ <- 1 to 3) { run("reuse", identity); run("pinned", pin) }
    spark.stop()
  }
}
