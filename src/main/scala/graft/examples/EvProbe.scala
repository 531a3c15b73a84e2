package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: isolate whether the r6 events-family bench delta is
  * (a) the TIMESTAMP_NTZ scan+normalize projection or (b) data content,
  * by rewriting the SAME fixture rows as a long-ts parquet (the round-5
  * physical shape) and timing identical queries on both. */
object EvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val longPath = "/tmp/evprobe/events_long.parquet"
    graft.ops.Events.load(spark, s"$sfDir/events.parquet")
      .repartition(8).write.mode("overwrite").parquet(longPath)

    def time(tag: String, f: () => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f()
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s  (rows=$n)")
      }
    val gap = graft.EventQueries.SessionGapNanos
    // warm
    spark.read.parquet(longPath).count()
    graft.ops.Events.load(spark, s"$sfDir/events.parquet").count()

    time("scan_long      ", () => spark.read.parquet(longPath).agg(sum("ts")).count())
    time("scan_ntz_norm  ", () => graft.ops.Events.load(spark, s"$sfDir/events.parquet").agg(sum("ts")).count())
    time("paths_long     ", () => graft.ops.Events.eventPaths(spark.read.parquet(longPath), "user_id", "ts", "event_id", "event_type", 3, gap).count())
    time("paths_ntz_norm ", () => graft.ops.Events.eventPaths(graft.ops.Events.load(spark, s"$sfDir/events.parquet"), "user_id", "ts", "event_id", "event_type", 3, gap).count())
    time("retention_long ", () => graft.ops.Events.retention(spark.read.parquet(longPath).withColumn("ts_us", expr("ts div 1000")), "user_id", "ts_us", 7L*24*3600*1000000L).count())
    time("retention_ntz  ", () => graft.ops.Events.retention(graft.ops.Events.load(spark, s"$sfDir/events.parquet").withColumn("ts_us", expr("ts div 1000")), "user_id", "ts_us", 7L*24*3600*1000000L).count())
    spark.stop()
  }
}
