package graft.examples
import org.apache.spark.sql.SparkSession
object RawEvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val t0 = System.nanoTime()
    try {
      graft.ops.Events.eventPaths(raw, "user_id", "ts", "event_id",
        "event_type", 3, graft.EventQueries.SessionGapNanos).count()
      println("paths-on-raw: OK")
    } catch { case e: Throwable =>
      println(f"paths-on-raw threw ${e.getClass.getSimpleName} in ${(System.nanoTime()-t0)/1e9}%.3f s: ${e.getMessage.take(120)}")
    }
    val t1 = System.nanoTime()
    try {
      graft.ops.Events.asofJoin(raw, raw.limit(10), "user_id", "ts", "event_id", Seq("value")).count()
      println(f"asof-on-raw: OK in ${(System.nanoTime()-t1)/1e9}%.3f s")
    } catch { case e: Throwable => println("asof-on-raw threw " + e.getClass.getSimpleName + ": " + e.getMessage.take(120)) }
    spark.stop()
  }
}
