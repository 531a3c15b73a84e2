package graft.examples
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q_dens_gaussian")(spark, sfDir).count()
    args.foreach { q =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(q)(spark, sfDir).count()
          println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        } finally graft.core.CacheRegistry.drain()
      }
    }
    spark.stop()
  }
}
