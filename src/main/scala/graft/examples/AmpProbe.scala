package graft.examples

import org.apache.spark.sql.SparkSession

/** Prints the optimized logical plan of the named queries — the
  * working view for chasing recompute-amplification flags from
  * tools.PlanAudit / AuditSpec (which expensive subtree sits in
  * which operator, and whether a filter pushdown duplicated it). */
object AmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name amplified: " +
        graft.tools.PlanAudit.amplified(df))
      println(df.queryExecution.optimizedPlan.treeString)
      graft.core.CacheRegistry.drain()
    }
    spark.stop()
  }
}
