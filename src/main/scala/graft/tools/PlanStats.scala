package graft.tools

import org.apache.spark.sql.SparkSession

/** One-line plan-shape stats for EVERY registered query: parquet scan
  * count, Exchange count, join strategy counts — the optimization
  * round's triage table (a query whose plan scans the same input many
  * times is recomputing subtrees; see guide §7.2 "duplicated
  * subtrees"). Writes plans/<tag>/PLANSTATS.tsv. */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "r14"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("query\tscans\texchanges\tbhj\tsmj\tshj\tbnl\twindows\n")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        def c(p: String) = p.r.findAllIn(txt).length
        sb.append(s"$name\t${c("Scan parquet")}\t${c("Exchange")}\t" +
          s"${c("BroadcastHashJoin")}\t${c("SortMergeJoin")}\t" +
          s"${c("ShuffledHashJoin")}\t${c("BroadcastNestedLoopJoin")}\t" +
          s"${c("Window")}\n")
      } catch { case e: Throwable =>
        sb.append(s"$name\tERR\t${e.getClass.getSimpleName}\n")
      } finally graft.core.CacheRegistry.drain()
    }
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("PLANSTATS.tsv"),
      sb.toString)
    println(s"wrote plans/$tag/PLANSTATS.tsv")
    spark.stop()
  }
}
