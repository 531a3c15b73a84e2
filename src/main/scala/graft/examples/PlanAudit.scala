package graft.examples

import org.apache.spark.sql.SparkSession

/** Prints a physical-plan summary per SparkEntry query: scan read
  * schemas (column pruning), join strategies, and whole-stage-codegen
  * span count — the scale-readiness checklist. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // let AQE finalize
        val plan = df.queryExecution.executedPlan.toString
        val scans = "ReadSchema: struct<([^>]*)>".r
          .findAllMatchIn(plan).map(_.group(1)).toList
        val joins = List("BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
          .map(j => j -> j.r.findAllIn(plan).size).filter(_._2 > 0)
        // AQE's simple string renders codegen stages as "*(n) Op"
        val wsc = "\\*\\(\\d+\\)".r.findAllMatchIn(plan)
          .map(_.matched).toSet.size
        val exch = "Exchange".r.findAllIn(plan).size
        println(s"== $name: wsc=$wsc exchanges=$exch joins=$joins")
        scans.foreach(s => println(s"   scan: $s"))
      } catch { case e: Throwable => println(s"== $name: ERROR $e") }
    }
    spark.stop()
  }
}
