package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling: the engine's join shapes lean on AQE to
  * split hot partitions at 100 TB (the SURVEY §2.2 "AQE-skew-safe"
  * claim) — prove a synthetic hot key actually triggers the skew-join
  * rewrite under thresholds scaled to test data, and that the result
  * is identical to the unsplit join. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed sort-merge join and preserves the result") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // force a shuffle join: a broadcast join has no skewed exchange
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // one hot key (0) carrying 50k rows, a tail of 1k cold keys
      val left = spark.range(50000L)
        .select(when(col("id") < 49000L, 0L).otherwise(col("id") % 1000L)
          .as("k"), col("id").as("lv"))
      val right = spark.range(1000L).select(col("id").as("k"),
        (col("id") * 7L).as("rv"))
      val j = left.join(right, "k")
      // collect THIS frame: a derived dataset has its own
      // QueryExecution and would leave j's adaptive plan unfinalized
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "expected AQE to mark the hot partition for splitting")
      // correctness unchanged by the split
      assert(rows.length == 50000)
      val expect = left.join(broadcast(right), "k")
        .agg(sum(col("lv") + col("rv"))).head().getLong(0)
      assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == expect)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
