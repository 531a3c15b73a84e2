package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-sum correlation: recovers planted relationships, is
  * partition-invariant, and runs as one aggregate. */
class StatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("recovers planted correlations and the register sums are " +
    "partition-invariant") {
    val n = 5000
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(n) { i =>
      val x = rng.nextDouble() * 0.9
      val noise = rng.nextGaussian() * 0.01
      // y strongly correlated with x; z independent
      (x, math.min(0.999, math.max(0.0, x * 0.8 + noise)),
        rng.nextDouble() * 0.9)
    }
    val df = rows.toDF("x", "y", "z")
    val cols = Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z"))
    val out = Stats.withCorrs(Stats.momentSums(df, cols),
      cols.map(_._1)).head()
    val cxy = out.getDouble(out.fieldIndex("corr_x_y"))
    val cxz = out.getDouble(out.fieldIndex("corr_x_z"))
    assert(cxy > 0.99, s"planted x~y correlation lost: $cxy")
    assert(math.abs(cxz) < 0.05, s"independent pair correlated: $cxz")
    // exact registers: any partitioning gives the identical row
    val repart = Stats.withCorrs(
      Stats.momentSums(df.repartition(13), cols), cols.map(_._1)).head()
    assert(out.toSeq == repart.toSeq,
      "fixed-point sums must be partition-invariant")
    // scale shape: one aggregate, no window, no join
    val plan = Stats.momentSums(df, cols)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"))
  }
}
