package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame}

/** Numeric utilities mirroring reference `Henbun/tf_wraps.py`. */
object Numerics {

  /** Clip to [−rmax, rmax]; reference `tf_wraps.py:33-39` (default bound
    * ±50, globally off unless enabled — `henbunrc:12-14`). */
  def clip(c: Column, rmax: Double = 50.0): Column =
    greatest(least(c, lit(rmax)), lit(-rmax))

  def clip(x: Double, rmax: Double): Double =
    math.max(math.min(x, rmax), -rmax)

  /** Stable softplus column (shared with Transforms). */
  def softplus(c: Column): Column = Transforms.softplusCol(c)

  /** Max-stabilized log-sum-exp across a group, as a grouped DataFrame
    * op: lse = max(x) + ln Σ exp(x − max(x)) (reference
    * `tf_wraps.py:42-48`, axis-reduction form).
    *
    * Two hash aggregates, no Window: pass 1 computes the per-group max
    * (partial-agg'd map-side, result is group-cardinality-sized →
    * broadcast), pass 2 joins the max back and aggregates the shifted
    * exp sum (also partial-agg'd). A `max(x).over(Window.partitionBy)`
    * would instead shuffle EVERY row of a group onto one task — with a
    * handful of groups at 100 TB that is a few-reducer scale-killer;
    * this shape keeps both stages map-side partial.
    *
    * `broadcastMaxes` controls the join-back strategy: the max table is
    * group-cardinality-sized, so broadcasting is right for the common
    * few-groups reduction, but a high-cardinality group key (millions of
    * groups) would OOM the driver — pass false there to fall back to a
    * shuffled equi-join (still two hash aggregates, no Window).
    */
  def logSumExp(df: DataFrame, groupCols: Seq[String], x: Column,
                out: String, broadcastMaxes: Boolean = true): DataFrame = {
    val keys = groupCols.map(col)
    val maxes = df.groupBy(keys: _*).agg(max(x).as("__lse_mx"))
      .select(groupCols.map(c => col(c).as(s"__lse_k_$c")) :+
        col("__lse_mx"): _*)
    // null-SAFE key equality: groupBy treats null as its own group, so
    // the join back must too (a plain equi-join would silently drop
    // null-keyed groups)
    val cond = groupCols.map(c => col(c) <=> col(s"__lse_k_$c"))
      .reduce(_ && _)
    df.join(if (broadcastMaxes) broadcast(maxes) else maxes, cond)
      .groupBy(keys: _*)
      .agg((max(col("__lse_mx")) +
        log(sum(exp(x - col("__lse_mx"))))).as(out))
  }

  /** Analytic KL(N(μ, σ²) ‖ N(0,1)) per element, parameterized by the
    * log-scale `qSqrt` (logdet = 2·qSqrt), matching the diagonal-Normal
    * variational fast path (reference `Henbun/variationals.py:178-186,
    * 225-230`; oracle `testing/test_variationals.py:326-347`):
    * 0.5·(−logdet − 1 + e^{logdet} + μ²). */
  def klDiagNormal(mu: Column, qSqrt: Column): Column = {
    val logdet = lit(2.0) * qSqrt
    lit(0.5) * (-logdet - lit(1.0) + exp(logdet) + mu * mu)
  }

  def klDiagNormal(mu: Double, qSqrt: Double): Double = {
    val logdet = 2.0 * qSqrt
    0.5 * (-logdet - 1.0 + math.exp(logdet) + mu * mu)
  }

  /** Stable pairwise LSE of two columns. */
  def logSumExp2(a: Column, b: Column): Column = {
    val m = greatest(a, b)
    m + log(exp(a - m) + exp(b - m))
  }
}
