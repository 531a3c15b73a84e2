package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom scalar Catalyst expressions for special functions Spark SQL
  * lacks. Both participate in whole-stage codegen (`doGenCode` emits a
  * static call into [[MathFns]]), so density expressions built on them
  * stay inside a single WholeStageCodegen span — no UDF serialization,
  * no codegen fallback.
  *
  * Needed by the Poisson/Gamma/Student-t/Beta log-densities (reference
  * `Henbun/densities.py:39-68`, which relies on `tf.lgamma`).
  */
case class Lgamma(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    MathFns.lgamma(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MathFns.lgamma($c)")
  override protected def withNewChildInternal(c: Expression): Lgamma = copy(c)
  override def prettyName: String = "lgamma"
}

case class Digamma(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    MathFns.digamma(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MathFns.digamma($c)")
  override protected def withNewChildInternal(c: Expression): Digamma = copy(c)
  override def prettyName: String = "digamma"
}

/** Nullable equi-width histogram bucket: clamped ⌊(x−lo)/w⌋ in
  * [0, nBuckets), NULL for NaN input (null input is null by the
  * nullSafeEval contract). ±Inf clamps into the edge buckets like any
  * other out-of-range value (the pre-existing sketch contract).
  *
  * Exists because the exclusion semantics reference `x` more than
  * once in any Column composition (`when(!isnan(x), bucket(x))`), and
  * Catalyst's subexpression elimination does not span conditional
  * branches — with an expensive derived `x` (a classifier score) the
  * composed form evaluated the whole scoring subtree twice per row
  * (the round-7 q_stats_winsorize 1.7× regression). An Expression
  * child is evaluated exactly once by construction. */
case class HistBucket(child: Expression, lo: Double, w: Double,
                      nBuckets: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (x.isNaN) null
    else {
      val b = math.floor((x - lo) / w)
      // Double→Long saturates at the Long range ends, so ±Inf and
      // huge values clamp into the edge buckets
      math.min(math.max(b.toLong, 0L), (nBuckets - 1).toLong)
    }
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("histB")
      s"""
         |if (Double.isNaN($c)) { ${ev.isNull} = true; }
         |else {
         |  double $b = java.lang.Math.floor(($c - ${lo}D) / ${w}D);
         |  ${ev.value} = java.lang.Math.min(
         |    java.lang.Math.max((long) $b, 0L), ${nBuckets - 1}L);
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): HistBucket =
    copy(child = c)
  override def prettyName: String = "hist_bucket"
}

object MathExpressions {
  private def toDouble(e: Expression): Expression =
    if (e.resolved && e.dataType == DoubleType) e else Cast(e, DoubleType)
  def lgamma(c: Column): Column =
    bridge.toColumn(Lgamma(toDouble(bridge.toExpression(c))))
  def digamma(c: Column): Column =
    bridge.toColumn(Digamma(toDouble(bridge.toExpression(c))))
  def histBucket(x: Column, lo: Double, w: Double, nBuckets: Int): Column =
    bridge.toColumn(HistBucket(toDouble(bridge.toExpression(x)),
      lo, w, nBuckets))
}
