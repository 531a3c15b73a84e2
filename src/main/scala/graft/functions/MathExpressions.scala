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

object MathExpressions {
  private def toDouble(e: Expression): Expression =
    if (e.resolved && e.dataType == DoubleType) e else Cast(e, DoubleType)
  def lgamma(c: Column): Column =
    bridge.toColumn(Lgamma(toDouble(bridge.toExpression(c))))
  def digamma(c: Column): Column =
    bridge.toColumn(Digamma(toDouble(bridge.toExpression(c))))
}
