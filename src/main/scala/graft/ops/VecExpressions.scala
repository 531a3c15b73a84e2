package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the embedding operators.
  *
  * The composable forms (`zip_with` + `aggregate` higher-order
  * functions) are evaluated per element through Catalyst's interpreted
  * lambda machinery — correct, but the dominant cost of every
  * similarity query at scale. These expressions emit one tight
  * primitive loop into whole-stage codegen instead (same preference
  * order as `Lgamma`: native Expression > UDF). Summation is in
  * forward element order, IDENTICAL to the `aggregate` fold and to
  * DuckDB's `list_sum` comprehension, so oracle hash parity is
  * unaffected. Arrays are assumed non-null-elemented (the embedding
  * contract); unequal lengths take the common prefix.
  */
object VecFns {

  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def l2sq(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  /** All nBits hyperplane dots in ONE pass over the vector (the
    * hyperplane component is the [[Similarity.hyperplane]] integer
    * recurrence, inlined). Per-bit accumulation order is forward in
    * the element index — bit-identical to the per-bit `aggregate`
    * form and the DuckDB comprehension. */
  def lshBucket(a: ArrayData, aF: Boolean, nBits: Int,
                bitOffset: Int): Long = {
    val n = a.numElements()
    val dots = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val v = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      var b = 0
      while (b < nBits) {
        val gb = bitOffset + b
        val seed = ((i + 1).toLong * Similarity.HpDimMix +
          (gb + 1).toLong * Similarity.HpBitMix) % Similarity.HpMod
        val h = (seed * Similarity.HpMult % Similarity.HpMod).toDouble /
          (Similarity.HpMod / 2).toDouble - 1.0
        dots(b) += v * h
        b += 1
      }
      i += 1
    }
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      if (dots(b) > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}

private[ops] trait FloatElem { self: Expression =>
  protected def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"expected array<float|double>, got $t")
  }
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with FloatElem {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecFns.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.VecFns.dot($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(l, r)
  override def prettyName: String = "vec_dot"
}

case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with FloatElem {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecFns.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.VecFns.l2sq($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecL2Sq = copy(l, r)
  override def prettyName: String = "vec_l2sq"
}

case class LshBucketExpr(child: Expression, nBits: Int, bitOffset: Int)
    extends UnaryExpression with FloatElem {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    VecFns.lshBucket(a.asInstanceOf[ArrayData], isFloatArr(child),
      nBits, bitOffset)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.VecFns.lshBucket($c, ${isFloatArr(child)}, $nBits, $bitOffset)")
  override protected def withNewChildInternal(c: Expression): LshBucketExpr =
    copy(child = c)
  override def prettyName: String = "lsh_bucket"
}

object VecExpressions {
  def dot(a: Column, b: Column): Column =
    bridge.toColumn(VecDot(bridge.toExpression(a), bridge.toExpression(b)))
  def l2sq(a: Column, b: Column): Column =
    bridge.toColumn(VecL2Sq(bridge.toExpression(a), bridge.toExpression(b)))
  def lshBucket(emb: Column, nBits: Int, bitOffset: Int): Column =
    bridge.toColumn(LshBucketExpr(bridge.toExpression(emb), nBits, bitOffset))
}
