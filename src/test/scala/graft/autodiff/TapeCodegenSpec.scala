package graft.autodiff

import org.scalatest.funsuite.AnyFunSuite

/** The Janino-generated tape must agree with the interpreter bit-for-
  * bit on values and gradients, across every op type. */
class TapeCodegenSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(7)

  /** An expression exercising every op, over 2 inputs, 3 params,
    * 2 draws. Arguments are kept in safe domains via softplus/abs. */
  private def kitchenSink: Expr = {
    val x = In(0); val y = In(1)
    val p0 = P(0); val p1 = P(1); val p2 = P(2)
    val u0 = Dr(0); val u1 = Dr(1)
    val pos = Expr.softplus(x * p0 + u0) + Expr.c(0.1)
    Expr.sum(Seq(
      (x + y * p0 - p1 / (Expr.abs(p2) + Expr.c(1.0))).sq,
      Expr.exp(-pos) + Expr.log(pos) + Expr.sqrt(pos),
      Expr.pow(pos, 1.7) * Expr.sigmoid(y * p1),
      Expr.tanh(x * p2) + Expr.relu(y - p0) - Expr.lgamma(pos),
      Expr.lse2(x * p0, y * p1) + Expr.sin(p2) * Expr.cos(x),
      -(u1 * p2)))
  }

  test("codegen value and gradient equal the interpreter (bit-exact)") {
    val tape = CompiledExpr.compile(kitchenSink, 2, 3, 2)
    assert(tape.fastFn != null, "codegen failed for the kitchen sink")
    (0 until 200).foreach { _ =>
      val in = Array.fill(2)(rng.nextGaussian())
      val th = Array.fill(3)(rng.nextGaussian())
      val dr = Array.fill(2)(rng.nextGaussian())
      val vals = tape.newValues; val adj = tape.newValues
      val gi = new Array[Double](3); val gdi = new Array[Double](2)
      val vi = tape.evalGrad(in, th, dr, vals, adj, gi, gdi)
      val gc = new Array[Double](3); val gdc = new Array[Double](2)
      val vc = tape.fastFn.evalGrad(in, th, dr, gc, gdc)
      assert(java.lang.Double.compare(vi, vc) == 0, s"value $vi vs $vc")
      (0 until 3).foreach(k => assert(
        java.lang.Double.compare(gi(k), gc(k)) == 0, s"grad $k"))
      (0 until 2).foreach(k => assert(
        java.lang.Double.compare(gdi(k), gdc(k)) == 0, s"gradDraw $k"))
      assert(java.lang.Double.compare(
        tape.eval(in, th, dr, vals), tape.fastFn.eval(in, th, dr)) == 0)
    }
  }

  /** Balanced sum: keeps expression DEPTH logarithmic (deep chains
    * break case-class hashCode recursion). */
  private def balancedSum(es: Seq[Expr]): Expr =
    if (es.length == 1) es.head
    else balancedSum(es.grouped(2).map(_.reduce(_ + _)).toSeq)

  test("tapes past the single-method limit compile CHUNKED and stay " +
    "bit-exact; past the chunked limit they fall back") {
    // ~1.5k ops: single-method would blow the 64KB method limit
    val terms = (0 until 150).map { i =>
      var t: Expr = In(0) * P(0) + Expr.c(i + 1.0)
      (0 until 8).foreach(_ => t = Expr.sqrt(t))
      t
    }
    val mid = CompiledExpr.compile(balancedSum(terms), 1, 1, 0)
    assert(mid.ops.length > TapeCodegen.MaxOps &&
      mid.ops.length <= TapeCodegen.MaxChunkedOps)
    assert(mid.fastFn != null, "chunked codegen failed")
    val in = Array(2.0); val th = Array(1.3)
    val vals = mid.newValues; val adj = mid.newValues
    val gi = new Array[Double](1)
    val vi = mid.evalGrad(in, th, Array.empty, vals, adj, gi)
    val gc = new Array[Double](1)
    val vc = mid.fastFn.evalGrad(in, th, Array.empty, gc, null)
    assert(java.lang.Double.compare(vi, vc) == 0)
    assert(java.lang.Double.compare(gi(0), gc(0)) == 0)

    // past the chunked ceiling: interpreter fallback
    val huge = (0 until 2200).map { i =>
      var t: Expr = In(0) + Expr.c(i + 1.0)
      (0 until 9).foreach(_ => t = Expr.sqrt(t))
      t
    }
    val big = CompiledExpr.compile(balancedSum(huge), 1, 0, 0)
    assert(big.ops.length > TapeCodegen.MaxChunkedOps)
    assert(big.fastFn == null)
    val v = big.evalFast(Array(2.0), Array.empty, Array.empty, big.newValues)
    assert(!v.isNaN)
  }

  test("null gradDraws is accepted by the generated code") {
    val tape = CompiledExpr.compile(kitchenSink, 2, 3, 2)
    val g = new Array[Double](3)
    val v = tape.fastFn.evalGrad(Array(0.3, -0.8), Array(0.1, 0.2, 0.3),
      Array(0.5, -0.5), g, null)
    assert(!v.isNaN && g.exists(_ != 0.0))
  }
}
