package graft.autodiff

import org.scalatest.funsuite.AnyFunSuite
import Expr._

/** Gradient correctness: every op's reverse-mode gradient vs central
  * finite differences (SURVEY §7 hard-part (a): no TF autodiff —
  * analytic gradients must be independently verified). */
class AutodiffSpec extends AnyFunSuite {

  private def fd(tape: CompiledExpr, in: Array[Double], theta: Array[Double],
                 draws: Array[Double], slot: Int): Double = {
    val h = 1e-6
    val vals = tape.newValues
    val tp = theta.clone(); tp(slot) += h
    val tm = theta.clone(); tm(slot) -= h
    (tape.eval(in, tp, draws, vals) - tape.eval(in, tm, draws, vals)) / (2 * h)
  }

  private def checkGrads(e: Expr, nSlots: Int, in: Array[Double] = Array.empty,
                         draws: Array[Double] = Array.empty,
                         theta: Array[Double], tol: Double = 1e-5): Unit = {
    val tape = CompiledExpr.compile(e, in.length, nSlots, draws.length)
    val grad = new Array[Double](nSlots)
    val v = tape.evalGrad(in, theta, draws, tape.newValues, tape.newValues, grad)
    assert(!v.isNaN)
    (0 until nSlots).foreach { s =>
      val num = fd(tape, in, theta, draws, s)
      assert(math.abs(grad(s) - num) <= tol * math.max(1.0, math.abs(num)),
        s"slot $s: ad=${grad(s)} fd=$num for $e")
    }
  }

  test("arithmetic / unary op gradients match finite differences") {
    val t = Array(0.7, -1.3, 2.1)
    checkGrads(P(0) * P(1) + P(2) / P(0) - exp(P(1)) * log(P(2)), 3, theta = t)
    checkGrads(sqrt(P(2)) + abs(P(1)) * sigmoid(P(0)), 3, theta = t)
    checkGrads(softplus(P(0)) * tanh(P(1)) + pow(P(2), 2.7), 3, theta = t)
    checkGrads(relu(P(0)) + relu(P(1)) * P(2), 3, theta = t)
    checkGrads(lgamma(P(2) + c(1.5)), 3, theta = t)
    checkGrads(lse2(P(0), P(1) * c(2.0)), 3, theta = t)
    checkGrads(sin(P(0)) * cos(P(1) * P(2)), 3, theta = t)
  }

  test("density builders' gradients match finite differences") {
    val t = Array(1.2, 0.4, 0.9, 2.5)
    checkGrads(ExprFns.gaussian(P(0), P(1), exp(P(2))), 4, theta = t)
    checkGrads(ExprFns.lognormal(P(0), P(1), exp(P(2))), 4, theta = t)
    checkGrads(ExprFns.poisson(exp(P(2)), c(3.0)), 4, theta = t)
    checkGrads(ExprFns.exponential(exp(P(2)), P(0)), 4, theta = t)
    checkGrads(ExprFns.gamma(P(3), exp(P(2)), P(0)), 4, theta = t)
    checkGrads(ExprFns.studentT(P(0), P(1), exp(P(2)), P(3) + c(1.0)), 4,
      theta = t)
    checkGrads(ExprFns.beta(P(3), P(3) * c(2.0), sigmoid(P(0))), 4, theta = t)
    checkGrads(ExprFns.laplace(P(1), exp(P(2)), P(0)), 4, theta = t)
    checkGrads(ExprFns.bimixture(sigmoid(P(1)),
      ExprFns.gaussian(P(0), c(0.0), one),
      ExprFns.gaussian(P(0), c(3.0), c(4.0))), 4, theta = t)
  }

  test("transform forward/logJacobian gradients match finite differences") {
    import graft.functions.Transforms
    val t = Array(0.3, -0.8)
    Seq(Transforms.Identity, Transforms.Exp(), Transforms.Log1pe(),
      Transforms.Logistic(2.0, 5.0)).foreach { tr =>
      checkGrads(ExprFns.forward(tr, P(0)) * P(1), 2, theta = t)
      checkGrads(ExprFns.logJacobian(tr, P(0) * P(1)), 2, theta = t)
    }
  }

  test("CSE: shared subexpression evaluates once but grads accumulate") {
    val shared = exp(P(0))
    val e = shared * shared + shared
    val tape = CompiledExpr.compile(e, 0, 1, 0)
    // exp node present exactly once
    assert(tape.ops.count(_ == CompiledExpr.OpExp) == 1)
    val grad = new Array[Double](1)
    val x = 0.37
    tape.evalGrad(Array.empty, Array(x), Array.empty,
      tape.newValues, tape.newValues, grad)
    val expect = 2 * math.exp(x) * math.exp(x) + math.exp(x)
    assert(math.abs(grad(0) - expect) < 1e-10)
  }

  test("draw gradients flow (reparameterization path)") {
    val e = (P(0) + exp(P(1)) * Dr(0)).sq
    val tape = CompiledExpr.compile(e, 0, 2, 1)
    val gradT = new Array[Double](2)
    val gradD = new Array[Double](1)
    val v = tape.evalGrad(Array.empty, Array(0.5, -0.2), Array(1.3),
      tape.newValues, tape.newValues, gradT, gradD)
    val x = 0.5 + math.exp(-0.2) * 1.3
    assert(math.abs(v - x * x) < 1e-12)
    assert(math.abs(gradT(0) - 2 * x) < 1e-10)
    assert(math.abs(gradT(1) - 2 * x * math.exp(-0.2) * 1.3) < 1e-10)
    assert(math.abs(gradD(0) - 2 * x * math.exp(-0.2)) < 1e-10)
  }
}
