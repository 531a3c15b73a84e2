package graft.functions

/** Pure-JVM special functions used both driver-side (Breeze tensors) and
  * inside generated code from the Catalyst expressions in
  * [[MathExpressions]]. Semantics follow the reference's use of
  * `tf.lgamma`/`scipy.special.loggamma` (see reference
  * `Henbun/densities.py:39-68`, `testing/test_densities.py:26-32`).
  *
  * Implementation: Lanczos approximation (g=7, n=9) with reflection for
  * x < 0.5 — standard public-domain formulation (Numerical Recipes /
  * Boost-style), accurate to ~1e-14 relative for x > 0.
  */
object MathFns {

  private val lanczosG = 7.0
  private val lanczosCoefs: Array[Double] = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** Natural log of the absolute value of the Gamma function. */
  def lgamma(xIn: Double): Double = {
    if (xIn.isNaN) return Double.NaN
    if (xIn.isInfinite) return Double.PositiveInfinity
    if (xIn < 0.5) {
      // Reflection: Γ(x)Γ(1−x) = π / sin(πx)
      math.log(math.Pi / math.abs(math.sin(math.Pi * xIn))) - lgamma(1.0 - xIn)
    } else {
      val x = xIn - 1.0
      var a = lanczosCoefs(0)
      val t = x + lanczosG + 0.5
      var i = 1
      while (i < lanczosCoefs.length) {
        a += lanczosCoefs(i) / (x + i)
        i += 1
      }
      0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Digamma ψ(x) = d/dx ln Γ(x); asymptotic series with recurrence shift.
    * Needed for analytic gradients of gamma/beta/student-t log-densities
    * (the reference gets these from TF autodiff; we compose them by hand).
    */
  def digamma(xIn: Double): Double = {
    if (xIn.isNaN) return Double.NaN
    var x = xIn
    var result = 0.0
    if (x <= 0 && x == math.floor(x)) return Double.NaN
    if (x < 0) {
      // Reflection: ψ(1−x) − ψ(x) = π/tan(πx)
      return digamma(1.0 - x) - math.Pi / math.tan(math.Pi * x)
    }
    while (x < 10.0) { // shift up until asymptotic expansion is accurate
      result -= 1.0 / x
      x += 1.0
    }
    val inv = 1.0 / x
    val inv2 = inv * inv
    result + math.log(x) - 0.5 * inv -
      inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0 -
        inv2 * (1.0 / 240.0 - inv2 * (1.0 / 132.0)))))
  }

  /** Numerically-stable log(1 + exp(x)) (softplus). Reference
    * `Henbun/transforms.py:110-143` uses tf.nn.softplus semantics. */
  def log1pExp(x: Double): Double =
    if (x > 0) x + math.log1p(math.exp(-x)) else math.log1p(math.exp(x))

  /** Stable two-argument log-sum-exp. */
  def logSumExp2(a: Double, b: Double): Double = {
    val m = math.max(a, b)
    if (m.isNegInfinity) Double.NegativeInfinity
    else m + math.log(math.exp(a - m) + math.exp(b - m))
  }
}
