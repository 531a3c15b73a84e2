package graft.functions

import breeze.linalg.{DenseMatrix, DenseVector, diag, sum => bsum}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Log-density scalar function library.
  *
  * Semantics from reference `Henbun/densities.py:25-103` — every function
  * returns the elementwise log-pdf/log-pmf. Two flavors:
  *  - `Column` builders (primary): pure `functions._` arithmetic plus the
  *    custom codegen'd [[Lgamma]] expression, so a density over a 100 TB
  *    DataFrame is one whole-stage-codegen'd projection — no UDFs, no
  *    serialization boundary, filters still push down past it.
  *  - `scalar` Double forms for driver-side (Breeze) parameter math.
  *
  * Naming/argument order follows the reference exactly (e.g. `variance`
  * not stddev for `gaussian`, `densities.py:25`).
  */
object Densities {

  private val halfLog2Pi = 0.5 * math.log(2.0 * math.Pi)

  // ---------------------------------------------------------------- Column

  /** N(x; μ, σ²) log-pdf; `v` is the VARIANCE (`densities.py:25-27`). */
  def gaussian(x: Column, mu: Column, v: Column): Column =
    lit(-halfLog2Pi) - lit(0.5) * log(v) - lit(0.5) * pow(mu - x, 2) / v

  /** Log-normal via gaussian(ln x) − ln x (`densities.py:30-32`). */
  def lognormal(x: Column, mu: Column, v: Column): Column =
    gaussian(log(x), mu, v) - log(x)

  /** Bernoulli log-pmf: log(y==1 ? p : 1−p) (`densities.py:35-36`). */
  def bernoulli(p: Column, y: Column): Column =
    when(y === lit(1.0), log(p)).otherwise(log(lit(1.0) - p))

  /** Poisson log-pmf: y·lnλ − λ − lnΓ(y+1) (`densities.py:39-40`). */
  def poisson(lamb: Column, y: Column): Column =
    y * log(lamb) - lamb - MathExpressions.lgamma(y + lit(1.0))

  /** Exponential log-pdf: −y/λ − lnλ (`densities.py:43-44`). */
  def exponential(lamb: Column, y: Column): Column =
    -y / lamb - log(lamb)

  /** Gamma log-pdf with shape k, scale θ (`densities.py:47-49`). */
  def gamma(shape: Column, scale: Column, x: Column): Column =
    -shape * log(scale) - MathExpressions.lgamma(shape) +
      (shape - lit(1.0)) * log(x) - x / scale

  /** Student-t log-pdf; ν may be a column (tensor-valued ν is supported
    * by the reference, `densities.py:52-59`). */
  def studentT(x: Column, mean: Column, scale: Column, degFree: Column): Column =
    MathExpressions.lgamma((degFree + lit(1.0)) * lit(0.5)) -
      MathExpressions.lgamma(degFree * lit(0.5)) -
      lit(0.5) * (log(pow(scale, 2)) + log(degFree) + lit(math.log(math.Pi))) -
      lit(0.5) * (degFree + lit(1.0)) *
        log(lit(1.0) + (lit(1.0) / degFree) * pow((x - mean) / scale, 2))

  /** Beta log-pdf; y clipped to [1e-6, 1−1e-6] (`densities.py:62-68`). */
  def beta(alpha: Column, betaP: Column, y: Column): Column = {
    val yc = least(greatest(y, lit(1e-6)), lit(1.0 - 1e-6))
    (alpha - lit(1.0)) * log(yc) + (betaP - lit(1.0)) * log(lit(1.0) - yc) +
      MathExpressions.lgamma(alpha + betaP) -
      MathExpressions.lgamma(alpha) - MathExpressions.lgamma(betaP)
  }

  /** Laplace log-pdf: −|μ−y|/σ − log 2σ (`densities.py:71-72`). */
  def laplace(mu: Column, sigma: Column, y: Column): Column =
    -abs(mu - y) / sigma - log(lit(2.0) * sigma)

  /** Two-component mixture in log space, LSE-stabilized
    * (`densities.py:94-103`): log(f·e^{lp0} + (1−f)·e^{lp1}). */
  def bimixture(fraction: Column, logp0: Column, logp1: Column): Column = {
    val a = log(fraction) + logp0
    val b = log(lit(1.0) - fraction) + logp1
    val m = greatest(a, b)
    m + log(exp(a - m) + exp(b - m))
  }

  // ---------------------------------------------------------------- scalar

  /** Driver-side Double forms (for Breeze-held global parameters). */
  object scalar {
    def gaussian(x: Double, mu: Double, v: Double): Double =
      -halfLog2Pi - 0.5 * math.log(v) - 0.5 * (mu - x) * (mu - x) / v
    def lognormal(x: Double, mu: Double, v: Double): Double =
      gaussian(math.log(x), mu, v) - math.log(x)
    def bernoulli(p: Double, y: Double): Double =
      if (y == 1.0) math.log(p) else math.log(1.0 - p)
    def poisson(lamb: Double, y: Double): Double =
      y * math.log(lamb) - lamb - MathFns.lgamma(y + 1.0)
    def exponential(lamb: Double, y: Double): Double =
      -y / lamb - math.log(lamb)
    def gamma(shape: Double, scale: Double, x: Double): Double =
      -shape * math.log(scale) - MathFns.lgamma(shape) +
        (shape - 1.0) * math.log(x) - x / scale
    def studentT(x: Double, mean: Double, scale: Double, nu: Double): Double =
      MathFns.lgamma((nu + 1.0) / 2.0) - MathFns.lgamma(nu / 2.0) -
        0.5 * (math.log(scale * scale) + math.log(nu) + math.log(math.Pi)) -
        0.5 * (nu + 1.0) *
          math.log(1.0 + (1.0 / nu) * math.pow((x - mean) / scale, 2))
    def beta(alpha: Double, betaP: Double, y: Double): Double = {
      val yc = math.min(math.max(y, 1e-6), 1.0 - 1e-6)
      (alpha - 1.0) * math.log(yc) + (betaP - 1.0) * math.log(1.0 - yc) +
        MathFns.lgamma(alpha + betaP) - MathFns.lgamma(alpha) -
        MathFns.lgamma(betaP)
    }
    def laplace(mu: Double, sigma: Double, y: Double): Double =
      -math.abs(mu - y) / sigma - math.log(2.0 * sigma)
    def bimixture(fraction: Double, lp0: Double, lp1: Double): Double =
      MathFns.logSumExp2(math.log(fraction) + lp0, math.log(1.0 - fraction) + lp1)

    /** MVN log-pdf given the Cholesky factor L of the covariance
      * (`densities.py:75-91`). Model-sized (n×n for n params), so it runs
      * on the driver in Breeze — never over distributed data. If x/mu are
      * matrices the columns are treated as independent observations.
      */
    def multivariateNormal(x: DenseVector[Double], mu: DenseVector[Double],
                           l: DenseMatrix[Double]): Double = {
      val n = x.length
      require(l.rows == n && l.cols == n, s"L must be ${n}x$n")
      // solve L d = (x - mu) by forward substitution
      val d = DenseVector.zeros[Double](n)
      var i = 0
      while (i < n) {
        var s = x(i) - mu(i)
        var j = 0
        while (j < i) { s -= l(i, j) * d(j); j += 1 }
        d(i) = s / l(i, i)
        i += 1
      }
      -0.5 * n * math.log(2.0 * math.Pi) - bsum(breeze.numerics.log(diag(l))) -
        0.5 * (d dot d)
    }
  }
}
