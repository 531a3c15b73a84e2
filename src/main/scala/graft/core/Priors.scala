package graft.core

import breeze.linalg.DenseVector
import graft.functions.{Densities, MathFns}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Priors: wrap a density, reduce to a scalar over the parameter tensor
  * (reference `Henbun/priors.py:28-116`). Driver-side (Breeze) form for
  * global params; Column form for per-row LOCAL params. */
sealed trait Prior extends Serializable {
  /** Elementwise log-density. */
  def logpElem(x: Double): Double
  def logpElem(x: Column): Column
  /** d logp / dx, elementwise — for analytic ELBO gradients. */
  def dLogpElem(x: Double): Double
  final def logp(x: DenseVector[Double]): Double = {
    var s = 0.0; x.foreach(v => s += logpElem(v)); s
  }
}

object Priors {
  /** Unit normal N(0,1) (reference `priors.py:44-52`). */
  case object Normal extends Prior {
    def logpElem(x: Double): Double = Densities.scalar.gaussian(x, 0.0, 1.0)
    def logpElem(x: Column): Column = Densities.gaussian(x, lit(0.0), lit(1.0))
    def dLogpElem(x: Double): Double = -x
  }

  final case class Gaussian(mu: Double, variance: Double) extends Prior {
    def logpElem(x: Double): Double = Densities.scalar.gaussian(x, mu, variance)
    def logpElem(x: Column): Column =
      Densities.gaussian(x, lit(mu), lit(variance))
    def dLogpElem(x: Double): Double = (mu - x) / variance
  }

  final case class LogNormal(mu: Double, variance: Double) extends Prior {
    def logpElem(x: Double): Double = Densities.scalar.lognormal(x, mu, variance)
    def logpElem(x: Column): Column =
      Densities.lognormal(x, lit(mu), lit(variance))
    def dLogpElem(x: Double): Double =
      ((mu - math.log(x)) / variance - 1.0) / x
  }

  final case class Gamma(shape: Double, scale: Double) extends Prior {
    def logpElem(x: Double): Double = Densities.scalar.gamma(shape, scale, x)
    def logpElem(x: Column): Column =
      Densities.gamma(lit(shape), lit(scale), x)
    def dLogpElem(x: Double): Double = (shape - 1.0) / x - 1.0 / scale
  }

  final case class Laplace(mu: Double, sigma: Double) extends Prior {
    def logpElem(x: Double): Double = Densities.scalar.laplace(mu, sigma, x)
    def logpElem(x: Column): Column = Densities.laplace(lit(mu), lit(sigma), x)
    def dLogpElem(x: Double): Double = math.signum(mu - x) / sigma
  }

  /** Uniform on [lower, upper]: logp = −size·log(b−a), constant
    * (reference `priors.py:107-116`). */
  final case class Uniform(lower: Double, upper: Double) extends Prior {
    private val c = -math.log(upper - lower)
    def logpElem(x: Double): Double = c
    def logpElem(x: Column): Column = lit(c)
    def dLogpElem(x: Double): Double = 0.0
  }
}
