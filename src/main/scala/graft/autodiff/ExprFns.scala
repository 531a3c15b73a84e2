package graft.autodiff

import graft.core.{Prior, Priors}
import graft.functions.{Transform, Transforms}
import Expr._

/** Density / transform / prior builders over [[Expr]] — the same
  * formulas as `graft.functions.Densities` (reference
  * `Henbun/densities.py`) re-expressed on the autodiff AST so that
  * analytic gradients compose automatically. */
object ExprFns {

  private val halfLog2Pi = 0.5 * math.log(2.0 * math.Pi)

  def gaussian(x: Expr, mu: Expr, v: Expr): Expr =
    c(-halfLog2Pi) - c(0.5) * log(v) - c(0.5) * (mu - x).sq / v

  def lognormal(x: Expr, mu: Expr, v: Expr): Expr =
    gaussian(log(x), mu, v) - log(x)

  /** y ∈ {0,1}: y·log p + (1−y)·log(1−p) — the differentiable form of
    * `densities.bernoulli` (reference `densities.py:35-36`). */
  def bernoulli(p: Expr, y: Expr): Expr =
    y * log(p) + (one - y) * log(one - p)

  def poisson(lamb: Expr, y: Expr): Expr =
    y * log(lamb) - lamb - lgamma(y + one)

  def exponential(lamb: Expr, y: Expr): Expr = -y / lamb - log(lamb)

  def gamma(shape: Expr, scale: Expr, x: Expr): Expr =
    -shape * log(scale) - lgamma(shape) + (shape - one) * log(x) - x / scale

  def studentT(x: Expr, mean: Expr, scale: Expr, nu: Expr): Expr =
    lgamma((nu + one) * c(0.5)) - lgamma(nu * c(0.5)) -
      c(0.5) * (log(scale.sq) + log(nu) + c(math.log(math.Pi))) -
      c(0.5) * (nu + one) * log(one + ((x - mean) / scale).sq / nu)

  def beta(alpha: Expr, betaP: Expr, y: Expr): Expr =
    (alpha - one) * log(y) + (betaP - one) * log(one - y) +
      lgamma(alpha + betaP) - lgamma(alpha) - lgamma(betaP)

  def laplace(mu: Expr, sigma: Expr, y: Expr): Expr =
    -abs(mu - y) / sigma - log(c(2.0) * sigma)

  def bimixture(fraction: Expr, lp0: Expr, lp1: Expr): Expr =
    lse2(log(fraction) + lp0, log(one - fraction) + lp1)

  /** Constrained-space read of a free-space expression (reference
    * transforms, `Henbun/transforms.py:73-180`). */
  def forward(t: Transform, x: Expr): Expr = t match {
    case Transforms.Identity => x
    case Transforms.Exp(lower) => exp(x) + c(lower)
    case Transforms.Log1pe(lower) => softplus(x) + c(lower)
    case Transforms.Logistic(a, b) => c(a) + c(b - a) * sigmoid(x)
  }

  /** Elementwise log-Jacobian of the forward map. */
  def logJacobian(t: Transform, x: Expr): Expr = t match {
    case Transforms.Identity => zero
    case Transforms.Exp(_) => x
    case Transforms.Log1pe(_) => -softplus(-x)
    case Transforms.Logistic(a, b) =>
      x - c(2.0) * softplus(x) + c(math.log(b - a))
  }

  /** Elementwise prior log-density (reference `Henbun/priors.py`). */
  def priorLogp(p: Prior, x: Expr): Expr = p match {
    case Priors.Normal => gaussian(x, zero, one)
    case Priors.Gaussian(mu, v) => gaussian(x, c(mu), c(v))
    case Priors.LogNormal(mu, v) => lognormal(x, c(mu), c(v))
    case Priors.Gamma(k, s) => gamma(c(k), c(s), x)
    case Priors.Laplace(mu, s) => laplace(c(mu), c(s), x)
    case Priors.Uniform(lo, hi) => c(-math.log(hi - lo))
  }
}
