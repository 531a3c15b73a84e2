package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.autodiff.Expr

/** Sparse-GP regression through the ELBO engine: the whitened
  * inducing-point parameterization as autodiff features.
  *
  * With fixed kernel hyperparameters and inducing points z, the
  * whitened posterior GP mean is f(x) = Σ_j u_j·φ_j(x) with
  * φ(x) = Lm⁻¹·k(z, x) (reference `SparseGP.samples` /
  * `_effective_LT`, `gp/gp.py:99-174`) — so a GP regression is a
  * linear model in φ whose weights u carry a whitened N(0,1) prior.
  * This builder emits φ_j as expressions over a scalar input, letting
  * [[graft.optimize.Elbo]] train u (and the noise) end-to-end,
  * distributed, with gradients flowing through the reparameterized
  * posterior exactly as the reference's GPR notebooks do.
  *
  * (Kernel-hyperparameter learning needs matrix-valued autodiff
  * through the Cholesky — out of scope; the reference's own sparse
  * demos mostly fix z and lengthscales too.)
  */
object GpExpr {

  /** φ_j(x) for a 1-d UnitRBF sparse GP. `z` are the inducing
    * locations; constants (Lm⁻¹) come from the same Breeze Cholesky
    * the runtime GP path uses. */
  def whitenedFeatures1d(x: Expr, z: Seq[Double],
                         lengthscale: Double): IndexedSeq[Expr] = {
    val zm = new DenseMatrix(z.length, 1, z.toArray)
    val sgp = new SparseGP(Kernels.UnitRBF(DenseVector(lengthscale)), zm)
    val lmInv = sgp.lmInv // lower triangular [m,m]
    val inv2l2 = -0.5 / (lengthscale * lengthscale)
    val ks = z.map(zj => Expr.exp(Expr.c(inv2l2) * (x - Expr.c(zj)).sq))
    z.indices.map { j =>
      Expr.sum((0 to j).map(r => Expr.c(lmInv(j, r)) * ks(r)))
    }
  }

  /** Driver-side predictive mean at points `xs` for trained whitened
    * weights `uMu` — the Breeze mirror of the expression features (for
    * evaluation/plots after training). */
  def predictiveMean1d(xs: Seq[Double], z: Seq[Double], lengthscale: Double,
                       uMu: DenseVector[Double]): Seq[Double] = {
    val zm = new DenseMatrix(z.length, 1, z.toArray)
    val sgp = new SparseGP(Kernels.UnitRBF(DenseVector(lengthscale)), zm)
    val xm = new DenseMatrix(xs.length, 1, xs.toArray)
    val lnT = sgp.effectiveLT(xm) // [m, n]
    (lnT.t * uMu).toScalaVector
  }
}
