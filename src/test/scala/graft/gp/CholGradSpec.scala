package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector, cholesky}
import org.scalatest.funsuite.AnyFunSuite

/** Forward-mode Cholesky differentiation checked against central
  * finite differences of the exact factorization. */
class CholGradSpec extends AnyFunSuite {

  private val z = Seq(-2.0, -1.1, -0.3, 0.4, 1.2, 2.1)

  private def kOf(ell: Double): DenseMatrix[Double] = {
    val m = z.length
    val k = DenseMatrix.tabulate(m, m) { (i, j) =>
      val d = z(i) - z(j); math.exp(-0.5 * d * d / (ell * ell))
    }
    var i = 0
    while (i < m) { k(i, i) += Kernels.JitterLevel; i += 1 }
    k
  }

  test("lowerInv inverts a Cholesky factor") {
    val l = cholesky(kOf(0.9))
    val inv = CholGrad.lowerInv(l)
    val id = l * inv
    val m = z.length
    for (i <- 0 until m; j <- 0 until m)
      assert(math.abs(id(i, j) - (if (i == j) 1.0 else 0.0)) < 1e-10)
  }

  test("dCholesky matches finite differences of chol(K(ℓ))") {
    val ell = 0.8; val h = 1e-6
    val l = cholesky(kOf(ell))
    val lInv = CholGrad.lowerInv(l)
    val dK = (kOf(ell + h) - kOf(ell - h)) / (2 * h)
    val dL = CholGrad.dCholesky(l, lInv, dK)
    val fd = (cholesky(kOf(ell + h)) - cholesky(kOf(ell - h))) / (2 * h)
    val m = z.length
    for (i <- 0 until m; j <- 0 to i)
      assert(math.abs(dL(i, j) - fd(i, j)) < 1e-4,
        s"dL($i,$j)=${dL(i, j)} fd=${fd(i, j)}")
  }

  test("rbf1dLmInvAndGrad: value matches SparseGP.lmInv, gradient " +
    "matches finite differences") {
    val ell = 0.8; val h = 1e-5
    val (lmInv, dLmInv) = CholGrad.rbf1dLmInvAndGrad(z, ell)
    val zm = new DenseMatrix(z.length, 1, z.toArray)
    val ref = new SparseGP(Kernels.UnitRBF(DenseVector(ell)), zm).lmInv
    val p = CholGrad.lowerInv(cholesky(kOf(ell + h)))
    val q = CholGrad.lowerInv(cholesky(kOf(ell - h)))
    val fd = (p - q) / (2 * h)
    val m = z.length
    for (i <- 0 until m; j <- 0 to i) {
      assert(math.abs(lmInv(i, j) - ref(i, j)) < 1e-10)
      assert(math.abs(dLmInv(i, j) - fd(i, j)) < 1e-3 * (1 + fd(i, j).abs),
        s"dLmInv($i,$j)=${dLmInv(i, j)} fd=${fd(i, j)}")
    }
  }

  test("matern1dLmInvAndGrad: value matches SparseGP.lmInv for " +
    "UnitMatern32, gradient matches finite differences") {
    val ell = 0.8; val h = 1e-5
    def kOfM(l: Double): DenseMatrix[Double] = {
      val m = z.length
      val k = DenseMatrix.tabulate(m, m) { (i, j) =>
        val d = z(i) - z(j)
        val a = math.sqrt(3.0) * math.sqrt(d * d + 1e-12) / l
        (1.0 + a) * math.exp(-a)
      }
      (0 until m).foreach(i => k(i, i) += Kernels.JitterLevel)
      k
    }
    val (lmInv, dLmInv) = CholGrad.matern1dLmInvAndGrad(z, ell)
    val zm = new DenseMatrix(z.length, 1, z.toArray)
    val ref = new SparseGP(Kernels.UnitMatern32(DenseVector(ell)), zm).lmInv
    val p = CholGrad.lowerInv(cholesky(kOfM(ell + h)))
    val q = CholGrad.lowerInv(cholesky(kOfM(ell - h)))
    val fd = (p - q) / (2 * h)
    val m = z.length
    for (i <- 0 until m; j <- 0 to i) {
      assert(math.abs(lmInv(i, j) - ref(i, j)) < 1e-10,
        s"lmInv($i,$j) vs SparseGP")
      assert(math.abs(dLmInv(i, j) - fd(i, j)) < 1e-3 * (1 + fd(i, j).abs),
        s"dLmInv($i,$j)=${dLmInv(i, j)} fd=${fd(i, j)}")
    }
  }
}
