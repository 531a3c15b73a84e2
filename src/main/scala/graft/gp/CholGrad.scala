package graft.gp

import breeze.linalg.DenseMatrix

/** Forward-mode differentiation through the Cholesky factorization —
  * the driver-side piece that makes kernel hyperparameters learnable.
  *
  * Standard result (I. Murray, "Differentiation of the Cholesky
  * decomposition", arXiv:1602.07527 §2): for K = LLᵀ and a symmetric
  * perturbation dK,
  *
  *     dL = L · Φ(L⁻¹ · dK · L⁻ᵀ)
  *
  * where Φ keeps the strict lower triangle and halves the diagonal.
  * From dL, the inverse-factor sensitivity is d(L⁻¹) = −L⁻¹·dL·L⁻¹.
  * All matrices are MODEL-sized ([m,m] inducing blocks), so this runs
  * on the driver in O(m³) — nothing distributed depends on it. The
  * reference has no analog (TF autodiffs its batch Cholesky for it;
  * Spark has no autodiff, hence this explicit forward mode).
  */
object CholGrad {

  /** Φ: strict lower triangle kept, diagonal halved, upper zeroed. */
  private def phi(a: DenseMatrix[Double]): DenseMatrix[Double] =
    DenseMatrix.tabulate(a.rows, a.cols) { (i, j) =>
      if (i > j) a(i, j) else if (i == j) 0.5 * a(i, j) else 0.0
    }

  /** Explicit inverse of a lower-triangular matrix by forward
    * substitution on the identity (the [[SparseGP.lmInv]] algorithm). */
  def lowerInv(l: DenseMatrix[Double]): DenseMatrix[Double] = {
    val m = l.rows
    val inv = DenseMatrix.zeros[Double](m, m)
    var c = 0
    while (c < m) {
      var i = c
      while (i < m) {
        var s = if (i == c) 1.0 else 0.0
        var j = c
        while (j < i) { s -= l(i, j) * inv(j, c); j += 1 }
        inv(i, c) = s / l(i, i)
        i += 1
      }
      c += 1
    }
    inv
  }

  /** dL for L = chol(K) under symmetric perturbation dK. */
  def dCholesky(l: DenseMatrix[Double], lInv: DenseMatrix[Double],
                dK: DenseMatrix[Double]): DenseMatrix[Double] =
    l * phi(lInv * dK * lInv.t)

  /** d(L⁻¹) given L⁻¹ and dL. */
  def dLowerInv(lInv: DenseMatrix[Double],
                dL: DenseMatrix[Double]): DenseMatrix[Double] =
    -(lInv * dL * lInv)

  /** (Lm⁻¹, d(Lm⁻¹)/dℓ) for a 1-d UnitRBF inducing block at
    * lengthscale ℓ: K_ij = exp(−(z_i−z_j)²/(2ℓ²)) + jitter·δ_ij, so
    * dK_ij/dℓ = K°_ij·(z_i−z_j)²/ℓ³ (jitter is ℓ-independent). */
  def rbf1dLmInvAndGrad(z: Seq[Double], ell: Double)
      : (DenseMatrix[Double], DenseMatrix[Double]) = {
    val (lInv, grads) = rbfArdLmInvAndGrad(
      new DenseMatrix(z.length, 1, z.toArray),
      breeze.linalg.DenseVector(ell))
    (lInv, grads.head)
  }

  /** Sensitivities of Lm⁻¹ to EACH 1-d inducing location z_r (the
    * reference trains z as a Variable, `gp/gp.py:86-97`):
    * ∂K_ij/∂z_r = K°_ij·(−(z_i−z_j)/ℓ²)·(δ_ir − δ_jr). One O(m³)
    * Cholesky-forward pass per inducing point — O(m⁴) total, driver
    * side, fine for the m ≤ a-few-hundred regime sparse GPs live in. */
  def rbf1dLmInvZGrads(z: Seq[Double], ell: Double)
      : Seq[DenseMatrix[Double]] = {
    val m = z.length
    val k0 = DenseMatrix.tabulate(m, m) { (i, j) =>
      val d = z(i) - z(j); math.exp(-0.5 * d * d / (ell * ell))
    }
    val k = k0.copy
    var i = 0
    while (i < m) { k(i, i) += Kernels.JitterLevel; i += 1 }
    val l = breeze.linalg.cholesky(k)
    val lInv = lowerInv(l)
    (0 until m).map { r =>
      val dK = DenseMatrix.tabulate(m, m) { (i, j) =>
        val di = if (i == r) 1.0 else 0.0
        val dj = if (j == r) 1.0 else 0.0
        k0(i, j) * (-(z(i) - z(j)) / (ell * ell)) * (di - dj)
      }
      dLowerInv(lInv, dCholesky(l, lInv, dK))
    }
  }

  /** (Lm⁻¹, d(Lm⁻¹)/dℓ) for a 1-d UnitCsymRBF inducing block
    * (reference `gp/kernels.py:113-131`, learnable ℓ `gp/kernels.py:
    * 37-51`): K_ij = K⁻_ij + K⁺_ij + jitter·δ_ij with
    * K∓_ij = exp(−(z_i ∓ z_j)²/(2ℓ²)), so
    * dK_ij/dℓ = K⁻_ij·(z_i−z_j)²/ℓ³ + K⁺_ij·(z_i+z_j)²/ℓ³. */
  def csym1dLmInvAndGrad(z: Seq[Double], ell: Double)
      : (DenseMatrix[Double], DenseMatrix[Double]) = {
    val m = z.length
    val km = DenseMatrix.tabulate(m, m) { (i, j) =>
      val d = z(i) - z(j); math.exp(-0.5 * d * d / (ell * ell))
    }
    val kp = DenseMatrix.tabulate(m, m) { (i, j) =>
      val d = z(i) + z(j); math.exp(-0.5 * d * d / (ell * ell))
    }
    val k = km + kp
    var i = 0
    while (i < m) { k(i, i) += Kernels.JitterLevel; i += 1 }
    val l = breeze.linalg.cholesky(k)
    val lInv = lowerInv(l)
    val dK = DenseMatrix.tabulate(m, m) { (i, j) =>
      val dm = z(i) - z(j); val dp = z(i) + z(j)
      (km(i, j) * dm * dm + kp(i, j) * dp * dp) / (ell * ell * ell)
    }
    (lInv, dLowerInv(lInv, dCholesky(l, lInv, dK)))
  }

  /** (Lm⁻¹, d(Lm⁻¹)/dℓ) for a 1-d UnitMatern32 inducing block:
    * K_ij = (1+a)e^{−a} with a = √3·r/ℓ, r = √((z_i−z_j)² + 1e-12)
    * (the same ε as [[LengthscaleKernel.euclidDist]], so the gram
    * matches the Breeze kernel bit-for-bit). d[(1+a)e^{−a}]/da =
    * −a·e^{−a} and da/dℓ = −a/ℓ, so dK_ij/dℓ = a²·e^{−a}/ℓ. */
  def matern1dLmInvAndGrad(z: Seq[Double], ell: Double)
      : (DenseMatrix[Double], DenseMatrix[Double]) = {
    val m = z.length
    val a0 = DenseMatrix.tabulate(m, m) { (i, j) =>
      val d = z(i) - z(j)
      math.sqrt(3.0) * math.sqrt(d * d + 1e-12) / ell
    }
    val k = DenseMatrix.tabulate(m, m) { (i, j) =>
      (1.0 + a0(i, j)) * math.exp(-a0(i, j))
    }
    var i = 0
    while (i < m) { k(i, i) += Kernels.JitterLevel; i += 1 }
    val l = breeze.linalg.cholesky(k)
    val lInv = lowerInv(l)
    val dK = DenseMatrix.tabulate(m, m) { (i, j) =>
      val a = a0(i, j)
      a * a * math.exp(-a) / ell
    }
    (lInv, dLowerInv(lInv, dCholesky(l, lInv, dK)))
  }

  /** ARD inducing-location sensitivities: d(Lm⁻¹)/dz(r,c) for every
    * inducing point r and coordinate c (m·d Cholesky-forward passes,
    * driver side):
    * ∂K_ij/∂z_rc = K°_ij·(−(z_ic−z_jc)/ℓ_c²)·(δ_ir − δ_jr). */
  def rbfArdLmInvZGrads(z: DenseMatrix[Double],
                        ell: breeze.linalg.DenseVector[Double])
      : IndexedSeq[IndexedSeq[DenseMatrix[Double]]] = {
    val m = z.rows; val d = z.cols
    require(ell.length == d)
    val k0 = DenseMatrix.tabulate(m, m) { (i, j) =>
      var s = 0.0; var c = 0
      while (c < d) {
        val dd = (z(i, c) - z(j, c)) / ell(c); s += dd * dd; c += 1
      }
      math.exp(-0.5 * s)
    }
    val k = k0.copy
    var i = 0
    while (i < m) { k(i, i) += Kernels.JitterLevel; i += 1 }
    val l = breeze.linalg.cholesky(k)
    val lInv = lowerInv(l)
    (0 until m).map { r =>
      (0 until d).map { c =>
        val dK = DenseMatrix.tabulate(m, m) { (i, j) =>
          val di = if (i == r) 1.0 else 0.0
          val dj = if (j == r) 1.0 else 0.0
          k0(i, j) * (-(z(i, c) - z(j, c)) / (ell(c) * ell(c))) * (di - dj)
        }
        dLowerInv(lInv, dCholesky(l, lInv, dK))
      }
    }
  }

  /** ARD generalization: z is [m,d], `ell` has one entry per dimension
    * (reference ARD lengthscales, `gp/kernels.py:37-51`). Returns Lm⁻¹
    * and its sensitivity to EACH ℓ_k:
    * ∂K_ij/∂ℓ_k = K°_ij·(z_ik−z_jk)²/ℓ_k³. */
  def rbfArdLmInvAndGrad(z: DenseMatrix[Double],
                         ell: breeze.linalg.DenseVector[Double])
      : (DenseMatrix[Double], Seq[DenseMatrix[Double]]) = {
    val m = z.rows; val d = z.cols
    require(ell.length == d, s"ARD dim ${ell.length} != ${d}")
    val k0 = DenseMatrix.tabulate(m, m) { (i, j) =>
      var s = 0.0; var c = 0
      while (c < d) {
        val dd = (z(i, c) - z(j, c)) / ell(c); s += dd * dd; c += 1
      }
      math.exp(-0.5 * s)
    }
    val k = k0.copy
    var i = 0
    while (i < m) { k(i, i) += Kernels.JitterLevel; i += 1 }
    val l = breeze.linalg.cholesky(k)
    val lInv = lowerInv(l)
    val grads = (0 until d).map { c =>
      val dK = DenseMatrix.tabulate(m, m) { (i, j) =>
        val dd = z(i, c) - z(j, c)
        k0(i, j) * dd * dd / (ell(c) * ell(c) * ell(c))
      }
      dLowerInv(lInv, dCholesky(l, lInv, dK))
    }
    (lInv, grads)
  }
}
