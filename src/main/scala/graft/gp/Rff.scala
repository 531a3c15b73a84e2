package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.Column
import graft.ops.VecExpressions

/** Random Fourier features (Rahimi & Recht, "Random Features for
  * Large-Scale Kernel Machines", NeurIPS 2007): the 100 TB-scale GP
  * path.
  *
  * Bochner's theorem factors a stationary kernel through its spectral
  * density; for the unit RBF with lengthscale ℓ (reference `UnitRBF`,
  * `Henbun/gp/kernels.py:103-111`) the spectral draws are
  * ωⱼ ~ N(0, diag(1/ℓ²)), and
  *
  *   φ(x)ⱼ = √(2/D)·cos(ωⱼ·x + bⱼ),  bⱼ ~ U[0, 2π)
  *   E[φ(x)·φ(y)] = K_RBF(x, y)
  *
  * Where the sparse-GP path ([[SparseGP]]) is O(n·m²) against m
  * inducing points (a per-partition gram block + driver Cholesky),
  * the RFF path is a PURE MAP: D model-sized frequency rows are plan
  * constants (like k-means centroids), features come out of one
  * codegen'd pass per row ([[graft.ops.RffFeaturesExpr]]), and GP
  * regression collapses to Bayesian LINEAR regression on φ(x) — the
  * existing ELBO engine (treeAggregate gradients) trains it with no
  * new machinery. No gram matrix, no shuffle, no driver O(n) state:
  * the shape that survives a 1000-executor corpus.
  *
  * Frequencies are DETERMINISTIC: splitmix64 streams feed a
  * Box–Muller transform, so any engine (and the DuckDB oracle)
  * rebuilds the identical table from (seed, D, dims, ℓ).
  */
object Rff {

  /** splitmix64 (Steele et al., "Fast Splittable Pseudorandom Number
    * Generators", OOPSLA 2014) — the same portable integer mix the
    * deterministic samplers use; stateless in the stream index. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, 1) from stream position i of `seed`. */
  private def u01(seed: Long, i: Long): Double =
    (mix64(seed * 0x632be59bd9b4e019L + i) >>> 11).toDouble / (1L << 53).toDouble

  /** Standard normal via Box–Muller on two stream positions (never
    * ln(0): u is offset by 2⁻⁵⁴). */
  private def gauss(seed: Long, i: Long): Double = {
    val u = u01(seed, 2 * i) + math.pow(2.0, -54)
    val v = u01(seed, 2 * i + 1)
    math.sqrt(-2.0 * math.log(u)) * math.cos(2.0 * math.Pi * v)
  }

  /** Frequency matrix W [D, dims] (row-major rows ωⱼ with per-dim
    * 1/ℓ scaling, ARD broadcast as in [[LengthscaleKernel.scale]])
    * and phases b [D]. */
  def frequencies(dims: Int, nFeatures: Int,
                  lengthscales: DenseVector[Double] = DenseVector(1.0),
                  seed: Long = 7L): (DenseMatrix[Double], DenseVector[Double]) = {
    val l = lengthscales
    require(l.length == 1 || l.length == dims,
      s"ARD lengthscale dim ${l.length} != $dims")
    val w = DenseMatrix.tabulate(nFeatures, dims) { (j, k) =>
      gauss(seed, j.toLong * dims + k) /
        (if (l.length == 1) l(0) else l(k))
    }
    val b = DenseVector.tabulate(nFeatures)(j =>
      2.0 * math.Pi * u01(seed + 0x5851f42d4c957f2dL, j))
    (w, b)
  }

  /** Matérn-3/2 spectral frequencies: the spectral density of a
    * Matérn-ν kernel is a multivariate Student-t with 2ν degrees of
    * freedom, so ωⱼ = zⱼ·√(2ν/u), u ~ χ²₂ᵥ (here 2ν = 3: three extra
    * squared normals per feature row), per-dim 1/ℓ scaled. Same
    * φ/estimator as the RBF case — only the frequency law changes
    * ([[Kernels.UnitMatern32]] becomes a pure map too). */
  def frequenciesMatern32(dims: Int, nFeatures: Int,
                          lengthscales: DenseVector[Double] = DenseVector(1.0),
                          seed: Long = 7L): (DenseMatrix[Double], DenseVector[Double]) = {
    val l = lengthscales
    require(l.length == 1 || l.length == dims,
      s"ARD lengthscale dim ${l.length} != $dims")
    val chiSeed = seed + 0x9e3779b97f4a7c15L
    val w = DenseMatrix.tabulate(nFeatures, dims) { (j, k) =>
      var u = 0.0
      var t = 0
      while (t < 3) {
        val z = gauss(chiSeed, j.toLong * 3 + t); u += z * z; t += 1
      }
      gauss(seed, j.toLong * dims + k) * math.sqrt(3.0 / u) /
        (if (l.length == 1) l(0) else l(k))
    }
    val b = DenseVector.tabulate(nFeatures)(j =>
      2.0 * math.Pi * u01(seed + 0x5851f42d4c957f2dL, j))
    (w, b)
  }

  /** Matérn-5/2 spectral frequencies: same Student-t construction as
    * [[frequenciesMatern32]] with 2ν = 5 — five squared normals per
    * feature row, ωⱼ = zⱼ·√(5/u). The smoother Matérn becomes a pure
    * map under the identical φ/estimator. */
  def frequenciesMatern52(dims: Int, nFeatures: Int,
                          lengthscales: DenseVector[Double] = DenseVector(1.0),
                          seed: Long = 7L): (DenseMatrix[Double], DenseVector[Double]) = {
    val l = lengthscales
    require(l.length == 1 || l.length == dims,
      s"ARD lengthscale dim ${l.length} != $dims")
    val chiSeed = seed + 0xc2b2ae3d27d4eb4fL
    val w = DenseMatrix.tabulate(nFeatures, dims) { (j, k) =>
      var u = 0.0
      var t = 0
      while (t < 5) {
        val z = gauss(chiSeed, j.toLong * 5 + t); u += z * z; t += 1
      }
      gauss(seed, j.toLong * dims + k) * math.sqrt(5.0 / u) /
        (if (l.length == 1) l(0) else l(k))
    }
    val b = DenseVector.tabulate(nFeatures)(j =>
      2.0 * math.Pi * u01(seed + 0x5851f42d4c957f2dL, j))
    (w, b)
  }

  /** Driver/Breeze feature map φ(X) [n, D] — the per-row arithmetic
    * (forward-order dot, then cos) is IDENTICAL to the Spark kernel
    * and the DuckDB comprehension, so all three agree bit-for-bit. */
  def featureMap(x: DenseMatrix[Double], w: DenseMatrix[Double],
                 b: DenseVector[Double]): DenseMatrix[Double] = {
    val scale = math.sqrt(2.0 / b.length)
    DenseMatrix.tabulate(x.rows, b.length) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < x.cols) { s += w(j, k) * x(i, k); k += 1 }
      scale * math.cos(s + b(j))
    }
  }

  /** φ of a single point as a plain array (query-side literals). */
  def featureVector(q: Seq[Double], w: DenseMatrix[Double],
                    b: DenseVector[Double]): Array[Double] = {
    val x = DenseMatrix.tabulate(1, q.length)((_, k) => q(k))
    val f = featureMap(x, w, b)
    Array.tabulate(b.length)(f(0, _))
  }

  /** One-pass codegen'd feature-map column over an `array<float|double>`
    * embedding column; W/b ride along as a plan constant. */
  def featuresCol(emb: Column, w: DenseMatrix[Double],
                  b: DenseVector[Double]): Column = {
    val flat = Array.tabulate(w.rows * w.cols)(i => w(i / w.cols, i % w.cols))
    VecExpressions.rffFeatures(emb, flat.toSeq, b.toArray.toSeq, w.cols)
  }

  /** Kernel estimate k̂(x, q) = φ(x)·φ(q) against a fixed query point
    * (φ(q) inlined as a literal) — E[k̂] = K_RBF(x, q). */
  def khatCol(emb: Column, q: Seq[Double], w: DenseMatrix[Double],
              b: DenseVector[Double]): Column =
    VecExpressions.dot(featuresCol(emb, w, b),
      org.apache.spark.sql.functions.typedLit(featureVector(q, w, b).toSeq))
}
