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
  * Kernel-hyperparameter learning (ℓ as a trainable Param) works by
  * splitting the ℓ-dependence: the kernel row k(z_j, x; ℓ) depends on
  * ℓ exactly inside the scalar tape, while the matrix part Lm⁻¹(ℓ) is
  * linearized at the current ℓ₀ with the exact driver-side derivative
  * d(Lm⁻¹)/dℓ from [[CholGrad]] (forward mode through the Cholesky).
  * Gradients are therefore exact AT ℓ₀; [[GpExpr.trainSparse1d]]
  * re-linearizes every round while carrying Adam state across the
  * tape rebuilds, so the approximation never drifts far.
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

  /** φ_j(x; ℓ) with ℓ a live expression (a positive-transformed Param
    * read): exact ℓ-dependence through the kernel rows, first-order
    * ℓ-dependence through Lm⁻¹ around `ell0`. Equals
    * [[whitenedFeatures1d]] when ℓ = ell0. */
  def whitenedFeatures1dLearnable(x: Expr, ell: Expr, ell0: Double,
                                  z: Seq[Double]): IndexedSeq[Expr] = {
    val (a0, dA) = CholGrad.rbf1dLmInvAndGrad(z, ell0)
    val dl = ell - Expr.c(ell0)
    val ks = z.map(zj =>
      Expr.exp(Expr.c(-0.5) * ((x - Expr.c(zj)) / ell).sq))
    z.indices.map { j =>
      Expr.sum((0 to j).map(r =>
        (Expr.c(a0(j, r)) + Expr.c(dA(j, r)) * dl) * ks(r)))
    }
  }

  /** φ_j(x) for a 1-d UnitCsymRBF sparse GP (reference
    * `gp/kernels.py:113-131`): kernel rows k_r(x) =
    * exp(−(x−z_r)²/2ℓ²) + exp(−(x+z_r)²/2ℓ²), Lm⁻¹ from the same
    * Breeze Cholesky the runtime csym GP path uses. */
  def whitenedFeaturesCsym1d(x: Expr, z: Seq[Double],
                             lengthscale: Double): IndexedSeq[Expr] = {
    val zm = new DenseMatrix(z.length, 1, z.toArray)
    val sgp = new SparseGP(Kernels.UnitCsymRBF(DenseVector(lengthscale)), zm)
    val lmInv = sgp.lmInv
    val inv2l2 = -0.5 / (lengthscale * lengthscale)
    val ks = z.map(zj =>
      Expr.exp(Expr.c(inv2l2) * (x - Expr.c(zj)).sq) +
        Expr.exp(Expr.c(inv2l2) * (x + Expr.c(zj)).sq))
    z.indices.map { j =>
      Expr.sum((0 to j).map(r => Expr.c(lmInv(j, r)) * ks(r)))
    }
  }

  /** φ_j(x; ℓ) for UnitCsymRBF with ℓ live: exact ℓ-dependence through
    * the (symmetrized) kernel rows, first-order through Lm⁻¹ around
    * `ell0` via [[CholGrad.csym1dLmInvAndGrad]]. Equals
    * [[whitenedFeaturesCsym1d]] when ℓ = ell0 — same scheme as the RBF
    * path, so CsymRBF users can fit ℓ too (the surface the reference
    * gets from TF autodiff for ANY kernel). */
  def whitenedFeaturesCsym1dLearnable(x: Expr, ell: Expr, ell0: Double,
                                      z: Seq[Double]): IndexedSeq[Expr] = {
    val (a0, dA) = CholGrad.csym1dLmInvAndGrad(z, ell0)
    val dl = ell - Expr.c(ell0)
    val ks = z.map(zj =>
      Expr.exp(Expr.c(-0.5) * ((x - Expr.c(zj)) / ell).sq) +
        Expr.exp(Expr.c(-0.5) * ((x + Expr.c(zj)) / ell).sq))
    z.indices.map { j =>
      Expr.sum((0 to j).map(r =>
        (Expr.c(a0(j, r)) + Expr.c(dA(j, r)) * dl) * ks(r)))
    }
  }

  /** φ_j(x; ℓ, z) with BOTH the lengthscale and the m inducing
    * locations live (the reference's trainable z, `gp/gp.py:86-97`):
    * exact (ℓ, z_r) dependence through the kernel rows, first-order
    * dependence through Lm⁻¹ around (ell0, z0). Equals
    * [[whitenedFeatures1d]] at the linearization point. */
  def whitenedFeatures1dLearnableZ(x: Expr, ell: Expr,
      zExprs: IndexedSeq[Expr], ell0: Double,
      z0: Seq[Double]): IndexedSeq[Expr] = {
    val m = z0.length
    require(zExprs.length == m)
    val (a0, dAl) = CholGrad.rbf1dLmInvAndGrad(z0, ell0)
    val dAz = CholGrad.rbf1dLmInvZGrads(z0, ell0)
    val dl = ell - Expr.c(ell0)
    val dz = (0 until m).map(r => zExprs(r) - Expr.c(z0(r)))
    val ks = (0 until m).map(r =>
      Expr.exp(Expr.c(-0.5) * ((x - zExprs(r)) / ell).sq))
    (0 until m).map { j =>
      Expr.sum((0 to j).map { r =>
        val zTerms = (0 until m).filter(s => dAz(s)(j, r) != 0.0)
          .map(s => Expr.c(dAz(s)(j, r)) * dz(s))
        val lin = Expr.c(a0(j, r)) + Expr.c(dAl(j, r)) * dl +
          Expr.sum(zTerms)
        lin * ks(r)
      })
    }
  }

  /** ARD d-dimensional generalization of
    * [[whitenedFeatures1dLearnable]]: `xs` are the d input-coordinate
    * expressions, `ells` the d (positive-transformed) lengthscale
    * reads, `ell0` the linearization point. */
  def whitenedFeaturesArdLearnable(xs: IndexedSeq[Expr],
      ells: IndexedSeq[Expr], ell0: DenseVector[Double],
      z: DenseMatrix[Double]): IndexedSeq[Expr] = {
    val d = z.cols
    require(xs.length == d && ells.length == d,
      s"inputs ${xs.length}/lengthscales ${ells.length} != z dims $d")
    val (a0, dA) = CholGrad.rbfArdLmInvAndGrad(z, ell0)
    val dls = (0 until d).map(c => ells(c) - Expr.c(ell0(c)))
    val ks = (0 until z.rows).map { r =>
      val sq = Expr.sum((0 until d).map(c =>
        ((xs(c) - Expr.c(z(r, c))) / ells(c)).sq))
      Expr.exp(Expr.c(-0.5) * sq)
    }
    (0 until z.rows).map { j =>
      Expr.sum((0 to j).map { r =>
        val lin = (0 until d).map(c => Expr.c(dA(c)(j, r)) * dls(c))
        (Expr.c(a0(j, r)) + Expr.sum(lin)) * ks(r)
      })
    }
  }

  /** ARD features with live lengthscales AND live inducing locations
    * (`zExprs(r)(c)` is point r, coordinate c). */
  def whitenedFeaturesArdLearnableZ(xs: IndexedSeq[Expr],
      ells: IndexedSeq[Expr], zExprs: IndexedSeq[IndexedSeq[Expr]],
      ell0: DenseVector[Double], z0: DenseMatrix[Double]): IndexedSeq[Expr] = {
    val m = z0.rows; val d = z0.cols
    require(xs.length == d && ells.length == d && zExprs.length == m)
    val (a0, dAl) = CholGrad.rbfArdLmInvAndGrad(z0, ell0)
    val dAz = CholGrad.rbfArdLmInvZGrads(z0, ell0)
    val dls = (0 until d).map(c => ells(c) - Expr.c(ell0(c)))
    val dzs = (0 until m).map(r =>
      (0 until d).map(c => zExprs(r)(c) - Expr.c(z0(r, c))))
    val ks = (0 until m).map { r =>
      val sq = Expr.sum((0 until d).map(c =>
        ((xs(c) - zExprs(r)(c)) / ells(c)).sq))
      Expr.exp(Expr.c(-0.5) * sq)
    }
    (0 until m).map { j =>
      Expr.sum((0 to j).map { r =>
        val lTerms = (0 until d).filter(c => dAl(c)(j, r) != 0.0)
          .map(c => Expr.c(dAl(c)(j, r)) * dls(c))
        val zTerms = for {
          s <- 0 until m; c <- 0 until d
          if dAz(s)(c)(j, r) != 0.0
        } yield Expr.c(dAz(s)(c)(j, r)) * dzs(s)(c)
        (Expr.c(a0(j, r)) + Expr.sum(lTerms) + Expr.sum(zTerms)) * ks(r)
      })
    }
  }

  /** Trained ARD sparse-GP regression handle. */
  final case class SparseGpArdFit(module: graft.core.Module,
      u: graft.core.Variational.Normal, noiseVar: graft.core.Param,
      ell: graft.core.Param, z: DenseMatrix[Double], elbo: Double) {
    def lengthscales: DenseVector[Double] = ell.value
    /** Predictive mean at rows of `xs` [n,d] (driver Breeze mirror). */
    def predictiveMean(xs: DenseMatrix[Double]): Seq[Double] = {
      val sgp = new SparseGP(Kernels.UnitRBF(lengthscales), z)
      (sgp.effectiveLT(xs).t * u.qMu.value).toScalaVector
    }
    /** DISTRIBUTED posterior predictive over d input columns — the ARD
      * form of [[SparseGpFit.posteriorSampleColumn]] (same one-scan
      * sparse sampling path; θ travels in the closure). */
    def posteriorSampleColumn(df: org.apache.spark.sql.DataFrame,
        xCols: Seq[String], k: Int, seed: Long = 0L,
        outCol: String = "gp_sample"): org.apache.spark.sql.DataFrame =
      GpExpr.fitSampleColumn(new SparseGP(Kernels.UnitRBF(lengthscales), z),
        u, df, xCols, k, seed, outCol)
  }

  /** Shared draw-and-scan: sample k whitened-weight vectors from q(u)
    * and run the kernel-generic sparse sampling path. */
  private def fitSampleColumn(sgp: SparseGP,
      u: graft.core.Variational.Normal, df: org.apache.spark.sql.DataFrame,
      xCols: Seq[String], k: Int, seed: Long,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val mu = u.qMu.value
    val sd = u.qSqrt.value.map(math.exp)
    val rng = new scala.util.Random(seed)
    val uDraws = DenseMatrix.tabulate(k, mu.length)((_, j) =>
      mu(j) + sd(j) * rng.nextGaussian())
    sgp.sampleColumn(df, xCols, uDraws, seed = seed, outCol = outCol)
  }

  /** d-dimensional ARD sparse-GP regression with learnable per-dim
    * lengthscales and (optionally) inducing locations — the
    * reference's ARD kernel surface (`gp/kernels.py:37-51`) plus its
    * trainable z (`gp/gp.py:86-97`). Same scheme as
    * [[trainSparse1d]]: ℓ joint, z alternating small-lr, Lm⁻¹
    * re-linearized per round. */
  def trainSparseArd(ds: graft.data.DataSet, xCols: Seq[String],
      yCol: String, z: DenseMatrix[Double],
      ell0: DenseVector[Double], learnEll: Boolean = true,
      learnZ: Boolean = false,
      rounds: Int = 8, stepsPerRound: Int = 100, lr: Double = 0.05,
      minibatchSize: Int = -1, seed: Long = 0L): SparseGpArdFit = {
    import graft.core._
    import graft.optimize.{Adam, Elbo}
    val m = z.rows; val d = z.cols
    val hyper = "hyper"
    val root = new Module
    val u = root.add("u", new Variational.Normal(Seq(m)))
    val noise = root.add("noise", new Param(Seq(1),
      transform = graft.functions.Transforms.Log1pe(), initMean = 0.1,
      initStddev = 0.0))
    val ell = root.add("ell", new Param(Seq(d),
      transform = graft.functions.Transforms.Log1pe(),
      initMean = 1.0, initStddev = 0.0,
      collection = if (learnEll) Collections.Variables else "fixed_hyper"))
    val zp = root.add("z", new Param(Seq(m, d), initMean = 0.0,
      initStddev = 0.0,
      collection = if (learnZ) hyper else "fixed_hyper"))
    ell.assign(ell0.copy)
    // flat layout r*d+c (matches the grouping of ctx.read below)
    zp.assign(DenseVector.tabulate(m * d)(i => z(i / d, i % d)))
    root.initialize()
    def zMat(): DenseMatrix[Double] = {
      val v = zp.value
      DenseMatrix.tabulate(m, d)((r, c) => v(r * d + c))
    }
    def mkElbo(ellLin: DenseVector[Double], zLin: DenseMatrix[Double]) =
      new Elbo(root, ds, xCols :+ yCol, ctx => {
        val zFlat = ctx.read(zp)
        val zExprs = (0 until m).map(r =>
          (0 until d).map(c => zFlat(r * d + c)).toIndexedSeq)
        val phi = whitenedFeaturesArdLearnableZ(
          xCols.toIndexedSeq.map(ctx.in), ctx.read(ell), zExprs,
          ellLin, zLin)
        val us = ctx.sample(u)
        val f = Expr.sum((0 until m).map(j => us(j) * phi(j)))
        graft.autodiff.ExprFns.gaussian(ctx.in(yCol), f, ctx.read1(noise))
      }, seed = seed)
    var elbo = mkElbo(ell.value, zMat())
    val adamVar = new Adam(elbo.nSlots, lr)
    val adamHyp = new Adam(elbo.nSlots, lr / 5)
    val hyperSteps = math.max(10, stepsPerRound / 4)
    val learnHyper = learnEll || learnZ
    var last = 0.0
    var r = 0
    while (r < rounds) {
      last = elbo.optimize(stepsPerRound, minibatchSize, lr,
        adamState = adamVar)
      if (learnZ) {
        last = elbo.optimize(hyperSteps, minibatchSize, lr / 5,
          collection = hyper, adamState = adamHyp)
      }
      r += 1
      if (r < rounds && learnHyper) elbo = mkElbo(ell.value, zMat())
    }
    SparseGpArdFit(root, u, noise, ell, zMat(), last)
  }

  /** Trained sparse-GP regression handle. `z` is the FINAL inducing
    * configuration (learned when `learnZ`). */
  final case class SparseGpFit(module: graft.core.Module,
      u: graft.core.Variational.Normal, noiseVar: graft.core.Param,
      ell: graft.core.Param, z: Seq[Double], elbo: Double) {
    def lengthscale: Double = ell.value(0)
    def predictiveMean(xs: Seq[Double]): Seq[Double] =
      predictiveMean1d(xs, z, lengthscale, u.qMu.value)

    /** DISTRIBUTED posterior predictive: appends `outCol`, an array of
      * `k` GP-posterior samples per row (draws u ~ q, then the sparse
      * sampling path with the learned hyperparameters and diagonal
      * Nyström correction) — the trained-model analog of the reference
      * EP3 loop `[m.run(op) for _ in range(k)]`. One scan; z and Lm⁻¹
      * travel in the closure. */
    def posteriorSampleColumn(df: org.apache.spark.sql.DataFrame,
        xCol: String, k: Int, seed: Long = 0L,
        outCol: String = "gp_sample"): org.apache.spark.sql.DataFrame = {
      val zm = new DenseMatrix(z.length, 1, z.toArray)
      GpExpr.fitSampleColumn(
        new SparseGP(Kernels.UnitRBF(DenseVector(lengthscale)), zm),
        u, df, Seq(xCol), k, seed, outCol)
    }
  }

  /** End-to-end 1-d sparse-GP regression y ~ GP(x) + N(0, σ²) with
    * learnable lengthscale, noise variance, whitened inducing weights,
    * and (optionally) the inducing locations themselves — the full
    * `notebooks/GaussianProcess.ipynb` workflow incl. the
    * hyperparameter training the reference gets from TF autodiff.
    * Runs `rounds` × `stepsPerRound` Adam steps, rebuilding the tape
    * each round at the current (ℓ, z) (constants re-linearized) while
    * the DataSet's projected-vector cache and shared Adam states keep
    * rebuilds cheap and the trajectory smooth. z-refinement is a LOCAL
    * search (alternating, small-lr): initialize z sensibly (quantiles
    * / k-means of x), as the reference demos do, and let gradients
    * fine-tune placement. */
  def trainSparse1d(ds: graft.data.DataSet, xCol: String, yCol: String,
      z: Seq[Double], ell0: Double = 1.0, learnEll: Boolean = true,
      learnZ: Boolean = false,
      rounds: Int = 8, stepsPerRound: Int = 100, lr: Double = 0.05,
      minibatchSize: Int = -1, seed: Long = 0L): SparseGpFit = {
    import graft.core._
    import graft.optimize.{Adam, Elbo}
    val m = z.length
    val root = new Module
    val u = root.add("u", new Variational.Normal(Seq(m)))
    val noise = root.add("noise", new Param(Seq(1),
      transform = graft.functions.Transforms.Log1pe(), initMean = 0.1,
      initStddev = 0.0))
    // ℓ trains JOINTLY with the variational parameters (smooth, and
    // empirically stable). The inducing locations z are different:
    // Adam's normalized updates would walk them far outside the Lm⁻¹
    // linearization's trust region within one round, so they sit in
    // their own collection and get smaller alternating steps capped at
    // ~0.3·spacing per round (the classic small-hyper-lr practice —
    // the reference's Expert notebook also drops lr for refinement).
    val hyper = "hyper"
    val ell = root.add("ell", new Param(Seq(1),
      transform = graft.functions.Transforms.Log1pe(), initMean = ell0,
      initStddev = 0.0,
      collection = if (learnEll) Collections.Variables else "fixed_hyper"))
    val zp = root.add("z", new Param(Seq(m), initMean = 0.0,
      initStddev = 0.0,
      collection = if (learnZ) hyper else "fixed_hyper"))
    zp.assign(breeze.linalg.DenseVector(z.toArray)); root.initialize()
    def mkElbo(ellLin: Double, zLin: Seq[Double]) =
      new Elbo(root, ds, Seq(xCol, yCol), ctx => {
        val phi = whitenedFeatures1dLearnableZ(ctx.in(xCol),
          ctx.read1(ell), ctx.read(zp), ellLin, zLin)
        val us = ctx.sample(u)
        val f = Expr.sum((0 until m).map(j => us(j) * phi(j)))
        graft.autodiff.ExprFns.gaussian(ctx.in(yCol), f, ctx.read1(noise))
      }, seed = seed)
    var elbo = mkElbo(ell.value(0), zp.value.toScalaVector)
    val adamVar = new Adam(elbo.nSlots, lr)
    val adamHyp = new Adam(elbo.nSlots, lr / 5)
    val hyperSteps = math.max(10, stepsPerRound / 4)
    val learnHyper = learnEll || learnZ
    var last = 0.0
    var r = 0
    while (r < rounds) {
      last = elbo.optimize(stepsPerRound, minibatchSize, lr,
        adamState = adamVar)
      if (learnZ) {
        last = elbo.optimize(hyperSteps, minibatchSize, lr / 5,
          collection = hyper, adamState = adamHyp)
      }
      r += 1
      // re-linearize Lm⁻¹ at the moved hyperparameters
      if (r < rounds && learnHyper)
        elbo = mkElbo(ell.value(0), zp.value.toScalaVector)
    }
    SparseGpFit(root, u, noise, ell, zp.value.toScalaVector, last)
  }

  /** Trained csym sparse-GP regression handle. */
  final case class SparseGpCsymFit(module: graft.core.Module,
      u: graft.core.Variational.Normal, noiseVar: graft.core.Param,
      ell: graft.core.Param, z: Seq[Double], elbo: Double) {
    def lengthscale: Double = ell.value(0)
    def predictiveMean(xs: Seq[Double]): Seq[Double] = {
      val zm = new DenseMatrix(z.length, 1, z.toArray)
      val sgp = new SparseGP(
        Kernels.UnitCsymRBF(DenseVector(lengthscale)), zm)
      val xm = new DenseMatrix(xs.length, 1, xs.toArray)
      (sgp.effectiveLT(xm).t * u.qMu.value).toScalaVector
    }
    /** DISTRIBUTED posterior predictive under the csym kernel
      * ([[SparseGP.sampleColumn]] is kernel-generic). */
    def posteriorSampleColumn(df: org.apache.spark.sql.DataFrame,
        xCol: String, k: Int, seed: Long = 0L,
        outCol: String = "gp_sample"): org.apache.spark.sql.DataFrame = {
      val zm = new DenseMatrix(z.length, 1, z.toArray)
      GpExpr.fitSampleColumn(
        new SparseGP(Kernels.UnitCsymRBF(DenseVector(lengthscale)), zm),
        u, df, Seq(xCol), k, seed, outCol)
    }
  }

  /** 1-d sparse-GP regression under the cylindrically-symmetric RBF
    * with learnable ℓ — same re-linearized scheme as
    * [[trainSparse1d]] (ℓ joint, Lm⁻¹ re-linearized per round, Adam
    * state carried across tape rebuilds). */
  def trainSparseCsym1d(ds: graft.data.DataSet, xCol: String, yCol: String,
      z: Seq[Double], ell0: Double = 1.0, learnEll: Boolean = true,
      rounds: Int = 8, stepsPerRound: Int = 100, lr: Double = 0.05,
      minibatchSize: Int = -1, seed: Long = 0L): SparseGpCsymFit = {
    import graft.core._
    import graft.optimize.{Adam, Elbo}
    val m = z.length
    val root = new Module
    val u = root.add("u", new Variational.Normal(Seq(m)))
    val noise = root.add("noise", new Param(Seq(1),
      transform = graft.functions.Transforms.Log1pe(), initMean = 0.1,
      initStddev = 0.0))
    val ell = root.add("ell", new Param(Seq(1),
      transform = graft.functions.Transforms.Log1pe(), initMean = ell0,
      initStddev = 0.0,
      collection = if (learnEll) Collections.Variables else "fixed_hyper"))
    root.initialize()
    def mkElbo(ellLin: Double) =
      new Elbo(root, ds, Seq(xCol, yCol), ctx => {
        val phi = whitenedFeaturesCsym1dLearnable(ctx.in(xCol),
          ctx.read1(ell), ellLin, z)
        val us = ctx.sample(u)
        val f = Expr.sum((0 until m).map(j => us(j) * phi(j)))
        graft.autodiff.ExprFns.gaussian(ctx.in(yCol), f, ctx.read1(noise))
      }, seed = seed)
    var elbo = mkElbo(ell.value(0))
    val adamVar = new Adam(elbo.nSlots, lr)
    var last = 0.0
    var r = 0
    while (r < rounds) {
      last = elbo.optimize(stepsPerRound, minibatchSize, lr,
        adamState = adamVar)
      r += 1
      if (r < rounds && learnEll) elbo = mkElbo(ell.value(0))
    }
    SparseGpCsymFit(root, u, noise, ell, z, last)
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
