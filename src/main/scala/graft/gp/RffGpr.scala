package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.autodiff.{Expr, ExprFns}
import graft.core.{Module, Variational}
import graft.data.DataSet
import graft.optimize.Elbo

/** GP regression at corpus scale: Bayesian LINEAR regression on
  * Random Fourier features ([[Rff]]).
  *
  * A sparse GP ([[SparseGP]] + the reference's variational posterior
  * over inducing values) costs O(n·m²) per pass with an m×m driver
  * Cholesky; the RFF form replaces the kernel with an explicit
  * D-dimensional feature map, so the whole model is
  *
  *   y ~ N(wᵀφ(x), σ²),   w ~ N(0, I)   (D weights)
  *
  * — a GLM the existing ELBO engine already trains: per-partition
  * partial gradients against broadcast θ (treeAggregate), driver-side
  * Adam over O(D) parameters. Every stage is a pure map over rows;
  * nothing scales with n except the scan. The variational posterior
  * over w induces the usual degenerate-GP posterior over functions
  * f(x) = wᵀφ(x), and E[f] at any point is a dot with the posterior
  * mean — prediction is stateless scoring.
  *
  * Features are D independent SCALAR column expressions (cos of a
  * literal-weighted sum), not an array column re-expanded per
  * consumer — O(D·dims) per row, fully inside whole-stage codegen.
  */
object RffGpr {

  /** φⱼ(x) = √(2/D)·cos(wⱼ·x + bⱼ) as plain column arithmetic over
    * the coordinate columns. */
  def featureCols(xCols: Seq[Column], w: DenseMatrix[Double],
                  b: DenseVector[Double]): Seq[Column] = {
    require(w.cols == xCols.length,
      s"frequency dims ${w.cols} != coordinate cols ${xCols.length}")
    require(w.rows == b.length, s"W rows ${w.rows} != phases ${b.length}")
    val scale = math.sqrt(2.0 / b.length)
    (0 until b.length).map { j =>
      val s = xCols.zipWithIndex.foldLeft(lit(0.0): Column) {
        case (acc, (x, k)) => acc + lit(w(j, k)) * x
      }
      lit(scale) * cos(s + lit(b(j)))
    }
  }

  /** Trained posterior over the D feature weights. */
  final case class Fit(module: Module, elbo: Elbo,
                       w: DenseMatrix[Double], b: DenseVector[Double]) {
    private def vs = module.variationals.toMap
    private def d = b.length
    /** Posterior means in feature order. */
    def meanWeights: DenseVector[Double] =
      DenseVector.tabulate(d)(j => vs(s"rw$j").qMu.value(0))
    /** Posterior stddevs in feature order. */
    def scaleWeights: DenseVector[Double] =
      DenseVector.tabulate(d)(j => math.exp(vs(s"rw$j").qSqrt.value(0)))
    /** Posterior-mean prediction E[f(x)] = φ(x)·E[w] at driver
      * points (model-sized evaluation grids). */
    def predict(x: DenseMatrix[Double]): DenseVector[Double] =
      Rff.featureMap(x, w, b) * meanWeights
    /** Posterior-mean prediction as a column — stateless scoring of a
      * corpus-sized frame, θ inlined as literals. */
    def predictCol(xCols: Seq[Column]): Column = {
      val mw = meanWeights
      featureCols(xCols, w, b).zipWithIndex.foldLeft(lit(0.0): Column) {
        case (acc, (phi, j)) => acc + lit(mw(j)) * phi
      }
    }
  }

  /** Shared GLM scaffold for every RFF trainer: D standard-normal
    * weight variationals, per-row feature columns named in0..in{D-1}
    * plus the target as rff_y, one ELBO fit. `addVars` registers any
    * extra variationals (staged assigns are flushed here — see the
    * trainLengthscale gotcha). */
  private def fitWeights(df: DataFrame, cols: Seq[Column], yCol: String,
                         maxiter: Int, lr: Double, minibatchSize: Int,
                         seed: Long, addVars: Module => Unit = _ => ())(
      logp: (Elbo.Ctx, Map[String, Variational]) => Expr): (Module, Elbo) = {
    val data = df.select(
      cols.zipWithIndex.map { case (c, j) => c.as(s"in$j") } :+
        col(yCol).cast("double").as("rff_y"): _*)
    val root = new Module
    cols.indices.foreach(j => root.add(s"rw$j", new Variational.Normal(Seq(1))))
    addVars(root)
    root.initialize()
    val vs = root.variationals.toMap
    val ds = new DataSet(data, seed = seed)
    val inCols = cols.indices.map(j => s"in$j") :+ "rff_y"
    val elbo = new Elbo(root, ds, inCols, ctx => logp(ctx, vs), seed = seed)
    elbo.optimize(maxiter = maxiter, minibatchSize = minibatchSize, lr = lr)
    (root, elbo)
  }

  /** Joint LENGTHSCALE + weight learning: frequencies are drawn once
    * at unit lengthscale, each row carries its D spectral projections
    * w̃ⱼ·x as inputs, and the feature map
    *
    *   φⱼ(x) = √(2/D)·cos((w̃ⱼ·x)·e^{−log ℓ} + bⱼ)
    *
    * is rebuilt INSIDE the autodiff tape, so ∂ELBO/∂log ℓ flows
    * through the cos nodes and the same treeAggregate pass trains the
    * kernel hyperparameter alongside the weights — distributed GP
    * hyperparameter learning with no gram and no driver Cholesky
    * (contrast [[GpExpr]]'s inducing-point path, which re-linearizes a
    * driver Cholesky per round). log ℓ gets a N(0,1) prior (ℓ within
    * a few e-folds of 1). Returns the fit at the posterior-mean
    * lengthscale plus the learned ℓ. */
  def trainLengthscale(df: DataFrame, xCols: Seq[String], yCol: String,
                       wUnit: DenseMatrix[Double], b: DenseVector[Double],
                       noiseVar: Double = 0.01, initEll: Double = 1.0,
                       maxiter: Int = 600, lr: Double = 0.05,
                       minibatchSize: Int = -1, seed: Long = 0L): (Fit, Double) = {
    val d = b.length
    val scale = math.sqrt(2.0 / d)
    val xs = xCols.map(col(_).cast("double"))
    // per-row spectral projections at UNIT lengthscale; the learned
    // e^{-log l} rescales them inside the tape
    val wxCols = (0 until d).map { j =>
      xs.zipWithIndex.foldLeft(lit(0.0): Column) {
        case (acc, (x, k)) => acc + lit(wUnit(j, k)) * x
      }
    }
    val (root, elbo) = fitWeights(df, wxCols, yCol, maxiter, lr,
      minibatchSize, seed, addVars = { root =>
        val ell = root.add("log_ell", new Variational.Normal(Seq(1)))
        // staged until initialize() - fitWeights flushes it before
        // training, or optimize()'s closing initialize() would revert
        // the trained value to this init
        ell.qMu.assign(breeze.linalg.DenseVector(math.log(initEll)))
      }) { (ctx, vs) =>
      val invL = Expr.exp(Expr.c(0.0) - ctx.sample1(vs("log_ell")))
      val mean = (0 until d).foldLeft(Expr.c(0.0)) { (acc, j) =>
        acc + ctx.sample1(vs(s"rw$j")) *
          (Expr.c(scale) * Expr.cos(ctx.in(s"in$j") * invL + Expr.c(b(j))))
      }
      ExprFns.gaussian(ctx.in("rff_y"), mean, Expr.c(noiseVar))
    }
    val learnedEll = math.exp(
      root.variationals.toMap.apply("log_ell").qMu.value(0))
    (Fit(root, elbo, wUnit * (1.0 / learnedEll), b), learnedEll)
  }

  /** GP CLASSIFICATION at corpus scale: the same feature map with a
    * Bernoulli likelihood, y ~ Bernoulli(σ(wᵀφ(x))) — the logistic
    * Gaussian-process model that normally needs EP or a latent-GP
    * sampler collapses to Bayesian logistic regression on φ(x), and
    * the posterior-mean decision function is again a stateless scan
    * ([[Fit.predictCol]] before the sigmoid). */
  def trainClassifier(df: DataFrame, xCols: Seq[String], yCol: String,
                      w: DenseMatrix[Double], b: DenseVector[Double],
                      maxiter: Int = 600, lr: Double = 0.05,
                      minibatchSize: Int = -1, seed: Long = 0L): Fit = {
    val d = b.length
    val phis = featureCols(xCols.map(col(_).cast("double")), w, b)
    val (root, elbo) = fitWeights(df, phis, yCol, maxiter, lr,
      minibatchSize, seed) { (ctx, vs) =>
      val z = (0 until d).foldLeft(Expr.c(0.0)) { (acc, j) =>
        acc + ctx.sample1(vs(s"rw$j")) * ctx.in(s"in$j")
      }
      ExprFns.bernoulli(Expr.sigmoid(z), ctx.in("rff_y"))
    }
    Fit(root, elbo, w, b)
  }

  /** Train on coordinate columns + a target column. `noiseVar` is the
    * (known) observation noise σ²; weights get standard-normal priors
    * through [[Variational.Normal]]'s analytic KL. */
  def train(df: DataFrame, xCols: Seq[String], yCol: String,
            w: DenseMatrix[Double], b: DenseVector[Double],
            noiseVar: Double = 0.01, maxiter: Int = 400, lr: Double = 0.05,
            minibatchSize: Int = -1, seed: Long = 0L): Fit = {
    val d = b.length
    val phis = featureCols(xCols.map(col(_).cast("double")), w, b)
    val (root, elbo) = fitWeights(df, phis, yCol, maxiter, lr,
      minibatchSize, seed) { (ctx, vs) =>
      val mean = (0 until d).foldLeft(Expr.c(0.0)) { (acc, j) =>
        acc + ctx.sample1(vs(s"rw$j")) * ctx.in(s"in$j")
      }
      ExprFns.gaussian(ctx.in("rff_y"), mean, Expr.c(noiseVar))
    }
    Fit(root, elbo, w, b)
  }
}
