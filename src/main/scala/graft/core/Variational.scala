package graft.core

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.functions.{Transform, Transforms}

/** Covariance structure of the multivariate-Gaussian posterior q
  * (reference `Henbun/variationals.py:31-110`): diagonal stores
  * log-scales (positivity for free); fullrank stores a dense matrix
  * whose lower triangle is used as the Cholesky factor. */
sealed trait QShape
object QShape {
  case object Diagonal extends QShape
  case object FullRank extends QShape
}

/** Variational posterior q = (q_mu, q_sqrt) with prior + transform;
  * *is sampled* when read, via the reparameterization trick
  * (reference `Henbun/variationals.py:31-209`).
  *
  * Global flavor: parameters are driver-held Breeze tensors, a fresh
  * iid draw `u` is supplied per evaluation (the reference re-draws
  * `tf.random_normal` per `session.run`; we thread seeded draws
  * explicitly so every iteration is fresh AND replayable — SURVEY §7
  * hard-part (c)). The per-row LOCAL flavor lives in the data plane
  * (columns + `randn(seed)`), see `graft.data`.
  */
class Variational(
    val shape: Seq[Int],
    val qShape: QShape = QShape.Diagonal,
    mean: Double = 0.0,
    stddev: Double = 1.0,
    val prior: Option[Prior] = Some(Priors.Normal),
    val transform: Transform = Transforms.Identity,
    val collection: String = Collections.Variables,
    rng: scala.util.Random = new scala.util.Random(0),
    val nLayers: Seq[Int] = Nil) extends Module {

  /** Elements per layer block; the full tensor is `[*nLayers, *shape]`
    * flattened (reference `param.py:157-179`). Layer blocks are
    * INDEPENDENT posteriors: diagonal q is elementwise anyway, and
    * fullrank q factorizes into one Cholesky per layer (the reference's
    * batched tril matmul, `variationals.py:141-147`). */
  val layerSize: Int = shape.product
  val layerCount: Int = nLayers.product

  val size: Int = layerCount * layerSize

  /** q_mu init ~ N(mean, (0.1·stddev)²) (reference
    * `variationals.py:85-87`). */
  val qMu: Param = register("q_mu", new Param(Seq(size),
    initMean = mean, initStddev = 0.1 * stddev,
    collection = collection, rng = rng))

  /** Diagonal: LOG of the scale, init ~ N(log stddev, 0.1²); fullrank:
    * dense matrix init ~ N(stddev, (0.1·stddev)²), ONE per layer block
    * (reference `variationals.py:88-96`). */
  val qSqrt: Param = qShape match {
    case QShape.Diagonal => register("q_sqrt", new Param(Seq(size),
      initMean = math.log(stddev), initStddev = 0.1,
      collection = collection, rng = rng))
    case QShape.FullRank => register("q_sqrt",
      new Param(Seq(layerSize, layerSize),
        initMean = stddev, initStddev = 0.1 * stddev,
        collection = collection, rng = rng, nLayers = nLayers))
  }

  /** Lower-triangular Cholesky factor of layer block `l` (the whole
    * vector when unlayered). */
  protected def layerTril(l: Int): DenseMatrix[Double] =
    lowerTri(if (qSqrt.nLayers.isEmpty) qSqrt.asMatrix
    else qSqrt.layerMatrix(l))

  /** Raw (pre-transform) sample via reparameterization
    * (reference `_sample`, `variationals.py:131-153`):
    * diagonal `q_mu + exp(q_sqrt)·u`; fullrank `q_mu + tril(Q_l)·u_l`
    * per layer block (block-diagonal across layers). */
  def sampleRaw(u: DenseVector[Double]): DenseVector[Double] = {
    require(u.length == size, s"draw size ${u.length} != $size")
    qShape match {
      case QShape.Diagonal =>
        val mu = qMu.value; val s = qSqrt.value
        DenseVector.tabulate(size)(i => mu(i) + math.exp(s(i)) * u(i))
      case QShape.FullRank =>
        val mu = qMu.value
        val out = DenseVector.zeros[Double](size)
        var l = 0
        while (l < layerCount) {
          val lo = l * layerSize
          val xl = layerTril(l) * u(lo until lo + layerSize)
          var i = 0
          while (i < layerSize) { out(lo + i) = mu(lo + i) + xl(i); i += 1 }
          l += 1
        }
        out
    }
  }

  /** Transformed (constrained-space) sample — what the model reads
    * (reference `tensor()`, `variationals.py:112-119`, which wraps in
    * the global clip — off by default, `tf_wraps.py:33-39`). */
  def sample(u: DenseVector[Double]): DenseVector[Double] = {
    val s = sampleRaw(u).map(transform.forward)
    val cfg = Settings.current
    if (cfg.clipping) s.map(v => graft.functions.Numerics.clip(v, cfg.clipMax))
    else s
  }

  /** Elementwise log-determinant contribution (reference `logdet`,
    * `variationals.py:178-186`): diagonal 2·q_sqrt; fullrank
    * log diag(L_l)² per layer block. */
  def logdet: DenseVector[Double] = qShape match {
    case QShape.Diagonal => qSqrt.value.map(_ * 2.0)
    case QShape.FullRank =>
      val v = qSqrt.value
      DenseVector.tabulate(size) { g =>
        val l = g / layerSize; val i = g % layerSize
        val d = v(l * layerSize * layerSize + i * layerSize + i)
        math.log(d * d)
      }
  }

  /** Single-draw Monte-Carlo KL(q‖p) (reference `_KL`,
    * `variationals.py:188-209`):
    * E_q[log q] − E_q[log p] ≈ −½Σ(log2π + logdet + u²) − p.logp(y)
    * − Σ logJacobian, evaluated at the reparameterized sample. */
  def klMc(u: DenseVector[Double]): Double = {
    val ld = logdet
    var kl = 0.0
    var i = 0
    while (i < size) {
      kl += -0.5 * (math.log(2.0 * math.Pi) + ld(i) + u(i) * u(i))
      i += 1
    }
    prior match {
      case Some(p) =>
        val raw = sampleRaw(u)
        kl -= p.logp(raw.map(transform.forward))
        kl -= transform.logJacobianSum(raw)
      case None => ()
    }
    kl
  }

  /** Analytic KL for the diagonal + unit-Normal-prior + identity case —
    * the closed form the MC estimator converges to (oracle in reference
    * `testing/test_variationals.py:326-347`). */
  def klAnalytic: Double = {
    require(qShape == QShape.Diagonal && transform == Transforms.Identity &&
      prior.contains(Priors.Normal), "analytic KL needs diag/identity/Normal")
    val mu = qMu.value; val s = qSqrt.value
    var kl = 0.0
    var i = 0
    while (i < size) {
      kl += graft.functions.Numerics.klDiagNormal(mu(i), s(i)); i += 1
    }
    kl
  }

  protected def lowerTri(m: DenseMatrix[Double]): DenseMatrix[Double] =
    DenseMatrix.tabulate(m.rows, m.cols)((i, j) => if (j <= i) m(i, j) else 0.0)
}

object Variational {

  /** `Normal`: N(0,1) prior, identity transform, specialized lower-
    * variance MC KL −½Σ(logdet + u² − x²) (reference
    * `variationals.py:213-230`). */
  class Normal(shape: Seq[Int], qShape: QShape = QShape.Diagonal,
               mean: Double = 0.0, stddev: Double = 1.0,
               collection: String = Collections.Variables,
               rng: scala.util.Random = new scala.util.Random(0),
               nLayers: Seq[Int] = Nil)
      extends Variational(shape, qShape, mean, stddev,
        Some(Priors.Normal), Transforms.Identity, collection, rng,
        nLayers) {
    override def klMc(u: DenseVector[Double]): Double = {
      val ld = logdet
      val x = sampleRaw(u)
      var kl = 0.0
      var i = 0
      while (i < size) {
        kl += -0.5 * (ld(i) + u(i) * u(i) - x(i) * x(i)); i += 1
      }
      kl
    }
  }

  /** `Gaussian`: `scale · Normal` with a learned positive scale and the
    * mean/stddev re-balancing init heuristic (reference
    * `variationals.py:232-291`). */
  class Gaussian(shape: Seq[Int], qShape: QShape = QShape.Diagonal,
                 mean: Double = 0.0, stddev: Double = 1.0,
                 collection: String = Collections.Variables,
                 rng: scala.util.Random = new scala.util.Random(0),
                 nLayers: Seq[Int] = Nil)
      extends Normal(shape, qShape,
        mean = if (math.abs(mean) < stddev) mean / stddev else 1.0,
        stddev = if (math.abs(mean) < stddev) 1.0 else stddev / math.abs(mean),
        collection, rng, nLayers) {
    private val scaleMean =
      if (math.abs(mean) < stddev) stddev else math.abs(mean)
    /** Learned positive scale (scalar by default, reference
      * `variationals.py:281-287`). */
    val scale: Param = register("scale", new Param(Seq(1),
      transform = Transforms.positive, initMean = scaleMean,
      initStddev = 0.1 * scaleMean, collection = collection, rng = rng))
    override def sample(u: DenseVector[Double]): DenseVector[Double] =
      super.sample(u) * scale.value(0)
  }

  /** `OffsetGaussian`: `Gaussian + offset` (reference
    * `variationals.py:293-314`). */
  class OffsetGaussian(shape: Seq[Int], qShape: QShape = QShape.Diagonal,
                       mean: Double = 0.0, stddev: Double = 1.0,
                       collection: String = Collections.Variables,
                       rng: scala.util.Random = new scala.util.Random(0),
                       nLayers: Seq[Int] = Nil)
      extends Gaussian(shape, qShape, 0.0, stddev, collection, rng,
        nLayers) {
    val offset: Param = register("offset", new Param(Seq(1),
      initMean = mean, initStddev = 0.1 * math.abs(mean).max(1e-10),
      collection = collection, rng = rng))
    override def sample(u: DenseVector[Double]): DenseVector[Double] =
      super.sample(u) + offset.value(0)
  }

  /** `Beta`: logistic-transformed q with Beta(α, β) prior whose
    * hyperparameters are learned positive Variables (reference
    * `variationals.py:316-381`). */
  class Beta(shape: Seq[Int], qShape: QShape = QShape.Diagonal,
             mean: Double = 0.0, stddev: Double = 1.0,
             collection: String = Collections.Variables,
             rng: scala.util.Random = new scala.util.Random(0),
             nLayers: Seq[Int] = Nil)
      extends Variational(shape, qShape, mean, stddev, None,
        Transforms.Logistic(), collection, rng, nLayers) {
    val alpha: Param = register("alpha", new Param(Seq(1),
      transform = Transforms.positive, initMean = 1.0, initStddev = 0.1,
      collection = collection, rng = rng))
    val beta: Param = register("beta", new Param(Seq(1),
      transform = Transforms.positive, initMean = 1.0, initStddev = 0.1,
      collection = collection, rng = rng))
    override def klMc(u: DenseVector[Double]): Double = {
      val ld = logdet
      var kl = 0.0
      var i = 0
      while (i < size) {
        kl += -0.5 * (math.log(2.0 * math.Pi) + ld(i) + u(i) * u(i)); i += 1
      }
      val raw = sampleRaw(u)
      val a = alpha.value(0); val b = beta.value(0)
      raw.foreach { x =>
        kl -= graft.functions.Densities.scalar.beta(a, b, transform.forward(x))
        kl -= transform.logJacobian(x)
      }
      kl
    }
  }
}
