package graft.gp

import breeze.linalg.{cholesky, DenseMatrix, DenseVector}
import graft.SparkTestSession
import graft.autodiff.{Expr, ExprFns}
import graft.core._
import graft.data.DataSet
import graft.optimize.{Adam, Elbo}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.tagobjects.Slow

/** Full GPR variational-vs-analytic parity — the test the reference
  * wrote but left DISABLED (`/root/reference/testing/test_gp.py:181-249`,
  * commented out; budgets recorded in BASELINE.md): train an exact
  * GPR twice on y = cos(x) + 0.1ε, x ∈ linspace(0, 6, 20) —
  *
  *  1. analytically: maximize the marginal likelihood
  *     log N(y | 0, k_var·RBF_ℓ(X) + var·I) over (ℓ, k_var, var)
  *     with exact Breeze gradients (trace identity through the
  *     Cholesky), Adam(0.01) × 2,000 iters;
  *  2. variationally THROUGH THE ELBO ENGINE: whitened fullrank
  *     q over all 20 points (z = X, so the sparse-GP features are
  *     the exact Cholesky rows), learnable (ℓ, k_var, var),
  *     q_sqrt init ×0.01, Adam(0.001) × 40,000 iters with the ℓ
  *     linearization refreshed every 1,000 steps;
  *
  * then assert the reference's own tolerances: likelihood atol 1.0
  * (ELBO at the optimum is TIGHT for conjugate-Gaussian GPR — the
  * gap collapses when q equals the true posterior), lengthscale and
  * noise-variance rtol 0.3. Passing it enabled exceeds the
  * reference on its own hardest check. */
class GprParitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val n = 20
  private val xs: Array[Double] = Array.tabulate(n)(i => 6.0 * i / (n - 1))
  private val ys: Array[Double] = {
    val rng = new java.util.Random(0)
    xs.map(x => math.cos(x) + 0.1 * rng.nextGaussian())
  }

  /** Marginal log-likelihood and its exact gradient in SOFTPLUS
    * parameterization s → θ = log(1+e^s) (the repo's Log1pe /
    * reference `positive` transform). θ = (ℓ, k_var, var). */
  private def mllAndGrad(s: Array[Double]): (Double, Array[Double]) = {
    def sp(v: Double) = math.log1p(math.exp(v))
    def dsp(v: Double) = 1.0 / (1.0 + math.exp(-v))
    val ell = sp(s(0)); val kv = sp(s(1)); val nv = sp(s(2))
    val d2 = DenseMatrix.tabulate(n, n)((i, j) =>
      (xs(i) - xs(j)) * (xs(i) - xs(j)))
    val r = d2.map(v => math.exp(-v / (2 * ell * ell)))
    val k = r * kv + DenseMatrix.eye[Double](n) * nv
    val l = cholesky(k)
    val y = DenseVector(ys)
    // K⁻¹ = L⁻ᵀL⁻¹ via the repo's forward-substitution kernel
    val lInv = CholGrad.lowerInv(l)
    val kinv = lInv.t * lInv
    val alpha = kinv * y
    val logdet = 2.0 * (0 until n).map(i => math.log(l(i, i))).sum
    val ll = -0.5 * (y dot alpha) - 0.5 * logdet -
      0.5 * n * math.log(2 * math.Pi)
    // A = ααᵀ − K⁻¹; ∂ll/∂θ = ½ tr(A · ∂K/∂θ)
    val a = alpha * alpha.t - kinv
    val dKdEll = (r *:* d2) * (kv / (ell * ell * ell))
    def halfTr(m: DenseMatrix[Double]): Double =
      0.5 * breeze.linalg.sum(a *:* m) // A symmetric: tr(A·M)=ΣA∘M
    val g = Array(
      halfTr(dKdEll) * dsp(s(0)),
      halfTr(r) * dsp(s(1)),
      halfTr(DenseMatrix.eye[Double](n)) * dsp(s(2)))
    (ll, g)
  }

  test("variational GPR through the ELBO engine matches analytic GPR " +
    "at the reference's disabled-test budgets and tolerances", Slow) {
    // ---- analytic side: Adam(0.01) × 2,000 on softplus params ----
    def spInv(t: Double) = math.log(math.expm1(t)) // softplus⁻¹
    val s = Array(spInv(1.0), spInv(1.0), spInv(1.0))
    val adam = new Adam(3, 0.01)
    val mask = Array(true, true, true)
    var lik = 0.0
    for (_ <- 1 to 2000) {
      val (_, g) = mllAndGrad(s)
      adam.step(s, g, mask) // ascent: Adam.step ADDS lr·m̂/√v̂
      lik = mllAndGrad(s)._1
    }
    def sp(v: Double) = math.log1p(math.exp(v))
    val ellAna = sp(s(0)); val kvAna = sp(s(1)); val nvAna = sp(s(2))
    info(f"analytic: lik=$lik%.4f ell=$ellAna%.4f k_var=$kvAna%.4f " +
      f"var=$nvAna%.4f")
    assert(lik > -10 && !lik.isNaN, s"analytic GPR failed to train: $lik")

    // ---- variational side: fullrank q, z = X, through the engine ----
    import spark.implicits._
    val df = xs.zip(ys).toSeq.toDF("x", "y")
    val ds = new DataSet(df.repartition(1), seed = 0, testFraction = 0.0)
    val root = new Module
    // q_sqrt init ×0.01 — the reference's m.q.q_sqrt·0.01 reset
    val q = root.add("q", new Variational.Normal(Seq(n),
      QShape.FullRank, stddev = 0.01))
    val ell = root.add("ell", new Param(Seq(1),
      transform = graft.functions.Transforms.Log1pe(), initMean = 1.0,
      initStddev = 0.0))
    val kvar = root.add("k_var", new Param(Seq(1),
      transform = graft.functions.Transforms.Log1pe(), initMean = 1.0,
      initStddev = 0.0))
    val nvar = root.add("var", new Param(Seq(1),
      transform = graft.functions.Transforms.Log1pe(), initMean = 1.0,
      initStddev = 0.0))
    root.initialize()
    val z = xs.toSeq
    def mkElbo(ellLin: Double) =
      new Elbo(root, ds, Seq("x", "y"), ctx => {
        val phi = GpExpr.whitenedFeatures1dLearnable(ctx.in("x"),
          ctx.read1(ell), ellLin, z)
        val sVec = ctx.sample(q)
        val f = Expr.sqrt(ctx.read1(kvar)) *
          Expr.sum((0 until n).map(j => sVec(j) * phi(j)))
        ExprFns.gaussian(ctx.in("y"), f, ctx.read1(nvar))
      }, seed = 0)
    var elbo = mkElbo(ell.value(0))
    val adamV = new Adam(elbo.nSlots, 0.001)
    var last = 0.0
    val rounds = 40; val stepsPerRound = 1000
    for (r <- 1 to rounds) {
      last = elbo.optimize(stepsPerRound, minibatchSize = -1, lr = 0.001,
        adamState = adamV)
      if (r < rounds) elbo = mkElbo(ell.value(0)) // re-linearize ℓ
    }
    // mean ELBO over 100 fresh-noise evaluations = the reference's
    // np.mean([likelihood_var().run() for _ in range(100)])
    val likVar = (1 to 100).map(_ =>
      elbo.run(minibatchSize = -1, training = true)).sum / 100.0
    val ellVar = ell.value(0); val kvVar = kvar.value(0)
    val nvVar = nvar.value(0)
    info(f"variational: elbo=$likVar%.4f ell=$ellVar%.4f " +
      f"k_var=$kvVar%.4f var=$nvVar%.4f (last=$last%.4f)")
    ds.unpersist()

    // the reference's exact assertions
    assert(math.abs(lik - likVar) <= 1.0,
      f"likelihood parity: analytic $lik%.4f vs variational $likVar%.4f")
    assert(math.abs(ellAna - ellVar) <= 0.3 * math.abs(ellAna),
      f"lengthscale parity: $ellAna%.4f vs $ellVar%.4f")
    assert(math.abs(nvAna - nvVar) <= 0.3 * math.abs(nvAna),
      f"noise-variance parity: $nvAna%.4f vs $nvVar%.4f")
  }
}
