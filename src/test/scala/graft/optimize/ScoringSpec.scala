package graft.optimize

import graft.SparkTestSession
import graft.autodiff.ExprFns
import graft.core._
import graft.data.DataSet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch scoring (reference EP3, `Model.run`, `model.py:84-96`): a
  * trained model's expressions swept over a DataFrame as a column. */
class ScoringSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("attach evaluates an expression against current θ per row") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_quantity") / 10.0).as("x")).limit(64)
    val root = new Module
    val p = root.add("p", new Param(Seq(1), initMean = 2.0, initStddev = 0.0))
    val ds = new DataSet(li, seed = 0)
    val elbo = new Elbo(root, ds, Seq("x"),
      ctx => -(ctx.read1(p) - ctx.in("x")).sq)
    val scored = Scoring.attach(elbo, li,
      ctx => -(ctx.read1(p) - ctx.in("x")).sq, "score").collect()
    assert(scored.length == 64)
    scored.foreach { r =>
      val x = r.getDouble(r.fieldIndex("x"))
      val want = -(2.0 - x) * (2.0 - x)
      assert(math.abs(r.getDouble(r.fieldIndex("score")) - want) < 1e-12)
    }
    ds.unpersist()
  }

  test("zero draws score a variational model at its posterior mean") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(((col("l_quantity") - 25.5) / 14.4).as("x"),
        ((col("l_extendedprice") / 10000.0 - 3.8) / 2.5).as("y"))
    val root = new Module
    val a = root.add("a", new Variational.Normal(Seq(1)))
    val b = root.add("b", new Variational.Normal(Seq(1)))
    val ds = new DataSet(li, seed = 0)
    val elbo = new Elbo(root, ds, Seq("x", "y"), ctx =>
      ExprFns.gaussian(ctx.in("y"),
        ctx.sample1(a) + ctx.sample1(b) * ctx.in("x"),
        graft.autodiff.Expr.c(0.25)), seed = 0)
    elbo.optimize(maxiter = 100, lr = 0.1)
    // default draws = zeros → sample(v) = qMu: posterior-mean prediction
    val scored = Scoring.attach(elbo, li.limit(32),
      ctx => ctx.sample1(a) + ctx.sample1(b) * ctx.in("x"), "pred").collect()
    val (ma, mb) = (a.qMu.value(0), b.qMu.value(0))
    scored.foreach { r =>
      val want = ma + mb * r.getDouble(r.fieldIndex("x"))
      assert(math.abs(r.getDouble(r.fieldIndex("pred")) - want) < 1e-12)
    }
    ds.unpersist()
  }

  test("attachDraws sweeps S draw vectors in one pass and WAIC " +
    "prefers the true model over intercept-only") {
    import spark.implicits._
    // planted y = 1.5 x + noise — the slope genuinely matters
    val n = 400
    val rng = new scala.util.Random(3)
    val data = Seq.tabulate(n) { i =>
      val x = i / (n / 4.0) - 2.0
      (x, 1.5 * x + 0.3 * rng.nextGaussian())
    }.toDF("x", "y")
    def fit(withSlope: Boolean) = {
      val root = new Module
      val a = root.add("a", new Variational.Normal(Seq(1)))
      val bOpt = if (withSlope)
        Some(root.add("b", new Variational.Normal(Seq(1)))) else None
      val ds = new DataSet(data, seed = 0)
      def ll(ctx: Elbo.Ctx) = {
        val mean = bOpt match {
          case Some(b) => ctx.sample1(a) + ctx.sample1(b) * ctx.in("x")
          case None => ctx.sample1(a)
        }
        ExprFns.gaussian(ctx.in("y"), mean, graft.autodiff.Expr.c(0.09))
      }
      val elbo = new Elbo(root, ds, Seq("x", "y"), ll _, seed = 0)
      elbo.optimize(maxiter = 800, lr = 0.1)
      val w = Scoring.waic(elbo, data, ll _, nSamples = 80)
      val loo = Scoring.looIs(elbo, data, ll _, nSamples = 80)
      ds.unpersist()
      (w, loo)
    }
    val ((waicTrue, lppdTrue, pTrue), (looTrue, fracTrue)) =
      fit(withSlope = true)
    val ((waicFlat, _, _), (looFlat, _)) = fit(withSlope = false)
    assert(waicTrue < waicFlat,
      s"true model must win: $waicTrue vs $waicFlat")
    // IS-LOO agrees with WAIC's ranking; both estimate elpd, so the
    // true model's elpd_loo must sit near lppd − pWAIC (same draws
    // family, both Monte-Carlo estimators)
    assert(looTrue > looFlat, s"LOO ranking: $looTrue !> $looFlat")
    assert(math.abs(looTrue - (lppdTrue - pTrue)) <
      0.2 * math.abs(lppdTrue - pTrue) + 20.0,
      s"elpd_loo $looTrue vs elpd_waic ${lppdTrue - pTrue}")
    assert(fracTrue > 1.0 / 80 && fracTrue <= 1.0,
      s"importance concentration $fracTrue out of range")
    // VI posteriors overestimate pWAIC until fully converged; assert
    // the order of magnitude (a 2-parameter model, 400 rows)
    assert(pTrue > 0 && pTrue < 40,
      s"effective parameter count $pTrue out of range")
    assert(lppdTrue.isFinite)
    // attachDraws: S columns vary across draws (posterior not collapsed)
    val root = new Module
    val a = root.add("a", new Variational.Normal(Seq(1)))
    val ds = new DataSet(data, seed = 0)
    val elbo = new Elbo(root, ds, Seq("x", "y"),
      ctx => ExprFns.gaussian(ctx.in("y"), ctx.sample1(a),
        graft.autodiff.Expr.c(1.0)), seed = 0)
    val dr = Array(Array.fill(elbo.nDraws)(0.0),
      Array.fill(elbo.nDraws)(2.0))
    val out = Scoring.attachDraws(elbo, data.limit(4),
      ctx => ctx.sample1(a), "s", dr).collect()
    out.foreach { r =>
      val s = r.getSeq[Double](r.fieldIndex("s"))
      assert(s.length == 2 && s(0) != s(1),
        "distinct draws must give distinct samples")
    }
    ds.unpersist()
  }

  test("ppcGaussian: calibrated noise passes the sd check, a " +
    "misspecified (too-small) noise model fails it to an extreme") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val n = 600
    val rows = (0 until n).map { i =>
      val x = -1.0 + 2.0 * i / (n - 1)
      (i.toLong, x, 2.0 * x + 0.5 * rng.nextGaussian())
    }
    val df = rows.toDF("id", "x", "y").repartition(4)
    def fitAndCheck(noiseSd: Double, learnSlope: Boolean = true) = {
      val root = new Module
      val b = root.add("b", new Variational.Normal(Seq(1)))
      val ds = new DataSet(df.select("x", "y"), seed = 0)
      val elbo = new Elbo(root, ds, Seq("x", "y"), ctx =>
        ExprFns.gaussian(ctx.in("y"),
          ctx.sample1(b) * ctx.in("x"),
          graft.autodiff.Expr.c(noiseSd * noiseSd)), seed = 0)
      elbo.optimize(maxiter = 800, lr = 0.1)
      val r = Scoring.ppcGaussian(elbo, df,
        ctx => ctx.sample1(b) * ctx.in("x"),
        _ => graft.autodiff.Expr.c(noiseSd),
        "y", "id", nSamples = 100, seed = 5L)
      ds.unpersist()
      r
    }
    val (pm, psd, tm, tsd) = fitAndCheck(0.5)
    // observed stats are what we planted
    assert(math.abs(tm) < 0.1 && math.abs(tsd - math.sqrt(
      4.0 / 3.0 + 0.25)) < 0.1, s"tm=$tm tsd=$tsd")
    assert(pm > 0.05 && pm < 0.95, s"p_mean $pm")
    assert(psd > 0.05 && psd < 0.95, s"p_sd $psd")
    // noise claimed 5x too small: replicated sd cannot reach the
    // observed sd (slope noise is the only slack) -> p_sd pinned low
    val (_, psdBad, _, _) = fitAndCheck(0.1)
    assert(psdBad <= 0.05, s"misspecified p_sd $psdBad")
  }
}
