package graft.optimize

import graft.autodiff.{CompiledExpr, Expr}
import graft.core.Module
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{DataFrame, Row}

/** Batch scoring: evaluate autodiff expressions as DataFrame columns
  * against the CURRENT parameter tree — the "build an op, then run it
  * over the data" posterior-evaluation pattern (reference EP3,
  * `Model.run`, `model.py:84-96`).
  *
  * The same [[Elbo.Ctx]]-built expressions used for training are
  * compiled once and swept over the data in a mapPartitions pass with
  * θ (and an optional fixed draw vector) captured in the closure — so
  * a trained model scores 100 TB with one linear scan and zero driver
  * involvement. Use draws = zeros for posterior-mean scoring, or a
  * seeded draw for one posterior sample sweep.
  */
object Scoring {

  /** Decode the projected numeric input columns of one Row into a
    * primitive array (shared by every scoring sweep). */
  @inline private def decodeRow(row: Row, idx: Seq[Int],
                                in: Array[Double]): Unit = {
    var i = 0
    while (i < idx.length) {
      in(i) = row.get(idx(i)) match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.toDouble
        case l: java.lang.Long => l.toDouble
        case n: java.lang.Integer => n.toDouble
        case other => throw new IllegalArgumentException(
          s"non-numeric input: $other")
      }
      i += 1
    }
  }


  /** Per-row evaluation under S posterior draw vectors in ONE
    * mapPartitions sweep: `outCol` = array(expr(row; θ, draws_s)) —
    * the S-fold pass for Monte-Carlo posterior-predictive quantities
    * (each draw re-samples every variational leaf; θ and all S draw
    * vectors ride the closure, so this is still one linear scan). */
  def attachDraws(elbo: Elbo, df: DataFrame, build: Elbo.Ctx => Expr,
                  outCol: String,
                  draws: Array[Array[Double]]): DataFrame = {
    require(draws.nonEmpty && draws.forall(_.length == elbo.nDraws),
      s"need draw vectors of length ${elbo.nDraws}")
    val tape = CompiledExpr.compile(build(elbo.ctx), elbo.inputCols.length,
      elbo.nSlots, elbo.nDraws)
    val theta = elbo.thetaFromTree()
    val idx = elbo.inputCols.map(df.schema.fieldIndex)
    val schema = df.schema.add(outCol,
      org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false))
    val rdd = df.rdd.mapPartitions { it =>
      val vals = tape.newValues
      it.map { row =>
        val in = new Array[Double](idx.length)
        decodeRow(row, idx, in)
        val out = new Array[Double](draws.length)
        var s = 0
        while (s < draws.length) {
          out(s) = tape.evalFast(in, theta, draws(s), vals)
          s += 1
        }
        Row.fromSeq(row.toSeq :+ out.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** WAIC (widely applicable information criterion, Watanabe 2010 —
    * the standard posterior-predictive model-comparison score): from
    * S seeded posterior draws of the per-row LOG-likelihood build
    *   lppd  = Σ_i ln( mean_s exp(ll_is) )   (max-stabilized)
    *   pWAIC = Σ_i Var_s(ll_is)
    *   waic  = −2 (lppd − pWAIC).
    * One [[attachDraws]] scan + one aggregate — distributed end to
    * end, rows never leave the executors. Lower is better. */
  def waic(elbo: Elbo, df: DataFrame, build: Elbo.Ctx => Expr,
           nSamples: Int = 100, seed: Long = 7L): (Double, Double, Double) = {
    val rng = new scala.util.Random(seed)
    val draws = Array.fill(nSamples)(
      Array.fill(elbo.nDraws)(rng.nextGaussian()))
    val withLl = attachDraws(elbo, df, build, "__ll", draws)
    import org.apache.spark.sql.functions._
    val ll = col("__ll")
    val mx = array_max(ll)
    val lppdRow = mx + log(aggregate(ll, lit(0.0),
      (acc, x) => acc + exp(x - mx)) / lit(nSamples.toDouble))
    val mean = aggregate(ll, lit(0.0), (acc, x) => acc + x) /
      lit(nSamples.toDouble)
    val varRow = aggregate(ll, lit(0.0),
      (acc, x) => acc + (x - mean) * (x - mean)) /
      lit((nSamples - 1).toDouble)
    val r = withLl.agg(sum(lppdRow).as("lppd"), sum(varRow).as("p"))
      .head()
    val (lppd, p) = (r.getDouble(0), r.getDouble(1))
    (-2.0 * (lppd - p), lppd, p)
  }

  /** Importance-sampled leave-one-out cross-validation (IS-LOO,
    * Gelfand 1996; the estimator PSIS-LOO smooths, Vehtari et al.
    * 2017): from the same S-draw log-likelihood sweep as [[waic]],
    *
    *   elpd_loo = Σ_i −ln( mean_s exp(−ll_is) )   (max-stabilized)
    *
    * — the harmonic-mean-of-likelihoods form of holding row i out.
    * Also returns the worst per-row importance-weight concentration
    * maxᵢ( max_s w_is / Σ_s w_is ) ∈ (1/S, 1]: values near 1 mean one
    * draw dominates that row's estimate (the situation PSIS flags via
    * its Pareto k̂) — treat elpd_loo as unreliable there. One
    * [[attachDraws]] scan + one aggregate, like WAIC. */
  def looIs(elbo: Elbo, df: DataFrame, build: Elbo.Ctx => Expr,
            nSamples: Int = 100, seed: Long = 7L): (Double, Double) = {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(seed)
    val draws = Array.fill(nSamples)(
      Array.fill(elbo.nDraws)(rng.nextGaussian()))
    val withLl = attachDraws(elbo, df, build, "__ll", draws)
    val ll = col("__ll")
    // w_is ∝ exp(−ll_is); stabilize with the per-row max of −ll
    val mxw = -array_min(ll)
    val sumW = aggregate(ll, lit(0.0), (acc, x) => acc + exp(-x - mxw))
    val looRow = -(mxw + log(sumW / lit(nSamples.toDouble)))
    val maxFrac = aggregate(ll, lit(0.0),
      (acc, x) => greatest(acc, exp(-x - mxw))) / sumW
    val r = withLl.agg(sum(looRow).as("elpd_loo"),
      max(maxFrac).as("worst_frac")).head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** Posterior predictive check (Gelman et al., BDA ch. 6) for a
    * Gaussian observation model: replicate the dataset under S
    * posterior draws, y_rep_is = μ_is + σ_is·z_is, and compare test
    * statistics T(y_rep_s) against T(y_obs):
    *
    *   p = (#{s : T(y_rep_s) ≥ T(y_obs)} + 1) / (S + 1)
    *
    * for T ∈ {mean, sd}. A well-calibrated model lands both p-values
    * away from 0 and 1; a misspecified noise model drives p_sd to an
    * extreme.
    *
    * Scale shape: TWO [[attachDraws]] scans (μ and σ per draw; θ and
    * draws ride the closure) + ONE hash aggregate whose state is the
    * per-draw sum/sum-of-squares arrays ([[graft.ops.Stats.arraySumAgg]]
    * — O(S) mergeable state, never a posexplode of n·S rows). The
    * per-(row, draw) replication noise z_is is DETERMINISTIC portable
    * arithmetic — Box–Muller over xxhash64(id, s, salt) uniforms — so
    * reruns and engines agree; rows never leave the executors.
    *
    * Returns (pMean, pSd, tMeanObs, tSdObs). */
  def ppcGaussian(elbo: Elbo, df: DataFrame,
                  meanBuild: Elbo.Ctx => Expr,
                  scaleBuild: Elbo.Ctx => Expr,
                  yCol: String, idCol: String,
                  nSamples: Int = 100,
                  seed: Long = 7L): (Double, Double, Double, Double) = {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(seed)
    val draws = Array.fill(nSamples)(
      Array.fill(elbo.nDraws)(rng.nextGaussian()))
    val d2 = attachDraws(elbo,
      attachDraws(elbo, df, meanBuild, "__mu", draws),
      scaleBuild, "__sc", draws)
    val id = col(idCol).cast("long")
    // uniform in [0,1) from the portable 64-bit hash; +2^-54 keeps
    // ln(u) finite
    def u(j: org.apache.spark.sql.Column,
          salt: Int): org.apache.spark.sql.Column =
      shiftrightunsigned(xxhash64(id, j, lit(salt)), 11).cast("double") /
        lit((1L << 53).toDouble)
    val twoPi = 2.0 * math.Pi
    val yrep = transform(sequence(lit(0), lit(nSamples - 1)), j =>
      element_at(col("__mu"), j + 1) + element_at(col("__sc"), j + 1) *
        (sqrt(lit(-2.0) * log(u(j, 1) + lit(math.pow(2.0, -54)))) *
          cos(lit(twoPi) * u(j, 2))))
    val r = d2.select(col(yCol).cast("double").as("y"), yrep.as("yr"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"),
        graft.ops.Stats.arraySumAgg(col("yr"), nSamples).as("sr"),
        graft.ops.Stats.arraySumAgg(
          transform(col("yr"), v => v * v), nSamples).as("srr"))
      .head()
    val n = r.getLong(0).toDouble
    val tMeanObs = r.getDouble(1) / n
    val tSdObs = math.sqrt(math.max(0.0,
      r.getDouble(2) / n - tMeanObs * tMeanObs))
    val sr = r.getSeq[Double](3)
    val srr = r.getSeq[Double](4)
    var geMean = 0
    var geSd = 0
    (0 until nSamples).foreach { s =>
      val m = sr(s) / n
      val sd = math.sqrt(math.max(0.0, srr(s) / n - m * m))
      if (m >= tMeanObs) geMean += 1
      if (sd >= tSdObs) geSd += 1
    }
    ((geMean + 1.0) / (nSamples + 1.0), (geSd + 1.0) / (nSamples + 1.0),
      tMeanObs, tSdObs)
  }

  /** Attach `outCol` = expr(row; θ, draws) to `df`. The expression is
    * built against the Elbo's own Ctx (same input columns, same θ/draw
    * slot layout as training). */
  def attach(elbo: Elbo, df: DataFrame, build: Elbo.Ctx => Expr,
             outCol: String, draws: Array[Double] = null): DataFrame = {
    val tape = CompiledExpr.compile(build(elbo.ctx), elbo.inputCols.length,
      elbo.nSlots, elbo.nDraws)
    val theta = elbo.thetaFromTree()
    val dr = if (draws == null) new Array[Double](elbo.nDraws) else draws
    val idx = elbo.inputCols.map(df.schema.fieldIndex)
    val schema = df.schema.add(outCol, DoubleType)
    val rdd = df.rdd.mapPartitions { it =>
      val vals = tape.newValues
      it.map { row =>
        val in = new Array[Double](idx.length)
        decodeRow(row, idx, in)
        Row.fromSeq(row.toSeq :+ tape.evalFast(in, theta, dr, vals))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
