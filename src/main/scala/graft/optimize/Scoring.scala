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
