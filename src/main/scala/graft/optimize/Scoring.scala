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
        Row.fromSeq(row.toSeq :+ tape.evalFast(in, theta, dr, vals))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
