package graft.nn

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.apache.spark.sql.{DataFrame, Row}

/** Feed-forward encoder (reference `Henbun/nn.py:10-87`): a chain of
  * affine layers `act(x·W + b)` used for amortized inference — mapping
  * each datum to its LOCAL variational parameters.
  *
  * Spark-first execution: weights are model-sized and broadcast with
  * the closure; the whole MLP runs as ONE `mapPartitions` over the
  * data, gathering rows into [block, d] matrices and chaining Breeze
  * gemms — no per-row allocation, no shuffle, linear scan at any data
  * scale. A driver-side forward exists for tests and model-sized work.
  *
  * For TRAINING the encoder end-to-end (gradients through the MLP into
  * the ELBO), build the same network as autodiff expressions with
  * [[graft.autodiff.ExprNN]] — weights then live in the module tree
  * like any other Param.
  */
object NeuralNet {

  sealed trait Activation extends Serializable {
    def apply(x: Double): Double
  }
  case object Identity extends Activation { def apply(x: Double): Double = x }
  /** Reference default (`nn.py:42`). */
  case object Sigmoid extends Activation {
    def apply(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
  }
  case object Relu extends Activation {
    def apply(x: Double): Double = math.max(0.0, x)
  }
  case object Tanh extends Activation {
    def apply(x: Double): Double = math.tanh(x)
  }

  /** One `MatBias` layer (reference `nn.py:10-32`): y = act(x·W + b),
    * W [in,out], b [out]. */
  final case class Layer(w: DenseMatrix[Double], b: DenseVector[Double],
                         activation: Activation = Sigmoid) extends Serializable {
    require(w.cols == b.length, s"bias ${b.length} != out ${w.cols}")
    def forward(x: DenseMatrix[Double]): DenseMatrix[Double] = {
      val y = x * w // [n,out]
      var i = 0
      while (i < y.rows) {
        var j = 0
        while (j < y.cols) {
          y(i, j) = activation(y(i, j) + b(j)); j += 1
        }
        i += 1
      }
      y
    }
  }
}

final class NeuralNet(val layers: Seq[NeuralNet.Layer]) extends Serializable {
  import NeuralNet._

  require(layers.nonEmpty)
  layers.sliding(2).foreach {
    case Seq(a, b2) => require(a.w.cols == b2.w.rows,
      s"layer shapes ${a.w.cols} -> ${b2.w.rows} do not chain")
    case _ => ()
  }

  val inDim: Int = layers.head.w.rows
  val outDim: Int = layers.last.w.cols

  /** Driver forward, [n,in] → [n,out] (reference `NeuralNet.__call__`,
    * `nn.py:70-87`). */
  def forward(x: DenseMatrix[Double]): DenseMatrix[Double] =
    layers.foldLeft(x)((h, l) => l.forward(h))

  /** Distributed forward: appends `outCol` (array of outDim) computed
    * per partition in gemm blocks. */
  def forwardColumn(df: DataFrame, xCols: Seq[String],
                    outCol: String = "enc",
                    blockSize: Int = 4096): DataFrame = {
    require(xCols.length == inDim, s"${xCols.length} inputs != inDim $inDim")
    val net = this
    val idx = xCols.map(df.schema.fieldIndex)
    val schema = df.schema.add(outCol, ArrayType(DoubleType, false))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(blockSize).flatMap { rows =>
        val x = DenseMatrix.tabulate(rows.length, net.inDim)((i, j) =>
          rows(i).get(idx(j)) match {
            case v: java.lang.Double => v.doubleValue()
            case v: java.lang.Float => v.toDouble
            case v: java.lang.Long => v.toDouble
            case v: java.lang.Integer => v.toDouble
            case other => throw new IllegalArgumentException(
              s"non-numeric input ${xCols(j)}: $other")
          })
        val y = net.forward(x)
        rows.iterator.zipWithIndex.map { case (row, i) =>
          val arr = new Array[Double](net.outDim)
          var j = 0
          while (j < net.outDim) { arr(j) = y(i, j); j += 1 }
          Row.fromSeq(row.toSeq :+ (arr.toSeq: Seq[Double]))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
