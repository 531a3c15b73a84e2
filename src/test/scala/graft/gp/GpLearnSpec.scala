package graft.gp

import graft.SparkTestSession
import graft.autodiff.{CompiledExpr, In, P}
import graft.data.DataSet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lengthscale learning: the linearized-Lm⁻¹ features are exact (value
  * and ℓ-gradient) at the linearization point, and the alternating
  * trainer recovers a short lengthscale from wiggly data that a long
  * initial guess cannot fit. */
class GpLearnSpec extends AnyFunSuite {

  private val z = Seq(-2.4, -1.6, -0.8, 0.0, 0.8, 1.6, 2.4)
  private val ell0 = 0.9

  test("learnable features equal fixed features at ℓ = ℓ0") {
    val fixed = GpExpr.whitenedFeatures1d(In(0), z, ell0)
    val learn = GpExpr.whitenedFeatures1dLearnable(In(0), P(0), ell0, z)
    val xs = Seq(-1.7, -0.2, 0.9, 2.8)
    z.indices.foreach { j =>
      val tf = CompiledExpr.compile(fixed(j), 1, 0, 0)
      val tl = CompiledExpr.compile(learn(j), 1, 1, 0)
      xs.foreach { x =>
        val a = tf.eval(Array(x), Array.empty, Array.empty, tf.newValues)
        val b = tl.eval(Array(x), Array(ell0), Array.empty, tl.newValues)
        assert(math.abs(a - b) < 1e-12, s"phi_$j($x): $a vs $b")
      }
    }
  }

  test("tape ℓ-gradient at ℓ0 matches finite differences of the exact " +
    "whitened features") {
    val h = 1e-5
    val xs = Seq(-1.7, -0.2, 0.9, 2.8)
    z.indices.foreach { j =>
      val learn = GpExpr.whitenedFeatures1dLearnable(In(0), P(0), ell0, z)(j)
      val tl = CompiledExpr.compile(learn, 1, 1, 0)
      val tp = CompiledExpr.compile(
        GpExpr.whitenedFeatures1d(In(0), z, ell0 + h)(j), 1, 0, 0)
      val tm = CompiledExpr.compile(
        GpExpr.whitenedFeatures1d(In(0), z, ell0 - h)(j), 1, 0, 0)
      xs.foreach { x =>
        val g = new Array[Double](1)
        tl.evalGrad(Array(x), Array(ell0), Array.empty,
          tl.newValues, tl.newValues, g)
        val fd = (tp.eval(Array(x), Array.empty, Array.empty, tp.newValues) -
          tm.eval(Array(x), Array.empty, Array.empty, tm.newValues)) / (2 * h)
        assert(math.abs(g(0) - fd) < 1e-4 * (1 + fd.abs),
          s"dphi_$j/dl($x): tape ${g(0)} vs fd $fd")
      }
    }
  }

  test("trainSparse1d learns a shorter lengthscale on wiggly data and " +
    "beats the fixed-ℓ fit") {
    val spark = SparkTestSession.spark
    // y = sin(2x) over x ∈ ~[-3.4, 3.4]: needs ℓ ≈ 0.5; start at 2.0
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(((col("l_quantity") - 25.5) / 7.2).as("x"))
      .withColumn("y", sin(col("x") * 2.0))
    val zs = Seq(-3.0, -2.25, -1.5, -0.75, 0.0, 0.75, 1.5, 2.25, 3.0)
    val dsL = new DataSet(li, seed = 0)
    val learned = GpExpr.trainSparse1d(dsL, "x", "y", zs, ell0 = 2.0,
      learnEll = true, rounds = 10, stepsPerRound = 120, lr = 0.05)
    val fixed = GpExpr.trainSparse1d(dsL, "x", "y", zs, ell0 = 2.0,
      learnEll = false, rounds = 10, stepsPerRound = 120, lr = 0.05)
    assert(learned.lengthscale < 1.3,
      s"lengthscale barely moved: ${learned.lengthscale}")
    assert(learned.elbo > fixed.elbo,
      s"learned ELBO ${learned.elbo} <= fixed ${fixed.elbo}")
    // predictive mean tracks sin(2x) at interior points
    val px = Seq(-1.5, -0.75, 0.75, 1.5)
    val pred = learned.predictiveMean(px)
    px.zip(pred).foreach { case (x, p) =>
      assert(math.abs(p - math.sin(2 * x)) < 0.35,
        s"pred($x)=$p vs ${math.sin(2 * x)}")
    }
    dsL.unpersist()
  }
}
