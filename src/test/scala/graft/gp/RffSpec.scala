package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Random Fourier features: Monte-Carlo kernel approximation quality,
  * determinism, and driver == Spark-kernel bit parity. */
class RffSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(3)
  private def randn(r: Int, c: Int) =
    DenseMatrix.tabulate(r, c)((_, _) => rng.nextGaussian())

  test("frequencies are deterministic in (seed, D, dims) and scale " +
    "with ARD lengthscales") {
    val (w1, b1) = Rff.frequencies(4, 64, DenseVector(1.0), seed = 11L)
    val (w2, b2) = Rff.frequencies(4, 64, DenseVector(1.0), seed = 11L)
    assert(w1 == w2 && b1 == b2)
    val (w3, _) = Rff.frequencies(4, 64, DenseVector(1.0), seed = 12L)
    assert(w1 != w3)
    // ARD: dim k scaled by 1/l_k exactly
    val l = DenseVector(0.5, 1.0, 2.0, 4.0)
    val (wl, _) = Rff.frequencies(4, 64, l, seed = 11L)
    (0 until 64).foreach(j => (0 until 4).foreach(k =>
      assert(math.abs(wl(j, k) - w1(j, k) / l(k)) < 1e-15)))
    // phases in [0, 2pi)
    b1.foreachValue(v => assert(v >= 0.0 && v < 2.0 * math.Pi))
  }

  test("phi(x)-phi(y) approximates the RBF gram: mean |err| shrinks " +
    "with D and is small at D=4096 (Hoeffding-scale tolerance)") {
    val x = randn(20, 3)
    val kern = Kernels.UnitRBF(DenseVector(0.9))
    val want = kern.k(x)
    def maxErr(d: Int): Double = {
      val (w, b) = Rff.frequencies(3, d, DenseVector(0.9), seed = 5L)
      val phi = Rff.featureMap(x, w, b)
      val got = phi * phi.t
      var m = 0.0
      (0 until 20).foreach(i => (0 until 20).foreach(j =>
        m = math.max(m, math.abs(got(i, j) - want(i, j)))))
      m
    }
    val e256 = maxErr(256)
    val e4096 = maxErr(4096)
    assert(e4096 < 0.08, s"D=4096 max err $e4096")
    assert(e4096 < e256, s"error did not shrink: $e256 -> $e4096")
    // kdiag: phi(x)-phi(x) = (2/D)-sum cos^2 <= 2, positive
    val (w, b) = Rff.frequencies(3, 512, DenseVector(0.9), seed = 5L)
    val phi = Rff.featureMap(x, w, b)
    (0 until 20).foreach { i =>
      var s = 0.0
      (0 until 512).foreach(j => s += phi(i, j) * phi(i, j))
      assert(s > 0.0 && s <= 2.0 + 1e-12)
    }
  }

  test("Spark featuresCol == driver featureMap bit-for-bit; khatCol = " +
    "features-dot-literal in forward order") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dims = 8
    val n = 200
    val vecs = (0 until n).map(i =>
      (i.toLong, Seq.tabulate(dims)(k => (rng.nextGaussian()).toFloat)))
    val df = vecs.toDF("id", "emb").repartition(4)
    val (w, b) = Rff.frequencies(dims, 16, DenseVector(1.3), seed = 9L)
    val got = df.select(col("id"), Rff.featuresCol(col("emb"), w, b))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val x = DenseMatrix.tabulate(n, dims)((i, k) => vecs(i)._2(k).toDouble)
    val phi = Rff.featureMap(x, w, b)
    vecs.foreach { case (id, _) =>
      val g = got(id)
      assert(g.length == 16)
      (0 until 16).foreach(j =>
        assert(g(j) == phi(id.toInt, j), s"row $id feature $j"))
    }
    // khat against a fixed q equals the driver dot exactly
    val q = Seq.tabulate(dims)(k => 0.1 * (k + 1))
    val phiQ = Rff.featureVector(q, w, b)
    val khat = df.select(col("id"), Rff.khatCol(col("emb"), q, w, b))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, _) =>
      var s = 0.0
      (0 until 16).foreach(j => s += phi(id.toInt, j) * phiQ(j))
      assert(khat(id) == s, s"khat row $id")
    }
  }

  test("Matern-3/2 spectral frequencies: phi-phi approximates the " +
    "UnitMatern32 gram at D=4096 and the t-law is deterministic") {
    val x = randn(20, 2)
    val kern = Kernels.UnitMatern32(DenseVector(1.1))
    val want = kern.k(x)
    val (w, b) = Rff.frequenciesMatern32(2, 4096, DenseVector(1.1), seed = 23L)
    val (w2, _) = Rff.frequenciesMatern32(2, 4096, DenseVector(1.1), seed = 23L)
    assert(w == w2)
    val phi = Rff.featureMap(x, w, b)
    val got = phi * phi.t
    var m = 0.0
    (0 until 20).foreach(i => (0 until 20).foreach(j =>
      m = math.max(m, math.abs(got(i, j) - want(i, j)))))
    assert(m < 0.12, s"Matern RFF max err $m")
  }

  test("Matern-5/2 spectral frequencies: phi-phi approximates the " +
    "UnitMatern52 gram at D=4096 and the t-law is deterministic") {
    val x = randn(20, 2)
    val kern = Kernels.UnitMatern52(DenseVector(1.1))
    val want = kern.k(x)
    val (w, b) = Rff.frequenciesMatern52(2, 4096, DenseVector(1.1), seed = 23L)
    val (w2, _) = Rff.frequenciesMatern52(2, 4096, DenseVector(1.1), seed = 23L)
    assert(w == w2)
    val phi = Rff.featureMap(x, w, b)
    val got = phi * phi.t
    var m = 0.0
    (0 until 20).foreach(i => (0 until 20).foreach(j =>
      m = math.max(m, math.abs(got(i, j) - want(i, j)))))
    assert(m < 0.12, s"Matern-5/2 RFF max err $m")
  }

  test("trainLengthscale: log-ell learns through the cos tape — " +
    "shrinks from a too-smooth init and beats the frozen fit") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val n = 400
    val xs = (0 until n).map(i => -2.0 + 4.0 * i / (n - 1))
    val ys = xs.map(x => math.sin(3.0 * x) + 0.05 * rng.nextGaussian())
    val df = xs.zip(ys).toDF("x", "y").repartition(4)
    val (wu, b) = Rff.frequencies(1, 32, DenseVector(1.0), seed = 17L)
    def rmse(pred: DenseVector[Double]): Double = math.sqrt(
      (0 until n).map(i => math.pow(pred(i) - math.sin(3.0 * xs(i)), 2))
        .sum / n)
    val grid = DenseMatrix.tabulate(n, 1)((i, _) => xs(i))
    // frozen at the too-smooth init: underfits sin(3x)
    val frozen = RffGpr.train(df, Seq("x"), "y", wu * (1.0 / 2.0), b,
      noiseVar = 0.01, maxiter = 600, lr = 0.05, seed = 2L)
    val frozenRmse = rmse(frozen.predict(grid))
    val (fit, ell) = RffGpr.trainLengthscale(df, Seq("x"), "y", wu, b,
      noiseVar = 0.01, initEll = 2.0, maxiter = 900, lr = 0.05, seed = 2L)
    val learnedRmse = rmse(fit.predict(grid))
    assert(ell < 1.0, s"lengthscale did not shrink: $ell")
    assert(learnedRmse < 0.2, s"RMSE $learnedRmse")
    assert(learnedRmse < frozenRmse,
      s"learned $learnedRmse !< frozen $frozenRmse")
  }

  test("trainClassifier: RFF-GP classification separates a nonlinear " +
    "boundary (sign of sin(3x)) at >= 90% accuracy") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val n = 400
    val xs = (0 until n).map(i => -2.0 + 4.0 * i / (n - 1))
    val ys = xs.map(x => if (math.sin(3.0 * x) > 0) 1.0 else 0.0)
    val df = xs.zip(ys).toDF("x", "y").repartition(4)
    val (w, b) = Rff.frequencies(1, 32, DenseVector(0.5), seed = 17L)
    val fit = RffGpr.trainClassifier(df, Seq("x"), "y", w, b,
      maxiter = 600, lr = 0.05, seed = 4L)
    // a LINEAR decision function on raw x cannot beat ~50-60% here;
    // the RFF lift makes the nonlinear boundary linearly separable
    val grid = DenseMatrix.tabulate(n, 1)((i, _) => xs(i))
    val f = fit.predict(grid)
    val acc = (0 until n).count(i => (f(i) > 0.0) == (ys(i) > 0.5)) / n.toDouble
    assert(acc >= 0.9, s"accuracy $acc")
    // corpus-side scoring: sigmoid of predictCol matches driver signs
    val scored = df.select(col("x"), fit.predictCol(Seq(col("x"))).as("z"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.zipWithIndex.foreach { case (x, i) =>
      assert(math.abs(scored(x) - f(i)) < 1e-9)
    }
  }

  test("RffGpr: Bayesian linear regression on RFF features recovers " +
    "sin(3x) (RMSE < 0.15), posteriors shrink below the prior, and " +
    "column scoring matches driver prediction") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val n = 400
    val xs = (0 until n).map(i => -2.0 + 4.0 * i / (n - 1))
    val ys = xs.map(x => math.sin(3.0 * x) + 0.05 * rng.nextGaussian())
    val df = xs.zip(ys).toDF("x", "y").repartition(4)
    val (w, b) = Rff.frequencies(1, 32, DenseVector(0.5), seed = 17L)
    val fit = RffGpr.train(df, Seq("x"), "y", w, b,
      noiseVar = 0.01, maxiter = 600, lr = 0.05, seed = 2L)
    val grid = DenseMatrix.tabulate(n, 1)((i, _) => xs(i))
    val pred = fit.predict(grid)
    val rmse = math.sqrt(
      (0 until n).map(i => math.pow(pred(i) - math.sin(3.0 * xs(i)), 2))
        .sum / n)
    assert(rmse < 0.15, s"RMSE $rmse")
    // the data constrained the weights: average posterior scale well
    // below the N(0,1) prior
    val avgScale = breeze.linalg.sum(fit.scaleWeights) / 32.0
    assert(avgScale < 0.5, s"avg posterior scale $avgScale")
    // corpus-side scoring column agrees with the driver evaluation
    val scored = df.select(col("x"), fit.predictCol(Seq(col("x"))).as("f"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.zipWithIndex.foreach { case (x, i) =>
      assert(math.abs(scored(x) - pred(i)) < 1e-9, s"x=$x")
    }
  }
}
