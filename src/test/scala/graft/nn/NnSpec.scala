package graft.nn

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkTestSession
import graft.autodiff.{CompiledExpr, Expr, ExprNN}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference `testing/test_nn.py:11-52`: MLP forward equals a
  * hand-composed matmul chain; plus Expr-MLP == Breeze-MLP agreement
  * and distributed == driver forward. */
class NnSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0)
  private def randn(r: Int, c: Int) =
    DenseMatrix.tabulate(r, c)((_, _) => rng.nextGaussian())
  private def randv(n: Int) = DenseVector.fill(n)(rng.nextGaussian())

  private def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))

  test("forward == hand-composed matmul chain, nodes [3,2,4] sigmoid " +
    "(ref test_nn.py:11-32)") {
    val w1 = randn(3, 2); val b1 = randv(2)
    val w2 = randn(2, 4); val b2 = randv(4)
    val net = new NeuralNet(Seq(
      NeuralNet.Layer(w1, b1, NeuralNet.Sigmoid),
      NeuralNet.Layer(w2, b2, NeuralNet.Sigmoid)))
    val x = randn(5, 3)
    val got = net.forward(x)
    (0 until 5).foreach { i =>
      val h = (0 until 2).map(j =>
        sigmoid((0 until 3).map(k => x(i, k) * w1(k, j)).sum + b1(j)))
      val y = (0 until 4).map(j =>
        sigmoid((0 until 2).map(k => h(k) * w2(k, j)).sum + b2(j)))
      (0 until 4).foreach(j => assert(math.abs(got(i, j) - y(j)) < 1e-12))
    }
  }

  test("nodes [3,2,4,5] with (sigmoid, relu, identity) chains correctly") {
    val layers = Seq(
      NeuralNet.Layer(randn(3, 2), randv(2), NeuralNet.Sigmoid),
      NeuralNet.Layer(randn(2, 4), randv(4), NeuralNet.Relu),
      NeuralNet.Layer(randn(4, 5), randv(5), NeuralNet.Identity))
    val net = new NeuralNet(layers)
    val x = randn(6, 3)
    val got = net.forward(x)
    val want = layers.foldLeft(x)((h, l) => l.forward(h))
    assert(breeze.linalg.sum(breeze.numerics.abs(got - want)) < 1e-12)
    assert(got.cols == 5)
  }

  test("distributed forwardColumn == driver forward") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val net = new NeuralNet(Seq(
      NeuralNet.Layer(randn(2, 3), randv(3), NeuralNet.Sigmoid),
      NeuralNet.Layer(randn(3, 2), randv(2), NeuralNet.Tanh)))
    val pts = (1 to 257).map(_ => (rng.nextGaussian(), rng.nextGaussian()))
    val df = pts.toDF("x1", "x2").repartition(3)
    val rows = net.forwardColumn(df, Seq("x1", "x2"), blockSize = 64)
      .select("x1", "x2", "enc").collect()
    rows.foreach { r =>
      val x = DenseMatrix((r.getDouble(0), r.getDouble(1)))
      val want = net.forward(x)
      val got = r.getSeq[Double](2)
      assert(got.length == 2)
      (0 until 2).foreach(j => assert(math.abs(got(j) - want(0, j)) < 1e-12))
    }
  }

  test("ExprNN.mlp equals Breeze forward (weights row-major)") {
    val w1 = randn(2, 3); val b1 = randv(3)
    val w2 = randn(3, 2); val b2 = randv(2)
    val net = new NeuralNet(Seq(
      NeuralNet.Layer(w1, b1, NeuralNet.Sigmoid),
      NeuralNet.Layer(w2, b2, NeuralNet.Identity)))
    // flatten row-major into the slot vector, inputs first
    val theta = (for (i <- 0 until 2; j <- 0 until 3) yield w1(i, j)) ++
      b1.toScalaVector ++
      (for (i <- 0 until 3; j <- 0 until 2) yield w2(i, j)) ++ b2.toScalaVector
    val wE1 = (0 until 6).map(i => graft.autodiff.P(i): Expr)
    val bE1 = (6 until 9).map(i => graft.autodiff.P(i): Expr)
    val wE2 = (9 until 15).map(i => graft.autodiff.P(i): Expr)
    val bE2 = (15 until 17).map(i => graft.autodiff.P(i): Expr)
    val outs = ExprNN.mlp(IndexedSeq(graft.autodiff.In(0), graft.autodiff.In(1)),
      Seq(wE1, wE2), Seq(bE1, bE2),
      Seq(Expr.sigmoid _, identity[Expr] _))
    val x = Array(0.7, -1.2)
    val want = net.forward(DenseMatrix((x(0), x(1))))
    outs.zipWithIndex.foreach { case (o, j) =>
      val tape = CompiledExpr.compile(o, 2, 17, 0)
      val got = tape.eval(x, theta.toArray, Array.empty, tape.newValues)
      assert(math.abs(got - want(0, j)) < 1e-12)
    }
  }

  test("local fullrank sample matches Breeze tril multiply and KL is the " +
    "specialized Normal form (ref variationals.py:141-147,225-230)") {
    val s = 3
    val mu = Array(0.5, -1.0, 2.0)
    val lp = Array(1.2, 0.4, 0.9, -0.3, 0.7, 1.5) // row-major lower tri
    val eps = Array(0.3, -0.8, 1.1)
    val muE = (0 until 3).map(i => graft.autodiff.P(i): Expr)
    val lpE = (0 until 6).map(i => graft.autodiff.P(3 + i): Expr)
    val epE = (0 until 3).map(i => graft.autodiff.P(9 + i): Expr)
    val theta = mu ++ lp ++ eps
    val sample = ExprNN.localFullrankSample(muE, lpE, epE)
    val lmat = DenseMatrix((1.2, 0.0, 0.0), (0.4, 0.9, 0.0), (-0.3, 0.7, 1.5))
    val want = DenseVector(mu) + lmat * DenseVector(eps)
    sample.zipWithIndex.foreach { case (e, i) =>
      val tape = CompiledExpr.compile(e, 0, 12, 0)
      val got = tape.eval(Array.empty, theta, Array.empty, tape.newValues)
      assert(math.abs(got - want(i)) < 1e-12, s"x_$i")
    }
    val kl = ExprNN.klFullrankNormalMc(lpE, epE, sample)
    val tape = CompiledExpr.compile(kl, 0, 12, 0)
    val got = tape.eval(Array.empty, theta, Array.empty, tape.newValues)
    val wantKl = (0 until s).map { i =>
      val d = lmat(i, i)
      -0.5 * (math.log(d * d) + eps(i) * eps(i) - want(i) * want(i))
    }.sum
    assert(math.abs(got - wantKl) < 1e-12)
  }

  test("amortized inference: encoder-driven local Normal posterior trains " +
    "(local feed path, ref variationals.py:121-129)") {
    val spark = SparkTestSession.spark
    import graft.core._
    import graft.data.DataSet
    import graft.optimize.Elbo
    import org.apache.spark.sql.functions._
    // heteroscedastic toy: y ~ N(0, scale(x)²) with scale depending on x
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(((col("l_quantity") - 25.5) / 14.4).as("x"),
        ((col("l_extendedprice") / 10000.0 - 3.8) / 2.5).as("y"))
      .limit(512)
    val root = new Module
    // encoder 1 -> 3 -> 2 (mu, logScale per datum)
    val w1 = root.add("w1", new Param(Seq(1, 3), initStddev = 0.3))
    val b1 = root.add("b1", new Param(Seq(3), initStddev = 0.1))
    val w2 = root.add("w2", new Param(Seq(3, 2), initStddev = 0.3))
    val b2 = root.add("b2", new Param(Seq(2), initStddev = 0.1))
    val ds = new DataSet(li, seed = 0)
    val elbo = new Elbo(root, ds, Seq("x", "y", "eps"), ctx => {
      val enc = ExprNN.mlp(IndexedSeq(ctx.in("x")),
        Seq(ctx.read(w1), ctx.read(w2)), Seq(ctx.read(b1), ctx.read(b2)),
        Seq(Expr.tanh _, identity[Expr] _))
      val local = ExprNN.localNormalSample(enc(0), enc(1), ctx.in("eps"))
      graft.autodiff.ExprFns.gaussian(ctx.in("y"), local, Expr.c(0.25)) -
        ExprNN.klDiagNormal(enc(0), enc(1))
    }, seed = 0,
      augment = (df, step) => df.withColumn("eps",
        org.apache.spark.sql.functions.randn(1000 + step)))
    val before = elbo.run(training = true)
    val after = elbo.optimize(maxiter = 120, lr = 0.05)
    assert(after > before, s"amortized ELBO did not improve: $before -> $after")
    ds.unpersist()
  }

  test("Bayesian NN: Variational weights through ExprNN.dense train " +
    "end-to-end — ELBO improves and weight posteriors shrink " +
    "(ref nn.py:34-87, weights may be Variational)") {
    val spark = SparkTestSession.spark
    import graft.core._
    import graft.data.DataSet
    import graft.optimize.Elbo
    import org.apache.spark.sql.functions._
    // 1-hidden-layer Bayesian MLP 1 -> 4 -> 1 on a smooth regression
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(((col("l_quantity") - 25.5) / 14.4).as("x"))
      .withColumn("y", sin(col("x") * 2.0) * 0.8)
      .limit(512)
    val root = new Module
    val w1 = root.add("w1", new Variational.Normal(Seq(1, 4), stddev = 1.0))
    val b1 = root.add("b1", new Variational.Normal(Seq(4), stddev = 1.0))
    val w2 = root.add("w2", new Variational.Normal(Seq(4, 1), stddev = 1.0))
    val b2 = root.add("b2", new Variational.Normal(Seq(1), stddev = 1.0))
    val ds = new DataSet(li, seed = 0)
    val elbo = new Elbo(root, ds, Seq("x", "y"), ctx => {
      // every weight read is a fresh reparameterized posterior draw —
      // the Bayesian-NN composition the reference allows in NeuralNet
      val h = ExprNN.dense(IndexedSeq(ctx.in("x")),
        ctx.sample(w1), ctx.sample(b1), Expr.tanh)
      val out = ExprNN.dense(h, ctx.sample(w2), ctx.sample(b2),
        identity[Expr])
      graft.autodiff.ExprFns.gaussian(ctx.in("y"), out(0), Expr.c(0.05))
    }, seed = 0)
    val before = elbo.run(training = true)
    val after = elbo.optimize(maxiter = 250, lr = 0.05)
    assert(after > before, s"Bayesian-NN ELBO did not improve: $before -> $after")
    // posterior scales start at exp(q_sqrt) ≈ 1.0; data must shrink
    // them (weights become informed)
    val scales = Seq(w1, b1, w2, b2).flatMap(v =>
      v.qSqrt.value.toScalaVector.map(math.exp))
    val meanScale = scales.sum / scales.size
    assert(meanScale < 0.7,
      s"weight posteriors did not shrink: mean scale $meanScale")
    ds.unpersist()
  }

  test("ExprNN.split fans an encoder vector into per-child slices by " +
    "declaration order (ref param.py:516-537)") {
    val enc = IndexedSeq.tabulate(6)(i => Expr.c(i.toDouble))
    val parts = ExprNN.split(enc, Seq(1, 3, 2))
    assert(parts.map(_.length) == Seq(1, 3, 2))
    assert(parts(0) == enc.slice(0, 1))
    assert(parts(1) == enc.slice(1, 4))
    assert(parts(2) == enc.slice(4, 6))
    assertThrows[IllegalArgumentException](ExprNN.split(enc, Seq(2, 2)))
  }
}
