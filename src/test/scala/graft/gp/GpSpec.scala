package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector, sum}
import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference `testing/test_kernels.py` (hand-rolled numpy
  * oracles, LLᵀ=K, batch==non-batch) and `testing/test_gp.py`
  * (x==z exactness, Nyström residual, m=600/n=400 no-NaN). */
class GpSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0)
  private def randn(r: Int, c: Int) =
    DenseMatrix.tabulate(r, c)((_, _) => rng.nextGaussian())

  // independent naive oracle (the test_kernels.py:10-63 pattern)
  private def rbfOracle(x: DenseMatrix[Double], x2: DenseMatrix[Double],
                        l: DenseVector[Double]): DenseMatrix[Double] =
    DenseMatrix.tabulate(x.rows, x2.rows) { (i, j) =>
      var s = 0.0
      (0 until x.cols).foreach { k =>
        val li = if (l.length == 1) l(0) else l(k)
        val d = (x(i, k) - x2(j, k)) / li
        s += d * d
      }
      math.exp(-0.5 * s)
    }

  test("UnitRBF matches the naive oracle, scalar + ARD (atol 1e-10)") {
    val x = randn(5, 2); val x2 = randn(6, 2)
    Seq(DenseVector(math.exp(rng.nextGaussian())),
      DenseVector(math.exp(rng.nextGaussian()), math.exp(rng.nextGaussian())))
      .foreach { l =>
        val kern = Kernels.UnitRBF(l)
        val got = kern.k(x, x2)
        val want = rbfOracle(x, x2, l)
        (0 until 5).foreach(i => (0 until 6).foreach(j =>
          assert(math.abs(got(i, j) - want(i, j)) < 1e-10)))
        assert(kern.kdiag(x) == DenseVector.ones[Double](5))
      }
  }

  test("UnitCsymRBF = K(x,x2)+K(x,-x2); Kdiag = 1+exp(-2||x/l||^2)") {
    val x = randn(5, 2); val x2 = randn(6, 2)
    val l = DenseVector(1.3)
    val kern = Kernels.UnitCsymRBF(l)
    val got = kern.k(x, x2)
    val want = rbfOracle(x, x2, l) + rbfOracle(x, x2 * -1.0, l)
    (0 until 5).foreach(i => (0 until 6).foreach(j =>
      assert(math.abs(got(i, j) - want(i, j)) < 1e-10)))
    val kd = kern.kdiag(x)
    (0 until 5).foreach { i =>
      val s = (0 until 2).map(k => math.pow(x(i, k) / l(0), 2)).sum
      assert(math.abs(kd(i) - (1.0 + math.exp(-2.0 * s))) < 1e-12)
    }
  }

  test("UnitMatern32 matches the naive oracle, reconstructs through " +
    "Cholesky, and drives the kernel-generic sparse path (x == z " +
    "identity, NaN-free sampling)") {
    val x = randn(5, 2); val x2 = randn(6, 2)
    val l = DenseVector(0.9)
    val kern = Kernels.UnitMatern32(l)
    val got = kern.k(x, x2)
    (0 until 5).foreach(i => (0 until 6).foreach { j =>
      val r = math.sqrt((0 until 2).map(c =>
        math.pow((x(i, c) - x2(j, c)) / l(0), 2)).sum + 1e-12)
      val a = math.sqrt(3.0) * r
      assert(math.abs(got(i, j) - (1.0 + a) * math.exp(-a)) < 1e-10)
    })
    assert(kern.kdiag(x) == DenseVector.ones[Double](5))
    // LL^T = K + jitter I
    val k9 = randn(9, 2)
    val lo = kern.choleskyK(k9)
    val rec = lo * lo.t
    val kk = kern.k(k9)
    (0 until 9).foreach(i => (0 until 9).foreach { j =>
      val want = kk(i, j) + (if (i == j) Kernels.JitterLevel else 0.0)
      assert(math.abs(rec(i, j) - want) < 1e-9)
    })
    // kernel-generic sparse path: x == z identity + NaN-free samples
    val z = DenseMatrix.tabulate(30, 2)((i, j) =>
      -2.0 + 4.0 * (2 * i + j) / 60.0)
    val sgp = new SparseGP(kern, z)
    val lnT = sgp.effectiveLT(z)
    assert(breeze.linalg.max(breeze.numerics.abs(lnT - sgp.lm.t)) < 5e-3)
    assert(breeze.linalg.max(breeze.numerics.abs(
      sgp.additionalCovDiag(z, lnT))) < 5e-3)
    val s = sgp.samples(randn(50, 2), randn(1, 30), SparseGP.Diagonal,
      Some(randn(1, 50)))
    s.foreachValue(v => assert(!v.isNaN && !v.isInfinite))
  }

  test("UnitMatern52 matches the naive oracle, reconstructs through " +
    "Cholesky, and orders between Matern32 and RBF off the diagonal") {
    val x = randn(5, 2); val x2 = randn(6, 2)
    val l = DenseVector(0.9)
    val kern = Kernels.UnitMatern52(l)
    val got = kern.k(x, x2)
    (0 until 5).foreach(i => (0 until 6).foreach { j =>
      val r = math.sqrt((0 until 2).map(c =>
        math.pow((x(i, c) - x2(j, c)) / l(0), 2)).sum + 1e-12)
      val a = math.sqrt(5.0) * r
      val want = (1.0 + a + a * a / 3.0) * math.exp(-a)
      assert(math.abs(got(i, j) - want) < 1e-10)
    })
    assert(kern.kdiag(x) == DenseVector.ones[Double](5))
    val k9 = randn(9, 2)
    val lo = kern.choleskyK(k9)
    val rec = lo * lo.t
    val kk = kern.k(k9)
    (0 until 9).foreach(i => (0 until 9).foreach { j =>
      val want = kk(i, j) + (if (i == j) Kernels.JitterLevel else 0.0)
      assert(math.abs(rec(i, j) - want) < 1e-9)
    })
    // smoothness ordering NEAR ZERO: M32 <= M52 <= RBF for small r
    // (greater curvature at the origin = smoother paths; at LARGE r
    // the Matérns' heavier tails overtake the RBF, so the ordering is
    // local, not global)
    val a0 = DenseMatrix.zeros[Double](1, 1)
    Seq(0.1, 0.3, 0.5).foreach { r =>
      val b0 = DenseMatrix((r))
      val one = DenseVector(1.0)
      val vM32 = Kernels.UnitMatern32(one).k(a0, b0)(0, 0)
      val vM52 = Kernels.UnitMatern52(one).k(a0, b0)(0, 0)
      val vRbf = Kernels.UnitRBF(one).k(a0, b0)(0, 0)
      assert(vM32 <= vM52 + 1e-12 && vM52 <= vRbf + 1e-12,
        s"small-r smoothness order broken at r=$r: $vM32 $vM52 $vRbf")
    }
  }

  test("UnitRQ matches the naive oracle, is a kernel (LLT = K), and " +
    "converges to the RBF as alpha grows") {
    val x = randn(5, 2); val x2 = randn(6, 2)
    val l = DenseVector(1.3)
    val rq = Kernels.UnitRQ(1.5, l)
    val got = rq.k(x, x2)
    (0 until 5).foreach(i => (0 until 6).foreach { j =>
      val d = (0 until 2).map(c =>
        math.pow((x(i, c) - x2(j, c)) / l(0), 2)).sum
      assert(math.abs(got(i, j) - math.pow(1.0 + d / 3.0, -1.5)) < 1e-10)
    })
    assert(rq.kdiag(x) == DenseVector.ones[Double](5))
    val k9 = randn(9, 2)
    val lo = rq.choleskyK(k9)
    val rec = lo * lo.t
    val kk = rq.k(k9)
    (0 until 9).foreach(i => (0 until 9).foreach { j =>
      val want = kk(i, j) + (if (i == j) Kernels.JitterLevel else 0.0)
      assert(math.abs(rec(i, j) - want) < 1e-9)
    })
    // scale-mixture limit: alpha -> inf recovers exp(-d/2)
    val rbf = Kernels.UnitRBF(l).k(x, x2)
    val big = Kernels.UnitRQ(1e6, l).k(x, x2)
    (0 until 5).foreach(i => (0 until 6).foreach { j =>
      assert(math.abs(big(i, j) - rbf(i, j)) < 1e-4,
        s"RQ(1e6) should match RBF at ($i,$j)")
    })
  }

  test("UnitPeriodic: exact period-p invariance, naive oracle, PSD " +
    "through Cholesky, locally-periodic Product composite") {
    val p = 3.0; val ell = 1.5
    val kern = Kernels.UnitPeriodic(p, ell)
    val x = randn(5, 2); val x2 = randn(6, 2)
    val got = kern.k(x, x2)
    (0 until 5).foreach(i => (0 until 6).foreach { j =>
      val s = (0 until 2).map { c =>
        val sn = math.sin(math.Pi * (x(i, c) - x2(j, c)) / p); sn * sn
      }.sum
      assert(math.abs(got(i, j) - math.exp(-2.0 * s / (ell * ell))) < 1e-12)
    })
    // shifting any point by the period leaves the gram unchanged
    val shifted = x2.copy
    (0 until shifted.rows).foreach(i => shifted(i, 0) += p)
    val gotShift = kern.k(x, shifted)
    (0 until 5).foreach(i => (0 until 6).foreach { j =>
      assert(math.abs(got(i, j) - gotShift(i, j)) < 1e-12,
        "period-p shift must be invisible")
    })
    assert(kern.kdiag(x) == DenseVector.ones[Double](5))
    val k9 = randn(9, 2)
    val lo = kern.choleskyK(k9)
    val rec = lo * lo.t
    val kk = kern.k(k9)
    (0 until 9).foreach(i => (0 until 9).foreach { j =>
      val want = kk(i, j) + (if (i == j) Kernels.JitterLevel else 0.0)
      assert(math.abs(rec(i, j) - want) < 1e-9)
    })
    // the standard locally-periodic composite drives Cholesky too
    val lp = Kernels.Product(Seq(kern, Kernels.UnitRBF(DenseVector(2.0))))
    lp.choleskyK(randn(9, 2)).foreachValue(v =>
      assert(!v.isNaN && !v.isInfinite))
  }

  test("UnitLinear = (x/l)·(x2/l)T; kdiag = diagonal of the gram") {
    val x = randn(5, 2); val x2 = randn(6, 2)
    val l = DenseVector(0.7, 1.4)
    val kern = Kernels.UnitLinear(l)
    val got = kern.k(x, x2)
    (0 until 5).foreach(i => (0 until 6).foreach { j =>
      val want = (0 until 2).map(c =>
        (x(i, c) / l(c)) * (x2(j, c) / l(c))).sum
      assert(math.abs(got(i, j) - want) < 1e-12)
    })
    val self = kern.k(x); val kd = kern.kdiag(x)
    (0 until 5).foreach(i => assert(math.abs(kd(i) - self(i, i)) < 1e-12))
  }

  test("Sum/Product combinators: gram algebra holds, weighted sum " +
    "scales, composite drives Cholesky and the kernel-generic sparse " +
    "path") {
    val x = randn(6, 2); val x2 = randn(4, 2)
    val rbf = Kernels.UnitRBF(DenseVector(0.8))
    val m32 = Kernels.UnitMatern32(DenseVector(1.2))
    val lin = Kernels.UnitLinear(DenseVector(2.0))
    val sum = Kernels.Sum(Seq(rbf, m32, lin))
    val wsum = Kernels.Sum(Seq(rbf, lin), Seq(0.5, 2.0))
    val prod = Kernels.Product(Seq(rbf, m32))
    val (ka, kb, kc) = (rbf.k(x, x2), m32.k(x, x2), lin.k(x, x2))
    (0 until 6).foreach(i => (0 until 4).foreach { j =>
      assert(math.abs(sum.k(x, x2)(i, j) -
        (ka(i, j) + kb(i, j) + kc(i, j))) < 1e-12)
      assert(math.abs(wsum.k(x, x2)(i, j) -
        (0.5 * ka(i, j) + 2.0 * kc(i, j))) < 1e-12)
      assert(math.abs(prod.k(x, x2)(i, j) - ka(i, j) * kb(i, j)) < 1e-12)
    })
    // kdiag algebra
    (0 until 6).foreach { i =>
      assert(math.abs(sum.kdiag(x)(i) -
        (rbf.kdiag(x)(i) + m32.kdiag(x)(i) + lin.kdiag(x)(i))) < 1e-12)
      assert(math.abs(prod.kdiag(x)(i) -
        rbf.kdiag(x)(i) * m32.kdiag(x)(i)) < 1e-12)
    }
    // composites stay PSD: LL^T = K + jitter I for both
    Seq[Kernel](sum, prod, wsum).foreach { kern =>
      val pts = randn(9, 2)
      val lo = kern.choleskyK(pts)
      val rec = lo * lo.t
      val kk = kern.k(pts)
      (0 until 9).foreach(i => (0 until 9).foreach { j =>
        val want = kk(i, j) + (if (i == j) Kernels.JitterLevel else 0.0)
        assert(math.abs(rec(i, j) - want) < 1e-9)
      })
    }
    // kernel-generic sparse path with an RBF+Linear trend composite
    val z = DenseMatrix.tabulate(30, 2)((i, j) =>
      -2.0 + 4.0 * (2 * i + j) / 60.0)
    val sgp = new SparseGP(Kernels.Sum(Seq(rbf, lin)), z)
    val lnT = sgp.effectiveLT(z)
    assert(breeze.linalg.max(breeze.numerics.abs(lnT - sgp.lm.t)) < 5e-3)
    val s = sgp.samples(randn(50, 2), randn(1, 30), SparseGP.Diagonal,
      Some(randn(1, 50)))
    s.foreachValue(v => assert(!v.isNaN && !v.isInfinite))
    // degenerate constructions are rejected outright
    intercept[IllegalArgumentException](Kernels.Sum(Nil))
    intercept[IllegalArgumentException](Kernels.Sum(Seq(rbf), Seq(-1.0)))
    intercept[IllegalArgumentException](Kernels.Sum(Seq(rbf), Seq(1.0, 2.0)))
  }

  test("Cholesky reconstructs K + jitter·I (ref test_kernels.py:184-226)") {
    Seq(Kernels.UnitRBF(DenseVector(0.8)),
      Kernels.UnitCsymRBF(DenseVector(0.8))).foreach { kern =>
      val x = randn(10, 2)
      val l = kern.choleskyK(x)
      val rec = l * l.t
      val k = kern.k(x)
      (0 until 10).foreach(i => (0 until 10).foreach { j =>
        val expect = k(i, j) + (if (i == j) Kernels.JitterLevel else 0.0)
        assert(math.abs(rec(i, j) - expect) < 1e-9)
      })
    }
  }

  test("batched == non-batched (ref test_kernels.py:110-123)") {
    val kern = Kernels.UnitRBF(DenseVector(1.1))
    val xs = (1 to 10).map(_ => randn(5, 2))
    val batch = kern.kBatch(xs)
    xs.zip(batch).foreach { case (x, kb) =>
      val k = kern.k(x)
      assert(sum(breeze.numerics.abs(k - kb)) < 1e-12)
    }
  }

  test("dense GP samples = u·Lᵀ (ref gp.py:37-50)") {
    val kern = Kernels.UnitRBF(DenseVector(1.0))
    val gp = new GP(kern)
    val x = randn(8, 2); val u = randn(3, 8)
    val s = gp.samples(x, u)
    val l = kern.choleskyK(x)
    val want = u * l.t
    assert(sum(breeze.numerics.abs(s - want)) < 1e-12)
    assert(s.rows == 3 && s.cols == 8)
  }

  test("x == z ⇒ effectiveLT ≈ Lmᵀ and Nyström residual ≈ 0 " +
    "(ref test_gp.py:68-113)") {
    val z = DenseMatrix.tabulate(30, 2)((i, j) => -2.0 + 4.0 * (2 * i + j) / 60.0)
    val sgp = new SparseGP(Kernels.UnitRBF(DenseVector(1.0)), z)
    val lnT = sgp.effectiveLT(z)
    val diff = lnT - sgp.lm.t
    assert(breeze.linalg.max(breeze.numerics.abs(diff)) < 5e-3)
    val resid = sgp.additionalCovDiag(z, lnT)
    assert(breeze.linalg.max(breeze.numerics.abs(resid)) < 5e-3)
  }

  test("sparse GP m=600/n=400 single pass, no NaN, diagonal+neglected " +
    "(ref test_gp.py:10-29)") {
    val z = randn(600, 1)
    val sgp = new SparseGP(Kernels.UnitRBF(DenseVector(1.0)), z)
    val x = randn(400, 1)
    val u = randn(1, 600)
    Seq(SparseGP.Neglected, SparseGP.Diagonal).foreach { c =>
      val eps = Some(randn(1, 400))
      val s = sgp.samples(x, u, c, eps)
      assert(s.rows == 1 && s.cols == 400)
      s.foreachValue(v => assert(!v.isNaN && !v.isInfinite))
    }
  }

  test("distributed sampleColumn matches driver path for Neglected and " +
    "is NaN-free for Diagonal") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val z = randn(50, 1)
    val sgp = new SparseGP(Kernels.UnitRBF(DenseVector(1.0)), z)
    val pts = (1 to 300).map(_ => rng.nextGaussian())
    val df = pts.toDF("x").repartition(4)
    val u = randn(2, 50)
    val out = sgp.sampleColumn(df, Seq("x"), u, SparseGP.Neglected)
      .select("x", "gp_sample").collect()
    // compare each row against the driver path
    val xm = DenseMatrix.tabulate(out.length, 1)((i, _) => out(i).getDouble(0))
    val want = sgp.samples(xm, u, SparseGP.Neglected)
    out.zipWithIndex.foreach { case (r, i) =>
      val arr = r.getSeq[Double](1)
      assert(arr.length == 2)
      (0 until 2).foreach(k => assert(math.abs(arr(k) - want(k, i)) < 1e-9))
    }
    val diag = sgp.sampleColumn(df, Seq("x"), u, SparseGP.Diagonal)
      .select("gp_sample").collect()
    diag.foreach(_.getSeq[Double](0).foreach(v => assert(!v.isNaN)))
  }

  test("fullrank driver correction adds chol(residual)-shaped noise") {
    val z = randn(40, 1)
    val sgp = new SparseGP(Kernels.UnitRBF(DenseVector(1.0)), z)
    val x = randn(30, 1)
    val u = DenseMatrix.zeros[Double](1, 40)
    val eps = randn(1, 30)
    val s = sgp.samples(x, u, SparseGP.FullRank, Some(eps))
    s.foreachValue(v => assert(!v.isNaN))
    // with u = 0 the sample is purely the correction term
    assert(breeze.linalg.max(breeze.numerics.abs(s)) > 0.0)
  }
}
