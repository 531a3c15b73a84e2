package graft.optimize

import breeze.linalg.DenseVector
import graft.SparkTestSession
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Posterior sampling API (EP3): seeded determinism + statistical
  * agreement of summary moments with the assigned posterior. */
class PosteriorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def model(): Module = {
    val root = new Module
    val v = root.add("w", new Variational.Normal(Seq(3)))
    v.qMu.assign(DenseVector(1.0, -2.0, 0.5))
    v.qSqrt.assign(DenseVector(math.log(0.1), math.log(0.2), math.log(0.05)))
    root.initialize()
    root
  }

  test("samples are deterministic given a seed and fresh across draws") {
    val m = model()
    val a = Posterior.samples(spark, m, 5, seed = 42).collect()
    val b = Posterior.samples(spark, m, 5, seed = 42).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val perDraw = a.groupBy(_.getInt(0)).view.mapValues(
      _.map(_.getDouble(3)).toSeq).toMap
    assert(perDraw(0) != perDraw(1), "draws must differ")
  }

  test("summary means/sds track the assigned posterior (k=400)") {
    val m = model()
    val s = Posterior.summary(spark, m, k = 400, seed = 7).collect()
    assert(s.length == 3)
    val mus = Seq(1.0, -2.0, 0.5)
    val sds = Seq(0.1, 0.2, 0.05)
    s.foreach { r =>
      val el = r.getInt(1)
      assert(math.abs(r.getDouble(2) - mus(el)) < 0.05, s"mean el $el")
      assert(math.abs(r.getDouble(3) - sds(el)) < 0.05, s"sd el $el")
      assert(r.getDouble(4) < r.getDouble(5), "p05 < p95")
    }
  }
}
