package graft.core

import graft.SparkTestSession
import graft.autodiff.ExprFns
import graft.data.DataSet
import graft.optimize.Elbo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Float-width mode (reference defaults float32, `henbunrc:7-8`;
  * float64 stays OUR default for DuckDB-oracle hash-matching — SURVEY
  * §4). Float32 truncates the data plane at ingestion; training results
  * agree with float64 at float32 tolerance, not bitwise. */
class Float32Spec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("narrow() rounds to the float32 grid; temp_settings stack " +
    "restores (ref _settings.py:120-149)") {
    assert(Settings.Float64.narrow(math.Pi) == math.Pi)
    assert(Settings.Float32.narrow(math.Pi) == math.Pi.toFloat.toDouble)
    assert(Settings.Float32.narrow(math.Pi) != math.Pi)
    assert(Settings.current.floatType == Settings.Float64)
    Settings.withSettings(Settings(floatType = Settings.Float32)) {
      assert(Settings.current.floatType == Settings.Float32)
    }
    assert(Settings.current.floatType == Settings.Float64)
  }

  test("float32 mode: projected vectors are float-representable; " +
    "training matches float64 within float32 tolerance") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(((col("l_quantity") - 25.5) / 14.4).as("x"),
        ((col("l_extendedprice") / 10000.0 - 3.8) / 2.5).as("y"))
      .limit(2000)

    def fit(ft: Settings.FloatType): (Double, Double, Array[Array[Double]]) = {
      // dtype is sampled at DataSet construction (reference: data cast
      // at feed under the current settings)
      val ds = Settings.withSettings(Settings(floatType = ft)) {
        new DataSet(li, seed = 0)
      }
      val root = new Module
      val a = root.add("a", new Variational.Normal(Seq(1)))
      val b = root.add("b", new Variational.Normal(Seq(1)))
      val elbo = new Elbo(root, ds, Seq("x", "y"), ctx => {
        val f = ctx.sample1(a) + ctx.sample1(b) * ctx.in("x")
        ExprFns.gaussian(ctx.in("y"), f, graft.autodiff.Expr.c(1.0))
      }, seed = 0)
      elbo.optimize(maxiter = 200, lr = 0.1)
      val rows = ds.localTrain(Seq("x", "y"))
      val out = (a.qMu.value(0), b.qMu.value(0), rows)
      ds.unpersist()
      out
    }

    val (a64, b64, rows64) = fit(Settings.Float64)
    val (a32, b32, rows32) = fit(Settings.Float32)

    // float32 plane really is narrowed; float64 plane is not
    assert(rows32.flatten.forall(v => v == v.toFloat.toDouble),
      "float32 vectors carry non-representable doubles")
    assert(rows64.flatten.exists(v => v != v.toFloat.toDouble),
      "float64 fixture unexpectedly float-exact — test has no teeth")

    // tolerance-adjusted parity: same optimum at float32 resolution
    assert(math.abs(a32 - a64) < 1e-3, s"intercept $a32 vs $a64")
    assert(math.abs(b32 - b64) < 1e-3, s"slope $b32 vs $b64")
  }
}
