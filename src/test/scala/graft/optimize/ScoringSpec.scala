package graft.optimize

import graft.SparkTestSession
import graft.autodiff.ExprFns
import graft.core._
import graft.data.DataSet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch scoring (reference EP3, `Model.run`, `model.py:84-96`): a
  * trained model's expressions swept over a DataFrame as a column. */
class ScoringSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("attach evaluates an expression against current θ per row") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_quantity") / 10.0).as("x")).limit(64)
    val root = new Module
    val p = root.add("p", new Param(Seq(1), initMean = 2.0, initStddev = 0.0))
    val ds = new DataSet(li, seed = 0)
    val elbo = new Elbo(root, ds, Seq("x"),
      ctx => -(ctx.read1(p) - ctx.in("x")).sq)
    val scored = Scoring.attach(elbo, li,
      ctx => -(ctx.read1(p) - ctx.in("x")).sq, "score").collect()
    assert(scored.length == 64)
    scored.foreach { r =>
      val x = r.getDouble(r.fieldIndex("x"))
      val want = -(2.0 - x) * (2.0 - x)
      assert(math.abs(r.getDouble(r.fieldIndex("score")) - want) < 1e-12)
    }
    ds.unpersist()
  }

  test("zero draws score a variational model at its posterior mean") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(((col("l_quantity") - 25.5) / 14.4).as("x"),
        ((col("l_extendedprice") / 10000.0 - 3.8) / 2.5).as("y"))
    val root = new Module
    val a = root.add("a", new Variational.Normal(Seq(1)))
    val b = root.add("b", new Variational.Normal(Seq(1)))
    val ds = new DataSet(li, seed = 0)
    val elbo = new Elbo(root, ds, Seq("x", "y"), ctx =>
      ExprFns.gaussian(ctx.in("y"),
        ctx.sample1(a) + ctx.sample1(b) * ctx.in("x"),
        graft.autodiff.Expr.c(0.25)), seed = 0)
    elbo.optimize(maxiter = 100, lr = 0.1)
    // default draws = zeros → sample(v) = qMu: posterior-mean prediction
    val scored = Scoring.attach(elbo, li.limit(32),
      ctx => ctx.sample1(a) + ctx.sample1(b) * ctx.in("x"), "pred").collect()
    val (ma, mb) = (a.qMu.value(0), b.qMu.value(0))
    scored.foreach { r =>
      val want = ma + mb * r.getDouble(r.fieldIndex("x"))
      assert(math.abs(r.getDouble(r.fieldIndex("pred")) - want) < 1e-12)
    }
    ds.unpersist()
  }
}
