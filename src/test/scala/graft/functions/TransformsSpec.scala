package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference `testing/test_transforms.py:39-75`: forward∘backward
  * = id, Column form == Double form, hand-coded log-Jacobian == numeric
  * derivative of the forward map. */
class TransformsSpec extends AnyFunSuite {

  private val transforms: Seq[Transform] = Seq(
    Transforms.Identity, Transforms.Exp(), Transforms.Log1pe(),
    Transforms.Logistic(), Transforms.Logistic(7.3, 19.4))

  test("forward/backward roundtrip (atol 1e-4, ref test_transforms.py:46-53)") {
    val rng = new scala.util.Random(0)
    transforms.foreach { t =>
      (1 to 200).foreach { _ =>
        val x = rng.nextDouble() * 16 - 8
        assert(math.abs(t.backward(t.forward(x)) - x) < 1e-4,
          s"${t.name} roundtrip at $x")
      }
    }
  }

  test("log-jacobian matches numeric derivative log|dy/dx|") {
    val h = 1e-6
    transforms.foreach { t =>
      Seq(-4.0, -1.3, -0.2, 0.0, 0.7, 2.9).foreach { x =>
        if (t != Transforms.Identity) {
          val num = math.log(math.abs(
            (t.forward(x + h) - t.forward(x - h)) / (2 * h)))
          assert(math.abs(t.logJacobian(x) - num) < 1e-5,
            s"${t.name} logjac at $x: ${t.logJacobian(x)} vs $num")
        }
      }
    }
  }

  test("Column form equals Double form row-by-row") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val data = (-40 to 40).map(_ / 5.0)
    val df = data.toDF("x")
    transforms.foreach { t =>
      val rows = df.select(col("x"), t.forward(col("x")).as("y"),
        t.logJacobian(col("x")).as("lj")).collect()
      rows.foreach { r =>
        val (x, y, lj) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        assert(math.abs(y - t.forward(x)) < 1e-12, s"${t.name} fwd at $x")
        assert(math.abs(lj - t.logJacobian(x)) < 1e-12, s"${t.name} lj at $x")
      }
    }
  }

  test("positive alias is Log1pe (ref transforms.py:271)") {
    assert(Transforms.positive.isInstanceOf[Transforms.Log1pe])
  }

  test("Log1pe backward is stable for large y") {
    val t = Transforms.Log1pe()
    assert(math.abs(t.backward(t.forward(500.0)) - 500.0) < 1e-9)
  }
}
