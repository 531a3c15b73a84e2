package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5 plan): bijector laws for every transform —
  * forward∘backward = id, monotonicity, log-Jacobian vs numeric
  * derivative — over generated inputs rather than hand-picked points
  * (mirrors `testing/test_transforms.py:39-75` which checks the same
  * laws on fixed grids). */
class TransformPropSpec extends AnyFunSuite {

  private val free = Gen.choose(-20.0, 20.0)
  private val all: Seq[Transform] = Seq(
    Transforms.Identity, Transforms.Exp(), Transforms.Log1pe(),
    Transforms.Logistic(), Transforms.Logistic(-2.5, 7.0))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("backward(forward(x)) == x within 1e-7") {
    all.foreach { t =>
      check(Prop.forAll(free) { x =>
        val y = t.forward(x)
        // saturation zones are excluded: the roundtrip is only
        // well-conditioned where forward is not within eps of a bound
        val cond = t match {
          case Transforms.Logistic(a, b) => y > a + 1e-9 && y < b - 1e-9
          case _: Transforms.Exp | _: Transforms.Log1pe => math.abs(x) < 15
          case _ => true
        }
        !cond || math.abs(t.backward(y) - x) < 1e-7
      })
    }
  }

  test("forward is strictly increasing (valid bijector)") {
    all.foreach { t =>
      check(Prop.forAll(free, Gen.choose(1e-4, 1.0)) { (x, h) =>
        math.abs(x) >= 15 || t.forward(x + h) > t.forward(x)
      })
    }
  }

  test("logJacobian matches the numeric derivative of forward") {
    all.foreach { t =>
      check(Prop.forAll(Gen.choose(-10.0, 10.0)) { x =>
        val h = 1e-6
        val num = (t.forward(x + h) - t.forward(x - h)) / (2 * h)
        math.abs(t.logJacobian(x) - math.log(num)) < 1e-4
      })
    }
  }

  test("constrained outputs land in the transform's range") {
    check(Prop.forAll(free) { x =>
      val l = Transforms.Logistic(-2.5, 7.0).forward(x)
      Transforms.Exp().forward(x) > 0.0 &&
        Transforms.Log1pe().forward(x) > 0.0 && l >= -2.5 && l <= 7.0
    })
  }
}
