package graft.functions

import breeze.linalg.DenseVector
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Free-space ↔ constrained-space bijectors.
  *
  * Semantics from reference `Henbun/transforms.py:73-180`: each transform
  * exposes `forward` (free → constrained), `backward` (inverse) and the
  * log-Jacobian of the forward map (summed over elements; used as the
  * prior correction term in the variational KL, reference
  * `Henbun/variationals.py:208`).
  *
  * Each method exists in two flavors:
  *  - `Double`/Breeze form — for driver-held global parameters;
  *  - `Column` form — codegen'd Catalyst expressions for per-row LOCAL
  *    parameters living in DataFrame columns. The Column form is pure
  *    `org.apache.spark.sql.functions` arithmetic, so it stays inside
  *    whole-stage codegen at any scale.
  */
sealed trait Transform extends Serializable {
  def name: String
  def forward(x: Double): Double
  def backward(y: Double): Double
  /** Per-element log|dy/dx|; callers sum over elements. */
  def logJacobian(x: Double): Double

  def forward(x: Column): Column
  def backward(y: Column): Column
  def logJacobian(x: Column): Column

  final def forward(x: DenseVector[Double]): DenseVector[Double] = x.map(forward)
  final def backward(y: DenseVector[Double]): DenseVector[Double] = y.map(backward)
  final def logJacobianSum(x: DenseVector[Double]): Double = {
    var s = 0.0; x.foreach(v => s += logJacobian(v)); s
  }
}

object Transforms {

  /** Numerically-stable softplus column: log(1+eˣ) without overflow. */
  private[functions] def softplusCol(x: Column): Column =
    when(x > lit(0.0), x + log1p(exp(-x))).otherwise(log1p(exp(x)))

  /** y = x (reference `transforms.py:73-87`). */
  case object Identity extends Transform {
    val name = "identity"
    def forward(x: Double): Double = x
    def backward(y: Double): Double = y
    def logJacobian(x: Double): Double = 0.0
    def forward(x: Column): Column = x
    def backward(y: Column): Column = y
    def logJacobian(x: Column): Column = lit(0.0)
  }

  /** y = eˣ + lower (reference `transforms.py:90-107`). */
  final case class Exp(lower: Double = 1e-6) extends Transform {
    val name = "exp"
    def forward(x: Double): Double = math.exp(x) + lower
    def backward(y: Double): Double = math.log(y - lower)
    def logJacobian(x: Double): Double = x
    def forward(x: Column): Column = exp(x) + lit(lower)
    def backward(y: Column): Column = log(y - lit(lower))
    def logJacobian(x: Column): Column = x
  }

  /** Softplus: y = log(1+eˣ) + lower; exported by the reference as
    * `transforms.positive` (`transforms.py:110-143,271`). The stable form
    * (x + log1p(e^{-x}) for x > 0) matches TF's softplus numerics.
    */
  final case class Log1pe(lower: Double = 1e-6) extends Transform {
    val name = "log1pe"
    def forward(x: Double): Double = MathFns.log1pExp(x) + lower
    def backward(y: Double): Double = {
      val d = y - lower
      // inverse softplus: log(e^d − 1) = d + log1p(−e^{−d}), stable for large d
      if (d > 30) d else math.log(math.expm1(d))
    }
    def logJacobian(x: Double): Double = -MathFns.log1pExp(-x)
    def forward(x: Column): Column = softplusCol(x) + lit(lower)
    def backward(y: Column): Column = {
      val d = y - lit(lower)
      when(d > lit(30.0), d).otherwise(log(expm1(d)))
    }
    def logJacobian(x: Column): Column = -softplusCol(-x)
  }

  /** y = a + (b−a)·σ(x) (reference `transforms.py:146-180`). */
  final case class Logistic(a: Double = 0.0, b: Double = 1.0) extends Transform {
    require(b > a, s"Logistic requires b > a, got a=$a b=$b")
    val name = "logistic"
    def forward(x: Double): Double = a + (b - a) / (1.0 + math.exp(-x))
    def backward(y: Double): Double = math.log((y - a) / (b - y))
    def logJacobian(x: Double): Double =
      x - 2.0 * MathFns.log1pExp(x) + math.log(b - a)
    def forward(x: Column): Column = lit(a) + lit(b - a) / (lit(1.0) + exp(-x))
    def backward(y: Column): Column = log((y - lit(a)) / (lit(b) - y))
    def logJacobian(x: Column): Column =
      x - lit(2.0) * softplusCol(x) + lit(math.log(b - a))
  }

  /** `transforms.positive` alias, as exported by the reference. */
  val positive: Transform = Log1pe()
}
