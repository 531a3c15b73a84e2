package graft.functions

import breeze.linalg.{DenseMatrix, DenseVector, cholesky}
import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference `testing/test_densities.py`: densities checked
  * against independent oracles (Breeze distributions where available,
  * closed forms otherwise), and the Column form checked against the
  * scalar form row-by-row. */
class DensitiesSpec extends AnyFunSuite {

  private implicit val randBasis: breeze.stats.distributions.RandBasis =
    breeze.stats.distributions.RandBasis.mt0

  private val rng = new scala.util.Random(0)
  private val n = 50

  test("scalar gaussian/lognormal/exponential/gamma match Breeze oracles") {
    (1 to n).foreach { _ =>
      val x = rng.nextDouble() * 10 + 0.1
      val mu = rng.nextGaussian()
      val v = math.exp(rng.nextGaussian())
      val g = breeze.stats.distributions.Gaussian(mu, math.sqrt(v))
      assert(math.abs(Densities.scalar.gaussian(x, mu, v) - g.logPdf(x)) < 1e-10)
      val lamb = math.exp(rng.nextGaussian())
      // reference exponential density (densities.py:43-44) parameterizes by
      // MEAN lambda: -y/λ − lnλ, i.e. rate 1/λ
      val e = breeze.stats.distributions.Exponential(1.0 / lamb)
      assert(math.abs(Densities.scalar.exponential(lamb, x) - e.logPdf(x)) < 1e-10)
      val (shape, scale) = (math.exp(rng.nextGaussian()) + 0.2,
        math.exp(rng.nextGaussian()))
      val ga = breeze.stats.distributions.Gamma(shape, scale)
      assert(math.abs(Densities.scalar.gamma(shape, scale, x) - ga.logPdf(x)) < 1e-9)
    }
  }

  test("scalar studentT / beta / laplace / poisson match closed forms") {
    // studentT vs location-scale expansion of Breeze StudentsT at mean 0 scale 1
    (1 to n).foreach { _ =>
      val nu = math.exp(rng.nextGaussian()) + 0.5
      val x = rng.nextGaussian() * 2
      val t = breeze.stats.distributions.StudentsT(nu)
      assert(math.abs(Densities.scalar.studentT(x, 0.0, 1.0, nu) - t.logPdf(x)) < 1e-9)
      val (a, b) = (math.exp(rng.nextGaussian()) + 0.1,
        math.exp(rng.nextGaussian()) + 0.1)
      val y = rng.nextDouble()
      val be = breeze.stats.distributions.Beta(a, b)
      assert(math.abs(Densities.scalar.beta(a, b, y) - be.logPdf(y)) < 1e-8)
      val lambP = math.exp(rng.nextGaussian()) + 0.1
      val k = rng.nextInt(10)
      val po = breeze.stats.distributions.Poisson(lambP)
      assert(math.abs(Densities.scalar.poisson(lambP, k.toDouble) -
        po.logProbabilityOf(k)) < 1e-9)
      val (m, s) = (rng.nextGaussian(), math.exp(rng.nextGaussian()))
      val la = breeze.stats.distributions.Laplace(m, s)
      assert(math.abs(Densities.scalar.laplace(m, s, x) - la.logPdf(x)) < 1e-10)
    }
  }

  test("bimixture reduces to components at fraction 0/1 and is LSE-stable") {
    val lp0 = -800.0 // e^lp0 underflows naively
    val lp1 = -900.0
    val m = Densities.scalar.bimixture(0.5, lp0, lp1)
    assert(m > lp0 + math.log(0.5) - 1e-9 && m < lp0 + 1e-9)
    assert(math.abs(Densities.scalar.bimixture(1.0 - 1e-12, -1.0, -50.0) -
      (-1.0)) < 1e-9)
  }

  test("multivariateNormal matches product of 1-d gaussians for diagonal L") {
    val mu = DenseVector(0.5, -1.0, 2.0)
    val x = DenseVector(1.0, 0.0, 1.5)
    val sd = DenseVector(1.5, 0.7, 2.2)
    val l = DenseMatrix.zeros[Double](3, 3)
    (0 until 3).foreach(i => l(i, i) = sd(i))
    val expected = (0 until 3).map(i =>
      Densities.scalar.gaussian(x(i), mu(i), sd(i) * sd(i))).sum
    assert(math.abs(Densities.scalar.multivariateNormal(x, mu, l) - expected) < 1e-10)
  }

  test("multivariateNormal with full covariance matches quadratic form") {
    val rngJ = new scala.util.Random(7)
    val a = DenseMatrix.tabulate(4, 4)((_, _) => rngJ.nextGaussian())
    val cov = a * a.t + DenseMatrix.eye[Double](4) * 2.0
    val l = cholesky(cov)
    val mu = DenseVector(0.0, 1.0, -1.0, 0.5)
    val x = DenseVector(0.3, 0.7, -0.2, 1.1)
    val d = x - mu
    val covInv = breeze.linalg.inv(cov)
    val expected = -0.5 * 4 * math.log(2 * math.Pi) -
      0.5 * math.log(breeze.linalg.det(cov)) - 0.5 * (d.t * covInv * d)
    assert(math.abs(Densities.scalar.multivariateNormal(x, mu, l) - expected) < 1e-8)
  }

  test("Column densities equal scalar densities row-by-row") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = (1 to 200).map { _ =>
      (rng.nextDouble() * 20 + 0.1, rng.nextGaussian(),
        math.exp(rng.nextGaussian()), rng.nextDouble())
    }
    val df = rows.toDF("x", "mu", "v", "u")
    val got = df.select(
      Densities.gaussian(col("x"), col("mu"), col("v")).as("g"),
      Densities.lognormal(col("x"), col("mu"), col("v")).as("ln"),
      Densities.poisson(col("v"), org.apache.spark.sql.functions.floor(col("x")).cast("double")).as("po"),
      Densities.studentT(col("x"), col("mu"), col("v"), lit(4.0)).as("st"),
      Densities.beta(lit(2.0), lit(5.0), col("u")).as("be"),
      Densities.laplace(col("mu"), col("v"), col("x")).as("la"),
      Densities.bimixture(col("u"),
        Densities.gaussian(col("x"), lit(0.0), lit(1.0)),
        Densities.gaussian(col("x"), lit(5.0), lit(4.0))).as("bi")
    ).collect()
    rows.zip(got).foreach { case ((x, mu, v, u), r) =>
      assert(math.abs(r.getDouble(0) - Densities.scalar.gaussian(x, mu, v)) < 1e-10)
      assert(math.abs(r.getDouble(1) - Densities.scalar.lognormal(x, mu, v)) < 1e-10)
      assert(math.abs(r.getDouble(2) -
        Densities.scalar.poisson(v, math.floor(x))) < 1e-10)
      assert(math.abs(r.getDouble(3) -
        Densities.scalar.studentT(x, mu, v, 4.0)) < 1e-10)
      assert(math.abs(r.getDouble(4) - Densities.scalar.beta(2.0, 5.0, u)) < 1e-10)
      assert(math.abs(r.getDouble(5) - Densities.scalar.laplace(mu, v, x)) < 1e-10)
      assert(math.abs(r.getDouble(6) - Densities.scalar.bimixture(u,
        Densities.scalar.gaussian(x, 0.0, 1.0),
        Densities.scalar.gaussian(x, 5.0, 4.0))) < 1e-10)
    }
  }
}
