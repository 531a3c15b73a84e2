package graft.ops

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA over the embedding column: the one-pass Gram aggregate vs a
  * driver brute force, partition invariance of the fixed-point sums,
  * and the whitening contract (decorrelated, unit-variance output). */
class PcaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val D = 64
  private lazy val embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val vecs: Array[Array[Double]] = embs
    .select("embedding").collect()
    .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("momentsOf matches a driver-side covariance within the " +
    "fixed-point quantum; gram sums are partition-invariant") {
    val (n, mean, cov) = Pca.momentsOf(embs, "embedding", D)
    assert(n == vecs.length)
    val bm = DenseVector.tabulate(D)(i => vecs.map(_(i)).sum / n)
    val bc = DenseMatrix.tabulate(D, D) { (i, j) =>
      vecs.map(v => v(i) * v(j)).sum / n - bm(i) * bm(j)
    }
    (0 until D).foreach { i =>
      assert(math.abs(mean(i) - bm(i)) < 1e-6, s"mean $i")
      (0 until D).foreach { j =>
        assert(math.abs(cov(i, j) - bc(i, j)) < 1e-6, s"cov $i,$j")
      }
    }
    val g1 = embs.agg(Pca.gramAgg(col("embedding"), D).as("g"))
      .head().getSeq[Long](0)
    val g2 = embs.repartition(7).agg(Pca.gramAgg(col("embedding"), D).as("g"))
      .head().getSeq[Long](0)
    assert(g1 == g2, "fixed-point gram sums must not depend on partitioning")
  }

  test("fit: eigenvalues descend, components are orthonormal, and the " +
    "whitened projection is decorrelated with unit variance") {
    val k = 8
    val model = Pca.fit(embs, "embedding", D, k)
    assert(model.eigenvalues.toSeq == model.eigenvalues.sortBy(-_).toSeq)
    assert(model.eigenvalues.forall(_ > 0))
    // orthonormal components
    (0 until k).foreach { a =>
      (a until k).foreach { b =>
        val dot = (0 until D).map(i =>
          model.components(a)(i) * model.components(b)(i)).sum
        val want = if (a == b) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-9, s"comp dot $a,$b = $dot")
      }
    }
    val proj = model.project(embs, "embedding", "pc", whiten = true)
      .select("pc").collect().map(_.getSeq[Double](0).toArray)
    val n = proj.length.toDouble
    val pm = (0 until k).map(c => proj.map(_(c)).sum / n)
    (0 until k).foreach { a =>
      (a until k).foreach { b =>
        val cv = proj.map(v => v(a) * v(b)).sum / n - pm(a) * pm(b)
        val want = if (a == b) 1.0 else 0.0
        assert(math.abs(cv - want) < 1e-4,
          s"whitened cov($a,$b) = $cv, want $want")
      }
    }
    // un-whitened: variance of component c equals its eigenvalue
    val raw = model.project(embs, "embedding", "pc")
      .select("pc").collect().map(_.getSeq[Double](0).toArray)
    val rm = (0 until k).map(c => raw.map(_(c)).sum / n)
    (0 until k).foreach { c =>
      val v = raw.map(x => x(c) * x(c)).sum / n - rm(c) * rm(c)
      assert(math.abs(v - model.eigenvalues(c)) <
        1e-4 * math.max(1.0, model.eigenvalues(c)),
        s"var($c) = $v vs eig ${model.eigenvalues(c)}")
    }
  }

  test("projection is a pure map: no shuffle, no join in the plan") {
    val model = Pca.fit(embs, "embedding", D, 4)
    val proj = model.project(embs, "embedding", "pc")
    proj.collect()
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"projection must be map-only")
  }
}
