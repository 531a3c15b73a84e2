package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parametric OPQ (Ge et al. 2014 "OPQ-P"): PCA rotation + greedy
  * eigenvalue allocation before product quantization. PQ quantizes
  * each subspace independently, so two things are wasted budget:
  * correlation ACROSS subspaces (fixed by rotating onto principal
  * axes) and UNBALANCED variance between subspaces (fixed by
  * [[Pca.opqAllocation]] assigning components so each subspace holds
  * a balanced log-variance mass — a bare PCA rotation demonstrably
  * does NOT cut PQ error here, because concentrating all variance
  * into one subspace trades error one-for-one). The rotation is a
  * pure map with literal components and the PQ stage is unchanged —
  * the pipeline primitives compose. */
class OpqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic correlated vectors: z ∈ R^4 independent-ish
    * (splitmix-style integer mixing), x = top half replicates z
    * blockwise so dims are strongly correlated across PQ subspaces. */
  private def correlated(n: Int, d: Int): Seq[(Long, Seq[Double])] = {
    def mix(s: Long): Long = {
      var z = s + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def unif(s: Long): Double =
      (mix(s) >>> 11).toDouble / (1L << 53).toDouble - 0.5
    (0 until n).map { i =>
      val z = Array.tabulate(4)(k => unif(i * 7L + k))
      // each output dim j is a fixed linear blend of two z's + tiny
      // independent noise: heavy cross-subspace correlation
      val x = Seq.tabulate(d) { j =>
        z(j % 4) * 2.0 + z((j + 1) % 4) * 0.7 + unif(i * 131L + j) * 0.05
      }
      (i.toLong, x)
    }
  }

  test("PCA rotation before PQ cuts quantization error on correlated " +
    "data; the rotation itself preserves pairwise geometry") {
    val d = 16
    val data = correlated(400, d)
    val df = data.toDF("vec_id", "emb").cache()
    val m = 4
    val ksub = 8
    val iters = 4

    def avgErr(frame: org.apache.spark.sql.DataFrame,
               embCol: String): Double = {
      val cb0 = Pq.codebooksFromFirst(frame, "vec_id", embCol, m, ksub)
      val cb = Pq.trainCodebooks(frame, "vec_id", embCol, cb0, iters)
      val coded = frame.withColumn("code",
        Pq.encodeCol(col(embCol), cb))
      coded.agg(avg(Pq.quantizationError(col(embCol), col("code"), cb)))
        .head().getDouble(0)
    }

    val plain = avgErr(df, "emb")
    val model = Pca.fit(df, "emb", d, d)
    val rotated = model.opqProject(df, "emb", "rot", m).cache()
    val opq = avgErr(rotated, "rot")

    // eigenvalue allocation spreads the rank-4 structure one
    // component per subspace: each codebook quantizes an effectively
    // low-dimensional blob instead of a full-rank one
    assert(opq < plain * 0.7,
      s"OPQ error $opq not clearly below plain PQ $plain")

    // the allocation balances: with 4 dominant eigenvalues and m = 4
    // subspaces, each subspace gets exactly one dominant component
    val perm = Pca.opqAllocation(model.eigenvalues.toSeq, m)
    val w = d / m
    (0 until m).foreach { b =>
      val block = perm.slice(b * w, (b + 1) * w)
      assert(block.count(_ < 4) == 1,
        s"subspace $b should hold exactly one dominant component: $block")
    }

    // the rotation is orthogonal: pairwise squared distances survive
    val pairs = rotated.select(col("vec_id"), col("emb"), col("rot"))
      .orderBy("vec_id").limit(20).collect()
      .map(r => (r.getSeq[Double](1), r.getSeq[Double](2)))
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    pairs.sliding(2).foreach { case Array((e1, r1), (e2, r2)) =>
      val de = l2(e1, e2)
      val dr = l2(r1, r2)
      assert(math.abs(de - dr) <= 1e-6 * (de + 1.0),
        s"rotation must preserve distances: $de vs $dr")
    }
    df.unpersist(); rotated.unpersist()
  }
}
