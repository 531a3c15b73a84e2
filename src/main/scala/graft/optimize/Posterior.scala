package graft.optimize

import breeze.linalg.DenseVector
import graft.core.{Module, Variational}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Posterior evaluation (reference EP3, SURVEY §3): after training,
  * draw k fresh reparameterized samples from every variational in the
  * tree — the Spark analog of re-running a sampling op under `tf_mode`
  * (`Model.run` loops in the reference notebooks,
  * `notebooks/GaussianProcess.ipynb` cell 17).
  *
  * Returns a DataFrame (draw, param, element, value): k draws
  * materialize in ONE job via a local range — the "k draws in one pass"
  * plan — and downstream aggregation (posterior means, quantiles,
  * predictive intervals) stays in Spark.
  */
object Posterior {

  def samples(spark: SparkSession, module: Module, k: Int,
              seed: Long = 0L): DataFrame = {
    import spark.implicits._
    val vars = module.variationals
    // draws materialize driver-side: k·Σsize rows. Parameters are
    // model-sized by definition, but k is caller-chosen — bound the
    // product so a huge-k request fails loudly instead of OOMing the
    // driver (distributed draws for data-sized sampling live in
    // SparseGP.sampleColumn / posteriorSampleColumn instead)
    val totalSize = vars.map(_._2.size.toLong).sum
    require(k.toLong * totalSize <= 50000000L,
      s"k=$k × params=$totalSize exceeds the driver budget — " +
        "use the distributed sampling paths for data-sized draws")
    // ONE RNG stream across draws — consecutive java.util.Random seeds
    // produce correlated first outputs, so never seed per draw
    val rng = new scala.util.Random(seed)
    val rows = (0 until k).flatMap { draw =>
      vars.flatMap { case (name, v) =>
        val u = DenseVector.fill(v.size)(rng.nextGaussian())
        val s = v.sample(u)
        (0 until v.size).map(i => (draw, name, i, s(i)))
      }
    }
    rows.toDF("draw", "param", "element", "value")
  }

  /** Posterior summary per parameter element: mean, stddev, and a
    * central 90% interval over k draws. */
  def summary(spark: SparkSession, module: Module, k: Int = 200,
              seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.functions._
    samples(spark, module, k, seed)
      .groupBy("param", "element")
      .agg(avg("value").as("mean"), stddev_samp(col("value")).as("sd"),
        expr("percentile(value, 0.05)").as("p05"),
        expr("percentile(value, 0.95)").as("p95"))
      .orderBy("param", "element")
  }
}
