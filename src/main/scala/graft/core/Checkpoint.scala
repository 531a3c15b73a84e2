package graft.core

import breeze.linalg.DenseVector
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Checkpoint save/restore of the global parameter tree by long name
  * (reference `Parameterized.saver/save/restore` via tf.train.Saver,
  * `Henbun/param.py:562-603`) — here as a Parquet dataset of
  * (name, idx, value) in FREE space, the MLWritable-style persistence
  * SURVEY §1 prescribes. */
object Checkpoint {

  def save(spark: SparkSession, module: Module, path: String): Unit = {
    import spark.implicits._
    val rows = module.sortedParams.flatMap { case (name, p) =>
      val f = p.freeValue
      (0 until p.size).map(i => (name, i, f(i)))
    }
    rows.toDF("name", "idx", "value")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Restores matching names; throws if a checkpointed param is missing
    * or sized differently (reference raises on mismatch too). */
  def restore(spark: SparkSession, module: Module, path: String): Unit = {
    val data = spark.read.parquet(path)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
    module.sortedParams.foreach { case (name, p) =>
      data.get(name).foreach { vs =>
        require(vs.length == p.size,
          s"checkpoint size mismatch for $name: ${vs.length} vs ${p.size}")
        val arr = new Array[Double](p.size)
        vs.foreach { case (_, i, v) => arr(i) = v }
        p.setFree(DenseVector(arr))
      }
    }
  }
}
