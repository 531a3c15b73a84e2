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

  /** `_SUCCESS`-style marker making [[saveTraining]] crash-consistent:
    * params/ and adam/ are two separate parquet overwrites, so a crash
    * between them would otherwise leave a torn checkpoint (new params +
    * stale optimizer moments/step) that restore would load silently. */
  private val CompleteMarker = "_TRAINING_COMPLETE"

  private def markerPath(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$CompleteMarker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, p)
  }

  /** Full training-state checkpoint: params + Adam moments + step
    * count — a resumable run (the slot variables tf.train.Saver
    * persists alongside the model). Resume by passing the step count
    * [[restoreTraining]] returns as `Elbo.optimize(startStep = …)`, so
    * the draw/minibatch seed streams continue where they stopped.
    * Crash-consistent: the new checkpoint is fully written (params +
    * adam + completion marker) into a `.tmp` sibling, then swapped in
    * via renames — the previous good checkpoint stays loadable until
    * the new one is complete, and [[restoreTraining]] recovers from
    * every intermediate crash point. */
  def saveTraining(spark: SparkSession, module: Module,
                   adam: graft.optimize.Adam, path: String): Unit = {
    import spark.implicits._
    val tmp = s"$path.tmp"
    val (fs, tmpMarker) = markerPath(spark, tmp)
    fs.delete(tmpMarker.getParent, true)
    save(spark, module, s"$tmp/params")
    val (m, v, t) = adam.state
    val rows = m.indices.map(i => (i, m(i), v(i))) :+ (-1, t.toDouble, 0.0)
    rows.toDF("idx", "m", "v")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/adam")
    fs.create(tmpMarker, true).close()
    // Swap: demote any previous checkpoint to .old, promote .tmp, then
    // drop .old. A crash at any point leaves at least one complete
    // checkpoint findable by restoreTraining's recovery scan.
    // Hadoop FileSystem reports most rename/delete failures by
    // RETURNING FALSE, not throwing — an unchecked rename here would
    // silently corrupt the swap (renaming onto an existing dir nests
    // tmp INSIDE it), defeating the whole crash-consistency scheme
    val destPath = new org.apache.hadoop.fs.Path(path)
    val oldPath = new org.apache.hadoop.fs.Path(s"$path.old")
    require(!fs.exists(oldPath) || fs.delete(oldPath, true),
      s"cannot clear $oldPath")
    require(!fs.exists(destPath) || fs.rename(destPath, oldPath),
      s"cannot demote $destPath to $oldPath")
    require(fs.rename(tmpMarker.getParent, destPath),
      s"cannot promote ${tmpMarker.getParent} to $destPath")
    fs.delete(oldPath, true) // best-effort: a leftover .old is harmless
  }

  /** Restores params + optimizer state; returns the checkpointed step
    * count (pass it as `Elbo.optimize(startStep = …)` to continue the
    * exact noise/sampling stream). If `path` itself lacks its
    * completion marker (crash mid-[[saveTraining]]), recovers the most
    * recent complete checkpoint from the `.tmp`/`.old` swap siblings;
    * throws only when no complete checkpoint exists anywhere. */
  def restoreTraining(spark: SparkSession, module: Module,
                      adam: graft.optimize.Adam, path: String): Int = {
    val (fs, marker) = markerPath(spark, path)
    if (!fs.exists(marker)) {
      val destPath = new org.apache.hadoop.fs.Path(path)
      val candidates = Seq(s"$path.tmp", s"$path.old")
        .map(p => new org.apache.hadoop.fs.Path(p))
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, CompleteMarker)))
      require(candidates.nonEmpty,
        s"no complete checkpoint at $path (or its .tmp/.old swap " +
          "siblings) — either saveTraining was interrupted before any " +
          "complete write, or this is a pre-marker legacy checkpoint " +
          "(load its params alone via Checkpoint.restore)")
      // refuse to "recover" OVER something that is not a torn
      // saveTraining layout: a marker-less dir of raw parquet files is
      // a live legacy Checkpoint.save — deleting it here would destroy
      // newer params and silently resurrect the stale swap sibling
      val looksTorn = !fs.exists(destPath) ||
        fs.exists(new org.apache.hadoop.fs.Path(destPath, "params")) ||
        fs.exists(new org.apache.hadoop.fs.Path(destPath, "adam"))
      require(looksTorn,
        s"$destPath exists but is not a saveTraining layout (no " +
          "params/ or adam/ inside) — it may be a live plain " +
          "Checkpoint.save; refusing to delete it during recovery")
      require(!fs.exists(destPath) || fs.delete(destPath, true),
        s"cannot clear torn checkpoint at $destPath")
      require(fs.rename(candidates.head, destPath),
        s"cannot promote ${candidates.head} to $destPath")
    }
    restore(spark, module, s"$path/params")
    val rows = spark.read.parquet(s"$path/adam").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val t = rows.find(_._1 == -1)
      .getOrElse(throw new IllegalStateException("no step-count row"))
    val slots = rows.filter(_._1 >= 0).sortBy(_._1)
    adam.restore(slots.map(_._2), slots.map(_._3), t._2.toInt)
    t._2.toInt
  }

  /** Restores the module's params from the checkpoint. `strict`
    * (default, and what [[restoreTraining]] relies on) requires the
    * name sets to match EXACTLY — a renamed child would otherwise
    * silently resume from fresh random init while slot-indexed Adam
    * moments load "successfully", the worst kind of partial resume.
    * `strict = false` restores the name intersection (transfer-style
    * partial loads). Sizes and index coverage always validate
    * (reference raises on mismatch too). */
  def restore(spark: SparkSession, module: Module, path: String,
              strict: Boolean = true): Unit = {
    val data = spark.read.parquet(path)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
    if (strict) {
      val moduleNames = module.sortedParams.map(_._1).toSet
      val ckptNames = data.keySet
      require(moduleNames == ckptNames,
        s"checkpoint/module param names differ — missing from " +
          s"checkpoint: ${(moduleNames -- ckptNames).toSeq.sorted}; " +
          s"extra in checkpoint: ${(ckptNames -- moduleNames).toSeq.sorted} " +
          "(pass strict = false for a partial name-intersection load)")
    }
    module.sortedParams.foreach { case (name, p) =>
      data.get(name).foreach { vs =>
        require(vs.length == p.size,
          s"checkpoint size mismatch for $name: ${vs.length} vs ${p.size}")
        val arr = new Array[Double](p.size)
        val seen = new Array[Boolean](p.size)
        vs.foreach { case (_, i, v) =>
          require(i >= 0 && i < p.size && !seen(i),
            s"checkpoint for $name has duplicate/out-of-range idx $i " +
              "(torn or corrupt write)")
          seen(i) = true
          arr(i) = v
        }
        p.setFree(DenseVector(arr))
      }
    }
  }
}
