package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Data plane: `Data` / `MinibatchData` + the train/test Indexer
  * (reference `Henbun/param.py:676-739`, `Henbun/model.py:126-153`).
  *
  * Reference policy: 90/10 shuffled split; minibatches drawn uniformly
  * WITH replacement per step. Spark-first mapping: seeded
  * `randomSplit` (the split is a lazy, partition-parallel filter — no
  * shuffle, no driver materialization) and seeded
  * `sample(withReplacement = true)` per step — both scale to any data
  * size because they are row-local operations.
  */
final class DataSet(df: DataFrame, seed: Long = 0L,
                    testFraction: Double = 0.1) {

  /** Cached full data (reference `Data`: fed whole each run). */
  val data: DataFrame = df.persist(StorageLevel.MEMORY_AND_DISK)

  private val splits = data.randomSplit(Array(1.0 - testFraction,
    testFraction), seed)

  val train: DataFrame = splits(0).persist(StorageLevel.MEMORY_AND_DISK)
  val test: DataFrame = splits(1).persist(StorageLevel.MEMORY_AND_DISK)

  lazy val trainCount: Long = train.count()
  lazy val testCount: Long = test.count()

  /** Uniform-with-replacement minibatch for one optimization step
    * (reference `train_index`, `model.py:147-149`). `step` perturbs the
    * seed so every iteration is fresh AND replayable (SURVEY §7(c)). */
  def minibatch(minibatchSize: Int, step: Int): DataFrame = {
    val frac = math.min(1.0, minibatchSize.toDouble / math.max(1L, trainCount))
    train.sample(withReplacement = true, frac, seed + 7919L * (step + 1))
  }

  /** Held-out batch (reference `test_index`, `model.py:151-153`). */
  def testBatch(minibatchSize: Int, step: Int): DataFrame = {
    val frac = math.min(1.0, minibatchSize.toDouble / math.max(1L, testCount))
    test.sample(withReplacement = true, frac, seed + 104729L * (step + 1))
  }

  def unpersist(): Unit = {
    data.unpersist(); train.unpersist(); test.unpersist()
  }
}
