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

  /** Float width sampled at construction (reference: data cast to the
    * current `float_type` at feed, `param.py:689-699`). Float32 mode
    * truncates projected vectors to float32-representable values. */
  private val narrowF32: Boolean =
    graft.core.Settings.current.floatType eq graft.core.Settings.Float32

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
    * seed so every iteration is fresh AND replayable (SURVEY §7(c)).
    * With replacement, fractions above 1 are valid — a request larger
    * than the split delivers ~minibatchSize draws, not a capped
    * ~count-row Poisson(1) pass. */
  def minibatch(minibatchSize: Int, step: Int): DataFrame = {
    val frac = minibatchSize.toDouble / math.max(1L, trainCount)
    train.sample(withReplacement = true, frac,
      DataSet.sampleSeed(seed, step, training = true))
  }

  /** Held-out batch (reference `test_index`, `model.py:151-153`). */
  def testBatch(minibatchSize: Int, step: Int): DataFrame = {
    val frac = minibatchSize.toDouble / math.max(1L, testCount)
    test.sample(withReplacement = true, frac,
      DataSet.sampleSeed(seed, step, training = false))
  }

  // ---- projected-vector caches, keyed by column list. Multiple Elbo
  // builds over the same data (e.g. hyperparameter re-linearization
  // rounds, GpExpr.trainSparse1d) share one persisted projection / one
  // driver collect instead of redoing them per build.
  private val vecCache = scala.collection.mutable.Map
    .empty[(Seq[String], Boolean), org.apache.spark.rdd.RDD[Array[Double]]]
  private val localCache = scala.collection.mutable.Map
    .empty[(Seq[String], Boolean), Array[Array[Double]]]

  private def vectors(cols: Seq[String], training: Boolean) =
    vecCache.synchronized {
      vecCache.getOrElseUpdate((cols, training), {
        val src = if (training) train else test
        src.select(cols.map(org.apache.spark.sql.functions.col): _*)
          .rdd.map(RowVec.of(cols, narrowF32))
          .persist(StorageLevel.MEMORY_AND_DISK)
      })
    }

  /** Row projector honoring this DataSet's float width (for callers
    * building their own RDD paths, e.g. the augmented-batch loop). */
  def rowVec(cols: Seq[String]): org.apache.spark.sql.Row => Array[Double] =
    RowVec.of(cols, narrowF32)

  /** Input columns projected once to a persisted Array[Double] RDD. */
  def trainVectors(cols: Seq[String]): org.apache.spark.rdd.RDD[Array[Double]] =
    vectors(cols, training = true)
  def testVectors(cols: Seq[String]): org.apache.spark.rdd.RDD[Array[Double]] =
    vectors(cols, training = false)

  /** Driver-collected vectors (tiny-data fast path; caller gates on
    * row count). MUST NOT be mutated. */
  def localTrain(cols: Seq[String]): Array[Array[Double]] =
    localCache.synchronized {
      localCache.getOrElseUpdate((cols, true), trainVectors(cols).collect())
    }
  def localTest(cols: Seq[String]): Array[Array[Double]] =
    localCache.synchronized {
      localCache.getOrElseUpdate((cols, false), testVectors(cols).collect())
    }

  def unpersist(): Unit = {
    data.unpersist(); train.unpersist(); test.unpersist()
    vecCache.synchronized {
      vecCache.values.foreach(_.unpersist()); vecCache.clear()
    }
    localCache.synchronized(localCache.clear())
  }
}

object DataSet {
  /** THE seed keying for batch sampling — one home for the
    * train/test stream split (7919-keyed steps; the 104729 offset
    * selects the test stream). Shared by [[DataSet.minibatch]],
    * [[DataSet.testBatch]], and every Elbo batch path, so the
    * "crossing an execution-path boundary never changes which rows
    * an evaluation sees" contract is structural, not convention
    * (a third hand-copied variant is exactly how it drifted once). */
  def sampleSeed(seed: Long, step: Int, training: Boolean): Long =
    seed + 7919L * (step + 1) + (if (training) 0L else 104729L)
}
