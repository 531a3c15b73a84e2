package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-times q_pack_bpe (the one >1.3x quiesced regression flagged
  * by the round-10 verdict): BPE learn (driver-coordinated rounds)
  * vs piece-count + pack + aggregate, repeated in one JVM so warm
  * iterations separate JIT effects from plan cost. */
object PackBpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      t("learn-k1")(graft.ops.Bpe.learn(d0, "text", 1))
      val merges = t("learn") {
        graft.ops.Bpe.learn(d0, "text", 6).map(m => (m._2, m._3))
      }
      val np = graft.ops.TextHashExpressions
        .bpePieceCount(col("text"), merges)
      t("count-pack-agg") {
        graft.ops.Sampling.packNoSplitBy(d0, "doc_id", np, 1024, 4)
          .groupBy("shard").agg(count(lit(1))).count()
      }
      t("full-query") {
        graft.SparkEntry.queries("q_pack_bpe")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
