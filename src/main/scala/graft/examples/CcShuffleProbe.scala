package graft.examples
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
import java.util.concurrent.atomic.AtomicInteger

/** Counts stages submitted during one connectedComponents run — the
  * narrow-dependency check for the CC loop's shared partitioner. */
object CcShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // a path graph forces several rounds
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val n = new AtomicInteger(0)
    val l = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    val cc = graft.ops.Dedup.connectedComponents(edges, "a", "b")
    val rows = cc.count()
    Thread.sleep(500)
    println(s"CC stages submitted: ${n.get()} (rows=$rows)")
    spark.stop()
  }
}
