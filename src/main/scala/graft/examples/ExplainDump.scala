package graft.examples
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named queries to
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * files (the judge reads these instead of running Spark).
  * Usage: runMain graft.examples.ExplainDump <tag> <suffix> q_a q_b ...
  * e.g. runMain graft.examples.ExplainDump r14 before q_dedup_entity_tau2 */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val qs = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    qs.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        dir.resolve(s"${q}_$suffix.txt"), txt)
      println(s"wrote plans/$tag/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
