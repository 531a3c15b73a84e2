package graft.examples
import org.apache.spark.sql.SparkSession
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_dens_poisson")(spark, "/root/testdata/sf0.001")
    df.collect() // execute so AQE finalizes
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
