package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object WinProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 10).toDF("x")
    val w = Window.partitionBy(lit(0)).orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.withColumn("c", sum(col("x")).over(w))
    out.collect()
    println("plan:\n" + out.queryExecution.executedPlan.toString.take(600))
    spark.stop()
  }
}
