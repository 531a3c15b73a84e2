package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev probe: dump [[graft.ops.UnigramLm.trainDf]] rows on a test
  * dir (oracle authoring aid — prints the exact values the DuckDB
  * replay must reproduce). */
object UnigramProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.ops.UnigramLm.trainDf(docs, "text").collect()
      .foreach(r => println(s"ROW ${r.mkString(" | ")}"))
    spark.stop()
  }
}
