object TimeDsir extends App {
  import org.apache.spark.sql.functions._
  import graft.ops.Dsir
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[32]").config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  def t(name: String)(body: => Any): Unit = {
    val t0 = System.nanoTime(); body
    println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
  }
  var ratios: Array[Double] = null
  t("logRatios (cold)") { ratios = Dsir.logRatios(docs, "text", col("source") === "src0") }
  var w: org.apache.spark.sql.DataFrame = null
  t("weights+resample (cold)") {
    w = Dsir.importanceWeights(docs, "text", ratios)
    Dsir.resample(w, "doc_id", 150).count()
  }
  t("final agg (cold)") {
    Dsir.resample(w, "doc_id", 150)
      .groupBy("source").agg(count(lit(1))).collect()
  }
  spark.stop()
}
