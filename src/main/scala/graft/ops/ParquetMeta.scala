package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Scan-free parquet metadata queries: answer count / min / max /
  * null-count from ROW-GROUP FOOTER STATISTICS without reading a
  * single data page — at 100 TB the difference between a manifest
  * lookup and a cluster-hour. The correctness property that matters
  * (and the one the oracle pins) is metadata == data: the
  * footer-derived answer must equal the full-scan answer exactly.
  *
  * Scale shape: the FILE LIST is the dataset (one row per file —
  * millions of rows at warehouse scale, never collected beyond the
  * initial listing a real deployment would read from its catalog /
  * manifest table); footers are opened executor-side in a
  * partition-local map, ~8 KB of read per file regardless of file
  * size. Statistics land as typed columns; row groups whose [min,
  * max] misses a predicate are exactly the ones a scan would skip
  * ([[skippableRowGroups]] measures that pruning rate). */
object ParquetMeta {

  val RowGroupSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("row_group", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("min_v", LongType),
    StructField("max_v", LongType),
    StructField("n_nulls", LongType),
    StructField("compressed_bytes", LongType, nullable = false)))

  /** The parquet files of `path` (a single .parquet file or a
    * Spark-written directory of part files). Local-FS listing —
    * a cluster deployment feeds [[rowGroupStats]] its catalog's
    * file manifest instead. */
  def listFiles(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toVector.sorted
      finally s.close()
    } else Vector(path)
  }

  /** One row per (file, row group) with the INT64 statistics of
    * `column`: row count, min, max, null count, compressed size.
    * Footers only — no data page is ever read. Stats columns are
    * null when the writer omitted statistics (the consumer must then
    * treat the group as un-prunable). */
  def rowGroupStats(spark: SparkSession, path: String,
                    column: String): DataFrame = {
    val files = listFiles(path)
    val fileDf = spark.createDataFrame(
      spark.sparkContext.parallelize(files.map(Row(_)),
        math.max(1, math.min(files.size, 32))),
      StructType(Seq(StructField("file", StringType, nullable = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(RowGroupSchema)
    fileDf.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      it.flatMap { r =>
        val f = r.getString(0)
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          (0 until blocks.size()).map { i =>
            val b = blocks.get(i)
            val cc = (0 until b.getColumns.size())
              .map(b.getColumns.get(_))
              .find(_.getPath.toDotString == column)
            val (mn, mx, nn) = cc.map { c =>
              val st = c.getStatistics
              if (st == null || st.isEmpty) (null, null, null)
              else (st.genericGetMin, st.genericGetMax,
                java.lang.Long.valueOf(st.getNumNulls))
            }.getOrElse((null, null, null))
            def asLong(v: Any): java.lang.Long = v match {
              case l: java.lang.Long => l
              case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue)
              case _ => null
            }
            Row(f, i, b.getRowCount, asLong(mn), asLong(mx),
              nn.asInstanceOf[java.lang.Long], b.getCompressedSize)
          }.iterator
        } finally reader.close()
      }
    }(enc)
  }

  /** Pruning rate of `[lo, hi]` point/range predicates over the row
    * groups: a group is skippable when its [min_v, max_v] envelope
    * misses the range entirely (null stats → never skippable, the
    * conservative contract every scanner implements). */
  def skippableRowGroups(rg: DataFrame, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    rg.withColumn("skippable",
      col("max_v").isNotNull && col("min_v").isNotNull &&
        (col("max_v") < lo || col("min_v") > hi))
  }
}
