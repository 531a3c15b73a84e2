package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Footer-statistics queries ([[ParquetMeta]]): structure of the
  * row-group table, the metadata == data identity, and the pruning
  * measure on a physically-ordered fixture. */
class ParquetMetaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val fixtureDir: String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("pqmeta").toString + "/t"
    // ids written in ORDER, 100 rows per file: 10 files whose
    // [min,max] envelopes tile the keyspace — the layout a z-order /
    // sort-on-write pipeline produces, where footer pruning shines
    (0L until 1000L).toDF("id").orderBy("id").coalesce(1)
      .write.option("maxRecordsPerFile", 100).parquet(dir)
    dir
  }

  test("rowGroupStats: per-group rows/min/max/nulls reconstruct the " +
    "written layout exactly, footers only") {
    val rg = ParquetMeta.rowGroupStats(spark, fixtureDir, "id")
      .collect()
    assert(rg.map(_.getLong(2)).sum == 1000L)
    assert(rg.forall(_.getLong(5) == 0L)) // no nulls written
    // every group's envelope is tight: max - min = rows - 1 for the
    // sorted write
    assert(rg.forall(r => r.getLong(4) - r.getLong(3) ==
      r.getLong(2) - 1))
    assert(rg.map(_.getLong(3)).min == 0L)
    assert(rg.map(_.getLong(4)).max == 999L)
  }

  test("metadata == data: footer-derived count/min/max equal the " +
    "full scan on the driver testdata documents table") {
    val d = "/root/testdata/sf0.001"
    val rg = ParquetMeta.rowGroupStats(spark,
      s"$d/documents.parquet", "doc_id")
      .agg(sum("n_rows"), min("min_v"), max("max_v")).head()
    val data = spark.read.parquet(s"$d/documents.parquet")
      .agg(count(lit(1)), min("doc_id"), max("doc_id")).head()
    assert(rg.getLong(0) == data.getLong(0))
    assert(rg.getLong(1) == data.getLong(1))
    assert(rg.getLong(2) == data.getLong(2))
  }

  test("skippableRowGroups: a range predicate prunes exactly the " +
    "groups whose envelope misses it") {
    val rg = ParquetMeta.rowGroupStats(spark, fixtureDir, "id")
    val sk = ParquetMeta.skippableRowGroups(rg, 250L, 349L)
      .agg(sum(when(col("skippable"), 1L).otherwise(0L)),
        count(lit(1))).head()
    // [250, 349] touches the 200-299 and 300-399 envelopes; the
    // other 8 of 10 groups are pruned without reading a page
    assert(sk.getLong(1) == 10L)
    assert(sk.getLong(0) == 8L)
  }
}
