package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage: the engine's operators are format-agnostic
  * DataFrame transforms — prove the same query answers identically
  * over parquet, CSV, and JSON copies of a table, and that a
  * partitioned parquet sink gives partition-pruned scans (the at-rest
  * layout that makes 100 TB reads touch only the partitions asked
  * for). */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def statsOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        sum(graft.ops.TextAnalysis.wordCount(col("text")).cast("long"))
          .as("words"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("the same aggregate answers identically over parquet, CSV, and " +
    "JSON copies of the documents table") {
    val base = Files.createTempDirectory("graft_sources").toString
    val want = statsOf(docs)
    docs.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .csv(s"$base/csv")
    docs.write.mode("overwrite").json(s"$base/json")
    val fromCsv = spark.read.schema(docs.schema)
      .option("header", "true").csv(s"$base/csv")
    val fromJson = spark.read.schema(docs.schema).json(s"$base/json")
    assert(statsOf(fromCsv) == want, "CSV roundtrip changed the answer")
    assert(statsOf(fromJson) == want, "JSON roundtrip changed the answer")
  }

  test("ORC roundtrip answers identically and pushes filters to the " +
    "ORC scan") {
    val base = Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(s"$base/orc")
    val fromOrc = spark.read.orc(s"$base/orc")
    assert(statsOf(fromOrc) == statsOf(docs),
      "ORC roundtrip changed the answer")
    val filtered = fromOrc.where(col("n_chars") > 100L)
      .select("doc_id", "n_chars")
    assert(filtered.count() == docs.where(col("n_chars") > 100L).count())
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(n_chars), " +
      "GreaterThan(n_chars,100)"),
      s"ORC scan must carry the pushed filter:\n$scan")
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      "projection must prune to the two read columns")
  }

  test("partitionBy(source) sink + source-filtered read prunes to one " +
    "partition at the scan") {
    val base = Files.createTempDirectory("graft_part").toString
    docs.write.mode("overwrite").partitionBy("source")
      .parquet(s"$base/bysrc")
    val one = spark.read.parquet(s"$base/bysrc")
      .where(col("source") === "src3")
    val got = one.agg(count(lit(1))).head().getLong(0)
    val want = docs.where(col("source") === "src3").count()
    assert(got == want && want > 0)
    // the partition filter must prune at planning: the scan reads ONE
    // directory, so its partition count-of-files reflects src3 only
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(source"),
      s"source filter must become a partition filter")
    val scanned = one.queryExecution.executedPlan.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .map(_.files.size).sum
      }.sum
    val total = spark.read.parquet(s"$base/bysrc")
      .queryExecution.executedPlan.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
      }.sum
    assert(scanned < total,
      s"pruned scan lists $scanned files vs $total unpruned")
  }
}
