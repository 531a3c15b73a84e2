package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** At-rest layout operators: Z-order (Morton) clustering, the
  * standard multi-dimensional sort for file/row-group skipping — a
  * lexicographic sort clusters only its leading column, while the
  * bit-interleaved Z-value keeps EVERY interleaved dimension's range
  * narrow within a file, so min/max pruning works for filters on any
  * of them (the Delta/Iceberg OPTIMIZE ZORDER story, as plain
  * deterministic integer arithmetic).
  */
object Layout {

  /** Morton Z-value of two non-negative int columns: the low `bits`
    * bits of `a` and `b` interleaved (a gets the even positions).
    * Pure shift/mask/add column arithmetic — codegen'd in Spark and
    * reproducible in any SQL engine. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bad bit width $bits")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** DuckDB rendering of the same interleave (same validity bounds —
    * shifts past 62 would wrap Long constants into wrong SQL). */
  def ZValueSql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bad bit width $bits")
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} + " +
        s"((($b >> $i) & 1)) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")
  }

  /** Repartition-by-range on the Z-value — the write-side layout op:
    * `df.transform(zOrderBy(col(a), col(b), bits, n)).write...` yields
    * files whose min/max ranges are narrow in BOTH a and b. The
    * Z-value rides as an expression, so no column name can collide. */
  def zOrderBy(a: Column, b: Column, bits: Int,
               numFiles: Int)(df: DataFrame): DataFrame = {
    val z = zValue(a, b, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Target-size compaction — the small-files fix for any table that
    * accumulated per-batch fragments (streaming sinks, incremental
    * ingest): rewrite to ⌈rows/targetRows⌉ similar-sized files. With
    * a `clusterBy` column the rewrite range-partitions on it (files
    * stay min/max-prunable on that column); without one it
    * round-robins for pure size balancing. The row count comes from
    * ONE count() pass — at 100 TB that is a metadata-cheap columnar
    * scan, and the alternative (guessing file counts) is exactly what
    * produced the fragments. */
  def compact(df: DataFrame, targetRows: Long,
              clusterBy: Option[Column] = None): DataFrame = {
    require(targetRows > 0, s"bad target $targetRows")
    val n = df.count()
    val files = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    clusterBy match {
      case Some(c) => df.repartitionByRange(files, c)
        .sortWithinPartitions(c)
      case None => df.repartition(files)
    }
  }

  /** Rendezvous (highest-random-weight) shard of `id` among
    * `nShards`: argmax over shards s of the portable 60-bit hash of
    * "id:s" (Thaler & Ravishankar 1998). The property mod-sharding
    * lacks: growing S → S' relabels ONLY the rows whose new argmax
    * lands in the added shards — an expected (S'−S)/S' fraction —
    * because the scores of the surviving shards are unchanged, so a
    * shard-count bump on an incrementally-ingested 100 TB layout
    * rewrites 1/3 of the files instead of ~all of them. Ties break to
    * the first (lowest) shard in BOTH engines (array_position /
    * list_position are first-match). Pure per-row expressions — no
    * shuffle, no state. The score array is evaluated twice (once
    * under array_max, once under array_position); that is a constant
    * 2× on a model-sized (nShards) array, not the O(m²) HOF
    * re-evaluation trap (no per-element lambda references the array). */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards >= 1, s"bad shard count $nShards")
    val scores = transform(sequence(lit(0), lit(nShards - 1)),
      s => TextAnalysis.tokenHash(
        concat(id.cast("string"), lit(":"), s.cast("string"))))
    (array_position(scores, array_max(scores)) - lit(1L)).cast("int")
  }

  /** DuckDB rendering of [[rendezvousShard]]'s score list (same bits;
    * materialize it in a CTE, then the shard is
    * `list_position(l, list_aggregate(l, 'max')) - 1` — 1-based
    * first-match like Spark's array_position). */
  def RendezvousScoresSql(idCol: String, nShards: Int): String = {
    val h = TextAnalysis.TokenHashSql(
      s"CAST($idCol AS VARCHAR) || ':' || CAST(s AS VARCHAR)")
    s"[$h for s in range(0, $nShards)]"
  }
}
