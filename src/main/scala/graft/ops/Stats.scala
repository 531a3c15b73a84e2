package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-arithmetic statistical profiling — the data-card correlation
  * matrix, engine-portable: inputs are quantized to int64 fixed point
  * (`floor(x·2²⁰)` — floor, never cast-rounding, which ties-to-even
  * in some engines and truncates in others), all sums are exact
  * integer aggregates (order-independent ⇒ identical under any
  * partitioning or engine — the k-means/PCA trick applied to mixed
  * column pairs), and the Pearson formula runs once on the driver-
  * visible one-row result in double.
  *
  * Scale shape: ONE hash aggregate over the scan (map-side partial,
  * single-row output). Headroom: with |x| ≲ 1 at scale 2^s the
  * square-sum is bounded by n·2^{2s}, so the GLOBAL sum stays exact
  * for n < 2^{63−2s} rows — 2²³ at the default 2²⁰. Bigger corpora
  * LOWER the scale (2¹⁰ ⇒ 2⁴³ rows ≈ 8·10¹², trading quantization
  * precision for headroom); sharding-and-merging partials does NOT
  * help, because the merged total is the thing that overflows. */
object Stats {

  /** Default fixed-point scale, shared with the SQL rendering. */
  val FxScale: Long = 1048576L // 2^20

  /** floor(x·scale) as int64 — inputs must satisfy |x| ≲ 1. */
  def fx(x: Column, scale: Long = FxScale): Column =
    floor(x * lit(scale.toDouble)).cast("long")

  /** DuckDB rendering of [[fx]]. */
  def FxSql(x: String, scale: Long = FxScale): String =
    s"CAST(floor(($x) * $scale) AS BIGINT)"

  /** One-pass exact moment sums for named unit-scaled columns:
    * a single row with n, s_<name>, ss_<name>, and sp_<a>_<b> for
    * each pair (a before b in `cols` order) — every value an exact
    * int64. */
  def momentSums(df: DataFrame, cols: Seq[(String, Column)],
                 scale: Long = FxScale): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val q = cols.map { case (n, c) => n -> fx(c, scale) }
    val aggs =
      q.map { case (n, c) => sum(c).as(s"s_$n") } ++
        q.map { case (n, c) => sum(c * c).as(s"ss_$n") } ++
        q.combinations(2).map { case Seq((na, ca), (nb, cb)) =>
          sum(ca * cb).as(s"sp_${na}_$nb")
        }.toSeq
    df.agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Pearson correlations derived from [[momentSums]]: appends
    * round(corr_<a>_<b>, 5) columns. The sums are exact integers, so
    * the double-precision formula evaluates bit-identically in any
    * engine. */
  def withCorrs(sums: DataFrame, names: Seq[String]): DataFrame = {
    val corrCols = names.combinations(2).map { case Seq(a, b) =>
      val n = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val cov = n * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val va = n * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vb = n * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      round(cov / sqrt(va * vb), 5).as(s"corr_${a}_$b")
    }.toSeq
    sums.select(col("*") +: corrCols: _*)
  }
}
