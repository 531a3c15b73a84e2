package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

  /** `array_sum_agg(arr, len)`: elementwise sum of fixed-length double
    * arrays — O(len) mergeable state, the reduction for per-draw
    * posterior sweeps (S statistics in ONE pass instead of a
    * posexplode shuffle of n·S rows). Null arrays are skipped. */
  def arraySumAgg(arr: Column, len: Int): Column =
    bridge.toColumn(ArraySumAgg(bridge.toExpression(arr), len)
      .toAggregateExpression())

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

/** Elementwise sum of fixed-length double arrays as a mergeable
  * aggregate — per-partition partials of `len` doubles, merged by
  * addition (same template as [[GramAgg]], floating instead of
  * fixed-point: the consumers are Monte-Carlo statistics already
  * carrying O(1/√S) noise, so summation-order wobble is immaterial). */
case class ArraySumAgg(arrExpr: Expression, len: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(len >= 1 && len <= 65536, s"bad array length $len")

  override def children: Seq[Expression] = Seq(arrExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat = arrExpr.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"array_sum_agg over $t")
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val a = arrExpr.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      require(arr.numElements() == len,
        s"array_sum_agg: ${arr.numElements()} elements, expected $len")
      var i = 0
      while (i < len) {
        b(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Double]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * len)
    var i = 0
    while (i < len) { bb.putDouble(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Double](len)
    var i = 0
    while (i < len) { b(i) = bb.getDouble; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ArraySumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArraySumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): ArraySumAgg =
    copy(arrExpr = cs(0))
  override def prettyName: String = "array_sum_agg"
}
