package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregation state: the k best (score, id) pairs seen,
  * kept in a simple insertion-sorted pair of arrays (k is small — this
  * beats a heap until k is in the hundreds). */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** Strict (score desc, id asc) order — equal scores resolve to the
    * LOWER id, so the kept set is a pure function of the input SET,
    * independent of partitioning and insertion order. Score ties are
    * routine (e.g. equal PQ codes give equal ADC distances), and a
    * first-inserted tie-break would make the candidate set
    * nondeterministic across shuffles. */
  @inline private def beats(s: Double, id: Long, s2: Double, id2: Long) =
    s > s2 || (s == s2 && id < id2)

  def insert(score: Double, id: Long): Unit = {
    // NaN (e.g. cosine of a zero-norm embedding) must be rejected: an
    // unordered NaN in the buffer makes the boundary comparison false
    // for every later candidate, freezing the group's top-k.
    if (score != score) return
    if (n < k || beats(score, id, scores(n - 1), ids(n - 1))) {
      var i = math.min(n, k - 1)
      while (i > 0 && beats(score, id, scores(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      scores(i) = score; ids(i) = id
      if (n < k) n += 1
    }
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Top-k (score, id) per group as a TypedImperativeAggregate — the
  * scale-correct top-k: O(k) state per group, map-side partial
  * aggregation, mergeable buffers. The usual alternatives break at
  * 100 TB: `collect_list` + sort holds the whole group in the
  * aggregation buffer, and `Window.partitionBy` + rank funnels each
  * group through one task. Returns array<struct<score double,
  * id bigint>> in strict (score desc, id asc) order — a pure function
  * of the input set, so downstream consumers (e.g. re-rank candidate
  * joins) and oracle queries may rely on the exact member set.
  */
case class TopKAgg(scoreExpr: Expression, idExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0 && k <= 1024, s"k=$k out of range")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      b.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = InternalRow(b.scores(i), b.ids(i)); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val id = bb.getLong
      b.scores(i) = s; b.ids(i) = id; i += 1
    }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = cs(0), idExpr = cs(1))
  override def prettyName: String = "top_k"
}

object TopK {
  /** `top_k(score, id, k)` aggregate Column: array of the k highest
    * (score, id) structs, descending. Inputs are cast to
    * double/long here (no-op casts fold away when already typed):
    * the imperative buffer reads raw Double/Long, so a float score
    * or int id column would otherwise crash every task with a
    * ClassCastException deep in the aggregate instead of coercing. */
  def topK(score: Column, id: Column, k: Int): Column =
    bridge.toColumn(TopKAgg(bridge.toExpression(score.cast("double")),
      bridge.toExpression(id.cast("long")), k).toAggregateExpression())
}
