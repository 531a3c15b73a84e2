package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the embedding operators.
  *
  * The composable forms (`zip_with` + `aggregate` higher-order
  * functions) are evaluated per element through Catalyst's interpreted
  * lambda machinery — correct, but the dominant cost of every
  * similarity query at scale. These expressions emit one tight
  * primitive loop into whole-stage codegen instead (same preference
  * order as `Lgamma`: native Expression > UDF). Summation is in
  * forward element order, IDENTICAL to the `aggregate` fold and to
  * DuckDB's `list_sum` comprehension, so oracle hash parity is
  * unaffected. Arrays are assumed non-null-elemented (the embedding
  * contract); unequal lengths take the common prefix.
  */
object VecFns {

  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Fused guarded cosine: dot(a,b), ‖a‖², ‖b‖² accumulated in ONE
    * forward pass (each sum independently in element order — value-
    * identical to three separate [[dot]] loops, so oracle hashes are
    * unaffected), then the [[Similarity.cosineOrNull]] guard applied:
    * d = √‖a‖²·√‖b‖²; NULL unless d > 0 and d is not NaN. Replaces
    * the composed `dot/(norm·norm)` form that scanned both arrays
    * three times per pair — the dominant kernel cost of every
    * bucket-join / cross-join similarity scoring step. Returns a
    * boxed Double (null = no direction); NaN stays representable for
    * the pathological overflow case (Inf/Inf) exactly as the composed
    * form produced it. */
  def cosineOrNull(a: ArrayData, b: ArrayData, aF: Boolean,
                   bF: Boolean): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.max(na, nb)
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    // each norm over its FULL vector, the cross-dot over the common
    // prefix — exactly what the composed dot/(norm·norm) spec computes
    // on unequal lengths (equal-length embeddings, the contract case,
    // never reach the tail branches)
    while (i < n) {
      if (i < na) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        saa += x * x
        if (i < nb) {
          val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
          sab += x * y
          sbb += y * y
        }
      } else {
        val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
        sbb += y * y
      }
      i += 1
    }
    val d = math.sqrt(saa) * math.sqrt(sbb)
    if (d > 0 && !d.isNaN) java.lang.Double.valueOf(sab / d) else null
  }

  def l2sq(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  /** All nBits hyperplane dots in ONE pass over the vector (the
    * hyperplane component is the [[Similarity.hyperplane]] integer
    * recurrence, inlined). Per-bit accumulation order is forward in
    * the element index — bit-identical to the per-bit `aggregate`
    * form and the DuckDB comprehension. */
  def lshBucket(a: ArrayData, aF: Boolean, nBits: Int,
                bitOffset: Int): Long = {
    val n = a.numElements()
    val dots = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val v = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      var b = 0
      while (b < nBits) {
        val gb = bitOffset + b
        val seed = ((i + 1).toLong * Similarity.HpDimMix +
          (gb + 1).toLong * Similarity.HpBitMix) % Similarity.HpMod
        val h = (seed * Similarity.HpMult % Similarity.HpMod).toDouble /
          (Similarity.HpMod / 2).toDouble - 1.0
        dots(b) += v * h
        b += 1
      }
      i += 1
    }
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      if (dots(b) > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** Pre-unpacked frequency table for [[RffFeaturesExpr]]: `w` is the
    * row-major [D, dims] frequency matrix, `b` the phase offsets,
    * `scale` = √(2/D). */
  final case class RffFreqs(w: Array[Double], b: Array[Double],
                            dims: Int, scale: Double)

  /** Random Fourier feature map φ(x)ⱼ = √(2/D)·cos(wⱼ·x + bⱼ)
    * (Rahimi & Recht 2007) in ONE pass: per feature a forward-order
    * dot over the vector elements — identical accumulation order to
    * the DuckDB `list_sum` comprehension, so `VecDot(φ(x), φ(q))`
    * kernel estimates hash-match cross-engine. */
  def rffFeatures(a: ArrayData, aF: Boolean, f: RffFreqs): ArrayData = {
    val n = math.min(a.numElements(), f.dims)
    val nf = f.b.length
    val out = new Array[Double](nf)
    var j = 0
    while (j < nf) {
      var s = 0.0
      val off = j * f.dims
      var i = 0
      while (i < n) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        s += f.w(off + i) * x
        i += 1
      }
      out(j) = f.scale * math.cos(s + f.b(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Pre-unpacked row-major [nOut, dims] matrix for [[MatVecExpr]]. */
  final case class Mat(w: Array[Double], dims: Int, nOut: Int)

  /** Dense matrix·vector: outⱼ = Σᵢ w[j,i]·xᵢ with forward-order
    * accumulation per output — the same order as a DuckDB `list_sum`
    * comprehension, so projections match bit for bit. One pass, no
    * trig: [[rffFeatures]] minus the cos/phase (the shared
    * projection kernel for JL sign projections, PCA components,
    * learned linear maps). */
  def matVec(a: ArrayData, aF: Boolean, m: Mat): ArrayData = {
    val n = math.min(a.numElements(), m.dims)
    val out = new Array[Double](m.nOut)
    var j = 0
    while (j < m.nOut) {
      var s = 0.0
      val off = j * m.dims
      var i = 0
      while (i < n) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        s += m.w(off + i) * x
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Pre-unpacked centroid table for [[NearestCentroidExpr]] — a plain
    * pair of primitive arrays so the codegen'd loop touches no Scala
    * collections. */
  final case class Cents(cids: Array[Long], vecs: Array[Array[Double]])

  /** Nearest centroid by squared L2 with (dist, cid)-lexicographic
    * tie-break — ONE loop over all centroids replacing the k-way
    * `array_min(array(struct(vec_l2sq…)))` composition (k separate
    * generated expressions; Janino codegen time grew linearly with k
    * and dominated cold-start of every IVF/k-means query). Per-centroid
    * summation is forward element order (identical to [[l2sq]]);
    * doubles compare via Double.compare, matching Spark's struct
    * ordering. Returns struct(d, c). */
  def nearestCentroid(a: ArrayData, aF: Boolean, cents: Cents): InternalRow = {
    var bd = 0.0
    var bc = 0L
    var first = true
    var j = 0
    while (j < cents.cids.length) {
      val v = cents.vecs(j)
      val n = math.min(a.numElements(), v.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        val d = x - v(i)
        s += d * d
        i += 1
      }
      val cmp = java.lang.Double.compare(s, bd)
      if (first || cmp < 0 || (cmp == 0 && cents.cids(j) < bc)) {
        bd = s; bc = cents.cids(j); first = false
      }
      j += 1
    }
    InternalRow(bd, bc)
  }

  /** The `probes` nearest centroid ids in (dist, cid)-ascending order
    * — the multi-probe generalization of [[nearestCentroid]], one loop
    * over all centroids with a bounded insertion into P slots (P is
    * the probe count, a small constant). Replaces the k-expression
    * `slice(array_sort(array(struct(vec_l2sq…))), 1, P)` form whose
    * Janino codegen time grew with k. Identical selection order:
    * Double.compare on the distance, cid ascending on ties. */
  def nearestCells(a: ArrayData, aF: Boolean, cents: Cents,
                   probes: Int): ArrayData = {
    val p = math.min(probes, cents.cids.length)
    val bd = new Array[Double](p)
    val bc = new Array[Long](p)
    var used = 0
    var j = 0
    while (j < cents.cids.length) {
      val v = cents.vecs(j)
      val n = math.min(a.numElements(), v.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        val d = x - v(i)
        s += d * d
        i += 1
      }
      val cid = cents.cids(j)
      // insertion position among the current best `used` entries
      var pos = used
      while (pos > 0 && {
        val cmp = java.lang.Double.compare(s, bd(pos - 1))
        cmp < 0 || (cmp == 0 && cid < bc(pos - 1))
      }) pos -= 1
      if (pos < p) {
        val last = math.min(used, p - 1)
        var m = last
        while (m > pos) { bd(m) = bd(m - 1); bc(m) = bc(m - 1); m -= 1 }
        bd(pos) = s; bc(pos) = cid
        if (used < p) used += 1
      }
      j += 1
    }
    val out = new Array[Any](used)
    var o = 0
    while (o < used) { out(o) = bc(o); o += 1 }
    new GenericArrayData(out)
  }

  /** Pre-unpacked PQ codebooks: `vecs(m)(j)` is centroid j of subspace
    * m; `offs(m)` is the subspace's element offset into the full
    * vector. Codes are 0-based positions (j). */
  final case class Codebooks(offs: Array[Int], vecs: Array[Array[Array[Double]]])

  /** PQ encoding: per subspace, the 0-based index of the nearest
    * sub-centroid by squared L2 over the subspace's element range
    * (forward order; ties → smaller index — identical to the
    * slice + `array_min` composable spec). One loop, no array slicing,
    * no per-centroid expressions. */
  def pqEncode(a: ArrayData, aF: Boolean, cb: Codebooks): ArrayData = {
    val m = cb.vecs.length
    val codes = new Array[Any](m)
    var s = 0
    while (s < m) {
      val off = cb.offs(s)
      val centroids = cb.vecs(s)
      var bd = 0.0
      var bj = 0L
      var first = true
      var j = 0
      while (j < centroids.length) {
        val v = centroids(j)
        var acc = 0.0
        var i = 0
        val n = math.min(v.length, math.max(0, a.numElements() - off))
        while (i < n) {
          val x = if (aF) a.getFloat(off + i).toDouble
                  else a.getDouble(off + i)
          val d = x - v(i)
          acc += d * d
          i += 1
        }
        val cmp = java.lang.Double.compare(acc, bd)
        if (first || cmp < 0) { bd = acc; bj = j.toLong; first = false }
        j += 1
      }
      codes(s) = bj
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance computation (ADC): squared L2 between a RAW
    * query vector and a PQ-CODED corpus vector = Σ over subspaces of
    * l2sq(query slice, codebook[m][code_m]) — m table lookups instead
    * of d raw multiplications, which is the PQ read-side win. Subspace
    * subtotals accumulate in m order (identical to the m-term spec
    * sum). */
  def adcDist(q: ArrayData, qF: Boolean, code: ArrayData,
              cb: Codebooks): Double = {
    val m = cb.vecs.length
    var total = 0.0
    var s = 0
    while (s < m) {
      val off = cb.offs(s)
      val v = cb.vecs(s)(code.getLong(s).toInt)
      var acc = 0.0
      var i = 0
      val n = math.min(v.length, math.max(0, q.numElements() - off))
      while (i < n) {
        val x = if (qF) q.getFloat(off + i).toDouble
                else q.getDouble(off + i)
        val d = x - v(i)
        acc += d * d
        i += 1
      }
      total += acc
      s += 1
    }
    total
  }
}

private[ops] trait FloatElem { self: Expression =>
  protected def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"expected array<float|double>, got $t")
  }
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with FloatElem {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecFns.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.VecFns.dot($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(l, r)
  override def prettyName: String = "vec_dot"
}

/** Guarded cosine in one fused kernel pass ([[VecFns.cosineOrNull]]):
  * NULL for zero-norm / NaN-element vectors (a vector with no
  * direction), so max-aggregates, thresholds and TopK skip them —
  * same contract as the composed `when(d > 0 && !isnan(d), dot/d)`
  * form this replaces, at a third of the array traffic. */
case class VecCosineOrNull(left: Expression, right: Expression)
    extends BinaryExpression with FloatElem {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VecFns.cosineOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cosBoxed")
      s"""
         |java.lang.Double $tmp = graft.ops.VecFns.cosineOrNull(
         |  $a, $b, ${isFloatArr(left)}, ${isFloatArr(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecCosineOrNull = copy(l, r)
  override def prettyName: String = "vec_cosine_or_null"
}

case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with FloatElem {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecFns.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.VecFns.l2sq($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecL2Sq = copy(l, r)
  override def prettyName: String = "vec_l2sq"
}

case class LshBucketExpr(child: Expression, nBits: Int, bitOffset: Int)
    extends UnaryExpression with FloatElem {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    VecFns.lshBucket(a.asInstanceOf[ArrayData], isFloatArr(child),
      nBits, bitOffset)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.VecFns.lshBucket($c, ${isFloatArr(child)}, $nBits, $bitOffset)")
  override protected def withNewChildInternal(c: Expression): LshBucketExpr =
    copy(child = c)
  override def prettyName: String = "lsh_bucket"
}

/** struct(d double, c long) of the nearest centroid (squared L2,
  * (d, c)-lexicographic tie-break). Centroids are held as a Seq in the
  * case class (well-defined Expression equality) and unpacked once
  * per task via a codegen reference object. */
/** array<long> of the `probes` nearest centroid ids, (dist, cid)
  * ascending — one kernel pass ([[VecFns.nearestCells]]). */
case class NearestCellsExpr(child: Expression,
                            cents: Seq[(Long, Seq[Double])], probes: Int)
    extends UnaryExpression with FloatElem {
  require(cents.nonEmpty, "empty centroid table")
  require(probes > 0, s"bad probes $probes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val packed = VecFns.Cents(
    cents.map(_._1).toArray, cents.map(_._2.toArray).toArray)
  override def nullSafeEval(a: Any): Any =
    VecFns.nearestCells(a.asInstanceOf[ArrayData], isFloatArr(child),
      packed, probes)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", packed,
      classOf[VecFns.Cents].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.VecFns.nearestCells($c, ${isFloatArr(child)}, $ref, $probes)")
  }
  override protected def withNewChildInternal(
      c: Expression): NearestCellsExpr = copy(child = c)
  override def prettyName: String = "nearest_cells"
}

case class NearestCentroidExpr(child: Expression,
                               cents: Seq[(Long, Seq[Double])])
    extends UnaryExpression with FloatElem {
  require(cents.nonEmpty, "empty centroid table")
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", LongType, nullable = false)))
  @transient private lazy val packed = VecFns.Cents(
    cents.map(_._1).toArray, cents.map(_._2.toArray).toArray)
  override def nullSafeEval(a: Any): Any =
    VecFns.nearestCentroid(a.asInstanceOf[ArrayData], isFloatArr(child),
      packed)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", packed,
      classOf[VecFns.Cents].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.VecFns.nearestCentroid($c, ${isFloatArr(child)}, $ref)")
  }
  override protected def withNewChildInternal(
      c: Expression): NearestCentroidExpr = copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/** array<double> Random Fourier feature map of an embedding column.
  * `w` is the row-major [D, dims] frequency matrix, `b` the D phase
  * offsets; output element j is √(2/D)·cos(wⱼ·x + bⱼ). Frequencies
  * are model-sized plan constants (like centroids/codebooks) carried
  * via a codegen reference object. */
case class RffFeaturesExpr(child: Expression, w: Seq[Double],
                           b: Seq[Double], dims: Int)
    extends UnaryExpression with FloatElem {
  require(b.nonEmpty && w.length == b.length * dims,
    s"frequency table ${w.length} != ${b.length} features x $dims dims")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  @transient private lazy val packed = VecFns.RffFreqs(
    w.toArray, b.toArray, dims, math.sqrt(2.0 / b.length))
  override def nullSafeEval(a: Any): Any =
    VecFns.rffFeatures(a.asInstanceOf[ArrayData], isFloatArr(child), packed)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("freqs", packed,
      classOf[VecFns.RffFreqs].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.VecFns.rffFeatures($c, ${isFloatArr(child)}, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): RffFeaturesExpr =
    copy(child = c)
  override def prettyName: String = "rff_features"
}

/** array<double> dense linear map of an embedding column: output j is
  * the forward-order dot of matrix row j (row-major [nOut, dims] plan
  * constant, carried via a codegen reference object like
  * centroids/codebooks) with the vector. */
case class MatVecExpr(child: Expression, w: Seq[Double], dims: Int)
    extends UnaryExpression with FloatElem {
  require(dims > 0 && w.nonEmpty && w.length % dims == 0,
    s"matrix ${w.length} not a multiple of $dims dims")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  @transient private lazy val packed =
    VecFns.Mat(w.toArray, dims, w.length / dims)
  override def nullSafeEval(a: Any): Any =
    VecFns.matVec(a.asInstanceOf[ArrayData], isFloatArr(child), packed)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mat", packed,
      classOf[VecFns.Mat].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.VecFns.matVec($c, ${isFloatArr(child)}, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): MatVecExpr =
    copy(child = c)
  override def prettyName: String = "mat_vec"
}

/** array<long> of 0-based nearest-sub-centroid indices, one per PQ
  * subspace. `codebooks(m)(j)` is centroid j of subspace m; subspaces
  * cover consecutive element ranges in order. */
case class PqEncodeExpr(child: Expression,
                        codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with FloatElem {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val packed = VecExpressions.pack(codebooks)
  override def nullSafeEval(a: Any): Any =
    VecFns.pqEncode(a.asInstanceOf[ArrayData], isFloatArr(child), packed)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", packed,
      classOf[VecFns.Codebooks].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.VecFns.pqEncode($c, ${isFloatArr(child)}, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** ADC squared L2 between a raw query vector (left) and a PQ code
  * array (right). */
case class AdcDistExpr(left: Expression, right: Expression,
                       codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with FloatElem {
  override def dataType: DataType = DoubleType
  @transient private lazy val packed = VecExpressions.pack(codebooks)
  override def nullSafeEval(q: Any, code: Any): Any =
    VecFns.adcDist(q.asInstanceOf[ArrayData], isFloatArr(left),
      code.asInstanceOf[ArrayData], packed)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", packed,
      classOf[VecFns.Codebooks].getName)
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.ops.VecFns.adcDist($q, ${isFloatArr(left)}, $c, $ref)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AdcDistExpr = copy(left = l, right = r)
  override def prettyName: String = "adc_dist"
}

object VecExpressions {
  def dot(a: Column, b: Column): Column =
    bridge.toColumn(VecDot(bridge.toExpression(a), bridge.toExpression(b)))
  def l2sq(a: Column, b: Column): Column =
    bridge.toColumn(VecL2Sq(bridge.toExpression(a), bridge.toExpression(b)))
  def cosineOrNull(a: Column, b: Column): Column =
    bridge.toColumn(VecCosineOrNull(bridge.toExpression(a),
      bridge.toExpression(b)))
  def lshBucket(emb: Column, nBits: Int, bitOffset: Int): Column =
    bridge.toColumn(LshBucketExpr(bridge.toExpression(emb), nBits, bitOffset))
  def nearestCentroid(emb: Column, cents: Seq[(Long, Seq[Double])]): Column =
    bridge.toColumn(NearestCentroidExpr(bridge.toExpression(emb), cents))
  def nearestCells(emb: Column, cents: Seq[(Long, Seq[Double])],
                   probes: Int): Column =
    bridge.toColumn(NearestCellsExpr(bridge.toExpression(emb), cents, probes))
  def pqEncode(emb: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    bridge.toColumn(PqEncodeExpr(bridge.toExpression(emb), codebooks))
  def adcDist(query: Column, code: Column,
              codebooks: Seq[Seq[Seq[Double]]]): Column =
    bridge.toColumn(AdcDistExpr(bridge.toExpression(query),
      bridge.toExpression(code), codebooks))
  def rffFeatures(emb: Column, w: Seq[Double], b: Seq[Double],
                  dims: Int): Column =
    bridge.toColumn(RffFeaturesExpr(bridge.toExpression(emb), w, b, dims))
  def matVec(emb: Column, w: Seq[Double], dims: Int): Column =
    bridge.toColumn(MatVecExpr(bridge.toExpression(emb), w, dims))

  /** Subspace offsets from consecutive codebook widths. */
  private[ops] def pack(codebooks: Seq[Seq[Seq[Double]]]): VecFns.Codebooks = {
    val widths = codebooks.map(_.head.length)
    val offs = widths.scanLeft(0)(_ + _).init.toArray
    VecFns.Codebooks(offs,
      codebooks.map(_.map(_.toArray).toArray).toArray)
  }
}
