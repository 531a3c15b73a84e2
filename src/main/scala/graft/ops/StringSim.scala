package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a codegen'd kernel — the
  * similarity-graded verify for entity resolution (Levenshtein's τ
  * is a hard edit budget; JW grades agreement with a prefix bonus,
  * the classic record-linkage comparator, Winkler 1990).
  *
  * Bit-exact to DuckDB 1.0's `jaro_winkler_similarity` (RapidFuzz
  * semantics), fuzz-verified on 28k random/correlated pairs at dev
  * time and hash-pinned per query row by the oracle:
  *  - either side empty → 0.0 (NOT the textbook 1.0-for-both-empty);
  *  - match window = max(len)/2 − 1 (floor, ≥ 0), greedy first-free
  *    match scan, transpositions halved by integer division;
  *  - jaro = ((m/l1 + m/l2) + (m−t)/m) / 3 in EXACTLY that IEEE
  *    association order;
  *  - Winkler boost only when jaro > 0.7 (strict): jw = jaro +
  *    prefix·0.1·(1−jaro), prefix ≤ 4, left-assoc multiply order.
  * Char-grain comparison (UTF-16 units) — identical to the oracle on
  * the ASCII fixtures; non-BMP input is out of contract. */
object StringSim {

  def jaroWinkler(a: String, b: String): Double = {
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = ((m.toDouble / l1 + m.toDouble / l2) +
      (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(l1, l2))
      var cont = true
      i = 0
      while (i < pMax && cont) {
        if (a.charAt(i) == b.charAt(i)) p += 1 else cont = false
        i += 1
      }
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column form of [[jaroWinkler]] (codegen'd, null-safe). */
  def jaroWinklerCol(a: Column, b: Column): Column =
    bridge.toColumn(JaroWinklerExpr(
      bridge.toExpression(a), bridge.toExpression(b)))
}

case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.StringSim.jaroWinkler($a.toString(), $b.toString())")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinklerExpr =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}
