package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass kernels for the deletion-neighborhood blocking
  * hashes ([[Entity]]).
  *
  * The composable form (`transform(sequence(...), i => concat(substr,
  * substr))` nested twice, then `array_distinct`/`array_except`, then
  * `transform(_, xxhash64)`) walks Catalyst's interpreted lambda
  * machinery ~O(L²) times per record, building every variant as a
  * fresh UTF8String: measured 2.8 s for the τ=2 explode alone over
  * 30k records at sf0.1. These kernels emit the hash array in one
  * tight loop inside whole-stage codegen — the variant bytes are
  * assembled in a reused scratch buffer and hashed in place, nothing
  * but the final long[] is allocated per row.
  *
  * Parity: hashes equal Spark's `xxhash64` builtin bit-for-bit —
  * deletion variants hash as xxhash64(variant_string) (seed 42 over
  * the UTF-8 bytes), position-pair tags as xxhash64(i, j, remainder)
  * (the int-int-string chain, 1-based character positions i < j) —
  * pinned by EntitySpec's kernel-vs-column parity row against
  * [[Entity.deletionKeys]]. Duplicate variants are deduplicated BY
  * HASH (the column form deduplicates by string): a 2⁻⁶⁴ collision
  * can drop one witness key, the same fingerprint trade the blocking
  * join itself already makes.
  *
  * Non-ASCII keys take a String-building slow path with identical
  * semantics (deletions are character deletions, exactly `substr`'s);
  * the ASCII fast path covers the dirty-key corpora this family
  * targets. */
object EntityKeyFns {

  /** Modes: which key stream to emit. */
  final val D1 = 0 // key + single deletions (deduped)
  final val D2 = 1 // key + deletions at depth <= 2 (deduped)
  final val Probe2 = 2 // D2 + position-pair tags (the split probe side)
  final val Index2 = 3 // D1 + position-pair tags (the split index side)

  private final val Seed = 42L

  private def hashBytes(b: Array[Byte], len: Int, seed: Long): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, len, seed)

  /** Append `h` to `out` at `n` unless present in out[0, n); returns
    * the new count. Linear probe — neighborhoods are O(L²) of SHORT
    * keys, so n stays small (≤ ~250 for a 20-char key). */
  private def addUnique(out: Array[Long], n: Int, h: Long): Int = {
    var i = 0
    while (i < n) { if (out(i) == h) return n; i += 1 }
    out(n) = h
    n + 1
  }

  def keyHashes(key: UTF8String, mode: Int): GenericArrayData = {
    val nb = key.numBytes()
    val ascii = key.numChars() == nb
    if (!ascii) return keyHashesGeneric(key.toString, mode)
    val b = key.getBytes
    val L = nb
    val wantD2 = mode == D2 || mode == Probe2
    val wantTags = mode == Probe2 || mode == Index2
    val maxDel = 1 + L + (if (wantD2) L * (L - 1) / 2 else 0)
    val maxOut = maxDel + (if (wantTags) L * (L - 1) / 2 else 0)
    val out = new Array[Long](maxOut)
    var n = addUnique(out, 0, hashBytes(b, L, Seed))
    val scratch = new Array[Byte](if (L > 0) L else 1)
    // single deletions: drop byte i
    var i = 0
    while (i < L) {
      System.arraycopy(b, 0, scratch, 0, i)
      System.arraycopy(b, i + 1, scratch, i, L - i - 1)
      n = addUnique(out, n, hashBytes(scratch, L - 1, Seed))
      i += 1
    }
    if ((wantD2 || wantTags) && L >= 2) {
      // double deletions: drop bytes i < j; the remainder bytes are
      // shared by the deep deletion hash and the position-pair tag
      i = 0
      while (i < L - 1) {
        System.arraycopy(b, 0, scratch, 0, i)
        var j = i + 1
        // maintain scratch = b minus positions {i, j} incrementally:
        // bytes [i, j-1) of the remainder are b[i+1..j), appended one
        // per j-step; the tail b[j+1..L) is copied fresh per j
        while (j < L) {
          if (j > i + 1) scratch(j - 2) = b(j - 1)
          System.arraycopy(b, j + 1, scratch, j - 1, L - j - 1)
          if (wantD2) n = addUnique(out, n, hashBytes(scratch, L - 2, Seed))
          if (wantTags) {
            // xxhash64(i, j, remainder) with 1-based char positions
            val s1 = XXH64.hashInt(i + 1, Seed)
            val s2 = XXH64.hashInt(j + 1, s1)
            out(n) = hashBytes(scratch, L - 2, s2)
            n += 1
          }
          j += 1
        }
        i += 1
      }
    }
    val vals = new Array[Any](n)
    var k = 0
    while (k < n) { vals(k) = out(k); k += 1 }
    new GenericArrayData(vals)
  }

  /** Character-exact slow path for non-ASCII keys: build each variant
    * as a String, hash its UTF-8 bytes. Same dedup-by-hash contract. */
  private def keyHashesGeneric(s: String, mode: Int): GenericArrayData = {
    val L = s.length // UTF-16 code units: parity with substr's chars
    val wantD2 = mode == D2 || mode == Probe2
    val wantTags = mode == Probe2 || mode == Index2
    val maxOut = 1 + L + (if (wantD2) L * (L - 1) / 2 else 0) +
      (if (wantTags) L * (L - 1) / 2 else 0)
    val out = new Array[Long](maxOut)
    def h(v: String, seed: Long): Long = {
      val vb = v.getBytes(StandardCharsets.UTF_8)
      hashBytes(vb, vb.length, seed)
    }
    var n = addUnique(out, 0, h(s, Seed))
    var i = 0
    while (i < L) {
      n = addUnique(out, n, h(s.substring(0, i) + s.substring(i + 1), Seed))
      i += 1
    }
    if ((wantD2 || wantTags) && L >= 2) {
      i = 0
      while (i < L - 1) {
        var j = i + 1
        while (j < L) {
          val rem = s.substring(0, i) + s.substring(i + 1, j) +
            s.substring(j + 1)
          if (wantD2) n = addUnique(out, n, h(rem, Seed))
          if (wantTags) {
            val s2 = XXH64.hashInt(j + 1, XXH64.hashInt(i + 1, Seed))
            out(n) = h(rem, s2)
            n += 1
          }
          j += 1
        }
        i += 1
      }
    }
    val vals = new Array[Any](n)
    var k = 0
    while (k < n) { vals(k) = out(k); k += 1 }
    new GenericArrayData(vals)
  }
}

case class EntityKeyHashesExpr(child: Expression, mode: Int)
    extends UnaryExpression {
  require(mode >= EntityKeyFns.D1 && mode <= EntityKeyFns.Index2, s"mode=$mode")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    EntityKeyFns.keyHashes(v.asInstanceOf[UTF8String], mode)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.EntityKeyFns.keyHashes($c, $mode)")
  override protected def withNewChildInternal(c: Expression)
      : EntityKeyHashesExpr = copy(child = c)
  override def prettyName: String = "entity_key_hashes"
}

object EntityKeyExpressions {
  def keyHashesCol(key: Column, mode: Int): Column =
    bridge.toColumn(EntityKeyHashesExpr(bridge.toExpression(key), mode))
}
