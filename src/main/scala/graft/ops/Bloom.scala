package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Portable distributed Bloom filter over long keys — the standard
  * accelerator for incremental dedup against a petabyte archive
  * (membership prefilter with NO false negatives, so results stay
  * exact; the filter only shrinks the exact-check join).
  *
  * Unlike `DataFrameStatFunctions.bloomFilter`, the hash family and
  * bit layout here are deterministic arithmetic on the key itself
  * (Kirsch–Mitzenmacher double hashing into 60-bit words), so an
  * external engine — or tomorrow's ingest job — reproduces the exact
  * bit array from the same key set: the filter itself is
  * oracle-checkable, not just the results it guards.
  *
  * Build = one explode(k) + hash aggregate (map-side partial,
  * output is ≤ mBits/60 words) collected to a driver array; probe =
  * pure codegen'd column arithmetic against the inlined words (no
  * UDF, no broadcast variable). Size mBits for the key cardinality
  * (~10 bits/key ≈ 1% fpp at k=5); the inline cap keeps the plan
  * small — beyond it, shard the filter by key range (one bloom per
  * bucket of a bucketed signature table) rather than growing one
  * monolith. */
object Bloom {

  /** 60-bit words keep every mask, bit_or, and pow(2, bit) exact in
    * both int64 and double arithmetic on any engine. */
  val WordBits = 60

  /** The k probe positions of a key (double hashing:
    * pos_j = (h1 + j·h2) mod m with h1 = key floorMod m,
    * h2 = 1 + key floorMod (m−1)). floorMod (Spark `pmod` / Java
    * `Math.floorMod`) makes the position arithmetic TOTAL over the
    * full long range: a plain `%` on a negative key yields negative
    * positions, which build and probe would interpret differently
    * (mask 0 on build, a shifted real bit on probe) — a silent FALSE
    * NEGATIVE, the one failure class a Bloom prefilter must never
    * have. Nonnegative keys (every in-repo producer: tokenHash,
    * minhash folds — all mod-2⁶⁰ universes) are unaffected:
    * floorMod == % there, so existing filters and oracles are
    * bit-identical. Keys must stay below 2⁶⁰ in magnitude so every
    * intermediate is exact in both int64 and double. */
  def positions(key: Column, mBits: Int, kHashes: Int): Seq[Column] = {
    val h1 = pmod(key, lit(mBits.toLong))
    val h2 = lit(1L) + pmod(key, lit((mBits - 1).toLong))
    // h1, h2 ≥ 0 ⇒ the combined position is already nonnegative
    (0 until kHashes).map(j => (h1 + lit(j.toLong) * h2) % lit(mBits.toLong))
  }

  private def wordIdx(p: Column): Column =
    ((p - p % lit(WordBits.toLong)) / lit(WordBits.toLong)).cast("long")
  private def mask(p: Column): Column =
    pow(lit(2.0), (p % lit(WordBits.toLong)).cast("double")).cast("long")

  /** Build the word array from a key column: explode the k positions,
    * bit_or the masks per word, collect the (word-index, word) pairs.
    * Words the key set never touches stay 0. */
  def build(keys: DataFrame, keyCol: String, mBits: Int,
            kHashes: Int): Array[Long] = {
    require(mBits > 1 && mBits <= (1 << 24),
      s"mBits=$mBits outside (1, 2^24] — shard the filter instead of " +
        "growing one monolith past a ~280KB word array")
    require(kHashes >= 1 && kHashes <= 16, s"bad kHashes=$kHashes")
    val posArr = array(positions(col(keyCol), mBits, kHashes): _*)
    val words = keys.select(explode(posArr).as("p"))
      .select(wordIdx(col("p")).as("w"), mask(col("p")).as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("word"))
      .collect()
    val bits = new Array[Long]((mBits + WordBits - 1) / WordBits)
    words.foreach(r => bits(r.getLong(0).toInt) = r.getLong(1))
    bits
  }

  /** Sharded Bloom index as a TABLE — one row per (shard, word
    * index, 60-bit word): the file/shard-skipping index for POINT
    * lookups at catalog scale (the equality-predicate sibling of the
    * parquet-footer min/max stats, which only serve ranges). Fully
    * relational: no driver state, no broadcast — it builds as one
    * explode + bit_or aggregate (map-side partial onto the
    * shards × mBits/60 grain) and probes as a join, so the index
    * itself persists as a tiny table any engine reproduces
    * bit-for-bit from the key sets. */
  def shardIndex(df: DataFrame, shardCol: String, keyCol: String,
                 mBits: Int, kHashes: Int): DataFrame = {
    val posArr = array(positions(col(keyCol), mBits, kHashes): _*)
    df.select(col(shardCol).as("shard"), explode(posArr).as("p"))
      .select(col("shard"), wordIdx(col("p")).as("w"),
        mask(col("p")).as("m"))
      .groupBy("shard", "w").agg(expr("bit_or(m)").as("word"))
  }

  /** Candidate shards per probe key against a [[shardIndex]]:
    * (key, shard) pairs where EVERY probe position hits the shard's
    * words — no false negatives by construction (a present key's
    * positions are all set in its shard), false positives bounded by
    * the per-shard load and measured by the caller. Probe = explode
    * k (deduplicated) positions, one join on the word index, and a
    * keyed count-equality — bounded fan-out (≤ k rows per shard per
    * probe), no shuffle of anything data-sized. */
  def probeShards(index: DataFrame, probes: DataFrame, keyCol: String,
                  mBits: Int, kHashes: Int): DataFrame = {
    val arr = array_distinct(array(positions(col(keyCol), mBits,
      kHashes): _*))
    probes
      .select(col(keyCol).as("key"), size(arr).as("np"),
        explode(arr).as("p"))
      .select(col("key"), col("np"), col("p"),
        wordIdx(col("p")).as("w"), mask(col("p")).as("m"))
      .join(index, "w")
      .where(col("word").bitwiseAND(col("m")) =!= lit(0L))
      .groupBy(col("key"), col("shard"), col("np"))
      .agg(count_distinct(col("p")).as("nh"))
      .where(col("nh") === col("np").cast("long"))
      .select("key", "shard")
  }

  /** Membership probe: true ⇒ maybe present, false ⇒ DEFINITELY
    * absent. Native codegen'd kernel — the key child is evaluated
    * exactly ONCE per row. The composable column form
    * [[mightContainSpec]] duplicates the key expression into every
    * probe term; after Catalyst's project-collapse that bloats filter
    * conditions past the whole-stage-codegen limit and re-evaluates
    * an expensive key (e.g. a MinHash-signature fold) dozens of times
    * per row — measured 30× slower on the incremental-dedup filter. */
  def mightContain(bits: Array[Long], key: Column, mBits: Int,
                   kHashes: Int): Column =
    bridge.toColumn(BloomContainsExpr(bridge.toExpression(key),
      bits.toSeq, mBits, kHashes))

  /** Executable spec of [[mightContain]] in composable column ops —
    * the form the native kernel is equivalence-tested against. */
  def mightContainSpec(bits: Array[Long], key: Column, mBits: Int,
                       kHashes: Int): Column = {
    val words = typedLit(bits.toSeq)
    positions(key, mBits, kHashes).map { p =>
      element_at(words, wordIdx(p).cast("int") + lit(1))
        .bitwiseAND(mask(p)) =!= lit(0L)
    }.reduce(_ && _)
  }
}

object BloomFns {
  /** Identical arithmetic to [[Bloom.mightContainSpec]]:
    * p/60 int-division ≡ (p − p mod 60)/60 and 1L<<bit ≡ pow(2, bit)
    * for bit < 60, and floorMod ≡ Spark's pmod, so the kernel and
    * the spec agree bit-for-bit over the FULL long key range. */
  def contains(bits: Array[Long], key: Long, m: Int, k: Int): Boolean = {
    val h1 = java.lang.Math.floorMod(key, m.toLong)
    val h2 = 1L + java.lang.Math.floorMod(key, (m - 1).toLong)
    var j = 0
    while (j < k) {
      val p = (h1 + j * h2) % m
      if ((bits((p / 60).toInt) & (1L << (p % 60).toInt)) == 0L)
        return false
      j += 1
    }
    true
  }
}

/** Native bloom probe; the word array rides in the plan like the PQ
  * codebooks (bounded by [[Bloom.build]]'s mBits cap). */
case class BloomContainsExpr(child: Expression, bits: Seq[Long],
    mBits: Int, kHashes: Int) extends UnaryExpression {
  @transient private lazy val arr: Array[Long] = bits.toArray
  override def dataType: DataType = BooleanType
  override def nullSafeEval(k: Any): Any =
    BloomFns.contains(arr, k.asInstanceOf[Long], mBits, kHashes)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", arr, "long[]")
    defineCodeGen(ctx, ev, k =>
      s"graft.ops.BloomFns.contains($ref, $k, $mBits, $kHashes)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BloomContainsExpr = copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}
