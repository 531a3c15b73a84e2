package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed WordPiece tokenizer induction (Schuster & Nakajima
  * 2012; the BERT tokenizer) — the third member of the tokenizer
  * family beside [[Bpe]] (count-scored merges) and [[UnigramLm]]
  * (EM-pruned inventory). WordPiece differs from BPE in BOTH halves:
  * the LEARN side merges the pair maximizing the likelihood ratio
  * count(ab) / (count(a)·count(b)) instead of the raw pair count, and
  * the APPLY side is greedy longest-match-first (MaxMatch) against
  * the final vocabulary instead of a merge replay — with BERT's
  * whole-word-[UNK] semantics when no piece matches.
  *
  * Symbols carry the continuation mark explicitly: a word's first
  * character is unmarked, every later character is prefixed with
  * [[Mark]] (the ASCII record separator — rendered "##" for output,
  * the BERT convention). A merge of (a, b) produces a + stripMark(b),
  * so the merged symbol inherits a's position class; b is never
  * word-initial, so b always carries the mark.
  *
  * Scale shape — the [[Bpe]] discipline exactly: the corpus is
  * touched ONCE (word-frequency aggregate); every merge round runs
  * over the VOCABULARY table (one pair aggregate + one symbol
  * aggregate + a two-key join for the ratio + a one-row driver
  * argmax + one codegen'd string-replace map), and the apply side is
  * a pure per-row map (stream-safe).
  *
  * Cross-engine determinism: pair and symbol counts are exact
  * integers; the score is ONE IEEE division, CAST(c AS DOUBLE) /
  * CAST(ca·cb AS DOUBLE), computed identically on both engines; ties
  * break by (a, b) under binary collation. The MaxMatch state machine
  * advances ≥ 1 character per step, scanning candidate lengths
  * DESCENDING with first-match, so the segmentation — and the
  * position-weighted piece digest — is a pure function of the
  * vocabulary on both engines. */
object WordPiece {

  /** Continuation mark: the ASCII record separator, outside any
    * corpus alphabet (and distinct from [[Bpe.Delim]]). */
  val Mark = ""

  /** DuckDB rendering of the mark. */
  val MarkSql = "chr(30)"

  /** Digest modulus (prime < 2³⁰·ish): per-word digests stay under
    * it, so corpus sums stay in int64 at any scale. */
  val DigestMod = 999999937L

  /** Word-frequency table — the one corpus-sized pass. Tokens
    * containing either sentinel are dropped (both engines). */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0 &&
        !col("tok").contains(Bpe.Delim) && !col("tok").contains(Mark))
      .groupBy("tok").agg(count(lit(1)).as("freq"))

  /** Delimited marked-symbol sequence of a word:
    * ␟c1␟[Mark]c2␟[Mark]c3␟…␟. */
  def initSeq(tok: Column): Column = {
    val cs = array_remove(split(tok, ""), "")
    concat(lit(Bpe.Delim),
      array_join(transform(cs, (c, i) =>
        when(i === 0, c).otherwise(concat(lit(Mark), c))), Bpe.Delim),
      lit(Bpe.Delim))
  }

  /** Symbols of a delimited sequence, as an array. */
  private def syms(seqCol: Column): Column =
    array_remove(split(seqCol, Bpe.Delim), "")

  /** Adjacent symbol pairs, exploded (the [[Bpe]] shape). */
  private def pairs(seqCol: Column): Column = {
    val s = syms(seqCol)
    explode(when(size(s) < 2,
        array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(1), size(s) - 1),
        i => struct(element_at(s, i).as("a"),
          element_at(s, i + 1).as("b")))))
  }

  /** One merge application: two replace passes (the [[Bpe.applyMerge]]
    * semantics), with the merged symbol a + stripMark(b). */
  def applyMerge(seqCol: Column, a: String, b: String): Column = {
    val pat = lit(Bpe.Delim + a + Bpe.Delim + b + Bpe.Delim)
    val rep = lit(Bpe.Delim + a + b.substring(1) + Bpe.Delim)
    val once = call_function("replace", seqCol, pat, rep)
    call_function("replace", once, pat, rep)
  }

  /** One learned merge: raw (marked) symbols + exact counts. The
    * score is derived, never stored — both engines recompute the
    * same division from (pairCount, cntA, cntB). */
  final case class Merge(round: Int, a: String, b: String,
                         merged: String, pairCount: Long,
                         cntA: Long, cntB: Long)

  /** Learn `k` likelihood-scored merges. Per round: symbol counts
    * and pair counts over the (cached, vocab-sized) word table, the
    * ratio argmax as ONE driver row, then the codegen'd replace.
    * Rounds with no remaining pair stop early. */
  def learn(df: DataFrame, textCol: String, k: Int): Seq[Merge] =
    learnWithVocab(df, textCol, k)._1

  /** [[learn]] plus the MaxMatch vocabulary hashes, from ONE cached
    * word table (the alphabet collects reuse the same corpus pass the
    * rounds run over — calling [[learn]] and [[vocabHashes]]
    * separately would scan the corpus twice). */
  def learnWithVocab(df: DataFrame, textCol: String, k: Int,
                     mod: Long = DigestMod): (Seq[Merge], Map[String, Long]) = {
    require(k >= 1 && k <= 64, s"bad merge count $k")
    val base = wordTable(df, textCol)
      .withColumn("seq", initSeq(col("tok"))).select("tok", "freq", "seq")
      .cache()
    var seqDf = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var done = false
    try while (round <= k && !done) {
      val sym = seqDf.select(col("freq"), explode(syms(col("seq"))).as("s"))
        .groupBy("s").agg(sum(col("freq")).as("sc"))
      val top = seqDf.select(col("freq"), pairs(col("seq")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .join(sym.select(col("s").as("a"), col("sc").as("ca")), "a")
        .join(sym.select(col("s").as("b"), col("sc").as("cb")), "b")
        .orderBy((col("c").cast("double") /
            (col("ca") * col("cb")).cast("double")).desc,
          col("a").asc, col("b").asc)
        .select("a", "b", "c", "ca", "cb")
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Row(a: String, b: String, c: Long, ca: Long, cb: Long) =
          top.head
        merges += Merge(round, a, b, a + b.substring(1), c, ca, cb)
        seqDf = seqDf.withColumn("seq", applyMerge(col("seq"), a, b))
        round += 1
      }
    } catch { case t: Throwable => base.unpersist(); throw t }
    val first = base.select(substring(col("tok"), 1, 1).as("s"))
      .distinct().collect().map(_.getString(0))
    val interior = base
      .select(explode(slice(array_remove(split(col("tok"), ""), ""),
        2, 1000000)).as("c"))
      .distinct().collect().map(r => Mark + r.getString(0))
    base.unpersist()
    val all = (first ++ interior ++ merges.map(_.merged)).distinct
    (merges.toSeq,
      all.map(s => s -> math.floorMod(TextHashFns.tokenHash60(s), mod)).toMap)
  }

  /** Render a raw symbol for output: the leading mark becomes the
    * BERT "##" prefix. */
  private def render(s: String): String =
    if (s.startsWith(Mark)) "##" + s.substring(1) else s

  /** [[learn]] as a DataFrame (the oracle-query surface): rendered
    * symbols, exact counts, and the score as the one IEEE division
    * both engines perform. */
  def learnDf(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val rows = learn(df, textCol, k).map(m =>
      Row(m.round, render(m.a), render(m.b), render(m.merged),
        m.pairCount, m.cntA, m.cntB,
        m.pairCount.toDouble / (m.cntA * m.cntB).toDouble))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false),
        StructField("cnt_a", LongType, nullable = false),
        StructField("cnt_b", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))))
  }

  /** Greedy longest-match segmentation state of one token: struct
    * (np, unk, dg) — piece count, BERT whole-word-[UNK] flag, and the
    * position-weighted digest Σ (k+1)·pmod(hash(rawPiece), mod), mod
    * mod. A pure per-row map over a LITERAL vocabulary map — no
    * shuffle, no state, stream-safe. Candidate lengths scan
    * DESCENDING with first-match (the MaxMatch rule); each candidate
    * is materialized ONCE into an array before the fold, so the map
    * lookup never re-evaluates inside the picking lambda (the
    * [[UnigramLm]] cands pattern). */
  def maxMatch(tok: Column, vocab: Map[String, Long],
               mod: Long = DigestMod): Column =
    // native one-pass kernel (r14 optimization round — the
    // interpreted HOF fold below was the entire apply-pass cost);
    // WordPieceSpec pins kernel == spec over the learned vocab and
    // the edge cases (empty, UNK-forcing, mark-length boundaries)
    TextHashExpressions.wordPieceMaxMatch(tok, vocab, mod)

  /** The composable higher-order-function form of [[maxMatch]] — its
    * executable spec (kernel parity pinned by WordPieceSpec). */
  def maxMatchSpec(tok: Column, vocab: Map[String, Long],
                   mod: Long = DigestMod): Column = {
    require(vocab.nonEmpty, "empty vocabulary")
    val maxLen = vocab.keys.map(s =>
      if (s.startsWith(Mark)) s.length - 1 else s.length).max
    val pm = typedlit(vocab)
    val init = struct(lit(1).as("pos"), lit(0).as("np"),
      lit(false).as("unk"), lit(0L).as("dg"))
    val fin = aggregate(
      sequence(lit(1), length(tok)), init,
      (st, _) => {
        val pos = st.getField("pos")
        val np = st.getField("np")
        val unk = st.getField("unk")
        val dg = st.getField("dg")
        val active = !unk && pos <= length(tok)
        val cands = transform(
          sequence(least(lit(maxLen), length(tok) - pos + 1),
            lit(1), lit(-1)),
          l => struct(l.as("l"),
            try_element_at(pm,
              concat(when(pos > lit(1), lit(Mark)).otherwise(lit("")),
                tok.substr(pos, l))).as("h")))
        val best = aggregate(cands,
          struct(lit(0).as("l"), lit(0L).as("h")),
          (b, c) => when(b.getField("l") > 0 || c.getField("h").isNull, b)
            .otherwise(struct(c.getField("l").as("l"),
              c.getField("h").as("h"))))
        // bind `best` ONCE through a one-element lambda: HOF lambdas
        // evaluate interpreted, so referencing the fold via several
        // getFields would re-run the whole candidate scan per field
        val stepped = element_at(transform(array(best), bb =>
          when(bb.getField("l") === 0,
            struct(pos.as("pos"), np.as("np"),
              lit(true).as("unk"), dg.as("dg")))
          .otherwise(struct(
            (pos + bb.getField("l")).as("pos"),
            (np + 1).as("np"),
            lit(false).as("unk"),
            pmod(dg + (np + 1).cast("long") * bb.getField("h"),
              lit(mod)).as("dg")))), 1)
        when(!active, st).otherwise(stepped)
      })
    struct(fin.getField("np").as("np"), fin.getField("unk").as("unk"),
      fin.getField("dg").as("dg"))
  }
}
