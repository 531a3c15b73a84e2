package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed unigram-LM tokenizer induction (Kudo 2018 — the
  * SentencePiece unigram model, the BPE sibling a modern pipeline
  * actually ships): seed a candidate piece inventory from corpus
  * substrings, run hard-EM rounds (Viterbi-segment every word under
  * the current piece probabilities, re-estimate counts from the best
  * segmentations), prune to a target vocabulary, segment.
  *
  * Scale shape — the [[Bpe]] discipline exactly: the corpus is
  * touched ONCE (word-frequency aggregate); every EM round runs over
  * the VOCABULARY table (one codegen'd Viterbi map + two aggregates),
  * and the only driver round-trips are model-sized (the piece table,
  * ≤ seed size). Nothing data-sized reaches the driver; the apply
  * side is a pure per-row map.
  *
  * Cross-engine determinism (how a float DP pins bit-exactly):
  *  - piece probability = CAST(cnt AS DOUBLE) / CAST(total AS
  *    DOUBLE) — one IEEE division of exact integers;
  *  - a segmentation's score multiplies piece probs LEFT-TO-RIGHT
  *    (the DP's best(j)·p extension IS the left fold), so identical
  *    registers flow through identical rounding on both engines;
  *  - ties break to the segmentation whose REVERSED interior-cut
  *    list is lexicographically smallest (longest last piece, then
  *    longest second-to-last, …). The DP realizes this by scanning
  *    candidate last-piece lengths ascending with >= replacement
  *    (the last maximizer has the smallest cut); the oracle replays
  *    it by enumerating all 2^(L−1) segmentations and ordering by
  *    (score DESC, reversed-cut key ASC) — equivalent by induction:
  *    every maximal full segmentation decomposes into a maximal
  *    prefix segmentation plus a last piece, so minimizing the last
  *    cut then recursing equals lexicographic minimization of the
  *    reversed cut list.
  *  - every single character stays in the model at every round with
  *    count floor 1 (the SentencePiece required-character set), so
  *    every word has a positive-score segmentation and pieces longer
  *    than [[MaxPieceLen]] (probability 0) can never win — which is
  *    what makes the bounded-l DP equal to unbounded enumeration. */
object UnigramLm {

  /** Longest candidate piece. Seed substrings, and therefore every
    * model piece, are at most this long — the DP's per-position
    * scan bound. */
  val MaxPieceLen = 4

  /** Seed inventory size (top substrings by count; all single chars
    * ride along regardless). */
  val SeedSize = 48

  /** Pruned vocabulary target (single chars always survive). */
  val VocabTarget = 32

  /** Modulus for the order-sensitive segmentation digest (prime,
    * < 2³⁰·ish so every per-term product stays in int64 with room
    * for corpus-scale frequencies). */
  val DigestMod = 999999937L

  /** All substrings of `tok` with length 1..[[MaxPieceLen]], every
    * occurrence (position-distinct — a substring occurring twice
    * counts twice, the seed-frequency convention). */
  def substrings(tok: Column): Column =
    flatten(transform(sequence(lit(1), length(tok)), i =>
      transform(sequence(lit(1),
        least(lit(MaxPieceLen), length(tok) - i + 1)), l =>
        tok.substr(i, l))))

  /** Seed piece counts over a word table: cnt(piece) = Σ_words
    * freq · occurrences(piece, word). One vocab-sized explode +
    * aggregate. */
  def seedCounts(wordTable: DataFrame): DataFrame =
    wordTable.select(col("freq"),
        explode(substrings(col("tok"))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))

  /** Viterbi forward pass as a column: array of (best score, chosen
    * last-piece length) for positions 0..n, under the probability
    * map `pm` (piece → cnt/total). Position 0 carries (1.0, 0). */
  private def forward(tok: Column, pm: Column): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      array(struct(lit(1.0).as("s"), lit(0).as("l"))),
      (acc, i) => {
        val cands = transform(
          sequence(lit(1), least(i, lit(MaxPieceLen))), l =>
            struct(
              (element_at(acc, i - l + 1).getField("s") *
                coalesce(try_element_at(pm, tok.substr(i - l + 1, l)),
                  lit(0.0))).as("s"),
              l.as("l")))
        // l ascending with >= replacement: the LAST maximizer wins,
        // i.e. the largest piece length = the smallest last cut —
        // the reversed-cut-lexicographic tie rule (object doc)
        val best = aggregate(cands,
          struct(lit(-1.0).as("s"), lit(0).as("l")),
          (b, c) => when(c.getField("s") >= b.getField("s"), c)
            .otherwise(b))
        concat(acc, array(best))
      })

  /** Backtrace over a MATERIALIZED forward array (must be a bound
    * attribute, not an inline expression — inside the HOF lambda the
    * forward array is indexed once per step, and an inlined copy
    * would re-run the whole DP per step): pieces of the best
    * segmentation, in order. */
  private def backtrace(tok: Column, fwd: Column): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      struct(length(tok).as("pos"),
        array().cast("array<string>").as("ps")),
      (st, _) => {
        val pos = st.getField("pos")
        val l = element_at(fwd, pos + 1).getField("l")
        when(pos > 0,
          struct((pos - l).as("pos"),
            concat(array(tok.substr(pos - l + 1, l)),
              st.getField("ps")).as("ps")))
          .otherwise(st)
      }).getField("ps")

  /** Word table + `pieces` (best-segmentation array) under `model`.
    * The forward array lands in its own computeOnce-pinned
    * projection so CollapseProject cannot inline the DP into the
    * backtrace lambda (PlanAudit HOF rule). */
  def segmented(wordTable: DataFrame, model: Seq[(String, Long)]): DataFrame = {
    val total = model.map(_._2).sum
    val pm = typedlit(model.map { case (p, c) =>
      p -> c.toDouble / total.toDouble }.toMap)
    wordTable
      .withColumn("__fwd", PlanHints.computeOnce(forward(col("tok"), pm)))
      .withColumn("pieces", backtrace(col("tok"), col("__fwd")))
      .drop("__fwd")
  }

  /** One hard-EM M-step from best segmentations: piece → Σ freq,
    * with the single-char floor (chars never observed in a best
    * segmentation stay at count 1 so every word remains segmentable
    * — unused multi-char pieces drop out, standard EM death). */
  def recount(seg: DataFrame, chars: Seq[String]): Seq[(String, Long)] = {
    val observed = seg
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val seen = observed.map(_._1).toSet
    (observed ++ chars.filterNot(seen).map(_ -> 1L)).sortBy(_._1)
  }

  /** Prune to [[VocabTarget]] pieces by (count desc, piece asc);
    * single chars always survive. */
  def prune(model: Seq[(String, Long)], chars: Seq[String]): Seq[(String, Long)] = {
    val kept = model.sortBy { case (p, c) => (-c, p) }.take(VocabTarget)
    val seen = kept.map(_._1).toSet
    val charSet = chars.toSet
    (kept ++ model.filter { case (p, _) =>
      charSet(p) && !seen(p) }).sortBy(_._1)
  }

  /** Train on a corpus and return one stats row per phase: rounds
    * 1..`emRounds` are hard-EM passes over the seed-descended model,
    * round emRounds+1 is the segmentation under the PRUNED
    * vocabulary (the apply side). Columns: round, n_model (pieces
    * entering the pass), n_pieces_used (distinct pieces in best
    * segmentations), piece_instances (Σ freq·|seg|), avg_pieces
    * (fertility — pieces per corpus token occurrence), seg_digest
    * (order-sensitive per-word piece digest; pins identity AND
    * position of every piece cross-engine). */
  def trainDf(df: DataFrame, textCol: String, emRounds: Int = 2,
              digestMod: Long = DigestMod): DataFrame = {
    val spark = df.sparkSession
    val base = Bpe.wordTable(df, textCol).cache()
    try {
      val chars = base.select(explode(split(col("tok"), "")).as("c"))
        .where(length(col("c")) === 1).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      val sc = seedCounts(base)
      val top = sc.orderBy(col("cnt").desc, col("piece").asc)
        .limit(SeedSize)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val charCnt = sc.where(length(col("piece")) === 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val seenTop = top.map(_._1).toSet
      var model: Seq[(String, Long)] =
        (top ++ charCnt.filterNot(c => seenTop(c._1))).sortBy(_._1)

      val stats = scala.collection.mutable.ArrayBuffer.empty[Row]
      def pass(round: Int, m: Seq[(String, Long)]): DataFrame = {
        // narrow (freq, pieces) persists: the stats aggregate and
        // the recount both consume it — unpersisted, the Viterbi DP
        // would run twice per round (the BPE cache discipline); the
        // per-round materialization is vocab-sized
        val seg = graft.core.CacheRegistry.track(
          segmented(base, m).select("freq", "pieces")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val h = TextAnalysis.tokenHash(col("p"))
        val digest = seg
          .select(col("freq"), posexplode(col("pieces")).as(Seq("k", "p")))
          .agg(sum(col("freq") *
            pmod((col("k") + 1) * pmod(h, lit(digestMod)),
              lit(digestMod))).as("dg"),
            countDistinct(col("p")).as("nu"))
          .collect().head
        val inst = seg.agg(
          sum(col("freq") * size(col("pieces"))).as("pi"),
          sum(col("freq")).as("tf")).collect().head
        // fertility is ONE IEEE division of two exact integers —
        // bit-deterministic cross-engine with no rounding needed
        stats += Row(round, m.size, digest.getLong(1),
          inst.getLong(0),
          inst.getLong(0).toDouble / inst.getLong(1).toDouble,
          digest.getLong(0) % digestMod)
        seg
      }
      for (r <- 1 to emRounds) {
        val seg = pass(r, model)
        model = recount(seg, chars)
      }
      pass(emRounds + 1, prune(model, chars))
      spark.createDataFrame(
        spark.sparkContext.parallelize(stats.toSeq, 1),
        StructType(Seq(
          StructField("round", IntegerType, nullable = false),
          StructField("n_model", IntegerType, nullable = false),
          StructField("n_pieces_used", LongType, nullable = false),
          StructField("piece_instances", LongType, nullable = false),
          StructField("avg_pieces", DoubleType, nullable = false),
          StructField("seg_digest", LongType, nullable = false))))
    } finally base.unpersist()
  }
}
