package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword relevance ranking over the document corpus — BM25
  * (Robertson/Spärck Jones), the standard retrieval scorer a curation
  * pipeline uses to pull topic-relevant slices out of a web-scale
  * corpus (and the lexical half of hybrid lexical+embedding search).
  *
  * Scan-shaped at any scale: one tokenize pass feeds the corpus
  * stats and one feeds the query-bag filter (the explode carries
  * only matching tokens, so its volume is query-hit-sized, not
  * corpus-sized); per-doc-term tf is one hash aggregate and per-term
  * df is derived from tf's own output (reused exchange, no re-scan);
  * the tiny per-term idf + corpus stats broadcast. No shuffle
  * touches full documents.
  */
object Ranking {

  /** BM25 scores for every document containing ≥ 1 query term:
    * (idCol, score, n_hits) with
    * score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). Docs matching no term are
    * absent (their score is 0 by definition). */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val base = df.select(col(idCol),
        TextAnalysis.tokens(col(textCol)).as("__ws"))
      .select(col(idCol), size(col("__ws")).as("__dl"), col("__ws"))
    val stats = base.agg(count(lit(1)).as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val matched = base.select(col(idCol), col("__dl"),
      explode(filter(col("__ws"),
        t => t.isInCollection(queryTerms))).as("__term"))
    val tf = matched.groupBy(col(idCol), col("__term"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
    // tf already holds one row per (doc, term): per-term row counts ARE
    // the document frequencies — deriving df from tf (exchange reused)
    // saves a full re-tokenization of the corpus
    val dfreq = tf.groupBy("__term").agg(count(lit(1)).as("__df"))
    val joined = tf.join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val denom = col("__tf") + lit(k1) *
      ((lit(1.0) - lit(b)) + lit(b) * (col("__dl") / col("__avgdl")))
    val termScore = idf * ((col("__tf") * (lit(k1) + lit(1.0))) / denom)
    joined.groupBy(col(idCol))
      .agg(sum(termScore).as("score"), sum(col("__tf")).as("n_hits"))
  }

  /** Global top-k of a scored table as (id, rank) rows, rank 1-based
    * in (score desc, id asc) order — ONE bounded [[TopK]] aggregate
    * (O(k) mergeable state, per-partition partials), never a rank
    * Window over the corpus. The candidate-list builder for
    * [[rrfFuse]]. */
  def topRanks(df: DataFrame, scoreCol: String, idCol: String,
               k: Int): DataFrame =
    topRanksWithScore(df, scoreCol, idCol, k).drop(scoreCol)

  /** [[topRanks]] keeping the winning score as a third column — the
    * TopK buffer already carries it, so emitting it is free and saves
    * consumers a re-join against the (possibly expensive) scored
    * subplan just to recover the score of k winners. */
  def topRanksWithScore(df: DataFrame, scoreCol: String, idCol: String,
                        k: Int): DataFrame =
    df.agg(TopK.topK(col(scoreCol), col(idCol), k).as("__tk"))
      .select(posexplode(col("__tk")).as(Seq("__r", "__e")))
      .select(col("__e.id").as(idCol),
        (col("__r") + 1).cast("long").as("rank"),
        col("__e.score").as(scoreCol))

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of two bounded candidate lists — the standard way to combine a
    * lexical (BM25) and a semantic (embedding-cosine) ranker without
    * score calibration: rrf(d) = Σ_r 1/(k0 + rank_r(d)) over the
    * rankers that returned d.
    *
    * Inputs are (id, rank) lists from [[topRanks]] — both k-bounded,
    * so the full-outer join is candidate-sized, never corpus-sized.
    * Ranks are integers, so every 1/(k0+rank) term and their fixed
    * two-term sum are bit-identical on any engine. Returns
    * (id, rank_a, rank_b, rrf) with null ranks where a list missed. */
  def rrfFuse(ranksA: DataFrame, ranksB: DataFrame, idCol: String,
              k0: Int = 60): DataFrame = {
    val a = ranksA.withColumnRenamed("rank", "rank_a")
    val b = ranksB.withColumnRenamed("rank", "rank_b")
    val term = (r: Column) =>
      coalesce(lit(1.0) / (lit(k0.toDouble) + r.cast("double")), lit(0.0))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"),
        (term(col("rank_a")) + term(col("rank_b"))).as("rrf"))
  }
}
