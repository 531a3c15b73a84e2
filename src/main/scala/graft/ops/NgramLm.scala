package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-space bigram language model for perplexity-based quality
  * scoring — the CCNet-style filter (Wenzek et al. 2020: docs are
  * kept/binned by LM perplexity) re-expressed as two hash aggregates
  * and one key join, with no model file and no UDF.
  *
  * Tokens are the deterministic portable 45-bit hashes of
  * [[Dedup.tokenHashList]]; a bigram is the same 45-bit polynomial
  * fold [[Dedup.ngramFingerprints]] uses for n = 2, so both engines
  * (and a stream) compute identical keys. Training = one scan →
  * per-bigram and per-prefix counts (map-side partial aggregates
  * keyed by hash — the zipf head is merely a hot *reduce key of a
  * count*, never a row explosion). Scoring joins doc bigrams to the
  * aggregated counts: many-to-one on post-aggregation keys, then one
  * per-doc aggregate. At 100 TB the exact-join path is 3 key-shuffles
  * of token-count-sized data; when the pruned LM fits an executor
  * (top-K bigrams + unigram backoff), broadcast it instead and
  * scoring becomes a pure map — the join path below stays the
  * bit-exact oracle either way.
  */
object NgramLm {

  private val M = Dedup.NgramFpMod

  /** One row per bigram occurrence: (idCol, w1, b) with w1 = prefix
    * token hash and b = 45-bit bigram fingerprint
    * ((w1·31 + w2) mod M). Docs with fewer than 2 tokens contribute
    * nothing. Pure map (tokenize + fold per row → explode). */
  def bigramRows(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hl = Dedup.tokenHashList(col(textCol))
    df.select(col(idCol), hl.as("__hl"))
      .where(size(col("__hl")) >= 2)
      .select(col(idCol), explode(
        transform(slice(col("__hl"), lit(1), size(col("__hl")) - 1),
          (h, i) => struct(h.as("w1"),
            ((h * lit(31L) + element_at(col("__hl"), i + lit(2))) % lit(M))
              .as("b")))).as("u"))
      .select(col(idCol), col("u.w1").as("w1"), col("u.b").as("b"))
  }

  /** A trained bigram LM: per-bigram counts (b, cb), per-prefix
    * counts (w1, cu), and the corpus vocabulary size (distinct token
    * hashes over ALL positions). The count tables are lazy plans —
    * persist them when scoring repeatedly. */
  final case class Lm(bigrams: DataFrame, prefixes: DataFrame, vocab: Long)

  /** Train on a corpus: two hash aggregates over the bigram rows plus
    * one distinct-count action for the vocabulary. */
  def train(df: DataFrame, textCol: String, idCol: String): Lm = {
    val bg = bigramRows(df, textCol, idCol)
    val bigrams = bg.groupBy("b").agg(count(lit(1)).as("cb"))
    val prefixes = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = df
      .select(explode(Dedup.tokenHashList(col(textCol))).as("h"))
      .agg(countDistinct(col("h"))).head().getLong(0)
    Lm(bigrams, prefixes, vocab)
  }

  /** Per-doc perplexity signal under add-one smoothing:
    * p(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V); returns
    * (idCol, n_bigrams, nll) with nll = avg −ln p over the doc's
    * bigrams. Unseen bigrams/prefixes (held-out scoring) count as 0
    * via the left joins, so every doc with ≥ 2 tokens gets a finite
    * score; perplexity = exp(nll). */
  def perplexity(df: DataFrame, textCol: String, idCol: String,
                 lm: Lm): DataFrame = {
    val bg = bigramRows(df, textCol, idCol)
    val nll: Column = -log((col("cb") + lit(1.0)) /
      (col("cu") + lit(lm.vocab)).cast("double"))
    bg.join(lm.bigrams, Seq("b"), "left")
      .join(lm.prefixes, Seq("w1"), "left")
      .na.fill(0L, Seq("cb", "cu"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(nll).as("nll"))
  }
}
