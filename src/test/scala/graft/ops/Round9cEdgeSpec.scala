package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge contracts for the round-9c operators: degenerate inputs must
  * produce defined, empty-or-identity results, and each op's
  * accounting identity must telescope. */
class Round9cEdgeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("editVerifiedPairs: empty frame and all-distinct corpus both " +
    "yield zero pairs, not a throw") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.editVerifiedPairs(empty, "text", "doc_id",
      maxBucket = 10, prefixLen = 120).count() === 0L)
    val distinct = (1L to 20L)
      .map(i => (i, (1 to 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.editVerifiedPairs(distinct, "text", "doc_id",
      maxBucket = 10, prefixLen = 120).count() === 0L)
  }

  test("blocklist kernel: empty text counts nothing; a pattern equal " +
    "to the whole text counts once") {
    val z = BlocklistFns.automaton.countsOf("")
    assert(z.forall(_ == 0L))
    val one = BlocklistFns.automaton.countsOf("merge")
    assert(one(BlocklistFns.Patterns.indexOf("merge")) === 1L)
    assert(one.sum === 1L)
  }

  test("hammingPairs64: empty frame yields no pairs; a single row " +
    "yields no pairs; tau=0 keeps only exact signature matches") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "h")
    assert(Dedup.hammingPairs64(empty, "h", "id", tau = 3).count() === 0L)
    val one = Seq((1L, 42L)).toDF("id", "h")
    assert(Dedup.hammingPairs64(one, "h", "id", tau = 3).count() === 0L)
    val mixed = Seq((1L, 42L), (2L, 42L), (3L, 43L)).toDF("id", "h")
    val exact = Dedup.hammingPairs64(mixed, "h", "id", tau = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((1L, 2L)))
  }

  test("kneserNeyPerplexity: docs with < 2 tokens vanish (no bigram), " +
    "a 2-token doc scores; empty frame stays empty") {
    val df = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val out = NgramLm.kneserNeyPerplexity(df, "text", "doc_id")
      .collect()
    assert(out.length === 1 && out.head.getLong(0) === 2L)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(NgramLm.kneserNeyPerplexity(empty, "text", "doc_id")
      .count() === 0L)
  }

  test("q_pipeline_posttrain accounting telescopes: n_in = blocked + " +
    "lowq + dup + kept per source, and kept docs render non-empty") {
    val rows = graft.SparkEntry
      .queries("q_pipeline_posttrain")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nIn, b, lq, dup, k) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nIn === b + lq + dup + k, s"telescope broken: $r")
      assert(dup >= 0L)
      if (k > 0) assert(r.getLong(6) >= k, "fewer turns than docs")
    }
  }

  test("hardNegatives: single-label corpus mines nothing (no valid " +
    "negative exists)") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("label", lit(7))
    assert(Similarity.hardNegatives(e, "vec_id", "embedding", "label",
      3).count() === 0L)
  }

  test("ccnetApplyStream batch form: an archive-fitted LM applied to " +
    "an EMPTY batch yields an empty frame, not a throw") {
    val docsDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val lm = NgramLm.train(docsDf, "text", "doc_id")
    val empty = docsDf.where(lit(false))
    assert(graft.streaming.StreamingOps.ccnetApplyStream(empty, "text",
      "doc_id", lm, window = 32, tauFx = 3639984880L,
      fx = 1073741824.0).count() === 0L)
  }
}
