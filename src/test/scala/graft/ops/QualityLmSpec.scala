package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kneser–Ney smoothing, CCNet chunk filtering, and hard-negative
  * mining: textbook-formula and contract pins. */
class QualityLmSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kneserNeyPerplexity reproduces the hand-computed interpolated " +
    "KN probability on a two-doc corpus") {
    // corpus bigrams: doc1 "a b a b a", doc2 "a c"
    // occurrences: (a,b)x2 (b,a)x2 (a,c)x1 -> types: ab, ba, ac
    // c(a.)=3, N1+(a.)=2; c(b.)=2, N1+(b.)=1
    // N1+(.b)=1, N1+(.a)=1, N1+(.c)=1, N1+(..)=3
    val df = Seq((1L, "a b a b a"), (2L, "a c")).toDF("doc_id", "text")
    val got = NgramLm.kneserNeyPerplexity(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val d = 0.75
    def pkn(cvw: Double, cv: Double, n1v: Double, n1w: Double,
            nt: Double): Double =
      math.max(cvw - d, 0.0) / cv + d * n1v / cv * (n1w / nt)
    val pAB = pkn(2, 3, 2, 1, 3) // p(b|a)
    val pBA = pkn(2, 2, 1, 1, 3) // p(a|b)
    val pAC = pkn(1, 3, 2, 1, 3) // p(c|a)
    val nll1 = -(math.log(pAB) * 2 + math.log(pBA) * 2) / 4.0
    val nll2 = -math.log(pAC)
    assert(got(1L)._1 === 4L)
    assert(math.abs(got(1L)._2 - nll1) < 1e-12)
    assert(got(2L)._1 === 1L)
    assert(math.abs(got(2L)._2 - nll2) < 1e-12)
    // KN probabilities over each context sum to <= 1 (discount mass
    // is exactly redistributed: equality when every continuation of
    // the context is in the vocab of seen-type continuations)
    assert(pAB + pAC <= 1.0 + 1e-12)
  }

  test("q_quality_ccnet contract: kept + dropped + unscored = chunks; " +
    "repeated-template chunks keep, all-distinct-bigram chunks drop") {
    val tmp = java.nio.file.Files.createTempDirectory("ccnet").toString
    // 20 template docs (bigram (x,y) counted hundreds of times -> low
    // nll) and one doc of 80 distinct tokens (every bigram a hapax,
    // V~82 -> nll ~ -ln(2/83) = 3.73 > tau 3.39 -> dropped)
    val tmpl = Array.fill(16)("x y").mkString(" ") // 32 tokens, 1 chunk
    val rare = (1 to 80).map(i => s"w$i").mkString(" ")
    val docs = (0L until 20L).map(i => (i, tmpl, "en", "tmpl", 3L)) :+
      ((99L, rare, "en", "rare", 3L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val rows = graft.SparkEntry.queries("q_quality_ccnet")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // tmpl: 20 docs x 1 chunk, all kept
    assert(rows("tmpl") === ((20L, 0L, 20L, 20L * 32L)))
    // rare: 80 tokens -> chunks of 32/32/16, all scored, all dropped
    val (nc, nu, nk, kt) = rows("rare")
    assert(nc === 3L && nu === 0L && nk === 0L && kt === 0L)
  }

  test("hardNegatives: every mined negative has a different label and " +
    "matches the brute-force in-bucket top-k on real vectors") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hn = Similarity.hardNegatives(e, "vec_id", "embedding",
      "label", 3)
      .select(col("id_a"), col("label_a"),
        posexplode(col("topk")).as(Seq("rank", "x")))
      .select(col("id_a"), col("label_a"), col("rank"),
        col("x.id").as("id_b"), col("x.score").as("cos"))
    val lbl = e.select(col("vec_id").as("id_b"),
      col("label").as("label_b"))
    val bad = hn.join(lbl, "id_b")
      .where(col("label_a") === col("label_b")).count()
    assert(bad === 0L, "a same-label pair leaked into the negatives")
    // brute force within buckets
    val withB = Similarity.lshBuckets(e, "vec_id", "embedding", 8)
      .select(col("vec_id"), col("embedding"), col("label"),
        col("bucket"))
      .collect()
    val mined = hn.collect().map(r =>
      (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) =>
        x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val rows = withB.map(r => (r.getLong(0),
      r.getSeq[Float](1), r.getInt(2), r.getLong(3)))
    val expect = rows.flatMap { case (id, emb, l, bk) =>
      val negs = rows
        .filter(o => o._4 == bk && o._1 != id && o._3 != l)
        .map(o => (cos(emb, o._2), o._1))
        .sortBy { case (c, oid) => (-c, oid) }
        .take(3)
      negs.zipWithIndex.map { case ((_, oid), i) => (id, i, oid) }
    }.toSet
    assert(mined === expect)
  }
}
