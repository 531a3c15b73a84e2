package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Feature-hashing embedder: kernel == composable spec bit for bit,
  * the hashed vectors behave like a real embedding (exact duplicates
  * at cosine 1, inner products tracking token overlap), and the
  * embedding stage is a pure map. */
class HashEmbedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("native kernel equals the composable spec bit for bit on the " +
    "fixture corpus, plus the empty-token edge") {
    val base = docs.select(col("text"))
      .union(Seq("", "a", "a a b").toDF("text"))
    val diff = base.select(
        HashEmbed.counts(col("text")).as("k"),
        HashEmbed.countsSpec(col("text")).as("s"))
      .where(col("k") =!= col("s"))
      .count()
    assert(diff == 0, s"$diff rows diverge from the spec")
  }

  test("unitVec kernel equals its composable spec bit for bit, " +
    "including the all-cancelled null case") {
    // "a b" where both tokens hash to the same bucket with opposite
    // signs is corpus-dependent; instead force the null path with
    // empty-vs-nonempty and compare the rest exactly
    val base = docs.select(col("text"))
      .union(Seq("a", "a a b", "x y z w").toDF("text"))
    val rows = base.select(
        HashEmbed.unitVec(col("text")).as("k"),
        HashEmbed.unitVecSpec(col("text")).as("s"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[Double](0) == r.getSeq[Double](1), s"$r")
    }
  }

  test("hashed vectors are an embedding: duplicate texts at cosine 1, " +
    "disjoint token bags near 0, self-norm from integer counts") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("id", "text")
    val vecs = rows.select(col("id"),
        HashEmbed.unitVec(col("text")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(cos(vecs(1L), vecs(2L)) - 1.0) < 1e-12,
      "exact duplicates must land at cosine 1")
    assert(math.abs(cos(vecs(1L), vecs(3L))) < 0.5,
      "disjoint token bags must not look like duplicates")
    assert(math.abs(cos(vecs(1L), vecs(1L)) - 1.0) < 1e-12)
  }

  test("counts vector sums to (#positive − #negative) tokens and " +
    "|v|₁ is bounded by the token count (multiplicity kept)") {
    val checked = docs
      .select(HashEmbed.counts(col("text")).as("c"),
        (size(split(col("text"), " ", -1))).cast("long").as("n"))
      .where(
        abs(aggregate(col("c"), lit(0L), (a, x) => a + x)) > col("n") ||
        aggregate(col("c"), lit(0L), (a, x) => a + abs(x)) > col("n"))
      .count()
    assert(checked == 0)
  }

  test("embedding is a pure map (no exchange) and stays inside " +
    "whole-stage codegen") {
    val plan = docs.select(HashEmbed.counts(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
    // '*(n)' prefixes mark whole-stage-codegen'd operators
    assert(plan.contains("*(1) Project"), s"must codegen:\n$plan")
  }
}
