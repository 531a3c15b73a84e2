package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE induction: learned merges match a hand-computed reference on
  * the classic corpus, segmentation applies them in order, and
  * degenerate corpora stop early. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("learns the classic merges on the Sennrich-style toy corpus") {
    // 'lo' appears in low(7) + lower(3) = 10 words; 'es' and 'st' in
    // newest(6) + widest(4) = 10 but 'e s' ties with 's t' — (e,s)
    // wins lexicographically; after es, (es,t) has 10.
    val corpus = (Seq.fill(7)("low") ++ Seq.fill(3)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(4)("widest")).mkString(" ")
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = Bpe.learn(df, "text", 4)
    // hand-derived: pair counts over {low:7, lower:3, newest:6, widest:4}
    // round1: (l,o)=10, (o,w)=10, (e,s)=10, (s,t)=10, (w,e)=3+6, ...
    //   tie at 10 -> (e,s) lexicographically smallest
    assert(merges(0)._2 == "e" && merges(0)._3 == "s" &&
      merges(0)._5 == 10L, s"round1: ${merges(0)}")
    // round2: (es,t)=10, (l,o)=10, (o,w)=10 -> (es,t) beats (l,o)?
    //   'es' > 'l' lexicographically... binary: 'e'(101) < 'l'(108),
    //   so (es,t) wins
    assert(merges(1)._2 == "es" && merges(1)._3 == "t" &&
      merges(1)._5 == 10L, s"round2: ${merges(1)}")
    // round3: (l,o)=10 wins; round4: (lo,w)=10
    assert(merges(2)._2 == "l" && merges(2)._3 == "o", s"round3: ${merges(2)}")
    assert(merges(3)._2 == "lo" && merges(3)._3 == "w" &&
      merges(3)._5 == 10L, s"round4: ${merges(3)}")
  }

  test("segment applies the merge list in order; unknown words fall " +
    "back to characters") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val got = Seq("lowest", "low", "xyz").toDF("tok")
      .select(col("tok"), Bpe.segment(col("tok"), merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("lowest") == Seq("low", "est"), got("lowest"))
    assert(got("low") == Seq("low"))
    assert(got("xyz") == Seq("x", "y", "z"))
  }

  test("single-character vocabulary has no pairs: learn stops with " +
    "no merges") {
    val df = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(Bpe.learn(df, "text", 5).isEmpty)
  }

  test("fused piece-count kernel == composable segment fold on a real " +
    "corpus with learned merges (incl. empty and delimiter words)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.learn(d, "text", 6).map(m => (m._2, m._3))
    assert(merges.nonEmpty)
    // executable spec: the per-word segment fold the kernel replaces
    val words = filter(split(col("text"), " "),
      w => w =!= lit("") && !w.contains(Bpe.Delim))
    val specNp = aggregate(words, lit(0L),
      (acc, w) => acc + size(Bpe.segment(w, merges)).cast("long"))
    val kernelNp = TextHashExpressions.bpePieceCount(col("text"), merges)
    val diff = d
      .select(col("doc_id"), specNp.as("a"), kernelNp.as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0L)
    // degenerate rows: empty text, delimiter-poisoned word, repeats
    val edge = Seq((1L, ""), (2L, s"ab${Bpe.Delim}cd ok"),
      (3L, "aaaa aaaa bb")).toDF("doc_id", "text")
    val got = edge
      .select(col("doc_id"), specNp.as("a"), kernelNp.as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, a, b) => assert(a == b, s"doc $id: $a != $b") }
  }
}
