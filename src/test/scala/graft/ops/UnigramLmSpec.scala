package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction ([[UnigramLm]]): substring seed,
  * Viterbi max-probability segmentation, the reversed-cut tie rule,
  * the single-char floor, and end-to-end determinism of trainDf. */
class UnigramLmSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("substrings emits every occurrence of every piece up to " +
    "MaxPieceLen, position-distinct") {
    val s = spark
    import s.implicits._
    val got = Seq("abab").toDF("tok")
      .select(UnigramLm.substrings(col("tok")).as("ss"))
      .head().getSeq[String](0)
    // positions: a ab aba abab / b ba bab / a ab / b
    assert(got == Seq("a", "ab", "aba", "abab", "b", "ba", "bab",
      "a", "ab", "b"), s"$got")
  }

  test("segmented picks the max-probability segmentation under the " +
    "model, and ties break to the longest LAST piece") {
    val s = spark
    import s.implicits._
    val wt = Seq(("abcd", 1L)).toDF("tok", "freq")
    // model: 'ab' and 'cd' dominate single chars -> [ab, cd]
    val m1 = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "ab" -> 8L, "cd" -> 8L)
    val seg1 = UnigramLm.segmented(wt, m1)
      .select("pieces").head().getSeq[String](0)
    assert(seg1 == Seq("ab", "cd"), s"$seg1")
    // exact tie by symmetry: 'abc'+'d' vs 'a'+'bcd' have identical
    // scores (same multiset of probs, same fold shape both reduce to
    // p1*p2) -> the longest LAST piece must win: [a, bcd]
    val m2 = Seq("a" -> 4L, "d" -> 4L, "abc" -> 6L, "bcd" -> 6L,
      "b" -> 1L, "c" -> 1L)
    val seg2 = UnigramLm.segmented(wt, m2)
      .select("pieces").head().getSeq[String](0)
    assert(seg2 == Seq("a", "bcd"), s"$seg2")
    // a word with a char only coverable by single pieces still
    // segments (char floor keeps every char in the model)
    val m3 = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
    val seg3 = UnigramLm.segmented(wt, m3)
      .select("pieces").head().getSeq[String](0)
    assert(seg3 == Seq("a", "b", "c", "d"))
  }

  test("recount applies the single-char floor and drops unused " +
    "multi-char pieces; prune keeps every char") {
    val s = spark
    import s.implicits._
    val seg = Seq((3L, Seq("ab", "ab")), (2L, Seq("ab", "c")))
      .toDF("freq", "pieces")
    val m = UnigramLm.recount(seg, Seq("a", "b", "c")).toMap
    assert(m == Map("ab" -> 8L, "c" -> 2L, "a" -> 1L, "b" -> 1L), s"$m")
    val big = (1 to 60).map(i => s"p$i" -> (100L + i)) ++
      Seq("a" -> 1L, "b" -> 2L)
    val pruned = UnigramLm.prune(big, Seq("a", "b"))
    assert(pruned.size == UnigramLm.VocabTarget + 2)
    assert(pruned.exists(_._1 == "a") && pruned.exists(_._1 == "b"))
  }

  test("trainDf is deterministic end-to-end (two runs bit-equal) and " +
    "fertility never increases from seed round to pruned apply " +
    "beyond the vocab cut") {
    val s = spark
    import s.implicits._
    val docs = Seq("the spark table merge", "the table table spark",
      "merge the spark spark", "table the merge spark")
      .map(Tuple1(_)).toDF("text")
    def run() = UnigramLm.trainDf(docs, "text").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    val a = run()
    val b = run()
    assert(a == b, "trainDf must be bit-deterministic")
    assert(a.size == 3 && a.map(_._1) == Seq(1, 2, 3))
    // every word is <= 5 chars; fertility must be within [1, len]
    assert(a.forall(r => r._5 >= 1.0 && r._5 <= 5.0), s"$a")
    // EM keeps or shortens segmentations on this corpus (hard-EM
    // reinforces the pieces it used)
    assert(a(1)._4 <= a(0)._4, s"round2 ${a(1)._4} vs round1 ${a(0)._4}")
  }
}
