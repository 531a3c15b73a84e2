package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Content-defined chunking ([[Cdc]]): structural invariants
  * (coverage, min/max bounds), determinism, and the property the
  * operator exists for — boundary re-alignment after a prefix
  * insertion, which fixed-size blocking fundamentally cannot do. */
class CdcSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def text(seed: Int, n: Int): String = {
    val sb = new StringBuilder
    var h = seed.toLong
    while (sb.length < n) {
      h = (h * 6364136223846793005L + 1442695040888963407L)
      sb.append(('a' + math.floorMod(h >>> 33, 26L).toInt).toChar)
    }
    sb.toString.take(n)
  }

  test("chunks cover the text exactly, in order, within [MinC, MaxC] " +
    "except the tail, and rebuild the original by concatenation") {
    val s = spark
    import s.implicits._
    val t = text(7, 1200)
    val got = Cdc.chunks(Seq((1L, t)).toDF("id", "txt"), "txt",
        Seq("id"))
      .select("len", "fp").collect()
    val lens = got.map(_.getInt(0)).toSeq
    assert(lens.sum == t.length, s"coverage: ${lens.sum} vs ${t.length}")
    assert(lens.init.forall(l => l >= Cdc.MinC && l <= Cdc.MaxC),
      s"interior bounds: $lens")
    assert(lens.last <= Cdc.MaxC)
    // determinism: same text -> same fps
    val again = Cdc.chunks(Seq((1L, t)).toDF("id", "txt"), "txt",
      Seq("id")).select("fp").collect().map(_.getLong(0)).toSeq
    assert(again == got.map(_.getLong(1)).toSeq)
  }

  test("boundary re-alignment: a prefix insertion leaves the bulk of " +
    "chunk fingerprints INTACT (the content-defined property fixed " +
    "blocks cannot have)") {
    val s = spark
    import s.implicits._
    val base = text(42, 2000)
    val shifted = "XYZPREFIX" + base
    val df = Seq((1L, base), (2L, shifted)).toDF("id", "txt")
    val fps = Cdc.chunks(df, "txt", Seq("id")).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    val shared = fps(1L).intersect(fps(2L)).size
    // all chunks after the first boundary re-align exactly
    assert(shared >= fps(1L).size - 2,
      s"shared $shared of ${fps(1L).size} base chunks")
    // negative control: different CONTENT shares nothing
    val other = Cdc.chunks(Seq((3L, text(43, 2000))).toDF("id", "txt"),
        "txt", Seq("id"))
      .collect().map(_.getLong(2)).toSet
    assert(fps(1L).intersect(other).isEmpty)
  }

  test("the fused kernel == the composable column SPEC, chunk for " +
    "chunk (len and fp), across sizes spanning every edge: sub-W, " +
    "sub-MinC, single-chunk, forced-MaxC, long") {
    val s = spark
    import s.implicits._
    val texts = Seq(text(1, 3), text(2, Cdc.W), text(3, Cdc.MinC),
      text(4, Cdc.MaxC + 1), text(5, 64), text(6, 500), text(7, 2000),
      text(8, 1999))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "txt")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("id", "len", "fp").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      .sorted
    val kern = rows(Cdc.chunks(df, "txt", Seq("id")))
    val spec = rows(Cdc.chunksSpec(df, "txt", Seq("id")))
    assert(kern == spec, s"kernel vs spec:\n$kern\n$spec")
  }

  test("short texts (below W and below MinC) become one whole-text " +
    "chunk instead of erroring") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "tiny"), (2L, text(5, Cdc.MinC - 1)))
      .toDF("id", "txt")
    val got = Cdc.chunks(df, "txt", Seq("id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 4, 2L -> (Cdc.MinC - 1)), s"$got")
  }
}
