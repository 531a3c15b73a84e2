package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing anchors: kernel == composable spec == independent Scala
  * reference, the ≥ k+w−1 shared-run guarantee, edge sizes, and the
  * ~1/w anchor-mass reduction. */
class WinnowSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val K = 6
  private val W = 8

  /** Independent reference: window fps by direct hashing, sliding min
    * by brute force, distinct in selection order. */
  private def refAnchors(text: String, k: Int, w: Int): Seq[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < k) return Nil
    val hs = toks.map(t => TextHashFns.tokenHash60(t) % Dedup.NgramFpMod)
    val fps = (0 to toks.length - k).map { i =>
      (1 until k).foldLeft(hs(i))((a, j) => (a * 31 + hs(i + j)) % Dedup.NgramFpMod)
    }
    val sel =
      if (fps.length < w) Seq(fps.min)
      else (0 to fps.length - w).map(i => fps.slice(i, i + w).min)
    sel.distinct
  }

  private def kernelAnchors(text: String): Seq[Long] = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(text)).toDF("t")
      .select(TextHashExpressions.winnowAnchors(col("t"), K, W).as("a"))
      .collect().head.getSeq[Long](0)
  }

  test("kernel == composable HOF spec == independent reference on " +
    "varied docs (incl. m=0, 0<m<w, repeats)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "a b c",                                         // m = 0
      "a b c d e f g",                                 // m = 2 < w
      (1 to 40).map(i => s"t${i % 7}").mkString(" "),  // periodic repeats
      (1 to 60).map(i => s"u$i").mkString(" "),        // all distinct
      ("x y z q r s " * 10).trim)                      // heavy repetition
    docs.foreach { d =>
      val want = refAnchors(d, K, W)
      assert(kernelAnchors(d) == want, s"kernel mismatch on '$d'")
    }
    // composable spec over a PRE-COLLECTED fps array (the HOF form is
    // test-only; in a live plan it re-inlines the fps per element)
    val withFps = docs.zipWithIndex.map { case (d, i) =>
      val toks = d.split(" ", -1)
      val hs = toks.map(t => TextHashFns.tokenHash60(t) % Dedup.NgramFpMod)
      val fps = if (toks.length < K) Seq.empty[Long]
        else (0 to toks.length - K).map { j =>
          (1 until K).foldLeft(hs(j))((a, x) =>
            (a * 31 + hs(j + x)) % Dedup.NgramFpMod)
        }
      (i.toLong, d, fps)
    }
    val specOut = withFps.toDF("i", "t", "fps")
      .select(col("i"), Dedup.winnowAnchorsSpec(col("fps"), W).as("a"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    withFps.foreach { case (i, d, _) =>
      assert(specOut(i) == refAnchors(d, K, W), s"spec mismatch on '$d'")
    }
  }

  test("guarantee: two docs sharing a run of >= k+w-1 tokens share " +
    "an anchor; anchor mass is ~1/w of window mass") {
    val shared = (1 to K + W - 1).map(i => s"s$i").mkString(" ") // exactly k+w-1
    val a = s"${(1 to 30).map(i => s"a$i").mkString(" ")} $shared"
    val b = s"$shared ${(1 to 30).map(i => s"b$i").mkString(" ")}"
    val ia = kernelAnchors(a).toSet
    val ib = kernelAnchors(b).toSet
    assert((ia & ib).nonEmpty, "shared >= k+w-1 run must share an anchor")
    // reduction: a long all-distinct doc keeps ~m/w anchors
    val long = (1 to 2000).map(i => s"v$i").mkString(" ")
    val m = 2000 - K + 1
    val n = kernelAnchors(long).size
    assert(n < m / (W / 2) && n > m / (W * 4), s"anchors $n of $m windows")
  }
}
