package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact PageRank: the fixed-point recurrence matches a
  * serial replay bit for bit, is partition-invariant, conserves mass
  * up to floor losses, and ranks hubs above leaves. */
class GraphRankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Serial replay of the exact integer recurrence (the operator's
    * contract, independently re-implemented on driver collections). */
  private def serialPageRank(edges: Seq[(Long, Long)], iters: Int,
                             scale: Long = Scale, dampNum: Long = 85L,
                             dampDen: Long = 100L): Map[Long, Long] = {
    val e = edges.filter { case (s, d) => s != d }.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val deg = e.groupBy(_._1).map { case (s, xs) => (s, xs.length.toLong) }
    val base = ((dampDen - dampNum) * (scale / n)) / dampDen
    var r = nodes.map(v => (v, scale / n)).toMap
    for (_ <- 1 to iters) {
      val dmass = nodes.filterNot(deg.contains).map(r).sum
      val inflow = e.groupBy(_._2).map { case (d, es) =>
        (d, es.map { case (s, _) => r(s) / deg(s) }.sum)
      }
      r = nodes.map(v =>
        (v, base + (dampNum * (inflow.getOrElse(v, 0L) + dmass / n)) / dampDen)
      ).toMap
    }
    r
  }

  private def runOp(edges: Seq[(Long, Long)], iters: Int,
                    parts: Int = 4): Map[Long, Long] =
    GraphRank.pageRankInt(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  // 1→2, 2→1, 1→3; 3 dangling: a cycle feeding a sink
  private val tiny = Seq((1L, 2L), (2L, 1L), (1L, 3L))

  test("matches the serial integer replay bit for bit") {
    assert(runOp(tiny, 4) === serialPageRank(tiny, 4))
    val star = (2L to 9L).flatMap(i => Seq((i, 1L), (1L, i)))
    assert(runOp(star, 3) === serialPageRank(star, 3))
  }

  test("ranks are partition-invariant") {
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, i % 40 + 1), (i, (i * 7) % 40 + 1), (i, 1L)))
    assert(runOp(edges, 3, parts = 1) === runOp(edges, 3, parts = 13))
  }

  test("dangling mass is redistributed: total conserved up to floors") {
    val ranks = runOp(tiny, 5)
    val total = ranks.values.sum
    val n = ranks.size
    // each round loses < ~3 units per node + n to integer floors
    assert(total <= Scale)
    assert(total >= Scale - 5L * 10L * (n + 1),
      s"mass leaked: $total of $Scale")
  }

  test("a hub out-ranks its leaves") {
    val star = (2L to 9L).flatMap(i => Seq((i, 1L), (1L, i)))
    val ranks = runOp(star, 5)
    assert((2L to 9L).forall(i => ranks(1L) > ranks(i)))
  }
}
