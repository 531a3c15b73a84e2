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

  test("triangleStats: exact counts on known graphs (K4 closed, path " +
    "open), duplicate/reversed input edges collapse") {
    def stats(edges: Seq[(Long, Long)]) =
      GraphRank.triangleStats(edges.toDF("src", "dst"), "src", "dst")
        .head()
    // K4 given redundantly (both directions + dups): 6 edges, every
    // node degree 3, 12 wedges, 4 triangles, clustering 1.0
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val s1 = stats(k4 ++ k4)
    assert(s1.getLong(0) == 4 && s1.getLong(1) == 6 && s1.getLong(2) == 3)
    assert(s1.getLong(3) == 12 && s1.getLong(4) == 4)
    assert(s1.getDouble(5) == 1.0)
    // path 1-2-3-4: 3 edges, 2 wedges, no triangle
    val s2 = stats(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(s2.getLong(1) == 3 && s2.getLong(3) == 2 && s2.getLong(4) == 0)
    assert(s2.getDouble(5) == 0.0)
  }

  private def runLp(edges: Seq[(Long, Long)], seeds: Seq[(Long, Int)],
                    iters: Int): Map[Long, (Option[Int], Boolean)] =
    GraphRank.labelPropagate(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("node", "label"), "node", "label", iters)
      .collect().map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getBoolean(2))))
      .toMap

  test("labelPropagate floods each component from its seed; seeds " +
    "never change") {
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a != b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L))
    val out = runLp(edges, Seq((1L, 7), (11L, 3)), 3)
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_)._1.contains(7)))
    assert(Seq(11L, 12L, 13L).forall(out(_)._1.contains(3)))
    assert(out(1L)._2 && out(11L)._2 && !out(2L)._2)
  }

  test("labelPropagate ties break to the smallest label and reach " +
    "grows one hop per round") {
    // node 3 hears one vote each of labels 5 and 2 -> adopts 2
    val tie = runLp(Seq((1L, 3L), (2L, 3L)), Seq((1L, 5), (2L, 2)), 1)
    assert(tie(3L)._1.contains(2))
    // directed chain 1->2->3->4: one hop per round
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val after1 = runLp(chain, Seq((1L, 9)), 1)
    assert(after1(2L)._1.contains(9) && after1(3L)._1.isEmpty)
    val after3 = runLp(chain, Seq((1L, 9)), 3)
    assert(Seq(2L, 3L, 4L).forall(after3(_)._1.contains(9)))
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int,
                       rounds: Int = 12): Map[Long, Long] =
    GraphRank.kCore(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def clique(ns: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ns; b <- ns if a < b) yield (a, b)

  test("kCore peels transitively: a path has an empty 2-core even " +
    "though interior nodes start at degree 2") {
    // 1-2-3-4-5: endpoints peel, then 2/4 drop below k, then 3 — a
    // plain degree>=2 threshold would keep {2,3,4}
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(runKCore(path, 2) === Map.empty[Long, Long])
  }

  test("kCore keeps exactly the dense block: K5 plus a pendant " +
    "chain survives at k=3 with in-core degrees") {
    val g = clique(Seq(1L, 2L, 3L, 4L, 5L)) ++
      Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val core = runKCore(g, 3)
    assert(core === Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L,
      5L -> 4L))
  }

  test("kCore early stop matches the bounded-round replay and is " +
    "partition-invariant") {
    val g = clique(Seq(1L, 2L, 3L, 4L)) ++
      Seq((4L, 10L), (10L, 11L), (11L, 12L), (12L, 10L))
    // triangle 10-11-12 survives k=2; converges in <12 rounds, and
    // extra rounds are no-ops
    assert(runKCore(g, 2, rounds = 3) === runKCore(g, 2, rounds = 12))
    val a = GraphRank.kCore(g.toDF("src", "dst").repartition(7),
        "src", "dst", 2, 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === runKCore(g, 2))
    assert(a.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L, 12L))
  }
}
