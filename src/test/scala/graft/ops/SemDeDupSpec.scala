package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup scale-posture contracts: corpus-sized cell count
  * ([[Similarity.nCellsFor]]) and the oversize-cell divert boundary
  * of [[Similarity.semDeDupRemoved]] (cell at cap pair-enumerates,
  * cap+1 diverts — the q_dedup_embed_capped discipline on the
  * k-means cell key). */
class SemDeDupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("nCellsFor: ceil(n/targetPop) clamped to [1, maxCells] — " +
    "exact at the population boundaries") {
    assert(Similarity.nCellsFor(1L, 32L) == 1)
    assert(Similarity.nCellsFor(32L, 32L) == 1)
    assert(Similarity.nCellsFor(33L, 32L) == 2)
    assert(Similarity.nCellsFor(500L, 32L) == 16) // sf0.01 embeddings
    assert(Similarity.nCellsFor(2000L, 32L) == 63) // sf0.1 embeddings
    // clamp: corpus big enough to want more cells than maxCells
    assert(Similarity.nCellsFor(1000000L, 32L, maxCells = 1024) == 1024)
    // degenerate empty corpus still yields a valid k
    assert(Similarity.nCellsFor(0L, 32L) == 1)
    // expected cell population stays ~targetPop as n grows 100x
    val n1 = 10000L; val n2 = 1000000L
    val pop1 = n1.toDouble / Similarity.nCellsFor(n1, 32L)
    val pop2 = n2.toDouble / Similarity.nCellsFor(n2, 32L)
    assert(math.abs(pop1 - pop2) < 1.0, s"$pop1 vs $pop2")
  }

  test("semDeDupRemoved divert boundary: a cell with exactly cellCap " +
    "members pair-enumerates; cellCap+1 members diverts (no pairs, " +
    "one oversize row)") {
    val s = spark
    import s.implicits._
    val cap = 4
    // cell 1: exactly cap identical vectors -> keep-first removes 3
    // cell 2: cap+1 identical vectors -> diverted, removes nothing
    val rows =
      (1 to cap).map(i => (1L, i.toLong, Seq(1.0, 0.0, 0.0))) ++
        (1 to cap + 1).map(i => (2L, (100 + i).toLong, Seq(0.0, 1.0, 0.0)))
    val cells = rows.toDF("cell", "vec_id", "embedding")
    val (removed, oversize) = Similarity.semDeDupRemoved(
      cells, "vec_id", "embedding", tau = 0.9, cellCap = cap)
    val rm = removed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rm == Set((1L, 2L), (1L, 3L), (1L, 4L)), s"$rm")
    val os = oversize.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(os == Set((2L, (cap + 1).toLong)), s"$os")
  }

  test("semDeDupRemoved: an id below tau to its lower-id mates " +
    "survives; removal is distinct even with two lower-id matches") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (7L, 1L, Seq(1.0, 0.0)), // keeper
      (7L, 2L, Seq(1.0, 0.0)), // dup of 1
      (7L, 3L, Seq(1.0, 0.001)), // dup of BOTH 1 and 2 -> one row
      (7L, 4L, Seq(0.0, 1.0))) // orthogonal: kept
    val cells = rows.toDF("cell", "vec_id", "embedding")
    val (removed, _) = Similarity.semDeDupRemoved(
      cells, "vec_id", "embedding", tau = 0.9, cellCap = 0)
    val rm = removed.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rm.length == rm.distinct.length, s"dup rows: ${rm.toSeq}")
    assert(rm.toSet == Set((7L, 2L), (7L, 3L)), s"${rm.toSeq}")
  }
}
