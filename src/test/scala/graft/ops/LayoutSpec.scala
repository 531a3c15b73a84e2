package graft.ops

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the interleave is exact, and writing z-clustered
  * files keeps BOTH dimensions' per-file ranges narrow — the property
  * min/max skipping needs — where a lexicographic sort only clusters
  * its leading column. */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits exactly (driver oracle) and is " +
    "monotone under the quadrant structure") {
    def zRef(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val pairs = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == zRef(a, b, 4), s"z($a,$b)")
    }
    // distinct inputs give distinct z (it's a bijection on the grid)
    assert(got.values.toSet.size == pairs.size)
  }

  test("z-ordered files bound BOTH dimensions' per-file spans; a " +
    "lexicographic sort leaves the second dimension unclustered") {
    // synthetic frame spanning the FULL 0..127 × 0..31 grid with
    // decorrelated dimensions (fixture user_ids only reach 14 at
    // sf0.001, which would make the u assertion vacuous)
    val ev = spark.range(8192L)
      .select((col("id") % 128L).as("u"), ((col("id") * 7L) % 32L).as("d"))
    val base = Files.createTempDirectory("graft_zorder").toString
    val nFiles = 16
    ev.transform(Layout.zOrderBy(col("u"), col("d"), 8, nFiles))
      .write.mode("overwrite").parquet(s"$base/z")
    ev.repartitionByRange(nFiles, col("u")).sortWithinPartitions("u")
      .write.mode("overwrite").parquet(s"$base/lex")
    def avgSpans(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("u")) - min(col("u"))).as("su"),
          (max(col("d")) - min(col("d"))).as("sd"))
        .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zU, zD) = avgSpans(s"$base/z")
    val (lexU, lexD) = avgSpans(s"$base/lex")
    // lexicographic: u tightly clustered, d spans nearly everything
    assert(lexU < 0.3 * 127, s"lex files should bound u (got $lexU)")
    assert(lexD > 0.8 * 31, s"lex files should span days (got $lexD)")
    // z-order: BOTH spans materially below the globals. The floor is
    // geometric: 16 files over a 128×32 Morton grid is 256 codes/file,
    // i.e. a ~16×16 block, so d-spans of ~16 ARE the optimum — assert
    // well under the global span and well under the lex baseline.
    assert(zU < 0.5 * 127, s"z files should bound u (got $zU vs $lexU)")
    assert(zD < 0.62 * 31, s"z files should bound d (got $zD vs $lexD)")
    assert(zD < 0.7 * lexD, s"z should beat lex on d ($zD vs $lexD)")
  }

  test("compact rewrites a fragmented table into ceil(n/target) " +
    "balanced files, preserving content; clusterBy keeps files " +
    "min/max-prunable") {
    val base = Files.createTempDirectory("graft_compact").toString
    // fragment: 64 tiny files of 1000 rows
    spark.range(64000L).select(col("id"), (col("id") % 97L).as("v"))
      .repartition(64).write.mode("overwrite").parquet(s"$base/frag")
    val frag = spark.read.parquet(s"$base/frag")
    assert(new java.io.File(s"$base/frag").listFiles()
      .count(_.getName.endsWith(".parquet")) == 64)
    Layout.compact(frag, targetRows = 16000L, Some(col("id")))
      .write.mode("overwrite").parquet(s"$base/out")
    val outFiles = new java.io.File(s"$base/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(outFiles.length == 4, s"expected 4 files, got ${outFiles.length}")
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 64000L &&
      out.agg(sum("id")).head().getLong(0) ==
        frag.agg(sum("id")).head().getLong(0))
    // clustered: per-file id ranges are disjoint quarters, so any
    // id-range filter can skip 3 of 4 files on min/max stats
    val spans = out.groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach { case Array((_, hi0), (lo1, _)) =>
      assert(hi0 < lo1, s"file ranges must be disjoint: ${spans.toSeq}")
    }
    // size balance: no file more than 2x the target
    val counts = out.groupBy(input_file_name()).count()
      .collect().map(_.getLong(1))
    assert(counts.forall(c => c > 8000 && c < 32000), counts.toSeq)
  }

  test("rendezvousShard: scala argmax oracle, prefix property (a doc " +
    "moves under S->S' growth iff its new shard is an added one), and " +
    "movement fraction near (S'-S)/S'") {
    def hashRef(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def hrwRef(id: Long, n: Int): Int =
      (0 until n).maxBy(s => (hashRef(s"$id:$s"), -s)) // first max wins
    val ids = (0L until 2000L).toDF("id")
    val got = ids.select(col("id"),
        Layout.rendezvousShard(col("id"), 32).as("s32"),
        Layout.rendezvousShard(col("id"), 48).as("s48"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    got.foreach { case (id, s32, s48) =>
      assert(s32 == hrwRef(id, 32) && s48 == hrwRef(id, 48),
        s"id=$id: got ($s32,$s48), want " +
          s"(${hrwRef(id, 32)},${hrwRef(id, 48)})")
    }
    // prefix property: moved <=> new argmax landed in shards [32,48)
    got.foreach { case (id, s32, s48) =>
      assert((s48 != s32) == (s48 >= 32), s"prefix property broke at $id")
    }
    val moved = got.count { case (_, s32, s48) => s48 != s32 }
    // expected 16/48 = 1/3; allow +-6 sigma of Binomial(2000, 1/3)
    assert(math.abs(moved - 2000.0 / 3) < 6 * math.sqrt(2000 * (1.0 / 3) * (2.0 / 3)),
      s"moved $moved of 2000, expected ~667")
  }

  test("hilbertValue is a bijection on the grid whose consecutive " +
    "curve positions are ALWAYS grid-adjacent (the property Z lacks), " +
    "and the expression matches the JVM kernel") {
    val bits = 4
    val n = 1L << bits
    val pairs = for (a <- 0L until n; b <- 0L until n) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.hilbertValue(col("a"), col("b"), bits).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == LayoutFns.hilbert(a, b, bits), s"h($a,$b)")
    }
    // bijection onto [0, n^2)
    assert(got.values.toSet == (0L until n * n).toSet)
    // adjacency: d -> d+1 always moves exactly one grid step
    val byIdx = got.map(_.swap)
    (0L until n * n - 1).foreach { d =>
      val (x1, y1) = byIdx(d); val (x2, y2) = byIdx(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
    // ... while Z-order jumps at quadrant seams (sanity of the claim
    // the q_layout_hilbert query measures)
    val zIdx = pairs.map { case (a, b) =>
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))).sum -> (a, b) }.toMap
    val zJumps = (0L until n * n - 1).map { d =>
      val (x1, y1) = zIdx(d); val (x2, y2) = zIdx(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }
    assert(zJumps.max > 1, "z-order should have seam jumps > 1")
  }

  test("hilbert curve covers nested orders consistently at the " +
    "first quadrant (order-k curve restricted to the low quarter is " +
    "the order-(k-1) walk, possibly reflected — spot anchor values)") {
    // anchor the canonical order-1 walk: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    assert(LayoutFns.hilbert(0, 0, 1) == 0L)
    assert(LayoutFns.hilbert(0, 1, 1) == 1L)
    assert(LayoutFns.hilbert(1, 1, 1) == 2L)
    assert(LayoutFns.hilbert(1, 0, 1) == 3L)
    // null propagates (BinaryExpression null-safe contract)
    val r = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(Layout.hilbertValue(col("a"), col("b"), 4).as("h"))
      .head()
    assert(r.isNullAt(0))
  }
}
