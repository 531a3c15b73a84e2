package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Jaro–Winkler ([[StringSim]]): anchor vectors probed from DuckDB
  * 1.0's `jaro_winkler_similarity` (the oracle partner — these exact
  * doubles were read off the reference engine at dev time), the
  * RapidFuzz edge semantics, and expression == kernel. */
class StringSimSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("anchor vectors match DuckDB's jaro_winkler_similarity " +
    "bit-for-bit (probed reference doubles)") {
    val anchors = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("crate", "trace", 0.7333333333333334),
      ("dwayne", "duane", 0.8400000000000001),
      ("aaaaaa", "aaaaab", 0.9333333333333333),
      ("abcdefgh", "hgfedcba", 0.5),
      // jaro = 0.69697 <= 0.7: boost must NOT fire despite prefix 4+
      ("prefixmatch", "prefixxxxxx", 0.6969696969696969),
      ("ab", "abcdefghijklmnop", 0.7666666666666667),
      ("abc", "abc", 1.0))
    anchors.foreach { case (a, b, want) =>
      val got = StringSim.jaroWinkler(a, b)
      assert(got == want, s"jw($a, $b) = $got, want $want")
      assert(StringSim.jaroWinkler(b, a) == want, "symmetric")
    }
  }

  test("RapidFuzz edge semantics: empty -> 0 (not the textbook 1), " +
    "zero-window short strings, no-match -> 0") {
    assert(StringSim.jaroWinkler("", "") == 0.0)
    assert(StringSim.jaroWinkler("a", "") == 0.0)
    assert(StringSim.jaroWinkler("", "abc") == 0.0)
    // window = max(2,2)/2 - 1 = 0: only same-position chars match
    assert(StringSim.jaroWinkler("ab", "ba") == 0.0)
    assert(StringSim.jaroWinkler("xy", "zw") == 0.0)
    assert(StringSim.jaroWinkler("a", "a") == 1.0)
  }

  test("the codegen expression equals the JVM kernel and " +
    "null-propagates") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = Vector.tabulate(200) { _ =>
      def w = Vector.fill(rnd.nextInt(12))(
        ('a' + rnd.nextInt(4)).toChar).mkString
      (w, w)
    } :+ (("martha", "marhta"))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        StringSim.jaroWinklerCol(col("a"), col("b")).as("jw"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(2) ==
        StringSim.jaroWinkler(r.getString(0), r.getString(1)),
        s"(${r.getString(0)}, ${r.getString(1)})")
    }
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(StringSim.jaroWinklerCol(col("a"), col("b")).as("jw"))
      .head()
    assert(n.isNullAt(0))
  }
}
