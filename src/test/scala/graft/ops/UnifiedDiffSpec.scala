package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks

/** Unified diff ([[UnifiedDiff]]): LCS edit scripts, hunk grouping with
  * context, the apply round-trip property over randomized edits,
  * context-verified rejection on a drifted base, stats extraction,
  * and insertion-only hunk offset conventions. */
class UnifiedDiffSpec extends AnyFunSuite with TableDrivenPropertyChecks {

  private def rt(a: Vector[String], b: Vector[String],
                 ctx: Int = 3): Unit = {
    val d = UnifiedDiff.build(a, b, ctx)
    assert(UnifiedDiff.apply(a, d).contains(b),
      s"round-trip failed ctx=$ctx\nA=$a\nB=$b\nDIFF=\n$d")
  }

  test("round-trips hand-picked shapes: replace, delete, insert, " +
    "head/tail edits, empty sides, identical files") {
    val base = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    rt(base, base) // identical -> empty diff -> base
    assert(UnifiedDiff.build(base, base).isEmpty)
    rt(base, base.updated(3, "D"))
    rt(base, base.patch(2, Nil, 2)) // delete
    rt(base, base.patch(5, Vector("X", "Y"), 0)) // insert
    rt(base, Vector("NEW") ++ base.tail) // head replace
    rt(base, base.init :+ "LAST") // tail replace
    rt(Vector.empty, base) // create
    rt(base, Vector.empty) // truncate to nothing
    rt(base, Vector("entirely", "different"))
  }

  test("two well-separated edits become two hunks; adjacent edits " +
    "merge into one; stats count them") {
    val a = (1 to 20).map(i => s"line $i").toVector
    val b = a.updated(1, "LINE 2").updated(17, "LINE 18")
    val d = UnifiedDiff.build(a, b)
    assert(UnifiedDiff.stats(d) == UnifiedDiff.Stats(2, 2, 2))
    assert(UnifiedDiff.apply(a, d).contains(b))
    val c = a.updated(9, "LINE 10").updated(10, "LINE 11")
    assert(UnifiedDiff.stats(UnifiedDiff.build(a, c)).hunks == 1)
  }

  test("randomized edit fuzz: apply(build(a, b)) == b across sizes, " +
    "contexts, and edit mixes") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 300) {
      val n = rnd.nextInt(30)
      val a = Vector.tabulate(n)(i => s"w${rnd.nextInt(6)} l$i")
      var b = a
      for (_ <- 0 until rnd.nextInt(6)) {
        val kind = rnd.nextInt(3)
        if (b.isEmpty) b = Vector(s"ins ${rnd.nextInt(99)}")
        else kind match {
          case 0 => b = b.updated(rnd.nextInt(b.length),
            s"rep ${rnd.nextInt(99)}")
          case 1 => b = b.patch(rnd.nextInt(b.length), Nil, 1)
          case 2 => b = b.patch(rnd.nextInt(b.length + 1),
            Vector(s"ins ${rnd.nextInt(99)}"), 0)
        }
      }
      rt(a, b, ctx = rnd.nextInt(4))
    }
  }

  test("a drifted base is REJECTED, not silently corrupted; garbage " +
    "diffs reject; empty diff is identity") {
    val a = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val b = a.updated(3, "D")
    val d = UnifiedDiff.build(a, b)
    assert(UnifiedDiff.apply(a.updated(2, "drifted"), d).isEmpty)
    assert(UnifiedDiff.apply(a.patch(0, Nil, 1), d).isEmpty)
    assert(UnifiedDiff.apply(a, "not a diff at all\n@@ junk\n").isEmpty)
    assert(UnifiedDiff.apply(a, "").contains(a))
  }

  test("insertion-only hunks at context 0 carry the -N,0 convention " +
    "and apply at the right position") {
    val a = Vector("a", "b", "c")
    val b = Vector("a", "b", "X", "c")
    val d = UnifiedDiff.build(a, b, context = 0)
    assert(d.contains("@@ -2,0 +3,1 @@"))
    assert(UnifiedDiff.apply(a, d).contains(b))
    val head = UnifiedDiff.build(a, "H" +: a, context = 0)
    assert(head.contains("@@ -0,0 +1,1 @@"))
    assert(UnifiedDiff.apply(a, head).contains("H" +: a))
  }
}
