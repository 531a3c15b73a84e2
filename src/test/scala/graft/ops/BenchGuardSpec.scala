package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchCompare

/** Unit tests for the de-ratcheted bench guard (round-10 judge ask
  * #3): best-ever minima instead of last-artifact compare, plus the
  * cumulative drift section. Pure logic — no SparkSession. */
class BenchGuardSpec extends AnyFunSuite {

  test("parseQueryTimes extracts q_ keys only") {
    val txt = """{"value":93.7,"queries":{"q_a":1.500,"q_b":0.250,
      "elbo_train_30it":0.086,"rff_gpr_30it":0.120},"q_c":2.000}"""
    val m = BenchCompare.parseQueryTimes(txt)
    assert(m === Map("q_a" -> 1.5, "q_b" -> 0.25, "q_c" -> 2.0))
  }

  test("mergeBest is a per-key minimum with pass-through for new keys") {
    val prior = Map("q_a" -> 1.0, "q_b" -> 0.5)
    val now = Map("q_a" -> 1.4, "q_b" -> 0.3, "q_new" -> 2.0)
    val m = BenchCompare.mergeBest(prior, now)
    assert(m === Map("q_a" -> 1.0, "q_b" -> 0.3, "q_new" -> 2.0))
  }

  test("mergeBest is monotone: repeated contended runs cannot ratchet") {
    // the round-9 failure mode: three successive sub-2x drifts
    val best0 = Map("q_a" -> 1.0)
    val drift1 = Map("q_a" -> 1.8)
    val drift2 = Map("q_a" -> 1.9)
    val b1 = BenchCompare.mergeBest(best0, drift1)
    val b2 = BenchCompare.mergeBest(b1, drift2)
    assert(b2("q_a") === 1.0) // baseline unchanged
    // vs the old last-artifact compare, where 1.9 would pass the 2x
    // guard against 1.8 even though it is 1.9x the true baseline
    assert(!BenchCompare.isContended(1.9, 1.0))
    assert(BenchCompare.isContended(2.1, 1.0))
  }

  test("drift reports cumulative movement excluding contended keys") {
    val best = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 1.0)
    val now = Map("q_a" -> 1.1, "q_b" -> 2.2, "q_c" -> 9.0,
      "q_new" -> 5.0) // q_c contended, q_new has no baseline
    val (b, n, pct) = BenchCompare.drift(best, now, Set("q_c"))
    assert(math.abs(b - 3.0) < 1e-9)
    assert(math.abs(n - 3.3) < 1e-9)
    assert(math.abs(pct - 0.1) < 1e-9)
    assert(pct > 0.05) // the >5% cumulative signal fires
  }

  test("drift on empty common set is zero, not NaN") {
    val (b, n, pct) = BenchCompare.drift(Map.empty, Map("q_a" -> 1.0),
      Set.empty)
    assert(b === 0.0 && n === 0.0 && pct === 0.0)
  }

  test("cross-sf artifacts contribute nothing to the minima (the " +
    "round-10 seeding lesson: an sf0.001 artifact made six sf0.1 " +
    "best-evers physically unreachable)") {
    val small = """{"sf":"/root/testdata/sf0.001","queries":{"q_a":0.010}}"""
    val right = """{"sf":"/root/testdata/sf0.1","queries":{"q_a":0.800}}"""
    val sf = "/root/testdata/sf0.1"
    assert(BenchCompare.parseQueryTimesForSf(small, sf).isEmpty)
    assert(BenchCompare.parseQueryTimesForSf(right, sf) ===
      Map("q_a" -> 0.8))
    // merged guard: with the gate, a 1.2s quiet run is NOT contended
    val best = BenchCompare.mergeBest(
      BenchCompare.parseQueryTimesForSf(small, sf),
      BenchCompare.parseQueryTimesForSf(right, sf))
    assert(!BenchCompare.isContended(1.2, best("q_a")))
    // without it, the 0.01 sf0.001 time would flag everything
    assert(BenchCompare.isContended(1.2,
      BenchCompare.parseQueryTimes(small)("q_a")))
  }
}
