package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows (the driver's t1
  * check) and every declared query must have matching oracle SQL. */
class EntrySmokeSpec extends AnyFunSuite {

  test("entry() trains the flagship model and returns posterior rows") {
    val df = SparkEntry.entry(SparkTestSession.spark)
    val rows = df.collect()
    assert(rows.length == 3) // a, b, c posteriors
    assert(rows.forall(r => !r.getDouble(1).isNaN && r.getDouble(2) > 0))
  }

  test("every query has oracle SQL (or is declared rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
