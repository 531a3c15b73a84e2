package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.PlanAudit

/** Recompute-amplification net over the whole oracle corpus (the
  * automated form of the audit that found q_pipeline_modern paying
  * 2.9 s of 3.4 s re-running its PII scrub ~10x per row, and
  * q_pipeline_attrition double-scanning its key build): every
  * query's optimized plan must evaluate each expensive expression
  * subtree (regexes, graft custom kernels, decoders) at most once —
  * persist barriers make the work invisible to the walk, exactly
  * mirroring "computed once however many consumers". Justified
  * exceptions carry their reason next to the allowed count. */
class AuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** query -> (allowed max occurrences of ONE expensive key, why). */
  private val allowance: Map[String, (Int, String)] = Map.empty

  test("no expensive expression is evaluated more than once per " +
    "consumed row in any corpus query (allowance-listed exceptions " +
    "carry their justification)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sf)
        val allowed = allowance.get(name).map(_._1).getOrElse(1)
        val amp = PlanAudit.amplified(df, allowed)
        graft.core.CacheRegistry.drain()
        df.unpersist(blocking = false)
        if (amp.isEmpty) None else Some(s"$name: $amp (allowed $allowed)")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
