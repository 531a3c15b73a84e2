package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Recompute-amplification audit over a query's optimized plan
  * (round-10 judge ask #1 — automate the check that found 2.6 s of
  * re-scrubbing inside q_pipeline_modern and the q_pipeline_attrition
  * double-scan).
  *
  * The failure mode: an EXPENSIVE per-row expression (a regex chain,
  * a token-hash kernel, a decode) written once in a builder ends up
  * evaluated more than once per consumed row, either because
  * CollapseProject inlines the defining projection into every
  * downstream consumer expression, or because the frame that computes
  * it is consumed by two plan branches without a persist barrier
  * (a logical subplan reused in two branches keeps the SAME exprIds,
  * so the duplicated subtree is semantically identical — whereas two
  * genuine scans of different data get fresh ids and do not collide).
  * Codegen's subexpression elimination is NOT a reliable net here: it
  * is scoped to one operator and bails inside conditionals and
  * higher-order-function lambdas — both measured misses in round 10.
  *
  * [[expensiveCounts]] walks every operator's expression list and
  * counts occurrences of each TOP-MOST expensive subtree, keyed by
  * semantic hash (exprId-sensitive, per the branch argument above).
  * Cached frames appear as InMemoryRelation LEAVES in the optimized
  * plan, so a persist barrier makes the work below it invisible to
  * the walk — exactly mirroring "computed once however many
  * consumers". A query is flagged when any key's count exceeds its
  * allowance (default 1). Known-justified duplicates are allowlisted
  * in AuditSpec with the reason next to the number. */
object PlanAudit {

  /** Expensive = a per-row cost worth a persist barrier: any regex
    * evaluation, or any graft custom kernel (every `graft.*`
    * Expression exists precisely because the work was too heavy for
    * stock operators — hash kernels, decoders, signature builders). */
  def isExpensive(e: Expression): Boolean = {
    val cls = e.getClass.getName
    val simple = e.getClass.getSimpleName
    simple.startsWith("RegExp") || simple == "RLike" ||
      cls.startsWith("graft.")
  }

  /** Stable key for one expensive subtree occurrence: class plus the
    * semantic hash of the canonicalized tree. Same computation over
    * the same input attributes → same key; the same function over a
    * different scan's attributes → different key (legitimate). */
  def keyOf(e: Expression): String =
    e.getClass.getSimpleName + ":" +
      java.lang.Integer.toHexString(e.canonicalized.semanticHash())

  /** Count each top-most expensive subtree across the whole optimized
    * plan (nested expensive nodes inside an already-counted subtree
    * are not double-counted — the outer evaluation pays for them). */
  def expensiveCounts(plan: LogicalPlan): Map[String, Int] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    def walkExpr(e: Expression): Unit =
      if (isExpensive(e)) {
        val k = keyOf(e)
        counts(k) = counts.getOrElse(k, 0) + 1
      } else e.children.foreach(walkExpr)
    plan.foreach { node => node.expressions.foreach(walkExpr) }
    counts.toMap
  }

  /** Keys evaluated more than `allowance` times, with their counts —
    * empty means the plan computes every expensive expression at
    * most once per consumed row. */
  def amplified(df: DataFrame, allowance: Int = 1): Map[String, Int] =
    expensiveCounts(df.queryExecution.optimizedPlan)
      .filter { case (_, n) => n > allowance }
}
