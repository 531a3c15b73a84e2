package graft.core

import org.apache.spark.sql.Dataset

/** Session-lifetime accounting for persisted frames that a query
  * builder cannot unpersist itself (round-10 ADVICE): several query
  * closures persist a narrow projection that the RETURNED frame
  * still reads lazily (selectBudget's base, the modern/winsorize
  * scrub barriers), so unpersisting inside the builder would undo
  * the recompute-amplification fix before the consumer materializes.
  * Left alone, those blocks accumulate across a 227-query bench run
  * and skew later timings — the very contention the guard flags.
  *
  * Builders register such frames via [[track]]; the timing harness
  * mains (Bench, ScaleProbe) call [[drain]] after each query's
  * action completes. Verify deliberately does NOT drain — its 4-way
  * concurrent dump means a drain for one query could unpersist a
  * frame another in-flight query still reads. Ops that consume
  * their persist within their own builder (CC iteration, ELBO
  * minibatch epochs) keep their local unpersist calls and stay out
  * of the registry.
  *
  * NON-HARNESS CALLERS MUST DRAIN: the queue is static and grows
  * unbounded for any long-lived session that keeps invoking
  * track()-using builders (Sampling.selectBudget / topQuantile,
  * Dedup.winnow, …) without calling [[drain]] between query
  * materializations — each tracked frame pins a Dataset reference
  * and its cached blocks until drained. */
object CacheRegistry {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Register a persisted frame for end-of-query release. */
  def track[T](ds: Dataset[T]): Dataset[T] = { frames.add(ds); ds }

  /** Unpersist (non-blocking) everything registered since the last
    * drain; returns how many frames were released. */
  def drain(): Int = {
    var n = 0
    var d = frames.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      n += 1
      d = frames.poll()
    }
    n
  }
}
