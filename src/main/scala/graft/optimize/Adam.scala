package graft.optimize

/** Adam (Kingma & Ba, 2015) in ASCENT form over a flat parameter
  * vector, with a collection mask for partial optimization (reference
  * optimizes `-loss` with tf.train.AdamOptimizer over a selected
  * collection, `Henbun/model.py:206-230`). Defaults match the
  * reference's usage (lr 0.01 in its tests).
  *
  * `weightDecay > 0` gives AdamW (Loshchilov & Hutter 2019,
  * "Decoupled Weight Decay Regularization"): the decay term
  * −lr·wd·θ is applied OUTSIDE the moment estimates — unlike an
  * L2 penalty folded into the loss, it is not rescaled by 1/√v̂, so
  * regularization strength is independent of gradient magnitude.
  * Decay is configuration, not state: checkpointed (m, v, t)
  * restores are unaffected. */
final class Adam(n: Int, var lr: Double = 0.01, beta1: Double = 0.9,
                 beta2: Double = 0.999, eps: Double = 1e-8,
                 var weightDecay: Double = 0.0) {
  private val m = new Array[Double](n)
  private val v = new Array[Double](n)
  private var t = 0

  /** Optimizer state snapshot/restore — with [[graft.core.Checkpoint]]
    * this makes a training run fully resumable (params + moments +
    * step count), the piece tf.train.Saver checkpoints implicitly via
    * the optimizer's slot variables. */
  def state: (Array[Double], Array[Double], Int) = (m.clone(), v.clone(), t)
  def restore(sm: Array[Double], sv: Array[Double], st: Int): Unit = {
    require(sm.length == n && sv.length == n,
      s"Adam state size ${sm.length} != $n")
    System.arraycopy(sm, 0, m, 0, n)
    System.arraycopy(sv, 0, v, 0, n)
    t = st
  }

  /** One ascent step: θ ← θ + lr·m̂/(√v̂+ε) − lr·wd·θ where grad is
    * ∇ELBO. Slots with mask=false are frozen. */
  def step(theta: Array[Double], grad: Array[Double],
           mask: Array[Boolean]): Unit = {
    t += 1
    val bc1 = 1.0 - math.pow(beta1, t)
    val bc2 = 1.0 - math.pow(beta2, t)
    var i = 0
    while (i < n) {
      if (mask(i)) {
        m(i) = beta1 * m(i) + (1.0 - beta1) * grad(i)
        v(i) = beta2 * v(i) + (1.0 - beta2) * grad(i) * grad(i)
        theta(i) += lr * (m(i) / bc1) / (math.sqrt(v(i) / bc2) + eps) -
          lr * weightDecay * theta(i)
      }
      i += 1
    }
  }
}
