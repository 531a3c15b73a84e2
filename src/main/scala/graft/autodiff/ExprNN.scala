package graft.autodiff

import Expr._

/** Neural-net + LOCAL-variational building blocks on the autodiff AST —
  * the trainable form of amortized inference (reference `Henbun/nn.py`
  * + the LOCAL `Variational.feed` path, `variationals.py:121-129`,
  * `param.py:516-537`).
  *
  * An encoder MLP built here has its weights in the module tree
  * (ordinary Params), so the ELBO engine backpropagates through the
  * encoder into the per-row local posterior — executed row-parallel
  * inside treeAggregate like every other model term.
  */
object ExprNN {

  /** Affine layer y_j = act(Σ_i x_i·W[i,j] + b_j); `w` is the [in,out]
    * weight tensor flattened row-major (a Param read), `b` the bias
    * (reference `MatBias`, `nn.py:10-32`). */
  def dense(x: IndexedSeq[Expr], w: IndexedSeq[Expr], b: IndexedSeq[Expr],
            activation: Expr => Expr = sigmoid): IndexedSeq[Expr] = {
    val in = x.length
    require(w.length % in == 0, s"weight count ${w.length} not divisible by $in")
    val out = w.length / in
    require(b.length == out, s"bias ${b.length} != out $out")
    (0 until out).map { j =>
      val terms = (0 until in).map(i => x(i) * w(i * out + j))
      activation(Expr.sum(terms) + b(j))
    }
  }

  /** MLP chain: `weights`/`biases` per layer, activations per layer
    * (reference `NeuralNet`, `nn.py:34-87`; default all-sigmoid). */
  def mlp(x: IndexedSeq[Expr], weights: Seq[IndexedSeq[Expr]],
          biases: Seq[IndexedSeq[Expr]],
          activations: Seq[Expr => Expr]): IndexedSeq[Expr] = {
    require(weights.length == biases.length &&
      weights.length == activations.length)
    weights.indices.foldLeft(x)((h, l) =>
      dense(h, weights(l), biases(l), activations(l)))
  }

  /** Per-row reparameterized sample of a LOCAL diagonal-Normal
    * posterior: μ + e^{logScale}·ε, where μ/logScale are encoder
    * outputs and ε is a per-row N(0,1) input column (supply it with
    * `randn(seed)` in the DataFrame — fresh per step, replayable). */
  def localNormalSample(mu: Expr, logScale: Expr, eps: Expr): Expr =
    mu + exp(logScale) * eps

  /** Per-row analytic KL(N(μ, e^{2·logScale}) ‖ N(0,1)) — summed over
    * rows by the ELBO data term (the LOCAL analog of the global
    * diagonal-Normal KL; oracle `testing/test_variationals.py:326-347`). */
  def klDiagNormal(mu: Expr, logScale: Expr): Expr = {
    val logdet = c(2.0) * logScale
    c(0.5) * (-logdet - one + exp(logdet) + mu.sq)
  }
}
