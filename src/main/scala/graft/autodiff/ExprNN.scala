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

  /** Offset-bookkeeping fan-out of an encoder output vector into
    * per-child slices (reference `Parameterized.feed`,
    * `param.py:516-537`: one [..., Σfeed_size] tensor split across
    * children in declaration order). */
  def split(enc: IndexedSeq[Expr], sizes: Seq[Int]): Seq[IndexedSeq[Expr]] = {
    require(sizes.sum == enc.length,
      s"feed sizes ${sizes.sum} != encoder width ${enc.length}")
    val offsets = sizes.scanLeft(0)(_ + _)
    sizes.indices.map(i => enc.slice(offsets(i), offsets(i + 1)))
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

  /** Per-row FULLRANK local posterior sample (SURVEY hard-part (b)):
    * x = μ + tril(L)·ε with `lPacked` the row-major lower-triangle
    * packing (s·(s+1)/2 encoder outputs) and ε per-row N(0,1) input
    * columns. Mirrors the reference's fullrank `_sample`
    * (`variationals.py:141-147`); the diag is raw (unconstrained),
    * logdet = log diag², as upstream. */
  def localFullrankSample(mu: IndexedSeq[Expr], lPacked: IndexedSeq[Expr],
                          eps: IndexedSeq[Expr]): IndexedSeq[Expr] = {
    val s = mu.length
    require(lPacked.length == s * (s + 1) / 2,
      s"need ${s * (s + 1) / 2} packed entries, got ${lPacked.length}")
    require(eps.length == s)
    def lAt(i: Int, j: Int): Expr = lPacked(i * (i + 1) / 2 + j)
    (0 until s).map { i =>
      mu(i) + Expr.sum((0 to i).map(j => lAt(i, j) * eps(j)))
    }
  }

  /** Per-row single-draw MC KL for a fullrank local Normal posterior
    * with unit-Normal prior (the specialized `Normal._KL` form,
    * reference `variationals.py:225-230`):
    * −½Σ(logdet_i + ε_i² − x_i²). */
  def klFullrankNormalMc(lPacked: IndexedSeq[Expr], eps: IndexedSeq[Expr],
                         sample: IndexedSeq[Expr]): Expr = {
    val s = eps.length
    def diag(i: Int): Expr = lPacked(i * (i + 1) / 2 + i)
    Expr.sum((0 until s).map { i =>
      c(-0.5) * (Expr.log(diag(i).sq) + eps(i).sq - sample(i).sq)
    })
  }
}
