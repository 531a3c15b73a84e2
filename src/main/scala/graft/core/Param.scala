package graft.core

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.functions.{Transform, Transforms}

/** Collection tags selecting which parameters an optimizer updates
  * (reference `Henbun/param.py:29-47`; used for partial optimization,
  * `Henbun/model.py:206-221`). */
object Collections {
  val Variables = "variables"
  val Local = "local_variables"
  val Data = "data"
}

/** A trainable global parameter: a dense float tensor living on the
  * DRIVER (parameters are model-sized — KBs — while data is
  * DataFrame-sized; this split is the core 100 TB design stance, SURVEY
  * §7). Stored in FREE space; reads go through `transform`
  * (reference `Henbun/param.py:97-248`).
  *
  * Shape grammar follows the reference (`param.py:157-179`): the full
  * tensor shape is `[*nLayers, *shape]`, stored flat in row-major
  * order with the axes kept as metadata. `nLayers` are leading BATCH
  * axes stacking independent per-layer blocks (layered NN weights,
  * per-expert kernels); the reference's `n_batch` axis maps to the
  * data plane's row axis for LOCAL parameters and to an ordinary
  * `shape` dim for globals. */
final class Param(
    val shape: Seq[Int],
    val transform: Transform = Transforms.Identity,
    val collection: String = Collections.Variables,
    initMean: Double = 0.0,
    initStddev: Double = 1.0,
    rng: scala.util.Random = new scala.util.Random(0),
    val nLayers: Seq[Int] = Nil) extends Node {

  /** Full tensor shape `[*nLayers, *shape]` (reference `param.py:179`). */
  val fullShape: Seq[Int] = nLayers ++ shape
  /** Number of stacked layer blocks (1 when unlayered). */
  val layerCount: Int = nLayers.product
  /** Flat elements per layer block. */
  val layerSize: Int = shape.product

  val size: Int = fullShape.product

  /** Free-space storage (reference keeps tf.Variable in free space and
    * transforms on read, `param.py:211-218`). Init ~ truncated
    * normal(mean, stddev) in CONSTRAINED space, inverse-transformed —
    * mirrors `param.py:202-209` + `assign` semantics. */
  private[core] var free: DenseVector[Double] = {
    val v = DenseVector.fill(size) {
      // truncated normal: redraw outside ±2σ (tf.truncated_normal)
      var d = rng.nextGaussian()
      while (math.abs(d) > 2.0) d = rng.nextGaussian()
      initMean + initStddev * d
    }
    v.map(transform.backward)
  }

  private var staged: Option[DenseVector[Double]] = None

  /** Constrained-space value (reference `Variable.value`,
    * `param.py:268-279`). */
  def value: DenseVector[Double] = free.map(transform.forward)

  /** Stage a constrained-space assignment; applied at the next
    * `initialize()` (reference `Variable.assign`, `param.py:241-248`). */
  def assign(v: DenseVector[Double]): Unit = {
    require(v.length == size,
      s"assign shape mismatch: got ${v.length}, expected $size")
    staged = Some(v.map(transform.backward))
  }

  /** Flush staged assignments (reference `Model.initialize`,
    * `model.py:76-82`). */
  private[core] def initialize(): Unit = {
    staged.foreach(s => free = s)
    staged = None
  }

  def freeValue: DenseVector[Double] = free.copy
  private[graft] def setFree(v: DenseVector[Double]): Unit = {
    require(v.length == size); free = v
  }

  /** Σ log-Jacobian of the transform at the current free value
    * (KL prior-correction term, reference `variationals.py:208`). */
  def logJacobianSum: Double = transform.logJacobianSum(free)

  /** View as matrix for 2-d unlayered shapes (row-major). */
  def asMatrix: DenseMatrix[Double] = {
    require(shape.length == 2 && nLayers.isEmpty, s"asMatrix on $fullShape")
    // breeze is column-major; store row-major => transpose reshape
    new DenseMatrix(shape(1), shape.head, value.toArray).t
  }

  /** Constrained-space value of one layer block, flat. */
  def layerValue(l: Int): DenseVector[Double] = {
    require(l >= 0 && l < layerCount, s"layer $l of $layerCount")
    value(l * layerSize until (l + 1) * layerSize).copy
  }

  /** Layer block as a matrix for 2-d `shape` (row-major). */
  def layerMatrix(l: Int): DenseMatrix[Double] = {
    require(shape.length == 2, s"layerMatrix on shape $shape")
    new DenseMatrix(shape(1), shape.head, layerValue(l).toArray).t
  }

  override def flatten(prefix: String): Seq[(String, Node)] =
    Seq(prefix -> this)
}

/** A node in the named parameter tree (reference `Parentable`,
  * `param.py:49-95`). */
trait Node {
  def flatten(prefix: String): Seq[(String, Node)]
}

/** Container module; children registered with explicit names (the
  * reference derives names by parent introspection, `param.py:49-95`;
  * Scala uses explicit registration — same deterministic tree, no
  * reflection). Reference `Parameterized`, `param.py:316-603`.
  */
class Module extends Node {
  private val children =
    scala.collection.mutable.LinkedHashMap.empty[String, Node]

  protected def register[N <: Node](name: String, node: N): N = {
    require(!children.contains(name), s"duplicate child '$name'")
    children += name -> node
    node
  }

  /** Public registration hook for composing models at call sites. */
  def add[N <: Node](name: String, node: N): N = register(name, node)

  def child(name: String): Node = children(name)

  /** Recursive flatten with slash-separated long names (reference
    * `long_name`, `param.py:83-95`). */
  override def flatten(prefix: String): Seq[(String, Node)] =
    children.toSeq.flatMap { case (n, c) =>
      val p = if (prefix.isEmpty) n else s"$prefix/$n"
      c match {
        case m: Module => m.flatten(p) :+ (p -> (m: Node))
        case other => other.flatten(p)
      }
    }

  /** Children sorted by long name — deterministic parameter order
    * (reference `sorted_variables`, `param.py:455-465`). */
  def sortedParams: Seq[(String, Param)] =
    flatten("").collect { case (n, p: Param) => (n, p) }.sortBy(_._1)

  /** Recursive collection-filtered parameter gather (reference
    * `get_variables`, `param.py:467-485`). Includes the internal params
    * of variational posteriors. */
  def params(collection: String = Collections.Variables): Seq[(String, Param)] =
    sortedParams.filter(_._2.collection == collection)

  /** Apply staged assigns through the whole tree. */
  def initialize(): Unit =
    flatten("").foreach {
      case (_, p: Param) => p.initialize()
      case _ => ()
    }

  /** Σ KL over all variational children (reference `Parameterized.KL`,
    * tree reduction, `param.py:549-560`). `u` supplies the fresh draws
    * keyed by long name (reparameterization inputs). */
  def klSum(draws: Map[String, DenseVector[Double]]): Double =
    flatten("").collect { case (n, v: Variational) =>
      v.klMc(draws.getOrElse(n,
        DenseVector.zeros[Double](v.size)))
    }.sum

  def variationals: Seq[(String, Variational)] =
    flatten("").collect { case (n, v: Variational) => (n, v) }.sortBy(_._1)
}

/** Ordered list container (reference `ParamList`, `param.py:605-674`). */
final class ParamList(nodes: Seq[Node]) extends Node {
  private val items = scala.collection.mutable.ArrayBuffer(nodes: _*)
  def apply(i: Int): Node = items(i)
  def update(i: Int, n: Node): Unit = items(i) = n
  def append(n: Node): Unit = items += n
  def length: Int = items.length
  override def flatten(prefix: String): Seq[(String, Node)] =
    items.zipWithIndex.flatMap { case (n, i) =>
      val p = s"$prefix/$i"
      n match {
        case m: Module => m.flatten(p)
        case other => other.flatten(p)
      }
    }.toSeq
}
