package graft.autodiff

/** Compiled form of a tape: straight-line Java generated at runtime
  * and compiled with Janino (the same compiler Spark's whole-stage
  * codegen uses — already on every Spark classpath). */
trait TapeFn {
  def eval(in: Array[Double], theta: Array[Double],
           draws: Array[Double]): Double
  /** Adds ∂root/∂θ into gradTheta (and ∂root/∂draws into gradDraws if
    * non-null); returns the root value. */
  def evalGrad(in: Array[Double], theta: Array[Double],
               draws: Array[Double], gradTheta: Array[Double],
               gradDraws: Array[Double]): Double
}

/** Janino code generation for [[CompiledExpr]] tapes.
  *
  * The interpreter walks op/child arrays (~6 ns/op with dispatch and
  * array indirection); the generated class is pure SSA locals the JIT
  * vectorizes and registers — typically 3-5× per row, which is the
  * ELBO-training bottleneck. Falls back to the interpreter (returns
  * null) when the tape is too large for a single 64 KB JVM method or
  * compilation fails for any reason; callers must treat null as "use
  * the interpreter". Compiled instances are cached per-process by tape
  * content so per-task deserialization doesn't recompile.
  *
  * The reverse pass only materializes adjoints on the sub-DAG that can
  * reach a [[P]] or [[Dr]] leaf (dead-adjoint pruning): data-only
  * subtrees cost nothing in the backward sweep.
  */
object TapeCodegen {
  import CompiledExpr._

  /** Conservative single-method ceiling (64 KB bytecode limit). Tapes
    * up to this size compile to pure SSA locals (fastest). */
  val MaxOps = 900
  /** Larger tapes compile CHUNKED: helper methods of ≤[[ChunkOps]]
    * ops over ThreadLocal scratch arrays — still no op dispatch, just
    * bounds-checked array slots. Above [[MaxChunkedOps]] we fall back
    * to the interpreter. */
  val ChunkOps = 250
  val MaxChunkedOps = 20000

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private val Missing = new Object

  def cachedCompile(t: CompiledExpr): TapeFn = {
    val key = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bb = java.nio.ByteBuffer.allocate(
        4 * t.ops.length * 3 + 8 * t.consts.length + 4 * t.inIdx.length + 4)
      t.ops.foreach(bb.putInt); t.c0.foreach(bb.putInt); t.c1.foreach(bb.putInt)
      t.consts.foreach(bb.putDouble); t.inIdx.foreach(bb.putInt)
      bb.putInt(t.root)
      java.util.Base64.getEncoder.encodeToString(md.digest(bb.array()))
    }
    val got = cache.computeIfAbsent(key, _ => {
      val fn = tryCompile(t)
      if (fn == null) Missing else fn
    })
    if (got eq Missing) null else got.asInstanceOf[TapeFn]
  }

  private def tryCompile(t: CompiledExpr): TapeFn = {
    if (t.ops.length > MaxChunkedOps) return null
    try {
      val src = if (t.ops.length <= MaxOps) generate(t)
        else generateChunked(t)
      val compiler = new org.codehaus.janino.SimpleCompiler()
      compiler.setParentClassLoader(getClass.getClassLoader)
      compiler.cook(src)
      compiler.getClassLoader.loadClass("graft_gen.Tape")
        .getDeclaredConstructor().newInstance().asInstanceOf[TapeFn]
    } catch { case _: Throwable => null }
  }

  /** Ops whose subtree contains a P or Dr leaf (adjoints needed). */
  private def needsGrad(t: CompiledExpr): Array[Boolean] = {
    val n = t.ops.length
    val need = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      need(i) = (t.ops(i): @annotation.switch) match {
        case OpP | OpDr => true
        case OpConst | OpIn => false
        case _ =>
          (t.c0(i) >= 0 && need(t.c0(i))) || (t.c1(i) >= 0 && need(t.c1(i)))
      }
      i += 1
    }
    need
  }

  private def generate(t: CompiledExpr): String = {
    val sb = new StringBuilder
    val n = t.ops.length
    val need = needsGrad(t)

    def fwd(i: Int): String = {
      val a = if (t.c0(i) >= 0) s"v${t.c0(i)}" else ""
      val b = if (t.c1(i) >= 0) s"v${t.c1(i)}" else ""
      (t.ops(i): @annotation.switch) match {
        case OpConst => s"${jd(t.consts(i))}"
        case OpIn => s"in[${t.inIdx(i)}]"
        case OpP => s"theta[${t.inIdx(i)}]"
        case OpDr => s"draws[${t.inIdx(i)}]"
        case OpAdd => s"$a + $b"
        case OpSub => s"$a - $b"
        case OpMul => s"$a * $b"
        case OpDiv => s"$a / $b"
        case OpNeg => s"-$a"
        case OpExp => s"Math.exp($a)"
        case OpLog => s"Math.log($a)"
        case OpSqrt => s"Math.sqrt($a)"
        case OpAbs => s"Math.abs($a)"
        case OpPow => s"Math.pow($a, ${jd(t.consts(i))})"
        case OpSigmoid => s"1.0 / (1.0 + Math.exp(-$a))"
        case OpSoftplus => s"graft.functions.MathFns.log1pExp($a)"
        case OpTanh => s"Math.tanh($a)"
        case OpRelu => s"Math.max(0.0, $a)"
        case OpLgamma => s"graft.functions.MathFns.lgamma($a)"
        case OpLse2 => s"graft.functions.MathFns.logSumExp2($a, $b)"
        case OpSin => s"Math.sin($a)"
        case OpCos => s"Math.cos($a)"
      }
    }

    def emitForward(): Unit = {
      var i = 0
      while (i < n) { sb.append(s"    double v$i = ${fwd(i)};\n"); i += 1 }
    }

    sb.append("package graft_gen;\n")
    sb.append("public final class Tape implements graft.autodiff.TapeFn {\n")
    sb.append("  public double eval(double[] in, double[] theta, " +
      "double[] draws) {\n")
    emitForward()
    sb.append(s"    return v${t.root};\n  }\n")

    sb.append("  public double evalGrad(double[] in, double[] theta, " +
      "double[] draws, double[] gradTheta, double[] gradDraws) {\n")
    emitForward()
    // adjoint locals only where needed
    var i = 0
    while (i < n) {
      if (need(i))
        sb.append(s"    double a$i = ${if (i == t.root) "1.0" else "0.0"};\n")
      i += 1
    }
    i = n - 1
    while (i >= 0) {
      if (need(i)) {
        val c0 = t.c0(i); val c1 = t.c1(i)
        def n0 = c0 >= 0 && need(c0)
        def n1 = c1 >= 0 && need(c1)
        (t.ops(i): @annotation.switch) match {
          case OpConst | OpIn => ()
          case OpP =>
            sb.append(s"    gradTheta[${t.inIdx(i)}] += a$i;\n")
          case OpDr =>
            sb.append(s"    if (gradDraws != null) " +
              s"gradDraws[${t.inIdx(i)}] += a$i;\n")
          case OpAdd =>
            if (n0) sb.append(s"    a$c0 += a$i;\n")
            if (n1) sb.append(s"    a$c1 += a$i;\n")
          case OpSub =>
            if (n0) sb.append(s"    a$c0 += a$i;\n")
            if (n1) sb.append(s"    a$c1 -= a$i;\n")
          case OpMul =>
            if (n0) sb.append(s"    a$c0 += a$i * v$c1;\n")
            if (n1) sb.append(s"    a$c1 += a$i * v$c0;\n")
          case OpDiv =>
            if (n0) sb.append(s"    a$c0 += a$i / v$c1;\n")
            if (n1) sb.append(
              s"    a$c1 -= a$i * v$c0 / (v$c1 * v$c1);\n")
          case OpNeg => if (n0) sb.append(s"    a$c0 -= a$i;\n")
          case OpExp => if (n0) sb.append(s"    a$c0 += a$i * v$i;\n")
          case OpLog => if (n0) sb.append(s"    a$c0 += a$i / v$c0;\n")
          case OpSqrt =>
            if (n0) sb.append(s"    a$c0 += a$i * 0.5 / v$i;\n")
          case OpAbs =>
            if (n0) sb.append(s"    a$c0 += a$i * Math.signum(v$c0);\n")
          case OpPow => if (n0) sb.append(s"    a$c0 += a$i * " +
            s"${jd(t.consts(i))} * Math.pow(v$c0, ${jd(t.consts(i) - 1.0)});\n")
          case OpSigmoid =>
            if (n0) sb.append(s"    a$c0 += a$i * v$i * (1.0 - v$i);\n")
          case OpSoftplus => if (n0) sb.append(
            s"    a$c0 += a$i / (1.0 + Math.exp(-v$c0));\n")
          case OpTanh =>
            if (n0) sb.append(s"    a$c0 += a$i * (1.0 - v$i * v$i);\n")
          case OpRelu => if (n0) sb.append(
            s"    a$c0 += (v$c0 > 0.0) ? a$i : 0.0;\n")
          case OpLgamma => if (n0) sb.append(
            s"    a$c0 += a$i * graft.functions.MathFns.digamma(v$c0);\n")
          case OpLse2 =>
            if (n0) sb.append(s"    a$c0 += a$i * Math.exp(v$c0 - v$i);\n")
            if (n1) sb.append(s"    a$c1 += a$i * Math.exp(v$c1 - v$i);\n")
          case OpSin =>
            if (n0) sb.append(s"    a$c0 += a$i * Math.cos(v$c0);\n")
          case OpCos =>
            if (n0) sb.append(s"    a$c0 -= a$i * Math.sin(v$c0);\n")
        }
      }
      i -= 1
    }
    sb.append(s"    return v${t.root};\n  }\n}\n")
    sb.toString
  }

  /** Chunked generation for tapes past the single-method limit:
    * forward/backward split into ≤[[ChunkOps]]-op helper methods over
    * `double[]` value/adjoint arrays held in ThreadLocal scratch. */
  private def generateChunked(t: CompiledExpr): String = {
    val sb = new StringBuilder
    val n = t.ops.length
    val need = needsGrad(t)

    def fwdStmt(i: Int): String = {
      def a = s"v[${t.c0(i)}]"
      def b = s"v[${t.c1(i)}]"
      val rhs = (t.ops(i): @annotation.switch) match {
        case OpConst => jd(t.consts(i))
        case OpIn => s"in[${t.inIdx(i)}]"
        case OpP => s"theta[${t.inIdx(i)}]"
        case OpDr => s"draws[${t.inIdx(i)}]"
        case OpAdd => s"$a + $b"
        case OpSub => s"$a - $b"
        case OpMul => s"$a * $b"
        case OpDiv => s"$a / $b"
        case OpNeg => s"-$a"
        case OpExp => s"Math.exp($a)"
        case OpLog => s"Math.log($a)"
        case OpSqrt => s"Math.sqrt($a)"
        case OpAbs => s"Math.abs($a)"
        case OpPow => s"Math.pow($a, ${jd(t.consts(i))})"
        case OpSigmoid => s"1.0 / (1.0 + Math.exp(-$a))"
        case OpSoftplus => s"graft.functions.MathFns.log1pExp($a)"
        case OpTanh => s"Math.tanh($a)"
        case OpRelu => s"Math.max(0.0, $a)"
        case OpLgamma => s"graft.functions.MathFns.lgamma($a)"
        case OpLse2 => s"graft.functions.MathFns.logSumExp2($a, $b)"
        case OpSin => s"Math.sin($a)"
        case OpCos => s"Math.cos($a)"
      }
      s"      v[$i] = $rhs;\n"
    }

    def bwdStmt(i: Int): String = {
      val c0 = t.c0(i); val c1 = t.c1(i)
      def n0 = c0 >= 0 && need(c0)
      def n1 = c1 >= 0 && need(c1)
      val s = new StringBuilder
      (t.ops(i): @annotation.switch) match {
        case OpConst | OpIn => ()
        case OpP => s.append(s"      gradTheta[${t.inIdx(i)}] += a[$i];\n")
        case OpDr => s.append(s"      if (gradDraws != null) " +
          s"gradDraws[${t.inIdx(i)}] += a[$i];\n")
        case OpAdd =>
          if (n0) s.append(s"      a[$c0] += a[$i];\n")
          if (n1) s.append(s"      a[$c1] += a[$i];\n")
        case OpSub =>
          if (n0) s.append(s"      a[$c0] += a[$i];\n")
          if (n1) s.append(s"      a[$c1] -= a[$i];\n")
        case OpMul =>
          if (n0) s.append(s"      a[$c0] += a[$i] * v[$c1];\n")
          if (n1) s.append(s"      a[$c1] += a[$i] * v[$c0];\n")
        case OpDiv =>
          if (n0) s.append(s"      a[$c0] += a[$i] / v[$c1];\n")
          if (n1) s.append(
            s"      a[$c1] -= a[$i] * v[$c0] / (v[$c1] * v[$c1]);\n")
        case OpNeg => if (n0) s.append(s"      a[$c0] -= a[$i];\n")
        case OpExp => if (n0) s.append(s"      a[$c0] += a[$i] * v[$i];\n")
        case OpLog => if (n0) s.append(s"      a[$c0] += a[$i] / v[$c0];\n")
        case OpSqrt =>
          if (n0) s.append(s"      a[$c0] += a[$i] * 0.5 / v[$i];\n")
        case OpAbs => if (n0)
          s.append(s"      a[$c0] += a[$i] * Math.signum(v[$c0]);\n")
        case OpPow => if (n0) s.append(s"      a[$c0] += a[$i] * " +
          s"${jd(t.consts(i))} * Math.pow(v[$c0], ${jd(t.consts(i) - 1.0)});\n")
        case OpSigmoid => if (n0)
          s.append(s"      a[$c0] += a[$i] * v[$i] * (1.0 - v[$i]);\n")
        case OpSoftplus => if (n0) s.append(
          s"      a[$c0] += a[$i] / (1.0 + Math.exp(-v[$c0]));\n")
        case OpTanh => if (n0)
          s.append(s"      a[$c0] += a[$i] * (1.0 - v[$i] * v[$i]);\n")
        case OpRelu => if (n0)
          s.append(s"      a[$c0] += (v[$c0] > 0.0) ? a[$i] : 0.0;\n")
        case OpLgamma => if (n0) s.append(
          s"      a[$c0] += a[$i] * graft.functions.MathFns.digamma(v[$c0]);\n")
        case OpLse2 =>
          if (n0) s.append(s"      a[$c0] += a[$i] * Math.exp(v[$c0] - v[$i]);\n")
          if (n1) s.append(s"      a[$c1] += a[$i] * Math.exp(v[$c1] - v[$i]);\n")
        case OpSin => if (n0)
          s.append(s"      a[$c0] += a[$i] * Math.cos(v[$c0]);\n")
        case OpCos => if (n0)
          s.append(s"      a[$c0] -= a[$i] * Math.sin(v[$c0]);\n")
      }
      s.toString
    }

    sb.append("package graft_gen;\n")
    sb.append("public final class Tape implements graft.autodiff.TapeFn {\n")
    sb.append("  private final ThreadLocal tl = new ThreadLocal();\n")
    sb.append(s"  private double[][] scratch() {\n")
    sb.append("    double[][] s = (double[][]) tl.get();\n")
    sb.append(s"    if (s == null) { s = new double[][] " +
      s"{ new double[$n], new double[$n] }; tl.set(s); }\n")
    sb.append("    return s;\n  }\n")

    val fwdChunks = (0 until n).grouped(ChunkOps).toSeq
    fwdChunks.zipWithIndex.foreach { case (idxs, ci) =>
      sb.append(s"  private void f$ci(double[] in, double[] theta, " +
        "double[] draws, double[] v) {\n")
      sb.append("    {\n")
      idxs.foreach(i => sb.append(fwdStmt(i)))
      sb.append("    }\n  }\n")
    }
    val bwdChunks = (n - 1 to 0 by -1).filter(need).grouped(ChunkOps).toSeq
    bwdChunks.zipWithIndex.foreach { case (idxs, ci) =>
      sb.append(s"  private void b$ci(double[] v, double[] a, " +
        "double[] gradTheta, double[] gradDraws) {\n")
      sb.append("    {\n")
      idxs.foreach(i => sb.append(bwdStmt(i)))
      sb.append("    }\n  }\n")
    }

    sb.append("  public double eval(double[] in, double[] theta, " +
      "double[] draws) {\n")
    sb.append("    double[] v = scratch()[0];\n")
    fwdChunks.indices.foreach(ci =>
      sb.append(s"    f$ci(in, theta, draws, v);\n"))
    sb.append(s"    return v[${t.root}];\n  }\n")

    sb.append("  public double evalGrad(double[] in, double[] theta, " +
      "double[] draws, double[] gradTheta, double[] gradDraws) {\n")
    sb.append("    double[][] s = scratch();\n")
    sb.append("    double[] v = s[0]; double[] a = s[1];\n")
    fwdChunks.indices.foreach(ci =>
      sb.append(s"    f$ci(in, theta, draws, v);\n"))
    sb.append("    java.util.Arrays.fill(a, 0.0);\n")
    sb.append(s"    a[${t.root}] = 1.0;\n")
    bwdChunks.indices.foreach(ci =>
      sb.append(s"    b$ci(v, a, gradTheta, gradDraws);\n"))
    sb.append(s"    return v[${t.root}];\n  }\n}\n")
    sb.toString
  }

  /** Java double literal that round-trips exactly. */
  private def jd(v: Double): String =
    if (v.isNaN) "Double.NaN"
    else if (v.isPosInfinity) "Double.POSITIVE_INFINITY"
    else if (v.isNegInfinity) "Double.NEGATIVE_INFINITY"
    else s"Double.longBitsToDouble(${java.lang.Double.doubleToLongBits(v)}L)"
}
