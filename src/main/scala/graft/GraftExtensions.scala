package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** SQL surface for the engine's custom Catalyst expressions: installs
  * `lgamma`, `digamma`, `vec_dot`, `vec_l2sq`, `lsh_bucket`,
  * `minhash_sigs`, `simhash16`, `dsir_buckets`, `hash_embed`,
  * `char_entropy`, `script_profile` as SQL functions, so `spark.sql`
  * users get the
  * same codegen'd kernels the DataFrame API uses.
  *
  * Two installation paths, same registry:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection point);
  *  - programmatic: [[GraftExtensions.registerAll]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects 1 argument")
    args.head
  }
  private def two(args: Seq[Expression], name: String)
      : (Expression, Expression) = {
    require(args.length == 2, s"$name expects 2 arguments")
    (args(0), args(1))
  }
  private def intLit(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  /** (identifier, info, builder) triples shared by both install paths. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    // SQL numeric literals arrive as DECIMAL — cast to double like the
    // DataFrame wrappers do
    (FunctionIdentifier("lgamma"),
      info("lgamma", "lgamma(x) - log-gamma function"),
      args => graft.functions.Lgamma(Cast(one(args, "lgamma"), DoubleType))),
    (FunctionIdentifier("digamma"),
      info("digamma", "digamma(x) - digamma function"),
      args => graft.functions.Digamma(Cast(one(args, "digamma"), DoubleType))),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of numeric arrays"),
      args => { val (a, b) = two(args, "vec_dot"); graft.ops.VecDot(a, b) }),
    (FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of arrays"),
      args => { val (a, b) = two(args, "vec_l2sq"); graft.ops.VecL2Sq(a, b) }),
    (FunctionIdentifier("lsh_bucket"),
      info("lsh_bucket",
        "lsh_bucket(emb, nBits, bitOffset) - sign-hyperplane LSH bucket"),
      args => {
        require(args.length == 3, "lsh_bucket expects 3 arguments")
        graft.ops.LshBucketExpr(args(0),
          intLit(args(1), "lsh_bucket nBits"),
          intLit(args(2), "lsh_bucket bitOffset"))
      }),
    (FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs",
        "minhash_sigs(text) - 8-permutation MinHash signature array"),
      args => graft.ops.MinhashSigsExpr(one(args, "minhash_sigs"))),
    (FunctionIdentifier("simhash16"),
      info("simhash16", "simhash16(text) - 16-bit SimHash"),
      args => graft.ops.Simhash16Expr(one(args, "simhash16"))),
    (FunctionIdentifier("dsir_buckets"),
      info("dsir_buckets",
        "dsir_buckets(text, m) - DSIR unigram+bigram feature buckets"),
      args => {
        require(args.length == 2, "dsir_buckets expects 2 arguments")
        graft.ops.DsirBucketsExpr(args(0),
          intLit(args(1), "dsir_buckets m"))
      }),
    (FunctionIdentifier("hash_embed"),
      info("hash_embed",
        "hash_embed(text, d) - signed feature-hashing token-count vector"),
      args => {
        require(args.length == 2, "hash_embed expects 2 arguments")
        graft.ops.HashEmbedExpr(args(0), intLit(args(1), "hash_embed d"))
      }),
    (FunctionIdentifier("char_entropy"),
      info("char_entropy",
        "char_entropy(text) - character-class Shannon entropy (nats)"),
      args => graft.ops.CharEntropyExpr(one(args, "char_entropy"))),
    (FunctionIdentifier("script_profile"),
      info("script_profile",
        "script_profile(text) - Unicode script counts + dominant script"),
      args => graft.ops.ScriptProfileExpr(one(args, "script_profile"))),
    (FunctionIdentifier("ngram_fp_strings"),
      info("ngram_fp_strings",
        "ngram_fp_strings(text, n) - distinct n-gram fingerprints with " +
          "first-occurrence phrases"),
      args => {
        require(args.length == 2, "ngram_fp_strings expects 2 arguments")
        graft.ops.NgramFpStringsExpr(args(0),
          intLit(args(1), "ngram_fp_strings n"))
      }))

  /** Install the function set into a LIVE session's registry (the
    * notebook/test path — no session rebuild needed). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
}
