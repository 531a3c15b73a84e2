package graft

import graft.functions.MathFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface (GraftExtensions): the registered functions must
  * produce the same results as the DataFrame-API kernels. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.registerAll(s)
    s
  }

  test("registered SQL functions match the DataFrame kernels") {
    import spark.implicits._
    val r = spark.sql(
      "SELECT lgamma(4.5) AS lg, digamma(4.5) AS dg, " +
        "vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d, " +
        "vec_l2sq(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS l2, " +
        "minhash_sigs('the quick brown fox') AS mh, " +
        "simhash16('the quick brown fox') AS sh, " +
        "dsir_buckets('the quick brown fox', 256) AS db, " +
        "hash_embed('the quick brown fox', 64) AS he").head()
    assert(r.getAs[Double]("lg") == MathFns.lgamma(4.5))
    assert(r.getAs[Double]("dg") == MathFns.digamma(4.5))
    assert(r.getAs[Double]("d") == 32.0)
    assert(r.getAs[Double]("l2") == 25.0)
    // SQL results equal the DataFrame-API expressions on the same input
    val df = Seq("the quick brown fox").toDF("text")
    val want = df.select(
      graft.ops.TextHashExpressions.minhashSigs(col("text")).as("mh"),
      graft.ops.TextHashExpressions.simhash16(col("text")).as("sh"),
      graft.ops.TextHashExpressions.dsirBuckets(col("text"), 256).as("db"),
      graft.ops.TextHashExpressions.hashEmbed(col("text"), 64).as("he"))
      .head()
    assert(r.getSeq[Long](r.fieldIndex("mh")) ==
      want.getSeq[Long](0))
    assert(r.getAs[Long]("sh") == want.getLong(1))
    assert(r.getSeq[Long](r.fieldIndex("db")) == want.getSeq[Long](2))
    assert(r.getSeq[Long](r.fieldIndex("he")) == want.getSeq[Long](3))
  }

  test("char_entropy and script_profile SQL functions match their " +
    "DataFrame kernels") {
    import spark.implicits._
    val r = spark.sql(
      "SELECT char_entropy('the quick brown fox') AS ce, " +
        "script_profile('hello мир 你好 123') AS sp").head()
    val want = Seq(("the quick brown fox", "hello мир 你好 123"))
      .toDF("a", "b")
      .select(
        graft.ops.TextHashExpressions.charEntropy(col("a")).as("ce"),
        graft.ops.TextHashExpressions.scriptProfile(col("b")).as("sp"))
      .head()
    assert(r.getAs[Double]("ce") == want.getDouble(0))
    assert(r.getStruct(r.fieldIndex("sp")) == want.getStruct(1))
  }

  test("lsh_bucket SQL function matches the DataFrame kernel over real " +
    "embeddings") {
    val embDf = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    embDf.createOrReplaceTempView("emb_ext_test")
    val viaSql = spark.sql(
      "SELECT vec_id, lsh_bucket(embedding, 8, 0) AS b FROM emb_ext_test")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = graft.ops.Similarity
      .lshBuckets(embDf, "vec_id", "embedding", 8)
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaDf)
  }

  test("the SparkSessionExtensions injection path installs the same set") {
    import org.apache.spark.sql.SparkSession
    val prior = spark // ensure the shared session/context exists
    // getOrCreate returns the active session unless cleared — clear so
    // a genuinely NEW session (same SparkContext, fresh session state
    // built through the extensions hook) is constructed
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the injection hook that works when the
      // SparkContext already exists; the `spark.sql.extensions=
      // graft.GraftExtensions` conf drives the SAME class on a fresh
      // cluster (static conf — read from the context at creation)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne prior, "builder returned the existing session — " +
        "extensions path not exercised")
      val got = s2.sql("SELECT lgamma(3.0) AS lg").head().getDouble(0)
      assert(got == MathFns.lgamma(3.0))
      val mh = s2.sql("SELECT minhash_sigs('a b') AS m").head().getSeq[Long](0)
      assert(mh.length == graft.ops.Dedup.NumPerms)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
