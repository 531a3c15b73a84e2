package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round timing of the CC fixpoint on the τ=2 entity edge set at
  * sf0.1 — attributes the closure's share of q_dedup_entity_tau2's
  * constant to rounds (scheduling latency vs data). Reuses the
  * Tau2Probe fixture construction. */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("k"), col("c_name"),
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        substring(col("c_name"), 10, 9).as("dg"),
        (col("c_custkey") % 9).cast("int").as("p0"),
        ((col("c_custkey") % 9 + 3) % 9).cast("int").as("p1"))
    def subAt(dgc: org.apache.spark.sql.Column,
              p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(dgc.substr(lit(1), p),
        ((dgc.substr(p + 1, lit(1)).cast("int") + 1) % 10).cast("string"),
        dgc.substr(p + 2, lit(9)))
    def delAt(dgc: org.apache.spark.sql.Column,
              p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(dgc.substr(lit(1), p), dgc.substr(p + 2, lit(9)))
    val sub0 = subAt(col("dg"), col("p0"))
    val dirtyDigits = when(col("k") % 7 === 0, subAt(sub0, col("p1")))
      .when(col("k") % 3 === 1, sub0)
      .when(col("k") % 3 === 2, delAt(col("dg"), col("p0")))
      .otherwise(col("dg"))
    val rec = base.select((col("k") * 2).as("rid"),
        col("c_name").as("name"), col("nat"), col("seg"))
      .unionByName(base.select((col("k") * 2 + 1).as("rid"),
        concat(lit("Customer#"), dirtyDigits).as("name"),
        col("nat"), col("seg")))
      .withColumn("key", substring(col("name"), 10, 10))

    val cand = graft.ops.Entity.candidatePairsSplit2(
      rec, "rid", "key", Seq("nat", "seg"))
    val names = rec.select(col("rid"), col("name"))
    val verified = cand
      .join(names.select(col("rid").as("id_a"), col("name").as("__na")), "id_a")
      .join(names.select(col("rid").as("id_b"), col("name").as("__nb")), "id_b")
      .where(levenshtein(col("__na"), col("__nb")) <= 2)
      .select("id_a", "id_b")

    // materialize the edge list once so the loop timing is pure
    val edges = verified.persist()
    println(s"edges: ${edges.count()}")

    // A/B the two loop bodies (r15): union-find contraction round vs
    // the large-star/small-star pair, alternating so neither form owns
    // the warm JVM; the component MAP must agree exactly between forms
    val impls = Seq("contract", "star", "contract", "star",
      "contract", "star")
    var starHash: Long = Long.MinValue
    impls.zipWithIndex.foreach { case (impl, i) =>
      sys.props("graft.cc.loop") = impl
      val t0 = System.nanoTime()
      val comp = graft.ops.Dedup.ccInstrumented(edges, "id_a", "id_b")
      println(f"cc[$impl] call$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val t1 = System.nanoTime()
      val h = comp.select(xxhash64(col("node"), col("component")).as("hh"))
        .agg(expr("bit_xor(hh)")).collect()(0).getLong(0)
      val n = comp.count()
      println(f"joinback$i: ${(System.nanoTime() - t1) / 1e9}%.3f s " +
        s"(n=$n, maphash=$h)")
      if (starHash == Long.MinValue) starHash = h
      else require(h == starHash, s"component maps differ: $h vs $starHash")
    }
    sys.props.remove("graft.cc.loop")
    spark.stop()
  }
}
