package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-session A/B of the r13 vs r14 τ=2 candidate-pair topologies at
  * the 100× entity fixture — regimes are only comparable within one
  * session (the PERF_NOTES host-wave rule). Old = HOF explodes,
  * separate asym + tagged joins; new = kernel explodes, one join. */
object Tau2AB {
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
    def subAt(dgc: Column, p: Column): Column =
      concat(dgc.substr(lit(1), p),
        ((dgc.substr(p + 1, lit(1)).cast("int") + 1) % 10).cast("string"),
        dgc.substr(p + 2, lit(9)))
    def delAt(dgc: Column, p: Column): Column =
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

    // ---- r13 topology (verbatim from commit 94de470), HOF explodes
    def deletionKeysHof(key: Column, k: Int): Column = {
      val L = length(key)
      val d1 = transform(sequence(lit(1), L), i =>
        concat(key.substr(lit(1), i - 1), key.substr(i + 1, L)))
      if (k == 1) concat(array(key), d1)
      else {
        val d2 = when(L >= 2, flatten(
          transform(sequence(lit(1), L - 1), i =>
            transform(sequence(i + 1, L), j =>
              concat(key.substr(lit(1), i - 1),
                key.substr(i + 1, j - i - 1),
                key.substr(j + 1, L))))))
          .otherwise(array().cast("array<string>"))
        array_distinct(concat(array(key), d1, d2))
      }
    }
    def hashedHof(key: Column, k: Int): Column =
      transform(deletionKeysHof(key, k), s => xxhash64(s))
    def oldCand(df: DataFrame): DataFrame = {
      val blockCols = Seq("nat", "seg")
      val keyed = df.where(col("key").isNotNull)
        .select((col("rid") +: blockCols.map(col)) :+
          col("key").as("__key"): _*)
      val joinCols = blockCols :+ "__bk"
      val probe = keyed.select((col("rid").as("__ida") +:
        blockCols.map(col)) :+
        explode(hashedHof(col("__key"), 2)).as("__bk"): _*)
      val index = keyed.select((col("rid").as("__idb") +:
        blockCols.map(col)) :+
        explode(hashedHof(col("__key"), 1)).as("__bk"): _*)
      val delPairs = probe.join(index, joinCols)
        .where(col("__ida") =!= col("__idb"))
        .select(least(col("__ida"), col("__idb")).as("id_a"),
          greatest(col("__ida"), col("__idb")).as("id_b"))
      val L = length(col("__key"))
      val tagged = keyed.select((col("rid") +: blockCols.map(col)) ++ Seq(
        L.as("__len"),
        explode(when(L >= 2, flatten(
          transform(sequence(lit(1), L - 1), i =>
            transform(sequence(i + 1, L), j =>
              xxhash64(i, j,
                concat(col("__key").substr(lit(1), i - 1),
                  col("__key").substr(i + 1, j - i - 1),
                  col("__key").substr(j + 1, L - j)))))))
          .otherwise(array().cast("array<bigint>"))).as("__pj")): _*)
      val tagJoin = blockCols ++ Seq("__len", "__pj")
      val a2 = tagged.select(col("rid").as("__ida") +: tagJoin.map(col): _*)
      val b2 = tagged.select(col("rid").as("__idb") +: tagJoin.map(col): _*)
      val hamPairs = a2.join(b2, tagJoin)
        .where(col("__ida") < col("__idb"))
        .select(col("__ida").as("id_a"), col("__idb").as("id_b"))
      delPairs.unionByName(hamPairs).distinct()
    }

    val runs = sys.env.getOrElse("TAU2_RUNS", "2").toInt
    def time(label: String)(f: => Long): Unit =
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }
    time("old_cand")(oldCand(rec).count())
    time("new_cand")(graft.ops.Entity.candidatePairsSplit2(
      rec, "rid", "key", Seq("nat", "seg")).count())
    spark.stop()
  }
}
