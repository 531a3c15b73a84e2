package graft.streaming

import graft.SparkTestSession
import graft.functions.Densities
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming == batch equivalence: the watermarked windowed density
  * aggregation over the events table must produce the same totals as
  * the equivalent batch query; stateful running stats must match a
  * driver-side fold. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("windowed density aggregation: streaming equals batch") {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the testdata ships single parquet FILES; the file-stream source
    // wants a directory, so stream the sf dir filtered to the one file
    // (ts normalized to epoch-nanos, same as the batch loader)
    val stream = graft.ops.Events.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val logp = Densities.laplace(lit(100.0), lit(50.0), col("value"))
    val out = StreamingOps.densityWindowAgg(stream, col("ts"), logp,
      col("event_type"), watermark = "1 hour", windowLen = "6 hours")
    // Complete mode so the trailing windows (which the watermark would
    // hold in state awaiting later data) are visible at end-of-stream
    StreamingOps.runToMemorySink(out, "win_agg",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val got = spark.table("win_agg")
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("sum_logp").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    val want = graft.ops.Events.load(spark, s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(logp).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    // totals agree to 1e-6 (different add orders)
    val gm = got.map(t => t._1 -> t._3).toMap
    want.foreach { case (k, _, s) =>
      assert(math.abs(gm(k) - s) <= 1, s"$k")
    }
  }

  test("streaming PQ encode + coarse cell assignment (stateless maps) " +
    "equal the batch path row for row") {
    import graft.ops.{Pq, Similarity}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = Pq.codebooksFromFirst(e, "vec_id", "embedding", m = 4, ksub = 8)
    val cents = Similarity.collectCentroids(
      e.orderBy("vec_id").limit(16)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    val stream = spark.readStream.schema(e.schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
    val out = stream.select(col("vec_id"),
      Pq.encodeCol(col("embedding"), cb).as("code"),
      Similarity.nearestCentroid(col("embedding"), cents)
        .getField("c").as("cell"))
    StreamingOps.runToMemorySink(out, "pq_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("pq_stream").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    val want = Pq.encode(e, "vec_id", "embedding", cb)
      .withColumn("cell", Similarity.nearestCentroid(col("embedding"), cents)
        .getField("c"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("streaming JL projection + group-split + k-fold assignment (stateless " +
    "maps) equal the batch path row for row") {
    import graft.ops.{Sampling, Similarity}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val m = Similarity.signProjection(64, 16)
    val stream = spark.readStream.schema(e.schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
    val out = Sampling.groupKFold(Sampling.groupSplit(
      stream.select(col("vec_id"), col("label"),
        Similarity.jlProject(col("embedding"), m).as("y")),
      "label", 0.2, 0.2), "label", 4)
    StreamingOps.runToMemorySink(out, "rp_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("rp_stream").collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Double](2), r.getString(3), r.getLong(4)))).toMap
    val want = Sampling.groupKFold(Sampling.groupSplit(
        e.select(col("vec_id"), col("label"),
          Similarity.jlProject(col("embedding"), m).as("y")),
        "label", 0.2, 0.2), "label", 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Double](2), r.getString(3), r.getLong(4)))).toMap
    assert(got == want)
  }

  test("streaming RFF feature map + kernel estimate (stateless maps) " +
    "equal the batch path row for row") {
    import breeze.linalg.DenseVector
    import graft.gp.Rff
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val (w, b) = Rff.frequencies(64, 8, DenseVector(4.0), seed = 21L)
    val q = Seq.tabulate(64)(k => 0.25 * (k % 5 - 2.0))
    val stream = spark.readStream.schema(e.schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
    val out = stream.select(col("vec_id"),
      Rff.featuresCol(col("embedding"), w, b).as("phi"),
      Rff.khatCol(col("embedding"), q, w, b).as("khat"))
    StreamingOps.runToMemorySink(out, "rff_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("rff_stream").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Double](1), r.getDouble(2)))).toMap
    val want = e.select(col("vec_id"),
        Rff.featuresCol(col("embedding"), w, b).as("phi"),
        Rff.khatCol(col("embedding"), q, w, b).as("khat"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Double](1), r.getDouble(2)))).toMap
    assert(got == want)
  }

  test("streaming chunking, DSIR weighting, and classifier scoring " +
    "(stateless maps) equal the batch path row for row") {
    import graft.ops.{Dsir, QualityClassifier, TextAnalysis}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ratios = Array.tabulate(Dsir.NumBuckets)(b => (b % 11) * 0.02 - 0.1)
    val w = Array(-2.0, 1.5, 8.0, -3.0, 0.5)
    def attach(df: org.apache.spark.sql.DataFrame) = {
      val chunked = TextAnalysis.chunks(df, "text", "doc_id", 16, 12)
      val weighted = Dsir.importanceWeights(
        QualityClassifier.withFeatures(df, "text")
          .withColumn("score", QualityClassifier.score(w)),
        "text", ratios)
        .select("doc_id", "score", "log_w")
      (chunked, weighted)
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val (chS, wS) = attach(stream)
    StreamingOps.runToMemorySink(chS, "chunks_stream")
    StreamingOps.runToMemorySink(wS, "weights_stream")
    val (chB, wB) = attach(docs)
    val gotCh = spark.table("chunks_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    val wantCh = chB.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    assert(gotCh == wantCh, "chunking must be identical on a stream")
    val gotW = spark.table("weights_stream").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val wantW = wB.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(gotW == wantW, "weights/scores must be identical on a stream")
  }

  test("streaming C4 cleaning + script profiling (stateless maps) " +
    "equal the batch path row for row") {
    import graft.ops.{TextAnalysis, TextHashExpressions}
    val d0 = spark.read.parquet(s"$dir/documents.parquet")
    val stream = spark.readStream.schema(d0.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextAnalysis.c4Flags(col("text")).getField("keep").as("keep"),
        TextHashExpressions.scriptProfile(col("text"))
          .getField("dominant").as("dom"))
    StreamingOps.runToMemorySink(shape(stream), "c4_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("c4_stream").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    val want = shape(d0).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got == want)
  }

  test("streaming bloom prefilter (stateless map) equals the batch " +
    "probe row for row") {
    import graft.ops.{Bloom, Dedup}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val corpusSigs = Dedup.minhashSignatures(corpus, "text", "doc_id")
      .select((0 until Dedup.NumPerms).map(i => col(s"sig$i")): _*)
      .distinct()
    val bits = Bloom.build(corpusSigs.select(Dedup.sigKey().as("k")),
      "k", 1 << 14, 5)
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val out = StreamingOps.bloomPrefilter(stream, "text", "doc_id",
      bits, 1 << 14, 5)
      .select("doc_id", "bloom_new")
    StreamingOps.runToMemorySink(out, "bloom_pre")
    val got = spark.table("bloom_pre").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val want = StreamingOps.bloomPrefilter(docs, "text", "doc_id",
      bits, 1 << 14, 5)
      .select("doc_id", "bloom_new").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == want)
    // corpus docs can never be bloom-proven new
    val corpusIds = corpus.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(corpusIds.forall(id => !got.getOrElse(id, false)))
  }

  test("streaming perplexity scoring equals the batch scorer") {
    import graft.ops.NgramLm
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lm = NgramLm.train(docs, "text", "doc_id")
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val nBatches = StreamingOps.streamingPerplexity(stream, "text",
      "doc_id", lm) { scored =>
      buf ++= scored.collect().map(r => (r.getLong(0), r.getDouble(2)))
      ()
    }
    assert(nBatches >= 1)
    val want = NgramLm.perplexity(docs, "text", "doc_id", lm)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val got = buf.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, nll) =>
      assert(math.abs(nll - want(id)) < 1e-9, s"doc $id") }
  }

  test("stateful running logp stats match a driver fold") {
    import spark.implicits._
    val rows = graft.ops.Events.load(spark, s"$dir/events.parquet")
      .select(col("event_type"),
        Densities.laplace(lit(100.0), lit(50.0), col("value")).as("lp"))
      .as[(String, Double)].collect().toSeq
    val ds = rows.toDS()
    val got = StreamingOps.runningLogpStats(ds)
      .collect().map(s => s.key -> s).toMap
    val want = rows.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._2).sum)
    }
    want.foreach { case (k, (n, s)) =>
      assert(got(k).n == n)
      assert(math.abs(got(k).sumLogp - s) < 1e-6 * math.max(1.0, math.abs(s)))
    }
  }

  test("streaming signature dedup keeps one doc per MinHash signature") {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .withColumn("event_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val out = StreamingOps.signatureDedup(stream, "text", "doc_id",
      "event_ts", watermark = "1 hour")
    StreamingOps.runToMemorySink(out, "sig_dedup")
    val got = spark.table("sig_dedup").count()
    val batch = graft.ops.Dedup.minhashSignatures(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
      .select((0 until graft.ops.Dedup.NumPerms).map(i => col(s"sig$i")): _*)
      .distinct().count()
    assert(got == batch,
      s"streaming kept $got docs, batch has $batch distinct signatures")
    assert(got > 0)
  }

  test("streaming per-key EWMA fed time-ordered micro-batches equals " +
    "the batch secondary-sort fold bit for bit") {
    import spark.implicits._
    import graft.ops.Events
    val ev = graft.ops.Events.load(spark, s"$dir/events.parquet")
    val want = Events.ewma(ev, "user_id", "ts", "event_id", "value", 0.3)
      .select("event_id", "ewma", "forecast").collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // slice the table into 3 event-time-ordered files: recurrence
    // state must carry across micro-batch boundaries
    val rows = ev.select(col("user_id"), col("ts"), col("event_id"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._2, r._3))
    val tmp = java.nio.file.Files
      .createTempDirectory("ewma_stream").toFile
    tmp.deleteOnExit()
    val slices = rows.grouped((rows.length + 2) / 3).toSeq
    slices.zipWithIndex.foreach { case (s, i) =>
      val p = new java.io.File(tmp, s"slice$i")
      s.toSeq.toDF("user_id", "ts", "event_id", "value")
        .coalesce(1).write.parquet(p.toString)
      // file-source processes by modification time: force slice order
      p.listFiles().foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(slices.head.toSeq.toDF("user_id", "ts", "event_id", "value")
        .schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
      .as[(Long, Long, Long, Double)]
    val out = StreamingOps.ewmaPerKey(stream, 0.3)
      .toDF("key", "seq", "v", "ewma", "forecast")
    StreamingOps.runToMemorySink(out, "ewma_stream")
    val got = spark.table("ewma_stream")
      .select("seq", "ewma", "forecast").collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got.size == want.size, s"${got.size} vs ${want.size} rows")
    want.foreach { case (id, (e, fc)) =>
      assert(got(id) == ((e, fc)), s"event $id: ${got(id)} != ${(e, fc)}")
    }
  }

  test("streaming per-key CUSUM fed time-ordered micro-batches equals " +
    "the batch clamped-drift fold bit for bit") {
    import spark.implicits._
    import graft.ops.Events
    val ev = graft.ops.Events.load(spark, s"$dir/events.parquet")
    val want = Events.cusum(ev, "user_id", "ts", "event_id", "value",
        50.0, 25.0)
      .select("event_id", "cusum_hi", "cusum_lo").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val rows = ev.select(col("user_id"), col("ts"), col("event_id"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._2, r._3))
    val tmp = java.nio.file.Files
      .createTempDirectory("cusum_stream").toFile
    tmp.deleteOnExit()
    val slices = rows.grouped((rows.length + 2) / 3).toSeq
    slices.zipWithIndex.foreach { case (s, i) =>
      val p = new java.io.File(tmp, s"slice$i")
      s.toSeq.toDF("user_id", "ts", "event_id", "value")
        .coalesce(1).write.parquet(p.toString)
      p.listFiles().foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(slices.head.toSeq.toDF("user_id", "ts", "event_id", "value")
        .schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
      .as[(Long, Long, Long, Double)]
    val out = StreamingOps.cusumPerKey(stream, 50.0, 25.0)
      .toDF("key", "seq", "v", "hi", "lo")
    StreamingOps.runToMemorySink(out, "cusum_stream")
    val got = spark.table("cusum_stream")
      .select("seq", "hi", "lo").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.size == want.size, s"${got.size} vs ${want.size} rows")
    want.foreach { case (id, hl) =>
      assert(got(id) == hl, s"event $id: ${got(id)} != $hl")
    }
  }

  test("streaming sessionization emits exactly the batch sessions the " +
    "watermark has closed, and never an open one") {
    val gap = graft.EventQueries.SessionGapNanos
    val evRaw = spark.read.parquet(s"$dir/events.parquet")
    val ev = graft.ops.Events.normalizeTs(evRaw)
    val stream = graft.ops.Events.normalizeTs(
      spark.readStream.schema(evRaw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val out = StreamingOps.sessionizeStream(stream, "user_id", "ts", gap)
    StreamingOps.runToMemorySink(out.toDF(), "sessions")
    val got = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // batch truth: sessions strictly closed by the final watermark
    // (end + gap below the watermark millisecond in exact nanos);
    // the per-key trailing session stays open and must NOT be emitted
    val sess = graft.ops.Events.sessionize(ev, "user_id", "ts",
      "event_id", gap)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"),
        count(lit(1)).as("n"))
    val maxTsMs = ev.agg(max(col("ts"))).head().getLong(0) / 1000000L
    val want = sess.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .filter { case (_, _, e, _) => e + gap < maxTsMs * 1000000L }
      .toSet
    assert(want.nonEmpty, "fixture should close some sessions")
    assert(got == want,
      s"streaming sessions ${got.size} != closed batch sessions ${want.size}")
  }

  test("streaming funnel emits exactly the batch conversions whose " +
    "last step is watermark-final") {
    import spark.implicits._
    val evRaw = spark.read.parquet(s"$dir/events.parquet")
    val ev = graft.ops.Events.normalizeTs(evRaw)
    val stepOf = when(col("event_type") === "view", 0)
      .when(col("event_type") === "click", 1)
      .when(col("event_type") === "purchase", 2).otherwise(-1)
    val stream = graft.ops.Events.normalizeTs(
        spark.readStream.schema(evRaw.schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
      .select(col("user_id"), col("ts"), stepOf.as("step"))
    val out = StreamingOps.funnelStream(stream, "user_id", "ts", "step", 3)
    StreamingOps.runToMemorySink(out.toDF(), "funnel_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("funnel_stream").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // batch truth over the SAME final-event set: conversions whose
    // purchase step lies strictly below the final watermark
    val f = graft.ops.Events.funnel(ev, "user_id", "ts", Seq(
      col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase"))
    val wmNs = (ev.agg(max(col("ts"))).head().getLong(0) / 1000000L) *
      1000000L
    val want = f.where(col("t3").isNotNull && col("t3") < wmNs)
      .collect().map(r => r.getLong(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(want.nonEmpty, "fixture should complete some funnels")
    assert(got == want,
      s"streaming conversions ${got.size} != batch ${want.size}")
  }

  test("streaming per-key HLL cardinality equals the batch grouped " +
    "sketch bit for bit") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .as[(String, String)]
    val out = StreamingOps.streamingHllCardinality(stream)
    StreamingOps.runToMemorySink(out.toDF(), "hll_stream",
      org.apache.spark.sql.streaming.OutputMode.Update())
    val got = spark.table("hll_stream").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2),
        r.getLong(3))).toMap
    val want = graft.ops.Sketches.hllCardinalityBy(
        docs.select(col("source"),
          explode(split(col("text"), " ")).as("tok")),
        col("source"), col("tok")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got == want, "streaming registers must equal batch registers")
    assert(want.nonEmpty)
  }

  test("streaming as-of join: every watermark-final left row carries " +
    "exactly the batch as-of match, and nothing extra is emitted") {
    val evRaw = spark.read.parquet(s"$dir/events.parquet")
    val ev = graft.ops.Events.normalizeTs(evRaw)
    def stream = graft.ops.Events.normalizeTs(
      spark.readStream.schema(evRaw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val out = StreamingOps.asofJoinStream(
      stream.where(col("event_type") =!= "purchase"),
      stream.where(col("event_type") === "purchase"),
      "user_id", "ts", "event_id", "value")
    StreamingOps.runToMemorySink(out.toDF(), "asof_stream")
    val got = spark.table("asof_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val batch = graft.ops.Events.asofJoin(
        ev.where(col("event_type") =!= "purchase")
          .select("event_id", "user_id", "ts", "value"),
        ev.where(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", Seq("event_id"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(0)) ->
        ((if (r.isNullAt(4)) None else Some(r.getLong(4))), r.getLong(2)))
      .toMap
    // emitted rows must agree with the batch match exactly
    got.foreach { case (k, m) =>
      assert(batch.contains(k), s"spurious emission $k")
      assert(batch(k)._1 == m, s"row $k: stream $m vs batch ${batch(k)._1}")
    }
    // completeness: all but the boundary sliver (within 2 ms of the
    // final watermark, where ns→ms truncation is ambiguous) emitted
    val maxTs = ev.agg(max(col("ts"))).head().getLong(0)
    val mustEmit = batch.filter { case (_, (_, ts)) =>
      ts < maxTs - 2000000L }
    mustEmit.keys.foreach { k =>
      assert(got.contains(k), s"final left row $k never emitted")
    }
    assert(mustEmit.nonEmpty && got.size >= mustEmit.size)
  }

  test("as-of idleRetention: a pending-drain timeout does NOT evict " +
    "the version store — a later left still matches; eviction waits " +
    "for real idleness") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("asofidle").toFile
    tmp.deleteOnExit()
    val sec = 1000000000L
    def write(name: String, rows: Seq[(Long, Long, Long, Double, Int)]): Unit =
      rows.toDF("user_id", "ts", "event_id", "value", "is_left")
        .repartition(1).write.parquet(s"$tmp/$name")
    // batch 1: key 1 gets a right version @100s and a left @200s that
    // must buffer (not yet final); key 99 is the watermark clock
    write("b1", Seq((1L, 100 * sec, 1L, 10.0, 0), (1L, 200 * sec, 2L, 0.0, 1),
      (99L, 200 * sec, 90L, 0.0, 1)))
    val schema = spark.read.parquet(s"$tmp/b1").schema
    def stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(s"$tmp/*")
    val out = StreamingOps.asofJoinStream(
      stream.where(col("is_left") === 1),
      stream.where(col("is_left") === 0),
      "user_id", "ts", "event_id", "value",
      idleRetention = Some(3600000L)) // 1h of event time
    val q = out.toDF().writeStream.format("memory")
      .queryName("asof_idle").start()
    try {
      q.processAllAvailable()
      // clock-only batches: advance the watermark so key 1's pending
      // left drains via its TIMEOUT (no new key-1 rows in either)
      write("b2", Seq((99L, 400 * sec, 91L, 0.0, 1)))
      q.processAllAvailable()
      write("b3", Seq((99L, 500 * sec, 92L, 0.0, 1)))
      q.processAllAvailable()
      // a later left for key 1, ABOVE the current watermark (a left
      // below it would be dropped as late before reaching the state
      // function): the right @100s must still be in the store
      write("b4", Seq((1L, 650 * sec, 3L, 0.0, 1),
        (99L, 660 * sec, 93L, 0.0, 1)))
      q.processAllAvailable()
      write("b5", Seq((99L, 800 * sec, 94L, 0.0, 1)))
      q.processAllAvailable()
      write("b6", Seq((99L, 900 * sec, 95L, 0.0, 1)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_idle").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got.get(2L).contains(Some(1L)),
      s"timeout-drained left must match right@100s: $got")
    assert(got.get(3L).contains(Some(1L)),
      "post-drain left must STILL match — the drain timeout must not " +
        s"evict the version store before idleRetention elapses: $got")
  }

  test("streaming k-means online mode never drops centroids absent " +
    "from early batches (seed fallback keeps every cell assignable)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmstream").toFile
    tmp.deleteOnExit()
    def write(name: String, pts: Seq[(Long, Seq[Double])]): Unit =
      pts.toDF("id", "emb").repartition(1).write.parquet(s"$tmp/$name")
    // first file: points near cell 0 ONLY; second near cell 1
    write("a", (1L to 4L).map(i => (i, Seq(0.1 * i, 0.0))))
    Thread.sleep(1100) // distinct mod-time → deterministic trigger order
    write("b", (5L to 8L).map(i => (i, Seq(10.0 + 0.1 * i, 10.0))))
    val schema = spark.read.parquet(s"$tmp/a").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/*")
    val init = Array(0L -> Seq(0.0, 0.0), 1L -> Seq(10.0, 10.0))
    val (cents, counts, nBatches) = StreamingOps.streamingKmeans(
      stream, "id", "emb", init, updateCentroids = true)
    assert(nBatches >= 2, s"expected >=2 micro-batches, got $nBatches")
    assert(cents.length == 2,
      s"online mode must keep every init cell: ${cents.toSeq}")
    // the late cluster's points must land in cell 1 (possible only if
    // cell 1 survived the first batch via the seed fallback)
    assert(counts.getOrElse(1L, 0L) == 4L, s"counts: $counts")
    assert(counts.getOrElse(0L, 0L) == 4L, s"counts: $counts")
    val c1 = cents.find(_._1 == 1L).get._2
    assert(math.abs(c1.head - 10.65) < 1e-6 && math.abs(c1(1) - 10.0) < 1e-6,
      s"cell-1 centroid should be the b-file mean: $c1")
  }

  test("streamingKmeans returns a seed cell NO micro-batch ever hit — " +
    "seed centroid, count 0 (the return matches the in-stream " +
    "fallback merge, not just the data-bearing state map)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmstream3").toFile
    tmp.deleteOnExit()
    (1L to 6L).map(i => (i, Seq(0.1 * i, 0.0))).toDF("id", "emb")
      .repartition(1).write.parquet(s"$tmp/a")
    val schema = spark.read.parquet(s"$tmp/a").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/*")
    // cell 2 is far from every point: no batch ever assigns to it
    val init = Array(0L -> Seq(0.0, 0.0), 1L -> Seq(1.0, 0.0),
      2L -> Seq(500.0, 500.0))
    val (cents, counts, _) = StreamingOps.streamingKmeans(
      stream, "id", "emb", init, updateCentroids = true)
    assert(cents.length == 3,
      s"unhit seed cell dropped from the returned model: ${cents.toSeq}")
    assert(cents.find(_._1 == 2L).get._2 == Seq(500.0, 500.0),
      s"unhit cell must return its seed centroid: ${cents.toSeq}")
    assert(counts(2L) == 0L && counts.values.sum == 6L, s"$counts")
  }

  test("statefulFirstPerKey (flatMapGroupsWithState) emits exactly the " +
    "first row per key") {
    import spark.implicits._
    // duplicate-heavy keyed stream: doc source as key, doc id payload
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id").cast("string"))
      .as[(String, String)].collect().toSeq
    val out = StreamingOps.statefulFirstPerKey(rows.toDS())
      .collect()
    // exactly one emission per key, and the payload belongs to the key
    // (shuffle order within a group is engine-chosen, so "first" is
    // per-arrival, not per-source-order)
    assert(out.length == rows.map(_._1).distinct.length)
    val byKey = rows.groupBy(_._1)
    out.foreach { case (k, v) =>
      assert(byKey(k).exists(_._2 == v), s"payload $v not from key $k")
    }
  }

  test("streaming no-split packer fed id-ordered micro-batches equals " +
    "the batch packer bin for bin (walk state carries across batches)") {
    import spark.implicits._
    val W = 64
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val want = graft.ops.Sampling.packNoSplit(d, "doc_id", "text", W, 3)
      .select("doc_id", "shard", "t", "bin", "truncated").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // slice the corpus into 3 id-ordered files: the (bin, fill) state
    // must continue each shard's walk across micro-batch boundaries
    val rows = d.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val tmp = java.nio.file.Files
      .createTempDirectory("pack_stream").toFile
    tmp.deleteOnExit()
    val slices = rows.grouped((rows.length + 2) / 3).toSeq
    slices.zipWithIndex.foreach { case (s, i) =>
      val p = new java.io.File(tmp, s"slice$i")
      s.toSeq.toDF("doc_id", "text").coalesce(1).write.parquet(p.toString)
      p.listFiles().foreach(f =>
        f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(slices.head.toSeq.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val out = StreamingOps.packNoSplitStream(stream, "doc_id", "text",
        W, 3)
      .toDF("shard", "doc_id", "n_tokens", "t", "bin", "truncated")
    StreamingOps.runToMemorySink(out, "pack_stream")
    val got = spark.table("pack_stream")
      .select("doc_id", "shard", "t", "bin", "truncated").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got.size == want.size, s"${got.size} vs ${want.size} rows")
    assert(got == want, "stream and batch packing must agree")
    assert(want.nonEmpty)
  }

  test("streaming cluster assignment against a fixed archive equals " +
    "the batch assignment doc-for-doc under arbitrary slicing") {
    import spark.implicits._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val draw = graft.ops.Sampling.hashFraction(col("doc_id"))
    val archive = d.where(draw < 0.8)
    val batch = d.where(draw >= 0.8)
    val want = graft.ops.Dedup
      .assignToClusters(batch, archive, "text", "doc_id", maxBucket = 50)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    val rows = batch.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val tmp = java.nio.file.Files
      .createTempDirectory("asn_stream").toFile
    tmp.deleteOnExit()
    val slices = rows.grouped((rows.length + 2) / 3).toSeq
    slices.zipWithIndex.foreach { case (sl, i) =>
      val p = new java.io.File(tmp, s"slice$i")
      sl.toSeq.toDF("doc_id", "text").coalesce(1).write.parquet(p.toString)
      p.listFiles().foreach(f =>
        f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(slices.head.toSeq.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val got = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
    val nb = StreamingOps.assignToClustersStream(stream, archive,
        "text", "doc_id", maxBucket = 50) { out =>
      out.collect().foreach(r =>
        got(r.getLong(0)) = (r.getLong(1), r.getBoolean(2)))
    }
    assert(nb >= 3, s"expected >= 3 micro-batches, got $nb")
    assert(got.toMap == want, s"${got.size} vs ${want.size}")
    assert(want.nonEmpty && want.values.exists(_._2),
      "fixture should adopt at least one archive cluster")
  }

  test("streaming unimax realization with pre-fitted factors equals " +
    "the batch realization (doc, epoch) for (doc, epoch)") {
    import spark.implicits._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val tokc = size(split(col("text"), " ")).cast("long")
    val want = graft.ops.Sampling
      .unimaxRealize(d, "doc_id", "lang", tokc, 2L, 5L, 3)
      .select("doc_id", "lang", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // FIT: collect the language-grain factor table (model-sized)
    val factors = graft.ops.Sampling
      .unimaxAllocation(d, "lang", tokc, 2L, 5L, 3)
      .collect().map(r => r.getString(0) ->
        (if (r.getLong(1) > 0) r.getLong(3).toDouble / r.getLong(1)
         else 0.0)).toMap
    // APPLY on a stream in arbitrary slice order: the emitter is
    // stateless per row, so slicing cannot change the multiset
    val rows = d.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val tmp = java.nio.file.Files
      .createTempDirectory("umx_stream").toFile
    tmp.deleteOnExit()
    val slices = rows.grouped((rows.length + 2) / 3).toSeq
    slices.zipWithIndex.foreach { case (s, i) =>
      val p = new java.io.File(tmp, s"slice$i")
      s.toSeq.toDF("doc_id", "lang", "text").coalesce(1)
        .write.parquet(p.toString)
      p.listFiles().foreach(f =>
        f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(slices.head.toSeq.toDF("doc_id", "lang", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val out = StreamingOps.unimaxRealizeStream(stream, "doc_id", "lang",
        factors)
      .select("doc_id", "lang", "epoch")
    StreamingOps.runToMemorySink(out, "umx_stream")
    val got = spark.table("umx_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, s"${got.size} vs ${want.size}")
    assert(want.nonEmpty)
  }

  test("streaming length-bucket batching fed id-ordered micro-batches " +
    "equals the batch layout slot for slot") {
    import spark.implicits._
    val G = 16; val B = 8
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val want = graft.ops.Sampling
      .lengthBucketBatches(d, "doc_id", "text", G, B, 3)
      .select("doc_id", "shard", "bucket", "batch", "pos").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val rows = d.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val tmp = java.nio.file.Files
      .createTempDirectory("lenbatch_stream").toFile
    tmp.deleteOnExit()
    val slices = rows.grouped((rows.length + 2) / 3).toSeq
    slices.zipWithIndex.foreach { case (s, i) =>
      val p = new java.io.File(tmp, s"slice$i")
      s.toSeq.toDF("doc_id", "text").coalesce(1).write.parquet(p.toString)
      p.listFiles().foreach(f =>
        f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(slices.head.toSeq.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val out = StreamingOps.lengthBucketBatchesStream(stream, "doc_id",
        "text", G, B, 3)
      .toDF("shard", "bucket", "doc_id", "n_tokens", "batch", "pos")
    StreamingOps.runToMemorySink(out, "lenbatch_stream")
    val got = spark.table("lenbatch_stream")
      .select("doc_id", "shard", "bucket", "batch", "pos").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == want.size)
    assert(got == want, "stream and batch batching must agree")
    assert(want.nonEmpty)
  }

  test("tumblingAgg on a stream (Complete mode) equals the batch " +
    "form bucket for bucket — the same int64 window math drives both") {
    import graft.ops.Events
    val evRaw = spark.read.parquet(s"$dir/events.parquet")
    val ev = Events.normalizeTs(evRaw)
    val stream = Events.normalizeTs(
      spark.readStream.schema(evRaw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val day = 86400000000000L
    val out = Events.tumblingAgg(stream, "ts", day,
      Seq("event_type"), col("value"))
    StreamingOps.runToMemorySink(out, "tumbling_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), math.round(r.getDouble(3) * 1e6)))).toMap
    val got = canon(spark.table("tumbling_stream"))
    val want = canon(Events.tumblingAgg(ev, "ts", day,
      Seq("event_type"), col("value")))
    assert(got == want, "stream and batch windows must agree")
    assert(want.nonEmpty)
  }

  test("streaming Count-Min maintenance: the batch cmsBuild plan run " +
    "as a stateful aggregation (Complete mode, state = touched cells " +
    "<= depth*width) equals the batch cell table bit for bit, and " +
    "point estimates never underestimate") {
    import graft.ops.Sketches
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    // the SAME composable plan is the streaming sketch: posexplode is
    // a stateless map, the cell groupBy is Spark's incremental
    // stateful aggregation — no custom state code at all
    val out = Sketches.cmsBuild(stream, col("lang"), depth = 4,
      width = 64)
    StreamingOps.runToMemorySink(out, "cms_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = canon(spark.table("cms_stream"))
    val want = canon(Sketches.cmsBuild(docs, col("lang"), depth = 4,
      width = 64))
    assert(got == want, "streaming CMS cells must equal batch cells")
    assert(got.size <= 4 * 64, "state must stay sketch-bounded")
    // probe through the STREAM-built sketch: CMS never underestimates
    val sketch = spark.table("cms_stream")
    val truth = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.cmsEstimate(docs.select("lang").distinct(),
        "lang", sketch, depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated $k: ${est(k)} < $n")
    }
    // heavy-hitter candidates from the STREAM-built sketch are the
    // batch candidates: the two-pass exact-hitters pattern works
    // against a live sketch with no extra state
    val total = docs.count()
    val thr = total / 4
    def cands(sk: org.apache.spark.sql.DataFrame) =
      Sketches.cmsEstimate(docs.select("lang").distinct(), "lang", sk,
          depth = 4, width = 64)
        .where(col("cms_count") >= thr)
        .collect().map(_.getString(0)).toSet
    val batchSketch = Sketches.cmsBuild(docs, col("lang"), depth = 4,
      width = 64)
    assert(cands(sketch) == cands(batchSketch),
      "stream- and batch-sketch candidates must agree")
    val trueHitters = truth.filter(_._2 >= thr).keySet
    assert(trueHitters.subsetOf(cands(sketch)),
      "candidates must be a superset of the true hitters")
  }

  test("streaming AMS maintenance: signed cells aggregate " +
    "incrementally (Complete mode), equal the batch sketch bit for " +
    "bit, and keep the F2 estimate") {
    import graft.ops.Sketches
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val out = Sketches.amsBuild(stream, col("lang"))
    StreamingOps.runToMemorySink(out, "ams_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = canon(spark.table("ams_stream"))
    val want = canon(Sketches.amsBuild(docs, col("lang")))
    assert(got == want, "streaming AMS cells must equal batch cells")
    assert(got.size <= 4 * 64, "state must stay sketch-bounded")
    // the stream-built sketch estimates the exact F2 of the key space
    val est = Sketches.amsF2(spark.table("ams_stream")).head.getDouble(0)
    val exact = docs.groupBy("lang").count().collect()
      .map(r => { val n = r.getLong(1); n.toDouble * n }).sum
    assert(est > 0.3 * exact && est < 3.0 * exact,
      s"stream AMS F2 $est vs exact $exact")
  }

  test("streaming k-means: frozen-centroid register accumulation over " +
    "micro-batches equals one batch Lloyd round bit for bit; online " +
    "mode refreshes centroids and does not worsen inertia") {
    import graft.ops.Similarity
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val seed = Similarity.collectCentroids(
      e.orderBy("vec_id").limit(4)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    val stream = spark.readStream.schema(e.schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val (cents, counts, nb) = StreamingOps.streamingKmeans(
      stream, "vec_id", "embedding", seed, updateCentroids = false)
    // batch twin: ONE Lloyd round over the same data from the same
    // seed — the exact int64 registers make the comparison bit-exact
    val want = Similarity.kmeansIterate(e, "vec_id", "embedding", seed, 1)
    assert(nb >= 1)
    assert(counts.values.sum == e.count())
    assert(cents.map { case (c, v) => c -> v.toVector }.toMap ==
      want.map { case (c, v) => c -> v.toVector }.toMap,
      "frozen streaming registers must equal the batch round")
    // online mode: centroids move and inertia does not worsen
    def inertia(cs: Array[(Long, Seq[Double])]): Double =
      Similarity.cellAssignmentsWithDist(e, "vec_id", "embedding", cs)
        .agg(sum("dist")).head.getDouble(0)
    val stream2 = spark.readStream.schema(e.schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val (online, _, _) = StreamingOps.streamingKmeans(
      stream2, "vec_id", "embedding", seed, updateCentroids = true)
    assert(inertia(online) <= inertia(seed) + 1e-9,
      "online update must not worsen inertia on stationary data")
  }

  test("capPerKey admits at most cap rows per key (bounded counter " +
    "state), and admitted rows are real members of the key") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("source"), col("doc_id").cast("string"))
      .as[(String, String)]
    val out = StreamingOps.capPerKey(stream, cap = 3, stateTimeout = None)
      .toDF("source", "doc_id")
    StreamingOps.runToMemorySink(out, "cap_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("cap_stream").collect()
      .map(r => r.getString(0) -> r.getString(1).toLong)
    val bySrc = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      assert(bySrc(src).size == math.min(n, 3L).toInt,
        s"$src admitted ${bySrc(src).size} of $n at cap 3")
    }
    val realIds = docs.select("source", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    bySrc.foreach { case (src, ids) =>
      assert(ids.subsetOf(realIds(src)), s"$src admitted foreign ids")
    }
  }

  test("stream-static near-dup tagging equals the batch band join " +
    "collision for collision") {
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val corpusBands = Dedup.bandRowsOf(corpus, "text", "doc_id").persist()
    corpusBands.count()
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .where(col("doc_id") % 2 =!= 0)
    val out = StreamingOps.nearDupTags(stream, corpusBands,
      "text", "doc_id")
    StreamingOps.runToMemorySink(out, "neardup_stream")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 8))).toSet
    val got = canon(spark.table("neardup_stream"))
    val want = canon(StreamingOps.nearDupTags(
      docs.where(col("doc_id") % 2 =!= 0), corpusBands, "text", "doc_id"))
    assert(got == want, "stream and batch collisions must agree")
    assert(want.nonEmpty, "fixture must produce cross-half near-dups")
    corpusBands.unpersist()
  }

  test("streaming curation (quality floor + signature dedup) equals " +
    "the batch composition") {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .withColumn("event_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val out = StreamingOps.streamingCuration(stream, "text", "doc_id",
      "event_ts", minQuality = 0.7, watermark = "1 hour")
    StreamingOps.runToMemorySink(out, "curation")
    val got = spark.table("curation").count()
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
      .where(graft.ops.TextAnalysis.qualityScore(col("text")) >= 0.7)
    val batch = graft.ops.Dedup.minhashSignatures(batchDocs, "text", "doc_id")
      .select((0 until graft.ops.Dedup.NumPerms).map(i => col(s"sig$i")): _*)
      .distinct().count()
    assert(got == batch,
      s"streaming curation kept $got docs, batch composition has $batch")
    assert(got > 0)
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(got < total, "curation dropped nothing — threshold has no teeth")
  }

  test("streaming blocklist: the stateless AC map equals the batch " +
    "kernel row for row") {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val out = StreamingOps.blocklistStream(stream, "text", "doc_id")
    StreamingOps.runToMemorySink(out, "blk")
    val got = spark.table("blk")
      .select(col("doc_id"), col("n_matches"), col("blocked"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    val want = StreamingOps.blocklistStream(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
      .select(col("doc_id"), col("n_matches"), col("blocked"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(got === want)
    assert(want.exists(_._3), "no doc ever blocked — patterns dead")
    assert(want.exists(!_._3), "every doc blocked — patterns too hot")
  }

  test("incremental CCNet: the LM fitted on the archive, applied to " +
    "the stream, gates chunks bit-identically to the batch apply") {
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val lm = graft.ops.NgramLm.train(batchDocs, "text", "doc_id")
    lm.bigrams.persist(); lm.prefixes.persist()
    try {
      val schema = batchDocs.schema
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val tauFx = 3639984880L
      val fx = 1073741824.0
      val out = StreamingOps.ccnetApplyStream(stream, "text", "doc_id",
        lm, window = 32, tauFx = tauFx, fx = fx)
      StreamingOps.runToMemorySink(out, "ccnet_stream",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      val got = spark.table("ccnet_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      val want = StreamingOps.ccnetApplyStream(batchDocs, "text",
          "doc_id", lm, window = 32, tauFx = tauFx, fx = fx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      assert(got === want)
      assert(want.exists(_._6) && want.exists(!_._6),
        "the gate never fired both ways — threshold has no teeth")
    } finally {
      lm.bigrams.unpersist(); lm.prefixes.unpersist()
    }
  }

  test("streaming eval decontamination: the train-fp set fitted on " +
    "the archive flags the same leaky docs as the batch gate") {
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val isEval = graft.ops.Sampling.hashFraction(col("doc_id")) >= 0.9
    val trainFps = batchDocs.where(!isEval)
      .select(explode(graft.ops.TextHashExpressions
        .ngramFps(col("text"), 5)).as("g"))
      .distinct().persist()
    try {
      trainFps.count()
      val schema = batchDocs.schema
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .where(isEval)
      val out = StreamingOps.evalSafeStream(stream, "text", "doc_id",
        trainFps)
      StreamingOps.runToMemorySink(out, "evalsafe",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      val got = spark.table("evalsafe")
        .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
      val want = StreamingOps.evalSafeStream(batchDocs.where(isEval),
          "text", "doc_id", trainFps)
        .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
      assert(got === want)
      assert(got.nonEmpty)
      assert(got.values.exists(identity) || got.size < 50,
        "no leak ever flagged on a corpus with template families")
    } finally trainFps.unpersist()
  }

  test("online ELBO: micro-batch training converges to the data mean") {
    import graft.core._
    import graft.data.DataSet
    import graft.optimize.{Adam, Elbo}
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_quantity") / 10.0).as("x"))
    // stream the same rows as many small files (the micro-batch feed)
    val inDir = java.nio.file.Files
      .createTempDirectory("graft_stream_in").toString
    li.repartition(8).write.mode("overwrite").parquet(inDir)
    val total = li.count()
    val root = new Module
    val p = root.add("p", new Param(Seq(1), initMean = 3.0,
      initStddev = 0.01))
    val ds = new DataSet(li, seed = 0)
    val elbo = new Elbo(root, ds, Seq("x"),
      ctx => -(ctx.read1(p) - ctx.in("x")).sq)
    val adam = new Adam(elbo.nSlots, lr = 0.05)
    val stream = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val nBatches = StreamingOps.onlineElbo(elbo, stream, adam, total,
      stepsPerBatch = 30)
    assert(nBatches >= 8, s"expected >= 8 micro-batches, got $nBatches")
    val mean = li.agg(avg("x")).head.getDouble(0)
    assert(math.abs(p.value(0) - mean) < 0.05,
      s"online fit ${p.value(0)} vs mean $mean")
    ds.unpersist()
  }

  test("codec columns are genuinely stream-safe: WAV decode + MP4 " +
    "container metadata over a file stream equal their batch twins") {
    import org.apache.spark.sql.functions._
    // fixture dir: a handful of WAV and MP4 files as a binary-media
    // parquet table (written once, then streamed)
    val tmp = java.nio.file.Files.createTempDirectory("mediastream").toFile
    tmp.deleteOnExit()
    def mkWav(sampleRate: Int, nFrames: Int, amp: Short,
              period: Int): Array[Byte] = {
      val dataLen = nFrames * 2
      val out = new Array[Byte](44 + dataLen)
      def put16(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      }
      def put32(o: Int, v: Int): Unit = {
        put16(o, v & 0xffff); put16(o + 2, (v >> 16) & 0xffff)
      }
      def tag(o: Int, str: String): Unit =
        str.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) =>
          out(o + i) = b
        }
      tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
      tag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
      put32(24, sampleRate); put32(28, sampleRate * 2); put16(32, 2)
      put16(34, 16)
      tag(36, "data"); put32(40, dataLen)
      (0 until nFrames).foreach { i =>
        val v = if ((i / period) % 2 == 0) amp.toInt else -amp.toInt
        put16(44 + 2 * i, v & 0xffff)
      }
      out
    }
    val rows = (1 to 12).map { i =>
      val media: Array[Byte] =
        if (i % 2 == 0) graft.ops.Mp4.buildMinimal(1000L, 1000L * i,
          16 * i, 9 * i, "avc1", "vide", 100 * i)
        else mkWav(8000, 400 + i, 1000, 8)
      (i.toLong, media)
    }
    import spark.implicits._
    rows.toDF("id", "media").repartition(2)
      .write.mode("overwrite").parquet(s"$tmp/media")
    val schema = spark.read.parquet(s"$tmp/media").schema

    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Multimodal.mp4MetaColumn(
        graft.ops.Multimodal.decodeWavColumn(df, "media"), "media")
        .select(col("id"), col("wav.n_frames").as("wf"),
          col("mp4.duration_ms").as("ms"), col("mp4.width").as("w"))

    val stream = pipeline(spark.readStream.schema(schema)
      .parquet(s"$tmp/media"))
    StreamingOps.runToMemorySink(stream, "media_meta",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("media_meta").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)))).toSet
    val want = pipeline(spark.read.parquet(s"$tmp/media")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)))).toSet
    assert(got == want && got.size == 12)
    // sanity: both codecs actually decoded something on the stream
    assert(got.count(_._2.isDefined) == 6, "6 WAV rows expected")
    assert(got.count(_._3.isDefined) == 6, "6 MP4 rows expected")
  }

  test("WARC record flatten + MP3 metadata are stream-safe: a binary " +
    "file stream yields exactly the batch records") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("warcstream").toFile
    tmp.deleteOnExit()
    val rows = (1 to 10).map { i =>
      val media: Array[Byte] =
        if (i % 2 == 0)
          graft.ops.Warc.buildFile((1 to i).map(j =>
            (s"https://ex.com/$i/$j", s"id-$i-$j", s"doc $i $j body")))
        else graft.ops.Mp3.buildFrames(mpeg1 = i % 3 == 0, brIdx = i % 12 + 1,
          srIdx = i % 3, nFrames = i + 3)
      (i.toLong, media)
    }
    import spark.implicits._
    rows.toDF("id", "media").repartition(2)
      .write.mode("overwrite").parquet(s"$tmp/media")
    val schema = spark.read.parquet(s"$tmp/media").schema

    // WARC flatten: non-WARC rows (the MP3 ones) vanish, WARC files
    // expand to warcinfo + responses — a flatMap on a STREAM
    def warcPipe(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Multimodal.warcRecordsColumn(df, "media")
        .select(col("id"), col("warc_type"), col("uri"),
          col("n_body_bytes"))
    val warcStream = warcPipe(spark.readStream.schema(schema)
      .parquet(s"$tmp/media"))
    StreamingOps.runToMemorySink(warcStream, "warc_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    def canon(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val got = canon(spark.table("warc_stream").collect())
    val want = canon(warcPipe(spark.read.parquet(s"$tmp/media")).collect())
    assert(got == want)
    assert(got.count(_._2 == "response") == (2 to 10 by 2).sum)
    // MP3 metadata on the same stream: null struct for WARC rows,
    // exact frame counts for MP3 rows
    def mp3Pipe(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Multimodal.mp3MetaColumn(df, "media")
        .select(col("id"), col("mp3.n_frames").as("mf"))
    val mp3Stream = mp3Pipe(spark.readStream.schema(schema)
      .parquet(s"$tmp/media"))
    StreamingOps.runToMemorySink(mp3Stream, "mp3_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val gotM = spark.table("mp3_stream").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val wantM = mp3Pipe(spark.read.parquet(s"$tmp/media")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(gotM == wantM && gotM.size == 10)
    assert(gotM.count(_._2.isDefined) == 5, "5 MP3 rows expected")
  }

  test("incremental line-dedup: the boilerplate set fitted on the " +
    "archive applies as a stateless map on a doc stream, equal to the " +
    "batch apply (and to full lineDedup where dfs agree)") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("linestream").toFile
    tmp.deleteOnExit()
    import spark.implicits._
    val archive = (1L to 30L).map { i =>
      (i, s"shared header\nbody $i is unique\n" +
        (if (i % 2 == 0) "even footer\n" else "") + "shared footer")
    }.toDF("id", "t")
    val fps = graft.ops.TextAnalysis.frequentLineFps(archive, "t", "id", 10)
    // header (30) + footer (30) + even footer (15) all exceed maxDf=10
    assert(fps.length == 3)
    val batch = (31L to 42L).map { i =>
      (i, s"shared header\nnew body $i\neven footer\nshared footer")
    }.toDF("id", "t")
    batch.write.mode("overwrite").parquet(s"$tmp/docs")
    val schema = spark.read.parquet(s"$tmp/docs").schema
    def pipe(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.lineDedupApply(df, "t", fps)
        .select(col("id"), col("cleaned"), col("kept_lines"),
          col("total_lines"))
    val stream = pipe(spark.readStream.schema(schema).parquet(s"$tmp/docs"))
    StreamingOps.runToMemorySink(stream, "line_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("line_stream").as[(Long, String, Long, Long)]
      .collect().sortBy(_._1)
    val want = pipe(spark.read.parquet(s"$tmp/docs"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.forall { case (i, c, k, t) =>
      c == s"new body $i" && k == 1L && t == 4L })
  }

  test("incremental substring-boilerplate: the window-fp set fitted " +
    "on the archive applies as a stateless per-row map on a doc " +
    "stream, equal to the batch apply — at ANY token offset") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("substream").toFile
    tmp.deleteOnExit()
    import spark.implicits._
    val boiler = "all rights reserved by the example corporation inc worldwide"
    val archive = (1L to 30L).map(i =>
      (i, s"doc $i body text number$i word$i more$i stuff$i $boiler"))
      .toDF("id", "t")
    val fps = graft.ops.Dedup.frequentWindowFps(archive, "t", "id",
      k = 6, maxDf = 10)
    // the 9-token boilerplate run = 4 overlapping 6-windows, each in
    // all 30 docs > maxDf; every other window is per-doc unique
    assert(fps.length == 4, s"got ${fps.length} fitted windows")
    // new docs carry the run at DIFFERENT offsets (start / middle)
    val batch = Seq(
      (31L, s"$boiler and then fresh tail31 a b c"),
      (32L, s"lead32 x y $boiler trailing32"),
      (33L, "clean33 doc with no boilerplate at all right here"))
      .toDF("id", "t")
    batch.write.mode("overwrite").parquet(s"$tmp/docs")
    val schema = spark.read.parquet(s"$tmp/docs").schema
    def pipe(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.dedupSubstringsApply(df, "t", "id", 6, fps)
        .select(col("id"), col("text_clean"), col("n_removed"),
          col("modified"))
    val stream = pipe(spark.readStream.schema(schema).parquet(s"$tmp/docs"))
    StreamingOps.runToMemorySink(stream, "substr_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("substr_stream").as[(Long, String, Long, Boolean)]
      .collect().sortBy(_._1)
    val want = pipe(spark.read.parquet(s"$tmp/docs"))
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq, "stream != batch")
    assert(got.map(_._2).toSeq == Seq(
      "and then fresh tail31 a b c",
      "lead32 x y trailing32",
      "clean33 doc with no boilerplate at all right here"), s"$got")
    assert(got.map(_._3).toSeq == Seq(9L, 9L, 0L))
    assert(got.map(_._4).toSeq == Seq(true, true, false))
  }

  test("streaming media dedup: the codec build+hash columns are " +
    "stream-safe and the kept set equals the batch distinct-hash " +
    "count, image and audio") {
    import graft.ops.Multimodal
    import org.apache.spark.sql.DataFrame
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    // the q_multimodal_imagededup parameterization, event-timed
    def imgParams(df: DataFrame): DataFrame = df.select(col("doc_id"),
        col("source"),
        pmod(floor(col("doc_id") / lit(20L)), lit(40L)).cast("int")
          .as("seed"))
      .withColumn("w", (lit(8) * (pmod(col("seed"), lit(5)) + 2))
        .cast("int"))
      .withColumn("h", (lit(8) * (pmod(col("seed"), lit(7)) + 2))
        .cast("int"))
      .withColumn("event_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id")))
    def audParams(df: DataFrame): DataFrame = df.select(col("doc_id"),
        pmod(floor(col("doc_id") / lit(20L)), lit(32L)).cast("int")
          .as("seed"))
      .withColumn("n", (lit(512) + lit(64) * pmod(col("seed"), lit(8)))
        .cast("int"))
      .withColumn("event_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")

    val imgOut = StreamingOps.mediaDedupStream(
      Multimodal.bmpPatternColumn(imgParams(stream), "w", "h", "seed"),
      "media", "image", "event_ts")
    StreamingOps.runToMemorySink(imgOut, "media_dedup_img")
    val gotImg = spark.table("media_dedup_img").count()
    val batchImg = Multimodal.imageHashColumn(
        Multimodal.bmpPatternColumn(imgParams(batchDocs), "w", "h",
          "seed"), "media")
      .select("ahash64").distinct().count()
    assert(gotImg == batchImg && gotImg > 0,
      s"image: stream kept $gotImg, batch distinct $batchImg")

    val audOut = StreamingOps.mediaDedupStream(
      Multimodal.wavPatternColumn(audParams(stream), "n", "seed"),
      "media", "audio", "event_ts")
    StreamingOps.runToMemorySink(audOut, "media_dedup_aud")
    val gotAud = spark.table("media_dedup_aud").count()
    val batchAud = Multimodal.audioFingerprintColumn(
        Multimodal.wavPatternColumn(audParams(batchDocs), "n", "seed"),
        "media")
      .select("afp").distinct().count()
    assert(gotAud == batchAud && gotAud > 0,
      s"audio: stream kept $gotAud, batch distinct $batchAud")
    // the binary column must NOT survive into the dedup output
    assert(!spark.table("media_dedup_img").columns.contains("media"))
  }

  test("streaming admission pipeline keeps batch's passer/key-dedup " +
    "set; rendezvous sharding and audio-quality gates are stateless " +
    "stream-safe maps, row-identical to batch") {
    import graft.ops.{Layout, Multimodal, TextAnalysis}
    import org.apache.spark.sql.DataFrame
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .withColumn("event_ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val batch = spark.read.parquet(s"$dir/documents.parquet")

    // admission: stream kept == distinct prefix keys among batch passers
    val adm = StreamingOps.admissionStream(stream, "text", "event_ts")
    StreamingOps.runToMemorySink(adm, "admission")
    val gotKeys = spark.table("admission").select("__k").distinct()
      .collect().map(_.getString(0)).toSet
    val batchKeys = batch
      .where(TextAnalysis.qualityScore(col("text")) >= 0.7 &&
        TextAnalysis.wordCount(col("text")) >= 25 &&
        TextAnalysis.langId(col("text")) =!= "und")
      .select(array_join(slice(
        split(TextAnalysis.normalize(col("text")), " "), 1, 10), " "))
      .distinct().collect().map(_.getString(0)).toSet
    assert(gotKeys == batchKeys && gotKeys.nonEmpty,
      s"admission kept ${gotKeys.size} keys, batch ${batchKeys.size}")
    assert(spark.table("admission").count() == batchKeys.size,
      "stream must keep exactly one row per prefix key")

    // stateless maps: stream rows == batch rows (by doc_id)
    def aud(df: DataFrame): DataFrame = Multimodal.audioQualityColumn(
      Multimodal.wavQualityPatternColumn(
        df.select(col("doc_id"),
          pmod(col("doc_id"), lit(24L)).cast("int").as("seed"))
          .withColumn("n", (lit(512) + lit(64) *
            pmod(col("seed"), lit(8))).cast("int")),
        "n", "seed"), "media")
      .select(col("doc_id"),
        Layout.rendezvousShard(col("doc_id"), 48).as("h48"),
        col("aq_silent"), col("aq_clipped"), col("aq_peak"))
    val avStream = aud(stream)
    StreamingOps.runToMemorySink(avStream, "stateless_maps")
    val got = spark.table("stateless_maps").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val want = aud(batch).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == want && got.nonEmpty,
      s"stateless maps differ: ${got.size} vs ${want.size}")
  }

  test("streaming experiment monitoring: per-user A/B registers " +
    "accumulated across micro-batches equal the batch user aggregate " +
    "bit for bit") {
    import graft.ops.{Events, TextAnalysis}
    val s = spark
    import s.implicits._
    val midNs = java.time.LocalDateTime.of(2024, 1, 16, 0, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    val ev = Events.load(spark, s"$dir/events.parquet")
      .select(col("user_id"),
        pmod(TextAnalysis.tokenHash(
          concat(col("user_id").cast("string"), lit("#ab"))),
          lit(2L)).as("arm"),
        when(col("ts") < midNs, round(col("value") * 100).cast("long"))
          .otherwise(0L).as("dx"),
        when(col("ts") >= midNs, round(col("value") * 100).cast("long"))
          .otherwise(0L).as("dy"))
    val want = ev.groupBy("user_id", "arm")
      .agg(sum("dx").as("x"), sum("dy").as("y"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = ev.as[(Long, Long, Long, Long)].collect()
    val tmp = java.nio.file.Files
      .createTempDirectory("ab_stream").toFile
    tmp.deleteOnExit()
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach {
      case (sl, i) =>
        val p = new java.io.File(tmp, s"slice$i")
        sl.toSeq.toDF("user_id", "arm", "dx", "dy").coalesce(1)
          .write.parquet(p.toString)
        p.listFiles().foreach(f =>
          f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(rows.toSeq.toDF("user_id", "arm", "dx", "dy").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
      .as[(Long, Long, Long, Long)]
    val out = StreamingOps.abRegistersStream(stream).toDF()
    StreamingOps.runToMemorySink(out, "ab_stream",
      org.apache.spark.sql.streaming.OutputMode.Update())
    // x+y is monotone: the max-(x+y) row per user is the final state
    val got = spark.table("ab_stream").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3))))
      .groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2).maxBy(t => t._2 + t._3) }
    assert(got.toMap == want && got.nonEmpty,
      s"${got.size} vs ${want.size} users")
  }

  test("steady-state bitext mining: side-0 arrivals mined against the " +
    "persisted archive match the batch form row for row under a " +
    "3-way split") {
    import graft.ops.Similarity
    val s = spark
    import s.implicits._
    val embsDf = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("side", when(col("label") < 5, 0).otherwise(1))
    val archive = Similarity.bitextArchive(embsDf, "vec_id",
      "embedding", "side", k = 3).persist()
    archive.count()
    val side0 = embsDf.where(col("side") === 0)
      .select("vec_id", "embedding")
    val want = Similarity.bitextMineAgainst(side0, archive,
        "vec_id", "embedding", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(5))).toMap
    assert(want.nonEmpty)
    // stream the same side-0 rows in 3 file-slices
    val rows = side0.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1)))
    val tmp = java.nio.file.Files
      .createTempDirectory("bitext_stream").toFile
    tmp.deleteOnExit()
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach {
      case (sl, i) =>
        val p = new java.io.File(tmp, s"slice$i")
        sl.toSeq.toDF("vec_id", "embedding").coalesce(1)
          .write.parquet(p.toString)
        p.listFiles().foreach(f =>
          f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(side0.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val got = scala.collection.mutable.Map.empty[Long,
      (Long, Double, Double)]
    val n = StreamingOps.bitextMineStream(stream, archive,
      "vec_id", "embedding", k = 3) { out =>
      out.collect().foreach(r =>
        got(r.getLong(0)) = (r.getLong(1), r.getDouble(2),
          r.getDouble(5)))
    }
    assert(n >= 3, s"expected >=3 micro-batches, got $n")
    assert(got.toMap == want, s"${got.size} vs ${want.size}")
    archive.unpersist()
  }

  test("steady-state entity resolution: arriving records resolved " +
    "against the persisted archive index match the batch form row " +
    "for row under a 3-way split") {
    import graft.ops.Entity
    val s = spark
    import s.implicits._
    val archive = Seq(
      (10L, "77123", "n77123", "A"),
      (11L, "77124", "n77124", "A"), // merges with 10 (lev 1)
      (20L, "88888", "n88888", "A"),
      (30L, "55555", "n55555", "B")
    ).toDF("rid", "key", "name", "blk")
    val resolved = Entity.resolve(archive, "rid", "key", "name",
      Seq("blk"))
    val index = Entity.archiveIndex(resolved, "key", "name",
      Seq("blk")).persist()
    index.count()
    val arrivals = Seq(
      (100L, "77125", "n77125", "A"), // lev 1 of 11 -> entity 10
      (101L, "88888", "n88888", "A"), // exact match of 20
      (102L, "77125", "n77125", "B"), // right key, wrong block
      (103L, "55556", "n55556", "B"), // lev 1 of 30 in block B
      (104L, "99999", "n99999", "A"), // fresh
      (105L, "7712", "n7712", "A")    // deletion of 77123/77124
    ).toDF("rid", "key", "name", "blk")
    val want = Entity.resolveAgainst(index, arrivals, "rid", "key",
        "name", Seq("blk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want == Map(100L -> 10L, 101L -> 20L, 102L -> 102L,
      103L -> 30L, 104L -> 104L, 105L -> 10L))
    val rows = arrivals.collect().map(r => (r.getLong(0),
      r.getString(1), r.getString(2), r.getString(3)))
    val tmp = java.nio.file.Files
      .createTempDirectory("entity_stream").toFile
    tmp.deleteOnExit()
    rows.grouped(2).zipWithIndex.foreach { case (sl, i) =>
      val p = new java.io.File(tmp, s"slice$i")
      sl.toSeq.toDF("rid", "key", "name", "blk").coalesce(1)
        .write.parquet(p.toString)
      p.listFiles().foreach(f =>
        f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(arrivals.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val got = scala.collection.mutable.Map.empty[Long, Long]
    val n = graft.streaming.StreamingOps.entityResolveStream(
      stream, index, "rid", "key", "name", Seq("blk")) { out =>
      out.collect().foreach(r => got(r.getLong(0)) = r.getLong(1))
    }
    assert(n >= 3, s"expected >=3 micro-batches, got $n")
    assert(got.toMap == want, s"$got vs $want")
    index.unpersist()
  }

  test("tau=2 steady-state entity resolution: a double-substitution " +
    "arrival links through the depth-2 index on a stream exactly as " +
    "in batch") {
    import graft.ops.Entity
    val s = spark
    import s.implicits._
    val archive = Seq((10L, "1234567", "n1234567", "A"))
      .toDF("rid", "key", "name", "blk")
    val resolved = Entity.resolve(archive, "rid", "key", "name",
      Seq("blk"), tau = 2)
    val index = Entity.archiveIndex(resolved, "key", "name",
      Seq("blk"), k = 2).persist()
    index.count()
    val arrivals = Seq(
      (100L, "1934867", "n1934867", "A"),  // sub+sub: lev 2 -> 10
      (101L, "1234567", "n1234567", "B"),  // wrong block: fresh
      (102L, "9994567", "n9994567", "A")   // lev 3: fresh
    ).toDF("rid", "key", "name", "blk")
    val want = Entity.resolveAgainst(index, arrivals, "rid", "key",
        "name", Seq("blk"), tau = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want == Map(100L -> 10L, 101L -> 101L, 102L -> 102L))
    val tmp = java.nio.file.Files
      .createTempDirectory("entity_tau2_stream").toFile
    tmp.deleteOnExit()
    arrivals.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3)))
      .grouped(2).zipWithIndex.foreach { case (sl, i) =>
        val p = new java.io.File(tmp, s"slice$i")
        sl.toSeq.toDF("rid", "key", "name", "blk").coalesce(1)
          .write.parquet(p.toString)
        p.listFiles().foreach(f =>
          f.setLastModified(1700000000000L + i * 60000L))
      }
    val stream = spark.readStream.schema(arrivals.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*")
    val got = scala.collection.mutable.Map.empty[Long, Long]
    val n = graft.streaming.StreamingOps.entityResolveStream(
      stream, index, "rid", "key", "name", Seq("blk"), tau = 2) { out =>
      out.collect().foreach(r => got(r.getLong(0)) = r.getLong(1))
    }
    assert(n >= 2, s"expected >=2 micro-batches, got $n")
    assert(got.toMap == want, s"$got vs $want")
    index.unpersist()
  }

  test("unigram-LM segmentation is a PURE MAP: the identical " +
    "segmented() plan runs directly on a streaming frame (no " +
    "foreachBatch) and matches batch piece for piece") {
    import graft.ops.UnigramLm
    val s = spark
    import s.implicits._
    val model = Seq("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L,
      "ab" -> 9L, "cd" -> 9L, "abc" -> 4L)
    val words = Seq(("abcd", 3L), ("abab", 2L), ("d", 1L),
      ("abcab", 4L))
    val batch = UnigramLm.segmented(words.toDF("tok", "freq"), model)
      .select("tok", "pieces").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(batch("abcd") == Seq("ab", "cd"))
    val tmp = java.nio.file.Files
      .createTempDirectory("unigram_stream").toFile
    tmp.deleteOnExit()
    words.toDF("tok", "freq").coalesce(1).write
      .parquet(new java.io.File(tmp, "w").toString)
    val stream = spark.readStream
      .schema(words.toDF("tok", "freq").schema)
      .parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(
      UnigramLm.segmented(stream, model).select("tok", "pieces"),
      "unigram_seg")
    val got = spark.table("unigram_seg").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got == batch, s"$got vs $batch")
  }

  test("content-defined chunking is a PURE MAP: the identical " +
    "Cdc.chunks plan runs directly on a streaming frame and matches " +
    "batch chunk for chunk") {
    import graft.ops.Cdc
    val s = spark
    import s.implicits._
    def mk(seed: Int, n: Int): String = {
      val sb = new StringBuilder
      var h = seed.toLong
      while (sb.length < n) {
        h = h * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + math.floorMod(h >>> 33, 26L).toInt).toChar)
      }
      sb.toString.take(n)
    }
    val docs = Seq((1L, mk(9, 800)), (2L, mk(10, 450)), (3L, "tiny"))
    val batch = Cdc.chunks(docs.toDF("id", "txt"), "txt", Seq("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val tmp = java.nio.file.Files
      .createTempDirectory("cdc_stream").toFile
    tmp.deleteOnExit()
    docs.toDF("id", "txt").coalesce(1).write
      .parquet(new java.io.File(tmp, "d").toString)
    val stream = spark.readStream
      .schema(docs.toDF("id", "txt").schema).parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(
      Cdc.chunks(stream, "txt", Seq("id")), "cdc_chunks")
    val got = spark.table("cdc_chunks").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == batch, s"$got vs $batch")
  }

  test("WordPiece MaxMatch is a PURE MAP: the identical maxMatch " +
    "plan runs directly on a streaming frame (the tokenizer-serving " +
    "shape) and matches batch piece count, UNK flag, and digest") {
    import graft.ops.WordPiece
    val s = spark
    import s.implicits._
    val MK = WordPiece.Mark
    val vocab = Map("a" -> 11L, "ab" -> 12L, MK + "b" -> 13L,
      MK + "c" -> 14L, MK + "bc" -> 15L, "abc" -> 16L)
    val words = Seq("abc", "abcb", "ba", "a", "abcbc")
    def plan(df: org.apache.spark.sql.DataFrame) = df
      .select(col("tok"), WordPiece.maxMatch(col("tok"), vocab).as("m"))
      .select(col("tok"), col("m.np"), col("m.unk"), col("m.dg"))
    val batch = plan(words.toDF("tok")).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2),
        r.getLong(3))).toMap
    assert(batch("ba")._2, "word-initial-only 'b' must UNK")
    val tmp = java.nio.file.Files
      .createTempDirectory("wp_stream").toFile
    tmp.deleteOnExit()
    words.toDF("tok").coalesce(1).write
      .parquet(new java.io.File(tmp, "w").toString)
    val stream = spark.readStream
      .schema(words.toDF("tok").schema).parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(plan(stream), "wp_seg")
    val got = spark.table("wp_seg").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2),
        r.getLong(3))).toMap
    assert(got == batch, s"$got vs $batch")
  }

  test("FLAC build + frame decode are stream-safe: the identical " +
    "flacPatternColumn -> flacAudioColumn plan runs directly on a " +
    "streaming frame and matches batch register for register") {
    val s = spark
    import s.implicits._
    val params = Seq((1L, 3, 200), (2L, 9, 264), (3L, 17, 328))
      .toDF("id", "seed", "n")
    def plan(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Multimodal.flacAudioColumn(
          graft.ops.Multimodal.flacPatternColumn(df, "n", "seed"),
          "media", 999999937L)
        .select(col("id"), col("fa.n_frames"), col("fa.n_const"),
          col("fa.n_fixed"), col("fa.sum_s"), col("fa.dg"))
    val batch = plan(params).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(batch.size == 3 && batch.values.forall(_.head != null))
    val tmp = java.nio.file.Files
      .createTempDirectory("flac_stream").toFile
    tmp.deleteOnExit()
    params.coalesce(1).write
      .parquet(new java.io.File(tmp, "p").toString)
    val stream = spark.readStream.schema(params.schema)
      .parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(plan(stream), "flac_regs")
    val got = spark.table("flac_regs").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got == batch, s"$got vs $batch")
  }

  test("ADPCM build + decode are stream-safe: the identical " +
    "adpcmPatternColumn -> adpcmAudioColumn plan runs directly on a " +
    "streaming frame and matches batch register for register") {
    val s = spark
    import s.implicits._
    val params = Seq((1L, 5, 65 * 2), (2L, 11, 65 * 3))
      .toDF("id", "seed", "n")
    def plan(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Multimodal.adpcmAudioColumn(
          graft.ops.Multimodal.adpcmPatternColumn(df, "n", "seed"),
          "media", 999999937L)
        .select(col("id"), col("ad.n_blocks"), col("ad.sum_d"),
          col("ad.dg"))
    val batch = plan(params).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(batch.size == 2 && batch.values.forall(_.head != null))
    val tmp = java.nio.file.Files
      .createTempDirectory("adpcm_stream").toFile
    tmp.deleteOnExit()
    params.coalesce(1).write
      .parquet(new java.io.File(tmp, "p").toString)
    val stream = spark.readStream.schema(params.schema)
      .parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(plan(stream), "ad_regs")
    val got = spark.table("ad_regs").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got == batch, s"$got vs $batch")
  }

  test("incremental k-core staleness: arrivals streamed against the " +
    "persisted core snapshot match the batch form row for row, and " +
    "the stale flag fires exactly when the degree bound reaches k") {
    import graft.ops.GraphRank
    val s = spark
    import s.implicits._
    val k = 3
    // base graph: a 6-clique (its 3-core) + a path 10-11-12 (peeled)
    val clique = for (a <- 0 to 5; b <- 0 to 5 if a < b)
      yield (a.toLong, b.toLong)
    val base = (clique ++ Seq((10L, 11L), (11L, 12L)))
      .toDF("src", "dst")
    val snapshot = GraphRank.coreSnapshot(base, "src", "dst", k)
      .persist() // the static side a steady-state pipeline serves
    val snap = snapshot.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(1))).toMap
    assert(snap(0L)._1 && !snap(10L)._1 && snap(10L)._2 == 1L)
    // arrivals across 3 micro-batches: node 10 (base_deg 1) gains 3
    // edges -> stale from arrival 2 on; node 20 (unseen) gains 3 ->
    // stale at 3; core node 0 gains 1 -> never stale
    val batches = Seq(
      Seq((10L, 20L), (0L, 30L)),
      Seq((10L, 21L), (20L, 21L)),
      Seq((10L, 22L), (20L, 22L)))
    val tmp = java.nio.file.Files
      .createTempDirectory("kcore_stream").toFile
    tmp.deleteOnExit()
    batches.zipWithIndex.foreach { case (b, i) =>
      val p = new java.io.File(tmp, s"slice$i")
      b.toDF("src", "dst").coalesce(1).write.parquet(p.toString)
      p.listFiles().foreach(f =>
        f.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(batches.head.toDF("src", "dst").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*")
    val out = StreamingOps.kCoreStalenessStream(stream, snapshot,
      "src", "dst", k).toDF()
    StreamingOps.runToMemorySink(out, "kcore_stream",
      org.apache.spark.sql.streaming.OutputMode.Update())
    // arrivals is monotone: the max-arrivals row per node IS the
    // final state, independent of sink row order
    val got = spark.table("kcore_stream").collect()
      .map(r => (r.getLong(0), (r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .groupBy(_._1).map { case (n, rs) => n -> rs.map(_._2).maxBy(_._4) }
    val want = GraphRank.kCoreStaleness(snapshot,
        batches.flatten.toDF("src", "dst"), "src", "dst", k)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == want && got.nonEmpty,
      s"stream != batch: $got vs $want")
    // the staleness semantics themselves
    assert(got(10L)._5, "peeled node with bound >= k must be stale")
    assert(got(20L)._5, "new node reaching k arrivals must be stale")
    assert(!got(0L)._5 && got(0L)._1, "core nodes are never stale")
    assert(!got(30L)._5 && got(30L)._4 == 1L)
    // mid-stream trigger point: node 10 emitted a non-stale row at
    // arrival 1 (1 + 1 < 3) and a stale row by arrival 2
    val n10 = spark.table("kcore_stream").collect()
      .filter(_.getLong(0) == 10L)
      .map(r => r.getLong(4) -> r.getBoolean(5)).toMap
    assert(n10(1L) == false && n10(2L) == true && n10(3L) == true)
    snapshot.unpersist()
  }

  test("round-13 compliance/curation ops are PURE MAPS: sniff, " +
    "mojibake repair, and robots decisions run the identical plan " +
    "on a streaming frame and match batch row for row") {
    import graft.ops.{Multimodal, Mojibake, Robots}
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 0, "plain ascii", "/a"),
      (2L, 4, "caf\u00c3\u00a9 moji", "/private/x"),
      (3L, 9, "\u00c3\u0083\u00c2\u00a9 double", "/private/ok/y"),
      (4L, 12, "clean caf\u00e9", "/tmp/z"),
      (5L, 13, "x", "/b"))
    val robotsTxt = "User-agent: *\nDisallow: /private\n" +
      "Allow: /private/ok\nDisallow: /tmp/*\n"
    def pipeline(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val built = Multimodal.sniffBuildColumn(df, "sel", "t")
      val sniffed = Multimodal.sniffColumn(built, "media")
      val fixed = Mojibake.fixColumn(sniffed, "t")
      Robots.decisionColumn(fixed.withColumn("robots", lit(robotsTxt)),
          "robots", "path", "c")
        .select("id", "fmt", "fixed", "moji_passes", "allowed")
    }
    val src = rows.toDF("id", "sel", "t", "path")
    val batch = pipeline(src).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getInt(3), r.getBoolean(4))).toMap
    assert(batch(2L)._2 == "caf\u00e9 moji" && batch(2L)._3 == 1)
    assert(batch(3L)._3 == 2 && !batch(2L)._4 && batch(3L)._4)
    assert(batch(1L)._1 == "jpeg" && batch(5L)._1 == "binary")
    val tmp = java.nio.file.Files
      .createTempDirectory("r13_stream").toFile
    tmp.deleteOnExit()
    src.coalesce(1).write.parquet(new java.io.File(tmp, "d").toString)
    val stream = spark.readStream.schema(src.schema).parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(
      pipeline(stream), "r13_ops")
    val got = spark.table("r13_ops").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getInt(3), r.getBoolean(4))).toMap
    assert(got == batch, s"$got vs $batch")
  }


  test("round-14 XML dump page walk is a PURE MAP: xmlPagesColumn runs " +
    "the identical plan on a streaming frame and matches batch row " +
    "for row") {
    import graft.ops.{Multimodal, Xml}
    val s = spark
    import s.implicits._
    val dumps = Seq(
      (100L, Xml.buildDump(Seq(
        Xml.Page(1L, 0, "P&1", 10L, "2024-01-02T03:00:00Z", "u1",
          "alpha body", redirect = false, ok = true),
        Xml.Page(2L, 10, "P&2", 17L, "2024-01-03T04:00:00Z", "u2",
          "beta < body >", redirect = true, ok = true)))),
      (200L, Xml.buildDump(Seq(
        Xml.Page(3L, 1, "P&3", 24L, "2024-01-04T05:00:00Z", "u3",
          "", redirect = false, ok = true)))))
    def pipeline(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      Multimodal.xmlPagesColumn(df, "media")
        .select("gid", "page_id", "page_title", "rev_id", "page_text",
          "is_redirect", "page_ok")
    val src = dumps.toDF("gid", "media")
    val batch = pipeline(src).collect()
      .map(r => r.getLong(1) -> (r.getString(2), r.getLong(3),
        r.getString(4), r.getBoolean(5))).toMap
    assert(batch(2L) == (("P&2", 17L, "beta < body >", true)))
    val tmp = java.nio.file.Files
      .createTempDirectory("r14_stream").toFile
    tmp.deleteOnExit()
    src.coalesce(1).write.parquet(new java.io.File(tmp, "d").toString)
    val stream = spark.readStream.schema(src.schema).parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(
      pipeline(stream), "r14_xml")
    val got = spark.table("r14_xml").collect()
      .map(r => r.getLong(1) -> (r.getString(2), r.getLong(3),
        r.getString(4), r.getBoolean(5))).toMap
    assert(got == batch, s"$got vs $batch")
  }

  test("round-14 PDF page walk is a PURE MAP: pdfPagesColumn runs the " +
    "identical plan on a streaming frame and matches batch row for " +
    "row — incremental-update docs included") {
    import graft.ops.{Multimodal, Pdf}
    val s = spark
    import s.implicits._
    def p(blocks: String*) =
      Pdf.PageSpec(blocks.toVector, flate = true, indirectLength = false)
    val docs = Seq(
      (100L, Pdf.build(Seq(p("alpha body"), p("two words", "second")))),
      (200L, Pdf.appendUpdate(Pdf.build(Seq(p("base page"))),
        Seq(p("appended page")))))
    def pipeline(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      Multimodal.pdfPagesColumn(df, "media")
        .select("gid", "page_idx", "page_text", "pdf_updated", "pdf_ok")
    val src = docs.toDF("gid", "media")
    val batch = pipeline(src).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(batch((200L, 1)) == (("appended page", true, true)))
    assert(batch((100L, 1)) == (("two words\nsecond", false, true)))
    val tmp = java.nio.file.Files
      .createTempDirectory("r14_pdf_stream").toFile
    tmp.deleteOnExit()
    src.coalesce(1).write.parquet(new java.io.File(tmp, "d").toString)
    val stream = spark.readStream.schema(src.schema).parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(
      pipeline(stream), "r14_pdf")
    val got = spark.table("r14_pdf").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(got == batch, s"$got vs $batch")
  }

  test("round-14 mbox message walk is a PURE MAP: mboxMessagesColumn " +
    "runs the identical plan on a streaming frame and matches batch " +
    "row for row — QP bodies and multipart attachments included") {
    import graft.ops.{Multimodal, Mbox}
    val s = spark
    import s.implicits._
    val files = Seq(
      (100L, Mbox.build(Seq(
        Mbox.MsgSpec("a@x", Vector("l@y"), "café subj", true,
          "Thu, 2 Feb 2024 03:00:00 +0000", "<m1@x>", 1,
          "qp body é\nFrom line", None),
        Mbox.MsgSpec("b@x", Vector("l@y", "c@z"), "plain", false,
          "Thu, 3 Feb 2024 04:00:00 +0000", "<m2@x>", 0,
          "seven bit", Some(Array[Byte](5, 6, 7)))))),
      (200L, Mbox.build(Seq(
        Mbox.MsgSpec("c@x", Vector("l@y"), "b64", false,
          "Thu, 4 Feb 2024 05:00:00 +0000", "<m3@x>", 2,
          "base64 中文", None)))))
    def pipeline(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      Multimodal.mboxMessagesColumn(df, "media")
        .select("gid", "msg_id", "subject", "body", "n_parts",
          "att_digest", "msg_ok")
    val src = files.toDF("gid", "media")
    val batch = pipeline(src).collect()
      .map(r => r.getString(1) -> (r.getString(2), r.getString(3),
        r.getInt(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(batch("<m1@x>") ==
      (("café subj", "qp body é\nFrom line", 1, 0L, true)))
    assert(batch("<m2@x>") == (("plain", "seven bit", 2, 18L, true)))
    assert(batch("<m3@x>")._2 == "base64 中文")
    val tmp = java.nio.file.Files
      .createTempDirectory("r14_mbox_stream").toFile
    tmp.deleteOnExit()
    src.coalesce(1).write.parquet(new java.io.File(tmp, "d").toString)
    val stream = spark.readStream.schema(src.schema).parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(
      pipeline(stream), "r14_mbox")
    val got = spark.table("r14_mbox").collect()
      .map(r => r.getString(1) -> (r.getString(2), r.getString(3),
        r.getInt(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(got == batch, s"$got vs $batch")
  }

  test("round-14 subtitle cue walk is a PURE MAP: subtitleCuesColumn " +
    "runs the identical plan on a streaming frame and matches batch " +
    "row for row — both formats, markup stripped") {
    import graft.ops.{Multimodal, Subtitles}
    val s = spark
    import s.implicits._
    val tracks = Seq(
      (100L, Subtitles.buildSrt(Seq(
        Subtitles.Cue(1000L, 2500L, "srt cue one"),
        Subtitles.Cue(4000L, 6000L, "two\nlines")))),
      (200L, Subtitles.buildVtt(Seq(
        Subtitles.Cue(500L, 900L, "vtt cue é")), notes = true,
        italic = _ => true)))
    def pipeline(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      Multimodal.subtitleCuesColumn(df, "media")
        .select("gid", "cue_idx", "start_ms", "end_ms", "cue_text",
          "sub_vtt")
    val src = tracks.toDF("gid", "media")
    val batch = pipeline(src).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4),
          r.getBoolean(5))).toMap
    assert(batch((200L, 0)) == ((500L, 900L, "vtt cue é", true)))
    assert(batch((100L, 1)) == ((4000L, 6000L, "two\nlines", false)))
    val tmp = java.nio.file.Files
      .createTempDirectory("r14_sub_stream").toFile
    tmp.deleteOnExit()
    src.coalesce(1).write.parquet(new java.io.File(tmp, "d").toString)
    val stream = spark.readStream.schema(src.schema).parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(
      pipeline(stream), "r14_sub")
    val got = spark.table("r14_sub").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4),
          r.getBoolean(5))).toMap
    assert(got == batch, s"$got vs $batch")
  }

  test("round-14 epub walk and sniff-route-extract are PURE MAPS: " +
    "identical plans on a streaming frame, batch-identical rows") {
    import graft.ops.{Multimodal, Epub, Pdf}
    val s = spark
    import s.implicits._
    val blobs = Seq(
      (1L, Epub.build("Book S", Seq(Seq("alpha line"), Seq("beta & x")),
        Seq(1, 0))),
      (2L, Pdf.build(Seq(Pdf.PageSpec(Vector("pdf text here"),
        flate = true, indirectLength = false)))),
      (3L, "plain stream text".getBytes(java.nio.charset
        .StandardCharsets.UTF_8)))
    def pipeline(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      Multimodal.routeExtractColumn(
        Multimodal.sniffColumn(df, "media"), "fmt", "media")
        .select("gid", "fmt", "extracted")
    val src = blobs.toDF("gid", "media")
    val batch = pipeline(src).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(batch(1L) == (("epub", "beta & x\nalpha line"))) // spine order
    assert(batch(2L) == (("pdf", "pdf text here")))
    assert(batch(3L) == (("text", "plain stream text")))
    val tmp = java.nio.file.Files
      .createTempDirectory("r14_rx_stream").toFile
    tmp.deleteOnExit()
    src.coalesce(1).write.parquet(new java.io.File(tmp, "d").toString)
    val stream = spark.readStream.schema(src.schema).parquet(s"$tmp/*")
    graft.streaming.StreamingOps.runToMemorySink(
      pipeline(stream), "r14_rx")
    val got = spark.table("r14_rx").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got == batch, s"$got vs $batch")
  }
}
