package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** Structured-Streaming extensions (beyond the reference surface — it
  * has no streaming; SURVEY §2 marks the absence and §2/§7 scope this
  * as the natural incremental form of its minibatch processing).
  *
  * Two shapes:
  *  - [[densityWindowAgg]]: watermarked event-time windows accumulating
  *    the ELBO data term (Σ log-density) incrementally — the streaming
  *    analog of `Optimizer.run`'s full-data evaluation.
  *  - [[runningLogpStats]]: per-key online sufficient statistics
  *    (count, Σ logp, Σ logp²) via mapGroupsWithState — the state a
  *    streaming optimizer consumes.
  *
  * Both are standard watermark+state patterns: partial aggregation
  * map-side, state sharded by key, no driver accumulation — unchanged
  * at production stream rates.
  */
object StreamingOps {

  /** Event-time windowed Σ of an arbitrary log-density column.
    * `tsNanos` is the long-nanos event time (the testdata convention);
    * watermark/window sizes are caller-chosen. */
  def densityWindowAgg(events: DataFrame, tsNanos: Column, logp: Column,
                       keyCol: Column, watermark: String = "10 minutes",
                       windowLen: String = "5 minutes"): DataFrame =
    events
      // integer nanos→micros→timestamp: double division of epoch-nanos
      // (~1.7e18 > 2^53) would perturb events near window/watermark
      // boundaries (the same rule as sessionize/asof below); Column./
      // is double division, so bind the column and use integer `div`
      .withColumn("__ns", tsNanos.cast("long"))
      .withColumn("event_ts", timestamp_micros(expr("__ns div 1000")))
      .drop("__ns")
      .withColumn("logp", logp)
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLen), keyCol)
      .agg(count(lit(1)).as("n"), sum(col("logp")).as("sum_logp"))

  final case class LogpStats(key: String, n: Long, sumLogp: Double,
                             sumLogp2: Double)

  /** Per-key running (n, Σlogp, Σlogp²) with explicit state — emits the
    * updated statistics on every trigger. Input: (key, logp) rows. */
  def runningLogpStats(pairs: Dataset[(String, Double)])
      : Dataset[LogpStats] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[LogpStats]) =>
          var s = state.getOption.getOrElse(LogpStats(key, 0L, 0.0, 0.0))
          rows.foreach { case (_, lp) =>
            s = LogpStats(key, s.n + 1, s.sumLogp + lp, s.sumLogp2 + lp * lp)
          }
          state.update(s)
          s
      }
  }

  /** Streaming per-key EWMA ([[graft.ops.Events.ewma]]'s incremental
    * twin): state is ONE (level) double per key — bounded by key
    * cardinality, not stream length. Each micro-batch's rows fold in
    * (ts, seq) order (sorted batch-locally; the deployment contract is
    * event-time-ordered arrival across batches, as with any
    * recurrence), emitting (key, seq, value, ewma, forecast) per
    * event — forecast null on each key's first-ever event. The fold is
    * the same α·x + (1−α)·e literal recurrence, so a stream fed the
    * batch rows in order reproduces [[graft.ops.Events.ewma]] bit for
    * bit. */
  def ewmaPerKey(events: Dataset[(Long, Long, Long, Double)],
                 alpha: Double)
      : Dataset[(Long, Long, Double, Double, Option[Double])] = {
    // same domain contract as the batch twin (Events.ewma) — the
    // streaming path must fail fast where the batch path does
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    import events.sparkSession.implicits._
    val beta = 1.0 - alpha
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Double,
        (Long, Long, Double, Double, Option[Double])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: GroupState[Double]) =>
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          var have = state.exists
          var e = state.getOption.getOrElse(0.0)
          val out = sorted.map { case (_, _, seq, v) =>
            val fc = if (have) Some(e) else None
            e = if (have) alpha * v + beta * e else v
            have = true
            (key, seq, v, e, fc)
          }
          state.update(e)
          out.iterator
      }
  }

  /** Streaming per-key CUSUM ([[graft.ops.Events.cusum]]'s incremental
    * twin): state is TWO clamped cumulative sums per key — bounded by
    * key cardinality. Same batch-local (ts, seq) ordering contract as
    * [[ewmaPerKey]]; the fold is the identical
    * max(0, s + (x − target − slack)) literal recurrence, so a stream
    * fed the batch rows in order reproduces the batch fold bit for
    * bit. Emits (key, seq, value, cusum_hi, cusum_lo). */
  def cusumPerKey(events: Dataset[(Long, Long, Long, Double)],
                  target: Double, slack: Double)
      : Dataset[(Long, Long, Double, Double, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Double),
        (Long, Long, Double, Double, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: GroupState[(Double, Double)]) =>
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          var (hi, lo) = state.getOption.getOrElse((0.0, 0.0))
          val out = sorted.map { case (_, _, seq, v) =>
            hi = math.max(0.0, hi + (v - target - slack))
            lo = math.max(0.0, lo + (target - slack - v))
            (key, seq, v, hi, lo)
          }
          state.update((hi, lo))
          out.iterator
      }
  }

  /** Streaming near-duplicate suppression: keep the first document per
    * full MinHash signature seen within the watermark horizon. The
    * signature is a pure per-row map ([[graft.ops.Dedup
    * .minhashSignatures]] — no explode, no aggregation), so the only
    * stateful operator is the signature-keyed dedup itself; state is
    * sharded by signature and evicted at the watermark, which is the
    * shape that survives production stream rates. `eventTime` must be
    * a timestamp column name on `docs`. */
  def signatureDedup(docs: DataFrame, textCol: String, idCol: String,
                     eventTime: String,
                     watermark: String = "10 minutes"): DataFrame = {
    val sigCols = (0 until graft.ops.Dedup.NumPerms).map(i => s"sig$i")
    graft.ops.Dedup.minhashSignatures(docs, textCol, idCol,
        keep = Seq(eventTime))
      .withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark(sigCols)
  }

  /** First occurrence per key with EXPLICIT custom state
    * (`flatMapGroupsWithState`): emits a (key, payload) row only the
    * first time the key is seen; state is a per-key marker evicted by
    * processing-time timeout, bounding memory on unbounded key spaces
    * (the hand-rolled form of signature dedup, for when eviction
    * policy or emitted payloads need control beyond
    * `dropDuplicatesWithinWatermark`). */
  def statefulFirstPerKey(pairs: Dataset[(String, String)],
                          stateTimeout: String = "1 hour")
      : Dataset[(String, String)] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, String)](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            rows.foreach(_ => ()) // drain
            // GroupState contract: every invocation CANCELS the pending
            // timeout — it must be re-armed on each call, or a key that
            // keeps arriving would pin its state forever
            state.setTimeoutDuration(stateTimeout)
            Iterator.empty
          } else {
            state.update(true)
            state.setTimeoutDuration(stateTimeout)
            rows.take(1)
          }
      }
  }

  /** Streaming per-key admission cap — the incremental form of the
    * per-domain cap ([[graft.ops.Sampling.domainCap]]): each key
    * admits at most `cap` rows and drops the rest. Admission follows
    * arrival order ACROSS micro-batches (earlier batches win);
    * within one micro-batch the group iterator's order after the
    * state shuffle is engine-chosen, so the admitted subset of a
    * single batch is bounded but arbitrary — callers needing a
    * canonical member set run the batch op over the archive. State
    * is ONE counter per key — bounded by key cardinality, never
    * stream length — evicted after `stateTimeout` of silence. */
  def capPerKey(pairs: Dataset[(String, String)], cap: Int,
                stateTimeout: Option[String] = Some("1 hour"))
      : Dataset[(String, String)] = {
    require(cap > 0, s"bad cap $cap")
    import pairs.sparkSession.implicits._
    // NB: a processing-time timeout makes the streaming engine
    // schedule timeout-only batches indefinitely — callers that drive
    // a query with processAllAvailable (tests, bounded backfills)
    // pass stateTimeout = None; long-running ingest keeps the default
    // so idle domains evict
    val mode = stateTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[Int, (String, String)](
        OutputMode.Append(), mode) {
        (_: String, rows: Iterator[(String, String)],
         state: GroupState[Int]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(0)
            val admit = rows.take(math.max(0, cap - seen)).toVector
            state.update(seen + admit.size)
            stateTimeout.foreach(state.setTimeoutDuration)
            admit.iterator
          }
      }
  }

  /** Streaming no-split greedy packer — the incremental form of
    * [[graft.ops.Sampling.packNoSplit]]: the walk state per shard is
    * just (current bin, current fill) — two longs, bounded by the
    * shard count, never the stream length — so a shard's greedy walk
    * continues seamlessly across micro-batches. Within one
    * micro-batch the group's rows are sorted by id before walking
    * (the state shuffle loses arrival order); across batches the
    * packed layout equals the batch packer exactly whenever arrival
    * order respects id order per shard — the natural property of an
    * id-ordered ingest (proven stream==batch in StreamingSpec). The
    * per-group sort buffers one micro-batch's shard slice, not the
    * stream. */
  def packNoSplitStream(docs: DataFrame, idCol: String, textCol: String,
                        window: Int, nShards: Int)
      : Dataset[(Long, Long, Long, Long, Long, Boolean)] = {
    require(window > 0 && nShards > 0)
    import docs.sparkSession.implicits._
    docs.select(
        pmod(graft.ops.TextAnalysis.tokenHash(col(idCol).cast("string")),
          lit(nShards.toLong)).as("shard"),
        col(idCol).cast("long").as("id"),
        size(graft.ops.TextAnalysis.tokens(col(textCol))).cast("long")
          .as("n"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long),
        (Long, Long, Long, Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          // (0,0) start replays the batch kernel's first-doc branch:
          // t <= window always, so fill+t<=window lands the first doc
          // in bin 0 with fill=t — identical to the batch reset
          var (bin, fill) = state.getOption.getOrElse((0L, 0L))
          val out = rows.toVector.sortBy(_._2).map { case (_, id, n) =>
            val t = math.min(n, window.toLong)
            if (fill + t <= window) fill += t
            else { bin += 1L; fill = t }
            (shard, id, n, t, bin, n > window)
          }
          state.update((bin, fill))
          out.iterator
      }
  }

  /** Streaming length-bucketed batching — the incremental form of
    * [[graft.ops.Sampling.lengthBucketBatches]]: state per
    * (shard, bucket) key is ONE counter (docs assigned so far), so
    * batch/slot assignment continues across micro-batches; rows sort
    * by id within a micro-batch group (the state shuffle loses
    * arrival order), and the layout equals the batch form exactly
    * whenever arrival order respects id order per (shard, bucket) —
    * the same contract [[packNoSplitStream]] documents. State is
    * bounded by nShards × live buckets, never stream length. */
  def lengthBucketBatchesStream(docs: DataFrame, idCol: String,
                                textCol: String, granularity: Int,
                                batchSize: Int, nShards: Int)
      : Dataset[(Long, Long, Long, Long, Long, Long)] = {
    require(granularity > 0 && batchSize > 0 && nShards > 0)
    import docs.sparkSession.implicits._
    docs.select(
        pmod(graft.ops.TextAnalysis.tokenHash(col(idCol).cast("string")),
          lit(nShards.toLong)).as("shard"),
        col(idCol).cast("long").as("id"),
        size(graft.ops.TextAnalysis.tokens(col(textCol))).cast("long")
          .as("n"))
      .withColumn("bucket",
        expr(s"(n + ${granularity - 1}) div $granularity"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(r => (r._1, r._4))
      .flatMapGroupsWithState[Long,
        (Long, Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long), rows: Iterator[(Long, Long, Long, Long)],
         state: GroupState[Long]) =>
          var seen = state.getOption.getOrElse(0L)
          val out = rows.toVector.sortBy(_._2).map { case (_, id, n, _) =>
            val rank = seen
            seen += 1L
            (key._1, key._2, id, n, rank / batchSize, rank % batchSize)
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Streaming UniMax realization — the APPLY side of the fit/apply
    * split: per-language epoch factors come PRE-FITTED (computed once
    * on the reference corpus by [[graft.ops.Sampling
    * .unimaxAllocation]], f_l = alloc_l/toks_l) and ride the plan as
    * a literal `when` chain, so the (doc, epoch) emitter is a
    * STATELESS per-row map + explode — no join, no state, no
    * watermark. Row-identical to the batch [[graft.ops.Sampling
    * .unimaxRealize]] on the fitted corpus (StreamingSpec). */
  def unimaxRealizeStream(docs: DataFrame, idCol: String,
                          groupCol: String,
                          factors: Map[String, Double]): DataFrame =
    graft.ops.Sampling.unimaxRealizeApply(docs, idCol, groupCol, factors)

  /** Streaming corpus curation — the incremental form of the batch
    * quality-floor → dedup composition (q_pipeline_curation): the
    * quality score is a stateless per-row map, so the only stateful
    * operator remains the signature-keyed dedup; state stays sharded
    * by signature and watermark-bounded. */
  def streamingCuration(docs: DataFrame, textCol: String, idCol: String,
                        eventTime: String, minQuality: Double,
                        watermark: String = "10 minutes"): DataFrame =
    signatureDedup(
      docs.where(graft.ops.TextAnalysis.qualityScore(col(textCol)) >=
        lit(minQuality)),
      textCol, idCol, eventTime, watermark)

  /** Stateless streaming blocklist filter: ONE Aho–Corasick pass per
    * incoming doc — the [[graft.ops.Blocklist]] automaton is a JVM
    * plan constant, so this is a pure per-row map (no state, no
    * shuffle, no watermark): the shape that keeps a banned-phrase
    * stage at stream rate whatever the pattern count. Emits
    * per-pattern counts, the total, and the blocked flag. */
  def blocklistStream(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame = {
    val m = aggregate(col("c"), lit(0L), (a, v) => a + v)
    docs.select(col(idCol),
        graft.ops.Blocklist.matchCounts(col(textCol)).as("c"))
      .select(col(idCol), col("c"), m.as("n_matches"),
        (m > 0).as("blocked"))
  }

  /** FIT→APPLY streaming CCNet chunk filter: the bigram LM fitted on
    * the ARCHIVE rides as the static side of stream-static joins
    * (persist both count tables); each incoming doc explodes to
    * disjoint `window`-token chunks, every chunk bigram picks up its
    * fitted counts BEFORE the one keyed aggregation (stream-static
    * join then agg — the supported streaming shape; no post-agg
    * join), and q_quality_ccnet's INTEGER gate (Σ floor(−ln p · fx) ≤
    * τ_fx · n) marks keep/drop. Chunks with < 2 tokens have no
    * bigrams and are dropped here (the batch query counts them as
    * n_unscored). Returns (cid, n_tok, chunk_ck, nb, sfp, kept). */
  def ccnetApplyStream(docs: DataFrame, textCol: String, idCol: String,
                       lm: graft.ops.NgramLm.Lm, window: Int,
                       tauFx: Long, fx: Double,
                       chunkCap: Long = 4096L): DataFrame = {
    val M = graft.ops.Dedup.NgramFpMod
    // bigram rows CARRYING the per-chunk payload through the explode
    // ([[graft.ops.NgramLm.bigramRows]]'s construction — a payload
    // re-join here would be a stream-stream join, which streaming
    // rightly refuses; the payload rides each bigram row instead and
    // folds back via first() in the single aggregation)
    val bg = graft.ops.TextAnalysis
      .chunks(docs, textCol, idCol, window, window)
      .select((col(idCol) * lit(chunkCap) + col("chunk_id")).as("cid"),
        col("n_tok"),
        graft.ops.TextAnalysis.tokenHash(col("chunk")).as("chunk_ck"),
        graft.ops.Dedup.tokenHashList(col("chunk")).as("__hl"))
      .where(size(col("__hl")) >= 2)
      .select(col("cid"), col("n_tok"), col("chunk_ck"), explode(
        transform(slice(col("__hl"), lit(1), size(col("__hl")) - 1),
          (h, i) => struct(h.as("w1"),
            ((h * lit(31L) + element_at(col("__hl"), i + lit(2))) %
              lit(M)).as("b")))).as("u"))
      .select(col("cid"), col("n_tok"), col("chunk_ck"),
        col("u.w1").as("w1"), col("u.b").as("b"))
    val fp = floor(-log((col("cb") + lit(1.0)) /
      (col("cu") + lit(lm.vocab)).cast("double")) * lit(fx))
      .cast("long")
    bg
      .join(lm.bigrams, Seq("b"), "left")
      .join(lm.prefixes, Seq("w1"), "left")
      .na.fill(0L, Seq("cb", "cu"))
      .select(col("cid"), col("n_tok"), col("chunk_ck"), fp.as("fp"))
      .groupBy("cid")
      .agg(first(col("n_tok")).as("n_tok"),
        first(col("chunk_ck")).as("chunk_ck"),
        count(lit(1)).as("nb"), sum(col("fp")).as("sfp"))
      .select(col("cid"), col("n_tok"), col("chunk_ck"), col("nb"),
        col("sfp"), (col("sfp") <= lit(tauFx) * col("nb")).as("kept"))
  }

  /** Streaming eval decontamination (FIT→APPLY): the TRAIN side's
    * distinct 5-gram fingerprints are fitted once on the archive and
    * ride as the static side of a stream-static left-semi join
    * (persist it); each incoming eval candidate explodes to its
    * fingerprints, any hit marks the doc leaky, and the per-doc
    * verdict folds back in ONE keyed aggregation (max of the hit
    * flag). Stateless across triggers — the batch q_sample_evalsafe
    * gate applied at ingest time. Returns (idCol, n_fps, leaky). */
  def evalSafeStream(docs: DataFrame, textCol: String, idCol: String,
                     trainFps: DataFrame, n: Int = 5): DataFrame =
    docs
      .select(col(idCol), explode_outer(
        graft.ops.TextHashExpressions.ngramFps(col(textCol), n))
        .as("g"))
      .join(trainFps.select(col("g"), lit(1).as("__hit")), Seq("g"),
        "left")
      .groupBy(col(idCol))
      .agg(count(col("g")).as("n_fps"),
        (max(coalesce(col("__hit"), lit(0))) === 1).as("leaky"))

  /** Bloom-prefiltered streaming ingest dedup: the archive's portable
    * [[graft.ops.Bloom]] filter is a plan constant, so the probe is a
    * STATELESS per-row map — rows whose signature key the filter
    * provably misses are new against the archive with no state and no
    * shuffle (exact, bloom has no false negatives); the ambiguous
    * sliver (`bloom_new = false`, ~fpp of the stream plus true dups)
    * is flagged for the exact keyed check downstream. Chain
    * [[signatureDedup]] after it to also dedup the stream against
    * itself. The bloom refreshes per archive epoch — rebuild and
    * restart the query (a plan constant, like the IVF centroids). */
  def bloomPrefilter(docs: DataFrame, textCol: String, idCol: String,
                     bits: Array[Long], mBits: Int, kHashes: Int,
                     keep: Seq[String] = Nil): DataFrame =
    graft.ops.Dedup.minhashSignatures(docs, textCol, idCol, keep = keep)
      .withColumn("bloom_new",
        !graft.ops.Bloom.mightContain(bits, graft.ops.Dedup.sigKey(),
          mBits, kHashes))

  /** Stream-STATIC near-dup tagging: every incoming doc's band rows
    * equi-join the ARCHIVE's (persisted) band table — the
    * stream-static join template: stateless, no watermark, the static
    * side re-read per trigger (persist it). Emits one collision row
    * (idCol, corpus_id, est_jaccard) per (doc, archive-doc) band hit;
    * downstream policy (threshold, best-per-doc) aggregates. The
    * approximate sibling of [[bloomPrefilter]]'s exact-signature
    * probe, matching [[graft.ops.Dedup.newNearDupsAgainstCorpus]]'s
    * batch scoring pair for pair. */
  def nearDupTags(docs: DataFrame, corpusBands: DataFrame,
                  textCol: String, idCol: String): DataFrame = {
    val b = graft.ops.Dedup.bandRowsOf(docs, textCol, idCol)
    val agree = size(filter(
      zip_with(col("x.sig"), col("y.sig"), (a, b) => a === b), w => w))
    b.as("x").join(corpusBands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key"))
      .select(col(s"x.$idCol").as(idCol),
        col(s"y.$idCol").as("corpus_id"),
        (agree.cast("double") /
          lit(graft.ops.Dedup.NumPerms.toDouble)).as("est_jaccard"))
  }

  /** Streaming perplexity scoring under a batch-trained bigram LM.
    * The per-doc aggregate would register as an unbounded stateful
    * streaming aggregation if planned directly, yet it is
    * micro-batch-local by construction (a doc is ONE input row, so
    * its bigrams never span triggers) — so score each micro-batch
    * with the batch operator via foreachBatch: the LM count tables
    * join in batch-static, no streaming state is ever created, and
    * the per-doc results are exactly [[graft.ops.NgramLm.perplexity]]
    * semantics. Blocks until the backlog drains; feeds each scored
    * micro-batch to `sink`. */
  /** Streaming cluster assignment — [[graft.ops.Dedup
    * .assignToClusters]] run per micro-batch against a FIXED archive
    * (the foreachBatch composition, like [[streamingPerplexity]]):
    * the archive's signatures, band rows, and cluster map are
    * batch-static state the caller persists once per archive epoch;
    * each micro-batch pays only its own probe joins. A doc's adoption
    * depends only on (doc, archive), so stream == batch row-for-row
    * under ANY slicing — no cross-batch state at all. Blocks until
    * the backlog drains; returns the processed batch count. */
  def assignToClustersStream(docs: DataFrame, archive: DataFrame,
                             textCol: String, idCol: String,
                             maxBucket: Int = 0,
                             threshold: Double = 0.5)
                            (sink: DataFrame => Unit): Long = {
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.ops.Dedup.assignToClusters(batch, archive,
          textCol, idCol, maxBucket, threshold))
        nBatches.incrementAndGet()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    nBatches.get()
  }

  def streamingPerplexity(docs: DataFrame, textCol: String,
                          idCol: String, lm: graft.ops.NgramLm.Lm)
                         (sink: DataFrame => Unit): Long = {
    // the count tables are lazy full-corpus aggregates; without a
    // cache every micro-batch would re-tokenize and re-aggregate the
    // whole training corpus. Persist only what the CALLER has not
    // (persist() returns the same object, so unpersisting a frame the
    // caller cached would silently evict THEIR cache), and release
    // exactly ours on every exit path — including a failed start().
    val none = org.apache.spark.storage.StorageLevel.NONE
    val ourBigrams = lm.bigrams.storageLevel == none
    val ourPrefixes = lm.prefixes.storageLevel == none
    val cached = lm.copy(
      bigrams = if (ourBigrams) lm.bigrams.persist() else lm.bigrams,
      prefixes = if (ourPrefixes) lm.prefixes.persist() else lm.prefixes)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    try {
      val q = docs.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          sink(graft.ops.NgramLm.perplexity(batch, textCol, idCol, cached))
          nBatches.incrementAndGet()
          ()
        }
        .start()
      try q.processAllAvailable()
      finally q.stop() // never leave an orphaned query pulling batches
    } finally {
      if (ourBigrams) cached.bigrams.unpersist()
      if (ourPrefixes) cached.prefixes.unpersist()
    }
    nBatches.get()
  }

  /** Streaming k-means maintenance (mini-batch k-means, Sculley 2010,
    * with EXACT registers): per-cell (count, per-dim int64 fixed-point
    * sum) state lives on the driver (k·d longs — model-sized), each
    * micro-batch contributes ONE assignment scan + ONE hash aggregate
    * of batch registers, merged cell-wise. Because the registers are
    * exact integers, frozen-centroid accumulation over any
    * micro-batch split equals the batch single-round registers BIT
    * FOR BIT (order-independence is the whole point of the
    * fixed-point trick); with `updateCentroids = true` the centroids
    * refresh after every batch — the online quantizer that tracks a
    * drifting stream. Returns (final centroids, per-cell counts,
    * micro-batches processed). */
  def streamingKmeans(stream: DataFrame, idCol: String, embCol: String,
                      init: Array[(Long, Seq[Double])],
                      updateCentroids: Boolean = false)
      : (Array[(Long, Seq[Double])], Map[Long, Long], Long) = {
    import graft.ops.Similarity
    require(init.nonEmpty)
    val dim = init.head._2.length
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val state = scala.collection.mutable.Map[Long, (Long, Array[Long])]()
    @volatile var cur = init
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cells = Similarity.cellAssignments(batch, idCol, embCol, cur)
        val aggs = count(lit(1)).as("n") +: (0 until dim).map(i =>
          sum(round(element_at(col(embCol), i + 1).cast("double") *
            lit(Similarity.KmeansFxScale)).cast("long")).as(s"s$i"))
        cells.groupBy("cell").agg(aggs.head, aggs.tail: _*)
          .collect().foreach { r =>
            val cid = r.getLong(0)
            val (n0, s0) = state.getOrElse(cid, (0L, new Array[Long](dim)))
            val s1 = s0.clone()
            (0 until dim).foreach(i => s1(i) += r.getLong(2 + i))
            state.update(cid, (n0 + r.getLong(1), s1))
          }
        if (updateCentroids)
          // refresh over INIT's cells, falling back to the seed
          // centroid for any cell no batch has hit yet — rebuilding
          // from the state map alone would permanently drop every
          // centroid absent from the early batches (the first
          // micro-batch might populate 3 of 10 cells, and assignment
          // against a 3-cell model can never repopulate the rest)
          cur = init.map { case (cid, c0) =>
            state.get(cid) match {
              case Some((n, s)) if n > 0 =>
                (cid, s.toIndexedSeq
                  .map(_.toDouble / Similarity.KmeansFxScale / n.toDouble)
                  : Seq[Double])
              case _ => (cid, c0)
            }
          }
        nBatches.incrementAndGet()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // same init-fallback merge as the in-stream refresh (`cur`): a
    // seed cell never hit by any micro-batch stays in the returned
    // model at its seed centroid with count 0 — rebuilding from the
    // state map alone would silently drop it, and a model missing a
    // cell can never assign to it downstream
    val cents = init.map { case (cid, c0) =>
      state.get(cid) match {
        case Some((n, s)) if n > 0 =>
          (cid, s.toIndexedSeq
            .map(_.toDouble / Similarity.KmeansFxScale / n.toDouble)
            : Seq[Double])
        case _ => (cid, c0)
      }
    }.sortBy(_._1)
    val counts = init.map { case (cid, _) =>
      cid -> state.get(cid).map(_._1).getOrElse(0L) }.toMap
    (cents, counts, nBatches.get())
  }

  /** Online variational inference: `stepsPerBatch` Adam ascent steps
    * per micro-batch via foreachBatch — the streaming form of the
    * reference's minibatch SGD loop (`model.py:255-269`), with
    * optimizer state (Adam moments + the module tree's θ) carried
    * across micro-batches on the driver. `totalRows` is the population
    * size estimate that scales the data term against the KL (the
    * streaming analog of N/batch). Parameters are readable from the
    * module tree at any trigger boundary. Blocks until the current
    * backlog is drained, then returns the number of micro-batches
    * processed. */
  def onlineElbo(elbo: graft.optimize.Elbo, stream: DataFrame,
                 adam: graft.optimize.Adam, totalRows: Long,
                 stepsPerBatch: Int = 1): Long = {
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        elbo.stepOnBatch(batch, (id * stepsPerBatch).toInt, adam,
          totalRows, stepsPerBatch)
        nBatches.incrementAndGet()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    nBatches.get()
  }

  /** An in-flight session: [startNs, endNs] with its event count. */
  final case class OpenSession(startNs: Long, endNs: Long, n: Long)

  /** A session emitted once the watermark passes its gap deadline. */
  final case class ClosedSession(key: Long, start_ns: Long, end_ns: Long,
                                 n_events: Long)

  /** Event-time streaming sessionization — the incremental form of
    * [[graft.ops.Events.sessionize]]: per-key gap-merged sessions held
    * as explicit state (`flatMapGroupsWithState` + EventTimeTimeout),
    * emitted exactly when the watermark passes a session's
    * `end + gap` deadline, so a closed session can never be reopened
    * by in-watermark late data. Out-of-order events merge into (and
    * can bridge) open sessions; state per key is the open-session
    * list — bounded by the watermark horizon, sharded by key.
    *
    * Same int64-nanos convention as the batch operator; the derived
    * event-time column only drives the watermark clock. */
  def sessionizeStream(events: DataFrame, keyCol: String, tsNanos: String,
                       gapNanos: Long, watermarkDelay: String = "0 seconds")
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    require(gapNanos > 0, s"bad session gap $gapNanos")
    // exact integer microseconds for the event-time clock: double
    // division of epoch-nanos (~1.7e18 > 2^53) would perturb the
    // watermark by sub-microsecond amounts at boundaries
    val prepared = events
      .withColumn("__ets",
        timestamp_micros(expr(s"`$tsNanos` div 1000")))
      .select(col(keyCol).cast("long").as("k"),
        col(tsNanos).cast("long").as("t"), col("__ets"))
      .withWatermark("__ets", watermarkDelay)
    prepared.as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[OpenSession], ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[List[OpenSession]]) =>
          val existing = state.getOption.getOrElse(Nil)
          val incoming = rows.map(r => OpenSession(r._2, r._2, 1L)).toList
          val merged =
            if (incoming.isEmpty) existing
            else {
              val all = (existing ++ incoming)
                .sortBy(s => (s.startNs, s.endNs))
              all.tail.foldLeft(List(all.head)) { (acc, s) =>
                val h = acc.head
                if (s.startNs - h.endNs <= gapNanos)
                  OpenSession(h.startNs, math.max(h.endNs, s.endNs),
                    h.n + s.n) :: acc.tail
                else s :: acc
              }.reverse
            }
          val wm = state.getCurrentWatermarkMs()
          // close STRICTLY in nanos: a session whose end+gap merely
          // truncates to the watermark millisecond is NOT final — an
          // in-watermark event at that millisecond could still extend
          // it, and a closed session must never reopen
          val (closed, open) = merged.partition(s =>
            s.endNs + gapNanos < wm * 1000000L)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // the GroupState contract cancels any pending timeout on
            // every invocation; re-arm past the earliest open deadline
            // (+1 ms so the watermark strictly exceeds it; strictly
            // beyond the current watermark, as the API requires)
            state.setTimeoutTimestamp(math.max(
              open.map(s => (s.endNs + gapNanos) / 1000000L + 1).min,
              wm + 1))
          }
          closed.iterator.map(s => ClosedSession(key, s.startNs, s.endNs, s.n))
      }
  }

  /** Buffered state for the streaming as-of join: right-side versions
    * still relevant, and left rows awaiting watermark finality. */
  final case class AsofState(rights: List[(Long, Long, Double)],
                             lefts: List[(Long, Long, Double)])

  /** A left row emitted with its point-in-time right match (None when
    * no right version at-or-before it exists). */
  final case class AsofOut(key: Long, seq: Long, ts_ns: Long, value: Double,
                           asof_seq: Option[Long], asof_value: Option[Double])

  /** Event-time streaming as-of (temporal) join — the stream-stream
    * form of [[graft.ops.Events.asofJoin]], the enrichment Flink calls
    * a temporal join: each left row picks up the LATEST right version
    * with `right.ts <= left.ts` (ties to the greatest seq), decided
    * only once the watermark guarantees no earlier-or-equal right
    * version can still arrive. Left rows buffer in state until
    * `ts <= watermark`, then match and emit exactly once.
    *
    * State per key: pending lefts drain at the watermark, and of the
    * right versions at-or-before the watermark only the LATEST is
    * retained (any older one is shadowed for every future left, which
    * must have ts > watermark). That latest version is the join's
    * version store — like Flink's temporal join it lives as long as
    * the key may see traffic, so steady state is O(1) per active key;
    * pass `idleRetention` (ms of event time) to evict keys idle past
    * the watermark and bound state by ACTIVE keys instead (a left
    * arriving after eviction sees no match, exactly as if the
    * version had expired). */
  def asofJoinStream(left: DataFrame, right: DataFrame, keyCol: String,
                     tsNanos: String, seqCol: String, valCol: String,
                     watermarkDelay: String = "0 seconds",
                     idleRetention: Option[Long] = None)
      : Dataset[AsofOut] = {
    import left.sparkSession.implicits._
    def prep(df: DataFrame, side: Int) = df.select(
      col(keyCol).cast("long").as("k"), col(tsNanos).cast("long").as("t"),
      col(seqCol).cast("long").as("q"), col(valCol).cast("double").as("v"),
      lit(side).as("side"))
    // __ets stays in the frame: the stateful operator needs the
    // watermarked event-time column in its child plan. Integer
    // microseconds — see sessionizeStream on double-division drift.
    val u = prep(left, 1).unionByName(prep(right, 0))
      .withColumn("__ets", timestamp_micros(expr("t div 1000")))
      .withWatermark("__ets", watermarkDelay)
      .as[(Long, Long, Long, Double, Int, java.sql.Timestamp)]
    u.groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long,
         rows: Iterator[(Long, Long, Long, Double, Int, java.sql.Timestamp)],
         state: GroupState[AsofState]) =>
          val s0 = state.getOption.getOrElse(AsofState(Nil, Nil))
          var rights = s0.rights
          var lefts = s0.lefts
          var sawRows = false
          rows.foreach { r =>
            sawRows = true
            if (r._5 == 0) rights = (r._2, r._3, r._4) :: rights
            else lefts = (r._2, r._3, r._4) :: lefts
          }
          val wmMs = state.getCurrentWatermarkMs()
          val wmNs = wmMs * 1000000L
          // finality must be STRICT: a right row in the watermark
          // millisecond itself is not late, so a left row there could
          // still gain a better match — only lefts strictly below the
          // watermark are decided
          val (ready, pending) = lefts.partition(_._1 < wmNs)
          val out = ready.sortBy(l => (l._1, l._2)).map { l =>
            val cand = rights.filter(r => r._1 <= l._1)
            if (cand.isEmpty) AsofOut(key, l._2, l._1, l._3, None, None)
            else {
              val m = cand.maxBy(r => (r._1, r._2))
              AsofOut(key, l._2, l._1, l._3, Some(m._2), Some(m._3))
            }
          }
          // retain right versions still reachable by future lefts:
          // all at-or-after the watermark, plus the single latest
          // strictly before it (everything older is shadowed)
          val (future, past) = rights.partition(_._1 >= wmNs)
          val keepPast = if (past.isEmpty) Nil
            else List(past.maxBy(r => (r._1, r._2)))
          val rights2 = future ++ keepPast
          // idle ⟺ this timeout fired with NO new rows and NO pending
          // lefts at entry. A pending-DRAIN timeout (armed to flush
          // buffered lefts) must not evict the version store the
          // moment it fires — that would make a later left miss a
          // match the un-evicted key would have made; after a drain,
          // the idle clock is armed below and eviction waits a full
          // idleRetention of event time with no traffic.
          val idledOut = state.hasTimedOut && !sawRows &&
            s0.lefts.isEmpty && idleRetention.isDefined
          if ((pending.isEmpty && rights2.isEmpty) || idledOut)
            state.remove()
          else {
            state.update(AsofState(rights2, pending))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                pending.map(_._1 / 1000000L + 1).min, wmMs + 1))
            else idleRetention.foreach(ret =>
              state.setTimeoutTimestamp(math.max(wmMs + ret, wmMs + 1)))
          }
          out.iterator
      }
  }

  /** Streaming-funnel state: events awaiting watermark finality and
    * the step times fixed so far (−1 = step not reached). */
  final case class FunnelState(pending: List[(Long, Int)],
                               steps: List[Long], done: Boolean)

  /** One completed conversion, emitted exactly once per key. */
  final case class FunnelConversion(key: Long, stepTs: Seq[Long])

  /** Event-time streaming funnel — the incremental form of
    * [[graft.ops.Events.funnel]]: emits a key's conversion row the
    * moment its LAST step becomes watermark-final.
    *
    * Why this is exact: late events below the watermark are dropped,
    * so the per-key FINAL event sequence grows in ascending-ts order
    * — and first-touch step times over a ts-ordered growing sequence
    * never revise (a future event has a larger ts than every fixed
    * step). Events buffer in state only until `ts` falls strictly
    * below the watermark, then fold into the step vector in ts order
    * and are discarded: steady state per key is k step times + the
    * in-flight watermark window, and a completed key keeps only its
    * k-long vector (the exactly-once emission guard).
    *
    * `stepCol` is the 0-based step index of the event (callers map
    * event types; non-step events must be filtered out upstream). */
  def funnelStream(df: DataFrame, keyCol: String, tsNanos: String,
                   stepCol: String, nSteps: Int,
                   watermarkDelay: String = "0 seconds")
      : Dataset[FunnelConversion] = {
    require(nSteps >= 1, s"bad step count $nSteps")
    import df.sparkSession.implicits._
    val u = df.select(col(keyCol).cast("long").as("k"),
        col(tsNanos).cast("long").as("t"),
        col(stepCol).cast("int").as("s"))
      .where(col("s") >= 0 && col("s") < nSteps)
      .withColumn("__ets", timestamp_micros(expr("t div 1000")))
      .withWatermark("__ets", watermarkDelay)
      .as[(Long, Long, Int, java.sql.Timestamp)]
    u.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelConversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, Int, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          val s0 = state.getOption.getOrElse(
            FunnelState(Nil, List.fill(nSteps)(-1L), done = false))
          if (s0.done) { rows.foreach(_ => ()); Iterator.empty }
          else {
            var pending = s0.pending
            rows.foreach(r => pending = (r._2, r._3) :: pending)
            val wmNs = state.getCurrentWatermarkMs() * 1000000L
            // strict finality, like the as-of join: only events
            // strictly below the watermark fold in
            val (ready, stillPending) = pending.partition(_._1 < wmNs)
            val steps = s0.steps.toArray
            ready.sortBy(e => (e._1, e._2)).foreach { case (ts, j) =>
              if (steps(j) < 0 &&
                (j == 0 || (steps(j - 1) >= 0 && ts > steps(j - 1))))
                steps(j) = ts
            }
            val completed = steps(nSteps - 1) >= 0
            if (completed) state.update(
              FunnelState(Nil, steps.toList, done = true))
            else {
              state.update(FunnelState(stillPending, steps.toList,
                done = false))
              if (stillPending.nonEmpty)
                state.setTimeoutTimestamp(math.max(
                  stillPending.map(_._1 / 1000000L + 1).min,
                  state.getCurrentWatermarkMs() + 1))
            }
            if (completed) Iterator.single(
              FunnelConversion(key, steps.toSeq))
            else Iterator.empty
          }
      }
  }

  final case class HllEstimate(key: String, hll_estimate: Double,
                               n_seen: Long, sum_rho: Long)

  /** Streaming per-key cardinality: the portable HLL registers live
    * as per-key state (`mapGroupsWithState`, m bytes per key — state
    * bounded by key count, NOT stream length), updated register-wise
    * max per micro-batch; every trigger emits the key's refreshed
    * estimate. The (bucket, rho) bits come from the SAME
    * [[graft.ops.Sketches.hllParts]] columns as the batch sketch and
    * the estimate from the shared scalar formula, so streaming ==
    * batch register tables hold by construction. Input: (key, value).
    */
  def streamingHllCardinality(pairs: Dataset[(String, String)], b: Int = 10)
      : Dataset[HllEstimate] = {
    import pairs.sparkSession.implicits._
    require(b >= 4 && b <= 20, s"bad HLL precision b=$b")
    val m = 1 << b
    val (bucket, rho) = graft.ops.Sketches.hllParts(col("_2"), b)
    pairs.toDF("_1", "_2")
      .select(col("_1"), bucket.as("_2"), rho.as("_3"))
      .as[(String, Long, Int)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long, Int)],
         state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          rows.foreach { case (_, bk, r) =>
            if (r > regs(bk.toInt)) regs(bk.toInt) = r.toByte
          }
          state.update(regs)
          var nSeen = 0L; var sumRho = 0L; var se = 0.0
          var i = 0
          while (i < m) {
            if (regs(i) > 0) {
              nSeen += 1; sumRho += regs(i)
              se += math.pow(2.0, -regs(i).toDouble)
            }
            i += 1
          }
          HllEstimate(key,
            graft.ops.Sketches.estimateFromRegisters(m, nSeen, se),
            nSeen, sumRho)
      }
  }

  /** Convenience: run a streaming query over a parquet directory to a
    * memory sink and block until the backlog is processed — the local
    * smoke-test harness for streaming ops. Returns the sink table name.
    */
  /** Streaming media dedup — the streaming twin of
    * q_multimodal_imagededup / q_multimodal_audiodedup's group
    * structure: hash the binary column with the REAL decoder
    * (stream-safe batched map — bytes never shuffle, never enter
    * state), then keep the first row per perceptual key within the
    * watermark. State holds only (key, timestamp) markers, bounded by
    * distinct media keys in the watermark window, never by stream
    * length or media bytes. */
  /** Streaming admission pipeline — the ingest-side twin of
    * q_pipeline_attrition's gate chain: the three STATELESS gates
    * (quality floor, min length, langid) evaluate per-row, then
    * watermarked keep-first dedup on the 10-token normalized-prefix
    * key (templated boilerplate). State holds only (key, ts)
    * markers for passers inside the watermark — bounded by distinct
    * prefix keys, never stream length; text never enters state. */
  def admissionStream(docs: DataFrame, textCol: String,
                      eventTime: String,
                      watermark: String = "1 hour"): DataFrame = {
    import graft.ops.TextAnalysis
    docs
      .where(TextAnalysis.qualityScore(col(textCol)) >= 0.7 &&
        TextAnalysis.wordCount(col(textCol)) >= 25 &&
        TextAnalysis.langId(col(textCol)) =!= "und")
      .withColumn("__k", array_join(slice(
        split(TextAnalysis.normalize(col(textCol)), " "), 1, 10), " "))
      .withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark(Seq("__k"))
  }

  def mediaDedupStream(docs: DataFrame, mediaCol: String, kind: String,
                       eventTime: String, watermark: String = "1 hour")
      : DataFrame = {
    val keyed = kind match {
      case "image" => graft.ops.Multimodal.imageHashColumn(docs, mediaCol)
        .withColumn("mkey", col("ahash64"))
      case "audio" => graft.ops.Multimodal
        .audioFingerprintColumn(docs, mediaCol)
        .withColumn("mkey", col("afp").cast("long"))
      case other => throw new IllegalArgumentException(
        s"unknown media kind '$other' (image | audio)")
    }
    keyed.drop(mediaCol) // bytes must not enter the dedup state
      .withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark(Seq("mkey"))
  }

  /** Steady-state bitext mining: arriving side-0 vectors mine against
    * the persisted [[graft.ops.Similarity.bitextArchive]] index (the
    * LASER deployment shape — target-side neighborhood statistics are
    * baked into the index, queries only compute their own). Each
    * side-0 row's margin depends only on itself and the static
    * archive, so the stream is batch-split invariant: union of
    * micro-batch outputs == the batch [[graft.ops.Similarity
    * .bitextMineAgainst]] row for row (StreamingSpec). */
  def bitextMineStream(side0: DataFrame, archive: DataFrame,
                       idCol: String, embCol: String, k: Int,
                       nBits: Int = 8)(sink: DataFrame => Unit): Long = {
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = side0.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.ops.Similarity.bitextMineAgainst(batch, archive,
          idCol, embCol, k, nBits))
        nBatches.incrementAndGet()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    nBatches.get()
  }

  /** Steady-state entity resolution: arriving records resolve
    * against the persisted [[graft.ops.Entity.archiveIndex]]
    * (deletion-neighborhood blocking + levenshtein verify against
    * the static index only — the archive never self-joins). Each
    * arrival's entity label depends only on itself and the index, so
    * the union of micro-batch outputs == the batch
    * [[graft.ops.Entity.resolveAgainst]] row for row
    * (StreamingSpec). */
  def entityResolveStream(arrivals: DataFrame, index: DataFrame,
      idCol: String, keyCol: String, nameCol: String,
      blockCols: Seq[String], tau: Int = 1, keep: Seq[String] = Nil)
      (sink: DataFrame => Unit): Long = {
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = arrivals.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.ops.Entity.resolveAgainst(index, batch, idCol,
          keyCol, nameCol, blockCols, tau, keep))
        nBatches.incrementAndGet()
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    nBatches.get()
  }

  final case class AbUser(user: Long, arm: Long, x: Long, y: Long)

  /** Streaming experiment monitoring — the incremental twin of
    * q_events_cuped's user-grain registers: per-user (arm, pre-period
    * cents x, post-period cents y) accumulate in keyed state as
    * events arrive (two int64 counters per user — bounded by user
    * cardinality, never stream length), each trigger emitting the
    * touched users' updated rows. The registers are EXACT integer
    * sums, so accumulation over any micro-batch split equals the
    * batch aggregate bit for bit, and x+y is monotone — the
    * max-(x+y) row per user is the final state, from which θ/CUPED/
    * SRM compute exactly as in batch (StreamingSpec pins the final
    * user table against the batch aggregate row for row). Input
    * rows: (user_id, arm, xDelta, yDelta) cents. */
  def abRegistersStream(rows: Dataset[(Long, Long, Long, Long)])
      : Dataset[AbUser] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long, Long, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          var (arm, x, y) = state.getOption.getOrElse((-1L, 0L, 0L))
          it.foreach { case (_, a, dx, dy) => arm = a; x += dx; y += dy }
          state.update((arm, x, y))
          AbUser(user, arm, x, y)
      }
  }

  final case class CoreStale(node: Long, in_core: Boolean,
                             core_deg: Long, base_deg: Long,
                             arrivals: Long, stale: Boolean)

  /** Incremental k-core staleness — the streaming twin of
    * [[graft.ops.GraphRank.kCoreStaleness]] (the
    * q_dedup_incremental_clusters discipline applied to the graph
    * family, round-9 verdict ask #7): the converged
    * [[graft.ops.GraphRank.coreSnapshot]] is the persisted STATIC
    * side; arriving edge batches stream-static-join it (the snapshot
    * is never re-joined against itself), and per-node cumulative
    * arrival counters live in keyed state (sharded by node id —
    * bounded by touched-node cardinality, never stream length). A
    * node goes `stale` when its degree upper bound (base + arrivals)
    * reaches k while it is outside the core — edges only arrive, so
    * core membership only grows and this trigger has no false
    * negatives. Each trigger emits the touched nodes' updated rows;
    * `arrivals` is monotone, so the max-arrivals row per node is the
    * final state and equals the batch form on the full arrival set
    * row for row (StreamingSpec pins it under a 3-way batch split). */
  def kCoreStalenessStream(newEdges: DataFrame, snapshot: DataFrame,
                           srcCol: String, dstCol: String, k: Int)
      : Dataset[CoreStale] = {
    import newEdges.sparkSession.implicits._
    val ends = newEdges.select(col(srcCol).cast("long").as("node"))
      .unionByName(newEdges.select(col(dstCol).cast("long").as("node")))
    val snap = snapshot.select(col("node").cast("long").as("node"),
      col("in_core"), col("core_deg").cast("long").as("core_deg"),
      col("base_deg").cast("long").as("base_deg"))
    val joined = ends.join(snap, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("in_core"), lit(false)).as("in_core"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"),
        coalesce(col("base_deg"), lit(0L)).as("base_deg"))
      .as[(Long, Boolean, Long, Long)]
    joined.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (node: Long, rows: Iterator[(Long, Boolean, Long, Long)],
         state: GroupState[Long]) =>
          var arr = state.getOption.getOrElse(0L)
          var inCore = false
          var coreDeg = 0L
          var baseDeg = 0L
          rows.foreach { r =>
            inCore = r._2; coreDeg = r._3; baseDeg = r._4; arr += 1
          }
          state.update(arr)
          CoreStale(node, inCore, coreDeg, baseDeg, arr,
            !inCore && baseDeg + arr >= k)
      }
  }

  def runToMemorySink(out: DataFrame, name: String,
                      outputMode: OutputMode = OutputMode.Append()): String = {
    val q = out.writeStream.outputMode(outputMode)
      .format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    name
  }
}
