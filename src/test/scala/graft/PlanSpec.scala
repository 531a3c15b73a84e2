package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net over the whole oracle corpus: no
  * accidental Cartesian products (broadcast nested-loop cross joins
  * are the intended pattern for model-sized sides), and every lineitem
  * scan stays column-pruned — a scan reading the full 16-column table
  * for a 2-column density is a 100 TB bug even when sf0.01 hides it. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("no CartesianProduct in any corpus query; lineitem scans pruned") {
    val scanCols = "ReadSchema: struct<([^>]*)>".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect() // let AQE finalize the plan
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name: CartesianProduct in plan")
      scanCols.findAllMatchIn(plan).map(_.group(1)).foreach { cols =>
        val n = cols.count(_ == ',') + 1
        assert(n <= 6, s"$name: scan reads $n columns ($cols)")
      }
    }
  }

  test("filtered density queries push their predicate into the scan") {
    // q_dens_lognormal / q_dens_gamma filter l_quantity > 0; at 100 TB
    // that filter must reach the parquet reader, not run post-scan
    Seq("q_dens_lognormal", "q_dens_gamma").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        plan.contains("GreaterThan(l_quantity,0.0)"),
        s"$name: quantity filter not pushed to the scan")
    }
  }

  test("q_lse uses hash aggregates, not a partitionBy Window") {
    // A Window.partitionBy(max) funnels every row of a group onto one
    // task — with low-cardinality keys at 100 TB that's a few-reducer
    // bottleneck. The scale shape is two hash aggregates (both
    // map-side partial) with the tiny per-group maxes broadcast back.
    val df = SparkEntry.queries("q_lse")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "q_lse: Window in plan")
    assert(plan.contains("HashAggregate"), "q_lse: expected HashAggregates")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "q_lse: expected broadcast join of per-group maxes")
  }

  test("logSumExp(broadcastMaxes = false) matches the broadcast form " +
    "(the high-cardinality-key fallback)") {
    import graft.functions.Numerics
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), (col("l_quantity") / 10.0).as("x"))
    def run(b: Boolean) =
      Numerics.logSumExp(li, Seq("l_returnflag"), col("x"), "lse",
        broadcastMaxes = b)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bc = run(true); val sh = run(false)
    assert(bc.keySet == sh.keySet)
    bc.foreach { case (k, v) => assert(math.abs(v - sh(k)) < 1e-12, k) }
  }

  test("round-4 ops keep their scale shapes: no Window anywhere, " +
    "contamination probes via broadcast") {
    Seq("q_text_contamination", "q_text_bm25", "q_sample_temperature",
      "q_text_perplexity", "q_sketch_hll", "q_sketch_cms",
      "q_dedup_bloom").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name: Window in plan")
    }
    // the benchmark gram set is human-sized and must broadcast, so the
    // corpus-side probe is map-side — never a shuffle of the corpus
    val c = SparkEntry.queries("q_text_contamination")(spark, sf)
    c.collect()
    assert(c.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "contamination: benchmark grams should broadcast")
  }

  test("RFF / C4 / script queries are pure map -> partial-agg shapes: " +
    "no Join, no Window — the frequency table and rules live in the " +
    "row kernel, never a shuffled side") {
    Seq("q_gp_rff", "q_quality_c4", "q_text_scripts").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name: Window in plan")
      assert(!plan.contains("Join"), s"$name: Join in plan")
      assert(plan.contains("HashAggregate"), s"$name: no partial agg")
    }
  }

  test("sampling and top-k queries use bounded per-partition state — " +
    "TakeOrdered / object hash agg, never a global sort or rank Window") {
    Seq("q_sample_fixedn", "q_sample_weighted").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name: expected per-partition top-n")
      assert(!plan.contains("Window"), s"$name: Window in plan")
    }
    val tk = SparkEntry.queries("q_topk_per_group")(spark, sf)
    tk.collect()
    val tkPlan = tk.queryExecution.executedPlan.toString
    assert(!tkPlan.contains("Window"),
      "q_topk_per_group: rank Window would funnel groups through one task")
    assert(tkPlan.contains("top_k") || tkPlan.contains("ObjectHashAggregate"),
      "q_topk_per_group: expected the bounded TopK aggregate")
  }

  test("covariance runs as ONE aggregation pass over the data — the " +
    "d² fan-out happens after the single-row aggregate") {
    val df = SparkEntry.queries("q_embed_covariance")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      "covariance: unexpected heavyweight operator")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // ONE pass over the data: a regression to two aggregations would
    // show as a second parquet scan
    val scans = "Scan parquet".r.findAllIn(finalPlan).size
    assert(scans == 1, s"covariance: $scans data scans, want 1")
    assert(finalPlan.contains("gram_agg") && finalPlan.contains("Generate"),
      "covariance: expected gram_agg then a post-aggregate explode")
  }

  test("as-of join is union + one keyed window pass — never a " +
    "non-equi join (per-key nested loop)") {
    // Spark executes `r.ts <= l.ts` range conditions as a filtered
    // per-key loop — quadratic in events-per-key. The merge-scan shape
    // (union, one exchange on the key, one sort, carry-forward window)
    // is linear; assert no join operator of any kind survives.
    val df = SparkEntry.queries("q_events_asof")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Union") && plan.contains("Window"),
      "asof: expected union + window merge-scan")
    assert(!plan.contains("Join"), s"asof: join operator in plan")
  }

  test("round-5 ops keep their scale shapes: repeat mix is map+explode " +
    "(no join/shuffle), diff joins fingerprints only, transitions " +
    "sorts the key exactly once, containment blocks without a Window") {
    // repeat-factor mix: pure scan -> explode -> agg; the factor table
    // lives in a when-chain, never a joined side
    val rep = SparkEntry.queries("q_sample_repeat")(spark, sf)
    rep.collect()
    val repPlan = rep.queryExecution.executedPlan.toString
    assert(!repPlan.contains("Join") && !repPlan.contains("Window"),
      "repeat mix: unexpected join/window")
    assert(repPlan.contains("Generate"),
      "repeat mix: expected explode fan-out")
    // snapshot diff: ONE full-outer join; only 8-byte fingerprints and
    // ids shuffle (ReadSchema carries text for fp computation, but no
    // Window / second join appears)
    val diff = SparkEntry.queries("q_pipeline_diff")(spark, sf)
    diff.collect()
    val diffPlan = diff.queryExecution.executedPlan.toString
    assert(!diffPlan.contains("Window"), "diff: Window in plan")
    assert("FullOuter".r.findAllIn(diffPlan).size >= 1,
      "diff: expected a full-outer fingerprint join")
    // transition matrix: lead + the row-normalization each use a
    // window, but the KEY sort happens exactly once (the matrix-sized
    // normalization partitions by from_type over k^2 rows)
    val tr = SparkEntry.queries("q_events_transitions")(spark, sf)
    tr.collect()
    val trPlan = tr.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val keySorts = "Sort \\[user_id".r.findAllIn(trPlan).size
    assert(keySorts == 1, s"transitions: $keySorts key sorts, want 1")
    // containment: the blocking join is an equi-join on the gram
    // fingerprint — no BroadcastNestedLoop, no Window
    val cont = SparkEntry.queries("q_dedup_containment")(spark, sf)
    cont.collect()
    val contPlan = cont.queryExecution.executedPlan.toString
    assert(!contPlan.contains("Window") &&
      !contPlan.contains("BroadcastNestedLoopJoin"),
      "containment: unexpected operator")
    // per-domain top-quantile: threshold table joins back via
    // broadcast — the data never shuffles for the keep pass
    val tq = SparkEntry.queries("q_sample_topquantile_by")(spark, sf)
    tq.collect()
    val tqPlan = tq.queryExecution.executedPlan.toString
    assert(tqPlan.contains("BroadcastHashJoin"),
      "topquantile_by: threshold table should broadcast")
  }

  test("round-6 ops keep their scale shapes: graph rounds and fused " +
    "retrieval never use a rank Window, JL projection is map-only, " +
    "novelty shuffles only fingerprints and ids") {
    // PageRank / label propagation / RRF / novelty / AMS / group
    // split: iterative joins and bounded TopK aggregates — a rank
    // Window over the corpus appears nowhere
    Seq("q_embed_pagerank", "q_embed_labelprop", "q_text_rrf",
      "q_text_novelty", "q_sketch_ams", "q_sample_groupsplit")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        df.collect()
        assert(!df.queryExecution.executedPlan.toString.contains("Window"),
          s"$name: Window in plan")
      }
    // JL projection: the matrix lives in the codegen'd kernel — one
    // scan, no join; aggregation is the only exchange
    val rp = SparkEntry.queries("q_embed_rp")(spark, sf)
    rp.collect()
    val rpPlan = rp.queryExecution.executedPlan.toString
    assert(!rpPlan.contains("Join") && rpPlan.contains("mat_vec"),
      s"rp: expected kernel-only map, got:\n$rpPlan")
    // AMS: map -> partial agg, no join
    val ams = SparkEntry.queries("q_sketch_ams")(spark, sf)
    ams.collect()
    val amsPlan = ams.queryExecution.executedPlan.toString
    assert(amsPlan.contains("HashAggregate"), "ams: no partial agg")
  }

  test("sessionize shares one exchange+sort between lag and the " +
    "running session counter") {
    val df = SparkEntry.queries("q_events_sessionize")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "sessionize: expected window pass")
    assert(!plan.contains("Join"), "sessionize: join operator in plan")
    // lag and cumsum are framed on the same (key, ts, seq) sort: the
    // plan must sort on the window key exactly once (the output
    // orderBy("cohort") is a separate, result-sized sort; AQE echoes
    // the pre-adaptive plan after "== Initial Plan ==" — exclude it)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val sorts = "Sort \\[user_id".r.findAllIn(finalPlan).size
    assert(sorts == 1, s"sessionize: $sorts window-key sorts, want 1")
  }

  test("matryoshka and zipf plan shapes: argmax/top-V never plan a " +
    "rank Window; zipf's top-V is a TakeOrdered, not a global sort") {
    val m = SparkEntry.queries("q_embed_matryoshka")(spark, sf)
    m.collect()
    val mp = m.queryExecution.executedPlan.toString
    assert(!mp.contains("Window"), "matryoshka: rank Window in plan")
    assert(mp.contains("BroadcastNestedLoopJoin"),
      "matryoshka: query side must broadcast")
    val z = SparkEntry.queries("q_text_zipf")(spark, sf)
    z.collect()
    val zp = z.queryExecution.executedPlan.toString
    assert(!zp.contains("Window"), "zipf: rank Window in plan")
    assert(zp.contains("TakeOrderedAndProject"),
      "zipf: top-V must be a TakeOrdered (per-partition heaps)")
  }

  test("round-7 ingestion ops keep their scale shapes: no rank Window " +
    "anywhere; codec metadata queries are map + agg with no join") {
    Seq("q_text_linededup", "q_text_urls", "q_source_warc",
      "q_pipeline_ingest", "q_multimodal_mp3", "q_multimodal_avc",
      "q_multimodal_flac").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name: Window in plan")
    }
    // parameter-built codec round-trips never join: synthesize → parse
    // → aggregate is map + partial hash agg, nothing else
    Seq("q_multimodal_mp3", "q_multimodal_avc", "q_multimodal_flac")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Join"), s"$name: Join in plan")
      }
    // line dedup: the doc-frequency pass and the drop-set join carry
    // fingerprints, so the row strings appear in exactly the two
    // doc-grain scans (corpus + reassembly), never in a shuffle of
    // exploded lines — enforced by checking the exploded side projects
    // only (id, pos, fp)
    val ld = SparkEntry.queries("q_text_linededup")(spark, sf)
    ld.collect()
    val ldPlan = ld.queryExecution.executedPlan.toString
    assert(!ldPlan.contains("CartesianProduct"))
  }

  test("round-8 ops keep their scale shapes: packing windows are " +
    "shard-partitioned (never corpus-wide), markdown is map + agg " +
    "with no join, unimax windows only run on the post-agg language " +
    "grain") {
    // markdown extraction: pure per-row maps + one final agg — any
    // Join or Window would mean the chain left the row grain
    val md = SparkEntry.queries("q_source_markdown")(spark, sf)
    md.collect()
    val mdPlan = md.queryExecution.executedPlan.toString
    assert(!mdPlan.contains("Join"), "q_source_markdown: Join in plan")
    assert(!mdPlan.contains("Window"), "q_source_markdown: Window in plan")
    // concat-chunk + length-bucket packing: every Window partitions
    // on the shard key — the plan must never show an empty
    // partition spec (the corpus-collapse shape)
    Seq("q_pack_sequences", "q_pack_lenbatch").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("windowspecdefinition()"),
        s"$name: unpartitioned Window")
      assert(plan.contains("Window"), s"$name: expected a shard Window")
    }
    // no-split packing is the kernel path: no Window at all, and the
    // exchange carries only (shard, id, n_tokens) — the text column
    // must not appear downstream of the shuffle
    val ns = SparkEntry.queries("q_pack_nosplit")(spark, sf)
    ns.collect()
    val nsPlan = ns.queryExecution.executedPlan.toString
    assert(!nsPlan.contains("Window"), "q_pack_nosplit: Window in plan")
    assert(nsPlan.contains("Exchange hashpartitioning(shard"),
      "q_pack_nosplit: expected the shard exchange")
    // BPE-pieces packing keeps the no-split kernel shape: piece
    // counting happens in the pre-shuffle projection, so the plan is
    // still window-free and the shard exchange still carries only
    // (shard, id, n_tokens) — text must not cross the shuffle
    val nb = SparkEntry.queries("q_pack_bpe")(spark, sf)
    nb.collect()
    val nbPlan = nb.queryExecution.executedPlan.toString
    assert(!nbPlan.contains("Window"), "q_pack_bpe: Window in plan")
    assert(nbPlan.contains("Exchange hashpartitioning(shard"),
      "q_pack_bpe: expected the shard exchange")
    // unimax: the corpus reduces to the language grain in a hash agg
    // BEFORE any window touches it — the unpartitioned windows that
    // follow are the documented by-design site (see Bench.scala's
    // WindowExec audit note)
    val um = SparkEntry.queries("q_mix_unimax")(spark, sf)
    um.collect()
    val umPlan = um.queryExecution.executedPlan.toString
    assert(umPlan.contains("HashAggregate"),
      "q_mix_unimax: expected the language-grain reduction agg")
    // semantic dedup: centroid assignment is a literal-broadcast map
    // (no centroid join); the only join key is the cell
    val sem = SparkEntry.queries("q_dedup_semantic")(spark, sf)
    sem.collect()
    val semPlan = sem.queryExecution.executedPlan.toString
    assert(!semPlan.contains("CartesianProduct"),
      "q_dedup_semantic: cartesian")
    assert(!semPlan.contains("Window"), "q_dedup_semantic: Window")
  }

  test("round-9 ops keep their scale shapes: winnow is join-on-anchor " +
    "only (no window, no cartesian over docs), shuffle/budget windows " +
    "are key-partitioned, the budget table broadcasts, bottom-k's " +
    "only window runs on the pair-signature grain") {
    // winnow: kernel map → anchor explode → fp joins; a Window or a
    // doc-grain cartesian would mean the selection left the row grain
    val wn = SparkEntry.queries("q_dedup_winnow")(spark, sf)
    wn.collect()
    val wnPlan = wn.queryExecution.executedPlan.toString
    assert(!wnPlan.contains("Window"), "q_dedup_winnow: Window in plan")
    assert(!wnPlan.contains("CartesianProduct"), "q_dedup_winnow: cartesian")
    // epoch shuffle: the rank window must carry its (epoch, shard)
    // partition spec — never the corpus-collapse empty spec
    val sh = SparkEntry.queries("q_sample_shuffle")(spark, sf)
    sh.collect()
    val shPlan = sh.queryExecution.executedPlan.toString
    assert(shPlan.contains("Window"), "q_sample_shuffle: expected window")
    assert(!shPlan.contains("windowspecdefinition()"),
      "q_sample_shuffle: unpartitioned Window")
    // budget selection: per-source sort window + the budget table as
    // a BROADCAST join (it is domain-cardinality-sized by definition)
    val bu = SparkEntry.queries("q_sample_budget")(spark, sf)
    bu.collect()
    val buPlan = bu.queryExecution.executedPlan.toString
    assert(!buPlan.contains("windowspecdefinition()"),
      "q_sample_budget: unpartitioned Window")
    assert(buPlan.contains("BroadcastHashJoin") ||
      buPlan.contains("BroadcastNestedLoopJoin"),
      "q_sample_budget: budget table should broadcast")
    assert(!buPlan.contains("CartesianProduct"), "q_sample_budget: cartesian")
    // incremental cluster assignment: equi-joins only
    val ic = SparkEntry.queries("q_dedup_incremental_clusters")(spark, sf)
    ic.collect()
    assert(!ic.queryExecution.executedPlan.toString
      .contains("CartesianProduct"),
      "q_dedup_incremental_clusters: cartesian")
    // bottom-k overlap: the rank window partitions on the (ga, gb)
    // pair key over the groups×k signature table
    val bk = SparkEntry.queries("q_sketch_bottomk")(spark, sf)
    bk.collect()
    val bkPlan = bk.queryExecution.executedPlan.toString
    assert(!bkPlan.contains("windowspecdefinition()"),
      "q_sketch_bottomk: unpartitioned Window")
  }

  test("round-9b ops keep their scale shapes: chat render is a pure " +
    "map (no window, no join), DPO pairing windows carry their " +
    "(source, bucket) key, keyword extraction never plans a rank " +
    "window, contamination broadcasts the eval side, KMV's only " +
    "window runs on the pair-signature grain") {
    val ch = SparkEntry.queries("q_pack_chat")(spark, sf)
    ch.collect()
    val chPlan = ch.queryExecution.executedPlan.toString
    assert(!chPlan.contains("Window"), "q_pack_chat: Window in plan")
    assert(!chPlan.contains("Join"), "q_pack_chat: join in plan")
    val dpo = SparkEntry.queries("q_pack_dpo")(spark, sf)
    dpo.collect()
    val dpoPlan = dpo.queryExecution.executedPlan.toString
    assert(dpoPlan.contains("Window"), "q_pack_dpo: expected window")
    assert(!dpoPlan.contains("windowspecdefinition()"),
      "q_pack_dpo: unpartitioned Window")
    val kw = SparkEntry.queries("q_text_keywords")(spark, sf)
    kw.collect()
    val kwPlan = kw.queryExecution.executedPlan.toString
    assert(!kwPlan.contains("Window"),
      "q_text_keywords: rank window crept in (TopK agg is the shape)")
    val ct = SparkEntry.queries("q_embed_contamination")(spark, sf)
    ct.collect()
    val ctPlan = ct.queryExecution.executedPlan.toString
    assert(ctPlan.contains("BroadcastNestedLoopJoin"),
      "q_embed_contamination: eval side should broadcast")
    assert(!ctPlan.contains("SortMergeJoin"),
      "q_embed_contamination: corpus-shuffling join")
    val kmv = SparkEntry.queries("q_sketch_kmv")(spark, sf)
    kmv.collect()
    assert(!kmv.queryExecution.executedPlan.toString
      .contains("windowspecdefinition()"),
      "q_sketch_kmv: unpartitioned Window")
  }

  test("round-9c ops keep their scale shapes: blocklist is one " +
    "codegen'd AC pass + partial agg (no join, no window), edit " +
    "verification joins prefixes by id after pair generation, χ² " +
    "marginals reuse the cell-grain exchange, windowed quantiles " +
    "never plan a Window or per-row sort over the data") {
    val bl = SparkEntry.queries("q_text_blocklist")(spark, sf)
    bl.collect()
    val blPlan = bl.queryExecution.executedPlan.toString
    assert(!blPlan.contains("Window"), "q_text_blocklist: Window")
    assert(!blPlan.contains("Join"), "q_text_blocklist: join in plan")
    assert(blPlan.contains("blocklist_counts"),
      "q_text_blocklist: AC kernel missing from plan")
    val ed = SparkEntry.queries("q_dedup_editdist")(spark, sf)
    ed.collect()
    val edPlan = ed.queryExecution.executedPlan.toString
    assert(!edPlan.contains("Window"), "q_dedup_editdist: Window")
    assert(edPlan.contains("levenshtein"),
      "q_dedup_editdist: verifier missing")
    val chi = SparkEntry.queries("q_stats_chisq")(spark, sf)
    chi.collect()
    val chiPlan = chi.queryExecution.executedPlan.toString
    assert(!chiPlan.contains("Window"), "q_stats_chisq: Window")
    val rq = SparkEntry.queries("q_events_rollquantile")(spark, sf)
    rq.collect()
    val rqPlan = rq.queryExecution.executedPlan.toString
    assert(!rqPlan.contains("Window"),
      "q_events_rollquantile: Window over the data (the cum pass " +
        "must be the packed-array fold)")
    val cc = SparkEntry.queries("q_quality_ccnet")(spark, sf)
    cc.collect()
    assert(!cc.queryExecution.executedPlan.toString.contains("Window"),
      "q_quality_ccnet: Window crept in (LM joins + integer gate " +
        "are the shape)")
    val kn = SparkEntry.queries("q_text_kneserney")(spark, sf)
    kn.collect()
    assert(!kn.queryExecution.executedPlan.toString.contains("Window"),
      "q_text_kneserney: Window crept in")
    val hnq = SparkEntry.queries("q_embed_hardneg")(spark, sf)
    hnq.collect()
    assert(!hnq.queryExecution.executedPlan.toString.contains("Window"),
      "q_embed_hardneg: rank Window crept in (TopK agg is the shape)")
    val hm = SparkEntry.queries("q_dedup_hamming")(spark, sf)
    hm.collect()
    val hmPlan = hm.queryExecution.executedPlan.toString
    assert(!hmPlan.contains("Window"), "q_dedup_hamming: Window")
    assert(hmPlan.contains("simhash60"),
      "q_dedup_hamming: one-pass signature kernel missing")
    val xs = SparkEntry.queries("q_text_crosssource")(spark, sf)
    xs.collect()
    assert(!xs.queryExecution.executedPlan.toString.contains("Window"),
      "q_text_crosssource: Window crept in")
    // data card: every sketch aggregates map-side; no Window anywhere
    val dc = SparkEntry.queries("q_pipeline_datacard")(spark, sf)
    dc.collect()
    assert(!dc.queryExecution.executedPlan.toString.contains("Window"),
      "q_pipeline_datacard: Window crept in (argmax must be the " +
        "struct-max aggregate)")
    val psi = SparkEntry.queries("q_stats_psi")(spark, sf)
    psi.collect()
    assert(!psi.queryExecution.executedPlan.toString.contains("Window"),
      "q_stats_psi: Window crept in")
    // eval decontamination: the leak check must plan as semi/anti
    // joins, never materializing the (eval x train) pair set
    val es = SparkEntry.queries("q_sample_evalsafe")(spark, sf)
    es.collect()
    val esPlan = es.queryExecution.executedPlan.toString
    assert(esPlan.contains("LeftSemi") && esPlan.contains("LeftAnti"),
      "q_sample_evalsafe: semi/anti shape lost")
    // forget-propagation: the promote pass must be the struct-max
    // AGGREGATE over the closure, never a rank window
    val fg = SparkEntry.queries("q_pipeline_forget")(spark, sf)
    fg.collect()
    assert(!fg.queryExecution.executedPlan.toString.contains("Window"),
      "q_pipeline_forget: Window crept in (promotion must be the " +
        "struct-max aggregate)")
    // Poisson bootstrap: the x64 replicate explode must feed a
    // partial (map-side) aggregate — only post-agg rows shuffle —
    // and no window/sort touches the replicate grain
    val bs = SparkEntry.queries("q_stats_bootstrap")(spark, sf)
    bs.collect()
    val bsPlan = bs.queryExecution.executedPlan.toString
    assert(!bsPlan.contains("Window"), "q_stats_bootstrap: Window")
    assert(bsPlan.contains("partial_"),
      "q_stats_bootstrap: replicate agg lost its map-side partial " +
        "(the x64 explode would shuffle data-sized)")
    val kp = SparkEntry.queries("q_stats_kappa")(spark, sf)
    kp.collect()
    val kpPlan = kp.queryExecution.executedPlan.toString
    assert(!kpPlan.contains("Window") && !kpPlan.contains("Join"),
      "q_stats_kappa: must be one scan into one agg (no join/window)")
    // code-switch: segment explode feeds a partial agg; the XOR
    // pairing is the only join
    val cs = SparkEntry.queries("q_text_codeswitch")(spark, sf)
    cs.collect()
    val csPlan = cs.queryExecution.executedPlan.toString
    assert(!csPlan.contains("Window"), "q_text_codeswitch: Window")
    assert(csPlan.contains("partial_"),
      "q_text_codeswitch: segment agg lost its map-side partial")
    // audio dedup: media bytes must never reach an exchange — the
    // fingerprint map runs before the first shuffle
    val ad = SparkEntry.queries("q_multimodal_audiodedup")(spark, sf)
    ad.collect()
    val exchanges = allExchanges(ad.queryExecution.executedPlan)
    assert(exchanges.nonEmpty &&
      exchanges.forall(cols => !cols.contains("media")),
      s"q_multimodal_audiodedup: media bytes crossed a shuffle: $exchanges")
  }

  /** Input column lists of every shuffle exchange, descending through
    * AQE wrappers (exchanges live inside materialized query stages
    * after collect()). */
  private def allExchanges(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[Seq[String]] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange
          .ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    val here = p match {
      case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => Seq(e.child.schema.fieldNames.toSeq)
      case _ => Nil
    }
    here ++ kids.flatMap(allExchanges)
  }

  test("round-9d ops keep their scale shapes: pair-dedup edges are " +
    "(long, long) star edges with media bytes never crossing a " +
    "shuffle, rendezvous sharding is one scan into a two-level " +
    "map-side-combined agg with no join") {
    val sf = "/root/testdata/sf0.001"
    // cross-modal pair dedup: the BMP build + aHash run before the
    // first exchange; every shuffled row is key/id-sized
    val pd = SparkEntry.queries("q_multimodal_pairdedup")(spark, sf)
    pd.collect()
    val pdEx = allExchanges(pd.queryExecution.executedPlan)
    assert(pdEx.nonEmpty && pdEx.forall(cols => !cols.contains("media")),
      s"q_multimodal_pairdedup: media bytes crossed a shuffle: $pdEx")
    assert(!pd.queryExecution.executedPlan.toString.contains("Window"),
      "q_multimodal_pairdedup: Window")
    // rendezvous resharding: per-row hashing, no join anywhere, and
    // the (scheme, shard) agg keeps its map-side partial
    val rv = SparkEntry.queries("q_shard_rendezvous")(spark, sf)
    rv.collect()
    val rvPlan = rv.queryExecution.executedPlan.toString
    assert(!rvPlan.contains("Join"), "q_shard_rendezvous: Join")
    assert(!rvPlan.contains("Window"), "q_shard_rendezvous: Window")
    assert(rvPlan.contains("partial_"),
      "q_shard_rendezvous: (scheme, shard) agg lost its map-side partial")
    // RHO selection: LM counts and scoring joins run on 45-bit keys;
    // raw text never crosses an exchange, threshold is broadcast
    val rho = SparkEntry.queries("q_sample_rho")(spark, sf)
    rho.collect()
    val rhoEx = allExchanges(rho.queryExecution.executedPlan)
    assert(rhoEx.nonEmpty && rhoEx.forall(cols => !cols.contains("text")),
      s"q_sample_rho: text crossed a shuffle: $rhoEx")
    assert(!rho.queryExecution.executedPlan.toString.contains("Window"),
      "q_sample_rho: Window")
    // BPE diff: merges are plan literals -> one scan, no join/window
    val bd = SparkEntry.queries("q_text_bpediff")(spark, sf)
    bd.collect()
    val bdPlan = bd.queryExecution.executedPlan.toString
    assert(!bdPlan.contains("Join") && !bdPlan.contains("Window"),
      "q_text_bpediff: segment+aggregate must not join or window")
    assert(bdPlan.contains("partial_"),
      "q_text_bpediff: per-source agg lost its map-side partial")
    // attrition: predicates evaluate pre-join; text stays in its scan
    val at = SparkEntry.queries("q_pipeline_attrition")(spark, sf)
    at.collect()
    val atEx = allExchanges(at.queryExecution.executedPlan)
    assert(atEx.nonEmpty && atEx.forall(cols => !cols.contains("text")),
      s"q_pipeline_attrition: text crossed a shuffle: $atEx")
    assert(!at.queryExecution.executedPlan.toString.contains("Window"),
      "q_pipeline_attrition: Window")
    // audio quality: media bytes never reach an exchange; the gates
    // aggregate registers only
    val aq = SparkEntry.queries("q_multimodal_audioquality")(spark, sf)
    aq.collect()
    val aqEx = allExchanges(aq.queryExecution.executedPlan)
    assert(aqEx.nonEmpty && aqEx.forall(cols => !cols.contains("media")),
      s"q_multimodal_audioquality: media bytes crossed a shuffle: $aqEx")
    // threshold sweep: no window (the cumulative runs on the <= 9-row
    // agreement histogram via the 5-row level join, not a rank pass)
    val ts = SparkEntry.queries("q_dedup_threshold_sweep")(spark, sf)
    ts.collect()
    assert(!ts.queryExecution.executedPlan.toString.contains("Window"),
      "q_dedup_threshold_sweep: Window")
    // quota: realization is the bounded TopK aggregate, never a
    // data-grain rank — the only row_number runs on the post-agg
    // |sources|-row quota table (text never shuffles either way)
    val qu = SparkEntry.queries("q_sample_quota")(spark, sf)
    qu.collect()
    val quEx = allExchanges(qu.queryExecution.executedPlan)
    assert(quEx.nonEmpty && quEx.forall(cols => !cols.contains("text")),
      s"q_sample_quota: text crossed a shuffle: $quEx")
    val quWindows = allWindows(qu.queryExecution.executedPlan)
    assert(quWindows.nonEmpty &&
      quWindows.forall(cols => !cols.contains("doc_id")),
      s"q_sample_quota: a Window ran on the doc grain: $quWindows")
  }

  /** Input column lists of every WindowExec, AQE-aware (same descent
    * as [[allExchanges]]). */
  test("round-10 ops keep their scale shapes: video/frame decode " +
    "keeps media bytes out of every shuffle, bitext mining plans no " +
    "window over the data grain, jsonl ingest is map + aggregate " +
    "with no join on the data side, curriculum windows only by " +
    "shard") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q_multimodal_framedecode", "q_multimodal_videodedup")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val ex = allExchanges(df.queryExecution.executedPlan)
      assert(ex.nonEmpty && ex.forall(cols => !cols.contains("media")),
        s"$q: media bytes crossed a shuffle: $ex")
      assert(!df.queryExecution.executedPlan.toString.contains("Window"),
        s"$q: Window")
    }
    val bt = SparkEntry.queries("q_embed_bitext")(spark, sf)
    bt.collect()
    assert(allWindows(bt.queryExecution.executedPlan).isEmpty,
      "q_embed_bitext: window over the data grain (the kNN averages " +
        "must stay O(k)-state TopK aggregates)")
    val ex = allExchanges(bt.queryExecution.executedPlan)
    assert(ex.nonEmpty && ex.forall(cols => !cols.contains("embedding")
        && !cols.contains("emb_a") && !cols.contains("emb_b")),
      s"q_embed_bitext: raw vectors crossed a shuffle: $ex")
    val js = SparkEntry.queries("q_source_jsonl")(spark, sf)
    js.collect()
    val jsPlan = js.queryExecution.executedPlan.toString
    assert(!jsPlan.contains("Window"), "q_source_jsonl: Window")
    assert(jsPlan.contains("partial_"),
      "q_source_jsonl: per-source agg lost its map-side partial")
    val cu = SparkEntry.queries("q_sample_curriculum")(spark, sf)
    cu.collect()
    val ws = allWindows(cu.queryExecution.executedPlan)
    assert(ws.nonEmpty && ws.forall(cols => cols.contains("shard")),
      s"q_sample_curriculum: window not on the shard grain: $ws")
  }

  private def allWindows(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[Seq[String]] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case o => o.children
    }
    val here = p match {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        Seq(w.child.schema.fieldNames.toSeq)
      case _ => Nil
    }
    here ++ kids.flatMap(allWindows)
  }
}
