package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-up probe: materialize an N× organically-grown copy
  * of the corpus tables (each replica is perturbed so near-dup /
  * timeline structure stays realistic instead of every row gaining
  * N-1 exact twins), run a battery of operators at 1× and N×, and
  * compare the wall-clock ratio against each operator's DOCUMENTED
  * cost exponent. A plan whose cost model is O(n^e) on fixed
  * parallelism should cost ≲ N^e× (constant overheads amortize); a
  * ratio past that is the early warning the plan would not survive
  * the next 100×.
  *
  * Exponents are part of the claim being tested, not a fudge factor:
  * token-volume operators claim 1.0 (linear); IVF / SemDeDup claim
  * 1.5 — the standard nlist ∝ √n recipe makes both the assignment
  * scan (n·√n distances) and the per-list pairing (n²/√n) grow as
  * n^1.5, and the probe scales nlist exactly that way; LSH claims
  * 1.0 because the probe adds log2(N) hyperplanes, holding bucket
  * occupancy (and so per-query candidate count) constant — the
  * documented parameter-growth path for each index.
  *
  * This is measurement, not proof — but it converts "the plan shape
  * scales" from an assertion into a number, at the largest size the
  * local harness can hold.
  *
  * usage: runMain graft.tools.ScaleProbe [sfDir] [multiplier] [op1,op2,...]
  * (the optional op list restricts the battery — e.g. re-running a
  * flagged operator twice without paying for the full sweep)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 8
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "32g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bigDir = java.nio.file.Files
      .createTempDirectory("graft-scaleprobe").toString
    val replicas = spark.range(mult).select(col("id").as("replica"))

    // --- documents: doc_id stays unique via a per-replica offset; the
    // perturbation token lands INSIDE the text so shingles/tokens shift
    // but the document remains a realistic near-dup of its siblings
    // (which is what a grown crawl looks like: boilerplate + template
    // families)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    replicas.crossJoin(docs)
      .select(
        (col("doc_id") + col("replica") * (nDocs + 1)).as("doc_id"),
        concat(col("text"), lit(" rep"), col("replica")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$bigDir/documents.parquet")

    // --- events: each replica is a fresh user population (id offset)
    // with the original timelines — per-user activity, session shape
    // and hourly seasonality are preserved, only the population grows.
    // ts passes through in whatever physical shape the source has
    // (nanos-as-long under the legacy conf, or µs timestamp);
    // Tables.events normalizes either on read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val Array(maxUser, maxEvent) = events
      .agg(max("user_id"), max("event_id")).head().toSeq
      .map(_.asInstanceOf[Long] + 1).toArray
    replicas.crossJoin(events)
      .select(
        (col("event_id") + col("replica") * maxEvent).as("event_id"),
        col("ts"),
        (col("user_id") + col("replica") * maxUser).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$bigDir/events.parquet")

    // --- lineitem (co-purchase graph source): each replica is a fresh
    // order AND part population — per-replica basket structure (and so
    // graph topology, degree profile, peel depth) repeats on disjoint
    // node sets, which is how a marketplace actually grows; keeping
    // parts shared instead would only multiply edge WEIGHTS, leaving
    // the weight-pruned edge list the same size (a 1× graph in an 8×
    // costume)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val Array(maxOrder, maxPart) = li
      .agg(max("l_orderkey"), max("l_partkey")).head().toSeq
      .map(_.asInstanceOf[Long] + 1).toArray
    replicas.crossJoin(li)
      .select((col("l_orderkey") + col("replica") * maxOrder).as("l_orderkey") +:
        (col("l_partkey") + col("replica") * maxPart).as("l_partkey") +:
        li.columns.filter(c => c != "l_orderkey" && c != "l_partkey")
          .map(col).toIndexedSeq: _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$bigDir/lineitem.parquet")

    // --- orders (daily-series source): replica orders keep the SAME
    // calendar span (dates shift by replica days — a week against a
    // seven-year span), so the day panel the time-series reductions
    // fold into stays calendar-bounded while the per-day mass grows
    // N× — which is exactly the claim those operators make (linear
    // fact reduction onto a bounded panel)
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val maxOrd = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    replicas.crossJoin(ord)
      .select((col("o_orderkey") + col("replica") * maxOrd).as("o_orderkey") +:
        expr("timestampadd(DAY, CAST(replica AS INT), o_orderdate)")
          .as("o_orderdate") +:
        ord.columns.filter(c => c != "o_orderkey" && c != "o_orderdate")
          .map(col).toIndexedSeq: _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$bigDir/orders.parquet")

    // --- embeddings: replica vectors get one coordinate nudged (a
    // replica-dependent dimension), so directions shift slightly —
    // template families again, not exact cosine twins (a pure rescale
    // would leave every cosine identical)
    val embeds = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVecs = embeds.count()
    replicas.crossJoin(embeds)
      .select(
        (col("vec_id") + col("replica") * (nVecs + 1)).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = CAST(replica % 64 AS INT)," +
          " CAST(x + 0.05 AS FLOAT), x))").as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")

    // --- dimension tables pass through at 1× (the grown-lake shape:
    // the customer/part/geo population is fixed while fact volume
    // grows) — the profiling audits and dim-joining operators read
    // them from the probe dir unchanged
    Seq("customer", "nation", "region", "part", "supplier").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$bigDir/$t.parquet")
    }

    // scaled index parameters: nlist ∝ √n (IVF / SemDeDup), +log2(N)
    // hyperplanes (LSH) — the growth path each operator documents
    val nlist = math.round(16 * math.sqrt(mult)).toInt
    val planes = 8 + math.ceil(math.log(mult) / math.log(2)).toInt

    // the battery: (name, documented cost exponent, query at 1×/N×).
    // The boolean marks N×-parameterized index ops (they get `nlist`/
    // `planes` only on the big dir so the 1× side stays the shipped
    // default).
    // NOT minhashPairs: the replicated corpus genuinely holds ~N²/2
    // more near-dup pairs per template family, so its output volume
    // grows super-linearly BY CONSTRUCTION — that measures the data,
    // not the plan.
    val ops: Seq[(String, Double, (String, Boolean) => DataFrame)] = Seq(
      // documents: token/shingle-volume-driven
      ("q_quality_tiers", 1.0, (d, _) => graft.operators.TextAnalysis.qualityTiers(spark, d)),
      ("q_dup_spans", 1.0, (d, _) => graft.operators.Dedup.dupSpans(spark, d)),
      ("q_dedup_exact", 1.0, (d, _) => graft.operators.Dedup.exact(spark, d)),
      ("q_heavy_tokens", 1.0, (d, _) => graft.operators.TextAnalysis.heavyTokens(spark, d)),
      ("q_tfidf", 1.0, (d, _) => graft.operators.Search.tfidfTopTerms(spark, d)),
      ("q_segment_dedup", 1.0, (d, _) => graft.operators.Dedup.segmentDedup(spark, d)),
      // events: event-volume-driven (population grows, timelines don't)
      ("q_sessionize", 1.0, (d, _) => graft.operators.Temporal.sessionize(spark, d)),
      ("q_funnel", 1.0, (d, _) => graft.operators.Behavioral.funnel(spark, d)),
      ("q_retention", 1.0, (d, _) => graft.operators.Behavioral.retention(spark, d)),
      ("q_anomaly_score", 1.0, (d, _) => graft.operators.Behavioral.anomalyScore(spark, d)),
      ("q_k_anonymity", 1.0, (d, _) => graft.operators.Privacy.kAnonymity(spark, d)),
      ("q_dp_bounded", 1.0, (d, _) => graft.operators.Privacy.dpBounded(spark, d)),
      ("q_decayed_engagement", 1.0, (d, _) => graft.operators.Behavioral.decayedEngagement(spark, d)),
      ("q_markov_transitions", 1.0, (d, _) => graft.operators.Behavioral.markovTransitions(spark, d)),
      // lineitem-derived co-purchase graph: replica populations add
      // edges ~linearly and reuse the 1× structure, so peel depth (and
      // round count) holds while per-round cost tracks the edge list
      ("q_kcore", 1.0, (d, _) => graft.operators.Graph.kCoreParts(spark, d)),
      // legs are one postings probe + one column-pruned scan, fusion is
      // legK-bounded
      ("q_hybrid_rrf", 1.0, (d, _) => graft.operators.Search.hybridRrf(spark, d)),
      // documents, score-distribution-driven (window state is bounded)
      ("q_token_budget", 1.0, (d, _) => graft.operators.TextAnalysis.tokenBudgetSelect(spark, d)),
      // row-local winnow selection + exploded ~1/w fp relation: linear.
      // winnowCandidates is deliberately NOT probed: the replica corpus
      // grows every doc a family of mult near-dup siblings, so TRUE
      // candidate-pair mass is quadratic in mult by construction — the
      // same reason the raw minhash pair relation isn't in the battery
      ("q_winnow_fingerprint", 1.0, (d, _) => graft.operators.TextAnalysis.winnowFingerprints(spark, d)),
      ("q_boilerplate_grams", 1.0, (d, _) => graft.operators.Dedup.boilerplateGrams(spark, d)),
      ("q_burst_days", 1.0, (d, _) => graft.operators.Behavioral.burstDays(spark, d)),
      // per-user aggregate linear; quintile windows see only the panel
      ("q_rfm_segments", 1.0, (d, _) => graft.operators.Behavioral.rfmSegments(spark, d)),
      ("q_length_buckets", 1.0, (d, _) => graft.operators.Sampling.lengthBuckets(spark, d)),
      // supervised-audit batch: all linear — the AUC cumulative window
      // runs over the DISTINCT-score relation (ties collapse first),
      // t-closeness grids against the bounded band dimension, NB and
      // backoff are token-volume counts + vocabulary-keyed joins
      ("q_quality_auc", 1.0, (d, _) => graft.operators.Quality.aucBySource(spark, d)),
      ("q_t_closeness", 1.0, (d, _) => graft.operators.Privacy.tCloseness(spark, d)),
      ("q_nb_train", 1.0, (d, _) => graft.operators.TextAnalysis.nbTrain(spark, d)),
      ("q_nb_classify", 1.0, (d, _) => graft.operators.TextAnalysis.nbClassify(spark, d)),
      ("q_backoff_levels", 1.0, (d, _) => graft.operators.TextAnalysis.backoffLevels(spark, d)),
      // time-series + corpus-statistics batches: all linear — the day
      // panel and the KS value grid are content-bounded dimensions
      // (replication grows per-day counts, not the panel), heaps/zipf/
      // hapax are token-volume scans into vocabulary-keyed aggregates
      ("q_autocorr", 1.0, (d, _) => graft.operators.TimeSeries.autocorr(spark, d)),
      ("q_cusum_changepoint", 1.0, (d, _) => graft.operators.TimeSeries.cusumChangepoint(spark, d)),
      ("q_ks_drift", 1.0, (d, _) => graft.operators.Quality.ksDrift(spark, d)),
      ("q_heaps_curve", 1.0, (d, _) => graft.operators.TextAnalysis.heapsCurve(spark, d)),
      ("q_zipf_ranks", 1.0, (d, _) => graft.operators.TextAnalysis.zipfRanks(spark, d)),
      ("q_hapax_share", 1.0, (d, _) => graft.operators.TextAnalysis.hapaxShare(spark, d)),
      // trend/regression batch: the day-panel pair kernel is CONSTANT
      // in corpus size (calendar-bounded), so end-to-end cost tracks
      // the one fact-table scan — linear
      ("q_theilsen", 1.0, (d, _) => graft.operators.TimeSeries.theilSen(spark, d)),
      ("q_mann_kendall", 1.0, (d, _) => graft.operators.TimeSeries.mannKendall(spark, d)),
      ("q_ols_daily", 1.0, (d, _) => graft.operators.TimeSeries.olsDailyRevenue(spark, d)),
      ("q_runs_test", 1.0, (d, _) => graft.operators.TimeSeries.runsTest(spark, d)),
      // lattice/sketch/decomposition batch: cube is one shuffle with a
      // constant-size lattice, CMS counters are depth·256 rows, the
      // seasonal window rides the bounded day panel
      ("q_cube", 1.0, (d, _) => graft.operators.Relational.cubeAgg(spark, d)),
      ("q_seasonal_decomp", 1.0, (d, _) => graft.operators.TimeSeries.seasonalDecomp(spark, d)),
      ("q_cms_tokens", 1.0, (d, _) => graft.operators.TextAnalysis.cmsTokenCounts(spark, d)),
      ("q_token_burstiness", 1.0, (d, _) => graft.operators.TextAnalysis.tokenBurstiness(spark, d)),
      ("q_ngram_novelty", 1.0, (d, _) => graft.operators.Dedup.ngramNovelty(spark, d)),
      ("q_good_turing", 1.0, (d, _) => graft.operators.TextAnalysis.goodTuring(spark, d)),
      ("q_chao1", 1.0, (d, _) => graft.operators.TextAnalysis.chao1Richness(spark, d)),
      ("q_vocab_overlap", 1.0, (d, _) => graft.operators.TextAnalysis.vocabOverlap(spark, d)),
      ("q_simpson_diversity", 1.0, (d, _) => graft.operators.TextAnalysis.simpsonDiversity(spark, d)),
      ("q_unigram_tv_drift", 1.0, (d, _) => graft.operators.Quality.unigramTvDrift(spark, d)),
      ("q_temperature_mix", 1.0, (d, _) => graft.operators.Sampling.temperatureMix(spark, d)),
      ("q_keyness", 1.0, (d, _) => graft.operators.TextAnalysis.chi2Keyness(spark, d)),
      ("q_compress_ratio", 1.0, (d, _) => graft.operators.TextAnalysis.compressProfile(spark, d)),
      ("q_matryoshka", 1.0, (d, _) => graft.operators.Similarity.matryoshkaRecall(spark, d)),
      ("q_mmr_select", 1.0, (d, _) => graft.operators.Similarity.mmrSelect(spark, d)),
      ("q_dedup_savings", 1.0, (d, _) => graft.operators.Dedup.dedupSavings(spark, d)),
      ("q_label_balance", 1.0, (d, _) => graft.operators.Embeddings.labelBalance(spark, d)),
      ("q_knn_labelcheck", 1.0, (d, _) => graft.operators.Similarity.knnLabelCheck(spark, d)),
      ("q_length_drift", 1.0, (d, _) => graft.operators.Quality.lengthDrift(spark, d)),
      // r8 additions: row-local scans folded to source/label/type-
      // bounded grids (linear), the calendar-bounded ewma reduction,
      // and the two bounded md5-panel kernels (knn_labelcheck class:
      // panel size is fixed, so the kernel claims the corpus-linear
      // exponent of its scan + signature legs)
      ("q_lang_confusion", 1.0, (d, _) => graft.operators.TextAnalysis.langConfusion(spark, d)),
      ("q_pii_density", 1.0, (d, _) => graft.operators.TextAnalysis.piiDensity(spark, d)),
      ("q_fertility", 1.0, (d, _) => graft.operators.TextAnalysis.tokenFertility(spark, d)),
      ("q_mojibake", 1.0, (d, _) => graft.operators.TextAnalysis.mojibakeScreen(spark, d)),
      ("q_sentence_stats", 1.0, (d, _) => graft.operators.TextAnalysis.sentenceStats(spark, d)),
      ("q_readability", 1.0, (d, _) => graft.operators.TextAnalysis.readability(spark, d)),
      ("q_rouge_pairs", 1.0, (d, _) => graft.operators.TextAnalysis.rougePairs(spark, d)),
      ("q_minhash_est_audit", 1.0, (d, _) => graft.operators.Dedup.minhashEstAudit(spark, d)),
      ("q_interval_coalesce", 1.0, (d, _) => graft.operators.Temporal.intervalCoalesce(spark, d)),
      ("q_ewma_smooth", 1.0, (d, _) => graft.operators.TimeSeries.ewma(spark, d)),
      ("q_hour_profile", 1.0, (d, _) => graft.operators.Behavioral.hourProfile(spark, d)),
      ("q_rr_debias", 1.0, (d, _) => graft.operators.Privacy.rrDebias(spark, d)),
      ("q_label_centroid_drift", 1.0, (d, _) => graft.operators.Embeddings.labelCentroidDrift(spark, d)),
      ("q_vocab_curve", 1.0, (d, _) => graft.operators.TextAnalysis.vocabCurve(spark, d)),
      ("q_char_classes", 1.0, (d, _) => graft.operators.TextAnalysis.charClasses(spark, d)),
      ("q_peak_concurrency", 1.0, (d, _) => graft.operators.Temporal.peakConcurrency(spark, d)),
      ("q_dup_multiplicity", 1.0, (d, _) => graft.operators.Dedup.dupMultiplicity(spark, d)),
      ("q_degree_hist", 1.0, (d, _) => graft.operators.Graph.degreeHist(spark, d)),
      ("q_funnel_windowed", 1.0, (d, _) => graft.operators.Behavioral.windowedFunnel(spark, d)),
      // replicas carry DISJOINT part populations, so wedge/triangle
      // mass grows with the replica count, not its square
      ("q_clustering_coeff", 1.0, (d, _) => graft.operators.Graph.clusteringCoeff(spark, d)),
      ("q_json_profile", 1.0, (d, _) => graft.operators.Modern.jsonProfile(spark, d)),
      ("q_lang_mix", 1.0, (d, _) => graft.operators.Quality.langMix(spark, d)),
      // skew stress: a CONSTANT 300-copy boilerplate family planted
      // into the growing corpus — the hot band buckets (and their
      // quadratic pair mass) are the same at 1× and N×, so the probe
      // measures whether a hot bucket's PRESENCE breaks the
      // background's linear scaling (a straggler that serializes the
      // stage would blow the ratio), complementing SkewStressSpec's
      // plan-level asserts. Growing the family instead would measure
      // data-quadratic output, not the plan — the minhashPairs
      // exclusion above.
      ("skew_hot_band", 1.0, (d, _) => {
        val boiler = (1 to 60).map(i => s"boiler$i").mkString(" ")
        val hot = spark.range(300).select((-col("id") - 1).as("doc_id"),
          lit(boiler).as("text"))
        graft.operators.Dedup.minhashPairsOf(
          spark.read.parquet(s"$d/documents.parquet")
            .select(col("doc_id"), col("text")).unionByName(hot))
      }),
      // r9 additions: distinct-panel ledgers (growth/stickiness/power),
      // token-volume scans (span corruption, cdc chunking), the 4-way
      // level fan-out (generalization ladder), keyed-lag and day-panel
      // reductions (inter-arrival, cross-correlation), the routing
      // audit, and the site-partitioned quantile summary merge — all
      // linear claims
      ("q_growth_accounting", 1.0, (d, _) => graft.operators.Behavioral.growthAccounting(spark, d)),
      ("q_stickiness", 1.0, (d, _) => graft.operators.Behavioral.stickiness(spark, d)),
      ("q_power_users", 1.0, (d, _) => graft.operators.Behavioral.powerUsers(spark, d)),
      ("q_span_corruption", 1.0, (d, _) => graft.operators.TextAnalysis.spanCorruption(spark, d)),
      ("q_cdc_chunks", 1.0, (d, _) => graft.operators.Dedup.cdcChunks(spark, d)),
      ("q_generalization_curve", 1.0, (d, _) => graft.operators.Privacy.generalizationCurve(spark, d)),
      ("q_interarrival_hist", 1.0, (d, _) => graft.operators.TimeSeries.interarrivalHist(spark, d)),
      ("q_cross_corr", 1.0, (d, _) => graft.operators.TimeSeries.crossCorr(spark, d)),
      ("q_shard_balance", 1.0, (d, _) => graft.operators.Quality.shardBalance(spark, d)),
      ("q_federated_quantiles", 1.0, (d, _) => graft.operators.Federation.federatedQuantileAudit(spark, d)),
      // r9 continuation: profiling audits reduce to distinct panels
      // (facts grow N×, dims fixed); phrase/sttr are row-local scans;
      // ltv/gaps/sax fold onto calendar- or segment-bounded panels;
      // node-jaccard pair mass is linear (disjoint replica parts, same
      // basket sizes); PQ trains fixed-k codebooks in linear scans and
      // the recall audit is a fixed panel against a linear corpus
      ("q_fd_audit", 1.0, (d, _) => graft.operators.Profiling.fdAudit(spark, d)),
      ("q_ind_audit", 1.0, (d, _) => graft.operators.Profiling.indAudit(spark, d)),
      ("q_key_profile", 1.0, (d, _) => graft.operators.Profiling.keyProfile(spark, d)),
      ("q_phrase_search", 1.0, (d, _) => graft.operators.Search.phraseSearch(spark, d)),
      ("q_ltv_cohort", 1.0, (d, _) => graft.operators.Behavioral.ltvCohort(spark, d)),
      ("q_order_gaps", 1.0, (d, _) => graft.operators.Behavioral.orderGaps(spark, d)),
      ("q_sttr", 1.0, (d, _) => graft.operators.TextAnalysis.sttr(spark, d)),
      ("q_node_jaccard", 1.0, (d, _) => graft.operators.Graph.nodeJaccard(spark, d)),
      ("q_sax_symbols", 1.0, (d, _) => graft.operators.TimeSeries.saxSymbols(spark, d)),
      ("q_pq_codes", 1.0, (d, _) => graft.operators.Similarity.pqCodes(spark, d)),
      ("q_pq_recall", 1.0, (d, _) => graft.operators.Similarity.pqRecallAudit(spark, d)),
      // r11: suffix spans — every doubling round is a corpus-linear
      // integer sort; marks and gap-islands are keyed windows
      ("q_suffix_spans", 1.0, (d, _) => graft.operators.Suffix.suffixSpans(spark, d)),
      // NOT q_media_phash_dup / q_split_leakage / q_blast_radius: like
      // minhashPairs, their OUTPUT is pair-shaped over template
      // families, so the replicated corpus grows it ~N²/2 by
      // construction — that measures the data, not the plan.
      // embeddings: index ops on their documented parameter-growth path
      ("q_embed_quantize", 1.0, (d, _) => graft.operators.Similarity.embedQuantize(spark, d)),
      ("q_ann_lsh", 1.0, (d, big) => graft.operators.Similarity.annLsh(spark, d,
        nPlanes = if (big) planes else 8)),
      ("q_ann_ivf", 1.5, (d, big) => graft.operators.Similarity.annIvf(spark, d,
        nCentroids = if (big) nlist else 16)),
      ("q_semantic_dedup", 1.5, (d, big) => graft.operators.Similarity.semanticDedup(spark, d,
        nCentroids = if (big) nlist else 16)))

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }

    // min-of-2 timed runs after a warm run: operator cost is
    // deterministic (fixed Lloyd iterations, no data-dependent loops),
    // so the MIN is the pinned cost and the spread between runs is the
    // machine noise a single-shot probe would mistake for a budget miss
    def timedMin(run: => Unit): Double = {
      run // warm: JIT + shuffle-file reuse paths
      math.min(time(run), time(run))
    }
    val rows = ops.filter(o => only.forall(_.contains(o._1)))
      .map { case (name, exp, fn) =>
      reset()
      val t1 = timedMin(fn(sfDir, false).write.mode("overwrite").format("noop").save())
      reset()
      val tN = timedMin(fn(bigDir, true).write.mode("overwrite").format("noop").save())
      val ratio = tN / t1
      val budget = math.pow(mult, exp)
      println(f"[scale] $name%-18s 1x=$t1%7.2fs ${mult}x=$tN%7.2fs " +
        f"ratio=$ratio%6.2f budget=n^$exp%.1f=$budget%6.2f" +
        (if (ratio > budget * 1.5) "  OVER-BUDGET" else ""))
      (name, t1, tN, ratio, ratio / budget)
    }
    val worst = rows.maxBy(_._5)
    println(f"[scale] summary: worst ratio/budget ${worst._1} ${worst._5}%.2f " +
      f"(mult $mult, docs $nDocs -> ${nDocs * mult})")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bigDir))
    spark.stop()
  }
}
