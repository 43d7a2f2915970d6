package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net: catches accidental cartesian products and
  * lost broadcasts across the whole query surface. The brute-force
  * similarity baselines are the only operators allowed a nested-loop
  * pair stage (documented O(n²) exact baselines; the LSH variants are
  * the scale path). */
class PlanHygieneSpec extends AnyFunSuite {
  import TestSpark._

  // q_source_similarity pairs per-GROUP sketches (|groups| rows, not
  // |docs|), so its nested loop is over the tiny aggregated side
  // q_status_matrix's cross join is dims-only (site registry × project
  // registry — |sites|×|projects| rows at any corpus scale);
  // q_unigram_logprob / q_tfidf / q_bm25 / q_source_mix cross-join a
  // 1-row broadcast (corpus-total / doc-count / avgdl / mix-cap scalars
  // attached lazily instead of a driver round trip)
  // q_pmi_collocations / q_bigram_logprob / q22_dormant /
  // q11_important_parts join 1-row broadcast scalars (corpus totals /
  // screening threshold / part-value total) — the same
  // lazily-attached-scalar class as q_unigram_logprob
  // q_audience_overlap pairs per-GROUP KMV sketches (|event types|
  // rows, not |events|) — the same tiny-aggregated-side class as
  // q_source_similarity
  // q_quality_tiers consumes the same 1-row corpus-total scalar attach
  // as q_unigram_logprob (they share the scoring subplan)
  private val nestedLoopAllowed = Set(
    "q_embed_neardup", "q_ann_bruteforce", "q_set_ops", "q_source_similarity",
    "q_media_neighbors", "q_status_matrix", "q_unigram_logprob",
    "q_quality_tiers",
    "q_tfidf", "q_bm25", "q_source_mix",
    "q_pmi_collocations", "q_bigram_logprob", "q22_dormant",
    "q11_important_parts", "q_audience_overlap",
    // broadcast 1-row scalar frames (reference day / cut instant /
    // threshold array)
    "q_decayed_engagement", "q_sliding_distinct", "q_equidepth_hist",
    "q_churn_labels", "q_basket_rules", "q_source_drift",
    // broadcast 1-row normalized query vector against the embeddings
    // scan (the dense leg's per-row dot product) — same class as the
    // lazily-attached scalars above
    "q_hybrid_rrf",
    // broadcast 1-row n_max scalar (the largest-source count the
    // rel_rate divides by) — the lazily-attached-scalar class again
    "q_mixture_weights",
    // dense (class × band) grid against the broadcast band dimension
    // (value-domain/50 rows — the CDF needs zeros materialized), the
    // same bounded-dim class as q_equidepth_hist
    "q_t_closeness",
    // broadcast lag dimension (7 rows) against the bounded day panel
    "q_autocorr",
    // dense (source × length-value) grid against the broadcast value
    // dimension — the KS CDFs need zeros materialized, q_t_closeness's
    // class again
    "q_ks_drift",
    // broadcast 1-row (min id, span) scalar for the range-decile bucket
    "q_heaps_curve",
    // day-panel pair kernel (non-equi da < db over the calendar-bounded
    // series) + broadcast 1-row scalar reductions
    "q_theilsen", "q_mann_kendall", "q_runs_test",
    // broadcast 1-row corpus-size scalar (the cleared /N)
    "q_token_burstiness",
    // source-cardinality-bounded totals-pair frame (non-equi a < b over
    // the broadcast per-source token totals — every pair must surface,
    // including vocabulary-disjoint ones at tv = 1)
    "q_unigram_tv_drift",
    // broadcast 1-row weight-sum and deficit scalars (largest-remainder
    // apportionment)
    "q_temperature_mix",
    // broadcast 1-row corpus-total scalar (the chi-square grand total)
    "q_keyness",
    // broadcast 1-row edge-count scalar (the cleared 4m^2 denominator)
    "q_modularity",
    // broadcast bounded md5 query panel against the corpus scan (the
    // q_media_neighbors panel-kernel class)
    "q_knn_labelcheck",
    // broadcast 1-row (total, max) scalar for the imbalance ratios
    "q_label_balance",
    // broadcast 1-row (min,max,N) scalar + dense <=10-row bin dimension
    // (the t-closeness grid class)
    "q_length_drift",
    // bounded md5-panel pair kernel (40² sketch-vs-exact audit) — the
    // q_media_neighbors/knn panel class
    "q_minhash_est_audit",
    // bounded md5 sample panel against the live posting scan (the
    // exact side of the recall audit) — same panel-kernel class
    "q_ivf_recall",
    // bounded md5-panel pair kernel (20² n-gram overlap eval) — the
    // minhash-audit panel class
    "q_rouge_pairs",
    // 4-row quantile-request dimension against the sites·B summary
    // panel, then the 4-row estimate frame broadcast against the fact
    // scan for the pooled rank audit — both sides bounded by B and
    // |probs|, never data-sized
    "q_federated_quantiles",
    // broadcast 32-row lag dimension against the calendar-bounded day
    // panel — the q_autocorr class
    "q_ewma_smooth",
    // dense 24-row hour dimension against the per-type totals — the
    // t-closeness grid class (zeros must materialize)
    "q_hour_profile",
    // broadcast |cuts|-row dimension against the TakeOrdered-bounded
    // top-maxCut type frame — the q_autocorr lag-dim class
    "q_vocab_curve",
    // per-candidate 1-row (n_child) × 1-row (n_contained) scalar
    // crossJoins — the 1-row scalar-reduction class
    "q_ind_audit",
    // per-candidate 1-row (n_rows) × 1-row (n_distinct) scalar
    // crossJoins — same class
    "q_key_profile",
    // bounded md5 query panel (raw vectors + ADC tables) against the
    // coded corpus scan — the q_ivf_recall panel-kernel class
    "q_pq_recall",
    // broadcast 1-row (k+1)-cut scalar and 1-row site-total against
    // the ≤ sites·(k+1) MG panel — the 1-row scalar-reduction class
    "q_federated_topk")

  test("no query plans a cartesian product; nested-loop only where documented") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      if (cartesian && !nestedLoopAllowed(name)) Some(s"$name: CartesianProduct")
      else if (bnlj && !nestedLoopAllowed(name)) Some(s"$name: BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("suffix-span plans contain no WindowExec partitioned on " +
    "window-content keys — the duplicated-class mark is a map-side-" +
    "combined aggregate + semi-join (AQE-skew-splittable), never a " +
    "count-over-window on (k1, k2): the hot class IS boilerplate and " +
    "WindowExec cannot be skew-split") {
    for (q <- Seq("q_suffix_spans", "q_span_clip")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      val partCols = "windowspecdefinition\\((\\w+)#".r
        .findAllMatchIn(plan).map(_.group(1)).toSet
      assert(partCols.subsetOf(Set("doc_id")),
        s"$q: window partitioned on content keys ${partCols -- Set("doc_id")}" +
          s" in:\n$plan")
    }
  }

  test("no split() re-evaluates inside a higher-order-function lambda") {
    // the trap class behind the winnow cubic: CollapseProject inlines a
    // tokenizing alias into a transform/aggregate lambda BODY, where it
    // re-evaluates per array ELEMENT (interpreted — HOFs don't codegen).
    // Let-binding via a one-element transform (winnowFpsOf) is the fix;
    // this net catches any query whose optimized plan carries split()
    // inside a lambdafunction span.
    def lambdaSpans(s: String): Seq[String] =
      "lambdafunction\\(".r.findAllMatchIn(s).map(_.end - 1).toSeq.map { open =>
        var depth = 0; var i = open
        while (i < s.length && (depth != 0 || i == open)) {
          if (s.charAt(i) == '(') depth += 1
          else if (s.charAt(i) == ')') depth -= 1
          i += 1
        }
        s.substring(open, i)
      }
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan.toString
      if (lambdaSpans(plan).exists(_.contains("split(")))
        Some(name) else None
    }
    assert(offenders.isEmpty,
      s"split() inside a lambda body (re-evaluates per element): $offenders")
  }

  test("star joins broadcast their dimension sides at small SF") {
    for (q <- Seq("q5_multijoin", "q_status_pivot", "q_completion_rate")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
      assert(!plan.contains("SortMergeJoin"), s"$q degraded to SMJ at test SF")
    }
  }

  /** Only true fixed-cardinality dims (nation, region) may carry an
    * explicit broadcast hint: with the auto-threshold disabled, those
    * stay broadcast while every scale-variable join (customer, supplier,
    * orders, lineitem) must fall back to a shuffle join. A lingering
    * hint on customer/supplier would keep them broadcast here and OOM a
    * real cluster at 100× — that is exactly what this test catches. */
  test("broadcast hints are confined to fixed-cardinality dims") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (q <- Seq("q3_join_agg", "q5_multijoin", "q_status_pivot",
        "q_completion_rate")) {
        val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
        val hintedDims = q match {
          case "q5_multijoin" => 2 // nation + region
          case "q3_join_agg" => 0 // no fixed dims in the query
          case _ => 1 // nation
        }
        assert(nBroadcast == hintedDims,
          s"$q: $nBroadcast broadcast joins under disabled threshold, " +
            s"expected $hintedDims (hinted fixed dims only) — a hint is " +
            "forcing a scale-variable table to broadcast")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$q: expected shuffle join for the scale-variable side")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  /** The custom expressions must PARTICIPATE in whole-stage codegen, not
    * silently fall back to interpreted projection — a fallback would
    * break the fused-loop performance story on every hot path that uses
    * them (LSH bucketing, simhash banding, candidate scoring). */
  test("native expressions stay inside whole-stage codegen") {
    import org.apache.spark.sql.execution.{ProjectExec, SparkPlan, WholeStageCodegenExec}
    import graft.functions.HashExpressions._
    val df = graft.sources.Tables.documents(spark, sf).select(
      simhash64(org.apache.spark.sql.functions.col("text")).as("fp"),
      minhashSignature(rollingShingles(
        org.apache.spark.sql.functions.col("text"), 5), 16).as("sig"))
    val plan = df.queryExecution.executedPlan
    val spans = plan.collect { case w: WholeStageCodegenExec => w }
    assert(spans.nonEmpty, s"no codegen span in:\n$plan")
    // every ProjectExec must sit under a WholeStageCodegenExec — an
    // interpreted project above/next to the spans means a fallback
    def interpretedProjects(p: SparkPlan): Int = p match {
      case _: WholeStageCodegenExec => 0
      case proj: ProjectExec => 1 + proj.children.map(interpretedProjects).sum
      case other => other.children.map(interpretedProjects).sum
    }
    assert(interpretedProjects(plan) == 0,
      s"interpreted projection outside codegen:\n$plan")
    df.collect() // and the generated code must actually compile + run
  }

  test("filters reach the parquet scans") {
    for ((q, pushed) <- Seq(
      "q1_pricing_agg" -> "LessThanOrEqual(l_shipdate",
      "q3_join_agg" -> "EqualTo(c_mktsegment,BUILDING)",
      "q_asof_join" -> "EqualTo(event_type,purchase)",
      // Q6's whole point: all three predicates at the scan
      "q6_forecast_revenue" -> "GreaterThanOrEqual(l_shipdate",
      "q6_forecast_revenue" -> "LessThan(l_quantity,24.0)",
      "q10_returned_items" -> "EqualTo(l_returnflag,R)")) {
      // formatted explain prints PushedFilters in full — the plan
      // toString elides the list past ~100 chars
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains(pushed), s"$q: expected pushed filter $pushed")
    }
  }

  test("top-N queries plan TakeOrderedAndProject, never a global sort") {
    // q_hybrid_rrf: BOTH leg cuts must be TakeOrderedAndProject — a
    // global sort here would mean the rank windows see the corpus-sized
    // score relation instead of legK rows
    // q_boilerplate_grams: the top-K gram cut; q_rfm_segments: the
    // md5-panel cut that bounds the quintile windows
    for (q <- Seq("q10_returned_items", "q3_join_agg", "q_weighted_sample",
      "q_hybrid_rrf", "q_boilerplate_grams", "q_rfm_segments")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q: expected TakeOrderedAndProject in:\n$plan")
    }
  }

  test("index probes plan no global sort — presentation ordering belongs " +
    "at the caller's edge, not as an Exchange inside a library operator") {
    import org.apache.spark.sql.functions.col
    graft.operators.Dedup.buildMinhashIndex(spark, sf, "ph_mh", nBuckets = 4)
    graft.operators.Dedup.buildContainmentIndex(spark, sf, "ph_cont", nBuckets = 4)
    graft.operators.Dedup.buildEditIndex(spark, sf, "ph_edit", nBuckets = 4)
    graft.operators.Search.buildSearchIndex(spark, sf, "ph_srch", nBuckets = 4)
    graft.operators.Similarity.buildIvfIndex(spark, sf, "ph_ivf", nBuckets = 4)
    graft.operators.TextAnalysis.buildWinnowIndex(spark, sf, "ph_wn",
      nBuckets = 4)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(20)
    val custs = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey").as("probe_key"), col("c_name").as("probe_name"))
      .limit(20)
    val qvecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(20)
    import spark.implicits._
    val qterms = Seq((1L, "data"), (1L, "model")).toDF("query_id", "tok")
    val probes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "probeMinhashIndex" ->
        graft.operators.Dedup.probeMinhashIndex(spark, "ph_mh", docs),
      "probeContainmentIndex" ->
        graft.operators.Dedup.probeContainmentIndex(spark, "ph_cont", docs),
      "probeEditIndex" ->
        graft.operators.Dedup.probeEditIndex(spark, "ph_edit", custs),
      "probeSearchIndexMany" ->
        graft.operators.Search.probeSearchIndexMany(spark, "ph_srch", qterms),
      "probeIvfIndexOn" ->
        graft.operators.Similarity.probeIvfIndexOn(spark, "ph_ivf", qvecs),
      "probeWinnowIndex" ->
        graft.operators.TextAnalysis.probeWinnowIndex(spark, "ph_wn", docs))
    for ((name, df) <- probes) {
      // a global sort plans as a range-partitioning Exchange; the
      // windowed ranks' partition-LOCAL sorts are fine and stay
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("rangepartitioning"),
        s"$name plans a global sort:\n$plan")
    }
    // the single-query search probe is the exception that PROVES the
    // rule: its ordering is top-N semantics and must plan as
    // TakeOrderedAndProject, not a global sort either
    val topn = graft.operators.Search.probeSearchIndex(spark, "ph_srch")
      .queryExecution.executedPlan.toString
    assert(topn.contains("TakeOrderedAndProject") &&
      !topn.contains("rangepartitioning"),
      s"probeSearchIndex must cut top-N without a global sort:\n$topn")
  }

  test("panel-kernel and probe rank cuts plan WindowGroupLimit — the " +
    "rank-limit pushdown that keeps panel×corpus partitions from " +
    "fully sorting; a refactor that breaks the filter-over-window " +
    "shape would silently regress to a full partition sort") {
    import org.apache.spark.sql.functions.col
    // per-query rank windows whose filter must push into the window:
    // the 1-NN panel kernel, the IVF candidate rerank, the LSH rerank
    for (q <- Seq("q_knn_labelcheck", "q_ann_ivf", "q_ann_lsh")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$q: expected WindowGroupLimit in:\n$plan")
    }
    // the PQ-ADC recall audit ranks its ADC leg and its exact leg in
    // SEPARATE projections, each with its rank cut adjacent — BOTH
    // legs must net a WindowGroupLimit (an OR-of-two-ranks filter
    // over one frame pushes neither and fully sorts each panel slice)
    val pqPlan = SparkEntry.queries("q_pq_recall")(spark, sf)
      .queryExecution.executedPlan.toString
    val wglCount = "WindowGroupLimit".r.findAllIn(pqPlan).size
    assert(wglCount >= 2,
      s"q_pq_recall: expected both rank legs to plan WindowGroupLimit " +
        s"(found $wglCount):\n$pqPlan")
    // the persisted-index probe faces (library operators — same law)
    graft.operators.Similarity.buildIvfIndex(spark, sf, "wgl_ivf",
      nBuckets = 2)
    graft.operators.Search.buildSearchIndex(spark, sf, "wgl_srch",
      nBuckets = 2)
    val qvecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")).limit(20)
    import spark.implicits._
    val qterms = Seq((1L, "data"), (1L, "model")).toDF("query_id", "tok")
    val ivfProbe = graft.operators.Similarity
      .probeIvfIndexOn(spark, "wgl_ivf", qvecs)
      .queryExecution.executedPlan.toString
    assert(ivfProbe.contains("WindowGroupLimit"),
      s"probeIvfIndexOn: expected WindowGroupLimit in:\n$ivfProbe")
    // the compressed family's probe: ADC rank cut must push on both
    // faces, and the rerank face's exact re-rank cut too
    graft.operators.Similarity.buildIvfPqIndex(spark, sf, "wgl_ivfpq",
      nBuckets = 2)
    val pqProbe = graft.operators.Similarity
      .probeIvfPqIndex(spark, "wgl_ivfpq", qvecs)
      .queryExecution.executedPlan.toString
    assert(pqProbe.contains("WindowGroupLimit"),
      s"probeIvfPqIndex(adc): expected WindowGroupLimit in:\n$pqProbe")
    val pqRerank = graft.operators.Similarity
      .probeIvfPqIndex(spark, "wgl_ivfpq", qvecs, rerank = 6)
      .queryExecution.executedPlan.toString
    val pqWgl = "WindowGroupLimit".r.findAllIn(pqRerank).size
    assert(pqWgl >= 2,
      s"probeIvfPqIndex(rerank): both rank cuts must push " +
        s"(found $pqWgl):\n$pqRerank")
    // federated top-k: the (k+1)-cut and the final top-N must plan as
    // TakeOrderedAndProject, never a global sort over the panel
    val topk = SparkEntry.queries("q_federated_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(topk.contains("TakeOrderedAndProject"),
      s"q_federated_topk: expected TakeOrderedAndProject in:\n$topk")
    val srchProbe = graft.operators.Search
      .probeSearchIndexMany(spark, "wgl_srch", qterms)
      .queryExecution.executedPlan.toString
    assert(srchProbe.contains("WindowGroupLimit"),
      s"probeSearchIndexMany: expected WindowGroupLimit in:\n$srchProbe")
  }
}
