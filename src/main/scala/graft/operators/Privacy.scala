package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Privacy risk scanning over event data — the re-identification-risk
  * complement of the PII surface ops (`TextAnalysis.piiRedact`): before
  * an event log can feed a training pipeline, classes of records whose
  * quasi-identifier combination isolates fewer than k individuals must
  * be found (k-anonymity, Sweeney 2002) and either generalized or
  * suppressed.
  */
object Privacy {

  /** k-anonymity scan with a one-step generalization ladder.
    *
    * Level 0 quasi-identifier: (event_type, event day, value band of
    * 100). Every class reports its row count and DISTINCT-user count;
    * `at_risk` marks classes isolating fewer than k users. For those,
    * `generalization_rescues` answers the auditor's next question:
    * does coarsening the QI one step (drop the value band, widen day →
    * month) lift the class over k — i.e. is generalization enough, or
    * must these rows be suppressed?
    *
    * Scale shape: two map-side-combined aggregations over the log (the
    * distinct-user count is Spark's standard two-phase partial
    * aggregate — the shuffle carries (class, user) pairs, bounded by
    * the log itself), then a broadcast join against the month-level
    * rescue table (|event_types| × |months| rows — KB-sized at any log
    * size). Nothing here is corpus-quadratic; at extreme class
    * cardinality the exact distinct swaps for the KMV sketch
    * (`Federation.groupOverlap`'s aggregate) without changing the plan
    * shape. */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    kAnonymityOn(Tables.events(spark, dir), k)

  /** Core of [[kAnonymity]] over any frame with (event_type, ts,
    * value, user_id) — split out so specs can drive crafted QI
    * classes through the rescue ladder. */
  def kAnonymityOn(events: DataFrame, k: Int = 5): DataFrame = {
    // day is date_trunc (timestamp-typed), the repo-wide edge
    // convention — raw DATE columns hit engine-dtype skew at the
    // driver compare
    val e = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        floor(col("value") / 100).cast("long").as("value_band"),
        col("user_id"))
    val l0 = e.groupBy(col("event_type"), col("day"), col("value_band"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"))
    // join keys renamed on the broadcast side: l0/l1 share lineage (a
    // self-join over `e`), and same-name keys make the analyzer resolve
    // both sides to one attribute — a trivially-true predicate WARN that
    // buries real warnings in the bench log
    val l1 = e.groupBy(col("event_type").as("l1_event_type"),
        date_trunc("month", col("day")).as("month"))
      .agg(countDistinct(col("user_id")).as("l1_users"))
    l0.join(broadcast(l1),
        col("event_type") === col("l1_event_type") &&
          date_trunc("month", col("day")) === col("month"))
      .select(col("event_type"), col("day"), col("value_band"),
        col("n_rows"), col("n_users"),
        (col("n_users") < k).as("at_risk"),
        (col("n_users") < k && col("l1_users") >= k)
          .as("generalization_rescues"))
      .orderBy(col("event_type"), col("day"), col("value_band"))
  }

  def lDiversity(spark: SparkSession, dir: String, k: Int = 5,
      lMin: Int = 2): DataFrame =
    lDiversityOn(Tables.events(spark, dir), k, lMin)

  /** l-diversity scan (Machanavajjhala et al. 2007) — the homogeneity
    * follow-up to [[kAnonymityOn]]: a class can isolate ≥ k users and
    * STILL leak if every member shares the sensitive value (here the
    * value band), because membership alone then reveals it. Per
    * quasi-identifier class (event_type, day): row/user counts, the
    * number of distinct sensitive bands `l_bands`, and the row count of
    * the dominant band (the frequency the recursive-(c,l) variant
    * reasons about — emitted as the exact integer so auditors apply
    * their own c). `homogeneity_risk` flags classes that pass
    * k-anonymity yet carry fewer than lMin bands.
    *
    * Scale shape: one (class, band) aggregation, one per-class distinct
    * over the log, then a class-keyed join of two already-aggregated
    * frames (both group-sized; the second shuffle reuses the class
    * key). No corpus-quadratic step. */
  def lDiversityOn(events: DataFrame, k: Int = 5, lMin: Int = 2): DataFrame = {
    val e = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        floor(col("value") / 100).cast("long").as("value_band"),
        col("user_id"))
    val bands = e.groupBy(col("event_type"), col("day"), col("value_band"))
      .agg(count(lit(1)).as("band_rows"))
    val classes = bands.groupBy(col("event_type"), col("day"))
      .agg(sum(col("band_rows")).as("n_rows"),
        count(lit(1)).as("l_bands"),
        max(col("band_rows")).as("top_band_rows"))
    val users = e.groupBy(col("event_type"), col("day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    classes.join(users, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n_rows"), col("n_users"),
        col("l_bands"), col("top_band_rows"),
        (col("n_users") >= k && col("l_bands") < lMin)
          .as("homogeneity_risk"))
      .orderBy(col("event_type"), col("day"))
  }

  def dpBounded(spark: SparkSession, dir: String, cap: Int = 3): DataFrame =
    dpBoundedOn(Tables.events(spark, dir), cap)

  /** Per-user contribution bounding — the sensitivity-control step
    * every user-level differential-privacy release starts with: cap
    * each user's contribution to a histogram cell (event_type, day) at
    * `cap` rows, so one user can shift any released count by at most
    * `cap` regardless of how many rows they generated. Emits the
    * clipped count next to the raw count and the rows the clip
    * discarded — the utility-loss audit an ε-budget review asks for.
    *
    * Scale shape: groupBy(user, cell) with map-side combine (the only
    * log-sized shuffle), then a cell-keyed second aggregation over the
    * already-collapsed (user, cell) frame. All-integer output, exact
    * in any engine. */
  def dpBoundedOn(events: DataFrame, cap: Int = 3): DataFrame = {
    val perUser = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("user_id"))
      .groupBy(col("event_type"), col("day"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    perUser.groupBy(col("event_type"), col("day"))
      .agg(sum(col("cnt")).as("raw_count"),
        sum(least(col("cnt"), lit(cap.toLong))).as("bounded_count"),
        count(lit(1)).as("n_contributors"))
      .withColumn("clipped_rows", col("raw_count") - col("bounded_count"))
      .orderBy(col("event_type"), col("day"))
  }

  def dpRelease(spark: SparkSession, dir: String, epsilon: Double = 1.0,
      cap: Int = 3, seed: Int = 42): DataFrame =
    dpReleaseOn(Tables.events(spark, dir), epsilon, cap, seed)

  /** ε-DP histogram release over the contribution-bounded counts:
    * Laplace(b = cap/ε) noise per cell via the inverse CDF,
    * noise = −b·sign(u−½)·ln(1−2|u−½|), with u the md5-derived uniform
    * of (cell, seed) — the repo's standard hash-uniform (Gumbel top-k,
    * weighted sampling), so the release is REPRODUCIBLE given the seed:
    * reruns, partitionings and cluster sizes all emit the same noise.
    * Production would draw u from a CSPRNG instead; everything else —
    * sensitivity bound, mechanism, post-processing clamp — is the real
    * pipeline. `released` clamps to ≥ 0 (post-processing preserves DP).
    *
    * Rows-only at the driver by design: the noise is transcendental
    * (ln), and libm last-ulp skew across engines lands on reporting-
    * rounding boundaries — the mechanism's correctness is carried by
    * specs (exact ε-rescaling law, symmetry, |noise| mean ≈ b,
    * seed determinism). Plan shape: [[dpBoundedOn]] plus one row-local
    * projection — no additional shuffle. */
  def dpReleaseOn(events: DataFrame, epsilon: Double = 1.0, cap: Int = 3,
      seed: Int = 42): DataFrame = {
    val b = cap / epsilon
    val u = (conv(substring(md5(concat_ws("|", col("event_type"),
        col("day").cast("string"), lit(seed))), 1, 13), 16, 10)
      .cast("double") + lit(0.5)) / lit(math.pow(16.0, 13))
    val centered = u - lit(0.5)
    val noise = -lit(b) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    dpBoundedOn(events, cap)
      .withColumn("noise", noise)
      .withColumn("released",
        greatest(round(col("bounded_count") + col("noise"), 4), lit(0.0)))
      .select(col("event_type"), col("day"), col("bounded_count"),
        col("noise"), col("released"))
      .orderBy(col("event_type"), col("day"))
  }

  /** t-closeness scan (Li et al. 2007) — the distributional upgrade of
    * [[kAnonymity]]/[[lDiversity]]: a QI class can be k-anonymous and
    * l-diverse yet still leak if its SENSITIVE-value distribution sits
    * far from the corpus-wide one. For the ordered sensitive attribute
    * (value band of 50) the distance is the Earth Mover's Distance
    * with unit ground distance, EMD = (1/(m−1))·Σᵢ |CDF_class(i) −
    * CDF_global(i)| over the m global bands.
    *
    * Exactness: clearing the two CDFs of their denominators gives
    * Dᵢ = cumᵢ(class)·N − cumᵢ(global)·N_g — BIGINTs — so
    * emd_num = Σ|Dᵢ| and emd_den = (m−1)·N_g·N are exact and the one
    * final division is correctly rounded. The t = 0.2 verdict is the
    * integer comparison 5·emd_num ≤ emd_den (no float in the gate).
    *
    * Scale shape: one map-side-combined (class, band) count; the band
    * relation is a bounded dimension (value-domain/50 rows) carrying
    * its global cumulative, broadcast into a grid join against the
    * class list (classes × m rows — the dense grid the CDF needs,
    * zeros included); the per-class cumulative window runs over ≤ m
    * rows per class. Nothing is corpus-sized after the first count. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame =
    tClosenessOn(Tables.events(spark, dir))

  /** Core of [[tCloseness]] over any frame with (event_type, ts,
    * value) — split out so specs can drive crafted distributions
    * (identical ⇒ EMD 0, disjoint extremes ⇒ EMD 1) through it. */
  def tClosenessOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col("event_type"),
      date_trunc("day", col("ts")).as("day"),
      floor(col("value") / 50).cast("long").as("band"))
    val gb = base.groupBy(col("event_type"), col("day"), col("band"))
      .agg(count(lit(1)).as("n_gb"))
    val groups = gb.groupBy(col("event_type"), col("day"))
      .agg(sum(col("n_gb")).as("n_g"))
    // the band dimension: global count, global cumulative, m and N ride
    // along via windows over the bounded relation (the gini one-group
    // trick keeps the partition key non-foldable)
    def oneGroup = pmod(col("band"), lit(1))
    val wCum = Window.partitionBy(oneGroup).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(oneGroup)
    val bins = gb.groupBy(col("band")).agg(sum(col("n_gb")).as("n_b"))
      .withColumn("cum_b", sum(col("n_b")).over(wCum))
      .withColumn("n_tot", sum(col("n_b")).over(wAll))
      .withColumn("m", count(lit(1)).over(wAll))
      .select(col("band").as("g_band"), col("cum_b"), col("n_tot"), col("m"))
    // dense (class × band) grid — every class must see every global
    // band (missing ⇒ zero mass) for its CDF to align with the global
    val grid = groups.crossJoin(broadcast(bins))
      .join(gb.withColumnRenamed("band", "g_band"),
        Seq("event_type", "day", "g_band"), "left")
      .withColumn("n_in", coalesce(col("n_gb"), lit(0L)))
    val wClass = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("g_band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_g", sum(col("n_in")).over(wClass))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("n_g")).as("n_rows"),
        sum(abs(col("cum_g") * col("n_tot") - col("cum_b") * col("n_g")))
          .as("emd_num"),
        ((max(col("m")) - lit(1L)) * max(col("n_g")) * max(col("n_tot")))
          .as("emd_den"))
      .withColumn("emd", when(col("emd_den") > 0L,
        round(col("emd_num").cast("double") / col("emd_den"), 6)))
      .withColumn("within_t",
        when(col("emd_den") > 0L, lit(5L) * col("emd_num") <= col("emd_den")))
      .orderBy(col("event_type"), col("day"))
  }

  /** RANDOMIZED-RESPONSE frequency debiasing (Warner 1965, generalized
    * k-ary mechanism at p = ½): each row reports its true category
    * with probability ½, else one of the other k−1 categories
    * uniformly, and the per-category TRUE count is recovered by the
    * unbiased estimator t̂_c = (2(k−1)·n_c − n)/(k−2) — the local-DP
    * collection primitive (what a client-side telemetry or
    * sensitive-label pipeline aggregates). The coin is the repo's
    * hash-uniform: two md5 hex digits of the row key drive both the
    * truth flip (parity) and the replacement draw (u div 2 mod k−1),
    * so the whole mechanism is a pure function of the data —
    * bit-reproducible across engines/partitionings, which is what puts
    * a RANDOMIZED mechanism on the exact-oracle surface (production
    * swaps a client CSPRNG; estimator and plan are unchanged). The
    * category dimension is the observed domain, alphabetically
    * indexed; the estimator clears to one BIGINT numerator over the
    * integer k−2 with one closing division. Shuffle ~ corpus rows
    * once; everything else is bounded by the category domain. */
  def rrDebias(spark: SparkSession, dir: String): DataFrame =
    rrDebiasOn(Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")))

  /** Core of [[rrDebias]] over any (doc_id, lang) frame — split out so
    * specs can drive crafted domains (skewed truth, k = 3) through
    * the mechanism and recount the estimator by hand. */
  def rrDebiasOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dims = docs.select(col("lang")).distinct()
    // tiny post-aggregation frame; non-foldable constant partition key
    // keeps the rank window off a single global-sort partition
    val win = Window.partitionBy(pmod(length(col("lang")), lit(1)))
      .orderBy(col("lang"))
    val idx = dims.select(col("lang"),
      (row_number().over(win) - 1).cast("long").as("idx"))
    val k = dims.agg(count(lit(1)).as("k")).scalar()
    val n = docs.agg(count(lit(1)).as("n")).scalar()
    val coined = docs.join(broadcast(idx), Seq("lang"))
      .withColumn("u",
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("long"))
      // k = 1 (single-category domain) has no replacement draw to make:
      // guard the modulo (ANSI would throw on % 0) so the degenerate
      // domain reports n_reported = n_true with est NULL instead of
      // failing the whole frame
      .withColumn("r",
        when(k > lit(1L), expr("u div 2") % (k - lit(1L)))
          .otherwise(lit(0L)))
      .withColumn("rep_idx",
        when(col("u") % 2 === 0 || k <= lit(1L), col("idx"))
          .otherwise(when(col("r") >= col("idx"), col("r") + 1)
            .otherwise(col("r"))))
    val rep = coined.join(broadcast(
        idx.select(col("idx").as("rep_idx"), col("lang").as("lang_rep"))),
        Seq("rep_idx"))
      .groupBy(col("lang_rep").as("lang"))
      .agg(count(lit(1)).as("n_rep"))
    val tru = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_t"))
    idx.select(col("lang"))
      .join(rep, Seq("lang"), "left")
      .join(tru, Seq("lang"), "left")
      .select(col("lang"),
        coalesce(col("n_t"), lit(0L)).as("n_true"),
        coalesce(col("n_rep"), lit(0L)).as("n_reported"))
      .withColumn("est_num",
        (lit(2L) * (k - lit(1L)) * col("n_reported") - n).cast("long"))
      .withColumn("est_den", (k - lit(2L)).cast("long"))
      .withColumn("est", when(col("est_den") > 0L,
        round(col("est_num").cast("double") / col("est_den"), 6)))
      .orderBy(col("lang"))
  }

  /** GENERALIZATION LADDER for k-anonymity planning: re-evaluate the
    * quasi-identifier partition (event_type × value band) at four
    * coarsening levels — 10-unit, 100-unit, 1000-unit bands, and the
    * fully-suppressed band — and report, per level, the class count
    * and how much row/user mass still sits in classes below k. Where
    * [[kAnonymity]] grades cells at one grain and tests one rescue,
    * this is the anonymization-DESIGN table: pick the coarsest level
    * whose utility survives and whose at-risk share clears policy.
    * One scan with a row-local 4-way level fan-out (explode), one
    * keyed aggregate per (level, class), then a level-bounded rollup;
    * milli-unit banding keeps every figure integer-exact. */
  def generalizationCurve(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val divs = Seq(10000L, 100000L, 1000000L) // milli-units: 10/100/1000
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm"))
      .withColumn("lvl", explode(typedlit(Seq(0L, 1L, 2L, 3L))))
      // FLOOR division via the pmod identity (Spark `div` truncates
      // toward zero, DuckDB `//` floors — they diverge on negative
      // values; identical on this data, but banding must not silently
      // change meaning if a future corpus carries refunds)
      .withColumn("band",
        when(col("lvl") === 3L, lit(0L))
          .otherwise(when(col("lvl") === 0L,
            expr(s"(vm - pmod(vm, ${divs(0)}L)) div ${divs(0)}L"))
            .otherwise(when(col("lvl") === 1L,
              expr(s"(vm - pmod(vm, ${divs(1)}L)) div ${divs(1)}L"))
              .otherwise(
                expr(s"(vm - pmod(vm, ${divs(2)}L)) div ${divs(2)}L")))))
    val classes = e.groupBy(col("lvl"), col("event_type"), col("band"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"))
    classes.groupBy(col("lvl"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(col("n_users") < k, col("n_rows")).otherwise(0L))
          .as("rows_at_risk"),
        sum(when(col("n_users") < k, 1L).otherwise(0L))
          .as("classes_at_risk"))
      .withColumn("safe_share", when(col("n_rows") > 0L,
        round((col("n_rows") - col("rows_at_risk")).cast("double") /
          col("n_rows"), 6)))
      .orderBy(col("lvl"))
  }
}
