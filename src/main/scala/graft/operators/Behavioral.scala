package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Behavioral / product-analytics operators over the event log: funnel
  * progression, cohort retention, and windowed anomaly scoring. All
  * three are one-or-two-shuffle plans keyed on user or (type, bucket) —
  * no global windows, no self-joins proportional to the event volume.
  */
object Behavioral {

  /** Ordered funnel progression per user: how far through
    * `stages` (e.g. signup → view → purchase) each user advanced,
    * where stage k+1 must occur strictly AFTER the first completion of
    * stage k. Plan shape is ONE shuffle: events group to their user,
    * are sorted row-locally (sort_array over (ts, event_id, type)
    * structs — collect_list order is nondeterministic, the sort pins
    * it), and a single `aggregate` fold walks the timeline advancing
    * the stage cursor. The per-user state is the event list — bounded
    * by per-user activity, the same contract as sessionization; the
    * staged-self-join alternative costs |stages| shuffles of the full
    * log. Fold semantics equal the staged-min semantics (first
    * stage-k+1 event after the first stage-k completion IS the minimum
    * such timestamp), which is what the DuckDB oracle computes. */
  def funnel(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("signup", "view", "purchase")): DataFrame = {
    val k = stages.length
    val stageArr = array(stages.map(lit): _*)
    val folded = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type").as("etype")))).as("evs"))
      .withColumn("stage_ts",
        aggregate(col("evs"),
          expr("CAST(array() AS array<timestamp>)"),
          (acc, e) => when(size(acc) < k &&
              e.getField("etype") === element_at(stageArr, size(acc) + 1),
            concat(acc, array(e.getField("ts")))).otherwise(acc)))
    val stageCols = stages.zipWithIndex.map { case (s, i) =>
      element_at(col("stage_ts"), i + 1).as(s"t_$s")
    }
    folded.select(col("user_id") +:
        size(col("stage_ts")).cast("long").as("stages_reached") +:
        stageCols: _*)
      .orderBy(col("user_id"))
  }

  /** Cohort retention: users cohorted by the week of their first event;
    * for each (cohort week, week offset) the count of cohort members
    * active in that week. Two aggregations (first-week per user,
    * distinct user-weeks) joined on user — every shuffle is keyed on
    * user or the small (cohort, offset) pair, nothing global. Offsets
    * capped at `maxWeeks` so the output stays dimension-sized. */
  def retention(spark: SparkSession, dir: String,
      maxWeeks: Int = 8): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    active.join(cohorts, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
      .filter(col("week_offset") <= maxWeeks)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Windowed anomaly score: hourly event counts per type, z-scored
    * against the trailing 24 buckets of the SAME type (a keyed window —
    * partition count scales with |types|, each partition is a
    * time-ordered bucket series, never the raw log). Buckets with fewer
    * than `minTrailing` trailing observations or zero variance emit a
    * null score instead of a spurious one. Scores are rounded so
    * cross-engine float noise can't flip the output. */
  def anomalyScore(spark: SparkSession, dir: String,
      minTrailing: Int = 12): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("mu", avg(col("n")).over(w))
      .withColumn("sigma", stddev_samp(col("n")).over(w))
      .withColumn("n_trailing", count(col("n")).over(w))
      .withColumn("z",
        when(col("n_trailing") >= minTrailing && col("sigma") > 0,
          round((col("n") - col("mu")) / col("sigma"), 6)))
      .select(col("event_type"), col("bucket"), col("n"), col("z"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Half-life-decayed engagement — the recency-weighted activity
    * score a feature store derives from an event log (recent activity
    * counts full, activity `halfLifeDays` old counts half, and so on).
    *
    * Exactness trick that keeps a decay score on the DuckDB oracle
    * surface: weights are restricted to POWERS OF TWO —
    * w = 1 / 2^(days_ago div halfLife) — and the per-user sum is
    * accumulated in EXACT INTEGER UNITS of 2^-62: each event
    * contributes 2^(62-k) summed as decimal(38,0), and the total is
    * converted to a score by ONE division by 2^62 at the end. The
    * integer sum is exact at any event count and any exponent span
    * (a 53-bit double sum would silently lose exactness once a
    * user's weights span ≥ 53 bits — e.g. one year-old event plus 64
    * recent ones), so the result stays order-independent and
    * bit-identical across engines and partitionings: the only
    * rounding anywhere is the correctly-rounded integer→double
    * conversion of the exact sum (identical in both engines), and
    * the final division by a power of two is a float exponent shift,
    * exact by construction. The usual exp(−λΔt) would be
    * transcendental (libm last-ulp skew → rows-only); stepped
    * halving IS the half-life semantics, quantized to the audit
    * grain.
    *
    * Scale shape: one row-local projection against the broadcast
    * 1-row reference day, then a map-side-combined groupBy(user) —
    * the shuffle carries one partial sum per (partition, user). The
    * shift exponent is capped at 62 (beyond that the weight
    * underflows long shift; events older than 62 half-lives
    * contribute a true zero). */
  def decayedEngagement(spark: SparkSession, dir: String,
      halfLifeDays: Int = 7): DataFrame =
    decayedEngagementOn(Tables.events(spark, dir), halfLifeDays)

  /** Core of [[decayedEngagement]] over any (user_id, ts) frame. */
  def decayedEngagementOn(events: DataFrame,
      halfLifeDays: Int = 7): DataFrame = {
    val e = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val refDf = e.agg(max(col("day")).as("ref_day"))
    e.crossJoin(broadcast(refDf))
      .withColumn("k",
        least(expr(s"datediff(ref_day, day) div $halfLifeDays"), lit(62)))
      .withColumn("units",
        when(col("k") >= 62, lit(0L))
          .otherwise(expr("shiftleft(1L, cast(62 - k AS int))"))
          .cast("decimal(38,0)"))
      .groupBy(col("user_id"))
      .agg((sum(col("units")).cast("double") /
          lit(4611686018427387904L).cast("double")).as("engagement"),
        count(lit(1)).as("n_events"),
        max(col("day")).as("last_day"))
      .orderBy(col("user_id"))
  }

  /** Supervised CHURN label + feature generation from the raw event
    * log — the label-join step a behavioral training pipeline runs
    * before model fitting: observation window = everything up to
    * `horizonDays` before the log's end, label window = the remaining
    * tail; a user churned iff they were active in the observation
    * window and silent in the label window. Features are the standard
    * RFM trio over the observation window (event count, distinct
    * types, days since last activity at the cut), all integer/exact.
    *
    * Plan shape: the reference instant rides as a broadcast 1-row
    * frame (no driver round trip); one map-side-combined groupBy(user)
    * per window; the label attach is a user-keyed left join against
    * the distinct label-window actives — every shuffle is user-keyed,
    * nothing global. Leakage hygiene by CONSTRUCTION: features read
    * only pre-cut rows, the label only post-cut rows. */
  def churnLabels(spark: SparkSession, dir: String,
      horizonDays: Int = 7): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val refDf = ev.agg(date_sub(max(col("ts")).cast("date"), horizonDays)
      .as("cut_day"))
    val tagged = ev.crossJoin(broadcast(refDf))
    val features = tagged
      .filter(col("ts").cast("date") <= col("cut_day"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        max(col("ts").cast("date")).as("last_day"),
        first(col("cut_day")).as("cut_day"))
      .withColumn("recency_days",
        datediff(col("cut_day"), col("last_day")).cast("long"))
    val active = tagged
      .filter(col("ts").cast("date") > col("cut_day"))
      .select(col("user_id")).distinct()
      .withColumn("active_after", lit(1))
    features.join(active, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_types"),
        col("recency_days"),
        when(col("active_after").isNull, 1L).otherwise(0L).as("churned"))
      .orderBy(col("user_id"))
  }

  /** Two-cohort conversion LIFT with the two-proportion z statistic —
    * the A/B readout layer over the event log (cohorts here by user-id
    * parity, the deterministic stand-in for an assignment column).
    * Stays on the ORACLE surface because every step is a correctly-
    * rounded IEEE operation on integer-derived values: counts are
    * exact longs, rates/pooled-p are single divisions, and z =
    * (pa−pb)/sqrt(p(1−p)(1/na+1/nb)) composes ÷ and sqrt — both
    * correctly rounded per IEEE 754 — in a FIXED expression tree, so
    * both engines produce the identical double (unlike ln/exp, where
    * libm last-ulp skew forces rows-only). Rounded at the edge anyway.
    *
    * Plan: one map-side-combined groupBy(user) for per-user conversion
    * flags, then a single conditional aggregation to one summary row. */
  def abLift(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .withColumn("cohort", pmod(col("user_id"), lit(2)))
    val s = users.agg(
      sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("cohort") === 0, col("converted")).otherwise(0L)).as("conv_a"),
      sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("cohort") === 1, col("converted")).otherwise(0L)).as("conv_b"))
    // pooled p of 0 or 1 has zero variance — the z statistic is
    // undefined (and ANSI division would throw); emit null, the same
    // way the anomaly scorer nulls flat windows
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    s.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(col("conv_a").cast("double") / col("n_a"), 6).as("rate_a"),
      round(col("conv_b").cast("double") / col("n_b"), 6).as("rate_b"),
      round(col("conv_a").cast("double") / col("n_a")
        - col("conv_b").cast("double") / col("n_b"), 6).as("lift"),
      when(pooled > 0.0 && pooled < 1.0,
        round(
          (col("conv_a").cast("double") / col("n_a")
            - col("conv_b").cast("double") / col("n_b"))
            / sqrt(pooled * (lit(1.0) - pooled)
              * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
        .as("z"))
  }

  /** First-order Markov transition matrix of the event stream: for
    * every ordered pair of event types, how often (count and empirical
    * probability) a user's event of type `from_type` is IMMEDIATELY
    * followed by one of type `to_type` — the next-event model behind
    * session prediction, anomalous-flow detection, and funnel design.
    *
    * Plan shape: ONE user-keyed window (lag over (ts, event_id) — the
    * same keyed-window contract as sessionization: partition count
    * scales with |users|, each partition is one user's timeline), then
    * a map-side-combined groupBy on the (from, to) pair — the second
    * shuffle carries at most |types|² rows per map partition. Row
    * totals come from a keyed window OVER THE AGGREGATED pair relation
    * (|types|² rows — dimension-sized at any log volume), so the log
    * is scanned and lag-windowed exactly ONCE; a totals-side
    * aggregate-and-join would re-run the whole subtree. Counts are
    * integers and p is a single rounded division — exact
    * cross-engine. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wTot = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("row_total", sum(col("n")).over(wTot))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("row_total"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Daily volume-burst screen, INTEGER-EXACT: flag (event_type, day)
    * cells whose count exceeds the type's whole-history mean by more
    * than `zInt` population standard deviations — the load-spike /
    * incident-detection twin of [[anomalyScore]]'s trailing-window z
    * (that one scores every bucket against its recent past; this one
    * is the flags-only report against the full baseline).
    *
    * The 100 TB trick is the same as `q_embed_outliers`: clear the
    * denominators instead of computing μ and σ. With D days, sum S and
    * square-sum Q for a type,  n > μ + z·σ  ⟺  n·D − S > 0  and
    * (n·D − S)² > z²·(D·Q − S²)  — all 64-bit integer arithmetic, no
    * float accumulation order anywhere, so the flag set is bit-stable
    * on every engine. (Counts beyond ~10⁹·days overflow the square
    * loudly under ANSI — acceptable: that is 10²-year corpus-total
    * territory, and a silent float would be worse.)
    *
    * Scale shape: one (type, day) count (map-side combined), one
    * |types|-sized moment aggregate joined back broadcast — the same
    * two-shuffle profile at any corpus size. */
  def burstDays(spark: SparkSession, dir: String, zInt: Int = 2): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val moments = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("sq"))
    val dev = col("n") * col("n_days") - col("s")
    val varTerm = col("n_days") * col("sq") - col("s") * col("s")
    daily.join(broadcast(moments), Seq("event_type"))
      .filter(dev > 0 && dev * dev > lit(zInt.toLong * zInt) * varTerm)
      .select(col("event_type"), col("day"), col("n"),
        (dev * dev - lit(zInt.toLong * zInt) * varTerm).as("excess"))
      .orderBy(col("event_type"), col("day"))
  }

  /** RFM segmentation (recency / frequency / monetary quintiles — the
    * classic behavioral-cohort operator): per user, last-activity
    * time, event count, and integer-milli spend, each cut into
    * quintiles by `ntile(5)`, concatenated into the familiar "r f m"
    * segment code. Quintiles are 1..5 ASCENDING in the raw metric
    * (5 = most recent / most active / highest spend).
    *
    * Everything on the oracle surface is integer-exact: recency is
    * epoch MICROS of the max timestamp, spend quantizes each event to
    * milli-units BEFORE the sum (BIGINT addition is order-free where
    * a double sum is not), and every ntile ordering carries a
    * `user_id` tiebreak so the bucket cut is a total order.
    *
    * Scale shape: the per-user aggregate is the one corpus-sized
    * shuffle (map-side combined). The quintile windows then run over
    * an md5-top-`panelN` user panel — the repo's fixed-audit-surface
    * pattern ([[Graph]] panels): TakeOrderedAndProject bounds the
    * frame FIRST, then the three rank windows see ≤ `panelN` rows on
    * a non-foldable constant partition key. Unbounded quintiles over
    * billions of users would be a global sort by construction —
    * panel-bounding is the honest form of this report. */
  def rfmSegments(spark: SparkSession, dir: String,
      panelN: Int = 5000): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(unix_micros(max(col("ts"))).as("recency_us"),
        count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
          .as("monetary_milli"))
    val panel = perUser
      .orderBy(md5(col("user_id").cast("string")), col("user_id"))
      .limit(panelN)
    def oneGroup = pmod(col("user_id"), lit(1))
    val wR = Window.partitionBy(oneGroup)
      .orderBy(col("recency_us"), col("user_id"))
    val wF = Window.partitionBy(oneGroup)
      .orderBy(col("n_events"), col("user_id"))
    val wM = Window.partitionBy(oneGroup)
      .orderBy(col("monetary_milli"), col("user_id"))
    panel
      .withColumn("r_quintile", ntile(5).over(wR).cast("long"))
      .withColumn("f_quintile", ntile(5).over(wF).cast("long"))
      .withColumn("m_quintile", ntile(5).over(wM).cast("long"))
      .withColumn("segment", concat(
        col("r_quintile").cast("string"),
        col("f_quintile").cast("string"),
        col("m_quintile").cast("string")))
      .orderBy(col("user_id"))
  }

  /** WINDOWED STRICT-ORDER FUNNEL (the windowFunnel of the analytics
    * engines, vs [[funnel]]'s unwindowed per-user stage fold): a user
    * converts at stage i only via STRICTLY INCREASING timestamps
    * signup < click < purchase, all within `windowMicros` of the FIRST
    * signup — the attribution question "of the users who signed up,
    * who clicked and then bought within a week". Each stage is one
    * min-aggregate plus one equi-join against the previous stage's
    * (user, cursor) relation — no self-join explosion, cost ~ events
    * once per stage; shares close in fixed divisions over exact
    * counts. */
  def windowedFunnel(spark: SparkSession, dir: String,
      windowMicros: Long = 604800000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("t")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("t") > col("t1") && col("t") <= col("t1") + windowMicros)
      .groupBy(col("user_id"), col("t1")).agg(min(col("t")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("t") > col("t2") && col("t") <= col("t1") + windowMicros)
      .groupBy(col("user_id")).agg(min(col("t")).as("t3"))
    val n1 = s1.agg(count(lit(1)).as("n")).scalar()
    val stages = s1.agg(count(lit(1)).as("n_users"))
      .withColumn("stage", lit(1L)).withColumn("event_type", lit("signup"))
      .unionByName(s2.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(2L)).withColumn("event_type", lit("click")))
      .unionByName(s3.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(3L))
        .withColumn("event_type", lit("purchase")))
    stages
      .withColumn("share_of_entry", when(n1 > 0L,
        round(col("n_users").cast("double") / n1, 6)))
      .select(col("stage"), col("event_type"), col("n_users"),
        col("share_of_entry"))
      .orderBy(col("stage"))
  }

  /** MONTHLY GROWTH ACCOUNTING — the canonical active-user ledger: for
    * every activity month, how many users are NEW (first month ever),
    * RETAINED (also active the previous month), RESURRECTED (active
    * before, skipped last month), and CHURNED (active last month, gone
    * this month — reported at the month they went missing). The
    * decomposition product teams reconcile MAU movements with; the
    * identity n_active = n_new + n_retained + n_resurrected holds row
    * by row. Scale shape: the event log reduces ONCE to the distinct
    * (user, month-index) panel (map-side combine), first months are a
    * per-user min, and previous-month membership is a self-equi-join
    * on (user, mi−1) — panel-sized shuffles only, nothing proportional
    * to raw events after the first reduction. Month index
    * year·12+month keeps the lag arithmetic integer. */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val um = Tables.events(spark, dir)
      .select(col("user_id"),
        (year(col("ts")) * 12 + month(col("ts")) - 1).cast("long").as("mi"))
      .distinct()
      .localCheckpoint() // the panel feeds three derivations below
    val fm = um.groupBy(col("user_id")).agg(min(col("mi")).as("first_mi"))
    val prev = um.select(col("user_id"), (col("mi") + 1L).as("mi"),
      lit(1L).as("was_prev"))
    val classified = um.join(fm, Seq("user_id"))
      .join(prev, Seq("user_id", "mi"), "left")
      .withColumn("status",
        when(col("mi") === col("first_mi"), "new")
          .otherwise(when(col("was_prev").isNotNull, "retained")
            .otherwise("resurrected")))
    val active = classified.groupBy(col("mi"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    // churn at month m: active at m-1, absent at m (only for months
    // that exist in the panel — the ragged calendar edge stays out)
    val churned = prev // (user, mi) meaning "was active at mi-1"
      .join(um.select(col("user_id"), col("mi"), lit(1L).as("is_now")),
        Seq("user_id", "mi"), "left")
      .filter(col("is_now").isNull)
      .groupBy(col("mi")).agg(count(lit(1)).as("n_churned"))
    // left join from `active`: churn rows at a month past the observed
    // calendar (mi+1 off the end) drop with it
    active.join(churned, Seq("mi"), "left")
      .select(col("mi"), col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), coalesce(col("n_churned"), lit(0L))
          .as("n_churned"))
      .orderBy(col("mi"))
  }

  /** MONTHLY STICKINESS (DAU/MAU): for each month, the distinct
    * user-day count over (observed days × monthly actives) — the
    * engagement-frequency ratio ("the average active user shows up on
    * X% of days"). One distinct (user, day) reduction, folded to the
    * month panel; exact integers under one closing division. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"),
        (year(col("ts")) * 12 + month(col("ts")) - 1).cast("long").as("mi"),
        dayofmonth(col("ts")).cast("long").as("d"))
      .distinct()
    ud.groupBy(col("mi"))
      .agg(count(lit(1)).as("n_user_days"),
        countDistinct(col("user_id")).as("mau"),
        countDistinct(col("d")).as("n_days"))
      .withColumn("stickiness",
        round(col("n_user_days").cast("double") /
          (col("n_days") * col("mau")).cast("double"), 6))
      .orderBy(col("mi"))
  }

  /** POWER-USER CONCENTRATION (the Lorenz/Pareto readout per activity
    * decile): users ranked by event count into ntile(10) deciles under
    * a TOTAL order (count desc, user_id — ties broken, so the decile
    * assignment is deterministic and engine-portable), then each
    * decile's user count, event mass, value mass, and the cumulative
    * event share — "the top 10% of users generate X% of traffic", the
    * abuse/bot screen and capacity question in one table. The rank
    * window runs over the per-user AGGREGATE (panel-sized, one row per
    * user), never raw events. */
  def powerUsers(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        // half-up milli-unit rounding BEFORE the sum — the repo's
        // exact-money convention (a bare cast truncates in Spark but
        // rounds in DuckDB)
        sum(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
          .as("value_milli"))
    val w = Window.partitionBy(pmod(col("user_id"), lit(1)))
      .orderBy(col("n_ev").desc, col("user_id"))
    val total = perUser.agg(sum(col("n_ev")).as("t")).scalar()
    val wCum = Window.partitionBy(pmod(col("decile"), lit(1)))
      .orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perUser.withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_ev")).as("n_events"),
        sum(col("value_milli")).as("value_milli"))
      .withColumn("event_share",
        round(col("n_events").cast("double") / total, 6))
      .withColumn("cum_event_share",
        round(sum(col("n_events")).over(wCum).cast("double") / total, 6))
      .orderBy(col("decile"))
  }

  /** HOUR-OF-DAY UNIFORMITY PROFILE per event type: the dense 24-cell
    * hour histogram with each cell's χ² contribution against the
    * uniform 1/24 expectation — the diurnal-seasonality screen (a bot
    * or batch-replay source reads as a few spiked hours; organic
    * traffic as a smooth curve). Zeros materialized from the broadcast
    * 24-row hour dimension (the t-closeness grid class); the per-cell
    * gap 24·o − T forms in DECIMAL(38,0) (exact at any event count —
    * the `Quality.chiCells` discipline) and the contribution closes in
    * a fixed correctly-rounded double tree, no cross-cell float
    * summation. One map-side-combined aggregate over the fact table;
    * everything after is bounded by |event types| × 24. */
  def hourProfile(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(spark, dir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("o"))
    val hours = spark.range(0, 24).select(col("id").as("hr"))
    val tot = obs.groupBy(col("event_type")).agg(sum(col("o")).as("t_total"))
    tot.crossJoin(broadcast(hours))
      .join(obs, Seq("event_type", "hr"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("gap",
        col("o").cast("decimal(38,0)") * 24 - col("t_total"))
      .withColumn("contrib",
        round((col("gap").cast("double") * col("gap").cast("double")) /
          (lit(24.0) * col("t_total").cast("double")), 6))
      .select(col("event_type"), col("hr"), col("o"), col("t_total"),
        col("contrib"))
      .orderBy(col("event_type"), col("hr"))
  }

  /** COHORT LTV CURVES: customers cohorted by first-order month, then
    * per (cohort, month-offset) — active customers, orders, revenue,
    * the cohort's cumulative revenue, and cumulative revenue per
    * cohort member (the lifetime-value readout marketing reconciles
    * acquisition spend against). Revenue is half-up MILLI-UNIT BIGINT
    * before any sum (the repo's money discipline — float addition
    * order can never split engines), and the per-member LTV stays a
    * BIGINT floor division — at 1e9-milli magnitudes a round(·, 6)
    * double is not representable and engines ulp-split on the closing
    * digit. Scale shape: orders reduce once to per-customer
    * first months, then once to (cohort, offset) cells; the cumulative
    * window runs over the CELL relation partitioned by cohort (≤ months
    * rows per partition, never raw orders). */
  def ltvCohort(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"),
        expr("CAST(floor(o_totalprice * 1000 + 0.5) AS BIGINT)")
          .as("milli"))
    val first = o.groupBy(col("cust")).agg(min(col("mi")).as("cohort_mi"))
    val cohortSize = first.groupBy(col("cohort_mi"))
      .agg(count(lit(1)).as("cohort_users"))
    val cells = o.join(first, Seq("cust"))
      .withColumn("offset", col("mi") - col("cohort_mi"))
      .groupBy(col("cohort_mi"), col("offset"))
      .agg(countDistinct(col("cust")).as("active_users"),
        count(lit(1)).as("n_orders"), sum(col("milli")).as("revenue_milli"))
    val w = Window.partitionBy(col("cohort_mi")).orderBy(col("offset"))
    cells
      .withColumn("cum_revenue_milli", sum(col("revenue_milli")).over(w))
      .join(broadcast(cohortSize), Seq("cohort_mi"))
      .withColumn("ltv_per_user_milli",
        expr("cum_revenue_milli div cohort_users"))
      .select(col("cohort_mi"), col("offset"), col("cohort_users"),
        col("active_users"), col("n_orders"), col("revenue_milli"),
        col("cum_revenue_milli"), col("ltv_per_user_milli"))
      .orderBy(col("cohort_mi"), col("offset"))
  }

  /** FIRST/LAST-TOUCH CONVERSION ATTRIBUTION: every purchase credits
    * the user's earliest non-purchase event inside the 7-day lookback
    * (first touch) and the latest one before conversion (last touch);
    * purchases with no prior touch land in the "(none)" ledger row, so
    * BOTH credit columns sum to the total purchase count — the
    * closed-ledger property marketing attribution must satisfy.
    * Candidates come from a user-keyed range join (purchase × prior
    * events within the window — bounded by per-user activity in 7
    * days, the range-join shape q_range_join established); the
    * argmin/argmax per purchase is a row_number under the (ts,
    * event_id) TOTAL order, cross-engine identical. */
  def attribution(spark: SparkSession, dir: String,
      lookbackDays: Int = 7): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("s")) // epoch microseconds
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("s").as("p_s"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("channel"), col("s").as("t_s"))
    val cand = purchases.join(touches, Seq("user_id"))
      .filter(col("t_s") < col("p_s") &&
        col("t_s") >= col("p_s") - lit(lookbackDays * 86400000000L))
    val wF = Window.partitionBy(col("p_id"))
      .orderBy(col("t_s"), col("t_id"))
    val wL = Window.partitionBy(col("p_id"))
      .orderBy(col("t_s").desc, col("t_id").desc)
    val picked = cand
      .withColumn("rf", row_number().over(wF))
      .withColumn("rl", row_number().over(wL))
      .filter(col("rf") === 1 || col("rl") === 1)
      .localCheckpoint() // first- and last-credit reads share this
    val first = picked.filter(col("rf") === 1)
      .groupBy(col("channel")).agg(count(lit(1)).as("first_touch"))
    val last = picked.filter(col("rl") === 1)
      .groupBy(col("channel")).agg(count(lit(1)).as("last_touch"))
    val total = purchases.agg(count(lit(1)).as("n")).scalar()
    val touched = picked.filter(col("rf") === 1)
      .agg(count(lit(1)).as("n")).scalar()
    val untouched = noneRow(spark)
      .withColumn("first_touch", total - touched)
      .withColumn("last_touch", total - touched)
    first.join(last, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"))
      .unionByName(untouched)
      .orderBy(col("channel"))
  }

  // toDF on a 1-row literal needs the session's implicits in scope
  private def noneRow(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("(none)").toDF("channel")
  }

  /** REPEAT-PURCHASE LATENCY per market segment: day gaps between a
    * customer's consecutive orders, summarized as count / min / max /
    * EXACT MEDIAN / mean. The median is rank-exact but never sorts a
    * segment's raw gaps in one partition: the cumulative window runs
    * over the per-(segment, gap-value) DISTINCT-VALUE relation (gap
    * values are bounded by the calendar, so this is tiny) and the
    * median is the first value whose cumulative count reaches
    * ⌈n/2⌉ — the q_quality_tiers construction. The per-customer lag
    * window follows the documented keyed-window contract (a customer's
    * orders, not a segment's). Ties in order dates are broken by order
    * key; the GAP MULTISET is invariant to tie order, so the summary
    * is total-order stable. */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("gap",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long"))
      .filter(col("gap").isNotNull)
      .join(Tables.customer(spark, dir)
          .select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("segment")),
        Seq("o_custkey"))
      .select(col("segment"), col("gap"))
    val tot = gaps.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_gaps"), min(col("gap")).as("min_gap"),
        max(col("gap")).as("max_gap"), sum(col("gap")).as("gap_sum"))
    val counts = gaps.groupBy(col("segment"), col("gap"))
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("segment")).orderBy(col("gap"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = counts.withColumn("cum", sum(col("c")).over(wc))
      .join(broadcast(tot.select(col("segment"), col("n_gaps"))),
        Seq("segment"))
      .filter(col("cum") >= expr("(n_gaps + 1) div 2")) // integer div
      .groupBy(col("segment")).agg(min(col("gap")).as("median_gap"))
    tot.join(med, Seq("segment"))
      .select(col("segment"), col("n_gaps"), col("min_gap"),
        col("max_gap"), col("median_gap"),
        round(col("gap_sum").cast("double") / col("n_gaps"), 6)
          .as("avg_gap"))
      .orderBy(col("segment"))
  }
}
