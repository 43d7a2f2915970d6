package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Time-series operators over the `events` table (SURVEY §2b 21-24).
  *
  * The as-of join is the union+window composition: tag both sides, union,
  * and carry the last non-null right-side value forward within each key
  * partition. One shuffle on the key, no range explosion — this is the
  * shape that survives 100 TB (a sort-merge over (key, time) vs. the
  * naive inequality join's quadratic blowup).
  */
object Temporal {

  /** As-of join: for each `purchase` event, the most recent prior-or-equal
    * `view` event of the same user. Union + last(ignoreNulls) window —
    * equivalent to DuckDB's ASOF LEFT JOIN. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"),
        lit(null).cast("long").as("view_event_id"),
        lit(null).cast("timestamp").as("view_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
        lit(1).as("side"), col("event_id").as("view_event_id"),
        col("ts").as("view_ts"))
    // At equal ts the view sorts first (side desc) so ">= view_ts" matches.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(views)
      .select(col("user_id"), col("ts"), col("event_id"), col("side"),
        last(col("view_event_id"), ignoreNulls = true).over(w).as("last_view_id"),
        last(col("view_ts"), ignoreNulls = true).over(w).as("last_view_ts"))
      .filter(col("side") === 0)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_view_id"), col("last_view_ts"))
      .orderBy(col("event_id"))
  }

  /** The same as-of semantics through the custom Catalyst operator
    * (graft.plans.AsOfJoin): one shuffle + sort per side, streaming
    * merge. Verified against the same DuckDB ASOF oracle. */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("last_view_id"),
        col("ts").as("last_view_ts"))
    graft.plans.AsOfJoin.join(purchases, views,
        "user_id", "v_user", "ts", "last_view_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_view_id"), col("last_view_ts"))
      .orderBy(col("event_id"))
  }

  /** Range join: purchases joined to error events of the same user within
    * the following hour. Equi key (user_id) keeps the shuffle bounded;
    * the range predicate filters within each key partition. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    p.join(e, col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") &&
        col("e_ts") < col("p_ts") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("p_id"), col("p_user"), col("p_ts"))
      .agg(count(col("e_ts")).as("n_errors_1h"))
      .orderBy(col("p_id"))
  }

  /** Interval-overlap join WITHOUT an equi key, made scale-safe by
    * bucketization. The naive plan for `a.start < b.end AND a.end >=
    * b.start` is a nested-loop join — O(|a|·|b|) and the classic 100 TB
    * killer for interval workloads. Instead each session interval is
    * EXPLODED into the hour buckets it covers and joined to the
    * (one-bucket-wide) incident windows on bucket equality — a plain
    * hash/sort-merge equi-join whose cost is candidate volume, not the
    * cross product. Because each incident window is exactly one bucket
    * wide, bucket membership IS the overlap predicate (trunc(start) <=
    * h <= trunc(end) ⇔ [start,end] ∩ [h,h+1h) nonempty) — no residual
    * filter, no dedup. Explode factor = interval span / bucket width,
    * bounded by session length.
    *
    * Incident windows are hours whose error count exceeds 1.5× the mean
    * hourly error count — a RELATIVE threshold, so selectivity holds at
    * any scale factor. The threshold is a 1-row broadcast. */
  def intervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val errHours = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .groupBy(date_trunc("hour", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n_errors"))
    // the relative threshold rides as a scalar subquery (one tiny
    // subquery stage), not a 1-row broadcast join — keeps the main plan
    // free of nested-loop operators
    val thresh = errHours.agg((avg(col("n_errors")) * 1.5).as("thresh")).scalar()
    val incidents = errHours.filter(col("n_errors") > thresh)
      .select(col("w_start"), col("n_errors"))
    val covered = sessionize(spark, dir)
      .select(col("user_id"), col("session_id"),
        explode(sequence(date_trunc("hour", col("sess_start")),
          date_trunc("hour", col("sess_end")),
          expr("INTERVAL 1 HOUR"))).as("bucket"))
    covered.join(incidents, col("bucket") === col("w_start"))
      .groupBy(col("w_start"), col("n_errors"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("w_start"))
  }

  /** Gap-based sessionization: a >30-minute silence starts a new session.
    * lag + cumulative-sum window; one shuffle on user_id. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"),
        round(sum(col("value")), 2).as("sess_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** INTERVAL COALESCING (gaps-and-islands): every event opens a
    * 15-minute half-open activity window [ts, ts+15m); overlapping or
    * touching windows per user merge into maximal islands, and the
    * query reports the per-user island rollup — island count, exact
    * covered microseconds, and the busiest island's event count. The
    * canonical lakehouse normalization for any interval-valued fact
    * (leases, locks, sessions with explicit spans) where double-counted
    * overlap corrupts downstream sums. All in integer epoch micros:
    * island boundary = start strictly greater than the running max of
    * prior ends (cummax window), island id = running sum of boundary
    * flags — one shuffle on user_id, two window passes over it, no
    * joins, order-independent integers throughout. */
  def intervalCoalesce(spark: SparkSession, dir: String,
      spanMicros: Long = 900000000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("event_id"))
    val prior = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + spanMicros)
      .withColumn("max_prev_e", max(col("e")).over(prior))
      .withColumn("new_island",
        when(col("max_prev_e").isNull || col("s") > col("max_prev_e"), 1L)
          .otherwise(0L))
      .withColumn("island_id", sum(col("new_island")).over(cum))
      .groupBy(col("user_id"), col("island_id"))
      .agg(min(col("s")).as("i_start"), max(col("e")).as("i_end"),
        count(lit(1)).as("n_ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered_micros"),
        max(col("n_ev")).as("max_island_events"))
      .orderBy(col("user_id"))
  }

  /** PEAK CONCURRENCY per event type (sweep line over the same 15-min
    * half-open activity windows as [[intervalCoalesce]]): the maximum
    * number of simultaneously open windows and the earliest instant it
    * is attained — the capacity-planning readout interval data exists
    * for. Scale-safe two-level prefix sum: endpoint deltas (+1 start /
    * −1 end, ends before starts at equal instants — half-open) fold to
    * a BOUNDED (type × hour-bucket) panel whose exclusive running sum
    * gives each bucket's entry concurrency, then the exact within-
    * bucket running sum runs in a (type, bucket) window — partitions
    * are hour-sized at any corpus scale, never one-partition-per-type
    * (the single global sweep the naive formulation needs, and which
    * the DuckDB oracle is allowed to use). Prefix trajectories are
    * permutation-invariant within equal (t, d) groups, so the peak and
    * its argmin instant are deterministic integers. */
  def peakConcurrency(spark: SparkSession, dir: String,
      spanMicros: Long = 900000000L): DataFrame = {
    val hourMicros = 3600000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("s"))
    val endpoints = ev
      .select(col("event_type"), col("s").as("t"), lit(1L).as("d"))
      .unionAll(ev.select(col("event_type"),
        (col("s") + spanMicros).as("t"), lit(-1L).as("d")))
      .withColumn("bucket", expr(s"t div ${hourMicros}L"))
    val wB = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = endpoints.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("d")).as("net"))
      .withColumn("offset", coalesce(sum(col("net")).over(wB), lit(0L)))
      .select(col("event_type"), col("bucket"), col("offset"))
    val wT = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val conc = endpoints.join(offsets, Seq("event_type", "bucket"))
      .withColumn("conc", col("offset") + sum(col("d")).over(wT))
      .localCheckpoint()
    val peaks = conc.groupBy(col("event_type"))
      .agg(max(col("conc")).as("peak"))
    val nEv = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    conc.join(broadcast(peaks), Seq("event_type"))
      .filter(col("conc") === col("peak"))
      .groupBy(col("event_type"), col("peak"))
      .agg(min(col("t")).as("peak_at"))
      .join(broadcast(nEv), Seq("event_type"))
      .select(col("event_type"), col("n_events"), col("peak"),
        col("peak_at"))
      .orderBy(col("event_type"))
  }

  /** Top SESSION PATHS — the "what do users actually do" readout over
    * [[sessionize]]'s 30-minute-gap sessions: each session becomes its
    * ordered event-type sequence (truncated at 8 steps, so the path
    * string is bounded regardless of session length), and the query
    * reports the most common paths. Per-session event lists are
    * bounded by the sessionization contract; the final count is
    * path-keyed and `TakeOrderedAndProject`-cut. */
  def sessionPaths(spark: SparkSession, dir: String,
      maxSteps: Int = 8, topN: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(
        transform(
          slice(array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type").as("etype")))), 1, maxSteps),
          e => e.getField("etype")),
        " > ").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }

  /** Tumbling time-bucket aggregate — the batch twin of the streaming
    * windowed agg (graft.streaming). */
  def timeBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("bucket"), col("event_type"))

  /** SCD2 history build: the event log per user becomes validity
    * intervals — each status row carries [valid_from, valid_to) with
    * valid_to = the next change's timestamp (null while current). The
    * slowly-changing-dimension type-2 construction every warehouse
    * needs, as one keyed lead() window — single shuffle on the entity
    * key, scales with key cardinality. Consecutive duplicate statuses
    * are collapsed first (a lag filter keeps only change rows), so
    * intervals describe CHANGES, not raw events. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val byUser2 = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    changes
      .select(col("user_id"), col("event_type").as("status"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(byUser2).as("valid_to"),
        (lead(col("ts"), 1).over(byUser2).isNull).as("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** CDC snapshot diff: given two snapshots of a keyed table, emit the
    * change set — inserted / deleted / updated keys with old and new
    * values. Full outer join on the key + null-safe value compare: one
    * shuffle per side (or zero when both snapshots are bucketed on the
    * key), output is delta-sized. Snapshots here are the user-status
    * table as-of two cut points in the event log. */
  def cdcDiff(spark: SparkSession, dir: String): DataFrame = {
    def statusAsOf(cut: org.apache.spark.sql.Column): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, dir)
        .filter(col("ts") <= cut)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"))
    }
    val before = statusAsOf(lit("2024-01-15 00:00:00").cast("timestamp"))
      .select(col("user_id"), col("event_type").as("old_status"))
    val after = statusAsOf(lit("2024-02-01 00:00:00").cast("timestamp"))
      .select(col("user_id"), col("event_type").as("new_status"))
    before.join(after, Seq("user_id"), "full_outer")
      .withColumn("change_type",
        when(col("old_status").isNull, "insert")
          .when(col("new_status").isNull, "delete")
          .otherwise("update"))
      .filter(!(col("old_status") <=> col("new_status")))
      .orderBy(col("user_id"))
  }

  /** JSON property extraction (semi-structured parse — the engine twin of
    * the reference's metadata.json path, metadata.py:41). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
      .groupBy(col("prop_k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prop_k"))

  /** Time-series gap fill: forward-fill AND linear interpolation of a
    * sparse per-key series, the resample/imputation step every
    * training-data feature pipeline needs before model-ready export.
    * The series is the per-customer order-value sequence with a
    * deterministic 25% mask (o_orderkey % 4 == 0 → null) so both
    * engines reconstruct the identical gaps. Both fills are keyed
    * window functions — ONE shuffle on the series key, frames never
    * leave the key partition, so cost scales with series length ×
    * key cardinality exactly like `sessionize`. Forward fill is
    * last(ignoreNulls) over the trailing frame; interpolation brackets
    * each gap with (last prior, first following) observations and their
    * epoch-second x-coordinates — pure scalar IEEE arithmetic after the
    * windows, and the 4-decimal interpolated output is produced by
    * EXACT INTEGER arithmetic — cents × day fractions, round-half-up
    * folded into one BIGINT division — because interpolating
    * 2-decimal prices at rational day fractions lands on .00005
    * midpoints ROUTINELY, and engines disagree on double-rounding
    * midpoints (measured: 6 of 150k rows flipped at sf0.1 before the
    * integer form; the q10 lesson extended from sums to rounding).
    * Leading/trailing gaps degrade to back/forward fill; all-null keys
    * stay null — both cases are part of the oracle contract. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val back = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = byCust.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val masked = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderkey") % 4 =!= 0, col("o_totalprice")).as("v"),
        when(col("o_orderkey") % 4 =!= 0,
          round(col("o_totalprice") * 100).cast("long")).as("vc"),
        datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
          .cast("long").as("x"))
    masked
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pc", last(col("vc"), ignoreNulls = true).over(back))
      .withColumn("px",
        last(when(col("v").isNotNull, col("x")), ignoreNulls = true).over(back))
      .withColumn("nc", first(col("vc"), ignoreNulls = true).over(fwd))
      .withColumn("nx",
        first(when(col("v").isNotNull, col("x")), ignoreNulls = true).over(fwd))
      // t = interp in 1e-4 dollars, rounded half-up exactly:
      // floor((200·pc·q + 200·(nc−pc)·p + q) / 2q), p = x−px, q = nx−px
      .withColumn("t",
        when(col("px").isNull, col("nc") * 100L)
          .when(col("nx").isNull, col("pc") * 100L)
          .when(col("nx") === col("px"), col("pc") * 100L)
          .otherwise(expr(
            "(200L * pc * (nx - px) + 200L * (nc - pc) * (x - px) + " +
              "(nx - px)) DIV (2L * (nx - px))")))
      .select(col("o_custkey"), col("o_orderkey"),
        col("v").as("observed"),
        col("pv").as("ffill"),
        (col("t").cast("double") / 10000.0).as("interp"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Sliding-window distinct users (rolling 7-day actives) — the
    * aggregate Spark's window functions cannot express natively
    * (COUNT(DISTINCT) OVER a moving frame is unsupported), filled with
    * the scatter-to-window-ends pattern: reduce the log to the
    * per-(user, day) DISTINCT frame first, then explode each row onto
    * the `windowDays` window-end days it serves and count distinct per
    * end day.
    *
    * Scale shape: the expansion factor is exactly `windowDays`, and it
    * applies to the per-day distinct frame (bounded by users × active
    * days), NOT the raw event log — the usual self-join/range-join
    * formulation shuffles the log against a day spine instead and
    * re-scans it per window. One distinct, one explode, one
    * map-side-combined distinct count. Window ends past the observed
    * range are clamped by the broadcast 1-row max-day frame (partial
    * leading windows are part of the semantics: day 1 of a corpus has
    * a 1-day window). */
  def slidingDistinct(spark: SparkSession, dir: String,
      windowDays: Int = 7): DataFrame = {
    val userDays = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val refDf = userDays.agg(max(col("day")).as("max_day"))
    userDays
      .select(col("user_id"), explode(expr(
        s"sequence(day, day + interval ${windowDays - 1} days, " +
          "interval 1 day)")).as("w_end"))
      .crossJoin(broadcast(refDf))
      .filter(col("w_end") <= col("max_day"))
      .groupBy(col("w_end"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("w_end"))
  }
}
