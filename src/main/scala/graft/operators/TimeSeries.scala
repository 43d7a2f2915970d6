package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Time-series audit operators over the daily order panel: lag-k
  * autocorrelation and CUSUM change-point detection. Both reduce the
  * raw fact table to a DAY-GRAIN series first (one map-side-combined
  * aggregation — the only pass over the big table), then run their
  * statistics on the bounded day panel (a few thousand rows at any
  * corpus size — the calendar, not the data, bounds it), the same
  * bounded-dimension treatment as `Privacy.tClosenessOn`'s band grid.
  * All moment arithmetic is INTEGER-EXACT (counts and their products
  * stay in BIGINT); the only IEEE ops are the closing correctly-rounded
  * √ and ÷ in a fixed expression tree, so results are bit-stable across
  * engines — the same discipline as `q_trend_slope` / `q_burst_days`.
  */
object TimeSeries {

  /** Dense zero-filled daily order-count series: day spine from the
    * 1-row (min, max) scalar via `sequence`, left-joined counts.
    * Missing days MUST exist as zeros — both the autocorrelation's lag
    * alignment and CUSUM's cumulative time axis are wrong on a sparse
    * series. */
  private def dailySeries(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(
        sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("x"))
  }

  /** Lag-k autocorrelation (k = 1..maxLag) of the daily order-count
    * series — the seasonality screen (a weekly cycle surfaces as a
    * lag-7 peak). Pairs (x_t, x_{t+k}) come from an equi-join of the
    * day panel against itself shifted by the exploded lag dimension
    * (a maxLag-row broadcast); Pearson r is assembled from BIGINT
    * moment sums with the closing √·√ then ÷ as the only IEEE ops.
    * Degenerate variance (constant series, < 2 pairs) reports NULL
    * instead of dividing by zero. */
  def autocorr(spark: SparkSession, dir: String, maxLag: Int = 7)
      : DataFrame =
    autocorrOn(Tables.orders(spark, dir), maxLag)

  /** Core of [[autocorr]] over any frame with `o_orderdate` — split out
    * so specs can drive crafted series (constant ⇒ NULL, period-k
    * alternation ⇒ lag-k r = 1) through it. */
  def autocorrOn(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    val series = dailySeries(orders)
    val lags = series.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag"))
    val shifted = series
      .select(col("day").as("lday"), col("x").as("y"))
    series.crossJoin(broadcast(lags))
      .withColumn("lday",
        expr("timestampadd(DAY, CAST(lag AS INT), day)"))
      .join(shifted, Seq("lday"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("vx", col("n_pairs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n_pairs") * col("syy") - col("sy") * col("sy"))
      .withColumn("corr",
        when(col("vx") > 0L && col("vy") > 0L,
          round((col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (sqrt(col("vx").cast("double")) * sqrt(col("vy").cast("double"))),
            6)))
      .select(col("lag"), col("n_pairs"), col("corr"))
      .orderBy(col("lag"))
  }

  /** EWMA smoothing of the daily order-count series with the one
    * EXACT decay: α = 1/2 over a 32-day trailing window, so every
    * weight is a power of two and the whole smoother is INTEGER
    * arithmetic — num = Σ_k x_{t−k}·2^{31−k}, den = Σ_k 2^{31−k} over
    * the days present — with ONE correctly-rounded closing division.
    * No running float state, no summation-order sensitivity (the sums
    * are BIGINT), and the truncated tail is below 2⁻³² of the mass —
    * the same "pick the dyadic operating point" discipline as the
    * α = ½ temperature mix. Day panel is calendar-bounded; the 32-row
    * lag dimension broadcasts; one equi-join on the shifted day. */
  def ewma(spark: SparkSession, dir: String, window: Int = 32)
      : DataFrame =
    ewmaOn(Tables.orders(spark, dir), window)

  /** Core of [[ewma]] over any frame with `o_orderdate` — split out so
    * specs can drive crafted series (constant ⇒ ewma = x; unit impulse
    * ⇒ halving readout) through it. */
  def ewmaOn(orders: DataFrame, window: Int = 32): DataFrame = {
    require(window >= 1 && window <= 62, "dyadic weights need 2^w in BIGINT")
    val series = dailySeries(orders)
    val lags = series.sparkSession.range(0, window)
      .select(col("id").as("lag"))
    val src = series.select(col("day").as("srcday"), col("x").as("y"))
    series.crossJoin(broadcast(lags))
      .withColumn("srcday",
        expr(s"timestampadd(DAY, CAST(-lag AS INT), day)"))
      .join(src, Seq("srcday"))
      .withColumn("w", expr(
        s"shiftleft(CAST(1 AS BIGINT), CAST(${window - 1} - lag AS INT))"))
      .groupBy(col("day"), col("x"))
      .agg(sum(col("y") * col("w")).as("ewma_num"),
        sum(col("w")).as("ewma_den"))
      .withColumn("ewma",
        round(col("ewma_num").cast("double") / col("ewma_den"), 6))
      .orderBy(col("day"))
  }

  /** CUSUM change-point screen over the daily order-count series: the
    * day that maximizes |T·C_t − t·S| (the cumulative-sum deviation
    * from the global mean, CLEARED of its 1/T denominator so the
    * statistic is an exact BIGINT — float cumulative means would
    * ulp-wobble the argmax on near-ties). Top-K days by (d_stat DESC,
    * day) — a total order — with the normalized statistic
    * d_stat / (T·S) as the only IEEE op. The cumulative window runs on
    * the bounded day panel behind a non-foldable constant partition
    * key. */
  def cusumChangepoint(spark: SparkSession, dir: String, topK: Int = 5)
      : DataFrame =
    cusumChangepointOn(Tables.orders(spark, dir), topK)

  /** Core of [[cusumChangepoint]] over any frame with `o_orderdate` —
    * split out so specs can drive a crafted step series (changepoint
    * must land on the step boundary) through it. */
  def cusumChangepointOn(orders: DataFrame, topK: Int = 5): DataFrame = {
    def oneGroup = pmod(dayofmonth(col("day")), lit(1))
    val wCum = Window.partitionBy(oneGroup).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(oneGroup)
    dailySeries(orders)
      .withColumn("t", count(lit(1)).over(wCum))
      .withColumn("cum_n", sum(col("x")).over(wCum))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total_n", sum(col("x")).over(wAll))
      .withColumn("d_stat",
        abs(col("n_days") * col("cum_n") - col("t") * col("total_n")))
      .withColumn("d_norm",
        when(col("n_days") * col("total_n") > 0L,
          round(col("d_stat").cast("double") /
            (col("n_days") * col("total_n")).cast("double"), 6)))
      .select(col("day"), col("t"), col("cum_n"), col("d_stat"),
        col("d_norm"))
      .orderBy(col("d_stat").desc, col("day"))
      .limit(topK)
  }

  /** All-pairs (earlier day, later day) frame over the dense daily
    * series — the O(days²) kernel Theil–Sen and Mann–Kendall share.
    * Quadratic ONLY in the calendar-bounded day panel (2400 days ⇒
    * ~2.9M pairs at ANY corpus size — the fact-table scan stays the
    * one data-sized pass), so the pair mass is a constant of the date
    * span, not the data. */
  private def dayPairs(orders: DataFrame): DataFrame = {
    val ser = dailySeries(orders)
    ser.select(col("day").as("da"), col("x").as("ya"))
      .join(ser.select(col("day").as("db"), col("x").as("yb")),
        col("da") < col("db"))
  }

  /** Theil–Sen robust slope of the daily order-count series: the
    * median of all pairwise slopes (insensitive to up to ~29% outlier
    * days, unlike `q_trend_slope`'s OLS). Each slope is one correctly
    * rounded division of exact integers; the median of an identical
    * double multiset is engine-deterministic (integer-midpoint
    * interpolation is exact in binary). */
  def theilSen(spark: SparkSession, dir: String): DataFrame =
    theilSenOn(Tables.orders(spark, dir))

  /** Core of [[theilSen]] over any frame with `o_orderdate`. */
  def theilSenOn(orders: DataFrame): DataFrame = {
    val nDays = dailySeries(orders).agg(count(lit(1)).as("n_days"))
    dayPairs(orders)
      .select(((col("yb") - col("ya")).cast("double") /
        datediff(col("db"), col("da")).cast("double")).as("slope"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 6).as("theil_sen_slope"))
      .crossJoin(broadcast(nDays))
      .select(col("n_days"), col("n_pairs"), col("theil_sen_slope"))
  }

  /** Mann–Kendall trend test on the daily order-count series — the
    * nonparametric companion of [[theilSen]]: S = Σ_{i<j} sign(x_j −
    * x_i), tie-corrected variance 18·Var(S) = n(n−1)(2n+5) −
    * Σ_k t_k(t_k−1)(2t_k+5) kept as an exact BIGINT numerator, and the
    * continuity-corrected z = (S ∓ 1)/√(num/18) as the only IEEE tail.
    * All three inputs are 1-row reductions of the bounded day panel. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendallOn(Tables.orders(spark, dir))

  /** Core of [[mannKendall]] over any frame with `o_orderdate`. */
  def mannKendallOn(orders: DataFrame): DataFrame = {
    val ser = dailySeries(orders)
    val s = dayPairs(orders)
      .agg(sum(when(col("yb") > col("ya"), 1L)
        .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s"))
    val ties = ser.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1L) *
        (lit(2L) * col("t") + 5L)), lit(0L)).as("tie_term"))
    ser.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .withColumn("var18_num",
        col("n_days") * (col("n_days") - 1L) *
          (lit(2L) * col("n_days") + 5L) - col("tie_term"))
      .withColumn("z",
        when(col("var18_num") > 0L && col("s").isNotNull,
          round(
            when(col("s") > 0L, (col("s") - 1L).cast("double"))
              .when(col("s") < 0L, (col("s") + 1L).cast("double"))
              .otherwise(lit(0.0)) /
              sqrt(col("var18_num").cast("double") / 18.0), 6)))
      .select(col("n_days"), col("s"), col("var18_num"), col("z"))
  }

  /** Two-regressor OLS (intercept + linear day trend + weekend flag)
    * of daily revenue in cents: the closed-form normal-equation solve
    * by Cramer's rule. All nine moments are EXACT BIGINT sums over the
    * dense day panel (headroom: Σt·cents < 2^63 holds to ~10^12 cents
    * per day on a 2400-day span; past that promote to decimal); the
    * 3×3 determinants then run in a FIXED double tree over those exact
    * operands — deterministic across engines because every engine sees
    * the same BIGINT inputs and the same expression shape. Degenerate
    * design (det 0, n < 3) reports NULL. */
  def olsDailyRevenue(spark: SparkSession, dir: String): DataFrame =
    olsDailyRevenueOn(Tables.orders(spark, dir))

  /** Core of [[olsDailyRevenue]] over any frame with (o_orderdate,
    * o_totalprice). */
  def olsDailyRevenueOn(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("d0"),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
    val xy = spine.join(daily, Seq("day"), "left")
      .select(datediff(col("day"), col("d0")).cast("long").as("x1"),
        when(dayofweek(col("day")).isin(1, 7), 1L).otherwise(0L).as("x2"),
        coalesce(col("cents"), lit(0L)).as("y"))
    val m = xy.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2")).as("s22"), // x2 is 0/1 ⇒ Σx2² = Σx2
      sum(col("y")).as("sy"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"))
    def d(c: Column) = c.cast("double")
    val det =
      d(col("n")) * (d(col("s11")) * d(col("s22")) - d(col("s12")) * d(col("s12"))) -
      d(col("s1")) * (d(col("s1")) * d(col("s22")) - d(col("s12")) * d(col("s2"))) +
      d(col("s2")) * (d(col("s1")) * d(col("s12")) - d(col("s11")) * d(col("s2")))
    val num0 =
      d(col("sy")) * (d(col("s11")) * d(col("s22")) - d(col("s12")) * d(col("s12"))) -
      d(col("s1")) * (d(col("s1y")) * d(col("s22")) - d(col("s12")) * d(col("s2y"))) +
      d(col("s2")) * (d(col("s1y")) * d(col("s12")) - d(col("s11")) * d(col("s2y")))
    val num1 =
      d(col("n")) * (d(col("s1y")) * d(col("s22")) - d(col("s2y")) * d(col("s12"))) -
      d(col("sy")) * (d(col("s1")) * d(col("s22")) - d(col("s12")) * d(col("s2"))) +
      d(col("s2")) * (d(col("s1")) * d(col("s2y")) - d(col("s1y")) * d(col("s2")))
    val num2 =
      d(col("n")) * (d(col("s11")) * d(col("s2y")) - d(col("s12")) * d(col("s1y"))) -
      d(col("s1")) * (d(col("s1")) * d(col("s2y")) - d(col("s1y")) * d(col("s2"))) +
      d(col("sy")) * (d(col("s1")) * d(col("s12")) - d(col("s11")) * d(col("s2")))
    m.withColumn("det", det)
      .select(col("n").as("n_days"),
        when(col("n") >= 3L && col("det") =!= 0.0,
          round(num0 / col("det"), 6)).as("beta0"),
        when(col("n") >= 3L && col("det") =!= 0.0,
          round(num1 / col("det"), 6)).as("beta1_per_day"),
        when(col("n") >= 3L && col("det") =!= 0.0,
          round(num2 / col("det"), 6)).as("beta2_weekend"))
  }

  /** Additive seasonal decomposition, day-of-week component: detrend
    * the daily order-count series with a centered 7-day moving average
    * and average the detrended values per weekday — the classic
    * X-11-style seasonal index, kept INTEGER-EXACT by clearing the /7:
    * d7_t = 7·x_t − Σ_{|i−t|≤3} x_i is a BIGINT, the weekday mean's
    * numerator Σ d7_t is a BIGINT, and the single closing division by
    * 7·n_w is the only IEEE op. Interior days only (full 7-day window)
    * — a partial-window mean would bias the edges. One window pass +
    * one 7-row aggregate over the bounded day panel. */
  def seasonalDecomp(spark: SparkSession, dir: String): DataFrame =
    seasonalDecompOn(Tables.orders(spark, dir))

  /** Core of [[seasonalDecomp]] over any frame with `o_orderdate`. */
  def seasonalDecompOn(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def oneGroup = pmod(dayofmonth(col("day")), lit(1))
    val w7 = Window.partitionBy(oneGroup).orderBy(col("day"))
      .rowsBetween(-3, 3)
    dailySeries(orders)
      .withColumn("win_sum", sum(col("x")).over(w7))
      .withColumn("win_n", count(lit(1)).over(w7))
      .filter(col("win_n") === 7)
      .withColumn("d7", lit(7L) * col("x") - col("win_sum"))
      .groupBy(dayofweek(col("day")).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("d7")).as("s7_num"))
      .withColumn("seasonal",
        round(col("s7_num").cast("double") /
          (lit(7L) * col("n_days")).cast("double"), 6))
      .orderBy(col("dow"))
  }

  /** Wald–Wolfowitz runs test for randomness of the daily order-count
    * series around its median: days strictly above vs strictly below
    * the exact median (median-equal days dropped — the median of an
    * integer series is integer or integer+½ in exact binary, so the
    * classification is engine-deterministic), R = number of sign runs
    * in day order, z from the closed form on (n1, n2, R) as the only
    * IEEE tail. Too few runs ⇒ trending/clustered; too many ⇒
    * oscillating. */
  def runsTest(spark: SparkSession, dir: String): DataFrame =
    runsTestOn(Tables.orders(spark, dir))

  /** Core of [[runsTest]] over any frame with `o_orderdate`. */
  def runsTestOn(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ser = dailySeries(orders)
    val med = ser.agg(expr("percentile(x, 0.5)").as("med"))
    def oneGroup = pmod(dayofmonth(col("day")), lit(1))
    val wLag = Window.partitionBy(oneGroup).orderBy(col("day"))
    val signs = ser.crossJoin(broadcast(med))
      .filter(col("x").cast("double") =!= col("med"))
      .withColumn("above", (col("x").cast("double") > col("med")).cast("int"))
      .withColumn("flip",
        when(lag(col("above"), 1).over(wLag).isNull, 1)
          .when(lag(col("above"), 1).over(wLag) =!= col("above"), 1)
          .otherwise(0))
    signs
      .agg(sum(when(col("above") === 1, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("above") === 0, 1L).otherwise(0L)).as("n_below"),
        coalesce(sum(col("flip")).cast("long"), lit(0L)).as("runs"))
      .withColumn("z", {
        val n1 = col("n_above").cast("double")
        val n2 = col("n_below").cast("double")
        val r = col("runs").cast("double")
        val mu = lit(1.0) + lit(2.0) * n1 * n2 / (n1 + n2)
        val varR = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2)) /
          ((n1 + n2) * (n1 + n2) * (n1 + n2 - lit(1.0)))
        when(col("n_above") > 0L && col("n_below") > 0L &&
          col("n_above") + col("n_below") > 1L && varR > 0.0,
          round((r - mu) / sqrt(varR), 6))
      })
      .select(col("n_above"), col("n_below"), col("runs"), col("z"))
  }

  /** INTER-ARRIVAL TIME HISTOGRAM per event type, power-of-two bucketed:
    * consecutive-event gaps (µs, per type in (ts, event_id) order) land
    * in bucket ⌊log2 g⌋+1 = length(bin(g)) — zero-gap bursts in bucket
    * 0 — with per-bucket count and exact min/max gap. The arrival-
    * process shape screen (a Poisson-ish source fills a smooth band; a
    * batch replayer spikes one bucket; clock-quantized feeds show comb
    * gaps) that complements [[autocorr]]'s calendar view. One keyed
    * window pass for the lag, one bounded aggregate; all integers. */
  def interarrivalHist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t"))
      .withColumn("g", col("t") - lag(col("t"), 1).over(w))
      .filter(col("g").isNotNull)
      .withColumn("bucket",
        when(col("g") === 0L, 0L)
          .otherwise(length(bin(col("g"))).cast("long")))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("g")).as("min_gap"), max(col("g")).as("max_gap"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** DAILY CROSS-CORRELATION at lags −7..7 between event volume and
    * distinct active users: Pearson r of (events on day d, users on day
    * d+lag) over the days where both sides exist — the lead/lag
    * diagnostic ("does a traffic surge predict an audience surge days
    * later, or trail it?"). The fact table reduces ONCE to the bounded
    * day panel; each lag is a panel self-join on shifted integer day
    * index, sums stay BIGINT, and r closes in a fixed correctly-rounded
    * double tree (one multiply of two √, one divide) — engine-portable
    * to the oracle. */
  def crossCorr(spark: SparkSession, dir: String,
      maxLag: Int = 7): DataFrame = {
    val day = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("di"),
        col("user_id"))
      .groupBy(col("di"))
      .agg(count(lit(1)).as("x"), countDistinct(col("user_id")).as("y"))
      .localCheckpoint() // both sides of every lag join read this panel
    // lag fan-out is row-local (explode over the panel), so the lag
    // pairing is one hash equi-join — no nested-loop stage
    val xs = day.select(col("di"), col("x"))
      .withColumn("lag",
        explode(typedlit((-maxLag to maxLag).map(_.toLong))))
    val ys = day.select(col("di").as("dj"), col("y"))
    xs.join(ys, col("dj") === col("di") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("dx", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("n_days") * col("syy") - col("sy") * col("sy"))
      .withColumn("r", when(col("dx") > 0L && col("dy") > 0L,
        round((col("n_days") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double"))),
          6)))
      .select(col("lag"), col("n_days"), col("r"))
      .orderBy(col("lag"))
  }

  /** SAX SYMBOLIZATION of the per-type daily volume series (Lin et
    * al., DMKD 2007's Symbolic Aggregate approXimation, with the
    * breakpoints taken RANK-BASED rather than Gaussian — ntile(4)
    * under the (count, day) total order is engine-portable where
    * N(0,1) breakpoints would drag erf in): each observed day maps to
    * a quartile symbol a–d of its type's own volume distribution, the
    * symbols concatenate in day order into the type's signature
    * string, and n_runs counts symbol changes — the burst-structure
    * readout (a flat feed alternates rarely; a batch replayer is one
    * long run of d's punctuated by a's). Scale shape: the log reduces
    * once to the (type, day) count panel; the ntile and lag windows
    * run per type over calendar-bounded panels (the documented
    * keyed-window contract); the string assembles row-locally from
    * one sorted collect_list per type. */
  def saxSymbols(spark: SparkSession, dir: String): DataFrame = {
    val dc = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("2020-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    val wQ = Window.partitionBy(col("event_type"))
      .orderBy(col("n"), col("day"))
    val wD = Window.partitionBy(col("event_type")).orderBy(col("day"))
    dc.withColumn("q", ntile(4).over(wQ))
      .withColumn("chg",
        when(lag(col("q"), 1).over(wD).isNull ||
          lag(col("q"), 1).over(wD) =!= col("q"), 1L).otherwise(0L))
      .withColumn("sym", expr("char(96 + q)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("chg")).as("n_runs"),
        array_join(transform(
          array_sort(collect_list(struct(col("day"), col("sym")))),
          x => x.getField("sym")), "").as("sax"))
      .orderBy(col("event_type"))
  }
}
