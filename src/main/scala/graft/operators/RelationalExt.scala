package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Extended relational coverage (SURVEY §2b continued): exact
  * percentiles, set operations, grouping sets, correlated scalar
  * subqueries, interval range frames, string/date function batteries.
  * SQL-only surfaces (grouping sets, correlated subqueries, interval
  * frames) go through spark.sql over temp views — same Catalyst plans
  * a SQL user gets.
  */
object RelationalExt {

  case class Li(l_returnflag: String, l_extendedprice: Double, l_quantity: Double)

  /** Quantity-weighted mean price via the typed Dataset Aggregator API
    * (compile-time checked input shape; same Catalyst agg plan). */
  def weightedAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .as[Li]
    val agg = new graft.functions.WeightedAvg[Li](_.l_extendedprice, _.l_quantity)
    ds.groupByKey(_.l_returnflag)
      .agg(agg.toColumn.name("wavg"))
      .toDF("l_returnflag", "wavg")
      .select(col("l_returnflag"), round(col("wavg"), 4).as("wavg_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact interpolated percentiles per group (the exact twin of the
    * approx_percentile sketch path). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))
      .orderBy(col("l_returnflag"))

  /** Robust (median/MAD) outlier profile per group — the
    * distribution-free cousin of the z-score: robust_z =
    * 0.6745·(x − median)/MAD is immune to the outliers it hunts (mean
    * and stddev are not, which is why plain z-scores under-flag in
    * contaminated data). Two exact interpolated medians (value, then
    * absolute deviation) and a final profile aggregate; the per-group
    * medians are group-cardinality-sized → broadcast back, the
    * robust-z itself is row-local. A zero MAD (over half the group
    * identical) nulls the score rather than dividing by zero. At
    * 100 TB the two exact medians are the inherent cost — swap in
    * `approx_percentile` (the [[approxPercentiles]] sketch) when rank
    * error ≤ 0.1% beats two value shuffles. */
  def robustOutliers(spark: SparkSession, dir: String,
      cutoff: Double = 3.0): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice").as("x"))
    val med = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(x, 0.5)").as("med"))
    val dev = li.join(broadcast(med), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("x"), col("med"),
        abs(col("x") - col("med")).as("ad"))
    val mad = dev.groupBy(col("l_returnflag"))
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    val rz = lit(0.6745) * (col("x") - col("med")) / nullif(col("mad"), lit(0.0))
    dev.join(broadcast(mad), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 4).as("median_r"),
        round(max(col("mad")), 4).as("mad_r"),
        sum(when(abs(rz) > cutoff, 1L).otherwise(0L)).as("n_outliers"),
        round(max(abs(rz)), 4).as("max_rz"))
      .orderBy(col("l_returnflag"))
  }

  /** Approximate percentiles via the engine's mergeable quantile sketch
    * (`percentile_approx`, rank error ≤ 1/accuracy) — the 100 TB
    * companion to the exact [[percentiles]]: the sketch map-side
    * combines, so the shuffle carries one bounded summary per partition
    * instead of sorting the value column. Sketch output is
    * engine-specific → rows-only driver check; the spec pins accuracy
    * against the exact operator (approx value must lie within the
    * ±1% rank neighborhood of the exact percentile). */
  def approxPercentiles(spark: SparkSession, dir: String,
      accuracy: Int = 1000): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_extendedprice, 0.5, $accuracy)").as("ap50"),
        expr(s"approx_percentile(l_extendedprice, 0.9, $accuracy)").as("ap90"),
        expr(s"approx_percentile(l_extendedprice, 0.99, $accuracy)").as("ap99"))
      .orderBy(col("l_returnflag"))

  /** INTERSECT / EXCEPT set semantics: building-segment customers that
    * do (intersect) and don't (except) also hold open orders. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val withOpen = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O").select(col("o_custkey").as("c_custkey"))
    val both = building.intersect(withOpen).withColumn("set_op", lit("intersect"))
    val only = building.except(withOpen).withColumn("set_op", lit("except"))
    both.unionByName(only).orderBy(col("set_op"), col("c_custkey"))
  }

  /** GROUPING SETS with distinct aggregation paths per set. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        | round(sum(o_totalprice), 2) AS total_price,
        | count(*) AS n
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Correlated scalar subquery (Catalyst rewrites to an outer join —
    * the declarative form stays shuffle-bounded). */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey,
        | CAST((SELECT count(*) FROM orders_v WHERE o_custkey = c_custkey) AS BIGINT)
        |   AS n_orders,
        | (SELECT round(max(o_totalprice), 2) FROM orders_v
        |   WHERE o_custkey = c_custkey) AS max_price
        |FROM customer_v
        |WHERE c_acctbal > 9500.0
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Interval RANGE frame: trailing-30-day spend per customer. Peer rows
    * (equal order dates) share a frame, so the result is deterministic
    * without a unique sort key. */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate
        |   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2)
        |   AS spend_30d
        |FROM orders_v
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)
  }

  /** Multiset (ALL) set operations: bag semantics preserve duplicate
    * cardinalities, unlike the distinct-set INTERSECT/EXCEPT. */
  def multisetOps(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.lineitem(spark, dir).select(col("l_suppkey").as("k"))
    val b = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select(col("l_suppkey").as("k"))
    val inter = a.intersectAll(b).groupBy(col("k"))
      .agg(count(lit(1)).as("n")).withColumn("set_op", lit("intersect_all"))
    val exc = a.exceptAll(b).groupBy(col("k"))
      .agg(count(lit(1)).as("n")).withColumn("set_op", lit("except_all"))
    inter.unionByName(exc).orderBy(col("set_op"), col("k"))
  }

  /** Full outer join: preserved rows from both sides with null fill. */
  def fullOuter(spark: SparkSession, dir: String): DataFrame = {
    val bigCust = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9000.0).select("c_custkey", "c_name")
    val bigOrd = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    bigCust.join(bigOrd, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("total_price"))
      .orderBy(col("c_custkey").asc_nulls_first,
        col("o_orderkey").asc_nulls_first)
  }

  /** TPC-H Q13 shape: order-count distribution over a left outer join
    * (customers with zero orders must appear in the 0 bucket). */
  def custDist(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir).select("o_custkey", "o_orderkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18 shape: HAVING-filtered IN-subquery (large-volume orders),
    * planned as aggregate → semi join. */
  def largeVolume(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("qty_sum"))
      .filter(col("qty_sum") > 150.0)
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("total_price"),
        round(col("qty_sum"), 2).as("qty_sum"))
      .orderBy(col("o_orderkey"))
  }

  /** TPC-H Q20 shape: nested EXISTS chain as cascaded semi joins. The
    * filtered part set scales with SF, so no broadcast hint — AQE
    * broadcasts the semi-join side while it fits and shuffles beyond. */
  def nestedExists(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").contains("a")).select("p_partkey")
    val li96 = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select("l_suppkey", "l_partkey")
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
    Tables.supplier(spark, dir)
      .join(li96, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Null-safe equality (<=>): rows with null keys match each other,
    * unlike ordinary equality where null = null is unknown. Exercised
    * through the federated-union output, which manufactures nulls. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val fed = Clif.federatedUnion(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val segs = Tables.customer(spark, dir)
      .select(col("c_mktsegment").as("seg")).distinct()
      .unionByName(spark.range(1).select(lit(null).cast("string").as("seg")))
    fed.join(segs, col("c_mktsegment") <=> col("seg"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("seg").asc_nulls_first)
  }

  /** Ranking-window battery: ntile, percent_rank, cume_dist,
    * first/last_value (full-frame). Unique sort keys keep every peer
    * group a singleton → deterministic across engines. */
  def windowBattery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        first(col("o_orderkey")).over(full).as("cheapest_order"),
        last(col("o_orderkey")).over(full).as("priciest_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Unpivot (wide → long) via stack. */
  def unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .selectExpr("o_orderkey",
        "stack(2, 'totalprice', round(o_totalprice, 2), " +
          "'custkey', CAST(o_custkey AS DOUBLE)) AS (metric, value)")
      .orderBy(col("o_orderkey"), col("metric"))

  /** Gap detection over a key sequence (islands-and-gaps) — the 100 TB
    * plan: range-partition the keys, find gaps with a PER-PARTITION
    * window (parallel — no single-partition shuffle of the key space),
    * then stitch partition boundaries with a second pass over the
    * per-partition (min, max) table, which has one row per partition
    * regardless of data volume. Range partitioning is order-preserving
    * across partition ids, so "previous partition's max vs this
    * partition's min" is exactly the set of gaps the local windows
    * can't see. */
  def gapsOf(keys: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = col(keyCol)
    val parts = keys.select(k).distinct()
      .repartitionByRange(k) // spark.sql.shuffle.partitions ranges
      .withColumn("pid", spark_partition_id())
      // pid is consumed by two branches (local gaps + bounds) — pin the
      // partitioning so both see identical ids
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("pid")).orderBy(k)
    val intra = parts
      .withColumn("prev", lag(k, 1).over(wLocal))
      .filter(k - col("prev") > 1)
      .select(col("prev"), k.as("next_key"),
        (k - col("prev") - 1).as("gap_size"))
    val bounds = parts.groupBy(col("pid"))
      .agg(min(k).as("mn"), max(k).as("mx"))
    // one row per partition: this stitch is single-partition by design
    // and bounded by the partition COUNT, not the data. Declare that
    // explicitly — repartition(1) + spark_partition_id() gives the
    // window a real (non-foldable) partition key, so the plan carries
    // no accidental-global window (a literal key would be folded away
    // and re-trigger the WindowExec scale warning).
    val wBounds = Window.partitionBy(col("_stitch")).orderBy(col("pid"))
    val inter = bounds
      .repartition(1)
      .withColumn("_stitch", spark_partition_id())
      .withColumn("prev_mx", lag(col("mx"), 1).over(wBounds))
      .drop("_stitch")
      .filter(col("mn") - col("prev_mx") > 1)
      .select(col("prev_mx").as("prev"), col("mn").as("next_key"),
        (col("mn") - col("prev_mx") - 1).as("gap_size"))
    intra.unionByName(inter).orderBy(col("prev"))
  }

  def keyGaps(spark: SparkSession, dir: String): DataFrame =
    gapsOf(Tables.orders(spark, dir), "o_orderkey")

  /** Equi-width histogram with data-driven bounds: min/max ride as
    * scalar subqueries (two tiny aggregate stages — never a driver
    * round trip), binning is one row-local floor per value, and the
    * result is nBins rows at any data scale. The same binning
    * expression runs in both engines, so boundary-value bin
    * assignment (an FP floor on identical operands) agrees exactly. */
  def histogram(spark: SparkSession, dir: String,
      nBins: Int = 20): DataFrame = {
    val o = Tables.orders(spark, dir)
    val mn = o.agg(min(col("o_totalprice"))).scalar()
    val mx = o.agg(max(col("o_totalprice"))).scalar()
    val width = (mx - mn) / nBins
    // degenerate bounds (single distinct value, or an empty/all-null
    // column): width is 0 and (v-mn)/width would be 0/0 = NaN, whose
    // floor→cast lands in bin 0 here but diverges engine-by-engine —
    // short-circuit to a single explicit bin instead of a NaN artifact
    o.select(when(mx === mn, lit(0L)).otherwise(
        least(floor((col("o_totalprice") - mn) / width),
          lit(nBins - 1).cast("long")).cast("long")).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        round(mn + col("bin") * width, 4).as("bin_lo"),
        round(mn + (col("bin") + 1) * width, 4).as("bin_hi"),
        col("n"))
      .orderBy(col("bin"))
  }

  /** Equi-DEPTH histogram — [[histogram]]'s partner: bucket boundaries
    * at exact interpolated quantiles so every bucket holds ~equal row mass
    * (the shape skewed money columns need; equi-width puts 95% of rows
    * in bin 0 there). Bucket of a row = number of interior thresholds
    * strictly below its value, computed row-locally against the
    * broadcast (nBuckets−1)-element threshold array.
    *
    * Boundary determinism across engines: both compute the same
    * lower + (upper−lower)·frac interpolation; when frac = 0 the
    * threshold IS an exact data value (comparison exact), and when
    * frac ≠ 0 it lies strictly between two 2-decimal data values, so
    * a last-ulp interpolation skew has no data value inside the skew
    * window to flip. One percentile aggregate (KB output, broadcast),
    * one row-local projection, one map-side-combined count. */
  def equiDepthHistogram(spark: SparkSession, dir: String,
      nBuckets: Int = 8): DataFrame = {
    val o = Tables.orders(spark, dir)
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val thr = o.agg(percentile(col("o_totalprice"),
      typedLit(fracs)).as("thr"))
    o.crossJoin(broadcast(thr))
      .select(size(filter(col("thr"),
        t => col("o_totalprice") > t)).cast("long").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("bucket"))
  }

  /** Per-key OLS trend slope — the "is this series rising" feature
    * every behavioral/feature pipeline derives, computed with EXACT
    * integer moment sums so it hash-matches across engines: x = days
    * since a fixed epoch (small ints), y = cents (exact from the
    * 2-decimal price), so Σx, Σy, Σxy, Σx² all stay inside BIGINT and
    * aggregation ORDER cannot wobble them (the q10 lesson applied to
    * regression: closed-form OLS is ratio-of-sums, so keep the sums
    * exact and pay IEEE only for the one final division, which is
    * bit-deterministic given identical operands). One keyed
    * aggregation — map-side combined, scales with key cardinality. */
  def trendSlope(spark: SparkSession, dir: String): DataFrame = {
    val xDays = datediff(col("o_orderdate"), lit("2000-01-01").cast("date"))
      .cast("long")
    val yCents = round(col("o_totalprice") * 100).cast("long")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), xDays.as("x"), yCents.as("y"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("o_custkey"), col("n"),
        round(
          when(col("n") * col("sxx") - col("sx") * col("sx") === 0, lit(null))
            .otherwise(
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")),
          6).as("slope_cents_per_day"))
      .orderBy(col("o_custkey"))
  }

  /** Contingency-table chi-square: association between two categorical
    * columns as crosstab counts + expected counts + per-cell χ²
    * contribution. Expected counts are exact-integer products divided
    * once (row_total × col_total as BIGINT, one IEEE division), so the
    * statistic is bit-stable across engines. Marginals are two tiny
    * dimension-sized aggregates broadcast back onto the cells —
    * shuffle cost is one (a,b) groupBy of the fact table; the output
    * is |A|×|B| cells, dimension-sized at any data scale. */
  def crosstabChi2(spark: SparkSession, dir: String): DataFrame = {
    // one fact scan: marginals and the grand total derive from the
    // dimension-sized cell table, not from re-reading the fact
    val cells = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("prio"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rowTot = cells.groupBy(col("prio")).agg(sum(col("n")).as("row_n"))
    val colTot = cells.groupBy(col("status")).agg(sum(col("n")).as("col_n"))
    val grand = cells.agg(sum(col("n")).as("grand_n")).scalar()
    // (x - e) * (x - e), never pow(x, 2): Math.pow admits 1-ulp error
    // and engines may disagree there; plain IEEE subtract/multiply
    // cannot
    val dev = col("n").cast("double") - col("expected")
    cells
      .join(broadcast(rowTot), Seq("prio"))
      .join(broadcast(colTot), Seq("status"))
      .withColumn("expected",
        (col("row_n") * col("col_n")).cast("double") / grand.cast("double"))
      .select(col("prio"), col("status"), col("n"),
        round(col("expected"), 4).as("expected"),
        round(dev * dev / col("expected"), 6).as("chi2_term"))
      .orderBy(col("prio"), col("status"))
  }

  /** Statistical aggregates: correlation, covariance, dispersion. */
  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
        round(stddev_samp(col("l_discount")), 6).as("stddev_disc"),
        round(var_samp(col("l_tax")), 6).as("var_tax"),
        // skewness omitted: Spark computes population g1, DuckDB the
        // bias-corrected sample G1 — systematically different values
        round(avg(col("l_quantity")), 6).as("mean_qty"))
      .orderBy(col("l_returnflag"))

  /** Array function battery (arrays serialized to strings for
    * cross-engine comparison stability). */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_join(slice(array_sort(array_distinct(
          split(lower(trim(col("text"))), "\\s+"))), 1, 5), ",")
          .as("first5_tokens"),
        size(array_distinct(split(lower(trim(col("text"))), "\\s+")))
          .cast("long").as("n_distinct_tokens"),
        array_contains(split(lower(trim(col("text"))), "\\s+"), "spark")
          .as("mentions_spark"))
      .orderBy(col("doc_id"))

  /** regexp_extract_all battery: pull every integer out of the props
    * JSON and aggregate. */
  def regexpFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        array_join(expr("regexp_extract_all(props, '[0-9]+', 0)"), ",")
          .as("numbers"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long")
          .as("n_numbers"))
      .orderBy(col("event_id"))

  /** Conditional expression battery: CASE precedence, coalesce/nullif,
    * least/greatest. */
  def conditionalFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, "high")
          .when(col("o_totalprice") > 150000.0, "mid")
          .otherwise("low").as("price_band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
          .as("status_or_open"),
        round(least(col("o_totalprice"), lit(200000.0)), 2).as("capped"),
        round(greatest(col("o_totalprice") - lit(100000.0), lit(0.0)), 2)
          .as("excess"))
      .orderBy(col("o_orderkey"))

  /** String function battery (codegen'd built-ins). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_head"),
        length(regexp_replace(col("p_name"), " ", "")).cast("long").as("nonspace_len"),
        levenshtein(col("p_name"), col("p_brand")).cast("long").as("lev_brand"),
        reverse(col("p_type")).as("type_rev"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** Date/time function battery. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
          .as("due_date"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy(col("o_orderkey"))
}
