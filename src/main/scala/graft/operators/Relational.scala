package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Core relational operators (SURVEY §2b).
  *
  * Each is a declarative DataFrame plan: filters/projections reach the
  * parquet scan, dimension sides of star joins are broadcast, and
  * aggregates are partial (map-side) before the shuffle. Floating-point
  * aggregates are rounded at the output edge only, so cross-engine
  * summation-order noise cannot flip the correctness hash.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: wide multi-aggregate groupBy. */
  def pricingAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-shaped: customer ⋈ orders ⋈ lineitem, filter, agg, top-N.
    * Customer scales with SF, so it carries no broadcast hint: AQE
    * broadcasts the filtered side while it fits and degrades to a
    * shuffle join gracefully at 100× — an explicit hint would override
    * both the threshold and AQE and OOM the executors instead. */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped star join. Broadcast hints only on the
    * fixed-cardinality dims (nation: 25 rows, region: 5 rows, forever);
    * customer and supplier grow with SF, so AQE chooses their join
    * strategy — broadcast while small, shuffle hash/sort-merge at scale. */
  def multiJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey") &&
        sup("s_nationkey") === cust("c_nationkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Window rank: orders ranked per customer by totalprice. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Window running total + lag delta per supplier over ship time.
    * The running sum accumulates in DECIMAL, not double: engines
    * evaluate running windows with different association orders (e.g.
    * segment trees whose layout varies with thread partitioning), so a
    * double running sum is not even deterministic run-to-run at the
    * rounding boundary — exact decimal arithmetic is, on every engine.
    * The window ordering carries l_quantity as a final tiebreak: the
    * synthetic lineitem contains duplicate (orderkey, linenumber) rows,
    * and a non-total ORDER BY leaves tied-row order engine- and even
    * run-dependent (observed in DuckDB under parallel evaluation). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    val qty = col("l_quantity").cast("decimal(12,2)")
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(qty).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_qty"),
        (qty - coalesce(lag(qty, 1).over(w), lit(0.0).cast("decimal(12,2)")))
          .cast("double").as("qty_delta"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Top-k per group: 2 highest-value parts per brand. */
  def topkGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 2)
      .orderBy(col("p_brand"), col("rk"))
  }

  /** Left-semi join (EXISTS): customers having at least one open order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val open = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** The same semi-join through explicit bloom pruning
    * (`Skew.bloomSemiJoin`): identical result — oracle-identical to
    * [[semiJoin]] — but probe rows drop row-locally behind a broadcast
    * bloom BEFORE the join shuffle. The 100 TB shape for "build side
    * too big to broadcast as rows, tiny as bits". */
  def bloomSemi(spark: SparkSession, dir: String): DataFrame = {
    val open = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
      .select("o_custkey")
    Skew.bloomSemiJoin(
        Tables.customer(spark, dir).select(col("c_custkey"), col("c_name")),
        open, "c_custkey", "o_custkey",
        estItems = 200000L, numBits = 1L << 21)
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_custkey")
    Tables.customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** ROLLUP: order totals by (status, priority) hierarchy. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** CUBE: order totals over every subset of (status, priority), with
    * `grouping_id` disambiguating subtotal levels (0 = cell, 3 = grand
    * total) — the full-lattice companion of [[rollupAgg]]'s hierarchy.
    * One shuffle: Spark expands the lattice map-side. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("total_price"), col("n_orders"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Exact count-distinct: distinct parts & suppliers per return flag. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** HLL sketch count-distinct — the 100 TB path where exact is a full
    * shuffle of the key space. rows-only check (sketch, engine-specific). */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      .orderBy(col("l_returnflag"))
}
