package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The remaining classic TPC-H query SHAPES expressible over the
  * available columns (SURVEY §2b continued) — each exercises a distinct
  * optimizer/execution pattern a relational engine must get right at
  * scale, beyond the q1/q3/q5/q13/q18/q20 family already covered:
  * EXISTS-driven counting (q4), full-scan predicate aggregation (q6),
  * multi-nation volume matrices (q7), group-filter-topN (q10),
  * conditional aggregation (q12), share-of-total (q14), disjunctive
  * multi-column pushdown (q19), and anti-join + scalar-subquery
  * screening (q22). All are single declarative plans — Catalyst owns
  * join order, AQE owns strategy; the only hints anywhere remain the
  * fixed-cardinality nation/region dims (none needed here).
  */
object RelationalTpch {

  /** TPC-H Q4 shape: per-priority count of orders having at least one
    * lineitem shipped > 30 days after the order date — EXISTS as a
    * left-semi join, aggregation AFTER the semi reduction. */
  def priorityExists(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6 shape: the forecasting-revenue-change scan — one table,
    * three pushable predicates, one aggregate. The whole query should
    * compile to a single WholeStageCodegen scan stage with every filter
    * in PushedFilters. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** TPC-H Q7 shape: shipping volume between two specific nations by
    * year — the join tree mixes a fact-fact join (orders⋈lineitem) with
    * two independent dimension paths (supplier→nation, customer→nation)
    * and a symmetric nation-pair predicate. */
  def volumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    * quarter — selective fact filter, 3-way join, group on a wide key,
    * TopK planned as TakeOrderedAndProject (never a global sort). */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      // decimal FACTORS, decimal sum, NO re-rounding: price and discount
      // are true 2-decimal values, so casting each factor recovers them
      // exactly and the scale-4 product/sum is exact and
      // order-independent; casting that exact decimal to double is the
      // same nearest-double in every engine. (A float sum flips the
      // rounded cent with association order, and round(x, 2) lands on
      // genuine .005 midpoints — customer 249 sums to 307843.5950 —
      // where HALF_UP-on-decimal and round-on-binary-double disagree;
      // both observed on this query.)
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
        (lit(BigDecimal("1.00")) - col("l_discount").cast("decimal(4,2)")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape: conditional aggregation — high- vs low-priority
    * line counts per linestatus for late-shipped lines (CASE folded
    * into the aggregate, one pass). */
  def priorityCase(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q14 shape: promo revenue share — share-of-total inside one
    * aggregation (no self-join, no second pass). */
  def promoShare(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(lit(0.0))) /
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("promo_share_pct"))

  /** TPC-H Q19 shape: disjunctive multi-column predicate (brand × size
    * × quantity bands OR-ed together) — the pattern that tests whether
    * the engine pushes an OR-of-ANDs down to the joint scan instead of
    * falling back to a post-join filter. */
  def disjunctiveBands(spark: SparkSession, dir: String): DataFrame = {
    val bands =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 40))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(bands)
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q22 shape: dormant high-balance customers — scalar subquery
    * (average positive balance) as the screening threshold, NOT EXISTS
    * (no order since 2000) as a left-anti join, dimension rollup on the
    * survivors. */
  def dormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val threshold = c.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("thr"))
    c.join(broadcast(threshold))
      .filter(col("c_acctbal") > col("thr"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }
}
