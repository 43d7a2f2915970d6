package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Schema-profiling audits — the discovery pass a lake runs before it
  * trusts a table's keys and joins. Classical data-profiling primitives
  * (functional dependencies, inclusion dependencies, candidate keys —
  * the TANE/SPIDER/HyFD family restated as declarative plans): each
  * audit reduces the fact columns to their DISTINCT value panel FIRST
  * (map-side combine does the heavy lifting), so every shuffle carries
  * value cardinalities, never raw rows. At 100 TB the profile cost is
  * one scan per audited table plus distinct-sized exchanges — the same
  * shape ANALYZE TABLE statistics collection has.
  */
object Profiling {

  /** FD candidates `(table, lhs, rhs)` — one list drives BOTH the Spark
    * plan and the generated DuckDB oracle, so the audited surface can
    * never drift between the two sides. */
  val FdCandidates: Seq[(String, String, String)] = Seq(
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_suppkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("documents", "doc_id", "source"),
    ("documents", "source", "lang"),
    ("events", "event_id", "user_id"),
    ("events", "user_id", "event_type"))

  /** IND candidates `(childTbl, childCol, parentTbl, parentCol)`. */
  val IndCandidates: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"))

  /** Candidate-key probes `(table, columns)`. */
  val KeyCandidates: Seq[(String, Seq[String])] = Seq(
    ("orders", Seq("o_orderkey")),
    ("orders", Seq("o_custkey")),
    ("orders", Seq("o_custkey", "o_orderdate")),
    ("lineitem", Seq("l_orderkey")),
    ("lineitem", Seq("l_orderkey", "l_linenumber")),
    ("customer", Seq("c_custkey")),
    ("customer", Seq("c_name")),
    ("events", Seq("event_id")),
    ("events", Seq("user_id", "ts")),
    ("documents", Seq("doc_id")),
    ("documents", Seq("text")))

  /** One functional-dependency candidate: does `lhs` determine `rhs`
    * inside `table`? Exact audit (not sampled): reduce to the distinct
    * (lhs, rhs) panel, then count rhs-values per lhs group. A group
    * with more than one rhs value is a violation witness. */
  private[graft] def fdStats(df: DataFrame, table: String, lhs: String,
      rhs: String): DataFrame = {
    val pairs = df.select(col(lhs).as("g"), col(rhs).as("v")).distinct()
    pairs.groupBy(col("g")).agg(count(lit(1)).as("card"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("card") > 1L, 1L).otherwise(0L))
          .as("violating_groups"),
        max(col("card")).as("max_rhs_card"))
      .select(lit(table).as("tbl"), lit(lhs).as("lhs"), lit(rhs).as("rhs"),
        col("n_groups"), col("violating_groups"), col("max_rhs_card"),
        when(col("violating_groups") === 0L, 1L).otherwise(0L).as("holds"))
  }

  /** FUNCTIONAL-DEPENDENCY AUDIT over a fixed candidate set spanning
    * the lake's fact and dim tables: for each `lhs → rhs` candidate,
    * the number of determinant groups, how many are violated (carry >1
    * distinct rhs), the worst group's rhs cardinality, and the verdict.
    * This is the integrity check behind "can I collapse on this key" /
    * "is this column derivable" decisions; the violated rows point at
    * denormalization or dirty ingest. Scale shape: per candidate ONE
    * distinct-reduce of two columns then a group count — distinct-sized
    * shuffles only; the union of 1-row aggregates is free. */
  def fdAudit(spark: SparkSession, dir: String): DataFrame =
    FdCandidates
      .map { case (t, lhs, rhs) => fdStats(table(spark, dir, t), t, lhs, rhs) }
      .reduce(_ unionByName _)
      .orderBy(col("tbl"), col("lhs"), col("rhs"))

  /** Loader dispatch: `events` goes through [[Tables.events]] for the
    * timestamp-shape normalization; everything else is a plain read. */
  private def table(spark: SparkSession, dir: String,
      name: String): DataFrame =
    if (name == "events") Tables.events(spark, dir)
    else Tables.load(spark, dir, name)

  /** One inclusion-dependency candidate: is every non-null value of
    * `childCol` present in `parentCol`? Both sides distinct-reduce
    * before the containment semi-join, so the join carries key
    * cardinalities, not table rows. */
  private[graft] def indStats(child: DataFrame, childTbl: String, childCol: String,
      parent: DataFrame, parentTbl: String, parentCol: String): DataFrame = {
    val c = child.select(col(childCol).as("k"))
      .filter(col("k").isNotNull).distinct()
    val p = parent.select(col(parentCol).as("k"))
      .filter(col("k").isNotNull).distinct()
    val contained = c.join(p, Seq("k"), "left_semi")
      .agg(count(lit(1)).as("n_contained"))
    c.agg(count(lit(1)).as("n_child"))
      .crossJoin(contained)
      .select(lit(childTbl).as("child_tbl"), lit(childCol).as("child_col"),
        lit(parentTbl).as("parent_tbl"), lit(parentCol).as("parent_col"),
        col("n_child"), col("n_contained"),
        when(col("n_child") > 0L,
          round(col("n_contained").cast("double") / col("n_child"), 6))
          .as("containment"),
        when(col("n_contained") === col("n_child"), 1L).otherwise(0L)
          .as("holds"))
  }

  /** INCLUSION-DEPENDENCY AUDIT (foreign-key discovery): for each
    * candidate `child.col ⊆ parent.col`, the distinct child values,
    * how many resolve in the parent, the containment share, and the
    * verdict. Exactly the audit that decides whether a join is safe
    * (containment 1.0) or silently drops rows (< 1.0) — the discovery
    * face of [[Quality.fkOrphans]], which grades one known FK at row
    * grain. Scale shape: per candidate two distinct-reduces + one
    * semi-join over distinct keys; nothing proportional to fact rows
    * crosses the wire. */
  def indAudit(spark: SparkSession, dir: String): DataFrame =
    IndCandidates
      .map { case (ct, cc, pt, pc) =>
        indStats(table(spark, dir, ct), ct, cc, table(spark, dir, pt), pt, pc)
      }
      .reduce(_ unionByName _)
      .orderBy(col("child_tbl"), col("child_col"), col("parent_tbl"))

  /** One candidate-key probe: rows vs distinct projections of `cols`.
    * DISTINCT-subquery counting (not count(distinct …)) so null rows
    * count once — identical semantics in every SQL engine. */
  private[graft] def keyStats(df: DataFrame, table: String,
      cols: Seq[String]): DataFrame = {
    val rows = df.agg(count(lit(1)).as("n_rows"))
    val dist = df.select(cols.map(col): _*).distinct()
      .agg(count(lit(1)).as("n_distinct"))
    rows.crossJoin(dist)
      .select(lit(table).as("tbl"), lit(cols.mkString(",")).as("cols"),
        col("n_rows"), col("n_distinct"),
        when(col("n_rows") > 0L,
          round(col("n_distinct").cast("double") / col("n_rows"), 6))
          .as("uniqueness"),
        when(col("n_distinct") === col("n_rows"), 1L).otherwise(0L)
          .as("is_key"))
  }

  /** CANDIDATE-KEY / UNIQUENESS PROFILE: for single columns and column
    * combinations across the lake, row count vs distinct count, the
    * uniqueness ratio, and whether the combination is a key. The
    * dedup-design input (a 0.97-unique "almost key" means upstream
    * retries) and the partition-key sanity check before bucketing a
    * 100 TB table. Scale shape: one distinct-reduce per candidate —
    * map-side combine collapses each partition to its local distincts
    * before any exchange; 1-row aggregates union for free. */
  def keyProfile(spark: SparkSession, dir: String): DataFrame =
    KeyCandidates
      .map { case (t, cols) => keyStats(table(spark, dir, t), t, cols) }
      .reduce(_ unionByName _)
      .orderBy(col("tbl"), col("cols"))
}
