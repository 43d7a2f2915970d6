package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Incremental aggregate maintenance: keep a per-key aggregate snapshot
  * and fold in each new batch by merging partials (sum/count/min/max are
  * all merge-associative), instead of rescanning history. At 100 TB the
  * difference is a delta-sized job vs a full-corpus job per refresh.
  */
object Incremental {

  /** Per-key bottom-k DISTINCT sketch snapshot — the incremental
    * answer to "distinct users per key, maintained across daily runs"
    * that [[mergeAggSnapshots]]'s sum/min/max algebra cannot give
    * (distinct does not re-sum). One map-side-combined aggregation;
    * each group's state is ≤ k longs, persistable as a plain
    * array<long> parquet column. */
  def distinctSketchSnapshot(df: DataFrame, keys: Seq[String],
      keyCol: String, k: Int = 1024): DataFrame = {
    import graft.functions.Aggregates
    df.groupBy(keys.map(col): _*)
      .agg(Aggregates.kmvSketch(col(keyCol), k).as("sk"))
  }

  /** Fold a delta snapshot into the standing one: per key, merge the
    * stored sketches (KMV algebra — merge-of-bottom-ks equals
    * bottom-k-of-union, so the merged snapshot is BIT-IDENTICAL to
    * [[distinctSketchSnapshot]] over the concatenated raw data, which
    * is what the spec asserts). Shuffle carries sketches (≤ k longs
    * per group per side), never raw keys — the delta-sized refresh. */
  def mergeDistinctSnapshots(snapshot: DataFrame, delta: DataFrame,
      keys: Seq[String], k: Int = 1024): DataFrame = {
    import graft.functions.Sketches
    snapshot.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(Sketches.kmvMerge(collect_list(col("sk")), k).as("sk"))
  }

  /** Read an estimate off a snapshot: exact (whole-number) below k
    * distinct keys, ~1/√k beyond. */
  def estimateDistinct(snapshot: DataFrame, k: Int = 1024): DataFrame = {
    import graft.functions.Sketches
    snapshot.withColumn("distinct_est",
      round(Sketches.kmvEstimate(col("sk"), k)).cast("long"))
  }

  /** Merge two partial-aggregate tables that share `keys` and the
    * mergeable metric columns: sums/counts re-sum, mins/maxs re-min/max. */
  def mergeAggSnapshots(snapshot: DataFrame, delta: DataFrame,
      keys: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    val aggs = sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++ maxs.map(c => max(col(c)).as(c))
    snapshot.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  private def partial(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))

  /** Snapshot (pre-cut) + delta (post-cut) merged — must equal the
    * full-log aggregate (the DuckDB oracle computes the latter). */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts", "value")
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    val merged = mergeAggSnapshots(
      partial(ev.filter(col("ts") < cut)),
      partial(ev.filter(col("ts") >= cut)),
      keys = Seq("user_id", "event_type"), sums = Seq("n", "total_value"),
      mins = Seq("first_ts"), maxs = Seq("last_ts"))
    merged.select(col("user_id"), col("event_type"), col("n"),
        round(col("total_value"), 2).as("total_value"),
        col("first_ts"), col("last_ts"))
      .orderBy(col("user_id"), col("event_type"))
  }
}
