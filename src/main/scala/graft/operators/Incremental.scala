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
