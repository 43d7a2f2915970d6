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
    val l1 = e.groupBy(col("event_type"),
        date_trunc("month", col("day")).as("month"))
      .agg(countDistinct(col("user_id")).as("l1_users"))
    l0.join(broadcast(l1),
        l0("event_type") === l1("event_type") &&
          date_trunc("month", l0("day")) === l1("month"))
      .select(l0("event_type"), col("day"), col("value_band"),
        col("n_rows"), col("n_users"),
        (col("n_users") < k).as("at_risk"),
        (col("n_users") < k && col("l1_users") >= k)
          .as("generalization_rescues"))
      .orderBy(col("event_type"), col("day"), col("value_band"))
  }
}
