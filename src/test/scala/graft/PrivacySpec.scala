package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

/** Semantic checks for the k-anonymity scan: crafted quasi-identifier
  * classes exercise every branch of the rescue ladder (safe class,
  * at-risk-but-rescuable, at-risk-and-unrescuable), and the testdata
  * run checks the cross-column invariants the oracle's hash can't
  * explain when they break.
  */
class PrivacySpec extends AnyFunSuite {
  import TestSpark._

  private def ts(day: String) = Timestamp.valueOf(s"$day 12:00:00")

  /** Three event types in one month, k=3:
    *  - "safe": one class with users 1,2,3 → not at risk.
    *  - "rescue": two same-month classes with 2 users each but 4
    *    distinct users at month level → at risk, generalization
    *    rescues.
    *  - "doomed": one class with 2 users, month total also 2 → at
    *    risk, not rescuable.
    */
  private def crafted = {
    val sp = spark
    import sp.implicits._
    Seq(
      ("safe", ts("2024-01-05"), 10.0, 1L),
      ("safe", ts("2024-01-05"), 20.0, 2L),
      ("safe", ts("2024-01-05"), 30.0, 3L),
      ("rescue", ts("2024-01-10"), 10.0, 10L),
      ("rescue", ts("2024-01-10"), 20.0, 11L),
      ("rescue", ts("2024-01-20"), 10.0, 12L),
      ("rescue", ts("2024-01-20"), 20.0, 13L),
      ("doomed", ts("2024-01-15"), 10.0, 20L),
      ("doomed", ts("2024-01-15"), 20.0, 21L)
    ).toDF("event_type", "ts", "value", "user_id")
  }

  test("k-anonymity: rescue ladder branches on crafted classes") {
    val rows = Privacy.kAnonymityOn(crafted, k = 3).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    // safe: 3 rows, 3 users, same value band (all < 100 → band 0)
    assert(rows(("safe", "2024-01-05")) === ((3L, 3L, false, false)))
    // rescue classes: 2 users each → at risk; month has 4 distinct
    // users → one generalization step rescues them
    assert(rows(("rescue", "2024-01-10")) === ((2L, 2L, true, true)))
    assert(rows(("rescue", "2024-01-20")) === ((2L, 2L, true, true)))
    // doomed: at risk and the month-level class is still under k
    assert(rows(("doomed", "2024-01-15")) === ((2L, 2L, true, false)))
  }

  test("k-anonymity: invariants hold on the real event log") {
    val df = Privacy.kAnonymity(spark, sf, k = 5).cache()
    try {
      assert(df.count() > 0)
      // distinct users never exceed rows in a class
      assert(df.filter(col("n_users") > col("n_rows")).isEmpty)
      // at_risk is exactly n_users < k
      assert(df.filter(col("at_risk") =!= (col("n_users") < 5)).isEmpty)
      // a rescue claim implies risk
      assert(df.filter(col("generalization_rescues") && !col("at_risk")).isEmpty)
      // rescuability is a month-level property: two at-risk classes of
      // the same (event_type, month) must agree on it
      val disagree = df.filter(col("at_risk"))
        .groupBy(col("event_type"), date_trunc("month", col("day")))
        .agg(countDistinct(col("generalization_rescues")).as("n"))
        .filter(col("n") > 1)
      assert(disagree.isEmpty, "rescue flag diverged within a month")
    } finally df.unpersist()
  }

  test("k-anonymity: k=1 marks nothing at risk") {
    val df = Privacy.kAnonymityOn(crafted, k = 1)
    assert(df.filter(col("at_risk")).isEmpty)
  }
}
