package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin
import graft.sources.Tables
import graft.operators.Temporal

/** The custom AsOfJoin physical operator must agree row-for-row with the
  * composed union+window baseline (which itself hash-matches DuckDB's
  * ASOF JOIN at sf0.01). */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def native() = {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("last_view_id"),
        col("ts").as("last_view_ts"))
    AsOfJoin.join(purchases, views, "user_id", "v_user", "ts", "last_view_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_view_id"), col("last_view_ts"))
  }

  test("custom as-of exec matches the union+window baseline exactly") {
    val baseline = Temporal.asofJoin(spark, sf)
    val custom = native()
    assert(custom.count() == baseline.count())
    assert(custom.exceptAll(baseline).count() == 0)
    assert(baseline.exceptAll(custom).count() == 0)
  }

  test("as-of matches have view_ts <= ts; unmatched rows are null") {
    val out = native()
    assert(out.filter(col("last_view_ts") > col("ts")).count() == 0)
    val unmatchedInconsistent = out.filter(
      col("last_view_id").isNull =!= col("last_view_ts").isNull).count()
    assert(unmatchedInconsistent == 0)
  }

  test("tolerance bound nulls out stale matches, keeps fresh ones") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("last_view_id"),
        col("ts").as("last_view_ts"))
    val tolUs = 10L * 60 * 1000000 // 10 minutes
    val bounded = AsOfJoin.join(purchases, views,
        "user_id", "v_user", "ts", "last_view_ts", toleranceUs = tolUs)
      .select(col("event_id"), col("last_view_id"), col("last_view_ts"),
        col("ts"))
    // expected: unbounded result with stale matches nulled
    val expected = native()
      .select(col("event_id"),
        when(unix_micros(col("ts")) - unix_micros(col("last_view_ts")) <= tolUs,
          col("last_view_id")).as("last_view_id"),
        when(unix_micros(col("ts")) - unix_micros(col("last_view_ts")) <= tolUs,
          col("last_view_ts")).as("last_view_ts"),
        col("ts"))
    assert(bounded.count() == expected.count())
    assert(bounded.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(bounded).count() == 0)
    // and the bound actually bites: some matches must differ from unbounded
    val nulled = bounded.filter(col("last_view_id").isNull).count()
    val unboundedNulled = native().filter(col("last_view_id").isNull).count()
    assert(nulled > unboundedNulled, "tolerance should null out stale matches")
  }

  test("unknown join column fails fast with the offending name") {
    val ev = Tables.events(spark, sf).limit(1)
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.join(ev, ev.select(col("user_id").as("u2"), col("ts").as("t2")),
        "no_such_column", "u2", "ts", "t2")
    }
    assert(e.getMessage.contains("no_such_column"))
  }

  test("physical plan uses the custom exec with one shuffle per side") {
    // AQE wraps the tree in AdaptiveSparkPlanExec, so assert on the
    // rendered inner plan rather than a top-level collect
    val plan = native().queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"AsOfJoinExec not planned:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected one shuffle per side, got $shuffles:\n$plan")
  }
}
