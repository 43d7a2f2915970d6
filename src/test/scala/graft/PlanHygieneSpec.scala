package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net: catches accidental cartesian products and
  * lost broadcasts across the whole query surface. The brute-force
  * similarity baselines are the only operators allowed a nested-loop
  * pair stage (documented O(n²) exact baselines; the LSH variants are
  * the scale path). */
class PlanHygieneSpec extends AnyFunSuite {
  import TestSpark._

  // q_source_similarity pairs per-GROUP sketches (|groups| rows, not
  // |docs|), so its nested loop is over the tiny aggregated side
  private val nestedLoopAllowed = Set(
    "q_embed_neardup", "q_ann_bruteforce", "q_set_ops", "q_source_similarity",
    "q_media_neighbors")

  test("no query plans a cartesian product; nested-loop only where documented") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      if (cartesian && !nestedLoopAllowed(name)) Some(s"$name: CartesianProduct")
      else if (bnlj && !nestedLoopAllowed(name)) Some(s"$name: BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("star joins broadcast their dimension sides") {
    for (q <- Seq("q5_multijoin", "q_status_pivot", "q_completion_rate")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
      assert(!plan.contains("SortMergeJoin"), s"$q degraded to SMJ at test SF")
    }
  }

  test("filters reach the parquet scans") {
    for ((q, pushed) <- Seq(
      "q1_pricing_agg" -> "LessThanOrEqual(l_shipdate",
      "q3_join_agg" -> "EqualTo(c_mktsegment,BUILDING)",
      "q_asof_join" -> "EqualTo(event_type,purchase)")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains(pushed), s"$q: expected pushed filter $pushed")
    }
  }
}
