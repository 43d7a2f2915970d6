package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cluster-scale strategy parity: with broadcast disabled (the regime a
  * 100 TB fact-to-fact join lives in), every plan must degrade to
  * shuffle-based joins and still produce identical results. */
class ScaleStrategySpec extends AnyFunSuite {
  import TestSpark._

  private val joinQueries = Seq("q1_pricing_agg", "q3_join_agg",
    "q5_multijoin", "q_status_pivot", "q_semi_join", "q_anti_join",
    "q_asof_join", "q_asof_join_native", "q13_custdist",
    "q18_large_volume", "q20_nested_exists", "q_full_outer")

  test("all join queries match under forced sort-merge strategy") {
    val defaults = joinQueries.map(q =>
      q -> SparkEntry.queries(q)(spark, sf).collect()).toMap
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joinQueries.foreach { q =>
        val smj = SparkEntry.queries(q)(spark, sf).collect()
        assert(smj.sameElements(defaults(q)),
          s"$q differs between broadcast and shuffle join strategies")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
