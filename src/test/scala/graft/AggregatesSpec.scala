package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality
import graft.functions.Aggregates
import graft.functions.HashExpressions._

class AggregatesSpec extends AnyFunSuite {
  import TestSpark._

  test("group minhash: identical groups estimate jaccard 1, estimates in [0,1]") {
    import spark.implicits._
    val docs = Seq(
      ("g1", "alpha beta gamma delta epsilon zeta"),
      ("g1", "eta theta iota kappa lambda mu"),
      ("g2", "alpha beta gamma delta epsilon zeta"), // identical universe to g1 half
      ("g2", "eta theta iota kappa lambda mu"),
      ("g3", "totally different content entirely here now"))
      .toDF("g", "text")
    val sigs = docs.select(col("g"),
        minhashSignature(rollingShingles(col("text"), 8), 32).as("sig"))
      .groupBy("g").agg(Aggregates.groupMinhash(col("sig"), 32).as("gsig"))
    val a = sigs.select(col("g").as("ga"), col("gsig").as("sa"))
    val b = sigs.select(col("g").as("gb"), col("gsig").as("sb"))
    val sims = a.join(b, col("ga") < col("gb"))
      .select(col("ga"), col("gb"), expr(
        "aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / CAST(32.0 AS DOUBLE)")
        .as("est"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(sims(("g1", "g2")) == 1.0, "identical shingle universes must agree fully")
    assert(sims(("g1", "g3")) < 0.5, "disjoint universes must mostly disagree")
  }

  test("source similarity runs end-to-end with sane bounds") {
    val out = Quality.sourceSimilarity(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("est_jaccard") < 0.0 || col("est_jaccard") > 1.0).count() == 0)
  }

  test("upsert over split log equals latest-status over full log") {
    val full = SparkEntry.queries("q_latest_status")(spark, sf)
    val upserted = SparkEntry.queries("q_upsert_latest")(spark, sf)
    assert(upserted.exceptAll(full).count() == 0)
    assert(full.exceptAll(upserted).count() == 0)
  }

  test("vector_sum aggregate equals the posexplode formulation") {
    import spark.implicits._
    val df = Seq(
      ("a", Array(1.0, 2.0, 3.0)), ("a", Array(0.5, -1.0, 4.0)),
      ("b", Array(10.0, 0.0, -2.0))).toDF("g", "v")
    val fast = df.groupBy(col("g"))
      .agg(graft.functions.Aggregates.vectorSum(col("v"), 3).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    val slow = df.select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("g"), col("pos")).agg(sum(col("x")).as("s"))
      .groupBy(col("g"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, s))), t -> t.s)")
        .as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(fast == slow)
  }

  test("weighted avg typed aggregator equals the SQL formula") {
    val typed = SparkEntry.queries("q_weighted_avg")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sql = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")) /
        sum(col("l_quantity")), 4).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed == sql)
  }
}
