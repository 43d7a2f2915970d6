package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Smoke + semantic checks over every SparkEntry query at sf0.001. */
class QuerySuiteSpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query executes and yields a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("no silent duplicate keys in the queries/oracle source maps") {
    // a duplicated literal key collapses silently in a Map — compare the
    // source text's key counts against the runtime Map sizes
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")))
    val qBlock = src.substring(src.indexOf("def queries"), src.indexOf("def oracleSql"))
    val oBlock = src.substring(src.indexOf("def oracleSql"))
    val keyRe = "\"(q[a-z0-9_]+)\" ->".r
    val qKeys = keyRe.findAllMatchIn(qBlock).map(_.group(1)).toSeq
    val oKeys = keyRe.findAllMatchIn(oBlock).map(_.group(1)).toSeq
    def dups(ks: Seq[String]) = ks.groupBy(identity).filter(_._2.size > 1).keys
    assert(qKeys.distinct.size == qKeys.size, s"duplicate query keys: ${dups(qKeys)}")
    assert(oKeys.distinct.size == oKeys.size, s"duplicate oracle keys: ${dups(oKeys)}")
    assert(SparkEntry.queries.size == qKeys.size)
    assert(SparkEntry.oracleSql.size == oKeys.size)
  }

  test("q1 aggregates are consistent with a direct recount") {
    val df = SparkEntry.queries("q1_pricing_agg")(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("count_order"))
      .head.getLong(0)
    val raw = graft.sources.Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-09-02").cast("timestamp"))
      .count()
    assert(total == raw)
  }

  test("approx percentile sketch tracks the exact percentile within 5%") {
    import org.apache.spark.sql.functions._
    val row = graft.sources.Tables.lineitem(spark, sf)
      .agg(expr("percentile(l_extendedprice, 0.5)").as("exact"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"))
      .head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx vs exact=$exact")
  }

  test("latest_status has exactly one row per user") {
    val df = SparkEntry.queries("q_latest_status")(spark, sf)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("asof join: every matched view precedes its purchase") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_asof_join")(spark, sf)
    val bad = df.filter(col("last_view_ts").isNotNull &&
      col("last_view_ts") > col("ts")).count()
    assert(bad == 0)
  }

  test("sessionize: session bounds ordered, counts positive") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_sessionize")(spark, sf)
    assert(df.filter(col("sess_end") < col("sess_start")).count() == 0)
    assert(df.filter(col("n_events") <= 0).count() == 0)
  }

  test("category_append: no duplicate dict values, new flagged correctly") {
    val df = SparkEntry.queries("q_category_append")(spark, sf)
    assert(df.count() == df.select("dict_value").distinct().count())
  }

  test("federated_union: row count equals full customer count") {
    val df = SparkEntry.queries("q_federated_union")(spark, sf)
    val n = graft.sources.Tables.customer(spark, sf).count()
    assert(df.count() == n)
  }
}
