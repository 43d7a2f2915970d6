package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan inspection for the staged-adjacency PageRank: prints
  * the formatted physical plan of a single iteration over the bucketed
  * table, to confirm the edge side scans WITHOUT an Exchange (the
  * stored bucket layout is the join partitioning) and only the rank
  * frame shuffles.
  *
  * usage: runMain graft.tools.PlanDump <sfDir>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val adjTable = "graft_plan_dump_adj"
    graft.operators.Graph.stageAdjacency(
      graft.operators.Dedup.minhashPairs(spark, sfDir), "doc_a", "doc_b",
      adjTable)
    val adj = spark.table(adjTable)
    val ranks = adj.select(col("src").as("id")).distinct()
      .withColumn("pr", lit(1.0)).localCheckpoint()
    val oneIter = adj.join(ranks, col("src") === col("id"))
      .select(col("dst"), (col("pr") / col("deg")).as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("in"))
    println("=== one PageRank iteration over the staged adjacency ===")
    oneIter.explain("formatted")
    spark.sql(s"DROP TABLE IF EXISTS $adjTable")
    spark.stop()
  }
}
