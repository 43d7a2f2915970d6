package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a named set of queries to one file
  * per query — the before/after plan evidence for optimization rounds.
  *
  * Usage:
  *   SPARK_GRAFT_PLANS=q_pq_codes,q_pq_recall \
  *     sbt "runMain graft.PlanDump /root/repo/plans/r12 _before"
  * Args: outDir [suffix]. Query list from SPARK_GRAFT_PLANS (comma
  * separated; "all" dumps every declared query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val suffix = if (args.length > 1) args(1) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wanted = sys.env.getOrElse("SPARK_GRAFT_PLANS", "all")
    val names =
      if (wanted == "all") SparkEntry.queries.keys.toSeq.sorted
      else wanted.split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"plan: $name")
      val df = SparkEntry.queries(name)(spark, sfDir)
      Files.writeString(Paths.get(outDir, s"$name$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
