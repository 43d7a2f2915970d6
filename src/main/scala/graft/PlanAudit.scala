package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps formatted physical plans for plan-hygiene review: scan pruning
  * (ReadSchema/PushedFilters), join strategies (broadcast vs SMJ), and
  * WholeStageCodegen coverage. Usage: runMain graft.PlanAudit [outFile]. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("/tmp/plans.txt")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate()
    val sb = new StringBuilder
    val names = Seq("q1_pricing_agg", "q3_join_agg", "q5_multijoin",
      "q_status_pivot", "q_status_matrix", "q_poc_registry", "q_asof_join",
      "q_sessionize", "q_scd2_intervals", "q_cdc_diff", "q_dedup_minhash",
      "q_ann_lsh", "q_contamination", "q_unigram_logprob", "q_json_extract",
      "q_topk_group", "q_time_bucket")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n========== $name ==========\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
