package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: time named queries (steady state, min of N) and
  * print their formatted physical plans — the measure-then-iterate loop
  * SURVEY §5 prescribes, pointed at a specific query list.
  *
  * usage: runMain graft.tools.PerfProbe <sfDir> <reps> <q1,q2,...>
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args(2).split(",").toSeq
      else Seq("q_completion_rate", "q_poc_registry", "q_status_pivot")
    val spark = graft.GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf] $n min=${times.min}%.3f times=${times.map(t => f"$t%.3f").mkString(",")}")
      if (sys.env.get("PERF_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
