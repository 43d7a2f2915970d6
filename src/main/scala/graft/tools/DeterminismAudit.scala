package graft.tools

import java.security.MessageDigest
import org.apache.spark.sql.SparkSession

/** Cross-thread-count determinism audit: run each named query under
  * local[8] and local[32] (different partition counts → different
  * float partial-sum orders, different task interleavings) and compare
  * canonical result hashes. A mismatch means the query's output
  * depends on partitioning — the class of bug that makes a pipeline
  * unreproducible between a laptop and a 1000-executor cluster even
  * when every single run "passes".
  *
  * usage: runMain graft.tools.DeterminismAudit <sfDir> [q1,q2,...]
  * (no list = the full queries map)
  */
object DeterminismAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted

    def hashes(threads: Int): Map[String, String] = {
      val spark = SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = names.map { n =>
        val rows = graft.SparkEntry.queries(n)(spark, sfDir)
          .collect().map(_.toString).sorted
        val md = MessageDigest.getInstance("MD5")
        rows.foreach(r => md.update(r.getBytes("UTF-8")))
        n -> (rows.length + ":" + md.digest().map("%02x".format(_)).mkString)
      }.toMap
      spark.stop()
      // local-mode sessions share a JVM; clear the stopped context so
      // the next builder starts fresh
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      out
    }

    val h8 = hashes(8)
    val h32 = hashes(32)
    val diffs = names.filter(n => h8(n) != h32(n))
    names.foreach { n =>
      val mark = if (h8(n) == h32(n)) "ok  " else "DIFF"
      println(s"[det] $mark $n ${h8(n).take(40)}")
    }
    println(s"[det] summary: ${names.size - diffs.size}/${names.size} bit-stable" +
      (if (diffs.nonEmpty) s"; DIVERGENT: ${diffs.mkString(",")}" else ""))
    if (diffs.nonEmpty) sys.exit(1)
  }
}
