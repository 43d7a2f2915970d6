package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Robustness: every query must execute (possibly to zero rows) against
  * an empty dataset — the degenerate case of empty partitions that any
  * 100 TB job hits constantly (empty buckets, filtered-out splits,
  * late-arriving site data). */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emptyDir: String = {
    // raw (pre-conversion) reads need the nanos conf that Tables.events
    // normally sets — this builder may run before any events load
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.names.foreach { t =>
      Tables.load(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query runs to completion on an empty dataset") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
