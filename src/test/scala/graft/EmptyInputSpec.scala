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

  test("library surface outside the queries map survives empty inputs") {
    import org.apache.spark.sql.functions._
    // sharded kernel, IVF index build+probe, tuner, gap stitch: all must
    // run to zero rows (or a sane default) on an empty corpus
    assert(graft.operators.Similarity
      .annBruteforceKernel(spark, emptyDir).count() == 0)
    graft.operators.Similarity.buildIvfIndex(spark, emptyDir, "ivf_empty")
    assert(graft.operators.Similarity
      .probeIvfIndex(spark, "ivf_empty", emptyDir).count() == 0)
    assert(graft.operators.Similarity
      .tuneNProbe(spark, emptyDir, targetRecall = 0.8) >= 1)
    import spark.implicits._
    assert(graft.operators.RelationalExt
      .gapsOf(Seq.empty[Long].toDF("k"), "k").count() == 0)
    // round-4 off-map surface
    graft.operators.Dedup.buildMinhashIndex(spark, emptyDir, "mh_empty")
    assert(graft.operators.Dedup.probeMinhashIndex(spark, "mh_empty",
      graft.sources.Tables.documents(spark, emptyDir)).count() == 0)
    val (_, vals, comps) = graft.operators.Embeddings.pcaFit(spark, emptyDir)
    assert(vals.length == 64 && comps.length == 64)
    assert(graft.operators.Skew.bloomSemiJoin(
      graft.sources.Tables.documents(spark, emptyDir).select(col("doc_id")),
      graft.sources.Tables.documents(spark, emptyDir).select(col("doc_id").as("k")),
      "doc_id", "k").count() == 0)
    // round-4 continuation off-map surface
    assert(graft.operators.Graph.connectedComponents(
      Seq.empty[(Long, Long)].toDF("s", "t"), "s", "t").count() == 0)
    assert(graft.operators.Similarity.annPcaLsh(spark, emptyDir).count() == 0)
    // round-5 continuation off-map surface
    graft.operators.Dedup.buildContainmentIndex(spark, emptyDir, "cont_empty")
    assert(graft.operators.Dedup.probeContainmentIndex(spark, "cont_empty",
      graft.sources.Tables.documents(spark, emptyDir)).count() == 0)
    // round-6 continuation off-map surface
    graft.operators.Search.buildSearchIndex(spark, emptyDir, "srch_empty")
    assert(graft.operators.Search.probeSearchIndex(spark, "srch_empty").count() == 0)
    import spark.implicits._
    assert(graft.operators.Search.probeSearchIndexMany(spark, "srch_empty",
      Seq((1L, "data")).toDF("query_id", "tok")).count() == 0)
    val emptySnap = graft.operators.Incremental.distinctSketchSnapshot(
      graft.sources.Tables.events(spark, emptyDir), Seq("event_type"), "user_id")
    assert(graft.operators.Incremental.mergeDistinctSnapshots(
      emptySnap, emptySnap, Seq("event_type")).count() == 0)
    graft.operators.Dedup.buildEditIndex(spark, emptyDir, "edit_empty")
    assert(graft.operators.Dedup.probeEditIndex(spark, "edit_empty",
      Seq((1L, "name")).toDF("probe_key", "probe_name")).count() == 0)
    // compacting an empty-but-present parquet dir is a no-op rewrite
    val cdir = java.nio.file.Files.createTempDirectory("graft-empty-compact").toString
    graft.sources.Tables.documents(spark, emptyDir).write.parquet(s"$cdir/t")
    val cs = graft.sources.FormatIO.compact(spark, s"$cdir/t")
    assert(cs.filesAfter >= 1L && spark.read.parquet(s"$cdir/t").count() == 0)
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
