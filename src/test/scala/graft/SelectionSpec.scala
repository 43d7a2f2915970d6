package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Selection
import graft.sources.Tables

/** Semantic checks for DSIR importance resampling — the DuckDB oracle
  * hash-checks both queries; these pin the behavior that makes the
  * operator worth running: weights separate target-like from
  * non-target text, selection shifts the sample toward the target, and
  * the trivial-target fixpoint is exact.
  */
class SelectionSpec extends AnyFunSuite {
  import TestSpark._

  test("dsir: target-source documents carry higher mean weight") {
    val w = Selection.dsirWeights(spark, sf)
      .withColumn("is_tgt", col("source").isin("src0", "src1"))
      .groupBy(col("is_tgt")).agg(avg(col("logw")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false) + 0.5,
      s"importance weights fail to separate target from raw: $w")
  }

  test("dsir: target == raw corpus makes every weight exactly zero") {
    // ct == cr and Tt == Tr bucket-for-bucket, so λ is the zero vector
    // in exact integer micro-units — no smoothing residue, no float
    // blur. The cleanest closed-form the estimator has.
    val allSrc = Tables.documents(spark, sf)
      .select(col("source")).distinct().collect().map(_.getString(0)).toSeq
    val w = Selection.dsirWeights(spark, sf, targetSources = allSrc)
    assert(w.filter(col("logw") =!= 0.0).count() === 0L)
  }

  test("dsir: selection over-represents the target sources vs the corpus") {
    val docs = Tables.documents(spark, sf)
    val corpusShare = docs.filter(col("source").isin("src0", "src1")).count()
      .toDouble / docs.count()
    val sel = Selection.dsirSelect(spark, sf)
    val selShare = sel.filter(col("source").isin("src0", "src1")).count()
      .toDouble / sel.count()
    assert(selShare > 1.5 * corpusShare,
      s"resampling did not shift toward target: corpus=$corpusShare sel=$selShare")
  }

  test("dsir: weights and selection are bit-deterministic across runs") {
    val a = Selection.dsirWeights(spark, sf).collect()
    val b = Selection.dsirWeights(spark, sf).collect()
    assert(a.sameElements(b))
    val s1 = Selection.dsirSelect(spark, sf).collect()
    val s2 = Selection.dsirSelect(spark, sf).collect()
    assert(s1.sameElements(s2))
  }
}
