package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Pipeline, Suffix}
import graft.sources.Tables

/** The persisted duplicated-window mark relation (r12, the span index
  * family) and its incremental-clip laws:
  *
  *  - PROBE PARITY: clipping an arriving batch against the indexed
  *    corpus equals full spanClip(corpus ∪ batch) restricted to the
  *    batch — a batch window matching ANY corpus window (even a
  *    corpus-unique one) is a duplicate (2 total occurrences), and
  *    within-batch repeats mark without touching the index;
  *  - APPEND PARITY: build(c1) + append(c2) is probe- and
  *    class-indistinguishable from build(c1 ∪ c2) (the log-structured
  *    count segments sum exactly);
  *  - O(batch): the probe's shuffle volume scales with the batch, not
  *    the indexed corpus (the bucketed classes read on their layout);
  *  - the curateIncrement span-clip GATE adds clipped text to
  *    survivors without changing which docs survive. */
class SpanIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def clipRows(df: DataFrame): Map[Long, (Long, Long, String)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("probe parity: probeSpanClip(index(corpus), batch) == full " +
    "spanClip restricted to the batch — including marks via " +
    "corpus-UNIQUE windows, which only the probe direction can see") {
    val docs = Tables.documents(spark, sf)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val cut = maxId * 2 / 3
    Suffix.buildSpanIndexOf(spark,
      docs.filter(col("doc_id") <= cut).select(col("doc_id"), col("text")),
      "span_par", nBuckets = 4)
    val batch = docs.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text"))
    val probed = clipRows(Suffix.probeSpanClip(spark, "span_par", batch))
    val full = clipRows(Suffix.spanClip(spark, sf)
      .filter(col("doc_id") > cut))
    assert(probed.nonEmpty, "batch slice must be non-empty")
    assert(probed == full,
      s"probe diverged from the full clip: only-probe=" +
        s"${(probed.toSet -- full.toSet).take(3)} only-full=" +
        s"${(full.toSet -- probed.toSet).take(3)}")
    // the parity is non-vacuous only if something actually clipped
    assert(full.values.exists(_._2 > 0),
      "expected at least one batch doc clipped against the corpus")
  }

  test("append parity: build(c1) + append(c2) equals build(c1 ∪ c2) " +
    "for both the class relation (summed count segments) and the " +
    "probe; crafted within-batch-only duplicates mark WITHOUT the " +
    "index seeing them") {
    val sp = spark
    import sp.implicits._
    val phrase = (1 to 9).map(i => s"ap$i").mkString(" ")
    val other = (1 to 8).map(i => s"bq$i").mkString(" ")
    val c1 = Seq(
      (1L, "a b c " + phrase),
      (2L, "x y " + other)).toDF("doc_id", "text")
    val c2 = Seq(
      (10L, phrase + " tail1 tail2"),
      (11L, "u v w q r s t z1 z2")).toDF("doc_id", "text")
    Suffix.buildSpanIndexOf(spark, c1, "span_app", nBuckets = 2)
    Suffix.appendSpanIndex(spark, "span_app", c2)
    Suffix.buildSpanIndexOf(spark, c1.unionByName(c2), "span_full",
      nBuckets = 2)
    def classes(name: String): Map[String, Long] =
      Suffix.spanIndexClasses(spark, name).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(classes("span_app") == classes("span_full"),
      "appended class relation must equal the rebuilt one")
    assert(classes("span_app").nonEmpty,
      "the shared phrase spans both waves — classes expected")
    // probe a batch that (a) hits the cross-wave phrase, (b) carries a
    // within-batch-only duplicate the index has never seen
    val probeBatch = Seq(
      (20L, phrase + " novel1 novel2"),
      (21L, "n1 n2 n3 " + other.replace("bq", "zz")),
      (22L, "n4 n5 " + other.replace("bq", "zz"))).toDF("doc_id", "text")
    val viaApp = clipRows(Suffix.probeSpanClip(spark, "span_app", probeBatch))
    val viaFull = clipRows(Suffix.probeSpanClip(spark, "span_full", probeBatch))
    assert(viaApp == viaFull, "append/rebuild probes diverged")
    assert(viaApp(20L)._2 == 9L,
      s"cross-wave phrase must clip 9 tokens: ${viaApp(20L)}")
    // the zz-phrase exists ONLY inside the probe batch (docs 21/22):
    // the within-batch duplicate rule must clip it index-free
    assert(viaApp(21L)._2 == 8L && viaApp(22L)._2 == 8L,
      s"within-batch duplicate must clip: ${viaApp(21L)} ${viaApp(22L)}")
  }

  test("probe shuffle volume scales with the batch, not the indexed " +
    "corpus (the O(batch) claim, measured like the minhash probe)") {
    Suffix.buildSpanIndex(spark, sf, "span_vol", nBuckets = 4)
    val corpusClasses = spark.table("span_vol_classes").count()
    val batch = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(10)
      .localCheckpoint() // fence batch prep out of the measurement
    val (_, m) = Metrics.withMetrics(spark) {
      Suffix.probeSpanClip(spark, "span_vol", batch).count()
    }
    assert(m.shuffleRecordsWritten < corpusClasses / 2,
      s"probe shuffled ${m.shuffleRecordsWritten} records against " +
        s"$corpusClasses corpus classes — the bucketed layout was ignored")
  }

  test("curateIncrement span-clip gate: same survivors as the ungated " +
    "increment, plus the clipped text columns, equal to probeSpanClip " +
    "on exactly those survivors") {
    val docs = Tables.documents(spark, sf)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val cut = maxId * 2 / 3
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-span-gate").toString
    docs.filter(col("doc_id") <= cut)
      .write.parquet(s"$corpusDir/documents.parquet")
    Dedup.buildMinhashIndex(spark, corpusDir, "sg_mh", nBuckets = 4)
    Dedup.buildContainmentIndex(spark, corpusDir, "sg_cont", nBuckets = 4)
    Suffix.buildSpanIndex(spark, corpusDir, "sg_span", nBuckets = 4)
    val batch = docs.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text"))
    val ungated = Pipeline.curateIncrement(spark, "sg_mh", "sg_cont", batch)
    val gated = Pipeline.curateIncrement(spark, "sg_mh", "sg_cont", batch,
      spanIndex = Some("sg_span"))
    assert(ungated.columns.toSeq ==
      Seq("doc_id", "lang_pred", "quality", "split"))
    assert(gated.columns.toSeq == Seq("doc_id", "lang_pred", "quality",
      "split", "n_tokens", "n_removed", "clean_text"))
    val uRows = ungated.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    val gRows = gated.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(uRows == gRows, "the gate must not change which docs survive")
    val clip = clipRows(Suffix.probeSpanClip(spark, "sg_span", batch))
    gated.collect().foreach { r =>
      val (nt, nr, txt) = clip(r.getLong(0))
      assert(r.getLong(4) == nt && r.getLong(5) == nr &&
        r.getString(6) == txt,
        s"gate clip mismatch for doc ${r.getLong(0)}")
    }
  }
}
