package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Search}
import graft.sources.FormatIO

/** The index-epoch commit protocol (FormatIO): a persisted index is
  * SEVERAL tables that must move together, and a probe racing a
  * half-written maintenance wave must read the old complete version of
  * all of them — never new postings with old df, or a hidden doc whose
  * stats delta hasn't landed. The laws checked here:
  *
  *  1. TORN-WAVE INVISIBILITY — rows written at a staged (uncommitted)
  *     epoch, even across only SOME of the index's tables, change no
  *     probe result;
  *  2. CRASH RECOVERY — the next wave at the same epoch scrubs the
  *     dead wave's rows physically before reusing the number, so a
  *     later commit cannot resurrect half a wave (this is also what
  *     makes a retried foreachBatch append effectively exactly-once);
  *  3. COMMIT DISCIPLINE — commits are strictly sequential, and a
  *     committed wave becomes visible in ONE step across all tables.
  */
class EpochPinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  private def corpusDir(): String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-epoch").toString
    Seq(
      (1L, "a b c d e f g h", "s1", "en"),
      (2L, "a b c d e f g x", "s1", "en"),
      (3L, "p q r s t u v w", "s2", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def probeBatch() = {
    val sp = spark
    import sp.implicits._
    Seq((101L, "a b c d e f g h")).toDF("doc_id", "text")
  }

  test("containment: a staged wave visible in postings+sets but never " +
    "committed changes no probe; the next wave scrubs it before " +
    "reusing the epoch") {
    val sp = spark
    import sp.implicits._
    val dir = corpusDir()
    Dedup.buildContainmentIndex(spark, dir, "ep_cont", nBuckets = 2)
    val r0 = Dedup.probeContainmentIndex(spark, "ep_cont", probeBatch())
      .collect().map(_.toString).sorted
    assert(r0.nonEmpty, "the probe doc is contained in doc 1")
    val pin0 = FormatIO.committedEpoch(spark, "ep_cont")
    assert(pin0 == 0L, "a fresh build commits at epoch 0")

    // simulate a wave that wrote postings AND sets for a phantom doc
    // 999 (cloned from doc 1, so an unpinned probe WOULD emit the
    // (101, 999) pair at c = 1.0) and then died before its df/prefix
    // writes and before the commit marker
    val e = FormatIO.stageIndexEpoch(spark, "ep_cont",
      Seq("ep_cont_postings", "ep_cont_sets", "ep_cont_df",
        "ep_cont_prefixes"))
    assert(e == pin0 + 1L)
    FormatIO.appendBucketed(spark,
      spark.table("ep_cont_postings").drop("epoch")
        .filter(col("doc_b") === 1L)
        .withColumn("doc_b", lit(999L)).withColumn("epoch", lit(e)),
      "ep_cont_postings")
    FormatIO.appendBucketed(spark,
      spark.table("ep_cont_sets").drop("epoch")
        .filter(col("doc_b") === 1L)
        .withColumn("doc_b", lit(999L)).withColumn("epoch", lit(e)),
      "ep_cont_sets")
    // the torn state is physically present in the raw tables...
    assert(spark.table("ep_cont_postings")
      .filter(col("doc_b") === 999L).count() > 0)
    // ...and a pinned probe reads the OLD COMPLETE version: bit-equal
    val rTorn = Dedup.probeContainmentIndex(spark, "ep_cont", probeBatch())
      .collect().map(_.toString).sorted
    assert(rTorn.sameElements(r0),
      "uncommitted rows must be invisible to a pinned probe")
    assert(FormatIO.committedEpoch(spark, "ep_cont") == pin0,
      "staging does not move the committed pin")

    // crash recovery: a REAL append now arrives; stageIndexEpoch finds
    // the dead wave's marker at the same epoch and scrubs its rows
    // from every table before writing, so the commit cannot resurrect
    // the phantom doc
    Dedup.appendToContainmentIndex(spark, "ep_cont",
      Seq((1000L, "a b c d e f g h")).toDF("doc_id", "text"))
    assert(FormatIO.committedEpoch(spark, "ep_cont") == pin0 + 1L)
    assert(spark.table("ep_cont_postings")
      .filter(col("doc_b") === 999L).count() == 0L,
      "the dead wave's rows are physically scrubbed, not just hidden")
    assert(spark.table("ep_cont_sets")
      .filter(col("doc_b") === 999L).count() == 0L)
    val r1 = Dedup.probeContainmentIndex(spark, "ep_cont", probeBatch())
      .collect()
    assert(r1.exists(_.getLong(1) == 1000L),
      "the committed wave IS visible — (101, 1000) at c = 1.0")
    assert(!r1.exists(_.getLong(1) == 999L))
  }

  test("search: a staged stats segment (wrong n_docs) never committed " +
    "leaves probe BM25 scores bit-identical") {
    val dir = corpusDir()
    Search.buildSearchIndex(spark, dir, "ep_srch", nBuckets = 2)
    val r0 = Search.probeSearchIndex(spark, "ep_srch", Seq("a", "p"))
      .collect().map(_.toString).sorted
    assert(r0.nonEmpty)
    val e = FormatIO.stageIndexEpoch(spark, "ep_srch",
      Seq("ep_srch_postings", "ep_srch_lens", "ep_srch_stats"))
    // a poisonous stats delta that would shift every idf/avgdl if read
    spark.sql("SELECT CAST(1000000 AS BIGINT) AS n_docs, " +
        s"CAST(9.9e9 AS DOUBLE) AS sum_dl, CAST($e AS BIGINT) AS epoch")
      .write.format("parquet").mode("append").saveAsTable("ep_srch_stats")
    spark.catalog.refreshTable("ep_srch_stats")
    val rTorn = Search.probeSearchIndex(spark, "ep_srch", Seq("a", "p"))
      .collect().map(_.toString).sorted
    assert(rTorn.sameElements(r0),
      "an uncommitted stats segment must not bend BM25 scores")
  }

  test("crash recovery scrubs the DEAD wave's recorded table list: an " +
    "append-crash followed by a DELETE wave (different table set) " +
    "cannot publish the dead wave's orphaned postings") {
    val sp = spark
    import sp.implicits._
    val dir = corpusDir()
    Dedup.buildContainmentIndex(spark, dir, "ep_rec", nBuckets = 2)
    // dead APPEND wave: stages postings+sets+df+prefixes, writes its
    // phantom rows into postings and sets, dies before the commit
    val e = FormatIO.stageIndexEpoch(spark, "ep_rec",
      Seq("ep_rec_postings", "ep_rec_sets", "ep_rec_df", "ep_rec_prefixes"))
    FormatIO.appendBucketed(spark,
      spark.table("ep_rec_postings").drop("epoch")
        .filter(col("doc_b") === 1L)
        .withColumn("doc_b", lit(999L)).withColumn("epoch", lit(e)),
      "ep_rec_postings")
    FormatIO.appendBucketed(spark,
      spark.table("ep_rec_sets").drop("epoch")
        .filter(col("doc_b") === 1L)
        .withColumn("doc_b", lit(999L)).withColumn("epoch", lit(e)),
      "ep_rec_sets")
    // successor is a DELETE wave staging ONLY {df, tombstones} — before
    // the staged marker recorded table lists, this scrub missed the
    // dead postings/sets and its commit PUBLISHED the phantom doc at
    // epoch e with no df/prefix segments (the torn state the protocol
    // claims to exclude)
    Dedup.deleteFromContainmentIndex(spark, "ep_rec",
      Seq(3L).toDF("doc_id"))
    assert(FormatIO.committedEpoch(spark, "ep_rec") == 1L)
    assert(spark.table("ep_rec_postings")
      .filter(col("doc_b") === 999L).count() == 0L,
      "the dead append's postings are scrubbed via its recorded tables")
    assert(spark.table("ep_rec_sets")
      .filter(col("doc_b") === 999L).count() == 0L)
    val r = Dedup.probeContainmentIndex(spark, "ep_rec", probeBatch())
      .collect()
    assert(!r.exists(_.getLong(1) == 999L),
      "the committed delete wave must not resurrect the phantom doc")
  }

  test("commit discipline: out-of-order commits refuse; a second " +
    "stage at the next epoch is fine after a commit") {
    val dir = corpusDir()
    Dedup.buildMinhashIndex(spark, dir, "ep_mh", nBuckets = 2)
    intercept[IllegalArgumentException] {
      FormatIO.commitIndexEpoch(spark, "ep_mh", 5L)
    }
    val e1 = FormatIO.stageIndexEpoch(spark, "ep_mh", Seq("ep_mh_bands"))
    FormatIO.commitIndexEpoch(spark, "ep_mh", e1)
    assert(FormatIO.committedEpoch(spark, "ep_mh") == 1L)
    val e2 = FormatIO.stageIndexEpoch(spark, "ep_mh", Seq("ep_mh_bands"))
    assert(e2 == 2L)
    FormatIO.commitIndexEpoch(spark, "ep_mh", e2)
    assert(FormatIO.committedEpoch(spark, "ep_mh") == 2L)
  }
}
