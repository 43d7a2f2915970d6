package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Skew}

/** SKEW STRESS for the band/bucket joins — measured evidence for the
  * standing claim that "bucket skew tracks true duplicate mass", and
  * for WHICH mitigation applies to which join shape when a bucket does
  * go hot (boilerplate template family: every copy shares every band
  * signature):
  *
  *  - the one-sided "new crawl vs corpus" join (probe ⋈ index): AQE
  *    splits the hot corpus-side partition across its map outputs —
  *    task time stays bounded with no code change;
  *  - the SELF-join (corpus ⋈ corpus candidate generation): the hot
  *    partition is skewed on BOTH sides, which AQE refuses to split
  *    (splitting both sides of one partition would need a cartesian
  *    sub-expansion) — [[Skew.saltedJoin]] is the documented fallback,
  *    and the hot-bucket OUTPUT is true duplicate mass either way.
  *
  * The crafted corpus plants a template family whose band buckets are
  * ~100× the median bucket — the adversarial shape for every equi-join
  * blocking scheme (MinHash bands, deletion variants, prefix
  * postings). */
class SkewStressSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  /** Crafted corpus: `nHot` exact copies of one ~60-token boilerplate
    * page (one template family → every copy lands in the SAME four band
    * buckets) over `nBg` distinct background docs. Written as parquet
    * across several files so a skewed reduce partition has multiple map
    * outputs to split across. */
  private def craftedDir(nHot: Int, nBg: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val boiler = (1 to 60).map(i => s"boiler$i").mkString(" ")
    val hot = spark.range(nHot).select(col("id").as("doc_id"),
      lit(boiler).as("text"))
    val bg = spark.range(nBg).select((col("id") + nHot).as("doc_id"),
      concat_ws(" ", (0 to 40).map(j =>
        concat(lit(s"w$j"), ((col("id") * 41 + j) % 9999).cast("string"))): _*)
        .as("text"))
    hot.unionByName(bg).repartition(8)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** The skew-relevant session confs, applied for `body` and restored
    * after: broadcast OFF at plan time AND AQE time (the 100 TB regime:
    * neither band side fits), fine-grained shuffle so a hot bucket
    * stands out from the median, and production-shaped skew thresholds
    * scaled down to the crafted corpus. */
  private def withSkewConfs[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("one-sided crawl-vs-corpus band join: AQE splits the hot " +
    "corpus-side partition (skewed shuffle read) and results equal " +
    "the unstressed path") {
    val corpusDir = craftedDir(600, 600)
    val probeDir = craftedDir(10, 40)
    // band relations through the public surface: each corpus's band
    // index, read back as plain (checkpointed) frames so BOTH sides
    // shuffle for the join — the un-indexed crawl-vs-corpus shape
    Dedup.buildMinhashIndex(spark, corpusDir, "skew_corpus", nBuckets = 4)
    Dedup.buildMinhashIndex(spark, probeDir, "skew_probe", nBuckets = 4)
    def bandsOf(table: String, side: String): DataFrame =
      spark.table(table)
        .select(col("doc_id").as(s"doc_$side"), col("band_id"), col("band_sig"))
        .localCheckpoint()
    val corpus = bandsOf("skew_corpus_bands", "b")
    val probe = bandsOf("skew_probe_bands", "a")
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reference = pairs(probe.join(corpus, Seq("band_id", "band_sig")))
    assert(reference.size >= 10 * 600,
      "every probe-side boilerplate copy must hit the whole hot family")
    val (got, plan) = withSkewConfs {
      val joined = probe.join(corpus, Seq("band_id", "band_sig"))
        .select("doc_a", "doc_b").distinct()
      val g = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // inspect the EXECUTED frame — AQE finalizes its plan (and its
      // skew decisions) only on the query that actually ran
      (g, joined.queryExecution.executedPlan.toString)
    }
    assert(got == reference,
      "skew-split execution must produce exactly the unstressed pairs")
    assert(plan.contains("AQEShuffleRead"),
      s"expected an adaptive shuffle read in:\n$plan")
    assert(plan.toLowerCase.contains("skewed"),
      s"expected AQE to mark/split the hot corpus partition in:\n$plan")
  }

  test("self-join on the hot corpus: results survive the forced-shuffle " +
    "path unchanged, and the hot-bucket volume IS the planted duplicate " +
    "mass (candidate volume tracks true duplicates, not n^2)") {
    val nHot = 300
    val dir = craftedDir(nHot, 1500)
    val docs = graft.sources.Tables.documents(spark, dir)
    val reference = Dedup.minhashPairsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the template family must surface whole; background contributes
    // nothing (distinct texts share no band), so candidate volume ==
    // planted duplicate mass
    val hotPairs = (0 until nHot).combinations(2).size
    assert(reference.size == hotPairs,
      s"candidate volume must equal planted mass: ${reference.size} vs $hotPairs")
    // forced off broadcast: the self-join's hot partition is skewed on
    // BOTH sides, so AQE cannot split it — correctness must hold on the
    // plain shuffle path (and the mitigation is salting, next test)
    val got = withSkewConfs {
      Dedup.minhashPairsOf(graft.sources.Tables.documents(spark, dir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == reference,
      "forced-shuffle self-join must produce exactly the broadcast-path pairs")
  }

  test("hot duplicated window across ~half the corpus: the suffix-span " +
    "mark's semi-join is AQE-skew-split (bounded per-task input) and " +
    "the spans equal the unstressed run — the shape a count-over-window " +
    "mark could NOT survive (WindowExec is unsplittable)") {
    // 50000 of 51000 docs share ONE exact 8-token boilerplate window →
    // a single (k1, k2) equality class carrying 50000 rows, all hashed
    // to ONE reduce key — the worst case for any keyed partitioning
    // (sized so the hot class dwarfs the median partition even after
    // shuffle compression folds its near-identical rows away — at 10k
    // copies LZ4 shrinks the class below the skew threshold)
    val boiler = (1 to 8).map(i => s"hotw$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-sfx").toString
    val hot = spark.range(50000).select(col("id").as("doc_id"),
      concat(lit("u"), col("id").cast("string"), lit(" v"),
        col("id").cast("string"), lit(" " + boiler)).as("text"))
    val bg = spark.range(1000).select((col("id") + 50000).as("doc_id"),
      concat_ws(" ", (0 to 7).map(j =>
        concat(lit(s"bg$j"), ((col("id") * 23 + j) % 99991).cast("string"))): _*)
        .as("text"))
    hot.unionByName(bg).repartition(8).write.parquet(s"$dir/documents.parquet")
    val reference = graft.operators.Suffix.suffixSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every hot doc's boiler run must span whole (positions 2..9)
    assert(reference.count(_._3 == 8L) == 50000,
      s"expected 50000 planted 8-token spans, got ${reference.size} spans")
    val (got, plan) = withSkewConfs {
      val df = graft.operators.Suffix.suffixSpans(spark, dir)
      val g = df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2))).toSet
      (g, df.queryExecution.executedPlan.toString)
    }
    assert(got == reference,
      "skew-split suffix marking must produce exactly the unstressed spans")
    assert(plan.contains("AQEShuffleRead"),
      s"expected an adaptive shuffle read in:\n$plan")
    assert(plan.toLowerCase.contains("skewed"),
      s"expected AQE to split the hot class partition in:\n$plan")
  }

  test("salted-join fallback on the hot corpus equals the plain band " +
    "join (the self-join mitigation AQE cannot provide)") {
    val dir = craftedDir(200, 800)
    Dedup.buildMinhashIndex(spark, dir, "skew_mh", nBuckets = 4)
    val bands = spark.table("skew_mh_bands")
      .select(col("doc_id"), col("band_key"))
    val a = bands.select(col("doc_id").as("doc_a"), col("band_key"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band_key"))
    val plain = a.join(b, Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val salted = Skew.saltedJoin(a, b, "band_key", salt = 8)
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    assert(salted.exceptAll(plain).count() == 0
      && plain.exceptAll(salted).count() == 0,
      "salted band join must equal the plain band join on the hot corpus")
  }
}
