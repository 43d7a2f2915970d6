package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The IVF-PQ composed index ([[Similarity.buildIvfPqIndex]]): posting
  * lists carry PQ CODES instead of raw vectors; probes score by ADC
  * tables; rerank refines from the `_vecs` side table.
  *
  * Fixture discipline: a LOSSLESS planted corpus — every distinct
  * subvector is covered by its own PQ codeword (≤ K distinct values
  * per subspace, all seeded, so Lloyd converges at zero reconstruction
  * error) — makes ADC scoring EXACTLY the true dot product, so the
  * compressed probe must reproduce the raw-vector IVF probe rank for
  * rank. Drift/retrain reuses IvfRecallSpec's boundary-straddling twin
  * geometry (margins far above double noise). */
class IvfPqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  private def writeEmb(rows: Seq[(Long, Array[Double])]): String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    rows.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def norm(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** 12 unit vectors, 3 clusters × 4, dim 4 (m=2 → subspaces (1,2) and
    * (3,4)): cluster A = (1, xᵢ, 0, 0), B = (xᵢ, 1, 0, 0), C =
    * (0, 0, 1, xᵢ) with xᵢ ∈ {0, .01, .02, .03} — 9 distinct
    * subvectors in subspace 0 and 5 in subspace 1, every one covered
    * by a K=16 codebook seeded from all 12 rows. Ids 1,2,3 are one
    * per cluster so a 3-centroid IVF seeds every cluster. */
  private def losslessCorpus: Seq[(Long, Array[Double])] = {
    val xs = Seq(0.0, 0.01, 0.02, 0.03)
    val a = xs.map(x => norm(Array(1.0, x, 0.0, 0.0)))
    val b = xs.map(x => norm(Array(x, 1.0, 0.0, 0.0)))
    val c = xs.map(x => norm(Array(0.0, 0.0, 1.0, x)))
    Seq(1L -> a(0), 2L -> b(0), 3L -> c(0),
      4L -> a(1), 5L -> a(2), 6L -> a(3),
      7L -> b(1), 8L -> b(2), 9L -> b(3),
      10L -> c(1), 11L -> c(2), 12L -> c(3))
  }

  test("lossless fixture: the ADC probe reproduces the raw-vector IVF " +
    "probe rank for rank (PQ codewords cover every subvector, so ADC " +
    "IS the exact dot product); the rerank face agrees; the audit " +
    "reads recall 1.0 on both faces") {
    val sp = spark
    import sp.implicits._
    val dir = writeEmb(losslessCorpus)
    Similarity.buildIvfIndex(spark, dir, "ivfpq_raw", nCentroids = 3,
      kmeansIters = 2, nBuckets = 2)
    Similarity.buildIvfPqIndex(spark, dir, "ivfpq_pq", nCentroids = 3,
      kmeansIters = 2, nBuckets = 2, m = 2, codebookK = 16, pqIters = 2)
    val queries = losslessCorpus
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v")
    def ranksOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select(col("id_a"), col("id_b"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val raw = ranksOf(Similarity.probeIvfIndexOn(spark, "ivfpq_raw",
      queries, k = 3, nProbe = 2))
    val adc = ranksOf(Similarity.probeIvfPqIndex(spark, "ivfpq_pq",
      queries, k = 3, nProbe = 2))
    val refined = ranksOf(Similarity.probeIvfPqIndex(spark, "ivfpq_pq",
      queries, k = 3, nProbe = 2, rerank = 6))
    assert(raw.nonEmpty)
    assert(adc == raw,
      s"lossless ADC probe must equal the raw-vector probe:\n" +
        s"adc-only=${(adc -- raw).toSeq.sorted}\nraw-only=${(raw -- adc).toSeq.sorted}")
    assert(refined == raw, "the rerank face must agree on lossless data")
    // ADC scores equal exact cosine up to sub-rounding float noise
    val scoreGap = Similarity.probeIvfPqIndex(spark, "ivfpq_pq",
      queries, k = 3, nProbe = 2)
      .select(col("id_a"), col("id_b"), col("score"))
      .join(Similarity.probeIvfIndexOn(spark, "ivfpq_raw", queries,
        k = 3, nProbe = 2)
        .select(col("id_a"), col("id_b"), col("cosine")),
        Seq("id_a", "id_b"))
      .select(max(abs(col("score") - col("cosine")))).collect()
      .head.getDouble(0)
    assert(scoreGap < 1e-9, s"lossless ADC score drift: $scoreGap")
    val audit = Similarity.checkIvfPqRecall(spark, "ivfpq_pq",
      target = 0.9, k = 1, nProbe = 1).collect().head
    assert(audit.getAs[Double]("recall_adc") == 1.0 &&
      audit.getAs[Double]("recall_rerank") == 1.0 &&
      !audit.getAs[Boolean]("retrain_recommended"),
      s"lossless audit must read 1.0/1.0: $audit")
  }

  // the IvfRecallSpec twin geometry: pair j straddles the frozen
  // centroid boundary, each twin's true 1-NN is its sibling
  private val eps = 0.01
  private def twinPair(j: Int): Seq[Array[Double]] = {
    val d = 0.3 + 0.3 * j
    Seq(norm(Array(0.7 + eps, 0.7 - eps, d, 0.0)),
      norm(Array(0.7 - eps, 0.7 + eps, d, 0.0)))
  }
  private val axisA = Array(1.0, 0.0, 0.0, 0.0)
  private val axisB = Array(0.0, 1.0, 0.0, 0.0)

  test("planted drift + in-place retrain: appended straddling twins " +
    "drop the refined recall and raise the alarm; retrain (new IVF " +
    "centroids + new PQ codebooks + re-encoded postings under ONE " +
    "rebase commit) recovers 1.0/1.0; a probe pinned mid-retrain reads " +
    "the old generation; tombstones are honored and purge changes " +
    "nothing") {
    val sp = spark
    import sp.implicits._
    import graft.sources.FormatIO
    // base: seeds 1=a, 2=b; copies at 21+; twins later at 3..10 so a
    // 3-centroid retrain's seeds (3 smallest live ids) cover all three
    // clusters
    val base = Seq((1L, axisA), (2L, axisB)) ++
      (0 until 7).flatMap(i => Seq((21L + 3 * i, axisA), (22L + 3 * i, axisB)))
    val dir = writeEmb(base)
    Similarity.buildIvfPqIndex(spark, dir, "ivfpq_ret", nCentroids = 2,
      kmeansIters = 2, nBuckets = 2, m = 2, codebookK = 16, pqIters = 2)
    val clean = Similarity.checkIvfPqRecall(spark, "ivfpq_ret",
      target = 0.9, k = 1, nProbe = 1).collect().head
    assert(clean.getAs[Double]("recall_rerank") == 1.0 &&
      !clean.getAs[Boolean]("retrain_recommended"),
      s"clean index must read full refined recall: $clean")

    val twins = (0 until 4).flatMap { j =>
      val Seq(u, v) = twinPair(j)
      Seq((3L + 2 * j, u), (4L + 2 * j, v))
    }
    Similarity.appendToIvfPqIndex(spark, "ivfpq_ret",
      twins.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v"))
    val drifted = Similarity.checkIvfPqRecall(spark, "ivfpq_ret",
      target = 0.9, k = 1, nProbe = 1).collect().head
    assert(drifted.getAs[Double]("recall_rerank") < 0.9,
      s"straddling twins must drop the refined recall: $drifted")
    assert(drifted.getAs[Boolean]("retrain_recommended"),
      "the audit must raise the retrain alarm")

    // tombstone one axis copy: retrain must not resurrect it
    Similarity.deleteFromIvfPqIndex(spark, "ivfpq_ret",
      Seq(39L).toDF("vec_id"))

    // two-phase retrain: a probe pinned BETWEEN stage and commit reads
    // the old codebooks with the old postings, consistently
    val qTwin = Seq((3L, twinPair(0).head.toSeq)).toDF("vec_id", "v")
    val preStage = Similarity.probeIvfPqIndex(spark, "ivfpq_ret", qTwin,
      k = 1, nProbe = 1).collect().map(_.getLong(1)).toSeq
    val e = Similarity.stageRetrainIvfPq(spark, "ivfpq_ret",
      nCentroids = 3, kmeansIters = 3, m = 2, codebookK = 16, pqIters = 2)
    val midStage = Similarity.probeIvfPqIndex(spark, "ivfpq_ret", qTwin,
      k = 1, nProbe = 1).collect().map(_.getLong(1)).toSeq
    assert(midStage == preStage,
      "a probe racing the staged (uncommitted) retrain must read the " +
        s"old generation: pre=$preStage mid=$midStage")
    FormatIO.commitIndexEpoch(spark, "ivfpq_ret", e, rebase = true)

    val retrained = Similarity.checkIvfPqRecall(spark, "ivfpq_ret",
      target = 0.9, k = 1, nProbe = 1).collect().head
    assert(retrained.getAs[Double]("recall_adc") == 1.0 &&
      retrained.getAs[Double]("recall_rerank") == 1.0 &&
      !retrained.getAs[Boolean]("retrain_recommended"),
      s"retrained index must recover 1.0/1.0: $retrained")
    // the twin's 1-NN is now its sibling, found in ONE probe
    val postRetrain = Similarity.probeIvfPqIndex(spark, "ivfpq_ret",
      qTwin, k = 1, nProbe = 1).collect().map(_.getLong(1)).toSeq
    assert(postRetrain == Seq(4L),
      s"post-retrain the twin must find its sibling: $postRetrain")
    // tombstoned id 39 stays dead across the retrain
    val all = Similarity.probeIvfPqIndex(spark, "ivfpq_ret",
      base.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v"),
      k = 3, nProbe = 2).collect().map(_.getLong(1)).toSet
    assert(!all.contains(39L), "retrain resurrected a tombstoned vector")

    // purge (stale generations + tombstones) must not change probes
    val before = Similarity.probeIvfPqIndex(spark, "ivfpq_ret",
      base.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v"),
      k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    Similarity.purgeIvfPqStaleGenerations(spark, "ivfpq_ret")
    Similarity.purgeIvfPqTombstones(spark, "ivfpq_ret")
    val after = Similarity.probeIvfPqIndex(spark, "ivfpq_ret",
      base.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v"),
      k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(after == before, "purge changed probe results")
  }

  test("postings store codes, not vectors: the compressed posting row " +
    "is m longs against dim doubles on the raw index — the memory " +
    "story the composition exists for") {
    val postings = spark.table("ivfpq_pq_postings")
    val schema = postings.schema.fields.map(f =>
      f.name -> f.dataType.simpleString).toMap
    assert(schema("codes") == "array<bigint>",
      s"postings must carry PQ codes: $schema")
    assert(!schema.contains("vb"),
      "the compressed postings must NOT carry raw vectors")
    val m = postings.select(size(col("codes"))).limit(1).collect()
      .head.getInt(0)
    assert(m == 2, s"m=2 codes per posting, got $m")
    // raw vectors live ONLY in the rerank side table
    val vecs = spark.table("ivfpq_pq_vecs").schema.fieldNames.toSet
    assert(vecs.contains("vb"))
  }
}
