package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** [[Similarity.checkIvfRecall]] — the codebook-staleness alarm. The
  * planted scenario: an index trained on two clean axis clusters, then
  * an appended cluster of TWIN pairs engineered to straddle the frozen
  * centroid boundary (each twin lands in the opposite posting list,
  * and each point's true 1-NN is its twin), so nProbe=1 recall
  * provably drops to (|A∪B| hits)/(all) = 2/3; a retrained index whose
  * seeds cover all three clusters puts every twin pair back in one
  * list and recall recovers to 1.0. All geometry is exact-margin
  * deterministic (assignment margins 2ε, cosine gaps ≥ 0.03 — far
  * above float/double noise). */
class IvfRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  private val eps = 0.01f
  // twin pair j: (0.7+ε, 0.7−ε, δ_j, 0) and (0.7−ε, 0.7+ε, δ_j, 0) —
  // twin cosine ≈ 0.9996 (the global 1-NN), same-side cross-pair
  // cosine ≤ 0.97, cosine to either axis cluster ≤ 0.69
  private def twinPair(j: Int): Seq[Array[Float]] = {
    val d = (0.3 + 0.3 * j).toFloat
    Seq(Array(0.7f + eps, 0.7f - eps, d, 0f),
      Array(0.7f - eps, 0.7f + eps, d, 0f))
  }
  private val a = Array(1f, 0f, 0f, 0f)
  private val b = Array(0f, 1f, 0f, 0f)

  private def writeEmb(rows: Seq[(Long, Array[Float])]): String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfrec").toString
    rows.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted drift: clean build reads recall 1.0; an appended " +
    "boundary-straddling cluster drops sampled recall below target " +
    "and the probe recommends retrain; the retrained index recovers") {
    val sp = spark
    import sp.implicits._
    // build corpus: 8 copies of each axis vector, seeds (2 smallest
    // ids) one per cluster -> the 2-centroid codebook is exact
    val base = (0 until 8).flatMap(i =>
      Seq((1L + 3 * i, a), (2L + 3 * i, b)))
    val dir = writeEmb(base)
    Similarity.buildIvfIndex(spark, dir, "ivfrec", nCentroids = 2,
      kmeansIters = 2, nBuckets = 2)
    val clean = Similarity.checkIvfRecall(spark, "ivfrec",
      target = 0.9, k = 1, nProbe = 1, sampleN = 64).collect().head
    assert(clean.getAs[Double]("recall") == 1.0 &&
      !clean.getAs[Boolean]("retrain_recommended"),
      s"clean index must read full recall: $clean")

    // append 4 twin pairs: each twin assigns to the OPPOSITE frozen
    // list (margin 2ε), while being its sibling's true 1-NN
    val twins = (0 until 4).flatMap { j =>
      val Seq(u, v) = twinPair(j)
      Seq((101L + 2 * j, u), (102L + 2 * j, v))
    }
    Similarity.appendToIvfIndex(spark, "ivfrec",
      twins.map { case (id, v) => (id, v.map(_.toDouble).toSeq) }
        .toDF("vec_id", "v"))
    val drifted = Similarity.checkIvfRecall(spark, "ivfrec",
      target = 0.9, k = 1, nProbe = 1, sampleN = 64).collect().head
    // 16 axis queries hit (1-NN in own list), 8 twin queries miss
    // (1-NN sits in the other list): recall = 16/24
    assert(drifted.getAs[Long]("n_exact") == 24L)
    assert(drifted.getAs[Double]("recall") == 0.6667,
      s"drifted recall must be exactly 16/24: $drifted")
    assert(drifted.getAs[Boolean]("retrain_recommended"),
      "the probe must raise the retrain alarm")

    // retrain: union corpus with seed ids covering ALL THREE clusters
    // (1 -> axis A, 2 -> axis B, 3 -> twin cluster); Lloyd converges
    // immediately and every twin pair shares one posting list
    val union = base ++ (0 until 4).flatMap { j =>
      val Seq(u, v) = twinPair(j)
      Seq((3L + 6 * j, u), (6L + 6 * j, v))
    }
    val dir2 = writeEmb(union)
    Similarity.buildIvfIndex(spark, dir2, "ivfrec2", nCentroids = 3,
      kmeansIters = 3, nBuckets = 2)
    val retrained = Similarity.checkIvfRecall(spark, "ivfrec2",
      target = 0.9, k = 1, nProbe = 1, sampleN = 64).collect().head
    assert(retrained.getAs[Double]("recall") == 1.0 &&
      !retrained.getAs[Boolean]("retrain_recommended"),
      s"the retrained codebook must recover full recall: $retrained")
  }

  test("in-place retrain: restores planted recall decay under one rebase " +
    "commit; a probe pinned mid-retrain reads the old codebook+postings " +
    "consistently; tombstoned vectors are purged; stale generations " +
    "reclaim without changing probes") {
    val sp = spark
    import sp.implicits._
    import graft.sources.FormatIO
    // base: exact seeds a (id 1) and b (id 2) + copies at ids 21+;
    // twins appended later at ids 3..10, so a 3-centroid RETRAIN seeds
    // (3 smallest live ids) cover a, b, AND the twin cluster
    val base = Seq((1L, a), (2L, b)) ++
      (0 until 7).flatMap(i => Seq((21L + 3 * i, a), (22L + 3 * i, b)))
    val dir = writeEmb(base)
    Similarity.buildIvfIndex(spark, dir, "ivfret", nCentroids = 2,
      kmeansIters = 2, nBuckets = 2)
    val twins = (0 until 4).flatMap { j =>
      val Seq(u, v) = twinPair(j)
      Seq((3L + 2 * j, u), (4L + 2 * j, v))
    }
    Similarity.appendToIvfIndex(spark, "ivfret",
      twins.map { case (id, v) => (id, v.map(_.toDouble).toSeq) }
        .toDF("vec_id", "v"))
    // one erased vector: retrain must not resurrect it (and must purge
    // its postings physically — retrain reads only live rows)
    Similarity.deleteFromIvfIndex(spark, "ivfret",
      Seq(39L).toDF("vec_id"))
    val drifted = Similarity.checkIvfRecall(spark, "ivfret",
      target = 0.9, k = 1, nProbe = 1, sampleN = 64).collect().head
    assert(drifted.getAs[Boolean]("retrain_recommended"),
      s"planted drift must raise the alarm: $drifted")

    // two-phase retrain: stage first, probe while UNCOMMITTED — the
    // pinned probe must read the old generation bit-identically
    val queries = twins.take(2)
      .map { case (id, v) => (id, v.map(_.toDouble).toSeq) }
      .toDF("vec_id", "v").localCheckpoint()
    def probeRows() = Similarity
      .probeIvfIndexOn(spark, "ivfret", queries, k = 1, nProbe = 1)
      .collect().map(_.toString).sorted.toSeq
    val before = probeRows()
    val e = Similarity.stageRetrainIvf(spark, "ivfret", nCentroids = 3,
      kmeansIters = 3)
    assert(probeRows() == before,
      "a probe pinned mid-retrain must read the old codebook+postings")
    FormatIO.commitIndexEpoch(spark, "ivfret", e, rebase = true)

    // post-commit: recall recovers (twin pairs share one list under the
    // 3-centroid codebook), the alarm clears, the tombstoned vector is
    // gone from the live generation
    val after = Similarity.checkIvfRecall(spark, "ivfret",
      target = 0.9, k = 1, nProbe = 1, sampleN = 64).collect().head
    assert(after.getAs[Double]("recall") == 1.0 &&
      !after.getAs[Boolean]("retrain_recommended"),
      s"retrain must restore sampled recall: $after")
    val pin = FormatIO.committedEpoch(spark, "ivfret")
    val gen = FormatIO.rebaseEpochOf(spark, "ivfret", pin)
    assert(gen == e, "the retrain epoch is the current rebase cut")
    assert(FormatIO.pinnedSince(spark, "ivfret_postings", gen, pin)
      .filter(col("id_b") === 39L).count() == 0L,
      "retrain purges tombstoned postings from the new generation")

    // stale-generation reclamation: pre-rebase rows drop from BOTH the
    // postings and the codebook, probes hold bit-exactly
    val probeAfter = probeRows()
    Similarity.purgeIvfStaleGenerations(spark, "ivfret")
    assert(spark.table("ivfret_postings")
      .filter(col("epoch") < gen).count() == 0L,
      "pre-rebase posting generations are physically reclaimed")
    assert(spark.table("ivfret_centroids")
      .filter(col("epoch") =!= gen).count() == 0L,
      "superseded codebook generations are physically reclaimed")
    assert(probeRows() == probeAfter,
      "generation purge must not change probe results")
  }
}
