package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Semantic checks for D4-style prototypicality diversification —
  * rows-only at the driver (k-means is iterative float work), so these
  * specs carry the correctness story: crafted clusters prove the
  * near-centroid mass drops first, counting proves the exact ⌊ρ·n_c⌋
  * contract, and reruns prove determinism.
  */
class PrototypicalitySpec extends AnyFunSuite {
  import TestSpark._

  /** Two obvious clusters on orthogonal axes: a tight bundle around
    * +x (ids 1-8, tiny angular jitter) and one around +y (ids 11-18),
    * plus one far outlier per cluster (ids 9 and 19, 45°-ish off). */
  private def crafted = {
    val sp = spark
    import sp.implicits._
    def jitter(base: Array[Double], eps: Double, flip: Int) = {
      val v = base.clone(); v(2) = eps * (if (flip % 2 == 0) 1 else -1); v
    }
    val x = Array(1.0, 0.0, 0.0, 0.0)
    val y = Array(0.0, 1.0, 0.0, 0.0)
    val rows =
      (1L to 8L).map(i => i -> jitter(x, 0.01 * ((i % 4) + 1), i.toInt)) ++
        Seq(9L -> Array(1.0, 0.0, 0.9, 0.0)) ++
        (11L to 18L).map(i => i -> jitter(y, 0.01 * ((i % 4) + 1), i.toInt)) ++
        Seq(19L -> Array(0.0, 1.0, 0.0, 0.9))
    rows.toDF("vec_id", "v")
  }

  test("prototypicality: outliers survive, near-centroid mass drops first") {
    val res = Similarity.prototypicalityOn(spark, crafted, rho = 0.25,
      nCentroids = 2, kmeansIters = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(res.size === 18)
    // the two 45°-off outliers are the least prototypical of their
    // clusters and must be kept
    assert(res(9L)._3 && res(19L)._3, s"outliers dropped: $res")
    // each 9-member cluster drops exactly floor(0.25*9)=2, keeps 7
    val byCluster = res.values.groupBy(_._1)
    assert(byCluster.size === 2)
    byCluster.foreach { case (c, ms) =>
      assert(ms.count(!_._3) === 2, s"cluster $c drop count: $ms")
    }
    // dropped members are MORE prototypical than every kept member of
    // their cluster (modulo the rounded-score tie contract)
    byCluster.foreach { case (_, ms) =>
      val dropMin = ms.filter(!_._3).map(_._2).min
      val keepMax = ms.filter(_._3).map(_._2).max
      assert(dropMin >= keepMax - 1e-9, "a kept member outranks a dropped one")
    }
  }

  test("prototypicality: rho=0 keeps everything, rho=1 keeps nothing") {
    val all = Similarity.prototypicalityOn(spark, crafted, 0.0, 2, 2)
    assert(all.filter(!col("kept")).count() === 0L)
    val none = Similarity.prototypicalityOn(spark, crafted, 1.0, 2, 2)
    assert(none.filter(col("kept")).count() === 0L)
  }

  test("prototypicality: deterministic across runs on the real table") {
    val a = Similarity.prototypicality(spark, sf).collect()
    val b = Similarity.prototypicality(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("matryoshka recall: the full-dim row is the identity audit at " +
    "recall 1.0; every recall is a valid hit share; planted " +
    "prefix-coded clusters are already separable at the tiny prefix") {
    val res = Similarity.matryoshkaRecall(spark, sf).collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L, 64L))
    val byDim = res.map(r => r.getLong(0) -> r).toMap
    val full = byDim(64L)
    assert(full.getDouble(4) == 1.0,
      "the max-dim run IS the ground truth: recall exactly 1.0")
    assert(full.getLong(3) == full.getLong(1) * full.getLong(2))
    res.foreach { r =>
      assert(r.getLong(3) >= 0L &&
        r.getLong(3) <= r.getLong(1) * r.getLong(2))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // planted: vectors whose FIRST dims already code the cluster.
    // Three clusters of exactly THREE members with k=2 make the
    // ground-truth top-2 a uniquely determined SET (the two other
    // members) at both the prefix and the full dimension — clusters
    // of four would leave the top-2-of-3 choice to sub-noise ordering
    // that legitimately differs between prefixes
    val sp = spark
    import sp.implicits._
    val vecsDf = (0 until 9).map { i =>
      val cluster = i % 3
      val v = Array.tabulate(8) { d =>
        if (d == cluster) 10.0 + (i / 3) else 0.01 * ((i * 7 + d) % 5) }
      (i.toLong, v)
    }.toDF("vec_id", "v")
    val dirP = java.nio.file.Files.createTempDirectory("graft-mrl").toString
    vecsDf.select(col("vec_id"),
      col("v").cast("array<float>").as("embedding"),
      lit(0).as("label"))
      .write.parquet(s"$dirP/embeddings.parquet")
    val planted = Similarity.matryoshkaRecall(sp, dirP,
      dims = Seq(4, 8), k = 2, panelN = 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(planted(8L) == 1.0)
    assert(planted(4L) == 1.0,
      "cluster-coding prefixes retrieve the full-dim neighbors exactly")
  }

  test("mmr select: lambda=1 is pure relevance ranking; lambda=0.5 on " +
    "a planted two-cluster corpus alternates clusters where pure " +
    "relevance stays home; deterministic rerun") {
    val sp = spark
    import sp.implicits._
    // cluster A hugs the centroid direction, cluster B is orthogonal;
    // the centroid leans toward A, so pure relevance picks all of A
    // first, while MMR's redundancy penalty forces an early B pick
    val vecsDf = (
      (0 until 4).map(i => (i.toLong,
        Array(1.0, 0.001 * i, 0.0, 0.0))) ++
      (4 until 8).map(i => (i.toLong,
        Array(0.0, 0.0, 1.0, 0.001 * i)))).toDF("vec_id", "v")
    val dirM = java.nio.file.Files.createTempDirectory("graft-mmr").toString
    vecsDf.select(col("vec_id"),
      col("v").cast("array<float>").as("embedding"),
      lit(0).as("label"))
      .write.parquet(s"$dirM/embeddings.parquet")
    val pure = Similarity.mmrSelect(sp, dirM, k = 4, lam = 1.0).collect()
    val rels = pure.map(_.getDouble(2))
    assert(rels.zip(rels.tail).forall { case (a, b) => a >= b },
      "lambda=1 must rank by pure relevance")
    val mixed = Similarity.mmrSelect(sp, dirM, k = 4, lam = 0.5).collect()
      .map(_.getLong(1))
    assert(mixed.take(2).map(id => id / 4L).distinct.length == 2,
      "the redundancy penalty pulls in the other cluster by pick 2")
    assert(mixed.take(4).map(id => id / 4L).distinct.length == 2 &&
      mixed.take(4).count(_ < 4L) == 2,
      "lambda=0.5 alternates: two picks from each orthogonal cluster")
    // real data: deterministic rerun, ranks total, scores nonincreasing
    val a = Similarity.mmrSelect(spark, sf).collect()
    val b = Similarity.mmrSelect(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(a.map(_.getLong(0)).toSeq == (1L to a.length.toLong))
    assert(a.length == 8)
  }

  test("knn label check: planted labeled clusters agree 1.0; real-data " +
    "shares are valid and the panel mass adds up") {
    val sp = spark
    import sp.implicits._
    // three orthogonal clusters, label = cluster: every 1-NN stays in
    // cluster, so agreement is exactly 1.0 per label
    val vecsDf = (0 until 9).map { i =>
      val cluster = i % 3
      val v = Array.tabulate(8) { d =>
        if (d == cluster) 10.0 + (i / 3) else 0.01 * ((i * 7 + d) % 5) }
      (i.toLong, v, cluster)
    }.toDF("vec_id", "v", "label")
    val dirK = java.nio.file.Files.createTempDirectory("graft-knn").toString
    vecsDf.select(col("vec_id"),
      col("v").cast("array<float>").as("embedding"), col("label"))
      .write.parquet(s"$dirK/embeddings.parquet")
    val planted = Similarity.knnLabelCheck(sp, dirK, panelN = 9).collect()
    assert(planted.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    planted.foreach { r =>
      assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
      assert(r.getDouble(3) == 1.0,
        "orthogonal labeled clusters must 1-NN-agree perfectly")
    }
    // real data: shares bounded, hits <= queries, panel mass = panelN
    val res = Similarity.knnLabelCheck(spark, sf).collect()
    assert(res.nonEmpty)
    assert(res.map(_.getLong(1)).sum == 48L, "one row of mass per panel query")
    res.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
