package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Embeddings

/** Distributed PCA: moment aggregation + driver eigensolve +
  * broadcast-literal projection. No oracle can hash-check an
  * eigenbasis (sign/rotation freedom), so the spec pins the linear
  * algebra itself. */
class EmbeddingsSpec extends AnyFunSuite {
  import TestSpark._

  private val dim = 64

  test("jacobi eigensolver: orthonormal basis, descending eigenvalues, " +
    "reconstructs the matrix") {
    // small symmetric matrix with known structure
    val rng = new scala.util.Random(7)
    val b = Array.fill(6, 6)(rng.nextGaussian())
    val m = Array.tabulate(6, 6)((i, j) =>
      (0 until 6).map(k => b(i)(k) * b(j)(k)).sum) // B·Bᵀ: symmetric PSD
    val (vals, vecs) = Embeddings.jacobiEigen(m)
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-9), "descending")
    assert(vals.forall(_ >= -1e-9), "PSD input must give nonneg eigenvalues")
    for (i <- 0 until 6; j <- 0 until 6) {
      val dot = (0 until 6).map(k => vecs(i)(k) * vecs(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8,
        s"eigenvectors not orthonormal at ($i,$j): $dot")
    }
    // Σ λ_k v_k v_kᵀ == M
    for (i <- 0 until 6; j <- 0 until 6) {
      val rec = (0 until 6).map(k => vals(k) * vecs(k)(i) * vecs(k)(j)).sum
      assert(math.abs(rec - m(i)(j)) < 1e-7, s"reconstruction off at ($i,$j)")
    }
  }

  test("pca fit: component variances match eigenvalues, total variance " +
    "preserved, projections deterministic") {
    val (mu, vals, comps) = Embeddings.pcaFit(spark, sf, dim)
    assert(vals.take(8).forall(_ > 0.0))
    // total variance: Σ eigenvalues == Σ per-coordinate sample variance
    val data = graft.sources.Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = data.length
    val totalVar = (0 until dim).map { d =>
      val m = data.map(_(d)).sum / n
      data.map(x => (x(d) - m) * (x(d) - m)).sum / (n - 1)
    }.sum
    assert(math.abs(vals.sum - totalVar) / totalVar < 1e-8,
      s"eigenvalue sum ${vals.sum} != total variance $totalVar")
    // sample variance along component k equals eigenvalue k
    for (k <- 0 until 3) {
      val proj = data.map(x =>
        (0 until dim).map(d => (x(d) - mu(d)) * comps(k)(d)).sum)
      val pm = proj.sum / n
      val pv = proj.map(p => (p - pm) * (p - pm)).sum / (n - 1)
      assert(math.abs(pv - vals(k)) / vals(k) < 1e-6,
        s"component $k variance $pv != eigenvalue ${vals(k)}")
    }
    // determinism: a second fit is bit-identical
    val (mu2, vals2, comps2) = Embeddings.pcaFit(spark, sf, dim)
    assert(mu.sameElements(mu2) && vals.sameElements(vals2) &&
      comps.zip(comps2).forall { case (a, b) => a.sameElements(b) })
  }

  test("pca projection query: r coords per vector, explained variance " +
    "in (0,1], matches the driver-side projection") {
    val out = Embeddings.pcaProject(spark, sf, r = 4, dim = dim).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1).split(",", -1).length == 4))
    val ve = out.head.getDouble(2)
    assert(ve > 0.0 && ve <= 1.0)
    // cross-check one row against the driver-side linear algebra
    val (mu, _, comps) = Embeddings.pcaFit(spark, sf, dim)
    val first = out.minBy(_.getLong(0))
    val raw = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === first.getLong(0))
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val expect = (0 until 4).map { k =>
      val p = (0 until dim).map(d => (raw(d) - mu(d)) * comps(k)(d)).sum
      math.round(p * 1e6) / 1e6
    }
    val got = first.getString(1).split(",", -1).toSeq.map(_.toDouble)
    expect.zip(got).foreach { case (e, g) =>
      assert(math.abs(e - g) < 2e-6, s"projection mismatch: $e vs $g")
    }
  }

  test("centroid outliers: integer-exact distances agree with the " +
    "straightforward double-precision centroid distance ranking") {
    import org.apache.spark.sql.functions._
    val got = Embeddings.embedOutliers(spark, sf, topN = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 30)
    // independent recount on the quantized grid, driver-side
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1000 + 0.5).toLong)
    }
    val n = q.length.toLong
    val dims = q.head._2.length
    val sums = Array.tabulate(dims)(d => q.map(_._2(d)).sum)
    val expect = q.map { case (id, qs) =>
      id -> Array.tabulate(dims)(d => n * qs(d) - sums(d))
        .map(x => x * x).sum
    }.toMap
    for ((id, d2) <- got) assert(expect(id) == d2,
      s"vec $id: engine $d2 vs recount ${expect(id)}")
    // and the cut really is the top of the ranking
    val cutoff = got.map(_._2).min
    assert(expect.values.count(_ > cutoff) < 30)
  }

  test("k-center select: planted orthogonal clusters are each covered " +
    "once, picks are farthest-first, and the real path runs") {
    val sp = spark
    import sp.implicits._
    // three tight clusters on orthogonal axes; k=3 must take exactly
    // one point from each (farthest-first covers before it refines)
    def jig(i: Int) = 0.001 * i // tiny within-cluster jitter
    val pts = (1 to 5).map(i => (i.toLong, Array(1.0, jig(i), 0.0))) ++
      (11 to 15).map(i => (i.toLong, Array(0.0, 1.0, jig(i - 10)))) ++
      (21 to 25).map(i => (i.toLong, Array(jig(i - 20), 0.0, 1.0)))
    val normed = pts.toDF("vec_id", "v")
      .select(col("vec_id"), expr(
        "transform(v, x -> x / sqrt(aggregate(v, 0D, (acc, y) -> acc + y * y)))")
        .as("vn"))
    val sel = graft.operators.Similarity
      .kCenterSelectOn(sp, normed, k = 3).collect()
    assert(sel.length == 3)
    assert(sel.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(sel.head.getLong(1) == 1L, "seed is the min vec_id")
    val clusters = sel.map(_.getLong(1) / 10L).toSet
    assert(clusters == Set(0L, 1L, 2L), s"one pick per cluster: $clusters")
    // farthest-first: selection distances are nonincreasing
    val ds = sel.tail.map(_.getDouble(2))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    assert(ds.forall(d => d > 0.9 && d <= 1.0001), "orthogonal picks")
    // real embeddings: k rows, distinct ids, deterministic rerun
    val real = graft.operators.Similarity.kCenterSelect(spark, sf, k = 4)
      .collect()
    assert(real.length == 4)
    assert(real.map(_.getLong(1)).distinct.length == 4)
    val rerun = graft.operators.Similarity.kCenterSelect(spark, sf, k = 4)
      .collect()
    assert(real.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      rerun.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "selection is deterministic")
  }

  test("label balance: counts recount, shares sum to 1, the majority " +
    "class reads ratio 1.0") {
    import graft.operators.Embeddings
    val res = Embeddings.labelBalance(spark, sf).collect()
    assert(res.nonEmpty)
    val truth = graft.sources.Tables.embeddings(spark, sf)
      .collect().map(_.getAs[Int]("label").toLong)
      .groupBy(identity).map { case (l, xs) => l -> xs.length.toLong }
    assert(res.map(r => r.getLong(0) -> r.getLong(1)).toMap == truth)
    val total = truth.values.sum
    res.foreach { r =>
      assert(r.getLong(2) == total)
      assert(math.abs(r.getDouble(3) - r.getLong(1).toDouble / total) < 1e-6)
    }
    assert(math.abs(res.map(_.getDouble(3)).sum - 1.0) < 1e-4,
      "shares sum to 1 up to output rounding")
    assert(res.map(_.getDouble(4)).max == 1.0,
      "the majority class is its own reference")
  }

  test("label centroid drift: crafted orthogonal labels close by hand; " +
    "real-data moments obey the sum-of-dots identity") {
    val sp = spark
    import sp.implicits._
    val dirC = java.nio.file.Files.createTempDirectory("graft-lcd").toString
    // label 0 mass on axis 1, label 1 on axis 2; scale = 127/127 = 1,
    // so quantized components are the raw integers
    Seq((1L, Array(127f, 0f, 0f, 0f), 0),
      (2L, Array(127f, 0f, 0f, 0f), 0),
      (3L, Array(0f, 127f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dirC/embeddings.parquet")
    val res = Embeddings.labelCentroidDrift(sp, dirC).collect()
      .map(r => r.getLong(0) -> r).toMap
    // label sums: s0 = (254,0,0,0), s1 = (0,127,0,0); g = (254,127,0,0)
    // ng2 = 254^2 + 127^2 = 80645
    val r0 = res(0L)
    assert(r0.getLong(1) == 2L && r0.getLong(2) == 254L * 254L &&
      r0.getLong(3) == 254L * 254L && r0.getLong(4) == 80645L)
    assert(r0.getDouble(5) ==
      BigDecimal(64516.0 / (math.sqrt(64516.0) * math.sqrt(80645.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val r1 = res(1L)
    assert(r1.getLong(2) == 127L * 127L && r1.getLong(3) == 127L * 127L)
    // real data: sum of per-label dots IS the global norm (sum_l s_l = g),
    // and every row carries the same global norm
    val real = Embeddings.labelCentroidDrift(spark, sf).collect()
    assert(real.nonEmpty)
    val ng2 = real.head.getLong(4)
    assert(real.forall(_.getLong(4) == ng2))
    assert(real.map(_.getLong(2)).sum == ng2,
      "sum of label-vs-global dots must equal the global norm-squared")
    assert(real.forall(r => r.getDouble(5) >= -1.000001 &&
      r.getDouble(5) <= 1.000001))
  }
}
