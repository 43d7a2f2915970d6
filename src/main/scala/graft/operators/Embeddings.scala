package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashExpressions.dotProduct
import graft.sources.Tables

/** Distributed linear algebra over the embedding column: one-pass
  * moment aggregation → driver-side eigensolve → broadcast projection.
  *
  * The scale contract mirrors IVF's centroid step: the ONLY driver-side
  * state is dim-bounded (a dim×dim covariance, like K×dim centroids),
  * never corpus-bounded. The corpus is touched twice — one
  * map-side-combined aggregation (shuffle = one dim(dim+1)/2 buffer per
  * partition), one row-local projection scan — so 100 TB cost is two
  * scans and a KB-sized shuffle.
  */
object Embeddings {

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vd"))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (the
    * textbook rotation method — public-domain numerics). Returns
    * (eigenvalues, eigenvectors-as-rows) sorted by eigenvalue
    * descending, each vector sign-canonicalized so results are
    * deterministic across runs and platforms. Driver cost O(dim³ ×
    * sweeps) — microseconds at embedding dims. */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      for (i <- 0 until n; j <- 0 until n if i != j) s += a(i)(j) * a(i)(j)
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > 1e-11) {
      for (p <- 0 until n - 1; q <- p + 1 until n if math.abs(a(p)(q)) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until n) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until n) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until n) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { k =>
      val col = Array.tabulate(n)(i => v(i)(k))
      // sign canon: the largest-|x| component is positive
      val pivot = col.indices.maxBy(i => math.abs(col(i)))
      if (col(pivot) < 0.0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Fit PCA: returns (mean, eigenvalues desc, components-as-rows).
    * One aggregation job over the corpus; everything else is dim-bounded
    * driver arithmetic. */
  def pcaFit(spark: SparkSession, dir: String,
      dim: Int = 64): (Array[Double], Array[Double], Array[Array[Double]]) = {
    val agg = vecs(spark, dir)
      .agg(count(lit(1)).as("n"),
        graft.functions.Aggregates.vectorSum(col("vd"), dim).as("s"),
        graft.functions.Aggregates.outerProductSum(col("vd"), dim).as("op"))
      .head()
    val n = agg.getLong(0)
    if (n < 2) return (new Array[Double](dim), new Array[Double](dim),
      Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0))
    val s = agg.getSeq[Double](1).toArray
    val op = agg.getSeq[Double](2).toArray
    val mu = s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var k = 0
    for (i <- 0 until dim; j <- 0 to i) {
      val c = (op(k) - n * mu(i) * mu(j)) / (n - 1).toDouble
      cov(i)(j) = c; cov(j)(i) = c
      k += 1
    }
    val (vals, comps) = jacobiEigen(cov)
    (mu, vals, comps)
  }

  /** Unrounded projection columns for the top `r` components over the
    * embedding column `inCol`: each is one fused dot against a literal
    * direction minus the mean offset (mean-centering for free). The
    * single source of truth for the projection arithmetic — consumed
    * by [[pcaProject]] (rounded at the output edge) and by
    * `Similarity.annPcaLsh` (raw, for LSH bucketing); a fix applied
    * here reaches both. */
  private[graft] def projectionCols(mu: Array[Double],
      comps: Array[Array[Double]], r: Int, inCol: String): Seq[Column] =
    (0 until math.min(r, comps.length)).map { k =>
      val comp = comps(k)
      val offset = comp.zip(mu).map { case (c, m) => c * m }.sum
      dotProduct(col(inCol), typedlit(comp.toSeq)) - lit(offset)
    }

  /** Project every embedding onto the top `r` principal components.
    * The projection ships as r literal direction vectors plus r scalar
    * offsets inside the plan (broadcast-equivalent, no join): row cost
    * is r fused dot products. Output carries the per-component
    * explained-variance share so downstream consumers can pick r.
    * The coordinates serialize to a CSV string at the query edge
    * (arrays stay off the verification surface, same edge treatment as
    * `Similarity.embedQuantize`'s codes); `Similarity.annPcaLsh`
    * consumes the raw projections via [[projectionCols]] directly. */
  def pcaProject(spark: SparkSession, dir: String, r: Int = 8,
      dim: Int = 64): DataFrame = {
    val (mu, vals, comps) = pcaFit(spark, dir, dim)
    val total = math.max(vals.map(math.max(_, 0.0)).sum, 1e-300)
    val explained = vals.take(r).map(v => math.max(v, 0.0) / total).sum
    val pcCols: Seq[Column] =
      projectionCols(mu, comps, r, "vd").map(round(_, 6))
    vecs(spark, dir)
      .select(col("vec_id"),
        concat_ws(",", pcCols.map(_.cast("string")): _*).as("pc_csv"),
        round(lit(explained), 6).as("var_explained"))
      .orderBy(col("vec_id"))
  }

  /** CENTROID-DISTANCE OUTLIERS, integer-exact: the embedding-quality
    * screen "which vectors sit farthest from the corpus centroid"
    * (mislabeled / corrupted / off-distribution rows — the first
    * triage of every embedding batch), made fully oracle-checkable by
    * the fixed-point trick (the DSIR λ-micro-units pattern): each
    * coordinate quantizes to q = ⌊x·10³ + ½⌋ (exact — float32 → double
    * is lossless and one correctly-rounded multiply is identical on
    * every engine), and the squared distance to the mean scales to the
    * INTEGER form Σ_d (n·q_d − S_d)² where S_d is the per-dimension
    * sum — exact 64-bit arithmetic on both engines, no float
    * accumulation order anywhere.
    *
    * Scale shape: one map-side-combined per-dimension aggregation
    * (|dims| rows out), broadcast back, one row-local rescan, and a
    * `TakeOrderedAndProject` top-N on (dist², id) — two scans and a
    * KB-sized shuffle at any corpus size, same contract as [[pca]]. */
  def embedOutliers(spark: SparkSession, dir: String,
      topN: Int = 30): DataFrame = {
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))")
        .as("q"))
    val dims = q.select(col("vec_id"), posexplode(col("q")))
    val sums = dims.groupBy(col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
    dims.join(broadcast(sums), Seq("pos"))
      .select(col("vec_id"), (col("n") * col("col") - col("s")).as("d"))
      .groupBy(col("vec_id"))
      .agg(sum(col("d") * col("d")).as("dist2n2"))
      .orderBy(col("dist2n2").desc, col("vec_id"))
      .limit(topN)
  }

  /** LABEL BALANCE audit of the embedding table's label column — the
    * class-imbalance report run before any supervised fine-tune or
    * probe: per label the count, corpus share, and ratio to the
    * majority class (the under-sampling factor a balanced draw would
    * need). One label-bounded aggregate + two broadcast 1-row scalars;
    * every figure is exact counts to one closing division. */
  def labelBalance(spark: SparkSession, dir: String): DataFrame = {
    val counts = graft.sources.Tables.embeddings(spark, dir)
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"),
      max(col("n")).as("n_max"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share", round(col("n").cast("double") / col("total"), 6))
      .withColumn("ratio_to_max",
        round(col("n").cast("double") / col("n_max"), 6))
      .select(col("label"), col("n"), col("total"), col("share"),
        col("ratio_to_max"))
      .orderBy(col("label"))
  }

  /** Per-label CENTROID DRIFT against the global centroid, kept on the
    * exact-oracle surface by GLOBAL int8 quantization: one corpus-wide
    * scale (max |x| / 127, a 1-row scalar) turns every component into
    * a small integer, so per-(label, dim) sums, the global sums they
    * roll into (derived from the label sums — ONE pass over the
    * vectors), and all dot/norm moments are BIGINT-exact and
    * order-independent; cosine closes in the fixed √·√ ÷ tree. The
    * audit a mixture rebalance reads: a label whose centroid points
    * away from the corpus centroid (low cos) is the distribution-shift
    * suspect. Shuffle ~ n_vecs × dim once, then everything is bounded
    * by |labels| × dim. Float centroid means would be partial-sum-
    * order-dependent — exactly what the quantization removes. */
  def labelCentroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vd"))
    val scale = e.agg((max(expr("array_max(transform(vd, x -> abs(x)))"))
      / 127.0).as("s")).scalar()
    val q = e.select(col("label"), posexplode(col("vd")))
      .withColumnRenamed("col", "x")
      .withColumn("qv", when(scale > 0,
        floor(col("x") / scale + 0.5).cast("long")).otherwise(0L))
    val ls = q.groupBy(col("label"), col("pos")).agg(sum(col("qv")).as("s"))
    val gs = ls.groupBy(col("pos")).agg(sum(col("s")).as("g"))
    val ng2 = gs.agg(sum(col("g") * col("g")).as("ng2")).scalar()
    val nv = e.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    ls.join(gs, Seq("pos"))
      .groupBy(col("label"))
      .agg(sum(col("s") * col("g")).as("dot"),
        sum(col("s") * col("s")).as("norm2_label"))
      .withColumn("norm2_global", ng2.cast("long"))
      .join(nv, Seq("label"))
      .withColumn("cos",
        when(col("norm2_label") > 0L && col("norm2_global") > 0L,
          round(col("dot").cast("double") /
            (sqrt(col("norm2_label").cast("double")) *
              sqrt(col("norm2_global").cast("double"))), 6)))
      .select(col("label"), col("n_vecs"), col("dot"),
        col("norm2_label"), col("norm2_global"), col("cos"))
      .orderBy(col("label"))
  }
}
