package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Targeted data selection: pick raw-corpus documents that LOOK LIKE a
  * trusted target domain. This is DSIR — Data Selection via Importance
  * Resampling (Xie et al., NeurIPS 2023): fit two bag-of-hashed-ngrams
  * models (target vs raw), weight every raw document by its
  * log-likelihood ratio, then resample proportionally to the importance
  * weight. The published recipe behind "select web text that resembles
  * Wikipedia+books before pretraining".
  *
  * Scale shape (the reason this works at 100 TB):
  *   - features are HASHED n-grams into a FIXED number of buckets `m` —
  *     the model is two m-row tables no matter how large the corpus is,
  *     so fitting is one map-side-combined count per side and the
  *     fitted model travels to the scorer as an m-double literal
  *     (plan constant, broadcast-equivalent — no join);
  *   - scoring is then a row-local fold over each document's grams:
  *     zero shuffles, embarrassingly parallel;
  *   - selection is Gumbel top-k on the weight — planned as
  *     TakeOrderedAndProject (per-partition heap), never a global sort.
  * The m-row driver collect is the bounded IVF-centroid pattern, NOT a
  * corpus-sized collect.
  *
  * Determinism: buckets come from md5 (stable across engines/runs), the
  * Gumbel noise derives u from md5(doc_id) — the Efraimidis–Spirakis
  * treatment `Sampling.weightedSample` already uses — so selection is
  * reproducible and oracle-checkable in DuckDB.
  */
object Selection {

  /** Hashed-feature bucket count. 256 keeps the oracle SQL readable at
    * test SFs; production targets the paper's 10k — the plan shape is
    * identical (the literal grows, nothing else changes). */
  val NumBuckets = 256

  /** Laplace smoothing mass added per bucket on both sides. */
  val Alpha = 1.0

  /** Bucket of one gram: first 24 bits of its md5, mod m — row-local,
    * engine-stable (md5, not xxhash: the oracle must reproduce buckets
    * in DuckDB). */
  private def bucketOf(gram: Column): Column =
    pmod(conv(substring(md5(gram), 1, 6), 16, 10).cast("long"),
      lit(NumBuckets.toLong))

  /** One side's bucket histogram: (bucket → gram count), m rows via one
    * map-side-combined aggregation. */
  private def bucketCounts(docs: DataFrame): Array[Long] = {
    val rows = docs
      .select(split(lower(trim(col("text"))), "\\s+").as("t"))
      .select(explode(gramsColFromT).as("g"))
      .groupBy(bucketOf(col("g")).as("b")).agg(count(lit(1)).as("c"))
      .collect() // bounded: ≤ NumBuckets rows regardless of corpus size
    val h = new Array[Long](NumBuckets)
    rows.foreach(r => h(r.getLong(0).toInt) = r.getLong(1))
    h
  }

  /** Hashed n-gram features over a frame that carries the token array
    * as `t`: unigrams plus adjacent bigrams ("l r"). One definition
    * shared by the histogram pass and the scorer. */
  private def gramsColFromT: Column = {
    val bi = when(size(col("t")) >= 2,
      expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"))
      .otherwise(expr("CAST(array() AS array<string>)"))
    concat(col("t"), bi)
  }

  /** Fit the per-bucket log-likelihood-ratio vector
    * λ_b = ln((ct_b+α)/(Tt+αm)) − ln((cr_b+α)/(Tr+αm)), quantized to
    * INTEGER micro-units (⌊λ·10⁶+0.5⌋). Quantization is what makes the
    * operator oracle-exact: the per-document score becomes an integer
    * sum — associative, order-independent, identical in every engine —
    * where a float sum of ~100 rounded terms lands on a reporting-
    * rounding boundary for ~1% of documents and the two engines'
    * summation orders then disagree in the last decimal (observed at
    * sf0.01 before the change). */
  private[operators] def fitLambdaMicro(target: DataFrame,
      raw: DataFrame): Array[Long] = {
    val ct = bucketCounts(target)
    val cr = bucketCounts(raw)
    val tt = ct.sum.toDouble + Alpha * NumBuckets
    val tr = cr.sum.toDouble + Alpha * NumBuckets
    Array.tabulate(NumBuckets) { b =>
      val l = math.log((ct(b) + Alpha) / tt) - math.log((cr(b) + Alpha) / tr)
      math.floor(l * 1e6 + 0.5).toLong
    }
  }

  /** Per-document DSIR importance weight over the raw corpus, target =
    * `targetSources` rows. logw = Σ_grams λ_bucket(gram), a row-local
    * integer fold against the literal micro-λ divided once at the edge
    * (exact same double in any engine) — positive means "looks more
    * like the target corpus than like the average raw document". */
  def dsirWeights(spark: SparkSession, dir: String,
      targetSources: Seq[String] = Seq("src0", "src1")): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lambda = fitLambdaMicro(
      docs.filter(col("source").isInCollection(targetSources)), docs)
    val lam = typedlit(lambda.toSeq)
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        split(lower(trim(col("text"))), "\\s+").as("t"))
      .select(col("doc_id"), col("lang"), col("source"),
        size(gramsColFromT).cast("long").as("n_grams"),
        (aggregate(gramsColFromT, lit(0L),
          (s, g) => s + element_at(lam, (bucketOf(g) + lit(1)).cast("int")))
          .cast("double") / lit(1e6)).as("logw"))
      .orderBy(col("doc_id"))
  }

  /** DSIR selection: resample `n` documents with probability ∝
    * exp(logw) via deterministic Gumbel top-k — key = logw + G(u),
    * G(u) = −ln(−ln(u)), u from md5(doc_id) (same hash-derived uniform
    * as `Sampling.weightedSample`, so draws are reproducible across
    * engines, runs and cluster sizes). Planned as
    * TakeOrderedAndProject; ties broken by doc_id. */
  def dsirSelect(spark: SparkSession, dir: String, n: Int = 200,
      targetSources: Seq[String] = Seq("src0", "src1")): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("double") + lit(0.5)) / lit(math.pow(16.0, 13))
    dsirWeights(spark, dir, targetSources)
      .withColumn("gumbel_key", round(col("logw") - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(n)
      .select(col("doc_id"), col("lang"), col("source"), col("logw"))
      .orderBy(col("doc_id"))
  }
}
