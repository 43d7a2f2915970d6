package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sampling and split-assignment operators. The workhorse is
  * content-hash splitting: membership depends only on the key's digest,
  * so splits are reproducible across runs, engines and cluster sizes,
  * and rows never migrate between train/test when the corpus grows —
  * properties rng-based sampling cannot give at 100 TB.
  */
object Sampling {

  /** Deterministic split assignment from the first hex nibble of
    * md5(key): 16 equal slices mapped to train/val/test (12/2/2). */
  def hashSplit(df: DataFrame, keyCol: String): DataFrame = {
    val nibble = substring(md5(col(keyCol).cast("string")), 1, 1)
    df.withColumn("split",
      when(nibble.isin("0", "1"), "test")
        .when(nibble.isin("2", "3"), "val")
        .otherwise("train"))
  }

  /** Split-assignment audit: per (split, lang) document counts. */
  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    hashSplit(Tables.documents(spark, dir), "doc_id")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang"))

  /** Stratified sampling by a category column (seeded Bernoulli per
    * stratum — Spark's sampleBy). Approximate by design; the spec
    * checks proportions, not exact counts. */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
