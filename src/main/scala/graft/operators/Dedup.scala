package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashExpressions._
import graft.sources.Tables

/** Deduplication operators over `documents` (SURVEY §2c 25-28).
  *
  * The scale story: exact dedup is a hash groupBy (one shuffle on the
  * digest). Near-dup never compares all pairs — MinHash/SimHash map each
  * doc to a handful of band buckets, so candidate generation is an
  * equi-join on (band, signature): linear shuffles, no O(n²) stage.
  * Exact Jaccard runs only on the candidate pairs.
  */
object Dedup {

  /** Normalized text + word shingles, shared by the near-dup family. */
  private def withShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .withColumn("tokens", split(col("norm"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(1, size(tokens) - 2), " +
          "i -> concat_ws(' ', tokens[i-1], tokens[i], tokens[i+1])))"))

  /** Exact dedup: md5 over normalized text, keep the smallest doc_id per
    * digest. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** MinHash signatures: k=32 permutations approximated by seeded
    * xxhash64; banded into 8 bands of 4 for LSH bucketing. */
  private[operators] def minhashBands(spark: SparkSession, dir: String): DataFrame =
    withShingles(spark, dir)
      .withColumn("sig", expr(
        "transform(sequence(0, 31), " +
          "j -> array_min(transform(shingles, s -> xxhash64(j, s))))"))
      .withColumn("band", expr(
        "explode(transform(sequence(0, 7), b -> struct(b AS band_id, " +
          "xxhash64(slice(sig, b * 4 + 1, 4)) AS band_sig)))"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_sig"))

  /** MinHash+LSH near-dup candidate pairs: equi-join on band signature. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(spark, dir)
    val a = bands.select(col("doc_id").as("doc_a"), col("band_id"), col("band_sig"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band_id"), col("band_sig"))
    a.join(b, Seq("band_id", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard, evaluated only on the LSH candidates. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(spark, dir).select(col("doc_id"), col("shingles"))
    val pairs = minhashPairs(spark, dir)
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.1)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup: 64-bit fingerprint (native Expression), 4×16-bit
    * LSH bands, Hamming ≤ 8 confirm (codegen'd bitCount). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(spark, dir)
      .select(col("doc_id"),
        simhash64(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
    val banded = fp.select(col("doc_id"), col("fp"),
        explode(expr("transform(sequence(0, 3), " +
          "b -> struct(b AS band_id, shiftright(fp, b * 16) & 65535 AS band_val))")).as("band"))
      .select(col("doc_id"), col("fp"), col("band.band_id"), col("band.band_val"))
    val a = banded.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"),
      col("band_id"), col("band_val"))
    val b = banded.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"),
      col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hammingDistance(col("fp_a"), col("fp_b")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
