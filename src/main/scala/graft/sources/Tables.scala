package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named-table loaders over a scale-factor directory of parquet files.
  *
  * Loaders are plain `spark.read.parquet` so Catalyst owns column pruning
  * and filter pushdown — callers `select` only what they need and the scan's
  * ReadSchema shrinks accordingly. At cluster scale the same code path
  * reads a partitioned table directory; nothing here assumes local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) cannot hold; read nanos as long and floor-convert to µs — the
    * same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP, so
    * oracle comparisons agree exactly. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    // integer div, not `/` — double division loses µs precision at
    // nanosecond-epoch magnitude (≈1.7e18 > 2^53)
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
