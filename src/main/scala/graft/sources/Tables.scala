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
  /** `events.ts` arrives in one of two physical shapes depending on how
    * the dataset was generated: parquet TIMESTAMP(NANOS) — which Spark's
    * TimestampType (µs) cannot hold, so it's read as raw long under the
    * legacy conf and floor-converted (the same truncation DuckDB applies
    * casting TIMESTAMP_NS → TIMESTAMP) — or plain TIMESTAMP(MICROS)
    * (read as NTZ). Both normalize to session-zoned TimestampType; all
    * entry points pin the session to UTC, so downstream values are
    * identical either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer div, not `/` — double division loses µs precision at
        // nanosecond-epoch magnitude (≈1.7e18 > 2^53)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // fail fast at the loader: a third physical shape (INT96,
        // string, …) from a future testdata regeneration must not
        // propagate into every downstream operator as confusing
        // type errors far from the cause
        sys.error(s"events.ts: unexpected physical type $other — " +
          "expected TIMESTAMP(NANOS) (long under legacy conf), " +
          "TIMESTAMP(MICROS) (NTZ), or session-zoned TimestampType")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
