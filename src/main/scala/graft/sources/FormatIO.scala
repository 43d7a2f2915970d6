package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink layer. Everything flows through Spark's
  * DataSource V2 readers/writers, so predicate pushdown, column pruning
  * and partition discovery come for free where the format supports them
  * (parquet/orc); csv/json get schema enforcement instead of inference
  * at scale (an inference pass over 100 TB is a full extra read).
  */
object FormatIO {

  /** Read with explicit schema where the format needs one. Partitioned
    * directory layouts (col=value/) are discovered automatically. */
  def read(spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    schema.fold(r)(r.schema).load(path)
  }

  /** Write partitioned-by columns; the layout prunes at read time.
    * `maxRecordsPerFile` bounds file sizes independent of partition
    * count — the knob that keeps 100 TB outputs splittable. */
  def write(df: DataFrame, format: String, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite,
      maxRecordsPerFile: Long = 0L,
      options: Map[String, String] = Map.empty): Unit = {
    var w = df.write.format(format).mode(mode).options(options)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    w.save(path)
  }

  /** Z-ordered write: range-partition + sort by the Morton code of two
    * key columns so each output file covers a tight 2-D tile — both
    * columns then prune at file/row-group level. `nFiles` bounds output
    * file count. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.functions.HashExpressions.zorder2
    df.withColumn("_z", zorder2(col(colA).cast("long"), col(colB).cast("long")))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Bucketed save-as-table: co-locates both sides of a recurring join
    * key so the join becomes shuffle-free (requires a metastore-backed
    * table — the cluster path; tested via saveAsTable on local). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    var w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
    sortCol.foreach(c => w = w.sortBy(c))
    w.saveAsTable(table)
  }

  /** Raw-file ingest via the `binaryFile` source — the front door for
    * multimodal payloads (images/audio/video land as files, not rows).
    * Yields (path, modificationTime, length, content) with the payload
    * as an opaque binary column, ready for
    * `Multimodal`'s batched decode stages. `maxBytes` guards the
    * executor: binaryFile loads each file whole into one row, so a
    * stray multi-GB object must be filtered BEFORE the content is
    * materialized — the length predicate pushes down to the file
    * listing (filesystem metadata), not a content read. `glob` prunes
    * by name pattern the same way. */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: Option[String] = None,
      maxBytes: Long = 512L * 1024 * 1024,
      recursive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.col
    var r = spark.read.format("binaryFile")
      .option("recursiveFileLookup", recursive.toString)
    glob.foreach(g => r = r.option("pathGlobFilter", g))
    r.load(path).filter(col("length") <= maxBytes)
  }
}
