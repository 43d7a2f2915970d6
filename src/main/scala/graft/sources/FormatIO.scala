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

  case class CompactStats(filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, bytesAfter: Long)

  /** Per-file row counts of a parquet directory — the small-file
    * diagnostic that decides whether [[compact]] is worth a rewrite.
    * One aggregation keyed on `input_file_name()`; no footer round
    * trips on the driver. */
  def fileStats(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("file"))
  }

  /** SMALL-FILE COMPACTION — the table-maintenance pass every
    * long-lived ingest target needs (streaming sinks and per-batch
    * appends accrete thousands of KB-sized files; at 100 TB the
    * listing alone becomes a scheduler stall and each task reads one
    * tiny footer). Rewrites the directory into
    * ceil(bytes / targetBytes) files via a staging + rename swap — the
    * same crash-safe promotion protocol as the streaming upsert sink
    * (a complete copy exists on disk at every instant; an interrupted
    * swap self-heals on the next pass; a partial staging write is
    * discarded because the rewrite always starts fresh). Returns
    * before/after file and byte counts so callers can assert the
    * rewrite paid for itself.
    *
    * `repartition(n)` (round-robin, no key) is deliberate: compaction
    * must balance BYTES across output files, and any keyed layout
    * worth preserving belongs to [[writeZOrdered]]/[[writeBucketed]],
    * not an unkeyed maintenance pass. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactStats = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).toIndexedSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
    val staging = new org.apache.hadoop.fs.Path(path + ".compact-staging")
    val backup = new org.apache.hadoop.fs.Path(path + ".compact-backup")
    // finish an interrupted promotion first: a missing live dir with a
    // complete backup means the previous pass died mid-swap
    if (!fs.exists(hPath) && fs.exists(backup)) {
      require(fs.rename(backup, hPath), s"could not restore $backup")
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    // a partitioned layout (col=value/ subdirs) must not be silently
    // flattened into one dir — that would destroy the partition
    // pruning the layout exists for; compact partitioned tables one
    // leaf directory at a time
    val subdirs = fs.listStatus(hPath).filter(_.isDirectory)
      .map(_.getPath.getName)
    require(subdirs.isEmpty,
      s"compact($path): directory contains subdirectories " +
        s"(${subdirs.take(3).mkString(", ")}…) — a partitioned layout " +
        "would be flattened; compact each leaf partition directory instead")
    val before = dataFiles(hPath)
    val bytesBefore = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // swap: live -> backup, staging -> live, drop backup
    if (fs.exists(backup)) fs.delete(backup, true)
    require(fs.rename(hPath, backup), s"could not retire $path")
    require(fs.rename(staging, hPath), s"could not promote $staging")
    fs.delete(backup, true)
    val after = dataFiles(hPath)
    CompactStats(before.length.toLong, bytesBefore,
      after.length.toLong, after.map(_.getLen).sum)
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
