package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2c 36).
  *
  * Media (image/audio/video) travels as an opaque `binary` column with a
  * typed metadata struct beside it. The decode/feature step runs as a
  * batched `mapPartitions` over a typed Dataset — the Scala analogue of
  * a vectorized pandas-UDF stage: one decoder init per partition,
  * streaming batches, no per-row setup. The codec libraries are not in
  * this container, so `StubDecoder` produces a DETERMINISTIC FAKE
  * derived from the bytes; the Spark-side schema, partitioning and
  * batch shape are the real, tested surface.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, fake_width: Long,
      fake_height: Long, content_md5: String)

  /** STUB: stands in for an image decoder. Deterministic function of the
    * payload so tests and oracles are stable. A real deployment swaps
    * this object for one wrapping the codec, keeping the same
    * batch-iterator signature. */
  object StubDecoder {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaMeta] = {
      // per-partition init would go here (codec contexts, model handles)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val md5hex = digest.digest(r.media).map("%02x".format(_)).mkString
        MediaMeta(r.doc_id, r.media.length.toLong,
          r.media.length.toLong % 640L, r.media.length.toLong % 480L, md5hex)
      }
    }
  }

  /** Ingest: attach the opaque binary payload (here: UTF-8 text bytes
    * standing in for media) + source metadata. */
  def ingest(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** Decode + feature-extract through the batched partition decoder. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ingest(spark, dir)
      .mapPartitions(StubDecoder.decodeBatch _)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** File-based ingest: media arriving as raw FILES (the usual shape —
    * an object-store prefix of images/audio) enters through the
    * `binaryFile` source and joins the exact same batched decode
    * stages as the table path. doc_id derives deterministically from
    * the file path (xxhash64), so re-ingest is idempotent and the id
    * is stable across clusters. */
  def ingestFiles(spark: SparkSession, path: String,
      glob: Option[String] = None): Dataset[MediaRow] = {
    import spark.implicits._
    graft.sources.FormatIO.readBinaryFiles(spark, path, glob)
      .select(xxhash64(col("path")).as("doc_id"), col("content").as("media"))
      .as[MediaRow]
  }

  /** binaryFile directory → decoded metadata, end to end. */
  def mediaMetaFromFiles(spark: SparkSession, path: String,
      glob: Option[String] = None): DataFrame = {
    import spark.implicits._
    ingestFiles(spark, path, glob)
      .mapPartitions(StubDecoder.decodeBatch _)
      .toDF()
      .orderBy(col("doc_id"))
  }

  case class MediaFeature(doc_id: Long, feature: Array[Double])
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      pixels: Array[Double])
  case class MediaFrame(doc_id: Long, frame_no: Long, offset: Long,
      frame_md5: String)

  /** STUB resize (stands in for an image resampler): the payload is
    * box-filtered onto a fixed `side`×`side` grid of byte means — the
    * batch shape (fixed output dims regardless of input size) that a
    * real resize kernel has. */
  object StubResizer {
    def resizeBatch(side: Int)(rows: Iterator[MediaRow]): Iterator[ResizedMedia] =
      rows.map { r =>
        val out = new Array[Double](side * side)
        val n = r.media.length
        if (n > 0) {
          val cell = math.max(1, n / (side * side))
          var i = 0
          while (i < n) {
            out(math.min(i / cell, side * side - 1)) += (r.media(i) & 0xff) / 255.0
            i += 1
          }
          var j = 0
          while (j < out.length) { out(j) /= cell; j += 1 }
        }
        ResizedMedia(r.doc_id, side, side, out)
      }
  }

  /** STUB frame sampler (stands in for video keyframe extraction): one
    * frame every `stride` bytes, identified by offset + content digest —
    * the fan-out shape (one row per frame, bounded per doc) of a real
    * sampler. */
  object StubFrameSampler {
    def sampleBatch(stride: Int, maxFrames: Int)(
        rows: Iterator[MediaRow]): Iterator[MediaFrame] = {
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val n = r.media.length
        val count = math.min(maxFrames, math.max(1, n / stride))
        (0 until count).map { f =>
          val off = f * stride
          val end = math.min(n, off + stride)
          digest.reset()
          digest.update(r.media, off, end - off)
          MediaFrame(r.doc_id, f.toLong, off.toLong,
            digest.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Resize stage over the corpus: fixed-grid pixel summaries. */
  def resized(spark: SparkSession, dir: String, side: Int = 8): DataFrame = {
    import spark.implicits._
    ingest(spark, dir).mapPartitions(StubResizer.resizeBatch(side) _).toDF()
  }

  /** Frame-sampling stage: bounded per-doc frame fan-out. */
  def frames(spark: SparkSession, dir: String, stride: Int = 64,
      maxFrames: Int = 8): DataFrame = {
    import spark.implicits._
    ingest(spark, dir)
      .mapPartitions(StubFrameSampler.sampleBatch(stride, maxFrames) _)
      .toDF()
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** STUB feature extractor (stands in for an image/audio embedding
    * model): 16 deterministic chunk statistics per payload. Same
    * batched-partition shape a real model-inference stage uses (one
    * model handle per partition, vectorized batches). */
  object StubFeaturizer {
    val DIM = 16
    def featurizeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeature] = {
      // real impl: load model once per partition here
      rows.map { r =>
        val f = new Array[Double](DIM)
        val n = r.media.length
        var i = 0
        while (i < n) {
          f(i % DIM) += (r.media(i) & 0xff) / 255.0
          i += 1
        }
        val norm = math.sqrt(f.map(x => x * x).sum)
        MediaFeature(r.doc_id,
          if (norm == 0.0) f else f.map(_ / norm))
      }
    }
  }

  /** End-to-end multimodal similarity: payload → stub features →
    * LSH-bucketed cosine top-k — the same bucket-equi-join shape as the
    * embedding ANN (features are just another vector column; a media
    * corpus never gets an all-pairs stage). */
  def mediaNeighbors(spark: SparkSession, dir: String, k: Int = 3,
      nPlanes: Int = 6, nTables: Int = 4): DataFrame = {
    import spark.implicits._
    import graft.functions.HashExpressions.dotProduct
    import org.apache.spark.sql.expressions.Window
    // materialized once: the feature table feeds the stats pass plus
    // every LSH table branch — without this the decode/featurize stage
    // re-executes per branch
    val raw = ingest(spark, dir)
      .mapPartitions(StubFeaturizer.featurizeBatch _)
      .toDF()
      .localCheckpoint()
    // Non-negative features cluster in one orthant, where hyperplanes
    // through the origin cannot split them (every vector lands in one
    // bucket = accidental all-pairs). Mean-center for BUCKETING only —
    // one broadcast 1-row stats pass — and keep raw features for the
    // cosine scoring.
    val meanVec = raw
      .select(posexplode(col("feature")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(avg(col("x")).as("m"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("mean_vec"))
    val feats = raw.crossJoin(broadcast(meanVec))
      .select(col("doc_id"), col("feature"),
        expr("zip_with(feature, mean_vec, (x, m) -> x - m)").as("centered"))
    val rng = new scala.util.Random(7L)
    val tables = (0 until nTables).map { t =>
      val planes = Seq.fill(nPlanes)(Seq.fill(StubFeaturizer.DIM)(rng.nextGaussian()))
      val bucketCol = planes.zipWithIndex.map { case (p, j) =>
        when(dotProduct(col("centered"), typedlit(p)) > 0.0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      feats.select(col("doc_id"), col("feature"), lit(t).as("table_id"),
        bucketCol.as("bucket"))
    }.reduce(_ unionByName _)
    val a = tables.select(col("doc_id").as("id_a"), col("feature").as("fa"),
      col("table_id"), col("bucket"))
    val b = tables.select(col("doc_id").as("id_b"), col("feature").as("fb"),
      col("table_id"), col("bucket"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))
    a.join(b, Seq("table_id", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), dotProduct(col("fa"), col("fb")).as("c"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("c")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"), col("rank"))
      .orderBy(col("id_a"), col("rank"))
  }

  case class MediaHash(doc_id: Long, phash: Long)

  /** Average-hash (aHash) perceptual fingerprint: threshold each cell
    * of the [[StubResizer]] 8×8 grid against the grid mean — bit i set
    * iff cell i is brighter than average. The HASH is the real
    * published algorithm; only the decode underneath it is the stub
    * (a real deployment swaps the resizer for a codec-backed one and
    * this stage is unchanged). Near-identical payloads differ in a few
    * cells → small Hamming distance. */
  object StubPerceptualHasher {
    def hashBatch(rows: Iterator[MediaRow]): Iterator[MediaHash] =
      StubResizer.resizeBatch(8)(rows).map { rm =>
        val mean = rm.pixels.sum / rm.pixels.length
        var h = 0L
        var i = 0
        while (i < 64) {
          if (rm.pixels(i) > mean) h |= (1L << i)
          i += 1
        }
        MediaHash(rm.doc_id, h)
      }
  }

  /** Payload → 64-bit perceptual hash, one partition-batched pass. */
  def mediaPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ingest(spark, dir)
      .mapPartitions(StubPerceptualHasher.hashBatch _)
      .toDF()
  }

  /** Perceptual near-duplicate pairs: Hamming(phash) ≤ r via the
    * multi-index pigeonhole — split the 64-bit hash into 4 bands of
    * 16 bits; any pair within r ≤ 3 differing bits agrees on ≥ 1 band
    * (4 bands can absorb at most 3 errors), so a band equi-join
    * generates candidates with recall 1.0 and `bit_count(xor)` keeps
    * the exact ball. The SimHash text pipeline's shape applied to the
    * media column: linear band shuffle, no all-pairs stage, scales to
    * any corpus the band buckets stay sparse on. */
  def mediaPhashDup(spark: SparkSession, dir: String, r: Int = 3): DataFrame = {
    require(r <= 3, s"4x16 banding is pigeonhole-lossless only to r=3, got $r")
    val hashes = mediaPhash(spark, dir)
    val bands = hashes.select(col("doc_id"), col("phash"),
        explode(expr(
          "transform(sequence(0, 3), " +
            "b -> struct(b AS band_id, " +
            "shiftright(phash, b * 16) & 65535 AS band_sig))")).as("band"))
      .select(col("doc_id"), col("phash"),
        col("band.band_id"), col("band.band_sig"))
    bands.select(col("doc_id").as("doc_a"), col("phash").as("ha"),
        col("band_id"), col("band_sig"))
      .join(bands.select(col("doc_id").as("doc_b"), col("phash").as("hb"),
        col("band_id"), col("band_sig")), Seq("band_id", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= r)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
