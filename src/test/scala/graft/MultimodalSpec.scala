package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing: binary payloads through batched stub decode /
  * featurize stages into the similarity machinery. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media metadata schema and determinism") {
    val m1 = Multimodal.mediaMeta(spark, sf).collect()
    val m2 = Multimodal.mediaMeta(spark, sf).collect()
    assert(m1.sameElements(m2), "stub decode must be deterministic")
    assert(m1.nonEmpty)
    assert(m1.forall(_.getAs[Long]("n_bytes") > 0))
    assert(m1.forall(_.getAs[String]("content_md5").length == 32))
  }

  test("media md5 equals the SQL md5 of the same payload") {
    val viaStub = Multimodal.mediaMeta(spark, sf)
      .select(col("doc_id"), col("content_md5"))
    val viaSql = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
    assert(viaStub.exceptAll(viaSql).count() == 0)
    assert(viaSql.exceptAll(viaStub).count() == 0)
  }

  test("resize stage yields fixed-shape grids regardless of payload size") {
    val r = Multimodal.resized(spark, sf, side = 8)
    assert(r.count() == graft.sources.Tables.documents(spark, sf).count())
    val shapes = r.select(col("width"), col("height"),
      size(col("pixels")).as("n")).distinct().collect()
    assert(shapes.length == 1)
    assert(shapes.head.getInt(0) == 8 && shapes.head.getInt(2) == 64)
  }

  test("frame sampling is bounded and offsets are stride-aligned") {
    val f = Multimodal.frames(spark, sf, stride = 64, maxFrames = 8)
    assert(f.count() > 0)
    assert(f.groupBy("doc_id").count()
      .filter(col("count") > 8).count() == 0, "frame fan-out must be bounded")
    assert(f.filter(col("offset") % 64 =!= 0).count() == 0)
    assert(f.filter(length(col("frame_md5")) =!= 32).count() == 0)
  }

  test("media features feed the ANN path end-to-end") {
    val nn = Multimodal.mediaNeighbors(spark, sf, k = 2)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    // LSH buckets: at most k neighbors per doc, singleton buckets yield none
    assert(nn.count() > 0 && nn.count() <= nDocs * 2)
    assert(nn.filter(col("id_a") === col("id_b")).count() == 0)
    assert(nn.filter(abs(col("cosine")) > 1.0000001).count() == 0)
    // unit-normalized non-negative features → cosine in [0, 1]
    assert(nn.filter(col("cosine") < 0.0).count() == 0)
  }

  test("binaryFile ingest: files → opaque binary rows → decode, with " +
    "glob and size guards applied at the listing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binfiles")
    val payloads = Map("a.img" -> "payload-alpha", "b.img" -> "payload-beta-longer",
      "skip.txt" -> "not-media")
    payloads.foreach { case (name, body) =>
      java.nio.file.Files.write(dir.resolve(name),
        body.getBytes("UTF-8"))
    }
    val rows = graft.sources.FormatIO
      .readBinaryFiles(spark, dir.toString, glob = Some("*.img"))
      .collect()
    assert(rows.length == 2, "glob must prune non-matching files")
    assert(rows.forall(_.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content")))
    // size guard: a 1-byte cap filters everything without reading content
    assert(graft.sources.FormatIO.readBinaryFiles(spark, dir.toString,
      glob = Some("*.img"), maxBytes = 1L).count() == 0)
    // end-to-end decode: md5 of the decoded row equals md5 of the file bytes
    val meta = Multimodal.mediaMetaFromFiles(spark, dir.toString,
      glob = Some("*.img")).collect()
    assert(meta.length == 2)
    val md5s = meta.map(_.getAs[String]("content_md5")).toSet
    val expected = payloads.view.filterKeys(_.endsWith(".img")).values.map { b =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(b.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.toSet
    assert(md5s == expected, "decoded md5 must match the raw file bytes")
    // deterministic ids from paths: re-ingest is idempotent
    val again = Multimodal.mediaMetaFromFiles(spark, dir.toString,
      glob = Some("*.img")).collect()
    assert(meta.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("perceptual hash: identical payloads collide at hamming 0, " +
    "banded pairs equal the brute-force Hamming ball") {
    // identical payloads must produce identical hashes
    val phashes = Multimodal.mediaPhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    texts.groupBy(_._2).values.filter(_.length > 1).take(5).foreach { grp =>
      val hs = grp.map { case (id, _) => phashes(id) }.toSet
      assert(hs.size == 1, "identical payloads must hash identically")
    }
    // banded candidate join == brute-force r<=3 ball over all pairs
    val ids = phashes.keys.toArray.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(phashes(ids(i)) ^ phashes(ids(j)))
      if d <= 3
    } yield (ids(i), ids(j), d.toLong)).toSet
    val banded = Multimodal.mediaPhashDup(spark, sf, r = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute, "banded join must equal the exact Hamming ball")
    assert(banded.exists(_._3 == 0L), "exact-dup payloads must appear")
    // the pigeonhole precondition is enforced
    intercept[IllegalArgumentException] {
      Multimodal.mediaPhashDup(spark, sf, r = 4)
    }
  }
}
