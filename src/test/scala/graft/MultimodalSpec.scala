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

  // ---- real-pixel path: javax.imageio decode under the same stages ----

  private def grayImage(w: Int, h: Int)(
      f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage,
      format: String): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, b), s"no $format writer")
    b.toByteArray
  }

  test("real PNG decode: crafted 8x8 grid yields the constructed aHash " +
    "bit pattern") {
    val sp = spark
    import sp.implicits._
    // top half black, bottom half white: row-major bits 32..63 set
    val png = encode(grayImage(8, 8)((_, y) => if (y < 4) 0 else 255), "png")
    val ds = Seq(Multimodal.MediaRow(1L, png)).toDS()
    val dec = Multimodal.decodeImages(spark, ds).collect()
    assert(dec.length == 1)
    assert(dec.head.width == 8 && dec.head.height == 8)
    // integer 601 luma is exact at the extremes
    assert(dec.head.gray.take(32).forall(_ == 0.0))
    assert(dec.head.gray.drop(32).forall(_ == 1.0))
    val ph = Multimodal.imagePhashOn(spark, ds).collect()
    assert(ph.head.getLong(1) == 0xFFFFFFFF00000000L,
      f"expected 0xFFFFFFFF00000000, got 0x${ph.head.getLong(1)}%016x")
  }

  test("real resize: 64x64 block image recovers exact block means, and " +
    "aHash is scale-invariant across the resize") {
    val sp = spark
    import sp.implicits._
    // block (bx, by) constant at a distinct level — a 64x64 blow-up of
    // an 8x8 image; area-averaged resize must recover it exactly
    def level(bx: Int, by: Int): Int = (by * 8 + bx) * 4 % 256
    val small = encode(grayImage(8, 8)((x, y) => level(x, y)), "png")
    val big = encode(grayImage(64, 64)((x, y) => level(x / 8, y / 8)), "png")
    val ds = Seq(Multimodal.MediaRow(1L, small),
      Multimodal.MediaRow(2L, big)).toDS()
    val grids = Multimodal.imageResized(spark, ds, side = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Double]]("pixels")).toMap
    assert(grids(1L) == grids(2L),
      "box resize of the blow-up must equal the original grid exactly")
    val ph = Multimodal.imagePhashOn(spark, ds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(1L) == ph(2L), "aHash must be scale-invariant")
  }

  test("real-pixel near-dups: one flipped block pairs at hamming 1 via " +
    "the banded join over a binaryFile directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-imgs")
    def write(name: String, img: java.awt.image.BufferedImage): Unit =
      java.nio.file.Files.write(dir.resolve(name), encode(img, "png"))
    val base = grayImage(16, 16)((_, y) => if (y < 8) 0 else 255)
    // flip one 2x2 block (one aHash cell) from black to white
    val nearDup = grayImage(16, 16)((x, y) =>
      if (y < 2 && x < 2) 255 else if (y < 8) 0 else 255)
    // far image: checkerboard at cell granularity — Hamming 32 from base
    val far = grayImage(16, 16)((x, y) => if ((x / 2 + y / 2) % 2 == 0) 0 else 255)
    write("base.png", base); write("near.png", nearDup); write("far.png", far)
    // real metadata: true dimensions, not payload-derived fakes
    val meta = Multimodal.imageMetaFromFiles(spark, dir.toString).collect()
    assert(meta.length == 3)
    assert(meta.forall(r => r.getAs[Long]("width") == 16 &&
      r.getAs[Long]("height") == 16 && r.getAs[Long]("n_pixels") == 256))
    val pairs = Multimodal.imagePhashDupFromFiles(spark, dir.toString, r = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 1, s"exactly the near pair: ${pairs.mkString(",")}")
    assert(pairs.head._3 == 1L, "one flipped cell = Hamming 1")
  }

  test("real frame sampling: multi-page TIFF fans out one row per page " +
    "with per-frame hashes") {
    val sp = spark
    import sp.implicits._
    val pages = Seq(
      grayImage(8, 8)((_, y) => if (y < 4) 0 else 255),
      grayImage(8, 8)((x, _) => if (x < 4) 0 else 255),
      grayImage(8, 8)((x, y) => if ((x + y) % 2 == 0) 0 else 255))
    val buf = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    pages.foreach(p =>
      writer.writeToSequence(new javax.imageio.IIOImage(p, null, null), null))
    writer.endWriteSequence()
    ios.flush(); writer.dispose(); ios.close()
    val ds = Seq(Multimodal.MediaRow(7L, buf.toByteArray)).toDS()
    val frames = Multimodal.imageFrames(spark, ds, maxFrames = 8).collect()
    assert(frames.length == 3, s"3 pages -> 3 frames, got ${frames.length}")
    assert(frames.map(_.getAs[Long]("frame_no")).toSeq == Seq(0L, 1L, 2L))
    // frame 0 hash equals the single-image hash of the same page
    val single = Multimodal.imagePhashOn(spark,
      Seq(Multimodal.MediaRow(7L, encode(pages.head, "png"))).toDS())
      .collect().head.getLong(1)
    assert(frames.head.getAs[Long]("frame_phash") == single)
    // maxFrames bounds the fan-out
    assert(Multimodal.imageFrames(spark, ds, maxFrames = 2).count() == 2)
  }

  test("real decode drops undecodable payloads instead of failing the " +
    "stage (text bytes never match an image reader)") {
    val sp = spark
    import sp.implicits._
    val png = encode(grayImage(4, 4)((_, _) => 128), "png")
    val ds = Seq(Multimodal.MediaRow(1L, png),
      Multimodal.MediaRow(2L, "just some text".getBytes("UTF-8"))).toDS()
    val dec = Multimodal.decodeImages(spark, ds).collect()
    assert(dec.map(_.doc_id).toSeq == Seq(1L))
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
