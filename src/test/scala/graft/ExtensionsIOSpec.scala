package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FormatIO, Tables}
import java.nio.file.Files

/** SQL function registration via GraftExtensions + multi-format IO. */
class ExtensionsIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    graft.plans.GraftFunctionRegistry.registerAll(s)
    s
  }
  val sf = "/root/testdata/sf0.001"

  test("custom expressions are callable from SQL") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs")
    val row = spark.sql(
      """SELECT simhash64(text) AS fp,
        |  hamming_distance(simhash64(text), simhash64(text)) AS d,
        |  size(rolling_shingles(text, 5)) AS n_shingles
        |FROM docs LIMIT 1""".stripMargin).head
    assert(row.getAs[Long]("fp") != 0L)
    assert(row.getAs[Int]("d") == 0)
    assert(row.getAs[Int]("n_shingles") > 0)
  }

  test("minhash_signature and zorder2 are callable from SQL") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_mh")
    val row = spark.sql(
      """SELECT size(minhash_signature(rolling_shingles(text, 5), 16)) AS sig_len,
        |  zorder2(2L, 3L) AS z
        |FROM docs_mh LIMIT 1""".stripMargin).head
    assert(row.getAs[Int]("sig_len") == 16)
    // bits of 2 (0b10) land on even positions, bits of 3 (0b11) on odd:
    // interleave(a=2,b=3) = 0b1110 = 14
    assert(row.getAs[Long]("z") == graft.functions.ZOrder2.morton(2L, 3L))
    // SQL path agrees with the DataFrame-API path on real data
    val sqlFp = spark.sql(
      "SELECT doc_id, minhash_signature(rolling_shingles(text, 5), 8) AS sig FROM docs_mh")
    val dfFp = Tables.documents(spark, sf).select(col("doc_id"),
      graft.functions.HashExpressions.minhashSignature(
        graft.functions.HashExpressions.rollingShingles(col("text"), 5), 8).as("sig"))
    assert(sqlFp.exceptAll(dfFp).count() == 0)
  }

  test("aggregates and bloom functions are callable from SQL") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_agg")
    // group_minhash / vector_sum / outer_product_sum resolve as
    // aggregate functions (analyzer wraps them at the use site)
    val mh = spark.sql(
      """SELECT lang, size(group_minhash(
        |  minhash_signature(rolling_shingles(text, 8), 16), 16)) AS k
        |FROM docs_agg GROUP BY lang""".stripMargin).collect()
    assert(mh.nonEmpty && mh.forall(_.getAs[Int]("k") == 16))
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("emb_agg")
    val vs = spark.sql(
      """SELECT size(vector_sum(cast(embedding AS array<double>), 64)) AS d,
        |       size(outer_product_sum(cast(embedding AS array<double>), 4)) AS t
        |FROM emb_agg""".stripMargin).head
    assert(vs.getAs[Int]("d") == 64 && vs.getAs[Int]("t") == 10)
    // heavy_hitters resolves as an aggregate; capacity bounds the size
    val hh = spark.sql(
      """SELECT lang, size(heavy_hitters(text, 5)) AS s
        |FROM docs_agg GROUP BY lang""".stripMargin).collect()
    assert(hh.nonEmpty && hh.forall(_.getAs[Int]("s") <= 5))
    // bloom build + probe end-to-end in SQL: members always hit
    val miss = spark.sql(
      """WITH bf AS (SELECT graft_bloom_agg(xxhash64(doc_id), 1000L, 8192L) AS b
        |            FROM docs_agg)
        |SELECT count(*) AS missed FROM docs_agg
        |WHERE NOT graft_might_contain((SELECT b FROM bf), xxhash64(doc_id))"""
        .stripMargin).head.getAs[Long]("missed")
    assert(miss == 0, "bloom must have no false negatives")
    // kmv_merge in SQL folds per-part sketches into the whole-table
    // sketch bit for bit (same algebra the Incremental spec proves on
    // the Column API)
    val km = spark.sql(
      """WITH parts AS (
        |  SELECT doc_id % 4 AS part, kmv_sketch(xxhash64(doc_id), 32) AS sk
        |  FROM docs_agg GROUP BY doc_id % 4),
        |whole AS (SELECT kmv_sketch(xxhash64(doc_id), 32) AS sk FROM docs_agg)
        |SELECT (SELECT kmv_merge(collect_list(sk), 32) FROM parts) =
        |       (SELECT first(sk) FROM whole) AS same""".stripMargin)
      .head.getAs[Boolean]("same")
    assert(km, "kmv_merge(parts) must equal the whole-table sketch")
  }

  test("cosine_similarity in SQL matches self-similarity = 1") {
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val bad = spark.sql(
      """SELECT abs(cosine_similarity(cast(embedding AS array<double>),
        |  cast(embedding AS array<double>)) - 1.0) AS err FROM emb""".stripMargin)
      .filter(col("err") > 1e-12).count()
    assert(bad == 0)
  }

  test("optimizer rule folds hamming_distance(x, x) to literal 0") {
    if (!spark.experimental.extraOptimizations.contains(
        graft.plans.SimplifyGraftExpressions))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SimplifyGraftExpressions
    val df = Tables.documents(spark, sf)
      .select(graft.functions.HashExpressions.hammingDistance(
        graft.functions.HashExpressions.simhash64(col("text")),
        graft.functions.HashExpressions.simhash64(col("text"))).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("hamming_distance"),
      s"self-hamming must fold away:\n$optimized")
    assert(df.filter(col("d") =!= 0).count() == 0)
  }

  test("round-trip csv/json/parquet preserves values with explicit schema") {
    val dir = Files.createTempDirectory("graft-io").toString
    val src = Tables.nation(spark, sf)
    for (fmt <- Seq("parquet", "orc", "csv", "json")) {
      val opts = if (fmt == "csv") Map("header" -> "true") else Map.empty[String, String]
      FormatIO.write(src, fmt, s"$dir/$fmt", mode = SaveMode.Overwrite, options = opts)
      val back = FormatIO.read(spark, fmt, s"$dir/$fmt",
        schema = Some(src.schema), options = opts)
      assert(back.count() == src.count(), s"$fmt row count")
      assert(back.exceptAll(src).count() == 0, s"$fmt contents")
    }
  }

  test("round-trip XML (Spark 4 built-in source) preserves values") {
    val dir = Files.createTempDirectory("graft-xml").toString
    val src = Tables.nation(spark, sf)
    FormatIO.write(src, "xml", s"$dir/xml", mode = SaveMode.Overwrite,
      options = Map("rowTag" -> "nation"))
    val back = FormatIO.read(spark, "xml", s"$dir/xml",
      schema = Some(src.schema), options = Map("rowTag" -> "nation"))
    assert(back.count() == src.count(), "xml row count")
    assert(back.exceptAll(src).count() == 0, "xml contents")
  }

  test("parquet schema evolution: mergeSchema unifies old and new files") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // v1 files lack the column later versions add — the layout every
    // long-lived dataset grows into
    Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
      .write.parquet(s"$dir/v1")
    Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"),
        lit("emea").as("region_tag"))
      .write.parquet(s"$dir/v2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/v1", s"$dir/v2")
    assert(merged.columns.toSet ==
      Set("n_nationkey", "n_name", "region_tag"))
    val n = Tables.nation(spark, sf).count()
    assert(merged.count() == 2 * n)
    // old files surface the new column as null, not an error
    assert(merged.filter(col("region_tag").isNull).count() == n)
  }

  test("corrupt json rows are captured, not silently dropped") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-json").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 "v": "broken"}
        |{"id": 3, "v": "ok2"}""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt", StringType)))
    // Spark refuses corrupt-column-only queries on a raw scan
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the parse first
    val df = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .localCheckpoint()
    import org.apache.spark.sql.functions.col
    assert(df.count() == 3, "every input line accounted for")
    assert(df.filter(col("_corrupt").isNotNull).count() == 1,
      "the malformed line lands in the corrupt-record column")
    assert(df.filter(col("_corrupt").isNull).count() == 2)
  }

  test("malformed csv rows drop under DROPMALFORMED, fail under FAILFAST") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/rows.csv"),
      "1,alpha\n2,beta\nnot_a_number,gamma\n3,delta\n")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val dropped = FormatIO.read(spark, "csv", s"$dir/rows.csv",
      schema = Some(schema), options = Map("mode" -> "DROPMALFORMED"))
    // collect, not count: CSV count() skips parsing entirely, so
    // malformed rows are only dropped when columns are materialized
    assert(dropped.collect().length == 3, "malformed row must be dropped")
    val strict = FormatIO.read(spark, "csv", s"$dir/rows.csv",
      schema = Some(schema), options = Map("mode" -> "FAILFAST"))
    intercept[org.apache.spark.SparkException] { strict.collect() }
  }

  test("partitioned write prunes partitions at read") {
    val dir = Files.createTempDirectory("graft-part").toString
    FormatIO.write(Tables.orders(spark, sf), "parquet", dir,
      partitionBy = Seq("o_orderstatus"))
    val pruned = FormatIO.read(spark, "parquet", dir)
      .filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(!plan.contains("o_orderstatus=O"),
      "non-matching partitions must not be scanned")
  }

  test("z-ordered write concentrates 2-D range predicates in fewer files") {
    import graft.functions.HashExpressions.zorder2
    // expression sanity: interleaving is monotone in tiles
    val m = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L))
    val codes = m.map { case (a, b) => graft.functions.ZOrder2.morton(a, b) }
    assert(codes == Seq(0L, 1L, 2L, 15L))

    val zdir = Files.createTempDirectory("graft-z").toString
    val rdir = Files.createTempDirectory("graft-r").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
      .withColumn("o_day", datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("long"))
    FormatIO.writeZOrdered(orders, zdir, "o_custkey", "o_day", nFiles = 8)
    orders.repartition(8).write.mode("overwrite").parquet(rdir) // random layout
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("o_custkey").between(100, 300) && col("o_day").between(0, 400))
        .select(input_file_name()).distinct().count()
    val (zf, rf) = (filesTouched(zdir), filesTouched(rdir))
    info(s"files containing matches: z-ordered=$zf random=$rf")
    assert(zf <= rf, s"z-order must not scatter matches more than random ($zf vs $rf)")
  }

  test("persisted IVF index: probe matches the in-memory operator and " +
    "reads the bucketed posting-list layout") {
    import graft.operators.Similarity
    Similarity.buildIvfIndex(spark, sf, "ivf_idx",
      nCentroids = 16, kmeansIters = 3, nBuckets = 4)
    // probes return unordered frames (no Exchange for presentation) —
    // ordering happens here, at the assertion edge
    val probe = Similarity.probeIvfIndex(spark, "ivf_idx", sf, k = 3, nProbe = 8)
      .orderBy(col("id_a"), col("rank"))
    val direct = Similarity.annIvf(spark, sf, k = 3)
    assert(probe.collect().sameElements(direct.collect()),
      "probing the stored index must reproduce the in-memory operator")
    // the stored layout must actually be used: the posting-list scan
    // reports its bucketing, so the index side joins without a shuffle
    val formatted = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("Bucketed: true"),
      s"index scan must use the bucket layout:\n$formatted")
  }

  test("persisted MinHash band index: probing its own corpus reproduces " +
    "minhashPairs; the index side reads bucketed, probe side shuffles") {
    import graft.operators.Dedup
    Dedup.buildMinhashIndex(spark, sf, "mh_idx", nBuckets = 4)
    val probeDocs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val probed = Dedup.probeMinhashIndex(spark, "mh_idx", probeDocs)
      .orderBy(col("doc_a"), col("doc_b"))
    val direct = Dedup.minhashPairs(spark, sf)
    assert(probed.collect().sameElements(direct.collect()),
      "probing the stored index must reproduce the batch band equi-join")
    // incremental shape: index co-located via its bucket layout — only
    // the (new-batch) probe side may shuffle for the join
    val formatted = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("Bucketed: true"),
      s"index scan must use the bucket layout:\n$formatted")
  }

  test("persisted containment index: probing its own corpus reproduces " +
    "containmentJoin; postings and verify sets read bucketed") {
    import graft.operators.Dedup
    Dedup.buildContainmentIndex(spark, sf, "cont_idx", nBuckets = 4)
    val probeDocs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val probed = Dedup.probeContainmentIndex(spark, "cont_idx", probeDocs)
      .orderBy(col("doc_a"), col("doc_b"))
    val direct = Dedup.containmentJoin(spark, sf)
    assert(probed.collect().sameElements(direct.collect()),
      "probing the stored index must reproduce the batch containment join")
    // the corpus side must be satisfied from its stored layout — both
    // the posting list and the verify-side shingle sets
    val formatted = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("Bucketed: true"),
      s"index scans must use the bucket layout:\n$formatted")
  }

  test("containment probe never sees corpus-unseen shingles match " +
    "(df-0 prefix slots are recall-safe, not candidates)") {
    import graft.operators.Dedup
    Dedup.buildContainmentIndex(spark, sf, "cont_idx_u", nBuckets = 4)
    // a batch whose vocabulary is disjoint from the corpus: every
    // shingle gets df 0, the whole prefix is corpus-unseen, the join
    // must produce zero candidates (and zero errors) rather than
    // accidental matches
    val alien = spark.createDataFrame(Seq(
      (900001L, "zzqx wvvk plmr eety zzqx wvvk plmr"),
      (900002L, "aat bbu ccv ddw eex ffy ggz hhq"))).toDF("doc_id", "text")
    assert(Dedup.probeContainmentIndex(spark, "cont_idx_u", alien).count() == 0)
  }

  test("index probe shuffle volume scales with the arrival batch, not " +
    "the corpus (the O(batch) incremental-dedup claim, measured)") {
    import graft.operators.Dedup
    Dedup.buildMinhashIndex(spark, sf, "mh_idx_vol", nBuckets = 4)
    val corpusBands = spark.table("mh_idx_vol_bands").count()
    val batch = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(10)
      .localCheckpoint() // fence the batch prep out of the measurement
    val (_, m) = Metrics.withMetrics(spark) {
      Dedup.probeMinhashIndex(spark, "mh_idx_vol", batch).count()
    }
    // the probe side shuffles ~batch×bands rows (+ the candidate-pair
    // dedup); the corpus band table must NOT re-shuffle — anything
    // near corpusBands records means the bucketed layout was ignored
    assert(m.shuffleRecordsWritten < corpusBands / 2,
      s"probe shuffled ${m.shuffleRecordsWritten} records — " +
        s"corpus has $corpusBands band rows; the index side is re-shuffling")
  }

  test("bucketed table join plans without a shuffle on the bucket key") {
    FormatIO.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_custkey", 4)
    FormatIO.writeBucketed(Tables.customer(spark, sf), "customer_b", "c_custkey", 4)
    val j = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val exchanges = j.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(j.count() > 0)
    assert(exchanges.isEmpty, "bucketed join must be shuffle-free")
  }

  test("compaction: collapses a small-file directory losslessly, " +
    "idempotent second pass, interrupted swap self-heals") {
    import graft.sources.FormatIO
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val tbl = s"$dir/docs"
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    docs.repartition(64).write.parquet(tbl)
    val statsBefore = FormatIO.fileStats(spark, tbl).collect()
    assert(statsBefore.length == 64, s"expected 64 files, got ${statsBefore.length}")
    val expect = docs.collect().map(_.toString).sorted.toSeq
    val s1 = FormatIO.compact(spark, tbl, targetBytes = Long.MaxValue)
    assert(s1.filesBefore == 64L && s1.filesAfter == 1L,
      s"compaction must collapse 64 -> 1, got $s1")
    assert(spark.read.parquet(tbl).collect().map(_.toString).sorted.toSeq
      == expect, "compaction must be lossless")
    // idempotent: nothing left to merge
    val s2 = FormatIO.compact(spark, tbl, targetBytes = Long.MaxValue)
    assert(s2.filesBefore == 1L && s2.filesAfter == 1L)
    // interrupted promotion: live dir retired to backup, process died
    // before staging promoted — the next pass must restore and proceed
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(tbl),
      new org.apache.hadoop.fs.Path(tbl + ".compact-backup")))
    val s3 = FormatIO.compact(spark, tbl, targetBytes = Long.MaxValue)
    assert(s3.filesAfter == 1L)
    assert(spark.read.parquet(tbl).collect().map(_.toString).sorted.toSeq
      == expect, "self-healed compaction must preserve the snapshot")
    // target sizing: a small target yields multiple balanced files
    val sized = FormatIO.compact(spark, tbl,
      targetBytes = math.max(1L, s1.bytesAfter / 4))
    assert(sized.filesAfter >= 2L, s"expected a multi-file rewrite, got $sized")
    // a partitioned layout must be REFUSED, not silently flattened
    val part = s"$dir/parted"
    graft.sources.Tables.documents(spark, sf)
      .write.partitionBy("lang").parquet(part)
    val err = intercept[IllegalArgumentException] {
      FormatIO.compact(spark, part)
    }
    assert(err.getMessage.contains("partitioned layout"),
      s"expected the flattening guard, got: ${err.getMessage}")
  }

  test("snapshot manifests: atomic commits, time travel, crash " +
    "invisibility, and vacuum reclaims exactly the unreferenced files") {
    val sp = spark
    import sp.implicits._
    val table = Files.createTempDirectory("graft-snap").toString
    val v1 = FormatIO.writeSnapshot(sp,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), table)
    val v2 = FormatIO.appendSnapshot(sp,
      Seq((4L, "d"), (5L, "e")).toDF("id", "s"), table)
    assert((v1, v2) == ((1L, 2L)))
    assert(FormatIO.snapshotVersions(sp, table) == Seq(1L, 2L))
    assert(FormatIO.readSnapshot(sp, table).count() == 5L,
      "latest sees the append")
    assert(FormatIO.readSnapshot(sp, table, Some(1L))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
      "a pinned reader still sees exactly version 1")
    // crash simulation: a data directory that never got a manifest is
    // invisible to every reader and version listing
    Seq((99L, "orphan")).toDF("id", "s")
      .write.parquet(s"$table/data/crashed-write-no-manifest")
    assert(FormatIO.readSnapshot(sp, table).count() == 5L,
      "an uncommitted write must be invisible")
    assert(FormatIO.snapshotVersions(sp, table) == Seq(1L, 2L))
    // REPLACE commit: v3 lists only its own files; v2 stays readable
    val v3 = FormatIO.writeSnapshot(sp,
      Seq((10L, "x")).toDF("id", "s"), table)
    assert(v3 == 3L)
    assert(FormatIO.readSnapshot(sp, table).count() == 1L)
    assert(FormatIO.readSnapshot(sp, table, Some(2L)).count() == 5L)
    // vacuum keepLast=1: v1/v2 manifests and every file only they (or
    // the crashed write) reference disappear; latest is untouched
    val deleted = FormatIO.vacuumSnapshots(sp, table, keepLast = 1)
    assert(deleted > 0L, "the superseded and orphaned files are reclaimed")
    assert(FormatIO.snapshotVersions(sp, table) == Seq(3L))
    assert(FormatIO.readSnapshot(sp, table).count() == 1L,
      "vacuum must never touch a kept version's files")
    val err = intercept[IllegalArgumentException] {
      FormatIO.readSnapshot(sp, table, Some(1L))
    }
    assert(err.getMessage.contains("not present"))
    // a second vacuum is a no-op: nothing unreferenced remains
    assert(FormatIO.vacuumSnapshots(sp, table, keepLast = 1) == 0L)
  }
}
