package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end training-corpus curation: the §2c operators composed the
  * way a production pipeline runs them, cheapest filters first so each
  * stage shrinks the next one's input:
  *
  *   quality gate → language gate → exact dedup → near-dup cluster
  *   keep-one → deterministic split assignment → split-leakage
  *   suppression (drop train docs sharing verbatim-or-near content
  *   with test docs — `Dedup.splitLeakage`'s remediation applied)
  *
  * Everything stays one lazy DataFrame graph (no materialization
  * between stages besides the cluster step's own checkpoint), so
  * Catalyst fuses the scalar gates into the scan.
  */
object Pipeline {

  def curateCorpus(spark: SparkSession, dir: String,
      minQuality: Double = 0.3): DataFrame = {
    val quality = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
    val lang = TextAnalysis.langId(spark, dir)
      .select(col("doc_id"), col("lang_pred"))
    val exactKeep = Dedup.exact(spark, dir)
      .select(col("keep_id").as("doc_id"))
    val nearKeep = Dedup.dedupClusters(spark, dir)
      .filter(col("is_keeper")).select(col("doc_id"))
    val curated = Tables.documents(spark, dir)
      .join(quality, Seq("doc_id"))
      .filter(col("quality") >= minQuality)
      .join(lang, Seq("doc_id"))
      .filter(col("lang_pred") =!= "und")
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(nearKeep, Seq("doc_id"), "left_semi")
    // leakage suppression: the leak list is train-side doc ids only,
    // so the anti-join removes exactly the offending train rows and
    // cannot touch val/test. Computed on the full corpus (conservative
    // — a leak via an already-dropped doc can't resurrect it).
    val leakTrainDocs = Dedup.splitLeakage(spark, dir)
      .select(col("train_doc").as("doc_id")).distinct()
    Sampling.hashSplit(curated, "doc_id")
      .join(leakTrainDocs, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("quality"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** INCREMENTAL CURATION — [[curateCorpus]] for ONE ARRIVING BATCH at
    * O(batch) cost against the persisted corpus indexes, the round-7
    * capstone that the index append/probe machinery exists for: a 100 TB
    * corpus curates each crawl wave without ever rescanning itself.
    *
    * Stages (all batch-sized; the corpus is touched only through
    * bucketed index probes):
    *  - exact-vs-corpus: digest probe ([[Dedup.probeExactIndex]] — also
    *    catches sub-shingle docs the band probe cannot see);
    *  - near-vs-corpus: band probe ([[Dedup.probeMinhashIndex]]);
    *  - within-batch dedup: exact keep-min + batch-local components
    *    ([[Graph.connectedComponents]] over [[Dedup.minhashPairsOf]])
    *    with CLUSTER POISONING: a batch cluster containing ANY
    *    corpus-hit doc drops whole — that is exactly what a full
    *    rebuild's cluster keeper rule does when the merged cluster
    *    contains a (smaller-id) corpus doc, including chains that run
    *    THROUGH a corpus doc (the batch endpoints of such a chain
    *    always carry direct corpus hits, so the poison never misses);
    *  - decontamination / split leakage: BIDIRECTIONAL containment
    *    probe ([[Dedup.probeContainmentBoth]]) against corpus docs +
    *    [[Dedup.splitLeakageOn]] within the batch; corpus-side splits
    *    derive row-locally from the same md5-nibble rule;
    *  - the scalar quality/language gates, row-local on the batch.
    *
    * KEEP POLICY: corpus wins — an arriving duplicate of an indexed
    * document is always the copy dropped (the established corpus is
    * never invalidated by ingest). Under the id convention
    * "corpus ids < batch ids" this makes the increment provably equal
    * to a full rebuild restricted to the batch (parity-spec-proved);
    * with arbitrary ids the full rebuild's min-id keeper may differ —
    * corpus-wins is the operationally right policy either way.
    * Compose with the index appends AFTER curation to admit the
    * survivors into the corpus (and its indexes) for the next wave. */
  def curateIncrement(spark: SparkSession, mhIndex: String,
      contIndex: String, batch: DataFrame,
      minQuality: Double = 0.3,
      spanIndex: Option[String] = None): DataFrame = {
    val batchDocs = batch.select(col("doc_id"), col("text")).localCheckpoint()
    val bIds = batchDocs.select(col("doc_id"))
    // corpus hits (exact + near) — each probe is O(batch)
    val corpusExact = Dedup.probeExactIndex(spark, mhIndex, batchDocs)
      .select(col("doc_id")).distinct()
    val nearPairs = Dedup.probeMinhashIndex(spark, mhIndex, batchDocs)
    val nearHit = nearPairs.select(col("doc_a").as("doc_id"))
      .join(bIds, Seq("doc_id"), "left_semi")
      .unionByName(nearPairs.select(col("doc_b").as("doc_id"))
        .join(bIds, Seq("doc_id"), "left_semi"))
      .distinct()
      .localCheckpoint()
    // within-batch structure: exact keep-min + poisoned components
    val digests = batchDocs.select(col("doc_id"), Dedup.digestCol.as("digest"))
    val dropExactBatch = digests
      .join(digests.groupBy(col("digest")).agg(min(col("doc_id")).as("keep")),
        Seq("digest"))
      .filter(col("doc_id") =!= col("keep"))
      .select(col("doc_id"))
    val comps = Graph.connectedComponents(
      Dedup.minhashPairsOf(batchDocs), "doc_a", "doc_b")
    val poisoned = comps
      .join(nearHit.withColumnRenamed("doc_id", "id"), Seq("id"), "left_semi")
      .select(col("component")).distinct()
    val dropNearBatch = comps
      .join(poisoned, Seq("component"), "left_semi")
      .select(col("id").as("doc_id"))
      .unionByName(comps.join(poisoned, Seq("component"), "left_anti")
        .filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id")))
    // split-leakage: batch train docs leaking against corpus OR batch
    // test docs, either containment direction
    val tau = spark.table(s"${contIndex}_meta").collect().head
      .getAs[Double]("tau")
    val bothDir = Dedup.probeContainmentBoth(spark, contIndex, batchDocs, tau)
    val leakVsCorpus = bothDir
      .join(Sampling.hashSplit(bIds, "doc_id")
        .select(col("doc_id").as("doc_a"), col("split").as("split_a")),
        Seq("doc_a"))
      .join(Sampling.hashSplit(bothDir.select(col("doc_b").as("doc_id"))
          .distinct(), "doc_id")
        .select(col("doc_id").as("doc_b"), col("split").as("split_b")),
        Seq("doc_b"))
      .filter(col("split_a") === "train" && col("split_b") === "test")
      .select(col("doc_a").as("doc_id"))
    val leakWithin = Dedup.splitLeakageOn(batchDocs, tau)
      .select(col("train_doc").as("doc_id")).distinct()
    val drops = corpusExact
      .unionByName(nearHit)
      .unionByName(dropExactBatch)
      .unionByName(dropNearBatch)
      .unionByName(leakVsCorpus)
      .unionByName(leakWithin)
      .distinct()
    // row-local gates last (they commute with the id-keyed drops)
    val curated = Sampling.hashSplit(
      batchDocs.select(col("doc_id"),
        TextAnalysis.qualityCol.as("quality"),
        TextAnalysis.langPredCol.as("lang_pred"))
        .filter(col("quality") >= minQuality && col("lang_pred") =!= "und"),
      "doc_id")
      .join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("quality"), col("split"))
    spanIndex match {
      case None => curated.orderBy(col("doc_id"))
      case Some(si) =>
        // SPAN-CLIP GATE (r11 verdict item #2): survivors additionally
        // carry their duplicated-span-clipped text — the arriving wave
        // is clipped against the PERSISTED duplicated-window classes at
        // O(batch) ([[graft.operators.Suffix.probeSpanClip]]), instead
        // of a full-corpus suffix re-rank per wave. The doc-drop
        // semantics above are untouched: clipping rewrites text, it
        // never deletes a surviving row (SpanIndexSpec parity law:
        // the clip equals full spanClip(corpus ∪ batch) restricted to
        // the batch).
        curated
          .join(Suffix.probeSpanClip(spark, si, batchDocs),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang_pred"), col("quality"),
            col("split"), col("n_tokens"), col("n_removed"),
            col("clean_text"))
          .orderBy(col("doc_id"))
    }
  }

  /** [[curateIncrement]] staging cache — same contract as the
    * PageRank adjacency staging (`Graph.dcAdjCache`): the corpus
    * indexes build once per (SparkContext, corpus dir) as the untimed
    * half of the build/probe split; UUID-fresh table names keyed by
    * applicationId so a new context never collides with an orphaned
    * warehouse dir. */
  private val incStageCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      (String, String, Long)]()

  /** The query-surface instance of [[curateIncrement]]: treat the
    * first nine-tenths of the id range as the ALREADY-CURATED corpus
    * (indexes staged once per session) and curate the remaining tenth
    * as the arriving wave — the regime an increment exists for (a
    * crawl wave is SMALL relative to the corpus; per-wave cost scales
    * with the wave, so benching a corpus-sized "wave" would measure
    * the wrong thing). Rows-only (component fixpoints have no clean
    * SQL form); the full-rebuild parity is spec-proved. */
  def corpusIncrement(spark: SparkSession, dir: String,
      minQuality: Double = 0.3): DataFrame = {
    val (mh, cont, cut) = incStageCache.computeIfAbsent(
      (spark.sparkContext.applicationId, dir), _ => {
        val docs = Tables.documents(spark, dir)
        val maxRow = docs.agg(max(col("doc_id"))).head
        val cutId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) * 9 / 10
        val corpusDir = java.nio.file.Files
          .createTempDirectory("graft-inc-corpus").toString
        docs.filter(col("doc_id") <= cutId)
          .write.parquet(s"$corpusDir/documents.parquet")
        val id = java.util.UUID.randomUUID().toString.replace("-", "")
        Dedup.buildMinhashIndex(spark, corpusDir, s"graft_inc_mh_$id")
        Dedup.buildContainmentIndex(spark, corpusDir, s"graft_inc_cont_$id")
        (s"graft_inc_mh_$id", s"graft_inc_cont_$id", cutId)
      })
    curateIncrement(spark, mh, cont,
      Tables.documents(spark, dir).filter(col("doc_id") > cut)
        .select(col("doc_id"), col("text")),
      minQuality)
  }

  /** Per-stage survivor counts — the funnel report a pipeline run logs. */
  def curationFunnel(spark: SparkSession, dir: String,
      minQuality: Double = 0.3): DataFrame = {
    import spark.implicits._
    val total = Tables.documents(spark, dir).count()
    val q = TextAnalysis.qualityScore(spark, dir)
      .filter(col("quality") >= minQuality).count()
    val keepers = Dedup.dedupClusters(spark, dir)
      .filter(col("is_keeper")).count()
    val leakDocs = Dedup.splitLeakage(spark, dir)
      .select(col("train_doc")).distinct().count()
    val fin = curateCorpus(spark, dir, minQuality).count()
    Seq(("0_ingested", total), ("1_quality_pass", q),
      ("2_neardup_keepers", keepers), ("3_leaky_train_docs", leakDocs),
      ("4_final_corpus", fin))
      .toDF("stage", "n_docs")
  }
}
