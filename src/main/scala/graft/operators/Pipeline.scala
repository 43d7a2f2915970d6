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
