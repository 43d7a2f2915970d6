package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph operators over plain edge-list DataFrames — the
  * pregel-as-joins shape: node state is a (id, value) frame, every
  * superstep is ONE equi-join against the edge list plus ONE keyed
  * aggregation, and lineage is cut per round so the job graph stays
  * flat. The edge list (with degrees) is materialized once up front and
  * reused by every superstep — at 100 TB the adjacency is read from
  * memory/disk blocks each round, never recomputed from source.
  * Complements [[Dedup.dedupClusters]] (min-label propagation /
  * connected components) with a weighted-importance signal.
  */
object Graph {

  /** PageRank by fixed-count power iteration over an UNDIRECTED edge
    * list: rank(v) = (1-d) + d·Σ_{u ∈ N(v)} rank(u)/deg(u), started
    * from rank ≡ 1 so ranks sum to the node count (no dangling mass in
    * a symmetrized graph — every node has deg ≥ 1).
    *
    * The adjacency (with degrees) is staged ONCE as a table bucketed +
    * sorted by src — the stored layout IS the partitioning, so every
    * iteration's join reads the EDGE side shuffle-free and only the
    * node-sized rank frame moves. This matters: localCheckpoint does
    * not carry hash-partitioning into the logical plan (measured — the
    * scan re-exchanges every round), so a checkpointed adjacency would
    * re-shuffle the edge volume each iteration; the bucketed layout is
    * what makes per-iteration cost O(nodes), the difference between a
    * usable and unusable 100 TB PageRank. Per iteration: ranks exchange
    * to the bucket layout, sort-merge join, then a map-side-combined
    * groupBy(dst) sum. Fixed iteration count keeps the job graph
    * deterministic; float summation order still varies with
    * partitioning, so callers needing cross-run stability round the
    * emitted rank (see [[dupCentrality]]). LocalCheckpoint bounds rank
    * lineage per round; cluster deployments would use checkpoint(dir).
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iters: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nBuckets = spark.sessionState.conf.numShufflePartitions
    val adjTable = "graft_pr_adj_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    sym.join(deg, Seq("src"))
      .select(col("src"), col("dst"), col("deg"))
      .write.bucketBy(nBuckets, "src").sortBy("src")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(adjTable)
    try {
      val adj = spark.table(adjTable)
      var ranks = adj.select(col("src").as("id")).distinct()
        .withColumn("pr", lit(1.0))
        .localCheckpoint()
      for (_ <- 1 to iters) {
        val contribs = adj.join(ranks, col("src") === col("id"))
          .select(col("dst"), (col("pr") / col("deg")).as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("in"))
          .select(col("dst").as("id"), col("in"))
        ranks = ranks.select(col("id"))
          .join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(1.0 - damping) +
              lit(damping) * coalesce(col("in"), lit(0.0))).as("pr"))
          .localCheckpoint() // eager: ranks no longer depend on adj
      }
      ranks
    } finally spark.sql(s"DROP TABLE IF EXISTS $adjTable")
  }

  /** Duplication-graph centrality: PageRank over the MinHash near-dup
    * candidate graph. Documents that sit in the middle of large
    * duplication structures (boilerplate, templates, mirrored content)
    * rank high — a corpus-curation signal the pair list alone doesn't
    * give, and the weighted companion to the connected-components
    * labels of [[Dedup.dedupClusters]]. Rank rounded to 6 decimals to
    * pin partial-sum order noise. */
  def dupCentrality(spark: SparkSession, dir: String): DataFrame =
    pagerank(Dedup.minhashPairs(spark, dir), "doc_a", "doc_b")
      .select(col("id").as("doc_id"), round(col("pr"), 6).as("centrality"))
      .orderBy(col("doc_id"))
}
