package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Federation orchestration (the reference bot's core purpose: one
  * project run fanned out across consortium sites, results collected
  * and tracked — workflow.md "Project Release Flow").
  *
  * Engine form: a site is a data root; a federated run maps one query
  * over every site root and unions the tagged results. The union is
  * plan-level (no shuffle — each site's subtree reads its own files),
  * so site count scales the plan width, not its depth. Sites with
  * divergent schemas harmonize via unionByName(allowMissingColumns).
  */
object Federation {

  case class Site(name: String, dir: String)

  /** Run `query` against every site and union the tagged results. */
  def runFederated(spark: SparkSession, sites: Seq[Site],
      query: (SparkSession, String) => DataFrame,
      siteCol: String = "site"): DataFrame =
    sites.map { s =>
      query(spark, s.dir).withColumn(siteCol, lit(s.name))
    }.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Per-site run status board (state.py:145-179 as an aggregation):
    * one row per site with rows produced and success flag — the engine
    * twin of the ✅/🛠/❌ dashboard. Failures don't abort the federation;
    * they surface as ❌ rows — and so do HANGS: each site is awaited
    * against a shared deadline, and a site that blows it becomes a
    * `failed: Timeout` row instead of blocking the board forever (an
    * unresponsive site is the failure mode federation exists to
    * survive). Per-site jobs run CONCURRENTLY on a dedicated pool sized
    * to the site count — blocking Spark actions never occupy the global
    * pool, and site concurrency isn't capped at the CPU count. Board
    * latency is min(slowest site, timeout), not the consortium sum. */
  def statusBoard(spark: SparkSession, sites: Seq[Site],
      query: (SparkSession, String) => DataFrame,
      timeout: scala.concurrent.duration.FiniteDuration =
        scala.concurrent.duration.Duration(10, "min")): DataFrame = {
    import spark.implicits._
    import scala.concurrent.{Await, ExecutionContext, Future, blocking}
    // Daemon threads: an abandoned site thread must never keep the JVM
    // alive at exit.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, sites.size),
      (r: Runnable) => {
        val t = new Thread(r); t.setDaemon(true); t
      })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val runId = java.util.UUID.randomUUID().toString
    def groupOf(s: Site) = s"graft-statusboard-$runId-${s.name}"
    try {
      val futures = sites.map { s =>
        Future {
          blocking {
            try {
              // Job group is thread-local: tag this site's jobs so a
              // deadline miss can CANCEL them, not just stop waiting —
              // a hung site must not keep burning cluster resources.
              spark.sparkContext.setJobGroup(groupOf(s),
                s"statusBoard site=${s.name}", interruptOnCancel = true)
              val n = query(spark, s.dir).count()
              (s.name, n, "completed")
            } catch {
              case e: Exception => (s.name, 0L, s"failed: ${e.getClass.getSimpleName}")
            } finally spark.sparkContext.clearJobGroup()
          }
        }
      }
      // one shared deadline: jobs run concurrently, so the total wait is
      // bounded by `timeout`, not sites × timeout
      val deadline = System.nanoTime() + timeout.toNanos
      val rows = futures.zip(sites).map { case (f, s) =>
        val remaining = math.max(0L, deadline - System.nanoTime())
        try Await.result(f,
          scala.concurrent.duration.Duration.fromNanos(remaining))
        catch {
          case _: java.util.concurrent.TimeoutException =>
            spark.sparkContext.cancelJobGroup(groupOf(s))
            (s.name, 0L, "failed: Timeout")
        }
      }
      rows.toDF("site", "n_rows", "status")
    } finally pool.shutdownNow() // cancel + interrupt anything abandoned
  }

  /** Federated distinct counting via MERGEABLE sketches: each site
    * builds an HLL sketch of its keys locally (one pass, no raw keys
    * leave the site — the privacy shape a consortium needs), the
    * binary sketches union centrally, and the estimate comes off the
    * merged sketch. Exact distinct across sites would shuffle the full
    * key universe to one place; sketch size is KB regardless of
    * cardinality. Uses Spark's DataSketches HLL functions
    * (hll_sketch_agg / hll_union_agg / hll_sketch_estimate). */
  def federatedDistinct(spark: SparkSession, sites: Seq[Site],
      table: String, keyCol: String): DataFrame = {
    val perSite = sites.map { s =>
      graft.sources.Tables.load(spark, s.dir, table)
        .agg(expr(s"hll_sketch_agg($keyCol)").as("sketch"))
        .withColumn("site", lit(s.name))
    }.reduce(_ unionByName _)
    perSite.agg(
      expr("hll_sketch_estimate(hll_union_agg(sketch))").cast("long")
        .as("approx_distinct"),
      count(lit(1)).as("n_sites"))
  }

  /** FEDERATED MERGEABLE QUANTILES — the distribution twin of
    * [[federatedDistinct]]: each site reduces its `valueCol` to ONE
    * summary row (its row count + a grid of B+1 evenly-spaced local
    * quantile points from `approx_percentile`, itself a one-pass
    * mergeable GK summary) and only those ≤ sites·(B+1) points move —
    * raw rows never leave a site (plan-asserted in the spec: every
    * union branch aggregates below the union), which is the consortium
    * shape the reference's multi-site rollups need for "cross-site
    * length/score distributions" without pooling rows. The central
    * merge treats point i of a site as carrying n_site/B mass for the
    * value run (q_{i-1}, q_i]: sort the panel, cumulative weights, and
    * each requested quantile is the first point whose cumulative mass
    * reaches p·N. Rank error is bounded and budgetable: ≤ n_s/B
    * mis-attributed mass per site (grid) + n_s/accuracy (GK) sums to a
    * RELATIVE rank error ≤ 1/B + 1/accuracy, independent of site count
    * and value distribution — the spec measures it against pooled
    * exact percentiles. Panel-sized shuffles only; per-site cost is
    * one scan. */
  def federatedQuantiles(spark: SparkSession, sites: Seq[Site],
      table: String, valueCol: String,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9),
      b: Int = 128, accuracy: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    require(b >= 2 && probs.forall(p => p > 0.0 && p <= 1.0))
    // bounded-scale division: BigDecimal(i)/BigDecimal(b) throws on
    // non-terminating expansions (b = 3), and raw double formatting
    // can print scientific notation — DECIMAL64 keeps the literal a
    // plain decimal for any b
    val grid = (0 to b).map(i =>
      new java.math.BigDecimal(i).divide(new java.math.BigDecimal(b),
        java.math.MathContext.DECIMAL64).toPlainString).mkString(",")
    val perSite = sites.map { s =>
      graft.sources.Tables.load(spark, s.dir, table)
        .agg(count(lit(1)).as("n"),
          expr(s"approx_percentile($valueCol, array($grid), $accuracy)")
            .as("qs"))
        .withColumn("site", lit(s.name))
    }.reduce(_ unionByName _)
    // central merge over the tiny points panel (≤ sites·B rows): point
    // i ≥ 1 carries its site's n/B mass; pos 0 (the local minimum) is
    // grid metadata, not mass
    val points = perSite
      .select(col("site"), col("n"), posexplode(col("qs")).as(Seq("pos", "v")))
      .filter(col("pos") >= 1)
      .withColumn("w", col("n").cast("double") / b)
    val total = points.agg(sum(col("w")).as("t")).scalar()
    // panel-sized window; non-foldable constant partition key keeps it
    // off a single global-sort partition by contract (PlanHygieneSpec)
    val wCum = Window.partitionBy(pmod(col("pos"), lit(1)))
      .orderBy(col("v"), col("site"), col("pos"))
    val cum = points.withColumn("cw", sum(col("w")).over(wCum))
    probs.toDF("p")
      .crossJoin(cum.select(col("v"), col("cw"), total.as("n_total")))
      .filter(col("cw") >= col("p") * col("n_total"))
      .groupBy(col("p"))
      .agg(min(col("v")).as("est"), max(col("n_total")).as("n_total"))
      .orderBy(col("p"))
  }

  /** The EXACT-INTEGER federated-quantile merge audit (q_federated_
    * quantiles): the same summary-merge protocol as
    * [[federatedQuantiles]], but with per-site EXACT B-quantile grids
    * (value at rank ⌈i·n_s/B⌉ under the total order (cents, orderkey))
    * instead of approx_percentile sketches, over sites carved from the
    * order-priority dimension — so every figure is integer arithmetic
    * and the merged estimate's pooled rank interval is DuckDB-oracle-
    * checkable. The audit row per requested quantile p = num/den:
    * merged estimate, its exact pooled rank interval [rank_below,
    * rank_at], and N — the rank gap |p·N − rank| the merge bound
    * promises (≤ N/B + sites) is then a visible, verified number.
    * Scale shape: one rank window per site partition (site-sized, not
    * global), the summary panel is sites·B rows, and the pooled rank
    * check is one broadcast pass over the fact table. */
  def federatedQuantileAudit(spark: SparkSession, dir: String,
      b: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val o = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("site"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("v"),
        col("o_orderkey").as("k"))
      .localCheckpoint() // ranked side + stats + pooled check share it
    val ranked = o.withColumn("r",
      row_number().over(Window.partitionBy(col("site"))
        .orderBy(col("v"), col("k"))).cast("long"))
    val targets = o.groupBy(col("site")).agg(count(lit(1)).as("n_s"))
      .withColumn("i", explode(typedlit((1 to b).map(_.toLong))))
      .withColumn("r", expr(s"(i * n_s + ${b - 1}) div $b"))
    val points = ranked.join(targets, Seq("site", "r"))
      .select(col("site"), col("i"), col("n_s"), col("v"))
    // merged estimate: cumulative site-mass (scaled by B, so integer)
    // over the value-ordered panel; quantile p = first point whose
    // cumulative mass reaches p·B·N
    val wCum = Window.partitionBy(pmod(col("i"), lit(1)))
      .orderBy(col("v"), col("site"), col("i"))
    val cum = points.withColumn("cw", sum(col("n_s")).over(wCum))
    val nTotal = o.agg(count(lit(1)).as("n")).scalar()
    val ests = Seq((1L, 4L), (1L, 2L), (3L, 4L), (9L, 10L))
      .toDF("p_num", "p_den")
      .crossJoin(cum.select(col("v"), col("cw")))
      .filter(col("cw") * col("p_den") >= col("p_num") * nTotal * b)
      .groupBy(col("p_num"), col("p_den")).agg(min(col("v")).as("est"))
    // exact pooled rank interval of each estimate, one broadcast pass
    o.crossJoin(broadcast(ests))
      .groupBy(col("p_num"), col("p_den"), col("est"))
      .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L))
          .as("rank_below"),
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("rank_at"))
      .withColumn("n_total", nTotal)
      .orderBy(col("p_num").cast("double") / col("p_den"))
  }

  /** FEDERATED HEAVY-HITTERS — the top-k twin of [[federatedDistinct]]
    * (HLL) and [[federatedQuantiles]] (GK grids), completing the
    * mergeable-summary trio: each site reduces its keys to ONE
    * capacity-k Misra–Gries summary row (the
    * [[graft.functions.Aggregates.heavyHitters]] aggregate — itself
    * mergeable across the site's partitions) plus its row count; only
    * those ≤ sites·(k+1) values move. The central merge is the
    * Agarwal et al. (PODS'12, Mergeable Summaries) MG merge,
    * expressed declaratively over the tiny panel: POINTWISE-ADD
    * (explode → groupBy item → sum) then the (k+1)-CUT (subtract the
    * (k+1)-largest summed counter — a TakeOrderedAndProject, never a
    * global sort — keep positives). Guarantees, independent of site
    * count and merge order: every returned counter UNDERCOUNTS its
    * exact pooled frequency by at most N/(k+1) (each decrement event,
    * at a site or centrally, destroys ≥ k+1 units of counted mass),
    * and any item with true frequency > N/(k+1) is guaranteed
    * present — consortium top-k without a row leaving a site.
    * While no site saturates (distinct keys ≤ k everywhere) every
    * figure is EXACT. Returns (item, est, n_total). */
  def federatedHeavyHitters(spark: SparkSession, sites: Seq[Site],
      table: String, keyCol: String, k: Int = 64): DataFrame = {
    val perSite = sites.map { s =>
      graft.sources.Tables.load(spark, s.dir, table)
        .agg(graft.functions.Aggregates
            .heavyHitters(col(keyCol).cast("string"), k).as("summary"),
          count(lit(1)).as("n"))
        .withColumn("site", lit(s.name))
    }.reduce(_ unionByName _)
    mergeMgPanel(perSite, k)
  }

  /** The central MG merge over a per-site summary panel
    * (site, summary: array<(item, cnt)>, n): pointwise add + (k+1)-cut.
    * Shared by [[federatedHeavyHitters]] and the audit query. */
  private def mergeMgPanel(perSite: DataFrame, k: Int): DataFrame =
    // explode_outer, not explode: a site whose MG buffer emptied (the
    // saturated regime can decrement the last survivor away while
    // n > 0) still contributes its n to n_total — a plain explode
    // would drop the whole row and silently understate the N/(k+1)
    // bound context. Null items are filtered inside the merge AFTER
    // totals are taken.
    mergeSiteSummaries(
      perSite.select(col("site"), col("n"),
          explode_outer(col("summary")).as("e"))
        .select(col("site"), col("e.item").as("item"),
          col("e.cnt").as("cnt"), col("n")),
      k)

  /** Central MG merge over FLAT summary rows (site, item, cnt, n[,
    * rev]) — the shape [[graft.streaming.Streams.mgSummaryStream]]
    * emits and any external consortium feed lands as. If a `rev`
    * column is present the merge itself keeps only each site's
    * max-rev rows, so replayed/stale revisions cannot double-count;
    * without it the caller owns the one-revision-per-site contract.
    * Pointwise add (groupBy item), then the (k+1)-largest
    * summed counter subtracts from everything (0 when ≤ k items
    * survive — a TakeOrderedAndProject over the ≤ sites·(k+1) panel,
    * no global-sort Exchange), positives kept: Agarwal et al.'s
    * mergeable-summaries rule, total undercount ≤ N/(k+1). */
  def mergeSiteSummaries(rows: DataFrame, k: Int): DataFrame = {
    // Revision hardening: a replayed or duplicated site summary must
    // not double-count. When the panel carries a `rev` column (the
    // shape mgSummaryStream emits), only each site's LATEST revision
    // participates — a keyed window over the ≤ sites·(k+1) panel, no
    // global sort. Without `rev` the caller owns the one-revision
    // contract (documented above).
    val latest =
      if (rows.columns.contains("rev")) {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("site")
        // null revs coalesce to a floor, not drop: a feed that carries
        // no revision for a site still participates (it only loses to
        // a real revision of the SAME site — the null-propagating
        // === would silently drop the whole site instead)
        rows.withColumn("_rev", coalesce(col("rev"), lit(Long.MinValue)))
          .withColumn("_maxrev", max(col("_rev")).over(w))
          .filter(col("_rev") === col("_maxrev"))
          .drop("_maxrev", "_rev", "rev")
      } else rows
    val totals = latest.groupBy(col("site")).agg(max(col("n")).as("n"))
      .agg(sum(col("n")).as("n_total"))
    // null items (explode_outer placeholders from empty summaries)
    // counted toward totals above, excluded from the counter merge here
    val added = latest.filter(col("item").isNotNull)
      .groupBy(col("item")).agg(sum(col("cnt")).as("cnt"))
    val cutVal = added.orderBy(col("cnt").desc).limit(k + 1)
      .agg(when(count(lit(1)) === k + 1, min(col("cnt")))
        .otherwise(lit(0L)).as("cut"))
    added.crossJoin(broadcast(cutVal))
      .withColumn("est", col("cnt") - col("cut"))
      .filter(col("est") > 0)
      .crossJoin(broadcast(totals))
      .select(col("item"), col("est"), col("n_total"))
  }

  /** The EXACT-REGIME federated top-k audit (q_federated_topk): the
    * same summary-merge protocol as [[federatedHeavyHitters]], over
    * sites carved from the order-priority dimension, with the key
    * chosen so capacity is never stressed — order months number ~84
    * against k=128, so no site's MG buffer saturates, the central cut
    * is zero, and every merged counter is the EXACT pooled month
    * frequency: the whole protocol is DuckDB-oracle-checkable
    * (saturated-regime bounds are FederationSkewSpec's synthetic
    * fixture). Emits the top-`topN` months by (count desc, month)
    * with their rank. Scale shape: one MG summary row per site
    * partition, a ≤ sites·k panel centrally, TakeOrderedAndProject
    * for the cut and the final top-N. */
  def federatedTopkAudit(spark: SparkSession, dir: String,
      k: Int = 128, topN: Int = 10): DataFrame = {
    val perSite = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("site"),
        date_format(col("o_orderdate"), "yyyy-MM").as("item"))
      .groupBy(col("site"))
      .agg(graft.functions.Aggregates.heavyHitters(col("item"), k)
          .as("summary"),
        count(lit(1)).as("n"))
    mergeMgPanel(perSite, k)
      .orderBy(col("est").desc, col("item")).limit(topN)
      .select(col("item").as("month"), col("est").as("n_orders"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          // non-foldable constant key: the ≤ topN panel ranks without
          // a foldable-key single-partition global sort (house rule)
          .partitionBy(pmod(col("n_orders"), lit(1)))
          .orderBy(col("n_orders").desc, col("month"))).cast("long"))
      .orderBy(col("rnk"))
  }

  /** Federated set-OVERLAP estimation — the question HLL cannot answer
    * (HLL registers only union): "how many keys do groups A and B
    * SHARE?". Each group builds a KMV bottom-k sketch of its keys (one
    * map-side-combined aggregation; the sketch is ≤ k longs, raw keys
    * never leave their partition/site), then the |groups|²-sized sketch
    * table self-joins and every pair's intersection/union/Jaccard is
    * estimated from the sketches alone — codegen'd array expressions,
    * no second pass over the data. While a group holds < k distinct
    * keys the sketch is the complete hash set and all counts are EXACT
    * (q_audience_overlap's oracle relies on this); above k the error is
    * the standard KMV ~1/√k. */
  def groupOverlap(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 1024, assertExact: Boolean = false): DataFrame = {
    import graft.functions.{Aggregates, Sketches}
    val skRaw = df.groupBy(col(groupCol).as("g"))
      .agg(Aggregates.kmvSketch(col(keyCol), k).as("sk"))
    // assertExact pins the "every figure is exact" contract some
    // callers (and their oracles) rely on: a sketch that filled up has
    // silently switched to ~1/√k estimation, and the first symptom
    // would otherwise be an opaque oracle hash mismatch at a bigger
    // verification SF. assert_true returns NULL when the predicate
    // holds, so the filter keeps every row while forcing evaluation.
    val sk = if (assertExact)
      skRaw.filter(assert_true(size(col("sk")) < k,
        concat(lit(s"KMV sketch saturated (>= $k distinct keys) for group '"),
          col("g"), lit(s"': exact-overlap contract violated; raise k"))).isNull)
    else skRaw
    val a = sk.select(col("g").as("group_a"), col("sk").as("sk_a"))
    val b = sk.select(col("g").as("group_b"), col("sk").as("sk_b"))
    // sketch table is |groups| rows — the pair join is broadcast-sized
    // by construction, never data-sized
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        Sketches.kmvEstimate(col("sk_a"), k).cast("long").as("keys_a"),
        Sketches.kmvEstimate(col("sk_b"), k).cast("long").as("keys_b"),
        Sketches.kmvIntersect(col("sk_a"), col("sk_b"), k).cast("long")
          .as("overlap"),
        round(Sketches.kmvJaccard(col("sk_a"), col("sk_b"), k), 4)
          .as("jaccard"))
  }

  /** q_audience_overlap: pairwise user-audience overlap between event
    * types — groupOverlap over events(event_type, user_id). k=4096
    * exceeds the per-type distinct-user count at every verification
    * scale (1.5k users at sf0.1), so every figure is exact and
    * DuckDB-oracle-checkable — and `assertExact` makes that assumption
    * fail LOUDLY if a bigger verification SF ever saturates a sketch,
    * instead of surfacing as an opaque oracle mismatch; the SAME plan
    * at 100 TB (assertExact off) keeps sketch
    * size (32 KB/group) and the pair join constant while accuracy
    * degrades gracefully to ~1/√k. */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame =
    groupOverlap(
      graft.sources.Tables.events(spark, dir)
        .select(col("event_type"), col("user_id")),
      "event_type", "user_id", k = 4096, assertExact = true)
      .orderBy(col("group_a"), col("group_b"))
}
