package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Measures what the PPJoin+ depth-1 suffix filter actually buys: for
  * the Jaccard prefix join and the containment join, count the
  * candidate pairs that reach the verify stage under (a) the
  * length+positional prunes alone and (b) with the suffix-median bound
  * added — the candidate-pair `distinct()` is the scale-critical
  * shuffle of both operators, so the ratio b/a is the direct measure
  * of the filter's value at the probed SF. Also times the full
  * operators so the report shows the filter is not a net loss at
  * small SF.
  *
  * usage: runMain graft.tools.SuffixFilterProbe [sfDir]
  */
object SuffixFilterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "32g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eps = 1e-9

    def run(tag: String, tau: Double, jaccard: Boolean): Unit = {
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val sets = Dedup.tokenShingleSetsOf(docs, 3).localCheckpoint()
      val dfreq = sets.select(explode(col("st")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val (prefA, prefB) =
        if (jaccard) {
          val p = Dedup.orderedPrefixes(sets, dfreq,
            sz => sz - ceil(lit(tau) * sz - lit(eps)) + 1,
            withMid = true).localCheckpoint()
          (p, p)
        } else {
          val occs = Dedup.orderedPrefixes(sets, dfreq, sz => sz, withMid = true)
            .localCheckpoint()
          (occs.filter(col("pos") <=
            col("sz") - ceil(lit(tau) * col("sz") - lit(eps)) + 1), occs)
        }
      val a = prefA.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"),
        col("pos").as("pos_a"), col("tok"), col("mid").as("mid_a"))
      val b = prefB.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
        col("pos").as("pos_b"), col("tok"), col("mid").as("mid_b"))
      val la = col("sz_a") - col("pos_a")
      val lb = col("sz_b") - col("pos_b")
      val pairPred =
        if (jaccard) col("doc_a") < col("doc_b") &&
          least(col("sz_a"), col("sz_b")).cast("double") >=
            lit(tau) * greatest(col("sz_a"), col("sz_b")) - lit(eps)
        else col("doc_a") =!= col("doc_b") &&
          col("sz_b") >= ceil(lit(tau) * col("sz_a") - lit(eps))
      val need =
        if (jaccard) ceil(lit(tau / (1.0 + tau)) *
          (col("sz_a") + col("sz_b")) - lit(eps))
        else ceil(lit(tau) * col("sz_a") - lit(eps))
      val joined = a.join(b, Seq("tok")).filter(pairPred)
      // baseline = the round-5 shipped prunes: jaccard had the
      // two-sided positional bound; containment only had the A-side one
      // (its orderless postings carried no position)
      val baselineBound = if (jaccard) least(la, lb) else la
      val without = joined
        .filter(lit(1) + baselineBound >= need)
        .select(col("doc_a"), col("doc_b")).distinct().count()
      val withSuffix = joined
        .filter(lit(1) + Dedup.suffixOverlapBound(la, lb) >= need)
        .select(col("doc_a"), col("doc_b")).distinct().count()
      println(f"[suffix] $tag%-12s candidates positional=$without%9d " +
        f"suffix=$withSuffix%9d kept=${100.0 * withSuffix / math.max(without, 1)}%5.1f%%")
    }
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    run("jaccard", 0.5, jaccard = true)
    run("containment", 0.6, jaccard = false)
    // end-to-end wall clock of the full operators, both flag settings
    // (warm + min-of-2 timed each)
    def reset(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    for (sfx <- Seq(false, true)) {
      reset()
      def jj(): Unit = Dedup.jaccardPrefixJoin(spark, sfDir, suffixFilter = sfx)
        .write.mode("overwrite").format("noop").save()
      def cc(): Unit = Dedup.containmentJoin(spark, sfDir, suffixFilter = sfx)
        .write.mode("overwrite").format("noop").save()
      jj(); val tj = math.min(time(jj()), time(jj()))
      reset()
      cc(); val tc = math.min(time(cc()), time(cc()))
      println(f"[suffix] full operators (suffixFilter=$sfx): " +
        f"jaccard=$tj%.2fs containment=$tc%.2fs")
    }
    spark.stop()
  }
}
