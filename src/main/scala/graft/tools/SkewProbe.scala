package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SINGLE-HOT-KEY skew probe for the per-user keyed-window operators —
  * the failure mode [[ScaleProbe]]'s uniform replication cannot see:
  * `sessionize` / `intervalCoalesce` / `sessionPaths` / `funnel` /
  * `windowedFunnel` / `markovTransitions` all put one user's whole
  * timeline into one window partition (the documented keyed-window
  * contract — correct, and the only semantics-preserving partitioning),
  * so ONE bot user with 10⁷ events serializes a task at 100 TB even
  * though every aggregate key distribution looks healthy.
  *
  * The probe grows exactly ONE key: the busiest user's timeline is
  * replicated `mult`× (fresh event_ids, same user_id — the bot shape),
  * everything else stays 1×. Each operator's wall-clock at 1× and hot
  * is compared against the LINEAR budget: wall_hot ≲ wall_1x ×
  * (rows_hot/rows_1x) × 1.5 headroom — i.e. the hot task may cost its
  * extra rows, but a per-user stage that goes superlinear in one key's
  * row count (an accidental O(k²) window frame, a re-sort per row)
  * blows the budget. Mitigation notes for a failing op belong next to
  * the op: the island merge in intervalCoalesce and the funnel fold are
  * both associative, so a two-stage salted pre-merge is available if a
  * real corpus ever grows a key past task size.
  *
  * usage: runMain graft.tools.SkewProbe [sfDir] [multiplier] [op1,...]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 128
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "32g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val hotDir = java.nio.file.Files
      .createTempDirectory("graft-skewprobe").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val hot = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(1).head()
    val (hotUser, hotN) = (hot.getLong(0), hot.getLong(1))
    val total = events.count()
    val maxEvent = events.agg(max("event_id")).head().getLong(0) + 1L
    // mult-1 extra copies of ONE user's timeline, fresh event_ids (the
    // tie-break column), identical user_id and timestamps — a bot that
    // replays the same session shape over and over
    spark.range(1, mult).select(col("id").as("replica"))
      .crossJoin(events.filter(col("user_id") === hotUser))
      .select((col("event_id") + col("replica") * maxEvent).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props"))
      .unionByName(events)
      .write.mode("overwrite").parquet(s"$hotDir/events.parquet")
    val growth = (total + (mult - 1L) * hotN).toDouble / total
    println(f"[skew] hot user $hotUser: $hotN rows -> ${hotN * mult} " +
      f"(corpus $total -> ${total + (mult - 1) * hotN}, growth $growth%.3f)")

    val ops: Seq[(String, String => DataFrame)] = Seq(
      ("q_sessionize", d => graft.operators.Temporal.sessionize(spark, d)),
      ("q_interval_coalesce", d => graft.operators.Temporal.intervalCoalesce(spark, d)),
      ("q_session_paths", d => graft.operators.Temporal.sessionPaths(spark, d)),
      ("q_funnel", d => graft.operators.Behavioral.funnel(spark, d)),
      ("q_funnel_windowed", d => graft.operators.Behavioral.windowedFunnel(spark, d)),
      ("q_markov_transitions", d => graft.operators.Behavioral.markovTransitions(spark, d)),
      ("q_decayed_engagement", d => graft.operators.Behavioral.decayedEngagement(spark, d)),
      ("q_rfm_segments", d => graft.operators.Behavioral.rfmSegments(spark, d)))

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    def timedMin(run: => Unit): Double = {
      run
      math.min(time(run), time(run))
    }

    val rows = ops.filter(o => only.forall(_.contains(o._1))).map {
      case (name, fn) =>
        reset()
        val t1 = timedMin(fn(sfDir).write.mode("overwrite").format("noop").save())
        reset()
        val tH = timedMin(fn(hotDir).write.mode("overwrite").format("noop").save())
        val ratio = tH / t1
        val budget = growth * 1.5
        println(f"[skew] $name%-22s 1x=$t1%7.2fs hot=$tH%7.2fs " +
          f"ratio=$ratio%5.2f budget=$budget%5.2f" +
          (if (ratio > budget) "  OVER-BUDGET" else ""))
        (name, ratio, ratio / budget)
    }
    val worst = rows.maxBy(_._3)
    println(f"[skew] summary: worst ratio/budget ${worst._1} ${worst._3}%.2f " +
      f"(hot-key mult $mult, growth $growth%.3f)")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(hotDir))
    spark.stop()
  }
}
