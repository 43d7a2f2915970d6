package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavioral, Dedup, Federation, Privacy, Quality,
  TextAnalysis, TimeSeries}

/** Semantics specs for the round-9 operator batch — each test pins the
  * law its SURVEY §2 row claims, on crafted inputs where the expected
  * value is computable by hand (or an independent driver fold) and on
  * the real sf tables where a global invariant must hold.
  */
class R9OperatorsSpec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double)]): String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(day: Int, hour: Int = 12): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, hour, 0)
        .plusDays(day.toLong - 1))

  test("growth accounting: crafted cohort ledger is exact and the " +
    "active = new + retained + resurrected identity holds on real data") {
    // months: Jan/Feb/Mar 2024. u1 active all three (new, ret, ret);
    // u2 active Jan+Mar (new, -, resurrected; churn reported in Feb);
    // u3 active Feb only (new; churn reported in Mar)
    val dir = eventsDir(Seq(
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(40), 1L, "view", 0.0),
      (3L, ts(70), 1L, "view", 0.0),
      (4L, ts(2), 2L, "view", 0.0), (5L, ts(71), 2L, "view", 0.0),
      (6L, ts(41), 3L, "view", 0.0)))
    val rows = Behavioral.growthAccounting(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val jan = 2024L * 12 + 0
    assert(rows(jan) == ((2L, 2L, 0L, 0L, 0L)), s"jan: ${rows(jan)}")
    assert(rows(jan + 1) == ((2L, 1L, 1L, 0L, 1L)),
      s"feb: new u3, retained u1, churned u2: ${rows(jan + 1)}")
    assert(rows(jan + 2) == ((2L, 0L, 1L, 1L, 1L)),
      s"mar: retained u1, resurrected u2, churned u3: ${rows(jan + 2)}")
    // real data: ledger identity per month
    Behavioral.growthAccounting(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"identity broken at mi=${r.getLong(0)}")
    }
  }

  test("stickiness: singleton law (one user, one day => 1/n_days of the " +
    "month's observed days) and (0,1] bounds on real data") {
    val dir = eventsDir(Seq(
      (1L, ts(1), 1L, "view", 0.0), (2L, ts(2), 1L, "view", 0.0),
      (3L, ts(3), 1L, "view", 0.0), (4L, ts(2), 2L, "view", 0.0)))
    // month has observed days {1,2,3}, users {1,2}: user-days = 4,
    // stickiness = 4 / (3 * 2)
    val r = Behavioral.stickiness(spark, dir).collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == math.rint(4.0 / 6.0 * 1e6) / 1e6)
    Behavioral.stickiness(spark, sf).collect().foreach { m =>
      assert(m.getDouble(4) > 0.0 && m.getDouble(4) <= 1.0)
    }
  }

  test("power users: deciles conserve user and event mass, cumulative " +
    "share closes at 1, the busiest user sits in decile 1") {
    val rows = Behavioral.powerUsers(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val events = graft.sources.Tables.events(spark, sf)
    assert(rows.map(_.getLong(1)).sum ==
      events.select(col("user_id")).distinct().count())
    assert(rows.map(_.getLong(2)).sum == events.count())
    assert(rows.last.getDouble(5) == 1.0, "cumulative share closes at 1")
    // per-user mean event count is non-increasing across deciles
    val means = rows.map(r => r.getLong(2).toDouble / r.getLong(1))
    means.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-9, s"decile mean order broken: $means")
    }
  }

  test("span corruption: crafted doc matches a driver replay of the " +
    "same md5 coin (starts, lengths, overlap-once union)") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9sc").toString
    val docId = 7L
    val toks = (1 to 40).map(i => s"tok$i")
    Seq((docId, toks.mkString(" "), "s1", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    // driver replay of the documented mechanism
    val coins = (1 to toks.length).map { p =>
      p -> Integer.parseInt(md5hex(s"$docId:$p").substring(0, 2), 16)
    }
    val starts = coins.filter(_._2 < 38)
    val masked = starts.flatMap { case (p, u) =>
      p to math.min(p + u % 3, toks.length)
    }.distinct
    val r = TextAnalysis.spanCorruption(spark, dir).collect().head
    assert(r.getLong(2) == toks.length.toLong, "token count")
    assert(r.getLong(3) == starts.length.toLong, s"spans: $starts")
    assert(r.getLong(4) == masked.length.toLong, "masked union")
  }

  test("cdc chunks: boundaries are content-defined (driver recount) and " +
    "a shared passage chunks identically at different offsets") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9cdc").toString
    // a long shared passage embedded at different offsets in two docs
    val passage = (1 to 60).map(i => s"p$i")
    val a = (1 to 7).map(i => s"a$i") ++ passage
    val b = (1 to 13).map(i => s"b$i") ++ passage
    Seq((1L, a.mkString(" "), "sa", "en"), (2L, b.mkString(" "), "sb", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    // independent driver implementation of the boundary rule + digests
    def chunksOf(toks: Seq[String]): Seq[String] = {
      val n = toks.length
      val cuts = ((3 to n).filter { p =>
        Integer.parseInt(
          md5hex(toks.slice(p - 3, p).mkString(" ")).substring(0, 2),
          16) < 32
      } :+ n).distinct
      cuts.zip(0 +: cuts.dropRight(1)).map { case (end, prev) =>
        md5hex(toks.slice(prev, end).mkString(" "))
      }
    }
    val expectA = chunksOf(a)
    val expectB = chunksOf(b)
    val got = Dedup.cdcChunks(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("sa") == ((expectA.length.toLong, a.length.toLong,
      expectA.distinct.length.toLong)), s"sa: $got vs $expectA")
    assert(got("sb") == ((expectB.length.toLong, b.length.toLong,
      expectB.distinct.length.toLong)))
    // offset invariance: interior chunks of the shared passage coincide
    // (only chunks straddling the prefix boundary may differ)
    assert(expectA.toSet.intersect(expectB.toSet).nonEmpty,
      "shared passage must produce shared chunk digests across offsets")
  }

  test("generalization ladder: coarser levels are never less safe on " +
    "nested grids, level 3 is one class per event type") {
    val rows = Privacy.generalizationCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    (0L to 2L).foreach { l =>
      assert(rows(l + 1).getLong(3) <= rows(l).getLong(3),
        s"rows_at_risk must be non-increasing from level $l")
      assert(rows(l + 1).getLong(1) <= rows(l).getLong(1),
        "classes shrink as bands coarsen")
    }
    val nTypes = graft.sources.Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(rows(3L).getLong(1) == nTypes,
      "full suppression leaves one class per event type")
  }

  test("inter-arrival histogram: crafted gaps land in their power-of-two " +
    "buckets with exact min/max") {
    // gaps within one type: 0µs, 1µs (bucket 1), 7µs (bucket 3),
    // 8µs (bucket 4); sub-ms offsets built via Instant nanos
    val base = java.time.Instant.ofEpochSecond(1700000000L)
    def tUs(us: Long) = java.sql.Timestamp.from(base.plusNanos(us * 1000L))
    val dir = eventsDir(Seq(
      (1L, tUs(0L), 1L, "x", 0.0), (2L, tUs(0L), 1L, "x", 0.0),
      (3L, tUs(1L), 1L, "x", 0.0), (4L, tUs(8L), 1L, "x", 0.0),
      (5L, tUs(16L), 1L, "x", 0.0)))
    val got = TimeSeries.interarrivalHist(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(0L) == ((1L, 0L, 0L)), "zero gap bucket")
    assert(got(1L) == ((1L, 1L, 1L)), "1µs -> bucket 1")
    assert(got(3L) == ((1L, 7L, 7L)), "7µs -> bucket 3 (111)")
    assert(got(4L) == ((1L, 8L, 8L)), "8µs -> bucket 4 (1000)")
  }

  test("cross correlation: lag 0 equals a driver Pearson over the day " +
    "panel; the lag grid is complete") {
    val rows = TimeSeries.crossCorr(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (-7L to 7L))
    val panel = graft.sources.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("di"),
        col("user_id"))
      .groupBy(col("di"))
      .agg(count(lit(1)).as("x"), countDistinct(col("user_id")).as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = panel.length.toDouble
    val (sx, sy) = (panel.map(_._1).sum, panel.map(_._2).sum)
    val sxx = panel.map(p => p._1 * p._1).sum
    val syy = panel.map(p => p._2 * p._2).sum
    val sxy = panel.map(p => p._1 * p._2).sum
    val expect = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = rows.find(_.getLong(0) == 0L).get.getDouble(2)
    assert(math.abs(got - expect) < 1e-6, s"lag0 $got vs $expect")
  }

  test("shard balance: mass conserves, routing is deterministic, skew " +
    "is centered on 1") {
    val r1 = Quality.shardBalance(spark, sf).collect()
    val r2 = Quality.shardBalance(spark, sf).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(r1.map(_.getLong(1)).sum == nDocs, "doc mass conserves")
    val meanSkew = r1.map(_.getDouble(3)).sum *
      (r1.map(_.getLong(1)).sum.toDouble / nDocs) / r1.length
    assert(math.abs(r1.map(r => r.getLong(1) * 32).sum.toDouble /
      (nDocs * r1.length) - 1.0) < 1e-9, s"skew centers on 1: $meanSkew")
  }

  test("federated quantile audit: every estimate is a data value and its " +
    "pooled rank interval sits within the documented N/B + sites bound") {
    val rows = Federation.federatedQuantileAudit(spark, sf).collect()
    assert(rows.length == 4)
    val n = rows.head.getLong(5).toDouble
    val bound = n / 16 + 5 // N/B + |sites| (order-priority domain)
    rows.foreach { r =>
      val p = r.getLong(0).toDouble / r.getLong(1)
      val (lo, hi) = (r.getLong(3).toDouble, r.getLong(4).toDouble)
      assert(p * n >= lo - bound && p * n <= hi + bound,
        s"p=$p est rank [$lo,$hi] target ${p * n} bound $bound")
    }
  }

  private def ordersDir(rows: Seq[(Long, Long, Double, String)],
      segments: Seq[(Long, String)]): String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9ord").toString
    rows.map { case (ok, ck, price, date) =>
      (ok, ck, "O", price, java.sql.Timestamp.valueOf(date + " 00:00:00"),
        "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    segments.map { case (ck, seg) => (ck, s"Customer#$ck", 0, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    dir
  }

  test("ltv cohort: crafted two-cohort ledger is exact; real-data " +
    "cumulative identity and bounds hold") {
    import graft.operators.Behavioral
    val dir = ordersDir(
      rows = Seq(
        (1L, 10L, 10.0, "2024-01-05"), // u10 cohort Jan
        (2L, 10L, 20.0, "2024-02-11"),
        (3L, 11L, 5.0, "2024-01-20"),  // u11 cohort Jan
        (4L, 12L, 7.0, "2024-02-02")), // u12 cohort Feb
      segments = Seq((10L, "A"), (11L, "A"), (12L, "B")))
    val r = Behavioral.ltvCohort(spark, dir).collect()
    val jan = (2024 * 12 + 1 - 1).toLong
    def cell(mi: Long, off: Long) = r.find(x =>
      x.getAs[Long]("cohort_mi") == mi && x.getAs[Long]("offset") == off).get
    assert(cell(jan, 0L).getAs[Long]("cohort_users") === 2L)
    assert(cell(jan, 0L).getAs[Long]("active_users") === 2L)
    assert(cell(jan, 0L).getAs[Long]("revenue_milli") === 15000L)
    assert(cell(jan, 1L).getAs[Long]("active_users") === 1L)
    assert(cell(jan, 1L).getAs[Long]("cum_revenue_milli") === 35000L)
    assert(cell(jan, 1L).getAs[Long]("ltv_per_user_milli") === 17500L)
    assert(cell(jan + 1, 0L).getAs[Long]("cohort_users") === 1L)
    assert(cell(jan + 1, 0L).getAs[Long]("ltv_per_user_milli") === 7000L)
    // real data: cum is monotone per cohort, active ≤ cohort size, and
    // the last cum equals the cohort's summed cells
    val real = Behavioral.ltvCohort(spark, sf).collect()
      .groupBy(_.getAs[Long]("cohort_mi"))
    real.foreach { case (_, cells) =>
      val sorted = cells.sortBy(_.getAs[Long]("offset"))
      val cums = sorted.map(_.getAs[Long]("cum_revenue_milli"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      assert(cums.last === sorted.map(_.getAs[Long]("revenue_milli")).sum)
      sorted.foreach(c => assert(c.getAs[Long]("active_users") <=
        c.getAs[Long]("cohort_users")))
    }
  }

  test("order gaps: crafted gap multiset yields the exact lower " +
    "median; tie-dates contribute zero gaps; real-data bounds hold") {
    import graft.operators.Behavioral
    // segment A, one customer: dates 1,2,4,104 → gaps {1,2,100};
    // segment B, one customer: same-day pair then +3 → gaps {0,3}
    val dir = ordersDir(
      rows = Seq(
        (1L, 10L, 1.0, "2024-01-01"), (2L, 10L, 1.0, "2024-01-02"),
        (3L, 10L, 1.0, "2024-01-04"), (4L, 10L, 1.0, "2024-04-13"),
        (5L, 20L, 1.0, "2024-01-01"), (6L, 20L, 1.0, "2024-01-01"),
        (7L, 20L, 1.0, "2024-01-04")),
      segments = Seq((10L, "A"), (20L, "B")))
    val r = Behavioral.orderGaps(spark, dir).collect()
    val a = r.find(_.getAs[String]("segment") == "A").get
    assert(a.getAs[Long]("n_gaps") === 3L)
    assert(a.getAs[Long]("min_gap") === 1L)
    assert(a.getAs[Long]("max_gap") === 100L)
    assert(a.getAs[Long]("median_gap") === 2L)
    assert(math.abs(a.getAs[Double]("avg_gap") - 34.333333) < 1e-9)
    val b = r.find(_.getAs[String]("segment") == "B").get
    assert(b.getAs[Long]("n_gaps") === 2L)
    assert(b.getAs[Long]("min_gap") === 0L)  // the same-day pair
    assert(b.getAs[Long]("median_gap") === 0L) // lower median of {0,3}
    // real data: ordering invariants per segment
    Behavioral.orderGaps(spark, sf).collect().foreach { s =>
      val (mn, md, mx) = (s.getAs[Long]("min_gap"),
        s.getAs[Long]("median_gap"), s.getAs[Long]("max_gap"))
      assert(mn <= md && md <= mx)
      val avg = s.getAs[Double]("avg_gap")
      assert(avg >= mn.toDouble && avg <= mx.toDouble)
    }
  }

  test("sttr: constant doc scores 1/w per window, all-distinct doc " +
    "scores 1.0, short docs drop; real-data bounds hold") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9st").toString
    Seq(
      (1L, Seq.fill(40)("x").mkString(" "), "en", "s", 40L),
      (2L, (0 until 40).map(i => s"w$i").mkString(" "), "en", "s", 40L),
      (3L, Seq.fill(19)("y").mkString(" "), "en", "s", 19L), // < 1 window
      (4L, (Seq.fill(20)("a") ++ (0 until 25).map(i => s"z$i"))
        .mkString(" "), "en", "s", 45L)) // 2 windows: 1 + 20 distinct
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextAnalysis.sttr(spark, dir).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L, 4L))
    def row(id: Long) = r.find(_.getAs[Long]("doc_id") == id).get
    assert(row(1L).getAs[Long]("n_windows") === 2L)
    assert(row(1L).getAs[Long]("distinct_sum") === 2L)
    assert(math.abs(row(1L).getAs[Double]("sttr") - 0.05) < 1e-12)
    assert(math.abs(row(2L).getAs[Double]("sttr") - 1.0) < 1e-12)
    // doc 4: window 1 all 'a' (1 type), window 2 = 20 distinct z's
    assert(row(4L).getAs[Long]("distinct_sum") === 21L)
    assert(math.abs(row(4L).getAs[Double]("sttr") - 21.0 / 40.0) < 1e-12)
    graft.operators.TextAnalysis.sttr(spark, sf).collect().foreach { x =>
      val s = x.getAs[Double]("sttr")
      assert(s > 0.0 && s <= 1.0)
      assert(x.getAs[Long]("distinct_sum") <=
        x.getAs[Long]("n_windows") * 20L)
      assert(x.getAs[Long]("n_windows") === x.getAs[Long]("n_tokens") / 20L)
    }
  }

  test("node jaccard: crafted co-order graph is exact; real-data " +
    "inclusion-exclusion identity holds") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9nj").toString
    // orders: 1:{p1,p2,p3} 2:{p1,p2} 3:{p1,p2} 4:{p3}
    Seq((1L, 101L), (1L, 102L), (1L, 103L), (2L, 101L), (2L, 102L),
      (3L, 101L), (3L, 102L), (4L, 103L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = graft.operators.Graph.nodeJaccard(spark, dir).collect()
    assert(r.length === 1) // only (p1,p2) reaches minSupport=2
    val p = r.head
    assert(p.getAs[Long]("part_a") === 101L)
    assert(p.getAs[Long]("part_b") === 102L)
    assert(p.getAs[Long]("n_common") === 3L)
    assert(p.getAs[Long]("n_union") === 3L) // {o1,o2,o3}
    assert(math.abs(p.getAs[Double]("jaccard") - 1.0) < 1e-12)
    graft.operators.Graph.nodeJaccard(spark, sf).collect().foreach { x =>
      assert(x.getAs[Long]("n_union") === x.getAs[Long]("n_a") +
        x.getAs[Long]("n_b") - x.getAs[Long]("n_common"))
      val j = x.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("sax symbols: monotone series spells abcd, ties split by day, " +
    "run count is exact; real-data signature length law") {
    import graft.operators.TimeSeries
    // type m: counts 1,2,3,4 over days 1..4 → quartiles in day order;
    // type t: all-tied counts — ntile still forces abcd (rank-based
    // breakpoints, day tiebreak); type s: one day → 'a'
    val dir = eventsDir(
      (1 to 4).flatMap(d => (1 to d).map(i =>
        ((d * 10 + i).toLong, ts(d), 1L, "m", 1.0))) ++
      (1 to 4).flatMap(d => (1 to 2).map(i =>
        ((100 + d * 10 + i).toLong, ts(d), 1L, "t", 1.0))) ++
      Seq((900L, ts(1), 1L, "s", 1.0)))
    val r = TimeSeries.saxSymbols(spark, dir).collect()
    def row(t: String) = r.find(_.getAs[String]("event_type") == t).get
    assert(row("m").getAs[String]("sax") === "abcd")
    assert(row("m").getAs[Long]("n_runs") === 4L)
    assert(row("t").getAs[String]("sax") === "abcd")
    assert(row("s").getAs[String]("sax") === "a")
    assert(row("s").getAs[Long]("n_runs") === 1L)
    TimeSeries.saxSymbols(spark, sf).collect().foreach { x =>
      assert(x.getAs[String]("sax").length.toLong ===
        x.getAs[Long]("n_days"))
      assert(x.getAs[Long]("n_runs") >= 1L)
      assert(x.getAs[Long]("n_runs") <= x.getAs[Long]("n_days"))
      assert(x.getAs[String]("sax").forall(c => c >= 'a' && c <= 'd'))
    }
  }

  test("pq codes: coverable crafted data quantizes at zero error; " +
    "encoding is deterministic; capacity law holds on real data") {
    import graft.operators.Similarity
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9pq").toString
    // two whole-vector patterns; the first 16 vec_ids (the seeds)
    // contain both, so every vector sits exactly on a centroid
    val a = Array.fill(64)(1.0f); val b = Array.fill(64)(-1.0f)
    (0L until 40L).map(i => (i, if (i % 2 == 0) a else b, 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = Similarity.pqCodes(spark, dir).collect()
    assert(r.length === 40)
    assert(r.forall(_.getAs[Double]("err") === 0.0))
    val codesByPattern = r.groupBy(_.getAs[Long]("vec_id") % 2)
      .view.mapValues(_.map(_.getAs[String]("code")).toSet).toMap
    assert(codesByPattern(0L).size === 1 && codesByPattern(1L).size === 1)
    assert(codesByPattern(0L) != codesByPattern(1L))
    // determinism + capacity on the real embeddings
    val e1 = Similarity.pqCodes(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val e2 = Similarity.pqCodes(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    assert(e1 === e2, "PQ encoding must be deterministic")
    val err16 = Similarity.pqCodes(spark, sf)
      .agg(sum(col("err"))).head().getDouble(0)
    val err1 = Similarity.pqCodes(spark, sf, codebookK = 1)
      .agg(sum(col("err"))).head().getDouble(0)
    assert(err16 < err1,
      s"16-entry codebooks must beat the rank-0 mean codebook " +
        s"($err16 vs $err1)")
    Similarity.pqCodes(spark, sf).collect().foreach { x =>
      assert(x.getAs[Double]("err") >= 0.0)
      val parts = x.getAs[String]("code").split("-").map(_.toInt)
      assert(parts.length === 4 && parts.forall(c => c >= 1 && c <= 16))
    }
  }

  test("attribution: crafted first/last-touch credits are exact, the " +
    "lookback window excludes stale touches, and the ledger closes") {
    import graft.operators.Behavioral
    val dir = eventsDir(Seq(
      // u1: signup d1 → view d2 → purchase d3: first=signup, last=view
      (1L, ts(1), 1L, "signup", 0.0), (2L, ts(2), 1L, "view", 0.0),
      (3L, ts(3), 1L, "purchase", 9.0),
      // u2: bare purchase → (none)
      (4L, ts(5), 2L, "purchase", 5.0),
      // u3: click 10 days before purchase — outside the 7d lookback
      (5L, ts(1), 3L, "click", 0.0), (6L, ts(11), 3L, "purchase", 7.0)))
    val r = Behavioral.attribution(spark, dir).collect()
    def row(c: String) = r.find(_.getAs[String]("channel") == c)
    assert(row("signup").get.getAs[Long]("first_touch") === 1L)
    assert(row("signup").get.getAs[Long]("last_touch") === 0L)
    assert(row("view").get.getAs[Long]("first_touch") === 0L)
    assert(row("view").get.getAs[Long]("last_touch") === 1L)
    assert(row("(none)").get.getAs[Long]("first_touch") === 2L)
    assert(row("click").isEmpty, "stale touch must earn no credit")
    // ledger law on real data: both columns sum to the purchase count
    val real = Behavioral.attribution(spark, sf).collect()
    val nPurch = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(real.map(_.getAs[Long]("first_touch")).sum === nPurch)
    assert(real.map(_.getAs[Long]("last_touch")).sum === nPurch)
  }

  test("pq recall audit: lossless crafted data scores recall 1.0; " +
    "real-data audit is deterministic and bounded") {
    import graft.operators.Similarity
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r9pr").toString
    // 4 whole-vector patterns, all inside the 16 seeds → PQ is
    // LOSSLESS, so the ADC ranking must reproduce the exact ranking
    val pats = (0 until 4).map(p => Array.fill(64)(p.toFloat - 1.5f))
    (0L until 48L).map(i => (i, pats((i % 4).toInt), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = Similarity.pqRecallAudit(spark, dir, nQueries = 8, k = 3)
      .collect().head
    assert(r.getAs[Long]("n_queries") === 8L)
    assert(r.getAs[Double]("min_recall") === 1.0,
      "zero reconstruction error must preserve every exact neighbor")
    // real data: deterministic, bounded — and honest about random
    // embeddings compressing badly (that is the audit's purpose)
    val a = Similarity.pqRecallAudit(spark, sf).collect().head
    val b = Similarity.pqRecallAudit(spark, sf).collect().head
    assert(a.toString === b.toString, "audit must be deterministic")
    val mean = a.getAs[Double]("mean_recall")
    assert(mean >= 0.0 && mean <= 1.0)
    assert(a.getAs[Double]("min_recall") <= mean)
    // m-generic plumbing (the tables column is m × K): m=8 audits the
    // same lossless corpus at 8 subspaces of 8 dims — still lossless,
    // recall stays 1.0
    val r8 = Similarity.pqRecallAudit(spark, dir, nQueries = 8, k = 3,
      m = 8).collect().head
    assert(r8.getAs[Double]("min_recall") === 1.0,
      s"m=8 lossless audit must read 1.0: $r8")
  }
}
