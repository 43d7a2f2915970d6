package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel / retention / anomaly invariants at sf0.001. */
class BehavioralSpec extends AnyFunSuite {
  import TestSpark._

  test("funnel: stage timestamps strictly increase, reached count " +
    "equals the non-null prefix") {
    val f = graft.operators.Behavioral.funnel(spark, sf)
    assert(f.count() > 0)
    // strict ordering wherever two consecutive stages completed
    assert(f.filter(col("t_view") <= col("t_signup")).count() == 0)
    assert(f.filter(col("t_purchase") <= col("t_view")).count() == 0)
    // stages_reached == number of non-null stage columns, and the
    // non-nulls form a prefix (no stage skipped)
    val bad = f.filter(
      col("stages_reached") =!=
        (col("t_signup").isNotNull.cast("long") +
         col("t_view").isNotNull.cast("long") +
         col("t_purchase").isNotNull.cast("long")) ||
      (col("t_view").isNotNull && col("t_signup").isNull) ||
      (col("t_purchase").isNotNull && col("t_view").isNull)).count()
    assert(bad == 0, "stage columns must be a strictly-ordered prefix")
  }

  test("funnel: fold result equals the staged-min self-join reference") {
    val fold = graft.operators.Behavioral.funnel(spark, sf)
    val ev = graft.sources.Tables.events(spark, sf)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view").join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val ref = ev.select(col("user_id")).distinct()
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        (col("t1").isNotNull.cast("long") + col("t2").isNotNull.cast("long") +
          col("t3").isNotNull.cast("long")).as("stages_reached"),
        col("t1").as("t_signup"), col("t2").as("t_view"),
        col("t3").as("t_purchase"))
      .orderBy(col("user_id"))
    assert(fold.collect().map(_.toString)
      .sameElements(ref.collect().map(_.toString)),
      "one-shuffle fold must equal the |stages|-shuffle staged joins")
  }

  test("retention: offset zero covers the whole cohort, activity never " +
    "exceeds cohort size") {
    val r = graft.operators.Behavioral.retention(spark, sf).collect()
    assert(r.nonEmpty)
    val cohortSize = r.filter(_.getLong(1) == 0L)
      .map(x => x.getTimestamp(0) -> x.getLong(2)).toMap
    // every user is active in their own first week by definition
    r.foreach { row =>
      val size = cohortSize(row.getTimestamp(0))
      assert(row.getLong(2) <= size,
        s"cohort ${row.getTimestamp(0)} offset ${row.getLong(1)}: " +
          s"${row.getLong(2)} > cohort size $size")
    }
  }

  test("anomaly score: deterministic, scores finite, nulls only from " +
    "short or flat trailing windows") {
    val a = graft.operators.Behavioral.anomalyScore(spark, sf)
    val rows = a.collect()
    assert(rows.sameElements(
      graft.operators.Behavioral.anomalyScore(spark, sf).collect()))
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    }
    // the first 12 buckets of every series must be null-scored
    val firstNonNull = a
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("bucket"))))
      .filter(col("z").isNotNull && col("rk") <= 12).count()
    assert(firstNonNull == 0, "scores inside the warmup prefix must be null")
  }

  test("decayed engagement: stepped half-life weights are exact dyadics") {
    val sp = spark
    import sp.implicits._
    def t(day: String) = java.sql.Timestamp.valueOf(s"$day 10:00:00")
    // user 1: events at ref (w=1), ref-7d (w=1/2), ref-14d (w=1/4),
    // ref-15d (same week bucket, w=1/4) → 2.0 exactly; user 2: only
    // the ref-day event of another user sets ref, their own is 21d old
    val df = Seq(
      (1L, t("2024-03-31")), (1L, t("2024-03-24")),
      (1L, t("2024-03-17")), (1L, t("2024-03-16")),
      (2L, t("2024-03-10"))
    ).toDF("user_id", "ts")
    val res = graft.operators.Behavioral.decayedEngagementOn(df)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(res(1L) === ((1.0 + 0.5 + 0.25 + 0.25, 4L)))
    assert(res(2L) === ((0.125, 1L)), "21 days = 3 half-lives → 1/8")
  }

  test("decayed engagement: real-log invariants and dyadic exactness") {
    val df = graft.operators.Behavioral.decayedEngagement(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (eng, n) = (r.getDouble(1), r.getLong(2))
      assert(eng > 0.0 && eng <= n.toDouble,
        s"engagement $eng outside (0, n_events=$n]")
      // 30-day span / 7-day half-life → k <= 4: engagement scaled by
      // 2^4 must be integral (the exactness contract the oracle
      // comparison relies on)
      val scaled = eng * 16.0
      assert(scaled == math.floor(scaled), s"non-dyadic engagement $eng")
    }
    // one row per active user
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.length.toLong == users)
  }

  test("decayed engagement: integer-unit accumulation stays exact beyond " +
    "a 53-bit weight span (64 recent events + one 54-half-life-old one)") {
    val sp = spark
    import sp.implicits._
    def t(day: java.time.LocalDate) =
      java.sql.Timestamp.valueOf(day.atTime(10, 0))
    val ref = java.time.LocalDate.parse("2024-03-31")
    // 64 ref-day events (2^62 units each) + one event 54 half-lives old
    // (2^8 units): the exact unit sum 2^68 + 2^8 spans 61 bits — a plain
    // double accumulation would make the result depend on summation
    // order, silently breaking the determinism/oracle contract
    val rows = (1 to 64).map(_ => (1L, t(ref))) :+ (1L, t(ref.minusDays(54L * 7)))
    val df = rows.toDF("user_id", "ts")
    // driver-side expectation: the exact integer sum, correctly rounded
    // to double ONCE, then an exact power-of-two division
    val exactUnits = (BigInt(2).pow(68) + BigInt(2).pow(8)).bigInteger
    val expected =
      new java.math.BigDecimal(exactUnits).doubleValue() / 4611686018427387904.0
    val base = graft.operators.Behavioral.decayedEngagementOn(df)
      .collect().head.getDouble(1)
    assert(java.lang.Double.doubleToLongBits(base) ==
      java.lang.Double.doubleToLongBits(expected),
      s"engagement $base != correctly-rounded exact value $expected")
    // bit-identical under reversed input order and a different
    // partitioning — the property the dyadic claim promises
    val shuffled = graft.operators.Behavioral.decayedEngagementOn(
        rows.reverse.toDF("user_id", "ts").repartition(13))
      .collect().head.getDouble(1)
    assert(java.lang.Double.doubleToLongBits(shuffled) ==
      java.lang.Double.doubleToLongBits(base),
      "engagement must be partition/order independent")
  }

  test("sliding distinct: scatter construction equals a driver recount, " +
    "partial leading windows included") {
    val res = graft.operators.Temporal.slidingDistinct(spark, sf).collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    val userDays = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
    val maxDay = userDays.map(_._2).max
    // driver recount with the textbook BETWEEN semantics
    val allEnds = userDays.flatMap { case (_, d) =>
      (0 until 7).map(i => d.plusDays(i.toLong)) }.distinct
      .filter(!_.isAfter(maxDay))
    val expect = allEnds.map { e =>
      e.toString -> userDays.collect {
        case (u, d) if !d.isAfter(e) && !d.isBefore(e.minusDays(6)) => u
      }.distinct.length.toLong
    }.toMap
    assert(res === expect)
    // leading partial window: the first active day counts only itself
    val firstDay = userDays.map(_._2).min
    val firstDayUsers = userDays.filter(_._2 == firstDay).map(_._1).distinct.length
    assert(res(firstDay.toString) == firstDayUsers.toLong)
  }

  test("session paths: counts equal a driver walk with the 30-minute gap " +
    "and 8-step truncation") {
    val got = graft.operators.Temporal.sessionPaths(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sessions"))
    assert(got.nonEmpty && got.length <= 20)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        (r.getLong(0), (t.getTime / 1000) * 1000000L + t.getNanos / 1000,
          r.getLong(2), r.getString(3))
      }
    val paths = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev != Long.MinValue && r._2 - prev > 1800000000L)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += r._4
        prev = r._2
      }
      sessions.map(_.take(8).mkString(" > "))
    }
    val expect = paths.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every reported path matches the driver count; the report is the
    // top-20 under (count desc, path)
    got.foreach { case (p, n) =>
      assert(expect.getOrElse(p, -1L) == n, s"path '$p'") }
    val cut = expect.toSeq.sortBy { case (p, n) => (-n, p) }.take(got.length)
    assert(got.toSeq == cut, "report must be the exact top-N slice")
  }

  test("ab lift: cohort counts equal a driver recount; degenerate pooled " +
    "variance emits a null z, not a division error") {
    val row = graft.operators.Behavioral.abLift(spark, sf).collect().head
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val conv = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.exists(_._2 == "purchase") }
    def cnt(par: Long) = conv.count(_._1 % 2 == par).toLong
    def cv(par: Long) = conv.count(kv => kv._1 % 2 == par && kv._2).toLong
    assert(row.getAs[Long]("n_a") == cnt(0) && row.getAs[Long]("conv_a") == cv(0))
    assert(row.getAs[Long]("n_b") == cnt(1) && row.getAs[Long]("conv_b") == cv(1))
    val pooled = (cv(0) + cv(1)).toDouble / (cnt(0) + cnt(1))
    if (pooled == 0.0 || pooled == 1.0)
      assert(row.isNullAt(row.fieldIndex("z")),
        "zero pooled variance must null the z statistic")
    else {
      val z = row.getAs[Double]("z")
      val expect = (cv(0).toDouble / cnt(0) - cv(1).toDouble / cnt(1)) /
        math.sqrt(pooled * (1.0 - pooled) * (1.0 / cnt(0) + 1.0 / cnt(1)))
      assert(math.abs(z - expect) < 1e-6)
    }
  }

  test("churn labels: label and features equal a driver recount, and no " +
    "churned user has a label-window event (leakage closure)") {
    val got = graft.operators.Behavioral.churnLabels(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_types"),
          r.getAs[Long]("recency_days"), r.getAs[Long]("churned"))).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("date").cast("string"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1)),
        r.getString(2)))
    val cut = ev.map(_._2).max.minusDays(7)
    val pre = ev.filter(!_._2.isAfter(cut))
    val post = ev.filter(_._2.isAfter(cut)).map(_._1).toSet
    val expect = pre.groupBy(_._1).map { case (u, rows) =>
      u -> (rows.length.toLong, rows.map(_._3).distinct.length.toLong,
        java.time.temporal.ChronoUnit.DAYS.between(rows.map(_._2).max, cut),
        if (post(u)) 0L else 1L)
    }
    assert(got == expect, "driver recount disagrees")
    // only observation-window users carry labels; churned means silent
    // after the cut BY the raw log, not just by the query's own filter
    assert(got.keySet == pre.map(_._1).toSet)
    got.foreach { case (u, (_, _, _, churned)) =>
      assert((churned == 1L) == !post(u), s"user $u mislabeled")
    }
  }

  test("markov transitions: counts equal a driver walk of every user's " +
      "timeline, row probabilities sum to one") {
    val got = graft.operators.Behavioral.markovTransitions(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    // driver reference: per user, sort by (ts, event_id), emit
    // consecutive pairs
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        // full sub-second precision — .getTime alone is ms-truncated
        // and a µs-level tie would flip the driver's sort order
        (r.getLong(0), (t.getTime / 1000) * 1000000000L + t.getNanos,
          r.getLong(2), r.getString(3))
      }
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._4)
      sorted.zip(sorted.tail)
    }.toSeq
    val expectN = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap == expectN,
      "transition counts disagree with the driver walk")
    // total transitions = events - users with at least one event
    val nUsers = ev.map(_._1).distinct.length
    assert(got.values.map(_._1).sum == ev.length - nUsers)
    // each from-row's probabilities sum to 1 up to rounding grain
    got.keys.toSeq.groupBy(_._1).foreach { case (from, ks) =>
      // toSeq first — a key SET mapped to p values would collapse
      // duplicate probabilities before the sum
      val s = ks.map(got(_)._2).sum
      assert(math.abs(s - 1.0) < 1e-4, s"row $from sums to $s")
    }
  }

  test("burst days: flags reproduce the integer inequality from a raw " +
    "recount and each flagged day's float z clears the threshold") {
    import org.apache.spark.sql.functions._
    val zInt = 2
    val got = graft.operators.Behavioral.burstDays(spark, sf, zInt).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3)))
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val d = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val q = rows.map(r => BigInt(r._3) * r._3).sum
      val varTerm = d * q - s * s
      rows.flatMap { case (_, day, n) =>
        val dev = BigInt(n) * d - s
        val excess = dev * dev - zInt * zInt * varTerm
        if (dev > 0 && excess > 0) Some((tpe, day, n, excess.toLong)) else None
      }
    }.toSet
    assert(got.toSet == expect, "flag set disagrees with the driver recount")
    assert(got.nonEmpty, "the log should contain at least one 2-sigma day")
    // float cross-check: flagged ⇒ z > zInt under population sigma
    for ((tpe, day, n, _) <- got) {
      val rows = daily.filter(_._1 == tpe)
      val mu = rows.map(_._3).sum.toDouble / rows.length
      val sigma = math.sqrt(
        rows.map(r => (r._3 - mu) * (r._3 - mu)).sum / rows.length)
      assert(n > mu + zInt * sigma - 1e-9, s"$tpe/$day float z disagrees")
    }
  }

  test("rfm: quintiles reproduce ntile over the declared total order, " +
    "sizes balance within 1, segment is the concatenation, and spend " +
    "recounts integer-exactly from raw events") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Behavioral.rfmSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    def ntiles(n: Int, k: Int): Seq[Long] = {
      val base = n / k; val rem = n % k
      (0 until k).flatMap(b =>
        Seq.fill(base + (if (b < rem) 1 else 0))(b + 1L))
    }
    // exact ntile recount per metric, ordered by (metric, user_id)
    val metricIdx = Seq((1, 4), (2, 5), (3, 6)) // (metric col, quintile col)
    for ((m, q) <- metricIdx) {
      val sorted = rows.sortBy(r => (r.getLong(m), r.getLong(0)))
      assert(sorted.map(_.getLong(q)).toSeq == ntiles(n, 5),
        s"quintile col $q is not ntile(5) over its metric")
      val sizes = rows.groupBy(_.getLong(q)).view.mapValues(_.size).values
      assert(sizes.max - sizes.min <= 1, "quintile sizes unbalanced")
    }
    rows.foreach(r => assert(r.getString(7) ==
      s"${r.getLong(4)}${r.getLong(5)}${r.getLong(6)}"))
    // integer-milli spend recount for the top spender
    val top = rows.maxBy(_.getLong(3))
    val raw = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") === top.getLong(0))
      .select(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
      .collect().map(_.getLong(0)).sum
    assert(raw == top.getLong(3), "monetary milli-units disagree with raw")
  }

  test("windowed funnel: strict order and the entry-anchored window " +
    "gate conversions exactly; real-data stages are monotone and " +
    "stage 1 recounts") {
    val sp = spark
    import sp.implicits._
    val dirW = java.nio.file.Files.createTempDirectory("graft-wf").toString
    def at(d: Int, h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1 + d, h, 0))
    // u1 converts fully; u2's click lands outside the 7-day window;
    // u3's purchase precedes any click (strict order blocks stage 3
    // AND stage 2 never fires); u4 never signs up
    Seq((1L, at(0, 0), 1L, "signup", 0.0, "{}"),
      (2L, at(1, 0), 1L, "click", 0.0, "{}"),
      (3L, at(2, 0), 1L, "purchase", 0.0, "{}"),
      (4L, at(0, 0), 2L, "signup", 0.0, "{}"),
      (5L, at(8, 0), 2L, "click", 0.0, "{}"),
      (6L, at(0, 0), 3L, "signup", 0.0, "{}"),
      (7L, at(1, 0), 3L, "purchase", 0.0, "{}"),
      (8L, at(0, 0), 4L, "click", 0.0, "{}"),
      (9L, at(1, 0), 4L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dirW/events.parquet")
    val rows = graft.operators.Behavioral.windowedFunnel(sp, dirW)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(2) == 3L && rows(1L).getDouble(3) == 1.0)
    assert(rows(2L).getLong(2) == 1L &&
      rows(2L).getDouble(3) == 0.333333)
    assert(rows(3L).getLong(2) == 1L &&
      rows(3L).getDouble(3) == 0.333333)
    // real data: stages shrink monotonically; stage 1 is exactly the
    // distinct signup population
    val real = graft.operators.Behavioral.windowedFunnel(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(real.length == 3)
    val ns = real.map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2))
    val signups = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(ns(0) == signups)
  }

  test("hour profile: fully concentrated crafted type reads the " +
    "closed-form chi-square grid; real-data cells cover 24 hours and " +
    "close to the type totals") {
    val sp = spark
    import sp.implicits._
    val dirH = java.nio.file.Files.createTempDirectory("graft-hour").toString
    def at(h: Int, m: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 3, 1, h, m))
    // type A: 24 events all in hour 3 -> h3 contrib = 552^2/576 = 529,
    // every other cell (0-24)^2/576 = 1; total chi2 = 23T = 552
    val evs = (0 until 24).map(i => (i.toLong, at(3, i), 1L, "A", 0.0, "{}"))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dirH/events.parquet")
    val rows = graft.operators.Behavioral.hourProfile(sp, dirH).collect()
    assert(rows.length == 24, "dense grid: all 24 hours present")
    rows.foreach { r =>
      assert(r.getLong(3) == 24L)
      if (r.getLong(1) == 3L)
        assert(r.getLong(2) == 24L && r.getDouble(4) == 529.0)
      else assert(r.getLong(2) == 0L && r.getDouble(4) == 1.0)
    }
    // real data: 24 rows per type, observed mass closes to the total
    val real = graft.operators.Behavioral.hourProfile(spark, sf).collect()
    real.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.length == 24, s"$t grid density")
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3), s"$t closure")
      assert(rs.forall(_.getLong(3) == rs.head.getLong(3)))
    }
  }
}
