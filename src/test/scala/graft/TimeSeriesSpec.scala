package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Quality, TimeSeries}
import graft.sources.Tables

/** Semantic checks for the time-series audit batch (lag-k
  * autocorrelation, CUSUM change point, per-source KS drift) — crafted
  * fixtures pin the algebra (constant ⇒ NULL, periodic ⇒ lag peak,
  * step ⇒ boundary argmax, identical ⇒ 0, disjoint ⇒ 1) and driver
  * recounts tie the real-data results to the raw tables, so a
  * "both engines wrong the same way" bug can't hide behind the oracle
  * hash match.
  */
class TimeSeriesSpec extends AnyFunSuite {
  import TestSpark._

  private def day(i: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(1995, 1, 1).plusDays(i.toLong).atStartOfDay())

  test("autocorr: constant series reports NULL, period-2 alternation " +
    "peaks at even lags, real-data moments recount in BigInt") {
    val sp = spark
    import sp.implicits._
    // constant series: variance 0 on both legs -> NULL, never div-zero
    val const = (0 until 14).flatMap(i => Seq.fill(3)(day(i)))
      .toDF("o_orderdate")
    val cRows = TimeSeries.autocorrOn(const).collect()
    assert(cRows.length == 7)
    assert(cRows.forall(_.isNullAt(2)), "constant series must be NULL")
    // strict 2/6 alternation over 14 days: lag-2 pairs are identical
    // series (r = 1), lag-1 pairs anti-align (r < 0)
    val alt = (0 until 14).flatMap(i =>
      Seq.fill(if (i % 2 == 0) 2 else 6)(day(i))).toDF("o_orderdate")
    val aRows = TimeSeries.autocorrOn(alt).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) Double.NaN
        else r.getDouble(2))).toMap
    assert(aRows(2L) == 1.0 && aRows(4L) == 1.0 && aRows(6L) == 1.0)
    assert(aRows(1L) < -0.9 && aRows(3L) < -0.9)
    // real data: dense spine means n_pairs = n_days - lag, and the
    // lag-1 r reproduces from a BigInt moment fold over the raw counts
    val res = TimeSeries.autocorr(spark, sf).collect()
    val daily = Tables.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val d0 = daily.keys.min; val d1 = daily.keys.max
    val msDay = 86400000L
    val xs = (d0 to d1 by msDay).map(t => daily.getOrElse(t, 0L))
    res.foreach { r =>
      val lag = r.getLong(0).toInt
      assert(r.getLong(1) == xs.length - lag, s"n_pairs at lag $lag")
      val pairs = xs.dropRight(lag).zip(xs.drop(lag))
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      if (vx > 0 && vy > 0) {
        val want = BigDecimal((n * sxy - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(2) - want) < 2e-6,
          s"lag $lag: got ${r.getDouble(2)}, recount $want")
        assert(math.abs(r.getDouble(2)) <= 1.0)
      } else assert(r.isNullAt(2))
    }
  }

  test("cusum: step series puts the change point on the boundary with " +
    "the exact cleared statistic; real-data max recounts") {
    val sp = spark
    import sp.implicits._
    // 10 days of 1/day then 10 days of 5/day: T=20, S=60; at t=10
    // D = |20*10 - 10*60| = 400, the global max
    val step = ((0 until 10).map(i => (day(i), 1)) ++
      (10 until 20).map(i => (day(i), 5)))
      .flatMap { case (d, n) => Seq.fill(n)(d) }.toDF("o_orderdate")
    val top = TimeSeries.cusumChangepointOn(step, topK = 1).collect().head
    assert(top.getTimestamp(0) == day(9), "argmax must be the last " +
      "low-regime day")
    assert(top.getLong(1) == 10L && top.getLong(2) == 10L)
    assert(top.getLong(3) == 400L)
    assert(top.getDouble(4) == BigDecimal(400.0 / (20 * 60))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // real data: the reported max equals a driver fold over the dense
    // daily series
    val res = TimeSeries.cusumChangepoint(spark, sf).collect()
    assert(res.length == 5)
    val daily = Tables.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val msDay = 86400000L
    val xs = (daily.keys.min to daily.keys.max by msDay)
      .map(t => daily.getOrElse(t, 0L))
    val total = xs.sum; val tDays = xs.length.toLong
    val dStats = xs.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
      case (cum, i) => math.abs(tDays * cum - (i + 1).toLong * total)
    }
    assert(res.head.getLong(3) == dStats.max, "top d_stat must recount")
    val sorted = res.map(_.getLong(3))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
  }

  test("ks drift: identical per-source distributions score 0, disjoint " +
    "supports score 1, real-data gaps recount from raw lengths") {
    val sp = spark
    import sp.implicits._
    // two sources, identical length multisets -> D = 0 for both
    val same = Seq(("a", 10L), ("a", 20L), ("a", 20L),
      ("b", 10L), ("b", 20L), ("b", 20L)).toDF("source", "n_chars")
    val sRows = Quality.ksDriftOn(same).collect()
    assert(sRows.length == 2 && sRows.forall(_.getDouble(4) == 0.0))
    assert(sRows.forall(_.getLong(3) == 0L))
    // disjoint supports -> some value separates them completely: D = 1
    val disj = Seq(("a", 1L), ("a", 2L), ("b", 100L), ("b", 200L))
      .toDF("source", "n_chars")
    val dRows = Quality.ksDriftOn(disj).collect()
    assert(dRows.forall(_.getDouble(4) == 1.0))
    // real data: one source's ks_num recounts from the raw lengths
    val res = Quality.ksDrift(spark, sf).collect()
    assert(res.nonEmpty)
    val lens = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val values = lens.map(_._2).distinct.sorted
    res.foreach { r =>
      val src = r.getString(0)
      val inS = lens.filter(_._1 == src).map(_._2)
      val rest = lens.filter(_._1 != src).map(_._2)
      assert(r.getLong(1) == inS.length.toLong)
      assert(r.getLong(2) == rest.length.toLong)
      val num = values.map { v =>
        math.abs(rest.length.toLong * inS.count(_ <= v) -
          inS.length.toLong * rest.count(_ <= v))
      }.max
      assert(r.getLong(3) == num, s"$src ks_num recount")
    }
  }

  test("theil-sen: exact linear series recovers its slope under a " +
    "planted outlier that breaks OLS; real-data median recounts") {
    val sp = spark
    import sp.implicits._
    // counts 1,2,...,14 per day (slope exactly 1), day 7 spiked to 100:
    // the pairwise-slope median stays 1.0 — the OLS slope does not
    val lin = (0 until 14).flatMap(i =>
      Seq.fill(if (i == 7) 100 else i + 1)(day(i))).toDF("o_orderdate")
    val row = TimeSeries.theilSenOn(lin).collect().head
    assert(row.getLong(0) == 14L && row.getLong(1) == 91L)
    assert(row.getDouble(2) == 1.0, s"robust slope ${row.getDouble(2)}")
    // real data: median of the driver-computed slope multiset
    val res = TimeSeries.theilSen(spark, sf).collect().head
    val daily = Tables.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val msDay = 86400000L
    val xs = (daily.keys.min to daily.keys.max by msDay)
      .map(t => daily.getOrElse(t, 0L)).toIndexedSeq
    val slopes = (for {
      i <- xs.indices; j <- (i + 1) until xs.length
    } yield (xs(j) - xs(i)).toDouble / (j - i)).sorted
    assert(res.getLong(1) == slopes.length.toLong)
    val mid = if (slopes.length % 2 == 1) slopes(slopes.length / 2)
      else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2
    assert(math.abs(res.getDouble(2) - mid) < 2e-6)
  }

  test("mann-kendall: strictly increasing series maxes S with z > 0, " +
    "strictly decreasing negates it, constant reports NULL") {
    val sp = spark
    import sp.implicits._
    val up = (0 until 10).flatMap(i => Seq.fill(i + 1)(day(i)))
      .toDF("o_orderdate")
    val u = TimeSeries.mannKendallOn(up).collect().head
    assert(u.getLong(1) == 45L, "all 45 pairs concordant")
    assert(u.getLong(2) == 10L * 9L * 25L, "no ties: full variance")
    assert(u.getDouble(3) > 0)
    val down = (0 until 10).flatMap(i => Seq.fill(10 - i)(day(i)))
      .toDF("o_orderdate")
    val d = TimeSeries.mannKendallOn(down).collect().head
    assert(d.getLong(1) == -45L && d.getDouble(3) < 0)
    assert(d.getDouble(3) == -u.getDouble(3), "symmetric correction")
    val const = (0 until 10).flatMap(_ => Seq(day(0))) // 1 day, n=1
      .toDF("o_orderdate")
    val c = TimeSeries.mannKendallOn(const).collect().head
    assert(c.getLong(2) == 0L && c.isNullAt(3), "degenerate variance")
  }

  test("ols: a planted exact plane (trend + weekend shift) is " +
    "recovered to the rounding grain") {
    val sp = spark
    import sp.implicits._
    // daily cents = 1000 + 10*t + 500*weekend(t), planted exactly:
    // emit one order per day of totalprice cents/100
    val rows = (0 until 28).map { i =>
      val d = day(i)
      val cal = java.util.Calendar.getInstance(
        java.util.TimeZone.getTimeZone("UTC"))
      cal.setTimeInMillis(d.getTime)
      val dow = cal.get(java.util.Calendar.DAY_OF_WEEK)
      val wk = if (dow == java.util.Calendar.SATURDAY ||
        dow == java.util.Calendar.SUNDAY) 1 else 0
      (d, (1000 + 10 * i + 500 * wk) / 100.0)
    }.toDF("o_orderdate", "o_totalprice")
    val r = TimeSeries.olsDailyRevenueOn(rows).collect().head
    assert(r.getLong(0) == 28L)
    assert(math.abs(r.getDouble(1) - 1000.0) < 1e-4, s"b0 ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 10.0) < 1e-4, s"b1 ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 500.0) < 1e-4, s"b2 ${r.getDouble(3)}")
    // real data executes with a full-rank design
    val real = TimeSeries.olsDailyRevenue(spark, sf).collect().head
    assert(real.getLong(0) > 0L && !real.isNullAt(1))
  }

  test("runs test: strict alternation maximizes runs (z > 0), block " +
    "split minimizes them (z < 0), counts recount") {
    val sp = spark
    import sp.implicits._
    // alternate 1 and 3 per day around median 2: runs = n
    val alt = (0 until 12).flatMap(i =>
      Seq.fill(if (i % 2 == 0) 1 else 3)(day(i))).toDF("o_orderdate")
    val a = TimeSeries.runsTestOn(alt).collect().head
    assert(a.getLong(0) == 6L && a.getLong(1) == 6L && a.getLong(2) == 12L)
    assert(a.getDouble(3) > 0, "alternation is too many runs")
    // first half low, second half high: exactly 2 runs
    val blk = (0 until 12).flatMap(i =>
      Seq.fill(if (i < 6) 1 else 3)(day(i))).toDF("o_orderdate")
    val b = TimeSeries.runsTestOn(blk).collect().head
    assert(b.getLong(2) == 2L)
    assert(b.getDouble(3) < 0, "blocks are too few runs")
    // real data: n_above + n_below = days minus median-equal days
    val real = TimeSeries.runsTest(spark, sf).collect().head
    assert(real.getLong(2) >= 1L &&
      real.getLong(2) <= real.getLong(0) + real.getLong(1))
  }

  test("seasonal decomposition: a planted pure weekly pattern recovers " +
    "its centered component exactly; real-data numerators recount") {
    val sp = spark
    import sp.implicits._
    // x_t = (t mod 7) + 1 with day 0 = Sunday: weekday d contributes
    // p_d = d, mean 4 -> seasonal_d = d - 4 exactly (every interior
    // 7-day window sums the full week)
    val weekly = (0 until 35).flatMap(i =>
      Seq.fill((i % 7) + 1)(day(i))).toDF("o_orderdate")
    val got = TimeSeries.seasonalDecompOn(weekly).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    (1L to 7L).foreach { d =>
      assert(got(d) == (d - 4).toDouble, s"dow $d: ${got(d)}")
    }
    // real data: s7_num per weekday recounts from the dense series
    val res = TimeSeries.seasonalDecomp(spark, sf).collect()
    assert(res.nonEmpty && res.length <= 7)
    val daily = Tables.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val msDay = 86400000L
    val days = (daily.keys.min to daily.keys.max by msDay).toIndexedSeq
    val xs = days.map(t => daily.getOrElse(t, 0L))
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    val want = (3 until days.length - 3).map { t =>
      cal.setTimeInMillis(days(t))
      val dow = cal.get(java.util.Calendar.DAY_OF_WEEK).toLong
      dow -> (7L * xs(t) - (t - 3 to t + 3).map(xs).sum)
    }.groupBy(_._1).map { case (d, vs) =>
      d -> (vs.length.toLong, vs.map(_._2).sum)
    }
    res.foreach { r =>
      val (n, s7) = want(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == s7,
        s"dow ${r.getLong(0)} recount")
    }
  }

  test("ewma: constant series smooths to itself with the dyadic " +
    "denominator law; real-data num/den recount exactly in BigInt") {
    val sp = spark
    import sp.implicits._
    // constant 3/day over 40 days: every smoothed reading is exactly 3
    // and den(t) = 2^32 - 2^(32-m) where m = min(t+1, 32) days seen
    val const = (0 until 40).flatMap(i => Seq.fill(3)(day(i)))
      .toDF("o_orderdate")
    val cRows = TimeSeries.ewmaOn(const).collect()
    assert(cRows.length == 40)
    cRows.zipWithIndex.foreach { case (r, t) =>
      val m = math.min(t + 1, 32)
      val den = (1L << 32) - (1L << (32 - m))
      assert(r.getLong(3) == den, s"day $t den")
      assert(r.getLong(2) == 3L * den, s"day $t num")
      assert(r.getDouble(4) == 3.0, s"day $t ewma")
    }
    // real data: fold the expected dyadic sums in the driver from the
    // raw daily counts and demand bit equality, smoothed value included
    val res = TimeSeries.ewma(spark, sf).collect()
    val daily = Tables.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val msDay = 86400000L
    val days = (daily.keys.min to daily.keys.max by msDay).toIndexedSeq
    val xs = days.map(t => daily.getOrElse(t, 0L))
    assert(res.length == days.length)
    res.zipWithIndex.foreach { case (r, t) =>
      val terms = (0 until math.min(t + 1, 32))
        .map(k => (xs(t - k) * (1L << (31 - k)), 1L << (31 - k)))
      val (num, den) = (terms.map(_._1).sum, terms.map(_._2).sum)
      assert(r.getTimestamp(0).getTime == days(t))
      assert(r.getLong(1) == xs(t), s"day $t x")
      assert(r.getLong(2) == num && r.getLong(3) == den, s"day $t sums")
      assert(r.getDouble(4) ==
        BigDecimal(num.toDouble / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"day $t ewma close")
    }
  }
}
