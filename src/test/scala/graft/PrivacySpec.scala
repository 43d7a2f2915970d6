package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

/** Semantic checks for the k-anonymity scan: crafted quasi-identifier
  * classes exercise every branch of the rescue ladder (safe class,
  * at-risk-but-rescuable, at-risk-and-unrescuable), and the testdata
  * run checks the cross-column invariants the oracle's hash can't
  * explain when they break.
  */
class PrivacySpec extends AnyFunSuite {
  import TestSpark._

  private def ts(day: String) = Timestamp.valueOf(s"$day 12:00:00")

  /** Three event types in one month, k=3:
    *  - "safe": one class with users 1,2,3 → not at risk.
    *  - "rescue": two same-month classes with 2 users each but 4
    *    distinct users at month level → at risk, generalization
    *    rescues.
    *  - "doomed": one class with 2 users, month total also 2 → at
    *    risk, not rescuable.
    */
  private def crafted = {
    val sp = spark
    import sp.implicits._
    Seq(
      ("safe", ts("2024-01-05"), 10.0, 1L),
      ("safe", ts("2024-01-05"), 20.0, 2L),
      ("safe", ts("2024-01-05"), 30.0, 3L),
      ("rescue", ts("2024-01-10"), 10.0, 10L),
      ("rescue", ts("2024-01-10"), 20.0, 11L),
      ("rescue", ts("2024-01-20"), 10.0, 12L),
      ("rescue", ts("2024-01-20"), 20.0, 13L),
      ("doomed", ts("2024-01-15"), 10.0, 20L),
      ("doomed", ts("2024-01-15"), 20.0, 21L)
    ).toDF("event_type", "ts", "value", "user_id")
  }

  test("k-anonymity: rescue ladder branches on crafted classes") {
    val rows = Privacy.kAnonymityOn(crafted, k = 3).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    // safe: 3 rows, 3 users, same value band (all < 100 → band 0)
    assert(rows(("safe", "2024-01-05")) === ((3L, 3L, false, false)))
    // rescue classes: 2 users each → at risk; month has 4 distinct
    // users → one generalization step rescues them
    assert(rows(("rescue", "2024-01-10")) === ((2L, 2L, true, true)))
    assert(rows(("rescue", "2024-01-20")) === ((2L, 2L, true, true)))
    // doomed: at risk and the month-level class is still under k
    assert(rows(("doomed", "2024-01-15")) === ((2L, 2L, true, false)))
  }

  test("k-anonymity: invariants hold on the real event log") {
    val df = Privacy.kAnonymity(spark, sf, k = 5).cache()
    try {
      assert(df.count() > 0)
      // distinct users never exceed rows in a class
      assert(df.filter(col("n_users") > col("n_rows")).isEmpty)
      // at_risk is exactly n_users < k
      assert(df.filter(col("at_risk") =!= (col("n_users") < 5)).isEmpty)
      // a rescue claim implies risk
      assert(df.filter(col("generalization_rescues") && !col("at_risk")).isEmpty)
      // rescuability is a month-level property: two at-risk classes of
      // the same (event_type, month) must agree on it
      val disagree = df.filter(col("at_risk"))
        .groupBy(col("event_type"), date_trunc("month", col("day")))
        .agg(countDistinct(col("generalization_rescues")).as("n"))
        .filter(col("n") > 1)
      assert(disagree.isEmpty, "rescue flag diverged within a month")
    } finally df.unpersist()
  }

  test("k-anonymity: k=1 marks nothing at risk") {
    val df = Privacy.kAnonymityOn(crafted, k = 1)
    assert(df.filter(col("at_risk")).isEmpty)
  }

  /** One day with 5 users all in band 0 (homogeneous, k-anonymous),
    * one day with 5 users over two bands (diverse), one day with 2
    * users in one band (small — k-anonymity's problem, not
    * l-diversity's). */
  private def craftedDiversity = {
    val sp = spark
    import sp.implicits._
    val rows =
      (1L to 5L).map(u => ("click", ts("2024-02-01"), 10.0, u)) ++
        (1L to 5L).map(u =>
          ("click", ts("2024-02-02"), if (u <= 3) 10.0 else 150.0, u)) ++
        Seq(("click", ts("2024-02-03"), 10.0, 1L),
          ("click", ts("2024-02-03"), 10.0, 2L))
    rows.toDF("event_type", "ts", "value", "user_id")
  }

  test("l-diversity: homogeneous k-anonymous class is the one flagged") {
    val rows = Privacy.lDiversityOn(craftedDiversity, k = 5, lMin = 2)
      .collect()
      .map(r => r.getTimestamp(1).toString.take(10) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))
      .toMap
    // 5 rows, 5 users, 1 band, dominant band holds all 5 → flagged
    assert(rows("2024-02-01") === ((5L, 5L, 1L, 5L, true)))
    // two bands (3 + 2 rows) → diverse, not flagged
    assert(rows("2024-02-02") === ((5L, 5L, 2L, 3L, false)))
    // small class: not k-anonymous, so homogeneity_risk stays false
    assert(rows("2024-02-03") === ((2L, 2L, 1L, 2L, false)))
  }

  /** One power user with 10 same-day rows, two one-row users the same
    * day, and a second day where the power user has exactly cap rows. */
  private def craftedBounding = {
    val sp = spark
    import sp.implicits._
    val rows =
      (1 to 10).map(_ => ("click", ts("2024-03-01"), 1.0, 100L)) ++
        Seq(("click", ts("2024-03-01"), 1.0, 101L),
          ("click", ts("2024-03-01"), 1.0, 102L)) ++
        (1 to 3).map(_ => ("click", ts("2024-03-02"), 1.0, 100L))
    rows.toDF("event_type", "ts", "value", "user_id")
  }

  test("contribution bounding: caps one user's mass at the cap, exactly") {
    val rows = Privacy.dpBoundedOn(craftedBounding, cap = 3).collect()
      .map(r => r.getTimestamp(1).toString.take(10) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // raw 12, bounded 3+1+1=5, 3 contributors, 7 rows clipped
    assert(rows("2024-03-01") === ((12L, 5L, 3L, 7L)))
    // exactly-at-cap user is untouched
    assert(rows("2024-03-02") === ((3L, 3L, 1L, 0L)))
  }

  /** A year of one-row cells gives the noise specs a 366-sample
    * empirical distribution. */
  private def manyCells = {
    val sp = spark
    import sp.implicits._
    (0 until 366).map { i =>
      ("click", Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i).atTime(12, 0)), 1.0, i.toLong)
    }.toDF("event_type", "ts", "value", "user_id")
  }

  test("dp release: seed-deterministic, ε-rescaling is exact, clamp holds") {
    val a = Privacy.dpReleaseOn(manyCells, epsilon = 1.0).collect()
    val b = Privacy.dpReleaseOn(manyCells, epsilon = 1.0).collect()
    assert(a.toSeq === b.toSeq, "same seed must reproduce the release")
    // same u ⇒ noise scales exactly with 1/ε (b = cap/ε)
    val n1 = a.map(r => r.getString(0) + r.getTimestamp(1) -> r.getDouble(3)).toMap
    Privacy.dpReleaseOn(manyCells, epsilon = 2.0).collect().foreach { r =>
      val half = r.getDouble(3)
      val full = n1(r.getString(0) + r.getTimestamp(1))
      assert(math.abs(half - full / 2) < 1e-12,
        s"ε-rescaling violated: $full vs $half")
    }
    // released is the clamped noisy count
    a.foreach { r =>
      val expect = math.max(
        BigDecimal(r.getLong(2) + r.getDouble(3))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.0)
      assert(math.abs(r.getDouble(4) - expect) < 1e-9)
      assert(r.getDouble(4) >= 0.0)
    }
    // a changed seed changes the noise
    val c = Privacy.dpReleaseOn(manyCells, epsilon = 1.0, seed = 43).collect()
    assert(c.map(_.getDouble(3)).toSeq != a.map(_.getDouble(3)).toSeq)
  }

  test("dp release: noise is centered and its magnitude tracks b = cap/ε") {
    val noise = Privacy.dpReleaseOn(manyCells, epsilon = 1.0, cap = 3)
      .collect().map(_.getDouble(3))
    assert(noise.length === 366)
    val bScale = 3.0
    val posFrac = noise.count(_ > 0).toDouble / noise.length
    assert(posFrac > 0.35 && posFrac < 0.65, s"sign imbalance: $posFrac")
    val meanAbs = noise.map(math.abs).sum / noise.length
    // E|Laplace(b)| = b; se ≈ b/√n ≈ 0.16 here — ±0.5b is 3σ-safe
    assert(meanAbs > 0.5 * bScale && meanAbs < 1.5 * bScale,
      s"mean |noise| $meanAbs vs b $bScale")
  }

  test("t-closeness: mirrored classes sit at EMD 0, disjoint extremes at " +
    "exactly 1/2 per side, and the integer gate matches the float") {
    val sp = spark
    import sp.implicits._
    // two classes with IDENTICAL band distributions → global equals
    // both → EMD 0, within any t
    val mirrored = Seq(
      ("m", ts("2024-01-05"), 10.0), ("m", ts("2024-01-05"), 60.0),
      ("m", ts("2024-01-06"), 10.0), ("m", ts("2024-01-06"), 60.0)
    ).toDF("event_type", "ts", "value")
    val gotM = Privacy.tClosenessOn(mirrored).collect()
    assert(gotM.length == 2)
    gotM.foreach { r =>
      assert(r.getAs[Long]("emd_num") == 0L)
      assert(r.getAs[Double]("emd") == 0.0)
      assert(r.getAs[Boolean]("within_t"))
    }
    // all mass at opposite extremes: m = 2 bands, each class's CDF
    // differs from the global (½, 1) by ½ at the first band → EMD ½,
    // outside t = 0.2 → flagged
    val extremes = Seq(
      ("x", ts("2024-01-05"), 10.0), ("x", ts("2024-01-05"), 10.0),
      ("x", ts("2024-01-06"), 60.0), ("x", ts("2024-01-06"), 60.0)
    ).toDF("event_type", "ts", "value")
    val gotX = Privacy.tClosenessOn(extremes).collect()
    gotX.foreach { r =>
      assert(r.getAs[Double]("emd") == 0.5)
      assert(!r.getAs[Boolean]("within_t"))
    }
    // real log: den = (m−1)·N_g·N exactly, emd ∈ [0, 1], and the
    // integer gate is the float comparison with no rounding boundary
    val ev = graft.sources.Tables.events(spark, sf)
    val n = ev.count()
    val m = ev.select(floor(col("value") / 50)).distinct().count()
    Privacy.tCloseness(spark, sf).collect().foreach { r =>
      val (num, den) = (r.getAs[Long]("emd_num"), r.getAs[Long]("emd_den"))
      assert(den == (m - 1) * r.getAs[Long]("n_rows") * n)
      val emd = r.getAs[Double]("emd")
      assert(emd >= 0.0 && emd <= 1.0)
      assert(r.getAs[Boolean]("within_t") == (5L * num <= den))
    }
  }

  test("randomized response: crafted k=3 mechanism replays by hand " +
    "from the md5 coin; estimator closure laws hold on real data") {
    val sp = spark
    import sp.implicits._
    // k = 3 categories with a skewed truth: 6 a, 3 b, 1 c
    val docs = ((1L to 6L).map(i => (i, "a")) ++
      (7L to 9L).map(i => (i, "b")) ++ Seq((10L, "c")))
      .toDF("doc_id", "lang")
    val res = Privacy.rrDebiasOn(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // replay the mechanism in the driver: same md5 hex coin
    def u(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16)
    }
    val cats = Vector("a", "b", "c")
    val reported = ((1L to 10L)).map { id =>
      val trueIdx = if (id <= 6) 0 else if (id <= 9) 1 else 2
      val uu = u(id)
      if (uu % 2 == 0) trueIdx
      else {
        val r = (uu / 2) % 2
        if (r >= trueIdx) r + 1 else r
      }
    }.groupBy(identity).map { case (i, v) => cats(i.toInt) -> v.size.toLong }
    for (c <- cats) {
      val r = res(c)
      assert(r.getLong(2) == reported.getOrElse(c, 0L), s"$c reported")
      // k = 3: est_num = 4 n_c - 10, den = 1
      assert(r.getLong(3) == 4L * r.getLong(2) - 10L && r.getLong(4) == 1L)
      assert(r.getDouble(5) == (4L * r.getLong(2) - 10L).toDouble)
    }
    assert(res.values.map(_.getLong(1)).sum == 10L)
    // real data: reported mass is conserved and the unbiased estimates
    // sum EXACTLY to n (sum est_num = n (k-2) is an algebraic identity)
    val real = Privacy.rrDebias(spark, sf).collect()
    val n = graft.sources.Tables.documents(spark, sf).count()
    val k = real.length.toLong
    assert(real.map(_.getLong(2)).sum == n, "reported mass conserved")
    assert(real.map(_.getLong(1)).sum == n, "true mass conserved")
    assert(real.forall(_.getLong(4) == k - 2))
    assert(real.map(_.getLong(3)).sum == n * (k - 2),
      "estimates must sum to n after clearing")
  }
}
