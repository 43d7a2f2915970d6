package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the data-quality audit trio (fk orphans / Benford /
  * source drift) beyond their DuckDB oracles. */
class QualityAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("fk orphans: all five edges reported, counts equal driver " +
    "anti-join recounts") {
    val got = graft.operators.Quality.fkOrphans(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_orphans")).toMap
    assert(got.keySet == Set(
      "lineitem.l_orderkey -> orders", "lineitem.l_partkey -> part",
      "lineitem.l_suppkey -> supplier", "orders.o_custkey -> customer",
      "customer.c_nationkey -> nation"))
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
      df.select(col(c)).collect().map(_.getLong(0))
    val orders = keys(graft.sources.Tables.orders(spark, sf), "o_orderkey").toSet
    val lo = keys(graft.sources.Tables.lineitem(spark, sf), "l_orderkey")
    assert(got("lineitem.l_orderkey -> orders") ==
      lo.count(k => !orders(k)).toLong)
    val custs = keys(graft.sources.Tables.customer(spark, sf), "c_custkey").toSet
    val oc = keys(graft.sources.Tables.orders(spark, sf), "o_custkey")
    assert(got("orders.o_custkey -> customer") ==
      oc.count(k => !custs(k)).toLong)
    // the synthetic star schema is referentially sound — every edge 0
    // would also pass a vacuous implementation, so the recount above is
    // the load-bearing check
    assert(got.values.forall(_ >= 0L))
  }

  test("benford: nine digits, observed shares sum to one, chi2 parts " +
    "nonnegative, totals close") {
    val rows = graft.operators.Quality.benfordDigits(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val obs = rows.map(_.getAs[Double]("observed_p")).sum
    assert(math.abs(obs - 1.0) < 1e-4, s"observed shares sum to $obs")
    val expSum = rows.map(_.getAs[Double]("expected_p")).sum
    assert(math.abs(expSum - 1.0) < 1e-4, "Benford table must sum to ~1")
    rows.foreach(r => assert(r.getAs[Double]("chi2_part") >= 0.0))
    val n = rows.map(_.getAs[Long]("n")).sum
    val direct = graft.sources.Tables.lineitem(spark, sf).count()
    assert(n == direct, "every price has a first digit in 1..9")
  }

  test("score calibration: equals a driver percent_rank with shared ties, " +
    "bounded in [0,1]") {
    val got = graft.operators.Quality.scoreCalibration(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val bySource = got.groupBy(_._2._1)
    bySource.foreach { case (_, docs) =>
      val n = docs.length
      docs.foreach { case (id, (_, q, calib)) =>
        val worse = docs.count(_._2._2 < q)
        val expect = if (n > 1)
          BigDecimal(worse.toDouble / (n - 1))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0
        assert(math.abs(calib - expect) < 1e-9,
          s"doc $id calib $calib vs driver $expect")
        assert(calib >= 0.0 && calib <= 1.0)
      }
    }
  }

  test("dup rate by source: equals a recount over the exact-dedup groups") {
    val got = graft.operators.Quality.dupRateBySource(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dups"))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keepers = docs.groupBy(_._3).values.map(_.map(_._1).min).toSet
    val expect = docs.groupBy(_._2).map { case (s, rows) =>
      s -> (rows.length.toLong, rows.count(r => !keepers(r._1)).toLong)
    }
    assert(got == expect)
  }

  test("source drift: reported counts equal a driver token recount and " +
    "the cut follows the (chi2 desc, token) total order") {
    val got = graft.operators.Quality.sourceDrift(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 30)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split("\\s+")
        .map(t => (t, r.getString(0) == "src0")))
    val counts = toks.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toMap
    got.foreach { r =>
      val (in, out) = counts(r.getString(0))
      assert(r.getAs[Long]("n_in") == in && r.getAs[Long]("n_out") == out,
        s"token ${r.getString(0)} counts")
      assert(in + out >= 20L, "min-count floor")
    }
    val key = got.map(r => (-r.getAs[Double]("chi2_in"), r.getString(0)))
    assert(key.sameElements(key.sorted), "cut must follow the total order")
  }

  test("gini: closed form recounts from raw source counts and sits in " +
    "[0, 1); integer numerator/denominator close exactly") {
    val r = graft.operators.Quality.giniSources(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (nSrc, total, num, den, gini) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4))
    val xs = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("x"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .sortBy(t => (t._2, t._1))
    assert(nSrc == xs.length && total == xs.map(_._2).sum)
    val n = xs.length.toLong
    val expectNum = xs.zipWithIndex
      .map { case ((_, x), i0) => (2L * (i0 + 1) - n - 1L) * x }.sum
    assert(num == expectNum && den == n * total)
    assert(gini == BigDecimal(num.toDouble / den.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("auc: perfect separation is 1, inversion is 0, an all-tied group " +
    "is exactly 1/2, and the midrank algebra equals brute pair counting") {
    val sp = spark
    import sp.implicits._
    // perfect: every positive outranks every negative; inverted: the
    // mirror; tied: one shared score (midranks must land on exactly 1/2)
    val crafted = Seq(
      ("perfect", 10L, 0L), ("perfect", 20L, 0L), ("perfect", 30L, 1L),
      ("perfect", 40L, 1L),
      ("inverted", 10L, 1L), ("inverted", 20L, 1L), ("inverted", 30L, 0L),
      ("tied", 5L, 1L), ("tied", 5L, 0L), ("tied", 5L, 1L), ("tied", 5L, 0L),
      ("oneclass", 1L, 1L), ("oneclass", 2L, 1L)
    ).toDF("source", "score", "y")
    val got = graft.operators.Quality.aucOn(crafted).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("perfect").getAs[Double]("auc") == 1.0)
    assert(got("inverted").getAs[Double]("auc") == 0.0)
    assert(got("tied").getAs[Double]("auc") == 0.5)
    assert(got("oneclass").getAs[Any]("auc") == null) // den 0 → NULL, no throw
    // real corpus: every per-source AUC must equal the O(n²) definition
    // Σ [s⁺>s⁻] + ½[s⁺=s⁻] over positive×negative pairs
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._1)
    graft.operators.Quality.aucBySource(spark, sf).collect().foreach { r =>
      val rows = bySrc(r.getString(0))
      val pos = rows.filter(_._3 == 1L).map(_._2)
      val neg = rows.filter(_._3 == 0L).map(_._2)
      val num2 = pos.map(p => neg.map(n =>
        if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
      assert(r.getAs[Long]("auc_num2") == num2,
        s"source ${r.getString(0)}: 2U mismatch")
      assert(r.getAs[Long]("auc_den2") == 2L * pos.length * neg.length)
    }
  }

  test("kappa: perfect agreement is 1, independence is 0, degenerate " +
    "single-cell class reports NULL, confusion counts recount") {
    val sp = spark
    import sp.implicits._
    val crafted = Seq(
      // agree: a == b always, both classes present → κ = 1
      ("agree", 1L, 1L), ("agree", 1L, 1L), ("agree", 0L, 0L),
      // indep: uniform 2×2 → po = pe → κ = 0
      ("indep", 1L, 1L), ("indep", 1L, 0L), ("indep", 0L, 1L),
      ("indep", 0L, 0L),
      // onecell: pe = 1 → κ undefined
      ("onecell", 1L, 1L), ("onecell", 1L, 1L)
    ).toDF("lang", "a", "b")
    val got = graft.operators.Quality.raterKappaOn(crafted).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("agree").getAs[Double]("kappa") == 1.0)
    assert(got("indep").getAs[Double]("kappa") == 0.0)
    assert(got("onecell").getAs[Any]("kappa") == null)
    // real corpus: confusion cells recount from the raw predicates
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"),
        (col("n_chars") >= 300L).as("a"),
        (size(split(lower(trim(col("text"))), "\\s+")) >= 50).as("b"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    graft.operators.Quality.raterKappa(spark, sf).collect().foreach { r =>
      val rows = docs.filter(_._1 == r.getString(0))
      assert(r.getAs[Long]("n11") == rows.count(t => t._2 && t._3))
      assert(r.getAs[Long]("n10") == rows.count(t => t._2 && !t._3))
      assert(r.getAs[Long]("n01") == rows.count(t => !t._2 && t._3))
      assert(r.getAs[Long]("n00") == rows.count(t => !t._2 && !t._3))
    }
  }

  test("tvDistance edges: identical counts 0, disjoint 1, one empty " +
    "side 1, both empty NULL, and a hand-computed mixed pair") {
    val sp = spark
    import sp.implicits._
    import graft.operators.Quality
    def cf(pairs: (String, Long)*) = pairs.toSeq.toDF("tok", "c")
    val same = cf("x" -> 2L, "y" -> 1L)
    val r0 = Quality.tvDistance(same, cf("x" -> 2L, "y" -> 1L))
      .collect().head
    assert(r0.getLong(2) == 0L && r0.getDouble(4) == 0.0)
    val r1 = Quality.tvDistance(same, cf("z" -> 5L)).collect().head
    assert(r1.getDouble(4) == 1.0, "disjoint vocabularies")
    val rEmpty = Quality.tvDistance(same, cf()).collect().head
    assert(rEmpty.getLong(1) == 0L && rEmpty.getDouble(4) == 1.0,
      "an empty batch is maximal drift against a real reference")
    val rBoth = Quality.tvDistance(cf(), cf()).collect().head
    assert(rBoth.isNullAt(4), "both-empty is undefined, not a throw")
    // ref {x:2,y:1} (T=3) vs cur {x:1,z:1} (T=2):
    // |2*2-1*3| + |1*2-0| + |0-1*3| = 1+2+3 = 6; den = 12 -> 0.5
    val rm = Quality.tvDistance(same, cf("x" -> 1L, "z" -> 1L))
      .collect().head
    assert(rm.getLong(2) == 6L && rm.getLong(3) == 12L
      && rm.getDouble(4) == 0.5)
  }

  test("length drift: disjoint-length sources score hand-computed " +
    "contributions, identical sources score zero everywhere; real-data " +
    "cells recount and the closure laws hold") {
    val sp = spark
    import sp.implicits._
    import graft.operators.Quality
    val dirL = java.nio.file.Files.createTempDirectory("graft-ldr").toString
    // sA: two short docs (1 char), sB: two long docs (100 chars):
    // lo=1, hi=100, span 100 -> bins 0 and 9; every cell is maximally
    // drifted: o*N - n_s*b_t = +-4 in each populated/empty cell
    Seq((1L, "x", "sA"), (2L, "y", "sA"),
      (3L, "z" * 100, "sB"), (4L, "w" * 100, "sB"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dirL/documents.parquet")
    val c = Quality.lengthDrift(sp, dirL).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(c.size == 4, "2 sources x 2 populated bins, zeros included")
    val a0 = c(("sA", 0L))
    assert(a0.getLong(2) == 2L && a0.getLong(3) == 2L &&
      a0.getLong(4) == 2L && a0.getLong(5) == 4L)
    assert(a0.getDouble(6) == 1.0,
      "o*N - n_s*b_t = 8-4 = 4, squared over 16")
    val a9 = c(("sA", 9L))
    assert(a9.getLong(2) == 0L && a9.getDouble(6) == 1.0,
      "the empty cell drifts just as hard")
    // identical length profiles -> zero drift in every cell
    val dirE = java.nio.file.Files.createTempDirectory("graft-ldr0").toString
    Seq((1L, "aa", "s1"), (2L, "bbbb", "s1"),
      (3L, "cc", "s2"), (4L, "dddd", "s2"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dirE/documents.parquet")
    assert(Quality.lengthDrift(sp, dirE).collect()
      .forall(r => r.getDouble(6) == 0.0),
      "identical per-source length profiles must read zero drift")
    // real data: recount every cell driver-side; closure laws
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (lo, hi, nAll) = (rows.map(_._2).min, rows.map(_._2).max,
      rows.length.toLong)
    def binOf(n: Long) = (n - lo) * 10L / (hi - lo + 1L)
    val res = Quality.lengthDrift(spark, sf).collect()
    assert(res.nonEmpty)
    val srcTot = rows.groupBy(_._1).map { case (s2, xs) =>
      s2 -> xs.length.toLong }
    val binTot = rows.groupBy(x => binOf(x._2)).map { case (b, xs) =>
      b -> xs.length.toLong }
    assert(res.map(_.getLong(4)).toSet.subsetOf(binTot.values.toSet))
    res.groupBy(_.getString(0)).foreach { case (s2, cells) =>
      assert(cells.map(_.getLong(2)).sum == srcTot(s2),
        s"$s2 observed mass")
    }
    res.foreach { r =>
      val o = rows.count(x => x._1 == r.getString(0) &&
        binOf(x._2) == r.getLong(1)).toLong
      assert(r.getLong(2) == o, s"cell ${r.getString(0)}/${r.getLong(1)}")
      // contrib closes in DOUBLE over the fixed tree the operator
      // declares: cast(exact gap), gap*gap, /(n_all*n_s*b_t)
      val gapD = (BigInt(o) * nAll -
        BigInt(srcTot(r.getString(0))) * binTot(r.getLong(1))).toDouble
      val exp = BigDecimal(gapD * gapD / (nAll.toDouble *
        srcTot(r.getString(0)).toDouble * binTot(r.getLong(1)).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(6) == exp)
    }
  }

  test("length drift chi-square cells survive beyond-BIGINT counts: " +
    "the DECIMAL(38,0) gap formation is exact where the old BIGINT " +
    "squaring threw") {
    val sp = spark
    import sp.implicits._
    // o*n_all = 2.7e37 alone overflows 2^63 ~ 9.2e18 at the FIRST
    // product; the decimal path forms the 1.7e37 gap exactly and the
    // contribution closes in double
    val o = 3000000000000000000L       // 3e18
    val nAll = 9000000000000000000L    // 9e18
    val nS = 2000000000000000000L      // 2e18
    val bT = 5000000000000000000L      // 5e18
    val grid = Seq(("s", 0L, o, nS, bT, nAll))
      .toDF("source", "bin", "o", "n_s", "b_t", "n_all")
    val r = graft.operators.Quality.chiCells(grid).collect().head
    val gapD = (BigInt(o) * nAll - BigInt(nS) * bT).toDouble
    val exp = BigDecimal(gapD * gapD /
      (nAll.toDouble * nS.toDouble * bT.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) == exp && exp > 3.2e18,
      "a cell whose every BIGINT product overflows is exact on the " +
        "decimal path")
  }
}
