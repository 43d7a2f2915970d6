package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality
import graft.functions.Aggregates
import graft.functions.HashExpressions._

class AggregatesSpec extends AnyFunSuite {
  import TestSpark._

  test("group minhash: identical groups estimate jaccard 1, estimates in [0,1]") {
    import spark.implicits._
    val docs = Seq(
      ("g1", "alpha beta gamma delta epsilon zeta"),
      ("g1", "eta theta iota kappa lambda mu"),
      ("g2", "alpha beta gamma delta epsilon zeta"), // identical universe to g1 half
      ("g2", "eta theta iota kappa lambda mu"),
      ("g3", "totally different content entirely here now"))
      .toDF("g", "text")
    val sigs = docs.select(col("g"),
        minhashSignature(rollingShingles(col("text"), 8), 32).as("sig"))
      .groupBy("g").agg(Aggregates.groupMinhash(col("sig"), 32).as("gsig"))
    val a = sigs.select(col("g").as("ga"), col("gsig").as("sa"))
    val b = sigs.select(col("g").as("gb"), col("gsig").as("sb"))
    val sims = a.join(b, col("ga") < col("gb"))
      .select(col("ga"), col("gb"), expr(
        "aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / CAST(32.0 AS DOUBLE)")
        .as("est"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(sims(("g1", "g2")) == 1.0, "identical shingle universes must agree fully")
    assert(sims(("g1", "g3")) < 0.5, "disjoint universes must mostly disagree")
  }

  test("source similarity runs end-to-end with sane bounds") {
    val out = Quality.sourceSimilarity(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("est_jaccard") < 0.0 || col("est_jaccard") > 1.0).count() == 0)
  }

  test("upsert over split log equals latest-status over full log") {
    val full = SparkEntry.queries("q_latest_status")(spark, sf)
    val upserted = SparkEntry.queries("q_upsert_latest")(spark, sf)
    assert(upserted.exceptAll(full).count() == 0)
    assert(full.exceptAll(upserted).count() == 0)
  }

  test("vector_sum aggregate equals the posexplode formulation") {
    import spark.implicits._
    val df = Seq(
      ("a", Array(1.0, 2.0, 3.0)), ("a", Array(0.5, -1.0, 4.0)),
      ("b", Array(10.0, 0.0, -2.0))).toDF("g", "v")
    val fast = df.groupBy(col("g"))
      .agg(graft.functions.Aggregates.vectorSum(col("v"), 3).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    val slow = df.select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("g"), col("pos")).agg(sum(col("x")).as("s"))
      .groupBy(col("g"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, s))), t -> t.s)")
        .as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(fast == slow)
  }

  test("weighted avg typed aggregator equals the SQL formula") {
    val typed = SparkEntry.queries("q_weighted_avg")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sql = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")) /
        sum(col("l_quantity")), 4).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed == sql)
  }

  private def hhMap(data: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    data.toDF("x").repartition(parts)
      .agg(Aggregates.heavyHitters(col("x"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("heavy hitters: exact when cardinality fits the sketch") {
    val rng = new scala.util.Random(11L)
    val small = (1 to 2000).map(_ => s"v${rng.nextInt(8)}")
    val exact = small.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(hhMap(small, 50, 7) == exact,
      "with distinct <= k the sketch must degenerate to exact counts")
  }

  test("heavy hitters: Misra-Gries guarantees hold under pressure " +
    "across partitioned merges") {
    val rng = new scala.util.Random(23L)
    val n = 20000
    val k = 20
    // skewed stream: half the mass on 5 hot items, the rest spread over
    // a ~5000-item tail — distinct >> k, so decrements and merge cuts
    // genuinely fire
    val data = (1 to n).map { _ =>
      if (rng.nextBoolean()) s"hot${rng.nextInt(5)}"
      else s"tail${rng.nextInt(5000)}"
    }
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 13)) {
      val hh = hhMap(data, k, parts)
      assert(hh.size <= k, s"summary exceeded capacity at parts=$parts")
      val bound = n / (k + 1)
      // recall: every item above the MG threshold is present
      exact.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { h =>
        assert(hh.contains(h), s"lost heavy item $h at parts=$parts")
      }
      // counts never overcount and undercount by at most n/(k+1)
      hh.foreach { case (item, c) =>
        val t = exact(item)
        assert(c <= t, s"overcounted $item: $c > $t at parts=$parts")
        assert(t - c <= bound,
          s"undercount of $item beyond n/(k+1): $t - $c > $bound")
      }
    }
  }

  test("heavy hitters: survives items larger than the 64KB writeUTF cap") {
    import spark.implicits._
    val big = "x" * 100000 // > 64 KB once UTF-8 encoded
    val data = Seq.fill(30)(big) ++ Seq.fill(5)("small")
    // repartition forces serialize/deserialize through the merge path
    val out = hhMap(data, 4, 5)
    assert(out(big) == 30L && out("small") == 5L)
  }

  test("heavy tokens: sketch-then-recount equals the exact computation") {
    val got = graft.operators.TextAnalysis.heavyTokens(spark, sf)
      .collect().map(_.toString)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    val tot = toks.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val exact = toks.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .join(tot, Seq("lang"))
      .filter(col("cnt") * 51 > col("n"))
      .select(col("lang"), col("tok"), col("cnt"))
      .orderBy(col("lang"), col("cnt").desc, col("tok"))
      .collect().map(_.toString)
    assert(got.sameElements(exact),
      "MG recall guarantee must make the two-pass result exact")
  }

  test("kmv sketch: exact below saturation, order-independent across partitionings") {
    import spark.implicits._
    val df = (0 until 500).map(i => ("g", s"key_$i")).toDF("g", "k")
    def sketch(parts: Int): Seq[Long] =
      df.repartition(parts)
        .groupBy("g").agg(Aggregates.kmvSketch(col("k"), 1024).as("sk"))
        .select(graft.functions.Sketches.kmvEstimate(col("sk"), 1024).as("est"),
          col("sk"))
        .collect().map { r =>
          assert(r.getDouble(0) == 500.0,
            "unsaturated sketch must count exactly")
          r.getSeq[Long](1)
        }.head
    val s1 = sketch(1)
    val s16 = sketch(16)
    assert(s1 == s16,
      "the k smallest hashes are order-independent, so the sketch must be " +
        "bit-identical under any partitioning")
  }

  test("kmv sketch: saturated estimate and intersection within KMV error bounds") {
    import spark.implicits._
    val n = 20000
    // A = [0, 20000), B = [10000, 30000) → |A∩B| = 10000, |A∪B| = 30000
    val a = (0 until n).map(i => ("a", s"user_$i"))
    val b = (n / 2 until n / 2 + n).map(i => ("b", s"user_$i"))
    val df = (a ++ b).toDF("g", "k")
    val k = 256
    val row = graft.operators.Federation.groupOverlap(df, "g", "k", k)
      .collect().head
    val (ka, kb, ov, jac) = (row.getLong(2), row.getLong(3), row.getLong(4),
      row.getDouble(5))
    // standard KMV relative error ~ 1/sqrt(k) ≈ 6%; assert 4 sigma
    assert(math.abs(ka - n).toDouble / n < 0.25, s"keys_a=$ka")
    assert(math.abs(kb - n).toDouble / n < 0.25, s"keys_b=$kb")
    assert(math.abs(ov - n / 2).toDouble / (n / 2) < 0.35, s"overlap=$ov")
    assert(math.abs(jac - 1.0 / 3.0) < 0.15, s"jaccard=$jac")
  }

  test("kmv sketch: SQL registration builds the same sketch as the Column API") {
    import spark.implicits._
    graft.plans.GraftFunctionRegistry.registerAll(spark)
    val df = (0 until 300).map(i => s"k$i").toDF("k")
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT kmv_sketch(xxhash64(k), 64) AS sk FROM kmv_in")
      .collect().head.getSeq[Long](0)
    val viaCol = df.agg(Aggregates.kmvSketch(col("k"), 64).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaCol)
  }

  test("audience overlap query equals exact distinct-join recomputation") {
    val got = SparkEntry.queries("q_audience_overlap")(spark, sf)
      .collect().map(_.toString)
    val au = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct()
    val cnt = au.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val inter = au.select(col("event_type").as("ga"), col("user_id"))
      .join(au.select(col("event_type").as("gb"), col("user_id")), "user_id")
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("ov"))
    val exact = cnt.select(col("event_type").as("ga"), col("c").as("ca"))
      .join(cnt.select(col("event_type").as("gb"), col("c").as("cb")),
        col("ga") < col("gb"))
      .join(inter, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"), col("ca"), col("cb"),
        coalesce(col("ov"), lit(0L)).as("ov"),
        round(coalesce(col("ov"), lit(0L)).cast("double") /
          (col("ca") + col("cb") - coalesce(col("ov"), lit(0L))), 4)
          .as("jaccard"))
      .orderBy(col("ga"), col("gb"))
      .collect().map(_.toString)
    assert(got.sameElements(exact),
      "unsaturated KMV sketches must reproduce exact overlap counts")
  }

  test("incremental distinct sketches: merged snapshot is bit-identical " +
    "to sketching the whole log, estimates exact below saturation") {
    import graft.operators.Incremental
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("ts"))
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    val k = 64
    val snapA = Incremental.distinctSketchSnapshot(
      ev.filter(col("ts") < cut), Seq("event_type"), "user_id", k)
    val snapB = Incremental.distinctSketchSnapshot(
      ev.filter(col("ts") >= cut), Seq("event_type"), "user_id", k)
    val merged = Incremental.mergeDistinctSnapshots(snapA, snapB,
      Seq("event_type"), k)
    val whole = Incremental.distinctSketchSnapshot(ev, Seq("event_type"),
      "user_id", k)
    val m = merged.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val w = whole.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m == w, "KMV merge must equal the whole-log sketch bit for bit")
    // persistence round trip: sketches survive parquet as plain arrays
    val dir = java.nio.file.Files.createTempDirectory("graft-sk").toString
    snapA.write.parquet(s"$dir/snap")
    val reloaded = Incremental.mergeDistinctSnapshots(
      spark.read.parquet(s"$dir/snap"), snapB, Seq("event_type"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(reloaded == w, "persisted sketches must merge identically")
    // below saturation (choose k above the per-type distinct count):
    // estimates are exact
    val k2 = 4096
    val est = Incremental.estimateDistinct(
      Incremental.mergeDistinctSnapshots(
        Incremental.distinctSketchSnapshot(
          ev.filter(col("ts") < cut), Seq("event_type"), "user_id", k2),
        Incremental.distinctSketchSnapshot(
          ev.filter(col("ts") >= cut), Seq("event_type"), "user_id", k2),
        Seq("event_type"), k2), k2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("distinct_est")).toMap
    val exactDistinct = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exactDistinct,
      "unsaturated incremental estimate must be exact")
  }

  test("cube: lattice levels are complete and every level's counts " +
    "re-sum to the table total") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Relational.cubeAgg(spark, sf).collect()
    val total = graft.sources.Tables.orders(spark, sf).count()
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L), "all four lattice levels")
    assert(byGid(3L).length == 1 && byGid(3L).head.getLong(4) == total,
      "one grand total covering every row")
    // each level partitions the table: its n_orders sum to the total
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(byGid(gid).map(_.getLong(4)).sum == total, s"level $gid mass")
    }
    // the status-only level matches a direct groupBy
    val direct = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byGid(1L).foreach { r => // gid 1: priority aggregated away
      assert(r.getLong(4) == direct(r.getString(0)))
    }
  }
}
