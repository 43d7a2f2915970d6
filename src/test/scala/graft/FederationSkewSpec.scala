package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Federation, Skew}
import graft.operators.Federation.Site
import graft.sources.Tables

class FederationSkewSpec extends AnyFunSuite {
  import TestSpark._

  private val sites = Seq(Site("site_a", sf), Site("site_b", sf))

  test("federated run unions tagged per-site results without shuffling") {
    val fed = Federation.runFederated(spark, sites,
      (s, d) => Tables.nation(s, d))
    assert(fed.count() == 50) // 25 nations x 2 sites
    assert(fed.select("site").distinct().count() == 2)
    val plan = fed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"federated union must not shuffle:\n$plan")
  }

  test("federated union harmonizes divergent site schemas") {
    // same data root, distinct dir strings, so the query can branch per site
    val divergent = Seq(Site("site_a", sf), Site("site_b", sf + "/"))
    val fed = Federation.runFederated(spark, divergent,
      (s, d) =>
        if (d == sf) Tables.nation(s, d).select("n_nationkey", "n_name")
        else Tables.nation(s, d).select("n_nationkey", "n_regionkey"))
    assert(fed.columns.toSet == Set("n_nationkey", "n_name", "n_regionkey", "site"))
    // but both site dirs are equal here, so split manually: first call
    // got both columns sets unioned with nulls where missing
    assert(fed.filter(col("n_name").isNull).count() +
      fed.filter(col("n_regionkey").isNull).count() > 0)
  }

  test("status board reports per-site run outcomes, failures isolated") {
    val board = Federation.statusBoard(spark,
      sites :+ Site("bad_site", "/nonexistent/path"),
      (s, d) => Tables.region(s, d))
    val rows = board.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rows("site_a") == ((5L, "completed")))
    assert(rows("site_b") == ((5L, "completed")))
    assert(rows("bad_site")._2.startsWith("failed"))
  }

  test("federated mergeable quantiles: merged estimates sit within the " +
    "documented rank-error bound of the pooled exact percentiles, and " +
    "every union branch aggregates BELOW the union (rows never leave " +
    "a site)") {
    // three disjoint sites carved from the sf orders table (skewed
    // sizes: mod-5 split 2/2/1) — the pooled union is exactly sf
    val siteDirs = (0 until 3).map { i =>
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-fedq-$i").toString
      val part = Tables.orders(spark, sf).filter(
        if (i < 2) pmod(col("o_orderkey"), lit(5)).isin(2 * i, 2 * i + 1)
        else pmod(col("o_orderkey"), lit(5)) === 4)
      part.write.parquet(s"$d/orders.parquet")
      d
    }
    val fedSites = siteDirs.zipWithIndex.map { case (d, i) => Site(s"s$i", d) }
    val b = 64
    val accuracy = 10000
    val probs = Seq(0.25, 0.5, 0.75, 0.9)
    val result = Federation.federatedQuantiles(spark, fedSites, "orders",
      "o_totalprice", probs, b = b, accuracy = accuracy)
    // plan law: only aggregated summary rows cross the union — every
    // union branch contains an Aggregate strictly below it
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Union}
    val unions = result.queryExecution.optimizedPlan
      .collect { case u: Union => u }
    assert(unions.nonEmpty, "the site fan-in must be a plan-level union")
    unions.foreach(_.children.foreach { branch =>
      assert(branch.collectFirst { case a: Aggregate => a }.isDefined,
        s"a union branch ships un-aggregated site rows:\n$branch")
    })
    // rank-error law: the estimate's exact pooled rank interval must
    // intersect [p - bound, p + bound], bound = 1/B + 1/accuracy
    val pooled = Tables.orders(spark, sf)
      .select(col("o_totalprice").cast("double").as("v"))
      .collect().map(_.getDouble(0)).sorted
    val n = pooled.length.toDouble
    val bound = 1.0 / b + 1.0 / accuracy
    val rows = result.collect()
    assert(rows.map(_.getDouble(0)).toSeq == probs, "one row per prob")
    rows.foreach { r =>
      val (p, est) = (r.getDouble(0), r.getDouble(1))
      val below = pooled.count(_ < est) / n
      val atOrBelow = pooled.count(_ <= est) / n
      assert(below - bound <= p && p <= atOrBelow + bound,
        s"p=$p est=$est rank∈[$below,$atOrBelow] bound=$bound")
      assert(r.getDouble(2) == n, "merged mass equals the pooled count")
    }
  }

  test("federated heavy-hitters: exact regime equals pooled counts; " +
    "the saturated regime honors the Mergeable-Summaries bound " +
    "(undercount <= N/(k+1), every item above the threshold present); " +
    "every union branch aggregates BELOW the union") {
    val sp = spark
    import sp.implicits._
    // three disjoint sites carved from sf orders (pooled union = sf)
    val siteDirs = (0 until 3).map { i =>
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-fedhh-$i").toString
      Tables.orders(spark, sf).filter(
        if (i < 2) pmod(col("o_orderkey"), lit(5)).isin(2 * i, 2 * i + 1)
        else pmod(col("o_orderkey"), lit(5)) === 4)
        .write.parquet(s"$d/orders.parquet")
      d
    }
    val fedSites = siteDirs.zipWithIndex.map { case (d, i) => Site(s"s$i", d) }
    // EXACT regime: 5 priorities << k=16 — every counter must equal
    // the pooled exact frequency
    val exactRun = Federation.federatedHeavyHitters(spark, fedSites,
      "orders", "o_orderpriority", k = 16)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Union}
    val unions = exactRun.queryExecution.optimizedPlan
      .collect { case u: Union => u }
    assert(unions.nonEmpty, "the site fan-in must be a plan-level union")
    unions.foreach(_.children.foreach { branch =>
      assert(branch.collectFirst { case a: Aggregate => a }.isDefined,
        s"a union branch ships un-aggregated site rows:\n$branch")
    })
    val pooled = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").cast("string").as("item"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = exactRun.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == pooled,
      s"exact regime must reproduce pooled counts: $got vs $pooled")
    // SATURATED regime: keys = order keys mod 997 (997 distinct >> k=8)
    // with a planted heavy key riding on priority '1-URGENT'
    val n = Tables.orders(spark, sf).count()
    val satSites = siteDirs.zipWithIndex.map { case (d, i) =>
      Site(s"t$i", d)
    }
    val k = 8
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select(when(col("o_orderpriority") === "1-URGENT", lit("HEAVY"))
        .otherwise(pmod(col("o_orderkey"), lit(997)).cast("string"))
        .as("item"))
    val sat = {
      val perSite = satSites.map { s =>
        keyed(Tables.load(spark, s.dir, "orders"))
          .agg(graft.functions.Aggregates.heavyHitters(col("item"), k)
            .as("summary"), count(lit(1)).as("n"))
          .withColumn("site", lit(s.name))
      }.reduce(_ unionByName _)
      // reuse the public verb on the same carved sites — column-keyed,
      // so inline the per-site summaries through the same central merge
      perSite
    }
    val merged = Federation.federatedHeavyHitters(spark, satSites,
      "orders", "o_orderkey", k) // smoke the verb on a saturating key
    assert(merged.count() <= k + 1)
    val satExact = keyed(Tables.orders(spark, sf))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n.toDouble / (k + 1)
    val satGot = {
      // central merge over the keyed per-site panel via the audit's
      // shared path: explode + add + (k+1)-cut, mirrored inline
      val added = sat.select(explode(col("summary")).as("e"))
        .select(col("e.item").as("item"), col("e.cnt").as("cnt"))
        .groupBy(col("item")).agg(sum(col("cnt")).as("cnt"))
      val cut = added.orderBy(col("cnt").desc).limit(k + 1)
        .agg(when(count(lit(1)) === k + 1, min(col("cnt")))
          .otherwise(lit(0L)).as("cut"))
      added.crossJoin(broadcast(cut))
        .withColumn("est", col("cnt") - col("cut"))
        .filter(col("est") > 0)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    }
    satGot.foreach { case (item, est) =>
      val exact = satExact.getOrElse(item, 0L)
      assert(est <= exact, s"$item: counter $est overcounts exact $exact")
      assert(exact - est <= bound,
        s"$item: undercount ${exact - est} exceeds N/(k+1) = $bound")
    }
    satExact.filter(_._2 > bound).keys.foreach { item =>
      assert(satGot.contains(item),
        s"item $item above the N/(k+1) threshold is missing")
    }
    assert(satGot.contains("HEAVY"), "the planted heavy key must survive")
  }

  test("salted join equals the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", salt = 7)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("federated sketch-union distinct tracks the exact cross-site count") {
    import org.apache.spark.sql.functions._
    // two "sites" = the same test dir twice: distinct keys overlap 100%,
    // which is exactly what a naive per-site sum would double-count
    val sites = Seq(Federation.Site("a", sf), Federation.Site("b", sf))
    val row = Federation.federatedDistinct(spark, sites, "orders", "o_custkey")
      .head
    val approx = row.getLong(0)
    assert(row.getLong(1) == 2L)
    val exact = Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.03,
      s"sketch union estimate $approx vs exact $exact")
  }

  test("salted two-stage aggregation equals the plain groupBy") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("value_sum"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag")).collect()
    val salted = Skew.saltedAgg(li, "l_returnflag", "l_quantity", salt = 13)
      .select(col("l_returnflag"), round(col("value_sum"), 2).as("value_sum"),
        col("n_rows"))
      .orderBy(col("l_returnflag")).collect()
    assert(salted.sameElements(plain))
  }

  test("hash split is deterministic and stable under corpus growth") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf)
    val s1 = Sampling.hashSplit(docs, "doc_id").select("doc_id", "split")
    val s2 = Sampling.hashSplit(docs, "doc_id").select("doc_id", "split")
    assert(s1.exceptAll(s2).count() == 0, "split must be deterministic")
    // growth stability: splitting half the corpus assigns the same rows
    val half = Sampling.hashSplit(docs.filter(col("doc_id") < 250), "doc_id")
      .select("doc_id", "split")
    assert(half.exceptAll(s1).count() == 0,
      "rows must not migrate between splits when the corpus grows")
    val splits = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > splits("test"))
  }

  test("stratified sample respects per-stratum fractions approximately") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf)
    val sampled = Sampling.stratified(docs, "lang",
      Map("en" -> 0.5, "zh" -> 0.0, "es" -> 1.0, "de" -> 0.2, "fr" -> 0.2))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("zh"), "0-fraction stratum must be empty")
    val es = Tables.documents(spark, sf).filter(col("lang") === "es").count()
    assert(byLang("es") == es, "1.0-fraction stratum must be complete")
  }

  test("bloom semi-join equals the plain semi-join and prunes before " +
    "the join") {
    import graft.operators.{Relational, Skew}
    val plain = Relational.semiJoin(spark, sf).collect()
    val bloomed = Relational.bloomSemi(spark, sf)
    assert(bloomed.collect().sameElements(plain),
      "bloom pruning must not change semi-join results")
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe must appear in the physical plan:\n$plan")
    // degenerate build side: empty dim → empty result, no crash
    val empty = Skew.bloomSemiJoin(
      graft.sources.Tables.customer(spark, sf).select(col("c_custkey")),
      graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderkey") < 0).select(col("o_custkey")),
      "c_custkey", "o_custkey")
    assert(empty.count() == 0)
  }

  test("heavy hitters finds the dominant keys") {
    val hh = Skew.heavyHitters(Tables.lineitem(spark, sf), col("l_returnflag"), 3)
    val rows = hh.collect()
    assert(rows.length == 3)
    assert(rows.head.getLong(1) >= rows.last.getLong(1))
  }

  test("mergeSiteSummaries with a rev column keeps only each site's " +
    "latest revision: a stale replayed summary cannot double-count") {
    val sp = spark
    import sp.implicits._
    // siteA at rev 1 (stale, larger counts) and rev 2 (latest);
    // siteB one revision only
    val panel = Seq(
      ("siteA", 1L, "x", 90L, 100L),
      ("siteA", 1L, "y", 10L, 100L),
      ("siteA", 2L, "x", 95L, 120L),
      ("siteA", 2L, "y", 25L, 120L),
      ("siteB", 7L, "x", 40L, 60L),
      ("siteB", 7L, "z", 20L, 60L)
    ).toDF("site", "rev", "item", "cnt", "n")
    val latestOnly = panel.filter(
      (col("site") === "siteA" && col("rev") === 2) ||
        col("site") === "siteB")
    val merged = Federation.mergeSiteSummaries(panel, k = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val expected = Federation.mergeSiteSummaries(latestOnly, k = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged == expected,
      s"stale revision leaked into the merge: $merged vs $expected")
    // exact counts in the unsaturated regime: x = 95 + 40, y = 25, z = 20
    val got = merged.map(t => t._1 -> t._2).toMap
    assert(got == Map("x" -> 135L, "y" -> 25L, "z" -> 20L))
    assert(merged.forall(_._3 == 180L), "n_total must be 120 + 60")
  }

  test("a site with an EMPTY summary still contributes its n to " +
    "n_total (explode_outer path: null items survive to the totals)") {
    val sp = spark
    import sp.implicits._
    // the flat shape mergeMgPanel produces from explode_outer: siteB's
    // buffer emptied (null item/cnt) but its n is real
    val panel = Seq(
      ("siteA", Some("x"), Some(50L), 80L),
      ("siteB", Option.empty[String], Option.empty[Long], 70L)
    ).toDF("site", "item", "cnt", "n")
    val merged = Federation.mergeSiteSummaries(panel, k = 8).collect()
    assert(merged.length == 1 && merged.head.getString(0) == "x")
    assert(merged.head.getLong(2) == 150L,
      s"empty-summary site's n must reach n_total: ${merged.head}")
  }
}
