package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Semantic checks for the corpus-statistics batch (Heaps growth
  * curve, Zipf rank head, hapax profile) — crafted corpora recount the
  * curves by hand; real-data closures tie the totals to the raw token
  * stream.
  */
class CorpusStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("heaps curve: crafted corpus recounts by hand; real-data " +
    "closure hits the corpus totals and the curve is monotone") {
    val sp = spark
    import sp.implicits._
    // ids 0..9 -> decile k = id+1. Doc i has tokens "t0..ti" (i+1
    // tokens, one new type per doc): docs_cum = k, tokens_cum =
    // k(k+1)/2, vocab_cum = k.
    val crafted = (0 until 10)
      .map(i => (i.toLong, (0 to i).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.heapsCurveOn(crafted).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == k)
      assert(r.getLong(2) == k * (k + 1) / 2)
      assert(r.getLong(3) == k)
    }
    // real data: final row equals global totals; all three cumulative
    // columns are nondecreasing
    val res = TextAnalysis.heapsCurve(spark, sf).collect()
    assert(res.nonEmpty && res.length <= 10)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
    val last = res.last
    assert(last.getLong(1) == toks.count())
    assert(last.getLong(2) ==
      toks.select(explode(col("t"))).count())
    assert(last.getLong(3) ==
      toks.select(explode(col("t")).as("k")).distinct().count())
    Seq(1, 2, 3).foreach { c =>
      val col_ = res.map(_.getLong(c))
      assert(col_.zip(col_.tail).forall { case (a, b) => a <= b })
    }
  }

  test("zipf ranks: dense 1..K ranks on a nonincreasing frequency " +
    "head; rank 1 recounts as the global mode") {
    val res = TextAnalysis.zipfRanks(spark, sf).collect()
    assert(res.nonEmpty && res.length <= 50) // head is min(K, |vocab|)
    assert(res.map(_.getLong(0)).toSeq == (1L to res.length.toLong))
    val freqs = res.map(_.getLong(2))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    assert(res.forall(r => r.getLong(3) == r.getLong(0) * r.getLong(2)))
    // rank 1 = corpus mode by an independent recount (ties broken by
    // token ascending — the declared total order)
    val counts = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("k"))
      .groupBy(col("k")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val top = counts.sortBy { case (t, n) => (-n, t) }.head
    assert((res.head.getString(1), res.head.getLong(2)) == top)
  }

  test("hapax profile: all-unique source scores share 1, per-source " +
    "global-hapax counts partition the corpus hapax set") {
    val sp = spark
    import sp.implicits._
    val crafted = Seq(
      ("u", "alpha beta gamma"), // all tokens unique corpus-wide
      ("v", "x x y"), ("v", "y z")) // v: vocab {x,y,z}, local hapax {z}
      .toDF("source", "text")
    val byName = TextAnalysis.hapaxShareOn(crafted).collect()
      .map(r => r.getString(0) -> r).toMap
    val u = byName("u"); val v = byName("v")
    assert(u.getLong(1) == 3L && u.getLong(2) == 3L && u.getLong(3) == 3L)
    assert(u.getDouble(5) == 1.0, "all-unique source must score 1")
    assert(v.getLong(1) == 3L && v.getLong(2) == 1L)
    assert(v.getLong(3) == 1L, "only z is a corpus hapax in v")
    assert(v.getLong(4) == 5L)
    // real data: recount every source end-to-end and check the global
    // hapax partition property
    val got = TextAnalysis.hapaxShare(sp, sf)
    assert(got.columns.toSeq == Seq("source", "vocab", "hapax_local",
      "hapax_global", "n_tokens", "hapax_share"))
    val res = got.collect()
    val lens = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val globalFreq = lens.groupBy(_._2).map { case (t, xs) => t -> xs.length }
    val corpusHapax = globalFreq.count(_._2 == 1)
    assert(res.map(_.getLong(3)).sum == corpusHapax.toLong,
      "per-source global-hapax counts must partition the corpus hapax set")
    res.foreach { r =>
      val src = r.getString(0)
      val mine = lens.filter(_._1 == src).map(_._2)
      val local = mine.groupBy(identity).map { case (t, xs) => t -> xs.length }
      assert(r.getLong(1) == local.size.toLong, s"$src vocab")
      assert(r.getLong(2) == local.count(_._2 == 1).toLong, s"$src local")
      assert(r.getLong(3) ==
        local.keys.count(t => globalFreq(t) == 1).toLong, s"$src global")
      assert(r.getLong(4) == mine.length.toLong, s"$src tokens")
    }
  }

  test("cms: estimates dominate true counts, and every estimate " +
    "recounts as the min over md5-bucket collision sums") {
    val res = TextAnalysis.cmsTokenCounts(spark, sf).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(2) >= r.getLong(1)),
      "CMS error is one-sided: estimate >= true count")
    assert(res.forall(r => r.getLong(3) == r.getLong(2) - r.getLong(1)))
    // driver recount with java MD5 (must agree with Spark's md5())
    val toks = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("k"))
      .collect().map(_.getString(0))
    def bucket(j: Int, tok: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s"$j:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
    }
    val counters = (0 until 4).map { j =>
      j -> toks.groupBy(t => bucket(j, t)).map { case (b, xs) =>
        b -> xs.length.toLong }
    }.toMap
    res.foreach { r =>
      val tok = r.getString(0)
      val want = (0 until 4).map(j => counters(j)(bucket(j, tok))).min
      assert(r.getLong(2) == want, s"$tok estimate recount")
    }
  }

  test("burstiness: cleared ratios recount from raw per-doc tfs; an " +
    "even spread scores below a concentrated token of equal mass") {
    val res = TextAnalysis.tokenBurstiness(spark, sf).collect()
    assert(res.nonEmpty && res.length <= 40)
    // total order on (rounded ratio DESC, tok)
    val keys = res.map(r => (-r.getDouble(3), r.getString(0)))
    assert(keys.zip(keys.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2) })
    // driver recount from the raw token stream — the ratio re-derives
    // over the operator's declared fixed double tree
    val tfs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = Tables.documents(spark, sf).count()
    val byTok = tfs.groupBy(_._2)
    res.foreach { r =>
      val perDoc = byTok(r.getString(0)).groupBy(_._1).map(_._2.length.toLong)
      assert(r.getLong(1) == perDoc.size.toLong)
      val t = perDoc.sum; val sq = perDoc.map(x => BigInt(x) * x).sum
      assert(r.getLong(2) == t)
      val numD = (BigInt(n) * sq - BigInt(t) * t).toDouble
      val exp = BigDecimal(numD / (n.toDouble * t.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == exp, s"${r.getString(0)} ratio")
    }
    // synthetic law: same total mass, different concentration
    val sp = spark
    import sp.implicits._
    val crafted = (Seq((1L, "zzqa zzqa zzqa zzqa")) ++
      (2L to 5L).map(i => (i, "zzqb"))).toDF("doc_id", "text")
    val tf = crafted
      .select(col("doc_id"), explode(split(lower(trim(col("text"))),
        "\\s+")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .groupBy(col("tok"))
      .agg(sum(col("tf")).as("t"), sum(col("tf") * col("tf")).as("sq"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (ta, sqa) = tf("zzqa"); val (tb, sqb) = tf("zzqb")
    assert(ta == tb, "equal mass fixture")
    assert(5 * sqa - ta * ta > 5 * sqb - tb * tb,
      "concentration must raise the cleared variance at equal mass")
  }

  test("novelty: first document is fully novel, an exact repeat is " +
    "fully stale, and real-data novel counts partition the gram space") {
    val sp = spark
    import sp.implicits._
    import graft.operators.Dedup
    val res = Dedup.ngramNovelty(spark, sf).collect()
    assert(res.nonEmpty)
    // every document's novel grams are grams first carried by it, so
    // summing n_novel over docs counts each distinct gram exactly once
    val grams = Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 8), " +
          "i -> array_join(slice(t, i + 1, 8), ' '))")).as("g"))
      .distinct()
    assert(res.map(_.getLong(2)).sum == grams.select(col("g")).distinct().count(),
      "novel counts must partition the distinct gram space")
    val minId = res.map(_.getLong(0)).min
    val first = res.find(_.getLong(0) == minId).get
    assert(first.getLong(1) == first.getLong(2) &&
      first.getDouble(3) == 1.0, "the earliest doc is all-novel")
    // crafted: an exact repeat of an earlier doc is fully stale
    val dirRep = java.nio.file.Files
      .createTempDirectory("graft-novelty").toString
    Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dirRep/documents.parquet")
    val crafted = Dedup.ngramNovelty(sp, dirRep).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(crafted(1L) == 1.0 && crafted(2L) == 0.0 && crafted(3L) == 1.0)
  }

  test("good-turing: crafted fof recounts by hand; real-data r*, " +
    "num/den recount and the r·N_r mass law closes on the token total") {
    val sp = spark
    import sp.implicits._
    // counts: x=1, y=1, z=2, w=3 -> N_1=2, N_2=1, N_3=1
    val dirC = java.nio.file.Files.createTempDirectory("graft-gt").toString
    Seq((1L, "x z w"), (2L, "y z w w")).toDF("doc_id", "text")
      .write.parquet(s"$dirC/documents.parquet")
    val c = TextAnalysis.goodTuring(spark, dirC).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(c(1L) == ((2L, 2L, 1.0)), "r=1: N_1=2, gt_num=2*N_2=2, r*=1")
    assert(c(2L) == ((1L, 3L, 3.0)), "r=2: N_2=1, gt_num=3*N_3=3, r*=3")
    assert(c(3L) == ((1L, 0L, 0.0)), "r=3: N_3=1, no N_4 -> gt_num 0")
    // real data: recount fof from the raw stream, close the mass law.
    // The cap is a RANK cap (lowest-20 observed r values), so the
    // result is non-empty even though the sf corpus's rarest token
    // occurs 26 times — a value cap r<=20 would return zero rows.
    val res = TextAnalysis.goodTuring(spark, sf).collect()
    assert(res.nonEmpty)
    val counts = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("r"))
      .collect().map(_.getLong(1))
    val fofAll = counts.groupBy(identity).map { case (r, xs) =>
      r -> xs.length.toLong }
    val window = fofAll.keys.toSeq.sorted.take(20)
    assert(res.map(_.getLong(0)).toSeq == window,
      "result rows are exactly the lowest-20 observed r values in order")
    res.foreach { r =>
      val rr = r.getLong(0)
      assert(r.getLong(1) == fofAll(rr), s"N_$rr recount")
      val expNum = (rr + 1) * fofAll.getOrElse(rr + 1, 0L)
      assert(r.getLong(2) == expNum, s"gt_num at r=$rr")
      assert(r.getLong(3) == fofAll(rr))
    }
    assert(fofAll.map { case (r, n) => r * n }.sum == counts.sum,
      "sum of r*N_r over ALL r must equal the corpus token total")
  }

  test("chao1: per-source recount from raw frequencies; the estimate " +
    "dominates the observed vocabulary; all-unique fixture by hand") {
    val sp = spark
    import sp.implicits._
    val res = TextAnalysis.chao1Richness(spark, sf).collect()
    assert(res.nonEmpty)
    val st = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    res.foreach { r =>
      val freqs = st(r.getString(0)).groupBy(_._2).map(_._2.length.toLong)
      val (v, f1, f2) =
        (freqs.size.toLong, freqs.count(_ == 1L).toLong, freqs.count(_ == 2L).toLong)
      assert(r.getLong(1) == v && r.getLong(2) == f1 && r.getLong(3) == f2,
        s"${r.getString(0)} recount")
      val exp = BigDecimal(v.toDouble +
        (BigInt(f1) * (f1 - 1)).toDouble / (2.0 * (f2 + 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == exp && r.getDouble(4) >= v.toDouble,
        "chao1 re-derives and dominates vocab")
    }
    // all-unique source: f1=V, f2=0 -> chao1 = V + V(V-1)/2
    val dirU = java.nio.file.Files.createTempDirectory("graft-chao").toString
    Seq((1L, "aa bb cc dd", "s1")).toDF("doc_id", "text", "source")
      .write.parquet(s"$dirU/documents.parquet")
    val u = TextAnalysis.chao1Richness(sp, dirU).collect().head
    assert(u.getLong(1) == 4L && u.getLong(2) == 4L && u.getLong(3) == 0L)
    assert(u.getDouble(4) == 4.0 + 4.0 * 3.0 / 2.0)
  }

  test("vocab overlap: pairwise Jaccard recounts from driver-side " +
    "sets; identical sources score 1.0 and disjoint pairs are absent") {
    val sp = spark
    import sp.implicits._
    val res = TextAnalysis.vocabOverlap(spark, sf).collect()
    assert(res.nonEmpty, "the sf corpus shares vocabulary across sources")
    val vocabs = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    res.foreach { r =>
      val (a, b) = (vocabs(r.getString(0)), vocabs(r.getString(1)))
      assert(r.getString(0) < r.getString(1), "each unordered pair once")
      assert(r.getLong(2) == a.size.toLong && r.getLong(3) == b.size.toLong)
      assert(r.getLong(4) == (a & b).size.toLong, "intersection recount")
      assert(r.getLong(5) == (a | b).size.toLong, "inclusion-exclusion union")
    }
    val dirV = java.nio.file.Files.createTempDirectory("graft-vov").toString
    Seq((1L, "p q r", "sA"), (2L, "p q r", "sB"), (3L, "x y z", "sC"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirV/documents.parquet")
    val pairs = TextAnalysis.vocabOverlap(sp, dirV).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    assert(pairs == Map(("sA", "sB") -> 1.0),
      "identical pair scores 1.0; disjoint pairs carry no row")
  }

  test("simpson diversity: crafted constant/uniform sources by hand; " +
    "real-data moments recount from the raw frequencies") {
    val sp = spark
    import sp.implicits._
    val dirS = java.nio.file.Files.createTempDirectory("graft-simp").toString
    Seq((1L, "a a a a", "s1"), (2L, "a b c d", "s2"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirS/documents.parquet")
    val c = TextAnalysis.simpsonDiversity(sp, dirS).collect()
      .map(r => r.getString(0) -> r).toMap
    // s1: V=1 T=4 S2=16 -> simpson 0, effective vocabulary 1
    assert(c("s1").getLong(1) == 1L && c("s1").getLong(2) == 4L)
    assert(c("s1").getDouble(3) == 0.0 && c("s1").getDouble(4) == 1.0)
    // s2: V=4 T=4 S2=4 -> gs 12/16 = 0.75, effective vocabulary 4
    assert(c("s2").getDouble(3) == 0.75 && c("s2").getDouble(4) == 4.0)
    // real data: recount every moment from the raw frequency stream;
    // the two readings re-derive over the declared fixed double trees
    val res = TextAnalysis.simpsonDiversity(spark, sf).collect()
    assert(res.nonEmpty)
    val freqs = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (src, xs) =>
        src -> xs.groupBy(_._2).map(_._2.length.toLong) }
    res.foreach { r =>
      val f = freqs(r.getString(0))
      val (v, t) = (f.size.toLong, f.sum)
      val s2 = f.map(x => BigInt(x) * x).sum
      val t2 = BigInt(t) * t
      assert(r.getLong(1) == v && r.getLong(2) == t,
        s"${r.getString(0)} moments")
      val expS = BigDecimal((t2 - s2).toDouble / t2.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expE = BigDecimal(t2.toDouble / s2.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expS && r.getDouble(4) == expE)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
      assert(r.getDouble(4) >= 1.0 && r.getDouble(4) <= v.toDouble,
        "effective vocabulary lies in [1, vocab]")
    }
  }

  test("unigram tv drift: identical pair 0, disjoint pair 1, mixed " +
    "pair by hand; real-data distances recount from the distributions") {
    val sp = spark
    import sp.implicits._
    import graft.operators.Quality
    val dirT = java.nio.file.Files.createTempDirectory("graft-tv").toString
    Seq((1L, "x x y", "sA"), (2L, "x x y", "sB"), (3L, "z z z", "sC"),
      (4L, "x y", "sD"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirT/documents.parquet")
    val c = Quality.unigramTvDrift(sp, dirT).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    assert(c.size == 6, "every unordered source pair surfaces")
    assert(c(("sA", "sB")) == 0.0, "identical distributions")
    assert(c(("sA", "sC")) == 1.0 && c(("sB", "sC")) == 1.0,
      "vocabulary-disjoint pairs reach the TV maximum")
    // sA={x:2/3,y:1/3} vs sD={x:1/2,y:1/2}: TV = 1/6 -> 0.166667
    assert(c(("sA", "sD")) == 0.166667, "hand-computed mixed pair")
    assert(c(("sC", "sD")) == 1.0)
    // real data: recount every pair from the driver-side distributions
    val res = Quality.unigramTvDrift(spark, sf).collect()
    assert(res.nonEmpty)
    val dist = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (src, xs) =>
        src -> xs.groupBy(_._2).map { case (t, ys) => t -> ys.length.toLong } }
    val nSrc = dist.size
    assert(res.length == nSrc * (nSrc - 1) / 2, "all unordered pairs")
    res.foreach { r =>
      val (fa, fb) = (dist(r.getString(0)), dist(r.getString(1)))
      val (ta, tb) = (fa.values.sum, fb.values.sum)
      assert(r.getLong(2) == ta && r.getLong(3) == tb)
      val num = (fa.keySet ++ fb.keySet).toSeq.map { t =>
        math.abs(fa.getOrElse(t, 0L) * tb - fb.getOrElse(t, 0L) * ta)
      }.sum
      assert(r.getLong(4) == num, s"tv_num ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(5) == 2L * ta * tb)
    }
  }

  test("keyness: a planted source-exclusive token dominates its " +
    "source; real-data chi2 and ranks recount from the margins") {
    val sp = spark
    import sp.implicits._
    val dirK = java.nio.file.Files.createTempDirectory("graft-key").toString
    Seq((1L, "common common alpha alpha alpha", "s1"),
      (2L, "common common beta beta beta", "s2"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirK/documents.parquet")
    val c = TextAnalysis.chi2Keyness(sp, dirK).collect()
    val top = c.filter(_.getInt(7) == 1).map(r =>
      r.getString(0) -> r.getString(1)).toMap
    assert(top == Map("s1" -> "alpha", "s2" -> "beta"),
      "each source's exclusive token is its top keyness hit")
    assert(!c.exists(_.getString(1) == "common"),
      "an evenly-shared token is never over-represented (z <= 0)")
    // real data: recount the full scoring from driver-side margins
    val res = TextAnalysis.chi2Keyness(spark, sf).collect()
    assert(res.nonEmpty)
    val stRows = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val aMap = stRows.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val cT = stRows.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val tS = stRows.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val tAll = stRows.length.toLong
    val expected = aMap.toSeq.flatMap { case ((src, tok), a) =>
      val (ts, ct) = (tS(src), cT(tok))
      val z = a * (tAll - ts - ct + a) - (ts - a) * (ct - a)
      if (z > 0 && tAll > ts && tAll > ct) {
        val chi2 = BigDecimal(tAll.toDouble * z / ts * z / (tAll - ts) /
          ct / (tAll - ct)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        Some((src, tok, a, z, chi2.toDouble))
      } else None
    }.groupBy(_._1).flatMap { case (src, xs) =>
      xs.sortBy(x => (-x._5, x._2)).take(5).zipWithIndex.map {
        case ((s, t, a, z, chi), i) => (s, i + 1) -> ((t, a, z, chi)) }
    }
    res.foreach { r =>
      val exp = expected((r.getString(0), r.getInt(7)))
      assert((r.getString(1), r.getLong(2), r.getLong(5), r.getDouble(6))
        == exp, s"rank ${r.getInt(7)} of ${r.getString(0)}")
    }
    assert(res.length == expected.size, "exactly the top-5 rows per source")
  }
}
