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
    val keys = res.map(r => (-r.getDouble(5), r.getString(0)))
    assert(keys.zip(keys.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2) })
    // driver recount from the raw token stream
    val tfs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = Tables.documents(spark, sf).count()
    val byTok = tfs.groupBy(_._2)
    res.foreach { r =>
      val perDoc = byTok(r.getString(0)).groupBy(_._1).map(_._2.length.toLong)
      assert(r.getLong(1) == perDoc.size.toLong)
      val t = perDoc.sum; val sq = perDoc.map(x => x * x).sum
      assert(r.getLong(2) == t)
      assert(r.getLong(3) == n * sq - t * t, s"${r.getString(0)} num")
      assert(r.getLong(4) == n * t)
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
}
