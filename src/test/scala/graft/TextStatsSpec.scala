package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Semantic checks for the corpus-statistics scoring family (PMI
  * collocations, vocabulary coverage, interpolated bigram LM) — the
  * DuckDB oracle hash-checks the full result; these pin the semantics
  * to independent recounts so a "both engines wrong the same way" bug
  * can't hide behind the hash match.
  */
class TextStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("pmi: head pair's score reproduces from raw corpus counts") {
    val res = TextAnalysis.pmiCollocations(spark, sf).collect()
    assert(res.nonEmpty && res.length <= 50)
    assert(res.forall(r => r.getLong(2) >= 5), "min-count floor violated")
    // ranked descending on the rounded score
    val scores = res.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // independent recount of the head pair from the raw corpus
    val head = (res.head.getString(0), res.head.getString(1))
    val n = res.head.getLong(2)
    val pmi = res.head.getDouble(3)
    val toks = Tables.documents(spark, sf)
      .select(split(lower(trim(col("text"))), "\\s+").as("t"))
    val totTok = toks.select(explode(col("t")).as("k")).count().toDouble
    val cL = toks.select(explode(col("t")).as("k"))
      .filter(col("k") === head._1).count().toDouble
    val cR = toks.select(explode(col("t")).as("k"))
      .filter(col("k") === head._2).count().toDouble
    val totPair = toks.select((size(col("t")) - 1).as("m"))
      .filter(col("m") > 0).agg(sum(col("m"))).head.getLong(0).toDouble
    val expected = math.log((n * totTok * totTok) / (totPair * cL * cR))
    assert(math.abs(pmi - expected) < 1e-3,
      s"pmi($head) = $pmi, recount says $expected")
  }

  test("vocab coverage: totals add up and a full-vocab doc has zero OOV") {
    val res = TextAnalysis.vocabCoverage(spark, sf)
    val agg = res.agg(sum("n_tokens"), sum("n_oov")).head
    val totalToks = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("k")).count()
    assert(agg.getLong(0) == totalToks, "per-doc token counts must cover the corpus")
    assert(agg.getLong(1) >= 0 && agg.getLong(1) <= agg.getLong(0))
    // every rate is n_oov / n_tokens
    val bad = res.filter(
      abs(col("oov_rate") - round(col("n_oov") / col("n_tokens"), 4)) > 1e-9)
      .count()
    assert(bad == 0)
  }

  test("char entropy: closed-form values and parity with an explode recount") {
    import spark.implicits._
    import graft.functions.HashExpressions.charEntropy
    val probe = Seq("aaaa", "abcd", "aabb", "ab",
      "the quick brown fox").toDF("text")
    val got = probe.select(charEntropy(col("text"))).as[Double].collect()
    assert(math.abs(got(0) - 0.0) < 1e-12, "single-symbol string has zero entropy")
    assert(math.abs(got(1) - 2.0) < 1e-12, "4 uniform symbols = 2 bits")
    assert(math.abs(got(2) - 1.0) < 1e-12, "2 uniform symbols = 1 bit")
    assert(math.abs(got(3) - 1.0) < 1e-12)
    // parity on real corpus text against the explode→groupBy formulation
    val doc = Tables.documents(spark, sf).orderBy("doc_id").limit(1)
      .select(col("text")).as[String].head()
    val counts = doc.toSeq.groupBy(identity).map(_._2.size)
    val n = doc.length.toDouble
    val expected = -counts.map { c =>
      val p = c / n; p * (math.log(p) / math.log(2.0))
    }.sum
    val native = TextAnalysis.charEntropyProfile(spark, sf)
      .orderBy("doc_id").limit(1).select(col("entropy_bits")).as[Double].head()
    assert(math.abs(native - expected) < 1e-4)
  }

  test("robust outliers: MAD profile reproduces from a driver recount") {
    import spark.implicits._
    val res = graft.operators.RelationalExt.robustOutliers(spark, sf).collect()
    assert(res.nonEmpty)
    val total = res.map(_.getLong(1)).sum
    assert(total == Tables.lineitem(spark, sf).count())
    // recount one group end-to-end on the driver (sf0.001 is small)
    val grp = res.head.getString(0)
    val xs = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === grp)
      .select(col("l_extendedprice")).as[Double].collect().sorted
    def medianOf(v: Array[Double]): Double = {
      val m = v.length / 2
      if (v.length % 2 == 1) v(m) else (v(m - 1) + v(m)) / 2.0
    }
    val med = medianOf(xs)
    val mad = medianOf(xs.map(x => math.abs(x - med)).sorted)
    assert(math.abs(res.head.getDouble(2) - med) < 1e-2, "median")
    assert(math.abs(res.head.getDouble(3) - mad) < 1e-2, "mad")
    val nOut = xs.count(x => math.abs(0.6745 * (x - med) / mad) > 3.0)
    assert(res.head.getLong(4) == nOut, "outlier count")
  }

  test("bigram logprob: probabilities are proper and bigram totals match") {
    val res = TextAnalysis.bigramLogprob(spark, sf)
    assert(res.filter(col("avg_logprob") >= 0.0).count() == 0,
      "interpolated bigram probability must be < 1 on a multi-token vocab")
    val totBigrams = res.agg(sum("n_bigrams")).head.getLong(0)
    val expected = Tables.documents(spark, sf)
      .select((size(split(lower(trim(col("text"))), "\\s+")) - 1).as("m"))
      .filter(col("m") > 0).agg(sum(col("m"))).head.getLong(0)
    assert(totBigrams == expected,
      s"scored $totBigrams bigram positions, corpus has $expected")
  }

  test("token budget: greedy prefix is maximal, tie-safe, and score-bounded") {
    val budget = 20000L
    val rows = TextAnalysis.tokenBudgetSelect(spark, sf, budget).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // the windowed relation is the distinct rounded-score set: hard
    // bound 10001 at ANY corpus size
    assert(rows.length <= 10001)
    val (sel, unsel) = rows.partition(_._5)
    assert(sel.nonEmpty, "budget admits nothing — corpus/budget mismatch")
    val selTotal = sel.map(_._3).sum
    assert(selTotal <= budget, s"selected $selTotal exceeds budget")
    // maximality: the best unselected group would overflow
    if (unsel.nonEmpty) {
      val bestUnsel = unsel.maxBy(_._1)
      assert(selTotal + bestUnsel._3 > budget,
        "a whole excluded group still fits — selection not maximal")
      // prefix property: every selected score beats every unselected
      assert(sel.map(_._1).min > unsel.map(_._1).max)
    }
    // cum_tokens is the running sum in quality-descending order
    val sorted = rows.sortBy(-_._1)
    sorted.foldLeft(0L) { case (acc, (_, _, grp, cum, _)) =>
      assert(cum == acc + grp); cum
    }
    // group token mass re-derived from the per-doc frame
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(rows.map(_._3).sum == totalTokens)
  }

  test("source quota: per-source maximal greedy prefix, quota respected " +
    "independently per source") {
    val quota = 5000L
    val rows = TextAnalysis.sourceQuotaSelect(spark, sf, quota).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(3), r.getBoolean(5)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.size > 1, "need multiple sources to test capping")
    bySource.foreach { case (src, grps) =>
      val (sel, unsel) = grps.partition(_._4)
      val selTotal = sel.map(_._3).sum
      assert(selTotal <= quota, s"$src exceeded quota: $selTotal")
      if (unsel.nonEmpty && sel.nonEmpty) {
        // maximality within the source
        assert(selTotal + unsel.maxBy(_._2)._3 > quota,
          s"$src selection not maximal")
        // prefix property within the source
        assert(sel.map(_._2).min > unsel.map(_._2).max, s"$src not a prefix")
      }
    }
  }

  test("chunking: windows tile every token, offsets map chunks back into " +
    "the source exactly, tail chunk truncated never dropped") {
    import org.apache.spark.sql.functions._
    val w = 32; val stride = 24
    val chunks = TextAnalysis.chunkSpans(spark, sf, w, stride).collect()
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == toks.filter(_._2.nonEmpty).keySet)
    for ((doc, cs) <- byDoc) {
      val t = toks(doc)
      // chunk text IS the token slice at its offsets
      for (c <- cs) {
        val start = c.getLong(2).toInt; val n = c.getLong(3).toInt
        assert(c.getString(4) == t.slice(start - 1, start - 1 + n).mkString(" "),
          s"doc $doc chunk ${c.getLong(1)} does not match its offsets")
      }
      // full coverage: every token position is inside some chunk, and the
      // last chunk reaches the final token
      val covered = cs.flatMap(c =>
        c.getLong(2) to (c.getLong(2) + c.getLong(3) - 1)).toSet
      assert(covered == (1L to t.length.toLong).toSet, s"doc $doc has gaps")
      // chunk count matches the documented formula
      val expect = 1 + math.ceil(math.max(0, t.length - w) / stride.toDouble).toInt
      assert(cs.length == expect, s"doc $doc: ${cs.length} chunks, want $expect")
    }
  }

  test("mixture weights: w_micro is the fixed-point sqrt, rel_rate is 1 " +
    "exactly for the largest source and monotone in source size") {
    val rows = graft.operators.Sampling.mixtureWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    for ((_, n, wMicro, rel) <- rows) {
      assert(wMicro == math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong)
      assert(rel > 0 && rel <= 1.0)
    }
    val nMax = rows.map(_._2).max
    assert(rows.filter(_._2 == nMax).forall(_._4 == 1.0))
    // alpha < 1 compresses: rel_rate ordering follows n but sub-linearly
    val sorted = rows.sortBy(_._2)
    assert(sorted.map(_._4).zip(sorted.tail.map(_._4)).forall { case (a, b) => a <= b })
  }

  test("winnowing: per-doc fingerprints reproduce the reference " +
    "algorithm exactly (k-gram md5, window-of-w minimum, distinct)") {
    val k = 4; val w = 5
    val got = TextAnalysis.winnowFingerprints(spark, sf, k, w).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    def h(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val expect = toks.collect { case (id, t) if t.length >= k =>
      val hs = t.sliding(k).map(g => h(g.mkString(" "))).toVector
      id -> (0 to math.max(hs.length - w, 0)).map(i =>
        hs.slice(i, i + w).min).toSet
    }
    assert(got == expect, "fingerprints disagree with the driver winnow")
    // density: selection keeps ~1/w of grams — never more than the
    // window count, and at least one fp per doc that had any gram
    assert(expect.forall { case (id, fps) => fps.nonEmpty && got(id) == fps })
    // the winnowing guarantee on real data: two docs sharing a token
    // run of length >= w + k - 1 share at least one fingerprint
    val runLen = w + k - 1
    val runs = toks.toSeq.flatMap { case (id, t) =>
      if (t.length >= runLen) t.sliding(runLen).map(r => r.mkString(" ") -> id)
      else Iterator.empty
    }.groupBy(_._1).values.map(_.map(_._2).distinct).filter(_.size >= 2)
    runs.take(50).foreach { ids =>
      val shared = ids.map(got).reduce(_ intersect _)
      assert(shared.nonEmpty,
        s"docs $ids share a $runLen-token run but no fingerprint")
    }
  }

  test("winnow candidates: pairs recount from the fingerprint relation " +
    "and no over-df fingerprint contributes") {
    val (k, w, minShared, maxFpDf) = (4, 5, 2, 50)
    val got = TextAnalysis.winnowCandidates(spark, sf, k, w, minShared, maxFpDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fps = TextAnalysis.winnowFingerprints(spark, sf, k, w).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val expect = byFp.values.filter(_.size <= maxFpDf).toSeq
      .flatMap(ids => for (i <- ids.indices; j <- i + 1 until ids.size)
        yield (ids(i), ids(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minShared)
    assert(got == expect, "candidate pairs disagree with the driver recount")
    assert(got.nonEmpty, "corpus should contain at least one near-dup pair")
  }

  test("length buckets: cap is the least power of two >= token count; " +
    "padding identities and totals hold") {
    val rows = graft.operators.Sampling.lengthBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, nd, st, p, wsh) =>
      assert(b >= 1L && (b & (b - 1)) == 0L, s"bucket $b not a power of two")
      assert(p == b * nd - st, "padding identity broken")
      assert(p >= 0L && wsh >= 0.0 && wsh < 1.0)
    }
    // per-doc recount of bucket assignment and token totals
    val ns = Tables.documents(spark, sf)
      .select(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
        " ")).cast("long")).collect().map(_.getLong(0))
    def cap(n: Long): Long = { var b = 1L; while (b < n) b <<= 1; b }
    val expect = ns.map(cap).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(t => t._1 -> t._2).toMap == expect)
    assert(rows.map(_._3).sum == ns.sum, "token totals disagree")
  }

  test("nb train: counts and class totals recount from the raw train " +
    "split; totals precede the minCount prune") {
    val rows = TextAnalysis.nbTrain(spark, sf, minCount = 5L).collect()
    assert(rows.nonEmpty)
    // driver recount over the train split (doc_id % 10 != 7)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), lower(trim(col("text"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._1 % 10 != 7)
    val counts = docs.flatMap { case (_, lang, t) =>
      t.split("\\s+").map(tok => (lang, tok)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val classTotals = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    rows.foreach { r =>
      val (lang, tok) = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n") == counts((lang, tok)))
      assert(r.getAs[Long]("class_tokens") == classTotals(lang),
        "class totals must cover the FULL mass, not the pruned vocabulary")
      assert(r.getAs[Long]("n") >= 5L)
    }
    // the prune is exact: everything above minCount is present
    val expect = counts.filter(_._2 >= 5L).keySet
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == expect)
  }

  test("nb classify: disjoint-signature crafted corpus predicts every " +
    "held-out doc, score numerators recount") {
    val sp = spark
    import sp.implicits._
    // ids ≡ 7 (mod 10) are held out; signature tokens repeat past
    // minCount = 2 in train so the model keeps them
    val docs = (
      (0L until 30L by 10L).map(i => (i + 1, "aa", "foo foo bar")) ++
      (0L until 30L by 10L).map(i => (i + 2, "bb", "qux qux zap")) ++
      Seq((7L, "aa", "foo bar bar"), (17L, "bb", "zap qux"))
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.nbClassifyOn(docs, minCount = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == Set(7L, 17L))
    assert(got(7L).getAs[String]("pred_lang") == "aa")
    assert(got(17L).getAs[String]("pred_lang") == "bb")
    assert(got.values.forall(_.getAs[Boolean]("correct")))
    // numerator recount for doc 7: tf(foo)=1·n(aa,foo)=6, tf(bar)=2·n(aa,bar)=3
    assert(got(7L).getAs[Long]("score_num") == 1L * 6L + 2L * 3L)
    assert(got(7L).getAs[Long]("class_tokens") == 9L)
  }

  test("backoff levels: hand-computed chain on a crafted train/test pair") {
    val sp = spark
    import sp.implicits._
    // train (even id): "a b c d"; test (odd id): "z a b c q d c d w"
    // positions → levels: zab→2 (bi ab), abc→3, bcq→0, cqd→1 (uni d),
    // qdc→1, dcd→2 (bi cd), cdw→0
    val docs = Seq(
      (0L, "a b c d"), (1L, "z a b c q d c d w")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.backoffLevelsOn(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("doc_id") == 1L)
    assert(r.getAs[Long]("n_pos") == 7L)
    assert(r.getAs[Long]("n_l3") == 1L)
    assert(r.getAs[Long]("n_l2") == 2L)
    assert(r.getAs[Long]("n_l1") == 2L)
    assert(r.getAs[Long]("n_l0") == 2L)
    // levels are monotone in model strength: retraining on test ∪ train
    // can only move positions UP the chain
    val both = Seq((0L, "a b c d z a b c q d c d w"), (1L, "z a b c q d c d w"))
      .toDF("doc_id", "text")
    val r2 = TextAnalysis.backoffLevelsOn(both).collect().head
    assert(r2.getAs[Long]("n_l3") >= r.getAs[Long]("n_l3"))
    assert(r2.getAs[Long]("n_l0") <= r.getAs[Long]("n_l0"))
  }

  test("temperature mix: hand-apportioned 1:4 fixture; real-data " +
    "weights, bases and remainders recount; allocations sum to the " +
    "budget exactly") {
    val sp = spark
    import sp.implicits._
    import graft.operators.Sampling
    // n=1 vs n=4 -> weights 2^20 : 2*2^20; B=10^6: bases 333333/666666,
    // remainders 2^20 : 2*2^20 -> the single deficit unit goes to s2
    val dirM = java.nio.file.Files.createTempDirectory("graft-tmix").toString
    Seq((1L, "only", "s1"), (2L, "w x y z", "s2"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirM/documents.parquet")
    val c = Sampling.temperatureMix(sp, dirM).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(c("s1").getLong(2) == 1048576L && c("s2").getLong(2) == 2097152L)
    assert(c("s1").getLong(5) == 333333L && c("s2").getLong(5) == 666667L,
      "largest remainder receives the deficit unit")
    // real data: recount the whole apportionment driver-side
    val res = Sampling.temperatureMix(spark, sf).collect()
    assert(res.nonEmpty)
    assert(res.map(_.getLong(5)).sum == 1000000L,
      "allocations must sum to the budget exactly")
    val nTok = Tables.documents(spark, sf)
      .select(col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s2, xs) => s2 -> xs.map(_._2).sum }
    val weights = nTok.map { case (s2, n) =>
      s2 -> math.floor(math.sqrt(n.toDouble) * 1048576.0).toLong }
    val wsum = weights.values.sum
    val bases = weights.map { case (s2, w) => s2 -> (1000000L * w) / wsum }
    val rems = weights.map { case (s2, w) => s2 -> (1000000L * w) % wsum }
    val deficit = 1000000L - bases.values.sum
    val winners = rems.toSeq.sortBy { case (s2, r) => (-r, s2) }
      .take(deficit.toInt).map(_._1).toSet
    res.foreach { r =>
      val s2 = r.getString(0)
      assert(r.getLong(1) == nTok(s2) && r.getLong(2) == weights(s2))
      assert(r.getLong(3) == bases(s2) && r.getLong(4) == rems(s2))
      assert(r.getLong(5) ==
        bases(s2) + (if (winners(s2)) 1L else 0L), s"$s2 alloc")
      assert(r.getLong(5) - r.getLong(3) <= 1L)
    }
  }

  test("lang confusion: crafted corpus lands in the expected cells; " +
    "real-data cells close against the per-label totals") {
    val sp = spark
    import sp.implicits._
    val dirC = java.nio.file.Files.createTempDirectory("graft-conf").toString
    // two labeled-en docs that PREDICT en, one labeled-en doc with
    // only Spanish markers (confused), one labeled-es doc predicted es
    Seq((1L, "the cat and the dog is here", "en"),
      (2L, "the end of the story is near", "en"),
      (3L, "el gato y la casa que", "en"),
      (4L, "los perros y el sol que brilla", "es"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s1"))
      .write.parquet(s"$dirC/documents.parquet")
    val cells = TextAnalysis.langConfusion(sp, dirC).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(cells(("en", "en")) == ((2L, 3L, 0.666667)))
    assert(cells(("en", "es")) == ((1L, 3L, 0.333333)))
    assert(cells(("es", "es")) == ((1L, 1L, 1.0)))
    assert(cells.size == 3)
    // real data: per-label cell mass must close to the label total and
    // the shares to 1 (exact ratios of exact counts, rounded)
    val res = TextAnalysis.langConfusion(spark, sf).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val tot = rows.head.getLong(3)
      assert(rows.map(_.getLong(2)).sum == tot)
      assert(rows.forall(_.getLong(3) == tot))
    }
  }

  test("pii density: crafted hits per source recount by hand; real " +
    "data closes against the per-doc redaction counts") {
    val sp = spark
    import sp.implicits._
    val dirP = java.nio.file.Files.createTempDirectory("graft-piid").toString
    // sA: 2 docs, 1 email + 1 idrun over 8 tokens; sB: clean
    Seq((1L, "mail me at bob@example.com today", "sA"),
      (2L, "ref 123456789 attached here now", "sA"),
      (3L, "nothing sensitive in this text", "sB"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirP/documents.parquet")
    val d = TextAnalysis.piiDensity(sp, dirP).collect()
      .map(r => r.getString(0) -> r).toMap
    // the 9-digit run matches BOTH the phone-like and idrun patterns —
    // intentionally, as in piiRedact (the classes overlap)
    assert(d("sA").getLong(1) == 2L && d("sA").getLong(3) == 1L &&
      d("sA").getLong(4) == 1L && d("sA").getLong(5) == 1L,
      "email + phone-like + idrun counted")
    val toksA = d("sA").getLong(2)
    assert(d("sA").getDouble(6) ==
      BigDecimal(10000.0 * 3 / toksA)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(d("sB").getLong(3) == 0L && d("sB").getLong(4) == 0L &&
      d("sB").getLong(5) == 0L && d("sB").getDouble(6) == 0.0)
    // real data: per-source sums equal the per-doc piiRedact counts
    val perDoc = TextAnalysis.piiRedact(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(col("n_emails")).as("e"), sum(col("n_phones")).as("p"),
        sum(col("n_idruns")).as("i"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    TextAnalysis.piiDensity(spark, sf).collect().foreach { r =>
      val (e, p, i) = perDoc(r.getString(0))
      assert(r.getLong(3) == e && r.getLong(4) == p && r.getLong(5) == i,
        s"${r.getString(0)} hit sums")
    }
  }

  test("fertility: crafted constants by hand; real-data sums recount " +
    "from the raw corpus") {
    val sp = spark
    import sp.implicits._
    val dirF = java.nio.file.Files.createTempDirectory("graft-fert").toString
    // s1: 2 docs, 6 tokens, 24 chars -> 4.0 chars/token, 3 tokens/doc
    Seq((1L, "aa bb cc", "s1"), (2L, "dddd eeee ffffff", "s1"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirF/documents.parquet")
    val f = TextAnalysis.tokenFertility(sp, dirF).collect().head
    assert(f.getLong(1) == 2L && f.getLong(2) == 6L && f.getLong(3) == 24L)
    assert(f.getDouble(4) == 4.0 && f.getDouble(5) == 3.0)
    // real data: integer sums recount from the raw token/char streams
    val raw = Tables.documents(spark, sf)
      .select(col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("t"),
        length(col("text")).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    TextAnalysis.tokenFertility(spark, sf).collect().foreach { r =>
      val rows = raw(r.getString(0))
      assert(r.getLong(1) == rows.size.toLong &&
        r.getLong(2) == rows.map(_._2).sum &&
        r.getLong(3) == rows.map(_._3).sum, s"${r.getString(0)} sums")
    }
  }

  test("mojibake screen: crafted artifacts count by class; clean " +
    "source reads zero; density closes by hand") {
    val sp = spark
    import sp.implicits._
    val dirM = java.nio.file.Files.createTempDirectory("graft-moji").toString
    val d1 = "caf\u00c3\u00a9 menu"      // A-tilde + continuation
    val d2 = "price \u00e2\u20ac\u00a2 here" // a-circ + euro + cent
    val d3 = "bad \ufffd char \u0001 end" // replacement + control
    val d4 = "x\u00c2\u00a0y"             // A-circumflex + nbsp
    Seq((1L, d1, "sA"), (2L, d2, "sA"), (3L, d3, "sA"), (4L, d4, "sA"),
      (5L, "plain ascii text", "sB"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirM/documents.parquet")
    val m = TextAnalysis.mojibakeScreen(sp, dirM).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = m("sA")
    val chars = Seq(d1, d2, d3, d4).map(_.length.toLong).sum
    assert(a.getLong(1) == 4L && a.getLong(2) == chars)
    assert(a.getLong(3) == 1L, "one replacement char")
    assert(a.getLong(4) == 1L, "one control char")
    assert(a.getLong(5) == 3L, "three mojibake sequences")
    assert(a.getLong(6) == 8L, "non-ascii mass")
    assert(a.getDouble(7) ==
      BigDecimal(10000.0 * 5 / chars)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val b = m("sB")
    assert(b.getLong(3) == 0L && b.getLong(4) == 0L &&
      b.getLong(5) == 0L && b.getLong(6) == 0L &&
      b.getDouble(7) == 0.0)
  }

  test("sentence stats: crafted segmentation by hand (blank segments " +
    "dropped, unterminated text is one sentence); real-data sums " +
    "recount from raw splits") {
    val sp = spark
    import sp.implicits._
    val dirS = java.nio.file.Files.createTempDirectory("graft-sent").toString
    Seq((1L, "One two. Three! Four five six?", "sA"),
      (2L, "no terminal punctuation here", "sA"),
      (3L, "...", "sB"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirS/documents.parquet")
    val s = TextAnalysis.sentenceStats(sp, dirS).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = s("sA")
    assert(a.getLong(1) == 2L && a.getLong(2) == 4L && a.getLong(3) == 10L)
    assert(a.getDouble(4) == 2.0 && a.getDouble(5) == 2.5)
    val b = s("sB")
    assert(b.getLong(2) == 0L, "pure punctuation has no sentences")
    assert(b.isNullAt(5), "0-sentence source reads NULL, not a throw")
    // real data: sentence counts recount from an independent split
    val raw = Tables.documents(spark, sf)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0),
        r.getString(1).split("[.!?]+").count(_.trim.nonEmpty).toLong))
      .groupBy(_._1)
    TextAnalysis.sentenceStats(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) == raw(r.getString(0)).map(_._2).sum,
        s"${r.getString(0)} sentence recount")
    }
  }

  test("readability: crafted Flesch score closes by hand; degenerate " +
    "guards read NULL; vowel-run syllable proxy recounts on real data") {
    val sp = spark
    import sp.implicits._
    val dirR = java.nio.file.Files.createTempDirectory("graft-read").toString
    Seq((1L, "the cat sat. the dog ran.", "sA"), (2L, "...", "sB"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirR/documents.parquet")
    val r = TextAnalysis.readability(sp, dirR).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("sA")
    assert(a.getLong(2) == 2L && a.getLong(3) == 6L && a.getLong(4) == 6L)
    assert(a.getDouble(5) == 3.0 && a.getDouble(6) == 1.0)
    assert(a.getDouble(7) == 119.19, "206.835 - 1.015*3 - 84.6*1")
    assert(r("sB").isNullAt(5) && r("sB").isNullAt(7),
      "no sentences -> NULL, not a throw")
    // real data: syllable sums recount from an independent regex pass
    val raw = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0),
        "[aeiouy]+".r.findAllIn(x.getString(1).toLowerCase).length.toLong))
      .groupBy(_._1)
    TextAnalysis.readability(spark, sf).collect().foreach { x =>
      assert(x.getLong(4) == raw(x.getString(0)).map(_._2).sum,
        s"${x.getString(0)} syllable recount")
    }
  }

  test("vocab curve: crafted frequencies close by hand at custom cuts; " +
    "real-data curve is monotone and saturates at the full vocabulary") {
    val sp = spark
    import sp.implicits._
    val dirV = java.nio.file.Files.createTempDirectory("graft-vc").toString
    // a x5, b x3, c x1, d x1 -> total 10 tokens, 4 types
    Seq((1L, "a a a b b", "s"), (2L, "a a b c d", "s"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirV/documents.parquet")
    val rows = TextAnalysis.vocabCurve(sp, dirV, cuts = Seq(1, 2, 3))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(2) == 5L && rows(1L).getDouble(5) == 0.5)
    assert(rows(2L).getLong(2) == 8L && rows(2L).getDouble(5) == 0.8)
    // rank 3 is c ((freq desc, tok asc) total order breaks the c/d tie)
    assert(rows(3L).getLong(1) == 3L && rows(3L).getLong(2) == 9L &&
      rows(3L).getDouble(5) == 0.9)
    assert(rows.values.forall(r => r.getLong(3) == 10L &&
      r.getLong(4) == 4L))
    // real data: shares nondecreasing in the cut; the 10k cut holds the
    // whole (small-SF) vocabulary so the curve saturates at exactly 1
    val real = TextAnalysis.vocabCurve(spark, sf).collect()
    assert(real.length == 3)
    val shares = real.map(_.getDouble(5))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    val last = real.last
    if (last.getLong(4) <= 10000L) {
      assert(last.getLong(1) == last.getLong(4))
      assert(last.getLong(2) == last.getLong(3) &&
        last.getDouble(5) == 1.0)
    }
  }

  test("char classes: crafted counts by hand, classes partition the " +
    "char mass; real-data letter counts recount via an independent pass") {
    val sp = spark
    import sp.implicits._
    val dirK = java.nio.file.Files.createTempDirectory("graft-cc").toString
    Seq((1L, "Ab1 !x", "s"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirK/documents.parquet")
    val r = TextAnalysis.charClasses(sp, dirK).collect().head
    assert(r.getLong(2) == 6L && r.getLong(3) == 3L && r.getLong(4) == 1L &&
      r.getLong(5) == 1L && r.getLong(6) == 1L && r.getLong(7) == 0L)
    assert(r.getDouble(8) ==
      BigDecimal(10000.0 * 3 / 6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // real data: the five classes partition the char mass by
    // construction; letters recount from an independent driver pass
    val letters = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(x => (x.getString(0),
        x.getString(1).count(c => (c >= 'a' && c <= 'z') ||
          (c >= 'A' && c <= 'Z')).toLong))
      .groupBy(_._1)
    TextAnalysis.charClasses(spark, sf).collect().foreach { x =>
      assert(x.getLong(3) == letters(x.getString(0)).map(_._2).sum,
        s"${x.getString(0)} letter recount")
      assert(x.getLong(7) >= 0L, "other class cannot go negative")
    }
  }

  test("rouge pairs: crafted overlaps close by hand at both gram " +
    "orders; real-data panel is complete and one pair recounts from " +
    "raw distinct gram sets") {
    val sp = spark
    import sp.implicits._
    val dirG = java.nio.file.Files.createTempDirectory("graft-rouge").toString
    Seq((1L, "a b c", "s"), (2L, "a b d", "s"), (3L, "x y", "s"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dirG/documents.parquet")
    val rows = TextAnalysis.rougePairs(sp, dirG).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r).toMap
    assert(rows.size == 6, "3 pairs x 2 gram orders")
    val u12 = rows((1L, 2L, 1L))
    assert(u12.getLong(3) == 2L && u12.getLong(4) == 3L &&
      u12.getLong(5) == 3L && u12.getDouble(8) == 0.666667)
    val b12 = rows((1L, 2L, 2L))
    assert(b12.getLong(3) == 1L && b12.getDouble(6) == 0.5 &&
      b12.getDouble(7) == 0.5 && b12.getDouble(8) == 0.5)
    assert(rows((1L, 3L, 1L)).getLong(3) == 0L &&
      rows((1L, 3L, 1L)).getDouble(8) == 0.0)
    assert(rows((2L, 3L, 2L)).getLong(3) == 0L)
    // real data: C(20,2) pairs at each order, and the first pair's
    // intersections recount from raw distinct gram sets
    val res = TextAnalysis.rougePairs(spark, sf).collect()
    assert(res.length == 380, "190 panel pairs x 2 orders")
    val sets = graft.operators.Sampling.md5TopN(
      Tables.documents(spark, sf), "doc_id", 20)
      .select(col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
          .as("toks"))
      .collect().map { r =>
        val toks = r.getSeq[String](1).toVector
        r.getLong(0) -> ((toks.toSet,
          if (toks.size < 2) Set.empty[String]
          else toks.sliding(2).map(_.mkString(" ")).toSet))
      }.toMap
    res.foreach { r =>
      val (sa, sb) = (sets(r.getLong(0)), sets(r.getLong(1)))
      val (ga, gb) =
        if (r.getLong(2) == 1L) (sa._1, sb._1) else (sa._2, sb._2)
      assert(r.getLong(3) == (ga & gb).size.toLong,
        s"(${r.getLong(0)},${r.getLong(1)}) n=${r.getLong(2)} inter")
      assert(r.getLong(4) == ga.size.toLong &&
        r.getLong(5) == gb.size.toLong)
    }
  }
}
