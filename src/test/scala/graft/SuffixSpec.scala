package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Suffix

/** Distributed suffix ranking (prefix doubling) + exact duplicate-span
  * extraction ([[Suffix.suffixSpans]], q_suffix_spans) — the
  * exact-substring method of Lee et al. 2022 that the fixed-gram
  * signals approximate. Every law here recounts against a DRIVER
  * suffix/window brute force on crafted corpora. */
class SuffixSpec extends AnyFunSuite {
  import TestSpark._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-suffix").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(text: String): Vector[String] =
    text.trim.toLowerCase.split("\\s+").toVector

  /** Driver brute force: maximal duplicated spans ≥ L — mark every
    * position whose L-window occurs at any OTHER (doc, pos), then
    * merge consecutive marks. */
  private def bruteSpans(docs: Seq[(Long, String)],
      L: Int): Seq[(Long, Long, Long)] = {
    val wins = docs.flatMap { case (id, text) =>
      val t = toks(text)
      (0 to t.length - L).map(i => (id, i, t.slice(i, i + L)))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val marked = wins.filter(w => counts(w._3) >= 2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    marked.toSeq.flatMap { case (id, ps) =>
      val runs = ps.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
        if (acc.nonEmpty && acc.last.last == p - 1)
          acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }
      runs.map(r => (id, r.head.toLong, (r.last - r.head + L).toLong))
    }.sortBy(t => (t._1, t._2))
  }

  private def runSpans(dir: String, L: Int): Seq[(Long, Long, Long)] =
    Suffix.suffixSpans(spark, dir, L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("the crafted case fixed ALIGNED 8-grams provably miss: two docs " +
    "share a 15-token run at offsets 3 and 5 (different mod 8), so " +
    "segment dedup sees zero duplicate segments — suffixSpans reports " +
    "the exact 15-token span in BOTH docs, boundaries and all") {
    val shared = (1 to 15).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, "a1 a2 a3 " + shared + " a4 a5"),
      (2L, "b1 b2 b3 b4 b5 " + shared + " b6"))
    val dir = writeDocs(docs)
    val got = runSpans(dir, 8)
    assert(got == Seq((1L, 3L, 15L), (2L, 5L, 15L)),
      s"exact variable-length spans expected: $got")
    // the aligned-segment method (stride-8 segments) finds NOTHING:
    // no 8-aligned segment repeats because the offsets differ mod 8
    val seg = graft.operators.Dedup.segmentDedup(spark, dir).collect()
    seg.foreach(r => assert(r.getAs[Long]("n_segments") ==
      r.getAs[Long]("n_kept"),
      s"aligned segments must all survive (no aligned repeat): $r"))
    // and the driver brute force agrees with the spans
    assert(got == bruteSpans(docs, 8))
  }

  test("span laws on crafted corpora: intra-doc repeats count as " +
    "occurrences; overlapping duplicated windows merge into ONE " +
    "maximal span; shared tails shorter than minLen never mark; " +
    "shared tails ≥ minLen produce exact tail spans") {
    // intra-doc: a 9-token phrase at offsets 0 and 12 of the same doc
    val phrase = (1 to 9).map(i => s"p$i").mkString(" ")
    val intra = Seq((1L, phrase + " x1 x2 x3 " + phrase))
    assert(runSpans(writeDocs(intra), 8) == bruteSpans(intra, 8))
    assert(runSpans(writeDocs(intra), 8) ==
      Seq((1L, 0L, 9L), (1L, 12L, 9L)))
    // overlap-merge: doc 1 holds [s1..s10] and doc 2 holds [s1..s9],
    // doc 3 holds [s2..s10] — doc 1's windows all duplicate somewhere
    // (prefix in doc 2, suffix in doc 3) and merge to one 10-token span
    val s = (1 to 10).map(i => s"s$i")
    val overlap = Seq(
      (1L, s.mkString(" ")),
      (2L, "t1 " + s.take(9).mkString(" ")),
      (3L, s.drop(1).mkString(" ") + " t2"))
    val got = runSpans(writeDocs(overlap), 8)
    assert(got == bruteSpans(overlap, 8), s"overlap-merge diverged: $got")
    assert(got.contains((1L, 0L, 10L)),
      s"doc 1 must merge the overlapping windows into one span: $got")
    // truncated tails: same 5-token ending (< minLen) must NOT mark —
    // the doc-length fence (a truncated suffix class never reaches 2
    // full-window members)
    val tail5 = Seq((1L, "a b c d e f g h i z1 z2 z3 z4 z5"),
      (2L, "q r s t u v w x y z1 z2 z3 z4 z5"))
    assert(runSpans(writeDocs(tail5), 8).isEmpty,
      "a shared 5-token tail is below minLen and must not span")
    // same 10-token ending → exact 10-token tail spans in both docs
    val t10 = (1 to 10).map(i => s"z$i").mkString(" ")
    val tail10 = Seq((1L, "a b c " + t10), (2L, "d e " + t10))
    val gotTail = runSpans(writeDocs(tail10), 8)
    assert(gotTail == Seq((1L, 3L, 10L), (2L, 2L, 10L)),
      s"exact tail spans expected: $gotTail")
  }

  test("non-power-of-two minLen (the composite sparse-table key): " +
    "minLen 5 and 12 match the driver brute force on a mixed corpus") {
    val shared12 = (1 to 12).map(i => s"m$i").mkString(" ")
    val shared6 = (1 to 6).map(i => s"n$i").mkString(" ")
    val docs = Seq(
      (1L, "a b " + shared12 + " c " + shared6),
      (2L, shared6 + " d e f " + shared12),
      (3L, "g h i j k l m n o p q r s t"))
    val dir = writeDocs(docs)
    for (l <- Seq(5, 12)) {
      val got = runSpans(dir, l)
      assert(got == bruteSpans(docs, l),
        s"minLen=$l diverged from brute force: $got vs ${bruteSpans(docs, l)}")
    }
    // the 6-token share marks at minLen 5 but not at minLen 12
    assert(runSpans(dir, 5).exists(t => t._3 == 6L))
    assert(runSpans(dir, 12).forall(t => t._3 == 12L))
  }

  test("fullSuffixOrder equals a driver suffix sort: dense ranks match " +
    "lexicographic suffix order with end-of-doc below every token and " +
    "identical cross-doc suffixes tied") {
    val docs = Seq(
      (1L, "b a n a n a"),
      (2L, "a n a b"),
      (3L, "b a n"))
    val dir = writeDocs(docs)
    val got = Suffix.fullSuffixOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // driver: all suffixes as token vectors, lexicographic order with
    // shorter-prefix-first (Seq ordering), dense ranks over equals
    val sufs = docs.flatMap { case (id, text) =>
      val t = toks(text)
      t.indices.map(i => (id, i, t.drop(i)))
    }
    implicit val ord: Ordering[Seq[String]] = (a, b) => {
      val n = math.min(a.length, b.length)
      var i = 0
      var c = 0
      while (i < n && c == 0) { c = a(i).compareTo(b(i)); i += 1 }
      if (c != 0) c else a.length - b.length
    }
    val classes = sufs.map(_._3: Seq[String]).distinct.sorted
    val rankOf = classes.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val expected = sufs.map(s => (s._1, s._2) -> rankOf(s._3)).toMap
    assert(got == expected,
      s"suffix ranks diverge from the driver sort:\n got=$got\n exp=$expected")
  }

  test("spanClip removes exactly the span-covered tokens: partial clips " +
    "keep surviving tokens in order, an exact-duplicate doc clips to " +
    "EMPTY (the row survives), untouched docs pass through verbatim, " +
    "and n_removed reconciles with the suffixSpans interval set") {
    val shared = (1 to 9).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, "a b c " + shared + " x y"),
      (2L, shared),            // exact duplicate content: fully covered
      (3L, "u v w unique tokens only here"))
    val dir = writeDocs(docs)
    val got = graft.operators.Suffix.spanClip(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(got(1L) == ((14L, 9L, "a b c x y")),
      s"partial clip must keep order: ${got(1L)}")
    assert(got(2L) == ((9L, 9L, "")),
      s"fully duplicated doc must clip to empty but keep its row: ${got(2L)}")
    assert(got(3L) == ((7L, 0L, "u v w unique tokens only here")),
      s"untouched doc must pass through: ${got(3L)}")
    // reconciliation: n_removed per doc == tokens covered by the span set
    val spans = runSpans(dir, 8)
    val coveredByDoc = spans.groupBy(_._1).view.mapValues(ss =>
      ss.flatMap(s => s._2 until (s._2 + s._3)).distinct.size.toLong).toMap
    got.foreach { case (id, (_, removed, _)) =>
      assert(removed == coveredByDoc.getOrElse(id, 0L),
        s"doc $id: n_removed $removed != covered ${coveredByDoc.get(id)}")
    }
  }

  test("the generated DuckDB oracles derive from the ONE shared minLen " +
    "constant: SparkEntry registers exactly spanOracleSql()/clipOracleSql() " +
    "and a changed constant regenerates every width-dependent clause") {
    // the wired default: what the driver's oracle runs IS the generator
    assert(SparkEntry.oracleSql("q_suffix_spans") == Suffix.spanOracleSql())
    assert(SparkEntry.oracleSql("q_span_clip") == Suffix.clipOracleSql())
    assert(Suffix.spanOracleSql() == Suffix.spanOracleSql(Suffix.SpanMinLen))
    // regeneration law: every clause that encodes the window width
    // follows the constant (gram slice, series bound, length fence,
    // span-length arithmetic, coverage offsets)
    val s12 = Suffix.spanOracleSql(12)
    assert(s12.contains("toks[i:(i+11)]") &&
      s12.contains("len(toks) - 11") &&
      s12.contains("len(toks) >= 12") &&
      s12.contains("- min(pos) + 12 AS BIGINT"), s12)
    val c12 = Suffix.clipOracleSql(12)
    assert(c12.contains("toks[i:(i+11)]") &&
      c12.contains("generate_series(0, 11)") &&
      c12.contains("len(toks) >= 12"), c12)
    // and the default really is the operators' default (one constant)
    assert(Suffix.spanOracleSql().contains(
      s"len(toks) >= ${Suffix.SpanMinLen}"))
  }

  test("suffixRanks frees superseded doubling-round checkpoints: a " +
    "many-round fullSuffixOrder leaves ~2 corpus-sized artifacts in " +
    "block-manager storage, not log(maxLen) of them") {
    // a 600-token doc → 10 doubling rounds; without the per-round
    // unpersist the persistent-RDD count grows by ~rounds
    val longDoc = (1 to 600).map(i => s"w${i % 37} t$i").mkString(" ")
    val dir = writeDocs(Seq((1L, longDoc), (2L, "a b c d e f")))
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val ranks = Suffix.fullSuffixOrder(spark, dir)
    assert(ranks.count() > 0)
    val leaked = sc.getPersistentRDDs.keySet.toSet -- before
    // allowed residue: the positions checkpoint + the FINAL round's
    // rank table (the caller's live result) — nothing per-round
    assert(leaked.size <= 3,
      s"fullSuffixOrder leaked ${leaked.size} persistent RDDs " +
        s"(expected ≤ 3: positions + final ranks): $leaked")
  }

  test("real-data sanity at sf: spans respect doc bounds and minLen, " +
    "and every span's token run is genuinely duplicated (recount on " +
    "the span set itself)") {
    val spans = Suffix.suffixSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.nonEmpty, "sf corpus repeats boilerplate; spans expected")
    assert(spans.forall(_._3 >= 8L))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    spans.foreach { case (id, start, len) =>
      assert(start + len <= docs(id).length,
        s"span ($id,$start,$len) exceeds doc length ${docs(id).length}")
    }
    // recount: every 8-window inside every span occurs ≥ 2 times corpus-wide
    val all = docs.toSeq.flatMap { case (id, t) =>
      (0 to t.length - 8).map(i => t.slice(i, i + 8)) }
      .groupBy(identity).view.mapValues(_.size).toMap
    spans.foreach { case (id, start, len) =>
      (start to start + len - 8).foreach { i =>
        val w = docs(id).slice(i.toInt, i.toInt + 8)
        assert(all(w) >= 2, s"window at ($id,$i) not duplicated")
      }
    }
  }
}
