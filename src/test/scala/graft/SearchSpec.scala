package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search
import graft.sources.Tables

/** Semantics of the retrieval family (inverted index / TF-IDF / BM25)
  * beyond the DuckDB oracle: structural invariants a correct search
  * stack must hold on real data. */
class SearchSpec extends AnyFunSuite {
  import TestSpark._

  test("inverted index: df/cf consistent, posting heads bounded and sorted") {
    val idx = Search.invertedIndex(spark, sf, minDf = 2L).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val df = r.getAs[Long]("df")
      val cf = r.getAs[Long]("cf")
      assert(df >= 2L)
      assert(cf >= df, "collection freq must be >= doc freq")
      val head = r.getAs[String]("postings_head").split(",")
      assert(head.length <= 5 && head.length == math.min(df, 5L))
      // head is sorted by tf desc (doc asc tiebreak) — tf is the suffix
      val tfs = head.map(_.split(":")(1).toLong)
      assert(tfs.sameElements(tfs.sortBy(-(_: Long))),
        s"posting head not tf-ordered: ${head.mkString(",")}")
    }
  }

  test("inverted index df matches an independent distinct-doc count") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"),
        col("doc_id"))
    val expected = toks.distinct().groupBy("tok").count()
      .filter(col("count") >= 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Search.invertedIndex(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("df")).toMap
    assert(got == expected)
  }

  test("tfidf: at most k terms per doc, rank ordered by score desc") {
    val rows = Search.tfidfTopTerms(spark, sf, k = 3).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length.toLong))
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores not descending: ${scores.mkString(",")}")
    }
  }

  test("bm25: hits contain a query term, scores descending, topN bounded") {
    val terms = Seq("data", "model", "spark")
    val hits = Search.bm25Search(spark, sf, terms, topN = 20).collect()
    assert(hits.nonEmpty && hits.length <= 20)
    val scores = hits.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val hitIds = hits.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = Tables.documents(spark, sf)
      .select(col("doc_id"))
      .filter(arrays_overlap(split(lower(trim(col("text"))), "\\s+"),
        typedlit(terms)))
      .collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm),
      s"docs without any query term ranked: ${hitIds -- withTerm}")
    hits.foreach { r =>
      val m = r.getAs[Long]("n_terms_matched")
      assert(m >= 1L && m <= terms.length)
    }
  }

  test("persisted search index: single- and multi-query probes equal " +
    "the live BM25 scan exactly") {
    Search.buildSearchIndex(spark, sf, "srch_spec_idx")
    val live = Search.bm25Search(spark, sf).collect().map(_.toString).toSeq
    val probed = Search.probeSearchIndex(spark, "srch_spec_idx")
      .collect().map(_.toString).toSeq
    assert(probed == live, "index probe must equal the live BM25 scan")
    // multi-query probe: each query's slice equals its own standalone
    // probe (modulo the added query_id/rank columns)
    import spark.implicits._
    val q1 = Seq("data", "model", "spark")
    val q2 = Seq("table", "join")
    val queries = (q1.map(t => (1L, t)) ++ q2.map(t => (2L, t)))
      .toDF("query_id", "tok")
    val many = Search.probeSearchIndexMany(spark, "srch_spec_idx", queries)
      .collect()
    for ((qid, terms) <- Seq(1L -> q1, 2L -> q2)) {
      val slice = many.filter(_.getLong(0) == qid)
        .sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
      val solo = Search.probeSearchIndex(spark, "srch_spec_idx", terms)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      assert(slice.toSeq == solo.toSeq, s"query $qid diverged from its solo probe")
      // ranks are 1..n within the query
      assert(many.filter(_.getLong(0) == qid).map(_.getAs[Long]("rank")).sorted
        .sameElements(1L to slice.length.toLong))
    }
  }

  test("hybrid RRF: fused score is the exact reciprocal sum of the leg " +
      "ranks, legs agree with standalone rankings, deterministic") {
    val rows = Search.hybridRrf(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // rrf = 1/(60+bm25_rank) + 1/(60+cos_rank), null legs contribute 0
    rows.foreach { r =>
      val b = Option(r.getAs[java.lang.Long]("bm25_rank")).map(_.toLong)
      val v = Option(r.getAs[java.lang.Long]("cos_rank")).map(_.toLong)
      assert(b.isDefined || v.isDefined, "a fused doc must appear in a leg")
      val expect = BigDecimal(
        b.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          v.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-9,
        s"rrf mismatch for doc ${r.getLong(0)}")
    }
    // final ranks are 1..n in rrf-descending order with doc_id tiebreak
    val ranks = rows.map(_.getAs[Long]("rank"))
    assert(ranks.toSeq == (1L to rows.length.toLong))
    val key = rows.map(r => (-r.getAs[Double]("rrf"), r.getLong(0)))
    assert(key.sameElements(key.sorted), "fused order must follow (rrf desc, doc)")
    // bm25 leg ranks equal the standalone BM25 ranking (rounded score,
    // doc tiebreak)
    val bmRanks = Search.bm25Scores(spark, sf).collect()
      .map(r => (r.getAs[Double]("bm25"), r.getAs[Long]("doc_id")))
      .sortBy { case (s, d) => (-s, d) }.map(_._2).zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    rows.foreach { r =>
      Option(r.getAs[java.lang.Long]("bm25_rank")).foreach { br =>
        assert(bmRanks(r.getLong(0)) == br.toLong,
          s"bm25 leg rank disagrees for doc ${r.getLong(0)}")
      }
    }
    // determinism
    val again = Search.hybridRrf(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }
}
