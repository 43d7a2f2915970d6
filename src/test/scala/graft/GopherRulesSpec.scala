package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

/** Exercises the Gopher rule battery at the paper's defaults on crafted
  * documents — the shipped oracle instance runs minStopHits=1 on the
  * stopword-poor synthetic corpus and its line rules are vacuous there
  * (single-line docs), so the crafted cases are where bullet/ellipsis/
  * stopword semantics actually get tested.
  */
class GopherRulesSpec extends AnyFunSuite {
  import TestSpark._

  private def run(rows: Seq[(Long, String)]) = {
    val sp = spark
    import sp.implicits._
    Quality.gopherRulesOn(
      rows.toDF("doc_id", "text").withColumn("lang", lit("en")))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private val goodBody =
    ("the data and processing of that corpus have improved with careful work " * 6).trim

  test("gopher defaults: clean prose passes, each rule fails alone") {
    val res = run(Seq(
      1L -> goodBody, // 72 words, 7 stopwords, all alphabetic
      2L -> "short text with the and of that have be to", // < 50 words
      3L -> goodBody.replace("careful", "##### ##### #####"), // symbol words
      4L -> ("scan " * 60).trim)) // 60 words but zero stop hits
    assert(res(1L).getAs[Boolean]("gopher_pass"),
      s"clean prose should pass: ${res(1L)}")
    assert(!res(2L).getAs[Boolean]("gopher_pass"), "word-count floor")
    assert(res(3L).getAs[Double]("frac_sym") > 0.1 &&
      !res(3L).getAs[Boolean]("gopher_pass"), "symbol-ratio rule")
    assert(res(4L).getAs[Long]("stop_hits") === 0L &&
      !res(4L).getAs[Boolean]("gopher_pass"), "stopword rule (>=2 default)")
  }

  test("gopher line rules: bullet-dominated and ellipsis-heavy docs fail") {
    val bullets = (1 to 10).map(i => s"- item $i of the list").mkString("\n")
    val dots = (1 to 10).map(i => s"line $i of the story trails off...")
      .mkString("\n")
    // pad word counts past the floor so ONLY the line rule decides
    val res = run(Seq(
      1L -> (bullets + "\n" + goodBody),
      2L -> (dots + "\n" + goodBody),
      3L -> (goodBody + "\nsecond line with the usual prose and that tone")))
    assert(res(1L).getAs[Double]("frac_bullet") >= 0.9 &&
      !res(1L).getAs[Boolean]("gopher_pass"), "bullet-line rule")
    assert(res(2L).getAs[Double]("frac_ellipsis") > 0.3 &&
      !res(2L).getAs[Boolean]("gopher_pass"), "ellipsis-line rule")
    assert(res(3L).getAs[Boolean]("gopher_pass"),
      s"benign two-line doc should pass: ${res(3L)}")
  }

  test("gopher: mean-word-length bounds catch fragment and run-on text") {
    val frag = ("a b c d " * 20).trim // mean length 1
    val runOn = (("supercalifragilistic " * 60).trim) // mean length > 10
    val res = run(Seq(1L -> frag, 2L -> runOn))
    assert(res(1L).getAs[Double]("mean_word_len") < 3.0 &&
      !res(1L).getAs[Boolean]("gopher_pass"))
    assert(res(2L).getAs[Double]("mean_word_len") > 10.0 &&
      !res(2L).getAs[Boolean]("gopher_pass"))
  }
}
