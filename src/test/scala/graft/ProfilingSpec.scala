package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

/** Semantics specs for the schema-profiling audits (FD / IND /
  * candidate-key discovery) — crafted tables where the exact counts are
  * hand-computable, plus ground-truth invariants on the real sf tables
  * (generator-guaranteed keys and foreign keys must grade as held).
  */
class ProfilingSpec extends AnyFunSuite {
  import TestSpark._

  test("fdStats: crafted violations are counted exactly") {
    val sp = spark
    import sp.implicits._
    // g=1 → {a};  g=2 → {a,b};  g=3 → {a,b,c};  g=4 → {null}
    val df = Seq(
      (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "c"),
      (4L, null.asInstanceOf[String])
    ).toDF("g", "v")
    val r = Profiling.fdStats(df, "t", "g", "v").collect().head
    assert(r.getAs[Long]("n_groups") === 4L)
    assert(r.getAs[Long]("violating_groups") === 2L)
    assert(r.getAs[Long]("max_rhs_card") === 3L)
    assert(r.getAs[Long]("holds") === 0L)
    // renaming to itself: x → x always holds
    val id = Profiling.fdStats(df, "t", "g", "g").collect().head
    assert(id.getAs[Long]("holds") === 1L)
    assert(id.getAs[Long]("max_rhs_card") === 1L)
  }

  test("indStats: crafted containment share is exact; nulls excluded") {
    val sp = spark
    import sp.implicits._
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), Some(9L), None)
      .toDF("k")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("p")
    val r = Profiling.indStats(child, "c", "k", parent, "p", "p")
      .collect().head
    assert(r.getAs[Long]("n_child") === 4L)      // 1,2,3,9 (null dropped)
    assert(r.getAs[Long]("n_contained") === 3L)  // 9 unresolved
    assert(math.abs(r.getAs[Double]("containment") - 0.75) < 1e-12)
    assert(r.getAs[Long]("holds") === 0L)
    val full = Profiling.indStats(parent.withColumnRenamed("p", "k"), "p",
      "k", parent, "p", "p").collect().head
    assert(full.getAs[Long]("holds") === 1L)
  }

  test("keyStats: crafted uniqueness ratio, combo keys, null rows count") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "x"), (2L, "x"), (2L, "y"), (3L, "z"),
      (3L, "z") // exact duplicate row
    ).toDF("a", "b")
    val single = Profiling.keyStats(df, "t", Seq("a")).collect().head
    assert(single.getAs[Long]("n_rows") === 5L)
    assert(single.getAs[Long]("n_distinct") === 3L)
    assert(single.getAs[Long]("is_key") === 0L)
    val combo = Profiling.keyStats(df, "t", Seq("a", "b")).collect().head
    assert(combo.getAs[Long]("n_distinct") === 4L) // dup row collapses
    assert(combo.getAs[Long]("is_key") === 0L)
    // null-bearing rows count once each under DISTINCT-subquery semantics
    val withNull = Seq(Some(1L), None, None).toDF("a")
    val nk = Profiling.keyStats(withNull, "t", Seq("a")).collect().head
    assert(nk.getAs[Long]("n_rows") === 3L)
    assert(nk.getAs[Long]("n_distinct") === 2L) // {1, null}
  }

  test("real-data ground truths: generator keys hold, declared FKs " +
    "contain, and every ratio is within bounds") {
    val fd = Profiling.fdAudit(spark, sf).collect()
    assert(fd.length === Profiling.FdCandidates.size)
    def fdRow(lhs: String) = fd.find(_.getAs[String]("lhs") == lhs).get
    // key-determined FDs must hold: a primary key determines anything
    assert(fdRow("o_orderkey").getAs[Long]("holds") === 1L)
    assert(fdRow("c_custkey").getAs[Long]("holds") === 1L)
    assert(fdRow("doc_id").getAs[Long]("holds") === 1L)
    assert(fdRow("event_id").getAs[Long]("holds") === 1L)
    assert(fdRow("n_nationkey").getAs[Long]("holds") === 1L)
    fd.foreach { r =>
      assert(r.getAs[Long]("violating_groups") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("max_rhs_card") >= 1L)
    }

    val ind = Profiling.indAudit(spark, sf).collect()
    assert(ind.length === Profiling.IndCandidates.size)
    def indRow(cc: String, pt: String) = ind.find(r =>
      r.getAs[String]("child_col") == cc &&
        r.getAs[String]("parent_tbl") == pt).get
    // generator-declared FKs are total
    assert(indRow("l_orderkey", "orders").getAs[Long]("holds") === 1L)
    assert(indRow("o_custkey", "customer").getAs[Long]("holds") === 1L)
    assert(indRow("l_partkey", "part").getAs[Long]("holds") === 1L)
    assert(indRow("n_regionkey", "region").getAs[Long]("holds") === 1L)
    ind.foreach { r =>
      assert(r.getAs[Long]("n_contained") <= r.getAs[Long]("n_child"))
      val c = r.getAs[Double]("containment")
      assert(c >= 0.0 && c <= 1.0)
    }

    val keys = Profiling.keyProfile(spark, sf).collect()
    assert(keys.length === Profiling.KeyCandidates.size)
    def keyRow(cols: String) = keys.find(_.getAs[String]("cols") == cols).get
    assert(keyRow("o_orderkey").getAs[Long]("is_key") === 1L)
    assert(keyRow("c_custkey").getAs[Long]("is_key") === 1L)
    assert(keyRow("event_id").getAs[Long]("is_key") === 1L)
    assert(keyRow("doc_id").getAs[Long]("is_key") === 1L)
    // the synthetic generator does NOT dedupe (orderkey, linenumber) —
    // the audit's whole point is catching exactly this pseudo-key
    assert(keyRow("l_orderkey,l_linenumber").getAs[Long]("is_key") === 0L)
    assert(keyRow("l_orderkey,l_linenumber").getAs[Double]("uniqueness") <
      1.0)
    assert(keyRow("l_orderkey").getAs[Long]("is_key") === 0L)
    // ...but the composite is still strictly more unique than either
    // projection alone
    assert(keyRow("l_orderkey,l_linenumber").getAs[Long]("n_distinct") >
      keyRow("l_orderkey").getAs[Long]("n_distinct"))
    keys.foreach { r =>
      val u = r.getAs[Double]("uniqueness")
      assert(u > 0.0 && u <= 1.0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_rows"))
    }
  }
}
