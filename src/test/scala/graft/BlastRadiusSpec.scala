package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Modern

/** Semantics of the recursive-CTE blast radius: crafted graphs prove
  * min-hop BFS behavior (cycles terminate, diamonds take the short
  * side, the hop bound truncates), and the real-table run is parity-
  * checked against an independent driver-side BFS.
  */
class BlastRadiusSpec extends AnyFunSuite {
  import TestSpark._

  /** Pair frame: seed component 1→2 (verbatim, containment 1.0) with a
    * cycle 2-3-4-2 and a tail 4-5; a diamond from seed 10 reaching 13
    * two ways (10-11-13 and 10-12-13); and an unseeded component
    * 20-21 that must not appear. */
  private def crafted = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, 2L, 1.0),
      (2L, 3L, 0.7), (3L, 4L, 0.7), (4L, 2L, 0.7), (4L, 5L, 0.7),
      (10L, 11L, 1.0), (10L, 12L, 1.0), (11L, 13L, 0.8), (12L, 13L, 0.8),
      (20L, 21L, 0.9)
    ).toDF("doc_a", "doc_b", "containment")
  }

  test("blast radius: cycles terminate, diamonds take min hop, bound truncates") {
    val res = Modern.blastRadiusOn(spark, crafted, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seeds are the doc_a of verbatim pairs: 1, 10
    assert(res(1L) === 0L && res(10L) === 0L)
    // BFS through the cycle: 2 at hop 1, 3 and 4 at hop 2; 5 is 3 hops
    // out and truncated by the bound
    assert(res(2L) === 1L && res(3L) === 2L && res(4L) === 2L)
    assert(!res.contains(5L))
    // diamond: 13 reachable both ways at hop 2 exactly once
    assert(res(11L) === 1L && res(12L) === 1L && res(13L) === 2L)
    // unseeded component never appears
    assert(!res.contains(20L) && !res.contains(21L))
  }

  test("blast radius: maxHops=0 returns exactly the seed set") {
    val res = Modern.blastRadiusOn(spark, crafted, maxHops = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res === Set((1L, 0L), (10L, 0L)))
  }

  test("blast radius: dense-clique graph at deep hop bounds runs the " +
    "iterative path and matches a driver BFS (no simple-path blowup)") {
    val sp = spark
    import sp.implicits._
    // two 30-cliques bridged by a chain: seed in clique A, the rCTE at
    // H=4 would enumerate ~30^4 simple paths inside A alone; the
    // iterative path is bounded by |edges| (~2*870) per round
    val k = 30
    def clique(ids: Seq[Long]) = for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield (ids(i), ids(j), 0.9)
    val aIds = (1L to k.toLong)
    val bIds = (101L to (100L + k))
    val edges = clique(aIds) ++ clique(bIds) ++
      Seq((1L, 1L + 1000, 1.0),            // seed pair: doc 1 is verbatim-contained
        (k.toLong, 50L, 0.9), (50L, 101L, 0.9)) // A -- 50 -- B bridge
    val pairs = edges.toDF("doc_a", "doc_b", "containment")
    for (h <- Seq(3, 4)) {
      val res = Modern.blastRadiusOn(spark, pairs, maxHops = h).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver BFS reference
      val adj = edges.flatMap { case (a, b, _) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (n, v) => n -> v.map(_._2).toSet }
      var dist = Map(1L -> 0L)
      var frontier = Set(1L)
      var hop = 0L
      while (frontier.nonEmpty && hop < h) {
        hop += 1
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(dist.keySet)
        dist ++= next.map(_ -> hop)
        frontier = next
      }
      assert(res === dist, s"iterative BFS diverged at maxHops=$h")
      // sanity on the shape: clique A all at hop 1, bridge at 2,
      // clique B enters at 3 and fills at 4
      if (h == 4) {
        assert(aIds.tail.forall(res(_) == 1L) && res(50L) == 2L &&
          res(101L) == 3L && bIds.tail.forall(res(_) == 4L))
      }
    }
  }

  test("blast radius: recursive and iterative strategies agree across " +
    "the dispatch boundary") {
    // maxHops=2 runs the rCTE, maxHops=3 runs the iterative BFS; on
    // the crafted graph the only doc at distance 3 is node 5, so the
    // deeper (iterative) result must equal the rCTE result plus
    // exactly that node — min-hop semantics identical where the
    // bounds overlap
    val at2 = Modern.blastRadiusOn(spark, crafted, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at3 = Modern.blastRadiusOn(spark, crafted, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at3 - 5L === at2, "strategies must agree on shared reach")
    assert(at3(5L) === 3L)
    // iterative at the shared bound as well: a one-round-longer run on
    // a diameter-capped graph adds nothing (fixpoint reached)
    val at9 = Modern.blastRadiusOn(spark, crafted, maxHops = 9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at9 === at3, "past the graph diameter the reach is a fixpoint")
  }

  test("blast radius: real-table run equals an independent driver BFS") {
    val pairs = graft.operators.Dedup.containmentJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val edges = pairs.flatMap { case (a, b, _) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = pairs.collect { case (a, _, c) if c == 1.0 => a }.toSet
    // textbook BFS with a visited set — the semantics the recursion
    // must reproduce despite UNION ALL + path-guard mechanics
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    var hop = 0L
    while (frontier.nonEmpty && hop < 2) {
      hop += 1
      val next = frontier.flatMap(n => edges.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> hop)
      frontier = next
    }
    val res = Modern.blastRadius(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res === dist, "recursive CTE diverged from reference BFS")
    assert(res.nonEmpty)
  }
}
