package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Semantic checks for D4-style prototypicality diversification —
  * rows-only at the driver (k-means is iterative float work), so these
  * specs carry the correctness story: crafted clusters prove the
  * near-centroid mass drops first, counting proves the exact ⌊ρ·n_c⌋
  * contract, and reruns prove determinism.
  */
class PrototypicalitySpec extends AnyFunSuite {
  import TestSpark._

  /** Two obvious clusters on orthogonal axes: a tight bundle around
    * +x (ids 1-8, tiny angular jitter) and one around +y (ids 11-18),
    * plus one far outlier per cluster (ids 9 and 19, 45°-ish off). */
  private def crafted = {
    val sp = spark
    import sp.implicits._
    def jitter(base: Array[Double], eps: Double, flip: Int) = {
      val v = base.clone(); v(2) = eps * (if (flip % 2 == 0) 1 else -1); v
    }
    val x = Array(1.0, 0.0, 0.0, 0.0)
    val y = Array(0.0, 1.0, 0.0, 0.0)
    val rows =
      (1L to 8L).map(i => i -> jitter(x, 0.01 * ((i % 4) + 1), i.toInt)) ++
        Seq(9L -> Array(1.0, 0.0, 0.9, 0.0)) ++
        (11L to 18L).map(i => i -> jitter(y, 0.01 * ((i % 4) + 1), i.toInt)) ++
        Seq(19L -> Array(0.0, 1.0, 0.0, 0.9))
    rows.toDF("vec_id", "v")
  }

  test("prototypicality: outliers survive, near-centroid mass drops first") {
    val res = Similarity.prototypicalityOn(spark, crafted, rho = 0.25,
      nCentroids = 2, kmeansIters = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(res.size === 18)
    // the two 45°-off outliers are the least prototypical of their
    // clusters and must be kept
    assert(res(9L)._3 && res(19L)._3, s"outliers dropped: $res")
    // each 9-member cluster drops exactly floor(0.25*9)=2, keeps 7
    val byCluster = res.values.groupBy(_._1)
    assert(byCluster.size === 2)
    byCluster.foreach { case (c, ms) =>
      assert(ms.count(!_._3) === 2, s"cluster $c drop count: $ms")
    }
    // dropped members are MORE prototypical than every kept member of
    // their cluster (modulo the rounded-score tie contract)
    byCluster.foreach { case (_, ms) =>
      val dropMin = ms.filter(!_._3).map(_._2).min
      val keepMax = ms.filter(_._3).map(_._2).max
      assert(dropMin >= keepMax - 1e-9, "a kept member outranks a dropped one")
    }
  }

  test("prototypicality: rho=0 keeps everything, rho=1 keeps nothing") {
    val all = Similarity.prototypicalityOn(spark, crafted, 0.0, 2, 2)
    assert(all.filter(!col("kept")).count() === 0L)
    val none = Similarity.prototypicalityOn(spark, crafted, 1.0, 2, 2)
    assert(none.filter(col("kept")).count() === 0L)
  }

  test("prototypicality: deterministic across runs on the real table") {
    val a = Similarity.prototypicality(spark, sf).collect()
    val b = Similarity.prototypicality(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }
}
