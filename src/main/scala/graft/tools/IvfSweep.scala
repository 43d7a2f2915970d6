package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity

/** Parameter sweep for the IVF ANN operator: prints recall@3 against the
  * exact brute-force baseline plus wall time per (nCentroids, nProbe,
  * kmeansIters) combo, so the shipped defaults are a measured choice
  * rather than a guess. Usage: `runMain graft.tools.IvfSweep <sfDir>`.
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate()
    val exact = Similarity.annBruteforce(spark, dir, k = 3)
      .select(col("id_a"), col("id_b")).cache()
    val total = exact.count()
    println(s"IVFSWEEP dir=$dir exact_pairs=$total")
    for (nc <- Seq(16, 32, 64); np <- Seq(4, 6, 8, 12); it <- Seq(1, 3)) {
      if (np <= nc) {
        val t0 = System.nanoTime()
        val ivf = Similarity.annIvf(spark, dir, k = 3,
          nCentroids = nc, nProbe = np, kmeansIters = it)
          .select(col("id_a"), col("id_b"))
        val hit = ivf.join(exact, Seq("id_a", "id_b"), "left_semi").count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"IVFSWEEP nc=$nc%3d np=$np%3d it=$it " +
          f"recall=${hit.toDouble / total}%.3f time=$sec%.2f")
      }
    }
    spark.stop()
  }
}
