package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE's skew-join splitting can't
  * reach (e.g. the build side can't broadcast and one key dominates a
  * partition): salt the skewed side into `salt` sub-keys and replicate
  * the other side across all of them. The join stays an equi-join on
  * (key, salt); each hot key's rows spread over `salt` reducers.
  */
object Skew {

  /** Equi-join `skewed ⋈ other` on `key`, salted `salt` ways.
    * Row-to-salt assignment only needs to be uniform-ish, so it hashes
    * the whole skewed row — deterministic, no rand() in the plan. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    val saltedL = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(salt)))
    val saltedR = other.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedL.join(saltedR, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top-N heavy-hitter keys with counts — the diagnostic used to decide
    * whether salting/broadcast is needed. One partial-agg shuffle. */
  def heavyHitters(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)

  /** Two-stage salted aggregation: when one group dominates (a single
    * reducer melts), aggregate (key, salt) first — spreading the hot
    * key's rows over `salt` reducers — then merge the partials per key.
    * Decomposable aggregates only (sum/count/min/max); the result is
    * EXACTLY the plain groupBy (oracle-checked via q_skew_salted_agg).
    * Salt from a row hash, not rand(): deterministic plan, no
    * re-execution hazard under task retries. */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      salt: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salt)))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("value_sum"), sum(col("_pcnt")).as("n_rows"))
  }

  /** Bloom-pruned semi-join — the manual form of the runtime row-level
    * filter, for when the build side is too big to BROADCAST as rows
    * but its BLOOM isn't (a billion keys broadcast as a few MB of
    * bits), or the planner can't see the opportunity (the probe filter
    * belongs several stages upstream of the join). The bloom rides as
    * a scalar subquery (might_contain requires a constant or scalar
    * subquery bloom — never a per-row column); probe rows drop
    * ROW-LOCALLY before the shuffle, so shuffle volume scales with the
    * MATCH rate plus the false-positive rate — and the final left-semi
    * join keeps the result EXACT (false positives die there; false
    * negatives cannot exist). */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      estItems: Long = 4000000L, numBits: Long = 33554432L): DataFrame = {
    import graft.functions.Aggregates
    val bloom = dim
      .agg(Aggregates.bloomFilterAgg(xxhash64(col(dimKey)), estItems, numBits)
        .as("_bf"))
    fact
      .filter(Aggregates.mightContain(bloom.scalar(), xxhash64(col(factKey))))
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }
}
