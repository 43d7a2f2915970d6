package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables

/** Distributed SUFFIX RANKING by prefix doubling, and the exact
  * variable-length duplicate-span extraction it enables (the
  * suffix-array half of Lee et al. 2022 "Deduplicating Training Data
  * Makes Language Models Better" — the exact-substring method the
  * fixed-gram signals `Dedup.dupSpans`/`Dedup.segmentDedup`
  * approximate).
  *
  * The corpus is the set of per-document token suffixes (each suffix
  * ends at its OWN document's end — the per-doc terminator is "end of
  * tokens", ranked below every real token, so suffixes never run
  * across documents). Prefix doubling (Manber & Myers 1990, the
  * sort-based formulation used by every distributed suffix-array
  * builder): after step k each suffix carries a DENSE rank that
  * orders suffixes by their first 2^k tokens; step k+1 re-ranks by
  * the pair (rank(p), rank(p + 2^k)) — log(maxLen) keyed sorts over
  * integer pairs, never token strings. At 100 TB that is the whole
  * point: every round shuffles fixed-width longs, and the sorts are
  * Spark's range-partitioned exchange — no single-partition window
  * anywhere.
  */
object Suffix {

  /** Normalized whitespace tokens — the exact tokenization the DuckDB
    * oracles mirror (same expression as Dedup's). */
  private def normToks: Column =
    split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")

  /** Dense 1-based lexicographic ids for the distinct values of
    * `keys`' columns: distinct → range-partitioned sort → RDD
    * zipWithIndex (order-preserving, two light jobs — the standard
    * distributed dense_rank; a Window.orderBy would pull the whole
    * key space into ONE partition). Linear in |distinct keys|.
    *
    * The sorted RDD is PERSISTED across zipWithIndex's size job and
    * the caller's join — without it every downstream action re-runs
    * the distinct + range sort (zipWithIndex's partition-size pass
    * does not retain its input), doubling each doubling round's sort
    * mass. The caller unpersists the returned handle once its join
    * has materialized. */
  private def denseIds(keys: DataFrame, outCol: String)
      : (DataFrame, org.apache.spark.rdd.RDD[Row]) = {
    val cols = keys.columns.map(col).toIndexedSeq
    val sorted = keys.distinct().orderBy(cols: _*)
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    (sorted.sparkSession.createDataFrame(
      rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema), rdd)
  }

  /** (doc_id, pos, tok) position table of the documents' normalized
    * tokens — pos is 0-based. */
  private def positions(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), normToks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))

  /** Prefix-doubling suffix ranks over `pos` tables (doc_id, pos, tok):
    * returns (doc_id, pos, rank) where rank is a DENSE 1-based rank of
    * the suffix starting at (doc_id, pos) by its first
    * min(2^`steps`, remaining) tokens — with `2^steps ≥` the longest
    * document, the full lexicographic suffix order (end-of-doc sorts
    * below every token; identical cross-doc suffixes TIE, which is
    * exactly the equality-class semantics the span extraction needs).
    *
    * Each doubling step: one self-equi-join on (doc_id, pos + 2^k)
    * (the "next rank"), one dense re-rank of the (rank, next) pairs —
    * a distinct + range sort over integer pairs — and one join back.
    * All shuffles carry (long, long) keys; nothing is quadratic. */
  def suffixRanks(pos: DataFrame, steps: Int): DataFrame = {
    val toks = pos.select(col("doc_id"), col("pos"), col("tok"))
    val (dict, dictHandle) = denseIds(toks.select(col("tok")), "rank")
    var cur = toks.join(dict, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("rank"))
      // cut the lineage each round: log n rounds of joins otherwise
      // compound into one enormous plan (and re-execute the whole
      // prefix on every action)
      .localCheckpoint()
    dictHandle.unpersist(blocking = false)
    var k = 0
    while (k < steps) {
      val stepLen = 1L << k
      val shifted = cur.select(col("doc_id"),
        (col("pos") - stepLen).as("pos"), col("rank").as("rnext"))
      val paired = cur.join(shifted, Seq("doc_id", "pos"), "left")
        // 0 = past end-of-doc: ranks are 1-based, so the terminator
        // sorts below every real rank (shorter suffix first — the
        // standard suffix-array sentinel)
        .withColumn("rnext", coalesce(col("rnext"), lit(0L)))
      val (pairDict, handle) = denseIds(
        paired.select(col("rank"), col("rnext")), "nrank")
      cur = paired.join(pairDict, Seq("rank", "rnext"))
        .select(col("doc_id"), col("pos"), col("nrank").as("rank"))
        .localCheckpoint()
      handle.unpersist(blocking = false)
      k += 1
    }
    cur
  }

  /** The composite equality key for windows of EXACT length `winLen`
    * from ranks at level K (requires 2^(K+1) ≥ winLen ≥ 2^K + 1, or
    * winLen = 2^K exactly... any K with 2^K ≥ winLen − 2^K works):
    * two positions (with ≥ winLen tokens remaining) share the key iff
    * their winLen-token windows are identical — the classic
    * sparse-table overlap trick, (rank_K(p), rank_K(p + winLen −
    * 2^K)); the halves may overlap, equality of both ⟺ equality of
    * the window. Using K = ⌈log2 winLen⌉ − 1 (one level BELOW the
    * full window) saves an entire doubling round versus ranking to
    * the window length. Positions with fewer than winLen tokens
    * remaining can never share a key with a full window: a truncated
    * suffix's rank chain contains the end-of-doc sentinel where the
    * full window's has a real rank, so their dense ranks differ at
    * every level (proved in SuffixSpec by driver recount). */
  private def windowKeys(ranks: DataFrame, winLen: Int,
      level: Int): DataFrame = {
    val half = 1L << level
    require(half >= winLen - half && half <= winLen,
      s"level $level cannot key windows of $winLen")
    if (half == winLen.toLong)
      ranks.select(col("doc_id"), col("pos"), col("rank").as("k1"),
        lit(0L).as("k2"))
    else {
      val second = ranks.select(col("doc_id"),
        (col("pos") - (winLen - half)).as("pos"), col("rank").as("k2"))
      ranks.join(second, Seq("doc_id", "pos"))
        .select(col("doc_id"), col("pos"), col("rank").as("k1"), col("k2"))
    }
  }

  /** EXACT maximal duplicated spans ≥ `minLen` tokens (q_suffix_spans):
    * every maximal token interval of a document all of whose
    * minLen-token windows occur at some OTHER corpus position (another
    * doc or another offset of the same doc — Lee et al.'s
    * exact-substring coverage set: a substring of length m ≥ minLen
    * occurring twice marks all its minLen-windows, and conversely
    * every marked position is covered by a duplicated window, so the
    * merged runs ARE the exact variable-length spans, boundaries and
    * all). Fixed-gram signals at stride k miss nothing at the
    * position level but cannot report exact span extents; this emits
    * (doc_id, start_pos, span_len) with span_len = run + minLen − 1
    * exact.
    *
    * Scale shape: ⌈log2 minLen⌉ prefix-doubling rounds over integer
    * pairs (vs shuffling minLen-token gram STRINGS — at minLen = 50
    * the gram bytes dwarf the corpus; ranks stay 16 bytes), one
    * count-over-key mark, one per-doc gap-and-island window. Every
    * shuffle is linear in token volume. */
  def suffixSpans(spark: SparkSession, dir: String,
      minLen: Int = 8): DataFrame = {
    require(minLen >= 2, s"minLen must be ≥ 2, got $minLen")
    val pos = positions(spark, dir).localCheckpoint()
    // rank only to level K = ⌈log2 minLen⌉ − 1: the composite key
    // (rank_K(p), rank_K(p + minLen − 2^K)) already decides equality
    // of full minLen windows (2^K ≥ minLen − 2^K), saving one whole
    // doubling round (distinct + sort + join) versus ranking to the
    // window length — at 100 TB each round is a corpus-linear sort
    val level = 31 - Integer.numberOfLeadingZeros(minLen - 1) // ceil−1
    val ranks = suffixRanks(pos, level)
    // only positions that can host a FULL minLen window participate:
    // a tail position's truncated suffix can tie with another doc's
    // identical tail (k1 AND k2 both truncated), which would mark a
    // span that isn't one
    val lens = pos.groupBy(col("doc_id"))
      .agg((max(col("pos")) + 1).as("doc_len"))
    val keyed = windowKeys(ranks, minLen, level)
      .join(lens, Seq("doc_id"))
      .filter(col("pos") <= col("doc_len") - minLen)
    // a window "occurs elsewhere" ⟺ its equality class has ≥ 2 members
    val wKey = Window.partitionBy(col("k1"), col("k2"))
    val marked = keyed
      .withColumn("n_occ", count(lit(1)).over(wKey))
      .filter(col("n_occ") >= 2)
      .select(col("doc_id"), col("pos"))
    // gap-and-island per doc: consecutive marked positions merge into
    // one maximal span of run + minLen − 1 tokens
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("grp", col("pos") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("start_pos"),
        (max(col("pos")) - min(col("pos")) + minLen).cast("long")
          .as("span_len"))
      .select(col("doc_id"), col("start_pos"), col("span_len"))
      .orderBy(col("doc_id"), col("start_pos"))
  }

  /** SPAN-CLIP — the transformation [[suffixSpans]]'s span set exists
    * for (Lee et al. 2022's actual dedup step): remove every token
    * position covered by a cross-corpus duplicated span ≥ `minLen`
    * and reassemble the surviving tokens in order. Emits per doc the
    * token counts (total, removed) and the cleaned text; docs with no
    * duplicated span pass through intact (including docs shorter than
    * minLen). Scale shape: [[suffixSpans]]'s rounds + one explode of
    * span intervals to covered positions (linear in REMOVED token
    * volume, a subset of the corpus), one anti-join on (doc, pos),
    * one per-doc ordered reassembly — the segmentDedup rollup shape. */
  def spanClip(spark: SparkSession, dir: String,
      minLen: Int = 8): DataFrame = {
    val pos = positions(spark, dir)
    val covered = suffixSpans(spark, dir, minLen)
      .select(col("doc_id"), explode(expr(
        "sequence(start_pos, start_pos + span_len - 1)")).as("pos"))
    pos.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"))
      // docs fully covered by duplicated spans drop out of the
      // anti-join — restore them with empty text (the doc row must
      // survive its own clipping), and carry the total for the share
      .join(pos.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens")),
        Seq("doc_id"), "right")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Library face of [[suffixRanks]] over a corpus directory, doubled
    * to the full suffix order (2^steps ≥ longest document). */
  def fullSuffixOrder(spark: SparkSession, dir: String): DataFrame = {
    val pos = positions(spark, dir).localCheckpoint()
    val maxLen = pos.groupBy(col("doc_id")).count()
      .agg(max(col("count"))).collect().head.getLong(0)
    val steps = if (maxLen <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(maxLen - 1)
    suffixRanks(pos, steps.toInt)
  }
}
