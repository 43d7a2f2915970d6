package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/similarity operators
  * (SURVEY §2e). These run inside Tungsten rows — no Scala-UDF
  * serialization boundary — and the scalar ones participate in
  * whole-stage codegen. The computational kernels live as static
  * methods on [[ExprRuntime]], shared verbatim by interpreted
  * `nullSafeEval` and generated (Janino) code — no per-row Expression
  * allocation on either path.
  */
object HashExpressions {

  /** FNV-1a 64-bit over UTF-8 bytes: deterministic, allocation-free,
    * engine-independent (public-domain constants). */
  @inline def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))
  def hammingDistance(a: Column, b: Column): Column = toCol(HammingDistance(toExpr(a), toExpr(b)))
  def rollingShingles(c: Column, k: Int): Column = toCol(RollingShingles(toExpr(c), Literal(k)))
  def cosineSimilarity(a: Column, b: Column): Column = toCol(CosineSimilarity(toExpr(a), toExpr(b)))
  def jaroWinkler(a: Column, b: Column): Column = toCol(JaroWinkler(toExpr(a), toExpr(b)))
  def dotProduct(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))
  def minhashSignature(c: Column, k: Int): Column = toCol(MinHashSignature(toExpr(c), Literal(k)))
  def zorder2(a: Column, b: Column): Column = toCol(ZOrder2(toExpr(a), toExpr(b)))
  def charEntropy(c: Column): Column = toCol(CharEntropy(toExpr(c)))
  def compressRatio(c: Column): Column = toCol(CompressRatio(toExpr(c)))
  def phrasePack(c: Column, phrase: Seq[String]): Column =
    toCol(PhrasePack(toExpr(c), phrase))
  def sqEuclidean(a: Column, b: Column): Column =
    toCol(SqEuclidean(toExpr(a), toExpr(b)))
  def l2Normalize(c: Column): Column = toCol(L2Normalize(toExpr(c)))
  def sqNorm(c: Column): Column = toCol(SqNorm(toExpr(c)))
  def pairMergeFold(c: Column, a: String, b: String): Column =
    toCol(PairMergeFold(toExpr(c), a, b))
  def tokenGrams(c: Column, window: Int, stride: Int = 1,
      cover: Boolean = false): Column =
    toCol(TokenGrams(toExpr(c), window, stride, cover))
  def gramDigests(c: Column, k: Int, hexLen: Int = 32): Column =
    toCol(GramDigests(toExpr(c), k, hexLen))
  def winnowMins(c: Column, w: Int): Column = toCol(WinnowMins(toExpr(c), w))
  def pairCombos(c: Column): Column = toCol(PairCombos(toExpr(c)))
}

/** 64-bit SimHash over whitespace tokens: per token a 64-bit FNV hash
  * votes ±1 on each bit; the sign of each bit's tally forms the
  * fingerprint. Near-duplicate texts land within a small Hamming ball.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprRuntime.simhash64(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExprRuntime.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

/** Hamming distance between two 64-bit fingerprints: bitCount(a ^ b).
  * Full whole-stage-codegen scalar. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
  override def prettyName: String = "hamming_distance"
}

/** Character k-gram rolling-hash shingle set (sorted, distinct): the
  * polynomial hash rolls one byte at a time, so cost is O(len) not
  * O(len·k). Feeds MinHash/Jaccard without materializing substrings.
  */
case class RollingShingles(child: Expression, kExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = kExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any, kAny: Any): Any =
    ExprRuntime.rollingShingles(input.asInstanceOf[UTF8String],
      kAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, k) => s"graft.functions.ExprRuntime.rollingShingles($c, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RollingShingles =
    copy(child = l, kExpr = r)
  override def prettyName: String = "rolling_shingles"
}

/** Fused cosine similarity over two double arrays: one sequential pass
  * accumulating dot, |a|², |b|² — index order is fixed, which keeps the
  * result bit-stable across engines for oracle comparison. */
/** Jaro-Winkler string similarity — the standard record-linkage name
  * scorer (Winkler 1990): Jaro match/transposition similarity boosted
  * by up to 4 chars of common prefix when the base similarity clears
  * 0.7. Canonical semantics verified value-for-value against DuckDB's
  * `jaro_winkler_similarity` (same 0.7 boost threshold, 0.0 for any
  * empty side), which is what lets JW-scored pairs stay on the DuckDB
  * oracle surface. O(|s|·window) with two small boolean scratch
  * arrays; codegen'd via the static kernel like the other
  * expressions. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(ExprRuntime.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprRuntime.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(ExprRuntime.cosineSimilarity(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprRuntime.cosineSimilarity($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity"
}

/** Plain dot product over double arrays (used for LSH hyperplane
  * projections). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(ExprRuntime.dotProduct(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprRuntime.dotProduct($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}


/** MinHash signature in ONE pass over a shingle-hash array: k seeded
  * mix-permutations, all minima tracked simultaneously. Replaces k
  * separate array traversals (the higher-order-function formulation) —
  * O(k·n) arithmetic with zero intermediate allocation.
  */
case class MinHashSignature(child: Expression, kExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = kExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any, kAny: Any): Any =
    ExprRuntime.minhashSignature(input.asInstanceOf[ArrayData],
      kAny.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, k) => s"graft.functions.ExprRuntime.minhashSignature($c, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSignature =
    copy(child = l, kExpr = r)
  override def prettyName: String = "minhash_signature"
}

/** 2-D Z-order (Morton) code: interleaves the low 32 bits of two keys.
  * Sorting/range-partitioning by it clusters rows into 2-D tiles, so
  * parquet files carry tight min/max on BOTH columns and predicates on
  * either prune at file/row-group level — the lakehouse write-layout
  * technique for multi-dimensional scans.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder2.morton($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
  override def prettyName: String = "zorder2"
}

object ZOrder2 {
  /** Spread the low 32 bits of v to even bit positions (standard Morton
    * bit-twiddling, public domain). */
  @inline def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Shannon entropy (bits) over a string's Unicode code-point
  * distribution, in one pass: the low-entropy tail is keyboard-mash /
  * binary-soup garbage, the high end is random-looking noise — the
  * classic cheap "is this prose" gate a corpus pipeline runs alongside
  * length/stopword filters. Computed natively so the per-row cost is a
  * sort over the doc's code points (no explode → groupBy, whose shuffle
  * volume would be one row per CHARACTER of the corpus).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(ExprRuntime.charEntropy(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.charEntropy($c)")
  override protected def withNewChildInternal(c: Expression): CharEntropy = copy(c)
  override def prettyName: String = "char_entropy"
}

/** DEFLATE compression ratio of the UTF-8 bytes — the classic
  * repetitiveness/quality signal (template spam and boilerplate
  * compress far below natural prose; CCNet and RefinedWeb both filter
  * on it). compressed_len / raw_len as a double; empty input → 1.0.
  * Deterministic for a given JDK (single-shot DEFLATE of the same
  * bytes at a fixed level) — cross-engine parity is NOT claimed, the
  * query rides rows-only with a spec. Codegen'd via the static
  * kernel like the other expressions; the Deflater is thread-local
  * and reset per row, so the hot loop allocates only the output
  * scratch when a row exceeds the cached buffer. */
case class CompressRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(ExprRuntime.compressRatio(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.compressRatio($c)")
  override protected def withNewChildInternal(c: Expression): CompressRatio = copy(c)
  override def prettyName: String = "compress_ratio"
}

/** PACKED PHRASE SCAN — the native kernel behind
  * [[graft.operators.Search.phraseSearchNative]]: one pass over the
  * whitespace-tokenized, lowercased text counting every (overlapping)
  * anchor where the token run equals `phrase`, packed as
  * (count << 32) | first 1-based position (0 when absent). One long
  * per row where the declarative twin materializes a position
  * sequence, a lambda filter, and an array per document — same
  * answer (parity-spec-proved against the oracle-checked scan),
  * leaner inner loop. The phrase rides into generated code as a
  * reference object, so the hot path never re-parses it. */
case class PhrasePack(child: Expression, phrase: Seq[String])
    extends UnaryExpression {
  require(phrase.nonEmpty, "empty phrase")
  private val phraseArr: Array[String] = phrase.toArray
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      ExprRuntime.phrasePack(input.asInstanceOf[UTF8String], phraseArr))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phrase", phraseArr, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprRuntime.phrasePack($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PhrasePack =
    copy(child = c)
  override def prettyName: String = "phrase_pack"
}

/** Squared Euclidean distance over two double arrays, accumulated
  * left-to-right — BIT-IDENTICAL to the declarative
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D,
  * (acc, x) -> acc + x)` it replaces (same IEEE op order), but a
  * whole-stage-codegen scalar instead of two interpreted
  * higher-order-function trees per row (guide §4: built-ins/codegen
  * over interpreted expressions in the hot path). */
case class SqEuclidean(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(ExprRuntime.sqEuclidean(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprRuntime.sqEuclidean($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqEuclidean =
    copy(left = l, right = r)
  override def prettyName: String = "sq_euclidean"
}

/** Unit (L2) normalization of a double array in ONE pass + divide —
  * BIT-IDENTICAL to the declarative
  * `transform(v, x -> x / sqrt(aggregate(v, 0D, (acc, y) -> acc + y*y)))`
  * (same accumulation order, same IEEE divide; a zero vector divides
  * by 0.0 exactly as SQL does → NaN elements). The HOF form is
  * O(d²) interpreted per row — the inner `aggregate` is loop-invariant
  * but re-evaluated for every `transform` element — so this kernel is
  * the normalization hot-path fix across the ANN family. */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprRuntime.l2Normalize(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.l2Normalize($c)")
  override protected def withNewChildInternal(c: Expression): L2Normalize = copy(c)
  override def prettyName: String = "l2_normalize"
}

/** Squared L2 norm (sum of squares, left-to-right) — the scalar half
  * of [[L2Normalize]]; bit-identical to
  * `aggregate(v, 0D, (acc, y) -> acc + y * y)`. */
case class SqNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(ExprRuntime.sqNorm(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.sqNorm($c)")
  override protected def withNewChildInternal(c: Expression): SqNorm = copy(c)
  override def prettyName: String = "sq_norm"
}

/** Left-to-right non-overlapping merge of adjacent (a, b) token pairs —
  * the BPE rewrite step. Semantics identical to the declarative
  * `aggregate(toks, (out, pend), …)` fold it replaces (same
  * pending-token state machine, merged token "a b", trailing pend
  * flushed), but a single O(n) pass: the SQL fold's `array_append`
  * copies the growing output array per element, making each rewrite
  * O(n²) per row. Codegen'd like [[PhrasePack]], with the pair riding
  * in as reference objects. */
case class PairMergeFold(child: Expression, a: String, b: String)
    extends UnaryExpression {
  private val aU = UTF8String.fromString(a)
  private val bU = UTF8String.fromString(b)
  private val mergedU = UTF8String.fromString(a + " " + b)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprRuntime.pairMergeFold(input.asInstanceOf[ArrayData], aU, bU, mergedU)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("pairA", aU,
      "org.apache.spark.unsafe.types.UTF8String")
    val bRef = ctx.addReferenceObj("pairB", bU,
      "org.apache.spark.unsafe.types.UTF8String")
    val mRef = ctx.addReferenceObj("pairMerged", mergedU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExprRuntime.pairMergeFold($c, $aRef, $bRef, $mRef)")
  }
  override protected def withNewChildInternal(c: Expression): PairMergeFold =
    copy(child = c)
  override def prettyName: String = "pair_merge_fold"
}

/** Sliding/strided token n-grams as space-joined strings in ONE native
  * pass — the gram-generation core of the dedup/shingle family,
  * replacing the interpreted
  * `transform(sequence(...), i -> array_join(slice(toks, ..., w), ' '))`
  * trees (per-window lambda eval + per-window array slice copies).
  *
  * Two counting modes, matching the two declarative shapes in use:
  *  - `cover = false` (shingles/sliding grams): FULL windows only,
  *    count = (L − window)/stride + 1; EMPTY result when L < window —
  *    identical to the `sequence(0, L − window)` form under the
  *    callers' `size ≥ window` guards, and to the when-guarded form
  *    (empty array) without them.
  *  - `cover = true` (segments/chunks): count =
  *    ceil(max(L − window, 0)/stride) + 1 for L > 0, trailing windows
  *    truncated — identical to the `ceil(size/k)` segment form (when
  *    window == stride) and the chunk form (window ≥ stride).
  * Join semantics are `concat_ws(' ', …)` exactly (split tokens are
  * never null, so array_join and concat_ws coincide). */
case class TokenGrams(child: Expression, window: Int, stride: Int,
    cover: Boolean) extends UnaryExpression {
  require(window > 0 && stride > 0, s"need window/stride > 0, got $window/$stride")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprRuntime.tokenGrams(input.asInstanceOf[ArrayData], window, stride, cover)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExprRuntime.tokenGrams($c, $window, $stride, $cover)")
  override protected def withNewChildInternal(c: Expression): TokenGrams =
    copy(child = c)
  override def prettyName: String = "token_grams"
}

/** MD5 window digests of token k-grams, one native pass — the digest
  * twin of [[TokenGrams]] (full windows, stride 1): element i is the
  * first `hexLen` lowercase hex chars of md5 of the space-joined
  * window starting at i, exactly
  * `transform(sequence(0, size − k), i -> md5(array_join(slice(toks,
  * i + 1, k), ' '))[.substr(1, hexLen)])`. Returns an EMPTY array when
  * the doc has fewer than k tokens (callers that need NULL there —
  * winnow — keep their `when(size ≥ k, …)` guard; a codegen'd scalar
  * must not return null from a non-null input). */
case class GramDigests(child: Expression, k: Int, hexLen: Int)
    extends UnaryExpression {
  require(k > 0 && hexLen > 0 && hexLen <= 32, s"bad k=$k hexLen=$hexLen")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprRuntime.gramDigests(input.asInstanceOf[ArrayData], k, hexLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExprRuntime.gramDigests($c, $k, $hexLen)")
  override protected def withNewChildInternal(c: Expression): GramDigests =
    copy(child = c)
  override def prettyName: String = "gram_digests"
}

/** Winnowing fingerprint selection (Schleimer et al. 2003): the
  * DISTINCT minima of every w-wide sliding window over a hash array,
  * in first-occurrence order — exactly
  * `array_distinct(transform(sequence(0, greatest(size(hs) − w, 0)),
  * i -> array_min(slice(hs, i + 1, w))))` (binary string ordering,
  * short trailing windows min over what remains), as one native pass
  * instead of an interpreted per-window lambda + slice. */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"need w > 0, got $w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprRuntime.winnowMins(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.winnowMins($c, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowMins =
    copy(child = c)
  override def prettyName: String = "winnow_mins"
}

/** All ordered index pairs (i < j) of a long array as (u, v) structs —
  * the basket pair-generation core of the co-purchase graph family,
  * replacing the interpreted nested
  * `flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, …),
  * y -> struct(x, y))))` (per-element lambda frames + a slice copy per
  * outer element). Emits the same pairs in the same order. */
case class PairCombos(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("u", LongType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprRuntime.pairCombos(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.pairCombos($c)")
  override protected def withNewChildInternal(c: Expression): PairCombos =
    copy(child = c)
  override def prettyName: String = "pair_combos"
}

/** Static computational kernels, the single source of truth for both
  * evaluation paths: the case classes' `nullSafeEval` delegates here and
  * generated (Janino) code calls the same static forwarders — hot loops
  * allocate nothing per row on either path. A separate object (not
  * companions): companion-object forwarders would collide with the case
  * classes' inherited `eval(InternalRow)` and never get a static
  * forwarder, breaking whole-stage codegen compilation.
  */
object ExprRuntime {

  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
        true)
  }
  private val deflateBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** DEFLATE ratio kernel; see [[CompressRatio]]. */
  def compressRatio(raw: UTF8String): Double = {
    val bytes = raw.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var buf = deflateBuf.get()
    if (buf.length < bytes.length + 64) {
      buf = new Array[Byte](bytes.length + 64)
      deflateBuf.set(buf)
    }
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Canonical Jaro-Winkler; see [[JaroWinkler]]. Operates on the
    * decoded strings (char-level, like DuckDB) rather than UTF-8
    * bytes — a multi-byte code point must count as one position. */
  def jaroWinkler(aRaw: UTF8String, bRaw: UTF8String): Double = {
    val a = aRaw.toString
    val b = bRaw.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of relative order, halved
    var halfT = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) halfT += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transpositions FLOOR the half-count (rapidfuzz/DuckDB semantics,
    // also Winkler's original tables) — the continuous halfT/2.0 was
    // measured to diverge from DuckDB on odd half-counts
    val jaro = (md / la + md / lb + (md - (halfT / 2)) / md) / 3.0
    if (jaro > 0.7) {
      val maxL = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val tally = new Array[Int](64)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      val isSpace = i == n || bytes(i) == ' ' || bytes(i) == '\n' ||
        bytes(i) == '\t' || bytes(i) == '\r'
      if (isSpace) {
        if (i > start) {
          val h = HashExpressions.fnv1a64(bytes, start, i)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (tally(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def rollingShingles(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val B = 1000000007L
    var pow = 1L // B^(k-1)
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    val out = new java.util.TreeSet[java.lang.Long]()
    var h = 0L
    i = 0
    while (i < n) {
      h = h * B + (bytes(i) & 0xffL)
      if (i >= k) h -= pow * B * (bytes(i - k) & 0xffL)
      if (i >= k - 1) out.add(h)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  def cosineSimilarity(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = a.getDouble(i); val yi = b.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  def dotProduct(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  /** Squared Euclidean distance; see [[SqEuclidean]]. Left-to-right
    * accumulation — the same op order as the aggregate/zip_with form. */
  def sqEuclidean(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Sum of squares, left-to-right; see [[SqNorm]]. */
  def sqNorm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    s
  }

  private val md5s = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Token n-gram kernel; see [[TokenGrams]]. */
  def tokenGrams(toks: ArrayData, window: Int, stride: Int,
      cover: Boolean): ArrayData = {
    val n = toks.numElements()
    val count =
      if (!cover) { if (n < window) 0 else (n - window) / stride + 1 }
      else if (n == 0) 0
      else (math.max(n - window, 0) + stride - 1) / stride + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < n) { parts(i) = toks.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    val out = new Array[AnyRef](count)
    var j = 0
    while (j < count) {
      val start = j * stride
      val len = math.min(window, n - start)
      val slice = new Array[UTF8String](len)
      System.arraycopy(parts, start, slice, 0, len)
      out(j) = UTF8String.concatWs(space, slice: _*)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** MD5 window-digest kernel; see [[GramDigests]]. Hashes the exact
    * UTF-8 bytes of the space-joined window without materializing the
    * joined string. */
  def gramDigests(toks: ArrayData, k: Int, hexLen: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = toks.getUTF8String(i).getBytes; i += 1 }
    val md = md5s.get()
    val out = new Array[AnyRef](n - k + 1)
    var j = 0
    while (j <= n - k) {
      md.reset()
      var t = j
      while (t < j + k) {
        if (t > j) md.update(' '.toByte)
        md.update(bytes(t))
        t += 1
      }
      val d = md.digest()
      val hex = new Array[Byte](hexLen)
      var h = 0
      while (h < hexLen) {
        val b = d(h >> 1) & 0xff
        hex(h) = hexDigits(if ((h & 1) == 0) b >> 4 else b & 0xf).toByte
        h += 1
      }
      out(j) = UTF8String.fromBytes(hex)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Ordered-pair kernel; see [[PairCombos]]. */
  def pairCombos(ps: ArrayData): ArrayData = {
    val n = ps.numElements()
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var o = 0
    var i = 0
    while (i < n) {
      val u = ps.getLong(i)
      var j = i + 1
      while (j < n) {
        out(o) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](u, ps.getLong(j)))
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnow window-minima kernel; see [[WinnowMins]]. Naive O(L·w)
    * scan (w is small); distinct preserves first-occurrence order via
    * value-hashed UTF8Strings — the array_distinct contract. */
  def winnowMins(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0)
      return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < n) { parts(i) = hs.getUTF8String(i); i += 1 }
    val count = math.max(n - w, 0) + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j < count) {
      var min = parts(j)
      var t = j + 1
      val end = math.min(j + w, n)
      while (t < end) {
        if (parts(t).compareTo(min) < 0) min = parts(t)
        t += 1
      }
      seen.add(min)
      j += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** BPE pair-merge fold kernel; see [[PairMergeFold]]. One pass, one
    * output buffer — the state machine of the declarative fold. */
  def pairMergeFold(toks: ArrayData, a: UTF8String, b: UTF8String,
      merged: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new Array[AnyRef](n)
    var len = 0
    var pend: UTF8String = null
    var i = 0
    while (i < n) {
      val x = toks.getUTF8String(i)
      if (pend != null && pend.equals(a) && x != null && x.equals(b)) {
        out(len) = merged; len += 1; pend = null
      } else if (pend == null) pend = x
      else { out(len) = pend; len += 1; pend = x }
      i += 1
    }
    if (pend != null) { out(len) = pend; len += 1 }
    new GenericArrayData(if (len == n) out
      else java.util.Arrays.copyOf(out, len))
  }

  /** Unit normalization; see [[L2Normalize]]. The divide is the same
    * IEEE op as the SQL `x / sqrt(...)`; a ZERO vector throws like the
    * ANSI-mode declarative divide does (Spark 4 default
    * spark.sql.ansi.enabled=true errors on double division by zero) —
    * same crash-on-degenerate-input outcome, so the kernel cannot
    * silently emit NaN rows where the declarative form failed the
    * query. An empty array normalizes to an empty array (no division
    * runs), also matching the declarative form. */
  def l2Normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val norm = math.sqrt(sqNorm(a))
    if (norm == 0.0 && n > 0)
      throw new ArithmeticException(
        "[DIVIDE_BY_ZERO] l2_normalize of a zero vector (ANSI division by zero)")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  /** Entropy in bits over code points: decode, sort, one run-length
    * pass. Sorting fixes the summation order, so the result is
    * bit-stable across partitionings and thread counts. */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    val cps = new Array[Int](str.codePointCount(0, len))
    var i = 0
    var j = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    val n = cps.length
    java.util.Arrays.sort(cps)
    val ln2 = math.log(2.0)
    var ent = 0.0
    var runStart = 0
    var k = 1
    while (k <= n) {
      if (k == n || cps(k) != cps(runStart)) {
        val p = (k - runStart).toDouble / n
        ent -= p * (math.log(p) / ln2)
        runStart = k
      }
      k += 1
    }
    ent
  }

  def minhashSignature(a: ArrayData, k: Int): ArrayData = {
    val n = a.numElements()
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = a.getLong(i)
      var j = 0
      while (j < k) {
        // splitmix64 finalizer over (shingle ^ per-permutation seed)
        var h = s ^ (0x9e3779b97f4a7c15L * (j + 1))
        h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
        h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
        h = h ^ (h >>> 31)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Packed phrase scan kernel; see [[PhrasePack]]. Tokenization
    * matches the declarative scan's `split(lower(trim(text)), "\s+")`
    * EXACTLY by reusing the same UTF8String primitives Spark's own
    * trim/lower compile to: `UTF8String.trim()` strips only space
    * (U+0020) — unlike `java.lang.String.trim`, which also strips
    * \t/\n/\r and would DROP the leading empty token the SQL split
    * keeps on tab-prefixed docs, shifting first_pos — and
    * `UTF8String.toLowerCase()` is the identical lowercase path
    * (ASCII fast path, default-locale fallback) as SQL `lower`. */
  def phrasePack(text: UTF8String, phrase: Array[String]): Long = {
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    val k = phrase.length
    var count = 0L
    var first = 0L
    var i = 0
    val last = toks.length - k
    while (i <= last) {
      var j = 0
      while (j < k && toks(i + j) == phrase(j)) j += 1
      if (j == k) {
        count += 1
        if (first == 0L) first = i + 1L
      }
      i += 1
    }
    (count << 32) | first
  }
}
