package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions wiring for graft's custom Catalyst surface.
  * Function injections are added here as native Expressions land
  * (SURVEY §2e); keeping registration centralized means SQL users and
  * the DataFrame API see the same functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctionRegistry.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder))
    }
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => SimplifyGraftExpressions)
  }
}

/** Central list of (name, ExpressionInfo, builder) for SQL registration:
  * `spark.sql("SELECT simhash64(text) ...")` works in any session built
  * with GraftSession / spark.sql.extensions=graft.plans.GraftExtensions.
  */
object GraftFunctionRegistry {
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions._
  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  /** Direct registration into an existing session (the extensions path
    * only applies to sessions created after the conf is set). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  def registrations: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("simhash64", info("simhash64", "simhash64(text) - 64-bit SimHash fingerprint"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("hamming_distance", info("hamming_distance",
      "hamming_distance(a, b) - bitCount(a ^ b)"),
      (es: Seq[Expression]) => HammingDistance(es(0), es(1))),
    ("rolling_shingles", info("rolling_shingles",
      "rolling_shingles(text, k) - distinct k-gram rolling hashes"),
      (es: Seq[Expression]) => RollingShingles(es(0), es(1))),
    ("cosine_similarity", info("cosine_similarity",
      "cosine_similarity(a, b) - cosine over double arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("dot_product", info("dot_product",
      "dot_product(a, b) - dot product over double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("minhash_signature", info("minhash_signature",
      "minhash_signature(shingles, k) - k-permutation MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es(0), es(1))),
    ("zorder2", info("zorder2",
      "zorder2(a, b) - 2-D Z-order (Morton) interleave of two longs"),
      (es: Seq[Expression]) => ZOrder2(es(0), es(1))),
    ("jaro_winkler", info("jaro_winkler",
      "jaro_winkler(a, b) - Jaro-Winkler name similarity (0.7 boost threshold, 4-char prefix cap)"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
    ("char_entropy", info("char_entropy",
      "char_entropy(text) - Shannon entropy (bits) of the code-point distribution"),
      (es: Seq[Expression]) => CharEntropy(es.head)),
    ("token_grams", info("token_grams",
      "token_grams(toks, window, stride, cover) - space-joined strided token n-grams"),
      (es: Seq[Expression]) => TokenGrams(es(0),
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int],
        es(3).eval().asInstanceOf[Boolean])),
    ("gram_digests", info("gram_digests",
      "gram_digests(toks, k, hexLen) - md5 hex digests of sliding token k-grams"),
      (es: Seq[Expression]) => GramDigests(es(0),
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])),
    ("pair_combos", info("pair_combos",
      "pair_combos(longs) - all ordered (i < j) element pairs as (u, v) structs"),
      (es: Seq[Expression]) => PairCombos(es.head)),
    ("winnow_mins", info("winnow_mins",
      "winnow_mins(hashes, w) - distinct sliding-window minima (winnowing selection)"),
      (es: Seq[Expression]) => WinnowMins(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("pair_merge_fold", info("pair_merge_fold",
      "pair_merge_fold(toks, a, b) - left-to-right non-overlapping BPE merge of adjacent (a, b)"),
      (es: Seq[Expression]) => PairMergeFold(es(0),
        es(1).eval().toString, es(2).eval().toString)),
    ("sq_euclidean", info("sq_euclidean",
      "sq_euclidean(a, b) - squared L2 distance over double arrays"),
      (es: Seq[Expression]) => SqEuclidean(es(0), es(1))),
    ("l2_normalize", info("l2_normalize",
      "l2_normalize(v) - unit-normalize a double array (x / sqrt(sum x^2))"),
      (es: Seq[Expression]) => L2Normalize(es.head)),
    ("sq_norm", info("sq_norm",
      "sq_norm(v) - sum of squares of a double array"),
      (es: Seq[Expression]) => SqNorm(es.head)),
    ("compress_ratio", info("compress_ratio",
      "compress_ratio(text) - DEFLATE bytes / raw bytes (repetitiveness quality signal)"),
      (es: Seq[Expression]) => CompressRatio(es.head)),
    // Aggregates register as plain expressions too — the analyzer wraps
    // an AggregateFunction in AggregateExpression at use sites, exactly
    // as the built-in registry does for sum/min/max.
    ("group_minhash", info("group_minhash",
      "group_minhash(sig, k) - union of k-permutation MinHash sketches per group"),
      (es: Seq[Expression]) => GroupMinHash(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("vector_sum", info("vector_sum",
      "vector_sum(v, dim) - element-wise sum of double arrays"),
      (es: Seq[Expression]) => VectorSum(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("outer_product_sum", info("outer_product_sum",
      "outer_product_sum(v, dim) - upper-triangular sum of outer products"),
      (es: Seq[Expression]) => OuterProductSum(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("kmv_sketch", info("kmv_sketch",
      "kmv_sketch(xxhash64_key, k) - bottom-k distinct sketch (supports intersection, unlike HLL)"),
      (es: Seq[Expression]) => KmvSketch(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("heavy_hitters", info("heavy_hitters",
      "heavy_hitters(item, k) - Misra-Gries heavy-hitter summary of capacity k"),
      (es: Seq[Expression]) => HeavyHitters(es(0),
        es(1).eval().asInstanceOf[Int])),
    // The engine-internal bloom pair, surfaced under graft names so SQL
    // can build/probe blooms without the DataFrame bridge.
    ("graft_bloom_agg", info("graft_bloom_agg",
      "graft_bloom_agg(xxhash64_key, est_items, num_bits) - bloom filter sketch"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es(0), es(1), es(2))),
    ("graft_might_contain", info("graft_might_contain",
      "graft_might_contain(bloom, xxhash64_key) - bloom membership probe"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(es(0), es(1))),
    // Composed-builtin surface: registered so SQL pipelines can fold
    // persisted sketch columns without the DataFrame bridge. Built
    // from raw catalyst nodes — a bridged Column tree would reach the
    // SQL analyzer as an opaque ColumnNodeExpression and fail codegen.
    ("kmv_merge", info("kmv_merge",
      "kmv_merge(sketches_array, k) - bottom-k merge of stored KMV sketches"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct,
          ArraySort, ArrayTransform, BitwiseXor, Flatten, LambdaFunction,
          Literal, Slice, UnresolvedNamedLambdaVariable}
        def flipped(arr: Expression, v: String): Expression = {
          val h = UnresolvedNamedLambdaVariable(Seq(v))
          ArrayTransform(arr,
            LambdaFunction(BitwiseXor(h, Literal(Long.MinValue)), Seq(h)))
        }
        flipped(
          Slice(new ArraySort(flipped(ArrayDistinct(Flatten(es(0))), "h1")),
            Literal(1), es(1)),
          "h2")
      })
  )
}
