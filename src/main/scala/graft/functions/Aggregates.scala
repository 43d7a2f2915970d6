package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

/** Typed Dataset aggregator: weighted average, exact semantics
  * sum(w·x)/sum(w), usable with the `Dataset.groupByKey(...).agg`
  * API (compile-time typed) — the Dataset-typed face of the engine.
  */
class WeightedAvg[I](valueF: I => Double, weightF: I => Double)
    extends Aggregator[I, (Double, Double), Double] with Serializable {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: I): (Double, Double) =
    (b._1 + valueF(in) * weightF(in), b._2 + weightF(in))
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) 0.0 else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Group-level MinHash: element-wise minimum of per-row MinHash
  * signatures, i.e. the signature of the UNION of the group members'
  * shingle sets. A TypedImperativeAggregate with a primitive long-array
  * buffer — constant memory per group, merge = elementwise min, so it
  * map-side combines and never spills row data. Enables group↔group
  * Jaccard estimation (signature agreement rate) without pairwise doc
  * comparison — the sketch-union pattern a 100 TB corpus requires.
  */
case class GroupMinHash(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), k)
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(off: Int): GroupMinHash =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): GroupMinHash =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): GroupMinHash = copy(child = cs.head)
  override def prettyName: String = "group_minhash"
}

/** Element-wise sum of fixed-width double arrays (vector sum): a
  * TypedImperativeAggregate with a primitive double-array buffer —
  * constant memory per group, merge = element-wise add, map-side
  * combined. One distributed pass replaces the posexplode→(group,pos)
  * formulation, whose shuffle volume is dim× the row count; this
  * aggregate shuffles exactly one dim-wide buffer per group per map
  * partition. The k-means Lloyd step (sum vectors per centroid) is the
  * canonical use.
  */
case class VectorSum(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {
  import org.apache.spark.sql.types.DoubleType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim)

  override def update(buf: Array[Double],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      var i = 0
      while (i < n) { buf(i) += arr.getDouble(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * dim)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(dim)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(off: Int): VectorSum =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorSum =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): VectorSum = copy(child = cs.head)
  override def prettyName: String = "vector_sum"
}

/** One-pass upper-triangular sum of outer products Σ x·xᵀ — the moment
  * matrix a distributed PCA/covariance needs, as a map-side-combinable
  * aggregate. The buffer is dim(dim+1)/2 doubles (the symmetric half),
  * accumulated straight off `ArrayData` with no per-row matrix
  * allocation; shuffle volume is one buffer per partition per group,
  * never rows × dim². */
case class OuterProductSum(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {
  import org.apache.spark.sql.types.DoubleType

  private val size = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](size)

  override def update(buf: Array[Double],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      var i = 0
      var k = 0
      while (i < n) {
        val xi = arr.getDouble(i)
        var j = 0
        while (j <= i) { buf(k) += xi * arr.getDouble(j); j += 1; k += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * size)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(size)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(off: Int): OuterProductSum =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): OuterProductSum =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): OuterProductSum = copy(child = cs.head)
  override def prettyName: String = "outer_product_sum"
}

/** Misra–Gries heavy-hitter summary (capacity k) as a mergeable
  * TypedImperativeAggregate. update() is the classic stream step
  * (insert / count / decrement-all when full); merge() is the
  * Mergeable-Summaries merge (Agarwal et al. 2012): add counters
  * pointwise, then subtract the (k+1)-largest count and drop
  * non-positives — the combined summary keeps the MG guarantee, so the
  * aggregate map-side combines like any sum. Guarantees over a group of
  * n rows: every item with true frequency > n/(k+1) is present, and
  * each reported count undercounts by at most n/(k+1). Buffer is ≤ k
  * string counters — constant memory per group, independent of
  * cardinality; the exact groupBy-count alternative shuffles every
  * distinct item. Counter VALUES are arrival/merge-order dependent (as
  * in any MG sketch) — only the recall/undercount guarantee is stable —
  * so pipelines needing deterministic output recount the sketch's
  * candidates exactly (see TextAnalysis.heavyTokens: sketch finds, an
  * exact second pass confirms; the guarantee makes the recall loss
  * provably zero). Emitted entries sort (count desc, item asc). */
case class HeavyHitters(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {
  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  type Buf = scala.collection.mutable.HashMap[String, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(buf: Buf,
      input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < k => buf(s) = 1L
        case None =>
          // decrement-all; drop zeroed counters (classic MG step)
          val dead = List.newBuilder[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf(key) = c - 1
          }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (key, c) => a(key) = a.getOrElse(key, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-largest count from everything, keep positives
      val cut = a.values.toArray.sortBy(-_).apply(k)
      val dead = List.newBuilder[String]
      a.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else a(key) = c - cut
      }
      dead.result().foreach(a.remove)
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val rows = buf.toArray.sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        new GenericInternalRow(
          Array[Any](UTF8String.fromString(item), c)): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      // length-prefixed UTF-8 (writeUTF caps at 64 KB — items can be
      // whole documents when the aggregate is used over a text column)
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf(new String(kb, java.nio.charset.StandardCharsets.UTF_8)) =
        in.readLong()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): HeavyHitters =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HeavyHitters =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HeavyHitters = copy(child = cs.head)
  override def prettyName: String = "heavy_hitters"
}

/** KMV (k-minimum-values / bottom-k theta) distinct sketch as a
  * mergeable TypedImperativeAggregate: the buffer is the k smallest
  * DISTINCT xxhash64 values of the group, kept in a TreeSet ordered by
  * UNSIGNED magnitude (values are stored sign-flipped so natural
  * ordering is unsigned ordering). merge = set union re-capped at k, so
  * the aggregate map-side combines, and — unlike Misra–Gries counters —
  * the result is ORDER-INDEPENDENT: the k smallest of a multiset do not
  * depend on arrival or merge order, so output is deterministic across
  * partitionings.
  *
  * Why this exists next to HLL (approx_count_distinct / the DataSketches
  * hll_* family): HLL registers can only UNION. A KMV sketch supports
  * set INTERSECTION and Jaccard estimation (Beyer et al. SIGMOD'07;
  * the Jaccard/intersection estimators are the theta-sketch ones), which
  * is the consortium question — "how many users/documents do sites A
  * and B SHARE?" — answerable from KB-sized per-site sketches without
  * raw keys ever leaving a site (the privacy shape of
  * Federation.federatedDistinct, extended to overlaps).
  *
  * Exactness below saturation: while a group has < k distinct keys the
  * sketch IS the full hash set, so every estimator downstream
  * (Sketches.kmvEstimate / kmvIntersect / kmvUnion) returns EXACT
  * counts — modulo 64-bit hash collisions (~n²/2⁶⁴) — which is what
  * lets q_audience_overlap carry a DuckDB oracle.
  *
  * Emitted value: the sketch as a LongType array sorted unsigned-
  * ascending (original hash values, not the flipped keys). */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {
  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  type Buf = java.util.TreeSet[Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Buf = new java.util.TreeSet[Long]()

  override def update(buf: Buf,
      input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      // sign-flip: natural (signed) order on flipped values == unsigned
      // order on originals
      val f = v.asInstanceOf[Long] ^ Long.MinValue
      if (buf.size < k) { buf.add(f); () }
      else if (f < buf.last()) {
        if (buf.add(f)) { buf.pollLast(); () }
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.iterator()
    while (it.hasNext) {
      val f = it.next()
      if (a.size < k) { a.add(f); () }
      else if (f < a.last()) { if (a.add(f)) { a.pollLast(); () } }
      else { /* f can't be among the k smallest; TreeSet iterates
              * ascending so every later b element is larger still */
        return a
      }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next() ^ Long.MinValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): KmvSketch =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvSketch =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KmvSketch = copy(child = cs.head)
  override def prettyName: String = "kmv_sketch"
}

object Aggregates {
  /** Column form of GroupMinHash for DataFrame aggregations. */
  def groupMinhash(sig: Column, k: Int = 32): Column =
    toCol(GroupMinHash(toExpr(sig), k).toAggregateExpression())

  /** Column form of VectorSum for DataFrame aggregations. */
  def vectorSum(v: Column, dim: Int): Column =
    toCol(VectorSum(toExpr(v), dim).toAggregateExpression())

  /** Column form of OuterProductSum for DataFrame aggregations. */
  def outerProductSum(v: Column, dim: Int): Column =
    toCol(OuterProductSum(toExpr(v), dim).toAggregateExpression())

  /** Column form of HeavyHitters for DataFrame aggregations. */
  def heavyHitters(item: Column, k: Int): Column =
    toCol(HeavyHitters(toExpr(item), k).toAggregateExpression())

  /** The engine's internal bloom-filter machinery (what AQE's runtime
    * row-level filtering uses), surfaced as explicit functions — for
    * the pipelines where the planner can't inject it itself (manual
    * semi-join pruning mid-pipeline, cross-stage prefilters). `keyHash`
    * must be an xxhash64 long on BOTH build and probe side. */
  def bloomFilterAgg(keyHash: Column, estItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    toCol(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(toExpr(keyHash), Literal(estItems), Literal(numBits))
      .toAggregateExpression())
  }

  /** Membership probe against a [[bloomFilterAgg]] sketch — false
    * positives possible (rate set by numBits/estItems), false negatives
    * never. */
  def mightContain(bloom: Column, keyHash: Column): Column =
    toCol(org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(toExpr(bloom), toExpr(keyHash)))

  /** Column form of [[KmvSketch]]: bottom-k distinct sketch of `key`
    * (hashed internally with xxhash64, the same hash the bloom pair
    * uses). Estimators live in [[Sketches]]. */
  def kmvSketch(key: Column, k: Int): Column =
    toCol(KmvSketch(toExpr(org.apache.spark.sql.functions.xxhash64(key)), k)
      .toAggregateExpression())
}

/** Estimators over [[KmvSketch]] arrays, built ENTIRELY from codegen'd
  * built-in expressions (unsigned compares via sign-flip XOR, set ops
  * via array_intersect/array_union, counting via the filter HOF) — no
  * scalar UDF, no custom eval in the post-aggregation path.
  *
  * Estimator (Beyer et al. SIGMOD'07 / theta sketches): with θ = the
  * k-th smallest hash mapped to (0,1], every estimate is
  * |{h : h < θ}| / θ. An UNSATURATED sketch (< k values) has θ = 1 and
  * holds the complete hash set, so estimates degrade to exact counts.
  * For two-sketch ops, θ = min(θ_a, θ_b) — both sides are complete
  * below the cut, so the intersection/union restricted to it is an
  * unbiased sample of the true set. */
object Sketches {
  import org.apache.spark.sql.functions._

  private val twoTo64 = 1.8446744073709552e19 // 2^64 as double

  /** Signed-order key whose natural ordering equals unsigned order on
    * the original hash. */
  private def flip(c: Column): Column = c.bitwiseXOR(lit(Long.MinValue))

  /** Flipped cut key: the k-th smallest hash, or unsigned +∞ when the
    * sketch is unsaturated (every element is below the cut). */
  private def flipCut(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(Long.MaxValue))
      .otherwise(flip(element_at(sk, k)))

  /** θ ∈ (0,1]: the cut as a fraction of the hash space. */
  def theta(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(1.0))
      .otherwise(flip(element_at(sk, k)).cast("double") / twoTo64 + 0.5)

  private def countBelow(arr: Column, cut: Column): Column =
    size(filter(arr, h => flip(h) < cut)).cast("double")

  /** Estimated distinct count of the sketched group. Exact (as a whole
    * number) while the group had < k distinct keys. */
  def kmvEstimate(sk: Column, k: Int): Column =
    countBelow(sk, flipCut(sk, k)) / theta(sk, k)

  /** Estimated |A ∩ B| from two sketches built with the SAME k and the
    * same key domain. */
  def kmvIntersect(a: Column, b: Column, k: Int): Column = {
    val cut = least(flipCut(a, k), flipCut(b, k))
    countBelow(array_intersect(a, b), cut) / least(theta(a, k), theta(b, k))
  }

  /** Estimated |A ∪ B|. */
  def kmvUnion(a: Column, b: Column, k: Int): Column = {
    val cut = least(flipCut(a, k), flipCut(b, k))
    countBelow(array_union(a, b), cut) / least(theta(a, k), theta(b, k))
  }

  /** Estimated Jaccard |A∩B|/|A∪B| — the ratio of the two counts under
    * the SHARED cut (the θs cancel). Null when both sets are empty. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val cut = least(flipCut(a, k), flipCut(b, k))
    val inter = countBelow(array_intersect(a, b), cut)
    val uni = countBelow(array_union(a, b), cut)
    when(uni === 0.0, lit(null).cast("double")).otherwise(inter / uni)
  }

  /** MERGE an array of stored sketches (array<array<long>>) into one:
    * bottom-k of the union of their hash sets — the KMV algebra that
    * makes persisted sketches composable across runs/sites/days
    * (merge-of-bottom-ks == bottom-k-of-union, so the merged sketch is
    * BIT-IDENTICAL to sketching the concatenated raw data). Pure
    * built-ins: flip to signed order, distinct+sort, keep k, flip
    * back — output format matches [[KmvSketch]] (unsigned-ascending
    * originals). */
  def kmvMerge(sks: Column, k: Int): Column =
    transform(
      slice(array_sort(transform(array_distinct(flatten(sks)), h => flip(h))), 1, k),
      h => flip(h))
}
