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
}
