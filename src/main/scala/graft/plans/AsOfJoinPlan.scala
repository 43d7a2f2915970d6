package graft.plans

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.rdd.RDD

/** Whole-operator as-of join (SURVEY §2e): LogicalPlan + Strategy +
  * SparkPlan, registered via GraftExtensions (and self-registered via
  * `spark.experimental.extraStrategies` for plain sessions).
  *
  * Semantics: for each left row, attach the right row with the same key
  * and the greatest right-time <= left-time (ties: last in sort order),
  * or nulls. Physical strategy: both sides hash-clustered on key and
  * sorted by (key, time) — EnsureRequirements inserts the exchanges and
  * sorts — then a single streaming merge per partition. One shuffle per
  * side, no range explosion: the plan a 100 TB as-of needs (vs. the
  * quadratic inequality-join a naive formulation produces).
  *
  * Key/time are stored as resolved Attributes so they appear in
  * `references` — column pruning then keeps exactly the needed columns
  * (and nothing breaks under `count()`-style full pruning).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    toleranceUs: Long = -1L) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoin = copy(left = l, right = r)
}

object AsOfJoin {
  /** DataFrame-level entry point. Right-side columns must not collide
    * with left-side names (alias beforehand, as with any join). */
  /** `toleranceUs >= 0` additionally requires
    * leftTime - rightTime <= tolerance (in the time column's native
    * unit, µs for timestamps); stale matches become nulls. */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      toleranceUs: Long = -1L): DataFrame = {
    val spark = leftDf.sparkSession
    // self-register for sessions built without GraftExtensions
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = GraftColumnBridge.logicalPlan(leftDf)
    val rp = GraftColumnBridge.logicalPlan(rightDf)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name)}"))
    GraftColumnBridge.ofRows(spark,
      AsOfJoin(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime), toleranceUs))
  }
}

/** Planner strategy: AsOfJoin logical node → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTime, j.rightTime, j.toleranceUs) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    toleranceUs: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val lOut = left.output
    val rOut = right.output
    def idx(out: Seq[Attribute], a: Attribute): Int = {
      val i = out.indexWhere(_.exprId == a.exprId)
      if (i >= 0) i else out.indexWhere(_.name == a.name)
    }
    val lKeyIdx = idx(lOut, leftKey); val lTimeIdx = idx(lOut, leftTime)
    val rKeyIdx = idx(rOut, rightKey); val rTimeIdx = idx(rOut, rightTime)
    val lKeyType = leftKey.dataType; val lTimeType = leftTime.dataType
    val rKeyType = rightKey.dataType; val rTimeType = rightTime.dataType
    val nRight = rOut.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null // copied; key == lastMatchKey
      var lastMatchKey: Any = null
      var lastMatchTime: Any = null
      lIter.map { l =>
        val lk = l.get(lKeyIdx, lKeyType)
        val lt = l.get(lTimeIdx, lTimeType)
        // advance right cursor to this key
        while (rHead != null &&
            keyOrd.compare(rHead.get(rKeyIdx, rKeyType), lk) < 0) {
          rHead = if (rIter.hasNext) rIter.next() else null
        }
        // consume right rows at this key with time <= left time
        while (rHead != null &&
            keyOrd.compare(rHead.get(rKeyIdx, rKeyType), lk) == 0 &&
            timeOrd.compare(rHead.get(rTimeIdx, rTimeType), lt) <= 0) {
          lastMatch = rHead.copy()
          lastMatchKey = lk
          lastMatchTime = rHead.get(rTimeIdx, rTimeType)
          rHead = if (rIter.hasNext) rIter.next() else null
        }
        var matched = lastMatch != null && lastMatchKey != null &&
          keyOrd.compare(lastMatchKey, lk) == 0
        if (matched && toleranceUs >= 0L) {
          // timestamps surface as Long µs; bounded as-of drops stale rows
          matched = (lt, lastMatchTime) match {
            case (a: java.lang.Long, b: java.lang.Long) => a - b <= toleranceUs
            case _ => true
          }
        }
        outProj(joined(l, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}
