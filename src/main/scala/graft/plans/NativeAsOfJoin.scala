package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** Native as-of join — the whole-operator tier of the extension
  * ladder (logical node + planner strategy + physical exec), for the
  * operator Spark genuinely lacks: for each left row, the latest right
  * row with `right.ts <= left.ts` on the same key (left-join
  * semantics).
  *
  * Physical shape: both sides hash-co-partitioned on the key and
  * sorted by (key, ts) — EnsureRequirements inserts the exchanges and
  * sorts — then one streaming two-pointer merge per partition: O(n+m)
  * time, O(1) state (one buffered right row), no broadcast, no window
  * buffering. This is the plan the union+window composition
  * (graft.ops.AsOfJoin) approximates; at 100 TB both scale, but the
  * native exec halves the shuffled volume (no union) and keeps a
  * single pass.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTs
    val rt = rightTs
    val keyOrd = TypeUtils.getInterpretedOrdering(lk.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(lt.dataType)
    val nRight = rightOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
      val rTsProj = UnsafeProjection.create(Seq(rt), rightOut)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow

      var nextRight: InternalRow = null
      var nextKey: Any = null
      var nextTs: Any = null
      // SQL join semantics for nulls: a right row with a null key or
      // null ts can never match any left row — skip it here instead of
      // feeding null into the interpreted orderings (which would NPE).
      def advance(): Unit = {
        nextRight = null
        while (nextRight == null && rIter.hasNext) {
          val cand = rIter.next()
          val k = rKeyProj(cand).get(0, rk.dataType)
          val t = rTsProj(cand).get(0, rt.dataType)
          if (k != null && t != null) {
            nextRight = cand
            // key projection reuses its buffer; copy scalars out
            nextKey = InternalRow.copyValue(k)
            nextTs = InternalRow.copyValue(t)
          }
        }
      }
      advance()

      var matchRow: InternalRow = null
      var matchKey: Any = null

      lIter.map { lRow =>
        val key = InternalRow.copyValue(lKeyProj(lRow).get(0, lk.dataType))
        val ts = InternalRow.copyValue(lTsProj(lRow).get(0, lt.dataType))
        // a left row with a null key or ts matches nothing: null-padded
        // output, right cursor untouched (null keys sort first, so no
        // right rows are skipped by not advancing here)
        if (key == null || ts == null) joined(lRow, nullRight)
        else {
        // stale candidate from an earlier key group
        if (matchRow != null && keyOrd.asInstanceOf[Ordering[Any]].compare(matchKey, key) != 0)
          matchRow = null
        while (nextRight != null && {
          val kc = keyOrd.asInstanceOf[Ordering[Any]].compare(nextKey, key)
          kc < 0 || (kc == 0 && tsOrd.asInstanceOf[Ordering[Any]].compare(nextTs, ts) <= 0)
        }) {
          val kc = keyOrd.asInstanceOf[Ordering[Any]].compare(nextKey, key)
          if (kc == 0) {
            matchRow = nextRight.copy()
            matchKey = nextKey
          } else matchRow = null
          advance()
        }
        if (matchRow != null) joined(lRow, matchRow) else joined(lRow, nullRight)
        }
      }
    }
  }
}

/** Public entry: `NativeAsOf.leftAsOf(left, right, ...)` builds the
  * logical node and registers the strategy once per session.
  */
object NativeAsOf {
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = Bridge.analyzed(left)
    val rp = Bridge.analyzed(right)
    def resolve(plan: LogicalPlan, name: String, side: String): Expression =
      plan.output.find(a => a.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found on $side side"))
    Bridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      resolve(lp, leftKey, "left"), resolve(rp, rightKey, "right"),
      resolve(lp, leftTs, "left"), resolve(rp, rightTs, "right")))
  }
}
