package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** The AS-OF join as a NATIVE whole-plan operator — the one place in
  * this library where Spark's algebra genuinely lacks the operator
  * (the composable formulation, [[graft.operators.AsOfJoin]], unions
  * both tables and window-scans the merged stream), so the custom
  * LogicalPlan + Strategy + SparkPlan mechanism earns its keep:
  *
  *   - [[AsOfJoinNode]]: resolved logical node over analyzed children
  *     (outputs left ++ nullable right, like a left-outer join);
  *   - [[AsOfJoinStrategy]]: planner rule installed via
  *     `spark.experimental.extraStrategies` (or an extensions
  *     injector), mapping the node to the exec;
  *   - [[AsOfJoinExec]]: declares `ClusteredDistribution` on the key
  *     and `(key, ts, tiebreak)` child orderings — EnsureRequirements
  *     inserts exactly one hash exchange + sort per side, AQE
  *     handles skew like any shuffle — then streams BOTH sorted
  *     sides through one `zipPartitions` merge: for each left row,
  *     the candidate is the last right row with the same key and
  *     `ts_r <= ts_l` (ties at equal ts resolved toward the larger
  *     tiebreak, identical to the union+window formulation's
  *     ordering). No window state, no union of the two tables, no
  *     row ever carried that isn't emitted.
  *
  * Null keys match each other (they sort together on both sides) —
  * the same grouping the window formulation gives, NOT SQL equality;
  * callers with nullable keys filter first. Rows are merged
  * per-partition with O(1) state (one candidate row per side).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute, leftTb: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightTb: Attribute)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, ltb, rk, rts, rtb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, ltb, rk, rts, rtb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute, leftTb: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightTb: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending),
      SortOrder(leftTb, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTb, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
    val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
    val nRight = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // O(1) streaming state: the next unconsumed right row and the
      // last consumed one (the as-of candidate for its key)
      var rHead: InternalRow =
        if (rIter.hasNext) rIter.next().copy() else null
      var cand: InternalRow = null
      lIter.map { lRow =>
        val lk = lRow.get(lKeyIdx, keyType)
        val lt = lRow.get(lTsIdx, tsType)
        var advancing = true
        while (advancing && rHead != null) {
          val rk = rHead.get(rKeyIdx, keyType)
          val c = keyOrd.compare(rk, lk)
          if (c < 0 ||
            (c == 0 && tsOrd.compare(rHead.get(rTsIdx, tsType), lt) <= 0)) {
            cand = rHead
            rHead = if (rIter.hasNext) rIter.next().copy() else null
          } else advancing = false
        }
        val matched = cand != null &&
          keyOrd.compare(cand.get(rKeyIdx, keyType), lk) == 0
        proj(joined(lRow, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public wrapper matching [[graft.operators.AsOfJoin]]'s contract:
  * left columns unchanged, right payload attached as `asof_<col>`
  * (always including `asof_<ts>`), nulls when no reference row at or
  * before the probe ts. */
object AsOfJoinNative {
  def apply(left: DataFrame, right: DataFrame, key: String, ts: String,
      tiebreak: String, payload: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy

    val payCols = (ts +: payload).distinct
    val extras = Seq(key, tiebreak).filterNot(payCols.contains)
    // alias every right column: a manually-built binary node gets no
    // DeduplicateRelations pass, so a self-join's shared exprIds must
    // be broken here (Alias always mints a fresh exprId)
    val rightProj = right.select(
      (payCols ++ extras).map(c => col(c).as("__r_" + c)): _*)

    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan = GraftColumnBridge.analyzed(rightProj)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))

    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, ts), attr(lPlan, tiebreak),
      attr(rPlan, "__r_" + key), attr(rPlan, "__r_" + ts),
      attr(rPlan, "__r_" + tiebreak))
    val names = left.columns.toSeq ++ payCols.map("asof_" + _) ++
      extras.map("__asof_drop_" + _)
    GraftColumnBridge.dataFrame(spark, node)
      .toDF(names: _*)
      .drop(extras.map("__asof_drop_" + _): _*)
  }
}
