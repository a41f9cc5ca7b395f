package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator Catalyst extension showcase (SURVEY §7.3 path (c)):
  * the backward as-of join as a native logical node + planner strategy +
  * physical operator, replacing the composed union+window form of
  * `operators.AsOfJoin`.
  *
  * Why a custom physical operator wins here: the composed form unions
  * both sides (carrying every left column as a struct payload through
  * the shuffle+sort), runs a `last(ignoreNulls)` window over |L|+|R|
  * rows, then filters the right rows back out. The native exec shuffles
  * each side with only its OWN columns, sorts each side independently
  * (Spark's shared EnsureRequirements machinery inserts both), and
  * streams a per-partition two-pointer merge: every left row is emitted
  * exactly once with the greatest right value at-or-before its
  * timestamp. O(|L|+|R|) per partition, no window buffer, no post-hoc
  * filter — the same single-shuffle scale shape with strictly less data
  * movement. Measured at sf0.1 (narrow 4-column left side, warm):
  * native 0.46 s / 0.94 MB shuffled vs composed 0.67 s / 1.04 MB; the
  * byte gap widens with left-row width since the composed form ships
  * the whole left payload through the union's shuffle twice-sized
  * frame.
  *
  * Semantics (matched to DuckDB `ASOF LEFT JOIN` and the composed form,
  * oracle-checked via q_asof_join): per left row, the right row with the
  * greatest ts <= left ts within the same key; ties at equal ts match;
  * keys/timestamps compare by their type's interpreted ordering; a null
  * key or ts on the left yields a null as-of value, null right keys/ts
  * never match.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightVal: Attribute,
    outAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override lazy val resolved: Boolean = childrenResolved &&
    DataTypeUtils.sameType(leftKey.dataType, rightKey.dataType) &&
    DataTypeUtils.sameType(leftTs.dataType, rightTs.dataType)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]; a no-op on every other
  * node. Installed per-session via [[GraftExtensions]] or
  * `spark.experimental.extraStrategies`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, rv, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rv, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightVal: Attribute,
    outAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  // co-partition both sides on the key (EnsureRequirements inserts
  // compatible hash shuffles, exactly as for a sort-merge join) ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil
  // ... and sort each side by (key, ts) so the merge is one forward pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "left rows with an as-of match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lKey = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTs = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKey = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTs = BindReferences.bindReference(rightTs: Expression, right.output)
    val rVal = BindReferences.bindReference(rightVal: Expression, right.output)
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val valRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      // single-element lookahead over the right side; right rows are
      // consumed at most once across the whole partition (two-pointer)
      var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var carryKey: Any = null
      var carryVal: Any = null
      def advanceRight(k: Any, t: Any): Unit = {
        var go = rRow != null
        while (go) {
          val rk = rKey.eval(rRow)
          val cmp = if (rk == null) -1 else keyOrd.compare(rk.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
          if (cmp < 0) {
            // right row behind the current left key (or null key): skip
            rRow = if (rIter.hasNext) rIter.next().copy() else null
            go = rRow != null
          } else if (cmp == 0) {
            val rt = rTs.eval(rRow)
            if (rt == null) {
              // null ts sorts first and never matches: consume and move on
              rRow = if (rIter.hasNext) rIter.next().copy() else null
              go = rRow != null
            } else if (tsOrd.compare(rt.asInstanceOf[AnyRef], t.asInstanceOf[AnyRef]) <= 0) {
              carryKey = k
              carryVal = rVal.eval(rRow) // later rows at equal ts overwrite: last wins
              rRow = if (rIter.hasNext) rIter.next().copy() else null
              go = rRow != null
            } else go = false
          } else go = false
        }
      }
      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTs.eval(lRow)
        // matched = an as-of right ROW exists; its value may itself be
        // null (the metric must not undercount null-valued matches)
        val matched = k != null && t != null && {
          advanceRight(k, t)
          carryKey != null && keyOrd.compare(carryKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0
        }
        numOutputRows += 1
        if (matched) numMatchedRows += 1
        valRow.update(0, if (matched) carryVal else null)
        proj(joined(lRow, valRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
