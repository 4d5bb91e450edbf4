package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Physical per-group top-k. Both phases require the child sorted by
  * (group keys, order spec) — EnsureRequirements inserts the local
  * sorts (spillable SortExec), so the operator itself is a streaming
  * single pass: track the current key, emit while the per-key row
  * count is <= k.
  *
  *  - partial (map side, before the exchange): emits at most k rows
  *    per key per input partition; no rank column.
  *  - final (after ClusteredDistribution(group) exchange): emits at
  *    most k rows per key with the 1-based rank appended — exactly
  *    row_number() semantics under the same total order.
  *
  * State is one UnsafeRow key + one counter — O(1) per partition; the
  * sorts spill, so nothing here limits scale.
  */
case class TopKPerGroupExec(
    finalPhase: Boolean,
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (finalPhase) child.output :+ rankAttr else child.output

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (finalPhase)
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
    else org.apache.spark.sql.catalyst.expressions.AttributeSet.empty

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupExprs.map(e => SortOrder(e, Ascending)) ++ orderSpec)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val n = k
    val fin = finalPhase
    val outAttrs = output
    val rank = rankAttr
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(gExprs, childOutput)
      var curKey: UnsafeRow = null
      var count = 0
      if (!fin) {
        iter.filter { row =>
          val key = groupProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); count = 1 }
          else count += 1
          count <= n
        }
      } else {
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        val outProj = UnsafeProjection.create(outAttrs, childOutput :+ rank)
        iter.flatMap { row =>
          val key = groupProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); count = 1 }
          else count += 1
          if (count <= n) {
            rankRow.update(0, count)
            Iterator.single[InternalRow](outProj(joined(row, rankRow)))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
