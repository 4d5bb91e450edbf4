package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (rung (c) of the custom-op ladder):
  * per-group top-k with a MAP-SIDE PARTIAL phase.
  *
  * The built-in plan for `filter(row_number() over (partition by g
  * order by o) <= k)` is WindowExec, which shuffles EVERY row of the
  * child to the `g` partitions before ranking. But a row that is not
  * among its partition's k-smallest for its key can never be in the
  * global top-k of that key — so a partial top-k pass before the
  * exchange bounds shuffle volume at k rows per (key, input
  * partition), independent of input size. That asymmetry is the whole
  * point at 100 TB: for k=3 top-orders-per-customer over ~10^11 rows,
  * the exchange moves <=3 rows per customer per map task instead of
  * the entire fact table.
  *
  * Logical node → [[TopKStrategy]] plans partial+final
  * [[TopKPerGroupExec]]s; [[RewriteRankFilterToTopK]] rewrites the
  * row_number-filter shape automatically (injected via
  * [[graft.GraftExtensions]]).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override lazy val resolved: Boolean =
    childrenResolved && groupExprs.forall(_.resolved) && orderSpec.forall(_.resolved)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial-then-final [[TopKPerGroupExec]].
  * The final phase demands ClusteredDistribution(group), so
  * EnsureRequirements places the exchange BETWEEN the two phases —
  * only partial survivors shuffle.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      val partial = TopKPerGroupExec(finalPhase = false, g, o, k, rank, planLater(child))
      TopKPerGroupExec(finalPhase = true, g, o, k, rank, partial) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(rn <= k, Window(row_number() as rn over (g, o)))`
  * into [[TopKPerGroup]]. Only fires on the exact safe shape: a
  * single row_number window expression with the default
  * rows-unbounded-preceding-to-current frame, a non-empty partition
  * spec, and a filter that is one simple comparison against a
  * positive integer literal. The rank attribute keeps the window
  * alias's exprId, so downstream references are untouched.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rankId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rankId => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rankId => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.exprId == rankId && v == 1 => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
      if a.exprId == rankId => Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(
          Seq(a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)) if part.nonEmpty =>
      rankLimit(cond, a.exprId) match {
        case Some(k) if k > 0 => TopKPerGroup(part, order, k, a.toAttribute, child)
        case _ => f
      }
  }
}
