package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous per-group top-k idiom
  *
  * {{{ Filter(rank <= k, Window(row_number over (partition p order o))) }}}
  *
  * into the bounded-heap [[TopKPerGroup]] operator. The window spelling
  * sorts every partition fully; the rewrite caps memory at groups×k and
  * cuts shuffle volume via its map-side partial phase — the plans are
  * semantically identical (same rank attribute, same output schema).
  *
  * Fires only on the exact safe shape: a single row_number window
  * expression whose rank is compared to an integer literal directly
  * above the Window. Opt-in via `GraftExtensions` (session builder) or
  * `GraftExtensions.registerOptimizations(spark)` (running session).
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  /** rank-attr comparison → max rank k, if the shape is supported. */
  private def rankBound(cond: Expression,
      rank: AttributeReference): Option[Int] = cond match {
    case LessThanOrEqual(r: AttributeReference, IntegerLiteral(k))
      if r.exprId == rank.exprId => Some(k)
    case LessThan(r: AttributeReference, IntegerLiteral(k))
      if r.exprId == rank.exprId => Some(k - 1)
    case EqualTo(r: AttributeReference, IntegerLiteral(1))
      if r.exprId == rank.exprId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
          _, _, child, _))
        if partitionSpec.nonEmpty && orderSpec.forall(_.isInstanceOf[SortOrder]) =>
      val rankAttr = alias.toAttribute.asInstanceOf[AttributeReference]
      rankBound(cond, rankAttr) match {
        case Some(k) if k > 0 =>
          TopKPerGroup(partitionSpec, orderSpec, k, rankAttr, child)
        case _ => f
      }
  }
}
