package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §7.3 mechanism (c), `Rule[LogicalPlan]`):
  * push key-only filters through [[TopKPerKeyNode]].
  *
  * Catalyst's PushDownPredicates cannot see through an unknown node, so
  * `df.topKPerKey(...).filter(key = x)` would otherwise rank EVERY group
  * and then discard all but one — at corpus scale that is the difference
  * between scanning one key's rows (filter reaches the parquet scan) and
  * ranking the world. Pushing is sound exactly when the predicate
  * references only the grouping keys: per-key top-k commutes with
  * key-only selection (it never compares rows across keys).
  */
object PushFilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, topk @ TopKPerKeyNode(keys, _, _, child))
        if cond.deterministic &&
          AttributeSet(cond.references).subsetOf(
            AttributeSet(keys.flatMap(_.references))) =>
      topk.copy(child = Filter(cond, child))
  }
}
