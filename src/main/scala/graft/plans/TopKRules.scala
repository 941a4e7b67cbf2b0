package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §7.3 mechanism (c), `Rule[LogicalPlan]`):
  * push key-only filters through [[TopKPerKeyNode]].
  *
  * Catalyst's PushDownPredicates cannot see through an unknown node, so
  * `df.topKPerKey(...).filter(key = x)` would otherwise rank EVERY group
  * and then discard all but one — at corpus scale that is the difference
  * between scanning one key's rows (filter reaches the parquet scan) and
  * ranking the world. Pushing is sound exactly when the predicate is a
  * function of the grouping keys — constant within each group, so it
  * either keeps or drops a group whole. We require every key to BE an
  * AttributeReference and the predicate to reference only those
  * attributes: with a computed key like `a % 10`, a predicate on `a`
  * references only the key's *inputs* yet varies within a group, and
  * pushing it would change which rows rank (the node is public and
  * installed session-wide, so the guard can't lean on how
  * [[graft.ops.TopK.perKey]] happens to build keys today).
  */
object PushFilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, topk @ TopKPerKeyNode(keys, _, _, child, _))
        if cond.deterministic && {
          val keyAttrs = keys.collect { case a: AttributeReference => a }
          keyAttrs.length == keys.length &&
            cond.references.subsetOf(AttributeSet(keyAttrs))
        } =>
      topk.copy(child = Filter(cond, child))
  }
}
