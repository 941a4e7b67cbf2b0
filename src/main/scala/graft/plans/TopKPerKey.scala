package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §7.3 mechanism (c)): exact top-k
  * rows per key without a full per-partition sort.
  *
  * Logical node + physical exec + planner strategy; exposed through
  * [[graft.ops.TopK.perKey]] and registered either via
  * `spark.experimental.extraStrategies` (live session) or
  * [[graft.functions.GraftExtensions]] (session build time).
  *
  * Scale rationale vs `row_number() OVER (PARTITION BY key ORDER BY ord)`:
  * the window operator sorts every row of every partition before ranking;
  * this exec keeps one bounded k-heap per key (memory O(keys_in_partition
  * × k)) and streams the input once — no sort buffer, no spill pressure
  * from rows that can never rank. The required ClusteredDistribution makes
  * Catalyst insert the hash exchange, so AQE still owns partition sizing.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      // head of the heap = the row that sorts LAST among the kept k
      val heapOrd: java.util.Comparator[InternalRow] = ordering.reverse
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = Seq.newBuilder[InternalRow]
      heaps.values().forEach(h => h.forEach(out += _))
      out.result().iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to the exec. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
