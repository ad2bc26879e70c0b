package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension example from SURVEY §4: top-k rows per key
  * as a first-class physical operator.
  *
  * The stock plan for "top N per group" is `row_number() OVER
  * (PARTITION BY k ORDER BY s) <= N`: a full shuffle followed by a
  * FULL SORT of every partition, then a filter that throws almost all
  * of it away. At 100 TB the sort dominates. This operator keeps a
  * bounded k-element heap per key instead:
  *
  *  - partial exec (no distribution requirement) runs map-side,
  *    shrinking each partition to <= k rows per key BEFORE the shuffle;
  *  - final exec requires ClusteredDistribution(keys), so
  *    EnsureRequirements inserts exactly one hash exchange over the
  *    already-shrunk stream; it merges heaps and emits each key's rows
  *    in order.
  *
  * Memory is O(distinct-keys-per-partition * k); nothing is ever fully
  * sorted. Wired via SparkSessionExtensions.injectPlannerStrategy or
  * `spark.experimental.extraStrategies` (see Plans.topKPerKey).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(sortOrder, childOutput)
      // per key: a bounded heap holding the current top-k, worst on top
      val reverse = rowOrdering.reverse
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]
      val unsafeIter = iter.map(_.asInstanceOf[UnsafeRow])
      unsafeIter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          new java.util.PriorityQueue[UnsafeRow](limit, reverse))
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        val arr = heap.toArray(new Array[UnsafeRow](heap.size))
        java.util.Arrays.sort(arr, rowOrdering)
        arr.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
