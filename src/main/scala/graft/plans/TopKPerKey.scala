package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/**
 * Top-k rows per key — a whole custom operator through the Catalyst
 * stack (SURVEY §7.3 ladder step (c)): logical node + planner
 * strategy + two-phase physical execution.
 *
 * Why not a window? `row_number().over(partitionBy(key).orderBy(o))
 * <= k` must SORT every partition — O(n log n) over ALL rows and no
 * map-side reduction. This operator keeps a bounded heap of k rows
 * per key: the partial pass reduces each input partition to ≤k rows
 * per key before the shuffle (the classic map-side combine LibMR
 * pipelines build by hand with accumulate-before-collect, SURVEY
 * §2.1 #4), so the exchange moves O(keys·k) rows no matter how large
 * the input — the property that matters at 100 TB.
 *
 * Semantics: exactly k rows per key (fewer if the key has fewer),
 * chosen by the given ordering; ties broken by the ordering itself,
 * so pass a total order (include a unique column) for deterministic
 * output. Output rows are NOT globally sorted (set semantics, like
 * the reference's collect).
 */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

/** Planner strategy: partial (pre-shuffle) + final (clustered) heaps. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/**
 * Bounded per-key heap pass. `partial = true` runs on whatever
 * distribution the child has (map-side reduce); `partial = false`
 * requires clustering by key, which EnsureRequirements satisfies
 * with one hash exchange of the already-reduced rows.
 */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap on "worst kept row first" => reverse of the requested order
      val heapOrd = new java.util.Comparator[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = rowOrd.compare(b, a)
      }
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          // row ranks strictly better than the current worst kept
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }
}
