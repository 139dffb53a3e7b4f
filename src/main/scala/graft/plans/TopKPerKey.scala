package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.PlanShim

/** Whole-operator Catalyst extension (SURVEY.md §7.1 step 9, preference
  * (c)): per-key top-k as a first-class physical operator.
  *
  * Spark's declarative form — `row_number() OVER (PARTITION BY k ORDER
  * BY o) <= k` — must SORT every partition's full data before ranking:
  * O(n log n) time and O(n) sort buffer (spill) per partition. This
  * operator keeps a bounded k-row heap per key instead: O(n log k) time
  * and O(distinct keys in the task × k) heap state. That state does not
  * spill — the right trade when keys·k rows fit an executor (the common
  * top-k shape); for extreme key cardinality keep the spillable window
  * plan (the rewrite rule honors `spark.graft.topk.rewrite=false`).
  *
  * The planner contract does the heavy lifting: `requiredChildDistribution
  * = ClusteredDistribution(keys)` makes Catalyst insert (or reuse) the
  * hash exchange, so the operator composes with AQE like any built-in.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    partial: Boolean = false) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner rule: logical TopKPerKey → physical exec. Registered via
  * `spark.experimental.extraStrategies` (Tables.pinDialect) and
  * `injectPlannerStrategy` (GraftExtensions). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, partial) =>
      TopKPerKeyExec(keys, order, k, planLater(child), partial) :: Nil
    case _ => Nil
  }
}

/** `partial = true` is the map-side variant (the top-k analogue of
  * map-side combine): no distribution requirement, prunes each input
  * partition to k rows per key so the exchange above the final pass
  * moves only k·keys rows per map partition. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // reverse heap: the WORST kept row sits at the head for O(log k)
      // eviction when a better row arrives
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](limit + 1,
            ordering.reverse)
          heaps.put(key.copy(), pq)
        }
        if (pq.size() < limit) pq.add(row.copy())
        else if (ordering.compare(row, pq.peek()) < 0) {
          pq.poll()
          pq.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { pq =>
        val arr = pq.toArray(new Array[InternalRow](pq.size()))
        java.util.Arrays.sort(arr, ordering)
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-side constructor. */
object TopK {

  /** The first k rows of each key group under `order` (give a total
    * order — include a unique tie-break — for deterministic results).
    * Plans the partial (map-side) + final pair, so the exchange between
    * them moves only k rows per key per map partition — same shape the
    * optimizer rewrite produces (caught by bench shuffle telemetry:
    * the final-only form shuffled the entire input). */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val keyExprs = keys.map(PlanShim.expression)
    val sortOrder = order.map(c => PlanShim.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    PlanShim.ofRows(df.sparkSession,
      TopKPerKey(keyExprs, sortOrder, k,
        TopKPerKey(keyExprs, sortOrder, k, df.queryExecution.analyzed,
          partial = true)))
  }
}
