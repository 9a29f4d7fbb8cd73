package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator Catalyst extension (SURVEY.md §7.3 preference (c):
  * logical node + SparkStrategy + physical SparkPlan): exact top-k rows
  * per key WITHOUT a sort.
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(
  * ord)) <= k`) is correct but its physical plan is exchange → FULL SORT
  * of every partition → WindowExec → filter: at 100 TB the sort is
  * O(n log n) per partition with spill, to keep k rows per key. This
  * operator declares `ClusteredDistribution(keys)` (EnsureRequirements
  * inserts the same single hash exchange the window needs) but replaces
  * the sort+window with one streaming pass: a bounded k-heap per key —
  * O(n log k), no spillable sort buffer, memory k·|keys-per-partition|
  * rows. The ordering must be TOTAL (include tiebreak columns) so the
  * kept set — and therefore the oracle hash — is deterministic at any
  * partitioning and arrival order.
  *
  * Planned via `spark.experimental.extraStrategies` (attached idempotently
  * by [[TopKPerKey.topK]] so the driver-contract sessions need no config)
  * and via `GraftExtensions.injectPlannerStrategy` for `spark.sql.
  * extensions` users.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val ordExprs = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(ordExprs, childOutput)
      // max-heap per key under `ord`: head = worst kept row, so admission
      // is one compare and eviction one dequeue — O(log k) per row
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val h = heaps.get(key) match {
          case Some(hq) => hq
          case None =>
            val hq = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](ord.asInstanceOf[Ordering[InternalRow]])
            heaps.put(key.copy(), hq)
            hq
        }
        if (h.size < kLocal) h.enqueue(row.copy())
        else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
      }
      heaps.valuesIterator.flatMap(h =>
        h.toArray.sorted(ord.asInstanceOf[Ordering[InternalRow]]).iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  /** Top-k rows of `df` per `keys` group, first-k under `order`
    * ((column, ascending) pairs — pass a TOTAL order: include tiebreak
    * columns). Column references resolve by name against the analyzed
    * child here (a Spark 4 `Column` is a ColumnNode the analyzer only
    * resolves inside standard operators, not custom nodes), so the plan
    * enters the optimizer fully resolved. Attaches the planner strategy
    * to the session idempotently. */
  def topK(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
           k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String) = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"TopKPerKey: no column '$n' in ${child.output.map(_.name)}"))
    val ordExprs = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark, TopKPerKey(keys.map(attr), ordExprs, k, child))
  }
}
