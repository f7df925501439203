package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Distributed per-key top-k as a first-class operator
  * (logical node + strategy + physical exec, the SURVEY.md §7.4 pattern;
  * reference structure: `SparkStrategies.scala:111`, `limit.scala:121`
  * TakeOrderedAndProjectExec generalized to grouped keys).
  *
  * Why not `Window(row_number) + filter`? WindowExec materializes every
  * key group in memory/spill and sorts ALL rows — at 100 TB of candidate
  * pairs that is a full shuffle + full sort of the candidate set. This
  * operator instead runs in two phases, mirroring partial aggregation:
  *
  *   1. partial: per input partition, a bounded heap of ≤k rows per key —
  *      shuffle input shrinks from |rows| to ≤ k·|keys-per-partition|;
  *   2. final: after hash-clustering on the keys (EnsureRequirements
  *      inserts the Exchange), merge heaps to the exact per-key top-k.
  *
  * Memory is O(live keys per partition × k); a production hardening would
  * spill the heap map via UnsafeExternalSorter the way HashAggregate falls
  * back to sort-based aggregation.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExprs = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "better" = earlier under the requested sort order; the heap keeps
      // the worst kept row at its head so one comparison decides eviction.
      val better = new LazilyGeneratedOrdering(orderExprs, childOutput)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              better.asInstanceOf[Ordering[InternalRow]].asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap += row.asInstanceOf[UnsafeRow].copy()
        } else if (better.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.asInstanceOf[UnsafeRow].copy()
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public API: `TopK.perKey(df, keys, order, k)`.
  *
  * Columns are referenced by name against the DataFrame's analyzed output
  * (project computed sort keys first), so the custom logical node carries
  * only resolved `AttributeReference`s — no analyzer round-trip needed.
  */
object TopK {

  final case class Ord(name: String, ascending: Boolean = true)
  def asc(name: String): Ord = Ord(name)
  def desc(name: String): Ord = Ord(name, ascending = false)

  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Ord], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val plan = ColumnBridge.plan(df)
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map(o =>
      SortOrder(attr(o.name), if (o.ascending) Ascending else Descending))
    ColumnBridge.ofRows(spark, TopKPerKey(keys.map(attr), sortOrders, k, plan))
  }
}
