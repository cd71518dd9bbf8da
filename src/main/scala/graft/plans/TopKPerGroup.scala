package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator Catalyst extension (SURVEY §2.H / prompt tier (c)):
  * per-group top-k with bounded heaps.
  *
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` — the
  * DataFrame spelling — shuffles every row and then SORTS every
  * partition fully before discarding all but k rows per group. This
  * operator keeps only a k-row heap per group:
  *
  *   - partial phase (map-side, before the shuffle): local top-k per
  *     group per partition, so at most `groups × k` rows per partition
  *     enter the shuffle — the same reduction partial aggregation gives
  *     groupBy;
  *   - final phase (after a ClusteredDistribution(group) exchange,
  *     requested via `requiredChildDistribution` so Catalyst plans the
  *     minimal exchange): exact top-k + rank emission.
  *
  * Memory is O(groups-per-partition × k), never O(rows); no sort of the
  * full data ever happens. At 100 TB this is the difference between a
  * bounded-state streaming pass and a full external sort per partition.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {

  require(k > 0, s"k must be positive, got $k")

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rankAttr is produced here, not consumed from the child
  override def producedAttributes:
      org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  def rankAttribute(name: String): AttributeReference =
    AttributeReference(name, IntegerType, nullable = false)()
}

/** Planner strategy: logical TopKPerGroup → partial + final TopKExec. */
object GraftStrategies extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      val partial = TopKExec(g, o, k, None, planLater(child))
      TopKExec(g, o, k, Some(rank), partial) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k. `rankAttr = None` → partial (local,
  * no distribution requirement, no rank output); `Some(a)` → final
  * (requires co-located groups, appends the 1-based rank).
  */
case class TopKExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Option[AttributeReference],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes:
      org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = ordering
    val limit = k
    val childOutput = child.output
    val emitRank = rankAttr.isDefined
    val outputAttrs = output

    child.execute().mapPartitions({ it =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      // ord.compare(a, b) < 0  ⇔  a ranks before b
      val ord: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(orderE, childOutput)
          .asInstanceOf[Ordering[InternalRow]]
      // max-heap on rank order: head = currently-worst kept row
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](ord.on[UnsafeRow](identity))
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      if (!emitRank) {
        heaps.iterator.flatMap { case (_, h) => h.iterator }
      } else {
        val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
        val joined = new JoinedRow
        heaps.iterator.flatMap { case (_, h) =>
          val sorted = h.dequeueAll.reverse // ascending rank order
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            val rankRow = new GenericInternalRow(Array[Any](i + 1))
            toUnsafe(joined(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKExec =
    copy(child = newChild)
}
