package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per group as a first-class physical operator — the (c) tier
  * of the extension ladder: custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]).
  *
  * The declarative formulation (`row_number().over(partitionBy(g)
  * .orderBy(o)) <= k`) shuffles EVERY row of every group, then sorts each
  * group fully just to discard all but k rows. This operator plans the
  * aggregation-style alternative:
  *
  *   partial TopK (map side, bounded heap per group, no sort)
  *     → shuffle of AT MOST k rows per (partition, group)
  *       → final TopK (same heaps on the merged partials)
  *
  * Shuffle volume drops from |rows| to ≤ k·|groups|·|partitions| and no
  * full sort ever runs — the same partial/final shape Spark uses for
  * aggregates, applied to order statistics. Ties beyond position k are
  * broken by whichever candidate arrives first, exactly like
  * `row_number`: supply a total order (tie-breaker column) for
  * deterministic results.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression], orderExprs: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Plans the logical node as partial-then-final [[TopKPerGroupExec]]. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression], orderExprs: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  // The final pass needs each group co-located (Spark inserts the
  // exchange); the partial pass runs wherever the data already is.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val orderExprsB = orderExprs
    val childOutput = child.output
    val kB = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprsB, childOutput)
      val ordering = RowOrdering.create(orderExprsB, childOutput)
      // Per group: bounded heap whose head is the WORST retained row
      // (reverse ordering), so admission is an O(log k) peek/replace.
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      val reverse = ordering.reverse
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = new java.util.PriorityQueue[InternalRow](kB + 1, reverse)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size() < kB) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.valuesIterator.flatMap { h =>
        import scala.jdk.CollectionConverters._
        h.iterator().asScala
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Column-level API for the custom operator. */
object GroupTopK {

  /** Keep the first `k` rows of each group under `orderCols` (ascending
    * unless a Column carries `.desc`/`.asc`): semantically
    * `row_number().over(partitionBy(groupCols).orderBy(orderCols)) <= k`
    * without the full per-group sort or whole-input shuffle. Row order
    * within the result is unspecified — apply a final `orderBy` for
    * presentation. */
  def topK(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    // eagerExpression: the lazy Column wrapper is not serializable and
    // would be captured by the executor closure via the plan's fields.
    val group = groupCols.map(GraftBridge.eagerExpression)
    val order = orderCols.map { c =>
      GraftBridge.eagerExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(group, order, k, GraftBridge.analyzedPlan(df)))
  }
}
