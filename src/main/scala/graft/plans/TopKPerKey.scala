package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key top-k as a first-class physical operator — tier (c) of the
  * custom-operator ladder (SURVEY.md §7.3): a planner `SparkStrategy`
  * that recognizes the ubiquitous
  * {{{ Filter(rn <= k, Window(row_number over (partition p order o))) }}}
  * pattern (ranking, per-query ANN top-k, keep-one dedup) and plans it
  * as [[TopKPerKeyExec]]: a bounded-heap selection per key instead of a
  * FULL SORT of every window partition.
  *
  * Why it matters at scale: `WindowExec` must sort each partition
  * completely (spilling as needed) even though only k rows per key
  * survive the filter. The heap keeps O(keys × k) rows per task and does
  * O(n log k) work — for k=10 over million-row keys that is the
  * difference between a spilling sort and a streaming pass. Spark ships
  * exactly this idea for the GLOBAL case (`TakeOrderedAndProject`); this
  * operator is its per-key sibling.
  *
  * Memory contract: heap state is per-key, per-task, and NOT spillable —
  * intended for small k and bounded key cardinality per partition
  * (ranking dashboards, top-k retrieval). The strategy only fires for
  * literal k ≤ maxK (default 1024); larger k falls back to the sort.
  * Key cardinality is guarded at RUNTIME: a task that would buffer more
  * than `spark.graft.topk.maxBufferedRowsPerTask` rows (default 8M)
  * fails fast with a diagnostic naming the window-sort fallback rather
  * than OOMing the executor.
  *
  * Enabled via `GraftExtensions` / `TopKPerKey.register(spark)`;
  * semantics-identical to the window form — proven by running the ENTIRE
  * oracle suite with the strategy active (TopKPerKeySpec) plus direct
  * result-equality properties.
  */
object TopKPerKey {

  /** Max literal k the strategy will plan; beyond it the sort-based
    * window is likely the safer choice (heap holds k rows per key). */
  val maxK = 1024

  /** Conf key bounding the non-spilling heap state per task (rows held
    * across all keys). k is capped at planning time but KEY CARDINALITY
    * is only known at runtime: a high-cardinality partition key would
    * grow the per-task map without bound where `WindowExec` would have
    * spilled. On exceed the task fails fast with a diagnostic naming the
    * fallback instead of OOMing the executor. */
  val maxBufferedRowsKey = "spark.graft.topk.maxBufferedRowsPerTask"

  /** Default per-task row budget (≈8M slim rows; at ~100 B/row that is
    * ~800 MB of heap upper bound — generous for ranking/top-k shapes,
    * small enough to fail before the executor does). */
  val defaultMaxBufferedRows = 8L * 1024 * 1024

  def strategy(spark: SparkSession): SparkStrategy = new TopKPerKeyStrategy

  class TopKPerKeyStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Filter(cond,
        w @ Window(Seq(alias @ Alias(
          WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)) =>
        val rn = alias.toAttribute
        limitFor(cond, rn) match {
          case Some(k) if k >= 0 && k <= maxK && order.nonEmpty =>
            TopKPerKeyExec(k, part, order, rn, planLater(child)) :: Nil
          case _ => Nil
        }
      case _ => Nil
    }
  }

  /** Extract k from `rn <= k` / `rn < k` / `rn = k` (k literal). Only a
    * single comparison over the row_number attribute qualifies — any
    * other residual predicate falls back to the window plan. rn = k is
    * only a top-k when k = 1 (the keep-one-winner dedup shape); for
    * k > 1 the filter keeps the k-th row alone, which the heap form
    * would have to post-filter — not worth the rewrite. */
  private def limitFor(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  /** Session-level activation for an already-built session (the
    * extensions path in `GraftExtensions` is preferred at build time).
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKPerKeyStrategy])) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy(spark)
    }
}

case class TopKPerKeyExec(
    k: Int,
    partExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  // rnAttr is born here, not read from the child — without declaring it
  // the node reports missingInput and plans print with a "!" marker
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partExprs) :: Nil

  // rows only move within their key's partition — partitioning survives
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val partLocal = partExprs
    val orderLocal = orderSpec
    val childOutput = child.output
    val outputLocal = output
    // read on the driver at execution time so tests/users can tune it
    // per-session; captured into the task closure as a plain long
    val maxBuffered = org.apache.spark.sql.internal.SQLConf.get
      .getConfString(TopKPerKey.maxBufferedRowsKey,
        TopKPerKey.defaultMaxBufferedRows.toString).toLong
    child.execute().mapPartitions { iter =>
      if (kLocal == 0) Iterator.empty
      else {
        val keyProj = UnsafeProjection.create(partLocal, childOutput)
        val ord = RowOrdering.create(orderLocal, childOutput)
        // max-heap under the sort order: head = current worst of the k kept
        val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
        val heaps = scala.collection.mutable.LinkedHashMap
          .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
        var buffered = 0L // rows currently held across all heaps
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          // copy the key ONLY on first sight — getOrElseUpdate would
          // allocate a copy per row on the (dominant) hit path
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < kLocal) {
            buffered += 1
            if (buffered > maxBuffered) {
              throw new IllegalStateException(
                s"TopKPerKeyExec: task buffered > $maxBuffered rows " +
                  s"(${heaps.size} keys × k=$kLocal; ${TopKPerKey.maxBufferedRowsKey}). " +
                  "Key cardinality is too high for the non-spilling bounded-heap " +
                  "operator. Raise the budget, repartition to more tasks, or fall " +
                  "back to the spilling sort-based window plan by disabling the " +
                  "rewrite (drop GraftExtensions / clear experimental strategies).")
            }
            heap.enqueue(row.copy())
          } else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
        }
        val outProj = UnsafeProjection.create(outputLocal, outputLocal)
        val joined = new JoinedRow
        val rnRow = new GenericInternalRow(1)
        heaps.iterator.flatMap { case (_, heap) =>
          val ascending: Seq[InternalRow] = heap.dequeueAll.reverse
          ascending.iterator.zipWithIndex.map { case (row, i) =>
            rnRow.update(0, i + 1)
            outProj(joined(row, rnRow)).copy()
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
