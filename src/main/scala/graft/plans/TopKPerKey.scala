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
  * Key cardinality is guarded at RUNTIME by
  * `spark.graft.topk.maxBufferedRowsPerTask` (default 8M rows), with
  * phase-appropriate degradation: the map-side PARTIAL flushes its heaps
  * and restarts when the budget is hit (a superset of the per-task top-k
  * is still correct — the final phase re-heaps), while the post-shuffle
  * FINAL — where exceeding the budget means the ANSWER itself does not
  * fit one task — fails fast with a diagnostic naming the window-sort
  * fallback rather than OOMing the executor.
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

  /** Conf toggling the two-phase plan (partial map-side heap below the
    * exchange). On by default: without it the FULL scored input shuffles
    * before the final heap runs — for ANN keys that is corpus × queries
    * rows over the wire, where the partial phase caps each map task's
    * contribution at keys × k rows. Off = the round-5 single-phase plan
    * (useful for A/B and as a fallback). */
  val twoPhaseKey = "spark.graft.topk.twoPhase"

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
            val twoPhase = org.apache.spark.sql.internal.SQLConf.get
              .getConfString(twoPhaseKey, "true").toBoolean
            // Spark's InferWindowGroupLimit may already have inserted a
            // logical WindowGroupLimit below the Window (the sort-based
            // partial/final group-limit pair). Our heap pair replaces it
            // wholesale — keeping it would stack a FULL LOCAL SORT under
            // the heap partial. Strip it when it is the same (part,
            // order, row_number, k) limit this filter produced; the heap
            // retains exactly the rows it would have kept.
            val realChild = child match {
              case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
                if wgl.rankLikeFunction.isInstanceOf[RowNumber] &&
                  wgl.limit >= k &&
                  wgl.partitionSpec.length == part.length &&
                  wgl.partitionSpec.zip(part).forall { case (a, b) => a.semanticEquals(b) } &&
                  wgl.orderSpec.length == order.length &&
                  wgl.orderSpec.zip(order).forall { case (a, b) => a.semanticEquals(b) } =>
                wgl.child
              case other => other
            }
            val base = planLater(realChild)
            // Partial phase: same bounded heap on the child's NATIVE
            // partitioning, emitting ≤ keys × k rows per task. The final
            // exec's ClusteredDistribution requirement makes
            // EnsureRequirements insert the Exchange BETWEEN them, so the
            // shuffle moves the partial's bounded output instead of the
            // full scored input — the per-key sibling of
            // TakeOrderedAndProject's local/global split (and of
            // partial/final aggregation).
            val input = if (twoPhase) TopKPerKeyPartialExec(k, part, order, base) else base
            TopKPerKeyExec(k, part, order, rn, input) :: Nil
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

  /** Shared per-partition heap builder for the partial and final phases:
    * one bounded max-heap (under the sort order; head = current worst of
    * the k kept) per key. O(n log k) work, O(keys × k) retained rows,
    * guarded by the per-task row budget. Static on the companion so the
    * task closure captures no operator state.
    *
    * Budget-exceed behavior is phase-dependent:
    *  - `failOnExceed = true` (the FINAL phase, after the exchange):
    *    throw with a diagnostic. Here all of a key's rows live in one
    *    task, so exceeding the budget means the answer itself does not
    *    fit — failing beats OOMing the executor.
    *  - `failOnExceed = false` (the PARTIAL phase): stop consuming and
    *    return the heaps built so far; the caller drains them and calls
    *    again on the remaining input (flush-and-reset). Emitting a
    *    SUPERSET of the per-task top-k is correctness-preserving — the
    *    final phase re-heaps — so the partial degrades toward
    *    pass-through instead of killing a query the final phase (with
    *    the keys spread over all reduce tasks) could still complete. */
  private[plans] def buildHeaps(
      iter: Iterator[InternalRow],
      k: Int,
      partExprs: Seq[Expression],
      orderSpec: Seq[SortOrder],
      childOutput: Seq[Attribute],
      maxBuffered: Long,
      failOnExceed: Boolean = true)
      : scala.collection.mutable.LinkedHashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(partExprs, childOutput)
    val ord = RowOrdering.create(orderSpec, childOutput)
    val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
    val heaps = scala.collection.mutable.LinkedHashMap
      .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
    var buffered = 0L // rows currently held across all heaps
    var exceeded = false
    while (iter.hasNext && !exceeded) {
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
      if (heap.size < k) {
        buffered += 1
        if (buffered > maxBuffered && failOnExceed) {
          throw new IllegalStateException(
            s"TopKPerKeyExec: task buffered > $maxBuffered rows " +
              s"(${heaps.size} keys × k=$k; ${TopKPerKey.maxBufferedRowsKey}). " +
              "Key cardinality is too high for the non-spilling bounded-heap " +
              "operator. Raise the budget, repartition to more tasks, or fall " +
              "back to the spilling sort-based window plan by disabling the " +
              "rewrite (drop GraftExtensions / clear experimental strategies; " +
              s"$twoPhaseKey=false disables only the map-side phase).")
        }
        // in lenient mode the triggering row is still kept (budget may
        // exceed by one row) so no input is lost across the flush
        heap.enqueue(row.copy())
        if (buffered > maxBuffered) exceeded = true
      } else if (ord.compare(row, heap.head) < 0) {
        heap.dequeue(); heap.enqueue(row.copy())
      }
    }
    heaps
  }

  /** The per-task row budget, read on the driver at execution time so
    * tests/users can tune it per-session. */
  private[plans] def maxBufferedRows: Long =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString(maxBufferedRowsKey, defaultMaxBufferedRows.toString).toLong
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
    val maxBuffered = TopKPerKey.maxBufferedRows
    child.execute().mapPartitions { iter =>
      if (kLocal == 0) Iterator.empty
      else {
        val heaps = TopKPerKey.buildHeaps(
          iter, kLocal, partLocal, orderLocal, childOutput, maxBuffered)
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

/** Map-side phase of the two-phase top-k: the SAME bounded heap run on
  * the child's NATIVE partitioning (no required distribution), emitting
  * the ≤ keys × k surviving rows per task — no row number yet, since a
  * key's rows are still scattered across tasks. Placed below the final
  * [[TopKPerKeyExec]] by the strategy; EnsureRequirements inserts the
  * Exchange between them, so the shuffle carries this operator's bounded
  * output instead of the full scored input (for the ANN keys: mappers ×
  * queries × k rows instead of corpus × queries rows).
  *
  * Correct because per-key top-k under the total sort order is
  * decomposable: every row in a key's global top-k is also in that key's
  * top-k within its own task (it faces a subset of the competition), so
  * the union of per-task survivors always contains the global answer.
  * Ties are broken arbitrarily — the same nondeterminism class as
  * `row_number` itself over a non-total order.
  *
  * Budget behavior: unlike the final phase, a map task whose key
  * cardinality exceeds `spark.graft.topk.maxBufferedRowsPerTask` does
  * NOT fail — it flushes the heaps built so far and restarts on the
  * remaining input (chunked flush-and-reset). Each flushed chunk is that
  * chunk's exact per-key top-k, so the union is a superset of the task's
  * top-k, which the final phase reduces — the same contract as a partial
  * aggregate that degrades to pass-through under memory pressure.
  * Heap state therefore stays ≤ budget+1 rows per task REGARDLESS of key
  * cardinality; only the final phase (where a key's rows are
  * consolidated and the budget reflects the answer's own size) fails
  * fast. `numBudgetFlushes` counts the resets for observability.
  */
case class TopKPerKeyPartialExec(
    k: Int,
    partExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // purely local: rows neither move nor change schema
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numBudgetFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "heap flushes on budget exceed"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val partLocal = partExprs
    val orderLocal = orderSpec
    val childOutput = child.output
    val maxBuffered = TopKPerKey.maxBufferedRows
    val numOutputRows = longMetric("numOutputRows")
    val numBudgetFlushes = longMetric("numBudgetFlushes")
    child.execute().mapPartitions { iter =>
      if (kLocal == 0) Iterator.empty
      else {
        // emission order within a key is irrelevant — the final phase
        // re-heaps; project to UnsafeRow for the shuffle writer (safe to
        // reuse the projection buffer: the writer serializes each row
        // before the next is produced)
        val outProj = UnsafeProjection.create(childOutput, childOutput)
        // chunked flush-and-reset: each chunk consumes input until the
        // row budget is hit (or input ends), drains its heaps, and the
        // next chunk starts fresh — bounded memory at ANY key cardinality
        new Iterator[Iterator[InternalRow]] {
          override def hasNext: Boolean = iter.hasNext
          override def next(): Iterator[InternalRow] = {
            val heaps = TopKPerKey.buildHeaps(
              iter, kLocal, partLocal, orderLocal, childOutput, maxBuffered,
              failOnExceed = false)
            if (iter.hasNext) numBudgetFlushes += 1 // ended on budget, not input
            heaps.iterator.flatMap { case (_, heap) =>
              heap.iterator.map { row => numOutputRows += 1; outProj(row) }
            }
          }
        }.flatten
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}
