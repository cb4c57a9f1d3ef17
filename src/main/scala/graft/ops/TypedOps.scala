package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed `KeyValueGroupedDataset` surface beyond the Aggregator demo:
  * the cogroup operator — per-key access to BOTH sides' rows at once,
  * for logic a join + aggregate can't express directly (here it can,
  * which is exactly what makes the operator oracle-checkable).
  */
object TypedOps {

  /** One observation from one pipeline: (series key, position, value). */
  case class KeyedValue(key: Long, ord: Long, value: Double)

  /** Per-key reconciliation between two pipelines. `max_abs_delta` is
    * None when the key has no position present on both sides. */
  case class Reconciliation(
      key: Long, n_left: Long, n_right: Long, n_both: Long,
      max_abs_delta: Option[Double])

  /** Dual-pipeline consistency check: cogroup two keyed datasets and
    * emit, per key, both sides' row counts, the count of positions
    * present on both, and the largest absolute value divergence over
    * those shared positions — the "is the rewritten pipeline producing
    * the same numbers" audit, one row per key.
    *
    * Plan shape: CoGroup — each side shuffles ONCE on the key, the
    * function sees both sorted buckets together; no join materializes
    * the (left × right) pairs. Memory: one Map per side per KEY (not
    * per partition), bounded by the key's series length — fine for
    * per-entity series, not for a degenerate all-rows-one-key input
    * (same contract as sessionize's group buffer, documented there).
    *
    * Both sides aggregate to ONE row per key, so the output is
    * key-cardinality-sized regardless of input volume. */
  def cogroupReconcile(
      left: Dataset[KeyedValue], right: Dataset[KeyedValue]): Dataset[Reconciliation] = {
    import left.sparkSession.implicits._
    left.groupByKey(_.key).cogroup(right.groupByKey(_.key)) { (k, ls, rs) =>
      // positions must be unique per (key, side): a silent last-wins
      // collapse would be NONDETERMINISTIC (cogroup iterator order is
      // not a contract) — fail loud instead
      def indexed(it: Iterator[KeyedValue], side: String): Map[Long, Double] = {
        var n = 0L
        val m = Map.newBuilder[Long, Double]
        it.foreach { v => n += 1; m += v.ord -> v.value }
        val built = m.result()
        if (built.size != n) throw new IllegalStateException(
          s"cogroupReconcile: duplicate ord on $side side for key $k — " +
            "positions must be unique per (key, side)")
        built
      }
      val lm = indexed(ls, "left")
      val rm = indexed(rs, "right")
      val shared = lm.keySet.intersect(rm.keySet)
      val maxDelta =
        if (shared.isEmpty) None
        else Some(shared.iterator.map(o => math.abs(lm(o) - rm(o))).max)
      Iterator.single(
        Reconciliation(k, lm.size.toLong, rm.size.toLong,
          shared.size.toLong, maxDelta))
    }
  }
}
