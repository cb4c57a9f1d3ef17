package graft

/** Run-to-run determinism gate over EVERY `Catalog.queries` key
  * (SURVEY.md §5.1's "same bytes on any cluster layout" rule, enforced
  * end-to-end): each key executes TWICE in the same session and the
  * full collected results must be identical — values, row order,
  * row count.
  *
  * Why this is not redundant with the oracle gate: the driver compares
  * ONE Spark run against DuckDB, so a key that is nondeterministic
  * across runs (unordered limit, raw double accumulation, arbitrary
  * tie-breaks, iteration over an unordered map) can pass a lucky
  * driver round and fail the next — the class this spec pins down
  * locally. Rows-only keys (sketch bytes, file layouts) are covered
  * too: their row counts AND values must be stable or the driver's
  * rows-only record flaps.
  *
  * Binary columns (sketches) are compared by java.util.Arrays semantics
  * via a hex projection — Row.equals on Array[Byte] is reference
  * equality, which would trivially pass nothing or fail everything.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Columns DECLARED unstable, with the reason. This list is the
    * exhaustive inventory of accepted run-to-run wobble — additions
    * need the same justification, and the key's checked-bound columns
    * must stay OUT of it (they are what the driver's rows-only tier
    * actually leans on).
    *
    * - agg_kll_merge.est_p50: DataSketches KLL compaction draws a
    *   random offset per compaction (the algorithm's randomized-rank
    *   guarantee — Karnin et al. §2), so the estimate legitimately
    *   moves within its rank-error band between runs. The band check
    *   (lo_q47 ≤ est ≤ hi_q53 → within_bound) is the stable contract.
    */
  private val unstableCols: Map[String, Set[String]] = Map(
    "agg_kll_merge" -> Set("est_p50"),
    // LongsSketch purging is deterministic in content+order but the
    // shuffle-merge ORDER isn't; purging doesn't engage at this spec's
    // sf0.001 (exact mode — these columns would pass strict compare
    // here), but it does at the driver's sf0.01, so the columns are
    // declared rather than accidentally-green. The stable contract is
    // the row COUNT (top-10 membership: ~6k-count hot keys vs a ≤59
    // error bound) and within_bound — both asserted.
    "agg_freq_topk" -> Set("est", "lb", "ub"))

  test("every query key returns identical results on back-to-back runs") {
    import org.apache.spark.sql.functions._
    val keys = graft.queries.Catalog.specs.keys.toSeq.sorted
    assert(keys.size >= 202, s"expected the full catalog, saw ${keys.size}")
    val flaky = keys.flatMap { k =>
      def run(): Seq[String] = {
        val df = graft.queries.Catalog.specs(k).fn(spark, sf)
        val drop = unstableCols.getOrElse(k, Set.empty)
        val kept = df.schema.fields.filterNot(f => drop(f.name))
        val hexed = df.select(kept.map { f =>
          if (f.dataType == org.apache.spark.sql.types.BinaryType)
            hex(col(f.name)).as(f.name)
          else col(f.name)
        }.toSeq: _*)
        hexed.collect().map(_.toString).toSeq
      }
      val a = run()
      val b = run()
      if (a == b) Nil
      else {
        // prefix-equal runs of different length would report index -1;
        // point at the first extra row instead
        val zipDiff = a.zip(b).indexWhere { case (x, y) => x != y }
        val firstDiff = if (zipDiff >= 0) zipDiff else math.min(a.size, b.size)
        Seq(s"$k: run sizes ${a.size}/${b.size}, first diff at row " +
          s"$firstDiff: ${a.lift(firstDiff)} vs ${b.lift(firstDiff)}")
      }
    }
    assert(flaky.isEmpty, flaky.mkString("\n"))
  }
}
