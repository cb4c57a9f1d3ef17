package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One query per operator key (SURVEY.md §2), with the matching DuckDB
  * oracle SQL where the semantics are ANSI-SQL-expressible.
  *
  * Determinism rules (SURVEY.md §5.1, §7.4):
  *  - every query ends in a total order over its output columns;
  *  - no raw double sums/avgs: sums go through an exact DECIMAL
  *    accumulator and are cast back to DOUBLE, so partial-aggregation
  *    order (Spark) vs sequential order (DuckDB) cannot diverge;
  *  - every computed column is cast to an explicit type aliased
  *    identically on both sides.
  */
final case class QuerySpec(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    // Declares that this key's physical plan INTENTIONALLY contains a
    // BroadcastNestedLoopJoin (almost always a 1-row scalar-stats
    // broadcast crossJoin; occasionally a deliberate bounded or
    // compression-path full scan — see the key's own comment). The
    // PlanSpec BNLJ audit derives its allow-set from this marker, so a
    // new scalar-broadcast key declares itself HERE, at the definition
    // site, instead of patching a hand-list in the test.
    allowBnlj: Boolean = false)
