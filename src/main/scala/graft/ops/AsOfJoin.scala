package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — extension operator (SURVEY.md §2.4
  * lists it absent from the reference; time-series analytics want it).
  *
  * Built by composing existing operators (preference (a) of the custom-op
  * ladder): tag both sides, union, and take `last(right, ignoreNulls)`
  * over a (key, ts, side)-ordered running window. One shuffle on the
  * keys, one sort — the same cost envelope as a sort-merge join, with no
  * range-condition row explosion, so it scales to arbitrarily large
  * sides (neither side is broadcast or replicated).
  *
  * Tie semantics: a right row at exactly the left timestamp matches
  * (inclusive, `lts >= rts`) because the right side sorts before the
  * left at equal ts. Right rows should be unique per (keys, ts) —
  * pre-aggregate otherwise.
  */
object AsOfJoin {

  /** For each left row, attach `rightValueCols` from the right row with
    * the greatest `rightTs <= leftTs` within the same `keys` group
    * (left-join semantics: unmatched left rows keep nulls). The matched
    * right timestamp is exposed as `matched_<rightTs>`.
    */
  /** `toleranceSeconds`: maximum allowed staleness of the match. A
    * right row older than `leftTs − tolerance` is NOT a usable match —
    * the whole matched payload (timestamp and values together, never a
    * torn half) degrades to NULL, exactly as if no right row existed.
    * The standard guard for sensor/price lookups where "most recent"
    * must also mean "recent enough". Implemented as a post-window
    * column predicate — the join cost envelope is unchanged. */
  /** `direction` (the pandas merge_asof surface, round 13):
    *  - "backward" (default): greatest rightTs <= leftTs — the
    *    most-recent-match the original operator shipped;
    *  - "forward": smallest rightTs >= leftTs — the next-scheduled
    *    lookup (next maintenance window, next price reset);
    *  - "nearest": whichever of the two is closer in time, ties to the
    *    BACKWARD match (the pandas tie rule). Costs a second window
    *    sort over the same exchange (sides order differently so the
    *    equal-timestamp tie stays inclusive in each direction).
    * `toleranceSeconds` bounds the match distance in every direction
    * (staleness backward, lookahead forward, |delta| for nearest). */
  def asOf(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightValueCols: Seq[String],
      toleranceSeconds: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    toleranceSeconds.foreach(tol => require(tol >= 0,
      s"as-of toleranceSeconds must be >= 0, got $tol"))
    require(Set("backward", "forward", "nearest")(direction),
      s"as-of direction must be backward|forward|nearest, got '$direction'")
    // output columns must be unambiguous: the matched-timestamp alias and
    // the right value columns may not collide with surviving left columns
    val leftPayloadCols = left.columns.filterNot(keys.contains).toSeq
    val emitted = s"matched_$rightTs" +: rightValueCols
    // output = keys ++ left payload ++ emitted: an emitted name equal to
    // ANY surviving left column (key or payload) would duplicate
    val collisions = left.columns.toSeq.intersect(emitted)
    require(collisions.isEmpty,
      s"as-of output name collision on ${collisions.mkString(", ")}: rename " +
        "the left column(s) or the right value column(s) before joining")

    val rPayload = struct(col(rightTs).as(s"matched_$rightTs") +:
      rightValueCols.map(col): _*)
    // a null right timestamp would sort before every real row (asc
    // nulls-first) and become the "most recent" match for early left rows
    // — drop such rows; they carry no usable as-of position. Null KEYS are
    // dropped from the right for the same reason equi-joins drop them:
    // NULL never equals NULL, so a null-key right row can match nothing
    // (Window.partitionBy would otherwise group null with null). Null-key
    // LEFT rows survive with a null match — left-join semantics. (They
    // land in one window partition; a null-key-heavy left side is a skew
    // hazard — pre-filter such rows if they dominate.)
    // foldLeft(lit(true)): an EMPTY key list is the legitimate global
    // (single-series) as-of join — reduce would throw on it
    val rightKeysNonNull = keys.map(col(_).isNotNull)
      .foldLeft(lit(true))(_ && _)
    val r0 = right.filter(col(rightTs).isNotNull && rightKeysNonNull)
      .select(keys.map(col) :+ col(rightTs).as("_ts") :+ rPayload.as("_rpay"): _*)
    val rPayType = r0.schema("_rpay").dataType

    val lPayload = struct(leftPayloadCols.map(col): _*)
    val l0 = left.select(keys.map(col) :+ col(leftTs).as("_ts") :+ lPayload.as("_lpay"): _*)
    val lPayType = l0.schema("_lpay").dataType

    val r = r0.select(keys.map(col) :+ col("_ts") :+ lit(0).as("_side") :+
      col("_rpay") :+ lit(null).cast(lPayType).as("_lpay"): _*)
    val l = l0.select(keys.map(col) :+ col("_ts") :+ lit(1).as("_side") :+
      lit(null).cast(rPayType).as("_rpay") :+ col("_lpay"): _*)

    // BACKWARD window: right (side 0) sorts before left (side 1) at an
    // equal timestamp, so the running last() sees the equal-ts right
    // row — the inclusive rts <= lts match. FORWARD mirrors it: order
    // the SIDE descending so the equal-ts right row lands at-or-after
    // the left row, and take the first() over the following frame —
    // the inclusive rts >= lts match. Both windows share the one key
    // exchange; "nearest" pays both sorts.
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side").desc)
      .rowsBetween(0, Window.unboundedFollowing)
    val union = r.unionByName(l)
    val withMatches = direction match {
      case "backward" =>
        union.withColumn("_mb", last(col("_rpay"), ignoreNulls = true).over(wB))
      case "forward" =>
        union.withColumn("_mf", first(col("_rpay"), ignoreNulls = true).over(wF))
      case "nearest" =>
        union
          .withColumn("_mb", last(col("_rpay"), ignoreNulls = true).over(wB))
          .withColumn("_mf", first(col("_rpay"), ignoreNulls = true).over(wF))
    }
    val onLeft = withMatches.filter(col("_side") === 1)
    // NULL match: the comparison is NULL → when() falls through to
    // the NULL branch, which is already the unmatched state.
    // Timestamp SUBTRACTION (→ day-time interval), not unix_micros:
    // unix_micros rejects TIMESTAMP_NTZ, and the tolerance-less
    // path accepts NTZ — the two paths must take the same inputs.
    // NUMERIC order columns (epoch seconds, sequence numbers) are
    // also accepted by the tolerance-less path, so they must work
    // here too: plain subtraction, tolerance in the column's own
    // units — not a raw Catalyst type-mismatch on the interval.
    def boundByTol(df: DataFrame, c: String, forwardDelta: Boolean): DataFrame =
      toleranceSeconds match {
        case None => df
        case Some(tol) =>
          val ts = col(c).getField(s"matched_$rightTs")
          val delta = if (forwardDelta) ts - col("_ts") else col("_ts") - ts
          val within = l0.schema("_ts").dataType match {
            case _: org.apache.spark.sql.types.NumericType => delta <= lit(tol)
            case _ => delta <= expr(s"INTERVAL '$tol' SECOND")
          }
          df.withColumn(c, when(within, col(c)))
      }
    val matched = direction match {
      case "backward" =>
        boundByTol(onLeft, "_mb", forwardDelta = false)
          .withColumn("_match", col("_mb"))
      case "forward" =>
        boundByTol(onLeft, "_mf", forwardDelta = true)
          .withColumn("_match", col("_mf"))
      case "nearest" =>
        val bounded = boundByTol(
          boundByTol(onLeft, "_mb", forwardDelta = false),
          "_mf", forwardDelta = true)
        val bts = col("_mb").getField(s"matched_$rightTs")
        val fts = col("_mf").getField(s"matched_$rightTs")
        // ties go BACKWARD (the pandas rule): strict < on the forward
        // distance; both-null stays null via the final otherwise
        bounded.withColumn("_match",
          when(col("_mb").isNull, col("_mf"))
            .when(col("_mf").isNull, col("_mb"))
            .when(fts - col("_ts") < col("_ts") - bts, col("_mf"))
            .otherwise(col("_mb")))
    }

    val outCols =
      keys.map(col) ++
        leftPayloadCols.map(c => col(s"_lpay.$c").as(c)) ++
        (s"matched_$rightTs" +: rightValueCols).map(c => col(s"_match.$c").as(c))
    matched.select(outCols: _*)
  }
}
