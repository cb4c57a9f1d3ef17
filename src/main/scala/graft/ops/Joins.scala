package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-adjacent utilities (SURVEY.md §2.2, §2.4). The join types
  * themselves are Spark built-ins (see queries/Catalog.scala); what the
  * reference hand-rolls — and what is easy to get silently wrong — is
  * column-collision handling around a USING-style join.
  */
object Joins {

  /** Rename columns of `right` that collide with `left` beyond the join
    * keys (reference README.md:1429-1440 renames with a `_daily` suffix
    * after computing the collision set from column metadata).
    */
  def renameCollisions(
      left: DataFrame,
      right: DataFrame,
      joinKeys: Seq[String],
      suffix: String): DataFrame = {
    val collide = right.columns.toSet
      .intersect(left.columns.toSet)
      .diff(joinKeys.toSet)
    collide.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + suffix))
  }

  /** Lenient drop — the reference's `drop("date")` semantics
    * (README.md:728, 1416): dropping an absent column is a no-op.
    * (Spark's own `drop` is already lenient; kept as a named op so the
    * semantics are pinned by a test.)
    */
  def dropIfExists(df: DataFrame, cols: String*): DataFrame =
    df.drop(cols: _*)

  /** Skew-salted equi join: when a handful of hot keys dominate `big`,
    * a plain shuffle join puts each hot key on ONE reducer. Salting
    * splits every key into `nSalts` sub-keys — the big side scatters by a
    * deterministic hash of `saltSource` (any high-cardinality column, e.g.
    * a row id), the small side is replicated `nSalts`× via explode — so a
    * hot key's rows spread over `nSalts` reducers. Result is identical to
    * `big.join(small, keys)` (verified in JoinsSpec). AQE's skew-join
    * handles sort-merge skew automatically; explicit salting remains the
    * lever for skewed *aggregations* and for deterministic layout.
    */
  /** Existence flag: annotate every left row with `flagCol` = whether a
    * matching key exists in `other` — the SELECT-list `EXISTS(...)`
    * shape, where semi/anti joins can only FILTER. The right side
    * reduces to its distinct keys before joining (a left outer against
    * raw `other` would duplicate left rows per match), so the join
    * carries keys only — broadcastable whenever the distinct key set
    * is small, however wide or tall `other` is. */
  def withExistsFlag(
      df: DataFrame, other: DataFrame, keys: Seq[String],
      flagCol: String = "exists_match"): DataFrame = {
    require(keys.nonEmpty, "withExistsFlag: keys must be non-empty")
    // equalsIgnoreCase: Spark resolves columns case-insensitively by
    // default, so a case-variant collision would slip an exact-string
    // check and die later as AMBIGUOUS_REFERENCE inside withColumn
    require(!df.columns.exists(_.equalsIgnoreCase(flagCol)),
      s"withExistsFlag: left side already has a '$flagCol' column")
    val marked = other.select(keys.map(col): _*).distinct()
      .withColumn(flagCol, lit(true))
    df.join(marked, keys, "left_outer")
      .withColumn(flagCol, coalesce(col(flagCol), lit(false)))
  }

  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSource: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    // right/full outer would emit unmatched small-side rows once PER SALT
    // (the small side is replicated); only join types whose output is
    // driven by the big side preserve plain-join semantics
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(normalized),
      s"saltedJoin does not preserve '$joinType' semantics (small side is replicated)")
    val bigS = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(nSalts)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    bigS.join(smallS, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Bucketed range (interval) join: left rows whose `pointCol` falls in
    * the right side's `[loCol, hiCol]` (both bounds inclusive, matching
    * SQL BETWEEN). A plain non-equi `join(cond)` plans as
    * BroadcastNestedLoop/Cartesian — O(|L|·|R|) comparisons, the classic
    * scale killer for interval joins. This operator turns it into an
    * EQUI join: points bucket by `floor(point / bucketWidth)`, intervals
    * explode into every bucket they overlap, the join keys on the bucket
    * (plus optional exact `equiKeys`), and the original range predicate
    * runs as a residual filter. Each matching pair meets in EXACTLY one
    * bucket (the point's), so no distinct is needed.
    *
    * Cost: |R| expands by avg interval span / bucketWidth; comparisons
    * drop from |L|·|R| to pairs sharing a bucket. Pick `bucketWidth`
    * near the typical interval span — spans ≫ bucketWidth inflate the
    * explode, spans ≪ bucketWidth inflate the residual filter.
    * Degenerate intervals (null bound or lo > hi) match nothing, as in
    * SQL BETWEEN. An interval spanning more than `maxBucketsPerInterval`
    * buckets fails the job IN-PLAN with a diagnostic instead of silently
    * exploding: one open-ended sentinel row (the SCD-2
    * `valid_to = 9999-12-31` shape) would otherwise fan out into
    * millions of bucket rows per interval — clamp sentinel bounds to the
    * point domain or raise the cap deliberately. All columns must be
    * long-valued (cast dates to days / timestamps to epoch first —
    * exact integer bucketing; double buckets would split on FP
    * rounding).
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long, equiKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // exact floor division, negatives included: subtract the non-negative
    // pmod first, so the double division is over an exact multiple of the
    // width (integral result, exact for any realistic bucket count)
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val l = left.withColumn("_rb", bucketOf(col(pointCol)))
    val loB = bucketOf(col(loCol))
    val hiB = bucketOf(col(hiCol))
    // per-row guard costs nothing on healthy rows (when() short-circuits)
    val guarded = when(hiB - loB + 1 > maxBucketsPerInterval,
      raise_error(concat(
        lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval " +
          s"buckets of width $bucketWidth ([" ), col(loCol), lit(", "),
        col(hiCol),
        lit("]); clamp sentinel/open-ended bounds to the point domain, " +
          "widen bucketWidth, or raise maxBucketsPerInterval"))))
      .otherwise(sequence(loB, hiB))
    val r = right
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("_rb", explode(guarded))
    l.join(r, equiKeys :+ "_rb", "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_rb")
  }

  /** Bucketed interval-OVERLAP join: pairs (l, r) whose closed intervals
    * `[lLo, lHi]` and `[rLo, rHi]` intersect (`lLo <= rHi AND rLo <= lHi`)
    * — the both-sides-are-intervals generalization of [[rangeJoin]]
    * (point-in-interval). Same plan shape: BOTH sides explode into the
    * buckets their interval covers, the join is EQUI on the bucket (plus
    * optional `equiKeys`), and the overlap predicate runs as a residual.
    *
    * De-duplication is positional, not a `distinct`: a pair overlapping
    * in k shared buckets meets k times, but the shared buckets form a
    * contiguous range whose FIRST bucket is
    * `max(bucket(lLo), bucket(rLo))`, so emitting only where the met
    * bucket equals that value yields each pair exactly once — no
    * wide-row shuffle to dedupe, the residual filter does it for free.
    *
    * Column names on the two inputs must be disjoint apart from
    * `equiKeys` (rename upstream; [[renameCollisions]] exists for that).
    * Degenerate intervals (null bound or lo > hi) match nothing. The
    * per-interval bucket-span guard of [[rangeJoin]] applies to both
    * sides. All bound columns must be long-valued.
    */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bucketWidth: Long, equiKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    def explodeSide(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loB = bucketOf(col(lo))
      val hiB = bucketOf(col(hi))
      val guarded = when(hiB - loB + 1 > maxBucketsPerInterval,
        raise_error(concat(
          lit(s"intervalOverlapJoin: interval spans more than " +
            s"$maxBucketsPerInterval buckets of width $bucketWidth (["),
          col(lo), lit(", "), col(hi),
          lit("]); clamp sentinel/open-ended bounds, widen bucketWidth, " +
            "or raise maxBucketsPerInterval"))))
        .otherwise(sequence(loB, hiB))
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
        .withColumn("_ob", explode(guarded))
    }
    val l = explodeSide(left, lLo, lHi)
    val r = explodeSide(right, rLo, rHi)
    l.join(r, equiKeys :+ "_ob", "inner")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        // first-shared-bucket emission: exactly-once per overlapping pair
        col("_ob") === greatest(bucketOf(col(lLo)), bucketOf(col(rLo))))
      .drop("_ob")
  }
}
