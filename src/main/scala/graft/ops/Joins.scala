package graft.ops

import org.apache.spark.sql.DataFrame

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
}
