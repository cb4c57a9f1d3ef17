package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MERGE semantics (SURVEY.md §2.10).
  *
  * The reference implements "new batch wins" with a hand-written correlated
  * `NOT EXISTS` per affected partition plus a driver loop that rewrites
  * partition directories one by one (README.md:1488-1545). Both collapse to
  * two native Spark constructs:
  *
  *  - `merge` = left_anti on the keys + unionByName — Catalyst plans the
  *    reference's NOT EXISTS to exactly this LeftAnti join anyway
  *    (RewritePredicateSubquery);
  *  - `writePartitioned(overwrite = dynamic)` — dynamic partition overwrite
  *    rewrites only the partitions present in the incoming frame, which is
  *    the reference's whole per-partition loop in one declarative write.
  *
  * Scale notes: the anti join shuffles on the merge keys only; with a small
  * batch AQE converts it to a broadcast anti join, so the target table is
  * never shuffled — the property that matters when `target` is 100 TB and
  * the batch is a day's worth of data.
  */
object Upsert {

  /** New-batch-wins merge: rows of `target` whose key tuple appears in
    * `batch` are replaced by the batch rows. Idempotent by construction:
    * merge(merge(t, b), b) == merge(t, b).
    */
  def merge(target: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge keys must be non-empty")
    val keyOnly = batch.select(keys.map(col): _*).distinct()
    target.join(keyOnly, keys, "left_anti").unionByName(batch)
  }

  /** Partitioned parquet write (reference README.md:747-752). With
    * `dynamicOverwrite` only partitions present in `df` are replaced —
    * the scoped-rewrite semantics of README.md:1532-1534 without the loop.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite,
      dynamicOverwrite: Boolean = true): Unit = {
    val spark = df.sparkSession
    // set-write-restore mutates session conf; serialize writers on the
    // same session so a concurrent restore cannot flip an in-flight
    // Overwrite back to STATIC (which would wipe the whole table)
    spark.synchronized {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode",
        if (dynamicOverwrite) "dynamic" else "static")
      try df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Bucketed managed table (catalog sink): co-locates rows by hash of
    * `bucketCols` at write time, so joins and aggregations keyed on the
    * bucket columns skip their shuffle entirely (asserted in
    * BucketingSpec). At 100 TB this is the difference between re-shuffling
    * the fact table on every join and shuffling it once at load. */
  def writeBucketedTable(
      df: DataFrame, table: String,
      bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Incremental update of a partitioned parquet table on disk: read the
    * target, merge the batch, rewrite only the affected partitions.
    */
  def upsertIntoPath(
      spark: SparkSession,
      targetPath: String,
      batch: DataFrame,
      keys: Seq[String],
      partitionCols: Seq[String]): Unit = {
    val target = spark.read.parquet(targetPath)
    // Only batch rows need writing: surviving target rows stay in their
    // untouched partitions; the anti side tells us nothing new. But rows in
    // *affected* partitions that are NOT superseded must be rewritten too
    // (the partition is replaced wholesale), so restrict the merge to
    // affected partitions before the dynamic overwrite.
    val affected = batch.select(partitionCols.map(col): _*).distinct()
    val targetAffected = target.join(affected, partitionCols, "left_semi")
    val merged = merge(targetAffected, batch, keys)
    writePartitioned(merged, targetPath, partitionCols, SaveMode.Overwrite,
      dynamicOverwrite = true)
  }
}
