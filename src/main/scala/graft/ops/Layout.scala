package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering (north-star extension): Z-order (Morton)
  * interleaving for multi-dimensional locality. A table sorted on one
  * column prunes scans only for filters on THAT column; interleaving
  * the bits of several columns into one sort key gives every dimension
  * partial locality, so parquet min/max stats prune files and row
  * groups for filters on ANY of the clustered columns — the standard
  * layout lever for 100 TB fact tables queried along several axes.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of each
    * column — bit b of column c lands at position b·k + c (k = number
    * of columns). Inputs must be non-negative and < 2^bits (normalize
    * or bucket first: e.g. `width_bucket`, day numbers, dictionary
    * codes); values outside the domain fail in-plan rather than
    * silently aliasing distant points onto nearby keys.
    *
    * Pure column expressions (shift/mask/or — whole-stage codegen'd,
    * constant-folded across the `bits` unrolled terms). */
  def zOrderKey(bits: Int, cols: Column*): Column = {
    val k = cols.size
    require(k >= 1, "zOrderKey needs at least one column")
    require(bits >= 1 && bits * k <= 63,
      s"bits ($bits) × columns ($k) must fit a positive Long (≤ 63 bits)")
    val bound = 1L << bits
    val guarded = cols.map { c =>
      val lc = c.cast("long")
      when(lc.isNull || lc < 0L || lc >= bound,
        raise_error(concat(
          lit(s"zOrderKey: value "),
          // concat null-propagates — a bare lc would erase the whole
          // diagnostic exactly when the offending value is NULL
          coalesce(lc.cast("string"), lit("NULL")),
          lit(s" outside [0, $bound) — normalize/bucket the column first"))))
        .otherwise(lc)
    }
    guarded.zipWithIndex.map { case (c, ci) =>
      (0 until bits).map { b =>
        shiftleft(shiftrightunsigned(c, b).bitwiseAND(lit(1L)), b * k + ci)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet clustered by the Z-order of `clusterCols`:
    * range-partition on the key into `nFiles` files, sort within each,
    * drop the key. Each file then covers a compact hyper-rectangle-ish
    * region of the clustered space, so its min/max column stats are
    * tight on EVERY clustered dimension — the property file/row-group
    * pruning feeds on. */
  def writeZOrdered(
      df: DataFrame, path: String, nFiles: Int, bits: Int,
      clusterCols: String*): Unit = {
    require(nFiles >= 1, "nFiles must be positive")
    val keyed = df.withColumn("_zkey",
      zOrderKey(bits, clusterCols.map(col): _*))
    keyed
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` as parquet linearly clustered on `sortCols`: range-
    * partition into `nFiles` files (sampled split points, so files are
    * size-balanced even under value skew), sort within each, write.
    * The single-axis layout twin of [[writeZOrdered]]: per-file min/max
    * ranges on the LEADING sort column become pairwise disjoint, so a
    * point/range predicate on it prunes all but ~1 file — maximal
    * skipping on one dimension, none on the others (that trade is
    * exactly what [[fileStats]] makes measurable). */
  def writeRangeClustered(
      df: DataFrame, path: String, nFiles: Int, sortCols: String*): Unit = {
    require(nFiles >= 1, "nFiles must be positive")
    require(sortCols.nonEmpty, "writeRangeClustered needs sort columns")
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Parquet write with a per-file record cap (`maxRecordsPerFile`):
    * the writer rolls to a new file mid-task once a file reaches the
    * cap — the file-sizing lever when task partitions are larger than
    * the target file size (the inverse problem of [[Upsert
    * .compactPartitions]]' small files). Caps records, not bytes; pick
    * the cap from the table's measured bytes/row. */
  def writeRecordCapped(
      df: DataFrame, path: String, maxRecordsPerFile: Long): Unit = {
    require(maxRecordsPerFile >= 1,
      s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    df.write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)
  }

  /** Per-FILE skipping stats for a parquet table: (file, n_rows, and
    * min/max of each requested column) — the data-skipping index a
    * lakehouse table format maintains per file, computed here from the
    * hidden `_metadata` column, so layout quality ([[writeZOrdered]] vs
    * linear) is measurable without reading footers driver-side: a file
    * whose [min, max] misses a predicate would be pruned, and the sum
    * of such files over a predicate set is exactly the scan saving.
    *
    * One distributed aggregate, partial-combined per task (each task
    * emits one row per file it touches, regardless of row count);
    * `df` must come straight from a file-based reader (`_metadata` is
    * only defined there — anything post-shuffle has lost file
    * provenance). */
  def fileStats(df: DataFrame, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "fileStats: statCols must be non-empty")
    // group on the FULL path: dynamic-partitioned writes reuse the same
    // part-NNNNN-<uuid> short name across partition directories (one
    // task writes that name into each partition dir it touches), so a
    // file_name grouping silently merges distinct files into one row —
    // wrong min/max/n_rows for exactly the lakehouse-table shape this
    // op measures. The short name rides along as a display column
    // (functionally dependent on the path, so the extra group key is
    // free).
    df.select(col("_metadata.file_path").as("file_path") +:
        col("_metadata.file_name").as("file") +: statCols.map(col): _*)
      .groupBy(col("file_path"), col("file"))
      .agg(count(lit(1)).as("n_rows"),
        statCols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
  }

  /** Small-file compaction plan: group a table's files into contiguous
    * target-size bins — the OPTIMIZE/rewrite planning step every
    * lakehouse table needs once streaming/upsert writers have fragmented
    * it (the small-files problem: at 100 TB, a million 1 MB files cost
    * more in footer reads and task scheduling than the data scan).
    * Greedy offset binning in path order ([[graft.ops.SampleOps
    * .packSequences]]'s window): each bin holds adjacent files until
    * `targetBytes`, overflowing by at most one straddling file — so a
    * bin rewrite touches a contiguous path range, preserving any
    * path-correlated sort/cluster order the table already has.
    *
    * Input grain is METADATA (one row per file via `_metadata`
    * pruned-column scan — no data pages read), so the global pack
    * window is over file COUNT, not rows; `partitionCol` shards the
    * plan per table-partition when even file count is large (bins then
    * never span partitions — exactly what a partition-aware OPTIMIZE
    * wants).
    *
    * Output: one row per planned bin — (bin, n_files, bin_bytes,
    * first_file, last_file). */
  def compactionPlan(df: DataFrame, targetBytes: Long,
      partitionCol: Option[Column] = None): DataFrame =
    compactionFileBins(df, targetBytes, partitionCol)
      .groupBy(col("_part"), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("size_bytes")).as("bin_bytes"),
        max(col("size_bytes")).as("max_file_bytes"),
        min(col("file_path")).as("first_file"),
        max(col("file_path")).as("last_file"))

  /** Per-FILE bin assignment underlying [[compactionPlan]] — exposed so
    * [[compactionApply]] can execute the exact file groups the plan
    * reported (the plan's (first_file, last_file) summary is for the
    * dashboard; the rewrite needs every member). Output: one row per
    * file — (_part, file_path, size_bytes, bin). */
  def compactionFileBins(df: DataFrame, targetBytes: Long,
      partitionCol: Option[Column] = None): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val files = df
      .select(partitionCol.getOrElse(lit("ALL")).as("_part"),
        col("_metadata.file_path").as("file_path"),
        col("_metadata.file_size").as("size_bytes"))
      .groupBy(col("_part"), col("file_path"))
      .agg(max(col("size_bytes")).as("size_bytes"))
      // CONTRACT: partitionCol must be constant per file (a physical
      // partition column). A data column here would enroll one file in
      // several partitions' bins — a rewrite executing that plan would
      // duplicate the file's rows — so it fails LOUD, not silently:
      .withColumn("_nparts",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("file_path"))))
      .withColumn("size_bytes",
        when(col("_nparts") > 1, raise_error(lit(
          "compactionPlan: partitionCol is not constant per file — use " +
            "a physical partition column, or None for a global plan")))
          .otherwise(col("size_bytes")))
      .drop("_nparts")
    SampleOps.packSequences(files, "_part", "file_path", "size_bytes",
      targetBytes)
  }

  /** EXECUTE a [[compactionPlan]] (r16 verdict ask #5 — the OPTIMIZE
    * rewrite step): each planned bin's file group is read back and
    * rewritten as ONE file under `outDir/bin=<k>/`, so the compacted
    * table re-reads with `bin` as an inferred partition column and the
    * post-compaction file census is checkable against the plan.
    *
    * Shape: the bin assignment is computed distributed
    * ([[compactionFileBins]]) and collected at METADATA grain — one
    * slim row per FILE, the [[Upsert.compactPartitions]] driver-walk
    * budget class, never data rows. Each bin then rewrites through one
    * distributed read→coalesce(1)→write job over exactly its member
    * files — sequential job submission here; a production OPTIMIZE
    * submits the same per-bin jobs from a scheduler pool in parallel.
    * Data never collects; at the 100 TB grain each bin job moves
    * ~targetBytes through one task, which is precisely the file size
    * the plan chose.
    *
    * Returns the executed census — one row per bin: (bin, n_files_in,
    * planned_bytes, n_files_out) — after ASSERTING the rewrite matches
    * the plan (every bin directory holds exactly one data file).
    * Content preservation is the caller's oracle check (row count +
    * order-invariant checksum re-derived from the rewritten bytes). */
  def compactionApply(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, outDir: String, targetBytes: Long): DataFrame = {
    val assign = compactionFileBins(spark.read.parquet(srcDir), targetBytes)
      .select(col("bin"), col("file_path"), col("size_bytes"))
      .collect() // file-tuple metadata: one slim row per FILE (budget class above)
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    require(assign.nonEmpty, s"compactionApply: no files under $srcDir")
    val groups = assign.groupBy(_._1).toSeq.sortBy(_._1)
    groups.foreach { case (bin, files) =>
      spark.read.parquet(files.map(_._2).sorted: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/bin=$bin")
    }
    val root = new org.apache.hadoop.fs.Path(outDir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val census = groups.map { case (bin, files) =>
      val out = hfs.listStatus(new org.apache.hadoop.fs.Path(s"$outDir/bin=$bin"))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      require(out.length == 1,
        s"compactionApply: bin $bin rewrote to ${out.length} files, want 1")
      (bin, files.length.toLong, files.map(_._3).sum, out.length.toLong)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      census.map { case (b, nIn, bytes, nOut) =>
        org.apache.spark.sql.Row(b, nIn, bytes, nOut) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files_in",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("planned_bytes",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files_out",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
