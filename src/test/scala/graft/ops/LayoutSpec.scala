package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey interleaves bits correctly (driver-checked Morton codes)") {
    def morton(bits: Int, xs: Seq[Long]): Long = {
      var out = 0L
      for (b <- 0 until bits; (x, ci) <- xs.zipWithIndex)
        out |= ((x >> b) & 1L) << (b * xs.size + ci)
      out
    }
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zOrderKey(4, $"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == morton(4, Seq(x, y)), s"($x,$y) -> $z")
    }
    // keys are unique over the grid (bijection on the domain)
    assert(got.map(_._3).distinct.length == pts.length)
  }

  test("zOrderKey rejects out-of-domain values in-plan") {
    val e = intercept[Exception] {
      Seq(1024L).toDF("x").select(Layout.zOrderKey(10, $"x")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("outside")), msgs(e).mkString("|"))
    intercept[IllegalArgumentException] { Layout.zOrderKey(32, $"a", $"b") }
  }

  test("z-ordered layout concentrates a second-dimension filter into fewer files") {
    // 64k points on a 256x256 grid; two layouts with the same file count:
    // linear x-sort (perfect for x-filters, useless for y) vs z-order.
    // A narrow y-band then lands in FEWER z-ordered files — the locality
    // that min/max stats pruning turns into skipped I/O at scale.
    val pts = (for (x <- 0 until 256; y <- 0 until 256) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dirX = java.nio.file.Files.createTempDirectory("lay_x").toFile.getAbsolutePath
    val dirZ = java.nio.file.Files.createTempDirectory("lay_z").toFile.getAbsolutePath
    pts.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(dirX)
    Layout.writeZOrdered(pts, dirZ, nFiles = 16, bits = 8, "x", "y")
    def filesTouched(dir: String): Long = spark.read.parquet(dir)
      .filter($"y" >= 100 && $"y" < 108)
      .select(input_file_name()).distinct().count()
    val xTouched = filesTouched(dirX)
    val zTouched = filesTouched(dirZ)
    // x-sorted: the y-band is spread across EVERY file; z-ordered: the
    // band concentrates into a fraction of them
    assert(xTouched == 16, s"x-sorted layout should spread y-matches everywhere, got $xTouched")
    assert(zTouched <= 8, s"z-ordered layout should concentrate y-matches, got $zTouched")
    // identical data either way
    assert(spark.read.parquet(dirZ).count() == 65536)
  }

  test("fileStats reports per-file min/max that predict pruning") {
    val pts = (for (x <- 0 until 128; y <- 0 until 128) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dirZ = java.nio.file.Files.createTempDirectory("lay_fs").toFile.getAbsolutePath
    Layout.writeZOrdered(pts, dirZ, nFiles = 8, bits = 7, "x", "y")
    val stats = Layout.fileStats(spark.read.parquet(dirZ), Seq("x", "y"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 8)
    assert(stats.map(_._3).sum == 128L * 128L)
    stats.foreach { case (_, _, _, xmin, xmax, ymin, ymax) =>
      assert(xmin <= xmax && ymin <= ymax)
    }
    // the stats must agree with actual pruning, in the only direction
    // min/max can promise: every file that yields a row for y in
    // [100, 108) must be one whose stats-range overlaps the predicate
    // (ranges are conservative — an overlapping file may still hold no
    // matching rows, so equality would over-claim)
    val overlapping = stats.collect { case (_, f, _, _, _, ymin, ymax)
      if ymax >= 100 && ymin < 108 => f }.toSet
    val yielding = spark.read.parquet(dirZ)
      .filter($"y" >= 100 && $"y" < 108)
      .select(input_file_name()).distinct().as[String].collect()
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(yielding.subsetOf(overlapping),
      s"files with matching rows $yielding must all be stats-overlapping $overlapping")
    assert(overlapping.size < 8, "z-ordered layout should make some files prunable on y")
  }

  test("writeRecordCapped: no file exceeds the record cap; content round-trips") {
    val pts = (1L to 5000L).map(i => (i, i * 2)).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("lay_cap").toFile.getAbsolutePath
    Layout.writeRecordCapped(pts.repartition(2), dir, maxRecordsPerFile = 700L)
    val stats = Layout.fileStats(spark.read.parquet(dir), Seq("a"))
      .select($"n_rows").as[Long].collect()
    assert(stats.forall(_ <= 700L), stats.mkString(","))
    assert(stats.sum == 5000L)
    assert(stats.length >= 8) // 2 tasks × ceil(2500/700) = 8 files
    intercept[IllegalArgumentException] {
      Layout.writeRecordCapped(pts, dir, 0L)
    }
  }

  test("writeRangeClustered: leading-column file ranges are pairwise disjoint") {
    val pts = (1L to 20000L).map(i => ((i * 7919L) % 10007L, i)).toDF("k", "id")
    val dir = java.nio.file.Files.createTempDirectory("lay_rc").toFile.getAbsolutePath
    Layout.writeRangeClustered(pts, dir, nFiles = 8, "k", "id")
    val stats = Layout.fileStats(spark.read.parquet(dir), Seq("k"))
      .as[(String, String, Long, Long, Long)].collect()
      .sortBy(_._4) // by k_min
    assert(stats.length == 8)
    assert(stats.map(_._3).sum == 20000L)
    // range partitioning is on the (k, id) tuple, so a duplicated k may
    // sit exactly on a file boundary — but never INSIDE two files'
    // ranges: sorted by min, each file starts at or after the previous
    // file's max. A point/range predicate on k touches ≤ 1 file + the
    // boundary neighbour.
    stats.sliding(2).foreach {
      case Array((_, _, _, _, prevMax), (_, _, _, nextMin, _)) =>
        assert(nextMin >= prevMax, s"file ranges overlap: $prevMax vs $nextMin")
      case _ =>
    }
    // size balance: sampled split points keep files within ~3x of even
    val sizes = stats.map(_._3)
    assert(sizes.max <= 3 * (20000L / 8), sizes.mkString(","))
    // content round-trips exactly
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().toSet ==
      pts.as[(Long, Long)].collect().toSet)
  }

  test("compactionPlan: contiguous bins, straddler-bounded, byte-preserving") {
    val df = (1L to 5000L).map(i => (i, s"payload-$i-${"x" * 64}")).toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("lay_cp").toFile.getAbsolutePath
    df.repartition(12).write.mode("overwrite").parquet(dir)
    val target = 16L * 1024
    val plan = Layout.compactionPlan(spark.read.parquet(dir), target)
      .select($"bin", $"n_files", $"bin_bytes", $"max_file_bytes")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(plan.nonEmpty)
    // every file is planned exactly once: bytes and file count add up
    val files = spark.read.parquet(dir)
      .select($"_metadata.file_path", $"_metadata.file_size")
      .distinct().as[(String, Long)].collect()
    assert(plan.map(_._2).sum == files.length)
    assert(plan.map(_._3).sum == files.map(_._2).sum)
    // greedy offset binning: a bin exceeds target by at most its
    // largest (straddling) file
    plan.foreach { case (bin, n, bytes, mx) =>
      assert(n >= 1 && mx <= bytes, s"bin $bin inconsistent")
      assert(bytes <= target + mx, s"bin $bin over budget: $bytes")
    }
    // a target larger than the table collapses the plan to one bin
    val one = Layout.compactionPlan(spark.read.parquet(dir), 1L << 30)
      .as[(String, Long, Long, Long, Long, String, String)].collect()
    assert(one.length == 1 && one.head._3 == files.length)
    // a per-ROW partition column (not constant per file) would enroll
    // one file in several partitions' bins — must fail loud
    val e = intercept[Exception] {
      Layout.compactionPlan(spark.read.parquet(dir), target,
        partitionCol = Some($"id" % 2)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("compactionPlan"),
      s"unexpected: ${e.getMessage}")
    // while a file-constant partition column (from the path) still plans
    val byPart = Layout.compactionPlan(spark.read.parquet(dir), target,
      partitionCol = Some($"_metadata.file_name"))
    assert(byPart.count() == files.length) // one bin per (tiny) file
  }

  test("compactionApply executes the plan: one file per bin, content preserved") {
    val df = (1L to 5000L).map(i => (i, s"payload-$i-${"x" * 64}")).toDF("id", "s")
    val src = java.nio.file.Files.createTempDirectory("lay_ca_src").toFile.getAbsolutePath
    val out = java.nio.file.Files.createTempDirectory("lay_ca_out").toFile.getAbsolutePath
    df.repartition(12).write.mode("overwrite").parquet(src)
    val target = 16L * 1024
    val plan = Layout.compactionPlan(spark.read.parquet(src), target)
      .select($"bin", $"n_files", $"bin_bytes")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val census = Layout.compactionApply(spark, src, out, target)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // census matches the plan bin-for-bin: same bins, same member
    // counts, same planned bytes, exactly one output file each
    assert(census.map(c => (c._1, c._2, c._3)).toSeq ==
      plan.map(p => (p._1, p._2, p._3)).toSeq,
      s"census diverged from plan:\n${census.mkString("\n")}\nvs\n${plan.mkString("\n")}")
    assert(census.forall(_._4 == 1L), "a bin rewrote to more than one file")
    // the compacted table re-reads with bin as a partition column and
    // preserves content exactly
    val back = spark.read.parquet(out)
    assert(back.columns.contains("bin"))
    assert(back.select($"id", $"s").as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
    // per-bin file census on disk: one parquet file per bin dir
    val binDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bin="))
    assert(binDirs.length == plan.length)
    binDirs.foreach { b =>
      val parts = b.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${b.getName}: ${parts.length} files")
    }
  }
}
