package graft
import org.apache.spark.sql.SparkSession

/** Per-key micro-bench: times individual catalog keys over several
  * repetitions so regressions can be separated from run-to-run noise
  * (page cache, JIT) — `graft.Bench` times each key min-of-2 inside one
  * big sweep, which is the wrong tool for investigating a single key.
  *
  * Usage: `runMain graft.KeyBench key1 key2 …` (defaults below). Env:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default 5),
  * SPARK_GRAFT_EXTENSIONS=0 to disable GraftExtensions (isolates the
  * custom expressions + TopKPerKey strategy as a variable).
  */
object KeyBench {
  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args.toSeq else Seq("fn_array_hof", "win_lag_delta")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val useExt = sys.env.getOrElse("SPARK_GRAFT_EXTENSIONS", "1") == "1"
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark =
      (if (useExt) builder.withExtensions(new graft.expressions.GraftExtensions)
       else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      try Tables(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      println(f"""KEYBENCH {"key":"$key","ext":$useExt,"min":${sorted.head}%.3f,"median":${sorted(reps / 2)}%.3f,"all":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
