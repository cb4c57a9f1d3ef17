package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spill-path correctness RUN, not argued — the memory-pressure twin
  * of ExecutorLossSpec: at 100 TB no aggregation or sort fits
  * execution memory, so the engine's external (spilling) paths ARE
  * the hot paths, and a result that silently changes when the hash
  * map tips to disk would be a catastrophic correctness class. This
  * suite runs a real, memory-starved executor JVM
  * (`local-cluster[1,2,640]` with spark.memory.fraction=0.2) and
  * pushes shuffles through it, asserting BOTH halves: exact results
  * AND task-metrics proof that spill actually happened (a run that
  * fit in memory proves nothing — same discipline as the
  * executor-loss suite's removed-executor assert).
  *
  * Own forked JVM via build.sbt testGrouping (one SparkContext per
  * JVM; the same fake-SPARK_HOME scaffolding as ExecutorLossSpec). */
class SpillSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val jdk17Opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  private var spark: SparkSession = _
  private val spilledMem = new AtomicLong(0)
  private val spilledDisk = new AtomicLong(0)

  override def beforeAll(): Unit = {
    val home = java.nio.file.Files.createTempDirectory("graft_spill_home")
    java.nio.file.Files.createSymbolicLink(
      home.resolve("jars"), java.nio.file.Paths.get("/opt/spark/jars"))
    java.nio.file.Files.writeString(home.resolve("RELEASE"), "graft spill test home\n")
    java.nio.file.Files.createDirectories(home.resolve("launcher/target/scala-2.13"))
    sys.props("spark.testing") = "true"
    sys.props("spark.test.home") = home.toString
    spark = SparkSession.builder()
      .master("local-cluster[1,2,640]")
      .appName("graft-spill")
      // the worker offers 640 MiB; the executor must request less than
      // that (the default request is 1 GiB and the launch would abort)
      .config("spark.executor.memory", "512m")
      .config("spark.sql.shuffle.partitions", "4")
      // starve execution memory so modest data MUST take the external
      // (spilling) aggregation/sort paths — the point under test
      .config("spark.memory.fraction", "0.2")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", jdk17Opens)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          spilledMem.addAndGet(m.memoryBytesSpilled)
          spilledDisk.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    })
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (spark.sparkContext.getExecutorMemoryStatus.size < 2 &&
        System.nanoTime() < deadline) Thread.sleep(200)
    assert(spark.sparkContext.getExecutorMemoryStatus.size >= 2,
      "local-cluster executor did not register within 120 s")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Poll the async listener bus until the spill counters move (or a
    * deadline passes), then return the observed total. */
  private def awaitSpill(before: Long): Long = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spilledMem.get() + spilledDisk.get() == before &&
        System.nanoTime() < deadline) Thread.sleep(100)
    spilledMem.get() + spilledDisk.get()
  }

  test("hash aggregation that exceeds execution memory spills and stays exact") {
    val before = spilledMem.get() + spilledDisk.get()
    val n = 12000000L
    val groups = 1000000L
    // 12M rows into 1M groups on a 640 MB executor at memory.fraction
    // 0.2: the per-task hash map cannot hold its partition's groups
    val out = spark.range(n)
      .select((col("id") % groups).as("k"), col("id").as("v"))
      .groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("s")).as("total"),
        min(col("c")).as("min_c"), max(col("c")).as("max_c"))
      .collect().head
    assert(out.getLong(0) == groups)
    assert(out.getLong(1) == n * (n - 1) / 2, "group sums lost rows under spill")
    assert(out.getLong(2) == n / groups && out.getLong(3) == n / groups)
    val after = awaitSpill(before)
    assert(after > before,
      "nothing spilled — the fixture fit in memory and this test proved nothing")
  }

  test("global sort that exceeds execution memory spills and stays exactly ordered") {
    val before = spilledMem.get() + spilledDisk.get()
    val n = 8000000L
    // deterministic shuffle-worthy key: a bijective LCG scramble of id,
    // so the sort really permutes (a pre-sorted input would never spill
    // the sorter) and the expected order is closed-form checkable
    val sorted = spark.range(n)
      .select(((col("id") * 1103515245L + 12345L) % n).as("k"), col("id"))
      .orderBy(col("k"))
    // verify global order without collecting 8M rows: per-partition
    // (first, last, count, isSorted) folds, then the cross-partition
    // boundary monotonicity
    val parts = sorted.select(col("k")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          var first = Long.MinValue; var last = Long.MinValue
          var cnt = 0L; var ok = true; var started = false
          it.foreach { r =>
            val v = r.getLong(0)
            if (!started) { first = v; started = true }
            else if (v < last) ok = false
            last = v; cnt += 1
          }
          Iterator((pid, first, last, cnt, ok))
        }
      }.collect().sortBy(_._1)
    assert(parts.map(_._4).sum == n)
    assert(parts.forall(_._5), "rows out of order INSIDE a partition")
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2,
        s"partition boundary out of order: ${a._3} > ${b._2}")
      case _ => ()
    }
    val after = awaitSpill(before)
    assert(after > before,
      "nothing spilled — the fixture fit in memory and this test proved nothing")
  }
}
