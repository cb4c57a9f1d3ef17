package graft.ops

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew-stress properties: a zipf fixture (ONE hot key owning 50% of all
  * rows) pushed through the repo's skew levers, asserting BOTH halves of
  * the contract — results equal the unsalted/stock plan, AND the lever
  * actually bounds per-task input (read back from SparkListener task
  * metrics, not inferred from the plan). The earlier salted-join unit
  * checked correctness only; a salt that silently stopped spreading the
  * hot key would have kept passing it.
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  /** Per-stage shuffle-read record counts, one entry per task. */
  private final class TaskReads extends SparkListener {
    val byStage = TrieMap[Int, ArrayBuffer[Long]]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        val buf = byStage.getOrElseUpdate(te.stageId, ArrayBuffer())
        buf.synchronized { buf += m.shuffleReadMetrics.recordsRead }
      }
    }
  }

  /** Run `action` under a fresh listener and return the per-task
    * shuffle-read records of the heaviest (by total read) stage. Polls
    * until the async listener bus drains (no growth for 0.5 s). */
  private def heaviestStageReads(action: => Unit): Seq[Long] = {
    val l = new TaskReads
    spark.sparkContext.addSparkListener(l)
    try {
      action
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (stable < 5 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val n = l.byStage.values.map(_.size).sum
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    val stages = l.byStage.values.map(_.toSeq).toSeq
    assert(stages.nonEmpty, "no task metrics captured")
    stages.maxBy(_.sum)
  }

  private def maxTaskFraction(reads: Seq[Long]): Double = {
    val total = reads.sum.toDouble
    assert(total > 0, s"heaviest stage read nothing: $reads")
    reads.max / total
  }

  // one hot key (0) owns exactly half the rows; the rest spread uniformly
  private def zipfBig(n: Int): DataFrame =
    spark.range(n.toLong).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 999 + 1).as("k"),
      col("id").as("row_id"))

  private def dims: DataFrame =
    spark.range(1000L).select(col("id").as("k"),
      (col("id") * 3).as("v"))

  test("saltedJoin at 50% skew: equal rows AND bounded max-task shuffle read") {
    // AQE would coalesce this small shuffle into one task, and the
    // planner would BROADCAST the 1000-row dim side (leaving nothing
    // shuffled to skew) — disable both so the test measures the
    // shuffle-join distribution salting exists for
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = zipfBig(100000)
      val plain = big.join(dims, Seq("k"))
      val salted = Joins.saltedJoin(big, dims, Seq("k"), col("row_id"), nSalts = 16)

      // result equality vs the unsalted join
      val a = salted.select($"k", $"row_id", $"v").as[(Long, Long, Long)]
        .collect().sorted.toSeq
      val b = plain.select($"k", $"row_id", $"v").as[(Long, Long, Long)]
        .collect().sorted.toSeq
      assert(a == b, s"salted join changed the result (${a.size} vs ${b.size} rows)")

      // the fixture must actually skew the stock plan: the hot key's
      // partition reads the 50% block in one task (sanity of the
      // measurement before trusting the salted bound)
      val plainFrac = maxTaskFraction(heaviestStageReads {
        plain.select(count(lit(1))).collect()
      })
      assert(plainFrac >= 0.40,
        f"unsalted max-task fraction $plainFrac%.2f — fixture is not skewed")

      // the salt must spread that block: 16 sub-keys over 8 partitions
      // leaves the worst partition a few sub-keys, never the whole block
      val saltedFrac = maxTaskFraction(heaviestStageReads {
        salted.select(count(lit(1))).collect()
      })
      assert(saltedFrac <= 0.35,
        f"salted max-task fraction $saltedFrac%.2f — salt no longer bounds task input")
      assert(saltedFrac < plainFrac,
        f"salted ($saltedFrac%.2f) must beat unsalted ($plainFrac%.2f)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("TopKPerKey at 50% skew: equal rows AND the bounded heap caps the shuffle") {
    // dedicated session: the strategy is session-level state (the shared
    // session must keep planning windows the stock way)
    val s2 = graft.SparkSpec.session.newSession()
    graft.plans.TopKPerKey.register(s2)
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val big = s2.range(100000L).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 999 + 1).as("k"),
      col("id").as("row_id"))
    val w = Window.partitionBy(col("k")).orderBy(col("row_id"))
    def ranked(df: DataFrame) =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)

    val viaHeap = ranked(big)
    assert(viaHeap.queryExecution.executedPlan.toString.contains("TopKPerKey "),
      "strategy did not engage")
    val stock = ranked(spark.range(100000L).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 999 + 1).as("k"),
      col("id").as("row_id")))
    val got = viaHeap.select(col("k"), col("row_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val want = stock.select(col("k"), col("row_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(got == want)

    // bound: the map-side partial heap shuffles ≤ maps × keys × k rows —
    // in particular the HOT key contributes ≤ maps × k, not 50k. The
    // stock window shuffles every row (100k); the heap plan's whole
    // shuffle must stay under half that, and the hot task under
    // maps×keys×k/(partitions·2) of it.
    val l = new TaskReads
    s2.sparkContext.addSparkListener(l)
    try {
      viaHeap.select(count(lit(1))).collect()
      // same 30 s deadline as heaviestStageReads: a dropped task-end
      // event on the async listener bus must fail the test, not hang it
      var last = -1; var stable = 0
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (stable < 5 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val n = l.byStage.values.map(_.size).sum
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      assert(stable >= 5, "listener bus did not drain within 30 s")
    } finally s2.sparkContext.removeSparkListener(l)
    val heaviest = l.byStage.values.map(_.toSeq).toSeq.maxBy(_.sum)
    assert(heaviest.sum <= 50000,
      s"bounded-heap shuffle read ${heaviest.sum} rows — partial top-k is not pruning")
  }

  test("connectedComponents on a 50%-hot star graph: exact clusters") {
    // node 0 is an edge endpoint for HALF the node set (the hot-key CC
    // shape); odd nodes are singletons. Closed form: evens cluster to 0,
    // odds to themselves.
    val n = 2000L
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val pairs = spark.range(n).filter(col("id") % 2 === 0 && col("id") > 0)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    val out = DedupOps.connectedComponents(
        nodes, pairs, "doc_id", "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out.size == n)
    (0L until n).foreach { i =>
      val expected = if (i % 2 == 0) 0L else i
      assert(out(i) == expected, s"node $i: got ${out(i)}, want $expected")
    }
  }
}
