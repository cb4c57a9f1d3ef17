package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom planner strategy must be invisible semantically: identical
  * results to the sort-based window plan on every shape it rewrites. */
class TopKPerKeySpec extends AnyFunSuite {

  // a dedicated session: the strategy is session-level state and the
  // shared test session must keep planning windows the stock way
  private lazy val spark: SparkSession = {
    val s = graft.SparkSpec.session.newSession()
    TopKPerKey.register(s)
    s
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rn <= k rewrites to TopKPerKeyExec and matches the window result") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000)
      .map(i => (s"g${rnd.nextInt(20)}", rnd.nextInt(1000), i))
      .toDF("g", "v", "id")
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val topk = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)

    assert(planOf(topk).contains("TopKPerKey "), planOf(topk))
    assert(!planOf(topk).contains("Window ["), "window exec should be replaced")

    // equivalence oracle: compute expected top-5 per key on the driver
    val rows = df.as[(String, Int, Int)].collect()
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(5).zipWithIndex
        .map { case ((_, v, id), i) => (g, v, id, i + 1) }.toSeq
    }.toSet
    val got = topk.select($"g", $"v", $"id", $"rn")
      .as[(String, Int, Int, Int)].collect().toSet
    assert(got == expected)
  }

  test("rn === 1 (keep-one dedup shape) rewrites and keeps the right winner") {
    import spark.implicits._
    val df = Seq(
      ("a", 3, 100), ("a", 1, 101), ("a", 2, 102),
      ("b", 9, 200), ("b", 9, 201))
      .toDF("k", "v", "id")
    val w = Window.partitionBy($"k").orderBy($"v", $"id")
    val one = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(planOf(one).contains("TopKPerKey "), planOf(one))
    val got = one.select($"k", $"v", $"id").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("a", 1, 101), ("b", 9, 200)))
  }

  test("null grouping keys form one group, exactly like the window form") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 1, 1), (None: Option[String], 5, 2),
      (None: Option[String], 3, 3), (None: Option[String], 4, 4))
      .toDF("k", "v", "id")
    val w = Window.partitionBy($"k").orderBy($"v", $"id")
    val top2 = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(planOf(top2).contains("TopKPerKey "), planOf(top2))
    val got = top2.select($"k", $"v", $"rn").as[(Option[String], Int, Int)]
      .collect().toSet
    // window semantics: nulls group together → null group keeps v=3,4
    assert(got == Set((Some("a"), 1, 1), (None, 3, 1), (None, 4, 2)))
  }

  test("two-phase: the Exchange input is the partial operator's bounded output") {
    // a no-AQE session so the physical tree is inspectable directly
    val s2 = graft.SparkSpec.session.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    TopKPerKey.register(s2)
    import s2.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000)
      .map(i => (s"g${rnd.nextInt(20)}", rnd.nextInt(1000), i))
      .toDF("g", "v", "id").repartition(8)
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val topk = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)

    val plan = topk.queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val partialFed = exchanges.filter(_.child.isInstanceOf[TopKPerKeyPartialExec])
    assert(partialFed.nonEmpty,
      s"expected Exchange fed by TopKPerKeyPartialExec:\n$plan")
    val partial = partialFed.head.child.asInstanceOf[TopKPerKeyPartialExec]

    // collect() runs THIS queryExecution (count() would build a new one
    // whose partial node carries its own metric)
    assert(topk.collect().length == 20 * 5)
    // boundedness: each of the 8 map tasks emits ≤ 20 keys × k=5 rows,
    // so the shuffle moves ≤ 800 rows instead of the 5000 scored rows
    val emitted = partial.metrics("numOutputRows").value
    assert(emitted > 0 && emitted <= 8L * 20 * 5, s"partial emitted $emitted")

    // single-phase fallback conf: no partial operator in the plan
    s2.conf.set(TopKPerKey.twoPhaseKey, "false")
    try {
      val single = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      val sPlan = single.queryExecution.executedPlan
      assert(sPlan.collect { case p: TopKPerKeyPartialExec => p }.isEmpty)
      assert(single.count() == 20 * 5)
    } finally s2.conf.unset(TopKPerKey.twoPhaseKey)
  }

  test("non-rewritable shapes fall back to the window plan") {
    import spark.implicits._
    val df = Seq(("a", 1, 1), ("a", 2, 2)).toDF("k", "v", "id")
    val w = Window.partitionBy($"k").orderBy($"v")
    // rank() is not row_number: no rewrite
    val ranked = df.withColumn("rn", rank().over(w)).filter($"rn" <= 1)
    assert(!planOf(ranked).contains("TopKPerKey "))
    // conjunct with another predicate: no rewrite
    val conj = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 1 && $"v" > 0)
    assert(!planOf(conj).contains("TopKPerKey "))
    // k beyond maxK: no rewrite
    val big = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 100000)
    assert(!planOf(big).contains("TopKPerKey "))
    // results still correct on the fallback paths
    assert(ranked.count() == 1 && conj.count() == 1 && big.count() == 2)
  }

  test("empty input and k larger than group size behave like the window form") {
    import spark.implicits._
    val empty = Seq.empty[(String, Int, Int)].toDF("k", "v", "id")
    val w = Window.partitionBy($"k").orderBy($"v")
    assert(empty.withColumn("rn", row_number().over(w)).filter($"rn" <= 3).count() == 0)
    val small = Seq(("a", 1, 1), ("a", 2, 2)).toDF("k", "v", "id")
    val got = small.withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select($"k", $"v", $"rn").as[(String, Int, Int)].collect().toSet
    assert(got == Set(("a", 1, 1), ("a", 2, 2)))
  }

  test("partial phase flushes on budget exceed and the query still completes") {
    // a no-AQE session so the partial node's metrics are inspectable
    val s2 = graft.SparkSpec.session.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    TopKPerKey.register(s2)
    import s2.implicits._
    // cardinality bomb for the MAP side: every row its own key, and only
    // 2 map partitions, so each map task buffers ~5000 rows if unguarded
    // while the reduce side (8 shuffle partitions) sees only ~1250 rows
    // per task. Budget 2000 sits between the two demands — exactly the
    // shape the round-7 fail-fast partial would have killed even though
    // the final phase could finish.
    val highCard = (1 to 10000).map(i => (i, i % 7, i)).toDF("k", "v", "id")
      .repartition(2)
    val w = Window.partitionBy($"k").orderBy($"v", $"id")
    val topk = highCard.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)

    val plan = topk.queryExecution.executedPlan
    val partial = plan.collect { case p: TopKPerKeyPartialExec => p }
    assert(partial.nonEmpty, s"expected TopKPerKeyPartialExec:\n$plan")

    s2.conf.set(TopKPerKey.maxBufferedRowsKey, "2000")
    try {
      // collect() on topk ITSELF — select() would build a new
      // QueryExecution whose partial node carries its own metrics.
      // One row per key → rn = 1 everywhere.
      val got = topk.collect()
      assert(got.length == 10000)
      assert(got.forall(_.getAs[Int]("rn") == 1))
      assert(partial.head.metrics("numBudgetFlushes").value > 0,
        "budget flush path must have fired")
      // flush-and-reset keeps memory bounded but never drops input: the
      // union of chunk top-k's is a superset, deduped by the final phase
      val emitted = partial.head.metrics("numOutputRows").value
      assert(emitted == 10000, s"every singleton key must survive, got $emitted")
    } finally s2.conf.unset(TopKPerKey.maxBufferedRowsKey)
  }

  test("pathological key cardinality fails fast with a diagnostic, not an OOM") {
    import spark.implicits._
    // every row its own key: the heap map would hold one entry per row.
    // Under a constrained budget the task must raise the named guard
    // (pointing at the window fallback) instead of growing unbounded.
    val highCard = (1 to 10000).map(i => (i, i % 7, i)).toDF("k", "v", "id")
    val w = Window.partitionBy($"k").orderBy($"v", $"id")
    val topk = highCard.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(planOf(topk).contains("TopKPerKey "), planOf(topk))
    spark.conf.set(TopKPerKey.maxBufferedRowsKey, "100")
    try {
      val e = intercept[org.apache.spark.SparkException] { topk.count() }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains(TopKPerKey.maxBufferedRowsKey), msg)
      assert(msg.contains("window"), "diagnostic must name the fallback")
    } finally spark.conf.unset(TopKPerKey.maxBufferedRowsKey)
    // with the default budget the same query completes
    assert(topk.count() == 10000)
  }

  test("the ENTIRE oracle suite stays green with the strategy active") {
    // the strongest semantic claim: every query key (including win_rank,
    // dedup_exact, all top-k similarity keys — the rewritten shapes)
    // produces rows under the rewriting session; bit-exactness vs the
    // stock plans is covered by the driver's hash gate, which runs
    // Verify — whose session can enable the same extensions. Here: every
    // key plans and executes without error and row counts match the
    // stock session's.
    val sf = "/root/testdata/sf0.001"
    val stock = graft.SparkSpec.session
    val mismatches = graft.queries.Catalog.specs.toSeq.sortBy(_._1).flatMap {
      case (name, spec) =>
        val a = spec.fn(spark, sf).count()
        val b = spec.fn(stock, sf).count()
        if (a != b) Seq(s"$name: rewritten=$a stock=$b") else Nil
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }
}
