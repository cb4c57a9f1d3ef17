package graft.ops

import graft.SparkSpec
import TypedOps.{KeyedValue, Reconciliation}

class TypedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cogroupReconcile: counts, shared positions, max divergence per key") {
    val left = Seq(
      KeyedValue(1L, 1L, 10.0), KeyedValue(1L, 2L, 20.0), KeyedValue(1L, 3L, 30.0),
      KeyedValue(2L, 1L, 5.0),
      KeyedValue(3L, 1L, 7.0)).toDS()
    val right = Seq(
      KeyedValue(1L, 2L, 20.5), KeyedValue(1L, 3L, 30.0), KeyedValue(1L, 4L, 40.0),
      KeyedValue(2L, 9L, 5.0),                 // no shared position
      KeyedValue(4L, 1L, 1.0)).toDS()          // right-only key
    val got = TypedOps.cogroupReconcile(left, right)
      .collect().sortBy(_.key).toSeq
    assert(got == Seq(
      Reconciliation(1L, 3L, 3L, 2L, Some(0.5)), // ords 2,3 shared; |20.5-20|=0.5
      Reconciliation(2L, 1L, 1L, 0L, None),
      Reconciliation(3L, 1L, 0L, 0L, None),
      Reconciliation(4L, 0L, 1L, 0L, None)))
  }

  test("cogroupReconcile rejects duplicate positions loudly (no silent last-wins)") {
    val dup = Seq(KeyedValue(1L, 1L, 1.0), KeyedValue(1L, 1L, 2.0)).toDS()
    val clean = Seq(KeyedValue(1L, 1L, 1.0)).toDS()
    val e = intercept[Exception] {
      TypedOps.cogroupReconcile(dup, clean).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("duplicate ord")), msgs(e).mkString("|"))
  }

  test("cogroupReconcile plans as CoGroup: one shuffle per side, no pairwise join") {
    val a = Seq(KeyedValue(1L, 1L, 1.0)).toDS()
    val b = Seq(KeyedValue(1L, 1L, 1.0)).toDS()
    val plan = TypedOps.cogroupReconcile(a, b).queryExecution.executedPlan.toString
    assert(plan.contains("CoGroup"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
  }
}
