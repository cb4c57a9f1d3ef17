package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  test("profileNumeric: nulls, cardinality, range, mean — one row per column") {
    val df = Seq(
      (Some(1.0), Some(10.0)),
      (Some(2.0), None),
      (Some(2.0), Some(30.0)),
      (None, Some(30.0))).toDF("a", "b")
    val p = ProfileOps.profileNumeric(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val a = p("a")
    assert(a._2 == 4 && a._3 == 3 && a._4 == 2) // rows, nonnull, distinct
    assert(a._5 == 1.0 && a._6 == 2.0)
    assert(math.abs(a._7 - 5.0 / 3) < 1e-9) // mean over non-null only
    val b = p("b")
    assert(b._2 == 4 && b._3 == 3 && b._4 == 2)
    assert(b._5 == 10.0 && b._6 == 30.0)
    // ordering contract: rows come back sorted by column name
    val names = ProfileOps.profileNumeric(df, Seq("b", "a"))
      .select($"col_name").as[String].collect().toSeq
    assert(names == Seq("a", "b"))
  }

  test("profileNumeric is a single scan (one wide aggregate, no per-column union)") {
    val df = Seq((1.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    val plan = ProfileOps.profileNumeric(df, Seq("x", "y"))
      .queryExecution.optimizedPlan.toString
    // a per-column union would show one Aggregate per column; the
    // single-pass shape has no Union at all
    assert(!plan.contains("Union"), plan)
  }

  test("winsorize clamps to the exact percentile bounds and keeps interior values") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = ProfileOps.winsorize(df, "v", pLo = 0.05, pHi = 0.95)
      .select($"id", $"clipped").as[(Long, Double)].collect().toMap
    // exact percentile of 1..100 at 0.05 = 5.95, at 0.95 = 95.05
    assert(out(1L) == 5.95 && out(3L) == 5.95, s"${out(1L)}")
    assert(out(100L) == 95.05 && out(97L) == 95.05)
    assert(out(50L) == 50.0) // interior untouched
    intercept[IllegalArgumentException] {
      ProfileOps.winsorize(df, "v", pLo = 0.9, pHi = 0.1)
    }
  }
}
