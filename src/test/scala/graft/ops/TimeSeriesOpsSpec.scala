package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleOhlc: hand-computed buckets; duplicate timestamps resolved by orderCol") {
    val df = Seq(
      // key a, hour 10: open=1.0 (id 1), close=4.0 (id 4); ids 2,3 share a ts
      ("a", ts("2024-01-01 10:05:00"), 1.0, 1L),
      ("a", ts("2024-01-01 10:20:00"), 9.0, 2L),
      ("a", ts("2024-01-01 10:20:00"), 0.5, 3L),
      ("a", ts("2024-01-01 10:59:59"), 4.0, 4L),
      // key a, hour 11: single row — open=close=high=low
      ("a", ts("2024-01-01 11:01:00"), 7.0, 5L),
      // key b, hour 10
      ("b", ts("2024-01-01 10:30:00"), 2.0, 6L),
      ("b", ts("2024-01-01 10:45:00"), 3.0, 7L))
      .toDF("k", "t", "v", "id")
    val got = TimeSeriesOps.resampleOhlc(df, "k", "t", "v", "id", "hour")
      .orderBy($"k", $"bucket")
      .as[(String, Timestamp, Double, Double, Double, Double, Double, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("a", ts("2024-01-01 10:00:00"), 1.0, 9.0, 0.5, 4.0, 14.5 / 4.0, 4L),
      ("a", ts("2024-01-01 11:00:00"), 7.0, 7.0, 7.0, 7.0, 7.0, 1L),
      ("b", ts("2024-01-01 10:00:00"), 2.0, 3.0, 2.0, 3.0, 2.5, 2L)))
  }

  test("resampleOhlc: one aggregation exchange, no join, no window") {
    val df = Seq(("a", ts("2024-01-01 10:05:00"), 1.0, 1L))
      .toDF("k", "t", "v", "id")
    val plan = TimeSeriesOps.resampleOhlc(df, "k", "t", "v", "id")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join") && !plan.contains("Window"), plan.take(2000))
  }
}
