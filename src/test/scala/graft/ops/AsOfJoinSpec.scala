package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the most recent right row at or before each left ts") {
    val left = Seq(
      (1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 2L, "e0"),
      (2L, 7L, "f1")).toDF("k", "t", "name")
    val right = Seq(
      (1L, 3L, 100.0), (1L, 8L, 200.0), (1L, 10L, 300.0),
      (3L, 1L, 999.0)).toDF("k", "t", "price")

    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("price"))
      .select($"k", $"t", $"name", $"matched_t", $"price")
      .as[(Long, Long, String, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq

    assert(out == Seq(
      (1L, 2L, "e0", None, None),             // before any right row
      (1L, 5L, "e1", Some(3L), Some(100.0)),
      (1L, 10L, "e2", Some(10L), Some(300.0)), // inclusive: equal ts matches
      (2L, 7L, "f1", None, None)))             // key with no right rows
  }

  test("asOf row count always equals the left side (left-join semantics)") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i))
      .toDF("k", "t", "payload")
    val right = (1 to 50).map(_ => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, rnd.nextDouble()))
      .toDF("k", "t", "v")
      .groupBy($"k", $"t").agg(org.apache.spark.sql.functions.min($"v").as("v"))
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() == 200)
    // every match is at or before the left ts (matched_t <= t)
    assert(out.filter($"matched_t" > $"t").count() == 0)
  }
}
