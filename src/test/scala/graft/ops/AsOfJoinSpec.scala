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

  test("asOf null keys never match null keys (equi-join NULL semantics)") {
    val left = Seq(
      (Some(1L), 5L, "a"),
      (None: Option[Long], 5L, "b"),   // null key: must get a NULL match
      (None: Option[Long], 9L, "c")).toDF("k", "t", "name")
    val right = Seq(
      (Some(1L), 3L, 100.0),
      (None: Option[Long], 1L, 666.0), // null-key right row: matches nothing
      (None: Option[Long], 8L, 777.0)).toDF("k", "t", "price")

    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("price"))
      .select($"t", $"name", $"price")
      .as[(Long, String, Option[Double])]
      .collect().sortBy(_._2).toSeq
    assert(out == Seq(
      (5L, "a", Some(100.0)),
      (5L, "b", None),
      (9L, "c", None)))
    assert(out.size == 3, "left-join semantics: null-key left rows survive")
  }

  test("asOf rejects output column collisions up front") {
    val left = Seq((1L, 5L, 0.0)).toDF("k", "t", "price") // collides with right value col
    val right = Seq((1L, 3L, 100.0)).toDF("k", "t", "price")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("price"))
    }
    assert(e.getMessage.contains("collision"))
    val left2 = Seq((1L, 5L, "x")).toDF("k", "t", "matched_t") // collides with matched alias
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left2, right, Seq("k"), "t", "t", Seq("price"))
    }
    assert(e2.getMessage.contains("collision"))
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

  test("toleranceSeconds nulls the WHOLE stale match, keeps fresh ones") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"),   // match 30 min old
      (2L, ts("2024-01-01 10:00:00"), "stale"),   // match 2 h old
      (3L, ts("2024-01-01 10:00:00"), "none"))    // no right row at all
      .toDF("k", "lt", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 1.5),
      (2L, ts("2024-01-01 08:00:00"), 2.5))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"),
      toleranceSeconds = Some(3600L))
      .orderBy($"k")
      .as[(Long, Timestamp, String, Option[Timestamp], Option[Double])]
      .collect().toSeq
    assert(out(0)._4 == Some(ts("2024-01-01 09:30:00")) && out(0)._5 == Some(1.5))
    // stale: BOTH matched columns null — never a torn half
    assert(out(1)._4.isEmpty && out(1)._5.isEmpty, s"${out(1)}")
    assert(out(2)._4.isEmpty && out(2)._5.isEmpty)
  }

  test("tolerance 0 keeps only exact-timestamp matches; negative rejected") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:01")))
      .toDF("k", "lt")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7.0),
      (2L, ts("2024-01-01 10:00:00"), 8.0)).toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"),
      toleranceSeconds = Some(0L))
      .orderBy($"k").as[(Long, Timestamp, Option[Timestamp], Option[Double])]
      .collect()
    assert(out(0)._4 == Some(7.0) && out(1)._4.isEmpty, out.mkString(","))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"),
        toleranceSeconds = Some(-1L))
    }
  }

  test("tolerance path accepts TIMESTAMP_NTZ like the tolerance-less path") {
    // the tolerance predicate is interval subtraction, not unix_micros —
    // unix_micros rejects NTZ and would make tolerance a type regression
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 10:00:00")))
      .toDF("k", "lt0")
      .select($"k", $"lt0".cast("timestamp_ntz").as("lt"))
    val right = Seq((1L, ts("2024-01-01 09:30:00"), 5.0))
      .toDF("k", "rt0", "v")
      .select($"k", $"rt0".cast("timestamp_ntz").as("rt"), $"v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"),
      toleranceSeconds = Some(3600L)).select($"v").as[Option[Double]].head()
    assert(out == Some(5.0))
    val stale = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"),
      toleranceSeconds = Some(60L)).select($"v").as[Option[Double]].head()
    assert(stale.isEmpty)
  }

  test("tolerance path accepts NUMERIC order columns (epoch seconds) like the tolerance-less path") {
    // numeric order columns take plain subtraction with the tolerance in
    // the column's own units — not a raw Catalyst interval type mismatch
    val left = Seq((1L, 1000L), (2L, 1000L)).toDF("k", "lt")
    val right = Seq((1L, 940L, 5.0), (2L, 100L, 9.0)).toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"),
      toleranceSeconds = Some(60L))
      .orderBy($"k").select($"v").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(5.0), None), out) // 60 fresh enough, 900 stale
  }
  test("direction=forward picks the next right row at or after each left ts; tolerance bounds lookahead") {
    val left = Seq(
      (1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 12L, "e3"),
      (2L, 7L, "f1")).toDF("k", "t", "name")
    val right = Seq(
      (1L, 3L, 100.0), (1L, 8L, 200.0), (1L, 10L, 300.0),
      (3L, 1L, 999.0)).toDF("k", "t", "price")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("price"),
      direction = "forward")
      .select($"k", $"t", $"name", $"matched_t", $"price")
      .as[(Long, Long, String, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 5L, "e1", Some(8L), Some(200.0)),
      (1L, 10L, "e2", Some(10L), Some(300.0)), // inclusive: equal ts matches
      (1L, 12L, "e3", None, None),             // nothing ahead
      (2L, 7L, "f1", None, None)), out)
    val tol = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("price"),
      toleranceSeconds = Some(2L), direction = "forward")
      .select($"t", $"matched_t")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    // lookahead of 3 (5 -> 8) exceeds tolerance 2; 10 -> 10 stays
    assert(tol == Seq((5L, None), (7L, None), (10L, Some(10L)), (12L, None)), tol)
  }

  test("direction=nearest picks the closer side; exact ties go backward") {
    val left = Seq(
      (1L, 5L, "mid"),    // 3 is 2 back, 8 is 3 ahead -> backward 3
      (1L, 7L, "close"),  // 3 is 4 back, 8 is 1 ahead -> forward 8
      (1L, 2L, "early"),  // nothing back -> forward 3
      (1L, 11L, "late"),  // nothing ahead -> backward 10... (10 exists)
      (1L, 9L, "tie")     // 8 is 1 back, 10 is 1 ahead -> TIE -> backward 8
    ).toDF("k", "t", "name")
    val right = Seq(
      (1L, 3L, 100.0), (1L, 8L, 200.0), (1L, 10L, 300.0)).toDF("k", "t", "price")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("price"),
      direction = "nearest")
      .select($"name", $"matched_t")
      .as[(String, Option[Long])].collect().toMap
    assert(out == Map(
      "mid" -> Some(3L), "close" -> Some(8L), "early" -> Some(3L),
      "late" -> Some(10L), "tie" -> Some(8L)), out)
    // tolerance bounds BOTH directions: at 1, only |delta| <= 1 survives
    val tol = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("price"),
      toleranceSeconds = Some(1L), direction = "nearest")
      .select($"name", $"matched_t")
      .as[(String, Option[Long])].collect().toMap
    assert(tol == Map(
      "mid" -> None, "close" -> Some(8L), "early" -> Some(3L),
      "late" -> Some(10L), "tie" -> Some(8L)), tol)
  }

  test("direction validates; backward default unchanged by the refactor") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(Seq((1L, 1L)).toDF("k", "t"),
        Seq((1L, 1L, 1.0)).toDF("k", "t", "v"),
        Seq("k"), "t", "t", Seq("v"), direction = "sideways")
    }
  }
}
