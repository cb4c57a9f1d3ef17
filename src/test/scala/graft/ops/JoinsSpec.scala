package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("renameCollisions suffixes shared non-key columns only") {
    val l = Seq((1, "x", "tz1")).toDF("k", "a", "timezone")
    val r = Seq((1, "y", "tz2")).toDF("k", "b", "timezone")
    val renamed = Joins.renameCollisions(l, r, Seq("k"), "_vc")
    assert(renamed.columns.toSet == Set("k", "b", "timezone_vc"))
  }

  test("saltedJoin returns exactly the rows of the plain join under skew") {
    val rnd = new scala.util.Random(11)
    // 90% of the big side lands on one hot key — the salting target
    val big = (1 to 2000).map { i =>
      val k = if (rnd.nextInt(10) < 9) 1 else 1 + rnd.nextInt(50)
      (k, i.toLong)
    }.toDF("k", "row_id")
    val small = (1 to 50).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select($"k", $"row_id", $"name")
      .as[(Int, Long, String)].collect().toSet
    val salted = Joins.saltedJoin(big, small, Seq("k"), $"row_id", nSalts = 8)
      .select($"k", $"row_id", $"name")
      .as[(Int, Long, String)].collect().toSet
    assert(salted == plain)
    // and the salt really fans the hot key out across sub-keys
    val saltSpread = big.filter($"k" === 1)
      .select(pmod(xxhash64($"row_id"), lit(8)).cast("int").as("s"))
      .distinct().count()
    assert(saltSpread == 8)
  }

  test("saltedJoin rejects join types it cannot preserve") {
    val big = Seq((1, 10L)).toDF("k", "row_id")
    val small = Seq((1, "a")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(big, small, Seq("k"), $"row_id", 4, "full")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(big, small, Seq("k"), $"row_id", 4, "right_outer")
    }
  }

  test("saltedJoin preserves left-join semantics for unmatched rows") {
    val big = Seq((1, 10L), (2, 20L), (99, 30L)).toDF("k", "row_id")
    val small = Seq((1, "a"), (2, "b")).toDF("k", "name")
    val out = Joins.saltedJoin(big, small, Seq("k"), $"row_id", 4, "left")
      .select($"k", $"row_id", $"name").as[(Int, Long, Option[String])]
      .collect().toSet
    assert(out == Set((1, 10L, Some("a")), (2, 20L, Some("b")), (99, 30L, None)))
  }

  test("rangeJoin equals the naive non-equi join, including negatives and boundaries") {
    val rnd = new scala.util.Random(11)
    // points and intervals straddle zero; spans vary 0..40 around a
    // bucketWidth of 16 so pairs land in first/middle/last overlap buckets
    val points = (1 to 500)
      .map(i => (i.toLong, rnd.nextLong(2001) - 1000L)).toDF("pid", "p")
    val ivals = (1 to 80).map { i =>
      val lo = rnd.nextLong(2001) - 1000L
      (i.toLong, lo, lo + rnd.nextLong(41))
    }.toDF("iid", "lo", "hi")
    val bucketed = Joins.rangeJoin(points, ivals, "p", "lo", "hi", bucketWidth = 16)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivals, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
    // boundary inclusivity pinned explicitly (BETWEEN semantics)
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "p")
    val iv = Seq((7L, 10L, 20L)).toDF("iid", "lo", "hi")
    val hits = Joins.rangeJoin(pts, iv, "p", "lo", "hi", bucketWidth = 4)
      .select($"pid").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
  }

  test("rangeJoin: degenerate/null intervals match nothing; equiKeys restrict pairs") {
    val points = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("pid", "k", "p")
    val ivals = Seq(
      (10L, "a", Some(0L), Some(9L)),   // valid, matches k=a only
      (11L, "b", Some(9L), Some(0L)),   // lo > hi: empty, as in SQL BETWEEN
      (12L, "b", None, Some(9L)))       // null bound: no match
      .toDF("iid", "k", "lo", "hi")
    val out = Joins.rangeJoin(points, ivals, "p", "lo", "hi",
      bucketWidth = 4, equiKeys = Seq("k"))
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("rangeJoin fails fast on sentinel intervals instead of exploding") {
    // the SCD-2 shape: one open-ended interval would fan into millions
    // of bucket rows — the in-plan guard must raise with a diagnostic
    val points = Seq((1L, 100L)).toDF("pid", "p")
    val sentinel = Seq((1L, 0L, 253402300800L)).toDF("iid", "lo", "hi") // year 9999 epoch-secs
    val e = intercept[Exception] {
      Joins.rangeJoin(points, sentinel, "p", "lo", "hi", bucketWidth = 3600).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxBucketsPerInterval")), msgs(e).mkString("|"))
    // the fix the diagnostic suggests — a bucketWidth matched to the
    // span — admits the same interval under the default cap
    val ok = Joins.rangeJoin(points, sentinel, "p", "lo", "hi",
      bucketWidth = 100000000L)
    assert(ok.count() == 1)
  }

  test("rangeJoin plans as an equi join: no nested-loop or cartesian operator") {
    val points = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("pid", "p")
    val ivals = (1 to 10).map(i => (i.toLong, i * 10L, i * 10L + 5L)).toDF("iid", "lo", "hi")
    val plan = Joins.rangeJoin(points, ivals, "p", "lo", "hi", bucketWidth = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("intervalOverlapJoin equals the naive overlap join; each pair exactly once") {
    val rnd = new scala.util.Random(17)
    // spans 0..40 around bucketWidth 16: pairs share 1..4 buckets, so the
    // exactly-once check exercises the first-shared-bucket dedup for real
    val a = (1 to 200).map { i =>
      val lo = rnd.nextLong(2001) - 1000L
      (i.toLong, lo, lo + rnd.nextLong(41))
    }.toDF("aid", "a_lo", "a_hi")
    val b = (1 to 150).map { i =>
      val lo = rnd.nextLong(2001) - 1000L
      (i.toLong, lo, lo + rnd.nextLong(41))
    }.toDF("bid", "b_lo", "b_hi")
    val bucketed = Joins.intervalOverlapJoin(a, b,
      "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 16)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSeq
    val naive = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(bucketed.toSet == naive)
    assert(bucketed.size == naive.size, "a pair was emitted more than once")
    assert(naive.nonEmpty)
    // touching endpoints overlap (closed intervals); disjoint don't
    val x = Seq((1L, 0L, 10L)).toDF("aid", "a_lo", "a_hi")
    val y = Seq((1L, 10L, 20L), (2L, 11L, 20L)).toDF("bid", "b_lo", "b_hi")
    val touch = Joins.intervalOverlapJoin(x, y,
      "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 4)
      .select($"bid").as[Long].collect().toSet
    assert(touch == Set(1L))
  }

  test("intervalOverlapJoin: degenerate/null intervals match nothing; equiKeys restrict; no BNLJ") {
    val a = Seq((1L, "g1", 0L, 10L), (2L, "g2", 0L, 10L)).toDF("aid", "k", "a_lo", "a_hi")
    val b = Seq(
      (10L, "g1", Some(5L), Some(15L)),  // overlaps, same key
      (11L, "g2", Some(9L), Some(0L)),   // lo > hi: empty interval
      (12L, "g2", None, Some(9L)))       // null bound
      .toDF("bid", "k", "b_lo", "b_hi")
    val out = Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      bucketWidth = 4, equiKeys = Seq("k"))
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
    val plan = Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
      bucketWidth = 4, equiKeys = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("intervalOverlapJoin fails fast on sentinel intervals on either side") {
    val a = Seq((1L, 0L, 253402300800L)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((1L, 50L, 60L)).toDF("bid", "b_lo", "b_hi")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidth = 3600).collect()
    }
    assert(msgs(e).exists(_.contains("maxBucketsPerInterval")), msgs(e).mkString("|"))
  }
}
