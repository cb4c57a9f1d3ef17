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

  test("ewmaWindowed matches the driver fold; ewmaExact matches the full recurrence") {
    import TimeSeriesOps.{TsPoint, EwmaPoint}
    val alpha = 0.25
    val pts = for (k <- 0L until 3L; i <- 0L until 50L)
      yield TsPoint(k, i, ((k * 50 + i) * 37 % 101).toDouble)
    val df = pts.toDF()
    // driver-side truth for the windowed (span-truncated) fold
    def windowed(series: Seq[Double], span: Int): Seq[Double] =
      series.indices.map { i =>
        val fr = series.slice(math.max(0, i - span + 1), i + 1)
        fr.tail.foldLeft(fr.head)((acc, x) => acc * (1 - alpha) + x * alpha)
      }
    val gotW = TimeSeriesOps.ewmaWindowed(df, "key", "ord", "value", alpha, span = 8)
      .orderBy($"key", $"ord").select($"ewma").as[Double].collect().toSeq
    val expW = (0L until 3L).flatMap { k =>
      windowed(pts.filter(_.key == k).sortBy(_.ord).map(_.value), 8)
    }
    assert(gotW == expW) // bit-exact: same IEEE op chain
    // exact variant: unbounded recurrence, O(1) state
    val gotE = TimeSeriesOps.ewmaExact(df.as[TsPoint], alpha)
      .orderBy($"key", $"ord").collect().toSeq
    val expE = (0L until 3L).flatMap { k =>
      val s = pts.filter(_.key == k).sortBy(_.ord)
      s.tail.scanLeft(EwmaPoint(k, 0L, s.head.value))((acc, p) =>
        EwmaPoint(k, p.ord, acc.ewma * (1 - alpha) + p.value * alpha))
    }
    assert(gotE == expE)
    // truncation bound: |windowed − exact| ≤ (1−α)^span · max|x|
    val bound = math.pow(1 - alpha, 8) * 101.0
    gotW.zip(expE.map(_.ewma)).foreach { case (w, e) =>
      assert(math.abs(w - e) <= bound, s"$w vs $e beyond $bound")
    }
    // windowed: one shuffle (the key partition), window only, no join
    val plan = TimeSeriesOps.ewmaWindowed(df, "key", "ord", "value", alpha, 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("ewmaWindowed: leading-NULL series yields NULL ewma, not a crash (ANSI)") {
    val df = Seq(
      (1L, 1L, None: Option[Double]),   // all-NULL frame → empty collect_list
      (1L, 2L, None: Option[Double]),
      (1L, 3L, Some(4.0)),              // first observation
      (1L, 4L, Some(8.0)))
      .toDF("key", "ord", "value")
    val got = TimeSeriesOps.ewmaWindowed(df, "key", "ord", "value", 0.25, 8)
      .orderBy($"ord").select($"ewma").as[Option[Double]].collect().toSeq
    // NULLs are skipped by collect_list, so once data appears the fold
    // runs over observed values only (forwardFill upstream if LOCF wanted)
    assert(got == Seq(None, None, Some(4.0), Some(4.0 * 0.75 + 8.0 * 0.25)))
  }

  test("resampleOhlc: NULL values excluded consistently across all aggregates") {
    val df = Seq(
      ("a", ts("2024-01-01 10:01:00"), None: Option[Double], 1L), // NULL at min id
      ("a", ts("2024-01-01 10:10:00"), Some(5.0), 2L),
      ("a", ts("2024-01-01 10:20:00"), Some(3.0), 3L),
      ("a", ts("2024-01-01 10:50:00"), None: Option[Double], 4L)) // NULL at max id
      .toDF("k", "t", "v", "id")
    val got = TimeSeriesOps.resampleOhlc(df, "k", "t", "v", "id", "hour")
      .as[(String, Timestamp, Double, Double, Double, Double, Double, Long)]
      .collect().toSeq
    // open/close come from the non-NULL extremes (ids 2 and 3), matching
    // SQL arg_min/arg_max NULL-skipping; n counts non-NULL rows only
    assert(got == Seq(("a", ts("2024-01-01 10:00:00"), 5.0, 5.0, 3.0, 3.0, 4.0, 2L)))
  }

  test("ewma validates alpha and span") {
    val df = Seq(TimeSeriesOps.TsPoint(1L, 1L, 1.0)).toDF()
    intercept[IllegalArgumentException] {
      TimeSeriesOps.ewmaWindowed(df, "key", "ord", "value", alpha = 0.0, span = 5)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.ewmaWindowed(df, "key", "ord", "value", alpha = 0.5, span = 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.ewmaExact(df.as[TimeSeriesOps.TsPoint], alpha = 1.5)
    }
  }

  test("resampleOhlc: one aggregation exchange, no join, no window") {
    val df = Seq(("a", ts("2024-01-01 10:05:00"), 1.0, 1L))
      .toDF("k", "t", "v", "id")
    val plan = TimeSeriesOps.resampleOhlc(df, "k", "t", "v", "id")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join") && !plan.contains("Window"), plan.take(2000))
  }

  test("holtWindowed: hand-computed level/trend over a span-3 frame") {
    // fixture values 3,5,2,8,1,9,4; per-row fold over the last 3 with
    // seed (l = frame[0], b = 0) — expected values computed by hand
    // (these exact doubles also pin the cross-engine [l,b]-ARRAY
    // accumulator contract: DuckDB's list_reduce mutates a STRUCT
    // accumulator in place field-by-field and diverges from these)
    val vals = Seq(3.0, 5.0, 2.0, 8.0, 1.0, 9.0, 4.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "o", "v")
    val out = TimeSeriesOps.holtWindowed(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, span = 3)
      .orderBy($"o")
      .select($"level", $"trend", $"forecast")
      .as[(Double, Double, Double)].collect().toSeq
    val expected = Seq(
      (3.0, 0.0), (3.5, 0.0625), (3.171875, 0.013671875),
      (5.1171875, 0.0263671875), (3.015625, 0.103515625),
      (6.7734375, -0.1259765625), (3.4375, 0.2734375))
    assert(out.map(r => (r._1, r._2)) == expected, out.mkString(","))
    assert(out.forall(r => r._3 == r._1 + r._2))
  }

  test("holtWindowed: constant series → level = constant, trend = 0") {
    val df = (1 to 30).map(i => (1L, i.toLong, 7.5)).toDF("k", "o", "v")
    val out = TimeSeriesOps.holtWindowed(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, span = 10)
      .select($"level", $"trend").as[(Double, Double)].collect()
    assert(out.forall(r => r._1 == 7.5 && r._2 == 0.0), out.mkString(","))
  }

  test("holtWindowed tracks a linear ramp where EWMA lags it") {
    // x_t = 2t: after the 20-frame warm-up Holt's forecast should sit
    // close to the next value; EWMA (same α) lags by ~Δ/α
    val df = (1 to 60).map(i => (1L, i.toLong, 2.0 * i)).toDF("k", "o", "v")
    val holt = TimeSeriesOps.holtWindowed(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, span = 20)
      .filter($"o" === 60).select($"forecast").as[Double].head()
    val ewma = TimeSeriesOps.ewmaWindowed(df, "k", "o", "v",
      alpha = 0.25, span = 20)
      .filter($"o" === 60).select($"ewma").as[Double].head()
    assert(math.abs(holt - 122.0) < 2.0, s"holt forecast $holt")
    assert(120.0 - ewma > 4.0, s"ewma should lag the ramp, got $ewma")
  }

  test("cusumWindowed: hand-computed two-sided sums and alarm") {
    // target 10, slack 1: values 10,10,15,15,15 → S⁺ = 0,0,4,8,12
    // (each 15 adds 15−10−1 = 4); S⁻ stays 0; threshold 10 alarms on
    // the LAST row only — the sustained-shift accumulation a per-point
    // rule never fires on (no single value is extreme)
    val df = Seq(10.0, 10.0, 15.0, 15.0, 15.0).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v, 10.0) }
      .toDF("k", "o", "v", "tgt")
    val out = TimeSeriesOps.cusumWindowed(df, "k", "o", "v", "tgt",
      slack = 1.0, threshold = 10.0, span = 20)
      .orderBy($"o").select($"cusum_hi", $"cusum_lo", $"alarm")
      .as[(Double, Double, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(0.0, 0.0, 4.0, 8.0, 12.0), out.mkString(","))
    assert(out.forall(_._2 == 0.0))
    assert(out.map(_._3) == Seq(false, false, false, false, true))
  }

  test("cusumWindowed: downward shifts accumulate on the low side; clamping at 0") {
    val df = Seq(10.0, 4.0, 4.0, 16.0).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v, 10.0) }
      .toDF("k", "o", "v", "tgt")
    val out = TimeSeriesOps.cusumWindowed(df, "k", "o", "v", "tgt",
      slack = 1.0, threshold = 100.0, span = 20)
      .orderBy($"o").select($"cusum_hi", $"cusum_lo")
      .as[(Double, Double)].collect().toSeq
    // S⁻: 0, 5, 10, then 16 pulls it down by (10−1−16) = −7 → 3
    assert(out.map(_._2) == Seq(0.0, 5.0, 10.0, 3.0), out.mkString(","))
    // S⁺ clamps at 0 through the dip, then 16−11 = 5
    assert(out.map(_._1) == Seq(0.0, 0.0, 0.0, 5.0), out.mkString(","))
  }

  test("holtWindowed and cusumWindowed match a plain-Scala fold on random series") {
    // the window fold is the SAME IEEE op sequence as a local Scala
    // fold, so equality here is EXACT (==), not approximate — 5 keys ×
    // 60 points of seeded-random data, span 7
    val rng = new scala.util.Random(20260814L)
    val rows = for { k <- 1 to 5; i <- 1 to 60 }
      yield (k.toLong, i.toLong, math.floor(rng.nextDouble() * 1000) / 10.0)
    val df = rows.toDF("k", "o", "v").withColumn("tgt", lit(50.0))
    val span = 7
    def frame(rs: Seq[(Long, Long, Double)], i: Int): Seq[Double] =
      rs.slice(math.max(0, i - span + 1), i + 1).map(_._3)
    def holtRef(xs: Seq[Double]): (Double, Double) = {
      var l = xs.head; var t = 0.0
      for (x <- xs.tail) {
        val nl = x * 0.25 + 0.75 * (l + t)
        t = 0.125 * (nl - l) + 0.875 * t; l = nl
      }
      (l, t)
    }
    def cusumRef(xs: Seq[Double]): (Double, Double) = {
      var hi = 0.0; var lo = 0.0
      for (x <- xs) {
        hi = math.max(0.0, hi + (x - 50.0 - 2.0))
        lo = math.max(0.0, lo + (50.0 - 2.0 - x))
      }
      (hi, lo)
    }
    val byKey = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expHolt = byKey.flatMap { case (k, rs) =>
      rs.indices.map(i => (k, rs(i)._2) -> holtRef(frame(rs, i))) }
    val expCusum = byKey.flatMap { case (k, rs) =>
      rs.indices.map(i => (k, rs(i)._2) -> cusumRef(frame(rs, i))) }
    val gotHolt = TimeSeriesOps.holtWindowed(df, "k", "o", "v", 0.25, 0.125, span)
      .select($"k", $"o", $"level", $"trend")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val gotCusum = TimeSeriesOps.cusumWindowed(df, "k", "o", "v", "tgt",
      slack = 2.0, threshold = 1e9, span = span)
      .select($"k", $"o", $"cusum_hi", $"cusum_lo")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(gotHolt.size == 300 && gotCusum.size == 300)
    expHolt.foreach { case (key, exp) =>
      assert(gotHolt(key) == exp, s"holt $key: ${gotHolt(key)} != $exp") }
    expCusum.foreach { case (key, exp) =>
      assert(gotCusum(key) == exp, s"cusum $key: ${gotCusum(key)} != $exp") }
  }

  test("cusumWindowed validates parameters") {
    val df = Seq((1L, 1L, 1.0, 1.0)).toDF("k", "o", "v", "tgt")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.cusumWindowed(df, "k", "o", "v", "tgt", -1.0, 1.0, 3)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.cusumWindowed(df, "k", "o", "v", "tgt", 1.0, 0.0, 3)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.cusumWindowed(df, "k", "o", "v", "tgt", 1.0, 1.0, 0)
    }
  }

  test("holtWindowed validates parameters and keeps the ewma plan shape") {
    val df = Seq((1L, 1L, 1.0)).toDF("k", "o", "v")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.holtWindowed(df, "k", "o", "v", 0.0, 0.5, 3)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.holtWindowed(df, "k", "o", "v", 0.5, 1.5, 3)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.holtWindowed(df, "k", "o", "v", 0.5, 0.5, 0)
    }
    val plan = TimeSeriesOps.holtWindowed(df, "k", "o", "v", 0.25, 0.125, 3)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("holtWintersWindowed matches a plain-Scala rotating fold exactly") {
    // same IEEE-sequence contract as the holt/cusum property: the
    // window fold IS a local fold, so equality is exact (==) — 4 keys
    // × 48 points, period 4, span 9
    val rng = new scala.util.Random(20260814L)
    val rows = for { k <- 1 to 4; i <- 1 to 48 }
      yield (k.toLong, i.toLong, math.floor(rng.nextDouble() * 1000) / 10.0)
    val df = rows.toDF("k", "o", "v")
    val span = 9; val m = 4
    def frame(rs: Seq[(Long, Long, Double)], i: Int): Seq[Double] =
      rs.slice(math.max(0, i - span + 1), i + 1).map(_._3)
    def hwRef(xs: Seq[Double]): (Double, Double, Double) = {
      var l = xs.head; var b = 0.0; var s = Vector.fill(m)(0.0)
      for (x <- xs.tail) {
        val sOld = s.head
        val nl = 0.25 * (x - sOld) + 0.75 * (l + b)
        val nb = 0.125 * (nl - l) + 0.875 * b
        val ns = 0.5 * (x - nl) + 0.5 * sOld
        s = s.tail :+ ns; l = nl; b = nb
      }
      (l, b, s.head)
    }
    val byKey = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expected = byKey.flatMap { case (k, rs) =>
      rs.indices.map(i => (k, rs(i)._2) -> hwRef(frame(rs, i))) }
    val got = TimeSeriesOps.holtWintersWindowed(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, gamma = 0.5, period = m, span = span)
      .select($"k", $"o", $"level", $"trend", $"seasonal_next")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == expected)
  }

  test("holtWintersWindowed absorbs a pure period-4 cycle that Holt lags on") {
    // x_t = 100 + pattern[t mod 4]: after warm-up the HW one-step
    // forecast should land near the next value; Holt (no seasonal
    // state) keeps chasing the cycle
    val pattern = Seq(20.0, -10.0, 5.0, -15.0)
    val df = (1 to 80).map(i => (1L, i.toLong, 100.0 + pattern(i % 4)))
      .toDF("k", "o", "v")
    val nextVal = 100.0 + pattern(81 % 4)
    val hw = TimeSeriesOps.holtWintersWindowed(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, gamma = 0.5, period = 4, span = 40)
      .filter($"o" === 80).select($"forecast").as[Double].head()
    val holt = TimeSeriesOps.holtWindowed(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, span = 40)
      .filter($"o" === 80).select($"forecast").as[Double].head()
    assert(math.abs(hw - nextVal) < 3.0, s"hw forecast $hw vs $nextVal")
    assert(math.abs(holt - nextVal) > math.abs(hw - nextVal) + 2.0,
      s"holt $holt should lag the cycle hw $hw tracks")
  }

  test("holtWintersWindowed: constant series → level = c, trend = seasonal = 0") {
    val df = (1 to 30).map(i => (1L, i.toLong, 7.5)).toDF("k", "o", "v")
    val out = TimeSeriesOps.holtWintersWindowed(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, gamma = 0.5, period = 4, span = 10)
      .select($"level", $"trend", $"seasonal_next", $"forecast")
      .as[(Double, Double, Double, Double)].collect()
    assert(out.forall(r => r._1 == 7.5 && r._2 == 0.0 && r._3 == 0.0 &&
      r._4 == 7.5), out.take(5).mkString(","))
  }

  test("holtWintersWindowed: period = 1 degenerates to a single rotating slot") {
    val df = Seq(3.0, 5.0, 2.0).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) }.toDF("k", "o", "v")
    // period-1 reference: s is one slot consumed and replaced each step
    def ref(xs: Seq[Double]): (Double, Double, Double) = {
      var l = xs.head; var b = 0.0; var s = 0.0
      for (x <- xs.tail) {
        val nl = 0.25 * (x - s) + 0.75 * (l + b)
        val nb = 0.125 * (nl - l) + 0.875 * b
        val ns = 0.5 * (x - nl) + 0.5 * s
        l = nl; b = nb; s = ns
      }
      (l, b, s)
    }
    val got = TimeSeriesOps.holtWintersWindowed(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, gamma = 0.5, period = 1, span = 20)
      .orderBy($"o").select($"level", $"trend", $"seasonal_next")
      .as[(Double, Double, Double)].collect().toSeq
    val vals = Seq(3.0, 5.0, 2.0)
    val expected = (1 to 3).map(n => ref(vals.take(n)))
    assert(got == expected, got.mkString(","))
  }

  test("holtWintersWindowed validates parameters") {
    val df = Seq((1L, 1L, 1.0)).toDF("k", "o", "v")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.holtWintersWindowed(df, "k", "o", "v", 0.25, 0.125, 1.5, 4, 3)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.holtWintersWindowed(df, "k", "o", "v", 0.25, 0.125, 0.5, 0, 3)
    }
  }

  test("acf: hand-computed lags on a short series; lag-0-free; exact integers") {
    import spark.implicits._
    // series 1,2,3,4,3,2 (n=6, mean=2.5): dev×n = 6x−15 →
    // (−9,−3,3,9,3,−3); den = 81+9+9+81+9+9 = 198
    // lag1: (−9)(−3)+(−3)(3)+3·9+9·3+3·(−3) = 27−9+27+27−9 = 63
    // lag2: (−9)(3)+(−3)(9)+3·3+9·(−3) = −27−27+9−27 = −72
    val series = Seq(1L, 2L, 3L, 4L, 3L, 2L).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("idx", "x")
    val out = TimeSeriesOps.acf(series, "idx", "x", maxLag = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val byLag = out.map(t => t._1 -> t).toMap
    assert(byLag(1L) == ((1L, 5L, 63.0, 198.0, 63.0 / 198.0)))
    assert(byLag(2L) == ((2L, 4L, -72.0, 198.0, -72.0 / 198.0)))
    assert(math.abs(byLag(1L)._5) <= 1.0 && math.abs(byLag(2L)._5) <= 1.0)
  }

  test("acf: decimal products are exact where a long dev² would wrap") {
    import spark.implicits._
    // bucket values ~3e9 over 8 buckets: dev = 8x − Σx is ~±1e10 and
    // dev² ~1e20 > 2⁶³ — a LongType product wraps silently here; the
    // DECIMAL(38,0) path must keep den positive and acf in [−1, 1]
    val base = 3_000_000_000L
    val xs = (0 until 8).map(i =>
      (i.toLong, base + (if (i % 2 == 0) 500_000_000L else -500_000_000L)))
    val out = TimeSeriesOps.acf(xs.toDF("idx", "x"), "idx", "x", maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    out.foreach { case (lag, den, a) =>
      assert(den > 0.0, s"lag $lag: den wrapped to $den")
      assert(a >= -1.0 && a <= 1.0, s"lag $lag: acf $a out of range")
    }
    // alternating series: lag-1 near −1, lag-2 near +1
    val byLag = out.map(t => t._1 -> t._3).toMap
    assert(byLag(1L) < -0.8 && byLag(2L) > 0.6, byLag)
  }

  test("acf: a perfectly periodic series peaks at its period") {
    import spark.implicits._
    val xs = (0 until 48).map(i => (i.toLong, (i % 4).toLong + 1))
    val out = TimeSeriesOps.acf(xs.toDF("idx", "x"), "idx", "x", maxLag = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
    // period-4 series: lags 4 and 8 are the maxima, near 1
    assert(out(4L) > 0.9 && out(8L) > 0.8, out)
    assert(out(4L) > out(1L) && out(4L) > out(2L) && out(4L) > out(3L), out)
  }

  test("ccf: hand-computed lags on a short pair; lag 0 included") {
    import spark.implicits._
    // x = 1,2,3,4 (n=4, Σx=10): devx = 4x−10 → (−6,−2,2,6)
    // y = 2,1,4,3 (Σy=10):      devy = 4y−10 → (−2,−6,6,2)
    // den_x = 36+4+4+36 = 80; den_y = 4+36+36+4 = 80
    // lag 0: 12+12+12+12 = 48
    // lag 1: (−6)(−6)+(−2)(6)+2·2 = 36−12+4 = 28
    // lag −1: (−2)(−2)+2·(−6)+6·6 = 4−12+36 = 28
    val series = Seq((0L, 1L, 2L), (1L, 2L, 1L), (2L, 3L, 4L), (3L, 4L, 3L))
      .toDF("idx", "x", "y")
    val out = TimeSeriesOps.ccf(series, "idx", "x", "y", maxLag = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out.keySet == Set(-2L, -1L, 0L, 1L, 2L))
    assert(out(0L) == ((4L, 48.0, 80.0, 80.0, 48.0 / (math.sqrt(80.0) * math.sqrt(80.0)))))
    assert(out(1L) == ((3L, 28.0, 80.0, 80.0, 28.0 / (math.sqrt(80.0) * math.sqrt(80.0)))))
    assert(out(-1L) == ((3L, 28.0, 80.0, 80.0, 28.0 / (math.sqrt(80.0) * math.sqrt(80.0)))))
  }

  test("ccf: a planted k-bucket lead peaks exactly at lag k; asymmetric") {
    import spark.implicits._
    // y is x shifted 3 buckets later (x leads y by 3) on a period-7
    // pattern: the CCF must peak at +3, and the mirror lag −3 must not.
    // maxLag stays BELOW the period: a periodic signal aliases
    // (lag −4 ≡ +3 mod 7 scores identically — measured).
    val xs = (0 until 70).map { i =>
      val x = (i % 7).toLong
      val y = (((i - 3) % 7 + 7) % 7).toLong
      (i.toLong, x, y)
    }
    val out = TimeSeriesOps.ccf(xs.toDF("idx", "x", "y"), "idx", "x", "y",
      maxLag = 3).collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    // exact value: the 3 lost edge pairs cost 14/280 → 266/280 = 0.95
    assert(out(3L) >= 0.94, out)
    assert(out.filter(_._1 != 3L).values.forall(_ < out(3L)), out)
    assert(out(-3L) < 0.5, out)
  }

  test("ccf: constant series yields NULL ccf, exact zero denominator") {
    import spark.implicits._
    val xs = (0 until 10).map(i => (i.toLong, 5L, (i % 3).toLong))
    val out = TimeSeriesOps.ccf(xs.toDF("idx", "x", "y"), "idx", "x", "y",
      maxLag = 1).collect()
    assert(out.forall(_.isNullAt(5)), "constant x must yield NULL ccf")
    assert(out.forall(_.getDouble(3) == 0.0))
  }

  test("ccf: decimal products stay exact where a long product would wrap") {
    import spark.implicits._
    val base = 3_000_000_000L
    val xs = (0 until 8).map { i =>
      val v = base + (if (i % 2 == 0) 500_000_000L else -500_000_000L)
      (i.toLong, v, v)
    }
    val out = TimeSeriesOps.ccf(xs.toDF("idx", "x", "y"), "idx", "x", "y",
      maxLag = 2).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(5)))).toMap
    out.foreach { case (lag, (den, c)) =>
      assert(den > 0.0, s"lag $lag: den wrapped to $den")
      // Cauchy-Schwarz bounds the exact value; √d·√d can undershoot d
      // by ~1 ulp, so the presented ratio may poke past 1 by ≤1e-15
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12,
        s"lag $lag: ccf $c out of range")
    }
    // x ≡ y ⇒ ccf(0) ≈ 1 (num = den exactly; √d·√d reintroduces ≤2 ulp)
    assert(math.abs(out(0L)._2 - 1.0) < 1e-12, out(0L))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.ccf(xs.toDF("idx", "x", "y"), "idx", "x", "y", maxLag = 0)
    }
  }

  test("decomposeClassical: pure period-4 series decomposes with zero residual") {
    import spark.implicits._
    val xs = (0 until 24).map(i => (i.toLong, i % 4, Seq(1L, 2L, 3L, 4L)(i % 4)))
    val out = TimeSeriesOps.decomposeClassical(
      xs.toDF("idx", "hod", "x"), "idx", "x", "hod", period = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    // edge rows (first/last 2) drop; all trends = the series mean 2.5;
    // seasonal carries the whole pattern; residual exactly 0
    assert(out.length == 24 - 4, out.length)
    out.foreach { case (idx, trend, seasonal, resid) =>
      assert(trend == 2.5, s"idx $idx trend $trend")
      assert(resid == 0.0, s"idx $idx residual $resid")
      assert(seasonal >= -1.5 && seasonal <= 1.5)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.decomposeClassical(
        xs.toDF("idx", "hod", "x"), "idx", "x", "hod", period = 5)
    }
  }

  test("changepointCusum: recovers a planted level shift exactly") {
    import spark.implicits._
    // 10,10,...,10 (40x) then 50,... (20x): true cp = 40
    val xs = (0 until 60).map(i => (i.toLong, if (i < 40) 10L else 50L))
    val r = TimeSeriesOps.changepointCusum(xs.toDF("idx", "x"), "idx", "x")
      .collect().head
    assert(r.getLong(0) == 40L, r)
    assert(r.getDouble(3) == 10.0 && r.getDouble(4) == 50.0)
    assert(r.getDouble(5) == 40.0)
    // constant series: d = 0 everywhere, smallest-t tie-break → cp = 1
    val flat = (0 until 20).map(i => (i.toLong, 7L))
    val r2 = TimeSeriesOps.changepointCusum(flat.toDF("idx", "x"), "idx", "x")
      .collect().head
    assert(r2.getLong(0) == 1L && r2.getLong(2) == 0L, r2)
  }

  test("holtBacktest: errors equal the hand fold's h-lagged forecasts; horizons decay") {
    // a linear ramp: Holt converges onto it, so MAE must DECREASE as
    // the fold warms up and must GROW with horizon (h x trend-error)
    val n = 40
    val df = (1 to n).map(i => ("k", i, 3.0 * i + 10.0)).toDF("k", "o", "v")
    val bt = TimeSeriesOps.holtBacktest(df, "k", "o", "v",
      alpha = 0.25, beta = 0.125, span = 20, horizons = Seq(1, 2, 3))
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // horizon h loses its first h rows of evaluations
    assert(bt(1)._1 == n - 1 && bt(2)._1 == n - 2 && bt(3)._1 == n - 3, bt)
    assert(bt(1)._2 < bt(2)._2 && bt(2)._2 < bt(3)._2,
      s"MAE should grow with horizon on a ramp: $bt")
    // hand-check one evaluation: replicate the span-20 fold at origin
    // t = 30, forecast 2 ahead, compare |v(32) - (l30 + 2 b30)|
    def fold(upTo: Int): (Double, Double) = {
      val frame = (math.max(1, upTo - 19) to upTo).map(i => 3.0 * i + 10.0)
      frame.tail.foldLeft((frame.head, 0.0)) { case ((l, b), x) =>
        val nl = x * 0.25 + 0.75 * (l + b)
        (nl, 0.125 * (nl - l) + 0.875 * b)
      }
    }
    val (l30, b30) = fold(30)
    val expAe = math.abs((3.0 * 32 + 10.0) - (l30 + 2.0 * b30))
    val perRow = TimeSeriesOps.holtBacktest(
      df.filter($"o" <= 32), "k", "o", "v", 0.25, 0.125, 20, Seq(2))
      .collect().head
    // the aggregate over o in [3, 32] includes this row; bound check
    // via a 2-row series where the single evaluation IS the mean
    val two = (1 to 3).map(i => ("k", i, 3.0 * i + 10.0)).toDF("k", "o", "v")
    val one = TimeSeriesOps.holtBacktest(two, "k", "o", "v",
      0.25, 0.125, 20, Seq(2)).collect().head
    val (l1, b1) = fold(1)
    val exp1 = math.abs((3.0 * 3 + 10.0) - (l1 + 2.0 * b1))
    assert(math.abs(one.getDouble(3) - exp1) < 1e-6,
      s"single-evaluation MAE ${one.getDouble(3)} != $exp1")
    assert(perRow.getLong(2) == 30L, perRow)
    assert(expAe >= 0.0) // silence unused-val; the bound is the n check
  }
}
