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

  test("quantileBins: equi-depth quartiles, tie-to-lower, NULL stays NULL") {
    // 1..8 into 4 bins: thresholds at 2.75/4.5/6.25 → exactly 2 per bin
    val df = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = ProfileOps.quantileBins(df, "v", nBins = 4)
      .select($"id", $"bin").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 3, 8L -> 3), out.toString)
    // a value exactly ON a threshold takes the LOWER bin (strict >):
    // for 1,2,2,3 halves split at median 2.0 — both 2s land low
    val tied = Seq(1.0, 2.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val tb = ProfileOps.quantileBins(tied, "v", nBins = 2)
      .select($"id", $"bin").as[(Long, Int)].collect().toMap
    assert(tb == Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1), tb.toString)
    // NULL value → NULL bin
    val withNull = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "v")
    val nb = ProfileOps.quantileBins(withNull, "v", nBins = 2)
      .select($"id", $"bin").as[(Long, Option[Int])].collect().toMap
    assert(nb(2L) == None, s"null must stay null, got ${nb(2L)}")
    intercept[IllegalArgumentException] {
      ProfileOps.quantileBins(df, "v", nBins = 1)
    }
  }

  test("quantileBins approxThresholds: mismatch vs exact ≤ (nBins−1)/accuracy at sf0.1") {
    // the production-scale mode's documented drift bound, checked on
    // real data: each approx threshold's rank is within n/accuracy of
    // exact, a row flips bin only if its rank sits between the two, so
    // mismatches ≤ (nBins−1)·n/accuracy rows (value is a continuous
    // double here — no tied mass at thresholds to add on top)
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select($"event_id", $"value")
    val nBins = 10
    val accuracy = 10000
    val exact = ProfileOps.quantileBins(ev, "value", nBins)
      .select($"event_id", $"bin".as("bin_exact"))
    val approx = ProfileOps.quantileBins(
        ev, "value", nBins, approxThresholds = true, approxAccuracy = accuracy)
      .select($"event_id", $"bin".as("bin_approx"))
    val joined = exact.join(approx, "event_id")
    val n = joined.count()
    val mismatched =
      joined.filter($"bin_exact" =!= $"bin_approx").count()
    val bound = (nBins - 1).toDouble / accuracy
    assert(n > 0)
    assert(mismatched.toDouble / n <= bound,
      s"mismatch ${mismatched}/$n > bound $bound")
    // oracled exact mode unchanged: the default path still uses the
    // one-buffer exact percentile (prep_quantile_bins' contract)
    intercept[IllegalArgumentException] {
      ProfileOps.quantileBins(ev, "value", nBins,
        approxThresholds = true, approxAccuracy = 10)
    }
  }

  test("snapshotDrift: hand-computed shares, χ²/KS terms, empty-bin signal") {
    // ref 1..8 binned at its median 4.5 → [4, 4]; cur 5..12 all above
    // → [0, 8]: p_ref [.5,.5], p_cur [0,1], abs_diff .5 each,
    // chi2 (0−.5)²/.5 = .5 each, CDF diff [.5, 0], both bins drifted
    val ref = (1 to 8).map(_.toDouble).toDF("v")
    val cur = (5 to 12).map(_.toDouble).toDF("v")
    val out = ProfileOps.snapshotDrift(ref, cur, "v", nBins = 2)
      .as[(Int, Long, Long, Double, Double, Double, Option[Double], Double, Int)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0, 4L, 0L, 0.5, 0.0, 0.5, Some(0.5), 0.5, 1),
      (1, 4L, 8L, 0.5, 1.0, 0.5, Some(0.5), 0.0, 1)), out.toString)
    // empty REFERENCE bin: chi2_term is NULL (not ∞/0-div), the bin row
    // still appears — an empty bin is the drift signal itself
    val refDeg = Seq(1.0, 1.0, 1.0, 9.0).toDF("v") // median 1.0: bin 0 = {≤1}
    val curDeg = Seq(9.0, 9.0).toDF("v")
    val deg = ProfileOps.snapshotDrift(refDeg, curDeg, "v", nBins = 2)
      .select($"bin", $"n_ref", $"n_cur", $"chi2_term")
      .as[(Int, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(deg.map(r => (r._1, r._2, r._3)) == Seq((0, 3L, 0L), (1, 1L, 2L)),
      deg.toString)
    // NULL measurements are excluded, never binned
    val refN = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val nOut = ProfileOps.snapshotDrift(refN, refN, "v", nBins = 2)
      .agg(sum($"n_ref"), sum($"n_cur")).as[(Long, Long)].head()
    assert(nOut == ((2L, 2L)), nOut.toString)
    intercept[IllegalArgumentException] {
      ProfileOps.snapshotDrift(ref, cur, "v", nBins = 1)
    }
  }

  test("driftFit model freezes: persist → reload → score ≡ direct snapshotDrift") {
    // the bm25Fit contract applied to drift monitoring: the reference
    // corpus is scanned once at fit, the parquet-able model scores any
    // later refresh bit-identically to the in-plan composition
    val ref = (1 to 100).map(i => ((i % 7).toDouble + i / 50.0)).toDF("v")
    val cur = (1 to 80).map(i => ((i % 5).toDouble + i / 40.0)).toDF("v")
    val direct = ProfileOps.snapshotDrift(ref, cur, "v", nBins = 4)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    ProfileOps.driftFit(ref, "v", nBins = 4).write.mode("overwrite").parquet(dir)
    val scored = ProfileOps.driftScore(cur, spark.read.parquet(dir), "v")
      .collect().map(_.toString).sorted.toSeq
    assert(scored == direct, s"$scored\nvs\n$direct")
    // model shape: one row per bin, last threshold NULL (unbounded)
    val model = spark.read.parquet(dir).collect()
      .map(r => (r.getInt(0), Option(r.get(1)))).sortBy(_._1).toSeq
    assert(model.length == 4 && model.last._2.isEmpty &&
      model.init.forall(_._2.nonEmpty), model.toString)
  }

  test("winsorize preserves NULL (must not fabricate the low bound for missing data)") {
    val df = Seq((1L, Some(10.0)), (2L, None), (3L, Some(1000.0)), (4L, Some(50.0)))
      .toDF("id", "v")
    val out = ProfileOps.winsorize(df, "v", pLo = 0.0, pHi = 1.0)
      .select($"id", $"clipped").as[(Long, Option[Double])].collect().toMap
    assert(out(2L) == None, s"null must stay null, got ${out(2L)}")
    assert(out(1L) == Some(10.0) && out(3L) == Some(1000.0))
  }

  test("winsorize handles column names that need quoting") {
    val df = Seq(1.0, 2.0, 3.0).toDF("unit-price")
    val out = ProfileOps.winsorize(df, "unit-price", pLo = 0.0, pHi = 1.0)
    assert(out.select($"clipped").as[Double].collect().sorted.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("keySkew surfaces hot keys with exact counts and shares") {
    // 100 rows of key 1, 10 of key 2, 1 each of keys 3..12 → 120 rows,
    // 12 keys, mean 10, skew_factor 10.0
    val df = (Seq.fill(100)(1L) ++ Seq.fill(10)(2L) ++ (3L to 12L)).toDF("k")
    val out = ProfileOps.keySkew(df, "k", topK = 3)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 100L), (2L, 10L), (3L, 1L)))
    assert(math.abs(out.head._3 - 100.0 / 120.0) < 1e-12)
    assert(out.forall(r => math.abs(r._4 - 10.0) < 1e-12), out.toString)
    // ties broken by key (deterministic): keys 3..12 all have n=1
    val out10 = ProfileOps.keySkew(df, "k", topK = 5)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out10.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("profileNumeric mean survives corrupt-sentinel magnitudes (1e30)") {
    val df = Seq(1.0, 2.0, 1e30).toDF("x")
    val p = ProfileOps.profileNumeric(df, Seq("x"))
      .select($"n_nonnull", $"max_val", $"mean_val")
      .as[(Long, Double, Double)].head()
    assert(p._1 == 3 && p._2 == 1e30)
    // the sentinel must DOMINATE the mean (not be silently nulled out of
    // the sum while still counted)
    assert(p._3 > 1e29, s"mean ${p._3} lost the sentinel value")
  }

  test("histogram: counts partition the non-null rows, bounds tile [min,max], max lands in last bin") {
    import spark.implicits._
    val vals = Seq(0.0, 1.0, 2.5, 3.0, 7.7, 9.9, 10.0).map(Option(_)) :+ None
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val h = ProfileOps.histogram(df, "x", bins = 4)
      .orderBy($"bin")
      .as[(Long, Double, Double, Long)].collect()
    assert(h.map(_._4).sum == 7)              // NULL excluded
    assert(h.head._2 == 0.0)                  // first bin starts at min
    assert(math.abs(h.last._3 - 10.0) < 1e-12) // last bin ends at max
    // max value itself is clamped into the last bin, not a phantom bin 4
    assert(h.map(_._1).max == 3)
    // empty bins are absent (bin 2 here); present bins sit on the exact
    // width-2.5 grid
    assert(h.map(_._1).toSeq == Seq(0L, 1L, 3L))
    h.foreach { case (bin, lo, hi, _) =>
      assert(math.abs(lo - bin * 2.5) < 1e-12 && math.abs(hi - (bin + 1) * 2.5) < 1e-12,
        s"bin $bin bounds [$lo, $hi] off the grid")
    }
  }

  test("histogram: constant column degenerates to one bin of width zero") {
    import spark.implicits._
    val df = Seq.fill(5)(42.0).zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "x")
    val h = ProfileOps.histogram(df, "x", bins = 10)
      .as[(Long, Double, Double, Long)].collect()
    assert(h.toSeq == Seq((0L, 42.0, 42.0, 5L)))
  }

  test("corrMatrix: hand-computed r, pairwise NULL deletion, degenerate → NULL") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(2.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(5.0)),
      (Some(3.0), Some(6.0), Some(5.0)),
      (None: Option[Double], Some(9.0), Some(5.0)), // excluded from (x,*) pairs
      (Some(4.0), None: Option[Double], Some(5.0))) // excluded from (*,y) pairs
      .toDF("x", "y", "z")
    val got = ProfileOps.corrMatrix(df, Seq("x", "y", "z"))
      .orderBy($"col_a", $"col_b")
      .as[(String, String, Long, Option[Double])].collect().toSeq
    // x,y perfectly linear over their 3 complete rows (r ≈ 1 up to the
    // fixed sqrt-chain's last ulp — deliberately NOT clamped: the oracle
    // evaluates the identical chain); z constant → NULL
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq(("x", "y", 3L), ("x", "z", 4L), ("y", "z", 4L)))
    assert(math.abs(got.head._4.get - 1.0) < 1e-12, got.head.toString)
    assert(got(1)._4.isEmpty && got(2)._4.isEmpty)
    // negative correlation: y = -2x
    val neg = Seq((1.0, -2.0), (2.0, -4.0), (3.0, -6.0)).toDF("a", "b")
    assert(math.abs(ProfileOps.corrMatrix(neg, Seq("a", "b"))
      .select($"pearson_r").as[Double].head() + 1.0) < 1e-12)
    // one scan, no shuffle beyond the single-row aggregate; no join
    val plan = ProfileOps.corrMatrix(df, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    intercept[IllegalArgumentException] { ProfileOps.corrMatrix(df, Seq("x")) }
    intercept[IllegalArgumentException] {
      ProfileOps.corrMatrix(df, Seq("x", "x"))
    }
  }

  test("corrMatrix fails loud outside the decimal accumulator's domain") {
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // epoch-nanos-scale magnitudes: products overflow DECIMAL(38,6) —
    // must be the rescale diagnostic, not an ANSI overflow or a wrong r
    val big = Seq((1.7e18, 1.0), (1.8e18, 2.0), (1.9e18, 3.0)).toDF("t", "v")
    val eBig = intercept[Exception] {
      ProfileOps.corrMatrix(big, Seq("t", "v")).collect()
    }
    assert(msgs(eBig).exists(_.contains("exceeds 1e15")), msgs(eBig).mkString("|"))
    // micro-scale rates: every product rounds to zero at scale 6
    val tiny = Seq((1e-4, 2e-4), (2e-4, 4e-4), (3e-4, 6e-4)).toDF("a", "b")
    val eTiny = intercept[Exception] {
      ProfileOps.corrMatrix(tiny, Seq("a", "b")).collect()
    }
    assert(msgs(eTiny).exists(_.contains("below 1e-3")), msgs(eTiny).mkString("|"))
  }

  test("zscorePerGroup: hand-computed z; degenerate groups get NULL") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 4L, 5.0),                    // n = 1 → NULL
      ("c", 5L, 4.0), ("c", 6L, 4.0))    // zero variance → NULL
      .toDF("k", "id", "v")
    val got = ProfileOps.zscorePerGroup(df, "k", "v")
      .orderBy($"id")
      .select($"id", $"zscore").as[(Long, Option[Double])].collect().toSeq
    // group a: mean 2, var ((1+4+9) - 36/3)/2 = 1, sd 1 → z = -1, 0, 1
    assert(got == Seq(
      (1L, Some(-1.0)), (2L, Some(0.0)), (3L, Some(1.0)),
      (4L, None), (5L, None), (6L, None)))
    // one window over the key: exactly one shuffle, no join-back
    val plan = ProfileOps.zscorePerGroup(df, "k", "v")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("zscorePerGroup fails loud outside the decimal accumulator's domain") {
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // epoch-nanos-scale group: squares overflow DECIMAL(38,6) — must be
    // the rescale diagnostic, not an ANSI abort or silently-wrong z
    val big = Seq(("a", 1.7e18), ("a", 1.8e18), ("a", 1.9e18)).toDF("k", "v")
    val eBig = intercept[Exception] {
      ProfileOps.zscorePerGroup(big, "k", "v").collect()
    }
    assert(msgs(eBig).exists(_.contains("exceeds 1e15")), msgs(eBig).mkString("|"))
    // micro-scale group: every square rounds to zero at scale 6
    val tiny = Seq(("a", 1e-4), ("a", 2e-4), ("a", 3e-4)).toDF("k", "v")
    val eTiny = intercept[Exception] {
      ProfileOps.zscorePerGroup(tiny, "k", "v").collect()
    }
    assert(msgs(eTiny).exists(_.contains("below 1e-3")), msgs(eTiny).mkString("|"))
    // the guard is per-GROUP: a healthy group alongside never raises for it
    val mixed = Seq(("ok", 1.0), ("ok", 2.0), ("ok", 3.0)).toDF("k", "v")
    assert(ProfileOps.zscorePerGroup(mixed, "k", "v")
      .select($"zscore").as[Option[Double]].collect().flatten.length == 3)
  }

  test("cohenKappa: hand-computed value; NULLs are non-flags; degenerate is NULL") {
    import spark.implicits._
    // confusion: n11=4 n10=1 n01=1 n00=4, n=10 → po=0.8,
    // pe = (5*5 + 5*5)/100 = 0.5 → kappa = 0.3/0.5 = 0.6
    val df = (Seq.fill(4)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(4)((false, false))).toDF("a", "b")
    val r = ProfileOps.cohenKappa(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Double, Double, Option[Double])]
      .head()
    assert(r == ((10L, 4L, 1L, 1L, 4L, 0.8, 0.5, Some(0.6))), r)
    // NULL rater values count as non-flags (the rateWilsonCi convention)
    val withNull = Seq((Some(true), Some(true)), (None, Some(true)),
      (Some(true), None)).toDF("a", "b")
    val r2 = ProfileOps.cohenKappa(withNull, col("a"), col("b"))
      .select($"n11", $"n10", $"n01").as[(Long, Long, Long)].head()
    assert(r2 == ((1L, 1L, 1L)), r2)
    // both raters constant → pe = 1 → NULL kappa, not a division blowup
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    val r3 = ProfileOps.cohenKappa(const, col("a"), col("b"))
      .select($"kappa").as[Option[Double]].head()
    assert(r3.isEmpty, r3)
    // empty input: n = 0 → po/pe/kappa all NULL (never NaN/±inf)
    val empty = Seq.empty[(Boolean, Boolean)].toDF("a", "b")
    val r4 = ProfileOps.cohenKappa(empty, col("a"), col("b"))
      .select($"n", $"po", $"pe", $"kappa")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(r4 == ((0L, None, None, None)), r4)
  }

  test("zscorePerGroup: integral column squares exactly where long v*v wraps") {
    import spark.implicits._
    // |v| ~1e13 is inside the documented ≤1e15 domain, but a LongType
    // v*v wraps at ~3.04e9 — the decimal square path must still give
    // the exact symmetric z-scores (±1/√1 after scaling: for values
    // m−d, m, m+d the z's are −1, 0, 1 regardless of magnitude)
    val m = 10_000_000_000_000L
    val d = 3_000_000_000L
    val df = Seq(("a", 1L, m - d), ("a", 2L, m), ("a", 3L, m + d))
      .toDF("k", "id", "v")
    val got = ProfileOps.zscorePerGroup(df, "k", "v")
      .orderBy($"id").select($"zscore").as[Double].collect().toSeq
    // decimal sums are exact; the final Σ→double presentation rounds
    // at ~1e26 magnitudes (√ of that is the 1e-10 here) — the wrapped
    // long path gave NULL/garbage, not a 1e-10 error
    assert(got.length == 3 && got(1) == 0.0, got)
    assert(math.abs(got(0) + 1.0) < 1e-9 && math.abs(got(2) - 1.0) < 1e-9,
      got)
  }

  test("forwardFill carries last observation, leaves leading NULLs, fills per key") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, None: Option[Double], Some("x")),
      ("a", 2L, Some(10.0), None: Option[String]),
      ("a", 3L, None: Option[Double], None: Option[String]),
      ("a", 4L, Some(20.0), Some("y")),
      ("a", 5L, None: Option[Double], None: Option[String]),
      ("b", 1L, Some(7.0), None: Option[String]),
      ("b", 2L, None: Option[Double], Some("z")))
      .toDF("k", "ts", "v", "s")
    val got = ProfileOps.forwardFill(df, "k", "ts", Seq("v", "s"))
      .orderBy($"k", $"ts")
      .as[(String, Long, Option[Double], Option[String])].collect().toSeq
    assert(got == Seq(
      ("a", 1L, None, Some("x")),          // leading NULL stays NULL
      ("a", 2L, Some(10.0), Some("x")),
      ("a", 3L, Some(10.0), Some("x")),    // gap filled
      ("a", 4L, Some(20.0), Some("y")),    // new observation wins
      ("a", 5L, Some(20.0), Some("y")),
      ("b", 1L, Some(7.0), None),          // keys are independent
      ("b", 2L, Some(7.0), Some("z"))))
    // both columns fill inside ONE Window node: exactly one shuffle
    val plan = ProfileOps.forwardFill(df, "k", "ts", Seq("v", "s"))
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).size >= 1)
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  test("olsByGroup: hand-computed fit; degenerate groups get NULL") {
    // y = 2x + 1 exactly for group "a" → slope 2, intercept 1, r2 1
    val a = Seq(("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0))
    // group "b": single point → NULL fit; group "c": zero x variance
    val b = Seq(("b", 4.0, 4.0))
    val c = Seq(("c", 5.0, 1.0), ("c", 5.0, 9.0))
    val out = ProfileOps.olsByGroup(
      (a ++ b ++ c).toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a")._2 == 3)
    assert(math.abs(out("a")._3.get - 2.0) < 1e-12)
    assert(math.abs(out("a")._4.get - 1.0) < 1e-12)
    assert(math.abs(out("a")._5.get - 1.0) < 1e-12)
    assert(out("b")._3.isEmpty && out("b")._4.isEmpty && out("b")._5.isEmpty)
    assert(out("c")._3.isEmpty)
    // NULL x/y rows are pairwise-deleted, not zero-filled
    val withNulls = ProfileOps.olsByGroup(
      (a.map { case (g, x, y) => (g, Some(x), Some(y)) } :+
        (("a", None: Option[Double], Some(99.0)))).toDF("g", "x", "y"),
      "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(withNulls._2 == 3 && math.abs(withNulls._3.get - 2.0) < 1e-12)
  }

  test("olsByGroup fails loud outside the decimal accumulator's domain") {
    val df = Seq(("a", 1e16, 2.0), ("a", 2e16, 3.0)).toDF("g", "x", "y")
    val e = intercept[Exception] {
      ProfileOps.olsByGroup(df, "g", "x", "y").collect()
    }
    assert(e.getMessage.contains("olsByGroup"), e.getMessage)
  }

  test("olsByGroup guard ignores pairwise-deleted rows (huge x, NULL y)") {
    // the out-of-domain magnitude sits on a row that contributes to NO
    // sum — the fit over the remaining rows must succeed, not abort
    val df = Seq(
      ("a", Some(1.0), Some(3.0)), ("a", Some(2.0), Some(5.0)),
      ("a", Some(3.0), Some(7.0)), ("a", Some(1e16), None))
      .toDF("g", "x", "y")
    val out = ProfileOps.olsByGroup(df, "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(out._2 == 3 && math.abs(out._3.get - 2.0) < 1e-12, s"$out")
  }

  test("olsByGroup is one aggregate — a single shuffle on the group key") {
    val df = Seq(("a", 1.0, 2.0), ("b", 3.0, 4.0)).toDF("g", "x", "y")
    val plan = ProfileOps.olsByGroup(df, "g", "x", "y")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("madOutliers: hand-computed median/MAD and outlier count") {
    // group "a": values 1..9 plus a 100 sentinel → med 5.5, devs
    // {4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,94.5} → mad 2.5, outliers
    // (dev > 7.5): {100} and 1 (dev 4.5? no) → just the sentinel
    val rows = ((1 to 9).map(v => ("a", v.toLong)) :+ (("a", 100L))) ++
      Seq(("b", 7L)) // single-value group: med 7, mad 0, no outliers
    val out = ProfileOps.madOutliers(rows.toDF("g", "v"), "g", "v", k = 3.0)
      .as[(String, Long, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a")._2 == 10)
    assert(out("a")._3 == 5.5)
    assert(out("a")._4 == 2.5)
    assert(out("a")._5 == 1L)
    assert(out("b") == (("b", 1L, 7.0, 0.0, 0L)))
  }

  test("madOutliers approx mode agrees with exact on modest groups") {
    val rows = (1 to 500).map(v => ("g", (v % 97).toLong))
    val exact = ProfileOps.madOutliers(rows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Double, Double, Long)].collect().head
    val approx = ProfileOps.madOutliers(
      rows.toDF("g", "v"), "g", "v", approxMedian = true)
      .as[(String, Long, Double, Double, Long)].collect().head
    // approx_percentile at accuracy 10000 is exact-rank on 500 rows up
    // to the interpolation convention (it returns an actual data value,
    // not the midpoint) — allow the half-step slack
    assert(approx._2 == exact._2)
    assert(math.abs(approx._3 - exact._3) <= 1.0, s"$approx vs $exact")
    assert(math.abs(approx._4 - exact._4) <= 1.0, s"$approx vs $exact")
  }

  test("rateWilsonCi matches the textbook interval for n=10, k=3") {
    // 95% Wilson interval for 3/10 ≈ (0.1078, 0.6032) (Brown, Cai &
    // DasGupta 2001's running example)
    val df = (1 to 10).map(i => ("g", i <= 3)).toDF("g", "f")
    val out = ProfileOps.rateWilsonCi(df, "g", $"f")
      .as[(String, Long, Long, Double, Double, Double)].collect().head
    assert(out._2 == 10 && out._3 == 3 && out._4 == 0.3)
    assert(math.abs(out._5 - 0.1078) < 5e-4, s"lo ${out._5}")
    assert(math.abs(out._6 - 0.6032) < 5e-4, s"hi ${out._6}")
  }

  test("rateWilsonCi: k=0 pins ci_lo to exactly 0, k=n pins ci_hi to exactly 1") {
    val df = Seq(("zero", false), ("zero", false),
      ("all", true), ("all", true), ("all", true)).toDF("g", "f")
    val out = ProfileOps.rateWilsonCi(df, "g", $"f")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // algebra: phat=0 makes center == half, phat=1 mirrors — the
    // interval endpoint is EXACT, a property the Wald interval lacks
    assert(out("zero")._5 == 0.0 && out("zero")._4 == 0.0)
    assert(math.abs(out("all")._6 - 1.0) < 1e-15 && out("all")._4 == 1.0)
    // and both stay inside [0,1]
    assert(out.values.forall(r => r._5 >= 0.0 && r._6 <= 1.0 + 1e-15))
  }

  test("rateWilsonCi: NULL flags count toward n as non-successes") {
    val df = Seq(("g", Some(true)), ("g", None), ("g", Some(false)))
      .toDF("g", "f")
    val out = ProfileOps.rateWilsonCi(df, "g", $"f" === true)
      .as[(String, Long, Long, Double, Double, Double)].collect().head
    assert(out._2 == 3 && out._3 == 1)
  }

  test("rateWilsonCi: interval narrows as n grows at fixed rate") {
    val df = ((1 to 10).map(i => ("small", i <= 5)) ++
      (1 to 1000).map(i => ("big", i <= 500))).toDF("g", "f")
    val out = ProfileOps.rateWilsonCi(df, "g", $"f")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> (r._6 - r._5)).toMap
    assert(out("big") < out("small") / 5)
  }

  test("categoricalProfile: uniform, skewed and single-category groups") {
    val df = (
      Seq.fill(5)(("uni", "en")) ++ Seq.fill(5)(("uni", "de")) ++
        Seq.fill(9)(("skew", "en")) ++ Seq(("skew", "de")) ++
        Seq.fill(4)(("mono", "en"))).toDF("g", "c")
    val out = ProfileOps.categoricalProfile(df, "g", "c")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // uniform 2-cat: H ≈ ln 2, norm ≈ 1 (quantized terms), gini = 0.5
    assert(out("uni")._2 == 10 && out("uni")._3 == 2)
    assert(math.abs(out("uni")._4 - math.log(2)) < 1e-8)
    assert(math.abs(out("uni")._6 - 1.0) < 1e-8)
    assert(out("uni")._5 == 0.5)
    // single category: zero entropy, zero gini, norm defined as 0
    assert(out("mono")._3 == 1 && out("mono")._4 == 0.0 &&
      out("mono")._5 == 0.0 && out("mono")._6 == 0.0)
    // skewed beats uniform on concentration: lower entropy, lower gini
    assert(out("skew")._4 < out("uni")._4)
    assert(out("skew")._5 < out("uni")._5)
  }

  test("volumeAnomaly: hand-checked median/MAD flags incl. the MAD=0 edge") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    // counts per hour: 10,10,10,10,100 → med 10, MAD 0: only nonzero
    // deviation flags
    val rows = (0 until 4).flatMap(h => Seq.fill(10)(ts(h))) ++
      Seq.fill(100)(ts(4))
    val out = ProfileOps.volumeAnomaly(rows.toDF("t"), "t", "hour", k = 4.0)
      .orderBy($"bucket")
      .as[(Timestamp, Long, Double, Double, Double, Boolean)]
      .collect().toSeq
    assert(out.map(_._2) == Seq(10L, 10L, 10L, 10L, 100L))
    assert(out.forall(r => r._3 == 10.0 && r._5 == 0.0))
    assert(out.map(_._6) == Seq(false, false, false, false, true))
    intercept[IllegalArgumentException] {
      ProfileOps.volumeAnomaly(rows.toDF("t"), "t", "hour", k = 0.0)
    }
  }

  test("bootstrapMeanCi: CI brackets the mean and narrows with n") {
    def run(n: Int) = ProfileOps.bootstrapMeanCi(
      (1 to n).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "x"),
      "id", "x")
      .as[(Long, Double, Double, Double, Long)].collect().head
    val small = run(200)
    val big = run(5000)
    assert(small._1 == 200 && small._5 == 33)
    assert(small._3 < small._2 && small._2 < small._4, s"$small")
    assert(big._3 < big._2 && big._2 < big._4, s"$big")
    assert((big._4 - big._3) < (small._4 - small._3), s"$small vs $big")
    // deterministic: same inputs, same CI bits
    assert(run(200) == run(200))
  }

  test("bootstrapMeanCi rejects percentiles that need interpolation") {
    val df = Seq((1L, 1.0)).toDF("id", "x")
    val e = intercept[IllegalArgumentException] {
      ProfileOps.bootstrapMeanCi(df, "id", "x", b = 33, loP = 0.025,
        hiP = 0.975)
    }
    assert(e.getMessage.contains("order statistic"), e.getMessage)
    intercept[IllegalArgumentException] {
      ProfileOps.bootstrapMeanCi(df, "id", "x", b = 4)
    }
  }

  test("targetEncode: hand-computed m-estimate shrinkage") {
    // cats: a = {10, 20} (mean 15), b = {40} — global prior 70/3
    // enc_a = (30 + 3·(70/3)) / (2 + 3) = 100/5 = 20
    // enc_b = (40 + 3·(70/3)) / (1 + 3) = 110/4 = 27.5
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 40.0)).toDF("c", "y")
    val out = ProfileOps.targetEncode(df, "c", "y", m = 3.0)
      .orderBy($"c").as[(String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 2L, 30.0, 20.0), ("b", 1L, 40.0, 27.5)),
      out.mkString(","))
  }

  test("targetEncode: m=0 degenerates to the raw per-category mean") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("c", "y")
    val out = ProfileOps.targetEncode(df, "c", "y", m = 0.0)
      .orderBy($"c").as[(String, Long, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._4)) == Seq(("a", 2.0), ("b", 10.0)))
  }

  test("targetEncode: a rare category shrinks toward the prior, a big one doesn't") {
    val rows = (1 to 1000).map(i => ("big", 100.0)) :+ (("rare", 0.0))
    val out = ProfileOps.targetEncode(rows.toDF("c", "y"), "c", "y", m = 10.0)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    val prior = 100.0 * 1000 / 1001
    assert(math.abs(out("big") - 100.0) < 0.05, s"$out")
    // rare (n=1, y=0) → (0 + 10·prior)/11 ≈ 0.909·prior, NOT 0
    assert(out("rare") > 0.8 * prior, s"$out prior=$prior")
  }

  test("targetEncode: NULL categories and targets are excluded; m >= 0 enforced") {
    val df = Seq((Some("a"), Some(2.0)), (None, Some(9.0)), (Some("a"), None))
      .toDF("c", "y")
    val out = ProfileOps.targetEncode(df, "c", "y")
      .as[(String, Long, Double, Double)].collect()
    assert(out.length == 1 && out.head._2 == 1L && out.head._3 == 2.0)
    intercept[IllegalArgumentException] {
      ProfileOps.targetEncode(df, "c", "y", m = -1.0)
    }
  }

  test("rateWilsonCi is ONE aggregate — a single shuffle on the group key") {
    val df = Seq(("a", true), ("b", false)).toDF("g", "f")
    val plan = ProfileOps.rateWilsonCi(df, "g", $"f")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("weightedMedian: hand-computed lower weighted median per group") {
    import spark.implicits._
    // group a: values 1(w 1), 2(w 1), 3(w 10) → total 12, half 6 →
    //   cum reaches 6 first at value 3
    // group b: values 1(w 3), 2(w 1) → total 4, cum(1) = 3, 2·3 ≥ 4 → 1
    // group c: equal weights over 1..4 → 2·cum(2) = 4 ≥ 4 → lower = 2
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0),
      ("b", 1.0, 3.0), ("b", 2.0, 1.0),
      ("c", 1.0, 1.0), ("c", 2.0, 1.0), ("c", 3.0, 1.0), ("c", 4.0, 1.0))
      .toDF("g", "v", "w")
    val got = ProfileOps.weightedMedian(df, "g", "v", "w")
      .orderBy($"g").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 3.0), ("b", 1.0), ("c", 2.0)), got.mkString(","))
  }

  test("weightedMedian: duplicate values pool their weight; NULLs excluded") {
    import spark.implicits._
    // value 2 appears twice with weight 2 each → pooled 4 of total 6
    val df = Seq(
      ("a", Some(2.0), Some(2.0)), ("a", Some(2.0), Some(2.0)),
      ("a", Some(9.0), Some(2.0)),
      ("a", None, Some(50.0)), ("a", Some(1.0), None))
      .toDF("g", "v", "w")
    val got = ProfileOps.weightedMedian(df, "g", "v", "w")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 2.0)), got.mkString(","))
  }

  test("weightedMedian: unit weights reduce to the plain lower median") {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    val rows = for { g <- 1 to 3; _ <- 1 to 25 }
      yield (g.toLong, rng.nextInt(50).toDouble, 1.0)
    val df = rows.toDF("g", "v", "w")
    val got = ProfileOps.weightedMedian(df, "g", "v", "w")
      .as[(Long, Double)].collect().toMap
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      // lower median: smallest v with 2·#(≤v) ≥ n
      g -> sorted((sorted.size - 1) / 2)
    }
    assert(got == expected, s"got $got expected $expected")
  }

  test("weightedQuantiles: hand-computed grid; q=0.5 equals weightedMedian") {
    import spark.implicits._
    // group a: values 1..4, weights 1,2,3,4 (total 10):
    //   q=.25 → cum 1+2=3 ≥ 2.5 at value 2; q=.5 → cum 6 ≥ 5 at 3;
    //   q=.9 → cum 10 ≥ 9 at 4; q=1.0 → 4
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 3.0), ("a", 4.0, 4.0))
      .toDF("g", "v", "w")
    val got = ProfileOps.weightedQuantiles(df, "g", "v", "w",
      Seq(0.25, 0.5, 0.9, 1.0))
      .orderBy($"q").as[(String, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 0.25, 2.0), ("a", 0.5, 3.0), ("a", 0.9, 4.0),
      ("a", 1.0, 4.0)), got.mkString(","))
    val med = ProfileOps.weightedMedian(df, "g", "v", "w")
      .as[(String, Double)].collect().head._2
    assert(med == got(1)._3)
  }

  test("weightedQuantiles validates q range and granularity") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1.0)).toDF("g", "v", "w")
    intercept[IllegalArgumentException] {
      ProfileOps.weightedQuantiles(df, "g", "v", "w", Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      ProfileOps.weightedQuantiles(df, "g", "v", "w", Seq(0.123456))
    }
    intercept[IllegalArgumentException] {
      ProfileOps.weightedQuantiles(df, "g", "v", "w", Seq.empty)
    }
  }

  test("benfordProfile: hand-computed digits, zero-filled grid, χ² replay") {
    import spark.implicits._
    // digits: 1.23→1, 1.99→1 (floor(198.999…)=198, still digit 1),
    // 2.50→2, 94.2→9; 0.005 (< 0.01) and −3.0 excluded
    val df = Seq(1.23, 1.99, 2.50, 0.005, -3.0, 94.2).toDF("v")
    val got = ProfileOps.benfordProfile(df, "v").orderBy($"digit").collect()
    assert(got.map(_.getInt(0)).toSeq == (1 to 9))
    val n = got.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(n(1) == 2 && n(2) == 1 && n(9) == 1 && n(3) == 0, n)
    def q6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e1 = q6(math.log10(2.0)); val t = 4.0
    val r1 = got(0)
    assert(r1.getDouble(2) == 2.0 / 4.0)
    assert(r1.getDouble(3) == e1)
    assert(r1.getDouble(4) == (2.0 - e1 * t) * (2.0 - e1 * t) / (e1 * t))
    // an absent digit still carries its expectation and χ² mass
    val r3 = got(2)
    val e3 = q6(math.log10(1.0 + 1.0 / 3.0))
    // same op chain as the engine, not the algebraic e·t simplification
    val chi3 = (0.0 - e3 * t) * (0.0 - e3 * t) / (e3 * t)
    assert(r3.getLong(1) == 0L && r3.getDouble(4) == chi3)
  }

  test("benfordProfile: a Benford-conforming sample has small χ² terms") {
    import spark.implicits._
    // 1000 values of 10^u, u uniform in [0,3) via a seeded generator —
    // the canonical Benford-distributed construction
    val rng = new scala.util.Random(7L)
    val vals = Seq.fill(1000)(math.pow(10.0, rng.nextDouble() * 3.0))
    val terms = ProfileOps.benfordProfile(vals.toDF("v"), "v")
      .select($"chi2_term").as[Double].collect()
    assert(terms.sum < 21.0, // χ²(8 df) 99th percentile ≈ 20.1
      s"conforming sample should pass the χ² gate, terms=${terms.toList}")
  }

  test("giniByGroup: equal values → 0, extreme concentration → hand value") {
    import spark.implicits._
    val df = Seq(
      ("eq", 5.0), ("eq", 5.0), ("eq", 5.0),
      ("cc", 0.0), ("cc", 0.0), ("cc", 0.0), ("cc", 10.0))
      .toDF("g", "v")
    val got = ProfileOps.giniByGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got("eq") == ((3L, 0.0)), got("eq"))
    // (2·40 − 5·10)/(4·10) = 0.75
    assert(got("cc") == ((4L, 0.75)), got("cc"))
  }

  test("giniByGroup: tie order cannot leak — partitioning invariance") {
    import spark.implicits._
    val rng = new scala.util.Random(3L)
    val rows = for { g <- 1 to 3; _ <- 1 to 40 }
      yield (g.toLong, rng.nextInt(5).toDouble) // heavy ties
    val df = rows.toDF("g", "v")
    val a = ProfileOps.giniByGroup(df, "g", "v").orderBy($"g").collect().toSeq
    val b = ProfileOps.giniByGroup(df.repartition(7), "g", "v")
      .orderBy($"g").collect().toSeq
    assert(a == b)
  }

  test("giniByGroup rejects negative values in-plan") {
    import spark.implicits._
    val e = intercept[Exception] {
      ProfileOps.giniByGroup(Seq(("a", -1.0)).toDF("g", "v"), "g", "v").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("negative value"), messages(e))
  }

  test("weightedMedian rejects negative weights in-plan and non-numeric types") {
    import spark.implicits._
    val bad = Seq(("a", 1.0, -2.0)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      ProfileOps.weightedMedian(bad, "g", "v", "w").collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("negative weight"), messages(e))
    val str = Seq(("a", "x", 1.0)).toDF("g", "v", "w")
    intercept[IllegalArgumentException] {
      ProfileOps.weightedMedian(str, "g", "v", "w")
    }
  }

  test("iqrOutliers: hand-computed quartiles, fences, and the dyadic-k guard") {
    import spark.implicits._
    val rows = ((1L to 8L).map(("a", _)) :+ (("a", 100L))).toDF("g", "v")
    val out = ProfileOps.iqrOutliers(rows, "g", "v").collect().head
    // 9 values 1..8,100: q1 at rank 2 = 3.0, q3 at rank 6 = 7.0,
    // fences [3 − 6, 7 + 6] = [−3, 13] → only 100 is out
    assert(out.getLong(1) == 9L)
    assert(out.getDouble(2) == 3.0 && out.getDouble(3) == 7.0)
    assert(out.getDouble(4) == 4.0)
    assert(out.getLong(5) == 1L, out)
    intercept[IllegalArgumentException] {
      ProfileOps.iqrOutliers(rows, "g", "v", k = 1.3)
    }
  }

  test("welchTTest: hand-computed statistic and Welch-Satterthwaite df") {
    import spark.implicits._
    val rows = (Seq(1L, 2L, 3L).map(("a", 0L, _)) ++
      Seq(2L, 4L, 6L, 8L).map(("b", 0L, _)))
      .toDF("g", "pad", "v")
    val r = ProfileOps.welchTTest(rows, "g", "v", "a", "b").collect().head
    // A: n=3 mean=2 s2/n=1/3; B: n=4 mean=5 s2/n=5/3
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(math.abs(r.getDouble(4) - 1.0 / 3.0) < 1e-15)
    assert(math.abs(r.getDouble(5) - 5.0 / 3.0) < 1e-15)
    assert(math.abs(r.getDouble(6) - (-3.0 / math.sqrt(2.0))) < 1e-12)
    assert(math.abs(r.getDouble(7) - 216.0 / 53.0) < 1e-12)
  }

  test("robustScale: hand-computed, degenerate IQR yields NULL") {
    import spark.implicits._
    // group a: 1..9 → med 5, iqr = 7 − 3 = 4; group b: constant → NULL
    val rows = ((1L to 9L).map(("a", _)) ++ Seq.fill(4)(("b", 7L)))
      .toDF("g", "v")
    val out = ProfileOps.robustScale(rows, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    out.filter(_._1 == "a").foreach { case (_, v, sc) =>
      assert(sc.contains((v - 5.0) / 4.0), (v, sc))
    }
    assert(out.filter(_._1 == "b").forall(_._3.isEmpty))
  }

  test("spearmanMatrix: hand-computed rho with average tie ranks") {
    import spark.implicits._
    // x = (1,2,2,3) → r2 = (2,5,5,8); y = (3,1,1,2) → r2 = (8,3,3,6)
    // n=4 Σa=20 Σb=20 Σaa=118 Σbb=118 Σab=94
    // va = vb = 4·118−400 = 72; cov = 4·94−400 = −24 → ρ = −1/3
    val df = Seq((1L, 3L), (2L, 1L), (2L, 1L), (3L, 2L)).toDF("x", "y")
    val r = ProfileOps.spearmanMatrix(df, Seq("x", "y")).collect().head
    assert(r.getString(0) == "x" && r.getString(1) == "y")
    assert(r.getLong(2) == 4L)
    assert(math.abs(r.getDouble(3) - (-1.0 / 3.0)) < 1e-12)
  }

  test("spearmanMatrix: monotone-nonlinear reads 1 where Pearson reads < 1") {
    import spark.implicits._
    val df = Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 100L)).toDF("x", "y")
    val rho = ProfileOps.spearmanMatrix(df, Seq("x", "y"))
      .collect().head.getDouble(3)
    assert(math.abs(rho - 1.0) < 1e-12, rho)
    val pearson = ProfileOps.corrMatrix(df, Seq("x", "y"))
      .collect().head.getDouble(3)
    assert(pearson < 0.95, pearson)
    // outlier robustness: inflating the max y 100× moves ρ not at all
    val inflated = Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 10000L))
      .toDF("x", "y")
    val rho2 = ProfileOps.spearmanMatrix(inflated, Seq("x", "y"))
      .collect().head.getDouble(3)
    assert(rho2 == rho, (rho, rho2))
  }

  test("spearmanMatrix: listwise deletion, constant column → NULL, args") {
    import spark.implicits._
    // the NULL z row must drop from EVERY pair (listwise), shrinking n
    val df = Seq(
      (Some(1L), Some(1L), Some(5L)), (Some(2L), Some(2L), Some(5L)),
      (Some(3L), Some(3L), None), (Some(4L), Some(4L), Some(5L)))
      .toDF("x", "y", "z")
    val out = ProfileOps.spearmanMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(out.forall(_._3 == 3L), out)  // n = 3 everywhere
    val byPair = out.map(t => (t._1, t._2) -> t._4).toMap
    assert(byPair(("x", "y")).exists(v => math.abs(v - 1.0) < 1e-12))
    // z is constant on the complete rows → zero variance → NULL
    assert(byPair(("x", "z")).isEmpty && byPair(("y", "z")).isEmpty)
    intercept[IllegalArgumentException] {
      ProfileOps.spearmanMatrix(df, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      ProfileOps.spearmanMatrix(df, Seq("x", "x"))
    }
  }

  // --- rocAuc ----------------------------------------------------------

  test("rocAuc: hand-computed with tied scores (average ranks)") {
    // scores 0.1(-), 0.2(-), 0.2(+), 0.3(+): tied 0.2s share rank 2.5,
    // R+ = 2.5 + 4 = 6.5 → AUC = (6.5 - 3) / 4 = 0.875, Gini 0.75
    val df = Seq((0.1, 0), (0.2, 0), (0.2, 1), (0.3, 1)).toDF("s", "y")
    val r = ProfileOps.rocAuc(df, "s", "y")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(r == ((4L, 2L, 2L, 0.875, 0.75)))
  }

  test("rocAuc: perfect separation → 1.0; constant score → exactly 0.5") {
    val perfect = Seq((0.1, 0), (0.2, 0), (0.8, 1)).toDF("s", "y")
    assert(ProfileOps.rocAuc(perfect, "s", "y")
      .select($"auc").as[Double].collect().head == 1.0)
    val flat = Seq((0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)).toDF("s", "y")
    assert(ProfileOps.rocAuc(flat, "s", "y")
      .select($"auc").as[Double].collect().head == 0.5)
  }

  test("rocAuc: single-class input → NULL AUC; non-binary label rejected") {
    val onlyPos = Seq((0.1, 1), (0.9, 1)).toDF("s", "y")
    val r = ProfileOps.rocAuc(onlyPos, "s", "y")
      .select($"auc").as[Option[Double]].collect().head
    assert(r.isEmpty)
    val bad = Seq((0.1, 2)).toDF("s", "y")
    intercept[Exception] {
      ProfileOps.rocAuc(bad, "s", "y").collect()
    }
  }

  test("rocAuc: partitioning-invariant and matches a local rank-sum replay") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val y = rnd.nextInt(2)
      // overlapping distributions with deliberate tie mass
      (math.round((rnd.nextDouble() * 0.5 + y * 0.3) * 20) / 20.0, y)
    }
    val df = rows.toDF("s", "y")
    val a1 = ProfileOps.rocAuc(df, "s", "y")
      .select($"auc").as[Double].collect().head
    val a2 = ProfileOps.rocAuc(df.repartition(13), "s", "y")
      .select($"auc").as[Double].collect().head
    assert(a1 == a2)
    // local replay: average ranks over sorted scores
    val sorted = rows.sortBy(_._1)
    val rankByScore = sorted.zipWithIndex.groupBy(_._1._1)
      .map { case (s, g) => s -> g.map(_._2 + 1.0).sum / g.size }
    val npos = rows.count(_._2 == 1).toDouble
    val nneg = rows.size - npos
    val rpos = rows.filter(_._2 == 1).map(r => rankByScore(r._1)).sum
    val expected = (rpos - npos * (npos + 1) / 2) / (npos * nneg)
    assert(math.abs(a1 - expected) < 1e-12)
  }

  // --- kendallTau ------------------------------------------------------

  test("kendallTau: perfect concordance → 1; symmetric ties → 0") {
    val mono = Seq((1, 1), (2, 2), (3, 3)).toDF("a", "b")
    val r = ProfileOps.kendallTau(mono, "a", "b")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r == ((3L, 3L, 0L, 1.0)))
    // one concordant, one discordant, ties on both marginals → τ = 0
    val sym = Seq((1, 1), (1, 2), (2, 1), (2, 2)).toDF("a", "b")
    val r2 = ProfileOps.kendallTau(sym, "a", "b")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r2 == ((4L, 1L, 1L, 0.0)))
  }

  test("kendallTau: matches a brute-force O(n²) local replay with ties") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 120).map(_ => (rnd.nextInt(6), rnd.nextInt(4)))
    val got = ProfileOps.kendallTau(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].collect().head
    var c = 0L; var d = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.size) {
      val s = (rows(i)._1 - rows(j)._1).sign * (rows(i)._2 - rows(j)._2).sign
      if (s > 0) c += 1 else if (s < 0) d += 1
    }
    val n = rows.size.toLong
    val n0 = n * (n - 1) / 2
    val t1 = rows.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val t2 = rows.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val tau = (c - d).toDouble /
      math.sqrt(((n0 - t1) * (n0 - t2)).toDouble)
    assert(got._2 == c && got._3 == d)
    assert(got._4 == tau)
    // partitioning invariance
    val got2 = ProfileOps.kendallTau(
      rows.toDF("a", "b").repartition(7), "a", "b")
      .select($"tau_b").as[Double].collect().head
    assert(got2 == got._4)
  }

  test("kendallTau: an all-tied column yields NULL τ, NULLs drop listwise") {
    val df = Seq((Some(1), Some(1)), (Some(1), Some(2)), (None, Some(3)),
      (Some(1), None)).toDF("a", "b")
    val r = ProfileOps.kendallTau(df, "a", "b")
      .select($"n", $"tau_b").as[(Long, Option[Double])].collect().head
    assert(r._1 == 2L && r._2.isEmpty)
  }

  // --- bhFdr -----------------------------------------------------------

  test("invNormalCdf: standard quantiles to 1e-8") {
    assert(math.abs(ProfileOps.invNormalCdf(0.975) - 1.959963984540054) < 1e-8)
    assert(math.abs(ProfileOps.invNormalCdf(0.5)) < 1e-9)
    assert(math.abs(ProfileOps.invNormalCdf(0.025) + 1.959963984540054) < 1e-8)
    // the tail branch
    assert(math.abs(ProfileOps.invNormalCdf(0.001) + 3.090232306167814) < 1e-7)
    intercept[IllegalArgumentException] { ProfileOps.invNormalCdf(0.0) }
  }

  test("bhFdr: an extreme group is flagged, step-up is a suffix property") {
    // group A: 95/100 vs pooled ≈ 0.55 → |z| huge; B–E near the pool
    val rows =
      (1 to 100).map(i => ("A", if (i <= 95) 1 else 0)) ++
      (1 to 100).map(i => ("B", if (i <= 52) 1 else 0)) ++
      (1 to 100).map(i => ("C", if (i <= 48) 1 else 0)) ++
      (1 to 100).map(i => ("D", if (i <= 51) 1 else 0)) ++
      (1 to 100).map(i => ("E", if (i <= 49) 1 else 0))
    val out = ProfileOps.bhFdr(rows.toDF("g", "s"), "g", "s", m = 5)
      .orderBy($"rank")
      .as[(String, Int, Long, Long, Double, Double, Int, Int)]
      .collect().toSeq
    assert(out.size == 5)
    assert(out.head._1 == "A" && out.head._8 == 1) // extreme group rejected
    // significant is a suffix-max of pass_raw: never increases with rank
    assert(out.map(_._8) == out.map(_._8).sorted.reverse)
    // every significant rank's threshold relation holds via some j ≥ i
    val passIdx = out.filter(_._7 == 1).map(_._2)
    out.filter(_._8 == 1).foreach(r => assert(passIdx.exists(_ >= r._2)))
    // near-pool groups with tiny |z| are not flagged
    assert(out.filter(r => math.abs(r._5) < 1.0).forall(_._8 == 0))
  }

  // --- liftTable -------------------------------------------------------

  test("liftTable: hand-computed deciles, lift, and cumulative gains") {
    val rows = Seq(
      (1.0, 1L, 1), (0.9, 2L, 1), (0.8, 3L, 0), (0.7, 4L, 1), (0.6, 5L, 1),
      (0.5, 6L, 0), (0.4, 7L, 0), (0.3, 8L, 1), (0.2, 9L, 0), (0.1, 10L, 0))
    val out = ProfileOps.liftTable(rows.toDF("s", "id", "y"), "s", "y", "id",
      nBuckets = 5)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0, 1, 2, 3, 4))
    assert(out.map(_._3) == Seq(2L, 1L, 1L, 1L, 0L)) // n_pos per bucket
    assert(out.head._4 == 1.0 && out.head._5 == 2.0) // rate, lift = 1.0/(5/10)
    assert(out.map(_._6) == Seq(0.4, 0.6, 0.8, 1.0, 1.0)) // cum_gain
    assert(out.map(_._7) == Seq(0.2, 0.4, 0.6, 0.8, 1.0)) // cum_frac
  }

  test("liftTable: tied scores straddle bucket edges by id, deterministically") {
    val rows = (1L to 10L).map(i => (0.5, i, if (i <= 3) 1 else 0))
    val a = ProfileOps.liftTable(rows.toDF("s", "id", "y"), "s", "y", "id",
      nBuckets = 2)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect().toSeq
    // ids 1..5 land in bucket 0 (rank order = id order under the tie)
    assert(a.map(t => (t._1, t._3)) == Seq((0, 3L), (1, 0L)))
    val b = ProfileOps.liftTable(rows.toDF("s", "id", "y").repartition(7),
      "s", "y", "id", nBuckets = 2)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(a == b)
  }

  test("liftTable: no positives → NULL lift/gain; validation") {
    val rows = Seq((0.9, 1L, 0), (0.1, 2L, 0))
    val out = ProfileOps.liftTable(rows.toDF("s", "id", "y"), "s", "y", "id",
      nBuckets = 2).select($"lift", $"cum_gain")
      .as[(Option[Double], Option[Double])].collect().toSeq
    assert(out.forall(t => t._1.isEmpty && t._2.isEmpty))
    intercept[IllegalArgumentException] {
      ProfileOps.liftTable(rows.toDF("s", "id", "y"), "s", "y", "id", 1)
    }
  }

  // --- mannWhitney -------------------------------------------------------

  test("mannWhitney: hand-computed U, tie-corrected z, rank-biserial") {
    // A = [1,2,2], B = [2,3]: midranks 1, 3,3,3, 5 → R_A = 7, U_A = 1
    val df = Seq(("A", 1), ("A", 2), ("A", 2), ("B", 2), ("B", 3))
      .toDF("g", "v")
    val r = ProfileOps.mannWhitney(df, "g", "v", "A", "B")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(r._1 == 3L && r._2 == 2L && r._3 == 1.0)
    val sig2 = (3.0 * 2.0 / 12.0) * ((5.0 + 1.0) - 24.0 / (5.0 * 4.0))
    assert(r._4 == (1.0 - 3.0 * 2.0 / 2.0) / math.sqrt(sig2))
    assert(r._5 == 2.0 * 1.0 / (3.0 * 2.0) - 1.0)
  }

  test("mannWhitney: U/(n1·n2) equals rocAuc with A as the positive class") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { _ =>
      val g = if (rnd.nextBoolean()) "A" else "B"
      (g, rnd.nextInt(12) + (if (g == "A") 3 else 0))
    }
    val mw = ProfileOps.mannWhitney(rows.toDF("g", "v"), "g", "v", "A", "B")
      .as[(Long, Long, Double, Double, Double)].collect().head
    val auc = ProfileOps.rocAuc(
      rows.map { case (g, v) => (v, if (g == "A") 1 else 0) }.toDF("s", "y"),
      "s", "y").select($"auc").as[Double].collect().head
    assert(math.abs(mw._3 / (mw._1 * mw._2).toDouble - auc) < 1e-12)
    // degenerate: one empty group → NULL z
    val one = ProfileOps.mannWhitney(
      Seq(("A", 1), ("A", 2)).toDF("g", "v"), "g", "v", "A", "B")
      .select($"z").as[Option[Double]].collect().head
    assert(one.isEmpty)
    intercept[IllegalArgumentException] {
      ProfileOps.mannWhitney(rows.toDF("g", "v"), "g", "v", "A", "A")
    }
  }

  // --- cohensD -------------------------------------------------------

  test("cohensD: hand-computed d and Hedges' g; degenerate → NULL") {
    // A = [2,4,6] (mean 4, var 4), B = [1,3] (mean 2, var 2)
    // pooled = (2·4 + 1·2)/3 = 10/3; d = 2/sqrt(10/3)
    val df = Seq(("A", 2L), ("A", 4L), ("A", 6L), ("B", 1L), ("B", 3L))
      .toDF("g", "v")
    val r = ProfileOps.cohensD(df, "g", "v", "A", "B")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(r._1 == 3L && r._2 == 2L && r._3 == 4.0 && r._4 == 2.0)
    val pooled = ((3.0 - 1.0) * 4.0 + (2.0 - 1.0) * 2.0) / (3.0 + 2.0 - 2.0)
    val d = (4.0 - 2.0) / math.sqrt(pooled)
    assert(r._5 == d)
    assert(r._6 == d * (1.0 - 3.0 / (4.0 * (3.0 + 2.0) - 9.0)))
    // single-row group → NULL effect
    val one = ProfileOps.cohensD(
      Seq(("A", 1L), ("A", 2L), ("B", 5L)).toDF("g", "v"), "g", "v", "A", "B")
      .select($"cohens_d").as[Option[Double]].collect().head
    assert(one.isEmpty)
    intercept[IllegalArgumentException] {
      ProfileOps.cohensD(df, "g", "v", "A", "A")
    }
  }

  // --- powerTwoProportion ------------------------------------------------

  test("powerTwoProportion: hand-computed required n, infeasible lift → NULL") {
    val rows = (1 to 100).map(i => ("g", if (i <= 50) 1 else 0)) ++
      (1 to 10).map(_ => ("h", 1)) // rate 1.0: p2 > 1 → NULL
    val out = ProfileOps.powerTwoProportion(rows.toDF("g", "s"), "g", "s",
      delta = 0.05)
      .as[(String, Long, Long, Double, Option[Double], Option[Int])]
      .collect().map(r => r._1 -> r).toMap
    val za = ProfileOps.invNormalCdf(0.975); val zb = ProfileOps.invNormalCdf(0.8)
    val p1 = 0.5; val p2 = p1 + 0.05; val pbar = (p1 + p2) / 2.0
    val s = za * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
      zb * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    assert(out("g")._5.contains(s * s / (0.05 * 0.05)))
    assert(out("g")._6.contains(0)) // 100 < ~1565 required
    assert(out("h")._5.isEmpty && out("h")._6.isEmpty)
    intercept[IllegalArgumentException] {
      ProfileOps.powerTwoProportion(rows.toDF("g", "s"), "g", "s", delta = 0.0)
    }
  }

  test("bhFdr: declared m must match the group count") {
    val df = Seq(("A", 1), ("B", 0), ("C", 1)).toDF("g", "s")
    intercept[Exception] {
      ProfileOps.bhFdr(df, "g", "s", m = 4).collect()
    }
    intercept[IllegalArgumentException] {
      ProfileOps.bhFdr(df, "g", "s", m = 0)
    }
    intercept[IllegalArgumentException] {
      ProfileOps.bhFdr(df, "g", "s", m = 3, q = 1.5)
    }
  }
}
