package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Ts family of the operator catalog (11 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogTs {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // Rolling 24-bucket OLS slope over the hourly click-count series —
    // the LOCAL trend diagnostic between ts_ewma's level smoothing and
    // profile_regression's global fit ("is load rising over the last
    // day, per hour"). x is the bucket's row_number (exact integers),
    // the four moments are DECIMAL window-frame sums (ROWS 23
    // PRECEDING — partial frames at the head emit NULL below n=2 or
    // zero x-variance), and the slope is the profile_regression fixed
    // IEEE chain — the oracle restates frames and chain verbatim. The
    // series grain is bounded (≤ hours in the table's history), so the
    // partition-less window is the documented bounded-frame contract.
    "ts_rolling_slope" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .filter(col("event_type") === "click")
          .groupBy(date_trunc("hour", col("ts")).as("bucket"))
          .agg(count(lit(1)).as("y"))
        val wOrd = Window.orderBy(col("bucket"))
        val wf = wOrd.rowsBetween(-23, 0)
        val d19 = DecimalType(19, 0)
        val withX = hourly
          .withColumn("x", row_number().over(wOrd).cast(d19))
        val n = count(lit(1)).over(wf).cast(DoubleType)
        val sx = sum(col("x")).over(wf).cast(DoubleType)
        val sxx = sum(col("x") * col("x")).over(wf).cast(DoubleType)
        val sy = sum(col("y").cast(d19)).over(wf).cast(DoubleType)
        val sxy = sum(col("x") * col("y").cast(d19)).over(wf)
          .cast(DoubleType)
        withX.select(col("bucket"), col("y"),
            count(lit(1)).over(wf).cast(IntegerType).as("n_window"),
            when(n > 1.0 && n * sxx - sx * sx > 0.0,
              (n * sxy - sx * sy) / (n * sxx - sx * sx)).as("slope"))
          .orderBy(col("bucket"))
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS bucket,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM events WHERE event_type = 'click' GROUP BY 1),
             |wx AS (
             |  SELECT bucket, y,
             |    CAST(row_number() OVER (ORDER BY bucket) AS DECIMAL(19,0))
             |      AS x
             |  FROM hourly),
             |m AS (
             |  SELECT bucket, y,
             |    CAST(count(*) OVER w AS DOUBLE) AS n,
             |    CAST(count(*) OVER w AS INTEGER) AS n_window,
             |    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
             |    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(y AS DECIMAL(19,0))) OVER w AS DOUBLE) AS sy,
             |    CAST(SUM(x * CAST(y AS DECIMAL(19,0))) OVER w AS DOUBLE)
             |      AS sxy
             |  FROM wx
             |  WINDOW w AS (ORDER BY bucket
             |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
             |SELECT bucket, y, n_window,
             |  CASE WHEN n > 1.0 AND n * sxx - sx * sx > 0.0
             |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope
             |FROM m ORDER BY bucket""".stripMargin)),


    // Windowed EWMA: aggregate-HOF fold over a collect_list ROWS frame —
    // a FIXED left-to-right IEEE op chain, so DuckDB's list_reduce
    // reproduces it bit-for-bit (probed: identical doubles). One shuffle
    // on the key, O(span) state per row; the exact-recurrence twin
    // (ewmaExact, O(1)-state sorted stream) is unit-tested against this
    // one's truncation bound in TimeSeriesOpsSpec.
    "ts_ewma" -> QuerySpec(
      (s, d) => TimeSeriesOps.ewmaWindowed(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "event_id", "value", alpha = 0.25, span = 20)
        .orderBy(col("event_id")),
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events)
             |SELECT event_id, user_id, value,
             |  list_reduce(lst, (acc, x) -> acc * 0.75 + x * 0.25) AS ewma
             |FROM l ORDER BY event_id""".stripMargin)),


    // Holt linear (double exponential) smoothing
    // (TimeSeriesOps.holtWindowed): level+trend recursion over the same
    // 20-observation frame as ts_ewma — the trend-following monitor
    // EWMA structurally lags on. α/β complements are exact binary
    // fractions (0.75, 0.875) so the mirrored SQL literals are the
    // same doubles; the fold carries a [l, b] ARRAY accumulator on
    // both engines — NOT a struct, because DuckDB's list_reduce
    // mutates a struct accumulator in place field by field (the second
    // field's formula would read the first field's NEW value; measured
    // divergence, pinned by the holtWindowed fixture unit) ⇒ fully
    // oracled bit-for-bit.
    "ts_holt_linear" -> QuerySpec(
      (s, d) => TimeSeriesOps.holtWindowed(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "event_id", "value",
        alpha = 0.25, beta = 0.125, span = 20)
        .orderBy(col("event_id")),
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, value,
             |    list_reduce(
             |      list_transform(lst, x -> [x, CAST(0.0 AS DOUBLE)]),
             |      (acc, e) -> [
             |        e[1] * 0.25 + 0.75 * (acc[1] + acc[2]),
             |        0.125 * ((e[1] * 0.25 + 0.75 * (acc[1] + acc[2]))
             |          - acc[1]) + 0.875 * acc[2]]) AS hw
             |  FROM l)
             |SELECT event_id, user_id, value,
             |  hw[1] AS level, hw[2] AS trend, hw[1] + hw[2] AS forecast
             |FROM f ORDER BY event_id""".stripMargin)),


    // Holt-Winters additive seasonal (triple exponential) smoothing
    // (TimeSeriesOps.holtWintersWindowed): the [l, b, s₁..s₄] rotating
    // ARRAY accumulator over the same 20-observation frame — the
    // periodic-load monitor Holt structurally lags on. α/β/γ
    // complements are exact binary fractions (0.75, 0.875, 0.5); the
    // oracle repeats the level expression textually inside trend and
    // season (same IEEE ops — the holt-linear precedent) and rotates
    // the seasonal block positionally ⇒ fully oracled bit-for-bit.
    "ts_holt_winters" -> QuerySpec(
      (s, d) => TimeSeriesOps.holtWintersWindowed(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "event_id", "value",
        alpha = 0.25, beta = 0.125, gamma = 0.5, period = 4, span = 20)
        .orderBy(col("event_id")),
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, value,
             |    list_reduce(
             |      list_transform(lst, x -> [x, CAST(0.0 AS DOUBLE),
             |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]),
             |      (acc, e) -> [
             |        0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2]),
             |        0.125 * ((0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2]))
             |          - acc[1]) + 0.875 * acc[2],
             |        acc[4], acc[5], acc[6],
             |        0.5 * (e[1] - (0.25 * (e[1] - acc[3])
             |          + 0.75 * (acc[1] + acc[2]))) + 0.5 * acc[3]]) AS hw
             |  FROM l)
             |SELECT event_id, user_id, value,
             |  hw[1] AS level, hw[2] AS trend, hw[3] AS seasonal_next,
             |  hw[1] + hw[2] + hw[3] AS forecast
             |FROM f ORDER BY event_id""".stripMargin)),


    // ROLLING-ORIGIN BACKTEST of the Holt forecaster
    // (TimeSeriesOps.holtBacktest, round 13): every row is a forecast
    // origin, the h-step forecast level+h·trend is scored against the
    // realized value h rows later — per (series, horizon) n/MAE/sMAPE,
    // the gate that picks α/β/span and says which horizons to trust.
    // Errors are fixed IEEE chains over the bit-exact Holt fold,
    // quantized once to exact decimals (zero-denominator sMAPE terms
    // NULLed explicitly — engines disagree on double x/0), one IEEE
    // division per metric. MEASURED trap (the profile_gini cast class,
    // quantization direction): DuckDB's direct DOUBLE→DECIMAL cast
    // multiplies by 10^scale IN DOUBLE ARITHMETIC — double-rounding
    // that flipped one of ~100k values by 1e-6 vs Spark's exact
    // BigDecimal conversion — so the oracle quantizes through VARCHAR
    // (shortest-roundtrip print, then exact decimal rounding). The state window and all six lag
    // expressions share one (key, order) sort.
    "ts_backtest" -> QuerySpec(
      (s, d) => TimeSeriesOps.holtBacktest(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "event_id", "value",
        alpha = 0.25, beta = 0.125, span = 20, horizons = Seq(1, 2, 3))
        .orderBy(col("user_id"), col("horizon")),
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, value,
             |    list_reduce(
             |      list_transform(lst, x -> [x, CAST(0.0 AS DOUBLE)]),
             |      (acc, e) -> [
             |        e[1] * 0.25 + 0.75 * (acc[1] + acc[2]),
             |        0.125 * ((e[1] * 0.25 + 0.75 * (acc[1] + acc[2]))
             |          - acc[1]) + 0.875 * acc[2]]) AS hw
             |  FROM l),
             |g AS (
             |  SELECT user_id, value,
             |    lag(hw[1], 1) OVER w AS l1, lag(hw[2], 1) OVER w AS b1,
             |    lag(hw[1], 2) OVER w AS l2, lag(hw[2], 2) OVER w AS b2,
             |    lag(hw[1], 3) OVER w AS l3, lag(hw[2], 3) OVER w AS b3
             |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
             |e AS (
             |  SELECT user_id, h.horizon, value AS vv,
             |    CASE h.horizon WHEN 1 THEN l1 + 1.0 * b1
             |                   WHEN 2 THEN l2 + 2.0 * b2
             |                   ELSE l3 + 3.0 * b3 END AS fc
             |  FROM g CROSS JOIN (SELECT unnest([1, 2, 3]) AS horizon) h),
             |q AS (
             |  SELECT user_id, horizon,
             |    CAST(CAST(abs(vv - fc) AS VARCHAR) AS DECIMAL(20,6)) AS ae,
             |    CASE WHEN abs(vv) + abs(fc) = 0.0 THEN NULL
             |         ELSE CAST(CAST(2.0 * abs(vv - fc) / (abs(vv) + abs(fc))
             |                AS VARCHAR) AS DECIMAL(12,6)) END AS st
             |  FROM e WHERE fc IS NOT NULL),
             |a AS (
             |  SELECT user_id, CAST(horizon AS INTEGER) AS horizon,
             |    CAST(count(*) AS BIGINT) AS n,
             |    SUM(ae) AS sae,
             |    CAST(count(st) AS BIGINT) AS nst, SUM(st) AS sst
             |  FROM q GROUP BY 1, 2)
             |SELECT user_id, horizon, n,
             |  CAST(CAST(sae AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mae,
             |  CAST(CAST(sst AS VARCHAR) AS DOUBLE)
             |    / CAST(NULLIF(nst, 0) AS DOUBLE) AS smape
             |FROM a ORDER BY user_id, horizon""".stripMargin)),


    // Seasonal-residual anomaly alarm: value vs the PREVIOUS row's
    // Holt-Winters one-step forecast, flagged at 4× the series' median
    // absolute residual — the seasonality-aware outlier rule a plain
    // z/MAD rule false-alarms on every cycle peak of. Composes
    // ts_holt_winters' fold + one lag + an exact-percentile per-series
    // scale (parity pinned by fn_percentile); first row per series has
    // NULL residual/alarm as data.
    "ts_seasonal_alarm" -> QuerySpec(
      (s, d) => {
        val hw = TimeSeriesOps.holtWintersWindowed(
          t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
          "user_id", "event_id", "value",
          alpha = 0.25, beta = 0.125, gamma = 0.5, period = 4, span = 20)
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        // the per-series median rides as a WINDOW aggregate over the
        // same user partition — ONE pass over the (interpreted-HOF,
        // hence expensive) HW fold, no self-join, no checkpoint; an
        // aggregate-then-join shape re-evaluated the fold (measured
        // 7.1 s → this form); percentile ignores the first row's NULL
        val res = hw.withColumn("residual",
          col("value") - lag(col("forecast"), 1).over(w))
        res
          .withColumn("med_abs_resid",
            expr("percentile(abs(residual), 0.5)")
              .over(Window.partitionBy(col("user_id"))))
          .select(col("event_id"), col("user_id"), col("value"),
            col("residual"), col("med_abs_resid"),
            (abs(col("residual")) > col("med_abs_resid") * lit(4.0)).as("alarm"))
          .orderBy(col("event_id"))
      },
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, value,
             |    list_reduce(
             |      list_transform(lst, x -> [x, CAST(0.0 AS DOUBLE),
             |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]),
             |      (acc, e) -> [
             |        0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2]),
             |        0.125 * ((0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2]))
             |          - acc[1]) + 0.875 * acc[2],
             |        acc[4], acc[5], acc[6],
             |        0.5 * (e[1] - (0.25 * (e[1] - acc[3])
             |          + 0.75 * (acc[1] + acc[2]))) + 0.5 * acc[3]]) AS hw
             |  FROM l),
             |r AS (
             |  SELECT event_id, user_id, value,
             |    value - lag(hw[1] + hw[2] + hw[3], 1) OVER (
             |      PARTITION BY user_id ORDER BY event_id) AS residual
             |  FROM f),
             |m AS (
             |  SELECT event_id, user_id, value, residual,
             |    quantile_cont(abs(residual), 0.5) OVER (
             |      PARTITION BY user_id) AS mar
             |  FROM r)
             |SELECT event_id, user_id, value, residual,
             |  mar AS med_abs_resid,
             |  abs(residual) > mar * 4.0 AS alarm
             |FROM m ORDER BY event_id""".stripMargin)),


    // Sample autocorrelation function (TimeSeriesOps.acf): ACF at lags
    // 1..24 over the hourly event-count series — the seasonality
    // diagnostic that picks Holt-Winters' period. ONE corpus-scale
    // hour-bucket aggregation produces the series; everything after is
    // model-sized (the single-partition row_number window is bounded
    // by the hour count — ≤ ~720 buckets per 30-day fixture — the same
    // bounded-frame contract as agg_survival_km). Exactness: mean
    // cleared by ×n (dev = n·x − Σx exact longs), lag numerators and
    // the denominator exact DECIMAL(38,0) sums presented as DOUBLE
    // (r14: the long product wrapped once n·max|x| > ~3e9 — see the
    // acf scaladoc; the oracle mirrors with HUGEINT sums and the same
    // one correctly-rounded →DOUBLE cast), ONE IEEE division per lag
    // ⇒ fully oracled. Gaps note: the series is indexed by DENSE bucket
    // position (row index), so empty hours compress out — the
    // documented semantic both engines restate identically.
    "ts_acf" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val series = hourly.withColumn("idx",
          (row_number().over(Window.orderBy(col("h"))) - 1)
            .cast(LongType))
        TimeSeriesOps.acf(series, "idx", "x", maxLag = 24)
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |s AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
             |        AS idx, x FROM hourly),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx FROM s),
             |dev AS (SELECT idx, n * x - sx AS dev FROM s CROSS JOIN tot),
             |den AS (SELECT CAST(sum(CAST(dev AS HUGEINT) * dev) AS DOUBLE)
             |          AS den FROM dev),
             |lags AS (SELECT CAST(unnest(range(1, 25)) AS BIGINT) AS lag),
             |pairs AS (
             |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(CAST(a.dev AS HUGEINT) * b.dev) AS DOUBLE) AS num
             |  FROM dev a CROSS JOIN lags l
             |  JOIN dev b ON b.idx = a.idx + l.lag
             |  GROUP BY 1)
             |SELECT lag, n_pairs, num, dn.den AS den,
             |  num / dn.den AS acf
             |FROM pairs CROSS JOIN den dn ORDER BY lag""".stripMargin),
      allowBnlj = true),


    // Sample CROSS-correlation function (TimeSeriesOps.ccf): CCF at
    // lags −12..+12 between the hourly 'click' and 'purchase' count
    // series — ts_acf's two-series companion, the lead/lag diagnostic
    // ("do clicks lead purchases, and by how many hours?") an
    // attribution/ops pipeline runs before any causal claim. BOTH
    // series come out of ONE conditional hour-bucket aggregation, so
    // they are aligned on the same dense spine by construction (a
    // per-type join of separately-built series would drop hours where
    // either type is absent — the documented hazard the op's input
    // contract exists for). Exactness: the ts_acf algebra with two
    // means cleared — exact-long devs, DECIMAL(38,0) numerator and
    // both denominators presented as DOUBLE, ccf = num/(√dx·√dy) a
    // three-op fixed IEEE sequence (sqrt is correctly-rounded on both
    // engines — the cosine keys' precedent) ⇒ fully oracled.
    "ts_xcorr" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(when(col("event_type") === "click", 1)).as("x"),
            count(when(col("event_type") === "purchase", 1)).as("y"))
        val series = hourly.withColumn("idx",
          (row_number().over(Window.orderBy(col("h"))) - 1)
            .cast(LongType))
        TimeSeriesOps.ccf(series, "idx", "x", "y", maxLag = 12)
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS x,
             |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |s AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
             |        AS idx, x, y FROM hourly),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx,
             |               CAST(sum(y) AS BIGINT) AS sy FROM s),
             |dev AS (SELECT idx, n * x - sx AS devx, n * y - sy AS devy
             |        FROM s CROSS JOIN tot),
             |den AS (SELECT
             |    CAST(sum(CAST(devx AS HUGEINT) * devx) AS DOUBLE) AS den_x,
             |    CAST(sum(CAST(devy AS HUGEINT) * devy) AS DOUBLE) AS den_y
             |  FROM dev),
             |lags AS (SELECT CAST(unnest(range(-12, 13)) AS BIGINT) AS lag),
             |pairs AS (
             |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(CAST(a.devx AS HUGEINT) * b.devy) AS DOUBLE) AS num
             |  FROM dev a CROSS JOIN lags l
             |  JOIN dev b ON b.idx = a.idx + l.lag
             |  GROUP BY 1)
             |SELECT lag, n_pairs, num, dn.den_x AS den_x, dn.den_y AS den_y,
             |  CASE WHEN dn.den_x > 0 AND dn.den_y > 0
             |    THEN num / (sqrt(dn.den_x) * sqrt(dn.den_y))
             |    ELSE NULL END AS ccf
             |FROM pairs CROSS JOIN den dn ORDER BY lag""".stripMargin),
      allowBnlj = true),


    // Classical additive decomposition (TimeSeriesOps
    // .decomposeClassical): trend (2×24 centered MA) + hour-of-day
    // seasonal means + residual over the hourly event-count series —
    // ts_acf finds the period, this splits along it. Exact-long CMA
    // numerator and detrended values; trend/seasonal/residual are
    // short fixed IEEE sequences the oracle restates textually ⇒
    // fully oracled. Season keys come from the bucket TIMESTAMP (not
    // the dense index), so compressed-out empty hours cannot shift
    // the phase; edge rows without a full 24h window are excluded by
    // the standard CMA contract.
    "ts_decompose_classical" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val series = hourly
          .withColumn("idx",
            (row_number().over(Window.orderBy(col("h"))) - 1)
              .cast(LongType))
          .withColumn("hod", hour(col("h")).cast(IntegerType))
        TimeSeriesOps.decomposeClassical(series, "idx", "x", "hod",
          period = 24)
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |s AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
             |        AS idx, CAST(hour(h) AS INTEGER) AS season, x
             |      FROM hourly),
             |t0 AS (
             |  SELECT idx, season, x,
             |    lag(x, 12) OVER w + lead(x, 12) OVER w
             |      + 2 * SUM(x) OVER (ORDER BY idx
             |          ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING) AS tn
             |  FROM s WINDOW w AS (ORDER BY idx)),
             |t1 AS (
             |  SELECT idx, season, x, tn, 48 * x - tn AS dq
             |  FROM t0 WHERE tn IS NOT NULL),
             |seas AS (
             |  SELECT season,
             |    CAST(SUM(dq) AS DOUBLE) / CAST(48 * count(*) AS DOUBLE)
             |      AS seasonal
             |  FROM t1 GROUP BY 1)
             |SELECT idx, t1.season, x,
             |  CAST(tn AS DOUBLE) / 48.0 AS trend,
             |  seas.seasonal,
             |  CAST(dq AS DOUBLE) / 48.0 - seas.seasonal AS residual
             |FROM t1 JOIN seas ON seas.season = t1.season
             |ORDER BY idx""".stripMargin)),


    // Single-changepoint LOCATION (TimeSeriesOps.changepointCusum):
    // argmax_t |t·S_n − n·S_t| over the hourly-count series with a
    // PLANTED +25 level shift from bucket 400 on — the alarms say
    // whether, this says where (and must recover exactly t = 400;
    // ok_cp carries the planted truth as data). Exact-long prefix sums
    // and objective, smallest-t ties, IEEE only on the output row's
    // two means ⇒ fully oracled.
    "ts_changepoint" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x0"))
        val series = hourly
          .withColumn("idx",
            (row_number().over(Window.orderBy(col("h"))) - 1)
              .cast(LongType))
          .withColumn("x",
            col("x0") + when(col("idx") >= 400, 25L).otherwise(0L))
        TimeSeriesOps.changepointCusum(series, "idx", "x")
          .withColumn("ok_cp", (col("cp") === 400L).cast(IntegerType))
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |    CAST(count(*) AS BIGINT) AS x0
             |  FROM events GROUP BY 1),
             |s AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
             |        AS idx, x0 FROM hourly),
             |s2 AS (SELECT idx,
             |         x0 + CASE WHEN idx >= 400 THEN 25 ELSE 0 END AS x
             |       FROM s),
             |pre AS (SELECT idx, CAST(SUM(x) OVER (ORDER BY idx
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS BIGINT) AS st
             |        FROM s2),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(SUM(x) AS BIGINT) AS sn FROM s2),
             |d AS (
             |  SELECT idx + 1 AS t, n, sn, st,
             |    abs((idx + 1) * sn - n * st) AS d
             |  FROM pre CROSS JOIN tot
             |  WHERE idx + 1 < n)
             |SELECT t AS cp, n, d AS d_max,
             |  CAST(st AS DOUBLE) / CAST(t AS DOUBLE) AS mean_before,
             |  CAST(sn - st AS DOUBLE) / CAST(n - t AS DOUBLE) AS mean_after,
             |  CAST(sn - st AS DOUBLE) / CAST(n - t AS DOUBLE)
             |    - CAST(st AS DOUBLE) / CAST(t AS DOUBLE) AS shift,
             |  CAST(t = 400 AS INTEGER) AS ok_cp
             |FROM d ORDER BY d DESC, t LIMIT 1""".stripMargin),
      allowBnlj = true),


    // Two-sided tabular CUSUM drift alarm (TimeSeriesOps.cusumWindowed,
    // Page 1954): per-user clamped deviation sums vs the user's exact
    // per-series mean — the sustained-small-shift detector point-
    // outlier rules (MAD/z) structurally miss. Target = exact decimal
    // per-user mean (one agg, joined on the same user key the window
    // shuffles on); [S⁺,S⁻] ARRAY fold; the oracle prepends a literal
    // 0 so DuckDB's seedless list_reduce starts at this fold's exact
    // [0,0] state ⇒ fully oracled.
    "ts_cusum_alarm" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("value"))
        val tgt = ev.groupBy(col("user_id"))
          .agg((sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("target"))
        TimeSeriesOps.cusumWindowed(
          ev.join(tgt, "user_id"), "user_id", "event_id", "value",
          "target", slack = 25.0, threshold = 200.0, span = 20)
          .orderBy(col("event_id"))
      },
      Some("""WITH m AS (
             |  SELECT user_id,
             |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      / CAST(count(*) AS DOUBLE) AS target
             |  FROM events GROUP BY 1),
             |j AS (
             |  SELECT e.user_id, e.event_id, e.value, m.target
             |  FROM events e JOIN m USING (user_id)),
             |l AS (
             |  SELECT user_id, event_id, value, target,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM j),
             |f AS (
             |  SELECT user_id, event_id, value, target,
             |    list_reduce(
             |      list_transform(
             |        list_prepend(CAST(0.0 AS DOUBLE), lst),
             |        x -> [x, x]),
             |      (acc, e) -> [
             |        greatest(CAST(0.0 AS DOUBLE),
             |          acc[1] + (e[1] - target - 25.0)),
             |        greatest(CAST(0.0 AS DOUBLE),
             |          acc[2] + (target - 25.0 - e[1]))]) AS cs
             |  FROM l)
             |SELECT user_id, event_id, value, target,
             |  cs[1] AS cusum_hi, cs[2] AS cusum_lo,
             |  cs[1] > 200.0 OR cs[2] > 200.0 AS alarm
             |FROM f ORDER BY event_id""".stripMargin)),
  )
}
