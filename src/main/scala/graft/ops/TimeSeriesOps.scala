package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-series downsampling — the batch resample step a sensor/metrics
  * pipeline runs before modeling (the reference's weather series are
  * exactly this shape: README.md:595-760 hourly observations rolled up
  * for daily reporting). Everything here is ONE groupBy over derived
  * bucket columns: partial aggregation absorbs the per-bucket work
  * map-side, the shuffle carries one row per (key, bucket, agg) — at
  * 100 TB the output is smaller than the input by the resample factor,
  * so the plan's cost is the scan, which is the floor.
  */
object TimeSeriesOps {

  /** OHLC downsample: per (`keyCol`, `truncUnit`-bucket of `tsCol`),
    * emit open/high/low/close/mean/n of `valueCol`.
    *
    * Open/close are `min_by`/`max_by` on `orderCol` — a UNIQUE
    * within-series order column (an event id / sequence number), not
    * the timestamp, so duplicate timestamps can't make open/close
    * nondeterministic (min_by on a tied key returns an arbitrary
    * tied row; an id has no ties). The mean goes through an exact
    * DECIMAL accumulator: partial-aggregation order can't wiggle the
    * double result, which keeps the output hash-stable under AQE
    * re-plans and cross-engine.
    */
  def resampleOhlc(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      orderCol: String, truncUnit: String = "hour"): DataFrame = {
    val v = col(valueCol)
    // NULL values are excluded up front: min_by/max_by would otherwise
    // happily return a NULL sitting at the extreme orderCol while
    // high/low/mean skip it — internally inconsistent, and divergent
    // from SQL arg_min/arg_max (which ignore NULL values). With the
    // filter, every output column describes the same non-NULL rows.
    df.filter(v.isNotNull)
      .groupBy(col(keyCol), date_trunc(truncUnit, col(tsCol)).as("bucket"))
      .agg(
        min_by(v, col(orderCol)).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, col(orderCol)).as("close"),
        (sum(v.cast(DecimalType(38, 6))).cast(DoubleType) /
          count(v).cast(DoubleType)).as("mean_val"),
        count(v).as("n"))
  }

  /** Windowed EWMA (exponentially weighted moving average): per `keyCol`
    * series ordered by `orderCol`, fold the last `span` observations
    * through `acc·(1−α) + x·α`, seeded with the window's first element.
    * Declarative twin of [[ewmaExact]]: the fold is a codegen'd
    * `aggregate` HOF over a `collect_list` ROWS frame — one shuffle on
    * the key, one sort, O(span) work and state per row, and a FIXED
    * left-to-right IEEE op chain, so the result is bit-deterministic
    * under any partitioning (and cross-engine: DuckDB's `list_reduce`
    * evaluates the identical fold).
    *
    * Truncation: dropping history beyond `span` perturbs the infinite
    * recurrence by at most `(1−α)^span · max|x|` — pick span so
    * `(1−α)^span` is below the tolerance (0.75²⁰ ≈ 3·10⁻³). NULL
    * values must be filled first (e.g. [[ProfileOps.forwardFill]]):
    * `collect_list` skips NULLs, which would silently shift the frame.
    */
  def ewmaWindowed(
      df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double, span: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(span >= 1, s"span must be positive, got $span")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(span - 1).toLong, Window.currentRow)
    val lst = collect_list(col(valueCol)).over(w)
    // get (0-based, null on out-of-bounds), NOT element_at: an all-NULL
    // frame collects to an EMPTY list, and element_at(empty, 1) throws
    // under ANSI — the fold seed must degrade to NULL (⇒ NULL ewma)
    // instead of failing the job
    df.withColumn("ewma",
      aggregate(slice(lst, 2, span - 1), get(lst, lit(0)),
        (acc, x) => acc * lit(1.0 - alpha) + x * lit(alpha)))
  }

  /** Windowed Holt linear (double exponential) smoothing: per series,
    * the level/trend recursion
    * {{{ l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
    *     b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1} }}}
    * folded over the last `span` observations, seeded with
    * (l = first value of the frame, b = 0) — the trend ramps in from
    * zero, the standard alternative to the x₂−x₁ seed that needs no
    * second-element special case. Emits `level`, `trend` and the
    * one-step `forecast = level + trend` — the lightweight
    * trend-following monitor for metric series (EWMA lags a trending
    * series by design; Holt does not).
    *
    * Same scale/determinism contract as [[ewmaWindowed]]: one shuffle
    * on the key, O(span) state per row, and a FIXED left-to-right IEEE
    * chain over a TWO-ELEMENT ARRAY accumulator [l, b], so results are
    * bit-deterministic under any partitioning and restatable
    * cross-engine (DuckDB: `list_reduce` over
    * `list_transform(lst, x → [x, 0.0])` — the first pair IS this
    * seed, making the no-initial-value reduce identical to this fold).
    * The accumulator is an ARRAY, not a struct, deliberately: DuckDB's
    * list_reduce mutates a STRUCT accumulator in place field by field,
    * so a second field's formula reading `acc.l` observes the first
    * field's NEW value (measured divergence, pinned by the fixture
    * unit); list construction evaluates both elements from the
    * original accumulator on both engines. Pick α/β whose complements
    * are exact binary fractions (0.25, 0.125, …) so the mirrored SQL
    * literals are the same doubles. NULLs must be filled first, as in
    * [[ewmaWindowed]]. */
  def holtWindowed(
      df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double, beta: Double, span: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1], got $beta")
    require(span >= 1, s"span must be positive, got $span")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(span - 1).toLong, Window.currentRow)
    // Explicit cast: holt_fold takes ARRAY<DOUBLE> with no implicit
    // numeric widening (unlike the aggregate() HOF it replaced), so a
    // LONG/INT value column keeps working here as before (r16 ADVICE).
    val lst = collect_list(col(valueCol).cast(DoubleType)).over(w)
    // Native codegen fold (graft.expressions.HoltFold) — bit-identical
    // to the previous interpreted aggregate() HOF chain by the
    // ExpressionSpec parity pin (same IEEE op order), measured faster
    // at the ts_backtest grain (BASELINE §40): the HOF allocated a
    // boxed 2-element array per fold STEP per row; the expression keeps
    // (l, b) in locals inside whole-stage codegen.
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val folded = call_function("holt_fold",
      lst, lit(alpha), lit(beta))
    df.withColumn("_hw", folded)
      .withColumn("level", element_at(col("_hw"), 1))
      .withColumn("trend", element_at(col("_hw"), 2))
      .withColumn("forecast",
        element_at(col("_hw"), 1) + element_at(col("_hw"), 2))
      .drop("_hw")
  }

  /** Windowed Holt-Winters ADDITIVE seasonal (triple exponential)
    * smoothing: per series, the level/trend/seasonal recursion
    * {{{ l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *     b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *     s_t = γ(x_t − l_t) + (1−γ)·s_{t−m} }}}
    * (Hyndman & Athanasopoulos, FPP §8.3) folded over the last `span`
    * observations — the monitor for series where Holt still lags: a
    * periodic component (daily/weekly load cycles) shows up as a
    * repeating residual that the `period`-slot seasonal state absorbs.
    * Seeded with (l = first frame value, b = 0, s ≡ 0): trend AND
    * season ramp in from zero — the same no-special-case convention as
    * [[holtWindowed]]'s trend seed, documented in place of the
    * first-full-season initialization that needs `period` lookahead.
    * Emits `level`, `trend`, `seasonal_next` (the slot the NEXT
    * observation will consume) and the one-step
    * `forecast = level + trend + seasonal_next`.
    *
    * Same scale/determinism contract as [[holtWindowed]]: one shuffle
    * on the key, O(span + period) state per row, a FIXED left-to-right
    * IEEE chain over a (2+period)-element ARRAY accumulator
    * [l, b, s₁..s_m] whose seasonal block ROTATES each step (head
    * consumed, tail appended) — an ARRAY, never a struct (the DuckDB
    * in-place-mutation trap pinned at [[holtWindowed]]). Pick α/β/γ
    * with exact-binary-fraction complements so mirrored SQL literals
    * are the same doubles. NULLs must be filled first. */
  def holtWintersWindowed(
      df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double, beta: Double, gamma: Double, period: Int,
      span: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1], got $beta")
    require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0,1], got $gamma")
    require(period >= 1, s"period must be positive, got $period")
    require(span >= 1, s"span must be positive, got $span")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(span - 1).toLong, Window.currentRow)
    val lst = collect_list(col(valueCol)).over(w)
    val seed = concat(array(get(lst, lit(0)), lit(0.0)),
      array_repeat(lit(0.0), period))
    val folded = aggregate(slice(lst, 2, span - 1), seed, (acc, x) => {
      val l = element_at(acc, 1); val b = element_at(acc, 2)
      val sOld = element_at(acc, 3)
      val nl = lit(alpha) * (x - sOld) + lit(1.0 - alpha) * (l + b)
      val nb = lit(beta) * (nl - l) + lit(1.0 - beta) * b
      val ns = lit(gamma) * (x - nl) + lit(1.0 - gamma) * sOld
      concat(array(nl, nb), slice(acc, 4, period - 1), array(ns))
    })
    df.withColumn("_hw", folded)
      .withColumn("level", element_at(col("_hw"), 1))
      .withColumn("trend", element_at(col("_hw"), 2))
      .withColumn("seasonal_next", element_at(col("_hw"), 3))
      .withColumn("forecast",
        element_at(col("_hw"), 1) + element_at(col("_hw"), 2) +
          element_at(col("_hw"), 3))
      .drop("_hw")
  }

  /** Windowed two-sided tabular CUSUM (Page 1954): per series, the
    * clamped cumulative deviation sums
    * {{{ S⁺_t = max(0, S⁺_{t−1} + (x_t − target − slack))
    *     S⁻_t = max(0, S⁻_{t−1} + (target − slack − x_t)) }}}
    * over the last `span` observations, with `alarm` when either side
    * crosses `threshold`. The change-point/drift detector that catches
    * a sustained small shift a point-outlier rule (MAD, z) never fires
    * on — small deviations past the slack ACCUMULATE instead of being
    * judged one at a time. `targetCol` is the in-control reference
    * level, prepared by the caller (typically an exact per-key mean),
    * constant within a series.
    *
    * Same window/fold contract as [[holtWindowed]] — [S⁺, S⁻] ARRAY
    * accumulator (see the struct-mutation note there), fixed IEEE
    * chain, one shuffle on the key. The SQL restatement prepends a
    * literal 0 to the frame list so DuckDB's seedless `list_reduce`
    * starts from this fold's exact [0, 0] state. */
  def cusumWindowed(
      df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      targetCol: String, slack: Double, threshold: Double,
      span: Int): DataFrame = {
    require(slack >= 0.0, s"slack must be >= 0, got $slack")
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    require(span >= 1, s"span must be positive, got $span")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(span - 1).toLong, Window.currentRow)
    val lst = collect_list(col(valueCol)).over(w)
    val t = col(targetCol)
    val folded = aggregate(lst, array(lit(0.0), lit(0.0)), (acc, x) => {
      val hi = element_at(acc, 1); val lo = element_at(acc, 2)
      array(
        greatest(lit(0.0), hi + (x - t - lit(slack))),
        greatest(lit(0.0), lo + (t - lit(slack) - x)))
    })
    df.withColumn("_cs", folded)
      .withColumn("cusum_hi", element_at(col("_cs"), 1))
      .withColumn("cusum_lo", element_at(col("_cs"), 2))
      .withColumn("alarm",
        element_at(col("_cs"), 1) > lit(threshold) ||
          element_at(col("_cs"), 2) > lit(threshold))
      .drop("_cs")
  }

  /** A single (key, order, value) observation for [[ewmaExact]]. */
  case class TsPoint(key: Long, ord: Long, value: Double)
  /** [[ewmaExact]] output row. */
  case class EwmaPoint(key: Long, ord: Long, ewma: Double)

  /** Exact (unbounded-history) EWMA via the spillable sorted-stream
    * shape: repartition on the key, sort within partitions, one O(1)-
    * state pass — no per-group buffering, so a billion-row key costs
    * the same memory as a ten-row key (same pattern as
    * `StreamOps.sessionizeSorted`). Use when the recurrence must be
    * exact from the series start; [[ewmaWindowed]] when a `span`-term
    * tail bound is acceptable and SQL-expressibility matters. */
  def ewmaExact(ds: Dataset[TsPoint], alpha: Double): Dataset[EwmaPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    import ds.sparkSession.implicits._
    ds.repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ord"))
      .mapPartitions { it =>
        var curKey = 0L
        var has = false
        var acc = 0.0
        it.map { p =>
          if (!has || p.key != curKey) { curKey = p.key; has = true; acc = p.value }
          else acc = acc * (1.0 - alpha) + p.value * alpha
          EwmaPoint(p.key, p.ord, acc)
        }
      }
  }

  /** Sample autocorrelation function (ACF) over a regular series — the
    * first diagnostic a forecasting pipeline runs (seasonality shows as
    * peaks at the period's lags; the companion to the Holt-Winters fit
    * whose season length it selects).
    *
    * Input: a BUCKET-GRAIN series frame (`idxCol` = dense 0-based
    * position, `valueCol` = integer measurement) — tiny by
    * construction, the corpus-scale aggregation that produced it is
    * the caller's one pass. Output per lag 1..`maxLag`: n_pairs, the
    * exact integer numerator/denominator, and acf_k.
    *
    * Exactness: the sample mean is rational, so everything is scaled
    * by n — dev_t = n·x_t − Σx is an exact long (requires
    * n·max|x| < 2⁶²; at the 10⁴-bucket grain that admits bucket
    * values to ~4.6e14), and the lag-k numerator Σ dev_t·dev_{t+k}
    * and denominator Σ dev_t² are summed in DECIMAL(38,0) — dev²
    * passes 2⁶³ once n·max|x| > ~3e9 (e.g. 10⁴ hourly buckets of
    * ≥ 10⁶ events), where a LongType product would wrap silently
    * (non-ANSI) while the DuckDB oracle's exact HUGEINT sum keeps
    * going — the centroidCosineMatrix overflow class. DECIMAL keeps
    * the algebra exact to 10³⁸ (n³·max|x|² < 2.5e37, i.e. bucket
    * values to ~1.5e12 at 10⁴ buckets); num/den PRESENT as double
    * (the schema rule: no int128-backed decimal in an output schema;
    * Decimal→Double is one correctly-rounded step, mirrored by the
    * oracle's HUGEINT→DOUBLE cast), and acf_k = num/den is ONE IEEE
    * division per lag — bit-stable cross-engine, hash-oracled. The
    * ×n² scaling cancels in the ratio.
    *
    * Scale shape: the series is bucket-grain, so the lag fan-out
    * (|series| × maxLag rows) and the shifted equi-join are
    * model-sized; the 1-row totals ride scalar broadcasts. */
  def acf(series: DataFrame, idxCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    import org.apache.spark.sql.types.LongType
    val s = series.select(col(idxCol).cast(LongType).as("idx"),
      col(valueCol).cast(LongType).as("x"))
    val tot = s.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val dev = s.crossJoin(broadcast(tot))
      .select(col("idx"), (col("n") * col("x") - col("sx")).as("dev"))
    // dev·dev in DECIMAL (19+19+1 caps at 38, scale 0): exact where a
    // long product wraps — see the scaladoc bound
    def dec19(c: Column): Column =
      c.cast(org.apache.spark.sql.types.DecimalType(19, 0))
    val den = dev.agg(
      sum(dec19(col("dev")) * dec19(col("dev")))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("den"))
    val lags = series.sparkSession.range(1, maxLag + 1L)
      .select(col("id").as("lag"))
    dev.crossJoin(broadcast(lags))
      .withColumn("_bidx", col("idx") + col("lag"))
      .join(dev.select(col("idx").as("_bidx"), col("dev").as("_devb")),
        Seq("_bidx"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec19(col("dev")) * dec19(col("_devb")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        col("num").cast(DoubleType).as("num"),
        col("den").cast(DoubleType).as("den"),
        (col("num").cast(DoubleType) / col("den").cast(DoubleType))
          .as("acf"))
      .orderBy(col("lag"))
  }

  /** Sample cross-correlation function (CCF) between TWO aligned
    * regular series — the lead/lag diagnostic beside [[acf]]'s
    * within-series one: a peak at lag k > 0 means x leads y by k
    * buckets (x's deviations co-move with y's k buckets LATER), the
    * question an ops/attribution pipeline asks of e.g. clicks vs
    * purchases or deploys vs errors. Covers lags −maxLag..+maxLag
    * (0 included — unlike ACF's trivial 1.0, the contemporaneous
    * cross-correlation is informative).
    *
    * Input: one bucket-grain frame carrying BOTH series on a shared
    * dense index (`idxCol`, `xCol`, `yCol`) — building both measures in
    * one conditional aggregation is what keeps them aligned; a per-type
    * join of separately-built series would silently drop buckets where
    * either side is empty.
    *
    * Exactness — the [[acf]] algebra with two means cleared: devx_t =
    * n·x_t − Σx and devy_t = n·y_t − Σy are exact longs; the lag-k
    * numerator Σ devx_t·devy_{t+k} and the two denominators Σ devx²,
    * Σ devy² are DECIMAL(38,0) sums of DECIMAL(19,0) products (the
    * LongType-wrap class fixed round 14 — see [[acf]]'s bound);
    * everything presents as DOUBLE (one correctly-rounded cast each,
    * mirrored by the oracle's HUGEINT→DOUBLE), and
    * ccf_k = num / (√den_x · √den_y) is a THREE-op fixed IEEE sequence
    * (sqrt is IEEE-754 correctly-rounded on both engines — the cosine
    * keys' precedent). The ×n² scaling cancels in the ratio. A
    * constant series (zero denominator) yields NULL ccf, the
    * prep_robust_scale degenerate-input convention.
    *
    * Scale shape: identical to [[acf]] — the corpus-scale pass is the
    * caller's bucket aggregation; the ±maxLag fan-out and shifted
    * equi-join are model-sized; totals ride scalar broadcasts. */
  def ccf(series: DataFrame, idxCol: String, xCol: String, yCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    import org.apache.spark.sql.types.LongType
    val s = series.select(col(idxCol).cast(LongType).as("idx"),
      col(xCol).cast(LongType).as("x"), col(yCol).cast(LongType).as("y"))
    val tot = s.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"))
    val dev = s.crossJoin(broadcast(tot))
      .select(col("idx"),
        (col("n") * col("x") - col("sx")).as("devx"),
        (col("n") * col("y") - col("sy")).as("devy"))
    def dec19(c: Column): Column =
      c.cast(org.apache.spark.sql.types.DecimalType(19, 0))
    val den = dev.agg(
      sum(dec19(col("devx")) * dec19(col("devx")))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("den_x"),
      sum(dec19(col("devy")) * dec19(col("devy")))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("den_y"))
    val lags = series.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").as("lag"))
    dev.crossJoin(broadcast(lags))
      .withColumn("_bidx", col("idx") + col("lag"))
      .join(dev.select(col("idx").as("_bidx"), col("devy").as("_devyb")),
        Seq("_bidx"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec19(col("devx")) * dec19(col("_devyb")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        col("num").cast(DoubleType).as("num"),
        col("den_x").cast(DoubleType).as("den_x"),
        col("den_y").cast(DoubleType).as("den_y"),
        when(col("den_x") > 0 && col("den_y") > 0,
          col("num").cast(DoubleType) /
            (sqrt(col("den_x").cast(DoubleType)) *
             sqrt(col("den_y").cast(DoubleType))))
          .otherwise(lit(null).cast(DoubleType)).as("ccf"))
      .orderBy(col("lag"))
  }

  /** Classical additive seasonal decomposition (the moving-average
    * textbook method; STL's simpler ancestor and the one whose every
    * step is exact-arithmetic oracle-able): trend = centered 2×m
    * moving average, seasonal = per-season mean of the detrended
    * series, residual = remainder. The ACF picks the period; this
    * splits the series along it.
    *
    * Exactness: for even period m the CMA is
    * (x_{t−m/2} + 2·Σ_{|j|<m/2} x_{t+j} + x_{t+m/2}) / 2m — the
    * numerator `tn` and the detrended `dq = 2m·x − tn` are exact
    * longs; trend, seasonal and residual are each a FIXED short IEEE
    * sequence over exact integers (one or two divisions, one
    * subtraction), restated textually by the oracle ⇒ hash-stable.
    * Rows without a full window (the first/last m/2) carry no trend
    * and are excluded — the standard edge contract.
    *
    * Input is a bucket-grain series (the [[acf]] contract): the
    * single-partition order window is bounded by the bucket count,
    * and `seasonCol` (e.g. hour-of-day) keys the seasonal means —
    * derived from the bucket TIMESTAMP, not the dense index, so
    * compressed-out empty buckets cannot shift the season phase. */
  def decomposeClassical(series: DataFrame, idxCol: String,
      valueCol: String, seasonCol: String, period: Int): DataFrame = {
    require(period >= 2 && period % 2 == 0,
      s"period must be even and >= 2 (the 2xm CMA form), got $period")
    import org.apache.spark.sql.types.LongType
    val half = period / 2
    val twoM = (2 * period).toLong
    val s0 = series.select(col(idxCol).cast(LongType).as("idx"),
      col(seasonCol).as("season"), col(valueCol).cast(LongType).as("x"))
    val w = Window.orderBy(col("idx"))
    val inner = Window.orderBy(col("idx"))
      .rowsBetween(-(half - 1), half - 1)
    val t0 = s0
      .withColumn("_tn", lag(col("x"), half).over(w) +
        lead(col("x"), half).over(w) + lit(2L) * sum(col("x")).over(inner))
      .filter(col("_tn").isNotNull)
      .withColumn("_dq", lit(twoM) * col("x") - col("_tn"))
    val seas = t0.groupBy(col("season"))
      .agg(sum(col("_dq")).as("_ssum"), count(lit(1)).as("_scnt"))
      .withColumn("seasonal", col("_ssum").cast(DoubleType) /
        (lit(twoM) * col("_scnt")).cast(DoubleType))
      .select(col("season"), col("seasonal"))
    t0.join(broadcast(seas), Seq("season"))
      .select(col("idx"), col("season"), col("x"),
        (col("_tn").cast(DoubleType) / lit(twoM.toDouble)).as("trend"),
        col("seasonal"),
        (col("_dq").cast(DoubleType) / lit(twoM.toDouble) - col("seasonal"))
          .as("residual"))
      .orderBy(col("idx"))
  }

  /** Single changepoint location by the CUSUM statistic: the split t
    * maximizing |t·S_n − n·S_t| (the cross-multiplied form of
    * |mean_before − mean_after| weighted by t(n−t)/n — same argmax,
    * zero divisions until the report row). The alarm ops
    * ([[cusumWindowed]]) say WHETHER a shift happened; this says WHERE
    * — the segmentation primitive binary-segmentation recursion is
    * built from.
    *
    * Exactness: prefix sums and the objective are exact longs
    * (bucket-grain series of integer counts), the argmax tie-breaks to
    * the SMALLEST index, and the only IEEE ops are the two segment
    * means and the mean shift on the single output row ⇒ fully
    * oracled. Input is the [[acf]] bucket-grain series contract;
    * split t means "first t rows vs the rest", 1 ≤ t ≤ n−1. */
  def changepointCusum(series: DataFrame, idxCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val s0 = series.select(col(idxCol).cast(LongType).as("idx"),
      col(valueCol).cast(LongType).as("x"))
    val w = Window.orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pre = s0.withColumn("_st", sum(col("x")).over(w)) // S_t incl. row t
    val tot = pre.agg(count(lit(1)).as("n"), sum(col("x")).as("sn"))
    pre.crossJoin(broadcast(tot))
      // split AFTER row idx: t = idx+1 rows on the left
      .withColumn("t", col("idx") + 1)
      .filter(col("t") < col("n"))
      .withColumn("d", abs(col("t") * col("sn") - col("n") * col("_st")))
      .orderBy(col("d").desc, col("t"))
      .limit(1)
      .select(col("t").as("cp"), col("n"), col("d").as("d_max"),
        (col("_st").cast(DoubleType) / col("t").cast(DoubleType))
          .as("mean_before"),
        ((col("sn") - col("_st")).cast(DoubleType) /
          (col("n") - col("t")).cast(DoubleType)).as("mean_after"))
      .withColumn("shift", col("mean_after") - col("mean_before"))
  }

  /** ROLLING-ORIGIN BACKTEST of the Holt linear forecaster (round 13):
    * does the monitor's forecast actually predict, and how fast does it
    * decay with horizon? Every row t is a forecast ORIGIN — the
    * h-step-ahead forecast from t is level_t + h·trend_t — and the
    * error is scored against the realized value at t+h (equivalently:
    * row t+h scores the h-lagged state). Per (key, horizon): n
    * evaluations, MAE, and sMAPE — the forecast-quality gate that picks
    * α/β/span and tells a capacity planner which horizons to trust.
    *
    * Determinism: the Holt state is [[holtWindowed]]'s bit-exact fold;
    * each error is a FIXED IEEE chain over bit-equal doubles, quantized
    * ONCE (|err| → DECIMAL(20,6), the sMAPE term → DECIMAL(12,6) with
    * an explicit zero-denominator NULL guard — engines disagree on
    * double x/0), so the per-group sums are exact decimals and each
    * reported metric is ONE IEEE division. Scale shape: one shuffle on
    * the key; the state window and the |horizons|×2 lag expressions
    * share the same (key, order) sort; the horizon explode multiplies
    * rows by |horizons| AFTER the window, before the aggregation that
    * shrinks to (keys × horizons). */
  def holtBacktest(
      df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double, beta: Double, span: Int,
      horizons: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ >= 1),
      s"horizons must be >= 1, got $horizons")
    require(horizons.distinct == horizons, s"duplicate horizons: $horizons")
    val base = holtWindowed(df, keyCol, orderCol, valueCol, alpha, beta, span)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    // the lag windows must land in their OWN projection — a window
    // expression inside explode()'s Generate is unsupported
    // (UNSUPPORTED_EXPR_FOR_OPERATOR); all 2·|horizons| lags share one
    // Window node over the state window's existing sort
    val lagged = horizons.foldLeft(base) { (acc, h) =>
      acc.withColumn(s"_f$h",
        lag(col("level"), h).over(w) +
          lit(h.toDouble) * lag(col("trend"), h).over(w))
    }
    val probes = horizons.map { h =>
      struct(lit(h).as("horizon"), col(s"_f$h").as("f"))
    }
    val absErr = abs(col("_v") - col("_f"))
    val denom = abs(col("_v")) + abs(col("_f"))
    lagged
      .select(col(keyCol), col(valueCol).cast(DoubleType).as("_v"),
        explode(array(probes: _*)).as("_p"))
      .select(col(keyCol), col("_p.horizon").as("horizon"),
        col("_v"), col("_p.f").as("_f"))
      .filter(col("_f").isNotNull)
      .withColumn("_ae", absErr.cast(DecimalType(20, 6)))
      .withColumn("_st", when(denom === 0.0, lit(null))
        .otherwise((lit(2.0) * absErr / denom).cast(DecimalType(12, 6))))
      .groupBy(col(keyCol), col("horizon"))
      .agg(count(lit(1)).as("n"),
        sum(col("_ae")).as("_sae"),
        count(col("_st")).as("_nst"),
        sum(col("_st")).as("_sst"))
      .select(col(keyCol), col("horizon"), col("n"),
        (col("_sae").cast(DoubleType) / col("n").cast(DoubleType)).as("mae"),
        (col("_sst").cast(DoubleType) /
          nullif(col("_nst"), lit(0L)).cast(DoubleType)).as("smape"))
  }
}
