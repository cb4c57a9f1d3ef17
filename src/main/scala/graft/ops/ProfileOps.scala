package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType, IntegerType, LongType, ShortType, StringType}

/** Data-quality profiling for pipeline gates (north-star extension): the
  * pre-training sanity pass every large corpus goes through — null
  * rates, cardinalities, ranges, means — computed in ONE scan, shaped
  * for dashboards and drift alerts.
  */
object ProfileOps {

  /** Per-column stats for numeric columns, one row per column:
    * (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val,
    * mean_val). Single pass over the data: one wide aggregate, then an
    * explode of per-column structs — NOT an aggregate-per-column union,
    * which would scan a 100 TB table once per column.
    *
    * n_distinct is EXACT (oracle-comparable). Multiple exact distinct
    * aggregates make Catalyst plan an Expand (input replicated per
    * distinct column) — the honest cost of exactness; swap in
    * `approx_count_distinct` for the cheap variant when profiling truly
    * wide tables. The mean goes through a decimal accumulator so the
    * result is partitioning-independent (hash-stable on any cluster).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    def a(c: String, suffix: String): String = s"__${c}_$suffix"
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(a(c, "rows")),
        count(col(c)).as(a(c, "nonnull")),
        countDistinct(col(c)).as(a(c, "distinct")),
        min(col(c)).cast(DoubleType).as(a(c, "min")),
        max(col(c)).cast(DoubleType).as(a(c, "max")),
        // DECIMAL(38,6): per-value range ±1e31 — wide enough that even
        // corrupt sentinels (1e30-ish, exactly what a profiling gate
        // must surface rather than choke on) sum without overflow;
        // a narrower decimal would null them out of the sum (skewing
        // the mean silently) or throw under ANSI
        (sum(col(c).cast(DecimalType(38, 6))).cast(DoubleType) /
          count(col(c))).as(a(c, "mean")))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map(c => struct(
      lit(c).as("col_name"),
      col(a(c, "rows")).as("n_rows"),
      col(a(c, "nonnull")).as("n_nonnull"),
      col(a(c, "distinct")).as("n_distinct"),
      col(a(c, "min")).as("min_val"),
      col(a(c, "max")).as("max_val"),
      col(a(c, "mean")).as("mean_val"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** Winsorize: clamp a numeric column to its [pLo, pHi] exact
    * percentiles — outlier clipping before normalization/training. The
    * percentile pass aggregates to ONE broadcast row; the clamp is a
    * per-row expression — two scans, no shuffle of the data itself, no
    * single-partition window (the naive `percentile().over()` form
    * funnels the whole table through one task). */
  /** Join/aggregation-key skew diagnostic: the measurement you take
    * BEFORE choosing a mitigation (salting via `Joins.saltedJoin`, AQE
    * skew-join, or a broadcast) — a shuffle plan that looks fine at
    * sample scale OOMs one reducer at 100 TB when a single key holds 5%
    * of the table. Emits the `topK` heaviest keys with their share of
    * all rows, plus the global `skew_factor` = max key count / mean key
    * count (1.0 ⇒ perfectly uniform; the threshold AQE uses for its
    * skew-join split is the same statistic per partition).
    *
    * Plan shape: one groupBy(count) over the key (partial-agg absorbs
    * the hot key map-side — the diagnostic itself cannot OOM on the
    * skew it measures), a 1-row global aggregate broadcast back, and a
    * TakeOrderedAndProject for the top-k — no single-partition window,
    * no driver collect. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    // mean derived as tot/k (one exact-integer division) rather than
    // avg(): identical to any SQL oracle bit-for-bit, where avg()'s
    // internal accumulation order is engine-specific
    val stats = counts.agg(
      sum(col("n")).as("_tot"),
      count(lit(1)).as("_k"),
      max(col("n")).as("_max"))
    counts.orderBy(col("n").desc, col(keyCol)).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col(keyCol), col("n"),
        (col("n").cast(DoubleType) / col("_tot").cast(DoubleType)).as("share"),
        (col("_max").cast(DoubleType) /
          (col("_tot").cast(DoubleType) / col("_k").cast(DoubleType)))
          .as("skew_factor"))
  }

  /** Fixed-width histogram of a numeric column: `bins` equal-width
    * buckets spanning the observed [min, max], one output row per
    * NON-EMPTY bucket (bin index, inclusive-lo/exclusive-hi bounds —
    * the last bin's hi is inclusive — and count). NULLs are excluded.
    *
    * Two passes, like [[winsorize]]: a 1-row min/max aggregate is
    * broadcast back over the data (no global sort, no width_bucket
    * over a driver-collected range), then the bin arithmetic is a
    * per-row projection feeding ONE partial-aggregating groupBy — the
    * whole thing is two scans and one k-row shuffle regardless of
    * table size. Every formula is plain IEEE-double arithmetic so any
    * SQL oracle reproduces the bucketing bit-for-bit.
    *
    * Degenerate domain (min == max, width 0): all rows land in bin 0
    * with lo == hi == min — the guard keeps the division away from 0.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val v = col(valueCol).cast(DoubleType)
    val stats = df.filter(v.isNotNull)
      .agg(min(v).as("_mn"), max(v).as("_mx"))
    val width = (col("_mx") - col("_mn")) / lit(bins.toDouble)
    val bin = when(col("_mx") === col("_mn"), lit(0L))
      .otherwise(least(lit(bins - 1L),
        floor((v - col("_mn")) / width)))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(stats))
      .select(bin.as("bin"), col("_mn"), width.as("_w"))
      .groupBy(col("bin"), col("_mn"), col("_w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bin"),
        (col("_mn") + col("bin") * col("_w")).as("bin_lo"),
        (col("_mn") + (col("bin") + 1) * col("_w")).as("bin_hi"),
        col("cnt"))
  }

  /** Forward-fill (last-observation-carried-forward) gap imputation:
    * per `keyCol` series ordered by `orderCol`, each NULL in a value
    * column takes the most recent non-NULL value; leading NULLs (no
    * prior observation) stay NULL. The standard sensor/price gap
    * repair — the reference's weather series carry exactly this kind
    * of missing-measurement hole.
    *
    * All columns share ONE window spec, so Catalyst computes every
    * fill in a single Window node: one shuffle on the key, one
    * within-partition sort, regardless of how many columns are filled.
    * `last(…, ignoreNulls)` over a running ROWS frame is evaluated
    * with O(1) state per row (Spark keeps the last non-null seen — no
    * per-row frame rescan).
    *
    * (`orderCol` ties: the fill inside a tie group follows the sort's
    * arbitrary-but-stable tie order; pass a unique order column — e.g.
    * (ts, id) pre-combined — when ties are possible and material.) */
  def forwardFill(
      df: DataFrame, keyCol: String, orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "forwardFill: valueCols must be non-empty")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Pairwise Pearson correlation over `cols`, one row per column pair
    * — the profiling step behind feature-redundancy pruning. ONE wide
    * aggregate computes every moment (n, Σx, Σx², Σxy for all pairs)
    * in a single scan with partial aggregation; the pair rows are then
    * exploded from that single row, so nothing shuffles but one row of
    * counters.
    *
    * Like [[zscorePerGroup]], the correlation is DERIVED from exact
    * decimal sums — `corr()`'s streaming co-moments accumulate
    * differently under every partition order, while
    * (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))
    * over decimal-exact sums is a fixed IEEE chain: bit-identical on
    * any cluster and in a SQL oracle. Rows with a NULL in either
    * column of a pair are excluded from THAT pair's sums (the standard
    * pairwise-deletion contract); zero-variance pairs yield NULL.
    *
    * Domain: |x| ∈ [1e-3, 1e15] — the DECIMAL(38,6) product accumulator
    * holds x·y to ~10³² and resolves it to 1e-6, so columns outside the
    * band (epoch-nanos, 1e30 corrupt sentinels, micro-scale rates) FAIL
    * LOUD with a rescale diagnostic instead of crashing mid-aggregate
    * (ANSI) or returning an r computed from inconsistent sums
    * (non-ANSI) — the one unacceptable outcome for a profiling gate. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs at least 2 columns, got $cols")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // try_cast, NOT cast: a product past DECIMAL(38,6)'s range must fall
    // through to the loud domain guard below, not kill the aggregate
    // mid-flight with a bare ANSI overflow (or, non-ANSI, silently drop
    // rows from some sums while n still counts them)
    val dec = (c: Column) => c.try_cast(DecimalType(38, 6))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val both = col(a).isNotNull && col(b).isNotNull
      val ca = when(both, col(a))
      val cb = when(both, col(b))
      // try_sum, NOT sum: the per-value guard bounds |x| ≤ 1e15, but
      // ~100+ rows near the band edge can still push the ACCUMULATED
      // Σx² past DECIMAL(38,6)'s ~1e32 range — plain sum would abort
      // mid-aggregate under ANSI (before any guard projection runs) or
      // return NULL non-ANSI, which a coalesce-to-0 would mask as a
      // finite-but-wrong r. try_sum yields NULL in both modes and the
      // NULL-with-n>0 case fails loud in the projection below.
      Seq(
        count(when(both, lit(1))).cast(DoubleType).as(s"__n_$i"),
        try_sum(dec(ca)).cast(DoubleType).as(s"__sa_$i"),
        try_sum(dec(cb)).cast(DoubleType).as(s"__sb_$i"),
        try_sum(dec(ca * ca)).cast(DoubleType).as(s"__saa_$i"),
        try_sum(dec(cb * cb)).cast(DoubleType).as(s"__sbb_$i"),
        try_sum(dec(ca * cb)).cast(DoubleType).as(s"__sab_$i"))
    } ++ cols.indices.map { i =>
      max(abs(col(cols(i)))).as(s"__mx_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // domain guard: |x| ≤ 1e15 keeps x·y inside the accumulator's ~1e32
    // range; |x| ≥ 1e-3 keeps products above its 1e-6 resolution. An
    // out-of-domain column surfaces as THIS diagnostic on every output
    // row — never as a finite-but-wrong r.
    def guarded(r: Column): Column = cols.indices.foldRight(r) { (i, rest) =>
      val mx = col(s"__mx_$i")
      when(mx > 1e15, raise_error(lit(
        s"corrMatrix: |${cols(i)}| exceeds 1e15 — products overflow the " +
          "DECIMAL(38,6) accumulator; rescale/shift the column (e.g. " +
          "epoch-nanos -> seconds) before correlating")))
        .when(mx > 0.0 && mx < 1e-3, raise_error(lit(
          s"corrMatrix: |${cols(i)}| is below 1e-3 everywhere — products " +
            "round to zero at the accumulator's 1e-6 resolution; rescale " +
            "the column before correlating")))
        .otherwise(rest)
    }
    val perPair = pairs.zipWithIndex.map { case ((a, b), i) =>
      val n = col(s"__n_$i")
      val sums = Seq(s"__sa_$i", s"__sb_$i", s"__saa_$i", s"__sbb_$i", s"__sab_$i")
        .map(col)
      // a NULL try_sum with contributing rows = accumulated overflow
      // (per-value magnitudes passed the domain guard, their sum did
      // not); n == 0 legitimately leaves the sums NULL and falls through
      // to the n > 1 condition → NULL r
      val overflowed = n > 0.0 && sums.map(_.isNull).reduce(_ || _)
      val va = n * col(s"__saa_$i") - col(s"__sa_$i") * col(s"__sa_$i")
      val vb = n * col(s"__sbb_$i") - col(s"__sb_$i") * col(s"__sb_$i")
      val cov = n * col(s"__sab_$i") - col(s"__sa_$i") * col(s"__sb_$i")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        n.cast("long").as("n"),
        guarded(
          when(overflowed, raise_error(lit(
            s"corrMatrix: accumulated sums for ($a, $b) overflowed the " +
              "DECIMAL(38,6) accumulator even though every value is " +
              "within the per-value domain; rescale the columns before " +
              "correlating")))
            .otherwise(when(n > 1.0 && va > 0.0 && vb > 0.0,
              cov / (sqrt(va) * sqrt(vb))))).as("pearson_r"))
    }
    one.select(explode(array(perPair: _*)).as("_p"))
      .select(col("_p.col_a").as("col_a"), col("_p.col_b").as("col_b"),
        col("_p.n").as("n"), col("_p.pearson_r").as("pearson_r"))
  }

  /** Pairwise SPEARMAN rank correlation over `cols` — [[corrMatrix]]'s
    * robust companion: Pearson over average ranks, so it reads
    * MONOTONE association (any shape) where Pearson reads linear, and
    * a single outlier moves it by at most one rank step instead of
    * dragging the whole moment. The profiling question it answers:
    * "are these features redundant in ORDER, not just in value?"
    *
    * Exactness: ranks are exact integers — the average tie rank
    * r(v) = |{x < v}| + (|{x = v}| + 1)/2 is carried DOUBLED,
    * r2(v) = 2·|{x < v}| + |{x = v}| + 1 (an exact long; halving
    * would mint .5s), and Pearson is invariant under positive scaling,
    * so ρ over r2 ≡ ρ over r. Moments are DECIMAL(38,0) sums of
    * DECIMAL(19,0) products (exact to n ≈ 3e12 rows — r2 ≤ 2n, so
    * Σr2² ≤ 4n³ < 10³⁸), presented as DOUBLE, and ρ is the
    * [[corrMatrix]] fixed IEEE chain over them — bit-identical
    * cross-engine, no domain guard needed because ranks are
    * controlled magnitudes, not user data. Zero-variance columns
    * (constant within the complete set) yield NULL.
    *
    * Semantics: LISTWISE deletion — rows with a NULL in ANY of `cols`
    * drop before ranking, so every pair shares one ranked population
    * (documented deviation from [[corrMatrix]]'s pairwise deletion:
    * per-pair ranks would need a rank map per pair, and mixed-pair
    * ranks are not Spearman's statistic).
    *
    * Scale shape: one value-grain aggregation per column, a cumulative
    * window over that GRAIN (single-partition but bounded by the
    * DISTINCT-value count — the profile_histogram contract; quantize
    * continuous columns first, e.g. [[quantileBins]]), an unhinted
    * join back per column (AQE broadcasts the small maps), then ONE
    * wide moment aggregate — nothing shuffles but grain rows and one
    * counter row. */
  def spearmanMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2,
      s"spearmanMatrix needs at least 2 columns, got $cols")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val base = df.select(cols.map(col): _*)
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val ranked = cols.foldLeft(base) { (d, c) =>
      val grain = base.groupBy(col(c).as("_v")).agg(count(lit(1)).as("_cnt"))
      val w = Window.orderBy(col("_v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val rmap = grain
        .withColumn("_below", coalesce(sum(col("_cnt")).over(w), lit(0L)))
        .select(col("_v").as(s"__v_$c"),
          (lit(2L) * col("_below") + col("_cnt") + lit(1L)).as(s"__r2_$c"))
      d.join(rmap, d(c) === rmap(s"__v_$c")).drop(s"__v_$c")
    }
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val dec = (c: Column) => c.cast(DecimalType(19, 0))
    val d38 = DecimalType(38, 0)
    val aggs = Seq(count(lit(1)).cast(DoubleType).as("__n")) ++
      cols.flatMap { c =>
        Seq(sum(dec(col(s"__r2_$c"))).cast(d38).cast(DoubleType)
              .as(s"__s_$c"),
          sum(dec(col(s"__r2_$c")) * dec(col(s"__r2_$c"))).cast(d38)
            .cast(DoubleType).as(s"__ss_$c"))
      } ++ pairs.zipWithIndex.map { case ((a, b), i) =>
        sum(dec(col(s"__r2_$a")) * dec(col(s"__r2_$b"))).cast(d38)
          .cast(DoubleType).as(s"__sp_$i")
      }
    val one = ranked.agg(aggs.head, aggs.tail: _*)
    val perPair = pairs.zipWithIndex.map { case ((a, b), i) =>
      val n = col("__n")
      val va = n * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")
      val vb = n * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b")
      val cov = n * col(s"__sp_$i") - col(s"__s_$a") * col(s"__s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        n.cast("long").as("n"),
        when(n > 1.0 && va > 0.0 && vb > 0.0,
          cov / (sqrt(va) * sqrt(vb))).as("spearman_rho"))
    }
    one.select(explode(array(perPair: _*)).as("_p"))
      .select(col("_p.col_a").as("col_a"), col("_p.col_b").as("col_b"),
        col("_p.n").as("n"), col("_p.spearman_rho").as("spearman_rho"))
  }

  /** Per-group z-score normalization ((x − mean) / stddev within
    * `keyCol`) — the group-wise feature scaling step, as ONE window
    * aggregate over the group: one shuffle on the key, no join back,
    * no second scan.
    *
    * The stddev is DERIVED from exact decimal sums (n, Σx, Σx²) rather
    * than taken from `stddev_samp`: Welford-style streaming variance
    * accumulates differently under every partial-aggregation order, so
    * its low bits vary run-to-run and engine-to-engine, while decimal
    * sums are exact and the closed-form variance
    * (Σx² − (Σx)²/n) / (n−1) is then a fixed chain of IEEE ops —
    * bit-identical on any cluster layout and in the DuckDB oracle.
    * Groups with n ≤ 1 (or zero variance) get NULL z — undefined, not
    * ±Inf/NaN. */
  def zscorePerGroup(
      df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val v = col(valueCol)
    val n = count(v).over(w).cast(DoubleType)
    // same domain discipline as [[corrMatrix]], per GROUP: try_cast so an
    // out-of-range value (or an overflowing Σ) can never abort the window
    // aggregate under ANSI or silently drop out of the sums while count()
    // still includes it (wrong mean/stddev, no diagnostic) — the NULL
    // falls through to the loud guards below. The extra max/abs rides the
    // same Window node: no additional shuffle or sort.
    val mx = max(abs(v)).over(w)
    // Integral inputs square in DECIMAL: a LongType v*v wraps silently
    // at |v| > ~3.04e9 — inside the documented ≤1e15 domain, so the mx
    // guard below would never notice (the acf/centroidCosineMatrix
    // overflow class). Fractional inputs keep the double square (one
    // IEEE op, mirrored by the oracle) — decimal-squaring those would
    // change the quantization order and every existing hash.
    val sq = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (v.cast(DecimalType(19, 0)) * v.cast(DecimalType(19, 0)))
          .try_cast(DecimalType(38, 6))
      case _ => (v * v).try_cast(DecimalType(38, 6))
    }
    val s1raw = sum(v.try_cast(DecimalType(38, 6))).over(w)
    val s2raw = sum(sq).over(w)
    val s1 = s1raw.cast(DoubleType)
    val s2 = s2raw.cast(DoubleType)
    val meanV = s1 / n
    val varV = (s2 - s1 * s1 / n) / (n - lit(1.0))
    df.withColumn("zscore",
      when(mx > 1e15, raise_error(lit(
        s"zscorePerGroup: |$valueCol| exceeds 1e15 in some group — squares " +
          "overflow the DECIMAL(38,6) accumulator; rescale/shift the " +
          "column (e.g. epoch-nanos -> seconds) first")))
        .when(mx > 0.0 && mx < 1e-3, raise_error(lit(
          s"zscorePerGroup: |$valueCol| is below 1e-3 throughout some " +
            "group — squares round to zero at the accumulator's 1e-6 " +
            "resolution; rescale the column first")))
        .when(n > 0.0 && (s1raw.isNull || s2raw.isNull), raise_error(lit(
          s"zscorePerGroup: accumulated sums of $valueCol overflowed the " +
            "DECIMAL(38,6) accumulator; rescale the column first")))
        .otherwise(when(n > 1.0 && varV > 0.0, (v - meanV) / sqrt(varV))))
  }

  /** Equi-depth quantile binning: assign each row the index (0..n−1)
    * of its value's quantile bucket — the curriculum/mixing grain
    * ("sample by quality quartile", "temperature-mix by perplexity
    * decile") computed the way it must be at corpus scale: ONE exact
    * interior-threshold aggregate, broadcast back onto the stream as a
    * 1-row frame, bin assignment a codegen'd chain of comparisons —
    * zero shuffles of the data itself, no rank window over the corpus
    * (an ntile() would funnel everything through a global sort).
    *
    * Exact (interpolated) percentiles by default: thresholds are
    * engine-exact (the [[winsorize]] precedent), so bin assignment is
    * oracled bit-for-bit. Ties AT a threshold go to the LOWER bin
    * (strict `>` against each interior threshold); NULL values keep a
    * NULL bin (the winsorize null discipline: never fabricate where
    * there is no measurement).
    *
    * `approxThresholds = true` is the production-scale mode: exact
    * `percentile` buffers EVERY value of the column in one aggregation
    * buffer — fine at oracle SFs, an executor OOM at the 100 TB design
    * point — while `approx_percentile` keeps a bounded KLL-style sketch
    * (≈ accuracy·log(n) entries) per partial aggregate. Drift bound:
    * Spark guarantees each approx threshold's RANK is within
    * n/accuracy of the exact rank, and a row changes bin only when its
    * rank falls between an exact and an approx threshold rank, so the
    * assignment-mismatch fraction vs exact mode is ≤
    * (nBins−1)/accuracy on a continuous column (ties sitting exactly
    * at a shifted threshold can add their tied mass on top) —
    * property-checked against real data in ProfileOpsSpec. */
  def quantileBins(df: DataFrame, valueCol: String, nBins: Int,
      outCol: String = "bin", approxThresholds: Boolean = false,
      approxAccuracy: Int = 10000): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(approxAccuracy >= 100,
      s"approxAccuracy must be >= 100, got $approxAccuracy")
    val q = "`" + valueCol.replace("`", "``") + "`"
    // quote BOTH resolution paths: col("a.b") would parse as struct
    // access while the expr-side backticks resolve the flat column —
    // the two sides of one operator must agree on what the name means
    val v = col(q)
    // ONE array-percentile aggregate: nBins−1 separate percentile
    // calls would each buffer and sort a full copy of the column —
    // ~100× the aggregation memory at nBins=100 for identical values
    val ps = (1 until nBins).map(k => k.toDouble / nBins)
    val thresholdAgg =
      if (approxThresholds)
        s"approx_percentile($q, array(${ps.mkString(", ")}), $approxAccuracy)"
      else s"percentile($q, array(${ps.mkString(", ")}))"
    val bounds = df.agg(expr(thresholdAgg).as("__ts"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        when(v.isNull, lit(null).cast(IntegerType))
          .otherwise((1 until nBins)
            .map(k => when(v > col("__ts").getItem(k - 1), 1).otherwise(0))
            .reduce(_ + _).cast(IntegerType)))
      .drop("__ts")
  }

  /** Two-snapshot distribution drift — the monitoring op a continuously
    * refreshed training corpus needs: bin BOTH snapshots on the
    * REFERENCE snapshot's exact equi-depth quantiles (drift must not
    * move the ruler it is measured with), then emit per-bin occupancy
    * shares and the standard drift statistics as per-bin terms:
    * `abs_diff` (the total-variation contribution, ×2), `chi2_term`
    * ((p_cur−p_ref)²/p_ref, NULL where the reference bin is empty) and
    * `ks_term` (|ΔCDF| at the bin's right edge — the KS statistic is
    * its max), plus a `drifted` flag at `driftThreshold` on abs_diff.
    *
    * Portability discipline: every emitted double is a FIXED IEEE op
    * sequence over exact integer counts (ratios, one subtract, one
    * multiply/divide) — never a cross-bin double sum, whose
    * accumulation order differs between engines; scalar totals (PSI,
    * χ², TV distance) are the caller's fold over the ≤ nBins rows.
    *
    * Scale shape: two quantileBins-style passes (1-row threshold
    * broadcast each, partial-agged bin counts — the only shuffles carry
    * nBins rows); the spine join, cumulative CDFs and share divisions
    * all run on the nBins-row post-agg frame (partition-less windows
    * are sanctioned on tiny frames, the layout_range_cluster shape).
    * NULL measurements are excluded from both snapshots (the winsorize
    * null discipline: they are absent, not zero). */
  def snapshotDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int, driftThreshold: Double = 0.1): DataFrame =
    driftScore(cur, driftFit(ref, valueCol, nBins), valueCol, driftThreshold)

  /** FIT half of the drift monitor — freeze the reference distribution
    * as a portable model frame, one row per bin: `bin`, `threshold`
    * (the bin's UPPER quantile edge; NULL on the last bin) and `n_ref`
    * (the reference's own occupancy). The model is parquet-able and
    * reloadable, so at 100 TB the reference corpus is scanned at fit
    * time ONCE EVER — every later refresh scores against the frozen
    * frame (the bm25Fit/nbFit contract). Offline cost note: the 1-row
    * threshold aggregate is referenced by both the self-binning pass
    * and the threshold attach, so fit pays an extra reference
    * aggregation — irrelevant for an offline one-time step, and
    * keeping the plan barrier-free avoids the eager-checkpoint cost
    * the agg_hll_merge measurement exposed. */
  def driftFit(ref: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val q = "`" + valueCol.replace("`", "``") + "`"
    val v = col(q)
    val ps = (1 until nBins).map(k => k.toDouble / nBins)
    val bounds = ref.filter(v.isNotNull).agg(
      expr(s"percentile($q, array(${ps.mkString(", ")}))").as("__ts"))
    val counts = ref.filter(v.isNotNull).crossJoin(broadcast(bounds))
      .select((1 until nBins)
        .map(k => when(v > col("__ts").getItem(k - 1), 1).otherwise(0))
        .reduce(_ + _).cast(IntegerType).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_ref"))
    // full 0..nBins−1 spine: an empty bin is a DRIFT SIGNAL (share 0),
    // not a missing row
    ref.sparkSession.range(nBins)
      .select(col("id").cast(IntegerType).as("bin"))
      .join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref"))
      .crossJoin(broadcast(bounds))
      // element_at is 1-based: bin k's upper edge is the k+1-th
      // threshold; the last bin is unbounded (NULL)
      .withColumn("threshold", when(col("bin") < nBins - 1,
        element_at(col("__ts"), col("bin") + 1)))
      .select(col("bin"), col("threshold"), col("n_ref"))
  }

  /** SCORE half — bin the monitored snapshot with a FROZEN [[driftFit]]
    * model and emit the per-bin drift statistics (see [[snapshotDrift]]
    * for the column contract and portability discipline). The model's
    * threshold rows fold back into ONE broadcast array in-plan; bin
    * assignment counts the thresholds below each value
    * (`size(filter(...))` over the ≤ nBins-element array — a monitoring
    * pass, not the corpus hot path). `materializeUnlessLeaf` guards the
    * double model reference (thresholds + n_ref) exactly as the search
    * and LM scorers do. */
  def driftScore(cur: DataFrame, model: DataFrame, valueCol: String,
      driftThreshold: Double = 0.1): DataFrame = {
    require(driftThreshold > 0.0,
      s"driftThreshold must be positive, got $driftThreshold")
    val q = "`" + valueCol.replace("`", "``") + "`"
    val v = col(q)
    val m = graft.ops.TextOps.materializeUnlessLeaf(model)
    val bounds = m.filter(col("threshold").isNotNull)
      .agg(sort_array(collect_list(struct(col("bin"), col("threshold"))))
        .as("_s"))
      .select(transform(col("_s"), e => e.getField("threshold")).as("__ts"))
    val binned = cur.filter(v.isNotNull).crossJoin(broadcast(bounds))
      .select(size(filter(col("__ts"), t => v > t))
        .cast(IntegerType).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_cur"))
    val wCum = Window.orderBy(col("bin"))
    val wAll = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    m.select(col("bin"), col("n_ref"))
      .join(binned, Seq("bin"), "left")
      .na.fill(0L, Seq("n_cur"))
      .withColumn("__nr", sum(col("n_ref")).over(wAll))
      .withColumn("__nc", sum(col("n_cur")).over(wAll))
      .withColumn("p_ref", col("n_ref").cast(DoubleType) / col("__nr"))
      .withColumn("p_cur", col("n_cur").cast(DoubleType) / col("__nc"))
      .withColumn("abs_diff", abs(col("p_ref") - col("p_cur")))
      .withColumn("chi2_term", when(col("n_ref") > 0,
        (col("p_cur") - col("p_ref")) * (col("p_cur") - col("p_ref"))
          / col("p_ref")))
      .withColumn("ks_term", abs(
        sum(col("n_ref")).over(wCum).cast(DoubleType) / col("__nr") -
          sum(col("n_cur")).over(wCum).cast(DoubleType) / col("__nc")))
      .withColumn("drifted",
        (col("abs_diff") > driftThreshold).cast(IntegerType))
      .drop("__nr", "__nc")
  }

  def winsorize(
      df: DataFrame, valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99,
      outCol: String = "clipped"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi,
      s"invalid percentile range [$pLo, $pHi]")
    // backtick-quote the interpolated name (escaping embedded backticks)
    // so names with dashes/spaces parse and nothing can splice SQL
    val q = "`" + valueCol.replace("`", "``") + "`"
    // quoted on both paths (the quantileBins rule): col("a.b") parses
    // as struct access while the expr-side backticks mean a flat name
    val v = col(q)
    val bounds = df.agg(
      expr(s"percentile($q, $pLo)").as("__lo"),
      expr(s"percentile($q, $pHi)").as("__hi"))
    df.crossJoin(broadcast(bounds))
      // greatest/least SKIP nulls, so an unguarded clamp would turn a
      // NULL measurement into the low bound — fabricating data exactly
      // where there is none; NULL must stay NULL
      .withColumn(outCol,
        when(v.isNull, lit(null))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Per-group simple linear regression (closed-form OLS): one row per
    * group with (n, slope, intercept, r2) for y ~ x — the per-segment
    * trend fit a monitoring pipeline runs over every partition of a
    * metric (is this source's quality drifting with document length?).
    *
    * Follows the corrMatrix numeric discipline: the five sums (Σx, Σy,
    * Σx², Σy², Σxy) accumulate in exact DECIMAL(38,6) — so partial-agg
    * order can't wiggle low bits — then one fixed chain of IEEE ops
    * derives slope/intercept/r² (bit-identical on any cluster layout
    * and in the DuckDB oracle restating the same chain). NOT
    * regr_slope/regr_intercept: both engines implement those as
    * streaming double accumulations whose results depend on
    * partial-aggregation order. Degenerate groups (n ≤ 1 or zero x
    * variance) yield NULL fit columns — undefined, not ±Inf/NaN.
    *
    * Scale shape: ONE map-side-combinable aggregate over the group key
    * — a single shuffle of 6 decimals per group, no second scan, no
    * join. try_sum + the magnitude guard surface out-of-domain columns
    * loudly instead of returning a finite-but-wrong fit (corrMatrix's
    * contract).
    *
    * Cross-engine presentation note (measured): keep Σx², Σy², Σxy
    * under ~9e9 (i.e. ≤ 2⁵³ after the 10⁶ decimal scaling) if the fit
    * must hash-match an engine that converts int128 decimals to double
    * by double-rounding (int128→double, then ÷10⁶) — past that, its
    * cast can sit 1 ulp off a correctly-rounded decimal→double and r²
    * surfaces it. Pre-scale the inputs (e.g. price → price/1000); the
    * slope/r² are scale-equivariant. */
  def olsByGroup(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = (c: Column) => c.try_cast(DecimalType(38, 6))
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val cx = when(both, col(xCol))
    val cy = when(both, col(yCol))
    val agged = df.groupBy(col(keyCol))
      .agg(
        count(when(both, lit(1))).cast(DoubleType).as("__n"),
        try_sum(dec(cx)).cast(DoubleType).as("__sx"),
        try_sum(dec(cy)).cast(DoubleType).as("__sy"),
        try_sum(dec(cx * cx)).cast(DoubleType).as("__sxx"),
        try_sum(dec(cy * cy)).cast(DoubleType).as("__syy"),
        try_sum(dec(cx * cy)).cast(DoubleType).as("__sxy"),
        // guard only rows that CONTRIBUTE (both non-null): a huge x on
        // a pairwise-deleted row must not abort a valid fit
        max(when(both, greatest(abs(col(xCol)), abs(col(yCol)))))
          .as("__mx"))
    val n = col("__n")
    val sums = Seq("__sx", "__sy", "__sxx", "__syy", "__sxy").map(col)
    val overflowed = n > 0.0 && sums.map(_.isNull).reduce(_ || _)
    val dxx = n * col("__sxx") - col("__sx") * col("__sx")
    val dyy = n * col("__syy") - col("__sy") * col("__sy")
    val dxy = n * col("__sxy") - col("__sx") * col("__sy")
    val slope = dxy / dxx
    val guard =
      when(col("__mx") > 1e15, raise_error(lit(
        s"olsByGroup: |$xCol|/|$yCol| exceeds 1e15 — products overflow " +
          "the DECIMAL(38,6) accumulator; rescale before fitting")))
        .when(overflowed, raise_error(lit(
          s"olsByGroup: accumulated sums for ($xCol, $yCol) overflowed " +
            "the DECIMAL(38,6) accumulator; rescale before fitting")))
    agged
      .withColumn("slope", guard.otherwise(
        when(n > 1.0 && dxx > 0.0, slope)))
      .withColumn("intercept",
        when(col("slope").isNotNull,
          (col("__sy") - col("slope") * col("__sx")) / n))
      .withColumn("r2",
        when(col("slope").isNotNull && dyy > 0.0,
          (dxy * dxy) / (dxx * dyy)))
      .select(col(keyCol), n.cast(LongType).as("n"),
        col("slope"), col("intercept"), col("r2"))
  }

  /** Robust per-group outlier summary via median absolute deviation:
    * one row per group with (n, med, mad, n_outliers) where an outlier
    * is |x − median| > k·MAD — the heavy-tail-safe alternative to
    * z-scores (a single corrupt sentinel moves a mean/stddev gate, not
    * a median/MAD one).
    *
    * Two exact `percentile` aggregates (median, then median of
    * absolute deviations), each a slim per-group row broadcast back —
    * the winsorize scalar-frame shape, per group. Determinism: both
    * engines interpolate the 0.5 quantile as the midpoint of the two
    * central values (Spark `percentile` ≡ DuckDB `quantile_cont`), so
    * inputs exact at some resolution (integer-valued doubles here)
    * stay exactly representable through med, |x−med| and k·MAD, making
    * every comparison bit-determined.
    *
    * Scale caveat (quantileBins' twin): exact `percentile` buffers the
    * group's values in one aggregation buffer. `approxMedian = true`
    * swaps both aggregates to `approx_percentile(…, accuracy)` —
    * bounded memory at 100 TB, rank error ≤ 1/accuracy; the oracled
    * key uses the exact mode. MAD = 0 (over half the group at the
    * median) makes ANY deviation an outlier — the conventional
    * degenerate reading. */
  /** `broadcastGroupStats`: the medians/MADs frames are GROUP-grain,
    * not scalar — broadcasting them is only safe while the group count
    * is small. The flag is a CALLER ASSERTION of low key cardinality,
    * trusted and not checked (verifying it would re-run the median
    * aggregation just to count it); with the default `false` the
    * planner picks the join (AQE will still broadcast a small post-agg
    * side on its own). */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      k: Double = 3.0, approxMedian: Boolean = false,
      accuracy: Int = 10000, broadcastGroupStats: Boolean = false): DataFrame = {
    require(k > 0, s"madOutliers: k must be > 0, got $k")
    val q = "`" + valueCol.replace("`", "``") + "`"
    def med(c: String): Column =
      if (approxMedian) expr(s"approx_percentile($c, 0.5D, $accuracy)")
        .cast(DoubleType)
      else expr(s"percentile($c, 0.5D)")
    def hint(groups: DataFrame): DataFrame =
      if (broadcastGroupStats) broadcast(groups) else groups
    val medians = df.groupBy(col(keyCol))
      .agg(med(q).as("__med"), count(col(q)).as("__n"))
    val withDev = df.join(hint(medians), Seq(keyCol))
      .withColumn("__dev", abs(col(q) - col("__med")))
    val mads = withDev.groupBy(col(keyCol))
      .agg(med("__dev").as("__mad"))
    withDev.join(hint(mads), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(
        max(col("__n")).as("n"),
        max(col("__med")).as("med"),
        max(col("__mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Per-group Tukey-fence outliers: x outside [Q1 − k·IQR, Q3 + k·IQR]
    * — the box-plot gate ([[madOutliers]]' quartile-based sibling; IQR
    * fences are the convention dashboards draw, MAD the more robust
    * gate when >25% of a group can be corrupt). ONE exact `percentile`
    * aggregate (both quartiles from one array-typed call), the slim
    * group frame broadcast back — the madOutliers shape.
    *
    * Determinism: percentile ≡ quantile_cont at ranks (n−1)·p (the
    * fn_percentile-pinned identity), and for p ∈ {0.25, 0.75} the
    * interpolation fraction is an exact binary (dyadic) rational, so
    * INTEGER inputs produce exactly-representable quartiles; 1.5·IQR
    * and both fences stay exact, making every comparison
    * bit-determined (the same argument as madOutliers' k·MAD).
    * k defaults to Tukey's 1.5 and must be dyadic for the argument to
    * hold — enforced. Same scale caveat as madOutliers: exact
    * percentile buffers a group's values; `approx` swaps to
    * approx_percentile's bounded memory (unit-compared, not oracled). */
  def iqrOutliers(df: DataFrame, keyCol: String, valueCol: String,
      k: Double = 1.5, approx: Boolean = false,
      accuracy: Int = 10000, broadcastGroupStats: Boolean = false): DataFrame = {
    require(k > 0, s"iqrOutliers: k must be > 0, got $k")
    require((k * 4).isWhole,
      s"iqrOutliers: k must be a multiple of 0.25 (dyadic — the " +
        s"exactness contract), got $k")
    val q = "`" + valueCol.replace("`", "``") + "`"
    val quarts =
      if (approx)
        expr(s"approx_percentile($q, array(0.25D, 0.75D), $accuracy)")
      else expr(s"percentile($q, array(0.25D, 0.75D))")
    val stats = df.groupBy(col(keyCol))
      .agg(quarts.as("__qs"), count(col(q)).as("__n"))
      .select(col(keyCol), col("__n"),
        element_at(col("__qs"), 1).cast(DoubleType).as("__q1"),
        element_at(col("__qs"), 2).cast(DoubleType).as("__q3"))
    val hinted = if (broadcastGroupStats) broadcast(stats) else stats
    df.join(hinted, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(
        max(col("__n")).as("n"),
        max(col("__q1")).as("q1"),
        max(col("__q3")).as("q3"),
        max(col("__q3") - col("__q1")).as("iqr"),
        sum(when(
          col(q) < col("__q1") - lit(k) * (col("__q3") - col("__q1")) ||
          col(q) > col("__q3") + lit(k) * (col("__q3") - col("__q1")),
          1L).otherwise(0L)).as("n_outliers"))
  }

  /** Welch two-sample t statistic + Welch–Satterthwaite df for the
    * mean difference between two slices — the unequal-variance test an
    * experimentation pipeline runs on a continuous metric (the
    * continuous companion to [[rateWilsonCi]]'s binomial band; no
    * p-value — that needs the t CDF, and the statistic/df pair is what
    * downstream lookup consumes).
    *
    * ONE map-side-combinable aggregation (conditional sums — no join,
    * no pivot, no broadcast): per group n (long), Σx (long),
    * Σx² (DECIMAL(38,0) — squares of integer inputs overflow longs at
    * corpus scale). The corrected sum of squares q = n·Σx² − (Σx)²
    * stays exact decimal; each s²/n = q/(n²(n−1)) is ONE division,
    * and t / df are short fixed IEEE chains over those — restated
    * textually by the oracle (which casts wide decimals through
    * VARCHAR: DuckDB's direct decimal→double cast double-rounds past
    * 2⁵³, strtod does not).
    *
    * Exactness bound (the acf-style contract): q = n·Σx² − (Σx)²
    * multiplies two DECIMAL(38,0) values and Spark CAPS the product at
    * precision 38 — on (non-ANSI) overflow the statistic silently goes
    * NULL rather than wrapping. Exact whenever n·Σx² < 10³⁸, i.e.
    * n²·max(x)² < 10³⁸ ⇔ n·max|x| < 10¹⁹ — e.g. 10¹² rows of values up
    * to 10⁷, far past any realistic metric slice; past it the output is
    * NULL (visible), never a wrong number. */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    val g = col(groupCol)
    val x = col(valueCol)
    def side(cond: Column, tag: String) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n$tag"),
      sum(when(cond, x).otherwise(lit(0L))).as(s"sx$tag"),
      sum(when(cond, (x * x).cast(DecimalType(38, 0))).otherwise(
        lit(0L).cast(DecimalType(38, 0)))).as(s"sxx$tag"))
    val aggs = side(g === groupA, "1") ++ side(g === groupB, "2")
    val m = df.agg(aggs.head, aggs.tail: _*)
    def mean(t: String) =
      col(s"sx$t").cast(DoubleType) / col(s"n$t").cast(DoubleType)
    def varOverN(t: String) =
      (col(s"n$t").cast(DecimalType(38, 0)) * col(s"sxx$t") -
        (col(s"sx$t").cast(DecimalType(19, 0)) *
          col(s"sx$t").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)))
        .cast(StringType).cast(DoubleType) /
        (col(s"n$t") * col(s"n$t") * (col(s"n$t") - 1)).cast(DoubleType)
    m.select(
        col("n1"), col("n2"),
        mean("1").as("mean1"), mean("2").as("mean2"),
        varOverN("1").as("v1"), varOverN("2").as("v2"))
      .select(col("n1"), col("n2"), col("mean1"), col("mean2"),
        col("v1"), col("v2"),
        ((col("mean1") - col("mean2")) / sqrt(col("v1") + col("v2")))
          .as("t"),
        (((col("v1") + col("v2")) * (col("v1") + col("v2"))) /
          (col("v1") * col("v1") / (col("n1") - 1).cast(DoubleType) +
            col("v2") * col("v2") / (col("n2") - 1).cast(DoubleType)))
          .as("df"))
  }

  /** Robust per-group scaling: (x − median) / IQR — the standardization
    * a heavy-tailed metric actually wants ([[prep_zscore_group]]'s
    * mean/stddev moves with a single corrupt sentinel; median/IQR do
    * not). ONE array-percentile aggregate per group (the
    * [[iqrOutliers]] frame, plus the median), slim stats joined back;
    * median and quartiles of integer inputs are exactly representable
    * (dyadic interpolation fractions), so the scaled value is ONE IEEE
    * division per row. IQR = 0 (over half the group between Q1 and Q3
    * tied) yields NULL — the degenerate-group convention, never a
    * division blowup. */
  def robustScale(df: DataFrame, keyCol: String, valueCol: String,
      broadcastGroupStats: Boolean = false): DataFrame = {
    val q = "`" + valueCol.replace("`", "``") + "`"
    val stats = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($q, array(0.25D, 0.5D, 0.75D))").as("__qs"))
      .select(col(keyCol),
        element_at(col("__qs"), 2).cast(DoubleType).as("__med"),
        (element_at(col("__qs"), 3) - element_at(col("__qs"), 1))
          .cast(DoubleType).as("__iqr"))
    val hinted = if (broadcastGroupStats) broadcast(stats) else stats
    df.join(hinted, Seq(keyCol))
      .withColumn("scaled",
        when(col("__iqr") =!= 0.0,
          (col(q) - col("__med")) / col("__iqr")))
      .drop("__med", "__iqr")
  }

  /** Poisson bootstrap confidence interval for a mean (Chamandy et al.
    * 2012 — THE distributed bootstrap): classical resampling needs a
    * global sample-with-replacement per replicate, which doesn't
    * distribute; drawing each row's per-replicate multiplicity from
    * Poisson(1) instead is exchange-free — every weight is a pure
    * per-row function, replicates partial-aggregate map-side, and the
    * shuffle carries B rows per partition regardless of data size
    * (compute is B passes over the rows, the honest bootstrap cost).
    *
    * Deterministic end to end: multiplicities come from the portable
    * LCG coin of (id·B + replicate + seed) pushed through the
    * Poisson(1) inverse CDF as a literal cutoff array (prefix count —
    * the popularityNegatives probe shape), sums ride exact
    * DECIMAL(18,6), and the CI bounds are percentiles of the B
    * replicate means. CHOOSE `loP`/`hiP` so `p·(B−1)` is an integer —
    * the percentile then lands exactly ON an order statistic and no
    * interpolation arithmetic exists to differ across engines
    * (B = 33 with p = 1/32, 31/32 is the canonical choice; enforced).
    * Output: one row (n, mean, ci_lo, ci_hi, b). */
  def bootstrapMeanCi(
      df: DataFrame, idCol: String, valueCol: String,
      b: Int = 33, loP: Double = 0.03125, hiP: Double = 0.96875,
      seed: Long = 42L): DataFrame = {
    require(b >= 8, s"bootstrapMeanCi: b must be >= 8, got $b")
    require(loP > 0 && hiP < 1 && loP < hiP,
      s"bootstrapMeanCi: need 0 < loP < hiP < 1, got $loP/$hiP")
    def exactIdx(p: Double) = p * (b - 1) == math.floor(p * (b - 1))
    require(exactIdx(loP) && exactIdx(hiP),
      s"bootstrapMeanCi: p·(B−1) must be integral so the percentile is " +
        s"an exact order statistic (no cross-engine interpolation); " +
        s"got loP·${b - 1} = ${loP * (b - 1)}, hiP·${b - 1} = ${hiP * (b - 1)}")
    val cuts = typedlit(Seq(
      0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
      0.999916758850712, 0.9999897508033253, 0.999998874797402))
    val rows = df
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol).as("_id"),
        col(valueCol).cast(DecimalType(18, 6)).as("_x"))
    val repl = rows
      .withColumn("_b", explode(sequence(lit(1), lit(b))))
      .withColumn("_u", SampleOps.portableUniform(
        col("_id") * lit(b.toLong) + col("_b") + lit(seed)))
      .withColumn("_w", size(filter(cuts, c => c <= col("_u"))).cast(LongType))
      .groupBy(col("_b"))
      .agg((sum(col("_w") * col("_x")).cast(DoubleType) /
        sum(col("_w")).cast(DoubleType)).as("_mb"))
    val ci = repl.agg(
      expr(s"percentile(_mb, ${loP}D)").as("ci_lo"),
      expr(s"percentile(_mb, ${hiP}D)").as("ci_hi"))
    rows.agg(count(lit(1)).as("n"),
      (sum(col("_x")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("mean"))
      .crossJoin(broadcast(ci))
      .withColumn("b", lit(b.toLong))
  }

  /** Categorical distribution profile per group: row count, distinct
    * category count, Shannon entropy, entropy normalized by ln(k), and
    * the Gini impurity — the concentration dashboard for a training
    * mix ("is source X all one language", "did the crawl collapse to
    * three domains"). Low entropy + high Gini = concentration alarm.
    *
    * Determinism across engines: per-category shares p = cnt/total are
    * single IEEE divisions of exact longs; each transcendental TERM
    * (p·ln p, and ln k for the normalizer) is quantized to
    * DECIMAL(20,9) immediately (the text_unigram_logprob discipline —
    * `ln` is not guaranteed correctly rounded, so its last ulp must
    * never reach a cross-row double sum), p² likewise; quantized terms
    * then add EXACTLY in any order. Two aggregates: (group, category)
    * counts, then the per-group rollup — the per-group share window
    * runs over the tiny category-grain frame, not the data. */
  def categoricalProfile(
      df: DataFrame, keyCol: String, catCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val counts = df
      .filter(col(keyCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(keyCol), col(catCol))
      .agg(count(lit(1)).as("_cnt"))
    val p = col("_cnt").cast(DoubleType) /
      sum(col("_cnt")).over(W.partitionBy(col(keyCol))).cast(DoubleType)
    val q = (c: Column) => c.cast(DecimalType(20, 9))
    val terms = counts
      .withColumn("_hterm", q(-(p * log(p))))
      .withColumn("_gterm", q(p * p))
    terms.groupBy(col(keyCol))
      .agg(sum(col("_cnt")).as("n"),
        count(lit(1)).as("k"),
        sum(col("_hterm")).cast(DoubleType).as("entropy"),
        (lit(1.0) - sum(col("_gterm")).cast(DoubleType)).as("gini"))
      .withColumn("norm_entropy",
        when(col("k") > 1,
          col("entropy") /
            q(log(col("k").cast(DoubleType))).cast(DoubleType))
          .otherwise(lit(0.0)))
  }

  /** Volume anomaly monitor: bucket row counts by `truncUnit` of
    * `tsCol` and flag buckets whose count deviates from the bucket
    * median by more than k·MAD — the robust pipeline-health gate
    * ("ingest fell off a cliff at 14:00", "a crawler loop 40×'d one
    * hour") that a mean/stddev z-score misses as soon as the anomaly
    * itself inflates the stddev. Per-BUCKET rows with the flag as
    * data, unlike [[madOutliers]]' per-group rollup.
    *
    * Scale shape: ONE partial-aggregating groupBy collapses the stream
    * to bucket grain (output rows = time range / bucket width — tiny);
    * median and MAD are exact percentiles over THAT frame, broadcast
    * back as 1-row frames (the winsorize pattern). Counts are exact
    * longs, exact-percentile medians of longs are dyadic rationals —
    * every comparison is IEEE-exact, so the key oracles bit-for-bit. */
  def volumeAnomaly(
      df: DataFrame, tsCol: String, truncUnit: String = "hour",
      k: Double = 4.0): DataFrame = {
    require(k > 0, s"volumeAnomaly: k must be > 0, got $k")
    val counts = df.filter(col(tsCol).isNotNull)
      .groupBy(date_trunc(truncUnit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val med = counts.agg(expr("percentile(cnt, 0.5D)").as("_med"))
    val withDev = counts.crossJoin(broadcast(med))
      .withColumn("deviation", abs(col("cnt").cast(DoubleType) - col("_med")))
    val mad = withDev.agg(expr("percentile(deviation, 0.5D)").as("_mad"))
    withDev.crossJoin(broadcast(mad))
      .select(col("bucket"), col("cnt"), col("_med").as("med"),
        col("deviation"), col("_mad").as("mad"),
        (col("deviation") > lit(k) * col("_mad")).as("is_anomaly"))
  }

  /** Smoothed (m-estimate) target encoding: the per-category mean of a
    * numeric target shrunk toward the global mean,
    * `enc = (Σy_cat + m·prior) / (n_cat + m)` — the categorical-feature
    * encoder for high-cardinality categories where the raw per-category
    * mean overfits rare levels (Micci-Barreca 2001). Returns the FIT
    * table (category, n, sum, enc): the frozen model artifact in the
    * house fit/score convention — score time is a broadcast join of
    * this table, never a recompute.
    *
    * Determinism: target values accumulate in an exact DECIMAL(18,6)
    * sum (partial-aggregation order can't wiggle it), the prior comes
    * from re-aggregating the per-category sums (exact decimal adds —
    * no second scan of the data), and `enc` is one fixed IEEE chain
    * over exact inputs ⇒ bit-reproducible cross-engine. ONE shuffle at
    * the category grain; the prior is a 1-row broadcast frame. */
  def targetEncode(
      df: DataFrame, catCol: String, targetCol: String,
      m: Double = 10.0): DataFrame = {
    require(m >= 0, s"targetEncode: m must be >= 0, got $m")
    val perCat = df
      .filter(col(catCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("n"),
        sum(col(targetCol).cast(DecimalType(18, 6))).as("_dsum"))
    val prior = perCat.agg(
      (sum(col("_dsum")).cast(DoubleType) /
        sum(col("n")).cast(DoubleType)).as("_prior"))
    perCat.crossJoin(broadcast(prior))
      .select(col(catCol), col("n"),
        col("_dsum").cast(DoubleType).as("sum_target"),
        ((col("_dsum").cast(DoubleType) + lit(m) * col("_prior")) /
          (col("n").cast(DoubleType) + lit(m))).as("enc"))
  }

  /** Per-group binomial rate with a Wilson score interval — the
    * monitoring primitive behind "is source X's defect rate really
    * higher, or is the group just small": unlike the naive ±z·√(p̂q̂/n)
    * Wald band, Wilson stays inside [0,1] and keeps coverage at small
    * n and extreme rates (Brown, Cai & DasGupta 2001), which is what a
    * per-slice quality dashboard over thousands of uneven groups needs.
    *
    * ONE map-side-combinable aggregate: (n, k) are exact long counts,
    * everything after is a FIXED per-group IEEE sequence over those two
    * longs — `sqrt` is correctly rounded under IEEE 754, so the whole
    * row is bit-reproducible across engines and partitionings. `flag`
    * is any boolean condition column; NULL flags count toward n as
    * non-successes (rows the predicate couldn't assert are failures of
    * the expectation, matching QualityOps' convention).
    */
  def rateWilsonCi(
      df: DataFrame, keyCol: String, flag: Column,
      z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"rateWilsonCi: z must be > 0, got $z")
    val agg = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(flag, 1L).otherwise(0L)).as("k"))
    val n = col("n").cast(DoubleType)
    val kk = col("k").cast(DoubleType)
    val z2 = lit(z * z)
    val phat = kk / n
    val denom = lit(1.0) + z2 / n
    val center = (phat + z2 / (lit(2.0) * n)) / denom
    val half = (lit(z) *
      sqrt(phat * (lit(1.0) - phat) / n + z2 / (lit(4.0) * n * n))) / denom
    agg.select(col(keyCol), col("n"), col("k"),
      phat.as("rate"),
      (center - half).as("ci_lo"),
      (center + half).as("ci_hi"))
  }

  /** Cohen's kappa between two binary raters (Cohen 1960) — the
    * chance-corrected agreement a filter-ensemble audit reads before
    * AND-ing or voting quality rules: raw agreement p_o overstates
    * consensus when both raters mostly say "keep" (imbalanced
    * marginals inflate chance agreement p_e).
    *
    * Exactness discipline: ONE map-side-combinable aggregation to the
    * four exact confusion counts; kappa = (p_o − p_e)/(1 − p_e) is
    * cleared of divisions by ×n² — numerator n·(n11+n00) − (a1·b1 +
    * a0·b0), denominator n² − (a1·b1 + a0·b0), both exact
    * DECIMAL(38,0) products (counts are corpus-scale longs; n² passes
    * 2⁶³ at n > ~3e9 — the HASH_NOTES overflow class), then ONE IEEE
    * division. p_o and p_e present the same way. Degenerate marginals
    * (denominator 0: both raters constant) yield NULL kappa, not a
    * poisoned division — identically cross-engine.
    *
    * `raterA`/`raterB` are any boolean conditions; NULL evaluates
    * false (a rater that cannot assert did not flag — the
    * rateWilsonCi convention). Output: one row (n, n11, n10, n01,
    * n00, po, pe, kappa). */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val a = when(raterA, 1L).otherwise(0L)
    val b = when(raterB, 1L).otherwise(0L)
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(when(a === 1L && b === 1L, 1L).otherwise(0L)).as("n11"),
      sum(when(a === 1L && b === 0L, 1L).otherwise(0L)).as("n10"),
      sum(when(a === 0L && b === 1L, 1L).otherwise(0L)).as("n01"),
      sum(when(a === 0L && b === 0L, 1L).otherwise(0L)).as("n00"))
    def d19(c: Column): Column = c.cast(DecimalType(19, 0))
    val a1 = col("n11") + col("n10")
    val a0 = col("n01") + col("n00")
    val b1 = col("n11") + col("n01")
    val b0 = col("n10") + col("n00")
    val agree = col("n11") + col("n00")
    val peNum = (d19(a1) * d19(b1) + d19(a0) * d19(b0))
      .cast(DecimalType(38, 0))
    val n2 = (d19(col("n")) * d19(col("n"))).cast(DecimalType(38, 0))
    val kNum = (d19(col("n")) * d19(agree)).cast(DecimalType(38, 0)) - peNum
    val kDen = n2 - peNum
    // n = 0 guards on po/pe too (HASH_NOTES rule 5: Spark x/0 → NULL
    // but another engine's IEEE division → NaN/±inf — divergent)
    agg.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      when(col("n") > 0,
        agree.cast(DoubleType) / col("n").cast(DoubleType)).as("po"),
      when(col("n") > 0,
        peNum.cast(DoubleType) / n2.cast(DoubleType)).as("pe"),
      when(kDen =!= 0,
        kNum.cast(DoubleType) / kDen.cast(DoubleType)).as("kappa"))
  }

  /** Exact weighted median per group: the smallest value v whose
    * cumulative weight (values ≤ v, ascending) reaches half the
    * group's total — the lower weighted median, the robust center for
    * observations of unequal importance (revenue-weighted price,
    * token-weighted doc score) where the unweighted median
    * ([[madOutliers]]' `med`) over-counts cheap rows.
    *
    * Shape: the stream first aggregates to (group, value) grain — the
    * window then runs over DISTINCT values per group, not rows, so a
    * 100 TB table with bounded value cardinality windows over a tiny
    * frame (the one shuffle that matters is the grain aggregation; the
    * window reuses its partitioning). Weights accumulate in exact
    * DECIMAL(18,6) and the half-total test is `2·cum ≥ total` — no
    * division, no doubles, so the pick is bit-deterministic and
    * restatable in ANSI SQL. Negative weights are rejected (the
    * cumulative-reach definition is meaningless under them); NULL
    * values or weights are excluded up front. */
  def weightedMedian(df: DataFrame, keyCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    requireNumeric(df, valueCol, "weightedMedian")
    requireNumeric(df, weightCol, "weightedMedian")
    val grain = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      // in-plan guard, the Flatten.raggedGuard pattern: zero extra
      // scans, healthy rows never evaluate the error branch
      .withColumn("_wchk",
        when(col(weightCol) < 0, raise_error(concat(
          lit("weightedMedian: negative weight for value "),
          col(valueCol).cast("string"))))
          .otherwise(col(weightCol)))
      .groupBy(col(keyCol), col(valueCol))
      .agg(sum(col("_wchk").cast(DecimalType(18, 6))).as("_w"))
    val byVal = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val all = Window.partitionBy(col(keyCol))
    grain
      .withColumn("_cum", sum(col("_w")).over(
        byVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_tot", sum(col("_w")).over(all))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(col(keyCol))
      .agg(min(col(valueCol)).as("w_median"))
  }

  /** Exact weighted quantiles per group — [[weightedMedian]]
    * generalized to a quantile vector: for each q, the smallest value
    * whose cumulative weight reaches q·total (the lower/left-continuous
    * inverse-CDF convention). Each q must be an exact multiple of
    * 1/10000: the reach test is `10000·cum ≥ q₁₀₀₀₀·total` over exact
    * decimals — no division, no doubles, bit-deterministic — and a
    * basis-point grid covers every quantile a profile gate asks for.
    * Output: one row per (group, q) — (`keyCol`, `q` DOUBLE, `value`).
    *
    * Scale shape: identical to [[weightedMedian]] (the window runs on
    * the (group, value) grain) plus one explode of the ≤|qs|-element
    * literal array — rows multiply by |qs| only AFTER the grain
    * aggregation. */
  def weightedQuantiles(df: DataFrame, keyCol: String, valueCol: String,
      weightCol: String, qs: Seq[Double]): DataFrame = {
    requireNumeric(df, valueCol, "weightedQuantiles")
    requireNumeric(df, weightCol, "weightedQuantiles")
    require(qs.nonEmpty, "weightedQuantiles: qs must be non-empty")
    val qbp = qs.map { q =>
      require(q > 0.0 && q <= 1.0,
        s"weightedQuantiles: q must be in (0,1], got $q")
      val bp = math.round(q * 10000.0)
      require(bp.toDouble / 10000.0 == q,
        s"weightedQuantiles: q must be a multiple of 1/10000, got $q")
      bp
    }
    val grain = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .withColumn("_wchk",
        when(col(weightCol) < 0, raise_error(concat(
          lit("weightedQuantiles: negative weight for value "),
          col(valueCol).cast("string"))))
          .otherwise(col(weightCol)))
      .groupBy(col(keyCol), col(valueCol))
      .agg(sum(col("_wchk").cast(DecimalType(18, 6))).as("_w"))
    val byVal = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val all = Window.partitionBy(col(keyCol))
    grain
      .withColumn("_cum", sum(col("_w")).over(
        byVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_tot", sum(col("_w")).over(all))
      .withColumn("_qbp", explode(lit(qbp.toArray)))
      .filter(col("_cum") * 10000 >= col("_qbp") * col("_tot"))
      .groupBy(col(keyCol), col("_qbp"))
      .agg(min(col(valueCol)).as("value"))
      .select(col(keyCol),
        (col("_qbp").cast(DoubleType) / 10000.0).as("q"), col("value"))
  }

  /** Benford first-digit profile (Newcomb 1881 / Benford 1938): the
    * observed first-significant-digit distribution of a positive
    * amount column against Benford's log₁₀(1 + 1/d) law, with
    * per-digit χ² terms — the classic fabricated-/truncated-data
    * tripwire for financial-style columns ([[volumeAnomaly]]'s
    * cousin at the value grain rather than the time grain).
    *
    * Determinism: the digit comes from `floor(v·100)` cast to an
    * integer and THEN to a string — one IEEE multiply, an exact floor,
    * and an exact integer→string conversion; DOUBLE→string formatting
    * (engine-specific) never happens. Expected shares are log₁₀
    * constants quantized ONCE to DECIMAL(12,6) (the
    * [[TextOps.zipfSlope]] grid trick); each χ² term is a fixed IEEE
    * chain over (exact count, quantized expectation, exact total).
    * Values below 0.01 would yield digit 0 and are excluded with the
    * non-positives (documented domain: amounts ≥ 0.01).
    *
    * Scale: ONE digit-grain aggregation (≤9 rows out) + a 1-row total
    * broadcast. Output: (digit, n, share, expected, chi2_term). */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    requireNumeric(df, valueCol, "benfordProfile")
    val v = col(valueCol)
    val cents = floor(v.cast(DoubleType) * lit(100.0)).cast(LongType)
    val digit = substring(cents.cast(StringType), 1, 1).cast(IntegerType)
    val counts = df.filter(v.isNotNull && v >= 0.01)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_tot"))
    val grid = df.sparkSession.range(1, 10)
      .select(col("id").cast(IntegerType).as("digit"))
    val expected = log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType))
      .cast(DecimalType(12, 6))
    grid.join(broadcast(counts), Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("_tot"), expected.as("_exp"))
      .select(col("digit"), col("n"),
        (col("n").cast(DoubleType) / col("_tot").cast(DoubleType)).as("share"),
        col("_exp").cast(DoubleType).as("expected"),
        ((col("n").cast(DoubleType) -
            col("_exp").cast(DoubleType) * col("_tot").cast(DoubleType)) *
          (col("n").cast(DoubleType) -
            col("_exp").cast(DoubleType) * col("_tot").cast(DoubleType)) /
          (col("_exp").cast(DoubleType) * col("_tot").cast(DoubleType)))
          .as("chi2_term"))
  }

  /** Per-group Gini coefficient of a non-negative value column — the
    * inequality/concentration profile (order-value concentration,
    * token-count skew across sources): G = 0 everyone equal, → 1 one
    * row holds everything. Rank form over the ascending sort:
    * G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ).
    *
    * Determinism: values accumulate as exact DECIMAL(18,6); Σ i·xᵢ is
    * invariant under any ordering of TIED values (equal x contribute
    * the same total over any rank assignment), so the row_number tie
    * order cannot leak into the result; the closing formula is ONE
    * fixed IEEE chain over the exact sums. Negative values are
    * rejected in-plan (the rank form is meaningless under them); an
    * all-zero group divides 0/0 → NaN, identically on both engines.
    * Wide-decimal→double caveat (measured here): Σi·x exceeds 2⁵³ at
    * bench scale, and DuckDB's direct `CAST(DECIMAL AS DOUBLE)`
    * double-rounds (int128→double, then the scale divide) — 1 ulp off
    * Spark's correctly-rounded BigDecimal.doubleValue. The oracle
    * casts through VARCHAR (strtod is correctly rounded), which
    * matches at any magnitude.
    *
    * Scale: one window sort per group (the honest cost of exact rank
    * weighting) + one aggregation; group grain out. */
  def giniByGroup(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    requireNumeric(df, valueCol, "giniByGroup")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val guarded = df
      .filter(col(valueCol).isNotNull)
      .withColumn("_gx",
        when(col(valueCol) < 0, raise_error(concat(
          lit("giniByGroup: negative value "),
          col(valueCol).cast("string"))))
          .otherwise(col(valueCol)).cast(DecimalType(18, 6)))
    val sums = guarded
      .withColumn("_gi", row_number().over(w).cast(DecimalType(10, 0)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("_gx")).as("_sx"),
        sum(col("_gi") * col("_gx")).as("_six"))
    val nD = col("n").cast(DoubleType)
    sums.select(col(keyCol), col("n"),
      col("_sx").cast(DoubleType).as("total"),
      ((lit(2.0) * col("_six").cast(DoubleType) -
        (nD + lit(1.0)) * col("_sx").cast(DoubleType)) /
        (nD * col("_sx").cast(DoubleType))).as("gini"))
  }

  /** ROC AUC (+ Gini = 2·AUC−1) of a score against a binary label via
    * the rank-sum (Mann–Whitney) identity — the threshold-free quality
    * measure of a ranker, the companion the calibration keys lack
    * (ECE/Brier judge the PROBABILITIES, AUC judges the ORDERING).
    *
    * AUC = (Σ_{positives} rank(score) − n₊(n₊+1)/2) / (n₊·n₋) with
    * average ranks over ties. Everything is exact integer arithmetic:
    * ranks come from the value-grain cumulative window (distinct
    * scores, not rows — the spearmanMatrix contract, so the window
    * frame is bounded by the score grid, not the corpus) and are
    * carried DOUBLED (r2 = 2·below + ties + 1) so tie midpoints never
    * mint a .5; the rank sum accumulates as DECIMAL(38,0); the closing
    * AUC is ONE IEEE division of two exact integers
    * ((Σr2₊ − n₊(n₊+1)) / (2n₊n₋)) and Gini one further fixed op —
    * bit-identical on any partitioning and in the DuckDB oracle.
    * Degenerate single-class inputs yield NULL AUC, not a division
    * error. NULL scores/labels are excluded (listwise).
    *
    * Scale: one value-grain aggregation + one bounded window + one
    * global aggregate — no per-row window, no join back. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    requireNumeric(df, labelCol, "rocAuc")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("_y",
        when(col(labelCol) === 0, lit(0L))
          .when(col(labelCol) === 1, lit(1L))
          .otherwise(raise_error(concat(
            lit("rocAuc: label must be 0/1, got "),
            col(labelCol).cast("string")))))
    val grain = base.groupBy(col(scoreCol).as("_v"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_y")).as("_pos"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grain.withColumn("_below",
      coalesce(sum(col("_cnt")).over(w), lit(0L)))
    val d38 = DecimalType(38, 0)
    val one = ranked.agg(
      sum(col("_cnt")).as("_n"),
      sum(col("_pos")).as("_npos"),
      sum((lit(2L) * col("_below") + col("_cnt") + lit(1L))
        .cast(DecimalType(19, 0)) * col("_pos").cast(DecimalType(19, 0)))
        .cast(d38).as("_r2pos"))
    val npos = col("_npos")
    val nneg = col("_n") - col("_npos")
    // counts×counts products in DECIMAL — a long multiply overflows
    // past n ≈ 3e9 rows (the HASH_NOTES LongType-product sweep class)
    val d19 = DecimalType(19, 0)
    val num = (col("_r2pos") -
      (npos.cast(d19) * (npos + lit(1L)).cast(d19)).cast(d38))
      .cast(DoubleType)
    val den = (lit(2L).cast(d19) * npos.cast(d19) * nneg.cast(d19))
      .cast(d38).cast(DoubleType)
    val auc = when(npos > 0L && nneg > 0L, num / den)
    one.select(col("_n").as("n"), npos.as("n_pos"), nneg.as("n_neg"),
      auc.as("auc"), (lit(2.0) * auc - lit(1.0)).as("gini"))
  }

  /** Kendall τ-b rank correlation between two BOUNDED-GRAIN columns —
    * the concordance companion to spearmanMatrix (τ reads P(agree) −
    * P(disagree) over pairs; ρ reads rank-linear association). τ-b
    * corrects both marginals for ties:
    * τ_b = (C − D) / √((n₀−n₁)(n₀−n₂)), n₀ = n(n−1)/2,
    * n₁/n₂ = Σ t(t−1)/2 over each column's tie groups.
    *
    * The pair counts NEVER touch row pairs: the input collapses to the
    * joint contingency grid (one aggregation; cells bounded by
    * |distinct a| × |distinct b| — the caller's contract, same as the
    * value-grain window ops; continuous columns quantile-bin first),
    * and C/D are one strict-inequality self-join OVER CELLS
    * (grid² pairs, data-size-independent) with products in
    * DECIMAL(38,0). The closing τ is a fixed IEEE chain; the tie
    * products exceed 2⁵³ at bench scale, so the oracle casts them
    * through VARCHAR (the giniByGroup rule). NULLs excluded listwise;
    * n < 2 or an all-tied column yields NULL τ. */
  def kendallTau(df: DataFrame, colA: String, colB: String): DataFrame = {
    require(colA != colB, s"kendallTau: need two distinct columns")
    // cell grid materialized ONCE: four consumers (the C/D self-join's
    // two sides, both marginals, the total) would otherwise re-execute
    // the row-grain aggregation subtree four times
    val grid = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("_a"), col(colB).as("_b"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val g1 = grid.select(col("_a").as("_a1"), col("_b").as("_b1"),
      col("_c").cast(DecimalType(19, 0)).as("_c1"))
    val g2 = grid.select(col("_a").as("_a2"), col("_b").as("_b2"),
      col("_c").cast(DecimalType(19, 0)).as("_c2"))
    val d38 = DecimalType(38, 0)
    // strict a-ordering visits each unordered cell pair once; equal-_a
    // pairs are a-ties and belong to neither C nor D
    val cd = g1.join(g2, col("_a1") < col("_a2"))
      .agg(
        sum(when(col("_b1") < col("_b2"), col("_c1") * col("_c2")))
          .cast(d38).as("_conc"),
        sum(when(col("_b1") > col("_b2"), col("_c1") * col("_c2")))
          .cast(d38).as("_disc"))
    val margTies = (c: String, out: String) => grid
      .groupBy(col(c)).agg(sum(col("_c")).as("_t"))
      .agg((sum(col("_t").cast(DecimalType(19, 0)) *
          (col("_t") - lit(1L)).cast(DecimalType(19, 0))).cast(d38) /
        lit(2)).cast(d38).as(out))
    val tot = grid.agg(sum(col("_c")).as("_n"))
      .select(col("_n"),
        ((col("_n").cast(DecimalType(19, 0)) *
          (col("_n") - lit(1L)).cast(DecimalType(19, 0))).cast(d38) /
          lit(2)).cast(d38).as("_n0"))
    val one = cd.crossJoin(margTies("_a", "_n1"))
      .crossJoin(margTies("_b", "_n2")).crossJoin(tot)
    val c0 = coalesce(col("_conc"), lit(0).cast(d38))
    val d0 = coalesce(col("_disc"), lit(0).cast(d38))
    val va = col("_n0") - col("_n1")
    val vb = col("_n0") - col("_n2")
    // ONE sqrt over the EXACT integer product (not √va·√vb, whose two
    // roundings push a tie-free perfect concordance to 1+1ulp): the
    // product stays exact in DECIMAL(38,0) and perfect squares take
    // exact roots
    one.select(col("_n").as("n"),
      c0.cast(LongType).as("concordant"), d0.cast(LongType).as("discordant"),
      when(col("_n") > 1L && va > lit(0) && vb > lit(0),
        (c0 - d0).cast(DoubleType) / sqrt((va * vb).cast(d38).cast(DoubleType)))
        .as("tau_b"))
  }

  /** Benjamini–Hochberg FDR step-up over per-group one-sample
    * proportion z-tests — the multiple-testing gate the χ²/t keys
    * lack: screening G groups for anomalous rates at raw α floods the
    * pager with ~α·G false alarms; BH controls the EXPECTED FALSE
    * DISCOVERY share at q instead.
    *
    * Input: per-group (k, n) successes/trials plus the pooled rate p₀
    * (computed here from the same frame). z_g = (k/n − p₀) /
    * √(p₀(1−p₀)/n) — a fixed IEEE chain over exact longs. The step-up
    * itself never computes a p-value: p_(i) ≤ i·q/m ⇔ |z|_(i) ≥
    * Φ⁻¹(1 − i·q/(2m)), and the m per-rank thresholds are evaluated
    * ONCE driver-side ([[invNormalCdf]], Acklam's rational
    * approximation — both engines then compare against the SAME DOUBLE
    * LITERALS, so no transcendental ever runs in-plan; a last-ulp libm
    * divergence is structurally impossible). `m` is the caller's
    * declared group count, enforced in-plan by raise_error — thresholds
    * for the wrong m would silently misrank.
    *
    * Output per group: rank (by |z| desc, group asc), z, the rank's
    * threshold, pass_raw (this rank clears its own threshold) and
    * significant (BH step-up: ANY rank at-or-below clears its
    * threshold — a suffix-max window over m rows).
    *
    * Scale: one group aggregation + one m-row broadcast threshold join
    * + one m-row window — the test grain is groups, never rows. */
  def bhFdr(df: DataFrame, groupCol: String, successCol: String,
      m: Int, q: Double = 0.05): DataFrame = {
    require(m > 0, s"bhFdr: m must be > 0, got $m")
    require(q > 0 && q < 1, s"bhFdr: q must be in (0,1), got $q")
    requireNumeric(df, successCol, "bhFdr")
    val spark = df.sparkSession
    val perG = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(
        when(col(successCol) === 0, lit(0L))
          .when(col(successCol) === 1, lit(1L))
          .otherwise(raise_error(concat(
            lit("bhFdr: success must be 0/1, got "),
            col(successCol).cast("string"))))).as("k"))
      .localCheckpoint() // group grain; feeds the pooled rate AND the z rows
    val pooled = perG.agg(sum(col("k")).as("_kk"), sum(col("n")).as("_nn"))
    val z = perG.crossJoin(broadcast(pooled))
      .withColumn("_p0", col("_kk").cast(DoubleType) / col("_nn").cast(DoubleType))
      .withColumn("z",
        (col("k").cast(DoubleType) / col("n").cast(DoubleType) - col("_p0")) /
          sqrt(col("_p0") * (lit(1.0) - col("_p0")) / col("n").cast(DoubleType)))
    import spark.implicits._
    val thresholds = (1 to m).map { i =>
      (i, invNormalCdf(1.0 - i * q / (2.0 * m)))
    }.toDF("rank", "z_threshold")
    val wr = Window.orderBy(abs(col("z")).desc, col(groupCol))
    val ranked = z
      .withColumn("rank", row_number().over(wr))
      .withColumn("_mchk",
        when(count(lit(1)).over(Window.partitionBy()) =!= m,
          raise_error(concat(lit(s"bhFdr: declared m=$m but found "),
            count(lit(1)).over(Window.partitionBy()).cast("string"),
            lit(" groups")))).otherwise(lit(0)))
      .join(broadcast(thresholds), Seq("rank"))
    val ws = Window.orderBy(col("rank"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ranked
      .withColumn("pass_raw",
        (abs(col("z")) >= col("z_threshold")).cast(IntegerType) + col("_mchk"))
      .withColumn("significant", max(col("pass_raw")).over(ws))
      .select(col(groupCol), col("rank"), col("k"), col("n"), col("z"),
        col("z_threshold"), col("pass_raw"), col("significant"))
  }

  /** Decile lift / cumulative-gains table of a scored binary outcome —
    * the campaign-targeting readout beside [[rocAuc]]'s scalar: rank by
    * score descending, cut into `nBuckets` EQUAL-POPULATION buckets,
    * and report each bucket's response rate, lift over the base rate,
    * and the cumulative share of all positives captured ("mail the top
    * 2 deciles, reach 55% of responders").
    *
    * Buckets are rank·k div N over a deterministic TOTAL order (score
    * DESC, id ASC) — the curriculumSample contract: exact integer
    * edges, never value quantiles (whose membership hangs on a
    * cross-engine ulp). The global rank is a range-sort +
    * zipWithIndex, not a partition-less window. Ties broken by id can
    * straddle a bucket edge — deterministically, identically in the
    * oracle's row_number restatement. Every output ratio is ONE IEEE
    * division of exact longs (lift's cross products in DECIMAL per
    * the overflow sweep); cum sums run over the ≤nBuckets-row frame.
    */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"liftTable: nBuckets must be >= 2, got $nBuckets")
    requireNumeric(df, labelCol, "liftTable")
    // Materialize once: the projected base feeds BOTH the global sort
    // (zipPositions) and the count/positives aggregate — without the
    // checkpoint an expensive upstream scoring subtree would execute
    // twice (the ccnetSplit double-scan discipline).
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).as("_s"), col(idCol).as("_id"),
        when(col(labelCol) === 0, lit(0L))
          .when(col(labelCol) === 1, lit(1L))
          .otherwise(raise_error(concat(
            lit("liftTable: label must be 0/1, got "),
            col(labelCol).cast("string")))).as("_y"))
      .localCheckpoint()
    val ranked = SampleOps.zipPositions(
      base.orderBy(col("_s").desc, col("_id")), "_rank")
    val buckets = ranked
      .crossJoin(broadcast(base.agg(count(lit(1)).as("_n"),
        sum(col("_y")).as("_p"))))
      .withColumn("bucket",
        expr(s"(_rank * $nBuckets) div _n").cast(IntegerType))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        max(col("_n")).as("_n"), max(col("_p")).as("_p"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    buckets
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .withColumn("cum_n", sum(col("n")).over(w))
      .select(col("bucket"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
          .as("rate"),
        // lift = (n_pos/n)/(P/N) = n_pos·N / (n·P): exact integer cross
        // products, ONE division
        when(col("_p") > 0L,
          (col("n_pos").cast(d19) * col("_n").cast(d19)).cast(d38)
            .cast(DoubleType) /
          (col("n").cast(d19) * col("_p").cast(d19)).cast(d38)
            .cast(DoubleType)).as("lift"),
        when(col("_p") > 0L,
          col("cum_pos").cast(DoubleType) / col("_p").cast(DoubleType))
          .as("cum_gain"),
        (col("cum_n").cast(DoubleType) / col("_n").cast(DoubleType))
          .as("cum_frac"))
      .orderBy(col("bucket"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample test — the
    * distribution-free "is A stochastically larger than B" companion
    * to profile_ab_ttest's mean comparison and profile_ks_exact's
    * shape test: U/(n₁n₂) IS P(a > b) + ½P(a = b) (the [[rocAuc]]
    * identity with groups as the label).
    *
    * Everything runs on the pooled VALUE GRAIN (distinct values, not
    * rows — the spearmanMatrix/ks_exact contract; continuous values
    * quantize first): doubled midranks from one cumulative window,
    * Σ-rank and tie sums as exact DECIMAL(38,0), and the normal
    * approximation with the standard tie-corrected variance
    * σ² = (n₁n₂/12)·((n+1) − Σ(t³−t)/(n(n−1))) as ONE fixed IEEE
    * chain (no continuity correction — documented). u_a is a dyadic
    * half-integer (exact in double); rank-biserial r = 2U/(n₁n₂) − 1
    * is the effect size. Degenerate inputs (either group empty, all
    * values tied) yield NULL z. */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "mannWhitney: groups must differ")
    requireNumeric(df, valueCol, "mannWhitney")
    val base = df
      .filter(col(valueCol).isNotNull &&
        (col(groupCol) === groupA || col(groupCol) === groupB))
    val grain = base.groupBy(col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_t"),
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("_ta"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grain.withColumn("_below",
      coalesce(sum(col("_t")).over(w), lit(0L)))
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val one = ranked.agg(
      sum(col("_t")).as("_n"), sum(col("_ta")).as("_na"),
      sum((lit(2L) * col("_below") + col("_t") + lit(1L)).cast(d19) *
        col("_ta").cast(d19)).cast(d38).as("_r2a"),
      sum((col("_t").cast(d19) * col("_t").cast(d19) * col("_t").cast(d19) -
        col("_t").cast(d19)).cast(d38)).cast(d38).as("_ties"))
    val na = col("_na"); val nb = col("_n") - col("_na")
    val naD = na.cast(DoubleType); val nbD = nb.cast(DoubleType)
    val nD = col("_n").cast(DoubleType)
    // U₁·2 = Σr2(A) − n₁(n₁+1): exact integers; u_a = the dyadic half
    val u2 = (col("_r2a") - (na.cast(d19) * (na + lit(1L)).cast(d19)).cast(d38))
      .cast(DoubleType)
    val ua = u2 / lit(2.0)
    val mu = naD * nbD / lit(2.0)
    val sig2 = (naD * nbD / lit(12.0)) *
      ((nD + lit(1.0)) - col("_ties").cast(DoubleType) / (nD * (nD - lit(1.0))))
    val z = when(na > 0L && nb > 0L && sig2 > 0.0, (ua - mu) / sqrt(sig2))
    one.select(na.as("n_a"), nb.as("n_b"), ua.as("u_a"), z.as("z"),
      when(na > 0L && nb > 0L,
        lit(2.0) * ua / (naD * nbD) - lit(1.0)).as("rank_biserial"))
  }

  /** Cohen's d (+ Hedges' g small-sample correction) — the
    * STANDARDIZED effect size welchTTest's t statistic lacks: t grows
    * with √n, so at corpus scale everything is "significant"; d
    * answers the question that matters, HOW BIG the difference is in
    * pooled-SD units (0.2 small / 0.5 medium / 0.8 large).
    *
    * One conditional-sum aggregation to exact (n, Σx, Σx²) per group
    * (the welchTTest shape; Σx² in DECIMAL(38,0)); variances from the
    * closed form (never stddev_samp's order-dependent streaming), the
    * pooled SD and both ratios ONE fixed IEEE chain. Degenerate inputs
    * (either group < 2 rows, zero pooled variance) yield NULL d/g. */
  def cohensD(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "cohensD: groups must differ")
    requireNumeric(df, valueCol, "cohensD")
    val d38 = DecimalType(38, 0)
    def side(g: String, tag: String) = Seq(
      sum(when(col(groupCol) === g, 1L).otherwise(0L)).as(s"_n$tag"),
      sum(when(col(groupCol) === g, col(valueCol)).otherwise(0L)
        .cast(DecimalType(28, 0))).cast(d38).as(s"_sx$tag"),
      sum(when(col(groupCol) === g,
          col(valueCol).cast(d38) * col(valueCol)).otherwise(lit(0).cast(d38)))
        .cast(d38).as(s"_sxx$tag"))
    val m = df.filter(col(valueCol).isNotNull)
      .agg(side(groupA, "1").head,
        (side(groupA, "1").tail ++ side(groupB, "2")): _*)
    def nD(t: String) = col(s"_n$t").cast(DoubleType)
    def mean(t: String) =
      col(s"_sx$t").cast(DoubleType) / nD(t)
    def variance(t: String) =
      (col(s"_sxx$t").cast(DoubleType) -
        col(s"_sx$t").cast(DoubleType) * col(s"_sx$t").cast(DoubleType) /
          nD(t)) / (nD(t) - lit(1.0))
    val pooled = ((nD("1") - lit(1.0)) * variance("1") +
      (nD("2") - lit(1.0)) * variance("2")) / (nD("1") + nD("2") - lit(2.0))
    val dEff = (mean("1") - mean("2")) / sqrt(pooled)
    val ok = col("_n1") > 1L && col("_n2") > 1L && pooled > 0.0
    m.select(col("_n1").as("n_a"), col("_n2").as("n_b"),
      mean("1").as("mean_a"), mean("2").as("mean_b"),
      when(ok, dEff).as("cohens_d"),
      when(ok, dEff * (lit(1.0) -
        lit(3.0) / (lit(4.0) * (nD("1") + nD("2")) - lit(9.0))))
        .as("hedges_g"))
  }

  /** A/B sample-size planner (two-proportion power analysis, the
    * standard normal-approximation formula): per group, the n PER ARM
    * required to detect an absolute rate lift `delta` at significance
    * `alpha` (two-sided) and `power` — the "how long must this
    * experiment run" readout beside [[bhFdr]]'s post-hoc gate and
    * profile_rate_ci's uncertainty band.
    *
    * n = (z_{α/2}·√(2·p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))² / δ²,
    * p₂ = p₁+δ, p̄ the midpoint. The two z quantiles are evaluated
    * ONCE driver-side ([[invNormalCdf]]) and inlined as literals —
    * the bhFdr no-transcendental-in-plan contract; everything else is
    * a fixed IEEE chain over the exact (k, n) longs. Groups where
    * p₂ > 1 get NULL (no such lift exists); `feasible` flags groups
    * whose CURRENT n already covers the requirement. */
  def powerTwoProportion(df: DataFrame, groupCol: String,
      successCol: String, delta: Double, alpha: Double = 0.05,
      power: Double = 0.8): DataFrame = {
    require(delta > 0 && delta < 1, s"powerTwoProportion: delta in (0,1), got $delta")
    require(alpha > 0 && alpha < 1, s"powerTwoProportion: alpha in (0,1), got $alpha")
    require(power > 0 && power < 1, s"powerTwoProportion: power in (0,1), got $power")
    requireNumeric(df, successCol, "powerTwoProportion")
    val za = invNormalCdf(1.0 - alpha / 2.0)
    val zb = invNormalCdf(power)
    val perG = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(
        when(col(successCol) === 0, lit(0L))
          .when(col(successCol) === 1, lit(1L))
          .otherwise(raise_error(concat(
            lit("powerTwoProportion: success must be 0/1, got "),
            col(successCol).cast("string"))))).as("k"))
    val p1 = col("k").cast(DoubleType) / col("n").cast(DoubleType)
    val p2 = p1 + lit(delta)
    val pbar = (p1 + p2) / lit(2.0)
    val s = lit(za) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      lit(zb) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    val nReq = when(p2 <= 1.0, (s * s) / lit(delta * delta))
    perG.select(col(groupCol), col("k"), col("n"), p1.as("rate"),
        nReq.as("n_required"),
        when(nReq.isNotNull, (col("n").cast(DoubleType) >= nReq)
          .cast(IntegerType)).as("feasible"))
  }

  /** Inverse standard-normal CDF (quantile function) via Acklam's
    * rational approximation (max abs rel. error ~1.15e-9; the classic
    * public-domain algorithm, also the basis of scipy's fallback) —
    * used DRIVER-SIDE ONLY to pre-evaluate BH thresholds as literals;
    * never runs in a plan. */
  def invNormalCdf(p: Double): Double = {
    require(p > 0 && p < 1, s"invNormalCdf: p must be in (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val qq = math.sqrt(-2 * math.log(p))
      (((((c(0) * qq + c(1)) * qq + c(2)) * qq + c(3)) * qq + c(4)) * qq + c(5)) /
        ((((dd(0) * qq + dd(1)) * qq + dd(2)) * qq + dd(3)) * qq + 1)
    } else if (p <= 1 - pLow) {
      val qq = p - 0.5
      val r = qq * qq
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * qq /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val qq = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * qq + c(1)) * qq + c(2)) * qq + c(3)) * qq + c(4)) * qq + c(5)) /
        ((((dd(0) * qq + dd(1)) * qq + dd(2)) * qq + dd(3)) * qq + 1)
    }
  }

  private def requireNumeric(df: DataFrame, c: String, fn: String): Unit = {
    val dt = df.schema(c).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$fn: column $c must be numeric, got $dt")
  }
}
