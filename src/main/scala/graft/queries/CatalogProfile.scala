package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Profile family of the operator catalog (37 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogProfile {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // Join fan-out profile: the multiplicity histogram of a
    // parent→child join (how many lineitems per order, INCLUDING
    // zero-child parents via the left join) — the data-modeling gate
    // that catches join explosion before a 100 TB query pays for it:
    // a fan histogram with a heavy tail means the join key is not what
    // the modeler thinks it is. Two slim aggregations (child counts,
    // then histogram) + one broadcast-size left join.
    "profile_join_fanout" -> QuerySpec(
      (s, d) => {
        val per = t(s, d, "lineitem")
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("_fan"))
        t(s, d, "orders").select(col("o_orderkey"))
          .join(per, col("o_orderkey") === col("l_orderkey"), "left")
          .select(coalesce(col("_fan"), lit(0L)).as("fan"))
          .groupBy(col("fan")).agg(count(lit(1)).as("n_parents"))
          .orderBy(col("fan"))
      },
      Some("""WITH per AS (
             |  SELECT l_orderkey, count(*) AS fan FROM lineitem GROUP BY 1)
             |SELECT coalesce(per.fan, 0) AS fan, count(*) AS n_parents
             |FROM orders LEFT JOIN per ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),


    // ---------------------------------------------------------- profiling
    // Key-skew diagnostic (the pre-shuffle measurement behind the
    // salting / AQE-skew-join decision). Mean derived as tot/k so the
    // double arithmetic is bit-identical cross-engine.
    "profile_key_skew" -> QuerySpec(
      (s, d) => ProfileOps.keySkew(t(s, d, "events"), "user_id", topK = 10)
        .orderBy(col("n").desc, col("user_id")),
      Some("""WITH counts AS (
             |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
             |stats AS (
             |  SELECT SUM(n) AS tot, COUNT(*) AS k, MAX(n) AS maxn FROM counts)
             |SELECT user_id, n,
             |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
             |  CAST(maxn AS DOUBLE) / (CAST(tot AS DOUBLE) / CAST(k AS DOUBLE))
             |    AS skew_factor
             |FROM counts, stats
             |ORDER BY n DESC, user_id LIMIT 10""".stripMargin),
      allowBnlj = true),


    // One-scan numeric column profiling (nulls / cardinality / range /
    // decimal-stable mean) — the data-quality gate a training corpus
    // passes before anything else runs. Exact distinct counts keep it
    // oracle-comparable.
    "profile_numeric" -> QuerySpec(
      (s, d) => ProfileOps.profileNumeric(
        t(s, d, "lineitem"), Seq("l_discount", "l_quantity", "l_tax")),
      Some("""SELECT * FROM (
             |  SELECT 'l_discount' AS col_name, count(*) AS n_rows,
             |    count(l_discount) AS n_nonnull,
             |    count(DISTINCT l_discount) AS n_distinct,
             |    CAST(MIN(l_discount) AS DOUBLE) AS min_val,
             |    CAST(MAX(l_discount) AS DOUBLE) AS max_val,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)
             |      / count(l_discount) AS mean_val
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_quantity', count(*), count(l_quantity),
             |    count(DISTINCT l_quantity),
             |    CAST(MIN(l_quantity) AS DOUBLE), CAST(MAX(l_quantity) AS DOUBLE),
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             |      / count(l_quantity)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_tax', count(*), count(l_tax), count(DISTINCT l_tax),
             |    CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE),
             |    CAST(SUM(CAST(l_tax AS DECIMAL(38,6))) AS DOUBLE)
             |      / count(l_tax)
             |  FROM lineitem
             |) ORDER BY col_name""".stripMargin)),


    // Pairwise Pearson correlation from decimal-exact co-moments — ONE
    // wide aggregate (single scan, partial agg), pairs exploded from the
    // one counter row. Derived-moment formulation (not corr()) keeps the
    // double chain bit-identical cross-engine, same trick as
    // prep_zscore_group.
    // PRODUCTION SHAPE: scan → one wide partial agg, no Exchange before
    // the aggregate. The fixture sf tables are single-row-group files —
    // one scan task owns every row and the 18 Decimal(38) partial sums
    // serialize on one core (~3.4 s, same artifact as BASELINE §8) — so
    // a pre-spread of the slim projection is gated on a ROW-GROUP COUNT
    // probe (driver-side parquet footer metadata, no data read): only a
    // layout whose row groups can't feed the cores pays the ~15 MB
    // shuffle. A production table has many row groups, the gate stays
    // closed, and the registered plan is exchange-free. Result identical
    // either way — decimal sums are exact, partial-agg order can't move
    // a bit.
    "profile_corr" -> QuerySpec(
      (s, d) => {
        val src = t(s, d, "lineitem")
          .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_orderkey"))
        val rowGroups = parquetRowGroupCount(s, s"$d/lineitem.parquet")
        val staged =
          if (rowGroups * 2 < s.sparkContext.defaultParallelism)
            src.repartition(col("l_orderkey"))
          else src
        ProfileOps.corrMatrix(
          staged, Seq("l_quantity", "l_extendedprice", "l_discount"))
          .orderBy(col("col_a"), col("col_b"))
      },
      Some {
        def pair(a: String, b: String) =
          s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n > 1 AND n*saa - sa*sa > 0 AND n*sbb - sb*sb > 0
             |    THEN (n*sab - sa*sb) / (sqrt(n*saa - sa*sa) * sqrt(n*sbb - sb*sb))
             |  END AS pearson_r
             |FROM (SELECT
             |  CAST(count(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN 1 END) AS DOUBLE) AS n,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $a END AS DECIMAL(38,6))), 0) AS DOUBLE) AS sa,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $b END AS DECIMAL(38,6))), 0) AS DOUBLE) AS sb,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $a * $a END AS DECIMAL(38,6))), 0) AS DOUBLE) AS saa,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $b * $b END AS DECIMAL(38,6))), 0) AS DOUBLE) AS sbb,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $a * $b END AS DECIMAL(38,6))), 0) AS DOUBLE) AS sab
             |  FROM lineitem)""".stripMargin
        Seq(
          pair("l_quantity", "l_extendedprice"),
          pair("l_quantity", "l_discount"),
          pair("l_extendedprice", "l_discount"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_a, col_b")
      }),


    // Pairwise SPEARMAN rank correlation (ProfileOps.spearmanMatrix) —
    // profile_corr's robust companion: Pearson over average tie ranks,
    // reading MONOTONE association where Pearson reads linear. Ranks
    // are exact integers (the average tie rank carried DOUBLED:
    // r2 = 2·below + ties + 1 — Pearson is scaling-invariant, so ρ is
    // unchanged and no .5 is ever minted); moments are DECIMAL(38,0)
    // sums presented as DOUBLE and ρ is the profile_corr fixed IEEE
    // chain ⇒ fully oracled. Over lineitem's three bounded-grain
    // numeric columns (50/11/9 distinct values — the value-grain
    // cumulative window's bounded-frame contract; continuous columns
    // quantile-bin first). Listwise deletion: every pair shares ONE
    // ranked population (documented deviation from profile_corr's
    // pairwise contract).
    "profile_spearman" -> QuerySpec(
      (s, d) => ProfileOps.spearmanMatrix(
          t(s, d, "lineitem"),
          Seq("l_quantity", "l_discount", "l_tax"))
        .orderBy(col("col_a"), col("col_b")),
      Some {
        def rankCte(src: String, name: String) =
          s"""g_$name AS (SELECT $src AS v, count(*) AS c FROM base GROUP BY 1),
             |r_$name AS (
             |  SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + c + 1 AS r2
             |  FROM g_$name)""".stripMargin
        def pair(a: String, b: String, nameA: String, nameB: String) =
          s"""SELECT '$nameA' AS col_a, '$nameB' AS col_b, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n > 1 AND n*ss_$a - s_$a*s_$a > 0
             |            AND n*ss_$b - s_$b*s_$b > 0
             |    THEN (n*sp_${a}_$b - s_$a*s_$b) /
             |      (sqrt(n*ss_$a - s_$a*s_$a) * sqrt(n*ss_$b - s_$b*s_$b))
             |  END AS spearman_rho
             |FROM m""".stripMargin
        s"""WITH base AS (
           |  SELECT l_quantity AS q, l_discount AS d, l_tax AS t
           |  FROM lineitem
           |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
           |    AND l_tax IS NOT NULL),
           |${rankCte("q", "q")},
           |${rankCte("d", "d")},
           |${rankCte("t", "t")},
           |j AS (
           |  SELECT rq.r2 AS r2q, rd.r2 AS r2d, rt.r2 AS r2t
           |  FROM base
           |  JOIN r_q rq ON rq.v = base.q
           |  JOIN r_d rd ON rd.v = base.d
           |  JOIN r_t rt ON rt.v = base.t),
           |m AS (SELECT
           |  CAST(count(*) AS DOUBLE) AS n,
           |  CAST(sum(CAST(r2q AS HUGEINT)) AS DOUBLE) AS s_q,
           |  CAST(sum(CAST(r2d AS HUGEINT)) AS DOUBLE) AS s_d,
           |  CAST(sum(CAST(r2t AS HUGEINT)) AS DOUBLE) AS s_t,
           |  CAST(sum(CAST(r2q AS HUGEINT) * r2q) AS DOUBLE) AS ss_q,
           |  CAST(sum(CAST(r2d AS HUGEINT) * r2d) AS DOUBLE) AS ss_d,
           |  CAST(sum(CAST(r2t AS HUGEINT) * r2t) AS DOUBLE) AS ss_t,
           |  CAST(sum(CAST(r2q AS HUGEINT) * r2d) AS DOUBLE) AS sp_q_d,
           |  CAST(sum(CAST(r2q AS HUGEINT) * r2t) AS DOUBLE) AS sp_q_t,
           |  CAST(sum(CAST(r2d AS HUGEINT) * r2t) AS DOUBLE) AS sp_d_t
           |  FROM j)
           |SELECT * FROM (
           |${pair("q", "d", "l_quantity", "l_discount")}
           |UNION ALL
           |${pair("q", "t", "l_quantity", "l_tax")}
           |UNION ALL
           |${pair("d", "t", "l_discount", "l_tax")}
           |) ORDER BY col_a, col_b""".stripMargin
      }),


    // Kendall τ-b rank correlation (ProfileOps.kendallTau) — the
    // concordance member of the correlation trio (Pearson reads linear,
    // Spearman monotone-via-ranks, τ reads P(concordant)−P(discordant)
    // directly — the most outlier-robust and the one with the clean
    // probabilistic reading). The O(n²) pair space never materializes:
    // the input collapses to the joint contingency grid (50×11 cells
    // for quantity×discount — bounded by the DISTINCT-value product,
    // not rows), C/D come from ONE strict-inequality self-join over
    // cells with DECIMAL(38,0) products, and tie corrections from the
    // marginals. The n₀−n₁ tie products exceed 2⁵³ at bench scale, so
    // the oracle bridges them through VARCHAR (the giniByGroup rule).
    "profile_kendall_tau" -> QuerySpec(
      (s, d) => ProfileOps.kendallTau(
        t(s, d, "lineitem"), "l_quantity", "l_discount"),
      Some("""WITH base AS (
             |  SELECT l_quantity AS a, l_discount AS b FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
             |grid AS MATERIALIZED (
             |  SELECT a, b, CAST(count(*) AS BIGINT) AS c
             |  FROM base GROUP BY 1, 2),
             |cd AS (
             |  SELECT
             |    SUM(CASE WHEN g1.b < g2.b
             |      THEN CAST(g1.c AS HUGEINT) * g2.c END) AS conc,
             |    SUM(CASE WHEN g1.b > g2.b
             |      THEN CAST(g1.c AS HUGEINT) * g2.c END) AS disc
             |  FROM grid g1 JOIN grid g2 ON g1.a < g2.a),
             |ta AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) // 2 AS n1
             |       FROM (SELECT sum(c) AS t FROM grid GROUP BY a)),
             |tb AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) // 2 AS n2
             |       FROM (SELECT sum(c) AS t FROM grid GROUP BY b)),
             |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             |         (CAST(sum(c) AS HUGEINT) * (sum(c) - 1)) // 2 AS n0
             |       FROM grid)
             |SELECT n,
             |  CAST(COALESCE(conc, 0) AS BIGINT) AS concordant,
             |  CAST(COALESCE(disc, 0) AS BIGINT) AS discordant,
             |  CASE WHEN n > 1 AND n0 - n1 > 0 AND n0 - n2 > 0 THEN
             |    CAST(CAST(COALESCE(conc, 0) - COALESCE(disc, 0) AS VARCHAR)
             |      AS DOUBLE) /
             |    sqrt(CAST(CAST((n0 - n1) * (n0 - n2) AS VARCHAR) AS DOUBLE))
             |  END AS tau_b
             |FROM cd CROSS JOIN ta CROSS JOIN tb CROSS JOIN nn""".stripMargin),
      allowBnlj = true),


    // Per-group closed-form OLS (ProfileOps.olsByGroup): slope /
    // intercept / r² of price-in-thousands ~ quantity within each
    // return flag — the per-segment trend fit, ONE map-side-combinable
    // aggregate (6 decimals shuffle per group). Exact DECIMAL(38,6)
    // sums → a fixed IEEE chain, the profile_corr determinism recipe,
    // so the fit is hash-exact against the oracle restating the same
    // chain (NOT regr_slope: both engines stream doubles order-
    // dependently there). y is PRE-SCALED /1000 (one IEEE divide,
    // identical both engines) so Σy²·10⁶ stays under 2⁵³: past that,
    // DuckDB's int128-decimal→double cast double-rounds (int128→double
    // then /1e6) and can sit 1 ulp off Spark's correctly-rounded
    // decimal→double — invisible through profile_corr's sqrt but
    // surfaced raw in r²'s dyy product (measured on this fixture).
    "profile_regression" -> QuerySpec(
      (s, d) => ProfileOps.olsByGroup(
        t(s, d, "lineitem").select(col("l_returnflag"),
          col("l_quantity"), (col("l_extendedprice") / 1000).as("price_k")),
        "l_returnflag", "l_quantity", "price_k")
        .orderBy(col("l_returnflag")),
      Some("""WITH li AS (
             |  SELECT l_returnflag, l_quantity,
             |    l_extendedprice / 1000 AS y FROM lineitem),
             |a AS (
             |  SELECT l_returnflag,
             |    CAST(count(CASE WHEN l_quantity IS NOT NULL
             |      AND y IS NOT NULL THEN 1 END) AS DOUBLE) AS n,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN l_quantity END AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN y END AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN l_quantity * l_quantity END AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN y * y END AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN l_quantity * y END AS DECIMAL(38,6))) AS DOUBLE) AS sxy
             |  FROM li GROUP BY 1)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n > 1 AND n*sxx - sx*sx > 0
             |    THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END AS slope,
             |  CASE WHEN n > 1 AND n*sxx - sx*sx > 0
             |    THEN (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n
             |  END AS intercept,
             |  CASE WHEN n > 1 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
             |    THEN ((n*sxy - sx*sy) * (n*sxy - sx*sy))
             |       / ((n*sxx - sx*sx) * (n*syy - sy*sy)) END AS r2
             |FROM a ORDER BY l_returnflag""".stripMargin)),


    // Robust per-group outliers via median absolute deviation
    // (ProfileOps.madOutliers): event values quantized to integer
    // cents (exact at 0.5 resolution through median, |x−med| and
    // 3·MAD, so every comparison is bit-determined), grouped into 7
    // user cohorts. The heavy-tail-safe anomaly gate a metrics
    // pipeline runs per segment — a corrupt sentinel moves a
    // mean/stddev gate, not a median/MAD one. Exact `percentile` ≡
    // `quantile_cont` (the fn_percentile-pinned identity); the
    // approxMedian flag is the bounded-memory 100 TB mode
    // (unit-compared in ProfileOpsSpec), the oracled key runs exact.
    "profile_mad_outliers" -> QuerySpec(
      (s, d) => ProfileOps.madOutliers(
        t(s, d, "events").select(
          (col("user_id") % 7).as("grp"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "grp", "cents", k = 3.0, broadcastGroupStats = true)
        .orderBy(col("grp")),
      Some("""WITH e AS (
             |  SELECT user_id % 7 AS grp,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |m AS (SELECT grp, quantile_cont(cents, 0.5) AS med,
             |        count(cents) AS n FROM e GROUP BY 1),
             |d AS (SELECT e.grp, abs(e.cents - m.med) AS dev, m.med, m.n
             |      FROM e JOIN m USING (grp)),
             |md AS (SELECT grp, quantile_cont(dev, 0.5) AS mad
             |       FROM d GROUP BY 1)
             |SELECT d.grp, CAST(max(d.n) AS BIGINT) AS n, max(d.med) AS med,
             |  max(md.mad) AS mad,
             |  CAST(SUM(CASE WHEN d.dev > 3.0 * md.mad THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM d JOIN md USING (grp) GROUP BY 1 ORDER BY 1""".stripMargin)),


    // Welch two-sample t statistic + Welch–Satterthwaite df
    // (ProfileOps.welchTTest): mean 'click' vs 'view' event value — the
    // continuous-metric experiment test beside profile_rate_ci's
    // binomial band. ONE conditional-sum aggregation (no join/pivot);
    // q = n·Σx² − (Σx)² exact DECIMAL(38,0) bridged to double through
    // a VARCHAR cast on the DuckDB side (direct wide-decimal→double
    // double-rounds past 2⁵³); t and df are fixed IEEE chains both
    // engines restate ⇒ fully oracled.
    // Cohen's d + Hedges' g (ProfileOps.cohensD) — the STANDARDIZED
    // effect size the t statistic lacks (t grows with √n; at corpus
    // scale everything is "significant" — d says how big in pooled-SD
    // units), completing the testing battery's effect-size tier beside
    // profile_cramers_v (categorical) and mannwhitney's rank-biserial.
    // Same exact-sum machinery as profile_ab_ttest; the oracle bridges
    // the DECIMAL(38,0) Σx² through VARCHAR.
    "profile_cohens_d" -> QuerySpec(
      (s, d) => ProfileOps.cohensD(
        t(s, d, "events").select(col("event_type").as("g"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "g", "cents", groupA = "click", groupB = "view"),
      Some("""WITH e AS (
             |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL),
             |m AS (SELECT
             |  CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n1,
             |  CAST(SUM(CASE WHEN g = 'click' THEN x ELSE 0 END)
             |    AS DECIMAL(38,0)) AS sx1,
             |  CAST(SUM(CASE WHEN g = 'click' THEN CAST(x AS DECIMAL(38,0)) * x
             |    ELSE 0 END) AS DECIMAL(38,0)) AS sxx1,
             |  CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n2,
             |  CAST(SUM(CASE WHEN g = 'view' THEN x ELSE 0 END)
             |    AS DECIMAL(38,0)) AS sx2,
             |  CAST(SUM(CASE WHEN g = 'view' THEN CAST(x AS DECIMAL(38,0)) * x
             |    ELSE 0 END) AS DECIMAL(38,0)) AS sxx2
             |  FROM e),
             |c AS (SELECT
             |  n1, n2,
             |  CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
             |  CAST(CAST(sx1 AS VARCHAR) AS DOUBLE) AS sx1d,
             |  CAST(CAST(sx2 AS VARCHAR) AS DOUBLE) AS sx2d,
             |  CAST(CAST(sxx1 AS VARCHAR) AS DOUBLE) AS sxx1d,
             |  CAST(CAST(sxx2 AS VARCHAR) AS DOUBLE) AS sxx2d
             |  FROM m),
             |f AS (SELECT n1, n2,
             |  sx1d / n1d AS m1, sx2d / n2d AS m2,
             |  (sxx1d - sx1d * sx1d / n1d) / (n1d - 1.0) AS v1,
             |  (sxx2d - sx2d * sx2d / n2d) / (n2d - 1.0) AS v2,
             |  n1d, n2d
             |  FROM c),
             |g2 AS (SELECT n1, n2, m1, m2, n1d, n2d,
             |  ((n1d - 1.0) * v1 + (n2d - 1.0) * v2) / (n1d + n2d - 2.0)
             |    AS pooled
             |  FROM f)
             |SELECT n1 AS n_a, n2 AS n_b, m1 AS mean_a, m2 AS mean_b,
             |  CASE WHEN n1 > 1 AND n2 > 1 AND pooled > 0.0
             |    THEN (m1 - m2) / sqrt(pooled) END AS cohens_d,
             |  CASE WHEN n1 > 1 AND n2 > 1 AND pooled > 0.0
             |    THEN ((m1 - m2) / sqrt(pooled)) *
             |      (1.0 - 3.0 / (4.0 * (n1d + n2d) - 9.0)) END AS hedges_g
             |FROM g2""".stripMargin)),


    "profile_ab_ttest" -> QuerySpec(
      (s, d) => ProfileOps.welchTTest(
        t(s, d, "events").select(col("event_type").as("g"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "g", "cents", groupA = "click", groupB = "view"),
      Some("""WITH e AS (
             |  SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events),
             |m AS (SELECT
             |  CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |  CAST(SUM(CASE WHEN g = 'click' THEN x ELSE 0 END) AS BIGINT) AS sx1,
             |  CAST(SUM(CASE WHEN g = 'click' THEN CAST(x AS DECIMAL(38,0)) * x
             |    ELSE 0 END) AS DECIMAL(38,0)) AS sxx1,
             |  CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |  CAST(SUM(CASE WHEN g = 'view' THEN x ELSE 0 END) AS BIGINT) AS sx2,
             |  CAST(SUM(CASE WHEN g = 'view' THEN CAST(x AS DECIMAL(38,0)) * x
             |    ELSE 0 END) AS DECIMAL(38,0)) AS sxx2
             |  FROM e),
             |v AS (SELECT n1, n2,
             |  CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
             |  CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean2,
             |  CAST(CAST(CAST(n1 AS DECIMAL(38,0)) * sxx1
             |      - CAST(sx1 AS DECIMAL(19,0)) * CAST(sx1 AS DECIMAL(19,0))
             |      AS VARCHAR) AS DOUBLE)
             |    / CAST(n1 * n1 * (n1 - 1) AS DOUBLE) AS v1,
             |  CAST(CAST(CAST(n2 AS DECIMAL(38,0)) * sxx2
             |      - CAST(sx2 AS DECIMAL(19,0)) * CAST(sx2 AS DECIMAL(19,0))
             |      AS VARCHAR) AS DOUBLE)
             |    / CAST(n2 * n2 * (n2 - 1) AS DOUBLE) AS v2
             |  FROM m)
             |SELECT n1, n2, mean1, mean2, v1, v2,
             |  (mean1 - mean2) / sqrt(v1 + v2) AS t,
             |  ((v1 + v2) * (v1 + v2))
             |    / (v1 * v1 / CAST(n1 - 1 AS DOUBLE)
             |       + v2 * v2 / CAST(n2 - 1 AS DOUBLE)) AS df
             |FROM v""".stripMargin)),


    // Robust per-group scaling (ProfileOps.robustScale): (x − median)
    // / IQR — prep_zscore_group's heavy-tail-safe sibling. Dyadic
    // quantile ranks keep median/IQR of integer cents exactly
    // representable; ONE division per row; IQR = 0 → NULL. Fully
    // oracled at row grain.
    "prep_robust_scale" -> QuerySpec(
      (s, d) => ProfileOps.robustScale(
        t(s, d, "events").select(
          (col("user_id") % 7).as("grp"),
          col("event_id"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "grp", "cents", broadcastGroupStats = true)
        .orderBy(col("grp"), col("event_id")),
      Some("""WITH e AS (
             |  SELECT user_id % 7 AS grp, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |st AS (SELECT grp,
             |         quantile_cont(cents, 0.5) AS med,
             |         quantile_cont(cents, 0.75) - quantile_cont(cents, 0.25)
             |           AS iqr
             |       FROM e GROUP BY 1)
             |SELECT e.grp, e.event_id, e.cents,
             |  CASE WHEN st.iqr <> 0.0
             |    THEN (e.cents - st.med) / st.iqr END AS scaled
             |FROM e JOIN st USING (grp)
             |ORDER BY grp, event_id""".stripMargin)),


    // Tukey-fence (IQR) outliers per group (ProfileOps.iqrOutliers):
    // the box-plot gate, profile_mad_outliers' quartile sibling. Same
    // integer-cents quantization; p ∈ {0.25, 0.75} interpolation
    // fractions are exact binary rationals, so quartiles, 1.5·IQR and
    // both fences are exactly representable and every comparison is
    // bit-determined (percentile ≡ quantile_cont pinned by
    // fn_percentile) ⇒ fully oracled.
    "profile_iqr_outliers" -> QuerySpec(
      (s, d) => ProfileOps.iqrOutliers(
        t(s, d, "events").select(
          (col("user_id") % 7).as("grp"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "grp", "cents", k = 1.5, broadcastGroupStats = true)
        .orderBy(col("grp")),
      Some("""WITH e AS (
             |  SELECT user_id % 7 AS grp,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |st AS (SELECT grp, quantile_cont(cents, 0.25) AS q1,
             |         quantile_cont(cents, 0.75) AS q3,
             |         count(cents) AS n
             |       FROM e GROUP BY 1)
             |SELECT e.grp, CAST(max(st.n) AS BIGINT) AS n,
             |  max(st.q1) AS q1, max(st.q3) AS q3,
             |  max(st.q3 - st.q1) AS iqr,
             |  CAST(SUM(CASE WHEN e.cents < st.q1 - 1.5 * (st.q3 - st.q1)
             |    OR e.cents > st.q3 + 1.5 * (st.q3 - st.q1)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM e JOIN st USING (grp) GROUP BY 1 ORDER BY 1""".stripMargin)),


    // Per-group binomial rate + Wilson score interval
    // (ProfileOps.rateWilsonCi): "is this slice's failure rate really
    // elevated or is the group just small" — the quality-dashboard
    // uncertainty band. ONE map-side-combinable aggregate to exact
    // (n, k) longs, then a fixed per-group IEEE sequence (sqrt is
    // correctly rounded) ⇒ fully oracled bit-for-bit.
    // CALIBRATION of the NB quality classifier (round 13, the verdict's
    // headline ask): does nbScore's probability MEAN anything, or is
    // the distillation tier just a ranker? Reliability diagram over the
    // planted rule labels (the text_nb_quality_distill fixture: C4
    // heuristic flags as ground truth, NB distilled from them) plus
    // Brier score and ECE. P(keep) = sigmoid of the LENGTH-NORMALIZED
    // score margin (sigmoid(8·delta/n_tokens) — raw NB margins over
    // hundreds of tokens saturate every p to 0/1, while the bare
    // per-token margin compresses everything into one bin; the fixed
    // temperature 8 is the single platt-style scale the curve is read
    // at, and the diagram shows whether even the best constant
    // temperature calibrates). Exactness discipline:
    // delta is an EXACT decimal (difference of exact score sums), the
    // sigmoid is the only transcendental and its output is quantized
    // ONCE to DECIMAL(12,6) (the ClassifyOps boundary-flake argument:
    // a ≤2-ulp libm exp() disagreement flips a 1e-6 quantization
    // boundary with probability ~1e-10/doc); bins are floor(10·p) on
    // the quantized decimal — exact-decimal bin edges — and every
    // bin/global statistic is exact-decimal algebra with ONE IEEE
    // division at presentation (wide sums bridge DuckDB→double through
    // VARCHAR). Scale shape: fit + score are the distill key's plan;
    // the 10-row bin frame takes a localCheckpoint seam before the
    // global-stats crossJoin (consume-once — else the corpus-scale
    // score subtree re-executes per branch).
    "profile_calibration" -> QuerySpec(
      (s, d) => {
        val toksB = split(col("text"), " ")
        val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toksB, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        val labeled = TextOps.c4QualityFlags(built, "text")
          .select(col("doc_id"),
            when(col("keep") === 1, lit("keep")).otherwise(lit("drop"))
              .as("rule_label"))
        val model = nbCalibModel(s, d, ClassifyOps.nbFit(
          labeled.join(built, Seq("doc_id")), "text", "rule_label"))
        val piv = ClassifyOps.nbScoreWith(built, "doc_id", "text", model)
          .groupBy(col("doc_id"))
          .agg(max(when(col("_label") === "keep", col("score"))).as("s_keep"),
            max(when(col("_label") === "drop", col("score"))).as("s_drop"),
            max(col("n_tokens")).as("n_tok"))
        val pd = piv.join(labeled, Seq("doc_id"))
          .select(
            (lit(1.0) / (lit(1.0) + exp(-(lit(8.0) *
              (col("s_keep") - col("s_drop")).cast(DoubleType) /
                col("n_tok").cast(DoubleType)))))
              .cast(DecimalType(12, 6)).as("p"),
            when(col("rule_label") === "keep", 1).otherwise(0).as("y"))
        val dcol = col("p") - col("y").cast(DecimalType(7, 6))
        val bins = pd
          .withColumn("bin", least(floor(col("p") * 10).cast(IntegerType), lit(9)))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            sum(col("p")).as("sum_p"),
            sum(col("y").cast(LongType)).as("sum_y"),
            sum((dcol * dcol).cast(DecimalType(27, 12))).as("sum_sq"))
          .localCheckpoint() // ≤10 rows; consumed twice below
        val g = bins.agg(sum(col("n")).as("nn"),
          sum(col("sum_sq")).as("tot_sq"),
          sum(abs(col("sum_y").cast(DecimalType(20, 6)) - col("sum_p")))
            .as("tot_gap"))
        bins.crossJoin(broadcast(g))
          .select(col("bin"), col("n"),
            (col("sum_p").cast(DoubleType) / col("n").cast(DoubleType))
              .as("mean_pred"),
            (col("sum_y").cast(DoubleType) / col("n").cast(DoubleType))
              .as("frac_pos"),
            (abs(col("sum_y").cast(DecimalType(20, 6)) - col("sum_p"))
              .cast(DoubleType) / col("n").cast(DoubleType)).as("abs_gap"),
            (col("tot_sq").cast(DoubleType) / col("nn").cast(DoubleType))
              .as("brier"),
            (col("tot_gap").cast(DoubleType) / col("nn").cast(DoubleType))
              .as("ece"))
          .orderBy(col("bin"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |lab AS MATERIALIZED (
             |  SELECT doc_id, text,
             |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
             |              AND NOT contains(text, '{')
             |              AND len(list_filter(string_split(text, chr(10)),
             |                l -> regexp_matches(trim(l), '[.!?"]$')
             |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
             |                  >= 3
             |         THEN 'keep' ELSE 'drop' END AS label
             |  FROM built),
             |toks0 AS (
             |  SELECT doc_id, label,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM lab),
             |t AS MATERIALIZED (SELECT * FROM toks0 WHERE length(tok) > 0),
             |ct AS (SELECT label, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |tot AS MATERIALIZED (
             |  SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM t),
             |lp AS (
             |  SELECT label, tok,
             |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
             |  FROM ct JOIN tot USING (label) CROSS JOIN v),
             |dflt AS (
             |  SELECT label,
             |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
             |  FROM tot CROSS JOIN v),
             |prior AS (
             |  SELECT label,
             |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lab))
             |      AS DECIMAL(20,6)) AS prior
             |  FROM lab GROUP BY 1),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, c.label, p.prior,
             |    sum(dt.cnt) AS n_tok,
             |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
             |  FROM dt
             |  CROSS JOIN (SELECT label FROM tot) c
             |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
             |  JOIN dflt f ON f.label = c.label
             |  JOIN prior p ON p.label = c.label
             |  GROUP BY dt.doc_id, c.label, p.prior),
             |piv AS (
             |  SELECT doc_id,
             |    max(CASE WHEN label = 'keep' THEN prior + ll END) AS s_keep,
             |    max(CASE WHEN label = 'drop' THEN prior + ll END) AS s_drop,
             |    max(n_tok) AS n_tok
             |  FROM scored GROUP BY doc_id),
             |pd AS (
             |  SELECT CAST(1.0 / (1.0 + exp(-(8.0 *
             |      CAST(CAST(pv.s_keep - pv.s_drop AS VARCHAR) AS DOUBLE)
             |        / CAST(pv.n_tok AS DOUBLE)))) AS DECIMAL(12,6)) AS p,
             |    CASE WHEN l.label = 'keep' THEN 1 ELSE 0 END AS y
             |  FROM piv pv JOIN lab l USING (doc_id)),
             |b AS MATERIALIZED (
             |  SELECT CAST(LEAST(CAST(floor(p * 10) AS INTEGER), 9) AS INTEGER) AS bin,
             |    CAST(count(*) AS BIGINT) AS n,
             |    SUM(p) AS sum_p,
             |    CAST(SUM(y) AS BIGINT) AS sum_y,
             |    SUM(CAST((CAST(p AS DECIMAL(13,6)) - CAST(y AS DECIMAL(7,6)))
             |      * (CAST(p AS DECIMAL(13,6)) - CAST(y AS DECIMAL(7,6)))
             |      AS DECIMAL(27,12))) AS sum_sq
             |  FROM pd GROUP BY 1),
             |g AS (
             |  SELECT CAST(SUM(n) AS BIGINT) AS nn, SUM(sum_sq) AS tot_sq,
             |    SUM(abs(CAST(sum_y AS DECIMAL(20,6)) - sum_p)) AS tot_gap
             |  FROM b)
             |SELECT bin, n,
             |  CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
             |    AS mean_pred,
             |  CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
             |  CAST(CAST(abs(CAST(sum_y AS DECIMAL(20,6)) - sum_p) AS VARCHAR)
             |    AS DOUBLE) / CAST(n AS DOUBLE) AS abs_gap,
             |  CAST(CAST(tot_sq AS VARCHAR) AS DOUBLE) / CAST(nn AS DOUBLE)
             |    AS brier,
             |  CAST(CAST(tot_gap AS VARCHAR) AS DOUBLE) / CAST(nn AS DOUBLE)
             |    AS ece
             |FROM b CROSS JOIN g ORDER BY bin""".stripMargin),
      allowBnlj = true),


    // RECALIBRATION of the NB tier by isotonic regression (round 14,
    // CalibrateOps — the verdict's ask: profile_calibration MEASURED
    // Brier 0.194 / ECE 0.184, this key ACTS on it). Fit on the even
    // doc_id split, evaluate on the odd: the same sigmoid(8·margin/
    // n_tok) p as the calibration key quantizes onto a hard-bounded
    // 10⁴-cell grid (ONE map-side-combinable aggregation, ≤10001 rows
    // at ANY corpus size — never a global sort), exact BigInt PAV on
    // the driver (the bpeFit model-fit contract), and the DENSE step
    // function stages as the frozen parquet artifact (the
    // prep_target_encode fit-table contract) that serve-time reloads
    // and broadcast-EQUI-joins — no as-of machinery on the hot path.
    // The fit is REFUTED, not trusted, by two independent mechanisms
    // (CalibrateOps scaladoc, conditions 1-6): Spark re-checks in-plan
    // with window functions over the same localCheckpoint'd fit grid
    // the driver collected (no second corpus pass), and DuckDB
    // re-derives ALL six conditions in SQL — including the
    // prefix-mean/complementary-slackness condition that separates
    // "a monotone step function" from THE unique L2 isotonic fit.
    // Metrics: held-out pre/post ECE (each binned on its OWN
    // probability — the (pre-bin × post-bin) composite cube is
    // aggregated in ONE eval pass, ≤100 rows, localCheckpoint'd, and
    // both marginal binnings derive from it) and pre/post Brier;
    // ok_improved compares the two ECE numerators EXACTLY (integer
    // micro-gaps vs decimal gaps ×10⁶) before any division.
    "profile_recalibrate" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val pdDir = recalScoresDir(s, d)
        def pdOf(parity: Int) = s.read.parquet(pdDir)
          .filter(pmod(col("doc_id"), lit(2)) === parity)
        def cellOf(p: Column): Column =
          floor(p * lit(10000)).cast(IntegerType)
        // --- FIT: grid → driver PAV → frozen dense artifact ---
        val fitGrid = pdOf(0)
          .groupBy(cellOf(col("p")).as("cell"))
          .agg(count(lit(1)).as("n"), sum(col("y").cast(LongType)).as("sy"))
          .localCheckpoint() // ≤10001 rows; feeds the collect AND the check
        val cal = CalibrateOps.isotonicFitDense(fitGrid)
        val calDir = staged(d, "isotonic_cal") { dir =>
          cal.toDF().coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val calDf = s.read.parquet(calDir) // frozen-artifact serve path
        val chkPav = CalibrateOps.isotonicCheck(calDf, fitGrid)
        // --- EVAL on the held-out split ---
        val ej = pdOf(1)
          .withColumn("cell", cellOf(col("p")))
          .join(broadcast(calDf.select(col("cell"), col("calMicro"))),
            Seq("cell"))
        val dpre = col("p") - col("y").cast(DecimalType(7, 6))
        val dpost = col("calMicro") - col("y").cast(LongType) * lit(1000000L)
        val cube = ej
          .withColumn("bin", least(floor(col("p") * 10).cast(IntegerType),
            lit(9)))
          .withColumn("binq", least(floor(col("calMicro") / 100000)
            .cast(IntegerType), lit(9)))
          .groupBy(col("bin"), col("binq"))
          .agg(count(lit(1)).as("n"),
            sum(col("p")).as("sum_p"),
            sum(col("y").cast(LongType)).as("sum_y"),
            sum((dpre * dpre).cast(DecimalType(27, 12))).as("sum_sq"),
            sum(col("calMicro")).as("sum_pm"),
            sum((dpost * dpost).cast(DecimalType(38, 0))).as("sum_sqq"))
          .localCheckpoint() // ≤100 rows; both marginals + globals below
        val bp = cube.groupBy(col("bin"))
          .agg(sum(col("n")).as("n"), sum(col("sum_p")).as("sum_p"),
            sum(col("sum_y")).as("sum_y"), sum(col("sum_pm")).as("sum_pm"))
        val gapPre = abs(col("sum_y").cast(DecimalType(20, 6)) - col("sum_p"))
        val gPre = bp.agg(sum(col("n")).as("nn"),
          sum(gapPre).as("tot_gap"))
        val gPost = cube.groupBy(col("binq"))
          .agg(sum(col("sum_y")).as("_sy"), sum(col("sum_pm")).as("_spm"))
          .agg(sum(abs(col("_sy").cast(DecimalType(20, 0)) * lit(1000000L) -
            col("_spm").cast(DecimalType(27, 0)))).as("tot_gapq"))
        val gSq = cube.agg(sum(col("sum_sq")).as("tot_sq"),
          sum(col("sum_sqq")).as("tot_sqq"))
        bp.crossJoin(broadcast(gPre))
          .crossJoin(broadcast(gPost))
          .crossJoin(broadcast(gSq))
          .crossJoin(broadcast(chkPav))
          .select(col("bin"), col("n"),
            (col("sum_p").cast(DoubleType) / col("n").cast(DoubleType))
              .as("mean_pred"),
            (col("sum_pm").cast(DoubleType) /
              (col("n").cast(DoubleType) * lit(1.0e6))).as("mean_post"),
            (col("sum_y").cast(DoubleType) / col("n").cast(DoubleType))
              .as("frac_pos"),
            (col("tot_sq").cast(DoubleType) / col("nn").cast(DoubleType))
              .as("brier_pre"),
            (col("tot_sqq").cast(DoubleType) /
              (col("nn").cast(DoubleType) * lit(1.0e12))).as("brier_post"),
            (col("tot_gap").cast(DoubleType) / col("nn").cast(DoubleType))
              .as("ece_pre"),
            (col("tot_gapq").cast(DoubleType) /
              (col("nn").cast(DoubleType) * lit(1.0e6))).as("ece_post"),
            col("n_pav_bad"),
            // EXACT numerator compare: gaps share the denominator nn
            when(col("tot_gapq").cast(DecimalType(38, 6)) <
              col("tot_gap").cast(DecimalType(30, 6)) * lit(1000000L), 1)
              .otherwise(0).as("ok_improved"))
          .orderBy(col("bin"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |lab AS MATERIALIZED (
             |  SELECT doc_id, text,
             |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
             |              AND NOT contains(text, '{')
             |              AND len(list_filter(string_split(text, chr(10)),
             |                l -> regexp_matches(trim(l), '[.!?"]$')
             |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
             |                  >= 3
             |         THEN 'keep' ELSE 'drop' END AS label
             |  FROM built),
             |toks0 AS (
             |  SELECT doc_id, label,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM lab),
             |t AS MATERIALIZED (SELECT * FROM toks0 WHERE length(tok) > 0),
             |ct AS (SELECT label, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |tot AS MATERIALIZED (
             |  SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM t),
             |lp AS (
             |  SELECT label, tok,
             |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
             |  FROM ct JOIN tot USING (label) CROSS JOIN v),
             |dflt AS (
             |  SELECT label,
             |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
             |  FROM tot CROSS JOIN v),
             |prior AS (
             |  SELECT label,
             |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lab))
             |      AS DECIMAL(20,6)) AS prior
             |  FROM lab GROUP BY 1),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, c.label, p.prior,
             |    sum(dt.cnt) AS n_tok,
             |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
             |  FROM dt
             |  CROSS JOIN (SELECT label FROM tot) c
             |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
             |  JOIN dflt f ON f.label = c.label
             |  JOIN prior p ON p.label = c.label
             |  GROUP BY dt.doc_id, c.label, p.prior),
             |piv AS (
             |  SELECT doc_id,
             |    max(CASE WHEN label = 'keep' THEN prior + ll END) AS s_keep,
             |    max(CASE WHEN label = 'drop' THEN prior + ll END) AS s_drop,
             |    max(n_tok) AS n_tok
             |  FROM scored GROUP BY doc_id),
             |pd AS MATERIALIZED (
             |  SELECT pv.doc_id,
             |    CAST(1.0 / (1.0 + exp(-(8.0 *
             |      CAST(CAST(pv.s_keep - pv.s_drop AS VARCHAR) AS DOUBLE)
             |        / CAST(pv.n_tok AS DOUBLE)))) AS DECIMAL(12,6)) AS p,
             |    CASE WHEN l.label = 'keep' THEN 1 ELSE 0 END AS y
             |  FROM piv pv JOIN lab l USING (doc_id)),
             |cal AS MATERIALIZED (
             |  SELECT cell, n, sy, blkN, blkSy, calMicro FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/isotonic_cal/*.parquet')),
             |fg AS (
             |  SELECT CAST(floor(p * 10000) AS INTEGER) AS cell,
             |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
             |  FROM pd WHERE doc_id % 2 = 0 GROUP BY 1),
             |cj AS MATERIALIZED (
             |  SELECT c.cell, c.n, c.sy, c.blkN, c.blkSy, c.calMicro,
             |    COALESCE(f.n, 0) AS gn, COALESCE(f.sy, 0) AS gsy
             |  FROM cal c LEFT JOIN fg f USING (cell)),
             |gb AS (
             |  SELECT CAST(SUM(CASE WHEN gn <> n OR gsy <> sy
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |    + CASE WHEN count(*) <> 10001 THEN 1 ELSE 0 END AS bad
             |  FROM cj),
             |obs AS (
             |  SELECT *, CASE WHEN lag(blkN) OVER w IS NULL
             |      OR lag(blkN) OVER w <> blkN
             |      OR lag(blkSy) OVER w <> blkSy THEN 1 ELSE 0 END AS chg
             |  FROM cj WHERE n > 0 WINDOW w AS (ORDER BY cell)),
             |runs AS (SELECT *, SUM(chg) OVER (ORDER BY cell) AS run FROM obs),
             |pref AS (
             |  SELECT *, SUM(n) OVER pw AS pn, SUM(sy) OVER pw AS psy
             |  FROM runs WINDOW pw AS (PARTITION BY run ORDER BY cell
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |pr AS (
             |  SELECT run, MAX(blkN) AS bn, MIN(blkN) AS bn2,
             |    MAX(blkSy) AS bsy, MIN(blkSy) AS bsy2,
             |    SUM(n) AS rn, SUM(sy) AS rsy,
             |    MAX(calMicro) AS cm, MIN(calMicro) AS cm2,
             |    SUM(CASE WHEN CAST(psy AS HUGEINT) * blkN
             |        < CAST(blkSy AS HUGEINT) * pn THEN 1 ELSE 0 END)
             |      AS prefbad
             |  FROM pref GROUP BY run),
             |pr2 AS (
             |  SELECT *,
             |    CASE WHEN lag(bsy) OVER (ORDER BY run) IS NOT NULL
             |      AND CAST(lag(bsy) OVER (ORDER BY run) AS HUGEINT) * bn
             |          >= CAST(bsy AS HUGEINT) * lag(bn) OVER (ORDER BY run)
             |      THEN 1 ELSE 0 END AS monobad
             |  FROM pr),
             |rb AS (
             |  SELECT CAST(SUM(
             |      CASE WHEN bn <> bn2 OR bsy <> bsy2 OR cm <> cm2
             |        OR rn <> bn OR rsy <> bsy THEN 1 ELSE 0 END
             |    + CASE WHEN cm <> (2*1000000*CAST(bsy AS HUGEINT) + bn)
             |        // (2*CAST(bn AS HUGEINT)) THEN 1 ELSE 0 END
             |    + monobad + prefbad) AS BIGINT) AS bad
             |  FROM pr2),
             |fl0 AS (
             |  SELECT *, last_value(CASE WHEN n > 0 THEN calMicro END
             |      IGNORE NULLS) OVER (ORDER BY cell
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastobs,
             |    first_value(CASE WHEN n > 0 THEN calMicro END IGNORE NULLS)
             |      OVER (ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND UNBOUNDED FOLLOWING) AS firstobs
             |  FROM cj),
             |fb AS (
             |  SELECT CAST(SUM(CASE WHEN n = 0
             |      AND calMicro <> COALESCE(lastobs, firstobs)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS bad
             |  FROM fl0),
             |pav AS (SELECT gb.bad + rb.bad + fb.bad AS n_pav_bad
             |        FROM gb, rb, fb),
             |ej AS MATERIALIZED (
             |  SELECT e.p, e.y, c.calMicro AS pm
             |  FROM (SELECT CAST(floor(p * 10000) AS INTEGER) AS cell, p, y
             |        FROM pd WHERE doc_id % 2 = 1) e
             |  JOIN cal c USING (cell)),
             |bp AS MATERIALIZED (
             |  SELECT CAST(LEAST(CAST(floor(p * 10) AS INTEGER), 9)
             |      AS INTEGER) AS bin,
             |    CAST(count(*) AS BIGINT) AS n, SUM(p) AS sum_p,
             |    CAST(SUM(y) AS BIGINT) AS sum_y,
             |    SUM(CAST((CAST(p AS DECIMAL(13,6)) - CAST(y AS DECIMAL(7,6)))
             |      * (CAST(p AS DECIMAL(13,6)) - CAST(y AS DECIMAL(7,6)))
             |      AS DECIMAL(27,12))) AS sum_sq,
             |    CAST(SUM(pm) AS BIGINT) AS sum_pm,
             |    SUM(CAST((pm - y*1000000) * (pm - y*1000000)
             |      AS DECIMAL(38,0))) AS sum_sqq
             |  FROM ej GROUP BY 1),
             |bq AS (
             |  SELECT LEAST(CAST(pm // 100000 AS INTEGER), 9) AS binq,
             |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(pm) AS BIGINT) AS spm
             |  FROM ej GROUP BY 1),
             |gpre AS (
             |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
             |    SUM(abs(CAST(sum_y AS DECIMAL(20,6)) - sum_p)) AS tot_gap,
             |    SUM(sum_sq) AS tot_sq, SUM(sum_sqq) AS tot_sqq
             |  FROM bp),
             |gpost AS (
             |  SELECT SUM(abs(CAST(sy AS HUGEINT) * 1000000 - spm))
             |    AS tot_gapq
             |  FROM bq)
             |SELECT bin, n,
             |  CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
             |    AS mean_pred,
             |  CAST(sum_pm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
             |    AS mean_post,
             |  CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
             |  CAST(CAST(tot_sq AS VARCHAR) AS DOUBLE) / CAST(nn AS DOUBLE)
             |    AS brier_pre,
             |  CAST(tot_sqq AS DOUBLE) / (CAST(nn AS DOUBLE) * 1.0e12)
             |    AS brier_post,
             |  CAST(CAST(tot_gap AS VARCHAR) AS DOUBLE) / CAST(nn AS DOUBLE)
             |    AS ece_pre,
             |  CAST(tot_gapq AS DOUBLE) / (CAST(nn AS DOUBLE) * 1000000.0)
             |    AS ece_post,
             |  n_pav_bad,
             |  CAST(CASE WHEN CAST(tot_gapq AS DECIMAL(38,6))
             |    < CAST(tot_gap AS DECIMAL(30,6)) * 1000000 THEN 1 ELSE 0 END
             |    AS INTEGER) AS ok_improved
             |FROM bp CROSS JOIN gpre CROSS JOIN gpost CROSS JOIN pav
             |ORDER BY bin""".stripMargin),
      allowBnlj = true),


    // ROC AUC of the NB quality ranker (ProfileOps.rocAuc over the
    // SAME staged (doc_id, p, y) score table profile_recalibrate
    // reads) — the third leg of the classifier-evaluation tier:
    // profile_calibration judges the PROBABILITIES (ECE/Brier),
    // profile_recalibrate FIXES them, this key judges the ORDERING
    // (threshold-free — a perfectly calibrated coin flip scores
    // AUC 0.5; a miscalibrated-but-perfect ranker scores 1.0). The
    // rank-sum identity runs in exact integers end-to-end: value-grain
    // doubled tie ranks (no .5 minted), DECIMAL(38,0) rank sum, ONE
    // closing IEEE division — the oracle restates the identical chain
    // with HUGEINT ranks over the shared NB CTE pipeline.
    "profile_auc" -> QuerySpec(
      (s, d) => ProfileOps.rocAuc(
        s.read.parquet(recalScoresDir(s, d)), "p", "y"),
      Some(nbScorePdCtes + ",\n" +
        """g AS (SELECT p, CAST(count(*) AS BIGINT) AS c,
             |        CAST(sum(y) AS BIGINT) AS pos
             |      FROM pd GROUP BY 1),
             |r AS (
             |  SELECT p, c, pos,
             |    2 * COALESCE(SUM(c) OVER (ORDER BY p
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + c + 1 AS r2
             |  FROM g),
             |m AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(pos) AS BIGINT) AS npos,
             |    SUM(CAST(r2 AS HUGEINT) * pos) AS r2pos
             |  FROM r)
             |SELECT n, npos AS n_pos, n - npos AS n_neg,
             |  CASE WHEN npos > 0 AND n - npos > 0 THEN
             |    CAST(r2pos - CAST(npos AS HUGEINT) * (npos + 1) AS DOUBLE) /
             |    CAST(2 * CAST(npos AS HUGEINT) * (n - npos) AS DOUBLE)
             |  END AS auc,
             |  2.0 * (CASE WHEN npos > 0 AND n - npos > 0 THEN
             |    CAST(r2pos - CAST(npos AS HUGEINT) * (npos + 1) AS DOUBLE) /
             |    CAST(2 * CAST(npos AS HUGEINT) * (n - npos) AS DOUBLE)
             |  END) - 1.0 AS gini
             |FROM m""".stripMargin),
      allowBnlj = true),


    // Decile lift / cumulative-gains table (ProfileOps.liftTable) over
    // the same staged NB score table — AUC's operational readout: "act
    // on the top-k deciles, capture what share of the positives". The
    // buckets are rank·10 div N over the deterministic (score DESC,
    // doc_id) total order (the curriculumSample exact-integer-edge
    // contract; rank via range-sort + zipWithIndex, never a
    // partition-less window); rate/lift/gain are single IEEE divisions
    // of exact longs (lift's cross products in DECIMAL). The oracle
    // restates the rank as row_number()−1 over the same total order.
    "profile_lift" -> QuerySpec(
      (s, d) => ProfileOps.liftTable(
        s.read.parquet(recalScoresDir(s, d)), "p", "y", "doc_id",
        nBuckets = 10),
      Some(nbScorePdCtes + ",\n" +
        """r AS (
          |  SELECT p, y,
          |    row_number() OVER (ORDER BY p DESC, doc_id) - 1 AS rk
          |  FROM pd),
          |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |         CAST(SUM(y) AS BIGINT) AS pos FROM pd),
          |b AS (
          |  SELECT CAST((rk * 10) // nn.n AS INTEGER) AS bucket,
          |    CAST(count(*) AS BIGINT) AS nb, CAST(SUM(y) AS BIGINT) AS n_pos
          |  FROM r CROSS JOIN nn GROUP BY 1),
          |c AS (
          |  SELECT bucket, nb, n_pos,
          |    CAST(SUM(n_pos) OVER (ORDER BY bucket
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum_pos,
          |    CAST(SUM(nb) OVER (ORDER BY bucket
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum_n
          |  FROM b)
          |SELECT bucket, nb AS n, n_pos,
          |  CAST(n_pos AS DOUBLE) / CAST(nb AS DOUBLE) AS rate,
          |  CASE WHEN nn.pos > 0 THEN
          |    CAST(CAST(n_pos AS DECIMAL(19,0)) * CAST(nn.n AS DECIMAL(19,0))
          |      AS DOUBLE) /
          |    CAST(CAST(nb AS DECIMAL(19,0)) * CAST(nn.pos AS DECIMAL(19,0))
          |      AS DOUBLE) END AS lift,
          |  CASE WHEN nn.pos > 0 THEN
          |    CAST(cum_pos AS DOUBLE) / CAST(nn.pos AS DOUBLE) END AS cum_gain,
          |  CAST(cum_n AS DOUBLE) / CAST(nn.n AS DOUBLE) AS cum_frac
          |FROM c CROSS JOIN nn ORDER BY bucket""".stripMargin),
      allowBnlj = true),


    "profile_rate_ci" -> QuerySpec(
      (s, d) => ProfileOps.rateWilsonCi(
        t(s, d, "orders").select(col("o_orderpriority").as("grp"),
          col("o_orderstatus")),
        "grp", col("o_orderstatus") === "F")
        .orderBy(col("grp")),
      Some("""WITH a AS (
             |  SELECT o_orderpriority AS grp, count(*) AS n,
             |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS k
             |  FROM orders GROUP BY 1),
             |b AS (
             |  SELECT grp, n, k,
             |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS phat,
             |    1.959963984540054 * 1.959963984540054 AS z2,
             |    CAST(n AS DOUBLE) AS nd
             |  FROM a)
             |SELECT grp, n, k, phat AS rate,
             |  (phat + z2/(2.0*nd))/(1.0 + z2/nd)
             |    - (1.959963984540054
             |        * sqrt(phat*(1.0-phat)/nd + z2/(4.0*nd*nd)))
             |      /(1.0 + z2/nd) AS ci_lo,
             |  (phat + z2/(2.0*nd))/(1.0 + z2/nd)
             |    + (1.959963984540054
             |        * sqrt(phat*(1.0-phat)/nd + z2/(4.0*nd*nd)))
             |      /(1.0 + z2/nd) AS ci_hi
             |FROM b ORDER BY grp""".stripMargin)),


    // Cohen's kappa between two quality filters (round 14,
    // ProfileOps.cohenKappa): the filter-ensemble audit — C4
    // line-structure keep vs Gopher composite keep on the SAME built
    // multi-line fixture (the profile_calibration corpus). Raw
    // agreement p_o overstates consensus when both filters mostly say
    // keep; kappa chance-corrects against the marginals. ONE
    // aggregation to four exact confusion counts; kappa's division is
    // cleared by ×n² — numerator and denominator exact DECIMAL(38,0)
    // (n² wraps a long at n > ~3e9), ONE IEEE division each for
    // po/pe/kappa; degenerate marginals yield NULL kappa identically
    // cross-engine. The oracle re-derives BOTH filters from scratch
    // (C4 line rules; Gopher features over the \s+ token grain — the
    // built text is multi-line, so the single-space split of the
    // text_gopher_filter oracle would be wrong here).
    "profile_agreement" -> QuerySpec(
      (s, d) => {
        val toksB = split(col("text"), " ")
        val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toksB, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        val c4 = TextOps.c4QualityFlags(built, "text")
          .select(col("doc_id"), col("keep").as("_ka"))
        // minStopwords relaxed to 1: the synthetic corpus vocabulary
        // contains exactly ONE of the Gopher stopwords ('the'), so the
        // default 2 makes the rater constant-drop and kappa degenerate
        val gop = TextOps.gopherQualityFlags(built, "text", minStopwords = 1)
          .select(col("doc_id"), col("keep").as("_kb"))
        ProfileOps.cohenKappa(c4.join(gop, Seq("doc_id")),
          col("_ka") === 1, col("_kb") === 1)
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |c4 AS (
             |  SELECT doc_id,
             |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
             |              AND NOT contains(text, '{')
             |              AND len(list_filter(string_split(text, chr(10)),
             |                l -> regexp_matches(trim(l), '[.!?"]$')
             |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
             |                  >= 3
             |         THEN 1 ELSE 0 END AS ka
             |  FROM built),
             |gf AS (
             |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w,
             |    text FROM built),
             |gop AS (
             |  SELECT doc_id,
             |    CASE WHEN len(w) >= 50 AND len(w) <= 100000
             |      AND CAST(list_sum(list_transform(w, x -> length(x)))
             |            AS DOUBLE) / len(w) >= 3.0
             |      AND CAST(list_sum(list_transform(w, x -> length(x)))
             |            AS DOUBLE) / len(w) <= 10.0
             |      AND CAST(len(regexp_extract_all(text, '#|\.\.\.'))
             |            AS DOUBLE) / len(w) <= 0.1
             |      AND CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
             |            AS DOUBLE) / len(w) >= 0.8
             |      AND len(list_filter(
             |            ['the','be','to','of','and','that','have','with'],
             |            s -> list_contains(w, s))) >= 1
             |    THEN 1 ELSE 0 END AS kb
             |  FROM gf),
             |conf AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN ka = 1 AND kb = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n11,
             |    CAST(SUM(CASE WHEN ka = 1 AND kb = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10,
             |    CAST(SUM(CASE WHEN ka = 0 AND kb = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01,
             |    CAST(SUM(CASE WHEN ka = 0 AND kb = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00
             |  FROM c4 JOIN gop USING (doc_id))
             |SELECT n, n11, n10, n01, n00,
             |  CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
             |  CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |     + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
             |    / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS pe,
             |  CASE WHEN CAST(n AS HUGEINT) * n
             |      - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |         + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) <> 0
             |    THEN CAST(CAST(n AS HUGEINT) * (n11 + n00)
             |        - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS DOUBLE)
             |      / CAST(CAST(n AS HUGEINT) * n
             |        - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS DOUBLE)
             |  END AS kappa
             |FROM conf""".stripMargin)),


    // Chi-square independence cells: event type × daypart contingency
    // table with expected counts and per-cell χ² terms — "does behavior
    // depend on time of day" stated as the classic test. Exact cell/
    // marginal counts from ONE aggregation; expected and each term are
    // fixed IEEE chains (the profile_benford discipline); the scalar
    // statistic is the caller's fold over the ≤ types×4 rows.
    "profile_chi2_independence" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          // div, not /: Spark's / is fractional — mirror the oracle's //
          .select(col("event_type"),
            expr("hour(ts) div 6").cast(IntegerType).as("daypart"))
        val cells = ev.groupBy(col("event_type"), col("daypart"))
          .agg(count(lit(1)).as("n"))
        val rowT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("_r"))
        val colT = cells.groupBy(col("daypart")).agg(sum(col("n")).as("_c"))
        val tot = cells.agg(sum(col("n")).as("_t"))
        val e = (col("_r").cast(DoubleType) * col("_c").cast(DoubleType)) /
          col("_t").cast(DoubleType)
        cells
          .join(broadcast(rowT), Seq("event_type"))
          .join(broadcast(colT), Seq("daypart"))
          .crossJoin(broadcast(tot))
          .select(col("event_type"), col("daypart"), col("n"),
            e.as("expected"),
            ((col("n").cast(DoubleType) - e) *
              (col("n").cast(DoubleType) - e) / e).as("chi2_term"))
          .orderBy(col("event_type"), col("daypart"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(hour(ts) // 6 AS INTEGER) AS daypart
             |  FROM events),
             |cells AS (
             |  SELECT event_type, daypart, CAST(count(*) AS BIGINT) AS n
             |  FROM ev GROUP BY 1, 2),
             |r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rt
             |      FROM cells GROUP BY 1),
             |c AS (SELECT daypart, CAST(SUM(n) AS BIGINT) AS ct
             |      FROM cells GROUP BY 1),
             |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM cells)
             |SELECT cells.event_type, cells.daypart, cells.n,
             |  CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE)
             |    AS expected,
             |  (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |     / CAST(tt AS DOUBLE))
             |   * (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |     / CAST(tt AS DOUBLE))
             |   / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE))
             |    AS chi2_term
             |FROM cells
             |JOIN r USING (event_type) JOIN c USING (daypart) CROSS JOIN t
             |ORDER BY event_type, daypart""".stripMargin),
      allowBnlj = true),


    // Benjamini–Hochberg FDR step-up (ProfileOps.bhFdr) over 25
    // per-nation proportion z-tests (share of customers above a 5000
    // balance vs the pooled rate) — the multiple-testing gate the
    // χ²/t/KS battery lacks: screened at raw α, ~α·25 nations page
    // falsely; BH bounds the EXPECTED FALSE-DISCOVERY share at q=0.05.
    // No p-value is ever computed in-plan: p_(i) ≤ i·q/m is equivalent
    // to |z|_(i) ≥ Φ⁻¹(1−i·q/2m), and the 25 thresholds are evaluated
    // ONCE driver-side (Acklam's rational approximation) and inlined
    // as the SAME double literals into BOTH engines' queries — the
    // libm-divergence class is structurally out. z itself is the
    // profile_corr fixed-IEEE-chain discipline over exact longs.
    "profile_fdr_bh" -> QuerySpec(
      (s, d) => ProfileOps.bhFdr(
        t(s, d, "customer").select(col("c_nationkey"),
          when(col("c_acctbal") > 5000, 1).otherwise(0).as("hi_bal")),
        "c_nationkey", "hi_bal", m = 25, q = 0.05)
        .orderBy(col("rank")),
      Some {
        // thresholds as QUOTED strings → strtod (correctly rounded to
        // the same double the Spark literal holds); a bare numeric
        // literal would bind as DECIMAL(17,16) and convert differently
        val thr = (1 to 25).map { i =>
          s"($i, CAST('${ProfileOps.invNormalCdf(1.0 - i * 0.05 / (2.0 * 25))}' AS DOUBLE))"
        }.mkString(", ")
        s"""WITH per AS (
           |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS k
           |  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
           |pool AS (
           |  SELECT CAST(SUM(k) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS p0
           |  FROM per),
           |z AS (
           |  SELECT c_nationkey, k, n,
           |    (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) - p0) /
           |      sqrt(p0 * (1.0 - p0) / CAST(n AS DOUBLE)) AS z
           |  FROM per CROSS JOIN pool),
           |thr(rank, z_threshold) AS (VALUES $thr),
           |ranked AS (
           |  SELECT c_nationkey, k, n, z,
           |    CAST(row_number() OVER (ORDER BY abs(z) DESC, c_nationkey)
           |      AS INTEGER) AS rank
           |  FROM z),
           |flagged AS (
           |  SELECT r.c_nationkey, r.rank, r.k, r.n, r.z,
           |    t.z_threshold,
           |    CAST(CASE WHEN abs(r.z) >= t.z_threshold THEN 1 ELSE 0 END
           |      AS INTEGER) AS pass_raw
           |  FROM ranked r JOIN thr t ON t.rank = r.rank)
           |SELECT c_nationkey, rank, k, n, z, z_threshold, pass_raw,
           |  CAST(MAX(pass_raw) OVER (ORDER BY rank
           |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           |    AS INTEGER) AS significant
           |FROM flagged ORDER BY rank""".stripMargin
      },
      allowBnlj = true),


    // Mann–Whitney U rank-sum test (ProfileOps.mannWhitney) — the
    // distribution-free two-sample location test that completes the
    // battery (t tests means, KS tests shape, U tests stochastic
    // dominance; U/(n₁n₂) IS the AUC identity). Click vs view event
    // values at integer-cent grain: pooled value-grain doubled
    // midranks, exact DECIMAL(38,0) rank/tie sums, the tie-corrected
    // normal approximation as ONE fixed IEEE chain, rank-biserial
    // effect size. No continuity correction (documented).
    "profile_mannwhitney" -> QuerySpec(
      (s, d) => ProfileOps.mannWhitney(
        t(s, d, "events").select(col("event_type"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "event_type", "cents", groupA = "click", groupB = "view"),
      Some("""WITH e AS (
             |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events
             |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
             |grain AS (
             |  SELECT v, CAST(count(*) AS BIGINT) AS t,
             |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ta
             |  FROM e GROUP BY 1),
             |r AS (
             |  SELECT v, t, ta,
             |    2 * COALESCE(SUM(t) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + t + 1 AS r2
             |  FROM grain),
             |m AS (
             |  SELECT CAST(SUM(t) AS BIGINT) AS n,
             |    CAST(SUM(ta) AS BIGINT) AS na,
             |    SUM(CAST(r2 AS HUGEINT) * ta) AS r2a,
             |    SUM(CAST(t AS HUGEINT) * t * t - t) AS ties
             |  FROM r),
             |c AS (
             |  SELECT n, na, n - na AS nb,
             |    CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) / 2.0
             |      AS ua,
             |    CAST(na AS DOUBLE) AS nad, CAST(n - na AS DOUBLE) AS nbd,
             |    CAST(n AS DOUBLE) AS nd, CAST(ties AS DOUBLE) AS tiesd
             |  FROM m)
             |SELECT na AS n_a, nb AS n_b, ua AS u_a,
             |  CASE WHEN na > 0 AND nb > 0 AND
             |    (nad * nbd / 12.0) * ((nd + 1.0) - tiesd / (nd * (nd - 1.0)))
             |      > 0.0
             |  THEN (ua - nad * nbd / 2.0) /
             |    sqrt((nad * nbd / 12.0) *
             |      ((nd + 1.0) - tiesd / (nd * (nd - 1.0)))) END AS z,
             |  CASE WHEN na > 0 AND nb > 0
             |    THEN 2.0 * ua / (nad * nbd) - 1.0 END AS rank_biserial
             |FROM c""".stripMargin)),


    // A/B sample-size planner (ProfileOps.powerTwoProportion) — the
    // PRE-experiment companion to profile_ab_ttest/profile_rate_ci's
    // post-hoc readouts: per nation, the n PER ARM needed to detect a
    // +5pp lift in the high-balance rate at α=0.05 two-sided / 80%
    // power. Both z quantiles are driver-evaluated (Acklam) and
    // inlined as identical literals into both engines' queries (the
    // bhFdr contract — no transcendental runs in-plan); the formula is
    // a fixed IEEE chain over exact (k, n) longs. feasible flags
    // nations whose current sample already covers the requirement.
    "profile_power" -> QuerySpec(
      (s, d) => ProfileOps.powerTwoProportion(
        t(s, d, "customer").select(col("c_nationkey"),
          when(col("c_acctbal") > 5000, 1).otherwise(0).as("hi_bal")),
        "c_nationkey", "hi_bal", delta = 0.05)
        .orderBy(col("c_nationkey")),
      Some {
        val za = ProfileOps.invNormalCdf(1.0 - 0.05 / 2.0)
        val zb = ProfileOps.invNormalCdf(0.8)
        s"""WITH per AS (
           |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS k
           |  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
           |z AS (
           |  SELECT c_nationkey, k, n,
           |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p1
           |  FROM per),
           |f AS (
           |  SELECT c_nationkey, k, n, p1, p1 + 0.05 AS p2,
           |    (p1 + (p1 + 0.05)) / 2.0 AS pbar
           |  FROM z),
           |req AS (
           |  SELECT c_nationkey, k, n, p1,
           |    CASE WHEN p2 <= 1.0 THEN
           |      (CAST('$za' AS DOUBLE) * sqrt(2.0 * pbar * (1.0 - pbar)) +
           |       CAST('$zb' AS DOUBLE) *
           |         sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))) *
           |      (CAST('$za' AS DOUBLE) * sqrt(2.0 * pbar * (1.0 - pbar)) +
           |       CAST('$zb' AS DOUBLE) *
           |         sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))) /
           |      (CAST(0.05 AS DOUBLE) * CAST(0.05 AS DOUBLE))
           |      END AS n_required
           |  FROM f)
           |SELECT c_nationkey, k, n, p1 AS rate, n_required,
           |  CASE WHEN n_required IS NOT NULL THEN
           |    CAST(CASE WHEN CAST(n AS DOUBLE) >= n_required
           |      THEN 1 ELSE 0 END AS INTEGER) END AS feasible
           |FROM req ORDER BY c_nationkey""".stripMargin
      }),


    // CRAMÉR'S V effect size (Cramér 1946) — the scalar
    // profile_chi2_independence leaves as 'the caller's fold', now a
    // key: χ² folded over the SORTED bounded cell grain (the
    // win_attribution_linear fixed-order double-sum discipline — a
    // row-set SUM would leave accumulation order to the engine) and
    // V = √(χ²/(n·min(r−1,c−1))) as a fixed IEEE chain over exact
    // integers — the [0,1] association strength a dashboard can
    // threshold where raw χ² scales with n. Degenerate 1×c / r×1
    // tables yield NULL V (df = 0), not a division blow-up.
    "profile_cramers_v" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"),
            expr("hour(ts) div 6").cast(IntegerType).as("daypart"))
        val cells = ev.groupBy(col("event_type"), col("daypart"))
          .agg(count(lit(1)).as("n"))
        val rowT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("_r"))
        val colT = cells.groupBy(col("daypart")).agg(sum(col("n")).as("_c"))
        val tot = cells.agg(sum(col("n")).as("_t"))
        val e = (col("_r").cast(DoubleType) * col("_c").cast(DoubleType)) /
          col("_t").cast(DoubleType)
        val terms = cells
          .join(broadcast(rowT), Seq("event_type"))
          .join(broadcast(colT), Seq("daypart"))
          .crossJoin(broadcast(tot))
          .select(col("event_type"), col("daypart"), col("n"),
            ((col("n").cast(DoubleType) - e) *
              (col("n").cast(DoubleType) - e) / e).as("chi2_term"))
        terms
          .agg(sum(col("n")).as("n"),
            countDistinct(col("event_type")).cast(IntegerType).as("n_rows"),
            countDistinct(col("daypart")).cast(IntegerType).as("n_cols"),
            aggregate(
              sort_array(collect_list(struct(col("event_type"),
                col("daypart"), col("chi2_term")))),
              lit(0.0), (acc, x) => acc + x.getField("chi2_term"))
              .as("chi2"))
          .select(col("n"), col("n_rows"), col("n_cols"),
            ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
            col("chi2"),
            when(col("n_rows") > 1 && col("n_cols") > 1,
              sqrt(col("chi2") / (col("n").cast(DoubleType) *
                (least(col("n_rows"), col("n_cols")) - 1).cast(DoubleType))))
              .as("cramers_v"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(hour(ts) // 6 AS INTEGER) AS daypart
             |  FROM events),
             |cells AS (
             |  SELECT event_type, daypart, CAST(count(*) AS BIGINT) AS n
             |  FROM ev GROUP BY 1, 2),
             |r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rt
             |      FROM cells GROUP BY 1),
             |c AS (SELECT daypart, CAST(SUM(n) AS BIGINT) AS ct
             |      FROM cells GROUP BY 1),
             |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM cells),
             |terms AS (
             |  SELECT cells.event_type, cells.daypart, cells.n,
             |    (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |       / CAST(tt AS DOUBLE))
             |     * (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |       / CAST(tt AS DOUBLE))
             |     / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE))
             |      AS chi2_term
             |  FROM cells
             |  JOIN r USING (event_type) JOIN c USING (daypart) CROSS JOIN t),
             |agg AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS n,
             |    CAST(count(DISTINCT event_type) AS INTEGER) AS n_rows,
             |    CAST(count(DISTINCT daypart) AS INTEGER) AS n_cols,
             |    list_reduce(list(chi2_term ORDER BY event_type, daypart),
             |      (a, b) -> a + b) AS chi2
             |  FROM terms)
             |SELECT n, n_rows, n_cols,
             |  CAST((n_rows - 1) * (n_cols - 1) AS INTEGER) AS dof, chi2,
             |  CASE WHEN n_rows > 1 AND n_cols > 1
             |    THEN sqrt(chi2 / (CAST(n AS DOUBLE) *
             |      CAST(least(n_rows, n_cols) - 1 AS DOUBLE)))
             |  END AS cramers_v
             |FROM agg""".stripMargin),
      allowBnlj = true),


    // EXACT two-sample Kolmogorov-Smirnov statistic: D = max|F₁−F₂|
    // over the pooled value grain, computed ENTIRELY in integers —
    // the CDF-difference comparison cross-multiplies to
    // |f₁·n₂ − f₂·n₁| (exact longs; swap in DECIMAL(18,0) products
    // past n₁·n₂ ~ 2⁶³), so the argmax is bit-deterministic and the
    // one division happens once, on the single output row. The window
    // runs on the VALUE grain (50 distinct quantities — continuous
    // data should be binned first, the drift-key pattern).
    "profile_ks_exact" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_quantity").isNotNull &&
            col("l_returnflag").isin("A", "R"))
        val grain = li.groupBy(col("l_quantity").as("v"))
          .agg(sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("c1"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("c2"))
        val tot = grain.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        val w = Window.partitionBy(lit(0)).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = grain
          .withColumn("f1", sum(col("c1")).over(w))
          .withColumn("f2", sum(col("c2")).over(w))
          .crossJoin(broadcast(tot))
          .withColumn("d", abs(col("f1") * col("n2") - col("f2") * col("n1")))
        cum.orderBy(col("d").desc, col("v")).limit(1)
          .select(col("v").as("at_value"), col("n1"), col("n2"),
            col("d").as("ks_num"),
            (col("d").cast(DoubleType) /
              (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)))
              .as("ks"))
      },
      Some("""WITH src AS (
             |  SELECT l_returnflag, l_quantity AS v FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R')),
             |g AS (
             |  SELECT v,
             |    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c2
             |  FROM src GROUP BY 1),
             |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             |             CAST(SUM(c2) AS BIGINT) AS n2 FROM g),
             |cum AS (
             |  SELECT v,
             |    CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
             |    CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS f2
             |  FROM g),
             |dd AS (
             |  SELECT v, t.n1, t.n2, abs(f1 * t.n2 - f2 * t.n1) AS d
             |  FROM cum CROSS JOIN t)
             |SELECT v AS at_value, n1, n2, d AS ks_num,
             |  CAST(d AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             |    AS ks
             |FROM dd ORDER BY d DESC, v LIMIT 1""".stripMargin),
      allowBnlj = true),


    // Benford first-digit profile (ProfileOps.benfordProfile): the
    // fabricated-/truncated-data tripwire for amount columns — digit
    // from floor(v·100) via exact integer→string (double→string
    // formatting never happens), log₁₀ expectations quantized once to
    // DECIMAL(12,6), per-digit χ² terms as fixed IEEE chains ⇒ fully
    // oracled. ONE ≤9-row aggregation + a 1-row total broadcast.
    "profile_benford" -> QuerySpec(
      (s, d) => ProfileOps.benfordProfile(t(s, d, "orders"), "o_totalprice")
        .orderBy(col("digit")),
      Some("""WITH src AS (
             |  SELECT o_totalprice AS v FROM orders
             |  WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0.01),
             |counts AS (
             |  SELECT CAST(substr(CAST(CAST(floor(v * 100.0) AS BIGINT)
             |      AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM src GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
             |grid AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit),
             |j AS (
             |  SELECT g.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
             |    CAST(log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))
             |      AS DECIMAL(12,6)) AS e
             |  FROM grid g LEFT JOIN counts c USING (digit))
             |SELECT j.digit, j.n,
             |  CAST(j.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS share,
             |  CAST(e AS DOUBLE) AS expected,
             |  (CAST(j.n AS DOUBLE) - CAST(e AS DOUBLE) * CAST(t.t AS DOUBLE))
             |   * (CAST(j.n AS DOUBLE) - CAST(e AS DOUBLE) * CAST(t.t AS DOUBLE))
             |   / (CAST(e AS DOUBLE) * CAST(t.t AS DOUBLE)) AS chi2_term
             |FROM j CROSS JOIN tot t ORDER BY digit""".stripMargin),
      allowBnlj = true),


    // Per-group Gini concentration (ProfileOps.giniByGroup): rank-form
    // Gini over exact DECIMAL(18,6) sums — Σi·x is tie-order-invariant,
    // the closing formula ONE fixed IEEE chain ⇒ fully oracled.
    "profile_gini" -> QuerySpec(
      (s, d) => ProfileOps.giniByGroup(
        t(s, d, "orders"), "o_orderpriority", "o_totalprice")
        .orderBy(col("o_orderpriority")),
      Some("""WITH g AS (
             |  SELECT o_orderpriority AS k,
             |    CAST(o_totalprice AS DECIMAL(18,6)) AS x,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice) AS DECIMAL(10,0)) AS i
             |  FROM orders WHERE o_totalprice IS NOT NULL),
             |s AS (
             |  SELECT k, CAST(count(*) AS BIGINT) AS n,
             |    SUM(x) AS sx, SUM(i * x) AS six
             |  FROM g GROUP BY 1)
             |SELECT k AS o_orderpriority, n,
             |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS total,
             |  (2.0 * CAST(CAST(six AS VARCHAR) AS DOUBLE)
             |    - (CAST(n AS DOUBLE) + 1.0) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
             |   / (CAST(n AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) AS gini
             |FROM s ORDER BY o_orderpriority""".stripMargin)),


    // Winsorization (outlier clipping to exact [p01, p99]): percentile
    // pass → one broadcast row → per-row clamp. Exact-percentile parity
    // with quantile_cont is already pinned by fn_percentile.
    "prep_winsorize" -> QuerySpec(
      (s, d) => ProfileOps.winsorize(
        t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
        "l_extendedprice")
        .select(col("l_orderkey"), col("l_linenumber"), col("clipped"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""WITH src AS (
             |  SELECT l_orderkey, l_linenumber, l_extendedprice
             |  FROM lineitem WHERE l_orderkey < 2000),
             |p AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
             |             quantile_cont(l_extendedprice, 0.99) AS hi
             |      FROM src)
             |SELECT l_orderkey, l_linenumber,
             |  LEAST(GREATEST(l_extendedprice, p.lo), p.hi) AS clipped
             |FROM src, p ORDER BY l_orderkey, l_linenumber""".stripMargin),
      allowBnlj = true),


    // Equi-depth quantile binning (ProfileOps.quantileBins): each doc's
    // quality-proxy value → its quartile index, the curriculum/mixing
    // grain computed WITHOUT an ntile() global sort — one exact
    // interior-threshold aggregate broadcast back as a 1-row frame,
    // bin assignment a codegen'd comparison chain. Exact-percentile
    // parity with quantile_cont is pinned by fn_percentile; ties at a
    // threshold go to the lower bin on both engines (strict >).
    "prep_quantile_bins" -> QuerySpec(
      (s, d) => ProfileOps.quantileBins(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", nBins = 4)
        .select(col("doc_id"), col("n_chars"), col("bin"))
        .orderBy(col("doc_id")),
      Some("""WITH p AS (
             |  SELECT quantile_cont(n_chars, 0.25) AS t1,
             |         quantile_cont(n_chars, 0.5)  AS t2,
             |         quantile_cont(n_chars, 0.75) AS t3
             |  FROM documents)
             |SELECT doc_id, n_chars,
             |  CAST((CASE WHEN n_chars > t1 THEN 1 ELSE 0 END
             |      + CASE WHEN n_chars > t2 THEN 1 ELSE 0 END
             |      + CASE WHEN n_chars > t3 THEN 1 ELSE 0 END) AS INTEGER)
             |    AS bin
             |FROM documents CROSS JOIN p ORDER BY doc_id""".stripMargin),
      allowBnlj = true),


    // Smoothed (m-estimate) target encoding (ProfileOps.targetEncode,
    // Micci-Barreca): per-customer mean order price shrunk toward the
    // global mean — the high-cardinality categorical encoder whose raw
    // per-level mean overfits rare levels. Emits the frozen FIT table
    // (score time is a broadcast join). Exact DECIMAL(18,6) sums; the
    // prior re-aggregates the per-category sums (no second data scan);
    // enc is one fixed IEEE chain ⇒ fully oracled.
    "prep_target_encode" -> QuerySpec(
      (s, d) => ProfileOps.targetEncode(
        t(s, d, "orders"), "o_custkey", "o_totalprice", m = 10.0)
        .orderBy(col("o_custkey")),
      Some("""WITH pc AS (
             |  SELECT o_custkey, count(*) AS n,
             |    SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS dsum
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
             |  GROUP BY 1),
             |pr AS (
             |  SELECT CAST(SUM(dsum) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
             |    AS prior
             |  FROM pc)
             |SELECT o_custkey, n, CAST(dsum AS DOUBLE) AS sum_target,
             |  (CAST(dsum AS DOUBLE) + 10.0 * prior)
             |    / (CAST(n AS DOUBLE) + 10.0) AS enc
             |FROM pc CROSS JOIN pr ORDER BY o_custkey""".stripMargin),
      allowBnlj = true),


    // Categorical concentration profile (ProfileOps.categoricalProfile):
    // per-source language distribution — n, distinct k, Shannon
    // entropy, ln(k)-normalized entropy, Gini impurity. The mix
    // dashboard ("did source X collapse to one language"). Every
    // transcendental TERM is DECIMAL(20,9)-quantized before any
    // cross-row sum (the text_unigram_logprob discipline: ln's last
    // ulp must never reach a double sum) ⇒ fully oracled.
    "profile_entropy" -> QuerySpec(
      (s, d) => ProfileOps.categoricalProfile(
        t(s, d, "documents"), "source", "lang")
        .orderBy(col("source")),
      Some("""WITH c AS (
             |  SELECT source, lang, count(*) AS cnt FROM documents
             |  WHERE source IS NOT NULL AND lang IS NOT NULL
             |  GROUP BY 1, 2),
             |sh AS (
             |  SELECT source, lang, cnt,
             |    CAST(cnt AS DOUBLE)
             |      / CAST(SUM(cnt) OVER (PARTITION BY source) AS DOUBLE)
             |      AS p
             |  FROM c),
             |tq AS (
             |  SELECT source, cnt,
             |    CAST(-(p * ln(p)) AS DECIMAL(20,9)) AS hterm,
             |    CAST(p * p AS DECIMAL(20,9)) AS gterm
             |  FROM sh),
             |g AS (
             |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n,
             |    count(*) AS k,
             |    CAST(SUM(hterm) AS DOUBLE) AS entropy,
             |    1.0 - CAST(SUM(gterm) AS DOUBLE) AS gini
             |  FROM tq GROUP BY 1)
             |SELECT source, n, k, entropy, gini,
             |  CASE WHEN k > 1 THEN entropy
             |    / CAST(CAST(ln(CAST(k AS DOUBLE)) AS DECIMAL(20,9))
             |        AS DOUBLE)
             |    ELSE 0.0 END AS norm_entropy
             |FROM g ORDER BY source""".stripMargin)),


    // Poisson-bootstrap CI for the mean order value
    // (ProfileOps.bootstrapMeanCi, Chamandy et al. — the distributed
    // bootstrap): per-row Poisson(1) multiplicities from the portable
    // LCG through a literal inverse-CDF cutoff array, B=33 replicate
    // means from exact decimal sums, CI bounds at p = 1/32, 31/32 so
    // each percentile IS an order statistic (zero interpolation
    // arithmetic to differ across engines) ⇒ fully oracled.
    "profile_bootstrap_ci" -> QuerySpec(
      (s, d) => ProfileOps.bootstrapMeanCi(
        t(s, d, "orders"), "o_orderkey", "o_totalprice")
        .orderBy(col("n")),
      Some("""WITH r AS (
             |  SELECT o_orderkey AS id,
             |    CAST(o_totalprice AS DECIMAL(18,6)) AS x
             |  FROM orders
             |  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL),
             |d AS (
             |  SELECT id, x, j,
             |    CAST(len(list_filter(
             |      [0.36787944117144233, 0.7357588823428847,
             |       0.9196986029286058, 0.9810118431238463,
             |       0.9963401531726563, 0.9994058151824183,
             |       0.999916758850712, 0.9999897508033253,
             |       0.999998874797402],
             |      c -> c <= CAST(((id * 33 + j + 42) * 1103515245 + 12345)
             |             % 2147483648 AS DOUBLE) / 2147483648.0))
             |      AS BIGINT) AS w
             |  FROM r
             |  CROSS JOIN (SELECT unnest(generate_series(1, 33)) AS j)),
             |m AS (
             |  SELECT j, CAST(SUM(w * x) AS DOUBLE)
             |    / CAST(SUM(w) AS DOUBLE) AS mb
             |  FROM d GROUP BY 1),
             |ci AS (
             |  SELECT quantile_cont(mb, 0.03125) AS ci_lo,
             |    quantile_cont(mb, 0.96875) AS ci_hi
             |  FROM m)
             |SELECT count(*) AS n,
             |  CAST(SUM(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
             |  ci.ci_lo, ci.ci_hi, CAST(33 AS BIGINT) AS b
             |FROM r CROSS JOIN ci
             |GROUP BY ci.ci_lo, ci.ci_hi""".stripMargin),
      allowBnlj = true),


    // Volume anomaly monitor (ProfileOps.volumeAnomaly): hourly event
    // counts vs median ± 4·MAD — the robust ingest-health gate a
    // mean/stddev z-score fails exactly when the anomaly inflates the
    // stddev. Bucket grain with the flag as data; exact longs, exact
    // dyadic medians, IEEE-exact comparisons ⇒ fully oracled.
    "profile_volume_anomaly" -> QuerySpec(
      (s, d) => ProfileOps.volumeAnomaly(
        t(s, d, "events"), "ts", "hour", k = 4.0)
        .orderBy(col("bucket")),
      Some("""WITH c AS (
             |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             |    count(*) AS cnt
             |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
             |m AS (SELECT quantile_cont(cnt, 0.5) AS med FROM c),
             |d AS (
             |  SELECT bucket, cnt, med,
             |    abs(CAST(cnt AS DOUBLE) - med) AS deviation
             |  FROM c, m),
             |md AS (SELECT quantile_cont(deviation, 0.5) AS mad FROM d)
             |SELECT bucket, cnt, med, deviation, mad,
             |  deviation > 4.0 * mad AS is_anomaly
             |FROM d, md ORDER BY bucket""".stripMargin),
      allowBnlj = true),


    // Fixed-width histogram (ProfileOps.histogram): 1-row min/max
    // broadcast + one partial-aggregating groupBy — two scans total,
    // no global sort. Every bucket formula is plain IEEE-double
    // arithmetic, so DuckDB reproduces the binning bit-for-bit
    // (empty bins are absent on both sides by the same construction).
    "profile_histogram" -> QuerySpec(
      (s, d) => ProfileOps.histogram(t(s, d, "lineitem"), "l_extendedprice", bins = 16)
        .orderBy(col("bin")),
      Some("""WITH s AS (
             |  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |b AS (
             |  SELECT CAST(CASE WHEN mx = mn THEN 0
             |    ELSE LEAST(15, CAST(FLOOR((l_extendedprice - mn) /
             |                              ((mx - mn) / 16.0)) AS BIGINT))
             |    END AS BIGINT) AS bin,
             |    mn, (mx - mn) / 16.0 AS w
             |  FROM lineitem, s WHERE l_extendedprice IS NOT NULL)
             |SELECT bin, mn + bin * w AS bin_lo, mn + (bin + 1) * w AS bin_hi,
             |  count(*) AS cnt
             |FROM b GROUP BY bin, mn, w ORDER BY bin""".stripMargin),
      allowBnlj = true),


    // Two-snapshot distribution drift (ProfileOps.snapshotDrift): the
    // refresh-monitoring gate — 'view' events are the reference
    // distribution, 'purchase' events the monitored snapshot, both
    // binned on the REFERENCE's exact octile thresholds. Per-bin
    // occupancy shares plus the χ²/KS/TV drift terms, every double a
    // FIXED IEEE sequence over exact integer counts (never a cross-bin
    // double sum — accumulation order is the cross-engine trap), so
    // the key is fully oracled: DuckDB rebuilds thresholds
    // (quantile_cont ≡ percentile, the prep_quantile_bins-proven
    // identity), counts, CDFs and terms.
    "profile_snapshot_drift" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
        ProfileOps.snapshotDrift(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"),
          "value", nBins = 8, driftThreshold = 0.02)
          .orderBy(col("bin"))
      },
      Some {
        val ts = (1 to 7).map(k =>
          s"quantile_cont(value, 0.${125 * k}) AS t$k").mkString(", ")
        val binExpr = (1 to 7).map(k =>
          s"CASE WHEN value > t$k THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH p AS (
           |  SELECT $ts FROM events
           |  WHERE event_type = 'view' AND value IS NOT NULL),
           |rb AS (
           |  SELECT CAST($binExpr AS INTEGER) AS bin
           |  FROM events CROSS JOIN p
           |  WHERE event_type = 'view' AND value IS NOT NULL),
           |cb AS (
           |  SELECT CAST($binExpr AS INTEGER) AS bin
           |  FROM events CROSS JOIN p
           |  WHERE event_type = 'purchase' AND value IS NOT NULL),
           |rc AS (SELECT bin, count(*) AS n FROM rb GROUP BY 1),
           |cc AS (SELECT bin, count(*) AS n FROM cb GROUP BY 1),
           |spine AS (SELECT CAST(range AS INTEGER) AS bin FROM range(8)),
           |j AS (
           |  SELECT s.bin,
           |    CAST(coalesce(rc.n, 0) AS BIGINT) AS n_ref,
           |    CAST(coalesce(cc.n, 0) AS BIGINT) AS n_cur
           |  FROM spine s
           |  LEFT JOIN rc ON rc.bin = s.bin
           |  LEFT JOIN cc ON cc.bin = s.bin),
           |t AS (
           |  SELECT bin, n_ref, n_cur,
           |    CAST(n_ref AS DOUBLE) / CAST(sum(n_ref) OVER () AS DOUBLE) AS p_ref,
           |    CAST(n_cur AS DOUBLE) / CAST(sum(n_cur) OVER () AS DOUBLE) AS p_cur,
           |    CAST(sum(n_ref) OVER (ORDER BY bin) AS DOUBLE)
           |      / CAST(sum(n_ref) OVER () AS DOUBLE) AS cdf_ref,
           |    CAST(sum(n_cur) OVER (ORDER BY bin) AS DOUBLE)
           |      / CAST(sum(n_cur) OVER () AS DOUBLE) AS cdf_cur
           |  FROM j)
           |SELECT bin, n_ref, n_cur, p_ref, p_cur,
           |  abs(p_ref - p_cur) AS abs_diff,
           |  CASE WHEN n_ref > 0
           |    THEN (p_cur - p_ref) * (p_cur - p_ref) / p_ref END AS chi2_term,
           |  abs(cdf_ref - cdf_cur) AS ks_term,
           |  CAST(abs(p_ref - p_cur) > 0.02 AS INTEGER) AS drifted
           |FROM t ORDER BY bin""".stripMargin
      },
      allowBnlj = true),


    // POPULATION STABILITY INDEX (round 13): the industry refresh-gate
    // scalar beside profile_snapshot_drift's per-bin χ²/KS/TV terms —
    // the drift doc explicitly leaves PSI as "the caller's fold"; this
    // key IS that fold, oracled. Same frozen-reference equi-depth bins;
    // Haldane-smoothed shares (count + 0.5, total + nBins/2 — the
    // deterministic zero-bin guard, no ε clamp) feed
    // (q−p)·ln(q/p) per bin. Discipline: shares and their diff are
    // fixed IEEE over exact counts; ln is the ONLY transcendental,
    // quantized DECIMAL(20,9); the diff quantizes DECIMAL(12,9); the
    // per-bin product and the ≤8-row total are EXACT decimals,
    // presented as doubles (oracle quantizes AND presents through
    // VARCHAR — the ts_backtest double-rounding lesson). Partition-less
    // windows sanctioned: the frame is nBins rows.
    "profile_psi" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
        val ds = ProfileOps.snapshotDrift(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"),
          "value", nBins = 8, driftThreshold = 0.02)
        val wAll = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val staged = ds
          .select(col("bin"), col("n_ref"), col("n_cur"),
            col("p_ref"), col("p_cur"))
          .withColumn("_nr", sum(col("n_ref")).over(wAll))
          .withColumn("_nc", sum(col("n_cur")).over(wAll))
          .withColumn("_ps", (col("n_ref").cast(DoubleType) + lit(0.5)) /
            (col("_nr").cast(DoubleType) + lit(4.0)))
          .withColumn("_qs", (col("n_cur").cast(DoubleType) + lit(0.5)) /
            (col("_nc").cast(DoubleType) + lit(4.0)))
          .withColumn("_term",
            (col("_qs") - col("_ps")).cast(DecimalType(12, 9)) *
              log(col("_qs") / col("_ps")).cast(DecimalType(20, 9)))
        staged
          .withColumn("psi_term", col("_term").cast(DoubleType))
          .withColumn("psi", sum(col("_term")).over(wAll).cast(DoubleType))
          .select(col("bin"), col("n_ref"), col("n_cur"),
            col("p_ref"), col("p_cur"), col("psi_term"), col("psi"))
          .orderBy(col("bin"))
      },
      Some {
        val ts = (1 to 7).map(k =>
          s"quantile_cont(value, 0.${125 * k}) AS t$k").mkString(", ")
        val binExpr = (1 to 7).map(k =>
          s"CASE WHEN value > t$k THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH p AS (
           |  SELECT $ts FROM events
           |  WHERE event_type = 'view' AND value IS NOT NULL),
           |rb AS (
           |  SELECT CAST($binExpr AS INTEGER) AS bin
           |  FROM events CROSS JOIN p
           |  WHERE event_type = 'view' AND value IS NOT NULL),
           |cb AS (
           |  SELECT CAST($binExpr AS INTEGER) AS bin
           |  FROM events CROSS JOIN p
           |  WHERE event_type = 'purchase' AND value IS NOT NULL),
           |rc AS (SELECT bin, count(*) AS n FROM rb GROUP BY 1),
           |cc AS (SELECT bin, count(*) AS n FROM cb GROUP BY 1),
           |spine AS (SELECT CAST(range AS INTEGER) AS bin FROM range(8)),
           |j AS (
           |  SELECT s.bin,
           |    CAST(coalesce(rc.n, 0) AS BIGINT) AS n_ref,
           |    CAST(coalesce(cc.n, 0) AS BIGINT) AS n_cur
           |  FROM spine s
           |  LEFT JOIN rc ON rc.bin = s.bin
           |  LEFT JOIN cc ON cc.bin = s.bin),
           |t AS (
           |  SELECT bin, n_ref, n_cur,
           |    CAST(n_ref AS DOUBLE) / CAST(sum(n_ref) OVER () AS DOUBLE) AS p_ref,
           |    CAST(n_cur AS DOUBLE) / CAST(sum(n_cur) OVER () AS DOUBLE) AS p_cur,
           |    (CAST(n_ref AS DOUBLE) + 0.5)
           |      / (CAST(CAST(sum(n_ref) OVER () AS BIGINT) AS DOUBLE) + 4.0) AS ps,
           |    (CAST(n_cur AS DOUBLE) + 0.5)
           |      / (CAST(CAST(sum(n_cur) OVER () AS BIGINT) AS DOUBLE) + 4.0) AS qs
           |  FROM j),
           |u AS (
           |  SELECT bin, n_ref, n_cur, p_ref, p_cur,
           |    CAST(CAST(qs - ps AS VARCHAR) AS DECIMAL(12,9))
           |      * CAST(CAST(ln(qs / ps) AS VARCHAR) AS DECIMAL(20,9)) AS term
           |  FROM t)
           |SELECT bin, n_ref, n_cur, p_ref, p_cur,
           |  CAST(CAST(term AS VARCHAR) AS DOUBLE) AS psi_term,
           |  CAST(CAST(sum(term) OVER () AS VARCHAR) AS DOUBLE) AS psi
           |FROM u ORDER BY bin""".stripMargin
      },
      allowBnlj = true),


    // Per-group z-score normalization, stddev DERIVED from exact decimal
    // sums (Σx, Σx²) so the double arithmetic is a fixed op chain —
    // bit-identical under any partial-agg order and in DuckDB (native
    // stddev_samp is Welford-streamed and NOT hash-stable cross-engine).
    "prep_zscore_group" -> QuerySpec(
      (s, d) => ProfileOps.zscorePerGroup(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "value")
        .orderBy(col("event_id")),
      Some("""WITH st AS (
             |  SELECT event_id, user_id, value,
             |    CAST(count(value) OVER w AS DOUBLE) AS n,
             |    CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id))
             |SELECT event_id, user_id, value,
             |  CASE WHEN n > 1 AND (s2 - s1 * s1 / n) / (n - 1.0) > 0
             |    THEN (value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1.0))
             |  END AS zscore
             |FROM st ORDER BY event_id""".stripMargin)),


    // Forward-fill gap imputation (LOCF): per-user series with every
    // 5th measurement deterministically nulled out on BOTH sides, so
    // the oracle checks real fills. value is carried through untouched
    // (no arithmetic) ⇒ doubles compare bit-for-bit.
    "profile_forward_fill" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value"))
              .as("v"))
        ProfileOps.forwardFill(ev, "user_id", "event_id", Seq("v"))
          .withColumnRenamed("v", "v_filled")
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
             |  FROM events)
             |SELECT event_id, user_id,
             |  last_value(v IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
             |FROM ev ORDER BY event_id""".stripMargin)),
  )
}
