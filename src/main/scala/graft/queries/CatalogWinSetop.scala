package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** WinSetop family of the operator catalog (18 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogWinSetop {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // ------------------------------------------------------------- set ops
    // union = bag semantics (README.md:1529) ⇒ UNION ALL on the oracle.
    "setop_union" -> QuerySpec(
      (s, d) => {
        val o = t(s, d, "orders")
        val a = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val b = o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        a.union(b).orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |  WHERE o_orderpriority = '1-URGENT'
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |  WHERE o_orderstatus = 'F')
             |ORDER BY o_orderkey, o_orderstatus, o_totalprice""".stripMargin)),


    "setop_intersect" -> QuerySpec(
      (s, d) => {
        val c = t(s, d, "customer")
        val a = c.filter(col("c_acctbal") > 0).select(col("c_nationkey"), col("c_mktsegment"))
        val b = c.filter(col("c_mktsegment") =!= "BUILDING").select(col("c_nationkey"), col("c_mktsegment"))
        a.intersect(b).orderBy(col("c_nationkey"), col("c_mktsegment"))
      },
      Some("""SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0
             |INTERSECT
             |SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment <> 'BUILDING'
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),


    "setop_except" -> QuerySpec(
      (s, d) => {
        val c = t(s, d, "customer")
        val a = c.select(col("c_nationkey"), col("c_mktsegment"))
        val b = c.filter(col("c_acctbal") < 0).select(col("c_nationkey"), col("c_mktsegment"))
        a.except(b).orderBy(col("c_nationkey"), col("c_mktsegment"))
      },
      Some("""SELECT c_nationkey, c_mktsegment FROM customer
             |EXCEPT
             |SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < 0
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),


    // BAG-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicity
    // is the answer — min(countA, countB) / countA − countB copies per
    // row — which DISTINCT-flavored setop_intersect/except destroy.
    // The dedup-bookkeeping semantics (how many copies survive), and a
    // different physical plan: Spark rewrites both to an aggregate of
    // per-side counts + generate, never a join.
    "setop_intersect_all" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.filter(col("l_quantity") > 10).select(col("l_returnflag"), col("l_linenumber"))
        val b = li.filter(col("l_discount") > 0.02).select(col("l_returnflag"), col("l_linenumber"))
        a.intersectAll(b).orderBy(col("l_returnflag"), col("l_linenumber"))
      },
      Some("""SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_quantity > 10
             |INTERSECT ALL
             |SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_discount > 0.02
             |ORDER BY l_returnflag, l_linenumber""".stripMargin)),


    "setop_except_all" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.select(col("l_returnflag"), col("l_linenumber"))
        val b = li.filter(col("l_quantity") > 25).select(col("l_returnflag"), col("l_linenumber"))
        a.exceptAll(b).orderBy(col("l_returnflag"), col("l_linenumber"))
      },
      Some("""SELECT l_returnflag, l_linenumber FROM lineitem
             |EXCEPT ALL
             |SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_quantity > 25
             |ORDER BY l_returnflag, l_linenumber""".stripMargin)),


    // -------------------------------------------------------------- windows
    // Extension surface (SURVEY.md §2.6): ranking / analytic / frames.
    "win_rank" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
             |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             |        row_number() OVER (PARTITION BY o_orderpriority
             |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin)),


    "win_lag_delta" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, value,
             |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
             |FROM events ORDER BY user_id, event_id""".stripMargin)),


    // 7-row moving window; sum/count kept separate so both engines divide
    // the same exact decimal sum (no segment-tree float reassociation).
    "win_moving_avg" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(-6, 0)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            sum(col("value").cast(DecimalType(18, 6))).over(w).cast(DoubleType).as("mv_sum"),
            count(lit(1)).over(w).as("mv_n"))
          .withColumn("mv_avg", col("mv_sum") / col("mv_n"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS mv_sum,
             |  COUNT(*) OVER w AS mv_n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / COUNT(*) OVER w AS mv_avg
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),


    // MOVING MEDIAN (round 13): the robust moving smoother beside
    // win_moving_avg — one corrupt spike moves a 5-point mean by 1/5
    // of its magnitude but cannot move the median at all (the
    // monitoring rationale of profile_mad_outliers, in window form).
    // Exactness: values quantize to deci-units by round() (round, NOT
    // floor — v·10 of an n/10 double lands within 1 ulp of n, and
    // floor's representation-boundary surprises are a pinned trap),
    // the frame's sorted list is exact longs, and the median is either
    // an integer or a dyadic half — bit-exact in double — with ONE
    // mirrored division back to value units.
    "win_moving_median" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(-4, 0)
        val lst = sort_array(collect_list(
          round(col("value") * 10).cast(LongType)).over(w))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            lst.as("_l"))
          .withColumn("med5",
            when(size(col("_l")) % 2 === 1,
              element_at(col("_l"),
                ((size(col("_l")) + 1) / 2).cast(IntegerType))
                .cast(DoubleType))
              .otherwise(
                (element_at(col("_l"),
                  (size(col("_l")) / 2).cast(IntegerType)) +
                  element_at(col("_l"),
                    (size(col("_l")) / 2).cast(IntegerType) + 1))
                  .cast(DoubleType) / lit(2.0))
              / lit(10.0))
          .drop("_l")
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH l AS (
             |  SELECT user_id, event_id, value,
             |    list_sort(list(CAST(round(value * 10) AS BIGINT)) OVER (
             |      PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS ls
             |  FROM events)
             |SELECT user_id, event_id, value,
             |  CASE WHEN len(ls) % 2 = 1
             |    THEN CAST(ls[(len(ls) + 1) // 2] AS DOUBLE)
             |    ELSE CAST(ls[len(ls) // 2] + ls[len(ls) // 2 + 1] AS DOUBLE)
             |         / 2.0 END / 10.0 AS med5
             |FROM l ORDER BY user_id, event_id""".stripMargin)),


    // Value-based window functions over the FULL frame: first/last/nth
    // need UNBOUNDED FOLLOWING (the default frame stops at CURRENT ROW —
    // a classic silent-wrong-answer trap both engines share).
    "win_first_last" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("cheapest"),
            last(col("o_orderkey")).over(w).as("dearest"),
            nth_value(col("o_orderkey"), 3).over(w).as("third"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |  first_value(o_orderkey) OVER w AS cheapest,
             |  last_value(o_orderkey) OVER w AS dearest,
             |  nth_value(o_orderkey, 3) OVER w AS third
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),


    // RANGE frame (value-based, not row-based): peers within 1000 price
    // units backward — the frame every sliding-aggregate-over-values
    // query needs; count only (float sums over value frames would need
    // the decimal discipline AND identical peer grouping).
    "win_range_frame" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-1000L, 0L)
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            count(lit(1)).over(w).as("n_within_1000"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
             |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
             |                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
             |FROM orders ORDER BY o_orderpriority, o_orderkey""".stripMargin)),


    // Gaps-and-islands (runs of consecutive active days per user): the
    // classic streak operator — island anchor = day − row_number days,
    // one window + one grain aggregation, pure calendar-integer
    // arithmetic ⇒ fully oracled. The window partitions per user (the
    // per-actor contract every event key here uses), so no
    // single-partition hazard at scale.
    "win_gap_islands" -> QuerySpec(
      (s, d) => {
        val days = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        days
          .withColumn("_anchor", date_sub(col("day"), row_number().over(w)))
          .groupBy(col("user_id"), col("_anchor"))
          .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
            count(lit(1)).as("n_days"))
          .select(col("user_id"), col("start_day"), col("end_day"),
            col("n_days"))
          .orderBy(col("user_id"), col("start_day"))
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |anch AS (
             |  SELECT user_id, day,
             |    day - CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY day) AS INTEGER) AS anchor
             |  FROM days)
             |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
             |  CAST(count(*) AS BIGINT) AS n_days
             |FROM anch GROUP BY user_id, anchor
             |ORDER BY user_id, start_day""".stripMargin)),


    // Last-touch attribution (EventOps.lastTouchAttribution): every
    // purchase credited to the user's most recent click/view at or
    // before it in the (ts, event_id) total order; no-prior-touch
    // purchases keep NULL touch columns (the "direct" bucket as data).
    // ONE running-last window over ONE actor-grain shuffle — per-row
    // state is a single struct, never an event list; the identical
    // construction restates as last_value(… IGNORE NULLS) in SQL.
    "win_attribution_last_touch" -> QuerySpec(
      (s, d) => EventOps.lastTouchAttribution(
        t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        Seq("click", "view"), "purchase")
        .orderBy(col("conversion_id")),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             |    event_type,
             |    CASE WHEN event_type IN ('click', 'view')
             |      THEN struct_pack(t := CAST(ts AS TIMESTAMP),
             |        i := event_id, y := event_type) END AS touch
             |  FROM events WHERE user_id IS NOT NULL),
             |l AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    last_value(touch IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS lt
             |  FROM e)
             |SELECT user_id, event_id AS conversion_id,
             |  ts AS conversion_ts, lt.i AS touch_id, lt.t AS touch_ts,
             |  lt.y AS touch_type
             |FROM l WHERE event_type = 'purchase'
             |ORDER BY conversion_id""".stripMargin)),


    // Linear multi-touch attribution (EventOps.linearAttribution):
    // every touch before a conversion shares credit 1/n — the
    // equal-weight companion to last-touch. Per-channel running counts
    // over the ONE actor window; the credit sum Σ cnt·k/n folds a
    // SORTED bounded (k,n)-grain array (fixed IEEE chain — the one
    // double sum, never a row-order aggregate) ⇒ fully oracled. Total
    // credit conserves to the conversion count (959.0 + 952.0 + 70 =
    // 1981 at sf0.01 — the cross-channel invariant a report audits).
    "win_attribution_linear" -> QuerySpec(
      (s, d) => EventOps.linearAttribution(
        t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        Seq("click", "view"), "purchase"),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             |    event_type
             |  FROM events WHERE user_id IS NOT NULL),
             |c AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      OVER w AS k0,
             |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |      OVER w AS k1
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |conv AS (
             |  SELECT k0, k1, k0 + k1 AS n FROM c
             |  WHERE event_type = 'purchase'),
             |chan AS (
             |  SELECT 'click' AS channel, k0 AS k, n, count(*) AS cnt
             |  FROM conv WHERE n > 0 AND k0 > 0 GROUP BY 2, 3
             |  UNION ALL
             |  SELECT 'view', k1, n, count(*)
             |  FROM conv WHERE n > 0 AND k1 > 0 GROUP BY 2, 3),
             |folded AS (
             |  SELECT channel,
             |    CAST(SUM(cnt) AS BIGINT) AS n_conversions,
             |    CAST(SUM(cnt * k) AS BIGINT) AS n_credited_touches,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(CAST(cnt * k AS DOUBLE) / CAST(n AS DOUBLE)
             |        ORDER BY k, n, cnt)),
             |      (a, b) -> a + b) AS credit
             |  FROM chan GROUP BY 1),
             |direct AS (
             |  SELECT 'direct' AS channel,
             |    CAST(count(*) AS BIGINT) AS n_conversions,
             |    CAST(0 AS BIGINT) AS n_credited_touches,
             |    CAST(count(*) AS DOUBLE) AS credit
             |  FROM conv WHERE n = 0)
             |SELECT * FROM folded UNION ALL SELECT * FROM direct
             |ORDER BY channel""".stripMargin)),


    // MARKOV-CHAIN removal-effect attribution (EventOps
    // .markovRemovalAttribution) — the data-driven model that closes
    // the attribution family (last/linear/position are position
    // heuristics; this one measures each channel's causal leverage as
    // the absorbed-conversion mass that disappears when the channel's
    // transitions are removed). Everything is the pagerank
    // truncating-integer discipline: ppm transition probabilities
    // (n·10⁶ div total), 6 unrolled absorption rounds of
    // mass·ppm div 10⁶, and the share divides two EXACT integer deltas
    // — so the oracle replays all six rounds bit-for-bit as unrolled
    // CTEs over the identical journey construction.
    "win_attribution_markov" -> QuerySpec(
      (s, d) => EventOps.markovRemovalAttribution(
        t(s, d, "events"), "user_id", "event_id", "event_type",
        conversionType = "purchase", steps = 6),
      Some {
        val stepCtes = (1 to 6).map { i =>
          val prev = if (i == 1) "v0" else s"v${i - 1}"
          s"""v$i AS (
             |  SELECT v.removed, a.t2 AS st,
             |    CAST(SUM((v.m * a.ppm) // 1000000) AS BIGINT) AS m
             |  FROM $prev v
             |  JOIN adj a ON a.removed = v.removed AND a.f = v.st
             |  GROUP BY 1, 2)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (
           |  SELECT user_id, event_id, event_type FROM events
           |  WHERE user_id IS NOT NULL),
           |fp AS (SELECT user_id, min(event_id) AS pid FROM e
           |       WHERE event_type = 'purchase' GROUP BY 1),
           |j AS (
           |  SELECT e.user_id, e.event_id,
           |    CASE WHEN e.event_type = 'purchase' THEN '__conv'
           |         ELSE e.event_type END AS st
           |  FROM e LEFT JOIN fp USING (user_id)
           |  WHERE fp.pid IS NULL OR e.event_id <= fp.pid),
           |tr0 AS (
           |  SELECT
           |    COALESCE(lag(st) OVER (PARTITION BY user_id ORDER BY event_id),
           |      '__start') AS f,
           |    st AS t2,
           |    lead(st) OVER (PARTITION BY user_id ORDER BY event_id)
           |      IS NULL AS is_last
           |  FROM j),
           |alltr AS (
           |  SELECT f, t2 FROM tr0
           |  UNION ALL
           |  SELECT t2 AS f, '__null' AS t2 FROM tr0
           |  WHERE is_last AND t2 <> '__conv'),
           |cnt AS (SELECT f, t2, CAST(count(*) AS BIGINT) AS n
           |        FROM alltr GROUP BY 1, 2),
           |tt AS (SELECT f, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
           |p AS (SELECT cnt.f, cnt.t2, (cnt.n * 1000000) // tt.tot AS ppm
           |      FROM cnt JOIN tt USING (f)),
           |ch AS (SELECT DISTINCT f AS c FROM p WHERE f <> '__start'),
           |rdim AS (SELECT c FROM ch UNION ALL SELECT '__none'),
           |adj AS (
           |  SELECT r.c AS removed, p.f,
           |    CASE WHEN p.t2 = r.c THEN '__null' ELSE p.t2 END AS t2,
           |    CAST(SUM(p.ppm) AS BIGINT) AS ppm
           |  FROM p CROSS JOIN rdim r WHERE p.f <> r.c
           |  GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT c, '__conv', '__conv', 1000000 FROM rdim
           |  UNION ALL
           |  SELECT c, '__null', '__null', 1000000 FROM rdim),
           |v0 AS (SELECT c AS removed, '__start' AS st,
           |         CAST(1000000 AS BIGINT) AS m FROM rdim),
           |$stepCtes,
           |conv AS (SELECT removed, m FROM v6 WHERE st = '__conv'),
           |fl AS (SELECT CAST(COALESCE(SUM(m), 0) AS BIGINT) AS mf
           |       FROM conv WHERE removed = '__none'),
           |pc AS (
           |  SELECT ch.c AS channel, fl.mf AS conv_full_ppm,
           |    CAST(COALESCE(cv.m, 0) AS BIGINT) AS conv_removed_ppm,
           |    fl.mf - COALESCE(cv.m, 0) AS delta
           |  FROM ch LEFT JOIN conv cv ON cv.removed = ch.c CROSS JOIN fl),
           |td AS (SELECT CAST(SUM(delta) AS BIGINT) AS tdelta FROM pc)
           |SELECT channel, conv_full_ppm, conv_removed_ppm,
           |  CASE WHEN conv_full_ppm > 0 THEN
           |    CAST(delta AS DOUBLE) / CAST(conv_full_ppm AS DOUBLE)
           |  END AS removal_effect,
           |  CASE WHEN tdelta > 0 THEN
           |    CAST(delta AS DOUBLE) / CAST(tdelta AS DOUBLE)
           |  END AS share
           |FROM pc CROSS JOIN td ORDER BY channel""".stripMargin
      },
      allowBnlj = true),


    // EXACT Shapley-value attribution (EventOps.shapleyAttribution,
    // Shapley 1953 / Zhao et al. 2018) — the axiomatically fair split
    // the removal-effect model approximates, computable exactly here
    // because the channel universe is DECLARED and bounded (2⁴ = 16
    // subset rows; exact Shapley is exponential by definition). v(S) =
    // conversion rate of journeys touching EXACTLY set S (0 for
    // unobserved subsets — the standard practical convention); the
    // 2ⁿ⁻¹ coalition weights are driver-evaluated factorial ratios
    // inlined as IDENTICAL literals into both engines (the bhFdr
    // threshold pattern); each marginal term is a fixed IEEE chain and
    // φ folds terms SORTED BY SUBSET MASK. Undeclared channels
    // raise_error rather than silently vanish from every coalition.
    "win_attribution_shapley" -> QuerySpec(
      (s, d) => EventOps.shapleyAttribution(
        t(s, d, "events"), "user_id", "event_id", "event_type",
        conversionType = "purchase",
        channels = Seq("click", "error", "signup", "view")),
      Some {
        val wt = (0 until 4).map { sz =>
          s"($sz, CAST('${EventOps.shapleyWeight(sz, 4)}' AS DOUBLE))"
        }.mkString(", ")
        s"""WITH e AS (
           |  SELECT user_id, event_id, event_type FROM events
           |  WHERE user_id IS NOT NULL),
           |fp AS (SELECT user_id, min(event_id) AS pid FROM e
           |       WHERE event_type = 'purchase' GROUP BY 1),
           |j AS (
           |  SELECT e.user_id, e.event_type AS t
           |  FROM e LEFT JOIN fp USING (user_id)
           |  WHERE fp.pid IS NULL OR e.event_id <= fp.pid),
           |pa AS (
           |  SELECT user_id,
           |      MAX(CASE WHEN t = 'click'  THEN 1 ELSE 0 END)
           |    + MAX(CASE WHEN t = 'error'  THEN 2 ELSE 0 END)
           |    + MAX(CASE WHEN t = 'signup' THEN 4 ELSE 0 END)
           |    + MAX(CASE WHEN t = 'view'   THEN 8 ELSE 0 END) AS mask,
           |    MAX(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS conv
           |  FROM j GROUP BY 1),
           |st AS (
           |  SELECT mask, CAST(count(*) AS BIGINT) AS nj,
           |    CAST(SUM(conv) AS BIGINT) AS nc
           |  FROM pa GROUP BY 1),
           |lat AS (
           |  SELECT r.m,
           |    CASE WHEN st.nj > 0
           |      THEN CAST(st.nc AS DOUBLE) / CAST(st.nj AS DOUBLE)
           |      ELSE CAST(0.0 AS DOUBLE) END AS v
           |  FROM (SELECT unnest(range(0, 16)) AS m) r
           |  LEFT JOIN st ON st.mask = r.m),
           |ch(channel, bit) AS (VALUES
           |  ('click', 1), ('error', 2), ('signup', 4), ('view', 8)),
           |wt(s, w) AS (VALUES $wt),
           |terms AS (
           |  SELECT ch.channel, v0.m AS m0, wt.w * (v1.v - v0.v) AS term
           |  FROM ch
           |  JOIN lat v0 ON (v0.m & ch.bit) = 0
           |  JOIN lat v1 ON v1.m = v0.m + ch.bit
           |  JOIN wt ON wt.s = (v0.m & 1) + ((v0.m >> 1) & 1)
           |                  + ((v0.m >> 2) & 1) + ((v0.m >> 3) & 1))
           |SELECT channel,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |    list(term ORDER BY m0)), (a, b) -> a + b) AS shapley
           |FROM terms GROUP BY channel ORDER BY channel""".stripMargin
      },
      allowBnlj = true),


    // Position-based (U-shaped 40/20/40) attribution
    // (EventOps.positionAttribution): first/last touches take 0.4
    // each, the middle splits the rest — the introduction-AND-closing
    // model beside last-touch and linear. Same sorted-bounded-grain
    // exact fold; the middle weight restates as (1.0 - 0.4 - 0.4) in
    // BOTH engines (≠ the literal 0.2 by one ulp — measured class).
    "win_attribution_position" -> QuerySpec(
      (s, d) => EventOps.positionAttribution(
        t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        Seq("click", "view"), "purchase"),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             |    event_type,
             |    CASE WHEN event_type IN ('click', 'view')
             |      THEN event_type END AS touch
             |  FROM events WHERE user_id IS NOT NULL),
             |c AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    first_value(touch IGNORE NULLS) OVER w AS f,
             |    last_value(touch IGNORE NULLS) OVER w AS l,
             |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      OVER w AS k0,
             |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |      OVER w AS k1
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |conv AS (
             |  SELECT f, l, k0, k1, k0 + k1 AS n FROM c
             |  WHERE event_type = 'purchase'),
             |chan AS (
             |  SELECT 'click' AS channel,
             |    CASE WHEN f = 'click' THEN 1 ELSE 0 END AS fm,
             |    CASE WHEN l = 'click' THEN 1 ELSE 0 END AS lm,
             |    k0 AS k, n, count(*) AS cnt
             |  FROM conv WHERE n > 0 AND k0 > 0 GROUP BY 2, 3, 4, 5
             |  UNION ALL
             |  SELECT 'view', CASE WHEN f = 'view' THEN 1 ELSE 0 END,
             |    CASE WHEN l = 'view' THEN 1 ELSE 0 END, k1, n, count(*)
             |  FROM conv WHERE n > 0 AND k1 > 0 GROUP BY 2, 3, 4, 5),
             |folded AS (
             |  SELECT channel,
             |    CAST(SUM(cnt) AS BIGINT) AS n_conversions,
             |    CAST(SUM(cnt * fm) AS BIGINT) AS n_first,
             |    CAST(SUM(cnt * lm) AS BIGINT) AS n_last,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(CASE
             |        WHEN n = 1 THEN CAST(cnt AS DOUBLE) * CAST(fm AS DOUBLE)
             |        WHEN n = 2 THEN CAST(cnt AS DOUBLE)
             |          * (0.5 * CAST(fm AS DOUBLE) + 0.5 * CAST(lm AS DOUBLE))
             |        ELSE CAST(cnt AS DOUBLE)
             |          * (0.4 * CAST(fm AS DOUBLE) + 0.4 * CAST(lm AS DOUBLE)
             |            + (1.0 - 0.4 - 0.4)
             |              * (CAST(k AS DOUBLE) - CAST(fm AS DOUBLE)
             |                 - CAST(lm AS DOUBLE))
             |              / (CAST(n AS DOUBLE) - 2.0)) END
             |        ORDER BY fm, lm, k, n, cnt)),
             |      (a, b) -> a + b) AS credit
             |  FROM chan GROUP BY 1),
             |direct AS (
             |  SELECT 'direct' AS channel,
             |    CAST(count(*) AS BIGINT) AS n_conversions,
             |    CAST(0 AS BIGINT) AS n_first, CAST(0 AS BIGINT) AS n_last,
             |    CAST(count(*) AS DOUBLE) AS credit
             |  FROM conv WHERE n = 0)
             |SELECT * FROM folded UNION ALL SELECT * FROM direct
             |ORDER BY channel""".stripMargin)),


    // Distribution window functions: ntile/percent_rank/cume_dist over a
    // unique total order (o_totalprice ties broken by o_orderkey) so the
    // assigned buckets are engine-independent.
    "win_distribution" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),
  )
}
