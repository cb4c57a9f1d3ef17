package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Joins family of the operator catalog (16 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogJoins {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // --------------------------------------------------------------- joins
    // Multi-key equi join (README.md:737) — keyed on exact int types, not
    // the reference's float-coordinate keys (hazard §4.6).
    "join_inner_multikey" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val b = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        // (l_orderkey, l_linenumber) is not unique in the test data, so the
        // deterministic total order must cover every output column.
        a.join(b, Seq("l_orderkey", "l_linenumber"), "inner")
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
      },
      Some("""SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice
             |FROM lineitem a
             |JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice
             |      FROM lineitem WHERE l_returnflag = 'R') b
             |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
             |ORDER BY a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice""".stripMargin)),


    "join_cross" -> QuerySpec(
      (s, d) => t(s, d, "region")
        .crossJoin(t(s, d, "nation"))
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
        .orderBy(col("r_regionkey"), col("n_nationkey")),
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region CROSS JOIN nation
             |ORDER BY r_regionkey, n_nationkey""".stripMargin),
      allowBnlj = true),


    // NOT EXISTS upsert-dedup shape (README.md:1517-1526) as LeftAnti.
    "join_left_anti" -> QuerySpec(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "P")
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),


    "join_left_semi" -> QuerySpec(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),


    // Small-dim broadcast (the scale-critical join shape: fact ⋈ dims with
    // zero shuffle of the fact side).
    "join_broadcast" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val sup = t(s, d, "supplier")
        val nat = t(s, d, "nation")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),


    // SHUFFLE_HASH-hinted join: the third join strategy (after broadcast
    // and sort-merge) — right for mid-size sides too big to broadcast
    // where skipping both sort passes beats SMJ. Plan assert in PlanSpec.
    "join_shuffle_hash" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val ords = t(s, d, "orders").hint("shuffle_hash")
        li.join(ords, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),


    // Skew-salted join, oracled: the salted rewrite must return exactly
    // the rows of the plain join (DuckDB states the PLAIN join — the
    // salting is invisible in the result, which is the whole point).
    // The skew itself (90% of rows on one key) is manufactured in the
    // left side; JoinsSpec additionally covers left-join semantics.
    "join_salted" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
          .withColumn("skew_key",
            when(col("l_orderkey") % 10 =!= 0, lit(1L)).otherwise(col("l_orderkey")))
        val dim = t(s, d, "orders").filter(col("o_orderkey") < 400)
          .select(col("o_orderkey").as("skew_key"), col("o_orderpriority"))
        Joins.saltedJoin(li, dim, Seq("skew_key"), col("l_orderkey") * 10 + col("l_linenumber"), nSalts = 8)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH li AS (
             |  SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 1
             |              ELSE l_orderkey END AS skew_key, l_quantity
             |  FROM lineitem),
             |dim AS (SELECT o_orderkey AS skew_key, o_orderpriority
             |        FROM orders WHERE o_orderkey < 400)
             |SELECT o_orderpriority, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM li JOIN dim USING (skew_key)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),


    // Full outer join: matched rows + unmatched from BOTH sides (the only
    // §2.4 join type not yet oracled). Keys are never null in the data,
    // so every null below is produced by the outer join itself.
    "join_full_outer" -> QuerySpec(
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey"), col("c_name"))
        val ords = t(s, d, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(col("c_custkey"), col("c_name"), col("o_custkey"), col("n_orders"))
          .orderBy(col("c_custkey").asc_nulls_first, col("o_custkey").asc_nulls_first)
      },
      Some("""SELECT c.c_custkey, c.c_name, o.o_custkey, o.n_orders
             |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
             |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
             |                 FROM orders GROUP BY o_custkey) o
             |  ON c.c_custkey = o.o_custkey
             |ORDER BY c.c_custkey NULLS FIRST, o.o_custkey NULLS FIRST""".stripMargin)),


    // Range (interval) join — §2.4's one remaining absent join type. The
    // bucketed rewrite (Joins.rangeJoin) plans as an EQUI join + residual
    // filter instead of the BNLJ/Cartesian a naive non-equi join costs;
    // the plan-audit sweep enforces exactly that (join_range is NOT on
    // the BNLJ whitelist). Day arithmetic on both sides keeps the oracle
    // integer-exact.
    "join_range" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"),
            datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("ship_day"))
        val ords = t(s, d, "orders").filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"),
            datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("lo_day"))
          .withColumn("hi_day", col("lo_day") + 30)
        Joins.rangeJoin(li, ords, "ship_day", "lo_day", "hi_day", bucketWidth = 32)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_points"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o.o_orderkey, count(*) AS n_points
             |FROM (SELECT o_orderkey,
             |        (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS lo_day
             |      FROM orders WHERE o_orderkey % 100 = 0) o
             |JOIN (SELECT l_orderkey,
             |        (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS ship_day
             |      FROM lineitem) l
             |  ON l.ship_day BETWEEN o.lo_day AND o.lo_day + 30
             |GROUP BY 1 ORDER BY 1""".stripMargin)),


    // Interval-OVERLAP join (both sides intervals) — the bucketed rewrite
    // with positional first-shared-bucket dedup (Joins.intervalOverlapJoin)
    // plans as an equi join; each order contributes a [orderdate,
    // orderdate + key%20d] interval on the left and a 3-day-shifted
    // [.., + key%15d] one on the right, bounded per-customer-bucket so
    // the oracle's naive overlap join stays cheap at sf0.01.
    "join_interval_overlap" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "orders").filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"), (col("o_custkey") % 100).as("ek"),
            datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
        val a = base.select(col("o_orderkey").as("aid"), col("ek"),
          col("day").as("a_lo"), (col("day") + col("o_orderkey") % 20).as("a_hi"))
        val b = base.select(col("o_orderkey").as("bid"), col("ek"),
          (col("day") + 3).as("b_lo"),
          (col("day") + 3 + col("o_orderkey") % 15).as("b_hi"))
        Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
          bucketWidth = 16, equiKeys = Seq("ek"))
          .select(col("aid"), col("bid"))
          .orderBy(col("aid"), col("bid"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_custkey % 100 AS ek,
             |    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day
             |  FROM orders WHERE o_orderkey < 2000),
             |a AS (SELECT o_orderkey AS aid, ek, day AS a_lo,
             |        day + o_orderkey % 20 AS a_hi FROM base),
             |b AS (SELECT o_orderkey AS bid, ek, day + 3 AS b_lo,
             |        day + 3 + o_orderkey % 15 AS b_hi FROM base)
             |SELECT a.aid, b.bid
             |FROM a JOIN b ON a.ek = b.ek AND a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
             |ORDER BY aid, bid""".stripMargin)),


    // As-of join (extension): each event picks up the most recent prior
    // signup of the same user. Both sides truncated to whole seconds
    // (events.ts is ns in parquet, µs in Spark — the match boundary must
    // not depend on sub-µs digits), right side pre-aggregated to one row
    // per (user, second) so the match is well-defined.
    "join_asof" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"), col("value"))
        val sg = t(s, d, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("second", col("ts")).as("sg_ts"))
          .agg(min(col("value")).as("sg_value"))
        AsOfJoin.asOf(ev, sg, keys = Seq("user_id"),
          leftTs = "ts_s", rightTs = "sg_ts", rightValueCols = Seq("sg_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
             |  FROM events),
             |sg AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sg_ts,
             |    MIN(value) AS sg_value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_s, e.value,
             |  s.sg_ts AS matched_sg_ts, s.sg_value
             |FROM ev e ASOF LEFT JOIN sg s
             |  ON e.user_id = s.user_id AND e.ts_s >= s.sg_ts
             |ORDER BY e.event_id""".stripMargin)),


    // As-of join, FORWARD direction (round 13, the pandas merge_asof
    // surface): smallest right ts >= left ts — the next-scheduled
    // lookup (next maintenance window, next price reset). Same
    // tag-union-window cost envelope, the side order reversed so the
    // equal-timestamp match stays inclusive. DuckDB's ASOF JOIN takes
    // the direction from the inequality.
    "join_asof_forward" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"), col("value"))
        val sg = t(s, d, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("second", col("ts")).as("sg_ts"))
          .agg(min(col("value")).as("sg_value"))
        AsOfJoin.asOf(ev, sg, keys = Seq("user_id"),
          leftTs = "ts_s", rightTs = "sg_ts", rightValueCols = Seq("sg_value"),
          direction = "forward")
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
             |  FROM events),
             |sg AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sg_ts,
             |    MIN(value) AS sg_value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_s, e.value,
             |  s.sg_ts AS matched_sg_ts, s.sg_value
             |FROM ev e ASOF LEFT JOIN sg s
             |  ON e.user_id = s.user_id AND e.ts_s <= s.sg_ts
             |ORDER BY e.event_id""".stripMargin)),


    // As-of join, NEAREST direction: the closer of the backward and
    // forward matches, exact ties to BACKWARD (the pandas rule). Two
    // window sorts over one key exchange. DuckDB has no native nearest
    // — the oracle restates it as a correlated LATERAL argmin over
    // |epoch delta| with the backward-preference tie key, which
    // decorrelates to a per-key rank in both engines' planners.
    "join_asof_nearest" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"), col("value"))
        val sg = t(s, d, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("second", col("ts")).as("sg_ts"))
          .agg(min(col("value")).as("sg_value"))
        AsOfJoin.asOf(ev, sg, keys = Seq("user_id"),
          leftTs = "ts_s", rightTs = "sg_ts", rightValueCols = Seq("sg_value"),
          direction = "nearest")
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
             |  FROM events),
             |sg AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sg_ts,
             |    MIN(value) AS sg_value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_s, e.value,
             |  m.sg_ts AS matched_sg_ts, m.sg_value
             |FROM ev e LEFT JOIN LATERAL (
             |  SELECT s.sg_ts, s.sg_value FROM sg s
             |  WHERE s.user_id = e.user_id
             |  ORDER BY ABS(epoch(e.ts_s) - epoch(s.sg_ts)) ASC,
             |    CASE WHEN s.sg_ts <= e.ts_s THEN 0 ELSE 1 END ASC
             |  LIMIT 1) m ON TRUE
             |ORDER BY e.event_id""".stripMargin)),


    // As-of join with a STALENESS BOUND (toleranceSeconds): same match
    // as join_asof, but a signup more than 1 hour old is not "recent
    // enough" — the whole matched payload (timestamp AND value, never
    // a torn half) degrades to NULL. The guard every sensor/price
    // lookup needs; a post-window predicate, so the one-shuffle cost
    // envelope of the tag-union-window as-of is unchanged.
    "join_asof_tolerance" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"), col("value"))
        val sg = t(s, d, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("second", col("ts")).as("sg_ts"))
          .agg(min(col("value")).as("sg_value"))
        AsOfJoin.asOf(ev, sg, keys = Seq("user_id"),
          leftTs = "ts_s", rightTs = "sg_ts",
          rightValueCols = Seq("sg_value"),
          toleranceSeconds = Some(3600L))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
             |  FROM events),
             |sg AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sg_ts,
             |    MIN(value) AS sg_value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_s, e.value,
             |  CASE WHEN epoch_us(e.ts_s) - epoch_us(s.sg_ts) <= 3600000000
             |    THEN s.sg_ts END AS matched_sg_ts,
             |  CASE WHEN epoch_us(e.ts_s) - epoch_us(s.sg_ts) <= 3600000000
             |    THEN s.sg_value END AS sg_value
             |FROM ev e ASOF LEFT JOIN sg s
             |  ON e.user_id = s.user_id AND e.ts_s >= s.sg_ts
             |ORDER BY e.event_id""".stripMargin)),


    // NULL-safe equality join (<=> / IS NOT DISTINCT FROM): the join
    // variant where NULL keys MATCH each other — plain equi-join
    // silently drops them, the classic missing-dimension-key bug. Both
    // sides aggregate to the key grain FIRST (slim inputs; a raw
    // null-safe join would cross-product every NULL-key row pair), the
    // priority '1-URGENT' is mapped to NULL on both engines to make
    // the matched-NULL row observable. Ordering pins NULLS FIRST
    // explicitly — the engines' ASC defaults differ.
    "join_null_safe" -> QuerySpec(
      (s, d) => {
        val o = t(s, d, "orders")
        val key = nullif(col("o_orderpriority"), lit("1-URGENT")).as("pr")
        val a = o.groupBy(key).agg(count(lit(1)).as("n_all"))
        // distinct alias on the right key sidesteps self-join ambiguity
        // (both sides derive from the same scan)
        val b = o.filter(col("o_totalprice") > 150000)
          .groupBy(key).agg(count(lit(1)).as("n_big"))
          .withColumnRenamed("pr", "pr_b")
        a.join(b, col("pr") <=> col("pr_b"), "left")
          .select(col("pr"), col("n_all"),
            coalesce(col("n_big"), lit(0L)).as("n_big"))
          .orderBy(col("pr").asc_nulls_first)
      },
      Some("""WITH a AS (
             |  SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             |    count(*) AS n_all FROM orders GROUP BY 1),
             |b AS (
             |  SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             |    count(*) AS n_big FROM orders
             |  WHERE o_totalprice > 150000 GROUP BY 1)
             |SELECT a.pr, a.n_all, coalesce(b.n_big, 0) AS n_big
             |FROM a LEFT JOIN b ON a.pr IS NOT DISTINCT FROM b.pr
             |ORDER BY a.pr NULLS FIRST""".stripMargin)),


    // Existence-flag join (SELECT-list EXISTS — annotates instead of
    // filtering, which left_semi/left_anti cannot do): right side
    // reduced to distinct keys pre-join, so left rows never duplicate
    // and the join side stays broadcastable.
    "join_exists_flag" -> QuerySpec(
      (s, d) => Joins.withExistsFlag(
        t(s, d, "customer").select(col("c_custkey"), col("c_name")),
        t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), flagCol = "has_order")
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name,
             |  EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |    AS has_order
             |FROM customer c ORDER BY c_custkey""".stripMargin)),
  )
}
