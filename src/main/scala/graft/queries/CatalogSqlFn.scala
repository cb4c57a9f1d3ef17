package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** SqlFn family of the operator catalog (27 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogSqlFn {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // Entry point A (SURVEY.md §3.1): SQL text → parser → analyzer over a
    // registered view — the reference's Athena path. Same decimal-sum
    // discipline inside SQL.
    "sql_entry_q1" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem_sql")
        s.sql("""SELECT l_returnflag,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
                |FROM lineitem_sql GROUP BY l_returnflag
                |ORDER BY avg_qty DESC, l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY avg_qty DESC, l_returnflag""".stripMargin)),


    // Correlated scalar subquery (SQL analyzer surface): Catalyst rewrites
    // it to an aggregate + left outer join (RewriteCorrelatedScalarSubquery)
    // — the declarative form of a per-row lookup loop.
    "sql_scalar_subquery" -> QuerySpec(
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("cust_sq")
        t(s, d, "orders").createOrReplaceTempView("ord_sq")
        s.sql("""SELECT c_custkey, c_name,
                |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                |   FROM ord_sq o WHERE o.o_custkey = c.c_custkey) AS total_spend
                |FROM cust_sq c
                |WHERE c_acctbal > 7000
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name,
             |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             |   FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spend
             |FROM customer c
             |WHERE c_acctbal > 7000
             |ORDER BY c_custkey""".stripMargin)),


    // LATERAL correlated derived table (SQL analyzer surface): per
    // nation the top-2 customers by balance, stated as a lateral
    // subquery with ORDER BY + LIMIT — the SQL spelling of the top-k
    // per key pattern. Catalyst decorrelates it (DecorrelateInnerQuery
    // rewrites the correlated limit to a partitioned rank filter +
    // equi-join), so the declarative per-row loop never executes as
    // one: the plan is the same shuffle the DataFrame window form
    // produces. DuckDB runs the identical LATERAL clause natively.
    "sql_lateral_join" -> QuerySpec(
      (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("nation_lat")
        t(s, d, "customer").createOrReplaceTempView("customer_lat")
        s.sql("""SELECT n.n_name, c.c_name, c.c_acctbal
                |FROM nation_lat n,
                |LATERAL (SELECT c_name, c_acctbal FROM customer_lat
                |         WHERE c_nationkey = n.n_nationkey
                |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
                |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)
      },
      Some("""SELECT n.n_name, c.c_name, c.c_acctbal
             |FROM nation n,
             |LATERAL (SELECT c_name, c_acctbal FROM customer
             |         WHERE c_nationkey = n.n_nationkey
             |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
             |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)),


    // RECURSIVE CTE run natively by Spark (4.x) — until now WITH
    // RECURSIVE appeared only in this catalog's DuckDB oracles while
    // the Spark side unrolled iterations (graph_pagerank) or looped
    // with checkpoints (connectedComponents). This key states bounded
    // BFS reachability ONCE and runs the same text on both engines:
    // min-depth per (seed, node) over a deterministic 2-out-regular
    // edge list, depth ≤ 3. UNION ALL + depth guard keeps the
    // recursion finite with identical semantics everywhere; the final
    // min(depth) aggregate sits OUTSIDE the recursion (aggregates over
    // the recursive relation are the non-portable part). The iterative
    // operators keep their loop forms for scale (per-iteration
    // checkpoint barriers — GraphOps' seam — are not expressible
    // inside a recursive CTE), but the surface itself is now covered.
    "sql_recursive_cte" -> QuerySpec(
      (s, d) => {
        t(s, d, "documents").createOrReplaceTempView("docs_rec")
        s.sql(recursiveBfsSql("docs_rec"))
      },
      Some(recursiveBfsSql("documents"))),


    // Native MERGE INTO (round 11): the SQL statement a lakehouse user
    // types for the upsert the reference implements imperatively
    // (README.md:1517-1529's NOT-EXISTS insert is exactly
    // WHEN NOT MATCHED THEN INSERT). Target = a graft.sources
    // MergeableCatalog DSv2 table (SupportsRowLevelOperations +
    // SupportsDelta), so RewriteMergeIntoTable plans a native
    // WriteDelta of per-row actions — NOT a full-table overwrite
    // (plan-asserted in MergeIntoSpec, with UPDATE/DELETE statements
    // covered there too). Seed = even orderkeys; source = every third
    // orderkey with doubled price (updates where even∧div3, inserts
    // where odd∧div3). Deterministic: the key drops + recreates +
    // reseeds the target on every invocation.
    "sql_merge_into" -> QuerySpec(
      (s, d) => {
        s.conf.set("spark.sql.catalog.graftcat",
          "graft.sources.MergeableCatalog")
        s.sql("DROP TABLE IF EXISTS graftcat.merge_target")
        s.sql("""CREATE TABLE graftcat.merge_target (
                |  o_orderkey BIGINT NOT NULL, o_custkey BIGINT,
                |  o_totalprice DOUBLE, o_orderstatus STRING)
                |TBLPROPERTIES('rowid'='o_orderkey')""".stripMargin)
        t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
          .writeTo("graftcat.merge_target").append()
        t(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            (col("o_totalprice") * 2).as("o_totalprice"),
            lit("U").as("o_orderstatus"))
          .createOrReplaceTempView("graft_merge_src")
        s.sql("""MERGE INTO graftcat.merge_target t
                |USING graft_merge_src s ON t.o_orderkey = s.o_orderkey
                |WHEN MATCHED THEN UPDATE SET
                |  o_totalprice = s.o_totalprice,
                |  o_orderstatus = s.o_orderstatus
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        s.table("graftcat.merge_target").orderBy(col("o_orderkey"))
      },
      Some("""WITH tgt AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 2 = 0),
             |src AS (
             |  SELECT o_orderkey, o_custkey,
             |    o_totalprice * 2 AS o_totalprice, 'U' AS o_orderstatus
             |  FROM orders WHERE o_orderkey % 3 = 0)
             |SELECT t.o_orderkey, t.o_custkey,
             |  CASE WHEN s.o_orderkey IS NOT NULL
             |    THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
             |  CASE WHEN s.o_orderkey IS NOT NULL
             |    THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus
             |FROM tgt t LEFT JOIN src s ON s.o_orderkey = t.o_orderkey
             |UNION ALL
             |SELECT s.o_orderkey, s.o_custkey, s.o_totalprice, s.o_orderstatus
             |FROM src s
             |WHERE NOT EXISTS (SELECT 1 FROM tgt t
             |                  WHERE t.o_orderkey = s.o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),


    // UPDATE and DELETE statements over the same row-level DSv2 surface
    // (sql_merge_into's MergeableCatalog): both rewrite to per-row
    // WriteDelta actions — only matching rows travel to the writer.
    // One key exercises both statements in sequence on a freshly seeded
    // target; deterministic per invocation (drop + recreate + reseed).
    "sql_update_delete" -> QuerySpec(
      (s, d) => {
        s.conf.set("spark.sql.catalog.graftcat",
          "graft.sources.MergeableCatalog")
        s.sql("DROP TABLE IF EXISTS graftcat.upd_target")
        s.sql("""CREATE TABLE graftcat.upd_target (
                |  o_orderkey BIGINT NOT NULL, o_custkey BIGINT,
                |  o_totalprice DOUBLE, o_orderstatus STRING)
                |TBLPROPERTIES('rowid'='o_orderkey')""".stripMargin)
        t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
          .writeTo("graftcat.upd_target").append()
        s.sql("""UPDATE graftcat.upd_target
                |SET o_totalprice = o_totalprice + 100.0,
                |    o_orderstatus = 'U'
                |WHERE o_custkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftcat.upd_target WHERE o_orderstatus = 'F'")
        s.table("graftcat.upd_target").orderBy(col("o_orderkey"))
      },
      Some("""WITH seeded AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 2 = 0),
             |updated AS (
             |  SELECT o_orderkey, o_custkey,
             |    CASE WHEN o_custkey % 5 = 0
             |      THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice,
             |    CASE WHEN o_custkey % 5 = 0
             |      THEN 'U' ELSE o_orderstatus END AS o_orderstatus
             |  FROM seeded)
             |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |FROM updated WHERE o_orderstatus <> 'F'
             |ORDER BY o_orderkey""".stripMargin)),


    // INSERT OVERWRITE over the same DSv2 surface: the third write
    // statement the MergeableCatalog advertises (TableCapability
    // .TRUNCATE) — Spark plans it as truncate-then-append through
    // SupportsTruncate, with the truncation deferred to COMMIT (a
    // failed overwrite leaves the old rows). Seed = even orderkeys,
    // overwrite = every third orderkey with a flag status; the read
    // back must show ONLY the overwrite rows — any surviving seeded
    // even-key row means truncate() never reached the writer.
    "sql_insert_overwrite" -> QuerySpec(
      (s, d) => {
        s.conf.set("spark.sql.catalog.graftcat",
          "graft.sources.MergeableCatalog")
        s.sql("DROP TABLE IF EXISTS graftcat.ovw_target")
        s.sql("""CREATE TABLE graftcat.ovw_target (
                |  o_orderkey BIGINT NOT NULL, o_custkey BIGINT,
                |  o_totalprice DOUBLE, o_orderstatus STRING)
                |TBLPROPERTIES('rowid'='o_orderkey')""".stripMargin)
        t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
          .writeTo("graftcat.ovw_target").append()
        t(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), lit("O").as("o_orderstatus"))
          .createOrReplaceTempView("graft_ovw_src")
        s.sql("""INSERT OVERWRITE graftcat.ovw_target
                |SELECT * FROM graft_ovw_src""".stripMargin)
        s.table("graftcat.ovw_target").orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             |  'O' AS o_orderstatus
             |FROM orders WHERE o_orderkey % 3 = 0
             |ORDER BY o_orderkey""".stripMargin)),


    // SQL PIVOT clause (agg_pivot's DataFrame twin through the PARSER
    // surface): one Spark SQL statement with an explicit IN list —
    // Catalyst rewrites it to the same pivot aggregate the DataFrame
    // API plans; the oracle restates with FILTER aggregates. Sums ride
    // the DECIMAL(18,6) accumulator (the no-raw-double-sums rule).
    "sql_pivot_clause" -> QuerySpec(
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("graft_pivot_ev")
        s.sql(
          """SELECT * FROM (
            |  SELECT user_id % 100 AS cohort, event_type,
            |    CAST(value AS DECIMAL(18,6)) AS v
            |  FROM graft_pivot_ev)
            |PIVOT (CAST(SUM(v) AS DOUBLE)
            |  FOR event_type IN ('click' AS click, 'purchase' AS purchase,
            |                     'view' AS view))
            |ORDER BY cohort""".stripMargin)
      },
      Some("""SELECT user_id % 100 AS cohort,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
             |    FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
             |    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
             |    FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
             |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin)),


    // GROUP BY ALL (SQL surface): the analyzer infers the grouping set
    // from the non-aggregate select items — the spelling analysts
    // actually type against wide tables. Identical text runs on both
    // engines; the plan is the same partial-agg + exchange as the
    // explicit GROUP BY.
    "sql_group_by_all" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_gba")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                |  COUNT(*) AS n
                |FROM li_gba GROUP BY ALL
                |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY ALL
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),


    // SQL-defined scalar function (Spark 4 SQL UDF surface): CREATE
    // TEMPORARY FUNCTION ... RETURN <expr> — the catalog-resident
    // business-logic spelling. The body is pure SQL, so the analyzer
    // INLINES it into the plan (no black-box UDF, codegen intact —
    // .explain shows plain arithmetic, the opposite of a Scala UDF);
    // the oracle states the inlined expression directly.
    "sql_udf_scalar" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_udf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
                |  p DOUBLE, disc DOUBLE) RETURNS DOUBLE
                |RETURN p * (1.0 - disc)""".stripMargin)
        s.sql("""SELECT l_returnflag,
                |  CAST(SUM(CAST(graft_disc_price(l_extendedprice, l_discount)
                |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
                |FROM li_udf GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),


    // Session variables + EXECUTE IMMEDIATE (Spark 4 scripting
    // surface): DECLARE a typed session variable, SET it, and bind it
    // as a ? parameter of a dynamically-composed statement — the
    // orchestration idiom (thresholds/table names resolved at run
    // time) stated natively instead of via string interpolation in the
    // driver. The oracle inlines the bound value.
    // SQL pipe syntax (Spark 4.1 `|>` operators, round 13): the
    // linear-dataflow spelling of filter → derive → aggregate →
    // project → order — each stage reads top-to-bottom the way the
    // plan executes, instead of SQL's inside-out nesting. Parses to
    // the SAME logical plan as the nested form (the probe plan is one
    // scan → partial/final agg → sort); DuckDB restates it as plain
    // ANSI. Revenue stays exact DECIMAL end-to-end (the (18,4)×(19,4)
    // product is DECIMAL(38,8) with no scale loss) so the sum is
    // order-independent.
    "sql_pipe_syntax" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_pipe")
        s.sql("""FROM li_pipe
                ||> WHERE l_quantity > 10
                ||> EXTEND CAST(l_extendedprice AS DECIMAL(18,4))
                |     * (1 - CAST(l_discount AS DECIMAL(18,4))) AS revenue
                ||> AGGREGATE COUNT(*) AS n,
                |     CAST(SUM(revenue) AS DECIMAL(18,4)) AS total_revenue
                |   GROUP BY l_returnflag, l_linestatus
                ||> SELECT l_returnflag, l_linestatus, n, total_revenue
                ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             |    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4))
             |    AS total_revenue
             |FROM lineitem WHERE l_quantity > 10
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),


    // TABLESAMPLE, the oracle-able spelling (round 13): engine-native
    // BERNOULLI sampling draws from engine-specific RNG streams — the
    // same query on Spark and DuckDB keeps DIFFERENT rows, so the
    // cross-engine key states the Bernoulli draw explicitly with the
    // portable 31-bit LCG (SampleOps.portableUniform's integer
    // arithmetic, evaluable bit-identically by any engine) as a WHERE
    // predicate: keep ⇔ lcg(o_orderkey) < p·2³¹. Exact for
    // |key·a| < 2⁶³ (keys to ~8.3e9). The NATIVE clause — TABLESAMPLE
    // (50 PERCENT) REPEATABLE(seed) — is unit-covered in
    // EngineSurfaceSpec (bounds + seed determinism + Sample node).
    // Round-15 hardening (3rd-gate driver red): the key's POINT is the
    // portable Bernoulli predicate (the sampling lever the reference
    // pulls for scan reduction, README.md:801), so every
    // engine-discretionary surface is gone from the payload:
    //  - the threshold is the inlined integer literal 322122547
    //    (= floor(0.15 * 2^31)), removing the decimal-literal binding
    //    path (`CAST(0.15 * 2147483648 AS BIGINT)`) — the exact class
    //    the profile_power trap pinned (engines may bind `0.15` as
    //    DECIMAL or DOUBLE with different multiply/round semantics);
    //  - the price payload is exact-integer BIGINT (SUM(o_orderkey), a
    //    value-set fingerprint of the kept rows) — no double→DECIMAL
    //    quantizing cast anywhere, on either engine.
    // NOTE rows_match is VACUOUS for this key: o_orderpriority has
    // exactly 5 values, so both engines emit 5 rows under ANY predicate
    // divergence; only the integer payloads settle it.
    "sql_tablesample_portable" -> QuerySpec(
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("ord_ts")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
                |  SUM(CAST(o_orderkey AS BIGINT)) AS sum_okey
                |FROM ord_ts
                |WHERE (o_orderkey * 1103515245 + 12345) % 2147483648
                |      < 322122547
                |GROUP BY o_orderpriority
                |ORDER BY o_orderpriority""".stripMargin)
      },
      // Oracle: identical text modulo DuckDB's SUM(BIGINT)→HUGEINT
      // widening, bridged back with an outer CAST (the
      // sql_distribute_cluster pattern that greened that key).
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_okey
             |FROM orders
             |WHERE (o_orderkey * 1103515245 + 12345) % 2147483648
             |      < 322122547
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),


    // DISTRIBUTE BY / CLUSTER BY (round 13): the SQL spelling of
    // repartition-before-consume. The POINT is the plan, not the rows
    // (the clauses never change values — the oracle is the bare
    // aggregate): CLUSTER BY's hashpartitioning exchange SATISFIES the
    // downstream aggregation's distribution requirement, so the agg
    // plans partial+final over the SAME exchange — exactly one hash
    // exchange in the plan (probed; EngineSurfaceSpec asserts it, plus
    // the DISTRIBUTE BY + SORT BY partition-local sort shape). That
    // pre-shuffle reuse is the production pattern for feeding several
    // same-keyed consumers one exchange.
    "sql_distribute_cluster" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_dc")
        // l_quantity is integer-valued: sum as BIGINT — exact in both
        // engines, no quantizing double->decimal cast anywhere (the
        // r13 driver-red root cause; see the tablesample oracle note).
        s.sql("""SELECT l_returnflag, COUNT(*) AS n,
                |  SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
                |FROM (SELECT * FROM li_dc CLUSTER BY l_returnflag)
                |GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),


    "sql_session_variable" -> QuerySpec(
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("cust_var")
        s.sql("DECLARE OR REPLACE VARIABLE graft_bal_floor DOUBLE DEFAULT 7000.0")
        s.sql("SET VAR graft_bal_floor = 8000.0")
        s.sql("""EXECUTE IMMEDIATE
                |  'SELECT c_custkey, c_name, c_acctbal FROM cust_var
                |   WHERE c_acctbal > ? ORDER BY c_custkey'
                |  USING graft_bal_floor""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE c_acctbal > 8000.0 ORDER BY c_custkey""".stripMargin)),


    // SQL-defined TABLE function (Spark 4): CREATE FUNCTION ... RETURNS
    // TABLE(...) — the parameterized-view spelling; invoked CORRELATED
    // through LATERAL, so the analyzer inlines the body and
    // decorrelates the parameter equality to a plain equi-join — never
    // a per-row loop. The body is a pure correlated filter: a
    // correlated ORDER BY+LIMIT body does NOT decorrelate per-caller
    // today (measured: the limit escapes the correlation and applies
    // once, globally — 3 rows instead of per-nation top-3), so top-k
    // per key through a TVF stays out; sql_lateral_join covers that
    // shape with an inline LATERAL subquery, where the rewrite IS
    // correct. DuckDB restates the inlined join directly.
    "sql_udf_table" -> QuerySpec(
      (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("nat_tvf")
        t(s, d, "customer").createOrReplaceTempView("cust_tvf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_rich_customers(
                |  nk BIGINT, floor_bal DOUBLE)
                |RETURNS TABLE(c_name STRING, c_acctbal DOUBLE)
                |RETURN SELECT c_name, c_acctbal FROM cust_tvf
                |       WHERE c_nationkey = nk AND c_acctbal > floor_bal""".stripMargin)
        s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
                |FROM nat_tvf n,
                |LATERAL graft_rich_customers(n.n_nationkey, 8000.0) t
                |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
      },
      Some("""SELECT n.n_name, c.c_name, c.c_acctbal
             |FROM nation n JOIN customer c
             |  ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 8000.0
             |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)),


    // Error-safe TRY_* arithmetic (the ANSI-mode companion surface: the
    // engine runs ANSI, where bare division-by-zero/overflow ABORT a
    // 100 TB job at task 9,999 of 10,000 — try_ variants turn the
    // poison row into a NULL the pipeline can quarantine). The oracle
    // restates each as its guard: NULLIF denominators, range CASEs.
    "fn_try_arithmetic" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(l_extendedprice, l_linenumber - 1)").as("div_maybe"),
          expr("try_multiply(l_orderkey, 9000000000000000000L)").as("mul_over"),
          expr("try_add(l_quantity, l_discount)").as("add_ok"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice / NULLIF(l_linenumber - 1, 0) AS div_maybe,
             |  CASE WHEN l_orderkey = 0 THEN CAST(0 AS BIGINT)
             |       WHEN l_orderkey <= 1 THEN CAST(l_orderkey * 9000000000000000000 AS BIGINT)
             |  END AS mul_over,
             |  l_quantity + l_discount AS add_ok
             |FROM lineitem WHERE l_orderkey < 200
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),


    // Exact percentile (sort + linear interpolation in both engines).
    "fn_percentile" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.9) AS p90_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),


    // Scalar-function battery (SURVEY.md §2.9): concat/format_string/
    // substring/upper/regexp_extract/to_date/year/datediff/round in one
    // projection. round is HALF_UP in both engines for doubles (probed).
    "fn_string_date" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .withColumn("odate", col("o_orderdate").cast(DateType))
        .select(
          col("o_orderkey"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
          format_string("ord-%05d", col("o_orderkey")).as("padded"),
          upper(substring(col("o_orderpriority"), 3, 20)).as("prio"),
          regexp_extract(col("o_orderpriority"), "^(\\d+)-", 1).cast(IntegerType).as("prio_num"),
          col("odate"),
          year(col("odate")).as("o_year"),
          datediff(lit("1999-01-01").cast(DateType), col("odate")).as("days_to_99"),
          // round on DECIMAL, not double: Spark rounds a double's shortest
          // decimal repr while DuckDB rounds the binary value, so
          // round(x/100.0, 2) diverges on .xx5 boundaries. Casting to an
          // exact DECIMAL first makes HALF_UP identical in both engines.
          round(col("o_totalprice").cast(DecimalType(18, 2)), 1)
            .cast(DoubleType).as("price_r"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  o_orderstatus || '-' || o_orderpriority AS tag,
             |  printf('ord-%05d', o_orderkey) AS padded,
             |  upper(substr(o_orderpriority, 3)) AS prio,
             |  CAST(regexp_extract(o_orderpriority, '^(\d+)-', 1) AS INTEGER) AS prio_num,
             |  CAST(o_orderdate AS DATE) AS odate,
             |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to_99,
             |  CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r
             |FROM orders ORDER BY o_orderkey""".stripMargin)),


    // Unpivot/melt (wide → long): the Dataset.unpivot API; oracle is the
    // equivalent UNION ALL.
    "fn_unpivot" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_custkey").cast(DoubleType).as("custkey_d"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("o_totalprice"), col("custkey_d")), "var", "val")
        .orderBy(col("o_orderkey"), col("var")),
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, 'o_totalprice' AS var, o_totalprice AS val FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, 'custkey_d' AS var, CAST(o_custkey AS DOUBLE) AS val FROM orders)
             |ORDER BY o_orderkey, var""".stripMargin)),


    // Custom Catalyst GENERATOR (UDTF shape): positional bigrams stream
    // lazily out of eval — no intermediate shingle array per document.
    // Short docs would hit the ShingleArray fewer-than-n convention;
    // the fixture's documents all have ≥ 2 tokens, so the oracle can
    // state the plain windowed form.
    "fn_ngram_generate" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        t(s, d, "documents").filter(col("doc_id") < 50)
          .select(col("doc_id"),
            call_function("ngram_generate",
              split(lower(col("text")), "\\s+"), lit(2)))
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 50)
             |SELECT doc_id, CAST(x.pos AS INTEGER) AS pos, x.ngram AS ngram
             |FROM (
             |  SELECT doc_id,
             |    unnest([{'pos': i - 1, 'ngram': w[i] || ' ' || w[i+1]}
             |      for i in range(1, len(w))]) AS x
             |  FROM w)
             |ORDER BY doc_id, pos""".stripMargin)),


    // Edit distance (dedup-adjacent string similarity) — identical DP
    // definition in both engines; exercised on the short `source` column.
    "fn_levenshtein" -> QuerySpec(
      (s, d) => {
        val a = t(s, d, "documents").filter(col("doc_id") < 20)
          .select(col("doc_id").as("id_a"), col("source").as("src_a"))
        val b = t(s, d, "documents").filter(col("doc_id") < 20)
          .select(col("doc_id").as("id_b"), col("source").as("src_b"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("src_a"), col("src_b")).as("dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(levenshtein(a.source, b.source) AS INTEGER) AS dist
             |FROM documents a, documents b
             |WHERE a.doc_id < 20 AND b.doc_id < 20 AND a.doc_id < b.doc_id
             |ORDER BY id_a, id_b""".stripMargin),
      allowBnlj = true),


    // ----------------------------------------------------- scalar functions
    "fn_from_json" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"), new StructType().add("k", IntegerType))
            .getField("k").as("k"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k2"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER) AS k,
             |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER) AS k2
             |FROM events ORDER BY event_id""".stripMargin)),


    // VARIANT semi-structured type (Spark 4): parse_json into the
    // binary variant encoding once, then typed variant_get path
    // extraction — the open-schema ingestion shape that replaces
    // per-field get_json_object re-parses (one parse, O(1) typed
    // reads; at 100 TB the N-field × re-parse difference is the whole
    // scan cost). The JSON is BUILT deterministically from orders on
    // both engines, so every extracted value is oracled; VARIANT
    // itself never reaches the output schema (typed BIGINT / VARCHAR /
    // DOUBLE presentation — the CatalogSchemaSpec rule), and DuckDB
    // reads the same paths with json_extract.
    "fn_variant_json" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), concat(
          lit("{\"k\":"), col("o_orderkey").cast(StringType),
          lit(",\"s\":\""), col("o_orderstatus"),
          lit("\",\"p\":"), col("o_totalprice").cast(StringType),
          lit(",\"tags\":[\""), col("o_orderpriority"), lit("\"]}")).as("_j"))
        .select(col("o_orderkey"), parse_json(col("_j")).as("_v"))
        .select(col("o_orderkey"),
          expr("variant_get(_v, '$.k', 'bigint')").as("k"),
          expr("variant_get(_v, '$.s', 'string')").as("s"),
          expr("variant_get(_v, '$.p', 'double')").as("p"),
          expr("variant_get(_v, '$.tags[0]', 'string')").as("tag0"))
        .orderBy(col("o_orderkey")),
      Some("""WITH src AS (
             |  SELECT o_orderkey,
             |    '{"k":' || CAST(o_orderkey AS VARCHAR) ||
             |    ',"s":"' || o_orderstatus ||
             |    '","p":' || CAST(o_totalprice AS VARCHAR) ||
             |    ',"tags":["' || o_orderpriority || '"]}' AS j
             |  FROM orders)
             |SELECT o_orderkey,
             |  CAST(json_extract(j, '$.k') AS BIGINT) AS k,
             |  json_extract_string(j, '$.s') AS s,
             |  CAST(json_extract(j, '$.p') AS DOUBLE) AS p,
             |  json_extract_string(j, '$.tags[0]') AS tag0
             |FROM src ORDER BY o_orderkey""".stripMargin)),


    // from_xml scalar parsing (the function companion to scan_xml's
    // source): deterministic per-row XML built from orders, parsed
    // with an explicit struct schema, fields surfaced typed. The
    // oracle re-extracts the same fields with regexes (DuckDB has no
    // XML parser — text extraction is exactly what it CAN restate).
    "fn_from_xml" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), concat(
          lit("<o><key>"), col("o_orderkey").cast(StringType),
          lit("</key><status>"), col("o_orderstatus"),
          lit("</status></o>")).as("_x"))
        .select(col("o_orderkey"),
          expr("from_xml(_x, 'key BIGINT, status STRING')").as("_p"))
        .select(col("o_orderkey"),
          col("_p.key").as("key"), col("_p.status").as("status"))
        .orderBy(col("o_orderkey")),
      Some("""WITH src AS (
             |  SELECT o_orderkey,
             |    '<o><key>' || CAST(o_orderkey AS VARCHAR) || '</key><status>'
             |      || o_orderstatus || '</status></o>' AS x
             |  FROM orders)
             |SELECT o_orderkey,
             |  CAST(regexp_extract(x, '<key>(-?\d+)</key>', 1) AS BIGINT) AS key,
             |  regexp_extract(x, '<status>([^<]*)</status>', 1) AS status
             |FROM src ORDER BY o_orderkey""".stripMargin)),


    // Collation-aware grouping (Spark 4 collations): group mixed-case
    // keys under UTF8_LCASE so equality itself is case-insensitive —
    // the engine-level form of the lower()-normalize idiom (no
    // expression wraps the grouping column, so statistics and
    // partition pruning on the original column survive). Mixed case is
    // synthesized deterministically (even keys lowered), the group
    // REPRESENTATIVE is an arbitrary member under case-insensitive
    // equality, so the output key is re-normalized with lower() and
    // cast back to a binary-collated string (collated types stay
    // internal — the presentation rule). DuckDB states the same query
    // as lower() grouping.
    "fn_collation_group" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(when(pmod(col("o_orderkey"), lit(2)) === 0,
            lower(col("o_orderpriority")))
          .otherwise(col("o_orderpriority")).as("pr"))
        .groupBy(expr("collate(pr, 'UTF8_LCASE')").as("_k"))
        .agg(count(lit(1)).as("n_orders"))
        .select(lower(col("_k")).cast(StringType).as("priority"),
          col("n_orders"))
        .orderBy(col("priority")),
      Some("""SELECT lower(pr) AS priority,
             |  CAST(count(*) AS BIGINT) AS n_orders
             |FROM (
             |  SELECT CASE WHEN o_orderkey % 2 = 0
             |    THEN lower(o_orderpriority) ELSE o_orderpriority END AS pr
             |  FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),


    // Array higher-order functions (transform/filter/exists/aggregate)
    // over integer-quantized arrays — engine-exact folds.
    "fn_array_hof" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(floor(col("l_quantity")).cast(LongType))).as("arr"))
        .select(col("l_orderkey"),
          size(filter(col("arr"), x => x > 25)).as("n_big"),
          aggregate(col("arr"), lit(0L), (a, x) => a + x).as("total_qty"),
          exists(col("arr"), x => x === 50L).as("has_50"),
          size(transform(col("arr"), x => x * 2)).as("n_doubled"))
        .orderBy(col("l_orderkey")),
      Some("""WITH a AS (
             |  SELECT l_orderkey,
             |    list_sort(list(CAST(FLOOR(l_quantity) AS BIGINT))) AS arr
             |  FROM lineitem GROUP BY l_orderkey)
             |SELECT l_orderkey,
             |  CAST(len(list_filter(arr, x -> x > 25)) AS INTEGER) AS n_big,
             |  CAST(list_sum(arr) AS BIGINT) AS total_qty,
             |  len(list_filter(arr, x -> x = 50)) > 0 AS has_50,
             |  CAST(len(list_transform(arr, x -> x * 2)) AS INTEGER) AS n_doubled
             |FROM a ORDER BY l_orderkey""".stripMargin)),


    // MapType surface: parse the JSON props column as a map, look up and
    // count keys (oracle recovers the same facts with regexes).
    "fn_map" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          size(map_keys(col("m"))).as("n_keys"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER) AS k_val,
             |  CAST(len(regexp_extract_all(props, '"[^"]+":')) AS INTEGER) AS n_keys
             |FROM events ORDER BY event_id""".stripMargin)),
  )
}
