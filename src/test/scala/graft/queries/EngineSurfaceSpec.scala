package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics units for the round-10 engine-surface keys (bitmap
  * distinct, VARIANT, collations, LATERAL, recursive CTE, native XML).
  * The oracle gate proves cross-engine value equality; these pin the
  * properties the oracle can't see — merge exactness, plan shape,
  * escaping round trips, null discipline. */
class EngineSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bitmap distinct: exact per group AND the or-merged union, overlapping keys") {
    // groups share values 1..4 / 3..6: union 1..6 (= 6) < 4 + 4 — a sum
    // of per-group counts would be 8, so a passing ALL row proves the
    // bitmaps really merged rather than added
    val df = (Seq.tabulate(8)(i => ("a", (i % 4) + 1L)) ++
      Seq.tabulate(8)(i => ("b", (i % 4) + 3L))).toDF("grp", "v")
    df.createOrReplaceTempView("bm_t")
    val buckets = spark.sql("""
      SELECT grp, bitmap_bucket_number(v) b,
        bitmap_construct_agg(bitmap_bit_position(v)) bm
      FROM bm_t GROUP BY 1, 2""")
    buckets.createOrReplaceTempView("bm_b")
    val per = spark.sql(
      "SELECT grp, sum(bitmap_count(bm)) n FROM bm_b GROUP BY 1")
      .as[(String, Long)].collect().toMap
    assert(per == Map("a" -> 4L, "b" -> 4L), per.toString)
    val all = spark.sql("""
      SELECT sum(bitmap_count(bm)) FROM (
        SELECT b, bitmap_or_agg(bm) bm FROM bm_b GROUP BY 1)""")
      .as[Long].head()
    assert(all == 6L, s"or-merged union must dedup across groups, got $all")
    // values spanning several 32768-bit buckets still count exactly
    val wide = Seq(1L, 2L, 40000L, 70000L, 40000L).toDF("v")
    wide.createOrReplaceTempView("bm_w")
    val n = spark.sql("""SELECT sum(bitmap_count(bm)) FROM (
      SELECT bitmap_construct_agg(bitmap_bit_position(v)) bm
      FROM bm_w GROUP BY bitmap_bucket_number(v))""").as[Long].head()
    assert(n == 4L, s"cross-bucket distinct, got $n")
  }

  test("sql_lateral_join decorrelates: no nested-loop per-row execution") {
    val df = Catalog.specs("sql_lateral_join").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // the correlated ORDER BY + LIMIT 2 must come back as a bounded
    // per-key rank, not a global sort of customers
    assert(plan.contains("Window") || plan.contains("TopK"), plan)
    // and the per-nation cap actually binds
    val counts = df.groupBy(col("n_name")).count().as[(String, Long)].collect()
    assert(counts.nonEmpty && counts.forall(_._2 <= 2), counts.mkString(","))
  }

  test("sql_recursive_cte: seeds at depth 0, min-depth semantics, bounded frontier") {
    val rows = Catalog.specs("sql_recursive_cte").fn(spark, sf)
      .as[(Long, Long, Long)].collect()
    val bySeed = rows.groupBy(_._1)
    assert(bySeed.keySet == (0L until 20L).toSet, bySeed.keySet.toString)
    // every seed reaches itself at depth 0, one row per (seed, node)
    assert(rows.filter(r => r._1 == r._2 && r._3 == 0L).length == 20)
    assert(rows.length == rows.map(r => (r._1, r._2)).distinct.length)
    assert(rows.forall(r => r._3 >= 0L && r._3 <= 3L))
    // 2-out-regular graph: reachable set per seed ≤ 1+2+4+8
    assert(bySeed.values.forall(_.length <= 15))
  }

  test("XML round trip preserves markup-hostile strings (escaping)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val rows = Seq((1L, "a & b < c > d"), (2L, "quote \" apos ' end"),
      (3L, "two\nlines"), (4L, "<tag>not markup</tag>"))
    rows.toDF("id", "s").write.mode("overwrite")
      .option("rowTag", "row").format("xml").save(dir)
    val back = spark.read.schema("id LONG, s STRING")
      .option("rowTag", "row").format("xml").load(dir)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == rows, back.toString)
  }

  test("variant extraction: missing path and type mismatch are NULL, not errors") {
    val out = spark.sql("""SELECT
      variant_get(parse_json('{"a":1}'), '$.missing', 'bigint') m,
      try_variant_get(parse_json('{"a":"str"}'), '$.a', 'bigint') w""")
      .as[(Option[Long], Option[Long])].head()
    assert(out == ((None, None)), out.toString)
  }

  test("collation grouping: UTF8_LCASE equality collapses case variants exactly") {
    val df = Seq("URGENT", "urgent", "Urgent", "LOW").toDF("s")
    df.createOrReplaceTempView("coll_t")
    val g = spark.sql("""SELECT lower(collate(s, 'UTF8_LCASE')) k, count(*) n
      FROM coll_t GROUP BY collate(s, 'UTF8_LCASE')""")
      .as[(String, Long)].collect().toMap
    assert(g == Map("urgent" -> 3L, "low" -> 1L), g.toString)
    // the catalog key presents a BINARY-collated string (collated types
    // never reach an output schema — the CatalogSchemaSpec rule)
    val key = Catalog.specs("fn_collation_group").fn(spark, sf)
    val f = key.schema("priority")
    assert(f.dataType == org.apache.spark.sql.types.StringType &&
      f.dataType.sql == "STRING", f.dataType.toString)
  }

  test("native TABLESAMPLE: seed-deterministic, bounded, a real Sample node") {
    // the oracled key (sql_tablesample_portable) states the Bernoulli
    // draw with the portable LCG; THIS covers the native clause the
    // key's comment defers here — REPEATABLE(seed) must reproduce the
    // same subset, the rate must land in a sane band, and the plan must
    // carry a Sample operator (not a silent full scan)
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("ts_ord")
    val total = spark.sql("SELECT count(*) n FROM ts_ord").head().getLong(0)
    def draw() = spark.sql(
      "SELECT count(*) n FROM ts_ord TABLESAMPLE (50 PERCENT) REPEATABLE (7)")
    val n1 = draw().head().getLong(0)
    val n2 = draw().head().getLong(0)
    assert(n1 == n2, s"REPEATABLE(7) drew $n1 then $n2")
    assert(n1 > total / 4 && n1 < total * 3 / 4, s"$n1 of $total")
    val other = spark.sql(
      "SELECT count(*) n FROM ts_ord TABLESAMPLE (50 PERCENT) REPEATABLE (11)")
      .head().getLong(0)
    assert(other != n1 || total == 0, "different seeds drew identical subsets")
    assert(draw().queryExecution.executedPlan.toString.contains("Sample"),
      draw().queryExecution.executedPlan.toString.take(1000))
  }

  test("CLUSTER BY exchange satisfies the downstream aggregation: one hash exchange") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("dc_li")
    val agg = spark.sql("""SELECT l_returnflag, count(*) n FROM (
      SELECT * FROM dc_li CLUSTER BY l_returnflag)
      GROUP BY l_returnflag ORDER BY l_returnflag""")
    agg.collect() // finalize AQE
    val plan = agg.queryExecution.executedPlan.toString
    val nHash = "hashpartitioning".r.findAllIn(
      plan.split("== Initial Plan ==")(0)).size
    assert(nHash == 1,
      s"expected the CLUSTER BY exchange to be the ONLY hash exchange, got $nHash:\n$plan")
    // DISTRIBUTE BY + SORT BY: partition-local sort (global=false) over
    // a hash exchange — the clause pair that pre-lays-out data for
    // several same-keyed consumers without a global order barrier
    val ds = spark.sql("""SELECT l_orderkey, l_returnflag FROM dc_li
      DISTRIBUTE BY l_returnflag SORT BY l_returnflag, l_orderkey""")
    val dsPlan = ds.queryExecution.executedPlan.toString
    assert(dsPlan.contains("hashpartitioning"), dsPlan.take(1000))
    assert("Sort \\[.*\\], false".r.findFirstIn(dsPlan).isDefined,
      s"expected a partition-local sort:\n${dsPlan.take(1000)}")
  }

  test("pipe syntax parses to the same plan as the nested ANSI form") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("pipe_li")
    val piped = spark.sql("""FROM pipe_li
      |> WHERE l_quantity > 10
      |> AGGREGATE count(*) AS n GROUP BY l_returnflag
      |> ORDER BY l_returnflag""")
    val nested = spark.sql("""SELECT l_returnflag, count(*) AS n
      FROM pipe_li WHERE l_quantity > 10
      GROUP BY l_returnflag ORDER BY l_returnflag""")
    assert(piped.queryExecution.optimizedPlan.sameResult(
      nested.queryExecution.optimizedPlan),
      s"${piped.queryExecution.optimizedPlan}\nvs\n${nested.queryExecution.optimizedPlan}")
  }
}
