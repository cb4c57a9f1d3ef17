package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the key needs no shuffle") {
    val sf = "/root/testdata/sf0.001"
    Upsert.writeBucketedTable(
      Tables(spark, sf, "lineitem").select($"l_orderkey", $"l_quantity"),
      "li_bucketed", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    Upsert.writeBucketedTable(
      Tables(spark, sf, "orders").select($"o_orderkey".as("l_orderkey"), $"o_totalprice"),
      "ord_bucketed", Seq("l_orderkey"), 8, Seq("l_orderkey"))

    // tiny test tables would be broadcast (its own Exchange, bucketing
    // "disabled by query planner") — disable broadcast to surface the
    // co-located sort-merge shape a large fact⋈fact join would take
    withNoBroadcast {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), Seq("l_orderkey"))
      joined.collect() // finalize AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle at all
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == Tables(spark, sf, "lineitem").count())

      // contrast: the same join over raw (un-bucketed) parquet shuffles
      val raw = Tables(spark, sf, "lineitem").select($"l_orderkey", $"l_quantity")
        .join(Tables(spark, sf, "orders").select($"o_orderkey".as("l_orderkey"), $"o_totalprice"),
          Seq("l_orderkey"))
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }

  test("bucketed group-by on the bucket key also skips its shuffle") {
    val agg = spark.table("li_bucketed")
      .groupBy($"l_orderkey").agg(sum($"l_quantity"))
    agg.collect()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("orphan-location cleanup honours the CURRENT database, never default's path") {
    val sf = "/root/testdata/sf0.001"
    val region = Tables(spark, sf, "region").select($"r_regionkey", $"r_name")
    // live managed table in DEFAULT with the soon-to-collide name
    Upsert.writeBucketedTable(region, "cleanup_probe", Seq("r_regionkey"), 2)
    val defaultRows = spark.table("default.cleanup_probe").count()
    spark.sql("CREATE DATABASE IF NOT EXISTS otherdb")
    spark.catalog.setCurrentDatabase("otherdb")
    try {
      // same bare name, different current database: the pre-write orphan
      // cleanup must resolve otherdb's location, not default's — a
      // warehouse.dir/<table> assumption would recursively delete the
      // live default-DB table above
      Upsert.writeBucketedTable(region, "cleanup_probe", Seq("r_regionkey"), 2)
      assert(spark.table("otherdb.cleanup_probe").count() == defaultRows)
      assert(spark.table("default.cleanup_probe").count() == defaultRows,
        "default-DB table was clobbered by cleanup in another database")
    } finally {
      spark.catalog.setCurrentDatabase("default")
      spark.sql("DROP DATABASE IF EXISTS otherdb CASCADE")
    }
  }

  private def withNoBroadcast[T](body: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
