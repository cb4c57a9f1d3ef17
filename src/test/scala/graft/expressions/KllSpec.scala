package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KllSpec extends SparkSpec {
  import spark.implicits._

  private def q(sk: org.apache.spark.sql.Column, r: Double) =
    call_function("kll_quantile", sk, lit(r))

  test("kll_sketch_agg p50 lands within the k=200 rank-error band") {
    GraftFunctions.register(spark)
    // 10k distinct values 1..10000: exact quantile at rank r is ~r*10000
    val df = (1 to 10000).map(_.toDouble).toDF("v").repartition(8)
    val est = df.agg(q(call_function("kll_sketch_agg", $"v", lit(200)), 0.5)
      .as("p50")).as[Double].head()
    // normalized rank error for k=200 is ~1.33%; allow 3%
    assert(math.abs(est - 5000.0) <= 300.0, s"p50 estimate $est")
  }

  test("kll_union_agg of per-shard sketches matches a single global sketch's band") {
    GraftFunctions.register(spark)
    val df = (1 to 10000).map(i => (i % 4, i.toDouble)).toDF("shard", "v")
    val shards = df.groupBy($"shard")
      .agg(call_function("kll_sketch_agg", $"v", lit(200)).as("sk"))
    assert(shards.count() == 4)
    val merged = shards.agg(
      q(call_function("kll_union_agg", $"sk", lit(200)), 0.25).as("p25"),
      q(call_function("kll_union_agg", $"sk", lit(200)), 0.75).as("p75"))
      .as[(Double, Double)].head()
    assert(math.abs(merged._1 - 2500.0) <= 300.0, s"merged p25 $merged")
    assert(math.abs(merged._2 - 7500.0) <= 300.0, s"merged p75 $merged")
  }

  test("sketch bytes survive a shuffle boundary (serialize/deserialize path)") {
    GraftFunctions.register(spark)
    val df = (1 to 5000).map(i => (i % 16, i.toDouble)).toDF("g", "v")
      .repartition(16, $"g") // forces partial/final agg across exchanges
    val perGroup = df.groupBy($"g")
      .agg(call_function("kll_sketch_agg", $"v", lit(200)).as("sk"))
      .repartition(4) // move the BYTES through another exchange
    val est = perGroup
      .agg(q(call_function("kll_union_agg", $"sk", lit(200)), 0.5).as("p50"))
      .as[Double].head()
    assert(math.abs(est - 2500.0) <= 300.0, s"p50 after shuffles $est")
  }

  test("NULL values are skipped; empty sketch quantile is NULL, never an error") {
    GraftFunctions.register(spark)
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val sk = df.agg(call_function("kll_sketch_agg", $"v", lit(200)).as("sk"))
    // 2 real values: p0 = 1, p100 = 3
    val (lo, hi) = sk.select(q($"sk", 0.0).as("lo"), q($"sk", 1.0).as("hi"))
      .as[(Double, Double)].head()
    assert(lo == 1.0 && hi == 3.0)
    val empty = df.filter($"v" > 100).agg(
      q(call_function("kll_sketch_agg", $"v", lit(200)), 0.5).as("p"))
      .select($"p").as[Option[Double]].head()
    assert(empty.isEmpty)
  }

  test("SQL surface: kll functions usable from spark.sql after registration") {
    GraftFunctions.register(spark)
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("kll_v")
    val est = spark.sql(
      """SELECT kll_quantile(kll_sketch_agg(v, 200), 0.5D) AS p50
        |FROM kll_v""".stripMargin).as[Double].head()
    // 100 points, k=200: the sketch is exact (no compaction)
    assert(est >= 50.0 && est <= 51.0, s"$est")
  }

  test("kll_union_agg rejects an invalid k at PLAN time with a named message") {
    // the sketch-agg sibling already enforced this; the union half must
    // fail identically, not with a DataSketches error from a task
    (1 to 10).map(_.toDouble).toDF("v").createOrReplaceTempView("kll_ku")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT kll_union_agg(sk, 4) FROM
          |(SELECT kll_sketch_agg(v, 200) AS sk FROM kll_ku)""".stripMargin)
        .collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("kll_union_agg"), msg)
  }
}
