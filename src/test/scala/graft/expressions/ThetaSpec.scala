package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ThetaSpec extends SparkSpec {
  import spark.implicits._

  private def est(c: org.apache.spark.sql.Column) =
    call_function("theta_estimate", c)

  test("theta sketch below nominal entries is exact; set ops recover known overlaps") {
    GraftFunctions.register(spark)
    // A = {1..1000}, B = {501..1500}: |A∩B| = 500, |A\B| = 500
    val df = ((1L to 1000L).map(("a", _)) ++ (501L to 1500L).map(("b", _)))
      .toDF("s", "v").repartition(8)
    val sk = df.groupBy($"s")
      .agg(call_function("theta_sketch_agg", $"v", lit(12)).as("sk"))
    val row = sk.groupBy()
      .pivot("s", Seq("a", "b")).agg(first($"sk"))
    val out = row.select(
      est(call_function("theta_intersect", $"a", $"b")).as("i"),
      est(call_function("theta_a_not_b", $"a", $"b")).as("d"),
      est($"a").as("na")).as[(Double, Double, Double)].head()
    // 1000 < 4096 nominal entries ⇒ estimation mode never engaged:
    // every estimate is exact
    assert(out == ((500.0, 500.0, 1000.0)), out)
  }

  test("theta_union_agg of shard sketches equals the single-sketch estimate") {
    GraftFunctions.register(spark)
    val df = (1L to 2000L).map(i => (i % 7, i)).toDF("shard", "v")
    val merged = df.groupBy($"shard")
      .agg(call_function("theta_sketch_agg", $"v", lit(12)).as("sk"))
      .agg(est(call_function("theta_union_agg", $"sk", lit(12))).as("n"))
      .as[Double].head()
    assert(merged == 2000.0, s"union estimate $merged")
  }

  test("string values and SQL surface work; estimate is repartitioning-invariant") {
    GraftFunctions.register(spark)
    val words = (1 to 500).map(i => s"tok-${i % 211}")
    val a = words.toDF("w").repartition(2)
      .agg(est(call_function("theta_sketch_agg", $"w", lit(12)))).as[Double].head()
    val b = words.toDF("w").repartition(13)
      .agg(est(call_function("theta_sketch_agg", $"w", lit(12)))).as[Double].head()
    assert(a == 211.0 && b == 211.0, s"$a vs $b")
    words.toDF("w").createOrReplaceTempView("theta_v")
    val viaSql = spark.sql(
      "SELECT theta_estimate(theta_sketch_agg(w, 12)) FROM theta_v")
      .as[Double].head()
    assert(viaSql == 211.0)
  }

  test("a COLUMN-valued lgK fails with the named contract message, not an executor NPE") {
    GraftFunctions.register(spark)
    (1L to 10L).map(i => (i, 12)).toDF("v", "k")
      .createOrReplaceTempView("theta_colk_v")
    val ex = intercept[Exception] {
      spark.sql("SELECT theta_sketch_agg(v, k) FROM theta_colk_v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("lgK must be an integer literal")),
      s"expected the named guard, got: ${msgs(ex).mkString(" | ")}")
  }

  test("estimation mode (beyond nominal entries) stays within the error band") {
    GraftFunctions.register(spark)
    val n = 100000L
    val e = (1L to n).toDF("v").repartition(16)
      .agg(est(call_function("theta_sketch_agg", $"v", lit(12))))
      .as[Double].head()
    // lgK=12 ⇒ RSE ~1.56%; 4 sigma band
    assert(math.abs(e - n) <= 0.0625 * n, s"estimate $e for $n")
  }
}
