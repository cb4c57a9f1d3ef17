package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF/UDAF surface (SURVEY.md §2.11): the reference defines none, but the
  * engine must support user extension. No query key depends on these —
  * they exist so the registration paths are covered. Prefer built-ins
  * (codegen'd) in all hot paths.
  */
class UdfSurfaceSpec extends SparkSpec {
  import spark.implicits._

  /** Typed UDAF: exact streaming-friendly range (max-min). */
  object RangeAgg extends Aggregator[Double, (Double, Double), Double] {
    def zero: (Double, Double) = (Double.MaxValue, Double.MinValue)
    def reduce(b: (Double, Double), a: Double): (Double, Double) =
      (math.min(b._1, a), math.max(b._2, a))
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (math.min(a._1, b._1), math.max(a._2, b._2))
    def finish(r: (Double, Double)): Double = r._2 - r._1
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  test("typed Aggregator works via udaf() registration and in SQL") {
    spark.udf.register("range_agg", udaf(RangeAgg))
    val df = Seq(("a", 1.0), ("a", 5.0), ("b", 2.0)).toDF("k", "v")
    df.createOrReplaceTempView("udaf_t")
    val got = spark.sql("SELECT k, range_agg(v) AS r FROM udaf_t GROUP BY k ORDER BY k")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 4.0), ("b", 0.0)))
  }

  test("scalar udf registration round-trips (but built-ins stay preferred)") {
    val slug = spark.udf.register("slugify",
      (s: String) => s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    val got = Seq("Hello, World!").toDF("s")
      .select(slug($"s").as("slug")).as[String].head()
    assert(got == "hello-world-")
  }
}
