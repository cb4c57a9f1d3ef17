package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  test("explodeStructs flattens a Visual-Crossing-shaped doc") {
    val raw = Readers.jsonMultiLine(spark, resource("/raw/Tenerife/Vilaflor/vc2021-01-01-to-2021-01-03.json"))
    val flat = Flatten.explodeStructs(raw, "days",
      scalars = Seq("latitude" -> "latitude", "timezone" -> "timezone"),
      fields = Seq("datetime" -> "date", "cloudcover" -> "cloudcover", "icon" -> "icon"))
    val rows = flat.orderBy("date").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("date")).toSeq == Seq("2021-01-01", "2021-01-02"))
    assert(rows.head.getAs[Double]("cloudcover") == 60.8)
    assert(rows.forall(_.getAs[String]("timezone") == "Atlantic/Canary"))
  }

  test("unzipParallelArrays flattens an Open-Meteo-shaped doc") {
    val raw = Readers.jsonMultiLine(spark, resource("/raw/Tenerife/Vilaflor/2021-01-01-to-2021-01-03.json"))
    val flat = Flatten.unzipParallelArrays(raw, "daily",
      scalars = Seq("location" -> "location", "elevation" -> "elevation"))
    val rows = flat.orderBy("date").collect()
    assert(rows.length == 3)
    // positional alignment: date[i] must ride with weather_code[i]
    assert(rows.map(r => (r.getAs[String]("date"), r.getAs[Long]("weather_code"))).toSeq ==
      Seq(("2021-01-01", 51L), ("2021-01-02", 51L), ("2021-01-03", 63L)))
    // scalars carried onto every row (no crossJoin(limit(1)) needed)
    assert(rows.forall(_.getAs[Double]("elevation") == 1387.0))
  }

  test("unzipParallelArrays rejects ragged arrays in strict mode") {
    val df = Seq(("a", Seq("d1", "d2"), Seq(1.0)))
      .toDF("loc", "date", "temp")
      .select($"loc", struct($"date", $"temp").as("daily"))
    // the check is in-plan: building the frame is lazy and must NOT scan
    val flat = Flatten.unzipParallelArrays(df, "daily", Seq("loc" -> "loc"))
    val e = intercept[Exception] { flat.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("inconsistent array lengths")))
    // lenient mode pads with nulls instead
    val lenient = Flatten.unzipParallelArrays(df, "daily", Seq("loc" -> "loc"), strict = false)
    assert(lenient.count() == 2)
    assert(lenient.orderBy($"date".desc_nulls_last).collect()(1).isNullAt(2) ||
      lenient.orderBy($"date").collect().exists(_.isNullAt(2)))
  }

  test("strict unzip issues exactly one job (no eager validation pre-scan)") {
    val nested = Seq(("a", Seq(1, 2, 3), Seq(10.0, 20.0, 30.0)))
      .toDF("k", "idx", "v")
      .select($"k", struct($"idx", $"v").as("daily"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val flat = Flatten.unzipParallelArrays(nested, "daily", Seq("k" -> "k"))
      assert(jobs.get() == 0, "operator construction must not launch jobs")
      flat.foreach(_ => ()) // shuffle-free action: exactly one scan job
      // listener delivery is async: wait for at least one event, then a
      // settle interval to catch any extra job that would indicate a
      // second (validation) scan
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      assert(jobs.get() == 1, s"strict unzip should scan ONCE, saw ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("zip round-trip equals the original rows (seeded random cases)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val groups = 1 + rnd.nextInt(5)
      val data = (0 until groups).flatMap { g =>
        val n = 1 + rnd.nextInt(8)
        (0 until n).map(i => (s"g$g", i, rnd.nextInt(1000).toDouble))
      }
      val flat = data.toDF("k", "idx", "v")
      val nested = flat.groupBy($"k").agg(
        sort_array(collect_list(struct($"idx", $"v"))).as("rows"))
        .select($"k", Flatten.parallelArrays($"rows", Seq("idx", "v")).as("daily"))
      val back = Flatten.unzipParallelArrays(nested, "daily", Seq("k" -> "k"))
        .select($"k", $"idx", $"v").as[(String, Int, Double)].collect().toSet
      assert(back == data.toSet)
    }
  }
}
