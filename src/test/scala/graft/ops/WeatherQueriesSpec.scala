package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The reference's three Athena queries (README.md:778-809) run against
  * the clean table our pipeline builds from the fixture raw zone —
  * entry point A end-to-end on the weather data model itself.
  */
class WeatherQueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cleanDir: String = {
    val out = Files.createTempDirectory("clean_q").toFile.getAbsolutePath
    WeatherPipeline.run(spark, resource("/raw"), out)
    out
  }
  private lazy val clean = spark.read.parquet(cleanDir)

  test("Q1: sunniest location by avg sunshine hours") {
    val q1 = clean.groupBy($"location_name")
      .agg(round(avg($"sunshine_duration") / 3600, 2).as("sun_hours"))
      .orderBy($"sun_hours".desc)
      .as[(String, Double)].collect().toSeq
    // Las_Palmas: (32400+30600+33100)/3/3600 = 8.90h; Vilaflor: (21600+28800)/2/3600 = 7.0h
    assert(q1 == Seq(("Las_Palmas_de_Gran_Canaria", 8.9), ("Vilaflor", 7.0)))
  }

  test("Q2: top location-months by avg sunshine (multi-column group + top-k)") {
    val q2 = clean.groupBy($"location_name", $"month")
      .agg(round(avg($"sunshine_duration") / 3600, 2).as("sun_hours"))
      .orderBy($"sun_hours".desc).limit(10)
    assert(q2.count() == 2) // one month in fixtures, two locations
    assert(q2.head().getAs[String]("location_name") == "Las_Palmas_de_Gran_Canaria")
  }

  test("Q3: monthly avg uvindex for one station, partition-pruned (the x14 lever)") {
    val q3 = clean.sparkSession.read.parquet(cleanDir)
      .filter($"location_name" === "Las_Palmas_de_Gran_Canaria")
      .groupBy($"month")
      .agg(round(avg($"uvindex"), 1).as("avg_uv"))
    val rows = q3.as[(Int, Double)].collect().toSeq
    assert(rows == Seq((1, 4.3))) // (6+5+2)/3 = 4.33 → 4.3
    // the filter must hit partition pruning, not a full scan
    val scan = q3.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("location_name"), scan)
  }
}
