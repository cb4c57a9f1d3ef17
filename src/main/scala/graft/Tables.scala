package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access (TESTDATA.md / FIXTURES.md §1).
  *
  * All driver test tables are single parquet files under the scale-factor
  * directory; at 100 TB these would be multi-file partitioned datasets and
  * the same `spark.read.parquet(dir)` call handles both — no code change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md), which Spark 4
    // refuses unless spark.sql.legacy.parquet.nanosAsLong=true (set by every
    // session builder in this repo). Normalize the resulting LongType back to
    // a µs TimestampType with exact integral division — `ts div 1000`, NOT
    // `/1000` (double division loses ns precision at 1.7e18 epoch values).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
