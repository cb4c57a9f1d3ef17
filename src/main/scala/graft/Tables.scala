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
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts arrives in whatever physical form the driver generated
    // this round; normalize EVERY variant to a µs TimestampType (LTZ) so
    // downstream semantics — in particular streaming `withWatermark`,
    // which rejects TIMESTAMP_NTZ — never depend on the fixture writer:
    //  - TIMESTAMP(NANOS): Spark 4 refuses it unless
    //    spark.sql.legacy.parquet.nanosAsLong=true (set by every session
    //    builder in this repo); the resulting LongType converts with
    //    exact integral division — `ts div 1000`, NOT `/1000` (double
    //    division loses ns precision at 1.7e18 epoch values);
    //  - TIMESTAMP_NTZ (µs, isAdjustedToUTC=false): cast to LTZ — every
    //    session here pins spark.sql.session.timeZone=UTC, so the cast
    //    reinterprets the same wall clock as the same instant,
    //    value-identical to what DuckDB reads from the raw file.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast(TimestampType))
    else df
  }
}
