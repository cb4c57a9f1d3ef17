package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-series downsampling — the batch resample step a sensor/metrics
  * pipeline runs before modeling (the reference's weather series are
  * exactly this shape: README.md:595-760 hourly observations rolled up
  * for daily reporting). Everything here is ONE groupBy over derived
  * bucket columns: partial aggregation absorbs the per-bucket work
  * map-side, the shuffle carries one row per (key, bucket, agg) — at
  * 100 TB the output is smaller than the input by the resample factor,
  * so the plan's cost is the scan, which is the floor.
  */
object TimeSeriesOps {

  /** OHLC downsample: per (`keyCol`, `truncUnit`-bucket of `tsCol`),
    * emit open/high/low/close/mean/n of `valueCol`.
    *
    * Open/close are `min_by`/`max_by` on `orderCol` — a UNIQUE
    * within-series order column (an event id / sequence number), not
    * the timestamp, so duplicate timestamps can't make open/close
    * nondeterministic (min_by on a tied key returns an arbitrary
    * tied row; an id has no ties). The mean goes through an exact
    * DECIMAL accumulator: partial-aggregation order can't wiggle the
    * double result, which keeps the output hash-stable under AQE
    * re-plans and cross-engine.
    */
  def resampleOhlc(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      orderCol: String, truncUnit: String = "hour"): DataFrame = {
    val v = col(valueCol)
    df.groupBy(col(keyCol), date_trunc(truncUnit, col(tsCol)).as("bucket"))
      .agg(
        min_by(v, col(orderCol)).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, col(orderCol)).as("close"),
        (sum(v.cast(DecimalType(38, 6))).cast(DoubleType) /
          count(v).cast(DoubleType)).as("mean_val"),
        count(v).as("n"))
  }
}
