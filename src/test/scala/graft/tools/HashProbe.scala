package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LOCAL-ONLY probe harness (not in `SparkEntry.queries`): writes the
  * SAME three numeric values as DECIMAL(18,6) (int64-backed),
  * DECIMAL(30,6) (int128-backed / FIXED_LEN_BYTE_ARRAY), and DOUBLE so
  * `tools/hash_probe.py` can diff which representations a driver-style
  * parquet→DuckDB→hash path distinguishes. Findings are recorded in
  * `tools/HASH_NOTES.md`; `tools/compare_oracle.py` encodes them.
  *
  * Run: `sbt "Test/runMain graft.tools.HashProbe /tmp/hashprobe"`
  */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/hashprobe")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val base = Seq((1L, "0.940008"), (2L, "0.470004"), (3L, "1.410012"))
      .toDF("id", "v")
    def dump(c: org.apache.spark.sql.Column, dir: String): Unit =
      base.select($"id", c.as("w")).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$dir")
    dump($"v".cast(DecimalType(18, 6)), "d18")
    dump($"v".cast(DecimalType(30, 6)), "d30")
    dump($"v".cast(DoubleType), "dbl")
    spark.stop()
  }
}
