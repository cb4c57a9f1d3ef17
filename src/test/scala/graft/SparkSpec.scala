package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session (one per JVM; suites share via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** Filesystem path of a test resource. */
  def resource(p: String): String = getClass.getResource(p).getPath
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // WARN, not the INFO default: Logging's isInfoEnabled guard is what
    // keeps Spark from BUILDING log strings at all — at INFO, every
    // planning pass over a plan carrying a bloom-filter literal renders
    // the literal to hex (tens of MB PER LINE, measured 60 MB of log per
    // ingest test; the string construction alone stalls the driver for
    // minutes under load and its humongous allocations drive GC). The
    // suite's correctness never reads driver logs.
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
