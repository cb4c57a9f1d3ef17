package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan dump for catalog keys (bench tooling, the
  * `.explain("formatted")` audit loop): prints each requested key's
  * formatted plan so shuffle/broadcast/codegen shapes can be reviewed
  * without writing a throwaway main per round.
  *
  * Usage: `runMain graft.PlanDump key1 key2 …`. Env:
  * SPARK_GRAFT_SF_DIR (default sf0.01 — the staged-oracle dataset),
  * SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "PlanDump: pass at least one catalog key")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { key =>
      println(s"===== PLAN $key =====")
      SparkEntry.queries(key)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
