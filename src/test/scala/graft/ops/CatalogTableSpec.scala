package graft.ops

import java.nio.file.Files
import graft.SparkSpec

/** Persistent-catalog registration semantics (SURVEY.md §2.1): an external
  * partitioned table over an existing directory tree, with out-of-band
  * partition directories recovered via MSCK REPAIR TABLE — the engine-side
  * equivalent of the reference's crawler + catalog table (README.md:762-780).
  */
class CatalogTableSpec extends SparkSpec {
  import spark.implicits._

  test("MSCK REPAIR TABLE makes out-of-band partition dirs visible") {
    val dir = Files.createTempDirectory("ext_tbl").toFile.getAbsolutePath
    Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)

    spark.sql("DROP TABLE IF EXISTS ext_t")
    spark.sql(
      s"""CREATE TABLE ext_t (id BIGINT, v DOUBLE, p STRING)
         |USING PARQUET PARTITIONED BY (p) LOCATION '$dir'""".stripMargin)
    // registration alone discovers nothing: partitions live in the catalog
    assert(spark.table("ext_t").count() == 0,
      "external table must not see partitions before the first repair")
    spark.sql("MSCK REPAIR TABLE ext_t")
    assert(spark.table("ext_t").count() == 2)

    // the crawler scenario: a partition directory written directly into
    // the location, bypassing every catalog-aware writer
    Seq((3L, 3.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/p=c")
    assert(spark.table("ext_t").count() == 2,
      "out-of-band partition must be invisible before repair")
    spark.sql("MSCK REPAIR TABLE ext_t")
    assert(spark.table("ext_t").count() == 3)
    assert(spark.sql("SHOW PARTITIONS ext_t").as[String].collect().sorted.toSeq ==
      Seq("p=a", "p=b", "p=c"))

    // partition pruning works against the repaired catalog
    val pruned = spark.table("ext_t").filter($"p" === "c")
    assert(pruned.count() == 1)
    spark.sql("DROP TABLE ext_t")
  }
}
