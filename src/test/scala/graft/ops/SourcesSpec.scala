package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Source/sink format matrix beyond parquet + multiLine JSON: CSV,
  * JSON-lines, and ORC round-trips with explicit schemas (SURVEY.md §2.1
  * surface completeness). Schema declared on read — inference is a
  * double-scan at scale.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")

  test("csv round-trip with header + explicit schema") {
    val dir = Files.createTempDirectory("csv").toFile.getAbsolutePath + "/out"
    sample.write.option("header", true).csv(dir)
    val back = spark.read.option("header", true).schema(sample.schema).csv(dir)
    assert(back.schema == sample.schema)
    assert(back.count() == sample.count())
    assert(back.agg(sum($"l_orderkey")).first() == sample.agg(sum($"l_orderkey")).first())
  }

  test("json-lines round-trip (the non-multiLine shape)") {
    val dir = Files.createTempDirectory("jsonl").toFile.getAbsolutePath + "/out"
    sample.write.json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.count() == sample.count())
  }

  test("orc round-trip preserves schema and supports pushdown") {
    val dir = Files.createTempDirectory("orc").toFile.getAbsolutePath + "/out"
    sample.write.orc(dir)
    val back = spark.read.orc(dir).filter($"l_returnflag" === "R")
    assert(back.count() == sample.filter($"l_returnflag" === "R").count())
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(l_returnflag,R)"), plan)
  }
}
