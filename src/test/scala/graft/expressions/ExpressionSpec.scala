package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.SimilarityOps

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine_sim native expression equals the HOF composition bit-exactly") {
    GraftFunctions.register(spark)
    val pairs = emb.select($"vec_id".as("a_id"), $"embedding".as("a"))
      .crossJoin(emb.filter($"vec_id" < 10).select($"vec_id".as("b_id"), $"embedding".as("b")))
    val both = pairs.select(
      call_function("cosine_sim",
        SimilarityOps.asDouble($"a"), SimilarityOps.asDouble($"b")).as("native"),
      SimilarityOps.cosine(SimilarityOps.asDouble($"a"), SimilarityOps.asDouble($"b")).as("hof"))
    // HOF fold and the fused loop run the same IEEE op order → bit equal
    assert(both.filter($"native" =!= $"hof").count() == 0)
    assert(both.count() == emb.count() * 10)
  }

  test("cosine_sim is available in SQL after registration and is not a UDF node") {
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_v")
    val df = spark.sql(
      """SELECT a.vec_id, cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                            CAST(a.embedding AS ARRAY<DOUBLE>)) AS self_cos
        |FROM emb_v a WHERE a.vec_id < 5""".stripMargin)
    val vals = df.select($"self_cos").as[Double].collect()
    assert(vals.length == 5 && vals.forall(v => math.abs(v - 1.0) < 1e-12))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim") && !plan.contains("BatchEvalPython")
      && !plan.contains("ScalaUDF"), plan)
  }

  test("cosine_sim returns null on dimension mismatch (matches HOF semantics)") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(call_function("cosine_sim", $"a", $"b").as("c"))
    assert(df.head().isNullAt(0))
  }

  test("GraftExtensions wires the same builders (injectFunction path)") {
    // the extensions object enumerates exactly the registered builders;
    // applying it to a fresh SparkSessionExtensions must not throw
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftFunctions.builders.map(_._1) == Seq("cosine_sim"))
  }
}
