package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  test("withPathMeta extracts island/location_name from the file path") {
    val raw = Readers.jsonMultiLine(spark, resource("/raw") + "/*/*/2*.json")
    val meta = Readers.withPathMeta(raw)
      .select($"island", $"location_name").distinct()
      .as[(String, String)].collect().toSet
    assert(meta == Set(
      ("Tenerife", "Vilaflor"),
      ("Gran_Canaria", "Las_Palmas_de_Gran_Canaria")))
  }

  test("jsonMultiLine with explicit schema skips inference and projects") {
    val schema = new StructType()
      .add("location", StringType).add("elevation", DoubleType)
    val df = Readers.jsonMultiLine(spark,
      resource("/raw/Tenerife/Vilaflor/2021-01-01-to-2021-01-03.json"), Some(schema))
    assert(df.schema == schema)
    assert(df.first().getAs[Double]("elevation") == 1387.0)
  }

  test("emptyBootstrap creates an empty frame with the declared schema") {
    val schema = new StructType()
      .add("location", StringType).add("date", DateType).add("temp", DoubleType)
    val df = Readers.emptyBootstrap(spark, schema)
    assert(df.count() == 0 && df.schema == schema)
    // unionByName with real data works (the reference's bootstrap use case)
    val real = Seq(("a", java.sql.Date.valueOf("2021-01-01"), 1.0))
      .toDF("location", "date", "temp")
    assert(df.unionByName(real).count() == 1)
  }

  test("jsonMultiLineTolerant quarantines malformed docs instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("tolerant").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "good.json").toPath,
      """{"location": "A", "elevation": 10.0}""")
    java.nio.file.Files.writeString(new java.io.File(dir, "bad.json").toPath,
      """{"location": "B", "elevation": """) // truncated
    val schema = new StructType()
      .add("location", StringType).add("elevation", DoubleType)
    val df = Readers.jsonMultiLineTolerant(spark, dir.getAbsolutePath + "/*.json", schema)
      .cache() // required to split on _corrupt_record
    val good = df.filter($"_corrupt_record".isNull)
    val bad = df.filter($"_corrupt_record".isNotNull)
    assert(good.count() == 1 && good.head.getAs[String]("location") == "A")
    assert(bad.count() == 1) // quarantined, job did not fail
    df.unpersist()
  }

  test("dropIfExists is a no-op for absent columns") {
    val df = Seq((1, "x")).toDF("a", "b")
    assert(Joins.dropIfExists(df, "nope", "b").columns.toSeq == Seq("a"))
  }

  test("jsonLinesTolerant quarantines malformed ndjson lines, keeps clean ones") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = Files.createTempDirectory("jsonl").toFile.getAbsolutePath
    Files.writeString(Paths.get(dir, "a.json"),
      """{"k": 1, "s": "x"}
        |{not json
        |{"k": 2, "s": "y"}
        |{"k": """.stripMargin)
    val schema = new StructType().add("k", LongType).add("s", StringType)
    // collect the parsed frame once — Spark disallows queries touching
    // ONLY _corrupt_record (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val rows = Readers.jsonLinesTolerant(spark, dir, schema)
      .select($"k", $"s", $"_corrupt_record")
      .collect()
    val clean = rows.filter(_.isNullAt(2)).map(r => (r.getLong(0), r.getString(1))).toSet
    assert(clean == Set((1L, "x"), (2L, "y")))
    // BOTH malformed lines are captured, not silently skipped
    assert(rows.count(!_.isNullAt(2)) == 2)
  }

  test("withExistsFlag annotates without duplicating left rows") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val orders = Seq((1L, 10.0), (1L, 20.0), (3L, 5.0)).toDF("k", "amt")
    val got = Joins.withExistsFlag(cust, orders, Seq("k"), "has_order")
      .orderBy(col("k"))
      .as[(Long, String, Boolean)].collect().toSeq
    // key 1 has TWO orders but stays one row (distinct pre-join)
    assert(got == Seq((1L, "a", true), (2L, "b", false), (3L, "c", true)))
    intercept[IllegalArgumentException] {
      Joins.withExistsFlag(cust.withColumn("has_order", lit(1)),
        orders, Seq("k"), "has_order")
    }
    // case-variant collision: Spark resolves case-insensitively, so the
    // guard must too
    intercept[IllegalArgumentException] {
      Joins.withExistsFlag(cust.withColumn("Has_Order", lit(1)),
        orders, Seq("k"), "has_order")
    }
  }

  test("readBinaryFiles: whole-file bytes match java.nio; glob prunes listing") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("binsrc").toFile.getAbsolutePath
    Files.write(Paths.get(dir, "a.bin"), Array[Byte](1, 2, 3, 4))
    Files.write(Paths.get(dir, "b.bin"), "hello bytes".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "skip.txt"), "not matched".getBytes("UTF-8"))
    val got = Readers.readBinaryFiles(spark, dir, "*.bin")
      .select(col("path"), col("content"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getAs[Array[Byte]](1).toSeq))
      .toMap
    assert(got.keySet == Set("a.bin", "b.bin")) // glob filtered skip.txt
    assert(got("a.bin") == Seq[Byte](1, 2, 3, 4))
    assert(got("b.bin") == "hello bytes".getBytes("UTF-8").toSeq)
  }

  test("csvTolerant quarantines unparseable and wrong-arity rows, keeps clean ones") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = java.nio.file.Files.createTempDirectory("csv_tol").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "a.csv"),
      "id,name\n1,alpha\nnot_a_long,beta\n2,gamma\n3,x,extra,cols\n")
    val schema = new StructType().add("id", LongType).add("name", StringType)
    val df = Readers.csvTolerant(spark, dir, schema)
    val clean = df.filter($"_corrupt_record".isNull)
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(clean == Set((1L, "alpha"), (2L, "gamma")))
    // quarantined rows carry the RAW line for forensic replay
    val bad = df.filter($"_corrupt_record".isNotNull)
      .select($"_corrupt_record").as[String].collect().toSet
    assert(bad == Set("not_a_long,beta", "3,x,extra,cols"), bad.toString)
  }
}
