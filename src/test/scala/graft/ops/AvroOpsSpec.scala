package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class AvroOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("avro round-trip: all supported types, values exact, empty partitions skipped") {
    val df = Seq(
      (1L, 7, 1.5, 2.25f, true, "alpha"),
      (2L, -3, -0.0, 0.0f, false, "βeta multibyte"),
      (3L, 0, Double.MaxValue, Float.MinPositiveValue, true, ""))
      .toDF("l", "i", "d", "f", "b", "s")
    val dir = tmpDir("avro_rt")
    // more partitions than rows: empty partitions must write no file
    AvroOps.writeAvroParts(df.repartition(8, $"l"), dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty && files.length <= 3, files.map(_.getName).toSeq)
    val back = AvroOps.readAvro(spark, dir, df.schema)
      .as[(Long, Int, Double, Float, Boolean, String)]
      .collect().sortBy(_._1).toSeq
    assert(back == df.as[(Long, Int, Double, Float, Boolean, String)]
      .collect().sortBy(_._1).toSeq)
  }

  test("avro round-trip matches the source on the real orders projection") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey".cast(LongType).as("k"),
        $"o_totalprice".cast(DoubleType).as("p"),
        $"o_orderstatus".cast(StringType).as("st"))
    val dir = tmpDir("avro_orders")
    AvroOps.writeAvroParts(orders.repartition(4, $"k"), dir)
    val back = AvroOps.readAvro(spark, dir, orders.schema)
    assert(back.count() == orders.count())
    // exceptAll both ways: multiset equality (doubles must be bit-exact
    // through the avro encode/decode — IEEE754 is stored verbatim)
    assert(back.exceptAll(orders).count() == 0)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("reader-schema projection skips unread fields; missing field fails loudly") {
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.0), (3L, "c", 0.25))
      .toDF("k", "s", "v")
    val dir = tmpDir("avro_proj")
    AvroOps.writeAvroParts(df.repartition(2, $"k"), dir)
    val narrow = StructType(Seq(
      StructField("v", DoubleType), StructField("k", LongType)))
    // field ORDER in the reader schema is independent of writer order
    val got = AvroOps.readAvro(spark, dir, narrow)
      .as[(Double, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((1.5, 1L), (-2.0, 2L), (0.25, 3L)))
    // a reader field the writer never had: loud resolution failure,
    // never a silent NULL column
    val bad = StructType(Seq(StructField("nope", LongType)))
    intercept[org.apache.spark.SparkException] {
      AvroOps.readAvro(spark, dir, bad).collect()
    }
  }

  test("null in a required field fails loudly at write; bad type fails schema build") {
    val withNull = Seq((1L, Some("x")), (2L, None))
      .toDF("k", "s")
    val dir = tmpDir("avro_null")
    val e = intercept[org.apache.spark.SparkException] {
      AvroOps.writeAvroParts(withNull, dir)
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      AvroOps.avroSchemaFor(StructType(Seq(
        StructField("a", ArrayType(LongType)))))
    }
  }
}
