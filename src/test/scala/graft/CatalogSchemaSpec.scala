package graft

import org.apache.spark.sql.types._

/** Output-schema lint over EVERY `Catalog.queries` key (SURVEY.md §5.1).
  *
  * The driver's correctness hash is sensitive to representation details
  * beyond declared type + value: `search_tfidf_keywords` shipped two
  * consecutive red rounds with 1,500/1,500 value-identical rows and
  * matching declared DECIMAL(30,6) types, purely because precision->18
  * decimals are int128-backed (Arrow decimal128 / parquet
  * FIXED_LEN_BYTE_ARRAY) and the hash path disagrees on them. This spec
  * turns that failure class — and the previously observed MapType and
  * nanosecond-timestamp hazards — into a local unit failure, enforcing
  * the house presentation convention: compute wide/exact internally,
  * present BIGINT / DOUBLE / VARCHAR / DATE / µs-timestamp /
  * ≤18-precision decimal.
  */
class CatalogSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** All type violations inside a (possibly nested) data type. */
  private def violations(path: String, dt: DataType): Seq[String] = dt match {
    case d: DecimalType if d.precision > 18 =>
      Seq(s"$path: DecimalType(${d.precision},${d.scale}) is int128-backed " +
        "(precision > 18) — present as DOUBLE or <=18-precision decimal")
    case _: MapType =>
      Seq(s"$path: MapType has no stable cross-engine ordering — present " +
        "as exploded (key, value) rows or a sorted array of structs")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => violations(s"$path.${f.name}", f.dataType))
    case a: ArrayType => violations(s"$path[]", a.elementType)
    case _ => Nil
  }

  test("every query key presents only hash-safe output types") {
    val keys = graft.queries.Catalog.specs.keys.toSeq.sorted
    assert(keys.size >= 177, s"expected the full catalog, saw ${keys.size}")
    val bad = keys.flatMap { k =>
      val schema = graft.queries.Catalog.specs(k).fn(spark, sf).schema
      schema.fields.toSeq.flatMap(f => violations(s"$k/${f.name}", f.dataType))
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("the lint itself rejects a seeded wide-decimal and MapType schema") {
    val seeded = StructType(Seq(
      StructField("ok", DoubleType),
      StructField("wide", DecimalType(30, 6)),
      StructField("nested", ArrayType(StructType(Seq(
        StructField("m", MapType(StringType, LongType))))))))
    val hits = seeded.fields.toSeq.flatMap(f => violations(f.name, f.dataType))
    assert(hits.size == 2, hits.mkString("\n"))
    assert(hits.exists(_.contains("wide")), hits.mkString("\n"))
    assert(hits.exists(_.contains("nested[].m")), hits.mkString("\n"))
  }
}
