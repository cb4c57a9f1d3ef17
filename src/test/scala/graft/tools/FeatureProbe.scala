package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway feature probe (test scope, not part of the library):
  * checks which Spark 4.1 surfaces are actually usable in this
  * environment before catalog keys are built on them. Run:
  * `sbt "Test/runMain graft.tools.FeatureProbe"`. */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def probe(name: String)(body: => Any): Unit =
      try println(s"PROBE $name OK: " + body.toString.take(120))
      catch { case e: Throwable =>
        println(s"PROBE $name FAIL: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(160)) }

    probe("bitmap") {
      spark.sql("""SELECT sum(bitmap_count(bm)) FROM (
        SELECT bitmap_construct_agg(bitmap_bit_position(id)) bm
        FROM range(10) GROUP BY bitmap_bucket_number(id))""").collect().toSeq
    }
    probe("bitmap_or_agg") {
      spark.sql("""SELECT bitmap_count(bitmap_or_agg(bm)) FROM (
        SELECT bitmap_construct_agg(bitmap_bit_position(id % 5)) bm
        FROM range(10) GROUP BY id % 2)""").collect().toSeq
    }
    probe("variant") {
      spark.sql("""SELECT variant_get(parse_json('{"k":1,"s":"x","a":[2.5]}'), '$.k', 'bigint'),
        variant_get(parse_json('{"k":1,"s":"x","a":[2.5]}'), '$.a[0]', 'double')""").collect().toSeq
    }
    probe("collation") {
      spark.sql("""SELECT collate(c, 'UTF8_LCASE') k, count(*) n FROM
        VALUES ('Ab'), ('aB'), ('cd') AS t(c) GROUP BY 1 ORDER BY n""").collect().toSeq
    }
    probe("lateral_limit") {
      Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v").createOrReplaceTempView("pt")
      Seq(1, 2).toDF("k").createOrReplaceTempView("kt")
      spark.sql("""SELECT kt.k, l.v FROM kt,
        LATERAL (SELECT v FROM pt WHERE pt.k = kt.k ORDER BY v LIMIT 1) l
        ORDER BY kt.k""").collect().toSeq
    }
    probe("recursive_cte") {
      spark.sql("""WITH RECURSIVE r(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5)
        SELECT sum(n) FROM r""").collect().toSeq
    }
    probe("xml_write_read") {
      val p = "/tmp/graft_probe_xml"
      Seq((1L, "a"), (2L, "b")).toDF("id", "name")
        .write.mode("overwrite").option("rootTag", "rows").option("rowTag", "row")
        .format("xml").save(p)
      spark.read.option("rowTag", "row").format("xml").load(p).collect().toSeq
    }
    probe("from_xml_fn") {
      spark.sql("""SELECT from_xml('<r><a>1</a></r>', 'a INT')""").collect().toSeq
    }
    spark.stop()
  }
}
