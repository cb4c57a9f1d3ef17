package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Native row-level SQL statements against the MergeableCatalog DSv2
  * table: MERGE INTO (update + insert + delete clauses), UPDATE, and
  * DELETE, with the plan assert the surface exists for — Spark must
  * plan a delta write of per-row actions (`WriteDelta`), never a
  * rewrite to a full-table overwrite. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    spark.conf.set("spark.sql.catalog.graftcat",
      "graft.sources.MergeableCatalog")
    spark.sql(s"DROP TABLE IF EXISTS graftcat.$name")
    spark.sql(s"""CREATE TABLE graftcat.$name
                 |  (id BIGINT NOT NULL, v BIGINT, s STRING)
                 |TBLPROPERTIES('rowid'='id')""".stripMargin)
    Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "v", "s").writeTo(s"graftcat.$name").append()
    s"graftcat.$name"
  }

  test("MERGE INTO: update + insert + delete clauses, hand-checked") {
    val t = fresh("m1")
    Seq((2L, 200L, "B"), (3L, -1L, "del"), (4L, 40L, "d"))
      .toDF("id", "v", "s").createOrReplaceTempView("m1_src")
    spark.sql(s"""MERGE INTO $t t USING m1_src s ON t.id = s.id
                 |WHEN MATCHED AND s.v < 0 THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET v = s.v, s = s.s
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.table(t).as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 10L, "a"), (2L, 200L, "B"), (4L, 40L, "d")), got)
  }

  test("MERGE plans a native WriteDelta — not a full-table overwrite") {
    val t = fresh("m2")
    Seq((2L, 99L, "x")).toDF("id", "v", "s").createOrReplaceTempView("m2_src")
    val plan = spark.sql(
      s"""EXPLAIN EXTENDED MERGE INTO $t t USING m2_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .head().getString(0)
    assert(plan.contains("WriteDelta"), plan)
    assert(!plan.contains("ReplaceData"), plan)
    assert(!plan.toLowerCase.contains("overwrite"), plan)
  }

  test("UPDATE and DELETE statements ride the same row-level surface") {
    val t = fresh("m3")
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE id >= 2")
    spark.sql(s"DELETE FROM $t WHERE s = 'c'")
    val got = spark.table(t).as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 10L, "a"), (2L, 21L, "b")), got)
  }

  test("MERGE is idempotent on re-run when the source no longer differs") {
    val t = fresh("m4")
    Seq((2L, 200L, "B"), (4L, 40L, "d")).toDF("id", "v", "s")
      .createOrReplaceTempView("m4_src")
    def merge(): Unit = spark.sql(
      s"""MERGE INTO $t t USING m4_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v, s = s.s
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    merge()
    val first = spark.table(t).as[(Long, Long, String)].collect().toSet
    merge()
    val second = spark.table(t).as[(Long, Long, String)].collect().toSet
    assert(first == second && first == Set(
      (1L, 10L, "a"), (2L, 200L, "B"), (3L, 30L, "c"), (4L, 40L, "d")))
  }

  test("INSERT OVERWRITE truncates then appends (SupportsTruncate honored)") {
    val t = fresh("m5")
    Seq((7L, 70L, "g"), (8L, 80L, "h")).toDF("id", "v", "s")
      .createOrReplaceTempView("m5_src")
    spark.sql(s"INSERT OVERWRITE $t SELECT * FROM m5_src")
    val got = spark.table(t).as[(Long, Long, String)].collect().toSet
    // ONLY the overwrite rows survive — any seeded row left means the
    // TRUNCATE capability was advertised but truncate() never applied
    assert(got == Set((7L, 70L, "g"), (8L, 80L, "h")), got)
    // plain INSERT INTO must still append, NOT truncate (the flag is
    // per-builder state — a stale doTruncate would wipe the table)
    spark.sql(s"INSERT INTO $t VALUES (9, 90, 'i')")
    val got2 = spark.table(t).as[(Long, Long, String)].collect().toSet
    assert(got2 == Set((7L, 70L, "g"), (8L, 80L, "h"), (9L, 90L, "i")), got2)
  }
}
