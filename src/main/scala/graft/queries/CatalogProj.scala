package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Proj family of the operator catalog (8 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogProj {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // ------------------------------------------------- filters/projections
    // Null/empty partition-key guard (reference README.md:1306-1311).
    "filter_nonnull" -> QuerySpec(
      (s, d) => t(s, d, "customer")
        .filter(col("c_mktsegment").isNotNull && length(col("c_mktsegment")) > 0)
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE c_mktsegment IS NOT NULL AND length(c_mktsegment) > 0
             |ORDER BY c_custkey""".stripMargin)),


    // Partition-column predicate (README.md:801-806) — on a partitioned
    // layout this compiles to PruneFileSourcePartitions; plan-shape
    // asserted in PlanSpec against a partitioned copy.
    "filter_partition_prune" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),


    // Nested-struct projection + flat rename (README.md:643-666 style).
    "proj_flatten_vc" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(
          col("o_custkey"),
          struct(
            col("o_orderkey").as("okey"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").as("price")).as("day"))
        .select(
          col("o_custkey").as("cust"),
          col("day.okey").as("okey"),
          col("day.status").as("status"),
          col("day.price").as("price"))
        .orderBy(col("okey")),
      Some("""SELECT o_custkey AS cust, o_orderkey AS okey,
             |  o_orderstatus AS status, o_totalprice AS price
             |FROM orders ORDER BY okey""".stripMargin)),


    // Derived partition-key columns (README.md:740-745).
    "proj_derive_year_month" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .withColumn("odate", col("o_orderdate").cast(DateType))
        .withColumn("o_year", year(col("odate")))
        .withColumn("o_month", month(col("odate")))
        .select(col("o_orderkey"), col("odate"), col("o_year"), col("o_month"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
             |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(month(o_orderdate) AS INTEGER) AS o_month
             |FROM orders ORDER BY o_orderkey""".stripMargin)),


    // Rename-on-collision through the oracle (README.md:1429-1440): both
    // sides carry `o_totalprice`; the right side's collides and is
    // suffixed `_new` before the join, and BOTH columns survive.
    "proj_rename_collision" -> QuerySpec(
      (s, d) => {
        val old = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val updated = t(s, d, "orders")
          .select(col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"))
        val renamed = Joins.renameCollisions(old, updated,
          joinKeys = Seq("o_orderkey"), suffix = "_new")
        old.join(renamed, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_totalprice_new"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  o_totalprice * 1.1 AS o_totalprice_new
             |FROM orders ORDER BY o_orderkey""".stripMargin)),


    // ------------------------------------------------------------ flattens
    // vcFlatten semantics (README.md:643-666): nest orders into an
    // array-of-structs per customer, then explode+project back — DuckDB
    // sees the flat equivalent.
    "flatten_explode_structs" -> QuerySpec(
      (s, d) => {
        val nested = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(sort_array(collect_list(struct(
            col("o_orderkey").as("okey"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").as("price")))).as("days"))
        Flatten.explodeStructs(nested, "days",
          scalars = Seq("o_custkey" -> "cust"),
          fields = Seq("okey" -> "okey", "status" -> "status", "price" -> "price"))
          .orderBy(col("okey"))
      },
      Some("""SELECT o_custkey AS cust, o_orderkey AS okey,
             |  o_orderstatus AS status, o_totalprice AS price
             |FROM orders ORDER BY okey""".stripMargin)),


    // omUnzip semantics (README.md:693-725) distributed: build parallel
    // arrays per order, then arrays_zip+explode them back to rows. The
    // nested shape is STAGED once (parquet) so repeated invocations — and
    // the bench — measure the unzip operator, not the 150k-group
    // collect_list harness that synthesizes the shape from flat TPC-H.
    "flatten_arrays_zip" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "nested_lineitem") { p =>
          t(s, d, "lineitem")
            .groupBy(col("l_orderkey"))
            .agg(sort_array(collect_list(struct(
              col("l_linenumber").as("ln"),
              col("l_quantity").as("qty")))).as("rows"))
            .select(col("l_orderkey"),
              Flatten.parallelArrays(col("rows"), Seq("ln", "qty")).as("daily"))
            .write.mode("overwrite").parquet(p)
        }
        Flatten.unzipParallelArrays(s.read.parquet(dir), "daily",
          scalars = Seq("l_orderkey" -> "l_orderkey"))
          .orderBy(col("l_orderkey"), col("ln"), col("qty"))
      },
      Some("""SELECT l_orderkey, l_linenumber AS ln, l_quantity AS qty
             |FROM lineitem ORDER BY l_orderkey, ln, qty""".stripMargin)),


    // posexplode_outer: index-preserving explode that also KEEPS rows
    // whose array is empty (plain explode silently drops them — the
    // outer variant is what a row-count-preserving pipeline needs).
    "flatten_posexplode_outer" -> QuerySpec(
      (s, d) => {
        val nested = t(s, d, "orders")
          .withColumn("digits",
            when(col("o_orderkey") % 10 === 0, array().cast(ArrayType(StringType)))
              .otherwise(split(col("o_orderkey").cast(StringType), "")))
        nested.select(col("o_orderkey"),
          posexplode_outer(col("digits")).as(Seq("pos", "digit")))
          .orderBy(col("o_orderkey"), col("pos"))
      },
      Some("""WITH nested AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 10 = 0 THEN []
             |         ELSE string_split(CAST(o_orderkey AS VARCHAR), '') END AS digits
             |  FROM orders),
             |ex AS (
             |  SELECT o_orderkey,
             |    unnest(CASE WHEN len(digits) = 0 THEN [NULL] ELSE digits END) AS digit,
             |    unnest(CASE WHEN len(digits) = 0 THEN [NULL]
             |           ELSE range(0, len(digits)) END) AS pos
             |  FROM nested)
             |SELECT o_orderkey, CAST(pos AS INTEGER) AS pos, CAST(digit AS VARCHAR) AS digit
             |FROM ex ORDER BY o_orderkey, pos""".stripMargin)),
  )
}
