package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** ScanSink family of the operator catalog (27 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogScanSink {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // ------------------------------------------- sources/sinks (oracled)
    // JSON scan round-trip: documents staged as JSON by a real writer,
    // read back through the JSON source with an EXPLICIT schema (inference
    // reads every file twice at scale — SURVEY §2.1). Any reader mangling
    // (escaping, unicode, schema drift) breaks the hash against the
    // parquet ground truth; the zh docs make it a real UTF-8 test.
    "scan_json" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_json") { p =>
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("source"), col("text"))
            .write.mode("overwrite").json(p)
        }
        val schema = new StructType()
          .add("doc_id", LongType).add("lang", StringType)
          .add("source", StringType).add("text", StringType)
        s.read.schema(schema).json(dir)
          .select(col("doc_id"), col("lang"), col("source"),
            length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, CAST(length(text) AS INTEGER) AS text_len
             |FROM documents ORDER BY doc_id""".stripMargin)),


    // File-path metadata extraction: documents staged as a
    // lang=…/source=… directory tree; the values are recovered ONLY from
    // file paths (input_file_name + regex — the reference's island/
    // location extraction, README.md:622-623), never read from the rows.
    "scan_filemeta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_filemeta") { p =>
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("source"))
            .write.mode("overwrite").partitionBy("lang", "source").json(p)
        }
        val raw = s.read.schema(new StructType().add("doc_id", LongType)).json(dir)
          .select(col("doc_id")) // drop discovered partition cols: path-only recovery
        Readers.withPathMeta(raw,
          islandPattern = "^.*/lang=([^/]+)/[^/]+/[^/]+$",
          locationPattern = "^.*/source=([^/]+)/[^/]+$")
          .groupBy(col("island").as("lang"), col("location_name").as("source"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT lang, source, count(*) AS cnt FROM documents
             |GROUP BY lang, source ORDER BY lang, source""".stripMargin)),


    // Partitioned parquet sink through the ACTUAL writer (dynamic
    // overwrite path), verified by re-reading and aggregating.
    "sink_parquet_partitioned" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "sink_parquet_partitioned") { p =>
          Upsert.writePartitioned(
            t(s, d, "orders")
              .withColumn("o_year", year(col("o_orderdate").cast(DateType))),
            p, Seq("o_year"))
        }
        s.read.parquet(dir)
          .groupBy(col("o_year"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS cnt,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin)),


    // JSONL corpus export through the ACTUAL writer (hive-partitioned
    // gzip shards, bounded shard count), verified at the STRONGEST
    // grain: the Spark side returns the SOURCE rows while DuckDB
    // parses the written shards themselves — gzip, JSON escaping, and
    // hive layout included — so a hash match proves the export is
    // byte-faithful AND foreign-engine-readable, not merely
    // Spark-round-trippable.
    "sink_jsonl_export" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        staged(d, "sink_jsonl_export") { p =>
          Upsert.exportJsonl(
            docs.select(col("doc_id"), col("lang"), col("source"),
              col("n_chars"), col("text")),
            p, Seq("lang"), shardCol = "doc_id", shardsPerPartition = 2)
        }
        docs.select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, n_chars, text
             |FROM read_json(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/sink_jsonl_export/*/*.json.gz',
             |  format='newline_delimited', hive_partitioning=1)
             |ORDER BY doc_id""".stripMargin)),


    // CSV corpus export through the ACTUAL writer, adversarially:
    // every row carries an embedded delimiter, double quote, newline
    // and leading space (deterministically injected — the fixture text
    // is too clean to exercise quoting), written RFC-4180 style
    // (escape = doubled quote, the dialect every foreign reader
    // speaks; Spark's default backslash escape is Spark-only). The
    // Spark side returns the SOURCE rows; DuckDB parses the written
    // shards — a hash match proves quoting, escaping, and quoted
    // newlines survive a foreign reader, not merely a Spark re-read.
    "sink_csv_export" -> QuerySpec(
      (s, d) => {
        val adversarial = (base: Column) => concat(
          lit(" lead,"), substring(base, 1, 30),
          lit(" \"quoted\" mid\nnext line, tail"))
        val docs = t(s, d, "documents").select(
          col("doc_id"), col("lang"), adversarial(col("text")).as("txt"))
        staged(d, "sink_csv_export") { p =>
          docs.coalesce(2).write
            .option("header", "true")
            .option("escape", "\"")
            // MEASURED: the WRITER defaults both of these to true and
            // silently trims field whitespace on the way out — a
            // lossy export unless disabled (the reader's same-named
            // options are a separate, read-side pair)
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .mode("overwrite").csv(p)
        }
        docs.orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, txt
             |FROM read_csv(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/sink_csv_export/*.csv',
             |  header=true, quote='"', escape='"', delim=',',
             |  columns={'doc_id':'BIGINT','lang':'VARCHAR','txt':'VARCHAR'})
             |ORDER BY doc_id""".stripMargin)),


    // MERGE through the ACTUAL on-disk path (write target → upsertIntoPath
    // → re-read): the agg_after_upsert key proves the merge algebra, this
    // one proves the dynamic-overwrite writer applies it durably.
    "sink_upsert" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "sink_upsert") { p =>
          val orders = t(s, d, "orders")
          Upsert.writePartitioned(orders, p, Seq("o_orderstatus"))
          val batch = orders
            .filter(col("o_orderdate") >= lit("1998-01-01").cast(TimestampType))
            .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
          Upsert.upsertIntoPath(s, p, batch, Seq("o_orderkey"), Seq("o_orderstatus"))
        }
        s.read.parquet(dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |  CAST(SUM(CAST(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
             |                     THEN o_totalprice * 1.1 ELSE o_totalprice END
             |           AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),


    // Empty-table bootstrap (reference README.md:1266-1282) + first load:
    // union against the typed empty frame must be a no-op on the result.
    "scan_empty_bootstrap" -> QuerySpec(
      (s, d) => {
        val orders = t(s, d, "orders")
        Readers.emptyBootstrap(s, orders.schema)
          .unionByName(orders.filter(col("o_orderstatus") === "F"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt FROM orders
             |WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),


    // Persistent-catalog round trip (the reference's crawler + catalog
    // table, README.md:762-780): register an external partitioned table,
    // then make an OUT-OF-BAND partition directory (written past the
    // catalog) visible via MSCK REPAIR TABLE. Without the repair the
    // purchase partition is missing and the hash fails — the oracle
    // checks the crawler semantics, not just the read.
    "catalog_msck_repair" -> QuerySpec(
      (s, d) => {
        val tbl = "graft_ext_events"
        val dir = staged(d, "catalog_msck") { p =>
          val events = t(s, d, "events")
          events.filter(col("event_type") =!= "purchase")
            .write.mode("overwrite").partitionBy("event_type").parquet(p)
          // the crawler scenario: a partition written directly into the
          // table location, bypassing any catalog-aware writer
          events.filter(col("event_type") === "purchase").drop("event_type")
            .write.mode("overwrite").parquet(s"$p/event_type=purchase")
        }
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(
          s"""CREATE TABLE $tbl (
             |  event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
             |  value DOUBLE, props STRING, event_type STRING)
             |USING PARQUET PARTITIONED BY (event_type) LOCATION '$dir'""".stripMargin)
        s.sql(s"MSCK REPAIR TABLE $tbl")
        s.table(tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum6(col("value")).as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),


    // CSV round-trip through the real writer/reader (header + explicit
    // schema; no timestamp column — CSV date/time formats are a config
    // surface, exercised in SourcesSpec). Doubles survive because both
    // engines print shortest-round-trip representations.
    "scan_csv" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_csv") { p =>
          t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderpriority"))
            .write.mode("overwrite").option("header", "true").csv(p)
        }
        val schema = new StructType()
          .add("o_orderkey", LongType).add("o_orderstatus", StringType)
          .add("o_totalprice", DoubleType).add("o_orderpriority", StringType)
        s.read.schema(schema).option("header", "true").csv(dir)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
             |FROM orders ORDER BY o_orderkey""".stripMargin)),


    // ORC round-trip: the columnar alternative sink/source, with the
    // aggregate running over the re-read copy (pushdown asserted in
    // SourcesSpec).
    "scan_orc" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_orc") { p =>
          t(s, d, "lineitem")
            .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
            .write.mode("overwrite").orc(p)
        }
        s.read.orc(dir)
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem WHERE l_returnflag = 'R'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),


    // Native XML round-trip (Spark 4 ships the former spark-xml as a
    // built-in source): stage the supplier table as element-per-row
    // XML, read it back with an EXPLICIT schema (inference is a
    // whole-extra-pass anti-pattern at 100 TB, same rule as the JSON
    // scans). DuckDB cannot parse XML, so the oracle recomputes the
    // expected rows from the ORIGINAL parquet — equality proves the
    // write+read round trip (escaping included) is value-faithful,
    // the sink_jsonl_export verification grain minus foreign
    // readability. Decimals surface as DOUBLE on both sides (the
    // presentation convention).
    "scan_xml" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_xml") { p =>
          t(s, d, "supplier")
            .select(col("s_suppkey").cast(LongType).as("s_suppkey"),
              col("s_name"), col("s_nationkey").cast(LongType).as("s_nationkey"),
              col("s_acctbal").cast(DoubleType).as("s_acctbal"))
            .write.mode("overwrite")
            .option("rootTag", "suppliers").option("rowTag", "supplier")
            .format("xml").save(p)
        }
        s.read
          .schema("s_suppkey LONG, s_name STRING, s_nationkey LONG, s_acctbal DOUBLE")
          .option("rowTag", "supplier").format("xml").load(dir)
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
             |  CAST(s_nationkey AS BIGINT) AS s_nationkey,
             |  CAST(s_acctbal AS DOUBLE) AS s_acctbal
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),


    // Schema evolution on read: two parquet generations in one table
    // directory — the old files lack o_orderstatus (an added column, the
    // reference's defensive runtime-column-discovery concern,
    // README.md:1248-1282, handled declaratively). mergeSchema=true
    // unions the footers; old rows surface NULL for the new column. The
    // oracle restates the generation split with an explicit NULL.
    "scan_merge_schema" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_merge_schema") { p =>
          val orders = t(s, d, "orders")
          orders.filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey"), col("o_totalprice"))
            .write.mode("overwrite").parquet(p)
          orders.filter(col("o_orderkey") % 2 === 1)
            .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
            .write.mode("append").parquet(p)
        }
        s.read.option("mergeSchema", "true").parquet(dir)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  CAST(NULL AS VARCHAR) AS o_orderstatus
             |FROM orders WHERE o_orderkey % 2 = 0
             |UNION ALL
             |SELECT o_orderkey, o_totalprice, o_orderstatus
             |FROM orders WHERE o_orderkey % 2 = 1
             |ORDER BY o_orderkey""".stripMargin)),


    // Bucketed co-located tables through the oracle: both sides written
    // bucketed on the join key (8 buckets), so the join plans with ZERO
    // Exchange (asserted in BucketingSpec); DuckDB states the plain join
    // over the same rows — bucketing must be invisible in the result.
    // Tables are (re)written once per JVM via staged(); bucket metadata
    // lives in the session catalog, so a fresh JVM rewrites them.
    "catalog_bucketed_join" -> QuerySpec(
      (s, d) => {
        val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
        val liT = s"graft_bkt_li_$suffix"
        val orT = s"graft_bkt_or_$suffix"
        if (!s.catalog.tableExists(liT)) {
          Upsert.writeBucketedTable(
            t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity")),
            liT, Seq("l_orderkey"), nBuckets = 8, sortCols = Seq("l_orderkey"))
        }
        if (!s.catalog.tableExists(orT)) {
          Upsert.writeBucketedTable(
            t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus")),
            orT, Seq("o_orderkey"), nBuckets = 8, sortCols = Seq("o_orderkey"))
        }
        s.table(liT)
          .join(s.table(orT), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),


    // Tolerant JSONL scan, ORACLED: staged ndjson derives from orders
    // (ground truth the oracle can restate) with a planted garbage file
    // in the same directory; PERMISSIVE routes the bad lines to
    // _corrupt_record, and the clean stream must equal the source rows
    // EXACTLY — a leaked corrupt row would surface as a NULL-columned
    // extra row and fail the hash. (That the garbage file is actually
    // read — not silently skipped — is unit-asserted in ReadersSpec.)
    "scan_jsonl_tolerant" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_jsonl_tolerant") { p =>
          t(s, d, "orders").filter(col("o_orderkey") < 500)
            .select(col("o_orderkey"), col("o_orderstatus"))
            .write.mode("overwrite").json(p)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(p, "zz_corrupt.json"),
            "{not json at all\n{\"o_orderkey\": \"dangling\n")
        }
        val schema = new StructType()
          .add("o_orderkey", LongType).add("o_orderstatus", StringType)
        Readers.jsonLinesTolerant(s, dir, schema)
          .filter(col("_corrupt_record").isNull)
          .select(col("o_orderkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),


    // Tolerant CSV ingest (Readers.csvTolerant) — the CSV twin of the
    // jsonl quarantine: unparseable rows land in _corrupt_record, the
    // clean side keeps flowing. Staged CSV shards + one corrupt file;
    // the oracle is the same parquet-derived clean rows.
    "scan_csv_tolerant" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_csv_tolerant") { p =>
          t(s, d, "orders").filter(col("o_orderkey") < 500)
            .select(col("o_orderkey"), col("o_orderstatus"))
            .write.mode("overwrite").option("header", "true").csv(p)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(p, "zz_corrupt.csv"),
            "o_orderkey,o_orderstatus\nnot_a_number,X\n1,2,3,too,many\n")
        }
        val schema = new StructType()
          .add("o_orderkey", LongType).add("o_orderstatus", StringType)
        Readers.csvTolerant(s, dir, schema)
          .filter(col("_corrupt_record").isNull)
          .select(col("o_orderkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),


    // DataSourceV2 connector, ORACLED: the fakemedia source's rows are
    // pure index arithmetic, so DuckDB can restate the whole scan from
    // range(). The media_id range predicate is PUSHED (partition
    // planning narrows to the [1000, 3000) chunk — unit-asserted in
    // FakeMediaSourceSpec); payload pruning means `bytes` is never
    // built for this projection.
    "scan_dsv2" -> QuerySpec(
      (s, d) => s.read.format("fakemedia")
        .option("count", 5000L).option("numPartitions", 8)
        .load()
        .filter(col("media_id") >= 1000L && col("media_id") < 3000L)
        .select(col("media_id"), col("kind"), col("width"), col("n_frames"))
        .orderBy(col("media_id")),
      Some("""SELECT i AS media_id,
             |  CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |    ELSE 'video' END AS kind,
             |  CAST((i % 64) * 16 + 16 AS INTEGER) AS width,
             |  CAST(i % 8 + 1 AS INTEGER) AS n_frames
             |FROM range(0, 5000) t(i)
             |WHERE i >= 1000 AND i < 3000
             |ORDER BY media_id""".stripMargin)),


    // Z-order (Morton) clustering key — exact bit interleaving, so the
    // oracle states the same shifts/masks in SQL. The layout-locality
    // property (second-dimension filters touch fewer files) is
    // unit-tested in LayoutSpec; this key pins the key arithmetic.
    "layout_zorder_key" -> QuerySpec(
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          Layout.zOrderKey(3, col("l_linenumber"), pmod(col("l_orderkey"), lit(8)))
            .as("zkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  ((( l_linenumber        >> 0) & 1) << 0) |
             |  ((((l_orderkey % 8)     >> 0) & 1) << 1) |
             |  ((( l_linenumber        >> 1) & 1) << 2) |
             |  ((((l_orderkey % 8)     >> 1) & 1) << 3) |
             |  ((( l_linenumber        >> 2) & 1) << 4) |
             |  ((((l_orderkey % 8)     >> 2) & 1) << 5) AS zkey
             |FROM lineitem WHERE l_orderkey < 2000
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),


    // Per-file skipping stats over a STAGED z-ordered write — the
    // data-skipping index a table format maintains, computed via the
    // hidden _metadata column. File NAMES are writer-run-specific ⇒
    // rows-only (names dropped, rows ordered by the min key); the
    // stats-vs-actual-pruning agreement is unit-tested in LayoutSpec,
    // and the layout's REASON TO EXIST is checked in-query: bound_ok=1
    // asserts per-file stat sanity (min ≤ max, n_rows > 0, files
    // present) AND that the summed per-file bounding-box area stays
    // under 75% of files × the 64×64 domain — an unclustered write
    // gives every file the full domain (ratio ≈ 1.0), while 4
    // z-range-partitioned files cover ~a quadrant each (ratio ≈ 0.25;
    // sampled split points straddling Morton quadrant boundaries can
    // widen boxes, bounded by ~0.56 even with every split misplaced).
    "layout_file_stats" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_zorder_files") { p =>
          Layout.writeZOrdered(
            t(s, d, "lineitem").select(
              pmod(col("l_orderkey"), lit(64)).as("ok"),
              pmod(col("l_partkey"), lit(64)).as("pk"),
              col("l_quantity")),
            p, nFiles = 4, bits = 6, "ok", "pk")
        }
        val stats = Layout.fileStats(s.read.parquet(dir), Seq("ok", "pk"))
          .drop("file_path", "file")
          .withColumn("__area",
            (col("ok_max") - col("ok_min") + 1) *
              (col("pk_max") - col("pk_min") + 1))
        // 1-row scalar broadcast (the prep_winsorize frame shape): the
        // coverage ceiling needs the ACROSS-file area sum
        val totals = stats.agg(
          sum(col("__area")).as("__sum_area"),
          count(lit(1)).as("__n_files"))
        stats.crossJoin(broadcast(totals))
          .withColumn("coverage_ratio",
            col("__sum_area").cast(DoubleType) /
              (col("__n_files") * lit(64.0 * 64.0)))
          .withColumn("bound_ok",
            (col("ok_min") <= col("ok_max") &&
              col("pk_min") <= col("pk_max") &&
              col("n_rows") > 0L && col("__n_files") > 0L &&
              col("coverage_ratio") <= lit(0.75)).cast(IntegerType))
          .drop("__area", "__sum_area", "__n_files")
          .orderBy(col("ok_min"), col("pk_min"), col("n_rows"))
      },
      None,
      allowBnlj = true),


    // HASH-EXACT twin of layout_file_stats (r16, r15 verdict ask #5):
    // the per-file min/max/count stats are plain integers DERIVED FROM
    // THE STAGED BYTES, so once the z-ordered write exists both engines
    // can compute them from the same files — DuckDB groups
    // read_parquet(filename=true) by file exactly as fileStats groups
    // by _metadata.file_path. File names still never appear (dropped,
    // rows totally ordered by the stat columns); the parent's full
    // verdict (stat sanity + the ≤0.75 coverage ceiling that proves
    // the clustering worked) rides as bound_ok, stated by the oracle
    // as the constant 1 — a drifting writer or a broken layout flips
    // it and fails the driver hash gate. Staged-path oracle class:
    // compares clean at sf0.01 (the driver's correctness dataset),
    // like every /tmp/graft_stage-reading key.
    "layout_file_stats_checked" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_zorder_files") { p =>
          Layout.writeZOrdered(
            t(s, d, "lineitem").select(
              pmod(col("l_orderkey"), lit(64)).as("ok"),
              pmod(col("l_partkey"), lit(64)).as("pk"),
              col("l_quantity")),
            p, nFiles = 4, bits = 6, "ok", "pk")
        }
        val stats = Layout.fileStats(s.read.parquet(dir), Seq("ok", "pk"))
          .drop("file_path", "file")
          .withColumn("__area",
            (col("ok_max") - col("ok_min") + 1) *
              (col("pk_max") - col("pk_min") + 1))
        val totals = stats.agg(
          sum(col("__area")).as("__sum_area"),
          count(lit(1)).as("__n_files"))
        stats.crossJoin(broadcast(totals))
          .withColumn("bound_ok",
            (col("ok_min") <= col("ok_max") &&
              col("pk_min") <= col("pk_max") &&
              col("n_rows") > 0L && col("__n_files") > 0L &&
              col("__sum_area").cast(DoubleType) /
                (col("__n_files") * lit(64.0 * 64.0)) <= lit(0.75))
              .cast(IntegerType))
          .select(col("ok_min"), col("ok_max"), col("pk_min"),
            col("pk_max"), col("n_rows"), col("bound_ok"))
          .orderBy(col("ok_min"), col("pk_min"), col("n_rows"),
            col("ok_max"), col("pk_max"))
      },
      Some("""WITH fs AS (
             |  SELECT filename,
             |    min(ok) AS ok_min, max(ok) AS ok_max,
             |    min(pk) AS pk_min, max(pk) AS pk_max,
             |    count(*) AS n_rows
             |  FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_zorder_files/*.parquet',
             |    filename=true)
             |  GROUP BY filename)
             |SELECT ok_min, ok_max, pk_min, pk_max, n_rows,
             |  CAST(1 AS INTEGER) AS bound_ok
             |FROM fs
             |ORDER BY ok_min, pk_min, n_rows, ok_max, pk_max""".stripMargin),
      allowBnlj = true),

    // Stats-based file-pruning SEMANTICS over the same staged z-order
    // layout (r16): the property every data-skipping index lives by —
    // a file whose [min, max] box excludes the predicate range must
    // contribute ZERO matching rows, or pruning silently drops data.
    // Per file: the skipping stats, the ACTUAL match count under the
    // predicate ok BETWEEN 8 AND 15 (the quadrant slice the z-order
    // write clusters for), the pruned verdict from the stats alone,
    // and bound_ok = pruned ⇒ n_match = 0 — hash-checked end to end
    // (both engines recompute everything from the same staged files;
    // staged-path oracle class, sf0.01).
    "layout_stats_prune" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_zorder_files") { p =>
          Layout.writeZOrdered(
            t(s, d, "lineitem").select(
              pmod(col("l_orderkey"), lit(64)).as("ok"),
              pmod(col("l_partkey"), lit(64)).as("pk"),
              col("l_quantity")),
            p, nFiles = 4, bits = 6, "ok", "pk")
        }
        s.read.parquet(dir)
          .select(col("_metadata.file_path").as("_fp"), col("ok"))
          .groupBy(col("_fp"))
          .agg(min(col("ok")).as("ok_min"), max(col("ok")).as("ok_max"),
            count(lit(1)).as("n_rows"),
            sum(when(col("ok").between(8, 15), 1L).otherwise(0L))
              .as("n_match"))
          .withColumn("pruned",
            (col("ok_max") < 8 || col("ok_min") > 15).cast(IntegerType))
          .withColumn("bound_ok",
            (col("pruned") === 0 || col("n_match") === 0L)
              .cast(IntegerType))
          .select(col("ok_min"), col("ok_max"), col("n_rows"),
            col("n_match"), col("pruned"), col("bound_ok"))
          .orderBy(col("ok_min"), col("ok_max"), col("n_rows"))
      },
      Some("""WITH fs AS (
             |  SELECT filename,
             |    min(ok) AS ok_min, max(ok) AS ok_max, count(*) AS n_rows,
             |    CAST(SUM(CASE WHEN ok BETWEEN 8 AND 15 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_match
             |  FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_zorder_files/*.parquet',
             |    filename=true)
             |  GROUP BY filename)
             |SELECT ok_min, ok_max, n_rows, n_match,
             |  CAST(CASE WHEN ok_max < 8 OR ok_min > 15 THEN 1 ELSE 0 END
             |    AS INTEGER) AS pruned,
             |  CAST(CASE WHEN (ok_max < 8 OR ok_min > 15) AND n_match > 0
             |    THEN 0 ELSE 1 END AS INTEGER) AS bound_ok
             |FROM fs ORDER BY ok_min, ok_max, n_rows""".stripMargin)),


    // Row-level PROVENANCE from the hidden `_metadata` column: every
    // record maps back to (file, row position) with zero extra I/O —
    // the training-data lineage hook ("which shard and offset did this
    // example come from") that audit and reproducibility pipelines
    // attach at ingest, and the record-grain companion to
    // layout_file_stats' file-grain view. Fully oracled: DuckDB
    // produces the same positions via read_parquet(file_row_number),
    // so the two engines agree on the physical row order contract.
    // Like the staged-path oracles, the literal path pins this key to
    // the sf0.01 dataset.
    "scan_row_provenance" -> QuerySpec(
      (s, d) => s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"),
          col("_metadata.file_name").as("file_name"),
          col("_metadata.row_index").as("row_idx"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  regexp_extract(filename, '([^/]+)$', 1) AS file_name,
             |  CAST(file_row_number AS BIGINT) AS row_idx
             |FROM read_parquet('/root/testdata/sf0.01/documents.parquet',
             |  filename = true, file_row_number = true)
             |ORDER BY doc_id""".stripMargin)),


    // Whole-file binary source (spark.read.format("binaryFile")) — the
    // ingestion shape for media/document blobs before any decode. Staged
    // CSV bytes are deterministic (hash-partitioned + sorted writer), so
    // both engines hash the SAME bytes: Spark md5 over the binary
    // column, DuckDB md5(decode(read_blob(...))) over the same files.
    // The oracle path is the staged dir for the CORRECTNESS dataset
    // (sf0.01 — the only sf the driver oracles; Verify stages before
    // DuckDB reads). File content vs java.nio ground truth is
    // additionally unit-asserted in ReadersSpec.
    "scan_binaryfile" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_binaryfile") { p =>
          t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderpriority"))
            .repartition(4, col("o_orderkey"))
            .sortWithinPartitions(col("o_orderkey"))
            .write.mode("overwrite").option("header", "true").csv(p)
        }
        Readers.readBinaryFiles(s, dir, "*.csv")
          .select(length(col("content")).as("n_bytes"),
            md5(col("content")).as("digest"))
          .orderBy(col("digest"))
      },
      Some("""SELECT CAST(octet_length(content) AS INTEGER) AS n_bytes,
             |  md5(decode(content)) AS digest
             |FROM read_blob(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/scan_binaryfile/*.csv')
             |ORDER BY digest""".stripMargin)),

    // Avro container-file ROUND-TRIP without the spark-avro connector
    // (absent from /opt/spark/jars; avro-core is present) — the r16
    // closure of the "Avro: correctly not attempted" item, built on
    // the multimodal discipline: writeAvroParts emits one container
    // file per task via avro-core's DataFileWriter (the Spark
    // file-sink layout contract), readAvro decodes them back through
    // binaryFile + per-task DataFileReader into an explicit schema.
    // The oracle never touches avro bytes (DuckDB has no reader):
    // the ROUND-TRIP is the check — the read-back rows must equal the
    // source projection exactly, the sink_csv_export pattern. A
    // corrupted write, a dropped row, a type coercion, or a broken
    // decode all fail the hash.
    "scan_avro_roundtrip" -> QuerySpec(
      (s, d) => {
        val proj = t(s, d, "orders")
          .select(col("o_orderkey").cast(LongType).as("o_orderkey"),
            col("o_custkey").cast(LongType).as("o_custkey"),
            col("o_orderstatus").cast(StringType).as("o_orderstatus"),
            col("o_totalprice").cast(DoubleType).as("o_totalprice"))
        val dir = staged(d, "avro_orders") { p =>
          graft.ops.AvroOps.writeAvroParts(
            proj.repartition(4, col("o_orderkey")), p)
        }
        graft.ops.AvroOps.readAvro(s, dir, proj.schema)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
             |  CAST(o_totalprice AS DOUBLE) AS o_totalprice
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Reader-schema PROJECTION over the same staged avro files: the
    // narrower StructType doubles as the Avro reader schema, so
    // standard Avro schema resolution makes the decoder SKIP the
    // unread fields' bytes — the column-pruning contract a parquet
    // scan gets from Catalyst, exercised at the decode seam (at 100 TB
    // you never materialize the 60 columns a 2-column query doesn't
    // read). Same round-trip oracle discipline: the projected rows
    // must equal the source projection exactly.
    "scan_avro_projection" -> QuerySpec(
      (s, d) => {
        val full = t(s, d, "orders")
          .select(col("o_orderkey").cast(LongType).as("o_orderkey"),
            col("o_custkey").cast(LongType).as("o_custkey"),
            col("o_orderstatus").cast(StringType).as("o_orderstatus"),
            col("o_totalprice").cast(DoubleType).as("o_totalprice"))
        val dir = staged(d, "avro_orders") { p =>
          graft.ops.AvroOps.writeAvroParts(
            full.repartition(4, col("o_orderkey")), p)
        }
        val narrow = StructType(Seq(
          StructField("o_orderkey", LongType, nullable = true),
          StructField("o_totalprice", DoubleType, nullable = true)))
        graft.ops.AvroOps.readAvro(s, dir, narrow)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
             |FROM orders ORDER BY o_orderkey""".stripMargin)),


    // Range-clustered layout twin of layout_file_stats: stage a
    // repartitionByRange+sortWithinPartitions write, read the per-file
    // skipping stats back. File names are writer-run-specific and the
    // range split points come from Spark's reservoir sampling ⇒
    // rows-only; the disjoint-leading-ranges property (the reason the
    // layout exists) is unit-asserted in LayoutSpec AND checked
    // in-query: bound_ok=1 asserts per-file min ≤ max, n_rows > 0, and
    // that each file's leading-column max ≤ the NEXT file's min (range
    // partitioning splits on the (shipdate, orderkey) tuple, so
    // adjacent files may SHARE a boundary date but never interleave —
    // the property point/range predicates prune on). The lag window is
    // partition-less over the 4 post-agg file rows, the sanctioned
    // tiny-frame shape (PlanSpec's vocab gate covers corpus-scale keys).
    "layout_range_cluster" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_range_files") { p =>
          Layout.writeRangeClustered(
            t(s, d, "lineitem")
              .select(col("l_shipdate"), col("l_orderkey"), col("l_quantity")),
            p, nFiles = 4, "l_shipdate", "l_orderkey")
        }
        val w = Window.orderBy(col("l_shipdate_min"), col("n_rows"))
        Layout.fileStats(s.read.parquet(dir), Seq("l_shipdate"))
          .drop("file_path", "file")
          .withColumn("__prev_max", lag(col("l_shipdate_max"), 1).over(w))
          .withColumn("bound_ok",
            (col("l_shipdate_min") <= col("l_shipdate_max") &&
              col("n_rows") > 0L &&
              (col("__prev_max").isNull ||
                col("__prev_max") <= col("l_shipdate_min")))
              .cast(IntegerType))
          .drop("__prev_max")
          .orderBy(col("l_shipdate_min"), col("n_rows"))
      },
      None),


    // HASH-EXACT twin of layout_range_cluster (the
    // layout_file_stats_checked pattern): per-file shipdate bounds and
    // row counts re-derived by DuckDB from the same staged files; the
    // disjoint-leading-ranges verdict (each file's max ≤ the next
    // file's min — the property range predicates prune on) rides as
    // bound_ok = 1. Staged-path oracle class (sf0.01).
    "layout_range_cluster_checked" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_range_files") { p =>
          Layout.writeRangeClustered(
            t(s, d, "lineitem")
              .select(col("l_shipdate"), col("l_orderkey"), col("l_quantity")),
            p, nFiles = 4, "l_shipdate", "l_orderkey")
        }
        val w = Window.orderBy(col("l_shipdate_min"), col("n_rows"))
        Layout.fileStats(s.read.parquet(dir), Seq("l_shipdate"))
          .drop("file_path", "file")
          .withColumn("__prev_max", lag(col("l_shipdate_max"), 1).over(w))
          .withColumn("bound_ok",
            (col("l_shipdate_min") <= col("l_shipdate_max") &&
              col("n_rows") > 0L &&
              (col("__prev_max").isNull ||
                col("__prev_max") <= col("l_shipdate_min")))
              .cast(IntegerType))
          .select(col("l_shipdate_min"), col("l_shipdate_max"),
            col("n_rows"), col("bound_ok"))
          .orderBy(col("l_shipdate_min"), col("n_rows"),
            col("l_shipdate_max"))
      },
      Some("""WITH fs AS (
             |  SELECT filename,
             |    min(l_shipdate) AS l_shipdate_min,
             |    max(l_shipdate) AS l_shipdate_max,
             |    count(*) AS n_rows
             |  FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_range_files/*.parquet',
             |    filename=true)
             |  GROUP BY filename)
             |SELECT l_shipdate_min, l_shipdate_max, n_rows,
             |  CAST(1 AS INTEGER) AS bound_ok
             |FROM fs
             |ORDER BY l_shipdate_min, n_rows, l_shipdate_max""".stripMargin)),


    // Compression-codec comparison over the SAME rows (the storage
    // lever: at 100 TB the parquet codec choice is tens of TB and the
    // scan-throughput/CPU trade): stage one lineitem projection under
    // uncompressed/snappy/zstd/gzip, read back per-codec file counts
    // and byte totals via the binaryFile source (distributed footer/
    // length metadata — file CONTENT is never read), and row counts
    // via parquet count (footer stats). Byte totals are
    // writer/version-specific ⇒ rows-only, with the layout-keys
    // discipline: bound_ok=1 asserts every codec preserved the row
    // count AND every real codec beats uncompressed bytes. The tiny
    // 4-row frame carries the cross-codec window comparisons.
    "layout_codec_stats" -> QuerySpec(
      (s, d) => {
        val codecs = Seq("uncompressed", "snappy", "zstd", "gzip")
        val perCodec = codecs.map { c =>
          val dir = staged(d, s"layout_codec_$c") { p =>
            t(s, d, "lineitem")
              .select(col("l_orderkey"), col("l_partkey"),
                col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
              .write.option("compression", c).mode("overwrite").parquet(p)
          }
          val files = s.read.format("binaryFile").load(dir + "/*.parquet")
            .agg(count(lit(1)).as("n_files"), sum(col("length")).as("bytes"))
            .select(lit(c).as("codec"), col("n_files"), col("bytes"))
          val rows = s.read.parquet(dir).agg(count(lit(1)).as("n_rows"))
            .select(lit(c).as("codec"), col("n_rows"))
          files.join(rows, Seq("codec"))
        }.reduce(_ unionByName _)
        val wAll = Window.orderBy(col("codec"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        perCodec
          .withColumn("__base",
            max(when(col("codec") === "uncompressed", col("bytes"))).over(wAll))
          .withColumn("ratio", col("bytes").cast(DoubleType) / col("__base"))
          .withColumn("bound_ok",
            (col("n_rows") === max(col("n_rows")).over(wAll) &&
              col("n_rows") === min(col("n_rows")).over(wAll) &&
              col("n_files") > 0L &&
              (col("codec") === "uncompressed" ||
                col("bytes") < col("__base"))).cast(IntegerType))
          .drop("__base")
          .orderBy(col("codec"))
      },
      None,
      allowBnlj = true),


    // HASH-EXACT twin of layout_codec_stats: the "writer-specific"
    // byte totals are still totals over the SAME staged bytes both
    // engines can read — DuckDB's read_blob gives per-file
    // octet_length (n_files, bytes) and read_parquet the row count, so
    // the whole row is oracle-derivable, verdict included. Staged-path
    // oracle class (sf0.01).
    "layout_codec_stats_checked" -> QuerySpec(
      (s, d) => {
        val codecs = Seq("uncompressed", "snappy", "zstd", "gzip")
        val perCodec = codecs.map { c =>
          val dir = staged(d, s"layout_codec_$c") { p =>
            t(s, d, "lineitem")
              .select(col("l_orderkey"), col("l_partkey"),
                col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
              .write.option("compression", c).mode("overwrite").parquet(p)
          }
          val files = s.read.format("binaryFile").load(dir + "/*.parquet")
            .agg(count(lit(1)).as("n_files"), sum(col("length")).as("bytes"))
            .select(lit(c).as("codec"), col("n_files"), col("bytes"))
          val rows = s.read.parquet(dir).agg(count(lit(1)).as("n_rows"))
            .select(lit(c).as("codec"), col("n_rows"))
          files.join(rows, Seq("codec"))
        }.reduce(_ unionByName _)
        val wAll = Window.orderBy(col("codec"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        perCodec
          .withColumn("__base",
            max(when(col("codec") === "uncompressed", col("bytes"))).over(wAll))
          .withColumn("bound_ok",
            (col("n_rows") === max(col("n_rows")).over(wAll) &&
              col("n_rows") === min(col("n_rows")).over(wAll) &&
              col("n_files") > 0L &&
              (col("codec") === "uncompressed" ||
                col("bytes") < col("__base"))).cast(IntegerType))
          .select(col("codec"), col("n_files"), col("bytes"),
            col("n_rows"), col("bound_ok"))
          .orderBy(col("codec"))
      },
      Some(Seq("uncompressed", "snappy", "zstd", "gzip").map { c =>
        s"""SELECT '$c' AS codec,
           |  (SELECT count(*) FROM read_blob(
           |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_codec_$c/*.parquet'))
           |    AS n_files,
           |  (SELECT CAST(sum(octet_length(content)) AS BIGINT) FROM read_blob(
           |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_codec_$c/*.parquet'))
           |    AS bytes,
           |  (SELECT count(*) FROM read_parquet(
           |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_codec_$c/*.parquet'))
           |    AS n_rows,
           |  CAST(1 AS INTEGER) AS bound_ok""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY codec")),
      allowBnlj = true),


    // Small-file compaction planning (Layout.compactionPlan): stage the
    // documents table deliberately FRAGMENTED (24 small files — the
    // state a streaming/upsert writer leaves behind), then plan
    // contiguous target-size rewrite bins from a `_metadata`-only scan
    // (no data pages read). The OPTIMIZE planning step of a lakehouse
    // table; greedy offset binning overflows a bin by at most its one
    // straddling file, asserted per row (bin_bytes ≤ target +
    // max_file_bytes), with ≥1 file and internal consistency
    // (max_file_bytes ≤ bin_bytes) — file names/sizes are
    // writer-specific ⇒ rows-only with the checked bound.
    "layout_compaction_plan" -> QuerySpec(
      (s, d) => {
        // sf0.01's 24 staged shards are ~5 KB each — 16 KB targets give
        // a multi-bin plan (≈3 files/bin) at every SF
        val target = 16L * 1024
        val dir = staged(d, "layout_compaction") { p =>
          t(s, d, "documents").repartition(24)
            .write.mode("overwrite").parquet(p)
        }
        Layout.compactionPlan(s.read.parquet(dir), targetBytes = target)
          .withColumn("bound_ok",
            (col("n_files") >= 1L &&
              col("max_file_bytes") <= col("bin_bytes") &&
              col("bin_bytes") <= lit(target) + col("max_file_bytes"))
              .cast(IntegerType))
          .select(col("bin"), col("n_files"), col("bin_bytes"),
            col("max_file_bytes"), col("bound_ok"))
          .orderBy(col("bin"))
      },
      None),


    // EXECUTE the compaction plan (r16 verdict ask #5 — the apply leg
    // that closes layout_compaction_plan's rows-only note with a
    // hash-exact twin): Layout.compactionApply rewrites each planned
    // file group as ONE file under bin=<k>/ (asserting the census
    // in-operator), then BOTH engines re-derive row count + an
    // order-invariant content checksum from the SAME staged bytes —
    // the fragmented source (bin = -1 totals row) and the compacted
    // output (per-bin rows, with the bin column read back through
    // partition inference). A dropped row, a duplicated file, a bin
    // that split, or any content drift fails the hash; census_ok pins
    // the one-file-per-bin contract in the result itself.
    "layout_compaction_apply" -> QuerySpec(
      (s, d) => {
        val target = 16L * 1024
        val fragDir = staged(d, "layout_compaction") { p =>
          t(s, d, "documents").repartition(24)
            .write.mode("overwrite").parquet(p)
        }
        val appliedDir = staged(d, "layout_compaction_applied") { p =>
          Layout.compactionApply(s, fragDir, p, target)
        }
        def chk(c: Column*) = conv(substring(md5(concat_ws("|", c: _*)),
          1, 12), 16, 10).cast(LongType)
        val rowChk = chk(col("doc_id").cast(StringType), col("text"),
          col("lang"), col("source"), col("n_chars").cast(StringType))
        val before = s.read.parquet(fragDir)
          .select(rowChk.as("chk"), col("_metadata.file_path").as("fp"))
          .agg(countDistinct(col("fp")).as("n_files"),
            count(lit(1)).as("n_rows"), sum(col("chk")).as("checksum"))
          .select(lit(-1L).as("bin"), col("n_files"), col("n_rows"),
            col("checksum"))
        val after = s.read.parquet(appliedDir)
          .select(col("bin").cast(LongType).as("bin"), rowChk.as("chk"),
            col("_metadata.file_path").as("fp"))
          .groupBy(col("bin"))
          .agg(countDistinct(col("fp")).as("n_files"),
            count(lit(1)).as("n_rows"), sum(col("chk")).as("checksum"))
        before.unionByName(after)
          .withColumn("census_ok",
            (col("bin") === -1L || col("n_files") === 1L).cast(IntegerType))
          .orderBy(col("bin"))
      },
      Some("""WITH chk AS (
             |  SELECT ('0x' || substr(md5(concat_ws('|',
             |    CAST(doc_id AS VARCHAR), text, lang, source,
             |    CAST(n_chars AS VARCHAR))), 1, 12))::BIGINT AS c,
             |    filename AS fp, CAST(-1 AS BIGINT) AS bin
             |  FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_compaction/*.parquet',
             |    filename=true)),
             |chk2 AS (
             |  SELECT ('0x' || substr(md5(concat_ws('|',
             |    CAST(doc_id AS VARCHAR), text, lang, source,
             |    CAST(n_chars AS VARCHAR))), 1, 12))::BIGINT AS c,
             |    filename AS fp, CAST(bin AS BIGINT) AS bin
             |  FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_compaction_applied/bin=*/*.parquet',
             |    filename=true, hive_partitioning=1)),
             |u AS (SELECT * FROM chk UNION ALL SELECT * FROM chk2)
             |SELECT bin, count(DISTINCT fp) AS n_files,
             |  count(*) AS n_rows, CAST(sum(c) AS BIGINT) AS checksum,
             |  CAST(CASE WHEN bin = -1 OR count(DISTINCT fp) = 1
             |    THEN 1 ELSE 0 END AS INTEGER) AS census_ok
             |FROM u GROUP BY bin ORDER BY bin""".stripMargin)),
  )
}
