package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Stream family of the operator catalog (12 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogStream {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // CDC MERGE (extension tier of §2.10): an I/U/D change batch with a
    // per-key sequence is applied last-writer-wins — the general form of
    // the reference's upsert (which has no deletes). The batch is
    // derived deterministically from the target itself (key residues mod
    // 4: update / delete / update-then-delete conflict + re-insert under
    // a new key / untouched), so DuckDB can state the FINAL table
    // directly — an independent derivation, not a re-simulation.
    "upsert_cdc_apply" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "orders").filter(col("o_orderkey") < 3000)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
        val m = col("k") % 4
        val updates = base.filter(m === 0).select(col("k"),
          (col("price") + 1000).as("price"), lit("U").as("op"), lit(1L).as("seq"))
        val deletes = base.filter(m === 1).select(col("k"),
          lit(null).cast(DoubleType).as("price"), lit("D").as("op"), lit(1L).as("seq"))
        val conflictU = base.filter(m === 2).select(col("k"),
          (col("price") * 2).as("price"), lit("U").as("op"), lit(1L).as("seq"))
        val conflictD = base.filter(m === 2).select(col("k"),
          lit(null).cast(DoubleType).as("price"), lit("D").as("op"), lit(2L).as("seq"))
        val inserts = base.filter(m === 2).select((col("k") + 1000000L).as("k"),
          col("price"), lit("I").as("op"), lit(1L).as("seq"))
        val changes = updates.unionByName(deletes).unionByName(conflictU)
          .unionByName(conflictD).unionByName(inserts)
        Upsert.applyChanges(base, changes, Seq("k")).orderBy(col("k"))
      },
      Some("""SELECT k, price FROM (
             |  SELECT o_orderkey AS k, o_totalprice + 1000 AS price
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 3
             |  UNION ALL
             |  SELECT o_orderkey + 1000000, o_totalprice
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 2
             |) ORDER BY k""".stripMargin)),


    // TIME TRAVEL over the same change log (Upsert.stateAt): the state
    // AS OF seq 1 — after the first change wave but BEFORE the seq-2
    // delete that resolves the update-then-delete conflict, so the
    // conflicted keys (mod 4 = 2) surface with their ×2 update STILL
    // VISIBLE, the version upsert_cdc_apply's latest-state view can
    // never show. The log alone is the source of truth (base rows ride
    // as I ops at seq 0); duplicate (key,seq) and unknown ops
    // raise_error in-plan. DuckDB states the as-of-1 table directly —
    // an independent derivation, not a log re-simulation.
    "upsert_time_travel" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "orders").filter(col("o_orderkey") < 3000)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
        val m = col("k") % 4
        val initial = base.select(col("k"), col("price"),
          lit("I").as("op"), lit(0L).as("seq"))
        val updates = base.filter(m === 0).select(col("k"),
          (col("price") + 1000).as("price"), lit("U").as("op"), lit(1L).as("seq"))
        val deletes = base.filter(m === 1).select(col("k"),
          lit(null).cast(DoubleType).as("price"), lit("D").as("op"), lit(1L).as("seq"))
        val conflictU = base.filter(m === 2).select(col("k"),
          (col("price") * 2).as("price"), lit("U").as("op"), lit(1L).as("seq"))
        val conflictD = base.filter(m === 2).select(col("k"),
          lit(null).cast(DoubleType).as("price"), lit("D").as("op"), lit(2L).as("seq"))
        val inserts = base.filter(m === 2).select((col("k") + 1000000L).as("k"),
          col("price"), lit("I").as("op"), lit(1L).as("seq"))
        val log = initial.unionByName(updates).unionByName(deletes)
          .unionByName(conflictU).unionByName(conflictD).unionByName(inserts)
        Upsert.stateAt(log, Seq("k"), asOfSeq = 1L).orderBy(col("k"))
      },
      Some("""SELECT k, price FROM (
             |  SELECT o_orderkey AS k, o_totalprice + 1000 AS price
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice * 2
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 2
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 3
             |  UNION ALL
             |  SELECT o_orderkey + 1000000, o_totalprice
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 2
             |) ORDER BY k""".stripMargin)),


    // SCD Type-2 history build (§2.10 extension): the change log is the
    // orders table itself — entity = o_custkey % 300, version order =
    // o_orderkey, tracked attributes = (status, priority). Consecutive
    // identical snapshots collapse; validity chains via lead(). The
    // oracle restates the two-window formulation independently with
    // IS DISTINCT FROM.
    "upsert_scd2_history" -> QuerySpec(
      (s, d) => {
        val log = t(s, d, "orders").select(
          (col("o_custkey") % 300).as("k"), col("o_orderkey").as("seq"),
          col("o_orderstatus").as("status"), col("o_orderpriority").as("prio"))
        Upsert.scd2(log, Seq("k"), "seq", Seq("status", "prio"))
          .orderBy(col("k"), col("valid_from"))
      },
      Some("""WITH log AS (
             |  SELECT o_custkey % 300 AS k, o_orderkey AS seq,
             |    o_orderstatus AS status, o_orderpriority AS prio
             |  FROM orders),
             |chg AS (
             |  SELECT *,
             |    (ROW_NUMBER() OVER w = 1
             |     OR status IS DISTINCT FROM lag(status) OVER w
             |     OR prio IS DISTINCT FROM lag(prio) OVER w) AS is_chg
             |  FROM log WINDOW w AS (PARTITION BY k ORDER BY seq)),
             |v AS (SELECT k, seq, status, prio FROM chg WHERE is_chg)
             |SELECT k, status, prio, seq AS valid_from,
             |  lead(seq) OVER w2 AS valid_to,
             |  (lead(seq) OVER w2 IS NULL) AS is_current
             |FROM v WINDOW w2 AS (PARTITION BY k ORDER BY seq)
             |ORDER BY k, valid_from""".stripMargin)),


    // Snapshot diff (upsert verification): `after` drops every 7th key,
    // re-prices every 5th, and adds a shifted-key slice — the engine
    // diffs digest-slim sides through a full-outer join; the oracle
    // DERIVES each class directly from the residue arithmetic instead
    // of re-running a diff (independent formulation).
    "upsert_snapshot_diff" -> QuerySpec(
      (s, d) => {
        val before = t(s, d, "orders").filter(col("o_orderkey") < 5000)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
            col("o_totalprice").as("price"))
        val after = before.filter(col("k") % 7 =!= 0)
          .withColumn("price",
            when(col("k") % 5 === 0, col("price") + 10).otherwise(col("price")))
          .unionByName(before.filter(col("k") % 9 === 0)
            .select((col("k") + 1000000L).as("k"), col("status"), col("price")))
        Upsert.snapshotDiff(before, after, Seq("k"))
          .orderBy(col("k"))
      },
      Some("""SELECT k, diff_status FROM (
             |  SELECT o_orderkey + 1000000 AS k, 'added' AS diff_status
             |  FROM orders WHERE o_orderkey < 5000 AND o_orderkey % 9 = 0
             |  UNION ALL
             |  SELECT o_orderkey, 'removed'
             |  FROM orders WHERE o_orderkey < 5000 AND o_orderkey % 7 = 0
             |  UNION ALL
             |  SELECT o_orderkey, 'changed'
             |  FROM orders
             |  WHERE o_orderkey < 5000 AND o_orderkey % 7 <> 0
             |    AND o_orderkey % 5 = 0
             |) ORDER BY k""".stripMargin)),


    // Deletion-vector read (merge-on-read): deletes recorded at
    // METADATA grain — (file, row position) pairs, the
    // scan_row_provenance coordinates — and applied at scan time as a
    // broadcast anti-join, so a delete never rewrites a data file.
    // The lakehouse DV pattern at 100 TB: a MERGE touching 0.1% of
    // rows writes kilobytes of positions instead of re-staging
    // terabytes of parquet, while the scan keeps its pushdown/pruning
    // (the anti-join is on metadata columns the reader materializes
    // for free). Oracled: DV-filtered read ≡ the predicate complement.
    "upsert_deletion_vectors" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "upsert_dv") { p =>
          t(s, d, "orders").repartition(8, col("o_orderkey"))
            .write.mode("overwrite").parquet(p)
        }
        // the DV build is one provenance scan (a real MERGE emits these
        // positions as its write-side artifact)
        val dv = s.read.parquet(dir)
          .filter(col("o_orderkey") % 7 === 0)
          .select(col("_metadata.file_path").as("_dv_file"),
            col("_metadata.row_index").as("_dv_idx"))
        s.read.parquet(dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"),
            col("_metadata.file_path").as("_f"),
            col("_metadata.row_index").as("_i"))
          .join(broadcast(dv),
            col("_f") === col("_dv_file") && col("_i") === col("_dv_idx"),
            "left_anti")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
             |FROM orders WHERE o_orderkey % 7 <> 0
             |ORDER BY o_orderkey""".stripMargin)),


    // ------------------------------------------------ event-time windowing
    // Tumbling event-time window in batch form (SURVEY.md §2.10); the
    // streaming twin (readStream + watermark) is exercised in StreamingSpec.
    "stream_tumbling_agg" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"), dsum6(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("cnt"), col("sum_value"))
        .orderBy(col("ws")),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY ws""".stripMargin)),


    // SLIDING event-time windows (1h window, 30min slide): each event
    // lands in exactly windowSize/slide = 2 overlapping windows. The
    // oracle derives the same membership from time_bucket: the two
    // windows containing ts start at bucket(ts) and bucket(ts) − slide
    // (time_bucket's 2000-01-01 origin and Spark's epoch origin align
    // identically for divisors of an hour).
    "stream_sliding_agg" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"), dsum6(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("cnt"), col("sum_value"))
        .orderBy(col("ws")),
      Some("""WITH ev AS (
             |  SELECT CAST(time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
             |           AS TIMESTAMP) AS tb, value
             |  FROM events),
             |w AS (SELECT unnest([tb, tb - INTERVAL 30 MINUTE]) AS ws, value FROM ev)
             |SELECT ws, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM w GROUP BY 1 ORDER BY ws""".stripMargin)),


    // Native session_window (Spark's built-in gap-based session operator,
    // the streaming-capable form: state-store merging under watermarks).
    // Batch semantics oracled against the lag/running-sum construction.
    // Boundary semantics pinned by a unit test: an event at EXACTLY
    // prev_ts + gap still merges (closed boundary), so the oracle splits
    // on diff > 1800 only.
    "stream_session_window" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("ts_s", date_trunc("second", col("ts")))
        ev.groupBy(col("user_id"), session_window(col("ts_s"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_timestamp(col("sw.start")).as("sess_start"),
            col("n_events"))
          .orderBy(col("user_id"), col("sess_start"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, ep,
             |    CASE WHEN lag(ep) OVER w IS NULL THEN 1
             |         WHEN ep - lag(ep) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
             |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ep)),
             |sess AS (
             |  SELECT user_id, ep,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ep
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM flagged)
             |SELECT user_id, CAST(min(ep) AS BIGINT) AS sess_start, count(*) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, sess_start""".stripMargin)),


    // Streaming dedup, batch-form key (StreamOps.dedupWithinWatermark —
    // the dropDuplicatesWithinWatermark twin whose watermark-bounded
    // state eviction is what keeps a 100 TB/day dedup stream from the
    // classic unbounded-state OOM; the streaming path and its
    // state-eviction bound are exercised in StreamingSpec). Batch form
    // = withWatermark + dropDuplicates on the same code path; the
    // survivor ROW is engine-arbitrary when payloads differ, so the key
    // aggregates to the per-type distinct-user report (deterministic
    // by construction) with the raw count beside it — the dedup-rate
    // summary an ingest monitor actually reads.
    "stream_dedup_watermark" -> QuerySpec(
      (s, d) => {
        val survivors = graft.streaming.StreamOps.dedupWithinWatermark(
          t(s, d, "events").select(col("user_id"), col("event_type"), col("ts")),
          Seq("user_id", "event_type"), "ts", "1 hour")
        val raw = t(s, d, "events").groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_raw"))
        survivors.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_unique_users"))
          .join(raw, Seq("event_type"))
          .select(col("event_type"), col("n_unique_users"), col("n_raw"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_unique_users,
             |  CAST(count(*) AS BIGINT) AS n_raw
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),


    // Stream-stream time-range join, batch form (the StreamOps
    // .streamStreamJoin twin — StreamingSpec pins the micro-batch
    // equivalence on this exact shape): purchases joined to the views
    // that preceded them within 30 minutes per user — the
    // click-to-conversion lag table. An EQUI key (user) + a bounded
    // range residual ⇒ SortMergeJoin with a range filter, never a
    // cartesian; timestamps truncate to whole seconds (the sessionize
    // rule — events.ts is ns in parquet, µs in Spark), lag is exact
    // integer seconds.
    "stream_join_batch" -> QuerySpec(
      (s, d) => {
        val e = t(s, d, "events").filter(col("user_id").isNotNull)
          .withColumn("ep", unix_timestamp(date_trunc("second", col("ts"))))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ep").as("vts"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("r_user_id"),
            col("event_id").as("purchase_id"), col("ep").as("pts"))
        views.join(purchases,
            col("user_id") === col("r_user_id") &&
              col("pts") >= col("vts") && col("pts") <= col("vts") + 1800)
          .select(col("user_id"), col("view_id"), col("purchase_id"),
            (col("pts") - col("vts")).as("lag_seconds"))
          .orderBy(col("user_id"), col("view_id"), col("purchase_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
             |  FROM events WHERE user_id IS NOT NULL),
             |v AS (SELECT user_id, event_id AS view_id, ep AS vts
             |      FROM e WHERE event_type = 'view'),
             |p AS (SELECT user_id, event_id AS purchase_id, ep AS pts
             |      FROM e WHERE event_type = 'purchase')
             |SELECT v.user_id, view_id, purchase_id, pts - vts AS lag_seconds
             |FROM v JOIN p ON p.user_id = v.user_id
             |  AND p.pts >= v.vts AND p.pts <= v.vts + 1800
             |ORDER BY v.user_id, view_id, purchase_id""".stripMargin)),


    // Gap-based sessionization in SQL-window form (30-min gap): lag →
    // new-session flag → running sum = session id. Timestamps truncated to
    // whole seconds on both sides (events.ts is ns in parquet, µs in
    // Spark — sub-second precision would diverge). The stateful
    // flatMapGroupsWithState twin lives in StreamOps.sessionize and is
    // cross-checked against this in StreamingSpec.
    "stream_sessionize" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val ev = t(s, d, "events")
          .withColumn("ep", unix_timestamp(date_trunc("second", col("ts"))))
        val flagged = ev.withColumn("new_sess",
          when(lag(col("ep"), 1).over(w).isNull, 0)
            .when(col("ep") - lag(col("ep"), 1).over(w) > 1800, 1)
            .otherwise(0))
        val sess = flagged.withColumn("session_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        sess.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("first_event"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id,
             |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, ep,
             |    CASE WHEN lag(ep, 1) OVER w IS NULL THEN 0
             |         WHEN ep - lag(ep, 1) OVER w > 1800 THEN 1
             |         ELSE 0 END AS new_sess
             |  FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
             |sess AS (
             |  SELECT user_id, event_id,
             |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(event_id) AS first_event
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),


    // COMPOSED streaming ingest, batch form (r16 verdict ask #4): the
    // exact micro-batch function production deploys —
    // StreamOps.corpusPrepMergeBatch as foreachBatch would invoke it,
    // run over two batches into one accumulating corpus: batch 1
    // bootstraps, batch 2 brings novel docs PLUS exact recrawls of
    // every 9th batch-1 doc re-keyed at +10000 (same text, new id —
    // the crawler-revisit shape). Flow per batch: C4 line rules →
    // Gopher flags → in-batch exact dedup → bloom-prefiltered corpus
    // anti-join → MERGE (nearDup=false keeps every tier engine-exact;
    // the minhash band tiers are exercised in StreamingSpec and the
    // executor-loss path). Cross-batch state is the corpus itself plus
    // a vocabulary-BOUNDED bloom sketch (bytes ∝ expectedItems, never
    // rows — the state bound StreamingSpec pins). The oracle replays
    // quality + min-id-per-text dedup over the original ids: a recrawl
    // that slipped the bloom tier, a dropped novel doc, or text drift
    // all fail the hash (md5 of the stored C4-rebuilt text).
    "stream_corpus_ingest" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val firstLineDot = concat(array_join(slice(toks, 1, 8), " "), lit("."))
        val built = t(s, d, "documents").select(col("doc_id"), col("lang"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toks, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            lit("\n"), firstLineDot,
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        val dir = staged(d, "stream_corpus_ingest") { p =>
          val tgt = p + "/corpus"
          val ingest = graft.streaming.StreamOps.corpusPrepMergeBatch(
            tgt, "doc_id", "text", Seq("lang"),
            gopherMinWords = 30, gopherMinStopwords = 1,
            nearDup = false) _
          val b1 = built.filter(col("doc_id") < 250)
          val b2 = built.filter(col("doc_id") >= 250).unionByName(
            built.filter(col("doc_id") < 250 &&
                pmod(col("doc_id"), lit(9)) === 0)
              .select((col("doc_id") + 10000L).as("doc_id"),
                col("lang"), col("text")))
          ingest(b1, 0L)
          ingest(b2, 1L)
        }
        s.read.parquet(dir + "/corpus")
          .select(col("doc_id"), col("lang").cast(StringType).as("lang"),
            md5(col("text")).as("checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id, lang,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || chr(10) || array_to_string(toks[1:8], ' ') || '.'
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |c4 AS (
             |  SELECT doc_id, lang,
             |    list_filter(string_split(text, chr(10)),
             |      l -> regexp_matches(trim(l), '[.!?"]$')
             |           AND len(string_split_regex(trim(l), '\s+')) >= 5) AS kept,
             |    contains(lower(text), 'lorem ipsum') AS hl,
             |    contains(text, '{') AS hb
             |  FROM built),
             |c4k AS (
             |  SELECT doc_id, lang, array_to_string(kept, chr(10)) AS text
             |  FROM c4 WHERE NOT hl AND NOT hb AND len(kept) >= 3),
             |g AS (
             |  SELECT doc_id, lang, text,
             |    string_split_regex(lower(text), '\s+') AS w FROM c4k),
             |gf AS (
             |  SELECT doc_id, lang, text, len(w) AS nw,
             |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
             |      / len(w) AS mwl,
             |    len(regexp_extract_all(text, '#|\.\.\.')) AS nsym,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS nalpha,
             |    len(list_filter(['the','be','to','of','and','that','have','with'],
             |      s -> list_contains(w, s))) AS nstop
             |  FROM g),
             |gk AS (
             |  SELECT doc_id, lang, text FROM gf
             |  WHERE nw >= 30 AND nw <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
             |    AND CAST(nsym AS DOUBLE)/nw <= 0.1
             |    AND CAST(nalpha AS DOUBLE)/nw >= 0.8 AND nstop >= 1)
             |SELECT doc_id, lang, md5(text) AS checksum
             |FROM gk
             |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
             |ORDER BY doc_id""".stripMargin)),
  )
}
