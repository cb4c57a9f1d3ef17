package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Misc family of the operator catalog (3 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogMisc {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // END-TO-END corpus preparation (CorpusPrep.prepare): C4 line rules
    // → Gopher flags → intra-doc line dedup → unigram-LM filter → fuzzy
    // dedup → split assignment, ONE composed call — the full pipeline an
    // LLM data team ships, with every intermediate text handoff
    // hash-verified (the output carries the final cleaned text). Fixture
    // is the text_c4_filter multi-line build plus a planted repeat of
    // the first line (with terminal '.', so C4 keeps it and the
    // line-dedup stage has real work; for doc_id % 3 != 0 it equals
    // line 0 exactly and collapses). Stage populations at sf0.01:
    // 500 → 441 (C4) → ~230 (Gopher, word-count + stopword rules both
    // active at minWords=30) → LM ≤ 3.79 (the rounded decimal-exact
    // statistic of text_unigram_logprob, ~p75 of the survivor
    // distribution) → fuzzy dedup at the oracled recall-first settings
    // (bands = numHashes = 64, miss p ≤ 1e-10; TRIGRAM shingles — see
    // CorpusPrep.prepare's default for why bigrams degenerate here) →
    // LCG splits. Fully
    // ORACLED: each stage restates the exact SQL its standalone key
    // already proved, composed as CTEs. The fuzzy stage's default
    // normalize seam is identity on this ASCII fixture (see
    // dedup_fuzzy_e2e's comment), so the oracle stays exact.
    "corpus_prep_e2e" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val firstLineDot = concat(array_join(slice(toks, 1, 8), " "), lit("."))
        val built = t(s, d, "documents").select(col("doc_id"),
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
        // STAGED unigram-LM fit (r16 verdict ask #1): the in-ladder fit
        // re-ran its token aggregation + model join on every pipeline
        // run; memoModel fits it ONCE per (dataset, JVM) on exactly the
        // ladder corpus the pipeline scores (ladderThroughLineDedup with
        // the same knobs ⇒ byte-identical fit input ⇒ identical model ⇒
        // identical verdicts — the frozen-vs-in-plan equality unit pin).
        // Vocab-grain collect, the bpeFit/bm25 budget class.
        val lm = memoModel(s, d, "corpus_prep_lm")(
          TextOps.unigramLmFit(
            CorpusPrep.ladderThroughLineDedup(built, "doc_id", "text",
              gopherMinWords = 30, gopherMinStopwords = 1),
            "text"))
        CorpusPrep.prepare(built, "doc_id", "text",
          gopherMinWords = 30, gopherMinStopwords = 1,
          lmMaxNegLogProb = 3.79, lmModel = Some(lm))
          .select(col("doc_id"), col("text").as("clean_text"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
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
             |  SELECT doc_id,
             |    list_filter(string_split(text, chr(10)),
             |      l -> regexp_matches(trim(l), '[.!?"]$')
             |           AND len(string_split_regex(trim(l), '\s+')) >= 5) AS kept,
             |    contains(lower(text), 'lorem ipsum') AS hl,
             |    contains(text, '{') AS hb
             |  FROM built),
             |c4k AS (
             |  SELECT doc_id, array_to_string(kept, chr(10)) AS text
             |  FROM c4 WHERE NOT hl AND NOT hb AND len(kept) >= 3),
             |g AS (
             |  SELECT doc_id, text,
             |    string_split_regex(lower(text), '\s+') AS w FROM c4k),
             |gf AS (
             |  SELECT doc_id, text, len(w) AS nw,
             |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
             |      / len(w) AS mwl,
             |    len(regexp_extract_all(text, '#|\.\.\.')) AS nsym,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS nalpha,
             |    len(list_filter(['the','be','to','of','and','that','have','with'],
             |      s -> list_contains(w, s))) AS nstop
             |  FROM g),
             |gk AS (
             |  SELECT doc_id, text FROM gf
             |  WHERE nw >= 30 AND nw <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
             |    AND CAST(nsym AS DOUBLE)/nw <= 0.1
             |    AND CAST(nalpha AS DOUBLE)/nw >= 0.8 AND nstop >= 1),
             |ld AS (
             |  SELECT doc_id, array_to_string(
             |    list_filter(string_split(text, chr(10)),
             |      (l, i) -> list_position(string_split(text, chr(10)), l) = i),
             |    chr(10)) AS text
             |  FROM gk),
             |lt AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
             |  FROM ld),
             |lt2 AS (SELECT * FROM lt WHERE length(tok) > 0),
             |vocab AS (SELECT tok, count(*) AS c FROM lt2 GROUP BY tok),
             |tot AS (SELECT sum(c) AS t, count(*) AS v FROM vocab),
             |lp AS (
             |  SELECT tok, CAST(ln((c + 0.5) / (t + 0.5 * v)) AS DECIMAL(20,9)) AS lp
             |  FROM vocab, tot),
             |score AS (
             |  SELECT doc_id, round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS s
             |  FROM lt2 JOIN lp USING (tok) GROUP BY doc_id),
             |lmk AS (
             |  SELECT d.doc_id, d.text FROM ld d JOIN score USING (doc_id)
             |  WHERE s <= 3.79),
             |fw AS (
             |  SELECT doc_id AS id, string_split_regex(lower(text), '\s+') AS w
             |  FROM lmk),
             |ft AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |     for i in range(1, len(w) - 1)])) AS tok
             |  FROM fw),
             |sizes AS (SELECT id, count(*) AS n FROM ft GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM ft a JOIN ft b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT id, id FROM fw
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l),
             |clusters AS (SELECT id, min(l) AS cluster_id FROM reach GROUP BY id)
             |SELECT k.doc_id, k.text AS clean_text,
             |  CASE WHEN u < 0.8 THEN 'train'
             |       WHEN u < 0.9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id, text,
             |        CAST((doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |          / 2147483648.0 AS u
             |      FROM lmk) k
             |JOIN clusters c ON c.id = k.doc_id AND c.id = c.cluster_id
             |ORDER BY k.doc_id""".stripMargin),
      allowBnlj = true),


    // Typed cogroup (KeyValueGroupedDataset.cogroup): per-key access to
    // both pipelines' rows at once — the dual-pipeline reconciliation
    // audit. The right twin drops every 13th position and perturbs every
    // 7th by +0.01, so counts and max-divergence are all exercised; the
    // oracle restates the semantics as FULL JOIN + per-key aggregate.
    "typed_cogroup_reconcile" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val ev = t(s, d, "events").select(
          col("user_id").as("key"), col("event_id").as("ord"), col("value"))
        val twin = ev.filter(pmod(col("ord"), lit(13)) =!= 0)
          .withColumn("value",
            when(pmod(col("ord"), lit(7)) === 0, col("value") + lit(0.01))
              .otherwise(col("value")))
        TypedOps.cogroupReconcile(
          ev.as[graft.ops.TypedOps.KeyedValue],
          twin.as[graft.ops.TypedOps.KeyedValue])
          .toDF().orderBy(col("key"))
      },
      Some("""WITH l AS (
             |  SELECT user_id AS key, event_id AS ord, value FROM events),
             |r AS (
             |  SELECT key, ord,
             |    CASE WHEN ord % 7 = 0 THEN value + 0.01 ELSE value END AS value
             |  FROM l WHERE ord % 13 <> 0),
             |j AS (
             |  SELECT COALESCE(l.key, r.key) AS key, l.value AS lv, r.value AS rv
             |  FROM l FULL JOIN r ON l.key = r.key AND l.ord = r.ord)
             |SELECT key,
             |  CAST(count(lv) AS BIGINT) AS n_left,
             |  CAST(count(rv) AS BIGINT) AS n_right,
             |  CAST(count(CASE WHEN lv IS NOT NULL AND rv IS NOT NULL
             |    THEN 1 END) AS BIGINT) AS n_both,
             |  MAX(CASE WHEN lv IS NOT NULL AND rv IS NOT NULL
             |    THEN abs(lv - rv) END) AS max_abs_delta
             |FROM j GROUP BY key ORDER BY key""".stripMargin)),


    // Declarative data-quality expectations: per-rule violation counts
    // and rates in ONE conditional-sum aggregate (k counters per task,
    // nothing shuffles but the k-row result). chars_consistent passes
    // everywhere by fixture construction — a zero-violation row proves
    // the counters don't over-count; the other two rules violate.
    "quality_expectations" -> QuerySpec(
      (s, d) => QualityOps.expectationStats(t(s, d, "documents"), Seq(
          "min_chars" -> (col("n_chars") >= 100L),
          "known_lang" -> col("lang").isin("en", "de", "fr"),
          "chars_consistent" -> (col("n_chars") === length(col("text")))))
        .orderBy(col("rule")),
      Some("""SELECT * FROM (
             |  SELECT 'min_chars' AS rule,
             |    CAST(SUM(CASE WHEN coalesce(n_chars >= 100, false)
             |      THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
             |    CAST(SUM(CASE WHEN coalesce(n_chars >= 100, false)
             |      THEN 0 ELSE 1 END) AS DOUBLE) / count(*) AS violation_rate
             |  FROM documents
             |  UNION ALL
             |  SELECT 'known_lang',
             |    CAST(SUM(CASE WHEN coalesce(lang IN ('en','de','fr'), false)
             |      THEN 0 ELSE 1 END) AS BIGINT),
             |    CAST(SUM(CASE WHEN coalesce(lang IN ('en','de','fr'), false)
             |      THEN 0 ELSE 1 END) AS DOUBLE) / count(*)
             |  FROM documents
             |  UNION ALL
             |  SELECT 'chars_consistent',
             |    CAST(SUM(CASE WHEN coalesce(n_chars = length(text), false)
             |      THEN 0 ELSE 1 END) AS BIGINT),
             |    CAST(SUM(CASE WHEN coalesce(n_chars = length(text), false)
             |      THEN 0 ELSE 1 END) AS DOUBLE) / count(*)
             |  FROM documents
             |) ORDER BY rule""".stripMargin)),
  )
}
