package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Text family of the operator catalog (36 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogText {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(



    // ----------------------------------------------------------------- text
    "text_top_terms" -> QuerySpec(
      (s, d) => TextOps.topTerms(t(s, d, "documents"), "text", 50),
      Some("""SELECT term, count(*) AS cnt FROM (
             |  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
             |WHERE length(term) > 0
             |  AND term NOT IN ('the','a','an','and','or','of','to','in','is','it')
             |GROUP BY term ORDER BY cnt DESC, term LIMIT 50""".stripMargin)),



    // Code-vs-prose router (TextOps.codeDetect): the stage that splits
    // a mixed crawl into code and natural-language streams — C4 rules
    // destroy code, code filters starve prose, so the router runs
    // FIRST. Deterministic code-shaped suffixes are planted on every
    // 7th doc (the fixture is pure word salad) so both decision paths
    // discriminate; zero-shuffle column program, exact counts, ONE
    // division per ratio, RE2-compatible regexes the oracle replays
    // verbatim ⇒ fully oracled.
    "text_code_detect" -> QuerySpec(
      (s, d) => {
        val code = " def load(x): return x[0]; const y = {a: [1]};"
        val docs = t(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 7 === 0, lit(code)).otherwise(lit("")))
            .as("text"))
        val (nSym, nKw, symR, kwR, isCode) =
          graft.ops.TextOps.codeDetect(col("text"))
        docs.select(col("doc_id"), nSym.as("n_code_symbols"),
            nKw.as("n_keywords"), symR.as("symbol_ratio"),
            kwR.as("keyword_ratio"), isCode.as("is_code"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |    text || CASE WHEN doc_id % 7 = 0
             |      THEN ' def load(x): return x[0]; const y = {a: [1]};'
             |      ELSE '' END AS text
             |  FROM documents),
             |f AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '[{}();=\[\]]')) AS BIGINT)
             |      AS n_sym,
             |    CAST(len(regexp_extract_all(lower(text),
             |      '\b(def|return|import|class|void|const|function|var)\b'))
             |      AS BIGINT) AS n_kw,
             |    length(text) AS n_chars,
             |    len(list_filter(string_split(lower(text), ' '),
             |      x -> length(x) > 0)) AS n_words
             |  FROM docs),
             |r AS (
             |  SELECT doc_id, n_sym, n_kw,
             |    CASE WHEN n_chars > 0
             |      THEN CAST(n_sym AS DOUBLE) / CAST(n_chars AS DOUBLE)
             |      ELSE 0.0 END AS symbol_ratio,
             |    CASE WHEN n_words > 0
             |      THEN CAST(n_kw AS DOUBLE) / CAST(n_words AS DOUBLE)
             |      ELSE 0.0 END AS keyword_ratio
             |  FROM f)
             |SELECT doc_id, n_sym AS n_code_symbols, n_kw AS n_keywords,
             |  symbol_ratio, keyword_ratio,
             |  CAST((symbol_ratio >= 0.03 AND n_kw >= 1)
             |    OR symbol_ratio >= 0.08 AS INTEGER) AS is_code
             |FROM r ORDER BY doc_id""".stripMargin)),



    "text_quality_score" -> QuerySpec(
      (s, d) => TextOps.qualityFeatures(t(s, d, "documents"), "text")
        .select(col("doc_id"), col("n_tokens"), col("n_stop"),
          col("avg_token_len"), col("stop_ratio"), col("quality_score"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(list_filter(string_split(lower(text), ' '),
             |    t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS INTEGER) AS n_stop,
             |  CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE)
             |    / len(string_split(lower(text), ' ')) AS avg_token_len,
             |  CAST(len(list_filter(string_split(lower(text), ' '),
             |    t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
             |    / len(string_split(lower(text), ' ')) AS stop_ratio,
             |  least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 64.0, 1.0)
             |    * (1.0 - CAST(len(list_filter(string_split(lower(text), ' '),
             |        t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
             |        / len(string_split(lower(text), ' ')))
             |    * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
             |        / length(text)) AS quality_score
             |FROM documents ORDER BY doc_id""".stripMargin)),



    // Pairwise total-variation distance between per-source unigram
    // distributions (TextOps.sourceDivergence) — the lexical-similarity
    // matrix behind corpus-mixing decisions. TVD over KL deliberately:
    // the numerator Σ|c·M − d·N| is an exact integer (decimal
    // accumulator), the result ONE IEEE division — engine-exact, where
    // KL's ln() is the repo-pinned last-ulp libm hazard. topK=20 keeps
    // 20 of the fixture's 31 terms and exercises the __other lumping.
    "text_source_divergence" -> QuerySpec(
      (s, d) => TextOps.sourceDivergence(
        t(s, d, "documents"), "source", "text", topK = 20),
      Some("""WITH toks AS (
             |  SELECT source AS g,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks WHERE length(tok) > 0),
             |gstats AS (SELECT tok, count(*) AS gc FROM t GROUP BY tok),
             |kept AS (
             |  SELECT tok FROM (
             |    SELECT tok, ROW_NUMBER() OVER (ORDER BY gc DESC, tok) AS r
             |    FROM gstats) WHERE r <= 20),
             |mapped AS (
             |  SELECT g, CASE WHEN k.tok IS NOT NULL THEN t.tok
             |                 ELSE '__other' END AS term
             |  FROM t LEFT JOIN kept k ON k.tok = t.tok),
             |counts AS (SELECT g, term, count(*) AS c FROM mapped GROUP BY g, term),
             |totals AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY g),
             |gp AS (
             |  SELECT a.g AS ga, a.n AS na, b.g AS gb, b.n AS nb
             |  FROM totals a CROSS JOIN totals b WHERE a.g < b.g),
             |grid AS (
             |  SELECT gp.*, terms.term
             |  FROM gp CROSS JOIN (SELECT DISTINCT term FROM counts) terms),
             |j AS (
             |  SELECT grid.ga, grid.gb, grid.na, grid.nb, grid.term,
             |    COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
             |  FROM grid
             |  LEFT JOIN counts ca ON ca.g = grid.ga AND ca.term = grid.term
             |  LEFT JOIN counts cb ON cb.g = grid.gb AND cb.term = grid.term)
             |SELECT ga AS source_a, gb AS source_b, na AS n_a, nb AS n_b,
             |  CAST(SUM(abs(CAST(ca AS DECIMAL(19,0))*CAST(nb AS DECIMAL(19,0))
             |             - CAST(cb AS DECIMAL(19,0))*CAST(na AS DECIMAL(19,0)))) AS DOUBLE)
             |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 2.0) AS tvd
             |FROM j GROUP BY ga, gb, na, nb ORDER BY ga, gb""".stripMargin),
      allowBnlj = true),



    // PMI collocations (Church & Hanks 1990): pointwise mutual
    // information of top-term pairs from document-level co-occurrence
    // — the lexical-association miner behind phrase/topic diagnostics.
    // Candidate pairs bound to the global top-50 terms (the
    // sourceDivergence kept-set mechanism) and the self-join runs
    // CO-PARTITIONED on doc_id, so pairs are Σ k_d·(k_d−1)/2 with
    // k_d ≤ 50 — never vocabulary². PMI's log is quantized ONCE to
    // DECIMAL(12,6) over a fixed double ratio chain (the zipf
    // discipline) ⇒ fully oracled.
    "text_pmi_collocations" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val toks = docs.select(col("doc_id"),
            explode(TextOps.tokenize(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
        val kept = toks.groupBy(col("tok")).agg(count(lit(1)).as("_c"))
          .orderBy(col("_c").desc, col("tok")).limit(50).select(col("tok"))
        val inc = toks.join(broadcast(kept), "tok")
          .select(col("doc_id"), col("tok")).distinct()
        val nA = inc.groupBy(col("tok")).agg(count(lit(1)).as("_na"))
        val nDocs = docs.agg(count(lit(1)).as("_n"))
        val pairs = inc.as("l")
          .join(inc.as("r"), col("l.doc_id") === col("r.doc_id") &&
            col("l.tok") < col("r.tok"))
          .groupBy(col("l.tok").as("term_a"), col("r.tok").as("term_b"))
          .agg(count(lit(1)).as("n_ab"))
        val top = pairs
          .orderBy(col("n_ab").desc, col("term_a"), col("term_b")).limit(50)
        top
          .join(broadcast(nA.withColumnRenamed("tok", "term_a")
            .withColumnRenamed("_na", "n_a")), Seq("term_a"))
          .join(broadcast(nA.withColumnRenamed("tok", "term_b")
            .withColumnRenamed("_na", "n_b")), Seq("term_b"))
          .crossJoin(broadcast(nDocs))
          .select(col("term_a"), col("term_b"), col("n_ab"),
            col("n_a"), col("n_b"),
            log((col("n_ab").cast(DoubleType) * col("_n").cast(DoubleType)) /
              (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)))
              .cast(DecimalType(12, 6)).cast(DoubleType).as("pmi"))
          .orderBy(col("n_ab").desc, col("term_a"), col("term_b"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |tk AS (SELECT * FROM toks WHERE length(tok) > 0),
             |kept AS (
             |  SELECT tok FROM (
             |    SELECT tok, count(*) AS c,
             |      ROW_NUMBER() OVER (ORDER BY count(*) DESC, tok) AS r
             |    FROM tk GROUP BY tok) WHERE r <= 50),
             |inc AS (
             |  SELECT DISTINCT doc_id, tok FROM tk
             |  WHERE tok IN (SELECT tok FROM kept)),
             |na AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM inc GROUP BY 1),
             |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |pairs AS (
             |  SELECT l.tok AS term_a, r.tok AS term_b,
             |    CAST(count(*) AS BIGINT) AS n_ab
             |  FROM inc l JOIN inc r
             |    ON l.doc_id = r.doc_id AND l.tok < r.tok
             |  GROUP BY 1, 2),
             |top AS (
             |  SELECT * FROM pairs
             |  ORDER BY n_ab DESC, term_a, term_b LIMIT 50)
             |SELECT t.term_a, t.term_b, t.n_ab, a.n AS n_a, b.n AS n_b,
             |  CAST(CAST(ln((CAST(t.n_ab AS DOUBLE) * CAST(nd.n AS DOUBLE))
             |    / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)))
             |    AS DECIMAL(12,6)) AS DOUBLE) AS pmi
             |FROM top t
             |JOIN na a ON a.tok = t.term_a
             |JOIN na b ON b.tok = t.term_b
             |CROSS JOIN nd
             |ORDER BY n_ab DESC, term_a, term_b""".stripMargin),
      allowBnlj = true),



    // Dunning log-likelihood-ratio collocations (Dunning 1993) over
    // ADJACENT bigrams — the sparse-count-honest companion to
    // text_pmi_collocations' document-level PMI (PMI overrates rare
    // pairs; G² is the significance-weighted ranking production phrase
    // miners use). The 2×2 contingency per bigram (w1,w2) comes from
    // three exact count grains (bigram, first-position, second-
    // position) + the bigram total; G² = 2·Σ k·ln(k·N/(R·C)) over the
    // nonzero cells, each ln quantized ONCE to DECIMAL(12,6) (the PMI
    // discipline) and multiplied by the EXACT integer cell count in
    // decimal, so the 4-term sum is exact and order-free. Zero cells
    // contribute 0 by the x·ln(x)→0 limit — guarded explicitly (ln(0)
    // is -inf, not 0). Candidates bound to the top-40 bigrams by count.
    "text_collocations_llr" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val toks = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(filter(TextOps.tokenize(col("text")),
              x => length(x) > 0)).as(Seq("pos", "tok")))
        val bi = toks
          .withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
        val big = bi.groupBy(col("tok").as("term_a"), col("nxt").as("term_b"))
          .agg(count(lit(1)).as("n_ab"))
        val c1 = bi.groupBy(col("tok").as("term_a"))
          .agg(count(lit(1)).as("n_a"))
        val c2 = bi.groupBy(col("nxt").as("term_b"))
          .agg(count(lit(1)).as("n_b"))
        val nTot = bi.agg(count(lit(1)).as("n_total"))
        val top = big
          .orderBy(col("n_ab").desc, col("term_a"), col("term_b")).limit(40)
          .join(broadcast(c1), Seq("term_a"))
          .join(broadcast(c2), Seq("term_b"))
          .crossJoin(broadcast(nTot))
        def term(cell: Column, r: Column, cc: Column): Column =
          when(cell > 0L,
            cell.cast(DecimalType(19, 0)) *
              log((cell.cast(DoubleType) * col("n_total").cast(DoubleType)) /
                (r.cast(DoubleType) * cc.cast(DoubleType)))
                .cast(DecimalType(12, 6)))
            .otherwise(lit(0).cast(DecimalType(31, 6)))
        val k11 = col("n_ab")
        val k12 = col("n_a") - col("n_ab")
        val k21 = col("n_b") - col("n_ab")
        val k22 = col("n_total") - col("n_a") - col("n_b") + col("n_ab")
        val r1 = col("n_a"); val r2 = col("n_total") - col("n_a")
        val cc1 = col("n_b"); val cc2 = col("n_total") - col("n_b")
        top.select(col("term_a"), col("term_b"), col("n_ab"),
            col("n_a"), col("n_b"), col("n_total"),
            // x2 happens in DOUBLE after the exact decimal sum: doubling
            // is exact in IEEE (power of two), and a decimal x2 would
            // push DuckDB past its 38-digit multiplication width cap
            ((term(k11, r1, cc1) + term(k12, r1, cc2) +
              term(k21, r2, cc1) + term(k22, r2, cc2))
              .cast(DoubleType) * lit(2.0)).as("llr"))
          .orderBy(col("n_ab").desc, col("term_a"), col("term_b"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, tok, pos FROM (
             |    SELECT doc_id, unnest(list_filter(
             |        regexp_split_to_array(lower(text), '\s+'),
             |        x -> length(x) > 0)) AS tok,
             |      generate_subscripts(list_filter(
             |        regexp_split_to_array(lower(text), '\s+'),
             |        x -> length(x) > 0), 1) AS pos
             |    FROM documents)),
             |bi AS (
             |  SELECT tok AS a, lead(tok) OVER (PARTITION BY doc_id
             |    ORDER BY pos) AS b
             |  FROM toks QUALIFY b IS NOT NULL),
             |big AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
             |        FROM bi GROUP BY 1, 2),
             |c1 AS (SELECT a, CAST(count(*) AS BIGINT) AS n_a
             |       FROM bi GROUP BY 1),
             |c2 AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b
             |       FROM bi GROUP BY 1),
             |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bi),
             |top AS (
             |  SELECT * FROM big ORDER BY n_ab DESC, a, b LIMIT 40),
             |j AS (
             |  SELECT t.a, t.b, t.n_ab, c1.n_a, c2.n_b, nt.n AS n_total
             |  FROM top t JOIN c1 ON c1.a = t.a JOIN c2 ON c2.b = t.b
             |  CROSS JOIN nt),
             |cells AS (
             |  SELECT a, b, n_ab, n_a, n_b, n_total,
             |    n_ab AS k11, n_a - n_ab AS k12, n_b - n_ab AS k21,
             |    n_total - n_a - n_b + n_ab AS k22,
             |    n_a AS r1, n_total - n_a AS r2,
             |    n_b AS cc1, n_total - n_b AS cc2
             |  FROM j)
             |SELECT a AS term_a, b AS term_b, n_ab, n_a, n_b, n_total,
             |  CAST((
             |    (CASE WHEN k11 > 0 THEN CAST(k11 AS DECIMAL(19,0)) *
             |      CAST(ln((CAST(k11 AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |        (CAST(r1 AS DOUBLE) * CAST(cc1 AS DOUBLE)))
             |        AS DECIMAL(12,6))
             |      ELSE CAST(0 AS DECIMAL(31,6)) END) +
             |    (CASE WHEN k12 > 0 THEN CAST(k12 AS DECIMAL(19,0)) *
             |      CAST(ln((CAST(k12 AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |        (CAST(r1 AS DOUBLE) * CAST(cc2 AS DOUBLE)))
             |        AS DECIMAL(12,6))
             |      ELSE CAST(0 AS DECIMAL(31,6)) END) +
             |    (CASE WHEN k21 > 0 THEN CAST(k21 AS DECIMAL(19,0)) *
             |      CAST(ln((CAST(k21 AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |        (CAST(r2 AS DOUBLE) * CAST(cc1 AS DOUBLE)))
             |        AS DECIMAL(12,6))
             |      ELSE CAST(0 AS DECIMAL(31,6)) END) +
             |    (CASE WHEN k22 > 0 THEN CAST(k22 AS DECIMAL(19,0)) *
             |      CAST(ln((CAST(k22 AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |        (CAST(r2 AS DOUBLE) * CAST(cc2 AS DOUBLE)))
             |        AS DECIMAL(12,6))
             |      ELSE CAST(0 AS DECIMAL(31,6)) END)
             |  ) AS DOUBLE) * 2.0 AS llr
             |FROM cells ORDER BY n_ab DESC, term_a, term_b""".stripMargin),
      allowBnlj = true),



    // Zipf-law fit of the token frequency head (TextOps.zipfSlope):
    // OLS slope of ln(freq) on ln(rank) over the top-200 terms — the
    // distribution-shape tripwire (natural ≈ −1; the synthetic
    // template fixture measures −0.18, exactly the flat head the
    // diagnostic exists to flag). Each ln quantized ONCE to the 1e-6
    // integer grid, normal equations in exact integers/decimals, one
    // final IEEE division ⇒ fully oracled.
    "text_zipf_slope" -> QuerySpec(
      (s, d) => TextOps.zipfSlope(t(s, d, "documents"), "text", topK = 200),
      Some("""WITH toks AS (
             |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |counts AS (
             |  SELECT tok, count(*) AS c FROM toks
             |  WHERE length(tok) > 0 GROUP BY 1),
             |top AS (
             |  SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
             |  FROM counts QUALIFY r <= 200),
             |q AS (SELECT
             |    CAST(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(12,6)) * 1000000
             |      AS BIGINT) AS x,
             |    CAST(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(12,6)) * 1000000
             |      AS BIGINT) AS y
             |  FROM top),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x*y) AS BIGINT) AS sxy,
             |    CAST(SUM(x*x) AS BIGINT) AS sxx FROM q),
             |f AS (SELECT k, sx, sy,
             |    CAST(CAST(k AS DECIMAL(4,0)) * CAST(sxy AS DECIMAL(18,0))
             |       - CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0))
             |      AS DOUBLE)
             |    / CAST(CAST(k AS DECIMAL(4,0)) * CAST(sxx AS DECIMAL(18,0))
             |       - CAST(sx AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0))
             |      AS DOUBLE) AS slope
             |  FROM s)
             |SELECT k AS n_terms, slope,
             |  (CAST(sy AS DOUBLE) / 1000000.0
             |    - slope * (CAST(sx AS DOUBLE) / 1000000.0))
             |    / CAST(k AS DOUBLE) AS intercept
             |FROM f""".stripMargin)),



    // Vocabulary-growth (Heaps-law) curve + type/token ratio
    // (TextOps.vocabGrowth): token count, distinct-term count and TTR at
    // 25/50/75/100% corpus prefixes — the lexical-diversity saturation
    // diagnostic behind corpus-mixing decisions. One token-stream pass:
    // per-term min(id) marks first appearance, prefixes are conditional
    // counts. Exact integers + one IEEE division ⇒ fully oracled.
    "text_vocab_growth" -> QuerySpec(
      (s, d) => TextOps.vocabGrowth(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
             |toks AS (
             |  SELECT doc_id AS id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks WHERE length(tok) > 0),
             |terms AS (SELECT tok, min(id) AS first_id FROM t GROUP BY tok),
             |fr AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 1.0]) AS DOUBLE) AS frac),
             |rws AS (
             |  SELECT f.frac,
             |    CAST(floor(n.n * f.frac) AS BIGINT) AS prefix_docs
             |  FROM fr f CROSS JOIN n),
             |tcnt AS (
             |  SELECT r.frac, r.prefix_docs,
             |    CAST(SUM(CASE WHEN t.id < r.prefix_docs THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_tokens
             |  FROM rws r CROSS JOIN t GROUP BY r.frac, r.prefix_docs),
             |dcnt AS (
             |  SELECT r.frac,
             |    CAST(SUM(CASE WHEN te.first_id < r.prefix_docs THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_distinct
             |  FROM rws r CROSS JOIN terms te GROUP BY r.frac)
             |SELECT c.frac, c.prefix_docs, c.n_tokens, d.n_distinct,
             |  CAST(d.n_distinct AS DOUBLE) / c.n_tokens AS type_token_ratio
             |FROM tcnt c JOIN dcnt d ON d.frac = c.frac
             |ORDER BY c.frac""".stripMargin),
      allowBnlj = true),



    "text_token_count" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("source"),
          size(TextOps.tokenize(col("text"))).as("n_ws"),
          size(TextOps.bpeishTokens(col("text"))).as("n_bpe"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_ws")).as("sum_ws"), sum(col("n_bpe")).as("sum_bpe"))
        .orderBy(col("source")),
      Some("""SELECT source, count(*) AS cnt,
             |  CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS sum_ws,
             |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS sum_bpe
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),



    // Repetition ratio (most-frequent-bigram share) — grams projected
    // separately from the counting pass (HOF re-evaluation trap).
    "text_repetition" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextOps.ngrams(col("text"), 2).as("_g"))
        .select(col("doc_id"),
          TextOps.repetitionRatioFromGrams(col("_g")).as("rep_ratio"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(list_max(list_transform(g, x -> len(list_filter(g, y -> y = x)))) AS DOUBLE)
             |    / len(g) AS rep_ratio
             |FROM (
             |  SELECT doc_id,
             |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS g
             |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents))
             |ORDER BY doc_id""".stripMargin)),



    // Pre-hash normalization (NFKC → lower → whitespace collapse). The
    // corpus is ASCII so the oracle checks the lower/collapse/trim
    // plumbing; the Unicode semantics (composed≡decomposed, full-width,
    // ligatures, NBSP) are pinned by ExpressionSpec units. Deterministic
    // messiness is injected on both sides so collapse/trim do real work.
    "text_normalize" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextOps.normalizeForDedup(s, concat(
            lit("  "), substring(col("text"), 1, 50),
            lit("   MIXED Case\ttail  "))).as("norm"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(
             |    lower(nfc_normalize('  ' || substr(text, 1, 50)
             |      || '   MIXED Case' || chr(9) || 'tail  ')),
             |    '\s+', ' ', 'g')) AS norm
             |FROM documents ORDER BY doc_id""".stripMargin)),



    // PII-style scrub: mask emails + long digit runs (regexp_replace
    // chain). The synthetic text has neither, so deterministic PII-shaped
    // suffixes are appended first on both sides.
    "text_scrub" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextOps.scrub(concat(
            substring(col("text"), 1, 40),
            lit(" contact user"), col("doc_id").cast(StringType),
            lit("@example.com id "),
            (col("doc_id") + lit(12345678L)).cast(StringType))).as("scrubbed"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  regexp_replace(
             |    regexp_replace(
             |      substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
             |        || '@example.com id ' || CAST(doc_id + 12345678 AS VARCHAR),
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
             |    '\d{4,}', '<NUM>', 'g') AS scrubbed
             |FROM documents ORDER BY doc_id""".stripMargin)),



    // md5 content fingerprint (engine-portable); the xxhash64 rolling-hash
    // variant is Spark-only and unit-tested.
    "text_fingerprint" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextOps.fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id")),



    // Stopword-profile language ID with fixed-priority argmax.
    "text_lang_id" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("pred_lang"))
        .orderBy(col("doc_id")),
      Some("""WITH scores AS (
             |  SELECT doc_id,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('the','and','of','to','is','that','you','with'))) AS s_en,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('der','die','das','und','ist','nicht','ich','mit'))) AS s_de,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los','las','es','y','que','por'))) AS s_es,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','des','est','et','que','je','pas'))) AS s_fr,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('的','是','了','在','我','不','这','有'))) AS s_zh
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
             |       WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
             |       WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
             |       WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
             |       WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
             |       WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'zh'
             |       ELSE 'und' END AS pred_lang
             |FROM scores ORDER BY doc_id""".stripMargin)),



    // Language-ID confusion matrix: the heuristic classifier above
    // evaluated against the table's own lang labels — per
    // (actual, predicted) counts plus per-actual recall, the standard
    // eval grid a filtering pipeline reports before trusting a
    // classifier gate. Exact counts, ONE IEEE division per row (count
    // over a broadcast per-actual total) ⇒ fully oracled. Output is
    // labels² model-sized.
    "text_lang_confusion" -> QuerySpec(
      (s, d) => {
        val preds = t(s, d, "documents")
          .select(col("lang").as("actual"),
            TextOps.langId(col("text")).as("predicted"))
        val cells = preds.groupBy(col("actual"), col("predicted"))
          .agg(count(lit(1)).as("n"))
        val totals = preds.groupBy(col("actual"))
          .agg(count(lit(1)).as("n_actual"))
        cells.join(broadcast(totals), Seq("actual"))
          .select(col("actual"), col("predicted"), col("n"), col("n_actual"),
            (col("n").cast(DoubleType) / col("n_actual").cast(DoubleType))
              .as("frac"))
          .orderBy(col("actual"), col("predicted"))
      },
      Some("""WITH preds AS (
             |  SELECT lang AS actual,
             |    CASE WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
             |         WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
             |         WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
             |         WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
             |         WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
             |         WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'zh'
             |         ELSE 'und' END AS predicted
             |  FROM (
             |    SELECT lang,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('the','and','of','to','is','that','you','with'))) AS s_en,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('der','die','das','und','ist','nicht','ich','mit'))) AS s_de,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los','las','es','y','que','por'))) AS s_es,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','des','est','et','que','je','pas'))) AS s_fr,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('的','是','了','在','我','不','这','有'))) AS s_zh
             |    FROM documents)),
             |cells AS (SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
             |          FROM preds GROUP BY 1, 2),
             |tot AS (SELECT actual, CAST(count(*) AS BIGINT) AS n_actual
             |        FROM preds GROUP BY 1)
             |SELECT actual, predicted, n, n_actual,
             |  CAST(n AS DOUBLE) / CAST(n_actual AS DOUBLE) AS frac
             |FROM cells JOIN tot USING (actual)
             |ORDER BY actual, predicted""".stripMargin)),



    // Frozen-MODEL language ID roundtrip (round 15): the staged-artifact
    // serve path the heuristic tier lacked — a hashed char-trigram
    // multinomial NB (LangIdOps) fit on the EVEN doc_ids, staged as
    // parquet, reloaded, and scored over the held-out ODD split, with
    // the heuristic langId evaluated on the SAME split so the key
    // reports the measured per-language recall DELTA (model − heuristic)
    // — a classifier upgrade must show its evidence. Determinism: the
    // portable 31-polynomial code-point hash over character-based
    // trigram substrings, log-probs quantized ONCE to DECIMAL(20,6) at
    // fit time, scores ORDER-FREE exact decimal sums, argmax ties by
    // the fixed language priority. The oracle re-derives EVERYTHING
    // from raw text — fit counts, full-grid smoothing floors, priors,
    // scoring, argmax, both confusions — so the staged model is
    // refuted, not assumed. Docs under 3 chars have no trigram
    // evidence and are excluded on both sides (none exist at the
    // fixture; the condition makes totality explicit).
    "text_lang_id_model_roundtrip" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val modelDir = staged(d, "langid_model") { dir =>
          LangIdOps.fit(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
              "text", "lang")
            .write.mode("overwrite").parquet(dir)
        }
        val model = s.read.parquet(modelDir)
        val held = docs.filter(pmod(col("doc_id"), lit(2)) === 1 &&
          length(lower(col("text"))) >= 3)
        val preds = LangIdOps.predictWith(
          LangIdOps.docTrigramCounts(held, "doc_id", "text"), "doc_id", model)
        val both = held
          .select(col("doc_id"), col("lang").as("actual"),
            TextOps.langId(col("text")).as("heur_pred"))
          .join(preds, Seq("doc_id"))
        val perLang = both.groupBy(col("actual"))
          .agg(count(lit(1)).as("n_actual"),
            sum(when(col("pred_lang") === col("actual"), 1L).otherwise(0L))
              .as("n_model_ok"),
            sum(when(col("heur_pred") === col("actual"), 1L).otherwise(0L))
              .as("n_heur_ok"))
        val overall = both
          .agg(count(lit(1)).as("n_actual"),
            sum(when(col("pred_lang") === col("actual"), 1L).otherwise(0L))
              .as("n_model_ok"),
            sum(when(col("heur_pred") === col("actual"), 1L).otherwise(0L))
              .as("n_heur_ok"))
          .select(lit("ALL").as("actual"), col("n_actual"),
            col("n_model_ok"), col("n_heur_ok"))
        perLang.unionByName(overall)
          .select(col("actual"), col("n_actual"), col("n_model_ok"),
            (col("n_model_ok").cast(DoubleType) /
              col("n_actual").cast(DoubleType)).as("model_recall"),
            col("n_heur_ok"),
            (col("n_heur_ok").cast(DoubleType) /
              col("n_actual").cast(DoubleType)).as("heur_recall"),
            ((col("n_model_ok").cast(DoubleType) /
               col("n_actual").cast(DoubleType)) -
             (col("n_heur_ok").cast(DoubleType) /
               col("n_actual").cast(DoubleType))).as("recall_delta"))
          .orderBy(col("actual"))
      },
      Some("""WITH train AS (
             |  SELECT doc_id, lang, lower(text) AS low FROM documents
             |  WHERE doc_id % 2 = 0),
             |held AS (
             |  SELECT doc_id, lang, lower(text) AS low, text FROM documents
             |  WHERE doc_id % 2 = 1 AND length(lower(text)) >= 3),
             |ttri AS (
             |  SELECT lang, CAST(unnest(list_transform(
             |    range(1, length(low) - 1),
             |    i -> list_reduce(list_prepend(CAST(11 AS BIGINT),
             |           list_transform(
             |             regexp_split_to_array(
             |               substr(low, CAST(i AS INTEGER), 3), ''),
             |             c -> CAST(ord(c) AS BIGINT))),
             |           (a, c) -> (a * 31 + c) % 2147483647) % 512))
             |    AS INTEGER) AS bucket
             |  FROM train),
             |tcnt AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS cnt
             |         FROM ttri GROUP BY 1, 2),
             |ttot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot
             |         FROM tcnt GROUP BY 1),
             |grid AS (SELECT t.lang, CAST(unnest(range(512)) AS INTEGER)
             |           AS bucket, t.tot FROM ttot t),
             |lp AS (
             |  SELECT g.lang, g.bucket,
             |    CAST(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
             |            CAST(g.tot + 512 AS DOUBLE)) AS DECIMAL(20,6)) AS lp
             |  FROM grid g
             |  LEFT JOIN tcnt c ON c.lang = g.lang AND c.bucket = g.bucket),
             |nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS ndl
             |       FROM train GROUP BY 1),
             |pri AS (
             |  SELECT lang, CAST(ln(CAST(ndl AS DOUBLE) /
             |    CAST((SELECT sum(ndl) FROM nd) AS DOUBLE))
             |    AS DECIMAL(20,6)) AS prior
             |  FROM nd),
             |htri AS (
             |  SELECT doc_id, CAST(unnest(list_transform(
             |    range(1, length(low) - 1),
             |    i -> list_reduce(list_prepend(CAST(11 AS BIGINT),
             |           list_transform(
             |             regexp_split_to_array(
             |               substr(low, CAST(i AS INTEGER), 3), ''),
             |             c -> CAST(ord(c) AS BIGINT))),
             |           (a, c) -> (a * 31 + c) % 2147483647) % 512))
             |    AS INTEGER) AS bucket
             |  FROM held),
             |hcnt AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
             |         FROM htri GROUP BY 1, 2),
             |sc AS (
             |  SELECT h.doc_id, l.lang,
             |    CAST(SUM(CAST(h.tf AS DECIMAL(10,0)) * l.lp)
             |      AS DECIMAL(38,6)) AS s
             |  FROM hcnt h JOIN lp l ON l.bucket = h.bucket
             |  GROUP BY 1, 2),
             |tsc AS (
             |  SELECT sc.doc_id, sc.lang,
             |    CAST(sc.s + pri.prior AS DECIMAL(38,6)) AS score
             |  FROM sc JOIN pri USING (lang)),
             |pred AS (
             |  SELECT doc_id, lang AS pred_lang FROM (
             |    SELECT doc_id, lang, row_number() OVER (
             |      PARTITION BY doc_id ORDER BY score DESC,
             |      CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1
             |        WHEN 'es' THEN 2 WHEN 'fr' THEN 3 WHEN 'zh' THEN 4
             |        ELSE 5 END) AS rn
             |    FROM tsc) WHERE rn = 1),
             |heur AS (
             |  SELECT doc_id,
             |    CASE WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
             |         WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
             |         WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
             |         WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
             |         WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
             |         WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'zh'
             |         ELSE 'und' END AS heur_pred
             |  FROM (
             |    SELECT doc_id,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('the','and','of','to','is','that','you','with'))) AS s_en,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('der','die','das','und','ist','nicht','ich','mit'))) AS s_de,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los','las','es','y','que','por'))) AS s_es,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','des','est','et','que','je','pas'))) AS s_fr,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('的','是','了','在','我','不','这','有'))) AS s_zh
             |    FROM held)),
             |j AS (
             |  SELECT h.lang AS actual, p.pred_lang, e.heur_pred
             |  FROM held h
             |  JOIN pred p USING (doc_id)
             |  JOIN heur e USING (doc_id)),
             |per AS (
             |  SELECT actual, CAST(count(*) AS BIGINT) AS n_actual,
             |    CAST(sum(CASE WHEN pred_lang = actual THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_model_ok,
             |    CAST(sum(CASE WHEN heur_pred = actual THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_heur_ok
             |  FROM j GROUP BY 1
             |  UNION ALL
             |  SELECT 'ALL', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN pred_lang = actual THEN 1 ELSE 0 END)
             |      AS BIGINT),
             |    CAST(sum(CASE WHEN heur_pred = actual THEN 1 ELSE 0 END)
             |      AS BIGINT)
             |  FROM j)
             |SELECT actual, n_actual, n_model_ok,
             |  CAST(n_model_ok AS DOUBLE) / CAST(n_actual AS DOUBLE)
             |    AS model_recall,
             |  n_heur_ok,
             |  CAST(n_heur_ok AS DOUBLE) / CAST(n_actual AS DOUBLE)
             |    AS heur_recall,
             |  (CAST(n_model_ok AS DOUBLE) / CAST(n_actual AS DOUBLE)) -
             |  (CAST(n_heur_ok AS DOUBLE) / CAST(n_actual AS DOUBLE))
             |    AS recall_delta
             |FROM per ORDER BY actual""".stripMargin)),



    // Model-based language classification — the supervised tier next to
    // the heuristic stopword scorer above: multinomial Naive Bayes fit
    // on the labeled corpus (ClassifyOps.nbFit), argmax-scored against
    // the frozen model (nbClassifyWith). Hash-exact because every
    // statistic is quantized DECIMAL(20,6) at fit time and never
    // rounded again (the scale choice and its measured failure modes
    // are documented on ClassifyOps): DuckDB independently rebuilds
    // per-class token log-probs, smoothing mass, priors, the per-doc
    // exact-decimal score sums, and the (score DESC, label ASC)
    // argmax. `correct` compares against the table's own lang label.
    "text_nb_lang_classify" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = ClassifyOps.nbFit(docs, "text", "lang", smoothing = 0.5)
        ClassifyOps.nbClassifyWith(docs, "doc_id", "text", model)
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id"), col("pred_label").as("pred_lang"),
            col("n_tokens"),
            col("neg_ll"),
            (col("pred_label") === col("lang")).cast(IntegerType).as("correct"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id, lang,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |ct AS (SELECT lang AS label, tok, count(*) AS cnt
             |       FROM t GROUP BY 1, 2),
             |tot AS (SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM t),
             |lp AS (
             |  SELECT label, tok,
             |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
             |  FROM ct JOIN tot USING (label) CROSS JOIN v),
             |dflt AS (
             |  SELECT label,
             |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
             |  FROM tot CROSS JOIN v),
             |prior AS (
             |  SELECT lang AS label,
             |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE)
             |                        FROM documents)) AS DECIMAL(20,6)) AS prior
             |  FROM documents GROUP BY 1),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, c.label, p.prior,
             |    sum(dt.cnt) AS n_tok,
             |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
             |  FROM dt
             |  CROSS JOIN (SELECT label FROM tot) c
             |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
             |  JOIN dflt f ON f.label = c.label
             |  JOIN prior p ON p.label = c.label
             |  GROUP BY dt.doc_id, c.label, p.prior),
             |ranked AS (
             |  SELECT doc_id, label, prior + ll AS score, n_tok,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY prior + ll DESC, label ASC) AS rn
             |  FROM scored)
             |SELECT r.doc_id, r.label AS pred_lang,
             |  CAST(r.n_tok AS BIGINT) AS n_tokens,
             |  CAST(-r.score AS DOUBLE) AS neg_ll,
             |  CAST(r.label = d.lang AS INTEGER) AS correct
             |FROM ranked r JOIN documents d USING (doc_id)
             |WHERE r.rn = 1 ORDER BY r.doc_id""".stripMargin),
      allowBnlj = true),



    // Classifier distillation of a rule-based quality filter — the
    // CCNet-style model-based quality tier: derive keep/drop labels
    // from the c4 rule ladder (text_c4_filter's fixture build), fit
    // the NB model on the SAME text the rules judged, and classify —
    // the model learns the rules' signal (the planted 'lorem ipsum'
    // and '{' tokens become strong class features) and `agrees`
    // records per-doc fidelity, hash-verified. Same decimal discipline
    // as text_nb_lang_classify.
    "text_nb_quality_distill" -> QuerySpec(
      (s, d) => {
        val toksB = split(col("text"), " ")
        val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toksB, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        val labeled = TextOps.c4QualityFlags(built, "text")
          .select(col("doc_id"),
            when(col("keep") === 1, lit("keep")).otherwise(lit("drop"))
              .as("rule_label"))
          .join(built, Seq("doc_id"))
        // the SAME quality-label NB fit recal_scores memoizes
        // (nbCalibModel) — identical input rows ⇒ identical model; the
        // r14 memoization move, extended to this key's fit (measured
        // 3.1 → ~1.5 s in-sweep; the oracle still re-derives the fit
        // from raw text)
        val model = nbCalibModel(s, d,
          ClassifyOps.nbFit(labeled, "text", "rule_label"))
        ClassifyOps.nbClassifyWith(built, "doc_id", "text", model)
          .join(labeled.select(col("doc_id"), col("rule_label")), Seq("doc_id"))
          .select(col("doc_id"), col("pred_label"), col("n_tokens"),
            col("neg_ll"),
            (col("pred_label") === col("rule_label")).cast(IntegerType)
              .as("agrees"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |lab AS (
             |  SELECT doc_id, text,
             |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
             |              AND NOT contains(text, '{')
             |              AND len(list_filter(string_split(text, chr(10)),
             |                l -> regexp_matches(trim(l), '[.!?"]$')
             |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
             |                  >= 3
             |         THEN 'keep' ELSE 'drop' END AS label
             |  FROM built),
             |toks0 AS (
             |  SELECT doc_id, label,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM lab),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |ct AS (SELECT label, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |tot AS (SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM t),
             |lp AS (
             |  SELECT label, tok,
             |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
             |  FROM ct JOIN tot USING (label) CROSS JOIN v),
             |dflt AS (
             |  SELECT label,
             |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
             |  FROM tot CROSS JOIN v),
             |prior AS (
             |  SELECT label,
             |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lab))
             |      AS DECIMAL(20,6)) AS prior
             |  FROM lab GROUP BY 1),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, c.label, p.prior,
             |    sum(dt.cnt) AS n_tok,
             |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
             |  FROM dt
             |  CROSS JOIN (SELECT label FROM tot) c
             |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
             |  JOIN dflt f ON f.label = c.label
             |  JOIN prior p ON p.label = c.label
             |  GROUP BY dt.doc_id, c.label, p.prior),
             |ranked AS (
             |  SELECT doc_id, label, prior + ll AS score, n_tok,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY prior + ll DESC, label ASC) AS rn
             |  FROM scored)
             |SELECT r.doc_id, r.label AS pred_label,
             |  CAST(r.n_tok AS BIGINT) AS n_tokens,
             |  CAST(-r.score AS DOUBLE) AS neg_ll,
             |  CAST(r.label = b.label AS INTEGER) AS agrees
             |FROM ranked r JOIN lab b USING (doc_id)
             |WHERE r.rn = 1 ORDER BY r.doc_id""".stripMargin),
      allowBnlj = true),



    // NB MODEL ARTIFACT roundtrip (round 11, the bm25_model_roundtrip
    // pattern): fit a language classifier on the documents table's own
    // lang labels, PERSIST the model (exact-decimal log-likelihoods) as
    // parquet, and classify through the RELOADED artifact — zero fit
    // jobs in the query plan (the reload is a leaf scan;
    // materializeUnlessLeaf is a no-op on it). DuckDB scores through
    // the SAME staged model: per-doc Σ cnt·lp_eff in exact decimals,
    // argmax (score DESC, label ASC).
    "text_nb_model_roundtrip" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val dir = staged(d, "nb_lang_model") { dir =>
          ClassifyOps.nbFit(docs, "text", "lang")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val model = s.read.parquet(dir)
        ClassifyOps.nbClassifyWith(docs, "doc_id", "text", model)
          .orderBy(col("doc_id"))
      },
      Some("""WITH model AS (
             |  SELECT _label, _tok, _lp, _prior FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/nb_lang_model/*.parquet')),
             |tok_rows AS (
             |  SELECT _label AS label, _tok AS tok, _lp AS lp FROM model
             |  WHERE _tok IS NOT NULL),
             |class_rows AS (
             |  SELECT _label AS label, _lp AS dlp, _prior AS prior FROM model
             |  WHERE _tok IS NULL),
             |toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |sc AS (
             |  SELECT dt.doc_id, c.label, c.prior,
             |    CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             |    SUM(CAST(cnt AS DECIMAL(10,0)) * COALESCE(tr.lp, c.dlp)) AS ll
             |  FROM dt CROSS JOIN class_rows c
             |  LEFT JOIN tok_rows tr ON tr.tok = dt.tok AND tr.label = c.label
             |  GROUP BY dt.doc_id, c.label, c.prior),
             |best AS (
             |  SELECT doc_id, label, n_tokens, prior + ll AS score,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY (prior + ll) DESC, label) AS rn
             |  FROM sc)
             |SELECT doc_id, label AS pred_label, n_tokens,
             |  CAST(-score AS DOUBLE) AS neg_ll
             |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      allowBnlj = true),



    // Per-document top term by corpus rarity: score = tf × N/df — a
    // monotone transform of tf·idf (N/df is what ln compresses), kept as
    // an exact integer ratio so the hash is engine-exact (ln(x) can
    // differ in the last ulp across libm implementations). The doc count
    // rides along as a broadcast scalar — no driver-side count.
    "text_tfidf_top_term" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val toks = docs
          .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
          .filter(length(col("term")) > 0)
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        // df = #docs containing term = #tf rows per term — derived from tf
        // instead of a second explode+distinct over the corpus. Both join
        // branches now share the identical explode+aggregate subtree, so
        // the (doc_id, term) shuffle is computed once and ReusedExchange
        // feeds the second branch.
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
        tf.join(dfreq, Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("score",
            (col("tf") * col("n_docs").cast(DoubleType)) / col("df"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("term").as("top_term"), col("score"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents),
             |tok2 AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
             |dfreq AS (
             |  SELECT term, count(*) AS df
             |  FROM (SELECT DISTINCT doc_id, term FROM tok2) GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, tf.term AS term,
             |    (tf * CAST(n_docs AS DOUBLE)) / df AS score,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY (tf * CAST(n_docs AS DOUBLE)) / df DESC, tf.term) AS rn
             |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
             |SELECT doc_id, term AS top_term, score
             |FROM scored WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      allowBnlj = true),



    // Gopher-style composite quality rules (Rae et al. 2021 A1): per-doc
    // flags + AND'd keep. Integer counts and single IEEE divisions
    // throughout ⇒ fully ORACLED. On the current fixture (31-word
    // vocabulary containing exactly ONE Gopher stopword) the
    // AND'd keep is 0/500 — ok_stopwords (≥2 distinct) fails every
    // doc while ok_word_count varies 279/500; the per-flag columns
    // are the signal here. profile_agreement runs the same rater at
    // minStopwords=1 where it discriminates (r14 audit; an earlier
    // comment's '179/500 keep' described a pre-refresh fixture).
    "text_gopher_filter" -> QuerySpec(
      (s, d) => TextOps.gopherQualityFlags(t(s, d, "documents"), "text")
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("ok_word_count"), col("ok_mean_len"), col("ok_symbol_ratio"),
          col("ok_alpha_ratio"), col("ok_stopwords"), col("keep"))
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id, lower(text) AS lt,
             |    string_split(lower(text), ' ') AS w FROM documents),
             |feat AS (
             |  SELECT doc_id, len(w) AS n_words,
             |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_word_len,
             |    len(regexp_extract_all(lt, '#|\.\.\.')) AS n_symbol,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
             |    len(list_filter(['the','be','to','of','and','that','have','with'],
             |      s -> list_contains(w, s))) AS n_stop
             |  FROM base)
             |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
             |  CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) AS ok_word_count,
             |  CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INTEGER) AS ok_mean_len,
             |  CAST(CAST(n_symbol AS DOUBLE)/n_words <= 0.1 AS INTEGER) AS ok_symbol_ratio,
             |  CAST(CAST(n_alpha AS DOUBLE)/n_words >= 0.8 AS INTEGER) AS ok_alpha_ratio,
             |  CAST(n_stop >= 2 AS INTEGER) AS ok_stopwords,
             |  CAST(n_words >= 50 AND n_words <= 100000
             |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
             |   AND CAST(n_symbol AS DOUBLE)/n_words <= 0.1
             |   AND CAST(n_alpha AS DOUBLE)/n_words >= 0.8
             |   AND n_stop >= 2 AS INTEGER) AS keep
             |FROM feat ORDER BY doc_id""".stripMargin)),



    // Sliding-window chunking (sequence prep: 32-token windows, stride
    // 24 ⇒ 8-token overlap). Pure per-row transform+explode, zero
    // shuffle. Fully ORACLED including the chunk text.
    "text_chunk_windows" -> QuerySpec(
      (s, d) => TextOps.chunkWindows(
        t(s, d, "documents"), "doc_id", "text", win = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |nch AS (
             |  SELECT doc_id, w,
             |    greatest(0, CAST(ceil((len(w) - 32) / 24.0) AS BIGINT)) + 1 AS n
             |  FROM base),
             |chunks AS (
             |  SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_idx,
             |    array_to_string(w[(u.i*24+1):(u.i*24+32)], ' ') AS chunk_text
             |  FROM nch, UNNEST(range(0, n)) AS u(i))
             |SELECT doc_id, chunk_idx, chunk_text,
             |  CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens
             |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin)),



    // C4-style line-structure cleaning. The corpus is single-line
    // punctuation-free token text, so the key first BUILDS a multi-line
    // fixture deterministically (8-token lines; terminal '.' on lines
    // where (doc_id+i) % 3 != 0; boilerplate/brace planted on doc_id
    // multiples of 37/41), then applies the operator — and the oracle
    // restates BOTH the construction and the rules in DuckDB list
    // lambdas, so line retention, every doc-level flag, and the rebuilt
    // clean_text are all hash-compared. Zero shuffle end to end.
    "text_c4_filter" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toks, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        TextOps.c4QualityFlags(built, "text")
          .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
            col("has_lorem"), col("has_brace"), col("keep"), col("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |flags AS (
             |  SELECT doc_id, string_split(text, chr(10)) AS lines,
             |    list_filter(string_split(text, chr(10)),
             |      l -> regexp_matches(trim(l), '[.!?"]$')
             |           AND len(string_split_regex(trim(l), '\s+')) >= 5) AS kept,
             |    contains(lower(text), 'lorem ipsum') AS hl,
             |    contains(text, '{') AS hb
             |  FROM built)
             |SELECT doc_id,
             |  CAST(len(lines) AS BIGINT) AS n_lines,
             |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
             |  CAST(hl AS INTEGER) AS has_lorem,
             |  CAST(hb AS INTEGER) AS has_brace,
             |  CAST(NOT hl AND NOT hb AND len(kept) >= 3 AS INTEGER) AS keep,
             |  array_to_string(kept, chr(10)) AS clean_text
             |FROM flags ORDER BY doc_id""".stripMargin)),



    // HTML → main-content extraction (TextOps.htmlExtract), the crawl
    // front stage BEFORE the text-quality ladder. The corpus is plain
    // text, so the key first BUILDS a full page deterministically per
    // doc — head with title/style/script (braces and a '<' comparison
    // INSIDE the script, so any leak trips has_brace downstream), nav
    // chrome, a 3-word h1, 8-token <p> paragraphs (entities planted on
    // doc_id%5: &amp; and &lt;em&gt;, the latter decoding to a literal
    // '<em>' AFTER tag stripping — the escaping round trip), an HTML
    // comment with dense word content on doc_id%7 (tests comment
    // removal, not just tag removal), and two short footers. Extraction
    // + the density/promotion heuristic + the chained c4 quality flags
    // on the EXTRACTED text are all restated in DuckDB — line counts,
    // promotion decisions (h1 rescued by its dense neighbor, lone
    // footers dropped), entity decoding, and content_text hash-compare.
    "text_html_extract" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nP = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val paras = array_join(transform(sequence(lit(0), nP - 1), i =>
          concat(lit("<p>"), array_join(slice(toks, i * 8 + 1, lit(8)), " "),
            when(col("doc_id") % 5 === 0 && i === 0,
              lit(" &amp; more &lt;em&gt;")).otherwise(lit("")),
            lit(".</p>"))), "")
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            lit("<html><head><title>doc "), col("doc_id"), lit(" page</title>"),
            lit("<style>body { color: #000; }</style>"),
            lit("<script>var x = 1; if (x < 2) { x++; }</script>"),
            lit("</head><body>"),
            lit("<nav>Home About</nav>"),
            lit("<h1>Intro notes here</h1>"),
            paras,
            when(col("doc_id") % 7 === 0,
              lit("<!-- hidden comment with words words words words words -->"))
              .otherwise(lit("")),
            lit("<footer>copyright footer</footer>"),
            lit("<footer>end</footer>"),
            lit("</body></html>")).as("html"))
        val extracted = TextOps.htmlExtract(built, "html")
        TextOps.c4QualityFlags(extracted, "content_text")
          .select(col("doc_id"), col("n_raw_lines"), col("n_content_lines"),
            col("n_lines_kept"), col("has_brace"), col("keep"),
            col("content_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    '<html><head><title>doc ' || doc_id || ' page</title>' ||
             |    '<style>body { color: #000; }</style>' ||
             |    '<script>var x = 1; if (x < 2) { x++; }</script>' ||
             |    '</head><body>' ||
             |    '<nav>Home About</nav>' ||
             |    '<h1>Intro notes here</h1>' ||
             |    array_to_string(list_transform(
             |      range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |      i -> '<p>' || array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |           CASE WHEN doc_id % 5 = 0 AND i = 0
             |                THEN ' &amp; more &lt;em&gt;' ELSE '' END ||
             |           '.</p>'), '') ||
             |    CASE WHEN doc_id % 7 = 0
             |      THEN '<!-- hidden comment with words words words words words -->'
             |      ELSE '' END ||
             |    '<footer>copyright footer</footer>' ||
             |    '<footer>end</footer>' ||
             |    '</body></html>' AS html
             |  FROM base),
             |ex1 AS (
             |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
             |    '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
             |    '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
             |    '(?s)<!--.*?-->', ' ', 'g') AS h FROM built),
             |ex2 AS (
             |  SELECT doc_id, regexp_replace(h,
             |    '(?i)<(?:/?(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|header|footer|nav|title|head|body|html)\b[^>]*|br\s*/?)>',
             |    chr(10), 'g') AS h FROM ex1),
             |ex3 AS (
             |  SELECT doc_id, regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h
             |  FROM ex2),
             |ex4 AS (
             |  SELECT doc_id, replace(replace(replace(replace(replace(replace(h,
             |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             |    '&#39;', ''''), '&amp;', '&') AS h FROM ex3),
             |lined AS (
             |  SELECT doc_id,
             |    list_filter(list_transform(string_split(h, chr(10)),
             |      l -> trim(regexp_replace(l, '\s+', ' ', 'g'))),
             |      l -> length(l) > 0) AS lines
             |  FROM ex4),
             |dens AS (
             |  SELECT doc_id, lines,
             |    list_transform(lines, l -> len(string_split(l, ' ')) >= 5) AS dense
             |  FROM lined),
             |content AS (
             |  SELECT doc_id, lines,
             |    list_filter(lines, (l, i) ->
             |      dense[i] OR (i > 1 AND dense[i-1])
             |              OR (i < len(lines) AND dense[i+1])) AS kept
             |  FROM dens),
             |final AS (
             |  SELECT doc_id, len(lines) AS n_raw_lines,
             |    len(kept) AS n_content_lines,
             |    array_to_string(kept, chr(10)) AS content_text
             |  FROM content),
             |c4 AS (
             |  SELECT *,
             |    list_filter(string_split(content_text, chr(10)),
             |      l -> regexp_matches(trim(l), '[.!?"]$')
             |           AND len(string_split_regex(trim(l), '\s+')) >= 5) AS c4kept,
             |    contains(lower(content_text), 'lorem ipsum') AS hl,
             |    contains(content_text, '{') AS hb
             |  FROM final)
             |SELECT doc_id, CAST(n_raw_lines AS BIGINT) AS n_raw_lines,
             |  CAST(n_content_lines AS BIGINT) AS n_content_lines,
             |  CAST(len(c4kept) AS BIGINT) AS n_lines_kept,
             |  CAST(hb AS INTEGER) AS has_brace,
             |  CAST(NOT hl AND NOT hb AND len(c4kept) >= 3 AS INTEGER) AS keep,
             |  content_text
             |FROM c4 ORDER BY doc_id""".stripMargin)),



    // Intra-doc line dedup (boilerplate removal: keep the FIRST
    // occurrence of each line within its document, order preserved).
    // Multi-line fixture built like text_c4_filter's, with planted
    // repeats: every doc gets its first 8-token line re-appended, and
    // doc_id % 3 == 0 docs get it twice. Zero shuffle; oracle restates
    // the keep-first rule with DuckDB's indexed list_filter.
    "text_dedup_lines" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val firstLine = array_join(slice(toks, 1, 8), " ")
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")), "\n"),
            concat(lit("\n"), firstLine),
            when(col("doc_id") % 3 === 0, concat(lit("\n"), firstLine))
              .otherwise(lit(""))).as("text"))
        TextOps.dedupLinesWithinDoc(built, "text")
          .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
            col("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ')),
             |      chr(10))
             |    || chr(10) || array_to_string(toks[1:8], ' ')
             |    || CASE WHEN doc_id % 3 = 0
             |            THEN chr(10) || array_to_string(toks[1:8], ' ')
             |            ELSE '' END AS text
             |  FROM base),
             |dedup AS (
             |  SELECT doc_id, string_split(text, chr(10)) AS lines,
             |    list_filter(string_split(text, chr(10)),
             |      (l, i) -> list_position(string_split(text, chr(10)), l) = i) AS kept
             |  FROM built)
             |SELECT doc_id,
             |  CAST(len(lines) AS BIGINT) AS n_lines,
             |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
             |  array_to_string(kept, chr(10)) AS clean_text
             |FROM dedup ORDER BY doc_id""".stripMargin)),



    // LINEAR-scale twin of text_dedup_lines (explode → min-pos per
    // (doc, line) → positional rebuild; two shuffles instead of the
    // per-row O(lines²) scan — the straggler-safe form for crawl docs
    // with pathological line counts). Same fixture, same keep-first
    // contract, independently restated oracle: DuckDB computes min-pos
    // per line via a window instead of the indexed list_filter, so the
    // two keys cross-check each other's formulation.
    "text_dedup_lines_scalable" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val firstLine = array_join(slice(toks, 1, 8), " ")
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")), "\n"),
            concat(lit("\n"), firstLine),
            when(col("doc_id") % 3 === 0, concat(lit("\n"), firstLine))
              .otherwise(lit(""))).as("text"))
        TextOps.dedupLinesWithinDocScalable(built, "doc_id", "text")
          .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
            col("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ')),
             |      chr(10))
             |    || chr(10) || array_to_string(toks[1:8], ' ')
             |    || CASE WHEN doc_id % 3 = 0
             |            THEN chr(10) || array_to_string(toks[1:8], ' ')
             |            ELSE '' END AS text
             |  FROM base),
             |exploded AS (
             |  SELECT doc_id, unnest(lines) AS line,
             |    unnest(range(1, len(lines) + 1)) AS pos,
             |    len(lines) AS n_lines
             |  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines
             |        FROM built)),
             |firsts AS (
             |  SELECT doc_id, line, min(pos) AS pos, any_value(n_lines) AS n_lines
             |  FROM exploded GROUP BY doc_id, line)
             |SELECT doc_id,
             |  CAST(any_value(n_lines) AS BIGINT) AS n_lines,
             |  CAST(count(*) AS BIGINT) AS n_lines_kept,
             |  array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text
             |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin)),



    // Unigram LM quality scoring (the perplexity-filter seam): per-doc
    // mean negative log-prob of its tokens under the corpus unigram
    // distribution, additive smoothing 0.5. Fully ORACLED — per-token
    // ln() casts to DECIMAL(20,9) before the per-doc sum, so the
    // statistic is order-independent and the engines' libm disagreement
    // (≤1 ulp) is rounded away; the mean divides once at the end.
    "text_unigram_logprob" -> QuerySpec(
      (s, d) => TextOps.unigramLogProb(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("mean_neg_logprob"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
             |  FROM documents),
             |toks2 AS (SELECT * FROM toks WHERE length(tok) > 0),
             |vocab AS (SELECT tok, count(*) AS c FROM toks2 GROUP BY tok),
             |tot AS (SELECT sum(c) AS t, count(*) AS v FROM vocab),
             |lp AS (
             |  SELECT tok,
             |    CAST(ln((c + 0.5) / (t + 0.5 * v)) AS DECIMAL(20,9)) AS lp
             |  FROM vocab, tot)
             |SELECT doc_id,
             |  count(*) AS n_tokens,
             |  round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS mean_neg_logprob
             |FROM toks2 JOIN lp USING (tok)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      allowBnlj = true),



    // Bigram LM with stupid backoff (Brants et al. 2007) — the
    // context-aware upgrade of text_unigram_logprob: fit on the EVEN
    // docs, score ALL docs, so odd docs exercise every resolution tier
    // (seen bigram → ML row; unseen bigram, seen word → α-scaled
    // unigram backoff; OOV word → OOV row). Log-probs quantized
    // DECIMAL(20,9) once at fit ⇒ per-doc sums are exact decimal adds
    // ⇒ fully oracled; n_backoff (pairs that missed the bigram table)
    // is the exact-integer coverage diagnostic. DuckDB rebuilds pairs
    // via list_zip with a chr(1) BOS (the NULL-padded tail pair is
    // filtered on both engines), counts, both smoothing formulas with
    // the same IEEE op order, and the three-way coalesce.
    "text_bigram_logprob" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextOps.bigramLmFit(
          docs.filter(col("doc_id") % 2 === 0), "text")
        TextOps.bigramScoreWith(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_tokens"), col("n_backoff"),
            col("mean_neg_logprob"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH lab AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(lower(text), '\s+'),
             |    t -> length(t) > 0) AS l
             |  FROM documents),
             |ne AS (SELECT doc_id, l FROM lab WHERE len(l) > 0),
             |pz AS (
             |  SELECT doc_id, unnest(list_zip(
             |    list_concat([chr(1)], l[1:len(l)-1]), l)) AS z
             |  FROM ne),
             |pairs AS (
             |  SELECT doc_id, z[1] AS prev, z[2] AS w
             |  FROM pz WHERE z[2] IS NOT NULL),
             |fit AS (SELECT * FROM pairs WHERE doc_id % 2 = 0),
             |cb AS (SELECT prev, w, count(*) AS cb FROM fit GROUP BY 1, 2),
             |cp AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp
             |       FROM cb GROUP BY 1),
             |blp AS (
             |  SELECT cb.prev, cb.w,
             |    CAST(ln(CAST(cb.cb AS DOUBLE) / cp.cp) AS DECIMAL(20,9)) AS lp
             |  FROM cb JOIN cp ON cp.prev = cb.prev),
             |uni AS (SELECT w, count(*) AS cnt FROM fit GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
             |               count(*) AS v FROM uni),
             |ulp AS (
             |  SELECT w, CAST(ln((CAST(0.4 AS DOUBLE) * (cnt + CAST(0.5 AS DOUBLE))) /
             |    (total + CAST(0.5 AS DOUBLE) * v)) AS DECIMAL(20,9)) AS lp
             |  FROM uni CROSS JOIN tot),
             |olp AS (
             |  SELECT CAST(ln((CAST(0.4 AS DOUBLE) * CAST(0.5 AS DOUBLE)) /
             |    (total + CAST(0.5 AS DOUBLE) * v)) AS DECIMAL(20,9)) AS lp
             |  FROM tot),
             |sc AS (
             |  SELECT p.doc_id,
             |    coalesce(blp.lp, ulp.lp, olp.lp) AS plp,
             |    CASE WHEN blp.lp IS NULL THEN 1 ELSE 0 END AS miss
             |  FROM pairs p
             |  LEFT JOIN blp ON blp.prev = p.prev AND blp.w = p.w
             |  LEFT JOIN ulp ON ulp.w = p.w
             |  CROSS JOIN olp)
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(sum(miss) AS BIGINT) AS n_backoff,
             |  round(-CAST(sum(plp) AS DOUBLE) / count(*), 6) AS mean_neg_logprob
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      allowBnlj = true),



    // INTERPOLATED KNESER-NEY bigram LM (TextOps.knBigramFit, Kneser &
    // Ney 1995 / Chen & Goodman 1998) — the standard n-gram smoothing
    // (the KenLM default) beside text_bigram_logprob's stupid backoff:
    // unseen bigrams back off to the CONTINUATION probability
    // N1+(·w)/T (how many distinct contexts w follows), not the raw
    // frequency — the 'Francisco' fix: frequent-but-context-bound
    // words score implausible in novel contexts. Same fit-on-even /
    // score-all split so odd docs exercise every tier: seen bigram →
    // interpolated row; unseen pair with seen context and word →
    // λ(v)·p_cont(w) as the EXACT DECIMAL ADD of two quantized logs
    // (no new transcendental at score time); unseen context →
    // p_cont(w); OOV word → the D/T floor. D = 0.75 exactly binary;
    // every probability ONE fixed IEEE chain; ln quantized
    // DECIMAL(20,9) once per vocab-grain row, the oracle through the
    // VARCHAR bridge. n_backoff/n_oov are the coverage diagnostics.
    "text_kn_bigram" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        // fit-once/serve-many: text_ccnet_split scores through the SAME
        // even-split KN model — memoized (memoModel), hashes unchanged
        val model = memoModel(s, d, "kn_even")(TextOps.knBigramFit(
          docs.filter(col("doc_id") % 2 === 0), "text"))
        TextOps.knBigramScoreWith(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_tokens"), col("n_backoff"),
            col("n_oov"), col("mean_neg_logprob"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH lab AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(lower(text), '\s+'),
             |    t -> length(t) > 0) AS l
             |  FROM documents),
             |ne AS (SELECT doc_id, l FROM lab WHERE len(l) > 0),
             |pz AS (
             |  SELECT doc_id, unnest(list_zip(
             |    list_concat([chr(1)], l[1:len(l)-1]), l)) AS z
             |  FROM ne),
             |pairs AS (
             |  SELECT doc_id, z[1] AS prev, z[2] AS w
             |  FROM pz WHERE z[2] IS NOT NULL),
             |fit AS (SELECT * FROM pairs WHERE doc_id % 2 = 0),
             |cb AS (SELECT prev, w, count(*) AS cb FROM fit GROUP BY 1, 2),
             |cp AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp,
             |         CAST(count(*) AS BIGINT) AS n1p
             |       FROM cb GROUP BY 1),
             |n1c AS (SELECT w, CAST(count(*) AS BIGINT) AS n1c
             |        FROM cb GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cb),
             |blp AS (
             |  SELECT cb.prev, cb.w,
             |    CAST(CAST(ln(
             |      (cb.cb - CAST(0.75 AS DOUBLE)) / cp.cp +
             |      ((CAST(0.75 AS DOUBLE) * cp.n1p) / cp.cp) *
             |        (n1c.n1c / tot.t)) AS VARCHAR) AS DECIMAL(20,9)) AS lp
             |  FROM cb
             |  JOIN cp ON cp.prev = cb.prev
             |  JOIN n1c ON n1c.w = cb.w
             |  CROSS JOIN tot),
             |klam AS (
             |  SELECT prev, CAST(CAST(ln(
             |      (CAST(0.75 AS DOUBLE) * n1p) / cp) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM cp),
             |kcont AS (
             |  SELECT w, CAST(CAST(ln(n1c.n1c / tot.t) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM n1c CROSS JOIN tot),
             |kolp AS (
             |  SELECT CAST(CAST(ln(CAST(0.75 AS DOUBLE) / t) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM tot),
             |sc AS (
             |  SELECT p.doc_id,
             |    coalesce(blp.lp, klam.lp + kcont.lp, kcont.lp, kolp.lp) AS plp,
             |    CASE WHEN blp.lp IS NULL THEN 1 ELSE 0 END AS miss,
             |    CASE WHEN kcont.lp IS NULL THEN 1 ELSE 0 END AS oovf
             |  FROM pairs p
             |  LEFT JOIN blp ON blp.prev = p.prev AND blp.w = p.w
             |  LEFT JOIN klam ON klam.prev = p.prev
             |  LEFT JOIN kcont ON kcont.w = p.w
             |  CROSS JOIN kolp)
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(sum(miss) AS BIGINT) AS n_backoff,
             |  CAST(sum(oovf) AS BIGINT) AS n_oov,
             |  round(-CAST(sum(plp) AS DOUBLE) / count(*), 6) AS mean_neg_logprob
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      allowBnlj = true),



    // CCNet perplexity split (Wenzek et al. 2020, TextOps.ccnetSplit):
    // the head / middle / tail TERCILES by the frozen KN bigram LM's
    // per-doc mean negative log-prob — the routing decision the CCNet
    // pipeline makes on every shard (keep head, re-filter tail). The
    // terciles are exact integer rank·3 div N cuts over the
    // (score, doc_id) total order (the curriculumSample contract);
    // the score lands on the 1e-6 grid upstream so bucket means are
    // exact-decimal sums with ONE division. The oracle re-derives the
    // whole chain: KN fit, per-doc scores, the rank window, and the
    // integer buckets.
    "text_ccnet_split" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        // the shared memoized even-split KN model (see text_kn_bigram)
        val model = memoModel(s, d, "kn_even")(TextOps.knBigramFit(
          docs.filter(col("doc_id") % 2 === 0), "text"))
        val scored = TextOps.knBigramScoreWith(docs, "doc_id", "text", model)
        TextOps.ccnetSplit(scored, "doc_id", "mean_neg_logprob", "n_tokens")
      },
      Some("""WITH lab AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(lower(text), '\s+'),
             |    t -> length(t) > 0) AS l
             |  FROM documents),
             |ne AS (SELECT doc_id, l FROM lab WHERE len(l) > 0),
             |pz AS (
             |  SELECT doc_id, unnest(list_zip(
             |    list_concat([chr(1)], l[1:len(l)-1]), l)) AS z
             |  FROM ne),
             |pairs AS (
             |  SELECT doc_id, z[1] AS prev, z[2] AS w
             |  FROM pz WHERE z[2] IS NOT NULL),
             |fit AS (SELECT * FROM pairs WHERE doc_id % 2 = 0),
             |cb AS (SELECT prev, w, count(*) AS cb FROM fit GROUP BY 1, 2),
             |cp AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp,
             |         CAST(count(*) AS BIGINT) AS n1p
             |       FROM cb GROUP BY 1),
             |n1c AS (SELECT w, CAST(count(*) AS BIGINT) AS n1c
             |        FROM cb GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cb),
             |blp AS (
             |  SELECT cb.prev, cb.w,
             |    CAST(CAST(ln(
             |      (cb.cb - CAST(0.75 AS DOUBLE)) / cp.cp +
             |      ((CAST(0.75 AS DOUBLE) * cp.n1p) / cp.cp) *
             |        (n1c.n1c / tot.t)) AS VARCHAR) AS DECIMAL(20,9)) AS lp
             |  FROM cb
             |  JOIN cp ON cp.prev = cb.prev
             |  JOIN n1c ON n1c.w = cb.w
             |  CROSS JOIN tot),
             |klam AS (
             |  SELECT prev, CAST(CAST(ln(
             |      (CAST(0.75 AS DOUBLE) * n1p) / cp) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM cp),
             |kcont AS (
             |  SELECT w, CAST(CAST(ln(n1c.n1c / tot.t) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM n1c CROSS JOIN tot),
             |kolp AS (
             |  SELECT CAST(CAST(ln(CAST(0.75 AS DOUBLE) / t) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM tot),
             |sc AS (
             |  SELECT p.doc_id,
             |    coalesce(blp.lp, klam.lp + kcont.lp, kcont.lp, kolp.lp) AS plp
             |  FROM pairs p
             |  LEFT JOIN blp ON blp.prev = p.prev AND blp.w = p.w
             |  LEFT JOIN klam ON klam.prev = p.prev
             |  LEFT JOIN kcont ON kcont.w = p.w
             |  CROSS JOIN kolp),
             |perdoc AS (
             |  SELECT doc_id, count(*) AS n_tokens,
             |    round(-CAST(sum(plp) AS DOUBLE) / count(*), 6) AS mnl
             |  FROM sc GROUP BY doc_id),
             |r AS (
             |  SELECT doc_id, n_tokens, mnl,
             |    row_number() OVER (ORDER BY mnl, doc_id) - 1 AS rk,
             |    count(*) OVER () AS n
             |  FROM perdoc),
             |b AS (
             |  SELECT CAST((rk * 3) // n AS INTEGER) AS bucket_idx,
             |    CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |    SUM(CAST(CAST(mnl AS VARCHAR) AS DECIMAL(12,6))) AS s,
             |    min(mnl) AS min_nll, max(mnl) AS max_nll
             |  FROM r GROUP BY 1)
             |SELECT CASE bucket_idx WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
             |         ELSE 'tail' END AS bucket,
             |  bucket_idx, n_docs, n_tokens,
             |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_docs AS DOUBLE)
             |    AS mean_nll,
             |  min_nll, max_nll
             |FROM b ORDER BY bucket_idx""".stripMargin),
      allowBnlj = true),



    // URL front stage: parse host/registrable-domain/path, drop
    // blocklisted domains, cap each remaining domain at 10 docs (the
    // RefinedWeb-style domain-diversity cap — URL-level filtering
    // happens BEFORE any content is read, so at 100 TB this stage
    // prunes the scan, not the corpus). URLs are BUILT deterministically
    // from table fields (the text_html_extract fixture precedent):
    // 40 hosts, every 7th doc behind a www. prefix so host ≠ domain is
    // actually exercised. DuckDB restates the same regexes, blocklist,
    // and LCG-ranked cap.
    "text_url_domain_cap" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val withUrl = docs.select(col("doc_id"), col("source"),
          concat(lit("https://"),
            when(col("doc_id") % 7 === 0, lit("www.")).otherwise(lit("")),
            lit("site"), (col("doc_id") % 40).cast(StringType),
            lit(".example/"), col("source"),
            lit("/p"), col("doc_id").cast(StringType)).as("url"))
        TextOps.domainDiversityCap(withUrl, "url", "doc_id",
            n = 10, seed = 7L,
            blocked = Seq("site7.example", "site23.example"))
          .withColumn("path", TextOps.urlPath(col("url")))
          .select(col("doc_id"), col("host"), col("domain"), col("path"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH withu AS (
             |  SELECT doc_id,
             |    'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END
             |      || 'site' || CAST(doc_id % 40 AS VARCHAR) || '.example/'
             |      || source || '/p' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents),
             |parts AS (
             |  SELECT doc_id, url,
             |    lower(regexp_extract(url,
             |      '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1))
             |      AS host
             |  FROM withu),
             |dom AS (
             |  SELECT doc_id, host,
             |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
             |    regexp_extract(url,
             |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path
             |  FROM parts),
             |kept AS (
             |  SELECT * FROM dom
             |  WHERE domain NOT IN ('site7.example', 'site23.example')),
             |u AS (
             |  SELECT *, CAST(((doc_id + 7) * 1103515245 + 12345)
             |      % 2147483648 AS DOUBLE) / 2147483648.0 AS u
             |  FROM kept),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY domain
             |    ORDER BY u, doc_id) AS rn
             |  FROM u)
             |SELECT doc_id, host, domain, path
             |FROM r WHERE rn <= 10 ORDER BY doc_id""".stripMargin)),



    // Registrable-domain extraction through the bundled Public Suffix
    // List snapshot — exercises all three PSL rule shapes (exact
    // co.uk / com.au / 3-label k12.ca.us, wildcard *.ck, exception
    // !www.ck), the private section (github.io), the default rule
    // (unknown TLDs reproduce the last-two-label heuristic), and both
    // no-registrable cases (host IS a public suffix; single label).
    // The oracle replays the SAME algorithm generically: last-k-label
    // candidates joined to the STAGED rule table (the snapshot parsed
    // to parquet), exception beats longest beats default — so the
    // bundled data file, the Spark expression compiler, and an
    // independent engine agree row-for-row.
    // URL canonicalization for crawl dedup (TextOps.canonicalizeUrl):
    // three deterministic messy-URL classes per doc (uppercase
    // scheme/host + :443 + utm params + fragment; :80 http; fbclid
    // tail) collapse to canonical forms, and classes 0 and 2 COLLIDE
    // by construction (same site/page/param mods) — n_same_canon > 1
    // rows are the recrawls a fetcher would skip. Pure regexp column
    // program + one canonical-grain window count; every pattern
    // RE2-compatible so DuckDB restates the chain verbatim (its
    // regexp_replace needs the explicit 'g' flag where Spark is
    // global by default — the cross-engine trap this oracle pins).
    "text_url_canonical" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val site = concat(lit("Site"), (col("doc_id") % 25).cast(StringType),
          lit(".Example"))
        val page = (col("doc_id") % 50).cast(StringType)
        val x = (col("doc_id") % 5).cast(StringType)
        val url = when(col("doc_id") % 3 === 0, concat(
            lit("HTTPS://WWW."), site, lit(":443/Page/"), page,
            lit("?utm_source=feed&utm_id=9&x="), x, lit("#top")))
          .when(col("doc_id") % 3 === 1, concat(
            lit("http://www."), lower(site), lit(":80/Page/"), page))
          .otherwise(concat(
            lit("https://www."), lower(site), lit("/Page/"), page,
            lit("?x="), x, lit("&fbclid=abc")))
        val canon = docs.select(col("doc_id"), url.as("url"))
          .withColumn("canon", TextOps.canonicalizeUrl(col("url")))
        canon
          .withColumn("n_same_canon",
            count(lit(1)).over(Window.partitionBy(col("canon"))))
          .orderBy(col("doc_id"))
      },
      Some {
        val tracker = "(utm_[^=&]*|gclid|fbclid)=[^&]*"
        s"""WITH u AS (
           |  SELECT doc_id,
           |    CASE
           |      WHEN doc_id % 3 = 0 THEN
           |        'HTTPS://WWW.Site' || CAST(doc_id % 25 AS VARCHAR)
           |        || '.Example:443/Page/' || CAST(doc_id % 50 AS VARCHAR)
           |        || '?utm_source=feed&utm_id=9&x='
           |        || CAST(doc_id % 5 AS VARCHAR) || '#top'
           |      WHEN doc_id % 3 = 1 THEN
           |        'http://www.site' || CAST(doc_id % 25 AS VARCHAR)
           |        || '.example:80/Page/' || CAST(doc_id % 50 AS VARCHAR)
           |      ELSE
           |        'https://www.site' || CAST(doc_id % 25 AS VARCHAR)
           |        || '.example/Page/' || CAST(doc_id % 50 AS VARCHAR)
           |        || '?x=' || CAST(doc_id % 5 AS VARCHAR) || '&fbclid=abc'
           |    END AS url
           |  FROM documents),
           |s1 AS (
           |  SELECT doc_id, url,
           |    regexp_replace(url, '#.*$$', '') AS nofrag
           |  FROM u),
           |s2 AS (
           |  SELECT doc_id, url,
           |    lower(regexp_extract(nofrag,
           |      '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
           |    lower(regexp_extract(nofrag,
           |      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS auth,
           |    regexp_extract(nofrag,
           |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
           |  FROM s1),
           |s3 AS (
           |  SELECT doc_id, url, scheme,
           |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
           |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
           |         ELSE auth END AS auth2,
           |    auth,
           |    regexp_extract(rest, '^([^?]*)', 1) AS path,
           |    regexp_replace(
           |      regexp_replace(
           |        regexp_replace(regexp_extract(rest, '(\\?.*)$$', 1),
           |          '&$tracker', '', 'g'),
           |        '\\?$tracker&', '?'),
           |      '\\?$tracker$$', '') AS q3
           |  FROM s2),
           |c AS (
           |  SELECT doc_id, url,
           |    CASE WHEN scheme = '' OR auth = '' THEN NULL
           |      ELSE scheme || '://' || auth2 ||
           |        CASE WHEN path = '' THEN '/' ELSE path END || q3
           |      END AS canon
           |  FROM s3)
           |SELECT doc_id, url, canon,
           |  count(*) OVER (PARTITION BY canon) AS n_same_canon
           |FROM c ORDER BY doc_id""".stripMargin
      }),



    "text_url_psl_domain" -> QuerySpec(
      (s, d) => {
        staged(d, "psl_rules") { dir =>
          PslDomain.rulesDf(s).coalesce(1).write
            .mode("overwrite").parquet(dir)
        }
        val docs = t(s, d, "documents")
        val id = col("doc_id").cast(StringType)
        val m = col("doc_id") % 12
        val host = when(m === 0, concat(lit("site"), id, lit(".co.uk")))
          .when(m === 1, concat(lit("www.site"), id, lit(".com.au")))
          .when(m === 2, concat(lit("a.b.site"), id, lit(".gov.br")))
          .when(m === 3, concat(lit("site"), id, lit(".com")))
          .when(m === 4, concat(lit("site"), id, lit(".example")))
          .when(m === 5, concat(lit("www.site"), id, lit(".github.io")))
          .when(m === 6, concat(lit("site"), id, lit(".foo.ck")))
          .when(m === 7, lit("www.ck"))
          .when(m === 8, lit("co.uk"))
          .when(m === 9, concat(lit("school"), id, lit(".k12.ca.us")))
          .when(m === 10, lit("sub.www.ck"))
          .otherwise(lit("localhost"))
        docs
          .select(col("doc_id"),
            concat(lit("https://"), host, lit("/p"), id).as("url"))
          .select(col("doc_id"), TextOps.urlHost(col("url")).as("host"))
          .withColumn("domain", TextOps.urlDomain(col("host")))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH hosts AS (
             |  SELECT doc_id,
             |    CASE doc_id % 12
             |      WHEN 0 THEN 'site' || CAST(doc_id AS VARCHAR) || '.co.uk'
             |      WHEN 1 THEN 'www.site' || CAST(doc_id AS VARCHAR) || '.com.au'
             |      WHEN 2 THEN 'a.b.site' || CAST(doc_id AS VARCHAR) || '.gov.br'
             |      WHEN 3 THEN 'site' || CAST(doc_id AS VARCHAR) || '.com'
             |      WHEN 4 THEN 'site' || CAST(doc_id AS VARCHAR) || '.example'
             |      WHEN 5 THEN 'www.site' || CAST(doc_id AS VARCHAR) || '.github.io'
             |      WHEN 6 THEN 'site' || CAST(doc_id AS VARCHAR) || '.foo.ck'
             |      WHEN 7 THEN 'www.ck'
             |      WHEN 8 THEN 'co.uk'
             |      WHEN 9 THEN 'school' || CAST(doc_id AS VARCHAR) || '.k12.ca.us'
             |      WHEN 10 THEN 'sub.www.ck'
             |      ELSE 'localhost' END AS host
             |  FROM documents),
             |lab AS (
             |  SELECT doc_id, host, len(string_split(host, '.')) AS n
             |  FROM hosts),
             |cand AS (
             |  SELECT l.doc_id, l.n,
             |    array_to_string(
             |      string_split(l.host, '.')[l.n - r.k + 1 : l.n], '.') AS sfx
             |  FROM lab l
             |  CROSS JOIN range(1, ${PslDomain.rules.map(_.nlabels).max + 1}) r(k)
             |  WHERE r.k <= l.n),
             |m AS (
             |  SELECT c.doc_id,
             |    max(CASE WHEN p.kind = 'e' THEN p.nlabels - 1 END) AS exc_len,
             |    max(CASE WHEN p.kind = 'x' THEN p.nlabels END) AS x_len,
             |    max(CASE WHEN p.kind = 'w' AND c.n >= p.nlabels + 1
             |             THEN p.nlabels + 1 END) AS w_len
             |  FROM cand c
             |  JOIN read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/psl_rules/*.parquet') p
             |    ON p.suffix = c.sfx
             |  GROUP BY c.doc_id),
             |sl AS (
             |  SELECT l.doc_id, l.host, l.n,
             |    coalesce(m.exc_len,
             |      greatest(coalesce(m.x_len, 0), coalesce(m.w_len, 0), 1)) AS sl
             |  FROM lab l LEFT JOIN m ON m.doc_id = l.doc_id)
             |SELECT doc_id, host,
             |  CASE WHEN n > sl THEN array_to_string(
             |    string_split(host, '.')[n - sl : n], '.') ELSE '' END AS domain
             |FROM sl ORDER BY doc_id""".stripMargin)),



    // Vocabulary build (token → dense id by count DESC, token): the
    // corpus-scale work is one token-count shuffle with map-side
    // combine; ids come from a range-partitioned sort + zipWithIndex
    // (no single-task global window). Deterministic tie-break ⇒ fully
    // oracled ids.
    "text_build_vocab" -> QuerySpec(
      (s, d) => TextOps.buildVocab(t(s, d, "documents"), "text", minCount = 5)
        .orderBy(col("token_id")),
      Some("""WITH toks AS (
             |  SELECT unnest(string_split(lower(text), ' ')) AS token
             |  FROM documents),
             |counts AS (
             |  SELECT token, count(*) AS n FROM toks
             |  WHERE length(token) > 0
             |  GROUP BY token HAVING count(*) >= 5)
             |SELECT token, n,
             |  CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
             |    AS token_id
             |FROM counts ORDER BY token_id""".stripMargin)),



    // Flesch-Kincaid readability (TextOps.readability): the model-free
    // complexity score beside the LM tiers — vowel-group syllables,
    // [.!?]+ sentences floored at 1, one fixed IEEE chain over exact
    // integer counts; zero-shuffle column program ⇒ fully oracled.
    "text_readability" -> QuerySpec(
      (s, d) => TextOps.readability(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH c AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |      x -> length(x) > 0)) AS BIGINT) AS n_words,
             |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
             |      AS BIGINT) AS n_sentences,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |      AS BIGINT) AS n_syllables
             |  FROM documents)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  CASE WHEN n_words > 0 THEN
             |    0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             |    - 15.59 END AS fk_grade
             |FROM c ORDER BY doc_id""".stripMargin)),



    // N-gram novelty (unique-content ratio): the fraction of a doc's
    // DISTINCT 3-grams appearing in NO other document — the quality
    // signal that separates original writing from boilerplate/mirrored
    // content (near-zero novelty = the doc is assembled from phrases
    // the corpus already has; the doc-grain complement of
    // dedup_span_stats' gram-grain view). Exact integers end to end,
    // the ratio is one IEEE division. Fully oracled.
    //
    // Scale shape — NO gram-stream self-join: per-doc totals are
    // row-local (size of the distinct-gram array, zero shuffle), and a
    // corpus-unique gram has EXACTLY ONE owner, so min(doc_id) inside
    // the per-gram count aggregation IS the attribution — the second
    // shuffle carries one slim long per unique gram instead of joining
    // the full gram stream back to its counts (the first version's
    // corpus×corpus string join benched 6.3 s at sf0.1; this shape
    // retires it).
    "text_ngram_novelty" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val withG = docs.select(col("doc_id"),
          array_distinct(TextOps.ngrams(col("text"), 3)).as("_g"))
        // doc-GRAIN totals (groupBy, not a per-row projection): under a
        // duplicated doc_id the per-row form would emit multiple rows
        // pairing row-local totals with doc-level unique counts — the
        // aggregate keeps one row per doc_id, free at the slim
        // (id, count) grain. Contract: doc_id UNIQUE (the documents
        // table's key). Under duplicate ids this shape and the oracle
        // diverge (row-grain sums/ownership here vs the oracle's
        // (doc_id, gram) DISTINCT); deduping grams by (doc_id, gram)
        // first would restore agreement at the cost of a corpus-scale
        // extra shuffle the unique-key contract makes unnecessary
        val perDoc = withG
          .select(col("doc_id"), size(col("_g")).cast(LongType).as("_n"))
          .groupBy(col("doc_id"))
          .agg(sum(col("_n")).as("n_grams"))
        val uniqueOwned = withG
          .select(col("doc_id"), explode(col("_g")).as("gram"))
          .groupBy(col("gram"))
          .agg(count(lit(1)).as("_nd"), min(col("doc_id")).as("doc_id"))
          .filter(col("_nd") === 1)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_unique"))
        perDoc.join(uniqueOwned, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_unique"))
          // RAW double of one IEEE division — never rounded: a ratio of
          // two small integers lands on decimal half-boundaries where
          // engines' round() provably differ (the search_tfidf lesson),
          // while the division itself is bit-identical cross-engine
          .withColumn("novelty",
            col("n_unique").cast(DoubleType) / col("n_grams"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
             |  FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id, gram FROM (
             |    SELECT doc_id, unnest(
             |      CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |           ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                 for i in range(1, len(w) - 1)] END) AS gram
             |    FROM base)),
             |gc AS (SELECT gram, count(*) AS nd FROM grams GROUP BY 1)
             |SELECT g.doc_id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN gc.nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_unique,
             |  CAST(sum(CASE WHEN gc.nd = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*) AS novelty
             |FROM grams g JOIN gc ON gc.gram = g.gram
             |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin)),
  )
}

