package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Dedup family of the operator catalog (27 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogDedup {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // ---------------------------------------------------------------- dedup
    // Exact dedup with a deterministic winner (min doc_id per text).
    "dedup_exact" -> QuerySpec(
      (s, d) => DedupOps.exactDedup(t(s, d, "documents"), Seq("text"), "doc_id")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
      Some("""SELECT d.doc_id, d.lang, d.source FROM documents d
             |JOIN (SELECT text, MIN(doc_id) AS m FROM documents GROUP BY text) k
             |  ON d.doc_id = k.m
             |ORDER BY d.doc_id""".stripMargin)),


    // Prefix-truncation duplicates (DedupOps.prefixTruncationPairs) —
    // the crawl artifact BETWEEN exact and near dedup: a re-fetch cut
    // off mid-page hashes differently (exact misses it) and a 60%
    // truncation moves Jaccard a lot (shingling treats it as a
    // different doc). Candidates BLOCK on the first 64 characters (one
    // equi-join, the band-join shape — complete by definition of
    // prefix for short sides ≥ 64 chars, the documented bound), then
    // one substring equality confirms. The fixture plants truncated
    // twins at ⅔ length for every 5th long-enough doc; the oracle
    // replays planting, blocking, and confirmation — code-point string
    // semantics match on both engines (the length() contract).
    "dedup_prefix_truncation" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val planted = docs
          .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 130)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            col("text").substr(lit(1),
              expr("(length(text) * 2) div 3")).as("text"))
        DedupOps.prefixTruncationPairs(
          docs.unionByName(planted), "doc_id", "text", blockLen = 64)
          .orderBy(col("short_id"), col("long_id"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000000,
             |    substr(text, 1, (length(text) * 2) // 3)
             |  FROM documents
             |  WHERE doc_id % 5 = 0 AND length(text) >= 130),
             |b AS (
             |  SELECT doc_id, text, length(text) AS len,
             |    substr(text, 1, 64) AS blk
             |  FROM u WHERE text IS NOT NULL AND length(text) >= 64)
             |SELECT s.doc_id AS short_id, l.doc_id AS long_id,
             |  CAST(s.len AS INTEGER) AS short_len,
             |  CAST(l.len AS INTEGER) AS long_len
             |FROM b s JOIN b l ON s.blk = l.blk
             |  AND s.len < l.len AND s.text = substr(l.text, 1, s.len)
             |ORDER BY short_id, long_id""".stripMargin)),


    // MinHash-LSH candidate near-dups, reported as a per-doc candidate
    // count (left join keeps all docs ⇒ rows>0 even with no duplicates).
    // ORACLED since round 11 via the STAGED SIGNATURE TABLE: the xxhash64
    // signatures themselves are engine-specific, but once staged as
    // parquet the whole downstream pipeline — banding (bucket equality ≡
    // band-slice equality), the >707-doc degeneracy prune (the exact
    // doc form of the 250k pair budget), candidate distinct, signature-
    // agreement estimate, 0.5 threshold — is pure relational algebra
    // DuckDB replays. Planted-duplicate recall stays property-tested in
    // DedupSpec.
    "dedup_minhash" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.expressions.GraftFunctions.register(s)
        staged(d, "minhash_sigs") { dir =>
          docs.select(col("doc_id").as("id"),
            call_function("minhash_shingle_sig",
              split(lower(col("text")), "\\s+"), lit(64), lit(3)).as("sig"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pairs = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
          estThreshold = 0.5)
        val cnts = pairs.select(col("id_a").as("doc_id"))
          .union(pairs.select(col("id_b").as("doc_id")))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cand"))
        docs.select(col("doc_id")).join(cnts, Seq("doc_id"), "left")
          .na.fill(0, Seq("n_cand"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH sigs AS (
             |  SELECT id, sig FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/minhash_sigs/*.parquet')),
             |banded AS (
             |  SELECT id, b, sig[b*4+1 : b*4+4] AS band
             |  FROM sigs CROSS JOIN (SELECT unnest([${(0 until 16).mkString(",")}]) AS b)),
             |ok_buckets AS (
             |  SELECT b, band FROM banded GROUP BY b, band HAVING COUNT(*) <= 707),
             |pruned AS (
             |  SELECT bd.id, bd.b, bd.band FROM banded bd
             |  JOIN ok_buckets ob ON ob.b = bd.b AND ob.band = bd.band),
             |cand AS (
             |  SELECT DISTINCT a.id AS id_a, b2.id AS id_b
             |  FROM pruned a JOIN pruned b2
             |    ON a.b = b2.b AND a.band = b2.band AND a.id < b2.id),
             |est AS (
             |  SELECT id_a, id_b,
             |    CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS DOUBLE) / 64 AS est
             |  FROM (SELECT p.id_a, p.id_b, unnest(sa.sig) AS xa, unnest(sb.sig) AS xb
             |        FROM cand p
             |        JOIN sigs sa ON sa.id = p.id_a
             |        JOIN sigs sb ON sb.id = p.id_b)
             |  GROUP BY id_a, id_b),
             |pairs AS (SELECT id_a, id_b FROM est WHERE est >= 0.5),
             |cnt AS (
             |  SELECT doc_id, COUNT(*) AS n_cand FROM (
             |    SELECT id_a AS doc_id FROM pairs
             |    UNION ALL SELECT id_b FROM pairs)
             |  GROUP BY doc_id)
             |SELECT d.doc_id, CAST(COALESCE(c.n_cand, 0) AS BIGINT) AS n_cand
             |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),


    // Estimator check for the minhash tier: plant near-duplicates derived
    // from the corpus itself (every 5th doc re-appears with its first two
    // tokens dropped), run the LSH candidate pass, join each candidate
    // pair back to its EXACT shingle-set Jaccard, and report the error.
    // ORACLED since round 11 (the dedup_minhash staged-signature pattern
    // applied to the DERIVED corpus): with the planted corpus's
    // signatures staged, DuckDB replays banding, the 0.4 threshold, the
    // exact shingle Jaccard AND the error statistics. Error sums ride a
    // DECIMAL(20,12) accumulator — per-pair errors are identical doubles
    // in both engines (est = k/64 exact, jaccard one division), and the
    // decimal sum removes the only remaining order sensitivity — so the
    // mean is presented UNROUNDED (round()-of-double half-boundaries are
    // the known cross-engine hazard).
    // CHECKED bound riding the row (the agg_cms_checked pattern): a
    // 64-hash signature estimates Jaccard with std error 1/√64 = 0.125;
    // the fixture must surface pairs AND keep the mean abs error within
    // one std error (measured 0.02-0.05 across SFs — 2-4× margin).
    "dedup_minhash_vs_exact" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        // a quarter of the corpus: the error statistic converges with a
        // few hundred pairs — the full-corpus pass is the (already
        // benched) dedup_minhash key's job, not this check's
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 4 === 0)
        // slice length = size(toks): an Int.MaxValue literal length is
        // correct under codegen but overflows start+length in interpreted
        // eval (returns EMPTY), silently degrading the fixture under any
        // codegen fallback — so use a length that cannot overflow.
        val dropToks = split(col("text"), "\\s+")
        val variants = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat_ws(" ", slice(dropToks, lit(3), size(dropToks)))
              .as("text"))
        val corpus = docs.unionByName(variants)
        staged(d, "minhash_sigs_vsx") { dir =>
          corpus.select(col("doc_id").as("id"),
            call_function("minhash_shingle_sig",
              split(lower(col("text")), "\\s+"), lit(64), lit(3)).as("sig"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pairs = DedupOps.minhashCandidatePairs(corpus, "doc_id", "text",
          estThreshold = 0.4)
        val err = abs(col("est_jaccard") - col("jaccard"))
        DedupOps.exactJaccardForPairs(pairs, corpus, "doc_id", "text")
          .agg(count(lit(1)).as("n_pairs"),
            sum(err.cast(DecimalType(20, 12))).as("__se"),
            max(err).as("max_abs_err"))
          .select(col("n_pairs"),
            (col("__se").cast(DoubleType) / col("n_pairs"))
              .as("mean_abs_err"),
            col("max_abs_err"))
          .withColumn("bound_ok",
            (col("n_pairs") > 0 && col("mean_abs_err") <= 0.125)
              .cast(IntegerType))
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |    array_to_string(string_split_regex(text, '\\s+')[3:], ' ')
             |  FROM documents WHERE doc_id % 4 = 0 AND doc_id % 5 = 0),
             |sigs AS (
             |  SELECT id, sig FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/minhash_sigs_vsx/*.parquet')),
             |banded AS (
             |  SELECT id, b, sig[b*4+1 : b*4+4] AS band
             |  FROM sigs CROSS JOIN (SELECT unnest([${(0 until 16).mkString(",")}]) AS b)),
             |ok_buckets AS (
             |  SELECT b, band FROM banded GROUP BY b, band HAVING COUNT(*) <= 707),
             |pruned AS (
             |  SELECT bd.id, bd.b, bd.band FROM banded bd
             |  JOIN ok_buckets ob ON ob.b = bd.b AND ob.band = bd.band),
             |cand AS (
             |  SELECT DISTINCT a.id AS id_a, b2.id AS id_b
             |  FROM pruned a JOIN pruned b2
             |    ON a.b = b2.b AND a.band = b2.band AND a.id < b2.id),
             |est AS (
             |  SELECT id_a, id_b,
             |    CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS DOUBLE) / 64 AS est
             |  FROM (SELECT p.id_a, p.id_b, unnest(sa.sig) AS xa, unnest(sb.sig) AS xb
             |        FROM cand p
             |        JOIN sigs sa ON sa.id = p.id_a
             |        JOIN sigs sb ON sb.id = p.id_b)
             |  GROUP BY id_a, id_b),
             |pairs AS (SELECT id_a, id_b, est FROM est WHERE est >= 0.4),
             |toks AS (
             |  SELECT doc_id AS id, string_split_regex(lower(text), '\\s+') AS w
             |  FROM corpus),
             |sh AS (
             |  SELECT id, unnest(list_distinct(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |    ELSE [array_to_string(w[i:i+2], ' ')
             |          for i in range(1, len(w) - 1)] END)) AS tok
             |  FROM toks),
             |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
             |inter AS (
             |  SELECT p.id_a, p.id_b, count(*) AS ni
             |  FROM pairs p
             |  JOIN sh a ON a.id = p.id_a
             |  JOIN sh b ON b.id = p.id_b AND b.tok = a.tok
             |  GROUP BY p.id_a, p.id_b),
             |scored AS (
             |  SELECT p.est, CAST(COALESCE(i.ni, 0) AS DOUBLE)
             |      / (sa.n + sb.n - COALESCE(i.ni, 0)) AS jac
             |  FROM pairs p
             |  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
             |  JOIN sizes sa ON sa.id = p.id_a
             |  JOIN sizes sb ON sb.id = p.id_b)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |  CAST(SUM(CAST(abs(est - jac) AS DECIMAL(20,12))) AS DOUBLE)
             |    / COUNT(*) AS mean_abs_err,
             |  MAX(abs(est - jac)) AS max_abs_err,
             |  CAST(COUNT(*) > 0 AND
             |    CAST(SUM(CAST(abs(est - jac) AS DECIMAL(20,12))) AS DOUBLE)
             |      / COUNT(*) <= 0.125 AS INTEGER) AS bound_ok
             |FROM scored""".stripMargin)),


    // SimHash near-dups (hamming ≤ 3 via 16-bit chunk LSH); same per-doc
    // count shape. ORACLED since round 11 via the staged signature
    // table (the dedup_minhash pattern): with the packed 64-bit sigs on
    // disk, chunk bucketing ((sig >> 16·ci) & 0xFFFF — the mask makes
    // arithmetic and logical shift agree), pair distinct and the
    // bit_count(xor) ≤ 3 verify are all engine-portable.
    "dedup_simhash" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.expressions.GraftFunctions.register(s)
        staged(d, "simhash_sigs") { dir =>
          docs.select(col("doc_id").as("id"),
            call_function("simhash_sig",
              split(lower(col("text")), "\\s+")).as("sig"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pairs = DedupOps.simhashDupPairs(docs, "doc_id", "text")
        val cnts = pairs.select(col("id_a").as("doc_id"))
          .union(pairs.select(col("id_b").as("doc_id")))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
        docs.select(col("doc_id")).join(cnts, Seq("doc_id"), "left")
          .na.fill(0, Seq("n_dup"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH sigs AS (
             |  SELECT id, sig FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/simhash_sigs/*.parquet')),
             |chunked AS (
             |  SELECT id, sig, ci, (sig >> (ci*16)) & 65535 AS chunk
             |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS ci)),
             |cand AS (
             |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |    a.sig AS sig_a, b.sig AS sig_b
             |  FROM chunked a JOIN chunked b
             |    ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM cand
             |  WHERE bit_count(xor(sig_a, sig_b)) <= 3),
             |cnt AS (
             |  SELECT doc_id, COUNT(*) AS n_dup FROM (
             |    SELECT id_a AS doc_id FROM pairs
             |    UNION ALL SELECT id_b FROM pairs)
             |  GROUP BY doc_id)
             |SELECT d.doc_id, CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup
             |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),


    // SimHash → CHECKED estimator (the dedup_minhash_vs_exact pattern
    // for the last unchecked sketch): the hamming≤3 near-dup pair set
    // joins back to EXACT shingle Jaccard, side by side with a
    // deterministic offset-pair baseline (doc d vs d+40 — unrelated
    // docs from the same corpus). The property the sketch exists for —
    // near pairs score far above background — is measured IN-query:
    // `separated` = near-pair mean Jaccard > baseline mean + 0.2, both
    // rows carry it. Planted variants are token ROTATIONS (first 3
    // tokens moved to the end): SimHash is order-invariant over the
    // token multiset, so a rotation has hamming 0 — guaranteed in the
    // near set — while its 3-gram shingle set differs at the ~6
    // boundary shingles (Jaccard ≈ 0.7, not 1). Token-DROP variants
    // (the minhash fixture) would not do here: on ~40-token docs a
    // single edit flips many of the 64 sign-sum bits, so hamming ≤ 3
    // catches them only by luck. Signature is xxhash64-based ⇒
    // rows-only tier; `separated` is also unit-asserted (DedupSpec).
    // ORACLED since round 11 (the dedup_minhash_vs_exact pattern): the
    // rotated corpus's packed signatures are staged, so DuckDB replays
    // chunk LSH + hamming ≤ 3, the offset baseline, the exact shingle
    // Jaccard and the separation/bound flags. Jaccard means ride a
    // DECIMAL(20,12) accumulator and present UNROUNDED (the round()-of-
    // double half-boundary hazard), mins are raw identical doubles.
    "dedup_simhash_vs_exact" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val docs0 = t(s, d, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 4 === 0)
        val toks = split(col("text"), "\\s+")
        val variants = docs0.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            // size(toks) length, not Int.MaxValue: see dedup_minhash_vs_exact
            array_join(concat(slice(toks, lit(4), size(toks)), slice(toks, 1, 3)), " ")
              .as("text"))
        val corpus = docs0.unionByName(variants)
        staged(d, "simhash_sigs_vsx") { dir =>
          corpus.select(col("doc_id").as("id"),
            call_function("simhash_sig",
              split(lower(col("text")), "\\s+")).as("sig"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val near = DedupOps.simhashDupPairs(corpus, "doc_id", "text")
          .select(col("id_a"), col("id_b"), lit("simhash_near").as("bucket"))
        val baseline = docs0.select(col("doc_id").as("id_a"),
            (col("doc_id") + 40L).as("id_b"))
          .join(docs0.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
          .select(col("id_a"), col("id_b"), lit("offset_baseline").as("bucket"))
        val scored = DedupOps.exactJaccardForPairs(
          near.unionByName(baseline), corpus, "doc_id", "text")
        val w = Window.partitionBy()
        scored.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("jaccard").cast(DecimalType(20, 12))).as("__sj"),
            min(col("jaccard")).as("min_jaccard"))
          .select(col("bucket"), col("n_pairs"),
            (col("__sj").cast(DoubleType) / col("n_pairs"))
              .as("mean_jaccard"),
            col("min_jaccard"))
          .withColumn("separated",
            (max(when(col("bucket") === "simhash_near", col("mean_jaccard"))).over(w) >
              max(when(col("bucket") === "offset_baseline", col("mean_jaccard"))).over(w)
                + 0.2).cast(IntegerType))
          // CHECKED bound: separation must hold AND both buckets must be
          // non-degenerate (every planted rotation is hamming-0 ⇒ the
          // near bucket can never be empty; an empty baseline would make
          // `separated` vacuous)
          .withColumn("bound_ok",
            (col("separated") === 1 &&
              min(col("n_pairs")).over(w) > 0).cast(IntegerType))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |    array_to_string(
             |      string_split_regex(text, '\\s+')[4:] ||
             |      string_split_regex(text, '\\s+')[1:3], ' ')
             |  FROM documents WHERE doc_id % 4 = 0 AND doc_id % 5 = 0),
             |sigs AS (
             |  SELECT id, sig FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/simhash_sigs_vsx/*.parquet')),
             |chunked AS (
             |  SELECT id, sig, ci, (sig >> (ci*16)) & 65535 AS chunk
             |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS ci)),
             |near AS (
             |  SELECT id_a, id_b, 'simhash_near' AS bucket FROM (
             |    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |      a.sig AS sig_a, b.sig AS sig_b
             |    FROM chunked a JOIN chunked b
             |      ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id)
             |  WHERE bit_count(xor(sig_a, sig_b)) <= 3),
             |baseline AS (
             |  SELECT a.doc_id AS id_a, a.doc_id + 40 AS id_b,
             |    'offset_baseline' AS bucket
             |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 40
             |  WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 = 0),
             |allp AS (SELECT * FROM near UNION ALL SELECT * FROM baseline),
             |toks AS (
             |  SELECT doc_id AS id, string_split_regex(lower(text), '\\s+') AS w
             |  FROM corpus),
             |sh AS (
             |  SELECT id, unnest(list_distinct(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |    ELSE [array_to_string(w[i:i+2], ' ')
             |          for i in range(1, len(w) - 1)] END)) AS tok
             |  FROM toks),
             |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
             |inter AS (
             |  SELECT p.id_a, p.id_b, count(*) AS ni
             |  FROM allp p
             |  JOIN sh a ON a.id = p.id_a
             |  JOIN sh b ON b.id = p.id_b AND b.tok = a.tok
             |  GROUP BY p.id_a, p.id_b),
             |scored AS (
             |  SELECT p.bucket, CAST(COALESCE(i.ni, 0) AS DOUBLE)
             |      / (sa.n + sb.n - COALESCE(i.ni, 0)) AS jac
             |  FROM allp p
             |  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
             |  JOIN sizes sa ON sa.id = p.id_a
             |  JOIN sizes sb ON sb.id = p.id_b),
             |by_bucket AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |    CAST(SUM(CAST(jac AS DECIMAL(20,12))) AS DOUBLE)
             |      / COUNT(*) AS mean_jaccard,
             |    MIN(jac) AS min_jaccard
             |  FROM scored GROUP BY bucket),
             |flags AS (
             |  SELECT
             |    CAST(MAX(CASE WHEN bucket = 'simhash_near'
             |          THEN mean_jaccard END) >
             |         MAX(CASE WHEN bucket = 'offset_baseline'
             |          THEN mean_jaccard END) + 0.2 AS INTEGER) AS separated,
             |    CAST(MAX(CASE WHEN bucket = 'simhash_near'
             |          THEN mean_jaccard END) >
             |         MAX(CASE WHEN bucket = 'offset_baseline'
             |          THEN mean_jaccard END) + 0.2
             |      AND MIN(n_pairs) > 0 AS INTEGER) AS bound_ok
             |  FROM by_bucket)
             |SELECT b.bucket, b.n_pairs, b.mean_jaccard, b.min_jaccard,
             |  f.separated, f.bound_ok
             |FROM by_bucket b CROSS JOIN flags f
             |ORDER BY b.bucket""".stripMargin)),


    // Near-dup CLUSTERING: connected components over the exact bigram-
    // shingle Jaccard pair graph (bigrams: the synthetic corpus is
    // near-uniform in unigram space — every pair clears any unigram
    // threshold — while 3-gram shingles isolate only the planted dups;
    // bigrams at 0.3 yield ~24 multi-doc clusters including transitive
    // 3-chains, so the fixpoint is actually exercised). Iterative
    // min-label propagation on the engine side; the oracle states the
    // same fixpoint as DuckDB recursive-CTE reachability (min reachable
    // id = cluster id) — an independent formulation, so agreement
    // checks the algorithm, not the implementation.
    "dedup_cluster_cc" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 0.3, shingleN = 2)
          .select(col("id_a"), col("id_b"))
        DedupOps.connectedComponents(
          docs.select(col("doc_id")), pairs, "doc_id", "id_a", "id_b")
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 500),
             |toks AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS tok
             |  FROM base),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l)
             |SELECT id AS doc_id, min(l) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),


    // Same clusters via the alternating large-star/small-star algorithm
    // (the O(log n)-round chain-graph path) — two independent engine
    // implementations against ONE independent oracle formulation.
    "dedup_cluster_cc_largestar" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 0.3, shingleN = 2)
          .select(col("id_a"), col("id_b"))
        DedupOps.connectedComponentsLargeStar(
          docs.select(col("doc_id")), pairs, "doc_id", "id_a", "id_b")
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 500),
             |toks AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS tok
             |  FROM base),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l)
             |SELECT id AS doc_id, min(l) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),


    // Long-diameter CC: 25-node CHAIN components over the full doc_id
    // domain (edge i→i+1 except at chain ends). Diameter 24 forced ~24
    // min-label rounds before r17's pointer-doubling step (now ~6 —
    // the per-round localCheckpoint + release seam still exercised on
    // a scale-proportional graph; near-clique fixtures converge in 3). The
    // closed form cluster_id = doc_id − (doc_id mod 25) is an
    // INDEPENDENT derivation of the same fixpoint ⇒ fully oracled.
    "dedup_cluster_cc_chain" -> QuerySpec(
      (s, d) => {
        val ids = t(s, d, "documents").select(col("doc_id"))
        val pairs = ids.filter(col("doc_id") % 25 =!= 24)
          .join(ids.select(col("doc_id").as("id_b")),
            col("id_b") === col("doc_id") + 1)
          .select(col("doc_id").as("id_a"), col("id_b"))
        DedupOps.connectedComponents(
          ids, pairs, "doc_id", "id_a", "id_b", maxIterations = 30)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(doc_id - (doc_id % 25) AS BIGINT) AS cluster_id
             |FROM documents ORDER BY doc_id""".stripMargin)),


    // END-TO-END fuzzy dedup: minhash LSH candidates → exact-Jaccard
    // confirm → connected components → min-id survivor per cluster →
    // corpus minus losers, as ONE key — the operation an LLM-data user
    // actually runs; the pieces above each verify separately, this
    // verifies their composition. Fully ORACLED: at bands = numHashes
    // (one hash per band) LSH misses a j ≥ 0.3 pair with p ≤ (0.7)^64
    // ≈ 1e-10, so the composed result equals the exact enumeration the
    // recursive-CTE oracle computes (reachability over exact-Jaccard
    // pairs, survivor = min id per component). The default normalize
    // seam (NFKC + casefold + collapse on SIGNATURE text) is identity
    // on this ASCII single-spaced fixture, so the lower(text) oracle
    // stays exact; the Unicode-variant behavior is pinned by the
    // DedupSpec NFKC/NBSP test instead.
    "dedup_fuzzy_e2e" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        DedupOps.fuzzyDedupE2E(docs, "doc_id", "text",
          threshold = 0.3, numHashes = 64, bands = 64, shingleN = 2)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 500),
             |toks AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS tok
             |  FROM base),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l),
             |clusters AS (SELECT id, min(l) AS cluster_id FROM reach GROUP BY id)
             |SELECT d.doc_id, d.lang FROM documents d
             |JOIN clusters c ON c.id = d.doc_id AND c.id = c.cluster_id
             |WHERE d.doc_id < 500
             |ORDER BY d.doc_id""".stripMargin)),


    // Duplicated-span statistics (the exact-substring-dedup signal, Lee
    // et al. 2022): per-doc fraction of 5-gram instances occurring more
    // than once corpus-wide. Pure count arithmetic + one IEEE division
    // ⇒ fully ORACLED.
    "dedup_span_stats" -> QuerySpec(
      (s, d) => DedupOps.duplicateSpanStats(
        t(s, d, "documents"), "doc_id", "text", shingleN = 5)
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |grams AS (
             |  SELECT doc_id, unnest(CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
             |    ELSE [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)] END) AS g
             |  FROM base),
             |counts AS (SELECT g, count(*) AS n FROM grams GROUP BY g)
             |SELECT doc_id, count(*) AS n_grams,
             |  CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |  CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
             |FROM grams JOIN counts c USING (g)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),


    // Exact-substring span REMOVAL (the acting half of dedup_span_stats):
    // drop every token covered by a >1-occurrence 5-gram instance,
    // rebuild docs from surviving tokens, drop docs that lose everything.
    // Instance-level removal (no canonical survivor — that contract is
    // dedup_paragraph's). Deterministic token coverage ⇒ fully ORACLED
    // including the rebuilt text; the oracle zips gram positions via
    // DuckDB's parallel unnest and replays the same coverage rule with
    // an indexed list_filter.
    "dedup_span_removal" -> QuerySpec(
      (s, d) => DedupOps.removeDuplicateSpans(
        t(s, d, "documents"), "doc_id", "text", shingleN = 5)
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |grams AS (
             |  SELECT doc_id,
             |    unnest(CASE WHEN len(w) < 5 THEN [0]
             |      ELSE [i - 1 for i in range(1, len(w) - 3)] END) AS p,
             |    unnest(CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
             |      ELSE [array_to_string(w[i:i+4], ' ') for i in range(1, len(w) - 3)] END) AS g
             |  FROM base),
             |counts AS (SELECT g, count(*) AS n FROM grams GROUP BY g),
             |dup AS (
             |  SELECT doc_id, list(p) AS ps FROM grams
             |  JOIN counts USING (g) WHERE n > 1 GROUP BY doc_id),
             |rebuilt AS (
             |  SELECT b.doc_id,
             |    list_filter(w, (t, j) -> NOT len(list_filter(
             |      coalesce(ps, []), p -> j - 1 >= p AND j - 1 <= p + 4)) > 0) AS kept,
             |    len(w) AS n_tokens
             |  FROM base b LEFT JOIN dup USING (doc_id))
             |SELECT doc_id, array_to_string(kept, ' ') AS text_clean,
             |  CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(n_tokens - len(kept) AS BIGINT) AS n_removed
             |FROM rebuilt WHERE len(kept) > 0
             |ORDER BY doc_id""".stripMargin)),


    // Segment-level exact dedup with reconstruction (the paragraph-dedup
    // pass of CCNet/RefinedWeb, fixed 10-token segments): every segment
    // keeps its lexicographically-first (doc, idx) occurrence, docs are
    // rebuilt from survivors. Keep-first is deterministic ⇒ fully
    // ORACLED, including the reconstructed text. 4 all-boilerplate docs
    // vanish at sf0.01; 53 get trimmed.
    "dedup_paragraph" -> QuerySpec(
      (s, d) => DedupOps.segmentDedup(
        t(s, d, "documents"), "doc_id", "text", segTokens = 10)
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |segs AS (
             |  SELECT doc_id, CAST(u.i AS INTEGER) AS seg_idx,
             |    array_to_string(w[(u.i*10+1):(u.i*10+10)], ' ') AS seg
             |  FROM base, UNNEST(range(0, CAST(ceil(len(w)/10.0) AS BIGINT))) AS u(i)),
             |canon AS (
             |  SELECT doc_id, seg_idx, seg,
             |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
             |  FROM segs),
             |rec AS (
             |  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup,
             |    count(*) AS n_kept
             |  FROM canon WHERE rn = 1 GROUP BY doc_id),
             |tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
             |SELECT r.doc_id, r.text_dedup, t.n_segs, r.n_kept
             |FROM rec r JOIN tot t USING (doc_id) ORDER BY r.doc_id""".stripMargin)),


    // Cross-document LINE-FREQUENCY boilerplate removal (round 13, the
    // RefinedWeb/CCNet chrome pass): a trimmed line in ≥ 50 DISTINCT
    // docs is removed from EVERY doc — the semantics keep-first segment
    // dedup (dedup_paragraph keeps the first copy) and within-doc line
    // dedup (one copy per doc is no repeat) cannot express. Fixture
    // plants the three regimes: a universal footer (500 docs →
    // removed), a 1-in-3 banner (~167 → removed), a 1-in-97 promo line
    // (6 → KEPT, below threshold); content lines are per-doc token
    // slices, far under threshold. One count-distinct on the trimmed
    // line, an unhinted anti join (boiler set ≤ lines/minDocs), one
    // rebuild groupBy — fully oracled including reconstructed text.
    "dedup_line_frequency" -> QuerySpec(
      (s, d) => {
        val toksB = split(col("text"), " ")
        val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => array_join(slice(toksB, i * 8 + 1, lit(8)), " ")), "\n"),
            when(col("doc_id") % 3 === 0,
              lit("\nsubscribe to our newsletter")).otherwise(lit("")),
            when(col("doc_id") % 97 === 0,
              lit("\nlimited promo code 7")).otherwise(lit("")),
            lit("\nall rights reserved")).as("text"))
        DedupOps.lineFrequencyFilter(built, "doc_id", "text", minDocs = 50)
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
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ')), chr(10))
             |    || CASE WHEN doc_id % 3 = 0
             |            THEN chr(10) || 'subscribe to our newsletter'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 97 = 0
             |            THEN chr(10) || 'limited promo code 7' ELSE '' END
             |    || chr(10) || 'all rights reserved' AS text
             |  FROM base),
             |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM built),
             |lines AS (
             |  SELECT doc_id, unnest(l) AS line,
             |         unnest(range(len(l))) AS pos
             |  FROM ls),
             |boiler AS (
             |  SELECT trim(line) AS norm FROM lines WHERE trim(line) <> ''
             |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 50),
             |kept AS (
             |  SELECT doc_id, pos, line FROM lines
             |  WHERE trim(line) = ''
             |     OR trim(line) NOT IN (SELECT norm FROM boiler)),
             |agg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_kept,
             |    string_agg(line, chr(10) ORDER BY pos) AS clean_text
             |  FROM kept GROUP BY doc_id)
             |SELECT l.doc_id, CAST(len(l.l) AS BIGINT) AS n_lines,
             |  coalesce(a.n_lines_kept, CAST(0 AS BIGINT)) AS n_lines_kept,
             |  coalesce(a.clean_text, '') AS clean_text
             |FROM ls l LEFT JOIN agg a USING (doc_id)
             |ORDER BY l.doc_id""".stripMargin)),


    // SemDeDup (Abbas et al. 2023): embedding near-dup removal with the
    // quadratic stage confined to cluster cells (the label column here;
    // ivfCell/lshBucket in production). Quantized cosine + min-id
    // survivor ⇒ the full pipeline is engine-exact and ORACLED via
    // recursive-CTE reachability over within-cell edges (113 edges,
    // 389/500 survivors at sf0.01).
    "dedup_semdedup" -> QuerySpec(
      (s, d) => SimilarityOps.semDedup(
        t(s, d, "embeddings"), "vec_id", "embedding", "label",
        threshold = 0.3)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id")),
      Some("""WITH RECURSIVE pairs AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    CAST(FLOOR(CAST(unnest(a.embedding) AS DOUBLE)*1000) AS BIGINT) AS va,
             |    CAST(FLOOR(CAST(unnest(b.embedding) AS DOUBLE)*1000) AS BIGINT) AS vb
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id < b.vec_id),
             |dots AS (
             |  SELECT id_a, id_b, SUM(va*vb) AS dot, SUM(va*va) AS na, SUM(vb*vb) AS nb
             |  FROM pairs GROUP BY id_a, id_b),
             |e0 AS (SELECT id_a, id_b FROM dots
             |  WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) > 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM e0
             |          UNION ALL SELECT id_b, id_a FROM e0),
             |reach(id, l) AS (
             |  SELECT vec_id, vec_id FROM embeddings
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l),
             |clusters AS (SELECT id, min(l) AS cluster_id FROM reach GROUP BY id)
             |SELECT e.vec_id, e.label FROM embeddings e
             |JOIN clusters c ON c.id = e.vec_id AND c.id = c.cluster_id
             |ORDER BY e.vec_id""".stripMargin)),


    // Exact token-set Jaccard near-dups on a bounded id range — fully
    // SQL-expressible (integer set sizes, one IEEE division).
    "dedup_ngram_jaccard" -> QuerySpec(
      (s, d) => DedupOps.ngramJaccardPairs(
        t(s, d, "documents").filter(col("doc_id") < 40), "doc_id", "text", 0.5)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (
             |  SELECT doc_id AS id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
             |  FROM documents WHERE doc_id < 40),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id)
             |SELECT id_a, id_b,
             |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
             |FROM inter
             |JOIN sizes sa ON sa.id = id_a
             |JOIN sizes sb ON sb.id = id_b
             |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),


    // Embedding-cosine near-dups on quantized integers — engine-exact.
    // allPairs is safe here ONLY because the input is explicitly bounded
    // to 100 vectors (the oracle needs the exact O(N²) enumeration); the
    // production-shaped variant is dedup_embedding_cosine_lsh below.
    "dedup_embedding_cosine" -> QuerySpec(
      (s, d) => SimilarityOps.cosineDupPairs(
        t(s, d, "embeddings").filter(col("vec_id") < 100),
        "vec_id", "embedding", threshold = 0.30, allPairs = true)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH pairs AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    CAST(FLOOR(CAST(unnest(a.embedding) AS DOUBLE)*1000) AS BIGINT) AS va,
             |    CAST(FLOOR(CAST(unnest(b.embedding) AS DOUBLE)*1000) AS BIGINT) AS vb
             |  FROM embeddings a, embeddings b
             |  WHERE a.vec_id < 100 AND b.vec_id < 100 AND a.vec_id < b.vec_id),
             |dots AS (
             |  SELECT id_a, id_b, SUM(va*vb) AS dot, SUM(va*va) AS na, SUM(vb*vb) AS nb
             |  FROM pairs GROUP BY id_a, id_b)
             |SELECT id_a, id_b,
             |  CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos_q
             |FROM dots
             |WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) > 0.30
             |ORDER BY id_a, id_b""".stripMargin),
      allowBnlj = true),


    // LSH-bucketed embedding dedup at FULL scale factor (no id bound):
    // the production path — pairs meet only inside a hyperplane bucket.
    // Bucket assignment is float-order-sensitive ⇒ rows-only, but the
    // estimator is CHECKED in-query (the dedup_minhash_vs_exact
    // pattern): every 10th vector re-enters the corpus perturbed in one
    // component (cos ≈ 0.999 to its source — the near-dup the bucketing
    // exists to catch), the bucketed pass runs at threshold 0.95, and
    // the recovered fraction of planted twins rides every row as
    // `recall` with `recall_floor`/`above_floor=1` asserting the
    // bound. A perturbed twin is a DIFFERENT vector that must still
    // land in its source's bucket on all 8 hyperplanes — unlike an
    // exact copy (which collides by construction), this measures real
    // LSH recall on near-identical pairs. Per-vector count via left
    // join keeps all rows (rows > 0 even with no duplicates).
    // ORACLED since round 11 via the STAGED 8-bit PLANES artifact (the
    // sim_ann_lsh pattern): quantized-plane buckets + the already-exact
    // quantized cosine make the pair set, the per-vec counts AND the
    // planted-twin recall check bit-portable — DuckDB replays both
    // cosineDupPairs passes (threshold 0.30 corpus scan; threshold 0.95
    // twin recovery) over the same staged planes.
    "dedup_embedding_cosine_lsh" -> QuerySpec(
      (s, d) => {
        val embT = t(s, d, "embeddings")
        staged(d, "lsh_planes_8") { dir =>
          import s.implicits._
          SimilarityOps.quantizedPlanes(nBits = 8, dim = 64).zipWithIndex
            .map { case (p, i) => (i, p.toSeq) }.toSeq
            .toDF("bit", "plane")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pairs = SimilarityOps.cosineDupPairs(embT, "vec_id", "embedding",
          threshold = 0.30, quantizedBuckets = true)
        val cnts = pairs.select(col("id_a").as("vec_id"))
          .union(pairs.select(col("id_b").as("vec_id")))
          .groupBy(col("vec_id")).agg(count(lit(1)).as("n_dup"))
        val perVec = embT.select(col("vec_id"))
          .join(cnts, Seq("vec_id"), "left")
          .na.fill(0, Seq("n_dup"))
        val asD = embT.select(col("vec_id"),
          transform(col("embedding"), x => x.cast(DoubleType))
            .as("embedding"))
        // planted twin id = -(source id) - 1: negative ids CANNOT
        // collide with real vec_ids (non-negative) at ANY table size —
        // an additive offset would alias once the table outgrows it.
        // Pair ordering puts the negative planted id in id_a, so the
        // recovery filter is id_a = -(id_b) - 1.
        val planted = asD.filter(col("vec_id") % 10 === 0)
          .select((-col("vec_id") - 1L).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + when(i === 0, lit(0.05)).otherwise(lit(0.0)))
              .as("embedding"))
        val recovered = SimilarityOps.cosineDupPairs(
            asD.unionByName(planted), "vec_id", "embedding",
            threshold = 0.95, quantizedBuckets = true)
          .filter(col("id_a") === -col("id_b") - 1L)
          .agg(count(lit(1)).as("n_recovered"))
        val summary = recovered
          .crossJoin(asD.filter(col("vec_id") % 10 === 0)
            .agg(count(lit(1)).as("n_planted")))
          .select(col("n_recovered"), col("n_planted"),
            round(col("n_recovered").cast(DoubleType) / col("n_planted"), 4)
              .as("recall"),
            lit(0.7).as("recall_floor"))
          .withColumn("above_floor",
            (col("recall") >= col("recall_floor")).cast(IntegerType))
        perVec.crossJoin(broadcast(summary)).orderBy(col("vec_id"))
      },
      Some("""WITH planes AS (
             |  SELECT bit, plane FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/lsh_planes_8/*.parquet')),
             |qv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
             |  FROM embeddings),
             |buck AS (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN d >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket
             |  FROM (
             |    SELECT vec_id, bit, SUM(xv*pv) AS d
             |    FROM (SELECT q.vec_id, p.bit, unnest(q.v) AS xv, unnest(p.plane) AS pv
             |          FROM qv q CROSS JOIN planes p)
             |    GROUP BY vec_id, bit)
             |  GROUP BY vec_id),
             |p30 AS (
             |  SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(SUM(xa*xb) AS DOUBLE)
             |      / (sqrt(CAST(SUM(xa*xa) AS DOUBLE)) * sqrt(CAST(SUM(xb*xb) AS DOUBLE))) AS cos_q
             |    FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |            unnest(va.v) AS xa, unnest(vb.v) AS xb
             |          FROM buck a
             |          JOIN buck b ON b.bucket = a.bucket AND a.vec_id < b.vec_id
             |          JOIN qv va ON va.vec_id = a.vec_id
             |          JOIN qv vb ON vb.vec_id = b.vec_id)
             |    GROUP BY id_a, id_b)
             |  WHERE cos_q > 0.30),
             |cnt AS (
             |  SELECT vec_id, COUNT(*) AS n_dup FROM (
             |    SELECT id_a AS vec_id FROM p30
             |    UNION ALL SELECT id_b FROM p30)
             |  GROUP BY vec_id),
             |twins AS (
             |  SELECT vec_id, v FROM qv
             |  UNION ALL
             |  SELECT -vec_id - 1 AS vec_id,
             |    [CAST(floor((CAST(embedding[1] AS DOUBLE) + 0.05) * 1000) AS BIGINT)]
             |      || list_transform(embedding[2:64],
             |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
             |  FROM embeddings WHERE vec_id % 10 = 0),
             |tbuck AS (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN d >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket
             |  FROM (
             |    SELECT vec_id, bit, SUM(xv*pv) AS d
             |    FROM (SELECT q.vec_id, p.bit, unnest(q.v) AS xv, unnest(p.plane) AS pv
             |          FROM twins q CROSS JOIN planes p)
             |    GROUP BY vec_id, bit)
             |  GROUP BY vec_id),
             |p95 AS (
             |  SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(SUM(xa*xb) AS DOUBLE)
             |      / (sqrt(CAST(SUM(xa*xa) AS DOUBLE)) * sqrt(CAST(SUM(xb*xb) AS DOUBLE))) AS cos_q
             |    FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |            unnest(va.v) AS xa, unnest(vb.v) AS xb
             |          FROM tbuck a
             |          JOIN tbuck b ON b.bucket = a.bucket AND a.vec_id < b.vec_id
             |          JOIN twins va ON va.vec_id = a.vec_id
             |          JOIN twins vb ON vb.vec_id = b.vec_id)
             |    GROUP BY id_a, id_b)
             |  WHERE cos_q > 0.95),
             |summary AS (
             |  SELECT r.n_recovered, p.n_planted,
             |    round(CAST(r.n_recovered AS DOUBLE) / p.n_planted, 4) AS recall,
             |    CAST(0.7 AS DOUBLE) AS recall_floor,
             |    CAST(round(CAST(r.n_recovered AS DOUBLE) / p.n_planted, 4)
             |      >= 0.7 AS INTEGER) AS above_floor
             |  FROM (SELECT COUNT(*) AS n_recovered FROM p95
             |        WHERE id_a = -id_b - 1) r
             |  CROSS JOIN (SELECT COUNT(*) AS n_planted FROM embeddings
             |              WHERE vec_id % 10 = 0) p)
             |SELECT e.vec_id, CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup,
             |  s.n_recovered, s.n_planted, s.recall, s.recall_floor, s.above_floor
             |FROM embeddings e
             |LEFT JOIN cnt c ON c.vec_id = e.vec_id
             |CROSS JOIN summary s
             |ORDER BY e.vec_id""".stripMargin),
      allowBnlj = true),


    // Benchmark decontamination: per-doc count of distinct bigrams shared
    // with a held-out "benchmark" slice (doc_id < 50 stands in for the
    // eval set). The benchmark shingle set broadcasts; only matching
    // shingles ever shuffle. Inner join in the oracle ≡ the engine's
    // semi-join + count because the benchmark token set is DISTINCT.
    "dedup_decontaminate" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        DedupOps.decontaminate(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
          "doc_id", "text", shingleN = 2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH bw AS (
             |  SELECT string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 50),
             |btok AS (
             |  SELECT DISTINCT unnest(
             |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
             |         ELSE [w[i] || ' ' || w[i+1]
             |               for i in range(1, len(w))] END) AS tok FROM bw),
             |cw AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id >= 50),
             |ctok AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
             |         ELSE [w[i] || ' ' || w[i+1]
             |               for i in range(1, len(w))] END)) AS tok FROM cw)
             |SELECT c.doc_id, count(*) AS n_overlap
             |FROM ctok c JOIN btok b ON c.tok = b.tok
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),


    // Soft contamination scoring (DedupOps.contaminationScore): the
    // graded companion to dedup_decontaminate — EVERY corpus doc gets
    // its benchmark-overlap FRACTION and a flagged bit (the GPT-3-style
    // n-gram decontamination policy), not just a hit count for
    // contaminated docs. 3-gram shingles at threshold 0.12 flag the
    // top quartile of this corpus at BOTH SFs (measured: median ~0.09,
    // p95 ~0.18 — 2-grams saturate to 100% flagged on template-built
    // synthetic text, a non-discriminating gate). Exact integers + one
    // raw IEEE division ⇒ fully oracled; the exploded gram stream
    // still semi-joins the broadcast benchmark set, so the shuffle
    // stays contamination-proportional.
    "dedup_contamination_score" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        DedupOps.contaminationScore(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
          "doc_id", "text", shingleN = 3, flagThreshold = 0.12)
          .orderBy(col("doc_id"))
      },
      Some("""WITH bw AS (
             |  SELECT string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 50),
             |btok AS (
             |  SELECT DISTINCT unnest(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |         ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |               for i in range(1, len(w) - 1)] END) AS tok FROM bw),
             |cw AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id >= 50),
             |cg AS (
             |  SELECT doc_id, list_distinct(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |         ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |               for i in range(1, len(w) - 1)] END) AS g FROM cw),
             |hits AS (
             |  SELECT c.doc_id, count(*) AS n_overlap
             |  FROM (SELECT doc_id, unnest(g) AS tok FROM cg) c
             |  JOIN btok b ON b.tok = c.tok
             |  GROUP BY c.doc_id)
             |SELECT cg.doc_id, CAST(len(g) AS BIGINT) AS n_grams,
             |  CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
             |  CASE WHEN len(g) = 0 THEN CAST(0.0 AS DOUBLE)
             |       ELSE CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / len(g)
             |  END AS contamination,
             |  CAST(CASE WHEN (CASE WHEN len(g) = 0 THEN CAST(0.0 AS DOUBLE)
             |       ELSE CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / len(g) END)
             |       >= CAST(0.12 AS DOUBLE) THEN 1 ELSE 0 END AS INTEGER)
             |    AS flagged
             |FROM cg LEFT JOIN hits h ON h.doc_id = cg.doc_id
             |ORDER BY cg.doc_id""".stripMargin)),


    // Incremental (batch-vs-corpus) exact dedup: the continuous-ingestion
    // shape — today's batch anti-joined against the accumulated corpus on
    // a content digest, never re-deduplicating the corpus. Ten corpus
    // texts are re-planted into the batch under fresh ids, so the key
    // exercises both drop (planted dups) and keep (novel docs). The
    // near-dup LSH tier is unit-tested (DedupSpec); digest semantics are
    // engine-side only — the oracle states text equality directly.
    "dedup_incremental" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpus = docs.filter(col("doc_id") < 450)
        val batch = docs.filter(col("doc_id") >= 450)
          .unionByName(docs.filter(col("doc_id") < 10)
            .withColumn("doc_id", col("doc_id") + 10000))
        DedupOps.incrementalDedup(batch, corpus, "doc_id", "text")
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH corpus AS (SELECT text FROM documents WHERE doc_id < 450),
             |batch AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 450
             |  UNION ALL
             |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 10)
             |SELECT b.doc_id FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
             |ORDER BY b.doc_id""".stripMargin)),


    // Bloom-prefiltered exact incremental dedup: same fixture and the
    // SAME final semantics as dedup_incremental (the bloom is a pure
    // prefilter — false positives fall to the exact anti join, false
    // negatives don't exist), so the key is fully oracled even though
    // the bloom bits themselves are engine-specific. The sketch is the
    // offline fit half (bloomFitDigests), memoized per dataset like the
    // IVF model.
    "dedup_incremental_bloom" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpus = docs.filter(col("doc_id") < 450)
        val batch = docs.filter(col("doc_id") >= 450)
          .unionByName(docs.filter(col("doc_id") < 10)
            .withColumn("doc_id", col("doc_id") + 10000))
        val sketch = bloomSketches.computeIfAbsent(d,
          _ => DedupOps.bloomFitDigests(corpus, "text", expectedItems = 10000L))
        DedupOps.incrementalDedupBloom(batch, corpus, "doc_id", "text", sketch)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH corpus AS (SELECT text FROM documents WHERE doc_id < 450),
             |batch AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 450
             |  UNION ALL
             |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 10)
             |SELECT b.doc_id FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
             |ORDER BY b.doc_id""".stripMargin)),


    // Asymmetric n-gram containment (the quote/partial-inclusion
    // detector): |A∩B|/|A| vs /|B| over the ngramJaccardPairs
    // candidate machinery — a planted 8-token quote of doc 0 surfaces
    // with containment 1.0 from the quote's side while its Jaccard
    // stays far below any dedup threshold (the case the symmetric
    // measure structurally misses). Exact-long divisions ⇒ oracled.
    "dedup_ngram_containment" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "documents").filter(col("doc_id") < 40)
          .select(col("doc_id"), col("text"))
        val quote = base.filter(col("doc_id") === 0)
          .select(lit(9000L).as("doc_id"),
            concat_ws(" ", slice(
              filter(TextOps.tokenize(col("text")), t => length(t) > 0),
              lit(1), lit(8))).as("text"))
        DedupOps.tokenContainmentPairs(
          base.unionByName(quote), "doc_id", "text", threshold = 0.6)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 40),
             |quote AS (
             |  SELECT CAST(9000 AS BIGINT) AS id,
             |    array_to_string(list_filter(
             |      regexp_split_to_array(lower(text), '\s+'),
             |      x -> length(x) > 0)[1:8], ' ') AS text
             |  FROM documents WHERE doc_id = 0),
             |docs AS (SELECT * FROM base UNION ALL SELECT * FROM quote),
             |toks AS (
             |  SELECT id, unnest(list_distinct(string_split(lower(text), ' ')))
             |    AS tok
             |  FROM docs),
             |-- the Spark side prunes tokens whose doc count tops the
             |-- pair-budget cap (707 docs for the default 250k budget)
             |-- from BOTH the intersection and the denominators; mirror
             |-- it so the two engines agree at every corpus size
             |stop AS (SELECT tok FROM toks GROUP BY tok
             |         HAVING count(*) > 707),
             |rare AS (SELECT * FROM toks
             |         WHERE tok NOT IN (SELECT tok FROM stop)),
             |sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n
             |          FROM rare GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b,
             |    CAST(count(*) AS BIGINT) AS n_inter
             |  FROM rare a JOIN rare b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b,
             |  CAST(n_inter AS DOUBLE) / CAST(sa.n AS DOUBLE) AS cont_a,
             |  CAST(n_inter AS DOUBLE) / CAST(sb.n AS DOUBLE) AS cont_b
             |FROM inter
             |JOIN sizes sa ON sa.id = id_a
             |JOIN sizes sb ON sb.id = id_b
             |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n AS DOUBLE) >= 0.6
             |   OR CAST(n_inter AS DOUBLE) / CAST(sb.n AS DOUBLE) >= 0.6
             |ORDER BY id_a, id_b""".stripMargin)),


    // Two-stage near-dup verify: bigram-Jaccard blocking proposes, banded
    // levenshtein confirms. Planted twins (every 5th doc re-added under a
    // fresh id with its first two tokens dropped) give true positives
    // with a known small edit distance; the corpus text column never
    // shuffles (both attachment joins broadcast the pair side).
    // Sorted-neighborhood record linkage (DedupOps.sortedNeighborLinkage,
    // Hernández & Stolfo merge/purge): records sort by normalized text
    // INSIDE 8-char-prefix blocks and compare only each record's next 2
    // neighbors — candidate count ≤ N·2, one partitioned Window (single
    // shuffle on the block key), no self-join, no N². The blocking
    // complement to MinHash-LSH for prefix-sharing near-dups; planted
    // truncated twins (last 2 words dropped, so the sort prefix
    // survives) verify recall. Word-set Jaccard = exact integer set
    // sizes + ONE IEEE division ⇒ fully oracled.
    "dedup_record_linkage" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id"), col("text"))
        val words = split(col("text"), " ")
        val planted = base.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            array_join(slice(words, lit(1), greatest(size(words) - 2, lit(1))),
              " ").as("text"))
        DedupOps.sortedNeighborLinkage(base.unionByName(planted),
          "doc_id", "text",
          blockKey = substring(lower(trim(col("text"))), 1, 8),
          windowSize = 2, minSim = 0.6)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 400
             |  UNION ALL
             |  SELECT doc_id + 10000,
             |    array_to_string((string_split(text, ' '))
             |      [1:greatest(len(string_split(text, ' ')) - 2, 1)], ' ')
             |  FROM documents WHERE doc_id < 400 AND doc_id % 5 = 0),
             |n AS (SELECT id, lower(trim(text)) AS nrm FROM docs
             |      WHERE length(lower(trim(text))) > 0),
             |b AS (SELECT id, nrm, substring(nrm, 1, 8) AS blk,
             |        list_distinct(regexp_split_to_array(nrm, '\s+')) AS toks
             |      FROM n),
             |l AS (SELECT id, toks, blk,
             |    lead(id, 1) OVER w AS id1, lead(toks, 1) OVER w AS t1,
             |    lead(id, 2) OVER w AS id2, lead(toks, 2) OVER w AS t2
             |  FROM b WINDOW w AS (PARTITION BY blk ORDER BY nrm, id)),
             |p AS (
             |  SELECT id AS id_a, id1 AS id_b,
             |    CAST(len(list_intersect(toks, t1)) AS DOUBLE) /
             |      (len(toks) + len(t1) - len(list_intersect(toks, t1))) AS sim
             |  FROM l WHERE id1 IS NOT NULL
             |  UNION ALL
             |  SELECT id, id2,
             |    CAST(len(list_intersect(toks, t2)) AS DOUBLE) /
             |      (len(toks) + len(t2) - len(list_intersect(toks, t2)))
             |  FROM l WHERE id2 IS NOT NULL)
             |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.6
             |ORDER BY id_a, id_b""".stripMargin)),


    "dedup_edit_distance" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "documents").filter(col("doc_id") < 60)
          .select(col("doc_id"), col("text"))
        val planted = base.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 3, 1000000)).as("text"))
        DedupOps.editDistanceVerify(base.unionByName(planted),
          "doc_id", "text", minJaccard = 0.5, maxDist = 40, shingleN = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 60
             |  UNION ALL
             |  SELECT doc_id + 10000,
             |    array_to_string((string_split(text, ' '))[3:], ' ')
             |  FROM documents WHERE doc_id < 60 AND doc_id % 5 = 0),
             |w AS (SELECT id, string_split(lower(text), ' ') AS w FROM docs),
             |toks AS (
             |  SELECT id, unnest(list_distinct([w[i] || ' ' || w[i+1]
             |    for i in range(1, len(w))])) AS tok FROM w),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY 1, 2),
             |cand AS (
             |  SELECT id_a, id_b,
             |    CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
             |  FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5)
             |SELECT id_a, id_b, jaccard,
             |  CAST(levenshtein(ta.text, tb.text) AS INTEGER) AS edit_dist
             |FROM cand
             |JOIN docs ta ON ta.id = id_a
             |JOIN docs tb ON tb.id = id_b
             |WHERE levenshtein(ta.text, tb.text) <= 40
             |ORDER BY id_a, id_b""".stripMargin)),


    // Perceptual-hash dedup: dHash (9×8 grid, 64 gradient bits) over the
    // stub raster, grouped exactly — with the payload-seeded stub, media
    // with identical payload AND dimensions collide (real byte-identical
    // files share both), so keeper/copy counts mirror file-level dedup
    // while the HASH itself is the rescale-robust fingerprint a real
    // pipeline buckets on. DuckDB recomputes every bit from text and
    // re-groups.
    "dedup_image_dhash" -> QuerySpec(
      (s, d) => {
        val media = MultimodalOps.attachFakeMedia(
          t(s, d, "documents"), "doc_id", "text")
        MultimodalOps.resizeStub(MultimodalOps.pixelSeed(media), 9, 8)
          .withColumn("dhash", MultimodalOps.dhashBits(col("pixels")))
          .groupBy(col("dhash"))
          .agg(min(col("doc_id")).as("keeper"),
            count(lit(1)).as("n_copies"))
          .orderBy(col("keeper"))
      },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    hex(encode('G')) || substr(hex(encode(text)),1,8)
             |      || hex(encode(text)) AS hx,
             |    CAST((doc_id % 64) * 16 + 16 AS BIGINT) AS w,
             |    CAST((doc_id % 32) * 16 + 16 AS BIGINT) AS h
             |  FROM documents),
             |sd AS (
             |  SELECT doc_id, w, h,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(0, length(hx)//2),
             |        i -> ('0x'||substr(hx, CAST(i*2+1 AS BIGINT), 2))::BIGINT)),
             |      (a,b) -> (a*31+b) % 2147483647) AS seed
             |  FROM s),
             |bits AS (
             |  SELECT doc_id,
             |    string_agg(CASE WHEN
             |      ((seed*1000003 + ((b//8)*h//8)*104729
             |        + (((b%8)+1)*w//9)*31) % 2147483647) % 256 >
             |      ((seed*1000003 + ((b//8)*h//8)*104729
             |        + ((b%8)*w//9)*31) % 2147483647) % 256
             |      THEN '1' ELSE '0' END, '' ORDER BY b) AS dhash
             |  FROM sd CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
             |  GROUP BY doc_id)
             |SELECT dhash, MIN(doc_id) AS keeper,
             |  COUNT(*) AS n_copies
             |FROM bits GROUP BY dhash ORDER BY keeper""".stripMargin)),


    // Perceptual-hash NEAR-dup pairs (r16 verdict ask #3) — the
    // multimodal↔dedup bridge: decode → 9×8 stub raster → 64-bit dHash →
    // banded-hamming blocking (4×16-bit segments, pigeonhole for
    // hamming ≤ 3) → exact bit_count(xor) verify. The fixture plants a
    // re-encode twin for every 7th media: SAME payload raster with ONE
    // grid cell's brightness shifted (+128 mod 256) — a one-pixel codec
    // artifact that flips at most the 2 gradient bits touching the cell,
    // so each twin lands within hamming ≤ 2 of its source and the banded
    // blocking must recover it. The (doc_id, pixels) table is STAGED as
    // parquet and BOTH engines hash from those staged integers — DuckDB
    // replays dHash bit-for-bit and confirms pairs by all-pairs hamming
    // (exact at oracle scale; Spark side never goes all-pairs).
    "dedup_phash" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "phash_pixels") { dir =>
          val media = MultimodalOps.attachFakeMedia(
            t(s, d, "documents"), "doc_id", "text")
          val base = MultimodalOps.resizeStub(
              MultimodalOps.pixelSeed(media), 9, 8)
            .select(col("doc_id"), col("pixels"))
          val twins = base.filter(pmod(col("doc_id"), lit(7)) === 0)
            .select((col("doc_id") + 100000L).as("doc_id"),
              transform(col("pixels"), (v, i) =>
                when(i.cast(LongType) === pmod(col("doc_id"), lit(72L)),
                  pmod(v + lit(128L), lit(256L))).otherwise(v)).as("pixels"))
          base.unionByName(twins).coalesce(1)
            .write.mode("overwrite").parquet(dir)
        }
        val hashed = s.read.parquet(dir)
          .withColumn("dhash", MultimodalOps.dhashBits(col("pixels")))
        DedupOps.bitstringDupPairs(hashed, "doc_id", "dhash", maxHamming = 3)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH px AS (
             |  SELECT doc_id, pixels FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/phash_pixels/*.parquet')),
             |bits AS (
             |  SELECT doc_id,
             |    string_agg(CASE WHEN
             |      pixels[(b//8)*9 + (b%8) + 2] > pixels[(b//8)*9 + (b%8) + 1]
             |      THEN '1' ELSE '0' END, '' ORDER BY b) AS dhash
             |  FROM px CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
             |  GROUP BY doc_id)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(len(list_filter(range(1, 65),
             |    i -> a.dhash[i] <> b.dhash[i])) AS INTEGER) AS hamming
             |FROM bits a JOIN bits b ON a.doc_id < b.doc_id
             |WHERE len(list_filter(range(1, 65),
             |  i -> a.dhash[i] <> b.dhash[i])) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),
  )
}
