package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Sample family of the operator catalog (14 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogSample {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // Stratified sampling (training-mix rebalancing): per-stratum seeded
    // Bernoulli. Runs the portable-LCG variant so the key is FULLY
    // ORACLED — every keep decision is restated in DuckDB integer
    // arithmetic and the coin flips compare bit-for-bit, the same tier
    // upgrade sample_weighted got. The native sampleBy variant's
    // fraction bounds + determinism stay unit-tested (SampleOpsSpec).
    "sample_stratified" -> QuerySpec(
      (s, d) => SampleOps.stratifiedSamplePortable(
        t(s, d, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.25, "zh" -> 0.1))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE CAST(((doc_id + 42) * 1103515245 + 12345) % 2147483648
             |           AS DOUBLE) / 2147483648.0
             |      < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
             |                  WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.25
             |                  WHEN 'zh' THEN 0.1 END
             |ORDER BY doc_id""".stripMargin)),


    // Quality-curriculum subsetting: rank by a quality score, cut into
    // equal-population rank buckets (exact integer rank·k div N — no
    // value-quantile edges whose cross-engine ulp could flip a
    // membership), keep per-bucket fractions via the portable LCG.
    // Fully oracled: DuckDB restates the ranking window, the integer
    // bucket arithmetic, and the bit-exact coin flips.
    "sample_curriculum" -> QuerySpec(
      (s, d) => SampleOps.curriculumSample(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", "doc_id", fractions = Seq(0.1, 0.25, 0.5, 1.0))
        .orderBy(col("doc_id")),
      Some("""WITH r AS (
             |  SELECT doc_id, n_chars,
             |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rank,
             |    count(*) OVER () AS n
             |  FROM documents)
             |SELECT doc_id, n_chars, CAST((rank * 4) // n AS BIGINT) AS quality_bucket
             |FROM r
             |WHERE CAST(((doc_id + 42) * 1103515245 + 12345) % 2147483648
             |           AS DOUBLE) / 2147483648.0
             |      < CASE (rank * 4) // n WHEN 0 THEN 0.1 WHEN 1 THEN 0.25
             |                            WHEN 2 THEN 0.5 ELSE 1.0 END
             |ORDER BY doc_id""".stripMargin),
      allowBnlj = true),


    // Gumbel-top-k weighted sampling WITHOUT replacement (SampleOps
    // .gumbelTopK, Efraimidis & Spirakis 2006) — the principled
    // stochastic alternative to deterministic top-k curation: the k
    // largest ln(w)+Gumbel(u) keys ARE a weight-proportional sample
    // without replacement. u comes from the portable LCG shifted +0.5
    // (strictly inside (0,1) — u = 0 would blow up the double log);
    // BOTH transcendental terms quantize ONCE to DECIMAL(20,9) so the
    // ranking key is an exact decimal sum — the oracle re-derives
    // every draw bit-for-bit (its quantizing casts bridge through
    // VARCHAR, the ts_backtest rule).
    "sample_gumbel_topk" -> QuerySpec(
      (s, d) => SampleOps.gumbelTopK(
        t(s, d, "documents"), "doc_id", "n_chars", k = 100, seed = 7L),
      Some("""WITH g AS (
             |  SELECT doc_id, n_chars,
             |    CAST(CAST(ln(CAST(n_chars AS DOUBLE)) AS VARCHAR)
             |      AS DECIMAL(20,9)) +
             |    CAST(CAST(-ln(-ln(
             |      (((doc_id + 7) * 1103515245 + 12345) % 2147483648 + 0.5)
             |        / 2147483648.0)) AS VARCHAR) AS DECIMAL(20,9)) AS gkey
             |  FROM documents),
             |top AS (SELECT * FROM g ORDER BY gkey DESC, doc_id LIMIT 100)
             |SELECT CAST(row_number() OVER (ORDER BY gkey DESC, doc_id)
             |    AS INTEGER) AS rank,
             |  doc_id, n_chars, CAST(gkey AS DOUBLE) AS gumbel_key
             |FROM top ORDER BY rank""".stripMargin)),


    // Per-row weighted Bernoulli sample (keep probability = a per-doc
    // quality proxy, here length-derived). Runs the portableHash variant
    // so the key is FULLY ORACLED: the 31-bit LCG keep decision is
    // restated in DuckDB integer arithmetic and even the coin flips
    // compare bit-for-bit (length() counts code points in both engines).
    // The default xxhash64 variant's fraction/subset/determinism
    // properties are unit-tested (SampleOpsSpec).
    "sample_weighted" -> QuerySpec(
      (s, d) => SampleOps.weightedSample(
        t(s, d, "documents")
          .withColumn("w", least(lit(1.0), length(col("text")) / lit(400.0))),
        "doc_id", "w", portableHash = true)
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM documents
             |WHERE CAST(((doc_id + 42) * 1103515245 + 12345) % 2147483648
             |           AS DOUBLE) / 2147483648.0
             |      < LEAST(1.0, LENGTH(text) / 400.0)
             |ORDER BY doc_id""".stripMargin)),


    // Popularity-smoothed negative sampling
    // (SampleOps.popularityNegatives): k word2vec-style negatives per
    // customer from the part-popularity unigram distribution ^0.75.
    // The 3/4 power is the fixed sqrt(sqrt(c³)) sequence (two
    // correctly-rounded IEEE roots — libm pow's last ulp is
    // platform-defined, nested sqrt is not), quantized to an integer
    // CDF; draws invert it at the portable LCG coin. Spark probes the
    // CDF as a broadcast sorted-array prefix count (no range join, no
    // BNLJ); the oracle restates it as an interval join — same integer
    // intervals, same rows.
    "sample_negatives_popularity" -> QuerySpec(
      (s, d) => {
        val items = t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("item"))
          .agg(count(lit(1)).as("cnt"))
        SampleOps.popularityNegatives(
          t(s, d, "customer").select(col("c_custkey")), "c_custkey",
          items, "item", "cnt", k = 4)
          .orderBy(col("c_custkey"), col("draw"))
      },
      Some("""WITH pop AS (
             |  SELECT l_partkey AS item, count(*) AS c
             |  FROM lineitem GROUP BY 1),
             |wq AS (
             |  SELECT item,
             |    CAST(FLOOR(sqrt(sqrt(CAST(c*c*c AS DOUBLE))) * 1000.0)
             |      AS BIGINT) AS w
             |  FROM pop WHERE c > 0 AND item IS NOT NULL),
             |cum AS (
             |  SELECT item, w,
             |    COALESCE(SUM(w) OVER (ORDER BY item
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS lo
             |  FROM wq),
             |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wq),
             |draws AS (
             |  SELECT c_custkey, CAST(j AS BIGINT) AS draw,
             |    CAST(FLOOR(
             |      CAST(((c_custkey * 4 + j + 42) * 1103515245 + 12345)
             |             % 2147483648 AS DOUBLE) / 2147483648.0
             |      * CAST(tw AS DOUBLE)) AS BIGINT) AS target
             |  FROM customer
             |  CROSS JOIN tot
             |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS j))
             |SELECT d.c_custkey, d.draw, c.item
             |FROM draws d
             |JOIN cum c ON d.target >= c.lo AND d.target < c.lo + c.w
             |ORDER BY d.c_custkey, d.draw""".stripMargin),
      allowBnlj = true),


    // Training-mix resampling to target per-source proportions. Fully
    // ORACLED — unlike the two keys above — because the keep decision
    // uses the portable 31-bit LCG hash (SampleOps.portableUniform) that
    // DuckDB evaluates bit-identically in integer arithmetic, so even
    // the Bernoulli coin flips are cross-engine exact. de binds the mix
    // (70/0.3 is the smallest n/p); es/fr are absent from the targets
    // and must be dropped.
    "sample_mix_to_target" -> QuerySpec(
      (s, d) => SampleOps.mixToTarget(
        t(s, d, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some("""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
             |tgt(lang, p) AS (VALUES ('en', 0.5), ('de', 0.3), ('zh', 0.2)),
             |joined AS (
             |  SELECT c.lang, CAST(c.n AS DOUBLE) AS n, CAST(t.p AS DOUBLE) AS p,
             |    CAST(c.n AS DOUBLE) / CAST(t.p AS DOUBLE) AS t_s
             |  FROM counts c JOIN tgt t ON c.lang = t.lang),
             |fr AS (
             |  SELECT lang, LEAST(1.0, (SELECT min(t_s) FROM joined) * p / n) AS f
             |  FROM joined)
             |SELECT d.doc_id, d.lang
             |FROM documents d JOIN fr ON d.lang = fr.lang
             |WHERE CAST((d.doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |        / 2147483648.0 < fr.f
             |ORDER BY d.doc_id""".stripMargin)),


    // Temperature resampling (kept counts ∝ n^alpha, alpha = 0.5): the
    // data-derived rebalancing rule, vs mix_to_target's explicit
    // targets. en (3× the tail) thins to f = (n_en/n_min)^-0.5 ≈ 0.57
    // while the smallest lang keeps 1.0. FULLY ORACLED: counts, the
    // pow(), and every portable-LCG coin flip restate in DuckDB.
    "sample_temperature" -> QuerySpec(
      (s, d) => SampleOps.temperatureSample(
        t(s, d, "documents"), "lang", "doc_id", alpha = 0.5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some("""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
             |fr AS (
             |  SELECT lang,
             |    pow(CAST(n AS DOUBLE) / (SELECT min(n) FROM counts), -0.5) AS f
             |  FROM counts)
             |SELECT d.doc_id, d.lang
             |FROM documents d JOIN fr USING (lang)
             |WHERE CAST((d.doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |        / 2147483648.0 < fr.f
             |ORDER BY d.doc_id""".stripMargin)),


    // Deterministic split assignment (train/val/test) via the portable
    // LCG hash — fully oracled including every per-row assignment. Keyed
    // by doc_id here for the oracle; production keys by the dedup
    // cluster id (leakage guard — see SampleOps.assignSplits doc and the
    // cluster-consistency unit).
    "sample_split_assign" -> QuerySpec(
      (s, d) => SampleOps.assignSplits(
        t(s, d, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CASE WHEN u < 0.8 THEN 'train'
             |       WHEN u < 0.9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        CAST((doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |          / 2147483648.0 AS u
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),


    // K-fold cross-validation assignment (round 14) — the CV primitive
    // completing the split family (random holdout / temporal-purged /
    // cluster-guarded / k-fold): fold = equal-width cut of the portable
    // LCG draw (u·k div 2³¹ in INTEGER arithmetic — never a float
    // compare chain whose boundary could flip cross-engine), so every
    // assignment replays bit-exactly in the oracle and a row's fold is
    // stable under any repartitioning or corpus growth (id-keyed, not
    // rank-keyed — appending documents never reshuffles folds, the
    // property rank-based cuts lack). Per-fold counts ride along via
    // one grain aggregation; the ±3σ balance bound is checked in-query.
    "sample_kfold" -> QuerySpec(
      (s, d) => {
        val k = 5
        val m = 1L << 31
        val assigned = t(s, d, "documents")
          .select(col("doc_id"),
            expr(s"(pmod(doc_id * 1103515245L + 12345L, ${m}L) * $k) div ${m}L")
              .cast(IntegerType).as("fold"))
        val counts = assigned.groupBy(col("fold"))
          .agg(count(lit(1)).as("n_fold"))
        val tot = assigned.agg(count(lit(1)).as("_n"))
        assigned.join(broadcast(counts), Seq("fold"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("fold"), col("n_fold"),
            // balance bound: |n_fold − N/k| ≤ 4·sqrt(N) — in-query, the
            // checked-band discipline (a broken LCG or cut would trip it)
            when(abs(col("n_fold").cast(DoubleType) -
                col("_n").cast(DoubleType) / lit(k.toDouble)) <=
                lit(4.0) * sqrt(col("_n").cast(DoubleType)), 1)
              .otherwise(0).as("balance_ok"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    CAST(((doc_id * 1103515245 + 12345) % 2147483648) * 5
             |      // 2147483648 AS INTEGER) AS fold
             |  FROM documents),
             |c AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_fold
             |      FROM a GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a)
             |SELECT a.doc_id, a.fold, c.n_fold,
             |  CAST(CASE WHEN abs(CAST(c.n_fold AS DOUBLE)
             |      - CAST(t.n AS DOUBLE) / 5.0)
             |      <= 4.0 * sqrt(CAST(t.n AS DOUBLE)) THEN 1 ELSE 0 END
             |    AS INTEGER) AS balance_ok
             |FROM a JOIN c USING (fold) CROSS JOIN t
             |ORDER BY a.doc_id""".stripMargin),
      allowBnlj = true),


    // TEMPORAL train/test split with an EMBARGO gap (the purged
    // time-based split, López de Prado 2018 ch.7; for LLM data: train
    // pre-cutoff, evaluate post-cutoff, the gap absorbing
    // near-duplicate leakage across the boundary) — the split
    // sample_split_assign's random hash CANNOT provide when the task
    // is forecasting or freshness eval. Boundary = the exact 75th
    // percentile of event time (dyadic k ⇒ the interpolation
    // (1−f)·a + f·b is exact-double over epoch-micro longs — the
    // prep_quantile_bins contract; at 100 TB swap in the documented
    // approxThresholds mode), embargo = 1 hour. Output: per-split
    // row counts, distinct actors, and the ACTOR-OVERLAP-WITH-TRAIN
    // audit — the diagnostic that tells the caller whether a grouped
    // split is needed (entity leakage survives any time boundary).
    "sample_split_temporal" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val t0 = ev.agg(expr("percentile(us, 0.75)").as("_t0"))
        val tagged = ev.crossJoin(broadcast(t0))
          .withColumn("split",
            when(col("us") < col("_t0"), "train")
              .when(col("us") < col("_t0") + lit(3600000000L), "embargo")
              .otherwise("test"))
        val spl = tagged.groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
        val trainUsers = tagged.filter(col("split") === "train")
          .select(col("user_id")).distinct()
        val ov = tagged.filter(col("split") =!= "train")
          .join(trainUsers, Seq("user_id"))
          .groupBy(col("split"))
          .agg(countDistinct(col("user_id")).as("_o"))
        spl.join(ov, Seq("split"), "left")
          .select(col("split"), col("n"), col("n_users"),
            when(col("split") === "train", lit(null).cast(LongType))
              .otherwise(coalesce(col("_o"), lit(0L)))
              .as("n_users_overlap_train"))
          .orderBy(col("split"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) AS us FROM events),
             |t0 AS (SELECT quantile_cont(us, 0.75) AS t0 FROM ev),
             |tagged AS (
             |  SELECT user_id,
             |    CASE WHEN us < t0 THEN 'train'
             |         WHEN us < t0 + 3600000000 THEN 'embargo'
             |         ELSE 'test' END AS split
             |  FROM ev CROSS JOIN t0),
             |spl AS (
             |  SELECT split, CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |  FROM tagged GROUP BY 1),
             |tu AS (SELECT DISTINCT user_id FROM tagged WHERE split = 'train'),
             |ov AS (
             |  SELECT split, CAST(count(DISTINCT tagged.user_id) AS BIGINT) AS o
             |  FROM tagged JOIN tu USING (user_id)
             |  WHERE split <> 'train' GROUP BY 1)
             |SELECT spl.split AS split, n, n_users,
             |  CASE WHEN spl.split = 'train' THEN NULL
             |       ELSE COALESCE(o, 0) END AS n_users_overlap_train
             |FROM spl LEFT JOIN ov ON ov.split = spl.split
             |ORDER BY spl.split""".stripMargin),
      allowBnlj = true),


    // Leakage-guard train/val/test split: assignment at the NEAR-DUP
    // CLUSTER grain, not the document grain — the coin flips on
    // cluster_id, so two near-duplicate documents can never straddle a
    // split boundary (the eval-contamination failure mode of per-doc
    // splitting: a train doc's near-copy lands in test and the eval
    // leaks). Composes the audited pieces end to end: ngram-Jaccard
    // pairs → connected components → assignSplits on the cluster label;
    // singletons are their own cluster, so they split exactly like
    // sample_split_assign. DuckDB independently rebuilds shingles,
    // Jaccard pairs, the transitive closure (recursive CTE), and the
    // bit-exact LCG coin — the dedup_cluster_cc oracle composed with
    // the sample_split_assign oracle.
    "sample_split_by_cluster" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val pairs = DedupOps.ngramJaccardPairs(
          docs, "doc_id", "text", 0.3, shingleN = 2)
          .select(col("id_a"), col("id_b"))
        val clusters = DedupOps.connectedComponents(
          docs.select(col("doc_id")), pairs, "doc_id", "id_a", "id_b")
        SampleOps.assignSplits(clusters, "cluster_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select(col("doc_id"), col("cluster_id"), col("split"))
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
             |labels AS (
             |  SELECT id AS doc_id, min(l) AS cluster_id
             |  FROM reach GROUP BY id)
             |SELECT doc_id, cluster_id,
             |  CASE WHEN u < 0.8 THEN 'train'
             |       WHEN u < 0.9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id, cluster_id,
             |        CAST((cluster_id * 1103515245 + 12345) % 2147483648
             |          AS DOUBLE) / 2147483648.0 AS u
             |      FROM labels)
             |ORDER BY doc_id""".stripMargin)),


    // Deterministic global corpus shuffle: the reproducible pseudorandom
    // total order a trainer reads the corpus in. Distributed range sort
    // on the portable-LCG key + zipWithIndex positions (never a
    // partition-less window); DuckDB re-derives the entire permutation
    // from the same integer LCG — every position bit-exact.
    "sample_shuffle_global" -> QuerySpec(
      (s, d) => SampleOps.deterministicShuffle(
        t(s, d, "documents").select(col("doc_id")), "doc_id", seed = 7L)
        .orderBy(col("shuffle_pos")),
      Some("""SELECT doc_id,
             |  CAST(row_number() OVER (ORDER BY
             |    ((doc_id + 7) * 1103515245 + 12345) % 2147483648, doc_id)
             |    - 1 AS BIGINT) AS shuffle_pos
             |FROM documents
             |ORDER BY shuffle_pos""".stripMargin)),


    // DSIR importance selection (Xie et al. 2023): hashed n-gram
    // (uni+bigram) bucket models over a target slice (src0 docs) vs the
    // raw rest, per-bucket log ratios frozen DECIMAL(20,6) at fit (the
    // NB quantization contract), per-doc log weights as exact decimal
    // sums, deterministic top-100 by (log_w DESC, doc_id). DuckDB
    // rebuilds tokenization, the portable code-point hash, smoothing,
    // quantized ratios, decimal sums and the top-k — fully oracled.
    // Fit aggregates each corpus ONCE to 64 bucket rows; scoring is one
    // (doc, bucket) aggregation against the broadcast model; selection
    // is a bounded-heap global top-k: the 100 TB shape throughout.
    "sample_dsir_select" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
        // r17 (guide §1.2): target and raw partition the SAME corpus, so
        // the whole corpus is feature-hashed ONCE with `source` carried
        // through the aggregation, and both sides slice the eagerly
        // materialized (doc, bucket) frame — one tokenize+hash+explode
        // pass instead of two disjoint ones (the hash pass is the
        // operator's dominant cost; counts are unchanged because source
        // is doc-constant). The production pipeline persists this frame
        // as parquet instead.
        val allCounts = DsirOps.docBucketCounts(
          docs, "doc_id", "text",
          buckets = 64, seed = 7L, carryCols = Seq("source"))
          .localCheckpoint()
        val rawCounts = allCounts.filter(col("source") =!= "src0")
          .drop("source")
        val targetCounts = allCounts.filter(col("source") === "src0")
          .drop("source")
        val model = DsirOps.dsirFitFromCounts(targetCounts, rawCounts,
          buckets = 64, smoothing = 0.5)
        val scored = DsirOps.dsirScoreFromCounts(rawCounts, "doc_id", model)
        DsirOps.dsirSelect(scored, "doc_id", 100)
          .select(col("doc_id"), col("n_feats"), col("log_w"))
          .orderBy(col("log_w").desc, col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, source,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'),
             |      x -> length(x) > 0) AS tk
             |  FROM documents),
             |feats AS (
             |  SELECT doc_id, source, unnest(tk) AS f FROM base
             |  UNION ALL
             |  SELECT doc_id, source,
             |    unnest(list_transform(range(1, len(tk)),
             |      i -> tk[i] || ' ' || tk[i + 1])) AS f
             |  FROM base),
             |hashed AS (
             |  SELECT doc_id, source,
             |    CAST(list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(regexp_split_to_array(f, ''),
             |        c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 2147483647) % 64 AS INTEGER) AS bucket
             |  FROM feats),
             |ct AS (SELECT bucket, count(*) AS c FROM hashed
             |       WHERE source = 'src0' GROUP BY 1),
             |cr AS (SELECT bucket, count(*) AS c FROM hashed
             |       WHERE source <> 'src0' GROUP BY 1),
             |nt AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM ct),
             |nr AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM cr),
             |grid AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS bucket),
             |model AS (
             |  SELECT g.bucket,
             |    CAST(ln((COALESCE(ct.c, 0) + 0.5) / (nt.n + 32.0)) -
             |         ln((COALESCE(cr.c, 0) + 0.5) / (nr.n + 32.0))
             |      AS DECIMAL(20,6)) AS lr
             |  FROM grid g
             |  LEFT JOIN ct USING (bucket) LEFT JOIN cr USING (bucket)
             |  CROSS JOIN nt CROSS JOIN nr),
             |db AS (
             |  SELECT doc_id, bucket, count(*) AS cnt
             |  FROM hashed WHERE source <> 'src0' GROUP BY 1, 2),
             |scored AS (
             |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_feats,
             |    CAST(SUM(CAST(cnt AS DECIMAL(10,0)) * m.lr) AS DOUBLE) AS log_w
             |  FROM db JOIN model m USING (bucket) GROUP BY 1)
             |SELECT doc_id, n_feats, log_w
             |FROM scored ORDER BY log_w DESC, doc_id LIMIT 100""".stripMargin),
      allowBnlj = true),


    // Exact per-group sampling ("30 docs per language"): row_number over
    // (group, portable-LCG hash, id) with rn ≤ n — the count-contract
    // sampler (Bernoulli keys above only promise an expectation). The
    // LCG is DuckDB-bit-identical, so every drawn id is oracled. Plans
    // through the TopKPerKey bounded-heap strategy (SampleOpsSpec).
    "sample_per_group" -> QuerySpec(
      (s, d) => SampleOps.samplePerGroup(
        t(s, d, "documents"), "lang", "doc_id", n = 30, seed = 7L)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id")),
      Some("""WITH u AS (
             |  SELECT lang, doc_id,
             |    CAST(((doc_id + 7) * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |      / 2147483648.0 AS u
             |  FROM documents),
             |r AS (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
             |  FROM u)
             |SELECT lang, doc_id FROM r WHERE rn <= 30
             |ORDER BY lang, doc_id""".stripMargin)),
  )
}
