package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score raw-corpus documents by how target-like
  * their hashed n-gram bag is, then keep the highest-weight examples.
  * The production use is pretraining-data curation — "give me the 1%
  * of the crawl that looks most like Wikipedia" — which makes it a
  * front-line operator of the LLM-data pipeline alongside the dedup
  * and quality tiers (reference README.md:933-1012 motivates the
  * quality-filter stage; DSIR is its distribution-matching upgrade).
  *
  * Model shape (the [[ClassifyOps.nbFit]] contract): a FIT over the
  * target and raw corpora freezes per-bucket log importance ratios
  * `lr(b) = log p_target(b) − log p_raw(b)` (add-s smoothed hashed
  * n-gram unigram models over B buckets), quantized to
  * DECIMAL(20,6) ONCE at fit time and never re-rounded. A document's
  * log weight is then `Σ_b count_b · lr(b)` — a sum of exact decimals,
  * bit-reproducible in any engine and ORDER-INDEPENDENT across
  * partial aggregation, so the whole operator is oracle-verifiable.
  *
  * Features are hashed word unigrams AND bigrams (the paper's n ∈
  * {1,2} bag) through the portable 31-polynomial code-point hash
  * ([[EmbedOps.tokenHash]]), computed HERE as a Catalyst column
  * program (codegen, no UDF) and restated in SQL with the same
  * `list_reduce` every hashing oracle already uses.
  *
  * Selection is the DETERMINISTIC top-k variant: rank by
  * (log_w DESC, id ASC) — a global TakeOrderedAndProject, k rows out
  * of any corpus size. The paper resamples with Gumbel noise; a noisy
  * rank would hang selection on per-row transcendentals with no
  * cross-engine reproducibility contract, and at fixed k the noise-free
  * variant is the one production curation jobs actually run.
  *
  * Scale shape: fit = two bucket-grain aggregations (B rows out,
  * B ≪ corpus — the 100 TB corpora are scanned once each); score = one
  * (id, bucket) aggregation joined against the B-row broadcast model;
  * select = bounded-heap global top-k. No all-pairs, no window over
  * the full corpus, no driver loop.
  */
object DsirOps {

  /** Portable 31-polynomial code-point hash as a column program:
    * `h₀ = seed mod M; hᵢ = (hᵢ₋₁·31 + cp(cᵢ)) mod M` with
    * M = 2³¹−1 ([[EmbedOps.hashModulus]]) — the JVM twin is
    * [[EmbedOps.tokenHash]], the SQL twin the `list_reduce` fold over
    * `ord()` in every hashing oracle. `ascii()` yields the code point
    * of a one-char string for BMP text (the fixtures are ASCII; the
    * supplementary-plane caveat is that `split(s, "")` splits UTF-16
    * units — identical to the oracle side only up to BMP, documented
    * here once for every column-side consumer). */
  def tokenHashCol(tok: Column, seed: Long): Column = {
    val m = EmbedOps.hashModulus
    aggregate(
      transform(split(tok, ""), c => ascii(c).cast(LongType)),
      lit(seed % m),
      (a, c) => (a * lit(31L) + c) % lit(m))
  }

  /** Hashed n-gram (n ∈ {1,2}) feature-bucket array for one document:
    * lowercased whitespace unigrams plus space-joined adjacent bigrams,
    * each hashed and reduced mod `buckets`. Empty/NULL text → empty
    * array (no evidence — the scoring join drops the doc, the
    * [[ClassifyOps.nbScoreWith]] contract). */
  def featureBuckets(text: Column, buckets: Int, seed: Long): Column = {
    val toks = filter(TextOps.tokenize(text), t => length(t) > 0)
    val n = size(toks)
    val bigrams = when(n >= 2,
      zip_with(slice(toks, lit(1), n - lit(1)), slice(toks, lit(2), n - lit(1)),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast(ArrayType(StringType)))
    val feats = concat(toks, bigrams)
    transform(feats, f => (tokenHashCol(f, seed) % buckets).cast(IntegerType))
  }

  /** Per-document feature-bucket counts: (`idCol`, `bucket`, `_cnt`) —
    * the shareable intermediate of the whole DSIR pipeline. Hash the
    * corpus ONCE into this frame (and checkpoint/persist it), then
    * derive both the fit's bucket totals AND the per-doc scores from
    * it — the raw corpus is never feature-hashed twice. */
  def docBucketCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 256, seed: Long = 7L,
      // doc-constant passenger columns (e.g. the corpus-split label) to
      // carry through the aggregation: lets fit+score share ONE
      // feature-hash pass over a mixed corpus instead of hashing each
      // slice separately (r17, guide §1.2 — don't compute things twice).
      // Each must be functionally dependent on idCol; they join the
      // groupBy key, which cannot change counts on a doc-constant column.
      carryCols: Seq[String] = Nil): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    df.select(col(idCol) +: carryCols.map(col) :+
        explode(featureBuckets(col(textCol), buckets, seed)).as("bucket"): _*)
      .groupBy(col(idCol) +: carryCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("_cnt"))
  }

  /** FIT from precomputed [[docBucketCounts]] frames — the shape that
    * reuses one hashing pass across fit and score. Output: one row per
    * bucket in [0, buckets) — (`bucket` INT, `_lr` DECIMAL(20,6)) —
    * parquet-able, so the two 100 TB fit scans happen once ever
    * ([[SearchOps]] bm25Fit contract). Smoothing `s` gives every
    * bucket mass on both sides; the full-grid build means scoring
    * needs no default row. */
  def dsirFitFromCounts(targetCounts: DataFrame, rawCounts: DataFrame,
      buckets: Int = 256, smoothing: Double = 0.5): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    def bucketTotals(counts: DataFrame, cnt: String): DataFrame =
      counts.groupBy(col("bucket")).agg(sum(col("_cnt")).as(cnt))
    // The doc-grain frames aggregate to ≤ buckets rows; the totals
    // re-derive from those rows, never from a second corpus scan. The
    // grid (a literal range) restores never-seen buckets so the model
    // is total over [0, buckets).
    val grid = targetCounts.sparkSession.range(buckets.toLong)
      .select(col("id").cast(IntegerType).as("bucket"))
    // each count frame feeds BOTH the grid join and its total — an
    // in-plan double reference re-evaluates the upstream scan, so the
    // bucket-grain (≤ buckets rows) frames are eagerly materialized
    val ct = TextOps.materializeUnlessLeaf(bucketTotals(targetCounts, "_ct"))
    val cr = TextOps.materializeUnlessLeaf(bucketTotals(rawCounts, "_cr"))
    val nt = ct.agg(sum(col("_ct")).as("_nt"))
    val nr = cr.agg(sum(col("_cr")).as("_nr"))
    grid
      .join(broadcast(ct), Seq("bucket"), "left")
      .join(broadcast(cr), Seq("bucket"), "left")
      .crossJoin(broadcast(nt))
      .crossJoin(broadcast(nr))
      .select(col("bucket"),
        (log((coalesce(col("_ct"), lit(0L)) + lit(smoothing)) /
             (col("_nt") + lit(smoothing * buckets))) -
         log((coalesce(col("_cr"), lit(0L)) + lit(smoothing)) /
             (col("_nr") + lit(smoothing * buckets))))
          .cast(DecimalType(20, 6)).as("_lr"))
  }

  /** FIT from raw text (the simple API): hashes each corpus once,
    * aggregating straight to the bucket grain (no doc-grain shuffle),
    * and delegates to [[dsirFitFromCounts]]. For a fit+score
    * composition over the SAME raw frame, hash once with
    * [[docBucketCounts]] and reuse the frame on both sides instead. */
  def dsirFit(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int = 256, smoothing: Double = 0.5, seed: Long = 7L): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def bucketGrain(df: DataFrame): DataFrame =
      df.select(explode(featureBuckets(col(textCol), buckets, seed)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("_cnt"))
    dsirFitFromCounts(bucketGrain(target), bucketGrain(raw),
      buckets, smoothing)
  }

  /** SCORE from a precomputed [[docBucketCounts]] frame. */
  def dsirScoreFromCounts(docCounts: DataFrame, idCol: String,
      model: DataFrame): DataFrame = {
    val m = TextOps.materializeUnlessLeaf(model)
    docCounts
      // hint-broadcast: the model is ≤ buckets rows BY CONSTRUCTION
      .join(broadcast(m), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("_cnt")).as("n_feats"),
        sum(col("_cnt").cast(DecimalType(10, 0)) * col("_lr"))
          .cast(DoubleType).as("log_w"))
  }

  /** SCORE: per-document log importance weight under a FROZEN
    * [[dsirFit]] model. Output: (`idCol`, `n_feats` BIGINT,
    * `log_w` DOUBLE) where log_w = Σ count_b·lr(b) accumulated in
    * exact decimal and presented as the double of that exact 1e-6
    * multiple (the [[ClassifyOps.nbClassifyWith]] presentation —
    * correctly-rounded decimal→double is bit-identical everywhere).
    * Documents with no features are absent (no evidence). */
  def dsirScoreWith(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, buckets: Int = 256, seed: Long = 7L): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // `buckets`/`seed` must be the fit-time values — the model frame
    // carries only (bucket, _lr), so the hashing config travels with
    // the caller exactly as bm25TopK's k1/b do. The decimal product
    // inside dsirScoreFromCounts is DECIMAL(10,0)×DECIMAL(20,6) =
    // DECIMAL(31,6): exact — a BIGINT factor would push the product
    // past precision 38 and Spark's precision-loss rule truncates the
    // scale (the nbScoreWith 2e-6 drift, pinned there).
    dsirScoreFromCounts(
      docBucketCounts(df.select(col(idCol), col(textCol)),
        idCol, textCol, buckets, seed),
      idCol, model)
  }

  /** SELECT: the k most target-like documents — rank by
    * (log_w DESC, id ASC) over [[dsirScoreWith]] output. A global
    * sort-limit: TakeOrderedAndProject carries k rows per map task,
    * never the corpus. */
  def dsirSelect(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    scored.orderBy(col("log_w").desc, col(idCol)).limit(k)
  }
}
