package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based document classification for training-data pipelines —
  * the CCNet/fastText-style supervised tier that sits next to the
  * heuristic scorers in [[TextOps]]: fit a multinomial Naive Bayes
  * model over labeled documents (language ID against a labeled seed
  * corpus, quality against a reference-vs-crawl split), freeze it, and
  * score any corpus against the frozen statistics.
  *
  * Follows the [[TextOps.unigramLmFit]]/`unigramScoreWith` fit/score
  * contract: the model is one small plain-columnar frame (vocabulary ×
  * classes), persistable to parquet and reloadable into a batch or
  * streaming scorer, and scoring consults ONLY the model frame — the
  * same document scores identically under a model fit in-plan or fit
  * last week and reloaded.
  *
  * Everything is decimal-disciplined: per-token log-probs and class
  * priors are quantized to DECIMAL(20,6) at fit time and NEVER rounded
  * again — score sums stay exact multiples of 1e-6, so they are
  * order-independent, cross-engine exact, and presentable by pure
  * cast. Scale 6 (not the LM ops' scale 9 + final re-round) is load-
  * bearing: a 1-ulp libm ln() disagreement (~1e-15 relative) straddles
  * a 1e-9 quantization boundary with probability ~1e-6 per value —
  * measured as real sf0.01 mismatches over vocab x classes values —
  * while a 1e-6 quantum drops that to ~1e-9, and skipping the second
  * rounding removes the half-boundary amplification entirely. The
  * argmax over classes is computed on the exact decimals with a
  * deterministic (score DESC, label ASC) tie-break.
  */
object ClassifyOps {

  /** FIT: multinomial Naive Bayes with additive smoothing over
    * whitespace tokens. Model rows, one frame:
    *
    *  - (`_label`, `_tok`, `_lp`, null): log P(tok | label) =
    *    log((count(tok, label) + s) / (total(label) + s·V)) for every
    *    token OBSERVED in that class (DECIMAL(20,6), see above); V is
    *    the GLOBAL vocabulary size, so unobserved-in-class and
    *    out-of-vocabulary tokens both take the class default below —
    *    exactly the additive-smoothing mass;
    *  - (`_label`, null, `_lp`, `_prior`): the class default row —
    *    `_lp` = log(s / (total(label) + s·V)) for absent tokens and
    *    `_prior` = log(docs(label) / docs) in the same DECIMAL(20,6)
    *    discipline.
    *
    * Scale shape: one token-stream aggregation on (label, token), then
    * class-sized frames; the model is vocabulary × observed-classes
    * rows — model-sized, never corpus-sized.
    */
  def nbFit(df: DataFrame, textCol: String, labelCol: String,
      smoothing: Double = 0.5): DataFrame = {
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    val toks = df.select(col(labelCol).as("_label"),
        explode(TextOps.tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
    val counts = toks.groupBy(col("_label"), col("_tok"))
      .agg(count(lit(1)).as("_cnt"))
    val totals = counts.groupBy(col("_label")).agg(sum(col("_cnt")).as("_total"))
    val vocabSize = counts.agg(
      count_distinct(col("_tok")).as("_v"))
    val priors = df.groupBy(col(labelCol).as("_label"))
      .agg(count(lit(1)).as("_docs"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("_n"))))
      .select(col("_label"),
        log(col("_docs").cast(DoubleType) / col("_n"))
          .cast(DecimalType(20, 6)).as("_prior"))
    val tokenRows = counts
      .join(totals, Seq("_label"))
      .crossJoin(broadcast(vocabSize))
      .select(col("_label"), col("_tok"),
        log((col("_cnt") + lit(smoothing)) /
          (col("_total") + lit(smoothing) * col("_v")))
          .cast(DecimalType(20, 6)).as("_lp"),
        lit(null).cast(DecimalType(20, 6)).as("_prior"))
    val defaultRows = totals
      .crossJoin(broadcast(vocabSize))
      .join(priors, Seq("_label"))
      .select(col("_label"), lit(null).cast(StringType).as("_tok"),
        log(lit(smoothing) / (col("_total") + lit(smoothing) * col("_v")))
          .cast(DecimalType(20, 6)).as("_lp"),
        col("_prior"))
    tokenRows.unionByName(defaultRows)
  }

  /** SCORE: per (document, class) joint log-likelihood under a FROZEN
    * [[nbFit]] model. Output: (`idCol`, `_label`, `n_tokens`, `score`)
    * with `score` = prior + Σ count(tok)·logP(tok | label) as an EXACT
    * decimal.
    *
    * Scale shape: the corpus token stream is aggregated to per-document
    * DISTINCT token counts first (one shuffle on (id, token) — repeated
    * tokens never multiply the join), then expanded by the #classes-row
    * broadcast class list, then left-joined against the model's token
    * rows. The model-side join carries NO broadcast hint: at test scale
    * AQE broadcasts it (the doc-token frame shuffles nowhere), and a
    * web-scale vocabulary degrades to a shuffle join instead of failing
    * — [[TextOps.unigramScoreWith]]'s graceful-degradation trade. The
    * class-default side IS hint-broadcast (#classes rows, never big).
    *
    * Documents with no tokens (empty or NULL text) carry no evidence
    * and are absent from the output — the same drop contract as
    * [[TextOps.unigramLogProb]] and [[BpeOps.bpeEncode]]'s join. */
  def nbScoreWith(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    // The model frame is consumed TWICE below (token rows + class
    // rows), and when the caller composes an in-plan nbFit the fit
    // subtree re-evaluates through each reference — measured 13 corpus
    // scans / 22 exchanges for fit+classify in one plan at sf0.01.
    // The model is vocabulary-sized, so one eager materialization
    // collapses that to a single fit evaluation (~3 scans: the token
    // aggregation, its reused exchange, the pruned priors scan); for
    // the frozen-reload path it is a cheap no-op-sized copy.
    val m = TextOps.materializeUnlessLeaf(model)
    val docTok = df
      .select(col(idCol), explode(TextOps.tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
      .groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).as("_cnt"))
    val tokenRows = m.filter(col("_tok").isNotNull)
      .select(col("_label"), col("_tok"), col("_lp"))
    val classRows = m.filter(col("_tok").isNull)
      .select(col("_label"), col("_lp").as("_default_lp"),
        col("_prior"))
    docTok
      .crossJoin(broadcast(classRows))
      .join(tokenRows, Seq("_tok", "_label"), "left")
      .withColumn("_lp_eff", coalesce(col("_lp"), col("_default_lp")))
      .groupBy(col(idCol), col("_label"), col("_prior"))
      .agg(sum(col("_cnt")).as("n_tokens"),
        // _cnt enters the product as DECIMAL(10,0), NOT BIGINT: a
        // BIGINT factor is DECIMAL(20,0), the product's precision
        // 20+20+1 = 41 exceeds 38, and Spark's precision-loss rule
        // then SHRINKS the scale — truncated products that drift from
        // the oracle's exact decimals (measured 2e-6 on sf0.01).
        // DECIMAL(10,0)×DECIMAL(20,6) = DECIMAL(31,6): exact.
        sum(col("_cnt").cast(DecimalType(10, 0)) * col("_lp_eff")).as("_ll"))
      .select(col(idCol), col("_label"), col("n_tokens"),
        (col("_prior") + col("_ll")).as("score"))
  }

  /** CLASSIFY: argmax class per document over [[nbScoreWith]] scores.
    * Output: (`idCol`, `pred_label`, `n_tokens`, `neg_ll`) where
    * `neg_ll` = −score cast to double with NO rounding — the score is
    * already an exact multiple of 1e-6 (see the fit-time quantization
    * note above), and a correctly-rounded decimal→double conversion of
    * the same value is bit-identical in every engine; divide by
    * `n_tokens` downstream if a length-normalized score is wanted.
    * Two earlier cuts (double division then round; scale-9 decimals
    * then round) both produced real cross-engine 6th-decimal
    * mismatches at sf0.01 — presentation-time rounding of accumulated
    * transcendentals is inherently half-boundary-flaky. The argmax
    * itself is min(struct(−score, label)) on exact decimals: score
    * DESC, then label ASC on ties — bit-deterministic, no window. */
  def nbClassifyWith(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    nbScoreWith(df, idCol, textCol, model)
      .groupBy(col(idCol))
      .agg(min(struct((-col("score")).as("_neg"), col("_label").as("_l"),
        col("n_tokens").as("_n"))).as("_best"))
      .select(col(idCol),
        col("_best._l").as("pred_label"),
        col("_best._n").as("n_tokens"),
        col("_best._neg").cast(DoubleType).as("neg_ll"))
}
