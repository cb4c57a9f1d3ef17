package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus retrieval (north-star extension): BM25 keyword search and
  * TF-IDF keyword extraction over the `documents` table — the classic
  * IR tier a training-data pipeline uses for targeted corpus slicing
  * ("pull every doc about X for the ablation set") and for per-doc
  * keyword metadata. Follows the repo's frozen fit/score contract
  * ([[graft.ops.TextOps.unigramLmFit]], [[ClassifyOps.nbFit]]): the fit
  * half produces one small persistable model frame of corpus
  * statistics; the score half consults ONLY that frame, so a query
  * scores identically against a model fit yesterday and reloaded.
  *
  * Decimal discipline (the [[ClassifyOps]] contract): IDF — the only
  * transcendental — is quantized to DECIMAL(20,6) ONCE at fit time and
  * never re-rounded. Score-time arithmetic starts from exact inputs
  * (the quantized decimal, integer tf/dl/N/T) so both engines compute
  * BIT-IDENTICAL doubles, and the BM25 score is presented as that raw
  * double with NO further rounding: every IEEE +,×,/ on identical
  * inputs is identical cross-engine, whereas re-quantizing the weight
  * would reintroduce a decimal grid whose half-boundaries BM25's
  * ratios systematically hit — with tf, dl, N, T small integers the
  * ratio is often a terminating rational (measured while building the
  * fixture: idf 0.470004 × ratio 1.375 = 0.6462555 exactly; Spark's
  * exact-binary-expansion HALF_UP rounds it to .646255, DuckDB's
  * scaled-multiply round to .646256 — a guaranteed mismatch, the same
  * class as the two rejected [[ClassifyOps]] presentation designs).
  * The per-doc score is therefore a FIXED-ORDER expression sum over
  * the (deduplicated, ordered) query terms — never a row-set SUM whose
  * accumulation order an engine may choose. TF-IDF weights never touch
  * doubles at all: DECIMAL(20,6) idf × integer tf is exact decimal
  * multiplication.
  */
object SearchOps {

  private val IdfType = DecimalType(20, 6)

  /** FIT half: corpus statistics for BM25 / TF-IDF — one row per token
    * (`_tok`, `_df` docs containing it, `_idf` DECIMAL(20,6)) plus ONE
    * null-token stats row carrying `_n_docs` (docs with ≥1 token) and
    * `_total_toks` (corpus token count), the pair behind BM25's average
    * document length. IDF uses the non-negative Robertson/Lucene form
    * `ln(1 + (N − df + 0.5)/(df + 0.5))`, quantized once (see object
    * doc). The model is vocabulary-sized, plain columnar, persists to
    * parquet and reloads anywhere — the [[SimilarityOps]] IVF
    * fit/query pattern applied to retrieval.
    *
    * Scale shape: token explode → one distinct-(doc,token) aggregation
    * → one per-token count — groupBy plans end to end, nothing
    * driver-side, no all-pairs anything. */
  def bm25Fit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("_id"),
        explode(TextOps.tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
    // one (doc, token) row per containing doc: df counts and the stats
    // row's N both derive from this deduplicated frame
    val docTok = toks.groupBy(col("_id"), col("_tok"))
      .agg(count(lit(1)).as("_tf"))
    val stats = docTok.agg(
      countDistinct(col("_id")).as("_n_docs"),
      sum(col("_tf")).as("_total_toks"))
    val dfCounts = docTok.groupBy(col("_tok"))
      .agg(count(lit(1)).as("_df"))
    dfCounts.crossJoin(broadcast(stats))
      .select(col("_tok"), col("_df"),
        log(lit(1.0) + ((col("_n_docs") - col("_df")) + lit(0.5)) /
            (col("_df") + lit(0.5)))
          .cast(IdfType).as("_idf"),
        lit(null).cast(LongType).as("_n_docs"),
        lit(null).cast(LongType).as("_total_toks"))
      .unionByName(stats.select(
        lit(null).cast(StringType).as("_tok"),
        lit(null).cast(LongType).as("_df"),
        lit(null).cast(IdfType).as("_idf"),
        col("_n_docs"), col("_total_toks")))
  }

  /** [[bm25Fit]] re-derived FROM a [[bm25Postings]] frame instead of
    * the raw corpus (r17, guide §1.2 — don't tokenize the corpus
    * twice): the postings grain (doc, dl, term, tf) already carries the
    * distinct (doc, term) rows bm25Fit aggregates, so a caller that
    * builds the index AND the model pays ONE tokenize+aggregate pass
    * and derives both from it. Output is row-for-row the bm25Fit frame
    * (same types, same idf quantization — the docTok multiset is
    * identical because `dl` is functionally dependent on the doc). At
    * 100 TB this is the production shape the postings scaladoc
    * promises: stage the postings parquet once, derive model + serve
    * queries from it, corpus never re-tokenized. */
  def bm25FitFromPostings(postings: DataFrame, idCol: String): DataFrame = {
    val docTok = postings.select(col(idCol).as("_id"), col("_tok"), col("_tf"))
    val stats = docTok.agg(
      countDistinct(col("_id")).as("_n_docs"),
      sum(col("_tf")).as("_total_toks"))
    val dfCounts = docTok.groupBy(col("_tok"))
      .agg(count(lit(1)).as("_df"))
    dfCounts.crossJoin(broadcast(stats))
      .select(col("_tok"), col("_df"),
        log(lit(1.0) + ((col("_n_docs") - col("_df")) + lit(0.5)) /
            (col("_df") + lit(0.5)))
          .cast(IdfType).as("_idf"),
        lit(null).cast(LongType).as("_n_docs"),
        lit(null).cast(LongType).as("_total_toks"))
      .unionByName(stats.select(
        lit(null).cast(StringType).as("_tok"),
        lit(null).cast(LongType).as("_df"),
        lit(null).cast(IdfType).as("_idf"),
        col("_n_docs"), col("_total_toks")))
  }

  /** SCORE half: global BM25 top-k for a literal query against a FROZEN
    * [[bm25Fit]] model.
    *
    * The corpus side is a ZERO-SHUFFLE column program: per-doc `tf` for
    * each query term and `dl` are array expressions over the tokenized
    * text (`size(filter(toks, …))`), the ≤|query| model rows collapse
    * to ONE broadcast row (idf per term as a pivoted column), and the
    * global top-k is `orderBy(…).limit(k)` — TakeOrderedAndProject, a
    * per-partition heap + driver merge of k rows. At 100 TB the plan is
    * scan → codegen'd projection → top-k: no Exchange anywhere
    * (plan-asserted in SearchOpsSpec), the shape brute-force retrieval
    * should have. Query terms are deduplicated; docs matching no term
    * are filtered before the heap. Ties break (score DESC, id ASC).
    *
    * Per-term weight: `idf · (tf·(k1+1)) / (tf + k1·(1−b + b·dl·N/T))`
    * — evaluated in doubles from exact inputs with a fixed
    * parenthesization the oracle restates token-for-token; the doc
    * score is the fixed-order expression sum of the per-term weights,
    * presented as the raw double (see object doc for why any rounding
    * here is a guaranteed cross-engine mismatch, not a tail risk). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25TopK: empty query")
    require(k > 0, s"bm25TopK: k must be > 0, got $k")
    val terms = query.distinct
    // ≤|query| model rows + the stats row, pivoted into ONE broadcast
    // row: _idf_i per term (null ⇒ term not in corpus ⇒ weight 0), N, T
    val summaryCols =
      max(col("_n_docs")).as("_n_docs") +:
      max(col("_total_toks")).as("_total_toks") +:
      terms.zipWithIndex.map { case (t, i) =>
        max(when(col("_tok") === t, col("_idf"))).as(s"_idf_$i")
      }
    val summary = model
      .filter(col("_tok").isNull || col("_tok").isin(terms: _*))
      .agg(summaryCols.head, summaryCols.tail: _*)
    val toked = docs
      .select(col(idCol), TextOps.tokenize(col(textCol)).as("_toks"))
      .select(col(idCol),
        filter(col("_toks"), x => length(x) > 0).as("_toks"))
      .crossJoin(broadcast(summary))
      .withColumn("_dl", size(col("_toks")).cast(LongType))
    val withTf = terms.zipWithIndex.foldLeft(toked) { case (d, (t, i)) =>
      d.withColumn(s"_tf_$i",
        size(filter(col("_toks"), x => x === lit(t))).cast(LongType))
    }
    // weight_i — fixed shape; the oracle SQL must restate it verbatim:
    //   idf * ((tf * (k1 + 1.0)) /
    //          (tf + k1 * ((1.0 - b) + ((b * dl) * N) / T)))
    // raw double, NO rounding (object doc), absent/unmatched term → 0.0
    def weight(i: Int): Column = {
      val tf = col(s"_tf_$i")
      val ratio = (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * ((lit(1.0) - lit(b)) +
          ((lit(b) * col("_dl")) * col("_n_docs")) / col("_total_toks")))
      when(tf > 0 && col(s"_idf_$i").isNotNull,
        col(s"_idf_$i").cast(DoubleType) * ratio)
        .otherwise(lit(0.0))
    }
    // fixed-order left-associated sum — the oracle restates this exact
    // association; a row-set SUM would leave the accumulation order to
    // the engine
    val score = terms.indices.map(weight).reduce(_ + _)
    val nMatched = terms.indices
      .map(i => when(col(s"_tf_$i") > 0 && col(s"_idf_$i").isNotNull, 1)
        .otherwise(0))
      .reduce(_ + _)
    withTf
      .withColumn("score", score)
      .withColumn("n_matched", nMatched.cast(IntegerType))
      .filter(col("n_matched") > 0)
      .select(col(idCol), col("score"), col("n_matched"),
        col("_dl").as("dl"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** SCORE half, query-TABLE form: per-query BM25 top-k for a BATCH of
    * queries against a FROZEN [[bm25Fit]] model — the shape an ablation
    * pipeline actually runs ("slice the corpus for these 200 topics"),
    * where [[bm25TopK]]'s literal-query design would re-plan per query.
    * ONE logical plan regardless of query count: queries are DATA, not
    * plan structure.
    *
    * Scale shape: query terms explode and join the model ONCE (the
    * vocabulary-sized idf frame — AQE broadcasts it, degrading to a
    * shuffle join over the [[graft.ops.TextOps.unigramScoreWith]]
    * trade); the corpus side is the (doc, term, tf) postings
    * aggregation with dl riding the groupBy keys; postings join query
    * terms on term (the postings-list walk, restated as one shuffle
    * join bounded by Σ_q |matched postings|, NOT corpus × queries);
    * per-query top-k is the rank-filter shape that plans through the
    * two-phase TopKPerKey strategy (map-side heaps bound the Exchange
    * to ≤ queries×k rows).
    *
    * Determinism: same per-term weight IEEE sequence as [[bm25TopK]],
    * but the per-(query,doc) sum ranges over a DATA-dependent term set,
    * so the fixed-order discipline becomes: collect the (term, weight)
    * pairs, sort by term, left-fold from +0.0 — an accumulation order
    * both engines can restate exactly (DuckDB:
    * `list_reduce(list(w ORDER BY term), (a,b) -> a+b)`; the +0.0 seed
    * is exact because Robertson IDF ≥ 0 ⇒ weights > 0). Matches
    * [[bm25TopK]] bit-exactly when the literal query's terms are given
    * in ascending order (property-tested). OOV terms drop at the model
    * join — zero weight, as in the literal form; a query with no
    * in-vocabulary term yields no rows. Ties break (score DESC, id
    * ASC). Output: (qidCol, idCol, rank, score, n_matched, dl). */
  def bm25TopKBatch(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKBatchOnPostings(bm25Postings(docs, idCol, textCol), idCol,
      model, queries, qidCol, qTextCol, k, k1, b)

  /** INDEX half of [[bm25TopKBatch]]: the (doc, dl, term, tf) postings
    * frame — the inverted index as a first-class columnar table. `dl`
    * is functionally dependent on the doc id, so carrying it in the
    * groupBy keys is free (no second shuffle to re-attach document
    * length). Persists to parquet and reloads anywhere — at 100 TB
    * this IS the production shape: build the index once (one
    * tokenize + one aggregation over the corpus), then serve every
    * query batch, evaluation sweep, and expansion round off the staged
    * postings instead of re-tokenizing the corpus per consumer. */
  def bm25Postings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol),
        filter(TextOps.tokenize(col(textCol)), x => length(x) > 0).as("_toks"))
      .select(col(idCol), size(col("_toks")).cast(LongType).as("_dl"),
        explode(col("_toks")).as("_tok"))
      .groupBy(col(idCol), col("_dl"), col("_tok"))
      .agg(count(lit(1)).as("_tf"))

  /** SCORE half of [[bm25TopKBatch]] against a prebuilt
    * [[bm25Postings]] frame (typically a staged parquet reload):
    * identical plan and bit-identical output to the composed form —
    * the postings grain is deterministic and parquet round-trips
    * LONG/STRING exactly, so serving off the staged index is a pure
    * scan swap, never a semantic one. */
  def bm25TopKBatchOnPostings(postings: DataFrame, idCol: String,
      model: DataFrame, queries: DataFrame, qidCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"bm25TopKBatchOnPostings: k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    // the model is referenced TWICE (idf rows + the stats row): a
    // composed in-plan bm25Fit would re-run its corpus aggregations
    // under each filter, so materialize it once — a frozen reloaded
    // model is a leaf and passes through untouched
    val m = TextOps.materializeUnlessLeaf(model)
    val qterms = queries.select(col(qidCol).as("_qid"),
        explode(array_distinct(
          filter(TextOps.tokenize(col(qTextCol)), x => length(x) > 0)))
          .as("_tok"))
    val qidf = qterms.join(
      m.filter(col("_tok").isNotNull).select(col("_tok"), col("_idf")),
      Seq("_tok"))
    val stats = m.filter(col("_tok").isNull)
      .select(col("_n_docs"), col("_total_toks"))
    // per-(query, doc, term) weight — the bm25TopK IEEE sequence
    // verbatim; inner joins guarantee tf > 0 and idf non-null
    val weighted = postings.join(qidf, Seq("_tok"))
      .crossJoin(broadcast(stats))
      .withColumn("_w",
        col("_idf").cast(DoubleType) *
          ((col("_tf") * (lit(k1) + lit(1.0))) /
            (col("_tf") + lit(k1) * ((lit(1.0) - lit(b)) +
              ((lit(b) * col("_dl")) * col("_n_docs")) / col("_total_toks")))))
    weighted
      .groupBy(col("_qid"), col(idCol), col("_dl"))
      .agg(sort_array(collect_list(struct(col("_tok").as("t"),
        col("_w").as("w")))).as("_ws"))
      .withColumn("score",
        aggregate(col("_ws"), lit(0.0), (acc, x) => acc + x.getField("w")))
      .withColumn("n_matched", size(col("_ws")).cast(IntegerType))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("_qid"))
          .orderBy(col("score").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("_qid").as(qidCol), col(idCol), col("rank"),
        col("score"), col("n_matched"), col("_dl").as("dl"))
  }

  /** Per-doc TF-IDF keyword extraction: the top `kPerDoc` terms of each
    * document by `idf × tf`, against a FROZEN [[bm25Fit]] model.
    * RANKING is exact decimal arithmetic — DECIMAL(20,6) idf times the
    * integer term frequency, pinned to DECIMAL(30,6) so no digit is
    * lost — with ties broken (weight DESC, token ASC). The PRESENTED
    * weight is that exact decimal cast to DOUBLE: a precision-30
    * decimal output is int128-backed in Arrow/DuckDB and downstream
    * hashers disagree on its representation even when every value and
    * declared type match, while decimal→float64 is bit-determined on
    * both engines. Same internal-exact / double-presented convention
    * as every other wide-decimal pipeline in this repo.
    *
    * Scale shape: explode → one (doc,token) count aggregation → model
    * join (no hint: AQE broadcasts a vocabulary-sized model, an
    * over-limit one degrades to a shuffle join instead of failing — the
    * [[graft.ops.TextOps.unigramScoreWith]] trade) → per-doc rank
    * filter, which plans through the two-phase TopKPerKey strategy
    * (map-side heaps bound the Exchange to ≤ docs×kPerDoc rows). Tokens
    * absent from the model (OOV under a frozen vocabulary) carry no
    * corpus statistic and are skipped — the inner join IS the filter. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, kPerDoc: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextOps.tokenize(col(textCol))).as("_tok"))
      .filter(length(col("_tok")) > 0)
      .groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).as("tf"))
    tfIdfRank(tf, idCol, model, kPerDoc)
  }

  /** [[tfIdfTopTerms]] served from a prebuilt [[bm25Postings]] frame
    * (r17, guide §1.2): the postings grain already carries the
    * (doc, term, tf) rows the tf aggregation recomputed from raw text —
    * a caller that stages the index once derives model AND keyword
    * extraction from it with zero extra corpus passes. Bit-identical
    * output (`dl` is functionally dependent on the doc id, so dropping
    * it leaves the same (doc, term, tf) multiset). */
  def tfIdfTopTermsOnPostings(postings: DataFrame, idCol: String,
      model: DataFrame, kPerDoc: Int): DataFrame =
    tfIdfRank(postings.select(col(idCol), col("_tok"), col("_tf").as("tf")),
      idCol, model, kPerDoc)

  private def tfIdfRank(tf: DataFrame, idCol: String,
      model: DataFrame, kPerDoc: Int): DataFrame = {
    require(kPerDoc > 0, s"tfIdfTopTerms: kPerDoc must be > 0, got $kPerDoc")
    import org.apache.spark.sql.expressions.Window
    tf.join(model.filter(col("_tok").isNotNull)
        .select(col("_tok"), col("_idf")), Seq("_tok"))
      .withColumn("weight",
        (col("_idf") * col("tf").cast(DecimalType(10, 0)))
          .cast(DecimalType(30, 6)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("weight").desc, col("_tok"))))
      .filter(col("rank") <= kPerDoc)
      .select(col(idCol), col("rank"), col("_tok").as("term"),
        col("tf"), col("weight").cast(DoubleType).as("weight"))
  }

  /** Offline retrieval evaluation — the metrics harness every search /
    * RAG pipeline runs against a judged set before shipping a ranking
    * change: per query at cutoff `k`, precision@k, recall@k, MRR's
    * reciprocal rank, and binary-gain nDCG@k (Järvelin & Kekäläinen
    * 2002). Works on ANY (qid, id, rank) frame — BM25, dense, or the
    * [[rrfFuse]] output — against a binary relevance table.
    *
    * Determinism: the only transcendental is the rank discount
    * 1/log2(pos+1), computed ONCE per position 1..k on a k-row literal
    * frame and quantized DECIMAL(20,9) (the unigram-logprob / psi
    * discipline — a ≤1-ulp libm disagreement rounds away at 9
    * decimals); DCG and IDCG are then EXACT decimal sums over that
    * frozen table (never a row-order double sum), and each presented
    * metric ends in at most ONE IEEE division of exact inputs. IDCG
    * sums the top min(n_rel, k) discounts (the binary-gain ideal).
    *
    * Conventions: reciprocal rank is 0.0 when no relevant doc is
    * retrieved (the MRR summand convention); recall@k and nDCG@k are
    * NULL when the query has NO relevant docs at all (undefined, not
    * 0 — a judged set that misses a query entirely should surface as
    * NULL, never as a genuine zero). Queries absent from `ranking`
    * (retrieved nothing) emit no row — the caller's join decides the
    * reporting convention.
    *
    * Scale shape: rank rows are ≤ queries × k by contract; relevance
    * joins on (qid, id); the discount table is a k-row broadcast; the
    * IDCG range-join is per-query × k. Nothing rescans the corpus —
    * evaluation is metadata-sized next to the retrieval that produced
    * its input. */
  def evalRanking(ranking: DataFrame, relevance: DataFrame,
      qidCol: String, idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k > 0, s"evalRanking: k must be > 0, got $k")
    val spark = ranking.sparkSession
    val disc = spark.range(1, k + 1L)
      .select(col("id").cast(IntegerType).as("_pos"),
        (lit(1.0) / log2(col("id") + lit(1))).cast(DecimalType(20, 9))
          .as("_disc"))
    val r = ranking
      .select(col(qidCol).as("_qid"), col(idCol).as("_id"),
        col(rankCol).cast(IntegerType).as("_rank"))
      .filter(col("_rank") <= k)
      .join(broadcast(disc), col("_rank") === col("_pos"))
    val rel = relevance
      .select(col(qidCol).as("_qid"), col(idCol).as("_id"), lit(1).as("_rel"))
    val perq = r.join(rel, Seq("_qid", "_id"), "left")
      .groupBy(col("_qid"))
      .agg(count(lit(1)).cast(IntegerType).as("n_ret"),
        sum(coalesce(col("_rel"), lit(0))).cast(IntegerType).as("n_hits"),
        min(when(col("_rel").isNotNull, col("_rank"))).as("_first_rel"),
        sum(when(col("_rel").isNotNull, col("_disc"))
          .otherwise(lit(null))).as("_dcg"))
    val nrel = rel.groupBy(col("_qid"))
      .agg(count(lit(1)).cast(IntegerType).as("n_rel"))
    // ideal DCG: the top min(n_rel, k) discount rows — a per-query
    // range join against the k-row broadcast table
    val idcg = nrel.join(broadcast(disc),
        col("_pos") <= least(col("n_rel"), lit(k)))
      .groupBy(col("_qid")).agg(sum(col("_disc")).as("_idcg"))
    perq
      .join(nrel.join(idcg, Seq("_qid")), Seq("_qid"), "left")
      .select(col("_qid").as(qidCol),
        col("n_ret"), coalesce(col("n_rel"), lit(0)).as("n_rel"),
        col("n_hits"),
        when(col("_first_rel").isNotNull,
          lit(1.0) / col("_first_rel")).otherwise(lit(0.0)).as("rr"),
        (col("n_hits").cast(DoubleType) / lit(k.toDouble))
          .as("precision_k"),
        when(col("n_rel") > 0,
          col("n_hits").cast(DoubleType) / col("n_rel").cast(DoubleType))
          .as("recall_k"),
        coalesce(col("_dcg"), lit(0).cast(DecimalType(20, 9)))
          .cast(DoubleType).as("dcg"),
        col("_idcg").cast(DoubleType).as("idcg"),
        when(col("n_rel") > 0 && col("_dcg").isNotNull,
          col("_dcg").cast(DoubleType) / col("_idcg").cast(DoubleType))
          .when(col("n_rel") > 0, lit(0.0))
          .as("ndcg"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the hybrid-retrieval combiner: fuse the per-query ranked lists of
    * several retrieval systems (lexical BM25, dense cosine, …) into one
    * list by `rrf(d) = Σ_s 1/(kRrf + rank_s(d))`, summing only over the
    * systems that ranked `d` at all. RRF is RANK-based by design — it
    * never reads the systems' incomparable raw scores — which is why it
    * is the default fuser in production hybrid search (Elasticsearch,
    * Vespa, every RAG stack): no score normalization to tune, robust to
    * one system's score scale drifting.
    *
    * Inputs: `(name, ranking)` pairs, each ranking a frame of
    * `(qidCol, idCol, rankCol)` rows already truncated to that system's
    * retrieval depth (a missing (query, doc) row simply contributes 0,
    * the standard truncated-list convention). Names become the output's
    * per-system rank columns (`<name>_rank`, NULL = not retrieved), the
    * per-branch provenance a relevance engineer reads first.
    *
    * Determinism: each reciprocal is ONE IEEE division of exact
    * integers (`1.0 / (kRrf + rank)`), bit-identical cross-engine, and
    * the across-systems sum is a FIXED-ORDER left-associated expression
    * sum in the callers' system order — never a row-set SUM whose
    * accumulation order an engine may choose (the [[bm25TopK]] score
    * discipline). Fused ties (e.g. two docs holding the same single
    * rank in different systems) break on (score DESC, id ASC).
    *
    * Scale shape: the inputs are already top-depth-bounded frames
    * (≤ queries × depth rows each), so the full-outer join chain on
    * (query, doc) is metadata-sized next to the corpus scans that
    * produced them — AQE broadcasts the tiny sides unhinted — and the
    * per-query fused top-k plans through the two-phase TopKPerKey
    * strategy like every ranking key. Nothing here rescans the corpus. */
  def rrfFuse(systems: Seq[(String, DataFrame)], qidCol: String,
      idCol: String, rankCol: String, kRrf: Int = 60, k: Int = 10): DataFrame = {
    require(systems.nonEmpty, "rrfFuse: no systems to fuse")
    require(systems.map(_._1).distinct.size == systems.size,
      s"rrfFuse: duplicate system names in ${systems.map(_._1)}")
    require(kRrf >= 1, s"rrfFuse: kRrf must be >= 1, got $kRrf")
    require(k > 0, s"rrfFuse: k must be > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val renamed = systems.map { case (n, df) =>
      df.select(col(qidCol), col(idCol),
        col(rankCol).cast(IntegerType).as(s"${n}_rank"))
    }
    // full-outer USING-join chain: key columns coalesce, so a doc seen
    // by any subset of systems keeps one row with NULLs for the rest
    val joined = renamed.reduce(_.join(_, Seq(qidCol, idCol), "full_outer"))
    // fixed-order left-associated sum over the declared system order —
    // the oracle restates this exact association (object-doc contract)
    val score = systems.map { case (n, _) =>
      coalesce(lit(1.0) / (lit(kRrf) + col(s"${n}_rank")), lit(0.0))
    }.reduce(_ + _)
    val nSystems = systems.map { case (n, _) =>
      when(col(s"${n}_rank").isNotNull, 1).otherwise(0)
    }.reduce(_ + _)
    joined
      .withColumn("rrf_score", score)
      .withColumn("n_systems", nSystems.cast(IntegerType))
      .withColumn("rrf_rank", row_number().over(
        Window.partitionBy(col(qidCol))
          .orderBy(col("rrf_score").desc, col(idCol))))
      .filter(col("rrf_rank") <= k)
      .select(Seq(col(qidCol), col("rrf_rank"), col(idCol),
        col("rrf_score")) ++
        systems.map { case (n, _) => col(s"${n}_rank") } :+
        col("n_systems"): _*)
  }

  /** Average precision at k (the per-query half of MAP, the other
    * headline TREC metric next to [[evalRanking]]'s nDCG): AP@k =
    * (Σ over relevant retrieved positions r_j of P@r_j) / n_rel, with
    * n_rel the query's TOTAL relevant count (trec_eval semantics — a
    * ranking that can't fit all of them in k is penalized; the
    * min(n_rel,k) variant inflates). Because every summand's position
    * is a HIT, P@r_j = j / r_j exactly (j = index among the sorted hit
    * ranks), so the whole metric is a fold of |hits| ≤ k exact small
    * rationals.
    *
    * Determinism: the per-rank divisions are IEEE-exact inputs, and the
    * sum runs as a LEFT FOLD over the SORTED hit-rank array (the
    * linearAttribution credit contract) — never a commutative double
    * aggregate whose partial order varies with partitioning. n_rel = 0
    * → NULL AP (undefined), 0 hits with n_rel > 0 → 0.0.
    *
    * Scale: one rank-limited join + one per-query aggregate; the
    * collected array is ≤ k elements by construction. */
  def averagePrecision(ranking: DataFrame, relevance: DataFrame,
      qidCol: String, idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k > 0, s"averagePrecision: k must be > 0, got $k")
    val r = ranking
      .select(col(qidCol).as("_qid"), col(idCol).as("_id"),
        col(rankCol).cast(IntegerType).as("_rank"))
      .filter(col("_rank") <= k)
    val rel = relevance
      .select(col(qidCol).as("_qid"), col(idCol).as("_id"), lit(1).as("_rel"))
    val perq = r.join(rel, Seq("_qid", "_id"), "left")
      .groupBy(col("_qid"))
      .agg(count(lit(1)).cast(IntegerType).as("n_ret"),
        sort_array(collect_list(when(col("_rel").isNotNull, col("_rank"))))
          .as("_hit_ranks"))
    val nrel = rel.groupBy(col("_qid"))
      .agg(count(lit(1)).cast(IntegerType).as("n_rel"))
    // P@r_j = j / r_j: position-in-array over the sorted hit ranks,
    // folded left-to-right — aggregate() is an ordered fold, and
    // zip_with against the index sequence mints each term once
    val terms = zip_with(
      col("_hit_ranks"),
      sequence(lit(1), greatest(size(col("_hit_ranks")), lit(1))),
      (rk, j) => j.cast(DoubleType) / rk.cast(DoubleType))
    perq.join(nrel, Seq("_qid"), "left")
      .select(col("_qid").as(qidCol), col("n_ret"),
        coalesce(col("n_rel"), lit(0)).as("n_rel"),
        size(col("_hit_ranks")).as("n_hits"),
        when(coalesce(col("n_rel"), lit(0)) > 0,
          when(size(col("_hit_ranks")) === 0, lit(0.0))
            .otherwise(
              aggregate(terms, lit(0.0), (acc, x) => acc + x) /
                col("n_rel").cast(DoubleType)))
          .as("ap"))
  }
}
