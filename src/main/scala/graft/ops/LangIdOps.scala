package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Frozen-model language identification — the staged-artifact serve
  * path the heuristic [[TextOps.langId]] tier lacked (every other
  * classifier tier here has one: NB quality, BM25, Kneser-Ney, all
  * four tokenizers). A hashed char-TRIGRAM multinomial
  * Naive Bayes: fit on the labeled split → per-(lang, bucket)
  * quantized log-probabilities over a FULL bucket grid (the
  * [[DsirOps.dsirFitFromCounts]] move — never-seen buckets get the
  * smoothing floor IN the model, so scoring is one inner join with no
  * default-row handling) → stage as parquet → score any corpus
  * through the reloaded table.
  *
  * Everything is the established portable-hash discipline:
  * char trigrams via character-based `substr`, the 31-polynomial
  * code-point fold mod 2³¹−1 ([[DsirOps.tokenHashCol]], `ord()`
  * `list_reduce` in the oracle), log-probs quantized ONCE to
  * DECIMAL(20,6) at fit time (the bm25 `_idf` convention), and the
  * per-(doc, lang) score an ORDER-FREE exact decimal sum
  * Σ tf·lp + prior — so the argmax compares exact decimals, and two
  * engines cannot disagree on a prediction.
  *
  * Scale shape: fit = one trigram explode + one (lang, bucket)
  * aggregation over the training corpus (model = langs × buckets
  * rows, parquet-able, broadcast at serve time); score = one trigram
  * explode + one (doc, bucket) aggregation joined against the
  * broadcast model — the 100 TB corpus is scanned once per pass and
  * never shuffled at the row grain.
  */
object LangIdOps {

  /** Classification priority order — ties (exact-decimal equality of
    * scores) break toward the earlier language, the
    * [[TextOps.langId]] convention. */
  val langs: Seq[String] = TextOps.langMarkers.map(_._1)

  private val LpType = DecimalType(20, 6)

  /** Hashed char-trigram bucket array (lowercased; docs shorter than
    * 3 characters yield an empty array — no evidence). Character-based
    * positions, so multibyte text trigram-izes identically to the
    * oracle's `substr`. */
  def charTrigramBuckets(text: Column, buckets: Int, seed: Long): Column = {
    val low = lower(text)
    val n = length(low)
    when(n < 3, array().cast(ArrayType(IntegerType)))
      .otherwise(transform(sequence(lit(1), n - 2),
        i => (DsirOps.tokenHashCol(low.substr(i, lit(3)), seed) % buckets)
          .cast(IntegerType)))
  }

  /** Trigram hashes over a PRE-MATERIALIZED code-point array column —
    * the declarative REFERENCE form ExpressionSpec property-tests the
    * codegen'd [[graft.expressions.TrigramBucketHash]] against (the
    * production paths call the expression): each gram is a 3-step
    * unrolled fold over adjacent entries of an attribute reference,
    * identical arithmetic (seed mod m, then (h·31 + cp) mod m per
    * char). The cps array MUST be a real column from a prior
    * projection, not an inline expression: Spark inlines a lambda-free
    * subexpression into EVERY element_at reference inside a nested
    * lambda, turning O(len) grams into O(len²) re-splits (measured
    * 4.2 s → 91 s on the roundtrip key before this was split into two
    * projections; with the materialized column it is ~1.9 s; the
    * codegen expression measures the SAME ~2 s — the remaining cost is
    * the explode + (doc, bucket) aggregation, not hashing — but drops
    * the boxed intermediate arrays and keeps the scan stage inside
    * whole-stage codegen, which is the 100 TB-relevant shape). */
  private[graft] def trigramHashesOnCps(cps: Column, buckets: Int,
      seed: Long): Column = {
    val m = EmbedOps.hashModulus
    val n = size(cps)
    when(n < 3, array().cast(ArrayType(IntegerType)))
      .otherwise(transform(sequence(lit(1), n - 2), i => {
        val h1 = (lit(seed % m) * 31L + element_at(cps, i)) % m
        val h2 = (h1 * 31L + element_at(cps, i + 1)) % m
        val h3 = (h2 * 31L + element_at(cps, i + 2)) % m
        (h3 % buckets).cast(IntegerType)
      }))
  }

  /** Per-document code-point array (lowercased) — the materialization
    * step [[trigramHashesOnCps]] requires. */
  private[graft] def cpsOf(text: Column): Column =
    transform(split(lower(text), ""), c => ascii(c).cast(LongType))

  /** Per-document trigram-bucket counts: (`idCol`, `bucket`, `_tf`) —
    * hash the corpus once, feed both fit and score from this grain. */
  def docTrigramCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 512, seed: Long = 11L): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
        explode(call_function("trigram_bucket_hash", col(textCol),
          lit(buckets), lit(seed))).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("_tf"))
  }

  /** FIT: multinomial NB with add-one smoothing over the full
    * (lang × bucket) grid, plus one prior row per language at
    * `bucket = -1`. Output: (`lang`, `bucket` INT, `lp` DECIMAL(20,6))
    * — langs×buckets + |langs| rows, parquet-able and reloadable
    * anywhere ([[SearchOps.bm25Fit]] contract).
    * `lp(lang, b) = ln((cnt + 1) / (tot_lang + buckets))`,
    * `lp(lang, −1) = ln(n_docs_lang / n_docs)` — each ONE fixed
    * double division inside one `ln`, quantized once. */
  def fit(train: DataFrame, textCol: String, langCol: String,
      buckets: Int = 512, seed: Long = 11L): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = train.sparkSession
    graft.expressions.GraftFunctions.register(train.sparkSession)
    val triCounts = train
      .select(col(langCol).as("lang"),
        explode(call_function("trigram_bucket_hash", col(textCol),
          lit(buckets), lit(seed))).as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("_cnt"))
    // bucket-grain (≤ langs×buckets rows) feeds the grid join AND the
    // per-lang totals: materialize once (the dsirFitFromCounts move)
    val tc = TextOps.materializeUnlessLeaf(triCounts)
    val tots = tc.groupBy(col("lang")).agg(sum(col("_cnt")).as("_tot"))
    val grid = spark.range(buckets.toLong)
      .select(col("id").cast(IntegerType).as("bucket"))
      .crossJoin(tots)
    val lps = grid
      .join(broadcast(tc), Seq("lang", "bucket"), "left")
      .select(col("lang"), col("bucket"),
        log((coalesce(col("_cnt"), lit(0L)) + lit(1)).cast(DoubleType) /
            (col("_tot") + lit(buckets)).cast(DoubleType))
          .cast(LpType).as("lp"))
    val docTotals = train.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("_nd"))
    val priors = docTotals
      .crossJoin(broadcast(docTotals.agg(sum(col("_nd")).as("_n"))))
      .select(col("lang"), lit(-1).cast(IntegerType).as("bucket"),
        log(col("_nd").cast(DoubleType) / col("_n").cast(DoubleType))
          .cast(LpType).as("lp"))
    lps.unionByName(priors)
  }

  /** SCORE + argmax through a FROZEN (typically parquet-reloaded)
    * [[fit]] model: per surviving document (≥ 1 trigram), the
    * priority-ordered argmax of the exact-decimal NB score. Output:
    * (`idCol`, `pred_lang`). */
  def predictWith(docCounts: DataFrame, idCol: String,
      model: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = TextOps.materializeUnlessLeaf(model)
    val prio = langs.zipWithIndex
      .foldLeft(when(lit(false), lit(0))) { case (acc, (l, i)) =>
        acc.when(col("lang") === l, lit(i))
      }.otherwise(lit(langs.size))
    val scored = docCounts
      .join(broadcast(m.filter(col("bucket") >= 0)), Seq("bucket"))
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("_tf").cast(DecimalType(10, 0)) * col("lp"))
        .cast(DecimalType(38, 6)).as("_s"))
      .join(broadcast(m.filter(col("bucket") === -1)
        .select(col("lang"), col("lp").as("_prior"))), Seq("lang"))
      .select(col(idCol), col("lang"),
        (col("_s") + col("_prior")).cast(DecimalType(38, 6)).as("score"))
    scored
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, prio.asc)))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("lang").as("pred_lang"))
  }
}
