package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, NumericType}

/** Corpus shaping for training-data pipelines: stratified sampling (mix
  * control) and token-budget sequence packing (context-window binning).
  * Both are single-pass, shuffle-minimal, deterministic under a seed.
  */
object SampleOps {

  /** Deterministic stratified sample: keep `fractions(stratum)` of each
    * stratum (Bernoulli per row, seeded hash — no shuffle at all; rows
    * are filtered where they sit). Strata absent from the map are
    * dropped, matching `DataFrameStatFunctions.sampleBy`. The standard
    * lever for rebalancing a training mix (e.g. downsample web, keep all
    * code) without materializing per-stratum tables. */
  def stratifiedSample(
      df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Cross-engine-reproducible twin of [[stratifiedSample]]: the same
    * per-stratum Bernoulli keep, but decided by [[portableUniform]] of a
    * numeric id instead of `sampleBy`'s Spark-internal RNG — so an
    * external auditor (or the DuckDB oracle) re-derives every keep
    * decision bit-for-bit in plain SQL, the same upgrade
    * [[weightedSample]]'s `portableHash` flag provides. Semantics
    * otherwise match `sampleBy`: strata absent from `fractions` are
    * dropped (their keep fraction is NULL and a NULL comparison filters
    * out), and the decision is a pure per-row expression — zero shuffle,
    * stable under any partitioning and cluster size. */
  def stratifiedSamplePortable(
      df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(fractions.nonEmpty, "stratifiedSamplePortable: fractions must not be empty")
    require(fractions.values.forall(v => v >= 0.0 && v <= 1.0),
      s"stratifiedSamplePortable: fractions must be in [0,1], got $fractions")
    requireNumeric(df, idCol, "stratifiedSamplePortable")
    // when-chain over the (small, driver-side) fractions map: strata are
    // mutually exclusive so chain order is immaterial; unlisted strata
    // fall through to the NULL default and drop
    val keepF = fractions.foldLeft(lit(null).cast(DoubleType)) {
      case (acc, (k, v)) => when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(portableUniform(col(idCol) + lit(seed)) < keepF)
  }

  /** Per-ROW weighted Bernoulli sample: keep each row with probability
    * `weightCol` (clamped to [0,1]), decided by a seeded hash of
    * `idCol` — fully deterministic (same seed + id ⇒ same decision, on
    * any cluster size or partitioning), zero shuffle (rows are filtered
    * where they sit). The training-mix lever when the keep probability
    * is per-document (e.g. a quality score), not per-stratum — the
    * row-level generalization of [[stratifiedSample]].
    *
    * The hash maps to a uniform u ∈ [0,1) via the low 30 bits (2^30
    * buckets: granularity 1e-9, unbiased for any realistic weight).
    *
    * A NULL weight keeps the row with probability `defaultWeight`
    * (default 0.0 = drop) — explicit, because a quality-score column
    * with missing values would otherwise silently drop those rows via
    * NULL-propagating comparison.
    *
    * `portableHash = true` swaps xxhash64 for [[portableUniform]] (the
    * 31-bit LCG any SQL engine evaluates bit-identically): weaker
    * mixing, but the keep decisions become cross-engine reproducible —
    * the variant an external auditor can re-derive in plain SQL.
    * Requires a numeric `idCol` (the LCG is integer arithmetic). */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String,
      seed: Long = 42L, defaultWeight: Double = 0.0,
      portableHash: Boolean = false): DataFrame = {
    require(defaultWeight >= 0.0 && defaultWeight <= 1.0,
      s"defaultWeight must be in [0,1], got $defaultWeight")
    if (portableHash) requireNumeric(df, idCol, "weightedSample(portable)")
    val buckets = 1L << 30
    val u =
      if (portableHash) portableUniform(col(idCol) + lit(seed))
      else pmod(xxhash64(col(idCol), lit(seed)), lit(buckets))
        .cast("double") / lit(buckets.toDouble)
    val w = coalesce(col(weightCol).cast("double"), lit(defaultWeight))
    df.filter(u < least(greatest(w, lit(0.0)), lit(1.0)))
  }

  /** Portable uniform hash u ∈ [0,1): a 31-bit LCG step on the id —
    * `((id * 1103515245 + 12345) mod 2^31) / 2^31` — chosen because BOTH
    * Spark and any SQL oracle (DuckDB, Trino, …) can evaluate it
    * exactly in 64-bit integer arithmetic (no engine-specific hash like
    * xxhash64), so sampling decisions built on it are cross-engine
    * reproducible bit-for-bit. Exact for |id·a| < 2^63 ⇒ ids up to
    * ~8.3e9; mix a wider id space down first if ids exceed that. Not a
    * cryptographic hash and weaker mixing than xxhash64 — fine for
    * per-row Bernoulli decisions, not for minhash-style signatures. */
  /** Guard for every [[portableUniform]] consumer: the LCG is integer
    * arithmetic, so a non-numeric id would either throw a runtime cast
    * error (ANSI) or — worse — silently turn the draw into NULLs and a
    * biased lexical ordering (non-ANSI). Fail loud at plan time. */
  private def requireNumeric(df: DataFrame, c: String, fn: String): Unit =
    require(df.schema(c).dataType.isInstanceOf[NumericType],
      s"$fn: column '$c' must be numeric (the portable LCG is integer " +
        s"arithmetic), got ${df.schema(c).dataType.simpleString}; " +
        "hash non-numeric ids to a long first (e.g. xxhash64)")

  def portableUniform(id: Column): Column = {
    val m = 1L << 31
    pmod(id.cast(LongType) * lit(1103515245L) + lit(12345L), lit(m))
      .cast(DoubleType) / lit(m.toDouble)
  }

  /** Training-mix resampling: downsample each source so the OUTPUT hits
    * the target per-source proportions, keeping the output as large as
    * the targets allow. With per-source counts n_s and target
    * proportions p_s (p summing to 1 over the sources present), the
    * largest feasible output is T = min over s of n_s / p_s; each
    * source keeps fraction f_s = T·p_s / n_s (the binding source keeps
    * everything, the over-represented ones thin down). Sources absent
    * from `targets` are dropped — the explicit contract for "not in the
    * mix".
    *
    * Everything is ONE plan: counts come from a groupBy on the source
    * column (tiny result — one row per source), T and f_s are derived
    * columns on that aggregate, and the per-row keep decision
    * broadcast-joins f_s back and compares [[portableUniform]] of the
    * id — deterministic under any partitioning, no driver-side count()
    * round trip, cross-engine reproducible (see [[portableUniform]]).
    * Expected deviation from the exact target is Bernoulli noise,
    * O(1/√n_s) per source. */
  def mixToTarget(
      df: DataFrame, sourceCol: String, idCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must not be empty")
    require(targets.values.forall(v => v > 0 && v <= 1.0),
      s"target proportions must be in (0,1], got $targets")
    requireNumeric(df, idCol, "mixToTarget")
    val sparkSession = df.sparkSession
    import sparkSession.implicits._
    val tgt = targets.toSeq.toDF(sourceCol, "_p")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .join(tgt, Seq(sourceCol)) // inner: un-targeted sources drop here
      .withColumn("_t", col("_n").cast(DoubleType) / col("_p"))
    // T = min over sources; a windowed min over the one-row-per-source
    // aggregate stays in the same (tiny) stage. The windowed count
    // guards against a TARGETED source absent from the data: its n/p
    // term would silently vanish from the min and every other source
    // would keep 100% — proportions arbitrarily far from the request
    // with no error. (If EVERY targeted source is absent the aggregate
    // is empty, no row evaluates the guard, and the output is empty —
    // loud enough by itself.)
    val fractions = counts
      .withColumn("_tmin", min(col("_t")).over(Window.partitionBy()))
      .withColumn("_nsrc", count(lit(1)).over(Window.partitionBy()))
      .select(col(sourceCol),
        when(col("_nsrc") < lit(targets.size), raise_error(concat(
          lit(s"mixToTarget: of ${targets.size} targeted sources only "),
          col("_nsrc").cast(org.apache.spark.sql.types.StringType),
          lit(" present in the data; remove absent sources from `targets` " +
            "or fix the source column"))))
          .otherwise(least(lit(1.0),
            col("_tmin") * col("_p") / col("_n").cast(DoubleType)))
          .as("_keep_f"))
    df.join(broadcast(fractions), Seq(sourceCol))
      .filter(portableUniform(col(idCol)) < col("_keep_f"))
      .drop("_keep_f")
  }

  /** Temperature resampling: downsample each source so expected kept
    * counts are proportional to n_s^alpha — the standard multilingual /
    * multi-source rebalancing rule (sampling weight ∝ count^alpha),
    * which flattens the head without starving the tail. alpha = 1 keeps
    * everything; alpha = 0 levels every source down to the smallest.
    * Unlike [[mixToTarget]] (explicit target proportions) the mix here
    * is DERIVED from the data, so no per-source configuration.
    *
    * Downsample-only by construction: f_s = (n_s / n_min)^(alpha−1)
    * with n_min the smallest source's count, so the smallest source
    * keeps fraction 1 and every other f_s < 1. Same one-plan shape as
    * [[mixToTarget]]: tiny per-source count aggregate, windowed min on
    * that aggregate, fractions broadcast back, per-row
    * [[portableUniform]] Bernoulli keep — zero driver round trips,
    * deterministic under any partitioning, cross-engine reproducible
    * (Bernoulli noise aside, kept_s / kept_min ≈ (n_s / n_min)^alpha). */
  def temperatureSample(
      df: DataFrame, sourceCol: String, idCol: String,
      alpha: Double, seed: Long = 0L): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"temperatureSample: alpha must be in [0,1], got $alpha")
    requireNumeric(df, idCol, "temperatureSample")
    val fractions = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_nmin", min(col("_n")).over(Window.partitionBy()))
      .select(col(sourceCol),
        pow(col("_n").cast(DoubleType) / col("_nmin").cast(DoubleType),
          lit(alpha - 1.0)).as("_keep_f"))
    df.join(broadcast(fractions), Seq(sourceCol))
      .filter(portableUniform(col(idCol) + lit(seed)) < col("_keep_f"))
      .drop("_keep_f")
  }

  /** Deterministic train/val/test split assignment: adds a `split`
    * column chosen by [[portableUniform]] of `keyCol` against the
    * cumulative split fractions. Keying matters: pass the DEDUP CLUSTER
    * id (from [[DedupOps.connectedComponents]]), not the document id,
    * and every member of a near-dup cluster lands in the SAME split —
    * the standard guard against train/test leakage through near
    * duplicates, which id-keyed splitting reintroduces at exactly the
    * rate the dedup pass was meant to remove. Zero shuffle (a per-row
    * expression), cross-engine reproducible, stable under
    * repartitioning and across runs.
    *
    * `splits` fractions must sum to 1 (±1e-9); the last split absorbs
    * the hash's top edge so no row is ever unassigned. A NULL key
    * raises in-plan: NULL-propagating comparisons would silently dump
    * every unkeyed row into the LAST split (inflating the eval split
    * with exactly the docs that never entered the cluster graph) —
    * coalesce the key upstream to choose their placement explicitly. */
  def assignSplits(
      df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "splits must not be empty")
    require(splits.forall(_._2 > 0), s"split fractions must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    requireNumeric(df, keyCol, "assignSplits")
    val guardedKey = when(col(keyCol).isNull, raise_error(lit(
      s"assignSplits: NULL $keyCol; coalesce the key upstream (e.g. to the " +
        "row's own id) to place unclustered rows deliberately")))
      .otherwise(col(keyCol))
    val u = portableUniform(guardedKey)
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val assigned = splits.init.zip(cumulative.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), cum), elseCol) =>
      when(u < lit(cum), lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", assigned)
  }

  /** Deterministic per-group sample: keep exactly `min(n, |group|)` rows
    * from each group, chosen by ranking the group on
    * [[portableUniform]](id) — a seedable uniform-random-without-
    * replacement draw that is reproducible cross-engine AND
    * cross-partitioning (the hash order is a property of the ids, not
    * of the scan). The balanced-subset lever when the contract is a
    * COUNT per class ("10k docs per language"), where the Bernoulli
    * samplers above can only promise an expectation.
    *
    * Plans as row_number over (group, hash, id) with an `rn ≤ n`
    * filter — exactly the shape GraftExtensions' TopKPerKey strategy
    * rewrites to a bounded per-key heap: each task keeps at most n rows
    * per group, nothing sorts the full groups, and the shuffle carries
    * only the single hash column beyond the data. `id + seed` feeds the
    * LCG, so different seeds draw different (deterministic) subsets. */
  def samplePerGroup(
      df: DataFrame, groupCol: String, idCol: String, n: Int,
      seed: Long = 0L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    requireNumeric(df, idCol, "samplePerGroup")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(portableUniform(col(idCol) + lit(seed)), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Sequence packing: assign each document to a token-budget bin within
    * its group — bin = (tokens-before-this-doc) div `budget` over a
    * (group, order) window. One shuffle on the group key, one sort; a
    * document straddling a boundary overflows its bin by at most itself
    * (greedy offset binning — the deterministic, single-pass variant of
    * first-fit packing; exact bin-capacity packing is NP-hard and
    * order-dependent). Downstream concatenation per (group, bin) yields
    * near-budget-sized training sequences.
    *
    * DETERMINISM REQUIRES A TOTAL ORDER per group: the running sum uses
    * a ROWS frame, so rows tying on `orderCol` would receive
    * partitioning-dependent cumulative sums (and therefore bins) run to
    * run. Pass `tieBreakCols` to break ties unless (groupCol, orderCol)
    * is already unique — e.g. order by ts with the doc id as tiebreaker. */
  def packSequences(
      df: DataFrame, groupCol: String, orderCol: String,
      costCol: String, budget: Long,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(groupCol))
      .orderBy((orderCol +: tieBreakCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("_cum", sum(col(costCol)).over(w))
      .withColumn("bin",
        ((col("_cum") - col(costCol)) / lit(budget)).cast(LongType))
      .drop("_cum")
  }

  /** Packing-efficiency profile over a [[packSequences]] assignment —
    * the QA aggregate a pipeline tracks on its terminal packed
    * artifact: per group, how many bins the documents packed into and
    * how much of the token capacity they actually fill. Output per
    * `groupCol`: `n_docs`, `n_bins`, `total_cost`, `capacity`
    * (= n_bins·budget), `underfill` (Σ max(0, budget − bin total):
    * capacity the trainer pads or wastes), `overflow` (Σ max(0,
    * bin total − budget): tokens beyond budget from single straddling
    * documents — greedy offset binning overflows a bin by at most the
    * straddler), and `max_bin_cost`. Every column is an exact integer
    * — no ratios, so the profile is engine-exact; fill fraction is
    * `total_cost/capacity` downstream at whatever precision the
    * dashboard wants.
    *
    * Scale shape: one aggregation to (group, bin) — the same key space
    * the packing window already shuffled on — then a group-sized
    * rollup; never a corpus-wide collect. */
  def packEfficiency(
      binned: DataFrame, groupCol: String, costCol: String,
      budget: Long, binCol: String = "bin"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    binned
      .groupBy(col(groupCol), col(binCol))
      .agg(count(lit(1)).as("_docs"),
        sum(col(costCol)).cast(LongType).as("_bin_cost"))
      .groupBy(col(groupCol))
      .agg(
        sum(col("_docs")).cast(LongType).as("n_docs"),
        count(lit(1)).as("n_bins"),
        sum(col("_bin_cost")).as("total_cost"),
        (count(lit(1)) * lit(budget)).as("capacity"),
        sum(greatest(lit(0L), lit(budget) - col("_bin_cost"))).cast(LongType)
          .as("underfill"),
        sum(greatest(lit(0L), col("_bin_cost") - lit(budget))).cast(LongType)
          .as("overflow"),
        max(col("_bin_cost")).as("max_bin_cost"))
  }

  /** Append 0-based positions to an ALREADY-ORDERED frame via
    * zipWithIndex over the sorted partitions — the [[TextOps.denseIds]]
    * shape: a range-partitioned distributed sort feeds per-partition
    * index offsets, never a partition-less window that would funnel
    * the corpus through one task. The caller owes a TOTAL order
    * (deterministic positions require it). */
  private[ops] def zipPositions(sorted: DataFrame, posCol: String): DataFrame = {
    val schema = sorted.schema.add(posCol, LongType, nullable = false)
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
  }

  /** Quality-curriculum subsetting: rank the corpus by a quality score,
    * cut the ranking into `fractions.length` EQUAL-POPULATION buckets
    * (bucket = rank·k div N — exact integer arithmetic over the rank,
    * so bucket edges are engine-exact; value-quantile edges would hang
    * bucket membership on a cross-engine ulp at every boundary), and
    * keep each row with its bucket's fraction via the [[portableUniform]]
    * coin flip — e.g. `Seq(0.1, 0.5, 1.0)` keeps 10% of the worst
    * third and all of the best. The standard quality-mix lever once a
    * scorer ([[TextOps.unigramLogProb]], [[ClassifyOps]], Gopher
    * ratios) has put a number on every document.
    *
    * Output: the input columns + `quality_bucket` (0 = lowest-quality
    * bucket), filtered to the kept rows — deterministic under any
    * partitioning and cluster size (seed-keyed LCG on the id).
    *
    * Scale shape: one range-sort shuffle for the global ranking
    * ([[deterministicShuffle]]'s zipWithIndex pattern, no
    * partition-less window), one broadcast 1-row count, then per-row
    * arithmetic. (`qualityCol`, `idCol`) must totally order the frame
    * — the id uniqueness [[deterministicShuffle]] already demands. */
  def curriculumSample(
      df: DataFrame, qualityCol: String, idCol: String,
      fractions: Seq[Double], seed: Long = 42L): DataFrame = {
    require(fractions.nonEmpty, "curriculumSample: fractions must be non-empty")
    require(fractions.forall(f => f >= 0.0 && f <= 1.0),
      s"curriculumSample: fractions must lie in [0, 1], got $fractions")
    requireNumeric(df, idCol, "curriculumSample")
    val k = fractions.length
    val ranked = zipPositions(
      df.orderBy(col(qualityCol), col(idCol)), "_rank")
    ranked
      .crossJoin(broadcast(df.agg(count(lit(1)).as("_n"))))
      .withColumn("quality_bucket",
        expr(s"(_rank * $k) div _n").cast(LongType))
      .filter(portableUniform(col(idCol) + lit(seed)) <
        element_at(typedlit(fractions),
          col("quality_bucket").cast("int") + 1))
      .drop("_rank", "_n")
  }

  /** Deterministic global corpus shuffle — the pre-training step that
    * randomizes document order reproducibly: appends `shuffle_pos`, the
    * row's position in the pseudorandom total order keyed by
    * [[portableUniform]](id + seed) with the unique id as tiebreaker.
    * Same seed ⇒ same permutation on ANY cluster size or input
    * partitioning; a different seed is a fresh epoch order.
    *
    * Scale shape: `orderBy` is a range-partitioned distributed sort (no
    * single-task global sort), and positions come from zipWithIndex over
    * the sorted partitions — the [[TextOps.denseIds]] shape — never a
    * partition-less window that would funnel the corpus through one
    * task. One shuffle total; the extra zipWithIndex job only counts
    * per-partition sizes. The LCG is exact for |id + seed| < ~8.3e9
    * (see [[portableUniform]]); mix wider id spaces down first. */
  def deterministicShuffle(
      df: DataFrame, idCol: String, seed: Long = 42L): DataFrame = {
    requireNumeric(df, idCol, "deterministicShuffle")
    zipPositions(
      df.withColumn("_sk", portableUniform(col(idCol) + lit(seed)))
        .orderBy(col("_sk"), col(idCol))
        .drop("_sk"),
      "shuffle_pos")
  }

  /** Popularity-smoothed negative sampling (the word2vec / contrastive
    * recommendation shape, Mikolov et al. 2013): each actor draws `k`
    * items from the unigram distribution raised to the 3/4 power —
    * popular items stay likely negatives, but the long tail is
    * up-weighted enough to be seen. Deterministic end to end: the
    * smoothed weight is the FIXED sequence `sqrt(sqrt(c³))` (two
    * correctly-rounded IEEE roots ≡ c^0.75 up to a reproducible
    * rounding both engines share — unlike libm `pow`, whose last-ulp
    * behavior is platform-defined), quantized ×1000 to an exact integer
    * grid, and each draw inverts the integer CDF at
    * [[portableUniform]](actor·k + draw + seed).
    *
    * Scale shape: `items` is the model side — a popularity table
    * (item, count) that must fit one window task and a broadcast, like
    * every vocabulary/model frame here (BpeOps' budgeted fit is the
    * loud-failure pattern if it can't). The cumulative CDF is ONE
    * ordered window over that small table, collapsed to two sorted
    * arrays in a 1-row frame that rides the plan as a broadcast
    * cross join (the ProfileOps scalar-frame shape). The actor side is
    * never shuffled: explode(sequence) fans each actor to k rows and
    * the CDF inversion is a per-row array prefix count — O(|items|)
    * comparisons inside codegen, no range join, no BNLJ. An item-side
    * range join replaces the array probe when the item vocabulary
    * outgrows a broadcast. */
  def popularityNegatives(
      actors: DataFrame, actorCol: String,
      items: DataFrame, itemCol: String, countCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, s"popularityNegatives: k must be > 0, got $k")
    requireNumeric(actors, actorCol, "popularityNegatives")
    val c = col(countCol).cast(DoubleType)
    val wq = floor(sqrt(sqrt(c * c * c)) * lit(1000.0)).cast(LongType)
    val weighted = items
      .filter(col(countCol) > 0 && col(itemCol).isNotNull)
      .select(col(itemCol).as("_item"), wq.as("_w"))
    // integer CDF: item i owns [cum_lo_i, cum_lo_i + w_i); the window
    // runs over the SMALL popularity table only
    val cum = weighted
      .withColumn("_lo",
        coalesce(sum(col("_w")).over(Window.orderBy(col("_item"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val cdf = cum.agg(
      sort_array(collect_list(struct(col("_lo"), col("_item")))).as("_s"),
      sum(col("_w")).as("_total"))
      .select(
        transform(col("_s"), x => x.getField("_lo")).as("_bounds"),
        transform(col("_s"), x => x.getField("_item")).as("_items"),
        col("_total"))
    val a = col(actorCol)
    actors.select(a).filter(a.isNotNull)
      .withColumn("draw", explode(sequence(lit(1), lit(k))))
      .crossJoin(broadcast(cdf))
      .withColumn("_target",
        floor(portableUniform(a * lit(k.toLong) + col("draw") + lit(seed)) *
          col("_total").cast(DoubleType)).cast(LongType))
      .withColumn("_idx",
        size(filter(col("_bounds"), b => b <= col("_target"))))
      // an empty popularity table (no positive-count items) must fail
      // with a NAMED message, not element_at's index-zero task error
      .withColumn("item",
        when(col("_idx") < 1, raise_error(lit(
          "popularityNegatives: empty popularity table — no " +
            "positive-count items to draw from")))
          .otherwise(element_at(col("_items"), col("_idx"))))
      .select(a, col("draw").cast(LongType).as("draw"), col("item"))
  }

  /** Weighted sampling WITHOUT replacement via the Gumbel-top-k trick
    * (Efraimidis & Spirakis 2006's exponential-keys scheme in its
    * Gumbel form): each row draws key = ln(w) + Gumbel(u) and the k
    * largest keys are EXACTLY a weighted sample without replacement
    * proportional to w — the DSIR scaladoc's documented-out resampling
    * half, now first-class (top-k curation stays deterministic;
    * Gumbel-top-k is the principled stochastic alternative when mix
    * diversity matters more than strict ranking).
    *
    * Determinism: u comes from the portable LCG ((id+seed)·a + c mod
    * 2³¹, shifted +0.5 so u ∈ (0,1) strictly — u = 0 would send
    * −ln(−ln u) to ∞), and BOTH transcendental terms — ln(w) and the
    * Gumbel — quantize ONCE to DECIMAL(20,9) (the unigram-logprob
    * discipline) so the ranking key is an exact decimal sum, immune to
    * cross-engine libm last-ulps. Ties (astronomically unlikely but
    * bit-decidable) break by id. Non-positive/NULL weights raise —
    * ln(w) is undefined and silently dropping rows would bias the
    * sample.
    *
    * Scale: one zero-shuffle key projection + global top-k
    * (TakeOrderedAndProject — per-partition heaps, k rows to the
    * driver merge), then a k-row window for the rank column. */
  def gumbelTopK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"gumbelTopK: k must be >= 1, got $k")
    requireNumeric(df, idCol, "gumbelTopK")
    requireNumeric(df, weightCol, "gumbelTopK")
    val m = 1L << 31
    val guarded = df.select(col(idCol).as("_id"),
      when(col(weightCol).isNull || col(weightCol) <= 0,
        raise_error(concat(lit("gumbelTopK: weight must be > 0, got "),
          col(weightCol).cast("string"))))
        .otherwise(col(weightCol)).as("_w"))
    val u = (pmod((col("_id").cast(LongType) + lit(seed)) * lit(1103515245L) +
        lit(12345L), lit(m)).cast(DoubleType) + lit(0.5)) / lit(m.toDouble)
    val key = log(col("_w").cast(DoubleType)).cast(DecimalType(20, 9)) +
      (-log(-log(u))).cast(DecimalType(20, 9))
    val top = guarded.withColumn("_gkey", key)
      .orderBy(col("_gkey").desc, col("_id")).limit(k)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("_gkey").desc, col("_id"))).cast(IntegerType))
      .select(col("rank"), col("_id").as(idCol), col("_w").as(weightCol),
        col("_gkey").cast(DoubleType).as("gumbel_key"))
  }
}
