package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations: named row-level rules
  * evaluated in one pass, with the three standard consumption shapes —
  * annotate, quarantine-split, and per-rule violation stats. The
  * engine-side counterpart of the reference's defensive validation
  * layer (README.md:1248-1282 runtime column discovery,
  * README.md:1216-1246 tolerant parsing): instead of scattering
  * per-field guards through transform code, the rules are data, the
  * checks are one projection, and the violating rows stay available
  * for repair instead of dying inside a cast.
  *
  * A rule PASSES only when its predicate evaluates to TRUE — a NULL
  * predicate (e.g. `col("x") > 0` over a NULL x) is a violation, not a
  * silent pass. That is the only defensible default for quality gates:
  * the rows most likely to break downstream are exactly the ones whose
  * checks cannot evaluate.
  */
object QualityOps {

  /** The file's central counting contract, in ONE place: a rule's
    * violation count is the sum of rows where the predicate is not
    * TRUE (NULL counts as a violation), and an empty input counts 0
    * (a bare `sum` over zero rows is NULL). */
  private def violationCount(pred: Column): Column =
    coalesce(
      sum(when(coalesce(pred, lit(false)), lit(0L)).otherwise(lit(1L))),
      lit(0L))

  private def requireWellFormed(rules: Seq[(String, Column)], fn: String): Unit = {
    require(rules.nonEmpty, s"$fn: rules must be non-empty")
    require(rules.map(_._1).distinct.size == rules.size,
      s"$fn: duplicate rule names in ${rules.map(_._1)}")
  }

  /** Annotate every row with `_violations: array<string>` — the names of
    * the rules it fails (empty array = clean). Pure per-row projection:
    * no shuffle, rules evaluate where the rows sit, one scan for any
    * number of rules. */
  def checkExpectations(
      df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    requireWellFormed(rules, "checkExpectations")
    val violated = rules.map { case (name, pred) =>
      when(coalesce(pred, lit(false)), lit(null)).otherwise(lit(name))
    }
    df.withColumn("_violations",
      filter(array(violated: _*), _.isNotNull))
  }

  /** Quarantine split: (clean rows, violating rows annotated with their
    * `_violations`). Two filters over one annotated plan — with the
    * scan shared under AQE/caching, and either side independently
    * writable (the clean stream to the table, the quarantine stream to
    * a repair location, mirroring tolerant-JSON's corrupt-record
    * channel). */
  def quarantine(
      df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val checked = checkExpectations(df, rules)
    (checked.filter(size(col("_violations")) === 0).drop("_violations"),
      checked.filter(size(col("_violations")) > 0))
  }

  /** Piggyback the expectation counters on an EXISTING action via
    * Spark's `observe` API: returns (instrumented df, observation).
    * After any action on the returned frame, `obs.get` yields
    * `__n` (rows seen) and one `__v_<rule>` violation count per rule —
    * the counters ride the job as accumulator-backed metrics, so the
    * quality gate costs ZERO extra passes over the data (vs
    * [[expectationStats]]' dedicated aggregate). This is the shape for
    * "write the table AND tell me what fraction was dirty" — one scan,
    * both outcomes. Batch only — `Observation` cannot aggregate across
    * micro-batches; streams use [[observedExpectationsStream]]. */
  def observedExpectations(
      df: DataFrame, rules: Seq[(String, Column)],
      name: String = "quality"): (DataFrame, Observation) = {
    requireWellFormed(rules, "observedExpectations")
    require(!df.isStreaming,
      "observedExpectations is batch-only (Observation cannot span " +
        "micro-batches); use observedExpectationsStream and read the " +
        "metrics from each StreamingQueryProgress")
    val obs = Observation(name)
    val metrics = expectationMetrics(rules)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Streaming twin of [[observedExpectations]]: the same counters ride
    * every micro-batch via the name-based `observe`, surfacing in
    * `StreamingQueryProgress.observedMetrics(name)` (per-batch `__n` +
    * `__v_<rule>` — the drift-alert feed a monitoring listener tails).
    * Rates are per-batch by construction; accumulate downstream if a
    * lifetime rate is wanted. */
  def observedExpectationsStream(
      df: DataFrame, rules: Seq[(String, Column)],
      name: String = "quality"): DataFrame = {
    requireWellFormed(rules, "observedExpectationsStream")
    val metrics = expectationMetrics(rules)
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  private def expectationMetrics(rules: Seq[(String, Column)]): Seq[Column] =
    count(lit(1)).as("__n") +: rules.map { case (rn, pred) =>
      violationCount(pred).as(s"__v_$rn")
    }

  /** Per-rule violation stats in ONE aggregate row-per-rule:
    * (rule, n_violations, violation_rate over all rows). Conditional
    * sums — not an explode of the violations array — so the aggregate
    * is a single partial-combined pass with k counters per task,
    * regardless of table size; nothing shuffles but the k-row result.
    * This is the dashboard/drift-alert shape: compare rates across
    * ingest batches to catch a schema or upstream regression. */
  def expectationStats(
      df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    requireWellFormed(rules, "expectationStats")
    // internal agg columns are named by INDEX, not rule name: a rule
    // called "price.positive" (or one with backticks) would otherwise
    // make the col() round-trip parse as nested-field access
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      violationCount(pred).as(s"__v_$i")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perRule = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v_$i").as("n_violations"))
    }
    one.select(explode(array(perRule: _*)).as("_r"), col("__n"))
      .select(col("_r.rule").as("rule"),
        col("_r.n_violations").as("n_violations"),
        when(col("__n") === 0L, lit(0.0))
          .otherwise(col("_r.n_violations").cast("double") / col("__n"))
          .as("violation_rate"))
  }
}
