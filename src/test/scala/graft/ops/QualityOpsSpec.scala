package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("hello world"), Some(2L)),
    (2L, Some(""), Some(0L)),            // fails nonempty + tokens
    (3L, None: Option[String], Some(5L)), // NULL text: fails nonempty (NULL ≠ pass)
    (4L, Some("ok"), None: Option[Long]), // NULL tokens: fails tokens
    (5L, Some("fine text"), Some(3L)))
    .toDF("id", "text", "tokens")

  private def rules = Seq(
    "text_nonempty" -> (length(col("text")) > 0),
    "tokens_positive" -> (col("tokens") > 0L))

  test("checkExpectations: NULL predicates violate; clean rows get empty array") {
    val got = QualityOps.checkExpectations(fixture, rules)
      .select($"id", $"_violations").as[(Long, Seq[String])].collect().toMap
    assert(got(1L).isEmpty && got(5L).isEmpty)
    assert(got(2L) == Seq("text_nonempty", "tokens_positive"))
    assert(got(3L) == Seq("text_nonempty"))
    assert(got(4L) == Seq("tokens_positive"))
    // pure projection: no Exchange in the plan
    val plan = QualityOps.checkExpectations(fixture, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("quarantine splits clean vs violating, preserving every row once") {
    val (clean, bad) = QualityOps.quarantine(fixture, rules)
    assert(clean.select($"id").as[Long].collect().toSet == Set(1L, 5L))
    assert(bad.select($"id").as[Long].collect().toSet == Set(2L, 3L, 4L))
    assert(clean.columns.toSeq == fixture.columns.toSeq) // annotation dropped
    assert(bad.columns.contains("_violations"))          // kept for repair
  }

  test("expectationStats values") {
    val got = QualityOps.expectationStats(fixture, rules)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      ("text_nonempty", 2L, 0.4),
      ("tokens_positive", 2L, 0.4)))
    assert(QualityOps.expectationStats(fixture.limit(0), rules)
      .collect().forall(_.getLong(1) == 0L))
  }

  test("observedExpectations: counters ride an existing action, no extra pass") {
    val (instrumented, obs) = QualityOps.observedExpectations(fixture, rules)
    // the ONLY action is this collect — the metrics piggyback on it
    assert(instrumented.collect().length == 5)
    val m = obs.get
    assert(m("__n") == 5L)
    assert(m("__v_text_nonempty") == 2L)   // ids 2 (empty), 3 (NULL)
    assert(m("__v_tokens_positive") == 2L) // ids 2 (zero), 4 (NULL)
    intercept[IllegalArgumentException] {
      QualityOps.observedExpectations(fixture, rules ++ rules.take(1))
    }
  }

  test("duplicate rule names rejected; rules must be non-empty") {
    intercept[IllegalArgumentException] {
      QualityOps.checkExpectations(fixture, rules ++ rules.take(1))
    }
    intercept[IllegalArgumentException] {
      QualityOps.expectationStats(fixture, Nil)
    }
    intercept[IllegalArgumentException] {
      QualityOps.expectationStats(fixture, rules ++ rules.take(1))
    }
  }

  test("rule names with dots survive expectationStats (no col() round-trip)") {
    val got = QualityOps.expectationStats(fixture,
      Seq("text.nonempty" -> (length(col("text")) > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("text.nonempty", 2L)))
  }
}
