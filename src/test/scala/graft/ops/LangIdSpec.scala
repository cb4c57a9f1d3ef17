package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // two synthetic "languages" with disjoint character inventories —
  // the trigram signal is decisive, so the model must separate them
  private def corpus = Seq(
    (0L, "aa", "ababab ababab abab"),
    (2L, "aa", "abab ababab ababab"),
    (4L, "aa", "ababab abab ab"),
    (1L, "zz", "zyzyzy zyzyzy zyzy"),
    (3L, "zz", "zyzy zyzyzy zyzyzy"),
    (5L, "zz", "zyzyzy zyzy zy")).toDF("doc_id", "lang", "text")

  test("fit + predictWith: held-out docs classify by trigram signal") {
    val model = LangIdOps.fit(corpus.filter($"doc_id" < 4), "text", "lang")
    val held = Seq((10L, "ababab ab abab"), (11L, "zyzy zyzyzy"))
      .toDF("doc_id", "text")
    val preds = LangIdOps.predictWith(
      LangIdOps.docTrigramCounts(held, "doc_id", "text"), "doc_id", model)
      .as[(Long, String)].collect().toMap
    assert(preds == Map(10L -> "aa", 11L -> "zz"), preds.toString)
  }

  test("model shape: full grid + one prior row per language") {
    val model = LangIdOps.fit(corpus, "text", "lang", buckets = 64)
    val byLang = model.groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum(when($"bucket" === -1, 1).otherwise(0)).as("n_prior"))
      .as[(String, Long, Long)].collect()
      .map { case (l, n, p) => (l, (n, p)) }.toMap
    assert(byLang == Map("aa" -> (65L, 1L), "zz" -> (65L, 1L)), byLang.toString)
    // every non-prior bucket carries a log-prob (full-grid smoothing:
    // scoring needs no default-row handling)
    assert(model.filter($"lp".isNull).count() == 0)
  }

  test("docTrigramCounts: sub-3-char docs yield no evidence rows") {
    val tiny = Seq((0L, "ab"), (1L, "abc")).toDF("doc_id", "text")
    val counts = LangIdOps.docTrigramCounts(tiny, "doc_id", "text")
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(counts == Set(1L), counts.toString)
  }

  test("determinism: refit + re-predict is bit-identical") {
    def run() = LangIdOps.predictWith(
      LangIdOps.docTrigramCounts(corpus, "doc_id", "text"), "doc_id",
      LangIdOps.fit(corpus, "text", "lang"))
      .as[(Long, String)].collect().toSet
    assert(run() == run())
  }
}
