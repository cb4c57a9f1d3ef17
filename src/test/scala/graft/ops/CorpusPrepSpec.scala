package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end corpus prep: each planted pathology is removed by exactly
  * the stage built for it, and survivors carry the cleaned text + split.
  * (The full composition is also hash-verified against the DuckDB oracle
  * via the corpus_prep_e2e catalog key; this spec pins the per-stage
  * behaviors on a corpus small enough to reason about by hand.)
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  // 30-word sentences ending in '.', ≥5 words/line, distinct stopwords,
  // alpha-heavy: pass C4 + Gopher at the test thresholds below. Vocab is
  // per-seed unique so distinct docs stay below any Jaccard threshold.
  private def goodDoc(seed: Int): String = {
    val words = (0 until 28).map(i => s"w${seed}x$i")
    s"the quick ${words.mkString(" ")}.\nthat gray fox jumps over the lazy dog of zone$seed area$seed."
  }

  private val docs = Seq(
    (0L, goodDoc(0)),                                    // survives
    (1L, goodDoc(1)),                                    // survives
    (2L, goodDoc(0)),                                    // exact dup of 0 → fuzzy dedup drops (cluster min id 0)
    (3L, goodDoc(3) + "\nsee lorem ipsum dolor sit amet."), // C4 boilerplate → dropped
    (4L, goodDoc(4) + "\nvar cfg = {"),                  // C4 brace → dropped
    (5L, "tiny doc."),                                   // too few lines/words → dropped
    (6L, { val l = goodDoc(6); l + "\n" + l.split("\n")(0) }) // repeated line → collapsed, survives
  ).toDF("doc_id", "text")

  private lazy val out = CorpusPrep.prepare(docs, "doc_id", "text",
    minLineWords = 5, minLinesKept = 2,
    gopherMinWords = 10, gopherMinStopwords = 2,
    lmMaxNegLogProb = 100.0, // LM permissive here; thresholded in the oracled key
    jaccardThreshold = 0.5).cache()

  test("boilerplate, template, short, and duplicate docs are removed") {
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(0L, 1L, 6L))
  }

  test("repeated line collapses to first occurrence in the surviving text") {
    val text6 = out.filter($"doc_id" === 6L).select("text").as[String].head()
    val lines = text6.split("\n")
    assert(lines.length === lines.distinct.length)
    assert(lines.length === 2) // both original lines kept, replant gone
  }

  test("split column is a valid assignment") {
    val splits = out.select("split").as[String].collect()
    assert(splits.forall(Set("train", "val", "test")))
  }

  test("htmlInput front stage: crawl-wrapped docs come out exactly like their plain twins") {
    // wrap each doc's lines in <p> tags plus chrome the extractor must
    // remove; the ladder downstream then sees the SAME text as `docs`
    val asHtml = docs.withColumn("text",
      concat(
        lit("<html><head><title>t</title><style>x { y: z; }</style></head><body>"),
        lit("<script>var n = 1;</script>"),
        array_join(transform(split(col("text"), "\n"),
          l => concat(lit("<p>"), l, lit("</p>"))), ""),
        lit("</body></html>")))
    val viaHtml = CorpusPrep.prepare(asHtml, "doc_id", "text",
      minLineWords = 5, minLinesKept = 2,
      gopherMinWords = 10, gopherMinStopwords = 2,
      lmMaxNegLogProb = 100.0, jaccardThreshold = 0.5, htmlInput = true)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val viaPlain = out
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(viaHtml == viaPlain,
      s"html-extracted pipeline must equal the plain pipeline:\n$viaHtml\nvs\n$viaPlain")
  }

  test("LM filter drops high-surprise docs when thresholded") {
    // with a tight threshold everything drops — the stage is live
    val strict = CorpusPrep.prepare(docs, "doc_id", "text",
      minLineWords = 5, minLinesKept = 2,
      gopherMinWords = 10, gopherMinStopwords = 2,
      lmMaxNegLogProb = 0.1, jaccardThreshold = 0.5)
    assert(strict.count() === 0L)
  }
}
