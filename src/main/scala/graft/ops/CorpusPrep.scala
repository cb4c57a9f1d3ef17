package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation: the single composed pass an LLM data
  * team actually ships, chaining the individually-verified stages
  *
  *   raw docs
  *     → HTML extraction    (OPTIONAL, `htmlInput = true`:
  *                           [[TextOps.htmlExtract]] — crawl pages enter as
  *                           markup; the main-content text feeds the ladder)
  *     → C4 line rules      ([[TextOps.c4QualityFlags]]; docs keep their
  *                           retained lines, boilerplate/template docs drop)
  *     → Gopher flags       ([[TextOps.gopherQualityFlags]] over the
  *                           C4-cleaned text; corpus-statistic outliers drop)
  *     → intra-doc line dedup ([[TextOps.dedupLinesWithinDoc]]; repeated
  *                           nav/footer lines collapse to first occurrence)
  *     → unigram-LM filter  ([[TextOps.unigramLogProb]] FIT ON THE SURVIVING
  *                           corpus; docs scoring above `lmMaxNegLogProb`
  *                           mean negative log-prob drop)
  *     → fuzzy dedup        ([[DedupOps.fuzzyDedupE2E]]; near-duplicate
  *                           clusters keep their min-id member)
  *     → split assignment   ([[SampleOps.assignSplits]] keyed by the doc id,
  *                           which IS the cluster label for survivors —
  *                           cluster-mates never straddle splits because
  *                           only one member survives).
  *
  * Output: one row per surviving document — (idCol, textCol = the
  * C4+line-deduped text, split). Every stage is deterministic and
  * SQL-restatable, so the WHOLE composition is hash-verified against the
  * DuckDB oracle (catalog key `corpus_prep_e2e`), not just its pieces.
  *
  * Scale shape — nothing here adds to the audited costs of the pieces:
  * the three text stages are zero-shuffle per-row column programs; the
  * LM filter aggregates token counts (map-side combinable) and joins the
  * |vocab|-row log-prob table back without a forced broadcast; fuzzy
  * dedup is banded LSH + confirm-on-candidates + O(log n) connected
  * components; split assignment is a per-row LCG. The corpus text
  * shuffles only where fuzzy dedup's semi join requires the survivors.
  */
object CorpusPrep {

  def prepare(
      df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minLinesKept: Int = 3,
      gopherMinWords: Int = 20, gopherMaxWords: Int = 100000,
      gopherMinMeanWordLen: Double = 3.0, gopherMaxMeanWordLen: Double = 10.0,
      gopherMaxSymbolRatio: Double = 0.1, gopherMinAlphaRatio: Double = 0.8,
      gopherMinStopwords: Int = 1,
      lmMaxNegLogProb: Double = 8.0,
      // trigram shingles (fuzzyDedupE2E's default): on the C4-trimmed
      // uniform-token fixture, BIGRAM shingles made the 1-hash-per-band
      // LSH degenerate (1.28M candidate pairs from 2255 docs at sf0.1 —
      // half of all possible pairs); trigrams are distinctive enough to
      // keep the candidate set ∝ duplication (45k pairs, same survivors)
      jaccardThreshold: Double = 0.3, numHashes: Int = 64, bands: Int = 64,
      shingleN: Int = 3,
      // canonicalize signature text (NFKC + casefold + whitespace
      // collapse) before the fuzzy tier, so encoding-form variants of
      // the same document dedup instead of escaping — see
      // DedupOps.fuzzyDedupE2E's normalize seam
      normalize: Boolean = true,
      // treat textCol as raw HTML: run the main-content extraction front
      // stage first, so crawl pages enter the SAME ladder as plain text
      // (zero extra shuffles — htmlExtract is a per-row column program)
      htmlInput: Boolean = false,
      // Lineage-truncation seam (r16 verdict ask #1): the ladder's two
      // materialization points route through DedupOps.materialize —
      // RELIABLE checkpoint files on shared storage when a dir is given
      // (an executor loss mid-ladder rebuilds from the checkpoint, not
      // by replaying the whole C4→Gopher→LM chain — the
      // preemptible-cluster mode), executor-local localCheckpoint
      // otherwise (faster; fine single-node). Threaded into
      // fuzzyDedupE2E's iterative CC too, so ONE dir covers the whole
      // pipeline.
      checkpointDir: Option[String] = None,
      // FROZEN unigram-LM seam: pass a persisted TextOps.unigramLmFit
      // model to score with unigramScoreWith instead of the in-plan
      // fit — identical scores on the fit corpus (spec-pinned), but the
      // fit's token aggregation runs once at model-build time instead
      // of inside every pipeline run (the bm25/lang-id staged-model
      // class). None keeps the self-contained fused fit.
      lmModel: Option[DataFrame] = None,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    DedupOps.setupCheckpointDir(df, checkpointDir)
    val lineDeduped = ladderThroughLineDedup(df, idCol, textCol,
      minLineWords, minLinesKept,
      gopherMinWords, gopherMaxWords,
      gopherMinMeanWordLen, gopherMaxMeanWordLen,
      gopherMaxSymbolRatio, gopherMinAlphaRatio, gopherMinStopwords,
      htmlInput, checkpointDir)
    val lmScores = lmModel match {
      case Some(m) => TextOps.unigramScoreWith(lineDeduped, idCol, textCol, m)
      case None    => TextOps.unigramLogProb(lineDeduped, idCol, textCol)
    }
    // MATERIALIZE the quality-filtered corpus before fuzzy dedup: the
    // dedup stage references its input ~5 times (signature build, both
    // sides of the confirm join, CC seed, final semi join), and each
    // reference would otherwise recompute the whole C4→Gopher→line-dedup
    // →LM chain including the LM's three shuffles (measured 37 s vs 4 s
    // at sf0.1). materialize truncates lineage to one scan of the
    // surviving rows — bounded by the filtered corpus size — against
    // the reliable checkpoint dir when given, executor memory otherwise.
    val lmKept = DedupOps.materialize(
      lineDeduped.join(
        lmScores.filter(col("mean_neg_logprob") <= lmMaxNegLogProb)
          .select(col(idCol)),
        Seq(idCol), "left_semi"),
      checkpointDir)
    val survivors = DedupOps.fuzzyDedupE2E(lmKept, idCol, textCol,
      jaccardThreshold, numHashes, bands, shingleN,
      checkpointDir = checkpointDir, normalize = normalize)
    SampleOps.assignSplits(survivors, idCol, splits)
  }

  /** The per-row quality ladder through intra-doc line dedup — the
    * shared front of [[prepare]] and [[lmFitOnLadder]], extracted so
    * the frozen-LM staging path fits on EXACTLY the corpus the pipeline
    * scores (byte-identical input ⇒ identical model ⇒ identical
    * verdicts, the `lmModel` seam's contract).
    *
    * MATERIALIZES the output once: it is referenced three times
    * downstream in [[prepare]] (the LM's token aggregation, the LM's
    * score join — unigramLogProb traverses its input twice by
    * contract — and the semi-join left side), and each reference would
    * re-run the C4 + Gopher + line-dedup string programs over the
    * corpus (measured: the e2e key's isolated min drops 9.8 s → 7.6 s
    * at sf0.1 with the ladder pinned). Reliable checkpoint files when
    * `checkpointDir` is given, executor-local blocks otherwise. */
  def ladderThroughLineDedup(
      df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minLinesKept: Int = 3,
      gopherMinWords: Int = 20, gopherMaxWords: Int = 100000,
      gopherMinMeanWordLen: Double = 3.0, gopherMaxMeanWordLen: Double = 10.0,
      gopherMaxSymbolRatio: Double = 0.1, gopherMinAlphaRatio: Double = 0.8,
      gopherMinStopwords: Int = 1,
      htmlInput: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame = {
    val raw = df.select(col(idCol), col(textCol))
    val slim =
      if (htmlInput)
        TextOps.htmlExtract(raw, textCol)
          .select(col(idCol), col("content_text").as(textCol))
      else raw
    val c4Kept = TextOps.c4QualityFlags(slim, textCol, minLineWords, minLinesKept)
      .filter(col("keep") === 1)
      .select(col(idCol), col("clean_text").as(textCol))
    val gopherKept = TextOps.gopherQualityFlags(c4Kept, textCol,
        gopherMinWords, gopherMaxWords,
        gopherMinMeanWordLen, gopherMaxMeanWordLen,
        gopherMaxSymbolRatio, gopherMinAlphaRatio, gopherMinStopwords)
      .filter(col("keep") === 1)
      .select(col(idCol), col(textCol))
    DedupOps.materialize(
      TextOps.dedupLinesWithinDoc(gopherKept, textCol)
        .select(col(idCol), col("clean_text").as(textCol)),
      checkpointDir)
  }
}
