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
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
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
    // MATERIALIZE the per-row ladder output once: lineDeduped is
    // referenced three times below (the LM's token aggregation, the
    // LM's score join — unigramLogProb traverses its input twice by
    // contract — and the semi-join left side), and each reference
    // would re-run the C4 + Gopher + line-dedup string programs over
    // the corpus (measured: the e2e key's isolated min drops 9.8 s →
    // 7.6 s at sf0.1 with the ladder pinned). Same trade as the lmKept checkpoint below.
    val lineDeduped = TextOps.dedupLinesWithinDoc(gopherKept, textCol)
      .select(col(idCol), col("clean_text").as(textCol))
      .localCheckpoint()
    val lmScores = TextOps.unigramLogProb(lineDeduped, idCol, textCol)
    // MATERIALIZE the quality-filtered corpus before fuzzy dedup: the
    // dedup stage references its input ~5 times (signature build, both
    // sides of the confirm join, CC seed, final semi join), and each
    // reference would otherwise recompute the whole C4→Gopher→line-dedup
    // →LM chain including the LM's three shuffles (measured 37 s vs 4 s
    // at sf0.1). localCheckpoint truncates lineage to one in-memory scan
    // of the surviving rows — bounded by the filtered corpus size.
    val lmKept = lineDeduped.join(
      lmScores.filter(col("mean_neg_logprob") <= lmMaxNegLogProb)
        .select(col(idCol)),
      Seq(idCol), "left_semi")
      .localCheckpoint()
    val survivors = DedupOps.fuzzyDedupE2E(lmKept, idCol, textCol,
      jaccardThreshold, numHashes, bands, shingleN, normalize = normalize)
    SampleOps.assignSplits(survivors, idCol, splits)
  }
}
