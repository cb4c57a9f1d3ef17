package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding subword tokenizer: deterministic merge training
  * over the corpus word-frequency table, and a broadcast-table encoder
  * that turns word counts into trainer-accurate SUBWORD budgets for
  * [[SampleOps.packSequences]] / [[TextOps.chunkWindows]] (whose
  * whitespace counts under-budget real sequences).
  *
  * Shape of the algorithm (Sennrich et al. 2016, the public BPE):
  *
  *  - TRAIN ([[bpeFit]]) runs on the aggregated (word, count) table —
  *    |vocab| rows, NOT the corpus — exactly like any in-memory BPE
  *    trainer; Spark holds the table so a 10⁹-word web-corpus vocab
  *    still fits. Each round counts adjacent symbol pairs (weighted by
  *    word count), merges the (count DESC, pair ASC) argmax — the tie
  *    break makes training bit-deterministic — and rewrites symbols
  *    with a leftmost-first fold. One small aggregation job per round;
  *    `localCheckpoint` truncates lineage so round R never replans
  *    rounds 1..R-1. The merge LIST (≤ numMerges entries) is the whole
  *    driver-side model, mirroring [[SimilarityOps.IvfModel]]'s
  *    offline-fit contract.
  *
  *  - ENCODE ([[wordPieces]] + [[bpeEncode]]) never iterates per token:
  *    the merge list replays as ONE nested column expression over the
  *    distinct-word table (cost ∝ |vocab| · numMerges · word length),
  *    and the corpus joins that word→n_pieces table on the word — no
  *    broadcast hint, so an over-limit vocab degrades to a shuffle join
  *    instead of failing (same rationale as TextOps.unigramLogProb).
  *    Words absent from the table (true OOV) fall back to
  *    character-count, the upper bound BPE converges from.
  *
  * No end-of-word marker is used (a documented deviation from Sennrich
  * et al.'s `</w>`: merges never cross word boundaries here because
  * encoding is per-word anyway, and boundary-free pieces keep every
  * piece a plain substring — simpler to verify in-query).
  */
object BpeOps {

  /** Leftmost-first single-merge fold: rewrite [.., a, b, ..] → [.., ab, ..].
    * A fresh merge result never re-pairs with the following symbol in
    * the same round — the standard BPE apply order. */
  private def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, typedlit(Seq.empty[String]), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && s === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Replay a trained merge list over a symbol-array column. */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (a, b)) => mergeOnce(c, a, b) }

  /** TRAIN: learn up to `numMerges` merges from `df`'s corpus. Words
    * below `minCount` don't vote (rare-word noise); training stops
    * early when the best pair's weighted count is < 2 (nothing left to
    * compress). Returns the ordered merge list — apply-order matters. */
  def bpeFit(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val words = df.select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    // post-aggregation vocab is small; a handful of partitions keeps the
    // per-round jobs cheap without serializing them onto one core
    var syms = words.withColumn("syms", split(col("word"), ""))
      .coalesce(4).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val top = syms.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          j => struct(
            element_at(col("syms"), j + 1).as("a"),
            element_at(col("syms"), j + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .take(1) // bounded: exactly one argmax row crosses to the driver
      top.headOption.filter(_.getLong(2) >= 2L) match {
        case None => done = true
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val prev = syms
          syms = syms.withColumn("syms", mergeOnce(col("syms"), a, b))
            .localCheckpoint()
          prev.unpersist()
      }
    }
    syms.unpersist()
    merges.toSeq
  }

  /** Word → (pieces, n_pieces) table for every distinct word in the
    * corpus: the broadcastable encoder table. One plan — the merge list
    * inlines as a nested fold expression, no per-round jobs. */
  def wordPieces(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .withColumn("pieces", applyMerges(split(col("word"), ""), merges))
      .withColumn("n_pieces", size(col("pieces")))

  /** ENCODE: per-document subword token count. Output: (`idCol`,
    * n_words, n_bpe_tokens); feed `n_bpe_tokens` to
    * [[SampleOps.packSequences]] as the cost column for
    * trainer-accurate sequence budgets. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      pieces: DataFrame): DataFrame =
    df.select(col(idCol), explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .join(pieces.select(col("word"), col("n_pieces")), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_pieces"), length(col("word"))).cast(LongType))
          .as("n_bpe_tokens"))
}
