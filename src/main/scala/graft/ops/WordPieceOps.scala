package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece subword tokenizer — the BERT-family tier (Schuster &
  * Nakajima 2012; Wu et al. 2016; the vocabulary format every BERT
  * checkpoint ships as `vocab.txt`), completing the catalog's four
  * production tokenizer families beside word-BPE ([[BpeOps.bpeFit]]),
  * byte-BPE ([[BpeOps.byteBpeFit]]) and unigram-LM
  * ([[UnigramLmOps.unigramFit]]).
  *
  *  - TRAIN ([[wordPieceFit]]): the same one-corpus-job / budgeted
  *    post-aggregation-collect contract as [[BpeOps.bpeFit]] — ONE
  *    (word, count) aggregation crosses to the driver (bounded, loud
  *    failure), then the in-memory merge loop. WordPiece differs from
  *    BPE only in the merge SCORE: instead of the most frequent pair,
  *    it merges the pair maximizing the likelihood gain
  *    count(ab) / (count(a) · count(b)) — frequent-but-predictable
  *    pairs ("th" after "t","h" both common) rank below rarer pairs
  *    whose parts only occur together. The comparison is EXACT: the
  *    two rationals cross-multiply in BigInt (counts are corpus-scale
  *    longs; a 3-count product overflows Long at ~2e6-doc scale), tie
  *    broken by merged-symbol UTF-8 bytes ASC; distinct pairs that tie
  *    on BOTH score and merged string (("x","##yz") and ("xy","##z")
  *    join identically) keep the first-counted pair — pair counts
  *    accumulate in a LinkedHashMap fed by the UTF-8-sorted word
  *    order, so even that residual tie is bit-deterministic regardless
  *    of partitioning, the [[BpeOps]] discipline.
  *
  *  - The MODEL is the ordered piece list (`vocab.txt`: one piece per
  *    line, line number = id — the HuggingFace interchange format):
  *    `[UNK]`, then the initial alphabet (word-initial chars plain,
  *    word-internal chars `##`-prefixed) UTF-8-sorted, then merged
  *    pieces in merge order. [[saveModel]]/[[loadModel]] round-trip
  *    it; the SQL oracle parses the written artifact independently.
  *
  *  - ENCODE ([[wordPieceTokens]]): greedy longest-match-first — at
  *    each position take the LONGEST vocab piece (plain at position 0,
  *    `##`-prefixed after), and if any position has no match the whole
  *    word becomes `[UNK]` (the BERT convention: unknowable words are
  *    one symbol, not a char spray). A deterministic UDF over the
  *    DISTINCT word frame only (the [[BpeOps.wordPieces]] scale
  *    contract); the corpus encodes by a join, so the per-word walk
  *    never runs per occurrence.
  *
  * Greediness is REFUTABLE, not assumed, twice over: in-plan, every
  * emitted piece is re-checked to be the longest vocab match at its
  * offset ([[longestMatchViolations]] — explode + anti-join against the
  * vocab, no UDF); cross-engine, the DuckDB oracle re-walks the greedy
  * automaton per word from the staged vocab (a best-edge table + a
  * recursive CTE) and counts words whose (n_pieces, is_unk) disagree
  * with the staged encode.
  */
object WordPieceOps {

  /** The unknown-word symbol (id 0 in the written vocab). */
  val UnkPiece = "[UNK]"

  /** Continuation prefix for word-internal pieces. */
  val ContPrefix = "##"

  /** In-memory WordPiece model: the ordered piece list (ids = index)
    * plus the derived longest-piece bound the greedy walk needs.
    * `pieceSet` excludes [UNK]. */
  final case class Model(pieces: Seq[String]) {
    val pieceSet: Set[String] = pieces.filterNot(_ == UnkPiece).toSet
    /** Longest match length in WORD CHARS (## prefix not counted). */
    val maxPieceLen: Int =
      pieceSet.map(p => p.stripPrefix(ContPrefix).length)
        .foldLeft(1)(math.max)
  }

  private def utf8Cmp(x: String, y: String): Int = BpeOps.utf8Compare(x, y)

  /** TRAIN: learn a WordPiece vocabulary of [UNK] + the alphabet + up
    * to max(0, vocabSize − alphabet) merges from `df`'s corpus. The
    * alphabet always survives (full coverage of seen chars), so a
    * vocabSize below the alphabet size yields alphabet-only — MORE
    * than vocabSize pieces, never fewer chars. Same budget contract and
    * failure mode as [[BpeOps.bpeFit]]: words below `minCount` don't
    * vote AND are filtered before the budgeted collect. Returns the
    * ordered piece list ([UNK] first — directly stage-able). */
  def wordPieceFit(df: DataFrame, textCol: String, vocabSize: Int,
      minCount: Long = 1L,
      maxVocabRows: Int = BpeOps.defaultMaxVocabRows): Seq[String] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxVocabRows >= 1 && maxVocabRows < Int.MaxValue,
      s"maxVocabRows must be in [1, ${Int.MaxValue - 1}], got $maxVocabRows")
    val words = df.select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val rows = words.limit(maxVocabRows + 1)
      .collect() // driver-side model fit: budgeted post-aggregation vocab
    if (rows.length > maxVocabRows) {
      throw new IllegalStateException(
        s"WordPieceOps.wordPieceFit: distinct-word vocab exceeds " +
          s"maxVocabRows=$maxVocabRows (minCount=$minCount) — raise " +
          "minCount (the standard trainer knob) or the budget.")
    }
    trainInMemory(rows.map(r => (r.getString(0), r.getLong(1))), vocabSize)
  }

  /** The in-memory likelihood-merge loop (see [[wordPieceFit]]).
    * Deterministic: words iterate in UTF-8 order, the argmax compares
    * exact BigInt cross-products, ties break on merged-symbol UTF-8. */
  private[ops] def trainInMemory(vocab: Array[(String, Long)],
      vocabSize: Int): Seq[String] = {
    val words = vocab.sortBy(_._1)(Ordering.comparatorToOrdering(
      (a: String, b: String) => utf8Cmp(a, b)))
    // word → current symbol sequence (first char plain, rest ##'d)
    val syms: Array[Array[String]] = words.map { case (w, _) =>
      w.toCharArray.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else ContPrefix + c
      }
    }
    val counts = words.map(_._2)
    // symbol + pair counts over the current segmentation
    def symbolCounts(): collection.mutable.LinkedHashMap[String, Long] = {
      val m = collection.mutable.LinkedHashMap.empty[String, Long]
      var i = 0
      while (i < syms.length) {
        syms(i).foreach(s => m(s) = m.getOrElse(s, 0L) + counts(i))
        i += 1
      }
      m
    }
    val alphabet = symbolCounts().keys.toArray
      .sortWith((a, b) => utf8Cmp(a, b) < 0)
    val merged = collection.mutable.ArrayBuffer.empty[String]
    val targetMerges = math.max(0, vocabSize - alphabet.length)
    /** a ## b → a##b for plain a, ##a ## ##b → ##ab. */
    def join(a: String, b: String): String = a + b.stripPrefix(ContPrefix)
    var round = 0
    var done = false
    while (round < targetMerges && !done) {
      val sc = symbolCounts()
      val pc = collection.mutable.LinkedHashMap.empty[(String, String), Long]
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        var j = 0
        while (j + 1 < s.length) {
          val k = (s(j), s(j + 1))
          pc(k) = pc.getOrElse(k, 0L) + counts(i)
          j += 1
        }
        i += 1
      }
      // argmax of count(ab)/(count(a)·count(b)), exact cross-multiply
      var best: (String, String) = null
      var bestNum = BigInt(0)
      var bestDen = BigInt(1)
      pc.foreach { case ((a, b), c) =>
        if (c >= 2L) {
          val num = BigInt(c)
          val den = BigInt(sc(a)) * BigInt(sc(b))
          val cmp =
            if (best == null) 1
            else (num * bestDen).compare(bestNum * den) match {
              case 0 => -utf8Cmp(join(a, b), join(best._1, best._2))
              case x => x
            }
          if (cmp > 0) { best = (a, b); bestNum = num; bestDen = den }
        }
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        val ab = join(a, b)
        merged += ab
        var w = 0
        while (w < syms.length) {
          val s = syms(w)
          var hit = false
          var j = 0
          while (!hit && j + 1 < s.length) {
            hit = s(j) == a && s(j + 1) == b
            j += 1
          }
          if (hit) {
            // leftmost-first single-round rewrite, the BpeOps fold
            val out = collection.mutable.ArrayBuffer.empty[String]
            var k = 0
            while (k < s.length) {
              if (k + 1 < s.length && s(k) == a && s(k + 1) == b) {
                out += ab; k += 2
              } else { out += s(k); k += 1 }
            }
            syms(w) = out.toArray
          }
          w += 1
        }
      }
      round += 1
    }
    UnkPiece +: (alphabet.toSeq ++ merged.toSeq)
  }

  /** Greedy longest-match-first encode of one word. Returns the piece
    * list — `Seq(UnkPiece)` when some position has no vocab match. */
  def greedyPieces(w: String, m: Model): Seq[String] = {
    val out = collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      var l = math.min(m.maxPieceLen, w.length - pos)
      var hit: String = null
      while (hit == null && l >= 1) {
        val cand =
          (if (pos == 0) "" else ContPrefix) + w.substring(pos, pos + l)
        if (m.pieceSet.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) return Seq(UnkPiece)
      out += hit
      pos += l
    }
    out.toSeq
  }

  /** Word → (pieces, n_pieces, is_unk) over the corpus's DISTINCT
    * words — the [[BpeOps.wordPieces]] scale contract: the greedy UDF
    * runs on the model-sized distinct frame only; the corpus encodes
    * by a join. */
  def wordPieceTokens(df: DataFrame, textCol: String, m: Model): DataFrame = {
    val words = df
      .select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
    val enc = udf((w: String) => {
      val pieces = greedyPieces(w, m)
      (pieces, pieces.length, pieces == Seq(UnkPiece))
    })
    words.withColumn("_e", enc(col("word")))
      .select(col("word"), col("_e._1").as("pieces"),
        col("_e._2").cast(LongType).as("n_pieces"),
        col("_e._3").cast(IntegerType).as("is_unk"))
  }

  /** IN-PLAN refutation of the greedy claim, no UDF: for every emitted
    * piece of every non-UNK word, enumerate the LONGER candidates at
    * the same offset (`##`-prefixed off word start) and count those
    * present in `vocabDf` (columns: `piece`). A greedy encode has zero
    * violations; a shortest-match or merge-replay encode does not.
    * Returns a 1-row frame (`n_greedy_viol`). */
  def longestMatchViolations(pieces: DataFrame, vocabDf: DataFrame,
      maxPieceLen: Int): DataFrame = {
    // (word, piece index, piece) with the piece's char offset = the
    // cumulative stripped length of the preceding pieces
    val exploded = pieces.filter(col("is_unk") === 0)
      .select(col("word"), posexplode(col("pieces")).as(Seq("idx", "piece")))
      .withColumn("plen",
        length(col("piece")) -
          when(col("idx") > 0, lit(ContPrefix.length)).otherwise(lit(0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("word")).orderBy(col("idx"))
    val withOff = exploded
      .withColumn("off",
        coalesce(sum(col("plen")).over(w) - col("plen"), lit(0L)))
    // longer candidates at the same offset, bounded by the word end.
    // sequence(a, b) DESCENDS when a > b — guard the empty case
    // explicitly or every word-final piece "matches" itself.
    val bound = least(lit(maxPieceLen),
      length(col("word")) - col("off")).cast(LongType)
    val cands = withOff
      .withColumn("cl",
        explode(when(bound >= col("plen") + 1,
          sequence(col("plen") + 1, bound))
          .otherwise(array())))
      .withColumn("cand",
        concat(when(col("idx") > 0, lit(ContPrefix)).otherwise(lit("")),
          substring(col("word"),
            (col("off") + 1).cast(IntegerType), col("cl"))))
    cands.join(vocabDf.select(col("piece").as("cand")), Seq("cand"),
        "left_semi")
      .agg(count(lit(1)).as("n_greedy_viol"))
  }

  /** Persist the model as a standard `vocab.txt` (one piece per line,
    * line number − 1 = id — the BERT/HuggingFace interchange format)
    * via the Hadoop FS API (same-backend contract as
    * [[BpeOps.saveModel]]). */
  def saveModel(spark: SparkSession, pieces: Seq[String],
      path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(pieces.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Reload a `vocab.txt` written by [[saveModel]] (or any BERT
    * checkpoint's) into the ordered piece list. */
  def loadModel(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).toSeq
  }
}
