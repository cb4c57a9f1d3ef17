package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece model
  * family) — the OTHER production tokenizer class beside [[BpeOps]]'s
  * merge-list tiers: instead of a greedy merge sequence, the model is a
  * piece → log-probability table and encoding picks the SEGMENTATION
  * maximizing the summed log-probability (Viterbi over the word
  * lattice). T5/ALBERT/XLNet-class pipelines train exactly this.
  *
  * Same engineering contract as [[BpeOps.bpeFit]]:
  *
  *  - TRAIN ([[unigramFit]]) runs ONE corpus-scale (word, count)
  *    aggregation, collects the budgeted POST-AGGREGATION vocab to the
  *    driver (explicit row budget, loud failure), and trains in memory:
  *    seed with all substrings up to `maxPieceLen` above `minCount`
  *    (single characters always survive — full corpus coverage), then
  *    alternate EM (lattice forward–backward per distinct word,
  *    count-weighted, fixed left-to-right order — bit-deterministic)
  *    with pruning (keep the best `pruneKeep` fraction by probability,
  *    UTF-8 tie-break) until `vocabSize` pieces remain.
  *
  *  - The MODEL is (piece, logProb DECIMAL-quantized to 1e-6) — the
  *    [[ClassifyOps.nbFit]] quantization discipline, but load-bearing
  *    for a second reason here: Viterbi runs its DP on the quantized
  *    values as EXACT LONG micro-log-units, so "the best segmentation"
  *    is an integer comparison with deterministic tie-breaks (higher
  *    score, then FEWER pieces, then the EARLIEST back pointer — i.e.
  *    the longest final piece, applied recursively), never a float
  *    race. Ties are data, not noise.
  *
  *  - ENCODE ([[unigramWordPieces]]) never touches the corpus: Viterbi
  *    is a deterministic UDF over the DISTINCT word frame (the
  *    [[BpeOps.wordPieces]] scale contract) and the corpus joins the
  *    word → pieces table. Characters absent from the vocabulary (true
  *    OOV at serve time) encode as single-char pieces at `unkLogProb`
  *    (the SentencePiece <unk> convention), so encoding is total.
  */
object UnigramLmOps {

  /** Quantum of the model's log-probabilities: 1e-6 (micro-log-units).
    * All scoring is exact integer arithmetic in this unit. */
  val LogQuantum = 1e-6

  /** Default <unk> per-character penalty, in log-prob units. More
    * negative than any trained piece by construction (trained pieces
    * are log of probabilities over a vocab far smaller than e^20). */
  val DefaultUnkLogProb: Double = -20.0

  final case class Model(pieces: Map[String, Long], maxPieceLen: Int,
      unkMicro: Long) {
    require(pieces.nonEmpty, "empty unigram vocabulary")
  }

  /** Build a [[Model]] from (piece, logProb) rows, quantizing each
    * logProb to exact micro-log-units (round half up, the decimal cast
    * convention). */
  def model(rows: Seq[(String, Double)],
      unkLogProb: Double = DefaultUnkLogProb): Model = {
    val m = rows.map { case (p, lp) =>
      require(p.nonEmpty, "empty piece in vocabulary")
      p -> math.round(lp / LogQuantum)
    }.toMap
    Model(m, rows.map(_._1.length).max, math.round(unkLogProb / LogQuantum))
  }

  // ---------------------------------------------------------------
  // Driver-side trainer
  // ---------------------------------------------------------------

  /** Lattice forward pass: total UNNORMALIZED probability mass of all
    * segmentations of `w` under piece probabilities `prob`, plus the
    * per-prefix forward masses (alpha). Probabilities, not logs: the
    * masses are sums over segmentations, and words are short enough
    * (≤ ~50 chars at the chunk grain) that underflow is not in play
    * for trainer-internal RELATIVE quantities. */
  private def forward(w: String, prob: collection.Map[String, Double],
      maxLen: Int): Array[Double] = {
    val n = w.length
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var l = 1
      val maxl = math.min(maxLen, i)
      var acc = 0.0
      while (l <= maxl) {
        val p = prob.getOrElse(w.substring(i - l, i), 0.0)
        if (p > 0.0 && alpha(i - l) > 0.0) acc += alpha(i - l) * p
        l += 1
      }
      alpha(i) = acc
      i += 1
    }
    alpha
  }

  private def backward(w: String, prob: collection.Map[String, Double],
      maxLen: Int): Array[Double] = {
    val n = w.length
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    var i = n - 1
    while (i >= 0) {
      var l = 1
      val maxl = math.min(maxLen, n - i)
      var acc = 0.0
      while (l <= maxl) {
        val p = prob.getOrElse(w.substring(i, i + l), 0.0)
        if (p > 0.0 && beta(i + l) > 0.0) acc += p * beta(i + l)
        l += 1
      }
      beta(i) = acc
      i -= 1
    }
    beta
  }

  /** TRAIN: learn a `vocabSize`-piece unigram LM from `df`'s corpus.
    * One corpus-scale (word, count) aggregation (same budget contract
    * and failure mode as [[BpeOps.bpeFit]]), then the in-memory
    * EM + prune loop over the collected vocab. Returns (piece,
    * logProb) sorted by (logProb DESC, piece ASC by UTF-8) — a
    * deterministic, directly stage-able model table. */
  def unigramFit(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, minCount: Long = 2L,
      maxVocabRows: Int = BpeOps.defaultMaxVocabRows,
      emRoundsPerPrune: Int = 2,
      pruneKeep: Double = 0.75): Seq[(String, Double)] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(pruneKeep > 0.0 && pruneKeep < 1.0,
      s"pruneKeep must be in (0,1), got $pruneKeep")
    val words = df.select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      // Words below minCount don't train AT ALL (r14, the bpeFit
      // contract — raising minCount now genuinely shrinks the collect
      // as the overflow diagnostic claims). This is a TRAINING-
      // SEMANTICS change from r13, not a pure optimization: sub-
      // minCount words previously fed substring-candidate weight, EM
      // expectation mass, and alphabet coverage. The staged model
      // regenerated and the unigram keys re-verified — their oracles
      // re-derive from the staged vocab, so correctness is unaffected;
      // only the specific fitted pieces moved.
      .filter(col("cnt") >= minCount)
    val rows = words.limit(maxVocabRows + 1)
      .collect() // driver-side model fit: budgeted post-aggregation vocab
    if (rows.length > maxVocabRows) {
      throw new IllegalStateException(
        s"UnigramLmOps.unigramFit: distinct-word vocab exceeds " +
          s"maxVocabRows=$maxVocabRows — raise minCount or the budget.")
    }
    trainInMemory(rows.map(r => (r.getString(0), r.getLong(1))),
      vocabSize, maxPieceLen, minCount, emRoundsPerPrune, pruneKeep)
  }

  /** The in-memory EM + prune loop (see [[unigramFit]]). Deterministic:
    * words iterate in UTF-8 order, EM is a fixed left-to-right float
    * chain, pruning sorts by (prob DESC, piece ASC by UTF-8). */
  private[ops] def trainInMemory(vocab: Array[(String, Long)],
      vocabSize: Int, maxPieceLen: Int, minCount: Long,
      emRoundsPerPrune: Int, pruneKeep: Double): Seq[(String, Double)] = {
    // deterministic word order regardless of shuffle partitioning
    val words = vocab.sortBy(_._1)(Ordering.comparatorToOrdering(
      (a: String, b: String) => utf8Cmp(a, b)))
    // seed candidates: substring counts (weighted by word count)
    val cand = collection.mutable.LinkedHashMap.empty[String, Double]
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val maxl = math.min(maxPieceLen, w.length - i)
        while (l <= maxl) {
          val s = w.substring(i, i + l)
          cand(s) = cand.getOrElse(s, 0.0) + c.toDouble
          l += 1
        }
        i += 1
      }
    }
    val chars = cand.keys.filter(_.length == 1).toSet
    // drop rare multi-char candidates; single chars always survive
    var probs: collection.mutable.Map[String, Double] =
      collection.mutable.LinkedHashMap(cand.iterator
        .filter { case (s, c) => s.length == 1 || c >= minCount.toDouble }
        .toSeq: _*)
    normalize(probs)
    var iter = 0
    while (probs.size > math.max(vocabSize, chars.size) && iter < 100) {
      var r = 0
      while (r < emRoundsPerPrune) { emRound(words, probs, maxPieceLen); r += 1 }
      // prune: keep all single chars + the best multi-char pieces
      val multi = probs.iterator.filter(_._1.length > 1).toArray
      val target = math.max(vocabSize - chars.size,
        math.min(multi.length, (multi.length * pruneKeep).toInt))
      val kept = multi.sortWith { case ((pa, va), (pb, vb)) =>
        if (va != vb) va > vb else utf8Cmp(pa, pb) < 0
      }.take(target)
      probs = collection.mutable.LinkedHashMap(
        (chars.iterator.map(c => c.toString -> probs(c.toString)) ++
          kept.iterator).toSeq: _*)
      normalize(probs)
      iter += 1
    }
    var r = 0
    while (r < emRoundsPerPrune) { emRound(words, probs, maxPieceLen); r += 1 }
    probs.toSeq
      .map { case (p, v) => (p, math.log(v)) }
      .sortWith { case ((pa, va), (pb, vb)) =>
        if (va != vb) va > vb else utf8Cmp(pa, pb) < 0
      }
  }

  /** One EM round in place: expected piece counts by forward–backward
    * over every word (count-weighted), then re-normalize. Pieces with
    * zero expected count keep an epsilon so single-char coverage never
    * vanishes mid-training. */
  private def emRound(words: Array[(String, Long)],
      probs: collection.mutable.Map[String, Double], maxLen: Int): Unit = {
    val expect = collection.mutable.LinkedHashMap.empty[String, Double]
    words.foreach { case (w, c) =>
      val alpha = forward(w, probs, maxLen)
      if (alpha(w.length) > 0.0) {
        val beta = backward(w, probs, maxLen)
        val z = alpha(w.length)
        var i = 0
        while (i < w.length) {
          var l = 1
          val maxl = math.min(maxLen, w.length - i)
          while (l <= maxl) {
            val s = w.substring(i, i + l)
            val p = probs.getOrElse(s, 0.0)
            if (p > 0.0) {
              val post = alpha(i) * p * beta(i + l) / z
              if (post > 0.0)
                expect(s) = expect.getOrElse(s, 0.0) + c.toDouble * post
            }
            l += 1
          }
          i += 1
        }
      }
    }
    probs.keysIterator.toSeq.foreach { p =>
      probs(p) = math.max(expect.getOrElse(p, 0.0),
        if (p.length == 1) 1e-9 else 0.0)
    }
    probs.filterInPlace((p, v) => v > 0.0 || p.length == 1)
    normalize(probs)
  }

  private def normalize(probs: collection.mutable.Map[String, Double]): Unit = {
    var z = 0.0
    probs.valuesIterator.foreach(z += _)
    if (z > 0.0) probs.keysIterator.toSeq.foreach(p => probs(p) = probs(p) / z)
  }

  private def utf8Cmp(x: String, y: String): Int = BpeOps.utf8Compare(x, y)

  // ---------------------------------------------------------------
  // Viterbi encode (exact integer DP on micro-log-units)
  // ---------------------------------------------------------------

  /** Best segmentation of `w` under `m`: maximize Σ logProb (exact
    * longs), tie-break FEWER pieces, then the earliest back pointer
    * (⇒ longest final piece, applied recursively) — total and
    * engine-free, though NOT the lexicographic piece-list order.
    * Unknown single characters take `m.unkMicro`. Returns
    * (pieces, score in micro-log-units). */
  def viterbi(w: String, m: Model): (Seq[String], Long) = {
    val n = w.length
    // best(i): (score, nPieces, backPos) for prefix of length i
    val score = Array.fill(n + 1)(Long.MinValue)
    val nPieces = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    score(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val maxl = math.min(m.maxPieceLen, i)
      while (l <= maxl) {
        val piece = w.substring(i - l, i)
        val micro =
          if (l == 1) m.pieces.getOrElse(piece, m.unkMicro)
          else m.pieces.getOrElse(piece, Long.MinValue)
        if (micro != Long.MinValue && score(i - l) != Long.MinValue) {
          val s = score(i - l) + micro
          val np = nPieces(i - l) + 1
          val better =
            s > score(i) ||
              (s == score(i) && np < nPieces(i)) ||
              (s == score(i) && np == nPieces(i) &&
                // earlier back position ⇒ LONGER last piece; the
                // deterministic third key (compares the piece lists
                // lexicographically from the right, fixed either way —
                // what matters is that it is total and engine-free)
                i - l < back(i))
          if (better) { score(i) = s; nPieces(i) = np; back(i) = i - l }
        }
        l += 1
      }
      i += 1
    }
    val out = collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) { out.prepend(w.substring(back(pos), pos)); pos = back(pos) }
    (out.toSeq, score(n))
  }

  /** Word → (pieces, n_pieces, score_micro) over the corpus's DISTINCT
    * words — the [[BpeOps.wordPieces]] scale contract: the Viterbi UDF
    * runs on the model-sized distinct frame only; the corpus encodes by
    * a join. */
  def unigramWordPieces(df: DataFrame, textCol: String, m: Model): DataFrame = {
    val words = df
      .select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
    val enc = udf((w: String) => {
      val (pieces, s) = viterbi(w, m)
      (pieces, pieces.length, s)
    })
    words.withColumn("_e", enc(col("word")))
      .select(col("word"), col("_e._1").as("pieces"),
        col("_e._2").cast(LongType).as("n_pieces"),
        col("_e._3").as("score_micro"))
  }

  /** Rebuild a [[Model]] from a staged (piece, lp_micro) parquet table
    * — the frozen-artifact serve path (the [[BpeOps.loadModel]]
    * contract): the driver reads the MODEL-SIZED table once, and a
    * batch or streaming scorer encodes through the reloaded model with
    * zero fit jobs in its plan. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String,
      unkLogProb: Double = DefaultUnkLogProb): Model = {
    val rows = spark.read.parquet(dir)
      .select(col("piece"), col("lp_micro"))
      .collect() // driver-side model reload: vocab-sized artifact table
      .map(r => r.getString(0) -> r.getLong(1))
    Model(rows.toMap, rows.map(_._1.length).max,
      math.round(unkLogProb / LogQuantum))
  }

  /** Brute-force best score over ALL segmentations of a short word —
    * the independent check [[viterbi]] is verified against (both in
    * unit tests and, via the staged table, by the SQL oracle's own
    * enumeration). Exponential; callers bound the word length. */
  def bruteForceBest(w: String, m: Model): Long = {
    def go(i: Int): Long =
      if (i == w.length) 0L
      else {
        var best = Long.MinValue
        var l = 1
        val maxl = math.min(m.maxPieceLen, w.length - i)
        while (l <= maxl) {
          val piece = w.substring(i, i + l)
          val micro =
            if (l == 1) m.pieces.getOrElse(piece, m.unkMicro)
            else m.pieces.getOrElse(piece, Long.MinValue)
          if (micro != Long.MinValue) {
            val rest = go(i + l)
            if (rest != Long.MinValue && micro + rest > best)
              best = micro + rest
          }
          l += 1
        }
        best
      }
    go(0)
  }
}
