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
  *  - TRAIN ([[bpeFit]]) runs ONE corpus-scale Spark job — the
  *    (word, count) aggregation — then collects the bounded
  *    POST-AGGREGATION vocab to the driver (explicit row budget, loud
  *    failure) and trains in memory with the classic incremental
  *    pair-count algorithm: a pair's count only changes for words that
  *    contain the merged pair, so each round touches the affected words
  *    instead of the whole vocab. That makes trainer-realistic merge
  *    counts (30k–50k) feasible — the previous all-Spark loop ran one
  *    sequential driver round-trip job PER MERGE, which is fine at 24
  *    merges and unusable at 30k. Same contract as
  *    [[SimilarityOps.pqFit]]/`ivfFit`: the collect is on an aggregated
  *    model-sized table, never the corpus; the merge LIST (≤ numMerges
  *    entries) is the whole driver-side model. Each round merges the
  *    (count DESC, pair ASC by UTF-8 bytes) argmax — the tie break
  *    makes training bit-deterministic and matches Spark's UTF8String
  *    ordering the old in-plan trainer used — and rewrites symbols with
  *    the same leftmost-first fold the encode replay applies.
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

  /** Default driver-side vocab budget for [[bpeFit]]: 2M distinct
    * post-`minCount` words ≈ low hundreds of MB of trainer state —
    * comfortable on any driver, loud long before it isn't. */
  val defaultMaxVocabRows = 2000000

  /** TRAIN: learn up to `numMerges` merges from `df`'s corpus. Words
    * below `minCount` don't vote (rare-word noise); training stops
    * early when the best pair's weighted count is < 2 (nothing left to
    * compress). Returns the ordered merge list — apply-order matters.
    *
    * One corpus-scale aggregation job; the distinct (word, count) vocab
    * then crosses to the driver. `maxVocabRows` bounds that collect: a
    * vocab over budget fails fast with a diagnostic instead of silently
    * OOMing the driver — raise `minCount` (the standard trainer knob) or
    * the budget itself. */
  def bpeFit(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L, maxVocabRows: Int = defaultMaxVocabRows): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxVocabRows >= 1 && maxVocabRows < Int.MaxValue,
      s"maxVocabRows must be in [1, ${Int.MaxValue - 1}], got $maxVocabRows")
    val words = df.select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    // limit(budget + 1): at most budget+1 rows ever materialize, so the
    // over-budget case is detected WITHOUT collecting the whole table
    val rows = words.limit(maxVocabRows + 1)
      .collect() // driver-side model fit: budgeted post-aggregation vocab
    if (rows.length > maxVocabRows) {
      throw new IllegalStateException(
        s"BpeOps.bpeFit: distinct-word vocab exceeds maxVocabRows=$maxVocabRows " +
          s"(minCount=$minCount). The trainer collects the POST-AGGREGATION " +
          "(word, count) table to the driver; an over-budget vocab would risk " +
          "driver memory. Raise minCount to shrink the voting vocab (the " +
          "standard BPE knob) or pass a larger maxVocabRows explicitly.")
    }
    trainInMemory(rows.map(r => (r.getString(0), r.getLong(1))), numMerges)
  }

  /** Unsigned lexicographic comparison of UTF-8 bytes — Spark's
    * UTF8String ordering, so the in-memory tie-break matches what the
    * previous in-plan `orderBy(a, b)` produced. Differs from Java
    * String ordering only beyond the BMP, but determinism must not
    * depend on corpus content. Shared by every driver-side tokenizer
    * trainer (BPE, unigram-LM, WordPiece) — ONE copy, so a future
    * ordering fix cannot drift between tiers. */
  private[ops] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Driver-side leftmost-first single-merge rewrite — the exact
    * in-memory twin of [[mergeOnce]]'s fold (a fresh merge result never
    * re-pairs with the following symbol in the same round). */
  private[ops] def mergeWord(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = a + b
      else out += s
      i += 1
    }
    out.toArray
  }

  /** Classic incremental BPE trainer over the collected (word, count)
    * vocab. State: pair → weighted count, pair → indices of words that
    * (at some point) contained it, and a LAZY-INVALIDATION max-heap
    * over (count, pair) snapshots for the per-round argmax. Every
    * count update pushes a fresh snapshot; the round's winner pops
    * entries until the head matches the pair's CURRENT count (stale
    * snapshots — superseded or deleted values — are discarded on
    * contact). Since every live count has a snapshot in the heap, the
    * first valid head is the true (count DESC, pair ASC-by-UTF-8)
    * argmax, with the same bit-deterministic tie-break as the previous
    * full scan. Per round: O(affected words × word length) recount
    * work + amortized O(log heap) argmax — the full-map scan this
    * replaces was Ω(|distinct pairs|) per round, which at a ~10⁶-pair
    * vocab × 50k merges dominated training time. */
  private[ops] def trainInMemory(
      vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    val syms = vocab.map { case (w, _) => w.split("").filter(_.nonEmpty) }.toArray
    val cnts = vocab.map(_._2).toArray
    val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap.empty[(String, String), scala.collection.mutable.BitSet]
    // max-heap: higher count first; count ties → UTF-8-SMALLER pair first
    val heapOrd: Ordering[(Long, String, String)] = (x, y) => {
      if (x._1 != y._1) java.lang.Long.compare(x._1, y._1)
      else {
        val ca = utf8Compare(y._2, x._2)
        if (ca != 0) ca else utf8Compare(y._3, x._3)
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    def bump(p: (String, String), delta: Long): Unit = {
      val n = pairCounts.getOrElse(p, 0L) + delta
      if (n <= 0L) pairCounts.remove(p)
      else {
        pairCounts.update(p, n)
        heap.enqueue((n, p._1, p._2))
      }
    }
    def forEachPair(i: Int)(f: ((String, String)) => Unit): Unit = {
      val s = syms(i)
      var j = 0
      while (j + 1 < s.length) { f((s(j), s(j + 1))); j += 1 }
    }
    var i = 0
    while (i < syms.length) {
      val c = cnts(i); val idx = i
      forEachPair(i) { p =>
        // initial build: counts accumulate silently, snapshots follow
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
        pairWords.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += idx
      }
      i += 1
    }
    pairCounts.foreach { case (p, n) => heap.enqueue((n, p._1, p._2)) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      var best: (String, String) = null
      // pop until a LIVE snapshot surfaces; a head under the merge floor
      // (count < 2) ends training even if stale — stale snapshots only
      // ever OVERSTATE, so everything live is also under the floor
      while (best == null && !done) {
        if (heap.isEmpty || heap.head._1 < 2L) done = true
        else {
          val (n, a, b) = heap.dequeue()
          if (pairCounts.get((a, b)).contains(n)) best = (a, b)
        }
      }
      if (!done) {
        val (a, b) = best
        merges += best
        // recount only the words that held the winning pair; stale
        // indices (words rewritten since they were registered) are
        // filtered by re-checking adjacency before the rewrite
        val affected = pairWords.getOrElse(best, scala.collection.mutable.BitSet.empty)
        affected.foreach { w =>
          val s = syms(w)
          var has = false
          var j = 0
          while (!has && j + 1 < s.length) { has = s(j) == a && s(j + 1) == b; j += 1 }
          if (has) {
            val c = cnts(w)
            forEachPair(w)(p => bump(p, -c))
            syms(w) = mergeWord(s, a, b)
            forEachPair(w) { p =>
              bump(p, c)
              pairWords.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += w
            }
          }
        }
        pairWords.remove(best)
        pairCounts.remove(best)
      }
    }
    merges.toSeq
  }

  /** Persist a trained merge list as a standard `merges.txt` artifact:
    * a `#version`-comment header, then one `left right` pair per line
    * in RANK ORDER (line order IS the rank — the interchange format
    * every BPE tokenizer stack reads, so a model trained here loads
    * anywhere and vice versa). Goes through the Hadoop FileSystem API,
    * so `path` may be local or DFS; the model is merge-list-sized, the
    * write is one driver-side stream — the same model-artifact contract
    * as [[bpeFit]]'s driver-side merge list itself.
    *
    * Pairs are validated on save: a symbol containing whitespace or a
    * newline could not round-trip the line format, so it fails loudly
    * here instead of corrupting the artifact (cannot occur for models
    * trained by [[bpeFit]] over [[TextOps.tokenize]] output, whose
    * symbols never contain whitespace). */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    merges.foreach { case (a, b) =>
      require(!(a + b).exists(_.isWhitespace),
        s"merge pair ('$a', '$b') contains whitespace and cannot " +
          "round-trip the merges.txt line format")
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      out.write("#version: 0.2\n".getBytes("UTF-8"))
      merges.foreach { case (a, b) =>
        out.write(s"$a $b\n".getBytes("UTF-8"))
      }
    } finally out.close()
  }

  /** Load a `merges.txt` artifact back into the ordered merge list:
    * `#`-comment lines and blank lines are skipped, every other line
    * must be exactly `left right`. Inverse of [[saveModel]]
    * (round-trip is identity, unit-pinned); also reads artifacts
    * produced by other BPE stacks that write the same format. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        l.split(" ", -1) match {
          case Array(a, b) => (a, b)
          case _ => throw new IllegalArgumentException(
            s"malformed merges.txt line: '$l' (expected 'left right')")
        }
      }
      .toSeq
  }

  /** Above this merge count, [[wordPieces]] switches from the nested
    * fold-expression replay to the iterative rank-based apply: each
    * fold is one HOF expression NODE, so a 30k-merge production list
    * would build a 30k-deep expression tree — seconds of Catalyst
    * analysis at best, a stack overflow at worst (the same
    * literal-tree blowup pqAssign hit with inlined centroids). 64
    * keeps the SQL-auditable expression path for every test/oracle
    * setting while production merge counts take the scalable path. */
  val maxExpressionMerges = 64

  /** Iterative rank-based BPE apply — the classic tokenizer encode
    * loop: repeatedly merge the lowest-rank adjacent pair present
    * (all its occurrences, leftmost-first) until none remains.
    *
    * EQUIVALENT to replaying the merge list in order for any list a
    * BPE TRAINER produced: a merge can only create new adjacencies
    * involving its own output token, and every trained pair involving
    * that token necessarily has a HIGHER rank than the merge that
    * created it — so an earlier pair can never (re)appear after its
    * turn has passed, and picking the minimum present rank visits
    * merges in exactly replay order. Pinned against [[applyMerges]]
    * in BpeSpec on trained lists. O(pieces · pairs-present) per word,
    * independent of the total merge count — a 30k-merge vocabulary
    * costs the same per word as a 24-merge one. */
  private[ops] def applyMergesFast(
      word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.split("").filter(_.nonEmpty).toSeq
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = {
          // recover the pair from the first occurrence of the best rank
          var j = 0
          var p: (String, String) = null
          while (p == null) {
            if (ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == best)
              p = (syms(j), syms(j + 1))
            j += 1
          }
          p
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = a + b
          else out += s
        }
        syms = out.toSeq
        done = syms.length < 2
      }
    }
    syms
  }

  /** Does every merge's pair of operands consist of base symbols
    * (single code points) or outputs of EARLIER merges? True for any
    * list a BPE trainer produced — and exactly the precondition under
    * which [[applyMergesFast]]'s min-rank iteration equals in-order
    * replay (a later-listed pair using a not-yet-produced token, e.g.
    * `[("ab","c"), ("a","b")]`, breaks that equivalence: fast would
    * merge "abc" where replay leaves "ab","c"). */
  private[ops] def isTrainerProduced(merges: Seq[(String, String)]): Boolean = {
    val produced = scala.collection.mutable.HashSet.empty[String]
    merges.forall { case (a, b) =>
      def base(s: String) = s.nonEmpty && s.codePointCount(0, s.length) == 1
      val ok = (base(a) || produced(a)) && (base(b) || produced(b))
      produced += a + b
      ok
    }
  }

  /** Word → (pieces, n_pieces) table for every distinct word in the
    * corpus: the broadcastable encoder table, built in ONE plan with no
    * per-round jobs. Small merge lists (≤ [[maxExpressionMerges]])
    * inline as the nested fold expression — SQL-auditable, zero
    * black-box code in the plan; production-sized lists switch to a
    * deterministic UDF over [[applyMergesFast]] with the rank map in
    * the task closure (~2 short strings per merge — a 50k-merge model
    * is ~1 MB, broadcast once per executor). The UDF runs on the
    * DISTINCT-WORD table only — vocab-sized, never the corpus — so the
    * codegen break is confined to the model-sized frame, mirroring the
    * bpeFit collect contract.
    *
    * The fast path is only rank-equivalent to in-order replay for
    * TRAINER-PRODUCED lists, so that invariant is VALIDATED
    * ([[isTrainerProduced]], one cheap driver-side pass over the
    * model): a hand-ordered list that violates it takes a literal
    * in-order replay UDF instead — O(merges × word length) per word,
    * the price of exact semantics on adversarial input — never a
    * silently different tokenization. */
  def wordPieces(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(explode(TextOps.tokenize(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
    val withPieces =
      if (merges.size <= maxExpressionMerges)
        words.withColumn("pieces", applyMerges(split(col("word"), ""), merges))
      else if (isTrainerProduced(merges)) {
        val ranks = merges.zipWithIndex.toMap
        val fast = udf((w: String) => applyMergesFast(w, ranks))
        words.withColumn("pieces", fast(col("word")))
      } else {
        val list = merges.toIndexedSeq
        val replay = udf((w: String) =>
          list.foldLeft(w.split("").filter(_.nonEmpty)) {
            case (syms, (a, b)) => mergeWord(syms, a, b)
          }.toSeq)
        words.withColumn("pieces", replay(col("word")))
      }
    withPieces.withColumn("n_pieces", size(col("pieces")))
  }

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

  /** MATERIALIZE: per-bin packed token-ID sequences — the terminal
    * artifact a trainer actually consumes. Where [[bpeEncode]] stops at
    * per-doc COUNTS and [[SampleOps.packSequences]] stops at bin IDs,
    * this emits, per (`groupCol`, bin):
    *
    *  - `input_ids`:   every document's subword token ids, documents
    *                   concatenated in ascending `idCol` order (the same
    *                   deterministic order the bin assignment used),
    *                   pieces within a document in text order;
    *  - `doc_ids`:     the documents packed into the bin, same order;
    *  - `doc_offsets`: doc_offsets(i) = index in `input_ids` where
    *                   doc_ids(i) starts — `slice(input_ids,
    *                   doc_offsets(i)+1, len_i)` round-trips each
    *                   document, so attention masks / boundary resets
    *                   are reconstructible downstream;
    *  - `n_tokens`:    size(input_ids); ≤ budget unless a single
    *                   straddling document overflows (greedy offset
    *                   binning, [[SampleOps.packSequences]]).
    *
    * Token ids come from a PIECE-level vocabulary built over the encoded
    * corpus itself: piece occurrences are counted corpus-wide and dense
    * ids 0..V−1 assigned by (count DESC, piece ASC) via
    * [[TextOps.denseIds]] — the id of a piece is a pure function of the
    * corpus, reproducible cross-engine. Docs whose text has no tokens
    * carry nothing and are excluded (the [[bpeEncode]]-join contract
    * `text_pack_bins_bpe` already uses).
    *
    * Scale shape: the piece stream (corpus tokens × pieces-per-word) is
    * traversed twice — once aggregated for the vocabulary, once encoded
    * for the ids — the standard two-pass vocab build; both passes
    * shuffle on the piece/word keys only. Per-doc and per-bin arrays are
    * bounded by the document length and `budget` respectively, so no
    * task ever holds more than a bin's worth of ids. The word→pieces
    * join follows the [[bpeEncode]] no-hint contract (an over-limit
    * vocab degrades to a shuffle join instead of failing).
    *
    * `precomputedPieces` shares a [[wordPieces]] frame (and its staging)
    * with sibling operators; it must cover this corpus — pieces are
    * joined INNER, so an absent word would silently drop (the fit corpus
    * IS the encode corpus here; cross-corpus encoding wants
    * [[bpeEncode]]'s counting contract instead). */
  def packSequenceIds(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, merges: Seq[(String, String)], budget: Long,
      precomputedPieces: Option[DataFrame] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // The pieces frame is MATERIALIZED (localCheckpoint) before use, for
    // two measured reasons. (1) `stream` below is traversed twice (vocab
    // pass + id pass), and every traversal would otherwise re-run the
    // distinct + merge replay. (2) Far worse: posexplode(pieces) makes
    // InferFiltersFromGenerate derive `size(pieces) > 0 AND isnotnull(
    // pieces)`, and because the expression-path pieces column is a pure
    // function of the grouping key `word`, predicate pushdown legally
    // pushes that filter THROUGH the distinct aggregate onto the
    // per-occurrence token stream — the merge-replay fold then runs
    // twice per corpus token instead of once per vocab word (measured
    // 26 s vs 0.5 s at sf0.1). The checkpoint is a plan barrier that
    // confines the replay to the vocab-sized frame; the frame itself is
    // model-sized (distinct words), so eager materialization is cheap.
    val pieces = precomputedPieces.getOrElse(wordPieces(df, textCol, merges))
      .localCheckpoint()
    val toks = df
      .select(col(idCol),
        posexplode(TextOps.tokenize(col(textCol))).as(Seq("word_pos", "word")))
      .filter(length(col("word")) > 0)
    packIdsCore(df, idCol, groupCol, toks, pieces, budget)
  }

  /** BYTE-LEVEL twin of [[packSequenceIds]]: the same two-pass
    * vocab-build → encode → greedy-bin → concatenate pipeline over the
    * byte tier's chunk stream ([[byteBpeChunks]] pre-tokenization,
    * special tokens stripped, [[byteWordPieces]] encoder table). Same
    * output shape and scale contract; token ids index the PIECE
    * vocabulary of byte-alphabet symbols, so `doc_offsets` boundaries
    * are byte-faithful and any packed sequence decodes back to exact
    * UTF-8 via [[byteDecodeWord]]. */
  def packSequenceIdsBytes(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, merges: Seq[(String, String)], budget: Long,
      specialTokens: Seq[String] = Nil,
      precomputedPieces: Option[DataFrame] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val pieces = precomputedPieces
      .getOrElse(byteWordPieces(df, textCol, merges, specialTokens))
      .select(col("chunk").as("word"), col("pieces"))
      .localCheckpoint()
    val toks = df
      .select(col(idCol),
        posexplode(byteBpeChunks(stripSpecials(col(textCol), specialTokens)))
          .as(Seq("word_pos", "word")))
      .filter(length(col("word")) > 0 && col("word").rlike("\\S"))
    packIdsCore(df, idCol, groupCol, toks, pieces, budget)
  }

  /** Shared body of [[packSequenceIds]]/[[packSequenceIdsBytes]]:
    * `toks` = the (id, word_pos, word) corpus stream, `pieces` = the
    * (word, pieces) encoder table (already checkpointed by callers —
    * the plan-barrier rationale documented at [[packSequenceIds]]). */
  private def packIdsCore(df: DataFrame, idCol: String, groupCol: String,
      toks: DataFrame, pieces: DataFrame, budget: Long): DataFrame = {
    // (doc, word_pos, piece_pos, piece): the encoded corpus stream
    val stream = toks
      .join(pieces.select(col("word"), col("pieces")), Seq("word"))
      .select(col(idCol), col("word_pos"),
        posexplode(col("pieces")).as(Seq("piece_pos", "piece")))
    // r17 (guide §1.2): the vocab counts used to re-traverse `stream` —
    // a SECOND corpus-grain join + pieces-explode pass (the stream
    // subtree appears under both the vocab aggregate and the id join,
    // and nothing dedups a broadcast-join subtree). The same counts
    // factor through the WORD grain: count(piece) = Σ_word wf(word) ·
    // multiplicity(piece ∈ pieces(word)) — one slim word-frequency
    // aggregation over the token stream (no join, no piece explode)
    // plus a vocab-sized explode of the already-checkpointed encoder
    // table. Bit-identical counts ⇒ identical dense ids.
    val wordFreq = toks.groupBy(col("word")).agg(count(lit(1)).as("_wf"))
    val vocab = TextOps.denseIds(
      pieces.select(col("word"), col("pieces"))
        .join(wordFreq, Seq("word"))
        .select(explode(col("pieces")).as("piece"), col("_wf"))
        .groupBy(col("piece")).agg(sum(col("_wf")).as("n")),
      "piece", "n")
    // vocab is derived from this very stream — inner join loses nothing
    val withIds = stream
      .join(vocab.select(col("piece"), col("token_id")), Seq("piece"))
    // per-doc id arrays in text order: collect under the (word_pos,
    // piece_pos) struct prefix, sort, project the ids out
    val docIds = withIds.groupBy(col(idCol))
      .agg(
        array_sort(collect_list(
          struct(col("word_pos"), col("piece_pos"), col("token_id")))).as("ord"),
        count(lit(1)).as("n_tok"))
      .select(col(idCol),
        transform(col("ord"), x => x.getField("token_id")).as("ids"),
        col("n_tok"))
    val binned = SampleOps.packSequences(
      df.select(col(idCol), col(groupCol)).join(docIds, Seq(idCol)),
      groupCol, idCol, "n_tok", budget)
    binned.groupBy(col(groupCol), col("bin"))
      .agg(array_sort(collect_list(struct(col(idCol), col("ids")))).as("docs"))
      .select(col(groupCol), col("bin"),
        transform(col("docs"), x => x.getField(idCol)).as("doc_ids"),
        // prefix sums of the doc lengths in ONE O(bin) fold (a
        // transform-of-slices would be O(bin²))
        aggregate(col("docs"),
          struct(typedlit(Seq.empty[Long]).as("offs"), lit(0L).as("total")),
          (acc, x) => struct(
            concat(acc.getField("offs"), array(acc.getField("total"))).as("offs"),
            (acc.getField("total") + size(x.getField("ids"))).as("total")),
          acc => acc.getField("offs")).as("doc_offsets"),
        flatten(transform(col("docs"), x => x.getField("ids"))).as("input_ids"))
      .withColumn("n_tokens", size(col("input_ids")).cast(LongType))
  }

  // ------------------------------------------------------------------
  // BYTE-LEVEL BPE (the production tokenizer class: GPT-2 / RoBERTa /
  // Llama-BPE all train over raw UTF-8 BYTES, not characters or words)
  // ------------------------------------------------------------------
  //
  // Three deltas vs the word/char-level tier above, each a thin layer
  // over the SAME trainer/encoder machinery (trainInMemory,
  // applyMerges/applyMergesFast, the distinct-chunk join contract):
  //
  //  1. ALPHABET — every byte 0..255 maps to a printable single-char
  //     symbol (the public GPT-2 bytes_to_unicode table: printable
  //     latin-1 bytes map to themselves, the other 68 get code points
  //     256+). No OOV exists by construction: any UTF-8 string, any
  //     language, emoji, or binary-ish junk encodes. The mapping is a
  //     BIJECTION, so decode(encode) is identity byte-for-byte.
  //  2. PRE-TOKENIZER — a regex chunker (the GPT-2 pattern minus its
  //     trailing-whitespace LOOKAHEAD, which RE2 — and so the DuckDB
  //     oracle — cannot run; the lookahead only re-attaches a final
  //     space before EOS, irrelevant here). A leading space attaches
  //     to the following word (" the" is one chunk — the property that
  //     makes byte-BPE vocabularies space-aware), and merges never
  //     cross chunk boundaries.
  //  3. SPECIAL TOKENS — literal strings (e.g. "<|endoftext|>") are
  //     stripped BEFORE pre-tokenization (replaced by a space so their
  //     removal never glues neighbors into a false chunk) and never
  //     vote in training nor split in encoding; callers count/handle
  //     them at the document grain.

  /** GPT-2 bytes→unicode alphabet (public, from the GPT-2 encoder):
    * bytes '!'..'~', '¡'..'¬', '®'..'ÿ' map to their own code points
    * (printable — a staged parquet of symbols stays human-readable);
    * the remaining 68 bytes (controls, space, DEL, 0xAD) map to
    * 256, 257, … in ascending byte order. Space (0x20) lands on 'Ġ'
    * (U+0120) — the familiar leading-space marker. */
  val byteAlphabet: IndexedSeq[Char] = {
    val self = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var next = 256
    (0 until 256).foreach { b =>
      if (self(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
    }
    out.toIndexedSeq
  }

  private lazy val byteAlphabetInv: Map[Char, Int] =
    byteAlphabet.zipWithIndex.map { case (c, b) => (c, b) }.toMap

  /** UTF-8 bytes of `s` → one alphabet symbol per byte. Total and
    * injective (the alphabet is a bijection on 0..255). */
  def byteEncodeWord(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(byteAlphabet(b & 0xff)))
    sb.toString
  }

  /** Inverse of [[byteEncodeWord]] — also decodes CONCATENATED pieces
    * (symbol streams splice at byte grain; UTF-8 re-assembles). Throws
    * on symbols outside the alphabet: decode is only defined on
    * encoder output. */
  def byteDecodeWord(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bytes(i) = byteAlphabetInv.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"byteDecodeWord: '${s.charAt(i)}' (U+${s.charAt(i).toInt.toHexString}) " +
            "is not a byte-alphabet symbol")).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** GPT-2 pre-tokenizer, lookahead-free (see the tier note above):
    * contractions, space-prefixed letter/digit runs, space-prefixed
    * punctuation runs, whitespace runs. Runs IDENTICALLY under Java
    * regex (Spark) and RE2 (DuckDB) — both treat \p{L}/\p{N} as the
    * Unicode categories, and whitespace is an EXPLICIT class
    * [\t\n\x0B\f\r ] rather than \s because the engines disagree on
    * U+000B (Java's \s includes vertical tab, RE2's does not) — which
    * is what lets the oracle re-chunk the corpus instead of trusting a
    * staged chunk list. */
  val byteBpeWsClass: String = "\\t\\n\\x0B\\f\\r "
  val byteBpePretokenPattern: String =
    s"'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^$byteBpeWsClass\\p{L}\\p{N}]+|[$byteBpeWsClass]+"
  /** One-non-whitespace-char test under the SAME explicit class (the
    * cross-engine \S). */
  val byteBpeNonWsPattern: String = s"[^$byteBpeWsClass]"

  /** Pre-tokenize a text column into its chunk array (in-plan). */
  def byteBpeChunks(text: Column): Column =
    regexp_extract_all(text, lit(byteBpePretokenPattern), lit(0))

  /** Strip special-token literals, each replaced by ONE space so the
    * removal never glues the surrounding text into a false chunk. */
  def stripSpecials(text: Column, specialTokens: Seq[String]): Column =
    specialTokens.foldLeft(text)((c, tok) => replace(c, lit(tok), lit(" ")))

  /** TRAIN byte-level merges: one corpus-scale (chunk, count)
    * aggregation — special tokens stripped, chunks from
    * [[byteBpeChunks]] — then the budgeted driver-side collect and the
    * SAME incremental trainer as [[bpeFit]], over byte symbols instead
    * of characters (the mapped strings are single-char-per-byte, so
    * trainInMemory's per-char split IS the per-byte split). Merge
    * operands/outputs are alphabet-symbol strings — exactly what
    * merges.txt interchange carries for byte-level models, so
    * [[saveModel]]/[[loadModel]] round-trip unchanged (no symbol can
    * contain whitespace: space bytes map OUT of the whitespace range
    * by construction). */
  def byteBpeFit(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L, maxVocabRows: Int = defaultMaxVocabRows,
      specialTokens: Seq[String] = Nil): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val chunks = df
      .select(explode(byteBpeChunks(stripSpecials(col(textCol), specialTokens)))
        .as("chunk"))
      .filter(length(col("chunk")) > 0 && col("chunk").rlike(byteBpeNonWsPattern))
      .groupBy(col("chunk")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val rows = chunks.limit(maxVocabRows + 1)
      .collect() // driver-side model fit: budgeted post-aggregation chunk vocab
    if (rows.length > maxVocabRows) {
      throw new IllegalStateException(
        s"BpeOps.byteBpeFit: distinct-chunk vocab exceeds maxVocabRows=" +
          s"$maxVocabRows (minCount=$minCount) — raise minCount or the budget.")
    }
    trainInMemory(
      rows.map(r => (byteEncodeWord(r.getString(0)), r.getLong(1))), numMerges)
  }

  /** Chunk → (mapped symbols, pieces, n_pieces) encoder table over the
    * corpus's DISTINCT chunks — [[wordPieces]]' byte-level twin, same
    * scale contract: the byte mapping and (for production merge
    * counts) the rank-based apply run as deterministic UDFs on the
    * model-sized distinct frame only, never the corpus; the corpus
    * encodes by a join. Whitespace-only chunks are excluded (they
    * carry no trainable signal; a downstream joiner treats them as
    * 1-piece-per-byte, the same OOV fallback as [[bpeEncode]]). */
  def byteWordPieces(df: DataFrame, textCol: String,
      merges: Seq[(String, String)],
      specialTokens: Seq[String] = Nil): DataFrame = {
    val chunks = df
      .select(explode(byteBpeChunks(stripSpecials(col(textCol), specialTokens)))
        .as("chunk"))
      .filter(length(col("chunk")) > 0 && col("chunk").rlike(byteBpeNonWsPattern))
      .distinct()
    val mapIt = udf((w: String) => byteEncodeWord(w))
    val mapped = chunks.withColumn("mapped", mapIt(col("chunk")))
    val withPieces =
      if (merges.size <= maxExpressionMerges)
        mapped.withColumn("pieces", applyMerges(split(col("mapped"), ""), merges))
      else if (isTrainerProduced(merges)) {
        val ranks = merges.zipWithIndex.toMap
        val fast = udf((w: String) => applyMergesFast(w, ranks))
        mapped.withColumn("pieces", fast(col("mapped")))
      } else {
        val list = merges.toIndexedSeq
        val replay = udf((w: String) =>
          list.foldLeft(w.split("").filter(_.nonEmpty)) {
            case (syms, (a, b)) => mergeWord(syms, a, b)
          }.toSeq)
        mapped.withColumn("pieces", replay(col("mapped")))
      }
    withPieces.withColumn("n_pieces", size(col("pieces")))
  }
}
