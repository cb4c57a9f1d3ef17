package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al.'s canonical corpus shape: low×3 lower×2 newest×4 widest×1
  private def corpus = Seq(
    (0L, "low low low"),
    (1L, "lower lower"),
    (2L, "newest newest newest newest"),
    (3L, "widest")).toDF("doc_id", "text")

  test("bpeFit learns the hand-computed merges with deterministic tie-breaks") {
    // pair counts round 1: (w,e)=6 [lower 2 + newest 4] beats all →
    // merge 1. Round 2: (l,o)=5 ties (s,t)=5, 'l' < 's' → (l,o).
    // Round 3: (s,t)=5.
    val merges = BpeOps.bpeFit(corpus, "text", numMerges = 3)
    assert(merges == Seq(("w", "e"), ("l", "o"), ("s", "t")))
  }

  test("wordPieces replays merges: leftmost-first, order-sensitive") {
    val merges = BpeOps.bpeFit(corpus, "text", numMerges = 3)
    val pieces = BpeOps.wordPieces(corpus, "text", merges)
      .select($"word", $"pieces").as[(String, Seq[String])].collect().toMap
    assert(pieces("low") == Seq("lo", "w"))
    assert(pieces("lower") == Seq("lo", "we", "r"))
    assert(pieces("newest") == Seq("n", "e", "we", "st"))
    assert(pieces("widest") == Seq("w", "i", "d", "e", "st"))
    // roundtrip: pieces concatenate back to the word, for every word
    assert(pieces.forall { case (w, p) => p.mkString("") == w })
  }

  test("bpeEncode counts subword tokens; OOV words fall back to characters") {
    val merges = BpeOps.bpeFit(corpus, "text", numMerges = 3)
    val pieces = BpeOps.wordPieces(corpus, "text", merges)
    val rows = BpeOps.bpeEncode(
      Seq((9L, "low lower newest widest"), (10L, "zzz low")).toDF("doc_id", "text"),
      "doc_id", "text", pieces)
      .select($"doc_id", $"n_words", $"n_bpe_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 9: 2 + 3 + 4 + 5 = 14; doc 10: "zzz" OOV → 3 chars, low → 2
    assert(rows == Seq((9L, 4L, 14L), (10L, 2L, 5L)))
  }

  test("over-budget vocab fails fast with the named knob, not a driver OOM") {
    val e = intercept[IllegalStateException] {
      BpeOps.bpeFit(corpus, "text", numMerges = 3, maxVocabRows = 2)
    }
    assert(e.getMessage.contains("maxVocabRows"), e.getMessage)
    assert(e.getMessage.contains("minCount"), "diagnostic must name the standard knob")
    // the same corpus under a sufficient budget trains normally
    assert(BpeOps.bpeFit(corpus, "text", numMerges = 3, maxVocabRows = 10).nonEmpty)
  }

  test("fit stops early when nothing is left to merge") {
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeOps.bpeFit(tiny, "text", numMerges = 10)
    // one merge (a,b) collapses the only word; nothing pairs after it —
    // and a singleton pair (count 1) would never have merged at all
    assert(merges == Seq(("a", "b")))
  }

  test("rank-based fast apply ≡ sequential replay on trained merge lists") {
    // a deterministic syllable corpus with enough shared substructure
    // to train well past maxExpressionMerges, then pin the equivalence
    // the fast encode path rests on: iterative min-rank apply ==
    // replaying the merges in order, for every vocab word
    val syl = Seq("ka", "to", "mi", "ra", "su", "ne", "lo", "da", "pi", "vu")
    def word(i: Int) = s"${syl(i % 10)}${syl((i / 10) % 10)}${syl((i / 100) % 10)}"
    val rnd = new scala.util.Random(42)
    val docs = (0 until 300)
      .map(d => (d.toLong, (0 until 40).map(_ => word(rnd.nextInt(700))).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = BpeOps.bpeFit(docs, "text", numMerges = 200, minCount = 1)
    assert(merges.size > BpeOps.maxExpressionMerges,
      s"fixture must exercise the fast path, trained only ${merges.size}")
    val ranks = merges.zipWithIndex.toMap
    val vocab = docs
      .select(explode(split(lower($"text"), "\\s+")).as("word"))
      .filter(length($"word") > 0).distinct()
      .as[String].collect()
    assert(vocab.length > 100)
    vocab.foreach { w =>
      val replay = merges.foldLeft(w.split("").filter(_.nonEmpty)) {
        case (syms, (a, b)) => BpeOps.mergeWord(syms, a, b)
      }.toSeq
      val fast = BpeOps.applyMergesFast(w, ranks)
      assert(fast == replay, s"word '$w': fast=$fast replay=$replay")
    }
    // and the wordPieces UDF path (merge count above the expression
    // threshold) agrees with the expression replay on the same vocab
    if (merges.size > BpeOps.maxExpressionMerges) {
      val viaFast = BpeOps.wordPieces(docs, "text", merges)
        .select($"word", $"pieces").as[(String, Seq[String])].collect().toMap
      vocab.foreach { w =>
        assert(viaFast(w) == BpeOps.applyMergesFast(w, ranks))
      }
    }
  }

  test("merged budgets plug into packSequences") {
    val merges = BpeOps.bpeFit(corpus, "text", numMerges = 3)
    val pieces = BpeOps.wordPieces(corpus, "text", merges)
    val enc = BpeOps.bpeEncode(corpus, "doc_id", "text", pieces)
      .withColumn("src", lit("all"))
    val packed = SampleOps.packSequences(enc, "src", "doc_id", "n_bpe_tokens", budget = 12L)
    assert(packed.select(max($"bin")).as[Long].head() >= 1L) // budget forces >1 bin
  }

  test("non-trainer merge lists >64 entries take the replay path, not the fast path") {
    // the ADVICE counterexample: ("ab","c") listed BEFORE ("a","b")
    // produces "ab" — min-rank apply would merge "abc" into one piece,
    // in-order replay leaves ["ab", "c"]. Padded past the expression
    // threshold with inert single-char merges (trainer-VALID pads, so
    // only the head violates the invariant).
    val pads = (0 until 70).map(i => (('f' + i % 20).toChar.toString, s"${i / 20}"))
    val handOrdered = Seq(("ab", "c"), ("a", "b")) ++ pads
    assert(handOrdered.size > BpeOps.maxExpressionMerges)
    assert(!BpeOps.isTrainerProduced(handOrdered))
    assert(BpeOps.isTrainerProduced(Seq(("a", "b"), ("ab", "c")) ++ pads))

    val docs = Seq((0L, "abc")).toDF("doc_id", "text")
    val pieces = BpeOps.wordPieces(docs, "text", handOrdered)
      .select($"word", $"pieces").as[(String, Seq[String])].collect().toMap
    // replay semantics, NOT the fast path's ["abc"]
    assert(pieces("abc") == Seq("ab", "c"), pieces.toString)
  }

  test("packSequenceIds: bins respect the budget and offsets round-trip the docs") {
    val docs = corpus.withColumn("src", lit("all"))
    val merges = BpeOps.bpeFit(corpus, "text", numMerges = 3)
    val packed = BpeOps.packSequenceIds(
      docs, "doc_id", "text", "src", merges, budget = 8L)
      .select($"src", $"bin", $"doc_ids", $"doc_offsets", $"input_ids", $"n_tokens")
      .as[(String, Long, Seq[Long], Seq[Long], Seq[Long], Long)]
      .collect().sortBy(_._2)

    // per-doc pieces: low=2 ×3 occurrences? No — one ROW per doc:
    //   doc 0 "low low low"                 → 3 words × 2 pieces = 6
    //   doc 1 "lower lower"                 → 2 × 3 = 6
    //   doc 2 "newest newest newest newest" → 4 × 4 = 16
    //   doc 3 "widest"                      → 1 × 5 = 5
    // greedy offset binning at budget 8, doc order 0..3:
    //   cum-before: 0, 6, 12, 28 → bins 0, 0, 1, 3
    assert(packed.map(p => (p._2, p._3)).toSeq ==
      Seq((0L, Seq(0L, 1L)), (1L, Seq(2L)), (3L, Seq(3L))))

    // greedy-offset-binning bound: a bin overflows the budget only by
    // its final (straddling) document — everything before that doc fits,
    // i.e. the last doc's offset is strictly under the budget
    packed.foreach { case (_, bin, _, offs, _, nTok) =>
      assert(offs.last < 8L, s"bin $bin: last doc starts at ${offs.last}")
      assert(nTok >= offs.last, s"bin $bin inconsistent")
    }

    // offsets round-trip: slicing input_ids at the boundaries recovers
    // each document's ids, and sizes are consistent
    val perDoc = packed.flatMap { case (_, _, docIds, offs, ids, nTok) =>
      assert(offs.length == docIds.length)
      assert(nTok == ids.length.toLong)
      docIds.zipWithIndex.map { case (docId, i) =>
        val end = if (i + 1 < offs.length) offs(i + 1).toInt else ids.length
        docId -> ids.slice(offs(i).toInt, end)
      }
    }.toMap
    assert(perDoc.keySet == Set(0L, 1L, 2L, 3L))
    assert(perDoc(0L).length == 6 && perDoc(1L).length == 6 &&
      perDoc(2L).length == 16 && perDoc(3L).length == 5)

    // ids decode back to the right pieces: vocab is (count DESC, piece)
    // over the encoded corpus — "low"×3 → lo,w each 3+… hand-check via
    // the pieces table instead of hand-counting: every doc's ids equal
    // the doc's word pieces mapped through the corpus piece vocabulary.
    val pieceOf = BpeOps.wordPieces(corpus, "text", merges)
      .select($"word", $"pieces").as[(String, Seq[String])].collect().toMap
    val pieceStream = corpus.as[(Long, String)].collect().toMap.map {
      case (id, text) => id ->
        text.toLowerCase.split("\\s+").filter(_.nonEmpty).flatMap(pieceOf).toSeq
    }
    val counts = pieceStream.values.flatten.groupBy(identity).view.mapValues(_.size)
    val vocabIds = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .zipWithIndex.map { case ((p, _), i) => p -> i.toLong }.toMap
    pieceStream.foreach { case (docId, pieces) =>
      assert(perDoc(docId) == pieces.map(vocabIds), s"doc $docId ids mismatch")
    }
  }

  test("merges.txt artifact: save → load is identity; format is tolerant and guarded") {
    val merges = BpeOps.bpeFit(corpus, "text", numMerges = 3)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    BpeOps.saveModel(spark, merges, s"$dir/merges.txt")
    assert(BpeOps.loadModel(spark, s"$dir/merges.txt") == merges)
    // the artifact is the standard line format other stacks read
    val lines = scala.io.Source.fromFile(s"$dir/merges.txt").getLines().toSeq
    assert(lines.head.startsWith("#version") &&
      lines.tail == merges.map { case (a, b) => s"$a $b" })
    // loader skips comments and blank lines anywhere
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$dir/hand.txt"),
      "#version: 0.2\na b\n\n# mid comment\nab c\n")
    assert(BpeOps.loadModel(spark, s"$dir/hand.txt") ==
      Seq(("a", "b"), ("ab", "c")))
    // whitespace-bearing symbols cannot round-trip the line format
    val e = intercept[IllegalArgumentException] {
      BpeOps.saveModel(spark, Seq(("a b", "c")), s"$dir/bad.txt")
    }
    assert(e.getMessage.contains("whitespace"))
    // malformed lines fail loudly on load
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$dir/bad2.txt"), "a b c\n")
    val e2 = intercept[IllegalArgumentException] {
      BpeOps.loadModel(spark, s"$dir/bad2.txt")
    }
    assert(e2.getMessage.contains("malformed"))
  }

  test("byte alphabet: 256-symbol bijection, printable self-ranges, Ġ for space") {
    assert(BpeOps.byteAlphabet.size == 256)
    assert(BpeOps.byteAlphabet.distinct.size == 256, "alphabet must be injective")
    // printable latin-1 ranges map to themselves (the GPT-2 table)
    (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).foreach { c =>
      assert(BpeOps.byteAlphabet(c.toInt) == c, s"$c must self-map")
    }
    assert(BpeOps.byteAlphabet(' '.toInt) == 'Ġ') // 0x20 → U+0120
    assert(BpeOps.byteAlphabet('\n'.toInt) == 'Ċ') // 0x0A → U+010A
    // no symbol is whitespace — the merges.txt line-format guarantee
    assert(BpeOps.byteAlphabet.forall(c => !c.isWhitespace))
  }

  test("byte encode/decode: identity on multi-byte UTF-8, emoji, controls") {
    val cases = Seq("hello world", " café", "世界", "🚀 go", "a\tb\nc",
      "№42", "", "ÿ¡", new String(Array[Byte](0, 1, 127), "ISO-8859-1"))
    cases.foreach { s =>
      val enc = BpeOps.byteEncodeWord(s)
      assert(BpeOps.byteDecodeWord(enc) == s, s"roundtrip failed for '$s'")
      // one symbol per UTF-8 byte
      assert(enc.length == s.getBytes("UTF-8").length, s"length for '$s'")
    }
    // decode rejects non-alphabet symbols (it is only defined on encoder output)
    intercept[IllegalArgumentException] { BpeOps.byteDecodeWord("☃") }
    // concatenated-piece decode: splicing at byte grain reassembles UTF-8
    val enc = BpeOps.byteEncodeWord(" café 世界")
    val mid = enc.length / 2
    assert(BpeOps.byteDecodeWord(enc.substring(0, mid) + enc.substring(mid))
      == " café 世界")
  }

  test("byte pre-tokenizer: leading space attaches, categories split, specials strip") {
    val out = spark.range(1)
      .select(BpeOps.byteBpeChunks(lit("don't stop 123 now!! café")).as("c"))
      .head().getSeq[String](0)
    assert(out == Seq("don", "'t", " stop", " 123", " now", "!!", " café"), out)
    // special tokens strip to a single space — neighbors never glue
    // into one chunk (the space attaches to the FOLLOWING word, the
    // same leading-space rule as everywhere else)
    val stripped = spark.range(1)
      .select(BpeOps.byteBpeChunks(BpeOps.stripSpecials(
        lit("end<|endoftext|>start"), Seq("<|endoftext|>"))).as("c"))
      .head().getSeq[String](0)
    assert(stripped == Seq("end", " start"), stripped)
  }

  test("byteBpeFit + byteWordPieces: trained merges compress and round-trip") {
    import spark.implicits._
    val docs = Seq.fill(8)("the cat sat on the mat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = BpeOps.byteBpeFit(docs, "text", numMerges = 10)
    assert(merges.nonEmpty && merges.size <= 10)
    assert(BpeOps.isTrainerProduced(merges),
      "byte-level training must produce a replayable merge list")
    val pieces = BpeOps.byteWordPieces(docs, "text", merges)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getSeq[String](2), r.getInt(3)))
    assert(pieces.nonEmpty)
    pieces.foreach { case (chunk, mapped, ps, n) =>
      assert(ps.mkString("") == mapped, s"pieces must concat to mapped for '$chunk'")
      assert(n == ps.size)
      assert(mapped.length == chunk.getBytes("UTF-8").length)
      assert(BpeOps.byteDecodeWord(mapped) == chunk)
    }
    // " the" (space + word) must be ONE chunk — the space-aware property
    assert(pieces.exists(_._1 == " the"))
    // 10 merges on a 6-word looped corpus must compress below 1 piece/byte
    val totBytes = pieces.map(_._2.length).sum
    val totPieces = pieces.map(_._4).sum
    assert(totPieces < totBytes, s"$totPieces pieces vs $totBytes bytes")
  }

  test("byte merges round-trip merges.txt (symbols are whitespace-free)") {
    import spark.implicits._
    val docs = Seq.fill(6)((1L, "ab ab ab cd cd")).toDF("doc_id", "text")
    val merges = BpeOps.byteBpeFit(docs, "text", numMerges = 6)
    // space-bearing chunks like " ab" train merges over 'Ġ' symbols —
    // exactly the case the raw word-level tier could never persist
    assert(merges.exists { case (a, b) => (a + b).contains('Ġ') })
    val dir = java.nio.file.Files.createTempDirectory("bpe_byte").toString
    BpeOps.saveModel(spark, merges, s"$dir/merges.txt")
    assert(BpeOps.loadModel(spark, s"$dir/merges.txt") == merges)
  }

  test("byte encode/decode: seeded fuzz across the full code-point space") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { i =>
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        var cp = 0
        do cp = rnd.nextInt(0x10FFFF + 1)
        while (cp >= 0xD800 && cp <= 0xDFFF) // no bare surrogate halves
        sb.appendAll(Character.toChars(cp))
      }
      val str = sb.toString
      val enc = BpeOps.byteEncodeWord(str)
      assert(BpeOps.byteDecodeWord(enc) == str, s"case $i failed roundtrip")
      assert(enc.length == str.getBytes("UTF-8").length, s"case $i length")
      // closure: every emitted symbol is an alphabet member (decodable)
      enc.foreach(c => assert(BpeOps.byteAlphabet.contains(c), s"case $i: $c"))
    }
  }
}
