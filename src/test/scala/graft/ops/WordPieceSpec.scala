package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("greedy encode: longest-match-first, ## continuation, cover, UNK") {
    val m = WordPieceOps.Model(Seq("[UNK]",
      "u", "##n", "##a", "##f", "##b", "##l", "##e",
      "un", "##aff", "##ffable", "##able", "f", "##na"))
    // longest-first at every position: "un" beats "u",
    // "##ffable" beats "##f"
    assert(WordPieceOps.greedyPieces("unffable", m)
      == Seq("un", "##ffable"))
    // greedy can get STUCK where a smarter split succeeds: "una" —
    // greedy takes "un" then needs "##a" (present) → fine; "unab" —
    // "un","##a","##b" all present
    assert(WordPieceOps.greedyPieces("unab", m) == Seq("un", "##a", "##b"))
    // no match at a position (char 'z' has no ##z) → whole word UNK
    assert(WordPieceOps.greedyPieces("unz", m) == Seq("[UNK]"))
    // word-initial piece must NOT use a ## entry: "na" needs plain "n"
    assert(WordPieceOps.greedyPieces("na", m) == Seq("[UNK]"))
    // cover invariant on a non-trivial word
    val p = WordPieceOps.greedyPieces("unaffable", m)
    assert(p == Seq("un", "##aff", "##able"))
    assert(p.head + p.tail.map(_.stripPrefix("##")).mkString == "unaffable")
  }

  test("trainer: deterministic, covers the alphabet, likelihood beats raw frequency") {
    // 'xq' pair: x and q occur ONLY together (count 8 each).
    // 'th' pair: more frequent (12) but t and e are everywhere.
    // Raw BPE merges 'th' first; WordPiece's count(ab)/(count(a)count(b))
    // merges x##q first: 8/(8*8) = 1/8 > 12/(26*14).
    val corpus = Seq.fill(8)("xq") ++ Seq.fill(12)("the") ++
      Seq.fill(14)("te t") ++ Seq.fill(2)("he")
    val df = corpus.toDF("text")
    val v1 = WordPieceOps.wordPieceFit(df, "text", vocabSize = 12)
    val v2 = WordPieceOps.wordPieceFit(df, "text", vocabSize = 12)
    assert(v1 == v2, "trainer is not deterministic")
    assert(v1.head == "[UNK]")
    // alphabet coverage: every word-initial char plain, internals ##'d
    assert(Set("x", "t", "h").subsetOf(v1.toSet), v1)
    assert(Set("##q", "##h", "##e").subsetOf(v1.toSet), v1)
    val merges = v1.dropWhile(p =>
      p == "[UNK]" || p.stripPrefix("##").length == 1)
    assert(merges.head == "xq", s"likelihood argmax should be xq: $v1")
    // BPE on the same corpus picks the raw-frequency pair first instead
    val bpe = BpeOps.bpeFit(df, "text", numMerges = 1)
    assert(bpe.head != ("x", "q"), s"corpus no longer separates the scores: $bpe")
  }

  test("wordPieceTokens: distinct-word grain, in-plan greedy refutation is clean") {
    val docs = Seq("the cat sat on the mat", "a catalog of cats",
      "zzz unseen").toDF("text")
    val vocab = WordPieceOps.wordPieceFit(docs, "text", vocabSize = 40)
    val m = WordPieceOps.Model(vocab)
    val enc = WordPieceOps.wordPieceTokens(docs, "text", m)
    val rows = enc.as[(String, Seq[String], Long, Int)].collect()
    assert(rows.map(_._1).distinct.length == rows.length, "not distinct-word")
    rows.foreach { case (w, pieces, n, unk) =>
      assert(n == pieces.length.toLong)
      if (unk == 0)
        assert(pieces.head + pieces.tail.map(_.stripPrefix("##")).mkString
          == w, s"$w: $pieces")
      else assert(pieces == Seq("[UNK]"))
    }
    val vocabDf = vocab.toDF("piece")
    val viol = WordPieceOps.longestMatchViolations(enc, vocabDf, m.maxPieceLen)
      .as[Long].head()
    assert(viol == 0L, s"greedy encode produced $viol longest-match violations")
  }

  test("longestMatchViolations: a planted non-greedy split is caught") {
    // vocab contains "ab"; the planted encode used "a","##b" anyway
    val vocabDf = Seq("a", "##b", "ab").toDF("piece")
    val planted = Seq(("ab", Seq("a", "##b"), 2L, 0))
      .toDF("word", "pieces", "n_pieces", "is_unk")
    val viol = WordPieceOps.longestMatchViolations(planted, vocabDf, 2)
      .as[Long].head()
    assert(viol == 1L, s"expected 1 violation, got $viol")
  }

  test("vocab.txt round trip: identical ordered piece list") {
    val docs = Seq("abc abd", "bcd bce bcd").toDF("text")
    val vocab = WordPieceOps.wordPieceFit(docs, "text", vocabSize = 20)
    val path = java.nio.file.Files.createTempDirectory("wp").toString +
      "/vocab.txt"
    WordPieceOps.saveModel(spark, vocab, path)
    val back = WordPieceOps.loadModel(spark, path)
    assert(back == vocab, s"$back != $vocab")
  }
}
