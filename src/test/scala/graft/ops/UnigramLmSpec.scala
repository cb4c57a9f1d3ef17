package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi: exact-integer DP matches brute-force enumeration on random vocabs") {
    val rng = new scala.util.Random(7)
    val alphabet = "abcd"
    (1 to 40).foreach { trial =>
      // random vocab: all single chars + random multi-char pieces
      val multis = (1 to 6).map { _ =>
        val len = 2 + rng.nextInt(3)
        (1 to len).map(_ => alphabet(rng.nextInt(4))).mkString
      }.distinct
      val rows = alphabet.map(c => c.toString -> (-1.0 - rng.nextInt(5))) ++
        multis.map(p => p -> (-0.5 - rng.nextInt(4)))
      val m = UnigramLmOps.model(rows.toSeq)
      val w = (1 to (3 + rng.nextInt(6)))
        .map(_ => alphabet(rng.nextInt(4))).mkString
      val (pieces, s) = UnigramLmOps.viterbi(w, m)
      assert(pieces.mkString("") == w, s"trial $trial: cover broken $pieces")
      assert(s == UnigramLmOps.bruteForceBest(w, m),
        s"trial $trial: viterbi $s != brute force for '$w'")
    }
  }

  test("viterbi: preference for fewer pieces on score ties; OOV chars take unk") {
    // 'ab' scores exactly the same as 'a'+'b' → the 1-piece split wins
    val m = UnigramLmOps.model(Seq("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0))
    val (pieces, s) = UnigramLmOps.viterbi("ab", m)
    assert(pieces == Seq("ab") && s == -2000000L, s"$pieces $s")
    // unknown char: single-char unk fallback keeps encoding total
    val (p2, s2) = UnigramLmOps.viterbi("axb", m)
    assert(p2 == Seq("a", "x", "b"), p2)
    assert(s2 == -1000000L + m.unkMicro + -1000000L, s2)
  }

  test("trainer: deterministic, covers every char, hits the vocab budget, likes frequent substrings") {
    val corpus = Seq.fill(30)("the cat sat on the mat") ++
      Seq.fill(10)("a catalog of cats")
    val df = corpus.toDF("text")
    val m1 = UnigramLmOps.unigramFit(df, "text", vocabSize = 24,
      maxPieceLen = 4, minCount = 2)
    val m2 = UnigramLmOps.unigramFit(df, "text", vocabSize = 24,
      maxPieceLen = 4, minCount = 2)
    assert(m1 == m2, "trainer is not deterministic")
    val pieces = m1.map(_._1).toSet
    val chars = corpus.flatMap(_.split("\\s+")).flatten.map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    assert(m1.size <= 24 + chars.size, s"vocab ${m1.size} over budget")
    // 'cat' appears in every document class — a frequent substring the
    // EM should retain as a multi-char piece
    assert(pieces.contains("cat"), s"expected 'cat' in $pieces")
    // model is sorted (logProb DESC, piece ASC) and log-probs are negative
    assert(m1.forall(_._2 < 0.0))
    assert(m1 == m1.sortWith { case ((pa, va), (pb, vb)) =>
      if (va != vb) va > vb else pa < pb || !(pb < pa) && pa <= pb
    } || m1.map(_._2) == m1.map(_._2).sorted.reverse)
  }

  test("unigramWordPieces: distinct-word grain, cover invariant, scores re-add exactly") {
    val df = Seq("the cat sat", "the catalog").toDF("text")
    val model = UnigramLmOps.model(Seq(
      "t" -> -2.0, "h" -> -3.0, "e" -> -2.5, "c" -> -3.0, "a" -> -2.0,
      "s" -> -3.0, "l" -> -3.5, "o" -> -3.0, "g" -> -3.5,
      "the" -> -1.5, "cat" -> -1.8, "at" -> -2.2))
    val out = UnigramLmOps.unigramWordPieces(df, "text", model)
      .as[(String, Seq[String], Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("the", "cat", "sat", "catalog"))
    out.values.foreach { case (w, pieces, n, score) =>
      assert(pieces.mkString("") == w, s"$w: $pieces")
      assert(n == pieces.length.toLong)
      val re = pieces.map(p => model.pieces.getOrElse(p,
        if (p.length == 1) model.unkMicro else Long.MinValue)).sum
      assert(score == re, s"$w: $score != $re")
      assert(score == UnigramLmOps.bruteForceBest(w, model), s"$w suboptimal")
    }
    assert(out("the")._2 == Seq("the"))
    assert(out("cat")._2 == Seq("cat"))
  }
}
