package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies real-language snippets by stopword profile") {
    val df = Seq(
      ("en", "the cat sat on the mat and you can see that it is happy with life"),
      ("de", "der hund ist nicht zu hause und ich gehe mit dem auto"),
      ("es", "el perro no está en la casa y los gatos que viven por aquí"),
      ("fr", "le chien est dans le jardin et je ne pense pas que les chats"),
      ("zh", "我 的 猫 是 不 在 家 里 这 有 很多 鱼")
    ).toDF("truth", "text")
    val got = df.select($"truth", TextOps.langId($"text").as("pred"))
      .as[(String, String)].collect()
    got.foreach { case (truth, pred) => assert(truth == pred, s"$truth predicted as $pred") }
  }

  test("langId returns 'und' when no markers match") {
    val got = Seq("zzz qqq xxx").toDF("text")
      .select(TextOps.langId($"text")).as[String].head()
    assert(got == "und")
  }

  test("qualityFeatures: clean prose scores higher than stopword/punct soup") {
    val df = Seq(
      ("clean", "distributed query engines optimize columnar scans through vectorized execution kernels and adaptive runtime planning strategies across many compute nodes with balanced partitions"),
      ("stopsoup", "the a the of to in is it the a of to the a of"),
      ("punctsoup", "!!! ??? ,,, ;;; ### $$$ %%% @@@ &&& ***")
    ).toDF("kind", "text")
    val scores = TextOps.qualityFeatures(df, "text")
      .select($"kind", $"quality_score").as[(String, Double)].collect().toMap
    assert(scores("clean") > scores("stopsoup"))
    assert(scores("clean") > scores("punctsoup"))
  }

  test("bpeish tokens split letter runs, digit runs, and punctuation") {
    val got = Seq("hello world42!").toDF("text")
      .select(TextOps.bpeishTokens($"text")).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "42", "!"))
  }

  test("rollingHash: equal texts collide, different texts don't") {
    val df = Seq((0L, "a b c"), (1L, "a b c"), (2L, "a b d")).toDF("id", "text")
    val h = df.select($"id", TextOps.rollingHash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(0L) == h(1L) && h(0L) != h(2L))
  }

  test("repetitionRatio flags loopy documents") {
    val df = Seq(
      ("loopy", "buy now buy now buy now buy now"),
      ("clean", "distributed engines favor declarative plans over loops"))
      .toDF("kind", "text")
      .select($"kind", TextOps.ngrams($"text", 2).as("_g"))
      .select($"kind", TextOps.repetitionRatioFromGrams($"_g").as("r"))
    val r = df.as[(String, Double)].collect().toMap
    assert(r("loopy") == 4.0 / 7.0) // "now buy" x3, "buy now" x4 of 7 bigrams
    assert(r("clean") < 0.2)
  }

  test("scrub masks emails and long digit runs, leaves prose alone") {
    val got = Seq("mail bob.smith+x@corp.io or call 5551234567 ext 12")
      .toDF("text").select(TextOps.scrub($"text")).as[String].head()
    assert(got == "mail <EMAIL> or call <NUM> ext 12")
  }

  test("topTerms excludes stopwords and ranks by count then term") {
    val df = Seq("the apple", "the banana apple", "cherry the").toDF("text")
    val got = TextOps.topTerms(df, "text", 10).as[(String, Long)].collect().toSeq
    assert(got == Seq(("apple", 2L), ("banana", 1L), ("cherry", 1L)))
  }

  test("buildVocab: dense ids by (count desc, token); minCount prunes before ids") {
    val df = Seq("b b b a a c", "a b d", "d").toDF("text")
    // counts: b=4, a=3, d=2, c=1
    val got = TextOps.buildVocab(df, "text", minCount = 2)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(got == Seq(("b", 4L, 0L), ("a", 3L, 1L), ("d", 2L, 2L)))
    // maxSize keeps the top V, ids still dense from 0
    val capped = TextOps.buildVocab(df, "text", minCount = 1, maxSize = Some(2))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(capped == Seq(("b", 4L, 0L), ("a", 3L, 1L)))
    // tie-break on token: equal counts order lexically
    val ties = Seq("z y", "y z").toDF("text")
    assert(TextOps.buildVocab(ties, "text")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._3)
      .map(_._1) == Seq("y", "z"))
    intercept[IllegalArgumentException] { TextOps.buildVocab(df, "text", 0) }
  }

  test("c4QualityFlags: line retention and each doc rule fire on planted violations") {
    val goodLine = "this line has enough words to pass the filter."
    val df = Seq(
      (0L, Seq(goodLine, goodLine, goodLine).mkString("\n")),          // keeps
      (1L, Seq(goodLine, "too short.", goodLine, goodLine).mkString("\n")), // short line dropped, doc keeps
      (2L, Seq(goodLine, "no terminal punctuation here at all", goodLine,
        goodLine).mkString("\n")),                                     // unterminated line dropped
      (3L, Seq(goodLine, goodLine).mkString("\n")),                    // only 2 kept → doc drops
      (4L, Seq(goodLine, goodLine, goodLine,
        "buy now Lorem Ipsum dolor sit amet.").mkString("\n")),        // lorem → drops (case-blind)
      (5L, Seq(goodLine, goodLine, goodLine, "function f() {.").mkString("\n")) // brace → drops
    ).toDF("id", "text")
    val got = TextOps.c4QualityFlags(df, "text", minLineWords = 5, minLinesKept = 3)
      .select("id", "n_lines", "n_lines_kept", "has_lorem", "has_brace", "keep", "clean_text")
      .as[(Long, Long, Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._6 == 1 && got(0L)._3 == 3)
    assert(got(1L)._6 == 1 && got(1L)._3 == 3, "short line dropped but doc keeps")
    assert(got(2L)._6 == 1 && got(2L)._3 == 3, "unterminated line dropped but doc keeps")
    assert(got(3L)._6 == 0 && got(3L)._3 == 2, "below minLinesKept must drop")
    assert(got(4L)._6 == 0 && got(4L)._4 == 1, "lorem ipsum must drop, case-insensitively")
    assert(got(5L)._6 == 0 && got(5L)._5 == 1, "curly brace must drop")
    // clean_text is exactly the retained lines, original order
    assert(got(1L)._7 == Seq(goodLine, goodLine, goodLine).mkString("\n"))
    // retained-line word count uses the trimmed line
    val ws = TextOps.c4QualityFlags(
      Seq((9L, "  one two three four five.  ")).toDF("id", "text"),
      "text", minLineWords = 5, minLinesKept = 1)
      .select("keep").as[Int].collect()
    assert(ws.head == 1, "leading/trailing whitespace must not break word count or punct rule")
  }

  test("dedupLinesWithinDoc keeps first occurrence in order; distinct docs untouched") {
    val df = Seq(
      (0L, "alpha beta\ngamma\nalpha beta\ndelta\ngamma\nalpha beta"), // dups at 3,5,6
      (1L, "one\ntwo\nthree"),                                          // no dups
      (2L, "same\nsame\nsame")                                          // all one line
    ).toDF("id", "text")
    val got = TextOps.dedupLinesWithinDoc(df, "text")
      .select("id", "n_lines", "n_lines_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(0L)._4 == "alpha beta\ngamma\ndelta" && got(0L)._3 == 3 && got(0L)._2 == 6)
    assert(got(1L)._4 == "one\ntwo\nthree" && got(1L)._3 == 3)
    assert(got(2L)._4 == "same" && got(2L)._3 == 1)
  }

  test("dedupLinesWithinDocScalable ≡ HOF form; linear path handles a long doc") {
    val df = Seq(
      (0L, "alpha beta\ngamma\nalpha beta\ndelta\ngamma\nalpha beta"),
      (1L, "one\ntwo\nthree"),
      (2L, "same\nsame\nsame"),
      (3L, ""),                                // empty text → one empty line
      (4L, "x\n\nx\n\ny"),                     // planted empty lines dedup too
      (5L, null: String))                      // NULL text must survive the join back
      .toDF("id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "n_lines", "n_lines_kept", "clean_text")
        .as[(Long, Option[Long], Option[Long], Option[String])]
        .collect().sortBy(_._1).toSeq
    val scalable = rows(TextOps.dedupLinesWithinDocScalable(df, "id", "text"))
    assert(scalable == rows(TextOps.dedupLinesWithinDoc(df, "text")))
    // the null-text row is PRESENT (left join) with the HOF twin's nulls
    assert(scalable.exists(r => r._1 == 5L && r._2.isEmpty && r._4.isEmpty),
      s"null-text row must survive with null outputs: $scalable")
    // other columns survive the join back
    val extra = TextOps.dedupLinesWithinDocScalable(
      df.withColumn("lang", lit("en")), "id", "text")
    assert(extra.columns.contains("lang"))
    // a pathological 20k-line doc (the HOF form's O(lines²) shape)
    // completes through the linear path with the exact contract
    val longDoc = Seq((7L, (1 to 20000).map(i => s"line${i % 500}").mkString("\n")))
      .toDF("id", "text")
    val got = rows(TextOps.dedupLinesWithinDocScalable(longDoc, "id", "text")).head
    assert(got == ((7L, Some(20000L), Some(500L),
      Some((1 to 500).map(i => s"line${i % 500}").mkString("\n")))))
  }

  test("unigramLogProb: matches a hand-computed corpus LM; rare tokens score worse") {
    // corpus: "a a b" ⊕ "a c" → counts a=3, b=1, c=1; total=5, V=3
    val df = Seq((0L, "a a b"), (1L, "a c")).toDF("id", "text")
    val got = TextOps.unigramLogProb(df, "id", "text", smoothing = 0.5)
      .select("id", "n_tokens", "mean_neg_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def lp(c: Long) = math.log((c + 0.5) / (5 + 0.5 * 3))
    def dec(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val d0 = -(dec(lp(3)) * 2 + dec(lp(1))).toDouble / 3
    val d1 = -(dec(lp(3)) + dec(lp(1))).toDouble / 2
    assert(got(0L)._2 == 3 && math.abs(got(0L)._3 - d0) < 5e-7, s"${got(0L)} vs $d0")
    assert(got(1L)._2 == 2 && math.abs(got(1L)._3 - d1) < 5e-7, s"${got(1L)} vs $d1")
    // doc of common tokens scores better (lower neg logprob) than rare-heavy doc
    assert(got(0L)._3 < got(1L)._3)
  }

  test("gopherQualityFlags: each rule fires on its planted violation") {
    val goodText = (("the data and machine learning pipeline that we have built " * 6)
      + "works with scale").trim  // 63 words, stopword-rich, mean len in band
    val df = Seq(
      ("good", goodText),
      ("short", "the and of that have with just a few words here"), // 11 < 50 words
      ("nostop", ("alpha beta gamma delta epsilon zeta " * 10).trim), // 0 stopwords
      ("symbols", (("the of and that have with " * 10).trim + " " + ("... " * 20).trim)),
      ("longwords", (("the of and " + "extraordinarily sesquipedalian incomprehensibilities " * 20).trim))
    ).toDF("kind", "text")
    val got = TextOps.gopherQualityFlags(df, "text")
      .select($"kind", $"ok_word_count", $"ok_mean_len", $"ok_symbol_ratio",
        $"ok_alpha_ratio", $"ok_stopwords", $"keep")
      .as[(String, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got("good") == ((1, 1, 1, 1, 1, 1)), s"good: ${got("good")}")
    assert(got("short")._1 == 0 && got("short")._6 == 0)
    assert(got("nostop")._5 == 0 && got("nostop")._6 == 0)
    // 20 "..." tokens over 80 words = 0.25 > 0.1; they also break the
    // alpha ratio (60/80 = 0.75 < 0.8)
    assert(got("symbols")._3 == 0 && got("symbols")._4 == 0 && got("symbols")._6 == 0)
    assert(got("longwords")._2 == 0 && got("longwords")._6 == 0)
  }

  test("gopherQualityFlags mean word length is exact integer arithmetic") {
    // "ab cde f" → 6 chars / 3 words = 2.0
    val got = TextOps.gopherQualityFlags(
      Seq(("x", "ab cde f")).toDF("k", "text"), "text")
      .select($"mean_word_len").as[Double].head()
    assert(got == 2.0)
  }

  test("chunkWindows: stride windows cover the doc with overlap") {
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = TextOps.chunkWindows(df, "doc_id", "text", win = 4, stride = 3)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"chunk_text", $"n_tokens")
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (0, "t1 t2 t3 t4", 4L),
      (1, "t4 t5 t6 t7", 4L),
      (2, "t7 t8 t9 t10", 4L)), s"got $got")
  }

  test("chunkWindows: short doc yields one whole-text chunk; tail is ragged") {
    val df = Seq((1L, "a b"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = TextOps.chunkWindows(df, "doc_id", "text", win = 4, stride = 3)
      .orderBy($"doc_id", $"chunk_idx")
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 0, "a b"), (2L, 0, "a b c d"), (2L, 1, "d e")), s"got $got")
    intercept[IllegalArgumentException] {
      TextOps.chunkWindows(df, "doc_id", "text", win = 4, stride = 5)
    }
  }

  test("unigram LM: frozen persisted model scores exactly like the in-plan fit; OOV takes the model's smoothing mass") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ran fast"),
      (3L, "cat dog cat")).toDF("doc_id", "text")
    val inPlan = TextOps.unigramLogProb(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"mean_neg_logprob")
      .as[(Long, Long, Double)].collect().toSet

    // the frozen path: persist the fit to parquet, reload, score — the
    // artifact round trip a streaming scorer depends on
    val dir = java.nio.file.Files.createTempDirectory("lm_model")
      .toFile.getAbsolutePath
    TextOps.unigramLmFit(docs, "text").write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val frozen = TextOps.unigramScoreWith(docs, "doc_id", "text", reloaded)
      .select($"doc_id", $"n_tokens", $"mean_neg_logprob")
      .as[(Long, Long, Double)].collect().toSet
    assert(frozen == inPlan, s"frozen=$frozen inPlan=$inPlan")

    // OOV: an unseen token scores the model's null-row (smoothing) mass
    val lp = reloaded.collect()
      .map(r => Option(r.getString(0)) -> r.getDecimal(1)).toMap
    // mirror the operator's arithmetic order: DECIMAL sum → double cast
    // → negate/divide → round(…, 6)
    val sumD = lp(Some("the")).add(lp(None)).doubleValue()
    val expected = BigDecimal(-sumD / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextOps.unigramScoreWith(
      Seq((9L, "the zzz")).toDF("doc_id", "text"), "doc_id", "text", reloaded)
      .select($"mean_neg_logprob").as[Double].head()
    assert(got == expected, s"got $got expected $expected, model lps: $lp")
  }

  test("htmlExtract: invisible blocks dropped, density promotion, entity order, null html") {
    val pages = Seq(
      // script/style/comment content must vanish ENTIRELY (brace + '<'
      // inside would otherwise leak into the text); the short heading is
      // promoted by its dense neighbor, the isolated footer is not
      (1L, "<html><head><style>a { b: c; }</style>" +
        "<script>if (x < 2) { y(); }</script></head><body>" +
        "<h2>Short heading</h2>" +
        "<p>one two three four five six seven eight.</p>" +
        "<!-- seven dense comment words should never appear -->" +
        "<footer>tiny</footer><footer>end</footer></body></html>"),
      // &amp;lt; must decode to the LITERAL '&lt;' (round trip), not '<'
      (2L, "<p>alpha beta gamma delta epsilon &amp;lt; zeta.</p>"),
      (3L, null: String))
      .toDF("doc_id", "html")
    val got = TextOps.htmlExtract(pages, "html")
      .select($"doc_id", $"n_raw_lines", $"n_content_lines", $"content_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

    val p1 = got(0)
    // heading, para, tiny, end — the para promotes BOTH neighbors
    // (heading above, tiny below); 'end' is adjacent only to the
    // non-dense 'tiny' and is the one line the heuristic drops
    assert(p1._2 == 4L, s"expected 4 raw lines, got $p1")
    assert(p1._3 == 3L, s"promotion: heading/para/tiny survive, end dropped: $p1")
    assert(p1._4 == "Short heading\none two three four five six seven eight.\ntiny")
    assert(!p1._4.contains("{") && !p1._4.contains("comment"))

    val p2 = got(1)
    assert(p2._4 == "alpha beta gamma delta epsilon &lt; zeta.", p2._4)

    val p3 = got(2)
    assert(p3._2 == 0L && p3._3 == 0L && p3._4 == "", s"null html: $p3")
  }

  test("canonicalizeUrl: case, ports, trackers, fragments, null discipline") {
    val cases = Seq(
      // scheme+host lowercase, path case PRESERVED, :443 dropped for https
      ("HTTPS://WWW.Ex.COM:443/Path/A", "https://www.ex.com/Path/A"),
      // :80 dropped only for http; non-default ports kept
      ("http://ex.com:80/a", "http://ex.com/a"),
      ("http://ex.com:8080/a", "http://ex.com:8080/a"),
      ("https://ex.com:80/a", "https://ex.com:80/a"),
      // fragment stripped; empty path → "/"
      ("https://ex.com#frag", "https://ex.com/"),
      // tracking params: leading-with-followers, middle, sole, multiple
      ("https://ex.com/p?utm_source=a&id=2", "https://ex.com/p?id=2"),
      ("https://ex.com/p?id=2&fbclid=x", "https://ex.com/p?id=2"),
      ("https://ex.com/p?gclid=x", "https://ex.com/p"),
      ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
      // non-tracking params keep their original order
      ("https://ex.com/p?b=2&a=1", "https://ex.com/p?b=2&a=1"),
      // '&' is a legal PATH character: a tracker-shaped path segment
      // must survive (round-10 review — the unanchored pass ate it)
      ("https://ex.com/a&gclid=1/x", "https://ex.com/a&gclid=1/x"),
      ("https://ex.com/a&utm_x=1?utm_y=2", "https://ex.com/a&utm_x=1"),
      // empty path normalizes to '/' WITH a query too: ?x=1 and /?x=1
      // are one resource (round-10 review)
      ("https://ex.com?x=1", "https://ex.com/?x=1"),
      ("https://ex.com/?x=1", "https://ex.com/?x=1"),
      ("https://ex.com?gclid=1", "https://ex.com/"))
    val out = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "url")
      .select($"i", TextOps.canonicalizeUrl($"url").as("c"))
      .as[(Int, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(out == cases.map(_._2), out.zip(cases).mkString("\n"))
    // no scheme / garbage → NULL (quarantine, not a fabricated form)
    val bad = Seq("notaurl", "www.ex.com/a", "").toDF("url")
      .select(TextOps.canonicalizeUrl($"url").as("c"))
      .filter($"c".isNotNull).count()
    assert(bad == 0L)
  }

  test("urlHost/urlDomain/urlPath: scheme, userinfo, port, query, edge cases") {
    import spark.implicits._
    val rows = Seq(
      "https://www.Sub.Example.ORG/a/b?q=1#f",
      "http://user:pw@api.example.com:8080/v1/x",
      "ftp://example.io",
      "not-a-url",
      "https://single/")
      .toDF("url")
      .select(
        TextOps.urlHost(col("url")).as("host"),
        TextOps.urlDomain(TextOps.urlHost(col("url"))).as("domain"),
        TextOps.urlPath(col("url")).as("path"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) == (("www.sub.example.org", "example.org", "/a/b")))
    assert(rows(1) == (("api.example.com", "example.com", "/v1/x")),
      rows(1).toString) // userinfo and port stripped
    assert(rows(2) == (("example.io", "example.io", ""))) // no path
    assert(rows(3) == (("", "", ""))) // schemeless → empty, not null
    assert(rows(4) == (("single", "", "/"))) // single-label host: no domain
  }

  test("bigram LM: stupid-backoff resolution tiers, hand-checked") {
    import spark.implicits._
    import java.math.{BigDecimal => JBD, RoundingMode}
    def q9(x: Double): JBD =
      new JBD(x).setScale(9, RoundingMode.HALF_UP)
    // fit on one doc "a b a": bigrams (BOS,a),(a,b),(b,a) each count 1
    // over prev totals 1 → every ML log-prob is ln(1) = 0.
    // unigrams: a×2, b×1 → total 3, V 2.
    val fit = Seq((1L, "a b a")).toDF("doc_id", "text")
    val model = TextOps.bigramLmFit(fit, "text")
    val rows = model.collect()
    assert(rows.count(r => !r.isNullAt(0)) == 3) // bigram rows
    assert(rows.filter(r => !r.isNullAt(0))
      .forall(_.getAs[JBD]("_lp").compareTo(JBD.ZERO) == 0))
    // backoff rows: ln(0.4·(c+0.5)/(3+0.5·2))
    val uniA = q9(math.log(0.4 * (2 + 0.5) / (3 + 0.5 * 2)))
    val oovLp = q9(math.log(0.4 * 0.5 / (3 + 0.5 * 2)))
    val uniRows = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getString(1) -> r.getAs[JBD]("_lp")).toMap
    assert(uniRows("a").compareTo(uniA) == 0)
    val oov = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(oov.length == 1 && oov.head.getAs[JBD]("_lp").compareTo(oovLp) == 0)

    // score: doc 2 hits all three tiers — (BOS,a) seen → 0;
    // (a,b) seen → 0; (b,c): c is OOV → OOV row. doc 3 "b b": both
    // pairs unseen, b in vocab → backoff row twice.
    val score = TextOps.bigramScoreWith(
      Seq((1L, "a b a"), (2L, "a b c"), (3L, "b b")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_backoff"),
          r.getAs[Double]("mean_neg_logprob"))).toMap
    assert(score(1L) == ((3L, 0L, 0.0))) // the fit doc: all ML hits, lp 0
    val uniB = q9(math.log(0.4 * (1 + 0.5) / (3 + 0.5 * 2)))
    // replicate the scorer's presentation exactly: exact decimal sum →
    // double cast → negate/divide → round(…, 6), which for doubles is
    // BigDecimal.valueOf(x).setScale(6, HALF_UP)
    def mean6(sum: JBD, n: Long): Double =
      JBD.valueOf(-sum.doubleValue() / n)
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
    assert(score(2L)._1 == 3L && score(2L)._2 == 1L)
    assert(score(2L)._3 == mean6(oovLp, 3L), s"doc2 mean ${score(2L)._3}")
    assert(score(3L)._1 == 2L && score(3L)._2 == 2L)
    assert(score(3L)._3 == mean6(uniB.add(uniB), 2L),
      s"doc3 mean ${score(3L)._3}")
  }

  test("bigram LM: frozen model persists, reloads, scores identically") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran"),
      (3L, "a dog sat here")).toDF("doc_id", "text")
    val model = TextOps.bigramLmFit(docs.filter($"doc_id" < 3), "text")
    val dir = java.nio.file.Files.createTempDirectory("bigram_lm").toString
    model.write.mode("overwrite").parquet(dir)
    val live = TextOps.bigramScoreWith(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_backoff"),
        r.getAs[Double]("mean_neg_logprob"))).toSet
    val frozen = TextOps.bigramScoreWith(docs, "doc_id", "text",
        spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_backoff"),
        r.getAs[Double]("mean_neg_logprob"))).toSet
    assert(live == frozen)
    // doc 3 is fully outside the fit corpus: every pair misses
    assert(live.exists(t => t._1 == 3L && t._2 == 4L), live.toString)
  }

  test("KN bigram: every resolution tier hand-checked") {
    import spark.implicits._
    import java.math.{BigDecimal => JBD, RoundingMode}
    def q9(x: Double): JBD =
      new JBD(x).setScale(9, RoundingMode.HALF_UP)
    // fit "a b b" + "b a": cb (B,a)=1 (a,b)=1 (b,b)=1 (B,b)=1 (b,a)=1
    // → T=5; cp: B(2, n1p 2) a(1, 1) b(2, 2); n1c: a←{B,b}=2, b←{a,b,B}=3
    val fit = Seq((0L, "a b b"), (2L, "b a")).toDF("doc_id", "text")
    val model = TextOps.knBigramFit(fit, "text")
    // tier 1 row check: (a,b) = ln((1−.75)/1 + (.75·1/1)·(3/5)) = ln(.7)
    val biAB = model.filter(col("_prev") === "a" && col("_tok") === "b")
      .collect().head.getAs[JBD]("_lp")
    assert(biAB.compareTo(q9(math.log(0.25 / 1 + (0.75 * 1 / 1) * (3.0 / 5)))) == 0)
    def mean6(sum: JBD, n: Long): Double =
      JBD.valueOf(-sum.doubleValue() / n)
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
    val score = TextOps.knBigramScoreWith(
      Seq((1L, "a b z"), (3L, "a a"), (5L, "z a")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_backoff"),
          r.getAs[Long]("n_oov"), r.getAs[Double]("mean_neg_logprob")))).toMap
    // doc 1 "a b z": (B,a) seen = ln(.125+.75·.4)=ln(.425); (a,b) seen
    // = ln(.7); (b,z) OOV → ln(.75/5) = ln(.15). backoff 1, oov 1.
    val lpBA = q9(math.log((1 - 0.75) / 2.0 + (0.75 * 2 / 2.0) * (2.0 / 5)))
    val lpAB = q9(math.log(0.25 / 1 + (0.75 * 1 / 1) * (3.0 / 5)))
    val lpOov = q9(math.log(0.75 / 5))
    assert(score(1L)._1 == 3L && score(1L)._2 == 1L && score(1L)._3 == 1L)
    assert(score(1L)._4 == mean6(lpBA.add(lpAB).add(lpOov), 3L), score(1L))
    // doc 3 "a a": (B,a) seen; (a,a) unseen pair, seen context+word →
    // λ(a)·p_cont(a) = q(ln .75) + q(ln .4) — the exact decimal add
    val lpTier2 = q9(math.log(0.75 * 1 / 1.0)).add(q9(math.log(2.0 / 5)))
    assert(score(3L)._1 == 2L && score(3L)._2 == 1L && score(3L)._3 == 0L)
    assert(score(3L)._4 == mean6(lpBA.add(lpTier2), 2L), score(3L))
    // doc 5 "z a": (B,z) OOV; (z,a) unseen CONTEXT, seen word →
    // p_cont(a) alone = q(ln .4). backoff 2, oov 1.
    assert(score(5L)._1 == 2L && score(5L)._2 == 2L && score(5L)._3 == 1L)
    assert(score(5L)._4 == mean6(lpOov.add(q9(math.log(2.0 / 5))), 2L),
      score(5L))
    intercept[IllegalArgumentException] {
      TextOps.knBigramFit(fit, "text", discount = 1.0)
    }
  }

  test("KN bigram: continuation backoff beats frequency backoff ('Francisco')") {
    import spark.implicits._
    // x and y are equally frequent (3 each), but x follows THREE
    // distinct contexts while y always follows f. In a novel context,
    // KN must prefer x — the property stupid backoff (frequency-
    // proportional) cannot express.
    val fit = Seq((0L, "c x"), (2L, "d x"), (4L, "e x"),
      (6L, "f y"), (8L, "f y"), (10L, "f y")).toDF("doc_id", "text")
    val model = TextOps.knBigramFit(fit, "text")
    val score = TextOps.knBigramScoreWith(
      Seq((1L, "q x"), (3L, "q y")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Double]("mean_neg_logprob")).toMap
    assert(score(1L) < score(3L),
      s"promiscuous x must outscore context-bound y: $score")
  }

  test("urlDomain: PSL snapshot — exact, wildcard, exception, default rules") {
    import spark.implicits._
    val cases = Seq(
      // exact multi-label rules
      "example.co.uk" -> "example.co.uk",
      "www.example.co.uk" -> "example.co.uk",
      "deep.sub.example.com.au" -> "example.com.au",
      "agency.gov.br" -> "agency.gov.br",
      // 3-label exact rule
      "school.k12.ca.us" -> "school.k12.ca.us",
      "www.school.k12.ca.us" -> "school.k12.ca.us",
      // wildcard *.ck: every 2nd-level label is a registry
      "shop.foo.ck" -> "shop.foo.ck",
      "foo.ck" -> "", // IS a public suffix under the wildcard
      // exception !www.ck overrides the wildcard
      "www.ck" -> "www.ck",
      "sub.www.ck" -> "www.ck",
      // private-section suffix
      "user.github.io" -> "user.github.io",
      "www.user.github.io" -> "user.github.io",
      // default rule: unknown TLD → last two labels (old behavior)
      "www.example.org" -> "example.org",
      "site3.example" -> "site3.example",
      // no registrable domain
      "co.uk" -> "",
      "localhost" -> "",
      "" -> "")
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), TextOps.urlDomain(col("host")).as("domain"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    cases.zip(got).foreach { case ((h, want), (_, d)) =>
      assert(d == want, s"host=$h want=$want got=$d")
    }
  }

  test("urlDomain: PSL invariants hold over randomized hosts") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val suffixes = Seq("co.uk", "com.au", "gov.br", "k12.ca.us", "github.io",
      "foo.ck", "www.ck", "com", "org", "example", "zz", "uk", "ck")
    def label() = ('a' + rng.nextInt(26)).toChar.toString +
      ('a' + rng.nextInt(26)).toChar.toString
    val hosts = (1 to 300).map { _ =>
      val depth = rng.nextInt(3) // 0-2 extra labels
      val sfx = suffixes(rng.nextInt(suffixes.length))
      ((1 to depth).map(_ => label()) :+ sfx).mkString(".")
    }.distinct
    val got = hosts.toDF("host")
      .select(col("host"), TextOps.urlDomain(col("host")).as("domain"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    for ((h, d) <- got) {
      // the registrable domain is always a label-aligned suffix of the
      // host (or empty: the host IS a public suffix / single label)
      assert(d == "" || d == h || h.endsWith("." + d), s"host=$h domain=$d")
    }
    // idempotence: a registrable domain is its own registrable domain
    val domains = got.map(_._2).filter(_.nonEmpty).distinct
    val again = domains.toSeq.toDF("host")
      .select(col("host"), TextOps.urlDomain(col("host")).as("domain"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    for ((h, d) <- again)
      assert(d == h, s"registrableDomain not idempotent: $h -> $d")
  }

  test("domainDiversityCap: blocklist drops, cap binds, deterministic") {
    import spark.implicits._
    // 30 docs over 3 domains (10 each), one blocked, cap n=4
    val docs = (0L until 30L).map(i =>
      (i, s"https://site${i % 3}.example/p$i")).toDF("doc_id", "url")
    val out = TextOps.domainDiversityCap(docs, "url", "doc_id", n = 4,
      seed = 7L, blocked = Seq("site1.example"))
    val byDomain = out.groupBy($"domain").count()
      .as[(String, Long)].collect().toMap
    assert(byDomain == Map("site0.example" -> 4L, "site2.example" -> 4L))
    // deterministic under repartitioning
    val again = TextOps.domainDiversityCap(docs.repartition(11), "url",
      "doc_id", n = 4, seed = 7L, blocked = Seq("site1.example"))
      .select($"doc_id").as[Long].collect().toSet
    assert(again == out.select($"doc_id").as[Long].collect().toSet)
  }

  test("vocabGrowth: hand-computed Heaps points; counts monotone, TTR sane") {
    // ids 0-3; prefix 0.5 ⇒ ids < 2 (docs 0,1)
    val docs = Seq(
      (0L, "a b a"),      // 3 toks, terms {a,b}
      (1L, "b c"),        // +2 toks, new term {c}
      (2L, "c c d"),      // +3 toks, new term {d}
      (3L, "a e"))        // +2 toks, new term {e}
      .toDF("doc_id", "text")
    val out = TextOps.vocabGrowth(docs, "doc_id", "text",
        fractions = Seq(0.5, 1.0))
      .as[(Double, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0.5, 2L, 5L, 3L, 3.0 / 5),
      (1.0, 4L, 10L, 5L, 5.0 / 10)), out)
    // monotone by construction: both counts never decrease with the prefix
    val sorted = out.sortBy(_._1)
    assert(sorted.sliding(2).forall {
      case Seq(a, b) => b._3 >= a._3 && b._4 >= a._4
      case _ => true
    })
    intercept[IllegalArgumentException] {
      TextOps.vocabGrowth(docs, "doc_id", "text", fractions = Seq(0.0))
    }
  }

  test("sourceDivergence: hand-computed TVD, metric properties, __other lumping") {
    val docs = Seq(
      ("s1", "a a b"), ("s1", "a"),      // s1: a=3, b=1, N=4
      ("s2", "a b b b"),                  // s2: a=1, b=3, M=4
      ("s3", "a a b c"))                  // s3: a=2, b=1, c=1
      .toDF("src", "text")
    val out = TextOps.sourceDivergence(docs, "src", "text")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._5)).toMap
    // TVD(s1,s2) = ½(|3/4−1/4| + |1/4−3/4|) = 0.5
    assert(out(("s1", "s2")) == 0.5, out)
    // identical distributions at distance 0 would need equal rows; all
    // pairs here differ — bounds + symmetry-free (a<b) grid
    assert(out.size == 3 && out.values.forall(v => v >= 0.0 && v <= 1.0))
    // __other lumping: with topK=1 only 'a' (count 6, ties → lowest
    // term) survives; s1=(a 3, other 1), s2=(a 1, other 3) ⇒ TVD 0.5
    val lumped = TextOps.sourceDivergence(docs, "src", "text", topK = 1)
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._5)).toMap
    assert(lumped(("s1", "s2")) == 0.5, lumped)
    // s1 vs s3 coarsened: s1=(3,1)/4, s3=(2,2)/4 ⇒ ½(1/4+1/4) = 0.25
    assert(lumped(("s1", "s3")) == 0.25, lumped)
  }

  test("readability: hand-computed FK grade; fragments and NULLs degrade cleanly") {
    import spark.implicits._
    // "Hello world. It works!" → 4 words, 2 sentences,
    // syllables (vowel runs): he-llo 2, world 1, it 1, works 1 = 5
    val df = Seq(
      (1L, "Hello world. It works!"),
      (2L, "no punctuation here"),   // sentences floored at 1
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.readability(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
    val r1 = got(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((4L, 2L, 5L)), r1)
    val expected = 0.39 * (4.0 / 2.0) + 11.8 * (5.0 / 4.0) - 15.59
    assert(r1.getDouble(4) == expected, r1)
    val r2 = got(1)
    assert(r2.getLong(2) == 1L, r2)
    assert(got(2).getLong(1) == 0L && got(2).isNullAt(4), got(2))
    assert(got(3).isNullAt(4), got(3))
  }

  test("zipfSlope matches a plain-Scala quantized-OLS replay exactly") {
    import spark.implicits._
    // ~1/rank frequency profile: w_i appears 120/i times — a Zipf-ish
    // head whose fitted slope should sit near −1
    val words = (1 to 30).flatMap(i => Seq.fill(120 / i)(f"w$i%02d"))
    val docs = words.grouped(17).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val got = TextOps.zipfSlope(docs, "text", topK = 25).collect().head

    // the SAME quantize→integer-OLS chain, replayed locally
    def q6(v: Double): Long =
      (BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000)).toLongExact
    val counts = words.groupBy(identity).map { case (w, v) => (w, v.size.toLong) }
    val top = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(25)
    val xs = top.indices.map(i => q6(math.log(i + 1.0)))
    val ys = top.map { case (_, c) => q6(math.log(c.toDouble)) }
    val k = top.size
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(x => x * x).sum
    val num = BigDecimal(k) * BigDecimal(sxy) - BigDecimal(sx) * BigDecimal(sy)
    val den = BigDecimal(k) * BigDecimal(sxx) - BigDecimal(sx) * BigDecimal(sx)
    val slope = num.toDouble / den.toDouble
    val intercept = (sy.toDouble / 1.0e6 - slope * (sx.toDouble / 1.0e6)) / k.toDouble
    assert(got.getLong(0) == k)
    assert(got.getDouble(1) == slope, s"slope ${got.getDouble(1)} vs $slope")
    assert(got.getDouble(2) == intercept)
    assert(slope < -0.7 && slope > -1.3, s"fixture should be Zipf-ish, got $slope")
  }

  test("zipfSlope: topK caps n_terms; flat counts fit slope 0") {
    import spark.implicits._
    // 10 terms, every count equal → ln(freq) constant → slope exactly 0
    val docs = Seq((0L, (1 to 10).map(i => s"t$i t$i t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val flat = TextOps.zipfSlope(docs, "text", topK = 5).collect().head
    assert(flat.getLong(0) == 5)
    assert(flat.getDouble(1) == 0.0, s"flat counts must fit slope 0, got $flat")
    intercept[IllegalArgumentException] {
      TextOps.zipfSlope(docs, "text", topK = 2)
    }
  }

  test("codeDetect: code flags, prose passes, empty text is 0-ratio not NaN") {
    import spark.implicits._
    val rows = Seq(
      (1L, "def main(args): return args[0]; x = {1: 2}; print(x);"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "")).toDF("doc_id", "text")
    val (nSym, nKw, symR, kwR, isCode) = TextOps.codeDetect(col("text"))
    val out = rows.select(col("doc_id"), nSym, nKw, symR, kwR, isCode)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getInt(5)))).toMap
    assert(out(1L)._5 == 1, out(1L))
    assert(out(1L)._1 >= 8 && out(1L)._2 >= 2)
    assert(out(2L)._5 == 0 && out(2L)._1 == 0L)
    assert(out(3L) == ((0L, 0L, 0.0, 0.0, 0)), out(3L))
  }

  // --- ccnetSplit ------------------------------------------------------

  test("ccnetSplit: hand-computed terciles with exact decimal means") {
    // 9 docs, scores 1.0..9.0 → buckets of 3 by (score asc, id)
    val rows = (1L to 9L).map(i => (i, i.toDouble, 10L * i))
    val out = TextOps.ccnetSplit(rows.toDF("id", "nll", "tok"),
      "id", "nll", "tok")
      .as[(String, Int, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(out.map(t => (t._1, t._2)) ==
      Seq(("head", 0), ("middle", 1), ("tail", 2)))
    assert(out.map(_._3) == Seq(3L, 3L, 3L))
    assert(out.map(_._4) == Seq(60L, 150L, 240L)) // token sums
    assert(out.map(_._5) == Seq(2.0, 5.0, 8.0)) // exact decimal means
    assert(out.head._6 == 1.0 && out.head._7 == 3.0)
  }

  test("ccnetSplit: tied scores straddle bucket edges by id, deterministically") {
    val rows = (1L to 6L).map(i => (i, 0.5, 1L))
    val a = TextOps.ccnetSplit(rows.toDF("id", "nll", "tok"),
      "id", "nll", "tok")
      .as[(String, Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(a.map(_._3) == Seq(2L, 2L, 2L))
    val b = TextOps.ccnetSplit(rows.toDF("id", "nll", "tok").repartition(5),
      "id", "nll", "tok")
      .as[(String, Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(a == b)
  }
}
