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
}
