package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // Two cleanly separated "languages" plus one ambiguous doc whose
  // evidence ties, exercising the label-ASC tie-break.
  private def corpus = Seq(
    (0L, "aa", "aa aa aa"),
    (1L, "aa", "aa aa"),
    (2L, "bb", "bb bb bb"),
    (3L, "bb", "bb bb")).toDF("doc_id", "lang", "text")

  test("nbFit model: hand-computed log-probs, default mass, and priors") {
    val m = ClassifyOps.nbFit(corpus, "text", "lang", smoothing = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (Option(r.getDecimal(2)), Option(r.getDecimal(3)))).toMap
    // class aa: total 5 tokens, V = 2 global vocab
    //   lp(aa|aa) = ln(5.5/6) ; default = ln(0.5/6) ; prior = ln(2/4)
    def q(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(m(("aa", "aa"))._1.get) == q(math.log(5.5 / 6.0)))
    assert(m(("aa", "aa"))._2.isEmpty, "token rows carry no prior")
    val (dlpAa, priorAa) = m(("aa", null))
    assert(BigDecimal(dlpAa.get) == q(math.log(0.5 / 6.0)))
    assert(BigDecimal(priorAa.get) == q(math.log(0.5)))
    // class bb mirrors class aa exactly (symmetric corpus)
    assert(m(("bb", "bb"))._1 == m(("aa", "aa"))._1)
    assert(m(("bb", null)) == m(("aa", null)))
    // vocabulary rows: only tokens OBSERVED in the class
    assert(!m.contains(("aa", "bb")) && !m.contains(("bb", "aa")))
  }

  test("nbClassifyWith: argmax recovers the separated classes; tie breaks label-ASC") {
    val model = ClassifyOps.nbFit(corpus, "text", "lang")
    val test = Seq(
      (10L, "aa aa"), // clearly aa
      (11L, "bb"), // clearly bb
      (12L, "aa bb"), // symmetric evidence, symmetric priors → tie → 'aa'
      (13L, "zz zz")) // all-OOV: default mass ties → 'aa'
      .toDF("doc_id", "text")
    val got = ClassifyOps.nbClassifyWith(test, "doc_id", "text", model)
      .select($"doc_id", $"pred_label").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "aa", 11L -> "bb", 12L -> "aa", 13L -> "aa"))
  }

  test("frozen model: persist → reload → score is bit-exact vs in-plan fit") {
    val model = ClassifyOps.nbFit(corpus, "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    model.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val test = Seq((20L, "aa bb bb"), (21L, "bb zz")).toDF("doc_id", "text")
    val a = ClassifyOps.nbScoreWith(test, "doc_id", "text", model)
      .orderBy($"doc_id", $"_label").collect().toSeq
    val b = ClassifyOps.nbScoreWith(test, "doc_id", "text", reloaded)
      .orderBy($"doc_id", $"_label").collect().toSeq
    assert(a == b)
  }

  test("nbScoreWith: score equals prior + sum(cnt·lp) with OOV default, exactly") {
    val model = ClassifyOps.nbFit(corpus, "text", "lang")
    // doc: 2×aa + 1×zz(OOV) scored against class aa
    val scored = ClassifyOps.nbScoreWith(
      Seq((30L, "aa zz aa")).toDF("doc_id", "text"), "doc_id", "text", model)
      .filter($"_label" === "aa").collect().head
    def q(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = q(math.log(0.5)) + 2 * q(math.log(5.5 / 6.0)) + q(math.log(0.5 / 6.0))
    assert(scored.getAs[Long]("n_tokens") == 3L)
    assert(BigDecimal(scored.getDecimal(3)) == expected)
  }

  test("docs with no tokens are absent (the bpeEncode drop contract)") {
    val model = ClassifyOps.nbFit(corpus, "text", "lang")
    val out = ClassifyOps.nbClassifyWith(
      Seq((40L, "aa"), (41L, "   "), (42L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"),
      "doc_id", "text", model)
    assert(out.select($"doc_id").as[Long].collect().toSeq == Seq(40L))
  }

  test("model decimals are scale 6 (the quantize-once presentation contract)") {
    val model = ClassifyOps.nbFit(corpus, "text", "lang")
    val lpType = model.schema("_lp").dataType.asInstanceOf[DecimalType]
    val priorType = model.schema("_prior").dataType.asInstanceOf[DecimalType]
    assert(lpType.scale == 6 && priorType.scale == 6)
    // and the classify output is an exact multiple of 1e-6
    val negLl = ClassifyOps.nbClassifyWith(
      Seq((50L, "aa bb")).toDF("doc_id", "text"), "doc_id", "text", model)
      .select($"neg_ll").as[Double].collect().head
    assert((negLl * 1e6).isWhole)
  }
}
