package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.SimilarityOps

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine_sim native expression equals the HOF composition bit-exactly") {
    GraftFunctions.register(spark)
    val pairs = emb.select($"vec_id".as("a_id"), $"embedding".as("a"))
      .crossJoin(emb.filter($"vec_id" < 10).select($"vec_id".as("b_id"), $"embedding".as("b")))
    val both = pairs.select(
      call_function("cosine_sim",
        SimilarityOps.asDouble($"a"), SimilarityOps.asDouble($"b")).as("native"),
      SimilarityOps.cosine(SimilarityOps.asDouble($"a"), SimilarityOps.asDouble($"b")).as("hof"))
    // HOF fold and the fused loop run the same IEEE op order → bit equal
    assert(both.filter($"native" =!= $"hof").count() == 0)
    assert(both.count() == emb.count() * 10)
  }

  test("cosine_sim is available in SQL after registration and is not a UDF node") {
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_v")
    val df = spark.sql(
      """SELECT a.vec_id, cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                            CAST(a.embedding AS ARRAY<DOUBLE>)) AS self_cos
        |FROM emb_v a WHERE a.vec_id < 5""".stripMargin)
    val vals = df.select($"self_cos").as[Double].collect()
    assert(vals.length == 5 && vals.forall(v => math.abs(v - 1.0) < 1e-12))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim") && !plan.contains("BatchEvalPython")
      && !plan.contains("ScalaUDF"), plan)
  }

  test("cosine_sim returns null on dimension mismatch (matches HOF semantics)") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(call_function("cosine_sim", $"a", $"b").as("c"))
    assert(df.head().isNullAt(0))
  }

  test("GraftExtensions wires the same builders (injectFunction path)") {
    // the extensions object enumerates exactly the registered builders;
    // applying it to a fresh SparkSessionExtensions must not throw
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftFunctions.builders.map(_._1) ==
      Seq("cosine_sim", "dot_product", "minhash_sig", "minhash_shingle_sig",
        "simhash_sig", "shingle_array", "nfkc_normalize",
        "trigram_bucket_hash", "sorted_inter_size", "holt_fold",
        "ngram_generate", "bloom_filter_agg", "might_contain",
        "kll_sketch_agg", "kll_union_agg", "kll_quantile",
        "theta_sketch_agg", "theta_union_agg", "theta_intersect",
        "theta_a_not_b", "theta_estimate",
        "freq_sketch_agg", "freq_merge_agg", "freq_topk"))
  }

  test("sorted_inter_size equals array_intersect size on sorted distinct inputs") {
    GraftFunctions.register(spark)
    val cases = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 5L, 10L)),   // partial overlap
      (Seq(1L, 2L), Seq(3L, 4L)),                     // disjoint
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),             // identical
      (Seq.empty[Long], Seq(1L, 2L)),                 // empty side
      (Seq(5L), Seq(1L, 2L, 3L, 4L, 5L, 6L)))         // subset walk
    val df = cases.toDF("a", "b")
    val got = df.select(
      call_function("sorted_inter_size", $"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).as("ref"))
      .as[(Int, Int)].collect()
    got.foreach { case (fast, ref) => assert(fast == ref, s"$fast vs $ref") }
    // codegen and interpreted agree (same walk): force interpreted eval
    val expr = SortedInterSize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1L, 3L, 5L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(3L, 5L, 7L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(expr.eval(null) == 2)
  }

  test("ngram_generate ≡ posexplode(shingle_array) on every edge case") {
    GraftFunctions.register(spark)
    val df = Seq(
      Seq("a", "b", "c", "d"),            // normal
      Seq("a"),                           // shorter than n → one joined row
      Seq("a", null, "c"),                // null element (concatWs skips)
      Seq.empty[String],                  // empty → no rows
      null.asInstanceOf[Seq[String]])     // null array → no rows
      .toDF("toks")
    val gen = df.select(
      call_function("ngram_generate", $"toks", lit(2)))
      .as[(Int, String)].collect().toSeq.sorted
    val ref = df.select(
      posexplode(call_function("shingle_array", $"toks", lit(2))))
      .as[(Int, String)].collect().toSeq.sorted
    assert(gen == ref, s"gen=$gen ref=$ref")
    assert(gen.contains((0, "a b")) && gen.contains((1, "b c")))
    // the plan is a Generate over the generator, not explode-of-array
    val plan = df.select(call_function("ngram_generate", $"toks", lit(2)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ngram_generate") && plan.contains("Generate"),
      plan.take(1500))
  }

  test("nfkc_normalize: encoding-variant strings become identical pre-hash") {
    GraftFunctions.register(spark)
    val composed = "café"              // é as one codepoint
    val decomposed = "café"           // e + combining acute
    val pairs = Seq(
      (composed, decomposed),
      ("ＡＢ", "AB"),               // full-width A B → ASCII
      ("ﬁle", "file"),                 // fi ligature
      ("a b", "a b"))                  // NBSP → space
      .toDF("x", "y")
    val normed = pairs.select(
      call_function("nfkc_normalize", $"x").as("nx"),
      call_function("nfkc_normalize", $"y").as("ny"))
    assert(normed.filter($"nx" =!= $"ny").count() == 0)
    // without normalization every pair differs (the dedup-escape case)
    assert(pairs.filter($"x" === $"y").count() == 0)
    // the full normalizeForDedup chain: case + whitespace + trim
    val chain = Seq(("  CafÉ   x\ty  ", "café x y")).toDF("x", "want")
      .select(graft.ops.TextOps.normalizeForDedup(spark, $"x").as("got"), $"want")
    assert(chain.filter($"got" =!= $"want").count() == 0)
    // stays a codegen expression, not a UDF
    val plan = normed.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // null propagates
    assert(Seq(Option.empty[String]).toDF("x")
      .select(call_function("nfkc_normalize", $"x")).head().isNullAt(0))
  }

  test("shingle_array equals the HOF shingles form byte-for-byte") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(1, 2, 3, 5)) {
      val both = docs.select(
        call_function("shingle_array",
          split(lower($"text"), "\\s+"), lit(n)).as("fast"),
        graft.ops.DedupOps.shingles($"text", n).as("hof"))
      assert(both.filter(not($"fast" <=> $"hof")).count() == 0, s"n=$n")
    }
    // short-input edge cases: fewer tokens than n → one whole-text shingle
    val edge = Seq("one two", "solo", "").toDF("text")
    for (n <- Seq(3, 5)) {
      val both = edge.select(
        call_function("shingle_array",
          split(lower($"text"), "\\s+"), lit(n)).as("fast"),
        graft.ops.DedupOps.shingles($"text", n).as("hof"))
      assert(both.filter(not($"fast" <=> $"hof")).count() == 0, s"edge n=$n")
    }
    // NULL array elements: must match the HOF's concat_ws null-skip under
    // every ArrayData representation (isNullAt guard, not bare
    // getUTF8String — UnsafeArrayData yields "" for a null slot)
    val withNulls = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', 'c') AS toks")
    for (n <- Seq(2, 3)) {
      val both = withNulls.select(
        call_function("shingle_array", $"toks", lit(n)).as("fast"),
        transform(sequence(lit(0), size($"toks") - n),
          i => concat_ws(" ", slice($"toks", i + 1, lit(n)))).as("hof"))
      assert(both.filter(not($"fast" <=> $"hof")).count() == 0, s"nulls n=$n")
    }
    // minhash_shingle_sig under the same null-element input: equals the
    // sig-of-shingle_array composition (shared null-skip semantics)
    val sigBoth = withNulls.select(
      call_function("minhash_shingle_sig", $"toks", lit(64), lit(2)).as("fused"),
      call_function("minhash_sig",
        call_function("shingle_array", $"toks", lit(2)), lit(64)).as("composed"))
    assert(sigBoth.filter(not($"fused" <=> $"composed")).count() == 0)
  }

  test("dot_product native expression equals the HOF fold bit-exactly") {
    GraftFunctions.register(spark)
    val pairs = emb.select($"vec_id".as("a_id"), $"embedding".as("a"))
      .crossJoin(emb.filter($"vec_id" < 10).select($"vec_id".as("b_id"), $"embedding".as("b")))
    val both = pairs.select(
      call_function("dot_product",
        SimilarityOps.asDouble($"a"), SimilarityOps.asDouble($"b")).as("native"),
      SimilarityOps.dot(SimilarityOps.asDouble($"a"), SimilarityOps.asDouble($"b")).as("hof"))
    assert(both.filter(not($"native" <=> $"hof")).count() == 0)
  }

  test("minhash_shingle_sig fused tokens→shingles→sig equals the composed form") {
    GraftFunctions.register(spark)
    val docs = ((1 to 200).map(i =>
      (i.toLong, s"doc $i topic ${i % 7} " + ("lorem ipsum dolor sit " * (i % 6)).trim)) ++
      Seq((900L, ""), (901L, "one"), (902L, "one two"), (903L, "one two three")))
      .toDF("doc_id", "text")
    val toks = split(lower($"text"), "\\s+")
    val both = docs.select(
      call_function("minhash_shingle_sig", toks, lit(64), lit(3)).as("fused"),
      graft.ops.DedupOps.minhashSignatureFromShingles(
        graft.ops.DedupOps.shingles($"text", 3), 64).as("composed"))
    assert(both.filter(not($"fused" <=> $"composed")).count() == 0)
  }

  test("minhash_sig native expression equals the HOF fold bit-exactly") {
    GraftFunctions.register(spark)
    val docs = (1 to 200).map(i =>
      (i.toLong, s"document $i about topic ${i % 7} with shared words " +
        ("lorem ipsum dolor " * (i % 5 + 1)))).toDF("doc_id", "text")
    val sh = graft.ops.DedupOps.shingles($"text", 3)
    val both = docs
      .select($"doc_id", sh.as("_sh"))
      .select(
        call_function("minhash_sig", $"_sh", lit(64)).as("native"),
        graft.ops.DedupOps.minhashSignatureFromShingles($"_sh", 64).as("hof"))
    assert(both.filter(not($"native" <=> $"hof")).count() == 0)
    // interpreted eval == codegen eval (empty array edge included)
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(call_function("minhash_sig", $"sh", lit(8)).as("sig"))
      .as[Seq[Long]].head()
    assert(empty == Seq.fill(8)(Long.MaxValue))
  }

  test("simhash_sig native expression equals the HOF fold bit-exactly") {
    GraftFunctions.register(spark)
    val docs = (1 to 200).map(i =>
      (i.toLong, s"tokens vary ${i % 13} across documents " +
        ("alpha beta gamma " * (i % 4 + 1)))).toDF("doc_id", "text")
    val toks = split(lower($"text"), "\\s+")
    val both = docs.select(
      call_function("simhash_sig", toks).as("native"),
      graft.ops.DedupOps.simhash($"text").as("hof"))
    assert(both.filter(not($"native" <=> $"hof")).count() == 0)
  }

  test("null array elements hash like the fold (xxhash64(null) = seed) in both sigs") {
    GraftFunctions.register(spark)
    // arrays WITH null elements: Spark's xxhash64(null) passes the seed
    // through, so the fold still contributes candidates for them — the
    // native expressions must agree bit-exactly, not skip the element
    val arrs = Seq(
      Seq(Option("alpha"), None, Option("beta")),
      Seq(None, None),
      Seq(Option("gamma"))).toDF("sh")
    val minhashBoth = arrs.select(
      call_function("minhash_sig", $"sh", lit(16)).as("native"),
      graft.ops.DedupOps.minhashSignatureFromShingles($"sh", 16).as("hof"))
    assert(minhashBoth.filter(not($"native" <=> $"hof")).count() == 0)
    // a null element must CHANGE the signature vs dropping it
    val withVsWithout = Seq((Seq(Option("alpha"), None), Seq(Option("alpha"))))
      .toDF("a", "b")
      .select(call_function("minhash_sig", $"a", lit(16)).as("na"),
        call_function("minhash_sig", $"b", lit(16)).as("nb"))
      .head()
    assert(withVsWithout.getSeq[Long](0) != withVsWithout.getSeq[Long](1))

    // simhash: same property against the inlined ±1 fold
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val hashes = transform($"sh", t => xxhash64(t))
    val counts = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks,
        (c, m) => c + when(h.bitwiseAND(m) =!= 0L, lit(1L)).otherwise(lit(-1L))))
    val foldSig = aggregate(
      zip_with(counts, masks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
    val simBoth = arrs.select(
      call_function("simhash_sig", $"sh").as("native"), foldSig.as("hof"))
    assert(simBoth.filter(not($"native" <=> $"hof")).count() == 0)
  }

  test("trigram_bucket_hash equals the two-projection HOF chain exactly") {
    graft.expressions.GraftFunctions.register(spark)
    // real corpus text + hand-picked edges: empty, 1/2/3 chars, mixed
    // case (lowercase must apply), multibyte BMP, punctuation
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").limit(200)
      .union(Seq("", "a", "ab", "abc", "AbC", "的是了在", "a b\tc!?")
        .toDF("text"))
    // THREE forms mutually pinned: the codegen expression, the
    // two-projection cps fold, and the per-gram substr form
    // (charTrigramBuckets — the column twin of the oracle SQL's
    // substr+split reading)
    val both = docs
      .select($"text", graft.ops.LangIdOps.cpsOf($"text").as("_cps"))
      .select(
        call_function("trigram_bucket_hash", $"text", lit(512), lit(11L))
          .as("native"),
        graft.ops.LangIdOps.trigramHashesOnCps($"_cps", 512, 11L).as("hof"),
        graft.ops.LangIdOps.charTrigramBuckets($"text", 512, 11L)
          .as("substr"))
    assert(both.filter(not($"native" <=> $"hof")).count() == 0)
    assert(both.filter(not($"native" <=> $"substr")).count() == 0)
    // NULL input yields NULL (not an empty array)
    val n = Seq[Option[String]](None).toDF("text")
      .select(call_function("trigram_bucket_hash", $"text",
        lit(512), lit(11L)).as("h"))
    assert(n.filter($"h".isNull).count() == 1)
  }

  test("holt_fold equals the interpreted aggregate() HOF chain bit-exactly") {
    graft.expressions.GraftFunctions.register(spark)
    // real value windows off the events table (the ts_backtest input
    // shape) + edge lengths 1..4 with negative/zero/extreme values
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val wins = ev.select($"user_id", $"event_id", $"value")
      .withColumn("lst",
        collect_list($"value").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"event_id")
            .rowsBetween(-19L, 0L)))
      .select($"lst")
      .union(Seq(Seq(3.5), Seq(0.0, -2.25), Seq(1e12, -1e12, 0.5),
        Seq(7.0, 7.0, 7.0, 7.0)).toDF("lst"))
    val alpha = 0.25; val beta = 0.125
    val seed = array(get($"lst", lit(0)), lit(0.0))
    val hof = aggregate(slice($"lst", 2, 19), seed, (acc, x) => {
      val l = element_at(acc, 1); val b = element_at(acc, 2)
      val nl = x * lit(alpha) + lit(1.0 - alpha) * (l + b)
      array(nl, lit(beta) * (nl - l) + lit(1.0 - beta) * b)
    })
    val both = wins.select(
      call_function("holt_fold", $"lst", lit(alpha), lit(beta)).as("native"),
      hof.as("hof"))
    assert(both.filter(not($"native" <=> $"hof")).count() == 0)
    assert(both.count() > 100)
    // NULL and empty inputs yield NULL
    val n = Seq[Option[Seq[Double]]](None, Some(Seq.empty[Double]))
      .toDF("lst")
      .select(call_function("holt_fold", $"lst", lit(0.25), lit(0.125))
        .as("h"))
    assert(n.filter($"h".isNull).count() == 2)
  }
}
