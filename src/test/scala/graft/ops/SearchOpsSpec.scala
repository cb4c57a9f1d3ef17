package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SearchOpsSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs, hand-computable stats:
  //   d1: "a a b"   (dl=3)   d2: "a c"  (dl=2)   d3: "b b b c" (dl=4)
  // N=3, T=9; df: a=2, b=2, c=2
  private def fixture = Seq(
    (1L, "a a b"), (2L, "a c"), (3L, "b b b c")).toDF("id", "text")

  private def model = SearchOps.bm25Fit(fixture, "id", "text")

  test("bm25Fit: df, idf, and the stats row match hand computation") {
    val m = model.collect().map(r => (r.getAs[String]("_tok"), r)).toMap
    val stats = m(null)
    assert(stats.getAs[Long]("_n_docs") == 3L)
    assert(stats.getAs[Long]("_total_toks") == 9L)
    // idf(df=2, N=3) = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6) = 0.470004 (20,6)
    for (tk <- Seq("a", "b", "c")) {
      assert(m(tk).getAs[Long]("_df") == 2L, tk)
      // idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6) → (20,6) = 0.470004
      assert(m(tk).getAs[java.math.BigDecimal]("_idf")
        .compareTo(new java.math.BigDecimal("0.470004")) == 0, tk)
    }
    assert(m.size == 4) // 3 terms + stats row
  }

  // the exact IEEE op sequence bm25TopK evaluates (and the oracle SQL
  // restates) — same JVM doubles, so score asserts below are EXACT ==
  private def refWeight(idf: Double, tf: Long, dl: Long, n: Long, t: Long,
      k1: Double = 1.2, b: Double = 0.75): Double =
    if (tf == 0) 0.0
    else idf * ((tf * (k1 + 1.0)) /
      (tf + k1 * ((1.0 - b) + ((b * dl) * n) / t)))

  test("bm25TopK: hand-computed scores, ranking, and tie-break") {
    // query [a, b], k1=1.2, b=0.75, idf = ln(1.6)→(20,6) = 0.470004 for
    // every term (all have df=2). avgdl = 9/3 = 3.
    //   d1: tf_a=2, tf_b=1, dl=3 → w_a = .470004·1.375, w_b = .470004
    //   d2: tf_a=1, dl=2         → w_a = .470004·(2.2/1.9)
    //   d3: tf_b=3, dl=4         → w_b = .470004·(6.6/4.5)
    val out = SearchOps.bm25TopK(fixture, "id", "text", model,
      Seq("a", "b"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L))
    val idf = 0.470004
    val scores = out.map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(scores(1L) ==
      refWeight(idf, 2, 3, 3, 9) + refWeight(idf, 1, 3, 3, 9))
    assert(scores(3L) == refWeight(idf, 0, 4, 3, 9) + refWeight(idf, 3, 4, 3, 9))
    assert(scores(2L) == refWeight(idf, 1, 2, 3, 9) + refWeight(idf, 0, 2, 3, 9))
    val matched = out.map(r =>
      r.getLong(0) -> r.getAs[Int]("n_matched")).toMap
    assert(matched == Map(1L -> 2, 3L -> 1, 2L -> 1))
    assert(out.map(r => r.getAs[Long]("dl")).toSeq == Seq(3L, 4L, 2L))
  }

  test("bm25TopK: docs matching no term are dropped; unknown terms score 0") {
    val out = SearchOps.bm25TopK(fixture, "id", "text", model,
      Seq("c", "zzz"), k = 10).collect()
    // only d2 and d3 contain c; zzz contributes nothing
    assert(out.map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(out.forall(_.getAs[Int]("n_matched") == 1))
  }

  test("bm25TopK: k bounds output; ties at the boundary break by id") {
    // two docs with identical text → identical scores; k=1 keeps lower id
    val tied = Seq((10L, "a b"), (11L, "a b")).toDF("id", "text")
    val m = SearchOps.bm25Fit(tied, "id", "text")
    val out = SearchOps.bm25TopK(tied, "id", "text", m, Seq("a"), k = 1)
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 10L)
  }

  test("bm25TopK: frozen model persists, reloads, and scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("bm25m").toString
    model.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val a = SearchOps.bm25TopK(fixture, "id", "text", model,
      Seq("a", "b"), 10).collect().toSeq
    val b = SearchOps.bm25TopK(fixture, "id", "text", reloaded,
      Seq("a", "b"), 10).collect().toSeq
    assert(a == b)
  }

  test("bm25TopK: corpus side plans with no shuffle exchange") {
    // scan → codegen'd projection → TakeOrderedAndProject; the only
    // exchanges are the broadcast of the 1-row summary of the FROZEN
    // (parquet-reloaded) model and the model-side single-partition
    // aggregate (model-sized, not corpus-sized). At 100 TB the
    // document table never shuffles. k must stay below the fixture's
    // row count: over a 3-row LocalRelation with k ≥ 3 the optimizer
    // PROVES maxRows ≤ k and eliminates the limit entirely (a real
    // range sort then appears — an artifact impossible over a
    // production scan, whose maxRows is unknown).
    val dir = java.nio.file.Files.createTempDirectory("bm25plan").toString
    model.write.mode("overwrite").parquet(dir)
    val frozen = spark.read.parquet(dir)
    val df = SearchOps.bm25TopK(fixture, "id", "text", frozen, Seq("a"), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("tfIdfTopTerms: exact-decimal ranking with (weight desc, term) ties") {
    val out = SearchOps.tfIdfTopTerms(fixture, "id", "text", model, 2)
      .orderBy(col("id"), col("rank")).collect()
    // weights: idf=0.470004 each; d1: a→.940008, b→.470004;
    // d2: a=.470004, c=.470004 (tie → term asc); d3: b→1.410012, c→.470004
    val byDoc = out.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[String]("term")).toSeq
    }
    assert(byDoc(1L) == Seq("a", "b"))
    assert(byDoc(2L) == Seq("a", "c")) // tie broken by term ascending
    assert(byDoc(3L) == Seq("b", "c"))
    // weight is computed in exact decimal but PRESENTED as DOUBLE
    // (int128-backed p>18 decimals are hash-hostile downstream)
    val w1 = out.filter(r => r.getLong(0) == 1L && r.getAs[Int]("rank") == 1)
      .head.getAs[Double]("weight")
    assert(w1 == 0.940008d)
  }

  test("tfIdfTopTerms: OOV tokens under a frozen model are skipped") {
    val newDocs = Seq((9L, "a zzz zzz zzz")).toDF("id", "text")
    val out = SearchOps.tfIdfTopTerms(newDocs, "id", "text", model, 3)
      .collect()
    // zzz is absent from the frozen model → only a survives
    assert(out.map(_.getAs[String]("term")).toSeq == Seq("a"))
  }

  test("bm25TopKBatch ≡ bm25TopK for each query (terms given in asc order)") {
    // the batch fold sums term weights in ascending-term order; the
    // literal form sums in given order — passing sorted term lists
    // makes the two IEEE sequences identical, so scores are EXACT ==
    val queries = Seq(("q1", "a b"), ("q2", "a"), ("q3", "b c"))
      .toDF("qid", "qtext")
    val batch = SearchOps.bm25TopKBatch(fixture, "id", "text", model,
        queries, "qid", "qtext", k = 10)
      .collect()
      .groupBy(_.getAs[String]("qid"))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"),
            r.getAs[Int]("n_matched"), r.getAs[Long]("dl"))).toSeq
      }
    for ((q, terms) <- Seq("q1" -> Seq("a", "b"), "q2" -> Seq("a"),
        "q3" -> Seq("b", "c"))) {
      val single = SearchOps.bm25TopK(fixture, "id", "text", model,
          terms, k = 10).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"),
          r.getAs[Int]("n_matched"), r.getAs[Long]("dl"))).toSeq
      assert(batch(q) == single, s"query $q diverged from literal form")
    }
  }

  test("bm25TopKBatch: OOV-only query emits no rows; k bounds per query") {
    val queries = Seq(("q1", "zzz qqq"), ("q2", "b")).toDF("qid", "qtext")
    val out = SearchOps.bm25TopKBatch(fixture, "id", "text", model,
      queries, "qid", "qtext", k = 1).collect()
    // q1: no in-vocabulary term → absent; q2: k=1 keeps only d3 (tf_b=3)
    assert(out.map(_.getAs[String]("qid")).toSeq == Seq("q2"))
    assert(out.head.getAs[Long]("id") == 3L)
    assert(out.head.getAs[Int]("rank") == 1)
  }

  test("bm25TopKBatch: one plan — queries are data, model joined once") {
    def joinCount(qs: Seq[(String, String)]): (Int, String) = {
      val df = SearchOps.bm25TopKBatch(fixture, "id", "text", model,
        qs.toDF("qid", "qtext"), "qid", "qtext", k = 5)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      ("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
        .findAllIn(plan).size, plan)
    }
    // queries are DATA: the join count must be IDENTICAL however many
    // queries ride the table (a per-query-unrolled regression — the
    // literal form's shape — would scale the plan with |queries|)
    val (one, planOne) = joinCount(Seq("q1" -> "a"))
    val (four, planFour) = joinCount(
      Seq("q1" -> "a", "q2" -> "b", "q3" -> "c", "q4" -> "a c"))
    assert(one == four,
      s"join count scaled with query count ($one → $four):\n$planFour")
    assert(planOne.contains("WindowGroupLimit"), planOne)
  }

  test("empty query and non-positive k are rejected") {
    intercept[IllegalArgumentException] {
      SearchOps.bm25TopK(fixture, "id", "text", model, Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      SearchOps.bm25TopK(fixture, "id", "text", model, Seq("a"), 0)
    }
    intercept[IllegalArgumentException] {
      SearchOps.bm25TopKBatch(fixture, "id", "text", model,
        Seq(("q1", "a")).toDF("qid", "qtext"), "qid", "qtext", 0)
    }
    intercept[IllegalArgumentException] {
      SearchOps.tfIdfTopTerms(fixture, "id", "text", model, 0)
    }
  }

  // --- evalRanking --------------------------------------------------

  test("evalRanking: hand-computed precision/recall/RR/nDCG with quantized discounts") {
    val ranking = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
      .toDF("qid", "id", "rank")
    val rel = Seq(("q", 2L), ("q", 9L)).toDF("qid", "id") // d9 never retrieved
    val r = SearchOps.evalRanking(ranking, rel, "qid", "id", "rank", k = 3)
      .collect().head
    assert(r.getAs[Int]("n_ret") == 3 && r.getAs[Int]("n_rel") == 2 &&
      r.getAs[Int]("n_hits") == 1)
    assert(r.getAs[Double]("rr") == 0.5) // first relevant at rank 2
    assert(r.getAs[Double]("precision_k") == 1.0 / 3.0)
    assert(r.getAs[Double]("recall_k") == 0.5)
    // dcg = disc(2) = quantize9(1/log2 3); idcg = disc(1) + disc(2)
    val d2 = new java.math.BigDecimal(1.0 / (math.log(3) / math.log(2)))
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    assert(math.abs(r.getAs[Double]("dcg") - d2) < 1e-9, r.getAs[Double]("dcg"))
    assert(math.abs(r.getAs[Double]("idcg") - (1.0 + d2)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ndcg") - d2 / (1.0 + d2)) < 1e-9)
  }

  test("evalRanking: perfect ranking scores nDCG 1; conventions for the empty cases") {
    // q1: both relevant docs at the top → ideal → ndcg = 1 exactly
    // (dcg and idcg sum the SAME quantized decimals → equal doubles)
    // q2: relevant docs exist, none retrieved → ndcg 0.0, rr 0.0
    // q3: no relevant docs at all → recall/ndcg NULL (undefined ≠ 0)
    val ranking = Seq(("q1", 1L, 1), ("q1", 2L, 2), ("q1", 3L, 3),
      ("q2", 5L, 1), ("q3", 6L, 1)).toDF("qid", "id", "rank")
    val rel = Seq(("q1", 1L), ("q1", 2L), ("q2", 7L)).toDF("qid", "id")
    val out = SearchOps.evalRanking(ranking, rel, "qid", "id", "rank", k = 3)
      .collect().map(r => r.getAs[String]("qid") -> r).toMap
    assert(out("q1").getAs[Double]("ndcg") == 1.0)
    assert(out("q1").getAs[Double]("rr") == 1.0)
    assert(out("q2").getAs[Double]("ndcg") == 0.0)
    assert(out("q2").getAs[Double]("rr") == 0.0)
    assert(out("q2").getAs[Double]("recall_k") == 0.0)
    assert(out("q3").isNullAt(out("q3").fieldIndex("ndcg")))
    assert(out("q3").isNullAt(out("q3").fieldIndex("recall_k")))
    assert(out("q3").getAs[Double]("rr") == 0.0)
    intercept[IllegalArgumentException] {
      SearchOps.evalRanking(ranking, rel, "qid", "id", "rank", k = 0)
    }
  }

  // --- averagePrecision -----------------------------------------------

  test("averagePrecision: hand-computed AP with an unretrieved relevant") {
    // hits at ranks 1, 3, 5 of 4 relevant (d9 outside the top-k):
    // AP = ((1/1 + 2/3) + 3/5) / 4 — the exact left-fold order
    val ranking = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3),
      ("q", 4L, 4), ("q", 5L, 5)).toDF("qid", "id", "rank")
    val rel = Seq(("q", 1L), ("q", 3L), ("q", 5L), ("q", 9L))
      .toDF("qid", "id")
    val r = SearchOps.averagePrecision(ranking, rel, "qid", "id", "rank",
      k = 5).collect().head
    assert(r.getAs[Int]("n_ret") == 5 && r.getAs[Int]("n_rel") == 4 &&
      r.getAs[Int]("n_hits") == 3)
    val expected = (((0.0 + 1.0 / 1.0) + 2.0 / 3.0) + 3.0 / 5.0) / 4.0
    assert(r.getAs[Double]("ap") == expected)
  }

  test("averagePrecision: perfect prefix → 1; zero-hit and dead-query conventions") {
    val ranking = Seq(("q1", 1L, 1), ("q1", 2L, 2),
      ("q2", 5L, 1), ("q3", 6L, 1)).toDF("qid", "id", "rank")
    val rel = Seq(("q1", 1L), ("q1", 2L), ("q2", 7L)).toDF("qid", "id")
    val out = SearchOps.averagePrecision(ranking, rel, "qid", "id", "rank",
      k = 3).collect().map(r => r.getAs[String]("qid") -> r).toMap
    assert(out("q1").getAs[Double]("ap") == 1.0) // (1/1 + 2/2) / 2
    assert(out("q2").getAs[Double]("ap") == 0.0) // relevants exist, none hit
    assert(out("q3").isNullAt(out("q3").fieldIndex("ap"))) // n_rel = 0
    intercept[IllegalArgumentException] {
      SearchOps.averagePrecision(ranking, rel, "qid", "id", "rank", k = 0)
    }
  }

  test("averagePrecision: ranks beyond k are ignored, result is partition-stable") {
    val ranking = Seq(("q", 1L, 1), ("q", 2L, 7)).toDF("qid", "id", "rank")
    val rel = Seq(("q", 1L), ("q", 2L)).toDF("qid", "id")
    val r = SearchOps.averagePrecision(ranking, rel, "qid", "id", "rank",
      k = 5).collect().head
    assert(r.getAs[Int]("n_ret") == 1 && r.getAs[Int]("n_hits") == 1)
    assert(r.getAs[Double]("ap") == (0.0 + 1.0) / 2.0)
    val big = (1 to 50).map(i => ("q", i.toLong, i)).toDF("qid", "id", "rank")
    val bigRel = (1 to 50 by 3).map(i => ("q", i.toLong)).toDF("qid", "id")
    val a = SearchOps.averagePrecision(big, bigRel, "qid", "id", "rank", 50)
      .select($"ap").as[Double].collect().head
    val b = SearchOps.averagePrecision(big.repartition(11), bigRel,
      "qid", "id", "rank", 50).select($"ap").as[Double].collect().head
    assert(a == b)
  }

  // --- rrfFuse ------------------------------------------------------

  private def ranking(rows: (String, Long, Int)*) =
    rows.toSeq.toDF("qid", "id", "rank")

  test("rrfFuse: hand-computed scores, provenance columns, missing → 0") {
    // system A ranks docs 1,2,3; system B ranks 2,1,4. kRrf=60.
    //   doc2: 1/62 + 1/61   doc1: 1/61 + 1/62 (tie with doc2!)
    //   doc3: 1/63 only     doc4: 1/63 only (ties doc3)
    val a = ranking(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
    val b = ranking(("q", 2L, 1), ("q", 1L, 2), ("q", 4L, 3))
    val out = SearchOps.rrfFuse(Seq("a" -> a, "b" -> b),
      "qid", "id", "rank", kRrf = 60, k = 10)
      .orderBy(col("rrf_rank")).collect()
    // doc1 and doc2 tie exactly (same two reciprocals, + is commutative
    // on these exact values) → id breaks: doc1 first; likewise 3 < 4
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 4L))
    val s = out.map(r => r.getAs[Long]("id") -> r.getAs[Double]("rrf_score")).toMap
    assert(s(1L) == 1.0 / 61 + 1.0 / 62)
    assert(s(2L) == 1.0 / 62 + 1.0 / 61)
    assert(s(3L) == 0.0 + 1.0 / 63)
    assert(s(4L) == 1.0 / 63 + 0.0)
    val prov = out.map(r => r.getAs[Long]("id") ->
      (Option(r.getAs[Integer]("a_rank")), Option(r.getAs[Integer]("b_rank")),
        r.getAs[Int]("n_systems"))).toMap
    assert(prov(1L) == ((Some(1), Some(2), 2)))
    assert(prov(3L) == ((Some(3), None, 1)))
    assert(prov(4L) == ((None, Some(3), 1)))
  }

  test("rrfFuse: fusion is per-query; k truncates each query's list") {
    val a = ranking(("q1", 1L, 1), ("q1", 2L, 2), ("q2", 9L, 1))
    val b = ranking(("q1", 3L, 1), ("q2", 9L, 1), ("q2", 8L, 2))
    val out = SearchOps.rrfFuse(Seq("a" -> a, "b" -> b),
      "qid", "id", "rank", kRrf = 60, k = 1)
      .orderBy(col("qid")).collect()
    // q1 top-1: doc1 (1/61) vs doc3 (1/61) tie → id asc → doc1
    // q2 top-1: doc9 in both systems at rank 1 → 2/61, beats doc8
    assert(out.map(r => (r.getAs[String]("qid"), r.getAs[Long]("id"))).toSeq ==
      Seq(("q1", 1L), ("q2", 9L)))
    assert(out.forall(_.getAs[Int]("rrf_rank") == 1))
  }

  test("rrfFuse: single system degrades to a rank passthrough") {
    val a = ranking(("q", 5L, 1), ("q", 7L, 2))
    val out = SearchOps.rrfFuse(Seq("only" -> a), "qid", "id", "rank",
      kRrf = 60, k = 10).orderBy(col("rrf_rank")).collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(5L, 7L))
    assert(out.map(_.getAs[Double]("rrf_score")).toSeq ==
      Seq(1.0 / 61, 1.0 / 62))
  }

  test("rrfFuse: bad arguments are rejected") {
    val a = ranking(("q", 1L, 1))
    intercept[IllegalArgumentException] {
      SearchOps.rrfFuse(Seq.empty, "qid", "id", "rank")
    }
    intercept[IllegalArgumentException] {
      SearchOps.rrfFuse(Seq("a" -> a, "a" -> a), "qid", "id", "rank")
    }
    intercept[IllegalArgumentException] {
      SearchOps.rrfFuse(Seq("a" -> a), "qid", "id", "rank", kRrf = 0)
    }
    intercept[IllegalArgumentException] {
      SearchOps.rrfFuse(Seq("a" -> a), "qid", "id", "rank", k = 0)
    }
  }

  test("bm25FitFromPostings ≡ bm25Fit (same rows, same types)") {
    // the r17 single-tokenize path: model derived from the postings
    // index must be row-for-row the corpus-fit model
    val direct = SearchOps.bm25Fit(fixture, "id", "text")
    val viaPostings = SearchOps.bm25FitFromPostings(
      SearchOps.bm25Postings(fixture, "id", "text"), "id")
    assert(viaPostings.schema == direct.schema)
    val key = (r: org.apache.spark.sql.Row) => Option(r.getAs[String]("_tok"))
    val a = direct.collect().map(r => key(r) -> r.toSeq).toMap
    val b = viaPostings.collect().map(r => key(r) -> r.toSeq).toMap
    assert(a == b)
  }
}
