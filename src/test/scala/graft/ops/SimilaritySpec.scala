package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def queries = emb.filter($"vec_id" < 3)
    .select($"vec_id".as("qid"), $"embedding".as("qvec"))
  private def candidates = emb
    .select($"vec_id".as("cid"), $"embedding".as("cvec"))

  test("embeddingDrift: scale-invariant cosine, per-dim shift, orthogonal drift") {
    def vecs(vs: Seq[Array[Float]]) = vs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "embedding")
    // cur = 2× ref: centroids colinear → cosine exactly 1.0, but the
    // per-dim means shift (the flag catches magnitude drift the
    // direction metric is blind to)
    val ref = vecs(Seq(Array(1.0f, 0.0f), Array(1.0f, 0.0f)))
    val scaled = vecs(Seq(Array(2.0f, 0.0f)))
    val a = SimilarityOps.embeddingDrift(ref, scaled, "embedding")
      .select($"dim", $"mean_ref", $"mean_cur", $"centroid_cosine", $"dim_drifted")
      .as[(Int, Double, Double, Double, Int)].collect().sortBy(_._1).toSeq
    assert(a == Seq((0, 1.0, 2.0, 1.0, 1), (1, 0.0, 0.0, 1.0, 0)), a.toString)
    // orthogonal refresh → cosine exactly 0 on the quantized grid
    val ortho = vecs(Seq(Array(0.0f, 1.0f)))
    val b = SimilarityOps.embeddingDrift(ref, ortho, "embedding")
      .select($"centroid_cosine").as[Double].head()
    assert(b == 0.0, b.toString)
    // exact integer sums: counts per dim are the row counts
    val n = SimilarityOps.embeddingDrift(ref, ortho, "embedding")
      .select($"n_ref", $"n_cur").as[(Long, Long)].collect().toSet
    assert(n == Set((2L, 1L)), n.toString)
  }

  test("bruteTopK: rank 1 is the query itself with cosine ≈ 1") {
    val top = SimilarityOps.bruteTopK(queries, candidates, k = 5)
      .filter($"rn" === 1)
      .select($"qid", $"cid", $"cos").as[(Long, Long, Double)].collect()
    assert(top.length == 3)
    assert(top.forall { case (q, c, cos) => q == c && math.abs(cos - 1.0) < 1e-9 })
  }

  test("bruteTopK matches a driver-side brute-force oracle") {
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap.view.mapValues(_.map(_.toDouble)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (0L until 3L).map { q =>
      q -> vecs.keys.toSeq
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1)
    }.toMap
    val got = SimilarityOps.bruteTopK(queries, candidates, k = 5)
      .select($"qid", $"rn", $"cid").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got == expected)
  }

  test("annTopK reaches ≥ 0.3 mean recall@10 vs brute force at 4 bits") {
    val brute = SimilarityOps.bruteTopK(queries, candidates, k = 10)
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ann = SimilarityOps.annTopK(queries, candidates, k = 10, nBits = 4, dim = 64)
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // self is always found (same bucket as itself)
    assert(ann.forall { case (q, cs) => cs.contains(q) })
    val recalls = brute.keys.map { q =>
      val found = ann.getOrElse(q, Set.empty)
      found.intersect(brute(q)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall $mean too low") // random vectors: buckets are sparse
  }

  test("multi-probe annTopK: recall dominates single-bucket; probe set is exact") {
    def recallOf(probe: Int): Double = {
      val brute = SimilarityOps.bruteTopK(queries, candidates, k = 10)
        .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val ann = SimilarityOps.annTopK(queries, candidates, k = 10, nBits = 4,
          dim = 64, probeHamming = probe)
        .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.keys.map { q =>
        ann.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size }
      rs.sum / rs.size
    }
    val r0 = recallOf(0); val r1 = recallOf(1); val r4 = recallOf(4)
    assert(r1 >= r0, s"h=1 recall $r1 must dominate single-bucket $r0")
    // probing ALL hamming distances = every bucket = brute force exactly
    assert(r4 == 1.0, s"h=nBits must equal brute force, got $r4")
    // probe-set size: h=1 over 4 bits visits 5 buckets per query — the
    // scored candidate multiset is ∪ of those buckets, no duplicates
    val dup = SimilarityOps.annTopK(queries, candidates, k = 1000, nBits = 4,
        dim = 64, probeHamming = 1)
      .groupBy($"qid", $"cid").count().filter($"count" > 1).count()
    assert(dup == 0L, "a candidate must be scored once per query (buckets are disjoint)")
  }

  test("ivfTopK finds the query itself and reaches reasonable recall") {
    val brute = SimilarityOps.bruteTopK(queries, candidates, k = 10)
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SimilarityOps.ivfTopK(queries, candidates, k = 10,
      nCentroids = 8, nProbe = 4)
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.forall { case (q, cs) => cs.contains(q) })
    val recalls = brute.keys.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean IVF recall $mean too low (probing 4/8 cells)")
  }

  test("multi-probe IVF: recall never decreases with nProbe, full probe = brute") {
    val brute = SimilarityOps.bruteTopK(queries, candidates, k = 10)
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val model = SimilarityOps.ivfFit(candidates, "cvec", nCentroids = 8)
    val assigned = SimilarityOps.ivfAssign(candidates, "cvec", model)
    def recallOf(p: Int): Double = {
      val got = SimilarityOps.ivfTopKWithModel(queries, assigned, model,
          k = 10, nProbe = p)
        .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val rs = brute.keys.map(q =>
        got.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size)
      rs.sum / rs.size
    }
    val r1 = recallOf(1); val r3 = recallOf(3); val r8 = recallOf(8)
    assert(r3 >= r1, s"nProbe=3 recall $r3 must dominate nProbe=1 $r1")
    assert(r8 >= r3, s"nProbe=8 recall $r8 must dominate nProbe=3 $r3")
    // probing every cell IS exact ranking — the curve's right endpoint
    assert(r8 == 1.0, s"full probe must equal brute force, got $r8")
  }

  test("PQ: codes are deterministic, ADC top-k reaches reasonable recall, self found") {
    val brute = SimilarityOps.bruteTopK(queries, candidates, k = 10)
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val model = SimilarityOps.pqFit(candidates, "cvec", dim = 64, m = 16, k = 16)
    assert(model.m == 16 && model.k == 16 && model.subDim == 4)
    val assigned = SimilarityOps.pqAssign(candidates, "cvec", model)
    // encode determinism under repartitioning (argmin tie-break is (d, code))
    val a = assigned.select($"cid", $"_codes").as[(Long, Seq[Int])].collect().toMap
    val b = SimilarityOps.pqAssign(candidates.repartition(7), "cvec", model)
      .select($"cid", $"_codes").as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
    assert(a.values.forall(cs => cs.length == 16 && cs.forall(c => c >= 0 && c < 16)))
    val pq = SimilarityOps.pqTopK(queries, assigned, model, k = 10)
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // the query vector itself reconstructs closest to its own codes
    assert(pq.forall { case (q, cs) => cs.contains(q) })
    val recalls = brute.keys.map(q =>
      pq.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean PQ recall $mean too low at m=16,k=16")
  }

  test("IVF-PQ: probes cells AND scores by codes; full probe equals plain PQ") {
    val ivfM = SimilarityOps.ivfFit(candidates, "cvec", nCentroids = 8)
    val pqM = SimilarityOps.pqFit(candidates, "cvec", dim = 64, m = 16, k = 16)
    val assigned = SimilarityOps.pqAssign(
      SimilarityOps.ivfAssign(candidates, "cvec", ivfM), "cvec", pqM)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    // probing EVERY cell removes the IVF approximation: result must
    // equal plain PQ over the full corpus (same codes, same ADC scores)
    val full = ids(SimilarityOps.ivfPqTopK(queries, assigned, ivfM, pqM,
      k = 10, nProbe = 8))
    val pqOnly = ids(SimilarityOps.pqTopK(queries,
      SimilarityOps.pqAssign(candidates, "cvec", pqM), pqM, k = 10))
    assert(full == pqOnly)
    // partial probe returns a subset-quality result that still finds self
    val part = ids(SimilarityOps.ivfPqTopK(queries, assigned, ivfM, pqM,
      k = 10, nProbe = 3))
    assert(part.forall { case (q, cs) => cs.contains(q) })
  }

  test("hardNegatives: self and near-dups excluded, k bounds, deterministic") {
    // plant an exact duplicate of anchor 0: cos 1.0 ≥ 0.95 ⇒ it must
    // NOT be mined as a negative (it is a positive), and the anchor
    // row itself must never appear
    val dup = emb.filter($"vec_id" === 0)
      .select(($"vec_id" + 10000).as("cid"), $"embedding".as("cvec"))
    val c = emb.select($"vec_id".as("cid"), $"embedding".as("cvec"))
      .unionByName(dup)
    val q = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = SimilarityOps.hardNegatives(q, c, k = 5).collect()
    assert(out.forall(_.getAs[Double]("cos_q") < 0.95))
    assert(!out.exists(r =>
      r.getAs[Long]("qid") == 0L && r.getAs[Long]("cid") == 10000L),
      "planted duplicate mined as a hard negative")
    assert(out.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("cid")))
    val perAnchor = out.groupBy(_.getAs[Long]("qid")).view.mapValues(_.length)
    assert(perAnchor.toMap.values.forall(_ == 5), perAnchor.toMap.toString)
    // deterministic under repartitioning (quantized integer scoring)
    val again = SimilarityOps.hardNegatives(q, c.repartition(7), k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rn"),
        r.getAs[Long]("cid"))).toSet
    assert(again == out.map(r => (r.getAs[Long]("qid"),
      r.getAs[Int]("rn"), r.getAs[Long]("cid"))).toSet)
    // cross-table mode: excludeSelf=false keeps a numerically-colliding
    // id (a DIFFERENT object in another table's id space) in the mined
    // set — anchor 0 vs candidate 0 from an unrelated corpus
    val foreign = emb.filter($"vec_id" === 7)
      .select(lit(0L).as("cid"), $"embedding".as("cvec"))
    val q0 = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val cross = SimilarityOps.hardNegatives(q0, foreign, k = 1,
        excludeSelf = false)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
    assert(cross.toSeq == Seq((0L, 0L)),
      s"excludeSelf=false must keep the colliding id, got ${cross.toSeq}")
    // same pair under the default is silently dropped — the documented
    // one-id-space contract
    assert(SimilarityOps.hardNegatives(q0, foreign, k = 1).count() == 0)
    intercept[IllegalArgumentException] {
      SimilarityOps.hardNegatives(q, c, k = 5, dupThreshold = 1.0)
    }
  }

  test("IVF-PQ rerank: kCoarse = corpus recovers brute force exactly; dominance holds") {
    val ivfM = SimilarityOps.ivfFit(candidates, "cvec", nCentroids = 8)
    val pqM = SimilarityOps.pqFit(candidates, "cvec", dim = 64, m = 16, k = 16)
    val assigned = SimilarityOps.pqAssign(
      SimilarityOps.ivfAssign(candidates, "cvec", ivfM), "cvec", pqM)
    val n = candidates.count().toInt
    // full-probe + all-candidates rerank: the ADC stage nominates the
    // whole corpus, so the exact re-rank IS brute force — row-for-row
    // (ids, ranks, AND scores, which share the cosineN arithmetic)
    val rr = SimilarityOps.ivfPqRerankTopK(queries, assigned, candidates,
        ivfM, pqM, k = 10, kCoarse = n, nProbe = 8)
      .select($"qid", $"rn", $"cid", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    val brute = SimilarityOps.bruteTopK(queries, candidates, k = 10)
      .select($"qid", $"rn", $"cid", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(rr == brute)
    // narrow retrieve: recall vs truth never below the un-reranked parent
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val truth = brute.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
      val got = df.select($"qid", $"cid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = truth.keys.map(q =>
        got.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble /
          truth(q).size)
      rs.sum / rs.size
    }
    val parent = recall(SimilarityOps.ivfPqTopK(queries, assigned,
      ivfM, pqM, k = 10, nProbe = 3))
    val reranked = recall(SimilarityOps.ivfPqRerankTopK(queries, assigned,
      candidates, ivfM, pqM, k = 10, kCoarse = 30, nProbe = 3))
    assert(reranked >= parent,
      s"rerank recall $reranked below parent $parent")
    intercept[IllegalArgumentException] {
      SimilarityOps.ivfPqRerankTopK(queries, assigned, candidates,
        ivfM, pqM, k = 10, kCoarse = 5, nProbe = 3)
    }
  }

  test("ivfFit once + ivfTopKWithModel many: no iterative ML jobs at query time") {
    val model = SimilarityOps.ivfFit(candidates, "cvec", nCentroids = 8)
    assert(model.nCentroids == 8)
    val assigned = SimilarityOps.ivfAssign(candidates, "cvec", model)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val (r1, r2) =
      try {
        val a = SimilarityOps.ivfTopKWithModel(queries, assigned, model, k = 10, nProbe = 4)
          .select($"qid", $"rn", $"cid").as[(Long, Int, Long)].collect().toSeq
        val b = SimilarityOps.ivfTopKWithModel(queries, assigned, model, k = 10, nProbe = 4)
          .select($"qid", $"rn", $"cid").as[(Long, Int, Long)].collect().toSeq
        (a, b)
      } finally spark.sparkContext.removeSparkListener(listener)
    // fit-once/query-many: same model → identical rankings, and the query
    // path launches only the collect jobs (a 5-iteration KMeans fit alone
    // is >10 jobs; seeing ≤8 for TWO queries proves no in-query fit)
    assert(r1 == r2 && r1.nonEmpty)
    assert(jobs.get() <= 8, s"query path ran ${jobs.get()} jobs — is a fit hiding in it?")
    // the model itself carries no Spark state: serializable as plain data
    val bytes = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bytes).writeObject(model)
    assert(bytes.size() > 0)
  }

  test("cosineDupPairs (bucketed default) finds planted duplicates, allPairs is opt-in") {
    // plant an exact duplicate pair: identical vectors project identically
    // and always share an LSH bucket, so the bucketed default must find it
    val dup = emb.filter($"vec_id" === 0)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding")
    val withDup = emb.select($"vec_id", $"embedding").union(dup)
    val found = SimilarityOps.cosineDupPairs(withDup, "vec_id", "embedding",
      threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(found.exists { case (a, b, _) => a == 0L && b == 10000L },
      s"planted duplicate not found in bucketed mode: ${found.toSeq}")

    // bucketed pairs ⊆ allPairs pairs, both respect id_a < id_b + threshold
    val bucketed = SimilarityOps.cosineDupPairs(
      emb.filter($"vec_id" < 50), "vec_id", "embedding", threshold = 0.2)
      .as[(Long, Long, Double)].collect()
    val all = SimilarityOps.cosineDupPairs(
      emb.filter($"vec_id" < 50), "vec_id", "embedding", threshold = 0.2,
      allPairs = true)
      .as[(Long, Long, Double)].collect()
    assert(all.forall { case (a, b, c) => a < b && c > 0.2 })
    assert(bucketed.map(p => (p._1, p._2)).toSet
      .subsetOf(all.map(p => (p._1, p._2)).toSet))
  }

  test("int8 quantization: error bound holds, codes span the byte range, zeros round-trip") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", SimilarityOps.asDouble($"embedding").as("v"))
    val q = emb.withColumn("q", SimilarityOps.quantizeInt8($"v"))
      .withColumn("vhat", SimilarityOps.dequantizeInt8($"q"))
    // per-component |x - x̂| ≤ scale/2 (+ fp eps), every vector
    val viol = q.select(
      aggregate(zip_with($"v", $"vhat", (x, y) => abs(x - y)),
        lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"),
      ($"q.scale" / 2 + 1e-12).as("bound"))
      .filter($"max_err" > $"bound").count()
    assert(viol == 0)
    // the max-|x| component quantizes to exactly ±127 (scale definition)
    val maxCode = q.select(
      aggregate(transform($"q.codes", c => abs(c.cast("int"))),
        lit(0), (a, b) => greatest(a, b)).as("m"))
    assert(maxCode.filter($"m" =!= 127).count() == 0)
    // cosine is essentially preserved
    val minCos = q.select(SimilarityOps.cosine($"v", $"vhat").as("c"))
      .agg(min($"c")).head().getDouble(0)
    assert(minCos > 0.999, s"min cosine after quantization $minCos")
    // all-zero vector: scale 0, zero codes, zero reconstruction
    val z = Seq(Tuple1(Seq(0.0, 0.0, 0.0))).toDF("v")
      .withColumn("q", SimilarityOps.quantizeInt8($"v"))
      .withColumn("vhat", SimilarityOps.dequantizeInt8($"q"))
      .select($"q.scale", $"vhat").head()
    assert(z.getDouble(0) == 0.0 && z.getSeq[Double](1) == Seq(0.0, 0.0, 0.0))
  }

  test("int8-quantized top-k matches full-precision top-k (recall@10 = 1 on sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", SimilarityOps.asDouble($"embedding").as("v"))
    val deq = emb.withColumn("vhat",
      SimilarityOps.dequantizeInt8(SimilarityOps.quantizeInt8($"v")))
    val qs = emb.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"v".as("qvec"))
    val full = SimilarityOps.bruteTopK(
      qs, emb.select($"vec_id".as("cid"), $"v".as("cvec")), 10,
      cId = "cid", cVec = "cvec")
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
    val quant = SimilarityOps.bruteTopK(
      qs, deq.select($"vec_id".as("cid"), $"vhat".as("cvec")), 10,
      cId = "cid", cVec = "cvec")
      .select($"qid", $"cid").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = full.keys.map { k =>
      val f = full(k).map(_._2).toSet; val g = quant(k).map(_._2).toSet
      f.intersect(g).size.toDouble / f.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 after int8 quantization = $mean")
  }

  test("clusterCentroids equals driver-computed per-dimension means") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(5), Array.fill(8)(rnd.nextInt(2000) - 1000L))
    }
    val df = rows.toDF("id", "cluster", "vec")
    val got = SimilarityOps.clusterCentroids(df, "cluster", "vec")
      .select($"cluster", $"centroid", $"dim")
      .as[(Int, Seq[Double], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want = rows.groupBy(_._2).map { case (c, rs) =>
      c -> (0 until 8).map(p => rs.map(_._3(p)).sum.toDouble / rs.size)
    }
    assert(got.keySet == want.keySet)
    for ((c, exp) <- want) {
      val (cent, dim) = got(c)
      assert(dim == 8)
      exp.zip(cent).foreach { case (e, g) =>
        assert(math.abs(e - g) < 1e-9, s"cluster $c: $e vs $g")
      }
    }
    // NULL cluster / NULL vector rows are excluded, not crashed on
    val withNulls = df.unionByName(
      Seq((9999L, Option.empty[Int], Option(Array(1L, 2L)))).toDF("id", "cluster", "vec"))
      .unionByName(
        Seq((9998L, Option(0), Option.empty[Array[Long]])).toDF("id", "cluster", "vec"))
    assert(SimilarityOps.clusterCentroids(withNulls, "cluster", "vec")
      .count() == want.size)
  }

  test("clusterCentroids on float embeddings: positions beyond a short vector average over present values") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, Array(2.0f, 4.0f)),
      (2L, 0, Array(6.0f))) // ragged: pos 1 only present on row 1
      .toDF("id", "cluster", "vec")
    val out = SimilarityOps.clusterCentroids(df, "cluster", "vec")
      .select($"centroid").as[Seq[Double]].head()
    assert(math.abs(out(0) - 4.0) < 1e-9)  // (2+6)/2
    assert(math.abs(out(1) - 4.0) < 1e-9)  // 4/1 — documented ragged semantics
  }

  test("semDedup removes within-cell near-dups, keeps min id, spares other cells") {
    import spark.implicits._
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e1near = Array(0.99f, 0.01f, 0.0f, 0.0f)   // cos ≈ 1 with e1
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)          // orthogonal
    val df = Seq(
      (3L, Option(0), e1near),  // near-dup of 5 — loses (5 < 3? no: 3 < 5 wins)
      (5L, Option(0), e1),
      (7L, Option(0), e2),      // same cell, not a dup
      (9L, Option(1), e1),      // identical vector, DIFFERENT cell → untouched
      (11L, Option.empty[Int], e1))  // NULL cell → kept unconditionally
      .toDF("vec_id", "cell", "emb")
    val got = SimilarityOps.semDedup(df, "vec_id", "emb", "cell", threshold = 0.9)
      .select($"vec_id").as[Long].collect().toSet
    assert(got == Set(3L, 7L, 9L, 11L), s"got $got")
  }

  test("semDedup fails loud when a cell exceeds the pair budget") {
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, 0, Array(i.toFloat, 1.0f)))
      .toDF("vec_id", "cell", "emb")
    val e = intercept[Exception] {
      SimilarityOps.semDedup(df, "vec_id", "emb", "cell",
        threshold = 0.99, maxClusterPairs = 10L).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxClusterPairs"),
      s"unexpected: ${e.getMessage}")
  }

  test("pcaProject recovers a planted dominant direction; loadings orthonormal") {
    import spark.implicits._
    // dim 8; variance concentrated on axis 0 (scale 100), axis 1
    // (scale 10), everything else a small deterministic wiggle
    val rows = (0 until 200).map { i =>
      val big = (i % 21 - 10) * 100.0f
      val mid = (i % 13 - 6) * 10.0f
      val arr = Array.tabulate(8)(j =>
        if (j == 0) big else if (j == 1) mid
        else ((i * (j + 3)) % 7 - 3).toFloat * 0.1f)
      (i.toLong, arr)
    }
    val out = SimilarityOps.pcaProject(
      rows.toDF("vec_id", "emb"), "vec_id", "emb", k = 2)
    val collected = out
      .select($"vec_id", $"pc1", $"pc2", $"max_offdiag", $"max_norm_err")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(collected.length == 200)
    assert(collected.forall(r => r._4 < 1e-9 && r._5 < 1e-9),
      "loading matrix must be orthonormal")
    def variance(xs: Seq[Double]): Double = {
      val n = xs.size; val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / n
    }
    val v1 = variance(collected.map(_._2).toSeq)
    val v2 = variance(collected.map(_._3).toSeq)
    // pc1 must carry the planted axis-0 variance (~367k vs ~1.4k)
    assert(v1 > 100 * v2, s"pc1 var $v1 should dominate pc2 var $v2")
    // pc1 coordinates must be (sign-ambiguously) the big axis
    val corr = collected.map(r => r._2 * ((r._1 % 21 - 10) * 100.0)).sum
    assert(math.abs(corr) > 0, "pc1 must align with the planted axis")
  }

  // --- mmrTopK ---------------------------------------------------------

  test("mmrTopK promotes a diverse candidate over a redundant higher-rel one") {
    // A ≈ the query direction; B a near-duplicate of A with slightly
    // lower rel; C less relevant but far from both. Pure top-3-by-rel
    // is A,B,C — MMR must pick A, then C (B's redundancy to A kills
    // its margin), then B.
    val q = Seq((0L, Array(1.0, 0.0))).toDF("qid", "qvec")
    val c = Seq(
      (10L, Array(0.9, 0.1)),
      (20L, Array(0.9, 0.12)),
      (30L, Array(0.5, -0.5)))
      .toDF("cid", "cvec")
    val out = SimilarityOps.mmrTopK(q, c,
      kCandidates = 3, kSelect = 3, lambda = 0.5)
      .orderBy($"rank")
      .as[(Long, Int, Long, Double, Double)].collect().toSeq
    assert(out.map(_._3) == Seq(10L, 30L, 20L), out.mkString(","))
    // rel ordering alone would have ranked B (20) second
    assert(out.find(_._3 == 20L).get._4 > out.find(_._3 == 30L).get._4)
    // scores are monotone non-increasing down the selection
    assert(out.map(_._5) == out.map(_._5).sorted.reverse)
  }

  test("mmrTopK: rank-1 score is λ·rel; determinism; argument validation") {
    val q = Seq((0L, Array(1.0, 0.0))).toDF("qid", "qvec")
    val c = Seq((10L, Array(1.0, 0.0)), (20L, Array(0.0, 1.0)))
      .toDF("cid", "cvec")
    def run() = SimilarityOps.mmrTopK(q, c, 2, 2, 0.5)
      .orderBy($"rank").as[(Long, Int, Long, Double, Double)].collect().toSeq
    val out = run()
    assert(out.head._5 == 0.5 * out.head._4)
    assert(run() == run())
    intercept[IllegalArgumentException] {
      SimilarityOps.mmrTopK(q, c, 2, 3, 0.5) // kSelect > kCandidates
    }
    intercept[IllegalArgumentException] {
      SimilarityOps.mmrTopK(q, c, 0, 0, 0.5)
    }
    intercept[IllegalArgumentException] {
      SimilarityOps.mmrTopK(q, c, 2, 2, 0.0)
    }
  }

  // --- bitextMine ------------------------------------------------------

  private def bitextFixture = {
    val src = Seq(
      (0L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
      .toDF("sid", "svec")
    val tgt = Seq(
      (1L, Array(1.0, 0.0)), (3L, Array(0.8, 0.6)),
      (5L, Array(0.0, 1.0)), (7L, Array(-1.0, 0.0)))
      .toDF("tid", "tvec")
    (src, tgt)
  }

  test("bitextMine: hand-computed margins on an orthogonal fixture") {
    // forward k=2: s0 → {t1 cos 1.0, t3 cos 0.8} avg 0.9;
    //              s2 → {t5 cos 1.0, t3 cos 0.6} avg 0.8
    // backward over candidates {t1,t3,t5} vs both anchors (k=2):
    //   t1 avg 0.5, t3 avg 0.7, t5 avg 0.5
    // margins: (s0,t1)=1/0.7, (s0,t3)=0.8/0.8=1.0 → rank1 t1
    //          (s2,t5)=1/0.65, (s2,t3)=0.6/0.75=0.8 → rank1 t5
    val (src, tgt) = bitextFixture
    val out = SimilarityOps.bitextMine(src, tgt, k = 2, marginThreshold = 1.1)
      .orderBy($"sid")
      .as[(Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._5)) == Seq(
      (0L, 1L, true), (2L, 5L, true)))
    assert(math.abs(out(0)._4 - 1.0 / 0.7) < 1e-12, s"${out(0)}")
    assert(math.abs(out(1)._4 - 1.0 / 0.65) < 1e-12, s"${out(1)}")
  }

  test("bitextMine: equidistant anchors get margin exactly 1 — reported, not mined") {
    // every (anchor, target) cosine is identical (1/√2), so both local
    // averages equal the pair cosine and the margin is exactly 1.0:
    // below a 1.2 threshold the rows are still present with
    // mined = false (the audit contract — the filter is data)
    val src = Seq((0L, Array(1.0, 1.0)), (2L, Array(1.0, 1.0)))
      .toDF("sid", "svec")
    val tgt = Seq(
      (1L, Array(1.0, 0.0)), (3L, Array(0.0, 1.0)))
      .toDF("tid", "tvec")
    val out = SimilarityOps.bitextMine(src, tgt, k = 2, marginThreshold = 1.2)
      .as[(Long, Long, Double, Double, Boolean)].collect()
    assert(out.length == 2 && out.forall(!_._5))
    assert(out.forall(r => math.abs(r._4 - 1.0) < 1e-12), out.mkString(","))
  }

  test("bitextMine is deterministic across runs and validates arguments") {
    val (src, tgt) = bitextFixture
    def run() = SimilarityOps.bitextMine(src, tgt, k = 2, marginThreshold = 1.0)
      .orderBy($"sid").collect().toSeq
    assert(run() == run())
    intercept[IllegalArgumentException] {
      SimilarityOps.bitextMine(src, tgt, k = 0, marginThreshold = 1.0)
    }
    intercept[IllegalArgumentException] {
      SimilarityOps.bitextMine(src, tgt, k = 2, marginThreshold = 0.0)
    }
  }

  test("centroidCosineMatrix: identical labels cos 1, orthogonal labels cos 0") {
    import spark.implicits._
    val rows = Seq(
      (0, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (0, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1, Seq(0.0f, 2.0f, 0.0f, 0.0f)),
      (2, Seq(3.0f, 0.0f, 0.0f, 0.0f))).toDF("label", "embedding")
    val out = SimilarityOps.centroidCosineMatrix(rows, "label", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    assert(out((0, 2)) == 1.0, out)   // parallel centroids
    assert(out((0, 1)) == 0.0, out)   // orthogonal
    assert(out((1, 2)) == 0.0, out)
    assert(out.size == 3)
  }

  private def qQuant = emb.filter($"vec_id" < 3)
    .select($"vec_id".as("qid"),
      SimilarityOps.quantize($"embedding").as("qvec"))
  private def cQuant = emb
    .select($"vec_id".as("cid"),
      SimilarityOps.quantize($"embedding").as("cvec"))

  test("hnswTopK: planted twin recovered at rank 1 with cosine ≈ 1") {
    // plant an exact copy of query 0's vector under a fresh id: the
    // graph MUST propose it and the exact re-rank MUST place it in
    // the top ranks with cos ≈ 1 (rank 1 or 2 — the query itself is
    // also a candidate and ties break by id)
    val twinId = 100000L
    val twin = emb.filter($"vec_id" === 0)
      .select(lit(twinId).as("cid"),
        SimilarityOps.quantize($"embedding").as("cvec"))
    val cands = cQuant.unionByName(twin)
    val top = SimilarityOps.hnswTopK(qQuant, cands, k = 3,
      nShards = 4, m = 8, efConstruction = 64, efSearch = 32)
      .filter($"qid" === 0)
      .select($"rn", $"cid", $"cos").as[(Int, Long, Double)]
      .collect().sortBy(_._1)
    val twinRow = top.find(_._2 == twinId)
    assert(twinRow.isDefined, s"twin not proposed: ${top.toSeq}")
    assert(twinRow.get._1 <= 2, s"twin not in top-2: ${top.toSeq}")
    assert(math.abs(twinRow.get._3 - 1.0) < 1e-9, twinRow.toString)
  }

  test("hnswCandidates: deterministic across runs AND input layouts") {
    def run(c: org.apache.spark.sql.DataFrame) =
      SimilarityOps.hnswCandidates(qQuant, c, nShards = 4, m = 8,
          efConstruction = 64, efSearch = 24)
        .as[(Long, Long)].collect().toSet
    val a = run(cQuant)
    val b = run(cQuant)
    // scramble the input layout: different partitioning + row order
    // must not change shard contents (shard key is a pure id function)
    val c = run(cQuant.repartition(7, $"cid").sortWithinPartitions(
      $"cid".desc))
    assert(a == b, s"same-layout rerun diverged: ${(a -- b).take(5)}")
    assert(a == c, s"layout change diverged: ${(a -- c) .take(5)} ${(c -- a).take(5)}")
  }

  test("hnswTopK: recall vs bruteTopK clears the 0.6 floor at sf0.001") {
    val truth = SimilarityOps.bruteTopK(queries, candidates, k = 10)
      .select($"qid", $"cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = SimilarityOps.hnswTopK(qQuant, cQuant, k = 10,
        nShards = 4, m = 8, efConstruction = 64, efSearch = 48)
      .select($"qid", $"cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.keys.map { q =>
      got.getOrElse(q, Set.empty).count(truth(q)).toDouble / truth(q).size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.6, s"avg recall $avg below floor; per-q $recalls")
  }

  test("hnswTopK with saturating efSearch ≡ bruteTopK exactly") {
    // one shard + efSearch ≥ n: the layer-0 beam must visit the whole
    // connected graph and return every node, so the exact re-rank sees
    // ALL candidates — the approximation is removed and the result
    // must equal brute force rank-for-rank (the annTopK h=nBits and
    // ivf nProbe=all equivalence discipline, graph edition)
    val n = cQuant.count().toInt
    val viaGraph = SimilarityOps.hnswTopK(qQuant, cQuant, k = 10,
        nShards = 1, m = 8, efConstruction = 64, efSearch = n)
      .select($"qid", $"rn", $"cid").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val brute = SimilarityOps.bruteTopK(qQuant, cQuant, k = 10)
      .select($"qid", $"rn", $"cid").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaGraph == brute,
      s"graph != brute: ${viaGraph.diff(brute).take(5)}")
  }

  test("hnswTopKExact ≡ bruteTopK across MULTIPLE shards (the oracled config)") {
    // the sim_ann_hnsw_exact contract: per-shard saturation (efSearch =
    // n via the sweep guarantee) + keepTop=k frontier trim + exact
    // re-rank must equal brute force rank-for-rank even when the corpus
    // is sharded — the union of exact shard-local top-ks contains the
    // global top-k
    val viaGraph = SimilarityOps.hnswTopKExact(qQuant, cQuant, k = 10,
        nShards = 4, m = 8, efConstruction = 64)
      .select($"qid", $"rn", $"cid", $"cos").as[(Long, Int, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val brute = SimilarityOps.bruteTopK(qQuant, cQuant, k = 10)
      .select($"qid", $"rn", $"cid", $"cos").as[(Long, Int, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaGraph == brute,
      s"exact graph != brute: ${viaGraph.diff(brute).take(5)}")
  }

  test("autoShards / hnswTopKAuto: P ∝ N sizing enforced in the operator") {
    assert(SimilarityOps.autoShards(0L, 100) == 1)
    assert(SimilarityOps.autoShards(1L, 100) == 1)
    assert(SimilarityOps.autoShards(100L, 100) == 1)
    assert(SimilarityOps.autoShards(101L, 100) == 2)
    assert(SimilarityOps.autoShards(1000L, 100) == 10)
    assert(SimilarityOps.autoShards(1000000L, 100) == 10000)
    intercept[IllegalArgumentException] { SimilarityOps.autoShards(5L, 0) }
    // per-shard rows never exceed the target: cid % P over the
    // fixture's contiguous ids splits within ±1 of n/P ≤ target
    val n = cQuant.count()
    val target = 100
    val p = SimilarityOps.autoShards(n, target)
    val maxPerShard = cQuant
      .groupBy(pmod($"cid", lit(p.toLong)).as("shard"))
      .agg(count(lit(1)).as("rows"))
      .agg(max($"rows")).as[Long].head()
    assert(maxPerShard <= target,
      s"auto-P shard overflow: max $maxPerShard > target $target (n=$n, P=$p)")
    // and the auto variant returns exactly what the explicit-P form does
    val auto = SimilarityOps.hnswTopKAuto(qQuant, cQuant, k = 5,
        targetShardRows = target, m = 8, efConstruction = 64, efSearch = 48)
      .select($"qid", $"rn", $"cid").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val explicit = SimilarityOps.hnswTopK(qQuant, cQuant, k = 5,
        nShards = p, m = 8, efConstruction = 64, efSearch = 48)
      .select($"qid", $"rn", $"cid").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(auto == explicit)
  }

  test("deltaUnionTopK with exhaustive probing ≡ bruteTopK over the whole corpus") {
    // the merge's correctness contract: approximation only ever enters
    // through the index side's recall — when the index side is exact
    // over its half (nProbe = ALL cells) and the delta side is brute,
    // the served union must equal brute force over the full corpus
    val model = SimilarityOps.ivfFit(cQuant, "cvec", nCentroids = 4, seed = 42L)
    val indexed = cQuant.filter(pmod($"cid", lit(5L)) =!= 4L)
    val delta = cQuant.filter(pmod($"cid", lit(5L)) === 4L)
    val idxTop = SimilarityOps.ivfTopKWithModel(
      qQuant, SimilarityOps.ivfAssign(indexed, "cvec", model), model,
      k = 10, nProbe = 4)
    val deltaTop = SimilarityOps.bruteTopK(qQuant, delta, k = 10)
    val got = SimilarityOps.deltaUnionTopK(idxTop, deltaTop, k = 10)
      .select($"qid", $"rn", $"cid").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val brute = SimilarityOps.bruteTopK(qQuant, cQuant, k = 10)
      .select($"qid", $"rn", $"cid").as[(Long, Int, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == brute, s"union != brute: ${got.diff(brute).take(5)}")
  }

  test("hnswCandidates: degenerate shapes — more shards than rows, tiny ef") {
    val tiny = Seq((1L, Seq(1000L, 0L)), (2L, Seq(0L, 1000L)),
      (3L, Seq(700L, 700L))).toDF("cid", "cvec")
    val q = Seq((9L, Seq(1000L, 0L))).toDF("qid", "qvec")
    val out = SimilarityOps.hnswTopK(q, tiny, k = 2, nShards = 8,
      m = 2, efConstruction = 4, efSearch = 2)
      .select($"rn", $"cid").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.nonEmpty && out.head._2 == 1L, out.toSeq.toString)
    intercept[IllegalArgumentException] {
      SimilarityOps.hnswCandidates(q, tiny, nShards = 0, m = 2,
        efConstruction = 4, efSearch = 2)
    }
    intercept[IllegalArgumentException] {
      SimilarityOps.hnswCandidates(q, tiny, nShards = 2, m = 2,
        efConstruction = 1, efSearch = 2)
    }
  }
}
