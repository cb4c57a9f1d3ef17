package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("stratifiedSample respects per-stratum fractions and is deterministic") {
    val docs = Tables(spark, sf, "documents")
    val fractions = Map("en" -> 0.5, "de" -> 0.1, "zh" -> 1.0)
    val sampled = SampleOps.stratifiedSample(docs, "lang", fractions, seed = 42L)
    val got = sampled.groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // strata not in the map are dropped entirely
    assert(got.keySet.subsetOf(fractions.keySet))
    // fraction=1.0 keeps everything; others land within a loose Bernoulli band
    assert(got("zh") == totals("zh"))
    val enRatio = got("en").toDouble / totals("en")
    assert(enRatio > 0.3 && enRatio < 0.7, s"en ratio $enRatio far from 0.5")
    // seeded: byte-identical on re-run
    val again = SampleOps.stratifiedSample(docs, "lang", fractions, seed = 42L)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == sampled.select($"doc_id").as[Long].collect().toSet)
  }

  test("packSequences: bins are contiguous, ordered, and near-budget") {
    val docs = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 1000L), ("a", 4L, 1500L),
      ("a", 5L, 700L), ("b", 6L, 5000L), ("b", 7L, 10L))
      .toDF("grp", "id", "cost")
    val packed = SampleOps.packSequences(docs, "grp", "id", "cost", budget = 3000L)
      .select($"grp", $"id", $"bin").as[(String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // group a: prefix-before = 0,1000,2000,3000,4500 → bins 0,0,0,1,1
    // group b: prefix-before = 0,5000 → bins 0,1 (oversized doc owns bin 0)
    assert(packed == Seq(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L), ("a", 5L, 1L),
      ("b", 6L, 0L), ("b", 7L, 1L)))
    // bin indices are dense and monotone in the order column per group
    val binsA = packed.filter(_._1 == "a").map(_._3)
    assert(binsA == binsA.sorted && binsA.distinct == Seq(0L, 1L))
  }

  test("weightedSample: fraction tracks the weight, deterministic, monotone in weight") {
    val n = 20000
    val df = (1 to n).map(i => (i.toLong, 0.3)).toDF("id", "w")
    val kept = SampleOps.weightedSample(df, "id", "w").count()
    // Bernoulli(0.3) over 20k rows: ±5σ ≈ ±0.016
    assert(math.abs(kept.toDouble / n - 0.3) < 0.02, s"kept $kept of $n")
    // deterministic: identical decision set on a rerun
    val ids1 = SampleOps.weightedSample(df, "id", "w").select("id").as[Long].collect().toSet
    val ids2 = SampleOps.weightedSample(df.repartition(13), "id", "w")
      .select("id").as[Long].collect().toSet
    assert(ids1 == ids2, "decisions must not depend on partitioning")
    // monotone: the w=0.3 sample is a SUBSET of the w=0.6 sample (same u per id)
    val wider = SampleOps.weightedSample(
      (1 to n).map(i => (i.toLong, 0.6)).toDF("id", "w"), "id", "w")
      .select("id").as[Long].collect().toSet
    assert(ids1.subsetOf(wider))
    // clamping: w<=0 keeps nothing, w>=1 keeps everything
    assert(SampleOps.weightedSample(
      (1 to 100).map(i => (i.toLong, -0.5)).toDF("id", "w"), "id", "w").count() == 0)
    assert(SampleOps.weightedSample(
      (1 to 100).map(i => (i.toLong, 1.5)).toDF("id", "w"), "id", "w").count() == 100)
    // NULL weights: dropped by default (explicit, not NULL-propagation),
    // kept with probability defaultWeight when one is supplied
    val withNulls = (1 to 100).map(i =>
      (i.toLong, if (i % 2 == 0) Some(1.0) else None)).toDF("id", "w")
    assert(SampleOps.weightedSample(withNulls, "id", "w").count() == 50)
    assert(SampleOps.weightedSample(withNulls, "id", "w", defaultWeight = 1.0).count() == 100)
  }

  test("mixToTarget hits target proportions; binding source kept whole; others dropped") {
    // 6000 a / 3000 b / 600 c; targets 0.5/0.3/0.2 → c binds (600/0.2 =
    // 3000 = T): expect ~1500 a (f=.25), ~900 b (f=.3), all 600 c
    val df = ((1 to 6000).map(i => ("a", i.toLong)) ++
      (1 to 3000).map(i => ("b", 10000L + i)) ++
      (1 to 600).map(i => ("c", 20000L + i)) ++
      (1 to 500).map(i => ("x", 30000L + i))) // not in targets → dropped
      .toDF("src", "id")
    val out = SampleOps.mixToTarget(df, "src", "id",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val got = out.groupBy($"src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(!got.contains("x"), "un-targeted source must be dropped")
    assert(got("c") == 600L, s"binding source must keep everything, got ${got("c")}")
    // Bernoulli tolerance: ±5σ
    assert(math.abs(got("a") - 1500.0) < 5 * math.sqrt(1500.0 * 0.75), got.toString)
    assert(math.abs(got("b") - 900.0) < 5 * math.sqrt(900.0 * 0.7), got.toString)
    // deterministic under re-partitioning
    val again = SampleOps.mixToTarget(df.repartition(13), "src", "id",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // proportions of the OUTPUT approximate the targets
    val total = got.values.sum.toDouble
    assert(math.abs(got("a") / total - 0.5) < 0.03)
    assert(math.abs(got("b") / total - 0.3) < 0.03)
  }

  test("temperatureSample: kept counts track n^alpha; smallest source whole; alpha edges") {
    // 8000 a / 2000 b / 500 c, alpha = 0.5 → f_a = (16)^-0.5 = 0.25,
    // f_b = 4^-0.5 = 0.5, f_c = 1 → expect ~2000 a, ~1000 b, all 500 c
    val df = ((1 to 8000).map(i => ("a", i.toLong)) ++
      (1 to 2000).map(i => ("b", 10000L + i)) ++
      (1 to 500).map(i => ("c", 20000L + i))).toDF("src", "id")
    val got = SampleOps.temperatureSample(df, "src", "id", alpha = 0.5)
      .groupBy($"src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got("c") == 500L, s"smallest source must keep everything, got ${got("c")}")
    assert(math.abs(got("a") - 2000.0) < 5 * math.sqrt(2000.0 * 0.75), got.toString)
    assert(math.abs(got("b") - 1000.0) < 5 * math.sqrt(1000.0 * 0.5), got.toString)
    // alpha = 1 is the identity; alpha = 0 levels everything to ~n_min
    assert(SampleOps.temperatureSample(df, "src", "id", alpha = 1.0).count() == 10500L)
    val flat = SampleOps.temperatureSample(df, "src", "id", alpha = 0.0)
      .groupBy($"src").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    flat.foreach { case (s, n) =>
      assert(math.abs(n - 500.0) < 5 * math.sqrt(500.0), s"$s leveled to $n") }
    // deterministic under re-partitioning
    val a = SampleOps.temperatureSample(df, "src", "id", 0.5)
      .select("id").as[Long].collect().toSet
    val b = SampleOps.temperatureSample(df.repartition(13), "src", "id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("assignSplits: full coverage, target fractions, cluster-consistent when keyed by cluster") {
    val n = 20000
    val df = (1 to n).map(i => (i.toLong, i.toLong / 4)).toDF("id", "cluster_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = SampleOps.assignSplits(df, "cluster_id", splits)
    val got = out.groupBy($"split").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(got.values.sum == n, "every row must be assigned")
    assert(math.abs(got("train").toDouble / n - 0.8) < 0.02, got.toString)
    assert(math.abs(got("val").toDouble / n - 0.1) < 0.015, got.toString)
    // cluster members never straddle splits (the leakage guard)
    val straddlers = out.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count()
    assert(straddlers == 0)
    // deterministic under repartitioning
    val again = SampleOps.assignSplits(df.repartition(17), "cluster_id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(again == out.select($"id", $"split").as[(Long, String)].collect().toMap)
    // invalid fractions rejected
    assertThrows[IllegalArgumentException] {
      SampleOps.assignSplits(df, "cluster_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    // NULL keys raise in-plan instead of silently flooding the last split
    val withNull = Seq((1L, Some(1L)), (2L, None)).toDF("id", "cluster_id")
    val ex = intercept[Exception] {
      SampleOps.assignSplits(withNull, "cluster_id", splits).collect()
    }
    assert(ex.getMessage.contains("assignSplits") ||
      Option(ex.getCause).exists(_.getMessage.contains("assignSplits")), ex.toString)
  }

  test("mixToTarget raises when a targeted source is absent from the data") {
    val df = (1 to 100).map(i => ("a", i.toLong)).toDF("src", "id")
    val ex = intercept[Exception] {
      SampleOps.mixToTarget(df, "src", "id", Map("a" -> 0.5, "ghost" -> 0.5)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("mixToTarget")), ex.toString)
    // all-absent targets: empty output (documented), no error
    assert(SampleOps.mixToTarget(df, "src", "id", Map("ghost" -> 1.0)).count() == 0)
  }

  test("count_min_sketch estimates are one-sided within the epsilon bound") {
    val docs = Tables(spark, sf, "documents")
    val sketch = docs.agg(
      expr("count_min_sketch(lang, 0.001d, 0.99d, 42)").as("cms"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch))
    val truth = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val n = truth.values.sum
    truth.foreach { case (lang, cnt) =>
      val est = cms.estimateCount(lang)
      assert(est >= cnt, s"CMS must never underestimate: $lang est=$est true=$cnt")
      assert(est <= cnt + (0.001 * n).ceil.toLong + 1,
        s"CMS $lang est=$est exceeds epsilon bound over true=$cnt (n=$n)")
    }
  }

  test("agg_cms_checked key: estimates one-sided, every status within the eps*N bound") {
    val got = graft.queries.Catalog.specs("agg_cms_checked").fn(spark, sf)
      .select($"o_orderstatus", $"n_keys", $"n_under", $"max_over", $"within_bound")
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (st, nKeys, nUnder, maxOver, within) =>
      assert(nKeys >= 1, s"$st: no keys probed")
      assert(nUnder == 0, s"$st: CMS must never underestimate, $nUnder keys did")
      assert(maxOver >= 0, s"$st: negative overestimate $maxOver")
      assert(within == 1, s"$st: a key exceeded the eps*N bound (max_over=$maxOver)")
    }
  }

  test("approx_percentile lands within the exact percentile neighborhood") {
    val li = Tables(spark, sf, "lineitem")
    val approx = li.agg(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50"))
      .head().getDouble(0)
    val exactBand = li.agg(
      expr("percentile(l_extendedprice, 0.45)").as("lo"),
      expr("percentile(l_extendedprice, 0.55)").as("hi")).head()
    assert(approx >= exactBand.getDouble(0) && approx <= exactBand.getDouble(1),
      s"approx p50 $approx outside [${exactBand.getDouble(0)}, ${exactBand.getDouble(1)}]")
  }

  test("weightedSample(portableHash) matches the hand-evaluated LCG predicate") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, (i % 11).toDouble / 10.0)).toDF("id", "w")
    val kept = SampleOps.weightedSample(df, "id", "w", portableHash = true)
      .select($"id").as[Long].collect().toSet
    // the exact contract: u = LCG(id + seed) / 2^31 < clamp(w)
    val expected = (1L to 2000L).filter { i =>
      val u = (((i + 42L) * 1103515245L + 12345L) % (1L << 31) + (1L << 31)) % (1L << 31)
      u.toDouble / (1L << 31).toDouble < math.min(1.0, math.max(0.0, (i % 11).toDouble / 10.0))
    }.toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < 2000)
    // weight 0 never kept, weight 1 always kept (u < 1.0 is certain)
    assert(!kept.exists(_ % 11 == 0))
    assert((1L to 2000L).filter(_ % 11 == 10).forall(kept.contains))
  }

  test("samplePerGroup: exact counts, deterministic, partitioning-independent") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (s"g${i % 7}", i)).toDF("grp", "id")
    val got = SampleOps.samplePerGroup(df, "grp", "id", n = 20, seed = 5L)
    val counts = got.groupBy($"grp").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // every group has > 20 members here ⇒ exactly 20 each
    assert(counts.values.forall(_ == 20L), counts.toString)
    assert(counts.keySet == (0 until 7).map(i => s"g$i").toSet)
    // small group: min(n, |group|)
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("grp", "id")
    assert(SampleOps.samplePerGroup(tiny, "grp", "id", n = 5).count() == 3)
    // the draw is a property of the ids, not the partitioning
    val ids1 = got.select($"id").as[Long].collect().toSet
    val ids2 = SampleOps.samplePerGroup(df.repartition(13), "grp", "id", 20, 5L)
      .select($"id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // different seed draws a different subset
    val ids3 = SampleOps.samplePerGroup(df, "grp", "id", 20, seed = 6L)
      .select($"id").as[Long].collect().toSet
    assert(ids3 != ids1)
    // hand-check one group against the LCG ranking contract
    val g0 = (1L to 1000L).filter(_ % 7 == 0)
    def u(i: Long): Double = {
      val m = 1L << 31
      val x = ((i + 5L) * 1103515245L + 12345L) % m
      ((x + m) % m).toDouble / m.toDouble
    }
    val expected = g0.sortBy(i => (u(i), i)).take(20).toSet
    assert(ids1.filter(_ % 7 == 0) == expected)
  }

  test("portable-LCG consumers reject non-numeric id/key columns loudly") {
    import spark.implicits._
    val strDf = Seq(("g1", "uuid-1"), ("g1", "uuid-2")).toDF("grp", "id")
    intercept[IllegalArgumentException] {
      SampleOps.samplePerGroup(strDf, "grp", "id", n = 1)
    }
    intercept[IllegalArgumentException] {
      SampleOps.assignSplits(strDf, "id", Seq("train" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      SampleOps.mixToTarget(strDf, "grp", "id", Map("g1" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      SampleOps.weightedSample(
        strDf.withColumn("w", lit(0.5)), "id", "w", portableHash = true)
    }
  }

  test("samplePerGroup plans through the TopKPerKey bounded-heap strategy") {
    import spark.implicits._
    graft.plans.TopKPerKey.register(spark)
    val df = (1L to 1000L).map(i => (s"g${i % 7}", i)).toDF("grp", "id")
    val got = SampleOps.samplePerGroup(df, "grp", "id", n = 20)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), plan.take(1500))
  }

  test("deterministicShuffle: exact permutation matching the local LCG replay") {
    val ids = (0L until 1000L).toDF("id")
    val got = SampleOps.deterministicShuffle(ids, "id", seed = 7L)
      .select($"id", $"shuffle_pos").as[(Long, Long)].collect().toMap
    // a permutation: every row exactly once, positions 0..n-1
    assert(got.size == 1000 && got.values.toSeq.sorted == (0L until 1000L))
    // bit-exact replay of the portable LCG order
    val expected = (0L until 1000L)
      .sortBy(id => (((id + 7) * 1103515245L + 12345L) % (1L << 31), id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got == expected)
    // the order is genuinely shuffled, not the identity
    assert((0L until 1000L).count(i => got(i) == i) < 50)
  }

  test("deterministicShuffle is partitioning-invariant; seed changes the epoch order") {
    val ids = (0L until 500L).toDF("id")
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      SampleOps.deterministicShuffle(df, "id", seed)
        .select($"id", $"shuffle_pos").as[(Long, Long)].collect().toMap
    assert(run(ids.repartition(7), 3L) == run(ids.repartition(2), 3L))
    assert(run(ids, 3L) != run(ids, 4L))
  }

  test("curriculumSample: exact rank buckets, per-bucket fractions, local replay") {
    // quality = id for a transparent ranking: ranks 0..99 → 4 buckets of 25
    val df = (0L until 100L).toDF("id").withColumn("q", $"id")
    val got = SampleOps.curriculumSample(df, "q", "id", Seq(0.0, 0.2, 0.6, 1.0))
      .select($"id", $"quality_bucket").as[(Long, Long)].collect().toMap
    // local replay of the op's own contract: bucket = rank*4 div 100,
    // keep iff LCG(id+42) < fraction(bucket)
    val fr = Seq(0.0, 0.2, 0.6, 1.0)
    val expected = (0L until 100L).flatMap { id =>
      val bucket = (id * 4) / 100 // rank == id here
      val u = (((id + 42) * 1103515245L + 12345L) % (1L << 31)).toDouble / (1L << 31)
      if (u < fr(bucket.toInt)) Some(id -> bucket) else None
    }.toMap
    assert(got == expected)
    // the 0-fraction bucket keeps nothing, the 1.0 bucket keeps everything
    assert(!got.values.exists(_ == 0L))
    assert(got.count(_._2 == 3L) == 25)
    // partitioning invariance
    val repart = SampleOps.curriculumSample(
      df.repartition(7), "q", "id", Seq(0.0, 0.2, 0.6, 1.0))
      .select($"id", $"quality_bucket").as[(Long, Long)].collect().toMap
    assert(repart == got)
  }

  test("packEfficiency: hand-computed bins, underfill, straddler overflow") {
    // group g, budget 10, docs in id order with costs 6,6,12,3:
    //   cum-before: 0,6,12,24 → bins 0,0,1,2
    //   bin 0 = {6,6} cost 12 (overflow 2), bin 1 = {12} cost 12
    //   (overflow 2 — the straddler), bin 2 = {3} cost 3 (underfill 7)
    val df = Seq(("g", 1L, 6L), ("g", 2L, 6L), ("g", 3L, 12L), ("g", 4L, 3L))
      .toDF("src", "id", "cost")
    val binned = SampleOps.packSequences(df, "src", "id", "cost", budget = 10L)
    val eff = SampleOps.packEfficiency(binned, "src", "cost", budget = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // (src, n_docs, n_bins, total_cost, capacity, underfill, overflow, max)
    assert(eff.toSeq == Seq(("g", 4L, 3L, 27L, 30L, 7L, 4L, 12L)))
  }

  test("split-by-cluster composition: near-dup pairs never straddle a split") {
    // the sample_split_by_cluster contract end to end through the REAL
    // clustering path: docs 1/2 and 3/4 are near-dups, 5 is a singleton
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "one two three four five six"),
      (4L, "one two three four five seven"),
      (5L, "totally unrelated content words")).toDF("doc_id", "text")
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 0.3,
      shingleN = 2).select($"id_a", $"id_b")
    assert(pairs.count() == 2, "fixture must produce both near-dup pairs")
    val clusters = DedupOps.connectedComponents(
      docs.select($"doc_id"), pairs, "doc_id", "id_a", "id_b")
    val out = SampleOps.assignSplits(clusters, "cluster_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val straddle = pairs
      .join(out.select($"doc_id".as("id_a"), $"split".as("sa")), Seq("id_a"))
      .join(out.select($"doc_id".as("id_b"), $"split".as("sb")), Seq("id_b"))
      .filter($"sa" =!= $"sb").count()
    assert(straddle == 0)
    assert(out.count() == 5) // singletons keep their row
  }

  test("popularityNegatives: k draws per actor, items from the vocabulary only") {
    val items = Seq((10L, 100L), (20L, 50L), (30L, 1L)).toDF("item", "cnt")
    val actors = (1L to 50L).toDF("a")
    val out = SampleOps.popularityNegatives(
      actors, "a", items, "item", "cnt", k = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.length == 200)
    assert(out.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(1L, 2L, 3L, 4L)))
    assert(out.map(_._3).toSet.subsetOf(Set(10L, 20L, 30L)))
  }

  test("popularityNegatives: draw frequencies track the smoothed popularity") {
    // w ∝ c^0.75: c=10000 → 1000, c=1 → 1 (relative 1000:1 per item);
    // with 500 actors × 8 draws the rare item must stay rare and the
    // popular one dominant — deterministic under the fixed LCG
    val items = Seq((1L, 10000L), (2L, 1L)).toDF("item", "cnt")
    val actors = (1L to 500L).toDF("a")
    val counts = SampleOps.popularityNegatives(
      actors, "a", items, "item", "cnt", k = 8)
      .groupBy($"item").count().as[(Long, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == 4000)
    assert(counts(1L).toDouble / total > 0.99, s"$counts")
  }

  test("popularityNegatives is deterministic and seed-sensitive") {
    val items = Seq((1L, 5L), (2L, 9L), (3L, 2L)).toDF("item", "cnt")
    val actors = (1L to 20L).toDF("a")
    def run(seed: Long) = SampleOps.popularityNegatives(
      actors, "a", items, "item", "cnt", k = 3, seed = seed)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(run(42L) == run(42L))
    assert(run(42L) != run(7L))
  }

  test("popularityNegatives: zero-count and NULL items are excluded from the CDF") {
    val items = Seq((Some(1L), 5L), (Some(2L), 0L), (None, 9L))
      .toDF("item", "cnt")
    val actors = (1L to 30L).toDF("a")
    val drawn = SampleOps.popularityNegatives(
      actors, "a", items, "item", "cnt", k = 2)
      .select($"item").as[Long].collect().toSet
    assert(drawn == Set(1L))
  }

  test("popularityNegatives: the actor side is never shuffled or joined") {
    val items = Seq((1L, 5L)).toDF("item", "cnt")
    val actors = (1L to 10L).toDF("a")
    val plan = SampleOps.popularityNegatives(
      actors, "a", items, "item", "cnt", k = 2)
      .queryExecution.executedPlan
    // the CDF rides the plan as a 1-row broadcast; no equi-join
    // machinery and no exchange may touch the actor stream
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    assert(plan.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }.isEmpty, s"unexpected equi-join:\n$plan")
  }

  test("popularityNegatives fails with a NAMED error on an empty popularity table") {
    val items = Seq((1L, 0L), (2L, 0L)).toDF("item", "cnt")
    val actors = (1L to 3L).toDF("a")
    val e = intercept[Exception] {
      SampleOps.popularityNegatives(actors, "a", items, "item", "cnt", k = 2)
        .collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("popularityNegatives"), s"${e.getMessage}")
  }

  test("popularityNegatives validates its arguments") {
    val items = Seq((1L, 5L)).toDF("item", "cnt")
    val actors = Seq("x").toDF("a")
    intercept[IllegalArgumentException] {
      SampleOps.popularityNegatives((1L to 3L).toDF("a"), "a",
        items, "item", "cnt", k = 0)
    }
    intercept[IllegalArgumentException] {
      SampleOps.popularityNegatives(actors, "a", items, "item", "cnt", k = 1)
    }
  }

  // --- gumbelTopK ------------------------------------------------------

  test("gumbelTopK matches an exact local replay of the quantized key chain") {
    val rows = (1L to 50L).map(i => (i, (i % 7 + 1).toInt))
    val out = SampleOps.gumbelTopK(rows.toDF("id", "w"), "id", "w",
      k = 10, seed = 7L)
      .as[(Int, Long, Int, Double)].collect().toSeq
    def bd9(x: Double) = new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)
    val m = 1L << 31
    val keys = rows.map { case (id, w) =>
      val u = (Math.floorMod((id + 7L) * 1103515245L + 12345L, m)
        .toDouble + 0.5) / m.toDouble
      val k = bd9(math.log(w.toDouble))
        .add(bd9(-math.log(-math.log(u))))
      (id, w, k)
    }
    val expected = keys.sortBy { case (id, _, k) => (k.negate, id) }
      .take(10).zipWithIndex
      .map { case ((id, w, k), i) => (i + 1, id, w, k.doubleValue) }
    assert(out == expected)
  }

  test("gumbelTopK: deterministic under partitioning; seed changes the draw") {
    val rows = (1L to 200L).map(i => (i, 1)) // equal weights: pure noise order
    val a = SampleOps.gumbelTopK(rows.toDF("id", "w"), "id", "w", 20, seed = 1L)
      .as[(Int, Long, Int, Double)].collect().toSeq
    val b = SampleOps.gumbelTopK(rows.toDF("id", "w").repartition(11),
      "id", "w", 20, seed = 1L).as[(Int, Long, Int, Double)].collect().toSeq
    assert(a == b)
    val c = SampleOps.gumbelTopK(rows.toDF("id", "w"), "id", "w", 20, seed = 2L)
      .as[(Int, Long, Int, Double)].collect().toSeq
    assert(a.map(_._2) != c.map(_._2))
  }

  test("gumbelTopK: non-positive weights raise; k validation") {
    val df = Seq((1L, 0)).toDF("id", "w")
    intercept[Exception] {
      SampleOps.gumbelTopK(df, "id", "w", 5).collect()
    }
    intercept[IllegalArgumentException] {
      SampleOps.gumbelTopK(df, "id", "w", 0)
    }
  }
}
