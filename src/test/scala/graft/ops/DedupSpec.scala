package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (0L, "spark makes distributed data processing fast and simple for everyone today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "large language models need deduplicated training data to avoid memorization"),
    (3L, "columnar storage formats like parquet enable efficient analytical scans"),
    (4L, "window functions compute running aggregates over ordered partitions"))

  test("exactDedup keeps the min-id winner per key, deterministically") {
    val df = (base ++ Seq((10L, base(1)._2), (11L, base(1)._2))).toDF("doc_id", "text")
    val out = DedupOps.exactDedup(df, Seq("text"), "doc_id")
    assert(out.count() == 5)
    assert(out.filter($"text" === base(1)._2).select("doc_id").as[Long].head() == 1L)
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    // near-dup: one token changed out of 12 → high shingle overlap
    val nearDup = (20L, "the quick brown fox jumps over the lazy dog near the riverbank")
    val exactDup = (21L, base(2)._2)
    val df = (base ++ Seq(nearDup, exactDup)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashCandidatePairs(df, "doc_id", "text",
      estThreshold = 0.35)
    val found = pairs.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 20L)), s"near-dup pair missing, got $found")
    assert(found.contains((2L, 21L)), s"exact-dup pair missing, got $found")
    // unrelated docs don't pair
    assert(!found.exists { case (a, b) => Set(a, b) == Set(0L, 3L) })
  }

  test("minhashCandidatePairs releases its signature cache (no session leak)") {
    def docs(salt: String) = (1 to 30)
      .map(i => (i.toLong, s"$salt document number $i shares alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    DedupOps.minhashCandidatePairs(docs("x"), "doc_id", "text").count()
    DedupOps.minhashCandidatePairs(docs("y"), "doc_id", "text").count()
    val added = sc.getPersistentRDDs.keySet -- before
    // at most the two (small) localCheckpoint'd results may remain pinned
    // until GC; the corpus-sized signature caches must be gone
    assert(added.size <= 2, s"leaked cached RDDs beyond the checkpointed results: $added")
  }

  test("lazy variant (eager=false) returns the same pairs with zero cached/checkpointed blocks") {
    val df = (base ++ Seq((21L, base(2)._2))).toDF("doc_id", "text")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val lazyPairs = DedupOps.minhashCandidatePairs(df, "doc_id", "text", eager = false)
    // nothing materialized at call time, nothing pinned after execution
    assert(sc.getPersistentRDDs.keySet == before)
    val eagerPairs = DedupOps.minhashCandidatePairs(df, "doc_id", "text")
    assert(lazyPairs.collect().toSet == eagerPairs.collect().toSet)
    assert((sc.getPersistentRDDs.keySet -- before).size <= 1,
      "lazy path must not add caches; only the eager checkpoint may remain")
  }

  test("minhash est_jaccard ≈ 1.0 for identical docs") {
    val df = Seq((0L, base(0)._2), (1L, base(0)._2)).toDF("doc_id", "text")
    val est = DedupOps.minhashCandidatePairs(df, "doc_id", "text")
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("simhash: identical docs → hamming 0; near-dups → small; unrelated → large") {
    val df = (base ++ Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river banks"),
      (21L, base(1)._2))).toDF("doc_id", "text")
    val sigs = df.select($"doc_id", DedupOps.simhash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(21L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(20L)) <= 12, s"near-dup hamming ${ham(sigs(1L), sigs(20L))}")
    assert(ham(sigs(0L), sigs(3L)) > 12, s"unrelated hamming ${ham(sigs(0L), sigs(3L))}")
  }

  test("simhash is order-invariant: token rotation → hamming 0; checked key separates") {
    // the dedup_simhash_vs_exact fixture property: a token ROTATION has
    // the same token multiset ⇒ identical simhash, while its 3-gram
    // shingle set differs only at the boundary (jaccard high, not 1)
    val rot = base.map { case (id, t) =>
      val w = t.split(" "); (id + 100L, (w.drop(3) ++ w.take(3)).mkString(" ")) }
    val df = (base ++ rot).toDF("doc_id", "text")
    val sigs = df.select($"doc_id", DedupOps.simhash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    base.foreach { case (id, _) =>
      assert(sigs(id) == sigs(id + 100L), s"rotation of $id must not move the signature") }
    // the separation the checked key asserts: rotation-pair jaccard ≫
    // unrelated-pair jaccard, on exact 3-gram shingles
    val pairs = rot.map { case (rid, _) => (rid - 100L, rid, "near") } ++
      Seq((0L, 1L, "far"), (2L, 3L, "far"))
    val scored = DedupOps.exactJaccardForPairs(
      pairs.toDF("id_a", "id_b", "bucket"), df, "doc_id", "text")
      .groupBy($"bucket").agg(avg($"jaccard").as("j"))
      .as[(String, Double)].collect().toMap
    assert(scored("near") > scored("far") + 0.2,
      s"separation failed: near ${scored("near")} vs far ${scored("far")}")
  }

  test("simhashDupPairs surfaces exact duplicates via chunk LSH") {
    val df = (base ++ Seq((21L, base(1)._2))).toDF("doc_id", "text")
    val pairs = DedupOps.simhashDupPairs(df, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 21L)))
  }

  test("sf0.1 documents: the 8 real duplicate texts are found (FIXTURES.md)") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // ground truth: 5,000 docs, 4,992 distinct texts → 8 superseded rows
    val exact = DedupOps.exactDedup(docs, Seq("text"), "doc_id")
    assert(docs.count() == 5000 && exact.count() == 4992)
    // minhash LSH finds every exact duplicate (est_jaccard = 1.0 pairs)
    val mh = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
      estThreshold = 0.99)
    assert(mh.count() >= 8, s"minhash found only ${mh.count()} of 8 exact dups")
    // simhash agrees: identical texts share a signature
    val sh = DedupOps.simhashDupPairs(docs, "doc_id", "text", maxHamming = 0)
    assert(sh.count() >= 8)
  }

  test("lshBands and simhashDupPairs reject invalid configurations") {
    import org.apache.spark.sql.functions.col
    intercept[IllegalArgumentException] {
      DedupOps.lshBands(col("sig"), numHashes = 64, bands = 100)
    }
    intercept[IllegalArgumentException] {
      DedupOps.lshBands(col("sig"), numHashes = 64, bands = 24)
    }
    intercept[IllegalArgumentException] {
      DedupOps.simhashDupPairs(base.toDF("doc_id", "text"), "doc_id", "text",
        maxHamming = 4)
    }
  }

  test("ngramJaccardPairs computes exact token-set jaccard") {
    val df = Seq(
      (0L, "a b c d"), (1L, "a b c e"), (2L, "x y z w")).toDF("doc_id", "text")
    val pairs = DedupOps.ngramJaccardPairs(df, "doc_id", "text", 0.1)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((0L, 1L, 0.6))) // |∩|=3, |∪|=5
  }

  test("tokenContainmentPairs: asymmetric directions; quote detected where jaccard misses") {
    // doc 1 is a strict 3-token subset of doc 0's 10 tokens:
    // containment from doc 1's side = 1.0 while jaccard = 3/10
    val df = Seq(
      (0L, "a b c d e f g h i j"), (1L, "a b c"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val got = DedupOps.tokenContainmentPairs(df, "doc_id", "text", 0.6)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((0L, 1L, 3L, 10L, 3L, 0.3, 1.0)), got.mkString(","))
    val jac = DedupOps.ngramJaccardPairs(df, "doc_id", "text", 0.6)
      .collect()
    assert(jac.isEmpty, "jaccard at the same threshold must miss the quote")
    intercept[IllegalArgumentException] {
      DedupOps.tokenContainmentPairs(df, "doc_id", "text", 0.0)
    }
  }

  test("minhash est_jaccard agrees with exact shingle jaccard within the LSH bound (sf0.1)") {
    // the estimator check: every candidate pair's est_jaccard (fraction
    // of agreeing minhashes) is compared to the EXACT shingle-set
    // jaccard. Near-dups are planted from the corpus itself — every 5th
    // doc re-appears minus its first two tokens, so true J = (n-4)/(n-2)
    // ∈ [0.75, 0.97] for the 10-100-token sf0.1 texts.
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")
    val variants = docs.filter($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"),
        concat_ws(" ", slice(split($"text", "\\s+"), 3, Int.MaxValue)).as("text"))
    val corpus = docs.unionByName(variants)
    val pairs = DedupOps.minhashCandidatePairs(corpus, "doc_id", "text",
      estThreshold = 0.4)
    val checked = DedupOps.exactJaccardForPairs(pairs, corpus, "doc_id", "text")
      .select($"est_jaccard", $"jaccard").as[(Double, Double)].collect()
    // 1000 planted pairs (+8 real dups); banding at J≥0.75 misses ≈none
    assert(checked.length >= 950, s"only ${checked.length} candidate pairs surfaced")
    val errs = checked.map { case (e, j) => math.abs(e - j) }
    val mean = errs.sum / errs.length
    // 64 hashes → per-pair σ = sqrt(J(1-J)/64) ≤ 0.0625; the mean |err|
    // must sit inside one σ and no pair outside ~4σ
    assert(mean <= 0.0625, s"mean |est-exact| = $mean exceeds the LSH bound")
    assert(errs.max <= 0.25, s"max |est-exact| = ${errs.max}")
  }

  test("degeneracy caps are pair budgets: a near-cap bucket stays under budget") {
    // 100 docs all sharing one ubiquitous token ("common") plus a unique
    // token each. Under a DOC-count cap of, say, 10000 the shared bucket
    // would be admitted and emit 100*99/2 = 4950 pairs; under a PAIR
    // budget of 1000 it must be pruned (4950 > 1000) and emit zero.
    val df = (0 until 100).map(i => (i.toLong, s"common unique$i")).toDF("doc_id", "text")
    val capped = DedupOps.ngramJaccardPairs(df, "doc_id", "text",
      threshold = 0.0, maxBucketPairs = 1000L)
    assert(capped.count() == 0,
      "near-cap stopword bucket must be pruned by the pair budget")
    // with a budget that admits the bucket, all 4950 pairs appear
    val admitted = DedupOps.ngramJaccardPairs(df, "doc_id", "text",
      threshold = 0.0, maxBucketPairs = 5000L)
    assert(admitted.count() == 4950)

    // minhash: identical docs collide in every band; pair budget of 0
    // prunes every bucket → no candidates; default budget finds the pair
    val dup = Seq((0L, base(0)._2), (1L, base(0)._2)).toDF("doc_id", "text")
    val pruned = DedupOps.minhashCandidatePairs(dup, "doc_id", "text",
      maxBucketPairs = 0L)
    assert(pruned.count() == 0)
    val found = DedupOps.minhashCandidatePairs(dup, "doc_id", "text")
    assert(found.count() == 1)
  }

  test("incrementalDedup: exact tier drops corpus-duplicate batch docs; near tier drops near-dups") {
    val corpus = base.toDF("doc_id", "text")
    val nearDupText = base(2)._2.split(" ").drop(1).mkString(" ") // drop 1st token of doc 2
    val batch = Seq(
      (100L, base(0)._2),                      // exact dup of corpus doc 0
      (101L, "a genuinely novel document about nothing seen before in any corpus"),
      (102L, nearDupText))                     // near-dup of corpus doc 2
      .toDF("doc_id", "text")
    // exact tier: only the byte-identical dup is dropped
    val exact = DedupOps.incrementalDedup(corpus = corpus, batch = batch,
      idCol = "doc_id", textCol = "text")
    assert(exact.select("doc_id").as[Long].collect().toSet == Set(101L, 102L))
    // near tier: the near-dup goes too; the novel doc survives
    val near = DedupOps.incrementalDedup(corpus = corpus, batch = batch,
      idCol = "doc_id", textCol = "text", nearDup = true)
    assert(near.select("doc_id").as[Long].collect().toSet == Set(101L))
    // idempotent shape: an empty batch stays empty, schema unchanged
    val empty = DedupOps.incrementalDedup(batch.limit(0), corpus, "doc_id", "text", nearDup = true)
    assert(empty.count() == 0 && empty.columns.toSeq == batch.columns.toSeq)
    // near tier requires unique non-null ids: the per-id all-bands-miss
    // count is meaningless otherwise — duplicate ids raise in-plan
    // instead of silently dropping every row that shares the id
    val dupIds = Seq((200L, "novel text one of a kind"),
      (200L, "another brand new never seen text")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      DedupOps.incrementalDedup(dupIds, corpus, "doc_id", "text", nearDup = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("incrementalDedup")), ex.toString)
    // the exact tier has no such constraint (anti join is per row)
    assert(DedupOps.incrementalDedup(dupIds, corpus, "doc_id", "text").count() == 2)
  }

  test("incrementalDedupBloom equals the exact tier; bloom prefilter is in the plan") {
    val docs = (1L to 400L).map(i => (i, s"document body number ${i % 350}"))
      .toDF("doc_id", "text") // ids 351..400 duplicate 1..50's text
    val corpus = docs.filter($"doc_id" <= 350)
    val batch = docs.filter($"doc_id" > 350)
      .unionByName(Seq((9001L, "genuinely novel text alpha"),
        (9002L, "genuinely novel text beta")).toDF("doc_id", "text"))
    val exact = DedupOps.incrementalDedup(batch, corpus, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    val sketch = DedupOps.bloomFitDigests(corpus, "text", expectedItems = 1000L)
    assert(sketch.nonEmpty)
    val bloomed = DedupOps.incrementalDedupBloom(batch, corpus, "doc_id", "text", sketch)
    assert(bloomed.select($"doc_id").as[Long].collect().toSet == exact)
    assert(exact == Set(9001L, 9002L))
    // analyzed (pre-optimization) plan: over a LocalRelation fixture the
    // optimizer constant-folds the whole prefilter away, which is itself
    // correct behavior — the assert pins that the op BUILDS the bloom
    // probe, not how far Catalyst folds it on toy inputs
    val plan = bloomed.queryExecution.analyzed.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      plan.take(2000))
    // schema unchanged, empty batch stays empty
    assert(bloomed.columns.toSeq == batch.columns.toSeq)
    assert(DedupOps.incrementalDedupBloom(batch.limit(0), corpus, "doc_id", "text", sketch)
      .count() == 0)
  }

  test("large-star/small-star CC equals union-find; converges on chains where min-label rails") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 50
      val edges = (1 to 70).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = DedupOps.connectedComponentsLargeStar(
        (0 until n).map(_.toLong).toDF("id"), edges.toDF("a", "b"), "id", "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
    // 61-node chain (diameter 60): r17's pointer-doubling step makes
    // min-label O(log d) too — 10 rounds suffice where the pre-r17
    // neighbor-only propagation railed at 25 (both O(log) algorithms
    // now agree on the adversarial chain)
    val nodes = (0L to 60L).toDF("id")
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val gotMl = DedupOps.connectedComponents(nodes, chain, "id", "a", "b",
      maxIterations = 10)
      .as[(Long, Long)].collect().toMap
    assert((0L to 60L).forall(gotMl(_) == 0L), gotMl.toString)
    val got = DedupOps.connectedComponentsLargeStar(nodes, chain, "id", "a", "b",
      maxIterations = 15)
      .as[(Long, Long)].collect().toMap
    assert((0L to 60L).forall(got(_) == 0L), got.toString)
  }

  test("decontaminate counts benchmark n-gram overlaps; clean docs absent") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon"),      // shares "alpha beta","beta gamma" w/ bench
      (11L, "zeta eta theta iota kappa"),           // clean
      (12L, "mu nu alpha beta xi"),                 // shares "alpha beta"
      (13L, "beta alpha gamma nu mu"))              // same words, DIFFERENT bigrams → clean
      .toDF("doc_id", "text")
    val bench = Seq((0L, "alpha beta gamma omicron")).toDF("doc_id", "text")
    val got = DedupOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 2L, 12L -> 1L), got.toString)
    // overlap is on distinct shingles: repeating a contaminated bigram
    // in one doc counts once
    val rep = Seq((20L, "alpha beta x alpha beta")).toDF("doc_id", "text")
    val got2 = DedupOps.decontaminate(rep, bench, "doc_id", "text", shingleN = 2)
      .as[(Long, Long)].collect().toMap
    assert(got2 == Map(20L -> 1L))
  }

  test("contaminationScore: fractions, flag threshold, zero-gram guard") {
    val corpus = Seq(
      (10L, "alpha beta gamma omicron"),      // every bigram in bench → 1.0
      (11L, "alpha beta x y z"),              // 1 of 4 bigrams → 0.25
      (12L, "zeta eta theta iota"),           // clean → 0.0
      (13L, "solo"))  // < shingleN tokens → whole text as ONE gram
      .toDF("doc_id", "text")
    val bench = Seq((0L, "alpha beta gamma omicron")).toDF("doc_id", "text")
    val got = DedupOps.contaminationScore(corpus, bench, "doc_id", "text",
        shingleN = 2, flagThreshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_overlap"),
          r.getAs[Double]("contamination"), r.getAs[Int]("flagged"))).toMap
    assert(got(10L) == ((3L, 3L, 1.0, 1)))
    assert(got(11L) == ((4L, 1L, 0.25, 0)))
    assert(got(12L) == ((3L, 0L, 0.0, 0)))
    // shingle_array contract: a doc shorter than the shingle width is
    // its own single whole-text gram — clean here ("solo" ∉ bench)
    assert(got(13L) == ((1L, 0L, 0.0, 0)), s"short doc: ${got(13L)}")
    assert(got.size == 4, "every corpus doc scored, contaminated or not")
  }

  test("connectedComponents matches driver union-find on random graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (1 to 80).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: driver-side union-find with min-id representatives
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val nodes = (0 until n).map(_.toLong).toDF("id")
      val pairs = edges.toDF("a", "b")
      val got = DedupOps.connectedComponents(nodes, pairs, "id", "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("connectedComponents: chains, singletons, duplicate + missing-node pairs") {
    // a 6-node chain (diameter 5 — exercises multi-round propagation),
    // a 2-clique with the pair listed twice in both orientations, a
    // singleton, and a pair whose ids are absent from `nodes`
    val nodes = (0L to 8L).toDF("id")
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain 0-5
      (6L, 7L), (7L, 6L), (6L, 7L),                      // dup'd clique
      (100L, 101L))                                      // not in nodes
      .toDF("a", "b")
    val got = DedupOps.connectedComponents(nodes, pairs, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((0L to 5L).forall(got(_) == 0L))
    assert(got(6L) == 6L && got(7L) == 6L)
    assert(got(8L) == 8L, "singleton clusters as itself")
    assert(got(100L) == 100L && got(101L) == 100L, "edge-only ids still cluster")
    assert(got.size == 11)
    // iteration rail: the 6-chain cannot converge in 2 rounds
    assertThrows[IllegalStateException] {
      DedupOps.connectedComponents(nodes, pairs, "id", "a", "b", maxIterations = 2)
    }
  }

  test("editDistanceVerify confirms planted near-dups, rejects jaccard-only collisions") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base),                                   // exact dup: dist 0
      (3L, base.replace("gamma", "gXmma")),         // near dup: dist 1
      // same bigram multiset mostly, but giant edit: shared prefix then long tail
      (4L, base + " " + ("x" * 60)),                // candidate, dist 61 > cap
      (5L, "totally different words here nothing shared at all"))
      .toDF("doc_id", "text")
    val got = DedupOps.editDistanceVerify(
      docs, "doc_id", "text", minJaccard = 0.4, maxDist = 10, shingleN = 2)
      .orderBy($"id_a", $"id_b")
      .select($"id_a", $"id_b", $"edit_dist").as[(Long, Long, Int)]
      .collect().toSeq
    assert(got == Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
    // the corpus text column must reach levenshtein via BROADCAST joins —
    // never a shuffled join on the full text stream
    val plan = DedupOps.editDistanceVerify(
      docs, "doc_id", "text", 0.4, 10, 2).queryExecution.executedPlan.toString
    val attachJoins = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(attachJoins >= 2, plan.take(3000))
  }

  test("connected components: reliable checkpointDir mode equals local mode") {
    val ckpt = java.nio.file.Files.createTempDirectory("cc_ckpt").toFile.getAbsolutePath
    val rng = new scala.util.Random(3)
    val nodes = (0L to 20L).toDF("id")
    val pairs = (1 to 30).map(_ => (rng.nextInt(21).toLong, rng.nextInt(21).toLong))
      .filter { case (a, b) => a != b }.toDF("a", "b")
    val local = DedupOps.connectedComponents(nodes, pairs, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    val reliable = DedupOps.connectedComponents(nodes, pairs, "id", "a", "b",
      checkpointDir = Some(ckpt)).as[(Long, Long)].collect().toMap
    assert(reliable == local)
    val lsLocal = DedupOps.connectedComponentsLargeStar(nodes, pairs, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    val lsReliable = DedupOps.connectedComponentsLargeStar(nodes, pairs, "id", "a", "b",
      checkpointDir = Some(ckpt)).as[(Long, Long)].collect().toMap
    assert(lsLocal == local && lsReliable == local)
    // the reliable mode really wrote generations to the shared dir (the
    // property that survives executor loss)
    def files(f: java.io.File): Int =
      Option(f.listFiles).toSeq.flatten.map(c =>
        if (c.isDirectory) files(c) else 1).sum
    assert(files(new java.io.File(ckpt)) > 0, s"no checkpoint files under $ckpt")
  }

  test("fuzzyDedupE2E keeps the min-id survivor per cluster, passes uniques; idempotent") {
    val baseTxt = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, baseTxt),
      (2L, baseTxt),                           // exact dup of 1
      (3L, baseTxt.replace("fox", "cat")),     // near dup of 1 (bigram J ≈ 0.71)
      (4L, "completely different text about spark catalyst and tungsten engines"),
      (5L, "another unrelated document mentioning parquet row groups and shuffles"))
      .toDF("doc_id", "text")
    val deduped = DedupOps.fuzzyDedupE2E(docs, "doc_id", "text",
      threshold = 0.4, bands = 64, shingleN = 2)
    assert(deduped.columns.toSeq == docs.columns.toSeq, "schema unchanged")
    val survivors = deduped.select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L, 5L), survivors.toString)
    // idempotent: a second pass over the deduped corpus drops nothing
    val again = DedupOps.fuzzyDedupE2E(deduped, "doc_id", "text",
      threshold = 0.4, bands = 64, shingleN = 2)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == survivors)
  }

  test("inBatchNearDedup keeps the min-id winner per band collision, passes uniques") {
    val page = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (3L, page),                      // loses to 1 (same text, all bands collide)
      (1L, page),
      (7L, page + " footer"),          // near-dup of 1 → loses
      (4L, "completely different text about catalyst and tungsten engines today"),
      (5L, "another unrelated document mentioning parquet row groups and shuffles"))
      .toDF("doc_id", "text")
    val out = DedupOps.inBatchNearDedup(docs, "doc_id", "text")
    assert(out.columns.toSeq == docs.columns.toSeq, "schema unchanged")
    val survivors = out.select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L, 5L), survivors.toString)
    // idempotent: a second pass drops nothing
    val again = DedupOps.inBatchNearDedup(out, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(again == survivors)
    // single row and empty frame pass through
    assert(DedupOps.inBatchNearDedup(
      Seq((9L, page)).toDF("doc_id", "text"), "doc_id", "text").count() == 1)
    assert(DedupOps.inBatchNearDedup(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text").count() == 0)
  }

  test("fuzzyDedupE2E normalize seam catches NFKC/NBSP variants; off-switch preserves them") {
    val baseTxt = "the quick brown fox jumps over the lazy dog again and again today"
    // visually identical to doc 1: NBSP separators, a full-width 'ｑ'
    // (NFKC → 'q'), and doubled spaces — raw hashing/shingling sees
    // different tokens everywhere, so every dedup tier misses it
    val nfkcVariant = baseTxt.replace(" ", " ")
      .replace("quick", "ｑuick").replace("dog", "dog ")
    val docs = Seq(
      (1L, baseTxt),
      (2L, nfkcVariant),
      (3L, "completely different text about spark catalyst and tungsten engines"))
      .toDF("doc_id", "text")
    val normalized = DedupOps.fuzzyDedupE2E(docs, "doc_id", "text",
      threshold = 0.4, bands = 64, shingleN = 2)
    assert(normalized.select($"doc_id").as[Long].collect().toSet == Set(1L, 3L),
      "the NFKC variant must collide with its canonical twin")
    // survivors carry ORIGINAL text — normalization never rewrites content
    val kept1 = normalized.filter($"doc_id" === 1L).select($"text").as[String].head()
    assert(kept1 == baseTxt)
    val raw = DedupOps.fuzzyDedupE2E(docs, "doc_id", "text",
      threshold = 0.4, bands = 64, shingleN = 2, normalize = false)
    assert(raw.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "normalize=false must reproduce the raw-text behavior")
  }

  test("incremental dedup handles NULL text consistently on exact and bloom paths") {
    val corpus = Seq((1L, "alpha beta gamma"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma"),            // exact dup
      (11L, null.asInstanceOf[String]),     // NULL ≡ corpus NULL → dup
      (12L, "genuinely new document"))
      .toDF("doc_id", "text")
    val exact = DedupOps.incrementalDedup(batch, corpus, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(exact == Set(12L),
      "NULL-text batch rows must dedup against corpus NULL text, not always survive")
    val sketch = DedupOps.bloomFitDigests(corpus, "text", expectedItems = 100L)
    val bloomed = DedupOps.incrementalDedupBloom(batch, corpus, "doc_id", "text", sketch)
      .select($"doc_id").as[Long].collect().toSet
    assert(bloomed == exact, "bloom path must agree with the exact path on NULLs")
    // with no NULL in the corpus, a NULL batch row is novel on BOTH paths
    val corpus2 = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val exact2 = DedupOps.incrementalDedup(batch, corpus2, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(exact2 == Set(11L, 12L))
    val sketch2 = DedupOps.bloomFitDigests(corpus2, "text", expectedItems = 100L)
    assert(DedupOps.incrementalDedupBloom(batch, corpus2, "doc_id", "text", sketch2)
      .select($"doc_id").as[Long].collect().toSet == Set(11L, 12L))
  }

  test("duplicateSpanStats counts duplicated n-gram instances per doc") {
    // doc 0 and doc 1 share the 5-token block "a b c d e" (one 5-gram
    // each); doc 2 is unique; doc 3 repeats its own block twice (both
    // instances duplicated); doc 4 is shorter than n (whole-text gram)
    val df = Seq(
      (0L, "a b c d e x y z w v"),     // 6 grams, 1 dup (the block)
      (1L, "p q r s a b c d e t"),     // 6 grams, 1 dup
      (2L, "unique tokens only appear here once more pad pad2 pad3"),
      (3L, "m n o p2 q2 m n o p2 q2"), // grams 1 and 6 identical → 2 dup
      (4L, "tiny doc"))                // 1 whole-text gram, 0 dup
      .toDF("doc_id", "text")
    val got = DedupOps.duplicateSpanStats(df, "doc_id", "text", shingleN = 5)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_grams", $"n_dup")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 6L, 1L), (1L, 6L, 1L), (2L, 6L, 0L),
      (3L, 6L, 2L), (4L, 1L, 0L)), s"got $got")
  }

  test("removeDuplicateSpans trims covered tokens from EVERY instance, drops emptied docs") {
    // same fixture as the stats test: the shared block "a b c d e" is a
    // >1-occurrence 5-gram, so BOTH instances lose their 5 tokens (no
    // canonical survivor); doc 3's self-repeat covers all 10 tokens →
    // doc dropped; whole-text grams of short docs count as instances
    val df = Seq(
      (0L, "a b c d e x y z w v"),
      (1L, "p q r s a b c d e t"),
      (2L, "unique tokens only appear here once more pad pad2 pad3"),
      (3L, "m n o p2 q2 m n o p2 q2"),
      (4L, "tiny doc"),
      (5L, "tiny doc"))                 // duplicated whole-text gram → both drop
      .toDF("doc_id", "text")
    val out = DedupOps.removeDuplicateSpans(df, "doc_id", "text", shingleN = 5)
      .orderBy($"doc_id")
      .select($"doc_id", $"text_clean", $"n_tokens", $"n_removed")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, "x y z w v", 10L, 5L),
      (1L, "p q r s t", 10L, 5L),
      (2L, "unique tokens only appear here once more pad pad2 pad3", 10L, 0L)),
      s"got $out")
  }

  test("segmentDedup keeps first occurrence, rebuilds docs, drops empty ones") {
    // seg size 3: doc 0 = [abc][def]; doc 1 repeats doc 0's first
    // segment then has its own; doc 2 is entirely doc 0's segments
    val df = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c x y z"),
      (2L, "d e f a b c"))
      .toDF("doc_id", "text")
    val out = DedupOps.segmentDedup(df, "doc_id", "text", segTokens = 3)
      .orderBy($"doc_id")
      .select($"doc_id", $"text_dedup", $"n_segs", $"n_kept")
      .as[(Long, String, Long, Long)].collect().toSeq
    // doc 0 keeps both segments (first occurrence of each); doc 1 loses
    // "a b c" to doc 0 but keeps "x y z"; doc 2's "d e f" lost to doc 0
    // (idx 1) and "a b c" lost to doc 0 (idx 0) → dropped entirely
    assert(out == Seq(
      (0L, "a b c d e f", 2L, 2L),
      (1L, "x y z", 2L, 1L)), s"got $out")
  }

  test("segmentDedup reconstruction preserves segment order") {
    val df = Seq((7L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val got = DedupOps.segmentDedup(df, "doc_id", "text", segTokens = 2)
      .select($"text_dedup").as[String].head()
    assert(got == "t1 t2 t3 t4 t5 t6 t7")
  }

  test("sortedNeighborLinkage finds prefix-sharing near-dups within the window") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon"), // truncated twin of 1
      (3L, "alpha beta gamma delta"), // twin of 2 within window of 1
      (10L, "totally unrelated text about parquet files"),
      (11L, "   "), // whitespace-only: dropped, no empty token set
      (12L, "zz distinct singleton row")).toDF("id", "text")
    val out = DedupOps.sortedNeighborLinkage(
      df, "id", "text", blockKey = substring(lower(trim($"text")), 1, 5),
      windowSize = 2, minSim = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    // sort order inside block "alpha": 3 ("…delta"), 2, 1 — so pairs
    // (3,2) jacc 4/5, (3,1) 4/6, (2,1) 5/6
    assert(out.map(p => (p._1, p._2)) == Set((3L, 2L), (3L, 1L), (2L, 1L)))
    assert(out.find(p => p._1 == 3L && p._2 == 2L).get._3 == 0.8)
    assert(out.find(p => p._1 == 2L && p._2 == 1L).get._3 == 5.0 / 6.0)
    // windowSize 1 drops the distance-2 pair
    val w1 = DedupOps.sortedNeighborLinkage(
      df, "id", "text", blockKey = substring(lower(trim($"text")), 1, 5),
      windowSize = 1, minSim = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    assert(w1.map(p => (p._1, p._2)) == Set((3L, 2L), (2L, 1L)))
  }

  test("sortedNeighborLinkage candidate budget and scores hold on random corpora") {
    val rng = new scala.util.Random(20260814L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    (1 to 10).foreach { trial =>
      val n = 20 + rng.nextInt(30)
      val docs = (1 to n).map { i =>
        val len = 3 + rng.nextInt(5)
        (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val w = 1 + rng.nextInt(3)
      val out = DedupOps.sortedNeighborLinkage(
        docs.toDF("id", "text"),
        "id", "text", blockKey = substring(lower(trim($"text")), 1, 4),
        windowSize = w, minSim = 0.0)
        .as[(Long, Long, Double)].collect()
      // linear candidate budget: at most N·w pairs ever scored
      assert(out.length <= n * w, s"trial $trial: ${out.length} > $n*$w")
      // no self-pairs, no duplicate (a, b) pairs, scores in [0, 1]
      assert(out.forall(p => p._1 != p._2), s"trial $trial: self-pair")
      assert(out.map(p => (p._1, p._2)).distinct.length == out.length,
        s"trial $trial: duplicate pair")
      assert(out.forall(p => p._3 >= 0.0 && p._3 <= 1.0))
      // scores are the true word-set Jaccard of the paired texts
      val byId = docs.toMap
      out.foreach { case (a, b, sim) =>
        val ta = byId(a).split("\\s+").toSet
        val tb = byId(b).split("\\s+").toSet
        val expect = ta.intersect(tb).size.toDouble / ta.union(tb).size
        assert(sim == expect, s"trial $trial: ($a,$b) $sim != $expect")
      }
    }
  }

  test("lineFrequencyFilter: threshold-crossing lines removed everywhere, rare/blank kept") {
    val docs = Seq(
      (1L, "alpha beta\nnav bar\n\nrare pair"),
      (2L, "gamma delta\nnav bar\nrare pair"),
      (3L, "epsilon zeta\n  nav bar  "), // trimmed match still counts
      (4L, "nav bar"),                    // ALL-boilerplate doc
      (5L, "eta theta")).toDF("doc_id", "text")
    val out = DedupOps.lineFrequencyFilter(docs, "doc_id", "text", minDocs = 3)
      .select($"doc_id", $"n_lines", $"n_lines_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // "nav bar" is in 4 distinct docs (>= 3) -> removed from ALL of
    // them, including its trimmed-whitespace variant; "rare pair" is in
    // only 2 -> kept; the empty line is exempt and kept
    assert(out(1L) == ((1L, 4L, 3L, "alpha beta\n\nrare pair")), out(1L))
    assert(out(2L) == ((2L, 3L, 2L, "gamma delta\nrare pair")), out(2L))
    assert(out(3L) == ((3L, 2L, 1L, "epsilon zeta")), out(3L))
    // the all-boilerplate doc keeps zero lines but never disappears
    assert(out(4L) == ((4L, 1L, 0L, "")), out(4L))
    assert(out(5L) == ((5L, 1L, 1L, "eta theta")), out(5L))
  }

  test("sortedNeighborLinkage plans ONE partitioned window, no join") {
    val df = Seq((1L, "a b c"), (2L, "a b d")).toDF("id", "text")
    val plan = DedupOps.sortedNeighborLinkage(
      df, "id", "text", blockKey = substring($"text", 1, 2))
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  // --- prefixTruncationPairs --------------------------------------------

  test("prefixTruncationPairs: planted truncations found, strictness holds") {
    val base = "x" * 64
    val df = Seq(
      (1L, base + " the full document body continues here"),
      (2L, base + " the full"), // strict prefix of 1
      (3L, base + " the full"), // EXACT duplicate of 2: not a pair
      (4L, base + " different tail entirely"),
      (5L, "short"), // under blockLen: out of scope by contract
      (6L, base)) // prefix of 1, 2, 3, 4
      .toDF("id", "text")
    val out = DedupOps.prefixTruncationPairs(df, "id", "text")
      .select($"short_id", $"long_id").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (2L, 1L), (3L, 1L),
      (6L, 1L), (6L, 2L), (6L, 3L), (6L, 4L)))
    intercept[IllegalArgumentException] {
      DedupOps.prefixTruncationPairs(df, "id", "text", blockLen = 0)
    }
  }

  test("prefixTruncationPairs: blocking is complete for in-contract shorts") {
    // every qualifying (short >= blockLen) prefix pair must share the
    // 64-char block by construction — brute-force cross-check
    val rnd = new scala.util.Random(23)
    val texts = (1L to 60L).map { i =>
      val head = "h" + (i % 7) + ("y" * 70)
      (i, head + ("z" * rnd.nextInt(40)))
    }
    val out = DedupOps.prefixTruncationPairs(texts.toDF("id", "text"),
      "id", "text").select($"short_id", $"long_id")
      .as[(Long, Long)].collect().toSet
    val brute = (for {
      (i, a) <- texts; (j, b) <- texts
      if i != j && a.length < b.length && b.startsWith(a) && a.length >= 64
    } yield (i, j)).toSet
    assert(out == brute)
  }

  test("bitstringDupPairs: pigeonhole blocking finds hamming<=3, drops beyond, equals brute force") {
    def bits(flips: Int*): String =
      (0 until 64).map(i => if (flips.contains(i)) '1' else '0').mkString
    // 1↔2 hamming 2 (shared segments) → found; 3 flips one bit per
    // segment vs 1 (hamming 4, NO shared segment — never a candidate);
    // 4 shares three all-zero segments with 1 (a real candidate) but
    // hamming 4 → must be verified away, not emitted
    val rows = Seq(
      (1L, bits()), (2L, bits(0, 1)), (3L, bits(0, 16, 32, 48)),
      (4L, bits(17, 18, 19, 20)))
    val out = DedupOps.bitstringDupPairs(
        rows.toDF("id", "sig"), "id", "sig", maxHamming = 3)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 2)), s"got $out")
    // property: equals brute-force hamming<=3 over random signatures
    val rnd = new scala.util.Random(7)
    val sigs = (1L to 80L).map { i =>
      // low-entropy alphabet so collisions actually occur
      (i, (0 until 64).map(_ => if (rnd.nextInt(14) == 0) '1' else '0').mkString)
    }
    val got = DedupOps.bitstringDupPairs(
        sigs.toDF("id", "sig"), "id", "sig", maxHamming = 3)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (i, a) <- sigs; (j, b) <- sigs if i < j
      h = a.zip(b).count { case (x, y) => x != y } if h <= 3
    } yield (i, j, h)).toSet
    assert(got == brute, s"banded ${got.size} vs brute ${brute.size}")
  }
}
