package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // 4 nodes; 4 is dangling-and-isolated. outdeg: 1→2, 2→1, 3→1.
  private def nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    .toDF("src", "dst")

  test("pagerankFixedPoint: hand-computed integer ranks incl. truncation") {
    // scale 1e6, d=85/100: pr0 = 250000, base = 37500
    // iter1: in_sum 1:250000 2:125000 3:375000 → pr 250000/143750/356250/37500
    // iter2: in_sum 1:356250 2:125000 3:268750
    //   85·356250 div 100 = 302812 (truncates .5) → 340312
    //   85·268750 div 100 = 228437 (truncates .5) → 265937
    val out = GraphOps.pagerankFixedPoint(nodes, edges, "id", "src", "dst",
        iterations = 2, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 340312L, 2L -> 143750L, 3L -> 265937L,
      4L -> 37500L))
  }

  test("dangling/isolated node keeps exactly the teleport mass") {
    val out = GraphOps.pagerankFixedPoint(nodes, edges, "id", "src", "dst",
        iterations = 5, scale = 1000000L)
      .as[(Long, Long)].collect().toMap
    assert(out(4L) == 37500L) // base only, every round
    // leaked mass (dangling + truncation) only ever shrinks the total
    assert(out.values.sum <= 1000000L)
    assert(out.values.forall(_ >= 37500L))
  }

  test("duplicate edges and self-loops are ignored") {
    val noisy = edges
      .unionByName(Seq((1L, 2L), (1L, 2L), (3L, 3L)).toDF("src", "dst"))
    val clean = GraphOps.pagerankFixedPoint(nodes, edges, "id", "src", "dst",
      iterations = 3, scale = 1000000L).as[(Long, Long)].collect().toMap
    val got = GraphOps.pagerankFixedPoint(nodes, noisy, "id", "src", "dst",
      iterations = 3, scale = 1000000L).as[(Long, Long)].collect().toMap
    assert(got == clean)
  }

  test("deterministic under repartitioning (integer arithmetic only)") {
    val a = GraphOps.pagerankFixedPoint(nodes, edges, "id", "src", "dst",
      iterations = 4, scale = 1000000L).as[(Long, Long)].collect().toMap
    val b = GraphOps.pagerankFixedPoint(
      nodes.repartition(7), edges.repartition(5), "id", "src", "dst",
      iterations = 4, scale = 1000000L).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("invalid parameters rejected") {
    intercept[IllegalArgumentException] {
      GraphOps.pagerankFixedPoint(nodes, edges, "id", "src", "dst",
        iterations = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pagerankFixedPoint(nodes, edges, "id", "src", "dst",
        dampingNum = 100L, dampingDen = 100L)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pagerankFixedPoint(nodes, edges, "id", "src", "dst",
        scale = 10L)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pagerankFixedPoint(nodes, edges, "id", "src", "dst",
        checkpointEvery = 0)
    }
  }

  test("K=20 with checkpoint barriers ≡ K=20 unrolled, bit-exact") {
    // a denser 12-node graph so 20 rounds keep moving mass around
    val n12 = (1L to 12L).toDF("id")
    val e12 = (1L to 12L).flatMap(i =>
      Seq((i, i % 12 + 1), (i, (i * 5) % 12 + 1), (i, (i * 7) % 12 + 1)))
      .toDF("src", "dst")
    // checkpointEvery > iterations → zero barriers = the unrolled form
    val unrolled = GraphOps.pagerankFixedPoint(n12, e12, "id", "src", "dst",
      iterations = 20, scale = 1000000000L, checkpointEvery = 100)
      .as[(Long, Long)].collect().toMap
    for (every <- Seq(1, 3, 5)) {
      val cut = GraphOps.pagerankFixedPoint(n12, e12, "id", "src", "dst",
        iterations = 20, scale = 1000000000L, checkpointEvery = every)
        .as[(Long, Long)].collect().toMap
      assert(cut == unrolled, s"checkpointEvery=$every diverged")
    }
    // reliable-checkpoint mode through the same seam
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pr_ckpt").toString
    val reliable = GraphOps.pagerankFixedPoint(n12, e12, "id", "src", "dst",
      iterations = 20, scale = 1000000000L, checkpointEvery = 4,
      checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == unrolled)
  }

  test("hits: hand-computed integer rounds incl. truncation") {
    // edges 1→2, 1→3, 2→3, 3→1; node 4 isolated. scale 1e6.
    // round 1: a_raw (1:1e6, 2:1e6, 3:2e6), max 2e6 →
    //   a = (500000, 500000, 1000000, 0)
    //   h_raw (1: a2+a3 = 1.5e6, 2: 1e6, 3: 5e5), max 1.5e6 →
    //   h = (1000000, 666666, 333333, 0)   (truncated thirds)
    val r1 = GraphOps.hits(nodes, edges, "id", "src", "dst",
        iterations = 1, scale = 1000000L)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r1 == Map(1L -> ((500000L, 1000000L)), 2L -> ((500000L, 666666L)),
      3L -> ((1000000L, 333333L)), 4L -> ((0L, 0L))))
    // round 2: a_raw (1:333333, 2:1e6, 3:1666666), max 1666666 →
    //   a = (199999, 600000, 1000000, 0)
    //   h_raw (1:1.6e6, 2:1e6, 3:199999), max 1.6e6 →
    //   h = (1000000, 625000, 124999, 0)
    val r2 = GraphOps.hits(nodes, edges, "id", "src", "dst",
        iterations = 2, scale = 1000000L)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r2 == Map(1L -> ((199999L, 1000000L)), 2L -> ((600000L, 625000L)),
      3L -> ((1000000L, 124999L)), 4L -> ((0L, 0L))))
  }

  test("hits: out-star separates pure hub from pure authorities") {
    val n = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val out = GraphOps.hits(n, e, "id", "src", "dst",
        iterations = 3, scale = 1000000L)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // center: all hub, no authority; leaves: all authority, no hub —
    // the link-farm signature the two-score decomposition exists for
    assert(out(1L) == ((0L, 1000000L)))
    for (leaf <- Seq(2L, 3L, 4L)) assert(out(leaf) == ((1000000L, 0L)))
  }

  test("hits: max authority and max hub are exactly scale; dupes/loops ignored") {
    val clean = GraphOps.hits(nodes, edges, "id", "src", "dst",
      iterations = 3, scale = 1000000L)
      .as[(Long, Long, Long)].collect()
    assert(clean.map(_._2).max == 1000000L)
    assert(clean.map(_._3).max == 1000000L)
    val noisy = edges
      .unionByName(Seq((1L, 2L), (1L, 2L), (3L, 3L)).toDF("src", "dst"))
    val got = GraphOps.hits(nodes, noisy, "id", "src", "dst",
      iterations = 3, scale = 1000000L)
      .as[(Long, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == clean.sortBy(_._1).toSeq)
  }

  test("hits: reliable-checkpoint run is bit-identical; args validated") {
    val n12 = (1L to 12L).toDF("id")
    val e12 = (1L to 12L).flatMap(i =>
      Seq((i, i % 12 + 1), (i, (i * 5) % 12 + 1), (i, (i * 7) % 12 + 1)))
      .toDF("src", "dst")
    val local = GraphOps.hits(n12, e12, "id", "src", "dst",
      iterations = 8, scale = 1000000000L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // reliable-checkpoint mode through the same materialize seam
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hits_ckpt").toString
    val reliable = GraphOps.hits(n12, e12, "id", "src", "dst",
      iterations = 8, scale = 1000000000L, checkpointDir = Some(dir))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(reliable == local)
    intercept[IllegalArgumentException] {
      GraphOps.hits(nodes, edges, "id", "src", "dst", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.hits(nodes, edges, "id", "src", "dst", scale = 10L)
    }
  }

  test("linkPrediction: 4-cycle hand-check — counts, Jaccard, Adamic-Adar") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    // cycle 1-2-3-4-1: the only unlinked pairs are the two diagonals,
    // each with BOTH opposite corners as common neighbors (cn = 2);
    // all degrees 2 → jaccard = 2/(2+2−2) = 1, AA = 2·q9(1/ln 2)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val out = GraphOps.linkPrediction(e, "src", "dst", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((1L, 3L), (2L, 4L)))
    val aa = new JBD(1.0 / math.log(2))
      .setScale(9, RoundingMode.HALF_UP)
    out.foreach { case (_, _, cn, da, db, j, a) =>
      assert(cn == 2L && da == 2L && db == 2L)
      assert(j == 1.0)
      assert(a == aa.add(aa).doubleValue(), a)
    }
  }

  test("linkPrediction: hub centers are degree-gated out of candidates") {
    // star: hub 9 → 1..5, plus edge (1,2). Default gate: 9 candidate
    // pairs, all through the hub. Gate at 3: the hub is no longer a
    // wedge center and every candidate vanishes (the remaining wedges
    // land on existing edges).
    val e = (1L to 5L).map(i => (9L, i)).toDF("src", "dst")
      .unionByName(Seq((1L, 2L)).toDF("src", "dst"))
    val open = GraphOps.linkPrediction(e, "src", "dst", k = 100)
      .collect()
    assert(open.length == 9, open.length)
    assert(open.forall(_.getLong(2) == 1L)) // every pair: cn = 1 via hub
    val gated = GraphOps.linkPrediction(e, "src", "dst", k = 100,
      maxCenterDegree = 3L).collect()
    assert(gated.isEmpty, gated.mkString(","))
    intercept[IllegalArgumentException] {
      GraphOps.linkPrediction(e, "src", "dst", k = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.linkPrediction(e, "src", "dst", k = 1, minCommon = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.linkPrediction(e, "src", "dst", k = 1, maxCenterDegree = 1L)
    }
  }

  test("triangleStats: hand-checked censuses (K4, K4+pendant, triangle-free)") {
    def stats(edges: Seq[(Long, Long)]) =
      GraphOps.triangleStats(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long, Long, Long, Double)].head()
    // K4: 4 nodes, 6 edges, every node deg 3 ⇒ wedges 4·3 = 12,
    // triangles C(4,3) = 4, clustering 3·4/12 = 1.0
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(stats(k4) == ((4L, 6L, 12L, 4L, 1.0)))
    // direction + duplicates + self-loops must not change the census
    val messy = k4 ++ k4.map(_.swap) ++ Seq((2L, 2L), (1L, 2L))
    assert(stats(messy) == ((4L, 6L, 12L, 4L, 1.0)))
    // pendant node off K4: deg(5)=1, deg(4)=4 ⇒ wedges 3+3+3+6+0 = 15,
    // triangles still 4, clustering 12/15 = 0.8
    assert(stats(k4 :+ ((4L, 5L))) == ((5L, 7L, 15L, 4L, 0.8)))
    // star (triangle-free): wedges present, zero triangles
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(stats(star) == ((5L, 4L, 6L, 0L, 0.0)))
  }

  test("triangleStats agrees with brute-force enumeration on random graphs") {
    val rng = new scala.util.Random(20260814L)
    (1 to 25).foreach { trial =>
      val n = 4 + rng.nextInt(8) // 4..11 nodes
      val p = 0.15 + rng.nextDouble() * 0.6
      val edges = for {
        a <- 1 to n; b <- 1 to n
        if a != b && rng.nextDouble() < p
      } yield (a.toLong, b.toLong) // directed, possibly both orders
      if (edges.nonEmpty) {
        val undirected = edges.map { case (a, b) =>
          (math.min(a, b), math.max(a, b))
        }.toSet
        val nodes = undirected.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
        val deg = nodes.map(v =>
          undirected.count(e => e._1 == v || e._2 == v).toLong)
        val expTri = (for {
          Seq(a, b, c) <- nodes.combinations(3)
          if undirected((a, b)) && undirected((b, c)) && undirected((a, c))
        } yield 1).size.toLong
        val expWedges = deg.map(d => d * (d - 1) / 2).sum
        val got = GraphOps.triangleStats(
          edges.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long, Long, Long, Double)].head()
        assert(got._1 == nodes.size && got._2 == undirected.size,
          s"trial $trial: node/edge census $got")
        assert(got._3 == expWedges && got._4 == expTri,
          s"trial $trial: wedges/triangles $got, expected ($expWedges, $expTri)")
      }
    }
  }

  test("degreeAssortativity: star = exactly -1, regular cycle = undefined") {
    // star 1-{2,3,4}: every symmetric edge pairs deg 3 with deg 1 →
    // perfect anti-correlation, r = -1.0 EXACTLY (integer sums)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "dst")
    val r = GraphOps.degreeAssortativity(star, "s", "dst")
      .as[(String, String, Long, Option[Double])].collect().head
    assert(r._3 == 6L && r._4 == Some(-1.0), s"$r")
    // 4-cycle: all degrees equal → zero variance → NULL r, not a crash
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "dst")
    val rc = GraphOps.degreeAssortativity(cyc, "s", "dst")
      .as[(String, String, Long, Option[Double])].collect().head
    assert(rc._3 == 8L && rc._4.isEmpty, s"$rc")
  }

  test("labelPropagation: one hand-checked round — majority label, min-label ties") {
    // path 1-2-3 plus pendant 4 on 2; round 1 (labels = ids):
    //   1: nbrs {2} → 2;  2: nbrs {1,3,4} all count 1 → min = 1
    //   3: nbrs {2} → 2;  4: nbrs {2} → 2
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("s", "dst")
    val out = GraphOps.labelPropagation(nodes, edges, "id", "s", "dst",
      iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("labelPropagation: two communities separate; isolated node keeps its label") {
    // two triangles {1,2,3} and {10,11,12} joined by the single bridge
    // 3-10, plus isolated node 99; after 3 rounds each triangle must
    // carry ONE internal label and 99 stays 99
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L).toDF("id")
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L)).toDF("s", "dst")
    val out = GraphOps.labelPropagation(nodes, edges, "id", "s", "dst",
      iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(out(99L) == 99L)
    val left = Set(1L, 2L, 3L).map(out)
    val right = Set(10L, 11L, 12L).map(out)
    assert(left.size == 1 && left.head <= 3L, s"left triangle: $out")
    assert(right.size == 1, s"right triangle: $out")
    assert(left != right, s"communities must not merge: $out")
  }

  test("labelPropagation: checkpointed run is bit-identical to unrolled") {
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L).map(i => (i, (i * 7 + 3) % 60))
      .toDF("s", "dst")
    def run(every: Int) = GraphOps.labelPropagation(
      nodes, edges, "id", "s", "dst", iterations = 6,
      checkpointEvery = every)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    assert(run(2) == run(100))
  }

  test("labelPropagation validates arguments") {
    val nodes = Seq(1L).toDF("id")
    val edges = Seq((1L, 1L)).toDF("s", "dst")
    intercept[IllegalArgumentException] {
      GraphOps.labelPropagation(nodes, edges, "id", "s", "dst", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.labelPropagation(nodes, edges, "id", "s", "dst",
        iterations = 1, checkpointEvery = 0)
    }
  }

  test("kcore: clique survives, ring and spokes peel away in cascades") {
    import spark.implicits._
    // 12-ring (degree 2) + 5-clique on nodes 100-104 + one spoke 0→100
    val ring = (0L until 12L).map(i => (i, (i + 1) % 12))
    val clique = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val spoke = Seq((0L, 100L))
    val edges = (ring ++ clique ++ spoke).toDF("src", "dst")
    val out = GraphOps.kcore(edges, "src", "dst", k = 3, rounds = 6)
      .as[(Long, Long)].collect().toMap
    // ring nodes have degree ≤ 3 only transiently (node 0 has 3 — ring
    // neighbors die round 1, then 0 follows); the 4-regular clique is
    // the unique 3-core
    assert(out.keySet == (100L to 104L).toSet, out)
    assert(out.values.forall(_ == 4L), out)
  }

  test("kcore: extra rounds after convergence are no-ops; k=1 keeps everything") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val a = GraphOps.kcore(edges, "src", "dst", k = 2, rounds = 2)
      .as[(Long, Long)].collect().toSet
    val b = GraphOps.kcore(edges, "src", "dst", k = 2, rounds = 8)
      .as[(Long, Long)].collect().toSet
    assert(a == b && a == Set((1L, 2L), (2L, 2L), (3L, 2L)), (a, b))
    val all = GraphOps.kcore(edges, "src", "dst", k = 1, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(all.keySet == Set(1L, 2L, 3L, 4L))
  }

  // --- modularity ------------------------------------------------------

  test("modularity: two triangles + a bridge, hand-computed Q") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("id", "lab")
    val out = GraphOps.modularity(labels, edges, "id", "lab", "src", "dst")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    // m = 7; each community: e = 3, d = 2+2+3 = 7
    val term = 3.0 / 7.0 - (7.0 / (2.0 * 7.0)) * (7.0 / (2.0 * 7.0))
    assert(out == Seq(
      (10L, 3L, 7L, 3L, term, (0.0 + term) + term),
      (20L, 3L, 7L, 3L, term, (0.0 + term) + term)))
  }

  test("modularity: one community → Q = 0; duplicate/reversed edges collapse") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 3L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "lab")
    val out = GraphOps.modularity(labels, edges, "id", "lab", "src", "dst")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    // self-loop dropped, (1,2)/(2,1) one edge: m = 2, e = 2, d = 4
    assert(out == Seq((1L, 3L, 4L, 2L, 0.0, 0.0)))
  }

  test("modularity: an isolated-node community keeps its row with zeros") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (9L, 9L)).toDF("id", "lab")
    val out = GraphOps.modularity(labels, edges, "id", "lab", "src", "dst")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(9L)._3 == 0L && out(9L)._4 == 0L && out(9L)._5 == 0.0)
    assert(out(1L)._5 == 1.0 - 1.0) // e/m − (d/2m)² = 1 − 1 = 0
  }
}
