package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Link-graph analytics (north-star extension): PageRank over a crawl's
  * URL/link graph — the standard importance prior a web-corpus pipeline
  * mixes into quality-weighted sampling (alongside [[TextOps]] quality
  * scores) and the natural companion to [[DedupOps.connectedComponents]]
  * (the other iterative-propagation operator in the suite).
  *
  * FIXED-POINT INTEGER arithmetic throughout: ranks are scaled longs
  * (`scale` = 10¹²), every step is integer multiply / integer `div` /
  * integer sum — deterministic truncation, no doubles, no decimal
  * division (whose result-scale rules differ across engines). Two
  * engines computing the same iterations therefore agree BIT-EXACTLY,
  * which makes the whole iterative computation oracle-verifiable —
  * the discipline that cannot be had with floating-point PageRank,
  * where K rounds of rounding diverge in the last ulps.
  *
  * Semantics (simplified standard variant, documented deviations):
  *  - damping d = dampingNum/dampingDen (default 85/100);
  *  - pr₀ = scale div N; prₜ₊₁(v) = (scale·(den−num) div den) div N
  *    + (num · Σ_{u→v} (prₜ(u) div outdeg(u))) div den;
  *  - DANGLING nodes (no outlinks) contribute nothing — their mass
  *    leaks, as does sub-ulp truncation mass. Total rank is therefore
  *    slightly below `scale`; rank ORDER — what a pipeline consumes —
  *    is unaffected. Redistribution would need a per-round global
  *    scalar; the leak is the cheaper, documented trade.
  *
  * Scale shape: each round is one equi-join of the edge list to the
  * current ranks plus one groupBy(dst) — the [[DedupOps]] CC cost
  * model; the edge list is deduplicated and self-loops dropped once up
  * front. Lineage: realistic link-graph runs use K = 20–50 rounds, and
  * a fully unrolled plan doubles in depth every round until analysis
  * time dominates — so every `checkpointEvery` rounds (default 5) the
  * rank frame is materialized through the same seam the CC variants
  * use: eager `localCheckpoint` single-node / on stable clusters, or
  * RELIABLE `checkpoint` on shared storage when `checkpointDir` is
  * given (the preemptible-fleet mode — executor loss then costs at
  * most one segment's recompute, never the job). Superseded
  * generations' blocks are released deterministically, so rounds don't
  * stack state in executor storage. The edge list and out-degrees are
  * materialized ONCE up front for the same reason: every round re-reads
  * them, and without the barrier each generation would re-shuffle the
  * raw edges.
  */
object GraphOps {

  /** Ranks after `iterations` rounds: (idCol, pr) with pr a scaled
    * long (`scale` ≈ total mass). Edge list may contain duplicates and
    * self-loops; both are removed. Nodes absent from `nodes` but
    * present as edge endpoints do NOT receive rank rows — declare the
    * node universe explicitly (the connectedComponents contract,
    * inverted: here the declared set is authoritative).
    *
    * `checkpointEvery` = rounds per lineage-truncation barrier (the
    * plan depth between barriers); `checkpointDir` switches the
    * barriers from executor-local blocks to reliable shared-storage
    * checkpoints. Checkpointing changes WHERE the plan is cut, not
    * what is computed: results are bit-identical for any
    * `checkpointEvery` (property-tested K=20 checkpointed ≡ unrolled). */
  def pagerankFixedPoint(
      nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      iterations: Int = 5,
      dampingNum: Long = 85L, dampingDen: Long = 100L,
      scale: Long = 1000000000000L,
      checkpointEvery: Int = 5,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingNum > 0 && dampingDen > dampingNum,
      s"damping must satisfy 0 < num < den, got $dampingNum/$dampingDen")
    require(scale >= 1000000L, s"scale too small for meaningful ranks: $scale")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    DedupOps.setupCheckpointDir(nodes, checkpointDir)
    val ids = nodes.select(col(idCol).cast(LongType).as("id"))
    // edge list + out-degrees: computed once, read every round — the
    // barrier stops each generation from re-shuffling the raw edges
    val e = DedupOps.materialize(edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct(), checkpointDir)
    val outdeg = DedupOps.materialize(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg")), checkpointDir)
    // N rides along as a 1-row broadcast scalar (no driver-side count)
    val n = ids.agg(count(lit(1)).as("n"))
    val base = ids.crossJoin(broadcast(n))
      .select(col("id"), col("n"),
        // teleport mass per node: (scale·(den−num) div den) div N
        // the L suffix pins the literal to BIGINT: a scale that fits
        // in INT (tests use 1e9) would otherwise overflow the multiply
        expr(s"((${scale}L * ${dampingDen - dampingNum}L) div ${dampingDen}L) div n")
          .as("base_pr"))
    var pr = base.select(col("id"), col("base_pr"),
      expr(s"${scale}L div n").as("pr"))
    // previous barrier's frame, so its blocks can be freed when the
    // next barrier lands (base/pr share lineage until the first cut)
    var lastBarrier: Option[DataFrame] = None
    for (round <- 1 to iterations) {
      val contribs = e
        .join(pr.select(col("id"), col("pr")), e("src") === col("id"))
        .join(outdeg, Seq("src"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      pr = base
        .join(contribs, base("id") === contribs("dst"), "left")
        .select(base("id"), col("base_pr"),
          (col("base_pr") +
            expr(s"(${dampingNum}L * coalesce(in_sum, 0L)) div ${dampingDen}L"))
            .as("pr"))
      if (round % checkpointEvery == 0 && round < iterations) {
        val cut = DedupOps.materialize(pr, checkpointDir)
        lastBarrier.foreach(DedupOps.releaseCheckpoint)
        lastBarrier = Some(cut)
        pr = cut
      }
    }
    // NOTE the final frame is returned UN-materialized past the last
    // barrier (≤ checkpointEvery rounds of lineage): the caller decides
    // whether to persist/write it; lastBarrier's blocks back that tail
    // and are released by the session, not here.
    pr.select(col("id").as(idCol), col("pr"))
  }

  /** HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) — the
    * directed-graph companion to [[pagerankFixedPoint]]: authority(v)
    * accumulates the hub mass of pages LINKING TO v, hub(u)
    * accumulates the authority mass of pages u LINKS TO, alternating
    * until the two vectors stabilize. A crawl pipeline reads them
    * separately: high-authority pages are content worth sampling,
    * high-hub/low-authority pages are link farms and directories —
    * structure PageRank's single score conflates.
    *
    * FIXED-POINT INTEGER arithmetic (the [[pagerankFixedPoint]]
    * discipline) with ONE documented deviation from the textbook: each
    * half-round normalizes by the VECTOR MAX rescaled to `scale` (L∞)
    * instead of the L2 norm — a square root has no exact integer form,
    * while x ↦ (x·scale) div max is deterministic truncating-integer
    * arithmetic, and HITS' fixed point is invariant under any positive
    * per-round rescaling (the power iteration converges to the same
    * ray; only the reported magnitude convention differs). Every
    * number both engines compute is therefore BIT-EXACT and the whole
    * K-round computation oracle-verifiable as K unrolled SQL rounds.
    *
    * Overflow bound: a raw half-round value is ≤ indeg_max · scale,
    * summed in DECIMAL(38,0) and multiplied by `scale` before the div,
    * so exactness requires indeg_max · scale² < 10³⁸ — at the default
    * scale 10¹², in-degrees to 10¹⁴ (any real graph). Zero in-link
    * nodes hold authority 0, zero out-link nodes hub 0; the edge set
    * must be non-empty (an edgeless graph has NULL maxima and yields
    * NULL scores — the caller's degenerate case, documented not
    * guarded, matching the pagerank dangling-mass trade).
    *
    * Scale shape: each half-round is one equi-join of the deduplicated
    * edge list to the current vector, one groupBy, and a 1-row max
    * broadcast (never a driver collect). The raw half-round frame is
    * MATERIALIZED through the [[DedupOps.materialize]] seam every
    * half-round, not every K rounds: the L∞ rescale reads it twice
    * (the sum side and the max side), so leaving it lazy would DOUBLE
    * the logical plan per half-round — exponential analysis cost by
    * K=8 — while the cut keeps the plan linear and computes the
    * join+groupBy once instead of twice. Superseded generations'
    * blocks release on a two-slot delay (a raw frame is read only by
    * the next half-round's materialization). `checkpointDir` switches
    * the cuts to reliable shared-storage checkpoints (the pagerank
    * preemptible-fleet mode). Output: (idCol, authority, hub) scaled
    * longs — the max authority and max hub are exactly `scale` by
    * construction. */
  def hits(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      iterations: Int = 4,
      scale: Long = 1000000000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 1000000L, s"scale too small for meaningful ranks: $scale")
    DedupOps.setupCheckpointDir(nodes, checkpointDir)
    val ids = nodes.select(col(idCol).cast(LongType).as("id"))
    val e = DedupOps.materialize(edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct(), checkpointDir)
    def dec19(c: org.apache.spark.sql.Column) =
      c.cast(DecimalType(19, 0))
    // two-slot release queue: raw_k is read only while materializing
    // raw_{k+1}; the final two stay live backing the returned frames
    var prevPrev: Option[DataFrame] = None
    var prev: Option[DataFrame] = None
    // one half-round: raw = Σ over the joined side (materialized — see
    // scaladoc), then L∞ rescale: (DECIMAL(38,0) raw · scale) div max,
    // exact multiply then truncating division
    def halfRound(vec: DataFrame, vecCol: String, joinKey: String,
        groupKey: String, outCol: String): DataFrame = {
      val raw = DedupOps.materialize(e
        .join(vec.select(col("id"), col(vecCol)), e(joinKey) === col("id"))
        .groupBy(col(groupKey).as("_gid"))
        .agg(sum(dec19(col(vecCol))).cast(DecimalType(38, 0)).as("_raw")),
        checkpointDir)
      prevPrev.foreach(DedupOps.releaseCheckpoint)
      prevPrev = prev
      prev = Some(raw)
      val mx = raw.agg(max(col("_raw")).as("_m"))
      ids.join(raw, ids("id") === col("_gid"), "left")
        .crossJoin(broadcast(mx))
        .select(ids("id"),
          expr(s"(CAST(coalesce(_raw, CAST(0 AS DECIMAL(38,0))) AS DECIMAL(38,0))" +
            s" * ${scale}L) div _m").as(outCol))
    }
    // h₀ = scale everywhere (the uniform start); a₀ is never read —
    // round 1's first half-round derives a₁ from h₀
    var hub = ids.select(col("id"), lit(scale).as("h"))
    var auth = hub.select(col("id"), lit(0L).as("a"))
    for (_ <- 1 to iterations) {
      auth = halfRound(hub, "h", "src", "dst", "a")
      hub = halfRound(auth, "a", "dst", "src", "h")
    }
    auth.join(hub, Seq("id"))
      .select(col("id").as(idCol), col("a").as("authority"),
        col("h").as("hub"))
  }

  /** Neighborhood link prediction (Liben-Nowell & Kleinberg 2003) —
    * the "which edges are missing?" scorer behind related-page
    * discovery and crawl frontier ranking: for every UNLINKED pair
    * with ≥ `minCommon` shared neighbors, the three classic scores —
    * common-neighbor count |Γa∩Γb|, Jaccard |Γa∩Γb|/|Γa∪Γb|, and
    * Adamic-Adar Σ_{z∈Γa∩Γb} 1/ln(deg z) (rare shared neighbors count
    * more than hubs). Global top-`k` by (common DESC, Adamic-Adar
    * DESC, pair) — the exact-decimal AA is the tiebreak so the
    * ordering never reads a double.
    *
    * Determinism: counts and degrees are exact longs; Jaccard is ONE
    * IEEE division of exact integers (|∪| = da+db−|∩|); Adamic-Adar's
    * transcendental quantizes ONCE per NODE (1/ln(deg) as
    * DECIMAL(20,9) on the degree grain — every common neighbor has
    * deg ≥ 2, so ln > 0) and the per-pair score is an exact decimal
    * SUM of those staged values, presented as DOUBLE.
    *
    * Scale shape: the wedge self-join is the cost — Σ_z deg(z)², the
    * [[triangleStats]] bound — so wedge CENTERS are gated to
    * 2 ≤ deg ≤ `maxCenterDegree` (the LSH pair-budget idea: a
    * million-degree hub would mint 10¹² candidate pairs while
    * contributing 1/ln(10⁶) ≈ 0.07 to any of them; excluded centers
    * drop from the common-neighbor COUNT too, keeping cn ≡ |∩| over
    * the declared center set — documented, unit-pinned). Candidates
    * anti-join the symmetrized edge list; the global top-k is
    * TakeOrderedAndProject. */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, minCommon: Int = 1,
      maxCenterDegree: Long = 10000L): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2, got $maxCenterDegree")
    val e0 = edges
      .select(col(srcCol).cast(LongType).as("_s"),
        col(dstCol).cast(LongType).as("_d"))
      .filter(col("_s").isNotNull && col("_d").isNotNull &&
        col("_s") =!= col("_d"))
    val adj = e0.select(col("_s").as("u"), col("_d").as("v"))
      .union(e0.select(col("_d").as("u"), col("_s").as("v")))
      .distinct()
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // wedge centers: degree-gated, with 1/ln(deg) quantized ONCE here
    val centers = deg
      .filter(col("d") >= 2 && col("d") <= maxCenterDegree)
      .select(col("u").as("z"),
        (lit(1.0) / log(col("d"))).cast(DecimalType(20, 9)).as("_il"))
    val l = adj.select(col("u").as("z"), col("v").as("x"))
    val r = adj.select(col("u").as("z"), col("v").as("y"))
    val scored = l.join(r, Seq("z")).filter(col("x") < col("y"))
      .join(centers, Seq("z"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_common"), sum(col("_il")).as("_aa"))
      .filter(col("n_common") >= minCommon)
    val cand = scored.join(
      adj.select(col("u").as("x"), col("v").as("y")),
      Seq("x", "y"), "left_anti")
    cand
      .join(deg.select(col("u").as("x"), col("d").as("deg_a")), Seq("x"))
      .join(deg.select(col("u").as("y"), col("d").as("deg_b")), Seq("y"))
      .orderBy(col("n_common").desc, col("_aa").desc, col("x"), col("y"))
      .limit(k)
      .select(col("x").as("node_a"), col("y").as("node_b"),
        col("n_common"), col("deg_a"), col("deg_b"),
        (col("n_common").cast(DoubleType) /
          (col("deg_a") + col("deg_b") - col("n_common")).cast(DoubleType))
          .as("jaccard"),
        col("_aa").cast(DoubleType).as("adamic_adar"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection over the undirected graph: every node starts labeled
    * with its own id, and each round adopts the MOST FREQUENT label
    * among its neighbors, ties broken by the smallest label. Unlike
    * [[DedupOps.connectedComponents]] (which converges to one label
    * per component), a fixed small round count yields sub-component
    * communities — the mirror-cluster / topic-cluster grain a crawl
    * pipeline samples across. Deterministic by construction: integer
    * counts, total (count DESC, label ASC) tie order, synchronized
    * rounds — so K rounds are bit-reproducible and oracle-verifiable
    * as K unrolled SQL statements.
    *
    * Scale shape: each round is one equi-join of the symmetrized edge
    * list to the current label frame plus two aggregates — (node,
    * label) count, then the per-node argmax via ONE `max(struct(cnt,
    * −label))` aggregate (no window, no extra sort) — and a left join
    * back to the node universe so isolated nodes keep their label.
    * Lineage is cut through the same materialize seam as
    * [[pagerankFixedPoint]] every `checkpointEvery` rounds. */
  def labelPropagation(
      nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      iterations: Int = 3,
      checkpointEvery: Int = 5,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    DedupOps.setupCheckpointDir(nodes, checkpointDir)
    val ids = nodes.select(col(idCol).cast(LongType).as("id"))
    val directed = edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    val sym = DedupOps.materialize(
      directed.union(directed.select(col("dst").as("src"),
        col("src").as("dst"))).distinct(),
      checkpointDir)
    var labels = ids.select(col("id"), col("id").as("lab"))
    var lastBarrier: Option[DataFrame] = None
    for (round <- 1 to iterations) {
      val counts = sym
        .join(labels.select(col("id"), col("lab")), sym("src") === col("id"))
        .groupBy(sym("dst").as("nid"), col("lab"))
        .agg(count(lit(1)).as("c"))
      // argmax by (count DESC, label ASC) as one aggregate: labels are
      // non-negative longs, so max(struct(c, -lab)) picks the highest
      // count and, within it, the smallest label
      val winner = counts
        .groupBy(col("nid"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("_m"))
        .select(col("nid"), (-col("_m.nl")).as("_new"))
      labels = ids
        .join(winner, ids("id") === winner("nid"), "left")
        .select(ids("id"), coalesce(col("_new"), ids("id")).as("lab"))
      if (round % checkpointEvery == 0 && round < iterations) {
        val cut = DedupOps.materialize(labels, checkpointDir)
        lastBarrier.foreach(DedupOps.releaseCheckpoint)
        lastBarrier = Some(cut)
        labels = cut
      }
    }
    labels.select(col("id").as(idCol), col("lab").as("label"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over every directed edge of the symmetrized
    * graph (each undirected edge counted once per direction — the
    * standard symmetric estimator). Positive r = hubs link to hubs
    * (social-network-like); strongly negative r on a crawl graph is
    * the hub-and-spoke signature of link farms and template
    * navigation — the structural companion to [[triangleStats]]'
    * clustering gate.
    *
    * Cost: one degree aggregate plus TWO equi-joins of the slim
    * (src, dst) edge list to the (node, degree) frame, then
    * [[ProfileOps.corrMatrix]]'s single exact-decimal aggregate — the
    * same bit-portable Pearson machinery profile_corr ships, so the
    * whole statistic is oracle-verifiable. Output: one row
    * (col_a, col_b, n, pearson_r) with n = directed edge count. */
  def degreeAssortativity(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val directed = edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    // materialized: the degree aggregate and BOTH endpoint joins read
    // sym — without the barrier the dedup shuffle re-runs three times
    val sym = DedupOps.materialize(directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct(), None)
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val prs = sym
      .join(deg.select(col("id"), col("d").as("da")), sym("src") === col("id"))
      .drop("id")
      .join(deg.select(col("id"), col("d").as("db")), sym("dst") === col("id"))
      .select(col("da"), col("db"))
    ProfileOps.corrMatrix(prs, Seq("da", "db"))
  }

  /** Global triangle census of an undirected graph — node count, edge
    * count, wedge count (paths of length 2, the triangle DENOMINATOR),
    * triangle count and the global clustering coefficient 3T/W. The
    * link-graph structure gate: near-zero clustering on a crawl graph
    * means link spam / generated link farms; a sudden jump means a
    * mirror cluster got ingested.
    *
    * Node-iterator shape (Schank & Wagner): edges canonicalize to
    * a < b, wedges come from ONE self-equi-join on the shared endpoint
    * (a < b < c by construction, so each triangle closes exactly once)
    * and close against the edge set with a second equi-join — two
    * shuffles on edge keys, no enumeration of neighbor pairs in
    * memory. Wedge totals derive from per-node degrees (one slim
    * aggregate), never from materializing wedges. Skewed hubs cost
    * deg² wedge-join rows — the standard mitigation at web scale is a
    * degree-ordered orientation (join on the LOWER-degree endpoint);
    * here the canonical a < b orientation already halves the work and
    * the fixture's degrees are bounded.
    *
    * Everything is exact integers except the final coefficient — one
    * IEEE division ⇒ fully oracle-comparable. */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Σ d(d−1) is even by construction; the halving happens once on the
    // exact long total via INTEGER `div` — `/` on longs is double
    // division in Spark and silently loses precision past 2^53, which
    // a hub-heavy web graph's wedge total can exceed (round-10 review)
    // coalesce: an empty/self-loop-only edge set must census as 0s,
    // not a NULL wedge count beside zero-valued siblings
    val degStats = deg
      .select((col("d") * (col("d") - 1)).as("dd"))
      .agg(count(lit(1)).as("n_nodes"),
        coalesce(expr("sum(dd) div 2"), lit(0L)).as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val wedges = e.as("x").join(e.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("wa"), col("x.b").as("wb"), col("y.b").as("wc"))
    val triangles = wedges
      .join(e.select(col("a").as("ca"), col("b").as("cb")),
        col("wa") === col("ca") && col("wc") === col("cb"))
      .agg(count(lit(1)).as("n_triangles"))
    degStats.crossJoin(broadcast(nEdges)).crossJoin(broadcast(triangles))
      .withColumn("clustering",
        when(col("n_wedges") > 0,
          lit(3.0) * col("n_triangles") / col("n_wedges"))
          .otherwise(lit(0.0)))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), col("clustering"))
  }

  /** k-core peeling: iteratively remove nodes of degree < k (and their
    * incident edges) for a FIXED number of rounds — the standard
    * community-density filter (a k-core survivor has ≥ k neighbors
    * that themselves survive). Fixed unrolled rounds instead of a
    * convergence test keep the operator a pure function of its inputs:
    * both engines run the SAME rounds, so the key hash-compares even
    * on a graph that hasn't converged (on a converged graph extra
    * rounds are no-ops). Peeling cascades at most the graph's
    * degeneracy depth; callers size `rounds` to their diameter class.
    *
    * Output: (node, core_degree) of the final surviving edge set.
    *
    * Scale shape: each round is ONE degree aggregation + two semi-joins
    * on the edge list, all equi-shuffles on node keys; a
    * localCheckpoint per round is the CC checkpoint seam — it caps the
    * unrolled plan's depth so round r re-plans from materialized round
    * r−1, not from the raw edges (at cluster scale swap for reliable
    * checkpoints, same seam). */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int, nodeOut: String = "node"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1,64], got $rounds")
    val fwd = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val und = fwd.unionByName(fwd.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    var alive = und
    (1 to rounds).foreach { _ =>
      val keep = alive.groupBy(col("u")).agg(count(lit(1)).as("_d"))
        .filter(col("_d") >= k).select(col("u"))
      // the seam must be PER ROUND, not wider: `alive` is consumed
      // three times per round (degree aggregation + both semi-join
      // probes), so an unmaterialized round re-executes its
      // predecessor multiply — measured 2.0 s (per-round seam) vs
      // 6.9 s (2-round window) on the fixture graph, the BASELINE §24
      // consume-once lesson in iterative form
      alive = alive
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .localCheckpoint()
    }
    alive.groupBy(col("u").as(nodeOut))
      .agg(count(lit(1)).as("core_degree"))
  }

  /** Newman modularity Q of a node labeling over an undirected simple
    * graph — the quality score for [[labelPropagation]]'s communities
    * (Q ≈ 0: no better than random; Q ≳ 0.3: real structure), the
    * number a clustering dashboard thresholds before trusting the
    * labels downstream.
    *
    * Q = Σ_c [ e_c/m − (d_c/2m)² ]: e_c = intra-community edge count,
    * d_c = community degree sum, m = edges — after canonicalizing the
    * input to DISTINCT undirected (least,greatest) pairs with
    * self-loops dropped (the triangle-census orientation). All three
    * count grains are exact longs from plain aggregations; each
    * community's q_term is a fixed IEEE chain, and the global `q`
    * rides every row via the SORTED bounded fold (the cramers_v
    * discipline — a row-set SUM over doubles would leave accumulation
    * order to the engine). Isolated-node communities get e_c = 0 via
    * the left join, never a dropped row.
    *
    * Scale: one distinct over edges, one degree aggregation, one
    * label join per endpoint (labels at node grain), then everything
    * lives at the community grain. */
  def modularity(labels: DataFrame, edges: DataFrame,
      idCol: String, labelCol: String,
      srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("_a"),
        greatest(col(srcCol), col(dstCol)).as("_b"))
      .distinct()
      .localCheckpoint() // three consumers (m, degrees, intra-edges):
      // without this the edge-build subtree re-executes per consumer
    val m = und.agg(count(lit(1)).as("_m"))
    val deg = und.select(col("_a").as("_id"))
      .unionByName(und.select(col("_b").as("_id")))
      .groupBy(col("_id")).agg(count(lit(1)).as("_deg"))
    val lab = labels.select(col(idCol).as("_id"), col(labelCol).as("label"))
    val dc = lab.join(deg, Seq("_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("_deg"), lit(0L))).as("d_c"))
    val ec = und
      .join(lab.select(col("_id").as("_a"), col("label").as("_la")), Seq("_a"))
      .join(lab.select(col("_id").as("_b"), col("label").as("_lb")), Seq("_b"))
      .filter(col("_la") === col("_lb"))
      .groupBy(col("_la").as("label")).agg(count(lit(1)).as("e_c"))
    val mD = col("_m").cast(DoubleType)
    val half = col("d_c").cast(DoubleType) / (lit(2.0) * mD)
    val terms = dc.join(ec, Seq("label"), "left").crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"), col("d_c"),
        coalesce(col("e_c"), lit(0L)).as("e_c"),
        (coalesce(col("e_c"), lit(0L)).cast(DoubleType) / mD -
          half * half).as("q_term"))
    val q = terms.agg(
      aggregate(
        sort_array(collect_list(struct(col("label"), col("q_term")))),
        lit(0.0), (acc, e) => acc + e("q_term")).as("q"))
    terms.crossJoin(broadcast(q)).orderBy(col("label"))
  }
}
