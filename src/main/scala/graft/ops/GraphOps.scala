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
  * front. Iterations is a small fixed constant (the operator unrolls
  * the loop into one plan): for K beyond ~10 pass `checkpointDir`-style
  * materialization upstream the way connectedComponents does — at the
  * default K the plan stays comfortably analyzable.
  */
object GraphOps {

  /** Ranks after `iterations` rounds: (idCol, pr) with pr a scaled
    * long (`scale` ≈ total mass). Edge list may contain duplicates and
    * self-loops; both are removed. Nodes absent from `nodes` but
    * present as edge endpoints do NOT receive rank rows — declare the
    * node universe explicitly (the connectedComponents contract,
    * inverted: here the declared set is authoritative). */
  def pagerankFixedPoint(
      nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      iterations: Int = 5,
      dampingNum: Long = 85L, dampingDen: Long = 100L,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingNum > 0 && dampingDen > dampingNum,
      s"damping must satisfy 0 < num < den, got $dampingNum/$dampingDen")
    require(scale >= 1000000L, s"scale too small for meaningful ranks: $scale")
    val ids = nodes.select(col(idCol).cast(LongType).as("id"))
    val e = edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // N rides along as a 1-row broadcast scalar (no driver-side count)
    val n = ids.agg(count(lit(1)).as("n"))
    val base = ids.crossJoin(broadcast(n))
      .select(col("id"), col("n"),
        // teleport mass per node: (scale·(den−num) div den) div N
        expr(s"(($scale * ${dampingDen - dampingNum}) div $dampingDen) div n")
          .as("base_pr"))
    var pr = base.select(col("id"), col("base_pr"),
      expr(s"$scale div n").as("pr"))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(pr.select(col("id"), col("pr")), e("src") === col("id"))
        .join(outdeg, Seq("src"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      pr = base
        .join(contribs, base("id") === contribs("dst"), "left")
        .select(base("id"), col("base_pr"),
          (col("base_pr") +
            expr(s"($dampingNum * coalesce(in_sum, 0)) div $dampingDen"))
            .as("pr"))
    }
    pr.select(col("id").as(idCol), col("pr"))
  }
}
