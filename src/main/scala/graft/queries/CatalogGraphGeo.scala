package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** GraphGeo family of the operator catalog (18 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogGraphGeo {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


    // PageRank over a deterministic link graph (GraphOps) — the
    // importance prior a web-corpus pipeline mixes into quality
    // weighting, and the second iterative-propagation operator next to
    // the CC pair above. FIXED-POINT INTEGER arithmetic end to end
    // (scaled-long ranks, integer div, no doubles, no decimal
    // division), so five full iterations are BIT-EXACT cross-engine —
    // DuckDB replays them as five unrolled join+aggregate CTEs over
    // the same edge formula. Three outlinks per doc via affine maps
    // mod 500; generator collisions dedupe on both sides.
    "graph_pagerank" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val ids = docs.select(col("doc_id"))
        val edges = ids.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 3) % 500,
            (col("doc_id") * 13 + 5) % 500,
            (col("doc_id") * 29 + 11) % 500)).as("dst"))
        GraphOps.pagerankFixedPoint(
          ids, edges, "doc_id", "src", "dst", iterations = 5)
          .orderBy(col("doc_id"))
      },
      Some(pagerankOracle("WHERE doc_id < 500", "500")),
      allowBnlj = true),


    // Degree assortativity (GraphOps.degreeAssortativity, Newman 2002):
    // Pearson of endpoint degrees over the symmetrized edge list —
    // hub-and-spoke (strongly negative r) is the link-farm/template
    // signature, the structural companion to the triangle census.
    // Rides profile_corr's exact-decimal Pearson machinery ⇒ oracled.
    "graph_assortativity" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val ids = docs.select(col("doc_id"))
        val edges = ids.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 3) % 500,
            (col("doc_id") * 13 + 5) % 500,
            (col("doc_id") * 29 + 11) % 500)).as("dst"))
        GraphOps.degreeAssortativity(edges, "src", "dst")
          .orderBy(col("col_a"))
      },
      Some(assortativityOracle("WHERE doc_id < 500", "500"))),


    // Synchronous label propagation (GraphOps.labelPropagation,
    // Raghavan et al.): 3 rounds of majority-neighbor-label over the
    // same synthetic link graph as graph_pagerank — the sub-component
    // community grain (mirror clusters, topic clusters) that CC's
    // full-component labels are too coarse for. Integer counts +
    // total (count DESC, label ASC) tie order + synchronized rounds ⇒
    // every round is bit-portable and the whole computation is oracled
    // as 3 unrolled SQL rounds. Per round: one edge-to-labels equi-join
    // and two aggregates (the per-node argmax is ONE
    // max(struct(cnt, −label)) — no window, no sort); lineage cut
    // through the pagerank checkpoint seam.
    "graph_label_propagation" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val ids = docs.select(col("doc_id"))
        val edges = ids.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 3) % 500,
            (col("doc_id") * 13 + 5) % 500,
            (col("doc_id") * 29 + 11) % 500)).as("dst"))
        GraphOps.labelPropagation(
          ids, edges, "doc_id", "src", "dst", iterations = 3)
          .orderBy(col("doc_id"))
      },
      Some(lpaOracle("WHERE doc_id < 500", "500"))),


    // Power-law (Hill/MLE) exponent of the degree distribution —
    // the scale-free diagnostic a link-graph pipeline reads before
    // trusting degree-based sampling or PageRank priors: α = 1 +
    // n / Σ ln(dᵢ/d_min) (continuous MLE, Clauset et al. 2009's eq. 2;
    // the discrete −½ correction is documented out — this is the
    // standard quick-read form, and the CHAIN is the point). The sum
    // runs at the DEGREE GRAIN (distinct degrees, not nodes): each
    // ln(d) quantized ONCE to DECIMAL(20,9), multiplied by the exact
    // node count at that degree, summed as exact decimals; α is one
    // IEEE chain. d_min is the graph's own min degree; a regular graph
    // (S = 0) yields NULL α.
    "graph_powerlaw_alpha" -> QuerySpec(
      (s, d) => {
        val ids = t(s, d, "documents").filter(col("doc_id") < 500)
          .select(col("doc_id"))
        val edges = ids.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 3) % 500,
            (col("doc_id") * 13 + 5) % 500,
            (col("doc_id") * 29 + 11) % 500)).as("dst"))
        val und = edges.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("_a"),
            greatest(col("src"), col("dst")).as("_b"))
          .distinct()
        val deg = und.select(col("_a").as("_id"))
          .unionByName(und.select(col("_b").as("_id")))
          .groupBy(col("_id")).agg(count(lit(1)).as("_deg"))
        val grain = deg.groupBy(col("_deg")).agg(count(lit(1)).as("_cnt"))
        val dmin = grain.agg(min(col("_deg")).as("_dmin"))
        grain.crossJoin(broadcast(dmin))
          .agg(sum(col("_cnt")).as("n_nodes"),
            max(col("_dmin")).as("min_degree"),
            // cnt at DECIMAL(12,0): a (19,0)x(20,9) product needs
            // precision 40 and Spark would SHRINK the scale to fit 38
            // (measured: sum_ln truncated to 7 decimals); (12,0)x(20,9)
            // stays at (33,9) with the full quantization grid
            sum(col("_cnt").cast(DecimalType(12, 0)) *
              log(col("_deg").cast(DoubleType) /
                col("_dmin").cast(DoubleType)).cast(DecimalType(20, 9)))
              .as("_s"))
          .select(col("n_nodes"), col("min_degree"),
            col("_s").cast(DoubleType).as("sum_ln"),
            when(col("_s") > 0,
              lit(1.0) + col("n_nodes").cast(DoubleType) /
                col("_s").cast(DoubleType)).as("alpha"))
      },
      Some("""WITH nodes AS (
             |  SELECT doc_id AS id FROM documents WHERE doc_id < 500),
             |de AS (
             |  SELECT DISTINCT src, dst FROM (
             |    SELECT id AS src, (id * 7 + 3) % 500 AS dst FROM nodes
             |    UNION ALL SELECT id, (id * 13 + 5) % 500 FROM nodes
             |    UNION ALL SELECT id, (id * 29 + 11) % 500 FROM nodes)
             |  WHERE src <> dst),
             |und AS (
             |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
             |  FROM de),
             |deg AS (
             |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
             |    SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
             |  GROUP BY 1),
             |grain AS (SELECT deg, CAST(count(*) AS BIGINT) AS cnt
             |          FROM deg GROUP BY 1),
             |dm AS (SELECT min(deg) AS dmin FROM grain),
             |m AS (
             |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_nodes,
             |    CAST(max(dm.dmin) AS BIGINT) AS min_degree,
             |    SUM(CAST(cnt AS DECIMAL(12,0)) *
             |      CAST(CAST(ln(CAST(deg AS DOUBLE) / CAST(dm.dmin AS DOUBLE))
             |        AS VARCHAR) AS DECIMAL(20,9))) AS s
             |  FROM grain CROSS JOIN dm)
             |SELECT n_nodes, min_degree, CAST(s AS DOUBLE) AS sum_ln,
             |  CASE WHEN s > 0 THEN
             |    1.0 + CAST(n_nodes AS DOUBLE) / CAST(s AS DOUBLE) END AS alpha
             |FROM m""".stripMargin),
      allowBnlj = true),


    // Newman modularity Q of the LPA communities (GraphOps.modularity)
    // — the label-quality gate that turns graph_label_propagation's
    // raw labels into a decision: Q ≈ 0 means the communities are no
    // better than random and downstream consumers (cluster-aware
    // splits, community-grain sampling) should NOT trust them; the
    // 2-out-regular synthetic graph here measures what it measures,
    // and the point is the bit-exact machinery. Per-community
    // e_c/d_c/n are exact longs, q_term one fixed IEEE chain, and the
    // global Q rides every row via the SORTED label fold (the
    // cramers_v discipline). The oracle re-derives the LPA labels from
    // scratch (all 3 rounds) before re-checking Q.
    "graph_modularity" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val ids = docs.select(col("doc_id"))
        val edges = ids.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 3) % 500,
            (col("doc_id") * 13 + 5) % 500,
            (col("doc_id") * 29 + 11) % 500)).as("dst"))
        val labels = GraphOps.labelPropagation(
          ids, edges, "doc_id", "src", "dst", iterations = 3)
        GraphOps.modularity(labels, edges, "doc_id", "label", "src", "dst")
      },
      Some(modularityOracle("WHERE doc_id < 500", "500")),
      allowBnlj = true),


    // HITS hubs & authorities (GraphOps.hits, Kleinberg 1999): 4
    // alternating rounds over the same synthetic link graph as
    // graph_pagerank — the two-score decomposition PageRank conflates
    // (high authority = content worth sampling; high hub + low
    // authority = link farm / directory, the crawl-exclusion
    // signature). Fixed-point integer arithmetic with L∞ per-round
    // rescaling instead of L2 (documented deviation: the fixed point
    // is scaling-invariant, and max-rescale is exact truncating
    // integer math where a square root is not) ⇒ every round is
    // bit-portable and the whole computation is oracled as 4 unrolled
    // SQL rounds of HUGEINT sum + rescale. Per half-round: one edge
    // equi-join, one groupBy, a 1-row max broadcast — never a driver
    // collect; lineage cuts through the pagerank checkpoint seam.
    "graph_hits" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val ids = docs.select(col("doc_id"))
        val edges = ids.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 3) % 500,
            (col("doc_id") * 13 + 5) % 500,
            (col("doc_id") * 29 + 11) % 500)).as("dst"))
        GraphOps.hits(ids, edges, "doc_id", "src", "dst", iterations = 4)
          .orderBy(col("doc_id"))
      },
      Some(hitsOracle("WHERE doc_id < 500", "500")),
      allowBnlj = true),


    // Neighborhood link prediction (GraphOps.linkPrediction,
    // Liben-Nowell & Kleinberg 2003): top-50 unlinked pairs of the
    // synthetic graph by common-neighbor count, with Jaccard and
    // Adamic-Adar — the related-page / crawl-frontier scorer. Wedge
    // centers are degree-gated (the LSH pair-budget idea: a hub mints
    // deg² candidates while contributing 1/ln(deg) ≈ 0) and the
    // Adamic-Adar transcendental quantizes ONCE per node on the degree
    // grain (1/ln(deg) DECIMAL(20,9), oracle through the VARCHAR
    // bridge) so per-pair scores are exact decimal sums; Jaccard is
    // ONE IEEE division of exact integers; the top-k ORDERS ON THE
    // EXACT DECIMAL (common DESC, AA DESC, pair) so ranking never
    // reads a double. Global top-k plans as TakeOrderedAndProject.
    "graph_linkpred" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val ids = docs.select(col("doc_id"))
        val edges = ids.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 3) % 500,
            (col("doc_id") * 13 + 5) % 500,
            (col("doc_id") * 29 + 11) % 500)).as("dst"))
        GraphOps.linkPrediction(edges, "src", "dst", k = 50)
      },
      Some(s"""WITH ${graphNodeEdgeCtes("WHERE doc_id < 500", "500")},
           |adj AS (SELECT src AS u, dst AS v FROM de
           |        UNION SELECT dst, src FROM de),
           |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
           |        FROM adj GROUP BY 1),
           |centers AS (
           |  SELECT u AS z, CAST(CAST(CAST(1.0 AS DOUBLE) / ln(d) AS VARCHAR)
           |    AS DECIMAL(20,9)) AS il
           |  FROM deg WHERE d >= 2 AND d <= 10000),
           |wed AS (
           |  SELECT l.v AS x, r.v AS y, l.u AS z
           |  FROM adj l JOIN adj r ON r.u = l.u AND l.v < r.v),
           |sc AS (
           |  SELECT x, y, CAST(count(*) AS BIGINT) AS n_common,
           |    sum(c.il) AS aa
           |  FROM wed JOIN centers c ON c.z = wed.z GROUP BY 1, 2),
           |cand AS (
           |  SELECT sc.* FROM sc
           |  LEFT JOIN adj e ON e.u = sc.x AND e.v = sc.y
           |  WHERE e.u IS NULL AND n_common >= 1),
           |wd AS (
           |  SELECT cand.x, cand.y, n_common, da.d AS deg_a, db.d AS deg_b, aa
           |  FROM cand
           |  JOIN deg da ON da.u = cand.x
           |  JOIN deg db ON db.u = cand.y)
           |SELECT x AS node_a, y AS node_b, n_common, deg_a, deg_b,
           |  CAST(n_common AS DOUBLE) /
           |    CAST(deg_a + deg_b - n_common AS DOUBLE) AS jaccard,
           |  CAST(aa AS DOUBLE) AS adamic_adar
           |FROM wd
           |ORDER BY n_common DESC, aa DESC, x, y LIMIT 50""".stripMargin)),


    // Geohash grid bucketing (GeoOps.geohash): the spatial shuffle key
    // — the reference's data model is weather stations with
    // coordinates, and gridding points into geohash cells is how a
    // proximity workload blocks candidates at scale (the LSH-band idea
    // on the globe). Pure integer quantize → bit-interleave → base32
    // as ONE codegen column expression (no UDF, no trig — distance
    // ranking is a rerank stage, libm sin/cos is engine-specific);
    // matches published reference cells (GeoOpsSpec) and the oracle
    // replays the identical arithmetic ⇒ fully oracled. Points
    // synthesized deterministically from customer keys.
    "geo_geohash_bucket" -> QuerySpec(
      (s, d) => {
        val pts = t(s, d, "customer").select(col("c_custkey"),
          ((col("c_custkey") % 17000).cast(DoubleType) / 100.0 - 85.0)
            .as("lat"),
          (((col("c_custkey") * 7) % 35000).cast(DoubleType) / 100.0 - 175.0)
            .as("lon"))
        pts.select(col("c_custkey"),
            GeoOps.geohash(col("lat"), col("lon"), precision = 4).as("cell"))
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("n"),
            min(col("c_custkey")).as("min_key"),
            max(col("c_custkey")).as("max_key"))
          .orderBy(col("cell"))
      },
      Some(geohashOracle(4))),


    // k-nearest-neighbor lookup on the integer centidegree grid
    // (round 14): top-10 customers per literal query point, RANKED BY
    // THE EXACT equirectangular squared distance (Δlat² + Δlon² in
    // centidegree longs — every comparison bit-decided; fine as a
    // blocking/rerank baseline at city extents, documented as such)
    // with the true haversine metres riding along as a DISPLAY column
    // (the one transcendental chain, quantized ONCE to DECIMAL(12,3);
    // ranking never reads it — the geo twin of the ANN exact-rerank
    // separation). radians()·sin/cos/asin sequence is written in the
    // IDENTICAL operation order on both engines; the oracle bridges
    // the quantizing cast through VARCHAR. 5 query points × N scan —
    // linear; at corpus scale the geohash cell tier blocks first.
    "geo_knn_equirect" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val pts = t(s, d, "customer").select(col("c_custkey"),
          (col("c_custkey") % 17000 - 8500).cast(LongType).as("lat_q"),
          ((col("c_custkey") * 7) % 35000 - 17500).cast(LongType).as("lon_q"))
        val qs = Seq((1, -2000L, 5000L), (2, 4500L, -12000L), (3, 0L, 0L),
          (4, 8000L, 17000L), (5, -8400L, -17400L))
          .toDF("qid", "q_lat", "q_lon")
        val j = pts.crossJoin(broadcast(qs))
          .withColumn("dist2",
            (col("lat_q") - col("q_lat")) * (col("lat_q") - col("q_lat")) +
              (col("lon_q") - col("q_lon")) * (col("lon_q") - col("q_lon")))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("dist2"), col("c_custkey"))
        val phi1 = radians(col("q_lat").cast(DoubleType) / lit(100.0))
        val phi2 = radians(col("lat_q").cast(DoubleType) / lit(100.0))
        val dphi = (phi2 - phi1) / lit(2.0)
        val dlam = (radians(col("lon_q").cast(DoubleType) / lit(100.0)) -
          radians(col("q_lon").cast(DoubleType) / lit(100.0))) / lit(2.0)
        val hav = (lit(12742000.0) * asin(sqrt(
          sin(dphi) * sin(dphi) +
            cos(phi1) * cos(phi2) * sin(dlam) * sin(dlam))))
          .cast(DecimalType(12, 3)).cast(DoubleType)
        j.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("rank"), col("c_custkey"), col("dist2"),
            hav.as("haversine_m"))
          .orderBy(col("qid"), col("rank"))
      },
      Some("""WITH pts AS (
             |  SELECT c_custkey,
             |    c_custkey % 17000 - 8500 AS lat_q,
             |    (c_custkey * 7) % 35000 - 17500 AS lon_q
             |  FROM customer),
             |q(qid, q_lat, q_lon) AS (VALUES
             |  (1, -2000, 5000), (2, 4500, -12000), (3, 0, 0),
             |  (4, 8000, 17000), (5, -8400, -17400)),
             |j AS (
             |  SELECT q.qid, p.c_custkey, p.lat_q, p.lon_q, q.q_lat, q.q_lon,
             |    (p.lat_q - q.q_lat) * (p.lat_q - q.q_lat) +
             |    (p.lon_q - q.q_lon) * (p.lon_q - q.q_lon) AS dist2
             |  FROM pts p CROSS JOIN q),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid
             |    ORDER BY dist2, c_custkey) AS rank
             |  FROM j)
             |SELECT qid, CAST(rank AS INTEGER) AS rank, c_custkey,
             |  CAST(dist2 AS BIGINT) AS dist2,
             |  CAST(CAST(CAST(12742000.0 * asin(sqrt(
             |    sin((radians(lat_q / 100.0) - radians(q_lat / 100.0)) / 2.0) *
             |    sin((radians(lat_q / 100.0) - radians(q_lat / 100.0)) / 2.0) +
             |    cos(radians(q_lat / 100.0)) * cos(radians(lat_q / 100.0)) *
             |    sin((radians(lon_q / 100.0) - radians(q_lon / 100.0)) / 2.0) *
             |    sin((radians(lon_q / 100.0) - radians(q_lon / 100.0)) / 2.0)))
             |    AS VARCHAR) AS DECIMAL(12,3)) AS DOUBLE) AS haversine_m
             |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin),
      allowBnlj = true),


    // Spatial candidate-pair generation: the geohash bucket's PAYOFF —
    // a self-equi-join on the cell id yields proximity candidates
    // without any all-pairs scan (the LSH band-join, on the globe; at
    // corpus scale hot cells take the same broadcast-prune/pair-budget
    // cap as minhash bands — DedupOps.maxDocsForPairBudget is the
    // shared machinery). Per-cell pair counts plus an exact pair-sum
    // checksum pin the actual pair CONTENT, not just cardinality.
    "geo_cell_pairs" -> QuerySpec(
      (s, d) => {
        val pts = t(s, d, "customer").select(col("c_custkey"),
          ((col("c_custkey") % 17000).cast(DoubleType) / 100.0 - 85.0)
            .as("lat"),
          (((col("c_custkey") * 7) % 35000).cast(DoubleType) / 100.0 - 175.0)
            .as("lon"))
        val allCells = pts.select(col("c_custkey"),
          GeoOps.geohash(col("lat"), col("lon"), precision = 3).as("cell"))
        // the shared LSH pair-budget cap, WIRED (r13): a cell past
        // ~44.7k points (10⁹ pairs) is dropped before the self-join —
        // the FUSED window-count form, which rides the self-join's own
        // cell exchange (the anti-join form measured +65% on this key);
        // never above fixture density here, so the oracle is untouched.
        // GeoOpsSpec plants a hot cell and proves both forms cap.
        val cells = GeoOps.pruneHotCellsInline(
          allCells, "cell", maxCellPairs = 1000000000L)
        cells.as("a")
          .join(cells.as("b"),
            col("a.cell") === col("b.cell") &&
              col("a.c_custkey") < col("b.c_custkey"))
          .groupBy(col("a.cell").as("cell"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("a.c_custkey") + col("b.c_custkey")).as("pair_key_sum"))
          .orderBy(col("cell"))
      },
      Some(s"""${geohashCellsCte(3)},
             |pairs AS (
             |  SELECT a.cell, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(SUM(a.c_custkey + b.c_custkey) AS BIGINT)
             |      AS pair_key_sum
             |  FROM cells a JOIN cells b
             |    ON a.cell = b.cell AND a.c_custkey < b.c_custkey
             |  GROUP BY a.cell)
             |SELECT cell, n_pairs, pair_key_sum
             |FROM pairs ORDER BY cell""".stripMargin)),


    // BORDER-CORRECT spatial blocking (GeoOps.geohashNeighborhood):
    // geo_cell_pairs' single-cell equi-join structurally misses every
    // pair split by a cell boundary — production blocking explodes the
    // 3×3 neighbor set for ONE side of the join (both sides would
    // double-count). Neighbor arithmetic on the quantized integer
    // indexes: longitude WRAPS at the antimeridian, latitude CLAMPS at
    // the poles. Candidate pairs dedup by key pair (a pair can match
    // through several shared cells); the single row reports total /
    // same-cell / border-only pair counts + the exact key-sum
    // checksum — border_only > 0 is the planted proof the expansion
    // finds what the plain join misses.
    "geo_cell_pairs_border" -> QuerySpec(
      (s, d) => {
        val pts = t(s, d, "customer").select(col("c_custkey"),
          ((col("c_custkey") % 17000).cast(DoubleType) / 100.0 - 85.0)
            .as("lat"),
          (((col("c_custkey") * 7) % 35000).cast(DoubleType) / 100.0 - 175.0)
            .as("lon"))
        // precision 4 (finer grid than geo_cell_pairs' 3): cell pair
        // cost is quadratic in per-cell density, so a denser corpus
        // moves to a finer grid — the production knob, exercised here
        val homeAll = pts.select(col("c_custkey"),
          GeoOps.geohash(col("lat"), col("lon"), precision = 4).as("cell"))
        // pair-budget cap on the HOME density (r13, the wired LSH
        // analog, fused window-count form): an over-budget HOME cell is
        // dropped, its points still pair through their other neighbor
        // cells. The blocks side needs no separate prune: cand is an
        // INNER join against the pruned home, so probe rows aimed at a
        // hot cell find no partner — the quadratic term needs BOTH
        // sides populated. Budget far above fixture density ⇒ oracle
        // untouched.
        val home = GeoOps.pruneHotCellsInline(
          homeAll, "cell", maxCellPairs = 1000000000L)
        // r17 (guide §2.4): the same-cell count is FUSED into the
        // candidate join instead of a second home×home self-join — a
        // candidate row is a same-cell pair iff the probe side matched
        // through its OWN home cell (the join key already equals the
        // build side's home cell), so tagging each exploded block row
        // with `home_cell` and taking max(is_home) per pair yields
        // n_same from the same groupBy that dedups candidates. Plan:
        // 2 joins + distinct + 2 aggs + crossJoin → 1 join + 1 groupBy
        // + 1 agg; results bit-identical (home(a)=home(b) ⇔ a matched b
        // at a's home cell).
        val blocks = GeoOps.explodeNeighborCells(
          pts.withColumn("home_cell",
            GeoOps.geohash(col("lat"), col("lon"), precision = 4)),
          "lat", "lon", precision = 4)
          .select(col("c_custkey"), col("cell"),
            (col("cell") === col("home_cell")).as("is_home"))
        val cand = blocks.as("a")
          .join(home.as("b"),
            col("a.cell") === col("b.cell") &&
              col("a.c_custkey") < col("b.c_custkey"))
          .groupBy(col("a.c_custkey").as("ka"), col("b.c_custkey").as("kb"))
          .agg(max(col("a.is_home").cast(IntegerType)).as("_same"))
        cand.agg(count(lit(1)).as("n_pairs_total"),
            sum(col("ka") + col("kb")).as("pair_key_sum"),
            sum(col("_same")).cast(LongType).as("n_same"))
          .select(col("n_pairs_total"),
            col("n_same").as("n_pairs_same_cell"),
            (col("n_pairs_total") - col("n_same")).as("n_pairs_border_only"),
            col("pair_key_sum"),
            (col("n_pairs_total") >= col("n_same")).cast(IntegerType)
              .as("ok_superset"))
      },
      Some(s"""${geohashCellsCte(4)},
             |nb0 AS (
             |  SELECT q.c_custkey,
             |    q.latq + d.dlat AS latq2,
             |    ((q.lonq + d.dlon) % ${1L << 10} + ${1L << 10}) % ${1L << 10}
             |      AS lonq2
             |  FROM q CROSS JOIN (
             |    SELECT a.dlat, b.dlon
             |    FROM (SELECT unnest([-1, 0, 1]) AS dlat) a
             |    CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dlon) b) d
             |  WHERE q.latq + d.dlat >= 0 AND q.latq + d.dlat < ${1L << 10}),
             |nbi AS (
             |  SELECT c_custkey,
             |      ${geohashInterleaveSql("latq2", "lonq2", 4)} AS inter2
             |  FROM nb0),
             |nb AS (
             |  SELECT DISTINCT c_custkey,
             |      ${geohashCharsSql("inter2", 4)} AS cell
             |  FROM nbi),
             |cand AS (
             |  SELECT DISTINCT a.c_custkey AS ka, b.c_custkey AS kb
             |  FROM nb a JOIN cells b
             |    ON a.cell = b.cell AND a.c_custkey < b.c_custkey),
             |same AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_same
             |  FROM cells a JOIN cells b
             |    ON a.cell = b.cell AND a.c_custkey < b.c_custkey)
             |SELECT CAST(count(*) AS BIGINT) AS n_pairs_total,
             |  same.n_same AS n_pairs_same_cell,
             |  CAST(count(*) - same.n_same AS BIGINT) AS n_pairs_border_only,
             |  CAST(SUM(ka + kb) AS BIGINT) AS pair_key_sum,
             |  CAST(count(*) >= same.n_same AS INTEGER) AS ok_superset
             |FROM cand CROSS JOIN same GROUP BY same.n_same""".stripMargin),
      allowBnlj = true),


    // k-core peeling (GraphOps.kcore): the community-density filter —
    // iteratively drop nodes with < k surviving neighbors. Graph =
    // ring over 300 nodes (degree 2 — dies at k=3) + a 20-clique
    // (k-core for any k ≤ 19 — survives) + spokes from every 5th ring
    // node into the clique (die once their ring side is peeled): the
    // cascade exercises multi-round peeling, the clique pins a
    // non-empty fixpoint. 8 unrolled rounds run IDENTICALLY on both
    // engines (an unconverged graph still hash-matches; converged
    // rounds are no-ops), so the key is fully oracled via a generated
    // 8-round CTE chain. Exact long degrees, no division anywhere.
    "graph_kcore" -> QuerySpec(
      (s, d) => {
        val ids = t(s, d, "documents").filter(col("doc_id") < 300)
          .select(col("doc_id").as("id"))
        val ring = ids.select(col("id").as("src"),
          ((col("id") + 1) % 300).as("dst"))
        val clique = ids.filter(col("id") < 19)
          .select(col("id").as("src"),
            explode(sequence(col("id") + 1, lit(19L))).as("dst"))
        val spokes = ids.filter(col("id") % 5 === 0 && col("id") >= 20)
          .select(col("id").as("src"), (col("id") % 20).as("dst"))
        GraphOps.kcore(ring.unionByName(clique).unionByName(spokes),
          "src", "dst", k = 3, rounds = 8, nodeOut = "node")
          .orderBy(col("node"))
      },
      Some(kcoreOracle(8))),


    // Triangle census + global clustering coefficient
    // (GraphOps.triangleStats, Schank & Wagner node-iterator): the
    // link-graph STRUCTURE gate beside graph_pagerank's importance
    // prior — same synthetic deterministic edge set, canonical a<b
    // orientation, one wedge self-join + one closing equi-join, wedge
    // totals from degrees (never materialized). Exact integers + ONE
    // IEEE division ⇒ fully oracled.
    "graph_triangle_count" -> QuerySpec(
      (s, d) => {
        val ids = t(s, d, "documents").filter(col("doc_id") < 500)
          .select(col("doc_id"))
        val edges = ids.select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 3) % 500,
            (col("doc_id") * 13 + 5) % 500,
            (col("doc_id") * 29 + 11) % 500)).as("dst"))
        GraphOps.triangleStats(edges, "src", "dst")
      },
      Some(triangleOracle("WHERE doc_id < 500", "500")),
      allowBnlj = true),


    // SCALE-PROPORTIONAL twins of the four graph keys (round-11 fix for
    // the fixed-fixture audit finding): edges over the FULL doc_id
    // domain, modulus = max(doc_id)+1 — 500 nodes at sf0.01 (where the
    // oracle runs), 5,000 at the sf0.1 bench, 10× more per further SF
    // step, so the benched cost tracks data volume instead of per-round
    // shuffle setup. Same integer fixed-point/censys arithmetic ⇒ all
    // fully oracled via the parameterized oracle builders.
    "graph_pagerank_scaled" -> QuerySpec(
      (s, d) => {
        val (ids, edges) = scaledDocGraph(s, d)
        GraphOps.pagerankFixedPoint(
          ids, edges, "doc_id", "src", "dst", iterations = 5)
          .orderBy(col("doc_id"))
      },
      Some(pagerankOracle("", scaledModSql)),
      allowBnlj = true),


    "graph_label_propagation_scaled" -> QuerySpec(
      (s, d) => {
        val (ids, edges) = scaledDocGraph(s, d)
        GraphOps.labelPropagation(
          ids, edges, "doc_id", "src", "dst", iterations = 3)
          .orderBy(col("doc_id"))
      },
      Some(lpaOracle("", scaledModSql))),


    "graph_hits_scaled" -> QuerySpec(
      (s, d) => {
        val (ids, edges) = scaledDocGraph(s, d)
        GraphOps.hits(ids, edges, "doc_id", "src", "dst", iterations = 4)
          .orderBy(col("doc_id"))
      },
      Some(hitsOracle("", scaledModSql)),
      allowBnlj = true),


    "graph_triangle_scaled" -> QuerySpec(
      (s, d) => {
        val (_, edges) = scaledDocGraph(s, d)
        GraphOps.triangleStats(edges, "src", "dst")
      },
      Some(triangleOracle("", scaledModSql)),
      allowBnlj = true),


    "graph_assortativity_scaled" -> QuerySpec(
      (s, d) => {
        val (_, edges) = scaledDocGraph(s, d)
        GraphOps.degreeAssortativity(edges, "src", "dst")
          .orderBy(col("col_a"))
      },
      Some(assortativityOracle("", scaledModSql))),
  )
}
