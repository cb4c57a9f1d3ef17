package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** One query per operator key (SURVEY.md §2), with the matching DuckDB
  * oracle SQL where the semantics are ANSI-SQL-expressible.
  *
  * Determinism rules (SURVEY.md §5.1, §7.4):
  *  - every query ends in a total order over its output columns;
  *  - no raw double sums/avgs: sums go through an exact DECIMAL
  *    accumulator and are cast back to DOUBLE, so partial-aggregation
  *    order (Spark) vs sequential order (DuckDB) cannot diverge;
  *  - every computed column is cast to an explicit type aliased
  *    identically on both sides.
  */
final case class QuerySpec(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    // Declares that this key's physical plan INTENTIONALLY contains a
    // BroadcastNestedLoopJoin (almost always a 1-row scalar-stats
    // broadcast crossJoin; occasionally a deliberate bounded or
    // compression-path full scan — see the key's own comment). The
    // PlanSpec BNLJ audit derives its allow-set from this marker, so a
    // new scalar-broadcast key declares itself HERE, at the definition
    // site, instead of patching a hand-list in the test.
    allowBnlj: Boolean = false)

object Catalog {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** The synthetic link graph's node+edge CTEs, parameterized by the node
    * filter and the out-link modulus so the same oracle text serves both
    * the fixed 500-node variants (oracle-friendly at any SF) and the
    * SCALE-PROPORTIONAL variants (whereSql = "", modSql = max(doc_id)+1 —
    * the graph grows with the table, so bench measures data, not shuffle
    * setup). */
  private def graphNodeEdgeCtes(whereSql: String, modSql: String): String =
    s"""nodes AS (
       |  SELECT doc_id AS id FROM documents $whereSql),
       |de AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT id AS src, (id * 7 + 3) % $modSql AS dst FROM nodes
       |    UNION ALL SELECT id, (id * 13 + 5) % $modSql FROM nodes
       |    UNION ALL SELECT id, (id * 29 + 11) % $modSql FROM nodes)
       |  WHERE src <> dst)""".stripMargin

  private val scaledModSql = "(SELECT max(doc_id) + 1 FROM documents)"

  /** graph_triangle_count's DuckDB oracle (node-iterator census over the
    * canonical a<b orientation), parameterized like [[pagerankOracle]]. */
  private def triangleOracle(whereSql: String, modSql: String): String =
    s"""WITH ${graphNodeEdgeCtes(whereSql, modSql)},
       |e AS (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM de),
       |deg AS (
       |  SELECT n, count(*) AS d FROM (
       |    SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |ds AS (
       |  SELECT count(*) AS n_nodes,
       |    CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
       |ne AS (SELECT count(*) AS n_edges FROM e),
       |tri AS (
       |  SELECT count(*) AS n_triangles
       |  FROM e x JOIN e y ON x.b = y.a
       |  JOIN e c ON c.a = x.a AND c.b = y.b)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       |  CASE WHEN n_wedges > 0
       |    THEN CAST(3.0 AS DOUBLE) * n_triangles / n_wedges
       |    ELSE CAST(0.0 AS DOUBLE) END AS clustering
       |FROM ds, ne, tri""".stripMargin

  /** graph_assortativity's DuckDB oracle (Pearson of endpoint degrees
    * over the symmetrized edge list), parameterized the same way. */
  private def assortativityOracle(whereSql: String, modSql: String): String =
    s"""WITH ${graphNodeEdgeCtes(whereSql, modSql)},
       |sym AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM de UNION ALL SELECT dst, src FROM de)),
       |deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY 1),
       |prs AS (
       |  SELECT CAST(da.d AS BIGINT) AS da, CAST(db.d AS BIGINT) AS db
       |  FROM sym s
       |  JOIN deg da ON da.id = s.src
       |  JOIN deg db ON db.id = s.dst),
       |a AS (SELECT
       |  CAST(count(CASE WHEN da IS NOT NULL AND db IS NOT NULL
       |    THEN 1 END) AS DOUBLE) AS n,
       |  CAST(COALESCE(SUM(CAST(da AS DECIMAL(38,6))), 0) AS DOUBLE) AS sa,
       |  CAST(COALESCE(SUM(CAST(db AS DECIMAL(38,6))), 0) AS DOUBLE) AS sb,
       |  CAST(COALESCE(SUM(CAST(da * da AS DECIMAL(38,6))), 0) AS DOUBLE) AS saa,
       |  CAST(COALESCE(SUM(CAST(db * db AS DECIMAL(38,6))), 0) AS DOUBLE) AS sbb,
       |  CAST(COALESCE(SUM(CAST(da * db AS DECIMAL(38,6))), 0) AS DOUBLE) AS sab
       |  FROM prs)
       |SELECT 'da' AS col_a, 'db' AS col_b, CAST(n AS BIGINT) AS n,
       |  CASE WHEN n > 1 AND n*saa - sa*sa > 0 AND n*sbb - sb*sb > 0
       |    THEN (n*sab - sa*sb)
       |      / (sqrt(n*saa - sa*sa) * sqrt(n*sbb - sb*sb))
       |  END AS pearson_r
       |FROM a""".stripMargin

  /** Spark side of the scale-proportional link graph: same affine
    * out-link formulas, modulus = max(doc_id)+1 (the doc_id domain is
    * contiguous per TESTDATA.md), carried as a broadcast one-row frame —
    * at sf0.01 this IS the 500-node graph, at sf0.1 it is 5,000 nodes
    * and grows with every SF, so bench measures data volume rather than
    * per-round shuffle setup. */
  private def scaledDocGraph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ids = t(s, d, "documents").select(col("doc_id"))
    val n = ids.agg((max(col("doc_id")) + 1L).as("n"))
    val edges = ids.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        explode(array(
          (col("doc_id") * 7 + 3) % col("n"),
          (col("doc_id") * 13 + 5) % col("n"),
          (col("doc_id") * 29 + 11) % col("n"))).as("dst"))
    (ids, edges)
  }

  /** graph_label_propagation's DuckDB oracle: three synchronous LPA
    * rounds unrolled as chained CTEs over the same synthetic link graph
    * as [[pagerankOracle]]. Integer counts + total (count DESC, label
    * ASC) tie order make every round bit-portable. */
  /** graph_kcore's DuckDB oracle: the same undirected edge build (ring
    * + 20-clique + spokes over doc_id < 300) and the same `rounds`
    * peeling rounds, generated as a CTE chain — e{r} keeps edges whose
    * BOTH endpoints had degree ≥ 3 in e{r−1}. */
  /** geo_geohash_bucket's DuckDB oracle: the same quantize → bit
    * interleave → base32 pipeline as GeoOps.geohash, generated as one
    * closed-form SQL expression (the shift/mask terms and per-char
    * alphabet probes unroll exactly like the Spark plan). */
  /** Interleave expression over named quantized-axis columns — the
    * SQL twin of GeoOps.cellFromQuantized's shift-and-mask unroll. */
  private def geohashInterleaveSql(latSrc: String, lonSrc: String,
      precision: Int): String = {
    val totalBits = precision * 5
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    (0 until totalBits).map { pos =>
      val isLon = pos % 2 == 0
      val srcBit = if (isLon) lonBits - 1 - pos / 2 else latBits - 1 - pos / 2
      val src = if (isLon) lonSrc else latSrc
      s"((($src >> $srcBit) & 1) << ${totalBits - 1 - pos})"
      // single-line joins: a generated continuation line starting with
      // "||" would lose its first pipe to stripMargin
    }.mkString(" + ")
  }

  /** Base32 character expression over a named interleaved-index column. */
  private def geohashCharsSql(interSrc: String, precision: Int): String =
    (0 until precision).map { i =>
      s"substr('${graft.ops.GeoOps.Base32}', CAST((($interSrc >> ${
        (precision - 1 - i) * 5}) & 31) + 1 AS INT), 1)"
    }.mkString(" || ")

  /** Shared WITH-body for the geo keys: pts → quantized axes →
    * interleaved index → per-point `cells(c_custkey, cell)`; the `q`
    * CTE (quantized axes) stays visible for neighbor expansions. */
  private def geohashCellsCte(precision: Int): String = {
    val totalBits = precision * 5
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    s"""WITH pts AS (
       |  SELECT c_custkey,
       |    CAST(c_custkey % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat,
       |    CAST((c_custkey * 7) % 35000 AS DOUBLE) / 100.0 - 175.0 AS lon
       |  FROM customer),
       |q AS (
       |  SELECT c_custkey,
       |    LEAST(CAST(floor((lat + 90.0) / 180.0 * ${1L << latBits})
       |      AS BIGINT), ${(1L << latBits) - 1}) AS latq,
       |    LEAST(CAST(floor((lon + 180.0) / 360.0 * ${1L << lonBits})
       |      AS BIGINT), ${(1L << lonBits) - 1}) AS lonq
       |  FROM pts),
       |inter AS (
       |  SELECT c_custkey,
       |      ${geohashInterleaveSql("latq", "lonq", precision)} AS inter
       |  FROM q),
       |cells AS (
       |  SELECT c_custkey,
       |      ${geohashCharsSql("inter", precision)} AS cell
       |  FROM inter)""".stripMargin
  }

  private def geohashOracle(precision: Int): String =
    s"""${geohashCellsCte(precision)}
       |SELECT cell, CAST(count(*) AS BIGINT) AS n,
       |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
       |FROM cells GROUP BY cell ORDER BY cell""".stripMargin

  private def kcoreOracle(rounds: Int): String = {
    // every per-round CTE is MATERIALIZED: inlined (view-style) CTEs
    // triple their upstream references each round, so an 8-round chain
    // would inline 3⁸ scans of the base table and exhaust file handles
    def round(r: Int): String =
      s"""k$r AS MATERIALIZED (
         |  SELECT u FROM e${r - 1} GROUP BY u HAVING count(*) >= 3),
         |e$r AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e${r - 1} e
         |  JOIN k$r a ON e.u = a.u JOIN k$r b ON e.v = b.u)""".stripMargin
    s"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 300),
       |ring AS (SELECT id AS u, (id + 1) % 300 AS v FROM ids),
       |clique AS (SELECT a.id AS u, b.id AS v FROM ids a JOIN ids b
       |           ON a.id < b.id AND a.id < 20 AND b.id < 20),
       |spokes AS (SELECT id AS u, id % 20 AS v FROM ids
       |           WHERE id % 5 = 0 AND id >= 20),
       |e0 AS MATERIALIZED (SELECT DISTINCT u, v FROM (
       |  SELECT u, v FROM ring UNION ALL SELECT v, u FROM ring
       |  UNION ALL SELECT u, v FROM clique UNION ALL SELECT v, u FROM clique
       |  UNION ALL SELECT u, v FROM spokes UNION ALL SELECT v, u FROM spokes)
       |  WHERE u <> v),
       |${(1 to rounds).map(round).mkString(",\n")}
       |SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
       |FROM e$rounds GROUP BY u ORDER BY node""".stripMargin
  }

  private def lpaOracle(whereSql: String, modSql: String): String = {
    def round(k: Int): String =
      s"""c$k AS (
         |  SELECT s.dst AS nid, l.lab, count(*) AS c
         |  FROM sym s JOIN lp${k - 1} l ON l.id = s.src GROUP BY 1, 2),
         |w$k AS (
         |  SELECT nid, lab, row_number() OVER (PARTITION BY nid
         |    ORDER BY c DESC, lab) AS rn
         |  FROM c$k),
         |lp$k AS (
         |  SELECT p.id, COALESCE(w.lab, p.lab) AS lab
         |  FROM lp${k - 1} p
         |  LEFT JOIN (SELECT nid, lab FROM w$k WHERE rn = 1) w
         |    ON w.nid = p.id)""".stripMargin
    s"""WITH ${graphNodeEdgeCtes(whereSql, modSql)},
       |sym AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM de UNION ALL SELECT dst, src FROM de)),
       |lp0 AS (SELECT id, id AS lab FROM nodes),
       |${(1 to 3).map(round).mkString(",\n")}
       |SELECT id AS doc_id, lab AS label FROM lp3 ORDER BY doc_id""".stripMargin
  }

  /** graph_modularity's DuckDB oracle: the lpaOracle rounds (labels
    * re-derived from scratch) + the Newman Q computation over the
    * canonical undirected edge set — per-community exact counts, fixed
    * IEEE q_terms, and the global Q as list_reduce over
    * list(q_term ORDER BY label), mirroring Spark's sorted fold. */
  private def modularityOracle(whereSql: String, modSql: String): String = {
    def round(k: Int): String =
      s"""c$k AS (
         |  SELECT s.dst AS nid, l.lab, count(*) AS c
         |  FROM sym s JOIN lp${k - 1} l ON l.id = s.src GROUP BY 1, 2),
         |w$k AS (
         |  SELECT nid, lab, row_number() OVER (PARTITION BY nid
         |    ORDER BY c DESC, lab) AS rn
         |  FROM c$k),
         |lp$k AS (
         |  SELECT p.id, COALESCE(w.lab, p.lab) AS lab
         |  FROM lp${k - 1} p
         |  LEFT JOIN (SELECT nid, lab FROM w$k WHERE rn = 1) w
         |    ON w.nid = p.id)""".stripMargin
    s"""WITH ${graphNodeEdgeCtes(whereSql, modSql)},
       |sym AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM de UNION ALL SELECT dst, src FROM de)),
       |lp0 AS (SELECT id, id AS lab FROM nodes),
       |${(1 to 3).map(round).mkString(",\n")},
       |und AS (
       |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM de),
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
       |deg AS (
       |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
       |  GROUP BY 1),
       |dc AS (
       |  SELECT l.lab AS label, CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(SUM(COALESCE(d.deg, 0)) AS BIGINT) AS d_c
       |  FROM lp3 l LEFT JOIN deg d ON d.id = l.id GROUP BY 1),
       |ec AS (
       |  SELECT la.lab AS label, CAST(count(*) AS BIGINT) AS e_c
       |  FROM und u
       |  JOIN lp3 la ON la.id = u.a
       |  JOIN lp3 lb ON lb.id = u.b
       |  WHERE la.lab = lb.lab GROUP BY 1),
       |terms AS (
       |  SELECT dc.label, dc.n_nodes, dc.d_c,
       |    CAST(COALESCE(ec.e_c, 0) AS BIGINT) AS e_c,
       |    CAST(COALESCE(ec.e_c, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
       |      - (CAST(dc.d_c AS DOUBLE) / (2.0 * CAST(mm.m AS DOUBLE)))
       |        * (CAST(dc.d_c AS DOUBLE) / (2.0 * CAST(mm.m AS DOUBLE)))
       |      AS q_term
       |  FROM dc LEFT JOIN ec USING (label) CROSS JOIN mm),
       |qt AS (
       |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(q_term ORDER BY label)), (x, y) -> x + y) AS q
       |  FROM terms)
       |SELECT label, n_nodes, d_c, e_c, q_term, q
       |FROM terms CROSS JOIN qt ORDER BY label""".stripMargin
  }

  /** graph_pagerank's DuckDB oracle: the five fixed-point iterations
    * unrolled as chained CTEs (a recursive CTE with an aggregate over
    * the recursive relation is not portable), each the literal integer
    * restatement of one GraphOps round — `//` is DuckDB's integer
    * division, matching Spark's `div` on the all-positive ranks. */
  private def pagerankOracle(whereSql: String, modSql: String): String = {
    def iter(k: Int): String =
      s"""pr$k AS (
         |  SELECT base.id, base.b,
         |    CAST(base.b + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS pr
         |  FROM base LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.pr // od.deg) AS c
         |    FROM pr${k - 1} p
         |    JOIN edges e ON e.src = p.id
         |    JOIN od ON od.src = p.id
         |    GROUP BY e.dst) s ON s.id = base.id)""".stripMargin
    s"""WITH ${graphNodeEdgeCtes(whereSql, modSql)},
       |edges AS (SELECT src, dst FROM de),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |base AS (
       |  SELECT id, ((1000000000000 * 15) // 100) // n AS b
       |  FROM nodes CROSS JOIN nn),
       |pr0 AS (
       |  SELECT base.id, base.b, CAST(1000000000000 // n AS BIGINT) AS pr
       |  FROM base CROSS JOIN nn),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT id AS doc_id, pr FROM pr5 ORDER BY doc_id""".stripMargin
  }

  /** graph_hits' DuckDB oracle: 4 unrolled HITS rounds, each two
    * half-rounds of HUGEINT sum + L∞ rescale — the exact integer
    * sequence [[graft.ops.GraphOps.hits]] computes (both engines
    * truncate non-negative division identically). */
  private def hitsOracle(whereSql: String, modSql: String): String = {
    def round(k: Int): String =
      s"""a${k}r AS (
         |  SELECT e.dst AS id, sum(CAST(h.h AS HUGEINT)) AS r
         |  FROM edges e JOIN h${k - 1} h ON h.id = e.src GROUP BY 1),
         |a${k}m AS (SELECT max(r) AS m FROM a${k}r),
         |a$k AS (
         |  SELECT n.id,
         |    (coalesce(r.r, 0) * CAST(1000000000000 AS HUGEINT)) // m AS a
         |  FROM nodes n LEFT JOIN a${k}r r ON r.id = n.id CROSS JOIN a${k}m),
         |h${k}r AS (
         |  SELECT e.src AS id, sum(a.a) AS r
         |  FROM edges e JOIN a$k a ON a.id = e.dst GROUP BY 1),
         |h${k}m AS (SELECT max(r) AS m FROM h${k}r),
         |h$k AS (
         |  SELECT n.id,
         |    (coalesce(r.r, 0) * CAST(1000000000000 AS HUGEINT)) // m AS h
         |  FROM nodes n LEFT JOIN h${k}r r ON r.id = n.id CROSS JOIN h${k}m)""".stripMargin
    s"""WITH ${graphNodeEdgeCtes(whereSql, modSql)},
       |edges AS (SELECT src, dst FROM de),
       |h0 AS (SELECT id, CAST(1000000000000 AS HUGEINT) AS h FROM nodes),
       |${(1 to 4).map(round).mkString(",\n")}
       |SELECT a4.id AS doc_id, CAST(a4.a AS BIGINT) AS authority,
       |  CAST(h4.h AS BIGINT) AS hub
       |FROM a4 JOIN h4 ON h4.id = a4.id ORDER BY doc_id""".stripMargin
  }

  /** sql_recursive_cte's shared statement: ONE SQL text parameterized
    * only by the documents-table name, run natively by BOTH engines
    * (Spark 4.x executes WITH RECURSIVE; DuckDB always has). Bounded
    * BFS: deterministic 2-out-regular edges over doc_id < 200, seeds
    * doc_id < 20, min-depth per (seed, node) at depth ≤ 3. UNION ALL +
    * the depth guard bounds the recursion identically everywhere; the
    * aggregate stays OUTSIDE the recursive relation (the non-portable
    * construct). */
  private def recursiveBfsSql(table: String): String =
    s"""WITH RECURSIVE edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT doc_id AS src, (doc_id * 7 + 3) % 200 AS dst
       |    FROM $table WHERE doc_id < 200
       |    UNION ALL
       |    SELECT doc_id, (doc_id * 13 + 5) % 200
       |    FROM $table WHERE doc_id < 200)
       |  WHERE src <> dst),
       |r(seed, node, depth) AS (
       |  SELECT doc_id, doc_id, 0 FROM $table WHERE doc_id < 20
       |  UNION ALL
       |  SELECT r.seed, e.dst, r.depth + 1
       |  FROM r JOIN edges e ON e.src = r.node
       |  WHERE r.depth < 3)
       |SELECT seed, node, CAST(min(depth) AS BIGINT) AS depth
       |FROM r GROUP BY seed, node ORDER BY seed, node""".stripMargin

  /** IVF coarse quantizers, one per dataset dir: the fit is the offline
    * step of the fit/query split (SimilarityOps.ivfFit) — re-training it
    * per query invocation would put an iterative KMeans inside every ANN
    * lookup. Seeded ⇒ the memoized model is deterministic per dataset. */
  private val ivfModels =
    new java.util.concurrent.ConcurrentHashMap[String, SimilarityOps.IvfModel]()

  /** Corpus bloom sketches, one per dataset dir — the offline half of
    * dedup_incremental_bloom's fit/apply split (DedupOps.bloomFitDigests),
    * memoized for the same reason as [[ivfModels]]. */
  private val bloomSketches =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  /** PQ codebooks, one per dataset dir — the offline fit half of
    * product quantization (SimilarityOps.pqFit), memoized for the same
    * reason as [[ivfModels]]. */
  private val pqModels =
    new java.util.concurrent.ConcurrentHashMap[String, SimilarityOps.PqModel]()

  /** Quantized PCA loading matrices, one per dataset dir — the offline
    * fit half of the staged-PCA artifact (SimilarityOps
    * .pcaFitQuantizedLoadings), memoized like [[ivfModels]]. */
  private val pcaModels =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Long]]]()

  private def pcaModel(s: SparkSession, d: String): Array[Array[Long]] =
    pcaModels.computeIfAbsent(d, dir =>
      SimilarityOps.pcaFitQuantizedLoadings(
        t(s, dir, "embeddings"), "embedding", k = 3))

  private def ivfModel(s: SparkSession, d: String): SimilarityOps.IvfModel =
    ivfModels.computeIfAbsent(d, dir =>
      SimilarityOps.ivfFit(
        t(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
        "cvec", nCentroids = 8))

  private def pqModel(s: SparkSession, d: String): SimilarityOps.PqModel =
    pqModels.computeIfAbsent(d, dir =>
      SimilarityOps.pqFit(
        t(s, dir, "embeddings")
          .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
        "cvec", dim = 64, m = 16, k = 64))

  /** Milli-grid (×1000, floor) quantization of the fitted ANN models:
    * the cross-engine-exact PRESENTATION of the k-means fit. The raw
    * centroids are means — iteration-order-sensitive doubles no other
    * engine can reproduce — but once snapped to integer-valued doubles
    * and STAGED as parquet, assignment distances and ADC scores become
    * exact integer arithmetic that DuckDB replays bit-for-bit (the
    * sim_hard_negatives quantized-grid pattern applied to the model):
    * products ≤ ~1e6 and 64-term sums ≤ ~1e9 sit far below 2^53, so
    * every IEEE double in the chain is exact and order-independent.
    * This is also the production fit/serve artifact shape — the model
    * a query job loads is a parquet table, not an in-JVM object. */
  private def quantizedIvf(s: SparkSession, d: String): SimilarityOps.IvfModel =
    SimilarityOps.IvfModel(
      ivfModel(s, d).centroids.map(_.map(x => math.floor(x * 1000))))

  private def quantizedPq(s: SparkSession, d: String): SimilarityOps.PqModel =
    SimilarityOps.PqModel(
      pqModel(s, d).codebooks.map(_.map(_.map(x => math.floor(x * 1000)))))

  /** Stage the quantized ANN models as parquet model artifacts (fit/serve
    * split with an on-disk model): `ann_ivf_centroids(cell, centroid)` and
    * `ann_pq_codebooks(m, code, centroid)`, centroids as ARRAY<BIGINT> on
    * the milli-grid. The DuckDB oracle replays cell assignment + ADC
    * scoring over these tables — flipping the ANN tier from rows-only to
    * hash-exact. Returns the two staged dirs. */
  private def stageAnnModels(s: SparkSession, d: String): (String, String) = {
    import s.implicits._
    val ivfDir = staged(d, "ann_ivf_centroids") { dir =>
      quantizedIvf(s, d).centroids.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.map(_.toLong).toSeq) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    val pqDir = staged(d, "ann_pq_codebooks") { dir =>
      val pq = quantizedPq(s, d)
      (for {
        mi <- pq.codebooks.indices
        ci <- pq.codebooks(mi).indices
      } yield (mi, ci, pq.codebooks(mi)(ci).map(_.toLong).toSeq)).toSeq
        .toDF("m", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    (ivfDir, pqDir)
  }

  /** Shared DuckDB CTE fragments for the oracled ANN keys: milli-grid
    * quantized query/candidate vectors (the exact twin of
    * `SimilarityOps.quantize`), IVF nearest-cell assignment + nProbe=3
    * probing over the staged centroid table, and PQ code assignment +
    * ADC lookup tables over the staged codebooks (m=16, subDim=4,
    * K=64). All distance/ranking arithmetic is integer (d2 = |c|² −
    * 2·v·c = twice the Spark-side half-norm distance — same order, same
    * ties); only the final cosine divides, with the identical
    * sqrt/multiply/divide rounding chain as the cosine_sim expression. */
  private val annQuantVecCtes =
    """q0 AS (
      |  SELECT vec_id AS qid, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qvec
      |  FROM embeddings WHERE vec_id < 5),
      |c0 AS (
      |  SELECT vec_id AS cid, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS cvec
      |  FROM embeddings)""".stripMargin

  private val annIvfProbeCtes =
    """ivf AS (
      |  SELECT cell, centroid FROM read_parquet(
      |    '/tmp/graft_stage/_root_testdata_sf0.01/ann_ivf_centroids/*.parquet')),
      |qd AS (
      |  SELECT qid, cell, SUM(mv*mv) - 2*SUM(qv*mv) AS d2
      |  FROM (SELECT q.qid, m.cell, unnest(q.qvec) AS qv, unnest(m.centroid) AS mv
      |        FROM q0 q CROSS JOIN ivf m)
      |  GROUP BY qid, cell),
      |probe AS (
      |  SELECT qid, cell FROM (
      |    SELECT qid, cell, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cell) AS pr
      |    FROM qd) WHERE pr <= 3),
      |cd AS (
      |  SELECT cid, cell, SUM(mv*mv) - 2*SUM(cv*mv) AS d2
      |  FROM (SELECT c.cid, m.cell, unnest(c.cvec) AS cv, unnest(m.centroid) AS mv
      |        FROM c0 c CROSS JOIN ivf m)
      |  GROUP BY cid, cell),
      |cell_assign AS (
      |  SELECT cid, cell FROM (
      |    SELECT cid, cell, ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d2, cell) AS ar
      |    FROM cd) WHERE ar = 1),""".stripMargin

  private val annPqCtes =
    """pq AS (
      |  SELECT m, code, centroid FROM read_parquet(
      |    '/tmp/graft_stage/_root_testdata_sf0.01/ann_pq_codebooks/*.parquet')),
      |pq_cdist AS (
      |  SELECT cid, m, code, SUM(bv*bv) - 2*SUM(sv*bv) AS d2
      |  FROM (SELECT c.cid, b.m, b.code,
      |          unnest(c.cvec[b.m*4+1 : b.m*4+4]) AS sv,
      |          unnest(b.centroid) AS bv
      |        FROM c0 c CROSS JOIN pq b)
      |  GROUP BY cid, m, code),
      |pq_code AS (
      |  SELECT cid, m, code FROM (
      |    SELECT cid, m, code,
      |      ROW_NUMBER() OVER (PARTITION BY cid, m ORDER BY d2, code) AS r
      |    FROM pq_cdist) WHERE r = 1),
      |pq_cnorm AS (
      |  SELECT cid, sqrt(CAST(SUM(v*v) AS DOUBLE)) AS cn
      |  FROM (SELECT cid, unnest(cvec) AS v FROM c0) GROUP BY cid),
      |pq_qt AS (
      |  SELECT qid, m, code, SUM(sv*bv) AS pdot
      |  FROM (SELECT q.qid, b.m, b.code,
      |          unnest(q.qvec[b.m*4+1 : b.m*4+4]) AS sv,
      |          unnest(b.centroid) AS bv
      |        FROM q0 q CROSS JOIN pq b)
      |  GROUP BY qid, m, code),
      |pq_qnorm AS (
      |  SELECT qid, sqrt(CAST(SUM(v*v) AS DOUBLE)) AS qn
      |  FROM (SELECT qid, unnest(qvec) AS v FROM q0) GROUP BY qid),""".stripMargin

  /** Trained BPE merge lists, one per dataset dir — tokenizer training
    * is the offline fit half (BpeOps.bpeFit), memoized for the same
    * reason as [[ivfModels]]; deterministic tie-breaks make the
    * memoized list reproducible. */
  private val bpeMergeModels =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  /** Byte-level BPE merge lists (BpeOps.byteBpeFit) — same memoization
    * contract as [[bpeMergeModels]], separate map because the two
    * tokenizer tiers train over different alphabets. */
  private val byteBpeMergeModels =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  /** Unigram-LM (SentencePiece-class) models (UnigramLmOps.unigramFit)
    * — same memoization contract as [[bpeMergeModels]]; the third
    * production tokenizer tier (piece → logProb table, Viterbi
    * encode). */
  private val unigramLmModels =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Double)]]()

  /** WordPiece (BERT-class) vocabularies (WordPieceOps.wordPieceFit) —
    * same memoization contract as [[bpeMergeModels]]; the fourth
    * production tokenizer tier (ordered piece list, greedy
    * longest-match encode). */
  private val wordPieceModels =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  /** NB model for the CALIBRATION fixture (the built multi-line corpus
    * both profile_calibration and profile_recalibrate score, and that
    * text_nb_quality_distill re-fits on the SAME rows) — one explicit
    * [[memoModel]] slot, "nb_calib". First-fit-wins across the three
    * call sites is INTENTIONAL and only sound because every caller's
    * fit inputs are byte-identical (same built corpus, same
    * c4QualityFlags labels); if any caller's fixture build ever
    * drifts, split it onto its own memoModel name. The shared-slot
    * intent is keyed here rather than hidden in a dataset-only cache
    * (r15 ADVICE). */
  private def nbCalibModel(s: SparkSession, d: String,
      fit: => DataFrame): DataFrame = memoModel(s, d, "nb_calib")(fit)

  /** The [[nbCalibModel]] memo generalized to any named model-grain
    * fit (r15): several keys deliberately share one frozen model (the
    * production fit-once/serve-many shape), and without the memo each
    * key re-executes the fit subtree — same JVM-lifetime LocalRelation
    * rebuild, same identical-values contract, hashes unchanged. */
  private val modelMemos = new java.util.concurrent.ConcurrentHashMap[
    String, (java.util.List[org.apache.spark.sql.Row], StructType)]()
  private def memoModel(s: SparkSession, d: String, name: String)(
      fit: => DataFrame): DataFrame = {
    val (rows, schema) = modelMemos.computeIfAbsent(d + "#" + name, { _ =>
      val m = fit
      val collected =
        m.collect() // driver-side model fit: model-grain rows, bpeFit contract
      (java.util.Arrays.asList(collected: _*), m.schema)
    })
    s.createDataFrame(rows, schema)
  }

  /** Deterministic per-dataset scratch dirs for keys that exercise a real
    * writer or a real non-parquet reader. The staged bytes always derive
    * from the driver test tables, so the DuckDB oracle can check the
    * round-trip against the original parquet ground truth. Staged once
    * per (dataset, name) per JVM: repeated invocations (bench min-of-2)
    * measure the operator under test, not the staging write; content is
    * deterministic, so a pre-existing dir from an earlier process is
    * simply rewritten on this JVM's first call. */
  private val stagedOnce =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def staged(d: String, name: String)(write: String => Unit): String = {
    val dir = "/tmp/graft_stage/" + d.replaceAll("[^A-Za-z0-9._-]", "_") + "/" + name
    // computeIfAbsent: the write runs exactly once, under the map's
    // per-key lock — two suites first-invoking the same key concurrently
    // must not race write(dir) against itself (a plain check-then-act
    // set was vulnerable to exactly that). A failed write propagates and
    // leaves no mapping, so the next invocation retries instead of
    // reading a half-written directory.
    stagedOnce.computeIfAbsent(dir, { _ => write(dir); dir })
  }

  /** The profile_calibration fixture + NB score pipeline, staged ONCE
    * per dataset as the (doc_id, p, y) score table both
    * profile_recalibrate and profile_auc read back — the expensive NB
    * scoring subtree runs one time, not once per consumer key
    * (measured: the two-pass form was 3.36 s steady vs
    * profile_calibration's one-pass 1.99 s). This is the production
    * shape too: score tables persist; at 100 TB the equivalent is a
    * checkpoint/staging write, never re-deriving the scores per
    * downstream reader. Parquet round-trips DECIMAL(12,6)/INT exactly,
    * so the staged values ARE the computed values. */
  private def recalScoresDir(s: SparkSession, d: String): String = {
    val toksB = split(col("text"), " ")
    val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
    val built = t(s, d, "documents").select(col("doc_id"),
      concat(
        array_join(transform(sequence(lit(0), nLines - 1),
          i => concat(
            array_join(slice(toksB, i * 8 + 1, lit(8)), " "),
            when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
          "\n"),
        when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
          .otherwise(lit("")),
        when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
        .as("text"))
    val labeled = TextOps.c4QualityFlags(built, "text")
      .select(col("doc_id"),
        when(col("keep") === 1, lit("keep")).otherwise(lit("drop"))
          .as("rule_label"))
    val model = nbCalibModel(s, d, ClassifyOps.nbFit(
      labeled.join(built, Seq("doc_id")), "text", "rule_label"))
    staged(d, "recal_scores") { dir =>
      val piv = ClassifyOps.nbScoreWith(built, "doc_id", "text", model)
        .groupBy(col("doc_id"))
        .agg(max(when(col("_label") === "keep", col("score"))).as("s_keep"),
          max(when(col("_label") === "drop", col("score"))).as("s_drop"),
          max(col("n_tokens")).as("n_tok"))
      piv.join(labeled, Seq("doc_id"))
        .select(col("doc_id"),
          (lit(1.0) / (lit(1.0) + exp(-(lit(8.0) *
            (col("s_keep") - col("s_drop")).cast(DoubleType) /
              col("n_tok").cast(DoubleType)))))
            .cast(DecimalType(12, 6)).as("p"),
          when(col("rule_label") === "keep", 1).otherwise(0).as("y"))
        .write.mode("overwrite").parquet(dir)
    }
  }

  /** The frozen BM25 retrieval index, staged ONCE per dataset (the
    * [[recalScoresDir]] pattern applied to search): the fitted model
    * (token → idf + stats row), the inverted-index postings
    * (doc, dl, token, tf), and the depth-30 batch ranking for the
    * union of every consumer's query set, keyed by the query TEXT.
    * Four keys serve off it (`search_eval_ndcg`, `search_eval_map`,
    * `search_prf_expand`, `search_rrf_hybrid`'s lexical branch) —
    * before this table each re-derived BM25 from raw text, ~8 s of
    * the sweep spent re-tokenizing the same corpus four times. The
    * oracles are UNTOUCHED: they still re-derive everything from raw
    * documents, so the staged values are independently refuted, not
    * assumed. At 100 TB this is the only sane shape: the index is
    * built in one pass and every retrieval consumer is a scan of it.
    * Parquet round-trips every staged type exactly (DOUBLE scores
    * bit-exact, DECIMAL(20,6) idf, LONG/INT/STRING), so serving off
    * the stage is a scan swap, not a semantic change. */
  private def bm25IndexDirs(s: SparkSession, d: String):
      (String, String, String) = {
    import s.implicits._
    val modelDir = staged(d, "bm25_model") { dir =>
      SearchOps.bm25Fit(t(s, d, "documents"), "doc_id", "text")
        .write.mode("overwrite").parquet(dir)
    }
    val postingsDir = staged(d, "bm25_postings") { dir =>
      SearchOps.bm25Postings(t(s, d, "documents"), "doc_id", "text")
        .write.mode("overwrite").parquet(dir)
    }
    val scoresDir = staged(d, "bm25_scores30") { dir =>
      val qs = Seq("dup hash join", "merge sort", "dup zebra", "dup hash")
        .toDF("qtext").select(col("qtext").as("q"), col("qtext"))
      SearchOps.bm25TopKBatchOnPostings(
          s.read.parquet(postingsDir), "doc_id",
          s.read.parquet(modelDir), qs, "q", "qtext", k = 30)
        .write.mode("overwrite").parquet(dir)
    }
    (modelDir, postingsDir, scoresDir)
  }

  /** The DuckDB restatement of [[recalScoresDir]]'s pipeline: the CTE
    * chain from raw documents through the built fixture, C4 rule
    * labels, NB fit/score, to `pd(doc_id, p, y)` — shared by the
    * oracles that consume the staged score table. (The calibration and
    * recalibrate oracles predate this val and keep their inline copies
    * — identical text, established hashes untouched.) */
  private val nbScorePdCtes: String =
    """WITH base AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |built AS (
      |  SELECT doc_id,
      |    array_to_string(
      |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
      |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
      |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
      |      chr(10))
      |    || CASE WHEN doc_id % 37 = 0
      |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
      |            ELSE '' END
      |    || CASE WHEN doc_id % 41 = 0
      |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
      |  FROM base),
      |lab AS MATERIALIZED (
      |  SELECT doc_id, text,
      |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
      |              AND NOT contains(text, '{')
      |              AND len(list_filter(string_split(text, chr(10)),
      |                l -> regexp_matches(trim(l), '[.!?"]$')
      |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
      |                  >= 3
      |         THEN 'keep' ELSE 'drop' END AS label
      |  FROM built),
      |toks0 AS (
      |  SELECT doc_id, label,
      |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
      |  FROM lab),
      |t AS MATERIALIZED (SELECT * FROM toks0 WHERE length(tok) > 0),
      |ct AS (SELECT label, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
      |tot AS MATERIALIZED (
      |  SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v FROM t),
      |lp AS (
      |  SELECT label, tok,
      |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
      |  FROM ct JOIN tot USING (label) CROSS JOIN v),
      |dflt AS (
      |  SELECT label,
      |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
      |  FROM tot CROSS JOIN v),
      |prior AS (
      |  SELECT label,
      |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lab))
      |      AS DECIMAL(20,6)) AS prior
      |  FROM lab GROUP BY 1),
      |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
      |scored AS (
      |  SELECT dt.doc_id, c.label, p.prior,
      |    sum(dt.cnt) AS n_tok,
      |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
      |  FROM dt
      |  CROSS JOIN (SELECT label FROM tot) c
      |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
      |  JOIN dflt f ON f.label = c.label
      |  JOIN prior p ON p.label = c.label
      |  GROUP BY dt.doc_id, c.label, p.prior),
      |piv AS (
      |  SELECT doc_id,
      |    max(CASE WHEN label = 'keep' THEN prior + ll END) AS s_keep,
      |    max(CASE WHEN label = 'drop' THEN prior + ll END) AS s_drop,
      |    max(n_tok) AS n_tok
      |  FROM scored GROUP BY doc_id),
      |pd AS (
      |  SELECT pv.doc_id,
      |    CAST(1.0 / (1.0 + exp(-(8.0 *
      |      CAST(CAST(pv.s_keep - pv.s_drop AS VARCHAR) AS DOUBLE)
      |        / CAST(pv.n_tok AS DOUBLE)))) AS DECIMAL(12,6)) AS p,
      |    CASE WHEN l.label = 'keep' THEN 1 ELSE 0 END AS y
      |  FROM piv pv JOIN lab l USING (doc_id))""".stripMargin

  /** Total parquet row groups across a file-or-directory table path —
    * the DRIVER-SIDE metadata probe (footers only, no data read; the
    * same read a lakehouse table format does for stats) behind
    * fixture-degeneracy gates like profile_corr's: row groups are the
    * real unit of scan parallelism for parquet, which partition COUNT
    * overstates when one row group spans several byte-range splits.
    * Non-parquet/unreadable paths return Int.MaxValue (treat as
    * "plenty of parallelism" — never force a shuffle on a probe
    * failure). */
  private def parquetRowGroupCount(s: SparkSession, path: String): Int =
    try {
      val conf = s.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.filter(f =>
            f.isFile && f.getPath.getName.endsWith(".parquet"))
        else Seq(fs.getFileStatus(p))
      files.map { f =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try rd.getRowGroups.size finally rd.close()
      }.sum
    } catch { case scala.util.control.NonFatal(_) => Int.MaxValue }

  /** Order-insensitive exact sum of a double column: decimal accumulate,
    * double result. Deterministic under any partitioning / AQE re-plan —
    * the property that makes the same query hash-stable on a 1000-executor
    * cluster and in single-threaded DuckDB.
    */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)
  private def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  // ---------------------------------------------------------------- specs

  val specs: Map[String, QuerySpec] = Map(

    // ------------------------------------------------------ aggregations
    // Q1 semantics (reference README.md:778-783): group, avg, order.
    "agg_avg_group" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("l_quantity")).as("sum_qty"),
            (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Q2 semantics (README.md:790-796): two-column group + top-k.
    "agg_avg_group2_topk" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"), month(col("l_shipdate")).as("ship_month"))
          .agg((dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"))
          .orderBy(col("avg_price").desc, col("l_returnflag"), col("ship_month"))
          .limit(10)
      },
      Some("""SELECT l_returnflag, CAST(month(l_shipdate) AS INTEGER) AS ship_month,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price
             |FROM lineitem GROUP BY 1, 2
             |ORDER BY avg_price DESC, l_returnflag, ship_month LIMIT 10""".stripMargin)),

    // Q3 semantics (README.md:803-809): filtered single-group avg.
    "agg_avg_filtered" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .groupBy(month(col("l_shipdate")).as("ship_month"))
          .agg((dsum6(col("l_discount")) / count(lit(1))).as("avg_discount"))
          .orderBy(col("ship_month"))
      },
      Some("""SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_discount
             |FROM lineitem WHERE l_returnflag = 'R'
             |GROUP BY 1 ORDER BY ship_month""".stripMargin)),

    "agg_count" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .agg(count(lit(1)).as("cnt"), countDistinct(col("l_orderkey")).as("n_orders")),
      Some("SELECT count(*) AS cnt, count(DISTINCT l_orderkey) AS n_orders FROM lineitem")),

    "agg_distinct" -> QuerySpec(
      (s, d) => t(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"))
        .distinct()
        .orderBy(col("c_nationkey"), col("c_mktsegment")),
      Some("""SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    "agg_rollup" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    "agg_cube" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Explicit GROUPING SETS (the general form rollup/cube specialize):
    // per-flag, per-status, and grand-total rows in one pass.
    "agg_grouping_sets" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_gs")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
                |FROM li_gs
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Entry point A (SURVEY.md §3.1): SQL text → parser → analyzer over a
    // registered view — the reference's Athena path. Same decimal-sum
    // discipline inside SQL.
    "sql_entry_q1" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem_sql")
        s.sql("""SELECT l_returnflag,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
                |FROM lineitem_sql GROUP BY l_returnflag
                |ORDER BY avg_qty DESC, l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY avg_qty DESC, l_returnflag""".stripMargin)),

    // Correlated scalar subquery (SQL analyzer surface): Catalyst rewrites
    // it to an aggregate + left outer join (RewriteCorrelatedScalarSubquery)
    // — the declarative form of a per-row lookup loop.
    "sql_scalar_subquery" -> QuerySpec(
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("cust_sq")
        t(s, d, "orders").createOrReplaceTempView("ord_sq")
        s.sql("""SELECT c_custkey, c_name,
                |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                |   FROM ord_sq o WHERE o.o_custkey = c.c_custkey) AS total_spend
                |FROM cust_sq c
                |WHERE c_acctbal > 7000
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name,
             |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             |   FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spend
             |FROM customer c
             |WHERE c_acctbal > 7000
             |ORDER BY c_custkey""".stripMargin)),

    // LATERAL correlated derived table (SQL analyzer surface): per
    // nation the top-2 customers by balance, stated as a lateral
    // subquery with ORDER BY + LIMIT — the SQL spelling of the top-k
    // per key pattern. Catalyst decorrelates it (DecorrelateInnerQuery
    // rewrites the correlated limit to a partitioned rank filter +
    // equi-join), so the declarative per-row loop never executes as
    // one: the plan is the same shuffle the DataFrame window form
    // produces. DuckDB runs the identical LATERAL clause natively.
    "sql_lateral_join" -> QuerySpec(
      (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("nation_lat")
        t(s, d, "customer").createOrReplaceTempView("customer_lat")
        s.sql("""SELECT n.n_name, c.c_name, c.c_acctbal
                |FROM nation_lat n,
                |LATERAL (SELECT c_name, c_acctbal FROM customer_lat
                |         WHERE c_nationkey = n.n_nationkey
                |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
                |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)
      },
      Some("""SELECT n.n_name, c.c_name, c.c_acctbal
             |FROM nation n,
             |LATERAL (SELECT c_name, c_acctbal FROM customer
             |         WHERE c_nationkey = n.n_nationkey
             |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
             |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)),

    // RECURSIVE CTE run natively by Spark (4.x) — until now WITH
    // RECURSIVE appeared only in this catalog's DuckDB oracles while
    // the Spark side unrolled iterations (graph_pagerank) or looped
    // with checkpoints (connectedComponents). This key states bounded
    // BFS reachability ONCE and runs the same text on both engines:
    // min-depth per (seed, node) over a deterministic 2-out-regular
    // edge list, depth ≤ 3. UNION ALL + depth guard keeps the
    // recursion finite with identical semantics everywhere; the final
    // min(depth) aggregate sits OUTSIDE the recursion (aggregates over
    // the recursive relation are the non-portable part). The iterative
    // operators keep their loop forms for scale (per-iteration
    // checkpoint barriers — GraphOps' seam — are not expressible
    // inside a recursive CTE), but the surface itself is now covered.
    "sql_recursive_cte" -> QuerySpec(
      (s, d) => {
        t(s, d, "documents").createOrReplaceTempView("docs_rec")
        s.sql(recursiveBfsSql("docs_rec"))
      },
      Some(recursiveBfsSql("documents"))),

    // Native MERGE INTO (round 11): the SQL statement a lakehouse user
    // types for the upsert the reference implements imperatively
    // (README.md:1517-1529's NOT-EXISTS insert is exactly
    // WHEN NOT MATCHED THEN INSERT). Target = a graft.sources
    // MergeableCatalog DSv2 table (SupportsRowLevelOperations +
    // SupportsDelta), so RewriteMergeIntoTable plans a native
    // WriteDelta of per-row actions — NOT a full-table overwrite
    // (plan-asserted in MergeIntoSpec, with UPDATE/DELETE statements
    // covered there too). Seed = even orderkeys; source = every third
    // orderkey with doubled price (updates where even∧div3, inserts
    // where odd∧div3). Deterministic: the key drops + recreates +
    // reseeds the target on every invocation.
    "sql_merge_into" -> QuerySpec(
      (s, d) => {
        s.conf.set("spark.sql.catalog.graftcat",
          "graft.sources.MergeableCatalog")
        s.sql("DROP TABLE IF EXISTS graftcat.merge_target")
        s.sql("""CREATE TABLE graftcat.merge_target (
                |  o_orderkey BIGINT NOT NULL, o_custkey BIGINT,
                |  o_totalprice DOUBLE, o_orderstatus STRING)
                |TBLPROPERTIES('rowid'='o_orderkey')""".stripMargin)
        t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
          .writeTo("graftcat.merge_target").append()
        t(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            (col("o_totalprice") * 2).as("o_totalprice"),
            lit("U").as("o_orderstatus"))
          .createOrReplaceTempView("graft_merge_src")
        s.sql("""MERGE INTO graftcat.merge_target t
                |USING graft_merge_src s ON t.o_orderkey = s.o_orderkey
                |WHEN MATCHED THEN UPDATE SET
                |  o_totalprice = s.o_totalprice,
                |  o_orderstatus = s.o_orderstatus
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        s.table("graftcat.merge_target").orderBy(col("o_orderkey"))
      },
      Some("""WITH tgt AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 2 = 0),
             |src AS (
             |  SELECT o_orderkey, o_custkey,
             |    o_totalprice * 2 AS o_totalprice, 'U' AS o_orderstatus
             |  FROM orders WHERE o_orderkey % 3 = 0)
             |SELECT t.o_orderkey, t.o_custkey,
             |  CASE WHEN s.o_orderkey IS NOT NULL
             |    THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
             |  CASE WHEN s.o_orderkey IS NOT NULL
             |    THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus
             |FROM tgt t LEFT JOIN src s ON s.o_orderkey = t.o_orderkey
             |UNION ALL
             |SELECT s.o_orderkey, s.o_custkey, s.o_totalprice, s.o_orderstatus
             |FROM src s
             |WHERE NOT EXISTS (SELECT 1 FROM tgt t
             |                  WHERE t.o_orderkey = s.o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // UPDATE and DELETE statements over the same row-level DSv2 surface
    // (sql_merge_into's MergeableCatalog): both rewrite to per-row
    // WriteDelta actions — only matching rows travel to the writer.
    // One key exercises both statements in sequence on a freshly seeded
    // target; deterministic per invocation (drop + recreate + reseed).
    "sql_update_delete" -> QuerySpec(
      (s, d) => {
        s.conf.set("spark.sql.catalog.graftcat",
          "graft.sources.MergeableCatalog")
        s.sql("DROP TABLE IF EXISTS graftcat.upd_target")
        s.sql("""CREATE TABLE graftcat.upd_target (
                |  o_orderkey BIGINT NOT NULL, o_custkey BIGINT,
                |  o_totalprice DOUBLE, o_orderstatus STRING)
                |TBLPROPERTIES('rowid'='o_orderkey')""".stripMargin)
        t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
          .writeTo("graftcat.upd_target").append()
        s.sql("""UPDATE graftcat.upd_target
                |SET o_totalprice = o_totalprice + 100.0,
                |    o_orderstatus = 'U'
                |WHERE o_custkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftcat.upd_target WHERE o_orderstatus = 'F'")
        s.table("graftcat.upd_target").orderBy(col("o_orderkey"))
      },
      Some("""WITH seeded AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 2 = 0),
             |updated AS (
             |  SELECT o_orderkey, o_custkey,
             |    CASE WHEN o_custkey % 5 = 0
             |      THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice,
             |    CASE WHEN o_custkey % 5 = 0
             |      THEN 'U' ELSE o_orderstatus END AS o_orderstatus
             |  FROM seeded)
             |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |FROM updated WHERE o_orderstatus <> 'F'
             |ORDER BY o_orderkey""".stripMargin)),

    // INSERT OVERWRITE over the same DSv2 surface: the third write
    // statement the MergeableCatalog advertises (TableCapability
    // .TRUNCATE) — Spark plans it as truncate-then-append through
    // SupportsTruncate, with the truncation deferred to COMMIT (a
    // failed overwrite leaves the old rows). Seed = even orderkeys,
    // overwrite = every third orderkey with a flag status; the read
    // back must show ONLY the overwrite rows — any surviving seeded
    // even-key row means truncate() never reached the writer.
    "sql_insert_overwrite" -> QuerySpec(
      (s, d) => {
        s.conf.set("spark.sql.catalog.graftcat",
          "graft.sources.MergeableCatalog")
        s.sql("DROP TABLE IF EXISTS graftcat.ovw_target")
        s.sql("""CREATE TABLE graftcat.ovw_target (
                |  o_orderkey BIGINT NOT NULL, o_custkey BIGINT,
                |  o_totalprice DOUBLE, o_orderstatus STRING)
                |TBLPROPERTIES('rowid'='o_orderkey')""".stripMargin)
        t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
          .writeTo("graftcat.ovw_target").append()
        t(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), lit("O").as("o_orderstatus"))
          .createOrReplaceTempView("graft_ovw_src")
        s.sql("""INSERT OVERWRITE graftcat.ovw_target
                |SELECT * FROM graft_ovw_src""".stripMargin)
        s.table("graftcat.ovw_target").orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             |  'O' AS o_orderstatus
             |FROM orders WHERE o_orderkey % 3 = 0
             |ORDER BY o_orderkey""".stripMargin)),

    // Pivot (conditional aggregation surface): events per user × type.
    "agg_pivot" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  count(*) FILTER (WHERE event_type = 'click') AS click,
             |  count(*) FILTER (WHERE event_type = 'error') AS error,
             |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
             |  count(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // SQL PIVOT clause (agg_pivot's DataFrame twin through the PARSER
    // surface): one Spark SQL statement with an explicit IN list —
    // Catalyst rewrites it to the same pivot aggregate the DataFrame
    // API plans; the oracle restates with FILTER aggregates. Sums ride
    // the DECIMAL(18,6) accumulator (the no-raw-double-sums rule).
    "sql_pivot_clause" -> QuerySpec(
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("graft_pivot_ev")
        s.sql(
          """SELECT * FROM (
            |  SELECT user_id % 100 AS cohort, event_type,
            |    CAST(value AS DECIMAL(18,6)) AS v
            |  FROM graft_pivot_ev)
            |PIVOT (CAST(SUM(v) AS DOUBLE)
            |  FOR event_type IN ('click' AS click, 'purchase' AS purchase,
            |                     'view' AS view))
            |ORDER BY cohort""".stripMargin)
      },
      Some("""SELECT user_id % 100 AS cohort,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
             |    FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
             |    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
             |    FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
             |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin)),

    // GROUP BY ALL (SQL surface): the analyzer infers the grouping set
    // from the non-aggregate select items — the spelling analysts
    // actually type against wide tables. Identical text runs on both
    // engines; the plan is the same partial-agg + exchange as the
    // explicit GROUP BY.
    "sql_group_by_all" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_gba")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                |  COUNT(*) AS n
                |FROM li_gba GROUP BY ALL
                |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY ALL
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // SQL-defined scalar function (Spark 4 SQL UDF surface): CREATE
    // TEMPORARY FUNCTION ... RETURN <expr> — the catalog-resident
    // business-logic spelling. The body is pure SQL, so the analyzer
    // INLINES it into the plan (no black-box UDF, codegen intact —
    // .explain shows plain arithmetic, the opposite of a Scala UDF);
    // the oracle states the inlined expression directly.
    "sql_udf_scalar" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_udf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
                |  p DOUBLE, disc DOUBLE) RETURNS DOUBLE
                |RETURN p * (1.0 - disc)""".stripMargin)
        s.sql("""SELECT l_returnflag,
                |  CAST(SUM(CAST(graft_disc_price(l_extendedprice, l_discount)
                |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
                |FROM li_udf GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Session variables + EXECUTE IMMEDIATE (Spark 4 scripting
    // surface): DECLARE a typed session variable, SET it, and bind it
    // as a ? parameter of a dynamically-composed statement — the
    // orchestration idiom (thresholds/table names resolved at run
    // time) stated natively instead of via string interpolation in the
    // driver. The oracle inlines the bound value.
    // SQL pipe syntax (Spark 4.1 `|>` operators, round 13): the
    // linear-dataflow spelling of filter → derive → aggregate →
    // project → order — each stage reads top-to-bottom the way the
    // plan executes, instead of SQL's inside-out nesting. Parses to
    // the SAME logical plan as the nested form (the probe plan is one
    // scan → partial/final agg → sort); DuckDB restates it as plain
    // ANSI. Revenue stays exact DECIMAL end-to-end (the (18,4)×(19,4)
    // product is DECIMAL(38,8) with no scale loss) so the sum is
    // order-independent.
    "sql_pipe_syntax" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_pipe")
        s.sql("""FROM li_pipe
                ||> WHERE l_quantity > 10
                ||> EXTEND CAST(l_extendedprice AS DECIMAL(18,4))
                |     * (1 - CAST(l_discount AS DECIMAL(18,4))) AS revenue
                ||> AGGREGATE COUNT(*) AS n,
                |     CAST(SUM(revenue) AS DECIMAL(18,4)) AS total_revenue
                |   GROUP BY l_returnflag, l_linestatus
                ||> SELECT l_returnflag, l_linestatus, n, total_revenue
                ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             |    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4))
             |    AS total_revenue
             |FROM lineitem WHERE l_quantity > 10
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TABLESAMPLE, the oracle-able spelling (round 13): engine-native
    // BERNOULLI sampling draws from engine-specific RNG streams — the
    // same query on Spark and DuckDB keeps DIFFERENT rows, so the
    // cross-engine key states the Bernoulli draw explicitly with the
    // portable 31-bit LCG (SampleOps.portableUniform's integer
    // arithmetic, evaluable bit-identically by any engine) as a WHERE
    // predicate: keep ⇔ lcg(o_orderkey) < p·2³¹. Exact for
    // |key·a| < 2⁶³ (keys to ~8.3e9). The NATIVE clause — TABLESAMPLE
    // (50 PERCENT) REPEATABLE(seed) — is unit-covered in
    // EngineSurfaceSpec (bounds + seed determinism + Sample node).
    // Round-15 hardening (3rd-gate driver red): the key's POINT is the
    // portable Bernoulli predicate (the sampling lever the reference
    // pulls for scan reduction, README.md:801), so every
    // engine-discretionary surface is gone from the payload:
    //  - the threshold is the inlined integer literal 322122547
    //    (= floor(0.15 * 2^31)), removing the decimal-literal binding
    //    path (`CAST(0.15 * 2147483648 AS BIGINT)`) — the exact class
    //    the profile_power trap pinned (engines may bind `0.15` as
    //    DECIMAL or DOUBLE with different multiply/round semantics);
    //  - the price payload is exact-integer BIGINT (SUM(o_orderkey), a
    //    value-set fingerprint of the kept rows) — no double→DECIMAL
    //    quantizing cast anywhere, on either engine.
    // NOTE rows_match is VACUOUS for this key: o_orderpriority has
    // exactly 5 values, so both engines emit 5 rows under ANY predicate
    // divergence; only the integer payloads settle it.
    "sql_tablesample_portable" -> QuerySpec(
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("ord_ts")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
                |  SUM(CAST(o_orderkey AS BIGINT)) AS sum_okey
                |FROM ord_ts
                |WHERE (o_orderkey * 1103515245 + 12345) % 2147483648
                |      < 322122547
                |GROUP BY o_orderpriority
                |ORDER BY o_orderpriority""".stripMargin)
      },
      // Oracle: identical text modulo DuckDB's SUM(BIGINT)→HUGEINT
      // widening, bridged back with an outer CAST (the
      // sql_distribute_cluster pattern that greened that key).
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS sum_okey
             |FROM orders
             |WHERE (o_orderkey * 1103515245 + 12345) % 2147483648
             |      < 322122547
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // DISTRIBUTE BY / CLUSTER BY (round 13): the SQL spelling of
    // repartition-before-consume. The POINT is the plan, not the rows
    // (the clauses never change values — the oracle is the bare
    // aggregate): CLUSTER BY's hashpartitioning exchange SATISFIES the
    // downstream aggregation's distribution requirement, so the agg
    // plans partial+final over the SAME exchange — exactly one hash
    // exchange in the plan (probed; EngineSurfaceSpec asserts it, plus
    // the DISTRIBUTE BY + SORT BY partition-local sort shape). That
    // pre-shuffle reuse is the production pattern for feeding several
    // same-keyed consumers one exchange.
    "sql_distribute_cluster" -> QuerySpec(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_dc")
        // l_quantity is integer-valued: sum as BIGINT — exact in both
        // engines, no quantizing double->decimal cast anywhere (the
        // r13 driver-red root cause; see the tablesample oracle note).
        s.sql("""SELECT l_returnflag, COUNT(*) AS n,
                |  SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
                |FROM (SELECT * FROM li_dc CLUSTER BY l_returnflag)
                |GROUP BY l_returnflag
                |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    "sql_session_variable" -> QuerySpec(
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("cust_var")
        s.sql("DECLARE OR REPLACE VARIABLE graft_bal_floor DOUBLE DEFAULT 7000.0")
        s.sql("SET VAR graft_bal_floor = 8000.0")
        s.sql("""EXECUTE IMMEDIATE
                |  'SELECT c_custkey, c_name, c_acctbal FROM cust_var
                |   WHERE c_acctbal > ? ORDER BY c_custkey'
                |  USING graft_bal_floor""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE c_acctbal > 8000.0 ORDER BY c_custkey""".stripMargin)),

    // SQL-defined TABLE function (Spark 4): CREATE FUNCTION ... RETURNS
    // TABLE(...) — the parameterized-view spelling; invoked CORRELATED
    // through LATERAL, so the analyzer inlines the body and
    // decorrelates the parameter equality to a plain equi-join — never
    // a per-row loop. The body is a pure correlated filter: a
    // correlated ORDER BY+LIMIT body does NOT decorrelate per-caller
    // today (measured: the limit escapes the correlation and applies
    // once, globally — 3 rows instead of per-nation top-3), so top-k
    // per key through a TVF stays out; sql_lateral_join covers that
    // shape with an inline LATERAL subquery, where the rewrite IS
    // correct. DuckDB restates the inlined join directly.
    "sql_udf_table" -> QuerySpec(
      (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("nat_tvf")
        t(s, d, "customer").createOrReplaceTempView("cust_tvf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_rich_customers(
                |  nk BIGINT, floor_bal DOUBLE)
                |RETURNS TABLE(c_name STRING, c_acctbal DOUBLE)
                |RETURN SELECT c_name, c_acctbal FROM cust_tvf
                |       WHERE c_nationkey = nk AND c_acctbal > floor_bal""".stripMargin)
        s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
                |FROM nat_tvf n,
                |LATERAL graft_rich_customers(n.n_nationkey, 8000.0) t
                |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
      },
      Some("""SELECT n.n_name, c.c_name, c.c_acctbal
             |FROM nation n JOIN customer c
             |  ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 8000.0
             |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)),

    // Error-safe TRY_* arithmetic (the ANSI-mode companion surface: the
    // engine runs ANSI, where bare division-by-zero/overflow ABORT a
    // 100 TB job at task 9,999 of 10,000 — try_ variants turn the
    // poison row into a NULL the pipeline can quarantine). The oracle
    // restates each as its guard: NULLIF denominators, range CASEs.
    "fn_try_arithmetic" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(l_extendedprice, l_linenumber - 1)").as("div_maybe"),
          expr("try_multiply(l_orderkey, 9000000000000000000L)").as("mul_over"),
          expr("try_add(l_quantity, l_discount)").as("add_ok"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice / NULLIF(l_linenumber - 1, 0) AS div_maybe,
             |  CASE WHEN l_orderkey = 0 THEN CAST(0 AS BIGINT)
             |       WHEN l_orderkey <= 1 THEN CAST(l_orderkey * 9000000000000000000 AS BIGINT)
             |  END AS mul_over,
             |  l_quantity + l_discount AS add_ok
             |FROM lineitem WHERE l_orderkey < 200
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Exact percentile (sort + linear interpolation in both engines).
    "fn_percentile" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.9) AS p90_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // HLL++ sketch — approximate by construction, so no DuckDB hash oracle;
    // bounded-error property is unit-tested (AggregatesSpec).
    "agg_approx_distinct" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy(col("l_returnflag")),
      None),

    // ------------------------------------------- sources/sinks (oracled)
    // JSON scan round-trip: documents staged as JSON by a real writer,
    // read back through the JSON source with an EXPLICIT schema (inference
    // reads every file twice at scale — SURVEY §2.1). Any reader mangling
    // (escaping, unicode, schema drift) breaks the hash against the
    // parquet ground truth; the zh docs make it a real UTF-8 test.
    "scan_json" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_json") { p =>
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("source"), col("text"))
            .write.mode("overwrite").json(p)
        }
        val schema = new StructType()
          .add("doc_id", LongType).add("lang", StringType)
          .add("source", StringType).add("text", StringType)
        s.read.schema(schema).json(dir)
          .select(col("doc_id"), col("lang"), col("source"),
            length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, CAST(length(text) AS INTEGER) AS text_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // File-path metadata extraction: documents staged as a
    // lang=…/source=… directory tree; the values are recovered ONLY from
    // file paths (input_file_name + regex — the reference's island/
    // location extraction, README.md:622-623), never read from the rows.
    "scan_filemeta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_filemeta") { p =>
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("source"))
            .write.mode("overwrite").partitionBy("lang", "source").json(p)
        }
        val raw = s.read.schema(new StructType().add("doc_id", LongType)).json(dir)
          .select(col("doc_id")) // drop discovered partition cols: path-only recovery
        Readers.withPathMeta(raw,
          islandPattern = "^.*/lang=([^/]+)/[^/]+/[^/]+$",
          locationPattern = "^.*/source=([^/]+)/[^/]+$")
          .groupBy(col("island").as("lang"), col("location_name").as("source"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT lang, source, count(*) AS cnt FROM documents
             |GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // Partitioned parquet sink through the ACTUAL writer (dynamic
    // overwrite path), verified by re-reading and aggregating.
    "sink_parquet_partitioned" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "sink_parquet_partitioned") { p =>
          Upsert.writePartitioned(
            t(s, d, "orders")
              .withColumn("o_year", year(col("o_orderdate").cast(DateType))),
            p, Seq("o_year"))
        }
        s.read.parquet(dir)
          .groupBy(col("o_year"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS cnt,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin)),

    // JSONL corpus export through the ACTUAL writer (hive-partitioned
    // gzip shards, bounded shard count), verified at the STRONGEST
    // grain: the Spark side returns the SOURCE rows while DuckDB
    // parses the written shards themselves — gzip, JSON escaping, and
    // hive layout included — so a hash match proves the export is
    // byte-faithful AND foreign-engine-readable, not merely
    // Spark-round-trippable.
    "sink_jsonl_export" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        staged(d, "sink_jsonl_export") { p =>
          Upsert.exportJsonl(
            docs.select(col("doc_id"), col("lang"), col("source"),
              col("n_chars"), col("text")),
            p, Seq("lang"), shardCol = "doc_id", shardsPerPartition = 2)
        }
        docs.select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, n_chars, text
             |FROM read_json(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/sink_jsonl_export/*/*.json.gz',
             |  format='newline_delimited', hive_partitioning=1)
             |ORDER BY doc_id""".stripMargin)),

    // CSV corpus export through the ACTUAL writer, adversarially:
    // every row carries an embedded delimiter, double quote, newline
    // and leading space (deterministically injected — the fixture text
    // is too clean to exercise quoting), written RFC-4180 style
    // (escape = doubled quote, the dialect every foreign reader
    // speaks; Spark's default backslash escape is Spark-only). The
    // Spark side returns the SOURCE rows; DuckDB parses the written
    // shards — a hash match proves quoting, escaping, and quoted
    // newlines survive a foreign reader, not merely a Spark re-read.
    "sink_csv_export" -> QuerySpec(
      (s, d) => {
        val adversarial = (base: Column) => concat(
          lit(" lead,"), substring(base, 1, 30),
          lit(" \"quoted\" mid\nnext line, tail"))
        val docs = t(s, d, "documents").select(
          col("doc_id"), col("lang"), adversarial(col("text")).as("txt"))
        staged(d, "sink_csv_export") { p =>
          docs.coalesce(2).write
            .option("header", "true")
            .option("escape", "\"")
            // MEASURED: the WRITER defaults both of these to true and
            // silently trims field whitespace on the way out — a
            // lossy export unless disabled (the reader's same-named
            // options are a separate, read-side pair)
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .mode("overwrite").csv(p)
        }
        docs.orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, txt
             |FROM read_csv(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/sink_csv_export/*.csv',
             |  header=true, quote='"', escape='"', delim=',',
             |  columns={'doc_id':'BIGINT','lang':'VARCHAR','txt':'VARCHAR'})
             |ORDER BY doc_id""".stripMargin)),

    // MERGE through the ACTUAL on-disk path (write target → upsertIntoPath
    // → re-read): the agg_after_upsert key proves the merge algebra, this
    // one proves the dynamic-overwrite writer applies it durably.
    "sink_upsert" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "sink_upsert") { p =>
          val orders = t(s, d, "orders")
          Upsert.writePartitioned(orders, p, Seq("o_orderstatus"))
          val batch = orders
            .filter(col("o_orderdate") >= lit("1998-01-01").cast(TimestampType))
            .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
          Upsert.upsertIntoPath(s, p, batch, Seq("o_orderkey"), Seq("o_orderstatus"))
        }
        s.read.parquet(dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |  CAST(SUM(CAST(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
             |                     THEN o_totalprice * 1.1 ELSE o_totalprice END
             |           AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Empty-table bootstrap (reference README.md:1266-1282) + first load:
    // union against the typed empty frame must be a no-op on the result.
    "scan_empty_bootstrap" -> QuerySpec(
      (s, d) => {
        val orders = t(s, d, "orders")
        Readers.emptyBootstrap(s, orders.schema)
          .unionByName(orders.filter(col("o_orderstatus") === "F"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt FROM orders
             |WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // Persistent-catalog round trip (the reference's crawler + catalog
    // table, README.md:762-780): register an external partitioned table,
    // then make an OUT-OF-BAND partition directory (written past the
    // catalog) visible via MSCK REPAIR TABLE. Without the repair the
    // purchase partition is missing and the hash fails — the oracle
    // checks the crawler semantics, not just the read.
    "catalog_msck_repair" -> QuerySpec(
      (s, d) => {
        val tbl = "graft_ext_events"
        val dir = staged(d, "catalog_msck") { p =>
          val events = t(s, d, "events")
          events.filter(col("event_type") =!= "purchase")
            .write.mode("overwrite").partitionBy("event_type").parquet(p)
          // the crawler scenario: a partition written directly into the
          // table location, bypassing any catalog-aware writer
          events.filter(col("event_type") === "purchase").drop("event_type")
            .write.mode("overwrite").parquet(s"$p/event_type=purchase")
        }
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.sql(
          s"""CREATE TABLE $tbl (
             |  event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
             |  value DOUBLE, props STRING, event_type STRING)
             |USING PARQUET PARTITIONED BY (event_type) LOCATION '$dir'""".stripMargin)
        s.sql(s"MSCK REPAIR TABLE $tbl")
        s.table(tbl)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum6(col("value")).as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // CSV round-trip through the real writer/reader (header + explicit
    // schema; no timestamp column — CSV date/time formats are a config
    // surface, exercised in SourcesSpec). Doubles survive because both
    // engines print shortest-round-trip representations.
    "scan_csv" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_csv") { p =>
          t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderpriority"))
            .write.mode("overwrite").option("header", "true").csv(p)
        }
        val schema = new StructType()
          .add("o_orderkey", LongType).add("o_orderstatus", StringType)
          .add("o_totalprice", DoubleType).add("o_orderpriority", StringType)
        s.read.schema(schema).option("header", "true").csv(dir)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ORC round-trip: the columnar alternative sink/source, with the
    // aggregate running over the re-read copy (pushdown asserted in
    // SourcesSpec).
    "scan_orc" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_orc") { p =>
          t(s, d, "lineitem")
            .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
            .write.mode("overwrite").orc(p)
        }
        s.read.orc(dir)
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem WHERE l_returnflag = 'R'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Native XML round-trip (Spark 4 ships the former spark-xml as a
    // built-in source): stage the supplier table as element-per-row
    // XML, read it back with an EXPLICIT schema (inference is a
    // whole-extra-pass anti-pattern at 100 TB, same rule as the JSON
    // scans). DuckDB cannot parse XML, so the oracle recomputes the
    // expected rows from the ORIGINAL parquet — equality proves the
    // write+read round trip (escaping included) is value-faithful,
    // the sink_jsonl_export verification grain minus foreign
    // readability. Decimals surface as DOUBLE on both sides (the
    // presentation convention).
    "scan_xml" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_xml") { p =>
          t(s, d, "supplier")
            .select(col("s_suppkey").cast(LongType).as("s_suppkey"),
              col("s_name"), col("s_nationkey").cast(LongType).as("s_nationkey"),
              col("s_acctbal").cast(DoubleType).as("s_acctbal"))
            .write.mode("overwrite")
            .option("rootTag", "suppliers").option("rowTag", "supplier")
            .format("xml").save(p)
        }
        s.read
          .schema("s_suppkey LONG, s_name STRING, s_nationkey LONG, s_acctbal DOUBLE")
          .option("rowTag", "supplier").format("xml").load(dir)
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
             |  CAST(s_nationkey AS BIGINT) AS s_nationkey,
             |  CAST(s_acctbal AS DOUBLE) AS s_acctbal
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // Schema evolution on read: two parquet generations in one table
    // directory — the old files lack o_orderstatus (an added column, the
    // reference's defensive runtime-column-discovery concern,
    // README.md:1248-1282, handled declaratively). mergeSchema=true
    // unions the footers; old rows surface NULL for the new column. The
    // oracle restates the generation split with an explicit NULL.
    "scan_merge_schema" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_merge_schema") { p =>
          val orders = t(s, d, "orders")
          orders.filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey"), col("o_totalprice"))
            .write.mode("overwrite").parquet(p)
          orders.filter(col("o_orderkey") % 2 === 1)
            .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
            .write.mode("append").parquet(p)
        }
        s.read.option("mergeSchema", "true").parquet(dir)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  CAST(NULL AS VARCHAR) AS o_orderstatus
             |FROM orders WHERE o_orderkey % 2 = 0
             |UNION ALL
             |SELECT o_orderkey, o_totalprice, o_orderstatus
             |FROM orders WHERE o_orderkey % 2 = 1
             |ORDER BY o_orderkey""".stripMargin)),

    // MERGEABLE HLL sketches with explicit union — the 100 TB distinct
    // counting pattern made visible: every shard/group builds its own
    // DataSketches HLL, and a CENTRAL UNION of the sketch BYTES answers
    // the global question without ever re-touching the rows (the shape
    // approx_count_distinct hides inside its partial aggregation, here
    // exercised as first-class sketch columns the way a lakehouse
    // stores per-partition sketches beside the data). Keys may overlap
    // across groups, so the union is NOT a sum of per-group counts —
    // exactly what sketch merging is for. Estimates are
    // engine/impl-specific ⇒ rows-only, but per-row the estimate is a
    // CHECKED bound: |est − exact|/exact ≤ 5% (lgK=12's RSE is ~1.6%,
    // so the floor has 3σ margin), asserted for every group AND the
    // union row in-query.
    "agg_hll_merge" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        // perGroup feeds BOTH the per-group rows and the union input,
        // so the lineitem sketch aggregation runs twice (r9 advice
        // noted it). MEASURED: a localCheckpoint barrier here benched
        // 2.28 s vs 0.16 s without — the eager materialization costs
        // 14× the re-aggregation it saves at this size — so the
        // recompute stays (re-evaluate only if the input scan, not the
        // barrier, ever dominates)
        val perGroup = li.groupBy(col("l_returnflag").as("grp"))
          .agg(hll_sketch_agg(col("l_orderkey"), lit(12)).as("_sk"),
            countDistinct(col("l_orderkey")).as("exact"))
        val globalRow = perGroup
          .agg(hll_union_agg(col("_sk"), lit(true)).as("_sk"))
          .crossJoin(broadcast(
            li.agg(countDistinct(col("l_orderkey")).as("exact"))))
          .select(lit("ALL").as("grp"), col("_sk"), col("exact"))
        perGroup.select(col("grp"), col("_sk"), col("exact"))
          .unionByName(globalRow)
          .withColumn("est", hll_sketch_estimate(col("_sk")))
          .withColumn("rel_err",
            round(abs(col("est") - col("exact")).cast(DoubleType) /
              col("exact"), 4))
          .withColumn("err_bound", lit(0.05))
          .withColumn("within_bound",
            (col("rel_err") <= col("err_bound")).cast(IntegerType))
          .select(col("grp"), col("exact"), col("est"), col("rel_err"),
            col("err_bound"), col("within_bound"))
          .orderBy(col("grp"))
      },
      None,
      allowBnlj = true),

    // MERGEABLE KLL quantile sketches (graft.expressions.KllSketchAgg —
    // the repo's TypedImperativeAggregate UDAF surface): the quantile
    // companion to agg_hll_merge. Every group aggregates its own KLL
    // sketch of extendedprice; the global row is a CENTRAL UNION of the
    // sketch BYTES (kll_union_agg) — rows never re-touched, the exact
    // per-shard-percentile question `percentile` cannot answer after
    // the data is gone. Estimates are impl-specific ⇒ rows-only, but
    // per-row the estimate is a CHECKED bound: KLL k=200 holds
    // normalized rank error ~1.33%, so the p50 estimate must land
    // between the EXACT 0.47 and 0.53 quantiles (2.2× margin),
    // asserted for every group AND the union row in-query. The exact
    // percentile triple is oracle-scaffolding cost only — production
    // stores just the sketch column.
    "agg_kll_merge" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val li = t(s, d, "lineitem")
        val exact =
          expr("percentile(l_extendedprice, array(0.47D, 0.5D, 0.53D))")
        val perGroup = li.groupBy(col("l_returnflag").as("grp"))
          .agg(call_function("kll_sketch_agg",
              col("l_extendedprice"), lit(200)).as("_sk"),
            exact.as("_ex"))
        val globalRow = perGroup
          .agg(call_function("kll_union_agg", col("_sk"), lit(200)).as("_sk"))
          .crossJoin(broadcast(li.agg(exact.as("_ex"))))
          .select(lit("ALL").as("grp"), col("_sk"), col("_ex"))
        perGroup.select(col("grp"), col("_sk"), col("_ex"))
          .unionByName(globalRow)
          .withColumn("est_p50",
            call_function("kll_quantile", col("_sk"), lit(0.5d)))
          .withColumn("exact_p50", element_at(col("_ex"), 2))
          .withColumn("lo_q47", element_at(col("_ex"), 1))
          .withColumn("hi_q53", element_at(col("_ex"), 3))
          .withColumn("within_bound",
            (col("est_p50") >= col("lo_q47") &&
              col("est_p50") <= col("hi_q53")).cast(IntegerType))
          .select(col("grp"), col("exact_p50"), col("est_p50"),
            col("lo_q47"), col("hi_q53"), col("within_bound"))
          .orderBy(col("grp"))
      },
      None,
      allowBnlj = true),

    // HASH-EXACT projection of the KLL verdict (the agg_hll_merge_checked
    // pattern): group row counts + the p50-inside-exact-[q47,q53] verdict
    // as the oracle-stated constant. The exact quantile triple itself
    // stays in the parent (interpolated DOUBLEs across two engines'
    // percentile implementations are not a hash-stable surface; the
    // VERDICT is).
    "agg_kll_merge_checked" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val li = t(s, d, "lineitem")
        val exact =
          expr("percentile(l_extendedprice, array(0.47D, 0.5D, 0.53D))")
        val perGroup = li.groupBy(col("l_returnflag").as("grp"))
          .agg(call_function("kll_sketch_agg",
              col("l_extendedprice"), lit(200)).as("_sk"),
            exact.as("_ex"), count(lit(1)).as("n_rows"))
        val globalRow = perGroup
          .agg(call_function("kll_union_agg", col("_sk"), lit(200)).as("_sk"))
          .crossJoin(broadcast(li.agg(exact.as("_ex"),
            count(lit(1)).as("n_rows"))))
          .select(lit("ALL").as("grp"), col("_sk"), col("_ex"), col("n_rows"))
        perGroup.select(col("grp"), col("_sk"), col("_ex"), col("n_rows"))
          .unionByName(globalRow)
          .select(col("grp"), col("n_rows"),
            (call_function("kll_quantile", col("_sk"), lit(0.5d)) >=
              element_at(col("_ex"), 1) &&
              call_function("kll_quantile", col("_sk"), lit(0.5d)) <=
                element_at(col("_ex"), 3)).cast(IntegerType)
              .as("within_bound"))
          .orderBy(col("grp"))
      },
      Some("""SELECT CAST(l_returnflag AS VARCHAR) AS grp,
             |  count(*) AS n_rows,
             |  CAST(1 AS INTEGER) AS within_bound
             |FROM lineitem GROUP BY 1
             |UNION ALL
             |SELECT 'ALL', count(*), CAST(1 AS INTEGER) FROM lineitem
             |ORDER BY grp""".stripMargin),
      allowBnlj = true),

    // Theta SET-ALGEBRA sketches (graft.expressions.ThetaSketchAgg):
    // the |A∩B| / |A\B| member of the sketch suite — HLL/bitmap answer
    // |A|, KLL answers quantiles, CMS answers frequencies; theta
    // answers overlap questions over sketches built INDEPENDENTLY
    // (audience overlap, cross-corpus contamination) without ever
    // co-shuffling the raw keys. Each return flag aggregates its own
    // compact sketch of the order-key set; the pairwise intersections
    // and differences are then scalar ops over three sketch blobs.
    // Estimates are impl-specific ⇒ rows-only, but each row CHECKS its
    // estimate against the exact intersection (computed via one
    // distinct + self-equi-join — oracle-scaffolding cost only) at a
    // 10% relative bound (lgK=12 ⇒ ~1.6% per-sketch RSE; intersection
    // error compounds, hence the margin), plus the set identity
    // |A∩B| + |A\B| ≈ |A| at the same bound.
    "agg_theta_setops" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val li = t(s, d, "lineitem")
        val sk = li.groupBy(col("l_returnflag").as("flag"))
          .agg(call_function("theta_sketch_agg",
              col("l_orderkey"), lit(12)).as("_sk"),
            countDistinct(col("l_orderkey")).as("exact_n"))
        val flags = li.select(col("l_orderkey"), col("l_returnflag")).distinct()
        val exactInter = flags.as("fx")
          .join(flags.as("fy"),
            col("fx.l_orderkey") === col("fy.l_orderkey") &&
              col("fx.l_returnflag") < col("fy.l_returnflag"))
          .groupBy(col("fx.l_returnflag").as("fa"),
            col("fy.l_returnflag").as("fb"))
          .agg(count(lit(1)).as("exact_inter"))
        val pairs = sk
          .select(col("flag").as("fa"), col("_sk").as("_ska"),
            col("exact_n").as("exact_a"))
          .crossJoin(broadcast(sk.select(col("flag").as("fb"),
            col("_sk").as("_skb"))))
          .filter(col("fa") < col("fb"))
        val inter = call_function("theta_estimate",
          call_function("theta_intersect", col("_ska"), col("_skb")))
        val diff = call_function("theta_estimate",
          call_function("theta_a_not_b", col("_ska"), col("_skb")))
        pairs.join(broadcast(exactInter), Seq("fa", "fb"), "left")
          .na.fill(0L, Seq("exact_inter"))
          .withColumn("est_inter", inter)
          .withColumn("est_diff", diff)
          .withColumn("rel_err",
            round(abs(col("est_inter") - col("exact_inter")) /
              greatest(col("exact_inter"), lit(1L)), 4))
          .withColumn("within_bound",
            (col("rel_err") <= 0.10 &&
              abs(col("est_inter") + col("est_diff") - col("exact_a")) <=
                lit(0.10) * col("exact_a")).cast(IntegerType))
          .select(col("fa"), col("fb"), col("exact_a"), col("exact_inter"),
            col("est_inter"), col("est_diff"), col("rel_err"),
            col("within_bound"))
          .orderBy(col("fa"), col("fb"))
      },
      None,
      allowBnlj = true),

    // Mergeable frequent-items (heavy-hitters) sketches
    // (graft.expressions.FreqSketchAgg): WHICH keys dominate, with
    // deterministic guarantees — the discovery companion to
    // profile_key_skew's exact groupBy (which a 100 TB key space can't
    // afford) and agg_cms' point estimates. A deliberately skewed
    // derived key (10 hot values carry 75% of the mass, the tail
    // spreads over part keys) is sketched PER SHARD, the shard bytes
    // merge centrally, and the merged top-10 is CHECKED in-query
    // against exact counts: lb ≤ exact ≤ ub per item (the sketch's
    // hard interval guarantee) and every exact top-10 item present
    // (NO_FALSE_NEGATIVES at this separation). Sketch content depends
    // on merge order ⇒ rows-only; the bounds hold on every run.
    "agg_freq_topk" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val li = t(s, d, "lineitem")
        val keyed = li.select(
          when(col("l_orderkey") % 4 < 3, col("l_orderkey") % 10)
            .otherwise(col("l_partkey") + 1000).as("k"),
          (col("l_suppkey") % 8).as("shard"))
        val merged = keyed
          .groupBy(col("shard"))
          .agg(call_function("freq_sketch_agg", col("k"), lit(1024)).as("_sk"))
          .agg(call_function("freq_merge_agg", col("_sk"), lit(1024)).as("_sk"))
          .select(explode(call_function("freq_topk", col("_sk"), lit(10)))
            .as("_hh"))
          .select(col("_hh.item").as("item"), col("_hh.estimate").as("est"),
            col("_hh.lb").as("lb"), col("_hh.ub").as("ub"))
        val exact = keyed.groupBy(col("k")).agg(count(lit(1)).as("exact"))
        merged.join(broadcast(exact), col("item") === col("k"), "left")
          .na.fill(0L, Seq("exact"))
          .withColumn("within_bound",
            (col("lb") <= col("exact") && col("exact") <= col("ub"))
              .cast(IntegerType))
          .select(col("item"), col("exact"), col("est"), col("lb"),
            col("ub"), col("within_bound"))
          .orderBy(col("exact").desc, col("item"))
      },
      None),

    // HASH-EXACT projection of the sketch checks (r16, r15 verdict ask
    // #5): the rows-only keys above emit estimator values no second
    // engine can re-derive, but their DETERMINISTIC columns — exact
    // counts and the bound VERDICTS — are oracle-stateable: DuckDB
    // re-computes the exact side and asserts the verdict as the
    // constant 1, so a sketch that ever violates its bound flips the
    // Spark-side flag to 0 and fails the driver HASH gate (red), not
    // just an in-query self-check. The estimator detail rows stay in
    // the parent keys.
    //
    // agg_freq_topk's promotable integers: the exact top-10 of the
    // skewed derived key (75% of mass on 10 hot values ⇒ no boundary
    // ambiguity), each row asserting the sketch's hard guarantees —
    // the item IS in the merged sketch top-10 (no false negatives at
    // this separation) and its [lb, ub] bracket contains the exact
    // count.
    "agg_freq_topk_checked" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val li = t(s, d, "lineitem")
        val keyed = li.select(
          when(col("l_orderkey") % 4 < 3, col("l_orderkey") % 10)
            .otherwise(col("l_partkey") + 1000).as("k"),
          (col("l_suppkey") % 8).as("shard"))
        val sketchTop = keyed
          .groupBy(col("shard"))
          .agg(call_function("freq_sketch_agg", col("k"), lit(1024)).as("_sk"))
          .agg(call_function("freq_merge_agg", col("_sk"), lit(1024)).as("_sk"))
          .select(explode(call_function("freq_topk", col("_sk"), lit(10)))
            .as("_hh"))
          .select(col("_hh.item").as("item"), col("_hh.lb").as("lb"),
            col("_hh.ub").as("ub"))
        val exactTop = keyed.groupBy(col("k")).agg(count(lit(1)).as("exact"))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("exact").desc, col("k"))))
          .filter(col("rn") <= 10).drop("rn")
        exactTop.join(broadcast(sketchTop), col("k") === col("item"), "left")
          .select(col("k").as("item"), col("exact"),
            col("item").isNotNull.cast(IntegerType).as("in_sketch_topk"),
            (col("item").isNotNull && col("lb") <= col("exact") &&
              col("exact") <= col("ub")).cast(IntegerType).as("bracket_ok"))
          .orderBy(col("exact").desc, col("item"))
      },
      Some("""WITH keyed AS (
             |  SELECT CASE WHEN l_orderkey % 4 < 3 THEN l_orderkey % 10
             |              ELSE l_partkey + 1000 END AS k
             |  FROM lineitem),
             |ex AS (SELECT k, count(*) AS exact FROM keyed GROUP BY k),
             |top AS (
             |  SELECT k, exact,
             |    ROW_NUMBER() OVER (ORDER BY exact DESC, k) AS rn
             |  FROM ex)
             |SELECT k AS item, exact,
             |  CAST(1 AS INTEGER) AS in_sketch_topk,
             |  CAST(1 AS INTEGER) AS bracket_ok
             |FROM top WHERE rn <= 10
             |ORDER BY exact DESC, item""".stripMargin)),

    // agg_theta_setops' promotable integers: exact per-flag cardinality
    // and exact pairwise intersection (both integer-deterministic),
    // with the sketch-vs-exact verdict (relative error ≤ 10% AND the
    // |A∩B| + |A\B| ≈ |A| identity) asserted as the constant the
    // oracle states.
    "agg_theta_setops_checked" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val li = t(s, d, "lineitem")
        val sk = li.groupBy(col("l_returnflag").as("flag"))
          .agg(call_function("theta_sketch_agg",
              col("l_orderkey"), lit(12)).as("_sk"),
            countDistinct(col("l_orderkey")).as("exact_n"))
        val flags = li.select(col("l_orderkey"), col("l_returnflag")).distinct()
        val exactInter = flags.as("fx")
          .join(flags.as("fy"),
            col("fx.l_orderkey") === col("fy.l_orderkey") &&
              col("fx.l_returnflag") < col("fy.l_returnflag"))
          .groupBy(col("fx.l_returnflag").as("fa"),
            col("fy.l_returnflag").as("fb"))
          .agg(count(lit(1)).as("exact_inter"))
        val pairs = sk
          .select(col("flag").as("fa"), col("_sk").as("_ska"),
            col("exact_n").as("exact_a"))
          .crossJoin(broadcast(sk.select(col("flag").as("fb"),
            col("_sk").as("_skb"))))
          .filter(col("fa") < col("fb"))
        val inter = call_function("theta_estimate",
          call_function("theta_intersect", col("_ska"), col("_skb")))
        val diff = call_function("theta_estimate",
          call_function("theta_a_not_b", col("_ska"), col("_skb")))
        pairs.join(broadcast(exactInter), Seq("fa", "fb"), "left")
          .na.fill(0L, Seq("exact_inter"))
          .withColumn("est_inter", inter)
          .withColumn("est_diff", diff)
          .select(col("fa"), col("fb"), col("exact_a"), col("exact_inter"),
            (abs(col("est_inter") - col("exact_inter")) /
              greatest(col("exact_inter"), lit(1L)) <= 0.10 &&
              abs(col("est_inter") + col("est_diff") - col("exact_a")) <=
                lit(0.10) * col("exact_a")).cast(IntegerType)
              .as("within_bound"))
          .orderBy(col("fa"), col("fb"))
      },
      Some("""WITH flags AS (
             |  SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem),
             |ex_a AS (
             |  SELECT l_returnflag AS fa, count(*) AS exact_a
             |  FROM flags GROUP BY 1),
             |inter AS (
             |  SELECT fx.l_returnflag AS fa, fy.l_returnflag AS fb,
             |    count(*) AS exact_inter
             |  FROM flags fx JOIN flags fy
             |    ON fx.l_orderkey = fy.l_orderkey
             |   AND fx.l_returnflag < fy.l_returnflag
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT a.fa, b.fa AS fb FROM ex_a a JOIN ex_a b ON a.fa < b.fa)
             |SELECT p.fa, p.fb, a.exact_a,
             |  COALESCE(i.exact_inter, 0) AS exact_inter,
             |  CAST(1 AS INTEGER) AS within_bound
             |FROM pairs p
             |JOIN ex_a a ON a.fa = p.fa
             |LEFT JOIN inter i ON i.fa = p.fa AND i.fb = p.fb
             |ORDER BY p.fa, p.fb""".stripMargin),
      allowBnlj = true),

    // agg_hll_merge's promotable integers: per-group + merged-ALL exact
    // distincts with the 5% HLL verdict as the stated constant.
    "agg_hll_merge_checked" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val perGroup = li.groupBy(col("l_returnflag").as("grp"))
          .agg(hll_sketch_agg(col("l_orderkey"), lit(12)).as("_sk"),
            countDistinct(col("l_orderkey")).as("exact"))
        val globalRow = perGroup
          .agg(hll_union_agg(col("_sk"), lit(true)).as("_sk"))
          .crossJoin(broadcast(
            li.agg(countDistinct(col("l_orderkey")).as("exact"))))
          .select(lit("ALL").as("grp"), col("_sk"), col("exact"))
        perGroup.select(col("grp"), col("_sk"), col("exact"))
          .unionByName(globalRow)
          .select(col("grp"), col("exact"),
            (abs(hll_sketch_estimate(col("_sk")) - col("exact"))
              .cast(DoubleType) / col("exact") <= 0.05).cast(IntegerType)
              .as("within_bound"))
          .orderBy(col("grp"))
      },
      Some("""SELECT CAST(l_returnflag AS VARCHAR) AS grp,
             |  count(DISTINCT l_orderkey) AS exact,
             |  CAST(1 AS INTEGER) AS within_bound
             |FROM lineitem GROUP BY 1
             |UNION ALL
             |SELECT 'ALL', count(DISTINCT l_orderkey), CAST(1 AS INTEGER)
             |FROM lineitem
             |ORDER BY grp""".stripMargin),
      allowBnlj = true),

    // agg_cms_checked's promotable integers: per-status probed-key count
    // with the two CMS verdicts — est ≥ true ALWAYS (n_under must be
    // exactly 0, a hard guarantee, not probabilistic) and the ε·N
    // overestimate bound.
    "agg_cms_oracled" -> QuerySpec(
      (s, d) => {
        val orders = t(s, d, "orders")
        val sketches = orders.groupBy(col("o_orderstatus"))
          .agg(expr("count_min_sketch(o_orderpriority, 0.001d, 0.99d, 42)")
            .as("cms"),
            count(lit(1)).as("n_total"))
        val exact = orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("exact_n"))
        val probe = udf((bytes: Array[Byte], item: String) =>
          org.apache.spark.util.sketch.CountMinSketch
            .readFrom(new java.io.ByteArrayInputStream(bytes))
            .estimateCount(item))
        exact.join(sketches, Seq("o_orderstatus"))
          .withColumn("over", probe(col("cms"), col("o_orderpriority")) -
            col("exact_n"))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_keys"),
            sum(when(col("over") < 0, 1L).otherwise(0L)).as("n_under"),
            min(when(col("over").cast(DoubleType) <=
              col("n_total").cast(DoubleType) * 0.001, 1).otherwise(0))
              .cast(IntegerType).as("within_bound"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  count(DISTINCT o_orderpriority) AS n_keys,
             |  CAST(0 AS BIGINT) AS n_under,
             |  CAST(1 AS INTEGER) AS within_bound
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXACT mergeable distinct counting via bitmaps — the precise
    // companion to agg_hll_merge's approximate sketches: values bucket
    // into fixed 32768-bit bitmaps (bitmap_bucket_number /
    // bitmap_bit_position), every (group, bucket) builds its bitmap
    // with bitmap_construct_agg, and counts come from summing
    // bitmap_count over buckets. The global row is computed by
    // bitmap_or_agg UNION of the per-group bucket bitmaps — the rows
    // are never re-touched, and unlike HLL the answer is EXACT (keys
    // overlap across groups, so ALL < sum of groups proves real
    // merging). The 100 TB shape: bitmap bytes are O(range/8) per
    // bucket regardless of row count, partial-agged map-side; dense
    // key spaces (order keys, user ids) fit this, sparse 64-bit hashes
    // belong in HLL. Values must be ≥ 1 (positions are 1-indexed) —
    // l_orderkey's contract. Counts are exact integers ⇒ fully oracled
    // against count(DISTINCT).
    "agg_bitmap_distinct" -> QuerySpec(
      (s, d) => {
        val buckets = t(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("grp"),
            expr("bitmap_bucket_number(l_orderkey)").as("_b"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_orderkey))")
            .as("_bm"))
        val perGroup = buckets.groupBy(col("grp"))
          .agg(sum(expr("bitmap_count(_bm)")).cast(LongType).as("n_distinct"))
        val globalRow = buckets.groupBy(col("_b"))
          .agg(expr("bitmap_or_agg(_bm)").as("_bm"))
          .agg(sum(expr("bitmap_count(_bm)")).cast(LongType).as("n_distinct"))
          .select(lit("ALL").as("grp"), col("n_distinct"))
        perGroup.unionByName(globalRow).orderBy(col("grp"))
      },
      Some("""SELECT grp, n_distinct FROM (
             |  SELECT l_returnflag AS grp,
             |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
             |  FROM lineitem GROUP BY 1
             |  UNION ALL
             |  SELECT 'ALL', CAST(count(DISTINCT l_orderkey) AS BIGINT)
             |  FROM lineitem)
             |ORDER BY grp""".stripMargin)),

    // EXACT sliding-window distinct users (7-day window, round 14) —
    // the composition the bitmap tier exists for: per-day bitmaps
    // (one pass over raw events — rows are NEVER re-touched per
    // window), then a bitmap_or_agg WINDOW over the 7-row day frame
    // per bucket and a day-grain count sum. The naive form re-scans
    // every event 7× (or keeps 7-day distinct state per key); this
    // shape merges fixed-size day summaries — the same reason
    // per-shard HLL sketches exist, but EXACT. The oracle recomputes
    // each day's count(DISTINCT) over the raw 7-day range directly —
    // an independent derivation, not a bitmap re-simulation.
    "agg_sliding_distinct" -> QuerySpec(
      (s, d) => {
        val daily = t(s, d, "events")
          .filter(col("user_id").isNotNull)
          // bitmap_bit_position/bucket_number are 1-BASED (value v maps
          // to bit (v-1) mod 32768): an id of 0 lands at position -1 and
          // silently vanishes from the bitmap (measured: exactly one
          // user undercounted — user_id 0). Shift ids +1; distinctness
          // is translation-invariant.
          .groupBy(date_trunc("day", col("ts")).cast(DateType).as("day"),
            expr("bitmap_bucket_number(user_id + 1)").as("_b"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id + 1))")
            .as("_bm"))
        // RANGE frame over the day ORDINAL, not ROWS: the bucket grain
        // is sparse (a hash bucket can skip days), so row-adjacency is
        // NOT day-adjacency — a ROWS frame would reach back past the
        // calendar window exactly where buckets thin out (measured: one
        // user over-counted at sf0.01 before the fix).
        // DENSIFY before the window (round-15 ADVICE): the day-grain sum
        // only sees (day, bucket) rows that EXIST, so a bucket active in
        // the prior 6 days but silent on day d would contribute nothing
        // to day d. Cross-join the day spine with the bucket set (both
        // post-aggregation summary grains: |days| × |buckets|, not rows)
        // and left-join the per-day bitmaps; a missing day's bitmap is
        // NULL, which bitmap_or_agg skips — the frame still ORs the
        // surviving prior-day bitmaps.
        val spine = daily.select(col("day")).distinct()
          .crossJoin(daily.select(col("_b")).distinct())
        val dense = spine.join(daily, Seq("day", "_b"), "left")
        val w = Window.partitionBy(col("_b"))
          .orderBy(datediff(col("day"), to_date(lit("1970-01-01"))))
          .rangeBetween(-6, 0)
        dense
          .withColumn("_w7",
            call_function("bitmap_count", expr("bitmap_or_agg(_bm)").over(w)))
          .groupBy(col("day"))
          .agg(sum(col("_w7")).cast(LongType).as("n_distinct_7d"))
          .orderBy(col("day"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id
             |  FROM events WHERE user_id IS NOT NULL),
             |days AS (SELECT DISTINCT day FROM e)
             |SELECT d.day,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_distinct_7d
             |FROM days d
             |JOIN e ON e.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
             |GROUP BY d.day ORDER BY d.day""".stripMargin),
      allowBnlj = true),

    // Count-min sketch (mergeable frequency summary — the heavy-hitters
    // companion to the HLL distinct sketch): binary sketch per group.
    // Sketch bytes are seed/impl-specific ⇒ rows-only; the ε-bound
    // (estimate ≥ true count, ≤ true + ε·N) is unit-tested in
    // SampleOpsSpec.
    "agg_count_min_sketch" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("count_min_sketch(o_orderpriority, 0.001d, 0.99d, 42)")
          .as("cms"))
        .select(col("o_orderstatus"), octet_length(col("cms")).as("sketch_bytes"))
        .orderBy(col("o_orderstatus")),
      None),

    // CHECKED-estimator twin of agg_count_min_sketch (the
    // dedup_minhash_vs_exact pattern): probe every (status, priority)
    // key's CMS estimate and join it back to the exact count, emitting
    // per-status (n_keys, n_under, max/mean overestimate, the ε·N bound,
    // within_bound). CMS promises est ≥ true always and est ≤ true + ε·N
    // w.p. ≥ confidence — the bound is checked IN the query, turning the
    // "trust me" sketch into a measured one. Sketch bytes stay
    // engine-specific ⇒ rows-only; the bound is also unit-asserted
    // (SampleOpsSpec). The probe deserializes via a scala UDF — allowed
    // here because it runs on the POST-AGGREGATION key set (|statuses| ×
    // |priorities| rows, ~15), never on base data.
    "agg_cms_checked" -> QuerySpec(
      (s, d) => {
        val orders = t(s, d, "orders")
        val sketches = orders.groupBy(col("o_orderstatus"))
          .agg(expr("count_min_sketch(o_orderpriority, 0.001d, 0.99d, 42)")
            .as("cms"),
            count(lit(1)).as("n_total"))
        val exact = orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("exact_n"))
        val probe = udf((bytes: Array[Byte], item: String) =>
          org.apache.spark.util.sketch.CountMinSketch
            .readFrom(new java.io.ByteArrayInputStream(bytes))
            .estimateCount(item))
        exact.join(sketches, Seq("o_orderstatus"))
          .withColumn("est_n", probe(col("cms"), col("o_orderpriority")))
          .withColumn("over", col("est_n") - col("exact_n"))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_keys"),
            sum(when(col("over") < 0, 1).otherwise(0)).as("n_under"),
            max(col("over")).as("max_over"),
            (sum(col("over")).cast(DoubleType) / count(lit(1))).as("mean_over"),
            (first(col("n_total")).cast(DoubleType) * 0.001).as("eps_n_bound"),
            // n_total rides each probe row from the sketches join, so the
            // bound compare stays per-row INSIDE the aggregate (no nesting)
            min(when(col("over").cast(DoubleType) <=
              col("n_total").cast(DoubleType) * 0.001, 1).otherwise(0))
              .as("within_bound"))
          .orderBy(col("o_orderstatus"))
      },
      None),

    // CHECKED-estimator twin of agg_approx_percentile: the sketch value
    // is engine-specific (Greenwald-Khanna summary), but its CONTRACT is
    // checkable exactly — the returned value's rank INTERVAL
    // [count(x<v)+1, count(x≤v)] (an interval, not a point, because ties
    // give one value many ranks) must intersect the ε-band around the
    // target rank, ε = 1/accuracy. Per group: approx p50 at accuracy
    // 1000, both conditional rank sums, the band, within_bound (must be
    // 1). rows-only by design.
    "agg_approx_pctl_checked" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val sk = li.groupBy(col("l_returnflag"))
          .agg(expr("approx_percentile(l_quantity, 0.5d, 1000)").as("approx_p50"),
            count(lit(1)).as("n"))
        li.join(broadcast(sk), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(
            first(col("approx_p50")).as("approx_p50"),
            first(col("n")).as("n"),
            sum(when(col("l_quantity") < col("approx_p50"), 1L).otherwise(0L))
              .as("rank_lt"),
            sum(when(col("l_quantity") <= col("approx_p50"), 1L).otherwise(0L))
              .as("rank_le"),
            (first(col("n")).cast(DoubleType) * 0.5).as("rank_target"),
            (first(col("n")).cast(DoubleType) / 1000.0 + 1.0).as("rank_bound"))
          .withColumn("within_bound",
            (col("rank_lt").cast(DoubleType) <= col("rank_target") + col("rank_bound") &&
              col("rank_le").cast(DoubleType) >= col("rank_target") - col("rank_bound"))
              .cast(IntegerType))
          .orderBy(col("l_returnflag"))
      },
      None),

    // CHECKED-estimator twin of agg_approx_distinct: HLL++ output is
    // engine-specific but deterministic for fixed input; the check joins
    // it to the exact distinct count and asserts the relative error is
    // inside 3× the requested rsd (0.05) — far beyond any plausible
    // fixture drift. rows-only by design.
    "agg_approx_distinct_checked" -> QuerySpec(
      (s, d) => {
        val orders = t(s, d, "orders")
        orders.groupBy(col("o_orderstatus"))
          .agg(
            approx_count_distinct(col("o_custkey"), rsd = 0.05).as("est_nd"),
            countDistinct(col("o_custkey")).as("exact_nd"))
          .withColumn("rel_err",
            abs(col("est_nd") - col("exact_nd")).cast(DoubleType) /
              col("exact_nd"))
          .withColumn("within_bound", (col("rel_err") <= 0.15).cast(IntegerType))
          .orderBy(col("o_orderstatus"))
      },
      None),

    // HASH-EXACT projections of the two remaining approx-sketch checks
    // (the agg_cms_oracled pattern): exact integers + the bound verdict
    // stated by the oracle as the constant 1 — a violated bound flips
    // the Spark flag and fails the driver hash gate.
    "agg_approx_distinct_oracled" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.05).as("_est"),
          countDistinct(col("o_custkey")).as("exact_nd"))
        .select(col("o_orderstatus"), col("exact_nd"),
          (abs(col("_est") - col("exact_nd")).cast(DoubleType) /
            col("exact_nd") <= 0.15).cast(IntegerType).as("within_bound"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |  count(DISTINCT o_custkey) AS exact_nd,
             |  CAST(1 AS INTEGER) AS within_bound
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    "agg_approx_pctl_oracled" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val sk = li.groupBy(col("l_returnflag"))
          .agg(expr("approx_percentile(l_quantity, 0.5d, 1000)").as("approx_p50"),
            count(lit(1)).as("n"))
        li.join(broadcast(sk), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(
            first(col("n")).as("n"),
            sum(when(col("l_quantity") < col("approx_p50"), 1L).otherwise(0L))
              .as("_rank_lt"),
            sum(when(col("l_quantity") <= col("approx_p50"), 1L).otherwise(0L))
              .as("_rank_le"))
          .select(col("l_returnflag"), col("n"),
            (col("_rank_lt").cast(DoubleType) <=
              col("n").cast(DoubleType) * 0.5 +
                (col("n").cast(DoubleType) / 1000.0 + 1.0) &&
              col("_rank_le").cast(DoubleType) >=
                col("n").cast(DoubleType) * 0.5 -
                  (col("n").cast(DoubleType) / 1000.0 + 1.0))
              .cast(IntegerType).as("within_bound"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(1 AS INTEGER) AS within_bound
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------- filters/projections
    // Null/empty partition-key guard (reference README.md:1306-1311).
    "filter_nonnull" -> QuerySpec(
      (s, d) => t(s, d, "customer")
        .filter(col("c_mktsegment").isNotNull && length(col("c_mktsegment")) > 0)
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE c_mktsegment IS NOT NULL AND length(c_mktsegment) > 0
             |ORDER BY c_custkey""".stripMargin)),

    // Partition-column predicate (README.md:801-806) — on a partitioned
    // layout this compiles to PruneFileSourcePartitions; plan-shape
    // asserted in PlanSpec against a partitioned copy.
    "filter_partition_prune" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // Nested-struct projection + flat rename (README.md:643-666 style).
    "proj_flatten_vc" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(
          col("o_custkey"),
          struct(
            col("o_orderkey").as("okey"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").as("price")).as("day"))
        .select(
          col("o_custkey").as("cust"),
          col("day.okey").as("okey"),
          col("day.status").as("status"),
          col("day.price").as("price"))
        .orderBy(col("okey")),
      Some("""SELECT o_custkey AS cust, o_orderkey AS okey,
             |  o_orderstatus AS status, o_totalprice AS price
             |FROM orders ORDER BY okey""".stripMargin)),

    // Derived partition-key columns (README.md:740-745).
    "proj_derive_year_month" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .withColumn("odate", col("o_orderdate").cast(DateType))
        .withColumn("o_year", year(col("odate")))
        .withColumn("o_month", month(col("odate")))
        .select(col("o_orderkey"), col("odate"), col("o_year"), col("o_month"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
             |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(month(o_orderdate) AS INTEGER) AS o_month
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // --------------------------------------------------------------- joins
    // Multi-key equi join (README.md:737) — keyed on exact int types, not
    // the reference's float-coordinate keys (hazard §4.6).
    "join_inner_multikey" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val b = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        // (l_orderkey, l_linenumber) is not unique in the test data, so the
        // deterministic total order must cover every output column.
        a.join(b, Seq("l_orderkey", "l_linenumber"), "inner")
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
      },
      Some("""SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice
             |FROM lineitem a
             |JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice
             |      FROM lineitem WHERE l_returnflag = 'R') b
             |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
             |ORDER BY a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice""".stripMargin)),

    "join_cross" -> QuerySpec(
      (s, d) => t(s, d, "region")
        .crossJoin(t(s, d, "nation"))
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
        .orderBy(col("r_regionkey"), col("n_nationkey")),
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region CROSS JOIN nation
             |ORDER BY r_regionkey, n_nationkey""".stripMargin),
      allowBnlj = true),

    // NOT EXISTS upsert-dedup shape (README.md:1517-1526) as LeftAnti.
    "join_left_anti" -> QuerySpec(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "P")
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),

    "join_left_semi" -> QuerySpec(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Small-dim broadcast (the scale-critical join shape: fact ⋈ dims with
    // zero shuffle of the fact side).
    "join_broadcast" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val sup = t(s, d, "supplier")
        val nat = t(s, d, "nation")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // SHUFFLE_HASH-hinted join: the third join strategy (after broadcast
    // and sort-merge) — right for mid-size sides too big to broadcast
    // where skipping both sort passes beats SMJ. Plan assert in PlanSpec.
    "join_shuffle_hash" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val ords = t(s, d, "orders").hint("shuffle_hash")
        li.join(ords, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Bucketed co-located tables through the oracle: both sides written
    // bucketed on the join key (8 buckets), so the join plans with ZERO
    // Exchange (asserted in BucketingSpec); DuckDB states the plain join
    // over the same rows — bucketing must be invisible in the result.
    // Tables are (re)written once per JVM via staged(); bucket metadata
    // lives in the session catalog, so a fresh JVM rewrites them.
    "catalog_bucketed_join" -> QuerySpec(
      (s, d) => {
        val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
        val liT = s"graft_bkt_li_$suffix"
        val orT = s"graft_bkt_or_$suffix"
        if (!s.catalog.tableExists(liT)) {
          Upsert.writeBucketedTable(
            t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity")),
            liT, Seq("l_orderkey"), nBuckets = 8, sortCols = Seq("l_orderkey"))
        }
        if (!s.catalog.tableExists(orT)) {
          Upsert.writeBucketedTable(
            t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus")),
            orT, Seq("o_orderkey"), nBuckets = 8, sortCols = Seq("o_orderkey"))
        }
        s.table(liT)
          .join(s.table(orT), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Skew-salted join, oracled: the salted rewrite must return exactly
    // the rows of the plain join (DuckDB states the PLAIN join — the
    // salting is invisible in the result, which is the whole point).
    // The skew itself (90% of rows on one key) is manufactured in the
    // left side; JoinsSpec additionally covers left-join semantics.
    "join_salted" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
          .withColumn("skew_key",
            when(col("l_orderkey") % 10 =!= 0, lit(1L)).otherwise(col("l_orderkey")))
        val dim = t(s, d, "orders").filter(col("o_orderkey") < 400)
          .select(col("o_orderkey").as("skew_key"), col("o_orderpriority"))
        Joins.saltedJoin(li, dim, Seq("skew_key"), col("l_orderkey") * 10 + col("l_linenumber"), nSalts = 8)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH li AS (
             |  SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 1
             |              ELSE l_orderkey END AS skew_key, l_quantity
             |  FROM lineitem),
             |dim AS (SELECT o_orderkey AS skew_key, o_orderpriority
             |        FROM orders WHERE o_orderkey < 400)
             |SELECT o_orderpriority, count(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |FROM li JOIN dim USING (skew_key)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Rename-on-collision through the oracle (README.md:1429-1440): both
    // sides carry `o_totalprice`; the right side's collides and is
    // suffixed `_new` before the join, and BOTH columns survive.
    "proj_rename_collision" -> QuerySpec(
      (s, d) => {
        val old = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val updated = t(s, d, "orders")
          .select(col("o_orderkey"), (col("o_totalprice") * 1.1).as("o_totalprice"))
        val renamed = Joins.renameCollisions(old, updated,
          joinKeys = Seq("o_orderkey"), suffix = "_new")
        old.join(renamed, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_totalprice_new"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  o_totalprice * 1.1 AS o_totalprice_new
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Full outer join: matched rows + unmatched from BOTH sides (the only
    // §2.4 join type not yet oracled). Keys are never null in the data,
    // so every null below is produced by the outer join itself.
    "join_full_outer" -> QuerySpec(
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_acctbal") > 5000)
          .select(col("c_custkey"), col("c_name"))
        val ords = t(s, d, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(col("c_custkey"), col("c_name"), col("o_custkey"), col("n_orders"))
          .orderBy(col("c_custkey").asc_nulls_first, col("o_custkey").asc_nulls_first)
      },
      Some("""SELECT c.c_custkey, c.c_name, o.o_custkey, o.n_orders
             |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
             |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
             |                 FROM orders GROUP BY o_custkey) o
             |  ON c.c_custkey = o.o_custkey
             |ORDER BY c.c_custkey NULLS FIRST, o.o_custkey NULLS FIRST""".stripMargin)),

    // Range (interval) join — §2.4's one remaining absent join type. The
    // bucketed rewrite (Joins.rangeJoin) plans as an EQUI join + residual
    // filter instead of the BNLJ/Cartesian a naive non-equi join costs;
    // the plan-audit sweep enforces exactly that (join_range is NOT on
    // the BNLJ whitelist). Day arithmetic on both sides keeps the oracle
    // integer-exact.
    "join_range" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"),
            datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("ship_day"))
        val ords = t(s, d, "orders").filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"),
            datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("lo_day"))
          .withColumn("hi_day", col("lo_day") + 30)
        Joins.rangeJoin(li, ords, "ship_day", "lo_day", "hi_day", bucketWidth = 32)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_points"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o.o_orderkey, count(*) AS n_points
             |FROM (SELECT o_orderkey,
             |        (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS lo_day
             |      FROM orders WHERE o_orderkey % 100 = 0) o
             |JOIN (SELECT l_orderkey,
             |        (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS ship_day
             |      FROM lineitem) l
             |  ON l.ship_day BETWEEN o.lo_day AND o.lo_day + 30
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Interval-OVERLAP join (both sides intervals) — the bucketed rewrite
    // with positional first-shared-bucket dedup (Joins.intervalOverlapJoin)
    // plans as an equi join; each order contributes a [orderdate,
    // orderdate + key%20d] interval on the left and a 3-day-shifted
    // [.., + key%15d] one on the right, bounded per-customer-bucket so
    // the oracle's naive overlap join stays cheap at sf0.01.
    "join_interval_overlap" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "orders").filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"), (col("o_custkey") % 100).as("ek"),
            datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
        val a = base.select(col("o_orderkey").as("aid"), col("ek"),
          col("day").as("a_lo"), (col("day") + col("o_orderkey") % 20).as("a_hi"))
        val b = base.select(col("o_orderkey").as("bid"), col("ek"),
          (col("day") + 3).as("b_lo"),
          (col("day") + 3 + col("o_orderkey") % 15).as("b_hi"))
        Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
          bucketWidth = 16, equiKeys = Seq("ek"))
          .select(col("aid"), col("bid"))
          .orderBy(col("aid"), col("bid"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_custkey % 100 AS ek,
             |    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day
             |  FROM orders WHERE o_orderkey < 2000),
             |a AS (SELECT o_orderkey AS aid, ek, day AS a_lo,
             |        day + o_orderkey % 20 AS a_hi FROM base),
             |b AS (SELECT o_orderkey AS bid, ek, day + 3 AS b_lo,
             |        day + 3 + o_orderkey % 15 AS b_hi FROM base)
             |SELECT a.aid, b.bid
             |FROM a JOIN b ON a.ek = b.ek AND a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
             |ORDER BY aid, bid""".stripMargin)),

    // ------------------------------------------------------------ flattens
    // vcFlatten semantics (README.md:643-666): nest orders into an
    // array-of-structs per customer, then explode+project back — DuckDB
    // sees the flat equivalent.
    "flatten_explode_structs" -> QuerySpec(
      (s, d) => {
        val nested = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(sort_array(collect_list(struct(
            col("o_orderkey").as("okey"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").as("price")))).as("days"))
        Flatten.explodeStructs(nested, "days",
          scalars = Seq("o_custkey" -> "cust"),
          fields = Seq("okey" -> "okey", "status" -> "status", "price" -> "price"))
          .orderBy(col("okey"))
      },
      Some("""SELECT o_custkey AS cust, o_orderkey AS okey,
             |  o_orderstatus AS status, o_totalprice AS price
             |FROM orders ORDER BY okey""".stripMargin)),

    // omUnzip semantics (README.md:693-725) distributed: build parallel
    // arrays per order, then arrays_zip+explode them back to rows. The
    // nested shape is STAGED once (parquet) so repeated invocations — and
    // the bench — measure the unzip operator, not the 150k-group
    // collect_list harness that synthesizes the shape from flat TPC-H.
    "flatten_arrays_zip" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "nested_lineitem") { p =>
          t(s, d, "lineitem")
            .groupBy(col("l_orderkey"))
            .agg(sort_array(collect_list(struct(
              col("l_linenumber").as("ln"),
              col("l_quantity").as("qty")))).as("rows"))
            .select(col("l_orderkey"),
              Flatten.parallelArrays(col("rows"), Seq("ln", "qty")).as("daily"))
            .write.mode("overwrite").parquet(p)
        }
        Flatten.unzipParallelArrays(s.read.parquet(dir), "daily",
          scalars = Seq("l_orderkey" -> "l_orderkey"))
          .orderBy(col("l_orderkey"), col("ln"), col("qty"))
      },
      Some("""SELECT l_orderkey, l_linenumber AS ln, l_quantity AS qty
             |FROM lineitem ORDER BY l_orderkey, ln, qty""".stripMargin)),

    // posexplode_outer: index-preserving explode that also KEEPS rows
    // whose array is empty (plain explode silently drops them — the
    // outer variant is what a row-count-preserving pipeline needs).
    "flatten_posexplode_outer" -> QuerySpec(
      (s, d) => {
        val nested = t(s, d, "orders")
          .withColumn("digits",
            when(col("o_orderkey") % 10 === 0, array().cast(ArrayType(StringType)))
              .otherwise(split(col("o_orderkey").cast(StringType), "")))
        nested.select(col("o_orderkey"),
          posexplode_outer(col("digits")).as(Seq("pos", "digit")))
          .orderBy(col("o_orderkey"), col("pos"))
      },
      Some("""WITH nested AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 10 = 0 THEN []
             |         ELSE string_split(CAST(o_orderkey AS VARCHAR), '') END AS digits
             |  FROM orders),
             |ex AS (
             |  SELECT o_orderkey,
             |    unnest(CASE WHEN len(digits) = 0 THEN [NULL] ELSE digits END) AS digit,
             |    unnest(CASE WHEN len(digits) = 0 THEN [NULL]
             |           ELSE range(0, len(digits)) END) AS pos
             |  FROM nested)
             |SELECT o_orderkey, CAST(pos AS INTEGER) AS pos, CAST(digit AS VARCHAR) AS digit
             |FROM ex ORDER BY o_orderkey, pos""".stripMargin)),

    // -------------------------------------------------------------- upsert
    // MERGE semantics (README.md:1517-1529): batch = re-priced 1998+ orders;
    // merged = anti-join + union; DuckDB sees the CASE-expression equivalent.
    "agg_after_upsert" -> QuerySpec(
      (s, d) => {
        val orders = t(s, d, "orders")
        val batch = orders
          .filter(col("o_orderdate") >= lit("1998-01-01").cast(TimestampType))
          .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
        val merged = Upsert.merge(orders, batch, Seq("o_orderkey"))
        merged.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |  CAST(SUM(CAST(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
             |                     THEN o_totalprice * 1.1 ELSE o_totalprice END
             |           AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // CDC MERGE (extension tier of §2.10): an I/U/D change batch with a
    // per-key sequence is applied last-writer-wins — the general form of
    // the reference's upsert (which has no deletes). The batch is
    // derived deterministically from the target itself (key residues mod
    // 4: update / delete / update-then-delete conflict + re-insert under
    // a new key / untouched), so DuckDB can state the FINAL table
    // directly — an independent derivation, not a re-simulation.
    "upsert_cdc_apply" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "orders").filter(col("o_orderkey") < 3000)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
        val m = col("k") % 4
        val updates = base.filter(m === 0).select(col("k"),
          (col("price") + 1000).as("price"), lit("U").as("op"), lit(1L).as("seq"))
        val deletes = base.filter(m === 1).select(col("k"),
          lit(null).cast(DoubleType).as("price"), lit("D").as("op"), lit(1L).as("seq"))
        val conflictU = base.filter(m === 2).select(col("k"),
          (col("price") * 2).as("price"), lit("U").as("op"), lit(1L).as("seq"))
        val conflictD = base.filter(m === 2).select(col("k"),
          lit(null).cast(DoubleType).as("price"), lit("D").as("op"), lit(2L).as("seq"))
        val inserts = base.filter(m === 2).select((col("k") + 1000000L).as("k"),
          col("price"), lit("I").as("op"), lit(1L).as("seq"))
        val changes = updates.unionByName(deletes).unionByName(conflictU)
          .unionByName(conflictD).unionByName(inserts)
        Upsert.applyChanges(base, changes, Seq("k")).orderBy(col("k"))
      },
      Some("""SELECT k, price FROM (
             |  SELECT o_orderkey AS k, o_totalprice + 1000 AS price
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 3
             |  UNION ALL
             |  SELECT o_orderkey + 1000000, o_totalprice
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 2
             |) ORDER BY k""".stripMargin)),

    // TIME TRAVEL over the same change log (Upsert.stateAt): the state
    // AS OF seq 1 — after the first change wave but BEFORE the seq-2
    // delete that resolves the update-then-delete conflict, so the
    // conflicted keys (mod 4 = 2) surface with their ×2 update STILL
    // VISIBLE, the version upsert_cdc_apply's latest-state view can
    // never show. The log alone is the source of truth (base rows ride
    // as I ops at seq 0); duplicate (key,seq) and unknown ops
    // raise_error in-plan. DuckDB states the as-of-1 table directly —
    // an independent derivation, not a log re-simulation.
    "upsert_time_travel" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "orders").filter(col("o_orderkey") < 3000)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
        val m = col("k") % 4
        val initial = base.select(col("k"), col("price"),
          lit("I").as("op"), lit(0L).as("seq"))
        val updates = base.filter(m === 0).select(col("k"),
          (col("price") + 1000).as("price"), lit("U").as("op"), lit(1L).as("seq"))
        val deletes = base.filter(m === 1).select(col("k"),
          lit(null).cast(DoubleType).as("price"), lit("D").as("op"), lit(1L).as("seq"))
        val conflictU = base.filter(m === 2).select(col("k"),
          (col("price") * 2).as("price"), lit("U").as("op"), lit(1L).as("seq"))
        val conflictD = base.filter(m === 2).select(col("k"),
          lit(null).cast(DoubleType).as("price"), lit("D").as("op"), lit(2L).as("seq"))
        val inserts = base.filter(m === 2).select((col("k") + 1000000L).as("k"),
          col("price"), lit("I").as("op"), lit(1L).as("seq"))
        val log = initial.unionByName(updates).unionByName(deletes)
          .unionByName(conflictU).unionByName(conflictD).unionByName(inserts)
        Upsert.stateAt(log, Seq("k"), asOfSeq = 1L).orderBy(col("k"))
      },
      Some("""SELECT k, price FROM (
             |  SELECT o_orderkey AS k, o_totalprice + 1000 AS price
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice * 2
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 2
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 3
             |  UNION ALL
             |  SELECT o_orderkey + 1000000, o_totalprice
             |  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 4 = 2
             |) ORDER BY k""".stripMargin)),

    // SCD Type-2 history build (§2.10 extension): the change log is the
    // orders table itself — entity = o_custkey % 300, version order =
    // o_orderkey, tracked attributes = (status, priority). Consecutive
    // identical snapshots collapse; validity chains via lead(). The
    // oracle restates the two-window formulation independently with
    // IS DISTINCT FROM.
    "upsert_scd2_history" -> QuerySpec(
      (s, d) => {
        val log = t(s, d, "orders").select(
          (col("o_custkey") % 300).as("k"), col("o_orderkey").as("seq"),
          col("o_orderstatus").as("status"), col("o_orderpriority").as("prio"))
        Upsert.scd2(log, Seq("k"), "seq", Seq("status", "prio"))
          .orderBy(col("k"), col("valid_from"))
      },
      Some("""WITH log AS (
             |  SELECT o_custkey % 300 AS k, o_orderkey AS seq,
             |    o_orderstatus AS status, o_orderpriority AS prio
             |  FROM orders),
             |chg AS (
             |  SELECT *,
             |    (ROW_NUMBER() OVER w = 1
             |     OR status IS DISTINCT FROM lag(status) OVER w
             |     OR prio IS DISTINCT FROM lag(prio) OVER w) AS is_chg
             |  FROM log WINDOW w AS (PARTITION BY k ORDER BY seq)),
             |v AS (SELECT k, seq, status, prio FROM chg WHERE is_chg)
             |SELECT k, status, prio, seq AS valid_from,
             |  lead(seq) OVER w2 AS valid_to,
             |  (lead(seq) OVER w2 IS NULL) AS is_current
             |FROM v WINDOW w2 AS (PARTITION BY k ORDER BY seq)
             |ORDER BY k, valid_from""".stripMargin)),

    // Snapshot diff (upsert verification): `after` drops every 7th key,
    // re-prices every 5th, and adds a shifted-key slice — the engine
    // diffs digest-slim sides through a full-outer join; the oracle
    // DERIVES each class directly from the residue arithmetic instead
    // of re-running a diff (independent formulation).
    "upsert_snapshot_diff" -> QuerySpec(
      (s, d) => {
        val before = t(s, d, "orders").filter(col("o_orderkey") < 5000)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
            col("o_totalprice").as("price"))
        val after = before.filter(col("k") % 7 =!= 0)
          .withColumn("price",
            when(col("k") % 5 === 0, col("price") + 10).otherwise(col("price")))
          .unionByName(before.filter(col("k") % 9 === 0)
            .select((col("k") + 1000000L).as("k"), col("status"), col("price")))
        Upsert.snapshotDiff(before, after, Seq("k"))
          .orderBy(col("k"))
      },
      Some("""SELECT k, diff_status FROM (
             |  SELECT o_orderkey + 1000000 AS k, 'added' AS diff_status
             |  FROM orders WHERE o_orderkey < 5000 AND o_orderkey % 9 = 0
             |  UNION ALL
             |  SELECT o_orderkey, 'removed'
             |  FROM orders WHERE o_orderkey < 5000 AND o_orderkey % 7 = 0
             |  UNION ALL
             |  SELECT o_orderkey, 'changed'
             |  FROM orders
             |  WHERE o_orderkey < 5000 AND o_orderkey % 7 <> 0
             |    AND o_orderkey % 5 = 0
             |) ORDER BY k""".stripMargin)),

    // As-of join (extension): each event picks up the most recent prior
    // signup of the same user. Both sides truncated to whole seconds
    // (events.ts is ns in parquet, µs in Spark — the match boundary must
    // not depend on sub-µs digits), right side pre-aggregated to one row
    // per (user, second) so the match is well-defined.
    "join_asof" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"), col("value"))
        val sg = t(s, d, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("second", col("ts")).as("sg_ts"))
          .agg(min(col("value")).as("sg_value"))
        AsOfJoin.asOf(ev, sg, keys = Seq("user_id"),
          leftTs = "ts_s", rightTs = "sg_ts", rightValueCols = Seq("sg_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
             |  FROM events),
             |sg AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sg_ts,
             |    MIN(value) AS sg_value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_s, e.value,
             |  s.sg_ts AS matched_sg_ts, s.sg_value
             |FROM ev e ASOF LEFT JOIN sg s
             |  ON e.user_id = s.user_id AND e.ts_s >= s.sg_ts
             |ORDER BY e.event_id""".stripMargin)),

    // As-of join, FORWARD direction (round 13, the pandas merge_asof
    // surface): smallest right ts >= left ts — the next-scheduled
    // lookup (next maintenance window, next price reset). Same
    // tag-union-window cost envelope, the side order reversed so the
    // equal-timestamp match stays inclusive. DuckDB's ASOF JOIN takes
    // the direction from the inequality.
    "join_asof_forward" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"), col("value"))
        val sg = t(s, d, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("second", col("ts")).as("sg_ts"))
          .agg(min(col("value")).as("sg_value"))
        AsOfJoin.asOf(ev, sg, keys = Seq("user_id"),
          leftTs = "ts_s", rightTs = "sg_ts", rightValueCols = Seq("sg_value"),
          direction = "forward")
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
             |  FROM events),
             |sg AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sg_ts,
             |    MIN(value) AS sg_value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_s, e.value,
             |  s.sg_ts AS matched_sg_ts, s.sg_value
             |FROM ev e ASOF LEFT JOIN sg s
             |  ON e.user_id = s.user_id AND e.ts_s <= s.sg_ts
             |ORDER BY e.event_id""".stripMargin)),

    // As-of join, NEAREST direction: the closer of the backward and
    // forward matches, exact ties to BACKWARD (the pandas rule). Two
    // window sorts over one key exchange. DuckDB has no native nearest
    // — the oracle restates it as a correlated LATERAL argmin over
    // |epoch delta| with the backward-preference tie key, which
    // decorrelates to a per-key rank in both engines' planners.
    "join_asof_nearest" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"), col("value"))
        val sg = t(s, d, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("second", col("ts")).as("sg_ts"))
          .agg(min(col("value")).as("sg_value"))
        AsOfJoin.asOf(ev, sg, keys = Seq("user_id"),
          leftTs = "ts_s", rightTs = "sg_ts", rightValueCols = Seq("sg_value"),
          direction = "nearest")
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
             |  FROM events),
             |sg AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sg_ts,
             |    MIN(value) AS sg_value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_s, e.value,
             |  m.sg_ts AS matched_sg_ts, m.sg_value
             |FROM ev e LEFT JOIN LATERAL (
             |  SELECT s.sg_ts, s.sg_value FROM sg s
             |  WHERE s.user_id = e.user_id
             |  ORDER BY ABS(epoch(e.ts_s) - epoch(s.sg_ts)) ASC,
             |    CASE WHEN s.sg_ts <= e.ts_s THEN 0 ELSE 1 END ASC
             |  LIMIT 1) m ON TRUE
             |ORDER BY e.event_id""".stripMargin)),

    // As-of join with a STALENESS BOUND (toleranceSeconds): same match
    // as join_asof, but a signup more than 1 hour old is not "recent
    // enough" — the whole matched payload (timestamp AND value, never
    // a torn half) degrades to NULL. The guard every sensor/price
    // lookup needs; a post-window predicate, so the one-shuffle cost
    // envelope of the tag-union-window as-of is unchanged.
    "join_asof_tolerance" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"), col("value"))
        val sg = t(s, d, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"), date_trunc("second", col("ts")).as("sg_ts"))
          .agg(min(col("value")).as("sg_value"))
        AsOfJoin.asOf(ev, sg, keys = Seq("user_id"),
          leftTs = "ts_s", rightTs = "sg_ts",
          rightValueCols = Seq("sg_value"),
          toleranceSeconds = Some(3600L))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
             |  FROM events),
             |sg AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sg_ts,
             |    MIN(value) AS sg_value
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_s, e.value,
             |  CASE WHEN epoch_us(e.ts_s) - epoch_us(s.sg_ts) <= 3600000000
             |    THEN s.sg_ts END AS matched_sg_ts,
             |  CASE WHEN epoch_us(e.ts_s) - epoch_us(s.sg_ts) <= 3600000000
             |    THEN s.sg_value END AS sg_value
             |FROM ev e ASOF LEFT JOIN sg s
             |  ON e.user_id = s.user_id AND e.ts_s >= s.sg_ts
             |ORDER BY e.event_id""".stripMargin)),

    // Scalar-function battery (SURVEY.md §2.9): concat/format_string/
    // substring/upper/regexp_extract/to_date/year/datediff/round in one
    // projection. round is HALF_UP in both engines for doubles (probed).
    "fn_string_date" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .withColumn("odate", col("o_orderdate").cast(DateType))
        .select(
          col("o_orderkey"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
          format_string("ord-%05d", col("o_orderkey")).as("padded"),
          upper(substring(col("o_orderpriority"), 3, 20)).as("prio"),
          regexp_extract(col("o_orderpriority"), "^(\\d+)-", 1).cast(IntegerType).as("prio_num"),
          col("odate"),
          year(col("odate")).as("o_year"),
          datediff(lit("1999-01-01").cast(DateType), col("odate")).as("days_to_99"),
          // round on DECIMAL, not double: Spark rounds a double's shortest
          // decimal repr while DuckDB rounds the binary value, so
          // round(x/100.0, 2) diverges on .xx5 boundaries. Casting to an
          // exact DECIMAL first makes HALF_UP identical in both engines.
          round(col("o_totalprice").cast(DecimalType(18, 2)), 1)
            .cast(DoubleType).as("price_r"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  o_orderstatus || '-' || o_orderpriority AS tag,
             |  printf('ord-%05d', o_orderkey) AS padded,
             |  upper(substr(o_orderpriority, 3)) AS prio,
             |  CAST(regexp_extract(o_orderpriority, '^(\d+)-', 1) AS INTEGER) AS prio_num,
             |  CAST(o_orderdate AS DATE) AS odate,
             |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to_99,
             |  CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------- set ops
    // union = bag semantics (README.md:1529) ⇒ UNION ALL on the oracle.
    "setop_union" -> QuerySpec(
      (s, d) => {
        val o = t(s, d, "orders")
        val a = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val b = o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        a.union(b).orderBy(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |  WHERE o_orderpriority = '1-URGENT'
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |  WHERE o_orderstatus = 'F')
             |ORDER BY o_orderkey, o_orderstatus, o_totalprice""".stripMargin)),

    "setop_intersect" -> QuerySpec(
      (s, d) => {
        val c = t(s, d, "customer")
        val a = c.filter(col("c_acctbal") > 0).select(col("c_nationkey"), col("c_mktsegment"))
        val b = c.filter(col("c_mktsegment") =!= "BUILDING").select(col("c_nationkey"), col("c_mktsegment"))
        a.intersect(b).orderBy(col("c_nationkey"), col("c_mktsegment"))
      },
      Some("""SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0
             |INTERSECT
             |SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment <> 'BUILDING'
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    "setop_except" -> QuerySpec(
      (s, d) => {
        val c = t(s, d, "customer")
        val a = c.select(col("c_nationkey"), col("c_mktsegment"))
        val b = c.filter(col("c_acctbal") < 0).select(col("c_nationkey"), col("c_mktsegment"))
        a.except(b).orderBy(col("c_nationkey"), col("c_mktsegment"))
      },
      Some("""SELECT c_nationkey, c_mktsegment FROM customer
             |EXCEPT
             |SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < 0
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    // BAG-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicity
    // is the answer — min(countA, countB) / countA − countB copies per
    // row — which DISTINCT-flavored setop_intersect/except destroy.
    // The dedup-bookkeeping semantics (how many copies survive), and a
    // different physical plan: Spark rewrites both to an aggregate of
    // per-side counts + generate, never a join.
    "setop_intersect_all" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.filter(col("l_quantity") > 10).select(col("l_returnflag"), col("l_linenumber"))
        val b = li.filter(col("l_discount") > 0.02).select(col("l_returnflag"), col("l_linenumber"))
        a.intersectAll(b).orderBy(col("l_returnflag"), col("l_linenumber"))
      },
      Some("""SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_quantity > 10
             |INTERSECT ALL
             |SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_discount > 0.02
             |ORDER BY l_returnflag, l_linenumber""".stripMargin)),

    "setop_except_all" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val a = li.select(col("l_returnflag"), col("l_linenumber"))
        val b = li.filter(col("l_quantity") > 25).select(col("l_returnflag"), col("l_linenumber"))
        a.exceptAll(b).orderBy(col("l_returnflag"), col("l_linenumber"))
      },
      Some("""SELECT l_returnflag, l_linenumber FROM lineitem
             |EXCEPT ALL
             |SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_quantity > 25
             |ORDER BY l_returnflag, l_linenumber""".stripMargin)),

    // NULL-safe equality join (<=> / IS NOT DISTINCT FROM): the join
    // variant where NULL keys MATCH each other — plain equi-join
    // silently drops them, the classic missing-dimension-key bug. Both
    // sides aggregate to the key grain FIRST (slim inputs; a raw
    // null-safe join would cross-product every NULL-key row pair), the
    // priority '1-URGENT' is mapped to NULL on both engines to make
    // the matched-NULL row observable. Ordering pins NULLS FIRST
    // explicitly — the engines' ASC defaults differ.
    "join_null_safe" -> QuerySpec(
      (s, d) => {
        val o = t(s, d, "orders")
        val key = nullif(col("o_orderpriority"), lit("1-URGENT")).as("pr")
        val a = o.groupBy(key).agg(count(lit(1)).as("n_all"))
        // distinct alias on the right key sidesteps self-join ambiguity
        // (both sides derive from the same scan)
        val b = o.filter(col("o_totalprice") > 150000)
          .groupBy(key).agg(count(lit(1)).as("n_big"))
          .withColumnRenamed("pr", "pr_b")
        a.join(b, col("pr") <=> col("pr_b"), "left")
          .select(col("pr"), col("n_all"),
            coalesce(col("n_big"), lit(0L)).as("n_big"))
          .orderBy(col("pr").asc_nulls_first)
      },
      Some("""WITH a AS (
             |  SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             |    count(*) AS n_all FROM orders GROUP BY 1),
             |b AS (
             |  SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
             |    count(*) AS n_big FROM orders
             |  WHERE o_totalprice > 150000 GROUP BY 1)
             |SELECT a.pr, a.n_all, coalesce(b.n_big, 0) AS n_big
             |FROM a LEFT JOIN b ON a.pr IS NOT DISTINCT FROM b.pr
             |ORDER BY a.pr NULLS FIRST""".stripMargin)),

    // Join fan-out profile: the multiplicity histogram of a
    // parent→child join (how many lineitems per order, INCLUDING
    // zero-child parents via the left join) — the data-modeling gate
    // that catches join explosion before a 100 TB query pays for it:
    // a fan histogram with a heavy tail means the join key is not what
    // the modeler thinks it is. Two slim aggregations (child counts,
    // then histogram) + one broadcast-size left join.
    "profile_join_fanout" -> QuerySpec(
      (s, d) => {
        val per = t(s, d, "lineitem")
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("_fan"))
        t(s, d, "orders").select(col("o_orderkey"))
          .join(per, col("o_orderkey") === col("l_orderkey"), "left")
          .select(coalesce(col("_fan"), lit(0L)).as("fan"))
          .groupBy(col("fan")).agg(count(lit(1)).as("n_parents"))
          .orderBy(col("fan"))
      },
      Some("""WITH per AS (
             |  SELECT l_orderkey, count(*) AS fan FROM lineitem GROUP BY 1)
             |SELECT coalesce(per.fan, 0) AS fan, count(*) AS n_parents
             |FROM orders LEFT JOIN per ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // -------------------------------------------------------------- windows
    // Extension surface (SURVEY.md §2.6): ranking / analytic / frames.
    "win_rank" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
             |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             |        row_number() OVER (PARTITION BY o_orderpriority
             |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin)),

    "win_lag_delta" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, value,
             |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // 7-row moving window; sum/count kept separate so both engines divide
    // the same exact decimal sum (no segment-tree float reassociation).
    "win_moving_avg" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(-6, 0)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            sum(col("value").cast(DecimalType(18, 6))).over(w).cast(DoubleType).as("mv_sum"),
            count(lit(1)).over(w).as("mv_n"))
          .withColumn("mv_avg", col("mv_sum") / col("mv_n"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS mv_sum,
             |  COUNT(*) OVER w AS mv_n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / COUNT(*) OVER w AS mv_avg
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // MOVING MEDIAN (round 13): the robust moving smoother beside
    // win_moving_avg — one corrupt spike moves a 5-point mean by 1/5
    // of its magnitude but cannot move the median at all (the
    // monitoring rationale of profile_mad_outliers, in window form).
    // Exactness: values quantize to deci-units by round() (round, NOT
    // floor — v·10 of an n/10 double lands within 1 ulp of n, and
    // floor's representation-boundary surprises are a pinned trap),
    // the frame's sorted list is exact longs, and the median is either
    // an integer or a dyadic half — bit-exact in double — with ONE
    // mirrored division back to value units.
    "win_moving_median" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(-4, 0)
        val lst = sort_array(collect_list(
          round(col("value") * 10).cast(LongType)).over(w))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            lst.as("_l"))
          .withColumn("med5",
            when(size(col("_l")) % 2 === 1,
              element_at(col("_l"),
                ((size(col("_l")) + 1) / 2).cast(IntegerType))
                .cast(DoubleType))
              .otherwise(
                (element_at(col("_l"),
                  (size(col("_l")) / 2).cast(IntegerType)) +
                  element_at(col("_l"),
                    (size(col("_l")) / 2).cast(IntegerType) + 1))
                  .cast(DoubleType) / lit(2.0))
              / lit(10.0))
          .drop("_l")
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH l AS (
             |  SELECT user_id, event_id, value,
             |    list_sort(list(CAST(round(value * 10) AS BIGINT)) OVER (
             |      PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS ls
             |  FROM events)
             |SELECT user_id, event_id, value,
             |  CASE WHEN len(ls) % 2 = 1
             |    THEN CAST(ls[(len(ls) + 1) // 2] AS DOUBLE)
             |    ELSE CAST(ls[len(ls) // 2] + ls[len(ls) // 2 + 1] AS DOUBLE)
             |         / 2.0 END / 10.0 AS med5
             |FROM l ORDER BY user_id, event_id""".stripMargin)),

    // Value-based window functions over the FULL frame: first/last/nth
    // need UNBOUNDED FOLLOWING (the default frame stops at CURRENT ROW —
    // a classic silent-wrong-answer trap both engines share).
    "win_first_last" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("cheapest"),
            last(col("o_orderkey")).over(w).as("dearest"),
            nth_value(col("o_orderkey"), 3).over(w).as("third"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |  first_value(o_orderkey) OVER w AS cheapest,
             |  last_value(o_orderkey) OVER w AS dearest,
             |  nth_value(o_orderkey, 3) OVER w AS third
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // RANGE frame (value-based, not row-based): peers within 1000 price
    // units backward — the frame every sliding-aggregate-over-values
    // query needs; count only (float sums over value frames would need
    // the decimal discipline AND identical peer grouping).
    "win_range_frame" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-1000L, 0L)
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            count(lit(1)).over(w).as("n_within_1000"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
             |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
             |                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
             |FROM orders ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // Unpivot/melt (wide → long): the Dataset.unpivot API; oracle is the
    // equivalent UNION ALL.
    "fn_unpivot" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_custkey").cast(DoubleType).as("custkey_d"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("o_totalprice"), col("custkey_d")), "var", "val")
        .orderBy(col("o_orderkey"), col("var")),
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, 'o_totalprice' AS var, o_totalprice AS val FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, 'custkey_d' AS var, CAST(o_custkey AS DOUBLE) AS val FROM orders)
             |ORDER BY o_orderkey, var""".stripMargin)),

    // ---------------------------------------------------------------- dedup
    // Exact dedup with a deterministic winner (min doc_id per text).
    "dedup_exact" -> QuerySpec(
      (s, d) => DedupOps.exactDedup(t(s, d, "documents"), Seq("text"), "doc_id")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
      Some("""SELECT d.doc_id, d.lang, d.source FROM documents d
             |JOIN (SELECT text, MIN(doc_id) AS m FROM documents GROUP BY text) k
             |  ON d.doc_id = k.m
             |ORDER BY d.doc_id""".stripMargin)),

    // Prefix-truncation duplicates (DedupOps.prefixTruncationPairs) —
    // the crawl artifact BETWEEN exact and near dedup: a re-fetch cut
    // off mid-page hashes differently (exact misses it) and a 60%
    // truncation moves Jaccard a lot (shingling treats it as a
    // different doc). Candidates BLOCK on the first 64 characters (one
    // equi-join, the band-join shape — complete by definition of
    // prefix for short sides ≥ 64 chars, the documented bound), then
    // one substring equality confirms. The fixture plants truncated
    // twins at ⅔ length for every 5th long-enough doc; the oracle
    // replays planting, blocking, and confirmation — code-point string
    // semantics match on both engines (the length() contract).
    "dedup_prefix_truncation" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val planted = docs
          .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 130)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            col("text").substr(lit(1),
              expr("(length(text) * 2) div 3")).as("text"))
        DedupOps.prefixTruncationPairs(
          docs.unionByName(planted), "doc_id", "text", blockLen = 64)
          .orderBy(col("short_id"), col("long_id"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000000,
             |    substr(text, 1, (length(text) * 2) // 3)
             |  FROM documents
             |  WHERE doc_id % 5 = 0 AND length(text) >= 130),
             |b AS (
             |  SELECT doc_id, text, length(text) AS len,
             |    substr(text, 1, 64) AS blk
             |  FROM u WHERE text IS NOT NULL AND length(text) >= 64)
             |SELECT s.doc_id AS short_id, l.doc_id AS long_id,
             |  CAST(s.len AS INTEGER) AS short_len,
             |  CAST(l.len AS INTEGER) AS long_len
             |FROM b s JOIN b l ON s.blk = l.blk
             |  AND s.len < l.len AND s.text = substr(l.text, 1, s.len)
             |ORDER BY short_id, long_id""".stripMargin)),

    // MinHash-LSH candidate near-dups, reported as a per-doc candidate
    // count (left join keeps all docs ⇒ rows>0 even with no duplicates).
    // ORACLED since round 11 via the STAGED SIGNATURE TABLE: the xxhash64
    // signatures themselves are engine-specific, but once staged as
    // parquet the whole downstream pipeline — banding (bucket equality ≡
    // band-slice equality), the >707-doc degeneracy prune (the exact
    // doc form of the 250k pair budget), candidate distinct, signature-
    // agreement estimate, 0.5 threshold — is pure relational algebra
    // DuckDB replays. Planted-duplicate recall stays property-tested in
    // DedupSpec.
    "dedup_minhash" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.expressions.GraftFunctions.register(s)
        staged(d, "minhash_sigs") { dir =>
          docs.select(col("doc_id").as("id"),
            call_function("minhash_shingle_sig",
              split(lower(col("text")), "\\s+"), lit(64), lit(3)).as("sig"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pairs = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
          estThreshold = 0.5)
        val cnts = pairs.select(col("id_a").as("doc_id"))
          .union(pairs.select(col("id_b").as("doc_id")))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cand"))
        docs.select(col("doc_id")).join(cnts, Seq("doc_id"), "left")
          .na.fill(0, Seq("n_cand"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH sigs AS (
             |  SELECT id, sig FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/minhash_sigs/*.parquet')),
             |banded AS (
             |  SELECT id, b, sig[b*4+1 : b*4+4] AS band
             |  FROM sigs CROSS JOIN (SELECT unnest([${(0 until 16).mkString(",")}]) AS b)),
             |ok_buckets AS (
             |  SELECT b, band FROM banded GROUP BY b, band HAVING COUNT(*) <= 707),
             |pruned AS (
             |  SELECT bd.id, bd.b, bd.band FROM banded bd
             |  JOIN ok_buckets ob ON ob.b = bd.b AND ob.band = bd.band),
             |cand AS (
             |  SELECT DISTINCT a.id AS id_a, b2.id AS id_b
             |  FROM pruned a JOIN pruned b2
             |    ON a.b = b2.b AND a.band = b2.band AND a.id < b2.id),
             |est AS (
             |  SELECT id_a, id_b,
             |    CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS DOUBLE) / 64 AS est
             |  FROM (SELECT p.id_a, p.id_b, unnest(sa.sig) AS xa, unnest(sb.sig) AS xb
             |        FROM cand p
             |        JOIN sigs sa ON sa.id = p.id_a
             |        JOIN sigs sb ON sb.id = p.id_b)
             |  GROUP BY id_a, id_b),
             |pairs AS (SELECT id_a, id_b FROM est WHERE est >= 0.5),
             |cnt AS (
             |  SELECT doc_id, COUNT(*) AS n_cand FROM (
             |    SELECT id_a AS doc_id FROM pairs
             |    UNION ALL SELECT id_b FROM pairs)
             |  GROUP BY doc_id)
             |SELECT d.doc_id, CAST(COALESCE(c.n_cand, 0) AS BIGINT) AS n_cand
             |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Estimator check for the minhash tier: plant near-duplicates derived
    // from the corpus itself (every 5th doc re-appears with its first two
    // tokens dropped), run the LSH candidate pass, join each candidate
    // pair back to its EXACT shingle-set Jaccard, and report the error.
    // ORACLED since round 11 (the dedup_minhash staged-signature pattern
    // applied to the DERIVED corpus): with the planted corpus's
    // signatures staged, DuckDB replays banding, the 0.4 threshold, the
    // exact shingle Jaccard AND the error statistics. Error sums ride a
    // DECIMAL(20,12) accumulator — per-pair errors are identical doubles
    // in both engines (est = k/64 exact, jaccard one division), and the
    // decimal sum removes the only remaining order sensitivity — so the
    // mean is presented UNROUNDED (round()-of-double half-boundaries are
    // the known cross-engine hazard).
    // CHECKED bound riding the row (the agg_cms_checked pattern): a
    // 64-hash signature estimates Jaccard with std error 1/√64 = 0.125;
    // the fixture must surface pairs AND keep the mean abs error within
    // one std error (measured 0.02-0.05 across SFs — 2-4× margin).
    "dedup_minhash_vs_exact" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        // a quarter of the corpus: the error statistic converges with a
        // few hundred pairs — the full-corpus pass is the (already
        // benched) dedup_minhash key's job, not this check's
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 4 === 0)
        // slice length = size(toks): an Int.MaxValue literal length is
        // correct under codegen but overflows start+length in interpreted
        // eval (returns EMPTY), silently degrading the fixture under any
        // codegen fallback — so use a length that cannot overflow.
        val dropToks = split(col("text"), "\\s+")
        val variants = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat_ws(" ", slice(dropToks, lit(3), size(dropToks)))
              .as("text"))
        val corpus = docs.unionByName(variants)
        staged(d, "minhash_sigs_vsx") { dir =>
          corpus.select(col("doc_id").as("id"),
            call_function("minhash_shingle_sig",
              split(lower(col("text")), "\\s+"), lit(64), lit(3)).as("sig"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pairs = DedupOps.minhashCandidatePairs(corpus, "doc_id", "text",
          estThreshold = 0.4)
        val err = abs(col("est_jaccard") - col("jaccard"))
        DedupOps.exactJaccardForPairs(pairs, corpus, "doc_id", "text")
          .agg(count(lit(1)).as("n_pairs"),
            sum(err.cast(DecimalType(20, 12))).as("__se"),
            max(err).as("max_abs_err"))
          .select(col("n_pairs"),
            (col("__se").cast(DoubleType) / col("n_pairs"))
              .as("mean_abs_err"),
            col("max_abs_err"))
          .withColumn("bound_ok",
            (col("n_pairs") > 0 && col("mean_abs_err") <= 0.125)
              .cast(IntegerType))
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |    array_to_string(string_split_regex(text, '\\s+')[3:], ' ')
             |  FROM documents WHERE doc_id % 4 = 0 AND doc_id % 5 = 0),
             |sigs AS (
             |  SELECT id, sig FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/minhash_sigs_vsx/*.parquet')),
             |banded AS (
             |  SELECT id, b, sig[b*4+1 : b*4+4] AS band
             |  FROM sigs CROSS JOIN (SELECT unnest([${(0 until 16).mkString(",")}]) AS b)),
             |ok_buckets AS (
             |  SELECT b, band FROM banded GROUP BY b, band HAVING COUNT(*) <= 707),
             |pruned AS (
             |  SELECT bd.id, bd.b, bd.band FROM banded bd
             |  JOIN ok_buckets ob ON ob.b = bd.b AND ob.band = bd.band),
             |cand AS (
             |  SELECT DISTINCT a.id AS id_a, b2.id AS id_b
             |  FROM pruned a JOIN pruned b2
             |    ON a.b = b2.b AND a.band = b2.band AND a.id < b2.id),
             |est AS (
             |  SELECT id_a, id_b,
             |    CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS DOUBLE) / 64 AS est
             |  FROM (SELECT p.id_a, p.id_b, unnest(sa.sig) AS xa, unnest(sb.sig) AS xb
             |        FROM cand p
             |        JOIN sigs sa ON sa.id = p.id_a
             |        JOIN sigs sb ON sb.id = p.id_b)
             |  GROUP BY id_a, id_b),
             |pairs AS (SELECT id_a, id_b, est FROM est WHERE est >= 0.4),
             |toks AS (
             |  SELECT doc_id AS id, string_split_regex(lower(text), '\\s+') AS w
             |  FROM corpus),
             |sh AS (
             |  SELECT id, unnest(list_distinct(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |    ELSE [array_to_string(w[i:i+2], ' ')
             |          for i in range(1, len(w) - 1)] END)) AS tok
             |  FROM toks),
             |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
             |inter AS (
             |  SELECT p.id_a, p.id_b, count(*) AS ni
             |  FROM pairs p
             |  JOIN sh a ON a.id = p.id_a
             |  JOIN sh b ON b.id = p.id_b AND b.tok = a.tok
             |  GROUP BY p.id_a, p.id_b),
             |scored AS (
             |  SELECT p.est, CAST(COALESCE(i.ni, 0) AS DOUBLE)
             |      / (sa.n + sb.n - COALESCE(i.ni, 0)) AS jac
             |  FROM pairs p
             |  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
             |  JOIN sizes sa ON sa.id = p.id_a
             |  JOIN sizes sb ON sb.id = p.id_b)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |  CAST(SUM(CAST(abs(est - jac) AS DECIMAL(20,12))) AS DOUBLE)
             |    / COUNT(*) AS mean_abs_err,
             |  MAX(abs(est - jac)) AS max_abs_err,
             |  CAST(COUNT(*) > 0 AND
             |    CAST(SUM(CAST(abs(est - jac) AS DECIMAL(20,12))) AS DOUBLE)
             |      / COUNT(*) <= 0.125 AS INTEGER) AS bound_ok
             |FROM scored""".stripMargin)),

    // SimHash near-dups (hamming ≤ 3 via 16-bit chunk LSH); same per-doc
    // count shape. ORACLED since round 11 via the staged signature
    // table (the dedup_minhash pattern): with the packed 64-bit sigs on
    // disk, chunk bucketing ((sig >> 16·ci) & 0xFFFF — the mask makes
    // arithmetic and logical shift agree), pair distinct and the
    // bit_count(xor) ≤ 3 verify are all engine-portable.
    "dedup_simhash" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.expressions.GraftFunctions.register(s)
        staged(d, "simhash_sigs") { dir =>
          docs.select(col("doc_id").as("id"),
            call_function("simhash_sig",
              split(lower(col("text")), "\\s+")).as("sig"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pairs = DedupOps.simhashDupPairs(docs, "doc_id", "text")
        val cnts = pairs.select(col("id_a").as("doc_id"))
          .union(pairs.select(col("id_b").as("doc_id")))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
        docs.select(col("doc_id")).join(cnts, Seq("doc_id"), "left")
          .na.fill(0, Seq("n_dup"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH sigs AS (
             |  SELECT id, sig FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/simhash_sigs/*.parquet')),
             |chunked AS (
             |  SELECT id, sig, ci, (sig >> (ci*16)) & 65535 AS chunk
             |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS ci)),
             |cand AS (
             |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |    a.sig AS sig_a, b.sig AS sig_b
             |  FROM chunked a JOIN chunked b
             |    ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM cand
             |  WHERE bit_count(xor(sig_a, sig_b)) <= 3),
             |cnt AS (
             |  SELECT doc_id, COUNT(*) AS n_dup FROM (
             |    SELECT id_a AS doc_id FROM pairs
             |    UNION ALL SELECT id_b FROM pairs)
             |  GROUP BY doc_id)
             |SELECT d.doc_id, CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup
             |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // SimHash → CHECKED estimator (the dedup_minhash_vs_exact pattern
    // for the last unchecked sketch): the hamming≤3 near-dup pair set
    // joins back to EXACT shingle Jaccard, side by side with a
    // deterministic offset-pair baseline (doc d vs d+40 — unrelated
    // docs from the same corpus). The property the sketch exists for —
    // near pairs score far above background — is measured IN-query:
    // `separated` = near-pair mean Jaccard > baseline mean + 0.2, both
    // rows carry it. Planted variants are token ROTATIONS (first 3
    // tokens moved to the end): SimHash is order-invariant over the
    // token multiset, so a rotation has hamming 0 — guaranteed in the
    // near set — while its 3-gram shingle set differs at the ~6
    // boundary shingles (Jaccard ≈ 0.7, not 1). Token-DROP variants
    // (the minhash fixture) would not do here: on ~40-token docs a
    // single edit flips many of the 64 sign-sum bits, so hamming ≤ 3
    // catches them only by luck. Signature is xxhash64-based ⇒
    // rows-only tier; `separated` is also unit-asserted (DedupSpec).
    // ORACLED since round 11 (the dedup_minhash_vs_exact pattern): the
    // rotated corpus's packed signatures are staged, so DuckDB replays
    // chunk LSH + hamming ≤ 3, the offset baseline, the exact shingle
    // Jaccard and the separation/bound flags. Jaccard means ride a
    // DECIMAL(20,12) accumulator and present UNROUNDED (the round()-of-
    // double half-boundary hazard), mins are raw identical doubles.
    "dedup_simhash_vs_exact" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        val docs0 = t(s, d, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 4 === 0)
        val toks = split(col("text"), "\\s+")
        val variants = docs0.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            // size(toks) length, not Int.MaxValue: see dedup_minhash_vs_exact
            array_join(concat(slice(toks, lit(4), size(toks)), slice(toks, 1, 3)), " ")
              .as("text"))
        val corpus = docs0.unionByName(variants)
        staged(d, "simhash_sigs_vsx") { dir =>
          corpus.select(col("doc_id").as("id"),
            call_function("simhash_sig",
              split(lower(col("text")), "\\s+")).as("sig"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val near = DedupOps.simhashDupPairs(corpus, "doc_id", "text")
          .select(col("id_a"), col("id_b"), lit("simhash_near").as("bucket"))
        val baseline = docs0.select(col("doc_id").as("id_a"),
            (col("doc_id") + 40L).as("id_b"))
          .join(docs0.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
          .select(col("id_a"), col("id_b"), lit("offset_baseline").as("bucket"))
        val scored = DedupOps.exactJaccardForPairs(
          near.unionByName(baseline), corpus, "doc_id", "text")
        val w = Window.partitionBy()
        scored.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("jaccard").cast(DecimalType(20, 12))).as("__sj"),
            min(col("jaccard")).as("min_jaccard"))
          .select(col("bucket"), col("n_pairs"),
            (col("__sj").cast(DoubleType) / col("n_pairs"))
              .as("mean_jaccard"),
            col("min_jaccard"))
          .withColumn("separated",
            (max(when(col("bucket") === "simhash_near", col("mean_jaccard"))).over(w) >
              max(when(col("bucket") === "offset_baseline", col("mean_jaccard"))).over(w)
                + 0.2).cast(IntegerType))
          // CHECKED bound: separation must hold AND both buckets must be
          // non-degenerate (every planted rotation is hamming-0 ⇒ the
          // near bucket can never be empty; an empty baseline would make
          // `separated` vacuous)
          .withColumn("bound_ok",
            (col("separated") === 1 &&
              min(col("n_pairs")).over(w) > 0).cast(IntegerType))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |    array_to_string(
             |      string_split_regex(text, '\\s+')[4:] ||
             |      string_split_regex(text, '\\s+')[1:3], ' ')
             |  FROM documents WHERE doc_id % 4 = 0 AND doc_id % 5 = 0),
             |sigs AS (
             |  SELECT id, sig FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/simhash_sigs_vsx/*.parquet')),
             |chunked AS (
             |  SELECT id, sig, ci, (sig >> (ci*16)) & 65535 AS chunk
             |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS ci)),
             |near AS (
             |  SELECT id_a, id_b, 'simhash_near' AS bucket FROM (
             |    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             |      a.sig AS sig_a, b.sig AS sig_b
             |    FROM chunked a JOIN chunked b
             |      ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id)
             |  WHERE bit_count(xor(sig_a, sig_b)) <= 3),
             |baseline AS (
             |  SELECT a.doc_id AS id_a, a.doc_id + 40 AS id_b,
             |    'offset_baseline' AS bucket
             |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 40
             |  WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 = 0),
             |allp AS (SELECT * FROM near UNION ALL SELECT * FROM baseline),
             |toks AS (
             |  SELECT doc_id AS id, string_split_regex(lower(text), '\\s+') AS w
             |  FROM corpus),
             |sh AS (
             |  SELECT id, unnest(list_distinct(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |    ELSE [array_to_string(w[i:i+2], ' ')
             |          for i in range(1, len(w) - 1)] END)) AS tok
             |  FROM toks),
             |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
             |inter AS (
             |  SELECT p.id_a, p.id_b, count(*) AS ni
             |  FROM allp p
             |  JOIN sh a ON a.id = p.id_a
             |  JOIN sh b ON b.id = p.id_b AND b.tok = a.tok
             |  GROUP BY p.id_a, p.id_b),
             |scored AS (
             |  SELECT p.bucket, CAST(COALESCE(i.ni, 0) AS DOUBLE)
             |      / (sa.n + sb.n - COALESCE(i.ni, 0)) AS jac
             |  FROM allp p
             |  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
             |  JOIN sizes sa ON sa.id = p.id_a
             |  JOIN sizes sb ON sb.id = p.id_b),
             |by_bucket AS (
             |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |    CAST(SUM(CAST(jac AS DECIMAL(20,12))) AS DOUBLE)
             |      / COUNT(*) AS mean_jaccard,
             |    MIN(jac) AS min_jaccard
             |  FROM scored GROUP BY bucket),
             |flags AS (
             |  SELECT
             |    CAST(MAX(CASE WHEN bucket = 'simhash_near'
             |          THEN mean_jaccard END) >
             |         MAX(CASE WHEN bucket = 'offset_baseline'
             |          THEN mean_jaccard END) + 0.2 AS INTEGER) AS separated,
             |    CAST(MAX(CASE WHEN bucket = 'simhash_near'
             |          THEN mean_jaccard END) >
             |         MAX(CASE WHEN bucket = 'offset_baseline'
             |          THEN mean_jaccard END) + 0.2
             |      AND MIN(n_pairs) > 0 AS INTEGER) AS bound_ok
             |  FROM by_bucket)
             |SELECT b.bucket, b.n_pairs, b.mean_jaccard, b.min_jaccard,
             |  f.separated, f.bound_ok
             |FROM by_bucket b CROSS JOIN flags f
             |ORDER BY b.bucket""".stripMargin)),

    // Near-dup CLUSTERING: connected components over the exact bigram-
    // shingle Jaccard pair graph (bigrams: the synthetic corpus is
    // near-uniform in unigram space — every pair clears any unigram
    // threshold — while 3-gram shingles isolate only the planted dups;
    // bigrams at 0.3 yield ~24 multi-doc clusters including transitive
    // 3-chains, so the fixpoint is actually exercised). Iterative
    // min-label propagation on the engine side; the oracle states the
    // same fixpoint as DuckDB recursive-CTE reachability (min reachable
    // id = cluster id) — an independent formulation, so agreement
    // checks the algorithm, not the implementation.
    "dedup_cluster_cc" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 0.3, shingleN = 2)
          .select(col("id_a"), col("id_b"))
        DedupOps.connectedComponents(
          docs.select(col("doc_id")), pairs, "doc_id", "id_a", "id_b")
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 500),
             |toks AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS tok
             |  FROM base),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l)
             |SELECT id AS doc_id, min(l) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // Same clusters via the alternating large-star/small-star algorithm
    // (the O(log n)-round chain-graph path) — two independent engine
    // implementations against ONE independent oracle formulation.
    "dedup_cluster_cc_largestar" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 0.3, shingleN = 2)
          .select(col("id_a"), col("id_b"))
        DedupOps.connectedComponentsLargeStar(
          docs.select(col("doc_id")), pairs, "doc_id", "id_a", "id_b")
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 500),
             |toks AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS tok
             |  FROM base),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l)
             |SELECT id AS doc_id, min(l) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

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
        val blocks = GeoOps.explodeNeighborCells(
          pts, "lat", "lon", precision = 4)
          .select(col("c_custkey"), col("cell"))
        val cand = blocks.as("a")
          .join(home.as("b"),
            col("a.cell") === col("b.cell") &&
              col("a.c_custkey") < col("b.c_custkey"))
          .select(col("a.c_custkey").as("ka"), col("b.c_custkey").as("kb"))
          .distinct()
        val same = home.as("a")
          .join(home.as("b"),
            col("a.cell") === col("b.cell") &&
              col("a.c_custkey") < col("b.c_custkey"))
          .agg(count(lit(1)).as("n_same"))
        cand.agg(count(lit(1)).as("n_pairs_total"),
            sum(col("ka") + col("kb")).as("pair_key_sum"))
          .crossJoin(broadcast(same))
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

    // PCA projection of the embedding table to its top-3 components.
    // ORACLED since round 11 via the STAGED LOADINGS artifact (the
    // IVF/PQ model pattern): the eigensolve's loading matrix — whose
    // SIGNS are run-arbitrary, the old rows-only reason — is snapped to
    // the micro grid and staged as parquet, milli-grid vectors make
    // each projection an exact integer dot, and ALL the geometry checks
    // move onto exact integer/decimal arithmetic both engines replay:
    // projected variances (n·Q − S², exact decimals) monotone
    // decreasing, top-3 captured variance ≥ the 3/64 isotropy floor
    // (64·Σvar ≥ 3e12·totvar — the 1e12 bridges the micro²-scale
    // projections to the milli-scale dims), and the STAGED matrix
    // orthonormal at grid resolution (|dot_q| ≤ 1e9 off-diagonal,
    // |dot_q − 1e12| ≤ 1e9 diagonal).
    "sim_embed_pca" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val L = pcaModel(s, d)
        staged(d, "pca_loadings") { dir =>
          import s.implicits._
          L.zipWithIndex.map { case (row, j) => (j + 1, row.toSeq) }.toSeq
            .toDF("j", "loading")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        // grid-resolution orthonormality of the STAGED matrix — plain
        // exact Long arithmetic on the driver-side model (the oracle
        // recomputes the same integers from the staged table)
        var maxOffQ = 0L; var maxDiagErrQ = 0L
        for (a <- L.indices; b <- L.indices) {
          val dot = (L(a), L(b)).zipped.map(_ * _).sum
          if (a == b)
            maxDiagErrQ = math.max(maxDiagErrQ, math.abs(dot - 1000000000000L))
          else maxOffQ = math.max(maxOffQ, math.abs(dot))
        }
        val proj = emb
          .select(col("vec_id"),
            SimilarityOps.quantize(col("embedding")).as("_qv"))
          .select(col("vec_id") +: (1 to 3).map(j =>
            SimilarityOps.dotLong(col("_qv"),
              array(L(j - 1).map(lit): _*)).as(s"pc${j}_q")): _*)
        val dec = (c: Column) => c.cast(DecimalType(19, 0))
        val aggs = count(lit(1)).as("__n") +:
          (1 to 3).flatMap(j => Seq(
            sum(dec(col(s"pc${j}_q"))).as(s"__s$j"),
            sum(dec(col(s"pc${j}_q")) * dec(col(s"pc${j}_q"))).as(s"__q$j")))
        val stats = proj.agg(aggs.head, aggs.tail: _*)
        val totVar = emb
          .select(posexplode(SimilarityOps.quantize(col("embedding")))
            .as(Seq("_p", "_x")))
          .groupBy(col("_p"))
          .agg(count(lit(1)).as("__dn"),
            sum(dec(col("_x"))).as("__ds"),
            sum(dec(col("_x")) * dec(col("_x"))).as("__dq"))
          .select((col("__dq") * col("__dn") -
            col("__ds") * col("__ds")).as("__dv"))
          .agg(sum(col("__dv")).as("__tot"))
        def v(j: Int): Column =
          col(s"__q$j") * col("__n") - col(s"__s$j") * col(s"__s$j")
        proj.crossJoin(broadcast(stats)).crossJoin(broadcast(totVar))
          .withColumn("bound_ok",
            (v(1) >= v(2) && v(2) >= v(3) &&
              (v(1) + v(2) + v(3)) * 64 >=
                lit(3000000000000L) * col("__tot") &&
              lit(maxOffQ) <= 1000000000L &&
              lit(maxDiagErrQ) <= 1000000000L)
              .cast(IntegerType))
          .select(col("vec_id"), col("pc1_q"), col("pc2_q"), col("pc3_q"),
            col("bound_ok"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH L AS (
             |  SELECT j, loading FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/pca_loadings/*.parquet')),
             |qv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
             |  FROM embeddings),
             |proj0 AS (
             |  SELECT vec_id, j, SUM(xv*lv) AS pc
             |  FROM (SELECT q.vec_id, l.j, unnest(q.v) AS xv, unnest(l.loading) AS lv
             |        FROM qv q CROSS JOIN L l)
             |  GROUP BY vec_id, j),
             |p AS (
             |  SELECT vec_id,
             |    CAST(MAX(CASE WHEN j=1 THEN pc END) AS BIGINT) AS pc1_q,
             |    CAST(MAX(CASE WHEN j=2 THEN pc END) AS BIGINT) AS pc2_q,
             |    CAST(MAX(CASE WHEN j=3 THEN pc END) AS BIGINT) AS pc3_q
             |  FROM proj0 GROUP BY vec_id),
             |st AS (
             |  SELECT count(*) AS n,
             |    SUM(CAST(pc1_q AS DECIMAL(18,0))) AS s1,
             |    SUM(CAST(pc1_q AS DECIMAL(18,0))*CAST(pc1_q AS DECIMAL(18,0))) AS q1,
             |    SUM(CAST(pc2_q AS DECIMAL(18,0))) AS s2,
             |    SUM(CAST(pc2_q AS DECIMAL(18,0))*CAST(pc2_q AS DECIMAL(18,0))) AS q2,
             |    SUM(CAST(pc3_q AS DECIMAL(18,0))) AS s3,
             |    SUM(CAST(pc3_q AS DECIMAL(18,0))*CAST(pc3_q AS DECIMAL(18,0))) AS q3
             |  FROM p),
             |vs AS (
             |  SELECT q1*n - s1*s1 AS v1, q2*n - s2*s2 AS v2,
             |         q3*n - s3*s3 AS v3 FROM st),
             |dims AS (
             |  SELECT pos, count(*) AS dn,
             |    SUM(CAST(x AS DECIMAL(18,0))) AS ds,
             |    SUM(CAST(x AS DECIMAL(18,0))*CAST(x AS DECIMAL(18,0))) AS dq
             |  FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos
             |        FROM qv)
             |  GROUP BY pos),
             |tot AS (SELECT SUM(dq*dn - ds*ds) AS tv FROM dims),
             |orth AS (
             |  SELECT
             |    MAX(CASE WHEN ja <> jb THEN abs(dot) ELSE 0 END) AS maxoff,
             |    MAX(CASE WHEN ja = jb THEN abs(dot - 1000000000000) ELSE 0 END) AS diagerr
             |  FROM (
             |    SELECT ja, jb, SUM(xa*xb) AS dot
             |    FROM (SELECT a.j AS ja, b.j AS jb,
             |            unnest(a.loading) AS xa, unnest(b.loading) AS xb
             |          FROM L a CROSS JOIN L b)
             |    GROUP BY ja, jb)),
             |ok AS (
             |  SELECT CAST(vs.v1 >= vs.v2 AND vs.v2 >= vs.v3
             |    AND 64*(vs.v1+vs.v2+vs.v3) >= 3000000000000 * tot.tv
             |    AND orth.maxoff <= 1000000000
             |    AND orth.diagerr <= 1000000000 AS INTEGER) AS bound_ok
             |  FROM vs, tot, orth)
             |SELECT p.vec_id, p.pc1_q, p.pc2_q, p.pc3_q, ok.bound_ok
             |FROM p CROSS JOIN ok ORDER BY p.vec_id""".stripMargin),
      allowBnlj = true),

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

    // Long-diameter CC: 25-node CHAIN components over the full doc_id
    // domain (edge i→i+1 except at chain ends). Diameter 24 forces ~24
    // min-label-propagation rounds — the per-round localCheckpoint +
    // release seam exercised at K≥20 rounds on a scale-proportional
    // graph (the near-clique dedup fixtures converge in 3-5). The
    // closed form cluster_id = doc_id − (doc_id mod 25) is an
    // INDEPENDENT derivation of the same fixpoint ⇒ fully oracled.
    "dedup_cluster_cc_chain" -> QuerySpec(
      (s, d) => {
        val ids = t(s, d, "documents").select(col("doc_id"))
        val pairs = ids.filter(col("doc_id") % 25 =!= 24)
          .join(ids.select(col("doc_id").as("id_b")),
            col("id_b") === col("doc_id") + 1)
          .select(col("doc_id").as("id_a"), col("id_b"))
        DedupOps.connectedComponents(
          ids, pairs, "doc_id", "id_a", "id_b", maxIterations = 30)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(doc_id - (doc_id % 25) AS BIGINT) AS cluster_id
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // END-TO-END fuzzy dedup: minhash LSH candidates → exact-Jaccard
    // confirm → connected components → min-id survivor per cluster →
    // corpus minus losers, as ONE key — the operation an LLM-data user
    // actually runs; the pieces above each verify separately, this
    // verifies their composition. Fully ORACLED: at bands = numHashes
    // (one hash per band) LSH misses a j ≥ 0.3 pair with p ≤ (0.7)^64
    // ≈ 1e-10, so the composed result equals the exact enumeration the
    // recursive-CTE oracle computes (reachability over exact-Jaccard
    // pairs, survivor = min id per component). The default normalize
    // seam (NFKC + casefold + collapse on SIGNATURE text) is identity
    // on this ASCII single-spaced fixture, so the lower(text) oracle
    // stays exact; the Unicode-variant behavior is pinned by the
    // DedupSpec NFKC/NBSP test instead.
    "dedup_fuzzy_e2e" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        DedupOps.fuzzyDedupE2E(docs, "doc_id", "text",
          threshold = 0.3, numHashes = 64, bands = 64, shingleN = 2)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 500),
             |toks AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS tok
             |  FROM base),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l),
             |clusters AS (SELECT id, min(l) AS cluster_id FROM reach GROUP BY id)
             |SELECT d.doc_id, d.lang FROM documents d
             |JOIN clusters c ON c.id = d.doc_id AND c.id = c.cluster_id
             |WHERE d.doc_id < 500
             |ORDER BY d.doc_id""".stripMargin)),

    // END-TO-END corpus preparation (CorpusPrep.prepare): C4 line rules
    // → Gopher flags → intra-doc line dedup → unigram-LM filter → fuzzy
    // dedup → split assignment, ONE composed call — the full pipeline an
    // LLM data team ships, with every intermediate text handoff
    // hash-verified (the output carries the final cleaned text). Fixture
    // is the text_c4_filter multi-line build plus a planted repeat of
    // the first line (with terminal '.', so C4 keeps it and the
    // line-dedup stage has real work; for doc_id % 3 != 0 it equals
    // line 0 exactly and collapses). Stage populations at sf0.01:
    // 500 → 441 (C4) → ~230 (Gopher, word-count + stopword rules both
    // active at minWords=30) → LM ≤ 3.79 (the rounded decimal-exact
    // statistic of text_unigram_logprob, ~p75 of the survivor
    // distribution) → fuzzy dedup at the oracled recall-first settings
    // (bands = numHashes = 64, miss p ≤ 1e-10; TRIGRAM shingles — see
    // CorpusPrep.prepare's default for why bigrams degenerate here) →
    // LCG splits. Fully
    // ORACLED: each stage restates the exact SQL its standalone key
    // already proved, composed as CTEs. The fuzzy stage's default
    // normalize seam is identity on this ASCII fixture (see
    // dedup_fuzzy_e2e's comment), so the oracle stays exact.
    "corpus_prep_e2e" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val firstLineDot = concat(array_join(slice(toks, 1, 8), " "), lit("."))
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toks, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            lit("\n"), firstLineDot,
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        CorpusPrep.prepare(built, "doc_id", "text",
          gopherMinWords = 30, gopherMinStopwords = 1,
          lmMaxNegLogProb = 3.79)
          .select(col("doc_id"), col("text").as("clean_text"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || chr(10) || array_to_string(toks[1:8], ' ') || '.'
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |c4 AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, chr(10)),
             |      l -> regexp_matches(trim(l), '[.!?"]$')
             |           AND len(string_split_regex(trim(l), '\s+')) >= 5) AS kept,
             |    contains(lower(text), 'lorem ipsum') AS hl,
             |    contains(text, '{') AS hb
             |  FROM built),
             |c4k AS (
             |  SELECT doc_id, array_to_string(kept, chr(10)) AS text
             |  FROM c4 WHERE NOT hl AND NOT hb AND len(kept) >= 3),
             |g AS (
             |  SELECT doc_id, text,
             |    string_split_regex(lower(text), '\s+') AS w FROM c4k),
             |gf AS (
             |  SELECT doc_id, text, len(w) AS nw,
             |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
             |      / len(w) AS mwl,
             |    len(regexp_extract_all(text, '#|\.\.\.')) AS nsym,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS nalpha,
             |    len(list_filter(['the','be','to','of','and','that','have','with'],
             |      s -> list_contains(w, s))) AS nstop
             |  FROM g),
             |gk AS (
             |  SELECT doc_id, text FROM gf
             |  WHERE nw >= 30 AND nw <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
             |    AND CAST(nsym AS DOUBLE)/nw <= 0.1
             |    AND CAST(nalpha AS DOUBLE)/nw >= 0.8 AND nstop >= 1),
             |ld AS (
             |  SELECT doc_id, array_to_string(
             |    list_filter(string_split(text, chr(10)),
             |      (l, i) -> list_position(string_split(text, chr(10)), l) = i),
             |    chr(10)) AS text
             |  FROM gk),
             |lt AS (
             |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
             |  FROM ld),
             |lt2 AS (SELECT * FROM lt WHERE length(tok) > 0),
             |vocab AS (SELECT tok, count(*) AS c FROM lt2 GROUP BY tok),
             |tot AS (SELECT sum(c) AS t, count(*) AS v FROM vocab),
             |lp AS (
             |  SELECT tok, CAST(ln((c + 0.5) / (t + 0.5 * v)) AS DECIMAL(20,9)) AS lp
             |  FROM vocab, tot),
             |score AS (
             |  SELECT doc_id, round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS s
             |  FROM lt2 JOIN lp USING (tok) GROUP BY doc_id),
             |lmk AS (
             |  SELECT d.doc_id, d.text FROM ld d JOIN score USING (doc_id)
             |  WHERE s <= 3.79),
             |fw AS (
             |  SELECT doc_id AS id, string_split_regex(lower(text), '\s+') AS w
             |  FROM lmk),
             |ft AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |     for i in range(1, len(w) - 1)])) AS tok
             |  FROM fw),
             |sizes AS (SELECT id, count(*) AS n FROM ft GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM ft a JOIN ft b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT id, id FROM fw
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l),
             |clusters AS (SELECT id, min(l) AS cluster_id FROM reach GROUP BY id)
             |SELECT k.doc_id, k.text AS clean_text,
             |  CASE WHEN u < 0.8 THEN 'train'
             |       WHEN u < 0.9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id, text,
             |        CAST((doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |          / 2147483648.0 AS u
             |      FROM lmk) k
             |JOIN clusters c ON c.id = k.doc_id AND c.id = c.cluster_id
             |ORDER BY k.doc_id""".stripMargin),
      allowBnlj = true),

    // Duplicated-span statistics (the exact-substring-dedup signal, Lee
    // et al. 2022): per-doc fraction of 5-gram instances occurring more
    // than once corpus-wide. Pure count arithmetic + one IEEE division
    // ⇒ fully ORACLED.
    "dedup_span_stats" -> QuerySpec(
      (s, d) => DedupOps.duplicateSpanStats(
        t(s, d, "documents"), "doc_id", "text", shingleN = 5)
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |grams AS (
             |  SELECT doc_id, unnest(CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
             |    ELSE [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)] END) AS g
             |  FROM base),
             |counts AS (SELECT g, count(*) AS n FROM grams GROUP BY g)
             |SELECT doc_id, count(*) AS n_grams,
             |  CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |  CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
             |FROM grams JOIN counts c USING (g)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // REAL WAV-header decode over REAL audio bytes — the audio twin of
    // multimodal_image_meta: staging synthesizes PCM and encodes it with
    // javax.sound (pure JVM, offline) at id-derived sample rates/channel
    // counts/lengths; binaryFile reads the files back and
    // MultimodalOps.audioMeta walks the RIFF chunk list to the fmt/data
    // chunks. Fully ORACLED the strong way: DuckDB re-walks the SAME
    // staged bytes with a recursive-CTE chunk walk over little-endian
    // blob arithmetic. Staged-path literal: sf0.01 contract as above.
    "multimodal_audio_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "audio") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          (0 until 24).foreach { id =>
            val rate = Seq(8000, 16000, 44100)(id % 3)
            val channels = 1 + (id % 2)
            val n = 100 + 37 * id
            val pcm = new Array[Byte](n * channels * 2)
            var i = 0
            while (i < pcm.length) { pcm(i) = ((i * 7 + id) & 0xff).toByte; i += 1 }
            val fmt = new javax.sound.sampled.AudioFormat(
              rate.toFloat, 16, channels, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE,
              new java.io.File(base, f"clip_$id%03d.wav"))
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.wav")
          .select(
            regexp_extract(col("path"), "clip_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        MultimodalOps.audioMeta(files, "bytes")
          .select(col("media_id"), col("format"), col("audio_fmt"),
            col("channels"), col("sample_rate"), col("bit_depth"),
            col("n_frames"))
          .orderBy(col("media_id"))
      },
      Some("""WITH RECURSIVE f AS (
             |  SELECT regexp_extract(filename, 'clip_(\d+)', 1)::BIGINT AS media_id,
             |    hex(content) AS h, octet_length(content) AS len
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/audio/clip_*.wav')),
             |walk(media_id, pos, cid, csize) AS (
             |  SELECT media_id, 13, substr(h, 25, 8),
             |    ('0x' || substr(h, 39, 2) || substr(h, 37, 2)
             |          || substr(h, 35, 2) || substr(h, 33, 2))::BIGINT
             |  FROM f
             |  WHERE substr(h, 1, 8) = '52494646' AND substr(h, 17, 8) = '57415645'
             |  UNION ALL
             |  SELECT w.media_id,
             |    w.pos + 8 + w.csize + (w.csize % 2),
             |    substr(f.h, (w.pos + 8 + w.csize + (w.csize % 2) - 1)*2 + 1, 8),
             |    ('0x' || substr(f.h, (w.pos + 8 + w.csize + (w.csize % 2) - 1)*2 + 15, 2)
             |          || substr(f.h, (w.pos + 8 + w.csize + (w.csize % 2) - 1)*2 + 13, 2)
             |          || substr(f.h, (w.pos + 8 + w.csize + (w.csize % 2) - 1)*2 + 11, 2)
             |          || substr(f.h, (w.pos + 8 + w.csize + (w.csize % 2) - 1)*2 + 9, 2))::BIGINT
             |  FROM walk w JOIN f ON w.media_id = f.media_id
             |  WHERE w.cid <> '64617461' AND w.pos + 8 + w.csize <= f.len),
             |fmtc AS (SELECT media_id, pos FROM walk WHERE cid = '666D7420'),
             |dat AS (SELECT media_id, csize AS dlen FROM walk WHERE cid = '64617461')
             |SELECT f.media_id, 'wav' AS format,
             |  ('0x' || substr(h, (fmtc.pos+8-1)*2+3, 2)
             |        || substr(h, (fmtc.pos+8-1)*2+1, 2))::INTEGER AS audio_fmt,
             |  ('0x' || substr(h, (fmtc.pos+10-1)*2+3, 2)
             |        || substr(h, (fmtc.pos+10-1)*2+1, 2))::INTEGER AS channels,
             |  CAST(('0x' || substr(h, (fmtc.pos+12-1)*2+7, 2)
             |        || substr(h, (fmtc.pos+12-1)*2+5, 2)
             |        || substr(h, (fmtc.pos+12-1)*2+3, 2)
             |        || substr(h, (fmtc.pos+12-1)*2+1, 2))::BIGINT AS INTEGER) AS sample_rate,
             |  ('0x' || substr(h, (fmtc.pos+22-1)*2+3, 2)
             |        || substr(h, (fmtc.pos+22-1)*2+1, 2))::INTEGER AS bit_depth,
             |  CAST(dat.dlen // (('0x' || substr(h, (fmtc.pos+10-1)*2+3, 2)
             |        || substr(h, (fmtc.pos+10-1)*2+1, 2))::BIGINT * 2) AS BIGINT) AS n_frames
             |FROM f JOIN fmtc USING (media_id) JOIN dat USING (media_id)
             |ORDER BY media_id""".stripMargin)),

    // COMPRESSED-audio metadata (round 15): MP3 frame headers + FLAC
    // STREAMINFO — audio crawls are mostly MP3/FLAC, not the PCM WAV
    // the audio tier had; this brings audio to the raster tier's
    // format depth. Two genuinely different layout classes in one
    // dispatcher: MP3 is a BIT-PACKED 4-byte header behind an optional
    // ID3v2 tag whose 28-bit SYNCSAFE size must be 7-bit-masked per
    // byte (the encoding exists so tag sizes can't alias a frame
    // sync), with (version, layer)-indexed bitrate TABLES and
    // version-indexed sample-rate tables; FLAC is fLaC magic + the
    // spec-mandated FIRST metadata block whose STREAMINFO body packs
    // 20-bit rate / 3-bit channels / 5-bit bps / 36-bit total samples
    // across byte boundaries. Eight planted corrupts (reserved MPEG
    // version, bitrate index 15, reserved sample-rate index, ID3 size
    // overrunning the file, FLAC first-block-not-STREAMINFO, truncated
    // STREAMINFO, zero sample rate, unknown container magic) must be
    // NULL on BOTH engines; format-absent fields (MP3 bit depth/total,
    // FLAC bitrate) are NULL BY DESIGN, not 0. DuckDB re-parses the
    // same staged bytes — syncsafe un-masking, both bitfield walks,
    // and the bitrate tables as list literals indexed by the parsed
    // bits — so a parser that skips one validity check breaks the
    // hash. Staged-path literal: sf0.01 contract as scan_binaryfile.
    "multimodal_mp3_flac_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "audio_stream") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          // ver/layer/brIdx/srIdx/chMode are the header BIT values
          // (ver: 3=V1 2=V2 0=V2.5; layer: 3=L1 2=L2 1=L3)
          def mp3(ver: Int, layer: Int, brIdx: Int, srIdx: Int,
              chMode: Int, id3Size: Int): Array[Byte] = {
            val id3 =
              if (id3Size >= 0)
                "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0) ++
                  Array(((id3Size >> 21) & 0x7f).toByte,
                    ((id3Size >> 14) & 0x7f).toByte,
                    ((id3Size >> 7) & 0x7f).toByte,
                    (id3Size & 0x7f).toByte) ++
                  Array.fill[Byte](math.max(0, math.min(id3Size, 300)))(0x41)
              else Array.empty[Byte]
            id3 ++ Array[Byte](0xff.toByte,
              (0xe0 | (ver << 3) | (layer << 1) | 1).toByte,
              ((brIdx << 4) | (srIdx << 2)).toByte,
              (chMode << 6).toByte) ++ Array.fill[Byte](48)(0x55)
          }
          def flac(rate: Int, ch: Int, bps: Int, total: Long,
              blockType: Int = 0, lastFlag: Int = 0x80,
              truncateTo: Int = -1, trailer: Array[Byte] = Array.empty)
              : Array[Byte] = {
            val body = new Array[Byte](34)
            body(0) = 0x10; body(2) = 0x10 // min/max blocksize 4096
            body(10) = (rate >> 12).toByte
            body(11) = ((rate >> 4) & 0xff).toByte
            body(12) = (((rate & 0xf) << 4) | ((ch - 1) << 1) |
              ((bps - 1) >> 4)).toByte
            body(13) = ((((bps - 1) & 0xf) << 4) |
              ((total >> 32) & 0xf).toInt).toByte
            body(14) = ((total >> 24) & 0xff).toByte
            body(15) = ((total >> 16) & 0xff).toByte
            body(16) = ((total >> 8) & 0xff).toByte
            body(17) = (total & 0xff).toByte
            var i = 18
            while (i < 34) { body(i) = (i * 7).toByte; i += 1 }
            val out = "fLaC".getBytes("US-ASCII") ++
              Array[Byte]((lastFlag | blockType).toByte, 0, 0, 34) ++
              body ++ trailer
            if (truncateTo >= 0) out.take(truncateTo) else out
          }
          val files: Seq[Array[Byte]] = Seq(
            mp3(3, 1, 9, 0, 0, -1),    // 0: V1 L3 128k 44100 stereo
            mp3(3, 1, 14, 1, 3, 100),  // 1: V1 L3 320k 48000 mono, ID3
            mp3(2, 1, 1, 2, 1, -1),    // 2: V2 L3 8k 16000 joint
            mp3(0, 1, 7, 0, 2, 0),     // 3: V2.5 L3 56k 11025, empty ID3
            mp3(3, 3, 12, 2, 0, -1),   // 4: V1 L1 384k 32000
            mp3(3, 2, 5, 0, 3, 257),   // 5: V1 L2 80k, 2-byte syncsafe
            mp3(2, 3, 10, 1, 0, -1),   // 6: V2 L1 160k 24000
            mp3(2, 2, 14, 0, 3, -1),   // 7: V2 L2 160k 22050 mono
            mp3(0, 2, 3, 2, 1, 5),     // 8: V2.5 L2 24k 8000
            mp3(3, 1, 1, 2, 0, -1),    // 9: V1 L3 32k 32000
            flac(44100, 2, 16, 1000000L),         // 10
            flac(48000, 1, 24, 44100L),           // 11
            flac(96000, 8, 24, 123456789L),       // 12
            flac(22050, 2, 16, 0L),               // 13: unknown total → NULL
            flac(8000, 1, 8, 999L),               // 14
            flac(192000, 6, 24, 68000000000L),    // 15: >32-bit total
            flac(44100, 2, 20, 500L),             // 16: odd bps
            flac(32000, 4, 16, 42L, lastFlag = 0, // 17: trailing block
              trailer = Array[Byte](0x84.toByte, 0, 0, 4, 1, 2, 3, 4)),
            // 18: two concatenated frames — the parser reads the first
            mp3(3, 1, 9, 0, 0, -1) ++ mp3(3, 1, 9, 0, 0, -1),
            flac(11025, 3, 12, 7L),               // 19: mid-table values
            mp3(1, 1, 9, 0, 0, -1),    // 20: reserved MPEG version → NULL
            mp3(3, 1, 15, 0, 0, -1),   // 21: bitrate index 15 → NULL
            mp3(3, 1, 9, 3, 0, -1),    // 22: sample-rate index 3 → NULL
            mp3(3, 1, 9, 0, 0, 200).take(30), // 23: ID3 overruns file → NULL
            flac(44100, 2, 16, 99L, blockType = 4), // 24: wrong block → NULL
            flac(44100, 2, 16, 99L, truncateTo = 20), // 25: truncated → NULL
            flac(0, 2, 16, 99L),       // 26: zero sample rate → NULL
            "OggS".getBytes("US-ASCII") ++ Array.fill[Byte](20)(3)) // 27
          files.zipWithIndex.foreach { case (bytes, id) =>
            java.nio.file.Files.write(
              new java.io.File(base, f"au_$id%03d.bin").toPath, bytes)
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.bin")
          .select(
            regexp_extract(col("path"), "au_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        MultimodalOps.audioStreamMeta(files, "bytes")
          .select(col("media_id"), col("format"), col("channels"),
            col("sample_rate"), col("bit_depth"), col("bitrate_kbps"),
            col("n_samples"))
          .orderBy(col("media_id"))
      },
      Some("""WITH f AS (
             |  SELECT regexp_extract(filename, 'au_(\d+)', 1)::BIGINT
             |      AS media_id,
             |    -- pad so byte extraction can't crash on short files;
             |    -- the REAL length nb gates every CASE arm
             |    hex(content) || repeat('0', 700) AS h,
             |    octet_length(content) AS nb
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/audio_stream/au_*.bin')),
             |p AS (
             |  SELECT media_id, h, nb,
             |    substr(h, 1, 8) = '664C6143' AS is_flac,
             |    substr(h, 1, 6) = '494433' AND nb >= 10 AS has_id3,
             |    ('0x' || substr(h, 1, 2))::INTEGER AS a0,
             |    ('0x' || substr(h, 3, 2))::INTEGER AS a1
             |  FROM f),
             |-- MP3 leg: resolve the frame offset (ID3v2 syncsafe skip)
             |moff AS (
             |  SELECT media_id, h, nb, is_flac,
             |    (has_id3 OR (nb >= 2 AND a0 = 255 AND a1 // 32 = 7))
             |      AS mp3_routed,
             |    CASE WHEN has_id3 THEN 10 +
             |        (('0x' || substr(h, 13, 2))::BIGINT % 128) * 2097152 +
             |        (('0x' || substr(h, 15, 2))::BIGINT % 128) * 16384 +
             |        (('0x' || substr(h, 17, 2))::BIGINT % 128) * 128 +
             |        (('0x' || substr(h, 19, 2))::BIGINT % 128)
             |      ELSE 0 END AS off
             |  FROM p),
             |mhdr AS (
             |  SELECT media_id, mp3_routed, off, nb,
             |    ('0x' || substr(h, off*2 + 1, 2))::INTEGER AS m0,
             |    ('0x' || substr(h, off*2 + 3, 2))::INTEGER AS m1,
             |    ('0x' || substr(h, off*2 + 5, 2))::INTEGER AS m2,
             |    ('0x' || substr(h, off*2 + 7, 2))::INTEGER AS m3
             |  FROM moff WHERE NOT is_flac),
             |mfield AS (
             |  SELECT media_id, mp3_routed, off, nb, m0, m1,
             |    (m1 // 8) % 4 AS ver, (m1 // 2) % 4 AS layer,
             |    m2 // 16 AS br, (m2 // 4) % 4 AS sr, m3 // 64 AS ch
             |  FROM mhdr),
             |mp3m AS (
             |  SELECT media_id,
             |    CASE WHEN mp3_routed AND off + 4 <= nb AND m0 = 255
             |        AND m1 // 32 = 7 AND ver <> 1 AND layer <> 0
             |        AND br BETWEEN 1 AND 14 AND sr <> 3
             |    THEN ROW('mp3',
             |      CASE WHEN ch = 3 THEN 1 ELSE 2 END,
             |      CASE ver
             |        WHEN 3 THEN [44100, 48000, 32000][sr + 1]
             |        WHEN 2 THEN [22050, 24000, 16000][sr + 1]
             |        ELSE [11025, 12000, 8000][sr + 1] END,
             |      CASE
             |        WHEN ver = 3 AND layer = 3 THEN
             |          [32,64,96,128,160,192,224,256,288,320,352,384,416,448][br]
             |        WHEN ver = 3 AND layer = 2 THEN
             |          [32,48,56,64,80,96,112,128,160,192,224,256,320,384][br]
             |        WHEN ver = 3 THEN
             |          [32,40,48,56,64,80,96,112,128,160,192,224,256,320][br]
             |        WHEN layer = 3 THEN
             |          [32,48,56,64,80,96,112,128,144,160,176,192,224,256][br]
             |        ELSE [8,16,24,32,40,48,56,64,80,96,112,128,144,160][br]
             |      END)
             |    END AS m
             |  FROM mfield),
             |-- FLAC leg: fixed offsets (STREAMINFO is first by spec)
             |fhdr AS (
             |  SELECT media_id, nb,
             |    ('0x' || substr(h, 9, 2))::INTEGER % 128 AS btype,
             |    ('0x' || substr(h, 11, 6))::BIGINT AS blen,
             |    ('0x' || substr(h, 37, 2))::INTEGER AS b18,
             |    ('0x' || substr(h, 39, 2))::INTEGER AS b19,
             |    ('0x' || substr(h, 41, 2))::INTEGER AS b20,
             |    ('0x' || substr(h, 43, 2))::INTEGER AS b21,
             |    ('0x' || substr(h, 45, 2))::BIGINT AS b22,
             |    ('0x' || substr(h, 47, 2))::BIGINT AS b23,
             |    ('0x' || substr(h, 49, 2))::BIGINT AS b24,
             |    ('0x' || substr(h, 51, 2))::BIGINT AS b25
             |  FROM p WHERE is_flac),
             |flacm AS (
             |  SELECT media_id,
             |    CASE WHEN nb >= 42 AND btype = 0 AND blen >= 34
             |        AND 8 + blen <= nb
             |        AND b18 * 4096 + b19 * 16 + b20 // 16 <> 0
             |    THEN ROW(
             |      b18 * 4096 + b19 * 16 + b20 // 16,
             |      (b20 // 2) % 8 + 1,
             |      (b20 % 2) * 16 + b21 // 16 + 1,
             |      (b21 % 16) * 4294967296 + b22 * 16777216
             |        + b23 * 65536 + b24 * 256 + b25)
             |    END AS m
             |  FROM fhdr)
             |SELECT f.media_id,
             |  COALESCE(mp3m.m[1], CASE WHEN flacm.m IS NOT NULL
             |    THEN 'flac' END) AS format,
             |  CAST(COALESCE(mp3m.m[2], flacm.m[2]) AS INTEGER) AS channels,
             |  CAST(COALESCE(mp3m.m[3], flacm.m[1]) AS INTEGER)
             |    AS sample_rate,
             |  CAST(flacm.m[3] AS INTEGER) AS bit_depth,
             |  CAST(mp3m.m[4] AS INTEGER) AS bitrate_kbps,
             |  CAST(CASE WHEN flacm.m[4] <> 0 THEN flacm.m[4] END AS BIGINT)
             |    AS n_samples
             |FROM f
             |LEFT JOIN mp3m USING (media_id)
             |LEFT JOIN flacm USING (media_id)
             |ORDER BY media_id""".stripMargin)),

    // REAL MP4-header decode over REAL container bytes — the video leg
    // completing the image/audio/video modality set behind the same
    // codec seam. Staging builds deterministic ISO BMFF box structures
    // (ftyp brand ++ optional free ++ moov(mvhd v0/v1 + traks + udta) ++
    // mdat; layouts VARY by id so fixed offsets cannot pass), binaryFile
    // reads them back, and MultimodalOps.videoMeta walks top-level boxes
    // to moov and moov's children to mvhd. Fully ORACLED the strong way:
    // DuckDB re-walks the SAME staged bytes with a recursive-CTE box walk
    // over big-endian blob arithmetic, including the mvhd v0/v1 split —
    // nothing is compared to the staging formula. Staged-path literal:
    // sf0.01 contract as scan_binaryfile.
    "multimodal_video_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "video") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          def be32(v: Long): Array[Byte] = Array(
            ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
          def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
          def bx(tag: String, payload: Array[Byte]): Array[Byte] =
            be32(8L + payload.length) ++ tag.getBytes("US-ASCII") ++ payload
          (0 until 24).foreach { id =>
            val brand = Seq("isom", "mp42", "avc1")(id % 3)
            val ts = 600L + 100L * id
            val dur = 1000L + 997L * id
            val mvhd =
              if (id % 2 == 0)
                bx("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
                  be32(ts) ++ be32(dur) ++ Array.fill[Byte](80)(0))
              else
                bx("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
                  be32(ts) ++ be64(dur) ++ Array.fill[Byte](76)(0))
            // first trak: VIDEO (nonzero 16.16 dims; tkhd version
            // alternates with id so both offsets get oracle coverage);
            // later traks: audio-like 0×0
            val vw = 320L + 16 * (id % 4)
            val vh = 240L + 16 * (id % 3)
            def tkhd(v: Int, w: Long, h: Long): Array[Byte] =
              if (v == 0)
                bx("tkhd", Array[Byte](0, 0, 0, 0) ++ Array.fill[Byte](72)(0) ++
                  be32(w << 16) ++ be32(h << 16))
              else
                bx("tkhd", Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](84)(0) ++
                  be32(w << 16) ++ be32(h << 16))
            val traks = (0 until (1 + id % 3)).map(tIdx =>
              bx("trak",
                if (tIdx == 0) tkhd((id / 2) % 2, vw, vh) else tkhd(0, 0, 0)))
              .reduce(_ ++ _)
            val udta =
              if (id % 5 == 0) bx("udta", Array.fill[Byte](4 + id % 7)(7))
              else Array.empty[Byte]
            val ftyp = bx("ftyp",
              brand.getBytes("US-ASCII") ++ be32(0x200) ++ "isom".getBytes("US-ASCII"))
            val free =
              if (id % 4 == 0) bx("free", Array.fill[Byte](6)(0))
              else Array.empty[Byte]
            val mdat = bx("mdat", Array.fill[Byte](32 + id)((id * 3).toByte))
            java.nio.file.Files.write(
              new java.io.File(base, f"vid_$id%03d.mp4").toPath,
              ftyp ++ free ++ bx("moov", mvhd ++ traks ++ udta) ++ mdat)
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.mp4")
          .select(
            regexp_extract(col("path"), "vid_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        MultimodalOps.videoMeta(files, "bytes")
          .select(col("media_id"), col("format"), col("brand"),
            col("timescale"), col("duration"), col("n_tracks"),
            col("width"), col("height"))
          .orderBy(col("media_id"))
      },
      Some("""WITH RECURSIVE f AS (
             |  SELECT regexp_extract(filename, 'vid_(\d+)', 1)::BIGINT AS media_id,
             |    hex(content) AS h, octet_length(content) AS len,
             |    decode(unhex(substr(hex(content), 17, 8))) AS brand
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/video/vid_*.mp4')
             |  WHERE substr(hex(content), 9, 8) = '66747970'),
             |top(media_id, p) AS (
             |  SELECT media_id, 0 FROM f
             |  UNION ALL
             |  SELECT t.media_id, t.p + ('0x' || substr(f.h, 2*t.p + 1, 8))::BIGINT
             |  FROM top t JOIN f ON f.media_id = t.media_id
             |  WHERE t.p + ('0x' || substr(f.h, 2*t.p + 1, 8))::BIGINT < f.len),
             |moov AS (
             |  SELECT t.media_id, t.p AS mp,
             |    t.p + ('0x' || substr(f.h, 2*t.p + 1, 8))::BIGINT AS mend
             |  FROM top t JOIN f ON f.media_id = t.media_id
             |  WHERE substr(f.h, 2*(t.p + 4) + 1, 8) = '6D6F6F76'),
             |child(media_id, q, mend) AS (
             |  SELECT media_id, mp + 8, mend FROM moov
             |  UNION ALL
             |  SELECT c.media_id, c.q + ('0x' || substr(f.h, 2*c.q + 1, 8))::BIGINT, c.mend
             |  FROM child c JOIN f ON f.media_id = c.media_id
             |  WHERE c.q + ('0x' || substr(f.h, 2*c.q + 1, 8))::BIGINT < c.mend),
             |mvhd AS (
             |  SELECT c.media_id,
             |    CASE WHEN substr(f.h, 2*(c.q + 8) + 1, 2) = '00'
             |      THEN ('0x' || substr(f.h, 2*(c.q + 20) + 1, 8))::BIGINT
             |      ELSE ('0x' || substr(f.h, 2*(c.q + 28) + 1, 8))::BIGINT
             |    END AS timescale,
             |    CASE WHEN substr(f.h, 2*(c.q + 8) + 1, 2) = '00'
             |      THEN ('0x' || substr(f.h, 2*(c.q + 24) + 1, 8))::BIGINT
             |      ELSE ('0x' || substr(f.h, 2*(c.q + 32) + 1, 16))::BIGINT
             |    END AS duration
             |  FROM child c JOIN f ON f.media_id = c.media_id
             |  WHERE substr(f.h, 2*(c.q + 4) + 1, 8) = '6D766864'),
             |tracks AS (
             |  SELECT c.media_id,
             |    SUM(CASE WHEN substr(f.h, 2*(c.q + 4) + 1, 8) = '7472616B'
             |      THEN 1 ELSE 0 END) AS n_tracks
             |  FROM child c JOIN f ON f.media_id = c.media_id
             |  GROUP BY c.media_id),
             |trakbox AS (
             |  SELECT c.media_id, c.q AS tp,
             |    c.q + ('0x' || substr(f.h, 2*c.q + 1, 8))::BIGINT AS tend
             |  FROM child c JOIN f ON f.media_id = c.media_id
             |  WHERE substr(f.h, 2*(c.q + 4) + 1, 8) = '7472616B'),
             |tchild(media_id, tq, tend) AS (
             |  SELECT media_id, tp + 8, tend FROM trakbox
             |  UNION ALL
             |  SELECT t.media_id, t.tq + ('0x' || substr(f.h, 2*t.tq + 1, 8))::BIGINT, t.tend
             |  FROM tchild t JOIN f ON f.media_id = t.media_id
             |  WHERE t.tq + ('0x' || substr(f.h, 2*t.tq + 1, 8))::BIGINT < t.tend),
             |tkhd AS (
             |  SELECT t.media_id, t.tq,
             |    CASE WHEN substr(f.h, 2*(t.tq + 8) + 1, 2) = '00'
             |      THEN ('0x' || substr(f.h, 2*(t.tq + 84) + 1, 4))::INTEGER
             |      ELSE ('0x' || substr(f.h, 2*(t.tq + 96) + 1, 4))::INTEGER
             |    END AS w,
             |    CASE WHEN substr(f.h, 2*(t.tq + 8) + 1, 2) = '00'
             |      THEN ('0x' || substr(f.h, 2*(t.tq + 88) + 1, 4))::INTEGER
             |      ELSE ('0x' || substr(f.h, 2*(t.tq + 100) + 1, 4))::INTEGER
             |    END AS h
             |  FROM tchild t JOIN f ON f.media_id = t.media_id
             |  WHERE substr(f.h, 2*(t.tq + 4) + 1, 8) = '746B6864'),
             |dims AS (
             |  SELECT media_id, w, h FROM (
             |    SELECT media_id, w, h,
             |      row_number() OVER (PARTITION BY media_id ORDER BY tq) AS rn
             |    FROM tkhd WHERE w > 0 AND h > 0)
             |  WHERE rn = 1)
             |SELECT f.media_id, 'mp4' AS format, f.brand,
             |  v.timescale, v.duration, CAST(t.n_tracks AS INTEGER) AS n_tracks,
             |  CAST(COALESCE(d.w, 0) AS INTEGER) AS width,
             |  CAST(COALESCE(d.h, 0) AS INTEGER) AS height
             |FROM f JOIN mvhd v USING (media_id) JOIN tracks t USING (media_id)
             |LEFT JOIN dims d USING (media_id)
             |ORDER BY media_id""".stripMargin)),

    // Exact-substring span REMOVAL (the acting half of dedup_span_stats):
    // drop every token covered by a >1-occurrence 5-gram instance,
    // rebuild docs from surviving tokens, drop docs that lose everything.
    // Instance-level removal (no canonical survivor — that contract is
    // dedup_paragraph's). Deterministic token coverage ⇒ fully ORACLED
    // including the rebuilt text; the oracle zips gram positions via
    // DuckDB's parallel unnest and replays the same coverage rule with
    // an indexed list_filter.
    "dedup_span_removal" -> QuerySpec(
      (s, d) => DedupOps.removeDuplicateSpans(
        t(s, d, "documents"), "doc_id", "text", shingleN = 5)
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |grams AS (
             |  SELECT doc_id,
             |    unnest(CASE WHEN len(w) < 5 THEN [0]
             |      ELSE [i - 1 for i in range(1, len(w) - 3)] END) AS p,
             |    unnest(CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
             |      ELSE [array_to_string(w[i:i+4], ' ') for i in range(1, len(w) - 3)] END) AS g
             |  FROM base),
             |counts AS (SELECT g, count(*) AS n FROM grams GROUP BY g),
             |dup AS (
             |  SELECT doc_id, list(p) AS ps FROM grams
             |  JOIN counts USING (g) WHERE n > 1 GROUP BY doc_id),
             |rebuilt AS (
             |  SELECT b.doc_id,
             |    list_filter(w, (t, j) -> NOT len(list_filter(
             |      coalesce(ps, []), p -> j - 1 >= p AND j - 1 <= p + 4)) > 0) AS kept,
             |    len(w) AS n_tokens
             |  FROM base b LEFT JOIN dup USING (doc_id))
             |SELECT doc_id, array_to_string(kept, ' ') AS text_clean,
             |  CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(n_tokens - len(kept) AS BIGINT) AS n_removed
             |FROM rebuilt WHERE len(kept) > 0
             |ORDER BY doc_id""".stripMargin)),

    // Segment-level exact dedup with reconstruction (the paragraph-dedup
    // pass of CCNet/RefinedWeb, fixed 10-token segments): every segment
    // keeps its lexicographically-first (doc, idx) occurrence, docs are
    // rebuilt from survivors. Keep-first is deterministic ⇒ fully
    // ORACLED, including the reconstructed text. 4 all-boilerplate docs
    // vanish at sf0.01; 53 get trimmed.
    "dedup_paragraph" -> QuerySpec(
      (s, d) => DedupOps.segmentDedup(
        t(s, d, "documents"), "doc_id", "text", segTokens = 10)
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |segs AS (
             |  SELECT doc_id, CAST(u.i AS INTEGER) AS seg_idx,
             |    array_to_string(w[(u.i*10+1):(u.i*10+10)], ' ') AS seg
             |  FROM base, UNNEST(range(0, CAST(ceil(len(w)/10.0) AS BIGINT))) AS u(i)),
             |canon AS (
             |  SELECT doc_id, seg_idx, seg,
             |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
             |  FROM segs),
             |rec AS (
             |  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup,
             |    count(*) AS n_kept
             |  FROM canon WHERE rn = 1 GROUP BY doc_id),
             |tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
             |SELECT r.doc_id, r.text_dedup, t.n_segs, r.n_kept
             |FROM rec r JOIN tot t USING (doc_id) ORDER BY r.doc_id""".stripMargin)),

    // Cross-document LINE-FREQUENCY boilerplate removal (round 13, the
    // RefinedWeb/CCNet chrome pass): a trimmed line in ≥ 50 DISTINCT
    // docs is removed from EVERY doc — the semantics keep-first segment
    // dedup (dedup_paragraph keeps the first copy) and within-doc line
    // dedup (one copy per doc is no repeat) cannot express. Fixture
    // plants the three regimes: a universal footer (500 docs →
    // removed), a 1-in-3 banner (~167 → removed), a 1-in-97 promo line
    // (6 → KEPT, below threshold); content lines are per-doc token
    // slices, far under threshold. One count-distinct on the trimmed
    // line, an unhinted anti join (boiler set ≤ lines/minDocs), one
    // rebuild groupBy — fully oracled including reconstructed text.
    "dedup_line_frequency" -> QuerySpec(
      (s, d) => {
        val toksB = split(col("text"), " ")
        val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => array_join(slice(toksB, i * 8 + 1, lit(8)), " ")), "\n"),
            when(col("doc_id") % 3 === 0,
              lit("\nsubscribe to our newsletter")).otherwise(lit("")),
            when(col("doc_id") % 97 === 0,
              lit("\nlimited promo code 7")).otherwise(lit("")),
            lit("\nall rights reserved")).as("text"))
        DedupOps.lineFrequencyFilter(built, "doc_id", "text", minDocs = 50)
          .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
            col("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ')), chr(10))
             |    || CASE WHEN doc_id % 3 = 0
             |            THEN chr(10) || 'subscribe to our newsletter'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 97 = 0
             |            THEN chr(10) || 'limited promo code 7' ELSE '' END
             |    || chr(10) || 'all rights reserved' AS text
             |  FROM base),
             |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM built),
             |lines AS (
             |  SELECT doc_id, unnest(l) AS line,
             |         unnest(range(len(l))) AS pos
             |  FROM ls),
             |boiler AS (
             |  SELECT trim(line) AS norm FROM lines WHERE trim(line) <> ''
             |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 50),
             |kept AS (
             |  SELECT doc_id, pos, line FROM lines
             |  WHERE trim(line) = ''
             |     OR trim(line) NOT IN (SELECT norm FROM boiler)),
             |agg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_kept,
             |    string_agg(line, chr(10) ORDER BY pos) AS clean_text
             |  FROM kept GROUP BY doc_id)
             |SELECT l.doc_id, CAST(len(l.l) AS BIGINT) AS n_lines,
             |  coalesce(a.n_lines_kept, CAST(0 AS BIGINT)) AS n_lines_kept,
             |  coalesce(a.clean_text, '') AS clean_text
             |FROM ls l LEFT JOIN agg a USING (doc_id)
             |ORDER BY l.doc_id""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): embedding near-dup removal with the
    // quadratic stage confined to cluster cells (the label column here;
    // ivfCell/lshBucket in production). Quantized cosine + min-id
    // survivor ⇒ the full pipeline is engine-exact and ORACLED via
    // recursive-CTE reachability over within-cell edges (113 edges,
    // 389/500 survivors at sf0.01).
    "dedup_semdedup" -> QuerySpec(
      (s, d) => SimilarityOps.semDedup(
        t(s, d, "embeddings"), "vec_id", "embedding", "label",
        threshold = 0.3)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id")),
      Some("""WITH RECURSIVE pairs AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    CAST(FLOOR(CAST(unnest(a.embedding) AS DOUBLE)*1000) AS BIGINT) AS va,
             |    CAST(FLOOR(CAST(unnest(b.embedding) AS DOUBLE)*1000) AS BIGINT) AS vb
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id < b.vec_id),
             |dots AS (
             |  SELECT id_a, id_b, SUM(va*vb) AS dot, SUM(va*va) AS na, SUM(vb*vb) AS nb
             |  FROM pairs GROUP BY id_a, id_b),
             |e0 AS (SELECT id_a, id_b FROM dots
             |  WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) > 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM e0
             |          UNION ALL SELECT id_b, id_a FROM e0),
             |reach(id, l) AS (
             |  SELECT vec_id, vec_id FROM embeddings
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l),
             |clusters AS (SELECT id, min(l) AS cluster_id FROM reach GROUP BY id)
             |SELECT e.vec_id, e.label FROM embeddings e
             |JOIN clusters c ON c.id = e.vec_id AND c.id = c.cluster_id
             |ORDER BY e.vec_id""".stripMargin)),

    // Exact token-set Jaccard near-dups on a bounded id range — fully
    // SQL-expressible (integer set sizes, one IEEE division).
    "dedup_ngram_jaccard" -> QuerySpec(
      (s, d) => DedupOps.ngramJaccardPairs(
        t(s, d, "documents").filter(col("doc_id") < 40), "doc_id", "text", 0.5)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (
             |  SELECT doc_id AS id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
             |  FROM documents WHERE doc_id < 40),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id)
             |SELECT id_a, id_b,
             |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
             |FROM inter
             |JOIN sizes sa ON sa.id = id_a
             |JOIN sizes sb ON sb.id = id_b
             |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    // Embedding-cosine near-dups on quantized integers — engine-exact.
    // allPairs is safe here ONLY because the input is explicitly bounded
    // to 100 vectors (the oracle needs the exact O(N²) enumeration); the
    // production-shaped variant is dedup_embedding_cosine_lsh below.
    "dedup_embedding_cosine" -> QuerySpec(
      (s, d) => SimilarityOps.cosineDupPairs(
        t(s, d, "embeddings").filter(col("vec_id") < 100),
        "vec_id", "embedding", threshold = 0.30, allPairs = true)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH pairs AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    CAST(FLOOR(CAST(unnest(a.embedding) AS DOUBLE)*1000) AS BIGINT) AS va,
             |    CAST(FLOOR(CAST(unnest(b.embedding) AS DOUBLE)*1000) AS BIGINT) AS vb
             |  FROM embeddings a, embeddings b
             |  WHERE a.vec_id < 100 AND b.vec_id < 100 AND a.vec_id < b.vec_id),
             |dots AS (
             |  SELECT id_a, id_b, SUM(va*vb) AS dot, SUM(va*va) AS na, SUM(vb*vb) AS nb
             |  FROM pairs GROUP BY id_a, id_b)
             |SELECT id_a, id_b,
             |  CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos_q
             |FROM dots
             |WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) > 0.30
             |ORDER BY id_a, id_b""".stripMargin),
      allowBnlj = true),

    // LSH-bucketed embedding dedup at FULL scale factor (no id bound):
    // the production path — pairs meet only inside a hyperplane bucket.
    // Bucket assignment is float-order-sensitive ⇒ rows-only, but the
    // estimator is CHECKED in-query (the dedup_minhash_vs_exact
    // pattern): every 10th vector re-enters the corpus perturbed in one
    // component (cos ≈ 0.999 to its source — the near-dup the bucketing
    // exists to catch), the bucketed pass runs at threshold 0.95, and
    // the recovered fraction of planted twins rides every row as
    // `recall` with `recall_floor`/`above_floor=1` asserting the
    // bound. A perturbed twin is a DIFFERENT vector that must still
    // land in its source's bucket on all 8 hyperplanes — unlike an
    // exact copy (which collides by construction), this measures real
    // LSH recall on near-identical pairs. Per-vector count via left
    // join keeps all rows (rows > 0 even with no duplicates).
    // ORACLED since round 11 via the STAGED 8-bit PLANES artifact (the
    // sim_ann_lsh pattern): quantized-plane buckets + the already-exact
    // quantized cosine make the pair set, the per-vec counts AND the
    // planted-twin recall check bit-portable — DuckDB replays both
    // cosineDupPairs passes (threshold 0.30 corpus scan; threshold 0.95
    // twin recovery) over the same staged planes.
    "dedup_embedding_cosine_lsh" -> QuerySpec(
      (s, d) => {
        val embT = t(s, d, "embeddings")
        staged(d, "lsh_planes_8") { dir =>
          import s.implicits._
          SimilarityOps.quantizedPlanes(nBits = 8, dim = 64).zipWithIndex
            .map { case (p, i) => (i, p.toSeq) }.toSeq
            .toDF("bit", "plane")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pairs = SimilarityOps.cosineDupPairs(embT, "vec_id", "embedding",
          threshold = 0.30, quantizedBuckets = true)
        val cnts = pairs.select(col("id_a").as("vec_id"))
          .union(pairs.select(col("id_b").as("vec_id")))
          .groupBy(col("vec_id")).agg(count(lit(1)).as("n_dup"))
        val perVec = embT.select(col("vec_id"))
          .join(cnts, Seq("vec_id"), "left")
          .na.fill(0, Seq("n_dup"))
        val asD = embT.select(col("vec_id"),
          transform(col("embedding"), x => x.cast(DoubleType))
            .as("embedding"))
        // planted twin id = -(source id) - 1: negative ids CANNOT
        // collide with real vec_ids (non-negative) at ANY table size —
        // an additive offset would alias once the table outgrows it.
        // Pair ordering puts the negative planted id in id_a, so the
        // recovery filter is id_a = -(id_b) - 1.
        val planted = asD.filter(col("vec_id") % 10 === 0)
          .select((-col("vec_id") - 1L).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + when(i === 0, lit(0.05)).otherwise(lit(0.0)))
              .as("embedding"))
        val recovered = SimilarityOps.cosineDupPairs(
            asD.unionByName(planted), "vec_id", "embedding",
            threshold = 0.95, quantizedBuckets = true)
          .filter(col("id_a") === -col("id_b") - 1L)
          .agg(count(lit(1)).as("n_recovered"))
        val summary = recovered
          .crossJoin(asD.filter(col("vec_id") % 10 === 0)
            .agg(count(lit(1)).as("n_planted")))
          .select(col("n_recovered"), col("n_planted"),
            round(col("n_recovered").cast(DoubleType) / col("n_planted"), 4)
              .as("recall"),
            lit(0.7).as("recall_floor"))
          .withColumn("above_floor",
            (col("recall") >= col("recall_floor")).cast(IntegerType))
        perVec.crossJoin(broadcast(summary)).orderBy(col("vec_id"))
      },
      Some("""WITH planes AS (
             |  SELECT bit, plane FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/lsh_planes_8/*.parquet')),
             |qv AS (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
             |  FROM embeddings),
             |buck AS (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN d >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket
             |  FROM (
             |    SELECT vec_id, bit, SUM(xv*pv) AS d
             |    FROM (SELECT q.vec_id, p.bit, unnest(q.v) AS xv, unnest(p.plane) AS pv
             |          FROM qv q CROSS JOIN planes p)
             |    GROUP BY vec_id, bit)
             |  GROUP BY vec_id),
             |p30 AS (
             |  SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(SUM(xa*xb) AS DOUBLE)
             |      / (sqrt(CAST(SUM(xa*xa) AS DOUBLE)) * sqrt(CAST(SUM(xb*xb) AS DOUBLE))) AS cos_q
             |    FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |            unnest(va.v) AS xa, unnest(vb.v) AS xb
             |          FROM buck a
             |          JOIN buck b ON b.bucket = a.bucket AND a.vec_id < b.vec_id
             |          JOIN qv va ON va.vec_id = a.vec_id
             |          JOIN qv vb ON vb.vec_id = b.vec_id)
             |    GROUP BY id_a, id_b)
             |  WHERE cos_q > 0.30),
             |cnt AS (
             |  SELECT vec_id, COUNT(*) AS n_dup FROM (
             |    SELECT id_a AS vec_id FROM p30
             |    UNION ALL SELECT id_b FROM p30)
             |  GROUP BY vec_id),
             |twins AS (
             |  SELECT vec_id, v FROM qv
             |  UNION ALL
             |  SELECT -vec_id - 1 AS vec_id,
             |    [CAST(floor((CAST(embedding[1] AS DOUBLE) + 0.05) * 1000) AS BIGINT)]
             |      || list_transform(embedding[2:64],
             |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
             |  FROM embeddings WHERE vec_id % 10 = 0),
             |tbuck AS (
             |  SELECT vec_id,
             |    CAST(SUM(CASE WHEN d >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket
             |  FROM (
             |    SELECT vec_id, bit, SUM(xv*pv) AS d
             |    FROM (SELECT q.vec_id, p.bit, unnest(q.v) AS xv, unnest(p.plane) AS pv
             |          FROM twins q CROSS JOIN planes p)
             |    GROUP BY vec_id, bit)
             |  GROUP BY vec_id),
             |p95 AS (
             |  SELECT id_a, id_b FROM (
             |    SELECT id_a, id_b, CAST(SUM(xa*xb) AS DOUBLE)
             |      / (sqrt(CAST(SUM(xa*xa) AS DOUBLE)) * sqrt(CAST(SUM(xb*xb) AS DOUBLE))) AS cos_q
             |    FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |            unnest(va.v) AS xa, unnest(vb.v) AS xb
             |          FROM tbuck a
             |          JOIN tbuck b ON b.bucket = a.bucket AND a.vec_id < b.vec_id
             |          JOIN twins va ON va.vec_id = a.vec_id
             |          JOIN twins vb ON vb.vec_id = b.vec_id)
             |    GROUP BY id_a, id_b)
             |  WHERE cos_q > 0.95),
             |summary AS (
             |  SELECT r.n_recovered, p.n_planted,
             |    round(CAST(r.n_recovered AS DOUBLE) / p.n_planted, 4) AS recall,
             |    CAST(0.7 AS DOUBLE) AS recall_floor,
             |    CAST(round(CAST(r.n_recovered AS DOUBLE) / p.n_planted, 4)
             |      >= 0.7 AS INTEGER) AS above_floor
             |  FROM (SELECT COUNT(*) AS n_recovered FROM p95
             |        WHERE id_a = -id_b - 1) r
             |  CROSS JOIN (SELECT COUNT(*) AS n_planted FROM embeddings
             |              WHERE vec_id % 10 = 0) p)
             |SELECT e.vec_id, CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup,
             |  s.n_recovered, s.n_planted, s.recall, s.recall_floor, s.above_floor
             |FROM embeddings e
             |LEFT JOIN cnt c ON c.vec_id = e.vec_id
             |CROSS JOIN summary s
             |ORDER BY e.vec_id""".stripMargin),
      allowBnlj = true),

    // ----------------------------------------------------------- similarity
    // Brute-force cosine top-k on the quantized grid (oracle-exact);
    // the float/double production variant is SimilarityOps.bruteTopK,
    // property-tested against this in SimilaritySpec.
    "sim_topk_cosine" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), SimilarityOps.quantize(col("embedding")).as("qv"))
        val c = emb.select(col("vec_id").as("cid"), SimilarityOps.quantize(col("embedding")).as("cv"))
        val scored = c.crossJoin(broadcast(q))
          .withColumn("dot", SimilarityOps.dotLong(col("qv"), col("cv")))
          .withColumn("na", SimilarityOps.dotLong(col("qv"), col("qv")))
          .withColumn("nb", SimilarityOps.dotLong(col("cv"), col("cv")))
          .withColumn("cos_q", col("dot").cast(DoubleType) /
            (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_q").desc, col("cid"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("rn"), col("cid"), col("cos_q"))
          .orderBy(col("qid"), col("rn"))
      },
      Some("""WITH pairs AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    CAST(FLOOR(CAST(unnest(q.embedding) AS DOUBLE)*1000) AS BIGINT) AS qv,
             |    CAST(FLOOR(CAST(unnest(c.embedding) AS DOUBLE)*1000) AS BIGINT) AS cv
             |  FROM embeddings q, embeddings c WHERE q.vec_id < 5),
             |dots AS (
             |  SELECT qid, cid, SUM(qv*cv) AS dot, SUM(qv*qv) AS na, SUM(cv*cv) AS nb
             |  FROM pairs GROUP BY qid, cid),
             |scored AS (
             |  SELECT qid, cid,
             |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos_q,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) DESC,
             |               cid) AS rn
             |  FROM dots)
             |SELECT qid, CAST(rn AS INTEGER) AS rn, cid, cos_q
             |FROM scored WHERE rn <= 10 ORDER BY qid, rn""".stripMargin),
      allowBnlj = true),

    // In-pipeline embedding inference (EmbedOps.embedWith): documents'
    // text runs through the batched per-partition Embedder seam — the
    // step that completes multimodal → embedding → ANN inside one plan.
    // The in-repo HashingEmbedder (feature hashing, Weinberger et al.
    // 2009) is integer-valued and restated in SQL, so the SEAM ITSELF is
    // oracled: the key explodes the produced embedding arrays into
    // (doc_id, dim_idx, value) rows while DuckDB recomputes the portable
    // token hash (31-polynomial mod 2^31−1 over code points, folded with
    // list_reduce), bucket, sign, and signed histogram from raw text.
    "sim_embed_hashing" -> QuerySpec(
      (s, d) => {
        val emb = EmbedOps.embedWith(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          "text", () => new EmbedOps.HashingEmbedder(dim = 16, seed = 7L))
        emb.select(col("doc_id"),
            posexplode(col("embedding")).as(Seq("dim_idx", "value")))
          .select(col("doc_id"), col("dim_idx"),
            col("value").cast(LongType).as("value"))
          .orderBy(col("doc_id"), col("dim_idx"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |hashed AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(regexp_split_to_array(tok, ''),
             |        c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 2147483647) AS h
             |  FROM toks WHERE length(tok) > 0),
             |sums AS (
             |  SELECT doc_id, CAST(h % 16 AS INTEGER) AS dim_idx,
             |    SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS v
             |  FROM hashed GROUP BY 1, 2),
             |grid AS (
             |  SELECT d.doc_id, CAST(i AS INTEGER) AS dim_idx
             |  FROM documents d CROSS JOIN (SELECT unnest(range(0, 16)) AS i))
             |SELECT g.doc_id, g.dim_idx,
             |  CAST(COALESCE(s.v, 0) AS BIGINT) AS value
             |FROM grid g LEFT JOIN sums s USING (doc_id, dim_idx)
             |ORDER BY doc_id, dim_idx""".stripMargin)),

    // The chain the seam exists for: embed → cosine top-k, stub
    // embeddings feeding the sim_topk_cosine shape unchanged (integer
    // components ⇒ exact long dots; same double cosine formula as
    // sim_topk_cosine, so fully oracled end to end — text in, ranked
    // neighbors out). Zero-norm vectors are filtered on BOTH sides (a
    // cosine against them is undefined); rank keys plan through the
    // two-phase TopKPerKey strategy like every ranking key. At
    // production scale the embedded frame would be checkpointed before
    // fan-out — here the fixture-sized recompute is the documented cost
    // of keeping the key a single plan.
    "sim_embed_topk_cosine" -> QuerySpec(
      (s, d) => {
        val emb = EmbedOps.embedWith(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          "text", () => new EmbedOps.HashingEmbedder(dim = 16, seed = 7L))
          .select(col("doc_id"),
            transform(col("embedding"), x => x.cast(LongType)).as("iv"))
        val withNorm = emb
          .withColumn("nn", SimilarityOps.dotLong(col("iv"), col("iv")))
          .filter(col("nn") > 0)
        val q = withNorm.filter(col("doc_id") < 5)
          .select(col("doc_id").as("qid"), col("iv").as("qv"), col("nn").as("na"))
        val c = withNorm
          .select(col("doc_id").as("cid"), col("iv").as("cv"), col("nn").as("nb"))
        val scored = c.crossJoin(broadcast(q))
          .withColumn("dot", SimilarityOps.dotLong(col("qv"), col("cv")))
          .withColumn("cos_q", col("dot").cast(DoubleType) /
            (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos_q").desc, col("cid"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("rn"), col("cid"), col("cos_q"))
          .orderBy(col("qid"), col("rn"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |hashed AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(regexp_split_to_array(tok, ''),
             |        c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 2147483647) AS h
             |  FROM toks WHERE length(tok) > 0),
             |sums AS (
             |  SELECT doc_id, h % 16 AS dim_idx,
             |    SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS v
             |  FROM hashed GROUP BY 1, 2),
             |norms AS (
             |  SELECT doc_id, SUM(v*v) AS nn FROM sums GROUP BY 1),
             |live AS (SELECT doc_id FROM norms WHERE nn > 0),
             |pairs AS (
             |  SELECT q.doc_id AS qid, c.doc_id AS cid
             |  FROM live q CROSS JOIN live c WHERE q.doc_id < 5),
             |dots AS (
             |  SELECT q.doc_id AS qid, c.doc_id AS cid, SUM(q.v * c.v) AS dot
             |  FROM sums q JOIN sums c USING (dim_idx)
             |  WHERE q.doc_id < 5 GROUP BY 1, 2),
             |scored AS (
             |  SELECT p.qid, p.cid,
             |    CAST(COALESCE(d.dot, 0) AS DOUBLE) /
             |      (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nc.nn AS DOUBLE))) AS cos_q
             |  FROM pairs p
             |  LEFT JOIN dots d ON d.qid = p.qid AND d.cid = p.cid
             |  JOIN norms nq ON nq.doc_id = p.qid
             |  JOIN norms nc ON nc.doc_id = p.cid),
             |ranked AS (
             |  SELECT qid, cid, cos_q,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos_q DESC, cid) AS rn
             |  FROM scored)
             |SELECT qid, CAST(rn AS INTEGER) AS rn, cid, cos_q
             |FROM ranked WHERE rn <= 10 ORDER BY qid, rn""".stripMargin),
      allowBnlj = true),

    // int8 embedding quantization (4× storage/shuffle cut at 100 TB):
    // quantize → dequantize round trip with the per-vector error bound
    // checked IN the query. Fully ORACLED: the chain (scale = max|x|/127,
    // round(x/scale), code·scale) is deterministic double arithmetic, and
    // round() agrees cross-engine — an exactly-representable k.5 tie
    // rounds away from zero in BOTH engines (Spark's BigDecimal HALF_UP,
    // DuckDB's half-away-from-zero), and a non-tie double's shortest
    // decimal representation is never exactly k.5, so no other input can
    // straddle the .5 comparison. Bound/recall/round-trip properties
    // additionally unit-tested (SimilaritySpec).
    "sim_quantize_int8" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), SimilarityOps.asDouble(col("embedding")).as("v"))
        val q = emb.withColumn("q", SimilarityOps.quantizeInt8(col("v")))
        q.select(col("vec_id"),
          col("q.scale").as("scale"),
          SimilarityOps.dequantizeInt8(col("q")).as("vhat"), col("v"))
          .select(col("vec_id"),
            size(col("vhat")).as("dim"),
            aggregate(zip_with(col("v"), col("vhat"), (x, y) => abs(x - y)),
              lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"),
            (col("scale") / 2 + 1e-12).as("err_bound"))
          .withColumn("within_bound", (col("max_err") <= col("err_bound")).cast("int"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |s AS (
             |  SELECT vec_id, v,
             |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
             |  FROM e),
             |r AS (
             |  SELECT vec_id, len(v) AS dim, scale,
             |    CASE WHEN scale = 0 THEN 0.0 ELSE
             |      list_max(list_transform(v, x -> abs(x - round(x / scale) * scale)))
             |    END AS max_err
             |  FROM s)
             |SELECT vec_id, CAST(dim AS INTEGER) AS dim, max_err,
             |  scale / 2 + 1e-12 AS err_bound,
             |  CAST(max_err <= scale / 2 + 1e-12 AS INTEGER) AS within_bound
             |FROM r ORDER BY vec_id""".stripMargin)),

    // Per-cluster centroids (SimilarityOps.clusterCentroids) on the
    // quantized grid — same floor(x·1000) trick as sim_topk_cosine, so
    // the decimal-accumulated means are integer-exact cross-engine. The
    // centroid ARRAY is posexploded back to scalar (pos, mean) rows:
    // the driver comparator can't sort array cells, and the explode
    // additionally pins the assembly order (position i ↔ mean of dim i).
    "sim_cluster_centroids" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings").select(col("label").as("cluster"),
          transform(col("embedding"),
            x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("qv"))
        SimilarityOps.clusterCentroids(emb, "cluster", "qv")
          .select(col("cluster"), col("dim"),
            posexplode(col("centroid")).as(Seq("pos", "mean")))
          .select(col("cluster"), col("dim"), col("pos").cast(LongType).as("pos"),
            col("mean"))
          .orderBy(col("cluster"), col("pos"))
      },
      Some("""WITH e AS (
             |  SELECT label AS cluster,
             |    unnest(range(len(embedding))) AS pos,
             |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
             |  FROM embeddings),
             |m AS (SELECT cluster, pos, CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean
             |      FROM e GROUP BY cluster, pos),
             |dm AS (SELECT cluster, COUNT(*) AS dim FROM m GROUP BY cluster)
             |SELECT m.cluster, dm.dim, m.pos, m.mean
             |FROM m JOIN dm USING (cluster)
             |ORDER BY cluster, pos""".stripMargin)),

    // Embedding-space drift between snapshots (the vector companion to
    // profile_snapshot_drift): even vec_ids are the reference corpus,
    // odd the monitored refresh. Per-dim centroid means + the cosine
    // between centroids, all from exact floor(x·1000) integer sums
    // (cosine is scale-invariant so the sums stand in for the means;
    // DECIMAL products summed order-free across the 64 dims — no
    // cross-row double sum anywhere). Fully oracled.
    "sim_embedding_drift" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        SimilarityOps.embeddingDrift(
          emb.filter(pmod(col("vec_id"), lit(2)) === 0),
          emb.filter(pmod(col("vec_id"), lit(2)) === 1),
          "embedding", shiftThreshold = 0.001)
          .orderBy(col("dim"))
      },
      Some("""WITH r AS (
             |  SELECT unnest(range(len(embedding))) AS dim,
             |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
             |  FROM embeddings WHERE vec_id % 2 = 0),
             |c AS (
             |  SELECT unnest(range(len(embedding))) AS dim,
             |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
             |  FROM embeddings WHERE vec_id % 2 = 1),
             |ra AS (SELECT dim, SUM(q) AS s_ref, count(*) AS n_ref FROM r GROUP BY 1),
             |ca AS (SELECT dim, SUM(q) AS s_cur, count(*) AS n_cur FROM c GROUP BY 1),
             |j AS (
             |  SELECT ra.dim, s_ref, n_ref, s_cur, n_cur
             |  FROM ra JOIN ca USING (dim)),
             |t AS (
             |  SELECT dim, n_ref, n_cur, s_ref, s_cur,
             |    SUM(CAST(s_ref AS HUGEINT) * s_cur) OVER () AS dot,
             |    SUM(CAST(s_ref AS HUGEINT) * s_ref) OVER () AS na,
             |    SUM(CAST(s_cur AS HUGEINT) * s_cur) OVER () AS nb
             |  FROM j)
             |SELECT CAST(dim AS INTEGER) AS dim,
             |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
             |  CAST(s_ref AS DOUBLE) / n_ref / 1000.0 AS mean_ref,
             |  CAST(s_cur AS DOUBLE) / n_cur / 1000.0 AS mean_cur,
             |  abs(CAST(s_ref AS DOUBLE) / n_ref / 1000.0
             |    - CAST(s_cur AS DOUBLE) / n_cur / 1000.0) AS shift,
             |  CASE WHEN na > 0 AND nb > 0 THEN CAST(dot AS DOUBLE)
             |    / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) END
             |    AS centroid_cosine,
             |  CAST(abs(CAST(s_ref AS DOUBLE) / n_ref / 1000.0
             |    - CAST(s_cur AS DOUBLE) / n_cur / 1000.0) > 0.001 AS INTEGER)
             |    AS dim_drifted
             |FROM t ORDER BY dim""".stripMargin)),

    // LSH-bucketed ANN — the scale path (bucket join instead of cross
    // join). ORACLED since round 11 via the STAGED PLANES artifact:
    // hyperplanes snapped to the milli grid + quantized vectors make
    // every projection an exact integer dot, so bucket ids, the
    // hamming-1 multi-probe set, cosines and the ranking are all
    // bit-portable; DuckDB replays the whole pipeline. Raw-plane
    // recall floors still ride sim_ann_recall + SimilaritySpec.
    "sim_ann_lsh" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        staged(d, "ann_lsh_planes") { dir =>
          import s.implicits._
          SimilarityOps.quantizedPlanes(nBits = 4, dim = 64).zipWithIndex
            .map { case (p, i) => (i, p.toSeq) }.toSeq
            .toDF("bit", "plane")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        SimilarityOps.annTopK(q, c, k = 10, nBits = 4, dim = 64,
          probeHamming = 1, quantizedBuckets = true)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH $annQuantVecCtes,
             |planes AS (
             |  SELECT bit, plane FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/ann_lsh_planes/*.parquet')),
             |qproj AS (
             |  SELECT qid, bit, SUM(xv*pv) AS d
             |  FROM (SELECT q.qid, p.bit, unnest(q.qvec) AS xv, unnest(p.plane) AS pv
             |        FROM q0 q CROSS JOIN planes p)
             |  GROUP BY qid, bit),
             |qb0 AS (
             |  SELECT qid, CAST(SUM(CASE WHEN d >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS b0
             |  FROM qproj GROUP BY qid),
             |qb AS (
             |  SELECT qid, xor(b0, m) AS bucket
             |  FROM qb0 CROSS JOIN (SELECT CAST(unnest([0,1,2,4,8]) AS BIGINT) AS m)),
             |cproj AS (
             |  SELECT cid, bit, SUM(xv*pv) AS d
             |  FROM (SELECT c.cid, p.bit, unnest(c.cvec) AS xv, unnest(p.plane) AS pv
             |        FROM c0 c CROSS JOIN planes p)
             |  GROUP BY cid, bit),
             |cb AS (
             |  SELECT cid, CAST(SUM(CASE WHEN d >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket
             |  FROM cproj GROUP BY cid),
             |pairs AS (
             |  SELECT q.qid, c.cid, unnest(qq.qvec) AS qv, unnest(cc.cvec) AS cv
             |  FROM qb q
             |  JOIN cb c ON c.bucket = q.bucket
             |  JOIN q0 qq ON qq.qid = q.qid
             |  JOIN c0 cc ON cc.cid = c.cid),
             |scored AS (
             |  SELECT qid, cid, CAST(SUM(qv*cv) AS DOUBLE)
             |    / (sqrt(CAST(SUM(qv*qv) AS DOUBLE)) * sqrt(CAST(SUM(cv*cv) AS DOUBLE))) AS cos
             |  FROM pairs GROUP BY qid, cid)
             |SELECT qid, rn, cid, cos FROM (
             |  SELECT qid, cid, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INTEGER) AS rn
             |  FROM scored)
             |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // IVF ANN (k-means cells + nProbe probing) — the inverted-file scale
    // path. The coarse quantizer is trained ONCE per dataset (ivfFit,
    // memoized) — the production fit/query split; the query pays only a
    // codegen'd cell assignment + broadcast probe join, no iterative ML
    // jobs. ORACLED since round 11: the quantized model is STAGED as a
    // parquet artifact and both vectors and centroids live on the
    // milli-grid, so DuckDB replays nearest-cell assignment, nProbe
    // probing and the cosine ranking over exact integer dot products —
    // recall floors still ride sim_ann_recall's raw-model curve.
    "sim_ann_ivf" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val model = quantizedIvf(s, d)
        stageAnnModels(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        SimilarityOps.ivfTopKWithModel(
          q, SimilarityOps.ivfAssign(c, "cvec", model), model, k = 10, nProbe = 3)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH $annQuantVecCtes,
             |$annIvfProbeCtes
             |pairs AS (
             |  SELECT p.qid, a.cid, unnest(q.qvec) AS qv, unnest(c.cvec) AS cv
             |  FROM probe p
             |  JOIN cell_assign a ON a.cell = p.cell
             |  JOIN q0 q ON q.qid = p.qid
             |  JOIN c0 c ON c.cid = a.cid),
             |scored AS (
             |  SELECT qid, cid, CAST(SUM(qv*cv) AS DOUBLE)
             |    / (sqrt(CAST(SUM(qv*qv) AS DOUBLE)) * sqrt(CAST(SUM(cv*cv) AS DOUBLE))) AS cos
             |  FROM pairs GROUP BY qid, cid)
             |SELECT qid, rn, cid, cos FROM (
             |  SELECT qid, cid, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INTEGER) AS rn
             |  FROM scored)
             |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // Product-quantization ANN (Jégou et al. 2011) — the compression
    // scale path: vectors encode to M=16 code bytes + an exact norm
    // (≈13× fewer bytes than float32), queries score candidates by M
    // table lookups (ADC). M=16 subspaces × K=64 codes chosen by
    // measurement (M=8/K=16 gave 0.26 recall at sf0.1; this 0.56-0.64).
    // Codebooks are k-means-trained offline (fit/query split, memoized
    // like IVF). ORACLED since round 11: the quantized codebooks are
    // STAGED as a parquet model artifact and DuckDB replays per-subspace
    // code assignment + the ADC lookup-table scoring over exact integer
    // dot products; recall floors ride sim_ann_recall + units.
    "sim_ann_pq" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val model = quantizedPq(s, d)
        stageAnnModels(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        SimilarityOps.pqTopK(q, SimilarityOps.pqAssign(c, "cvec", model),
          model, k = 10)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH $annQuantVecCtes,
             |$annPqCtes
             |adc AS (
             |  SELECT t.qid, c.cid,
             |    CAST(SUM(t.pdot) AS DOUBLE) / (qn.qn * cn.cn) AS cos_adc
             |  FROM pq_code c
             |  JOIN pq_qt t ON t.m = c.m AND t.code = c.code
             |  JOIN pq_qnorm qn ON qn.qid = t.qid
             |  JOIN pq_cnorm cn ON cn.cid = c.cid
             |  GROUP BY t.qid, c.cid, qn.qn, cn.cn)
             |SELECT qid, rn, cid, cos_adc FROM (
             |  SELECT qid, cid, cos_adc,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS INTEGER) AS rn
             |  FROM adc)
             |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin),
      allowBnlj = true),

    // IVF-PQ — both scale levers composed (the FAISS production shape):
    // probe nProbe cells (row count ÷ nCentroids/nProbe) and ADC-score
    // codes within them (bytes ÷ ~13). ORACLED since round 11 over the
    // two staged model artifacts (cells + codebooks); the recall floor
    // rides sim_ann_recall's curve (`ann_ivfpq`).
    "sim_ann_ivfpq" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val ivfM = quantizedIvf(s, d)
        val pqM = quantizedPq(s, d)
        stageAnnModels(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        val assigned = SimilarityOps.pqAssign(
          SimilarityOps.ivfAssign(c, "cvec", ivfM), "cvec", pqM)
        SimilarityOps.ivfPqTopK(q, assigned, ivfM, pqM, k = 10, nProbe = 3)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH $annQuantVecCtes,
             |$annIvfProbeCtes
             |$annPqCtes
             |adc AS (
             |  SELECT p.qid, a.cid,
             |    CAST(SUM(t.pdot) AS DOUBLE) / (qn.qn * cn.cn) AS cos_adc
             |  FROM probe p
             |  JOIN cell_assign a ON a.cell = p.cell
             |  JOIN pq_code c ON c.cid = a.cid
             |  JOIN pq_qt t ON t.qid = p.qid AND t.m = c.m AND t.code = c.code
             |  JOIN pq_qnorm qn ON qn.qid = p.qid
             |  JOIN pq_cnorm cn ON cn.cid = a.cid
             |  GROUP BY p.qid, a.cid, qn.qn, cn.cn)
             |SELECT qid, rn, cid, cos_adc FROM (
             |  SELECT qid, cid, cos_adc,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS INTEGER) AS rn
             |  FROM adc)
             |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // Hard-negative mining (SimilarityOps.hardNegatives): per anchor,
    // the top-10 most similar candidates BELOW the 0.95 near-dup line —
    // the "similar but not the same" examples contrastive fine-tuning
    // learns most from, mined between the dedup pass and training.
    // Quantized-grid arithmetic ⇒ fully oracled: the mined set is
    // bit-reproducible across engines, which a training set should be.
    "sim_hard_negatives" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.hardNegatives(q, c, k = 10, dupThreshold = 0.95)
          .orderBy(col("qid"), col("rn"))
      },
      Some("""WITH pairs AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    CAST(FLOOR(CAST(unnest(q.embedding) AS DOUBLE)*1000) AS BIGINT) AS qv,
             |    CAST(FLOOR(CAST(unnest(c.embedding) AS DOUBLE)*1000) AS BIGINT) AS cv
             |  FROM embeddings q, embeddings c
             |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
             |dots AS (
             |  SELECT qid, cid, SUM(qv*cv) AS dot, SUM(qv*qv) AS na, SUM(cv*cv) AS nb
             |  FROM pairs GROUP BY qid, cid),
             |scored AS (
             |  SELECT qid, cid,
             |    CAST(dot AS DOUBLE)/(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))) AS cos_q
             |  FROM dots),
             |kept AS (SELECT * FROM scored WHERE cos_q < 0.95),
             |r AS (
             |  SELECT qid, cid, cos_q, row_number() OVER (PARTITION BY qid
             |    ORDER BY cos_q DESC, cid) AS rn
             |  FROM kept)
             |SELECT qid, CAST(rn AS INTEGER) AS rn, cid, cos_q
             |FROM r WHERE rn <= 10 ORDER BY qid, rn""".stripMargin),
      allowBnlj = true),

    // MMR-diversified top-k (SimilarityOps.mmrTopK, Carbonell &
    // Goldstein): the de-duplicating re-rank between retrieval and a
    // RAG context window — λ·rel − (1−λ)·max-sim-to-selected, greedy,
    // unrolled at plan level (3 selection rounds like the funnel
    // chain). Corpus scanned once for the top-8 pools; the grid and
    // selection work on queries×8 rows. Quantized cosines + fixed IEEE
    // scores + (score DESC, id ASC) ties ⇒ the selected set is
    // bit-reproducible and fully ORACLED as 3 unrolled SQL rounds.
    "sim_mmr_diversify" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val c = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        SimilarityOps.mmrTopK(q, c,
          kCandidates = 8, kSelect = 3, lambda = 0.5)
          .orderBy(col("qid"), col("rank"))
      },
      Some("""WITH pr AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS cid,
             |    CAST(FLOOR(CAST(unnest(q.embedding) AS DOUBLE)*1000)
             |      AS BIGINT) AS qv,
             |    CAST(FLOOR(CAST(unnest(c.embedding) AS DOUBLE)*1000)
             |      AS BIGINT) AS cv
             |  FROM embeddings q, embeddings c
             |  WHERE q.vec_id < 5 AND c.vec_id >= 5),
             |dt AS (
             |  SELECT qid, cid, SUM(qv*cv) AS dot,
             |    SUM(qv*qv) AS na, SUM(cv*cv) AS nb
             |  FROM pr GROUP BY 1, 2),
             |relc AS (
             |  SELECT qid, cid,
             |    CAST(dot AS DOUBLE)
             |      /(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE)))
             |      AS rel
             |  FROM dt),
             |pool AS (
             |  SELECT qid, cid, rel FROM (
             |    SELECT qid, cid, rel, row_number() OVER (
             |      PARTITION BY qid ORDER BY rel DESC, cid) AS rn
             |    FROM relc) WHERE rn <= 8),
             |cp AS (
             |  SELECT a.vec_id AS aid, b.vec_id AS bid,
             |    CAST(FLOOR(CAST(unnest(a.embedding) AS DOUBLE)*1000)
             |      AS BIGINT) AS av,
             |    CAST(FLOOR(CAST(unnest(b.embedding) AS DOUBLE)*1000)
             |      AS BIGINT) AS bv
             |  FROM embeddings a, embeddings b
             |  WHERE a.vec_id IN (SELECT DISTINCT cid FROM pool)
             |    AND b.vec_id IN (SELECT DISTINCT cid FROM pool)
             |    AND a.vec_id <> b.vec_id),
             |cd0 AS (
             |  SELECT aid, bid, SUM(av*bv) AS dot,
             |    SUM(av*av) AS na, SUM(bv*bv) AS nb
             |  FROM cp GROUP BY 1, 2),
             |cd AS (
             |  SELECT aid, bid,
             |    CAST(dot AS DOUBLE)
             |      /(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE)))
             |      AS s
             |  FROM cd0),
             |t1 AS (SELECT qid, cid, rel,
             |         0.5*rel - 0.5*0.0 AS score FROM pool),
             |s1 AS (SELECT qid, cid, rel, score FROM (
             |  SELECT qid, cid, rel, score, row_number() OVER (
             |    PARTITION BY qid ORDER BY score DESC, cid) AS w
             |  FROM t1) WHERE w = 1),
             |r1 AS (
             |  SELECT p.* FROM pool p
             |  LEFT JOIN s1 ON s1.qid = p.qid AND s1.cid = p.cid
             |  WHERE s1.cid IS NULL),
             |m2 AS (
             |  SELECT r.qid, r.cid, max(cd.s) AS ms
             |  FROM r1 r JOIN s1 ON s1.qid = r.qid
             |  JOIN cd ON cd.aid = r.cid AND cd.bid = s1.cid
             |  GROUP BY 1, 2),
             |t2 AS (
             |  SELECT r.qid, r.cid, r.rel,
             |    0.5*r.rel - 0.5*COALESCE(m2.ms, 0.0) AS score
             |  FROM r1 r LEFT JOIN m2 ON m2.qid = r.qid AND m2.cid = r.cid),
             |s2 AS (SELECT qid, cid, rel, score FROM (
             |  SELECT qid, cid, rel, score, row_number() OVER (
             |    PARTITION BY qid ORDER BY score DESC, cid) AS w
             |  FROM t2) WHERE w = 1),
             |r2 AS (
             |  SELECT r.* FROM r1 r
             |  LEFT JOIN s2 ON s2.qid = r.qid AND s2.cid = r.cid
             |  WHERE s2.cid IS NULL),
             |sel2 AS (SELECT qid, cid FROM s1
             |         UNION ALL SELECT qid, cid FROM s2),
             |m3 AS (
             |  SELECT r.qid, r.cid, max(cd.s) AS ms
             |  FROM r2 r JOIN sel2 ON sel2.qid = r.qid
             |  JOIN cd ON cd.aid = r.cid AND cd.bid = sel2.cid
             |  GROUP BY 1, 2),
             |t3 AS (
             |  SELECT r.qid, r.cid, r.rel,
             |    0.5*r.rel - 0.5*COALESCE(m3.ms, 0.0) AS score
             |  FROM r2 r LEFT JOIN m3 ON m3.qid = r.qid AND m3.cid = r.cid),
             |s3 AS (SELECT qid, cid, rel, score FROM (
             |  SELECT qid, cid, rel, score, row_number() OVER (
             |    PARTITION BY qid ORDER BY score DESC, cid) AS w
             |  FROM t3) WHERE w = 1)
             |SELECT qid, CAST(1 AS INTEGER) AS rank, cid, rel,
             |  score AS mmr_score FROM s1
             |UNION ALL SELECT qid, CAST(2 AS INTEGER), cid, rel, score FROM s2
             |UNION ALL SELECT qid, CAST(3 AS INTEGER), cid, rel, score FROM s3
             |ORDER BY qid, rank""".stripMargin),
      allowBnlj = true),

    // Margin-based bitext/parallel-pair mining (SimilarityOps
    // .bitextMine, Artetxe & Schwenk 2019): per source anchor the best
    // target by cos RELATIVE to both local neighborhood densities —
    // margin = cos / (0.5·(avgₖ(x)+avgₖ(y))) — the LASER/CCMatrix
    // criterion that absolute-cosine thresholds get wrong in dense hub
    // regions. Retrieve-then-score: backward averages run only for the
    // forward-nominated candidates. Quantized-grid cosines + sorted
    // fixed-order k-means folds ⇒ the mined pairs are bit-reproducible
    // and fully ORACLED; `mined` is data, not a filter, so the row
    // count stays the anchor count.
    "sim_bitext_mine" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val src = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 40)
          .select(col("vec_id").as("sid"), col("embedding").as("svec"))
        val tgt = emb.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id").as("tid"), col("embedding").as("tvec"))
        SimilarityOps.bitextMine(src, tgt, k = 4, marginThreshold = 1.0)
          .orderBy(col("sid"))
      },
      Some("""WITH pairs AS (
             |  SELECT s.vec_id AS sid, c.vec_id AS tid,
             |    CAST(FLOOR(CAST(unnest(s.embedding) AS DOUBLE)*1000)
             |      AS BIGINT) AS qv,
             |    CAST(FLOOR(CAST(unnest(c.embedding) AS DOUBLE)*1000)
             |      AS BIGINT) AS cv
             |  FROM embeddings s, embeddings c
             |  WHERE s.vec_id % 2 = 0 AND s.vec_id < 40
             |    AND c.vec_id % 2 = 1),
             |dots AS (
             |  SELECT sid, tid, SUM(qv*cv) AS dot,
             |    SUM(qv*qv) AS na, SUM(cv*cv) AS nb
             |  FROM pairs GROUP BY sid, tid),
             |cosq AS (
             |  SELECT sid, tid,
             |    CAST(dot AS DOUBLE)
             |      /(sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE)))
             |      AS cos
             |  FROM dots),
             |fr AS (
             |  SELECT sid, tid, cos, row_number() OVER (PARTITION BY sid
             |    ORDER BY cos DESC, tid) AS rn
             |  FROM cosq),
             |fk AS (SELECT * FROM fr WHERE rn <= 4),
             |avgs AS (
             |  SELECT sid,
             |    list_reduce(list(cos ORDER BY cos DESC), (a,b) -> a + b)
             |      / 4.0 AS avg_s
             |  FROM fk GROUP BY 1),
             |br AS (
             |  SELECT sid, tid, cos, row_number() OVER (PARTITION BY tid
             |    ORDER BY cos DESC, sid) AS brn
             |  FROM cosq
             |  WHERE tid IN (SELECT DISTINCT tid FROM fk)),
             |avgt AS (
             |  SELECT tid,
             |    list_reduce(list(cos ORDER BY cos DESC), (a,b) -> a + b)
             |      / 4.0 AS avg_t
             |  FROM br WHERE brn <= 4 GROUP BY 1),
             |m AS (
             |  SELECT f.sid, f.tid, f.cos,
             |    f.cos / (0.5 * (a.avg_s + t.avg_t)) AS margin
             |  FROM fk f JOIN avgs a USING (sid) JOIN avgt t USING (tid)),
             |r AS (
             |  SELECT sid, tid, cos, margin, row_number() OVER (
             |    PARTITION BY sid ORDER BY margin DESC, tid) AS mrn
             |  FROM m)
             |SELECT sid, tid, cos, margin, margin >= 1.0 AS mined
             |FROM r WHERE mrn = 1 ORDER BY sid""".stripMargin),
      allowBnlj = true),

    // IVF-PQ + EXACT re-rank (retrieve-then-rerank, the FAISS refine
    // shape): the compressed index nominates kCoarse=30 candidates per
    // query by ADC, only those 30 raw vectors are read back (broadcast
    // semi-join of the tiny candidate list into the raw table — never a
    // scan), and the exact top-10 of the exact scores is returned.
    // ORACLED since round 11 over the staged models: DuckDB replays the
    // ADC kCoarse=30 nomination AND the exact re-scoring; the recall
    // floor AND the rerank ≥ ivfpq dominance assert still ride
    // sim_ann_recall's curve.
    "sim_ann_ivfpq_rerank" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val ivfM = quantizedIvf(s, d)
        val pqM = quantizedPq(s, d)
        stageAnnModels(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        val assigned = SimilarityOps.pqAssign(
          SimilarityOps.ivfAssign(c, "cvec", ivfM), "cvec", pqM)
        SimilarityOps.ivfPqRerankTopK(q, assigned, c, ivfM, pqM,
          k = 10, kCoarse = 30, nProbe = 3)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH $annQuantVecCtes,
             |$annIvfProbeCtes
             |$annPqCtes
             |adc AS (
             |  SELECT p.qid, a.cid,
             |    CAST(SUM(t.pdot) AS DOUBLE) / (qn.qn * cn.cn) AS cos_adc
             |  FROM probe p
             |  JOIN cell_assign a ON a.cell = p.cell
             |  JOIN pq_code c ON c.cid = a.cid
             |  JOIN pq_qt t ON t.qid = p.qid AND t.m = c.m AND t.code = c.code
             |  JOIN pq_qnorm qn ON qn.qid = p.qid
             |  JOIN pq_cnorm cn ON cn.cid = a.cid
             |  GROUP BY p.qid, a.cid, qn.qn, cn.cn),
             |coarse AS (
             |  SELECT qid, cid FROM (
             |    SELECT qid, cid,
             |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS cr
             |    FROM adc) WHERE cr <= 30),
             |rpairs AS (
             |  SELECT k.qid, k.cid, unnest(q.qvec) AS qv, unnest(c.cvec) AS cv
             |  FROM coarse k
             |  JOIN q0 q ON q.qid = k.qid
             |  JOIN c0 c ON c.cid = k.cid),
             |rescored AS (
             |  SELECT qid, cid, CAST(SUM(qv*cv) AS DOUBLE)
             |    / (sqrt(CAST(SUM(qv*qv) AS DOUBLE)) * sqrt(CAST(SUM(cv*cv) AS DOUBLE))) AS cos
             |  FROM rpairs GROUP BY qid, cid)
             |SELECT qid, rn, cid, cos FROM (
             |  SELECT qid, cid, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INTEGER) AS rn
             |  FROM rescored)
             |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // ANN → CHECKED estimator: the recall/COST curve of both approximate
    // paths (LSH hyperplane buckets, IVF cell probing) against the
    // brute-force truth, measured IN-query on the same fixture the ANN
    // keys serve — the sketch-vs-exact pattern (dedup_minhash_vs_exact,
    // agg_cms_checked) applied to similarity search. One row per
    // (method, probe setting): `cost_frac` is the expected fraction of
    // the corpus scanned (LSH: buckets within hamming h of the query's,
    // Σ_{i≤h} C(4,i)/2⁴; IVF: nProbe/nCentroids), `above_floor` asserts
    // the AVG recall (min over 5 queries is a noisy order statistic —
    // measured 0.3-0.4 for LSH across SFs while the avg holds 0.5+),
    // and `monotone_ok` asserts more probes never LOWER recall within a
    // method — the property multi-probing exists for. Floors sit with
    // margin under measured values at sf0.01 AND sf0.1 (LSH h=0:
    // 0.22-0.26 measured → floor 0.15; h=1: 0.5-0.62 → 0.4; IVF p=1:
    // 0.40-0.46 → 0.3; p=3: 0.70 both SFs → 0.6) and are also unit-asserted
    // (SimilaritySpec). Truth and ANN sides are each deterministic, but
    // IVF centroids are iteration-order-sensitive ⇒ rows-only tier; the
    // CHECK rides in the query.
    // Partitioned HNSW ANN — the GRAPH tier (r15, Malkov & Yashunin
    // 2016), closing the ANN family's last class gap
    // (LSH/IVF/PQ/IVF-PQ/rerank were the partition-friendly tiers; a
    // faithful single HNSW is sequential pointer-chasing in one
    // memory space, so the Spark-native shape is per-shard graphs +
    // union-of-frontiers + exact in-plan re-rank —
    // SimilarityOps.hnswCandidates documents the determinism
    // contract: splitmix64 levels from global ids, ascending-cid
    // insertion, (dist, id) heap order). Graph construction is not
    // SQL-expressible ⇒ rows-only tier, so the key IS its own checked
    // estimator (the agg_cms_checked discipline): per-query recall of
    // hnswTopK vs the brute-force truth, the REALIZED candidate cost
    // fraction (measured in-query, not a parameter-derived claim),
    // and the floor assertion, all in one plan. Floors measured:
    // recall 1.0 at sf0.01 AND sf0.1 → floor 0.6 with margin (the
    // ivf p=3 class). The recall row also rides sim_ann_recall's
    // curve beside every other method.
    "sim_ann_hnsw" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        val truth = SimilarityOps.bruteTopK(
            emb.filter(col("vec_id") < 5)
              .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
            emb.select(col("vec_id").as("cid"), col("embedding").as("cvec")),
            k = 10)
          .select(col("qid"), col("cid"))
        // candidate set feeds BOTH the cost measure and the re-rank:
        // materialize once (the liftTable discipline)
        val cands = SimilarityOps.hnswCandidates(q, c, nShards = 4,
          m = 8, efConstruction = 64, efSearch = 48).localCheckpoint()
        val ann = SimilarityOps.exactRerank(cands, q, c, k = 10)
        val nCand = c.agg(count(lit(1)).as("_n"))
        truth
          .join(ann.select(col("qid"), col("cid"), lit(1).as("_hit")),
            Seq("qid", "cid"), "left")
          .groupBy(col("qid"))
          .agg((sum(coalesce(col("_hit"), lit(0))).cast(DoubleType) / 10.0)
            .as("recall"))
          .join(cands.groupBy(col("qid")).agg(count(lit(1)).as("n_cands")),
            Seq("qid"))
          .crossJoin(broadcast(nCand))
          .select(col("qid"), lit(10).as("k"),
            col("n_cands").cast(LongType).as("n_cands"),
            round(col("n_cands").cast(DoubleType) / col("_n"), 3)
              .as("cost_frac"),
            round(col("recall"), 3).as("recall"),
            lit(0.6).as("recall_floor"),
            (col("recall") >= 0.6).cast(IntegerType).as("above_floor"))
          .orderBy(col("qid"))
      },
      None,
      allowBnlj = true),

    // The HNSW tier's ORACLED key (r16, r15 verdict ask #1): the
    // saturating configuration — efSearch = n makes each per-shard
    // search exhaustive (HnswShard.search's saturation sweep contract),
    // each shard's frontier is its exact local top-10, the union of
    // frontiers provably contains the global top-10, and exactRerank's
    // output is bit-identical to bruteTopK on the milli-grid LONG
    // vectors — which DuckDB re-derives below with exact integer dot
    // products (the sim_ann_lsh arithmetic class: 64-term integer sums
    // ≤ ~1e7 are exactly representable, so the only doubles are the
    // final sqrt/divide chain, identical on both engines). The graph is
    // genuinely built and searched (entry descent, layer-0 beam); only
    // the approximation is removed — a hash match certifies the whole
    // build/search/rerank path on the real corpus, closing the one ANN
    // family whose correctness evidence never left the repo. The
    // approximate key above stays as the recall/cost row.
    "sim_ann_hnsw_exact" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        SimilarityOps.hnswTopKExact(q, c, k = 10, nShards = 4,
          m = 8, efConstruction = 64)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH $annQuantVecCtes,
             |pairs AS (
             |  SELECT q.qid, c.cid, unnest(q.qvec) AS qv, unnest(c.cvec) AS cv
             |  FROM q0 q CROSS JOIN c0 c),
             |scored AS (
             |  SELECT qid, cid, CAST(SUM(qv*cv) AS DOUBLE)
             |    / (sqrt(CAST(SUM(qv*qv) AS DOUBLE)) * sqrt(CAST(SUM(cv*cv) AS DOUBLE))) AS cos
             |  FROM pairs GROUP BY qid, cid)
             |SELECT qid, rn, cid, cos FROM (
             |  SELECT qid, cid, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INTEGER) AS rn
             |  FROM scored)
             |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin)),

    "sim_ann_recall" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val truth = SimilarityOps.bruteTopK(q, c, k = 10)
          .select(col("qid"), col("cid"))
        val model = ivfModel(s, d)
        val assigned = SimilarityOps.ivfAssign(c, "cvec", model)
        def recallOf(ann: DataFrame, method: String, probes: Int,
            costFrac: Double, floor: Double): DataFrame =
          truth.join(ann.select(col("qid"), col("cid"), lit(1).as("_hit")),
              Seq("qid", "cid"), "left")
            .groupBy(col("qid"))
            .agg((sum(coalesce(col("_hit"), lit(0))).cast(DoubleType) / 10.0)
              .as("recall"))
            .agg(count(lit(1)).as("n_queries"),
              round(avg(col("recall")), 3).as("avg_recall"),
              round(min(col("recall")), 3).as("min_recall"))
            .select(lit(method).as("method"), lit(probes).as("probes"),
              col("n_queries"), lit(10).as("k"),
              lit(costFrac).as("cost_frac"),
              col("avg_recall"), col("min_recall"),
              lit(floor).as("recall_floor"),
              (col("avg_recall") >= floor).cast(IntegerType).as("above_floor"))
        def lsh(h: Int) = SimilarityOps.annTopK(
          q, c, k = 10, nBits = 4, dim = 64, probeHamming = h)
        // the r11 ORACLED configuration (milli-grid vectors + quantized
        // planes): its recall must clear the same floor as the raw form
        // — quantization moves only coin-flip boundary buckets
        val qQ = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val cQ = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        val lshQRow = recallOf(
          SimilarityOps.annTopK(qQ, cQ, k = 10, nBits = 4, dim = 64,
            probeHamming = 1, quantizedBuckets = true),
          "ann_lsh_quantized", 5, 5.0 / 16, 0.4)
        def ivf(p: Int) = SimilarityOps.ivfTopKWithModel(
          q, assigned, model, k = 10, nProbe = p)
        // PQ scans every ROW but reads codes+norm (16 byte-codes + a
        // 4-byte norm at M=16, K=64) instead of the 256 B float32
        // vector: cost_frac here is the BYTES fraction. Recall measured
        // 0.64 (sf0.01) / 0.56 (sf0.1) → floor 0.45 with margin.
        val pqModel = Catalog.pqModel(s, d)
        val pq = SimilarityOps.pqTopK(
          q, SimilarityOps.pqAssign(c, "cvec", pqModel), pqModel, k = 10)
        val pqAssigned = SimilarityOps.pqAssign(assigned, "cvec", pqModel)
        val ivfpqRow = recallOf(
          SimilarityOps.ivfPqTopK(q, pqAssigned, model, pqModel,
            k = 10, nProbe = 3),
          "ann_ivfpq", 3, (3.0 / 8) * (20.0 / 256), 0.35)
        // retrieve-then-rerank: same probes, kCoarse=30 ADC candidates
        // re-scored exactly — cost adds 30 raw reads per query (30/N of
        // the raw bytes ≈ negligible; keep the parent's cost_frac tag +
        // the rerank reads as the probes column can't carry two knobs).
        // Floor sits ABOVE the parent's: re-ranking recovers truth-set
        // members ADC ranked in (10, 30].
        val rerankRow = recallOf(
          SimilarityOps.ivfPqRerankTopK(q, pqAssigned, c, model, pqModel,
            k = 10, kCoarse = 30, nProbe = 3),
          "ann_ivfpq_rerank", 3, (3.0 / 8) * (20.0 / 256), 0.45)
        // graph tier (r15): partitioned HNSW — cost_frac is MEASURED
        // in-query (avg realized candidate fraction) rather than a
        // parameter-derived literal, because graph traversal cost is
        // data-dependent; probes column carries nShards
        val qQh = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val cQh = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        val hCands = SimilarityOps.hnswCandidates(qQh, cQh, nShards = 4,
          m = 8, efConstruction = 64, efSearch = 48).localCheckpoint()
        val hCost = hCands.groupBy(col("qid")).agg(count(lit(1)).as("_nc"))
          .crossJoin(broadcast(cQh.agg(count(lit(1)).as("_ncand"))))
          .agg(avg(col("_nc").cast(DoubleType) / col("_ncand")).as("_cf"))
        val hnswRow0 = recallOf(
          SimilarityOps.exactRerank(hCands, qQh, cQh, k = 10),
          "ann_hnsw", 4, 0.0, 0.6)
        val hnswRow = hnswRow0.drop("cost_frac")
          .crossJoin(broadcast(hCost.select(round(col("_cf"), 3)
            .as("cost_frac"))))
          .select(hnswRow0.columns.map(col).toSeq: _*)
        val curve =
          recallOf(lsh(0), "ann_lsh", 1, 1.0 / 16, 0.15)
            .unionByName(recallOf(lsh(1), "ann_lsh", 5, 5.0 / 16, 0.4))
            .unionByName(lshQRow)
            .unionByName(recallOf(ivf(1), "ann_ivf", 1, 1.0 / 8, 0.3))
            .unionByName(recallOf(ivf(3), "ann_ivf", 3, 3.0 / 8, 0.6))
            .unionByName(recallOf(pq, "ann_pq", 16, 20.0 / 256, 0.45))
            // IVF-PQ composes both levers: 3/8 of the rows × 20/256 of
            // the bytes ≈ 3% of the corpus bytes scanned; recall is
            // bounded above by min(parents) — floor set under measured
            .unionByName(ivfpqRow)
            .unionByName(rerankRow)
            .unionByName(hnswRow)
        val w = Window.partitionBy(col("method")).orderBy(col("probes"))
        // dominance check, riding every row (the LSH-dedup pattern):
        // exact re-rank at the same probe setting must never score
        // below its compressed parent
        val dominance = rerankRow.select(col("avg_recall").as("_rr"))
          .crossJoin(ivfpqRow.select(col("avg_recall").as("_pq")))
          .select((col("_rr") >= col("_pq")).cast(IntegerType)
            .as("rerank_ge_ivfpq"))
        curve
          .withColumn("monotone_ok",
            coalesce(col("avg_recall") >= lag(col("avg_recall"), 1).over(w),
              lit(true)).cast(IntegerType))
          .crossJoin(broadcast(dominance))
          .orderBy(col("method"), col("probes"))
      },
      None,
      allowBnlj = true),

    // ----------------------------------------------------------------- text
    "text_top_terms" -> QuerySpec(
      (s, d) => TextOps.topTerms(t(s, d, "documents"), "text", 50),
      Some("""SELECT term, count(*) AS cnt FROM (
             |  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
             |WHERE length(term) > 0
             |  AND term NOT IN ('the','a','an','and','or','of','to','in','is','it')
             |GROUP BY term ORDER BY cnt DESC, term LIMIT 50""".stripMargin)),

    // Code-vs-prose router (TextOps.codeDetect): the stage that splits
    // a mixed crawl into code and natural-language streams — C4 rules
    // destroy code, code filters starve prose, so the router runs
    // FIRST. Deterministic code-shaped suffixes are planted on every
    // 7th doc (the fixture is pure word salad) so both decision paths
    // discriminate; zero-shuffle column program, exact counts, ONE
    // division per ratio, RE2-compatible regexes the oracle replays
    // verbatim ⇒ fully oracled.
    "text_code_detect" -> QuerySpec(
      (s, d) => {
        val code = " def load(x): return x[0]; const y = {a: [1]};"
        val docs = t(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 7 === 0, lit(code)).otherwise(lit("")))
            .as("text"))
        val (nSym, nKw, symR, kwR, isCode) =
          graft.ops.TextOps.codeDetect(col("text"))
        docs.select(col("doc_id"), nSym.as("n_code_symbols"),
            nKw.as("n_keywords"), symR.as("symbol_ratio"),
            kwR.as("keyword_ratio"), isCode.as("is_code"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |    text || CASE WHEN doc_id % 7 = 0
             |      THEN ' def load(x): return x[0]; const y = {a: [1]};'
             |      ELSE '' END AS text
             |  FROM documents),
             |f AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '[{}();=\[\]]')) AS BIGINT)
             |      AS n_sym,
             |    CAST(len(regexp_extract_all(lower(text),
             |      '\b(def|return|import|class|void|const|function|var)\b'))
             |      AS BIGINT) AS n_kw,
             |    length(text) AS n_chars,
             |    len(list_filter(string_split(lower(text), ' '),
             |      x -> length(x) > 0)) AS n_words
             |  FROM docs),
             |r AS (
             |  SELECT doc_id, n_sym, n_kw,
             |    CASE WHEN n_chars > 0
             |      THEN CAST(n_sym AS DOUBLE) / CAST(n_chars AS DOUBLE)
             |      ELSE 0.0 END AS symbol_ratio,
             |    CASE WHEN n_words > 0
             |      THEN CAST(n_kw AS DOUBLE) / CAST(n_words AS DOUBLE)
             |      ELSE 0.0 END AS keyword_ratio
             |  FROM f)
             |SELECT doc_id, n_sym AS n_code_symbols, n_kw AS n_keywords,
             |  symbol_ratio, keyword_ratio,
             |  CAST((symbol_ratio >= 0.03 AND n_kw >= 1)
             |    OR symbol_ratio >= 0.08 AS INTEGER) AS is_code
             |FROM r ORDER BY doc_id""".stripMargin)),

    "text_quality_score" -> QuerySpec(
      (s, d) => TextOps.qualityFeatures(t(s, d, "documents"), "text")
        .select(col("doc_id"), col("n_tokens"), col("n_stop"),
          col("avg_token_len"), col("stop_ratio"), col("quality_score"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(list_filter(string_split(lower(text), ' '),
             |    t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS INTEGER) AS n_stop,
             |  CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE)
             |    / len(string_split(lower(text), ' ')) AS avg_token_len,
             |  CAST(len(list_filter(string_split(lower(text), ' '),
             |    t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
             |    / len(string_split(lower(text), ' ')) AS stop_ratio,
             |  least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 64.0, 1.0)
             |    * (1.0 - CAST(len(list_filter(string_split(lower(text), ' '),
             |        t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
             |        / len(string_split(lower(text), ' ')))
             |    * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
             |        / length(text)) AS quality_score
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Pairwise total-variation distance between per-source unigram
    // distributions (TextOps.sourceDivergence) — the lexical-similarity
    // matrix behind corpus-mixing decisions. TVD over KL deliberately:
    // the numerator Σ|c·M − d·N| is an exact integer (decimal
    // accumulator), the result ONE IEEE division — engine-exact, where
    // KL's ln() is the repo-pinned last-ulp libm hazard. topK=20 keeps
    // 20 of the fixture's 31 terms and exercises the __other lumping.
    "text_source_divergence" -> QuerySpec(
      (s, d) => TextOps.sourceDivergence(
        t(s, d, "documents"), "source", "text", topK = 20),
      Some("""WITH toks AS (
             |  SELECT source AS g,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks WHERE length(tok) > 0),
             |gstats AS (SELECT tok, count(*) AS gc FROM t GROUP BY tok),
             |kept AS (
             |  SELECT tok FROM (
             |    SELECT tok, ROW_NUMBER() OVER (ORDER BY gc DESC, tok) AS r
             |    FROM gstats) WHERE r <= 20),
             |mapped AS (
             |  SELECT g, CASE WHEN k.tok IS NOT NULL THEN t.tok
             |                 ELSE '__other' END AS term
             |  FROM t LEFT JOIN kept k ON k.tok = t.tok),
             |counts AS (SELECT g, term, count(*) AS c FROM mapped GROUP BY g, term),
             |totals AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY g),
             |gp AS (
             |  SELECT a.g AS ga, a.n AS na, b.g AS gb, b.n AS nb
             |  FROM totals a CROSS JOIN totals b WHERE a.g < b.g),
             |grid AS (
             |  SELECT gp.*, terms.term
             |  FROM gp CROSS JOIN (SELECT DISTINCT term FROM counts) terms),
             |j AS (
             |  SELECT grid.ga, grid.gb, grid.na, grid.nb, grid.term,
             |    COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
             |  FROM grid
             |  LEFT JOIN counts ca ON ca.g = grid.ga AND ca.term = grid.term
             |  LEFT JOIN counts cb ON cb.g = grid.gb AND cb.term = grid.term)
             |SELECT ga AS source_a, gb AS source_b, na AS n_a, nb AS n_b,
             |  CAST(SUM(abs(CAST(ca AS DECIMAL(19,0))*CAST(nb AS DECIMAL(19,0))
             |             - CAST(cb AS DECIMAL(19,0))*CAST(na AS DECIMAL(19,0)))) AS DOUBLE)
             |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 2.0) AS tvd
             |FROM j GROUP BY ga, gb, na, nb ORDER BY ga, gb""".stripMargin),
      allowBnlj = true),

    // PMI collocations (Church & Hanks 1990): pointwise mutual
    // information of top-term pairs from document-level co-occurrence
    // — the lexical-association miner behind phrase/topic diagnostics.
    // Candidate pairs bound to the global top-50 terms (the
    // sourceDivergence kept-set mechanism) and the self-join runs
    // CO-PARTITIONED on doc_id, so pairs are Σ k_d·(k_d−1)/2 with
    // k_d ≤ 50 — never vocabulary². PMI's log is quantized ONCE to
    // DECIMAL(12,6) over a fixed double ratio chain (the zipf
    // discipline) ⇒ fully oracled.
    "text_pmi_collocations" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val toks = docs.select(col("doc_id"),
            explode(TextOps.tokenize(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
        val kept = toks.groupBy(col("tok")).agg(count(lit(1)).as("_c"))
          .orderBy(col("_c").desc, col("tok")).limit(50).select(col("tok"))
        val inc = toks.join(broadcast(kept), "tok")
          .select(col("doc_id"), col("tok")).distinct()
        val nA = inc.groupBy(col("tok")).agg(count(lit(1)).as("_na"))
        val nDocs = docs.agg(count(lit(1)).as("_n"))
        val pairs = inc.as("l")
          .join(inc.as("r"), col("l.doc_id") === col("r.doc_id") &&
            col("l.tok") < col("r.tok"))
          .groupBy(col("l.tok").as("term_a"), col("r.tok").as("term_b"))
          .agg(count(lit(1)).as("n_ab"))
        val top = pairs
          .orderBy(col("n_ab").desc, col("term_a"), col("term_b")).limit(50)
        top
          .join(broadcast(nA.withColumnRenamed("tok", "term_a")
            .withColumnRenamed("_na", "n_a")), Seq("term_a"))
          .join(broadcast(nA.withColumnRenamed("tok", "term_b")
            .withColumnRenamed("_na", "n_b")), Seq("term_b"))
          .crossJoin(broadcast(nDocs))
          .select(col("term_a"), col("term_b"), col("n_ab"),
            col("n_a"), col("n_b"),
            log((col("n_ab").cast(DoubleType) * col("_n").cast(DoubleType)) /
              (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)))
              .cast(DecimalType(12, 6)).cast(DoubleType).as("pmi"))
          .orderBy(col("n_ab").desc, col("term_a"), col("term_b"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |tk AS (SELECT * FROM toks WHERE length(tok) > 0),
             |kept AS (
             |  SELECT tok FROM (
             |    SELECT tok, count(*) AS c,
             |      ROW_NUMBER() OVER (ORDER BY count(*) DESC, tok) AS r
             |    FROM tk GROUP BY tok) WHERE r <= 50),
             |inc AS (
             |  SELECT DISTINCT doc_id, tok FROM tk
             |  WHERE tok IN (SELECT tok FROM kept)),
             |na AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM inc GROUP BY 1),
             |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |pairs AS (
             |  SELECT l.tok AS term_a, r.tok AS term_b,
             |    CAST(count(*) AS BIGINT) AS n_ab
             |  FROM inc l JOIN inc r
             |    ON l.doc_id = r.doc_id AND l.tok < r.tok
             |  GROUP BY 1, 2),
             |top AS (
             |  SELECT * FROM pairs
             |  ORDER BY n_ab DESC, term_a, term_b LIMIT 50)
             |SELECT t.term_a, t.term_b, t.n_ab, a.n AS n_a, b.n AS n_b,
             |  CAST(CAST(ln((CAST(t.n_ab AS DOUBLE) * CAST(nd.n AS DOUBLE))
             |    / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)))
             |    AS DECIMAL(12,6)) AS DOUBLE) AS pmi
             |FROM top t
             |JOIN na a ON a.tok = t.term_a
             |JOIN na b ON b.tok = t.term_b
             |CROSS JOIN nd
             |ORDER BY n_ab DESC, term_a, term_b""".stripMargin),
      allowBnlj = true),

    // Dunning log-likelihood-ratio collocations (Dunning 1993) over
    // ADJACENT bigrams — the sparse-count-honest companion to
    // text_pmi_collocations' document-level PMI (PMI overrates rare
    // pairs; G² is the significance-weighted ranking production phrase
    // miners use). The 2×2 contingency per bigram (w1,w2) comes from
    // three exact count grains (bigram, first-position, second-
    // position) + the bigram total; G² = 2·Σ k·ln(k·N/(R·C)) over the
    // nonzero cells, each ln quantized ONCE to DECIMAL(12,6) (the PMI
    // discipline) and multiplied by the EXACT integer cell count in
    // decimal, so the 4-term sum is exact and order-free. Zero cells
    // contribute 0 by the x·ln(x)→0 limit — guarded explicitly (ln(0)
    // is -inf, not 0). Candidates bound to the top-40 bigrams by count.
    "text_collocations_llr" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val toks = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(filter(TextOps.tokenize(col("text")),
              x => length(x) > 0)).as(Seq("pos", "tok")))
        val bi = toks
          .withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
        val big = bi.groupBy(col("tok").as("term_a"), col("nxt").as("term_b"))
          .agg(count(lit(1)).as("n_ab"))
        val c1 = bi.groupBy(col("tok").as("term_a"))
          .agg(count(lit(1)).as("n_a"))
        val c2 = bi.groupBy(col("nxt").as("term_b"))
          .agg(count(lit(1)).as("n_b"))
        val nTot = bi.agg(count(lit(1)).as("n_total"))
        val top = big
          .orderBy(col("n_ab").desc, col("term_a"), col("term_b")).limit(40)
          .join(broadcast(c1), Seq("term_a"))
          .join(broadcast(c2), Seq("term_b"))
          .crossJoin(broadcast(nTot))
        def term(cell: Column, r: Column, cc: Column): Column =
          when(cell > 0L,
            cell.cast(DecimalType(19, 0)) *
              log((cell.cast(DoubleType) * col("n_total").cast(DoubleType)) /
                (r.cast(DoubleType) * cc.cast(DoubleType)))
                .cast(DecimalType(12, 6)))
            .otherwise(lit(0).cast(DecimalType(31, 6)))
        val k11 = col("n_ab")
        val k12 = col("n_a") - col("n_ab")
        val k21 = col("n_b") - col("n_ab")
        val k22 = col("n_total") - col("n_a") - col("n_b") + col("n_ab")
        val r1 = col("n_a"); val r2 = col("n_total") - col("n_a")
        val cc1 = col("n_b"); val cc2 = col("n_total") - col("n_b")
        top.select(col("term_a"), col("term_b"), col("n_ab"),
            col("n_a"), col("n_b"), col("n_total"),
            // x2 happens in DOUBLE after the exact decimal sum: doubling
            // is exact in IEEE (power of two), and a decimal x2 would
            // push DuckDB past its 38-digit multiplication width cap
            ((term(k11, r1, cc1) + term(k12, r1, cc2) +
              term(k21, r2, cc1) + term(k22, r2, cc2))
              .cast(DoubleType) * lit(2.0)).as("llr"))
          .orderBy(col("n_ab").desc, col("term_a"), col("term_b"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, tok, pos FROM (
             |    SELECT doc_id, unnest(list_filter(
             |        regexp_split_to_array(lower(text), '\s+'),
             |        x -> length(x) > 0)) AS tok,
             |      generate_subscripts(list_filter(
             |        regexp_split_to_array(lower(text), '\s+'),
             |        x -> length(x) > 0), 1) AS pos
             |    FROM documents)),
             |bi AS (
             |  SELECT tok AS a, lead(tok) OVER (PARTITION BY doc_id
             |    ORDER BY pos) AS b
             |  FROM toks QUALIFY b IS NOT NULL),
             |big AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
             |        FROM bi GROUP BY 1, 2),
             |c1 AS (SELECT a, CAST(count(*) AS BIGINT) AS n_a
             |       FROM bi GROUP BY 1),
             |c2 AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b
             |       FROM bi GROUP BY 1),
             |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bi),
             |top AS (
             |  SELECT * FROM big ORDER BY n_ab DESC, a, b LIMIT 40),
             |j AS (
             |  SELECT t.a, t.b, t.n_ab, c1.n_a, c2.n_b, nt.n AS n_total
             |  FROM top t JOIN c1 ON c1.a = t.a JOIN c2 ON c2.b = t.b
             |  CROSS JOIN nt),
             |cells AS (
             |  SELECT a, b, n_ab, n_a, n_b, n_total,
             |    n_ab AS k11, n_a - n_ab AS k12, n_b - n_ab AS k21,
             |    n_total - n_a - n_b + n_ab AS k22,
             |    n_a AS r1, n_total - n_a AS r2,
             |    n_b AS cc1, n_total - n_b AS cc2
             |  FROM j)
             |SELECT a AS term_a, b AS term_b, n_ab, n_a, n_b, n_total,
             |  CAST((
             |    (CASE WHEN k11 > 0 THEN CAST(k11 AS DECIMAL(19,0)) *
             |      CAST(ln((CAST(k11 AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |        (CAST(r1 AS DOUBLE) * CAST(cc1 AS DOUBLE)))
             |        AS DECIMAL(12,6))
             |      ELSE CAST(0 AS DECIMAL(31,6)) END) +
             |    (CASE WHEN k12 > 0 THEN CAST(k12 AS DECIMAL(19,0)) *
             |      CAST(ln((CAST(k12 AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |        (CAST(r1 AS DOUBLE) * CAST(cc2 AS DOUBLE)))
             |        AS DECIMAL(12,6))
             |      ELSE CAST(0 AS DECIMAL(31,6)) END) +
             |    (CASE WHEN k21 > 0 THEN CAST(k21 AS DECIMAL(19,0)) *
             |      CAST(ln((CAST(k21 AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |        (CAST(r2 AS DOUBLE) * CAST(cc1 AS DOUBLE)))
             |        AS DECIMAL(12,6))
             |      ELSE CAST(0 AS DECIMAL(31,6)) END) +
             |    (CASE WHEN k22 > 0 THEN CAST(k22 AS DECIMAL(19,0)) *
             |      CAST(ln((CAST(k22 AS DOUBLE) * CAST(n_total AS DOUBLE)) /
             |        (CAST(r2 AS DOUBLE) * CAST(cc2 AS DOUBLE)))
             |        AS DECIMAL(12,6))
             |      ELSE CAST(0 AS DECIMAL(31,6)) END)
             |  ) AS DOUBLE) * 2.0 AS llr
             |FROM cells ORDER BY n_ab DESC, term_a, term_b""".stripMargin),
      allowBnlj = true),

    // Zipf-law fit of the token frequency head (TextOps.zipfSlope):
    // OLS slope of ln(freq) on ln(rank) over the top-200 terms — the
    // distribution-shape tripwire (natural ≈ −1; the synthetic
    // template fixture measures −0.18, exactly the flat head the
    // diagnostic exists to flag). Each ln quantized ONCE to the 1e-6
    // integer grid, normal equations in exact integers/decimals, one
    // final IEEE division ⇒ fully oracled.
    "text_zipf_slope" -> QuerySpec(
      (s, d) => TextOps.zipfSlope(t(s, d, "documents"), "text", topK = 200),
      Some("""WITH toks AS (
             |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |counts AS (
             |  SELECT tok, count(*) AS c FROM toks
             |  WHERE length(tok) > 0 GROUP BY 1),
             |top AS (
             |  SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
             |  FROM counts QUALIFY r <= 200),
             |q AS (SELECT
             |    CAST(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(12,6)) * 1000000
             |      AS BIGINT) AS x,
             |    CAST(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(12,6)) * 1000000
             |      AS BIGINT) AS y
             |  FROM top),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x*y) AS BIGINT) AS sxy,
             |    CAST(SUM(x*x) AS BIGINT) AS sxx FROM q),
             |f AS (SELECT k, sx, sy,
             |    CAST(CAST(k AS DECIMAL(4,0)) * CAST(sxy AS DECIMAL(18,0))
             |       - CAST(sx AS DECIMAL(18,0)) * CAST(sy AS DECIMAL(18,0))
             |      AS DOUBLE)
             |    / CAST(CAST(k AS DECIMAL(4,0)) * CAST(sxx AS DECIMAL(18,0))
             |       - CAST(sx AS DECIMAL(18,0)) * CAST(sx AS DECIMAL(18,0))
             |      AS DOUBLE) AS slope
             |  FROM s)
             |SELECT k AS n_terms, slope,
             |  (CAST(sy AS DOUBLE) / 1000000.0
             |    - slope * (CAST(sx AS DOUBLE) / 1000000.0))
             |    / CAST(k AS DOUBLE) AS intercept
             |FROM f""".stripMargin)),

    // Vocabulary-growth (Heaps-law) curve + type/token ratio
    // (TextOps.vocabGrowth): token count, distinct-term count and TTR at
    // 25/50/75/100% corpus prefixes — the lexical-diversity saturation
    // diagnostic behind corpus-mixing decisions. One token-stream pass:
    // per-term min(id) marks first appearance, prefixes are conditional
    // counts. Exact integers + one IEEE division ⇒ fully oracled.
    "text_vocab_growth" -> QuerySpec(
      (s, d) => TextOps.vocabGrowth(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
             |toks AS (
             |  SELECT doc_id AS id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks WHERE length(tok) > 0),
             |terms AS (SELECT tok, min(id) AS first_id FROM t GROUP BY tok),
             |fr AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 1.0]) AS DOUBLE) AS frac),
             |rws AS (
             |  SELECT f.frac,
             |    CAST(floor(n.n * f.frac) AS BIGINT) AS prefix_docs
             |  FROM fr f CROSS JOIN n),
             |tcnt AS (
             |  SELECT r.frac, r.prefix_docs,
             |    CAST(SUM(CASE WHEN t.id < r.prefix_docs THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_tokens
             |  FROM rws r CROSS JOIN t GROUP BY r.frac, r.prefix_docs),
             |dcnt AS (
             |  SELECT r.frac,
             |    CAST(SUM(CASE WHEN te.first_id < r.prefix_docs THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_distinct
             |  FROM rws r CROSS JOIN terms te GROUP BY r.frac)
             |SELECT c.frac, c.prefix_docs, c.n_tokens, d.n_distinct,
             |  CAST(d.n_distinct AS DOUBLE) / c.n_tokens AS type_token_ratio
             |FROM tcnt c JOIN dcnt d ON d.frac = c.frac
             |ORDER BY c.frac""".stripMargin),
      allowBnlj = true),

    "text_token_count" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("source"),
          size(TextOps.tokenize(col("text"))).as("n_ws"),
          size(TextOps.bpeishTokens(col("text"))).as("n_bpe"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_ws")).as("sum_ws"), sum(col("n_bpe")).as("sum_bpe"))
        .orderBy(col("source")),
      Some("""SELECT source, count(*) AS cnt,
             |  CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS sum_ws,
             |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS sum_bpe
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // TRAINED subword (BPE) token counting: deterministic merges learned
    // from the corpus word-frequency table (BpeOps.bpeFit, memoized per
    // dataset like the IVF model — tokenizer training is the offline
    // half), replayed as one broadcast word→pieces expression, corpus
    // encoded by a join (no per-token UDF, no iteration at encode time).
    // The contract stats ride in-query (per-doc subword counts bounded
    // by [word count, char count], pieces concatenate back to their
    // word, the 24 learned merges strictly compress) AND the whole key
    // is ORACLED via the STAGED word→pieces encoder table (upgraded
    // from rows-only in round 7, the text_pack_bins_bpe pattern):
    // DuckDB independently recomputes tokenization, per-doc totals, the
    // bound violations, the roundtrip check over the staged pieces
    // arrays, and the compression flag. The merge REPLAY itself is
    // additionally pinned by BpeSpec's hand-computed merges.
    "text_token_count_bpe" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = bpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.bpeFit(docs, "text", numMerges = 24, minCount = 5))
        val pieces = BpeOps.wordPieces(docs, "text", merges)
        staged(d, "bpe_pieces") { dir =>
          pieces.select(col("word"), col("pieces"), col("n_pieces"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val enc = BpeOps.bpeEncode(docs, "doc_id", "text", pieces)
        val chars = docs.select(col("doc_id"),
          length(regexp_replace(lower(col("text")), "\\s+", ""))
            .cast(LongType).as("n_chars"))
        val roundtrip = pieces.agg(
          sum(when(concat_ws("", col("pieces")) =!= col("word"), 1L)
            .otherwise(0L)).as("n_roundtrip_bad"))
        enc.join(chars, Seq("doc_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("total_words"),
            sum(col("n_bpe_tokens")).as("total_bpe"),
            sum(col("n_chars")).as("total_chars"),
            sum(when(col("n_bpe_tokens") < col("n_words") ||
              col("n_bpe_tokens") > col("n_chars"), 1L).otherwise(0L))
              .as("n_bound_violations"))
          .crossJoin(broadcast(roundtrip))
          .withColumn("ok_bounds",
            (col("n_bound_violations") === 0).cast(IntegerType))
          .withColumn("ok_roundtrip",
            (col("n_roundtrip_bad") === 0).cast(IntegerType))
          .withColumn("ok_compressed",
            (col("total_bpe") < col("total_chars") &&
              col("total_bpe") > col("total_words")).cast(IntegerType))
      },
      Some("""WITH pieces AS (
             |  SELECT word, pieces, n_pieces FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/bpe_pieces/*.parquet')),
             |toks AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
             |  FROM documents),
             |enc AS (
             |  SELECT t.doc_id, count(*) AS n_words,
             |    SUM(COALESCE(p.n_pieces, length(t.word))) AS n_bpe_tokens
             |  FROM toks t LEFT JOIN pieces p USING (word)
             |  WHERE length(t.word) > 0 GROUP BY t.doc_id),
             |chars AS (
             |  SELECT doc_id,
             |    length(regexp_replace(lower(text), '\s+', '', 'g')) AS n_chars
             |  FROM documents),
             |agg AS (
             |  SELECT count(*) AS n_docs,
             |    CAST(SUM(n_words) AS BIGINT) AS total_words,
             |    CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe,
             |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |    CAST(SUM(CASE WHEN n_bpe_tokens < n_words OR n_bpe_tokens > n_chars
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_bound_violations
             |  FROM enc JOIN chars USING (doc_id)),
             |rt AS (
             |  SELECT CAST(SUM(CASE WHEN array_to_string(pieces, '') <> word
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_bad
             |  FROM pieces)
             |SELECT n_docs, total_words, total_bpe, total_chars,
             |  n_bound_violations, n_roundtrip_bad,
             |  CAST(n_bound_violations = 0 AS INTEGER) AS ok_bounds,
             |  CAST(n_roundtrip_bad = 0 AS INTEGER) AS ok_roundtrip,
             |  CAST(total_bpe < total_chars AND total_bpe > total_words
             |    AS INTEGER) AS ok_compressed
             |FROM agg CROSS JOIN rt""".stripMargin),
      allowBnlj = true),

    // Repetition ratio (most-frequent-bigram share) — grams projected
    // separately from the counting pass (HOF re-evaluation trap).
    "text_repetition" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextOps.ngrams(col("text"), 2).as("_g"))
        .select(col("doc_id"),
          TextOps.repetitionRatioFromGrams(col("_g")).as("rep_ratio"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(list_max(list_transform(g, x -> len(list_filter(g, y -> y = x)))) AS DOUBLE)
             |    / len(g) AS rep_ratio
             |FROM (
             |  SELECT doc_id,
             |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS g
             |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    // Pre-hash normalization (NFKC → lower → whitespace collapse). The
    // corpus is ASCII so the oracle checks the lower/collapse/trim
    // plumbing; the Unicode semantics (composed≡decomposed, full-width,
    // ligatures, NBSP) are pinned by ExpressionSpec units. Deterministic
    // messiness is injected on both sides so collapse/trim do real work.
    "text_normalize" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextOps.normalizeForDedup(s, concat(
            lit("  "), substring(col("text"), 1, 50),
            lit("   MIXED Case\ttail  "))).as("norm"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(
             |    lower(nfc_normalize('  ' || substr(text, 1, 50)
             |      || '   MIXED Case' || chr(9) || 'tail  ')),
             |    '\s+', ' ', 'g')) AS norm
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // PII-style scrub: mask emails + long digit runs (regexp_replace
    // chain). The synthetic text has neither, so deterministic PII-shaped
    // suffixes are appended first on both sides.
    "text_scrub" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextOps.scrub(concat(
            substring(col("text"), 1, 40),
            lit(" contact user"), col("doc_id").cast(StringType),
            lit("@example.com id "),
            (col("doc_id") + lit(12345678L)).cast(StringType))).as("scrubbed"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  regexp_replace(
             |    regexp_replace(
             |      substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
             |        || '@example.com id ' || CAST(doc_id + 12345678 AS VARCHAR),
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
             |    '\d{4,}', '<NUM>', 'g') AS scrubbed
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // md5 content fingerprint (engine-portable); the xxhash64 rolling-hash
    // variant is Spark-only and unit-tested.
    "text_fingerprint" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextOps.fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id")),

    // Stopword-profile language ID with fixed-priority argmax.
    "text_lang_id" -> QuerySpec(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("pred_lang"))
        .orderBy(col("doc_id")),
      Some("""WITH scores AS (
             |  SELECT doc_id,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('the','and','of','to','is','that','you','with'))) AS s_en,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('der','die','das','und','ist','nicht','ich','mit'))) AS s_de,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los','las','es','y','que','por'))) AS s_es,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','des','est','et','que','je','pas'))) AS s_fr,
             |    len(list_filter(string_split(lower(text),' '), t -> t IN ('的','是','了','在','我','不','这','有'))) AS s_zh
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
             |       WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
             |       WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
             |       WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
             |       WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
             |       WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'zh'
             |       ELSE 'und' END AS pred_lang
             |FROM scores ORDER BY doc_id""".stripMargin)),

    // Language-ID confusion matrix: the heuristic classifier above
    // evaluated against the table's own lang labels — per
    // (actual, predicted) counts plus per-actual recall, the standard
    // eval grid a filtering pipeline reports before trusting a
    // classifier gate. Exact counts, ONE IEEE division per row (count
    // over a broadcast per-actual total) ⇒ fully oracled. Output is
    // labels² model-sized.
    "text_lang_confusion" -> QuerySpec(
      (s, d) => {
        val preds = t(s, d, "documents")
          .select(col("lang").as("actual"),
            TextOps.langId(col("text")).as("predicted"))
        val cells = preds.groupBy(col("actual"), col("predicted"))
          .agg(count(lit(1)).as("n"))
        val totals = preds.groupBy(col("actual"))
          .agg(count(lit(1)).as("n_actual"))
        cells.join(broadcast(totals), Seq("actual"))
          .select(col("actual"), col("predicted"), col("n"), col("n_actual"),
            (col("n").cast(DoubleType) / col("n_actual").cast(DoubleType))
              .as("frac"))
          .orderBy(col("actual"), col("predicted"))
      },
      Some("""WITH preds AS (
             |  SELECT lang AS actual,
             |    CASE WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
             |         WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
             |         WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
             |         WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
             |         WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
             |         WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'zh'
             |         ELSE 'und' END AS predicted
             |  FROM (
             |    SELECT lang,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('the','and','of','to','is','that','you','with'))) AS s_en,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('der','die','das','und','ist','nicht','ich','mit'))) AS s_de,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los','las','es','y','que','por'))) AS s_es,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','des','est','et','que','je','pas'))) AS s_fr,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('的','是','了','在','我','不','这','有'))) AS s_zh
             |    FROM documents)),
             |cells AS (SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
             |          FROM preds GROUP BY 1, 2),
             |tot AS (SELECT actual, CAST(count(*) AS BIGINT) AS n_actual
             |        FROM preds GROUP BY 1)
             |SELECT actual, predicted, n, n_actual,
             |  CAST(n AS DOUBLE) / CAST(n_actual AS DOUBLE) AS frac
             |FROM cells JOIN tot USING (actual)
             |ORDER BY actual, predicted""".stripMargin)),

    // Frozen-MODEL language ID roundtrip (round 15): the staged-artifact
    // serve path the heuristic tier lacked — a hashed char-trigram
    // multinomial NB (LangIdOps) fit on the EVEN doc_ids, staged as
    // parquet, reloaded, and scored over the held-out ODD split, with
    // the heuristic langId evaluated on the SAME split so the key
    // reports the measured per-language recall DELTA (model − heuristic)
    // — a classifier upgrade must show its evidence. Determinism: the
    // portable 31-polynomial code-point hash over character-based
    // trigram substrings, log-probs quantized ONCE to DECIMAL(20,6) at
    // fit time, scores ORDER-FREE exact decimal sums, argmax ties by
    // the fixed language priority. The oracle re-derives EVERYTHING
    // from raw text — fit counts, full-grid smoothing floors, priors,
    // scoring, argmax, both confusions — so the staged model is
    // refuted, not assumed. Docs under 3 chars have no trigram
    // evidence and are excluded on both sides (none exist at the
    // fixture; the condition makes totality explicit).
    "text_lang_id_model_roundtrip" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val modelDir = staged(d, "langid_model") { dir =>
          LangIdOps.fit(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
              "text", "lang")
            .write.mode("overwrite").parquet(dir)
        }
        val model = s.read.parquet(modelDir)
        val held = docs.filter(pmod(col("doc_id"), lit(2)) === 1 &&
          length(lower(col("text"))) >= 3)
        val preds = LangIdOps.predictWith(
          LangIdOps.docTrigramCounts(held, "doc_id", "text"), "doc_id", model)
        val both = held
          .select(col("doc_id"), col("lang").as("actual"),
            TextOps.langId(col("text")).as("heur_pred"))
          .join(preds, Seq("doc_id"))
        val perLang = both.groupBy(col("actual"))
          .agg(count(lit(1)).as("n_actual"),
            sum(when(col("pred_lang") === col("actual"), 1L).otherwise(0L))
              .as("n_model_ok"),
            sum(when(col("heur_pred") === col("actual"), 1L).otherwise(0L))
              .as("n_heur_ok"))
        val overall = both
          .agg(count(lit(1)).as("n_actual"),
            sum(when(col("pred_lang") === col("actual"), 1L).otherwise(0L))
              .as("n_model_ok"),
            sum(when(col("heur_pred") === col("actual"), 1L).otherwise(0L))
              .as("n_heur_ok"))
          .select(lit("ALL").as("actual"), col("n_actual"),
            col("n_model_ok"), col("n_heur_ok"))
        perLang.unionByName(overall)
          .select(col("actual"), col("n_actual"), col("n_model_ok"),
            (col("n_model_ok").cast(DoubleType) /
              col("n_actual").cast(DoubleType)).as("model_recall"),
            col("n_heur_ok"),
            (col("n_heur_ok").cast(DoubleType) /
              col("n_actual").cast(DoubleType)).as("heur_recall"),
            ((col("n_model_ok").cast(DoubleType) /
               col("n_actual").cast(DoubleType)) -
             (col("n_heur_ok").cast(DoubleType) /
               col("n_actual").cast(DoubleType))).as("recall_delta"))
          .orderBy(col("actual"))
      },
      Some("""WITH train AS (
             |  SELECT doc_id, lang, lower(text) AS low FROM documents
             |  WHERE doc_id % 2 = 0),
             |held AS (
             |  SELECT doc_id, lang, lower(text) AS low, text FROM documents
             |  WHERE doc_id % 2 = 1 AND length(lower(text)) >= 3),
             |ttri AS (
             |  SELECT lang, CAST(unnest(list_transform(
             |    range(1, length(low) - 1),
             |    i -> list_reduce(list_prepend(CAST(11 AS BIGINT),
             |           list_transform(
             |             regexp_split_to_array(
             |               substr(low, CAST(i AS INTEGER), 3), ''),
             |             c -> CAST(ord(c) AS BIGINT))),
             |           (a, c) -> (a * 31 + c) % 2147483647) % 512))
             |    AS INTEGER) AS bucket
             |  FROM train),
             |tcnt AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS cnt
             |         FROM ttri GROUP BY 1, 2),
             |ttot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot
             |         FROM tcnt GROUP BY 1),
             |grid AS (SELECT t.lang, CAST(unnest(range(512)) AS INTEGER)
             |           AS bucket, t.tot FROM ttot t),
             |lp AS (
             |  SELECT g.lang, g.bucket,
             |    CAST(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
             |            CAST(g.tot + 512 AS DOUBLE)) AS DECIMAL(20,6)) AS lp
             |  FROM grid g
             |  LEFT JOIN tcnt c ON c.lang = g.lang AND c.bucket = g.bucket),
             |nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS ndl
             |       FROM train GROUP BY 1),
             |pri AS (
             |  SELECT lang, CAST(ln(CAST(ndl AS DOUBLE) /
             |    CAST((SELECT sum(ndl) FROM nd) AS DOUBLE))
             |    AS DECIMAL(20,6)) AS prior
             |  FROM nd),
             |htri AS (
             |  SELECT doc_id, CAST(unnest(list_transform(
             |    range(1, length(low) - 1),
             |    i -> list_reduce(list_prepend(CAST(11 AS BIGINT),
             |           list_transform(
             |             regexp_split_to_array(
             |               substr(low, CAST(i AS INTEGER), 3), ''),
             |             c -> CAST(ord(c) AS BIGINT))),
             |           (a, c) -> (a * 31 + c) % 2147483647) % 512))
             |    AS INTEGER) AS bucket
             |  FROM held),
             |hcnt AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
             |         FROM htri GROUP BY 1, 2),
             |sc AS (
             |  SELECT h.doc_id, l.lang,
             |    CAST(SUM(CAST(h.tf AS DECIMAL(10,0)) * l.lp)
             |      AS DECIMAL(38,6)) AS s
             |  FROM hcnt h JOIN lp l ON l.bucket = h.bucket
             |  GROUP BY 1, 2),
             |tsc AS (
             |  SELECT sc.doc_id, sc.lang,
             |    CAST(sc.s + pri.prior AS DECIMAL(38,6)) AS score
             |  FROM sc JOIN pri USING (lang)),
             |pred AS (
             |  SELECT doc_id, lang AS pred_lang FROM (
             |    SELECT doc_id, lang, row_number() OVER (
             |      PARTITION BY doc_id ORDER BY score DESC,
             |      CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1
             |        WHEN 'es' THEN 2 WHEN 'fr' THEN 3 WHEN 'zh' THEN 4
             |        ELSE 5 END) AS rn
             |    FROM tsc) WHERE rn = 1),
             |heur AS (
             |  SELECT doc_id,
             |    CASE WHEN greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'und'
             |         WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
             |         WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
             |         WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
             |         WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
             |         WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) THEN 'zh'
             |         ELSE 'und' END AS heur_pred
             |  FROM (
             |    SELECT doc_id,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('the','and','of','to','is','that','you','with'))) AS s_en,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('der','die','das','und','ist','nicht','ich','mit'))) AS s_de,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los','las','es','y','que','por'))) AS s_es,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','des','est','et','que','je','pas'))) AS s_fr,
             |      len(list_filter(string_split(lower(text),' '), t -> t IN ('的','是','了','在','我','不','这','有'))) AS s_zh
             |    FROM held)),
             |j AS (
             |  SELECT h.lang AS actual, p.pred_lang, e.heur_pred
             |  FROM held h
             |  JOIN pred p USING (doc_id)
             |  JOIN heur e USING (doc_id)),
             |per AS (
             |  SELECT actual, CAST(count(*) AS BIGINT) AS n_actual,
             |    CAST(sum(CASE WHEN pred_lang = actual THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_model_ok,
             |    CAST(sum(CASE WHEN heur_pred = actual THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_heur_ok
             |  FROM j GROUP BY 1
             |  UNION ALL
             |  SELECT 'ALL', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN pred_lang = actual THEN 1 ELSE 0 END)
             |      AS BIGINT),
             |    CAST(sum(CASE WHEN heur_pred = actual THEN 1 ELSE 0 END)
             |      AS BIGINT)
             |  FROM j)
             |SELECT actual, n_actual, n_model_ok,
             |  CAST(n_model_ok AS DOUBLE) / CAST(n_actual AS DOUBLE)
             |    AS model_recall,
             |  n_heur_ok,
             |  CAST(n_heur_ok AS DOUBLE) / CAST(n_actual AS DOUBLE)
             |    AS heur_recall,
             |  (CAST(n_model_ok AS DOUBLE) / CAST(n_actual AS DOUBLE)) -
             |  (CAST(n_heur_ok AS DOUBLE) / CAST(n_actual AS DOUBLE))
             |    AS recall_delta
             |FROM per ORDER BY actual""".stripMargin)),

    // Gaps-and-islands (runs of consecutive active days per user): the
    // classic streak operator — island anchor = day − row_number days,
    // one window + one grain aggregation, pure calendar-integer
    // arithmetic ⇒ fully oracled. The window partitions per user (the
    // per-actor contract every event key here uses), so no
    // single-partition hazard at scale.
    "win_gap_islands" -> QuerySpec(
      (s, d) => {
        val days = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        days
          .withColumn("_anchor", date_sub(col("day"), row_number().over(w)))
          .groupBy(col("user_id"), col("_anchor"))
          .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
            count(lit(1)).as("n_days"))
          .select(col("user_id"), col("start_day"), col("end_day"),
            col("n_days"))
          .orderBy(col("user_id"), col("start_day"))
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |anch AS (
             |  SELECT user_id, day,
             |    day - CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY day) AS INTEGER) AS anchor
             |  FROM days)
             |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
             |  CAST(count(*) AS BIGINT) AS n_days
             |FROM anch GROUP BY user_id, anchor
             |ORDER BY user_id, start_day""".stripMargin)),

    // Model-based language classification — the supervised tier next to
    // the heuristic stopword scorer above: multinomial Naive Bayes fit
    // on the labeled corpus (ClassifyOps.nbFit), argmax-scored against
    // the frozen model (nbClassifyWith). Hash-exact because every
    // statistic is quantized DECIMAL(20,6) at fit time and never
    // rounded again (the scale choice and its measured failure modes
    // are documented on ClassifyOps): DuckDB independently rebuilds
    // per-class token log-probs, smoothing mass, priors, the per-doc
    // exact-decimal score sums, and the (score DESC, label ASC)
    // argmax. `correct` compares against the table's own lang label.
    "text_nb_lang_classify" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = ClassifyOps.nbFit(docs, "text", "lang", smoothing = 0.5)
        ClassifyOps.nbClassifyWith(docs, "doc_id", "text", model)
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id"), col("pred_label").as("pred_lang"),
            col("n_tokens"),
            col("neg_ll"),
            (col("pred_label") === col("lang")).cast(IntegerType).as("correct"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id, lang,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |ct AS (SELECT lang AS label, tok, count(*) AS cnt
             |       FROM t GROUP BY 1, 2),
             |tot AS (SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM t),
             |lp AS (
             |  SELECT label, tok,
             |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
             |  FROM ct JOIN tot USING (label) CROSS JOIN v),
             |dflt AS (
             |  SELECT label,
             |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
             |  FROM tot CROSS JOIN v),
             |prior AS (
             |  SELECT lang AS label,
             |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE)
             |                        FROM documents)) AS DECIMAL(20,6)) AS prior
             |  FROM documents GROUP BY 1),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, c.label, p.prior,
             |    sum(dt.cnt) AS n_tok,
             |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
             |  FROM dt
             |  CROSS JOIN (SELECT label FROM tot) c
             |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
             |  JOIN dflt f ON f.label = c.label
             |  JOIN prior p ON p.label = c.label
             |  GROUP BY dt.doc_id, c.label, p.prior),
             |ranked AS (
             |  SELECT doc_id, label, prior + ll AS score, n_tok,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY prior + ll DESC, label ASC) AS rn
             |  FROM scored)
             |SELECT r.doc_id, r.label AS pred_lang,
             |  CAST(r.n_tok AS BIGINT) AS n_tokens,
             |  CAST(-r.score AS DOUBLE) AS neg_ll,
             |  CAST(r.label = d.lang AS INTEGER) AS correct
             |FROM ranked r JOIN documents d USING (doc_id)
             |WHERE r.rn = 1 ORDER BY r.doc_id""".stripMargin),
      allowBnlj = true),

    // Classifier distillation of a rule-based quality filter — the
    // CCNet-style model-based quality tier: derive keep/drop labels
    // from the c4 rule ladder (text_c4_filter's fixture build), fit
    // the NB model on the SAME text the rules judged, and classify —
    // the model learns the rules' signal (the planted 'lorem ipsum'
    // and '{' tokens become strong class features) and `agrees`
    // records per-doc fidelity, hash-verified. Same decimal discipline
    // as text_nb_lang_classify.
    "text_nb_quality_distill" -> QuerySpec(
      (s, d) => {
        val toksB = split(col("text"), " ")
        val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toksB, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        val labeled = TextOps.c4QualityFlags(built, "text")
          .select(col("doc_id"),
            when(col("keep") === 1, lit("keep")).otherwise(lit("drop"))
              .as("rule_label"))
          .join(built, Seq("doc_id"))
        // the SAME quality-label NB fit recal_scores memoizes
        // (nbCalibModel) — identical input rows ⇒ identical model; the
        // r14 memoization move, extended to this key's fit (measured
        // 3.1 → ~1.5 s in-sweep; the oracle still re-derives the fit
        // from raw text)
        val model = nbCalibModel(s, d,
          ClassifyOps.nbFit(labeled, "text", "rule_label"))
        ClassifyOps.nbClassifyWith(built, "doc_id", "text", model)
          .join(labeled.select(col("doc_id"), col("rule_label")), Seq("doc_id"))
          .select(col("doc_id"), col("pred_label"), col("n_tokens"),
            col("neg_ll"),
            (col("pred_label") === col("rule_label")).cast(IntegerType)
              .as("agrees"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |lab AS (
             |  SELECT doc_id, text,
             |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
             |              AND NOT contains(text, '{')
             |              AND len(list_filter(string_split(text, chr(10)),
             |                l -> regexp_matches(trim(l), '[.!?"]$')
             |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
             |                  >= 3
             |         THEN 'keep' ELSE 'drop' END AS label
             |  FROM built),
             |toks0 AS (
             |  SELECT doc_id, label,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM lab),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |ct AS (SELECT label, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |tot AS (SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM t),
             |lp AS (
             |  SELECT label, tok,
             |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
             |  FROM ct JOIN tot USING (label) CROSS JOIN v),
             |dflt AS (
             |  SELECT label,
             |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
             |  FROM tot CROSS JOIN v),
             |prior AS (
             |  SELECT label,
             |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lab))
             |      AS DECIMAL(20,6)) AS prior
             |  FROM lab GROUP BY 1),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, c.label, p.prior,
             |    sum(dt.cnt) AS n_tok,
             |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
             |  FROM dt
             |  CROSS JOIN (SELECT label FROM tot) c
             |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
             |  JOIN dflt f ON f.label = c.label
             |  JOIN prior p ON p.label = c.label
             |  GROUP BY dt.doc_id, c.label, p.prior),
             |ranked AS (
             |  SELECT doc_id, label, prior + ll AS score, n_tok,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY prior + ll DESC, label ASC) AS rn
             |  FROM scored)
             |SELECT r.doc_id, r.label AS pred_label,
             |  CAST(r.n_tok AS BIGINT) AS n_tokens,
             |  CAST(-r.score AS DOUBLE) AS neg_ll,
             |  CAST(r.label = b.label AS INTEGER) AS agrees
             |FROM ranked r JOIN lab b USING (doc_id)
             |WHERE r.rn = 1 ORDER BY r.doc_id""".stripMargin),
      allowBnlj = true),

    // NB MODEL ARTIFACT roundtrip (round 11, the bm25_model_roundtrip
    // pattern): fit a language classifier on the documents table's own
    // lang labels, PERSIST the model (exact-decimal log-likelihoods) as
    // parquet, and classify through the RELOADED artifact — zero fit
    // jobs in the query plan (the reload is a leaf scan;
    // materializeUnlessLeaf is a no-op on it). DuckDB scores through
    // the SAME staged model: per-doc Σ cnt·lp_eff in exact decimals,
    // argmax (score DESC, label ASC).
    "text_nb_model_roundtrip" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val dir = staged(d, "nb_lang_model") { dir =>
          ClassifyOps.nbFit(docs, "text", "lang")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val model = s.read.parquet(dir)
        ClassifyOps.nbClassifyWith(docs, "doc_id", "text", model)
          .orderBy(col("doc_id"))
      },
      Some("""WITH model AS (
             |  SELECT _label, _tok, _lp, _prior FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/nb_lang_model/*.parquet')),
             |tok_rows AS (
             |  SELECT _label AS label, _tok AS tok, _lp AS lp FROM model
             |  WHERE _tok IS NOT NULL),
             |class_rows AS (
             |  SELECT _label AS label, _lp AS dlp, _prior AS prior FROM model
             |  WHERE _tok IS NULL),
             |toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |sc AS (
             |  SELECT dt.doc_id, c.label, c.prior,
             |    CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             |    SUM(CAST(cnt AS DECIMAL(10,0)) * COALESCE(tr.lp, c.dlp)) AS ll
             |  FROM dt CROSS JOIN class_rows c
             |  LEFT JOIN tok_rows tr ON tr.tok = dt.tok AND tr.label = c.label
             |  GROUP BY dt.doc_id, c.label, c.prior),
             |best AS (
             |  SELECT doc_id, label, n_tokens, prior + ll AS score,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY (prior + ll) DESC, label) AS rn
             |  FROM sc)
             |SELECT doc_id, label AS pred_label, n_tokens,
             |  CAST(-score AS DOUBLE) AS neg_ll
             |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      allowBnlj = true),

    // Per-document top term by corpus rarity: score = tf × N/df — a
    // monotone transform of tf·idf (N/df is what ln compresses), kept as
    // an exact integer ratio so the hash is engine-exact (ln(x) can
    // differ in the last ulp across libm implementations). The doc count
    // rides along as a broadcast scalar — no driver-side count.
    "text_tfidf_top_term" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val toks = docs
          .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
          .filter(length(col("term")) > 0)
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        // df = #docs containing term = #tf rows per term — derived from tf
        // instead of a second explode+distinct over the corpus. Both join
        // branches now share the identical explode+aggregate subtree, so
        // the (doc_id, term) shuffle is computed once and ReusedExchange
        // feeds the second branch.
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
        tf.join(dfreq, Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("score",
            (col("tf") * col("n_docs").cast(DoubleType)) / col("df"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("term").as("top_term"), col("score"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents),
             |tok2 AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
             |dfreq AS (
             |  SELECT term, count(*) AS df
             |  FROM (SELECT DISTINCT doc_id, term FROM tok2) GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, tf.term AS term,
             |    (tf * CAST(n_docs AS DOUBLE)) / df AS score,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY (tf * CAST(n_docs AS DOUBLE)) / df DESC, tf.term) AS rn
             |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
             |SELECT doc_id, term AS top_term, score
             |FROM scored WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      allowBnlj = true),

    // BM25 keyword retrieval against a FROZEN corpus-statistics model
    // (SearchOps.bm25Fit/bm25TopK) — the targeted-corpus-slicing tier:
    // "give me the top docs about X". The corpus side is a ZERO-SHUFFLE
    // column program (per-doc tf/dl as array expressions, the ≤|query|
    // model rows pivoted into ONE broadcast row, top-k via
    // TakeOrderedAndProject); hash-exact because IDF is quantized
    // DECIMAL(20,6) once at fit, and the score is the RAW double of a
    // fixed IEEE op sequence over exact inputs that the oracle restates
    // verbatim — including the left-associated per-term sum (w0+w1)+w2.
    // Re-rounding the score would GUARANTEE mismatches, not risk them:
    // BM25 ratios are often terminating rationals that land exactly on
    // the decimal grid's half-boundaries, where Spark's and DuckDB's
    // round() provably differ (measured on the SearchOpsSpec fixture;
    // rationale on SearchOps).
    "search_bm25_topk" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = SearchOps.bm25Fit(docs, "doc_id", "text")
        SearchOps.bm25TopK(docs, "doc_id", "text", model,
          Seq("dup", "hash", "join"), k = 20)
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
             |stats AS (SELECT count(DISTINCT doc_id) AS n,
             |                 CAST(sum(tf) AS BIGINT) AS tot FROM dt),
             |dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
             |idf AS (
             |  SELECT tok, CAST(ln(CAST(1.0 AS DOUBLE) +
             |      ((n - df) + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
             |    AS DECIMAL(20,6)) AS idf
             |  FROM dfc CROSS JOIN stats),
             |piv AS (
             |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl,
             |    CAST(sum(CASE WHEN tok = 'dup'  THEN tf ELSE 0 END) AS BIGINT) AS tf0,
             |    CAST(sum(CASE WHEN tok = 'hash' THEN tf ELSE 0 END) AS BIGINT) AS tf1,
             |    CAST(sum(CASE WHEN tok = 'join' THEN tf ELSE 0 END) AS BIGINT) AS tf2
             |  FROM dt GROUP BY 1),
             |sc AS (
             |  SELECT piv.doc_id, piv.dl,
             |    ((CASE WHEN tf0 > 0 THEN CAST(i0.idf AS DOUBLE) *
             |        ((tf0 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |         (tf0 + CAST(1.2 AS DOUBLE) *
             |          ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |           ((CAST(0.75 AS DOUBLE) * piv.dl) * stats.n) / stats.tot)))
             |      ELSE CAST(0.0 AS DOUBLE) END
             |    + CASE WHEN tf1 > 0 THEN CAST(i1.idf AS DOUBLE) *
             |        ((tf1 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |         (tf1 + CAST(1.2 AS DOUBLE) *
             |          ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |           ((CAST(0.75 AS DOUBLE) * piv.dl) * stats.n) / stats.tot)))
             |      ELSE CAST(0.0 AS DOUBLE) END)
             |    + CASE WHEN tf2 > 0 THEN CAST(i2.idf AS DOUBLE) *
             |        ((tf2 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |         (tf2 + CAST(1.2 AS DOUBLE) *
             |          ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |           ((CAST(0.75 AS DOUBLE) * piv.dl) * stats.n) / stats.tot)))
             |      ELSE CAST(0.0 AS DOUBLE) END) AS score,
             |    (CASE WHEN tf0 > 0 THEN 1 ELSE 0 END +
             |     CASE WHEN tf1 > 0 THEN 1 ELSE 0 END +
             |     CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS n_matched
             |  FROM piv CROSS JOIN stats
             |  LEFT JOIN idf i0 ON i0.tok = 'dup'
             |  LEFT JOIN idf i1 ON i1.tok = 'hash'
             |  LEFT JOIN idf i2 ON i2.tok = 'join')
             |SELECT doc_id, score, CAST(n_matched AS INTEGER) AS n_matched, dl
             |FROM sc WHERE n_matched > 0
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      allowBnlj = true),

    // BM25 MODEL ARTIFACT roundtrip (round 11): the fitted model is
    // PERSISTED as parquet and the query scores through the RELOADED
    // table — the production fit/serve split with an on-disk artifact,
    // so a scorer never refits (the reload is a leaf scan; no fit jobs
    // in the query plan — plan-asserted in SearchOpsSpec). Oracled
    // against DuckDB reading the SAME staged model: idf/N/T come from
    // the artifact, tf/dl from the corpus, the weight is the bm25_topk
    // IEEE sequence verbatim.
    "search_bm25_model_roundtrip" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val dir = staged(d, "bm25_model") { dir =>
          SearchOps.bm25Fit(docs, "doc_id", "text")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val model = s.read.parquet(dir)
        SearchOps.bm25TopK(docs, "doc_id", "text", model,
          Seq("dup", "merge"), k = 15)
      },
      Some("""WITH model AS (
             |  SELECT * FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/bm25_model/*.parquet')),
             |stats AS (
             |  SELECT _n_docs AS n, _total_toks AS tot FROM model
             |  WHERE _tok IS NULL),
             |idf AS (
             |  SELECT _tok AS tok, _idf AS idf FROM model WHERE _tok IS NOT NULL),
             |toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
             |piv AS (
             |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl,
             |    CAST(sum(CASE WHEN tok = 'dup'   THEN tf ELSE 0 END) AS BIGINT) AS tf0,
             |    CAST(sum(CASE WHEN tok = 'merge' THEN tf ELSE 0 END) AS BIGINT) AS tf1
             |  FROM dt GROUP BY 1),
             |sc AS (
             |  SELECT piv.doc_id, piv.dl,
             |    (CASE WHEN tf0 > 0 THEN CAST(i0.idf AS DOUBLE) *
             |        ((tf0 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |         (tf0 + CAST(1.2 AS DOUBLE) *
             |          ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |           ((CAST(0.75 AS DOUBLE) * piv.dl) * stats.n) / stats.tot)))
             |      ELSE CAST(0.0 AS DOUBLE) END
             |    + CASE WHEN tf1 > 0 THEN CAST(i1.idf AS DOUBLE) *
             |        ((tf1 * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |         (tf1 + CAST(1.2 AS DOUBLE) *
             |          ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |           ((CAST(0.75 AS DOUBLE) * piv.dl) * stats.n) / stats.tot)))
             |      ELSE CAST(0.0 AS DOUBLE) END) AS score,
             |    (CASE WHEN tf0 > 0 THEN 1 ELSE 0 END +
             |     CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS n_matched
             |  FROM piv CROSS JOIN stats
             |  LEFT JOIN idf i0 ON i0.tok = 'dup'
             |  LEFT JOIN idf i1 ON i1.tok = 'merge')
             |SELECT doc_id, score, CAST(n_matched AS INTEGER) AS n_matched, dl
             |FROM sc WHERE n_matched > 0
             |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin),
      allowBnlj = true),

    // Query-TABLE BM25 (SearchOps.bm25TopKBatch): a batch of queries
    // scored through the SAME frozen model in ONE plan — queries are
    // data, not plan structure (the literal form re-plans per query).
    // Query terms join the model once; postings join query terms on
    // term; per-query top-k ranks through TopKPerKey. Hash-exact
    // because the per-term weight is the bm25_topk IEEE sequence
    // verbatim and the per-(query,doc) sum is a SORTED left fold from
    // +0.0 that DuckDB restates with list_reduce(list(w ORDER BY tok))
    // — an accumulation order both engines honor, unlike a row-set SUM.
    // q4's only term is OOV ⇒ it drops at the model join and emits no
    // rows (documented bm25TopKBatch contract).
    "search_bm25_batch" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val model = SearchOps.bm25Fit(docs, "doc_id", "text")
        val queries = Seq(
          ("q1", "dup hash join"),
          ("q2", "merge sort"),
          ("q3", "dup zebra"),
          ("q4", "qqqzzz")).toDF("qid", "qtext")
        SearchOps.bm25TopKBatch(docs, "doc_id", "text", model,
            queries, "qid", "qtext", k = 10)
          .orderBy(col("qid"), col("doc_id"))
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |       FROM dt GROUP BY 1),
             |stats AS (SELECT count(DISTINCT doc_id) AS n,
             |                 CAST(sum(tf) AS BIGINT) AS tot FROM dt),
             |dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
             |idf AS (
             |  SELECT tok, CAST(ln(CAST(1.0 AS DOUBLE) +
             |      ((n - df) + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
             |    AS DECIMAL(20,6)) AS idf
             |  FROM dfc CROSS JOIN stats),
             |q(qid, qtext) AS (VALUES
             |  ('q1', 'dup hash join'), ('q2', 'merge sort'),
             |  ('q3', 'dup zebra'), ('q4', 'qqqzzz')),
             |qt AS (
             |  SELECT qid, unnest(list_distinct(list_filter(
             |    regexp_split_to_array(lower(qtext), '\s+'),
             |    x -> length(x) > 0))) AS tok
             |  FROM q),
             |qi AS (
             |  SELECT qt.qid, qt.tok, idf.idf
             |  FROM qt JOIN idf ON idf.tok = qt.tok),
             |w AS (
             |  SELECT qi.qid, dt.doc_id, dl.dl, qi.tok,
             |    CAST(qi.idf AS DOUBLE) *
             |      ((dt.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |       (dt.tf + CAST(1.2 AS DOUBLE) *
             |        ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |         ((CAST(0.75 AS DOUBLE) * dl.dl) * stats.n) / stats.tot)))
             |      AS w
             |  FROM dt
             |  JOIN qi ON qi.tok = dt.tok
             |  JOIN dl ON dl.doc_id = dt.doc_id
             |  CROSS JOIN stats),
             |sc AS (
             |  SELECT qid, doc_id, dl,
             |    list_reduce(list(w ORDER BY tok), (a, b) -> a + b) AS score,
             |    CAST(count(*) AS INTEGER) AS n_matched
             |  FROM w GROUP BY qid, doc_id, dl),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid
             |    ORDER BY score DESC, doc_id) AS rank FROM sc)
             |SELECT qid, doc_id, CAST(rank AS INTEGER) AS rank, score,
             |  n_matched, dl
             |FROM r WHERE rank <= 10 ORDER BY qid, doc_id""".stripMargin),
      allowBnlj = true),

    // Pseudo-relevance-feedback query expansion (Rocchio 1971 class,
    // the RM/PRF production idiom): retrieve round 1 with the raw
    // query, mine the top-10 feedback docs for the 3 highest
    // df_feedback × idf terms the query lacks (EXACT decimal ranking —
    // DECIMAL(19,0) count × the model's quantized DECIMAL(20,6) idf),
    // append them, retrieve round 2 with the expanded term set — the
    // recall-widening loop every enterprise search stack ships. Both
    // rounds run the frozen-model batch scorer (one plan each; the
    // vocabulary-sized model localCheckpoints ONCE and feeds all three
    // consumers); the expanded query text is assembled IN-PLAN (sorted
    // array_join — no driver collect of data-dependent terms). The
    // oracle re-derives round 1, the expansion ranking, and round 2
    // from raw text.
    "search_prf_expand" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        // r15: every stage serves off the staged frozen index
        // (bm25IndexDirs) — round 1 is a filter of the staged depth-30
        // ranking, the expansion mines the staged postings, and round 2
        // (whose query is DATA-dependent — it can never be
        // pre-ranked) scores the staged postings against the staged
        // model: zero corpus re-tokenizations in this key. The oracle
        // still re-derives all three stages from raw text.
        val (modelDir, postingsDir, scoresDir) = bm25IndexDirs(s, d)
        val model = s.read.parquet(modelDir)
        val postings = s.read.parquet(postingsDir)
        val fb = s.read.parquet(scoresDir)
          .filter(col("q") === "dup hash" && col("rank") <= 10)
          .select(col("doc_id"))
        // postings grain is already distinct-(doc, token)
        val dtok = postings.select(col("doc_id"), col("_tok").as("tok"))
        val exp = dtok.join(broadcast(fb), Seq("doc_id"))
          .filter(!col("tok").isin("dup", "hash"))
          .groupBy(col("tok")).agg(count(lit(1)).as("df_fb"))
          .join(model.filter(col("_tok").isNotNull)
            .select(col("_tok").as("tok"), col("_idf")), Seq("tok"))
          .select(col("tok"),
            (col("df_fb").cast(DecimalType(19, 0)) * col("_idf")).as("_es"))
          .orderBy(col("_es").desc, col("tok")).limit(3)
        val q2 = exp
          .agg(array_join(sort_array(collect_list(col("tok"))), " ")
            .as("_ext"))
          .select(lit("q1").as("qid"),
            concat(lit("dup hash "), col("_ext")).as("qtext"))
        SearchOps.bm25TopKBatchOnPostings(postings, "doc_id", model,
            q2, "qid", "qtext", k = 10)
          .orderBy(col("rank"))
      },
      Some {
        def score(qtCte: String, tag: String) =
          s"""w$tag AS (
             |  SELECT dt.doc_id, dl.dl, q$tag.tok,
             |    CAST(q$tag.idf AS DOUBLE) *
             |      ((dt.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |       (dt.tf + CAST(1.2 AS DOUBLE) *
             |        ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |         ((CAST(0.75 AS DOUBLE) * dl.dl) * stats.n) / stats.tot)))
             |      AS w
             |  FROM dt
             |  JOIN (SELECT qt.tok, idf.idf FROM $qtCte qt
             |        JOIN idf ON idf.tok = qt.tok) q$tag
             |    ON q$tag.tok = dt.tok
             |  JOIN dl ON dl.doc_id = dt.doc_id
             |  CROSS JOIN stats),
             |sc$tag AS (
             |  SELECT doc_id, dl,
             |    list_reduce(list(w ORDER BY tok), (a, b) -> a + b) AS score,
             |    CAST(count(*) AS INTEGER) AS n_matched
             |  FROM w$tag GROUP BY doc_id, dl),
             |r$tag AS (
             |  SELECT *, row_number() OVER (
             |    ORDER BY score DESC, doc_id) AS rank FROM sc$tag)""".stripMargin
        s"""WITH toks0 AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
           |  FROM documents),
           |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
           |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
           |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
           |       FROM dt GROUP BY 1),
           |stats AS (SELECT count(DISTINCT doc_id) AS n,
           |                 CAST(sum(tf) AS BIGINT) AS tot FROM dt),
           |dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
           |idf AS (
           |  SELECT tok, CAST(ln(CAST(1.0 AS DOUBLE) +
           |      ((n - df) + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
           |    AS DECIMAL(20,6)) AS idf
           |  FROM dfc CROSS JOIN stats),
           |qt1(tok) AS (VALUES ('dup'), ('hash')),
           |${score("qt1", "1")},
           |fb AS (SELECT doc_id FROM r1 WHERE rank <= 10),
           |dtok AS (SELECT DISTINCT doc_id, tok FROM t),
           |expn AS (
           |  SELECT d2.tok, CAST(count(*) AS BIGINT) AS df_fb
           |  FROM dtok d2 JOIN fb USING (doc_id)
           |  WHERE d2.tok NOT IN ('dup', 'hash')
           |  GROUP BY 1),
           |esc AS (
           |  SELECT expn.tok, CAST(expn.df_fb AS DECIMAL(19,0)) * idf.idf AS es
           |  FROM expn JOIN idf ON idf.tok = expn.tok),
           |top3 AS (SELECT tok FROM esc ORDER BY es DESC, tok LIMIT 3),
           |qt2 AS (SELECT tok FROM qt1 UNION SELECT tok FROM top3),
           |${score("qt2", "2")}
           |SELECT 'q1' AS qid, doc_id, CAST(rank AS INTEGER) AS rank, score,
           |  n_matched, dl
           |FROM r2 WHERE rank <= 10 ORDER BY rank""".stripMargin
      },
      allowBnlj = true),

    // Per-doc TF-IDF keyword extraction against the same frozen model
    // (SearchOps.tfIdfTopTerms): top-3 terms per document by idf × tf —
    // EXACT decimal arithmetic for the RANKING (DECIMAL(20,6) idf ×
    // DECIMAL(10,0) tf pinned to DECIMAL(30,6)), with the weight
    // PRESENTED as DOUBLE on both sides: precision-30 decimal outputs
    // are int128-backed and hash-hostile downstream, while
    // decimal→float64 is bit-determined on both engines. The per-doc
    // rank filter plans through the two-phase TopKPerKey strategy:
    // map-side heaps bound the Exchange to ≤ docs×3 rows.
    "search_tfidf_keywords" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = SearchOps.bm25Fit(docs, "doc_id", "text")
        SearchOps.tfIdfTopTerms(docs, "doc_id", "text", model, kPerDoc = 3)
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
             |stats AS (SELECT count(DISTINCT doc_id) AS n FROM dt),
             |dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
             |idf AS (
             |  SELECT tok, CAST(ln(CAST(1.0 AS DOUBLE) +
             |      ((n - df) + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
             |    AS DECIMAL(20,6)) AS idf
             |  FROM dfc CROSS JOIN stats),
             |w AS (
             |  SELECT dt.doc_id, dt.tok, dt.tf,
             |    CAST(idf.idf * CAST(dt.tf AS DECIMAL(10,0))
             |         AS DECIMAL(30,6)) AS weight
             |  FROM dt JOIN idf ON idf.tok = dt.tok),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY weight DESC, tok) AS rank FROM w)
             |SELECT doc_id, CAST(rank AS INTEGER) AS rank, tok AS term,
             |  CAST(tf AS BIGINT) AS tf, CAST(weight AS DOUBLE) AS weight
             |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin),
      allowBnlj = true),

    // HYBRID retrieval via reciprocal-rank fusion (Cormack et al. 2009,
    // SearchOps.rrfFuse) — the combiner every production hybrid-search
    // stack runs: the SAME three queries retrieve through BOTH the
    // frozen-model BM25 lexical branch (search_bm25_batch's plan, depth
    // 30) and the dense brute-force cosine branch over the in-pipeline
    // HashingEmbedder (sim_embed_topk_cosine's plan, depth 30), then
    // fuse rank-wise: rrf = 1/(60+lex_rank) + 1/(60+dense_rank), each
    // reciprocal ONE IEEE division of exact integers and the sum a
    // fixed-order two-term add — bit-exact cross-engine with NO score
    // normalization (RRF never reads the branches' incomparable raw
    // scores; that is the point of the algorithm). Per-system rank
    // columns ride along as NULL-able provenance ('which branch found
    // it'); q3's 'zebra' term is lexically OOV yet still contributes
    // dense signal — the complementary-recall case hybrid search exists
    // for. DuckDB re-derives BOTH branches from raw text (the
    // bm25_batch postings CTEs + the hashing-embedder CTEs) and fuses
    // with the same fixed-order expression; the fused top-10 per query
    // must match rank-for-rank.
    "search_rrf_hybrid" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val queries = Seq(
          ("q1", "dup hash join"),
          ("q2", "merge sort"),
          ("q3", "dup zebra")).toDF("qid", "qtext")
        // r15: the lexical branch serves off the staged depth-30
        // ranking (bm25IndexDirs — qid remapped from the query-text
        // key); the oracle still re-derives it from raw text
        val lex = s.read.parquet(bm25IndexDirs(s, d)._3)
          .join(broadcast(queries), col("q") === col("qtext"))
          .select(col("qid"), col("doc_id"), col("rank"))
        val embedder = () => new EmbedOps.HashingEmbedder(dim = 16, seed = 7L)
        val dEmb = EmbedOps.embedWith(
            docs.select(col("doc_id"), col("text")), "text", embedder)
          .select(col("doc_id"),
            transform(col("embedding"), x => x.cast(LongType)).as("cv"))
          .withColumn("nb", SimilarityOps.dotLong(col("cv"), col("cv")))
          .filter(col("nb") > 0)
        val qEmb = EmbedOps.embedWith(queries, "qtext", embedder)
          .select(col("qid"),
            transform(col("embedding"), x => x.cast(LongType)).as("qv"))
          .withColumn("na", SimilarityOps.dotLong(col("qv"), col("qv")))
          .filter(col("na") > 0)
        val dense = dEmb.crossJoin(broadcast(qEmb))
          .withColumn("dot", SimilarityOps.dotLong(col("qv"), col("cv")))
          .withColumn("cos_q", col("dot").cast(DoubleType) /
            (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos_q").desc, col("doc_id"))))
          .filter(col("rank") <= 30)
          .select(col("qid"), col("doc_id"), col("rank"))
        SearchOps.rrfFuse(Seq("lex" -> lex, "dense" -> dense),
            "qid", "doc_id", "rank", kRrf = 60, k = 10)
          .orderBy(col("qid"), col("rrf_rank"))
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |       FROM dt GROUP BY 1),
             |stats AS (SELECT count(DISTINCT doc_id) AS n,
             |                 CAST(sum(tf) AS BIGINT) AS tot FROM dt),
             |dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
             |idf AS (
             |  SELECT tok, CAST(ln(CAST(1.0 AS DOUBLE) +
             |      ((n - df) + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
             |    AS DECIMAL(20,6)) AS idf
             |  FROM dfc CROSS JOIN stats),
             |q(qid, qtext) AS (VALUES
             |  ('q1', 'dup hash join'), ('q2', 'merge sort'),
             |  ('q3', 'dup zebra')),
             |qt AS (
             |  SELECT qid, unnest(list_distinct(list_filter(
             |    regexp_split_to_array(lower(qtext), '\s+'),
             |    x -> length(x) > 0))) AS tok
             |  FROM q),
             |qi AS (
             |  SELECT qt.qid, qt.tok, idf.idf
             |  FROM qt JOIN idf ON idf.tok = qt.tok),
             |w AS (
             |  SELECT qi.qid, dt.doc_id, qi.tok,
             |    CAST(qi.idf AS DOUBLE) *
             |      ((dt.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |       (dt.tf + CAST(1.2 AS DOUBLE) *
             |        ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |         ((CAST(0.75 AS DOUBLE) * dl.dl) * stats.n) / stats.tot)))
             |      AS w
             |  FROM dt
             |  JOIN qi ON qi.tok = dt.tok
             |  JOIN dl ON dl.doc_id = dt.doc_id
             |  CROSS JOIN stats),
             |lsc AS (
             |  SELECT qid, doc_id,
             |    list_reduce(list(w ORDER BY tok), (a, b) -> a + b) AS score
             |  FROM w GROUP BY qid, doc_id),
             |lexr AS (
             |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
             |    ORDER BY score DESC, doc_id) AS rank FROM lsc),
             |hashed AS (
             |  SELECT doc_id,
             |    list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(regexp_split_to_array(tok, ''),
             |        c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 2147483647) AS h
             |  FROM t),
             |sums AS (
             |  SELECT doc_id, h % 16 AS dim_idx,
             |    SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS v
             |  FROM hashed GROUP BY 1, 2),
             |norms AS (
             |  SELECT doc_id, SUM(v*v) AS nn FROM sums GROUP BY 1),
             |qhashed AS (
             |  SELECT qid,
             |    list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(regexp_split_to_array(tok, ''),
             |        c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 2147483647) AS h
             |  FROM (SELECT qid,
             |          unnest(regexp_split_to_array(lower(qtext), '\s+')) AS tok
             |        FROM q)
             |  WHERE length(tok) > 0),
             |qsums AS (
             |  SELECT qid, h % 16 AS dim_idx,
             |    SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS v
             |  FROM qhashed GROUP BY 1, 2),
             |qnorms AS (
             |  SELECT qid, SUM(v*v) AS nn FROM qsums GROUP BY 1),
             |dpairs AS (
             |  SELECT qn.qid, n.doc_id
             |  FROM (SELECT qid FROM qnorms WHERE nn > 0) qn
             |  CROSS JOIN (SELECT doc_id FROM norms WHERE nn > 0) n),
             |ddots AS (
             |  SELECT qs.qid, s.doc_id, SUM(qs.v * s.v) AS dot
             |  FROM qsums qs JOIN sums s USING (dim_idx)
             |  GROUP BY 1, 2),
             |dscored AS (
             |  SELECT p.qid, p.doc_id,
             |    CAST(COALESCE(dd.dot, 0) AS DOUBLE) /
             |      (sqrt(CAST(qn.nn AS DOUBLE)) * sqrt(CAST(n2.nn AS DOUBLE))) AS cos_q
             |  FROM dpairs p
             |  LEFT JOIN ddots dd ON dd.qid = p.qid AND dd.doc_id = p.doc_id
             |  JOIN qnorms qn ON qn.qid = p.qid
             |  JOIN norms n2 ON n2.doc_id = p.doc_id),
             |denser AS (
             |  SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
             |    ORDER BY cos_q DESC, doc_id) AS rank FROM dscored),
             |fused AS (
             |  SELECT COALESCE(l.qid, de.qid) AS qid,
             |         COALESCE(l.doc_id, de.doc_id) AS doc_id,
             |         l.rank AS lex_rank, de.rank AS dense_rank
             |  FROM (SELECT * FROM lexr WHERE rank <= 30) l
             |  FULL OUTER JOIN (SELECT * FROM denser WHERE rank <= 30) de
             |    ON l.qid = de.qid AND l.doc_id = de.doc_id),
             |fsc AS (
             |  SELECT qid, doc_id, lex_rank, dense_rank,
             |    COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex_rank),
             |             CAST(0.0 AS DOUBLE)) +
             |    COALESCE(CAST(1.0 AS DOUBLE) / (60 + dense_rank),
             |             CAST(0.0 AS DOUBLE)) AS rrf_score,
             |    (CASE WHEN lex_rank IS NOT NULL THEN 1 ELSE 0 END +
             |     CASE WHEN dense_rank IS NOT NULL THEN 1 ELSE 0 END) AS n_systems
             |  FROM fused),
             |fr AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid
             |    ORDER BY rrf_score DESC, doc_id) AS rrf_rank FROM fsc)
             |SELECT qid, CAST(rrf_rank AS INTEGER) AS rrf_rank, doc_id,
             |  rrf_score, CAST(lex_rank AS INTEGER) AS lex_rank,
             |  CAST(dense_rank AS INTEGER) AS dense_rank,
             |  CAST(n_systems AS INTEGER) AS n_systems
             |FROM fr WHERE rrf_rank <= 10 ORDER BY qid, rrf_rank""".stripMargin),
      allowBnlj = true),

    // Offline retrieval EVALUATION (SearchOps.evalRanking) — the judged
    // metrics harness that closes the retrieval family (index →
    // retrieve → fuse → evaluate): precision@10, recall@10, reciprocal
    // rank, and binary-gain nDCG@10 (Järvelin & Kekäläinen 2002) for
    // the frozen-model BM25 batch ranking against a RULE-DEFINED
    // relevance set both engines derive from raw text (relevant = doc
    // contains EVERY distinct query term). The only transcendental is
    // the rank discount 1/log2(pos+1) — computed once per position on
    // a 10-row literal frame and quantized DECIMAL(20,9) (oracle
    // quantizes through the VARCHAR bridge — DuckDB's direct
    // double→DECIMAL cast double-rounds via ×10⁹, the measured
    // ts_backtest class); DCG/IDCG are exact decimal sums over that
    // frozen table and every presented metric ends in ONE IEEE
    // division. q3's 'zebra' kills its relevance set (no doc holds
    // both terms) → recall/nDCG NULL, rr 0.0 — the undefined-vs-zero
    // convention exercised, not just documented.
    "search_eval_ndcg" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        // r15: ranking AND relevance both serve off the staged frozen
        // index (bm25IndexDirs — ranking is a rank≤10 filter of the
        // staged depth-30 table, relevance mines the staged postings,
        // whose grain is already distinct-(doc, token)); the oracle
        // still re-derives both from raw text.
        val (_, postingsDir, scoresDir) = bm25IndexDirs(s, d)
        val queries = Seq(
          ("q1", "dup hash join"),
          ("q2", "merge sort"),
          ("q3", "dup zebra")).toDF("qid", "qtext")
        val ranking = s.read.parquet(scoresDir)
          .join(broadcast(queries), col("q") === col("qtext"))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("doc_id"), col("rank"))
        val qterms = queries.select(col("qid"),
          explode(array_distinct(filter(TextOps.tokenize(col("qtext")),
            x => length(x) > 0))).as("tok"))
        val nTerms = qterms.groupBy(col("qid")).agg(count(lit(1)).as("nt"))
        val docToks = s.read.parquet(postingsDir)
          .select(col("doc_id"), col("_tok").as("tok"))
        val rel = qterms.join(docToks, Seq("tok"))
          .groupBy(col("qid"), col("doc_id"))
          .agg(count(lit(1)).as("hit"))
          .join(nTerms, Seq("qid"))
          .filter(col("hit") === col("nt"))
          .select(col("qid"), col("doc_id"))
        SearchOps.evalRanking(ranking, rel, "qid", "doc_id", "rank", k = 10)
          .orderBy(col("qid"))
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |       FROM dt GROUP BY 1),
             |stats AS (SELECT count(DISTINCT doc_id) AS n,
             |                 CAST(sum(tf) AS BIGINT) AS tot FROM dt),
             |dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
             |idf AS (
             |  SELECT tok, CAST(ln(CAST(1.0 AS DOUBLE) +
             |      ((n - df) + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
             |    AS DECIMAL(20,6)) AS idf
             |  FROM dfc CROSS JOIN stats),
             |q(qid, qtext) AS (VALUES
             |  ('q1', 'dup hash join'), ('q2', 'merge sort'),
             |  ('q3', 'dup zebra')),
             |qt AS (
             |  SELECT qid, unnest(list_distinct(list_filter(
             |    regexp_split_to_array(lower(qtext), '\s+'),
             |    x -> length(x) > 0))) AS tok
             |  FROM q),
             |qi AS (
             |  SELECT qt.qid, qt.tok, idf.idf
             |  FROM qt JOIN idf ON idf.tok = qt.tok),
             |w AS (
             |  SELECT qi.qid, dt.doc_id, qi.tok,
             |    CAST(qi.idf AS DOUBLE) *
             |      ((dt.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |       (dt.tf + CAST(1.2 AS DOUBLE) *
             |        ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |         ((CAST(0.75 AS DOUBLE) * dl.dl) * stats.n) / stats.tot)))
             |      AS w
             |  FROM dt
             |  JOIN qi ON qi.tok = dt.tok
             |  JOIN dl ON dl.doc_id = dt.doc_id
             |  CROSS JOIN stats),
             |lsc AS (
             |  SELECT qid, doc_id,
             |    list_reduce(list(w ORDER BY tok), (a, b) -> a + b) AS score
             |  FROM w GROUP BY qid, doc_id),
             |rk AS (
             |  SELECT qid, doc_id, rank FROM (
             |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
             |      ORDER BY score DESC, doc_id) AS rank FROM lsc)
             |  WHERE rank <= 10),
             |qn AS (SELECT qid, count(*) AS nt FROM qt GROUP BY 1),
             |dtok AS (SELECT DISTINCT doc_id, tok FROM t),
             |relc AS (
             |  SELECT qt.qid, dtok.doc_id, count(*) AS c
             |  FROM qt JOIN dtok ON dtok.tok = qt.tok GROUP BY 1, 2),
             |relv AS (
             |  SELECT relc.qid, relc.doc_id
             |  FROM relc JOIN qn ON qn.qid = relc.qid AND relc.c = qn.nt),
             |disc AS (
             |  SELECT CAST(pos AS INTEGER) AS pos,
             |    CAST(CAST(CAST(1.0 AS DOUBLE) / log2(pos + 1) AS VARCHAR)
             |      AS DECIMAL(20,9)) AS disc
             |  FROM (SELECT unnest(range(1, 11)) AS pos)),
             |j AS (
             |  SELECT rk.qid, rk.rank, d2.disc,
             |    CASE WHEN relv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
             |  FROM rk JOIN disc d2 ON d2.pos = rk.rank
             |  LEFT JOIN relv ON relv.qid = rk.qid AND relv.doc_id = rk.doc_id),
             |perq AS (
             |  SELECT qid, CAST(count(*) AS INTEGER) AS n_ret,
             |    CAST(sum(hit) AS INTEGER) AS n_hits,
             |    min(CASE WHEN hit = 1 THEN rank END) AS first_rel,
             |    sum(CASE WHEN hit = 1 THEN disc END) AS dcg_d
             |  FROM j GROUP BY 1),
             |nrel AS (SELECT qid, CAST(count(*) AS INTEGER) AS n_rel
             |         FROM relv GROUP BY 1),
             |idcg AS (
             |  SELECT nrel.qid, sum(disc.disc) AS idcg_d
             |  FROM nrel JOIN disc ON disc.pos <= least(n_rel, 10)
             |  GROUP BY 1)
             |SELECT perq.qid AS qid, n_ret,
             |  CAST(COALESCE(n_rel, 0) AS INTEGER) AS n_rel,
             |  n_hits,
             |  CASE WHEN first_rel IS NOT NULL
             |    THEN CAST(1.0 AS DOUBLE) / first_rel
             |    ELSE CAST(0.0 AS DOUBLE) END AS rr,
             |  CAST(n_hits AS DOUBLE) / CAST(10.0 AS DOUBLE) AS precision_k,
             |  CASE WHEN n_rel > 0
             |    THEN CAST(n_hits AS DOUBLE) / CAST(n_rel AS DOUBLE)
             |  END AS recall_k,
             |  CAST(COALESCE(dcg_d, 0) AS DOUBLE) AS dcg,
             |  CAST(idcg_d AS DOUBLE) AS idcg,
             |  CASE WHEN n_rel > 0 AND dcg_d IS NOT NULL
             |    THEN CAST(dcg_d AS DOUBLE) / CAST(idcg_d AS DOUBLE)
             |    WHEN n_rel > 0 THEN CAST(0.0 AS DOUBLE) END AS ndcg
             |FROM perq
             |LEFT JOIN nrel ON nrel.qid = perq.qid
             |LEFT JOIN idcg ON idcg.qid = perq.qid
             |ORDER BY perq.qid""".stripMargin),
      allowBnlj = true),

    // Average precision at 10 (SearchOps.averagePrecision) — MAP's
    // per-query half, the other headline TREC metric next to
    // search_eval_ndcg's graded-gain family: AP integrates precision
    // at every relevant HIT position (Σ_j j/r_j over the sorted hit
    // ranks — each summand exact because position j IS the hit count
    // there), divided by the query's TOTAL relevant count (trec_eval
    // semantics — missing relevants in the top-k cost score). Same
    // BM25 ranking + rule-derived relevance harness as the nDCG key;
    // the sum is a LEFT FOLD over the sorted hit-rank array (never a
    // commutative double aggregate), restated in DuckDB as
    // list_reduce over list(term ORDER BY rank). q3's dead query
    // (n_rel = 0) → NULL AP.
    "search_eval_map" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        // r15: staged-index serve, same shape as search_eval_ndcg (the
        // oracle still re-derives from raw text)
        val (_, postingsDir, scoresDir) = bm25IndexDirs(s, d)
        val queries = Seq(
          ("q1", "dup hash join"),
          ("q2", "merge sort"),
          ("q3", "dup zebra")).toDF("qid", "qtext")
        val ranking = s.read.parquet(scoresDir)
          .join(broadcast(queries), col("q") === col("qtext"))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("doc_id"), col("rank"))
        val qterms = queries.select(col("qid"),
          explode(array_distinct(filter(TextOps.tokenize(col("qtext")),
            x => length(x) > 0))).as("tok"))
        val nTerms = qterms.groupBy(col("qid")).agg(count(lit(1)).as("nt"))
        val docToks = s.read.parquet(postingsDir)
          .select(col("doc_id"), col("_tok").as("tok"))
        val rel = qterms.join(docToks, Seq("tok"))
          .groupBy(col("qid"), col("doc_id"))
          .agg(count(lit(1)).as("hit"))
          .join(nTerms, Seq("qid"))
          .filter(col("hit") === col("nt"))
          .select(col("qid"), col("doc_id"))
        SearchOps.averagePrecision(ranking, rel, "qid", "doc_id", "rank",
          k = 10)
          .orderBy(col("qid"))
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM documents),
             |t AS (SELECT * FROM toks0 WHERE length(tok) > 0),
             |dt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
             |       FROM dt GROUP BY 1),
             |stats AS (SELECT count(DISTINCT doc_id) AS n,
             |                 CAST(sum(tf) AS BIGINT) AS tot FROM dt),
             |dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
             |idf AS (
             |  SELECT tok, CAST(ln(CAST(1.0 AS DOUBLE) +
             |      ((n - df) + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
             |    AS DECIMAL(20,6)) AS idf
             |  FROM dfc CROSS JOIN stats),
             |q(qid, qtext) AS (VALUES
             |  ('q1', 'dup hash join'), ('q2', 'merge sort'),
             |  ('q3', 'dup zebra')),
             |qt AS (
             |  SELECT qid, unnest(list_distinct(list_filter(
             |    regexp_split_to_array(lower(qtext), '\s+'),
             |    x -> length(x) > 0))) AS tok
             |  FROM q),
             |qi AS (
             |  SELECT qt.qid, qt.tok, idf.idf
             |  FROM qt JOIN idf ON idf.tok = qt.tok),
             |w AS (
             |  SELECT qi.qid, dt.doc_id, qi.tok,
             |    CAST(qi.idf AS DOUBLE) *
             |      ((dt.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
             |       (dt.tf + CAST(1.2 AS DOUBLE) *
             |        ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
             |         ((CAST(0.75 AS DOUBLE) * dl.dl) * stats.n) / stats.tot)))
             |      AS w
             |  FROM dt
             |  JOIN qi ON qi.tok = dt.tok
             |  JOIN dl ON dl.doc_id = dt.doc_id
             |  CROSS JOIN stats),
             |lsc AS (
             |  SELECT qid, doc_id,
             |    list_reduce(list(w ORDER BY tok), (a, b) -> a + b) AS score
             |  FROM w GROUP BY qid, doc_id),
             |rk AS (
             |  SELECT qid, doc_id, rank FROM (
             |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
             |      ORDER BY score DESC, doc_id) AS rank FROM lsc)
             |  WHERE rank <= 10),
             |qn AS (SELECT qid, count(*) AS nt FROM qt GROUP BY 1),
             |dtok AS (SELECT DISTINCT doc_id, tok FROM t),
             |relc AS (
             |  SELECT qt.qid, dtok.doc_id, count(*) AS c
             |  FROM qt JOIN dtok ON dtok.tok = qt.tok GROUP BY 1, 2),
             |relv AS (
             |  SELECT relc.qid, relc.doc_id
             |  FROM relc JOIN qn ON qn.qid = relc.qid AND relc.c = qn.nt),
             |hits AS (
             |  SELECT rk.qid, rk.rank,
             |    row_number() OVER (PARTITION BY rk.qid ORDER BY rk.rank) AS j
             |  FROM rk JOIN relv
             |    ON relv.qid = rk.qid AND relv.doc_id = rk.doc_id),
             |hsum AS (
             |  SELECT qid, CAST(count(*) AS INTEGER) AS n_hits,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(CAST(j AS DOUBLE) / CAST(rank AS DOUBLE)
             |        ORDER BY rank)),
             |      (a, b) -> a + b) AS s
             |  FROM hits GROUP BY qid),
             |perq AS (SELECT qid, CAST(count(*) AS INTEGER) AS n_ret
             |         FROM rk GROUP BY 1),
             |nrel AS (SELECT qid, CAST(count(*) AS INTEGER) AS n_rel
             |         FROM relv GROUP BY 1)
             |SELECT perq.qid AS qid, n_ret,
             |  CAST(COALESCE(n_rel, 0) AS INTEGER) AS n_rel,
             |  CAST(COALESCE(n_hits, 0) AS INTEGER) AS n_hits,
             |  CASE WHEN COALESCE(n_rel, 0) > 0 THEN
             |    CASE WHEN n_hits IS NULL THEN CAST(0.0 AS DOUBLE)
             |         ELSE s / CAST(n_rel AS DOUBLE) END
             |  END AS ap
             |FROM perq
             |LEFT JOIN hsum ON hsum.qid = perq.qid
             |LEFT JOIN nrel ON nrel.qid = perq.qid
             |ORDER BY perq.qid""".stripMargin),
      allowBnlj = true),

    // Sequence packing: documents → token-budget bins per source (the
    // context-window binning step of a training pipeline). Exact integer
    // window arithmetic ⇒ fully oracled.
    "text_pack_bins" -> QuerySpec(
      (s, d) => SampleOps.packSequences(
        t(s, d, "documents"), "source", "doc_id", "n_chars", budget = 4096L)
        .select(col("source"), col("doc_id"), col("n_chars"), col("bin"))
        .orderBy(col("source"), col("doc_id")),
      Some("""WITH c AS (
             |  SELECT source, doc_id, n_chars,
             |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM documents)
             |SELECT source, doc_id, n_chars,
             |  CAST((cum - n_chars) // 4096 AS BIGINT) AS bin
             |FROM c ORDER BY source, doc_id""".stripMargin)),

    // Sequence packing under TRAINED subword budgets: same greedy offset
    // binning as text_pack_bins, but the cost column is bpeEncode's
    // n_bpe_tokens — whitespace counts under-budget real training
    // sequences. The merge replay itself is not SQL-expressible, so the
    // word→n_pieces encoder table (deterministic: memoized merges with
    // bit-deterministic tie-breaks) is STAGED for the oracle, which
    // independently recomputes tokenization, per-doc subword totals
    // (incl. the char-count OOV fallback) and bin assignment from it —
    // the scan_binaryfile staged-artifact precedent. The replay itself
    // is contract-checked in text_token_count_bpe.
    "text_pack_bins_bpe" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = bpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.bpeFit(docs, "text", numMerges = 24, minCount = 5))
        val pieces = BpeOps.wordPieces(docs, "text", merges)
        staged(d, "bpe_pieces") { dir =>
          pieces.select(col("word"), col("pieces"), col("n_pieces"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val enc = BpeOps.bpeEncode(docs, "doc_id", "text", pieces)
        val withSrc = docs.select(col("doc_id"), col("source"))
          .join(enc.select(col("doc_id"), col("n_bpe_tokens")), Seq("doc_id"))
        SampleOps.packSequences(withSrc, "source", "doc_id", "n_bpe_tokens",
          budget = 2048L)
          .select(col("source"), col("doc_id"), col("n_bpe_tokens"), col("bin"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""WITH pieces AS (
             |  SELECT word, n_pieces FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/bpe_pieces/*.parquet')),
             |toks AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
             |  FROM documents),
             |enc AS (
             |  SELECT t.doc_id,
             |    SUM(COALESCE(p.n_pieces, length(t.word))) AS n_bpe_tokens
             |  FROM toks t LEFT JOIN pieces p USING (word)
             |  WHERE length(t.word) > 0 GROUP BY t.doc_id),
             |j AS (
             |  SELECT d.source, d.doc_id, e.n_bpe_tokens
             |  FROM documents d JOIN enc e USING (doc_id)),
             |c AS (
             |  SELECT source, doc_id, n_bpe_tokens,
             |    SUM(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM j)
             |SELECT source, doc_id, CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
             |  CAST((cum - n_bpe_tokens) // 2048 AS BIGINT) AS bin
             |FROM c ORDER BY source, doc_id""".stripMargin)),

    // Tokenizer-artifact round trip: the trained merge list persists as
    // a standard merges.txt (header + one 'left right' line per rank —
    // the interchange format other BPE stacks read) and reloads to the
    // identical model (require'd in-key, so a load bug breaks the key,
    // not just the hash). DuckDB independently PARSES the written
    // artifact — a hash match proves the file is well-formed and
    // foreign-readable, the sink_jsonl_export grain.
    "text_bpe_model_roundtrip" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = bpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.bpeFit(docs, "text", numMerges = 24, minCount = 5))
        val dir = staged(d, "bpe_merges_txt") { p =>
          BpeOps.saveModel(s, merges, p + "/merges.txt")
        }
        val reloaded = BpeOps.loadModel(s, dir + "/merges.txt")
        require(reloaded == merges,
          "merges.txt round trip must reproduce the trained model exactly")
        import s.implicits._
        reloaded.zipWithIndex
          .map { case ((a, b), i) => (i + 1L, a, b) }
          .toDF("rank", "left_sym", "right_sym")
          .orderBy(col("rank"))
      },
      Some("""SELECT row_number() OVER () AS rank, left_sym, right_sym
             |FROM read_csv(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/bpe_merges_txt/merges.txt',
             |  sep=' ', header=false, skip=1, parallel=false,
             |  columns={'left_sym':'VARCHAR','right_sym':'VARCHAR'})
             |ORDER BY rank""".stripMargin)),

    // BYTE-LEVEL BPE (the production tokenizer class — GPT-2/RoBERTa/
    // Llama train over raw UTF-8 bytes through the public
    // bytes_to_unicode alphabet, so NO input is ever OOV): train over
    // the regex-pre-tokenized chunk stream (leading space attaches to
    // the word — the space-aware vocabulary property), special token
    // <|endoftext|> stripped before chunking and never split/voted;
    // encode = distinct-chunk table join (BpeOps.byteWordPieces), the
    // wordPieces scale contract. Deterministic non-ASCII (" café №42")
    // is appended so the byte mapping does real multi-byte work. The
    // STAGED chunk→(mapped, pieces) encoder table lets DuckDB
    // independently re-chunk the corpus with the SAME regex (the
    // pattern is lookahead-free precisely so RE2 can run it), re-join,
    // and re-derive every total and check: per-source chunk/byte/piece
    // totals, special-token counts, and the three invariants — pieces
    // concatenate to the mapped chunk, |mapped| (symbols) equals
    // octet_length(chunk) (the mapping is per-byte), and the 32 merges
    // strictly compress bytes→pieces without beating 1 piece/chunk.
    // UNIGRAM-LM TOKENIZER (round 13, UnigramLmOps — Kudo 2018, the
    // SentencePiece model family): the third production tokenizer tier
    // beside the word/byte BPE merge lists. Model = piece → logProb
    // table (EM-trained, quantized to exact micro-log-units); encode =
    // Viterbi best segmentation as EXACT INTEGER DP over the
    // distinct-word frame, corpus joins the word table (the wordPieces
    // scale contract). Cross-engine verification goes BEYOND trusting
    // the staged tables: DuckDB independently (a) re-checks the cover
    // invariant, (b) re-derives every word's score from the staged
    // VOCAB (unk fallback included) and counts mismatches, and
    // (c) re-enumerates ALL segmentations of every word ≤ 8 chars with
    // a recursive CTE over a position/length edge table and counts any
    // word where enumeration beats the claimed Viterbi score — the
    // optimality claim is REFUTABLE by the oracle, not assumed. Spark
    // computes the same three counters its own way (brute-force UDF on
    // the short-word frame), so a Viterbi bug breaks the hash.
    "text_unigram_tok_encode" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val vocabSeq = unigramLmModels.computeIfAbsent(d,
          _ => UnigramLmOps.unigramFit(docs, "text", vocabSize = 120,
            maxPieceLen = 5, minCount = 3))
        val m = UnigramLmOps.model(vocabSeq)
        staged(d, "unigram_vocab") { dir =>
          vocabSeq.map { case (pc, lp) =>
            (pc, math.round(lp / UnigramLmOps.LogQuantum)) }
            .toDF("piece", "lp_micro")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pieces = UnigramLmOps.unigramWordPieces(docs, "text", m)
          .localCheckpoint() // model-sized; consumed by join + 3 checks
        staged(d, "unigram_pieces") { dir =>
          pieces.coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val toks = docs.select(col("source"),
            explode(TextOps.tokenize(col("text"))).as("word"))
          .filter(length(col("word")) > 0)
        val agg = toks
          .join(pieces.select(col("word"), col("n_pieces"),
            col("score_micro")), Seq("word"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_pieces")).as("total_pieces"),
            sum(col("score_micro")).as("total_score_micro"))
        // (a) cover invariant over the staged word table
        val chkCover = pieces.agg(
          sum(when(concat_ws("", col("pieces")) =!= col("word"), 1L)
            .otherwise(0L)).as("n_cover_bad"))
        // (b) score re-derivation from the VOCAB (unk fallback for
        // absent single chars; a multi-char piece missing from the
        // vocab is itself a defect)
        val vocabDf = vocabSeq.map { case (pc, lp) =>
          (pc, math.round(lp / UnigramLmOps.LogQuantum)) }
          .toDF("_piece", "_lp")
        val rescored = pieces
          .select(col("word"), col("score_micro"),
            explode(col("pieces")).as("_piece"))
          .join(broadcast(vocabDf), Seq("_piece"), "left")
          .withColumn("_mic", coalesce(col("_lp"),
            when(length(col("_piece")) === 1, lit(m.unkMicro))))
          .groupBy(col("word"), col("score_micro"))
          .agg(sum(col("_mic")).as("_re"),
            sum(when(col("_mic").isNull, 1L).otherwise(0L)).as("_miss"))
        val chkScore = rescored.agg(
          sum(when(col("_miss") > 0 || col("_re") =!= col("score_micro"),
            1L).otherwise(0L)).as("n_score_bad"))
        // (c) optimality on every short word, by exhaustive enumeration
        val brute = udf((w: String) => UnigramLmOps.bruteForceBest(w, m))
        val chkOpt = pieces.filter(length(col("word")) <= 8)
          .agg(sum(when(brute(col("word")) =!= col("score_micro"), 1L)
            .otherwise(0L)).as("n_viterbi_bad"))
        agg
          .withColumn("fertility",
            col("total_pieces").cast(DoubleType) /
              col("n_words").cast(DoubleType))
          .crossJoin(broadcast(chkCover))
          .crossJoin(broadcast(chkScore))
          .crossJoin(broadcast(chkOpt))
          .orderBy(col("source"))
      },
      Some("""WITH RECURSIVE
             |vocab AS (SELECT piece, lp_micro FROM read_parquet(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/unigram_vocab/*.parquet')),
             |enc AS (SELECT word, pieces, n_pieces, score_micro FROM read_parquet(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/unigram_pieces/*.parquet')),
             |toks0 AS (
             |  SELECT source,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS word
             |  FROM documents),
             |tk AS (SELECT source, word FROM toks0 WHERE length(word) > 0),
             |agg AS (
             |  SELECT t.source, CAST(count(*) AS BIGINT) AS n_words,
             |    CAST(SUM(e.n_pieces) AS BIGINT) AS total_pieces,
             |    CAST(SUM(e.score_micro) AS BIGINT) AS total_score_micro
             |  FROM tk t JOIN enc e USING (word) GROUP BY 1),
             |cover AS (
             |  SELECT CAST(SUM(CASE WHEN array_to_string(pieces, '') <> word
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_cover_bad FROM enc),
             |pl AS (SELECT word, score_micro, unnest(pieces) AS piece FROM enc),
             |ps AS (
             |  SELECT pl.word, pl.score_micro,
             |    COALESCE(v.lp_micro, CASE WHEN length(pl.piece) = 1
             |      THEN -20000000 END) AS mic
             |  FROM pl LEFT JOIN vocab v ON v.piece = pl.piece),
             |rs AS (
             |  SELECT word, score_micro, SUM(mic) AS re,
             |    CAST(SUM(CASE WHEN mic IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |      AS miss
             |  FROM ps GROUP BY 1, 2),
             |score AS (
             |  SELECT CAST(SUM(CASE WHEN miss > 0 OR re <> score_micro
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_score_bad FROM rs),
             |short AS (SELECT word, score_micro FROM enc
             |          WHERE length(word) <= 8),
             |pos AS (
             |  SELECT word, CAST(unnest(range(length(word))) AS INTEGER) AS i
             |  FROM short),
             |edges AS (
             |  SELECT p.word, p.i, CAST(l.len AS INTEGER) AS len,
             |    COALESCE(v.lp_micro, CASE WHEN l.len = 1
             |      THEN -20000000 END) AS mic
             |  FROM pos p
             |  CROSS JOIN (SELECT unnest(range(1, 6)) AS len) l
             |  LEFT JOIN vocab v
             |    ON v.piece = substr(p.word, p.i + 1, CAST(l.len AS INTEGER))
             |  WHERE p.i + l.len <= length(p.word)),
             |ed AS (SELECT word, i, len, mic FROM edges WHERE mic IS NOT NULL),
             |seg AS (
             |  SELECT word, CAST(0 AS INTEGER) AS pos,
             |    CAST(0 AS BIGINT) AS sc FROM short
             |  UNION ALL
             |  SELECT s.word, s.pos + e.len, s.sc + e.mic
             |  FROM seg s JOIN ed e ON e.word = s.word AND e.i = s.pos),
             |best AS (
             |  SELECT word, max(sc) AS best_sc FROM seg
             |  WHERE pos = length(word) GROUP BY 1),
             |opt AS (
             |  SELECT CAST(SUM(CASE WHEN b.best_sc <> sh.score_micro
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_viterbi_bad
             |  FROM best b JOIN short sh USING (word))
             |SELECT a.source, a.n_words, a.total_pieces, a.total_score_micro,
             |  CAST(a.total_pieces AS DOUBLE) / CAST(a.n_words AS DOUBLE)
             |    AS fertility,
             |  n_cover_bad, n_score_bad, n_viterbi_bad
             |FROM agg a CROSS JOIN cover CROSS JOIN score CROSS JOIN opt
             |ORDER BY a.source""".stripMargin),
      allowBnlj = true),

    // TOKENIZER HEAD-TO-HEAD (round 13): the eval a tokenizer team
    // actually runs before picking a tier — word-BPE (24 merges) vs
    // unigram-LM (120 pieces) on the SAME tokenize() word grain,
    // occurrence-weighted: per-source fertility (pieces/word) and the
    // per-word win counts. Both models are the catalog's own cached
    // fits; both staged word tables are (re)staged here so key
    // execution order never matters; DuckDB re-derives every number by
    // joining the two staged tables against its own re-tokenization of
    // the corpus. (The byte tier chunked by the GPT-2 regex sits on a
    // different grain — compared at its own keys, not force-joined.)
    "text_tokenizer_compare" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = bpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.bpeFit(docs, "text", numMerges = 24, minCount = 5))
        val bpe = BpeOps.wordPieces(docs, "text", merges)
        staged(d, "bpe_pieces") { dir =>
          bpe.select(col("word"), col("pieces"), col("n_pieces"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val vocabSeq = unigramLmModels.computeIfAbsent(d,
          _ => UnigramLmOps.unigramFit(docs, "text", vocabSize = 120,
            maxPieceLen = 5, minCount = 3))
        val uni = UnigramLmOps.unigramWordPieces(
          docs, "text", UnigramLmOps.model(vocabSeq))
        staged(d, "unigram_pieces") { dir =>
          uni.coalesce(1).write.mode("overwrite").parquet(dir)
        }
        docs.select(col("source"),
            explode(TextOps.tokenize(col("text"))).as("word"))
          .filter(length(col("word")) > 0)
          .join(bpe.select(col("word"),
            col("n_pieces").cast(LongType).as("_nb")), Seq("word"))
          .join(uni.select(col("word"),
            col("n_pieces").as("_nu")), Seq("word"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("_nb")).as("bpe_pieces"),
            sum(col("_nu")).as("uni_pieces"),
            sum(when(col("_nu") < col("_nb"), 1L).otherwise(0L))
              .as("n_uni_shorter"),
            sum(when(col("_nb") < col("_nu"), 1L).otherwise(0L))
              .as("n_bpe_shorter"))
          .withColumn("fert_bpe", col("bpe_pieces").cast(DoubleType) /
            col("n_words").cast(DoubleType))
          .withColumn("fert_uni", col("uni_pieces").cast(DoubleType) /
            col("n_words").cast(DoubleType))
          .orderBy(col("source"))
      },
      Some("""WITH b AS (
             |  SELECT word, n_pieces AS nb FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/bpe_pieces/*.parquet')),
             |u AS (
             |  SELECT word, n_pieces AS nu FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/unigram_pieces/*.parquet')),
             |toks0 AS (
             |  SELECT source,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS word
             |  FROM documents),
             |tk AS (SELECT source, word FROM toks0 WHERE length(word) > 0)
             |SELECT t.source, CAST(count(*) AS BIGINT) AS n_words,
             |  CAST(SUM(b.nb) AS BIGINT) AS bpe_pieces,
             |  CAST(SUM(u.nu) AS BIGINT) AS uni_pieces,
             |  CAST(SUM(CASE WHEN u.nu < b.nb THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_uni_shorter,
             |  CAST(SUM(CASE WHEN b.nb < u.nu THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_bpe_shorter,
             |  CAST(SUM(b.nb) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS fert_bpe,
             |  CAST(SUM(u.nu) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS fert_uni
             |FROM tk t JOIN b USING (word) JOIN u USING (word)
             |GROUP BY 1 ORDER BY t.source""".stripMargin)),

    // Unigram-LM MODEL ARTIFACT roundtrip (the text_nb_model_roundtrip
    // pattern for the third tokenizer tier): the staged (piece,
    // lp_micro) parquet IS the model interchange; this key encodes the
    // corpus through the RELOADED artifact (UnigramLmOps.loadModel —
    // driver reads the vocab-sized table once, zero fit jobs in the
    // query plan) and must reproduce the per-source totals the DuckDB
    // oracle re-derives from the same staged tables.
    "text_unigram_model_roundtrip" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val vocabSeq = unigramLmModels.computeIfAbsent(d,
          _ => UnigramLmOps.unigramFit(docs, "text", vocabSize = 120,
            maxPieceLen = 5, minCount = 3))
        val vocabDir = staged(d, "unigram_vocab") { dir =>
          vocabSeq.map { case (pc, lp) =>
            (pc, math.round(lp / UnigramLmOps.LogQuantum)) }
            .toDF("piece", "lp_micro")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val m = UnigramLmOps.loadModel(s, vocabDir)
        val pieces = UnigramLmOps.unigramWordPieces(docs, "text", m)
        // stage the word table here too — key execution order must not
        // matter, and the reloaded model reproduces the identical
        // micro-quantized scores, so whichever key stages first wins
        staged(d, "unigram_pieces") { dir =>
          pieces.coalesce(1).write.mode("overwrite").parquet(dir)
        }
        docs.select(col("source"),
            explode(TextOps.tokenize(col("text"))).as("word"))
          .filter(length(col("word")) > 0)
          .join(pieces.select(col("word"), col("n_pieces"),
            col("score_micro")), Seq("word"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_pieces")).as("total_pieces"),
            sum(col("score_micro")).as("total_score_micro"))
          .withColumn("fertility",
            col("total_pieces").cast(DoubleType) /
              col("n_words").cast(DoubleType))
          .orderBy(col("source"))
      },
      Some("""WITH enc AS (
             |  SELECT word, n_pieces, score_micro FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/unigram_pieces/*.parquet')),
             |toks0 AS (
             |  SELECT source,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS word
             |  FROM documents),
             |tk AS (SELECT source, word FROM toks0 WHERE length(word) > 0)
             |SELECT t.source, CAST(count(*) AS BIGINT) AS n_words,
             |  CAST(SUM(e.n_pieces) AS BIGINT) AS total_pieces,
             |  CAST(SUM(e.score_micro) AS BIGINT) AS total_score_micro,
             |  CAST(SUM(e.n_pieces) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS fertility
             |FROM tk t JOIN enc e USING (word)
             |GROUP BY 1 ORDER BY t.source""".stripMargin)),

    // WORDPIECE TOKENIZER (round 14, WordPieceOps — the BERT-family
    // greedy longest-match-first tier; vocab.txt interchange format),
    // completing the catalog's FOUR production tokenizer families
    // (word-BPE, byte-BPE, unigram-LM, WordPiece). Verification keeps
    // the unigram key's refutation discipline — greediness is checked,
    // never assumed, by two INDEPENDENT mechanisms that must both land
    // on zero for the hash to match: (a) Spark re-checks IN-PLAN (no
    // UDF) that every emitted piece is the longest vocab match at its
    // offset (WordPieceOps.longestMatchViolations: posexplode + window
    // offset + longer-candidate explode + semi join); (b) DuckDB
    // re-walks the greedy automaton per word from the STAGED VOCAB —
    // a best-edge table (argmax match length per position) driving a
    // recursive CTE, words whose walk strands short of the end being
    // [UNK] by the BERT convention — and counts words whose
    // (n_pieces, is_unk) disagree with the staged encode. Cover and
    // vocabulary-membership invariants are re-derived on both sides
    // too (continuation pieces always carry the ## prefix, so the
    // strip is positional: head verbatim, tail substr from 3).
    "text_wordpiece_encode" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        // vocab budget DELIBERATELY short of full-word merges (the
        // corpus vocabulary is small, and an unbounded budget merges
        // every word whole — fertility 1.0 proves nothing about the
        // greedy walk); serve-time input gets a deterministic word
        // with a char the corpus lacks ('§'), so the [UNK] convention
        // (whole word, one symbol) is exercised cross-engine, not
        // just unit-tested. The model fits on the CLEAN corpus — the
        // OOV is serve-time-only, as in production.
        val vocab = wordPieceModels.computeIfAbsent(d,
          _ => WordPieceOps.wordPieceFit(docs, "text", vocabSize = 70,
            minCount = 3))
        val m = WordPieceOps.Model(vocab)
        val docsX = docs.withColumn("text",
          concat(col("text"), lit(" qu§rz")))
        staged(d, "wp_vocab") { dir =>
          vocab.zipWithIndex.map { case (p, i) => (i.toLong, p) }
            .toDF("id", "piece")
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val pieces = WordPieceOps.wordPieceTokens(docsX, "text", m)
          .localCheckpoint() // model-sized; consumed by join + 3 checks
        staged(d, "wp_pieces") { dir =>
          pieces.coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val toks = docsX.select(col("source"),
            explode(TextOps.tokenize(col("text"))).as("word"))
          .filter(length(col("word")) > 0)
        val agg = toks
          .join(pieces.select(col("word"), col("n_pieces"), col("is_unk")),
            Seq("word"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_pieces")).as("total_pieces"),
            sum(col("is_unk").cast(LongType)).as("n_unk_words"))
        // (a) cover invariant: head piece verbatim + ##-stripped tail
        val rebuilt = concat(element_at(col("pieces"), 1),
          concat_ws("", transform(slice(col("pieces"), lit(2),
            greatest(size(col("pieces")) - 1, lit(0))),
            p => substring(p, 3, Int.MaxValue))))
        val chkCover = pieces.agg(
          sum(when(col("is_unk") === 0 && rebuilt =!= col("word"), 1L)
            .otherwise(0L)).as("n_cover_bad"))
        // (b) vocabulary membership of every emitted piece ([UNK] incl)
        val vocabDf = vocab.toDF("piece")
        val chkVocab = pieces
          .select(explode(col("pieces")).as("piece"))
          .join(broadcast(vocabDf), Seq("piece"), "left_anti")
          .agg(count(lit(1)).as("n_vocab_bad"))
        // (c) greediness, refuted in-plan (see WordPieceOps scaladoc)
        val chkGreedy = WordPieceOps.longestMatchViolations(
            pieces, vocabDf, m.maxPieceLen)
          .withColumnRenamed("n_greedy_viol", "n_greedy_bad")
        agg
          .withColumn("fertility",
            col("total_pieces").cast(DoubleType) /
              col("n_words").cast(DoubleType))
          .crossJoin(broadcast(chkCover))
          .crossJoin(broadcast(chkVocab))
          .crossJoin(broadcast(chkGreedy))
          .orderBy(col("source"))
      },
      Some("""WITH RECURSIVE
             |vocab AS (SELECT piece FROM read_parquet(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/wp_vocab/*.parquet')
             |  WHERE piece <> '[UNK]'),
             |enc AS (SELECT word, pieces, n_pieces, is_unk FROM read_parquet(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/wp_pieces/*.parquet')),
             |toks0 AS (
             |  SELECT source,
             |    unnest(regexp_split_to_array(lower(text || ' qu§rz'), '\s+'))
             |      AS word
             |  FROM documents),
             |tk AS (SELECT source, word FROM toks0 WHERE length(word) > 0),
             |agg AS (
             |  SELECT t.source, CAST(count(*) AS BIGINT) AS n_words,
             |    CAST(SUM(e.n_pieces) AS BIGINT) AS total_pieces,
             |    CAST(SUM(e.is_unk) AS BIGINT) AS n_unk_words
             |  FROM tk t JOIN enc e USING (word) GROUP BY 1),
             |cover AS (
             |  SELECT CAST(SUM(CASE WHEN is_unk = 0 AND
             |      pieces[1] || array_to_string(
             |        list_transform(pieces[2:], p -> substr(p, 3)), '')
             |      <> word THEN 1 ELSE 0 END) AS BIGINT) AS n_cover_bad
             |  FROM enc),
             |pl AS (SELECT unnest(pieces) AS piece FROM enc),
             |vb AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_vocab_bad FROM pl
             |  WHERE piece <> '[UNK]'
             |    AND piece NOT IN (SELECT piece FROM vocab)),
             |ml AS (SELECT MAX(length(CASE WHEN piece LIKE '##%'
             |    THEN substr(piece, 3) ELSE piece END)) AS ml FROM vocab),
             |w AS (SELECT DISTINCT word FROM enc),
             |pos AS (
             |  SELECT word, CAST(unnest(range(length(word))) AS INTEGER) AS i
             |  FROM w),
             |cand AS (
             |  SELECT p.word, p.i, CAST(l.len AS INTEGER) AS len
             |  FROM pos p
             |  CROSS JOIN (SELECT unnest(range(1, (SELECT ml FROM ml) + 1))
             |              AS len) l
             |  JOIN vocab v ON v.piece =
             |    (CASE WHEN p.i = 0 THEN '' ELSE '##' END) ||
             |    substr(p.word, p.i + 1, CAST(l.len AS INTEGER))
             |  WHERE p.i + l.len <= length(p.word)),
             |best AS (SELECT word, i, MAX(len) AS len FROM cand GROUP BY 1, 2),
             |walk AS (
             |  SELECT word, CAST(0 AS INTEGER) AS pos,
             |    CAST(0 AS BIGINT) AS np FROM w
             |  UNION ALL
             |  SELECT wk.word, wk.pos + b.len, wk.np + 1
             |  FROM walk wk JOIN best b ON b.word = wk.word AND b.i = wk.pos),
             |walked AS (
             |  SELECT word, MAX(CASE WHEN pos = length(word) THEN np END)
             |    AS np_done
             |  FROM walk GROUP BY 1),
             |greedy AS (
             |  SELECT word, COALESCE(np_done, 1) AS g_n,
             |    CASE WHEN np_done IS NULL THEN 1 ELSE 0 END AS g_unk
             |  FROM walked),
             |gbad AS (
             |  SELECT CAST(SUM(CASE WHEN e.n_pieces <> g.g_n
             |      OR e.is_unk <> g.g_unk THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_greedy_bad
             |  FROM enc e JOIN greedy g USING (word))
             |SELECT a.source, a.n_words, a.total_pieces, a.n_unk_words,
             |  CAST(a.total_pieces AS DOUBLE) / CAST(a.n_words AS DOUBLE)
             |    AS fertility,
             |  n_cover_bad, n_vocab_bad, n_greedy_bad
             |FROM agg a CROSS JOIN cover CROSS JOIN vb CROSS JOIN gbad
             |ORDER BY a.source""".stripMargin),
      allowBnlj = true),

    // WordPiece MODEL ARTIFACT roundtrip (the text_bpe_model_roundtrip
    // pattern for the fourth tokenizer tier): the model persists as a
    // standard vocab.txt (one piece per line, line number − 1 = id —
    // the format every BERT checkpoint ships), reloads to the
    // IDENTICAL ordered list (require'd in-key), and DuckDB
    // independently parses the written artifact byte-for-byte
    // (read_text + split on newline — no CSV dialect in the way, so
    // punctuation pieces can't be mangled by quote handling).
    "text_wordpiece_model_roundtrip" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val vocab = wordPieceModels.computeIfAbsent(d,
          _ => WordPieceOps.wordPieceFit(docs, "text", vocabSize = 70,
            minCount = 3))
        val dir = staged(d, "wp_vocab_txt") { p =>
          WordPieceOps.saveModel(s, vocab, p + "/vocab.txt")
        }
        val reloaded = WordPieceOps.loadModel(s, dir + "/vocab.txt")
        require(reloaded == vocab,
          "vocab.txt round trip must reproduce the trained vocabulary exactly")
        reloaded.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("id", "piece")
          .orderBy(col("id"))
      },
      Some("""WITH f AS (
             |  SELECT string_split(rtrim(content, chr(10)), chr(10)) AS parts
             |  FROM read_text(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/wp_vocab_txt/vocab.txt'))
             |SELECT CAST(t.i - 1 AS BIGINT) AS id,
             |  parts[CAST(t.i AS INTEGER)] AS piece
             |FROM f, unnest(range(1, len(parts) + 1)) AS t(i)
             |ORDER BY id""".stripMargin)),

    "text_bpe_byte_encode" -> QuerySpec(
      (s, d) => {
        val special = "<|endoftext|>"
        val docs = t(s, d, "documents").select(
          col("doc_id"), col("source"),
          concat(col("text"), lit(" café №42"), lit(special)).as("text"))
        val merges = byteBpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.byteBpeFit(docs, "text", numMerges = 32, minCount = 5,
            specialTokens = Seq(special)))
        val pieces = BpeOps.byteWordPieces(docs, "text", merges, Seq(special))
        staged(d, "byte_bpe_pieces") { dir =>
          pieces.select(col("chunk"), col("mapped"), col("pieces"),
              col("n_pieces"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val toks = docs.select(col("source"),
            explode(BpeOps.byteBpeChunks(
              BpeOps.stripSpecials(col("text"), Seq(special)))).as("chunk"))
          .filter(length(col("chunk")) > 0 && col("chunk").rlike("\\S"))
        val enc = toks
          .join(pieces.select(col("chunk"), col("n_pieces")), Seq("chunk"))
        val spec = docs.select(col("source"),
            ((length(col("text")) -
              length(replace(col("text"), lit(special), lit("")))) /
              lit(special.length)).cast(LongType).as("n_spec"))
          .groupBy(col("source")).agg(sum(col("n_spec")).as("n_specials"))
        val chk = pieces.agg(
          sum(when(concat_ws("", col("pieces")) =!= col("mapped"), 1L)
            .otherwise(0L)).as("n_rt_bad"),
          sum(when(length(col("mapped")) =!= octet_length(col("chunk")), 1L)
            .otherwise(0L)).as("n_map_bad"))
        enc.groupBy(col("source"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(octet_length(col("chunk")).cast(LongType)).as("total_bytes"),
            sum(col("n_pieces").cast(LongType)).as("total_pieces"))
          .join(spec, Seq("source"))
          .crossJoin(broadcast(chk))
          .withColumn("ok_roundtrip",
            (col("n_rt_bad") === 0).cast(IntegerType))
          .withColumn("ok_bytemap",
            (col("n_map_bad") === 0).cast(IntegerType))
          .withColumn("ok_compressed",
            (col("total_pieces") < col("total_bytes") &&
              col("total_pieces") >= col("n_chunks")).cast(IntegerType))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, source,
             |    text || ' café №42' || '<|endoftext|>' AS text
             |  FROM documents),
             |stripped AS (
             |  SELECT source, replace(text, '<|endoftext|>', ' ') AS ctext,
             |    (length(text) - length(replace(text, '<|endoftext|>', '')))
             |      // length('<|endoftext|>') AS n_spec
             |  FROM docs),
             |p AS (SELECT chunk, mapped, pieces, n_pieces FROM read_parquet(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/byte_bpe_pieces/*.parquet')),
             |toks AS (
             |  SELECT source, unnest(regexp_extract_all(ctext,
             |    '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\t\n\x0B\f\r \p{L}\p{N}]+|[\t\n\x0B\f\r ]+'))
             |    AS chunk
             |  FROM stripped),
             |tk AS (SELECT source, chunk FROM toks
             |       WHERE length(chunk) > 0 AND regexp_matches(chunk, '[^\t\n\x0B\f\r ]')),
             |enc AS (
             |  SELECT t.source, count(*) AS n_chunks,
             |    CAST(SUM(strlen(t.chunk)) AS BIGINT) AS total_bytes,
             |    CAST(SUM(p.n_pieces) AS BIGINT) AS total_pieces
             |  FROM tk t JOIN p USING (chunk) GROUP BY 1),
             |sp AS (SELECT source, CAST(SUM(n_spec) AS BIGINT) AS n_specials
             |       FROM stripped GROUP BY 1),
             |chk AS (
             |  SELECT CAST(SUM(CASE WHEN array_to_string(pieces, '') <> mapped
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_rt_bad,
             |    CAST(SUM(CASE WHEN length(mapped) <> strlen(chunk)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_map_bad
             |  FROM p)
             |SELECT e.source, n_chunks, total_bytes, total_pieces, n_specials,
             |  n_rt_bad, n_map_bad,
             |  CAST(n_rt_bad = 0 AS INTEGER) AS ok_roundtrip,
             |  CAST(n_map_bad = 0 AS INTEGER) AS ok_bytemap,
             |  CAST(total_pieces < total_bytes AND total_pieces >= n_chunks
             |    AS INTEGER) AS ok_compressed
             |FROM enc e JOIN sp USING (source) CROSS JOIN chk
             |ORDER BY source""".stripMargin),
      allowBnlj = true),

    // Byte-level packed token-ID sequences (BpeOps
    // .packSequenceIdsBytes): the byte tier completed to the
    // trainer-consumable artifact — per (source, bin) concatenated
    // byte-BPE input_ids with doc_ids/doc_offsets boundary metadata,
    // the text_pack_sequences_ids pipeline over the chunk stream
    // (special tokens stripped, leading-space chunks, byte-alphabet
    // piece vocabulary). Verified the same way: the packed arrays are
    // exploded back into the (source, bin, pos, doc_id, token_id)
    // stream with doc_id recovered FROM the offsets, while DuckDB
    // independently rebuilds chunking → staged pieces → dense vocab →
    // per-doc order → bins → concatenation from the raw tables.
    "text_bpe_byte_pack" -> QuerySpec(
      (s, d) => {
        val special = "<|endoftext|>"
        val docs = t(s, d, "documents").select(
          col("doc_id"), col("source"),
          concat(col("text"), lit(" café №42"), lit(special)).as("text"))
        val merges = byteBpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.byteBpeFit(docs, "text", numMerges = 32, minCount = 5,
            specialTokens = Seq(special)))
        val pieces = BpeOps.byteWordPieces(docs, "text", merges, Seq(special))
        staged(d, "byte_bpe_pieces") { dir =>
          pieces.select(col("chunk"), col("mapped"), col("pieces"),
              col("n_pieces"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val packed = BpeOps.packSequenceIdsBytes(
          docs, "doc_id", "text", "source", merges, budget = 2048L,
          specialTokens = Seq(special), precomputedPieces = Some(pieces))
        packed
          .select(col("source"), col("bin"), col("doc_ids"), col("doc_offsets"),
            posexplode(col("input_ids")).as(Seq("pos", "token_id")))
          .withColumn("doc_idx",
            size(filter(col("doc_offsets"), o => o <= col("pos"))) - 1)
          .withColumn("doc_id", element_at(col("doc_ids"), col("doc_idx") + 1))
          .select(col("source"), col("bin"), col("pos"), col("doc_id"),
            col("token_id"))
          .orderBy(col("source"), col("bin"), col("pos"))
      },
      Some("""WITH p AS (
             |  SELECT chunk AS word, pieces FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/byte_bpe_pieces/*.parquet')),
             |docs AS (
             |  SELECT doc_id, source,
             |    text || ' café №42' || '<|endoftext|>' AS text
             |  FROM documents),
             |stripped AS (
             |  SELECT doc_id, source,
             |    replace(text, '<|endoftext|>', ' ') AS ctext FROM docs),
             |words AS (
             |  SELECT doc_id, regexp_extract_all(ctext,
             |    '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\t\n\x0B\f\r \p{L}\p{N}]+|[\t\n\x0B\f\r ]+')
             |    AS ws
             |  FROM stripped),
             |toks0 AS (
             |  SELECT doc_id, unnest(ws) AS word,
             |         unnest(range(0, len(ws))) AS word_pos
             |  FROM words),
             |toks AS (SELECT * FROM toks0
             |         WHERE length(word) > 0 AND regexp_matches(word, '[^\t\n\x0B\f\r ]')),
             |ps AS (
             |  SELECT t.doc_id, t.word_pos, unnest(p.pieces) AS piece,
             |         unnest(range(0, len(p.pieces))) AS piece_pos
             |  FROM toks t JOIN p USING (word)),
             |vocab AS (
             |  SELECT piece,
             |    CAST(row_number() OVER (ORDER BY count(*) DESC, piece) - 1
             |      AS BIGINT) AS token_id
             |  FROM ps GROUP BY piece),
             |ids AS (
             |  SELECT ps.doc_id, ps.word_pos, ps.piece_pos, v.token_id
             |  FROM ps JOIN vocab v USING (piece)),
             |ndoc AS (SELECT doc_id, count(*) AS n_tok FROM ids GROUP BY doc_id),
             |binned AS (
             |  SELECT d.source, n.doc_id,
             |    CAST((SUM(n.n_tok) OVER (PARTITION BY d.source ORDER BY n.doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n.n_tok)
             |      // 2048 AS BIGINT) AS bin
             |  FROM ndoc n JOIN docs d USING (doc_id)),
             |stream AS (
             |  SELECT b.source, b.bin, i.doc_id, i.token_id,
             |    row_number() OVER (PARTITION BY b.source, b.bin
             |      ORDER BY i.doc_id, i.word_pos, i.piece_pos) - 1 AS pos
             |  FROM ids i JOIN binned b USING (doc_id))
             |SELECT source, bin, CAST(pos AS INTEGER) AS pos, doc_id,
             |  CAST(token_id AS BIGINT) AS token_id
             |FROM stream ORDER BY source, bin, pos""".stripMargin)),

    // Byte-level merges.txt interchange roundtrip — the byte tier's
    // model artifact through the SAME saveModel/loadModel seam: byte
    // symbols are whitespace-free BY CONSTRUCTION (space bytes map out
    // of the whitespace range — 0x20 → 'Ġ'), so the line format that
    // would corrupt on raw spaces round-trips byte-level models losslessly,
    // which is exactly why every production byte-BPE stack ships this
    // format. DuckDB parses the written artifact independently.
    "text_bpe_byte_model_roundtrip" -> QuerySpec(
      (s, d) => {
        val special = "<|endoftext|>"
        val docs = t(s, d, "documents").select(
          col("doc_id"), col("source"),
          concat(col("text"), lit(" café №42"), lit(special)).as("text"))
        val merges = byteBpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.byteBpeFit(docs, "text", numMerges = 32, minCount = 5,
            specialTokens = Seq(special)))
        val dir = staged(d, "byte_bpe_merges_txt") { p =>
          BpeOps.saveModel(s, merges, p + "/merges.txt")
        }
        val reloaded = BpeOps.loadModel(s, dir + "/merges.txt")
        require(reloaded == merges,
          "byte-level merges.txt round trip must reproduce the model exactly")
        import s.implicits._
        reloaded.zipWithIndex
          .map { case ((a, b), i) => (i + 1L, a, b) }
          .toDF("rank", "left_sym", "right_sym")
          .orderBy(col("rank"))
      },
      Some("""SELECT row_number() OVER () AS rank, left_sym, right_sym
             |FROM read_csv(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/byte_bpe_merges_txt/merges.txt',
             |  sep=' ', header=false, skip=1, parallel=false,
             |  columns={'left_sym':'VARCHAR','right_sym':'VARCHAR'})
             |ORDER BY rank""".stripMargin)),

    // Packing-efficiency profile over the bin assignment — the QA
    // aggregate tracked on the terminal packed artifact: per source,
    // bins used, capacity, underfill (padding the trainer eats),
    // overflow (straddler tokens beyond budget), max bin. All exact
    // integers (SampleOps.packEfficiency), so DuckDB's independent
    // rebuild of tokenization → counts → binning → rollup hash-matches.
    "text_pack_efficiency" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = bpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.bpeFit(docs, "text", numMerges = 24, minCount = 5))
        val pieces = BpeOps.wordPieces(docs, "text", merges)
        staged(d, "bpe_pieces") { dir =>
          pieces.select(col("word"), col("pieces"), col("n_pieces"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val enc = BpeOps.bpeEncode(docs, "doc_id", "text", pieces)
        val withSrc = docs.select(col("doc_id"), col("source"))
          .join(enc.select(col("doc_id"), col("n_bpe_tokens")), Seq("doc_id"))
        val binned = SampleOps.packSequences(withSrc, "source", "doc_id",
          "n_bpe_tokens", budget = 2048L)
        SampleOps.packEfficiency(binned, "source", "n_bpe_tokens", 2048L)
          .orderBy(col("source"))
      },
      Some("""WITH pieces AS (
             |  SELECT word, n_pieces FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/bpe_pieces/*.parquet')),
             |toks AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS word
             |  FROM documents),
             |enc AS (
             |  SELECT t.doc_id,
             |    SUM(COALESCE(p.n_pieces, length(t.word))) AS n_bpe_tokens
             |  FROM toks t LEFT JOIN pieces p USING (word)
             |  WHERE length(t.word) > 0 GROUP BY t.doc_id),
             |j AS (
             |  SELECT d.source, d.doc_id, e.n_bpe_tokens
             |  FROM documents d JOIN enc e USING (doc_id)),
             |c AS (
             |  SELECT source, doc_id, n_bpe_tokens,
             |    (SUM(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |     - n_bpe_tokens) // 2048 AS bin
             |  FROM j),
             |bins AS (
             |  SELECT source, bin, count(*) AS docs,
             |    CAST(sum(n_bpe_tokens) AS BIGINT) AS bin_cost
             |  FROM c GROUP BY 1, 2)
             |SELECT source,
             |  CAST(sum(docs) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_bins,
             |  CAST(sum(bin_cost) AS BIGINT) AS total_cost,
             |  CAST(count(*) * 2048 AS BIGINT) AS capacity,
             |  CAST(sum(greatest(0, 2048 - bin_cost)) AS BIGINT) AS underfill,
             |  CAST(sum(greatest(0, bin_cost - 2048)) AS BIGINT) AS overflow,
             |  CAST(max(bin_cost) AS BIGINT) AS max_bin_cost
             |FROM bins GROUP BY source ORDER BY source""".stripMargin)),

    // Packed token-ID sequences — the trainer-consumable artifact the
    // tokenize→pack chain previously stopped short of: per (source, bin)
    // the concatenated input_ids arrays with doc_ids/doc_offsets
    // boundary metadata (BpeOps.packSequenceIds). The key verifies the
    // ARTIFACT ITSELF: the packed arrays are exploded back into the
    // (source, bin, pos, doc_id, token_id) token stream — doc_id is
    // recovered FROM doc_offsets/doc_ids, so a wrong offset or a
    // misordered id fails the hash — while DuckDB independently rebuilds
    // tokenization, pieces (STAGED encoder table, the text_pack_bins_bpe
    // precedent), the dense piece vocabulary, per-doc id order, bin
    // assignment, and concatenation order from the raw tables. Scalar
    // rows rather than array columns so the driver's column-sorted
    // value hash applies unchanged.
    "text_pack_sequences_ids" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = bpeMergeModels.computeIfAbsent(d,
          _ => BpeOps.bpeFit(docs, "text", numMerges = 24, minCount = 5))
        val pieces = BpeOps.wordPieces(docs, "text", merges)
        staged(d, "bpe_pieces") { dir =>
          pieces.select(col("word"), col("pieces"), col("n_pieces"))
            .coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val packed = BpeOps.packSequenceIds(
          docs, "doc_id", "text", "source", merges, budget = 2048L,
          precomputedPieces = Some(pieces))
        packed
          .select(col("source"), col("bin"), col("doc_ids"), col("doc_offsets"),
            posexplode(col("input_ids")).as(Seq("pos", "token_id")))
          // recover each token's document from the boundary metadata:
          // doc_idx = #offsets ≤ pos − 1 (offsets are sorted starts)
          .withColumn("doc_idx",
            size(filter(col("doc_offsets"), o => o <= col("pos"))) - 1)
          .withColumn("doc_id", element_at(col("doc_ids"), col("doc_idx") + 1))
          .select(col("source"), col("bin"), col("pos"), col("doc_id"),
            col("token_id"))
          .orderBy(col("source"), col("bin"), col("pos"))
      },
      Some("""WITH p AS (
             |  SELECT word, pieces FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/bpe_pieces/*.parquet')),
             |words AS (
             |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
             |  FROM documents),
             |toks0 AS (
             |  SELECT doc_id, unnest(ws) AS word,
             |         unnest(range(0, len(ws))) AS word_pos
             |  FROM words),
             |toks AS (SELECT * FROM toks0 WHERE length(word) > 0),
             |ps AS (
             |  SELECT t.doc_id, t.word_pos, unnest(p.pieces) AS piece,
             |         unnest(range(0, len(p.pieces))) AS piece_pos
             |  FROM toks t JOIN p USING (word)),
             |vocab AS (
             |  SELECT piece,
             |    CAST(row_number() OVER (ORDER BY count(*) DESC, piece) - 1
             |      AS BIGINT) AS token_id
             |  FROM ps GROUP BY piece),
             |ids AS (
             |  SELECT ps.doc_id, ps.word_pos, ps.piece_pos, v.token_id
             |  FROM ps JOIN vocab v USING (piece)),
             |ndoc AS (SELECT doc_id, count(*) AS n_tok FROM ids GROUP BY doc_id),
             |binned AS (
             |  SELECT d.source, n.doc_id,
             |    CAST((SUM(n.n_tok) OVER (PARTITION BY d.source ORDER BY n.doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n.n_tok)
             |      // 2048 AS BIGINT) AS bin
             |  FROM ndoc n JOIN documents d USING (doc_id)),
             |stream AS (
             |  SELECT b.source, b.bin, i.doc_id, i.token_id,
             |    row_number() OVER (PARTITION BY b.source, b.bin
             |      ORDER BY i.doc_id, i.word_pos, i.piece_pos) - 1 AS pos
             |  FROM ids i JOIN binned b USING (doc_id))
             |SELECT source, bin, CAST(pos AS INTEGER) AS pos, doc_id,
             |  CAST(token_id AS BIGINT) AS token_id
             |FROM stream ORDER BY source, bin, pos""".stripMargin)),

    // Gopher-style composite quality rules (Rae et al. 2021 A1): per-doc
    // flags + AND'd keep. Integer counts and single IEEE divisions
    // throughout ⇒ fully ORACLED. On the current fixture (31-word
    // vocabulary containing exactly ONE Gopher stopword) the
    // AND'd keep is 0/500 — ok_stopwords (≥2 distinct) fails every
    // doc while ok_word_count varies 279/500; the per-flag columns
    // are the signal here. profile_agreement runs the same rater at
    // minStopwords=1 where it discriminates (r14 audit; an earlier
    // comment's '179/500 keep' described a pre-refresh fixture).
    "text_gopher_filter" -> QuerySpec(
      (s, d) => TextOps.gopherQualityFlags(t(s, d, "documents"), "text")
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("ok_word_count"), col("ok_mean_len"), col("ok_symbol_ratio"),
          col("ok_alpha_ratio"), col("ok_stopwords"), col("keep"))
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id, lower(text) AS lt,
             |    string_split(lower(text), ' ') AS w FROM documents),
             |feat AS (
             |  SELECT doc_id, len(w) AS n_words,
             |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_word_len,
             |    len(regexp_extract_all(lt, '#|\.\.\.')) AS n_symbol,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
             |    len(list_filter(['the','be','to','of','and','that','have','with'],
             |      s -> list_contains(w, s))) AS n_stop
             |  FROM base)
             |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
             |  CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) AS ok_word_count,
             |  CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INTEGER) AS ok_mean_len,
             |  CAST(CAST(n_symbol AS DOUBLE)/n_words <= 0.1 AS INTEGER) AS ok_symbol_ratio,
             |  CAST(CAST(n_alpha AS DOUBLE)/n_words >= 0.8 AS INTEGER) AS ok_alpha_ratio,
             |  CAST(n_stop >= 2 AS INTEGER) AS ok_stopwords,
             |  CAST(n_words >= 50 AND n_words <= 100000
             |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
             |   AND CAST(n_symbol AS DOUBLE)/n_words <= 0.1
             |   AND CAST(n_alpha AS DOUBLE)/n_words >= 0.8
             |   AND n_stop >= 2 AS INTEGER) AS keep
             |FROM feat ORDER BY doc_id""".stripMargin)),

    // Sliding-window chunking (sequence prep: 32-token windows, stride
    // 24 ⇒ 8-token overlap). Pure per-row transform+explode, zero
    // shuffle. Fully ORACLED including the chunk text.
    "text_chunk_windows" -> QuerySpec(
      (s, d) => TextOps.chunkWindows(
        t(s, d, "documents"), "doc_id", "text", win = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |nch AS (
             |  SELECT doc_id, w,
             |    greatest(0, CAST(ceil((len(w) - 32) / 24.0) AS BIGINT)) + 1 AS n
             |  FROM base),
             |chunks AS (
             |  SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_idx,
             |    array_to_string(w[(u.i*24+1):(u.i*24+32)], ' ') AS chunk_text
             |  FROM nch, UNNEST(range(0, n)) AS u(i))
             |SELECT doc_id, chunk_idx, chunk_text,
             |  CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens
             |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin)),

    // C4-style line-structure cleaning. The corpus is single-line
    // punctuation-free token text, so the key first BUILDS a multi-line
    // fixture deterministically (8-token lines; terminal '.' on lines
    // where (doc_id+i) % 3 != 0; boilerplate/brace planted on doc_id
    // multiples of 37/41), then applies the operator — and the oracle
    // restates BOTH the construction and the rules in DuckDB list
    // lambdas, so line retention, every doc-level flag, and the rebuilt
    // clean_text are all hash-compared. Zero shuffle end to end.
    "text_c4_filter" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toks, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        TextOps.c4QualityFlags(built, "text")
          .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
            col("has_lorem"), col("has_brace"), col("keep"), col("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |flags AS (
             |  SELECT doc_id, string_split(text, chr(10)) AS lines,
             |    list_filter(string_split(text, chr(10)),
             |      l -> regexp_matches(trim(l), '[.!?"]$')
             |           AND len(string_split_regex(trim(l), '\s+')) >= 5) AS kept,
             |    contains(lower(text), 'lorem ipsum') AS hl,
             |    contains(text, '{') AS hb
             |  FROM built)
             |SELECT doc_id,
             |  CAST(len(lines) AS BIGINT) AS n_lines,
             |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
             |  CAST(hl AS INTEGER) AS has_lorem,
             |  CAST(hb AS INTEGER) AS has_brace,
             |  CAST(NOT hl AND NOT hb AND len(kept) >= 3 AS INTEGER) AS keep,
             |  array_to_string(kept, chr(10)) AS clean_text
             |FROM flags ORDER BY doc_id""".stripMargin)),

    // HTML → main-content extraction (TextOps.htmlExtract), the crawl
    // front stage BEFORE the text-quality ladder. The corpus is plain
    // text, so the key first BUILDS a full page deterministically per
    // doc — head with title/style/script (braces and a '<' comparison
    // INSIDE the script, so any leak trips has_brace downstream), nav
    // chrome, a 3-word h1, 8-token <p> paragraphs (entities planted on
    // doc_id%5: &amp; and &lt;em&gt;, the latter decoding to a literal
    // '<em>' AFTER tag stripping — the escaping round trip), an HTML
    // comment with dense word content on doc_id%7 (tests comment
    // removal, not just tag removal), and two short footers. Extraction
    // + the density/promotion heuristic + the chained c4 quality flags
    // on the EXTRACTED text are all restated in DuckDB — line counts,
    // promotion decisions (h1 rescued by its dense neighbor, lone
    // footers dropped), entity decoding, and content_text hash-compare.
    "text_html_extract" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nP = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val paras = array_join(transform(sequence(lit(0), nP - 1), i =>
          concat(lit("<p>"), array_join(slice(toks, i * 8 + 1, lit(8)), " "),
            when(col("doc_id") % 5 === 0 && i === 0,
              lit(" &amp; more &lt;em&gt;")).otherwise(lit("")),
            lit(".</p>"))), "")
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            lit("<html><head><title>doc "), col("doc_id"), lit(" page</title>"),
            lit("<style>body { color: #000; }</style>"),
            lit("<script>var x = 1; if (x < 2) { x++; }</script>"),
            lit("</head><body>"),
            lit("<nav>Home About</nav>"),
            lit("<h1>Intro notes here</h1>"),
            paras,
            when(col("doc_id") % 7 === 0,
              lit("<!-- hidden comment with words words words words words -->"))
              .otherwise(lit("")),
            lit("<footer>copyright footer</footer>"),
            lit("<footer>end</footer>"),
            lit("</body></html>")).as("html"))
        val extracted = TextOps.htmlExtract(built, "html")
        TextOps.c4QualityFlags(extracted, "content_text")
          .select(col("doc_id"), col("n_raw_lines"), col("n_content_lines"),
            col("n_lines_kept"), col("has_brace"), col("keep"),
            col("content_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    '<html><head><title>doc ' || doc_id || ' page</title>' ||
             |    '<style>body { color: #000; }</style>' ||
             |    '<script>var x = 1; if (x < 2) { x++; }</script>' ||
             |    '</head><body>' ||
             |    '<nav>Home About</nav>' ||
             |    '<h1>Intro notes here</h1>' ||
             |    array_to_string(list_transform(
             |      range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |      i -> '<p>' || array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |           CASE WHEN doc_id % 5 = 0 AND i = 0
             |                THEN ' &amp; more &lt;em&gt;' ELSE '' END ||
             |           '.</p>'), '') ||
             |    CASE WHEN doc_id % 7 = 0
             |      THEN '<!-- hidden comment with words words words words words -->'
             |      ELSE '' END ||
             |    '<footer>copyright footer</footer>' ||
             |    '<footer>end</footer>' ||
             |    '</body></html>' AS html
             |  FROM base),
             |ex1 AS (
             |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
             |    '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
             |    '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
             |    '(?s)<!--.*?-->', ' ', 'g') AS h FROM built),
             |ex2 AS (
             |  SELECT doc_id, regexp_replace(h,
             |    '(?i)<(?:/?(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|header|footer|nav|title|head|body|html)\b[^>]*|br\s*/?)>',
             |    chr(10), 'g') AS h FROM ex1),
             |ex3 AS (
             |  SELECT doc_id, regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h
             |  FROM ex2),
             |ex4 AS (
             |  SELECT doc_id, replace(replace(replace(replace(replace(replace(h,
             |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             |    '&#39;', ''''), '&amp;', '&') AS h FROM ex3),
             |lined AS (
             |  SELECT doc_id,
             |    list_filter(list_transform(string_split(h, chr(10)),
             |      l -> trim(regexp_replace(l, '\s+', ' ', 'g'))),
             |      l -> length(l) > 0) AS lines
             |  FROM ex4),
             |dens AS (
             |  SELECT doc_id, lines,
             |    list_transform(lines, l -> len(string_split(l, ' ')) >= 5) AS dense
             |  FROM lined),
             |content AS (
             |  SELECT doc_id, lines,
             |    list_filter(lines, (l, i) ->
             |      dense[i] OR (i > 1 AND dense[i-1])
             |              OR (i < len(lines) AND dense[i+1])) AS kept
             |  FROM dens),
             |final AS (
             |  SELECT doc_id, len(lines) AS n_raw_lines,
             |    len(kept) AS n_content_lines,
             |    array_to_string(kept, chr(10)) AS content_text
             |  FROM content),
             |c4 AS (
             |  SELECT *,
             |    list_filter(string_split(content_text, chr(10)),
             |      l -> regexp_matches(trim(l), '[.!?"]$')
             |           AND len(string_split_regex(trim(l), '\s+')) >= 5) AS c4kept,
             |    contains(lower(content_text), 'lorem ipsum') AS hl,
             |    contains(content_text, '{') AS hb
             |  FROM final)
             |SELECT doc_id, CAST(n_raw_lines AS BIGINT) AS n_raw_lines,
             |  CAST(n_content_lines AS BIGINT) AS n_content_lines,
             |  CAST(len(c4kept) AS BIGINT) AS n_lines_kept,
             |  CAST(hb AS INTEGER) AS has_brace,
             |  CAST(NOT hl AND NOT hb AND len(c4kept) >= 3 AS INTEGER) AS keep,
             |  content_text
             |FROM c4 ORDER BY doc_id""".stripMargin)),

    // Intra-doc line dedup (boilerplate removal: keep the FIRST
    // occurrence of each line within its document, order preserved).
    // Multi-line fixture built like text_c4_filter's, with planted
    // repeats: every doc gets its first 8-token line re-appended, and
    // doc_id % 3 == 0 docs get it twice. Zero shuffle; oracle restates
    // the keep-first rule with DuckDB's indexed list_filter.
    "text_dedup_lines" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val firstLine = array_join(slice(toks, 1, 8), " ")
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")), "\n"),
            concat(lit("\n"), firstLine),
            when(col("doc_id") % 3 === 0, concat(lit("\n"), firstLine))
              .otherwise(lit(""))).as("text"))
        TextOps.dedupLinesWithinDoc(built, "text")
          .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
            col("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ')),
             |      chr(10))
             |    || chr(10) || array_to_string(toks[1:8], ' ')
             |    || CASE WHEN doc_id % 3 = 0
             |            THEN chr(10) || array_to_string(toks[1:8], ' ')
             |            ELSE '' END AS text
             |  FROM base),
             |dedup AS (
             |  SELECT doc_id, string_split(text, chr(10)) AS lines,
             |    list_filter(string_split(text, chr(10)),
             |      (l, i) -> list_position(string_split(text, chr(10)), l) = i) AS kept
             |  FROM built)
             |SELECT doc_id,
             |  CAST(len(lines) AS BIGINT) AS n_lines,
             |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
             |  array_to_string(kept, chr(10)) AS clean_text
             |FROM dedup ORDER BY doc_id""".stripMargin)),

    // LINEAR-scale twin of text_dedup_lines (explode → min-pos per
    // (doc, line) → positional rebuild; two shuffles instead of the
    // per-row O(lines²) scan — the straggler-safe form for crawl docs
    // with pathological line counts). Same fixture, same keep-first
    // contract, independently restated oracle: DuckDB computes min-pos
    // per line via a window instead of the indexed list_filter, so the
    // two keys cross-check each other's formulation.
    "text_dedup_lines_scalable" -> QuerySpec(
      (s, d) => {
        val toks = split(col("text"), " ")
        val nLines = ceil(size(toks).cast(DoubleType) / 8).cast(IntegerType)
        val firstLine = array_join(slice(toks, 1, 8), " ")
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")), "\n"),
            concat(lit("\n"), firstLine),
            when(col("doc_id") % 3 === 0, concat(lit("\n"), firstLine))
              .otherwise(lit(""))).as("text"))
        TextOps.dedupLinesWithinDocScalable(built, "doc_id", "text")
          .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
            col("clean_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ')),
             |      chr(10))
             |    || chr(10) || array_to_string(toks[1:8], ' ')
             |    || CASE WHEN doc_id % 3 = 0
             |            THEN chr(10) || array_to_string(toks[1:8], ' ')
             |            ELSE '' END AS text
             |  FROM base),
             |exploded AS (
             |  SELECT doc_id, unnest(lines) AS line,
             |    unnest(range(1, len(lines) + 1)) AS pos,
             |    len(lines) AS n_lines
             |  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines
             |        FROM built)),
             |firsts AS (
             |  SELECT doc_id, line, min(pos) AS pos, any_value(n_lines) AS n_lines
             |  FROM exploded GROUP BY doc_id, line)
             |SELECT doc_id,
             |  CAST(any_value(n_lines) AS BIGINT) AS n_lines,
             |  CAST(count(*) AS BIGINT) AS n_lines_kept,
             |  array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text
             |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Unigram LM quality scoring (the perplexity-filter seam): per-doc
    // mean negative log-prob of its tokens under the corpus unigram
    // distribution, additive smoothing 0.5. Fully ORACLED — per-token
    // ln() casts to DECIMAL(20,9) before the per-doc sum, so the
    // statistic is order-independent and the engines' libm disagreement
    // (≤1 ulp) is rounded away; the mean divides once at the end.
    "text_unigram_logprob" -> QuerySpec(
      (s, d) => TextOps.unigramLogProb(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("mean_neg_logprob"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
             |  FROM documents),
             |toks2 AS (SELECT * FROM toks WHERE length(tok) > 0),
             |vocab AS (SELECT tok, count(*) AS c FROM toks2 GROUP BY tok),
             |tot AS (SELECT sum(c) AS t, count(*) AS v FROM vocab),
             |lp AS (
             |  SELECT tok,
             |    CAST(ln((c + 0.5) / (t + 0.5 * v)) AS DECIMAL(20,9)) AS lp
             |  FROM vocab, tot)
             |SELECT doc_id,
             |  count(*) AS n_tokens,
             |  round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS mean_neg_logprob
             |FROM toks2 JOIN lp USING (tok)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      allowBnlj = true),

    // Bigram LM with stupid backoff (Brants et al. 2007) — the
    // context-aware upgrade of text_unigram_logprob: fit on the EVEN
    // docs, score ALL docs, so odd docs exercise every resolution tier
    // (seen bigram → ML row; unseen bigram, seen word → α-scaled
    // unigram backoff; OOV word → OOV row). Log-probs quantized
    // DECIMAL(20,9) once at fit ⇒ per-doc sums are exact decimal adds
    // ⇒ fully oracled; n_backoff (pairs that missed the bigram table)
    // is the exact-integer coverage diagnostic. DuckDB rebuilds pairs
    // via list_zip with a chr(1) BOS (the NULL-padded tail pair is
    // filtered on both engines), counts, both smoothing formulas with
    // the same IEEE op order, and the three-way coalesce.
    "text_bigram_logprob" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val model = TextOps.bigramLmFit(
          docs.filter(col("doc_id") % 2 === 0), "text")
        TextOps.bigramScoreWith(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_tokens"), col("n_backoff"),
            col("mean_neg_logprob"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH lab AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(lower(text), '\s+'),
             |    t -> length(t) > 0) AS l
             |  FROM documents),
             |ne AS (SELECT doc_id, l FROM lab WHERE len(l) > 0),
             |pz AS (
             |  SELECT doc_id, unnest(list_zip(
             |    list_concat([chr(1)], l[1:len(l)-1]), l)) AS z
             |  FROM ne),
             |pairs AS (
             |  SELECT doc_id, z[1] AS prev, z[2] AS w
             |  FROM pz WHERE z[2] IS NOT NULL),
             |fit AS (SELECT * FROM pairs WHERE doc_id % 2 = 0),
             |cb AS (SELECT prev, w, count(*) AS cb FROM fit GROUP BY 1, 2),
             |cp AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp
             |       FROM cb GROUP BY 1),
             |blp AS (
             |  SELECT cb.prev, cb.w,
             |    CAST(ln(CAST(cb.cb AS DOUBLE) / cp.cp) AS DECIMAL(20,9)) AS lp
             |  FROM cb JOIN cp ON cp.prev = cb.prev),
             |uni AS (SELECT w, count(*) AS cnt FROM fit GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
             |               count(*) AS v FROM uni),
             |ulp AS (
             |  SELECT w, CAST(ln((CAST(0.4 AS DOUBLE) * (cnt + CAST(0.5 AS DOUBLE))) /
             |    (total + CAST(0.5 AS DOUBLE) * v)) AS DECIMAL(20,9)) AS lp
             |  FROM uni CROSS JOIN tot),
             |olp AS (
             |  SELECT CAST(ln((CAST(0.4 AS DOUBLE) * CAST(0.5 AS DOUBLE)) /
             |    (total + CAST(0.5 AS DOUBLE) * v)) AS DECIMAL(20,9)) AS lp
             |  FROM tot),
             |sc AS (
             |  SELECT p.doc_id,
             |    coalesce(blp.lp, ulp.lp, olp.lp) AS plp,
             |    CASE WHEN blp.lp IS NULL THEN 1 ELSE 0 END AS miss
             |  FROM pairs p
             |  LEFT JOIN blp ON blp.prev = p.prev AND blp.w = p.w
             |  LEFT JOIN ulp ON ulp.w = p.w
             |  CROSS JOIN olp)
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(sum(miss) AS BIGINT) AS n_backoff,
             |  round(-CAST(sum(plp) AS DOUBLE) / count(*), 6) AS mean_neg_logprob
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      allowBnlj = true),

    // INTERPOLATED KNESER-NEY bigram LM (TextOps.knBigramFit, Kneser &
    // Ney 1995 / Chen & Goodman 1998) — the standard n-gram smoothing
    // (the KenLM default) beside text_bigram_logprob's stupid backoff:
    // unseen bigrams back off to the CONTINUATION probability
    // N1+(·w)/T (how many distinct contexts w follows), not the raw
    // frequency — the 'Francisco' fix: frequent-but-context-bound
    // words score implausible in novel contexts. Same fit-on-even /
    // score-all split so odd docs exercise every tier: seen bigram →
    // interpolated row; unseen pair with seen context and word →
    // λ(v)·p_cont(w) as the EXACT DECIMAL ADD of two quantized logs
    // (no new transcendental at score time); unseen context →
    // p_cont(w); OOV word → the D/T floor. D = 0.75 exactly binary;
    // every probability ONE fixed IEEE chain; ln quantized
    // DECIMAL(20,9) once per vocab-grain row, the oracle through the
    // VARCHAR bridge. n_backoff/n_oov are the coverage diagnostics.
    "text_kn_bigram" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        // fit-once/serve-many: text_ccnet_split scores through the SAME
        // even-split KN model — memoized (memoModel), hashes unchanged
        val model = memoModel(s, d, "kn_even")(TextOps.knBigramFit(
          docs.filter(col("doc_id") % 2 === 0), "text"))
        TextOps.knBigramScoreWith(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_tokens"), col("n_backoff"),
            col("n_oov"), col("mean_neg_logprob"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH lab AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(lower(text), '\s+'),
             |    t -> length(t) > 0) AS l
             |  FROM documents),
             |ne AS (SELECT doc_id, l FROM lab WHERE len(l) > 0),
             |pz AS (
             |  SELECT doc_id, unnest(list_zip(
             |    list_concat([chr(1)], l[1:len(l)-1]), l)) AS z
             |  FROM ne),
             |pairs AS (
             |  SELECT doc_id, z[1] AS prev, z[2] AS w
             |  FROM pz WHERE z[2] IS NOT NULL),
             |fit AS (SELECT * FROM pairs WHERE doc_id % 2 = 0),
             |cb AS (SELECT prev, w, count(*) AS cb FROM fit GROUP BY 1, 2),
             |cp AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp,
             |         CAST(count(*) AS BIGINT) AS n1p
             |       FROM cb GROUP BY 1),
             |n1c AS (SELECT w, CAST(count(*) AS BIGINT) AS n1c
             |        FROM cb GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cb),
             |blp AS (
             |  SELECT cb.prev, cb.w,
             |    CAST(CAST(ln(
             |      (cb.cb - CAST(0.75 AS DOUBLE)) / cp.cp +
             |      ((CAST(0.75 AS DOUBLE) * cp.n1p) / cp.cp) *
             |        (n1c.n1c / tot.t)) AS VARCHAR) AS DECIMAL(20,9)) AS lp
             |  FROM cb
             |  JOIN cp ON cp.prev = cb.prev
             |  JOIN n1c ON n1c.w = cb.w
             |  CROSS JOIN tot),
             |klam AS (
             |  SELECT prev, CAST(CAST(ln(
             |      (CAST(0.75 AS DOUBLE) * n1p) / cp) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM cp),
             |kcont AS (
             |  SELECT w, CAST(CAST(ln(n1c.n1c / tot.t) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM n1c CROSS JOIN tot),
             |kolp AS (
             |  SELECT CAST(CAST(ln(CAST(0.75 AS DOUBLE) / t) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM tot),
             |sc AS (
             |  SELECT p.doc_id,
             |    coalesce(blp.lp, klam.lp + kcont.lp, kcont.lp, kolp.lp) AS plp,
             |    CASE WHEN blp.lp IS NULL THEN 1 ELSE 0 END AS miss,
             |    CASE WHEN kcont.lp IS NULL THEN 1 ELSE 0 END AS oovf
             |  FROM pairs p
             |  LEFT JOIN blp ON blp.prev = p.prev AND blp.w = p.w
             |  LEFT JOIN klam ON klam.prev = p.prev
             |  LEFT JOIN kcont ON kcont.w = p.w
             |  CROSS JOIN kolp)
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(sum(miss) AS BIGINT) AS n_backoff,
             |  CAST(sum(oovf) AS BIGINT) AS n_oov,
             |  round(-CAST(sum(plp) AS DOUBLE) / count(*), 6) AS mean_neg_logprob
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      allowBnlj = true),

    // CCNet perplexity split (Wenzek et al. 2020, TextOps.ccnetSplit):
    // the head / middle / tail TERCILES by the frozen KN bigram LM's
    // per-doc mean negative log-prob — the routing decision the CCNet
    // pipeline makes on every shard (keep head, re-filter tail). The
    // terciles are exact integer rank·3 div N cuts over the
    // (score, doc_id) total order (the curriculumSample contract);
    // the score lands on the 1e-6 grid upstream so bucket means are
    // exact-decimal sums with ONE division. The oracle re-derives the
    // whole chain: KN fit, per-doc scores, the rank window, and the
    // integer buckets.
    "text_ccnet_split" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        // the shared memoized even-split KN model (see text_kn_bigram)
        val model = memoModel(s, d, "kn_even")(TextOps.knBigramFit(
          docs.filter(col("doc_id") % 2 === 0), "text"))
        val scored = TextOps.knBigramScoreWith(docs, "doc_id", "text", model)
        TextOps.ccnetSplit(scored, "doc_id", "mean_neg_logprob", "n_tokens")
      },
      Some("""WITH lab AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(lower(text), '\s+'),
             |    t -> length(t) > 0) AS l
             |  FROM documents),
             |ne AS (SELECT doc_id, l FROM lab WHERE len(l) > 0),
             |pz AS (
             |  SELECT doc_id, unnest(list_zip(
             |    list_concat([chr(1)], l[1:len(l)-1]), l)) AS z
             |  FROM ne),
             |pairs AS (
             |  SELECT doc_id, z[1] AS prev, z[2] AS w
             |  FROM pz WHERE z[2] IS NOT NULL),
             |fit AS (SELECT * FROM pairs WHERE doc_id % 2 = 0),
             |cb AS (SELECT prev, w, count(*) AS cb FROM fit GROUP BY 1, 2),
             |cp AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp,
             |         CAST(count(*) AS BIGINT) AS n1p
             |       FROM cb GROUP BY 1),
             |n1c AS (SELECT w, CAST(count(*) AS BIGINT) AS n1c
             |        FROM cb GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cb),
             |blp AS (
             |  SELECT cb.prev, cb.w,
             |    CAST(CAST(ln(
             |      (cb.cb - CAST(0.75 AS DOUBLE)) / cp.cp +
             |      ((CAST(0.75 AS DOUBLE) * cp.n1p) / cp.cp) *
             |        (n1c.n1c / tot.t)) AS VARCHAR) AS DECIMAL(20,9)) AS lp
             |  FROM cb
             |  JOIN cp ON cp.prev = cb.prev
             |  JOIN n1c ON n1c.w = cb.w
             |  CROSS JOIN tot),
             |klam AS (
             |  SELECT prev, CAST(CAST(ln(
             |      (CAST(0.75 AS DOUBLE) * n1p) / cp) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM cp),
             |kcont AS (
             |  SELECT w, CAST(CAST(ln(n1c.n1c / tot.t) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM n1c CROSS JOIN tot),
             |kolp AS (
             |  SELECT CAST(CAST(ln(CAST(0.75 AS DOUBLE) / t) AS VARCHAR)
             |    AS DECIMAL(20,9)) AS lp
             |  FROM tot),
             |sc AS (
             |  SELECT p.doc_id,
             |    coalesce(blp.lp, klam.lp + kcont.lp, kcont.lp, kolp.lp) AS plp
             |  FROM pairs p
             |  LEFT JOIN blp ON blp.prev = p.prev AND blp.w = p.w
             |  LEFT JOIN klam ON klam.prev = p.prev
             |  LEFT JOIN kcont ON kcont.w = p.w
             |  CROSS JOIN kolp),
             |perdoc AS (
             |  SELECT doc_id, count(*) AS n_tokens,
             |    round(-CAST(sum(plp) AS DOUBLE) / count(*), 6) AS mnl
             |  FROM sc GROUP BY doc_id),
             |r AS (
             |  SELECT doc_id, n_tokens, mnl,
             |    row_number() OVER (ORDER BY mnl, doc_id) - 1 AS rk,
             |    count(*) OVER () AS n
             |  FROM perdoc),
             |b AS (
             |  SELECT CAST((rk * 3) // n AS INTEGER) AS bucket_idx,
             |    CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |    SUM(CAST(CAST(mnl AS VARCHAR) AS DECIMAL(12,6))) AS s,
             |    min(mnl) AS min_nll, max(mnl) AS max_nll
             |  FROM r GROUP BY 1)
             |SELECT CASE bucket_idx WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
             |         ELSE 'tail' END AS bucket,
             |  bucket_idx, n_docs, n_tokens,
             |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_docs AS DOUBLE)
             |    AS mean_nll,
             |  min_nll, max_nll
             |FROM b ORDER BY bucket_idx""".stripMargin),
      allowBnlj = true),

    // Stratified sampling (training-mix rebalancing): per-stratum seeded
    // Bernoulli. Runs the portable-LCG variant so the key is FULLY
    // ORACLED — every keep decision is restated in DuckDB integer
    // arithmetic and the coin flips compare bit-for-bit, the same tier
    // upgrade sample_weighted got. The native sampleBy variant's
    // fraction bounds + determinism stay unit-tested (SampleOpsSpec).
    "sample_stratified" -> QuerySpec(
      (s, d) => SampleOps.stratifiedSamplePortable(
        t(s, d, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.25, "zh" -> 0.1))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE CAST(((doc_id + 42) * 1103515245 + 12345) % 2147483648
             |           AS DOUBLE) / 2147483648.0
             |      < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
             |                  WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.25
             |                  WHEN 'zh' THEN 0.1 END
             |ORDER BY doc_id""".stripMargin)),

    // Quality-curriculum subsetting: rank by a quality score, cut into
    // equal-population rank buckets (exact integer rank·k div N — no
    // value-quantile edges whose cross-engine ulp could flip a
    // membership), keep per-bucket fractions via the portable LCG.
    // Fully oracled: DuckDB restates the ranking window, the integer
    // bucket arithmetic, and the bit-exact coin flips.
    "sample_curriculum" -> QuerySpec(
      (s, d) => SampleOps.curriculumSample(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", "doc_id", fractions = Seq(0.1, 0.25, 0.5, 1.0))
        .orderBy(col("doc_id")),
      Some("""WITH r AS (
             |  SELECT doc_id, n_chars,
             |    row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS rank,
             |    count(*) OVER () AS n
             |  FROM documents)
             |SELECT doc_id, n_chars, CAST((rank * 4) // n AS BIGINT) AS quality_bucket
             |FROM r
             |WHERE CAST(((doc_id + 42) * 1103515245 + 12345) % 2147483648
             |           AS DOUBLE) / 2147483648.0
             |      < CASE (rank * 4) // n WHEN 0 THEN 0.1 WHEN 1 THEN 0.25
             |                            WHEN 2 THEN 0.5 ELSE 1.0 END
             |ORDER BY doc_id""".stripMargin),
      allowBnlj = true),

    // Gumbel-top-k weighted sampling WITHOUT replacement (SampleOps
    // .gumbelTopK, Efraimidis & Spirakis 2006) — the principled
    // stochastic alternative to deterministic top-k curation: the k
    // largest ln(w)+Gumbel(u) keys ARE a weight-proportional sample
    // without replacement. u comes from the portable LCG shifted +0.5
    // (strictly inside (0,1) — u = 0 would blow up the double log);
    // BOTH transcendental terms quantize ONCE to DECIMAL(20,9) so the
    // ranking key is an exact decimal sum — the oracle re-derives
    // every draw bit-for-bit (its quantizing casts bridge through
    // VARCHAR, the ts_backtest rule).
    "sample_gumbel_topk" -> QuerySpec(
      (s, d) => SampleOps.gumbelTopK(
        t(s, d, "documents"), "doc_id", "n_chars", k = 100, seed = 7L),
      Some("""WITH g AS (
             |  SELECT doc_id, n_chars,
             |    CAST(CAST(ln(CAST(n_chars AS DOUBLE)) AS VARCHAR)
             |      AS DECIMAL(20,9)) +
             |    CAST(CAST(-ln(-ln(
             |      (((doc_id + 7) * 1103515245 + 12345) % 2147483648 + 0.5)
             |        / 2147483648.0)) AS VARCHAR) AS DECIMAL(20,9)) AS gkey
             |  FROM documents),
             |top AS (SELECT * FROM g ORDER BY gkey DESC, doc_id LIMIT 100)
             |SELECT CAST(row_number() OVER (ORDER BY gkey DESC, doc_id)
             |    AS INTEGER) AS rank,
             |  doc_id, n_chars, CAST(gkey AS DOUBLE) AS gumbel_key
             |FROM top ORDER BY rank""".stripMargin)),

    // Per-row weighted Bernoulli sample (keep probability = a per-doc
    // quality proxy, here length-derived). Runs the portableHash variant
    // so the key is FULLY ORACLED: the 31-bit LCG keep decision is
    // restated in DuckDB integer arithmetic and even the coin flips
    // compare bit-for-bit (length() counts code points in both engines).
    // The default xxhash64 variant's fraction/subset/determinism
    // properties are unit-tested (SampleOpsSpec).
    "sample_weighted" -> QuerySpec(
      (s, d) => SampleOps.weightedSample(
        t(s, d, "documents")
          .withColumn("w", least(lit(1.0), length(col("text")) / lit(400.0))),
        "doc_id", "w", portableHash = true)
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM documents
             |WHERE CAST(((doc_id + 42) * 1103515245 + 12345) % 2147483648
             |           AS DOUBLE) / 2147483648.0
             |      < LEAST(1.0, LENGTH(text) / 400.0)
             |ORDER BY doc_id""".stripMargin)),

    // Popularity-smoothed negative sampling
    // (SampleOps.popularityNegatives): k word2vec-style negatives per
    // customer from the part-popularity unigram distribution ^0.75.
    // The 3/4 power is the fixed sqrt(sqrt(c³)) sequence (two
    // correctly-rounded IEEE roots — libm pow's last ulp is
    // platform-defined, nested sqrt is not), quantized to an integer
    // CDF; draws invert it at the portable LCG coin. Spark probes the
    // CDF as a broadcast sorted-array prefix count (no range join, no
    // BNLJ); the oracle restates it as an interval join — same integer
    // intervals, same rows.
    "sample_negatives_popularity" -> QuerySpec(
      (s, d) => {
        val items = t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("item"))
          .agg(count(lit(1)).as("cnt"))
        SampleOps.popularityNegatives(
          t(s, d, "customer").select(col("c_custkey")), "c_custkey",
          items, "item", "cnt", k = 4)
          .orderBy(col("c_custkey"), col("draw"))
      },
      Some("""WITH pop AS (
             |  SELECT l_partkey AS item, count(*) AS c
             |  FROM lineitem GROUP BY 1),
             |wq AS (
             |  SELECT item,
             |    CAST(FLOOR(sqrt(sqrt(CAST(c*c*c AS DOUBLE))) * 1000.0)
             |      AS BIGINT) AS w
             |  FROM pop WHERE c > 0 AND item IS NOT NULL),
             |cum AS (
             |  SELECT item, w,
             |    COALESCE(SUM(w) OVER (ORDER BY item
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS lo
             |  FROM wq),
             |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wq),
             |draws AS (
             |  SELECT c_custkey, CAST(j AS BIGINT) AS draw,
             |    CAST(FLOOR(
             |      CAST(((c_custkey * 4 + j + 42) * 1103515245 + 12345)
             |             % 2147483648 AS DOUBLE) / 2147483648.0
             |      * CAST(tw AS DOUBLE)) AS BIGINT) AS target
             |  FROM customer
             |  CROSS JOIN tot
             |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS j))
             |SELECT d.c_custkey, d.draw, c.item
             |FROM draws d
             |JOIN cum c ON d.target >= c.lo AND d.target < c.lo + c.w
             |ORDER BY d.c_custkey, d.draw""".stripMargin),
      allowBnlj = true),

    // Training-mix resampling to target per-source proportions. Fully
    // ORACLED — unlike the two keys above — because the keep decision
    // uses the portable 31-bit LCG hash (SampleOps.portableUniform) that
    // DuckDB evaluates bit-identically in integer arithmetic, so even
    // the Bernoulli coin flips are cross-engine exact. de binds the mix
    // (70/0.3 is the smallest n/p); es/fr are absent from the targets
    // and must be dropped.
    "sample_mix_to_target" -> QuerySpec(
      (s, d) => SampleOps.mixToTarget(
        t(s, d, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some("""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
             |tgt(lang, p) AS (VALUES ('en', 0.5), ('de', 0.3), ('zh', 0.2)),
             |joined AS (
             |  SELECT c.lang, CAST(c.n AS DOUBLE) AS n, CAST(t.p AS DOUBLE) AS p,
             |    CAST(c.n AS DOUBLE) / CAST(t.p AS DOUBLE) AS t_s
             |  FROM counts c JOIN tgt t ON c.lang = t.lang),
             |fr AS (
             |  SELECT lang, LEAST(1.0, (SELECT min(t_s) FROM joined) * p / n) AS f
             |  FROM joined)
             |SELECT d.doc_id, d.lang
             |FROM documents d JOIN fr ON d.lang = fr.lang
             |WHERE CAST((d.doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |        / 2147483648.0 < fr.f
             |ORDER BY d.doc_id""".stripMargin)),

    // Temperature resampling (kept counts ∝ n^alpha, alpha = 0.5): the
    // data-derived rebalancing rule, vs mix_to_target's explicit
    // targets. en (3× the tail) thins to f = (n_en/n_min)^-0.5 ≈ 0.57
    // while the smallest lang keeps 1.0. FULLY ORACLED: counts, the
    // pow(), and every portable-LCG coin flip restate in DuckDB.
    "sample_temperature" -> QuerySpec(
      (s, d) => SampleOps.temperatureSample(
        t(s, d, "documents"), "lang", "doc_id", alpha = 0.5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some("""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
             |fr AS (
             |  SELECT lang,
             |    pow(CAST(n AS DOUBLE) / (SELECT min(n) FROM counts), -0.5) AS f
             |  FROM counts)
             |SELECT d.doc_id, d.lang
             |FROM documents d JOIN fr USING (lang)
             |WHERE CAST((d.doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |        / 2147483648.0 < fr.f
             |ORDER BY d.doc_id""".stripMargin)),

    // Benchmark decontamination: per-doc count of distinct bigrams shared
    // with a held-out "benchmark" slice (doc_id < 50 stands in for the
    // eval set). The benchmark shingle set broadcasts; only matching
    // shingles ever shuffle. Inner join in the oracle ≡ the engine's
    // semi-join + count because the benchmark token set is DISTINCT.
    "dedup_decontaminate" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        DedupOps.decontaminate(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
          "doc_id", "text", shingleN = 2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH bw AS (
             |  SELECT string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 50),
             |btok AS (
             |  SELECT DISTINCT unnest(
             |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
             |         ELSE [w[i] || ' ' || w[i+1]
             |               for i in range(1, len(w))] END) AS tok FROM bw),
             |cw AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id >= 50),
             |ctok AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
             |         ELSE [w[i] || ' ' || w[i+1]
             |               for i in range(1, len(w))] END)) AS tok FROM cw)
             |SELECT c.doc_id, count(*) AS n_overlap
             |FROM ctok c JOIN btok b ON c.tok = b.tok
             |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)),

    // Soft contamination scoring (DedupOps.contaminationScore): the
    // graded companion to dedup_decontaminate — EVERY corpus doc gets
    // its benchmark-overlap FRACTION and a flagged bit (the GPT-3-style
    // n-gram decontamination policy), not just a hit count for
    // contaminated docs. 3-gram shingles at threshold 0.12 flag the
    // top quartile of this corpus at BOTH SFs (measured: median ~0.09,
    // p95 ~0.18 — 2-grams saturate to 100% flagged on template-built
    // synthetic text, a non-discriminating gate). Exact integers + one
    // raw IEEE division ⇒ fully oracled; the exploded gram stream
    // still semi-joins the broadcast benchmark set, so the shuffle
    // stays contamination-proportional.
    "dedup_contamination_score" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        DedupOps.contaminationScore(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
          "doc_id", "text", shingleN = 3, flagThreshold = 0.12)
          .orderBy(col("doc_id"))
      },
      Some("""WITH bw AS (
             |  SELECT string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 50),
             |btok AS (
             |  SELECT DISTINCT unnest(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |         ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |               for i in range(1, len(w) - 1)] END) AS tok FROM bw),
             |cw AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id >= 50),
             |cg AS (
             |  SELECT doc_id, list_distinct(
             |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |         ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |               for i in range(1, len(w) - 1)] END) AS g FROM cw),
             |hits AS (
             |  SELECT c.doc_id, count(*) AS n_overlap
             |  FROM (SELECT doc_id, unnest(g) AS tok FROM cg) c
             |  JOIN btok b ON b.tok = c.tok
             |  GROUP BY c.doc_id)
             |SELECT cg.doc_id, CAST(len(g) AS BIGINT) AS n_grams,
             |  CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
             |  CASE WHEN len(g) = 0 THEN CAST(0.0 AS DOUBLE)
             |       ELSE CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / len(g)
             |  END AS contamination,
             |  CAST(CASE WHEN (CASE WHEN len(g) = 0 THEN CAST(0.0 AS DOUBLE)
             |       ELSE CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / len(g) END)
             |       >= CAST(0.12 AS DOUBLE) THEN 1 ELSE 0 END AS INTEGER)
             |    AS flagged
             |FROM cg LEFT JOIN hits h ON h.doc_id = cg.doc_id
             |ORDER BY cg.doc_id""".stripMargin)),

    // Deterministic split assignment (train/val/test) via the portable
    // LCG hash — fully oracled including every per-row assignment. Keyed
    // by doc_id here for the oracle; production keys by the dedup
    // cluster id (leakage guard — see SampleOps.assignSplits doc and the
    // cluster-consistency unit).
    "sample_split_assign" -> QuerySpec(
      (s, d) => SampleOps.assignSplits(
        t(s, d, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CASE WHEN u < 0.8 THEN 'train'
             |       WHEN u < 0.9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        CAST((doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |          / 2147483648.0 AS u
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // K-fold cross-validation assignment (round 14) — the CV primitive
    // completing the split family (random holdout / temporal-purged /
    // cluster-guarded / k-fold): fold = equal-width cut of the portable
    // LCG draw (u·k div 2³¹ in INTEGER arithmetic — never a float
    // compare chain whose boundary could flip cross-engine), so every
    // assignment replays bit-exactly in the oracle and a row's fold is
    // stable under any repartitioning or corpus growth (id-keyed, not
    // rank-keyed — appending documents never reshuffles folds, the
    // property rank-based cuts lack). Per-fold counts ride along via
    // one grain aggregation; the ±3σ balance bound is checked in-query.
    "sample_kfold" -> QuerySpec(
      (s, d) => {
        val k = 5
        val m = 1L << 31
        val assigned = t(s, d, "documents")
          .select(col("doc_id"),
            expr(s"(pmod(doc_id * 1103515245L + 12345L, ${m}L) * $k) div ${m}L")
              .cast(IntegerType).as("fold"))
        val counts = assigned.groupBy(col("fold"))
          .agg(count(lit(1)).as("n_fold"))
        val tot = assigned.agg(count(lit(1)).as("_n"))
        assigned.join(broadcast(counts), Seq("fold"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("fold"), col("n_fold"),
            // balance bound: |n_fold − N/k| ≤ 4·sqrt(N) — in-query, the
            // checked-band discipline (a broken LCG or cut would trip it)
            when(abs(col("n_fold").cast(DoubleType) -
                col("_n").cast(DoubleType) / lit(k.toDouble)) <=
                lit(4.0) * sqrt(col("_n").cast(DoubleType)), 1)
              .otherwise(0).as("balance_ok"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    CAST(((doc_id * 1103515245 + 12345) % 2147483648) * 5
             |      // 2147483648 AS INTEGER) AS fold
             |  FROM documents),
             |c AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_fold
             |      FROM a GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a)
             |SELECT a.doc_id, a.fold, c.n_fold,
             |  CAST(CASE WHEN abs(CAST(c.n_fold AS DOUBLE)
             |      - CAST(t.n AS DOUBLE) / 5.0)
             |      <= 4.0 * sqrt(CAST(t.n AS DOUBLE)) THEN 1 ELSE 0 END
             |    AS INTEGER) AS balance_ok
             |FROM a JOIN c USING (fold) CROSS JOIN t
             |ORDER BY a.doc_id""".stripMargin),
      allowBnlj = true),

    // TEMPORAL train/test split with an EMBARGO gap (the purged
    // time-based split, López de Prado 2018 ch.7; for LLM data: train
    // pre-cutoff, evaluate post-cutoff, the gap absorbing
    // near-duplicate leakage across the boundary) — the split
    // sample_split_assign's random hash CANNOT provide when the task
    // is forecasting or freshness eval. Boundary = the exact 75th
    // percentile of event time (dyadic k ⇒ the interpolation
    // (1−f)·a + f·b is exact-double over epoch-micro longs — the
    // prep_quantile_bins contract; at 100 TB swap in the documented
    // approxThresholds mode), embargo = 1 hour. Output: per-split
    // row counts, distinct actors, and the ACTOR-OVERLAP-WITH-TRAIN
    // audit — the diagnostic that tells the caller whether a grouped
    // split is needed (entity leakage survives any time boundary).
    "sample_split_temporal" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val t0 = ev.agg(expr("percentile(us, 0.75)").as("_t0"))
        val tagged = ev.crossJoin(broadcast(t0))
          .withColumn("split",
            when(col("us") < col("_t0"), "train")
              .when(col("us") < col("_t0") + lit(3600000000L), "embargo")
              .otherwise("test"))
        val spl = tagged.groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
        val trainUsers = tagged.filter(col("split") === "train")
          .select(col("user_id")).distinct()
        val ov = tagged.filter(col("split") =!= "train")
          .join(trainUsers, Seq("user_id"))
          .groupBy(col("split"))
          .agg(countDistinct(col("user_id")).as("_o"))
        spl.join(ov, Seq("split"), "left")
          .select(col("split"), col("n"), col("n_users"),
            when(col("split") === "train", lit(null).cast(LongType))
              .otherwise(coalesce(col("_o"), lit(0L)))
              .as("n_users_overlap_train"))
          .orderBy(col("split"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) AS us FROM events),
             |t0 AS (SELECT quantile_cont(us, 0.75) AS t0 FROM ev),
             |tagged AS (
             |  SELECT user_id,
             |    CASE WHEN us < t0 THEN 'train'
             |         WHEN us < t0 + 3600000000 THEN 'embargo'
             |         ELSE 'test' END AS split
             |  FROM ev CROSS JOIN t0),
             |spl AS (
             |  SELECT split, CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |  FROM tagged GROUP BY 1),
             |tu AS (SELECT DISTINCT user_id FROM tagged WHERE split = 'train'),
             |ov AS (
             |  SELECT split, CAST(count(DISTINCT tagged.user_id) AS BIGINT) AS o
             |  FROM tagged JOIN tu USING (user_id)
             |  WHERE split <> 'train' GROUP BY 1)
             |SELECT spl.split AS split, n, n_users,
             |  CASE WHEN spl.split = 'train' THEN NULL
             |       ELSE COALESCE(o, 0) END AS n_users_overlap_train
             |FROM spl LEFT JOIN ov ON ov.split = spl.split
             |ORDER BY spl.split""".stripMargin),
      allowBnlj = true),

    // URL front stage: parse host/registrable-domain/path, drop
    // blocklisted domains, cap each remaining domain at 10 docs (the
    // RefinedWeb-style domain-diversity cap — URL-level filtering
    // happens BEFORE any content is read, so at 100 TB this stage
    // prunes the scan, not the corpus). URLs are BUILT deterministically
    // from table fields (the text_html_extract fixture precedent):
    // 40 hosts, every 7th doc behind a www. prefix so host ≠ domain is
    // actually exercised. DuckDB restates the same regexes, blocklist,
    // and LCG-ranked cap.
    "text_url_domain_cap" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val withUrl = docs.select(col("doc_id"), col("source"),
          concat(lit("https://"),
            when(col("doc_id") % 7 === 0, lit("www.")).otherwise(lit("")),
            lit("site"), (col("doc_id") % 40).cast(StringType),
            lit(".example/"), col("source"),
            lit("/p"), col("doc_id").cast(StringType)).as("url"))
        TextOps.domainDiversityCap(withUrl, "url", "doc_id",
            n = 10, seed = 7L,
            blocked = Seq("site7.example", "site23.example"))
          .withColumn("path", TextOps.urlPath(col("url")))
          .select(col("doc_id"), col("host"), col("domain"), col("path"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH withu AS (
             |  SELECT doc_id,
             |    'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END
             |      || 'site' || CAST(doc_id % 40 AS VARCHAR) || '.example/'
             |      || source || '/p' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents),
             |parts AS (
             |  SELECT doc_id, url,
             |    lower(regexp_extract(url,
             |      '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1))
             |      AS host
             |  FROM withu),
             |dom AS (
             |  SELECT doc_id, host,
             |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
             |    regexp_extract(url,
             |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path
             |  FROM parts),
             |kept AS (
             |  SELECT * FROM dom
             |  WHERE domain NOT IN ('site7.example', 'site23.example')),
             |u AS (
             |  SELECT *, CAST(((doc_id + 7) * 1103515245 + 12345)
             |      % 2147483648 AS DOUBLE) / 2147483648.0 AS u
             |  FROM kept),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY domain
             |    ORDER BY u, doc_id) AS rn
             |  FROM u)
             |SELECT doc_id, host, domain, path
             |FROM r WHERE rn <= 10 ORDER BY doc_id""".stripMargin)),

    // Registrable-domain extraction through the bundled Public Suffix
    // List snapshot — exercises all three PSL rule shapes (exact
    // co.uk / com.au / 3-label k12.ca.us, wildcard *.ck, exception
    // !www.ck), the private section (github.io), the default rule
    // (unknown TLDs reproduce the last-two-label heuristic), and both
    // no-registrable cases (host IS a public suffix; single label).
    // The oracle replays the SAME algorithm generically: last-k-label
    // candidates joined to the STAGED rule table (the snapshot parsed
    // to parquet), exception beats longest beats default — so the
    // bundled data file, the Spark expression compiler, and an
    // independent engine agree row-for-row.
    // URL canonicalization for crawl dedup (TextOps.canonicalizeUrl):
    // three deterministic messy-URL classes per doc (uppercase
    // scheme/host + :443 + utm params + fragment; :80 http; fbclid
    // tail) collapse to canonical forms, and classes 0 and 2 COLLIDE
    // by construction (same site/page/param mods) — n_same_canon > 1
    // rows are the recrawls a fetcher would skip. Pure regexp column
    // program + one canonical-grain window count; every pattern
    // RE2-compatible so DuckDB restates the chain verbatim (its
    // regexp_replace needs the explicit 'g' flag where Spark is
    // global by default — the cross-engine trap this oracle pins).
    "text_url_canonical" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val site = concat(lit("Site"), (col("doc_id") % 25).cast(StringType),
          lit(".Example"))
        val page = (col("doc_id") % 50).cast(StringType)
        val x = (col("doc_id") % 5).cast(StringType)
        val url = when(col("doc_id") % 3 === 0, concat(
            lit("HTTPS://WWW."), site, lit(":443/Page/"), page,
            lit("?utm_source=feed&utm_id=9&x="), x, lit("#top")))
          .when(col("doc_id") % 3 === 1, concat(
            lit("http://www."), lower(site), lit(":80/Page/"), page))
          .otherwise(concat(
            lit("https://www."), lower(site), lit("/Page/"), page,
            lit("?x="), x, lit("&fbclid=abc")))
        val canon = docs.select(col("doc_id"), url.as("url"))
          .withColumn("canon", TextOps.canonicalizeUrl(col("url")))
        canon
          .withColumn("n_same_canon",
            count(lit(1)).over(Window.partitionBy(col("canon"))))
          .orderBy(col("doc_id"))
      },
      Some {
        val tracker = "(utm_[^=&]*|gclid|fbclid)=[^&]*"
        s"""WITH u AS (
           |  SELECT doc_id,
           |    CASE
           |      WHEN doc_id % 3 = 0 THEN
           |        'HTTPS://WWW.Site' || CAST(doc_id % 25 AS VARCHAR)
           |        || '.Example:443/Page/' || CAST(doc_id % 50 AS VARCHAR)
           |        || '?utm_source=feed&utm_id=9&x='
           |        || CAST(doc_id % 5 AS VARCHAR) || '#top'
           |      WHEN doc_id % 3 = 1 THEN
           |        'http://www.site' || CAST(doc_id % 25 AS VARCHAR)
           |        || '.example:80/Page/' || CAST(doc_id % 50 AS VARCHAR)
           |      ELSE
           |        'https://www.site' || CAST(doc_id % 25 AS VARCHAR)
           |        || '.example/Page/' || CAST(doc_id % 50 AS VARCHAR)
           |        || '?x=' || CAST(doc_id % 5 AS VARCHAR) || '&fbclid=abc'
           |    END AS url
           |  FROM documents),
           |s1 AS (
           |  SELECT doc_id, url,
           |    regexp_replace(url, '#.*$$', '') AS nofrag
           |  FROM u),
           |s2 AS (
           |  SELECT doc_id, url,
           |    lower(regexp_extract(nofrag,
           |      '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
           |    lower(regexp_extract(nofrag,
           |      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS auth,
           |    regexp_extract(nofrag,
           |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
           |  FROM s1),
           |s3 AS (
           |  SELECT doc_id, url, scheme,
           |    CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
           |         WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
           |         ELSE auth END AS auth2,
           |    auth,
           |    regexp_extract(rest, '^([^?]*)', 1) AS path,
           |    regexp_replace(
           |      regexp_replace(
           |        regexp_replace(regexp_extract(rest, '(\\?.*)$$', 1),
           |          '&$tracker', '', 'g'),
           |        '\\?$tracker&', '?'),
           |      '\\?$tracker$$', '') AS q3
           |  FROM s2),
           |c AS (
           |  SELECT doc_id, url,
           |    CASE WHEN scheme = '' OR auth = '' THEN NULL
           |      ELSE scheme || '://' || auth2 ||
           |        CASE WHEN path = '' THEN '/' ELSE path END || q3
           |      END AS canon
           |  FROM s3)
           |SELECT doc_id, url, canon,
           |  count(*) OVER (PARTITION BY canon) AS n_same_canon
           |FROM c ORDER BY doc_id""".stripMargin
      }),

    "text_url_psl_domain" -> QuerySpec(
      (s, d) => {
        staged(d, "psl_rules") { dir =>
          PslDomain.rulesDf(s).coalesce(1).write
            .mode("overwrite").parquet(dir)
        }
        val docs = t(s, d, "documents")
        val id = col("doc_id").cast(StringType)
        val m = col("doc_id") % 12
        val host = when(m === 0, concat(lit("site"), id, lit(".co.uk")))
          .when(m === 1, concat(lit("www.site"), id, lit(".com.au")))
          .when(m === 2, concat(lit("a.b.site"), id, lit(".gov.br")))
          .when(m === 3, concat(lit("site"), id, lit(".com")))
          .when(m === 4, concat(lit("site"), id, lit(".example")))
          .when(m === 5, concat(lit("www.site"), id, lit(".github.io")))
          .when(m === 6, concat(lit("site"), id, lit(".foo.ck")))
          .when(m === 7, lit("www.ck"))
          .when(m === 8, lit("co.uk"))
          .when(m === 9, concat(lit("school"), id, lit(".k12.ca.us")))
          .when(m === 10, lit("sub.www.ck"))
          .otherwise(lit("localhost"))
        docs
          .select(col("doc_id"),
            concat(lit("https://"), host, lit("/p"), id).as("url"))
          .select(col("doc_id"), TextOps.urlHost(col("url")).as("host"))
          .withColumn("domain", TextOps.urlDomain(col("host")))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH hosts AS (
             |  SELECT doc_id,
             |    CASE doc_id % 12
             |      WHEN 0 THEN 'site' || CAST(doc_id AS VARCHAR) || '.co.uk'
             |      WHEN 1 THEN 'www.site' || CAST(doc_id AS VARCHAR) || '.com.au'
             |      WHEN 2 THEN 'a.b.site' || CAST(doc_id AS VARCHAR) || '.gov.br'
             |      WHEN 3 THEN 'site' || CAST(doc_id AS VARCHAR) || '.com'
             |      WHEN 4 THEN 'site' || CAST(doc_id AS VARCHAR) || '.example'
             |      WHEN 5 THEN 'www.site' || CAST(doc_id AS VARCHAR) || '.github.io'
             |      WHEN 6 THEN 'site' || CAST(doc_id AS VARCHAR) || '.foo.ck'
             |      WHEN 7 THEN 'www.ck'
             |      WHEN 8 THEN 'co.uk'
             |      WHEN 9 THEN 'school' || CAST(doc_id AS VARCHAR) || '.k12.ca.us'
             |      WHEN 10 THEN 'sub.www.ck'
             |      ELSE 'localhost' END AS host
             |  FROM documents),
             |lab AS (
             |  SELECT doc_id, host, len(string_split(host, '.')) AS n
             |  FROM hosts),
             |cand AS (
             |  SELECT l.doc_id, l.n,
             |    array_to_string(
             |      string_split(l.host, '.')[l.n - r.k + 1 : l.n], '.') AS sfx
             |  FROM lab l
             |  CROSS JOIN range(1, ${PslDomain.rules.map(_.nlabels).max + 1}) r(k)
             |  WHERE r.k <= l.n),
             |m AS (
             |  SELECT c.doc_id,
             |    max(CASE WHEN p.kind = 'e' THEN p.nlabels - 1 END) AS exc_len,
             |    max(CASE WHEN p.kind = 'x' THEN p.nlabels END) AS x_len,
             |    max(CASE WHEN p.kind = 'w' AND c.n >= p.nlabels + 1
             |             THEN p.nlabels + 1 END) AS w_len
             |  FROM cand c
             |  JOIN read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/psl_rules/*.parquet') p
             |    ON p.suffix = c.sfx
             |  GROUP BY c.doc_id),
             |sl AS (
             |  SELECT l.doc_id, l.host, l.n,
             |    coalesce(m.exc_len,
             |      greatest(coalesce(m.x_len, 0), coalesce(m.w_len, 0), 1)) AS sl
             |  FROM lab l LEFT JOIN m ON m.doc_id = l.doc_id)
             |SELECT doc_id, host,
             |  CASE WHEN n > sl THEN array_to_string(
             |    string_split(host, '.')[n - sl : n], '.') ELSE '' END AS domain
             |FROM sl ORDER BY doc_id""".stripMargin)),

    // Leakage-guard train/val/test split: assignment at the NEAR-DUP
    // CLUSTER grain, not the document grain — the coin flips on
    // cluster_id, so two near-duplicate documents can never straddle a
    // split boundary (the eval-contamination failure mode of per-doc
    // splitting: a train doc's near-copy lands in test and the eval
    // leaks). Composes the audited pieces end to end: ngram-Jaccard
    // pairs → connected components → assignSplits on the cluster label;
    // singletons are their own cluster, so they split exactly like
    // sample_split_assign. DuckDB independently rebuilds shingles,
    // Jaccard pairs, the transitive closure (recursive CTE), and the
    // bit-exact LCG coin — the dedup_cluster_cc oracle composed with
    // the sample_split_assign oracle.
    "sample_split_by_cluster" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") < 500)
        val pairs = DedupOps.ngramJaccardPairs(
          docs, "doc_id", "text", 0.3, shingleN = 2)
          .select(col("id_a"), col("id_b"))
        val clusters = DedupOps.connectedComponents(
          docs.select(col("doc_id")), pairs, "doc_id", "id_a", "id_b")
        SampleOps.assignSplits(clusters, "cluster_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select(col("doc_id"), col("cluster_id"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE base AS (
             |  SELECT doc_id AS id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 500),
             |toks AS (
             |  SELECT id, unnest(list_distinct(
             |    [w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS tok
             |  FROM base),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY a.id, b.id),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3),
             |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |reach(id, l) AS (
             |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
             |  UNION
             |  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.l),
             |labels AS (
             |  SELECT id AS doc_id, min(l) AS cluster_id
             |  FROM reach GROUP BY id)
             |SELECT doc_id, cluster_id,
             |  CASE WHEN u < 0.8 THEN 'train'
             |       WHEN u < 0.9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id, cluster_id,
             |        CAST((cluster_id * 1103515245 + 12345) % 2147483648
             |          AS DOUBLE) / 2147483648.0 AS u
             |      FROM labels)
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic global corpus shuffle: the reproducible pseudorandom
    // total order a trainer reads the corpus in. Distributed range sort
    // on the portable-LCG key + zipWithIndex positions (never a
    // partition-less window); DuckDB re-derives the entire permutation
    // from the same integer LCG — every position bit-exact.
    "sample_shuffle_global" -> QuerySpec(
      (s, d) => SampleOps.deterministicShuffle(
        t(s, d, "documents").select(col("doc_id")), "doc_id", seed = 7L)
        .orderBy(col("shuffle_pos")),
      Some("""SELECT doc_id,
             |  CAST(row_number() OVER (ORDER BY
             |    ((doc_id + 7) * 1103515245 + 12345) % 2147483648, doc_id)
             |    - 1 AS BIGINT) AS shuffle_pos
             |FROM documents
             |ORDER BY shuffle_pos""".stripMargin)),

    // DSIR importance selection (Xie et al. 2023): hashed n-gram
    // (uni+bigram) bucket models over a target slice (src0 docs) vs the
    // raw rest, per-bucket log ratios frozen DECIMAL(20,6) at fit (the
    // NB quantization contract), per-doc log weights as exact decimal
    // sums, deterministic top-100 by (log_w DESC, doc_id). DuckDB
    // rebuilds tokenization, the portable code-point hash, smoothing,
    // quantized ratios, decimal sums and the top-k — fully oracled.
    // Fit aggregates each corpus ONCE to 64 bucket rows; scoring is one
    // (doc, bucket) aggregation against the broadcast model; selection
    // is a bounded-heap global top-k: the 100 TB shape throughout.
    "sample_dsir_select" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
        val target = docs.filter(col("source") === "src0")
        val raw = docs.filter(col("source") =!= "src0")
        // the raw corpus is feature-hashed ONCE into the shared
        // doc-bucket frame (eagerly materialized — it feeds both the
        // fit's totals and the scoring join); the production pipeline
        // persists this frame as parquet instead
        val rawCounts = DsirOps.docBucketCounts(
          raw.select(col("doc_id"), col("text")), "doc_id", "text",
          buckets = 64, seed = 7L).localCheckpoint()
        val targetCounts = DsirOps.docBucketCounts(
          target.select(col("doc_id"), col("text")), "doc_id", "text",
          buckets = 64, seed = 7L)
        val model = DsirOps.dsirFitFromCounts(targetCounts, rawCounts,
          buckets = 64, smoothing = 0.5)
        val scored = DsirOps.dsirScoreFromCounts(rawCounts, "doc_id", model)
        DsirOps.dsirSelect(scored, "doc_id", 100)
          .select(col("doc_id"), col("n_feats"), col("log_w"))
          .orderBy(col("log_w").desc, col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, source,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'),
             |      x -> length(x) > 0) AS tk
             |  FROM documents),
             |feats AS (
             |  SELECT doc_id, source, unnest(tk) AS f FROM base
             |  UNION ALL
             |  SELECT doc_id, source,
             |    unnest(list_transform(range(1, len(tk)),
             |      i -> tk[i] || ' ' || tk[i + 1])) AS f
             |  FROM base),
             |hashed AS (
             |  SELECT doc_id, source,
             |    CAST(list_reduce(list_prepend(CAST(7 AS BIGINT),
             |      list_transform(regexp_split_to_array(f, ''),
             |        c -> CAST(ord(c) AS BIGINT))),
             |      (a, c) -> (a * 31 + c) % 2147483647) % 64 AS INTEGER) AS bucket
             |  FROM feats),
             |ct AS (SELECT bucket, count(*) AS c FROM hashed
             |       WHERE source = 'src0' GROUP BY 1),
             |cr AS (SELECT bucket, count(*) AS c FROM hashed
             |       WHERE source <> 'src0' GROUP BY 1),
             |nt AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM ct),
             |nr AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM cr),
             |grid AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS bucket),
             |model AS (
             |  SELECT g.bucket,
             |    CAST(ln((COALESCE(ct.c, 0) + 0.5) / (nt.n + 32.0)) -
             |         ln((COALESCE(cr.c, 0) + 0.5) / (nr.n + 32.0))
             |      AS DECIMAL(20,6)) AS lr
             |  FROM grid g
             |  LEFT JOIN ct USING (bucket) LEFT JOIN cr USING (bucket)
             |  CROSS JOIN nt CROSS JOIN nr),
             |db AS (
             |  SELECT doc_id, bucket, count(*) AS cnt
             |  FROM hashed WHERE source <> 'src0' GROUP BY 1, 2),
             |scored AS (
             |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_feats,
             |    CAST(SUM(CAST(cnt AS DECIMAL(10,0)) * m.lr) AS DOUBLE) AS log_w
             |  FROM db JOIN model m USING (bucket) GROUP BY 1)
             |SELECT doc_id, n_feats, log_w
             |FROM scored ORDER BY log_w DESC, doc_id LIMIT 100""".stripMargin),
      allowBnlj = true),

    // Incremental (batch-vs-corpus) exact dedup: the continuous-ingestion
    // shape — today's batch anti-joined against the accumulated corpus on
    // a content digest, never re-deduplicating the corpus. Ten corpus
    // texts are re-planted into the batch under fresh ids, so the key
    // exercises both drop (planted dups) and keep (novel docs). The
    // near-dup LSH tier is unit-tested (DedupSpec); digest semantics are
    // engine-side only — the oracle states text equality directly.
    "dedup_incremental" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpus = docs.filter(col("doc_id") < 450)
        val batch = docs.filter(col("doc_id") >= 450)
          .unionByName(docs.filter(col("doc_id") < 10)
            .withColumn("doc_id", col("doc_id") + 10000))
        DedupOps.incrementalDedup(batch, corpus, "doc_id", "text")
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH corpus AS (SELECT text FROM documents WHERE doc_id < 450),
             |batch AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 450
             |  UNION ALL
             |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 10)
             |SELECT b.doc_id FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
             |ORDER BY b.doc_id""".stripMargin)),

    // Bloom-prefiltered exact incremental dedup: same fixture and the
    // SAME final semantics as dedup_incremental (the bloom is a pure
    // prefilter — false positives fall to the exact anti join, false
    // negatives don't exist), so the key is fully oracled even though
    // the bloom bits themselves are engine-specific. The sketch is the
    // offline fit half (bloomFitDigests), memoized per dataset like the
    // IVF model.
    "dedup_incremental_bloom" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val corpus = docs.filter(col("doc_id") < 450)
        val batch = docs.filter(col("doc_id") >= 450)
          .unionByName(docs.filter(col("doc_id") < 10)
            .withColumn("doc_id", col("doc_id") + 10000))
        val sketch = bloomSketches.computeIfAbsent(d,
          _ => DedupOps.bloomFitDigests(corpus, "text", expectedItems = 10000L))
        DedupOps.incrementalDedupBloom(batch, corpus, "doc_id", "text", sketch)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH corpus AS (SELECT text FROM documents WHERE doc_id < 450),
             |batch AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 450
             |  UNION ALL
             |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 10)
             |SELECT b.doc_id FROM batch b
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
             |ORDER BY b.doc_id""".stripMargin)),

    // ---------------------------------------------------------- profiling
    // Key-skew diagnostic (the pre-shuffle measurement behind the
    // salting / AQE-skew-join decision). Mean derived as tot/k so the
    // double arithmetic is bit-identical cross-engine.
    "profile_key_skew" -> QuerySpec(
      (s, d) => ProfileOps.keySkew(t(s, d, "events"), "user_id", topK = 10)
        .orderBy(col("n").desc, col("user_id")),
      Some("""WITH counts AS (
             |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
             |stats AS (
             |  SELECT SUM(n) AS tot, COUNT(*) AS k, MAX(n) AS maxn FROM counts)
             |SELECT user_id, n,
             |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
             |  CAST(maxn AS DOUBLE) / (CAST(tot AS DOUBLE) / CAST(k AS DOUBLE))
             |    AS skew_factor
             |FROM counts, stats
             |ORDER BY n DESC, user_id LIMIT 10""".stripMargin),
      allowBnlj = true),

    // One-scan numeric column profiling (nulls / cardinality / range /
    // decimal-stable mean) — the data-quality gate a training corpus
    // passes before anything else runs. Exact distinct counts keep it
    // oracle-comparable.
    "profile_numeric" -> QuerySpec(
      (s, d) => ProfileOps.profileNumeric(
        t(s, d, "lineitem"), Seq("l_discount", "l_quantity", "l_tax")),
      Some("""SELECT * FROM (
             |  SELECT 'l_discount' AS col_name, count(*) AS n_rows,
             |    count(l_discount) AS n_nonnull,
             |    count(DISTINCT l_discount) AS n_distinct,
             |    CAST(MIN(l_discount) AS DOUBLE) AS min_val,
             |    CAST(MAX(l_discount) AS DOUBLE) AS max_val,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)
             |      / count(l_discount) AS mean_val
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_quantity', count(*), count(l_quantity),
             |    count(DISTINCT l_quantity),
             |    CAST(MIN(l_quantity) AS DOUBLE), CAST(MAX(l_quantity) AS DOUBLE),
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             |      / count(l_quantity)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_tax', count(*), count(l_tax), count(DISTINCT l_tax),
             |    CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE),
             |    CAST(SUM(CAST(l_tax AS DECIMAL(38,6))) AS DOUBLE)
             |      / count(l_tax)
             |  FROM lineitem
             |) ORDER BY col_name""".stripMargin)),

    // Tolerant JSONL scan, ORACLED: staged ndjson derives from orders
    // (ground truth the oracle can restate) with a planted garbage file
    // in the same directory; PERMISSIVE routes the bad lines to
    // _corrupt_record, and the clean stream must equal the source rows
    // EXACTLY — a leaked corrupt row would surface as a NULL-columned
    // extra row and fail the hash. (That the garbage file is actually
    // read — not silently skipped — is unit-asserted in ReadersSpec.)
    "scan_jsonl_tolerant" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_jsonl_tolerant") { p =>
          t(s, d, "orders").filter(col("o_orderkey") < 500)
            .select(col("o_orderkey"), col("o_orderstatus"))
            .write.mode("overwrite").json(p)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(p, "zz_corrupt.json"),
            "{not json at all\n{\"o_orderkey\": \"dangling\n")
        }
        val schema = new StructType()
          .add("o_orderkey", LongType).add("o_orderstatus", StringType)
        Readers.jsonLinesTolerant(s, dir, schema)
          .filter(col("_corrupt_record").isNull)
          .select(col("o_orderkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    // Tolerant CSV ingest (Readers.csvTolerant) — the CSV twin of the
    // jsonl quarantine: unparseable rows land in _corrupt_record, the
    // clean side keeps flowing. Staged CSV shards + one corrupt file;
    // the oracle is the same parquet-derived clean rows.
    "scan_csv_tolerant" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_csv_tolerant") { p =>
          t(s, d, "orders").filter(col("o_orderkey") < 500)
            .select(col("o_orderkey"), col("o_orderstatus"))
            .write.mode("overwrite").option("header", "true").csv(p)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(p, "zz_corrupt.csv"),
            "o_orderkey,o_orderstatus\nnot_a_number,X\n1,2,3,too,many\n")
        }
        val schema = new StructType()
          .add("o_orderkey", LongType).add("o_orderstatus", StringType)
        Readers.csvTolerant(s, dir, schema)
          .filter(col("_corrupt_record").isNull)
          .select(col("o_orderkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    // DataSourceV2 connector, ORACLED: the fakemedia source's rows are
    // pure index arithmetic, so DuckDB can restate the whole scan from
    // range(). The media_id range predicate is PUSHED (partition
    // planning narrows to the [1000, 3000) chunk — unit-asserted in
    // FakeMediaSourceSpec); payload pruning means `bytes` is never
    // built for this projection.
    "scan_dsv2" -> QuerySpec(
      (s, d) => s.read.format("fakemedia")
        .option("count", 5000L).option("numPartitions", 8)
        .load()
        .filter(col("media_id") >= 1000L && col("media_id") < 3000L)
        .select(col("media_id"), col("kind"), col("width"), col("n_frames"))
        .orderBy(col("media_id")),
      Some("""SELECT i AS media_id,
             |  CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |    ELSE 'video' END AS kind,
             |  CAST((i % 64) * 16 + 16 AS INTEGER) AS width,
             |  CAST(i % 8 + 1 AS INTEGER) AS n_frames
             |FROM range(0, 5000) t(i)
             |WHERE i >= 1000 AND i < 3000
             |ORDER BY media_id""".stripMargin)),

    // Custom Catalyst GENERATOR (UDTF shape): positional bigrams stream
    // lazily out of eval — no intermediate shingle array per document.
    // Short docs would hit the ShingleArray fewer-than-n convention;
    // the fixture's documents all have ≥ 2 tokens, so the oracle can
    // state the plain windowed form.
    "fn_ngram_generate" -> QuerySpec(
      (s, d) => {
        graft.expressions.GraftFunctions.register(s)
        t(s, d, "documents").filter(col("doc_id") < 50)
          .select(col("doc_id"),
            call_function("ngram_generate",
              split(lower(col("text")), "\\s+"), lit(2)))
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE doc_id < 50)
             |SELECT doc_id, CAST(x.pos AS INTEGER) AS pos, x.ngram AS ngram
             |FROM (
             |  SELECT doc_id,
             |    unnest([{'pos': i - 1, 'ngram': w[i] || ' ' || w[i+1]}
             |      for i in range(1, len(w))]) AS x
             |  FROM w)
             |ORDER BY doc_id, pos""".stripMargin)),

    // Existence-flag join (SELECT-list EXISTS — annotates instead of
    // filtering, which left_semi/left_anti cannot do): right side
    // reduced to distinct keys pre-join, so left rows never duplicate
    // and the join side stays broadcastable.
    "join_exists_flag" -> QuerySpec(
      (s, d) => Joins.withExistsFlag(
        t(s, d, "customer").select(col("c_custkey"), col("c_name")),
        t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), flagCol = "has_order")
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name,
             |  EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |    AS has_order
             |FROM customer c ORDER BY c_custkey""".stripMargin)),

    // Typed cogroup (KeyValueGroupedDataset.cogroup): per-key access to
    // both pipelines' rows at once — the dual-pipeline reconciliation
    // audit. The right twin drops every 13th position and perturbs every
    // 7th by +0.01, so counts and max-divergence are all exercised; the
    // oracle restates the semantics as FULL JOIN + per-key aggregate.
    "typed_cogroup_reconcile" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val ev = t(s, d, "events").select(
          col("user_id").as("key"), col("event_id").as("ord"), col("value"))
        val twin = ev.filter(pmod(col("ord"), lit(13)) =!= 0)
          .withColumn("value",
            when(pmod(col("ord"), lit(7)) === 0, col("value") + lit(0.01))
              .otherwise(col("value")))
        TypedOps.cogroupReconcile(
          ev.as[graft.ops.TypedOps.KeyedValue],
          twin.as[graft.ops.TypedOps.KeyedValue])
          .toDF().orderBy(col("key"))
      },
      Some("""WITH l AS (
             |  SELECT user_id AS key, event_id AS ord, value FROM events),
             |r AS (
             |  SELECT key, ord,
             |    CASE WHEN ord % 7 = 0 THEN value + 0.01 ELSE value END AS value
             |  FROM l WHERE ord % 13 <> 0),
             |j AS (
             |  SELECT COALESCE(l.key, r.key) AS key, l.value AS lv, r.value AS rv
             |  FROM l FULL JOIN r ON l.key = r.key AND l.ord = r.ord)
             |SELECT key,
             |  CAST(count(lv) AS BIGINT) AS n_left,
             |  CAST(count(rv) AS BIGINT) AS n_right,
             |  CAST(count(CASE WHEN lv IS NOT NULL AND rv IS NOT NULL
             |    THEN 1 END) AS BIGINT) AS n_both,
             |  MAX(CASE WHEN lv IS NOT NULL AND rv IS NOT NULL
             |    THEN abs(lv - rv) END) AS max_abs_delta
             |FROM j GROUP BY key ORDER BY key""".stripMargin)),

    // Vocabulary build (token → dense id by count DESC, token): the
    // corpus-scale work is one token-count shuffle with map-side
    // combine; ids come from a range-partitioned sort + zipWithIndex
    // (no single-task global window). Deterministic tie-break ⇒ fully
    // oracled ids.
    "text_build_vocab" -> QuerySpec(
      (s, d) => TextOps.buildVocab(t(s, d, "documents"), "text", minCount = 5)
        .orderBy(col("token_id")),
      Some("""WITH toks AS (
             |  SELECT unnest(string_split(lower(text), ' ')) AS token
             |  FROM documents),
             |counts AS (
             |  SELECT token, count(*) AS n FROM toks
             |  WHERE length(token) > 0
             |  GROUP BY token HAVING count(*) >= 5)
             |SELECT token, n,
             |  CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
             |    AS token_id
             |FROM counts ORDER BY token_id""".stripMargin)),

    // Pairwise Pearson correlation from decimal-exact co-moments — ONE
    // wide aggregate (single scan, partial agg), pairs exploded from the
    // one counter row. Derived-moment formulation (not corr()) keeps the
    // double chain bit-identical cross-engine, same trick as
    // prep_zscore_group.
    // PRODUCTION SHAPE: scan → one wide partial agg, no Exchange before
    // the aggregate. The fixture sf tables are single-row-group files —
    // one scan task owns every row and the 18 Decimal(38) partial sums
    // serialize on one core (~3.4 s, same artifact as BASELINE §8) — so
    // a pre-spread of the slim projection is gated on a ROW-GROUP COUNT
    // probe (driver-side parquet footer metadata, no data read): only a
    // layout whose row groups can't feed the cores pays the ~15 MB
    // shuffle. A production table has many row groups, the gate stays
    // closed, and the registered plan is exchange-free. Result identical
    // either way — decimal sums are exact, partial-agg order can't move
    // a bit.
    "profile_corr" -> QuerySpec(
      (s, d) => {
        val src = t(s, d, "lineitem")
          .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_orderkey"))
        val rowGroups = parquetRowGroupCount(s, s"$d/lineitem.parquet")
        val staged =
          if (rowGroups * 2 < s.sparkContext.defaultParallelism)
            src.repartition(col("l_orderkey"))
          else src
        ProfileOps.corrMatrix(
          staged, Seq("l_quantity", "l_extendedprice", "l_discount"))
          .orderBy(col("col_a"), col("col_b"))
      },
      Some {
        def pair(a: String, b: String) =
          s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n > 1 AND n*saa - sa*sa > 0 AND n*sbb - sb*sb > 0
             |    THEN (n*sab - sa*sb) / (sqrt(n*saa - sa*sa) * sqrt(n*sbb - sb*sb))
             |  END AS pearson_r
             |FROM (SELECT
             |  CAST(count(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN 1 END) AS DOUBLE) AS n,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $a END AS DECIMAL(38,6))), 0) AS DOUBLE) AS sa,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $b END AS DECIMAL(38,6))), 0) AS DOUBLE) AS sb,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $a * $a END AS DECIMAL(38,6))), 0) AS DOUBLE) AS saa,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $b * $b END AS DECIMAL(38,6))), 0) AS DOUBLE) AS sbb,
             |  CAST(COALESCE(SUM(CAST(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN $a * $b END AS DECIMAL(38,6))), 0) AS DOUBLE) AS sab
             |  FROM lineitem)""".stripMargin
        Seq(
          pair("l_quantity", "l_extendedprice"),
          pair("l_quantity", "l_discount"),
          pair("l_extendedprice", "l_discount"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_a, col_b")
      }),

    // Pairwise SPEARMAN rank correlation (ProfileOps.spearmanMatrix) —
    // profile_corr's robust companion: Pearson over average tie ranks,
    // reading MONOTONE association where Pearson reads linear. Ranks
    // are exact integers (the average tie rank carried DOUBLED:
    // r2 = 2·below + ties + 1 — Pearson is scaling-invariant, so ρ is
    // unchanged and no .5 is ever minted); moments are DECIMAL(38,0)
    // sums presented as DOUBLE and ρ is the profile_corr fixed IEEE
    // chain ⇒ fully oracled. Over lineitem's three bounded-grain
    // numeric columns (50/11/9 distinct values — the value-grain
    // cumulative window's bounded-frame contract; continuous columns
    // quantile-bin first). Listwise deletion: every pair shares ONE
    // ranked population (documented deviation from profile_corr's
    // pairwise contract).
    "profile_spearman" -> QuerySpec(
      (s, d) => ProfileOps.spearmanMatrix(
          t(s, d, "lineitem"),
          Seq("l_quantity", "l_discount", "l_tax"))
        .orderBy(col("col_a"), col("col_b")),
      Some {
        def rankCte(src: String, name: String) =
          s"""g_$name AS (SELECT $src AS v, count(*) AS c FROM base GROUP BY 1),
             |r_$name AS (
             |  SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + c + 1 AS r2
             |  FROM g_$name)""".stripMargin
        def pair(a: String, b: String, nameA: String, nameB: String) =
          s"""SELECT '$nameA' AS col_a, '$nameB' AS col_b, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n > 1 AND n*ss_$a - s_$a*s_$a > 0
             |            AND n*ss_$b - s_$b*s_$b > 0
             |    THEN (n*sp_${a}_$b - s_$a*s_$b) /
             |      (sqrt(n*ss_$a - s_$a*s_$a) * sqrt(n*ss_$b - s_$b*s_$b))
             |  END AS spearman_rho
             |FROM m""".stripMargin
        s"""WITH base AS (
           |  SELECT l_quantity AS q, l_discount AS d, l_tax AS t
           |  FROM lineitem
           |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
           |    AND l_tax IS NOT NULL),
           |${rankCte("q", "q")},
           |${rankCte("d", "d")},
           |${rankCte("t", "t")},
           |j AS (
           |  SELECT rq.r2 AS r2q, rd.r2 AS r2d, rt.r2 AS r2t
           |  FROM base
           |  JOIN r_q rq ON rq.v = base.q
           |  JOIN r_d rd ON rd.v = base.d
           |  JOIN r_t rt ON rt.v = base.t),
           |m AS (SELECT
           |  CAST(count(*) AS DOUBLE) AS n,
           |  CAST(sum(CAST(r2q AS HUGEINT)) AS DOUBLE) AS s_q,
           |  CAST(sum(CAST(r2d AS HUGEINT)) AS DOUBLE) AS s_d,
           |  CAST(sum(CAST(r2t AS HUGEINT)) AS DOUBLE) AS s_t,
           |  CAST(sum(CAST(r2q AS HUGEINT) * r2q) AS DOUBLE) AS ss_q,
           |  CAST(sum(CAST(r2d AS HUGEINT) * r2d) AS DOUBLE) AS ss_d,
           |  CAST(sum(CAST(r2t AS HUGEINT) * r2t) AS DOUBLE) AS ss_t,
           |  CAST(sum(CAST(r2q AS HUGEINT) * r2d) AS DOUBLE) AS sp_q_d,
           |  CAST(sum(CAST(r2q AS HUGEINT) * r2t) AS DOUBLE) AS sp_q_t,
           |  CAST(sum(CAST(r2d AS HUGEINT) * r2t) AS DOUBLE) AS sp_d_t
           |  FROM j)
           |SELECT * FROM (
           |${pair("q", "d", "l_quantity", "l_discount")}
           |UNION ALL
           |${pair("q", "t", "l_quantity", "l_tax")}
           |UNION ALL
           |${pair("d", "t", "l_discount", "l_tax")}
           |) ORDER BY col_a, col_b""".stripMargin
      }),

    // Kendall τ-b rank correlation (ProfileOps.kendallTau) — the
    // concordance member of the correlation trio (Pearson reads linear,
    // Spearman monotone-via-ranks, τ reads P(concordant)−P(discordant)
    // directly — the most outlier-robust and the one with the clean
    // probabilistic reading). The O(n²) pair space never materializes:
    // the input collapses to the joint contingency grid (50×11 cells
    // for quantity×discount — bounded by the DISTINCT-value product,
    // not rows), C/D come from ONE strict-inequality self-join over
    // cells with DECIMAL(38,0) products, and tie corrections from the
    // marginals. The n₀−n₁ tie products exceed 2⁵³ at bench scale, so
    // the oracle bridges them through VARCHAR (the giniByGroup rule).
    "profile_kendall_tau" -> QuerySpec(
      (s, d) => ProfileOps.kendallTau(
        t(s, d, "lineitem"), "l_quantity", "l_discount"),
      Some("""WITH base AS (
             |  SELECT l_quantity AS a, l_discount AS b FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
             |grid AS MATERIALIZED (
             |  SELECT a, b, CAST(count(*) AS BIGINT) AS c
             |  FROM base GROUP BY 1, 2),
             |cd AS (
             |  SELECT
             |    SUM(CASE WHEN g1.b < g2.b
             |      THEN CAST(g1.c AS HUGEINT) * g2.c END) AS conc,
             |    SUM(CASE WHEN g1.b > g2.b
             |      THEN CAST(g1.c AS HUGEINT) * g2.c END) AS disc
             |  FROM grid g1 JOIN grid g2 ON g1.a < g2.a),
             |ta AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) // 2 AS n1
             |       FROM (SELECT sum(c) AS t FROM grid GROUP BY a)),
             |tb AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) // 2 AS n2
             |       FROM (SELECT sum(c) AS t FROM grid GROUP BY b)),
             |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             |         (CAST(sum(c) AS HUGEINT) * (sum(c) - 1)) // 2 AS n0
             |       FROM grid)
             |SELECT n,
             |  CAST(COALESCE(conc, 0) AS BIGINT) AS concordant,
             |  CAST(COALESCE(disc, 0) AS BIGINT) AS discordant,
             |  CASE WHEN n > 1 AND n0 - n1 > 0 AND n0 - n2 > 0 THEN
             |    CAST(CAST(COALESCE(conc, 0) - COALESCE(disc, 0) AS VARCHAR)
             |      AS DOUBLE) /
             |    sqrt(CAST(CAST((n0 - n1) * (n0 - n2) AS VARCHAR) AS DOUBLE))
             |  END AS tau_b
             |FROM cd CROSS JOIN ta CROSS JOIN tb CROSS JOIN nn""".stripMargin),
      allowBnlj = true),

    // Per-group closed-form OLS (ProfileOps.olsByGroup): slope /
    // intercept / r² of price-in-thousands ~ quantity within each
    // return flag — the per-segment trend fit, ONE map-side-combinable
    // aggregate (6 decimals shuffle per group). Exact DECIMAL(38,6)
    // sums → a fixed IEEE chain, the profile_corr determinism recipe,
    // so the fit is hash-exact against the oracle restating the same
    // chain (NOT regr_slope: both engines stream doubles order-
    // dependently there). y is PRE-SCALED /1000 (one IEEE divide,
    // identical both engines) so Σy²·10⁶ stays under 2⁵³: past that,
    // DuckDB's int128-decimal→double cast double-rounds (int128→double
    // then /1e6) and can sit 1 ulp off Spark's correctly-rounded
    // decimal→double — invisible through profile_corr's sqrt but
    // surfaced raw in r²'s dyy product (measured on this fixture).
    "profile_regression" -> QuerySpec(
      (s, d) => ProfileOps.olsByGroup(
        t(s, d, "lineitem").select(col("l_returnflag"),
          col("l_quantity"), (col("l_extendedprice") / 1000).as("price_k")),
        "l_returnflag", "l_quantity", "price_k")
        .orderBy(col("l_returnflag")),
      Some("""WITH li AS (
             |  SELECT l_returnflag, l_quantity,
             |    l_extendedprice / 1000 AS y FROM lineitem),
             |a AS (
             |  SELECT l_returnflag,
             |    CAST(count(CASE WHEN l_quantity IS NOT NULL
             |      AND y IS NOT NULL THEN 1 END) AS DOUBLE) AS n,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN l_quantity END AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN y END AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN l_quantity * l_quantity END AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN y * y END AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(CASE WHEN l_quantity IS NOT NULL AND y IS NOT NULL THEN l_quantity * y END AS DECIMAL(38,6))) AS DOUBLE) AS sxy
             |  FROM li GROUP BY 1)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n > 1 AND n*sxx - sx*sx > 0
             |    THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END AS slope,
             |  CASE WHEN n > 1 AND n*sxx - sx*sx > 0
             |    THEN (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n
             |  END AS intercept,
             |  CASE WHEN n > 1 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
             |    THEN ((n*sxy - sx*sy) * (n*sxy - sx*sy))
             |       / ((n*sxx - sx*sx) * (n*syy - sy*sy)) END AS r2
             |FROM a ORDER BY l_returnflag""".stripMargin)),

    // Robust per-group outliers via median absolute deviation
    // (ProfileOps.madOutliers): event values quantized to integer
    // cents (exact at 0.5 resolution through median, |x−med| and
    // 3·MAD, so every comparison is bit-determined), grouped into 7
    // user cohorts. The heavy-tail-safe anomaly gate a metrics
    // pipeline runs per segment — a corrupt sentinel moves a
    // mean/stddev gate, not a median/MAD one. Exact `percentile` ≡
    // `quantile_cont` (the fn_percentile-pinned identity); the
    // approxMedian flag is the bounded-memory 100 TB mode
    // (unit-compared in ProfileOpsSpec), the oracled key runs exact.
    "profile_mad_outliers" -> QuerySpec(
      (s, d) => ProfileOps.madOutliers(
        t(s, d, "events").select(
          (col("user_id") % 7).as("grp"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "grp", "cents", k = 3.0, broadcastGroupStats = true)
        .orderBy(col("grp")),
      Some("""WITH e AS (
             |  SELECT user_id % 7 AS grp,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |m AS (SELECT grp, quantile_cont(cents, 0.5) AS med,
             |        count(cents) AS n FROM e GROUP BY 1),
             |d AS (SELECT e.grp, abs(e.cents - m.med) AS dev, m.med, m.n
             |      FROM e JOIN m USING (grp)),
             |md AS (SELECT grp, quantile_cont(dev, 0.5) AS mad
             |       FROM d GROUP BY 1)
             |SELECT d.grp, CAST(max(d.n) AS BIGINT) AS n, max(d.med) AS med,
             |  max(md.mad) AS mad,
             |  CAST(SUM(CASE WHEN d.dev > 3.0 * md.mad THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM d JOIN md USING (grp) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Welch two-sample t statistic + Welch–Satterthwaite df
    // (ProfileOps.welchTTest): mean 'click' vs 'view' event value — the
    // continuous-metric experiment test beside profile_rate_ci's
    // binomial band. ONE conditional-sum aggregation (no join/pivot);
    // q = n·Σx² − (Σx)² exact DECIMAL(38,0) bridged to double through
    // a VARCHAR cast on the DuckDB side (direct wide-decimal→double
    // double-rounds past 2⁵³); t and df are fixed IEEE chains both
    // engines restate ⇒ fully oracled.
    // Cohen's d + Hedges' g (ProfileOps.cohensD) — the STANDARDIZED
    // effect size the t statistic lacks (t grows with √n; at corpus
    // scale everything is "significant" — d says how big in pooled-SD
    // units), completing the testing battery's effect-size tier beside
    // profile_cramers_v (categorical) and mannwhitney's rank-biserial.
    // Same exact-sum machinery as profile_ab_ttest; the oracle bridges
    // the DECIMAL(38,0) Σx² through VARCHAR.
    "profile_cohens_d" -> QuerySpec(
      (s, d) => ProfileOps.cohensD(
        t(s, d, "events").select(col("event_type").as("g"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "g", "cents", groupA = "click", groupB = "view"),
      Some("""WITH e AS (
             |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL),
             |m AS (SELECT
             |  CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n1,
             |  CAST(SUM(CASE WHEN g = 'click' THEN x ELSE 0 END)
             |    AS DECIMAL(38,0)) AS sx1,
             |  CAST(SUM(CASE WHEN g = 'click' THEN CAST(x AS DECIMAL(38,0)) * x
             |    ELSE 0 END) AS DECIMAL(38,0)) AS sxx1,
             |  CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n2,
             |  CAST(SUM(CASE WHEN g = 'view' THEN x ELSE 0 END)
             |    AS DECIMAL(38,0)) AS sx2,
             |  CAST(SUM(CASE WHEN g = 'view' THEN CAST(x AS DECIMAL(38,0)) * x
             |    ELSE 0 END) AS DECIMAL(38,0)) AS sxx2
             |  FROM e),
             |c AS (SELECT
             |  n1, n2,
             |  CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
             |  CAST(CAST(sx1 AS VARCHAR) AS DOUBLE) AS sx1d,
             |  CAST(CAST(sx2 AS VARCHAR) AS DOUBLE) AS sx2d,
             |  CAST(CAST(sxx1 AS VARCHAR) AS DOUBLE) AS sxx1d,
             |  CAST(CAST(sxx2 AS VARCHAR) AS DOUBLE) AS sxx2d
             |  FROM m),
             |f AS (SELECT n1, n2,
             |  sx1d / n1d AS m1, sx2d / n2d AS m2,
             |  (sxx1d - sx1d * sx1d / n1d) / (n1d - 1.0) AS v1,
             |  (sxx2d - sx2d * sx2d / n2d) / (n2d - 1.0) AS v2,
             |  n1d, n2d
             |  FROM c),
             |g2 AS (SELECT n1, n2, m1, m2, n1d, n2d,
             |  ((n1d - 1.0) * v1 + (n2d - 1.0) * v2) / (n1d + n2d - 2.0)
             |    AS pooled
             |  FROM f)
             |SELECT n1 AS n_a, n2 AS n_b, m1 AS mean_a, m2 AS mean_b,
             |  CASE WHEN n1 > 1 AND n2 > 1 AND pooled > 0.0
             |    THEN (m1 - m2) / sqrt(pooled) END AS cohens_d,
             |  CASE WHEN n1 > 1 AND n2 > 1 AND pooled > 0.0
             |    THEN ((m1 - m2) / sqrt(pooled)) *
             |      (1.0 - 3.0 / (4.0 * (n1d + n2d) - 9.0)) END AS hedges_g
             |FROM g2""".stripMargin)),

    "profile_ab_ttest" -> QuerySpec(
      (s, d) => ProfileOps.welchTTest(
        t(s, d, "events").select(col("event_type").as("g"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "g", "cents", groupA = "click", groupB = "view"),
      Some("""WITH e AS (
             |  SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events),
             |m AS (SELECT
             |  CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |  CAST(SUM(CASE WHEN g = 'click' THEN x ELSE 0 END) AS BIGINT) AS sx1,
             |  CAST(SUM(CASE WHEN g = 'click' THEN CAST(x AS DECIMAL(38,0)) * x
             |    ELSE 0 END) AS DECIMAL(38,0)) AS sxx1,
             |  CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |  CAST(SUM(CASE WHEN g = 'view' THEN x ELSE 0 END) AS BIGINT) AS sx2,
             |  CAST(SUM(CASE WHEN g = 'view' THEN CAST(x AS DECIMAL(38,0)) * x
             |    ELSE 0 END) AS DECIMAL(38,0)) AS sxx2
             |  FROM e),
             |v AS (SELECT n1, n2,
             |  CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
             |  CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean2,
             |  CAST(CAST(CAST(n1 AS DECIMAL(38,0)) * sxx1
             |      - CAST(sx1 AS DECIMAL(19,0)) * CAST(sx1 AS DECIMAL(19,0))
             |      AS VARCHAR) AS DOUBLE)
             |    / CAST(n1 * n1 * (n1 - 1) AS DOUBLE) AS v1,
             |  CAST(CAST(CAST(n2 AS DECIMAL(38,0)) * sxx2
             |      - CAST(sx2 AS DECIMAL(19,0)) * CAST(sx2 AS DECIMAL(19,0))
             |      AS VARCHAR) AS DOUBLE)
             |    / CAST(n2 * n2 * (n2 - 1) AS DOUBLE) AS v2
             |  FROM m)
             |SELECT n1, n2, mean1, mean2, v1, v2,
             |  (mean1 - mean2) / sqrt(v1 + v2) AS t,
             |  ((v1 + v2) * (v1 + v2))
             |    / (v1 * v1 / CAST(n1 - 1 AS DOUBLE)
             |       + v2 * v2 / CAST(n2 - 1 AS DOUBLE)) AS df
             |FROM v""".stripMargin)),

    // Robust per-group scaling (ProfileOps.robustScale): (x − median)
    // / IQR — prep_zscore_group's heavy-tail-safe sibling. Dyadic
    // quantile ranks keep median/IQR of integer cents exactly
    // representable; ONE division per row; IQR = 0 → NULL. Fully
    // oracled at row grain.
    "prep_robust_scale" -> QuerySpec(
      (s, d) => ProfileOps.robustScale(
        t(s, d, "events").select(
          (col("user_id") % 7).as("grp"),
          col("event_id"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "grp", "cents", broadcastGroupStats = true)
        .orderBy(col("grp"), col("event_id")),
      Some("""WITH e AS (
             |  SELECT user_id % 7 AS grp, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |st AS (SELECT grp,
             |         quantile_cont(cents, 0.5) AS med,
             |         quantile_cont(cents, 0.75) - quantile_cont(cents, 0.25)
             |           AS iqr
             |       FROM e GROUP BY 1)
             |SELECT e.grp, e.event_id, e.cents,
             |  CASE WHEN st.iqr <> 0.0
             |    THEN (e.cents - st.med) / st.iqr END AS scaled
             |FROM e JOIN st USING (grp)
             |ORDER BY grp, event_id""".stripMargin)),

    // Tukey-fence (IQR) outliers per group (ProfileOps.iqrOutliers):
    // the box-plot gate, profile_mad_outliers' quartile sibling. Same
    // integer-cents quantization; p ∈ {0.25, 0.75} interpolation
    // fractions are exact binary rationals, so quartiles, 1.5·IQR and
    // both fences are exactly representable and every comparison is
    // bit-determined (percentile ≡ quantile_cont pinned by
    // fn_percentile) ⇒ fully oracled.
    "profile_iqr_outliers" -> QuerySpec(
      (s, d) => ProfileOps.iqrOutliers(
        t(s, d, "events").select(
          (col("user_id") % 7).as("grp"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "grp", "cents", k = 1.5, broadcastGroupStats = true)
        .orderBy(col("grp")),
      Some("""WITH e AS (
             |  SELECT user_id % 7 AS grp,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |st AS (SELECT grp, quantile_cont(cents, 0.25) AS q1,
             |         quantile_cont(cents, 0.75) AS q3,
             |         count(cents) AS n
             |       FROM e GROUP BY 1)
             |SELECT e.grp, CAST(max(st.n) AS BIGINT) AS n,
             |  max(st.q1) AS q1, max(st.q3) AS q3,
             |  max(st.q3 - st.q1) AS iqr,
             |  CAST(SUM(CASE WHEN e.cents < st.q1 - 1.5 * (st.q3 - st.q1)
             |    OR e.cents > st.q3 + 1.5 * (st.q3 - st.q1)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM e JOIN st USING (grp) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Label-centroid cosine matrix (SimilarityOps.centroidCosineMatrix):
    // pairwise cosine between per-label mean embeddings — the
    // cluster-separability diagnostic before sampling/distillation.
    // Cosine's scale invariance removes the mean's 1/n: the quantized
    // per-(label, dim) SUM is the centroid up to scale, dots and norms
    // are exact integers, each cosine ONE fixed IEEE sequence
    // (dot / (sqrt·sqrt)) ⇒ fully oracled. One corpus-scale
    // (label, dim) aggregation; labels² pair grid is model-sized.
    "sim_centroid_matrix" -> QuerySpec(
      (s, d) => SimilarityOps.centroidCosineMatrix(
        t(s, d, "embeddings"), "label", "embedding"),
      Some("""WITH q AS (
             |  SELECT label AS lab,
             |    unnest(range(len(embedding))) AS pos,
             |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000)
             |      AS BIGINT) AS qv
             |  FROM embeddings),
             |sums AS (SELECT lab, pos, CAST(SUM(qv) AS HUGEINT) AS s
             |         FROM q GROUP BY 1, 2),
             |norms AS (SELECT lab, CAST(SUM(s * s) AS HUGEINT) AS nq
             |          FROM sums GROUP BY 1),
             |dots AS (
             |  SELECT a.lab AS label_a, b.lab AS label_b,
             |    CAST(SUM(a.s * b.s) AS DECIMAL(38,0)) AS dot
             |  FROM sums a JOIN sums b ON a.pos = b.pos AND a.lab < b.lab
             |  GROUP BY 1, 2)
             |SELECT label_a, label_b,
             |  CAST(CAST(dot AS VARCHAR) AS DOUBLE) AS dot,
             |  CAST(CAST(dot AS VARCHAR) AS DOUBLE)
             |    / (sqrt(CAST(CAST(na.nq AS VARCHAR) AS DOUBLE))
             |       * sqrt(CAST(CAST(nb.nq AS VARCHAR) AS DOUBLE)))
             |    AS cosine
             |FROM dots
             |JOIN norms na ON na.lab = label_a
             |JOIN norms nb ON nb.lab = label_b
             |ORDER BY label_a, label_b""".stripMargin)),

    // Per-group binomial rate + Wilson score interval
    // (ProfileOps.rateWilsonCi): "is this slice's failure rate really
    // elevated or is the group just small" — the quality-dashboard
    // uncertainty band. ONE map-side-combinable aggregate to exact
    // (n, k) longs, then a fixed per-group IEEE sequence (sqrt is
    // correctly rounded) ⇒ fully oracled bit-for-bit.
    // CALIBRATION of the NB quality classifier (round 13, the verdict's
    // headline ask): does nbScore's probability MEAN anything, or is
    // the distillation tier just a ranker? Reliability diagram over the
    // planted rule labels (the text_nb_quality_distill fixture: C4
    // heuristic flags as ground truth, NB distilled from them) plus
    // Brier score and ECE. P(keep) = sigmoid of the LENGTH-NORMALIZED
    // score margin (sigmoid(8·delta/n_tokens) — raw NB margins over
    // hundreds of tokens saturate every p to 0/1, while the bare
    // per-token margin compresses everything into one bin; the fixed
    // temperature 8 is the single platt-style scale the curve is read
    // at, and the diagram shows whether even the best constant
    // temperature calibrates). Exactness discipline:
    // delta is an EXACT decimal (difference of exact score sums), the
    // sigmoid is the only transcendental and its output is quantized
    // ONCE to DECIMAL(12,6) (the ClassifyOps boundary-flake argument:
    // a ≤2-ulp libm exp() disagreement flips a 1e-6 quantization
    // boundary with probability ~1e-10/doc); bins are floor(10·p) on
    // the quantized decimal — exact-decimal bin edges — and every
    // bin/global statistic is exact-decimal algebra with ONE IEEE
    // division at presentation (wide sums bridge DuckDB→double through
    // VARCHAR). Scale shape: fit + score are the distill key's plan;
    // the 10-row bin frame takes a localCheckpoint seam before the
    // global-stats crossJoin (consume-once — else the corpus-scale
    // score subtree re-executes per branch).
    "profile_calibration" -> QuerySpec(
      (s, d) => {
        val toksB = split(col("text"), " ")
        val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toksB, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        val labeled = TextOps.c4QualityFlags(built, "text")
          .select(col("doc_id"),
            when(col("keep") === 1, lit("keep")).otherwise(lit("drop"))
              .as("rule_label"))
        val model = nbCalibModel(s, d, ClassifyOps.nbFit(
          labeled.join(built, Seq("doc_id")), "text", "rule_label"))
        val piv = ClassifyOps.nbScoreWith(built, "doc_id", "text", model)
          .groupBy(col("doc_id"))
          .agg(max(when(col("_label") === "keep", col("score"))).as("s_keep"),
            max(when(col("_label") === "drop", col("score"))).as("s_drop"),
            max(col("n_tokens")).as("n_tok"))
        val pd = piv.join(labeled, Seq("doc_id"))
          .select(
            (lit(1.0) / (lit(1.0) + exp(-(lit(8.0) *
              (col("s_keep") - col("s_drop")).cast(DoubleType) /
                col("n_tok").cast(DoubleType)))))
              .cast(DecimalType(12, 6)).as("p"),
            when(col("rule_label") === "keep", 1).otherwise(0).as("y"))
        val dcol = col("p") - col("y").cast(DecimalType(7, 6))
        val bins = pd
          .withColumn("bin", least(floor(col("p") * 10).cast(IntegerType), lit(9)))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            sum(col("p")).as("sum_p"),
            sum(col("y").cast(LongType)).as("sum_y"),
            sum((dcol * dcol).cast(DecimalType(27, 12))).as("sum_sq"))
          .localCheckpoint() // ≤10 rows; consumed twice below
        val g = bins.agg(sum(col("n")).as("nn"),
          sum(col("sum_sq")).as("tot_sq"),
          sum(abs(col("sum_y").cast(DecimalType(20, 6)) - col("sum_p")))
            .as("tot_gap"))
        bins.crossJoin(broadcast(g))
          .select(col("bin"), col("n"),
            (col("sum_p").cast(DoubleType) / col("n").cast(DoubleType))
              .as("mean_pred"),
            (col("sum_y").cast(DoubleType) / col("n").cast(DoubleType))
              .as("frac_pos"),
            (abs(col("sum_y").cast(DecimalType(20, 6)) - col("sum_p"))
              .cast(DoubleType) / col("n").cast(DoubleType)).as("abs_gap"),
            (col("tot_sq").cast(DoubleType) / col("nn").cast(DoubleType))
              .as("brier"),
            (col("tot_gap").cast(DoubleType) / col("nn").cast(DoubleType))
              .as("ece"))
          .orderBy(col("bin"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |lab AS MATERIALIZED (
             |  SELECT doc_id, text,
             |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
             |              AND NOT contains(text, '{')
             |              AND len(list_filter(string_split(text, chr(10)),
             |                l -> regexp_matches(trim(l), '[.!?"]$')
             |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
             |                  >= 3
             |         THEN 'keep' ELSE 'drop' END AS label
             |  FROM built),
             |toks0 AS (
             |  SELECT doc_id, label,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM lab),
             |t AS MATERIALIZED (SELECT * FROM toks0 WHERE length(tok) > 0),
             |ct AS (SELECT label, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |tot AS MATERIALIZED (
             |  SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM t),
             |lp AS (
             |  SELECT label, tok,
             |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
             |  FROM ct JOIN tot USING (label) CROSS JOIN v),
             |dflt AS (
             |  SELECT label,
             |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
             |  FROM tot CROSS JOIN v),
             |prior AS (
             |  SELECT label,
             |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lab))
             |      AS DECIMAL(20,6)) AS prior
             |  FROM lab GROUP BY 1),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, c.label, p.prior,
             |    sum(dt.cnt) AS n_tok,
             |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
             |  FROM dt
             |  CROSS JOIN (SELECT label FROM tot) c
             |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
             |  JOIN dflt f ON f.label = c.label
             |  JOIN prior p ON p.label = c.label
             |  GROUP BY dt.doc_id, c.label, p.prior),
             |piv AS (
             |  SELECT doc_id,
             |    max(CASE WHEN label = 'keep' THEN prior + ll END) AS s_keep,
             |    max(CASE WHEN label = 'drop' THEN prior + ll END) AS s_drop,
             |    max(n_tok) AS n_tok
             |  FROM scored GROUP BY doc_id),
             |pd AS (
             |  SELECT CAST(1.0 / (1.0 + exp(-(8.0 *
             |      CAST(CAST(pv.s_keep - pv.s_drop AS VARCHAR) AS DOUBLE)
             |        / CAST(pv.n_tok AS DOUBLE)))) AS DECIMAL(12,6)) AS p,
             |    CASE WHEN l.label = 'keep' THEN 1 ELSE 0 END AS y
             |  FROM piv pv JOIN lab l USING (doc_id)),
             |b AS MATERIALIZED (
             |  SELECT CAST(LEAST(CAST(floor(p * 10) AS INTEGER), 9) AS INTEGER) AS bin,
             |    CAST(count(*) AS BIGINT) AS n,
             |    SUM(p) AS sum_p,
             |    CAST(SUM(y) AS BIGINT) AS sum_y,
             |    SUM(CAST((CAST(p AS DECIMAL(13,6)) - CAST(y AS DECIMAL(7,6)))
             |      * (CAST(p AS DECIMAL(13,6)) - CAST(y AS DECIMAL(7,6)))
             |      AS DECIMAL(27,12))) AS sum_sq
             |  FROM pd GROUP BY 1),
             |g AS (
             |  SELECT CAST(SUM(n) AS BIGINT) AS nn, SUM(sum_sq) AS tot_sq,
             |    SUM(abs(CAST(sum_y AS DECIMAL(20,6)) - sum_p)) AS tot_gap
             |  FROM b)
             |SELECT bin, n,
             |  CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
             |    AS mean_pred,
             |  CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
             |  CAST(CAST(abs(CAST(sum_y AS DECIMAL(20,6)) - sum_p) AS VARCHAR)
             |    AS DOUBLE) / CAST(n AS DOUBLE) AS abs_gap,
             |  CAST(CAST(tot_sq AS VARCHAR) AS DOUBLE) / CAST(nn AS DOUBLE)
             |    AS brier,
             |  CAST(CAST(tot_gap AS VARCHAR) AS DOUBLE) / CAST(nn AS DOUBLE)
             |    AS ece
             |FROM b CROSS JOIN g ORDER BY bin""".stripMargin),
      allowBnlj = true),

    // RECALIBRATION of the NB tier by isotonic regression (round 14,
    // CalibrateOps — the verdict's ask: profile_calibration MEASURED
    // Brier 0.194 / ECE 0.184, this key ACTS on it). Fit on the even
    // doc_id split, evaluate on the odd: the same sigmoid(8·margin/
    // n_tok) p as the calibration key quantizes onto a hard-bounded
    // 10⁴-cell grid (ONE map-side-combinable aggregation, ≤10001 rows
    // at ANY corpus size — never a global sort), exact BigInt PAV on
    // the driver (the bpeFit model-fit contract), and the DENSE step
    // function stages as the frozen parquet artifact (the
    // prep_target_encode fit-table contract) that serve-time reloads
    // and broadcast-EQUI-joins — no as-of machinery on the hot path.
    // The fit is REFUTED, not trusted, by two independent mechanisms
    // (CalibrateOps scaladoc, conditions 1-6): Spark re-checks in-plan
    // with window functions over the same localCheckpoint'd fit grid
    // the driver collected (no second corpus pass), and DuckDB
    // re-derives ALL six conditions in SQL — including the
    // prefix-mean/complementary-slackness condition that separates
    // "a monotone step function" from THE unique L2 isotonic fit.
    // Metrics: held-out pre/post ECE (each binned on its OWN
    // probability — the (pre-bin × post-bin) composite cube is
    // aggregated in ONE eval pass, ≤100 rows, localCheckpoint'd, and
    // both marginal binnings derive from it) and pre/post Brier;
    // ok_improved compares the two ECE numerators EXACTLY (integer
    // micro-gaps vs decimal gaps ×10⁶) before any division.
    "profile_recalibrate" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val pdDir = recalScoresDir(s, d)
        def pdOf(parity: Int) = s.read.parquet(pdDir)
          .filter(pmod(col("doc_id"), lit(2)) === parity)
        def cellOf(p: Column): Column =
          floor(p * lit(10000)).cast(IntegerType)
        // --- FIT: grid → driver PAV → frozen dense artifact ---
        val fitGrid = pdOf(0)
          .groupBy(cellOf(col("p")).as("cell"))
          .agg(count(lit(1)).as("n"), sum(col("y").cast(LongType)).as("sy"))
          .localCheckpoint() // ≤10001 rows; feeds the collect AND the check
        val cal = CalibrateOps.isotonicFitDense(fitGrid)
        val calDir = staged(d, "isotonic_cal") { dir =>
          cal.toDF().coalesce(1).write.mode("overwrite").parquet(dir)
        }
        val calDf = s.read.parquet(calDir) // frozen-artifact serve path
        val chkPav = CalibrateOps.isotonicCheck(calDf, fitGrid)
        // --- EVAL on the held-out split ---
        val ej = pdOf(1)
          .withColumn("cell", cellOf(col("p")))
          .join(broadcast(calDf.select(col("cell"), col("calMicro"))),
            Seq("cell"))
        val dpre = col("p") - col("y").cast(DecimalType(7, 6))
        val dpost = col("calMicro") - col("y").cast(LongType) * lit(1000000L)
        val cube = ej
          .withColumn("bin", least(floor(col("p") * 10).cast(IntegerType),
            lit(9)))
          .withColumn("binq", least(floor(col("calMicro") / 100000)
            .cast(IntegerType), lit(9)))
          .groupBy(col("bin"), col("binq"))
          .agg(count(lit(1)).as("n"),
            sum(col("p")).as("sum_p"),
            sum(col("y").cast(LongType)).as("sum_y"),
            sum((dpre * dpre).cast(DecimalType(27, 12))).as("sum_sq"),
            sum(col("calMicro")).as("sum_pm"),
            sum((dpost * dpost).cast(DecimalType(38, 0))).as("sum_sqq"))
          .localCheckpoint() // ≤100 rows; both marginals + globals below
        val bp = cube.groupBy(col("bin"))
          .agg(sum(col("n")).as("n"), sum(col("sum_p")).as("sum_p"),
            sum(col("sum_y")).as("sum_y"), sum(col("sum_pm")).as("sum_pm"))
        val gapPre = abs(col("sum_y").cast(DecimalType(20, 6)) - col("sum_p"))
        val gPre = bp.agg(sum(col("n")).as("nn"),
          sum(gapPre).as("tot_gap"))
        val gPost = cube.groupBy(col("binq"))
          .agg(sum(col("sum_y")).as("_sy"), sum(col("sum_pm")).as("_spm"))
          .agg(sum(abs(col("_sy").cast(DecimalType(20, 0)) * lit(1000000L) -
            col("_spm").cast(DecimalType(27, 0)))).as("tot_gapq"))
        val gSq = cube.agg(sum(col("sum_sq")).as("tot_sq"),
          sum(col("sum_sqq")).as("tot_sqq"))
        bp.crossJoin(broadcast(gPre))
          .crossJoin(broadcast(gPost))
          .crossJoin(broadcast(gSq))
          .crossJoin(broadcast(chkPav))
          .select(col("bin"), col("n"),
            (col("sum_p").cast(DoubleType) / col("n").cast(DoubleType))
              .as("mean_pred"),
            (col("sum_pm").cast(DoubleType) /
              (col("n").cast(DoubleType) * lit(1.0e6))).as("mean_post"),
            (col("sum_y").cast(DoubleType) / col("n").cast(DoubleType))
              .as("frac_pos"),
            (col("tot_sq").cast(DoubleType) / col("nn").cast(DoubleType))
              .as("brier_pre"),
            (col("tot_sqq").cast(DoubleType) /
              (col("nn").cast(DoubleType) * lit(1.0e12))).as("brier_post"),
            (col("tot_gap").cast(DoubleType) / col("nn").cast(DoubleType))
              .as("ece_pre"),
            (col("tot_gapq").cast(DoubleType) /
              (col("nn").cast(DoubleType) * lit(1.0e6))).as("ece_post"),
            col("n_pav_bad"),
            // EXACT numerator compare: gaps share the denominator nn
            when(col("tot_gapq").cast(DecimalType(38, 6)) <
              col("tot_gap").cast(DecimalType(30, 6)) * lit(1000000L), 1)
              .otherwise(0).as("ok_improved"))
          .orderBy(col("bin"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |lab AS MATERIALIZED (
             |  SELECT doc_id, text,
             |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
             |              AND NOT contains(text, '{')
             |              AND len(list_filter(string_split(text, chr(10)),
             |                l -> regexp_matches(trim(l), '[.!?"]$')
             |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
             |                  >= 3
             |         THEN 'keep' ELSE 'drop' END AS label
             |  FROM built),
             |toks0 AS (
             |  SELECT doc_id, label,
             |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
             |  FROM lab),
             |t AS MATERIALIZED (SELECT * FROM toks0 WHERE length(tok) > 0),
             |ct AS (SELECT label, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |tot AS MATERIALIZED (
             |  SELECT label, sum(cnt) AS total FROM ct GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS v FROM t),
             |lp AS (
             |  SELECT label, tok,
             |    CAST(ln((cnt + 0.5) / (total + 0.5 * v)) AS DECIMAL(20,6)) AS lp
             |  FROM ct JOIN tot USING (label) CROSS JOIN v),
             |dflt AS (
             |  SELECT label,
             |    CAST(ln(0.5 / (total + 0.5 * v)) AS DECIMAL(20,6)) AS dlp
             |  FROM tot CROSS JOIN v),
             |prior AS (
             |  SELECT label,
             |    CAST(ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lab))
             |      AS DECIMAL(20,6)) AS prior
             |  FROM lab GROUP BY 1),
             |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
             |scored AS (
             |  SELECT dt.doc_id, c.label, p.prior,
             |    sum(dt.cnt) AS n_tok,
             |    sum(CAST(dt.cnt AS DECIMAL(10,0)) * coalesce(lp.lp, f.dlp)) AS ll
             |  FROM dt
             |  CROSS JOIN (SELECT label FROM tot) c
             |  LEFT JOIN lp ON lp.tok = dt.tok AND lp.label = c.label
             |  JOIN dflt f ON f.label = c.label
             |  JOIN prior p ON p.label = c.label
             |  GROUP BY dt.doc_id, c.label, p.prior),
             |piv AS (
             |  SELECT doc_id,
             |    max(CASE WHEN label = 'keep' THEN prior + ll END) AS s_keep,
             |    max(CASE WHEN label = 'drop' THEN prior + ll END) AS s_drop,
             |    max(n_tok) AS n_tok
             |  FROM scored GROUP BY doc_id),
             |pd AS MATERIALIZED (
             |  SELECT pv.doc_id,
             |    CAST(1.0 / (1.0 + exp(-(8.0 *
             |      CAST(CAST(pv.s_keep - pv.s_drop AS VARCHAR) AS DOUBLE)
             |        / CAST(pv.n_tok AS DOUBLE)))) AS DECIMAL(12,6)) AS p,
             |    CASE WHEN l.label = 'keep' THEN 1 ELSE 0 END AS y
             |  FROM piv pv JOIN lab l USING (doc_id)),
             |cal AS MATERIALIZED (
             |  SELECT cell, n, sy, blkN, blkSy, calMicro FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/isotonic_cal/*.parquet')),
             |fg AS (
             |  SELECT CAST(floor(p * 10000) AS INTEGER) AS cell,
             |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
             |  FROM pd WHERE doc_id % 2 = 0 GROUP BY 1),
             |cj AS MATERIALIZED (
             |  SELECT c.cell, c.n, c.sy, c.blkN, c.blkSy, c.calMicro,
             |    COALESCE(f.n, 0) AS gn, COALESCE(f.sy, 0) AS gsy
             |  FROM cal c LEFT JOIN fg f USING (cell)),
             |gb AS (
             |  SELECT CAST(SUM(CASE WHEN gn <> n OR gsy <> sy
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |    + CASE WHEN count(*) <> 10001 THEN 1 ELSE 0 END AS bad
             |  FROM cj),
             |obs AS (
             |  SELECT *, CASE WHEN lag(blkN) OVER w IS NULL
             |      OR lag(blkN) OVER w <> blkN
             |      OR lag(blkSy) OVER w <> blkSy THEN 1 ELSE 0 END AS chg
             |  FROM cj WHERE n > 0 WINDOW w AS (ORDER BY cell)),
             |runs AS (SELECT *, SUM(chg) OVER (ORDER BY cell) AS run FROM obs),
             |pref AS (
             |  SELECT *, SUM(n) OVER pw AS pn, SUM(sy) OVER pw AS psy
             |  FROM runs WINDOW pw AS (PARTITION BY run ORDER BY cell
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |pr AS (
             |  SELECT run, MAX(blkN) AS bn, MIN(blkN) AS bn2,
             |    MAX(blkSy) AS bsy, MIN(blkSy) AS bsy2,
             |    SUM(n) AS rn, SUM(sy) AS rsy,
             |    MAX(calMicro) AS cm, MIN(calMicro) AS cm2,
             |    SUM(CASE WHEN CAST(psy AS HUGEINT) * blkN
             |        < CAST(blkSy AS HUGEINT) * pn THEN 1 ELSE 0 END)
             |      AS prefbad
             |  FROM pref GROUP BY run),
             |pr2 AS (
             |  SELECT *,
             |    CASE WHEN lag(bsy) OVER (ORDER BY run) IS NOT NULL
             |      AND CAST(lag(bsy) OVER (ORDER BY run) AS HUGEINT) * bn
             |          >= CAST(bsy AS HUGEINT) * lag(bn) OVER (ORDER BY run)
             |      THEN 1 ELSE 0 END AS monobad
             |  FROM pr),
             |rb AS (
             |  SELECT CAST(SUM(
             |      CASE WHEN bn <> bn2 OR bsy <> bsy2 OR cm <> cm2
             |        OR rn <> bn OR rsy <> bsy THEN 1 ELSE 0 END
             |    + CASE WHEN cm <> (2*1000000*CAST(bsy AS HUGEINT) + bn)
             |        // (2*CAST(bn AS HUGEINT)) THEN 1 ELSE 0 END
             |    + monobad + prefbad) AS BIGINT) AS bad
             |  FROM pr2),
             |fl0 AS (
             |  SELECT *, last_value(CASE WHEN n > 0 THEN calMicro END
             |      IGNORE NULLS) OVER (ORDER BY cell
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastobs,
             |    first_value(CASE WHEN n > 0 THEN calMicro END IGNORE NULLS)
             |      OVER (ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND UNBOUNDED FOLLOWING) AS firstobs
             |  FROM cj),
             |fb AS (
             |  SELECT CAST(SUM(CASE WHEN n = 0
             |      AND calMicro <> COALESCE(lastobs, firstobs)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS bad
             |  FROM fl0),
             |pav AS (SELECT gb.bad + rb.bad + fb.bad AS n_pav_bad
             |        FROM gb, rb, fb),
             |ej AS MATERIALIZED (
             |  SELECT e.p, e.y, c.calMicro AS pm
             |  FROM (SELECT CAST(floor(p * 10000) AS INTEGER) AS cell, p, y
             |        FROM pd WHERE doc_id % 2 = 1) e
             |  JOIN cal c USING (cell)),
             |bp AS MATERIALIZED (
             |  SELECT CAST(LEAST(CAST(floor(p * 10) AS INTEGER), 9)
             |      AS INTEGER) AS bin,
             |    CAST(count(*) AS BIGINT) AS n, SUM(p) AS sum_p,
             |    CAST(SUM(y) AS BIGINT) AS sum_y,
             |    SUM(CAST((CAST(p AS DECIMAL(13,6)) - CAST(y AS DECIMAL(7,6)))
             |      * (CAST(p AS DECIMAL(13,6)) - CAST(y AS DECIMAL(7,6)))
             |      AS DECIMAL(27,12))) AS sum_sq,
             |    CAST(SUM(pm) AS BIGINT) AS sum_pm,
             |    SUM(CAST((pm - y*1000000) * (pm - y*1000000)
             |      AS DECIMAL(38,0))) AS sum_sqq
             |  FROM ej GROUP BY 1),
             |bq AS (
             |  SELECT LEAST(CAST(pm // 100000 AS INTEGER), 9) AS binq,
             |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(pm) AS BIGINT) AS spm
             |  FROM ej GROUP BY 1),
             |gpre AS (
             |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
             |    SUM(abs(CAST(sum_y AS DECIMAL(20,6)) - sum_p)) AS tot_gap,
             |    SUM(sum_sq) AS tot_sq, SUM(sum_sqq) AS tot_sqq
             |  FROM bp),
             |gpost AS (
             |  SELECT SUM(abs(CAST(sy AS HUGEINT) * 1000000 - spm))
             |    AS tot_gapq
             |  FROM bq)
             |SELECT bin, n,
             |  CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
             |    AS mean_pred,
             |  CAST(sum_pm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
             |    AS mean_post,
             |  CAST(sum_y AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
             |  CAST(CAST(tot_sq AS VARCHAR) AS DOUBLE) / CAST(nn AS DOUBLE)
             |    AS brier_pre,
             |  CAST(tot_sqq AS DOUBLE) / (CAST(nn AS DOUBLE) * 1.0e12)
             |    AS brier_post,
             |  CAST(CAST(tot_gap AS VARCHAR) AS DOUBLE) / CAST(nn AS DOUBLE)
             |    AS ece_pre,
             |  CAST(tot_gapq AS DOUBLE) / (CAST(nn AS DOUBLE) * 1000000.0)
             |    AS ece_post,
             |  n_pav_bad,
             |  CAST(CASE WHEN CAST(tot_gapq AS DECIMAL(38,6))
             |    < CAST(tot_gap AS DECIMAL(30,6)) * 1000000 THEN 1 ELSE 0 END
             |    AS INTEGER) AS ok_improved
             |FROM bp CROSS JOIN gpre CROSS JOIN gpost CROSS JOIN pav
             |ORDER BY bin""".stripMargin),
      allowBnlj = true),

    // ROC AUC of the NB quality ranker (ProfileOps.rocAuc over the
    // SAME staged (doc_id, p, y) score table profile_recalibrate
    // reads) — the third leg of the classifier-evaluation tier:
    // profile_calibration judges the PROBABILITIES (ECE/Brier),
    // profile_recalibrate FIXES them, this key judges the ORDERING
    // (threshold-free — a perfectly calibrated coin flip scores
    // AUC 0.5; a miscalibrated-but-perfect ranker scores 1.0). The
    // rank-sum identity runs in exact integers end-to-end: value-grain
    // doubled tie ranks (no .5 minted), DECIMAL(38,0) rank sum, ONE
    // closing IEEE division — the oracle restates the identical chain
    // with HUGEINT ranks over the shared NB CTE pipeline.
    "profile_auc" -> QuerySpec(
      (s, d) => ProfileOps.rocAuc(
        s.read.parquet(recalScoresDir(s, d)), "p", "y"),
      Some(nbScorePdCtes + ",\n" +
        """g AS (SELECT p, CAST(count(*) AS BIGINT) AS c,
             |        CAST(sum(y) AS BIGINT) AS pos
             |      FROM pd GROUP BY 1),
             |r AS (
             |  SELECT p, c, pos,
             |    2 * COALESCE(SUM(c) OVER (ORDER BY p
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + c + 1 AS r2
             |  FROM g),
             |m AS (
             |  SELECT CAST(SUM(c) AS BIGINT) AS n,
             |    CAST(SUM(pos) AS BIGINT) AS npos,
             |    SUM(CAST(r2 AS HUGEINT) * pos) AS r2pos
             |  FROM r)
             |SELECT n, npos AS n_pos, n - npos AS n_neg,
             |  CASE WHEN npos > 0 AND n - npos > 0 THEN
             |    CAST(r2pos - CAST(npos AS HUGEINT) * (npos + 1) AS DOUBLE) /
             |    CAST(2 * CAST(npos AS HUGEINT) * (n - npos) AS DOUBLE)
             |  END AS auc,
             |  2.0 * (CASE WHEN npos > 0 AND n - npos > 0 THEN
             |    CAST(r2pos - CAST(npos AS HUGEINT) * (npos + 1) AS DOUBLE) /
             |    CAST(2 * CAST(npos AS HUGEINT) * (n - npos) AS DOUBLE)
             |  END) - 1.0 AS gini
             |FROM m""".stripMargin),
      allowBnlj = true),

    // Decile lift / cumulative-gains table (ProfileOps.liftTable) over
    // the same staged NB score table — AUC's operational readout: "act
    // on the top-k deciles, capture what share of the positives". The
    // buckets are rank·10 div N over the deterministic (score DESC,
    // doc_id) total order (the curriculumSample exact-integer-edge
    // contract; rank via range-sort + zipWithIndex, never a
    // partition-less window); rate/lift/gain are single IEEE divisions
    // of exact longs (lift's cross products in DECIMAL). The oracle
    // restates the rank as row_number()−1 over the same total order.
    "profile_lift" -> QuerySpec(
      (s, d) => ProfileOps.liftTable(
        s.read.parquet(recalScoresDir(s, d)), "p", "y", "doc_id",
        nBuckets = 10),
      Some(nbScorePdCtes + ",\n" +
        """r AS (
          |  SELECT p, y,
          |    row_number() OVER (ORDER BY p DESC, doc_id) - 1 AS rk
          |  FROM pd),
          |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |         CAST(SUM(y) AS BIGINT) AS pos FROM pd),
          |b AS (
          |  SELECT CAST((rk * 10) // nn.n AS INTEGER) AS bucket,
          |    CAST(count(*) AS BIGINT) AS nb, CAST(SUM(y) AS BIGINT) AS n_pos
          |  FROM r CROSS JOIN nn GROUP BY 1),
          |c AS (
          |  SELECT bucket, nb, n_pos,
          |    CAST(SUM(n_pos) OVER (ORDER BY bucket
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum_pos,
          |    CAST(SUM(nb) OVER (ORDER BY bucket
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum_n
          |  FROM b)
          |SELECT bucket, nb AS n, n_pos,
          |  CAST(n_pos AS DOUBLE) / CAST(nb AS DOUBLE) AS rate,
          |  CASE WHEN nn.pos > 0 THEN
          |    CAST(CAST(n_pos AS DECIMAL(19,0)) * CAST(nn.n AS DECIMAL(19,0))
          |      AS DOUBLE) /
          |    CAST(CAST(nb AS DECIMAL(19,0)) * CAST(nn.pos AS DECIMAL(19,0))
          |      AS DOUBLE) END AS lift,
          |  CASE WHEN nn.pos > 0 THEN
          |    CAST(cum_pos AS DOUBLE) / CAST(nn.pos AS DOUBLE) END AS cum_gain,
          |  CAST(cum_n AS DOUBLE) / CAST(nn.n AS DOUBLE) AS cum_frac
          |FROM c CROSS JOIN nn ORDER BY bucket""".stripMargin),
      allowBnlj = true),

    "profile_rate_ci" -> QuerySpec(
      (s, d) => ProfileOps.rateWilsonCi(
        t(s, d, "orders").select(col("o_orderpriority").as("grp"),
          col("o_orderstatus")),
        "grp", col("o_orderstatus") === "F")
        .orderBy(col("grp")),
      Some("""WITH a AS (
             |  SELECT o_orderpriority AS grp, count(*) AS n,
             |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS k
             |  FROM orders GROUP BY 1),
             |b AS (
             |  SELECT grp, n, k,
             |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS phat,
             |    1.959963984540054 * 1.959963984540054 AS z2,
             |    CAST(n AS DOUBLE) AS nd
             |  FROM a)
             |SELECT grp, n, k, phat AS rate,
             |  (phat + z2/(2.0*nd))/(1.0 + z2/nd)
             |    - (1.959963984540054
             |        * sqrt(phat*(1.0-phat)/nd + z2/(4.0*nd*nd)))
             |      /(1.0 + z2/nd) AS ci_lo,
             |  (phat + z2/(2.0*nd))/(1.0 + z2/nd)
             |    + (1.959963984540054
             |        * sqrt(phat*(1.0-phat)/nd + z2/(4.0*nd*nd)))
             |      /(1.0 + z2/nd) AS ci_hi
             |FROM b ORDER BY grp""".stripMargin)),

    // Cohen's kappa between two quality filters (round 14,
    // ProfileOps.cohenKappa): the filter-ensemble audit — C4
    // line-structure keep vs Gopher composite keep on the SAME built
    // multi-line fixture (the profile_calibration corpus). Raw
    // agreement p_o overstates consensus when both filters mostly say
    // keep; kappa chance-corrects against the marginals. ONE
    // aggregation to four exact confusion counts; kappa's division is
    // cleared by ×n² — numerator and denominator exact DECIMAL(38,0)
    // (n² wraps a long at n > ~3e9), ONE IEEE division each for
    // po/pe/kappa; degenerate marginals yield NULL kappa identically
    // cross-engine. The oracle re-derives BOTH filters from scratch
    // (C4 line rules; Gopher features over the \s+ token grain — the
    // built text is multi-line, so the single-space split of the
    // text_gopher_filter oracle would be wrong here).
    "profile_agreement" -> QuerySpec(
      (s, d) => {
        val toksB = split(col("text"), " ")
        val nLines = ceil(size(toksB).cast(DoubleType) / 8).cast(IntegerType)
        val built = t(s, d, "documents").select(col("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), nLines - 1),
              i => concat(
                array_join(slice(toksB, i * 8 + 1, lit(8)), " "),
                when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
              "\n"),
            when(col("doc_id") % 37 === 0, lit("\nsee lorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 41 === 0, lit("\nvar cfg = {")).otherwise(lit("")))
            .as("text"))
        val c4 = TextOps.c4QualityFlags(built, "text")
          .select(col("doc_id"), col("keep").as("_ka"))
        // minStopwords relaxed to 1: the synthetic corpus vocabulary
        // contains exactly ONE of the Gopher stopwords ('the'), so the
        // default 2 makes the rater constant-drop and kappa degenerate
        val gop = TextOps.gopherQualityFlags(built, "text", minStopwords = 1)
          .select(col("doc_id"), col("keep").as("_kb"))
        ProfileOps.cohenKappa(c4.join(gop, Seq("doc_id")),
          col("_ka") === 1, col("_kb") === 1)
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |built AS (
             |  SELECT doc_id,
             |    array_to_string(
             |      list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
             |        i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ') ||
             |             CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
             |      chr(10))
             |    || CASE WHEN doc_id % 37 = 0
             |            THEN chr(10) || 'see lorem ipsum dolor sit amet.'
             |            ELSE '' END
             |    || CASE WHEN doc_id % 41 = 0
             |            THEN chr(10) || 'var cfg = {' ELSE '' END AS text
             |  FROM base),
             |c4 AS (
             |  SELECT doc_id,
             |    CASE WHEN NOT contains(lower(text), 'lorem ipsum')
             |              AND NOT contains(text, '{')
             |              AND len(list_filter(string_split(text, chr(10)),
             |                l -> regexp_matches(trim(l), '[.!?"]$')
             |                     AND len(string_split_regex(trim(l), '\s+')) >= 5))
             |                  >= 3
             |         THEN 1 ELSE 0 END AS ka
             |  FROM built),
             |gf AS (
             |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w,
             |    text FROM built),
             |gop AS (
             |  SELECT doc_id,
             |    CASE WHEN len(w) >= 50 AND len(w) <= 100000
             |      AND CAST(list_sum(list_transform(w, x -> length(x)))
             |            AS DOUBLE) / len(w) >= 3.0
             |      AND CAST(list_sum(list_transform(w, x -> length(x)))
             |            AS DOUBLE) / len(w) <= 10.0
             |      AND CAST(len(regexp_extract_all(text, '#|\.\.\.'))
             |            AS DOUBLE) / len(w) <= 0.1
             |      AND CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
             |            AS DOUBLE) / len(w) >= 0.8
             |      AND len(list_filter(
             |            ['the','be','to','of','and','that','have','with'],
             |            s -> list_contains(w, s))) >= 1
             |    THEN 1 ELSE 0 END AS kb
             |  FROM gf),
             |conf AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN ka = 1 AND kb = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n11,
             |    CAST(SUM(CASE WHEN ka = 1 AND kb = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10,
             |    CAST(SUM(CASE WHEN ka = 0 AND kb = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01,
             |    CAST(SUM(CASE WHEN ka = 0 AND kb = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00
             |  FROM c4 JOIN gop USING (doc_id))
             |SELECT n, n11, n10, n01, n00,
             |  CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
             |  CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |     + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
             |    / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS pe,
             |  CASE WHEN CAST(n AS HUGEINT) * n
             |      - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |         + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) <> 0
             |    THEN CAST(CAST(n AS HUGEINT) * (n11 + n00)
             |        - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS DOUBLE)
             |      / CAST(CAST(n AS HUGEINT) * n
             |        - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
             |           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS DOUBLE)
             |  END AS kappa
             |FROM conf""".stripMargin)),

    // Cohort retention matrix (EventOps.cohortRetention): customers
    // cohorted by first-order month × month offset, retained fraction
    // per cell. ONE shuffle over raw orders (per-actor groupBy with a
    // months-bounded collect_set); cohort size recovered from the
    // matrix's own offset-0 cell via a window max — no second pass.
    // Calendar-integer offset arithmetic + one IEEE division ⇒ oracled.
    // Growth accounting (the Social-Capital framework): per calendar
    // month the NEW / RETAINED (active previous month) / RESURRECTED
    // (returning after a gap) / CHURNED (active last month, absent
    // this month) customer counts and the quick ratio
    // (new+resurrected)/churned — the canonical MAU decomposition.
    // One (customer, month-index) distinct grain, then ONE window
    // projection computing BOTH lag and lead over the same (cust, mi)
    // spec — a single partition sort feeds status AND churn: each row
    // explodes into its status contribution at mi plus (on a following
    // gap) a churn contribution at mi+1, and one groupBy(mi) sums the
    // five counters. The month spine falls out of the explode (a month
    // with zero active customers but nonzero churn still emits its
    // churn row — the active(t) identity holds across fully-inactive
    // months). Month arithmetic is exact integers (mi = y·12 + m−1);
    // the final observed month cannot emit churn (right-censored), so
    // churn attribution stops at the max month (1-row broadcast).
    "agg_growth_accounting" -> QuerySpec(
      (s, d) => {
        val act = t(s, d, "orders")
          .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
          .select(col("o_custkey").as("cust"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
              .as("mi"))
          .distinct()
        val w = Window.partitionBy(col("cust")).orderBy(col("mi"))
        def contribStruct(mi: Column, isNew: Column, isRet: Column,
            isRes: Column, isAct: Column, isChurn: Column) =
          struct(mi.as("mi"), isNew.as("f_new"), isRet.as("f_ret"),
            isRes.as("f_res"), isAct.as("f_act"), isChurn.as("f_churn"))
        val contrib = act
          .withColumn("_prev", lag(col("mi"), 1).over(w))
          .withColumn("_next", lead(col("mi"), 1).over(w))
          .select(explode(concat(
            array(contribStruct(col("mi"),
              when(col("_prev").isNull, 1L).otherwise(0L),
              when(col("mi") - col("_prev") === 1, 1L).otherwise(0L),
              when(col("_prev").isNotNull &&
                col("mi") - col("_prev") > 1, 1L).otherwise(0L),
              lit(1L), lit(0L))),
            when(col("_next").isNull || col("_next") - col("mi") > 1,
              array(contribStruct(col("mi") + 1,
                lit(0L), lit(0L), lit(0L), lit(0L), lit(1L))))
              .otherwise(array().cast("array<struct<mi:int,f_new:bigint," +
                "f_ret:bigint,f_res:bigint,f_act:bigint,f_churn:bigint>>"))))
            .as("c"))
          .select(col("c.*"))
        val maxMi = act.agg(max(col("mi")).as("_maxmi"))
        contrib
          .crossJoin(broadcast(maxMi))
          .filter(col("f_churn") === 0 || col("mi") <= col("_maxmi"))
          .groupBy(col("mi"))
          .agg(sum(col("f_new")).as("n_new"),
            sum(col("f_ret")).as("n_retained"),
            sum(col("f_res")).as("n_resurrected"),
            sum(col("f_act")).as("n_active"),
            sum(col("f_churn")).as("n_churned"))
          .select(
            make_date(expr("mi div 12").cast(IntegerType),
              (pmod(col("mi"), lit(12)) + 1).cast(IntegerType), lit(1))
              .as("month"),
            col("n_new"), col("n_retained"), col("n_resurrected"),
            col("n_active"), col("n_churned"),
            expr("cast(n_new + n_resurrected as double) " +
              "/ cast(nullif(n_churned, 0) as double)").as("quick_ratio"))
          .orderBy(col("month"))
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT o_custkey AS cust,
             |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
             |cl AS (
             |  SELECT mi,
             |    CASE WHEN lag(mi) OVER w IS NULL THEN 'new'
             |         WHEN mi - lag(mi) OVER w = 1 THEN 'retained'
             |         ELSE 'resurrected' END AS status,
             |    lead(mi) OVER w AS nxt
             |  FROM act WINDOW w AS (PARTITION BY cust ORDER BY mi)),
             |sc AS (
             |  SELECT mi,
             |    CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_new,
             |    CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_retained,
             |    CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_resurrected,
             |    CAST(count(*) AS BIGINT) AS n_active
             |  FROM cl GROUP BY 1),
             |mx AS (SELECT max(mi) AS maxmi FROM act),
             |ch AS (
             |  SELECT mi + 1 AS mi, CAST(count(*) AS BIGINT) AS n_churned
             |  FROM cl CROSS JOIN mx
             |  WHERE (nxt IS NULL OR nxt - mi > 1) AND mi < maxmi
             |  GROUP BY 1),
             |months AS (SELECT mi FROM sc UNION SELECT mi FROM ch)
             |SELECT make_date(CAST(m.mi // 12 AS INTEGER),
             |    CAST(m.mi % 12 + 1 AS INTEGER), 1) AS month,
             |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
             |  CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
             |  CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
             |  CAST(COALESCE(n_active, 0) AS BIGINT) AS n_active,
             |  CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned,
             |  CAST(COALESCE(n_new, 0) + COALESCE(n_resurrected, 0) AS DOUBLE)
             |    / CAST(NULLIF(COALESCE(n_churned, 0), 0) AS DOUBLE)
             |    AS quick_ratio
             |FROM months m LEFT JOIN sc USING (mi) LEFT JOIN ch USING (mi)
             |ORDER BY month""".stripMargin),
      allowBnlj = true),

    // Cohort LTV curve (the revenue companion to agg_cohort_retention):
    // per (cohort month, month offset) the cohort's revenue that month,
    // the running cumulative revenue, and LTV per member — revenue
    // accumulates in exact DECIMAL(18,2) (window cumsum included), the
    // two presented doubles are exact casts (values ≪ 2⁵³·scale) and
    // ONE division. Cohort sizes are a month-grain broadcast.
    "agg_cohort_ltv" -> QuerySpec(
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
        val pa = o.groupBy(col("o_custkey").as("actor"))
          .agg(date_trunc("month", min(col("o_orderdate"))).as("_coh"))
        val rev = o.select(col("o_custkey").as("actor"),
            date_trunc("month", col("o_orderdate")).as("_m"),
            col("o_totalprice"))
          .join(pa, "actor")
          .groupBy(col("_coh").cast(DateType).as("cohort_month"),
            ((year(col("_m")) - year(col("_coh"))) * 12 +
              (month(col("_m")) - month(col("_coh"))))
              .cast(IntegerType).as("month_offset"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("_rev"))
        val size = pa.groupBy(col("_coh").cast(DateType).as("cohort_month"))
          .agg(count(lit(1)).as("cohort_size"))
        val w = Window.partitionBy(col("cohort_month"))
          .orderBy(col("month_offset"))
          .rowsBetween(Window.unboundedPreceding, 0)
        rev.join(broadcast(size), Seq("cohort_month"))
          .withColumn("_cum", sum(col("_rev")).over(w))
          .select(col("cohort_month"), col("month_offset"),
            col("_rev").cast(DoubleType).as("month_revenue"),
            col("_cum").cast(DoubleType).as("cum_revenue"),
            col("cohort_size"),
            (col("_cum").cast(DoubleType) /
              col("cohort_size").cast(DoubleType)).as("ltv_per_member"))
          .orderBy(col("cohort_month"), col("month_offset"))
      },
      Some("""WITH src AS (
             |  SELECT * FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
             |pa AS (
             |  SELECT o_custkey AS actor,
             |    date_trunc('month', min(o_orderdate)) AS coh
             |  FROM src GROUP BY 1),
             |rev AS (
             |  SELECT CAST(pa.coh AS DATE) AS cohort_month,
             |    CAST((year(date_trunc('month', s.o_orderdate)) - year(pa.coh))
             |      * 12 + (month(date_trunc('month', s.o_orderdate))
             |      - month(pa.coh)) AS INTEGER) AS month_offset,
             |    SUM(CAST(s.o_totalprice AS DECIMAL(18,2))) AS r
             |  FROM src s JOIN pa ON pa.actor = s.o_custkey
             |  GROUP BY 1, 2),
             |sz AS (
             |  SELECT CAST(coh AS DATE) AS cohort_month,
             |    CAST(count(*) AS BIGINT) AS cohort_size
             |  FROM pa GROUP BY 1),
             |c AS (
             |  SELECT rev.*, sz.cohort_size,
             |    SUM(r) OVER (PARTITION BY rev.cohort_month
             |      ORDER BY month_offset
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM rev JOIN sz USING (cohort_month))
             |SELECT cohort_month, month_offset,
             |  CAST(r AS DOUBLE) AS month_revenue,
             |  CAST(cum AS DOUBLE) AS cum_revenue, cohort_size,
             |  CAST(cum AS DOUBLE) / CAST(cohort_size AS DOUBLE)
             |    AS ltv_per_member
             |FROM c ORDER BY cohort_month, month_offset""".stripMargin)),

    "agg_cohort_retention" -> QuerySpec(
      (s, d) => EventOps.cohortRetention(
        t(s, d, "orders"), "o_custkey", "o_orderdate"),
      Some("""WITH pa AS (
             |  SELECT o_custkey AS actor,
             |    date_trunc('month', min(o_orderdate)) AS cohort_ts
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
             |  GROUP BY 1),
             |act AS (
             |  SELECT DISTINCT o_custkey AS actor,
             |    date_trunc('month', o_orderdate) AS m
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
             |cells AS (
             |  SELECT CAST(pa.cohort_ts AS DATE) AS cohort_month,
             |    CAST((year(act.m) - year(pa.cohort_ts)) * 12
             |      + (month(act.m) - month(pa.cohort_ts)) AS INTEGER)
             |      AS month_offset,
             |    count(*) AS n_active
             |  FROM act JOIN pa USING (actor) GROUP BY 1, 2)
             |SELECT cohort_month, month_offset, n_active,
             |  CAST(max(n_active) OVER (PARTITION BY cohort_month)
             |    AS BIGINT) AS cohort_size,
             |  CAST(n_active AS DOUBLE)
             |    / CAST(max(n_active) OVER (PARTITION BY cohort_month)
             |        AS DOUBLE) AS retention
             |FROM cells ORDER BY cohort_month, month_offset""".stripMargin)),

    // Ordered funnel (EventOps.funnelStages): per user the earliest
    // signup → click-after-signup → purchase-after-click times and the
    // stage reached. A chain of conditional min-aggregates joined on
    // the actor key each side was just aggregated on — one shuffle
    // grain end to end, no per-actor event collection. The oracle is
    // the same CTE chain; stage times compare at the µs grain both
    // engines present.
    "agg_funnel_stages" -> QuerySpec(
      (s, d) => EventOps.funnelStages(
        t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase")),
      Some("""WITH s1 AS (
             |  SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS t1
             |  FROM events
             |  WHERE event_type = 'signup' AND user_id IS NOT NULL
             |  GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, CAST(min(e.ts) AS TIMESTAMP) AS t2
             |  FROM events e JOIN s1 ON s1.user_id = e.user_id
             |  WHERE e.event_type = 'click'
             |    AND CAST(e.ts AS TIMESTAMP) >= s1.t1
             |  GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, CAST(min(e.ts) AS TIMESTAMP) AS t3
             |  FROM events e JOIN s2 ON s2.user_id = e.user_id
             |  WHERE e.event_type = 'purchase'
             |    AND CAST(e.ts AS TIMESTAMP) >= s2.t2
             |  GROUP BY 1)
             |SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
             |  CAST(1 + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
             |         + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END
             |    AS BIGINT) AS stage_reached
             |FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
             |        LEFT JOIN s3 ON s3.user_id = s1.user_id
             |ORDER BY s1.user_id""".stripMargin)),

    // Funnel with a CONVERSION WINDOW (funnelStages maxGapSeconds):
    // click within 2 days of signup, purchase within 2 days of the
    // click — the bounded semantics every funnel report defaults to.
    // Same chain, one interval bound per stage; on the 30-day fixture
    // the window meaningfully prunes vs the unbounded twin.
    "agg_funnel_windowed" -> QuerySpec(
      (s, d) => EventOps.funnelStages(
        t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"),
        maxGapSeconds = Some(172800L)),
      Some("""WITH s1 AS (
             |  SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS t1
             |  FROM events
             |  WHERE event_type = 'signup' AND user_id IS NOT NULL
             |  GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, CAST(min(e.ts) AS TIMESTAMP) AS t2
             |  FROM events e JOIN s1 ON s1.user_id = e.user_id
             |  WHERE e.event_type = 'click'
             |    AND CAST(e.ts AS TIMESTAMP) >= s1.t1
             |    AND CAST(e.ts AS TIMESTAMP) <= s1.t1 + INTERVAL 172800 SECOND
             |  GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, CAST(min(e.ts) AS TIMESTAMP) AS t3
             |  FROM events e JOIN s2 ON s2.user_id = e.user_id
             |  WHERE e.event_type = 'purchase'
             |    AND CAST(e.ts AS TIMESTAMP) >= s2.t2
             |    AND CAST(e.ts AS TIMESTAMP) <= s2.t2 + INTERVAL 172800 SECOND
             |  GROUP BY 1)
             |SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
             |  CAST(1 + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
             |         + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END
             |    AS BIGINT) AS stage_reached
             |FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
             |        LEFT JOIN s3 ON s3.user_id = s1.user_id
             |ORDER BY s1.user_id""".stripMargin)),

    // Last-touch attribution (EventOps.lastTouchAttribution): every
    // purchase credited to the user's most recent click/view at or
    // before it in the (ts, event_id) total order; no-prior-touch
    // purchases keep NULL touch columns (the "direct" bucket as data).
    // ONE running-last window over ONE actor-grain shuffle — per-row
    // state is a single struct, never an event list; the identical
    // construction restates as last_value(… IGNORE NULLS) in SQL.
    "win_attribution_last_touch" -> QuerySpec(
      (s, d) => EventOps.lastTouchAttribution(
        t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        Seq("click", "view"), "purchase")
        .orderBy(col("conversion_id")),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             |    event_type,
             |    CASE WHEN event_type IN ('click', 'view')
             |      THEN struct_pack(t := CAST(ts AS TIMESTAMP),
             |        i := event_id, y := event_type) END AS touch
             |  FROM events WHERE user_id IS NOT NULL),
             |l AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    last_value(touch IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS lt
             |  FROM e)
             |SELECT user_id, event_id AS conversion_id,
             |  ts AS conversion_ts, lt.i AS touch_id, lt.t AS touch_ts,
             |  lt.y AS touch_type
             |FROM l WHERE event_type = 'purchase'
             |ORDER BY conversion_id""".stripMargin)),

    // Linear multi-touch attribution (EventOps.linearAttribution):
    // every touch before a conversion shares credit 1/n — the
    // equal-weight companion to last-touch. Per-channel running counts
    // over the ONE actor window; the credit sum Σ cnt·k/n folds a
    // SORTED bounded (k,n)-grain array (fixed IEEE chain — the one
    // double sum, never a row-order aggregate) ⇒ fully oracled. Total
    // credit conserves to the conversion count (959.0 + 952.0 + 70 =
    // 1981 at sf0.01 — the cross-channel invariant a report audits).
    "win_attribution_linear" -> QuerySpec(
      (s, d) => EventOps.linearAttribution(
        t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        Seq("click", "view"), "purchase"),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             |    event_type
             |  FROM events WHERE user_id IS NOT NULL),
             |c AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      OVER w AS k0,
             |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |      OVER w AS k1
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |conv AS (
             |  SELECT k0, k1, k0 + k1 AS n FROM c
             |  WHERE event_type = 'purchase'),
             |chan AS (
             |  SELECT 'click' AS channel, k0 AS k, n, count(*) AS cnt
             |  FROM conv WHERE n > 0 AND k0 > 0 GROUP BY 2, 3
             |  UNION ALL
             |  SELECT 'view', k1, n, count(*)
             |  FROM conv WHERE n > 0 AND k1 > 0 GROUP BY 2, 3),
             |folded AS (
             |  SELECT channel,
             |    CAST(SUM(cnt) AS BIGINT) AS n_conversions,
             |    CAST(SUM(cnt * k) AS BIGINT) AS n_credited_touches,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(CAST(cnt * k AS DOUBLE) / CAST(n AS DOUBLE)
             |        ORDER BY k, n, cnt)),
             |      (a, b) -> a + b) AS credit
             |  FROM chan GROUP BY 1),
             |direct AS (
             |  SELECT 'direct' AS channel,
             |    CAST(count(*) AS BIGINT) AS n_conversions,
             |    CAST(0 AS BIGINT) AS n_credited_touches,
             |    CAST(count(*) AS DOUBLE) AS credit
             |  FROM conv WHERE n = 0)
             |SELECT * FROM folded UNION ALL SELECT * FROM direct
             |ORDER BY channel""".stripMargin)),

    // MARKOV-CHAIN removal-effect attribution (EventOps
    // .markovRemovalAttribution) — the data-driven model that closes
    // the attribution family (last/linear/position are position
    // heuristics; this one measures each channel's causal leverage as
    // the absorbed-conversion mass that disappears when the channel's
    // transitions are removed). Everything is the pagerank
    // truncating-integer discipline: ppm transition probabilities
    // (n·10⁶ div total), 6 unrolled absorption rounds of
    // mass·ppm div 10⁶, and the share divides two EXACT integer deltas
    // — so the oracle replays all six rounds bit-for-bit as unrolled
    // CTEs over the identical journey construction.
    "win_attribution_markov" -> QuerySpec(
      (s, d) => EventOps.markovRemovalAttribution(
        t(s, d, "events"), "user_id", "event_id", "event_type",
        conversionType = "purchase", steps = 6),
      Some {
        val stepCtes = (1 to 6).map { i =>
          val prev = if (i == 1) "v0" else s"v${i - 1}"
          s"""v$i AS (
             |  SELECT v.removed, a.t2 AS st,
             |    CAST(SUM((v.m * a.ppm) // 1000000) AS BIGINT) AS m
             |  FROM $prev v
             |  JOIN adj a ON a.removed = v.removed AND a.f = v.st
             |  GROUP BY 1, 2)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (
           |  SELECT user_id, event_id, event_type FROM events
           |  WHERE user_id IS NOT NULL),
           |fp AS (SELECT user_id, min(event_id) AS pid FROM e
           |       WHERE event_type = 'purchase' GROUP BY 1),
           |j AS (
           |  SELECT e.user_id, e.event_id,
           |    CASE WHEN e.event_type = 'purchase' THEN '__conv'
           |         ELSE e.event_type END AS st
           |  FROM e LEFT JOIN fp USING (user_id)
           |  WHERE fp.pid IS NULL OR e.event_id <= fp.pid),
           |tr0 AS (
           |  SELECT
           |    COALESCE(lag(st) OVER (PARTITION BY user_id ORDER BY event_id),
           |      '__start') AS f,
           |    st AS t2,
           |    lead(st) OVER (PARTITION BY user_id ORDER BY event_id)
           |      IS NULL AS is_last
           |  FROM j),
           |alltr AS (
           |  SELECT f, t2 FROM tr0
           |  UNION ALL
           |  SELECT t2 AS f, '__null' AS t2 FROM tr0
           |  WHERE is_last AND t2 <> '__conv'),
           |cnt AS (SELECT f, t2, CAST(count(*) AS BIGINT) AS n
           |        FROM alltr GROUP BY 1, 2),
           |tt AS (SELECT f, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
           |p AS (SELECT cnt.f, cnt.t2, (cnt.n * 1000000) // tt.tot AS ppm
           |      FROM cnt JOIN tt USING (f)),
           |ch AS (SELECT DISTINCT f AS c FROM p WHERE f <> '__start'),
           |rdim AS (SELECT c FROM ch UNION ALL SELECT '__none'),
           |adj AS (
           |  SELECT r.c AS removed, p.f,
           |    CASE WHEN p.t2 = r.c THEN '__null' ELSE p.t2 END AS t2,
           |    CAST(SUM(p.ppm) AS BIGINT) AS ppm
           |  FROM p CROSS JOIN rdim r WHERE p.f <> r.c
           |  GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT c, '__conv', '__conv', 1000000 FROM rdim
           |  UNION ALL
           |  SELECT c, '__null', '__null', 1000000 FROM rdim),
           |v0 AS (SELECT c AS removed, '__start' AS st,
           |         CAST(1000000 AS BIGINT) AS m FROM rdim),
           |$stepCtes,
           |conv AS (SELECT removed, m FROM v6 WHERE st = '__conv'),
           |fl AS (SELECT CAST(COALESCE(SUM(m), 0) AS BIGINT) AS mf
           |       FROM conv WHERE removed = '__none'),
           |pc AS (
           |  SELECT ch.c AS channel, fl.mf AS conv_full_ppm,
           |    CAST(COALESCE(cv.m, 0) AS BIGINT) AS conv_removed_ppm,
           |    fl.mf - COALESCE(cv.m, 0) AS delta
           |  FROM ch LEFT JOIN conv cv ON cv.removed = ch.c CROSS JOIN fl),
           |td AS (SELECT CAST(SUM(delta) AS BIGINT) AS tdelta FROM pc)
           |SELECT channel, conv_full_ppm, conv_removed_ppm,
           |  CASE WHEN conv_full_ppm > 0 THEN
           |    CAST(delta AS DOUBLE) / CAST(conv_full_ppm AS DOUBLE)
           |  END AS removal_effect,
           |  CASE WHEN tdelta > 0 THEN
           |    CAST(delta AS DOUBLE) / CAST(tdelta AS DOUBLE)
           |  END AS share
           |FROM pc CROSS JOIN td ORDER BY channel""".stripMargin
      },
      allowBnlj = true),

    // EXACT Shapley-value attribution (EventOps.shapleyAttribution,
    // Shapley 1953 / Zhao et al. 2018) — the axiomatically fair split
    // the removal-effect model approximates, computable exactly here
    // because the channel universe is DECLARED and bounded (2⁴ = 16
    // subset rows; exact Shapley is exponential by definition). v(S) =
    // conversion rate of journeys touching EXACTLY set S (0 for
    // unobserved subsets — the standard practical convention); the
    // 2ⁿ⁻¹ coalition weights are driver-evaluated factorial ratios
    // inlined as IDENTICAL literals into both engines (the bhFdr
    // threshold pattern); each marginal term is a fixed IEEE chain and
    // φ folds terms SORTED BY SUBSET MASK. Undeclared channels
    // raise_error rather than silently vanish from every coalition.
    "win_attribution_shapley" -> QuerySpec(
      (s, d) => EventOps.shapleyAttribution(
        t(s, d, "events"), "user_id", "event_id", "event_type",
        conversionType = "purchase",
        channels = Seq("click", "error", "signup", "view")),
      Some {
        val wt = (0 until 4).map { sz =>
          s"($sz, CAST('${EventOps.shapleyWeight(sz, 4)}' AS DOUBLE))"
        }.mkString(", ")
        s"""WITH e AS (
           |  SELECT user_id, event_id, event_type FROM events
           |  WHERE user_id IS NOT NULL),
           |fp AS (SELECT user_id, min(event_id) AS pid FROM e
           |       WHERE event_type = 'purchase' GROUP BY 1),
           |j AS (
           |  SELECT e.user_id, e.event_type AS t
           |  FROM e LEFT JOIN fp USING (user_id)
           |  WHERE fp.pid IS NULL OR e.event_id <= fp.pid),
           |pa AS (
           |  SELECT user_id,
           |      MAX(CASE WHEN t = 'click'  THEN 1 ELSE 0 END)
           |    + MAX(CASE WHEN t = 'error'  THEN 2 ELSE 0 END)
           |    + MAX(CASE WHEN t = 'signup' THEN 4 ELSE 0 END)
           |    + MAX(CASE WHEN t = 'view'   THEN 8 ELSE 0 END) AS mask,
           |    MAX(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS conv
           |  FROM j GROUP BY 1),
           |st AS (
           |  SELECT mask, CAST(count(*) AS BIGINT) AS nj,
           |    CAST(SUM(conv) AS BIGINT) AS nc
           |  FROM pa GROUP BY 1),
           |lat AS (
           |  SELECT r.m,
           |    CASE WHEN st.nj > 0
           |      THEN CAST(st.nc AS DOUBLE) / CAST(st.nj AS DOUBLE)
           |      ELSE CAST(0.0 AS DOUBLE) END AS v
           |  FROM (SELECT unnest(range(0, 16)) AS m) r
           |  LEFT JOIN st ON st.mask = r.m),
           |ch(channel, bit) AS (VALUES
           |  ('click', 1), ('error', 2), ('signup', 4), ('view', 8)),
           |wt(s, w) AS (VALUES $wt),
           |terms AS (
           |  SELECT ch.channel, v0.m AS m0, wt.w * (v1.v - v0.v) AS term
           |  FROM ch
           |  JOIN lat v0 ON (v0.m & ch.bit) = 0
           |  JOIN lat v1 ON v1.m = v0.m + ch.bit
           |  JOIN wt ON wt.s = (v0.m & 1) + ((v0.m >> 1) & 1)
           |                  + ((v0.m >> 2) & 1) + ((v0.m >> 3) & 1))
           |SELECT channel,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |    list(term ORDER BY m0)), (a, b) -> a + b) AS shapley
           |FROM terms GROUP BY channel ORDER BY channel""".stripMargin
      },
      allowBnlj = true),

    // Chi-square independence cells: event type × daypart contingency
    // table with expected counts and per-cell χ² terms — "does behavior
    // depend on time of day" stated as the classic test. Exact cell/
    // marginal counts from ONE aggregation; expected and each term are
    // fixed IEEE chains (the profile_benford discipline); the scalar
    // statistic is the caller's fold over the ≤ types×4 rows.
    "profile_chi2_independence" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          // div, not /: Spark's / is fractional — mirror the oracle's //
          .select(col("event_type"),
            expr("hour(ts) div 6").cast(IntegerType).as("daypart"))
        val cells = ev.groupBy(col("event_type"), col("daypart"))
          .agg(count(lit(1)).as("n"))
        val rowT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("_r"))
        val colT = cells.groupBy(col("daypart")).agg(sum(col("n")).as("_c"))
        val tot = cells.agg(sum(col("n")).as("_t"))
        val e = (col("_r").cast(DoubleType) * col("_c").cast(DoubleType)) /
          col("_t").cast(DoubleType)
        cells
          .join(broadcast(rowT), Seq("event_type"))
          .join(broadcast(colT), Seq("daypart"))
          .crossJoin(broadcast(tot))
          .select(col("event_type"), col("daypart"), col("n"),
            e.as("expected"),
            ((col("n").cast(DoubleType) - e) *
              (col("n").cast(DoubleType) - e) / e).as("chi2_term"))
          .orderBy(col("event_type"), col("daypart"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(hour(ts) // 6 AS INTEGER) AS daypart
             |  FROM events),
             |cells AS (
             |  SELECT event_type, daypart, CAST(count(*) AS BIGINT) AS n
             |  FROM ev GROUP BY 1, 2),
             |r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rt
             |      FROM cells GROUP BY 1),
             |c AS (SELECT daypart, CAST(SUM(n) AS BIGINT) AS ct
             |      FROM cells GROUP BY 1),
             |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM cells)
             |SELECT cells.event_type, cells.daypart, cells.n,
             |  CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE)
             |    AS expected,
             |  (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |     / CAST(tt AS DOUBLE))
             |   * (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |     / CAST(tt AS DOUBLE))
             |   / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE))
             |    AS chi2_term
             |FROM cells
             |JOIN r USING (event_type) JOIN c USING (daypart) CROSS JOIN t
             |ORDER BY event_type, daypart""".stripMargin),
      allowBnlj = true),

    // Benjamini–Hochberg FDR step-up (ProfileOps.bhFdr) over 25
    // per-nation proportion z-tests (share of customers above a 5000
    // balance vs the pooled rate) — the multiple-testing gate the
    // χ²/t/KS battery lacks: screened at raw α, ~α·25 nations page
    // falsely; BH bounds the EXPECTED FALSE-DISCOVERY share at q=0.05.
    // No p-value is ever computed in-plan: p_(i) ≤ i·q/m is equivalent
    // to |z|_(i) ≥ Φ⁻¹(1−i·q/2m), and the 25 thresholds are evaluated
    // ONCE driver-side (Acklam's rational approximation) and inlined
    // as the SAME double literals into BOTH engines' queries — the
    // libm-divergence class is structurally out. z itself is the
    // profile_corr fixed-IEEE-chain discipline over exact longs.
    "profile_fdr_bh" -> QuerySpec(
      (s, d) => ProfileOps.bhFdr(
        t(s, d, "customer").select(col("c_nationkey"),
          when(col("c_acctbal") > 5000, 1).otherwise(0).as("hi_bal")),
        "c_nationkey", "hi_bal", m = 25, q = 0.05)
        .orderBy(col("rank")),
      Some {
        // thresholds as QUOTED strings → strtod (correctly rounded to
        // the same double the Spark literal holds); a bare numeric
        // literal would bind as DECIMAL(17,16) and convert differently
        val thr = (1 to 25).map { i =>
          s"($i, CAST('${ProfileOps.invNormalCdf(1.0 - i * 0.05 / (2.0 * 25))}' AS DOUBLE))"
        }.mkString(", ")
        s"""WITH per AS (
           |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS k
           |  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
           |pool AS (
           |  SELECT CAST(SUM(k) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS p0
           |  FROM per),
           |z AS (
           |  SELECT c_nationkey, k, n,
           |    (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) - p0) /
           |      sqrt(p0 * (1.0 - p0) / CAST(n AS DOUBLE)) AS z
           |  FROM per CROSS JOIN pool),
           |thr(rank, z_threshold) AS (VALUES $thr),
           |ranked AS (
           |  SELECT c_nationkey, k, n, z,
           |    CAST(row_number() OVER (ORDER BY abs(z) DESC, c_nationkey)
           |      AS INTEGER) AS rank
           |  FROM z),
           |flagged AS (
           |  SELECT r.c_nationkey, r.rank, r.k, r.n, r.z,
           |    t.z_threshold,
           |    CAST(CASE WHEN abs(r.z) >= t.z_threshold THEN 1 ELSE 0 END
           |      AS INTEGER) AS pass_raw
           |  FROM ranked r JOIN thr t ON t.rank = r.rank)
           |SELECT c_nationkey, rank, k, n, z, z_threshold, pass_raw,
           |  CAST(MAX(pass_raw) OVER (ORDER BY rank
           |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           |    AS INTEGER) AS significant
           |FROM flagged ORDER BY rank""".stripMargin
      },
      allowBnlj = true),

    // Mann–Whitney U rank-sum test (ProfileOps.mannWhitney) — the
    // distribution-free two-sample location test that completes the
    // battery (t tests means, KS tests shape, U tests stochastic
    // dominance; U/(n₁n₂) IS the AUC identity). Click vs view event
    // values at integer-cent grain: pooled value-grain doubled
    // midranks, exact DECIMAL(38,0) rank/tie sums, the tie-corrected
    // normal approximation as ONE fixed IEEE chain, rank-biserial
    // effect size. No continuity correction (documented).
    "profile_mannwhitney" -> QuerySpec(
      (s, d) => ProfileOps.mannWhitney(
        t(s, d, "events").select(col("event_type"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "event_type", "cents", groupA = "click", groupB = "view"),
      Some("""WITH e AS (
             |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events
             |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
             |grain AS (
             |  SELECT v, CAST(count(*) AS BIGINT) AS t,
             |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ta
             |  FROM e GROUP BY 1),
             |r AS (
             |  SELECT v, t, ta,
             |    2 * COALESCE(SUM(t) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    + t + 1 AS r2
             |  FROM grain),
             |m AS (
             |  SELECT CAST(SUM(t) AS BIGINT) AS n,
             |    CAST(SUM(ta) AS BIGINT) AS na,
             |    SUM(CAST(r2 AS HUGEINT) * ta) AS r2a,
             |    SUM(CAST(t AS HUGEINT) * t * t - t) AS ties
             |  FROM r),
             |c AS (
             |  SELECT n, na, n - na AS nb,
             |    CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) / 2.0
             |      AS ua,
             |    CAST(na AS DOUBLE) AS nad, CAST(n - na AS DOUBLE) AS nbd,
             |    CAST(n AS DOUBLE) AS nd, CAST(ties AS DOUBLE) AS tiesd
             |  FROM m)
             |SELECT na AS n_a, nb AS n_b, ua AS u_a,
             |  CASE WHEN na > 0 AND nb > 0 AND
             |    (nad * nbd / 12.0) * ((nd + 1.0) - tiesd / (nd * (nd - 1.0)))
             |      > 0.0
             |  THEN (ua - nad * nbd / 2.0) /
             |    sqrt((nad * nbd / 12.0) *
             |      ((nd + 1.0) - tiesd / (nd * (nd - 1.0)))) END AS z,
             |  CASE WHEN na > 0 AND nb > 0
             |    THEN 2.0 * ua / (nad * nbd) - 1.0 END AS rank_biserial
             |FROM c""".stripMargin)),

    // A/B sample-size planner (ProfileOps.powerTwoProportion) — the
    // PRE-experiment companion to profile_ab_ttest/profile_rate_ci's
    // post-hoc readouts: per nation, the n PER ARM needed to detect a
    // +5pp lift in the high-balance rate at α=0.05 two-sided / 80%
    // power. Both z quantiles are driver-evaluated (Acklam) and
    // inlined as identical literals into both engines' queries (the
    // bhFdr contract — no transcendental runs in-plan); the formula is
    // a fixed IEEE chain over exact (k, n) longs. feasible flags
    // nations whose current sample already covers the requirement.
    "profile_power" -> QuerySpec(
      (s, d) => ProfileOps.powerTwoProportion(
        t(s, d, "customer").select(col("c_nationkey"),
          when(col("c_acctbal") > 5000, 1).otherwise(0).as("hi_bal")),
        "c_nationkey", "hi_bal", delta = 0.05)
        .orderBy(col("c_nationkey")),
      Some {
        val za = ProfileOps.invNormalCdf(1.0 - 0.05 / 2.0)
        val zb = ProfileOps.invNormalCdf(0.8)
        s"""WITH per AS (
           |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS k
           |  FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
           |z AS (
           |  SELECT c_nationkey, k, n,
           |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p1
           |  FROM per),
           |f AS (
           |  SELECT c_nationkey, k, n, p1, p1 + 0.05 AS p2,
           |    (p1 + (p1 + 0.05)) / 2.0 AS pbar
           |  FROM z),
           |req AS (
           |  SELECT c_nationkey, k, n, p1,
           |    CASE WHEN p2 <= 1.0 THEN
           |      (CAST('$za' AS DOUBLE) * sqrt(2.0 * pbar * (1.0 - pbar)) +
           |       CAST('$zb' AS DOUBLE) *
           |         sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))) *
           |      (CAST('$za' AS DOUBLE) * sqrt(2.0 * pbar * (1.0 - pbar)) +
           |       CAST('$zb' AS DOUBLE) *
           |         sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))) /
           |      (CAST(0.05 AS DOUBLE) * CAST(0.05 AS DOUBLE))
           |      END AS n_required
           |  FROM f)
           |SELECT c_nationkey, k, n, p1 AS rate, n_required,
           |  CASE WHEN n_required IS NOT NULL THEN
           |    CAST(CASE WHEN CAST(n AS DOUBLE) >= n_required
           |      THEN 1 ELSE 0 END AS INTEGER) END AS feasible
           |FROM req ORDER BY c_nationkey""".stripMargin
      }),

    // CRAMÉR'S V effect size (Cramér 1946) — the scalar
    // profile_chi2_independence leaves as 'the caller's fold', now a
    // key: χ² folded over the SORTED bounded cell grain (the
    // win_attribution_linear fixed-order double-sum discipline — a
    // row-set SUM would leave accumulation order to the engine) and
    // V = √(χ²/(n·min(r−1,c−1))) as a fixed IEEE chain over exact
    // integers — the [0,1] association strength a dashboard can
    // threshold where raw χ² scales with n. Degenerate 1×c / r×1
    // tables yield NULL V (df = 0), not a division blow-up.
    "profile_cramers_v" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"),
            expr("hour(ts) div 6").cast(IntegerType).as("daypart"))
        val cells = ev.groupBy(col("event_type"), col("daypart"))
          .agg(count(lit(1)).as("n"))
        val rowT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("_r"))
        val colT = cells.groupBy(col("daypart")).agg(sum(col("n")).as("_c"))
        val tot = cells.agg(sum(col("n")).as("_t"))
        val e = (col("_r").cast(DoubleType) * col("_c").cast(DoubleType)) /
          col("_t").cast(DoubleType)
        val terms = cells
          .join(broadcast(rowT), Seq("event_type"))
          .join(broadcast(colT), Seq("daypart"))
          .crossJoin(broadcast(tot))
          .select(col("event_type"), col("daypart"), col("n"),
            ((col("n").cast(DoubleType) - e) *
              (col("n").cast(DoubleType) - e) / e).as("chi2_term"))
        terms
          .agg(sum(col("n")).as("n"),
            countDistinct(col("event_type")).cast(IntegerType).as("n_rows"),
            countDistinct(col("daypart")).cast(IntegerType).as("n_cols"),
            aggregate(
              sort_array(collect_list(struct(col("event_type"),
                col("daypart"), col("chi2_term")))),
              lit(0.0), (acc, x) => acc + x.getField("chi2_term"))
              .as("chi2"))
          .select(col("n"), col("n_rows"), col("n_cols"),
            ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
            col("chi2"),
            when(col("n_rows") > 1 && col("n_cols") > 1,
              sqrt(col("chi2") / (col("n").cast(DoubleType) *
                (least(col("n_rows"), col("n_cols")) - 1).cast(DoubleType))))
              .as("cramers_v"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(hour(ts) // 6 AS INTEGER) AS daypart
             |  FROM events),
             |cells AS (
             |  SELECT event_type, daypart, CAST(count(*) AS BIGINT) AS n
             |  FROM ev GROUP BY 1, 2),
             |r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rt
             |      FROM cells GROUP BY 1),
             |c AS (SELECT daypart, CAST(SUM(n) AS BIGINT) AS ct
             |      FROM cells GROUP BY 1),
             |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM cells),
             |terms AS (
             |  SELECT cells.event_type, cells.daypart, cells.n,
             |    (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |       / CAST(tt AS DOUBLE))
             |     * (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |       / CAST(tt AS DOUBLE))
             |     / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE))
             |      AS chi2_term
             |  FROM cells
             |  JOIN r USING (event_type) JOIN c USING (daypart) CROSS JOIN t),
             |agg AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS n,
             |    CAST(count(DISTINCT event_type) AS INTEGER) AS n_rows,
             |    CAST(count(DISTINCT daypart) AS INTEGER) AS n_cols,
             |    list_reduce(list(chi2_term ORDER BY event_type, daypart),
             |      (a, b) -> a + b) AS chi2
             |  FROM terms)
             |SELECT n, n_rows, n_cols,
             |  CAST((n_rows - 1) * (n_cols - 1) AS INTEGER) AS dof, chi2,
             |  CASE WHEN n_rows > 1 AND n_cols > 1
             |    THEN sqrt(chi2 / (CAST(n AS DOUBLE) *
             |      CAST(least(n_rows, n_cols) - 1 AS DOUBLE)))
             |  END AS cramers_v
             |FROM agg""".stripMargin),
      allowBnlj = true),

    // EXACT two-sample Kolmogorov-Smirnov statistic: D = max|F₁−F₂|
    // over the pooled value grain, computed ENTIRELY in integers —
    // the CDF-difference comparison cross-multiplies to
    // |f₁·n₂ − f₂·n₁| (exact longs; swap in DECIMAL(18,0) products
    // past n₁·n₂ ~ 2⁶³), so the argmax is bit-deterministic and the
    // one division happens once, on the single output row. The window
    // runs on the VALUE grain (50 distinct quantities — continuous
    // data should be binned first, the drift-key pattern).
    "profile_ks_exact" -> QuerySpec(
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_quantity").isNotNull &&
            col("l_returnflag").isin("A", "R"))
        val grain = li.groupBy(col("l_quantity").as("v"))
          .agg(sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("c1"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("c2"))
        val tot = grain.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        val w = Window.partitionBy(lit(0)).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = grain
          .withColumn("f1", sum(col("c1")).over(w))
          .withColumn("f2", sum(col("c2")).over(w))
          .crossJoin(broadcast(tot))
          .withColumn("d", abs(col("f1") * col("n2") - col("f2") * col("n1")))
        cum.orderBy(col("d").desc, col("v")).limit(1)
          .select(col("v").as("at_value"), col("n1"), col("n2"),
            col("d").as("ks_num"),
            (col("d").cast(DoubleType) /
              (col("n1").cast(DoubleType) * col("n2").cast(DoubleType)))
              .as("ks"))
      },
      Some("""WITH src AS (
             |  SELECT l_returnflag, l_quantity AS v FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R')),
             |g AS (
             |  SELECT v,
             |    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c2
             |  FROM src GROUP BY 1),
             |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             |             CAST(SUM(c2) AS BIGINT) AS n2 FROM g),
             |cum AS (
             |  SELECT v,
             |    CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
             |    CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) AS f2
             |  FROM g),
             |dd AS (
             |  SELECT v, t.n1, t.n2, abs(f1 * t.n2 - f2 * t.n1) AS d
             |  FROM cum CROSS JOIN t)
             |SELECT v AS at_value, n1, n2, d AS ks_num,
             |  CAST(d AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             |    AS ks
             |FROM dd ORDER BY d DESC, v LIMIT 1""".stripMargin),
      allowBnlj = true),

    // Asymmetric n-gram containment (the quote/partial-inclusion
    // detector): |A∩B|/|A| vs /|B| over the ngramJaccardPairs
    // candidate machinery — a planted 8-token quote of doc 0 surfaces
    // with containment 1.0 from the quote's side while its Jaccard
    // stays far below any dedup threshold (the case the symmetric
    // measure structurally misses). Exact-long divisions ⇒ oracled.
    "dedup_ngram_containment" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "documents").filter(col("doc_id") < 40)
          .select(col("doc_id"), col("text"))
        val quote = base.filter(col("doc_id") === 0)
          .select(lit(9000L).as("doc_id"),
            concat_ws(" ", slice(
              filter(TextOps.tokenize(col("text")), t => length(t) > 0),
              lit(1), lit(8))).as("text"))
        DedupOps.tokenContainmentPairs(
          base.unionByName(quote), "doc_id", "text", threshold = 0.6)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 40),
             |quote AS (
             |  SELECT CAST(9000 AS BIGINT) AS id,
             |    array_to_string(list_filter(
             |      regexp_split_to_array(lower(text), '\s+'),
             |      x -> length(x) > 0)[1:8], ' ') AS text
             |  FROM documents WHERE doc_id = 0),
             |docs AS (SELECT * FROM base UNION ALL SELECT * FROM quote),
             |toks AS (
             |  SELECT id, unnest(list_distinct(string_split(lower(text), ' ')))
             |    AS tok
             |  FROM docs),
             |-- the Spark side prunes tokens whose doc count tops the
             |-- pair-budget cap (707 docs for the default 250k budget)
             |-- from BOTH the intersection and the denominators; mirror
             |-- it so the two engines agree at every corpus size
             |stop AS (SELECT tok FROM toks GROUP BY tok
             |         HAVING count(*) > 707),
             |rare AS (SELECT * FROM toks
             |         WHERE tok NOT IN (SELECT tok FROM stop)),
             |sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n
             |          FROM rare GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b,
             |    CAST(count(*) AS BIGINT) AS n_inter
             |  FROM rare a JOIN rare b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b,
             |  CAST(n_inter AS DOUBLE) / CAST(sa.n AS DOUBLE) AS cont_a,
             |  CAST(n_inter AS DOUBLE) / CAST(sb.n AS DOUBLE) AS cont_b
             |FROM inter
             |JOIN sizes sa ON sa.id = id_a
             |JOIN sizes sb ON sb.id = id_b
             |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n AS DOUBLE) >= 0.6
             |   OR CAST(n_inter AS DOUBLE) / CAST(sb.n AS DOUBLE) >= 0.6
             |ORDER BY id_a, id_b""".stripMargin)),

    // Benford first-digit profile (ProfileOps.benfordProfile): the
    // fabricated-/truncated-data tripwire for amount columns — digit
    // from floor(v·100) via exact integer→string (double→string
    // formatting never happens), log₁₀ expectations quantized once to
    // DECIMAL(12,6), per-digit χ² terms as fixed IEEE chains ⇒ fully
    // oracled. ONE ≤9-row aggregation + a 1-row total broadcast.
    "profile_benford" -> QuerySpec(
      (s, d) => ProfileOps.benfordProfile(t(s, d, "orders"), "o_totalprice")
        .orderBy(col("digit")),
      Some("""WITH src AS (
             |  SELECT o_totalprice AS v FROM orders
             |  WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0.01),
             |counts AS (
             |  SELECT CAST(substr(CAST(CAST(floor(v * 100.0) AS BIGINT)
             |      AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM src GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
             |grid AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit),
             |j AS (
             |  SELECT g.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
             |    CAST(log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))
             |      AS DECIMAL(12,6)) AS e
             |  FROM grid g LEFT JOIN counts c USING (digit))
             |SELECT j.digit, j.n,
             |  CAST(j.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS share,
             |  CAST(e AS DOUBLE) AS expected,
             |  (CAST(j.n AS DOUBLE) - CAST(e AS DOUBLE) * CAST(t.t AS DOUBLE))
             |   * (CAST(j.n AS DOUBLE) - CAST(e AS DOUBLE) * CAST(t.t AS DOUBLE))
             |   / (CAST(e AS DOUBLE) * CAST(t.t AS DOUBLE)) AS chi2_term
             |FROM j CROSS JOIN tot t ORDER BY digit""".stripMargin),
      allowBnlj = true),

    // RFM customer segmentation: the classic recency/frequency/monetary
    // quintile grid — one actor-grain aggregation (snapshot date = the
    // table's max date, a 1-row broadcast), then three
    // ProfileOps.quantileBins passes over the CUSTOMER-grain frame
    // (thresholds are 1-row broadcasts; percentile ≡ quantile_cont
    // parity pinned by fn_percentile). R inverts (most recent = 5).
    "agg_rfm_segment" -> QuerySpec(
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
        val snap = o.agg(max(col("o_orderdate")).as("_snap"))
        val per = o.crossJoin(broadcast(snap))
          .groupBy(col("o_custkey"))
          .agg(
            datediff(max(col("_snap")).cast(DateType),
              max(col("o_orderdate")).cast(DateType)).as("recency_days"),
            count(lit(1)).as("frequency"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("monetary"))
        val binned = Seq(("recency_days", "_rb"), ("frequency", "_fb"),
          ("monetary", "_mb")).foldLeft(per) { case (df, (c, b)) =>
            ProfileOps.quantileBins(df, c, nBins = 5, outCol = b)
          }
        binned.select(col("o_custkey"), col("recency_days"),
            col("frequency"), col("monetary"),
            (lit(5) - col("_rb")).cast(IntegerType).as("r_score"),
            (col("_fb") + 1).cast(IntegerType).as("f_score"),
            (col("_mb") + 1).cast(IntegerType).as("m_score"),
            ((lit(5) - col("_rb")) * 100 + (col("_fb") + 1) * 10 +
              (col("_mb") + 1)).cast(IntegerType).as("rfm"))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH src AS (
             |  SELECT * FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
             |snap AS (SELECT max(o_orderdate) AS s FROM src),
             |per AS (
             |  SELECT o_custkey,
             |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
             |      CAST((SELECT s FROM snap) AS DATE)) AS INTEGER)
             |      AS recency_days,
             |    CAST(count(*) AS BIGINT) AS frequency,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |      AS monetary
             |  FROM src GROUP BY 1),
             |t AS (SELECT
             |  quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS tr,
             |  quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS tf,
             |  quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS tm
             |  FROM per),
             |b AS (
             |  SELECT p.*,
             |    (CASE WHEN recency_days > tr[1] THEN 1 ELSE 0 END
             |     + CASE WHEN recency_days > tr[2] THEN 1 ELSE 0 END
             |     + CASE WHEN recency_days > tr[3] THEN 1 ELSE 0 END
             |     + CASE WHEN recency_days > tr[4] THEN 1 ELSE 0 END) AS rb,
             |    (CASE WHEN frequency > tf[1] THEN 1 ELSE 0 END
             |     + CASE WHEN frequency > tf[2] THEN 1 ELSE 0 END
             |     + CASE WHEN frequency > tf[3] THEN 1 ELSE 0 END
             |     + CASE WHEN frequency > tf[4] THEN 1 ELSE 0 END) AS fb,
             |    (CASE WHEN monetary > tm[1] THEN 1 ELSE 0 END
             |     + CASE WHEN monetary > tm[2] THEN 1 ELSE 0 END
             |     + CASE WHEN monetary > tm[3] THEN 1 ELSE 0 END
             |     + CASE WHEN monetary > tm[4] THEN 1 ELSE 0 END) AS mb
             |  FROM per p CROSS JOIN t)
             |SELECT o_custkey, recency_days, frequency, monetary,
             |  CAST(5 - rb AS INTEGER) AS r_score,
             |  CAST(fb + 1 AS INTEGER) AS f_score,
             |  CAST(mb + 1 AS INTEGER) AS m_score,
             |  CAST((5 - rb) * 100 + (fb + 1) * 10 + (mb + 1) AS INTEGER) AS rfm
             |FROM b ORDER BY o_custkey""".stripMargin),
      allowBnlj = true),

    // Per-group Gini concentration (ProfileOps.giniByGroup): rank-form
    // Gini over exact DECIMAL(18,6) sums — Σi·x is tie-order-invariant,
    // the closing formula ONE fixed IEEE chain ⇒ fully oracled.
    "profile_gini" -> QuerySpec(
      (s, d) => ProfileOps.giniByGroup(
        t(s, d, "orders"), "o_orderpriority", "o_totalprice")
        .orderBy(col("o_orderpriority")),
      Some("""WITH g AS (
             |  SELECT o_orderpriority AS k,
             |    CAST(o_totalprice AS DECIMAL(18,6)) AS x,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice) AS DECIMAL(10,0)) AS i
             |  FROM orders WHERE o_totalprice IS NOT NULL),
             |s AS (
             |  SELECT k, CAST(count(*) AS BIGINT) AS n,
             |    SUM(x) AS sx, SUM(i * x) AS six
             |  FROM g GROUP BY 1)
             |SELECT k AS o_orderpriority, n,
             |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS total,
             |  (2.0 * CAST(CAST(six AS VARCHAR) AS DOUBLE)
             |    - (CAST(n AS DOUBLE) + 1.0) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
             |   / (CAST(n AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) AS gini
             |FROM s ORDER BY o_orderpriority""".stripMargin)),

    // Flesch-Kincaid readability (TextOps.readability): the model-free
    // complexity score beside the LM tiers — vowel-group syllables,
    // [.!?]+ sentences floored at 1, one fixed IEEE chain over exact
    // integer counts; zero-shuffle column program ⇒ fully oracled.
    "text_readability" -> QuerySpec(
      (s, d) => TextOps.readability(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH c AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |      x -> length(x) > 0)) AS BIGINT) AS n_words,
             |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
             |      AS BIGINT) AS n_sentences,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |      AS BIGINT) AS n_syllables
             |  FROM documents)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  CASE WHEN n_words > 0 THEN
             |    0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             |    - 15.59 END AS fk_grade
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Position-based (U-shaped 40/20/40) attribution
    // (EventOps.positionAttribution): first/last touches take 0.4
    // each, the middle splits the rest — the introduction-AND-closing
    // model beside last-touch and linear. Same sorted-bounded-grain
    // exact fold; the middle weight restates as (1.0 - 0.4 - 0.4) in
    // BOTH engines (≠ the literal 0.2 by one ulp — measured class).
    "win_attribution_position" -> QuerySpec(
      (s, d) => EventOps.positionAttribution(
        t(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        Seq("click", "view"), "purchase"),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             |    event_type,
             |    CASE WHEN event_type IN ('click', 'view')
             |      THEN event_type END AS touch
             |  FROM events WHERE user_id IS NOT NULL),
             |c AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    first_value(touch IGNORE NULLS) OVER w AS f,
             |    last_value(touch IGNORE NULLS) OVER w AS l,
             |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      OVER w AS k0,
             |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |      OVER w AS k1
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |conv AS (
             |  SELECT f, l, k0, k1, k0 + k1 AS n FROM c
             |  WHERE event_type = 'purchase'),
             |chan AS (
             |  SELECT 'click' AS channel,
             |    CASE WHEN f = 'click' THEN 1 ELSE 0 END AS fm,
             |    CASE WHEN l = 'click' THEN 1 ELSE 0 END AS lm,
             |    k0 AS k, n, count(*) AS cnt
             |  FROM conv WHERE n > 0 AND k0 > 0 GROUP BY 2, 3, 4, 5
             |  UNION ALL
             |  SELECT 'view', CASE WHEN f = 'view' THEN 1 ELSE 0 END,
             |    CASE WHEN l = 'view' THEN 1 ELSE 0 END, k1, n, count(*)
             |  FROM conv WHERE n > 0 AND k1 > 0 GROUP BY 2, 3, 4, 5),
             |folded AS (
             |  SELECT channel,
             |    CAST(SUM(cnt) AS BIGINT) AS n_conversions,
             |    CAST(SUM(cnt * fm) AS BIGINT) AS n_first,
             |    CAST(SUM(cnt * lm) AS BIGINT) AS n_last,
             |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(CASE
             |        WHEN n = 1 THEN CAST(cnt AS DOUBLE) * CAST(fm AS DOUBLE)
             |        WHEN n = 2 THEN CAST(cnt AS DOUBLE)
             |          * (0.5 * CAST(fm AS DOUBLE) + 0.5 * CAST(lm AS DOUBLE))
             |        ELSE CAST(cnt AS DOUBLE)
             |          * (0.4 * CAST(fm AS DOUBLE) + 0.4 * CAST(lm AS DOUBLE)
             |            + (1.0 - 0.4 - 0.4)
             |              * (CAST(k AS DOUBLE) - CAST(fm AS DOUBLE)
             |                 - CAST(lm AS DOUBLE))
             |              / (CAST(n AS DOUBLE) - 2.0)) END
             |        ORDER BY fm, lm, k, n, cnt)),
             |      (a, b) -> a + b) AS credit
             |  FROM chan GROUP BY 1),
             |direct AS (
             |  SELECT 'direct' AS channel,
             |    CAST(count(*) AS BIGINT) AS n_conversions,
             |    CAST(0 AS BIGINT) AS n_first, CAST(0 AS BIGINT) AS n_last,
             |    CAST(count(*) AS DOUBLE) AS credit
             |  FROM conv WHERE n = 0)
             |SELECT * FROM folded UNION ALL SELECT * FROM direct
             |ORDER BY channel""".stripMargin)),

    // Winsorization (outlier clipping to exact [p01, p99]): percentile
    // pass → one broadcast row → per-row clamp. Exact-percentile parity
    // with quantile_cont is already pinned by fn_percentile.
    "prep_winsorize" -> QuerySpec(
      (s, d) => ProfileOps.winsorize(
        t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
        "l_extendedprice")
        .select(col("l_orderkey"), col("l_linenumber"), col("clipped"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""WITH src AS (
             |  SELECT l_orderkey, l_linenumber, l_extendedprice
             |  FROM lineitem WHERE l_orderkey < 2000),
             |p AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
             |             quantile_cont(l_extendedprice, 0.99) AS hi
             |      FROM src)
             |SELECT l_orderkey, l_linenumber,
             |  LEAST(GREATEST(l_extendedprice, p.lo), p.hi) AS clipped
             |FROM src, p ORDER BY l_orderkey, l_linenumber""".stripMargin),
      allowBnlj = true),

    // Equi-depth quantile binning (ProfileOps.quantileBins): each doc's
    // quality-proxy value → its quartile index, the curriculum/mixing
    // grain computed WITHOUT an ntile() global sort — one exact
    // interior-threshold aggregate broadcast back as a 1-row frame,
    // bin assignment a codegen'd comparison chain. Exact-percentile
    // parity with quantile_cont is pinned by fn_percentile; ties at a
    // threshold go to the lower bin on both engines (strict >).
    "prep_quantile_bins" -> QuerySpec(
      (s, d) => ProfileOps.quantileBins(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", nBins = 4)
        .select(col("doc_id"), col("n_chars"), col("bin"))
        .orderBy(col("doc_id")),
      Some("""WITH p AS (
             |  SELECT quantile_cont(n_chars, 0.25) AS t1,
             |         quantile_cont(n_chars, 0.5)  AS t2,
             |         quantile_cont(n_chars, 0.75) AS t3
             |  FROM documents)
             |SELECT doc_id, n_chars,
             |  CAST((CASE WHEN n_chars > t1 THEN 1 ELSE 0 END
             |      + CASE WHEN n_chars > t2 THEN 1 ELSE 0 END
             |      + CASE WHEN n_chars > t3 THEN 1 ELSE 0 END) AS INTEGER)
             |    AS bin
             |FROM documents CROSS JOIN p ORDER BY doc_id""".stripMargin),
      allowBnlj = true),

    // Smoothed (m-estimate) target encoding (ProfileOps.targetEncode,
    // Micci-Barreca): per-customer mean order price shrunk toward the
    // global mean — the high-cardinality categorical encoder whose raw
    // per-level mean overfits rare levels. Emits the frozen FIT table
    // (score time is a broadcast join). Exact DECIMAL(18,6) sums; the
    // prior re-aggregates the per-category sums (no second data scan);
    // enc is one fixed IEEE chain ⇒ fully oracled.
    "prep_target_encode" -> QuerySpec(
      (s, d) => ProfileOps.targetEncode(
        t(s, d, "orders"), "o_custkey", "o_totalprice", m = 10.0)
        .orderBy(col("o_custkey")),
      Some("""WITH pc AS (
             |  SELECT o_custkey, count(*) AS n,
             |    SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS dsum
             |  FROM orders
             |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
             |  GROUP BY 1),
             |pr AS (
             |  SELECT CAST(SUM(dsum) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
             |    AS prior
             |  FROM pc)
             |SELECT o_custkey, n, CAST(dsum AS DOUBLE) AS sum_target,
             |  (CAST(dsum AS DOUBLE) + 10.0 * prior)
             |    / (CAST(n AS DOUBLE) + 10.0) AS enc
             |FROM pc CROSS JOIN pr ORDER BY o_custkey""".stripMargin),
      allowBnlj = true),

    // Categorical concentration profile (ProfileOps.categoricalProfile):
    // per-source language distribution — n, distinct k, Shannon
    // entropy, ln(k)-normalized entropy, Gini impurity. The mix
    // dashboard ("did source X collapse to one language"). Every
    // transcendental TERM is DECIMAL(20,9)-quantized before any
    // cross-row sum (the text_unigram_logprob discipline: ln's last
    // ulp must never reach a double sum) ⇒ fully oracled.
    "profile_entropy" -> QuerySpec(
      (s, d) => ProfileOps.categoricalProfile(
        t(s, d, "documents"), "source", "lang")
        .orderBy(col("source")),
      Some("""WITH c AS (
             |  SELECT source, lang, count(*) AS cnt FROM documents
             |  WHERE source IS NOT NULL AND lang IS NOT NULL
             |  GROUP BY 1, 2),
             |sh AS (
             |  SELECT source, lang, cnt,
             |    CAST(cnt AS DOUBLE)
             |      / CAST(SUM(cnt) OVER (PARTITION BY source) AS DOUBLE)
             |      AS p
             |  FROM c),
             |tq AS (
             |  SELECT source, cnt,
             |    CAST(-(p * ln(p)) AS DECIMAL(20,9)) AS hterm,
             |    CAST(p * p AS DECIMAL(20,9)) AS gterm
             |  FROM sh),
             |g AS (
             |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n,
             |    count(*) AS k,
             |    CAST(SUM(hterm) AS DOUBLE) AS entropy,
             |    1.0 - CAST(SUM(gterm) AS DOUBLE) AS gini
             |  FROM tq GROUP BY 1)
             |SELECT source, n, k, entropy, gini,
             |  CASE WHEN k > 1 THEN entropy
             |    / CAST(CAST(ln(CAST(k AS DOUBLE)) AS DECIMAL(20,9))
             |        AS DOUBLE)
             |    ELSE 0.0 END AS norm_entropy
             |FROM g ORDER BY source""".stripMargin)),

    // Poisson-bootstrap CI for the mean order value
    // (ProfileOps.bootstrapMeanCi, Chamandy et al. — the distributed
    // bootstrap): per-row Poisson(1) multiplicities from the portable
    // LCG through a literal inverse-CDF cutoff array, B=33 replicate
    // means from exact decimal sums, CI bounds at p = 1/32, 31/32 so
    // each percentile IS an order statistic (zero interpolation
    // arithmetic to differ across engines) ⇒ fully oracled.
    "profile_bootstrap_ci" -> QuerySpec(
      (s, d) => ProfileOps.bootstrapMeanCi(
        t(s, d, "orders"), "o_orderkey", "o_totalprice")
        .orderBy(col("n")),
      Some("""WITH r AS (
             |  SELECT o_orderkey AS id,
             |    CAST(o_totalprice AS DECIMAL(18,6)) AS x
             |  FROM orders
             |  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL),
             |d AS (
             |  SELECT id, x, j,
             |    CAST(len(list_filter(
             |      [0.36787944117144233, 0.7357588823428847,
             |       0.9196986029286058, 0.9810118431238463,
             |       0.9963401531726563, 0.9994058151824183,
             |       0.999916758850712, 0.9999897508033253,
             |       0.999998874797402],
             |      c -> c <= CAST(((id * 33 + j + 42) * 1103515245 + 12345)
             |             % 2147483648 AS DOUBLE) / 2147483648.0))
             |      AS BIGINT) AS w
             |  FROM r
             |  CROSS JOIN (SELECT unnest(generate_series(1, 33)) AS j)),
             |m AS (
             |  SELECT j, CAST(SUM(w * x) AS DOUBLE)
             |    / CAST(SUM(w) AS DOUBLE) AS mb
             |  FROM d GROUP BY 1),
             |ci AS (
             |  SELECT quantile_cont(mb, 0.03125) AS ci_lo,
             |    quantile_cont(mb, 0.96875) AS ci_hi
             |  FROM m)
             |SELECT count(*) AS n,
             |  CAST(SUM(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
             |  ci.ci_lo, ci.ci_hi, CAST(33 AS BIGINT) AS b
             |FROM r CROSS JOIN ci
             |GROUP BY ci.ci_lo, ci.ci_hi""".stripMargin),
      allowBnlj = true),

    // Volume anomaly monitor (ProfileOps.volumeAnomaly): hourly event
    // counts vs median ± 4·MAD — the robust ingest-health gate a
    // mean/stddev z-score fails exactly when the anomaly inflates the
    // stddev. Bucket grain with the flag as data; exact longs, exact
    // dyadic medians, IEEE-exact comparisons ⇒ fully oracled.
    "profile_volume_anomaly" -> QuerySpec(
      (s, d) => ProfileOps.volumeAnomaly(
        t(s, d, "events"), "ts", "hour", k = 4.0)
        .orderBy(col("bucket")),
      Some("""WITH c AS (
             |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             |    count(*) AS cnt
             |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
             |m AS (SELECT quantile_cont(cnt, 0.5) AS med FROM c),
             |d AS (
             |  SELECT bucket, cnt, med,
             |    abs(CAST(cnt AS DOUBLE) - med) AS deviation
             |  FROM c, m),
             |md AS (SELECT quantile_cont(deviation, 0.5) AS mad FROM d)
             |SELECT bucket, cnt, med, deviation, mad,
             |  deviation > 4.0 * mad AS is_anomaly
             |FROM d, md ORDER BY bucket""".stripMargin),
      allowBnlj = true),

    // Fixed-width histogram (ProfileOps.histogram): 1-row min/max
    // broadcast + one partial-aggregating groupBy — two scans total,
    // no global sort. Every bucket formula is plain IEEE-double
    // arithmetic, so DuckDB reproduces the binning bit-for-bit
    // (empty bins are absent on both sides by the same construction).
    "profile_histogram" -> QuerySpec(
      (s, d) => ProfileOps.histogram(t(s, d, "lineitem"), "l_extendedprice", bins = 16)
        .orderBy(col("bin")),
      Some("""WITH s AS (
             |  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
             |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
             |b AS (
             |  SELECT CAST(CASE WHEN mx = mn THEN 0
             |    ELSE LEAST(15, CAST(FLOOR((l_extendedprice - mn) /
             |                              ((mx - mn) / 16.0)) AS BIGINT))
             |    END AS BIGINT) AS bin,
             |    mn, (mx - mn) / 16.0 AS w
             |  FROM lineitem, s WHERE l_extendedprice IS NOT NULL)
             |SELECT bin, mn + bin * w AS bin_lo, mn + (bin + 1) * w AS bin_hi,
             |  count(*) AS cnt
             |FROM b GROUP BY bin, mn, w ORDER BY bin""".stripMargin),
      allowBnlj = true),

    // Two-snapshot distribution drift (ProfileOps.snapshotDrift): the
    // refresh-monitoring gate — 'view' events are the reference
    // distribution, 'purchase' events the monitored snapshot, both
    // binned on the REFERENCE's exact octile thresholds. Per-bin
    // occupancy shares plus the χ²/KS/TV drift terms, every double a
    // FIXED IEEE sequence over exact integer counts (never a cross-bin
    // double sum — accumulation order is the cross-engine trap), so
    // the key is fully oracled: DuckDB rebuilds thresholds
    // (quantile_cont ≡ percentile, the prep_quantile_bins-proven
    // identity), counts, CDFs and terms.
    "profile_snapshot_drift" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
        ProfileOps.snapshotDrift(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"),
          "value", nBins = 8, driftThreshold = 0.02)
          .orderBy(col("bin"))
      },
      Some {
        val ts = (1 to 7).map(k =>
          s"quantile_cont(value, 0.${125 * k}) AS t$k").mkString(", ")
        val binExpr = (1 to 7).map(k =>
          s"CASE WHEN value > t$k THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH p AS (
           |  SELECT $ts FROM events
           |  WHERE event_type = 'view' AND value IS NOT NULL),
           |rb AS (
           |  SELECT CAST($binExpr AS INTEGER) AS bin
           |  FROM events CROSS JOIN p
           |  WHERE event_type = 'view' AND value IS NOT NULL),
           |cb AS (
           |  SELECT CAST($binExpr AS INTEGER) AS bin
           |  FROM events CROSS JOIN p
           |  WHERE event_type = 'purchase' AND value IS NOT NULL),
           |rc AS (SELECT bin, count(*) AS n FROM rb GROUP BY 1),
           |cc AS (SELECT bin, count(*) AS n FROM cb GROUP BY 1),
           |spine AS (SELECT CAST(range AS INTEGER) AS bin FROM range(8)),
           |j AS (
           |  SELECT s.bin,
           |    CAST(coalesce(rc.n, 0) AS BIGINT) AS n_ref,
           |    CAST(coalesce(cc.n, 0) AS BIGINT) AS n_cur
           |  FROM spine s
           |  LEFT JOIN rc ON rc.bin = s.bin
           |  LEFT JOIN cc ON cc.bin = s.bin),
           |t AS (
           |  SELECT bin, n_ref, n_cur,
           |    CAST(n_ref AS DOUBLE) / CAST(sum(n_ref) OVER () AS DOUBLE) AS p_ref,
           |    CAST(n_cur AS DOUBLE) / CAST(sum(n_cur) OVER () AS DOUBLE) AS p_cur,
           |    CAST(sum(n_ref) OVER (ORDER BY bin) AS DOUBLE)
           |      / CAST(sum(n_ref) OVER () AS DOUBLE) AS cdf_ref,
           |    CAST(sum(n_cur) OVER (ORDER BY bin) AS DOUBLE)
           |      / CAST(sum(n_cur) OVER () AS DOUBLE) AS cdf_cur
           |  FROM j)
           |SELECT bin, n_ref, n_cur, p_ref, p_cur,
           |  abs(p_ref - p_cur) AS abs_diff,
           |  CASE WHEN n_ref > 0
           |    THEN (p_cur - p_ref) * (p_cur - p_ref) / p_ref END AS chi2_term,
           |  abs(cdf_ref - cdf_cur) AS ks_term,
           |  CAST(abs(p_ref - p_cur) > 0.02 AS INTEGER) AS drifted
           |FROM t ORDER BY bin""".stripMargin
      },
      allowBnlj = true),

    // POPULATION STABILITY INDEX (round 13): the industry refresh-gate
    // scalar beside profile_snapshot_drift's per-bin χ²/KS/TV terms —
    // the drift doc explicitly leaves PSI as "the caller's fold"; this
    // key IS that fold, oracled. Same frozen-reference equi-depth bins;
    // Haldane-smoothed shares (count + 0.5, total + nBins/2 — the
    // deterministic zero-bin guard, no ε clamp) feed
    // (q−p)·ln(q/p) per bin. Discipline: shares and their diff are
    // fixed IEEE over exact counts; ln is the ONLY transcendental,
    // quantized DECIMAL(20,9); the diff quantizes DECIMAL(12,9); the
    // per-bin product and the ≤8-row total are EXACT decimals,
    // presented as doubles (oracle quantizes AND presents through
    // VARCHAR — the ts_backtest double-rounding lesson). Partition-less
    // windows sanctioned: the frame is nBins rows.
    "profile_psi" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
        val ds = ProfileOps.snapshotDrift(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"),
          "value", nBins = 8, driftThreshold = 0.02)
        val wAll = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val staged = ds
          .select(col("bin"), col("n_ref"), col("n_cur"),
            col("p_ref"), col("p_cur"))
          .withColumn("_nr", sum(col("n_ref")).over(wAll))
          .withColumn("_nc", sum(col("n_cur")).over(wAll))
          .withColumn("_ps", (col("n_ref").cast(DoubleType) + lit(0.5)) /
            (col("_nr").cast(DoubleType) + lit(4.0)))
          .withColumn("_qs", (col("n_cur").cast(DoubleType) + lit(0.5)) /
            (col("_nc").cast(DoubleType) + lit(4.0)))
          .withColumn("_term",
            (col("_qs") - col("_ps")).cast(DecimalType(12, 9)) *
              log(col("_qs") / col("_ps")).cast(DecimalType(20, 9)))
        staged
          .withColumn("psi_term", col("_term").cast(DoubleType))
          .withColumn("psi", sum(col("_term")).over(wAll).cast(DoubleType))
          .select(col("bin"), col("n_ref"), col("n_cur"),
            col("p_ref"), col("p_cur"), col("psi_term"), col("psi"))
          .orderBy(col("bin"))
      },
      Some {
        val ts = (1 to 7).map(k =>
          s"quantile_cont(value, 0.${125 * k}) AS t$k").mkString(", ")
        val binExpr = (1 to 7).map(k =>
          s"CASE WHEN value > t$k THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH p AS (
           |  SELECT $ts FROM events
           |  WHERE event_type = 'view' AND value IS NOT NULL),
           |rb AS (
           |  SELECT CAST($binExpr AS INTEGER) AS bin
           |  FROM events CROSS JOIN p
           |  WHERE event_type = 'view' AND value IS NOT NULL),
           |cb AS (
           |  SELECT CAST($binExpr AS INTEGER) AS bin
           |  FROM events CROSS JOIN p
           |  WHERE event_type = 'purchase' AND value IS NOT NULL),
           |rc AS (SELECT bin, count(*) AS n FROM rb GROUP BY 1),
           |cc AS (SELECT bin, count(*) AS n FROM cb GROUP BY 1),
           |spine AS (SELECT CAST(range AS INTEGER) AS bin FROM range(8)),
           |j AS (
           |  SELECT s.bin,
           |    CAST(coalesce(rc.n, 0) AS BIGINT) AS n_ref,
           |    CAST(coalesce(cc.n, 0) AS BIGINT) AS n_cur
           |  FROM spine s
           |  LEFT JOIN rc ON rc.bin = s.bin
           |  LEFT JOIN cc ON cc.bin = s.bin),
           |t AS (
           |  SELECT bin, n_ref, n_cur,
           |    CAST(n_ref AS DOUBLE) / CAST(sum(n_ref) OVER () AS DOUBLE) AS p_ref,
           |    CAST(n_cur AS DOUBLE) / CAST(sum(n_cur) OVER () AS DOUBLE) AS p_cur,
           |    (CAST(n_ref AS DOUBLE) + 0.5)
           |      / (CAST(CAST(sum(n_ref) OVER () AS BIGINT) AS DOUBLE) + 4.0) AS ps,
           |    (CAST(n_cur AS DOUBLE) + 0.5)
           |      / (CAST(CAST(sum(n_cur) OVER () AS BIGINT) AS DOUBLE) + 4.0) AS qs
           |  FROM j),
           |u AS (
           |  SELECT bin, n_ref, n_cur, p_ref, p_cur,
           |    CAST(CAST(qs - ps AS VARCHAR) AS DECIMAL(12,9))
           |      * CAST(CAST(ln(qs / ps) AS VARCHAR) AS DECIMAL(20,9)) AS term
           |  FROM t)
           |SELECT bin, n_ref, n_cur, p_ref, p_cur,
           |  CAST(CAST(term AS VARCHAR) AS DOUBLE) AS psi_term,
           |  CAST(CAST(sum(term) OVER () AS VARCHAR) AS DOUBLE) AS psi
           |FROM u ORDER BY bin""".stripMargin
      },
      allowBnlj = true),

    // Z-order (Morton) clustering key — exact bit interleaving, so the
    // oracle states the same shifts/masks in SQL. The layout-locality
    // property (second-dimension filters touch fewer files) is
    // unit-tested in LayoutSpec; this key pins the key arithmetic.
    "layout_zorder_key" -> QuerySpec(
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          Layout.zOrderKey(3, col("l_linenumber"), pmod(col("l_orderkey"), lit(8)))
            .as("zkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  ((( l_linenumber        >> 0) & 1) << 0) |
             |  ((((l_orderkey % 8)     >> 0) & 1) << 1) |
             |  ((( l_linenumber        >> 1) & 1) << 2) |
             |  ((((l_orderkey % 8)     >> 1) & 1) << 3) |
             |  ((( l_linenumber        >> 2) & 1) << 4) |
             |  ((((l_orderkey % 8)     >> 2) & 1) << 5) AS zkey
             |FROM lineitem WHERE l_orderkey < 2000
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Per-file skipping stats over a STAGED z-ordered write — the
    // data-skipping index a table format maintains, computed via the
    // hidden _metadata column. File NAMES are writer-run-specific ⇒
    // rows-only (names dropped, rows ordered by the min key); the
    // stats-vs-actual-pruning agreement is unit-tested in LayoutSpec,
    // and the layout's REASON TO EXIST is checked in-query: bound_ok=1
    // asserts per-file stat sanity (min ≤ max, n_rows > 0, files
    // present) AND that the summed per-file bounding-box area stays
    // under 75% of files × the 64×64 domain — an unclustered write
    // gives every file the full domain (ratio ≈ 1.0), while 4
    // z-range-partitioned files cover ~a quadrant each (ratio ≈ 0.25;
    // sampled split points straddling Morton quadrant boundaries can
    // widen boxes, bounded by ~0.56 even with every split misplaced).
    "layout_file_stats" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_zorder_files") { p =>
          Layout.writeZOrdered(
            t(s, d, "lineitem").select(
              pmod(col("l_orderkey"), lit(64)).as("ok"),
              pmod(col("l_partkey"), lit(64)).as("pk"),
              col("l_quantity")),
            p, nFiles = 4, bits = 6, "ok", "pk")
        }
        val stats = Layout.fileStats(s.read.parquet(dir), Seq("ok", "pk"))
          .drop("file_path", "file")
          .withColumn("__area",
            (col("ok_max") - col("ok_min") + 1) *
              (col("pk_max") - col("pk_min") + 1))
        // 1-row scalar broadcast (the prep_winsorize frame shape): the
        // coverage ceiling needs the ACROSS-file area sum
        val totals = stats.agg(
          sum(col("__area")).as("__sum_area"),
          count(lit(1)).as("__n_files"))
        stats.crossJoin(broadcast(totals))
          .withColumn("coverage_ratio",
            col("__sum_area").cast(DoubleType) /
              (col("__n_files") * lit(64.0 * 64.0)))
          .withColumn("bound_ok",
            (col("ok_min") <= col("ok_max") &&
              col("pk_min") <= col("pk_max") &&
              col("n_rows") > 0L && col("__n_files") > 0L &&
              col("coverage_ratio") <= lit(0.75)).cast(IntegerType))
          .drop("__area", "__sum_area", "__n_files")
          .orderBy(col("ok_min"), col("pk_min"), col("n_rows"))
      },
      None,
      allowBnlj = true),

    // HASH-EXACT twin of layout_file_stats (r16, r15 verdict ask #5):
    // the per-file min/max/count stats are plain integers DERIVED FROM
    // THE STAGED BYTES, so once the z-ordered write exists both engines
    // can compute them from the same files — DuckDB groups
    // read_parquet(filename=true) by file exactly as fileStats groups
    // by _metadata.file_path. File names still never appear (dropped,
    // rows totally ordered by the stat columns); the parent's full
    // verdict (stat sanity + the ≤0.75 coverage ceiling that proves
    // the clustering worked) rides as bound_ok, stated by the oracle
    // as the constant 1 — a drifting writer or a broken layout flips
    // it and fails the driver hash gate. Staged-path oracle class:
    // compares clean at sf0.01 (the driver's correctness dataset),
    // like every /tmp/graft_stage-reading key.
    "layout_file_stats_checked" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_zorder_files") { p =>
          Layout.writeZOrdered(
            t(s, d, "lineitem").select(
              pmod(col("l_orderkey"), lit(64)).as("ok"),
              pmod(col("l_partkey"), lit(64)).as("pk"),
              col("l_quantity")),
            p, nFiles = 4, bits = 6, "ok", "pk")
        }
        val stats = Layout.fileStats(s.read.parquet(dir), Seq("ok", "pk"))
          .drop("file_path", "file")
          .withColumn("__area",
            (col("ok_max") - col("ok_min") + 1) *
              (col("pk_max") - col("pk_min") + 1))
        val totals = stats.agg(
          sum(col("__area")).as("__sum_area"),
          count(lit(1)).as("__n_files"))
        stats.crossJoin(broadcast(totals))
          .withColumn("bound_ok",
            (col("ok_min") <= col("ok_max") &&
              col("pk_min") <= col("pk_max") &&
              col("n_rows") > 0L && col("__n_files") > 0L &&
              col("__sum_area").cast(DoubleType) /
                (col("__n_files") * lit(64.0 * 64.0)) <= lit(0.75))
              .cast(IntegerType))
          .select(col("ok_min"), col("ok_max"), col("pk_min"),
            col("pk_max"), col("n_rows"), col("bound_ok"))
          .orderBy(col("ok_min"), col("pk_min"), col("n_rows"),
            col("ok_max"), col("pk_max"))
      },
      Some("""WITH fs AS (
             |  SELECT filename,
             |    min(ok) AS ok_min, max(ok) AS ok_max,
             |    min(pk) AS pk_min, max(pk) AS pk_max,
             |    count(*) AS n_rows
             |  FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_zorder_files/*.parquet',
             |    filename=true)
             |  GROUP BY filename)
             |SELECT ok_min, ok_max, pk_min, pk_max, n_rows,
             |  CAST(1 AS INTEGER) AS bound_ok
             |FROM fs
             |ORDER BY ok_min, pk_min, n_rows, ok_max, pk_max""".stripMargin),
      allowBnlj = true),

    // N-gram novelty (unique-content ratio): the fraction of a doc's
    // DISTINCT 3-grams appearing in NO other document — the quality
    // signal that separates original writing from boilerplate/mirrored
    // content (near-zero novelty = the doc is assembled from phrases
    // the corpus already has; the doc-grain complement of
    // dedup_span_stats' gram-grain view). Exact integers end to end,
    // the ratio is one IEEE division. Fully oracled.
    //
    // Scale shape — NO gram-stream self-join: per-doc totals are
    // row-local (size of the distinct-gram array, zero shuffle), and a
    // corpus-unique gram has EXACTLY ONE owner, so min(doc_id) inside
    // the per-gram count aggregation IS the attribution — the second
    // shuffle carries one slim long per unique gram instead of joining
    // the full gram stream back to its counts (the first version's
    // corpus×corpus string join benched 6.3 s at sf0.1; this shape
    // retires it).
    "text_ngram_novelty" -> QuerySpec(
      (s, d) => {
        val docs = t(s, d, "documents")
        val withG = docs.select(col("doc_id"),
          array_distinct(TextOps.ngrams(col("text"), 3)).as("_g"))
        // doc-GRAIN totals (groupBy, not a per-row projection): under a
        // duplicated doc_id the per-row form would emit multiple rows
        // pairing row-local totals with doc-level unique counts — the
        // aggregate keeps one row per doc_id, free at the slim
        // (id, count) grain. Contract: doc_id UNIQUE (the documents
        // table's key). Under duplicate ids this shape and the oracle
        // diverge (row-grain sums/ownership here vs the oracle's
        // (doc_id, gram) DISTINCT); deduping grams by (doc_id, gram)
        // first would restore agreement at the cost of a corpus-scale
        // extra shuffle the unique-key contract makes unnecessary
        val perDoc = withG
          .select(col("doc_id"), size(col("_g")).cast(LongType).as("_n"))
          .groupBy(col("doc_id"))
          .agg(sum(col("_n")).as("n_grams"))
        val uniqueOwned = withG
          .select(col("doc_id"), explode(col("_g")).as("gram"))
          .groupBy(col("gram"))
          .agg(count(lit(1)).as("_nd"), min(col("doc_id")).as("doc_id"))
          .filter(col("_nd") === 1)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_unique"))
        perDoc.join(uniqueOwned, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_unique"))
          // RAW double of one IEEE division — never rounded: a ratio of
          // two small integers lands on decimal half-boundaries where
          // engines' round() provably differ (the search_tfidf lesson),
          // while the division itself is bit-identical cross-engine
          .withColumn("novelty",
            col("n_unique").cast(DoubleType) / col("n_grams"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
             |  FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id, gram FROM (
             |    SELECT doc_id, unnest(
             |      CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             |           ELSE [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                 for i in range(1, len(w) - 1)] END) AS gram
             |    FROM base)),
             |gc AS (SELECT gram, count(*) AS nd FROM grams GROUP BY 1)
             |SELECT g.doc_id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN gc.nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_unique,
             |  CAST(sum(CASE WHEN gc.nd = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*) AS novelty
             |FROM grams g JOIN gc ON gc.gram = g.gram
             |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin)),

    // Row-level PROVENANCE from the hidden `_metadata` column: every
    // record maps back to (file, row position) with zero extra I/O —
    // the training-data lineage hook ("which shard and offset did this
    // example come from") that audit and reproducibility pipelines
    // attach at ingest, and the record-grain companion to
    // layout_file_stats' file-grain view. Fully oracled: DuckDB
    // produces the same positions via read_parquet(file_row_number),
    // so the two engines agree on the physical row order contract.
    // Like the staged-path oracles, the literal path pins this key to
    // the sf0.01 dataset.
    "scan_row_provenance" -> QuerySpec(
      (s, d) => s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"),
          col("_metadata.file_name").as("file_name"),
          col("_metadata.row_index").as("row_idx"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  regexp_extract(filename, '([^/]+)$', 1) AS file_name,
             |  CAST(file_row_number AS BIGINT) AS row_idx
             |FROM read_parquet('/root/testdata/sf0.01/documents.parquet',
             |  filename = true, file_row_number = true)
             |ORDER BY doc_id""".stripMargin)),

    // Deletion-vector read (merge-on-read): deletes recorded at
    // METADATA grain — (file, row position) pairs, the
    // scan_row_provenance coordinates — and applied at scan time as a
    // broadcast anti-join, so a delete never rewrites a data file.
    // The lakehouse DV pattern at 100 TB: a MERGE touching 0.1% of
    // rows writes kilobytes of positions instead of re-staging
    // terabytes of parquet, while the scan keeps its pushdown/pruning
    // (the anti-join is on metadata columns the reader materializes
    // for free). Oracled: DV-filtered read ≡ the predicate complement.
    "upsert_deletion_vectors" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "upsert_dv") { p =>
          t(s, d, "orders").repartition(8, col("o_orderkey"))
            .write.mode("overwrite").parquet(p)
        }
        // the DV build is one provenance scan (a real MERGE emits these
        // positions as its write-side artifact)
        val dv = s.read.parquet(dir)
          .filter(col("o_orderkey") % 7 === 0)
          .select(col("_metadata.file_path").as("_dv_file"),
            col("_metadata.row_index").as("_dv_idx"))
        s.read.parquet(dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"),
            col("_metadata.file_path").as("_f"),
            col("_metadata.row_index").as("_i"))
          .join(broadcast(dv),
            col("_f") === col("_dv_file") && col("_i") === col("_dv_idx"),
            "left_anti")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
             |FROM orders WHERE o_orderkey % 7 <> 0
             |ORDER BY o_orderkey""".stripMargin)),

    // Rolling 24-bucket OLS slope over the hourly click-count series —
    // the LOCAL trend diagnostic between ts_ewma's level smoothing and
    // profile_regression's global fit ("is load rising over the last
    // day, per hour"). x is the bucket's row_number (exact integers),
    // the four moments are DECIMAL window-frame sums (ROWS 23
    // PRECEDING — partial frames at the head emit NULL below n=2 or
    // zero x-variance), and the slope is the profile_regression fixed
    // IEEE chain — the oracle restates frames and chain verbatim. The
    // series grain is bounded (≤ hours in the table's history), so the
    // partition-less window is the documented bounded-frame contract.
    "ts_rolling_slope" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .filter(col("event_type") === "click")
          .groupBy(date_trunc("hour", col("ts")).as("bucket"))
          .agg(count(lit(1)).as("y"))
        val wOrd = Window.orderBy(col("bucket"))
        val wf = wOrd.rowsBetween(-23, 0)
        val d19 = DecimalType(19, 0)
        val withX = hourly
          .withColumn("x", row_number().over(wOrd).cast(d19))
        val n = count(lit(1)).over(wf).cast(DoubleType)
        val sx = sum(col("x")).over(wf).cast(DoubleType)
        val sxx = sum(col("x") * col("x")).over(wf).cast(DoubleType)
        val sy = sum(col("y").cast(d19)).over(wf).cast(DoubleType)
        val sxy = sum(col("x") * col("y").cast(d19)).over(wf)
          .cast(DoubleType)
        withX.select(col("bucket"), col("y"),
            count(lit(1)).over(wf).cast(IntegerType).as("n_window"),
            when(n > 1.0 && n * sxx - sx * sx > 0.0,
              (n * sxy - sx * sy) / (n * sxx - sx * sx)).as("slope"))
          .orderBy(col("bucket"))
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS bucket,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM events WHERE event_type = 'click' GROUP BY 1),
             |wx AS (
             |  SELECT bucket, y,
             |    CAST(row_number() OVER (ORDER BY bucket) AS DECIMAL(19,0))
             |      AS x
             |  FROM hourly),
             |m AS (
             |  SELECT bucket, y,
             |    CAST(count(*) OVER w AS DOUBLE) AS n,
             |    CAST(count(*) OVER w AS INTEGER) AS n_window,
             |    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
             |    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(y AS DECIMAL(19,0))) OVER w AS DOUBLE) AS sy,
             |    CAST(SUM(x * CAST(y AS DECIMAL(19,0))) OVER w AS DOUBLE)
             |      AS sxy
             |  FROM wx
             |  WINDOW w AS (ORDER BY bucket
             |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
             |SELECT bucket, y, n_window,
             |  CASE WHEN n > 1.0 AND n * sxx - sx * sx > 0.0
             |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope
             |FROM m ORDER BY bucket""".stripMargin)),

    // Windowed EWMA: aggregate-HOF fold over a collect_list ROWS frame —
    // a FIXED left-to-right IEEE op chain, so DuckDB's list_reduce
    // reproduces it bit-for-bit (probed: identical doubles). One shuffle
    // on the key, O(span) state per row; the exact-recurrence twin
    // (ewmaExact, O(1)-state sorted stream) is unit-tested against this
    // one's truncation bound in TimeSeriesOpsSpec.
    "ts_ewma" -> QuerySpec(
      (s, d) => TimeSeriesOps.ewmaWindowed(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "event_id", "value", alpha = 0.25, span = 20)
        .orderBy(col("event_id")),
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events)
             |SELECT event_id, user_id, value,
             |  list_reduce(lst, (acc, x) -> acc * 0.75 + x * 0.25) AS ewma
             |FROM l ORDER BY event_id""".stripMargin)),

    // Holt linear (double exponential) smoothing
    // (TimeSeriesOps.holtWindowed): level+trend recursion over the same
    // 20-observation frame as ts_ewma — the trend-following monitor
    // EWMA structurally lags on. α/β complements are exact binary
    // fractions (0.75, 0.875) so the mirrored SQL literals are the
    // same doubles; the fold carries a [l, b] ARRAY accumulator on
    // both engines — NOT a struct, because DuckDB's list_reduce
    // mutates a struct accumulator in place field by field (the second
    // field's formula would read the first field's NEW value; measured
    // divergence, pinned by the holtWindowed fixture unit) ⇒ fully
    // oracled bit-for-bit.
    "ts_holt_linear" -> QuerySpec(
      (s, d) => TimeSeriesOps.holtWindowed(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "event_id", "value",
        alpha = 0.25, beta = 0.125, span = 20)
        .orderBy(col("event_id")),
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, value,
             |    list_reduce(
             |      list_transform(lst, x -> [x, CAST(0.0 AS DOUBLE)]),
             |      (acc, e) -> [
             |        e[1] * 0.25 + 0.75 * (acc[1] + acc[2]),
             |        0.125 * ((e[1] * 0.25 + 0.75 * (acc[1] + acc[2]))
             |          - acc[1]) + 0.875 * acc[2]]) AS hw
             |  FROM l)
             |SELECT event_id, user_id, value,
             |  hw[1] AS level, hw[2] AS trend, hw[1] + hw[2] AS forecast
             |FROM f ORDER BY event_id""".stripMargin)),

    // Holt-Winters additive seasonal (triple exponential) smoothing
    // (TimeSeriesOps.holtWintersWindowed): the [l, b, s₁..s₄] rotating
    // ARRAY accumulator over the same 20-observation frame — the
    // periodic-load monitor Holt structurally lags on. α/β/γ
    // complements are exact binary fractions (0.75, 0.875, 0.5); the
    // oracle repeats the level expression textually inside trend and
    // season (same IEEE ops — the holt-linear precedent) and rotates
    // the seasonal block positionally ⇒ fully oracled bit-for-bit.
    "ts_holt_winters" -> QuerySpec(
      (s, d) => TimeSeriesOps.holtWintersWindowed(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "event_id", "value",
        alpha = 0.25, beta = 0.125, gamma = 0.5, period = 4, span = 20)
        .orderBy(col("event_id")),
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, value,
             |    list_reduce(
             |      list_transform(lst, x -> [x, CAST(0.0 AS DOUBLE),
             |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]),
             |      (acc, e) -> [
             |        0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2]),
             |        0.125 * ((0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2]))
             |          - acc[1]) + 0.875 * acc[2],
             |        acc[4], acc[5], acc[6],
             |        0.5 * (e[1] - (0.25 * (e[1] - acc[3])
             |          + 0.75 * (acc[1] + acc[2]))) + 0.5 * acc[3]]) AS hw
             |  FROM l)
             |SELECT event_id, user_id, value,
             |  hw[1] AS level, hw[2] AS trend, hw[3] AS seasonal_next,
             |  hw[1] + hw[2] + hw[3] AS forecast
             |FROM f ORDER BY event_id""".stripMargin)),

    // ROLLING-ORIGIN BACKTEST of the Holt forecaster
    // (TimeSeriesOps.holtBacktest, round 13): every row is a forecast
    // origin, the h-step forecast level+h·trend is scored against the
    // realized value h rows later — per (series, horizon) n/MAE/sMAPE,
    // the gate that picks α/β/span and says which horizons to trust.
    // Errors are fixed IEEE chains over the bit-exact Holt fold,
    // quantized once to exact decimals (zero-denominator sMAPE terms
    // NULLed explicitly — engines disagree on double x/0), one IEEE
    // division per metric. MEASURED trap (the profile_gini cast class,
    // quantization direction): DuckDB's direct DOUBLE→DECIMAL cast
    // multiplies by 10^scale IN DOUBLE ARITHMETIC — double-rounding
    // that flipped one of ~100k values by 1e-6 vs Spark's exact
    // BigDecimal conversion — so the oracle quantizes through VARCHAR
    // (shortest-roundtrip print, then exact decimal rounding). The state window and all six lag
    // expressions share one (key, order) sort.
    "ts_backtest" -> QuerySpec(
      (s, d) => TimeSeriesOps.holtBacktest(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "event_id", "value",
        alpha = 0.25, beta = 0.125, span = 20, horizons = Seq(1, 2, 3))
        .orderBy(col("user_id"), col("horizon")),
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, value,
             |    list_reduce(
             |      list_transform(lst, x -> [x, CAST(0.0 AS DOUBLE)]),
             |      (acc, e) -> [
             |        e[1] * 0.25 + 0.75 * (acc[1] + acc[2]),
             |        0.125 * ((e[1] * 0.25 + 0.75 * (acc[1] + acc[2]))
             |          - acc[1]) + 0.875 * acc[2]]) AS hw
             |  FROM l),
             |g AS (
             |  SELECT user_id, value,
             |    lag(hw[1], 1) OVER w AS l1, lag(hw[2], 1) OVER w AS b1,
             |    lag(hw[1], 2) OVER w AS l2, lag(hw[2], 2) OVER w AS b2,
             |    lag(hw[1], 3) OVER w AS l3, lag(hw[2], 3) OVER w AS b3
             |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
             |e AS (
             |  SELECT user_id, h.horizon, value AS vv,
             |    CASE h.horizon WHEN 1 THEN l1 + 1.0 * b1
             |                   WHEN 2 THEN l2 + 2.0 * b2
             |                   ELSE l3 + 3.0 * b3 END AS fc
             |  FROM g CROSS JOIN (SELECT unnest([1, 2, 3]) AS horizon) h),
             |q AS (
             |  SELECT user_id, horizon,
             |    CAST(CAST(abs(vv - fc) AS VARCHAR) AS DECIMAL(20,6)) AS ae,
             |    CASE WHEN abs(vv) + abs(fc) = 0.0 THEN NULL
             |         ELSE CAST(CAST(2.0 * abs(vv - fc) / (abs(vv) + abs(fc))
             |                AS VARCHAR) AS DECIMAL(12,6)) END AS st
             |  FROM e WHERE fc IS NOT NULL),
             |a AS (
             |  SELECT user_id, CAST(horizon AS INTEGER) AS horizon,
             |    CAST(count(*) AS BIGINT) AS n,
             |    SUM(ae) AS sae,
             |    CAST(count(st) AS BIGINT) AS nst, SUM(st) AS sst
             |  FROM q GROUP BY 1, 2)
             |SELECT user_id, horizon, n,
             |  CAST(CAST(sae AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mae,
             |  CAST(CAST(sst AS VARCHAR) AS DOUBLE)
             |    / CAST(NULLIF(nst, 0) AS DOUBLE) AS smape
             |FROM a ORDER BY user_id, horizon""".stripMargin)),

    // Seasonal-residual anomaly alarm: value vs the PREVIOUS row's
    // Holt-Winters one-step forecast, flagged at 4× the series' median
    // absolute residual — the seasonality-aware outlier rule a plain
    // z/MAD rule false-alarms on every cycle peak of. Composes
    // ts_holt_winters' fold + one lag + an exact-percentile per-series
    // scale (parity pinned by fn_percentile); first row per series has
    // NULL residual/alarm as data.
    "ts_seasonal_alarm" -> QuerySpec(
      (s, d) => {
        val hw = TimeSeriesOps.holtWintersWindowed(
          t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
          "user_id", "event_id", "value",
          alpha = 0.25, beta = 0.125, gamma = 0.5, period = 4, span = 20)
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        // the per-series median rides as a WINDOW aggregate over the
        // same user partition — ONE pass over the (interpreted-HOF,
        // hence expensive) HW fold, no self-join, no checkpoint; an
        // aggregate-then-join shape re-evaluated the fold (measured
        // 7.1 s → this form); percentile ignores the first row's NULL
        val res = hw.withColumn("residual",
          col("value") - lag(col("forecast"), 1).over(w))
        res
          .withColumn("med_abs_resid",
            expr("percentile(abs(residual), 0.5)")
              .over(Window.partitionBy(col("user_id"))))
          .select(col("event_id"), col("user_id"), col("value"),
            col("residual"), col("med_abs_resid"),
            (abs(col("residual")) > col("med_abs_resid") * lit(4.0)).as("alarm"))
          .orderBy(col("event_id"))
      },
      Some("""WITH l AS (
             |  SELECT event_id, user_id, value,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |f AS (
             |  SELECT event_id, user_id, value,
             |    list_reduce(
             |      list_transform(lst, x -> [x, CAST(0.0 AS DOUBLE),
             |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
             |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]),
             |      (acc, e) -> [
             |        0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2]),
             |        0.125 * ((0.25 * (e[1] - acc[3]) + 0.75 * (acc[1] + acc[2]))
             |          - acc[1]) + 0.875 * acc[2],
             |        acc[4], acc[5], acc[6],
             |        0.5 * (e[1] - (0.25 * (e[1] - acc[3])
             |          + 0.75 * (acc[1] + acc[2]))) + 0.5 * acc[3]]) AS hw
             |  FROM l),
             |r AS (
             |  SELECT event_id, user_id, value,
             |    value - lag(hw[1] + hw[2] + hw[3], 1) OVER (
             |      PARTITION BY user_id ORDER BY event_id) AS residual
             |  FROM f),
             |m AS (
             |  SELECT event_id, user_id, value, residual,
             |    quantile_cont(abs(residual), 0.5) OVER (
             |      PARTITION BY user_id) AS mar
             |  FROM r)
             |SELECT event_id, user_id, value, residual,
             |  mar AS med_abs_resid,
             |  abs(residual) > mar * 4.0 AS alarm
             |FROM m ORDER BY event_id""".stripMargin)),

    // Sample autocorrelation function (TimeSeriesOps.acf): ACF at lags
    // 1..24 over the hourly event-count series — the seasonality
    // diagnostic that picks Holt-Winters' period. ONE corpus-scale
    // hour-bucket aggregation produces the series; everything after is
    // model-sized (the single-partition row_number window is bounded
    // by the hour count — ≤ ~720 buckets per 30-day fixture — the same
    // bounded-frame contract as agg_survival_km). Exactness: mean
    // cleared by ×n (dev = n·x − Σx exact longs), lag numerators and
    // the denominator exact DECIMAL(38,0) sums presented as DOUBLE
    // (r14: the long product wrapped once n·max|x| > ~3e9 — see the
    // acf scaladoc; the oracle mirrors with HUGEINT sums and the same
    // one correctly-rounded →DOUBLE cast), ONE IEEE division per lag
    // ⇒ fully oracled. Gaps note: the series is indexed by DENSE bucket
    // position (row index), so empty hours compress out — the
    // documented semantic both engines restate identically.
    "ts_acf" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val series = hourly.withColumn("idx",
          (row_number().over(Window.orderBy(col("h"))) - 1)
            .cast(LongType))
        TimeSeriesOps.acf(series, "idx", "x", maxLag = 24)
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |s AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
             |        AS idx, x FROM hourly),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx FROM s),
             |dev AS (SELECT idx, n * x - sx AS dev FROM s CROSS JOIN tot),
             |den AS (SELECT CAST(sum(CAST(dev AS HUGEINT) * dev) AS DOUBLE)
             |          AS den FROM dev),
             |lags AS (SELECT CAST(unnest(range(1, 25)) AS BIGINT) AS lag),
             |pairs AS (
             |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(CAST(a.dev AS HUGEINT) * b.dev) AS DOUBLE) AS num
             |  FROM dev a CROSS JOIN lags l
             |  JOIN dev b ON b.idx = a.idx + l.lag
             |  GROUP BY 1)
             |SELECT lag, n_pairs, num, dn.den AS den,
             |  num / dn.den AS acf
             |FROM pairs CROSS JOIN den dn ORDER BY lag""".stripMargin),
      allowBnlj = true),

    // Sample CROSS-correlation function (TimeSeriesOps.ccf): CCF at
    // lags −12..+12 between the hourly 'click' and 'purchase' count
    // series — ts_acf's two-series companion, the lead/lag diagnostic
    // ("do clicks lead purchases, and by how many hours?") an
    // attribution/ops pipeline runs before any causal claim. BOTH
    // series come out of ONE conditional hour-bucket aggregation, so
    // they are aligned on the same dense spine by construction (a
    // per-type join of separately-built series would drop hours where
    // either type is absent — the documented hazard the op's input
    // contract exists for). Exactness: the ts_acf algebra with two
    // means cleared — exact-long devs, DECIMAL(38,0) numerator and
    // both denominators presented as DOUBLE, ccf = num/(√dx·√dy) a
    // three-op fixed IEEE sequence (sqrt is correctly-rounded on both
    // engines — the cosine keys' precedent) ⇒ fully oracled.
    "ts_xcorr" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(when(col("event_type") === "click", 1)).as("x"),
            count(when(col("event_type") === "purchase", 1)).as("y"))
        val series = hourly.withColumn("idx",
          (row_number().over(Window.orderBy(col("h"))) - 1)
            .cast(LongType))
        TimeSeriesOps.ccf(series, "idx", "x", "y", maxLag = 12)
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS x,
             |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |s AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
             |        AS idx, x, y FROM hourly),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx,
             |               CAST(sum(y) AS BIGINT) AS sy FROM s),
             |dev AS (SELECT idx, n * x - sx AS devx, n * y - sy AS devy
             |        FROM s CROSS JOIN tot),
             |den AS (SELECT
             |    CAST(sum(CAST(devx AS HUGEINT) * devx) AS DOUBLE) AS den_x,
             |    CAST(sum(CAST(devy AS HUGEINT) * devy) AS DOUBLE) AS den_y
             |  FROM dev),
             |lags AS (SELECT CAST(unnest(range(-12, 13)) AS BIGINT) AS lag),
             |pairs AS (
             |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(CAST(a.devx AS HUGEINT) * b.devy) AS DOUBLE) AS num
             |  FROM dev a CROSS JOIN lags l
             |  JOIN dev b ON b.idx = a.idx + l.lag
             |  GROUP BY 1)
             |SELECT lag, n_pairs, num, dn.den_x AS den_x, dn.den_y AS den_y,
             |  CASE WHEN dn.den_x > 0 AND dn.den_y > 0
             |    THEN num / (sqrt(dn.den_x) * sqrt(dn.den_y))
             |    ELSE NULL END AS ccf
             |FROM pairs CROSS JOIN den dn ORDER BY lag""".stripMargin),
      allowBnlj = true),

    // Classical additive decomposition (TimeSeriesOps
    // .decomposeClassical): trend (2×24 centered MA) + hour-of-day
    // seasonal means + residual over the hourly event-count series —
    // ts_acf finds the period, this splits along it. Exact-long CMA
    // numerator and detrended values; trend/seasonal/residual are
    // short fixed IEEE sequences the oracle restates textually ⇒
    // fully oracled. Season keys come from the bucket TIMESTAMP (not
    // the dense index), so compressed-out empty hours cannot shift
    // the phase; edge rows without a full 24h window are excluded by
    // the standard CMA contract.
    "ts_decompose_classical" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val series = hourly
          .withColumn("idx",
            (row_number().over(Window.orderBy(col("h"))) - 1)
              .cast(LongType))
          .withColumn("hod", hour(col("h")).cast(IntegerType))
        TimeSeriesOps.decomposeClassical(series, "idx", "x", "hod",
          period = 24)
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |s AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
             |        AS idx, CAST(hour(h) AS INTEGER) AS season, x
             |      FROM hourly),
             |t0 AS (
             |  SELECT idx, season, x,
             |    lag(x, 12) OVER w + lead(x, 12) OVER w
             |      + 2 * SUM(x) OVER (ORDER BY idx
             |          ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING) AS tn
             |  FROM s WINDOW w AS (ORDER BY idx)),
             |t1 AS (
             |  SELECT idx, season, x, tn, 48 * x - tn AS dq
             |  FROM t0 WHERE tn IS NOT NULL),
             |seas AS (
             |  SELECT season,
             |    CAST(SUM(dq) AS DOUBLE) / CAST(48 * count(*) AS DOUBLE)
             |      AS seasonal
             |  FROM t1 GROUP BY 1)
             |SELECT idx, t1.season, x,
             |  CAST(tn AS DOUBLE) / 48.0 AS trend,
             |  seas.seasonal,
             |  CAST(dq AS DOUBLE) / 48.0 - seas.seasonal AS residual
             |FROM t1 JOIN seas ON seas.season = t1.season
             |ORDER BY idx""".stripMargin)),

    // Single-changepoint LOCATION (TimeSeriesOps.changepointCusum):
    // argmax_t |t·S_n − n·S_t| over the hourly-count series with a
    // PLANTED +25 level shift from bucket 400 on — the alarms say
    // whether, this says where (and must recover exactly t = 400;
    // ok_cp carries the planted truth as data). Exact-long prefix sums
    // and objective, smallest-t ties, IEEE only on the output row's
    // two means ⇒ fully oracled.
    "ts_changepoint" -> QuerySpec(
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x0"))
        val series = hourly
          .withColumn("idx",
            (row_number().over(Window.orderBy(col("h"))) - 1)
              .cast(LongType))
          .withColumn("x",
            col("x0") + when(col("idx") >= 400, 25L).otherwise(0L))
        TimeSeriesOps.changepointCusum(series, "idx", "x")
          .withColumn("ok_cp", (col("cp") === 400L).cast(IntegerType))
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS h,
             |    CAST(count(*) AS BIGINT) AS x0
             |  FROM events GROUP BY 1),
             |s AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
             |        AS idx, x0 FROM hourly),
             |s2 AS (SELECT idx,
             |         x0 + CASE WHEN idx >= 400 THEN 25 ELSE 0 END AS x
             |       FROM s),
             |pre AS (SELECT idx, CAST(SUM(x) OVER (ORDER BY idx
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS BIGINT) AS st
             |        FROM s2),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(SUM(x) AS BIGINT) AS sn FROM s2),
             |d AS (
             |  SELECT idx + 1 AS t, n, sn, st,
             |    abs((idx + 1) * sn - n * st) AS d
             |  FROM pre CROSS JOIN tot
             |  WHERE idx + 1 < n)
             |SELECT t AS cp, n, d AS d_max,
             |  CAST(st AS DOUBLE) / CAST(t AS DOUBLE) AS mean_before,
             |  CAST(sn - st AS DOUBLE) / CAST(n - t AS DOUBLE) AS mean_after,
             |  CAST(sn - st AS DOUBLE) / CAST(n - t AS DOUBLE)
             |    - CAST(st AS DOUBLE) / CAST(t AS DOUBLE) AS shift,
             |  CAST(t = 400 AS INTEGER) AS ok_cp
             |FROM d ORDER BY d DESC, t LIMIT 1""".stripMargin),
      allowBnlj = true),

    // Two-sided tabular CUSUM drift alarm (TimeSeriesOps.cusumWindowed,
    // Page 1954): per-user clamped deviation sums vs the user's exact
    // per-series mean — the sustained-small-shift detector point-
    // outlier rules (MAD/z) structurally miss. Target = exact decimal
    // per-user mean (one agg, joined on the same user key the window
    // shuffles on); [S⁺,S⁻] ARRAY fold; the oracle prepends a literal
    // 0 so DuckDB's seedless list_reduce starts at this fold's exact
    // [0,0] state ⇒ fully oracled.
    "ts_cusum_alarm" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("value"))
        val tgt = ev.groupBy(col("user_id"))
          .agg((sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("target"))
        TimeSeriesOps.cusumWindowed(
          ev.join(tgt, "user_id"), "user_id", "event_id", "value",
          "target", slack = 25.0, threshold = 200.0, span = 20)
          .orderBy(col("event_id"))
      },
      Some("""WITH m AS (
             |  SELECT user_id,
             |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      / CAST(count(*) AS DOUBLE) AS target
             |  FROM events GROUP BY 1),
             |j AS (
             |  SELECT e.user_id, e.event_id, e.value, m.target
             |  FROM events e JOIN m USING (user_id)),
             |l AS (
             |  SELECT user_id, event_id, value, target,
             |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
             |  FROM j),
             |f AS (
             |  SELECT user_id, event_id, value, target,
             |    list_reduce(
             |      list_transform(
             |        list_prepend(CAST(0.0 AS DOUBLE), lst),
             |        x -> [x, x]),
             |      (acc, e) -> [
             |        greatest(CAST(0.0 AS DOUBLE),
             |          acc[1] + (e[1] - target - 25.0)),
             |        greatest(CAST(0.0 AS DOUBLE),
             |          acc[2] + (target - 25.0 - e[1]))]) AS cs
             |  FROM l)
             |SELECT user_id, event_id, value, target,
             |  cs[1] AS cusum_hi, cs[2] AS cusum_lo,
             |  cs[1] > 200.0 OR cs[2] > 200.0 AS alarm
             |FROM f ORDER BY event_id""".stripMargin)),

    // Two-stage near-dup verify: bigram-Jaccard blocking proposes, banded
    // levenshtein confirms. Planted twins (every 5th doc re-added under a
    // fresh id with its first two tokens dropped) give true positives
    // with a known small edit distance; the corpus text column never
    // shuffles (both attachment joins broadcast the pair side).
    // Sorted-neighborhood record linkage (DedupOps.sortedNeighborLinkage,
    // Hernández & Stolfo merge/purge): records sort by normalized text
    // INSIDE 8-char-prefix blocks and compare only each record's next 2
    // neighbors — candidate count ≤ N·2, one partitioned Window (single
    // shuffle on the block key), no self-join, no N². The blocking
    // complement to MinHash-LSH for prefix-sharing near-dups; planted
    // truncated twins (last 2 words dropped, so the sort prefix
    // survives) verify recall. Word-set Jaccard = exact integer set
    // sizes + ONE IEEE division ⇒ fully oracled.
    "dedup_record_linkage" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id"), col("text"))
        val words = split(col("text"), " ")
        val planted = base.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            array_join(slice(words, lit(1), greatest(size(words) - 2, lit(1))),
              " ").as("text"))
        DedupOps.sortedNeighborLinkage(base.unionByName(planted),
          "doc_id", "text",
          blockKey = substring(lower(trim(col("text"))), 1, 8),
          windowSize = 2, minSim = 0.6)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 400
             |  UNION ALL
             |  SELECT doc_id + 10000,
             |    array_to_string((string_split(text, ' '))
             |      [1:greatest(len(string_split(text, ' ')) - 2, 1)], ' ')
             |  FROM documents WHERE doc_id < 400 AND doc_id % 5 = 0),
             |n AS (SELECT id, lower(trim(text)) AS nrm FROM docs
             |      WHERE length(lower(trim(text))) > 0),
             |b AS (SELECT id, nrm, substring(nrm, 1, 8) AS blk,
             |        list_distinct(regexp_split_to_array(nrm, '\s+')) AS toks
             |      FROM n),
             |l AS (SELECT id, toks, blk,
             |    lead(id, 1) OVER w AS id1, lead(toks, 1) OVER w AS t1,
             |    lead(id, 2) OVER w AS id2, lead(toks, 2) OVER w AS t2
             |  FROM b WINDOW w AS (PARTITION BY blk ORDER BY nrm, id)),
             |p AS (
             |  SELECT id AS id_a, id1 AS id_b,
             |    CAST(len(list_intersect(toks, t1)) AS DOUBLE) /
             |      (len(toks) + len(t1) - len(list_intersect(toks, t1))) AS sim
             |  FROM l WHERE id1 IS NOT NULL
             |  UNION ALL
             |  SELECT id, id2,
             |    CAST(len(list_intersect(toks, t2)) AS DOUBLE) /
             |      (len(toks) + len(t2) - len(list_intersect(toks, t2)))
             |  FROM l WHERE id2 IS NOT NULL)
             |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.6
             |ORDER BY id_a, id_b""".stripMargin)),

    "dedup_edit_distance" -> QuerySpec(
      (s, d) => {
        val base = t(s, d, "documents").filter(col("doc_id") < 60)
          .select(col("doc_id"), col("text"))
        val planted = base.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 3, 1000000)).as("text"))
        DedupOps.editDistanceVerify(base.unionByName(planted),
          "doc_id", "text", minJaccard = 0.5, maxDist = 40, shingleN = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 60
             |  UNION ALL
             |  SELECT doc_id + 10000,
             |    array_to_string((string_split(text, ' '))[3:], ' ')
             |  FROM documents WHERE doc_id < 60 AND doc_id % 5 = 0),
             |w AS (SELECT id, string_split(lower(text), ' ') AS w FROM docs),
             |toks AS (
             |  SELECT id, unnest(list_distinct([w[i] || ' ' || w[i+1]
             |    for i in range(1, len(w))])) AS tok FROM w),
             |sizes AS (SELECT id, count(*) AS n FROM toks GROUP BY id),
             |inter AS (
             |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
             |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
             |  GROUP BY 1, 2),
             |cand AS (
             |  SELECT id_a, id_b,
             |    CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
             |  FROM inter
             |  JOIN sizes sa ON sa.id = id_a
             |  JOIN sizes sb ON sb.id = id_b
             |  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5)
             |SELECT id_a, id_b, jaccard,
             |  CAST(levenshtein(ta.text, tb.text) AS INTEGER) AS edit_dist
             |FROM cand
             |JOIN docs ta ON ta.id = id_a
             |JOIN docs tb ON tb.id = id_b
             |WHERE levenshtein(ta.text, tb.text) <= 40
             |ORDER BY id_a, id_b""".stripMargin)),

    // Whole-file binary source (spark.read.format("binaryFile")) — the
    // ingestion shape for media/document blobs before any decode. Staged
    // CSV bytes are deterministic (hash-partitioned + sorted writer), so
    // both engines hash the SAME bytes: Spark md5 over the binary
    // column, DuckDB md5(decode(read_blob(...))) over the same files.
    // The oracle path is the staged dir for the CORRECTNESS dataset
    // (sf0.01 — the only sf the driver oracles; Verify stages before
    // DuckDB reads). File content vs java.nio ground truth is
    // additionally unit-asserted in ReadersSpec.
    "scan_binaryfile" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "scan_binaryfile") { p =>
          t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderpriority"))
            .repartition(4, col("o_orderkey"))
            .sortWithinPartitions(col("o_orderkey"))
            .write.mode("overwrite").option("header", "true").csv(p)
        }
        Readers.readBinaryFiles(s, dir, "*.csv")
          .select(length(col("content")).as("n_bytes"),
            md5(col("content")).as("digest"))
          .orderBy(col("digest"))
      },
      Some("""SELECT CAST(octet_length(content) AS INTEGER) AS n_bytes,
             |  md5(decode(content)) AS digest
             |FROM read_blob(
             |  '/tmp/graft_stage/_root_testdata_sf0.01/scan_binaryfile/*.csv')
             |ORDER BY digest""".stripMargin)),

    // REAL image-header decode over REAL image bytes: the staging step
    // encodes 32 deterministic BufferedImages as actual PNG and JPEG
    // files (javax.imageio — pure JVM, offline), binaryFile reads them
    // back, and MultimodalOps.imageMeta parses width/height/bit depth/
    // channels from the PNG IHDR / JPEG SOF headers via the per-partition
    // codec seam. Fully ORACLED the strong way: DuckDB re-parses the SAME
    // staged bytes with blob arithmetic — fixed IHDR offsets for PNG, a
    // recursive-CTE marker walk to the first SOF for JPEG — so a parser
    // bug on either side mismatches; nothing is compared to the staging
    // formula. Staged-path literal: same sf0.01 contract as
    // scan_binaryfile above.
    // BINARY embedding seam (EmbedOps.embedBinaryWith) — the media
    // half of the multimodal → embedding → ANN chain: deterministic
    // byte payloads are staged as files, batch-embedded through the
    // per-partition BinaryEmbedder lifecycle into byte-histogram
    // vectors, and every vector COMPONENT is hash-compared against
    // DuckDB's independent rebuild from hex(read_blob) — including the
    // zero components, which the grid join makes explicit (a vector
    // missing a dimension cannot pass).
    "sim_embed_binary_hist" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "embed_bin") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          (0 until 16).foreach { id =>
            val n = 48 + 11 * id
            val bytes = Array.tabulate(n)(j => ((id * 31 + j * 7 + (j * j) % 13) % 256).toByte)
            java.nio.file.Files.write(
              new java.io.File(base, f"blob_$id%03d.bin").toPath, bytes)
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.bin")
          .select(
            regexp_extract(col("path"), "blob_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        EmbedOps.embedBinaryWith(files, "bytes",
          () => new EmbedOps.ByteHistogramEmbedder(8))
          .select(col("media_id"),
            posexplode(col("embedding")).as(Seq("component", "value")))
          .select(col("media_id"), col("component").cast(LongType),
            col("value").cast(LongType).as("count"))
          .orderBy(col("media_id"), col("component"))
      },
      Some("""WITH f AS (
             |  SELECT regexp_extract(filename, 'blob_(\d+)', 1)::BIGINT AS media_id,
             |    hex(content) AS h
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/embed_bin/blob_*.bin')),
             |bytes AS (
             |  SELECT media_id,
             |    unnest(list_transform(range(0, len(h) // 2),
             |      i -> ('0x' || substr(h, CAST(i * 2 + 1 AS INT), 2))::INT)) AS v
             |  FROM f),
             |counts AS (
             |  SELECT media_id, v % 8 AS component, count(*) AS cnt
             |  FROM bytes GROUP BY 1, 2),
             |grid AS (
             |  SELECT f.media_id, g.component
             |  FROM f CROSS JOIN (SELECT unnest(range(0, 8)) AS component) g)
             |SELECT grid.media_id, CAST(grid.component AS BIGINT) AS component,
             |  CAST(coalesce(c.cnt, 0) AS BIGINT) AS count
             |FROM grid LEFT JOIN counts c
             |  ON c.media_id = grid.media_id AND c.component = grid.component
             |ORDER BY grid.media_id, grid.component""".stripMargin)),

    "multimodal_image_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "images") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          (0 until 32).foreach { id =>
            val w = 16 + (id % 64)
            val h = 16 + ((id * 7) % 64)
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                img.setRGB(x, y, (x * 31 + y * 17 + id) & 0xffffff); y += 1
              }
              x += 1
            }
            javax.imageio.ImageIO.write(img, "png",
              new java.io.File(base, f"img_$id%03d.png"))
            javax.imageio.ImageIO.write(img, "jpg",
              new java.io.File(base, f"img_$id%03d.jpg"))
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.{png,jpg}")
          .select(
            regexp_extract(col("path"), "img_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            regexp_extract(col("path"), "\\.([a-z]+)$", 1).as("ext"),
            col("content").as("bytes"))
        MultimodalOps.imageMeta(files, "bytes")
          .select(col("media_id"), col("ext"), col("format"),
            col("width"), col("height"), col("bit_depth"), col("n_channels"))
          .orderBy(col("media_id"), col("ext"))
      },
      Some("""WITH RECURSIVE f AS (
             |  SELECT regexp_extract(filename, 'img_(\d+)', 1)::BIGINT AS media_id,
             |    regexp_extract(filename, '\.([a-z]+)$', 1) AS ext,
             |    hex(content) AS h
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/images/img_*')),
             |png AS (
             |  SELECT media_id, ext, 'png' AS format,
             |    ('0x' || substr(h, 33, 8))::INTEGER AS width,
             |    ('0x' || substr(h, 41, 8))::INTEGER AS height,
             |    ('0x' || substr(h, 49, 2))::INTEGER AS bit_depth,
             |    CASE ('0x' || substr(h, 51, 2))::INTEGER
             |      WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 1
             |      WHEN 4 THEN 2 WHEN 6 THEN 4 END AS n_channels
             |  FROM f WHERE ext = 'png'),
             |walk(media_id, ext, h, pos, marker) AS (
             |  SELECT media_id, ext, h, 3, ('0x' || substr(h, 7, 2))::INTEGER
             |  FROM f WHERE ext = 'jpg'
             |  UNION ALL
             |  SELECT media_id, ext, h,
             |    pos + 2 + ('0x' || substr(h, (pos+1)*2+1, 4))::INTEGER,
             |    ('0x' || substr(h,
             |      (pos + 2 + ('0x' || substr(h, (pos+1)*2+1, 4))::INTEGER)*2+1,
             |      2))::INTEGER
             |  FROM walk
             |  WHERE NOT (marker BETWEEN 192 AND 207
             |             AND marker NOT IN (196, 200, 204))),
             |jpg AS (
             |  SELECT media_id, ext, 'jpeg' AS format,
             |    ('0x' || substr(h, (pos+6)*2+1, 4))::INTEGER AS width,
             |    ('0x' || substr(h, (pos+4)*2+1, 4))::INTEGER AS height,
             |    ('0x' || substr(h, (pos+3)*2+1, 2))::INTEGER AS bit_depth,
             |    ('0x' || substr(h, (pos+8)*2+1, 2))::INTEGER AS n_channels
             |  FROM walk
             |  WHERE marker BETWEEN 192 AND 207 AND marker NOT IN (196, 200, 204))
             |SELECT media_id, ext, format, width, height, bit_depth, n_channels
             |FROM (SELECT * FROM png UNION ALL SELECT * FROM jpg)
             |ORDER BY media_id, ext""".stripMargin)),

    // BMP header metadata (round 12): the third raster container —
    // fixed-offset LITTLE-endian fields (BITMAPFILEHEADER +
    // BITMAPINFOHEADER), the endianness mirror of PNG's IHDR walk.
    // Staged 24-bit BMPs via ImageIO; MultimodalOps.parseImageHeader
    // gained the BMP branch (INFO-family header-size whitelist, signed
    // top-down height normalized, palette depths mapped like PNG's
    // color types). DuckDB re-parses the SAME staged bytes with
    // reversed hex-pair arithmetic.
    "multimodal_bmp_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "images_bmp") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          (0 until 24).foreach { id =>
            val w = 12 + (id * 5) % 48
            val h = 12 + (id * 11) % 48
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                img.setRGB(x, y, (x * 13 + y * 29 + id) & 0xffffff); y += 1
              }
              x += 1
            }
            javax.imageio.ImageIO.write(img, "bmp",
              new java.io.File(base, f"img_$id%03d.bmp"))
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.bmp")
          .select(
            regexp_extract(col("path"), "img_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        MultimodalOps.imageMeta(files, "bytes")
          .select(col("media_id"), col("format"),
            col("width"), col("height"), col("bit_depth"), col("n_channels"))
          .orderBy(col("media_id"))
      },
      Some("""WITH f AS (
             |  SELECT regexp_extract(filename, 'img_(\d+)', 1)::BIGINT AS media_id,
             |    hex(content) AS h
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/images_bmp/img_*.bmp'))
             |SELECT media_id, 'bmp' AS format,
             |  ('0x' || substr(h, 43, 2) || substr(h, 41, 2)
             |    || substr(h, 39, 2) || substr(h, 37, 2))::INTEGER AS width,
             |  abs(('0x' || substr(h, 51, 2) || substr(h, 49, 2)
             |    || substr(h, 47, 2) || substr(h, 45, 2))::INTEGER) AS height,
             |  CASE ('0x' || substr(h, 59, 2) || substr(h, 57, 2))::INTEGER
             |    WHEN 32 THEN 8 WHEN 24 THEN 8 WHEN 16 THEN 16
             |    ELSE ('0x' || substr(h, 59, 2) || substr(h, 57, 2))::INTEGER
             |  END AS bit_depth,
             |  CASE ('0x' || substr(h, 59, 2) || substr(h, 57, 2))::INTEGER
             |    WHEN 32 THEN 4 WHEN 24 THEN 3 ELSE 1 END AS n_channels
             |FROM f ORDER BY media_id""".stripMargin)),

    // GIF logical-screen metadata (round 12): completes the raster
    // trio's third layout class — PNG is big-endian chunked, BMP is
    // little-endian fixed-offset, GIF is little-endian with a PACKED
    // BITFIELD (byte 10: depth from the GCT-size bits 0-2, 2^(N+1)
    // palette entries ⇒ N+1 index bits — not the color-resolution
    // bits 4-6, which encoders hardwire). Staged via ImageIO; DuckDB
    // re-parses the same bytes, extracting the bitfield with integer
    // mod arithmetic on the hex byte.
    "multimodal_gif_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "images_gif") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          (0 until 24).foreach { id =>
            val w = 8 + (id * 7) % 40
            val h = 8 + (id * 3) % 40
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                img.setRGB(x, y, (x * 19 + y * 7 + id) & 0xffffff); y += 1
              }
              x += 1
            }
            javax.imageio.ImageIO.write(img, "gif",
              new java.io.File(base, f"img_$id%03d.gif"))
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.gif")
          .select(
            regexp_extract(col("path"), "img_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        MultimodalOps.imageMeta(files, "bytes")
          .select(col("media_id"), col("format"),
            col("width"), col("height"), col("bit_depth"), col("n_channels"))
          .orderBy(col("media_id"))
      },
      Some("""WITH f AS (
             |  SELECT regexp_extract(filename, 'img_(\d+)', 1)::BIGINT AS media_id,
             |    hex(content) AS h
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/images_gif/img_*.gif'))
             |SELECT media_id, 'gif' AS format,
             |  ('0x' || substr(h, 15, 2) || substr(h, 13, 2))::INTEGER AS width,
             |  ('0x' || substr(h, 19, 2) || substr(h, 17, 2))::INTEGER AS height,
             |  ('0x' || substr(h, 21, 2))::INTEGER % 8 + 1 AS bit_depth,
             |  1 AS n_channels
             |FROM f ORDER BY media_id""".stripMargin)),

    // EXIF metadata (round 14): the first CONTAINER-EMBEDDED format —
    // a TIFF IFD inside a JPEG APP1 segment, where every offset is
    // relative to the EMBEDDED TIFF header, not the file (the classic
    // off-by-container bug; MultimodalOps.parseExif and the oracle
    // both walk it from scratch). Hand-built fixtures cover BOTH byte
    // orders, all 8 orientation values, an offset-dereferenced ASCII
    // Make tag, and two planted corrupt classes (truncated APP1; bad
    // TIFF magic) that must surface as NULL rows on BOTH engines —
    // never a wild read.
    "multimodal_exif_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "images_exif") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          (0 until 24).foreach { id =>
            val le = id % 2 == 0
            val orient = 1 + id % 8
            val make = f"cam_$id%03d\u0000".getBytes("US-ASCII") // 8 bytes
            val buf = java.nio.ByteBuffer.allocate(46).order(
              if (le) java.nio.ByteOrder.LITTLE_ENDIAN
              else java.nio.ByteOrder.BIG_ENDIAN)
            if (le) { buf.put('I'.toByte).put('I'.toByte) }
            else { buf.put('M'.toByte).put('M'.toByte) }
            buf.putShort(if (id % 11 == 5) 43 else 42) // planted bad magic
            buf.putInt(8) // IFD offset
            buf.putShort(2.toShort) // entry count
            // entry 0: Make (0x010F), ASCII(2), count 8, OFFSET 38
            buf.putShort(0x010f.toShort).putShort(2.toShort)
              .putInt(8).putInt(38)
            // entry 1: Orientation (0x0112), SHORT(3), count 1, inline
            // left-justified at entry+8 in BOTH byte orders
            buf.putShort(0x0112.toShort).putShort(3.toShort).putInt(1)
              .putShort(orient.toShort).putShort(0.toShort)
            buf.putInt(0) // next-IFD pointer
            buf.put(make)
            val tiff = buf.array()
            val out = new java.io.ByteArrayOutputStream()
            out.write(Array[Byte](0xff.toByte, 0xd8.toByte, // SOI
              0xff.toByte, 0xe1.toByte, 0, 54)) // APP1, len BE16 = 54
            out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
            out.write(tiff)
            out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
            val bytes = out.toByteArray
            val finalBytes = // planted truncation: cut mid-IFD
              if (id % 7 == 3) bytes.take(30) else bytes
            val fos = new java.io.FileOutputStream(
              new java.io.File(base, f"img_$id%03d.jpg"))
            try fos.write(finalBytes) finally fos.close()
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.jpg")
          .select(
            regexp_extract(col("path"), "img_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        MultimodalOps.exifMeta(files, "bytes")
          .select(col("media_id"), col("byte_order"), col("n_entries"),
            col("orientation"), col("make"))
          .orderBy(col("media_id"))
      },
      Some("""WITH f AS (
             |  SELECT regexp_extract(filename, 'img_(\d+)', 1)::BIGINT
             |      AS media_id,
             |    hex(content) AS h, content, octet_length(content) AS len
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/images_exif/img_*.jpg')),
             |-- APP1 walk: SOI, APP1 marker at 2, declared length, Exif header
             |v AS (
             |  SELECT media_id, h, content, len,
             |    CASE WHEN substr(h, 1, 4) = 'FFD8'
             |          AND substr(h, 5, 4) = 'FFE1'
             |          AND 4 + ('0x' || substr(h, 9, 4))::INTEGER <= len
             |          AND substr(h, 13, 12) = '457869660000'
             |      THEN 12 END AS t
             |  FROM f),
             |-- embedded TIFF: endianness + magic, IFD offset
             |e AS (
             |  SELECT media_id, h, content, len, t,
             |    CASE WHEN substr(h, 2*t + 1, 4) = '4949'
             |           AND substr(h, 2*t + 5, 4) = '2A00' THEN true
             |         WHEN substr(h, 2*t + 1, 4) = '4D4D'
             |           AND substr(h, 2*t + 5, 4) = '002A' THEN false
             |    END AS le
             |  FROM v WHERE t IS NOT NULL),
             |e2 AS (
             |  SELECT *,
             |    t + (CASE WHEN le
             |      THEN ('0x' || substr(h, 2*(t+7) + 1, 2)
             |           || substr(h, 2*(t+6) + 1, 2)
             |           || substr(h, 2*(t+5) + 1, 2)
             |           || substr(h, 2*(t+4) + 1, 2))::BIGINT
             |      ELSE ('0x' || substr(h, 2*(t+4) + 1, 8))::BIGINT
             |    END) AS ifd
             |  FROM e WHERE le IS NOT NULL),
             |e3 AS (
             |  SELECT *,
             |    CASE WHEN ifd + 2 <= len THEN
             |      CASE WHEN le
             |        THEN ('0x' || substr(h, 2*(ifd+1) + 1, 2)
             |             || substr(h, 2*ifd + 1, 2))::INTEGER
             |        ELSE ('0x' || substr(h, 2*ifd + 1, 4))::INTEGER
             |      END END AS n
             |  FROM e2),
             |ok AS (SELECT * FROM e3
             |       WHERE n IS NOT NULL AND ifd + 2 + 12*n <= len),
             |ent AS (
             |  SELECT media_id, h, content, len, t, le, n,
             |    ifd + 2 + 12 * i AS e
             |  FROM ok, unnest(range(0, n)) AS u(i)),
             |fields AS (
             |  SELECT *,
             |    CASE WHEN le
             |      THEN ('0x' || substr(h, 2*(e+1) + 1, 2)
             |           || substr(h, 2*e + 1, 2))::INTEGER
             |      ELSE ('0x' || substr(h, 2*e + 1, 4))::INTEGER END AS tag,
             |    CASE WHEN le
             |      THEN ('0x' || substr(h, 2*(e+7) + 1, 2)
             |           || substr(h, 2*(e+6) + 1, 2)
             |           || substr(h, 2*(e+5) + 1, 2)
             |           || substr(h, 2*(e+4) + 1, 2))::BIGINT
             |      ELSE ('0x' || substr(h, 2*(e+4) + 1, 8))::BIGINT END AS cnt,
             |    CASE WHEN le
             |      THEN ('0x' || substr(h, 2*(e+9) + 1, 2)
             |           || substr(h, 2*(e+8) + 1, 2))::INTEGER
             |      ELSE ('0x' || substr(h, 2*(e+8) + 1, 4))::INTEGER
             |    END AS short_inline,
             |    CASE WHEN le
             |      THEN ('0x' || substr(h, 2*(e+11) + 1, 2)
             |           || substr(h, 2*(e+10) + 1, 2)
             |           || substr(h, 2*(e+9) + 1, 2)
             |           || substr(h, 2*(e+8) + 1, 2))::BIGINT
             |      ELSE ('0x' || substr(h, 2*(e+8) + 1, 8))::BIGINT
             |    END AS off
             |  FROM ent),
             |agg AS (
             |  SELECT media_id,
             |    max(CASE WHEN le THEN 'II' ELSE 'MM' END) AS byte_order,
             |    CAST(max(n) AS INTEGER) AS n_entries,
             |    CAST(max(CASE WHEN tag = 274 THEN short_inline END)
             |      AS INTEGER) AS orientation,
             |    max(CASE WHEN tag = 271 AND t + off + cnt <= len THEN
             |      rtrim(decode(from_hex(substr(h, 2*(t + off) + 1,
             |        CAST(2 * cnt AS INTEGER)))), chr(0)) END) AS make
             |  FROM fields GROUP BY media_id)
             |SELECT f.media_id, a.byte_order, a.n_entries, a.orientation,
             |  a.make
             |FROM f LEFT JOIN agg a ON a.media_id = f.media_id
             |ORDER BY f.media_id""".stripMargin),
      allowBnlj = true),

    // TIFF metadata (round 13): the FOURTH raster layout class — PNG is
    // fixed big-endian chunks, BMP fixed little-endian offsets, GIF
    // packed bitfields; TIFF is an ENDIAN-SWITCHED, OFFSET-WALKED
    // directory: resolve the byte-order flag, follow the IFD pointer,
    // scan count × 12-byte tagged entries, and dereference
    // BitsPerSample when its count > 1 (RGB: the value field holds an
    // OFFSET to a SHORT array, not the value). Staged via the JDK TIFF
    // writer; DuckDB re-parses the same bytes — byte-order CASEs over
    // computed substr positions, the entry table from unnest(range(n)),
    // and the same offset dereference.
    "multimodal_tiff_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "images_tiff") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          (0 until 24).foreach { id =>
            val w = 8 + (id * 7) % 40
            val h = 8 + (id * 3) % 40
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                img.setRGB(x, y, (x * 19 + y * 7 + id) & 0xffffff); y += 1
              }
              x += 1
            }
            javax.imageio.ImageIO.write(img, "tiff",
              new java.io.File(base, f"img_$id%03d.tif"))
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.tif")
          .select(
            regexp_extract(col("path"), "img_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        MultimodalOps.imageMeta(files, "bytes")
          .select(col("media_id"), col("format"),
            col("width"), col("height"), col("bit_depth"), col("n_channels"))
          .orderBy(col("media_id"))
      },
      Some("""WITH f AS (
             |  SELECT regexp_extract(filename, 'img_(\d+)', 1)::BIGINT AS media_id,
             |    hex(content) AS h
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/images_tiff/img_*.tif')),
             |hdr AS (
             |  SELECT media_id, h, substr(h, 1, 4) = '4949' AS le,
             |    CASE WHEN substr(h, 1, 4) = '4949'
             |      THEN ('0x' || substr(h,15,2) || substr(h,13,2)
             |            || substr(h,11,2) || substr(h,9,2))::BIGINT
             |      ELSE ('0x' || substr(h,9,8))::BIGINT END AS ifd
             |  FROM f),
             |cnt AS (
             |  SELECT media_id, h, le, ifd,
             |    CASE WHEN le
             |      THEN ('0x' || substr(h, ifd*2+3, 2)
             |            || substr(h, ifd*2+1, 2))::INTEGER
             |      ELSE ('0x' || substr(h, ifd*2+1, 4))::INTEGER END AS n
             |  FROM hdr),
             |ent AS (
             |  SELECT media_id, h, le,
             |    (ifd + 2 + 12 * unnest(range(n))) * 2 + 1 AS b
             |  FROM cnt),
             |vals AS (
             |  SELECT media_id, h, le,
             |    CASE WHEN le THEN ('0x'||substr(h,b+2,2)||substr(h,b,2))::INTEGER
             |         ELSE ('0x'||substr(h,b,4))::INTEGER END AS tag,
             |    CASE WHEN le THEN ('0x'||substr(h,b+6,2)||substr(h,b+4,2))::INTEGER
             |         ELSE ('0x'||substr(h,b+4,4))::INTEGER END AS typ,
             |    CASE WHEN le THEN ('0x'||substr(h,b+14,2)||substr(h,b+12,2)
             |           ||substr(h,b+10,2)||substr(h,b+8,2))::BIGINT
             |         ELSE ('0x'||substr(h,b+8,8))::BIGINT END AS cnt,
             |    CASE WHEN le THEN ('0x'||substr(h,b+18,2)||substr(h,b+16,2))::INTEGER
             |         ELSE ('0x'||substr(h,b+16,4))::INTEGER END AS sval,
             |    CASE WHEN le THEN ('0x'||substr(h,b+22,2)||substr(h,b+20,2)
             |           ||substr(h,b+18,2)||substr(h,b+16,2))::BIGINT
             |         ELSE ('0x'||substr(h,b+16,8))::BIGINT END AS lval
             |  FROM ent),
             |fields AS (
             |  SELECT media_id, h, le,
             |    MAX(CASE WHEN tag = 256 THEN CASE WHEN typ = 3 THEN sval
             |      ELSE CAST(lval AS INTEGER) END END) AS width,
             |    MAX(CASE WHEN tag = 257 THEN CASE WHEN typ = 3 THEN sval
             |      ELSE CAST(lval AS INTEGER) END END) AS height,
             |    COALESCE(MAX(CASE WHEN tag = 277 THEN sval END), 1) AS spp,
             |    MAX(CASE WHEN tag = 258 AND cnt = 1 THEN sval END) AS bps_in,
             |    MAX(CASE WHEN tag = 258 AND cnt > 1 THEN lval END) AS bps_off
             |  FROM vals GROUP BY 1, 2, 3)
             |SELECT media_id, 'tiff' AS format, width, height,
             |  CAST(COALESCE(bps_in,
             |    CASE WHEN le
             |      THEN ('0x' || substr(h, bps_off*2+3, 2)
             |            || substr(h, bps_off*2+1, 2))::INTEGER
             |      ELSE ('0x' || substr(h, bps_off*2+1, 4))::INTEGER END,
             |    1) AS INTEGER) AS bit_depth,
             |  CAST(spp AS INTEGER) AS n_channels
             |FROM fields ORDER BY media_id""".stripMargin)),

    // WebP metadata (round 14, the FIFTH raster class): a RIFF
    // container whose first chunk fourcc selects one of THREE
    // incompatible dimension encodings — 'VP8 ' lossy (14-bit dims in
    // LE16s behind a start code, high bits are upscaling hints the
    // mask must strip — the staging SETS them so the mask is
    // hash-verified), 'VP8L' lossless (width−1/height−1/alpha packed
    // into ONE LE32), 'VP8X' extended (24-bit LE canvas dims + a flags
    // byte). Four planted corrupt files (bad VP8 start code, nonzero
    // VP8L version bits, unknown fourcc, TRUNCATED VP8X) must yield
    // NULL metadata on BOTH engines — the oracle restates every
    // validity condition including the minimum-length guards (its hex
    // is zero-padded so byte extraction can't crash on short files,
    // which means the length checks must be explicit), so a parser
    // that skips a check breaks the hash.
    "multimodal_webp_meta" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "webp") { p =>
          val base = new java.io.File(p)
          base.mkdirs()
          def le16(v: Int) = Array[Byte](
            (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
          def le24(v: Int) = Array[Byte]((v & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
          def le32(v: Int) = le16(v & 0xffff) ++ le16((v >>> 16) & 0xffff)
          def riff(fourcc: String, payload: Array[Byte]) =
            "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + payload.length) ++
              "WEBP".getBytes("US-ASCII") ++ fourcc.getBytes("US-ASCII") ++
              le32(payload.length) ++ payload
          (0 until 25).foreach { id =>
            val w = 16 + (id * 37) % 4000
            val h = 12 + (id * 53) % 3000
            val startCode = Array[Byte](0x9d.toByte, 0x01, 0x2a)
            val bytes = id match {
              case 24 => // TRUNCATED VP8X (valid header, canvas cut) → NULL
                riff("VP8X", Array[Byte](0, 0, 0, 0) ++
                  le24(w - 1) ++ le24(h - 1)).take(25)
              case 21 => // bad VP8 start code → NULL
                riff("VP8 ", Array[Byte](0, 0, 0, 0x77, 0x01, 0x2a) ++
                  le16(w) ++ le16(h))
              case 22 => // nonzero VP8L version bits → NULL
                riff("VP8L", Array[Byte](0x2f) ++
                  le32((w - 1) | ((h - 1) << 14) | (1 << 29)))
              case 23 => // unknown first chunk → NULL
                riff("ALPH", Array[Byte](1, 2, 3, 4))
              case _ => (id % 3) match {
                case 0 => // lossy; set the scale hint bits on odd ids
                  val sc = if ((id & 1) == 1) 0x4000 else 0
                  riff("VP8 ", Array[Byte](0, 0, 0) ++ startCode ++
                    le16(w | sc) ++ le16(h | sc))
                case 1 => // lossless; alpha on ids % 2
                  val alpha = if ((id & 1) == 1) 1 << 28 else 0
                  riff("VP8L", Array[Byte](0x2f) ++
                    le32((w - 1) | ((h - 1) << 14) | alpha))
                case _ => // extended; alpha flag 0x10 on ids % 2
                  val flags = if ((id & 1) == 1) 0x10 else 0x00
                  riff("VP8X", Array[Byte](flags.toByte, 0, 0, 0) ++
                    le24(w - 1) ++ le24(h - 1))
              }
            }
            java.nio.file.Files.write(
              new java.io.File(base, f"webp_$id%03d.webp").toPath, bytes)
          }
        }
        val files = Readers.readBinaryFiles(s, dir, "*.webp")
          .select(
            regexp_extract(col("path"), "webp_(\\d+)\\.", 1)
              .cast(LongType).as("media_id"),
            col("content").as("bytes"))
        MultimodalOps.imageMeta(files, "bytes")
          .select(col("media_id"), col("format"), col("width"),
            col("height"), col("bit_depth"), col("n_channels"))
          .orderBy(col("media_id"))
      },
      Some("""WITH f AS (
             |  SELECT regexp_extract(filename, 'webp_(\d+)', 1)::BIGINT
             |      AS media_id,
             |    -- pad: a truncated payload must not crash the byte
             |    -- extraction on an empty substr; the REAL length
             |    -- gates the CASE arms below, mirroring Spark's
             |    -- b.length guards
             |    hex(content) || repeat('0', 40) AS h,
             |    octet_length(content) AS nb
             |  FROM read_blob(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/webp/webp_*.webp')),
             |b AS (
             |  SELECT media_id, h, nb, substr(h, 25, 8) AS fourcc,
             |    ('0x' || substr(h, 41, 2))::BIGINT AS p0,
             |    ('0x' || substr(h, 43, 2))::BIGINT AS p1,
             |    ('0x' || substr(h, 45, 2))::BIGINT AS p2,
             |    ('0x' || substr(h, 47, 2))::BIGINT AS p3,
             |    ('0x' || substr(h, 49, 2))::BIGINT AS p4,
             |    ('0x' || substr(h, 51, 2))::BIGINT AS p5,
             |    ('0x' || substr(h, 53, 2))::BIGINT AS p6,
             |    ('0x' || substr(h, 55, 2))::BIGINT AS p7,
             |    ('0x' || substr(h, 57, 2))::BIGINT AS p8,
             |    ('0x' || substr(h, 59, 2))::BIGINT AS p9
             |  FROM f),
             |m AS (
             |  SELECT media_id,
             |    CASE
             |      WHEN fourcc = '56503820' AND nb >= 30
             |           AND p3 = 157 AND p4 = 1 AND p5 = 42
             |      THEN ROW('webp_vp8',
             |        CAST((p6 + 256*p7) % 16384 AS INTEGER),
             |        CAST((p8 + 256*p9) % 16384 AS INTEGER), 3)
             |      WHEN fourcc = '5650384C' AND nb >= 25 AND p0 = 47
             |           AND ((p1 + 256*p2 + 65536*p3 + 16777216*p4)
             |                // 536870912) % 8 = 0
             |      THEN ROW('webp_vp8l',
             |        CAST((p1 + 256*p2 + 65536*p3 + 16777216*p4) % 16384
             |          + 1 AS INTEGER),
             |        CAST(((p1 + 256*p2 + 65536*p3 + 16777216*p4) // 16384)
             |          % 16384 + 1 AS INTEGER),
             |        CAST(3 + ((p1 + 256*p2 + 65536*p3 + 16777216*p4)
             |          // 268435456) % 2 AS INTEGER))
             |      WHEN fourcc = '56503858' AND nb >= 30
             |      THEN ROW('webp_vp8x',
             |        CAST(p4 + 256*p5 + 65536*p6 + 1 AS INTEGER),
             |        CAST(p7 + 256*p8 + 65536*p9 + 1 AS INTEGER),
             |        CAST(3 + (p0 // 16) % 2 AS INTEGER))
             |    END AS meta
             |  FROM b)
             |SELECT media_id, meta[1] AS format,
             |  CAST(meta[2] AS INTEGER) AS width,
             |  CAST(meta[3] AS INTEGER) AS height,
             |  CAST(CASE WHEN meta IS NULL THEN NULL ELSE 8 END AS INTEGER)
             |    AS bit_depth,
             |  CAST(meta[4] AS INTEGER) AS n_channels
             |FROM m ORDER BY media_id""".stripMargin)),

    // OHLC time-series downsample: one groupBy over (key, hour bucket),
    // open/close pinned by min_by/max_by on the UNIQUE event_id (not the
    // timestamp — duplicate timestamps would make them nondeterministic),
    // mean through the decimal accumulator. DuckDB's arg_min/arg_max are
    // the exact oracle counterparts.
    "agg_resample_ohlc" -> QuerySpec(
      (s, d) => TimeSeriesOps.resampleOhlc(
        t(s, d, "events"), "user_id", "ts", "value", "event_id", "hour")
        .orderBy(col("user_id"), col("bucket")),
      Some("""SELECT user_id, date_trunc('hour', ts) AS bucket,
             |  arg_min(value, event_id) AS open,
             |  max(value) AS high, min(value) AS low,
             |  arg_max(value, event_id) AS close,
             |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             |    / CAST(count(value) AS DOUBLE) AS mean_val,
             |  count(value) AS n
             |FROM events GROUP BY 1, 2
             |ORDER BY user_id, bucket""".stripMargin)),

    // Modal value per group (most frequent event_type per user):
    // groupBy count → per-key rank with an explicit deterministic
    // tie-break (native MODE() leaves ties engine-defined, so the
    // count+row_number formulation is the only oracle-able one). The
    // rn=1 filter plans through the TopKPerKey bounded heap.
    // Market-basket association rules (BasketOps.associationRules):
    // pairwise support/confidence/lift over per-order part sets — the
    // co-partitioned self-join on the BASKET key bounds pairs by
    // Σk_b·(k_b−1)/2 (never |items|²), mega-baskets gated by
    // maxBasketSize. Exact-long counts; each measure ONE fixed IEEE
    // chain (lift via DECIMAL(37,0) products) ⇒ fully oracled.
    "agg_assoc_rules" -> QuerySpec(
      (s, d) => BasketOps.associationRules(
        t(s, d, "lineitem"), "l_orderkey", "l_partkey",
        minPairCount = 3L, maxBasketSize = 1000, topK = 100),
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
             |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             |sized AS (
             |  SELECT b, i, count(*) OVER (PARTITION BY b) AS k FROM items),
             |kept AS (SELECT b, i FROM sized WHERE k <= 1000),
             |n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM kept),
             |itemn AS (
             |  SELECT i, CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY 1),
             |pairs AS (
             |  SELECT l.i AS item_a, r.i AS item_b,
             |    CAST(count(*) AS BIGINT) AS pair_n
             |  FROM kept l JOIN kept r ON l.b = r.b AND l.i < r.i
             |  GROUP BY 1, 2 HAVING count(*) >= 3),
             |top AS (
             |  SELECT * FROM pairs ORDER BY pair_n DESC, item_a, item_b
             |  LIMIT 100)
             |SELECT t.item_a, t.item_b, t.pair_n, a.cnt AS n_a, b.cnt AS n_b,
             |  CAST(t.pair_n AS DOUBLE) / CAST(n.nb AS DOUBLE) AS support,
             |  CAST(t.pair_n AS DOUBLE) / CAST(a.cnt AS DOUBLE) AS conf_a_b,
             |  CAST(t.pair_n AS DOUBLE) / CAST(b.cnt AS DOUBLE) AS conf_b_a,
             |  CAST(CAST(t.pair_n AS DECIMAL(18,0)) * CAST(n.nb AS DECIMAL(18,0))
             |    AS DOUBLE)
             |   / CAST(CAST(a.cnt AS DECIMAL(18,0)) * CAST(b.cnt AS DECIMAL(18,0))
             |    AS DOUBLE) AS lift
             |FROM top t
             |JOIN itemn a ON a.i = t.item_a
             |JOIN itemn b ON b.i = t.item_b
             |CROSS JOIN n
             |ORDER BY pair_n DESC, item_a, item_b""".stripMargin),
      allowBnlj = true),

    // Item-item cosine neighbors (BasketOps.itemSimilarity) — the
    // "bought X, also bought Y" recommender tier beside
    // agg_assoc_rules' lift view: binary basket co-occurrence, cosine
    // = pair_n / √(n_i·n_j) with ONE sqrt over the EXACT integer
    // product (the kendallTau lesson — √a·√b costs a second rounding),
    // top-5 neighbors per item through the rank-window path with the
    // (cosine DESC, pair_n DESC, neighbor) tie order. Same
    // co-partitioned basket self-join + mega-basket gate as the rules
    // key — the pair space stays Σ k_b², never |items|².
    "agg_item_similarity" -> QuerySpec(
      (s, d) => BasketOps.itemSimilarity(
        t(s, d, "lineitem"), "l_orderkey", "l_partkey",
        minPairCount = 3L, maxBasketSize = 1000, k = 5),
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
             |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
             |sized AS (
             |  SELECT b, i, count(*) OVER (PARTITION BY b) AS k FROM items),
             |kept AS (SELECT b, i FROM sized WHERE k <= 1000),
             |itemn AS (
             |  SELECT i, CAST(count(*) AS BIGINT) AS cnt FROM kept GROUP BY 1),
             |pairs AS (
             |  SELECT l.i AS ia, r.i AS ib, CAST(count(*) AS BIGINT) AS pair_n
             |  FROM kept l JOIN kept r ON l.b = r.b AND l.i < r.i
             |  GROUP BY 1, 2 HAVING count(*) >= 3),
             |orient AS (
             |  SELECT ia AS item, ib AS neighbor, pair_n FROM pairs
             |  UNION ALL
             |  SELECT ib AS item, ia AS neighbor, pair_n FROM pairs),
             |scored AS (
             |  SELECT bo.item, bo.neighbor, bo.pair_n,
             |    a.cnt AS n_item, b.cnt AS n_neighbor,
             |    CAST(bo.pair_n AS DOUBLE) /
             |      sqrt(CAST(CAST(a.cnt AS DECIMAL(19,0))
             |        * CAST(b.cnt AS DECIMAL(19,0)) AS DOUBLE)) AS cosine
             |  FROM orient bo
             |  JOIN itemn a ON a.i = bo.item
             |  JOIN itemn b ON b.i = bo.neighbor),
             |ranked AS (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY item
             |    ORDER BY cosine DESC, pair_n DESC, neighbor) AS INTEGER)
             |    AS rank
             |  FROM scored)
             |SELECT item, rank, neighbor, pair_n, n_item, n_neighbor, cosine
             |FROM ranked WHERE rank <= 5
             |ORDER BY item, rank""".stripMargin),
      allowBnlj = true),

    // Exact lower weighted median (ProfileOps.weightedMedian): smallest
    // value whose cumulative DECIMAL(18,6) weight reaches half the
    // group total — the window runs over the (group, value) GRAIN, not
    // rows, and the half test is 2·cum ≥ tot (no division, no doubles)
    // ⇒ bit-deterministic and fully oracled.
    "agg_weighted_median" -> QuerySpec(
      (s, d) => ProfileOps.weightedMedian(
        t(s, d, "lineitem"), "l_returnflag", "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag")),
      Some("""WITH grain AS (
             |  SELECT l_returnflag, l_quantity,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS w
             |  FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             |  GROUP BY 1, 2),
             |c AS (
             |  SELECT l_returnflag, l_quantity, w,
             |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
             |  FROM grain)
             |SELECT l_returnflag, min(l_quantity) AS w_median
             |FROM c WHERE cum * 2 >= tot
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Weighted-quantile vector (ProfileOps.weightedQuantiles): the
    // median machinery generalized to a basis-point grid — reach test
    // 10000·cum ≥ qbp·tot, all exact decimals, rows multiply by |qs|
    // only after the grain aggregation ⇒ fully oracled.
    "agg_weighted_quantiles" -> QuerySpec(
      (s, d) => ProfileOps.weightedQuantiles(
        t(s, d, "lineitem"), "l_returnflag", "l_quantity", "l_extendedprice",
        Seq(0.25, 0.5, 0.9))
        .orderBy(col("l_returnflag"), col("q")),
      Some("""WITH grain AS (
             |  SELECT l_returnflag, l_quantity,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS w
             |  FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             |  GROUP BY 1, 2),
             |c AS (
             |  SELECT l_returnflag, l_quantity, w,
             |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
             |  FROM grain),
             |qs AS (SELECT CAST(unnest([2500, 5000, 9000]) AS BIGINT) AS qbp),
             |hit AS (
             |  SELECT l_returnflag, qbp, min(l_quantity) AS value
             |  FROM c CROSS JOIN qs
             |  WHERE cum * 10000 >= qbp * tot
             |  GROUP BY 1, 2)
             |SELECT l_returnflag, CAST(qbp AS DOUBLE) / 10000.0 AS q, value
             |FROM hit ORDER BY l_returnflag, q""".stripMargin)),

    "agg_mode" -> QuerySpec(
      (s, d) => {
        val counts = t(s, d, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("n").desc, col("event_type"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("modal_type"), col("n"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT user_id, event_type, n,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY n DESC, event_type) AS rn
             |  FROM c)
             |SELECT user_id, event_type AS modal_type, n
             |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // Per-group z-score normalization, stddev DERIVED from exact decimal
    // sums (Σx, Σx²) so the double arithmetic is a fixed op chain —
    // bit-identical under any partial-agg order and in DuckDB (native
    // stddev_samp is Welford-streamed and NOT hash-stable cross-engine).
    "prep_zscore_group" -> QuerySpec(
      (s, d) => ProfileOps.zscorePerGroup(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value")),
        "user_id", "value")
        .orderBy(col("event_id")),
      Some("""WITH st AS (
             |  SELECT event_id, user_id, value,
             |    CAST(count(value) OVER w AS DOUBLE) AS n,
             |    CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id))
             |SELECT event_id, user_id, value,
             |  CASE WHEN n > 1 AND (s2 - s1 * s1 / n) / (n - 1.0) > 0
             |    THEN (value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1.0))
             |  END AS zscore
             |FROM st ORDER BY event_id""".stripMargin)),

    // Range-clustered layout twin of layout_file_stats: stage a
    // repartitionByRange+sortWithinPartitions write, read the per-file
    // skipping stats back. File names are writer-run-specific and the
    // range split points come from Spark's reservoir sampling ⇒
    // rows-only; the disjoint-leading-ranges property (the reason the
    // layout exists) is unit-asserted in LayoutSpec AND checked
    // in-query: bound_ok=1 asserts per-file min ≤ max, n_rows > 0, and
    // that each file's leading-column max ≤ the NEXT file's min (range
    // partitioning splits on the (shipdate, orderkey) tuple, so
    // adjacent files may SHARE a boundary date but never interleave —
    // the property point/range predicates prune on). The lag window is
    // partition-less over the 4 post-agg file rows, the sanctioned
    // tiny-frame shape (PlanSpec's vocab gate covers corpus-scale keys).
    "layout_range_cluster" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_range_files") { p =>
          Layout.writeRangeClustered(
            t(s, d, "lineitem")
              .select(col("l_shipdate"), col("l_orderkey"), col("l_quantity")),
            p, nFiles = 4, "l_shipdate", "l_orderkey")
        }
        val w = Window.orderBy(col("l_shipdate_min"), col("n_rows"))
        Layout.fileStats(s.read.parquet(dir), Seq("l_shipdate"))
          .drop("file_path", "file")
          .withColumn("__prev_max", lag(col("l_shipdate_max"), 1).over(w))
          .withColumn("bound_ok",
            (col("l_shipdate_min") <= col("l_shipdate_max") &&
              col("n_rows") > 0L &&
              (col("__prev_max").isNull ||
                col("__prev_max") <= col("l_shipdate_min")))
              .cast(IntegerType))
          .drop("__prev_max")
          .orderBy(col("l_shipdate_min"), col("n_rows"))
      },
      None),

    // HASH-EXACT twin of layout_range_cluster (the
    // layout_file_stats_checked pattern): per-file shipdate bounds and
    // row counts re-derived by DuckDB from the same staged files; the
    // disjoint-leading-ranges verdict (each file's max ≤ the next
    // file's min — the property range predicates prune on) rides as
    // bound_ok = 1. Staged-path oracle class (sf0.01).
    "layout_range_cluster_checked" -> QuerySpec(
      (s, d) => {
        val dir = staged(d, "layout_range_files") { p =>
          Layout.writeRangeClustered(
            t(s, d, "lineitem")
              .select(col("l_shipdate"), col("l_orderkey"), col("l_quantity")),
            p, nFiles = 4, "l_shipdate", "l_orderkey")
        }
        val w = Window.orderBy(col("l_shipdate_min"), col("n_rows"))
        Layout.fileStats(s.read.parquet(dir), Seq("l_shipdate"))
          .drop("file_path", "file")
          .withColumn("__prev_max", lag(col("l_shipdate_max"), 1).over(w))
          .withColumn("bound_ok",
            (col("l_shipdate_min") <= col("l_shipdate_max") &&
              col("n_rows") > 0L &&
              (col("__prev_max").isNull ||
                col("__prev_max") <= col("l_shipdate_min")))
              .cast(IntegerType))
          .select(col("l_shipdate_min"), col("l_shipdate_max"),
            col("n_rows"), col("bound_ok"))
          .orderBy(col("l_shipdate_min"), col("n_rows"),
            col("l_shipdate_max"))
      },
      Some("""WITH fs AS (
             |  SELECT filename,
             |    min(l_shipdate) AS l_shipdate_min,
             |    max(l_shipdate) AS l_shipdate_max,
             |    count(*) AS n_rows
             |  FROM read_parquet(
             |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_range_files/*.parquet',
             |    filename=true)
             |  GROUP BY filename)
             |SELECT l_shipdate_min, l_shipdate_max, n_rows,
             |  CAST(1 AS INTEGER) AS bound_ok
             |FROM fs
             |ORDER BY l_shipdate_min, n_rows, l_shipdate_max""".stripMargin)),

    // Compression-codec comparison over the SAME rows (the storage
    // lever: at 100 TB the parquet codec choice is tens of TB and the
    // scan-throughput/CPU trade): stage one lineitem projection under
    // uncompressed/snappy/zstd/gzip, read back per-codec file counts
    // and byte totals via the binaryFile source (distributed footer/
    // length metadata — file CONTENT is never read), and row counts
    // via parquet count (footer stats). Byte totals are
    // writer/version-specific ⇒ rows-only, with the layout-keys
    // discipline: bound_ok=1 asserts every codec preserved the row
    // count AND every real codec beats uncompressed bytes. The tiny
    // 4-row frame carries the cross-codec window comparisons.
    "layout_codec_stats" -> QuerySpec(
      (s, d) => {
        val codecs = Seq("uncompressed", "snappy", "zstd", "gzip")
        val perCodec = codecs.map { c =>
          val dir = staged(d, s"layout_codec_$c") { p =>
            t(s, d, "lineitem")
              .select(col("l_orderkey"), col("l_partkey"),
                col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
              .write.option("compression", c).mode("overwrite").parquet(p)
          }
          val files = s.read.format("binaryFile").load(dir + "/*.parquet")
            .agg(count(lit(1)).as("n_files"), sum(col("length")).as("bytes"))
            .select(lit(c).as("codec"), col("n_files"), col("bytes"))
          val rows = s.read.parquet(dir).agg(count(lit(1)).as("n_rows"))
            .select(lit(c).as("codec"), col("n_rows"))
          files.join(rows, Seq("codec"))
        }.reduce(_ unionByName _)
        val wAll = Window.orderBy(col("codec"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        perCodec
          .withColumn("__base",
            max(when(col("codec") === "uncompressed", col("bytes"))).over(wAll))
          .withColumn("ratio", col("bytes").cast(DoubleType) / col("__base"))
          .withColumn("bound_ok",
            (col("n_rows") === max(col("n_rows")).over(wAll) &&
              col("n_rows") === min(col("n_rows")).over(wAll) &&
              col("n_files") > 0L &&
              (col("codec") === "uncompressed" ||
                col("bytes") < col("__base"))).cast(IntegerType))
          .drop("__base")
          .orderBy(col("codec"))
      },
      None,
      allowBnlj = true),

    // HASH-EXACT twin of layout_codec_stats: the "writer-specific"
    // byte totals are still totals over the SAME staged bytes both
    // engines can read — DuckDB's read_blob gives per-file
    // octet_length (n_files, bytes) and read_parquet the row count, so
    // the whole row is oracle-derivable, verdict included. Staged-path
    // oracle class (sf0.01).
    "layout_codec_stats_checked" -> QuerySpec(
      (s, d) => {
        val codecs = Seq("uncompressed", "snappy", "zstd", "gzip")
        val perCodec = codecs.map { c =>
          val dir = staged(d, s"layout_codec_$c") { p =>
            t(s, d, "lineitem")
              .select(col("l_orderkey"), col("l_partkey"),
                col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
              .write.option("compression", c).mode("overwrite").parquet(p)
          }
          val files = s.read.format("binaryFile").load(dir + "/*.parquet")
            .agg(count(lit(1)).as("n_files"), sum(col("length")).as("bytes"))
            .select(lit(c).as("codec"), col("n_files"), col("bytes"))
          val rows = s.read.parquet(dir).agg(count(lit(1)).as("n_rows"))
            .select(lit(c).as("codec"), col("n_rows"))
          files.join(rows, Seq("codec"))
        }.reduce(_ unionByName _)
        val wAll = Window.orderBy(col("codec"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        perCodec
          .withColumn("__base",
            max(when(col("codec") === "uncompressed", col("bytes"))).over(wAll))
          .withColumn("bound_ok",
            (col("n_rows") === max(col("n_rows")).over(wAll) &&
              col("n_rows") === min(col("n_rows")).over(wAll) &&
              col("n_files") > 0L &&
              (col("codec") === "uncompressed" ||
                col("bytes") < col("__base"))).cast(IntegerType))
          .select(col("codec"), col("n_files"), col("bytes"),
            col("n_rows"), col("bound_ok"))
          .orderBy(col("codec"))
      },
      Some(Seq("uncompressed", "snappy", "zstd", "gzip").map { c =>
        s"""SELECT '$c' AS codec,
           |  (SELECT count(*) FROM read_blob(
           |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_codec_$c/*.parquet'))
           |    AS n_files,
           |  (SELECT CAST(sum(octet_length(content)) AS BIGINT) FROM read_blob(
           |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_codec_$c/*.parquet'))
           |    AS bytes,
           |  (SELECT count(*) FROM read_parquet(
           |    '/tmp/graft_stage/_root_testdata_sf0.01/layout_codec_$c/*.parquet'))
           |    AS n_rows,
           |  CAST(1 AS INTEGER) AS bound_ok""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY codec")),
      allowBnlj = true),

    // Small-file compaction planning (Layout.compactionPlan): stage the
    // documents table deliberately FRAGMENTED (24 small files — the
    // state a streaming/upsert writer leaves behind), then plan
    // contiguous target-size rewrite bins from a `_metadata`-only scan
    // (no data pages read). The OPTIMIZE planning step of a lakehouse
    // table; greedy offset binning overflows a bin by at most its one
    // straddling file, asserted per row (bin_bytes ≤ target +
    // max_file_bytes), with ≥1 file and internal consistency
    // (max_file_bytes ≤ bin_bytes) — file names/sizes are
    // writer-specific ⇒ rows-only with the checked bound.
    "layout_compaction_plan" -> QuerySpec(
      (s, d) => {
        // sf0.01's 24 staged shards are ~5 KB each — 16 KB targets give
        // a multi-bin plan (≈3 files/bin) at every SF
        val target = 16L * 1024
        val dir = staged(d, "layout_compaction") { p =>
          t(s, d, "documents").repartition(24)
            .write.mode("overwrite").parquet(p)
        }
        Layout.compactionPlan(s.read.parquet(dir), targetBytes = target)
          .withColumn("bound_ok",
            (col("n_files") >= 1L &&
              col("max_file_bytes") <= col("bin_bytes") &&
              col("bin_bytes") <= lit(target) + col("max_file_bytes"))
              .cast(IntegerType))
          .select(col("bin"), col("n_files"), col("bin_bytes"),
            col("max_file_bytes"), col("bound_ok"))
          .orderBy(col("bin"))
      },
      None),

    // Forward-fill gap imputation (LOCF): per-user series with every
    // 5th measurement deterministically nulled out on BOTH sides, so
    // the oracle checks real fills. value is carried through untouched
    // (no arithmetic) ⇒ doubles compare bit-for-bit.
    "profile_forward_fill" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value"))
              .as("v"))
        ProfileOps.forwardFill(ev, "user_id", "event_id", Seq("v"))
          .withColumnRenamed("v", "v_filled")
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id,
             |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
             |  FROM events)
             |SELECT event_id, user_id,
             |  last_value(v IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
             |FROM ev ORDER BY event_id""".stripMargin)),

    // Exact per-group sampling ("30 docs per language"): row_number over
    // (group, portable-LCG hash, id) with rn ≤ n — the count-contract
    // sampler (Bernoulli keys above only promise an expectation). The
    // LCG is DuckDB-bit-identical, so every drawn id is oracled. Plans
    // through the TopKPerKey bounded-heap strategy (SampleOpsSpec).
    "sample_per_group" -> QuerySpec(
      (s, d) => SampleOps.samplePerGroup(
        t(s, d, "documents"), "lang", "doc_id", n = 30, seed = 7L)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id")),
      Some("""WITH u AS (
             |  SELECT lang, doc_id,
             |    CAST(((doc_id + 7) * 1103515245 + 12345) % 2147483648 AS DOUBLE)
             |      / 2147483648.0 AS u
             |  FROM documents),
             |r AS (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rn
             |  FROM u)
             |SELECT lang, doc_id FROM r WHERE rn <= 30
             |ORDER BY lang, doc_id""".stripMargin)),

    // Declarative data-quality expectations: per-rule violation counts
    // and rates in ONE conditional-sum aggregate (k counters per task,
    // nothing shuffles but the k-row result). chars_consistent passes
    // everywhere by fixture construction — a zero-violation row proves
    // the counters don't over-count; the other two rules violate.
    "quality_expectations" -> QuerySpec(
      (s, d) => QualityOps.expectationStats(t(s, d, "documents"), Seq(
          "min_chars" -> (col("n_chars") >= 100L),
          "known_lang" -> col("lang").isin("en", "de", "fr"),
          "chars_consistent" -> (col("n_chars") === length(col("text")))))
        .orderBy(col("rule")),
      Some("""SELECT * FROM (
             |  SELECT 'min_chars' AS rule,
             |    CAST(SUM(CASE WHEN coalesce(n_chars >= 100, false)
             |      THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
             |    CAST(SUM(CASE WHEN coalesce(n_chars >= 100, false)
             |      THEN 0 ELSE 1 END) AS DOUBLE) / count(*) AS violation_rate
             |  FROM documents
             |  UNION ALL
             |  SELECT 'known_lang',
             |    CAST(SUM(CASE WHEN coalesce(lang IN ('en','de','fr'), false)
             |      THEN 0 ELSE 1 END) AS BIGINT),
             |    CAST(SUM(CASE WHEN coalesce(lang IN ('en','de','fr'), false)
             |      THEN 0 ELSE 1 END) AS DOUBLE) / count(*)
             |  FROM documents
             |  UNION ALL
             |  SELECT 'chars_consistent',
             |    CAST(SUM(CASE WHEN coalesce(n_chars = length(text), false)
             |      THEN 0 ELSE 1 END) AS BIGINT),
             |    CAST(SUM(CASE WHEN coalesce(n_chars = length(text), false)
             |      THEN 0 ELSE 1 END) AS DOUBLE) / count(*)
             |  FROM documents
             |) ORDER BY rule""".stripMargin)),

    // Approximate percentile (GK sketch) — mergeable partial aggregation,
    // the at-scale twin of fn_percentile's exact sort. Approx by
    // construction ⇒ rows-only; error bound unit-tested vs the exact
    // percentile (SampleOpsSpec).
    // Projected to scalar p50/p95 (not the raw array) so the driver's
    // comparator can sort and record the rows-only tier.
    "agg_approx_percentile" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
          .as("approx_pcts"))
        .select(col("l_returnflag"),
          element_at(col("approx_pcts"), 1).as("p50"),
          element_at(col("approx_pcts"), 2).as("p95"))
        .orderBy(col("l_returnflag")),
      None),

    // ----------------------------------------------------------- multimodal
    // Binary media columns + typed metadata; payload is a deterministic
    // fake (codec stubbed — no media libs in this container), the Spark
    // plumbing (binary concat, struct meta, octet_length) is real.
    "multimodal_meta" -> QuerySpec(
      (s, d) => {
        val media = MultimodalOps.attachFakeMedia(t(s, d, "documents"), "doc_id", "text")
        media.select(col("doc_id"),
          octet_length(col("bytes")).as("n_bytes"),
          col("meta.width").as("width"),
          col("meta.n_frames").as("n_frames"),
          md5(col("text")).as("checksum"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) + 5 AS INTEGER) AS n_bytes,
             |  CAST((doc_id % 64) * 16 + 16 AS INTEGER) AS width,
             |  CAST((doc_id % 8) + 1 AS INTEGER) AS n_frames,
             |  md5(text) AS checksum
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Pixel-transform stage: decode (codec seam, payload-seeded stub
    // field) → nearest-neighbor resize to 8×8. The stub's integer
    // arithmetic restates exactly in SQL, so the WHOLE chain is oracled:
    // DuckDB rebuilds the payload bytes from text ('G' + first-4 + utf8),
    // folds the seed over the hex dump, and re-evaluates the field at the
    // same 64 sampled coordinates. The Spark side only ever evaluates
    // those 64 coordinates too — never the full w×h raster.
    "multimodal_resize" -> QuerySpec(
      (s, d) => {
        val media = MultimodalOps.attachFakeMedia(
          t(s, d, "documents"), "doc_id", "text")
        MultimodalOps.resizeStub(MultimodalOps.pixelSeed(media), 8, 8)
          .select(col("doc_id"),
            posexplode(col("pixels")).as(Seq("pixel_idx", "pix")))
          .orderBy(col("doc_id"), col("pixel_idx"))
      },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    hex(encode('G')) || substr(hex(encode(text)),1,8)
             |      || hex(encode(text)) AS hx,
             |    CAST((doc_id % 64) * 16 + 16 AS BIGINT) AS w,
             |    CAST((doc_id % 32) * 16 + 16 AS BIGINT) AS h
             |  FROM documents),
             |sd AS (
             |  SELECT doc_id, w, h,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(0, length(hx)//2),
             |        i -> ('0x'||substr(hx, CAST(i*2+1 AS BIGINT), 2))::BIGINT)),
             |      (a,b) -> (a*31+b) % 2147483647) AS seed
             |  FROM s)
             |SELECT doc_id, CAST(i AS INTEGER) AS pixel_idx,
             |  CAST(((seed*1000003 + ((i//8)*h//8)*104729
             |    + ((i%8)*w//8)*31) % 2147483647) % 256 AS BIGINT) AS pix
             |FROM sd CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
             |ORDER BY doc_id, pixel_idx""".stripMargin)),

    // Frame sampling with per-frame features: k=4 evenly spaced frames
    // per clip (short clips yield fewer — the dedup is part of the
    // contract), each frame's 8×8 resized pixel sum as its feature.
    // DuckDB recomputes indices, dedup, ordinal, and the 64-pixel sum.
    "multimodal_frame_sample" -> QuerySpec(
      (s, d) => {
        val media = MultimodalOps.attachFakeMedia(
          t(s, d, "documents"), "doc_id", "text")
        MultimodalOps.frameSampleStub(MultimodalOps.pixelSeed(media), 4)
          .select(col("doc_id"), col("sample_pos"), col("frame_idx"),
            col("frame_pixsum"))
          .orderBy(col("doc_id"), col("sample_pos"))
      },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    hex(encode('G')) || substr(hex(encode(text)),1,8)
             |      || hex(encode(text)) AS hx,
             |    CAST((doc_id % 64) * 16 + 16 AS BIGINT) AS w,
             |    CAST((doc_id % 32) * 16 + 16 AS BIGINT) AS h,
             |    CAST((doc_id % 8) + 1 AS BIGINT) AS n
             |  FROM documents),
             |sd AS (
             |  SELECT doc_id, w, h, n,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(0, length(hx)//2),
             |        i -> ('0x'||substr(hx, CAST(i*2+1 AS BIGINT), 2))::BIGINT)),
             |      (a,b) -> (a*31+b) % 2147483647) AS seed
             |  FROM s),
             |fr AS (
             |  SELECT DISTINCT doc_id, seed, w, h,
             |    CAST(j AS BIGINT) * n // 4 AS frame_idx
             |  FROM sd CROSS JOIN (SELECT unnest(range(0, 4)) AS j)),
             |numbered AS (
             |  SELECT doc_id, seed, w, h, frame_idx,
             |    CAST(row_number() OVER (PARTITION BY doc_id
             |      ORDER BY frame_idx) - 1 AS INTEGER) AS sample_pos
             |  FROM fr)
             |SELECT doc_id, sample_pos, frame_idx,
             |  CAST(SUM(((seed*1000003 + frame_idx*7919 + ((i//8)*h//8)*104729
             |    + ((i%8)*w//8)*31) % 2147483647) % 256) AS BIGINT) AS frame_pixsum
             |FROM numbered CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
             |GROUP BY doc_id, sample_pos, frame_idx
             |ORDER BY doc_id, sample_pos""".stripMargin)),

    // Perceptual-hash dedup: dHash (9×8 grid, 64 gradient bits) over the
    // stub raster, grouped exactly — with the payload-seeded stub, media
    // with identical payload AND dimensions collide (real byte-identical
    // files share both), so keeper/copy counts mirror file-level dedup
    // while the HASH itself is the rescale-robust fingerprint a real
    // pipeline buckets on. DuckDB recomputes every bit from text and
    // re-groups.
    "dedup_image_dhash" -> QuerySpec(
      (s, d) => {
        val media = MultimodalOps.attachFakeMedia(
          t(s, d, "documents"), "doc_id", "text")
        MultimodalOps.resizeStub(MultimodalOps.pixelSeed(media), 9, 8)
          .withColumn("dhash", MultimodalOps.dhashBits(col("pixels")))
          .groupBy(col("dhash"))
          .agg(min(col("doc_id")).as("keeper"),
            count(lit(1)).as("n_copies"))
          .orderBy(col("keeper"))
      },
      Some("""WITH s AS (
             |  SELECT doc_id,
             |    hex(encode('G')) || substr(hex(encode(text)),1,8)
             |      || hex(encode(text)) AS hx,
             |    CAST((doc_id % 64) * 16 + 16 AS BIGINT) AS w,
             |    CAST((doc_id % 32) * 16 + 16 AS BIGINT) AS h
             |  FROM documents),
             |sd AS (
             |  SELECT doc_id, w, h,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(0, length(hx)//2),
             |        i -> ('0x'||substr(hx, CAST(i*2+1 AS BIGINT), 2))::BIGINT)),
             |      (a,b) -> (a*31+b) % 2147483647) AS seed
             |  FROM s),
             |bits AS (
             |  SELECT doc_id,
             |    string_agg(CASE WHEN
             |      ((seed*1000003 + ((b//8)*h//8)*104729
             |        + (((b%8)+1)*w//9)*31) % 2147483647) % 256 >
             |      ((seed*1000003 + ((b//8)*h//8)*104729
             |        + ((b%8)*w//9)*31) % 2147483647) % 256
             |      THEN '1' ELSE '0' END, '' ORDER BY b) AS dhash
             |  FROM sd CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
             |  GROUP BY doc_id)
             |SELECT dhash, MIN(doc_id) AS keeper,
             |  COUNT(*) AS n_copies
             |FROM bits GROUP BY dhash ORDER BY keeper""".stripMargin)),

    // Distribution window functions: ntile/percent_rank/cume_dist over a
    // unique total order (o_totalprice ties broken by o_orderkey) so the
    // assigned buckets are engine-independent.
    "win_distribution" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // Edit distance (dedup-adjacent string similarity) — identical DP
    // definition in both engines; exercised on the short `source` column.
    "fn_levenshtein" -> QuerySpec(
      (s, d) => {
        val a = t(s, d, "documents").filter(col("doc_id") < 20)
          .select(col("doc_id").as("id_a"), col("source").as("src_a"))
        val b = t(s, d, "documents").filter(col("doc_id") < 20)
          .select(col("doc_id").as("id_b"), col("source").as("src_b"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("src_a"), col("src_b")).as("dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(levenshtein(a.source, b.source) AS INTEGER) AS dist
             |FROM documents a, documents b
             |WHERE a.doc_id < 20 AND b.doc_id < 20 AND a.doc_id < b.doc_id
             |ORDER BY id_a, id_b""".stripMargin),
      allowBnlj = true),

    // ----------------------------------------------------- scalar functions
    "fn_from_json" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"), new StructType().add("k", IntegerType))
            .getField("k").as("k"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k2"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER) AS k,
             |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER) AS k2
             |FROM events ORDER BY event_id""".stripMargin)),

    // VARIANT semi-structured type (Spark 4): parse_json into the
    // binary variant encoding once, then typed variant_get path
    // extraction — the open-schema ingestion shape that replaces
    // per-field get_json_object re-parses (one parse, O(1) typed
    // reads; at 100 TB the N-field × re-parse difference is the whole
    // scan cost). The JSON is BUILT deterministically from orders on
    // both engines, so every extracted value is oracled; VARIANT
    // itself never reaches the output schema (typed BIGINT / VARCHAR /
    // DOUBLE presentation — the CatalogSchemaSpec rule), and DuckDB
    // reads the same paths with json_extract.
    "fn_variant_json" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), concat(
          lit("{\"k\":"), col("o_orderkey").cast(StringType),
          lit(",\"s\":\""), col("o_orderstatus"),
          lit("\",\"p\":"), col("o_totalprice").cast(StringType),
          lit(",\"tags\":[\""), col("o_orderpriority"), lit("\"]}")).as("_j"))
        .select(col("o_orderkey"), parse_json(col("_j")).as("_v"))
        .select(col("o_orderkey"),
          expr("variant_get(_v, '$.k', 'bigint')").as("k"),
          expr("variant_get(_v, '$.s', 'string')").as("s"),
          expr("variant_get(_v, '$.p', 'double')").as("p"),
          expr("variant_get(_v, '$.tags[0]', 'string')").as("tag0"))
        .orderBy(col("o_orderkey")),
      Some("""WITH src AS (
             |  SELECT o_orderkey,
             |    '{"k":' || CAST(o_orderkey AS VARCHAR) ||
             |    ',"s":"' || o_orderstatus ||
             |    '","p":' || CAST(o_totalprice AS VARCHAR) ||
             |    ',"tags":["' || o_orderpriority || '"]}' AS j
             |  FROM orders)
             |SELECT o_orderkey,
             |  CAST(json_extract(j, '$.k') AS BIGINT) AS k,
             |  json_extract_string(j, '$.s') AS s,
             |  CAST(json_extract(j, '$.p') AS DOUBLE) AS p,
             |  json_extract_string(j, '$.tags[0]') AS tag0
             |FROM src ORDER BY o_orderkey""".stripMargin)),

    // from_xml scalar parsing (the function companion to scan_xml's
    // source): deterministic per-row XML built from orders, parsed
    // with an explicit struct schema, fields surfaced typed. The
    // oracle re-extracts the same fields with regexes (DuckDB has no
    // XML parser — text extraction is exactly what it CAN restate).
    "fn_from_xml" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), concat(
          lit("<o><key>"), col("o_orderkey").cast(StringType),
          lit("</key><status>"), col("o_orderstatus"),
          lit("</status></o>")).as("_x"))
        .select(col("o_orderkey"),
          expr("from_xml(_x, 'key BIGINT, status STRING')").as("_p"))
        .select(col("o_orderkey"),
          col("_p.key").as("key"), col("_p.status").as("status"))
        .orderBy(col("o_orderkey")),
      Some("""WITH src AS (
             |  SELECT o_orderkey,
             |    '<o><key>' || CAST(o_orderkey AS VARCHAR) || '</key><status>'
             |      || o_orderstatus || '</status></o>' AS x
             |  FROM orders)
             |SELECT o_orderkey,
             |  CAST(regexp_extract(x, '<key>(-?\d+)</key>', 1) AS BIGINT) AS key,
             |  regexp_extract(x, '<status>([^<]*)</status>', 1) AS status
             |FROM src ORDER BY o_orderkey""".stripMargin)),

    // Collation-aware grouping (Spark 4 collations): group mixed-case
    // keys under UTF8_LCASE so equality itself is case-insensitive —
    // the engine-level form of the lower()-normalize idiom (no
    // expression wraps the grouping column, so statistics and
    // partition pruning on the original column survive). Mixed case is
    // synthesized deterministically (even keys lowered), the group
    // REPRESENTATIVE is an arbitrary member under case-insensitive
    // equality, so the output key is re-normalized with lower() and
    // cast back to a binary-collated string (collated types stay
    // internal — the presentation rule). DuckDB states the same query
    // as lower() grouping.
    "fn_collation_group" -> QuerySpec(
      (s, d) => t(s, d, "orders")
        .select(when(pmod(col("o_orderkey"), lit(2)) === 0,
            lower(col("o_orderpriority")))
          .otherwise(col("o_orderpriority")).as("pr"))
        .groupBy(expr("collate(pr, 'UTF8_LCASE')").as("_k"))
        .agg(count(lit(1)).as("n_orders"))
        .select(lower(col("_k")).cast(StringType).as("priority"),
          col("n_orders"))
        .orderBy(col("priority")),
      Some("""SELECT lower(pr) AS priority,
             |  CAST(count(*) AS BIGINT) AS n_orders
             |FROM (
             |  SELECT CASE WHEN o_orderkey % 2 = 0
             |    THEN lower(o_orderpriority) ELSE o_orderpriority END AS pr
             |  FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Array higher-order functions (transform/filter/exists/aggregate)
    // over integer-quantized arrays — engine-exact folds.
    "fn_array_hof" -> QuerySpec(
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(floor(col("l_quantity")).cast(LongType))).as("arr"))
        .select(col("l_orderkey"),
          size(filter(col("arr"), x => x > 25)).as("n_big"),
          aggregate(col("arr"), lit(0L), (a, x) => a + x).as("total_qty"),
          exists(col("arr"), x => x === 50L).as("has_50"),
          size(transform(col("arr"), x => x * 2)).as("n_doubled"))
        .orderBy(col("l_orderkey")),
      Some("""WITH a AS (
             |  SELECT l_orderkey,
             |    list_sort(list(CAST(FLOOR(l_quantity) AS BIGINT))) AS arr
             |  FROM lineitem GROUP BY l_orderkey)
             |SELECT l_orderkey,
             |  CAST(len(list_filter(arr, x -> x > 25)) AS INTEGER) AS n_big,
             |  CAST(list_sum(arr) AS BIGINT) AS total_qty,
             |  len(list_filter(arr, x -> x = 50)) > 0 AS has_50,
             |  CAST(len(list_transform(arr, x -> x * 2)) AS INTEGER) AS n_doubled
             |FROM a ORDER BY l_orderkey""".stripMargin)),

    // MapType surface: parse the JSON props column as a map, look up and
    // count keys (oracle recovers the same facts with regexes).
    "fn_map" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          size(map_keys(col("m"))).as("n_keys"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER) AS k_val,
             |  CAST(len(regexp_extract_all(props, '"[^"]+":')) AS INTEGER) AS n_keys
             |FROM events ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------ event-time windowing
    // Tumbling event-time window in batch form (SURVEY.md §2.10); the
    // streaming twin (readStream + watermark) is exercised in StreamingSpec.
    "stream_tumbling_agg" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"), dsum6(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("cnt"), col("sum_value"))
        .orderBy(col("ws")),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY ws""".stripMargin)),

    // SLIDING event-time windows (1h window, 30min slide): each event
    // lands in exactly windowSize/slide = 2 overlapping windows. The
    // oracle derives the same membership from time_bucket: the two
    // windows containing ts start at bucket(ts) and bucket(ts) − slide
    // (time_bucket's 2000-01-01 origin and Spark's epoch origin align
    // identically for divisors of an hour).
    "stream_sliding_agg" -> QuerySpec(
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"), dsum6(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("cnt"), col("sum_value"))
        .orderBy(col("ws")),
      Some("""WITH ev AS (
             |  SELECT CAST(time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
             |           AS TIMESTAMP) AS tb, value
             |  FROM events),
             |w AS (SELECT unnest([tb, tb - INTERVAL 30 MINUTE]) AS ws, value FROM ev)
             |SELECT ws, count(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM w GROUP BY 1 ORDER BY ws""".stripMargin)),

    // Native session_window (Spark's built-in gap-based session operator,
    // the streaming-capable form: state-store merging under watermarks).
    // Batch semantics oracled against the lag/running-sum construction.
    // Boundary semantics pinned by a unit test: an event at EXACTLY
    // prev_ts + gap still merges (closed boundary), so the oracle splits
    // on diff > 1800 only.
    "stream_session_window" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("ts_s", date_trunc("second", col("ts")))
        ev.groupBy(col("user_id"), session_window(col("ts_s"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_timestamp(col("sw.start")).as("sess_start"),
            col("n_events"))
          .orderBy(col("user_id"), col("sess_start"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, ep,
             |    CASE WHEN lag(ep) OVER w IS NULL THEN 1
             |         WHEN ep - lag(ep) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
             |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ep)),
             |sess AS (
             |  SELECT user_id, ep,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ep
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM flagged)
             |SELECT user_id, CAST(min(ep) AS BIGINT) AS sess_start, count(*) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, sess_start""".stripMargin)),

    // Streaming dedup, batch-form key (StreamOps.dedupWithinWatermark —
    // the dropDuplicatesWithinWatermark twin whose watermark-bounded
    // state eviction is what keeps a 100 TB/day dedup stream from the
    // classic unbounded-state OOM; the streaming path and its
    // state-eviction bound are exercised in StreamingSpec). Batch form
    // = withWatermark + dropDuplicates on the same code path; the
    // survivor ROW is engine-arbitrary when payloads differ, so the key
    // aggregates to the per-type distinct-user report (deterministic
    // by construction) with the raw count beside it — the dedup-rate
    // summary an ingest monitor actually reads.
    "stream_dedup_watermark" -> QuerySpec(
      (s, d) => {
        val survivors = graft.streaming.StreamOps.dedupWithinWatermark(
          t(s, d, "events").select(col("user_id"), col("event_type"), col("ts")),
          Seq("user_id", "event_type"), "ts", "1 hour")
        val raw = t(s, d, "events").groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_raw"))
        survivors.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_unique_users"))
          .join(raw, Seq("event_type"))
          .select(col("event_type"), col("n_unique_users"), col("n_raw"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_unique_users,
             |  CAST(count(*) AS BIGINT) AS n_raw
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Top behavior flows: the most common within-session event-type
    // paths (first 5 steps) — the product-analytics "user flows"
    // report. Sessionize (the stream_sessionize 30-min-gap window
    // form), collect each session's ordered types ONCE via sort_array
    // over (event_id, type) structs — bounded by session length, the
    // gap bound is the state cap — then slice/join to a path string
    // and count globally with a bounded-heap top-20. Exact counts,
    // (n DESC, path) total order ⇒ fully oracled.
    "agg_event_paths" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val ev = t(s, d, "events")
          .withColumn("ep", unix_timestamp(date_trunc("second", col("ts"))))
        val flagged = ev.withColumn("new_sess",
          when(lag(col("ep"), 1).over(w).isNull, 0)
            .when(col("ep") - lag(col("ep"), 1).over(w) > 1800, 1)
            .otherwise(0))
        val sess = flagged.withColumn("session_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        val paths = sess
          .groupBy(col("user_id"), col("session_id"))
          .agg(sort_array(collect_list(
            struct(col("event_id"), col("event_type")))).as("_evs"))
          .select(concat_ws(">",
            transform(slice(col("_evs"), 1, 5), e => e("event_type")))
            .as("path"))
        paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(20)
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, event_type, ep,
             |    CASE WHEN lag(ep, 1) OVER w IS NULL THEN 0
             |         WHEN ep - lag(ep, 1) OVER w > 1800 THEN 1
             |         ELSE 0 END AS new_sess
             |  FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
             |sess AS (
             |  SELECT user_id, event_id, event_type,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS session_id
             |  FROM flagged),
             |paths AS (
             |  SELECT array_to_string(
             |      list(event_type ORDER BY event_id)[1:5], '>') AS path
             |  FROM sess GROUP BY user_id, session_id)
             |SELECT path, count(*) AS n
             |FROM paths GROUP BY 1
             |ORDER BY n DESC, path LIMIT 20""".stripMargin)),

    // Kaplan-Meier survival curve (product-limit estimator, Kaplan &
    // Meier 1958): time-to-first-purchase in hours with administrative
    // right-censoring at a 100 h study horizon (no-purchase users
    // censor at min(horizon, last observed hour)). The curve lives on
    // the HOUR grain — ≤ horizon+1 rows by construction, so the
    // single-partition window and the running product are bounded; the
    // survival product folds the running factor list left-to-right
    // (1 − d/n each one IEEE division) — the fixed-chain discipline
    // for the one place a cumulative float product appears.
    "agg_survival_km" -> QuerySpec(
      (s, d) => {
        val ev = t(s, d, "events").filter(col("user_id").isNotNull)
          .withColumn("ep", unix_timestamp(date_trunc("second", col("ts"))))
        val f = ev.groupBy(col("user_id"))
          .agg(min(col("ep")).as("_t0"), max(col("ep")).as("_tl"))
        val p = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("ep")).as("_tp"))
        val o = f.join(p, Seq("user_id"), "left")
          // `div`, not `/`: Spark's / is fractional even on longs —
          // the oracle's // is integer division, so mirror it exactly
          .withColumn("_te", expr("(_tp - _t0) div 3600"))
          .withColumn("_tle", expr("(_tl - _t0) div 3600"))
          .withColumn("ev",
            (col("_tp").isNotNull && col("_te") <= 100).cast(IntegerType))
          .withColumn("t", when(col("ev") === 1, col("_te"))
            .otherwise(least(lit(100L), col("_tle"))).cast(LongType))
        val g = o.groupBy(col("t"))
          .agg(sum(col("ev")).cast(LongType).as("d"),
            sum(lit(1) - col("ev")).cast(LongType).as("c"))
        val n = o.agg(count(lit(1)).as("_n"))
        val w = Window.partitionBy(lit(0)).orderBy(col("t"))
        g.withColumn("_prior", coalesce(sum(col("d") + col("c")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .crossJoin(broadcast(n))
          .withColumn("n_risk", col("_n") - col("_prior"))
          .withColumn("_factor", lit(1.0) -
            col("d").cast(DoubleType) / col("n_risk").cast(DoubleType))
          .withColumn("survival",
            aggregate(collect_list(col("_factor")).over(
              w.rowsBetween(Window.unboundedPreceding, 0)),
              lit(1.0), (acc, x) => acc * x))
          .select(col("t"), col("n_risk"), col("d").as("n_events"),
            col("c").as("n_censored"), col("survival"))
          .orderBy(col("t"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
             |  FROM events WHERE user_id IS NOT NULL),
             |f AS (SELECT user_id, min(ep) AS t0, max(ep) AS tl
             |      FROM e GROUP BY 1),
             |p AS (SELECT user_id, min(ep) AS tp FROM e
             |      WHERE event_type = 'purchase' GROUP BY 1),
             |o AS (
             |  SELECT
             |    CASE WHEN tp IS NOT NULL AND (tp - t0) // 3600 <= 100
             |      THEN 1 ELSE 0 END AS ev,
             |    CAST(CASE WHEN tp IS NOT NULL AND (tp - t0) // 3600 <= 100
             |      THEN (tp - t0) // 3600
             |      ELSE LEAST(100, (tl - t0) // 3600) END AS BIGINT) AS t
             |  FROM f LEFT JOIN p USING (user_id)),
             |g AS (
             |  SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             |    CAST(SUM(1 - ev) AS BIGINT) AS c
             |  FROM o GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM o),
             |cum AS (
             |  SELECT t, d, c,
             |    CAST(nn - COALESCE(SUM(d + c) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS n_risk
             |  FROM g CROSS JOIN n),
             |fs AS (
             |  SELECT t, n_risk, d, c,
             |    list(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS fl
             |  FROM cum)
             |SELECT t, n_risk, d AS n_events, c AS n_censored,
             |  list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fl),
             |    (a, b) -> a * b) AS survival
             |FROM fs ORDER BY t""".stripMargin),
      allowBnlj = true),

    // First-order Markov transition matrix of event types: the
    // behavior model behind flow prediction/anomaly — P(next | current)
    // from exact pair counts over ONE actor-grain lead() window; the
    // probability is a single IEEE division of two exact longs.
    // Terminal events (no successor) land in the '__end' column as
    // data, so rows sum to 1 across the full matrix.
    "agg_markov_transitions" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val pairs = t(s, d, "events")
          .filter(col("user_id").isNotNull)
          .withColumn("to_type",
            coalesce(lead(col("event_type"), 1).over(w), lit("__end")))
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy(col("from_type"))
          .agg(sum(col("n")).as("_tot"))
        pairs.join(totals, Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"),
            (col("n").cast(DoubleType) / col("_tot").cast(DoubleType)).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH pairs AS (
             |  SELECT event_type AS from_type,
             |    COALESCE(lead(event_type, 1) OVER (
             |      PARTITION BY user_id ORDER BY event_id), '__end') AS to_type
             |  FROM events WHERE user_id IS NOT NULL),
             |c AS (
             |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM pairs GROUP BY 1, 2),
             |t AS (
             |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
             |  FROM c GROUP BY 1)
             |SELECT c.from_type, c.to_type, c.n,
             |  CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
             |FROM c JOIN t USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // Stream-stream time-range join, batch form (the StreamOps
    // .streamStreamJoin twin — StreamingSpec pins the micro-batch
    // equivalence on this exact shape): purchases joined to the views
    // that preceded them within 30 minutes per user — the
    // click-to-conversion lag table. An EQUI key (user) + a bounded
    // range residual ⇒ SortMergeJoin with a range filter, never a
    // cartesian; timestamps truncate to whole seconds (the sessionize
    // rule — events.ts is ns in parquet, µs in Spark), lag is exact
    // integer seconds.
    "stream_join_batch" -> QuerySpec(
      (s, d) => {
        val e = t(s, d, "events").filter(col("user_id").isNotNull)
          .withColumn("ep", unix_timestamp(date_trunc("second", col("ts"))))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ep").as("vts"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("r_user_id"),
            col("event_id").as("purchase_id"), col("ep").as("pts"))
        views.join(purchases,
            col("user_id") === col("r_user_id") &&
              col("pts") >= col("vts") && col("pts") <= col("vts") + 1800)
          .select(col("user_id"), col("view_id"), col("purchase_id"),
            (col("pts") - col("vts")).as("lag_seconds"))
          .orderBy(col("user_id"), col("view_id"), col("purchase_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
             |  FROM events WHERE user_id IS NOT NULL),
             |v AS (SELECT user_id, event_id AS view_id, ep AS vts
             |      FROM e WHERE event_type = 'view'),
             |p AS (SELECT user_id, event_id AS purchase_id, ep AS pts
             |      FROM e WHERE event_type = 'purchase')
             |SELECT v.user_id, view_id, purchase_id, pts - vts AS lag_seconds
             |FROM v JOIN p ON p.user_id = v.user_id
             |  AND p.pts >= v.vts AND p.pts <= v.vts + 1800
             |ORDER BY v.user_id, view_id, purchase_id""".stripMargin)),

    // Gap-based sessionization in SQL-window form (30-min gap): lag →
    // new-session flag → running sum = session id. Timestamps truncated to
    // whole seconds on both sides (events.ts is ns in parquet, µs in
    // Spark — sub-second precision would diverge). The stateful
    // flatMapGroupsWithState twin lives in StreamOps.sessionize and is
    // cross-checked against this in StreamingSpec.
    "stream_sessionize" -> QuerySpec(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val ev = t(s, d, "events")
          .withColumn("ep", unix_timestamp(date_trunc("second", col("ts"))))
        val flagged = ev.withColumn("new_sess",
          when(lag(col("ep"), 1).over(w).isNull, 0)
            .when(col("ep") - lag(col("ep"), 1).over(w) > 1800, 1)
            .otherwise(0))
        val sess = flagged.withColumn("session_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        sess.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("first_event"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id,
             |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ep
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, ep,
             |    CASE WHEN lag(ep, 1) OVER w IS NULL THEN 0
             |         WHEN ep - lag(ep, 1) OVER w > 1800 THEN 1
             |         ELSE 0 END AS new_sess
             |  FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
             |sess AS (
             |  SELECT user_id, event_id,
             |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(event_id) AS first_event
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map { case (k, v) => k -> v.fn }

  def oracleSql: Map[String, String] =
    specs.collect { case (k, QuerySpec(_, Some(sql), _)) => k -> sql }
}
