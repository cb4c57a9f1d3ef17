package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Sim family of the operator catalog (28 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogSim {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


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

    // Frozen-index + fresh-delta SERVING UNION (r16,
    // SimilarityOps.deltaUnionTopK) — the production shape for an ANN
    // index over a GROWING corpus: the IVF index is built at a
    // snapshot and immutable (here: the staged frozen quantizer +
    // cells over the 80% of vectors with cid % 5 ≠ 4), vectors that
    // arrived since (cid % 5 = 4) are brute-force-scanned, and the
    // served top-k is the re-rank of both sides' top-10s. The index
    // never rebuilds on ingest — the lever that keeps a 100 TB vector
    // store writable. Fully ORACLED: both sides run on the milli grid
    // against the staged centroid table, so DuckDB replays probe-join
    // scoring over the indexed 80%, full-scan scoring over the 20%
    // delta, each side's top-10 trim, and the merged re-rank —
    // bit-for-bit.
    "sim_ann_delta_union" -> QuerySpec(
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val model = quantizedIvf(s, d)
        stageAnnModels(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"),
            SimilarityOps.quantize(col("embedding")).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          SimilarityOps.quantize(col("embedding")).as("cvec"))
        val indexed = c.filter(pmod(col("cid"), lit(5L)) =!= 4L)
        val delta = c.filter(pmod(col("cid"), lit(5L)) === 4L)
        val idxTop = SimilarityOps.ivfTopKWithModel(
          q, SimilarityOps.ivfAssign(indexed, "cvec", model), model,
          k = 10, nProbe = 3)
        val deltaTop = SimilarityOps.bruteTopK(q, delta, k = 10)
        SimilarityOps.deltaUnionTopK(idxTop, deltaTop, k = 10)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH $annQuantVecCtes,
             |$annIvfProbeCtes
             |idx_pairs AS (
             |  SELECT p.qid, a.cid, unnest(q.qvec) AS qv, unnest(c.cvec) AS cv
             |  FROM probe p
             |  JOIN cell_assign a ON a.cell = p.cell AND a.cid % 5 <> 4
             |  JOIN q0 q ON q.qid = p.qid
             |  JOIN c0 c ON c.cid = a.cid),
             |idx_cos AS (
             |  SELECT qid, cid, CAST(SUM(qv*cv) AS DOUBLE)
             |    / (sqrt(CAST(SUM(qv*qv) AS DOUBLE)) * sqrt(CAST(SUM(cv*cv) AS DOUBLE))) AS cos
             |  FROM idx_pairs GROUP BY qid, cid),
             |idx_top AS (
             |  SELECT qid, cid, cos FROM (
             |    SELECT qid, cid, cos,
             |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
             |    FROM idx_cos) WHERE rn <= 10),
             |delta_pairs AS (
             |  SELECT q.qid, c.cid, unnest(q.qvec) AS qv, unnest(c.cvec) AS cv
             |  FROM q0 q CROSS JOIN c0 c WHERE c.cid % 5 = 4),
             |delta_cos AS (
             |  SELECT qid, cid, CAST(SUM(qv*cv) AS DOUBLE)
             |    / (sqrt(CAST(SUM(qv*qv) AS DOUBLE)) * sqrt(CAST(SUM(cv*cv) AS DOUBLE))) AS cos
             |  FROM delta_pairs GROUP BY qid, cid),
             |delta_top AS (
             |  SELECT qid, cid, cos FROM (
             |    SELECT qid, cid, cos,
             |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
             |    FROM delta_cos) WHERE rn <= 10),
             |merged AS (
             |  SELECT * FROM idx_top UNION ALL SELECT * FROM delta_top)
             |SELECT qid, rn, cid, cos FROM (
             |  SELECT qid, cid, cos,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS INTEGER) AS rn
             |  FROM merged)
             |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin),
      // the delta side IS bruteTopK: a deliberate broadcast crossJoin
      // of the tiny query set over the 20% delta — the bounded
      // compression-path full scan this pattern exists to pay
      allowBnlj = true),

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
        val pqModel = CatalogShared.pqModel(s, d)
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
        // r17 (guide §1.2): bm25Fit + bm25Postings each tokenized and
        // aggregated the whole corpus — one pass builds the postings
        // index (materialized: it feeds the model's two aggregations
        // AND the scoring join) and the model derives FROM it
        // (bm25FitFromPostings — bit-identical model frame). The corpus
        // is tokenized once instead of twice; at 100 TB this is the
        // staged-index production shape the postings scaladoc promises.
        val postings = SearchOps.bm25Postings(docs, "doc_id", "text")
          .localCheckpoint()
        val model = SearchOps.bm25FitFromPostings(postings, "doc_id")
        val queries = Seq(
          ("q1", "dup hash join"),
          ("q2", "merge sort"),
          ("q3", "dup zebra"),
          ("q4", "qqqzzz")).toDF("qid", "qtext")
        SearchOps.bm25TopKBatchOnPostings(postings, "doc_id", model,
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
        // r17 (guide §1.2): one tokenize+aggregate pass — the postings
        // index feeds both the model fit and the per-doc tf frame
        // (bit-identical output; see bm25FitFromPostings /
        // tfIdfTopTermsOnPostings), replacing two raw-text passes.
        val postings = SearchOps.bm25Postings(docs, "doc_id", "text")
          .localCheckpoint()
        val model = SearchOps.bm25FitFromPostings(postings, "doc_id")
        SearchOps.tfIdfTopTermsOnPostings(postings, "doc_id", model,
            kPerDoc = 3)
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
  )
}
