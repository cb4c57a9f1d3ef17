package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (north-star extension;
  * `embeddings.embedding` is ArrayType(FloatType), dim 64 — FIXTURES.md).
  *
  * Two tiers:
  *  - brute-force cosine top-k: the correctness baseline. One shuffle-free
  *    broadcast of the (small) query set against the candidate table —
  *    at 100 TB the candidate side streams through executors once.
  *  - LSH (random hyperplane) bucketing: the scale path. Signatures are
  *    computed per-row with codegen'd higher-order functions; candidates
  *    meet only within a bucket, turning O(Q×N) into O(Q×N/2^bits) per
  *    probe. Deterministic planes (seeded) keep results reproducible.
  */
object SimilarityOps {

  /** Cast a float array to double exactly (FloatType must be widened
    * before any arithmetic — SURVEY.md §7.4.1). */
  def asDouble(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Quantize to integer grid (×scale, floor). Integer dot products are
    * associativity-proof: the same result under any partitioning, any
    * engine — used by the oracled query keys. */
  def quantize(a: Column, scale: Int = 1000): Column =
    transform(a, x => floor(x.cast(DoubleType) * scale).cast(LongType))

  /** Sequential-fold dot product via higher-order functions (codegen'd,
    * no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0).cast(DoubleType), (acc, v) => acc + v)

  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k cosine neighbors of each query vector, brute force.
    * `queries` is expected to be small (it is broadcast); `candidates`
    * can be arbitrarily large — it is scanned once, never shuffled
    * (the per-qid top-k is a partial TakeOrdered before the final merge).
    */
  def bruteTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      qId: String = "qid", qVec: String = "qvec",
      cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries))
      .withColumn("cos", cosine(asDouble(col(qVec)), asDouble(col(cVec))))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId), col("rn"), col(cId), col("cos"))
  }

  /** Deterministic random hyperplanes: planes(b)(j) ~ U[-1, 1), seeded. */
  private[ops] def planes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Per-row LSH signature: one bit per hyperplane (sign of projection),
    * packed into a Long bucket id. Pure column expressions — codegen'd,
    * no shuffle, scales linearly. */
  def lshBucket(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    val ps = planes(nBits, dim, seed)
    val v = asDouble(vec)
    val bits = ps.map { p =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) >= 0, 1L).otherwise(0L)
    }
    bits.zipWithIndex.map { case (b, i) => b * (1L << i) }.reduce(_ + _)
  }

  /** ANN top-k: exact ranking within the query's LSH bucket. Recall is
    * tunable via nBits (fewer bits → bigger buckets → higher recall,
    * more compute); measured against bruteTopK in SimilaritySpec. */
  def annTopK(
      queries: DataFrame, candidates: DataFrame, k: Int, nBits: Int, dim: Int,
      qId: String = "qid", qVec: String = "qvec",
      cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucket(col(qVec), nBits, dim))
    val cb = candidates.withColumn("bucket", lshBucket(col(cVec), nBits, dim))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .withColumn("cos", cosine(asDouble(col(qVec)), asDouble(col(cVec))))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId), col("rn"), col(cId), col("cos"))
  }

  /** IVF-style ANN: partition candidates into `nCentroids` Voronoi cells
    * (seeded k-means over the candidate set), then rank exactly within
    * the `nProbe` cells nearest to each query. The inverted-file layout
    * is what scales: at 100 TB the assignment is a linear codegen'd pass,
    * cells are written as partition directories, and a query touches
    * nProbe/nCentroids of the data. Centroids are tiny (nCentroids ×
    * dim) and ride along as literal arrays — no driver loop per query.
    */
  def ivfTopK(
      queries: DataFrame, candidates: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int, seed: Long = 42L,
      qId: String = "qid", qVec: String = "qvec",
      cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val cand = candidates.withColumn("_fv", array_to_vector(asDouble(col(cVec))))
    // few iterations suffice: probing quality depends on the Voronoi
    // structure, not on converged centroids (in production the model is
    // trained once offline and reused across queries)
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("_fv").setPredictionCol("_cell").fit(cand)
    val assigned = model.transform(cand).drop("_fv")

    // per-query distances to every centroid (literal arrays), keep nProbe
    val centroids = model.clusterCenters.map(_.toArray)
    val cells = array(centroids.zipWithIndex.map { case (c, i) =>
      val dist = dot(asDouble(col(qVec)), array(c.map(lit): _*)) * -1 +
        lit(0.5) * lit(c.map(x => x * x).sum) // argmin ||q-c||² ≡ argmin (c·c)/2 - q·c
      struct(dist.as("d"), lit(i).as("cell"))
    }: _*)
    val probed = queries
      .withColumn("_probe", explode(slice(array_sort(cells), 1, nProbe)))
      .select(col(qId), col(qVec), col("_probe.cell").as("_cell"))

    val scored = assigned.join(broadcast(probed), Seq("_cell"))
      .withColumn("cos", cosine(asDouble(col(qVec)), asDouble(col(cVec))))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId), col("rn"), col(cId), col("cos"))
  }

  /** All candidate pairs with cosine above `threshold` (embedding-based
    * near-duplicate detection). Quantized integer arithmetic so the
    * result is engine-exact. For the full O(N²) this must be bounded by
    * LSH buckets first at scale; `withinBucket=true` does that. */
  def cosineDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, withinBucket: Boolean = false,
      nBits: Int = 8, dim: Int = 64): DataFrame = {
    val base = if (withinBucket)
      df.withColumn("bucket", lshBucket(col(vecCol), nBits, dim))
    else df.withColumn("bucket", lit(0))
    val a = base.select(col("bucket"), col(idCol).as("id_a"),
      quantize(col(vecCol)).as("va"))
    val b = base.select(col("bucket"), col(idCol).as("id_b"),
      quantize(col(vecCol)).as("vb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_q",
        dotLong(col("va"), col("vb")).cast(DoubleType) /
          (sqrt(dotLong(col("va"), col("va")).cast(DoubleType)) *
           sqrt(dotLong(col("vb"), col("vb")).cast(DoubleType))))
      .filter(col("cos_q") > threshold)
      .select(col("id_a"), col("id_b"), col("cos_q"))
  }
}
