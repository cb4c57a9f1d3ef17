package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbedOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "low low low"),
    (1L, "lower newest"),
    (2L, null: String),
    (3L, "widest low"),
    (4L, "newest newest widest"))
    .toDF("doc_id", "text")

  test("tokenHash is pinned to the cross-engine anchor values") {
    // the same fold evaluated in DuckDB:
    //   list_reduce(list_prepend(7, [ord(c) for c in 'abc']),
    //               (a, c) -> (a*31 + c) % 2147483647) = 304891
    assert(EmbedOps.tokenHash("abc", 7L) == 304891L)
    // code points, not UTF-16 units: a non-BMP char is ONE fold step
    val g = new String(Character.toChars(0x1F600)) // 😀
    assert(EmbedOps.tokenHash(g, 7L) == (7L * 31 + 0x1F600) % 2147483647L)
  }

  test("embedWith drives the injected embedder: open/close per partition, batched calls") {
    EmbedOpsSpec.opens.set(0)
    EmbedOpsSpec.closes.set(0)
    EmbedOpsSpec.batches.set(0)
    EmbedOpsSpec.encoded.set(0)
    val out = EmbedOps.embedWith(docs.repartition(2), "text",
      () => new EmbedOpsSpec.CountingEmbedder, batchSize = 2)
      .select($"doc_id", $"embedding")
      .as[(Long, Option[Seq[Float]])].collect().sortBy(_._1)

    // null text → null embedding, embedder never sees it
    assert(out.find(_._1 == 2L).get._2.isEmpty)
    assert(EmbedOpsSpec.encoded.get() == 4, "only the 4 non-null texts reach the embedder")
    // batching: 4 texts over 2 partitions in batches of ≤2 → 2–4 calls,
    // strictly fewer than one call per row would be in the worst split
    val b = EmbedOpsSpec.batches.get()
    assert(b >= 2 && b <= 4, s"batches=$b")
    // lifecycle brackets every task that saw rows
    assert(EmbedOpsSpec.opens.get() >= 1 && EmbedOpsSpec.opens.get() <= 2)
    assert(EmbedOpsSpec.closes.get() == EmbedOpsSpec.opens.get(),
      s"opens=${EmbedOpsSpec.opens.get()} closes=${EmbedOpsSpec.closes.get()}")

    // same algebra through the seam as the stub invoked directly
    val direct = new EmbedOps.HashingEmbedder(4, 7L)
      .encodeBatch(Seq("low low low")).head.toSeq
    assert(out.find(_._1 == 0L).get._2.get == direct)
  }

  test("embedWith stays in one plan (Dataset.mapPartitions, no RDD round-trip)") {
    val out = EmbedOps.embedWith(docs, "text",
      () => new EmbedOps.HashingEmbedder(8))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan)
    assert(plan.contains("MapPartitions"), plan)
  }

  test("hashing embeddings: signed histogram semantics, deterministic in (dim, seed)") {
    val e = new EmbedOps.HashingEmbedder(8, 7L)
    val Seq(v1) = e.encodeBatch(Seq("low low low"))
    // 3 identical tokens land in one bucket with one sign: |component| = 3
    assert(v1.map(math.abs).sum == 3f)
    assert(v1.count(_ != 0f) == 1)
    // determinism across instances; sensitivity to seed
    val Seq(v2) = new EmbedOps.HashingEmbedder(8, 7L).encodeBatch(Seq("low low low"))
    assert(v1.toSeq == v2.toSeq)
    val Seq(v3) = new EmbedOps.HashingEmbedder(8, 8L).encodeBatch(Seq("low low low"))
    assert(v1.toSeq != v3.toSeq)
  }

  test("embedBinaryWith: byte-histogram vectors, null stitching, one-plan shape") {
    val rows = Seq(
      (1L, Array[Byte](0, 8, 16, 1)), // buckets (dim 8): 0→3, 1→1
      (2L, Array[Byte](-1)), // unsigned 255 → bucket 7
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes")
    val out = EmbedOps.embedBinaryWith(rows, "bytes",
      () => new EmbedOps.ByteHistogramEmbedder(8))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && plan.contains("MapPartitions"), plan)
    val got = out.select($"id", $"embedding")
      .as[(Long, Option[Seq[Float]])].collect().toMap
    assert(got(1L).get == Seq(3f, 1f, 0f, 0f, 0f, 0f, 0f, 0f))
    assert(got(2L).get == Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f),
      "byte values are UNSIGNED: -1 must land in bucket 255 mod 8 = 7")
    assert(got(3L).isEmpty, "null payloads stitch back as null vectors")
  }

  test("seam output feeds the similarity stack shapes unchanged") {
    val emb = EmbedOps.embedWith(docs.filter($"text".isNotNull), "text",
      () => new EmbedOps.HashingEmbedder(16, 7L))
    // int8 quantize consumes the embedding column as-is
    val q = emb.select($"doc_id",
      SimilarityOps.quantizeInt8($"embedding").as("q"))
      .select($"doc_id", $"q.scale", $"q.codes")
    assert(q.count() == 4)
    // cosine pipeline: integer-valued components → exact long dots
    val iv = emb.select($"doc_id",
      transform($"embedding", x => x.cast("long")).as("iv"))
    val self = iv.as("a").crossJoin(iv.as("b"))
      .select(SimilarityOps.dotLong(col("a.iv"), col("b.iv")).as("dot"))
    assert(self.filter($"dot" =!= 0L).count() > 0)
  }
}

object EmbedOpsSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val batches = new java.util.concurrent.atomic.AtomicInteger(0)
  val encoded = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Counting wrapper over the stub algebra: proves the plumbing calls
    * open/encodeBatch/close with the documented cardinalities (local
    * mode shares the JVM, so static counters observe the tasks). */
  class CountingEmbedder extends EmbedOps.Embedder {
    private val inner = new EmbedOps.HashingEmbedder(4, 7L)
    override def dim: Int = inner.dim
    override def open(): Unit = opens.incrementAndGet()
    override def close(): Unit = closes.incrementAndGet()
    override def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = {
      batches.incrementAndGet()
      encoded.addAndGet(texts.length)
      inner.encodeBatch(texts)
    }
  }
}
