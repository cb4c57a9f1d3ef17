package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batched embedding-inference seam (north-star extension): the
  * in-pipeline contract that completes the multimodal → embedding → ANN
  * chain. The whole similarity stack ([[SimilarityOps]]) consumes a
  * precomputed `embeddings` table; a production corpus needs the
  * text→vector step INSIDE the pipeline, where the expensive part is a
  * model runtime (tokenizer + ONNX/JNI session, a GPU client, …) with
  * the same operational shape as [[MultimodalOps]]' media codecs:
  * per-task native state, amortized over BATCHES of inputs.
  *
  * The seam mirrors the proven `Codec[T]` lifecycle
  * (MultimodalOps.scala): one embedder INSTANCE per partition, built
  * inside the task (`open()`), torn down on task completion (`close()`
  * via the task-completion listener — fires on success, failure, and
  * cancellation alike), inputs fed in batches of `batchSize` so a real
  * model amortizes tokenization/transfer the way inference servers
  * expect. No embedder state ever crosses tasks.
  *
  * The in-repo implementation is [[HashingEmbedder]] — the feature-
  * hashing ("hashing trick", Weinberger et al. 2009) bag-of-words
  * projection: each token hashes to a bucket and a sign, the vector is
  * the signed bucket-count histogram. Deliberately chosen over a fake
  * because it is (a) a real classical baseline embedding, (b) integer-
  * valued — sums of ±1 are exact in FloatType, so downstream arithmetic
  * is engine-reproducible — and (c) restatable in ANSI SQL, which makes
  * the whole seam ORACLE-VERIFIABLE end to end (`sim_embed_hashing`):
  * the portable per-token hash is a 31-polynomial mod 2^31−1 over code
  * points, the same modular-fold discipline as
  * [[SampleOps.portableUniform]]. A production build swaps the factory
  * for a model-backed [[Embedder]]; nothing else changes.
  */
object EmbedOps {

  /** Per-partition batched-inference contract. Implementations hold
    * whatever native state they need between `open()` and `close()`;
    * [[embedWith]] guarantees the pair brackets every task and that
    * `encodeBatch` only ever sees non-null texts. `encodeBatch` must
    * return exactly one vector (of [[dim]] floats) per input, in input
    * order. */
  trait Embedder extends Serializable {
    def open(): Unit = ()
    def dim: Int
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]]
    def close(): Unit = ()
  }

  /** Default inference batch: big enough to amortize per-call overhead
    * of a real model runtime, small enough that a batch of long
    * documents stays well under task memory. */
  val defaultBatchSize = 64

  /** Append an embedding column computed through an injected
    * [[Embedder]]. NULL texts yield NULL embeddings without reaching
    * the embedder. Implemented as `Dataset.mapPartitions` WITH an
    * Encoder — not `df.rdd.mapPartitions` — so the operator stays
    * inside one logical plan: Catalyst keeps pushing filters/pruning
    * below the object boundary and codegen resumes above it (the
    * [[MultimodalOps.decodeWith]] rationale). Rows are buffered only
    * `batchSize` at a time — constant task memory regardless of
    * partition size. */
  def embedWith(df: DataFrame, textCol: String,
      embedderFactory: () => Embedder,
      batchSize: Int = defaultBatchSize,
      outCol: String = "embedding"): DataFrame =
    embedAnyWith(df, textCol, batchSize, outCol, () => {
      val e = embedderFactory()
      e.open()
      (ins => e.encodeBatch(ins.map(_.asInstanceOf[String])), () => e.close())
    })

  /** BINARY twin of [[Embedder]] — the contract a media model (CLIP
    * image tower, an audio encoder, …) fills: same per-partition
    * lifecycle, batches of raw payload bytes instead of texts. This is
    * the piece that makes the multimodal → embedding → ANN chain
    * literal: [[MultimodalOps]] parses/transforms media payloads,
    * this seam turns the payload into a vector, [[SimilarityOps]]
    * indexes it. */
  trait BinaryEmbedder extends Serializable {
    def open(): Unit = ()
    def dim: Int
    def encodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]]
    def close(): Unit = ()
  }

  /** [[embedWith]] over a BINARY column through a [[BinaryEmbedder]] —
    * identical lifecycle, batching, null stitching, and plan shape
    * (one `Dataset.mapPartitions` inside the logical plan). */
  def embedBinaryWith(df: DataFrame, bytesCol: String,
      embedderFactory: () => BinaryEmbedder,
      batchSize: Int = defaultBatchSize,
      outCol: String = "embedding"): DataFrame =
    embedAnyWith(df, bytesCol, batchSize, outCol, () => {
      val e = embedderFactory()
      e.open()
      (ins => e.encodeBatch(ins.map(_.asInstanceOf[Array[Byte]])),
        () => e.close())
    })

  /** Shared partition driver behind both seams: `stateFactory` runs
    * once per task and returns (batch encoder over the raw column
    * values, close hook); the driver owes it non-null inputs only,
    * registers the close hook on task completion (success, failure,
    * and cancellation alike), buffers `batchSize` rows at a time, and
    * stitches NULL inputs back as NULL vectors. */
  private def embedAnyWith(df: DataFrame, inCol: String, batchSize: Int,
      outCol: String,
      stateFactory: () => (Seq[Any] => Seq[Array[Float]], () => Unit)): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val inSchema = df.schema
    val outSchema = inSchema.add(outCol, ArrayType(FloatType), nullable = true)
    val inIdx = inSchema.fieldIndex(inCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val (encodeBatch, close) = stateFactory()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => close()))
      rows.grouped(batchSize).flatMap { batch =>
        // nulls are stitched back as null vectors; the encoder only
        // sees real inputs, so implementations need no null handling
        val ins = batch.collect {
          case r if !r.isNullAt(inIdx) => r.get(inIdx)
        }
        val vecs =
          if (ins.isEmpty) Iterator.empty
          else {
            val out = encodeBatch(ins)
            require(out.length == ins.length,
              s"Embedder returned ${out.length} vectors for ${ins.length} inputs")
            out.iterator
          }
        batch.map { r =>
          val v = if (r.isNullAt(inIdx)) null else vecs.next()
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(enc)
  }

  /** Modulus of the portable token hash: 2^31 − 1 (Mersenne prime).
    * Reducing mod M after every multiply-add keeps the accumulator in
    * [0, M) so the fold is expressible with plain 64-bit arithmetic in
    * any engine — no wrapping semantics required. */
  val hashModulus = 2147483647L

  /** Portable 31-polynomial hash of a token's Unicode CODE POINTS
    * (not UTF-16 units — matches `ord()` over per-character splits in
    * SQL engines), folded mod [[hashModulus]] at every step:
    * `h₀ = seed; hᵢ = (hᵢ₋₁·31 + cpᵢ) mod M`. */
  def tokenHash(token: String, seed: Long): Long = {
    var h = seed % hashModulus
    val it = token.codePoints().iterator()
    while (it.hasNext) h = (h * 31 + it.next()) % hashModulus
    h
  }

  /** Feature-hashing embedder (see object doc): token → bucket
    * `h mod dim`, sign from the next base-dim digit
    * (`(h div dim) mod 2`), vector = signed histogram over the
    * document's whitespace tokens (lowercased — [[TextOps.tokenize]]'s
    * convention). Deterministic in (dim, seed); stateless, so open and
    * close are the trait defaults. */
  /** Byte-histogram binary embedder — the classical content-signature
    * baseline for raw media payloads (and the binary analogue of the
    * bag-of-words histogram): vector(i) = count of payload bytes whose
    * unsigned value ≡ i (mod dim). Integer-valued (exact in FloatType)
    * and restatable from `hex(content)` in ANSI SQL, so the BINARY seam
    * is oracle-verifiable end to end exactly like the text seam.
    * Stateless; a production build swaps in a model-backed
    * [[BinaryEmbedder]] and nothing else changes. */
  class ByteHistogramEmbedder(val dim: Int) extends BinaryEmbedder {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    override def encodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map { bytes =>
        val v = new Array[Float](dim)
        bytes.foreach(b => v((b & 0xff) % dim) += 1f)
        v
      }
  }

  class HashingEmbedder(val dim: Int, val seed: Long = 7L) extends Embedder {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    override def encodeBatch(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        val v = new Array[Float](dim)
        // Locale.ROOT: the locale-independent simple lowercase mapping —
        // what SQL lower() applies; the default locale could diverge
        // (e.g. Turkish dotless ı) and break cross-engine determinism
        t.toLowerCase(java.util.Locale.ROOT).split("\\s+").foreach { tok =>
          if (tok.nonEmpty) {
            val h = tokenHash(tok, seed)
            val sign = if ((h / dim) % 2 == 0L) 1f else -1f
            v((h % dim).toInt) += sign
          }
        }
        v
      }
  }
}
