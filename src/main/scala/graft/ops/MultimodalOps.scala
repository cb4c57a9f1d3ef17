package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (north-star extension).
  *
  * Media payloads are opaque `BinaryType` columns with a typed metadata
  * struct riding alongside. The Spark-side plumbing — schema, batch
  * iteration via mapPartitions over InternalRow-backed Rows, partition
  * sizing — is real and tested; the codec itself is STUBBED with a
  * deterministic fake header format (this container has no image/audio
  * libraries), clearly marked below. Swapping `decodeStub` for a real
  * JNI/FFmpeg decode keeps every signature and the whole plan unchanged.
  *
  * Fake header layout (bytes): [0]='G' [1]=kind [2]=width/16 [3]=height/16
  * [4]=nFrames, then payload bytes.
  */
object MultimodalOps {

  val mediaSchema: StructType = new StructType()
    .add("media_id", LongType)
    .add("bytes", BinaryType)
    .add("meta", new StructType()
      .add("mime", StringType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("n_frames", IntegerType))

  /** Deterministic fake media payload derived from an id + text column —
    * stands in for reading real image/audio bytes from object storage. */
  def attachFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val header = concat(
      lit(Array[Byte]('G'.toByte)),
      substring(encode(col(textCol), "UTF-8"), 1, 4))
    df.withColumn("bytes", concat(header, encode(col(textCol), "UTF-8")))
      .withColumn("meta", struct(
        lit("image/fake").as("mime"),
        (pmod(col(idCol), lit(64)) * 16 + 16).cast(IntegerType).as("width"),
        (pmod(col(idCol), lit(32)) * 16 + 16).cast(IntegerType).as("height"),
        (pmod(col(idCol), lit(8)) + 1).cast(IntegerType).as("n_frames")))
  }

  /** Decoded per-media features. A real decoder would surface richer
    * columns (dimensions, duration, frame tensors); the two here keep
    * the stub's plan shape and are what the tests pin. */
  final case class DecodedMedia(decodedBytes: Int, checksum: Long)

  /** The production seam: a partition-local media codec. `open()` is
    * called once per partition before the first decode — the place for a
    * native-library load or decoder-context allocation — and `close()`
    * when the task completes (success OR failure), via a task-completion
    * listener, so native resources cannot leak across tasks.
    *
    * [[decodeWith]] takes a FACTORY, not an instance, and builds one
    * codec per partition inside the task: a closure-shared instance
    * (worst case a Scala `object`, which deserializes to a JVM
    * singleton) would be shared by concurrent tasks on one executor,
    * and a finishing task's `close()` could tear down native state
    * another running task is still using. */
  trait MediaCodec {
    def open(): Unit = ()
    def decode(payload: Array[Byte]): DecodedMedia
    def close(): Unit = ()
  }

  /** STUB codec — the test/container implementation (no media libraries
    * in this environment): deterministic byte count + additive checksum.
    * A production build injects its own [[MediaCodec]] into
    * [[decodeWith]]; nothing else changes. */
  object StubCodec extends MediaCodec {
    override def decode(payload: Array[Byte]): DecodedMedia =
      DecodedMedia(payload.length,
        payload.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)))
  }

  /** Decode a media frame's payloads through an injected [[MediaCodec]].
    *
    * Implemented as `Dataset.mapPartitions` WITH an Encoder — not
    * `df.rdd.mapPartitions` — so the operator stays inside one logical
    * plan: Catalyst keeps pushing filters/pruning below the object
    * boundary and codegen resumes immediately above it, instead of the
    * RDD round-trip (full plan break + driver-side createDataFrame). */
  def decodeWith(df: DataFrame, idCol: String, codecFactory: () => MediaCodec): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add("decoded_bytes", IntegerType)
      .add("checksum", LongType)
    val bytesIdx = inSchema.fieldIndex("bytes")
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // one codec INSTANCE and lifecycle per partition: built inside the
      // task so concurrent tasks never share decoder state (see trait doc)
      val codec = codecFactory()
      codec.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
      rows.map { r =>
        val d = codec.decode(r.getAs[Array[Byte]](bytesIdx))
        Row.fromSeq(r.toSeq :+ d.decodedBytes :+ d.checksum)
      }
    }(enc)
  }

  /** Stub-codec decode (see [[StubCodec]]); kept as the named entry the
    * catalog and tests use so the container build stays decoder-free. */
  def decodeStub(df: DataFrame, idCol: String): DataFrame =
    decodeWith(df, idCol, () => StubCodec)

  /** Expression-based header parse for media files read through the
    * `binaryFile` source: magic byte + payload size recovered with plain
    * column functions (binary substring/decode/octet_length), no UDF and
    * no decode call — the cheap metadata pass that runs BEFORE deciding
    * which payloads are worth a real (expensive) decode. */
  def parseFakeHeader(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      decode(substring(bytes, 1, 1), "UTF-8").as("magic"),
      (octet_length(bytes) - 5).as("payload_bytes"))

  /** Frame sampling: every k-th frame index up to n_frames — the plan
    * shape (explode of a bounded sequence per row) matches real video
    * frame extraction, where the explode fans each media row out to
    * frame rows that downstream feature extractors process in parallel. */
  def sampleFrames(df: DataFrame, everyK: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK))))
}
