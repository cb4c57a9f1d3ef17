package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world"), (1L, "binary payloads ride along"), (7L, "frame me"))
    .toDF("doc_id", "text")

  test("attachFakeMedia builds binary payload + typed metadata struct") {
    val media = MultimodalOps.attachFakeMedia(docs, "doc_id", "text")
    val r = media.filter($"doc_id" === 0L).head()
    val bytes = r.getAs[Array[Byte]]("bytes")
    assert(bytes.length == 1 + 4 + "hello world".getBytes("UTF-8").length)
    assert(bytes(0) == 'G'.toByte)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[String]("mime") == "image/fake")
    assert(meta.getAs[Int]("width") == 16 && meta.getAs[Int]("n_frames") == 1)
  }

  test("decodeStub runs per-partition and appends deterministic features") {
    val media = MultimodalOps.attachFakeMedia(docs, "doc_id", "text")
    val decoded = MultimodalOps.decodeStub(media, "doc_id")
    val rows = decoded.select($"doc_id", $"decoded_bytes", $"checksum")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 7L))
    assert(rows.forall(_._2 > 5))
    // deterministic: second run identical
    val again = MultimodalOps.decodeStub(media, "doc_id")
      .select($"doc_id", $"decoded_bytes", $"checksum")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
  }

  test("decodeStub stays in one plan (Dataset.mapPartitions, no RDD round-trip)") {
    val media = MultimodalOps.attachFakeMedia(docs, "doc_id", "text")
    val decoded = MultimodalOps.decodeStub(media, "doc_id")
    val plan = decoded.queryExecution.executedPlan.toString
    // the old df.rdd.mapPartitions + createDataFrame form surfaces as a
    // "Scan ExistingRDD" leaf: the plan below the codec is opaque to
    // Catalyst. The Dataset form keeps the whole lineage in one plan.
    assert(!plan.contains("ExistingRDD"), plan)
    assert(plan.contains("MapPartitions"), plan)
  }

  test("decodeWith drives an injected codec: open-per-partition, close-on-completion") {
    val media = MultimodalOps.attachFakeMedia(docs, "doc_id", "text").repartition(2)
    MultimodalSpec.opens.set(0)
    MultimodalSpec.closes.set(0)
    MultimodalSpec.decodes.set(0)
    // factory form: a FRESH codec per partition, never a shared instance
    val decoded = MultimodalOps.decodeWith(media, "doc_id", () => new MultimodalSpec.CountingCodec)
    val viaTrait = decoded.select($"doc_id", $"decoded_bytes", $"checksum")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    // identical features to the stub path (same codec algebra through the seam)
    val viaStub = MultimodalOps.decodeStub(media, "doc_id")
      .select($"doc_id", $"decoded_bytes", $"checksum")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(viaTrait.toSeq == viaStub.toSeq)
    // lifecycle: one open and one close per non-empty partition, one
    // decode per row; close fires even though the codec never sees the
    // iterator end explicitly (task-completion listener)
    assert(MultimodalSpec.decodes.get() == 3)
    assert(MultimodalSpec.opens.get() >= 1 && MultimodalSpec.opens.get() <= 2)
    assert(MultimodalSpec.closes.get() == MultimodalSpec.opens.get(),
      s"opens=${MultimodalSpec.opens.get()} closes=${MultimodalSpec.closes.get()}")
    // plan shape unchanged by the injection seam
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && plan.contains("MapPartitions"), plan)
  }

  test("binaryFile source reads staged media files; header parsed by expressions") {
    val dir = java.nio.file.Files.createTempDirectory("media").toFile
    val payloads = Map("a.fake" -> "hello media", "b.fake" -> "frames!")
    payloads.foreach { case (name, text) =>
      val bytes = Array('G'.toByte) ++ text.getBytes("UTF-8").take(4) ++ text.getBytes("UTF-8")
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, bytes)
    }
    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.fake")
      .load(dir.getAbsolutePath)
    val parsed = media
      .select(element_at(split($"path", "/"), -1).as("name"),
        MultimodalOps.parseFakeHeader($"content").as("hdr"))
      .select($"name", $"hdr.magic", $"hdr.payload_bytes")
      .as[(String, String, Int)].collect()
      .map { case (k, m, n) => k -> ((m, n)) }.toMap
    assert(parsed == Map(
      "a.fake" -> (("G", "hello media".getBytes("UTF-8").length)),
      "b.fake" -> (("G", "frames!".getBytes("UTF-8").length))))
  }

  test("parseImageHeader decodes real PNG and JPEG bytes (ImageIO round-trip)") {
    def encode(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rgbPng = MultimodalOps.parseImageHeader(
      encode("png", 37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB))
    assert(rgbPng.contains(MultimodalOps.ImageMeta("png", 37, 23, 8, 3)))
    val grayPng = MultimodalOps.parseImageHeader(
      encode("png", 5, 9, java.awt.image.BufferedImage.TYPE_BYTE_GRAY))
    assert(grayPng.contains(MultimodalOps.ImageMeta("png", 5, 9, 8, 1)))
    val jpg = MultimodalOps.parseImageHeader(
      encode("jpg", 41, 17, java.awt.image.BufferedImage.TYPE_INT_RGB))
    assert(jpg.contains(MultimodalOps.ImageMeta("jpeg", 41, 17, 8, 3)))
    val grayJpg = MultimodalOps.parseImageHeader(
      encode("jpg", 8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY))
    assert(grayJpg.contains(MultimodalOps.ImageMeta("jpeg", 8, 8, 8, 1)))
  }

  test("parseImageHeader returns None on corrupt or non-image payloads") {
    assert(MultimodalOps.parseImageHeader("not an image".getBytes).isEmpty)
    assert(MultimodalOps.parseImageHeader(Array[Byte]()).isEmpty)
    assert(MultimodalOps.parseImageHeader(Array(0x89.toByte, 'P', 'N')).isEmpty)
    // JPEG SOI but truncated before any SOF
    assert(MultimodalOps.parseImageHeader(
      Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00).map(_.toByte)).isEmpty)
  }

  test("imageMeta appends parsed columns, NULLs for unparseable rows") {
    val img = new java.awt.image.BufferedImage(12, 34,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq((1L, bos.toByteArray), (2L, "junk".getBytes))
      .toDF("media_id", "bytes")
    val out = MultimodalOps.imageMeta(rows, "bytes")
      .select($"media_id", $"format", $"width", $"height")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) == ((Some("png"), Some(12), Some(34))))
    assert(out(2L) == ((None, None, None)))
    // same single-plan guarantee as the other codec paths
    val plan = MultimodalOps.imageMeta(rows, "bytes")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && plan.contains("MapPartitions"), plan)
  }

  test("parseWavHeader decodes real javax.sound WAVs and walks extra chunks") {
    def wav(rate: Int, ch: Int, n: Int): Array[Byte] = {
      val pcm = new Array[Byte](n * ch * 2)
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(MultimodalOps.parseWavHeader(wav(8000, 1, 400))
      .contains(MultimodalOps.AudioMeta("wav", 1, 1, 8000, 16, 400L)))
    assert(MultimodalOps.parseWavHeader(wav(44100, 2, 1234))
      .contains(MultimodalOps.AudioMeta("wav", 1, 2, 44100, 16, 1234L)))
    // chunk WALK: splice a LIST chunk between WAVE and fmt — fixed-offset
    // parsers break here, the walker must skip it
    val base = wav(16000, 1, 10)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOxy".getBytes("US-ASCII")
    val spliced = base.take(12) ++ list ++ base.drop(12)
    // patch the RIFF size (bytes 4-7, LE) for honesty; the parser doesn't use it
    assert(MultimodalOps.parseWavHeader(spliced)
      .contains(MultimodalOps.AudioMeta("wav", 1, 1, 16000, 16, 10L)))
  }

  test("parseWavHeader returns None on corrupt or non-audio payloads") {
    assert(MultimodalOps.parseWavHeader("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(MultimodalOps.parseWavHeader(Array[Byte]()).isEmpty)
    // RIFF/WAVE but no chunks at all
    assert(MultimodalOps.parseWavHeader(
      ("RIFF" + " " * 4 + "WAVE" + " " * 32).getBytes("ISO-8859-1")).isEmpty)
  }

  test("sampleFrames fans each media row out to its frame indices") {
    val media = MultimodalOps.attachFakeMedia(docs, "doc_id", "text")
    val frames = MultimodalOps.sampleFrames(media, everyK = 2)
      .select($"doc_id", $"frame_idx").as[(Long, Int)].collect().toSet
    // doc 7 → n_frames=8 → frames 0,2,4,6; doc 0 → 1 frame; doc 1 → 2 frames
    assert(frames == Set((0L, 0), (1L, 0), (7L, 0), (7L, 2), (7L, 4), (7L, 6)))
  }
}

object MultimodalSpec {
  // static so the executor-side (local-mode) codec instances and the
  // driver-side assertions see the same counters
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val decodes = new java.util.concurrent.atomic.AtomicInteger(0)

  class CountingCodec extends MultimodalOps.MediaCodec {
    override def open(): Unit = opens.incrementAndGet()
    override def close(): Unit = closes.incrementAndGet()
    override def decode(payload: Array[Byte]): MultimodalOps.DecodedMedia = {
      decodes.incrementAndGet()
      MultimodalOps.StubCodec.decode(payload)
    }
  }
}
