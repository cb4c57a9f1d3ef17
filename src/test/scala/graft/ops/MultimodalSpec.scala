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

  // minimal ISO BMFF builders for the MP4 tests
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def bx(tag: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ tag.getBytes("US-ASCII") ++ payload
  private def ftyp(brand: String = "isom") =
    bx("ftyp", brand.getBytes("US-ASCII") ++ be32(0x200) ++ "isom".getBytes("US-ASCII"))
  private def mvhdV0(ts: Long, dur: Long) =
    bx("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(ts) ++ be32(dur) ++ Array.fill[Byte](80)(0))
  private def mvhdV1(ts: Long, dur: Long) =
    bx("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(ts) ++ be64(dur) ++ Array.fill[Byte](76)(0))
  private def trak = bx("trak", bx("tkhd", Array.fill[Byte](84)(0)))
  // video track: tkhd with nonzero 16.16 fixed-point dimensions
  private def videoTrak(w: Long, h: Long, version: Int = 0) =
    bx("trak",
      if (version == 0)
        bx("tkhd", Array[Byte](0, 0, 0, 0) ++ Array.fill[Byte](72)(0) ++
          be32(w << 16) ++ be32(h << 16))
      else
        bx("tkhd", Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](84)(0) ++
          be32(w << 16) ++ be32(h << 16)))

  test("parseVideoHeader walks ftyp/moov/mvhd for both mvhd versions") {
    // first trak audio-like (0×0), second carries the video dims — the
    // first NONZERO tkhd must win, not merely the first trak
    val v0 = ftyp("mp42") ++
      bx("moov", mvhdV0(600, 12345) ++ trak ++ videoTrak(640, 360)) ++
      bx("mdat", Array.fill[Byte](50)(3))
    assert(MultimodalOps.parseVideoHeader(v0)
      .contains(MultimodalOps.VideoMeta("mp4", "mp42", 600L, 12345L, 2, 640, 360)))
    // v1: 64-bit duration beyond the 32-bit range, moov AFTER mdat, a
    // free box in between — the walk must skip, not assume layout;
    // v1 tkhd exercises the widened-field offsets
    val bigDur = (1L << 33) + 7
    val v1 = ftyp("avc1") ++ bx("mdat", Array.fill[Byte](20)(1)) ++
      bx("free", Array.fill[Byte](6)(0)) ++
      bx("moov", bx("udta", Array.fill[Byte](5)(9)) ++ mvhdV1(90000, bigDur) ++
        videoTrak(1920, 1080, version = 1))
    assert(MultimodalOps.parseVideoHeader(v1)
      .contains(MultimodalOps.VideoMeta("mp4", "avc1", 90000L, bigDur, 1, 1920, 1080)))
  }

  test("parseVideoHeader handles largesize and to-EOF box forms") {
    // mdat with the size==1 64-bit largesize escape before moov
    val payload = Array.fill[Byte](30)(5)
    val largeMdat = be32(1L) ++ "mdat".getBytes("US-ASCII") ++
      be64(16L + payload.length) ++ payload
    val withLarge = ftyp() ++ largeMdat ++ bx("moov", mvhdV0(1000, 777) ++ trak)
    assert(MultimodalOps.parseVideoHeader(withLarge)
      .contains(MultimodalOps.VideoMeta("mp4", "isom", 1000L, 777L, 1, 0, 0)))
    // trailing size==0 box (runs to EOF) after moov must not break the walk
    val toEof = ftyp() ++ bx("moov", mvhdV0(24, 48) ++ trak) ++
      (be32(0L) ++ "mdat".getBytes("US-ASCII") ++ Array.fill[Byte](9)(2))
    assert(MultimodalOps.parseVideoHeader(toEof)
      .contains(MultimodalOps.VideoMeta("mp4", "isom", 24L, 48L, 1, 0, 0)))
  }

  test("parseVideoHeader returns None on corrupt or non-MP4 payloads") {
    assert(MultimodalOps.parseVideoHeader("not a video at all".getBytes).isEmpty)
    assert(MultimodalOps.parseVideoHeader(Array[Byte]()).isEmpty)
    // no ftyp first
    assert(MultimodalOps.parseVideoHeader(
      bx("moov", mvhdV0(600, 1)) ++ bx("mdat", Array[Byte](1))).isEmpty)
    // ftyp but no moov
    assert(MultimodalOps.parseVideoHeader(
      ftyp() ++ bx("mdat", Array.fill[Byte](8)(1))).isEmpty)
    // moov but no mvhd
    assert(MultimodalOps.parseVideoHeader(ftyp() ++ bx("moov", trak)).isEmpty)
    // malformed child size inside moov (size < 8)
    val badChild = ftyp() ++ bx("moov",
      be32(3L) ++ "mvhd".getBytes("US-ASCII") ++ Array.fill[Byte](20)(0))
    assert(MultimodalOps.parseVideoHeader(badChild).isEmpty)
    // unknown mvhd version
    val badVer = ftyp() ++ bx("moov",
      bx("mvhd", Array[Byte](9, 0, 0, 0) ++ Array.fill[Byte](96)(0)))
    assert(MultimodalOps.parseVideoHeader(badVer).isEmpty)
    // unknown tkhd version / truncated tkhd inside an otherwise-valid file
    val badTkhd = ftyp() ++ bx("moov", mvhdV0(600, 1) ++
      bx("trak", bx("tkhd", Array[Byte](9, 0, 0, 0) ++ Array.fill[Byte](80)(0))))
    assert(MultimodalOps.parseVideoHeader(badTkhd).isEmpty)
    val shortTkhd = ftyp() ++ bx("moov", mvhdV0(600, 1) ++
      bx("trak", bx("tkhd", Array[Byte](0, 0, 0, 0) ++ Array.fill[Byte](20)(0))))
    assert(MultimodalOps.parseVideoHeader(shortTkhd).isEmpty)
    // truncated mid-box
    val v0 = ftyp() ++ bx("moov", mvhdV0(600, 12345) ++ trak)
    assert(MultimodalOps.parseVideoHeader(v0.take(v0.length - 40)).isEmpty)
  }

  test("videoMeta appends parsed columns, NULLs for unparseable rows") {
    val good = ftyp("mp42") ++ bx("moov", mvhdV0(600, 3000) ++ videoTrak(426, 240))
    val rows = Seq((1L, good), (2L, "junk junk junk junk".getBytes))
      .toDF("media_id", "bytes")
    val out = MultimodalOps.videoMeta(rows, "bytes")
      .select($"media_id", $"format", $"brand", $"timescale", $"duration",
        $"n_tracks", $"width", $"height")
      .collect().map(r => r.getLong(0) -> (1 until 8).map(i => Option(r.get(i)))).toMap
    assert(out(1L) == Seq(Some("mp4"), Some("mp42"), Some(600L), Some(3000L),
      Some(1), Some(426), Some(240)))
    assert(out(2L) == Seq(None, None, None, None, None, None, None))
    val plan = MultimodalOps.videoMeta(rows, "bytes")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && plan.contains("MapPartitions"), plan)
  }

  test("JPEG walk stops at SOS/EOI: entropy-coded bytes cannot fake a SOF") {
    // SOI, APP0, then SOS with entropy data containing a 0xFFC0-looking
    // pair — the old walk would misread it as a SOF and return garbage
    val evil = Array(
      0xff, 0xd8,             // SOI
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0 (len 4)
      0xff, 0xda, 0x00, 0x04, 0x00, 0x00, // SOS (len 4): scan data follows
      0x12, 0x34, 0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x10, 0x00, 0x10, 0x03
    ).map(_.toByte)
    assert(MultimodalOps.parseImageHeader(evil).isEmpty)
    // EOI before any SOF likewise terminates cleanly
    val eoiFirst = Array(0xff, 0xd8, 0xff, 0xd9, 0xff, 0xc0, 0x00, 0x11, 0x08,
      0x00, 0x10, 0x00, 0x10, 0x03).map(_.toByte)
    assert(MultimodalOps.parseImageHeader(eoiFirst).isEmpty)
  }

  test("sampleFrames fans each media row out to its frame indices") {
    val media = MultimodalOps.attachFakeMedia(docs, "doc_id", "text")
    val frames = MultimodalOps.sampleFrames(media, everyK = 2)
      .select($"doc_id", $"frame_idx").as[(Long, Int)].collect().toSet
    // doc 7 → n_frames=8 → frames 0,2,4,6; doc 0 → 1 frame; doc 1 → 2 frames
    assert(frames == Set((0L, 0), (1L, 0), (7L, 0), (7L, 2), (7L, 4), (7L, 6)))
  }

  // ------------------------------------------------------ pixel transforms

  test("pixelSeed folds payload bytes through the codec seam; identical payloads collide") {
    val dup = Seq((0L, "same text"), (1L, "same text"), (2L, "other"))
      .toDF("doc_id", "text")
    val seeded = MultimodalOps.pixelSeed(
      MultimodalOps.attachFakeMedia(dup, "doc_id", "text"))
    val s = seeded.select($"doc_id", $"pix_seed").as[(Long, Long)].collect().toMap
    assert(s(0L) == s(1L) && s(0L) != s(2L))
    // equals the JVM fold over the actual payload bytes
    val txt = "same text".getBytes("UTF-8")
    val payload = Array('G'.toByte) ++ txt.take(4) ++ txt
    val expected = payload.foldLeft(0L)(
      (a, b) => (a * 31 + (b & 0xff)) % MultimodalOps.PixelMod)
    assert(s(0L) == expected)
    // codec seam, single plan
    val plan = seeded.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && plan.contains("MapPartitions"), plan)
  }

  test("resizeStub samples the stub field at nearest-neighbor coordinates only") {
    // doc_id=0 → w=16, h=16: srcY = y·16/8 = 2y, srcX = 2x
    val one = Seq((0L, "px")).toDF("doc_id", "text")
    val seeded = MultimodalOps.pixelSeed(
      MultimodalOps.attachFakeMedia(one, "doc_id", "text"))
    val seed = seeded.select($"pix_seed").as[Long].head()
    val pixels = MultimodalOps.resizeStub(seeded, 8, 8)
      .select($"pixels").as[Seq[Long]].head()
    assert(pixels.length == 64)
    def pix(f: Long, y: Long, x: Long) =
      ((seed * 1000003L + f * 7919L + y * 104729L + x * 31L)
        % MultimodalOps.PixelMod) % 256
    val expected = for (y <- 0L until 8L; x <- 0L until 8L) yield pix(0, 2 * y, 2 * x)
    assert(pixels == expected)
  }

  test("dhashBits encodes horizontal gradients, one bit per in-row neighbor pair") {
    // strictly increasing grid → every in-row right neighbor is larger
    val inc = Seq(Tuple1((0 until 72).map(_.toLong))).toDF("pixels")
    assert(inc.select(MultimodalOps.dhashBits($"pixels")).as[String].head()
      == "1" * 64)
    val flat = Seq(Tuple1(Seq.fill(72)(5L))).toDF("pixels")
    assert(flat.select(MultimodalOps.dhashBits($"pixels")).as[String].head()
      == "0" * 64)
    // a single planted gradient sets exactly one bit: grid (y=2, x=3→4)
    // is bit position y*8+x = 19
    val single = Seq(Tuple1((0 until 72).map(i => if (i == 2 * 9 + 4) 9L else 5L)))
      .toDF("pixels")
    val bits = single.select(MultimodalOps.dhashBits($"pixels")).as[String].head()
    // grid index 22 is larger than both neighbors: bit (2,3) fires on its
    // left edge; bit (2,4) sees p[23]=5 < 9 so stays 0
    assert(bits.count(_ == '1') == 1 && bits(19) == '1', bits)
  }

  test("frameSampleStub: distinct evenly spaced frames, short clips yield fewer, exact features") {
    // doc_id=2 → n_frames=3: ⌊j·3/4⌋ for j=0..3 → 0,0,1,2 → distinct 0,1,2
    val clip = Seq((2L, "three frames")).toDF("doc_id", "text")
    val seeded = MultimodalOps.pixelSeed(
      MultimodalOps.attachFakeMedia(clip, "doc_id", "text"))
    val rows = MultimodalOps.frameSampleStub(seeded, 4)
      .select($"sample_pos", $"frame_idx", $"frame_pixsum")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq((0, 0L), (1, 1L), (2, 2L)))
    // per-frame feature equals the manual resized-pixel sum (w=h=48)
    val seed = seeded.select($"pix_seed").as[Long].head()
    def pix(f: Long, y: Long, x: Long) =
      ((seed * 1000003L + f * 7919L + y * 104729L + x * 31L)
        % MultimodalOps.PixelMod) % 256
    val exp = (for (y <- 0L until 8L; x <- 0L until 8L)
      yield pix(1L, y * 48 / 8, x * 48 / 8)).sum
    assert(rows.find(_._2 == 1L).get._3 == exp)
  }

  test("pixel transform chain is shuffle-free: codec seam + column programs, no Exchange") {
    val seeded = MultimodalOps.pixelSeed(
      MultimodalOps.attachFakeMedia(docs, "doc_id", "text"))
    val hashed = MultimodalOps.resizeStub(seeded, 9, 8)
      .withColumn("dhash", MultimodalOps.dhashBits($"pixels"))
    val plan = hashed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("MapPartitions"), plan)
    // identical media rows (payload AND dimensions — real byte-identical
    // files share both; the stub's meta rides on doc_id) → identical hash
    val dup = Seq((10L, "twin doc"), (10L, "twin doc")).toDF("doc_id", "text")
    val hashes = MultimodalOps.resizeStub(
      MultimodalOps.pixelSeed(
        MultimodalOps.attachFakeMedia(dup, "doc_id", "text")), 9, 8)
      .select(MultimodalOps.dhashBits($"pixels")).as[String].collect()
    assert(hashes.distinct.length == 1)
  }

  test("parseImageHeader: BMP little-endian fields, top-down height, guards") {
    def bmp(w: Int, h: Int, bits: Int, hdrSize: Int = 40): Array[Byte] = {
      val b = new Array[Byte](54)
      b(0) = 'B'; b(1) = 'M'
      def le32(i: Int, v: Int): Unit = {
        b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
        b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
      }
      def le16(i: Int, v: Int): Unit = {
        b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
      }
      le32(14, hdrSize); le32(18, w); le32(22, h); le16(26, 1); le16(28, bits)
      b
    }
    assert(MultimodalOps.parseImageHeader(bmp(640, 480, 24))
      .contains(MultimodalOps.ImageMeta("bmp", 640, 480, 8, 3)))
    assert(MultimodalOps.parseImageHeader(bmp(32, 16, 32))
      .contains(MultimodalOps.ImageMeta("bmp", 32, 16, 8, 4)))
    // top-down bitmap: negative stored height, magnitude reported
    assert(MultimodalOps.parseImageHeader(bmp(10, -20, 8))
      .contains(MultimodalOps.ImageMeta("bmp", 10, 20, 8, 1)))
    // unknown info-header size and unknown bit count → None, not garbage
    assert(MultimodalOps.parseImageHeader(bmp(10, 10, 24, hdrSize = 12)).isEmpty)
    assert(MultimodalOps.parseImageHeader(bmp(10, 10, 13)).isEmpty)
    // a real ImageIO-written BMP parses with the same fields
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    assert(MultimodalOps.parseImageHeader(bos.toByteArray)
      .contains(MultimodalOps.ImageMeta("bmp", 17, 9, 8, 3)))
    // GIF: screen-descriptor little-endian dims + packed bitfield,
    // both magic versions. Depth must come from the GCT-size bits 0-2
    // (2^(N+1) palette entries), NOT the color-resolution bits 4-6 —
    // packed 0x72 has color-res 7 (the hardwired encoder value) but a
    // GCT of 2^3 = 8 entries ⇒ 3 index bits.
    Seq('7', '9').foreach { v =>
      val g = ("GIF8" + v + "a").getBytes("US-ASCII") ++
        Array[Byte](0x40, 0x01, 0x10, 0x00, 0x72.toByte, 0, 0)
      assert(MultimodalOps.parseImageHeader(g)
        .contains(MultimodalOps.ImageMeta("gif", 320, 16, 3, 1)), v)
    }
    val gos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", gos)
    val gm = MultimodalOps.parseImageHeader(gos.toByteArray)
    assert(gm.exists(m => m.format == "gif" && m.width == 17 &&
      m.height == 9 && m.nChannels == 1), gm)
  }

  test("TIFF header: both byte orders, inline vs offset BitsPerSample, bounds") {
    // hand-built minimal TIFFs: header(8) + IFD with 4 entries + a
    // 2-byte BitsPerSample array when count > 1
    def entryLE(tag: Int, typ: Int, cnt: Int, v: Long): Seq[Byte] = Seq(
      tag & 0xff, tag >> 8, typ & 0xff, typ >> 8,
      cnt & 0xff, (cnt >> 8) & 0xff, (cnt >> 16) & 0xff, (cnt >> 24) & 0xff,
      (v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt).map(_.toByte)
    // LE: width 320 (SHORT inline), height 16 (LONG), spp 3,
    // bps count 3 → offset 62 where a SHORT 8 sits
    val le: Array[Byte] =
      (Seq('I', 'I', 42, 0, 8, 0, 0, 0).map(_.toByte) ++ // header, IFD@8
        Seq(4, 0).map(_.toByte) ++                       // 4 entries
        entryLE(256, 3, 1, 320L) ++
        entryLE(257, 4, 1, 16L) ++
        entryLE(277, 3, 1, 3L) ++
        entryLE(258, 3, 3, 62L) ++
        Seq(0, 0, 0, 0).map(_.toByte) ++                 // next-IFD ptr
        Seq(8, 0, 8, 0, 8, 0).map(_.toByte)).toArray     // bps array @62
    assert(MultimodalOps.parseImageHeader(le)
      .contains(MultimodalOps.ImageMeta("tiff", 320, 16, 8, 3)),
      MultimodalOps.parseImageHeader(le).toString)
    // BE: same logical content, big-endian fields; SHORT inline values
    // are LEFT-justified in the 4-byte field (spec) — first two bytes
    def entryBE(tag: Int, typ: Int, cnt: Int, hi2: Int, lo2: Int): Seq[Byte] =
      Seq(tag >> 8, tag & 0xff, typ >> 8, typ & 0xff,
        (cnt >> 24) & 0xff, (cnt >> 16) & 0xff, (cnt >> 8) & 0xff, cnt & 0xff,
        hi2 >> 8, hi2 & 0xff, lo2 >> 8, lo2 & 0xff).map(_.toByte)
    val be: Array[Byte] =
      (Seq('M', 'M', 0, 42, 0, 0, 0, 8).map(_.toByte) ++
        Seq(0, 4).map(_.toByte) ++
        entryBE(256, 3, 1, 320, 0) ++        // SHORT 320 left-justified
        entryBE(257, 4, 1, 0, 16) ++         // LONG 16 = full 4 bytes
        entryBE(277, 3, 1, 1, 0) ++          // spp 1
        entryBE(258, 3, 1, 16, 0) ++         // bps 16 inline (count 1)
        Seq(0, 0, 0, 0).map(_.toByte)).toArray
    assert(MultimodalOps.parseImageHeader(be)
      .contains(MultimodalOps.ImageMeta("tiff", 320, 16, 16, 1)),
      MultimodalOps.parseImageHeader(be).toString)
    // truncated / lying IFD → None, never a wild read
    assert(MultimodalOps.parseImageHeader(le.take(9)).isEmpty)
    val lying = le.clone(); lying(4) = 0x7f.toByte; lying(5) = 0x7f.toByte
    assert(MultimodalOps.parseImageHeader(lying).isEmpty)
    // a real ImageIO-written TIFF parses with sane fields
    val img2 = new java.awt.image.BufferedImage(
      23, 11, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val tos = new java.io.ByteArrayOutputStream()
    val wrote = javax.imageio.ImageIO.write(img2, "tiff", tos)
    assert(wrote, "JDK TIFF writer unavailable")
    val tm = MultimodalOps.parseImageHeader(tos.toByteArray)
    assert(tm.exists(m => m.format == "tiff" && m.width == 23 &&
      m.height == 11 && m.bitDepth == 8 && m.nChannels == 3), tm)
  }

  test("webp: all three chunk layouts parse; corrupt variants are NULL") {
    def riff(fourcc: String, payload: Array[Byte]): Array[Byte] = {
      def le32(v: Int) = Array[Byte](
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + payload.length) ++
        "WEBP".getBytes("US-ASCII") ++ fourcc.getBytes("US-ASCII") ++
        le32(payload.length) ++ payload
    }
    // VP8 lossy: tag(3) + start code + LE16 dims with scale bits SET —
    // the 14-bit mask must strip them
    val w = 321; val h = 187
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
      Array[Byte]((w & 0xff).toByte, (((w >> 8) | 0x40) & 0xff).toByte,
        (h & 0xff).toByte, (((h >> 8) | 0x80) & 0xff).toByte))
    val m1 = MultimodalOps.parseImageHeader(vp8)
    assert(m1.contains(MultimodalOps.ImageMeta("webp_vp8", w, h, 8, 3)), m1)
    // VP8L: packed LE32, alpha bit set → 4 channels
    val v = (w - 1) | ((h - 1) << 14) | (1 << 28)
    val vp8l = riff("VP8L", Array[Byte](0x2f,
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte))
    val m2 = MultimodalOps.parseImageHeader(vp8l)
    assert(m2.contains(MultimodalOps.ImageMeta("webp_vp8l", w, h, 8, 4)), m2)
    // VP8X: 24-bit LE canvas dims, no alpha flag → 3 channels
    def le24(x: Int) = Array[Byte]((x & 0xff).toByte,
      ((x >> 8) & 0xff).toByte, ((x >> 16) & 0xff).toByte)
    val vp8x = riff("VP8X",
      Array[Byte](0, 0, 0, 0) ++ le24(w - 1) ++ le24(h - 1))
    val m3 = MultimodalOps.parseImageHeader(vp8x)
    assert(m3.contains(MultimodalOps.ImageMeta("webp_vp8x", w, h, 8, 3)), m3)
    // corrupt: bad VP8 start code / nonzero VP8L version / truncation
    val badSc = vp8.clone(); badSc(24) = 0x77
    assert(MultimodalOps.parseImageHeader(badSc).isEmpty)
    val badV = (w - 1) | (1 << 29)
    val badVer = riff("VP8L", Array[Byte](0x2f,
      (badV & 0xff).toByte, ((badV >> 8) & 0xff).toByte,
      ((badV >> 16) & 0xff).toByte, ((badV >> 24) & 0xff).toByte))
    assert(MultimodalOps.parseImageHeader(badVer).isEmpty)
    assert(MultimodalOps.parseImageHeader(vp8x.take(25)).isEmpty)
    assert(MultimodalOps.parseImageHeader(
      riff("ALPH", Array[Byte](1, 2, 3))).isEmpty)
  }

  // --- parseExif --------------------------------------------------------

  private def exifJpeg(le: Boolean, orient: Int, make: String,
      magic: Int = 42): Array[Byte] = {
    val mk = (make + "\u0000").getBytes("US-ASCII")
    val buf = java.nio.ByteBuffer.allocate(38 + mk.length).order(
      if (le) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    if (le) buf.put('I'.toByte).put('I'.toByte)
    else buf.put('M'.toByte).put('M'.toByte)
    buf.putShort(magic.toShort).putInt(8).putShort(2.toShort)
    buf.putShort(0x010f.toShort).putShort(2.toShort)
      .putInt(mk.length).putInt(38)
    buf.putShort(0x0112.toShort).putShort(3.toShort).putInt(1)
      .putShort(orient.toShort).putShort(0.toShort)
    buf.putInt(0)
    buf.put(mk)
    val tiff = buf.array()
    val out = new java.io.ByteArrayOutputStream()
    val app1Len = 2 + 6 + tiff.length
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((app1Len >> 8) & 0xff).toByte, (app1Len & 0xff).toByte))
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(tiff)
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte))
    out.toByteArray
  }

  test("parseExif: both byte orders, offset-dereferenced make, inline orientation") {
    val le = MultimodalOps.parseExif(exifJpeg(le = true, 6, "cam_le"))
    assert(le.contains(MultimodalOps.ExifMeta("II", 2, 6, "cam_le")))
    val be = MultimodalOps.parseExif(exifJpeg(le = false, 3, "cam_be"))
    assert(be.contains(MultimodalOps.ExifMeta("MM", 2, 3, "cam_be")))
  }

  test("parseExif: corrupt classes yield None, never a wild read") {
    // make must exceed 4 bytes incl. NUL so it takes the OFFSET path
    val good = exifJpeg(le = true, 1, "cam_x")
    assert(MultimodalOps.parseExif(good.take(30)).isEmpty) // truncated IFD
    assert(MultimodalOps.parseExif(
      exifJpeg(le = true, 1, "cam", magic = 43)).isEmpty) // bad TIFF magic
    assert(MultimodalOps.parseExif(Array[Byte](1, 2, 3)).isEmpty)
    // a make OFFSET pointing past the segment bound -> None
    val bad = good.clone()
    // entry0 value field (offset) lives at TIFF base+10+8 = file 12+18
    bad(12 + 18) = 0x7f.toByte
    assert(MultimodalOps.parseExif(bad).isEmpty)
    // no APP1 at all (plain SOI/EOI)
    assert(MultimodalOps.parseExif(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  test("parseExif: unsigned 32-bit ASCII count cannot wrap into a crash") {
    // plant cnt = 2^31 + 8 in entry0's count field: .toInt wraps
    // negative; before the r15 guard, in(start, negative) passed and
    // new String(b, start, negativeLen) threw — the contract is None
    val good = exifJpeg(le = true, 1, "cam_x")
    val hostile = good.clone()
    // entry0 count field = TIFF base (12) + ifd(8) + 2 + 4 → file 26,
    // little-endian: set to 0x80000008
    hostile(12 + 14) = 0x08; hostile(12 + 15) = 0
    hostile(12 + 16) = 0; hostile(12 + 17) = 0x80.toByte
    assert(MultimodalOps.parseExif(hostile).isEmpty)
    // near-2^31 POSITIVE count: start + n overflows Int inside in()
    val hostile2 = good.clone()
    hostile2(12 + 14) = 0xf8.toByte; hostile2(12 + 15) = 0xff.toByte
    hostile2(12 + 16) = 0xff.toByte; hostile2(12 + 17) = 0x7f
    assert(MultimodalOps.parseExif(hostile2).isEmpty)
  }

  // --- MP3 / FLAC -------------------------------------------------------

  private def mp3Bytes(ver: Int, layer: Int, brIdx: Int, srIdx: Int,
      chMode: Int, id3Size: Int = -1): Array[Byte] = {
    val id3 =
      if (id3Size >= 0)
        "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0) ++
          Array(((id3Size >> 21) & 0x7f).toByte,
            ((id3Size >> 14) & 0x7f).toByte, ((id3Size >> 7) & 0x7f).toByte,
            (id3Size & 0x7f).toByte) ++ Array.fill[Byte](id3Size)(0x41)
      else Array.empty[Byte]
    id3 ++ Array[Byte](0xff.toByte,
      (0xe0 | (ver << 3) | (layer << 1) | 1).toByte,
      ((brIdx << 4) | (srIdx << 2)).toByte, (chMode << 6).toByte) ++
      Array.fill[Byte](16)(0x55)
  }

  private def flacBytes(rate: Int, ch: Int, bps: Int, total: Long,
      blockType: Int = 0): Array[Byte] = {
    val body = new Array[Byte](34)
    body(10) = (rate >> 12).toByte
    body(11) = ((rate >> 4) & 0xff).toByte
    body(12) = (((rate & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte
    body(13) = ((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte
    body(14) = ((total >> 24) & 0xff).toByte
    body(15) = ((total >> 16) & 0xff).toByte
    body(16) = ((total >> 8) & 0xff).toByte
    body(17) = (total & 0xff).toByte
    "fLaC".getBytes("US-ASCII") ++
      Array[Byte]((0x80 | blockType).toByte, 0, 0, 34) ++ body
  }

  test("parseMp3Header: version/layer tables, ID3 syncsafe skip, mono") {
    val a = MultimodalOps.parseMp3Header(mp3Bytes(3, 1, 9, 0, 0))
    assert(a.contains(MultimodalOps.AudioStreamMeta(
      "mp3", 2, 44100, None, Some(128), None)), a.toString)
    // V2 L1 table differs from V1 L1; mono channel mode; ID3 skipped
    val b = MultimodalOps.parseMp3Header(mp3Bytes(2, 3, 10, 1, 3,
      id3Size = 200))
    assert(b.contains(MultimodalOps.AudioStreamMeta(
      "mp3", 1, 24000, None, Some(160), None)), b.toString)
    // V2.5 sample-rate table
    val c = MultimodalOps.parseMp3Header(mp3Bytes(0, 1, 7, 2, 1))
    assert(c.contains(MultimodalOps.AudioStreamMeta(
      "mp3", 2, 8000, None, Some(56), None)), c.toString)
  }

  test("parseMp3Header: reserved fields and overruns yield None") {
    assert(MultimodalOps.parseMp3Header(mp3Bytes(1, 1, 9, 0, 0)).isEmpty)
    assert(MultimodalOps.parseMp3Header(mp3Bytes(3, 0, 9, 0, 0)).isEmpty)
    assert(MultimodalOps.parseMp3Header(mp3Bytes(3, 1, 15, 0, 0)).isEmpty)
    assert(MultimodalOps.parseMp3Header(mp3Bytes(3, 1, 0, 0, 0)).isEmpty)
    assert(MultimodalOps.parseMp3Header(mp3Bytes(3, 1, 9, 3, 0)).isEmpty)
    // ID3 size overruns the payload
    assert(MultimodalOps.parseMp3Header(
      mp3Bytes(3, 1, 9, 0, 0, id3Size = 100).take(20)).isEmpty)
    assert(MultimodalOps.parseMp3Header(Array[Byte](0xff.toByte)).isEmpty)
  }

  test("parseFlacStreaminfo: packed bitfields, 36-bit totals, corrupts") {
    val a = MultimodalOps.parseFlacStreaminfo(
      flacBytes(44100, 2, 16, 1000000L))
    assert(a.contains(MultimodalOps.AudioStreamMeta(
      "flac", 2, 44100, Some(16), None, Some(1000000L))), a.toString)
    // total crossing the 32-bit boundary (36-bit field)
    val b = MultimodalOps.parseFlacStreaminfo(
      flacBytes(192000, 6, 24, 68000000000L))
    assert(b.exists(_.nSamples.contains(68000000000L)), b.toString)
    // total = 0 → unknown → None, not Some(0)
    assert(MultimodalOps.parseFlacStreaminfo(flacBytes(22050, 2, 16, 0L))
      .exists(_.nSamples.isEmpty))
    assert(MultimodalOps.parseFlacStreaminfo(
      flacBytes(44100, 2, 16, 9L, blockType = 4)).isEmpty)
    assert(MultimodalOps.parseFlacStreaminfo(
      flacBytes(44100, 2, 16, 9L).take(20)).isEmpty)
    assert(MultimodalOps.parseFlacStreaminfo(
      flacBytes(0, 2, 16, 9L)).isEmpty)
  }

  test("parseAudioStream: magic dispatch — flac, mp3 (bare + ID3), other") {
    assert(MultimodalOps.parseAudioStream(flacBytes(8000, 1, 8, 5L))
      .exists(_.format == "flac"))
    assert(MultimodalOps.parseAudioStream(mp3Bytes(3, 1, 1, 2, 0))
      .exists(_.format == "mp3"))
    assert(MultimodalOps.parseAudioStream(mp3Bytes(3, 2, 5, 0, 3, 30))
      .exists(_.format == "mp3"))
    assert(MultimodalOps.parseAudioStream(
      "OggS1234".getBytes("US-ASCII")).isEmpty)
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
