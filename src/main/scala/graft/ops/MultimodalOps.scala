package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  trait Codec[T] extends Serializable {
    def open(): Unit = ()
    def decode(payload: Array[Byte]): T
    def close(): Unit = ()
  }

  trait MediaCodec extends Codec[DecodedMedia]

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
  def decodeWith(df: DataFrame, idCol: String, codecFactory: () => MediaCodec): DataFrame =
    decodePartitions(df, "bytes",
      new StructType()
        .add("decoded_bytes", IntegerType)
        .add("checksum", LongType),
      codecFactory)((r, d) => Row.fromSeq(r.toSeq :+ d.decodedBytes :+ d.checksum))

  /** Shared mapPartitions plumbing for every codec: per-partition
    * instance + lifecycle (see [[Codec]] doc), `Dataset.mapPartitions`
    * WITH an Encoder — not `df.rdd.mapPartitions` — so the operator
    * stays inside one logical plan: Catalyst keeps pushing filters and
    * pruning below the object boundary and codegen resumes immediately
    * above it, instead of the RDD round-trip. */
  private def decodePartitions[T](
      df: DataFrame, bytesCol: String, appended: StructType,
      codecFactory: () => Codec[T])(append: (Row, T) => Row): DataFrame = {
    val inSchema = df.schema
    val outSchema = appended.fields.foldLeft(inSchema)(_ add _)
    val bytesIdx = inSchema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // one codec INSTANCE and lifecycle per partition: built inside the
      // task so concurrent tasks never share decoder state (see trait doc)
      val codec = codecFactory()
      codec.open()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
      rows.map(r => append(r, codec.decode(r.getAs[Array[Byte]](bytesIdx))))
    }(enc)
  }

  /** Stub-codec decode (see [[StubCodec]]); kept as the named entry the
    * catalog and tests use so the container build stays decoder-free. */
  def decodeStub(df: DataFrame, idCol: String): DataFrame =
    decodeWith(df, idCol, () => StubCodec)

  /** Parsed image dimensions + sample structure — the metadata a real
    * training pipeline filters/buckets on before paying for a full
    * pixel decode (drop icons, cap megapixels, route by aspect ratio). */
  final case class ImageMeta(
      format: String, width: Int, height: Int, bitDepth: Int, nChannels: Int)

  /** REAL image-header decode, pure JVM and offline-safe: PNG IHDR
    * (fixed offsets after the 8-byte signature) and JPEG SOF segments
    * (a proper marker walk — length-skipping APPn/DQT/DHT until the
    * first SOF0–SOF15 frame header; NOT a byte-pattern search, which a
    * stray 0xFFC0 inside a table segment would fool). Returns None for
    * anything unparseable — truncated files, non-image payloads, or a
    * PNG color type outside the spec — so corrupt inputs become NULL
    * metadata rows to filter, never task failures. */
  def parseImageHeader(b: Array[Byte]): Option[ImageMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (b.length >= 26 &&
        u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      // IHDR payload: width(4) height(4) bitDepth(1) colorType(1) ...
      val channels = u8(25) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => -1
      }
      if (channels < 0) None
      else Some(ImageMeta("png", be32(16), be32(20), u8(24), channels))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments from just after SOI
      var pos = 2
      var res: Option[ImageMeta] = None
      var done = false
      while (!done && pos + 3 < b.length) {
        if (u8(pos) != 0xff) done = true // not a marker: corrupt stream
        else {
          val m = u8(pos + 1)
          if (m == 0xff) pos += 1 // fill byte before a marker
          else if (m == 0xd9 || m == 0xda) done = true
          // ^ EOI / SOS: a conforming stream has its SOF before SOS, so
          // stopping here loses no valid parse — while walking PAST SOS
          // would read entropy-coded scan data, where stuffed 0xFF bytes
          // can masquerade as segments and a stray 0xFFCx pair would
          // yield a bogus SOF (garbage dimensions) instead of None
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2 // standalone
          else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            // SOF segment: len(2) precision(1) height(2) width(2) nComp(1)
            if (pos + 9 < b.length)
              res = Some(ImageMeta("jpeg",
                be16(pos + 7), be16(pos + 5), u8(pos + 4), u8(pos + 9)))
            done = true
          } else pos += 2 + be16(pos + 2) // length-skip the segment
        }
      }
      res
    } else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      // GIF (round 12): logical screen descriptor right after the
      // 6-byte version magic — width/height little-endian 16-bit at
      // 6/8, packed byte at 10. Palette depth comes from the GCT-SIZE
      // field (bits 0-2: the global color table holds 2^(N+1) entries,
      // so N+1 is the index bit depth — the PNG color-type-3 analog),
      // NOT the color-resolution bitfield in bits 4-6, which many
      // encoders hardwire to 7 regardless of palette size. Palette
      // format: 1 channel.
      def le16g(i: Int) = u8(i) | (u8(i + 1) << 8)
      val depth = (u8(10) & 0x7) + 1
      Some(ImageMeta("gif", le16g(6), le16g(8), depth, 1))
    } else if (b.length >= 20 && b(0) == 'R' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'E' &&
        b(10) == 'B' && b(11) == 'P') {
      // WebP (round 14): the fifth raster class — a RIFF container
      // (the parseWavHeader layout) whose first chunk fourcc selects
      // one of THREE incompatible dimension encodings:
      //  - 'VP8 ' lossy: 3-byte frame tag, 0x9D012A start code, then
      //    two LE16s with 14-bit dims in the low bits (high 2 bits are
      //    upscaling hints, NOT size). Always 3 channels (YUV).
      //  - 'VP8L' lossless: 0x2F signature, then ONE LE32 packing
      //    width−1 (bits 0-13), height−1 (bits 14-27) and the
      //    alpha_is_used bit (28) — version bits 29-31 must be 0.
      //  - 'VP8X' extended: a flags byte (bit 0x10 = alpha), 3
      //    reserved bytes, then canvas width−1 / height−1 as 24-bit
      //    LITTLE-endian. A conforming reader takes the canvas size
      //    from here without parsing the inner bitstream chunks.
      // Anything else (truncated, bad start code, nonzero VP8L
      // version, unknown fourcc) is NULL, never a wild read.
      def le16w(i: Int) = u8(i) | (u8(i + 1) << 8)
      def le24(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      def le32w(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
          ((u8(i + 3) & 0xffL) << 24)
      val fourcc = new String(b.slice(12, 16), "US-ASCII")
      fourcc match {
        case "VP8 " if b.length >= 30 &&
            u8(20 + 3) == 0x9d && u8(20 + 4) == 0x01 && u8(20 + 5) == 0x2a =>
          Some(ImageMeta("webp_vp8",
            le16w(26) & 0x3fff, le16w(28) & 0x3fff, 8, 3))
        case "VP8L" if b.length >= 25 && u8(20) == 0x2f => {
          val v = le32w(21)
          if (((v >> 29) & 0x7L) != 0L) None // reserved version bits
          else Some(ImageMeta("webp_vp8l",
            ((v & 0x3fffL) + 1L).toInt, (((v >> 14) & 0x3fffL) + 1L).toInt,
            8, if (((v >> 28) & 1L) == 1L) 4 else 3))
        }
        case "VP8X" if b.length >= 30 =>
          Some(ImageMeta("webp_vp8x",
            le24(24) + 1, le24(27) + 1, 8,
            if ((u8(20) & 0x10) != 0) 4 else 3))
        case _ => None
      }
    } else if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
          (b(0) == 'M' && b(1) == 'M' && u8(2) == 0 && u8(3) == 42))) {
      // TIFF (round 13): the fourth raster layout class — an
      // ENDIAN-SWITCHED, OFFSET-WALKED directory format (PNG = fixed
      // big-endian chunks, BMP = fixed little-endian offsets, GIF =
      // packed bitfields; TIFF resolves a byte-order flag, follows the
      // IFD pointer, then scans count × 12-byte tagged entries).
      // Fields: 256 ImageWidth, 257 ImageLength, 277 SamplesPerPixel
      // (default 1), 258 BitsPerSample — whose value is INLINE when
      // count == 1 but an OFFSET to a SHORT array when count > 1 (the
      // RGB case); inline short values are left-justified in the
      // 4-byte field per the spec, so they read at entry offset 8 in
      // both byte orders. Every offset is bounds-checked: a truncated
      // or lying IFD yields None, never a wild read.
      val le = b(0) == 'I'
      def u16t(i: Int): Int =
        if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
      def u32t(i: Int): Long =
        if (le)
          u8(i).toLong | (u8(i + 1).toLong << 8) |
            (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
        else
          (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
            (u8(i + 2).toLong << 8) | u8(i + 3).toLong
      val ifd = u32t(4)
      if (ifd < 8 || ifd + 2 > b.length) None
      else {
        val n = u16t(ifd.toInt)
        if (ifd + 2 + 12L * n > b.length) None
        else {
          var width, height, bps = -1
          var spp = 1
          var i = 0
          while (i < n) {
            val e = ifd.toInt + 2 + 12 * i
            val tag = u16t(e)
            val typ = u16t(e + 2)
            val cnt = u32t(e + 4)
            // SHORT(3) inline at e+8; LONG(4) inline full field
            def shortOrLong: Int =
              if (typ == 3) u16t(e + 8)
              else if (typ == 4) u32t(e + 8).toInt
              else -1
            tag match {
              case 256 => width = shortOrLong
              case 257 => height = shortOrLong
              case 277 => spp = math.max(shortOrLong, 1)
              case 258 =>
                bps =
                  if (cnt == 1) shortOrLong
                  else {
                    val off = u32t(e + 8)
                    if (off + 2 <= b.length) u16t(off.toInt) else -1
                  }
              case _ => ()
            }
            i += 1
          }
          if (width <= 0 || height <= 0) None
          else Some(ImageMeta("tiff", width, height,
            if (bps > 0) bps else 1, spp))
        }
      }
    } else if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') {
      // BMP (round 12): BITMAPFILEHEADER(14) then BITMAPINFOHEADER —
      // little-endian fields at FIXED offsets: header size @14 (must be
      // a known INFO-family size), width @18, height @22 (SIGNED — a
      // negative value is a top-down bitmap; magnitude reported, never
      // a negative "height"), bit count @28. Channel semantics aligned
      // with the PNG row: 24-bit → 8-bit depth × 3 channels, 32-bit →
      // ×4, ≤8-bit → palette index (1 channel, native depth).
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int) =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val hdrSize = le32(14)
      if (hdrSize != 40 && hdrSize != 52 && hdrSize != 56 &&
          hdrSize != 108 && hdrSize != 124) None
      else {
        val bits = le16(28)
        val (depth, channels) = bits match {
          case 32 => (8, 4)
          case 24 => (8, 3)
          case 16 => (16, 1)
          case n if n == 1 || n == 4 || n == 8 => (n, 1)
          case _ => (-1, -1)
        }
        if (depth < 0) None
        else Some(ImageMeta("bmp", le32(18), math.abs(le32(22)),
          depth, channels))
      }
    } else None
  }

  /** Stateless [[Codec]] over [[parseImageHeader]] — the container-safe
    * REAL decoder (header-only; full pixel decode stays behind the same
    * seam for builds that ship an imaging library). */
  object ImageHeaderCodec extends Codec[Option[ImageMeta]] {
    override def decode(payload: Array[Byte]): Option[ImageMeta] =
      parseImageHeader(payload)
  }

  /** Parsed EXIF application segment — the provenance/orientation
    * metadata an image pipeline reads before any pixel work (auto-
    * rotate by tag 0x0112, dedupe/attribute by camera make). */
  final case class ExifMeta(byteOrder: String, nEntries: Int,
      orientation: Int, make: String)

  /** REAL EXIF decode, pure JVM: walk the JPEG marker list to the APP1
    * segment, validate the `Exif\0\0` header, then run a TIFF IFD walk
    * INSIDE the embedded payload — the container-embedded twin of the
    * standalone TIFF branch in [[parseImageHeader]] (every offset in an
    * EXIF block is relative to the EMBEDDED TIFF header, not the file —
    * the classic off-by-container bug this parser and its oracle both
    * have to get right). Tags read: 0x0112 Orientation (SHORT inline)
    * and 0x010F Make (ASCII — INLINE when count ≤ 4, an OFFSET into
    * the payload otherwise, NUL terminator stripped). Truncated
    * segments, wrong endianness magic, or out-of-bounds offsets yield
    * None — NULL metadata, never a wild read. */
  def parseExif(b: Array[Byte]): Option[ExifMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) None
    else {
      // marker walk to APP1 (the parseImageHeader JPEG discipline: skip
      // segments by declared length, never pattern-search)
      var pos = 2
      var app1: Int = -1
      var app1Len = 0
      var done = false
      while (!done && pos + 4 <= b.length) {
        if (u8(pos) != 0xff) done = true
        else {
          val marker = u8(pos + 1)
          val len = be16(pos + 2)
          if (marker == 0xe1) { app1 = pos + 4; app1Len = len - 2; done = true }
          else if (marker == 0xd9 || marker == 0xda) done = true
          else pos += 2 + len
        }
      }
      if (app1 < 0 || app1 + app1Len > b.length || app1Len < 14) None
      else if (!(b(app1) == 'E' && b(app1 + 1) == 'x' && b(app1 + 2) == 'i' &&
          b(app1 + 3) == 'f' && u8(app1 + 4) == 0 && u8(app1 + 5) == 0)) None
      else {
        val t = app1 + 6 // embedded TIFF header base — ALL offsets relative
        val end = app1 + app1Len
        def in(i: Int, n: Int) = i >= t && i + n <= end
        if (!in(t, 8)) None
        else {
          val le =
            if (b(t) == 'I' && b(t + 1) == 'I' && u8(t + 2) == 42 &&
              u8(t + 3) == 0) Some(true)
            else if (b(t) == 'M' && b(t + 1) == 'M' && u8(t + 2) == 0 &&
              u8(t + 3) == 42) Some(false)
            else None
          le.flatMap { isLe =>
            def u16t(i: Int): Int =
              if (isLe) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
            def u32t(i: Int): Long =
              if (isLe)
                u8(i).toLong | (u8(i + 1).toLong << 8) |
                  (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
              else
                (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
                  (u8(i + 2).toLong << 8) | u8(i + 3).toLong
            val ifd = t + u32t(t + 4).toInt
            if (!in(ifd, 2)) None
            else {
              val n = u16t(ifd)
              if (!in(ifd + 2, 12 * n)) None
              else {
                var orientation = -1
                var make: String = null
                var bad = false
                var i = 0
                while (i < n && !bad) {
                  val e = ifd + 2 + 12 * i
                  val tag = u16t(e)
                  val typ = u16t(e + 2)
                  val cnt = u32t(e + 4)
                  tag match {
                    case 0x0112 if typ == 3 => orientation = u16t(e + 8)
                    case 0x010f if typ == 2 =>
                      val start =
                        if (cnt <= 4) e + 8 else t + u32t(e + 8).toInt
                      // Bounds-check cnt AS A LONG before narrowing: for
                      // cnt ≥ 2³¹, cnt.toInt wraps negative and
                      // in(start, negative) would pass (start + negative
                      // ≤ end), then new String(…, negativeLen) throws —
                      // a task-killing crash on hostile input, violating
                      // the "out-of-bounds yields None, never a wild
                      // read" contract. (Near-2³¹ positive counts would
                      // likewise overflow start + n inside in().)
                      if (cnt > (end - start).toLong ||
                          !in(start, cnt.toInt)) bad = true
                      else {
                        val raw = new String(b, start, cnt.toInt, "US-ASCII")
                        make = raw.takeWhile(_ != '\u0000')
                      }
                    case _ => ()
                  }
                  i += 1
                }
                if (bad) None
                else Some(ExifMeta(if (isLe) "II" else "MM", n,
                  orientation, make))
              }
            }
          }
        }
      }
    }
  }

  object ExifCodec extends Codec[Option[ExifMeta]] {
    override def decode(payload: Array[Byte]): Option[ExifMeta] =
      parseExif(payload)
  }

  /** Append EXIF columns (`byte_order, n_entries, orientation, make`;
    * all NULL for unparseable payloads) — same single-plan
    * mapPartitions shape as [[imageMeta]]. */
  def exifMeta(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    decodePartitions(df, bytesCol,
      new StructType()
        .add("byte_order", StringType)
        .add("n_entries", IntegerType)
        .add("orientation", IntegerType)
        .add("make", StringType),
      () => ExifCodec) { (r, m) =>
      Row.fromSeq(r.toSeq ++ (m match {
        case Some(e) => Seq(e.byteOrder, e.nEntries,
          if (e.orientation > 0) e.orientation else null, e.make)
        case None => Seq(null, null, null, null)
      }))
    }

  /** Parsed audio stream structure — the metadata an audio pipeline
    * filters/buckets on before decoding samples (drop non-PCM, route by
    * sample rate, budget by duration = n_frames / sample_rate). */
  final case class AudioMeta(format: String, audioFormat: Int,
      channels: Int, sampleRate: Int, bitDepth: Int, nFrames: Long)

  /** REAL WAV (RIFF) header decode, pure JVM: validates the RIFF/WAVE
    * signature then WALKS the chunk list (id + little-endian size,
    * chunks pad to even offsets) to the `fmt ` and `data` chunks — not
    * fixed offsets, which break on files carrying LIST/INFO metadata
    * before the sample data. Returns None for truncated or non-WAV
    * payloads, corrupt sizes included. */
  def parseWavHeader(b: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int) = new String(b.slice(i, i + 4), "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      var pos = 12L
      var fmt = Option.empty[(Int, Int, Int, Int)] // audioFmt, ch, rate, bits
      var dataLen = Option.empty[Long]
      var corrupt = false
      while (!corrupt && (fmt.isEmpty || dataLen.isEmpty) &&
          pos + 8 <= b.length) {
        val p = pos.toInt
        val id = tag(p)
        val size = le32(p + 4)
        if (id == "fmt ") {
          if (p + 8 + 16 <= b.length)
            fmt = Some((le16(p + 8), le16(p + 10), le32(p + 12).toInt, le16(p + 22)))
          else corrupt = true
        }
        if (id == "data") dataLen = Some(size)
        pos = pos + 8 + size + (size % 2)
      }
      for {
        (af, ch, rate, bits) <- fmt
        dl <- dataLen
        if !corrupt && ch > 0 && bits >= 8 && bits % 8 == 0
      } yield AudioMeta("wav", af, ch, rate, bits, dl / (ch.toLong * (bits / 8)))
    }
  }

  object WavHeaderCodec extends Codec[Option[AudioMeta]] {
    override def decode(payload: Array[Byte]): Option[AudioMeta] =
      parseWavHeader(payload)
  }

  /** Parsed COMPRESSED-audio stream structure — the crawl-side
    * complement of [[AudioMeta]]'s PCM view: MP3 carries a bitrate but
    * no PCM bit depth or (without a full frame scan) total sample
    * count; FLAC carries bit depth and total samples but no fixed
    * bitrate. Absent-by-format fields are None, never 0 — a pipeline
    * routing on `bitrateKbps` must see NULL for lossless input, not a
    * fake number. */
  final case class AudioStreamMeta(format: String, channels: Int,
      sampleRate: Int, bitDepth: Option[Int], bitrateKbps: Option[Int],
      nSamples: Option[Long])

  /** REAL MP3 frame-header decode, pure JVM: skips an optional ID3v2
    * tag (10-byte header + 28-bit SYNCSAFE size — each size byte
    * masked to 7 bits, the encoding that exists so the size can never
    * alias a frame sync), then parses the 4-byte frame header at that
    * offset: 11-bit sync, MPEG version (reserved value → None), layer
    * (reserved → None), bitrate index against the (version, layer)
    * table (0 = free and 15 = bad → None), sample-rate index
    * (3 = reserved → None), and channel mode (mono vs the three
    * 2-channel modes). Returns None for truncated, desynced, or
    * reserved-field payloads — NULL rows, never task failures. */
  def parseMp3Header(b: Array[Byte]): Option[AudioStreamMeta] = {
    def u8(i: Int) = b(i) & 0xff
    // optional ID3v2 prefix: "ID3" + ver(2) + flags(1) + syncsafe size(4)
    val off =
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        10 + ((u8(6) & 0x7f) << 21 | (u8(7) & 0x7f) << 14 |
          (u8(8) & 0x7f) << 7 | (u8(9) & 0x7f))
      else 0
    if (off < 0 || off + 4 > b.length) None
    else if (u8(off) != 0xff || (u8(off + 1) & 0xe0) != 0xe0) None
    else {
      val verBits = (u8(off + 1) >> 3) & 0x3   // 0=V2.5 1=resv 2=V2 3=V1
      val layerBits = (u8(off + 1) >> 1) & 0x3 // 0=resv 1=L3 2=L2 3=L1
      val brIdx = (u8(off + 2) >> 4) & 0xf
      val srIdx = (u8(off + 2) >> 2) & 0x3
      val chMode = (u8(off + 3) >> 6) & 0x3    // 3=mono, else 2-channel
      if (verBits == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 ||
          srIdx == 3) None
      else {
        val v1 = verBits == 3
        // bitrate kbps by (version group, layer), index 1..14
        val table: Array[Int] = (v1, layerBits) match {
          case (true, 3) => // V1 L1
            Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
          case (true, 2) => // V1 L2
            Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
          case (true, _) => // V1 L3
            Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
          case (false, 3) => // V2/V2.5 L1
            Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
          case (false, _) => // V2/V2.5 L2+L3 share one table
            Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
        }
        val rates: Array[Int] = verBits match {
          case 3 => Array(44100, 48000, 32000)
          case 2 => Array(22050, 24000, 16000)
          case _ => Array(11025, 12000, 8000) // V2.5
        }
        Some(AudioStreamMeta("mp3",
          if (chMode == 3) 1 else 2, rates(srIdx),
          None, Some(table(brIdx - 1)), None))
      }
    }
  }

  /** REAL FLAC STREAMINFO decode, pure JVM: `fLaC` magic, then the
    * FIRST metadata block header (1 byte: bit 7 = last-block flag,
    * bits 0-6 = type — STREAMINFO is type 0 and MUST come first per
    * spec, so a different type is corrupt, not skippable) + 24-bit BE
    * length ≥ 34, then the packed big-endian bitfields at bytes
    * 10..17 of the block body: 20-bit sample rate (0 is invalid),
    * 3-bit channels−1, 5-bit bits-per-sample−1, 36-bit total
    * samples (0 = unknown → None, the spec's own convention). */
  def parseFlacStreaminfo(b: Array[Byte]): Option[AudioStreamMeta] = {
    def u8(i: Int) = b(i) & 0xff
    if (b.length < 8 + 34 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') None
    else {
      val blockType = u8(4) & 0x7f
      val blockLen = (u8(5) << 16) | (u8(6) << 8) | u8(7)
      if (blockType != 0 || blockLen < 34 || 8 + blockLen > b.length) None
      else {
        val s = 8 // STREAMINFO body start
        val sampleRate =
          (u8(s + 10) << 12) | (u8(s + 11) << 4) | (u8(s + 12) >> 4)
        val channels = ((u8(s + 12) >> 1) & 0x7) + 1
        val bps = (((u8(s + 12) & 0x1) << 4) | (u8(s + 13) >> 4)) + 1
        val total = ((u8(s + 13) & 0xf).toLong << 32) |
          (u8(s + 14).toLong << 24) | (u8(s + 15).toLong << 16) |
          (u8(s + 16).toLong << 8) | u8(s + 17).toLong
        if (sampleRate == 0) None
        else Some(AudioStreamMeta("flac", channels, sampleRate,
          Some(bps), None, if (total == 0) None else Some(total)))
      }
    }
  }

  /** Magic-sniffing dispatcher over the compressed-audio classes —
    * the [[parseImageHeader]] discipline for the crawl's audio tier:
    * `fLaC` → FLAC, `ID3`/frame sync → MP3, anything else None. */
  def parseAudioStream(b: Array[Byte]): Option[AudioStreamMeta] =
    if (b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
        b(3) == 'C') parseFlacStreaminfo(b)
    else if (b.length >= 3 &&
        ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
          (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)))
      parseMp3Header(b)
    else None

  object AudioStreamCodec extends Codec[Option[AudioStreamMeta]] {
    override def decode(payload: Array[Byte]): Option[AudioStreamMeta] =
      parseAudioStream(payload)
  }

  /** Parsed MP4 container structure — what a video pipeline filters and
    * budgets on before paying for a demux/decode: duration =
    * `duration / timescale` seconds, track count for audio-less clips,
    * presentation dimensions (the first track reporting nonzero ones —
    * audio tracks carry 0×0 by spec) for aspect/megapixel routing. */
  final case class VideoMeta(format: String, brand: String,
      timescale: Long, duration: Long, nTracks: Int,
      width: Int, height: Int)

  /** REAL MP4 (ISO BMFF) header decode, pure JVM: requires `ftyp` as the
    * first top-level box (the brand check), then WALKS the top-level box
    * list — 32-bit sizes, the 64-bit `size==1` largesize escape, and the
    * `size==0` to-end-of-file form — to `moov`, and walks `moov`'s
    * children for the `mvhd` movie header (version 0: 32-bit
    * timescale/duration; version 1: 64-bit duration), counting `trak`
    * boxes and descending into each for its `tkhd` track header, whose
    * 16.16 fixed-point width/height (integer part taken) give the
    * movie's presentation dimensions — the first track reporting
    * nonzero ones wins; audio-only files yield 0×0. Returns None for
    * truncated payloads, non-MP4 bytes, malformed box sizes, or an
    * unknown mvhd/tkhd version — corrupt inputs become NULL metadata
    * rows to filter, never task failures. Same codec seam as
    * [[parseImageHeader]]/[[parseWavHeader]]. */
  def parseVideoHeader(b: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int) = new String(b.slice(i, i + 4), "US-ASCII")
    // (boxStart, payloadStart, boxEnd) for the box at `pos`, or None on
    // a malformed size / truncated header
    def box(pos: Long, limit: Long): Option[(Long, Long, Long)] = {
      if (pos + 8 > limit) None
      else {
        val p = pos.toInt
        val size32 = be32(p)
        if (size32 == 0L) Some((pos, pos + 8, limit)) // box runs to EOF
        else if (size32 == 1L) {
          if (pos + 16 > limit) None
          else {
            val size64 = be64(p + 8)
            if (size64 < 16 || pos + size64 > limit) None
            else Some((pos, pos + 16, pos + size64))
          }
        } else if (size32 < 8 || pos + size32 > limit) None
        else Some((pos, pos + 8, pos + size32))
      }
    }
    if (b.length < 16) None
    else box(0L, b.length.toLong) match {
      case Some((s0, p0, e0)) if tag(s0.toInt + 4) == "ftyp" && p0 + 4 <= e0 =>
        val brand = tag(p0.toInt)
        // walk the remaining top-level boxes to moov
        var pos = e0
        var moov = Option.empty[(Long, Long)] // payload start/end
        var corrupt = false
        while (moov.isEmpty && !corrupt && pos + 8 <= b.length) {
          box(pos, b.length.toLong) match {
            case Some((s, p, e)) =>
              if (tag(s.toInt + 4) == "moov") moov = Some((p, e))
              pos = e
            case None => corrupt = true
          }
        }
        moov.flatMap { case (mStart, mEnd) =>
          var cpos = mStart
          var mvhd = Option.empty[(Long, Long)] // timescale, duration
          var dims = Option.empty[(Int, Int)] // first nonzero tkhd w×h
          var bad = false
          var nTracks = 0
          // walk one trak's children to its tkhd; width/height are
          // 16.16 fixed point at payload offset 76/80 (v0: 4 ver+flags,
          // 4+4 times, 4 id, 4 res, 4 dur, 8 res, 2+2+2+2, 36 matrix)
          // or 88/92 (v1: the three time/duration fields widen to 8) —
          // integer part is the top 16 bits
          def trakDims(tStart: Long, tEnd: Long): Option[(Int, Int)] = {
            var q = tStart
            var found = Option.empty[(Int, Int)]
            while (!bad && found.isEmpty && q + 8 <= tEnd) {
              box(q, tEnd) match {
                case Some((s, p, e)) =>
                  if (tag(s.toInt + 4) == "tkhd") {
                    if (p >= e) bad = true
                    else {
                      val off = u8(p.toInt) match {
                        case 0 => 76L
                        case 1 => 88L
                        case _ => -1L
                      }
                      if (off < 0 || p + off + 8 > e) bad = true
                      else found = Some((
                        (be32((p + off).toInt) >> 16).toInt,
                        (be32((p + off + 4).toInt) >> 16).toInt))
                    }
                  }
                  q = e
                case None => bad = true
              }
            }
            found
          }
          while (!bad && cpos + 8 <= mEnd) {
            box(cpos, mEnd) match {
              case Some((s, p, e)) =>
                tag(s.toInt + 4) match {
                  case "mvhd" if p < e =>
                    val v = u8(p.toInt)
                    // v0: ctime(4) mtime(4) ts(4) dur(4); v1: 8/8/4/8
                    if (v == 0 && p + 4 + 16 <= e)
                      mvhd = Some((be32(p.toInt + 12), be32(p.toInt + 16)))
                    else if (v == 1 && p + 4 + 28 <= e)
                      mvhd = Some((be32(p.toInt + 20), be64(p.toInt + 24)))
                    else bad = true
                  case "trak" =>
                    nTracks += 1
                    if (dims.isEmpty)
                      dims = trakDims(p, e).filter(d => d._1 > 0 && d._2 > 0)
                  case _ => ()
                }
                cpos = e
              case None => bad = true
            }
          }
          if (bad) None
          else mvhd.map { case (ts, dur) =>
            val (w, h) = dims.getOrElse((0, 0))
            VideoMeta("mp4", brand, ts, dur, nTracks, w, h)
          }
        }
      case _ => None
    }
  }

  object VideoHeaderCodec extends Codec[Option[VideoMeta]] {
    override def decode(payload: Array[Byte]): Option[VideoMeta] =
      parseVideoHeader(payload)
  }

  /** Append parsed MP4 metadata columns (`format, brand, timescale,
    * duration, n_tracks, width, height`; all NULL for unparseable
    * payloads) — the video twin of [[imageMeta]]/[[audioMeta]], same
    * per-partition codec lifecycle. */
  def videoMeta(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    decodePartitions(df, bytesCol,
      new StructType()
        .add("format", StringType)
        .add("brand", StringType)
        .add("timescale", LongType)
        .add("duration", LongType)
        .add("n_tracks", IntegerType)
        .add("width", IntegerType)
        .add("height", IntegerType),
      () => VideoHeaderCodec) { (r, m) =>
      Row.fromSeq(r.toSeq ++ (m match {
        case Some(v) =>
          Seq(v.format, v.brand, v.timescale, v.duration, v.nTracks, v.width, v.height)
        case None => Seq(null, null, null, null, null, null, null)
      }))
    }

  /** Append parsed WAV metadata columns (`format, audio_fmt, channels,
    * sample_rate, bit_depth, n_frames`; all NULL for unparseable
    * payloads) — the audio twin of [[imageMeta]], same per-partition
    * codec lifecycle. */
  def audioMeta(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    decodePartitions(df, bytesCol,
      new StructType()
        .add("format", StringType)
        .add("audio_fmt", IntegerType)
        .add("channels", IntegerType)
        .add("sample_rate", IntegerType)
        .add("bit_depth", IntegerType)
        .add("n_frames", LongType),
      () => WavHeaderCodec) { (r, m) =>
      Row.fromSeq(r.toSeq ++ (m match {
        case Some(a) =>
          Seq(a.format, a.audioFormat, a.channels, a.sampleRate, a.bitDepth, a.nFrames)
        case None => Seq(null, null, null, null, null, null)
      }))
    }

  /** Append parsed compressed-audio metadata columns (`format,
    * channels, sample_rate, bit_depth, bitrate_kbps, n_samples`; all
    * NULL for unparseable payloads, format-absent fields NULL by
    * design — see [[AudioStreamMeta]]) — the MP3/FLAC twin of
    * [[audioMeta]], same per-partition codec lifecycle. */
  def audioStreamMeta(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    decodePartitions(df, bytesCol,
      new StructType()
        .add("format", StringType)
        .add("channels", IntegerType)
        .add("sample_rate", IntegerType)
        .add("bit_depth", IntegerType)
        .add("bitrate_kbps", IntegerType)
        .add("n_samples", LongType),
      () => AudioStreamCodec) { (r, m) =>
      Row.fromSeq(r.toSeq ++ (m match {
        case Some(a) => Seq(a.format, a.channels, a.sampleRate,
          a.bitDepth.map(Integer.valueOf).orNull,
          a.bitrateKbps.map(Integer.valueOf).orNull,
          a.nSamples.map(java.lang.Long.valueOf).orNull)
        case None => Seq(null, null, null, null, null, null)
      }))
    }

  /** Append parsed image metadata columns (`format, width, height,
    * bit_depth, n_channels`; all NULL for unparseable payloads) to a
    * frame holding raw image bytes in `bytesCol` — e.g. straight off
    * the `binaryFile` source. Same per-partition codec lifecycle and
    * single-plan mapPartitions shape as [[decodeWith]]. */
  def imageMeta(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    decodePartitions(df, bytesCol,
      new StructType()
        .add("format", StringType)
        .add("width", IntegerType)
        .add("height", IntegerType)
        .add("bit_depth", IntegerType)
        .add("n_channels", IntegerType),
      () => ImageHeaderCodec) { (r, m) =>
      Row.fromSeq(r.toSeq ++ (m match {
        case Some(i) => Seq(i.format, i.width, i.height, i.bitDepth, i.nChannels)
        case None => Seq(null, null, null, null, null)
      }))
    }

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

  // ------------------------------------------------------ pixel transforms
  // The decode→transform stage a training pipeline runs between raw media
  // bytes and features: decode (codec seam), resize, perceptual hash,
  // frame-sample. The DECODE is stubbed (no media libraries in this
  // container) as a deterministic integer pixel field seeded from the
  // payload bytes; every transform above it is the real Spark plumbing —
  // zero-shuffle column programs evaluated only at the sampled output
  // coordinates, the way a decimating decoder behaves. Identical payloads
  // get identical seeds, so perceptual-hash dedup downstream collides
  // exactly the media that are byte-identical — the property the stub
  // must preserve for the dedup story to be testable.

  /** Modulus of the stub pixel field: 2^31 − 1 (Mersenne prime), same as
    * [[EmbedOps]]' portable token hash — nonneg BIGINT arithmetic that
    * restates exactly in the DuckDB oracle. */
  val PixelMod = 2147483647L

  /** STUB "decode" step: fold (a·31 + byte) mod 2^31−1 over the payload —
    * run through the same per-partition [[Codec]] lifecycle as the real
    * header decoders, so swapping in a raster-returning production codec
    * changes nothing upstream or downstream of the seam. */
  object PixelSeedCodec extends Codec[Long] {
    override def decode(payload: Array[Byte]): Long =
      if (payload == null) 0L // corrupt/missing payload → constant raster, not a task failure
      else payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % PixelMod)
  }

  /** Append `pix_seed`: the payload-derived pixel-field seed (see
    * [[PixelSeedCodec]]), via the single-plan mapPartitions shape. */
  def pixelSeed(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    decodePartitions(df, bytesCol,
      new StructType().add("pix_seed", LongType),
      () => PixelSeedCodec)((r, s) => Row.fromSeq(r.toSeq :+ s))

  /** STUB source pixel: grayscale value of pixel (x, y) of frame `frame`
    * — the deterministic integer field standing in for the raster a real
    * decoder would materialize. seed < 2^31 keeps every product below
    * 2^52: no overflow under ANSI mode, bit-identical in DuckDB. */
  def stubPixel(seed: Column, frame: Column, y: Column, x: Column): Column =
    pmod(seed * lit(1000003L) + frame * lit(7919L) +
      y * lit(104729L) + x * lit(31L), lit(PixelMod)) % 256

  /** Nearest-neighbor resize of frame 0 to outW×outH: appends `pixels`,
    * a row-major array of length outW·outH sampling the source pixel at
    * (x·w/outW, y·h/outH). The field is evaluated ONLY at the outW·outH
    * output coordinates — never the full w×h raster — matching how a
    * decimating decode samples a large source. Zero-shuffle column
    * program; `pix_seed`/w/h are staged as plain attributes so the
    * transform lambda reads O(1) attributes rather than re-evaluating
    * captured subtrees per element (the HOF-capture trap). */
  def resizeStub(df: DataFrame, outW: Int, outH: Int): DataFrame =
    df.withColumn("_w", col("meta.width").cast(LongType))
      .withColumn("_h", col("meta.height").cast(LongType))
      .withColumn("pixels",
        transform(sequence(lit(0), lit(outW * outH - 1)), i => {
          val y = floor(i / lit(outW)).cast(LongType)
          val x = pmod(i, lit(outW)).cast(LongType)
          val srcY = floor(y * col("_h") / lit(outH)).cast(LongType)
          val srcX = floor(x * col("_w") / lit(outW)).cast(LongType)
          stubPixel(col("pix_seed"), lit(0L), srcY, srcX)
        }))
      .drop("_w", "_h")

  /** 64-bit difference hash (dHash) over a (hashW+1)×hashH resized grid:
    * bit (y, x) = 1 iff pixel(y, x+1) > pixel(y, x) — the classic
    * gradient fingerprint that survives re-encoding and mild rescaling.
    * Emitted as a '0'/'1' string rather than a packed BIGINT (bit 63
    * would be the sign bit) — portable across engines and band-sliceable
    * with plain substring for LSH-style near-dup grouping. A static
    * 64-term projection (no HOF), fully inside whole-stage codegen. */
  def dhashBits(pixels: Column, hashW: Int = 8, hashH: Int = 8): Column = {
    val gridW = hashW + 1
    concat((for (y <- 0 until hashH; x <- 0 until hashW) yield {
      val i = y * gridW + x // 0-based grid index; element_at is 1-based
      when(element_at(pixels, i + 2) > element_at(pixels, i + 1), lit("1"))
        .otherwise(lit("0"))
    }): _*)
  }

  /** Frame sampling with per-frame features: k evenly spaced frame
    * indices over meta.n_frames (⌊j·n/k⌋, deduped — clips shorter than k
    * frames yield fewer samples), exploded to one row per sampled frame
    * carrying `sample_pos`, `frame_idx`, and `frame_pixsum` — the sum of
    * that frame's outW×outH resized stub pixels, the integer stand-in
    * for a per-frame embedding. Explode-then-featurize is the production
    * shape: one media row fans out to frame rows that downstream feature
    * extractors process in parallel across the cluster. */
  def frameSampleStub(df: DataFrame, k: Int,
      outW: Int = 8, outH: Int = 8): DataFrame = {
    val staged = df
      .withColumn("_w", col("meta.width").cast(LongType))
      .withColumn("_h", col("meta.height").cast(LongType))
      .withColumn("_n", col("meta.n_frames").cast(LongType))
    // ⌊j·n/k⌋ is nondecreasing in j, so array_distinct's first-occurrence
    // order IS ascending frame order — sample_pos is deterministic
    val idxs = array_distinct(transform(sequence(lit(0), lit(k - 1)),
      j => floor(j.cast(LongType) * col("_n") / lit(k)).cast(LongType)))
    staged
      .select(col("*"), posexplode(idxs).as(Seq("sample_pos", "frame_idx")))
      .withColumn("frame_pixsum",
        aggregate(sequence(lit(0), lit(outW * outH - 1)), lit(0L), (acc, i) => {
          val y = floor(i / lit(outW)).cast(LongType)
          val x = pmod(i, lit(outW)).cast(LongType)
          val srcY = floor(y * col("_h") / lit(outH)).cast(LongType)
          val srcX = floor(x * col("_w") / lit(outW)).cast(LongType)
          acc + stubPixel(col("pix_seed"), col("frame_idx"), srcY, srcX)
        }))
      .drop("_w", "_h", "_n")
  }
}
