package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{AsOfJoin, BasketOps, BpeOps, CalibrateOps, ClassifyOps, CorpusPrep, DedupOps, DsirOps, EmbedOps, EventOps, Flatten, GeoOps, GraphOps, Joins, LangIdOps, Layout, MultimodalOps, ProfileOps, PslDomain, QualityOps, Readers, SampleOps, SearchOps, SimilarityOps, TextOps, TimeSeriesOps, TypedOps, UnigramLmOps, Upsert, WordPieceOps}

/** Multimodal family of the operator catalog (12 keys) —
  * one slice of the r16 per-family split; entries are verbatim
  * from the former monolithic Catalog.scala, in original order.
  * Merged into the driver contract by [[Catalog.specs]]. */
private[queries] object CatalogMultimodal {
  import CatalogShared._

  val specs: Map[String, QuerySpec] = Map(


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
  )
}
