package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 C12).
  *
  * Media (image/audio/video) rides as an opaque `binary` column with a
  * typed metadata struct; per-item kernels (decode, resize, frame
  * sample, feature extract) run batched inside `mapPartitions` so heavy
  * native libraries initialize once per partition, not once per row.
  *
  * The IMAGE path decodes for real: `javax.imageio.ImageIO` (JDK
  * built-in, no external libs) decodes PNG/JPEG pixels and
  * [[extractFeatures]] computes genuine pixel statistics. The AUDIO
  * path also decodes for real: `javax.sound.sampled` (JDK built-in)
  * reads WAV/AIFF/AU to PCM and [[extractAudioFeatures]] computes
  * genuine waveform statistics. VIDEO decodes real PIXELS for
  * MJPEG-in-AVI ([[videoFrameStats]]: RIFF walker + per-frame ImageIO
  * JPEG decode) and for UNCOMPRESSED DIB-in-AVI (BI_RGB raw frames —
  * no codec needed), plus real container METADATA for MP4
  * ([[videoMetadata]]); only inter-frame video codecs remain stubbed
  * ([[sampleFrames]]) — the JDK ships no H.264/VP9 decoder. The
  * partition lifecycle and schema are the production shape either way.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media: Array[Byte], format: String)
  case class MediaMeta(media_id: Long, n_bytes: Long, content_hash: Long, format: String)
  case class ImageDims(media_id: Long, detected: String, width: Int, height: Int)
  case class MediaFeatures(media_id: Long, features: Array[Float])
  case class MediaFrame(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** the shared deterministic fake-feature fallback for undecodable
    * media: a rolling hash fanned into [0,1] floats. One definition —
    * the image and audio kernels must never silently diverge. */
  private def hashFallback(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hsh = bytes.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    Array.tabulate(dim)(i => (((hsh >>> (i * 7)) & 0xFFFF).toFloat / 65535.0f))
  }

  /** typed metadata from the raw bytes (cheap, no decode needed) */
  def attachMetadata(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.map(r => MediaMeta(r.media_id, r.media.length.toLong,
      java.util.Arrays.hashCode(r.media).toLong, r.format))
  }

  /** REAL (no-libs) image dimension extraction from raw headers —
    * PNG IHDR and JPEG SOF markers are plain byte layouts, so this
    * much of "decode" needs no codec. Unknown/corrupt headers yield
    * ("unknown", -1, -1) rather than failing the partition. */
  def imageDimensions(ds: Dataset[MediaRow]): Dataset[ImageDims] = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      val b = r.media
      def u8(i: Int) = b(i) & 0xff
      def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      val png = b.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G'
      val jpeg = b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8
      if (png) ImageDims(r.media_id, "png", be32(16), be32(20))
      else if (jpeg) {
        // walk JPEG segments to the first SOF0..SOF15 (minus DHT/DAC/RST)
        var i = 2
        var out: ImageDims = null
        while (out == null && i + 1 < b.length) {
          if (u8(i) != 0xFF) { out = ImageDims(r.media_id, "unknown", -1, -1) }
          else {
            // consume 0xFF fill bytes: the marker is the first non-FF
            while (i + 1 < b.length && u8(i + 1) == 0xFF) i += 1
            val marker = if (i + 1 < b.length) u8(i + 1) else -1
            if (marker < 0) {
              out = ImageDims(r.media_id, "unknown", -1, -1)
            } else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) {
              i += 2 // TEM / RSTn / SOI / EOI carry no length field
            } else if (i + 9 >= b.length) {
              out = ImageDims(r.media_id, "unknown", -1, -1)
            } else if (marker >= 0xC0 && marker <= 0xCF &&
                marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
              out = ImageDims(r.media_id, "jpeg", be16(i + 7), be16(i + 5))
            } else i += 2 + be16(i + 2)
          }
        }
        if (out != null) out else ImageDims(r.media_id, "unknown", -1, -1)
      }
      else ImageDims(r.media_id, "unknown", -1, -1)
    }
  }

  /** C12 demo, oracle-gated (r13 — the multimodal tier's driver-checked
    * row): one REAL encoded image per document — PNG for even ids,
    * JPEG for odd — with dimensions derived from the id
    * (1 + id % 29 × 1 + id % 17), plus a planted corrupt header every
    * 97th id (bytes truncated to 8). [[imageDimensions]] must recover
    * every width/height from the actual IHDR / SOF byte layout the
    * JDK encoders emitted, and ("unknown", −1, −1) for the corrupt
    * plants. The oracle recomputes the deterministic expectations
    * relationally (the warc_ingest discipline: the fixture derivation
    * is SQL-expressible, the byte-level parse it gates is not — any
    * header-parse bug lands as a value mismatch). Encode + parse are
    * map-only over the id column: no shuffle, corpus-parallel. */
  def imageDimsDemo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val w = 1 + (id % 29).toInt
          val h = 1 + (id % 17).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val fmt = if (id % 2 == 0) "png" else "jpg"
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          val bytes = bos.toByteArray
          MediaRow(id, if (id % 97 == 0) bytes.take(8) else bytes, fmt)
        }
      }
    imageDimensions(media).toDF()
      .select(col("media_id"), col("detected"), col("width"), col("height"))
      .orderBy("media_id")
  }

  /** Decode+feature kernel. Images (PNG/JPEG — anything the JDK's
    * ImageIO reads) decode for REAL and yield pixel statistics:
    * [w/4096, h/4096, meanR, meanG, meanB, meanGray, varGray, aspect]
    * cycled to `dim` entries (channel means in [0,1]). Non-image bytes
    * (audio/video stubs, corrupt data) fall back to the deterministic
    * rolling-hash fake so the pipeline shape stays total. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init: ImageIO scans its plugin registry once here,
      // the same slot a native codec or model load would occupy
      javax.imageio.ImageIO.setUseCache(false)
      val kernel: Array[Byte] => Array[Float] = { bytes =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img != null && img.getWidth > 0 && img.getHeight > 0) {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var sy = 0.0; var sy2 = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
              sr += r; sg += g; sb += b
              val gray = (r + g + b) / 765.0
              sy += gray; sy2 += gray * gray
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val meanGray = sy / n
          val base = Array(
            w / 4096.0f, h / 4096.0f,
            (sr.toDouble / (255.0 * n)).toFloat,
            (sg.toDouble / (255.0 * n)).toFloat,
            (sb.toDouble / (255.0 * n)).toFloat,
            meanGray.toFloat,
            (sy2 / n - meanGray * meanGray).toFloat,
            (w.toDouble / h).toFloat)
          Array.tabulate(dim)(i => base(i % base.length))
        } else hashFallback(bytes, dim) // deterministic fake for non-image media
      }
      it.map(r => MediaFeatures(r.media_id, kernel(r.media)))
    }
  }

  /** Audio decode+feature kernel. WAV/AIFF/AU (anything the JDK's
    * `javax.sound.sampled` reads — built-in, no external libs) decode
    * for REAL: the stream converts to signed 16-bit PCM and the
    * features are genuine waveform statistics —
    * [sampleRate/48000, channels, durationSec/60, rms, peak, meanAbs,
    * zeroCrossingRate, dcOffset] cycled to `dim` entries, amplitudes
    * normalized to [-1, 1]. Non-audio bytes (video stubs, corrupt
    * data) fall back to the deterministic rolling-hash fake so the
    * pipeline stays total. */
  def extractAudioFeatures(ds: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    ds.mapPartitions { it =>
      val kernel: Array[Byte] => Array[Float] = { bytes =>
        val pcm =
          try {
            val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
            val f = in.getFormat
            val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
              f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
              f.getSampleRate, false)
            Some((AudioSystem.getAudioInputStream(target, in), target))
          } catch { case _: Exception => None }
        pcm match {
          case Some((in, f)) =>
            // body reads can fail after a parseable header (malformed
            // frames, SPI read errors) — those must hit the fallback
            // too, not the task
            val raw = try in.readAllBytes() catch { case _: Exception => null }
            if (raw == null) hashFallback(bytes, dim) else {
            val n = raw.length / 2
            var sum = 0.0; var sum2 = 0.0; var sumAbs = 0.0
            var peak = 0.0; var flips = 0L
            var prevSign = 0
            var i = 0
            while (i < n) {
              val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort / 32768.0
              sum += s; sum2 += s * s; sumAbs += math.abs(s)
              if (math.abs(s) > peak) peak = math.abs(s)
              val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
              if (prevSign != 0 && sign != prevSign) flips += 1
              prevSign = sign
              i += 1
            }
            val frames = n / math.max(1, f.getChannels)
            val base = Array(
              f.getSampleRate / 48000.0f, f.getChannels.toFloat,
              (frames / f.getSampleRate / 60.0).toFloat,
              (if (n > 0) math.sqrt(sum2 / n) else 0.0).toFloat,
              peak.toFloat,
              (if (n > 0) sumAbs / n else 0.0).toFloat,
              (if (n > 1) flips.toDouble / (n - 1) else 0.0).toFloat,
              (if (n > 0) sum / n else 0.0).toFloat)
            Array.tabulate(dim)(j => base(j % base.length))
            }
          case None => hashFallback(bytes, dim)
        }
      }
      it.map(r => MediaFeatures(r.media_id, kernel(r.media)))
    }
  }

  case class VideoMeta(media_id: Long, container: String, major_brand: String,
                       duration_sec: Double, n_tracks: Int, codecs: Seq[String])

  /** C12 demo, oracle-gated (r14 — the tier's second driver-checked
    * row, after r13's image_dims): one REAL ISO-BMFF byte stream per
    * document — ftyp(isom) + moov(mvhd + traks) — with every metadatum
    * derived from the id: duration 1 + id % 7 seconds at timescale
    * 1000 (mvhd v0 for even ids, v1 for odd — both header layouts),
    * 1 + id % 3 trak boxes whose stsd sample-entry fourccs cycle
    * (avc1, hvc1, mp4v) by (id + t) % 3, plus a truncated plant every
    * 97th id. [[videoMetadata]]'s box walker must recover all of it
    * from the actual byte layout; the oracle recomputes the
    * deterministic expectations relationally (the image_dims
    * discipline — fixture derivation is SQL-expressible, the box walk
    * is not). Build + parse are map-only: no shuffle, corpus-parallel. */
  def videoMetaDemo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long")).as[Long]
      .map(id => MediaRow(id, synthMp4(id), "mp4"))
    videoMetadata(media).toDF()
      .select(col("media_id"), col("container"), col("major_brand"),
        col("duration_sec"), col("n_tracks"),
        concat_ws(",", col("codecs")).as("codecs"))
      .orderBy("media_id")
  }

  /** the deterministic MP4 fixture for [[videoMetaDemo]]: a standards-
    * shaped (not merely parser-shaped) minimal box tree. */
  private[graft] def synthMp4(id: Long): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0))
    val timescale = 1000L
    val durUnits = timescale * (1 + id % 7)
    val mvhd =
      if (id % 2 == 0) // v0: 32-bit creation/modification/duration
        box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
          be32(timescale) ++ be32(durUnits))
      else             // v1: 64-bit creation/modification/duration
        box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
          be32(timescale) ++ be32(0) ++ be32(durUnits))
    val codecNames = Array("avc1", "hvc1", "mp4v")
    val traks = (0 until (1 + id % 3).toInt).flatMap { t =>
      val fmt = codecNames(((id + t) % 3).toInt)
      val entry = be32(16) ++ fmt.getBytes("ISO-8859-1") ++ new Array[Byte](8)
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1) ++ entry)
      box("trak", box("mdia", box("minf", box("stbl", stsd))))
    }
    val full = ftyp ++ box("moov", mvhd ++ traks)
    if (id % 97 == 0) full.take(8) else full
  }

  /** REAL (no-codec) video container metadata: an MP4/ISO-BMFF box
    * walker. The box grammar is a plain byte layout —
    * `[size:u32][type:4cc][payload]`, size 1 → a u64 largesize follows,
    * size 0 → to end of enclosure — so duration (moov/mvhd timescale +
    * duration, v0 and v1 layouts), track count (moov/trak boxes) and
    * sample-entry codec fourccs (trak/mdia/minf/stbl/stsd entries) read
    * without decoding a single frame. Pixels stay stubbed
    * ([[sampleFrames]]); the METADATA is genuine. Unknown or truncated
    * bytes yield ("unknown", "", -1, 0, []) rather than failing the
    * partition — malformed sizes stop the walk at the enclosure edge. */
  def videoMetadata(ds: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import ds.sparkSession.implicits._
    ds.map(r => parseMp4Meta(r.media_id, r.media))
  }

  private[graft] def parseMp4Meta(id: Long, b: Array[Byte]): VideoMeta = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xFFFFFFFFL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def cc(i: Int): String = new String(b, i, 4, "ISO-8859-1")
    val unknown = VideoMeta(id, "unknown", "", -1.0, 0, Seq.empty)

    /** top-level and container boxes as (type, payloadStart, payloadEnd);
      * stops at the first malformed header instead of guessing onward */
    def boxes(from: Int, to: Int): List[(String, Int, Int)] = {
      var i = from
      var out = List.empty[(String, Int, Int)]
      var bad = false
      while (!bad && i + 8 <= to) {
        val size32 = be32(i)
        val tpe = cc(i + 4)
        val (payloadStart, end): (Int, Long) =
          if (size32 == 0) (i + 8, to.toLong)                // box runs to enclosure end
          else if (size32 == 1) {
            if (i + 16 > to) (i + 16, Long.MaxValue)         // truncated largesize
            else (i + 16, i + be64(i + 8))
          } else (i + 8, i + size32)
        if (end < payloadStart || end > to) bad = true
        else { out ::= (tpe, payloadStart, end.toInt); i = end.toInt }
      }
      out.reverse
    }

    if (b.length < 12) return unknown
    val top = boxes(0, b.length)
    val known = Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide", "moof", "pdin")
    if (top.isEmpty || !known.contains(top.head._1)) return unknown

    val brand = top.find(_._1 == "ftyp")
      .collect { case (_, s, e) if e - s >= 4 => cc(s) }.getOrElse("")
    top.find(_._1 == "moov") match {
      case None => VideoMeta(id, "mp4", brand, -1.0, 0, Seq.empty)
      case Some((_, ms, me)) =>
        val inMoov = boxes(ms, me)
        val duration = inMoov.find(_._1 == "mvhd").flatMap { case (_, s, e) =>
          if (e - s < 4) None
          else u8(s) match {                                  // version byte
            case 0 if e - s >= 20 => Some(be32(s + 16).toDouble / math.max(1L, be32(s + 12)))
            case 1 if e - s >= 32 => Some(be64(s + 24).toDouble / math.max(1L, be32(s + 20)))
            case _ => None
          }
        }.getOrElse(-1.0)
        val traks = inMoov.filter(_._1 == "trak")
        // trak -> mdia -> minf -> stbl -> stsd: 4B version/flags +
        // 4B entry_count, then [size:u32][format:4cc] sample entries
        val codecs = traks.flatMap { case (_, ts, te) =>
          for {
            (_, ds_, de) <- boxes(ts, te).filter(_._1 == "mdia")
            (_, ns, ne) <- boxes(ds_, de).filter(_._1 == "minf")
            (_, ss, se) <- boxes(ns, ne).filter(_._1 == "stbl")
            (_, es, ee) <- boxes(ss, se).filter(_._1 == "stsd")
            entry <- if (ee - es >= 8) boxes(es + 8, ee) else Nil
          } yield entry._1
        }
        VideoMeta(id, "mp4", brand, duration, traks.size, codecs)
    }
  }

  case class VideoFrameStats(media_id: Long, frame_no: Int, width: Int,
                             height: Int, mean_r: Float, mean_g: Float,
                             mean_b: Float, mean_gray: Float)

  /** REAL video pixels for the two container+codec combinations that
    * need no external libraries: MJPEG-in-AVI (per-frame ImageIO JPEG
    * decode) and UNCOMPRESSED DIB-in-AVI (BI_RGB — raw bottom-up BGR
    * rows, no codec at all, just the BITMAPINFOHEADER geometry from the
    * stream's `strf` chunk). The RIFF/AVI grammar is a plain byte
    * layout — `[fourcc][size:u32le][payload][pad-to-even]`, LIST chunks
    * carry a type fourcc then subchunks — so [[aviFrames]] walks to the
    * `movi` list and yields every video frame chunk (`##dc`/`##db`).
    * When the header declares BI_RGB ([[aviDibFormat]]), frames decode
    * as raw DIB rows; otherwise each JPEG-payload frame decodes through
    * ImageIO. Output: per-frame channel/gray means in [0,1], the same
    * statistics discipline as [[extractFeatures]]. Non-AVI bytes,
    * malformed chunks, geometry-short DIB frames, and frames in codecs
    * the JDK cannot decode (no JPEG SOI, or ImageIO failure) yield NO
    * rows rather than failing the partition — for those codecs
    * [[sampleFrames]] remains the documented stub. */
  def videoFrameStats(ds: Dataset[MediaRow], maxFrames: Int = 32): Dataset[VideoFrameStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition init, once
      it.flatMap { r =>
        aviDibFormat(r.media) match {
          case Some((w, h, bpp)) =>
            aviFrames(r.media, maxFrames, jpegOnly = false).zipWithIndex.flatMap {
              case (fb, fi) => dibFrameStats(r.media_id, fi, fb, w, h, bpp)
            }
          case None =>
            aviFrames(r.media, maxFrames, jpegOnly = true).zipWithIndex.flatMap {
              case (fb, fi) => jpegFrameStats(r.media_id, fi, fb)
            }
        }
      }
    }
  }

  private def jpegFrameStats(id: Long, fi: Int, fb: Array[Byte]): Option[VideoFrameStats] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = 255.0 * w * h
      Some(VideoFrameStats(id, fi, w, h,
        (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
        ((sr + sg + sb) / (3.0 * n)).toFloat))
    }
  }

  /** channel means of one uncompressed DIB frame: `bpp`∈{24,32},
    * byte order B,G,R(,X), rows padded to 4 bytes. Channel MEANS are
    * row-order-invariant, so bottom-up vs top-down (biHeight sign)
    * needs no branch. A frame shorter than its declared geometry is
    * skipped, never partially summed. */
  private def dibFrameStats(id: Long, fi: Int, fb: Array[Byte],
                            w: Int, h: Int, bpp: Int): Option[VideoFrameStats] = {
    val bytesPP = bpp / 8
    // stride math in Long: a hostile biWidth (e.g. 2^29 at 32bpp) wraps
    // Int multiply negative, which would defeat the length guard below
    // and index out of bounds — the malformed-bytes invariant says skip,
    // never fail the partition. Once the guard passes, every index fits
    // an Int because rowBytes*h <= fb.length.
    val rowBytesL = (w.toLong * bytesPP + 3) & ~3L
    if (fb.length.toLong < rowBytesL * h) None
    else {
      val rowBytes = rowBytesL.toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        val base = y * rowBytes
        var x = 0
        while (x < w) {
          val p = base + x * bytesPP
          sb += fb(p) & 0xff; sg += fb(p + 1) & 0xff; sr += fb(p + 2) & 0xff
          x += 1
        }
        y += 1
      }
      val n = 255.0 * w * h
      Some(VideoFrameStats(id, fi, w, h,
        (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
        ((sr + sg + sb) / (3.0 * n)).toFloat))
    }
  }

  /** the video stream's BITMAPINFOHEADER geometry IF it declares
    * uncompressed BI_RGB at 24/32 bpp: walk the header lists to the
    * first `strf` following a `strh` whose fccType is `vids`, read
    * (biWidth, |biHeight|, biBitCount, biCompression). None for any
    * other codec (including MJPEG: biCompression 'MJPG'), malformed
    * headers, or non-AVI bytes — the caller then takes the JPEG path. */
  /** THE iterative RIFF/AVI enclosure walk — the single shared engine
    * under [[aviFrames]] and [[aviDibFormat]], so every hardening fix
    * (bounds, overflow, nesting) lives in exactly one place. Invokes
    * `onChunk(fourcc, payloadStart, payloadEnd)` for each non-LIST
    * chunk in stream order, descending into LISTs; a `true` return
    * stops the walk. No-op for non-AVI bytes.
    *
    * Depth-first over (from, to) ranges with an explicit HEAP stack,
    * not recursion: a crafted AVI can nest LIST chunks ~len/12 levels
    * deep, and that depth on the CALL stack is a StackOverflowError —
    * an Error the malformed-bytes Exception handler cannot catch,
    * breaking the "bad bytes yield NO rows, never a failed partition"
    * invariant. Heap depth is bounded by the same len/12 and is just
    * memory. Pushing (resume-after-list, interior) in that order pops
    * the interior first, preserving stream-order chunk visits; a
    * malformed size aborts only its own enclosure (outer ranges stay
    * on the stack). Sizes are read as u32 into Long so a hostile size
    * cannot overflow the Int bounds checks. */
  private def walkRiff(b: Array[Byte])(onChunk: (String, Int, Int) => Boolean): Unit = {
    def u8(i: Int) = b(i) & 0xff
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
    def cc(i: Int) = new String(b, i, 4, "ISO-8859-1")
    if (b.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return
    val stack = scala.collection.mutable.Stack[(Int, Int)]((12, b.length))
    var stop = false
    while (!stop && stack.nonEmpty) {
      var (i, to) = stack.pop()
      var bad = false
      var descended = false
      while (!stop && !bad && !descended && i + 8 <= to) {
        val id = cc(i)
        val size = le32(i + 4)
        val ps = i + 8
        val pe = ps + size
        if (pe > to) bad = true
        else {
          val peI = pe.toInt
          val next = peI + (size & 1L).toInt // chunks pad to even length
          if (id == "LIST" && size >= 4) {
            // movi frames may nest inside rec  lists
            stack.push((next, to))
            stack.push((ps + 4, peI))
            descended = true
          } else {
            stop = onChunk(id, ps, peI)
            i = next
          }
        }
      }
    }
  }

  private[multimodal] def aviDibFormat(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    // state across chunks: whether the last strh seen was a video stream
    var vids = false
    var result: Option[(Int, Int, Int)] = None
    walkRiff(b) { (id, ps, pe) =>
      val size = pe - ps
      if (id == "strh" && size >= 4) {
        vids = new String(b, ps, 4, "ISO-8859-1") == "vids"
        false
      } else if (id == "strf" && vids && size >= 20) {
        val width = le32(ps + 4).toInt
        val height = math.abs(le32(ps + 8).toInt)
        val bpp = le16(ps + 14)
        val compression = le32(ps + 16)
        // 64k bound: every real video dimension fits, and it caps
        // stride*height far below any integer-overflow edge a hostile
        // header could otherwise steer the decoder into
        if (compression == 0L && (bpp == 24 || bpp == 32) &&
          width > 0 && height > 0 && width <= 65536 && height <= 65536)
          result = Some((width, height, bpp))
        true // first video strf decides, hit or miss
      } else false
    }
    result
  }

  /** Payloads of the first `max` video frame chunks (`##dc`/`##db`) of
    * a RIFF/AVI byte array — JPEG-SOI-bearing ones only when
    * `jpegOnly` (the MJPEG path), every frame chunk otherwise (the
    * raw-DIB path, whose frames have no magic to sniff); empty for
    * anything else. Malformed sizes stop the walk at the enclosure
    * edge (truncation-safe, like [[parseMp4Meta]]); see [[walkRiff]]
    * for the adversarial-nesting posture. */
  private[multimodal] def aviFrames(b: Array[Byte], max: Int,
                                    jpegOnly: Boolean): Seq[Array[Byte]] = {
    def u8(i: Int) = b(i) & 0xff
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    walkRiff(b) { (id, ps, pe) =>
      if (id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db")) &&
          (!jpegOnly || (pe - ps >= 2 && u8(ps) == 0xFF && u8(ps + 1) == 0xD8)))
        out += java.util.Arrays.copyOfRange(b, ps, pe)
      out.size >= max
    }
    out.toSeq
  }

  /** THE DECODE SEAM (C12): the single point a real codec plugs into.
    * Everything around it — the MediaFrame schema, the per-partition
    * open/decode batching, the partition-preserving map-only plan —
    * is decoder-agnostic; DecoderSeamSpec proves it by injecting a
    * synthetic decoder and asserting identical schema, zero
    * exchanges, and one `open()` per partition. A production H.264
    * implementation allocates its native codec context in `open()`
    * (once per partition, the expensive part) and demuxes+decodes per
    * media blob in `decode` — no Spark-side code changes. */
  trait FrameDecoder extends Serializable {
    /** once per partition, before any media row — real decoders
      * allocate codec contexts / native buffers here. */
    def open(): Unit = ()
    /** one media blob → its sampled frames as (frame_no, bytes). */
    def decode(mediaId: Long, media: Array[Byte],
               format: String): Iterator[(Int, Array[Byte])]
  }

  /** The default stand-in behind the seam for codecs with no JDK
    * decoder (H.264 etc.): every `stride`-th fixed-size byte slice
    * stands in for a decoded frame — deterministic, so specs and
    * oracles can predict it. MJPEG-in-AVI and uncompressed DIB-in-AVI
    * decode for REAL — see [[videoFrameStats]]; container metadata is
    * real for MP4 too, see [[videoMetadata]]. */
  final case class StridedSliceDecoder(frameSize: Int = 16, stride: Int = 4)
      extends FrameDecoder {
    def decode(mediaId: Long, media: Array[Byte],
               format: String): Iterator[(Int, Array[Byte])] = {
      // media shorter than one frame yields none; plain max() would let
      // java's toward-zero division produce a bogus empty frame
      val n = if (media.length < frameSize) 0
              else (media.length - frameSize) / (frameSize * stride) + 1
      (0 until n).iterator.map { i =>
        val off = i * frameSize * stride
        (i, media.slice(off, off + frameSize))
      }
    }
  }

  /** Frame sampling through an injected [[FrameDecoder]]. ONE
    * `mapPartitions` — partition-preserving and shuffle-free by
    * construction (frames of one media row never leave its
    * partition), with `open()` amortized across the partition's rows
    * the way a real codec context must be. */
  def sampleFramesWith(ds: Dataset[MediaRow],
                       decoder: FrameDecoder): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      decoder.open()
      it.flatMap(r => decoder.decode(r.media_id, r.media, r.format)
        .map { case (no, fb) => MediaFrame(r.media_id, no, fb) })
    }
  }

  /** [[sampleFramesWith]] over the default [[StridedSliceDecoder]]. */
  def sampleFrames(ds: Dataset[MediaRow], frameSize: Int = 16,
                   stride: Int = 4): Dataset[MediaFrame] =
    sampleFramesWith(ds, StridedSliceDecoder(frameSize, stride))

  /** project features next to metadata — the join shape downstream
    * training-data pipelines consume. */
  def featureTable(rows: Dataset[MediaRow]): DataFrame = {
    val meta = attachMetadata(rows)
    val feats = extractFeatures(rows)
    meta.join(feats, "media_id")
  }
}
