package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def rows(): org.apache.spark.sql.Dataset[MediaRow] = Seq(
    MediaRow(1L, Array.tabulate(200)(_.toByte), "png"),
    MediaRow(2L, Array.tabulate(64)(i => (i * 3).toByte), "jpg"),
    MediaRow(3L, Array.empty[Byte], "png")).toDS()

  test("C12 metadata is cheap and typed") {
    val meta = Multimodal.attachMetadata(rows()).collect().sortBy(_.media_id)
    assert(meta.map(_.n_bytes).sameElements(Array(200L, 64L, 0L)))
    assert(meta.map(_.format).sameElements(Array("png", "jpg", "png")))
  }

  test("C12 feature extraction: deterministic, fixed dim, bounded values") {
    val f1 = Multimodal.extractFeatures(rows()).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(rows()).collect().sortBy(_.media_id)
    assert(f1.length == 3 && f1.forall(_.features.length == 8))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    assert(f1.flatMap(_.features).forall(v => v >= 0f && v <= 1f))
  }

  test("C12 frame sampling: strided windows, empty media -> no frames") {
    val frames = Multimodal.sampleFrames(rows(), frameSize = 16, stride = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length == 3 && !byId.contains(3L)) // (200-16)/64+1 = 3
    assert(frames.forall(_.frame.length == 16))
  }

  test("C12 image dimensions parsed from real PNG/JPEG headers, no codec") {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++ Array[Byte](8, 6, 0, 0, 0)
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      // APP0 segment (skipped by the walker)
      Array[Byte](0xFF.toByte, 0xE0.toByte) ++ be16(6) ++ Array[Byte](1, 2, 3, 4) ++
      // SOF0: len, precision, height, width, components
      Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(600) ++ be16(800) ++ Array[Byte](3, 0, 0, 0)
    val ds = Seq(
      MediaRow(1, png, "png"), MediaRow(2, jpeg, "jpg"),
      MediaRow(3, Array[Byte](1, 2, 3), "bin"), MediaRow(4, Array.empty[Byte], "bin")).toDS()
    val out = Multimodal.imageDimensions(ds).collect().sortBy(_.media_id)
    assert(out(0) == Multimodal.ImageDims(1, "png", 640, 480))
    assert(out(1) == Multimodal.ImageDims(2, "jpeg", 800, 600))
    assert(out(2).detected == "unknown" && out(3).detected == "unknown")
  }

  test("C12 real ImageIO decode: pixel statistics of a known PNG are exact") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(MediaRow(1L, bos.toByteArray, "png")).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head.features
    // PNG is lossless: each channel is lit in exactly 2 of 4 pixels
    assert(math.abs(f(2) - 0.5f) < 1e-6, s"meanR ${f(2)}")
    assert(math.abs(f(3) - 0.5f) < 1e-6, s"meanG ${f(3)}")
    assert(math.abs(f(4) - 0.5f) < 1e-6, s"meanB ${f(4)}")
    assert(math.abs(f(0) - 2f / 4096f) < 1e-9 && math.abs(f(7) - 1.0f) < 1e-9)
    // gray means: (1/3, 1/3, 1/3, 1) -> mean 0.5, var 0.5²·... > 0
    assert(math.abs(f(5) - 0.5f) < 1e-6 && f(6) > 0f)
  }

  test("C12 JPEG walker skips 0xFF fill bytes and length-less TEM/RST markers") {
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val FF = 0xFF.toByte
    val jpeg = Array[Byte](FF, 0xD8.toByte) ++
      Array[Byte](FF, 0x01) ++                       // TEM: no length field
      Array[Byte](FF, 0xD3.toByte) ++                // RST3: no length field
      Array[Byte](FF, FF, FF, 0xE0.toByte) ++ be16(4) ++ Array[Byte](9, 9) ++ // fill bytes then APP0
      Array[Byte](FF, 0xC0.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(240) ++ be16(320) ++ Array[Byte](3, 0, 0, 0)
    val out = Multimodal.imageDimensions(Seq(MediaRow(1, jpeg, "jpg")).toDS()).collect().head
    assert(out == Multimodal.ImageDims(1, "jpeg", 320, 240))
    // truncated after fill bytes: clean "unknown", not a bogus parse
    val trunc = Array[Byte](FF, 0xD8.toByte, FF, FF, FF)
    val out2 = Multimodal.imageDimensions(Seq(MediaRow(2, trunc, "jpg")).toDS()).collect().head
    assert(out2.detected == "unknown")
  }

  test("C12 feature table joins metadata with features") {
    val t = Multimodal.featureTable(rows())
    assert(t.count() == 3)
    assert(t.columns.toSet == Set("media_id", "n_bytes", "content_hash", "format", "features"))
  }

  test("C12 REAL audio decode: WAV sine wave yields true waveform statistics") {
    import javax.sound.sampled.{AudioFormat, AudioFileFormat, AudioInputStream, AudioSystem}
    // 0.5s of a 440 Hz sine at 8 kHz mono 16-bit, amplitude 0.5
    val rate = 8000f; val nFrames = 4000
    val pcm = new Array[Byte](nFrames * 2)
    (0 until nFrames).foreach { i =>
      val s = (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = s.toByte; pcm(2 * i + 1) = (s >> 8).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames), AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val out = Multimodal.extractAudioFeatures(
      Seq(MediaRow(1, wav, "wav"), MediaRow(2, Array[Byte](1, 2, 3, 4), "bin")).toDS())
      .collect().map(r => r.media_id -> r.features).toMap
    val f = out(1L)
    assert(math.abs(f(0) - rate / 48000f) < 1e-6, s"sample rate ${f(0)}")
    assert(f(1) == 1.0f, s"channels ${f(1)}")
    assert(math.abs(f(2) - 0.5f / 60f) < 1e-4, s"duration ${f(2)}")
    // sine RMS = A/sqrt(2) ~ 0.3536, peak ~ 0.5, meanAbs = 2A/pi ~ 0.3183
    assert(math.abs(f(3) - 0.3536f) < 0.01, s"rms ${f(3)}")
    assert(math.abs(f(4) - 0.5f) < 0.01, s"peak ${f(4)}")
    assert(math.abs(f(5) - 0.3183f) < 0.01, s"meanAbs ${f(5)}")
    // zero crossings: 2 per cycle, 440 cycles/s -> 2*440/8000 = 0.11
    assert(math.abs(f(6) - 0.11f) < 0.01, s"zcr ${f(6)}")
    assert(math.abs(f(7)) < 0.01, s"dc offset ${f(7)}")
    // non-audio bytes take the documented deterministic fallback
    assert(out(2L).forall(v => v >= 0f && v <= 1f))
  }

  test("C12 REAL video container metadata: MP4 box walker reads duration, tracks, codecs") {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ tpe.getBytes("ISO-8859-1") ++ payload
    // mvhd v0: version/flags, creation, modification, timescale=1000,
    // duration=5500 -> 5.5 s
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ be32(1000) ++ be32(5500) ++ new Array[Byte](80))
    def trak(codec: String) =
      box("trak", box("mdia", box("minf", box("stbl",
        box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1) ++
          box(codec, new Array[Byte](8)))))))
    val moov = box("moov", mvhd ++ trak("avc1") ++ trak("mp4a"))
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isomiso2".getBytes)
    // 64-bit largesize mdat exercises the size==1 path
    val mdatPayload = new Array[Byte](16)
    val mdat = be32(1) ++ "mdat".getBytes("ISO-8859-1") ++
      be64(16L + mdatPayload.length) ++ mdatPayload
    val mp4 = ftyp ++ moov ++ mdat

    val out = Multimodal.videoMetadata(Seq(
        MediaRow(1, mp4, "mp4"),
        MediaRow(2, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12), "bin"),
        MediaRow(3, mp4.take(ftyp.length + 10), "mp4")).toDS()) // truncated mid-moov
      .collect().map(r => r.media_id -> r).toMap
    val m = out(1L)
    assert(m.container == "mp4" && m.major_brand == "isom")
    assert(m.duration_sec == 5.5, s"duration ${m.duration_sec}")
    assert(m.n_tracks == 2)
    assert(m.codecs == Seq("avc1", "mp4a"), s"codecs ${m.codecs}")
    assert(out(2L).container == "unknown" && out(2L).codecs.isEmpty)
    // a valid ftyp followed by truncation still reads as mp4, no crash,
    // and reports what it could prove: nothing past the cut
    assert(out(3L).container == "mp4" && out(3L).n_tracks == 0)

    // mvhd v1 (64-bit duration) layout
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      be64(0) ++ be64(0) ++ be32(600) ++ be64(900) ++ new Array[Byte](80))
    val mp4v1 = ftyp ++ box("moov", mvhd1 ++ trak("hvc1"))
    val m1 = Multimodal.videoMetadata(Seq(MediaRow(9, mp4v1, "mp4")).toDS())
      .collect().head
    assert(m1.duration_sec == 1.5 && m1.codecs == Seq("hvc1"))
  }

  test("C12 REAL video pixels: MJPEG-in-AVI frames decode and match the encoder's input") {
    import java.awt.image.BufferedImage
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("ISO-8859-1") ++ body)
    def jpegFrame(rgb: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // encoder's input: solid red, solid green, mid-gray
    val frames = Seq(jpegFrame(0xFF0000), jpegFrame(0x00FF00), jpegFrame(0x808080))
    val body = list("hdrl", chunk("avih", new Array[Byte](56))) ++
      list("movi", frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val avi = "RIFF".getBytes("ISO-8859-1") ++ le32(body.length + 4) ++
      "AVI ".getBytes("ISO-8859-1") ++ body
    // a non-JPEG codec chunk must be skipped, not decoded or crashed on
    val aviAlien = "RIFF".getBytes("ISO-8859-1") ++ le32(100) ++
      "AVI ".getBytes("ISO-8859-1") ++
      list("movi", chunk("00dc", Array.tabulate(40)(_.toByte)))
    val ds = Seq(
      MediaRow(1L, avi, "avi"),
      MediaRow(2L, aviAlien, "avi"),
      MediaRow(3L, Array.tabulate(64)(_.toByte), "bin")).toDS()
    val out = Multimodal.videoFrameStats(ds).collect()
    assert(out.forall(_.media_id == 1L), s"only the MJPEG AVI decodes: $out")
    val byFrame = out.sortBy(_.frame_no)
    assert(byFrame.map(_.frame_no).sameElements(Array(0, 1, 2)))
    assert(byFrame.forall(f => f.width == 32 && f.height == 24))
    // JPEG is lossy but a solid color survives within tight bounds
    val red = byFrame(0); val green = byFrame(1); val gray = byFrame(2)
    assert(red.mean_r > 0.8f && red.mean_g < 0.2f && red.mean_b < 0.2f, red)
    assert(green.mean_g > 0.8f && green.mean_r < 0.35f && green.mean_b < 0.2f, green)
    assert(math.abs(gray.mean_gray - 128f / 255f) < 0.05f, gray)
    // determinism + maxFrames cap
    val out2 = Multimodal.videoFrameStats(ds).collect().sortBy(_.frame_no)
    assert(out2.map(_.mean_r).sameElements(byFrame.map(_.mean_r)))
    assert(Multimodal.videoFrameStats(ds, maxFrames = 2).collect().length == 2)
  }

  test("C12 REAL video pixels: uncompressed DIB-in-AVI frames decode EXACTLY (no codec)") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("ISO-8859-1") ++ body)
    // encoder: BI_RGB bottom-up BGR rows padded to 4 bytes (w=5 -> 15
    // data bytes + 1 pad per row at 24bpp, so padding is exercised)
    val w = 5; val h = 3
    def dibFrame(r: Int, g: Int, b: Int): Array[Byte] = {
      val rowBytes = (w * 3 + 3) & ~3
      val f = new Array[Byte](rowBytes * h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = y * rowBytes + x * 3
        f(p) = b.toByte; f(p + 1) = g.toByte; f(p + 2) = r.toByte
      }
      f
    }
    def bih(compression: Int, bpp: Int = 24, height: Int = h) =
      le32(40) ++ le32(w) ++ le32(height) ++ le16(1) ++ le16(bpp) ++
        le32(compression) ++ new Array[Byte](20)
    def avi(strf: Array[Byte], frames: Seq[Array[Byte]]): Array[Byte] = {
      val strl = list("strl",
        chunk("strh", "vids".getBytes("ISO-8859-1") ++ new Array[Byte](52)) ++
          chunk("strf", strf))
      val body = list("hdrl", chunk("avih", new Array[Byte](56)) ++ strl) ++
        list("movi", frames.map(f => chunk("00db", f)).reduce(_ ++ _))
      "RIFF".getBytes("ISO-8859-1") ++ le32(body.length + 4) ++
        "AVI ".getBytes("ISO-8859-1") ++ body
    }
    val rgbAvi = avi(bih(0), Seq(dibFrame(255, 0, 0), dibFrame(0, 128, 0), dibFrame(10, 20, 30)))
    val out = Multimodal.videoFrameStats(Seq(Multimodal.MediaRow(1L, rgbAvi, "avi")).toDS())
      .collect().sortBy(_.frame_no)
    assert(out.length == 3 && out.forall(f => f.width == w && f.height == h), out.toSeq)
    // raw pixels: stats are EXACT, not lossy-codec-approximate
    assert(out(0).mean_r == 1.0f && out(0).mean_g == 0.0f && out(0).mean_b == 0.0f, out(0))
    assert(out(1).mean_g == 128f / 255f && out(1).mean_r == 0.0f, out(1))
    assert(out(2).mean_r == 10f / 255f && out(2).mean_g == 20f / 255f &&
      out(2).mean_b == 30f / 255f, out(2))
    assert(out(2).mean_gray == (10f + 20f + 30f) / (3 * 255f), out(2))
    // top-down (negative biHeight) carries the same means
    val topDown = avi(bih(0, height = -h), Seq(dibFrame(10, 20, 30)))
    val td = Multimodal.videoFrameStats(Seq(Multimodal.MediaRow(2L, topDown, "avi")).toDS())
      .collect().head
    assert(td.mean_r == 10f / 255f && td.height == h, td)
    // a geometry-SHORT frame yields no row, never a partial sum
    val short = avi(bih(0), Seq(dibFrame(1, 2, 3).take(10)))
    assert(Multimodal.videoFrameStats(Seq(Multimodal.MediaRow(3L, short, "avi")).toDS())
      .collect().isEmpty)
    // a compressed fourcc in strf (MJPG) must NOT take the DIB path:
    // raw-looking frames are skipped, not misread as pixels
    val mjpgTagged = avi(bih(0x47504A4D), Seq(dibFrame(9, 9, 9)))
    assert(Multimodal.videoFrameStats(Seq(Multimodal.MediaRow(4L, mjpgTagged, "avi")).toDS())
      .collect().isEmpty)
    // adversarial geometry: biWidth = 2^29 at 32bpp wraps a 32-bit
    // stride multiply negative — the decoder must skip (no rows), never
    // index out of bounds and fail the partition
    val hostile = "RIFF".getBytes("ISO-8859-1") ++ le32(200) ++
      "AVI ".getBytes("ISO-8859-1") ++
      list("hdrl", chunk("avih", new Array[Byte](56)) ++
        list("strl",
          chunk("strh", "vids".getBytes("ISO-8859-1") ++ new Array[Byte](52)) ++
          chunk("strf", le32(40) ++ le32(0x20000000) ++ le32(1) ++ le16(1) ++
            le16(32) ++ le32(0) ++ new Array[Byte](20)))) ++
      list("movi", chunk("00db", new Array[Byte](64)))
    assert(Multimodal.videoFrameStats(Seq(Multimodal.MediaRow(5L, hostile, "avi")).toDS())
      .collect().isEmpty, "hostile width must yield no rows, not a crash")
  }

  test("C12 adversarial: 300k-deep nested LISTs neither overflow the stack nor lose the frame") {
    import java.awt.image.BufferedImage
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val bos0 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos0)
    val jpeg0 = bos0.toByteArray
    val jpeg = if (jpeg0.length % 2 == 0) jpeg0 else jpeg0 :+ 0.toByte // keep sizes even: no pad bytes to track
    // 12 bytes per nesting level (LIST header + type fourcc), so a
    // ~3.6 MB blob nests 300k deep — far past any JVM call stack. The
    // old recursive walk died here with StackOverflowError (an Error,
    // so the malformed-bytes Exception handler could not contain it);
    // the iterative walk must still find the innermost frame. Sizes
    // are computable inner-out (each level adds 12), so the blob is
    // written in one linear pass instead of O(n^2) re-wrapping.
    val depth = 300000
    val frameChunk = "00dc".getBytes("ISO-8859-1") ++ le32(jpeg.length) ++ jpeg
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes("ISO-8859-1"))
    bos.write(le32(4 + 12 * depth + frameChunk.length))
    bos.write("AVI ".getBytes("ISO-8859-1"))
    var k = depth
    while (k >= 1) { // size of level k counted from the innermost = 4 + frame + 12*(k-1)
      bos.write("LIST".getBytes("ISO-8859-1"))
      bos.write(le32(4 + frameChunk.length + 12 * (k - 1)))
      bos.write("movi".getBytes("ISO-8859-1"))
      k -= 1
    }
    bos.write(frameChunk)
    val deepAvi = bos.toByteArray
    val out = Multimodal.videoFrameStats(Seq(MediaRow(7L, deepAvi, "avi")).toDS()).collect()
    assert(out.length == 1 && out.head.width == 8 && out.head.height == 8, out.toSeq)
    // and a deep nest whose innermost size lies past the buffer edge
    // still yields no rows, no failure
    val broken = deepAvi.clone()
    val lastSizeOff = 12 + 12 * (depth - 1) + 4
    le32(Int.MaxValue).copyToArray(broken, lastSizeOff)
    assert(Multimodal.videoFrameStats(Seq(MediaRow(8L, broken, "avi")).toDS()).collect().isEmpty)
  }

  test("C12 synthMp4 fixture round-trips through the box walker (both mvhd layouts)") {
    // id=2: v0 mvhd, duration 3 s, 3 traks with codecs (2,3,4)%3
    val m2 = Multimodal.parseMp4Meta(2L, Multimodal.synthMp4(2L))
    assert(m2.container == "mp4" && m2.major_brand == "isom")
    assert(m2.duration_sec == 3.0 && m2.n_tracks == 3)
    assert(m2.codecs == Seq("mp4v", "avc1", "hvc1"))
    // id=3: v1 mvhd (64-bit duration), 1 trak, codec (3+0)%3 = avc1
    val m3 = Multimodal.parseMp4Meta(3L, Multimodal.synthMp4(3L))
    assert(m3.duration_sec == 4.0 && m3.n_tracks == 1)
    assert(m3.codecs == Seq("avc1"))
    // id=0: the corrupt plant (0 % 97 == 0) truncates to 8 bytes
    val m0 = Multimodal.parseMp4Meta(0L, Multimodal.synthMp4(0L))
    assert(m0.container == "unknown" && m0.n_tracks == 0 && m0.duration_sec == -1.0)
  }
}
