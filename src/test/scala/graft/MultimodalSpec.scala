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

  test("C12 feature table joins metadata with features") {
    val t = Multimodal.featureTable(rows())
    assert(t.count() == 3)
    assert(t.columns.toSet == Set("media_id", "n_bytes", "content_hash", "format", "features"))
  }
}
