package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.multimodal.{ImageHash, Multimodal}
import graft.multimodal.Multimodal.MediaRow

/** C51 — perceptual image hash + near-dup dedup: kernel correctness
  * against an independently-written reference, the perceptual claims
  * (robust to brightness touch-ups and JPEG re-encoding, far for
  * unrelated images), the banding's pigeonhole exhaustiveness boundary,
  * and the PNG encode→decode exactness the oracle depends on. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** independent dHash reference: per-cell pixel LISTS then mean —
    * different shape from the kernel's running sums. */
  private def refDHash(img: BufferedImage, gw: Int, gh: Int): Long = {
    val cols = gw + 1
    val cells = Array.fill(cols, gh)(List.empty[Long])
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      val gray = (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)) / 1000L
      cells(x * cols / img.getWidth)(y * gh / img.getHeight) ::= gray
    }
    val mean = cells.map(_.map(l => l.sum / l.size))
    (for (cy <- 0 until gh; cx <- 0 until gw if mean(cx)(cy) > mean(cx + 1)(cy))
      yield 1L << (cy * gw + cx)).foldLeft(0L)(_ | _)
  }

  private def randImage(seed: Long, w: Int, h: Int): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt(1 << 24))
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("C51 dHash kernel equals an independent reference, incl. non-divisible grids") {
    for ((w, h, seed) <- Seq((36, 28, 1L), (37, 29, 2L), (100, 40, 3L), (9, 7, 4L))) {
      val img = randImage(seed, w, h)
      assert(ImageHash.dHashPixels(img, 8, 7) == refDHash(img, 8, 7),
        s"kernel/reference disagree at ${w}x$h")
    }
  }

  test("C51 perceptual: brightness touch-up stays near, unrelated images far, JPEG re-encode near") {
    val base = randImage(7L, 64, 56)
    // touch up ONE 8x8 cell region's brightness by +25
    val touched = new BufferedImage(64, 56, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 56; x <- 0 until 64) {
      val p = base.getRGB(x, y)
      val boost = if (x < 7 && y < 8) 25 else 0
      def ch(v: Int) = math.min(255, v + boost)
      touched.setRGB(x, y,
        (ch((p >> 16) & 0xff) << 16) | (ch((p >> 8) & 0xff) << 8) | ch(p & 0xff))
    }
    val other = randImage(8L, 64, 56)
    val hb = ImageHash.dHashPixels(base, 8, 7)
    val ht = ImageHash.dHashPixels(touched, 8, 7)
    val ho = ImageHash.dHashPixels(other, 8, 7)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // one brightened cell flips at most its two adjacent comparisons
    assert(ham(hb, ht) <= 2, s"touch-up moved ${ham(hb, ht)} bits")
    assert(ham(hb, ho) > 6, s"unrelated images landed ${ham(hb, ho)} bits apart")
    // JPEG re-encode of the same pixels: lossy, but the gradient
    // signature survives (the reason dHash is the dedup fingerprint)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(base, "jpg", bos)
    val jpeg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    val hj = ImageHash.dHashPixels(jpeg, 8, 7)
    assert(ham(hb, hj) <= 6, s"JPEG re-encode moved ${ham(hb, hj)} bits")
  }

  test("C51 banding: exhaustive for hamming <= 6, declared boundary at 7") {
    // six flipped bits spread over six DIFFERENT bands — the worst case
    // for banding — must still surface as a candidate (band 7 matches)
    val a = 0x00FF00FF00FF00L // arbitrary 56-bit pattern
    val flip6 = (0 until 6).map(b => 1L << (b * 8 + 3)).foldLeft(0L)(_ ^ _)
    // seven flipped bits, one per band: no band agrees — the pigeonhole
    // guarantee ends exactly here, and the pair is (by design) missed
    val flip7 = (0 until 7).map(b => 1L << (b * 8 + 3)).foldLeft(0L)(_ ^ _)
    val hashes = Seq(
      (1L, a), (2L, a ^ flip6),   // hamming 6, bands all differ but one
      (3L, a ^ flip7)             // hamming 7 from id 1, every band differs
    ).toDF("media_id", "dhash")
    val pairs = ImageHash.nearDupPairs(hashes, maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "hamming-6 pair must be found (pigeonhole)")
    assert(!pairs.contains((1L, 3L)),
      "hamming-7 with one flip per band shares no band: the documented recall boundary")
  }

  test("C51 synth PNG roundtrip is exact and near-dup families behave") {
    // encode→decode must recover synthGray exactly (the oracle's premise)
    val id = 137L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageHash.synthPng(id)))
    for (y <- 0 until ImageHash.SynthH; x <- 0 until ImageHash.SynthW) {
      val p = img.getRGB(x, y)
      assert((p & 0xff) == ImageHash.synthGray(id, x, y),
        s"decode drift at ($x,$y)")
      assert(((p >> 16) & 0xff) == (p & 0xff), "achromatic pixel expected")
    }
    // same-base variants pair up; different bases don't (near-identical
    // generated images — the operator's actual dedup claim)
    // ids 0..239 = variants 0..2 of each base; plus variant 20 for ten
    // bases — variant 20 ≡ 1 (mod 19) renders pixels IDENTICAL to
    // variant 1, the hard guarantee to pin
    val ids = (0L until 240L) ++ (0L until 10L).map(_ + 80L * 20)
    val media = ids.map(i => MediaRow(i, ImageHash.synthPng(i), "png")).toDS()
    val pairs = ImageHash.nearDupPairs(ImageHash.dHash(media))
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.length >= 10, s"only ${pairs.length} near-dup pairs")
    assert(pairs.forall { case (x, y) => x % 80 == y % 80 },
      "all near-dup pairs share a base pattern")
    for (b <- 0L until 10L)
      assert(pairs.contains((b + 80L, b + 1600L)),
        s"base $b: identical-pixel variants 1 and 20 must pair (hamming 0)")
    // undecodable bytes vanish from dHash, not crash
    val junk = Seq(MediaRow(999L, Array[Byte](1, 2, 3), "png")).toDS()
    assert(ImageHash.dHash(junk).count() == 0)
  }
}
