package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.MediaRow

/** C51 — perceptual image hashing + near-dup image dedup.
  *
  * Closes the loop between C12's real decode path and the C-series
  * dedup machinery: images decode (ImageIO — the same genuinely-real
  * pixel path as `extractFeatures`) to a grayscale grid, hash to a
  * 56-bit dHash (difference hash: each bit is a brightness comparison
  * of horizontally adjacent downsampled cells — the standard
  * perceptual fingerprint that survives re-encoding, minor noise and
  * resizing), and near-duplicate pairs come out of the SAME
  * Hamming-banded candidate join the text simhash uses
  * ([[graft.operators.Dedup.simhashCandidates]]).
  *
  * Why dHash and 56 bits: gradient comparisons are cheap, robust, and
  * integer-exact (no DCT float seams a cross-engine oracle would trip
  * on); 8×7 comparison cells = 56 bits keeps every band shift inside a
  * BIGINT's non-sign bits on BOTH engines, mirroring the 60-bit md5
  * discipline of the text simhash oracle. 7 bands × 8 bits makes the
  * band join EXHAUSTIVE for hamming ≤ 6 (pigeonhole: 6 differing bits
  * cannot touch all 7 bands), so at the default threshold the banding
  * is a pure-recall candidate generator, not an approximation.
  *
  * Scale posture: decode + hash are map-only (mapPartitions kernel, no
  * shuffle); the corpus never moves — only 8-byte hashes shuffle into
  * the banded self-join, the identical posture to C3's text simhash.
  * At 100 TB of images the banded table is ~7 rows × 16 bytes per
  * image, and verification (exact hamming) runs inside the band
  * buckets.
  */
object ImageHash {

  /** Decode each image and compute its dHash over a `(gridW+1)×gridH`
    * area-averaged grayscale grid → (media_id, dhash) with
    * `gridW*gridH` bits (bit `cy*gridW+cx` set iff cell(cx,cy) is
    * brighter than cell(cx+1,cy)). Integer arithmetic throughout:
    * BT.601 gray `(299r+587g+114b)/1000` (exact identity on achromatic
    * pixels), cell boundaries by floor division, cell mean
    * `floor(sum/count)`. Undecodable bytes yield no row (the near-dup
    * question is meaningless for them; C12's featureTable is the
    * total-pipeline treatment). */
  def dHash(ds: Dataset[MediaRow], gridW: Int = 8, gridH: Int = 7): DataFrame = {
    require(gridW * gridH <= 62, s"dHash bits ${gridW * gridH} overflow a signed long's safe range")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          catch { case _: Exception => null }
        if (img == null || img.getWidth < gridW + 1 || img.getHeight < gridH) None
        else Some(r.media_id -> dHashPixels(img, gridW, gridH))
      }
    }.toDF("media_id", "dhash")
  }

  /** The decode-side kernel, exposed for spec-level determinism checks. */
  private[graft] def dHashPixels(img: java.awt.image.BufferedImage,
                                      gridW: Int, gridH: Int): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cols = gridW + 1
    // cell (cx, cy) covers x in [cx*w/cols, (cx+1)*w/cols) — floor
    // boundaries, every pixel in exactly one cell
    val cell = Array.ofDim[Long](cols, gridH)
    val cnt = Array.ofDim[Long](cols, gridH)
    var y = 0
    while (y < h) {
      val cy = y * gridH / h
      var x = 0
      while (x < w) {
        val cx = x * cols / w
        val p = img.getRGB(x, y)
        val gray = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
        cell(cx)(cy) += gray
        cnt(cx)(cy) += 1
        x += 1
      }
      y += 1
    }
    var sh = 0L
    var cy = 0
    while (cy < gridH) {
      var cx = 0
      while (cx < gridW) {
        val l = cell(cx)(cy) / cnt(cx)(cy)
        val r = cell(cx + 1)(cy) / cnt(cx + 1)(cy)
        if (l > r) sh |= 1L << (cy * gridW + cx)
        cx += 1
      }
      cy += 1
    }
    sh
  }

  /** Near-duplicate image pairs from a (id, hash) table: band the hash
    * into `bands` equal slices, candidate-join on (band, key), verify
    * exact hamming ≤ `maxHamming` — [[graft.operators.Dedup]]'s
    * simhash candidate machinery applied to perceptual hashes.
    * Exhaustive when `bands > maxHamming`. Output (id_a < id_b,
    * hamming). */
  def nearDupPairs(hashes: DataFrame, idCol: String = "media_id",
                   hashCol: String = "dhash", maxHamming: Int = 6,
                   bits: Int = 56, bands: Int = 7): DataFrame = {
    require(bits % bands == 0, s"$bits bits do not band evenly into $bands")
    val w = bits / bands
    val mask = (1L << w) - 1
    val banded = graft.util.CacheRegistry.register(
      hashes.select(col(idCol), col(hashCol).as("sh"),
          posexplode(array((0 until bands).map(b =>
            shiftright(col(hashCol), b * w).bitwiseAND(mask)): _*))
            .as(Seq("band", "key")))
        .persist()) // one hash table feeds both join sides (simhashPairs discipline)
    graft.operators.Dedup.simhashCandidates(banded, banded, idCol, maxHamming,
      symmetric = true)
  }

  // ---- oracle-matched demo: synthetic image corpus from documents ----

  /** Deterministic synthetic gray value for image `id` at pixel (x, y)
    * — the SQL-expressible pattern the DuckDB oracle regenerates
    * verbatim (all integer arithmetic, no wrap: max intermediate
    * ~8e9 < 2^63). 80 base patterns; each id renders its base with a
    * variant perturbation that brightens a few 4×4 cells, so same-base
    * images are near-dups (few dHash bits apart) and different bases
    * are far. Per-pixel wiggle exercises the area-average (cells are
    * NOT constant), but cancels identically on both engines because
    * the mean is floor(sum/16) of the same integers. */
  private[graft] def synthGray(id: Long, x: Int, y: Int): Int = {
    val base = id % 80
    val variant = id / 80
    val cx = x / 4; val cy = y / 4
    // quadratic mod-prime mix: a LINEAR cell pattern makes adjacent-cell
    // comparisons an arithmetic progression's sign sequence — unrelated
    // bases then collide within the hamming threshold (measured: 4,088
    // cross-base pairs at 500 images). Squaring decorrelates bases
    // (cross-base pairs: 0) while staying integer-exact in DuckDB
    // (t ≤ ~5.6e5, t² ≤ ~3.2e11 — no BIGINT wrap).
    val t = base * 5741L + cx * 7919L + cy * 6007L
    val v0 = (t * t % 100019L % 249L).toInt
    val v = if (variant > 0 && (cx * 7 + cy * 11 + variant * 5) % 19 == 0) (v0 + 120) % 249
            else v0
    v + ((x * 5 + y * 3) % 8)
  }

  private[graft] val SynthW = 36 // 9 cells × 4 px
  private[graft] val SynthH = 28 // 7 cells × 4 px

  /** Render `id`'s synthetic pattern as a REAL RGB PNG (achromatic
    * pixels, so BT.601 gray recovers `synthGray` exactly — PNG is
    * lossless). The encode→decode roundtrip is the point: the demo's
    * hashes only match the oracle if the pixel path decodes exactly. */
  private[graft] def synthPng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(SynthW, SynthH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < SynthH) {
      var x = 0
      while (x < SynthW) {
        val v = synthGray(id, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** C51 demo: one synthetic PNG per document id → encode → REAL
    * decode → dHash → banded near-dup join. The oracle regenerates the
    * same grays relationally and must land on identical pairs. */
  def imagePhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(id => MediaRow(id, synthPng(id), "png"))
      }
    nearDupPairs(dHash(media), maxHamming = 6)
      .orderBy("id_a", "id_b")
  }
}
