package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Margin-based bitext mining: align documents across two corpora
  * (typically two languages embedded in one multilingual space) by the
  * RATIO-MARGIN criterion of Artetxe & Schwenk, "Margin-based Parallel
  * Corpus Mining with Multilingual Sentence Embeddings" (ACL 2019):
  * raw cosine is miscalibrated across queries (some regions of the
  * embedding space are uniformly hotter), so each candidate pair is
  * scored relative to its neighborhoods —
  *
  *   margin(x, y) = cos(x, y) / ((avgF(x) + avgB(y)) / 2)
  *
  * where avgF(x) is the mean similarity of x to its k nearest
  * targets and avgB(y) the mean of y to its k nearest sources. A pair
  * only survives if it stands OUT of both neighborhoods
  * (margin >= threshold), which kills hub vectors that are merely
  * near everything.
  *
  * Shape: one similarity table feeds everything — the forward top-k
  * averages (window per src), the backward top-k averages (window per
  * tgt), and the final best-target-per-source pick, so the pair scan
  * runs ONCE and is persisted across its three consumers.
  *
  * Scale: this form scores src × tgt exhaustively — right for a
  * candidate slice (a shard pair, a date partition, a pre-filtered
  * bucket). At corpus scale swap the exhaustive `sims` stage for an
  * ANN candidate generator (IVF probes, Similarity.ivfTopk, or the
  * LSH bucket join) emitting the same (src_id, tgt_id, sim) shape —
  * the margin algebra downstream is unchanged, and both windows
  * shuffle only candidate rows, never the cross product.
  *
  * Determinism: cosines round to 6 before any aggregate, and the k-NN
  * neighborhood sums stay EXACT decimals all the way into one final
  * cross-multiplied division —
  *
  *   margin = 2k * sim / (sumF + sumB)
  *
  * (algebraically identical to sim / ((sumF/k + sumB/k) / 2)). Never
  * round the /k means: a mean of round-6 terms over k=4 has exactly
  * 8 decimal digits, so its 7th digit lands on a decimal .5 boundary
  * STRUCTURALLY, where JVM shortest-repr HALF_UP and C-side binary
  * rounding disagree on the tie. The fixed divisor k also means sides
  * smaller than k dilute toward zero rather than renormalizing —
  * deterministic and oracle-reproducible either way.
  */
object BitextMine {

  /** Best target per source at margin >= `marginThreshold`, scored
    * exhaustively (the candidate-slice form).
    * Output: (src_id, tgt_id, sim, margin), one row per mined source.
    */
  def mine(src: DataFrame, tgt: DataFrame, idCol: String, vecCol: String,
           k: Int = 4, marginThreshold: Double = 1.1): DataFrame = {
    val a = src.select(col(idCol).cast("long").as("src_id"), col(vecCol).as("qv"))
    val b = tgt.select(col(idCol).cast("long").as("tgt_id"), col(vecCol).as("cv"))
    marginPick(
      a.crossJoin(b)
        .select(col("src_id"), col("tgt_id"),
          round(Vec.cosineFast(col("qv"), col("cv")), 6).as("sim")),
      k, marginThreshold)
  }

  /** The corpus-scale form: candidate pairs come from a shared-
    * hyperplane LSH bucket join (multi-probed on the source side, the
    * C6 discipline) instead of the cross product, and the SAME margin
    * algebra runs over the candidate sims — neighborhood sums are
    * taken over each id's retrieved candidates, exactly how
    * approximate margin mining runs over FAISS shortlists in practice.
    * Pair volume is bucket-local; nothing scales with |src| × |tgt|.
    */
  def mineAnn(src: DataFrame, tgt: DataFrame, idCol: String, vecCol: String,
              k: Int = 4, marginThreshold: Double = 1.1,
              nPlanes: Int = 8, dim: Int = 64, probeBits: Int = 1): DataFrame = {
    val planes = Vec.hyperplanes(nPlanes, dim)
    val flips = Similarity.hammingBallMasks(nPlanes, probeBits)
    val probes = array(flips.map(lit): _*)
    // The probe fan-out and the bucket join move 16-byte (id, bucket)
    // keys ONLY; the 8·dim-byte vectors attach once, after the
    // candidate pair set is fixed, via id-keyed dimension joins. The
    // previous shape exploded each source row ×|probes| WITH its
    // vector, so every probe replicated the payload through the bucket
    // exchange — measured 311 MB shuffled at the full-width bench
    // point vs ~60 MB for this shape (the §8 "decide with small rows,
    // attach payloads once" discipline; identical pair set and sims).
    val aVec = src.select(col(idCol).cast("long").as("src_id"), col(vecCol).as("qv"))
    val bVec = tgt.select(col(idCol).cast("long").as("tgt_id"), col(vecCol).as("cv"))
    val aKeys = aVec
      .withColumn("bucket0", Vec.lshBucket(col("qv"), planes))
      .select(col("src_id"),
        explode(transform(probes, f => col("bucket0").bitwiseXOR(f))).as("bucket"))
    val bKeys = bVec.select(col("tgt_id"), Vec.lshBucket(col("cv"), planes).as("bucket"))
    val sims = aKeys.join(bKeys, "bucket")
      // no pair dedup needed, by construction: a target carries exactly
      // ONE bucket and a source's probe set {bucket0 XOR f} is distinct
      // (the Hamming-ball masks are distinct), so a (src, tgt) pair can
      // match on at most one bucket — a dropDuplicates here would be a
      // full candidate-scale exchange that provably removes nothing
      .select(col("src_id"), col("tgt_id"))
      .join(aVec, "src_id")
      .join(bVec, "tgt_id")
      .select(col("src_id"), col("tgt_id"),
        round(Vec.cosineFast(col("qv"), col("cv")), 6).as("sim"))
    marginPick(sims, k, marginThreshold)
  }

  /** The margin algebra over any (src_id, tgt_id, sim round-6)
    * candidate table — shared by [[mine]] (exhaustive) and [[mineAnn]]
    * (LSH candidates); the input scan is persisted across its three
    * consumers. */
  def marginPick(candidateSims: DataFrame, k: Int,
                 marginThreshold: Double): DataFrame = {
    require(k >= 1, s"BitextMine: k must be >= 1, got $k")
    val sims = graft.util.CacheRegistry.register(candidateSims.persist())

    // BoundedTopK (graft_topk) instead of a row_number window (r15):
    // the window moved EVERY candidate row of a key to one task before
    // discarding all but k — two full candidate-table exchanges per
    // margin pass. The bounded aggregate keeps <= k entries per
    // partition map-side, so the exchange carries k-entry buffers, and
    // its (sim desc, id asc) order is exactly the window's, so the
    // kept set — hence the decimal sum — is bit-identical. The explode
    // + sum re-aggregates on the same key, reusing the partitioning.
    def topkSum(keyCol: String, tieCol: String, outCol: String): DataFrame =
      sims.groupBy(keyCol)
        .agg(call_function("graft_topk",
          struct(col("sim"), col(tieCol)), lit(k)).as("_top"))
        .select(col(keyCol), explode(col("_top")).as("_t"))
        .groupBy(keyCol)
        .agg(sum(col("_t.sim").cast("decimal(18,6)")).as(outCol))
    val fwd = topkSum("src_id", "tgt_id", "sum_f")
    val bwd = topkSum("tgt_id", "src_id", "sum_b")

    // the ratio margin is only meaningful over POSITIVE neighborhood
    // mass: with sumF+sumB <= 0 (anti-correlated regions, or all-zero
    // sims) the division inverts the ranking — the most dissimilar
    // target would win — and at exactly 0 the two engines diverge
    // (Spark Divide -> null, IEEE -> inf). Such pairs are unminable
    // by construction and drop here.
    val margins = sims.join(fwd, "src_id").join(bwd, "tgt_id")
      .filter((col("sum_f") + col("sum_b")).cast("double") > 0.0)
      .withColumn("margin",
        round((col("sim") * (2 * k)) /
          (col("sum_f") + col("sum_b")).cast("double"), 6))
    val wBest = Window.partitionBy("src_id")
      .orderBy(col("margin").desc, col("tgt_id"))
    margins.withColumn("_rn", row_number().over(wBest))
      .filter(col("_rn") === 1 && col("margin") >= marginThreshold)
      .select("src_id", "tgt_id", "sim", "margin")
  }
}
