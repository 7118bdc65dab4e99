package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Recall evidence for the approximate similarity paths (SURVEY §5):
  * recall@k of lshTopK against bruteTopK ground truth across
  * (nPlanes, probeBits) settings, and ivfAssign's cluster hit-rate —
  * the curves a user tunes nPlanes/probeBits against. Floors asserted
  * here are just under the measured values on the deterministic
  * sf0.001 embeddings (recorded in SURVEY §5), so a regression in the
  * bucketing/probing logic trips the spec, not just the numbers.
  */
class AnnRecallSpec extends SparkSpec {

  private val K = 10
  private val NQueries = 30

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < NQueries)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
  private lazy val corpus = emb.filter(col("vec_id") >= NQueries)
    .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("label"))

  private lazy val truth: Map[Long, Set[Long]] =
    Similarity.bruteTopK(queries, corpus.drop("label"), k = K).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def lshRecall(nPlanes: Int, probeBits: Int): Double = {
    val approx = Similarity.lshTopK(queries, corpus.drop("label"), k = K,
        nPlanes = nPlanes, dim = 64, probeBits = probeBits).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    truth.map { case (q, t) =>
      (t & approx.getOrElse(q, Set.empty)).size.toDouble / t.size
    }.sum / truth.size
  }

  test("C6 recall@10 curve: probing more buckets monotonically recovers recall") {
    // candidates(probeBits=b) is a subset of candidates(b+1), so recall
    // is non-decreasing in probeBits BY CONSTRUCTION — assert both the
    // structure and the measured floors a tuner would rely on.
    // Measured on sf0.001 (470 candidates, 2^8 buckets ≈ 2/bucket):
    // probe0 0.027, probe1 0.107, probe2 0.303 — a too-fine table needs
    // probes to recover anything, which is exactly the curve's lesson.
    val r = (0 to 2).map(b => b -> lshRecall(nPlanes = 8, probeBits = b)).toMap
    info(f"recall@10, nPlanes=8: probe0=${r(0)}%.3f probe1=${r(1)}%.3f probe2=${r(2)}%.3f")
    assert(r(0) <= r(1) + 1e-12 && r(1) <= r(2) + 1e-12,
      s"recall must be non-decreasing in probeBits: $r")
    assert(r(1) >= 0.08, s"probe1 recall ${r(1)} below floor")
    assert(r(2) >= 0.25, s"probe2 recall ${r(2)} below floor")
  }

  test("C6 recall@10: bucket granularity must track corpus size (the tuning rule)") {
    // 470 candidates: 2^4 buckets ≈ 30/bucket is the right order of
    // magnitude; 2^12 is ~0.1/bucket and recalls almost nothing. The
    // spec pins the sf0.001-measured curve (4-plane 0.453, 6-plane
    // 0.217, 12-plane 0.023 at probe1) that says: size nPlanes ≈
    // log2(corpus / wanted-candidates-per-probe), then spend probeBits.
    val coarse4 = lshRecall(nPlanes = 4, probeBits = 1)
    val coarse6 = lshRecall(nPlanes = 6, probeBits = 1)
    val fine12 = lshRecall(nPlanes = 12, probeBits = 1)
    info(f"recall@10 probe1: nPlanes=4 $coarse4%.3f, nPlanes=6 $coarse6%.3f, nPlanes=12 $fine12%.3f")
    assert(coarse4 > coarse6 && coarse6 > fine12,
      s"expected recall to fall with finer buckets: $coarse4, $coarse6, $fine12")
    assert(coarse4 >= 0.4, s"nPlanes=4 probe1 recall $coarse4 below floor")
  }

  /** assign every corpus vector to its nearest of the 10 seed vectors
    * (cand_id NQueries..NQueries+9) — one Voronoi bootstrap round that
    * gives the corpus GEOMETRIC cluster labels. The table's own `label`
    * column is a uniform synthetic partition (same-label mean cosine
    * ≈ 0.004 ≈ unrelated), useless as an IVF structure — measured here
    * as the chance baseline the geometric labels must beat. */
  private def geometricLabels = {
    val seedsLong = corpus.filter(col("cand_id") < NQueries + 10)
      .select((col("cand_id") - NQueries).cast("int").as("label"),
        posexplode(col("cv")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"), col("v").cast("double").as("centroid"))
    Similarity.ivfAssign(
        corpus.select(col("cand_id").as("query_id"), col("cv").as("qv")), seedsLong)
      .select(col("query_id").as("cand_id"), col("label"))
  }

  private def top1HitRate(labeled: org.apache.spark.sql.DataFrame): Double = {
    val centroids = Similarity.ivfCentroids(
      corpus.join(labeled.withColumnRenamed("label", "_l"), "cand_id"), "cv", "_l")
      .withColumnRenamed("_l", "label")
    val assigned = Similarity.ivfAssign(queries, centroids).collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("label").longValue).toMap
    val labelOf = labeled.collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("label").longValue).toMap
    val top1 = Similarity.bruteTopK(queries, corpus.drop("label"), k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    top1.count { case (q, cand) => assigned(q) == labelOf(cand) }.toDouble / top1.size
  }

  test("C15 ivfAssign hit-rate: geometric clusters hold the true top-1 3x more than chance") {
    val geo = top1HitRate(geometricLabels)
    val rand = top1HitRate(corpus.select(col("cand_id"), col("label")))
    info(f"ivfAssign top-1 cluster hit-rate: geometric $geo%.3f vs random-label $rand%.3f")
    // measured on sf0.001: geometric 0.300, random labels 0.167
    // (10-cell chance is 0.1; the small excess is finite-sample). The
    // corpus is largely isotropic, so 0.30 with 1 of 10 cells probed
    // IS the signal: assignment recovers what geometric structure
    // exists (planted near-dups), random partitions stay near chance.
    assert(geo >= 0.2, s"geometric cluster hit-rate $geo below floor")
    assert(geo >= rand + 0.1, s"geometric ($geo) must beat random labels ($rand)")
  }

  test("C14+C15 ivfTopK end-to-end: every returned neighbor is in the assigned cluster") {
    val centroids = Similarity.ivfCentroids(emb, "embedding", "label")
    val assigned = Similarity.ivfAssign(queries, centroids).collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("label").longValue).toMap
    val labelOf = corpus.select(col("cand_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("label").longValue).toMap
    val out = Similarity.ivfTopK(queries, corpus, centroids, k = K).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(labelOf(r.getLong(1)) == assigned(r.getLong(0)),
        s"query ${r.getLong(0)} returned a neighbor outside its posting list")
    }
    // and within the probed list the ranking is exact: top-1 of ivfTopK
    // equals brute top-1 whenever brute top-1 lives in the assigned cluster
    val top1 = Similarity.bruteTopK(queries, corpus.drop("label"), k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivfTop1 = out.filter(_.getLong(3) == 1L).map(r => r.getLong(0) -> r.getLong(1)).toMap
    top1.foreach { case (q, cand) =>
      if (labelOf(cand) == assigned(q))
        assert(ivfTop1(q) == cand, s"query $q: ivf top-1 ${ivfTop1(q)} != brute $cand")
    }
  }

  test("C15b ivfTopK multi-probe: recall@10 grows monotonically with nprobe") {
    val labeled = geometricLabels
    val geoCorpus = corpus.drop("label")
      .join(labeled.withColumnRenamed("label", "_l"), "cand_id")
    val centroids = Similarity.ivfCentroids(geoCorpus, "cv", "_l")
      .withColumnRenamed("_l", "label")
    val corpusL = geoCorpus.withColumnRenamed("_l", "label")
    def recallAt(nprobe: Int): Double = {
      val approx = Similarity.ivfTopK(queries, corpusL, centroids, k = K,
          nprobe = nprobe).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      truth.map { case (q, t) =>
        (t & approx.getOrElse(q, Set.empty)).size.toDouble / t.size
      }.sum / truth.size
    }
    val r = Seq(1, 2, 4, 10).map(np => np -> recallAt(np)).toMap
    info(f"ivf recall@10 (10 geometric cells): nprobe1=${r(1)}%.3f " +
      f"nprobe2=${r(2)}%.3f nprobe4=${r(4)}%.3f nprobe10=${r(10)}%.3f")
    // probing more cells is a candidate superset -> monotone by construction
    assert(r(1) <= r(2) + 1e-12 && r(2) <= r(4) + 1e-12 && r(4) <= r(10) + 1e-12, r)
    // probing ALL 10 cells IS brute force
    assert(r(10) == 1.0, s"nprobe=#cells must be exact, got ${r(10)}")
    assert(r(4) >= 0.5, s"nprobe=4 recall ${r(4)} below floor")
  }

  /** mean cosine of every corpus vector to its assigned centroid —
    * the k-means objective (higher = lower quantization error). */
  private def meanAssignedSim(labeled: org.apache.spark.sql.DataFrame): Double = {
    val centroids = Similarity.ivfCentroids(
      corpus.join(labeled.withColumnRenamed("label", "_l"), "cand_id"), "cv", "_l")
      .withColumnRenamed("_l", "label")
    Similarity.ivfAssign(
        corpus.select(col("cand_id").as("query_id"), col("cv").as("qv")), centroids)
      .agg(avg(col("sim"))).collect().head.getDouble(0)
  }

  test("C14 kmeansFit: converges, improves on raw Voronoi seeds, feeds ivfTopK") {
    // maxIter 30: the best-objective k-means++ draw needs ~12 rounds to
    // reach its fixpoint on this corpus (lowid converged inside 10)
    val labeled = Similarity.kmeansFit(
      corpus.drop("label").withColumnRenamed("cv", "embedding"),
      "cand_id", "embedding", k = 10, maxIter = 30, restarts = 4)
    val labelOf = labeled.collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    assert(labelOf.size == 470 && labelOf.values.forall(l => l >= 0 && l < 10))
    // fixpoint: assigning against the fitted centroids changes nothing
    val corpusL = corpus.drop("label")
      .join(labeled.withColumnRenamed("cand_id", "cand_id"), "cand_id")
    val centroids = Similarity.ivfCentroids(corpusL, "cv", "label")
    val reassigned = Similarity.ivfAssign(
        corpus.drop("label").select(col("cand_id").as("query_id"),
          col("cv").as("qv")), centroids).collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("label").longValue).toMap
    assert(reassigned == labelOf, "kmeansFit did not reach a fixpoint")
    // quality 1 — the objective: best-of-4 k-means++ must beat the
    // lowest-id seeding on quantization (measured 0.2983 vs 0.2890;
    // every single kpp salt beat lowid here, the floor guards the pick)
    val objKpp = meanAssignedSim(labeled)
    val objLow = meanAssignedSim(Similarity.kmeansFit(
      corpus.drop("label").withColumnRenamed("cv", "embedding"),
      "cand_id", "embedding", k = 10, maxIter = 10, init = "lowid"))
    info(f"kmeans objective: kpp-best $objKpp%.4f vs lowid $objLow%.4f")
    assert(objKpp >= objLow, f"kpp objective $objKpp%.4f below lowid $objLow%.4f")
    // quality 2 — the fitted cells hold the true top-1 at least as
    // often as the one-round Voronoi bootstrap (0.300) and the round-4
    // lowid fit (0.367); measured 0.367 for the best-objective fit
    // (the hit-rate itself is a 30-query sample: kpp salts span
    // 0.167–0.467 at near-identical objectives)
    val rate = top1HitRate(labeled.withColumnRenamed("cand_id", "cand_id"))
    info(f"kmeans top-1 cluster hit-rate: $rate%.3f")
    assert(rate >= 0.36, s"kmeans hit-rate $rate below floor")
  }

  test("C14 k-means++ vs lowest-id seeding on a cluster-sorted corpus") {
    import spark.implicits._
    // three orthogonal clusters, ids SORTED BY CLUSTER — the adversarial
    // ordering for lowest-id seeding (every seed lands in cluster 0)
    val dim = 8
    def point(cluster: Int, j: Int): Seq[Float] = {
      val base = Array.fill(dim)(0.05f * (((cluster * 31 + j * 7) % 5) - 2))
      base(cluster) = 1.0f
      base.toSeq
    }
    val rows = for (c <- 0 until 3; j <- 0 until 20)
      yield ((c * 20 + j).toLong, point(c, j))
    val vecs = rows.toDF("vec_id", "embedding")
    def purity(fit: org.apache.spark.sql.DataFrame): Double = {
      val m = fit.collect().map(r => r.getLong(0) -> r.getAs[Number](1).intValue)
      m.groupBy(_._2).values
        .map(g => g.groupBy(t => t._1 / 20).values.map(_.size).max).sum.toDouble / m.length
    }
    val kpp = purity(Similarity.kmeansFit(vecs, "vec_id", "embedding", k = 3,
      maxIter = 10, restarts = 4))
    val low = purity(Similarity.kmeansFit(vecs, "vec_id", "embedding", k = 3,
      maxIter = 10, init = "lowid"))
    info(f"cluster-sorted fixture purity: kpp $kpp%.3f vs lowid $low%.3f")
    // kpp spreads seeds across the clusters and recovers the partition;
    // lowid starts all seeds inside cluster 0 and sticks in a local
    // optimum that splits it while merging the other two
    assert(kpp >= 0.99, s"kpp purity $kpp")
    assert(kpp >= low + 0.15, s"kpp ($kpp) must measurably beat lowid ($low)")
  }

  test("C14 an emptied cluster reseeds to the farthest point instead of dying") {
    import spark.implicits._
    // ids 0 and 1 are IDENTICAL vectors: with lowest-id seeding both
    // seed a cell, every vector tie-breaks to the lower label, and cell
    // 1 is empty from round one — the degeneracy round 4 documented
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.1f)),
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.1f)),
      (5L, Seq(0.1f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val fit = Similarity.kmeansFit(vecs, "vec_id", "embedding", k = 3,
      maxIter = 10, init = "lowid")
    val labels = fit.collect().map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
    assert(labels.values.toSet.size == 3,
      s"expected all 3 cells populated after reseed, got $labels")
    // the duplicate pair stays together; each remaining cell is one of
    // the two true clusters
    assert(labels(0L) == labels(1L))
    assert(labels(2L) == labels(3L) && labels(4L) == labels(5L))
    assert(labels(2L) != labels(4L))
  }

  test("C6 lshTopKWithIndex: a persisted bucket table serves queries identically") {
    // the daily-search shape: bucket the corpus once (round-trip
    // through parquet, as a real index would), serve batches against it
    val dir = tempDir("graft_lshidx")
    try {
      Similarity.lshBucketTable(corpus.drop("label"), nPlanes = 8, dim = 64)
        .write.parquet(s"$dir/index")
      val index = spark.read.parquet(s"$dir/index")
      val viaIndex = Similarity.lshTopKWithIndex(queries, index, k = K,
          nPlanes = 8, dim = 64, probeBits = 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val inline = Similarity.lshTopK(queries, corpus.drop("label"), k = K,
          nPlanes = 8, dim = 64, probeBits = 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(viaIndex == inline, "index-served top-k differs from the inline form")
      assert(viaIndex.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("probe enumeration is structural: choose(n, <=b), no 2^n scan, nPlanes > 24 works") {
    // equals the old filtered enumeration where that was feasible
    for (n <- Seq(4, 8, 16); b <- 0 to 3) {
      val filtered = (0L until (1L << n)).filter(f => java.lang.Long.bitCount(f) <= b).toSet
      assert(Similarity.hammingBallMasks(n, b).toSet == filtered, s"n=$n b=$b")
    }
    // sizes are binomial sums — generated directly, not filtered
    assert(Similarity.hammingBallMasks(32, 2).size == 1 + 32 + 32 * 31 / 2)
    assert(Similarity.hammingBallMasks(63, 1).size == 64)
    // the lifted guard: a 32-plane table plans and executes
    val rows = Similarity.lshTopK(queries, corpus.drop("label"), k = 3,
      nPlanes = 32, dim = 64, probeBits = 1).collect()
    assert(rows.forall(_.getLong(3) <= 3))
    // per-query probe budget stays bounded
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopK(queries, corpus.drop("label"), k = 3,
        nPlanes = 63, dim = 64, probeBits = 5)
    }
    assert(e.getMessage.contains("probe set"), e.getMessage)
  }
}
