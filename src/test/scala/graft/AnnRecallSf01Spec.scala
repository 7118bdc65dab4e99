package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The AnnRecallSpec study at sf0.1 (≈47k candidates vs sf0.001's 470)
  * — the confidence-interval upgrade round 4 asked for: the same
  * monotonicity structure, with floors pinned to the larger corpus's
  * measured curve (recorded in SURVEY §5). The tuning rule under test:
  * size nPlanes ≈ log2(corpus / wanted-candidates-per-probe) FIRST,
  * then spend probeBits. */
class AnnRecallSf01Spec extends SparkSpec {

  private val K = 10
  private val NQueries = 30
  private val Sf01 = "/root/testdata/sf0.1"

  private lazy val emb = spark.read.parquet(s"$Sf01/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < NQueries)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
  private lazy val corpus = emb.filter(col("vec_id") >= NQueries)
    .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))

  private lazy val truth: Map[Long, Set[Long]] =
    Similarity.bruteTopK(queries, corpus, k = K).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallOf(approx: Array[org.apache.spark.sql.Row]): Double = {
    val byQ = approx.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    truth.map { case (q, t) =>
      (t & byQ.getOrElse(q, Set.empty)).size.toDouble / t.size
    }.sum / truth.size
  }

  private def lshRecall(nPlanes: Int, probeBits: Int): Double =
    recallOf(Similarity.lshTopK(queries, corpus, k = K,
      nPlanes = nPlanes, dim = 64, probeBits = probeBits).collect())

  test("sf0.1 C6 recall@10: probing recovers recall monotonically at 47k candidates") {
    val r = (0 to 2).map(b => b -> lshRecall(nPlanes = 12, probeBits = b)).toMap
    info(f"sf0.1 recall@10, nPlanes=12: probe0=${r(0)}%.3f probe1=${r(1)}%.3f probe2=${r(2)}%.3f")
    assert(r(0) <= r(1) + 1e-12 && r(1) <= r(2) + 1e-12,
      s"recall must be non-decreasing in probeBits: $r")
    // measured: probe0 0.003, probe1 0.023, probe2 0.097 — the same
    // "too-fine tables need probes" lesson as sf0.001, now at 47k
    assert(r(2) >= 0.08, s"probe2 recall ${r(2)} below floor")
    assert(r(2) > r(0), s"probing must actually add recall at this scale: $r")
  }

  test("sf0.1 C6 recall@10: the nPlanes tuning rule holds at 100x the corpus") {
    // 47k candidates: 2^8 buckets ≈ 180/bucket, 2^12 ≈ 11/bucket,
    // 2^16 ≈ 0.7/bucket — recall must fall as buckets overshoot the
    // corpus, same shape the sf0.001 curve pinned at 470 candidates.
    val r8 = lshRecall(nPlanes = 8, probeBits = 1)
    val r12 = lshRecall(nPlanes = 12, probeBits = 1)
    val r16 = lshRecall(nPlanes = 16, probeBits = 1)
    info(f"sf0.1 recall@10 probe1: nPlanes=8 $r8%.3f, nPlanes=12 $r12%.3f, nPlanes=16 $r16%.3f")
    assert(r8 > r12 && r12 > r16,
      s"recall must fall with finer buckets: $r8, $r12, $r16")
    // measured: 0.107 / 0.023 / 0.003
    assert(r8 >= 0.09, s"nPlanes=8 probe1 recall $r8 below floor")
  }

  /** geometric labels via one Voronoi round over 10 seed vectors —
    * same bootstrap as the sf0.001 study. */
  private lazy val geoCorpus = {
    val seedsLong = corpus.filter(col("cand_id") < NQueries + 10)
      .select((col("cand_id") - NQueries).cast("int").as("label"),
        posexplode(col("cv")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"), col("v").cast("double").as("centroid"))
    val labeled = Similarity.ivfAssign(
        corpus.select(col("cand_id").as("query_id"), col("cv").as("qv")), seedsLong)
      .select(col("query_id").as("cand_id"), col("label"))
    corpus.join(labeled, "cand_id")
  }

  test("sf0.1 C15b ivfTopK: nprobe recall curve is monotone and exact at nprobe=#cells") {
    val centroids = Similarity.ivfCentroids(geoCorpus, "cv", "label")
    def recallAt(nprobe: Int): Double =
      recallOf(Similarity.ivfTopK(queries, geoCorpus, centroids, k = K,
        nprobe = nprobe).collect())
    val r = Seq(1, 2, 4, 10).map(np => np -> recallAt(np)).toMap
    info(f"sf0.1 ivf recall@10 (10 cells): nprobe1=${r(1)}%.3f " +
      f"nprobe2=${r(2)}%.3f nprobe4=${r(4)}%.3f nprobe10=${r(10)}%.3f")
    assert(r(1) <= r(2) + 1e-12 && r(2) <= r(4) + 1e-12 && r(4) <= r(10) + 1e-12, r)
    assert(r(10) == 1.0, s"nprobe=#cells must be exact, got ${r(10)}")
    // measured: 0.157 / 0.353 / 0.557 / 1.000
    assert(r(4) >= 0.45, s"nprobe=4 recall ${r(4)} below floor")
  }
}
