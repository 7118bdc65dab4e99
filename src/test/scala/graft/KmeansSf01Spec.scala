package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** kmeansFit at sf0.1 (≈47k vectors): the fitted IVF structure at 100×
  * the original study — self-trained labels must beat the one-round
  * Voronoi bootstrap on the quantization objective, and the fitted
  * nprobe curve must keep the monotone shape. Numbers recorded in
  * SURVEY §5. */
class KmeansSf01Spec extends SparkSpec {

  private val K = 10
  private val NQueries = 30
  private val Sf01 = "/root/testdata/sf0.1"

  test("sf0.1 kmeansFit: objective beats the Voronoi bootstrap; fitted nprobe curve is monotone") {
    val emb = spark.read.parquet(s"$Sf01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") >= NQueries)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))

    def objective(labeled: org.apache.spark.sql.DataFrame): Double = {
      val centroids = Similarity.ivfCentroids(
        corpus.join(labeled, "cand_id"), "cv", "label")
      Similarity.ivfAssign(
          corpus.select(col("cand_id").as("query_id"), col("cv").as("qv")), centroids)
        .agg(avg(col("sim"))).collect().head.getDouble(0)
    }

    // one-round Voronoi bootstrap (the sf0.1 recall table's labels)
    val seedsLong = corpus.filter(col("cand_id") < NQueries + K)
      .select((col("cand_id") - NQueries).cast("int").as("label"),
        posexplode(col("cv")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"), col("v").cast("double").as("centroid"))
    val voronoi = Similarity.ivfAssign(
        corpus.select(col("cand_id").as("query_id"), col("cv").as("qv")), seedsLong)
      .select(col("query_id").as("cand_id"), col("label"))

    val fitted = Similarity.kmeansFit(
      corpus.withColumnRenamed("cv", "embedding"),
      "cand_id", "embedding", k = K, maxIter = 15, restarts = 2)

    val objFit = objective(fitted)
    val objVor = objective(voronoi)
    info(f"sf0.1 kmeans objective: fitted $objFit%.4f vs voronoi-bootstrap $objVor%.4f")
    assert(objFit >= objVor, f"fitted $objFit%.4f below bootstrap $objVor%.4f")

    // fitted-label IVF search: monotone nprobe curve, exact at #cells
    val fittedCorpus = corpus.join(fitted, "cand_id")
    val centroids = Similarity.ivfCentroids(fittedCorpus, "cv", "label")
    val truth = Similarity.bruteTopK(queries, corpus, k = K).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recallAt(np: Int): Double = {
      val approx = Similarity.ivfTopK(queries, fittedCorpus, centroids, k = K,
          nprobe = np).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      truth.map { case (q, t) =>
        (t & approx.getOrElse(q, Set.empty)).size.toDouble / t.size
      }.sum / truth.size
    }
    val r = Seq(1, 4, 10).map(np => np -> recallAt(np)).toMap
    info(f"sf0.1 fitted-label ivf recall@10: nprobe1=${r(1)}%.3f nprobe4=${r(4)}%.3f nprobe10=${r(10)}%.3f")
    assert(r(1) <= r(4) + 1e-12 && r(4) <= r(10) + 1e-12, r)
    assert(r(10) == 1.0, s"nprobe=#cells must be exact, got ${r(10)}")
  }
}
