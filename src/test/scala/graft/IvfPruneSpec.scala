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
    val dir = tempDir("graft_ivf_part")
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

  test("C15b ivfAppend: daily batches append into posting-list partitions, search sees them") {
    val dir = tempDir("graft_ivf_append")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val base = emb.filter(col("vec_id") >= 30 && col("vec_id") < 300)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("label"))
      base.write.partitionBy("label").parquet(s"$dir/index")
      val centroids = Similarity.ivfCentroids(base, "cv", "label")
      // two daily batches append; the base partitions never rewrite
      val day1 = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      val day2 = emb.filter(col("vec_id") >= 400)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      Similarity.ivfAppend(day1, centroids, s"$dir/index")
      Similarity.ivfAppend(day2, centroids, s"$dir/index")
      val index = spark.read.parquet(s"$dir/index")
      assert(index.count() == emb.filter(col("vec_id") >= 30).count())
      // appended vectors live in their ASSIGNED partition
      val reassigned = Similarity.ivfAssign(
          index.filter(col("cand_id") >= 300)
            .select(col("cand_id").as("query_id"), col("cv").as("qv")), centroids)
        .collect().map(r => r.getLong(0) -> r.getAs[Number]("label").intValue).toMap
      val stored = index.filter(col("cand_id") >= 300)
        .select(col("cand_id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getAs[Number]("label").intValue).toMap
      assert(stored == reassigned, "appended rows must sit in their assigned posting list")
      // search over the grown index returns appended ids when they win
      val out = Similarity.ivfTopK(queries, index, centroids, k = 10,
        nprobe = 3, pruneScan = true).collect()
      assert(out.nonEmpty && out.forall(_.getLong(3) <= 10))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
