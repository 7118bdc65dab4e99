package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** C82 filtered vector search: pre-filter semantics (full k from the
  * surviving candidates), the post-filter deficit it avoids, and the
  * predicate reaching a landed index's parquet scan as a pushed
  * filter. */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  // one cluster; the 5 nearest neighbors of the query all carry
  // meta=0 (predicate-violating), the 5 odd ones meta=1
  private def fixture = {
    val cands = (0 until 10).map { i =>
      val off = if (i % 2 == 0) 0.001f * (i + 1) else 0.5f + 0.01f * i
      (100L + i, Seq(1.0f, off), 0, i % 2) // (cand_id, cv, label, meta)
    }
    (Seq((1L, Seq(1.0f, 0.0f), 0)).toDF("query_id", "qv", "label"),
      cands.toDF("cand_id", "cv", "label", "meta"))
  }

  private lazy val centroids = {
    val emb = (0 until 10).map(i => (i.toLong, Seq(1.0f, 0.1f * i), 0))
      .toDF("vec_id", "embedding", "label")
    Similarity.ivfCentroids(emb, "embedding", "label")
  }

  test("pre-filter returns full k from surviving candidates; post-filter starves") {
    val (queries, cands) = fixture
    val pre = Similarity.ivfTopK(queries, cands.filter(col("meta") === 1)
        .select("cand_id", "cv", "label"), centroids, k = 5)
      .collect()
    assert(pre.length === 5)
    assert(pre.forall(_.getLong(1) % 2 === 1), pre.mkString(", "))
    // the naive alternative: unfiltered top-5 are the meta=0 pack, so
    // post-filtering leaves NOTHING for this query
    val post = Similarity.ivfTopK(queries,
        cands.select("cand_id", "cv", "label"), centroids, k = 5)
      .join(cands.filter(col("meta") === 1).select("cand_id"), "cand_id")
      .collect()
    assert(post.isEmpty, s"expected a starved post-filter, got ${post.length}")
  }

  test("on a landed corpus the predicate reaches the parquet scan") {
    val (queries, cands) = fixture
    val dir = tempDir("filtered_ann")
    cands.write.mode("overwrite").parquet(s"$dir/corpus")
    val landed = spark.read.parquet(s"$dir/corpus")
    val df = Similarity.ivfTopK(queries,
      landed.filter(col("meta") > 0).select("cand_id", "cv", "label"),
      centroids, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(meta"),
      plan)
    assert(df.count() === 5)
  }

  test("a selective filter can starve the probed cluster; raising nprobe recovers") {
    // cluster 0 is the query's nearest centroid but holds only meta=0
    // candidates; cluster 1 holds the meta=1 matches — the documented
    // nprobe-bounded limit of pre-filtered IVF search
    val emb = (
      (0 until 4).map(i => (i.toLong, Seq(1.0f, 0.01f * i), 0)) ++
      (0 until 4).map(i => (10L + i, Seq(0.2f, 1.0f + 0.01f * i), 1))
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.ivfCentroids(emb, "embedding", "label")
    val queries = Seq((1L, Seq(1.0f, 0.0f))).toDF("query_id", "qv")
    val meta1 = emb.filter(col("label") === 1)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("label"))
    val starved = Similarity.ivfTopK(queries, meta1, cents, k = 3, nprobe = 1)
    assert(starved.count() === 0, "nprobe=1 should starve: matches live off-probe")
    val recovered = Similarity.ivfTopK(queries, meta1, cents, k = 3, nprobe = 2)
    assert(recovered.count() === 3)
    assert(recovered.collect().forall(_.getLong(1) >= 10L))
  }

  test("C82 demo row: every result honors the predicate, ranks contiguous") {
    val rows = graft.operators.TextDemos.annFilteredTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 % 3 != 0), "a filtered-out candidate leaked through")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length), s"query $q")
    }
  }
}
