package graft

import org.apache.spark.sql.functions._
import graft.operators.Bm25

/** C114 index compaction: bit-identity with from-scratch, the
  * meta-commit crash discipline, idempotence, and gen-0 compatibility.
  */
class Bm25CompactSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"),
    (3L, "alpha alpha"))
  private val add1 = Seq((10L, "alpha delta"), (11L, "delta delta"))
  private val add2 = Seq((20L, "gamma gamma eps"))

  private def impacts(d: String) =
    spark.read.parquet(s"$d/impacts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  test("C114 compact == from-scratch; gen bumps; old batch dirs are removed") {
    val dir = tempDir("bm25_compact")
    Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id", "text", dir)
    Bm25.appendIndex(add1.toDF("doc_id", "text"), "doc_id", "text", dir, 1)
    Bm25.appendIndex(add2.toDF("doc_id", "text"), "doc_id", "text", dir, 2)
    val before = impacts(dir)
    Bm25.compactIndex(spark, dir)
    assert(impacts(dir) == before, "compaction must not change any impact")
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    assert(meta.getAs[Long]("batches") == 1L && meta.getAs[Long]("gen") == 1L
      && meta.getAs[Long]("n") == 6L)
    assert(!new java.io.File(s"$dir/tf/b00000").exists,
      "superseded gen-0 batch dirs should be cleaned up")
    // search still equals the one-shot scorer over the union
    val q = Seq((1L, Seq("alpha", "gamma"))).toDF("query_id", "terms")
    val via = Bm25.searchIndex(spark, dir, q, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val one = Bm25.topK((docs ++ add1 ++ add2).toDF("doc_id", "text"),
        "doc_id", "text", q, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(via == one)
    // appends continue cleanly on the compacted generation
    Bm25.appendIndex(Seq((30L, "zeta")).toDF("doc_id", "text"),
      "doc_id", "text", dir, 1)
    assert(new java.io.File(s"$dir/tf/g1/b00001").exists)
  }

  test("C114 an uncommitted next-gen dir is invisible; re-compact is a no-op") {
    val dir = tempDir("bm25_compact_crash")
    Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id", "text", dir)
    Bm25.appendIndex(add1.toDF("doc_id", "text"), "doc_id", "text", dir, 1)
    Bm25.compactIndex(spark, dir)
    val committed = impacts(dir)
    // crash simulation: a later compaction attempt landed its merged
    // postings but DIED before the meta commit
    Seq(("zzz", 99L, 1L)).toDF("term", "doc_id", "tf")
      .write.mode("overwrite").parquet(s"$dir/tf/g2/b00000")
    // the index still serves generation 1; a re-compact of the
    // single-batch index refuses to bump past it
    Bm25.compactIndex(spark, dir)
    assert(impacts(dir) == committed)
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    assert(meta.getAs[Long]("gen") == 1L && meta.getAs[Long]("batches") == 1L)
    assert(!impacts(dir).exists(_._1 == "zzz"))
  }

  test("C114 compacting a single-batch index is a no-op (gen 0 preserved)") {
    val dir = tempDir("bm25_compact_noop")
    Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id", "text", dir)
    val before = impacts(dir)
    Bm25.compactIndex(spark, dir)
    assert(impacts(dir) == before)
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    assert(meta.getAs[Long]("gen") == 0L)
    assert(new java.io.File(s"$dir/tf/b00000").exists)
  }
}
