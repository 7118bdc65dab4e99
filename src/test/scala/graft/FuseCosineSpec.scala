package graft

import org.apache.spark.sql.functions._
import graft.functions.Vec

class FuseCosineSpec extends SparkSpec {

  test("optimizer fuses the 3-dot cosine idiom into graft_cosine") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(20)
    val pairs = emb.select(col("embedding").as("a"), col("vec_id").as("ia"))
      .crossJoin(emb.select(col("embedding").as("b"), col("vec_id").as("ib")))
    val df = pairs.select(Vec.cosineFast(col("a"), col("b")).as("sim"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine"), optimized.linesIterator.take(5).mkString("\n"))
    assert(!optimized.contains("graft_dot"), "all three dots should fuse")
  }

  test("fused cosine is bit-identical to HOF and unfused forms") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(40)
    val pairs = emb.select(col("embedding").as("a"), col("vec_id").as("ia"))
      .crossJoin(emb.select(col("embedding").as("b"), col("vec_id").as("ib")))
    val diffs = pairs.select(
        Vec.cosine(col("a"), col("b")).as("hof"),
        Vec.cosineFast(col("a"), col("b")).as("fused"),
        call_function("graft_cosine", col("a"), col("b")).as("direct"))
      .filter(col("hof") =!= col("fused") || col("fused") =!= col("direct"))
      .count()
    assert(diffs == 0L)
  }

  test("graft_cosine on mismatched lengths: defined (min-length dot), where HOF nulls") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 2.0f))).toDF("a", "b")
    val r = df.select(
      call_function("graft_cosine", col("a"), col("b")).as("fused"),
      Vec.cosine(col("a"), col("b")).as("hof")).head
    // HOF zip_with pads the short side with null and the fold collapses
    // to null; the native form keeps the min-length dot + full norms.
    // Equal-length vectors (the real case) are bit-identical (test above).
    assert(!r.isNullAt(0) && r.getDouble(0) > 0)
    assert(r.isNullAt(1))
  }
}
