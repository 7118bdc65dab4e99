package graft

import org.apache.spark.sql.functions._
import graft.functions.Vec

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot product is bit-identical to the HOF fold") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(50)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
    val diffs = pairs.select(
        Vec.dot(col("a"), col("b")).as("hof"),
        Vec.dotFast(col("a"), col("b")).as("native"),
        Vec.cosine(col("a"), col("b")).as("c_hof"),
        Vec.cosineFast(col("a"), col("b")).as("c_native"))
      .filter(col("hof") =!= col("native") || col("c_hof") =!= col("c_native"))
      .count()
    assert(diffs == 0L)
  }

  test("graft_dot is callable from plain SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head.getDouble(0)
    assert(r == 11.0)
  }

  test("codegen loop handles empty and mismatched lengths") {
    val df = Seq((Array.empty[Float], Array.empty[Float], Array(1.0f), Array(1.0f, 5.0f)))
      .toDF("e1", "e2", "s1", "s2")
    val r = df.select(
      Vec.dotFast(col("e1"), col("e2")),
      Vec.dotFast(col("s1"), col("s2"))).head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }
}
