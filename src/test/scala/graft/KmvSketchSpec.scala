package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextDemos}

/** C58 — KMV corpus-overlap sketch: the native aggregate against an
  * independent DataFrame reference (distinct → sort → limit), and the
  * estimator row against exact set arithmetic. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("graft_kmv keeps the k smallest distinct hashes, ascending") {
    val vals = Seq(9L, 3L, 3L, 7L, 1L, 5L, 1L, 8L, 2L, 2L)
    val df = vals.toDF("h").repartition(3) // partial buffers must merge
    val got = df.agg(call_function("graft_kmv", col("h"), lit(4)))
      .as[Seq[Long]].head()
    assert(got == Seq(1L, 2L, 3L, 5L))
  }

  test("below k distinct values the sketch IS the exact distinct set") {
    val got = Seq(42L, 7L, 42L).toDF("h")
      .agg(call_function("graft_kmv", col("h"), lit(100)))
      .as[Seq[Long]].head()
    assert(got == Seq(7L, 42L))
  }

  test("nulls are skipped; all-null input yields an empty sketch") {
    val got = Seq[Option[Long]](None, Some(5L), None).toDF("h")
      .agg(call_function("graft_kmv", col("h"), lit(3)))
      .as[Seq[Long]].head()
    assert(got == Seq(5L))
    val empty = Seq[Option[Long]](None, None).toDF("h")
      .agg(call_function("graft_kmv", col("h"), lit(3)))
      .as[Seq[Long]].head()
    assert(empty.isEmpty)
  }

  test("sketch matches the independent distinct-sort-limit reference on real hashes") {
    val k = 64
    val hashes = sources.Tables.documents(spark, sfDir)
      .select(explode(functions.Text.shingles(col("text"), 3)).as("sh"))
      .select(functions.Vec.md5Hash60(col("sh")).as("h"))
    val got = hashes.agg(call_function("graft_kmv", col("h"), lit(k)))
      .as[Seq[Long]].head()
    val want = hashes.distinct().orderBy("h").limit(k).as[Long].collect().toSeq
    assert(got == want)
  }

  test("C58 demo row: estimates agree with exact-set arithmetic within KMV error") {
    val row = TextDemos.corpusOverlapKmv(spark, sfDir).collect()(0)
    val docs = sources.Tables.documents(spark, sfDir)
    def hs(p: org.apache.spark.sql.Column) = docs.filter(p)
      .select(explode(functions.Text.shingles(col("text"), 3)).as("sh"))
      .select(functions.Vec.md5Hash60(col("sh")).as("h"))
      .as[Long].collect().toSet
    val a = hs(col("doc_id") % 20 =!= 0)
    val b = hs(col("doc_id") % 20 === 0)
    val estA = row.getAs[Double]("est_distinct_a")
    val estU = row.getAs[Double]("est_distinct_union")
    val estJ = row.getAs[Double]("est_jaccard")
    val exactJ = (a intersect b).size.toDouble / (a union b).size
    // k=1024 KMV: relative error ~ 1/sqrt(k) ≈ 3.1%; allow 4 sigma
    assert(math.abs(estA - a.size) <= 0.125 * a.size || a.size <= 1024,
      s"est_distinct_a=$estA exact=${a.size}")
    assert(math.abs(estU - (a union b).size) <= 0.125 * (a union b).size
      || (a union b).size <= 1024, s"est_union=$estU exact=${(a union b).size}")
    assert(math.abs(estJ - exactJ) <= 0.125 * math.max(exactJ, 0.05),
      s"est_jaccard=$estJ exact=$exactJ")
  }
}
