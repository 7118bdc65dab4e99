package graft

import graft.operators.Similarity

/** C91 kcenter_select: the greedy farthest-point traversal checked
  * against a plain-Scala reference (same seed, same squared-L2, same
  * tie-break), plus closed-form geometry and the k > n edge.
  */
class KcenterSpec extends SparkSpec {
  import spark.implicits._

  private def sq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }

  /** driver-side greedy reference: seed = smallest id, then argmax of
    * min distance to the selected set, ties to the smallest id. */
  private def refGreedy(pts: Seq[(Long, Seq[Double])], k: Int): Seq[(Int, Long, Double)] = {
    if (pts.isEmpty) return Nil
    val sorted = pts.sortBy(_._1)
    val sel = scala.collection.mutable.ArrayBuffer((0, sorted.head._1, 0.0))
    val centers = scala.collection.mutable.ArrayBuffer(sorted.head._2)
    while (sel.size < math.min(k, pts.size)) {
      val cands = sorted.filterNot(p => sel.exists(_._2 == p._1))
        .map { case (id, v) => (id, centers.map(c => sq(v, c)).min) }
      val (id, d) = cands.maxBy { case (id, d) => (d, -id) }
      sel += ((sel.size, id, d))
      centers += sorted.find(_._1 == id).get._2
    }
    sel.toSeq.map { case (r, id, d) =>
      (r, id, java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    }
  }

  private def run(pts: Seq[(Long, Seq[Double])], k: Int): Seq[(Int, Long, Double)] =
    Similarity.kcenterSelect(
        pts.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq

  test("closed form: corners of a line are picked outside-in from the smallest-id seed") {
    // seed is id 1 (0.0); farthest is 10.0 (id 4); then 5.0 (mid) etc.
    val pts = Seq(1L -> Seq(0.0), 2L -> Seq(1.0), 3L -> Seq(5.0), 4L -> Seq(10.0))
    val got = run(pts, 3)
    assert(got == Seq((0, 1L, 0.0), (1, 4L, 100.0), (2, 3L, 25.0)))
  }

  test("ties break to the smallest id") {
    // ids 2 and 3 are both at distance 4 from the seed
    val pts = Seq(1L -> Seq(0.0), 2L -> Seq(2.0), 3L -> Seq(-2.0))
    val got = run(pts, 2)
    assert(got == Seq((0, 1L, 0.0), (1, 2L, 4.0)))
  }

  test("k > n returns exactly n rows; k = 1 returns the seed") {
    val pts = Seq(7L -> Seq(1.0, 2.0), 9L -> Seq(3.0, 4.0))
    assert(run(pts, 5).map(_._2) == Seq(7L, 9L))
    assert(run(pts, 1) == Seq((0, 7L, 0.0)))
  }

  test("matches the driver-side greedy reference on sf0.001 embeddings") {
    val pts = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    for (k <- Seq(1, 4, 8)) {
      val want = refGreedy(pts, k)
      val got = Similarity.kcenterSelect(
          graft.sources.Tables.embeddings(spark, sfDir), "vec_id", "embedding", k)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == want, s"k=$k: got $got want $want")
    }
  }
}
