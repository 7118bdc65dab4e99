package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Specs for the Matryoshka truncation evaluation (C88). */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  private def cosPrefix(a: Array[Float], b: Array[Float], d: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < d) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** reference: per dim, top-k by (cos desc, cand_id), recall vs full dim */
  private def refEval(vecs: Seq[(Long, Array[Float])], dims: Seq[Int], fullDim: Int,
                      k: Int, isQuery: Long => Boolean): Map[Int, (Long, Double)] = {
    val q = vecs.filter(v => isQuery(v._1))
    val c = vecs.filterNot(v => isQuery(v._1))
    def pairs(d: Int): Set[(Long, Long)] = q.flatMap { case (qi, qv) =>
      c.map { case (ci, cv) => (qi, ci, cosPrefix(qv, cv, d)) }
        .sortBy { case (_, ci, s) => (-s, ci) }.take(k)
        .map { case (qi2, ci, _) => (qi2, ci) }
    }.toSet
    val truth = pairs(fullDim)
    dims.map { d =>
      val hits = (pairs(d) & truth).size.toLong
      val recall = java.math.BigDecimal.valueOf(hits.toDouble / (k * q.size))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      d -> (hits, recall)
    }.toMap
  }

  private def runOp(vecs: Seq[(Long, Array[Float])], dims: Seq[Int], fullDim: Int,
                    k: Int): Map[Int, (Long, Double)] =
    Similarity.matryoshkaEval(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        dims, fullDim, k, col("vec_id") % 5 === 0)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("full-dim row is exact: recall 1.0, n_hits = k * n_queries") {
    val rnd = new scala.util.Random(41)
    val vecs = (1L to 60L).map(id => id -> Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    val nq = vecs.count(_._1 % 5 == 0)
    val got = runOp(vecs, Seq(8, 16), 16, k = 3)
    assert(got(16) == (3L * nq, 1.0))
  }

  test("matches the plain-Scala reference on randomized embeddings") {
    val rnd = new scala.util.Random(43)
    val vecs = (1L to 80L).map(id => id -> Array.fill(12)((rnd.nextDouble() * 2 - 1).toFloat))
    val want = refEval(vecs, Seq(3, 6, 12), 12, 4, _ % 5 == 0)
    val got = runOp(vecs, Seq(3, 6, 12), 12, 4)
    assert(got == want)
    assert(want(3)._1 < want(12)._1, "degenerate fixture: truncation lost nothing")
  }

  test("signal confined to the prefix makes the truncated recall exactly 1") {
    // dims 5..8 are zero everywhere: ranking at d=4 equals d=8
    val rnd = new scala.util.Random(47)
    val vecs = (1L to 40L).map { id =>
      id -> (Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat) ++ Array.fill(4)(0f))
    }
    val got = runOp(vecs, Seq(4, 8), 8, k = 3)
    assert(got(4)._2 == 1.0, s"prefix holds all signal, got ${got(4)}")
  }

  test("a dim with zero hits still reports (dim, 0, 0.0)") {
    // d=1: every candidate ties at cosine 1 (identical first dim), so
    // the lowest ids win the tie-break; the full-dim truth lives at
    // the HIGH ids -> zero overlap at d=1, and the row must not vanish
    val vecs = Seq(
      5L -> Array(1f, 10f),   // the query (vec_id % 5 == 0)
      1L -> Array(1f, -10f), 2L -> Array(1f, -10f),
      6L -> Array(1f, 10f), 7L -> Array(1f, 10f))
    val got = runOp(vecs, Seq(1, 2), 2, k = 2)
    assert(got(1) == (0L, 0.0), got.toString)
    assert(got(2) == (2L, 1.0), got.toString)
  }

  test("dims bounds rejected") {
    val df = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaEval(df, "vec_id", "embedding", Seq(3), 2, 1, col("vec_id") === 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaEval(df, "vec_id", "embedding", Seq.empty, 2, 1, col("vec_id") === 1)
    }
  }
}
