package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** C80 PSI drift spec: zero-drift identity, closed-form mass shift,
  * Laplace finiteness on empty buckets, symmetry, and a randomized
  * driver recompute. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(0.25, 0.5, 0.75)

  private def drift(v1: Seq[Double], v2: Seq[Double]) =
    Curation.distributionDrift(v1.toDF("v"), v2.toDF("v"), "v", edges)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  private def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** driver-reference PSI with the same Laplace smoothing. */
  private def refPsi(v1: Seq[Double], v2: Seq[Double]) = {
    val nB = edges.size + 1
    def hist(v: Seq[Double]) =
      (0 until nB).map(b => v.count(x => edges.count(x >= _) == b).toLong)
    val (h1, h2) = (hist(v1), hist(v2))
    val (t1, t2) = (h1.sum.toDouble, h2.sum.toDouble)
    (0 until nB).map { b =>
      val p = (h1(b) + 1.0) / (t1 + nB); val q = (h2(b) + 1.0) / (t2 + nB)
      r6((p - q) * math.log(p / q))
    }
  }

  test("identical versions drift zero in every bucket") {
    val v = Seq(0.1, 0.3, 0.3, 0.6, 0.9, 0.9)
    assert(drift(v, v).forall(_._4 === 0.0))
  }

  test("a full mass shift between buckets matches the closed form") {
    val v1 = Seq.fill(100)(0.1)  // all bucket 0
    val v2 = Seq.fill(100)(0.3)  // all bucket 1
    val got = drift(v1, v2)
    assert(got.map(_._4) === refPsi(v1, v2).toArray)
    assert(got(0)._2 === 100L && got(0)._3 === 0L)
    assert(got(1)._2 === 0L && got(1)._3 === 100L)
    // the two moved buckets dominate; psi is never negative
    assert(got.forall(_._4 >= 0.0))
    assert(got(0)._4 > got(2)._4 && got(1)._4 > got(2)._4)
  }

  test("empty buckets stay finite under Laplace smoothing") {
    val got = drift(Seq(0.1), Seq(0.9))
    assert(got.length === edges.size + 1)
    assert(got.forall(r => !r._4.isNaN && !r._4.isInfinite))
  }

  test("PSI is symmetric: swapping versions preserves every term") {
    val v1 = Seq(0.1, 0.1, 0.3, 0.6); val v2 = Seq(0.3, 0.6, 0.9, 0.9, 0.9)
    val a = drift(v1, v2); val b = drift(v2, v1)
    assert(a.map(_._4).toSeq === b.map(_._4).toSeq)
  }

  test("unsorted or duplicate edges refuse loudly") {
    intercept[IllegalArgumentException] {
      Curation.distributionDrift(Seq(0.1).toDF("v"), Seq(0.1).toDF("v"),
        "v", Seq(0.5, 0.25))
    }
    intercept[IllegalArgumentException] {
      Curation.distributionDrift(Seq(0.1).toDF("v"), Seq(0.1).toDF("v"),
        "v", Seq(0.5, 0.5))
    }
  }

  test("randomized: equals the driver reference") {
    val rnd = new scala.util.Random(80L)
    val v1 = Seq.fill(300)(rnd.nextDouble())
    val v2 = Seq.fill(240)(math.min(1.0, rnd.nextDouble() + 0.1))
    assert(drift(v1, v2).map(_._4).toSeq === refPsi(v1, v2))
  }

  test("C80 demo row: full spine, non-negative terms, small honest drift") {
    val rows = graft.operators.TextDemos.corpusDrift(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === (0L until 10L))
    assert(rows.forall(_._4 >= 0.0))
    val total = rows.map(_._4).sum
    assert(total > 0.0 && total < 0.1, s"psi total $total")
  }
}
