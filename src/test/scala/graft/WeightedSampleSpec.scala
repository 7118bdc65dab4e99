package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** C101 weighted_sample: the integer-ticket race (A-Res weighted
  * reservoir discretized to md5 tickets) checked for exact agreement
  * with a plain-Scala reference, weight-proportional inclusion,
  * partitioning independence, and the clamp/size edges.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md560(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** the reference race: min of w tickets per id, top-m on (key, id) */
  private def refSample(rows: Seq[(Long, Long)], m: Int,
                        maxWeight: Int = 64): Seq[(Long, Long, Long, Long)] = {
    val keyed = rows.map { case (id, w0) =>
      val w = math.min(math.max(w0, 1L), maxWeight.toLong)
      val key = (1L to w).map(r => md560(s"$id#$r")).min
      (id, w, key)
    }
    keyed.sortBy { case (id, _, key) => (key, id) }.take(m)
      .zipWithIndex.map { case ((id, w, key), i) => (i + 1L, id, w, key) }
  }

  private def run(rows: Seq[(Long, Long)], m: Int,
                  parts: Int = 4): Seq[(Long, Long, Long, Long)] =
    Sampling.weightedSample(
        rows.toDF("doc_id", "w").repartition(parts), "doc_id", col("w"), m)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("exact agreement with the plain-Scala ticket race, any partitioning") {
    val rnd = new scala.util.Random(41)
    val rows = (1L to 300L).map(id => id -> (1L + rnd.nextInt(10)))
    val want = refSample(rows, m = 40)
    assert(run(rows, 40, parts = 1) == want)
    assert(run(rows, 40, parts = 7) == want)   // partitioning-independent
  }

  test("inclusion tracks weight: a 8x-weighted class dominates ~8:1") {
    // 1000 docs at w=1, 1000 at w=8; draw 300. Expected per-pair odds
    // are exactly 8:1, so the sampled ratio concentrates near 8 — the
    // bounds are generous (the draw is deterministic, so this is a
    // one-shot check of the hash race's calibration, not a flaky test)
    val rows = (1L to 2000L).map(id => id -> (if (id <= 1000) 1L else 8L))
    val got = run(rows, 300)
    val heavy = got.count(_._2 > 1000L).toDouble
    val light = got.size - heavy
    assert(heavy / light > 4.0 && heavy / light < 16.0,
      s"weight-8 class drew $heavy vs $light — race miscalibrated")
  }

  test("weights clamp: null/zero/negative draw as 1; cap at maxWeight") {
    val df = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 0L), (3L, -5L), (4L, 999999L)
    ).toDF("doc_id", "w")
    val got = Sampling.weightedSample(df, "doc_id", col("w"), m = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(4L) == 64L) // default maxWeight
  }

  test("m >= n returns every row, still in race order") {
    val rows = Seq(1L -> 3L, 2L -> 1L, 3L -> 5L)
    val got = run(rows, m = 50)
    assert(got.size == 3)
    assert(got == refSample(rows, 50))
    assert(got.map(_._1) == Seq(1L, 2L, 3L)) // ranks are dense 1..n
  }

  test("parameter bounds rejected") {
    val df = Seq((1L, 1L)).toDF("doc_id", "w")
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, "doc_id", col("w"), m = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, "doc_id", col("w"), m = 1, maxWeight = 0)
    }
  }
}
