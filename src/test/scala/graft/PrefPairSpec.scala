package graft

import graft.operators.Curation

/** C123 pref_pair_prep: orientation repair, the three row checks, and
  * prompt dedup, on closed-form fixtures. */
class PrefPairSpec extends SparkSpec {
  import spark.implicits._

  private case class Out(swapped: Boolean, okDistinct: Boolean,
                         okMargin: Boolean, okLenRatio: Boolean,
                         kept: Boolean, margin: Double, lenRatio: Double)

  private def run(rows: Seq[(Long, String, String, String, Double, Double)]): Map[Long, Out] =
    Curation.prefPairPrep(
        rows.toDF("id", "prompt", "resp_a", "resp_b", "score_a", "score_b"),
        "id", "prompt", "resp_a", "resp_b", "score_a", "score_b")
      .collect()
      .map(r => r.getLong(0) -> Out(r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getDouble(6), r.getDouble(7)))
      .toMap

  test("orientation repairs to the higher score; ties keep A unswapped") {
    val got = run(Seq(
      (1L, "p1", "good answer here", "bad", 0.9, 0.3),
      (2L, "p2", "bad", "good answer here", 0.3, 0.9),
      (3L, "p3", "one answer", "another answer", 0.5, 0.5)))
    assert(!got(1L).swapped && got(1L).kept && got(1L).margin == 0.6)
    assert(got(2L).swapped && got(2L).kept && got(2L).margin == 0.6)
    // tie: margin 0 < minMargin, and deterministically unswapped
    assert(!got(3L).swapped && !got(3L).okMargin && !got(3L).kept)
  }

  test("identical pair fails distinct; margin gate is >= minMargin inclusive") {
    val got = run(Seq(
      (1L, "p1", "same text", "same text", 0.9, 0.3),
      (2L, "p2", "aa bb", "cc dd", 0.55, 0.5),   // margin 0.05 exactly: pass
      (3L, "p3", "aa bb", "cc dd", 0.54, 0.5)))  // margin 0.04: fail
    assert(!got(1L).okDistinct && !got(1L).kept)
    assert(got(2L).okMargin && got(2L).kept)
    assert(!got(3L).okMargin && !got(3L).kept)
  }

  test("length-ratio gate: 3.0 passes, above fails, empty side floors at 1 token") {
    val got = run(Seq(
      (1L, "p1", "a b c d e f", "x y", 0.9, 0.3),         // 6/2 = 3.0: pass
      (2L, "p2", "a b c d e f g", "x y", 0.9, 0.3),       // 7/2 = 3.5: fail
      (3L, "p3", "a b", "", 0.9, 0.3)))                   // 2/max(0,1) = 2: pass
    assert(got(1L).okLenRatio && got(1L).lenRatio == 3.0 && got(1L).kept)
    assert(!got(2L).okLenRatio && !got(2L).kept)
    assert(got(3L).okLenRatio && got(3L).lenRatio == 2.0 && got(3L).kept)
  }

  test("prompt dedup: lowest passing id wins; failing pairs never block a passing duplicate") {
    val got = run(Seq(
      (5L, "dup", "aa bb", "cc dd", 0.51, 0.5),  // fails margin
      (6L, "dup", "ee ff", "gg hh", 0.9, 0.3),   // first passing
      (7L, "dup", "ii jj", "kk ll", 0.9, 0.3),   // passing duplicate
      (8L, "solo", "mm nn", "oo pp", 0.9, 0.3)))
    assert(!got(5L).kept && got(6L).kept && !got(7L).kept && got(8L).kept)
    // the three checks still report honestly on the dedup loser
    assert(got(7L).okDistinct && got(7L).okMargin && got(7L).okLenRatio)
  }
}
