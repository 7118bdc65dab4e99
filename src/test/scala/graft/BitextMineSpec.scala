package graft

import graft.operators.BitextMine

/** Specs for margin-based bitext mining (C86): the ratio margin must
  * match a plain-Scala reference of the same algebra, and the margin
  * criterion must do its one job — suppress hub vectors that raw
  * cosine would happily align.
  */
class BitextMineSpec extends SparkSpec {
  import spark.implicits._

  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** the full reference algebra: round-6 sims, top-k by (sim desc, id),
    * exact decimal neighborhood sums, cross-multiplied margin,
    * best target per source at the threshold */
  private def refMine(src: Seq[(Long, Array[Float])], tgt: Seq[(Long, Array[Float])],
                      k: Int, thr: Double): Map[Long, (Long, Double, Double)] = {
    val sims = for { (si, sv) <- src; (ti, tv) <- tgt }
      yield (si, ti, round6(cos(sv, tv)))
    def topkSum(rows: Seq[(Long, Double)]): java.math.BigDecimal =
      rows.sortBy { case (id, s) => (-s, id) }.take(k)
        .map { case (_, s) => java.math.BigDecimal.valueOf(s).setScale(6) }
        .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
    val sumF = src.map { case (si, _) =>
      si -> topkSum(sims.collect { case (`si`, ti, s) => (ti, s) }) }.toMap
    val sumB = tgt.map { case (ti, _) =>
      ti -> topkSum(sims.collect { case (si, `ti`, s) => (si, s) }) }.toMap
    val margins = sims.flatMap { case (si, ti, s) =>
      val denom = sumF(si).add(sumB(ti)).doubleValue
      // non-positive neighborhood mass is unminable (the operator drops it)
      if (denom > 0.0) Some((si, ti, s, round6(s * 2 * k / denom))) else None
    }
    margins.groupBy(_._1).flatMap { case (si, rows) =>
      val best = rows.minBy { case (_, ti, _, m) => (-m, ti) }
      if (best._4 >= thr) Some(si -> (best._2, best._3, best._4)) else None
    }
  }

  private def runOp(src: Seq[(Long, Array[Float])], tgt: Seq[(Long, Array[Float])],
                    k: Int, thr: Double): Map[Long, (Long, Double, Double)] =
    BitextMine.mine(src.toDF("doc_id", "embedding"), tgt.toDF("doc_id", "embedding"),
        "doc_id", "embedding", k = k, marginThreshold = thr)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap

  test("hub suppression: a target near everything is not mined, a true pair is") {
    // 2-D space: src 1 points at (1,0); tgt 10 is its true match.
    // tgt 99 is a "hub" equally close to BOTH sources, so its backward
    // neighborhood average is as high as any single sim it offers —
    // margin ~1 — while the true pair towers over its neighborhoods.
    val src = Seq(
      1L -> Array(1f, 0f),
      2L -> Array(0f, 1f))
    val tgt = Seq(
      10L -> Array(0.99f, 0.05f),  // true match for src 1
      20L -> Array(0.10f, 0.95f),  // true match for src 2
      99L -> Array(0.7f, 0.7f))    // hub: sim ~0.7 to everything
    val got = runOp(src, tgt, k = 2, thr = 1.05)
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 10L, s"src 1 should mine its true match, got ${got(1L)}")
    assert(got(2L)._1 == 20L, s"src 2 should mine its true match, got ${got(2L)}")
  }

  test("matches the reference algebra on randomized embeddings") {
    val rnd = new scala.util.Random(23)
    def vec(): Array[Float] = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val src = (1L to 40L).map(id => id -> vec())
    // plant true matches for half the sources: tgt = src + small noise
    val tgt = (101L to 140L).map { id =>
      val base = src((id - 101).toInt)._2
      id -> (if (id % 2 == 0) base.map(x => x + (rnd.nextDouble() * 0.05).toFloat)
             else vec())
    }
    for ((k, thr) <- Seq((4, 1.1), (1, 1.0), (50, 1.05))) { // k=50 > side size
      val want = refMine(src, tgt, k, thr)
      val got = runOp(src, tgt, k, thr)
      assert(got == want, s"k=$k thr=$thr: got ${got.size}, want ${want.size}")
    }
    assert(refMine(src, tgt, 4, 1.1).nonEmpty, "degenerate fixture")
  }

  test("mineAnn at full probe width is exactly mine: the candidate set is the cross product") {
    val rnd = new scala.util.Random(31)
    def vec(): Array[Float] = Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)
    val src = (1L to 25L).map(id => id -> vec())
    val tgt = (101L to 130L).map(id => id -> vec())
    val exact = runOp(src, tgt, k = 4, thr = 1.0)
    val ann = BitextMine.mineAnn(src.toDF("doc_id", "embedding"),
        tgt.toDF("doc_id", "embedding"), "doc_id", "embedding",
        k = 4, marginThreshold = 1.0, nPlanes = 5, dim = 8, probeBits = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(ann == exact)
    assert(exact.nonEmpty, "degenerate fixture")
  }

  test("mineAnn at probeBits=1 still mines planted strong pairs") {
    val rnd = new scala.util.Random(37)
    def vec(): Array[Float] = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val src = (1L to 30L).map(id => id -> vec())
    // every source gets a near-identical target: same bucket by
    // construction (tiny perturbation), so probeBits=1 must see it
    val tgt = src.map { case (id, v) =>
      (id + 100L) -> v.map(x => x + (rnd.nextDouble() * 0.01).toFloat)
    }
    val got = BitextMine.mineAnn(src.toDF("doc_id", "embedding"),
        tgt.toDF("doc_id", "embedding"), "doc_id", "embedding",
        k = 4, marginThreshold = 1.1, nPlanes = 6, dim = 16, probeBits = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mined = src.count { case (id, _) => got.get(id).contains(id + 100L) }
    assert(mined >= 25, s"only $mined/30 planted pairs mined: $got")
  }

  test("anti-correlated region mines nothing: negative neighborhood mass cannot invert the ranking") {
    // every src-tgt cosine is negative -> sumF+sumB < 0 everywhere;
    // an unguarded ratio would hand the MOST dissimilar target the
    // biggest margin and mine it
    val src = Seq(1L -> Array(1f, 0f), 2L -> Array(0.9f, 0.1f))
    val tgt = Seq(10L -> Array(-1f, -0.1f), 20L -> Array(-0.8f, -0.3f))
    val got = runOp(src, tgt, k = 2, thr = 1.0)
    assert(got.isEmpty, got.toString)
  }

  test("k bound rejected") {
    val df = Seq((1L, Array(1f, 0f))).toDF("doc_id", "embedding")
    intercept[IllegalArgumentException] {
      BitextMine.mine(df, df, "doc_id", "embedding", k = 0)
    }
  }
}
