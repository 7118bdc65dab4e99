package graft

/** C79 cluster-balance spec: the demo's keep fractions recompute from
  * driver math, membership is deterministic, and the resample actually
  * flattens the cluster-size spread. */
class ClusterBalanceSpec extends SparkSpec {

  private lazy val rows =
    graft.operators.TextDemos.clusterBalance(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("keep fractions are (n/nmin)^(alpha-1) of the assigned sizes") {
    val nmin = rows.map(_._2).min
    rows.foreach { case (c, nBefore, nKept, frac) =>
      val want = BigDecimal(java.math.BigDecimal.valueOf(
          math.pow(nBefore.toDouble / nmin, -0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(frac === want, s"cluster $c")
      assert(nKept <= nBefore && nKept > 0, s"cluster $c: $nKept of $nBefore")
    }
    // the smallest cluster is the anchor: keeps everything
    val anchor = rows.minBy(_._2)
    assert(anchor._4 === 1.0 && anchor._3 === anchor._2)
  }

  test("resampling flattens the spread and is deterministic") {
    val beforeSpread = rows.map(_._2).max.toDouble / rows.map(_._2).min
    val afterSpread = rows.map(_._3).max.toDouble / rows.map(_._3).min
    assert(afterSpread <= beforeSpread,
      s"spread grew: $beforeSpread -> $afterSpread")
    val again = graft.operators.TextDemos.clusterBalance(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq === rows.toSeq)
  }
}
