package graft

/** C79 cluster-balance spec: the demo's keep fractions recompute from
  * driver math, membership is deterministic, and the resample actually
  * flattens the cluster-size spread. */
class ClusterBalanceSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("a cluster whose sample keeps zero rows still reports its row") {
    // pick 16 keys whose md5 keep-bucket sits in the top half; with
    // one singleton anchor cluster, the big cluster's keep_frac is
    // (16/1)^-0.5 = 0.25 < every member's bucket -> zero kept
    val buckets = (0L until 400L).toDF("k")
      .select(col("k"), pmod(graft.functions.Vec.md5Hash60(col("k").cast("string")),
        lit(1000000)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val highKeys = (0L until 400L).filter(k => buckets(k) >= 500000).take(16)
    assert(highKeys.size === 16)
    val anchorKey = (0L until 400L).find(k => buckets(k) < 250000).get
    val df = (highKeys.map(k => ("big", k)) :+ (("tiny", anchorKey)))
      .toDF("cluster", "k")
    val got = graft.operators.Sampling
      .temperatureMixSummary(df, "cluster", "k", alpha = 0.5)
      .orderBy("cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(("big", 16L, 0L, 0.25), ("tiny", 1L, 1L, 1.0)))
  }

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
