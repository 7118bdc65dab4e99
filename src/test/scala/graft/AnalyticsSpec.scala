package graft

import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {

  test("q1 pricing summary: one row per (returnflag, linestatus), sums positive") {
    val rows = Analytics.q1PricingSummary(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = Analytics.q3ShippingPriority(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 uses broadcast joins for the dimension sides") {
    val plan = Analytics.q5LocalSupplier(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("window rank keeps at most 3 orders per customer") {
    val df = Analytics.windowRank(spark, sfDir)
    val maxPerCust = df.groupBy("o_custkey").count().agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(maxPerCust <= 3)
  }

  test("rollup has grand-total row equal to orders count") {
    val df = Analytics.rollupAgg(spark, sfDir)
    val total = df.filter("status = 'ALL' AND priority = 'ALL'").head.getAs[Long]("n_orders")
    assert(total == graft.sources.Tables.orders(spark, sfDir).count())
  }

  test("cube emits all four grouping sets, flags distinguish subtotals, slices sum to the total") {
    val df = Analytics.cubeAgg(spark, sfDir)
    val rows = df.collect()
    val total = graft.sources.Tables.orders(spark, sfDir).count()
    // all four grouping sets present
    val sets = rows.map(r => (r.getAs[Long]("g_status"), r.getAs[Long]("g_year"))).toSet
    assert(sets == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)), s"got $sets")
    // grand total row
    val grand = rows.filter(r => r.getAs[Long]("g_status") == 1 && r.getAs[Long]("g_year") == 1)
    assert(grand.length == 1 && grand.head.getAs[Long]("n_orders") == total)
    // every marginal slice re-sums to the full count
    for ((gs, gy) <- Seq((0L, 0L), (0L, 1L), (1L, 0L))) {
      val n = rows.filter(r => r.getAs[Long]("g_status") == gs && r.getAs[Long]("g_year") == gy)
        .map(_.getAs[Long]("n_orders")).sum
      assert(n == total, s"slice ($gs,$gy) sums to $n, want $total")
    }
    // one scan, one Expand — not four separate aggregates
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "cube must plan through a single Expand")
  }

  test("moving hour window matches a brute-force per-user frame") {
    import org.apache.spark.sql.functions._
    val got = Analytics.movingWindowAgg(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_hour"), r.getAs[Double]("sum_value_hour")))).toMap
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.size == ev.length, "one output row per event")
    val byUser = ev.groupBy(_._2)
    val hourUs = 3600L * 1000 * 1000
    ev.foreach { case (id, u, us, _) =>
      val frame = byUser(u).filter(e => e._3 <= us && e._3 >= us - hourUs)
      val (n, s) = got(id)
      assert(n == frame.length.toLong, s"event $id count: got $n want ${frame.length}")
      val want = frame.map(e => BigDecimal(e._4).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(math.abs(s - want) < 1e-6, s"event $id sum: got $s want $want")
    }
  }

  test("json extract sums k per event type") {
    val rows = Analytics.jsonExtract(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("sum_k") >= 0))
  }

  test("sessionize: session bounds ordered, event count conserved") {
    val df = Analytics.sessionize(spark, sfDir)
    val rows = df.collect()
    assert(rows.forall(r => !r.getAs[java.sql.Timestamp]("session_start").after(r.getAs[java.sql.Timestamp]("session_end"))))
    val totalEvents = rows.map(_.getAs[Long]("n_events")).sum
    assert(totalEvents == graft.sources.Tables.events(spark, sfDir).count())
  }

  test("B18 sketch aggregates: in-bound flags true, exacts agree with the exact queries") {
    val rows = Analytics.approxSketches(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Boolean]("parts_within_bound")))
    assert(rows.forall(_.getAs[Boolean]("p50_within_bound")))
    val exact = Analytics.distinctCount(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_parts")).toMap
    val exactP50 = Analytics.percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50_price")).toMap
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getAs[Long]("exact_parts") == exact(flag))
      assert(r.getAs[Double]("exact_p50") == exactP50(flag))
    }
  }

  test("topk per group keeps at most 2 per part") {
    val df = Analytics.topkPerGroup(spark, sfDir)
    val maxPerPart = df.groupBy("l_partkey").count().agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(maxPerPart <= 2)
  }
}
