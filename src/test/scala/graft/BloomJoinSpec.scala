package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin
import graft.sources.Tables

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("B20 bloom semi-join is bit-identical to the plain semi-join") {
    val li = Tables.lineitem(spark, sfDir)
    val keys = Tables.part(spark, sfDir).filter(col("p_size") === 1)
      .select(col("p_partkey"))
    val expected = li.join(keys, col("l_partkey") === col("p_partkey"), "leftsemi")
      .collect().map(_.toString).sorted
    val got = BloomJoin.bloomSemiJoin(li, keys, "l_partkey", "p_partkey")
      .collect().map(_.toString).sorted
    assert(got.length == expected.length && got.sameElements(expected))
  }

  test("B20 same-named join keys resolve (no AMBIGUOUS_REFERENCE)") {
    val large = (1L to 100L).map(i => (i, s"p$i")).toDF("k", "payload")
    val small = Seq(3L, 7L, 50L).toDF("k")
    val got = BloomJoin.bloomSemiJoin(large, small, "k", "k")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(3L, 7L, 50L))
  }

  test("B20 bloom filter never false-negatives and prunes most non-matches") {
    val large = (1L to 20000L).map(i => i -> s"row$i").toDF("k", "payload")
    val small = (1L to 100L).map(_ * 97).toDF("sk") // sparse key set
    val kept = BloomJoin.bloomFiltered(large, small, "k", "sk",
        estItems = 1000L, numBits = 65536L)
      .select("k").collect().map(_.getLong(0)).toSet
    val trueKeys = small.collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(kept), "bloom filter must not drop real matches")
    // ~8 bits/item at est 1000 items: false-positive rate should stay
    // far below 10% of the 20k probes
    assert(kept.size < 100 + 2000, s"bloom pruned too little: ${kept.size} survivors")
  }

  test("B20+B2 fused q3: both blooms below their exchanges, result identical to plain q3") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.Analytics.q3ShippingPriorityBloom(spark, sfDir)
      val expected = graft.operators.Analytics.q3ShippingPriority(spark, sfDir)
        .collect().map(_.toString)
      assert(df.collect().map(_.toString).sameElements(expected),
        "bloom-fused q3 must be result-identical to plain q3")
      val plan = df.queryExecution.executedPlan.toString
      // a pruning filter on each fused fact side (AQE renders the tree
      // several times — initial plan, final plan, subqueries — so the
      // check is presence-below-exchange, not an occurrence count)
      assert(plan.contains("might_contain"),
        plan.linesIterator.take(12).mkString("\n"))
      // each filter runs pre-shuffle: the side's Exchange renders ABOVE it
      for (key <- Seq("o_custkey", "l_orderkey")) {
        val ex = plan.indexOf(s"Exchange hashpartitioning($key")
        val mc = plan.indexOf("might_contain", ex)
        assert(ex >= 0 && mc > ex,
          s"bloom filter must sit below the $key exchange:\n" +
            plan.linesIterator.take(30).mkString("\n"))
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("B20 adaptive gate: bloom builds under the threshold, drops out above it, same result") {
    val li = Tables.lineitem(spark, sfDir)
    val keys = Tables.part(spark, sfDir).filter(col("p_size") === 1)
      .select(col("p_partkey"))
    // gate ON: build side comfortably under a generous threshold
    val on = BloomJoin.bloomFilteredAdaptive(li, keys, "l_partkey", "p_partkey")
    assert(on.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "small build side must get a bloom")
    // gate OFF: zero-byte threshold refuses every build side; the probe
    // side must come back UNCHANGED — no filter, no extra build scan
    val off = BloomJoin.bloomFilteredAdaptive(li, keys, "l_partkey", "p_partkey",
      maxBuildBytes = 0L)
    assert(!off.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "oversized build side must skip the bloom")
    assert(off.queryExecution.optimizedPlan.sameResult(
      li.queryExecution.optimizedPlan),
      "gate-off must return the probe side unchanged")
    // and the downstream exact join makes both ends value-identical
    val expected = li.join(keys, col("l_partkey") === col("p_partkey"), "leftsemi")
      .collect().map(_.toString).sorted
    for (side <- Seq(on, off)) {
      val got = side.join(keys, side("l_partkey") === keys("p_partkey"), "leftsemi")
        .collect().map(_.toString).sorted
      assert(got.sameElements(expected))
    }
  }

  test("B20 plan shape: might_contain filter sits on the fact side BELOW the join exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sfDir)
      val keys = Tables.part(spark, sfDir).filter(col("p_size") === 1)
        .select(col("p_partkey"))
      val df = BloomJoin.bloomSemiJoin(li, keys, "l_partkey", "p_partkey")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan.linesIterator.take(10).mkString("\n"))
      // the pruning filter must run pre-shuffle: in the rendered tree the
      // fact-side Exchange appears ABOVE (before, textually) the filter
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning(l_partkey")
      val filterIdx = plan.indexOf("might_contain")
      assert(exchangeIdx >= 0 && filterIdx > exchangeIdx,
        "bloom filter must be below the fact-side exchange:\n" +
          plan.linesIterator.take(25).mkString("\n"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
