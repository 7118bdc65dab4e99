package graft

import org.apache.spark.sql.functions._
import graft.io.Bucketing
import graft.sources.Tables

class BucketingSpec extends SparkSpec {

  test("B16 bucketed tables join with no exchange (co-located join)") {
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir), "b_orders", Seq("o_custkey"), 8, Seq("o_custkey"))
    Bucketing.writeBucketed(
      Tables.customer(spark, sfDir), "b_customer", Seq("c_custkey"), 8, Seq("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(8).mkString("\n"))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      // and the result is still correct
      assert(joined.count() == Tables.orders(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("B16 oracle demo joins with no exchange on the join keys") {
    // the driver-checked query (Analytics.bucketedColocatedJoin) must
    // itself take the co-located path: zero exchange on the JOIN keys —
    // the only exchanges left are the downstream groupBy/orderBy on
    // o_orderpriority, which any plan pays
    val df = graft.operators.Analytics.bucketedColocatedJoin(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(8).mkString("\n"))
    for (k <- Seq("o_orderkey", "l_orderkey"))
      assert(!plan.contains(s"Exchange hashpartitioning($k"),
        s"bucketed demo must not shuffle on $k:\n" +
          plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }
}
