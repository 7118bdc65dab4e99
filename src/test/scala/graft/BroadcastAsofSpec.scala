package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoin
import graft.sources.Tables

class BroadcastAsofSpec extends SparkSpec {

  private def sides() = {
    val ev = Tables.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    (errors, purchases)
  }

  test("custom physical operator matches the union+window as-of join") {
    val (errors, purchases) = sides()
    val expected = TemporalJoin.asofLastBefore(errors, purchases,
        Seq("user_id"), "ts", "p_ts", Seq("p_value"))
      .collect().map(_.toString).sorted
    val got = TemporalJoin.asofBroadcast(errors, purchases,
        Seq("user_id"), "ts", "p_ts", Seq("p_value"))
      .collect().map(_.toString).sorted
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
  }

  test("plan uses BroadcastAsofJoinExec with zero exchanges") {
    val (errors, purchases) = sides()
    val df = TemporalJoin.asofBroadcast(errors, purchases,
      Seq("user_id"), "ts", "p_ts", Seq("p_value"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsofJoin"), plan.linesIterator.take(6).mkString("\n"))
    assert(!plan.contains("Exchange"),
      "fact side must not shuffle:\n" + plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("unmatched keys and all-later right rows yield null payloads") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 20L, 100L)).toDF("k", "lid", "t")
    val right = Seq((1L, 150L, 9.9)).toDF("k", "rt", "pv") // only later than t=100
    val out = TemporalJoin.asofBroadcast(left, right, Seq("k"), "t", "rt", Seq("pv"))
      .collect().map(r => r.getLong(1) -> r.isNullAt(3)).toMap
    assert(out == Map(10L -> true, 20L -> true))
  }
}
