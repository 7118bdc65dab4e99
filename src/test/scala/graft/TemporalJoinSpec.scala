package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TemporalJoin

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  def t(s: Int) = new Timestamp(s * 1000L)

  test("B14 as-of join picks latest prior right row per key") {
    val left = Seq((1, 10L, t(100)), (1, 11L, t(50)), (2, 20L, t(100)))
      .toDF("k", "lid", "lt")
    val right = Seq((1, t(40), "a"), (1, t(90), "b"), (1, t(150), "c"), (3, t(10), "z"))
      .toDF("k", "rt", "payload")
    val out = TemporalJoin.asofLastBefore(left, right, Seq("k"), "lt", "rt", Seq("payload"))
      .collect().map(r => r.getAs[Long]("lid") -> r.getAs[String]("payload")).toMap
    assert(out == Map(10L -> "b", 11L -> "a", 20L -> null)) // 150>100 excluded; key 2 no match
  }

  test("B14 equal timestamps: simultaneous right row is visible") {
    val left = Seq((1, 10L, t(100))).toDF("k", "lid", "lt")
    val right = Seq((1, t(100), "same")).toDF("k", "rt", "payload")
    val out = TemporalJoin.asofLastBefore(left, right, Seq("k"), "lt", "rt", Seq("payload"))
    assert(out.head.getAs[String]("payload") == "same")
  }

  test("B15 binned range join equals naive between-join") {
    val points = (1 to 300).map(i => i * 0.7).toDF("p")
    val intervals = (1 to 40).map(i => (i, i * 4.0, i * 4.0 + 6.0)).toDF("id", "lo", "hi")
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "id").collect().map(_.toString).sorted
    val binned = TemporalJoin.rangeBinned(points, intervals, "p", "lo", "hi", binWidth = 5.0)
      .select("p", "id").collect().map(_.toString).sorted
    assert(binned.sameElements(naive))
  }

  test("B15 plan is a hash join on bins, not nested-loop") {
    val points = (1 to 300).map(i => i * 0.7).toDF("p")
    val intervals = (1 to 40).map(i => (i, i * 4.0, i * 4.0 + 6.0)).toDF("id", "lo", "hi")
    val plan = TemporalJoin.rangeBinned(points, intervals, "p", "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.linesIterator.take(5).mkString("\n"))
  }
}
