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

  test("oversized right side fails fast with a clear message, not an OOM") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "lid", "t")
    val right = (1L to 20L).map(i => (1L, i, i.toDouble)).toDF("k", "rt", "pv")
    spark.conf.set("spark.graft.asof.broadcastMaxRows", "10")
    try {
      val e = intercept[Exception] {
        TemporalJoin.asofBroadcast(left, right, Seq("k"), "t", "rt", Seq("pv")).collect()
      }
      assert(e.getMessage.contains("broadcastMaxRows"),
        s"expected the size-guard message, got: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.asof.broadcastMaxRows")
  }

  test("null times: right rows excluded from the index, left rows get null payload") {
    import spark.implicits._
    val left = Seq((1L, 10L, Some(100L)), (1L, 11L, None))
      .toDF("k", "lid", "t")
    val right = Seq((1L, Some(50L), 1.0), (1L, None, 99.0))
      .toDF("k", "rt", "pv")
    val out = TemporalJoin.asofBroadcast(left, right, Seq("k"), "t", "rt", Seq("pv"))
      .collect().map(r => r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(10L) == Some(1.0))  // the null-time 99.0 row never joins as t=epoch
    assert(out(11L) == None)       // null left time: no prior instant
  }

  test("missing / ambiguous columns and non-long time types fail with clear errors") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "lid", "t")
    val right = Seq((1L, 50L, 1.0)).toDF("k", "rt", "pv")
    val e1 = intercept[Exception] {
      TemporalJoin.asofBroadcast(left, right, Seq("k"), "t", "nope", Seq("pv")).collect()
    }
    assert(e1.getMessage.contains("not found"))
    val dupRight = right.select(col("k"), col("rt"), col("pv"), col("pv"))
    val e2 = intercept[Exception] {
      TemporalJoin.asofBroadcast(left, dupRight, Seq("k"), "t", "rt", Seq("pv")).collect()
    }
    assert(e2.getMessage.contains("ambiguous"))
    val strTime = Seq((1L, "2024-01-01", 1.0)).toDF("k", "rt", "pv")
    val e3 = intercept[Exception] {
      TemporalJoin.asofBroadcast(left, strTime, Seq("k"), "t", "rt", Seq("pv")).collect()
    }
    assert(e3.getMessage.contains("long-backed"))
  }

  test("duplicate (key, time) right rows: both as-of forms pick the same deterministic winner") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "lid", "t")
    // three simultaneous right rows — greatest payload tuple must win
    val right = Seq((1L, 100L, 2.0), (1L, 100L, 7.0), (1L, 100L, 5.0))
      .toDF("k", "rt", "pv").repartition(3)
    val win = TemporalJoin.asofLastBefore(left, right, Seq("k"), "t", "rt", Seq("pv"))
      .collect().head.getDouble(3)
    val bc = TemporalJoin.asofBroadcast(left, right, Seq("k"), "t", "rt", Seq("pv"))
      .collect().head.getDouble(3)
    assert(win == 7.0 && bc == 7.0)
  }

  test("null payload value on the winning right row stays null in BOTH as-of forms") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "lid", "t")
    // the latest-prior right row (t=90) carries a NULL payload; an older
    // row (t=50) carries a value. The winning tuple's null must NOT be
    // back-filled from the older row.
    val right = Seq((1L, 50L, Some(1.0)), (1L, 90L, None))
      .toDF("k", "rt", "pv")
    val win = TemporalJoin.asofLastBefore(left, right, Seq("k"), "t", "rt", Seq("pv"))
      .collect().head
    val bc = TemporalJoin.asofBroadcast(left, right, Seq("k"), "t", "rt", Seq("pv"))
      .collect().head
    assert(win.isNullAt(3), s"union+window back-filled: $win")
    assert(bc.isNullAt(3), s"broadcast back-filled: $bc")
  }

  test("multi-column payload: winning row taken as one tuple, not per-column last-non-null") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "lid", "t")
    val right = Seq((1L, 50L, Some(1.0), Some("old")), (1L, 90L, None, Some("new")))
      .toDF("k", "rt", "pv", "tag")
    val win = TemporalJoin.asofLastBefore(left, right, Seq("k"), "t", "rt", Seq("pv", "tag"))
      .collect().head
    assert(win.isNullAt(3) && win.getString(4) == "new",
      s"expected (null, new) from the t=90 row, got $win")
  }

  test("binary and array payload types: tie-break compares via typed ordering, no ClassCastException") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "lid", "t")
    // duplicate (key, time) rows with Array[Byte] + Array[Long] payloads:
    // the old Comparable[Any] cast threw ClassCastException here
    val right = Seq(
      (1L, 100L, Array[Byte](1, 2), Seq(5L)),
      (1L, 100L, Array[Byte](1, 9), Seq(3L)),
      (1L, 100L, Array[Byte](1, 2), Seq(9L)))
      .toDF("k", "rt", "bin", "arr")
    val bc = TemporalJoin.asofBroadcast(left, right, Seq("k"), "t", "rt", Seq("bin", "arr"))
      .collect().head
    assert(bc.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 9),
      s"greatest (bin, arr) tuple must win: $bc")
    assert(bc.getAs[scala.collection.Seq[Long]]("arr").toSeq == Seq(3L))
  }
}
