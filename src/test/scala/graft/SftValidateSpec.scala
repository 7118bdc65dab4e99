package graft

import org.apache.spark.sql.functions._

import graft.operators.Sft

/** C94 sft_validate: each check isolated on a closed-form fixture,
  * null-content handling, and single-turn edge cases.
  */
class SftValidateSpec extends SparkSpec {
  import spark.implicits._

  private def run(turns: Seq[(Long, Long, String, String)]): Map[Long, (Long, Boolean, Boolean, Boolean, Boolean, Boolean)] =
    Sft.validateConversations(
        turns.toDF("conv_id", "turn_idx", "role", "content"),
        "conv_id", "turn_idx", "role", "content")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap

  test("each violation trips exactly its own check") {
    val got = run(Seq(
      // conv 1: well-formed two-turn exchange
      (1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello"),
      // conv 2: opens with the assistant
      (2L, 0L, "assistant", "hi"), (2L, 1L, "user", "?"),
      // conv 3: consecutive user turns mid-conversation
      (3L, 0L, "user", "a"), (3L, 1L, "user", "b"), (3L, 2L, "assistant", "c"),
      // conv 4: empty middle turn
      (4L, 0L, "user", "a"), (4L, 1L, "assistant", ""), (4L, 2L, "user", "b"),
      // conv 5: ends on the user
      (5L, 0L, "user", "a"), (5L, 1L, "assistant", "b"), (5L, 2L, "user", "c")))
    assert(got(1L) == ((2L, true, true, true, true, true)))
    assert(got(2L) == ((2L, false, true, true, false, false))) // also ends on user
    assert(got(3L) == ((3L, true, false, true, true, false)))
    assert(got(4L) == ((3L, true, true, false, false, false))) // also ends on user
    assert(got(5L) == ((3L, true, true, true, false, false)))
  }

  test("null content counts as empty; a lone user turn fails only the ends check") {
    val turns = Seq((1L, 0L, "user", null.asInstanceOf[String]))
      .toDF("conv_id", "turn_idx", "role", "content")
    val r = Sft.validateConversations(turns, "conv_id", "turn_idx", "role", "content")
      .collect().head
    assert(r.getLong(1) == 1L)
    assert(r.getBoolean(2), "first role is user")
    assert(r.getBoolean(3), "one turn cannot break alternation")
    assert(!r.getBoolean(4), "null content is empty")
    assert(!r.getBoolean(5), "ends on user")
    assert(!r.getBoolean(6))
  }

  test("D13 finalizer equals the batch validator on every fixture, any collection order") {
    val turns = Seq(
      (1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello"),
      (2L, 0L, "assistant", "hi"), (2L, 1L, "user", "?"),
      (3L, 0L, "user", "a"), (3L, 1L, "user", "b"), (3L, 2L, "assistant", "c"),
      (4L, 0L, "user", "a"), (4L, 1L, "assistant", ""), (4L, 2L, "user", "b"),
      (5L, 0L, "user", null.asInstanceOf[String]))
    // REVERSED arrival order: the collected state must not care
    val df = turns.reverse.toDF("conv_id", "turn_idx", "role", "content")
    val state = df.groupBy(col("conv_id"))
      .agg(collect_list(struct(col("turn_idx").as("idx"), col("role"),
        (col("content").isNull || col("content") === "").as("empty"))).as("ts"))
    val viaState = Sft.verdictsFromTurnState(state, "conv_id")
      .orderBy("conv_id").collect().map(_.toSeq).toSeq
    val viaBatch = Sft.validateConversations(
        turns.toDF("conv_id", "turn_idx", "role", "content"),
        "conv_id", "turn_idx", "role", "content")
      .orderBy("conv_id").collect().map(_.toSeq).toSeq
    assert(viaState == viaBatch)
  }

  test("demo plants fire on sf0.001: every check fails somewhere, some conv is valid") {
    val rows = graft.operators.TextDemos.sftValidateDemo(spark, sfDir).collect()
    assert(rows.length == 40)
    assert(rows.exists(!_.getBoolean(3)), "a %17 plant must break alternation")
    assert(rows.exists(!_.getBoolean(4)), "a %23 plant must blank a turn")
    assert(rows.exists(!_.getBoolean(5)), "an odd-length conv must end on user")
    assert(rows.exists(_.getBoolean(6)), "some conversation should survive")
  }
}
