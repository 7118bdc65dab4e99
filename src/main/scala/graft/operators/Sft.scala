package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT (instruction-tuning) data validation — the format gate every
  * chat-template pipeline runs before tokenization: a conversation
  * that opens with the assistant, repeats a role, carries an empty
  * turn, or ends on the user either crashes the template or trains
  * the model on malformed dialogue, so the gate runs corpus-side,
  * not trainer-side.
  *
  * Scale shape: ONE shuffle keyed by conversation (the window and the
  * groupBy share the partitioning, so Catalyst plans a single
  * exchange), per-turn checks are map-local lag comparisons, and the
  * output is conversation-scale. State never exceeds a conversation's
  * turns within a partition — turn counts are template-bounded.
  */
object Sft {

  /** Per-conversation format verdicts over a (conv, turn, role,
    * content) table: first turn must be 'user', roles must alternate
    * (no turn repeats its predecessor's role), no turn may be empty
    * (null counts as empty), and the last turn must be 'assistant'.
    * Returns one row per conversation with each check and the
    * conjunction, ordered by nothing (callers order). */
  def validateConversations(turns: DataFrame, convCol: String, turnCol: String,
                            roleCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol))
    val lagged = turns.select(col(convCol), col(turnCol), col(roleCol), col(contentCol))
      .withColumn("_prev_role", lag(col(roleCol), 1).over(w))
    lagged.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        (min_by(col(roleCol), col(turnCol)) === "user").as("first_role_ok"),
        (coalesce(sum(when(col(roleCol) === col("_prev_role"), 1L).otherwise(0L)),
          lit(0L)) === 0L).as("alternation_ok"),
        (sum(when(col(contentCol).isNull || col(contentCol) === "", 1L)
          .otherwise(0L)) === 0L).as("no_empty_ok"),
        (max_by(col(roleCol), col(turnCol)) === "assistant").as("ends_assistant_ok"))
      .withColumn("valid",
        col("first_role_ok") && col("alternation_ok") &&
          col("no_empty_ok") && col("ends_assistant_ok"))
  }

  /** The same four verdicts computed from COLLECTED per-conversation
    * turn state — the D13 finalizer: a streaming aggregation maintains
    * `ts = collect_list(struct(idx, role, empty))` (mergeable and
    * order-free; turn order restores by sorting on the unique idx, so
    * micro-batch splits cannot shift any verdict), and this batch-side
    * pass turns the final state into [[validateConversations]]'s exact
    * output. Array algebra only — the adjacent-role check is a
    * zip_with of the role list against its own shift, which is empty
    * (vacuously true) for single-turn conversations. */
  def verdictsFromTurnState(state: DataFrame, convCol: String): DataFrame = {
    val ts = sort_array(col("ts"))
    val n = size(ts)
    val roles = transform(ts, t => t.getField("role"))
    val adjSame = zip_with(
      slice(roles, lit(1), n - 1), slice(roles, lit(2), n - 1),
      (a, b) => a === b)
    state.select(col(convCol),
        n.cast("long").as("n_turns"),
        (element_at(ts, 1).getField("role") === "user").as("first_role_ok"),
        (!exists(adjSame, b => b)).as("alternation_ok"),
        (!exists(ts, t => t.getField("empty"))).as("no_empty_ok"),
        (element_at(ts, n).getField("role") === "assistant").as("ends_assistant_ok"))
      .withColumn("valid",
        col("first_role_ok") && col("alternation_ok") &&
          col("no_empty_ok") && col("ends_assistant_ok"))
  }

  /** C113 — SFT packing with loss masks: lay validated conversations
    * out in fixed-capacity context windows and give every TURN its
    * global token offset plus the loss-mask flag (assistant turns
    * train, user turns are context only) — the exact artifact a chat
    * trainer's data loader consumes after C94's gate passes. Packing
    * is C22's concat-and-chunk at CONVERSATION granularity (a
    * conversation never reorders internally; chunks may split a
    * conversation at a turn's interior, which the trainer's attention
    * reset handles — same trade C22 documents), so offsets are two
    * nested window cumsums: conversation starts within the shard, turn
    * starts within the conversation.
    *
    * Scale shape: turn token counts are map-only; the conversation
    * totals aggregate on the conv key; [[Packing.sequencePack]] adds
    * one shard-keyed window; the join back to turns and the
    * within-conversation window share the conv partitioning. State
    * never exceeds a shard's conversation list or a conversation's
    * turns. Callers pass PRE-VALIDATED turns (compose with
    * [[validateConversations]] — packing malformed dialogue is the bug
    * the C94 gate exists to stop).
    *
    * Output per turn: (shard, conv, turn, role, n_tokens, start_off,
    * first_chunk, last_chunk, loss_mask), ordered by the caller. */
  def packConversations(turns: DataFrame, convCol: String, turnCol: String,
                        roleCol: String, contentCol: String,
                        shardOf: Column => Column, capacity: Int): DataFrame = {
    require(capacity > 0, s"packConversations: capacity > 0, got $capacity")
    val tc = turns.select(col(convCol), col(turnCol), col(roleCol),
      graft.functions.Text.tokenCount(col(contentCol)).as("n_tokens"))
    val conv = tc.groupBy(col(convCol))
      .agg(sum("n_tokens").as("conv_tokens"))
      .withColumn("shard", shardOf(col(convCol)))
    val packed = Packing.sequencePack(conv, "shard", convCol,
        "conv_tokens", capacity)
      .select(col(convCol), col("shard"), col("start_off").as("_conv_start"))
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tc.join(packed, Seq(convCol))
      .withColumn("start_off",
        col("_conv_start") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("shard"), col(convCol), col(turnCol), col(roleCol),
        col("n_tokens"), col("start_off"),
        expr(s"start_off div ${capacity}L").as("first_chunk"),
        when(col("n_tokens") > 0,
          expr(s"(start_off + n_tokens - 1) div ${capacity}L"))
          .otherwise(expr(s"start_off div ${capacity}L")).as("last_chunk"),
        (col(roleCol) === "assistant").as("loss_mask"))
  }
}
