package graft.operators

import org.apache.spark.sql.DataFrame
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
}
