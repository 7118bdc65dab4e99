package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Broadcast as-of join — the full custom-operator ladder
  * (LogicalPlan -> Strategy -> SparkPlan), used where composition
  * genuinely cannot express the plan we need:
  *
  * [[graft.operators.TemporalJoin.asofLastBefore]] (union + window) is
  * the right shape when both sides are large — but it always shuffles
  * the big side by key. When the right side is dimension-sized (rate
  * tables, config history), the optimal plan is: collect + sort the
  * right side per key, broadcast it, and binary-search per probe row —
  * ZERO shuffle of the fact side. No Spark built-in expresses
  * "broadcast + inequality top-1 per row": broadcast hash join needs
  * pure equality; composing join+groupBy reintroduces a shuffle.
  *
  * Semantics match asofLastBefore: latest right row with rightTime <=
  * leftTime per key (ties: the simultaneous right row is visible);
  * unmatched left rows keep null payloads (left outer).
  */
case class BroadcastAsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    keyCols: Seq[String], leftTime: String, rightTime: String,
    payload: Seq[String]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.filter(a => payload.contains(a.name)).map(_.withNullability(true))

  /** Attributes the physical operator consumes by name. Without this
    * (the default is the expressions' references — here none), column
    * pruning under a `count(*)` parent strips the children to empty
    * schemas and the name lookups break. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => keyCols.contains(a.name) || a.name == leftTime) ++
      right.output.filter(a => keyCols.contains(a.name) || a.name == rightTime ||
        payload.contains(a.name)))

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): BroadcastAsofJoin =
    copy(left = l, right = r)
}

object BroadcastAsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BroadcastAsofJoin(l, r, keys, lt, rt, pay) =>
      BroadcastAsofJoinExec(planLater(l), planLater(r), keys, lt, rt, pay) :: Nil
    case _ => Nil
  }
}

case class BroadcastAsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    keyCols: Seq[String], leftTime: String, rightTime: String,
    payload: Seq[String]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.filter(a => payload.contains(a.name)).map(_.withNullability(true))

  // no required child distribution: the whole point is no shuffle

  override protected def doExecute(): RDD[InternalRow] = {
    val rOut = right.output
    val rKeyIdx = keyCols.map(k => rOut.indexWhere(_.name == k))
    val rTimeIdx = rOut.indexWhere(_.name == rightTime)
    val rPayIdx = payload.map(p => rOut.indexWhere(_.name == p))
    val rKeyTypes = rKeyIdx.map(rOut(_).dataType)
    val rPayTypes = rPayIdx.map(rOut(_).dataType)

    // build key -> time-sorted (time, payload values) on the driver
    val collected = right.executeCollect()
    val index: Map[Seq[Any], Array[(Long, Array[Any])]] = collected
      .map { row =>
        val key = rKeyIdx.zip(rKeyTypes).map { case (i, t) => row.get(i, t) }.toSeq
        val t = row.getLong(rTimeIdx)
        val pay = rPayIdx.zip(rPayTypes).map { case (i, dt) => row.get(i, dt) }.toArray
        (key, t, pay)
      }
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(r => (r._2, r._3)).sortBy(_._1) }
    val bc = session.sparkContext.broadcast(index)

    val lOut = left.output
    val lKeyIdx = keyCols.map(k => lOut.indexWhere(_.name == k))
    val lKeyTypes = lKeyIdx.map(lOut(_).dataType)
    val lTimeIdx = lOut.indexWhere(_.name == leftTime)
    val nPay = payload.size

    left.execute().mapPartitions({ it =>
      val joined = new JoinedRow
      val nullPay = new GenericInternalRow(nPay)
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      it.map { lrow =>
        val key = lKeyIdx.zip(lKeyTypes).map { case (i, t) => lrow.get(i, t) }.toSeq
        val t = lrow.getLong(lTimeIdx)
        val arr = bc.value.getOrElse(key, null)
        val payRow = if (arr == null) nullPay else {
          // binary search: last entry with time <= t
          var lo = 0; var hi = arr.length - 1; var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (arr(mid)._1 <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
          if (ans < 0) nullPay else new GenericInternalRow(arr(ans)._2)
        }
        proj(joined(lrow, payRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): BroadcastAsofJoinExec =
    copy(left = l, right = r)
}
