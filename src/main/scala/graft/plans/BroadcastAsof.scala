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

  /** resolve `name` in `out`, failing clearly on missing or ambiguous
    * columns instead of the silent -1 of a bare indexWhere */
  private def resolve(out: Seq[Attribute], name: String, side: String): Int = {
    val idx = out.indexWhere(_.name == name)
    require(idx >= 0,
      s"BroadcastAsofJoin: column '$name' not found on the $side side " +
        s"(available: ${out.map(_.name).mkString(", ")})")
    require(out.lastIndexWhere(_.name == name) == idx,
      s"BroadcastAsofJoin: column '$name' is ambiguous on the $side side")
    idx
  }

  private def requireLongBacked(out: Seq[Attribute], idx: Int, role: String): Unit = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val dt = out(idx).dataType
    require(dt == LongType || dt == TimestampType || dt == TimestampNTZType,
      s"BroadcastAsofJoin: $role must be bigint or timestamp " +
        s"(long-backed), got ${dt.simpleString} for '${out(idx).name}'")
  }

  // lexicographic comparison of payload tuples (nulls first) — the
  // deterministic tie-breaker for duplicate (key, time) right rows,
  // mirroring asofLastBefore's payload-struct window orderBy. Uses
  // Catalyst's per-type interpreted ordering, so binary/array/struct
  // payloads compare correctly (a Comparable cast would throw).
  private def comparePayload(ords: Array[Ordering[Any]])(
      a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < a.length) {
      val x = a(i); val y = b(i)
      val c =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else ords(i).compare(x, y)
      if (c != 0) return c
      i += 1
    }
    0
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rOut = right.output
    val rKeyIdx = keyCols.map(resolve(rOut, _, "right"))
    val rTimeIdx = resolve(rOut, rightTime, "right")
    val rPayIdx = payload.map(resolve(rOut, _, "right"))
    requireLongBacked(rOut, rTimeIdx, "rightTime")
    val rKeyTypes = rKeyIdx.map(rOut(_).dataType)
    val rPayTypes = rPayIdx.map(rOut(_).dataType)
    rPayIdx.zip(rPayTypes).foreach { case (i, dt) =>
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt),
        s"BroadcastAsofJoin: payload column '${rOut(i).name}' has " +
          s"non-orderable type ${dt.simpleString} — it cannot serve as a " +
          s"deterministic tie-breaker for duplicate (key, time) right rows")
    }
    val payOrds: Array[Ordering[Any]] = rPayTypes.map(
      org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering).toArray
    val cmpPay = comparePayload(payOrds) _

    // driver-side build is the broadcast pattern — but only for a
    // dimension-sized right side; fail fast with a clear message
    // instead of an OOM when misused
    val maxRows = session.conf
      .get("spark.graft.asof.broadcastMaxRows", "5000000").toLong
    val collected = right.executeTake((maxRows + 1).min(Int.MaxValue).toInt)
    require(collected.length <= maxRows,
      s"BroadcastAsofJoin: right side exceeds " +
        s"spark.graft.asof.broadcastMaxRows=$maxRows rows — it is not " +
        s"dimension-sized; use TemporalJoin.asofLastBefore (shuffled) instead")

    // key -> (time, payload-tuple)-sorted entries; null-time right rows
    // are excluded (a null timestamp is never "the latest prior value")
    val index: Map[Seq[Any], Array[(Long, Array[Any])]] = collected.iterator
      .filterNot(_.isNullAt(rTimeIdx))
      .map { row =>
        val key = rKeyIdx.zip(rKeyTypes).map { case (i, t) => row.get(i, t) }.toSeq
        val t = row.getLong(rTimeIdx)
        val pay = rPayIdx.zip(rPayTypes).map { case (i, dt) => row.get(i, dt) }.toArray
        (key, t, pay)
      }.toArray
      .groupBy(_._1)
      .map { case (k, rows) =>
        k -> rows.map(r => (r._2, r._3)).sortWith { (p, q) =>
          p._1 < q._1 || (p._1 == q._1 && cmpPay(p._2, q._2) < 0)
        }
      }
    val bc = session.sparkContext.broadcast(index)

    val lOut = left.output
    val lKeyIdx = keyCols.map(resolve(lOut, _, "left"))
    val lKeyTypes = lKeyIdx.map(lOut(_).dataType)
    val lTimeIdx = resolve(lOut, leftTime, "left")
    requireLongBacked(lOut, lTimeIdx, "leftTime")
    val nPay = payload.size

    left.execute().mapPartitions({ it =>
      val joined = new JoinedRow
      val nullPay = new GenericInternalRow(nPay)
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      it.map { lrow =>
        // a null left time has no "prior" instant: null payload
        val payRow = if (lrow.isNullAt(lTimeIdx)) nullPay else {
          val key = lKeyIdx.zip(lKeyTypes).map { case (i, t) => lrow.get(i, t) }.toSeq
          val t = lrow.getLong(lTimeIdx)
          val arr = bc.value.getOrElse(key, null)
          if (arr == null) nullPay else {
            // binary search: last entry with time <= t
            var lo = 0; var hi = arr.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (arr(mid)._1 <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans < 0) nullPay else new GenericInternalRow(arr(ans)._2)
          }
        }
        proj(joined(lrow, payRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): BroadcastAsofJoinExec =
    copy(left = l, right = r)
}
