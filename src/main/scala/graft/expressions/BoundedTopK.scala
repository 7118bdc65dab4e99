package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Bounded top-k aggregate: keeps the k best (sim, id) pairs ordered by
  * (sim desc, id asc), with both the partial and the merged state
  * capped at k entries.
  *
  * This is the scale-safe replacement for
  * `Window.partitionBy(query).orderBy(sim desc)` + `rank <= k`
  * similarity ranking: a window moves *every* scored candidate of a
  * query to one task before discarding all but k — with few queries
  * and a large corpus that one task absorbs the whole scored stream.
  * As an aggregate, each input partition reduces to at most k entries
  * map-side (ObjectHashAggregate partial mode), the shuffle carries
  * only those bounded buffers, and the final merge is k·partitions
  * per query. Same trick the repo's topkPerGroup demo documents, as a
  * reusable native aggregate.
  *
  * Input: struct(sim double, id T) for ANY orderable id type T
  * (string doc ids, ints, dates, even structs) — the tie-break uses
  * Catalyst's interpreted ordering for T, so results match a
  * `Window.orderBy(sim desc, id asc)` formulation exactly. k must be
  * an integer literal >= 1 (checked at analysis time). Entries with a
  * null sim or null id are skipped (a null id cannot be ranked
  * deterministically; a null sim has no rank position).
  * Output: array<struct<sim double, id T>> best-first — explode with
  * posexplode for (rank-1, entry) rows.
  */
case class BoundedTopK(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any)]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_topk: k must be an integer literal, got $other")
  }

  private lazy val idField: StructField =
    child.dataType.asInstanceOf[StructType].fields(1)
  private lazy val idType: DataType = idField.dataType
  private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idType)

  // head of the queue = the WORST kept entry (lowest sim, then largest
  // id), so bounded insertion is an O(log k) peek/replace
  private object WorstFirst extends Ordering[(Double, Any)] {
    override def compare(x: (Double, Any), y: (Double, Any)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else idOrdering.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty[(Double, Any)](WorstFirst)

  private def insert(q: mutable.PriorityQueue[(Double, Any)],
                     e: (Double, Any)): Unit = {
    if (q.size < k) q.enqueue(e)
    else if (WorstFirst.compare(e, q.head) < 0) { q.dequeue(); q.enqueue(e) }
  }

  override def update(q: mutable.PriorityQueue[(Double, Any)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Any)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        // copy: the input row's buffers (UTF8String etc.) are reused
        // across rows by the aggregate iterator
        insert(q, (row.getDouble(0), InternalRow.copyValue(row.get(1, idType))))
    }
    q
  }

  override def merge(q: mutable.PriorityQueue[(Double, Any)],
                     other: mutable.PriorityQueue[(Double, Any)]): mutable.PriorityQueue[(Double, Any)] = {
    other.foreach(insert(q, _))
    q
  }

  override def eval(q: mutable.PriorityQueue[(Double, Any)]): Any = {
    // under WorstFirst, "least" = best, so a plain sort is best-first
    val sorted = q.toArray.sorted(WorstFirst)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  // entries serialize as length-prefixed UnsafeRow(sim, id) images —
  // works for any id type without a per-type encoder
  @transient private lazy val entryProj =
    UnsafeProjection.create(Array[DataType](DoubleType, idType))

  override def serialize(q: mutable.PriorityQueue[(Double, Any)]): Array[Byte] = {
    val rows = q.toArray.map { case (s, i) =>
      entryProj(InternalRow(s, i)).copy()
    }
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      bb.put(r.getBytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Any)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    val row = new UnsafeRow(2)
    var pos = 4
    var i = 0
    while (i < n) {
      val size = bb.getInt(pos)
      row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + pos + 4, size)
      q.enqueue((row.getDouble(0), InternalRow.copyValue(row.get(1, idType))))
      pos += 4 + size
      i += 1
    }
    q
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == DoubleType =>
      if (!RowOrdering.isOrderable(b.dataType))
        TypeCheckResult.TypeCheckFailure(
          s"graft_topk: id type ${b.dataType.simpleString} is not orderable")
      else kExpr match {
        case Literal(v: Int, IntegerType) if v >= 1 =>
          TypeCheckResult.TypeCheckSuccess
        case Literal(v: Int, IntegerType) =>
          TypeCheckResult.TypeCheckFailure(s"graft_topk: k must be >= 1, got $v")
        case other =>
          TypeCheckResult.TypeCheckFailure(
            s"graft_topk: k must be an integer literal, got ${other.sql}")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects struct<double, <orderable>>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sim", DoubleType),
      StructField("id", idType, idField.nullable))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
}
