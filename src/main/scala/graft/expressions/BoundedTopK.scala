package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

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
  * Input: struct(sim double, id bigint); k is a literal int.
  * Output: array<struct<sim double, id bigint>> best-first — explode
  * with posexplode for (rank-1, entry) rows. Ordering matches the
  * window formulation exactly (sim desc, id asc), so results are
  * bit-identical to the previous plan shape.
  */
case class BoundedTopK(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_topk: k must be an integer literal, got $other")
  }

  // head of the queue = the WORST kept entry (lowest sim, then largest
  // id), so bounded insertion is an O(log k) peek/replace
  private object WorstFirst extends Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](WorstFirst)

  private def insert(q: mutable.PriorityQueue[(Double, Long)],
                     e: (Double, Long)): Unit = {
    if (q.size < k) q.enqueue(e)
    else if (WorstFirst.compare(e, q.head) < 0) { q.dequeue(); q.enqueue(e) }
  }

  override def update(q: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        insert(q, (row.getDouble(0), row.getLong(1)))
    }
    q
  }

  override def merge(q: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(q, _))
    q
  }

  override def eval(q: mutable.PriorityQueue[(Double, Long)]): Any = {
    // under WorstFirst, "least" = best, so a plain sort is best-first
    val sorted = q.toArray.sorted(WorstFirst)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(q: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + q.size * 16)
    bb.putInt(q.size)
    q.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    q
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects struct<double, bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sim", DoubleType), StructField("id", LongType))),
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
