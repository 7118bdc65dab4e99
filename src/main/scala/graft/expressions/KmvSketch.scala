package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch: keeps the k smallest
  * DISTINCT hash values seen, as a mergeable bounded aggregate.
  *
  * The 100 TB decontamination-triage primitive: before paying a
  * shuffle join of two corpora's shingle hashes (contamination_check,
  * C21), estimate their distinct cardinalities and Jaccard overlap
  * from two k-long sketches — each corpus reduces map-side to ≤ k
  * longs per partition (ObjectHashAggregate partial mode), the shuffle
  * carries only those bounded buffers, and the driver-side combine is
  * k log k. Two corpora that share nothing skip the exact scan
  * entirely; the estimators are the standard KMV forms (Bar-Yossef et
  * al. 2002; Beyer et al. 2007, SIGMOD):
  *
  *   D̂          = (k-1) / U_(k)            (U_(k) = kth smallest, normalized)
  *   Ĵ(A,B)     = |KMV_k(A ∪ B) ∩ A ∩ B| / k
  *
  * Unlike HLL, the sketch supports SET operations (union = merge the
  * arrays and re-truncate; intersection via the Jaccard estimator), so
  * pairwise corpus overlap composes from per-corpus sketches without
  * rescanning either corpus.
  *
  * DETERMINISM: the sketch is a pure order statistic of the exact hash
  * values — no randomness, no estimation inside the aggregate — so the
  * same inputs produce the same array in any engine; the driver's
  * DuckDB gate mirrors it with `SELECT DISTINCT h ORDER BY h LIMIT k`.
  * Below k distinct values the sketch IS the exact distinct set.
  *
  * Input: a LONG hash column (hash upstream — md5-60 for cross-engine
  * verification, xxhash64 in production; nulls are skipped). k must be
  * an integer literal >= 1. Output: array<long>, ascending.
  */
case class KmvSketch(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_kmv: k must be an integer literal, got $other")
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(s: mutable.TreeSet[Long], h: Long): Unit =
    if (s.size < k) s.add(h)
    else if (h < s.last && s.add(h)) s.remove(s.last)

  override def update(s: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(s, v.asInstanceOf[Long])
    s
  }

  override def merge(s: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(s, _))
    s
  }

  override def eval(s: mutable.TreeSet[Long]): Any =
    new GenericArrayData(s.toArray)

  override def serialize(s: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * s.size)
    bb.putInt(s.size)
    s.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => kExpr match {
      case Literal(v: Int, IntegerType) if v >= 1 => TypeCheckResult.TypeCheckSuccess
      case Literal(v: Int, IntegerType) =>
        TypeCheckResult.TypeCheckFailure(s"graft_kmv: k must be >= 1, got $v")
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv: k must be an integer literal, got ${other.sql}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a BIGINT hash column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
}
