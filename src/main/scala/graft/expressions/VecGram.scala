package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Second-moment (Gram) summary aggregate: one pass over a vector
  * column accumulating `[n, Σx (d), Σ x xᵀ (upper triangle, d(d+1)/2)]`
  * — everything PCA/covariance needs, in a single dimension-scale
  * buffer.
  *
  * This is the scale-correct shape for covariance at 100 TB: the
  * naive relational form (posexplode to (i, j, xᵢ·xⱼ) pairs and
  * groupBy) multiplies the scan by d² rows before the shuffle — for
  * d = 64 a 4096× blowup of a corpus-sized table. Here each input
  * partition folds into ONE flat double buffer (d = 64 → ~17 KB),
  * partials merge by elementwise add (associative and commutative, so
  * map-side combine applies), and the driver receives one buffer per
  * reduce — the whole shuffle is (partitions × 17 KB), independent of
  * row count.
  *
  * Input: array<float> or array<double> of exactly `dim` elements
  * (checked per row — a ragged vector corrupts every moment, so it
  * fails loudly). Null vectors are skipped. Output: the raw moment
  * buffer as array<double>; [[graft.operators.Similarity.pcaFit]]
  * turns it into mean/covariance/eigenvectors driver-side
  * (dimension-scale math, not data-scale).
  */
case class VecGram(
    child: Expression,
    dimExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private lazy val dim: Int = dimExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_gram: dim must be an integer literal, got $other")
  }

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def bufLen: Int = 1 + dim + dim * (dim + 1) / 2

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != dim) throw new IllegalArgumentException(
      s"graft_gram: expected $dim-element vectors, got ${arr.numElements()}")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      // a null COMPONENT would silently read as 0.0 from unsafe array
      // data, corrupting every moment — same fail-loudly discipline as
      // the ragged-vector check
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_gram: vector component $i is null (dense vectors required)")
      x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    var t = 1 + dim
    while (i < dim) {
      buf(1 + i) += x(i)
      var j = i
      while (j < dim) {
        buf(t) += x(i) * x(j)
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(d => d: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => dimExpr match {
      case Literal(v: Int, IntegerType) if v >= 1 && v <= 4096 =>
        TypeCheckResult.TypeCheckSuccess
      case Literal(v: Int, IntegerType) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram: dim must be in [1, 4096], got $v")
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_gram: dim must be an integer literal, got ${other.sql}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram expects array<float> or array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram"
  override def children: Seq[Expression] = Seq(child, dimExpr)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dimExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): VecGram =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecGram =
    copy(inputAggBufferOffset = newOffset)
}
