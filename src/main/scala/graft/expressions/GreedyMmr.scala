package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Greedy Maximal-Marginal-Relevance selection as ONE native aggregate
  * (SURVEY §2 C53): per query group, collect the first-stage
  * candidates `(doc_id, rel, vec)` and run the textbook greedy loop
  * `argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` inside the
  * aggregation buffer, emitting the k picks in selection order.
  *
  * Why an aggregate: MMR selection is per-query-LOCAL over the m
  * first-stage candidates (m = the upstream top-k knob — bounded by
  * construction, never corpus-scale), but the relational unroll
  * ([[graft.operators.Mmr.rerankUnrolled]]) pays k sequential job
  * barriers of joins/windows for work that fits comfortably in one
  * buffer. As an aggregate the whole rerank is ONE shuffle: partials
  * collect ≤m candidates map-side, the merged group runs the greedy
  * loop once at eval. This is the BoundedTopK trick applied to a
  * sequential selection rule.
  *
  * Bit-equality with the relational unroll (spec-pinned by
  * GreedyMmrSpec, oracle-pinned by the mmr_rerank row):
  *  - pairwise sims: the [[CosineSim]] accumulation loop verbatim
  *    (same index order, same double arithmetic), then Spark's
  *    round-half-up to 6 places exactly as the `round(_, 6)` the
  *    relational form applies;
  *  - scores: `λ·rel − (1−λ)·maxsim` with λ and (1−λ) the same Scala
  *    doubles both formulations interpolate;
  *  - argmax: (mmr_score desc, doc_id asc), the unroll's window order;
  *  - round 1 subtracts `(1−λ)·0.0` so even the sign of a negative
  *    zero agrees.
  *
  * Input: struct(doc_id long, rel double, vec array<float>); k and λ
  * must be literals (k int ≥ 1, λ double in [0,1]). Rows with a null
  * doc_id/rel/vec are skipped (cannot be ranked). Queries with fewer
  * than k candidates yield fewer picks.
  * Output: array<struct<doc_id long, mmr_round int, mmr_score
  * double>> in selection order.
  */
case class GreedyMmr(
    child: Expression,
    kExpr: Expression,
    lambdaExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Double, Array[Float])]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_mmr: k must be an integer literal, got $other")
  }

  private lazy val lambda: Double = lambdaExpr match {
    case Literal(v: Double, DoubleType) => v
    case other => throw new IllegalArgumentException(
      s"graft_mmr: lambda must be a double literal, got $other")
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Double, Array[Float])] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Long, Double, Array[Float])],
                      input: InternalRow): mutable.ArrayBuffer[(Long, Double, Array[Float])] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2))
        buf += ((row.getLong(0), row.getDouble(1),
          row.getArray(2).toFloatArray()))
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Long, Double, Array[Float])],
                     other: mutable.ArrayBuffer[(Long, Double, Array[Float])]): mutable.ArrayBuffer[(Long, Double, Array[Float])] = {
    buf ++= other
    buf
  }

  /** the [[CosineSim]] accumulation loop verbatim: double promotion
    * per element, sequential fold from 0.0 — identical IEEE result to
    * the codegen'd expression the relational unroll evaluates. */
  private def cosine(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x(i).toDouble; val yv = y(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    var j = n
    while (j < x.length) { val v = x(j).toDouble; na += v * v; j += 1 }
    j = n
    while (j < y.length) { val v = y(j).toDouble; nb += v * v; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark's `round(x, 6)`: HALF_UP on the shortest-decimal rendering
    * (Catalyst's RoundBase does BigDecimal(double) — Double.toString
    * based — then setScale). NaN/Inf pass through like Catalyst's. */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  override def eval(buf: mutable.ArrayBuffer[(Long, Double, Array[Float])]): Any = {
    val m = buf.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val cands = buf.toArray
    val taken = new Array[Boolean](m)
    // per-candidate running max of the ROUNDED sims to the selected
    // set, updated once per pick against the newest selection — max is
    // order-insensitive, so the incremental fold is bit-equal to
    // re-scanning the whole selected set each round while cutting the
    // cosine count from O(k²·m) to O(k·m)
    val maxsim = new Array[Double](m)
    val oneMinus = 1 - lambda
    val out = new mutable.ArrayBuffer[Any](math.min(k, m))
    var t = 1
    while (t <= math.min(k, m)) {
      var bestIdx = -1
      var bestScore = 0.0
      var i = 0
      while (i < m) {
        if (!taken(i)) {
          // round 1 has no selected set: maxsim contributes 0
          val ms = if (t > 1) maxsim(i) else 0.0
          val score = lambda * cands(i)._2 - oneMinus * ms
          // argmax by (score desc, doc_id asc) — the unroll's window order
          if (bestIdx < 0 || score > bestScore ||
              (score == bestScore && cands(i)._1 < cands(bestIdx)._1)) {
            bestIdx = i; bestScore = score
          }
        }
        i += 1
      }
      taken(bestIdx) = true
      out += InternalRow(cands(bestIdx)._1, t, bestScore)
      // fold the new pick into every survivor's running max (true max,
      // negatives included: the first pairwise sim SETS the value)
      i = 0
      while (i < m) {
        if (!taken(i)) {
          val ps = round6(cosine(cands(i)._3, cands(bestIdx)._3))
          if (t == 1 || ps > maxsim(i)) maxsim(i) = ps
        }
        i += 1
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Double, Array[Float])]): Array[Byte] = {
    val total = 4 + buf.iterator.map(e => 8 + 8 + 4 + 4 * e._3.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.length)
    buf.foreach { case (id, rel, vec) =>
      bb.putLong(id); bb.putDouble(rel); bb.putInt(vec.length)
      var i = 0
      while (i < vec.length) { bb.putFloat(vec(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Double, Array[Float])] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new mutable.ArrayBuffer[(Long, Double, Array[Float])](n)
    var i = 0
    while (i < n) {
      val id = bb.getLong; val rel = bb.getDouble
      val len = bb.getInt
      val vec = new Array[Float](len)
      var j = 0
      while (j < len) { vec(j) = bb.getFloat; j += 1 }
      buf += ((id, rel, vec))
      i += 1
    }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b, c))
        if a.dataType == LongType && b.dataType == DoubleType &&
          (c.dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          }) =>
      (kExpr, lambdaExpr) match {
        case (Literal(kv: Int, IntegerType), Literal(lv: Double, DoubleType)) =>
          if (kv < 1)
            TypeCheckResult.TypeCheckFailure(s"graft_mmr: k must be >= 1, got $kv")
          else if (lv < 0 || lv > 1)
            TypeCheckResult.TypeCheckFailure(s"graft_mmr: lambda $lv outside [0,1]")
          else TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_mmr: k and lambda must be int/double literals, got $other")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mmr expects struct<bigint, double, array<float>>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("mmr_round", IntegerType, nullable = false),
      StructField("mmr_score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_mmr"
  override def children: Seq[Expression] = Seq(child, kExpr, lambdaExpr)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1), lambdaExpr = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): GreedyMmr =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GreedyMmr =
    copy(inputAggBufferOffset = newOffset)
}
