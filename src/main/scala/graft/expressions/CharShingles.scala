package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram shingles, one pass — the CJK counterpart of
  * [[WordShingles]]: unspaced scripts (Chinese, Japanese, Thai) have
  * no word boundaries for a whitespace shingler to find, so near-dup
  * hashing over such corpora shingles CODE POINTS instead (the
  * standard CJK configuration of minhash dedup). Windows advance by
  * code point, never splitting surrogate pairs, so emoji and
  * supplementary-plane han characters stay intact. Fewer than n code
  * points (or null) -> empty array; distinct keeps first-occurrence
  * order.
  */
case class CharShingles(child: Expression, nExpr: Expression, distinctExpr: Expression)
  extends TernaryExpression {

  private lazy val n: Int = nExpr.asInstanceOf[Literal].value.asInstanceOf[Int]
  private lazy val keepDistinct: Boolean =
    distinctExpr.asInstanceOf[Literal].value.asInstanceOf[Boolean]

  override def first: Expression = child
  override def second: Expression = nExpr
  override def third: Expression = distinctExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_char_shingles expects a string, got ${child.dataType.simpleString}")
    nExpr match {
      case Literal(v: Int, IntegerType) if v >= 1 => ()
      case _ => return TypeCheckResult.TypeCheckFailure(
        "graft_char_shingles: n must be an integer literal >= 1")
    }
    distinctExpr match {
      case Literal(_: Boolean, BooleanType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_char_shingles: distinct must be a boolean literal")
    }
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_char_shingles"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    CharShingles.compute(child.eval(input).asInstanceOf[UTF8String], n, keepDistinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = CharShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $cls.compute(${childGen.isNull} ? null : ${childGen.value}, $n, $keepDistinct);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CharShingles =
    copy(child = newFirst, nExpr = newSecond, distinctExpr = newThird)
}

object CharShingles {
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (s == null) return Empty
    val str = s.toString
    // code-point start offsets (+ end sentinel): windows slice between
    // offsets, so surrogate pairs never split
    val len = str.length
    val offs = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) { offs.add(i); i += Character.charCount(str.codePointAt(i)) }
    offs.add(len)
    val m = offs.size - 1 - n + 1
    if (m <= 0) return Empty
    val out = new java.util.ArrayList[Any](m)
    val seen = if (distinct) new java.util.HashSet[String](m * 2) else null
    var j = 0
    while (j < m) {
      val sh = str.substring(offs.get(j), offs.get(j + n))
      if (seen == null || seen.add(sh)) out.add(UTF8String.fromString(sh))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
