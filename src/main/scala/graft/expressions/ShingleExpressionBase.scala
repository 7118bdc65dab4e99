package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared shell of the one-pass shingle expressions
  * ([[WordShingles]], [[CharShingles]]): literal-argument validation,
  * the null→empty-array contract, and the static-call codegen
  * template live ONCE here — the concrete expressions supply only
  * their compute loop (word windows vs code-point windows) and the
  * companion's static accessor for codegen. */
abstract class ShingleExpressionBase extends TernaryExpression {
  def child: Expression
  def nExpr: Expression
  def distinctExpr: Expression

  /** fully-qualified `Companion$.MODULE$` path emitted into codegen;
    * the companion must expose `compute(UTF8String, int, boolean)`. */
  protected def staticModule: String
  protected def computeShingles(s: UTF8String, n: Int, distinct: Boolean): ArrayData

  protected lazy val n: Int = nExpr.asInstanceOf[Literal].value.asInstanceOf[Int]
  protected lazy val keepDistinct: Boolean =
    distinctExpr.asInstanceOf[Literal].value.asInstanceOf[Boolean]

  override def first: Expression = child
  override def second: Expression = nExpr
  override def third: Expression = distinctExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string, got ${child.dataType.simpleString}")
    nExpr match {
      case Literal(v: Int, IntegerType) if v >= 1 => ()
      case _ => return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: n must be an integer literal >= 1")
    }
    distinctExpr match {
      case Literal(_: Boolean, BooleanType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: distinct must be a boolean literal")
    }
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    computeShingles(child.eval(input).asInstanceOf[UTF8String], n, keepDistinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $staticModule.compute(${childGen.isNull} ? null : ${childGen.value}, $n, $keepDistinct);
      """,
      isNull = FalseLiteral)
  }
}

object ShingleExpressionBase {
  /** the shared null/short-input result */
  val Empty: ArrayData = new GenericArrayData(Array.empty[Any])
}
