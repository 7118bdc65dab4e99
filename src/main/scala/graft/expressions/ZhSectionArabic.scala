package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 一段..十段 → 1段..10段 in one scan (sectionArabicVariant,
  * /root/reference/src/geocode.js:154-158).
  *
  * The Column formulation chains ten `regexp_replace` passes; the
  * geocode ladder evaluates it at seven sites per row (the section
  * base plus six hyphen variants), i.e. seventy regex traversals per
  * address. Since every pattern is a fixed numeral+段 pair and the
  * replacements (digits+段) can neither create nor destroy another
  * pattern's match, the sequential chain is equivalent to one
  * left-to-right scan replacing each numeral that directly precedes a
  * 段 — which is what this expression does (spec-asserted equal to
  * the chained form on generated inputs). Null in → null out.
  */
case class ZhSectionArabic(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_section_arabic expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_section_arabic"

  protected override def nullSafeEval(input: Any): Any =
    ZhSectionArabic.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ZhSectionArabic.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ZhSectionArabic =
    copy(child = newChild)
}

object ZhSectionArabic {
  private val Duan = '段'
  private def digitOf(c: Char): String = c match {
    case '一' => "1"; case '二' => "2"; case '三' => "3"; case '四' => "4"
    case '五' => "5"; case '六' => "6"; case '七' => "7"; case '八' => "8"
    case '九' => "9"; case '十' => "10"; case _ => null
  }

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = str.indexOf(Duan)
    if (i < 0) return s // no 段 at all: nothing can match
    val sb = new java.lang.StringBuilder(str.length + 4)
    var from = 0
    while (i >= 0) {
      // lookback in the ORIGINAL string is safe: matches are disjoint
      // [numeral, 段] pairs (段 is never a numeral), so a previous
      // replacement can't have consumed this 段's preceding char
      val d = if (i >= 1) digitOf(str.charAt(i - 1)) else null
      if (d != null) sb.append(str, from, i - 1).append(d).append(Duan)
      else sb.append(str, from, i + 1)
      from = i + 1
      i = str.indexOf(Duan, from)
    }
    sb.append(str, from, str.length)
    UTF8String.fromString(sb.toString)
  }
}
