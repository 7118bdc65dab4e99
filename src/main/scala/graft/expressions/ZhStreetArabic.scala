package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 中文數字 tokens before 街/巷/弄 → Arabic, EACH with its own 1..99
  * value, in one scan (streetOrdinalArabicVariants' per-match callback,
  * /root/reference/src/geocode.js:103-125).
  *
  * A Column formulation needs one extract+replace pass PER TOKEN, and
  * chaining passes nests the whole input expression ~6× per level —
  * CollapseProject then inlines that tree into every consumer of the
  * geocode ladder (the documented PERF TRAP: analysis/codegen blow up
  * combinatorially). Like [[ZhSectionArabic]], one imperative scan
  * replaces the chain: for every 街/巷/弄, the longest ≤3-char numeral
  * run directly before it converts via the parseZh1to99 grammar
  * ([X]十[Y] / single digit / 十); grammar-invalid runs stay verbatim,
  * exactly like the reference callback returning its match unchanged.
  *
  * `nullIfUnchanged = true` returns NULL when no token converted — the
  * geocode ladder's ordinal base blocks use that form so a no-op row
  * null-short-circuits every downstream derivation. Null in → null out.
  */
case class ZhStreetArabic(child: Expression, nullIfUnchanged: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable || nullIfUnchanged
  override def prettyName: String =
    if (nullIfUnchanged) "graft_street_arabic_ornull" else "graft_street_arabic"

  protected override def nullSafeEval(input: Any): Any = {
    val converted = ZhStreetArabic.compute(input.asInstanceOf[UTF8String])
    if (converted != null) converted
    else if (nullIfUnchanged) null
    else input
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ZhStreetArabic.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("converted")
      val onNoop = if (nullIfUnchanged) s"${ev.isNull} = true;"
                   else s"${ev.value} = $c;"
      s"""
         |UTF8String $r = $cls.compute($c);
         |if ($r != null) { ${ev.value} = $r; } else { $onNoop }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ZhStreetArabic =
    copy(child = newChild)
}

object ZhStreetArabic {
  private def digitOf(c: Char): Int = c match {
    case '零' | '〇' => 0
    case '一' => 1; case '二' | '兩' => 2; case '三' => 3; case '四' => 4
    case '五' => 5; case '六' => 6; case '七' => 7; case '八' => 8; case '九' => 9
    case _ => -1
  }
  private def isNumeral(c: Char): Boolean = c == '十' || digitOf(c) >= 0
  private def isUnit(c: Char): Boolean = c == '街' || c == '巷' || c == '弄'

  /** parseZh1to99 over str[from, to): the reference grammar is
    * `十` | `^[零〇一二兩三四五六七八九]$` | `^([一二兩三四五六七八九])?十([一二三四五六七八九])?$`
    * (note: the ones place excludes 兩). -1 when rejected. */
  private def parse(str: String, from: Int, to: Int): Int = {
    if (to - from == 1) {
      val c = str.charAt(from)
      if (c == '十') 10 else digitOf(c) // single digit incl. 零/〇 -> 0
    } else {
      val tenIdx = str.indexOf('十', from)
      if (tenIdx < from || tenIdx >= to) return -1
      var tens = 1
      if (tenIdx > from) {
        if (tenIdx != from + 1) return -1
        val t = digitOf(str.charAt(from))
        if (t < 1) return -1 // tens place: 一..九 or 兩, never 零/〇
        tens = t
      }
      var ones = 0
      if (tenIdx < to - 1) {
        if (tenIdx != to - 2) return -1
        val oc = str.charAt(to - 1)
        val o = digitOf(oc)
        if (o < 1 || oc == '兩') return -1 // ones place: 一..九 only
        ones = o
      }
      tens * 10 + ones
    }
  }

  /** returns the converted string, or NULL when nothing converted */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    var sb: java.lang.StringBuilder = null
    var from = 0
    var i = 0
    val n = str.length
    while (i < n) {
      if (isUnit(str.charAt(i)) && i > 0 && isNumeral(str.charAt(i - 1))) {
        // longest <=3-char numeral run ending right before the unit —
        // the first starting position the reference's backtracking
        // {1,3} match lands on (runs never span a unit char, so /g
        // matches cannot overlap)
        var start = i - 1
        while (start > from && i - start < 3 && isNumeral(str.charAt(start - 1)))
          start -= 1
        val v = parse(str, start, i)
        if (v >= 0) {
          if (sb == null) sb = new java.lang.StringBuilder(n + 4)
          sb.append(str, from, start).append(v)
          from = i
        }
      }
      i += 1
    }
    if (sb == null) null
    else {
      sb.append(str, from, n)
      UTF8String.fromString(sb.toString)
    }
  }
}
