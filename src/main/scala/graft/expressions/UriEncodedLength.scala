package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** encodeURIComponent output length, as one pass over the UTF-8 bytes.
  *
  * Each unreserved ASCII byte ([A-Za-z0-9_.!~*'()-]) stays 1 output
  * char; every other byte — reserved ASCII and each byte of a
  * multibyte char — percent-encodes to 3 (`%XX`). The Column
  * formulation (`length(regexp_replace(c, "[^unreserved]", ""))` to
  * count the unreserved chars) runs the regex engine over the whole
  * string per call; on the geocode ladder that regex dominated the
  * clamp gate for long addresses (~90 emissions per row). Same value,
  * one byte scan.
  */
case class UriEncodedLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_urilen expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_urilen"

  protected override def nullSafeEval(input: Any): Any =
    UriEncodedLength.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UriEncodedLength.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UriEncodedLength =
    copy(child = newChild)
}

object UriEncodedLength {
  // bitmap of encodeURIComponent's 71 unescaped bytes (letters, digits,
  // and _.!~*'()- — a superset of RFC 3986's 66 unreserved chars)
  private val unreserved: Array[Boolean] = {
    val a = new Array[Boolean](128)
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ "_.!~*'()-").foreach(c => a(c) = true)
    a
  }

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      n += (if (b < 128 && unreserved(b)) 1 else 3)
      i += 1
    }
    n
  }
}
