package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression (SURVEY §2 C57).
  *
  * Canonical-equivalent byte sequences ("é" precomposed U+00E9 vs
  * decomposed e+U+0301) hash differently and defeat every dedup key in
  * the C-series; NFC folds them to one canonical form. Spark has no
  * built-in for this, and a Scala UDF would break whole-stage codegen
  * in the canonicalization map — so it's a native `Expression` with
  * `doGenCode`, the same treatment as [[UriEncodedLength]].
  *
  * The ASCII fast path matters at corpus scale: NFC is the identity on
  * ASCII, and most web text is mostly ASCII — `isNormalized` (a cheap
  * quick-check scan) skips the allocating normalize pass, and the
  * UTF8String passes through untouched.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"(UTF8String) $cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
