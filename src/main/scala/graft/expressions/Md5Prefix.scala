package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The first `hexChars` hex digits of md5 as a non-negative long —
  * the engine-portable hash under Vec.md5Hash60 (15 chars / 60 bits)
  * and the winnowing gram hash (10 chars / 40 bits), equal by
  * construction to `conv(substring(md5(s), 1, hexChars), 16, 10)` and
  * to DuckDB's `('0x' || substr(md5(s), 1, hexChars))::BIGINT`.
  *
  * Why native: the composed form pays, PER ROW, a fresh MessageDigest
  * allocation (commons-codec's md5Hex), a 32-char hex string, a
  * substring copy, and Conv's generic radix reparse of the hex back
  * into a long. This expression digests the UTF8String's bytes on a
  * thread-local MessageDigest and reads the prefix value straight out
  * of the first 8 digest bytes — same bits, none of the round-trip.
  * Stage-split measurement at sf0.1 priced the composed form at
  * ~0.58 s of winnow_fingerprint's ~1.0 s wall; md5Hash60 rides the
  * hot path of group_sample, cdc_chunk_dedup, cluster_representative,
  * minhash shingling and every other oracle-parity hash site.
  *
  * `hexChars` caps at 15 (60 bits) so the value always fits a long's
  * non-sign bits — the same bound the composed form relies on. */
case class Md5Prefix(child: Expression, hexChars: Int) extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"graft_md5_prefix: hexChars must be in [1, 15], got $hexChars")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_prefix expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  protected override def nullSafeEval(input: Any): Any =
    Md5Prefix.compute(input.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Prefix.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $hexChars)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** first `hexChars` md5 nibbles of s's UTF-8 bytes as a long:
    * big-endian read of the first 8 digest bytes, shifted down so only
    * the leading 4·hexChars bits remain (unsigned — hexChars ≤ 15). */
  def compute(s: UTF8String, hexChars: Int): Long = {
    val d = digests.get()
    val digest = d.digest(s.getBytes) // digest() resets for reuse
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> (64 - 4 * hexChars)
  }
}
