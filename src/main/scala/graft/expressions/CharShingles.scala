package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  extends ShingleExpressionBase {

  override def prettyName: String = "graft_char_shingles"
  override protected def staticModule: String =
    CharShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
  override protected def computeShingles(s: UTF8String, n: Int, distinct: Boolean): ArrayData =
    CharShingles.compute(s, n, distinct)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CharShingles =
    copy(child = newFirst, nExpr = newSecond, distinctExpr = newThird)
}

object CharShingles {
  def compute(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (s == null) return ShingleExpressionBase.Empty
    val str = s.toString
    // code-point start offsets (+ end sentinel) in a primitive array —
    // windows slice between offsets, so surrogate pairs never split,
    // and nothing boxes on this per-row hot path
    val len = str.length
    val offs = new Array[Int](str.codePointCount(0, len) + 1)
    var i = 0
    var c = 0
    while (i < len) {
      offs(c) = i; c += 1
      i += Character.charCount(str.codePointAt(i))
    }
    offs(c) = len
    val m = c - n + 1
    if (m <= 0) return ShingleExpressionBase.Empty
    val out = new java.util.ArrayList[Any](m)
    val seen = if (distinct) new java.util.HashSet[String](m * 2) else null
    var j = 0
    while (j < m) {
      val sh = str.substring(offs(j), offs(j + n))
      if (seen == null || seen.add(sh)) out.add(UTF8String.fromString(sh))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
