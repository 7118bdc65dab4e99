package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingler: one pass over the string, emitted as a
  * single static call inside whole-stage codegen.
  *
  * The higher-order-function formulation
  * (`transform(sequence(...), i -> concat_ws(" ", slice(tokens, i, n)))`
  * + `array_distinct`) runs interpreted: per-position lambda dispatch,
  * a sliced array allocation and a join per shingle. That made shingle
  * generation — not hashing, not the LSH join — the dominant cost of
  * every minhash/contamination scan (measured ~70% of the pipeline at
  * sf0.1). This expression tokenizes and builds the shingles in one
  * tight loop.
  *
  * Semantics are EXACTLY the HOF chain it replaces (the DuckDB oracle
  * mirrors stay valid):
  *  - tokens = split on single literal spaces, empties dropped
  *    (multi-space runs collapse; tabs/newlines are not separators)
  *  - shingle i = tokens[i..i+n-1] joined with one space
  *  - fewer than n tokens (or a null string) -> empty array
  *  - distinct=true keeps the first occurrence order (array_distinct)
  */
case class WordShingles(child: Expression, nExpr: Expression, distinctExpr: Expression)
  extends ShingleExpressionBase {

  override def prettyName: String = "graft_shingles"
  override protected def staticModule: String =
    WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
  override protected def computeShingles(s: UTF8String, n: Int, distinct: Boolean): ArrayData =
    WordShingles.compute(s, n, distinct)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WordShingles =
    copy(child = newFirst, nExpr = newSecond, distinctExpr = newThird)
}

object WordShingles {
  /** one-pass tokenize + shingle; null -> empty array (the HOF chain's
    * `when(size(null-tokens) >= n, ...)` otherwise-branch) */
  def compute(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (s == null) return ShingleExpressionBase.Empty
    val str = s.toString
    val len = str.length
    // split on single literal spaces, dropping empties
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > start) toks.add(str.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size - n + 1
    if (m <= 0) return ShingleExpressionBase.Empty
    val out = new java.util.ArrayList[Any](m)
    val seen = if (distinct) new java.util.HashSet[String](m * 2) else null
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(j + t))
        t += 1
      }
      val sh = sb.toString
      if (seen == null || seen.add(sh)) out.add(UTF8String.fromString(sh))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
