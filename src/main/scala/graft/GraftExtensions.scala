package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProduct

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so both the Column API
  * (`call_function("graft_dot", a, b)`) and plain SQL
  * (`SELECT graft_dot(a, b)`) reach the codegen'd implementations.
  *
  * Install with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[graft.expressions.CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => graft.expressions.CosineSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.expressions.BoundedTopK].getName, "graft_topk"),
      (children: Seq[Expression]) => graft.expressions.BoundedTopK(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_mmr"),
      new ExpressionInfo(classOf[graft.expressions.GreedyMmr].getName, "graft_mmr"),
      (children: Seq[Expression]) =>
        graft.expressions.GreedyMmr(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.expressions.WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        graft.expressions.WordShingles(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[graft.expressions.NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => graft.expressions.NfcNormalize(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_urilen"),
      new ExpressionInfo(classOf[graft.expressions.UriEncodedLength].getName, "graft_urilen"),
      (children: Seq[Expression]) => graft.expressions.UriEncodedLength(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_shingles"),
      new ExpressionInfo(classOf[graft.expressions.CharShingles].getName, "graft_char_shingles"),
      (children: Seq[Expression]) =>
        graft.expressions.CharShingles(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("graft_section_arabic"),
      new ExpressionInfo(classOf[graft.expressions.ZhSectionArabic].getName, "graft_section_arabic"),
      (children: Seq[Expression]) => graft.expressions.ZhSectionArabic(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("graft_street_arabic"),
      new ExpressionInfo(classOf[graft.expressions.ZhStreetArabic].getName, "graft_street_arabic"),
      (children: Seq[Expression]) =>
        graft.expressions.ZhStreetArabic(children(0), nullIfUnchanged = false)))
    ext.injectFunction((
      new FunctionIdentifier("graft_street_arabic_ornull"),
      new ExpressionInfo(classOf[graft.expressions.ZhStreetArabic].getName, "graft_street_arabic_ornull"),
      (children: Seq[Expression]) =>
        graft.expressions.ZhStreetArabic(children(0), nullIfUnchanged = true)))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_prefix"),
      new ExpressionInfo(classOf[graft.expressions.Md5Prefix].getName, "graft_md5_prefix"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"graft_md5_prefix expects (string, hexChars int literal), " +
            s"got ${children.length} argument(s)")
        children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(i: Int,
              org.apache.spark.sql.types.IntegerType) =>
            graft.expressions.Md5Prefix(children(0), i)
          case other => throw new IllegalArgumentException(
            s"graft_md5_prefix: hexChars must be an int literal, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[graft.expressions.KmvSketch].getName, "graft_kmv"),
      (children: Seq[Expression]) =>
        graft.expressions.KmvSketch(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_gram"),
      new ExpressionInfo(classOf[graft.expressions.VecGram].getName, "graft_gram"),
      (children: Seq[Expression]) =>
        graft.expressions.VecGram(children(0), children(1))))
    ext.injectOptimizerRule(_ => graft.optimizer.FuseCosine)
    ext.injectPlannerStrategy(_ => graft.plans.BroadcastAsofStrategy)
  }
}
