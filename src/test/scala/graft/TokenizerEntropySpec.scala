package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, TextDemos}

/** C96 tokenizer_entropy: closed-form uniform/skewed distributions and
  * a driver reference replicating the decimal-quantized sum discipline
  * on the sf0.001 corpus.
  */
class TokenizerEntropySpec extends SparkSpec {
  import spark.implicits._

  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** the operator's exact arithmetic: per-term DECIMAL(38,12)
    * quantization (HALF_UP, Spark's double→decimal cast mode), exact
    * sum, then the double algebra */
  private def refRow(counts: Seq[Long]): (Long, Long, Double, Double, Double) = {
    val v = counts.size.toLong
    val n = counts.sum
    def q(d: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d).setScale(12, java.math.RoundingMode.HALF_UP)
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val ssh = counts.map { c =>
      val p = c.toDouble / n.toDouble
      q(p * log2(p))
    }.reduce(_ add _).doubleValue
    val sr = counts.map { c =>
      val p = c.toDouble / n.toDouble
      q(math.pow(p, 2.5))
    }.reduce(_ add _).doubleValue
    val renyi = log2(sr) / -1.5
    (v, n, round6(-ssh), round6(renyi),
      if (v > 1) round6(renyi / log2(v.toDouble)) else 0.0)
  }

  private def run(dir: String): Map[String, (Long, Long, Double, Double, Double)] =
    TextDemos.tokenizerEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))))
      .toMap

  test("uniform-4 corpus: shannon = renyi = 2 bits, efficiency = 1, both tokenizers") {
    val dir = tempDir("tok_ent")
    Seq((1L, "a b c d"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val got = run(dir)
    assert(got("ws") == ((4L, 4L, 2.0, 2.0, 1.0)), got("ws").toString)
    // single-char words never merge: bpe12's distribution is identical
    assert(got("bpe12") == ((4L, 4L, 2.0, 2.0, 1.0)))
  }

  test("skew drops Renyi faster than Shannon (the measure's point)") {
    val dir = tempDir("tok_ent_skew")
    Seq((1L, "a a a a a a b c"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val got = run(dir)
    val want = refRow(Seq(6L, 1L, 1L))
    assert(got("ws") == want, s"got ${got("ws")} want $want")
    val (_, _, sh, re, eff) = got("ws")
    assert(re < sh, "alpha=2.5 punishes concentration harder than Shannon")
    assert(eff > 0.0 && eff < 1.0)
  }

  test("matches the driver reference on sf0.001 for both tokenizers") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val wsCounts = docs.select(explode(graft.functions.Text.wsTokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(_.getLong(1)).toSeq
    val bpeCounts = Bpe.encode(docs, "doc_id", "text", nMerges = 12)
      .select(explode(split(col("bpe_text"), Bpe.Sep)).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").count().collect().map(_.getLong(1)).toSeq
    val got = run(sfDir)
    assert(got("ws") == refRow(wsCounts), s"ws: got ${got("ws")}")
    assert(got("bpe12") == refRow(bpeCounts), s"bpe12: got ${got("bpe12")}")
  }
}
