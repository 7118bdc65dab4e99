package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, TextDemos}

/** C93 bpe_fertility: closed-form single-symbol corpus, and the lang
  * aggregation checked against Bpe.encode's (BpeSpec-proven) per-doc
  * output on the sf0.001 corpus.
  */
class BpeFertilitySpec extends SparkSpec {
  import spark.implicits._

  test("single-char words never merge: fertility exactly 1, chars count spaces") {
    val dir = tempDir("bpe_fert")
    Seq((1L, "a b c", "en"), (2L, "a b", "de"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val got = TextDemos.bpeFertility(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    // "a b c": 3 words, 3 one-symbol tokens, 5 chars (spaces count)
    assert(got("en") == ((1L, 3L, 3L, 5L, 1.0, 5.0 / 3.0)))
    assert(got("de") == ((1L, 2L, 2L, 3L, 1.0, 1.5)))
  }

  test("lang aggregation matches a driver fold of Bpe.encode on sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val enc = Bpe.encode(docs, "doc_id", "text", nMerges = 12)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val meta = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = meta.groupBy(_._2).map { case (lang, rows) =>
      val words = rows.map(_._3.split(" ").count(_.nonEmpty).toLong).sum
      val toks = rows.map(r => enc(r._1)).sum
      // Spark length() counts code points, not UTF-16 units
      val chars = rows.map(r => r._3.codePointCount(0, r._3.length).toLong).sum
      lang -> ((rows.length.toLong, words, toks, chars))
    }
    val got = TextDemos.bpeFertility(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    want.foreach { case (lang, (n, words, toks, chars)) =>
      val (gn, gw, gt, gc, gf, gcpt) = got(lang)
      assert((gn, gw, gt, gc) == ((n, words, toks, chars)), s"lang $lang")
      assert(gf == (if (words > 0) toks.toDouble / words else 0.0), s"fertility $lang")
      assert(gcpt == (if (toks > 0) chars.toDouble / toks else 0.0), s"chars/token $lang")
    }
    assert(got.keySet == want.keySet)
  }
}
