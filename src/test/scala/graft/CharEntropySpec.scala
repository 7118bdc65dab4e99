package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDemos

/** C92 char_entropy: closed-form distributions, surrogate-pair symbol
  * counting, empty-doc survival, and a driver-computed reference match
  * over the sf0.001 corpus.
  */
class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")

  private def run(dir: String): Map[Long, (Long, Long, Double, Boolean)] =
    TextDemos.charEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

  /** codepoint entropy in bits, rounded like the operator */
  private def refEntropy(text: String): (Long, Long, Double) = {
    val cps = text.codePoints().toArray.toSeq
    if (cps.isEmpty) return (0L, 0L, 0.0)
    // sort by raw code point — equals UTF-8 byte order (what both
    // engines sort), NOT Java's UTF-16 code-unit String order, which
    // ranks astral points below U+E000
    val counts = cps.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1)
    val n = cps.size.toDouble
    val s = counts.foldLeft(0.0) { case (acc, (_, c)) =>
      val p = c / n
      acc + p * (math.log(p) / math.log(2.0))
    }
    (cps.size.toLong, counts.size.toLong,
      java.math.BigDecimal.valueOf(-s)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
  }

  test("closed forms: spam is 0 bits, coinflip is 1, uniform-16 is 4; empty doc survives") {
    val dir = tempDir("char_entropy")
    write(dir, Seq(
      1L -> "aaaaaaaa",                    // one symbol: 0 bits
      2L -> "abababab",                    // two equiprobable: 1 bit
      3L -> "abcdefghijklmnop",            // 16 uniform: 4 bits
      4L -> ""))                           // empty: survives as zeros
    val got = run(dir)
    assert(got(1L) == ((8L, 1L, 0.0, false)))
    assert(got(2L) == ((8L, 2L, 1.0, false)))
    assert(got(3L) == ((16L, 16L, 4.0, true)))
    assert(got(4L) == ((0L, 0L, 0.0, false)))
  }

  test("astral code points count as one symbol each (surrogate-safe)") {
    val dir = tempDir("char_entropy_astral")
    // two distinct symbols, two each: entropy exactly 1 bit — a
    // UTF-16-code-unit split would see broken surrogate halves instead
    write(dir, Seq(1L -> "🎉🎉漢漢"))
    val got = run(dir)
    assert(got(1L) == ((4L, 2L, 1.0, false)))
  }

  test("matches the driver reference on the sf0.001 corpus; prose clears the gate") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = run(sfDir)
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val (n, d, e) = refEntropy(text)
      assert(got(id) == ((n, d, e, e >= 2.0)), s"doc $id: got ${got(id)} want ($n,$d,$e)")
    }
    assert(got.values.count(_._4) > docs.length / 2, "most prose docs should clear 2 bits")
  }
}
