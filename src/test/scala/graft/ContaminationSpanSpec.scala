package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** C83 surgical decontamination: exact span location at any alignment,
  * scrub surgically removes only the leaked tokens, clean docs pass
  * untouched, every doc survives. */
class ContaminationSpanSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq((900L, "the quick brown fox jumps over")).toDF("doc_id", "text")
  private def spans(train: org.apache.spark.sql.DataFrame, k: Int = 3) =
    Dedup.contaminationSpans(train, "doc_id", "text", bench, "text", k = k)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  private def scrub(train: org.apache.spark.sql.DataFrame, k: Int = 3) =
    Dedup.scrubContamination(train, "doc_id", "text", bench, "text", k = k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("a mid-document verbatim leak is located exactly") {
    val train = Seq(
      (1L, "alpha beta the quick brown fox jumps over gamma delta"),
      (2L, "totally clean text with no overlap at all here")).toDF("doc_id", "text")
    // doc 1: benchmark tokens occupy positions 2..7
    assert(spans(train).toSeq === Seq((1L, 2L, 7L)))
  }

  test("scrub removes only the leaked tokens; clean docs pass verbatim") {
    val train = Seq(
      (1L, "alpha beta the quick brown fox jumps over gamma delta"),
      (2L, "totally clean text with no overlap at all here")).toDF("doc_id", "text")
    val got = scrub(train).toMap
    assert(got(1L) === "alpha beta gamma delta")
    assert(got(2L) === "totally clean text with no overlap at all here")
  }

  test("a fully leaked doc survives as an empty row (keep-the-row posture)") {
    val train = Seq((5L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    assert(spans(train).toSeq === Seq((5L, 0L, 5L)))
    assert(scrub(train).toSeq === Seq((5L, "")))
  }

  test("two separated leaks in one doc form two islands") {
    val train = Seq((7L,
      "the quick brown pad1 pad2 pad3 pad4 fox jumps over")).toDF("doc_id", "text")
    // windows 'the quick brown' (0..2) and 'fox jumps over' (7..9)
    assert(spans(train).toSeq === Seq((7L, 0L, 2L), (7L, 7L, 9L)))
  }

  test("sub-k overlaps are not flagged") {
    val train = Seq((9L, "brown fox appears alone here")).toDF("doc_id", "text")
    assert(spans(train).isEmpty) // 2-token overlap, k=3
    assert(scrub(train).head._2 === "brown fox appears alone here")
  }

  test("C83 demo rows: spans only in training ids, scrub is surgical") {
    val sp = graft.operators.TextDemos.contaminationSpansDemo(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sp.forall(_._1 % 20 != 0), "a benchmark id leaked into the spans")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 20 =!= 0).count()
    val scrubbed = graft.operators.TextDemos.contaminationScrubDemo(spark, sfDir)
    assert(scrubbed.count() === docs) // every training doc survives
    // flagged docs got strictly shorter (tokens removed)
    val flaggedIds = sp.map(_._1).distinct.toSeq
    if (flaggedIds.nonEmpty) {
      val before = graft.sources.Tables.documents(spark, sfDir)
        .filter(col("doc_id").isin(flaggedIds: _*))
        .select(col("doc_id"), size(graft.functions.Text.wsTokens(col("text"))).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val after = scrubbed.filter(col("doc_id").isin(flaggedIds: _*))
        .select(col("doc_id"),
          size(graft.functions.Text.wsTokens(col("scrubbed_text"))).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      flaggedIds.foreach(id => assert(after(id) < before(id), s"doc $id"))
    }
  }
}
