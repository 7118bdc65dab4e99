package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** C116 split leakage: planted cross-split k-gram overlap is found,
  * within-split duplication is not flagged, and counts are exact.
  */
class SplitLeakageSpec extends SparkSpec {
  import spark.implicits._

  private val shared = "one two three four"              // a 4-gram
  private val docs = Seq(
    (1L, "train", s"alpha $shared beta"),                // leaks to 10
    (2L, "train", "gamma delta eps zeta eta"),
    (3L, "train", "dup dup dup dup dup"),
    (4L, "train", "dup dup dup dup dup"),                // train-train dup: NOT leakage
    (10L, "test", s"intro $shared outro"),
    (11L, "test", "clean holdout text here now"),
    (12L, "test", "shared test gram here yes"),
    (13L, "test", "shared test gram here yes")           // test-test dup: NOT leakage
  ).toDF("doc_id", "split", "text")

  test("C116 only cross-split windows leak; counts exact") {
    val got = Dedup.splitLeakage(docs, "doc_id", "text", "split", k = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 10 shares exactly ONE 4-gram window with doc 1 (the shared
    // sentence; surrounding words differ so no other window matches)
    assert(got.toSeq == Seq((10L, 1L, 1L)))
  }

  test("C116 repeated leaked window counts occurrences, distinct hashes once") {
    val d = Seq(
      (1L, "train", "x y z w"),
      (2L, "test", "x y z w and x y z w")   // the leaked 4-gram twice
    ).toDF("doc_id", "split", "text")
    val got = Dedup.splitLeakage(d, "doc_id", "text", "split", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 2L, 1L)))
  }

  test("C116 no cross-split overlap yields an empty report") {
    val d = Seq((1L, "train", "a b c d e"), (2L, "test", "f g h i j"))
      .toDF("doc_id", "split", "text")
    assert(Dedup.splitLeakage(d, "doc_id", "text", "split", k = 4).count() == 0)
  }
}
