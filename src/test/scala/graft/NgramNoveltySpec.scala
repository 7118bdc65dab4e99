package graft

import graft.operators.Curation

/** C122 ngram_novelty: per-candidate fraction of k-token windows never
  * seen in the reference corpus, on closed-form fixtures.
  */
class NgramNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def run(cands: Seq[(Long, String)], ref: Seq[String],
                  k: Int): Map[Long, (Long, Long, Double)] =
    Curation.ngramNovelty(
        cands.toDF("doc_id", "text"),
        ref.zipWithIndex.map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text"),
        "doc_id", "text", k = k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("closed form: verbatim copy scores 0, disjoint text 1, overlap in between") {
    val ref = Seq("a b c d e")
    // windows at k=3: copy -> {abc, bcd, cde} all seen; partial "c d e f g"
    // -> {cde seen, def, efg novel} = 2/3; disjoint -> all novel
    val got = run(Seq(
      (1L, "a b c d e"),
      (2L, "c d e f g"),
      (3L, "x y z w")), ref, k = 3)
    assert(got(1L) == ((3L, 0L, 0.0)), s"got $got")
    assert(got(2L) == ((3L, 2L, 0.666667)), s"got $got")
    assert(got(3L) == ((2L, 2L, 1.0)), s"got $got")
  }

  test("repeated windows count with duplicates; short docs are absent, not zero") {
    val ref = Seq("p q r")
    // "p q r p q r p q r" at k=3 has 7 windows: pqr(seen) x3, qrp x2,
    // rpq x2 -> 4 novel of 7
    val got = run(Seq(
      (1L, "p q r p q r p q r"),
      (2L, "p q")), ref, k = 3)
    assert(got(1L) == ((7L, 4L, 0.571429)), s"got $got")
    assert(!got.contains(2L), s"sub-k doc must be absent: $got")
  }

  test("empty reference makes everything fully novel") {
    val got = run(Seq((1L, "a b c")), Seq("x"), k = 3)
    assert(got(1L) == ((1L, 1L, 1.0)), s"got $got")
  }
}
