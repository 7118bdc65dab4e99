package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Packing}

/** C109 mojibake repair, C110 packing sweep, C111 vocab coverage —
  * closed-form fixtures with hand-computable answers.
  */
class CurationSweepSpec extends SparkSpec {
  import spark.implicits._

  // ---- C109 mojibake_repair ------------------------------------------

  test("C109 repairs the full plant, drops U+FFFD, leaves clean text alone") {
    val df = Seq(
      (1L, "clean text"),
      (2L, "x" + Curation.MojibakePlant13),
      (3L, "a�b�c")).toDF("doc_id", "text")
    val got = Curation.mojibakeRepair(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got(0) == (("clean text", 0L, false)))
    assert(got(1) == (("x café — naïve", 3L, true)))
    assert(got(2) == (("abc", 2L, true))) // 2 repairs, flag set
  }

  test("C109 every repair key decodes its cp1252 round trip (and keys don't overlap)") {
    // each key alone in a doc: repaired text is exactly the value,
    // n_repairs is exactly 1 — no key double-counts through another
    val rows = Curation.MojibakeRepairs.zipWithIndex.map {
      case ((k, _), i) => (i.toLong, s"<$k>")
    }
    val got = Curation.mojibakeRepair(rows.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    Curation.MojibakeRepairs.zipWithIndex.foreach { case ((_, v), i) =>
      assert(got(i).getString(1) == s"<$v>", s"key $i")
      assert(got(i).getLong(2) == 1L, s"key $i count")
    }
  }

  // ---- C110 packing_sweep ---------------------------------------------

  test("C110 exact sweep numbers on a hand-packed shard") {
    // one shard, three 3-token docs; capacity 4: offsets [0,3) [3,6) [6,9)
    // -> 3 chunks (ceil 9/4), docs 2 and 3 each cross one boundary,
    // tail waste 3, fill 9/12; capacity 16: 1 chunk, no splits, waste 7
    val df = Seq((1L, 0L, 3L), (2L, 0L, 3L), (3L, 0L, 3L))
      .toDF("doc_id", "shard", "toks")
    val got = Packing.packingSweep(df, "shard", "doc_id", "toks",
        capacities = Seq(4, 16))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(got(0) == ((4, 3L, 9L, 3L, 2L, 2L, 3L, 0.75)))
    assert(got(1) == ((16, 3L, 9L, 1L, 0L, 0L, 7L, 0.5625)))
  }

  test("C110 multi-shard: chunks and waste sum per shard, not globally") {
    // shard 0: 5 tokens (2 chunks of 4, waste 3); shard 1: 4 tokens
    // (1 chunk, waste 0) — a global cumsum would see 9 tokens/3 chunks
    val df = Seq((1L, 0L, 5L), (2L, 1L, 4L)).toDF("doc_id", "shard", "toks")
    val r = Packing.packingSweep(df, "shard", "doc_id", "toks", Seq(4))
      .collect()(0)
    assert(r.getLong(3) == 3L && r.getLong(6) == 3L) // n_chunks, tail_waste
  }

  test("C110 zero-token docs contribute no chunks and no crossings") {
    val df = Seq((1L, 0L, 0L), (2L, 0L, 0L)).toDF("doc_id", "shard", "toks")
    val r = Packing.packingSweep(df, "shard", "doc_id", "toks", Seq(8))
      .collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(3) == 0L && r.getDouble(7) == 0.0)
  }

  // ---- C111 vocab_coverage ----------------------------------------------

  test("C111 exact per-language coverage against the top-v corpus vocab") {
    val df = Seq(
      ("en", "a b a"),   // occ a:2 b:1
      ("fr", "a c")      // occ a:1 c:1
    ).toDF("lang", "text")
    // corpus totals: a=3, b=1, c=1 -> v=1 vocab = {a}
    val got = Curation.vocabCoverage(df, "lang", "text", v = 1)
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got(0) == (("en", 3L, 2L, 2L, 1L, 0.666667, 0.5)))
    assert(got(1) == (("fr", 2L, 2L, 1L, 1L, 0.5, 0.5)))
  }

  test("C111 vocab ties at rank v break on the word, deterministically") {
    // b and c tie at 1 occurrence; v=2 must pick {a, b} (word asc)
    val df = Seq(("en", "a a b"), ("fr", "c")).toDF("lang", "text")
    val got = Curation.vocabCoverage(df, "lang", "text", v = 2)
      .orderBy("lang").collect()
    assert(got(0).getLong(3) == 3L)  // en fully covered (a, b in vocab)
    assert(got(1).getLong(3) == 0L)  // c lost the tie
  }
}
