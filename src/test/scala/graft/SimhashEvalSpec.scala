package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDemos

/** C90 simhash_eval: the demo's one summary row checked field-by-field
  * against a driver-computed ALL-PAIRS reference (no banding at all on
  * the reference side — the spec exists to prove the 7-band pigeonhole
  * truth is exact and the 4-band candidate counts are honest).
  */
class SimhashEvalSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md560(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** 60-bit simhash over whitespace tokens, every occurrence voting
    * (the operator explodes, it does not distinct) — None for docs
    * with no tokens (they never enter the banded table). */
  private def simhash60(text: String): Option[Long] = {
    val hs = text.split(" ").filter(_.nonEmpty).map(md560)
    if (hs.isEmpty) None
    else Some((0 until 60).map { j =>
      val v = hs.map(h => if (((h >> j) & 1L) == 1L) 1L else -1L).sum
      if (v > 0) 1L << j else 0L
    }.foldLeft(0L)(_ | _))
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** reference eval over a doc set: (n_docs, n_truth, n_cand, n_hit,
    * n_truth_le3, n_hit_le3, precision, recall) */
  private def reference(docs: Seq[(Long, String)]) = {
    val sigs = docs.flatMap { case (id, t) => simhash60(t).map(id -> _) }
    val allPairs = for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      (ia, sa) = sigs(i); (ib, sb) = sigs(j)
    } yield (math.min(ia, ib), math.max(ia, ib), hamming(sa, sb))
    val truth = allPairs.filter(_._3 <= 6)
    // production candidates: share >= 1 of the 4 15-bit bands
    val sigMap = sigs.toMap
    val cand = allPairs.filter { case (ia, ib, _) =>
      val (sa, sb) = (sigMap(ia), sigMap(ib))
      (0 until 4).exists(k => ((sa >> (k * 15)) & 0x7fffL) == ((sb >> (k * 15)) & 0x7fffL))
    }
    val nHit = cand.count(_._3 <= 6)
    (docs.size.toLong, truth.size.toLong, cand.size.toLong, nHit.toLong,
      truth.count(_._3 <= 3).toLong, cand.count(_._3 <= 3).toLong,
      if (cand.isEmpty) 0.0 else nHit.toDouble / cand.size,
      if (truth.isEmpty) 0.0 else nHit.toDouble / truth.size)
  }

  private def run(dir: String) = {
    val r = TextDemos.simhashEval(spark, dir).head()
    graft.util.CacheRegistry.releaseAll()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))
  }

  test("C90 simhashEval matches the all-pairs driver reference on sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = reference(docs)
    val got = run(sfDir)
    assert(got == want, s"got $got want $want")
    // the documented pigeonhole invariant: 4 bands over 60 bits are
    // lossless through hamming 3 — every <=3 truth pair is a candidate
    assert(got._6 == got._5, s"n_hit_le3 ${got._6} != n_truth_le3 ${got._5}")
    info(f"sf0.001: truth=${got._2} cand=${got._3} hit=${got._4} P=${got._7}%.3f R=${got._8}%.3f")
  }

  test("C90 closed form: exact dup is truth+hit; tokenless doc excluded; empty truth safe") {
    val dir = tempDir("simhash_eval")
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup: hamming 0
      (3L, "completely different words about other topics entirely now"),
      (4L, " ")) // no tokens: never enters the banded table
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val got = run(dir)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "completely different words about other topics entirely now"),
      (4L, " "))
    assert(got == reference(docs), s"got $got")
    assert(got._1 == 4L, "n_docs counts the tokenless doc")
    assert(got._2 >= 1L && got._4 >= 1L, "the exact-dup pair must be truth and hit")
    assert(got._7 > 0.0 && got._8 > 0.0)
  }
}
