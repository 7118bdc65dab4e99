package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextDemos}

/** C99 lsh_recall_curve: the full-probe sanity row (probeBits =
  * nPlanes covers every bucket = brute force), monotone axes, and
  * agreement with the independently-proven C6/C5 demos at
  * probeBits = 1.
  */
class LshRecallCurveSpec extends SparkSpec {

  private def rows(dir: String): Seq[(Int, Long, Long, Double, Double)] = {
    val got = TextDemos.lshRecallCurve(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    graft.util.CacheRegistry.releaseAll()
    got
  }

  test("probeBits = nPlanes probes every bucket: recall = 1 and scan_frac = 1") {
    val got = rows(sfDir)
    assert(got.map(_._1) == Seq(0, 1, 2, 8))
    val full = got.last
    assert(full._4 == 1.0, s"recall at full probe: $full")
    assert(full._5 == 1.0, s"scan_frac at full probe: $full")
    assert(got.forall(_._2 == 25L), "5 queries x k=5 exact truth pairs")
  }

  test("recall and scan fraction are monotone non-decreasing in probeBits") {
    val got = rows(sfDir)
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._4 >= a._4, s"recall dropped: $a -> $b")
        assert(b._5 >= a._5, s"scan_frac dropped: $a -> $b")
      case _ => ()
    }
    assert(got.head._5 < 1.0, "single-bucket probe must not scan the whole corpus")
  }

  test("the probeBits=1 row agrees with the independently-proven C6 and brute demos") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val lsh1 = TextDemos.annLshTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.util.CacheRegistry.releaseAll()
    val got = rows(sfDir)
    val pb1 = got(1)
    assert(pb1._1 == 1)
    assert(pb1._3 == (lsh1 & brute).size.toLong,
      s"n_hits ${pb1._3} vs demo intersection ${(lsh1 & brute).size}")
    assert(pb1._4 == (lsh1 & brute).size.toDouble / brute.size)
  }
}
