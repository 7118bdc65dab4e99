package graft

import graft.operators.{Similarity, TextDemos}

/** C97 ivf_recall_curve: the full-probe sanity row (nprobe = #clusters
  * IS brute force), monotonicity of both axes, and agreement with the
  * already-proven C15b/C5 demos at nprobe = 1.
  */
class IvfRecallCurveSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def rows(dir: String): Seq[(Int, Long, Long, Double, Double)] = {
    val got = TextDemos.ivfRecallCurve(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    graft.util.CacheRegistry.releaseAll()
    got
  }

  test("full probe width IS brute force: recall = 1 and scan_frac = 1 at nprobe = 10") {
    val got = rows(sfDir)
    assert(got.map(_._1) == Seq(1, 2, 4, 10))
    val full = got.last
    assert(full._4 == 1.0, s"recall at full probe: $full")
    assert(full._5 == 1.0, s"scan_frac at full probe: $full")
    // 5 queries x k=5 exact truth pairs
    assert(got.forall(_._2 == 25L))
  }

  test("recall and scan fraction are monotone non-decreasing in nprobe") {
    val got = rows(sfDir)
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._4 >= a._4, s"recall dropped: $a -> $b")
        assert(b._5 >= a._5, s"scan_frac dropped: $a -> $b")
      case _ => ()
    }
    // the curve must actually climb somewhere on this corpus
    assert(got.head._4 < 1.0 || got.head._5 == 1.0,
      "nprobe=1 at recall 1.0 with a partial scan would make the sweep degenerate")
  }

  test("the fused single-pass curve equals the literal per-width ivfTopK sweep") {
    // the r13 restructure's witness: the production curve tags each
    // truth hit with its cluster's probe rank instead of re-running
    // ivfTopK per width — valid because probed sets nest and truth is
    // the global top-5 under the same (sim, cand_id) order. This
    // recomputes every width the slow literal way and demands identity.
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("label"))
    val cents = Similarity.ivfCentroids(emb, "embedding", "label")
    val truth = Similarity.bruteTopK(queries, corpus, k = 5)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sizes = corpus.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val nQ = queries.count(); val nC = corpus.count()
    val want = Seq(1, 2, 4, 10).map { np =>
      val ivf = Similarity.ivfTopK(queries, corpus, cents, k = 5, nprobe = np)
        .select(col("query_id"), col("cand_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val scanned = Similarity.ivfAssignN(queries, cents, np)
        .select(col("label")).collect().map(r => sizes(r.get(0))).sum
      (np, truth.size.toLong, (ivf & truth).size.toLong,
        (ivf & truth).size.toDouble / truth.size.toDouble,
        scanned.toDouble / (nQ * nC).toDouble)
    }
    val got = rows(sfDir)
    assert(got == want, s"fused curve diverged from the literal sweep:\n$got\n$want")
  }

  test("the nprobe=1 row agrees with the independently-proven C15b and brute demos") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("label"))
    val ivf1 = TextDemos.ivfTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.util.CacheRegistry.releaseAll()
    val got = rows(sfDir)
    val np1 = got.head
    assert(np1._3 == (ivf1 & brute).size.toLong,
      s"n_hits ${np1._3} vs demo intersection ${(ivf1 & brute).size}")
    assert(np1._4 == (ivf1 & brute).size.toDouble / brute.size)
  }
}
