package graft

import org.apache.spark.sql.functions._

import graft.operators.Fusion

/** C52 — Reciprocal Rank Fusion: reference equality on random
  * rankings, single-ranker membership semantics, deterministic
  * tie-break, and the integer-exactness claim behind the e9 scores. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def c(rank: Long, rrfK: Long = 60L): Long = 1000000000L / (rrfK + rank)

  test("C52 rrf: hand-computed fusion, docs missing from one ranker, doc_id tie-break") {
    // query 1: doc 10 is rank 1 lexically and rank 3 densely;
    // doc 11 only lexical rank 2; doc 12 only dense rank 1
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 12L, 1L), (1L, 10L, 3L)).toDF("query_id", "doc_id", "rank")
    val out = Fusion.rrf(Seq(lex, dense), k = 3)
      .select("query_id", "doc_id", "rrf_score_e9", "rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(out.toSeq == Seq(
      (1L, 10L, c(1) + c(3), 1L),
      (1L, 12L, c(1), 2L),
      (1L, 11L, c(2), 3L)))
    // equal scores tie-break by doc_id ascending: two docs each only
    // rank 1 in one ranker
    val a = Seq((2L, 21L, 1L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((2L, 20L, 1L)).toDF("query_id", "doc_id", "rank")
    val tied = Fusion.rrf(Seq(a, b), k = 2)
      .select("doc_id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(tied.toSeq == Seq((20L, 1L), (21L, 2L)))
  }

  test("C52 rrf: reference equality on random multi-query rankings") {
    val rnd = new scala.util.Random(42)
    // three rankers, 5 queries, each ranking a random subset of 30 docs
    val rankers = Seq.tabulate(3) { _ =>
      (for {
        q <- 0L until 5L
        (d, i) <- rnd.shuffle((0L until 30L).toList).take(12).zipWithIndex
      } yield (q, d, i + 1L))
    }
    val dfs = rankers.map(_.toDF("query_id", "doc_id", "rank"))
    val got = Fusion.rrf(dfs, k = 8)
      .select("query_id", "doc_id", "rrf_score_e9", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    // independent reference: plain Scala maps
    val want = (0L until 5L).flatMap { q =>
      val scores = rankers.flatMap(_.filter(_._1 == q).map { case (_, d, r) => d -> c(r) })
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      scores.toSeq.sortBy { case (d, s) => (-s, d) }.take(8).zipWithIndex
        .map { case ((d, s), i) => (q, d, s, i + 1L) }
    }.toSet
    assert(got == want)
  }

  test("C56 hard negatives: lexical top-20 minus dense top-5, query never its own negative") {
    val out = graft.operators.TextDemos.hardNegatives(spark, sfDir)
      .select("query_id", "doc_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (q, d) => q != d },
      "the query doc (dense rank 1) must be anti-joined away")
    // composition property: exactly the BM25 top-20 with dense top-5 removed
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .join(graft.sources.Tables.embeddings(spark, sfDir)
        .withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
    val queries = corpus.filter(col("doc_id") % 97 === 0)
    val lex = graft.operators.Bm25.topK(corpus, "doc_id", "text",
      queries.select(col("doc_id").as("query_id"),
        slice(graft.functions.Text.wsTokens(col("text")), 1, 8).as("terms")), k = 20)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    val dense = graft.operators.Similarity.bruteTopK(
        queries.select(col("doc_id").as("query_id"), col("embedding").as("qv")),
        corpus.select(col("doc_id").as("cand_id"), col("embedding").as("cv")), k = 5)
      .select(col("query_id"), col("cand_id")).as[(Long, Long)].collect().toSet
    assert(out.toSet == lex.diff(dense))
    graft.util.CacheRegistry.releaseAll()
  }

  test("C52 rrf: floor(1e9/(rrfK+rank)) is float-exact for every plausible rank") {
    for (r <- 1L to 10000L) {
      val viaDouble = math.floor(1000000000.0 / (60.0 + r)).toLong
      val exact = 1000000000L / (60L + r)
      assert(viaDouble == exact, s"rank $r: $viaDouble != $exact")
    }
  }
}

/** C53 — MMR rerank: textbook sequential-reference equality on random
  * inputs, the diversity property it exists for, λ=1 degeneration to
  * pure relevance, and candidate exhaustion. */
class MmrSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Mmr

  /** sequential double-accumulation over float elements — the
    * graft_dot expression's exact fold order. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** textbook greedy MMR, written sequentially (the shape the unrolled
    * relational rounds must reproduce). */
  private def refMmr(cand: Seq[(Long, Double, Array[Float])], k: Int,
                     lambda: Double): Seq[(Long, Int, Double)] = {
    val sims = (for (a <- cand; b <- cand if a._1 != b._1)
      yield (a._1, b._1) -> r6(cos(a._3, b._3))).toMap
    var selected = List.empty[Long]
    var out = List.empty[(Long, Int, Double)]
    for (t <- 1 to math.min(k, cand.size)) {
      val scored = cand.filterNot(c => selected.contains(c._1)).map { c =>
        val maxsim = if (selected.isEmpty) 0.0
          else selected.map(s => sims((c._1, s))).max
        (c._1, lambda * c._2 - (1 - lambda) * maxsim)
      }
      val pick = scored.minBy { case (d, s) => (-s, d) }
      selected ::= pick._1
      out :+= (pick._1, t, pick._2)
    }
    out
  }

  test("C53 mmr: equals the sequential textbook reference on random candidates") {
    val rnd = new scala.util.Random(7)
    val byQuery = (0L until 4L).map { q =>
      q -> Seq.tabulate(12) { i =>
        (i.toLong, r6(rnd.nextDouble()), Array.fill(8)(rnd.nextGaussian().toFloat))
      }
    }
    val candDf = byQuery.flatMap { case (q, cs) =>
      cs.map(c => (q, c._1, c._2, c._3.toSeq))
    }.toDF("query_id", "doc_id", "rel", "vec")
      .withColumn("vec", col("vec").cast("array<float>"))
    val got = Mmr.rerank(candDf, k = 5, lambda = 0.7)
      .select("query_id", "doc_id", "mmr_round", "mmr_score")
      .as[(Long, Long, Int, Double)].collect().toSet
    val want = byQuery.flatMap { case (q, cs) =>
      refMmr(cs, 5, 0.7).map { case (d, t, s) => (q, d, t, s) }
    }.toSet
    assert(got == want)
  }

  test("C53 mmr: diversity — second pick leaves the first pick's tight cluster") {
    // cluster A: three nearly-identical high-rel vectors; cluster B:
    // orthogonal, slightly lower rel. Pure relevance takes A,A,A;
    // MMR must take an A then the B.
    val cand = Seq(
      (1L, 1L, 0.99, Seq(1.0f, 0.0f, 0.0f, 0.010f)),
      (1L, 2L, 0.98, Seq(1.0f, 0.0f, 0.0f, 0.011f)),
      (1L, 3L, 0.97, Seq(1.0f, 0.0f, 0.0f, 0.012f)),
      (1L, 4L, 0.80, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("query_id", "doc_id", "rel", "vec")
    val picks = Mmr.rerank(cand, k = 2, lambda = 0.5)
      .orderBy("mmr_round").select("doc_id").as[Long].collect()
    assert(picks.toSeq == Seq(1L, 4L), s"picks: ${picks.toSeq}")
  }

  test("C53 mmr: lambda=1 is pure relevance; short queries exhaust early") {
    val cand = Seq(
      (1L, 10L, 0.3), (1L, 11L, 0.9), (1L, 12L, 0.6)
    ).map { case (q, d, r) => (q, d, r, Seq(d.toFloat, 1.0f)) }
      .toDF("query_id", "doc_id", "rel", "vec")
    val out = Mmr.rerank(cand, k = 5, lambda = 1.0)
      .orderBy("mmr_round")
      .select("doc_id", "mmr_round").as[(Long, Int)].collect()
    // only 3 candidates -> 3 rounds, in pure rel order
    assert(out.toSeq == Seq((11L, 1), (12L, 2), (10L, 3)))
  }
}
