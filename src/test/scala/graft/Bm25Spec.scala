package graft

import graft.operators.Bm25

/** C37 BM25 retrieval: the relational scorer must match a plain-Scala
  * reference (same formula, same 6-place half-up rounding, decimal
  * sum) including posting-list semantics — OOV query terms score
  * nothing, docs sharing no term are not candidates. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  /** reference scorer over an in-memory corpus. */
  private def refBm25(corpus: Seq[(Long, String)], queries: Seq[(Long, Seq[String])],
      k: Int): Seq[(Long, Long, Double, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val tf = toks.flatMap { case (id, ts) => ts.map(id -> _) }
      .groupBy(identity).map { case ((id, w), xs) => (id, w) -> xs.length.toLong }
    val dl = toks.map { case (id, ts) => id -> ts.length.toLong }.filter(_._2 > 0).toMap
    val df = tf.keys.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val n = corpus.length.toLong
    val avgdl = dl.values.sum.toDouble / n
    queries.flatMap { case (qid, terms) =>
      val scored = terms.distinct.flatMap { w =>
        df.get(w).toSeq.flatMap { dfw =>
          tf.collect { case ((id, `w`), tfv) =>
            val raw = math.log((n - dfw + 0.5) / (dfw + 0.5) + 1) *
              tfv * (Bm25.K1 + 1) /
              (tfv + Bm25.K1 * ((1 - Bm25.B) + Bm25.B * dl(id) / avgdl))
            id -> BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          }
        }
      }.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum.toDouble }
      scored.toSeq.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
    }
  }

  test("C37: randomized corpora match the reference scorer, ranks and scores") {
    val rnd = new scala.util.Random(20260813L)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    (1 to 3).foreach { trial =>
      val corpus = Seq.tabulate(40)(i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")))
      val queries = Seq(
        (100L, Seq(words(rnd.nextInt(words.size)), words(rnd.nextInt(words.size)))),
        (101L, Seq(words(rnd.nextInt(words.size)), "oovword")), // OOV term ignored
        (102L, Seq("onlyoov")))                                 // no candidates at all
      val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
          queries.toDF("query_id", "terms"), k = 5)
        .orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val want = refBm25(corpus, queries, 5)
      assert(got.toSeq == want, s"trial $trial")
    }
  }

  test("C37': searching the landed impact index is bit-identical to the one-shot scorer") {
    val rnd = new scala.util.Random(20260814L)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val corpus = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")))
    val queries = Seq.tabulate(6)(q =>
      ((100 + q).toLong, Seq.fill(3)(words(rnd.nextInt(words.size))) :+ "oovword"))
    val docsDf = corpus.toDF("doc_id", "text")
    val qDf = queries.toDF("query_id", "terms")
    val dir = graft.util.Fixtures.dir("spec_bm25_idx").toString
    Bm25.buildIndex(docsDf, "doc_id", "text", dir)
    val oneShot = Bm25.topK(docsDf, "doc_id", "text", qDf, k = 7)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val fromIdx = Bm25.searchIndex(spark, dir, qDf, k = 7)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // bit-identical, not approx: the exactness argument in buildIndex's
    // doc (exact integer micro-units, sum << 2^53, one correctly-rounded
    // division) must hold on real data, scores included
    assert(fromIdx.toSeq == oneShot.toSeq)
    // and the landed artifact stores exact integers: every w_e6 must
    // round-trip round(w,6)*1e6 (spot the schema + scaling contract)
    val imp = spark.read.parquet(s"$dir/impacts")
    assert(imp.columns.toSeq == Seq("term", "doc_id", "w_e6"))
    assert(imp.count() > 0)
  }

  test("C37'': appendIndex equals a from-scratch build over the union") {
    val rnd = new scala.util.Random(7L)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val mk = (n: Int, off: Int) => Seq.tabulate(n)(i =>
      ((off + i).toLong, Seq.fill(2 + rnd.nextInt(9))(words(rnd.nextInt(words.size))).mkString(" ")))
    val oldHalf = mk(30, 0) :+ (900L, "") // a wordless doc still counts in n
    val newHalf = mk(25, 100) :+ (901L, "")
    val scratch = graft.util.Fixtures.dir("spec_bm25_scratch").toString
    val grown = graft.util.Fixtures.dir("spec_bm25_grown").toString
    Bm25.buildIndex((oldHalf ++ newHalf).toDF("doc_id", "text"), "doc_id", "text", scratch)
    Bm25.buildIndex(oldHalf.toDF("doc_id", "text"), "doc_id", "text", grown)
    Bm25.appendIndex(newHalf.toDF("doc_id", "text"), "doc_id", "text", grown)
    val key = (d: String) => spark.read.parquet(s"$d/impacts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(key(grown) == key(scratch),
      "impacts must be bit-identical: weights bake in corpus-wide stats")
    // and search over the grown index matches the one-shot union scorer
    val qDf = Seq((1L, Seq("alpha", "beta"))).toDF("query_id", "terms")
    val viaGrown = Bm25.searchIndex(spark, grown, qDf, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val oneShot = Bm25.topK((oldHalf ++ newHalf).toDF("doc_id", "text"),
        "doc_id", "text", qDf, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(viaGrown == oneShot)
  }

  test("C37'': append replay and crash-retry are exactly-once") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "alpha alpha"))
    val add = Seq((10L, "alpha delta"), (11L, "delta delta"))
    val dir = graft.util.Fixtures.dir("spec_bm25_replay").toString
    Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id", "text", dir)
    // crash simulation: a FAILED first append attempt left a partial
    // uncommitted batch dir (meta still says batches=1)
    Seq(("zzz", 99L, 123L)).toDF("term", "doc_id", "tf")
      .write.mode("overwrite").parquet(s"$dir/tf/b00001")
    // the retry overwrites the partial dir and commits cleanly
    Bm25.appendIndex(add.toDF("doc_id", "text"), "doc_id", "text", dir, batchId = 1)
    val committed = spark.read.parquet(s"$dir/impacts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(!committed.exists(_._1 == "zzz"), "partial batch debris leaked into impacts")
    // replay of the COMMITTED batch: byte-identical index, n unchanged
    Bm25.appendIndex(add.toDF("doc_id", "text"), "doc_id", "text", dir, batchId = 1)
    val replayed = spark.read.parquet(s"$dir/impacts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(replayed == committed, "a replayed committed append must be a no-op")
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    assert(meta.getAs[Long]("n") == 5 && meta.getAs[Long]("batches") == 2)
    // and equals the from-scratch union (no double-counted postings)
    val scratch = graft.util.Fixtures.dir("spec_bm25_replay_scratch").toString
    Bm25.buildIndex((docs ++ add).toDF("doc_id", "text"), "doc_id", "text", scratch)
    val fresh = spark.read.parquet(s"$scratch/impacts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(replayed == fresh)
    // a gap in the batch sequence is refused loudly
    val e = intercept[IllegalArgumentException] {
      Bm25.appendIndex(add.toDF("doc_id", "text"), "doc_id", "text", dir, batchId = 5)
    }
    assert(e.getMessage.contains("skips ahead"))
  }

  test("C37: a doc repeating the query term outranks one mentioning it once") {
    val corpus = Seq(
      (1L, "cat cat cat dog"),
      (2L, "cat bird fish lizard"),
      (3L, "dog dog bird fish")) // no 'cat': must not be a candidate
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq((7L, Seq("cat"))).toDF("query_id", "terms"), k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(got(0).getDouble(2) > got(1).getDouble(2))
  }
}
