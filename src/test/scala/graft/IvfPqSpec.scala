package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextDemos}
import graft.sources.Tables

/** C64 IVF-PQ: structural contract of the composed index — residuals,
  * codebooks, codes, and the probe-restricted ADC search. */
class IvfPqSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val cents = Similarity.ivfCentroids(emb, "embedding", "label")
  private lazy val corpus = emb.filter(col("vec_id") >= 5)
    .select(col("vec_id").as("cand_id"), col("embedding"), col("label"))
  private lazy val resid =
    Similarity.ivfPqResiduals(corpus, "cand_id", "embedding", "label", cents, m = 8, dim = 64)
  private lazy val books = Similarity.ivfPqBooks(resid, "cand_id", bits = 4)
  private lazy val codes = Similarity.ivfPqEncode(resid, "cand_id", "label", books)

  test("residuals: 64 per vector, exactly v - centroid(label) at 9 places") {
    val n = corpus.count()
    assert(resid.count() == n * 64)
    val centMap = cents.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val raw = corpus.limit(10).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val got = resid.collect()
      .map(r => (r.getLong(0), r.getInt(2) * 8 + r.getInt(3)) -> r.getDouble(4)).toMap
    raw.foreach { case (id, v, label) =>
      v.indices.foreach { pos =>
        // valueOf (shortest-string), not new BigDecimal (binary
        // expansion) — Spark's round() goes through valueOf
        val want = java.math.BigDecimal.valueOf(v(pos).toDouble - centMap((label, pos)))
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        assert(got((id, pos)) == want, s"vec $id pos $pos")
      }
    }
  }

  test("books: every subspace carries populated sign-orthant codes, 8 dims each") {
    val shape = books.groupBy(col("subspace"))
      .agg(countDistinct(col("code")).as("nc"), count(lit(1)).as("rows"))
      .collect()
    assert(shape.length == 8)
    shape.foreach { r =>
      val nc = r.getLong(1)
      // 4 sign bits → up to 16 orthants; only populated ones get a book
      assert(nc >= 2 && nc <= 16, r.toString)
      assert(r.getLong(2) == nc * 8, s"each code must carry all 8 subpos rows: $r")
    }
    // the orthant centroids genuinely differ (the id-mod bootstrap
    // failure mode was 2^bits near-copies of the global mean): within
    // a subspace, some pair of codes must differ materially at some dim
    val spread = books.groupBy(col("subspace"), col("subpos"))
      .agg((max(col("centroid")) - min(col("centroid"))).as("d"))
      .groupBy(col("subspace")).agg(max(col("d")).as("dmax"))
      .collect()
    spread.foreach(r => assert(r.getDouble(1) > 0.05,
      s"subspace ${r.getInt(0)} codebooks look degenerate: $r"))
  }

  test("codes: m rows per candidate, each carrying its coarse label") {
    val perCand = codes.groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("label")).as("nl"))
    assert(perCand.filter(col("n") =!= 8 || col("nl") =!= 1).count() == 0)
    assert(codes.count() == corpus.count() * 8)
  }

  test("search: results come only from probed clusters; k ranked per query; deterministic") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val out = Similarity.ivfPqTopK(queries, codes, books, cents,
      k = 5, m = 8, dim = 64, nprobe = 2)
    val rows = out.collect()
    val probed = Similarity.ivfAssignN(queries, cents, nprobe = 2)
      .select(col("query_id"), col("label")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSet).toMap
    val candLabel = corpus.select(col("cand_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, c) = (r.getLong(0), r.getLong(1))
      assert(probed(q).contains(candLabel(c)),
        s"query $q got candidate $c from unprobed cluster ${candLabel(c)}")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 5)
      assert(r.getDouble(2) >= 0.0, "ADC squared distance must be non-negative")
    }
    // per-query ranks are 1..n without gaps, dist non-decreasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_.getDouble(2)).toSeq == sorted.map(_.getDouble(2)).sorted.toSeq)
    }
    // bit-deterministic across plans/partitionings
    val again = Similarity.ivfPqTopK(queries.repartition(7), codes.repartition(5),
      books, cents, k = 5, m = 8, dim = 64, nprobe = 2).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("search plan: dtable broadcasts; codes side never builds a cartesian") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val out = Similarity.ivfPqTopK(queries, codes, books, cents,
      k = 5, m = 8, dim = 64, nprobe = 2)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"),
      "the corpus-scale codes join must never be cartesian")
  }

  private def recallAt(queries: org.apache.spark.sql.DataFrame,
                       truth: Map[Long, Set[Long]],
                       bks: org.apache.spark.sql.DataFrame,
                       cds: org.apache.spark.sql.DataFrame,
                       nprobe: Int): Double = {
    val approx = Similarity.ivfPqTopK(queries, cds, bks, cents,
        k = 5, m = 8, dim = 64, nprobe = nprobe).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    truth.map { case (q, t) =>
      (t & approx.getOrElse(q, Set.empty)).size.toDouble / t.size
    }.sum / truth.size
  }

  test("recall@5: monotone in nprobe, above chance; Lloyd books lower distortion") {
    // CONTEXT for the floors: the synthetic embeddings are unit-norm
    // and largely ISOTROPIC (AnnRecallSpec measures same-label mean
    // cosine ≈ 0.004) — 64 informative dims compressed to 8×4-bit
    // bootstrap codes keeps 32 bits/vector, so absolute recall is
    // bitrate-bound BY THEORY here, not by a plan defect (verified:
    // the same chain with UNQUANTIZED residuals recalls 1.000 at
    // nprobe=#cells, and each extra sign bit per subspace ~tripled
    // recall: 3 bits 0.08 → 4 bits 0.24); on corpora with real
    // cluster structure the same index recalls far more. What must
    // hold regardless of corpus geometry: candidate-superset
    // monotonicity, material lift over random ranking, and the trained
    // codebooks not trailing the sign-orthant bootstrap.
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val truth = Similarity.bruteTopK(queries,
        corpus.select(col("cand_id"), col("embedding").as("cv")), k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val nLabels = corpus.select(countDistinct(col("label"))).head().getLong(0).toInt
    val r = Seq(1, 2, nLabels).map(np =>
      np -> recallAt(queries, truth, books, codes, np)).toMap
    // chance: 5 draws from ~470 candidates hitting a 5-element set
    val chance = 5.0 * 5.0 / corpus.count()
    info(f"ivfpq bootstrap recall@5: nprobe1=${r(1)}%.3f nprobe2=${r(2)}%.3f " +
      f"nprobe$nLabels=${r(nLabels)}%.3f (chance ≈ $chance%.3f)")
    assert(r(1) <= r(2) + 1e-12 && r(2) <= r(nLabels) + 1e-12, r.toString)
    assert(r(nLabels) >= 3 * chance,
      s"all-cells recall ${r(nLabels)} not materially above chance $chance")
    // the self-trained tier: Lloyd-in-L2 refinement seeded from the
    // orthant books — distortion can only fall (monotonicity), so the
    // trained books must dominate the bootstrap on reconstruction and
    // must not trail it on recall
    val trained = Similarity.ivfPqBooksFit(resid, "cand_id",
      bits = 4, rounds = 3)
    def distortion(bks: org.apache.spark.sql.DataFrame): Double =
      resid.join(broadcast(bks), Seq("subspace", "subpos"))
        .withColumn("_d", (col("rv") - col("centroid")) * (col("rv") - col("centroid")))
        .groupBy(col("cand_id"), col("subspace"), col("code")).agg(sum(col("_d")).as("_l2"))
        .groupBy(col("cand_id"), col("subspace")).agg(min(col("_l2")).as("_m"))
        .agg(avg(col("_m"))).head().getDouble(0)
    val (db, dt) = (distortion(books), distortion(trained))
    info(f"residual quantization distortion: bootstrap $db%.5f -> trained $dt%.5f")
    assert(dt <= db + 1e-12, s"Lloyd refinement must not raise distortion: $dt vs $db")
    val trainedCodes = Similarity.ivfPqEncode(resid, "cand_id", "label", trained)
    val rt = recallAt(queries, truth, trained, trainedCodes, nLabels)
    // recall itself is NOT asserted ≥ bootstrap: 5 queries × top-5 is a
    // 25-slot sample (granularity 0.04), and on an isotropic corpus
    // lower reconstruction error does not imply better top-k ordering
    // — measured r10: distortion 0.0787 → 0.0693 while recall read
    // 0.24 vs 0.16 (a two-hit swing). The guaranteed relationship is
    // the distortion one, asserted above; recall must stay above
    // chance.
    info(f"ivfpq trained recall@5 (all cells): $rt%.3f vs bootstrap ${r(nLabels)}%.3f")
    assert(rt >= 2 * chance, s"trained recall $rt not above chance $chance")
  }

  test("pruneScan: a label-partitioned codes layout reads only probed partitions") {
    val dir = tempDir("graft_ivfpq_part")
    codes.write.partitionBy("label").parquet(s"$dir/codes")
    val codesP = spark.read.parquet(s"$dir/codes")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val plain = Similarity.ivfPqTopK(queries, codesP, books, cents,
      k = 5, m = 8, dim = 64, nprobe = 2).collect().map(_.toString).sorted
    val pruned = Similarity.ivfPqTopK(queries, codesP, books, cents,
      k = 5, m = 8, dim = 64, nprobe = 2, pruneScan = true)
    val prunedRows = pruned.collect().map(_.toString).sorted
    assert(prunedRows.nonEmpty && prunedRows.sameElements(plain),
      "pruned search must return exactly the unpruned rows")
    // the codes FileScan must carry a LITERAL partition filter
    val plan = pruned.queryExecution.executedPlan.toString
    val codeScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("codes")).toSeq
    assert(codeScans.nonEmpty, plan.linesIterator.take(20).mkString("\n"))
    assert(codeScans.exists(l => l.contains("PartitionFilters: [") &&
      !l.contains("PartitionFilters: []") &&
      (l.contains(" IN (") || l.contains("label#"))),
      s"no literal partition filter on the codes scan:\n${codeScans.mkString("\n")}")
  }

  test("demo: persisted-index search answers like the inline chain") {
    val inline = {
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.ivfPqTopK(queries, codes, books, cents,
        k = 5, m = 8, dim = 64, nprobe = 2)
        .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    }
    val demo = TextDemos.ivfPqTopkDemo(spark, sfDir).collect().map(_.toString).toSeq
    assert(demo == inline)
  }

  test("C73 rerank: picks ⊆ ADC candidates, scored by exact cosine, recall ≥ ADC") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpusV = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val kCand = 20
    val adc = Similarity.ivfPqTopK(queries, codes, books, cents,
        k = kCand, m = 8, dim = 64, nprobe = 2)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rr = Similarity.ivfPqRerank(queries, corpusV, codes, books, cents,
        k = 5, kCand = kCand, m = 8, dim = 64, nprobe = 2)
      .select("query_id", "cand_id", "sim").as[(Long, Long, Double)].collect()
    assert(rr.nonEmpty)
    // membership: every rerank pick came from that query's ADC top-kCand
    rr.foreach { case (q, c, _) => assert(adc(q).contains(c), s"$c not ADC cand of $q") }
    // exactness: sims are the true cosines of the raw vectors
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    rr.foreach { case (q, c, s) =>
      assert(math.abs(s - cos(vecs(q), vecs(c))) < 1e-9, s"sim drift for ($q,$c)") }
    // recall repair: exact-rescored top-5 recalls ground truth at least
    // as well as the ADC top-5 it replaces
    val truth = Similarity.bruteTopK(queries, corpusV, k = 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adc5 = Similarity.ivfPqTopK(queries, codes, books, cents,
        k = 5, m = 8, dim = 64, nprobe = 2)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rr5 = rr.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (hitRr, hitAdc) = truth.keys.map(q =>
      ((rr5(q) intersect truth(q)).size, (adc5(q) intersect truth(q)).size))
      .foldLeft((0, 0)) { case ((a, b), (x, y)) => (a + x, b + y) }
    assert(hitRr >= hitAdc, s"rerank recall $hitRr < adc recall $hitAdc")
  }

  test("C73 rerank plan: the corpus-side vector join broadcasts even with stats off") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpusV = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val df = Similarity.ivfPqRerank(queries, corpusV, codes, books, cents,
        k = 5, kCand = 20, m = 8, dim = 64, nprobe = 2)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"candidate side must FORCE broadcast into the corpus join:\n$p")
    } finally spark.conf.set(key, prev)
  }
}
