package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextDemos}

/** C58/C60/C61/C62: each demo checked against an independent Scala
  * reference computation over the collected sf0.001 corpus (50 docs —
  * driver-trivial), plus unit semantics for the representative
  * selection. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs: Array[(Long, String, String, String, Long)] =
    graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  private def toks(t: String): Array[String] = t.split(" ").filter(_.nonEmpty)

  test("C58 clusterRepresentatives: argmax score, ties to smallest id, members counted") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L)).toDF("doc_id", "cluster")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (9L, 0.1)).toDF("doc_id", "score")
    val got = Dedup.clusterRepresentatives(clusters, scores, "doc_id", "score")
      .orderBy("cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // cluster 1: docs 2 and 3 tie at 0.9 → smallest id (2) wins; 3 members
    // cluster 9: singleton represents itself
    assert(got.toSeq == Seq((1L, 2L, 0.9, 3L), (9L, 9L, 0.1, 1L)))
  }

  test("C58 demo: every rep belongs to its cluster and maximizes quality within it") {
    val reps = TextDemos.clusterRepresentative(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val membership = TextDemos.dedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = membership.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val score = TextDemos.qualityScore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(reps.length == byCluster.size, "one row per cluster")
    reps.foreach { case (cluster, rep, repScore, n) =>
      val members = byCluster(cluster)
      assert(members.contains(rep))
      assert(n == members.size)
      assert(repScore == score(rep))
      assert(members.forall(m => score(m) < repScore ||
        (score(m) == repScore && m >= rep)), s"cluster $cluster rep $rep not argmax")
    }
  }

  test("C60 topkNgrams matches a driver reference count") {
    val counts = scala.collection.mutable.Map.empty[String, (Long, Set[Long])]
    docs.foreach { case (id, text, _, _, _) =>
      val t = toks(text)
      t.indices.dropRight(2).foreach { i =>
        val g = s"${t(i)} ${t(i + 1)} ${t(i + 2)}"
        val (c, d) = counts.getOrElse(g, (0L, Set.empty[Long]))
        counts(g) = (c + 1, d + id)
      }
    }
    val want = counts.toSeq
      .map { case (g, (c, d)) => (g, c, d.size.toLong) }
      .sortBy { case (g, c, _) => (-c, g) }
      .take(25)
    val got = TextDemos.topkNgrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("C61 pmiBigrams matches a driver reference (exact integer ratio arithmetic)") {
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    val uni = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text, _, _, _) =>
      val t = toks(text)
      t.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      t.indices.dropRight(1).foreach { i =>
        val k = (t(i), t(i + 1)); bi(k) = bi.getOrElse(k, 0L) + 1
      }
    }
    val n = uni.values.sum
    val want = bi.toSeq.filter(_._2 >= 5)
      .map { case ((a, b), c) =>
        (a, b, c, (c * n).toDouble / (uni(a) * uni(b)).toDouble) }
      .sortBy { case (a, b, _, r) => (-r, a, b) }
      .take(25)
    val got = TextDemos.pmiBigrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("C60 sketch path: count-min estimates dominate exact counts within eps*N") {
    // the documented 100 TB swap-in for the heavy-hitter scan: a CMS
    // keeps the counts in eps-bounded sublinear space. Proof of the
    // guarantee pair on the real corpus: est >= true (never
    // undercounts) and est <= true + eps*N (w.h.p.).
    val ngrams = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(call_function("graft_shingles",
        col("text"), lit(3), lit(false))).as("ngram"))
    val eps = 0.001
    val bytes = ngrams
      .agg(count_min_sketch(col("ngram"), lit(eps), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val n = ngrams.count()
    val exact = TextDemos.topkNgrams(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (g, c) =>
      // binary estimate: the SQL aggregate added UTF8String BYTES
      val est = cms.estimateCount(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(est >= c, s"CMS undercounted '$g': $est < $c")
      assert(est <= c + (eps * n).toLong + 1, s"CMS for '$g': $est vs $c + eps*N")
    }
  }

  test("C66 minhashLshEval matches a driver-computed exact-Jaccard reference") {
    val shingles = docs.map { case (id, text, _, _, _) =>
      id -> toks(text).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val ids = shingles.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = shingles(ids(i)); b = shingles(ids(j))
      inter = (a & b).size
      if inter > 0 && inter.toDouble / (a.size + b.size - inter) >= 0.25
    } yield (ids(i), ids(j))).toSet
    val pred = TextDemos.dedupMinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = TextDemos.minhashLshEval(spark, sfDir).head()
    assert(r.getLong(0) == truth.size, s"n_truth ${r.getLong(0)} vs ${truth.size}")
    assert(r.getLong(1) == pred.size)
    assert(r.getLong(2) == (pred & truth).size)
    assert(r.getDouble(3) == (if (pred.isEmpty) 0.0 else (pred & truth).size.toDouble / pred.size))
    assert(r.getDouble(4) == (if (truth.isEmpty) 0.0 else (pred & truth).size.toDouble / truth.size))
    // hot-shingle df cap: driver reference of the capped truth — sizes
    // stay FULL, intersections count only shingles with df <= cap
    val dfCap = math.max(5L, docs.size / 100L)
    val dfm = shingles.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val hot = dfm.filter(_._2 > dfCap).keySet
    val truthC = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = shingles(ids(i)); b = shingles(ids(j))
      ic = ((a & b) -- hot).size
      if ic > 0 && ic.toDouble / (a.size + b.size - ic) >= 0.25
    } yield (ids(i), ids(j))).toSet
    assert(r.getLong(5) == dfCap, s"df_cap ${r.getLong(5)} vs $dfCap")
    assert(r.getLong(6) == hot.size, s"n_hot ${r.getLong(6)} vs ${hot.size}")
    assert(r.getLong(7) == truthC.size, s"n_truth_capped ${r.getLong(7)} vs ${truthC.size}")
    assert(r.getLong(8) == (pred & truthC).size)
    assert(r.getDouble(9) == (if (pred.isEmpty) 0.0 else (pred & truthC).size.toDouble / pred.size))
    assert(r.getDouble(10) == (if (truthC.isEmpty) 0.0 else (pred & truthC).size.toDouble / truthC.size))
    // the cap only ever SHRINKS the truth (sizes exact, intersections
    // lose hot shingles — capped Jaccard <= true Jaccard, pairwise)
    assert(truthC.subsetOf(truth), (truthC -- truth).take(3).toString)
    info(s"LSH k=32 b=8 t=0.25 on sf0.001: truth=${truth.size} pred=${pred.size} " +
      f"hit=${(pred & truth).size} P=${r.getDouble(3)}%.3f R=${r.getDouble(4)}%.3f " +
      s"| cap=$dfCap hot=${hot.size} truth_capped=${truthC.size}")
  }

  test("C66 df cap bound: boilerplate-glued pairs exit the capped truth, organic pairs survive") {
    import spark.implicits._
    // 12 docs share one boilerplate trigram (hot: df 12 > cap 5 with
    // a forced corpus of >=500? — cap is max(5, n/100), n=14 -> 5);
    // two docs are organic near-dups sharing many RARE shingles
    // each boiler doc: 4 shared tokens -> 2 shared (hot) trigrams out
    // of 5 total => pairwise J = 2/8 = 0.25, carried ONLY by boilerplate
    val boiler = "copyright acme corp legal"
    val rows =
      (1L to 12L).map(i => (i, s"$boiler filler$i tail$i content$i")) ++
      Seq((13L, "alpha beta gamma delta epsilon zeta"),
          (14L, "alpha beta gamma delta epsilon eta"))
    val dir = tempDir("lsh_cap_bound")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    // embeddings table unused by this row but Tables may not need it
    val r = TextDemos.minhashLshEval(spark, dir).head()
    val (nTruth, nTruthC) = (r.getLong(0), r.getLong(7))
    // the boilerplate-glued pairs qualify UNCAPPED only through the
    // hot shingle; organic pair (13,14) stays in both truths
    assert(r.getLong(5) == 5L, s"df_cap ${r.getLong(5)}")
    assert(r.getLong(6) >= 1L, "the boilerplate shingle must be hot")
    assert(nTruthC < nTruth, s"cap must shrink this truth: $nTruth -> $nTruthC")
    assert(nTruthC >= 1L, "the organic near-dup pair must survive the cap")
  }

  test("C62 datasetCard matches a driver reference; shares sum to 1") {
    val groups = docs.groupBy { case (_, _, lang, source, _) => (source, lang) }
    val totalTokens = docs.map { case (_, t, _, _, _) => toks(t).length.toLong }.sum
    val got = TextDemos.datasetCard(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(got.size == groups.size)
    groups.foreach { case (key, rows) =>
      val sumTok = rows.map { case (_, t, _, _, _) => toks(t).length.toLong }.sum
      val chars = rows.map(_._5)
      val want = (rows.length.toLong, sumTok, chars.min, chars.max,
        chars.sum.toDouble / rows.length, sumTok.toDouble / totalTokens.toDouble)
      assert(got(key) == want, s"$key: ${got(key)} vs $want")
    }
    assert(math.abs(got.values.map(_._6).sum - 1.0) < 1e-9)
  }

  test("C74 crawl funnel: monotone, stage counts recompute from a driver reference") {
    import spark.implicits._
    val funnel = TextDemos.crawlIngestE2e(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(funnel.keySet == Set("f0_ingested", "f1_lang_en", "f2_deduped",
      "f3_decontaminated"))
    assert(funnel("f0_ingested") >= funnel("f1_lang_en"))
    assert(funnel("f1_lang_en") >= funnel("f2_deduped"))
    assert(funnel("f2_deduped") >= funnel("f3_decontaminated"))
    // driver recompute of the first two stages (dedup/contamination
    // recompute is the oracle's job; here pin the gate semantics)
    val docs = sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(funnel("f0_ingested") == docs.length)
    val profiles = functions.Text.LangProfiles
    val en = docs.count { case (_, text) =>
      val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)
      val hits = profiles.map { case (l, stops) => l -> toks.count(stops.contains) }
      val mx = hits.map(_._2).max
      mx > 0 && hits.find(_._2 == mx).get._1 == "en"
    }
    assert(funnel("f1_lang_en") == en)
    // the %20 benchmark docs read fully contaminated, so any surviving
    // benchmark doc must have been dropped by the decontamination gate
    assert(funnel("f3_decontaminated") < funnel("f2_deduped"),
      "the benchmark slice must cost the funnel something at this SF")
  }

  test("C72 token_stats_by_lang recomputes from a driver reference") {
    import spark.implicits._
    val docs = sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val profiles = functions.Text.LangProfiles
    def predLang(text: String): String = {
      // Locale.ROOT: Spark's lower() is locale-independent; the default
      // locale (e.g. Turkish dotless-i) would diverge (review finding)
      val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)
      val hits = profiles.map { case (l, stops) => l -> toks.count(stops.contains) }
      val mx = hits.map(_._2).max
      if (mx == 0) "und" else hits.find(_._2 == mx).get._1
    }
    val want = docs.groupBy(d => (predLang(d._3), d._2)).map { case (k, ds) =>
      val toks = ds.map(_._3.split(" ").count(_.nonEmpty).toLong).sum
      val chars = ds.map(_._3.length.toLong).sum
      k -> ((ds.length.toLong, toks, chars,
        if (toks > 0) chars.toDouble / toks else 0.0))
    }
    val got = TextDemos.tokenStatsByLang(spark, sfDir)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == want)
  }
}
