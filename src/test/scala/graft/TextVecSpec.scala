package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, Vec}
import graft.operators.{Dedup, Similarity, TextDemos}

class TextVecSpec extends SparkSpec {
  import spark.implicits._

  test("C57 canonical text: NFC folds, casefolds, collapses; codegen'd; ASCII fast path") {
    import org.apache.spark.sql.functions._
    val decomposed = "Cafe\u0301 --- BAR!!"   // e + combining acute
    val precomposed = "caf\u00e9 bar"          // precomposed é, already canonical
    // repartition blocks ConvertToLocalRelation from constant-folding
    // the projection away, so the plan assertion sees the real stage
    val df = Seq(decomposed, precomposed, "  Tabs\tand\nlines  ", "", "...")
      .toDF("t").repartition(1)
      .select(graft.functions.Text.canonicalText(col("t")).as("c"))
    val ds = df.as[String]
    val out = ds.collect() // executes, so the AQE final plan below is real
    assert(out(0) == out(1), s"'${out(0)}' vs '${out(1)}': NFC+fold must unify the pair")
    assert(out(0) == "caf\u00e9 bar")
    assert(out(2) == "tabs and lines")
    assert(out(3) == "" && out(4) == "", "punct-only and empty collapse to empty")
    // the expression rides INSIDE whole-stage codegen (a UDF would split the stage)
    val plan = ds.queryExecution.executedPlan.toString
    // the `*(n)` marker on the Project IS the whole-stage-codegen span
    assert("\\*\\(\\d+\\) Project.*graft_nfc".r.findFirstIn(plan).nonEmpty, plan)
    // ASCII fast path: normalize skipped, the UTF8String passes through
    val ascii = org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii")
    assert(graft.expressions.NfcNormalize.compute(ascii) eq ascii)
    val nonCanon = org.apache.spark.unsafe.types.UTF8String.fromString("e\u0301")
    assert(graft.expressions.NfcNormalize.compute(nonCanon).toString == "\u00e9")
  }

  test("C10 token counting: whitespace and BPE-ish") {
    val r = Seq("hello world  foo", "a-b 12").toDF("text")
      .select(Text.tokenCount(col("text")), Text.bpeTokenCount(col("text"))).collect()
    assert(r(0).getLong(0) == 3 && r(0).getLong(1) == 3)
    assert(r(1).getLong(0) == 2 && r(1).getLong(1) == 5) // a,-,b,1,2
  }

  test("C9 quality score is in [0,1]") {
    val scores = TextDemos.qualityScore(spark, sfDir).collect().map(_.getDouble(1))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("C8 language id picks profile with most hits") {
    val (pred, _) = Text.langId(col("text"))
    val r = Seq("the cat and the dog is in", "el que de la y", "xyzzy qwerty")
      .toDF("text").select(pred).collect().map(_.getString(0))
    assert(r.sameElements(Array("en", "es", "und")))
  }

  test("C11 fingerprint: deterministic, order-sensitive") {
    val r = Seq("abc", "abc", "acb").toDF("text")
      .select(Text.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(r(0) == r(1) && r(0) != r(2))
    // polynomial hash of "abc" base 131 mod 1e9+7
    val expected = ((('a'.toLong * 131 + 'b') % 1000000007L) * 131 + 'c') % 1000000007L
    assert(r(0) == expected)
  }

  test("shingles produce distinct n-grams, empty below n tokens") {
    val r = Seq("a b c d", "a b").toDF("text")
      .select(Text.shingles(col("text"), 3)).collect()
    assert(r(0).getSeq[String](0).toSet == Set("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty)
  }

  test("native graft_shingles is bit-identical to the HOF formulation on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      // edge shapes the corpus may not hit: multi-space runs, dup
      // shingles, short docs, empty, null
      .select(col("text")).unionByName(
        Seq("a  b c  d", "x y x y x y", "one two", "", "a b c a b c a b c d")
          .toDF("text")).unionByName(
        Seq(Option.empty[String]).toDF("text"))
    for (n <- Seq(2, 3)) {
      val native = docs.select(Text.shingles(col("text"), n)).collect()
        .map(_.getSeq[String](0))
      val hof = docs.select(Text.shinglesHof(col("text"), n)).collect()
        .map(_.getSeq[String](0))
      native.zip(hof).foreach { case (a, b) => assert(a == b, s"n=$n: $a != $b") }
    }
    // with-duplicates form: position count = tokens - n + 1
    val dup = Seq("x y x y x y").toDF("text")
      .select(Text.shinglesWithDuplicates(col("text"), 2)).collect()
    assert(dup(0).getSeq[String](0) == Seq("x y", "y x", "x y", "y x", "x y"))
  }

  test("char shingles: CJK n-grams, surrogate-safe, distinct, short-input empty") {
    val r = Seq("臺北市大安區", "ab", "一一一一", "a😀b😀c").toDF("text")
      .select(Text.charShingles(col("text"), 2)).collect()
      .map(_.getSeq[String](0))
    assert(r(0) == Seq("臺北", "北市", "市大", "大安", "安區"))
    assert(r(1) == Seq("ab"))
    assert(r(2) == Seq("一一")) // duplicates collapse, first occurrence kept
    assert(r(3) == Seq("a😀", "😀b", "b😀", "😀c"), s"surrogate pairs split: ${r(3)}")
    val short = Seq("臺").toDF("text")
      .select(Text.charShingles(col("text"), 2)).collect()
    assert(short(0).getSeq[String](0).isEmpty)
  }

  test("C2 minhash over char shingles finds near-dup CJK docs") {
    val docs = Seq(
      (1L, "臺北市大安區和平東路二段一百零六號心理諮商所歡迎預約晤談服務"),
      (2L, "臺北市大安區和平東路二段一百零六號心理諮商所歡迎預約晤談服務處"),
      (3L, "高雄市左營區博愛路完全不同的另一家機構提供不同服務內容")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", shingleN = 3,
        minEstSim = 0.25, shingler = Text.charShingles)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"expected CJK near-dup (1,2), got $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("graft_shingles stays inside whole-stage codegen (no interpreted HOF)") {
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(Text.shingles(col("text"), 3)))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Generate explode(graft_shingles"),
      plan.linesIterator.take(8).mkString("\n"))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(Vec.cosine(col("a"), col("b")), Vec.cosine(col("a"), col("c"))).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && math.abs(r.getDouble(1)) < 1e-12)
  }

  test("C5 brute top-k returns k ranked neighbors per query") {
    val out = TextDemos.embedCosineTopk(spark, sfDir)
    val byQuery = out.groupBy("query_id").count().collect()
    assert(byQuery.length == 5 && byQuery.forall(_.getLong(1) == 5))
    // ranks are 1..5 and sims non-increasing within query
    val q0 = out.filter(col("query_id") === 0).orderBy("rank").collect()
    assert(q0.map(_.getAs[Long]("rank")).sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    val sims = q0.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("C5 bounded top-k aggregate matches the window formulation bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = vecs.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val agg = Similarity.bruteTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id"))
    val win = broadcast(queries).crossJoin(corpus)
      .withColumn("sim", Vec.cosineFast(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(agg == win)
  }

  test("C5 top-k plan reduces map-side: partial graft_topk before the shuffle, no Window") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = vecs.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val plan = Similarity.bruteTopK(queries, corpus, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"),
      s"expected map-side partial graft_topk in plan:\n$plan")
    assert(!plan.contains("Window"),
      s"scored stream must not flow through a per-query Window:\n$plan")
  }

  test("C5 bounded top-k ranks string ids: any orderable id type, same as a window") {
    import org.apache.spark.sql.expressions.Window
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // string doc ids — the old long-cast silently nulled these out
    val corpus = vecs.filter(col("vec_id") >= 3)
      .select(concat(lit("doc-"), lpad(col("vec_id").cast("string"), 6, "0")).as("cand_id"),
        col("embedding").as("cv"))
    val agg = Similarity.bruteTopK(queries, corpus, k = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(agg.nonEmpty, "string-id top-k returned no rows")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id"))
    val win = broadcast(queries).crossJoin(corpus)
      .withColumn("sim", Vec.cosineFast(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 4)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(agg == win)
  }

  test("graft_topk misuse fails at analysis time: k < 1, non-literal k, non-orderable id") {
    val df = Seq((1L, 0.5, 2L)).toDF("q", "sim", "id")
    val e1 = intercept[Exception] {
      df.groupBy(col("q"))
        .agg(call_function("graft_topk", struct(col("sim"), col("id")), lit(0)))
        .collect()
    }
    assert(e1.getMessage.contains("k must be >= 1"), e1.getMessage)
    val e2 = intercept[Exception] {
      df.groupBy(col("q"))
        .agg(call_function("graft_topk", struct(col("sim"), col("id")), col("id")))
        .collect()
    }
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
    val e3 = intercept[Exception] {
      df.groupBy(col("q"))
        .agg(call_function("graft_topk",
          struct(col("sim"), map(col("id"), col("id"))), lit(2)))
        .collect()
    }
    assert(e3.getMessage.contains("not orderable"), e3.getMessage)
  }

  test("C6 LSH top-k recall against brute force is reasonable") {
    val brute = TextDemos.embedCosineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDemos.annLshTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall $recall too low") // approximate; bucketing is coarse at sf0.001
  }

  test("C2 minhash estimates high similarity for near-identical docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different words describing some other topic entirely here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", minEstSim = 0.25).collect()
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m.contains((1L, 2L)), s"expected (1,2) candidate, got ${m.keySet}")
    assert(!m.contains((1L, 3L)) && !m.contains((2L, 3L)))
  }

  test("C2 incremental minhash: new batch checks against a persisted index, both id orders") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (20L, "completely different words describing some other topic entirely here now")
    ).toDF("doc_id", "text")
    val index = Dedup.minhashBandedSignatures(corpus, "doc_id", "text")
    // new batch: id 5 sorts BELOW indexed 10 (the orientation the old
    // id_a < id_b self-join filter would drop), id 99 above, 7 unique
    val batch = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (99L, "completely different words describing some other topic entirely here too"),
      (7L, "unrelated fresh content with nothing shared against anything else at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshIncremental(batch, index, "doc_id", "text",
        minEstSim = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 10L)), s"new-below-indexed pair lost: $pairs")
    assert(pairs.contains((20L, 99L)), s"new-above-indexed pair lost: $pairs")
    assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L))
    assert(!pairs.contains((10L, 20L)), "index-internal pairs must not re-report")
    // the full self-join over corpus+batch agrees on every pair that
    // involves a new doc
    val full = Dedup.minhashLsh(corpus.unionByName(batch), "doc_id", "text",
        minEstSim = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val newIds = Set(5L, 99L, 7L)
    assert(pairs == full.filter(p => newIds(p._1) || newIds(p._2)))
  }

  test("CJK variants: simhash char tokens, char-shingle Jaccard and contamination all work") {
    val a = "臺北市大安區和平東路二段一百零六號三樓心理諮商所歡迎民眾來電預約個別晤談與團體課程服務時間為週一至週六"
    val b = "臺北市大安區和平東路三段一百零六號三樓心理諮商所歡迎民眾來電預約個別晤談與團體課程服務時間為週一至週六"
    val c = "高雄市左營區完全不同的另一家機構提供截然不同的服務內容與完全無關的課程安排時段說明文字"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    // simhash over char BIGRAM tokens (the CJK norm: unigram votes are
    // margin-1 on short docs and flip too many bits per edit): a
    // one-char edit perturbs only two tokens
    val sp = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16,
        tokenizer = c0 => Text.charShinglesWithDuplicates(c0, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp.contains((1L, 2L)) && !sp.contains((1L, 3L)), s"got $sp")
    // char-shingle Jaccard: one differing char in 20 -> high but < 1
    val jac = Dedup.ngramJaccard(docs,
        Seq((1L, 2L)).toDF("id_a", "id_b"), "doc_id", "text", n = 2,
        shingler = Text.charShingles)
      .collect().head.getAs[Double]("jaccard")
    assert(jac > 0.5 && jac < 1.0, s"jaccard $jac")
    // contamination of doc 1 against a benchmark containing doc 1's text
    val cont = Dedup.contaminationCheck(docs, docs.filter(col("doc_id") === 1),
        "doc_id", "text", shingleN = 3, shingler = Text.charShingles)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("contamination")).toMap
    assert(cont(1L) == 1.0 && cont(3L) < 0.3, s"got $cont")
  }

  test("C3 incremental simhash: delta vs persisted index, both id orders, matches full join") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "wholly unrelated content about completely different things here"))
      .toDF("doc_id", "text")
    val index = Dedup.simhashBandedSignatures(corpus, "doc_id", "text")
    val batch = Seq(
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of 10, id BELOW
      (99L, "wholly unrelated content about completely different things too"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashIncremental(batch, index, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 10L)), s"new-below-indexed simhash pair lost: $pairs")
    assert(!pairs.contains((10L, 20L)), "index-internal pairs must not re-report")
    val full = Dedup.simhashPairs(corpus.unionByName(batch), "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val newIds = Set(5L, 99L)
    assert(pairs == full.filter(p => newIds(p._1) || newIds(p._2)))
  }

  test("C3 simhash: identical docs hamming 0, banded join finds them") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("C7 embedding near-dup pairs are symmetric-free and above threshold") {
    val out = TextDemos.embedNearDup(spark, sfDir).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(_.getDouble(2) > 0.2))
  }

  test("C13 connected components: chains collapse to min id, singletons self-label") {
    val nodes = (1L to 7L).map(Tuple1(_)).toDF("id")
    // components: {1,2,3,4} via chain, {5,6}, {7} singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(nodes, pairs, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L->1L, 2L->1L, 3L->1L, 4L->1L, 5L->5L, 6L->5L, 7L->7L))
  }

  test("C39 bigram LM: matches a plain-Scala reference; <2-token docs drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b a b c"), (2L, "a a a"), (3L, "c b a"),
      (4L, "solo"), (5L, ""), (6L, "b c b c b")).toDF("doc_id", "text")
    val got = graft.operators.TextDemos.bigramLmScoreOn(docs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // reference: explicit counts + BigDecimal half-up rounding
    val toks = Seq(1L -> "a b a b c", 2L -> "a a a", 3L -> "c b a",
      6L -> "b c b c b").map { case (id, t) => id -> t.split(" ").toSeq }
    val bgs = toks.flatMap { case (id, ts) => ts.zip(ts.tail).map(id -> _) }
    val cbR = bgs.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val cuR = cbR.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val vR = (toks.flatMap(_._2) ++ Seq("solo")).distinct.size.toLong
    val want = toks.map { case (id, ts) =>
      val perBg = ts.zip(ts.tail).map { p =>
        BigDecimal(math.log((cbR(p) + 0.5) / (cuR(p._1) + 0.5 * vR)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      (id, perBg.size.toLong, (perBg.sum.toDouble / perBg.size))
    }
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 6L)) // 4,5 have no bigram
    got.zip(want).foreach { case ((gi, gn, gs), (wi, wn, wsc)) =>
      assert(gi == wi && gn == wn && math.abs(gs - wsc) < 1e-12, s"doc $gi")
    }
  }

  test("C38 group sample: exact k, window-equivalent, seed-keyed, partition-invariant") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      graft.operators.Sampling.groupSample(df, "source", "doc_id", k = 7, seed = seed)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val s1 = run(docs, 17)
    // exactly k per group (every source has >= 7 docs at any SF)
    assert(s1.groupBy(_._1).forall(_._2.size == 7))
    // equals the full window-sort formulation (the thing it replaces)
    val pri = graft.functions.Vec.md5Hash60(
      concat(col("doc_id").cast("string"), lit("_17")))
    val want = docs.select(col("source"), col("doc_id"), pri.as("_p"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("_p"), col("doc_id"))))
      .filter(col("rank") <= 7)
      .select(col("source"), col("doc_id"), col("rank").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(s1 == want)
    assert(run(docs.repartition(7), 17) == s1)   // partition-invariant
    assert(run(docs, 18) != s1)                  // a new seed redraws
    // a group smaller than k survives whole, ranked 1..n
    import spark.implicits._
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("source", "doc_id")
    val t = graft.operators.Sampling.groupSample(tiny, "source", "doc_id", 5, 17)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(t.count(_._1 == "a") == 2 && t.count(_._1 == "b") == 1)
    assert(t.filter(_._1 == "a").map(_._2).sorted.toSeq == Seq(1L, 2L))
  }

  test("C20 hash split: deterministic, partition-count invariant") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val s1 = graft.operators.Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = graft.operators.Sampling.hashSplit(docs.repartition(7), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2)                       // membership survives repartitioning
    val frac = s1.values.count(_ == "train").toDouble / s1.size
    assert(frac > 0.7 && frac < 0.9)       // roughly 80%
  }

  test("C20 stratified sampling respects seed determinism") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val f = Map("en" -> 0.5, "es" -> 0.5, "de" -> 0.5, "fr" -> 0.5, "zh" -> 0.5)
    val a = graft.operators.Sampling.stratified(docs, "lang", f, seed = 7).count()
    val b = graft.operators.Sampling.stratified(docs, "lang", f, seed = 7).count()
    assert(a == b && a > 0 && a < docs.count())
  }

  test("C2 lshTune matches an independent brute-force over the S-curve cost") {
    // independent reference: trapezoid rule at a different resolution
    def refCost(k: Int, t: Double, b: Int, fpW: Double, fnW: Double): Double = {
      val r = k / b
      def p(s: Double) = Dedup.lshCandidateProb(s, b, r)
      def trap(lo: Double, hi: Double)(f: Double => Double): Double = {
        val n = 40000
        val h = (hi - lo) / n
        (0 until n).map(i => (f(lo + i * h) + f(lo + (i + 1) * h)) / 2 * h).sum
      }
      fpW * trap(0, t)(p) + fnW * trap(t, 1)(s => 1 - p(s))
    }
    for ((k, t) <- Seq((128, 0.8), (64, 0.5), (32, 0.9), (120, 0.7))) {
      val (b, r) = Dedup.lshTune(k, t)
      assert(b * r == k)
      val want = (1 to k).filter(k % _ == 0)
        .minBy(bb => (refCost(k, t, bb, 1, 1), bb))
      assert(b == want, s"k=$k t=$t: got bands=$b want $want")
    }
  }

  test("C2 lshTune properties: thresholds and weights move the banding the right way") {
    // higher threshold -> more selective buckets (rows per band up)
    val rPerThreshold = Seq(0.3, 0.5, 0.7, 0.9)
      .map(t => Dedup.lshTune(128, t)._2)
    assert(rPerThreshold == rPerThreshold.sorted, rPerThreshold.toString)
    // weighting false negatives up -> more bands (catch more pairs)
    val (bBal, _) = Dedup.lshTune(128, 0.8)
    val (bFn, _) = Dedup.lshTune(128, 0.8, fpWeight = 1.0, fnWeight = 10.0)
    assert(bFn >= bBal, s"fn-heavy $bFn vs balanced $bBal")
    // the tuned S-curve's 50% point sits near the threshold
    val (b, r) = Dedup.lshTune(128, 0.8)
    val mid = math.pow(1.0 / b, 1.0 / r) // the (1/b)^(1/r) rule of thumb
    assert(math.abs(mid - 0.8) < 0.15, s"midpoint $mid far from 0.8 (b=$b r=$r)")
  }
}
