package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Norm, Text}
import graft.operators.MergeOps

/** Property-style specs using raw seeded ScalaCheck generators (the
  * scalatest bridge isn't in the offline dep set). Seeds are fixed, so
  * the samples — and therefore the suite — are deterministic. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("binary walkers never throw on adversarial bytes (AVI/MP4/JPEG/PNG/audio)") {
    import graft.multimodal.Multimodal
    import graft.multimodal.Multimodal.MediaRow
    // random bytes, random bytes behind plausible magic prefixes, and
    // truncations of each — every walker must classify or skip, never
    // fail the task (the repo's stated truncation-safety invariant)
    val raw = samples(Gen.choose(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)), 40)
    val prefixed = raw.zipWithIndex.map { case (b, i) =>
      val magic = (i % 5) match {
        case 0 => "RIFF1234AVI ".getBytes("ISO-8859-1")
        case 1 => Array[Byte](0, 0, 0, 32) ++ "ftypisom".getBytes("ISO-8859-1")
        case 2 => Array[Byte](0xFF.toByte, 0xD8.toByte)
        case 3 => Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
        case _ => "LIST".getBytes("ISO-8859-1")
      }
      magic ++ b
    }
    val all = (raw ++ prefixed).zipWithIndex
      .map { case (b, i) => MediaRow(i.toLong, b, "bin") }
    val ds = all.toDS()
    // none of these may throw — results just classify/skip
    assert(Multimodal.imageDimensions(ds).count() == all.size)
    assert(Multimodal.videoMetadata(ds).count() == all.size)
    assert(Multimodal.videoFrameStats(ds).collect().forall(_.width > 0))
    assert(Multimodal.extractFeatures(ds).count() == all.size)
    assert(Multimodal.extractAudioFeatures(ds).count() == all.size)
  }

  test("phoneDigits yields digits only, idempotently") {
    val strs = samples(Gen.listOfN(30, Gen.asciiPrintableChar).map(_.mkString), 20)
    val rows = strs.toDF("p")
      .select(Norm.phoneDigits(col("p")).as("d"))
      .select(col("d"), Norm.phoneDigits(col("d")).as("dd"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0).forall(_.isDigit))
      assert(r.getString(0) == r.getString(1))
    }
  }

  test("fingerprint is stable and within the modulus") {
    val strs = samples(Gen.alphaNumStr.map(_.take(99)), 20)
    val fp = (strs ++ strs).toDF("t")
      .select(col("t"), Text.fingerprint(col("t")).as("f")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val byText = fp.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    byText.foreach { case (_, vs) => assert(vs.length == 1) }
    fp.foreach { case (_, v) => assert(v >= 0 && v < 1000000007L) }
  }

  test("token counts: ws tokens <= bpe tokens for alphabetic text") {
    val strs = samples(Gen.listOf(Gen.alphaStr.suchThat(_.nonEmpty)).map(_.mkString(" ")), 20)
    val rows = strs.toDF("t")
      .select(Text.tokenCount(col("t")), Text.bpeTokenCount(col("t"))).collect()
    rows.foreach(r => assert(r.getLong(0) <= r.getLong(1)))
  }

  test("mergeMax is symmetric in its inputs") {
    val rowGen = Gen.listOfN(12, Gen.zip(Gen.choose(1, 4), Gen.choose(0.0, 100.0), Gen.oneOf(true, false)))
    samples(rowGen, 5).zip(samples(rowGen, 5).reverse).foreach { case (l1, l2) =>
      val a = l1.toDF("k", "v", "f")
      val b = l2.toDF("k", "v", "f")
      val ab = MergeOps.mergeMax(a, b, Seq("k"), Seq("v"), Seq("f"))
        .collect().map(_.toString).sorted
      val ba = MergeOps.mergeMax(b, a, Seq("k"), Seq("v"), Seq("f"))
        .collect().map(_.toString).sorted
      assert(ab.sameElements(ba))
    }
  }

  test("zh numeral round-trip for all 1..99 (exhaustive)") {
    val digits = Seq("", "一", "二", "三", "四", "五", "六", "七", "八", "九")
    def zh(n: Int): String = {
      val t = n / 10; val o = n % 10
      (if (t == 0) "" else if (t == 1) "十" else digits(t) + "十") +
        (if (o == 0) "" else digits(o))
    }
    val df = (1 to 99).map(n => (n, zh(n) + "巷")).toDF("n", "s")
    val bad = df.select(col("n"),
        Norm.zhStreetNumeralToArabic(col("s")).as("conv"))
      .filter(col("conv") =!= concat(col("n").cast("string"), lit("巷")))
      .count()
    assert(bad == 0L)
  }

  test("clampQuery: identity iff encoded form fits, else a 120-char prefix") {
    val gen = Gen.oneOf(
      Gen.listOfN(40, Gen.oneOf('龍', '路', '5', 'a')).map(_.mkString),
      Gen.listOfN(200, Gen.oneOf('龍', '街', '7', 'z')).map(_.mkString))
    val strs = samples(gen, 30)
    def encLen(s: String): Int = s.map { c =>
      if (c.isLetterOrDigit && c < 128) 1 else c.toString.getBytes("UTF-8").length * 3
    }.sum
    val out = strs.toDF("s").select(col("s"), Norm.clampQuery(col("s")).as("c")).collect()
    out.foreach { r =>
      val (s, c) = (r.getString(0), r.getString(1))
      if (encLen(s) <= 512) assert(c == s, s"should pass through: $s")
      else assert(c == s.take(120), s"should truncate to 120 chars")
    }
  }

  test("graft_urilen equals the regex-strip formulation on arbitrary strings") {
    val gen = Gen.listOfN(60, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', ';', '%', '/', '?', '#', '&', '=',
        '_', '.', '!', '~', '*', '\'', '(', ')', '-'),
      Gen.oneOf('龍', '臺', '段', '號', 'é', 'ß'))).map(_.mkString)
    val strs = samples(gen, 50) :+ "" :+ "abc" :+ ("龍" * 200)
    val out = strs.toDF("s").select(
      call_function("graft_urilen", col("s")).as("fast"),
      (length(regexp_replace(col("s"), lit("[^A-Za-z0-9_.!~*'()-]"), lit(""))) +
        (octet_length(col("s")) -
          length(regexp_replace(col("s"), lit("[^A-Za-z0-9_.!~*'()-]"), lit("")))) * 3)
        .as("regex")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("native word shingler equals the HOF formulation on random unicode") {
    val gen = Gen.listOfN(30, Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const(' '), // bias toward spaces
      Gen.oneOf('\t', '\n', '龍', '臺', 'é', '段'))).map(_.mkString)
    val strs = samples(gen, 80) ++ Seq("", " ", "  ", "a", "a b", "\t\n", " a  b ")
    for (n <- Seq(1, 2, 3)) {
      val out = strs.toDF("s").select(
        Text.shingles(col("s"), n).as("fast"),
        Text.shinglesHof(col("s"), n).as("hof")).collect()
      out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"n=$n: ${r.getSeq[String](0)} != ${r.getSeq[String](1)}"))
    }
  }

  test("native street-ordinal conversion: per-token values, grammar edges, no-op null") {
    import graft.expressions.ZhStreetArabic
    import org.apache.spark.unsafe.types.UTF8String
    def conv(s: String): String = {
      val r = ZhStreetArabic.compute(UTF8String.fromString(s))
      if (r == null) null else r.toString
    }
    assert(conv("光復路二十巷五弄3號") == "光復路20巷5弄3號") // each token its OWN value
    assert(conv("光復路五巷十五弄3號") == "光復路5巷15弄3號") // the 五 of 十五 never matches alone
    assert(conv("九十九街") == "99街")
    assert(conv("十巷") == "10巷")
    assert(conv("零巷") == "0巷")           // reference zhDigit: 零 -> 0
    assert(conv("兩巷") == "2巷")           // 兩 valid as digit/tens
    assert(conv("十兩巷") == null)          // ones place excludes 兩 -> grammar reject, no-op
    assert(conv("三三巷") == null)          // invalid grammar stays verbatim
    assert(conv("一二三四巷") == null)      // {1,3} run 二三四 is grammar-invalid -> no-op
    assert(conv("光復路12巷") == null)      // nothing to convert -> null (ladder short-circuit)
  }

  test("native sectionArabic equals the chained-regex formulation on arbitrary strings") {
    val gen = Gen.listOfN(12, Gen.oneOf(
      Gen.oneOf('一', '二', '三', '四', '五', '六', '七', '八', '九', '十'),
      Gen.const('段'), Gen.oneOf('路', '巷', '號', '1', '2', 'a'))).map(_.mkString)
    val strs = samples(gen, 60) ++ Seq("", "段", "段三段", "一段一段", "十一段", "一段段", "和平東路二段33號")
    val out = strs.toDF("s").select(
      Norm.sectionArabic(col("s")).as("fast"),
      Norm.sectionArabicChained(col("s")).as("chained")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"native '${r.getString(0)}' != chained '${r.getString(1)}'"))
  }

  test("sectionArabic is idempotent and only touches 段 tokens") {
    val zhs = Seq("一", "二", "三", "四", "五", "六", "七", "八", "九", "十")
    val strs = (1 to 10).map(i => s"和平東路${zhs(i - 1)}段5巷") ++
      Seq("中山北路2段", "光復路", "三重路33號")
    val out = strs.toDF("s")
      .select(col("s"), Norm.sectionArabic(col("s")).as("a"))
      .select(col("s"), col("a"), Norm.sectionArabic(col("a")).as("aa")).collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2), "idempotence")
      assert(!r.getString(1).matches(".*[一二三四五六七八九十]段.*"), "no zh 段 left")
      if (!r.getString(0).contains("段")) assert(r.getString(0) == r.getString(1))
    }
  }

  test("kmv sketch == distinct-sort-take-k on random multisets, any k, any partitioning") {
    val cases = samples(for {
      n <- Gen.choose(0, 400)
      k <- Gen.choose(1, 64)
      parts <- Gen.choose(1, 7)
      vals <- Gen.listOfN(n, Gen.choose(-50L, 50L)) // dense range → many dups
    } yield (vals, k, parts), 12)
    cases.foreach { case (vals, k, parts) =>
      val df = if (vals.isEmpty) spark.range(0).select(col("id").as("h"))
               else vals.toDF("h").repartition(parts)
      val got = df.agg(call_function("graft_kmv", col("h"), lit(k)))
        .as[Seq[Long]].head()
      val want = vals.distinct.sorted.take(k)
      assert(got == want, s"k=$k parts=$parts n=${vals.size}: $got vs $want")
    }
  }

  test("rankMetrics: metrics bounded in [0,1], every run query emitted once") {
    // adversarial runs: duplicate (query, doc) pairs, ranks beyond k,
    // unjudged queries, duplicate judgments
    val rnd = new scala.util.Random(211L)
    (0 until 3).foreach { round =>
      val run = Seq.fill(60)((rnd.nextInt(6).toLong,
        rnd.nextInt(12).toLong, (rnd.nextInt(9) + 1).toLong))
      val qr = Seq.fill(40)((rnd.nextInt(6).toLong,
        rnd.nextInt(12).toLong, rnd.nextInt(4).toLong))
      val got = graft.operators.RankEval.rankMetrics(
          run.toDF("query_id", "doc_id", "rank"),
          qr.toDF("query_id", "doc_id", "rel"), k = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      val queries = run.map(_._1).distinct.sorted
      assert(got.map(_._1).sorted.toSeq === queries, s"round $round")
      got.foreach { case (q, recall, mrr, ndcg) =>
        Seq(recall, mrr, ndcg).foreach(m =>
          assert(m >= 0.0 && m <= 1.0, s"round $round query $q: $m"))
      }
    }
  }

  test("PSI terms are non-negative and finite on arbitrary histograms") {
    val rnd = new scala.util.Random(212L)
    (0 until 3).foreach { round =>
      val v1 = Seq.fill(rnd.nextInt(80) + 1)(rnd.nextDouble() * 2 - 0.5)
      val v2 = Seq.fill(rnd.nextInt(80) + 1)(rnd.nextDouble() * 2 - 0.5)
      val rows = graft.operators.Curation.distributionDrift(
          v1.toDF("v"), v2.toDF("v"), "v", Seq(0.0, 0.5, 1.0))
        .collect().map(_.getDouble(3))
      rows.foreach(p => assert(p >= 0.0 && !p.isNaN && !p.isInfinite,
        s"round $round: $p"))
    }
  }

  test("mixture weights: a proper distribution, monotone in loss, stable at extremes") {
    // losses spanning hundreds exercise the softmax max-stabilization
    val rnd = new scala.util.Random(213L)
    val rows = (0 until 25).map(i => (f"d$i%02d", rnd.nextDouble() * 300, 10.0))
    val got = graft.operators.Sampling.mixtureReweight(
        rows.toDF("source", "proxy_loss", "ref_loss"),
        "source", "proxy_loss", "ref_loss", eta = 50.0, smoothing = 0.1)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(got.map(_._3).sum - 1.0) < got.length * 5e-7)
    got.foreach { case (_, _, w) => assert(w > 0.0 && w <= 1.0) }
    val byExcess = got.sortBy(_._2)
    byExcess.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3, s"${a._1} vs ${b._1}")
      case _ => ()
    }
  }

  test("contamination spans are disjoint, in-bounds, at least k tokens wide") {
    val rnd = new scala.util.Random(214L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bench = (900L until 903L).map(i => (i, doc(12))).toDF("doc_id", "text")
    val train = (0L until 30L).map(i => (i, doc(rnd.nextInt(25) + 1)))
    val k = 3
    val spans = graft.operators.Dedup.contaminationSpans(
        train.toDF("doc_id", "text"), "doc_id", "text", bench, "text", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lens = train.toMap.view.mapValues(_.split(" ").length).toMap
    spans.foreach { case (id, s, e) =>
      assert(s >= 0 && e < lens(id) && e - s + 1 >= k, s"doc $id [$s,$e]")
    }
    spans.groupBy(_._1).foreach { case (id, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._3 + 1 < b._2, s"doc $id: touching islands")
        case _ => ()
      }
    }
  }

  test("round2 is exact half-up to 2 decimals for positive doubles") {
    import graft.functions.Agg
    val vals = Seq(52724.244999999995, 52724.245000000004, 1.005, 0.0, 2.675, 99.994999)
    val out = vals.toDF("v").select(Agg.round2(col("v"))).collect().map(_.getDouble(0))
    vals.zip(out).foreach { case (v, r) =>
      val expect = math.floor(v * 100 + 0.5) / 100
      assert(r == expect, s"$v -> $r, want $expect")
    }
  }
}
