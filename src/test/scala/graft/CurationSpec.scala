package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** Specs for the curation operators (C40–C42): each checked against an
  * independent plain-Scala reference, not against their own algebra.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- shared reference hashing (the md5-hex-prefix discipline) ------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md560(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
  private def md540(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(10), 16)

  private def round6(d: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)

  // ---- winnowing -----------------------------------------------------

  /** textbook winnowing (Schleimer et al. §4): every window of w gram
    * hashes selects its rightmost minimum. */
  private def refWinnow(tokens: IndexedSeq[String], k: Int, w: Int): Set[(Long, Long)] = {
    if (tokens.size < k) return Set.empty
    val hs = tokens.sliding(k).map(g => md540(g.mkString(" "))).toIndexedSeq
    (math.max(w - 1, 0) until hs.size).map { e =>
      val win = (e - w + 1) to e
      val minH = win.map(hs).min
      (win.filter(i => hs(i) == minH).max.toLong, minH)
    }.toSet
  }

  test("winnowing matches the textbook reference on randomized docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (1L to 30L).map { id =>
      val n = 1 + rnd.nextInt(40)
      (id, IndexedSeq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
    val got = Curation.winnowFingerprints(df, "doc_id", "text", k = 4, w = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet }
    docs.foreach { case (id, ts) =>
      val want = refWinnow(ts, 4, 5)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    val shared = "q w e r t y u i" // 8 tokens = w + k - 1 for k=4, w=5
    val a = s"a1 a2 a3 a4 a5 $shared a6 a7"
    val b = s"b1 $shared b2 b3 b4 b5 b6 b7 b8"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = Curation.winnowFingerprints(df, "doc_id", "text", k = 4, w = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(2)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  test("winnowing emits nothing below one full window and nothing for short docs") {
    val df = Seq(
      (1L, "a b c"),           // < k tokens: no grams
      (2L, "a b c d"),         // 1 gram < w: no full window
      (3L, "a b c d e f g h") // 5 grams = exactly one full window
    ).toDF("doc_id", "text")
    val got = Curation.winnowFingerprints(df, "doc_id", "text", k = 4, w = 5).collect()
    assert(!got.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L))
    assert(got.count(_.getLong(0) == 3L) == 1)
  }

  // ---- DSIR ----------------------------------------------------------

  test("dsirScore matches a BigDecimal reference incl. quantile selection") {
    val docs = Seq(
      (1L, "apple banana apple cherry", true),
      (2L, "apple cherry banana", true),
      (3L, "dog dog banana cat", false),
      (4L, "dog cat mouse", false),
      (5L, "apple dog", false),
      (6L, "", false) // tokenless: drops from the output
    )
    val B = 8
    // reference: bucket tf per doc, target/raw counts, smoothed log
    // ratios rounded into decimal, exact decimal sums
    val tf = docs.flatMap { case (id, text, t) =>
      text.split(" ").filter(_.nonEmpty)
        .map(tok => ((id, t, md560(tok) % B), 1L))
    }.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val ct = tf.groupBy(_._1._3).map { case (b, m) =>
      b -> m.collect { case ((_, t, _), n) if t => n }.sum
    }
    val cr = tf.groupBy(_._1._3).map { case (b, m) => b -> m.values.sum }
    val tt = ct.values.sum.toDouble
    val tr = cr.values.sum.toDouble
    val lam = cr.keys.map { b =>
      val pt = (ct.getOrElse(b, 0L) + 0.5) / (tt + 0.5 * B)
      val pr = (cr(b) + 0.5) / (tr + 0.5 * B)
      b -> round6(math.log(pt / pr))
    }.toMap
    val want = tf.groupBy(_._1._1).map { case (id, m) =>
      val score = m.map { case ((_, _, b), n) =>
        lam(b).multiply(java.math.BigDecimal.valueOf(n))
      }.reduce(_ add _)
      id -> (m.values.sum, score.doubleValue)
    }
    // threshold: lo + (hi - lo) * frac at q = 0.5 over the 5 scores
    val sorted = want.values.map(_._2).toSeq.sorted
    val pos = (sorted.size - 1) * 0.5
    val li = math.floor(pos).toInt
    val thr = sorted(li) + (sorted(math.min(li + 1, sorted.size - 1)) - sorted(li)) * (pos - li)

    val df = docs.map { case (id, text, t) => (id, text, t) }.toDF("doc_id", "text", "t")
    val got = Curation.dsirScore(df, "doc_id", "text", col("t"), buckets = B, selectQ = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.keySet == want.keySet) // doc 6 absent
    want.foreach { case (id, (n, score)) =>
      val (gn, gs, sel) = got(id)
      assert(gn == n, s"doc $id n_tokens")
      assert(gs == score, s"doc $id score: got $gs want $score")
      assert(sel == (score >= thr), s"doc $id selected")
    }
    assert(got.values.count(_._3) == 3) // p50 over 5 docs keeps the top 3
  }

  test("dsirScore tilts toward the target: target-heavy tokens score higher") {
    // two disjoint vocabularies; target docs use only vocab T
    val docs = (1L to 10L).map { id =>
      val t = id <= 5
      val toks = if (t) Seq("t1", "t2", "t3") else Seq("r1", "r2", "r3")
      (id, toks.mkString(" "), t)
    }
    val got = Curation.dsirScore(docs.toDF("doc_id", "text", "t"),
        "doc_id", "text", col("t"), buckets = 64, selectQ = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val tScores = (1L to 5L).map(got)
    val rScores = (6L to 10L).map(got)
    assert(tScores.min > rScores.max)
  }

  // ---- kNN graph -----------------------------------------------------

  test("knnGraph at full probe matches exact brute-force mutual-kNN") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 20L).map { id =>
      (id, IndexedSeq.fill(4)(rnd.nextGaussian().toFloat))
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      ad.zip(bd).map { case (x, y) => x * y }.sum /
        (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val k = 3
    val topk = rows.map { case (id, v) =>
      id -> rows.filter(_._1 != id)
        .map { case (j, u) => (j, cos(v, u)) }
        .sortBy { case (j, s) => (-s, j) }.take(k).map(_._1).toSet
    }.toMap
    val wantEdges = (for {
      (a, na) <- topk.toSeq; b <- na
      if a < b && topk(b).contains(a)
    } yield (a, b)).toSet
    // probeBits = nPlanes probes every bucket -> candidate set is the
    // whole corpus, so the LSH graph must equal the exact one
    val knn = graft.operators.Similarity.knnGraph(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      k = k, nPlanes = 4, dim = 4, probeBits = 4)
    val self = knn.filter(col("query_id") === col("cand_id")).count()
    assert(self == 0L)
    val got = graft.operators.Similarity.mutualKnnEdges(knn)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == wantEdges)
    // the probe-budget guard must fire on arithmetic BEFORE the
    // Hamming ball enumerates (C(63, <=8) ~ 6.6e9 masks would hang)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.knnGraph(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1, nPlanes = 63, dim = 4, probeBits = 8)
    }
    assert(e.getMessage.contains("probe set exceeds"))
  }

  // ---- content-defined chunking --------------------------------------

  /** textbook CDC over tokens: boundary where md5-60(tok) % d == 0. */
  private def refCdc(tokens: IndexedSeq[String], d: Int): IndexedSeq[(Long, Long, String)] = {
    if (tokens.isEmpty) return IndexedSeq.empty
    val bounds = tokens.indices.filter(p => md560(tokens(p)) % d == 0)
    val starts = 0 +: bounds.map(_ + 1)
    val ends = bounds.map(_ + 1) :+ tokens.size
    starts.zip(ends).filter { case (s, e) => e > s }.map { case (s, e) =>
      (s.toLong, (e - s).toLong, tokens.slice(s, e).mkString(" "))
    }.toIndexedSeq
  }

  test("cdcChunks matches the textbook reference on randomized docs") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("p", "q", "r", "s", "t", "u", "v", "w", "x", "y")
    val docs = (1L to 30L).map { id =>
      (id, IndexedSeq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    }
    val got = graft.operators.Dedup.cdcChunks(
        docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text"),
        "doc_id", "text", divisor = 4, tokenHash = graft.functions.Vec.md5Hash60)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1))
          .map(r => (r.getLong(2), r.getLong(3), r.getString(4))).toIndexedSeq
      }
    docs.foreach { case (id, ts) =>
      assert(got.getOrElse(id, IndexedSeq.empty) == refCdc(ts, 4), s"doc $id")
    }
  }

  test("CDC chunks survive a front insertion; fixed chunks do not") {
    val rnd = new scala.util.Random(21)
    val vocab = Vector("p", "q", "r", "s", "t", "u", "v", "w", "x", "y")
    val base = IndexedSeq.fill(60)(vocab(rnd.nextInt(vocab.size)))
    assert(base.indices.exists(p => md560(base(p)) % 4 == 0)) // has a boundary
    val shifted = "zzz" +: base
    val df = Seq((1L, base.mkString(" ")), (2L, shifted.mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = graft.operators.Dedup.cdcChunks(df, "doc_id", "text",
        divisor = 4, tokenHash = graft.functions.Vec.md5Hash60)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getString(4)).toSet }
    val shared = chunks(1L) intersect chunks(2L)
    // everything after doc 1's first boundary re-aligns in doc 2
    assert(shared.nonEmpty, s"no shared CDC chunks")
    // the fixed-window counterpart finds NO shared chunk under the
    // same shift (every window moved one token)
    val fixedShared = Seq(base, shifted).map(ts =>
      ts.grouped(4).map(_.mkString(" ")).toSet).reduce(_ intersect _)
    assert(fixedShared.isEmpty)
  }

  // ---- int8 quantization ---------------------------------------------

  test("quantizeInt8: bounded error, high-fidelity round trip, zero-vector edge") {
    val rnd = new scala.util.Random(9)
    val rows = (1L to 30L).map { id =>
      (id, IndexedSeq.fill(16)((rnd.nextGaussian() * (1 + id % 5)).toFloat))
    } :+ ((31L, IndexedSeq.fill(16)(0.0f)))
    val out = graft.operators.Similarity.quantizeInt8(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getString(2), r.getDouble(3))).toMap
    rows.foreach { case (id, v) =>
      val (scale, codesStr, err) = out(id)
      val codes = codesStr.split(",").map(_.toLong)
      assert(codes.length == 16 && codes.forall(c => c >= -127 && c <= 127))
      if (v.forall(_ == 0.0f)) {
        assert(scale == 0.0 && err == 0.0 && codes.forall(_ == 0L))
      } else {
        // reported error is real and within the half-step bound
        val recon = codes.map(_ * scale)
        val trueErr = v.map(_.toDouble).zip(recon).map { case (a, b) => math.abs(a - b) }.max
        assert(math.abs(trueErr - err) < 1e-8)
        assert(err <= scale / 2 + 1e-6, s"vec $id err $err vs scale $scale")
        // fidelity: the decoded vector stays nearly parallel
        val vd = v.map(_.toDouble)
        val cos = vd.zip(recon).map { case (a, b) => a * b }.sum /
          (math.sqrt(vd.map(x => x * x).sum) * math.sqrt(recon.map(x => x * x).sum))
        assert(cos > 0.999, s"vec $id cosine $cos")
      }
    }
  }

  test("quantizeInt8: sub-1e-7 vector reports a truthful error bound (r8 ADVICE)") {
    // max|v| < 127 * 5e-10 rounds scale to 0.0: codes collapse to 0
    // (nothing else is representable at 9-place scale), but the error
    // must report amax — the real worst-case reconstruction error of
    // an all-zero code — not 0.0
    val tiny = Seq((1L, IndexedSeq(3.0e-8f, -5.0e-8f, 0.0f))).toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.quantizeInt8(tiny, "vec_id", "embedding")
      .collect().head
    assert(r.getDouble(1) == 0.0, "scale")
    assert(r.getString(2) == "0,0,0", "codes")
    val err = r.getDouble(3)
    assert(math.abs(err - 5.0e-8) < 1e-12, s"err $err should be amax, not 0")
  }

  // ---- SemDeDup ------------------------------------------------------

  test("semanticDedup keeps the least-central member of a near-dup pair") {
    val emb = Seq(
      // cluster 0: (1,2) near-dup — 2 is nearer the centroid, so 2 drops
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.999f, 0.03f), 0),
      (3L, Seq(0.0f, 1.0f), 0), // distinct: kept
      // cluster 1: (5,6) identical — tie breaks to the LOWER id kept
      (4L, Seq(1.0f, 0.0f), 1), // near-dup of 1 but ANOTHER cluster: kept
      (5L, Seq(0.0f, 1.0f), 1),
      (6L, Seq(0.0f, 1.0f), 1),
      // singleton cluster: trivially kept
      (7L, Seq(0.5f, 0.5f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding", "label", 0.25)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val want = Map(1L -> true, 2L -> false, 3L -> true, 4L -> true,
      5L -> true, 6L -> false, 7L -> true)
    assert(got == want)
  }

  test("semanticDedupBucketed matches semanticDedup row-for-row (no-persist 100TB form)") {
    val rnd = new scala.util.Random(11)
    val emb = (1L to 40L).map { id =>
      (id, IndexedSeq.fill(4)(rnd.nextGaussian().toFloat), (id % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    val dir = graft.util.Fixtures.dir("semdedup_eq").toString
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3))
    val cached = Similarity.semanticDedup(emb, "vec_id", "embedding", "label", 0.6)
      .collect().map(key).toSet
    graft.util.CacheRegistry.releaseAll()
    val landed = Similarity.semanticDedupBucketed(
        emb, "vec_id", "embedding", "label", 0.6, dir)
      .collect().map(key).toSet
    assert(cached == landed)
  }

  test("semanticDedupBucketed preserves STRING label values and type through the layout") {
    // "007" and "07" both parse as int 7 under partition-column type
    // inference — the bucketed roundtrip must keep them distinct
    // clusters with their exact string values (review finding)
    val emb = Seq(
      (1L, IndexedSeq(1.0f, 0.0f), "007"),
      (2L, IndexedSeq(1.0f, 0.01f), "007"),
      (3L, IndexedSeq(1.0f, 0.0f), "07"),
      (4L, IndexedSeq(1.0f, 0.01f), "07")
    ).toDF("vec_id", "embedding", "label")
    val dir = graft.util.Fixtures.dir("semdedup_strlbl").toString
    val out = Similarity.semanticDedupBucketed(
      emb, "vec_id", "embedding", "label", 0.6, dir)
    assert(out.schema("label").dataType ==
      org.apache.spark.sql.types.StringType, out.schema)
    val rows = out.collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(3))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    assert(rows(1L)._1 == "007" && rows(3L)._1 == "07", rows)
    // within each string cluster the near-dup drops; had the labels
    // merged into one int-7 cluster the drop pattern would differ
    assert(Seq(1L, 2L, 3L, 4L).count(id => !rows(id)._2) == 2, rows)
    graft.util.CacheRegistry.releaseAll()
  }

  test("semanticDedup drop decisions agree with a brute-force reference") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 60L).map { id =>
      (id, IndexedSeq.fill(4)(rnd.nextGaussian().toFloat), (id % 3).toInt)
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // reference centroids: plain per-label per-dim double means (the
    // operator's decimal path agrees to far beyond the 6-place round)
    val cents = rows.groupBy(_._3).map { case (l, rs) =>
      l -> (0 until 4).map(d => rs.map(_._2(d).toDouble).sum / rs.size)
    }
    def r6(d: Double) = round6(d).doubleValue
    val centSim = rows.map { case (id, v, l) =>
      id -> r6(cos(v.map(_.toDouble), cents(l)))
    }.toMap
    val tau = 0.6
    val want = rows.map { case (id, v, l) =>
      val beaten = rows.exists { case (jid, jv, jl) =>
        jl == l && jid != id && r6(cos(v.map(_.toDouble), jv.map(_.toDouble))) >= tau &&
          (centSim(jid) < centSim(id) || (centSim(jid) == centSim(id) && jid < id))
      }
      id -> !beaten
    }.toMap
    val got = Similarity.semanticDedup(
        rows.toDF("vec_id", "embedding", "label"), "vec_id", "embedding", "label", tau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == want)
  }

  test("C71 corpusDiff resolves all four states against a set reference") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "text")
    val v2 = Seq((2L, "b"), (3L, "c-edited"), (4L, "d"), (5L, "e")).toDF("id", "text")
    val got = Curation.corpusDiff(v1, v2, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
    val sums = Curation.corpusDiffSummary(v1, v2, "id", "text")
      .as[(String, Long)].collect().toMap
    assert(sums == Map("removed" -> 1L, "unchanged" -> 2L, "changed" -> 1L,
      "added" -> 1L))
  }

  test("C71 demo row: statuses recompute from the two synthesized versions") {
    import spark.implicits._
    val docs = sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val v1 = docs.filter { case (id, _) => id % 7 != 0 }
    val v2 = docs.filter { case (id, _) => id % 5 != 0 }
      .map { case (id, t) => id -> (if (id % 11 == 0) t + " v2-edit" else t) }
    val want = (v1.keySet ++ v2.keySet).map { id =>
      id -> ((v1.get(id), v2.get(id)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      })
    }.toMap
    val rows = operators.TextDemos.corpusDiff(spark, sfDir)
      .as[(Long, String)].collect()
    val (totals, perDoc) = rows.partition(_._1 == -1L)
    assert(perDoc.toMap == want)
    val wantTotals = want.values.groupBy(identity).map { case (s, xs) =>
      s"total:$s=${xs.size}"
    }.toSet
    assert(totals.map(_._2).toSet == wantTotals)
  }
}
