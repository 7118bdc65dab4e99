package graft

import graft.operators.Bpe

/** C35 BPE trainer: the relational merge loop must reproduce the
  * classic sequential algorithm exactly — including greedy
  * left-to-right application and the (count desc, pair asc)
  * tie-break — on hand-built and randomized corpora. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** reference implementation: textbook BPE on a word-frequency map. */
  private def classicBpe(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var syms: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } { case (_, f) => f }(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, c))
        syms = syms.groupMapReduce { case (s, _) =>
          val r = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { r += a + b; i += 2 }
            else { r += s(i); i += 1 }
          }
          r.result()
        } { case (_, f) => f }(_ + _)
      }
    }
    out.toSeq
  }

  private def trainOn(corpus: Seq[String], n: Int): Seq[(String, String, Long)] =
    Bpe.train(corpus.toDF("text"), "text", n)
      .map(m => (m.left, m.right, m.n_occurrences))

  test("C35: overlapping-run greedy (aaa / aaaa) and tie-breaks match classic BPE") {
    // 'aaaa' exercises run-greedy ((aa)(aa), not a,(aa),a); ties abound
    val corpus = Seq("aaaa aaa ab", "ab ab ba", "aaaa")
    val freq = corpus.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    assert(trainOn(corpus, 4) == classicBpe(freq, 4))
  }

  test("C35: randomized corpora match classic BPE over many merge rounds") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = "abcd"
    (1 to 3).foreach { trial =>
      val words = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.length))).mkString)
      val docs = Seq.fill(20)(Seq.fill(5)(words(rnd.nextInt(words.size))).mkString(" "))
      val freq = docs.flatMap(_.split(" ")).groupBy(identity)
        .map { case (w, ws) => w -> ws.length.toLong }
      val got = trainOn(docs, 8)
      val want = classicBpe(freq, 8)
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  /** reference tokenizer: apply the classic merge list to one word,
    * rule by rule, greedy left-to-right. */
  private def classicSegment(word: String, merges: Seq[(String, String, Long)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (s, (a, b, _)) =>
      val r = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { r += a + b; i += 2 }
        else { r += s(i); i += 1 }
      }
      r.result()
    }

  test("C36: encode matches per-word classic segmentation, keeps word order, counts tokens") {
    val rnd = new scala.util.Random(42L)
    val words = Seq.fill(20)(
      Seq.fill(1 + rnd.nextInt(6))("abc"(rnd.nextInt(3))).mkString)
    val docs = Seq.tabulate(15)(i =>
      (i.toLong, Seq.fill(4)(words(rnd.nextInt(words.size))).mkString(" "))) :+
      (99L, "") // wordless doc must survive with an empty stream
    val df = docs.toDF("doc_id", "text")
    val freq = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val merges = classicBpe(freq, 6)
    val got = Bpe.encode(df, "doc_id", "text", nMerges = 6)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = docs.sortBy(_._1).map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty).toVector
        .flatMap(w => classicSegment(w, merges))
      (id, toks.length.toLong, toks.mkString(Bpe.Sep))
    }
    assert(got.toSeq == want)
  }

  test("C35: training stops early when every word is a single symbol") {
    val merges = trainOn(Seq("ab ab cd"), 10)
    // ab, cd merge in some order; after both, no pairs remain
    assert(merges.length == 2, merges)
    assert(merges.map(m => m._1 + m._2).toSet == Set("ab", "cd"))
  }

  test("C35: driver-local and distributed merge loops are bit-identical") {
    val rnd = new scala.util.Random(7L)
    val words = Seq.fill(25)(
      Seq.fill(1 + rnd.nextInt(7))("abcde"(rnd.nextInt(5))).mkString) :+
      "héllo世界" // non-ASCII: UTF-8-byte tie-break must agree
    val docs = Seq.fill(30)(Seq.fill(4)(words(rnd.nextInt(words.size))).mkString(" "))
      .toDF("text")
    val (localMerges, localVocab) = Bpe.trainWithVocab(docs, "text", 8)
    spark.conf.set(Bpe.LocalVocabThresholdKey, "0") // force distributed
    try {
      val (distMerges, distVocab) = Bpe.trainWithVocab(docs, "text", 8)
      assert(localMerges == distMerges)
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1), r.getSeq[String](2))
      assert(localVocab.collect().map(key).sortBy(_._1).toSeq ==
        distVocab.collect().map(key).sortBy(_._1).toSeq)
    } finally spark.conf.unset(Bpe.LocalVocabThresholdKey)
  }

  test("C35: a vocabulary over the threshold falls back to the distributed loop") {
    // threshold 2 with 3 distinct words: the limit(3) probe sees 3 rows
    // and the local path must decline (results still correct)
    spark.conf.set(Bpe.LocalVocabThresholdKey, "2")
    try {
      val merges = trainOn(Seq("ab ab cd ef"), 10)
      assert(merges.map(m => m._1 + m._2).toSet == Set("ab", "cd", "ef"))
    } finally spark.conf.unset(Bpe.LocalVocabThresholdKey)
  }
}
