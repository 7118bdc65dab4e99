package graft

import graft.operators.SetSim

/** Specs for the prefix-filtered exact set-similarity join (C84),
  * checked against a plain-Scala all-pairs reference — the property
  * that matters is COMPLETENESS: the prefix/length/positional prunes
  * must never drop a qualifying pair.
  */
class SetSimSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md560(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  /** distinct hashed trigram-shingle set, mirroring the operator's input */
  private def refSet(text: String, n: Int = 3): Set[Long] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(g => md560(g.mkString(" "))).toSet
  }

  /** all-pairs exact Jaccard at threshold t — no pruning at all */
  private def refJoin(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), (Long, Long, Double)] = {
    val sets = docs.map { case (id, txt) => id -> refSet(txt) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      ov = (sa & sb).size.toLong
      un = sa.size + sb.size - ov
      jac = java.math.BigDecimal.valueOf(ov.toDouble / un)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      if jac >= t
    } yield (ia, ib) -> (ov, un, jac)).toMap
  }

  private def runOp(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), (Long, Long, Double)] =
    SetSim.prefixJaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", threshold = t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap

  test("closed form: planted near-dup found, sub-threshold pair dropped, short docs ignored") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      1L -> base,                                   // 8 trigrams
      2L -> (base + " lambda"),                     // 9 trigrams, 8 shared -> J = 8/9
      3L -> "alpha beta gamma nine ten eleven twelve thirteen", // small overlap
      4L -> "two words")                            // no trigram: excluded
    val got = runOp(docs, 0.5)
    assert(got.keySet == Set((1L, 2L)))
    val (ov, un, jac) = got((1L, 2L))
    assert(ov == 8L && un == 9L)
    assert(jac == java.math.BigDecimal.valueOf(8.0 / 9.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
  }

  test("completeness + exactness vs all-pairs reference on randomized docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    // near-dup-rich corpus: half the docs are mutations of a shared base
    val bases = Vector.fill(5)(IndexedSeq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
    val docs: Seq[(Long, String)] = (1L to 60L).map { id =>
      val toks =
        if (id % 2 == 0) {
          val b = bases(rnd.nextInt(bases.size))
          // mutate one token (or append) to create high-but-not-1 Jaccard
          val i = rnd.nextInt(b.size)
          b.updated(i, vocab(rnd.nextInt(vocab.size))) :+ vocab(rnd.nextInt(vocab.size))
        } else IndexedSeq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      (id, toks.mkString(" "))
    }
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val want = refJoin(docs, t)
      val got = runOp(docs, t)
      assert(got == want, s"threshold $t: got ${got.size} pairs, want ${want.size}")
      assert(want.nonEmpty, s"threshold $t: degenerate fixture, no qualifying pairs")
    }
  }

  test("property: 1200 random corpora with exact-threshold ties, t in {0.5, 0.7, 0.9}") {
    // The adversarial battery for the PPJoin prune algebra (the r12
    // advice's off-by-one trap): per threshold, 400 independently
    // random small corpora, each given a DISJOINT token space — so one
    // Spark run evaluates all 400 exactly as 400 separate runs would
    // (cross-corpus pairs share no shingle, are never candidates, and
    // within a corpus the global (df, hash) rarity order restricted to
    // its own tokens IS its standalone order). A third of the corpora
    // plant a pair at Jaccard EXACTLY t (shared prefix of p tokens +
    // disjoint suffixes of a/b tokens gives J = (p−2)/(p+a+b−2); p
    // solved per t), the boundary where a 1-off overlap requirement
    // or an fp-inflated ceil silently drops a qualifying pair.
    val tiePlant: Map[Double, (Int, Int, Int)] = Map(
      0.5 -> ((6, 2, 2)),   // J = 4/8
      0.7 -> ((9, 1, 2)),   // J = 7/10
      0.9 -> ((11, 1, 0)))  // J = 9/10 (one side IS the shared prefix)
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val rnd = new scala.util.Random((t * 1000).toInt)
      val (p, a, b) = tiePlant(t)
      var planted = 0
      val docs: Seq[(Long, String)] = (0 until 400).flatMap { ci =>
        def w(j: Int) = s"c${ci}_w$j"
        val base = ci * 1000L
        if (ci % 3 == 0) {
          // exact-tie pair: ids base+1, base+2 at J == t precisely
          planted += 1
          val prefix = (0 until p).map(w)
          val da = prefix ++ (100 until 100 + a).map(w)
          val db = prefix ++ (200 until 200 + b).map(w)
          Seq(base + 1 -> da.mkString(" "), base + 2 -> db.mkString(" "))
        } else {
          // random corpus: mutated copies of a base + noise docs, over
          // a small corpus-local vocab so overlaps land NEAR t often
          val vocabN = 5 + rnd.nextInt(4)
          def tok() = w(rnd.nextInt(vocabN))
          val root = IndexedSeq.fill(8 + rnd.nextInt(10))(tok())
          (0 until 3 + rnd.nextInt(4)).map { j =>
            val toks = if (j % 2 == 0)
              root.updated(rnd.nextInt(root.size), tok()) ++
                IndexedSeq.fill(rnd.nextInt(3))(tok())
            else IndexedSeq.fill(3 + rnd.nextInt(12))(tok())
            (base + 10 + j) -> toks.mkString(" ")
          }
        }
      }
      val got = runOp(docs, t)
      // reference per corpus only: disjoint token spaces make every
      // cross-corpus Jaccard 0, and the operator must agree (asserted)
      val want = docs.groupBy(_._1 / 1000).values
        .map(c => refJoin(c, t)).reduce(_ ++ _)
      assert(got.keys.forall { case (x, y) => x / 1000 == y / 1000 },
        "a cross-corpus pair leaked through disjoint token spaces")
      assert(got == want,
        s"t=$t: ${(want.keySet -- got.keySet).take(5)} missed, " +
          s"${(got.keySet -- want.keySet).take(5)} extra " +
          s"(got ${got.size}, want ${want.size})")
      val ties = got.values.count(_._3 == t)
      assert(ties >= planted,
        s"t=$t: only $ties exact-tie pairs survived of $planted planted")
    }
  }

  private def runRs(probe: Seq[(Long, String)], index: Seq[(Long, String)],
                    t: Double): Map[(Long, Long), (Long, Long, Double)] =
    SetSim.prefixJaccardJoinRS(probe.toDF("doc_id", "text"),
        index.toDF("doc_id", "text"), "doc_id", "text", threshold = t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap

  test("R-S form: completeness vs cross-relation reference; no within-side pairs") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val bases = Vector.fill(4)(IndexedSeq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
    def doc(id: Long): (Long, String) = {
      val toks =
        if (id % 2 == 0) {
          val b = bases(rnd.nextInt(bases.size))
          b.updated(rnd.nextInt(b.size), vocab(rnd.nextInt(vocab.size))) :+ vocab(rnd.nextInt(vocab.size))
        } else IndexedSeq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      (id, toks.mkString(" "))
    }
    val probe = (1L to 20L).map(doc)
    val index = (101L to 160L).map(doc)
    for (t <- Seq(0.3, 0.5)) {
      // reference: unpruned cross-relation all-pairs (probe x index only)
      val ps = probe.map { case (id, txt) => id -> refSet(txt) }.filter(_._2.nonEmpty)
      val is = index.map { case (id, txt) => id -> refSet(txt) }.filter(_._2.nonEmpty)
      val want = (for {
        (ia, sa) <- ps; (ib, sb) <- is
        ov = (sa & sb).size.toLong
        un = sa.size + sb.size - ov
        jac = java.math.BigDecimal.valueOf(ov.toDouble / un)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
        if jac >= t
      } yield (ia, ib) -> (ov, un, jac)).toMap
      val got = runRs(probe, index, t)
      assert(got == want, s"threshold $t: got ${got.size} pairs, want ${want.size}")
      assert(want.nonEmpty, s"threshold $t: degenerate fixture")
      assert(got.keys.forall { case (a, b) => a <= 20L && b >= 101L },
        "pair leaked from within one side")
    }
  }

  test("R-S probe-only tokens (absent from the index dictionary) still pair correctly") {
    // probe doc shares its RARE half with one index doc; its other
    // tokens never occur in the index at all (df 0 ordering path)
    val probe = Seq(1L -> "q1 q2 q3 shared1 shared2 shared3 shared4 shared5 shared6")
    val index = Seq(
      101L -> "shared1 shared2 shared3 shared4 shared5 shared6 z1",
      102L -> "x1 x2 x3 x4 x5 x6 x7 x8")
    val got = runRs(probe, index, 0.3)
    assert(got.keySet == Set((1L, 101L)), got.toString)
  }

  test("threshold bounds rejected") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SetSim.prefixJaccardJoin(df, "doc_id", "text", threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      SetSim.prefixJaccardJoin(df, "doc_id", "text", threshold = 1.0)
    }
  }
}
