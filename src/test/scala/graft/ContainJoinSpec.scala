package graft

import graft.operators.SetSim

/** C95 contain_join: completeness of the asymmetric prefix/length/
  * positional prunes vs a plain-Scala all-pairs reference, the
  * motivating quote-in-long-doc case Jaccard misses, and the t=1
  * exact-subset edge.
  */
class ContainJoinSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md560(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def refSet(text: String, n: Int = 3): Set[Long] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(g => md560(g.mkString(" "))).toSet
  }

  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** all ORDERED pairs with containment >= t — no pruning at all */
  private def refJoin(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), (Long, Long, Long, Double)] = {
    val sets = docs.map { case (id, txt) => id -> refSet(txt) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      ov = (sa & sb).size.toLong
      c = round6(ov.toDouble / sa.size)
      if c >= t
    } yield (ia, ib) -> (ov, sa.size.toLong, sb.size.toLong, c)).toMap
  }

  private def runOp(docs: Seq[(Long, String)], t: Double): Map[(Long, Long), (Long, Long, Long, Double)] = {
    val got = SetSim.containmentJoin(docs.toDF("doc_id", "text"), "doc_id", "text", t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    graft.util.CacheRegistry.releaseAll()
    got
  }

  test("a quote swallowed by a 10x doc: containment 1.0 both found; Jaccard misses it") {
    val quote = "alpha beta gamma delta epsilon"                  // 3 trigrams
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(1L -> quote, 2L -> (quote + " " + filler))     // A's trigrams ⊂ B's
    val got = runOp(docs, 0.8)
    assert(got.contains((1L, 2L)), s"contained quote must surface: $got")
    val (ov, szA, _, c) = got((1L, 2L))
    assert(ov == 3L && szA == 3L && c == 1.0)
    assert(!got.contains((2L, 1L)), "the long doc is NOT contained in the quote")
    // the symmetric join at the same threshold cannot see this pair
    val jac = SetSim.prefixJaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", 0.8)
      .collect()
    graft.util.CacheRegistry.releaseAll()
    assert(jac.isEmpty, "Jaccard at 0.8 must miss the subset pair")
  }

  test("completeness + exactness vs all-pairs reference on randomized docs") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val bases = Vector.fill(4)(IndexedSeq.fill(10 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
    val docs: Seq[(Long, String)] = (1L to 50L).map { id =>
      val toks =
        if (id % 3 == 0) { // an excerpt of a base: containment-rich
          val b = bases(rnd.nextInt(bases.size))
          val start = rnd.nextInt(b.size / 2)
          b.slice(start, start + 4 + rnd.nextInt(b.size - start))
        } else if (id % 3 == 1) { // a base with noise appended
          bases(rnd.nextInt(bases.size)) ++ IndexedSeq.fill(rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        } else IndexedSeq.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
      (id, toks.mkString(" "))
    }
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val want = refJoin(docs, t)
      val got = runOp(docs, t)
      assert(got == want, s"threshold $t: got ${got.size} pairs, want ${want.size}")
      assert(want.nonEmpty, s"threshold $t: degenerate fixture")
    }
  }

  test("t = 1.0: only exact subsets; the probing prefix is the single rarest token") {
    val docs = Seq(
      1L -> "alpha beta gamma delta",            // 2 trigrams, subset of 2
      2L -> "alpha beta gamma delta epsilon",    // superset
      3L -> "alpha beta gamma zeta")             // shares 1 of A's 2 trigrams
    val got = runOp(docs, 1.0)
    val want = refJoin(docs, 1.0)
    assert(got == want)
    assert(got.contains((1L, 2L)) && !got.contains((1L, 3L)))
  }
}
