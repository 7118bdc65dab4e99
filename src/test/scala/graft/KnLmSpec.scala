package graft

import graft.operators.TextDemos

/** C119: interpolated Kneser-Ney bigram scoring — checked against a
  * plain-Scala reference of the same algebra (same double operation
  * order, same round-6 decimal quantization) and against the
  * smoothing's defining normalization property.
  */
class KnLmSpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  /** corpus statistics the reference and the property test share */
  private def stats(docs: Seq[(Long, String)]) = {
    val occ = docs.flatMap { case (_, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      ws.zip(ws.drop(1))
    }
    val cb = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cu = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1pPre = cb.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1pCont = cb.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    (cb, cu, n1pPre, n1pCont, cb.size.toLong)
  }

  private def prob(st: (Map[(String, String), Long], Map[String, Long],
                        Map[String, Long], Map[String, Long], Long))
                  (a: String, b: String): Double = {
    val (cb, cu, pre, cont, tt) = st
    (math.max(cb.getOrElse((a, b), 0L) - D, 0.0) +
      D * pre(a) * cont.getOrElse(b, 0L) / tt) / cu(a)
  }

  test("C119 matches a plain-Scala KN reference on a random corpus") {
    val rnd = new scala.util.Random(23)
    val vocab = (1 to 12).map(i => s"w$i")
    val docs = (1L to 40L).map { id =>
      (id, IndexedSeq.fill(2 + rnd.nextInt(25))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val st = stats(docs)
    val want = docs.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val lps = ws.zip(ws.drop(1)).map { case (a, b) =>
        BigDecimal(math.log(prob(st)(a, b)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      id -> ((lps.size.toLong, (lps.sum.toDouble / lps.size)))
    }.toMap
    val got = TextDemos.knLmScoreOn(docs.toDF("doc_id", "text"), discount = D)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (n, lp)) =>
      assert(got(id)._1 == n, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - lp) < 1e-12, s"doc $id: ${got(id)._2} vs $lp")
    }
  }

  test("C119 KN normalizes: per prefix, P(b|a) over the vocabulary sums to 1") {
    val docs = Seq(
      (1L, "a b a c a b b c a"),
      (2L, "c a b a a b c c"),
      (3L, "b b a c b a"))
    val st = stats(docs)
    val vocab = Seq("a", "b", "c")
    vocab.foreach { a =>
      val s = vocab.map(b => prob(st)(a, b)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"prefix $a sums to $s")
    }
  }

  test("C119 continuation counts punish one-context tokens (the Francisco case)") {
    // 'uq' appears 5x but ONLY ever after 'san'; 'mid' appears 3x
    // after 3 different contexts. In an UNSEEN context, KN must prefer
    // 'mid' even though 'uq' is more frequent.
    val docs = Seq(
      (1L, "san uq x san uq y san uq z san uq q san uq k"),
      (2L, "a mid b mid c mid d e f g h"))
    val st = stats(docs)
    // backoff mass only (unseen bigram): proportional to n1p_cont
    val contUq = st._4("uq"); val contMid = st._4("mid")
    assert(contUq == 1L && contMid == 3L)
    assert(prob(st)("x", "mid") > prob(st)("x", "uq"))
  }
}
