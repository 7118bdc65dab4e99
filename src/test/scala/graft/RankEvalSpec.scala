package graft

import org.apache.spark.sql.functions._
import graft.operators.RankEval

/** C76 rank-metrics spec: closed-form cases where recall/MRR/nDCG are
  * known exactly, the TREC conventions (denominators, tie-breaks,
  * unjudged queries), and a randomized driver-reference recompute. */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "doc_id", "rank")
  private def qrels(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "doc_id", "rel")

  private def metrics(r: org.apache.spark.sql.DataFrame,
                      q: org.apache.spark.sql.DataFrame, k: Int) =
    RankEval.rankMetrics(r, q, k).orderBy("query_id")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2), x.getDouble(3)))

  test("perfect run: ideal order scores ndcg 1, mrr 1, full recall") {
    // 3 relevant docs graded 3,2,1 — the run returns them in grade order
    val m = metrics(
      run((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)),
      qrels((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L)), k = 3)
    assert(m === Array((1L, 1.0, 1.0, 1.0)))
  }

  test("reversed run: recall and mrr survive, ndcg drops below 1") {
    val m = metrics(
      run((1L, 12L, 1L), (1L, 11L, 2L), (1L, 10L, 3L)),
      qrels((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L)), k = 3)
    val (_, recall, mrr, ndcg) = m.head
    assert(recall === 1.0)
    assert(mrr === 1.0) // first retrieved doc IS relevant (grade 1)
    assert(ndcg > 0 && ndcg < 1.0, s"ndcg=$ndcg")
    // closed form: dcg = 1/log2(2) + 3/log2(3) + 7/log2(4) (terms rounded 6)
    val dcg = BigDecimal(math.round(1.0 / 1.0 * 1e6)) / 1e6 +
      BigDecimal((3.0 / (math.log(3) / math.log(2)) * 1e6).round) / 1e6 +
      BigDecimal((7.0 / 2.0 * 1e6).round) / 1e6
    val idcg = BigDecimal(7.0) +
      BigDecimal((3.0 / (math.log(3) / math.log(2)) * 1e6).round) / 1e6 +
      BigDecimal(1.0 / 2.0)
    val want = BigDecimal((dcg.toDouble / idcg.toDouble * 1e6).round) / 1e6
    assert(ndcg === want.toDouble)
  }

  test("recall denominator is ALL relevant judgments, not k") {
    // 4 relevant in qrels, k=2, run hits both slots -> recall 0.5
    val m = metrics(
      run((1L, 10L, 1L), (1L, 11L, 2L)),
      qrels((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L), (1L, 13L, 1L)), k = 2)
    assert(m.head._2 === 0.5)
  }

  test("miss cases: late first hit sets mrr 1/rank; no hits scores zero") {
    val m = metrics(
      run((1L, 90L, 1L), (1L, 91L, 2L), (1L, 10L, 3L),
          (2L, 95L, 1L), (2L, 96L, 2L)),
      qrels((1L, 10L, 2L), (2L, 11L, 2L)), k = 3)
    val byQ = m.map(x => x._1 -> x).toMap
    assert(byQ(1L)._3 === math.rint(1.0 / 3.0 * 1e6) / 1e6) // mrr = 1/3 rounded
    assert(byQ(2L) === ((2L, 0.0, 0.0, 0.0)))
  }

  test("unjudged query scores zero on all metrics, never crashes") {
    val m = metrics(
      run((7L, 1L, 1L), (7L, 2L, 2L)),
      qrels((1L, 10L, 1L)), k = 2)
    assert(m === Array((7L, 0.0, 0.0, 0.0)))
  }

  test("rel=0 judgments count for idcg denominators but never for recall/mrr") {
    // qrels carry an explicit non-relevant judgment; retrieving it earns nothing
    val m = metrics(
      run((1L, 10L, 1L), (1L, 11L, 2L)),
      qrels((1L, 10L, 0L), (1L, 11L, 1L)), k = 2)
    val (_, recall, mrr, ndcg) = m.head
    assert(recall === 1.0) // 1 of 1 relevant
    assert(mrr === 0.5)    // first relevant at rank 2
    // dcg = 0 + 1/log2(3); idcg = 1/log2(2) = 1 (rel-1 doc ideally first)
    val t = math.rint(1.0 / (math.log(3) / math.log(2)) * 1e6) / 1e6
    assert(ndcg === math.rint(t / 1.0 * 1e6) / 1e6)
  }

  test("a query whose hits all sit beyond k still emits a zero row") {
    val m = metrics(
      run((1L, 10L, 6L), (1L, 11L, 7L), (2L, 10L, 1L)),
      qrels((1L, 10L, 2L), (2L, 10L, 2L)), k = 5)
    val byQ = m.map(x => x._1 -> x).toMap
    assert(byQ(1L) === ((1L, 0.0, 0.0, 0.0))) // accounted for, not vanished
    assert(byQ(2L)._2 === 1.0)
  }

  test("a doc retrieved twice counts once at its best rank: recall never exceeds 1") {
    val m = metrics(
      run((1L, 10L, 1L), (1L, 10L, 2L)),
      qrels((1L, 10L, 1L)), k = 5)
    val (_, recall, mrr, ndcg) = m.head
    assert(recall === 1.0 && mrr === 1.0 && ndcg === 1.0)
  }

  test("distinct docs tied at one rank renumber ordinally: ndcg stays at most 1") {
    // two rel-3 docs both claiming rank 1 would double-count the
    // position-1 gain (ndcg 1.23) if the tie were honored
    val m = metrics(
      run((1L, 10L, 1L), (1L, 11L, 1L)),
      qrels((1L, 10L, 3L), (1L, 11L, 3L)), k = 5)
    val (_, recall, mrr, ndcg) = m.head
    assert(recall === 1.0 && mrr === 1.0)
    assert(ndcg === 1.0) // ordinal positions 1,2 = exactly the ideal
  }

  test("well-formed sparse ranks keep their claimed positions") {
    // ranks 3 and 5 with no ties: the claimed discounts stand — the
    // tie fallback must not silently compact legitimate gaps
    val m = metrics(
      run((1L, 10L, 3L), (1L, 11L, 5L)),
      qrels((1L, 10L, 1L), (1L, 11L, 1L)), k = 5)
    val (_, recall, mrr, ndcg) = m.head
    assert(recall === 1.0)
    assert(mrr === math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(ndcg < 1.0, s"gaps must keep their discount: $ndcg")
  }

  test("duplicate judgments resolve to the most generous grade") {
    val m = metrics(
      run((1L, 10L, 1L)),
      qrels((1L, 10L, 0L), (1L, 10L, 2L)), k = 5)
    val (_, recall, mrr, ndcg) = m.head
    assert(recall === 1.0 && mrr === 1.0 && ndcg === 1.0)
  }

  test("randomized: equals a sequential driver reference") {
    val rnd = new scala.util.Random(20260815L)
    val queries = (0L until 12L).toSeq
    val runRows = queries.flatMap { q =>
      val docs = rnd.shuffle((0L until 40L).toVector).take(8)
      docs.zipWithIndex.map { case (d, i) => (q, d, (i + 1).toLong) }
    }
    val qrelRows = queries.flatMap { q =>
      rnd.shuffle((0L until 40L).toVector).take(10)
        .map(d => (q, d, rnd.nextInt(4).toLong)) // grades 0..3
    }
    val k = 5
    val got = metrics(run(runRows: _*), qrels(qrelRows: _*), k)

    // Spark's round() goes through BigDecimal.valueOf (shortest-decimal),
    // not the exact binary expansion — mirror that.
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qrelMap = qrelRows.groupBy(_._1)
    val want = queries.map { q =>
      val rl = qrelMap.getOrElse(q, Seq()).map(t => t._2 -> t._3).toMap
      val top = runRows.filter(r => r._1 == q && r._3 <= k).sortBy(_._3)
      def gain(rel: Long, pos: Long) =
        BigDecimal(r6((math.pow(2.0, rel.toDouble) - 1.0) /
          (math.log(pos + 1.0) / math.log(2.0))))
      val dcg = top.map(r => gain(rl.getOrElse(r._2, 0L), r._3)).sum
      val ideal = qrelMap.getOrElse(q, Seq()).sortBy(t => (-t._3, t._2)).take(k)
      val idcg = ideal.zipWithIndex.map { case (t, i) => gain(t._3, i + 1L) }.sum
      val nRel = qrelMap.getOrElse(q, Seq()).count(_._3 > 0)
      val hits = top.count(r => rl.getOrElse(r._2, 0L) > 0)
      val firstRel = top.find(r => rl.getOrElse(r._2, 0L) > 0).map(_._3)
      (q,
        if (nRel == 0) 0.0 else r6(hits.toDouble / nRel),
        firstRel.map(fr => r6(1.0 / fr)).getOrElse(0.0),
        if (idcg == 0) 0.0 else r6(dcg.toDouble / idcg.toDouble))
    }
    assert(got.toSeq === want)
  }

  test("C76 demo row: exact arm is the ceiling, lsh arm never beats it") {
    val df = graft.operators.TextDemos.retrievalEval(spark, sfDir)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val (exact, lsh) = rows.partition(_._1 == "exact")
    assert(exact.nonEmpty && lsh.nonEmpty)
    assert(exact.forall(r => r._3 == 0.5 && r._4 == 1.0 && r._5 == 1.0),
      exact.mkString(", "))
    val lshByQ = lsh.map(r => r._2 -> r).toMap
    exact.foreach { e =>
      val l = lshByQ(e._2)
      assert(l._3 <= e._3 && l._5 <= e._5, s"lsh beats exact truth: $l vs $e")
    }
  }
}
