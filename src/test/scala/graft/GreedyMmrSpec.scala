package graft

import org.apache.spark.sql.functions._

import graft.operators.Mmr

/** C53 greedy-MMR native aggregate: the one-shuffle [[GreedyMmr]]
  * path must be BIT-identical to the relational unroll it replaced —
  * scores included, not just picks — across random candidate sets,
  * duplicate-score ties, and short groups. */
class GreedyMmrSpec extends SparkSpec {
  import spark.implicits._

  private def randCandidates(seed: Long, nQueries: Int, m: Int, dim: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = for {
      q <- 0 until nQueries
      d <- 0 until m
    } yield (q.toLong, (q * 1000 + d).toLong,
      BigDecimal(rnd.nextDouble()).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    rows.toDF("query_id", "doc_id", "rel", "vec")
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "mmr_round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq

  test("C53: aggregate matches the relational unroll bit-for-bit on random data") {
    (1 to 3).foreach { trial =>
      val cand = randCandidates(20260814L + trial, nQueries = 4, m = 12, dim = 16)
      val agg = collect(Mmr.rerank(cand, k = 5, lambda = 0.7)
        .select(col("query_id"), col("doc_id"), col("mmr_round"), col("mmr_score")))
      val unrolled = collect(Mmr.rerankUnrolled(cand, k = 5, lambda = 0.7)
        .select(col("query_id"), col("doc_id"),
          col("mmr_round").cast("int").as("mmr_round"), col("mmr_score")))
      assert(agg == unrolled, s"trial $trial")
    }
  }

  test("C53: groups smaller than k yield exactly their size in rounds") {
    val cand = randCandidates(7L, nQueries = 1, m = 3, dim = 8)
    val out = collect(Mmr.rerank(cand, k = 10, lambda = 0.5)
      .select(col("query_id"), col("doc_id"), col("mmr_round"), col("mmr_score")))
    assert(out.map(_._3) == Seq(1, 2, 3))
    assert(out.map(_._2).distinct.size == 3)
  }

  test("C53: identical vectors tie-break by doc_id ascending, rounds redundant picks last") {
    // two clones of the top-rel doc: after picking one, the clone's
    // maxsim = 1.0 slams its margin, so a diverse doc goes second
    val v1 = Array.fill(4)(1.0f)
    val v2 = Array[Float](1f, -1f, 1f, -1f)
    val cand = Seq(
      (0L, 10L, 0.9, v1), (0L, 11L, 0.9, v1), (0L, 20L, 0.5, v2))
      .toDF("query_id", "doc_id", "rel", "vec")
    val out = collect(Mmr.rerank(cand, k = 3, lambda = 0.7)
      .select(col("query_id"), col("doc_id"), col("mmr_round"), col("mmr_score")))
    assert(out.map(_._2) == Seq(10L, 20L, 11L))
    val unrolled = collect(Mmr.rerankUnrolled(cand, k = 3, lambda = 0.7)
      .select(col("query_id"), col("doc_id"),
        col("mmr_round").cast("int").as("mmr_round"), col("mmr_score")))
    assert(out == unrolled)
  }

  test("C53: the aggregate plan is one shuffle (single Exchange, no joins)") {
    val cand = randCandidates(9L, nQueries = 2, m = 6, dim = 8)
    val plan = Mmr.rerank(cand, k = 3, lambda = 0.7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
