package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** C98 shard_balance: closed-form splits, the oversized-document
  * behavior, contiguity/conservation invariants, and a driver
  * reference on sf0.001.
  */
class ShardBalanceSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, Long)], s: Int): Seq[(Long, Long, Long, Long, Long, Double)] = {
    val got = Sampling.shardBalance(
        docs.toDF("doc_id", "toks"), "doc_id", col("toks"), s)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    graft.util.CacheRegistry.releaseAll()
    got
  }

  /** driver reference: starting-offset boundary, capped at s-1 */
  private def ref(docs: Seq[(Long, Long)], s: Int): Seq[(Long, Long, Long, Long, Long, Double)] = {
    val sorted = docs.sortBy(_._1)
    val total = sorted.map(_._2).sum
    var cum = 0L
    val assigned = sorted.map { case (id, t) =>
      val shard = math.min((cum * s) / total, (s - 1).toLong)
      cum += t
      (shard, id, t)
    }
    assigned.groupBy(_._1).toSeq.sortBy(_._1).map { case (shard, rows) =>
      val tok = rows.map(_._3).sum
      (shard, rows.size.toLong, tok, rows.map(_._2).min, rows.map(_._2).max,
        java.math.BigDecimal.valueOf(tok.toDouble * s / total - 1.0)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    }
  }

  test("uniform corpus splits perfectly: rel_dev 0 everywhere") {
    val docs = (1L to 8L).map(i => (i, 10L))
    val got = run(docs, 2)
    assert(got == Seq((0L, 4L, 40L, 1L, 4L, 0.0), (1L, 4L, 40L, 5L, 8L, 0.0)))
  }

  test("a document larger than total/S keeps whole; shard ids may skip") {
    // doc 2 carries 80 of 100 tokens: with S=4 it spans shards 0..3's
    // span — docs 3,4 land in the LAST shard, shards 1-2 stay empty
    val docs = Seq((1L, 10L), (2L, 80L), (3L, 5L), (4L, 5L))
    val got = run(docs, 4)
    assert(got == ref(docs, 4), s"got $got want ${ref(docs, 4)}")
    assert(got.map(_._3).sum == 100L, "token mass conserved")
    assert(got.map(_._2).sum == 4L, "every doc lands somewhere")
  }

  test("null token counts coalesce to 0 (contiguity holds); all-zero corpus degenerates to shard 0") {
    val withNull = Seq((1L, Some(10L)), (2L, None), (3L, Some(10L)))
      .toDF("doc_id", "toks")
    val got = Sampling.shardBalance(withNull, "doc_id",
        col("toks").cast("long"), 2)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    graft.util.CacheRegistry.releaseAll()
    // doc 2 counts as 0 tokens; its starting offset (10 of 20) sits
    // exactly on the shard-1 boundary, so it opens shard 1 —
    // contiguity holds (a null would instead null the boundary algebra
    // and silently park the doc in the LAST shard)
    assert(got == Seq((0L, 1L, 10L, 1L, 1L), (1L, 2L, 10L, 2L, 3L)), got.toString)
    val zeros = run(Seq((1L, 0L), (2L, 0L)), 4)
    assert(zeros == Seq((0L, 2L, 0L, 1L, 2L, 0.0)), zeros.toString)
  }

  test("invariants + driver reference on sf0.001: contiguous, conservative, bounded skew") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).as("toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Sampling.shardBalance(
        graft.sources.Tables.documents(spark, sfDir), "doc_id",
        graft.functions.Text.tokenCount(col("text")), nShards = 8)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    graft.util.CacheRegistry.releaseAll()
    assert(got == ref(docs, 8))
    // contiguity: shard id ranges never interleave
    got.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 < b._4, s"overlapping shards: $a / $b")
      case _ => ()
    }
    assert(got.map(_._3).sum == docs.map(_._2).sum)
    // each boundary misses ideal by < one document, so |rel_dev| is
    // bounded by S * max_doc/total on each side
    val maxFrac = 8.0 * docs.map(_._2).max / docs.map(_._2).sum
    assert(got.forall(r => math.abs(r._6) <= maxFrac + 1e-9), got.toString)
  }
}
