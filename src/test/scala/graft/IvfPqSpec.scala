package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextDemos}
import graft.sources.Tables

/** C64 IVF-PQ: structural contract of the composed index — residuals,
  * codebooks, codes, and the probe-restricted ADC search. */
class IvfPqSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val cents = Similarity.ivfCentroids(emb, "embedding", "label")
  private lazy val corpus = emb.filter(col("vec_id") >= 5)
    .select(col("vec_id").as("cand_id"), col("embedding"), col("label"))
  private lazy val resid =
    Similarity.ivfPqResiduals(corpus, "cand_id", "embedding", "label", cents, m = 8, dim = 64)
  private lazy val books = Similarity.ivfPqBooks(resid, "cand_id", codesMod = 10)
  private lazy val codes = Similarity.ivfPqEncode(resid, "cand_id", "label", books)

  test("residuals: 64 per vector, exactly v - centroid(label) at 9 places") {
    val n = corpus.count()
    assert(resid.count() == n * 64)
    val centMap = cents.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val raw = corpus.limit(10).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val got = resid.collect()
      .map(r => (r.getLong(0), r.getInt(2) * 8 + r.getInt(3)) -> r.getDouble(4)).toMap
    raw.foreach { case (id, v, label) =>
      v.indices.foreach { pos =>
        // valueOf (shortest-string), not new BigDecimal (binary
        // expansion) — Spark's round() goes through valueOf
        val want = java.math.BigDecimal.valueOf(v(pos).toDouble - centMap((label, pos)))
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        assert(got((id, pos)) == want, s"vec $id pos $pos")
      }
    }
  }

  test("books: every subspace carries exactly codesMod codes of sub dims each") {
    val shape = books.groupBy(col("subspace"))
      .agg(countDistinct(col("code")).as("nc"), count(lit(1)).as("rows"))
      .collect()
    assert(shape.length == 8)
    shape.foreach { r =>
      assert(r.getLong(1) == 10 && r.getLong(2) == 80, r.toString) // 10 codes × 8 subpos
    }
  }

  test("codes: m rows per candidate, each carrying its coarse label") {
    val perCand = codes.groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("label")).as("nl"))
    assert(perCand.filter(col("n") =!= 8 || col("nl") =!= 1).count() == 0)
    assert(codes.count() == corpus.count() * 8)
  }

  test("search: results come only from probed clusters; k ranked per query; deterministic") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val out = Similarity.ivfPqTopK(queries, codes, books, cents,
      k = 5, m = 8, dim = 64, nprobe = 2)
    val rows = out.collect()
    val probed = Similarity.ivfAssignN(queries, cents, nprobe = 2)
      .select(col("query_id"), col("label")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSet).toMap
    val candLabel = corpus.select(col("cand_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, c) = (r.getLong(0), r.getLong(1))
      assert(probed(q).contains(candLabel(c)),
        s"query $q got candidate $c from unprobed cluster ${candLabel(c)}")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 5)
      assert(r.getDouble(2) >= 0.0, "ADC squared distance must be non-negative")
    }
    // per-query ranks are 1..n without gaps, dist non-decreasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_.getDouble(2)).toSeq == sorted.map(_.getDouble(2)).sorted.toSeq)
    }
    // bit-deterministic across plans/partitionings
    val again = Similarity.ivfPqTopK(queries.repartition(7), codes.repartition(5),
      books, cents, k = 5, m = 8, dim = 64, nprobe = 2).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("search plan: dtable broadcasts; codes side never builds a cartesian") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val out = Similarity.ivfPqTopK(queries, codes, books, cents,
      k = 5, m = 8, dim = 64, nprobe = 2)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"),
      "the corpus-scale codes join must never be cartesian")
  }

  test("demo: persisted-index search answers like the inline chain") {
    val inline = {
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      Similarity.ivfPqTopK(queries, codes, books, cents,
        k = 5, m = 8, dim = 64, nprobe = 2)
        .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    }
    val demo = TextDemos.ivfPqTopkDemo(spark, sfDir).collect().map(_.toString).toSeq
    assert(demo == inline)
  }
}
