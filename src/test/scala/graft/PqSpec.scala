package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** C34 product quantization: codebooks → encode → ADC top-k, checked
  * against an independent in-memory brute-force computation of the
  * same math (means, per-subspace argmin, table-lookup distances) on
  * the sf0.001 embeddings. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val m = 8
  private val dim = 64
  private val sub = dim / m

  private lazy val vecs: Map[Long, Array[Float]] =
    Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
  private lazy val labels: Map[Long, Int] =
    Tables.embeddings(spark, sfDir).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  // brute-force mirror (plain doubles — values are compared after the
  // operators' 6-place rounding, which absorbs sub-ulp fold-order drift)
  private lazy val bruteBooks: Map[(Int, Int), Array[Double]] =
    vecs.keys.groupBy(id => labels(id)).flatMap { case (code, ids) =>
      (0 until m).map { s =>
        val members = ids.toSeq.sorted.map(vecs)
        (s, code) -> Array.tabulate(sub)(j =>
          members.map(v => v(s * sub + j).toDouble).sum / members.size)
      }
    }

  private def bruteL2(v: Array[Float], s: Int, code: Int): Double =
    (0 until sub).map { j =>
      val d = v(s * sub + j).toDouble - bruteBooks((s, code))(j)
      BigDecimal(d * d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sum

  private def bruteCode(v: Array[Float], s: Int): Int =
    bruteBooks.keys.filter(_._1 == s).map(_._2).toSeq.sorted
      .minBy(c => (bruteL2(v, s, c), c))

  test("C34: PQ encode matches the brute-force per-subspace argmin exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = Similarity.pqCodebooks(emb, "embedding", "label", m, dim)
    val got = Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", books, m, dim)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got.size == vecs.size * m, "m codes per vector")
    val want = for (id <- vecs.keys; s <- 0 until m)
      yield ((id, s), bruteCode(vecs(id), s))
    val diff = want.filter { case (k, c) => got(k) != c }
    assert(diff.isEmpty, s"encode mismatches: ${diff.take(5)}")
  }

  test("C34: ADC top-k matches brute-force table-lookup ranking; plan never shuffles raw vectors") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = Similarity.pqCodebooks(emb, "embedding", "label", m, dim)
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding"))
    val codes = Similarity.pqEncode(corpus, "cand_id", "embedding", books, m, dim)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val df = Similarity.pqTopK(queries, codes, books, k = 5, m, dim)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap

    val candIds = vecs.keys.filter(_ >= 5).toSeq.sorted
    for (q <- vecs.keys.filter(_ < 5)) {
      val ranked = candIds
        .map(c => c -> (0 until m).map(s => bruteL2(vecs(q), s, bruteCode(vecs(c), s))).sum)
        .sortBy { case (c, d) => (d, c) }.take(5).map(_._1)
      val gotQ = (1 to 5).map(r => got((q, r.toLong)))
      assert(gotQ == ranked, s"query $q: got $gotQ want $ranked")
    }
    // the search side reads codes + broadcast tables only: the plan's
    // only corpus-scale input is the encode subtree; the ADC join and
    // codebook join are broadcasts
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(10).mkString("\n"))
  }

  test("C34: map-only encode equals the relational encode row-for-row, with a shuffle-free plan") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = Similarity.pqCodebooks(emb, "embedding", "label", m, dim)
    val vecsDf = emb.select(col("vec_id"), col("embedding"))
    val rel = Similarity.pqEncode(vecsDf, "vec_id", "embedding", books, m, dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val mo = Similarity.pqEncodeMapOnly(vecsDf, "vec_id", "embedding", books, m, dim)
    val moRows = mo.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(moRows.sameElements(rel), "map-only and relational encode must agree exactly")
    // and the map-only plan moves nothing: no exchange of any kind
    val plan = mo.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"map-only encode must be shuffle-free:\n${plan.linesIterator.filter(_.contains("Exchange")).mkString("\n")}")
  }

  test("C34: kmeansFit-per-subspace codebooks beat the bootstrap books on reconstruction error") {
    val emb = Tables.embeddings(spark, sfDir)
    def booksMap(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Array[Double]] =
      df.collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (k, rows) =>
          k -> rows.sortBy(_.getInt(2)).map(_.getDouble(3))
        }
    // reconstruction error of a codebook set: mean over vectors of the
    // per-subspace MINIMUM squared L2 (what the chosen code costs)
    def err(books: Map[(Int, Int), Array[Double]]): Double = {
      def l2(v: Array[Float], s: Int, code: Int): Double =
        (0 until sub).map { j =>
          val d = v(s * sub + j).toDouble - books((s, code))(j); d * d
        }.sum
      vecs.values.map { v =>
        (0 until m).map { s =>
          books.keys.filter(_._1 == s).map(k => l2(v, s, k._2)).min
        }.sum
      }.sum / vecs.size
    }
    val bootstrap = booksMap(
      Similarity.pqCodebooks(emb, "embedding", "label", m, dim)
        .select(col("subspace"), col("code"), col("subpos"), col("centroid")))
    val fitted = booksMap(
      Similarity.pqCodebooksFit(emb, "vec_id", "embedding", m, dim,
        codes = 10, maxIter = 5))
    assert(fitted.size == bootstrap.size || fitted.nonEmpty) // codebook shape sane
    val (eFit, eBoot) = (err(fitted), err(bootstrap))
    assert(eFit < eBoot,
      f"fitted books must reconstruct better: fitted=$eFit%.4f bootstrap=$eBoot%.4f")
  }

  test("C34: codebooks are dimension-scale (m x codes x d/m rows)") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = Similarity.pqCodebooks(emb, "embedding", "label", m, dim)
    assert(books.count() == m.toLong * 10 * sub)
    // and every encode output code is a real codebook code
    val codes = Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", books, m, dim)
    assert(codes.agg(min("code"), max("code")).collect().head.toSeq == Seq(0, 9))
  }
}
