package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Specs for the token-budget greedy selection (C85): the two-phase
  * range-partitioned cumsum must be bit-identical to the naive
  * single-ordering reference for every partition count, including
  * degenerate ones (more partitions than rows).
  */
class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  /** naive reference: sort, scan, keep while cum <= floor(frac*total) */
  private def refSelect(rows: Seq[(Long, Double, Long)], frac: Double): Seq[(Long, Double, Long, Long)] = {
    val total = rows.map(_._3).sum
    val budget = math.floor(total * frac).toLong
    var cum = 0L
    rows.sortBy { case (id, score, _) => (-score, id) }.flatMap { case (id, score, toks) =>
      cum += toks
      if (cum <= budget) Some((id, score, toks, cum)) else None
    }
  }

  private def runOp(rows: Seq[(Long, Double, Long)], frac: Double, parts: Int): Seq[(Long, Double, Long, Long)] =
    Sampling.budgetSelect(rows.toDF("doc_id", "score", "toks"),
        "doc_id", col("score"), col("toks"), budgetFrac = frac, partitions = parts)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)

  test("closed form: greedy order, budget boundary, ties break on id") {
    // total 100 tokens, budget floor(0.5*100)=50
    val rows = Seq(
      (1L, 0.9, 30L), // cum 30: kept
      (2L, 0.7, 20L), // cum 50: kept (exactly at budget)
      (3L, 0.7, 25L), // tie with 2 -> after it; cum 75: dropped
      (4L, 0.5, 25L)) // dropped
    val got = runOp(rows, 0.5, 3)
    assert(got == Seq((1L, 0.9, 30L, 30L), (2L, 0.7, 20L, 50L)))
  }

  test("matches the single-ordering reference across partition counts") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map { id =>
      (id, math.rint(rnd.nextDouble() * 100) / 100, (1 + rnd.nextInt(50)).toLong)
    }
    val want = refSelect(rows, 0.3)
    assert(want.nonEmpty)
    for (parts <- Seq(1, 7, 32, 300)) { // 300 > rows: empty partitions
      assert(runOp(rows, 0.3, parts) == want, s"partitions=$parts")
    }
  }

  test("budgetFrac = 1.0 keeps every row; empty input yields empty output") {
    val rows = Seq((1L, 0.2, 5L), (2L, 0.8, 7L), (3L, 0.4, 1L))
    assert(runOp(rows, 1.0, 2).map(_._1).toSet == Set(1L, 2L, 3L))
    val empty = Sampling.budgetSelect(
      Seq.empty[(Long, Double, Long)].toDF("doc_id", "score", "toks"),
      "doc_id", col("score"), col("toks"), budgetFrac = 0.5)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("doc_id", "score", "toks", "cum_tokens"))
  }

  test("budgetFrac bounds rejected") {
    val df = Seq((1L, 0.5, 3L)).toDF("doc_id", "score", "toks")
    intercept[IllegalArgumentException] {
      Sampling.budgetSelect(df, "doc_id", col("score"), col("toks"), budgetFrac = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.budgetSelect(df, "doc_id", col("score"), col("toks"), budgetFrac = 1.5)
    }
  }
}
