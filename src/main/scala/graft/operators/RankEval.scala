package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation (SURVEY §2 C76): recall@k, MRR@k and
  * nDCG@k per query — the TREC-style run-vs-qrels gate every
  * retrieval or ANN change passes before it touches a production
  * pipeline (measure the cheap ranker against ground truth, THEN ship
  * it). The reference pipeline publishes curated corpora; this is the
  * acceptance test its retrieval consumers run on them.
  *
  * Scale shape: both inputs are RUNS — k rows per query and a graded
  * judgment set per query — dimension-scale relative to the corpus the
  * run was produced from. Every join and window here keys on query_id
  * (or (query_id, doc_id)), so shuffles carry metric-scale rows and
  * the ideal-ranking window is per-query-local; the corpus itself
  * never appears. A 100 TB corpus with a million eval queries
  * evaluates on a few hundred MB.
  *
  * Determinism (the lm_score discipline): each discounted-gain term
  * rounds to 6 places and aggregates through decimal, so partial-agg
  * order cannot shift a sum; final ratios divide two identical doubles
  * in both engines before the last 6-place round.
  */
object RankEval {

  /** (2^rel − 1) / log2(pos + 1), the graded discounted gain, rounded
    * to 6 places into exact decimal. 2^rel − 1 is an exact small
    * integer for judgment grades; log2 is the only transcendental and
    * both engines agree at 6 decimals (the bm25/lm precedent).
    * Judgment grades are small integers by convention (TREC uses 0–4;
    * the demo's rank-derived grades reach 10); the exact-decimal(27,6)
    * sum holds gains up to rel ≈ 69 — beyond that the exponential
    * gain has outgrown nDCG itself, not just the decimal. */
  private def gainTerm(rel: Column, pos: Column): Column =
    round((pow(lit(2.0), rel.cast("double")) - 1.0) /
        log2(pos.cast("double") + 1.0), 6)
      .cast("decimal(27,6)")

  /** Evaluate a ranked `run` (query_id, doc_id, rank — rank 1-based)
    * against graded `qrels` (query_id, doc_id, rel ≥ 0) at cutoff k.
    *
    * Per query in the run:
    *  - `recall_at_k`: relevant (rel > 0) docs retrieved in the top k,
    *    over ALL relevant docs the qrels hold for the query (the TREC
    *    denominator — a run is not forgiven for ground truth it never
    *    had room for; callers wanting the capped denominator can
    *    pre-truncate their qrels).
    *  - `mrr`: 1 / rank of the first relevant doc within the top k,
    *    0 if none (MRR@k).
    *  - `ndcg_at_k`: DCG@k over the run's graded gains, normalized by
    *    the ideal DCG@k of the qrels sorted rel desc (doc_id asc
    *    tie-break), 0 when the query has no positive judgments.
    *
    * Queries present in the run but absent from the qrels score 0 on
    * all three (an unjudged query is a miss, never a crash), and a
    * query whose retrieved rows ALL sit beyond rank k still emits a
    * zero row — every query that ran is accounted for, so a macro
    * average over the output can never silently shrink its
    * denominator. Queries only in the qrels are not emitted — the
    * metric evaluates what actually ran.
    *
    * Malformed inputs resolve deterministically instead of producing
    * impossible metrics: a doc retrieved twice by one query counts
    * once at its BEST rank (recall can never exceed 1); multiple
    * judgments for one (query, doc) resolve to the most generous
    * grade (the TREC multi-assessor convention); and a query whose
    * run claims the SAME rank for distinct docs — a malformed
    * encoding of an ordering, which would let two gains share one
    * discount position and push nDCG past 1 — falls back to ordinal
    * positions for that query (row_number over (rank, doc_id), the
    * trec_eval re-sort). Well-formed queries keep their claimed
    * ranks verbatim, gaps included.
    */
  def rankMetrics(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"rankMetrics: k=$k must be positive")
    val judged = qrels.groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("rel")).as("rel"))
    val byQuery = Window.partitionBy("query_id")
    val dedupedRun = run.groupBy(col("query_id"), col("doc_id"))
      .agg(min(col("rank")).as("rank"))
      // distinct positions are what bound nDCG at 1: if any two docs
      // share a claimed rank, renumber THAT query ordinally
      .withColumn("_dup", count(lit(1))
        .over(Window.partitionBy("query_id", "rank")))
      .withColumn("_tied", max(col("_dup") > 1).over(byQuery))
      .withColumn("rank", when(col("_tied"),
          row_number().over(byQuery.orderBy(col("rank"), col("doc_id"))).cast("long"))
        .otherwise(col("rank")))
      .drop("_dup", "_tied")
    val graded = dedupedRun.filter(col("rank") <= k)
      .join(judged, Seq("query_id", "doc_id"), "left")
      .na.fill(0L, Seq("rel"))
    // the query spine comes from the UNTRUNCATED run: a query whose
    // every hit landed beyond k scores zero, it does not vanish
    val got = dedupedRun.select(col("query_id")).distinct()
      .join(graded.groupBy("query_id").agg(
        sum(gainTerm(col("rel"), col("rank"))).as("_dcg"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("_hits"),
        min(when(col("rel") > 0, col("rank"))).as("_first_rel")),
        Seq("query_id"), "left")
    // ideal ranking: a per-query-local window over the qrels only;
    // total-relevant counts come from the same pass (pre-truncation).
    val byGrade = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("doc_id").asc)
    val ideal = judged
      .withColumn("_pos", row_number().over(byGrade))
      .groupBy("query_id").agg(
        sum(when(col("_pos") <= k, gainTerm(col("rel"), col("_pos")))
          .otherwise(lit(null).cast("decimal(27,6)"))).as("_idcg"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("_n_rel"))
    got.join(ideal, Seq("query_id"), "left")
      // an all-beyond-k query has NULL aggregates: it scored nothing
      .withColumn("_hits", coalesce(col("_hits"), lit(0L)))
      .withColumn("_dcg", coalesce(col("_dcg"), lit(0).cast("decimal(27,6)")))
      .select(col("query_id"),
        when(col("_n_rel").isNull || col("_n_rel") === 0, 0.0)
          .otherwise(round(col("_hits").cast("double") / col("_n_rel"), 6))
          .as("recall_at_k"),
        when(col("_first_rel").isNull, 0.0)
          .otherwise(round(lit(1.0) / col("_first_rel"), 6)).as("mrr"),
        when(col("_idcg").isNull || col("_idcg") === lit(0).cast("decimal(27,6)"), 0.0)
          .otherwise(round(col("_dcg").cast("double") / col("_idcg").cast("double"), 6))
          .as("ndcg_at_k"))
  }
}
