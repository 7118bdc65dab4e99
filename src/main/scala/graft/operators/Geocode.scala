package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Norm

/** Geocode candidate-query expansion (SURVEY §2 A15) — the reference's
  * buildQueryCandidates (geocode.js:239-295): from one raw address,
  * derive the ladder of progressively-degraded query strings that the
  * resolver tries in order (exact → 之-variant → no-sub-number → no-弄 →
  * no-巷弄 → road+number), each gated by the looksLikeAddress check.
  *
  * Pure Column expressions: expansion happens in-row (no shuffle); the
  * downstream cache join explodes candidates with their priority rank so
  * "first variant that hits" is a min(rank) aggregation — the
  * distributed form of the reference's sequential try-loop.
  */
object Geocode {

  /** explode candidates to (id, candidate, rank) rows.
    *
    * Variants are materialized through staged projections so each
    * regexp chain evaluates once per row; the priority-order dedup is
    * then scalar comparisons between attributes (an array-HOF
    * formulation re-evaluates every variant O(n²) times — measured 6x
    * slower). */
  def expand(df: DataFrame, idCol: String, addrCol: String): DataFrame = {
    val staged = df
      .select(col(idCol), Norm.normalizeAddress(col(addrCol)).as("_v0"))
      .select(col(idCol), col("_v0"),
        Norm.hyphenToZhi(col("_v0")).as("_v1"),
        Norm.hyphenDropSub(col("_v0")).as("_v2"))
      .select(col(idCol), col("_v0"), col("_v1"), col("_v2"),
        Norm.dropNong(col("_v2")).as("_v3"),
        Norm.roadOnly(col("_v2")).as("_v5"))
      .select(col(idCol), col("_v0"), col("_v1"), col("_v2"), col("_v3"), col("_v5"),
        Norm.dropXiangNong(col("_v2")).as("_v4"))
    val ordered = Seq("_v0", "_v1", "_v2", "_v3", "_v4", "_v5").zipWithIndex
    val entries = ordered.map { case (v, r) =>
      val firstOccurrence = ordered.take(r)
        .map { case (prev, _) => col(v) =!= col(prev) }
        .foldLeft(lit(true))(_ && _)
      when(Norm.looksLikeAddress(col(v)) && firstOccurrence,
        struct(col(v).as("q"), lit(r).as("rank")))
    }
    staged
      .select(col(idCol),
        explode(filter(array(entries: _*), e => e.isNotNull)).as("cand"))
      .select(col(idCol), col("cand.q").as("candidate"), col("cand.rank").as("rank"))
  }

  /** resolve each row against a (query -> lat/lng) cache table taking
    * the best-ranked hit — the distributed "first variant that hits". */
  def resolveAgainstCache(df: DataFrame, idCol: String, addrCol: String,
                          cache: DataFrame, cacheKey: String): DataFrame = {
    val hits = expand(df, idCol, addrCol)
      .join(cache, col("candidate") === col(cacheKey))
      .groupBy(col(idCol))
      .agg(min(struct(col("rank"), col("candidate"))).as("best"))
      .select(col(idCol), col("best.candidate").as("matched_query"))
    df.join(hits, Seq(idCol), "left")
  }
}
