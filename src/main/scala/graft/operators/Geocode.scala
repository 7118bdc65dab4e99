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

  /** ordered candidate variants for a normalized address column */
  def candidateVariants(addr: Column): Column = {
    val base = Norm.normalizeAddress(addr)
    val variants: Seq[Column] = Seq(
      base,
      Norm.hyphenToZhi(base),
      Norm.hyphenDropSub(base),
      Norm.dropNong(Norm.hyphenDropSub(base)),
      Norm.dropXiangNong(Norm.hyphenDropSub(base)),
      Norm.roadOnly(Norm.hyphenDropSub(base)))
    // keep priority order, drop non-address strings and duplicates
    val arr = array(variants: _*)
    filter(
      zip_with(arr, sequence(lit(0), lit(variants.size - 1)),
        (v, i) => struct(v.as("q"), i.as("rank"))),
      s => Norm.looksLikeAddress(s.getField("q")) &&
        // first occurrence wins: no earlier variant equals this one
        !exists(slice(arr, lit(1), s.getField("rank")), p => p === s.getField("q")))
  }

  /** explode candidates to (id, candidate, rank) rows */
  def expand(df: DataFrame, idCol: String, addrCol: String): DataFrame =
    df.select(col(idCol), explode(candidateVariants(col(addrCol))).as("cand"))
      .select(col(idCol), col("cand.q").as("candidate"), col("cand.rank").as("rank"))

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
