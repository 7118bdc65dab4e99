package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance operators (SURVEY §2C): takedown propagation through
  * near-dup clusters, k-anonymity generalization for released
  * aggregates, and join-key skew diagnostics.
  *
  * These are the compliance/ops half of a corpus pipeline — the steps
  * that run AFTER curation decides what's good: honoring removal
  * requests (and their near-copies), gating what per-group statistics a
  * dataset card may publish, and telling an engineer which join keys
  * will hot-spot a 1000-executor shuffle before the job runs.
  */
object Governance {

  /** C103 — takedown propagation: given a delete list (DMCA/GDPR/opt-out
    * ids), remove the listed documents AND every member of their
    * near-duplicate clusters — deleting only the listed copy of a
    * mirrored page leaves its 40 near-identical crawls in the corpus,
    * which fails the request in substance. Cluster labels come from
    * [[Dedup.connectedComponents]] over near-dup candidate pairs (C13's
    * machinery — the same labels the dedup pass already computes, so at
    * 100 TB this reuses a materialized column rather than re-clustering).
    *
    * Scale shape: the delete list is request-scale (thousands of ids
    * against billions of docs) — it broadcasts; the tainted-cluster id
    * set is at most list-sized — it broadcasts back. The corpus-side
    * cluster table is touched by two broadcast hash joins and never
    * shuffles. Output: one row per REMOVED doc
    * (id, cluster, reason ∈ {listed, cluster}) — the audit trail a
    * takedown response cites; anti-join the corpus against it to
    * actually drop the rows.
    */
  def takedownPropagate(clusters: DataFrame, listed: DataFrame,
                        idCol: String): DataFrame = {
    val listedIds = listed.select(col(idCol)).distinct()
    val bad = clusters.join(broadcast(listedIds), idCol)
      .select(col("cluster")).distinct()
    clusters.join(broadcast(bad), "cluster")
      .join(broadcast(listedIds.withColumn("_listed", lit(true))),
        Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        when(col("_listed"), lit("listed")).otherwise(lit("cluster"))
          .as("reason"))
  }

  /** C106 — k-anonymity generalization ladder: re-key every row to the
    * FINEST quasi-identifier level whose PUBLISHED cell still holds at
    * least `k` rows — the gate a dataset card or stats release runs so
    * no published cell isolates fewer than k documents (a (lang,
    * source) cell of size 2 identifies its members). Ladder: level 0 =
    * (lang, source), level 1 = (lang, *), level 2 = (*, *), level 3 =
    * suppressed (null keys — the row may not appear in any release).
    *
    * Admission tests the RESIDUAL, not the raw group count: the
    * published (lang, *) cell contains only the rows whose level-0 cell
    * was thin, so level 1 admits a row iff its language's residual mass
    * (Σ _n0 over that language's cells with _n0 < k) is ≥ k — a
    * language with 1000 rows but a single thin 1-row cell must NOT
    * publish that row alone under (lang, *). Likewise level 2's (*, *)
    * cell holds exactly the rows that failed both finer levels, so it
    * admits iff that global residual is ≥ k; otherwise the stragglers
    * are suppressed outright (level 3). Every published cell is ≥ k by
    * construction, including the coarsest one.
    *
    * Scale shape: the level-0 cell-count table is quasi-identifier-
    * cardinality (thousands of cells, not rows); the residual tables
    * derive from IT, not from the corpus — all three broadcast, and the
    * fact side takes two broadcast hash joins plus a 1-row cross join
    * and NEVER shuffles. Output: (id, anon_lang, anon_source, level) —
    * drop level-3 rows, then aggregate on (anon_lang, anon_source)
    * downstream.
    */
  def kanonGeneralize(df: DataFrame, idCol: String, langCol: String,
                      sourceCol: String, k: Long): DataFrame = {
    require(k >= 1, s"kanonGeneralize: k must be >= 1, got $k")
    val l0 = df.groupBy(col(langCol), col(sourceCol))
      .agg(count(lit(1)).as("_n0"))
    // per-language residual: the rows that will actually land in the
    // (lang, *) cell — only level-0 failures
    val r1 = l0.filter(col("_n0") < k)
      .groupBy(col(langCol)).agg(sum(col("_n0")).as("_r1"))
    // global residual: the rows that fail both finer levels
    val r2 = r1.filter(col("_r1") < k)
      .agg(coalesce(sum(col("_r1")), lit(0L)).cast("long").as("_r2"))
    df.join(broadcast(l0), Seq(langCol, sourceCol))
      .join(broadcast(r1), Seq(langCol), "left")
      .crossJoin(broadcast(r2))
      .withColumn("level",
        when(col("_n0") >= k, lit(0))
          .when(coalesce(col("_r1"), lit(0L)) >= k, lit(1))
          .when(col("_r2") >= k, lit(2))
          .otherwise(lit(3)))
      .select(col(idCol),
        when(col("level") <= 1, col(langCol))
          .when(col("level") === 2, lit("*"))
          .otherwise(lit(null).cast("string")).as("anon_lang"),
        when(col("level") === 0, col(sourceCol))
          .when(col("level") <= 2, lit("*"))
          .otherwise(lit(null).cast("string")).as("anon_source"),
        col("level"))
  }

  /** C117 — ε-differentially-private count release: the per-cell doc
    * counts a dataset card may publish about SENSITIVE groupings where
    * k-anonymity (C106) is not enough — DP bounds what any one
    * document's presence can change about the release, generalization
    * does not. Mechanism: the two-sided geometric (discrete Laplace,
    * Ghosh–Roughgarden–Sundararajan SIAM'12 — the canonical mechanism
    * for integer counts at sensitivity 1), truncated at ±`bound`
    * (documented caveat: truncation costs δ = α^bound/(1+α) ≈ e^{-ε·B}
    * per tail — 4·10⁻¹⁸ at the demo's ε=1, B=40), with max(0, ·)
    * post-processing (free under DP).
    *
    * DETERMINISM: DP theory wants fresh randomness; a REPRODUCIBLE
    * release (re-runs must publish identical numbers, or the variance
    * between runs itself leaks) derives the noise from a seeded hash
    * of the CELL KEY — one draw per cell, fixed per (key, seed), the
    * standard reproducible-release compromise. The geometric inverse
    * CDF needs exp/log, which is a cross-engine libm seam — so the
    * CDF is computed ONCE driver-side and embedded as EXACT Long
    * thresholds scaled to 2^60 ([[geometricThresholds]], shared
    * verbatim with the DuckDB oracle): noise = (# thresholds ≤ u) −
    * bound where u is the cell's md5-60 uniform. Pure integer
    * compares per row; bit-identical on any engine.
    *
    * Scale shape: one map-side-combined count per cell
    * (quasi-identifier-cardinality output), then map-only literal-array
    * arithmetic over that TINY table. Output: (lang, source,
    * n_released). The TRUE count never leaves the plan. */
  def dpRelease(df: DataFrame, langCol: String, sourceCol: String,
                epsilon: Double, bound: Int, seed: Long): DataFrame = {
    val thresholds = geometricThresholds(epsilon, bound)
    val u = graft.functions.Vec.md5Hash60(concat(
      col(langCol), lit("#"), col(sourceCol), lit("#" + seed)))
    val tArr = array(thresholds.map(lit): _*)
    df.groupBy(col(langCol), col(sourceCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_u", u)
      .withColumn("_noise",
        size(filter(tArr, t => t <= col("_u"))).cast("long") - bound.toLong)
      .select(col(langCol), col(sourceCol),
        greatest(lit(0L), col("_n") + col("_noise")).as("n_released"))
  }

  /** cumulative CDF of the ±`bound`-truncated two-sided geometric with
    * α = e^{-ε}, as exact Long thresholds scaled to 2^60 for
    * k = −B … B−1 (the final cumulative is omitted so the top
    * interval [t_{B−1}, 2^60) is open-ended): noise = (# thresholds
    * ≤ u) − B maps every u ∈ [0, 2^60) to exactly one k ∈ [−B, B].
    * Computed once driver-side (the libm calls live HERE, in
    * constants both engines share verbatim — never per-row). */
  private[graft] def geometricThresholds(epsilon: Double, bound: Int): Seq[Long] = {
    require(epsilon > 0 && bound >= 1,
      s"dpRelease: epsilon > 0 and bound >= 1 required, got ($epsilon, $bound)")
    val a = math.exp(-epsilon)
    // unnormalized mass of k is a^|k|; total over [-B, B] is
    // 1 + 2·(a + … + a^B)
    val weights = (-bound to bound).map(k => math.pow(a, math.abs(k)))
    val total = weights.sum
    val scale = math.pow(2.0, 60)
    weights.scanLeft(0.0)(_ + _).tail.init.map { cum =>
      math.floor(cum / total * scale).toLong
    }
  }

  /** C107 — join-key skew diagnosis: the pre-flight report an engineer
    * reads before keying a 100 TB shuffle on a column. For the top-N
    * heaviest keys: row count, share of the table, skew ratio vs the
    * mean key (count · distinct_keys / total), and whether the key
    * overflows a fair partition badly enough that [[SkewJoin]] salting
    * is recommended (count · partitions > saltFactor · total — i.e. one
    * key alone carries more than saltFactor× an average partition's
    * rows, so that partition straggles the stage no matter how many
    * executors exist).
    *
    * Scale shape: one groupBy(key) count with map-side partials (the
    * aggregate is distinct-key-scale), a three-number global summary
    * broadcast back, and a TakeOrdered(n) for the hitters — the table
    * itself is scanned once. The salt decision is exact integer
    * algebra (no fp thresholds); the skew RATIO multiplies in double —
    * cnt · distinct_keys overflows Long at exactly the hot-key ×
    * billion-key scale this report exists for. Output ordered by
    * (cnt desc, key).
    */
  def skewDiagnose(df: DataFrame, keyCol: String, topN: Int = 10,
                   partitions: Int = 32, saltFactor: Int = 4): DataFrame = {
    require(topN >= 1 && partitions >= 1 && saltFactor >= 1,
      s"skewDiagnose: topN/partitions/saltFactor must be >= 1")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("_total"),
      count(lit(1)).as("_nkeys"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share",
        round(col("cnt").cast("double") / col("_total"), 6))
      .withColumn("skew_ratio",
        round(col("cnt").cast("double") * col("_nkeys").cast("double") /
          col("_total").cast("double"), 6))
      .withColumn("salt_recommended",
        col("cnt") * partitions > col("_total") * saltFactor)
      .select(col("key"), col("cnt"), col("share"), col("skew_ratio"),
        col("salt_recommended"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }
}
