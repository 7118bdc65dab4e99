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
    * FINEST quasi-identifier level whose group still holds at least `k`
    * rows — the gate a dataset card or stats release runs so no
    * published cell isolates fewer than k documents (a (lang, source)
    * cell of size 2 identifies its members; the same rows reported
    * under (lang, *) may not). Ladder: level 0 = (lang, source),
    * level 1 = (lang, *), level 2 = (*, *) — level 2 always admits
    * (the whole corpus), so every row gets a key and nothing is
    * silently suppressed.
    *
    * Scale shape: the level-0 and level-1 group-count tables are
    * quasi-identifier-cardinality (thousands of cells, not rows) — both
    * broadcast; the fact side takes two broadcast hash joins and NEVER
    * shuffles. Group counts are one pass with map-side partials.
    * Output: (id, anon_lang, anon_source, level) — aggregate on
    * (anon_lang, anon_source) downstream and every published cell is
    * ≥ k by construction.
    */
  def kanonGeneralize(df: DataFrame, idCol: String, langCol: String,
                      sourceCol: String, k: Long): DataFrame = {
    require(k >= 1, s"kanonGeneralize: k must be >= 1, got $k")
    val l0 = df.groupBy(col(langCol), col(sourceCol))
      .agg(count(lit(1)).as("_n0"))
    val l1 = df.groupBy(col(langCol)).agg(count(lit(1)).as("_n1"))
    df.join(broadcast(l0), Seq(langCol, sourceCol))
      .join(broadcast(l1), Seq(langCol))
      .withColumn("level",
        when(col("_n0") >= k, lit(0))
          .when(col("_n1") >= k, lit(1))
          .otherwise(lit(2)))
      .select(col(idCol),
        when(col("level") <= 1, col(langCol)).otherwise(lit("*"))
          .as("anon_lang"),
        when(col("level") === 0, col(sourceCol)).otherwise(lit("*"))
          .as("anon_source"),
        col("level"))
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
    * algebra (no fp thresholds). Output ordered by (cnt desc, key).
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
        round((col("cnt") * col("_nkeys")).cast("double") / col("_total"), 6))
      .withColumn("salt_recommended",
        col("cnt") * partitions > col("_total") * saltFactor)
      .select(col("key"), col("cnt"), col("share"), col("skew_ratio"),
        col("salt_recommended"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }
}
