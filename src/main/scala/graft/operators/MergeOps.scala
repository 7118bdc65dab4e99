package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's merge family, as distributed group-by/join plans.
  *
  * - [[mergeMax]]: union two row sets, group by a composite key, take
  *   per-column max / boolean OR (mergeYesNo, index.js:65-86). A single
  *   shuffle on the key; partial aggregation combines map-side.
  * - [[diffMergeCarry]]: incremental snapshot merge — match today's rows
  *   against the previous snapshot by a priority list of keys and carry
  *   columns forward; unmatched rows form the (small) delta that needs
  *   recomputation (geocode-diff-merge.js:65-160). Joins are plain
  *   equi-joins so Catalyst broadcasts the snapshot index when small and
  *   sort-merge-joins when not.
  * - [[fallbackResolve]]: multi-level lookup ladder — exact key, then
  *   group-level aggregate, then global aggregate; first level that
  *   resolves wins (geocode.js resolveOneRow, 472-514).
  */
object MergeOps {

  /** Union + group-by + max/or merge. `maxCols` take `max`, `orCols`
    * boolean OR; `countAlias` adds a group count. */
  def mergeMax(a: DataFrame, b: DataFrame, keyCols: Seq[String],
               maxCols: Seq[String], orCols: Seq[String],
               countAlias: String = "n_rows"): DataFrame = {
    val aggs =
      maxCols.map(c => max(col(c)).as(s"max_$c")) ++
      orCols.map(c => bool_or(col(c)).as(s"any_$c")) :+
      count(lit(1)).as(countAlias)
    a.unionByName(b).groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Carry `carryCols` from `prev` onto `today` matching by the first
    * key that hits, in order of `keyPriority` (today-col -> prev-col).
    * Adds `matched_by` (key name or null) and `needs_recompute`. */
  def diffMergeCarry(today: DataFrame, prev: DataFrame,
                     keyPriority: Seq[(String, String)],
                     carryCols: Seq[String]): DataFrame = {
    // one left join per priority level, highest first; coalesce results
    val joined = keyPriority.zipWithIndex.foldLeft(today) {
      case (acc, ((todayKey, prevKey), i)) =>
        val level = prev
          .groupBy(col(prevKey).as(s"_k$i"))
          .agg(carryCols.map(c => min(col(c)).as(s"_l${i}_$c")).head,
               carryCols.map(c => min(col(c)).as(s"_l${i}_$c")).tail: _*)
        acc.join(level, acc(todayKey) === level(s"_k$i"), "left")
    }
    val carried = carryCols.map { c =>
      coalesce(keyPriority.indices.map(i => col(s"_l${i}_$c")): _*).as(c)
    }
    val matchedBy = keyPriority.zipWithIndex.foldRight(lit(null).cast("string")) {
      case (((todayKey, _), i), els) =>
        when(col(s"_l${i}_${carryCols.head}").isNotNull, lit(todayKey)).otherwise(els)
    }.as("matched_by")
    joined.select(today.columns.map(col).toSeq ++ carried :+ matchedBy: _*)
      .withColumn("needs_recompute", col(carryCols.head).isNull)
  }

  /** Fold a change log into SCD2 (slowly-changing-dimension type 2)
    * history: one row per (key, attribute-state) interval with
    * `valid_from`/`valid_to`/`is_current`. The relational form of the
    * reference's dated-snapshot lineage (entrypoint.sh keeps every
    * day's state; SCD2 is the warehouse-native equivalent — interval
    * rows instead of full copies).
    *
    * One shuffle on the key: a lag window collapses consecutive rows
    * with unchanged attributes (null-safe struct compare), a lead
    * window closes each interval with the next change's timestamp.
    * The open interval (`valid_to` null) is the current state.
    * Duplicate (key, ts) rows make interval order ambiguous — dedupe
    * upstream (e.g. groupBy key+ts) for deterministic history. */
  def scd2(changelog: DataFrame, keyCols: Seq[String], tsCol: String,
           attrCols: Seq[String]): DataFrame = {
    val attrs = struct(attrCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val changes = changelog
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(col("_prev").isNull || !(col("_prev") <=> attrs))
      .select(keyCols.map(col) ++ attrCols.map(col) :+
        col(tsCol).as("valid_from"): _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("valid_from"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Resolve `valueCol` for every row of `facts` through a ladder:
    * exact match in `known` on `factKey`==`knownKey`, else group average
    * over `groupCol`, else global average. Adds `resolved` + `resolution`. */
  def fallbackResolve(facts: DataFrame, known: DataFrame,
                      factKey: String, knownKey: String,
                      groupCol: String, valueCol: String): DataFrame = {
    import graft.functions.Agg.davg
    val exact = known.select(col(knownKey).as("_ek"), col(valueCol).as("_exact"))
    val grp = known.groupBy(col(groupCol).as("_gk")).agg(davg(col(valueCol)).as("_grp"))
    val glob = known.agg(davg(col(valueCol)).as("_glob"))
    facts
      .join(exact, col(factKey) === col("_ek"), "left")
      .join(broadcast(grp), col(groupCol) === col("_gk"), "left")
      .crossJoin(broadcast(glob))
      .withColumn("resolved", coalesce(col("_exact"), col("_grp"), col("_glob")))
      .withColumn("resolution",
        when(col("_exact").isNotNull, "exact")
          .when(col("_grp").isNotNull, "group")
          .otherwise("global"))
      .drop("_ek", "_exact", "_gk", "_grp", "_glob")
  }
}
