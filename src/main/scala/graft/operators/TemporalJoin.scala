package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joins Spark has no native operator for (SURVEY §2 B14/B15).
  *
  * [[asofLastBefore]] — for each left row, the latest right row of the
  * same key with rightTime <= leftTime. Implemented with the union +
  * ordered-window trick: tag sides, union, one window per key carries
  * the last-seen right payload forward (`last(..., ignoreNulls)`), keep
  * left rows. One shuffle on the key, no range cross product — the
  * scalable form; a naive join-then-filter is O(n·m) per key.
  *
  * [[rangeBinned]] — point-in-interval join via binning: intervals
  * explode into the fixed-width bins they cover, points compute their
  * bin, bins equi-join (hash, not nested-loop), then the exact predicate
  * filters. Worst-case work is |intervals| * (span/binWidth) + matches —
  * the standard scalable range join (cf. VLDB'22 "A Scalable and
  * Generic Approach to Range Joins"); Spark's built-in planner would
  * fall back to BroadcastNestedLoop for the same query.
  */
object TemporalJoin {

  /** As-of join: left enriched with the latest prior right payload.
    * `payload` columns are taken from `right`; output = left columns +
    * payload columns (null when no prior right row exists). */
  def asofLastBefore(left: DataFrame, right: DataFrame,
                     keyCols: Seq[String], leftTime: String, rightTime: String,
                     payload: Seq[String]): DataFrame = {
    val leftOther = left.columns.toSeq.filterNot(keyCols.contains)
    val payType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(nullable = true)))
    // the whole payload tuple rides in ONE struct: right rows always
    // carry a non-null struct (even when every field inside is null),
    // so `last(..., ignoreNulls)` picks the winning right ROW and
    // returns its fields as-is — a null payload value on the winning
    // row stays null instead of back-filling from an older row
    // (matching asofBroadcast, which returns the winning tuple).
    val leftTagged = left.select(
      (keyCols.map(col) ++ leftOther.map(col) ++
        Seq(lit(null).cast(payType).as("_pay"),
          col(leftTime).as("_t"), lit(1).as("_side"))): _*)
    val rightTagged = right.select(
      (keyCols.map(col) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col): _*).as("_pay"),
          col(rightTime).as("_t"), lit(0).as("_side"))): _*)
    // right rows sort before left rows at equal time: an exactly-
    // simultaneous right row is visible to the left row (ASOF >= tie
    // rule). The payload struct is the final orderBy key so duplicate
    // (key, time) right rows carry a deterministic winner — the
    // greatest payload tuple (struct ordering = lexicographic by
    // field, nulls first) — matching asofBroadcast's index sort.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("_pay"), ignoreNulls = true).over(w)
    val payCols = payload.map(c => col("_carried").getField(c).as(c))
    leftTagged.unionByName(rightTagged)
      .select((keyCols.map(col) ++ leftOther.map(col) ++
        Seq(carried.as("_carried"), col("_side"))): _*)
      .filter(col("_side") === 1)
      .select((keyCols.map(col) ++ leftOther.map(col) ++ payCols): _*)
  }

  /** As-of join for a dimension-sized right side: zero shuffle of the
    * left (fact) side — the custom physical operator broadcasts the
    * per-key time-sorted right table and binary-searches per row
    * (graft.plans.BroadcastAsofJoin; strategy registered by
    * GraftExtensions). Same semantics as [[asofLastBefore]]. */
  def asofBroadcast(left: DataFrame, right: DataFrame,
                    keyCols: Seq[String], leftTime: String, rightTime: String,
                    payload: Seq[String]): DataFrame =
    org.apache.spark.sql.GraftDataset.ofPlan(left.sparkSession,
      graft.plans.BroadcastAsofJoin(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        keyCols, leftTime, rightTime, payload))

  /** Binned range join: rows of `points` matched to rows of `intervals`
    * where pointCol in [loCol, hiCol]. */
  def rangeBinned(points: DataFrame, intervals: DataFrame,
                  pointCol: String, loCol: String, hiCol: String,
                  binWidth: Double): DataFrame = {
    val binnedIntervals = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val binnedPoints = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    binnedPoints.join(binnedIntervals, "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
