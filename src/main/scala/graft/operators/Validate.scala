package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates from the reference's publish step.
  *
  * - [[constraintReport]]: declarative constraint checks -> one row per
  *   rule with its violation count (the ajv/schema.clinic.json gate).
  *   Single pass over the data; each rule is a map-side CASE sum.
  * - [[checkTotals]]: declared-total vs recount consistency
  *   (scripts/check-total.js) as a group-by compare.
  */
object Validate {

  /** rules: (ruleName, violationPredicate). Returns (rule, violations). */
  def constraintReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) => s"'$name', `$name`" }.mkString(", ")
    wide.selectExpr(s"stack(${rules.size}, $stackArgs) as (rule, violations)")
      .orderBy("rule")
  }

  /** Compare a declared total column against the actual group count.
    * Returns only inconsistent groups with the diff. */
  def checkTotals(df: DataFrame, groupCol: String, declaredCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("actual_total"), max(col(declaredCol)).as("declared_total"))
      .filter(col("actual_total") =!= col("declared_total"))
      .withColumn("diff", col("declared_total") - col("actual_total"))
      .orderBy(col(groupCol))

  /** check-total.js `--fix` mode (scripts/check-total.js:29-85): rewrite
    * the declared total to the recount wherever they disagree (or where
    * no total was declared), instead of only reporting. Returns the
    * frame with `declaredCol` corrected and a `was_fixed` audit flag —
    * the relational form of the reference's rewrite-the-JSON-file fix.
    * One shuffle on the group key; the recount broadcasts back via the
    * window, so no second pass over the data. */
  def fixTotals(df: DataFrame, groupCol: String, declaredCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.withColumn("_actual", count(lit(1)).over(w))
      .withColumn("was_fixed",
        col(declaredCol).isNull || col(declaredCol) =!= col("_actual"))
      .withColumn(declaredCol,
        when(col("was_fixed"), col("_actual")).otherwise(col(declaredCol)))
      .drop("_actual")
  }
}
