package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * [[firstPerKey]] re-expresses the reference's first-wins map dedup
  * (uniqByKey, index.js:89-98) as a window row_number — one shuffle on
  * the key, partition-local sort, no driver state.
  *
  * [[exactByHash]] is the 100 TB-scale form: group on a 128-bit hash of
  * the dedup key so the shuffle carries 16 bytes per row instead of the
  * full payload; survivors rejoin their payload by key.
  */
object Dedup {

  /** Keep the first row per key under a deterministic order. */
  def firstPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact dedup of `textCol`: one representative (min of `idCol`) per
    * distinct md5. Only (hash, id) pairs shuffle. */
  def exactByHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
