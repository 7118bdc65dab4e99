package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Dataset splitting and sampling for training pipelines (SURVEY §2 C).
  *
  * [[hashSplit]] assigns rows to named splits by hashing a stable key —
  * fully deterministic (re-runs, retries and different partitionings
  * all agree), the property random() sampling lacks and exactly how
  * production corpora pin their train/val/test membership.
  *
  * [[stratified]] wraps per-stratum Bernoulli sampling (seeded) for
  * data mixing; proportions are approximate by nature.
  */
object Sampling {

  /** split assignment from percentage cut points, e.g.
    * Seq("train" -> 80, "val" -> 10, "test" -> 10). Buckets come from
    * `hash(key) mod 100`; the hash is pluggable (engine-portable md5-60
    * by default so an external system can reproduce membership). */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Int)],
                hash: Column => Column = Vec.md5Hash60): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val bucket = pmod(hash(col(keyCol).cast("string")), lit(100))
    val cuts = splits.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    val assign = splits.zip(cuts).foldRight(lit(null).cast("string")) {
      case (((name, _), cut), els) => when(bucket < cut, lit(name)).otherwise(els)
    }
    df.withColumn("split", assign)
  }

  /** seeded per-stratum sampling (approximate fractions). */
  def stratified(df: DataFrame, strataCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
