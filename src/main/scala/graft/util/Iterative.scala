package graft.util

import org.apache.spark.sql.SparkSession

/** Shared discipline for iterative driver loops (PageRank, label
  * propagation, connected components, logreg training): run the loop
  * body with AQE OFF and the shuffle-partition count matched to the
  * loop's working-set size.
  *
  * Why AQE off (guide §2.4): adaptive execution materializes every
  * exchange as its OWN scheduled job to re-plan downstream stages.
  * For a one-shot query that re-planning pays for itself; inside a
  * fixed-shape iteration it only multiplies the per-round job count —
  * measured on the C68 PageRank row: 58 jobs / 835 tasks for 6 rounds
  * under AQE vs ~2 jobs/round without (the round's plan never changes,
  * so there is nothing for AQE to learn after round 1). The classifier
  * gradient loop proved the pattern in r10; this utility applies it
  * uniformly.
  *
  * Why a derived partition count (guide §2.2): the loop's exchanges
  * carry node-scale (id, long) rows, far smaller than the session's
  * corpus-sized shuffle setting assumes. Partitions are sized from the
  * actual row count at `spark.graft.loop.rowsPerPartition` rows per
  * task (default 4M ≈ 64 MB of 16-byte rows, inside the guide's
  * 100 MB–1 GB band) — scale-adaptive by construction: a 500-node
  * fixture iterates in 1 partition, a 10¹⁰-node corpus in thousands,
  * with no constant tuned to either.
  *
  * SESSION-SCOPED, by construction: the overrides are visible to any
  * other query planned on the same SparkSession while the body runs —
  * fine for single-query drivers (Verify/Bench); a multi-tenant
  * service should isolate the loop on `spark.newSession()`. Both confs
  * restore on exit. */
object Iterative {

  val RowsPerPartitionKey = "spark.graft.loop.rowsPerPartition"
  val RowsPerPartitionDefault = 4000000L

  /** partition count for a loop whose per-round exchanges carry
    * ~`rows` rows: ceil(rows / rowsPerPartition), floor 1. */
  def partitionsFor(spark: SparkSession, rows: Long): Int = {
    val per = spark.conf.getOption(RowsPerPartitionKey)
      .map(_.toLong).getOrElse(RowsPerPartitionDefault).max(1L)
    (((rows.max(0L) + per - 1) / per).max(1L)).min(Int.MaxValue.toLong).toInt
  }

  /** run `body` with AQE off (one action = one scheduled job, not one
    * job per materialized stage) and `spark.sql.shuffle.partitions`
    * pinned to `npart`. Both confs restore on exit. */
  def withLoopConf[A](spark: SparkSession, npart: Int)(body: => A): A = {
    val aqeKey = "spark.sql.adaptive.enabled"
    val shufKey = "spark.sql.shuffle.partitions"
    val aqeWas = spark.conf.getOption(aqeKey)
    val shufWas = spark.conf.getOption(shufKey)
    spark.conf.set(aqeKey, "false")
    spark.conf.set(shufKey, npart.toString)
    try body
    finally {
      aqeWas.fold(spark.conf.unset(aqeKey))(spark.conf.set(aqeKey, _))
      shufWas.fold(spark.conf.unset(shufKey))(spark.conf.set(shufKey, _))
    }
  }
}
