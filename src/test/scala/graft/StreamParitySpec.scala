package graft

import graft.streaming.StreamParity
import graft.operators.{Analytics, RefDemos, TextDemos}

/** D-series stream-batch parity (SURVEY §2 D1/D5/D6): the finite
  * replay of each streaming pipeline must produce VALUE-IDENTICAL
  * output to its batch twin — the same check the driver runs against
  * the DuckDB oracle at sf0.01, here asserted in-JVM at sf0.001 so
  * `sbt test` catches a drift without the driver. */
class StreamParitySpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("D1 parity: streamed window agg state equals batch time_window_agg") {
    val streamed = rows(StreamParity.streamWindowParity(spark, sfDir))
    val batch = rows(Analytics.timeWindowAgg(spark, sfDir))
    assert(streamed.nonEmpty && streamed == batch,
      s"stream=${streamed.take(3)}... batch=${batch.take(3)}...")
  }

  test("D5 parity: upsert sink's final snapshot renders A12's wrapped export") {
    val streamed = rows(StreamParity.streamUpsertParity(spark, sfDir))
    val batch = rows(RefDemos.wrappedExport(spark, sfDir))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("D6 parity: streamed+compacted dedup pair set equals batch minhash LSH") {
    val streamed = rows(StreamParity.streamDedupParity(spark, sfDir))
    val batch = rows(TextDemos.dedupMinhashLsh(spark, sfDir))
    graft.util.CacheRegistry.releaseAll()
    assert(streamed.nonEmpty && streamed == batch)
  }
}
