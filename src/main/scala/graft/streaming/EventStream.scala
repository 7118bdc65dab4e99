package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch operators (SURVEY §2 D).
  *
  * The same logical transforms as Analytics.timeWindowAgg / Dedup, but
  * over an unbounded source: event-time tumbling windows bounded by a
  * watermark (late data past the watermark is dropped and window state
  * is reclaimed — mandatory for unbounded state at scale), and
  * streaming dedup whose key state also expires with the watermark.
  *
  * Sources/sinks are the caller's choice (`readStream` Kafka/files →
  * these transforms → `writeStream`); tests drive them with
  * MemoryStream + append/update sinks.
  */
object EventStream {

  /** D1: watermarked tumbling-window aggregation. Input needs an
    * event-time `ts` column and an `event_type`/`value` pair. */
  def windowAgg(events: DataFrame,
                watermark: String = "30 minutes",
                windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** D2: streaming dedup with watermark-bounded key state. */
  def dedupWithinWatermark(events: DataFrame, idCol: String,
                           watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)
}
