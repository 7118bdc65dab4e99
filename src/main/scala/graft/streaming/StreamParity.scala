package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables
import graft.util.Fixtures

/** Driver-checkable stream-batch parity (SURVEY §2 D).
  *
  * The six streaming components were spec-gated only: no CORRECTNESS
  * row proved a streaming plan's OUTPUT. These three demos close that
  * tier for the components with batch twins — each replays a test
  * table through the REAL streaming pipeline as a finite stream
  * (file source staged as N parquet files, `maxFilesPerTrigger`
  * micro-batching, `Trigger.AvailableNow`), then returns the final
  * sink state as a DataFrame, value-checked by the driver against the
  * batch twin's DuckDB oracle:
  *
  *  - [[streamWindowParity]]  D1 windowAgg          ↔ B7 time_window_agg
  *  - [[streamUpsertParity]]  D5 upsertBatch sink   ↔ A12 wrapped_export
  *  - [[streamDedupParity]]   D6 minhashDedupBatch  ↔ C2 dedup_minhash_lsh
  *
  * This is exactly the daily batch loop the streams replace
  * (reference entrypoint.sh:1-62) run as one bounded stream: if the
  * incremental path and the from-scratch batch disagree anywhere, the
  * hash gate catches it.
  *
  * Scale note: the parity HARNESS is finite-replay machinery; the
  * operators under test are the production ones. The D1 check reads
  * final state through a complete-mode memory sink (bounded: one row
  * per (hour, event_type)); production D1 stays append-mode with
  * watermark eviction. Replay determinism does not depend on how the
  * engine splits files into micro-batches: windowed aggregation and
  * the upsert merge are order-free, and the dedup pair set is
  * partition-invariant (every unordered pair surfaces in exactly one
  * batch — both docs' batch, or the later doc's batch vs the index).
  */
object StreamParity {

  private def sfName(dir: String) = new java.io.File(dir).getName

  /** Stage a batch table as `nFiles` parquet files (run-scoped fixture,
    * written once per run) and open it as a file-source stream reading
    * `filesPerTrigger` files per micro-batch — the finite replay of an
    * unbounded ingest. */
  private def fileStream(df: DataFrame, key: String, nFiles: Int,
                         filesPerTrigger: Int): DataFrame = {
    val dir = Fixtures.dir(key)
    val input = s"$dir/input"
    Fixtures.buildOnce(dir)(
      df.repartition(nFiles).write.mode("overwrite").parquet(input))
    df.sparkSession.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(input)
  }

  /** D1 ↔ B7: the events table streamed through [[EventStream.windowAgg]]
    * (the production transform, hour windows), final state read via a
    * complete-mode memory sink. `value` pre-casts to decimal so the
    * incremental sum is order-exact against the oracle's decimal sum;
    * the watermark is set past the replay horizon — the parity question
    * is "same answer on the same data", so the late-data POLICY must
    * drop nothing (production keeps the 30-minute default). */
  def streamWindowParity(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir).select(
      col("ts"), col("event_type"),
      col("value").cast("decimal(18,4)").as("value"))
    val src = fileStream(events, s"swin_${sfName(dir)}", nFiles = 8, filesPerTrigger = 2)
    val view = s"graft_swin_${Fixtures.runId}"
    spark.catalog.dropTempView(view) // re-invocation reuses the name
    val q = EventStream.windowAgg(src, watermark = "3650 days")
      .writeStream.format("memory").queryName(view)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(view).select(
        col("window_start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value").cast("double").as("sum_value"))
      .orderBy("hour_start", "event_type")
  }

  /** D5 ↔ A12: orders streamed through an update-mode aggregate into
    * the [[EventStream.upsertBatch]] snapshot sink; the final committed
    * snapshot ([[EventStream.readLatestState]]) must render the exact
    * wrapped-export object A12 publishes — per-priority total plus the
    * sorted orderkey rows as JSON. Update mode re-emits each touched
    * key's FULL aggregate, which is precisely the upsert sink's
    * replace-by-key contract; a replayed epoch re-merges from the
    * previous snapshot, so the state is identical no matter how the
    * replay splits batches. */
  def streamUpsertParity(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"))
    val src = fileStream(orders, s"sups_${sfName(dir)}", nFiles = 8, filesPerTrigger = 2)
    val target = Fixtures.dir(s"sups_tgt_${sfName(dir)}").toString
    val q = src.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("total"),
        collect_list(struct(col("o_orderkey"))).as("rows"))
      .writeStream.outputMode("update")
      .foreachBatch(EventStream.upsertBatch(target, Seq("o_orderpriority")) _)
      // the checkpoint lives WITH the target, as in production: a
      // re-invocation resumes (no new files → no work) instead of
      // replaying epochs whose skip path would leave the agg's state
      // store uncommitted (Spark 4 validates commits per batch). The
      // crash-replay discipline itself is spec-gated in StreamingSpec.
      .option("checkpointLocation", s"$target/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    EventStream.readLatestState(spark, target)
      .select(col("o_orderpriority"), col("total"),
        to_json(array_sort(col("rows"))).as("rows_json"))
      .orderBy("o_orderpriority")
  }

  /** D6 ↔ C2: documents streamed through the
    * [[EventStream.minhashDedupBatch]] sink (oracle-portable md5-60
    * hash + string band keys, C2's exact config), one file per
    * micro-batch so the index check runs incrementally; then the
    * signature archive COMPACTS (crash-safe segment sweep) before the
    * accumulated pair set is read back — the near-dup pairs of the
    * streamed corpus must equal the from-scratch batch LSH, and
    * compaction must not change them. */
  def streamDedupParity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val src = fileStream(docs, s"sded_${sfName(dir)}", nFiles = 4, filesPerTrigger = 1)
    val target = Fixtures.dir(s"sded_tgt_${sfName(dir)}").toString
    val q = src.writeStream.outputMode("append")
      .foreachBatch(EventStream.minhashDedupBatch(target, "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
        tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = false) _)
      .option("checkpointLocation", s"$target/ckpt") // see streamUpsertParity
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    EventStream.compactSignatures(spark, target)
    EventStream.readAllPairs(spark, target)
      .orderBy("id_a", "id_b")
  }
}
