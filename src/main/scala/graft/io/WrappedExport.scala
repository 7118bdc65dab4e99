package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference's publish layer (SURVEY §2 A12), Spark-native.
  *
  * The reference writes, per county, a wrapped JSON `{county, total,
  * rows}` plus a quoted CSV, then a national union, then dated snapshots
  * and a "current" pointer (index.js:319-356, entrypoint.sh). Here:
  *
  * - [[wrappedJson]] builds the wrapped object per group with a single
  *   shuffle (groupBy + collect_list) and writes one JSON line per
  *   group. collect_list assumes bounded group size (counties, tenants
  *   — NOT unbounded keys); for unbounded groups use [[partitionedCsv]]
  *   which streams rows under a partition directory instead.
  * - [[partitionedCsv]] writes `group=<g>/part-*.csv` with headers and
  *   full quoting — the distributed analog of per-county CSV files.
  * - [[snapshot]] writes an immutable dated copy plus re-points
  *   "current" (overwrite) — the GCS snapshot/current layout.
  */
object WrappedExport {

  /** one JSON object per group: {<groupCol>, total, rows:[...]} */
  def wrappedJson(df: DataFrame, groupCol: String, outPath: String): Unit =
    wrappedFrame(df, groupCol)
      .write.mode(SaveMode.Overwrite).json(outPath)

  /** the wrapped frame itself (exposed for tests / further transforms) */
  def wrappedFrame(df: DataFrame, groupCol: String): DataFrame = {
    val payload = struct(df.columns.filterNot(_ == groupCol).map(col): _*)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("total"), collect_list(payload).as("rows"))
  }

  /** header'd, quoted CSV partitioned by group (scales to any group count) */
  def partitionedCsv(df: DataFrame, groupCol: String, outPath: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(groupCol)
      .option("header", "true")
      .option("quoteAll", "true")
      .csv(outPath)

  /** dated immutable snapshot + overwritten "current" pointer. The
    * timestamp is supplied by the caller (determinism / testability).
    * `retain` bounds the snapshot count: after the new snapshot lands,
    * only the lexicographically-newest N dated dirs are kept (dated
    * stamps sort chronologically when zero-padded — the caller's
    * format discipline) — the same growth bound the streaming sinks
    * got, since a daily publish otherwise accumulates one dir per day
    * forever. Minimum 1: "current" duplicates the newest snapshot, but
    * the snapshot dir is the immutable record. */
  def snapshot(df: DataFrame, baseDir: String, ts: String,
               retain: Int = Int.MaxValue): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    df.write.mode(SaveMode.ErrorIfExists)
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
      .parquet(s"$baseDir/snapshots/$ts")
    df.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/current")
    if (retain != Int.MaxValue) {
      val root = new org.apache.hadoop.fs.Path(s"$baseDir/snapshots")
      val fs = root.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      // only COMMITTED snapshots count toward (and are eligible for)
      // retention: a crashed partial dir must neither occupy a slot —
      // which would push a good snapshot out — nor be deleted here
      // (it is crash debris for the operator to inspect, not ours)
      fs.listStatus(root).map(_.getPath.getName)
        .filter(n => fs.exists(
          new org.apache.hadoop.fs.Path(s"$baseDir/snapshots/$n/_SUCCESS")))
        .sorted.dropRight(retain)
        .foreach(n => fs.delete(
          new org.apache.hadoop.fs.Path(s"$baseDir/snapshots/$n"), true))
    }
  }

  /** downloadOrEmpty (gcs-io.js:10-21): read the previous snapshot,
    * tolerating absence — the first run of an incremental pipeline has
    * no prior state, and the carry-forward join (MergeOps
    * .diffMergeCarry) must see an empty frame with the right schema
    * rather than an AnalysisException. Uses the Hadoop FS API, so it
    * works against any configured object store, not just local disk. */
  def readSnapshotOrEmpty(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
