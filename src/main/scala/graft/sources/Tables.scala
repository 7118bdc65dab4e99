package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the TPC-H-ish test tables.
  *
  * Parquet scans are already column-pruned and filter-pushed by Catalyst;
  * loaders stay thin on purpose — declare the read, let the optimizer
  * prune. `events.ts` is stored as parquet TIMESTAMP(NANOS) which Spark
  * reads as long (see GraftSession nanosAsLong); [[events]] converts it
  * to a microsecond timestamp column deterministically.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** events with `ts` as a proper (microsecond, session-tz) timestamp.
    *
    * The generated parquet has shipped `ts` in two encodings across
    * testdata revisions: TIMESTAMP(NANOS) (read as long under
    * nanosAsLong) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ under Spark 4's NTZ inference). Normalize both to
    * TimestampType so downstream `unix_micros`/window/watermark code
    * sees one type. Session tz is pinned to UTC, so the NTZ cast is
    * deterministic and matches DuckDB's naive-timestamp reading.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType.typeName match {
      case "long" | "bigint" =>
        // integer-divide nanos -> micros (double division would lose
        // precision past 2^53), matching DuckDB's truncating ns->us read
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
