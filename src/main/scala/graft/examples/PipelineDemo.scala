package graft.examples

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.io.WrappedExport
import graft.operators.{Dedup, MergeOps}
import graft.sources.Tables
import graft.util.RateLimited

/** End-to-end sample of the library surface: the reference pipeline's
  * shape (ingest -> clean -> dedup -> merge -> validate -> publish)
  * over the test tables. Run:
  * `sbt "runMain graft.examples.PipelineDemo [sfDir] [outDir]"` */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse(Files.createTempDirectory("graft_demo").toString)
    val spark = GraftSession.local("graft-demo", "8", 8)

    // ingest + clean + dedup (first-wins per order) + per-customer merge
    val orders = Tables.orders(spark, dir).withColumn("is_open", col("o_orderstatus") === "O")
    val deduped = Dedup.firstPerKey(orders, Seq("o_orderkey"), Seq(col("o_orderdate")))
    val merged = MergeOps.mergeMax(
      deduped.filter(col("is_open")), deduped.filter(!col("is_open")),
      Seq("o_custkey"), Seq("o_totalprice"), Seq("is_open"))

    // rate-limited external-call stage shape (identity "service" here)
    val n = merged.mapPartitions(it =>
      RateLimited.mapRateLimited(it, minIntervalMs = 0)(identity)
    )(org.apache.spark.sql.Encoders.row(merged.schema)).count()

    // publish: wrapped JSON per open/closed cohort + snapshot
    val cohorts = merged.withColumn("cohort",
      when(col("any_is_open"), "open").otherwise("closed"))
    WrappedExport.wrappedJson(cohorts, "cohort", s"$out/wrapped")
    WrappedExport.snapshot(merged, s"$out/publish", "demo_ts")

    val back = spark.read.json(s"$out/wrapped")
    println(s"[demo] merged customers: $n")
    back.select(col("cohort"), col("total")).orderBy("cohort").collect()
      .foreach(r => println(s"[demo] cohort=${r.getString(0)} total=${r.getLong(1)}"))
    println(s"[demo] snapshot current rows: ${spark.read.parquet(s"$out/publish/current").count()}")
    println(s"[demo] output at $out")
    spark.stop()
  }
}
