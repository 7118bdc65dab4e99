package graft.examples

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Text
import graft.io.Layout
import graft.operators.{Dedup, Filtering, Packing, Sampling, TextDemos}
import graft.sources.Tables

/** End-to-end sample of the TRAINING-DATA surface: the cleaning ladder
  * every web-scale corpus walks — language ID → quality/length gates →
  * cross-doc boilerplate scrub → exact + near-dup removal → leakage
  * check → split → pack — composed from the §2C operators over the
  * test corpus. Every stage is the scale-shaped form (hash-groupBy
  * dedup, banded LSH, deterministic splits); swap the toy thresholds
  * for production ones and the same plan runs on the real corpus. Run:
  * `sbt "runMain graft.examples.LlmPipelineDemo [sfDir] [outDir]"` */
object LlmPipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse(Files.createTempDirectory("graft_llm").toString)
    val spark = GraftSession.local("graft-llm-demo", "8", 8)
    def stage(name: String, n: Long): Long = { println(f"[llm-demo] $name%-28s $n%6d docs"); n }

    val docs = Tables.documents(spark, dir)
    stage("ingested", docs.count())

    // language + quality + length gates (in-row, no shuffle): docs with
    // no identifiable language ("und") drop here, like low-quality ones
    val (pred, _) = Text.langId(col("text"))
    val gated = docs
      .withColumn("lang_pred", pred)
      .withColumn("quality", Text.qualityScore(col("text")))
      .filter(col("lang_pred") =!= "und" && col("quality") > 0.3)
    val bounded = Filtering.quantileOutliers(
        gated.withColumn("n_tokens", Text.tokenCount(col("text"))),
        "n_tokens", loQ = 0.02, hiQ = 0.98)
      .filter(!col("is_outlier"))
      .select(col("doc_id"), col("text"))
    stage("lang+quality+length gated", bounded.count())

    // cross-doc boilerplate scrub, then exact dedup on the scrubbed text
    val scrubbed = Dedup.chunkDedup(bounded, "doc_id", "text",
        chunkTokens = 8, maxDocs = 3)
      .filter(col("clean_text") =!= "")
    val keep = Dedup.exactByHash(scrubbed, "doc_id", "clean_text")
      .select(col("keep_id").as("doc_id"))
    val exact = scrubbed.join(keep, "doc_id")
    stage("boilerplate+exact dedup", exact.count())

    // near-dup clusters -> keep each cluster's canonical (min id) doc
    val pairs = Dedup.minhashLsh(exact, "doc_id", "clean_text", minEstSim = 0.5)
    val clusters = Dedup.connectedComponents(exact, pairs, "doc_id")
    val canonical = exact.join(
      clusters.filter(col("doc_id") === col("cluster")).select("doc_id"), "doc_id")
    stage("near-dup canonical", canonical.count())

    // benchmark-leakage check (every 25th doc stands in for the eval
    // set). Drop only POSITIVELY flagged non-benchmark docs via
    // anti-join: a doc too short to shingle has no contamination row
    // at all, and must survive, not silently vanish.
    val flagged = Dedup.contaminationCheck(canonical,
        canonical.filter(col("doc_id") % 25 === 0), "doc_id", "clean_text")
      .filter(col("flagged") && col("doc_id") % 25 =!= 0)
    val clean = canonical.join(flagged.select("doc_id"), Seq("doc_id"), "left_anti")
    stage("decontaminated", clean.count())

    // deterministic split + pack + sorted layout
    val split = Sampling.hashSplit(clean, "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val packed = Packing.sequencePack(
      split.withColumn("toks", Text.tokenCount(col("clean_text"))),
      "split", "doc_id", "toks", capacity = 2048)
    Layout.writeSorted(packed, Seq("split", "first_chunk"), nFiles = 4,
      outPath = s"$out/packed")

    val back = spark.read.parquet(s"$out/packed")
    back.groupBy("split").agg(count(lit(1)).as("docs"),
        (max(col("last_chunk")) + 1).as("chunks"))
      .orderBy("split").collect()
      .foreach(r => println(f"[llm-demo] split=${r.getString(0)}%-6s docs=${r.getLong(1)}%5d chunks=${r.getLong(2)}%4d"))
    println(s"[llm-demo] packed corpus at $out/packed")
    spark.stop()
  }
}
