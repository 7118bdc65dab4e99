package graft

import org.apache.spark.sql.functions._

import graft.operators.RefDemos
import graft.sources.{WarcDataSource, WarcIO}

/** C69 — WARC ingest: envelope round-trip (plain + gzip), pushdown
  * observability, strict-envelope failures, byte-exact framing. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String, gzip: Boolean): Unit =
    WarcIO.writeShards(
      Seq((1L, "hello world"), (2L, "héllo wörld — ünïcode"), (3L, ""))
        .toDF("id", "text")
        .select(
          concat(lit("urn:t:"), col("id").cast("string")).as("record_id"),
          concat(lit("https://t/"), col("id").cast("string")).as("target_uri"),
          encode(col("text"), "UTF-8").as("payload")),
      dir, nShards = 2, gzip = gzip)

  test("round-trip: plain and gzip shards decode byte-exactly (non-ASCII included)") {
    for (gz <- Seq(false, true)) {
      val dir = tempDir(s"warc_rt_$gz")
      writeFixture(dir, gz)
      val got = spark.read.format("graft-warc").load(dir)
        .filter(col("warc_type") === "resource")
        .select(col("record_id"), col("payload").cast("string"))
        .as[(String, String)].collect().toMap
      assert(got == Map("urn:t:1" -> "hello world",
        "urn:t:2" -> "héllo wörld — ünïcode", "urn:t:3" -> ""))
      // content_length is BYTES, not chars
      val len2 = spark.read.format("graft-warc").load(dir)
        .filter(col("record_id") === "urn:t:2")
        .select(col("content_length")).as[Long].head()
      assert(len2 == "héllo wörld — ünïcode".getBytes("UTF-8").length)
      assert(len2 > "héllo wörld — ünïcode".length)
    }
  }

  test("warc_type filter is pushed into the scan and warcinfo records drop") {
    val dir = tempDir("warc_push")
    writeFixture(dir, gzip = false)
    val q = spark.read.format("graft-warc").load(dir)
      .filter(col("warc_type") === "resource")
    val formatted = q.queryExecution.executedPlan.toString
    // the scan description carries the pushed type
    assert(formatted.contains("pushedType=resource"),
      s"expected pushed filter in scan description:\n$formatted")
    assert(q.count() == 3) // warcinfo heads (one per shard) are gone
    val all = spark.read.format("graft-warc").load(dir)
    assert(all.count() == 5) // 3 resources + 2 warcinfo
  }

  test("column pruning: a payload-free projection still frames records correctly") {
    val dir = tempDir("warc_prune")
    writeFixture(dir, gzip = false)
    val types = spark.read.format("graft-warc").load(dir)
      .groupBy("warc_type").count()
      .as[(String, Long)].collect().toMap
    assert(types == Map("warcinfo" -> 2L, "resource" -> 3L))
  }

  test("a malformed envelope fails loudly with file context") {
    val dir = tempDir("warc_bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.warc"),
      "NOT-A-WARC/9.9\r\n\r\n".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir).count()
    }
    assert(e.getMessage.contains("expected WARC version line")
      || Option(e.getCause).exists(_.getMessage.contains("expected WARC version line")))
  }

  test("truncated payload fails loudly, not silently short") {
    val dir = tempDir("warc_trunc")
    val rec = "WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: urn:t:x\r\n" +
      "Content-Length: 999\r\n\r\nonly-a-few-bytes"
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "t.warc"),
      rec.getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir).select("payload").count()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("truncated payload"), msgs)
  }

  test("nested segment layouts list recursively (Common-Crawl shape)") {
    val root = tempDir("warc_nested")
    // crawl/segments/<seg>/warc/*.warc — shards two directories deep
    val seg = new java.io.File(root, "segments/seg-00001/warc")
    assert(seg.mkdirs())
    writeFixture(seg.toString, gzip = false)
    val got = spark.read.format("graft-warc").load(root)
      .filter(col("warc_type") === "resource").count()
    assert(got == 3, "nested shards must be discovered recursively")
    // an empty tree still refuses with a self-explanatory message
    val empty = tempDir("warc_empty")
    assert(new java.io.File(empty, "segments/nothing").mkdirs())
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-warc").load(empty).count()
    }
    assert(e.getMessage.contains("recursively"), e.getMessage)
  }

  test("writeShards refuses null record_id/target_uri/payload with row context") {
    val dir = tempDir("warc_nulls")
    val df = Seq((Option("urn:t:1"), Option("https://t/1")),
      (Option("urn:t:2"), Option.empty[String]))
      .toDF("record_id", "target_uri")
      .withColumn("payload", encode(lit("x"), "UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      WarcIO.writeShards(df, dir, nShards = 1)
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("null target_uri") && msgs.contains("urn:t:2"), msgs)
  }

  test("C69 demo row equals the straight-from-table reconstruction") {
    val got = RefDemos.warcIngest(spark, sfDir)
      .select("doc_id", "text", "content_length")
      .as[(Long, String, Long)].collect().toSeq
    val want = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        length(encode(col("text"), "UTF-8")).cast("long"))
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == want)
  }
}
