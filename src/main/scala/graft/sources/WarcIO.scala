package graft.sources

import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** WARC shard WRITER — fixture/test tooling for [[WarcDataSource]]
  * (the production direction is ingest; a first-class WARC sink would
  * follow the graft-wrapped commit protocol). Writes one
  * `part-<pid>.warc[.gz]` per partition via mapPartitions: a
  * warcinfo head record (real WARCs carry one — it also makes the
  * type-pushdown filter do observable work), then one `resource`
  * record per row with Content-Length in payload BYTES. Overwrite
  * creation keeps a retried task idempotent. */
object WarcIO {
  private val CRLF = "\r\n"
  private val Date = "2026-01-01T00:00:00Z" // fixed: fixtures are deterministic

  /** `df` must carry (record_id string, target_uri string,
    * payload binary) columns. */
  def writeShards(df: DataFrame, outDir: String, nShards: Int,
                  gzip: Boolean = false): Unit = {
    val hconf = new SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    df.select(col("record_id").cast("string"), col("target_uri").cast("string"),
        col("payload").cast("binary"))
      .repartition(nShards)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8 // Charset isn't Serializable
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val ext = if (gzip) ".warc.gz" else ".warc"
        val p = new Path(outDir, f"part-$pid%05d$ext")
        val fs = p.getFileSystem(hconf.value)
        val raw = fs.create(p, true)
        val out = if (gzip) new GZIPOutputStream(raw) else raw
        try {
          def record(headers: Seq[(String, String)], payload: Array[Byte]): Unit = {
            val head = new StringBuilder("WARC/1.0").append(CRLF)
            headers.foreach { case (k, v) => head.append(k).append(": ").append(v).append(CRLF) }
            head.append("Content-Length: ").append(payload.length).append(CRLF).append(CRLF)
            out.write(head.toString.getBytes(utf8))
            out.write(payload)
            out.write((CRLF + CRLF).getBytes(utf8))
          }
          record(Seq(
            "WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> s"urn:graft:warcinfo-$pid",
            "WARC-Date" -> Date,
            "Content-Type" -> "application/warc-fields"),
            s"software: graft$CRLF".getBytes(utf8))
          rows.foreach { r =>
            // A null URI would string-append as the literal "null" into the
            // header and a null payload would NPE with no row context —
            // fail loudly with the offending record instead.
            require(!r.isNullAt(0), "WarcIO.writeShards: null record_id")
            val rid = r.getString(0)
            require(!r.isNullAt(1),
              s"WarcIO.writeShards: null target_uri for record_id=$rid")
            require(!r.isNullAt(2),
              s"WarcIO.writeShards: null payload for record_id=$rid")
            record(Seq(
              "WARC-Type" -> "resource",
              "WARC-Record-ID" -> rid,
              "WARC-Date" -> Date,
              "WARC-Target-URI" -> r.getString(1),
              "Content-Type" -> "text/plain"),
              r.getAs[Array[Byte]](2))
          }
        } finally out.close()
      }
  }
}
