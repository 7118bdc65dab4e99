package graft.io

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** A12's wrapped publish as a DataSource V2 batch SINK:
  *
  * {{{
  * df.write.format("graft-wrapped")
  *   .option("groupCol", "county")
  *   .mode("overwrite")             // or "append" for first publish
  *   .save("/out/dir")              // => <dir>/<group>.json per group + _SUCCESS
  * }}}
  *
  * Each output file holds ONE wrapped object `{<groupCol>, total,
  * rows:[...]}` — the reference's per-county publish layout
  * (index.js:319-356) as a first-class Spark sink instead of a helper.
  *
  * Two pieces make this Spark-first rather than a foreachPartition:
  *
  *  1. **The sink DECLARES its distribution** via
  *     [[RequiresDistributionAndOrdering]]: clustered + sorted on the
  *     group column. Spark plans the shuffle/sort itself — callers
  *     never pre-repartition, and each [[WrappedJsonWriter]] sees
  *     every group whole and contiguous, so the wrapped object folds
  *     streaming with O(group) memory (same boundedness contract as
  *     `WrappedExport.wrappedJson`'s collect_list, stated in types).
  *
  *  2. **A real commit protocol.** Tasks write attempt-scoped temp
  *     files under `_temporary/<queryId>/` and return the (temp,
  *     final) pairs as commit messages; only the DRIVER's commit
  *     promotes them (rename) and stamps `_SUCCESS`. A failed or
  *     speculated attempt can never corrupt the published layout:
  *     its files carry its own attempt id in the temp name, and
  *     Spark hands commit() exactly one message per partition.
  *     `mode("overwrite")` maps to [[SupportsTruncate]]: previous
  *     group files are cleared inside the same driver commit, so a
  *     re-publish is atomic-per-run, never a half-mixed directory.
  *
  * Scale: one file per group mirrors the reference's contract (groups
  * are counties/tenants — bounded); row data streams through the
  * writers without any driver collection. Values must be ATOMIC types
  * (string/number/boolean/date-less primitives) — `to_json` nested
  * columns upstream; the builder rejects others by name.
  */
class WrappedJsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wrapped"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-wrapped is a write-only sink; it has no schema to infer")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WrappedJsonTable(schema, properties.asScala.toMap)
}

private[io] class WrappedJsonTable(schema0: StructType, props: Map[String, String])
  extends Table with SupportsWrite {
  override def name(): String = s"graft-wrapped(${props.getOrElse("path", "?")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = {
        val opts = props.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
        val path = opts.getOrElse("path", throw new IllegalArgumentException(
          "graft-wrapped: missing path (pass it to .save(path))"))
        val groupCol = opts.getOrElse("groupcol", throw new IllegalArgumentException(
          "graft-wrapped: missing required option 'groupCol'"))
        val schema = info.schema()
        require(schema.fieldNames.contains(groupCol),
          s"graft-wrapped: groupCol '$groupCol' not in ${schema.fieldNames.mkString(", ")}")
        val bad = schema.fields.filterNot(f => WrappedJsonWrite.atomic(f.dataType))
        require(bad.isEmpty,
          s"graft-wrapped serializes atomic columns only; to_json these first: " +
            bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
        val retain = opts.get("retain").map(_.trim.toInt).getOrElse(Int.MaxValue)
        require(retain >= 1, s"graft-wrapped: retain must be >= 1, got $retain")
        new WrappedJsonWrite(path, schema, groupCol, info.queryId(), doTruncate, retain)
      }
    }
}

private[graft] class WrappedJsonWrite(path: String, schema: StructType,
                                   groupCol: String, queryId: String,
                                   truncate: Boolean,
                                   retain: Int = Int.MaxValue)
  extends Write with RequiresDistributionAndOrdering {

  // the sink's contract, not the caller's job: cluster AND sort by the
  // group column so each writer sees whole, contiguous groups
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity(groupCol)))
  override def requiredOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.identity(groupCol),
      SortDirection.ASCENDING, NullOrdering.NULLS_FIRST))

  override def toBatch: BatchWrite = new BatchWrite {
    // driver-captured session conf, shipped to tasks: object-store
    // creds and fs.defaultFS ride along (the stagePages discipline)
    private val hconf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    private def fs = new Path(path).getFileSystem(hconf.value)
    private def tempDir = new Path(path, s"_temporary/$queryId")

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      WrappedJsonWriterFactory(path, s"_temporary/$queryId", schema, groupCol, hconf)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.collect { case m: WrappedCommit => m.files }.flatten
      val f = fs
      val finals = files.map { case (_, finalName) => finalName }
      require(finals.distinct.size == finals.size,
        s"duplicate group files across partitions — clustering contract broken: " +
          finals.diff(finals.distinct).distinct.mkString(", "))
      // an APPEND keeps previously published groups: fold them into the
      // rewritten manifest instead of erasing them (review finding)
      val successPath = new Path(path, "_SUCCESS")
      val carried: Seq[String] =
        if (truncate || !f.exists(successPath)) Seq.empty
        else {
          val in = f.open(successPath)
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").toSeq.filter(_.nonEmpty)
          finally in.close()
        }
      // _SUCCESS drops FIRST in both modes: renames are per-file atomic
      // but the commit as a whole is not (the classic v1-committer
      // caveat) — readers gate on _SUCCESS, so the directory reads as
      // "unpublished" for the whole mutation window instead of ever
      // presenting a half-mixed layout as complete
      f.delete(successPath, false)
      if (truncate) {
        Option(f.globStatus(new Path(path, "*.json")))
          .getOrElse(Array.empty).foreach(st => f.delete(st.getPath, false))
      }
      files.foreach { case (temp, finalName) =>
        val dst = new Path(path, finalName)
        if (f.exists(dst)) throw new IllegalStateException(
          s"graft-wrapped: $dst already exists; use mode(\"overwrite\") to re-publish")
        if (!f.rename(new Path(temp), dst))
          throw new IllegalStateException(s"graft-wrapped: rename $temp -> $dst failed")
      }
      val out = f.create(successPath, true)
      try out.write((carried ++ finals).distinct.sorted.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      cleanupTemp(f)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      cleanupTemp(fs) // no renames happened; the final layout is untouched


    /** drop this query's temp dir, and the shared `_temporary` parent
      * when nothing else (a concurrent writer) still owns a subdir */
    private def cleanupTemp(f: org.apache.hadoop.fs.FileSystem): Unit = {
      f.delete(tempDir, true)
      val parent = new Path(path, "_temporary")
      try {
        if (f.exists(parent) && f.listStatus(parent).isEmpty) f.delete(parent, false)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** The STREAMING side publishes the reference's dated-snapshot
    * layout (index.js:319-356, gcs-io.js): every epoch commits an
    * immutable `snapshots/ep<id>/` full of wrapped group files plus a
    * `_SUCCESS` manifest, then atomically re-points `current` (a
    * pointer FILE naming the epoch dir — pointer swap, not data copy).
    * Meant for complete-mode aggregated queries — each epoch is a
    * whole republish, exactly the reference's daily-publish contract,
    * now continuous.
    *
    * Exactly-once across recovery: the epoch id is the micro-batch id,
    * which the checkpoint replays after a crash — a re-committed epoch
    * whose `_SUCCESS` already landed is a NO-OP (the first commit won;
    * the replay's temps are swept), so duplicated publishes cannot
    * happen. `retain` bounds snapshot growth (newest N committed dirs
    * survive — A12.snapshot's knob, same only-committed-count rule). */
  override def toStreaming: StreamingWrite = new StreamingWrite {
    private val hconf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    private def fs = new Path(path).getFileSystem(hconf.value)

    /** drop the epoch's temp dir and any now-empty temp ancestors
      * (`_temporary/<queryId>`, `_temporary`) — a shared parent stays
      * while a concurrent writer still owns a subdir. */
    private def sweepEpochTemp(f: org.apache.hadoop.fs.FileSystem, epochId: Long): Unit = {
      f.delete(new Path(path, s"_temporary/$queryId/ep$epochId"), true)
      Seq(s"_temporary/$queryId", "_temporary").foreach { d =>
        val dir = new Path(path, d)
        try {
          if (f.exists(dir) && f.listStatus(dir).isEmpty) f.delete(dir, false)
        } catch { case _: java.io.IOException => () }
      }
    }

    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      WrappedJsonWriterFactory(path, s"_temporary/$queryId", schema, groupCol, hconf)

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val f = fs
      val snapDir = new Path(path, f"snapshots/ep$epochId%019d")
      val marker = new Path(snapDir, "_SUCCESS")
      if (f.exists(marker)) { // replayed epoch: the first commit won
        sweepEpochTemp(f, epochId)
        return
      }
      val files = messages.collect { case m: WrappedCommit => m.files }.flatten
      val finals = files.map(_._2)
      require(finals.distinct.size == finals.size,
        s"duplicate group files across partitions — clustering contract broken: " +
          finals.diff(finals.distinct).distinct.mkString(", "))
      f.delete(snapDir, true) // crash debris from a commit that never marked
      f.mkdirs(snapDir)
      files.foreach { case (temp, finalName) =>
        if (!f.rename(new Path(temp), new Path(snapDir, finalName)))
          throw new IllegalStateException(
            s"graft-wrapped: rename $temp -> $snapDir/$finalName failed")
      }
      val out = f.create(marker, true)
      try out.write(finals.sorted.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // pointer swap: write current.tmp, rename over current. The
      // FileContext OVERWRITE rename is atomic where the FS supports it
      // (HDFS, posix local); the delete+rename fallback has a no-pointer
      // window a reader can observe — resolve via the newest committed
      // snapshot dir when the pointer is briefly absent. Stale tmp
      // pointers from a crashed commit are swept here first.
      Option(f.globStatus(new Path(path, "current.tmp-*")))
        .getOrElse(Array.empty).foreach(st => f.delete(st.getPath, false))
      val tmpPtr = new Path(path, s"current.tmp-$queryId")
      val ptrOut = f.create(tmpPtr, true)
      try ptrOut.write(snapDir.getName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally ptrOut.close()
      val ptr = new Path(path, "current")
      try {
        org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, hconf.value)
          .rename(tmpPtr, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch { case _: Exception =>
        f.delete(ptr, false)
        if (!f.rename(tmpPtr, ptr))
          throw new IllegalStateException(s"graft-wrapped: pointer swap to $snapDir failed")
      }
      sweepEpochTemp(f, epochId)
      if (retain != Int.MaxValue) {
        val root = new Path(path, "snapshots")
        // only COMMITTED snapshots occupy retention slots or are
        // eligible to drop (the A12.snapshot discipline: crash debris
        // is the operator's to inspect, not ours to delete)
        Option(f.listStatus(root)).getOrElse(Array.empty)
          .map(_.getPath.getName)
          .filter(n => f.exists(new Path(root, s"$n/_SUCCESS")))
          .sorted.dropRight(retain)
          .foreach(n => f.delete(new Path(root, n), true))
      }
    }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      sweepEpochTemp(fs, epochId)
  }
}

private[graft] object WrappedJsonWrite {
  def atomic(t: DataType): Boolean = t match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }
}

private[graft] case class WrappedCommit(files: Seq[(String, String)])
  extends WriterCommitMessage

private[io] case class WrappedJsonWriterFactory(path: String, tempPrefix: String,
                                                schema: StructType, groupCol: String,
                                                hconf: SerializableConfiguration)
  extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WrappedJsonWriter(path, tempPrefix, schema, groupCol, hconf,
      partitionId, taskId)
  // streaming: the epoch gets its own temp subdir, so a replayed epoch
  // can never collide with a committed sibling's temps
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new WrappedJsonWriter(path, s"$tempPrefix/ep$epochId", schema, groupCol,
      hconf, partitionId, taskId)
}

/** Streams one sorted partition: rows of a group accumulate, a group
  * change flushes one temp file. Temp names carry partition AND task
  * id, so a retried/speculated attempt writes beside, never over, its
  * sibling — only the committed attempt's names reach the driver. */
private[graft] class WrappedJsonWriter(path: String, tempPrefix: String,
                                    schema: StructType, groupCol: String,
                                    hconf: SerializableConfiguration,
                                    partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val fs = new Path(path).getFileSystem(hconf.value)
  private val gi = schema.fieldIndex(groupCol)
  private val payload = schema.fields.zipWithIndex.filter(_._2 != gi)
  private val written = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  // (isNull, canonical string) — nullness rides beside the string so a
  // genuine "__null__" STRING group can never collide with a null
  // group (review finding); file names disambiguate the same way
  private var currentKey: (Boolean, String) = _
  private var currentJson: String = _ // JSON form of the group value
  private var open = false
  private val rows = new StringBuilder
  private var total = 0L

  private def jsonScalar(row: InternalRow, i: Int, t: DataType): String =
    if (row.isNullAt(i)) "null" else t match {
      case StringType => quote(row.getUTF8String(i).toString)
      case BooleanType => row.getBoolean(i).toString
      case ByteType => row.getByte(i).toString
      case ShortType => row.getShort(i).toString
      case IntegerType => row.getInt(i).toString
      case LongType => row.getLong(i).toString
      // NaN/Infinity are not JSON numbers: emit them QUOTED so every
      // strict consumer can still parse the file (review finding)
      case FloatType => fpJson(row.getFloat(i).toDouble)
      case DoubleType => fpJson(row.getDouble(i))
      case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toString
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  private def fpJson(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "\"" + d.toString + "\""

  private def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  private def canonicalFp(d: Double): String =
    if (d == 0.0) "0.0" else d.toString // folds -0.0; NaN -> "NaN"

  private def fileSafe(key: (Boolean, String)): String = key match {
    case (true, _) => "__null__"
    case (false, s) =>
      val safe = s.map(c =>
        if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c else '_')
      // a sanitized name can collide ("a/b" vs "a_b"), and the literal
      // string "__null__" would collide with the null group's file:
      // disambiguate both with a hash of the RAW value
      if (safe == s && s != "__null__") s
      else safe + "-" + Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(s))
  }

  private def flush(): Unit = if (open) {
    val name = s"${fileSafe(currentKey)}.json"
    val temp = new Path(path, s"$tempPrefix/p$partitionId-t$taskId-$name")
    val out = fs.create(temp, true)
    try {
      val json = s"""{${quote(groupCol)}: $currentJson, "total": $total, "rows": [${rows.toString}]}"""
      out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    written += temp.toString -> name
    rows.clear(); total = 0; open = false
  }

  override def write(row: InternalRow): Unit = {
    val keyJson = jsonScalar(row, gi, schema.fields(gi).dataType)
    val key: (Boolean, String) = if (row.isNullAt(gi)) (true, "")
      else (false, schema.fields(gi).dataType match {
        case StringType => row.getUTF8String(gi).toString
        // floats canonicalize so -0.0/0.0 (equal under the sink's sort,
        // so possibly ADJACENT in one group) share one key; NaN is one
        // group (all NaN bit patterns sort together)
        case FloatType => canonicalFp(row.getFloat(gi).toDouble)
        case DoubleType => canonicalFp(row.getDouble(gi))
        case _ => keyJson
      })
    if (!open || key != currentKey) {
      flush() // sorted input: a new key means the previous group is complete
      currentKey = key; currentJson = keyJson; open = true
    }
    if (total > 0) rows.append(", ")
    rows.append(payload.map { case (f, i) =>
      s"${quote(f.name)}: ${jsonScalar(row, i, f.dataType)}"
    }.mkString("{", ", ", "}"))
    total += 1
  }

  override def commit(): WriterCommitMessage = {
    flush()
    WrappedCommit(written.toSeq)
  }

  override def abort(): Unit = {
    // this attempt's files only — a sibling attempt's temps are its own
    written.foreach { case (temp, _) => fs.delete(new Path(temp), false) }
  }

  override def close(): Unit = ()
}
