package graft.io

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
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
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

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
        new WrappedJsonWrite(path, schema, groupCol, info.queryId(), doTruncate)
      }
    }
}

private[io] class WrappedJsonWrite(path: String, schema: StructType,
                                   groupCol: String, queryId: String,
                                   truncate: Boolean)
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
      WrappedJsonWriterFactory(path, queryId, schema, groupCol, hconf)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.collect { case m: WrappedCommit => m.files }.flatten
      val f = fs
      val finals = files.map { case (_, finalName) => finalName }
      require(finals.distinct.size == finals.size,
        s"duplicate group files across partitions — clustering contract broken: " +
          finals.diff(finals.distinct).distinct.mkString(", "))
      if (truncate) {
        // overwrite = clear previous group files inside THIS commit.
        // _SUCCESS drops FIRST: renames are per-file atomic but the
        // commit as a whole is not (the classic v1-committer caveat) —
        // readers gate on _SUCCESS, so the directory reads as
        // "unpublished" for the whole mutation window instead of ever
        // presenting a half-mixed layout as complete
        f.delete(new Path(path, "_SUCCESS"), false)
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
      val out = f.create(new Path(path, "_SUCCESS"), true)
      try out.write(finals.sorted.mkString("", "\n", "\n")
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
}

private[io] object WrappedJsonWrite {
  def atomic(t: DataType): Boolean = t match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }
}

private[io] case class WrappedCommit(files: Seq[(String, String)])
  extends WriterCommitMessage

private[io] case class WrappedJsonWriterFactory(path: String, queryId: String,
                                                schema: StructType, groupCol: String,
                                                hconf: SerializableConfiguration)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WrappedJsonWriter(path, queryId, schema, groupCol, hconf,
      partitionId, taskId)
}

/** Streams one sorted partition: rows of a group accumulate, a group
  * change flushes one temp file. Temp names carry partition AND task
  * id, so a retried/speculated attempt writes beside, never over, its
  * sibling — only the committed attempt's names reach the driver. */
private[io] class WrappedJsonWriter(path: String, queryId: String,
                                    schema: StructType, groupCol: String,
                                    hconf: SerializableConfiguration,
                                    partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val fs = new Path(path).getFileSystem(hconf.value)
  private val gi = schema.fieldIndex(groupCol)
  private val payload = schema.fields.zipWithIndex.filter(_._2 != gi)
  private val written = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  private var currentKey: String = _
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
      case FloatType => row.getFloat(i).toString
      case DoubleType => row.getDouble(i).toString
      case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toString
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

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

  private def fileSafe(s: String): String = {
    val safe = s.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c else '_')
    // a sanitized name can collide ("a/b" vs "a_b"): disambiguate with
    // a hash of the RAW value whenever sanitizing changed anything
    if (safe == s) s
    else safe + "-" + Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(s))
  }

  private def flush(): Unit = if (open) {
    val name = s"${fileSafe(currentKey)}.json"
    val temp = new Path(path, s"_temporary/$queryId/p$partitionId-t$taskId-$name")
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
    val key = if (row.isNullAt(gi)) "__null__"
      else schema.fields(gi).dataType match {
        case StringType => row.getUTF8String(gi).toString
        case _ => keyJson
      }
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
