package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.util.RateLimited

/** A13's paged-HTTP fetch as a first-class DataSource V2 batch format:
  *
  * {{{
  * spark.read.format("graft-paged-http")
  *   .option("url", "https://host/api/data")
  *   .option("pageSize", 200)
  *   .load()                       // => (_page INT, body STRING)
  * }}}
  *
  * Same semantics as [[HttpPagedSource.fetchPages]] (which stays as the
  * programmatic form): a driver-side probe GET of page 1 learns the
  * declared `total` (the reference's 共N頁 / `fetched < total` loop,
  * index_taoyuan.js:96-186 re-expressed as planning metadata), the
  * remaining pages fan out across `parallelism` input partitions, and
  * each [[PagedHttpReader]] walks its pages through the A14 rate-limited
  * retry loop (429/5xx back off, other non-200s fail fast). The probe
  * body rides inside partition 0, so page 1 is never fetched twice.
  *
  * The output schema is fixed — one `(_page, body)` row per page —
  * because pagination is transport, not schema: the schema'd treatment
  * of the payload stays in [[HttpPagedSource.parsePages]] (`from_json`
  * + explode + corrupt-page markers), exactly like the file-based path.
  *
  * Scale posture: the scan is LAZY like any DSv2 batch source — every
  * action re-probes and re-fetches (planInputPartitions runs per
  * execution), so multi-pass consumers land pages first
  * ([[HttpPagedSource.stagePages]]) or cache, the same discipline the
  * reference applies by writing page files to disk. Partition count is
  * `min(parallelism, nPages-1)`: the cluster-wide request rate is
  * partitions × (1000/minIntervalMs) req/s, the only way to reason
  * about a third-party quota without an external coordinator.
  */
class PagedHttpDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-paged-http"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedHttpDataSource.SCHEMA

  // accept a user-specified schema so getTable can reject anything but
  // the fixed page schema with a pointer at parsePages (the default
  // false would fail with a generic "no user-specified schema" error)
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    require(schema == PagedHttpDataSource.SCHEMA,
      s"graft-paged-http serves a fixed (_page INT, body STRING) page " +
        s"schema; got $schema. Parse payloads with HttpPagedSource.parsePages.")
    new PagedHttpTable(PagedHttpConf.fromOptions(properties.asScala.toMap))
  }
}

object PagedHttpDataSource {
  val SCHEMA: StructType = new StructType()
    .add("_page", IntegerType, nullable = false)
    .add("body", StringType, nullable = false)
}

/** Validated reader options (all names case-insensitive via
  * CaseInsensitiveStringMap normalizing to lower-case keys). */
private[sources] case class PagedHttpConf(url: String, pageSize: Int,
                                          parallelism: Int, minIntervalMs: Long,
                                          maxRetries: Int, baseDelayMs: Long,
                                          timeoutMs: Int) {
  def pageUrl(p: Int): String = HttpPagedSource.pageUrl(url, p)
}

private[sources] object PagedHttpConf {
  def fromOptions(opts0: Map[String, String]): PagedHttpConf = {
    // getTable receives the case-PRESERVED option map (unlike
    // CaseInsensitiveStringMap) — normalize here so `pageSize` and
    // `pagesize` both resolve
    val opts = opts0.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    def req(k: String): String = opts.getOrElse(k,
      throw new IllegalArgumentException(s"graft-paged-http: missing required option '$k'"))
    def int(k: String, dflt: Int): Int = opts.get(k).map(_.trim.toInt).getOrElse(dflt)
    def lng(k: String, dflt: Long): Long = opts.get(k).map(_.trim.toLong).getOrElse(dflt)
    val conf = PagedHttpConf(
      url = req("url"),
      pageSize = req("pagesize").trim.toInt,
      parallelism = int("parallelism", 4),
      minIntervalMs = lng("minintervalms", 0L),
      maxRetries = int("maxretries", 3),
      baseDelayMs = lng("basedelayms", 50L),
      timeoutMs = int("timeoutms", 10000))
    require(conf.pageSize > 0, s"pageSize must be positive, got ${conf.pageSize}")
    require(conf.parallelism > 0, s"parallelism must be positive, got ${conf.parallelism}")
    require(conf.maxRetries >= 0, s"maxRetries must be >= 0, got ${conf.maxRetries}")
    conf
  }
}

private[sources] class PagedHttpTable(conf: PagedHttpConf)
  extends Table with SupportsRead {
  override def name(): String = s"graft-paged-http(${conf.url})"
  override def schema(): StructType = PagedHttpDataSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedHttpDataSource.SCHEMA
      override def toBatch: Batch = this
      override def description(): String = name()

      /** Driver probe → partition fan-out. A fresh Scan is built per
        * query execution, so every ACTION re-probes (the same freshness
        * contract as fetchPages) — but memoized per Scan instance,
        * because Spark's exec node asks for partitions more than once
        * per execution (outputPartitioning + execution) and a second
        * probe would double-GET page 1. */
      private lazy val partitions: Array[InputPartition] = planPartitions()

      override def planInputPartitions(): Array[InputPartition] = partitions

      private def planPartitions(): Array[InputPartition] = {
        val (probe, total) = HttpPagedSource.probeTotal(conf.url,
          conf.maxRetries, conf.baseDelayMs, conf.timeoutMs)
        val nPages = math.max(1L, (total + conf.pageSize - 1) / conf.pageSize)
        require(nPages <= Int.MaxValue, s"$nPages pages overflow the planner")
        val head: InputPartition = PagedHttpPartition(Seq(1), Some(probe), conf)
        if (nPages == 1L) Array(head)
        else {
          val rest = (2 to nPages.toInt)
          val slices = math.max(1, math.min(conf.parallelism, rest.length))
          // contiguous ranges (not round-robin): consecutive pages in one
          // partition keep the limiter's spacing meaningful per range
          val per = (rest.length + slices - 1) / slices
          head +: rest.grouped(per).map(ps =>
            PagedHttpPartition(ps, None, conf): InputPartition).toArray
        }
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
            new PagedHttpReader(partition.asInstanceOf[PagedHttpPartition])
        }
    }
}

/** `probe`: page 1's body already fetched during planning — emitted
  * as-is so the server sees each page exactly once per action. */
private[sources] case class PagedHttpPartition(pages: Seq[Int],
                                               probe: Option[String],
                                               conf: PagedHttpConf)
  extends InputPartition

private[sources] class PagedHttpReader(part: PagedHttpPartition)
  extends PartitionReader[InternalRow] {
  private val it: Iterator[(Int, String)] = {
    val probed = part.probe match {
      case Some(body) => Iterator(part.pages.head -> body)
      case None => Iterator.empty
    }
    val toFetch = if (part.probe.isDefined) part.pages.tail else part.pages
    probed ++ RateLimited.mapRateLimited(toFetch.iterator, part.conf.minIntervalMs,
      part.conf.maxRetries, part.conf.baseDelayMs, HttpPagedSource.isRetriable)(
      p => p -> HttpPagedSource.httpGet(part.conf.pageUrl(p), part.conf.timeoutMs))
  }
  private var current: (Int, String) = _
  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }
  override def get(): InternalRow =
    InternalRow(current._1, UTF8String.fromString(current._2))
  override def close(): Unit = ()
}
