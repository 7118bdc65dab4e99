package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructType}
import graft.util.RateLimited

/** Live paged-HTTP ingestion as a partition-level reader (SURVEY §2
  * A13's fetch half — the reference's total-driven datagrid loop,
  * http_crawl.js:46-79: first request learns `total`, the loop pulls
  * page by page under a throttle with 429/5xx retry).
  *
  * Spark-native shape: the DRIVER makes exactly one probe request
  * (page 1, same retry discipline) to learn the total — fetch fan-out
  * is data-independent after that — then the remaining page ids spread
  * across partitions and each TASK fetches its pages through
  * [[RateLimited.mapRateLimited]] (per-partition throttle: cluster
  * rate = partitions × per-partition rate, the only rate a coordinator-
  * free distributed fetcher can promise; 429/5xx back off linearly,
  * other HTTP errors fail fast). Page 1's probe body is reused as its
  * fetch — every page hits the server exactly once on the happy path.
  * Task retries re-fetch only that partition's pages (idempotent GETs).
  *
  * Transport is JDK `HttpURLConnection` only — no client libraries.
  * The probe parses `total` with a regex rather than a JSON library
  * because the driver needs ONE integer field; page payloads get the
  * real schema'd `from_json` treatment in [[parsePages]].
  */
object HttpPagedSource {

  /** HTTP failure that merits a backoff-retry (429 or any 5xx). */
  final class RetriableHttpException(val code: Int, url: String)
    extends RuntimeException(s"HTTP $code for $url")

  private[sources] def isRetriable(t: Throwable): Boolean = t match {
    case _: RetriableHttpException => true
    case _: java.io.IOException => true // connect/read failures: transient
    case _ => false
  }

  /** GET `url` as UTF-8 text; [[RetriableHttpException]] on 429/5xx,
    * plain IllegalStateException on other non-200s (fail fast). */
  private[sources] def httpGet(url: String, timeoutMs: Int = 10000): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    try {
      val code = conn.getResponseCode
      if (code == 429 || code >= 500) throw new RetriableHttpException(code, url)
      if (code != 200) throw new IllegalStateException(s"HTTP $code for $url")
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } finally conn.disconnect()
  }

  /** page-N URL for a base that may already carry a query string —
    * shared by the programmatic fetch and the DSv2 format. */
  private[sources] def pageUrl(baseUrl: String, p: Int): String =
    s"$baseUrl${if (baseUrl.contains("?")) "&" else "?"}page=$p"

  /** Driver-side probe shared by [[fetchPages]] and the DSv2 format:
    * GET page 1 (with the retry discipline) and extract the declared
    * `total`. KNOWN LIMIT (single place to fix now): the regex takes
    * the FIRST `"total":` in the body — a row object carrying its own
    * `total` field BEFORE the top-level one would win; the reference
    * APIs put `total` at the top of the envelope, which this mirrors.
    * Returns (probe body, total). */
  private[sources] def probeTotal(baseUrl: String, maxRetries: Int,
                                  baseDelayMs: Long,
                                  timeoutMs: Int = 10000): (String, Long) = {
    val probe = RateLimited.withRetry(maxRetries, baseDelayMs, isRetriable)(
      () => httpGet(pageUrl(baseUrl, 1), timeoutMs))
    val total = "\"total\"\\s*:\\s*(\\d{1,18})".r.findFirstMatchIn(probe)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"probe page carries no numeric 'total' field: ${probe.take(200)}"))
    (probe, total)
  }

  /** Fetch every page of `baseUrl` (which must accept `?page=N`,
    * 1-based, and answer `{"total": T, "rows": [...]}`) as one
    * (_page, body) row per page. `pageSize` is the API's page length —
    * it drives the fan-out count, exactly like the reference's
    * `fetched < total` loop.
    *
    * The result is LAZY like any DataFrame: each action re-runs the
    * fetch. Persist it or land it with [[stagePages]] (the reference
    * writes pages to disk for the same reason) before multi-pass
    * consumption. */
  def fetchPages(spark: SparkSession, baseUrl: String, pageSize: Int,
                 parallelism: Int = 4, minIntervalMs: Long = 0,
                 maxRetries: Int = 3, baseDelayMs: Long = 50): DataFrame = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    import spark.implicits._
    val (probe, total) = probeTotal(baseUrl, maxRetries, baseDelayMs)
    val nPages = math.max(1L, (total + pageSize - 1) / pageSize)
    require(nPages <= Int.MaxValue, s"$nPages pages overflow the planner")
    val first = Seq((1, probe)).toDF("_page", "body")
    if (nPages == 1L) first
    else {
      val rest = spark.sparkContext
        .parallelize(2 to nPages.toInt,
          math.max(1, math.min(parallelism, nPages.toInt - 1)))
        .mapPartitions { pages =>
          RateLimited.mapRateLimited(pages, minIntervalMs, maxRetries,
            baseDelayMs, isRetriable)(p => (p, httpGet(pageUrl(baseUrl, p))))
        }
      first.unionAll(rest.toDF("_page", "body"))
    }
  }

  /** Schema'd parse of [[fetchPages]] output: each body's `rows` array
    * explodes to one output row per record, `_page` and the declared
    * `total` ride along (the downstream consistency gate is
    * [[PagedIngest.totalMatches]]). A body `from_json` cannot parse
    * yields one `_corrupt`-flagged row carrying the raw text — the
    * re-fetch list, same posture as [[PagedIngest.readPagesPermissive]].
    * EVERY fetched page stays visible: a well-formed page whose `rows`
    * is empty still emits one recordless row (`_corrupt` null, record
    * fields null, `total` present) — a vanished page would leave the
    * totalMatches gate a count mismatch with nothing to re-fetch.
    * Record-bearing rows are the ones whose schema fields are non-null.
    *
    * SINGLE-scan by construction: good, empty and corrupt pages come
    * out of one projection (explode_outer emits the marker row when
    * the array is null/empty). A filter-each-side + union shape would
    * put the fetch subtree in the plan twice and HTTP-GET every page
    * twice per action. */
  def parsePages(pages: DataFrame, rowSchema: StructType): DataFrame = {
    val payload = new StructType()
      .add("total", LongType).add("rows", ArrayType(rowSchema))
    pages
      .select(col("_page"), from_json(col("body"), payload).as("_p"), col("body"))
      .select(col("_page"), col("_p.total").as("total"),
        explode_outer(when(size(col("_p.rows")) > 0, col("_p.rows"))).as("_r"),
        when(col("_p.rows").isNull, col("body")).as("_corrupt"))
      .select(Seq(col("_page"), col("total")) ++
        rowSchema.fields.map(f => col(s"_r.${f.name}").as(f.name)) :+
        col("_corrupt"): _*)
  }

  /** Land fetched pages as `page_N.json` files under `dir` — the bridge
    * into [[PagedIngest]]'s file-based scan/recovery (the staged-page
    * layout every later rescan, dedup or re-fetch works against). Each
    * task writes only its own pages to page-keyed names, so a task
    * retry overwrites its own files idempotently — no commit protocol
    * needed for a keyed, idempotent layout. */
  def stagePages(pages: DataFrame, dir: String): Unit = {
    // Hadoop FS, not java.io: `dir` must be visible to every executor
    // (HDFS/object store on a cluster), and overwrite-create is the
    // idempotence the task-retry contract above relies on. The
    // SESSION's hadoop conf ships to the tasks (a bare Configuration
    // would drop every spark.hadoop.* overlay — fs.defaultFS, object-
    // store credentials — and silently write to executor-local disks).
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      pages.sparkSession.sessionState.newHadoopConf())
    pages.select(col("_page"), col("body")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(dir, s"page_${r.getInt(0)}.json")
          val fs = p.getFileSystem(hconf.value)
          val out = fs.create(p, true)
          try out.write(r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
    }
  }
}
