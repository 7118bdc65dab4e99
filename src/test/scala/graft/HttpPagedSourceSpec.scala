package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.sources.{HttpPagedSource, PagedIngest}

/** A13 fetch half: the total-driven paged-HTTP partition reader driven
  * against an in-process JDK HttpServer with injected 429/5xx faults —
  * proving backoff-retry, fail-fast on non-retriable codes,
  * exactly-once page coverage, throttle spacing, and the staged-file
  * bridge into PagedIngest's scan/recovery. */
class HttpPagedSourceSpec extends SparkSpec {

  private val total = 57
  private val pageSize = 10
  private val nPages = 6 // ceil(57/10)

  private def rowsJson(page: Int): String = {
    val lo = (page - 1) * pageSize + 1
    val hi = math.min(total, page * pageSize)
    val rows = (lo to hi)
      .map(i => s"""{"id": $i, "name": "item_$i"}""").mkString(", ")
    s"""{"total": $total, "rows": [$rows]}"""
  }

  /** mock datagrid: per-page request log + a fault script
    * (page -> responses to serve before succeeding). */
  private class MockServer(faults: Map[Int, Seq[Int]]) {
    val attempts = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    val successes = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    val requestMillis = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.createContext("/data", { exchange =>
      requestMillis.add(System.nanoTime() / 1000000)
      val page = "page=(\\d+)".r.findFirstMatchIn(exchange.getRequestURI.getQuery)
        .map(_.group(1).toInt).getOrElse(-1)
      val n = attempts.merge(page, 1, (a, b) => a + b)
      val scripted = faults.getOrElse(page, Seq.empty)
      val code = if (n <= scripted.length) scripted(n - 1) else 200
      if (code == 200) {
        successes.merge(page, 1, (a, b) => a + b)
        val body = rowsJson(page).getBytes("UTF-8")
        exchange.sendResponseHeaders(200, body.length)
        exchange.getResponseBody.write(body)
      } else exchange.sendResponseHeaders(code, -1)
      exchange.close()
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}/data"
    def stop(): Unit = server.stop(0)
  }

  private val rowSchema = new StructType()
    .add("id", LongType).add("name", StringType)

  test("A13 fetch: 429/5xx back off and recover; every page served exactly once; totals line up") {
    // page 3 throttles twice (429,429) and page 5 breaks once (500)
    // before answering — the retry loop must absorb all of it
    val srv = new MockServer(Map(3 -> Seq(429, 429), 5 -> Seq(500)))
    try {
      val pages = HttpPagedSource.fetchPages(spark, srv.url, pageSize,
        parallelism = 3, maxRetries = 3, baseDelayMs = 30)
      val parsed = HttpPagedSource.parsePages(pages, rowSchema).cache()
      try {
        val good = parsed.filter(col("_corrupt").isNull)
        assert(good.count() == total)
        assert(PagedIngest.totalMatches(good, total))
        // every record exactly once, ids complete
        val ids = good.select("id").collect().map(_.getLong(0)).sorted
        assert(ids.toSeq == (1L to total.toLong), "exactly-once row coverage")
        // exactly-once SERVER-side too: each page succeeded once (the
        // probe's page-1 body is reused, never re-fetched)
        assert((1 to nPages).forall(p => srv.successes.get(p) == 1),
          s"successes: ${srv.successes}")
        // the scripted faults each burned their retries
        assert(srv.attempts.get(3) == 3 && srv.attempts.get(5) == 2,
          s"attempts: ${srv.attempts}")
      } finally parsed.unpersist()
    } finally srv.stop()
  }

  test("A13 fetch: retries exhausted on a permanently broken page fail the job, fail fast on 404") {
    val alwaysDown = new MockServer(Map(2 -> Seq.fill(10)(503)))
    try {
      val e = intercept[Exception] {
        HttpPagedSource.fetchPages(spark, alwaysDown.url, pageSize,
          maxRetries = 2, baseDelayMs = 10).count()
      }
      assert(e.getMessage.contains("503") ||
        Option(e.getCause).exists(_.getMessage.contains("503")), e.getMessage)
      // 1 try + 2 retries, then surfaced — never an infinite loop
      assert(alwaysDown.attempts.get(2) == 3, s"attempts: ${alwaysDown.attempts}")
      // a 404 is NOT retriable: one attempt only
      val missing = new MockServer(Map(4 -> Seq.fill(10)(404)))
      try {
        intercept[Exception] {
          HttpPagedSource.fetchPages(spark, missing.url, pageSize,
            maxRetries = 3, baseDelayMs = 10).count()
        }
        assert(missing.attempts.get(4) == 1, s"attempts: ${missing.attempts}")
      } finally missing.stop()
    } finally alwaysDown.stop()
  }

  test("A13 fetch: per-partition throttle spaces requests by minIntervalMs") {
    val srv = new MockServer(Map.empty)
    try {
      HttpPagedSource.fetchPages(spark, srv.url, pageSize,
        parallelism = 1, minIntervalMs = 60).count()
      val ts = srv.requestMillis.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      assert(ts.length == nPages)
      // pages 2..6 ran through one partition's limiter: consecutive
      // spacing at least ~the interval (scheduling can only widen it)
      val gaps = ts.drop(1).sliding(2).filter(_.length == 2).map(w => w(1) - w(0)).toSeq
      assert(gaps.forall(_ >= 50), s"throttle gaps too tight: $gaps")
    } finally srv.stop()
  }

  test("A13 fetch: corrupt and empty pages surface as visible rows, not silent loss") {
    val srv = new MockServer(Map.empty)
    try {
      // page 4's payload is garbage JSON; page 6 is well-formed but EMPTY
      val pages = HttpPagedSource.fetchPages(spark, srv.url, pageSize)
        .withColumn("body",
          when(col("_page") === 4, lit("{ not json"))
            .when(col("_page") === 6, lit(s"""{"total": $total, "rows": []}"""))
            .otherwise(col("body")))
      val parsed = HttpPagedSource.parsePages(pages, rowSchema).cache()
      try {
        val bad = parsed.filter(col("_corrupt").isNotNull)
          .select("_page").collect().map(_.getInt(0)).toSeq
        assert(bad == Seq(4), s"corrupt pages: $bad")
        // the empty page is VISIBLE (one recordless row, _corrupt null,
        // total riding along) — totalMatches can name it, not just
        // count a mismatch
        val emptyRows = parsed.filter(col("_corrupt").isNull && col("id").isNull)
        val empties = emptyRows.select("_page", "total").collect()
        assert(empties.map(_.getInt(0)).toSeq == Seq(6) &&
          empties.head.getLong(1) == total, empties.toSeq)
        // record-bearing rows: everything except page 4's (corrupt) and
        // page 6's (emptied) records
        assert(parsed.filter(col("id").isNotNull).count() == total - pageSize - 7)
      } finally parsed.unpersist()
    } finally srv.stop()
  }

  // ---- DataSource V2 format path: spark.read.format("graft-paged-http") ----

  private def formatRead(url: String, extra: (String, String)*) = {
    val base = spark.read.format("graft-paged-http")
      .option("url", url).option("pageSize", pageSize)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("A13 DSv2: format path fetches every page exactly once, absorbing 429/5xx faults") {
    val srv = new MockServer(Map(3 -> Seq(429, 429), 5 -> Seq(500)))
    try {
      val pages = formatRead(srv.url,
        "parallelism" -> "3", "maxRetries" -> "3", "baseDelayMs" -> "30")
      assert(pages.schema.fieldNames.toSeq == Seq("_page", "body"))
      val parsed = HttpPagedSource.parsePages(pages, rowSchema).cache()
      try {
        val good = parsed.filter(col("_corrupt").isNull)
        assert(good.count() == total)
        assert(PagedIngest.totalMatches(good, total))
        val ids = good.select("id").collect().map(_.getLong(0)).sorted
        assert(ids.toSeq == (1L to total.toLong), "exactly-once row coverage")
        // probe body reused for page 1: server saw each page once
        assert((1 to nPages).forall(p => srv.successes.get(p) == 1),
          s"successes: ${srv.successes}")
        assert(srv.attempts.get(3) == 3 && srv.attempts.get(5) == 2,
          s"attempts: ${srv.attempts}")
      } finally parsed.unpersist()
    } finally srv.stop()
  }

  test("A13 DSv2: each action re-probes and re-fetches (lazy scan contract)") {
    val srv = new MockServer(Map.empty)
    try {
      val pages = formatRead(srv.url, "parallelism" -> "2")
      assert(pages.count() == nPages)
      assert(pages.count() == nPages)
      // two actions => two probes + two fetch passes, like fetchPages
      assert((1 to nPages).forall(p => srv.successes.get(p) == 2),
        s"successes: ${srv.successes}")
    } finally srv.stop()
  }

  test("A13 DSv2: retries exhaust and surface; 404 fails fast; option validation") {
    val down = new MockServer(Map(2 -> Seq.fill(10)(503)))
    try {
      val e = intercept[Exception] {
        formatRead(down.url, "maxRetries" -> "2", "baseDelayMs" -> "10").count()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("503")), msgs(e))
      assert(down.attempts.get(2) == 3, s"attempts: ${down.attempts}")
    } finally down.stop()
    val missing = new MockServer(Map(4 -> Seq.fill(10)(404)))
    try {
      intercept[Exception] {
        formatRead(missing.url, "maxRetries" -> "3", "baseDelayMs" -> "10").count()
      }
      assert(missing.attempts.get(4) == 1, s"attempts: ${missing.attempts}")
    } finally missing.stop()
    // missing required options fail at planning with a named option
    val srv = new MockServer(Map.empty)
    try {
      val e2 = intercept[Exception] {
        spark.read.format("graft-paged-http").option("url", srv.url).load().count()
      }
      assert(e2.getMessage.contains("pagesize") || e2.getMessage.contains("pageSize"), e2.getMessage)
      // a user-supplied schema that isn't the page schema is rejected
      val e3 = intercept[Exception] {
        spark.read.format("graft-paged-http").schema(rowSchema)
          .option("url", srv.url).option("pageSize", pageSize).load().count()
      }
      assert(e3.getMessage.contains("parsePages"), e3.getMessage)
    } finally srv.stop()
  }

  test("A13 DSv2: per-partition throttle spaces requests through the format path") {
    val srv = new MockServer(Map.empty)
    try {
      formatRead(srv.url, "parallelism" -> "1", "minIntervalMs" -> "60").count()
      val ts = srv.requestMillis.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      assert(ts.length == nPages)
      val gaps = ts.drop(1).sliding(2).filter(_.length == 2).map(w => w(1) - w(0)).toSeq
      assert(gaps.forall(_ >= 50), s"throttle gaps too tight: $gaps")
    } finally srv.stop()
  }

  test("A13 fetch→stage→PagedIngest: staged page files feed the existing file-scan recovery") {
    val srv = new MockServer(Map(2 -> Seq(429)))
    try {
      val dir = graft.util.Fixtures.dir("http_staged").toString
      val pages = HttpPagedSource.fetchPages(spark, srv.url, pageSize,
        parallelism = 2, baseDelayMs = 10)
      HttpPagedSource.stagePages(pages, dir)
      // the staged layout is page_N.json — PagedIngest's glob + filename
      // page recovery reads it directly. Payload files hold the wrapped
      // object, so the scan schema is the page wrapper; rows explode out.
      val wrapper = new StructType()
        .add("total", LongType)
        .add("rows", org.apache.spark.sql.types.ArrayType(rowSchema))
      val scanned = PagedIngest.readPages(spark, dir, wrapper)
      assert(scanned.count() == nPages)
      assert(scanned.select("_page").collect().map(_.getInt(0)).sorted
        .sameElements(1 to nPages))
      val rows = scanned.select(col("_page"), explode(col("rows")).as("r"))
      assert(rows.count() == total)
      assert(rows.select("r.id").collect().map(_.getLong(0)).sorted
        .toSeq == (1L to total.toLong))
    } finally srv.stop()
  }
}
