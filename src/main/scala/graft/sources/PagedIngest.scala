package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Paged-API ingestion (SURVEY §2 A13).
  *
  * The reference pulls a JSON datagrid page by page (total-driven loop,
  * 10 rows/page — http_crawl.js:46-79, 155-186) and unions the pages.
  * The Spark-native equivalent: page payloads land as files (one JSON
  * array or JSONL file per page, e.g. from a fetcher fleet) and a single
  * schema'd scan reads them all — ordering, dedup and total checks are
  * relational concerns downstream, not fetch-loop state.
  */
object PagedIngest {

  /** page number from the file name, or NULL when absent. Under ANSI
    * mode (Spark 4 default) `''.cast("int")` THROWS, so a stray
    * non-numeric file (`page_final.json` passes the glob) or an
    * int-overflowing digit run must short-circuit to null instead of
    * failing the whole scan; `{1,9}` + a no-more-digits lookahead
    * keeps every accepted run inside Int range. */
  private def pageFromFileName: org.apache.spark.sql.Column = {
    val digits = regexp_extract(input_file_name(), "page_(\\d{1,9})(?!\\d)", 1)
    when(digits =!= "", digits.cast("int"))
  }

  /** read all page files matching `pagePattern` under `dir` with an
    * explicit schema; `_page` is recovered from the filename so
    * page-level provenance (and re-fetch of a bad page) stays possible. */
  def readPages(spark: SparkSession, dir: String, schema: StructType,
                pagePattern: String = "page_*.json"): DataFrame =
    spark.read.schema(schema)
      .option("multiLine", "true")
      .option("pathGlobFilter", pagePattern)
      .json(dir)
      .withColumn("_page", pageFromFileName)

  /** [[readPages]] with corrupt-page capture: malformed page payloads
    * land as rows with the raw text in `_corrupt` (PERMISSIVE mode)
    * instead of failing the scan or silently vanishing — at fleet
    * scale some fetcher output is always garbage, and the re-fetch
    * loop needs to SEE which pages were bad (`_page` + `_corrupt`
    * non-null), not discover a count mismatch later.
    *
    * Spark restriction: a query that references ONLY the corrupt
    * column from a raw JSON source throws
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN — `.cache()` the frame (or
    * select at least one data column) before projecting down to
    * `_page`/`_corrupt` for the re-fetch list. */
  def readPagesPermissive(spark: SparkSession, dir: String, schema: StructType,
                          pagePattern: String = "page_*.json"): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("pathGlobFilter", pagePattern)
      .json(dir)
      .withColumn("_page", pageFromFileName)

  /** consistency gate: declared total (from the API's `total` field)
    * vs rows actually ingested — the check-total analog at ingest time. */
  def totalMatches(df: DataFrame, declaredTotal: Long): Boolean =
    df.count() == declaredTotal

  /** Page-count extraction from a pager's status text, the Playwright
    * variant's readTotalPages (index_taoyuan.js:137-151): prefer an
    * explicit 共N頁, else estimate ceil(records / pageSize) from
    * 顯示1到10,共X記錄, else 1. Drives the fetch fan-out when the API
    * publishes no machine-readable total. */
  def parseTotalPages(statusText: String, pageSize: Int = 10): Int = {
    // garbage/adversarial digit runs must degrade, not throw: parse as
    // long with an Int clamp (the JS reference's parseInt is similarly
    // total on any digit string)
    // digit runs may carry thousands separators (共1,234記錄)
    def num(s: String): Option[Long] = s.replace(",", "").toLongOption
    val direct = "共\\s*([\\d,]*\\d)\\s*頁".r.findFirstMatchIn(statusText)
      .flatMap(m => num(m.group(1)))
    val estimated = "共\\s*([\\d,]*\\d)\\s*記錄".r.findFirstMatchIn(statusText)
      .flatMap(m => num(m.group(1))).map(r => (r + pageSize - 1) / pageSize)
    math.max(1L, math.min(Int.MaxValue.toLong,
      direct.orElse(estimated).getOrElse(1L))).toInt
  }
}
