package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Agg, Norm}

/** Corpus-level filters of the training-data pipeline (SURVEY §2C):
  * source blocklisting and metric-outlier trimming — the first two
  * gates of every web-scale ingest (cf. the domain filters and length
  * filters of C4/RefinedWeb-style cleaning).
  */
object Filtering {

  /** Drop rows whose URL's registrable domain is on a blocklist.
    *
    * The blocklist is dimension-sized by nature (thousands of domains
    * vs billions of documents), so it broadcasts and the corpus side
    * streams through a left-anti hash join — zero shuffle of the
    * corpus at any scale. Domain extraction is [[Norm.urlDomain]]
    * (hostname sans leading www., empty when not a URL — non-URLs are
    * never blocked). */
  def urlBlocklist(df: DataFrame, blocked: DataFrame, urlCol: String,
                   domainCol: String = "domain"): DataFrame =
    df.withColumn("_dom", Norm.urlDomain(col(urlCol)))
      .join(broadcast(blocked.select(col(domainCol).as("_dom"))),
        Seq("_dom"), "left_anti")
      .drop("_dom")

  /** C70 — the C4 cleaning rules (Raffel et al. 2020, §2.2), the most
    * widely replicated web-corpus line/page filter set:
    *
    *  - keep a LINE only if it ends in terminal punctuation, has at
    *    least `minWordsPerLine` whitespace words, and does not mention
    *    "javascript" (case-insensitive);
    *  - keep the PAGE only if at least `minLines` lines survive and
    *    the page contains neither "lorem ipsum" nor "{" (code);
    *  - a kept page's text is its surviving lines re-joined.
    *
    * Pure higher-order Column algebra over the split line array —
    * map-only whole-stage codegen at any scale, no shuffle, no UDF.
    * Returns (id, n_lines, n_lines_kept, kept, clean_text) — the
    * audit-friendly form (the drop REASON is reconstructible); filter
    * on `kept` to materialize the cleaned corpus. */
  def c4Filters(df: DataFrame, idCol: String, pageCol: String,
                minWordsPerLine: Int = 5, minLines: Int = 3,
                keepCols: Seq[String] = Nil): DataFrame = {
    val lines = split(col(pageCol), "\n")
    val keptLines = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, " "), w => w =!= "")) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    val carried = keepCols.map(col)
    df.select(col(idCol) +: carried :+ lines.as("_lines") :+ keptLines.as("_kept")
        :+ col(pageCol).as("_page"): _*)
      .select(col(idCol) +: carried :+
        size(col("_lines")).as("n_lines") :+
        size(col("_kept")).as("n_lines_kept") :+
        (size(col("_kept")) >= minLines &&
          !lower(col("_page")).contains("lorem ipsum") &&
          !col("_page").contains("{")).as("kept") :+
        col("_kept").as("_keptl"): _*)
      .withColumn("clean_text",
        when(col("kept"), array_join(col("_keptl"), "\n")).otherwise(lit("")))
      .drop("_keptl")
  }

  /** Exact token-phrase matching against a blocklist (C50) — the
    * policy-filter primitive (banned phrases, boilerplate sentences,
    * canary strings): every occurrence of every listed phrase in
    * every document, at token granularity.
    *
    * Relational shape: the phrase list is dimension-scale and
    * BROADCASTS tokenized; candidate positions come from a map-side
    * equi-join on the phrase's FIRST token (so a doc row only fans
    * out where a phrase could start), and each candidate verifies by
    * array equality against the doc's token WINDOW — posexplode →
    * window slice → broadcast join → filter, all before any shuffle;
    * the corpus never shuffles at all. The window is cut to the
    * longest phrase's length BEFORE the join (one dimension-scale
    * driver lookup), so a candidate row carries O(max phrase len)
    * tokens — the r8 shape carried the doc's FULL token array on
    * every exploded row, O(n²) in-flight width on long documents
    * (r8 ADVICE). Overlapping and repeated occurrences all emit.
    * Output: (id, phrase, pos) — compose with a left-anti join
    * on id for drop-the-document semantics, or with C30's island
    * merge for scrub-the-span. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrases: DataFrame, phraseCol: String = "phrase"): DataFrame = {
    val pt = phrases.select(col(phraseCol).as("phrase"),
        graft.functions.Text.wsTokens(col(phraseCol)).as("_pts"))
      .filter(size(col("_pts")) >= 1)
    // dimension-scale driver traffic (the BPE-rule-row discipline):
    // the longest phrase bounds the verification window
    val maxLen = Option(pt.agg(max(size(col("_pts")))).collect()(0).get(0))
      .map(_.asInstanceOf[Int]).getOrElse(1)
    docs.select(col(idCol), graft.functions.Text.wsTokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(col("_toks")).as(Seq("pos", "_tok")))
      .select(col(idCol), col("pos"), col("_tok"),
        slice(col("_toks"), col("pos") + 1, lit(maxLen)).as("_win"))
      .join(broadcast(pt), col("_tok") === element_at(col("_pts"), 1))
      .filter(slice(col("_win"), lit(1), size(col("_pts"))) === col("_pts"))
      .select(col(idCol), col("phrase"), col("pos").cast("long").as("pos"))
  }

  /** Flag rows whose `valCol` falls outside the corpus's
    * [loQ, hiQ] interpolated-quantile bounds (the length/score outlier
    * trim of corpus cleaning).
    *
    * Two passes, both scale-safe: the bounds reduce to ONE row
    * ([[Agg.interpolatedPercentiles]] — deterministic interpolation,
    * bit-reproducible in any engine) and broadcast back over the
    * corpus as a 1-row cross join; the corpus itself never reshuffles.
    * Exact global quantiles concentrate the metric column (not the
    * rows) on one sort partition — for 100 TB use approx_percentile
    * bounds instead, same plan shape. */
  def quantileOutliers(df: DataFrame, valCol: String,
                       loQ: Double, hiQ: Double): DataFrame = {
    val bounds = Agg.interpolatedPercentiles(
      df.select(lit(1).as("_g"), col(valCol)), "_g", valCol,
      Seq("lo_bound" -> loQ, "hi_bound" -> hiQ)).drop("_g")
    df.crossJoin(broadcast(bounds))
      .withColumn("is_outlier",
        col(valCol).cast("double") < col("lo_bound") ||
        col(valCol).cast("double") > col("hi_bound"))
  }
}
