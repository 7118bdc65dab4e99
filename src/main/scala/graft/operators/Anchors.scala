package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Html, Norm}

/** Anchor-text aggregation — the web-graph primitive behind anchor
  * corpora (per-target link text is a high-signal relevance label;
  * the classic use is query/title training pairs and document
  * expansion a la DSI/anchor-based retrieval datasets).
  *
  * Extends the reference's single-anchor parse (parseAnchor,
  * /root/reference/src/index.js:20-30) to ALL anchors of a page, then
  * inverts the link graph: canonicalize every href (C55 — tracking
  * params, case, ports, fragments must not split a target's anchor
  * profile), and per canonical target aggregate the incoming texts.
  *
  * Scale shape: extraction is map-only regexp over the page; the
  * inversion is one shuffle keyed by (target, text) with map-side
  * partial counts — anchors ride as (url-hash-sized key, text) rows,
  * never pages; the per-target top-m pick is a bounded window over
  * the (target, text) LEVEL (distinct texts per target, not raw
  * anchors). Nothing is driver-side.
  */
object Anchors {

  private val AnchorPat = "<a[^>]*href=['\"]([^'\"]+)['\"][^>]*>([^<]*)</a>"

  /** all (href, text) pairs of a page as a zipped array column.
    * Entities unescape BEFORE extraction (the A2 anchorHref order):
    * an HTML-correct href like `?a=1&amp;b=2` must canonicalize to
    * the same target as its raw `?a=1&b=2` form — unescaping only
    * the text would split one target's anchor profile. */
  def anchorPairs(html: Column): Column = {
    val u = Html.unescapeEntities(html)
    arrays_zip(
      regexp_extract_all(u, lit(AnchorPat), lit(1)).as("href"),
      regexp_extract_all(u, lit(AnchorPat), lit(2)).as("text"))
  }

  /** Per canonical target: total incoming anchors, distinct anchor
    * texts, and the top-`m` texts by (count desc, text asc) joined
    * with '|'. Output: (target_url, n_anchors, n_texts, top_texts). */
  def anchorAgg(pages: DataFrame, htmlCol: String, m: Int = 3): DataFrame = {
    require(m >= 1, s"anchorAgg: m must be >= 1, got $m")
    val pairs = pages
      .select(explode(anchorPairs(col(htmlCol))).as("a"))
      .select(
        Norm.canonicalizeUrl(col("a.href")).as("target_url"),
        trim(col("a.text")).as("text")) // already unescaped page-level
      .filter(col("target_url") =!= "" && col("text") =!= "")
    val counted = pairs.groupBy("target_url", "text")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("target_url").orderBy(col("cnt").desc, col("text"))
    counted.withColumn("rnk", row_number().over(w))
      .groupBy("target_url")
      .agg(
        sum("cnt").as("n_anchors"),
        count(lit(1)).as("n_texts"),
        // collect_list skips the null the when() leaves on rows past m
        concat_ws("|", transform(
          sort_array(collect_list(
            when(col("rnk") <= m, struct(col("rnk"), col("text"))))),
          e => e.getField("text"))).as("top_texts"))
  }
}
