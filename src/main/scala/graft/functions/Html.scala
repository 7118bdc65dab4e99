package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML-fragment extraction as pure Column expressions (codegen'd
  * regexp/replace chains — no UDFs).
  *
  * Re-expresses the reference's anchor parsing: `parseAnchor` /`unesc`
  * in /root/reference/src/index.js:20-30 (text + href from an `<a>`
  * fragment, entity unescape, tag strip).
  */
object Html {

  /** unescape the entity set the reference handles: < > & &amp; */
  def unescapeEntities(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, lit("\\\\u003c"), lit("<")),
          lit("\\\\u003e"), lit(">")),
        lit("\\\\u0026"), lit("&")),
      lit("&amp;"), lit("&"))

  /** strip all tags */
  def stripTags(c: Column): Column = regexp_replace(c, lit("<[^>]*>"), lit(""))

  /** href of the first anchor, empty string when absent */
  def anchorHref(c: Column): Column =
    regexp_extract(unescapeEntities(c), "<a[^>]*href=['\"]([^'\"]+)['\"]", 1)

  /** visible text of the anchor (tags stripped, entities unescaped);
    * falls back to the tag-stripped input when no anchor matches */
  def anchorText(c: Column): Column = {
    val u = unescapeEntities(c)
    val inner = regexp_extract(u, "<a[^>]*>(.*?)</a>", 1)
    stripTags(when(inner =!= "", inner).otherwise(u))
  }

  /** the reference maps sentinel '無' (or a supplied sentinel) to null */
  def sentinelToNull(c: Column, sentinel: String): Column =
    when(c === sentinel, lit(null)).otherwise(c)
}
