package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Normalization functions from the reference's cleaning layer, as pure
  * Column expressions (whole-stage-codegen friendly).
  *
  * Sources: phone/domain keys (geocode-diff-merge.js:16-21), Taiwan
  * address canonicalization (geocode.js:128-168), Chinese-numeral
  * street tokens (geocode.js:102-125).
  */
object Norm {

  /** digits-only phone key (geocode-diff-merge.js normalizePhone) */
  def phoneDigits(c: Column): Column = regexp_replace(c, lit("[^0-9]"), lit(""))

  /** hostname sans leading www., empty when not a URL (domainOf) */
  def urlDomain(c: Column): Column =
    regexp_extract(c, "^https?://(?:www\\.)?([^/]+)", 1)

  /** strip a leading 3-5 digit postal code (normalizeTWAddress) */
  def stripPostal(c: Column): Column =
    regexp_replace(c, lit("^\\s*\\d{3,5}[-\\s]?"), lit(""))

  /** collapse/remove all whitespace (normalizeTWAddress) */
  def stripSpaces(c: Column): Column = regexp_replace(c, lit("\\s+"), lit(""))

  /** drop full/half-width parentheticals (trimToHouseNo) */
  def stripParens(c: Column): Column =
    regexp_replace(c, lit("（[^）]*）|\\([^)]*\\)"), lit(""))

  /** fold 台 -> 臺 so both variants compare equal (taiVariants) */
  def foldTai(c: Column): Column = regexp_replace(c, lit("台"), lit("臺"))

  /** keep everything up to and including the first 號 (trimToHouseNo) */
  def trimToHouseNo(c: Column): Column = {
    val m = regexp_extract(c, "^([^號]*號)", 1)
    when(m =!= "", m).otherwise(c)
  }

  /** full canonicalization chain used before geocode candidate building */
  def normalizeAddress(c: Column): Column =
    trimToHouseNo(foldTai(stripSpaces(stripParens(stripPostal(c)))))

  /** looksLikeAddress gate (geocode.js:186-188): must contain a road
    * token and a house number. */
  def looksLikeAddress(c: Column): Column =
    c.rlike("(路|街|巷|弄|大道)") && c.rlike("號")

  /** 35-1號 -> 35之1號 (hyphenNumberVariants, geocode.js:162-169) */
  def hyphenToZhi(c: Column): Column =
    regexp_replace(c, lit("(\\d+)-(\\d+)號"), lit("$1之$2號"))

  /** 35-1號 -> 35號 */
  def hyphenDropSub(c: Column): Column =
    regexp_replace(c, lit("(\\d+)-(\\d+)號"), lit("$1號"))

  /** drop the 弄 component (alleyDegradeVariants, geocode.js:172-183).
    * TW addresses write the number BEFORE the unit (12巷3弄45號), so the
    * component is `<n>弄`; the reference's suffix-form regex instead
    * swallows the house number — intent (degrade alley detail, keep the
    * house number) is preserved here, not the bug. */
  def dropNong(c: Column): Column =
    regexp_replace(c, lit("\\d+(?:-\\d+)?弄"), lit(""))

  /** drop both 巷 and 弄 components */
  def dropXiangNong(c: Column): Column =
    regexp_replace(dropNong(c), lit("\\d+(?:-\\d+)?巷"), lit(""))

  /** road + house number only (roadOnlyVariant, geocode.js:221-227):
    * first road token plus the trailing house number. */
  def roadOnly(c: Column): Column = {
    val road = regexp_extract(c, "^(.*?(?:大道|路|街))", 1)
    val house = regexp_extract(c, "(\\d+(?:之\\d+)?號)", 1)
    when(road =!= "" && house =!= "", concat(road, house)).otherwise(lit(""))
  }

  private val zhDigits = Seq("零" -> 0, "〇" -> 0, "一" -> 1, "二" -> 2, "兩" -> 2,
    "三" -> 3, "四" -> 4, "五" -> 5, "六" -> 6, "七" -> 7, "八" -> 8, "九" -> 9)

  private def zhDigitValue(c: Column): Column =
    zhDigits.foldLeft(lit(0)) { case (acc, (zh, v)) => when(c === zh, lit(v)).otherwise(acc) }

  /** numeric value of a Chinese numeral string (1..99 grammar: [X]十[Y]) */
  def zhNumeralValue(c: Column): Column = {
    val tens = when(c.rlike("^[一二兩三四五六七八九]十"), zhDigitValue(substring(c, 1, 1)))
      .when(c.startsWith("十"), lit(1))
      .otherwise(lit(0))
    val last = substring(c, -1, 1)
    val ones = when(last === "十", lit(0)).otherwise(zhDigitValue(last))
    (tens * 10 + ones).cast("int")
  }

  /** replace the first Chinese-numeral token preceding 街|巷|弄 with its
    * Arabic form (streetOrdinalArabicVariants; first occurrence — repeat
    * the call for multi-token addresses). */
  def zhStreetNumeralToArabic(c: Column): Column = {
    val pat = "[零〇一二兩三四五六七八九十]{1,3}(?=[街巷弄])"
    val token = regexp_extract(c, s"($pat)", 1)
    when(token === "", c).otherwise(
      regexp_replace(c, lit(pat), zhNumeralValue(token).cast("string")))
  }
}
