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

  /** ANSI-safe string→long: a digit-run gate for FORM, decimal(20,0)
    * staging (a ≤19-digit run cannot overflow it), then an explicit
    * Long-range check before the narrowing cast — accepts every
    * in-range long INCLUDING 19-digit values, nulls everything else.
    * An unbounded `\d+` guard lets a 20-digit run reach cast() and
    * throw CAST_OVERFLOW under ANSI; a `{1,18}` bound silently
    * rejects valid 19-digit longs that the DuckDB oracle's
    * CAST(... AS BIGINT) parses. */
  def safeLong(c: Column): Column = {
    val d = when(c.rlike("^-?\\d{1,19}$"),
      c.cast(org.apache.spark.sql.types.DecimalType(20, 0)))
    when(d.between(lit(Long.MinValue), lit(Long.MaxValue)), d.cast("long"))
  }

  /** digits-only phone key (geocode-diff-merge.js normalizePhone) */
  def phoneDigits(c: Column): Column = regexp_replace(c, lit("[^0-9]"), lit(""))

  /** hostname sans leading www., empty when not a URL (domainOf) */
  def urlDomain(c: Column): Column =
    regexp_extract(c, "^https?://(?:www\\.)?([^/]+)", 1)

  /** URL canonicalization (SURVEY §2 C55) — the crawl-pipeline
    * normalization run before URL-level dedup and host aggregation,
    * so `HTTP://WWW.Site.COM:80/a/?utm_source=x&id=1#top` and
    * `http://www.site.com/a?id=1` collapse to one key. Rules (the
    * standard safe set — semantics-preserving for any sane server):
    * lowercase scheme and host; drop the default port (80/http,
    * 443/https), keep explicit non-defaults; strip trailing slashes
    * off the path (empty path → "/"); drop tracking parameters
    * (utm_*, gclid, fbclid) and SORT the survivors for an
    * order-insensitive key; drop the fragment (client-side only).
    * Path/query CASE is preserved (case-sensitive on most servers).
    * Pure Column algebra — map-only at any scale; non-URLs (no
    * scheme) pass through unchanged. */
  def canonicalizeUrl(c: Column): Column = {
    val scheme = lower(regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // credentials are not part of the resource identity (and must not
    // leak into dedup keys): user:pass@host drops to host
    val auth = element_at(split(auth0, "@"), -1)
    val host = lower(regexp_extract(auth, "^([^:]*)", 1))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val path0 = regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathStripped = regexp_replace(path0, "/+$", "")
    val pathC = when(pathStripped === "", lit("/")).otherwise(pathStripped)
    // query = after the first '?' BEFORE any '#': a '?' inside the
    // fragment ("/#/route?tab=1") must not leak fragment content into
    // the canonical key (review finding — the naive \? grabbed it)
    val query = regexp_extract(c, "^[^#]*?\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("gclid=") &&
        !p.startsWith("fbclid="))
    val queryC = array_join(array_sort(params), "&")
    val canon = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      pathC,
      when(queryC =!= "", concat(lit("?"), queryC)).otherwise(lit("")))
    // pass through untouched: non-URLs (no scheme) and bracketed IPv6
    // authorities, whose colons defeat the host:port split — mangling
    // them would corrupt the dedup key worse than not normalizing
    when(scheme === "" || auth0.contains("["), c).otherwise(canon)
  }

  /** strip a leading 3-5 digit postal code (normalizeTWAddress) */
  def stripPostal(c: Column): Column =
    regexp_replace(c, lit("^\\s*\\d{3,5}[-\\s]?"), lit(""))

  /** collapse/remove all whitespace (normalizeTWAddress) */
  def stripSpaces(c: Column): Column = regexp_replace(c, lit("\\s+"), lit(""))

  /** drop full/half-width parentheticals (trimToHouseNo) */
  def stripParens(c: Column): Column =
    regexp_replace(c, lit("（[^）]*）|\\([^)]*\\)"), lit(""))

  /** fold 台 -> 臺 so both variants compare equal (taiVariants) */
  def foldTai(c: Column): Column = translate(c, "台", "臺")

  /** 臺 -> 台, the inverse of [[foldTai]] (taiVariants' second element,
    * geocode.js:136-140). `translate` is a single-char map — no regex
    * engine on the million-candidate emission stream. */
  def unfoldTai(c: Column): Column = translate(c, "臺", "台")

  /** keep everything up to and including the first 號 (trimToHouseNo) */
  def trimToHouseNo(c: Column): Column = {
    val m = regexp_extract(c, "^([^號]*號)", 1)
    when(m =!= "", m).otherwise(c)
  }

  /** drop the country name 臺灣/台灣 + RepublicofChina
    * (normalizeTWAddress, geocode.js:128-133). Safe post-[[foldTai]]:
    * only the exact 臺灣 pair is removed, 臺北/臺中 survive. */
  def stripCountry(c: Column): Column =
    regexp_replace(c, lit("臺灣|(?i)RepublicofChina"), lit(""))

  /** full canonicalization chain used before geocode candidate building */
  def normalizeAddress(c: Column): Column =
    trimToHouseNo(foldTai(stripSpaces(stripParens(stripPostal(c)))))

  /** looksLikeAddress gate (geocode.js:186-188): must contain a road
    * token and a house number. Plain contains-chains, not regex —
    * identical semantics (大道 is subsumed by 道 in the reference's
    * alternation) and an order of magnitude cheaper on the hot
    * million-candidate filter, where Catalyst inlines this predicate
    * into every consumer. */
  def looksLikeAddress(c: Column): Column =
    (c.contains("路") || c.contains("街") || c.contains("巷") ||
     c.contains("弄") || c.contains("道")) && c.contains("號")

  /** removeNeighborhoodLi (geocode.js:191-195): strip a neighborhood
    * 里 token when a road token follows before the house number.
    *
    * The reference uses a lookahead (`X里(?=[^號]*?路)`); RE2 (the
    * oracle engine) has no lookahead, so this consumes the road span
    * and writes it back via a capture. One application diverges only
    * when two 里 tokens stack before one road token — callers apply
    * it twice (fixpoint for the depth seen in real rosters). */
  def removeLi(c: Column): Column =
    regexp_replace(c,
      lit("[一-龥]{1,4}里([^號]*?(?:路|街|巷|弄|道|大道))"), lit("$1"))

  private val zhSections =
    Seq("一" -> 1, "二" -> 2, "三" -> 3, "四" -> 4, "五" -> 5,
        "六" -> 6, "七" -> 7, "八" -> 8, "九" -> 9, "十" -> 10)

  /** sectionArabicVariant (geocode.js:156-159): 一段..十段 -> 1段..10段
    * (the last numeral before 段 converts: 二十一段 -> 二十1段, same as
    * the reference). Native one-pass scan
    * ([[graft.expressions.ZhSectionArabic]]) — the geocode ladder
    * evaluates this at 7 sites per row, and the chained-regex form
    * cost 10 regex traversals per site. */
  def sectionArabic(c: Column): Column =
    call_function("graft_section_arabic", c)

  /** the chained-regexp_replace formulation — kept as the semantics
    * reference; a spec asserts bit-equality with the native scan. */
  def sectionArabicChained(c: Column): Column =
    zhSections.foldLeft(c) { case (acc, (zh, n)) =>
      regexp_replace(acc, lit(s"${zh}段"), lit(s"${n}段"))
    }

  /** parseRegionParts (geocode.js:206-210): leading 縣/市 county.
    * Deviation (documented): parsed from the *normalized* address —
    * the reference anchors on the raw string, so a postal-code prefix
    * silently yields no county. */
  def parseCounty(c: Column): Column =
    regexp_extract(c, "^([一-龥]{2,3}[縣市])([一-龥]{1,3}[區鄉鎮市])?", 1)

  /** parseRegionParts district component (區/鄉/鎮/市 after county) */
  def parseDistrict(c: Column): Column =
    regexp_extract(c, "^([一-龥]{2,3}[縣市])([一-龥]{1,3}[區鄉鎮市])?", 2)

  /** hasRegionInfo (geocode.js:211-213) */
  def hasRegionInfo(c: Column): Column =
    c.rlike("[縣市].*[區鄉鎮市]") || c.rlike("[一-龥]{2,3}[縣市]")

  /** clampQuery (geocode.js:216-219): if the URI-encoded form exceeds
    * `maxBytes`, truncate to `fallbackChars` characters. Encoded
    * length is computed exactly — unreserved ASCII stays 1 byte,
    * every other byte percent-encodes to 3 — by the native one-pass
    * byte counter ([[graft.expressions.UriEncodedLength]]; the
    * previous regex-strip count ran the regex engine per emission and
    * dominated the geocode ladder's clamp gate on long addresses).
    * The cheap `3*octet <= maxBytes` short-circuit still skips the
    * scan for short strings, since this tree is inlined into every
    * consumer by CollapseProject. */
  def clampQuery(c: Column, maxBytes: Int = 512, fallbackChars: Int = 120): Column = {
    val encoded = call_function("graft_urilen", c)
    when(octet_length(c) * 3 <= maxBytes, c)
      .otherwise(when(encoded <= maxBytes, c).otherwise(substring(c, 1, fallbackChars)))
  }

  /** 35-1號 -> 35之1號 (hyphenNumberVariants, geocode.js:162-169) */
  def hyphenToZhi(c: Column): Column =
    regexp_replace(c, lit("(\\d+)-(\\d+)號"), lit("$1之$2號"))

  /** 35-1號 -> 35號 */
  def hyphenDropSub(c: Column): Column =
    regexp_replace(c, lit("(\\d+)-(\\d+)號"), lit("$1號"))

  /** drop the 弄 component (alleyDegradeVariants, geocode.js:172-183).
    * TW addresses write the number BEFORE the unit (12巷3弄45號), so the
    * component is `<n>弄`; the reference's regexes instead match
    * unit-before-digits (`弄3號`→`號`, swallowing the house number)
    * with a separate house-number-restore fallback — on well-formed
    * addresses they are no-ops, so the reference's emitted alley
    * candidates can differ. Intent (degrade alley detail, keep the
    * house number) is preserved here, not the bug; listed in
    * [[graft.operators.Geocode.expand]]'s documented deviations. */
  def dropNong(c: Column): Column =
    regexp_replace(c, lit("\\d+(?:-\\d+)?弄"), lit(""))

  /** drop the 巷 component only (alleyDegradeVariants middle rung) */
  def dropXiang(c: Column): Column =
    regexp_replace(c, lit("\\d+(?:-\\d+)?巷"), lit(""))

  /** drop both 巷 and 弄 components */
  def dropXiangNong(c: Column): Column =
    dropXiang(dropNong(c))

  // --- reference-EXACT alleyDegradeVariants rungs (geocode.js:172-183).
  // The reference regexes read unit-before-digits (`弄3號`→`號`), which
  // on well-formed `12巷3弄45號` swallows the house number and promotes
  // the alley number into its place — reproduced verbatim here (opt-in
  // via Geocode.expand(refAlley = true)) for byte parity with the
  // reference's emitted candidate lists; the corrected rungs above stay
  // the default. JS `.replace` without /g is first-occurrence-only: the
  // `^(.*?)` lazy prefix anchors Spark's replace-all to the first match.

  /** `s.replace(/弄\d+(?:-\d+)?號/, '號')` — first occurrence */
  def refAlleyNong(c: Column): Column =
    regexp_replace(c, lit("^(.*?)弄\\d+(?:-\\d+)?號"), lit("$1號"))

  /** `s.replace(/巷\d+(?:-\d+)?(?=(?:弄\d+(?:-\d+)?)?號)/, '')` — the
    * lookahead emulated by capturing and restoring the tail */
  def refAlleyXiang(c: Column): Column =
    regexp_replace(c, lit("^(.*?)巷\\d+(?:-\\d+)?((?:弄\\d+(?:-\\d+)?)?號)"), lit("$1$2"))

  /** global 巷\d+/弄\d+ removal + house-number-restore fallback when the
    * result lost its 號 (geocode.js:175-180) */
  def refAlleyBoth(c: Column): Column = {
    val stripped = regexp_replace(
      regexp_replace(c, lit("巷\\d+(?:-\\d+)?"), lit("")),
      lit("弄\\d+(?:-\\d+)?"), lit(""))
    when(stripped.rlike("號"), stripped)
      .otherwise(concat(stripped, regexp_extract(c, "(\\d+(?:-\\d+)?號)", 1)))
  }

  private val roadOnlyPat =
    "^(.+?(?:大道|道|路|街))(\\d+段)?(?:\\d+(?:-\\d+)?巷)?(?:\\d+(?:-\\d+)?弄)?(\\d+(?:-\\d+)?)號$"

  /** roadOnlyVariant (geocode.js:221-227): road(+Arabic 段)+number,
    * dropping 巷/弄 detail. Applies [[sectionArabic]] first, exactly
    * like the reference; empty string when the anchored shape does
    * not match. */
  def roadOnly(c: Column): Column = roadOnlyOfSection(sectionArabic(c))

  /** [[roadOnly]] for input already in Arabic-段 form — lets callers
    * stage the sectionArabic chain once per row instead of four times
    * per road-only evaluation (codegen size). */
  def roadOnlyOfSection(t: Column): Column =
    when(t.rlike(roadOnlyPat),
      concat(regexp_extract(t, roadOnlyPat, 1),
             regexp_extract(t, roadOnlyPat, 2),
             regexp_extract(t, roadOnlyPat, 3), lit("號")))
      .otherwise(lit(""))

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

  /** Chinese-numeral tokens preceding 街|巷|弄 → Arabic, EACH with its
    * own value (streetOrdinalArabicVariants' per-match callback,
    * geocode.js:117-125) — one native scan
    * ([[graft.expressions.ZhStreetArabic]]; a per-token Column chain
    * would nest the input expression combinatorially and trip the
    * CollapseProject inlining trap the ladder documents). */
  def zhStreetNumeralToArabic(c: Column): Column =
    call_function("graft_street_arabic", c)

  /** [[zhStreetNumeralToArabic]], but NULL when there is no token to
    * convert (or the input is null) — the geocode ladder's ordinal base
    * blocks use this so the no-op case short-circuits: a null base
    * flows through every downstream regex derivation as null (codegen
    * checks isNull before running the regex), making the extra blocks
    * cost one token scan per row instead of a full derivation chain. */
  def zhStreetNumeralToArabicOrNull(c: Column): Column =
    call_function("graft_street_arabic_ornull", c)
}
