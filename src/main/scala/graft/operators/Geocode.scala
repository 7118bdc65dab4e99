package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Norm

/** Geocode candidate-query expansion (SURVEY §2 A15) — the reference's
  * buildQueryCandidates ladder (geocode.js:197-295): composite-address
  * segment split, neighborhood-里 removal, region prefixing, then per
  * segment the variant ladder (段 Arabic form, hyphen sub-numbers,
  * alley degrade, road-only with county/district/org combinations),
  * each candidate clamped (clampQuery) and gated by looksLikeAddress.
  *
  * Spark-first shape: all variants are staged Column projections (one
  * regex chain evaluated once per row, whole-stage codegen), emission
  * is one explode of (candidate, rank) structs, and the reference's
  * insertion-ordered Set dedup is `groupBy(candidate).min(rank)` — a
  * map-side-combinable aggregation instead of a per-row O(n²)
  * first-occurrence scan, so the plan holds at any scale.
  */
object Geocode {

  /** Ladder slots per hyphen variant, mirroring the reference's
    * candidate insertion order (geocode.js:258-274): the variant
    * itself, its org-prefixed twin, the road-only form with
    * county/district/org combinations, then the three alley-degraded
    * forms (each with org twin). 15 slots whether or not an org name
    * is present — absent combinations emit null and are filtered, so
    * ranks are stable across modes. */
  private val SlotsPerH = 15

  /** explode candidates to (id, candidate, rank) rows.
    *
    * `rank` is the global emission index (segment-major, then ladder
    * order); after dedup each surviving candidate carries the rank of
    * its first occurrence — the distributed form of the reference's
    * sequential Set building.
    *
    * Documented deviations from geocode.js (each a bug avoided, not a
    * semantic change — see the cited helpers): postal codes are
    * stripped once up front so later segments starting with a 3+-digit
    * lane number are not eaten (normalizeTWAddress would); county is
    * parsed from the normalized address (the reference anchors on the
    * raw string, so any postal prefix yields no county); the
    * conjunction split (geocode.js:201) requires a preceding 號 — the
    * reference replaces every bare 及/和/與, which dismembers road
    * names like 和平東路/和緯路; candidates are emitted in canonical
    * 臺 form only (the reference emits the 臺/台 pair — derivable via
    * Norm.foldTai and its inverse).
    */
  def expand(df: DataFrame, idCol: String, addrCol: String,
             orgCol: Option[String] = None): DataFrame = {
    val org = orgCol.map(col).getOrElse(lit("")).as("_org")

    // -- stage 1: normalize + composite split (geocode.js:197-204) --
    val pre = Norm.stripCountry(Norm.foldTai(Norm.stripSpaces(
      Norm.stripPostal(Norm.stripParens(col(addrCol))))))
    val s1 = df.select(col(idCol), org, pre.as("_pre"))
    val head = regexp_extract(col("_pre"), "^[^;；]*", 0)
    val s2 = s1.select(col(idCol), col("_org"), col("_pre"),
      Norm.removeLi(Norm.removeLi(head)).as("_head"))
    val canon = regexp_replace(
      regexp_replace(col("_head"), lit("[，,。.]"), lit("、")),
      lit("號[及和與]"), lit("號、"))
    val s3 = s2.select(col(idCol), col("_org"),
      Norm.parseCounty(col("_pre")).as("_cty"),
      Norm.parseDistrict(col("_pre")).as("_dst"),
      posexplode(filter(split(canon, "、"), s => s =!= ""))
        .as(Seq("_segi", "_seg")))

    // -- stage 2: region prefix + bases (geocode.js:240-249) --
    val segr = when(Norm.hasRegionInfo(col("_seg")), col("_seg"))
      .otherwise(concat(col("_cty"), col("_dst"), col("_seg")))
    val s4 = s3.select(col(idCol), col("_org"), col("_cty"), col("_dst"),
      col("_segi"), Norm.trimToHouseNo(segr).as("_b0"))
    val s5 = s4.withColumn("_b1", Norm.sectionArabic(col("_b0")))

    // -- stage 3: hyphen variants per base (geocode.js:162-169) --
    val hCols = for (bi <- 0 to 1; hi <- 0 to 2) yield {
      val b = col(s"_b$bi")
      val h = hi match {
        case 0 => b
        case 1 => Norm.hyphenToZhi(b)
        case 2 => Norm.hyphenDropSub(b)
      }
      h.as(s"_h${bi}$hi")
    }
    val s6 = s5.select(Seq(col(idCol), col("_org"), col("_cty"), col("_dst"),
      col("_segi")) ++ hCols: _*)

    // -- stage 4: alley degrade + road-only per hyphen variant --
    // sectionArabic staged once per h (roadOnly needs it 4×)
    val hNames = for (bi <- 0 to 1; hi <- 0 to 2) yield s"_h${bi}$hi"
    val secCols = hNames.map(h => Norm.sectionArabic(col(h)).as(s"${h}s"))
    val s6b = s6.select(s6.columns.map(col) ++ secCols: _*)
    val derived = hNames.flatMap { h =>
      Seq(Norm.dropNong(col(h)).as(s"${h}n"),
          Norm.dropXiang(col(h)).as(s"${h}x"),
          Norm.dropXiangNong(col(h)).as(s"${h}z"),
          Norm.roadOnlyOfSection(col(s"${h}s")).as(s"${h}r"))
    }
    val s7 = s6b.select(s6b.columns.map(col) ++ derived: _*)

    // -- stage 5: emission in reference insertion order --
    // Two-level explode keeps each generated method under Janino's
    // size limit (a flat 90-struct array breaks whole-stage codegen):
    // first explode one 5-field struct per hyphen variant (pure column
    // refs), then emit the 15 ladder slots from those fields.
    val hStructs = hNames.map { h =>
      struct(col(h).as("h"), col(s"${h}n").as("n"), col(s"${h}x").as("x"),
             col(s"${h}z").as("z"), col(s"${h}r").as("r"))
    }
    val s8 = s7.select(col(idCol), col("_org"), col("_cty"), col("_dst"),
      col("_segi"), posexplode(array(hStructs: _*)).as(Seq("_hi", "_hs")))

    val hasOrg = col("_org") =!= ""
    val ro = col("_hs.r"); val hasRo = ro =!= ""
    val cty = col("_cty"); val dst = col("_dst")
    val slots: Seq[(Column, Column)] = Seq(
      col("_hs.h")                  -> lit(true),
      concat(col("_org"), col("_hs.h")) -> hasOrg,
      ro                            -> hasRo,
      concat(col("_org"), ro)       -> (hasOrg && hasRo),
      concat(cty, ro)               -> (hasRo && cty =!= ""),
      concat(col("_org"), cty, ro)  -> (hasOrg && hasRo && cty =!= ""),
      concat(dst, ro)               -> (hasRo && dst =!= ""),
      concat(col("_org"), dst, ro)  -> (hasOrg && hasRo && dst =!= ""),
      concat(cty, dst, ro)          -> (hasRo && (cty =!= "" || dst =!= "")),
      col("_hs.n")                  -> lit(true),
      concat(col("_org"), col("_hs.n")) -> hasOrg,
      col("_hs.x")                  -> lit(true),
      concat(col("_org"), col("_hs.x")) -> hasOrg,
      col("_hs.z")                  -> lit(true),
      concat(col("_org"), col("_hs.z")) -> hasOrg)
    val entries = slots.zipWithIndex.map { case ((q, cond), slot) =>
      when(cond, struct(q.as("q"), lit(slot).as("slot")))
    }
    val perSeg = lit(hNames.length * SlotsPerH)
    s8.select(col(idCol), col("_segi"), col("_hi"),
        explode(filter(array(entries: _*), e => e.isNotNull)).as("_c"))
      .select(col(idCol),
        Norm.clampQuery(col("_c.q")).as("candidate"),
        (col("_segi") * perSeg + col("_hi") * lit(SlotsPerH) + col("_c.slot"))
          .as("_rank"))
      .filter(Norm.looksLikeAddress(col("candidate")))
      .groupBy(col(idCol), col("candidate"))
      .agg(min(col("_rank")).cast("int").as("rank"))
  }

  /** resolve each row against a (query -> lat/lng) cache table taking
    * the best-ranked hit — the distributed "first variant that hits". */
  def resolveAgainstCache(df: DataFrame, idCol: String, addrCol: String,
                          cache: DataFrame, cacheKey: String): DataFrame = {
    val hits = expand(df, idCol, addrCol)
      .join(cache, col("candidate") === col(cacheKey))
      .groupBy(col(idCol))
      .agg(min(struct(col("rank"), col("candidate"))).as("best"))
      .select(col(idCol), col("best.candidate").as("matched_query"))
    df.join(hits, Seq(idCol), "left")
  }
}
