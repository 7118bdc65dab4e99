package graft

import org.apache.spark.sql.functions._
import graft.operators.Geocode

class GeocodeSpec extends SparkSpec {
  import spark.implicits._

  test("A15 candidate ladder: ordered, deduplicated, address-gated") {
    val df = Seq((1L, "106 台北市大安區和平東路12巷3弄45-2號 (備註)")).toDF("id", "addr")
    val cands = Geocode.expand(df, "id", "addr").orderBy("rank").collect()
      .map(r => (r.getInt(2), r.getString(1)))
    val queries = cands.map(_._2)
    assert(queries(0) == "臺北市大安區和平東路12巷3弄45-2號") // normalized base
    assert(queries.contains("臺北市大安區和平東路12巷3弄45之2號")) // 之 variant
    assert(queries.contains("臺北市大安區和平東路12巷3弄45號"))   // sub-number dropped
    assert(queries.contains("臺北市大安區和平東路12巷45號"))      // 弄 degraded
    assert(queries.contains("臺北市大安區和平東路45號"))          // road only
    assert(queries.distinct.length == queries.length)             // no dup variants
    assert(cands.map(_._1).sameElements(cands.map(_._1).sorted))  // rank order
  }

  test("A15 composite split: ；-tail dropped, 號+conjunction splits, region prefixed") {
    val df = Seq((1L, "台北市大安區和平東路9號及信義路32號；轉介另記")).toDF("id", "addr")
    val qs = Geocode.expand(df, "id", "addr").orderBy("rank").collect()
      .map(_.getString(1))
    assert(qs.contains("臺北市大安區和平東路9號"))       // seg 1 intact (和 NOT split)
    assert(qs.contains("臺北市大安區信義路32號"))        // seg 2 region-prefixed
    assert(!qs.exists(_.contains("轉介")))               // ；-tail gone
  }

  test("A15 里 removal and 段 variants with road-only") {
    val df = Seq((1L, "關東里光復路二段101號"),
                 (2L, "台北市中正區和平西路3段5巷7號"),
                 (3L, "新竹市關東里光復路99號")).toDF("id", "addr")
    val by = Geocode.expand(df, "id", "addr").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(by(1L).contains("光復路二段101號"))            // 里 stripped, 中文段 base
    assert(by(1L).contains("光復路2段101號"))             // Arabic-段 base
    assert(by(2L).contains("臺北市中正區和平西路3段7號")) // road-only keeps 段, drops 巷
    // reference-faithful quirk: greedy {1,4}里 eats back into the city
    // name when adjacent (竹市關東里 matches) — geocode.js:193 does the
    // same via its lookahead form
    assert(by(3L).contains("新竹市新光復路99號"))
  }

  test("A15 clampQuery drops >512-encoded-byte candidates (no 號 after truncation)") {
    val long = "台北市" + "龍" * 125 + "路45號"
    val df = Seq((1L, long), (2L, "台北市中山北路45號")).toDF("id", "addr")
    val ids = Geocode.expand(df, "id", "addr").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L)) // row 1's every candidate clamps past its 號
  }

  test("A15 org-name prefixing interleaves with the ladder") {
    val df = Seq((1L, "台北市大安區和平東路9號", "仁心診所")).toDF("id", "addr", "org")
    val cands = Geocode.expand(df, "id", "addr", orgCol = Some("org"))
      .orderBy("rank").collect().map(r => (r.getInt(2), r.getString(1)))
    assert(cands(0)._2 == "臺北市大安區和平東路9號")
    assert(cands(1)._2 == "台北市大安區和平東路9號")       // 台 twin interleaves
    assert(cands(2)._2 == "仁心診所臺北市大安區和平東路9號") // then the org twin
    assert(cands(3)._2 == "仁心診所台北市大安區和平東路9號")
    assert(cands.exists(_._2 == "臺北市仁心診所臺北市大安區和平東路9號")
      || cands.exists(_._2.startsWith("仁心診所臺北市臺北市")))
  }

  test("A15 臺/台 pair emission matches the reference's ordered candidate list") {
    // reference-truth lists derived by running buildQueryCandidates
    // (geocode.js:288-295, pure-function extract) on these fixtures;
    // addresses avoid the documented deviations (no 及/和/與 in road
    // names, no 巷/弄, postal handled identically), so graft must match
    // the emitted list EXACTLY, including 臺→台 twin interleaving and
    // dedup-by-first-occurrence order.
    val df = Seq(
      (1L, "台北市大安區中山北路三段45-2號", ""),
      (2L, "新竹市東區光復路二段101號；轉介另記", ""),
      (3L, "高雄市左營區博愛二路366號", ""),
      (4L, "台北市大安區中山北路三段45-2號", "仁心診所")).toDF("id", "addr", "org")
    val by = Geocode.expand(df, "id", "addr", orgCol = Some("org")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getString(1)).toSeq).toMap
    assert(by(1L) == Seq(
      "臺北市大安區中山北路三段45-2號", "台北市大安區中山北路三段45-2號",
      "臺北市大安區中山北路3段45-2號", "台北市大安區中山北路3段45-2號",
      "臺北市臺北市大安區中山北路3段45-2號", "台北市台北市大安區中山北路3段45-2號",
      "大安區臺北市大安區中山北路3段45-2號", "大安區台北市大安區中山北路3段45-2號",
      "臺北市大安區臺北市大安區中山北路3段45-2號", "台北市大安區台北市大安區中山北路3段45-2號",
      "臺北市大安區中山北路三段45之2號", "台北市大安區中山北路三段45之2號",
      "臺北市大安區中山北路三段45號", "台北市大安區中山北路三段45號",
      "臺北市大安區中山北路3段45號", "台北市大安區中山北路3段45號",
      "臺北市臺北市大安區中山北路3段45號", "台北市台北市大安區中山北路3段45號",
      "大安區臺北市大安區中山北路3段45號", "大安區台北市大安區中山北路3段45號",
      "臺北市大安區臺北市大安區中山北路3段45號", "台北市大安區台北市大安區中山北路3段45號",
      "臺北市大安區中山北路3段45之2號", "台北市大安區中山北路3段45之2號"))
    assert(by(2L) == Seq(
      "新竹市東區光復路二段101號", "新竹市東區光復路2段101號",
      "新竹市新竹市東區光復路2段101號", "東區新竹市東區光復路2段101號",
      "新竹市東區新竹市東區光復路2段101號"))
    assert(by(3L) == Seq(
      "高雄市左營區博愛二路366號", "高雄市高雄市左營區博愛二路366號",
      "左營區高雄市左營區博愛二路366號", "高雄市左營區高雄市左營區博愛二路366號"))
    // org fixture: spot-check the interleaving shape (full 44-item list
    // is the same ladder with org twins after every base/ro slot)
    assert(by(4L).take(8) == Seq(
      "臺北市大安區中山北路三段45-2號", "台北市大安區中山北路三段45-2號",
      "仁心診所臺北市大安區中山北路三段45-2號", "仁心診所台北市大安區中山北路三段45-2號",
      "臺北市大安區中山北路3段45-2號", "台北市大安區中山北路3段45-2號",
      "仁心診所臺北市大安區中山北路3段45-2號", "仁心診所台北市大安區中山北路3段45-2號"))
    assert(by(4L).size == 44)
  }

  test("A15 street-ordinal bases: 中文數字+街巷弄 converts, insertion order matches the reference") {
    // reference truth from buildQueryCandidates: bases iterate
    // [b0, ord(b0), sec(b0), ord(sec(b0))]. Exact-list parity needs
    // refAlley (the reference's 巷\d+號 rung fires on these shapes);
    // the corrected default must still emit the converted bases.
    val df = Seq(
      (1L, "新竹市東區光復路二十巷5號"),
      (2L, "台北市大安區中山北路三段五巷7號")).toDF("id", "addr")
    val by = Geocode.expand(df, "id", "addr", refAlley = true).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getString(1)).toSeq).toMap
    assert(by(1L) == Seq(
      "新竹市東區光復路二十巷5號", "新竹市東區光復路二十號",
      "新竹市東區光復路20巷5號", "新竹市東區光復路5號",
      "新竹市新竹市東區光復路5號", "東區新竹市東區光復路5號",
      "新竹市東區新竹市東區光復路5號", "新竹市東區光復路20號",
      "新竹市新竹市東區光復路20號", "東區新竹市東區光復路20號",
      "新竹市東區新竹市東區光復路20號"))
    assert(by(2L) == Seq(
      "臺北市大安區中山北路三段五巷7號", "台北市大安區中山北路三段五巷7號",
      "臺北市大安區中山北路三段五號", "台北市大安區中山北路三段五號",
      "臺北市大安區中山北路三段5巷7號", "台北市大安區中山北路三段5巷7號",
      "臺北市大安區中山北路3段7號", "台北市大安區中山北路3段7號",
      "臺北市臺北市大安區中山北路3段7號", "台北市台北市大安區中山北路3段7號",
      "大安區臺北市大安區中山北路3段7號", "大安區台北市大安區中山北路3段7號",
      "臺北市大安區臺北市大安區中山北路3段7號", "台北市大安區台北市大安區中山北路3段7號",
      "臺北市大安區中山北路三段5號", "台北市大安區中山北路三段5號",
      "臺北市大安區中山北路3段5號", "台北市大安區中山北路3段5號",
      "臺北市臺北市大安區中山北路3段5號", "台北市台北市大安區中山北路3段5號",
      "大安區臺北市大安區中山北路3段5號", "大安區台北市大安區中山北路3段5號",
      "臺北市大安區臺北市大安區中山北路3段5號", "台北市大安區台北市大安區中山北路3段5號",
      "臺北市大安區中山北路3段五巷7號", "台北市大安區中山北路3段五巷7號",
      "臺北市大安區中山北路3段五號", "台北市大安區中山北路3段五號",
      "臺北市大安區中山北路3段5巷7號", "台北市大安區中山北路3段5巷7號"))
    // corrected default: converted bases present, ordinary addresses
    // unaffected (ordinal blocks skip when the transform is a no-op)
    val corr = Geocode.expand(df, "id", "addr").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    assert(corr(1L).contains("新竹市東區光復路20巷5號"))
    assert(corr(2L).contains("臺北市大安區中山北路3段5巷7號"))
  }

  test("A15 org names containing 台 fold into the pair emission (taiVariants covers the WHOLE candidate)") {
    // reference truth (buildQueryCandidates, org_name = 台大醫院): the
    // canonical variant folds the ORG's 台 too, and the twin unfolds
    // everything — no mixed-spelling candidate ever emits
    val df = Seq((1L, "台北市大安區中山北路9號", "台大醫院")).toDF("id", "addr", "org")
    val qs = Geocode.expand(df, "id", "addr", orgCol = Some("org")).collect()
      .sortBy(_.getInt(2)).map(_.getString(1)).toSeq
    assert(qs == Seq(
      "臺北市大安區中山北路9號", "台北市大安區中山北路9號",
      "臺大醫院臺北市大安區中山北路9號", "台大醫院台北市大安區中山北路9號",
      "臺北市臺北市大安區中山北路9號", "台北市台北市大安區中山北路9號",
      "臺大醫院臺北市臺北市大安區中山北路9號", "台大醫院台北市台北市大安區中山北路9號",
      "大安區臺北市大安區中山北路9號", "大安區台北市大安區中山北路9號",
      "臺大醫院大安區臺北市大安區中山北路9號", "台大醫院大安區台北市大安區中山北路9號",
      "臺北市大安區臺北市大安區中山北路9號", "台北市大安區台北市大安區中山北路9號"))
    assert(!qs.exists(q => q.contains("臺") && q.contains("台")),
      "mixed 臺/台 spelling leaked into the candidate list")
  }

  test("A15 multi-token street ordinals: EACH token converts with its own value") {
    // reference truth: streetOrdinalArabicVariants converts per match
    // (二十巷五弄 → 20巷5弄, 五巷十五弄 → 5巷15弄 — NOT the first
    // token's value everywhere); exact-list parity needs refAlley
    // (these shapes trigger the reference alley rungs)
    val df = Seq(
      (1L, "新竹市東區光復路二十巷五弄3號"),
      (2L, "新竹市東區光復路五巷十五弄3號")).toDF("id", "addr")
    val by = Geocode.expand(df, "id", "addr", refAlley = true).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getString(1)).toSeq).toMap
    assert(by(1L) == Seq(
      "新竹市東區光復路二十巷五弄3號", "新竹市東區光復路二十巷五號",
      "新竹市東區光復路20巷5弄3號", "新竹市東區光復路3號",
      "新竹市新竹市東區光復路3號", "東區新竹市東區光復路3號",
      "新竹市東區新竹市東區光復路3號", "新竹市東區光復路20巷5號",
      "新竹市東區光復路5號", "新竹市新竹市東區光復路5號",
      "東區新竹市東區光復路5號", "新竹市東區新竹市東區光復路5號",
      "新竹市東區光復路20弄3號", "新竹市東區光復路20號",
      "新竹市新竹市東區光復路20號", "東區新竹市東區光復路20號",
      "新竹市東區新竹市東區光復路20號"))
    assert(by(2L) == Seq(
      "新竹市東區光復路五巷十五弄3號", "新竹市東區光復路五巷十五號",
      "新竹市東區光復路5巷15弄3號", "新竹市東區光復路3號",
      "新竹市新竹市東區光復路3號", "東區新竹市東區光復路3號",
      "新竹市東區新竹市東區光復路3號", "新竹市東區光復路5巷15號",
      "新竹市東區光復路15號", "新竹市新竹市東區光復路15號",
      "東區新竹市東區光復路15號", "新竹市東區新竹市東區光復路15號",
      "新竹市東區光復路5弄3號", "新竹市東區光復路5號",
      "新竹市新竹市東區光復路5號", "東區新竹市東區光復路5號",
      "新竹市東區新竹市東區光復路5號"))
  }

  test("A15 refAlley mode reproduces alleyDegradeVariants' emitted candidates verbatim") {
    // reference truth from buildQueryCandidates on alley addresses —
    // including its unit-before-digit misreads (弄45-2號→號 promotes the
    // alley number to house number) and the per-degraded-form road-only
    // combos. The corrected default intentionally differs (documented
    // deviation); refAlley = true must match byte-for-byte, in order.
    val df = Seq(
      (1L, "台北市大安區羅斯福路12巷3弄45-2號"),
      (2L, "新竹市東區光復路30巷8號")).toDF("id", "addr")
    val by = Geocode.expand(df, "id", "addr", refAlley = true).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getString(1)).toSeq).toMap
    assert(by(1L) == Seq(
      "臺北市大安區羅斯福路12巷3弄45-2號", "台北市大安區羅斯福路12巷3弄45-2號",
      "臺北市大安區羅斯福路45-2號", "台北市大安區羅斯福路45-2號",
      "臺北市臺北市大安區羅斯福路45-2號", "台北市台北市大安區羅斯福路45-2號",
      "大安區臺北市大安區羅斯福路45-2號", "大安區台北市大安區羅斯福路45-2號",
      "臺北市大安區臺北市大安區羅斯福路45-2號", "台北市大安區台北市大安區羅斯福路45-2號",
      "臺北市大安區羅斯福路12巷3號", "台北市大安區羅斯福路12巷3號",
      "臺北市大安區羅斯福路3號", "台北市大安區羅斯福路3號",
      "臺北市臺北市大安區羅斯福路3號", "台北市台北市大安區羅斯福路3號",
      "大安區臺北市大安區羅斯福路3號", "大安區台北市大安區羅斯福路3號",
      "臺北市大安區臺北市大安區羅斯福路3號", "台北市大安區台北市大安區羅斯福路3號",
      "臺北市大安區羅斯福路12弄45-2號", "台北市大安區羅斯福路12弄45-2號",
      "臺北市大安區羅斯福路12號", "台北市大安區羅斯福路12號",
      "臺北市臺北市大安區羅斯福路12號", "台北市台北市大安區羅斯福路12號",
      "大安區臺北市大安區羅斯福路12號", "大安區台北市大安區羅斯福路12號",
      "臺北市大安區臺北市大安區羅斯福路12號", "台北市大安區台北市大安區羅斯福路12號",
      "臺北市大安區羅斯福路12巷3弄45之2號", "台北市大安區羅斯福路12巷3弄45之2號",
      "臺北市大安區羅斯福路12之2號", "台北市大安區羅斯福路12之2號",
      "臺北市大安區羅斯福路12巷3弄45號", "台北市大安區羅斯福路12巷3弄45號",
      "臺北市大安區羅斯福路45號", "台北市大安區羅斯福路45號",
      "臺北市臺北市大安區羅斯福路45號", "台北市台北市大安區羅斯福路45號",
      "大安區臺北市大安區羅斯福路45號", "大安區台北市大安區羅斯福路45號",
      "臺北市大安區臺北市大安區羅斯福路45號", "台北市大安區台北市大安區羅斯福路45號",
      "臺北市大安區羅斯福路12弄45號", "台北市大安區羅斯福路12弄45號"))
    assert(by(2L) == Seq(
      "新竹市東區光復路30巷8號", "新竹市東區光復路8號",
      "新竹市新竹市東區光復路8號", "東區新竹市東區光復路8號",
      "新竹市東區新竹市東區光復路8號", "新竹市東區光復路30號",
      "新竹市新竹市東區光復路30號", "東區新竹市東區光復路30號",
      "新竹市東區新竹市東區光復路30號"))
  }

  test("A15b validateAndRank: county containment 臺/台-tolerant, centroid-distance rank") {
    val rows = Seq(
      (1L, "台北市大安區和平東路1號", ""),      // expected from address: 臺北市
      (2L, "高雄市左營區博愛路2號", "臺南市"),  // field overrides address
      (3L, "中山北路3號", "")                    // no county anywhere -> all hits valid
    ).toDF("id", "addr", "county")
    val hits = Seq(
      // id 1: wrong county near centroid vs right county far away -> validity wins
      (1L, 0, "基隆市中正區", "基隆市", 25.04, 121.56),
      (1L, 1, "台北市大安區", "台北市", 24.00, 121.00),
      // id 1: right county, nearer -> beats hit 1 on distance
      (1L, 2, "臺北市中山區", "臺北市", 25.10, 121.50),
      // id 2: 台-spelling of the expected 臺南市 still matches
      (2L, 0, "台南市安平區", "", 23.00, 120.20),
      (2L, 1, "高雄市左營區", "高雄市", 22.63, 120.30),
      // id 3: no expected county -> both valid, distance 999999 tie -> seq wins
      (3L, 0, "嘉義市東區", "", 23.48, 120.45),
      (3L, 1, "花蓮縣吉安鄉", "", 23.97, 121.60)
    ).toDF("hit_id", "seq", "formatted", "comp_city", "lat", "lng")
    val out = Geocode.validateAndRank(rows, "id", "addr", Some("county"),
        hits, "hit_id", "seq", Seq("comp_city"), "formatted", "lat", "lng")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2), r.getInt(4))).toMap
    assert(out(1L) == (("臺北市", true, 2)))  // valid + nearest valid
    assert(out(2L) == (("臺南市", true, 0)))  // tai-tolerant containment
    assert(out(3L) == (("", true, 0)))        // no county: trivially valid, seq tie-break
  }

  test("A15b street-centroid candidates: last road token, longest-first order") {
    val df = Seq((1L, "台北市大安區和平東路12巷45號"),
                 (2L, "和平東路12巷45號"),
                 (3L, "台北市大安區99號")).toDF("id", "addr") // no road token
    val out = Geocode.streetCentroidCandidates(df, "id", "addr").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).map(_.getString(1)).toSeq).toMap
    // reference-faithful quirk: the lazy road-token regex swallows the
    // region prefix (no delimiter separates 區 from the road), so the
    // county+district+road candidate doubles the region — exactly what
    // buildStreetCentroidCandidates produces (geocode.js:230-238, 415)
    assert(out(1L).head == "臺北市大安區臺北市大安區和平東路")
    assert(out(1L).contains("臺北市大安區和平東路")) // the bare "road" slot
    assert(out(1L).contains("台北市大安區和平東路")) // 台-twin road combos too
    // the whole road-only base (house number stripped) enters in both
    // spellings (geocode.js:418-422)
    assert(out(1L).contains("臺北市大安區和平東路12巷"))
    assert(out(1L).contains("台北市大安區和平東路12巷"))
    assert(out(2L) == Seq("和平東路12巷", "和平東路")) // base + road, length-desc
    assert(out(1L).sortBy(-_.length) == out(1L))     // length-desc order
    // a road-less address yields NO candidates (and, under ANSI mode,
    // must not throw on the empty road-token extraction)
    assert(!out.contains(3L))
  }

  test("A15 resolver picks the best-ranked cache hit; misses stay null") {
    val rows = Seq(
      (1L, "台北市和平東路5巷9號"),   // only degraded road-only form is cached
      (2L, "台北市和平東路7巷8號"),   // exact form cached
      (3L, "高雄市中山路1號")          // nothing cached
    ).toDF("id", "addr")
    val cache = Seq("臺北市和平東路9號", "臺北市和平東路7巷8號").toDF("q")
    val out = Geocode.resolveAgainstCache(rows, "id", "addr", cache, "q")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(1L) == Some("臺北市和平東路9號"))
    assert(out(2L) == Some("臺北市和平東路7巷8號"))
    assert(out(3L) == None)
  }
}
