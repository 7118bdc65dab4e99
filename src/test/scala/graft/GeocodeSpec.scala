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
