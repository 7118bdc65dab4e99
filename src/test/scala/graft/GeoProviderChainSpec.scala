package graft

import org.apache.spark.sql.functions._

import graft.operators.Geocode

/** A15d — the ordered-provider fallback arm (geocode.js:431,492:
  * OpenCage primary, `--nominatim` backup): provider 2 is consulted
  * ONLY for candidates provider 1 missed, first-hit-wins, retry
  * discipline per provider, and the chain composes with the daily
  * incremental loop. Providers are top-level classes (not spec
  * closures) because their lookups run on executors; local-mode
  * shares the JVM so a static call log records traffic. */
class GeoProviderChainSpec extends SparkSpec {
  import spark.implicits._
  import GeoProviderChainSpec._

  private def chainOn(cands: Seq[String], providers: Seq[Geocode.GeoProvider]) =
    Geocode.providerChain(providers)(cands.toDF("candidate"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getString(3)))
      .toMap

  test("A15d: backup provider sees only the primary's misses; first hit wins") {
    calls.clear()
    val primary = FakeProvider("opencage",
      Map("q1" -> ((25.0, 121.5)), "q2" -> ((24.1, 120.6))))
    val backup = FakeProvider("nominatim",
      Map("q2" -> ((99.0, 99.0)), "q3" -> ((22.6, 120.3))))
    val out = chainOn(Seq("q1", "q2", "q3", "q4"), Seq(primary, backup))
    // q2 resolvable by both → the PRIMARY's answer and tag win
    assert(out == Map(
      "q1" -> ((25.0, 121.5, "opencage")),
      "q2" -> ((24.1, 120.6, "opencage")),
      "q3" -> ((22.6, 120.3, "nominatim"))), out)
    val byProvider = calls.toArray.map(_.asInstanceOf[(String, String)])
      .groupBy(_._1).map { case (p, qs) => p -> qs.map(_._2).toSet }
    assert(byProvider("opencage") == Set("q1", "q2", "q3", "q4"))
    assert(byProvider("nominatim") == Set("q3", "q4"),
      "backup consulted only on primary miss")
  }

  test("A15d: duplicate candidate rows collapse to one lookup per provider") {
    calls.clear()
    val primary = FakeProvider("p1", Map("q1" -> ((1.0, 2.0))))
    chainOn(Seq("q1", "q1", "q1", "q2", "q2"), Seq(primary))
    val qs = calls.toArray.map(_.asInstanceOf[(String, String)]._2).toSeq
    assert(qs.sorted == Seq("q1", "q2"), s"one call per distinct query: $qs")
  }

  test("A15d: a flaky provider retries within its own budget") {
    calls.clear()
    failuresLeft.put("flaky:q1", 2) // first two lookups throw
    val flaky = FakeProvider("flaky", Map("q1" -> ((5.0, 6.0))), maxRetries = 3)
    val out = chainOn(Seq("q1"), Seq(flaky))
    assert(out == Map("q1" -> ((5.0, 6.0, "flaky"))))
    val attempts = calls.toArray.count(_.asInstanceOf[(String, String)]._2 == "q1")
    assert(attempts == 3, s"2 failures + 1 success: $attempts")
  }

  test("A15d: md560 is the JVM twin of Vec.md5Hash60's Column form") {
    // cross-engine pin: the mapPartitions-side hash must agree with the
    // codegen'd conv(substr(md5,1,15),16,10) the oracle SQL mirrors
    val qs = Seq("", "q1", "台北市大安區和平東路12巷34號",
      "opencage-sim", "臺中市中山北路3段99號", "a" * 300)
    val sparkSide = qs.toDF("q")
      .select(col("q"), graft.functions.Vec.md5Hash60(col("q")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    qs.foreach { q =>
      assert(Geocode.md560(q) == sparkSide(q), s"md560 mismatch for '$q'")
      assert(Geocode.md560(q) >= 0L, "60-bit hash is non-negative")
    }
  }

  test("A15d: HashProvider is deterministic and mirrors the hash formula") {
    val p = Geocode.HashProvider("sim", 10L, 6L, 21.0, 119.0)
    val qs = Seq("q1", "q2", "台北市信義路5號", "臺南市安平區1號", "x") ++
      (1 to 50).map(i => s"cand-$i")
    qs.foreach { q =>
      val h = Geocode.md560(q)
      val expected =
        if (h % 10L < 6L) Some((21.0 + (h % 4000L).toDouble / 1000.0,
                                119.0 + (h % 6000L).toDouble / 1000.0))
        else None
      assert(p.lookup(q) == expected, s"formula mismatch for '$q'")
      assert(p.lookup(q) == p.lookup(q), s"non-deterministic for '$q'")
    }
    // keep/mod gates roughly keep/mod of a varied universe (sanity that
    // both hit and miss branches are exercised above)
    val hits = qs.count(p.lookup(_).isDefined)
    assert(hits > 0 && hits < qs.size, s"degenerate provider: $hits/${qs.size}")
  }

  test("A15d: the chain composes with dailyGeocode (delta-only, tags dropped)") {
    calls.clear()
    val dir = tempDir("graft_daily_chain")
    val rows = Seq(
      (1L, "台北市大安區和平東路12巷34號"),
      (2L, "高雄市左營區中山路5號")).toDF("id", "addr")
    // primary answers only the exact day-1 query for row 1; backup
    // catches row 2's best candidate — both land as "fresh"
    val primary = PatternProvider("oc", "和平東路", 25.03, 121.56)
    val backup = PatternProvider("nom", "中山路", 22.68, 120.29)
    val out = Geocode.dailyGeocode(rows, "id", "addr", dir, 0L)(
      Geocode.providerChain(Seq(primary, backup)))
      .select(col("id"), col("source"), col("lat"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out(1L) == (("fresh", 25.03)))
    assert(out(2L) == (("fresh", 22.68)))
    // day 2: everything cached, neither provider consulted
    calls.clear()
    val out2 = Geocode.dailyGeocode(rows, "id", "addr", dir, 1L)(
      Geocode.providerChain(Seq(primary, backup)))
      .select(col("id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 == Map(1L -> "cache", 2L -> "cache"))
    assert(calls.isEmpty, "fully-cached day: no provider traffic")
    graft.util.CacheRegistry.releaseAll()
  }
}

object GeoProviderChainSpec {
  /** (provider, query) call log — local-mode executors share the JVM. */
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  /** "provider:query" → remaining injected failures. */
  val failuresLeft = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def record(name: String, q: String): Unit = {
    calls.add((name, q))
    val key = s"$name:$q"
    val left = failuresLeft.getOrDefault(key, 0)
    if (left > 0) {
      failuresLeft.put(key, left - 1)
      throw new RuntimeException(s"injected failure for $key")
    }
  }

  /** answers from a fixed map; rate budget 0 (tests), retry injectable. */
  final case class FakeProvider(name: String,
      answers: Map[String, (Double, Double)], override val maxRetries: Int = 3)
      extends Geocode.GeoProvider {
    def minIntervalMs: Long = 0L
    override def baseDelayMs: Long = 1L
    def lookup(q: String): Option[(Double, Double)] = {
      record(name, q); answers.get(q)
    }
  }

  /** answers any candidate containing `pattern` ending in 號 — the
    * dailyGeocode composition needs a provider keyed on expanded
    * candidate shapes rather than exact strings. */
  final case class PatternProvider(name: String, pattern: String,
      lat: Double, lng: Double) extends Geocode.GeoProvider {
    def minIntervalMs: Long = 0L
    def lookup(q: String): Option[(Double, Double)] = {
      record(name, q)
      if (q.contains(pattern) && q.endsWith("號")) Some((lat, lng)) else None
    }
  }
}
