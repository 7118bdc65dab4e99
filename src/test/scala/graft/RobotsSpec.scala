package graft

import graft.operators.Robots

/** Specs for robots.txt gating (C89): RFC 9309 longest-match with
  * Allow winning length ties, on the prefix-rule subset.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def runGate(robots: Seq[(String, String)], urls: Seq[String]): Map[String, (String, String, Boolean)] =
    Robots.gate(urls.toDF("url"),
        Robots.parseRules(robots.toDF("domain", "content"), "domain", "content"), "url")
      .collect()
      .map(r => r.getString(0) -> (r.getString(3), r.getString(4), r.getBoolean(5)))
      .toMap

  test("parse keeps only non-empty Allow/Disallow lines; case-insensitive, comments stripped") {
    val content = "User-agent: *\nDisallow: /a\nCrawl-delay: 5\nAllow:\n" +
      "Sitemap: https://x/s.xml\nallow: /a/b\n# comment\nDISALLOW: /c # staff only"
    val rules = Robots.parseRules(Seq(("d.com", content)).toDF("domain", "content"),
        "domain", "content")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(rules == Set(("Disallow", "/a"), ("Allow", "/a/b"), ("Disallow", "/c")))
  }

  test("rules match against path+query: a 'Disallow: /search?' rule fires") {
    val got = runGate(Seq("d.com" -> "Disallow: /search?"),
      Seq("https://d.com/search?q=x", "https://d.com/search", "https://d.com/search#frag?x"))
    assert(got("https://d.com/search?q=x") == ("Disallow", "/search?", false))
    assert(got("https://d.com/search") == ("", "", true))
    // '?' inside the fragment is not a query
    assert(got("https://d.com/search#frag?x") == ("", "", true))
  }

  test("duplicate input URLs keep their multiplicity") {
    val out = Robots.gate(
      Seq("https://d.com/a", "https://d.com/a", "https://d.com/b").toDF("url"),
      Robots.parseRules(Seq(("d.com", "Disallow: /a")).toDF("domain", "content"),
        "domain", "content"), "url")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("https://d.com/a", "https://d.com/a", "https://d.com/b"))
  }

  test("precedence: longest match wins, Allow beats Disallow on a length tie") {
    val robots = Seq("d.com" ->
      "Disallow: /priv\nAllow: /priv/ok\nAllow: /tmp\nDisallow: /tmp")
    val got = runGate(robots, Seq(
      "https://d.com/priv/x",     // Disallow /priv
      "https://d.com/priv/ok/x",  // Allow /priv/ok (longer)
      "https://d.com/tmp/y",      // equal-length tie -> Allow
      "https://d.com/open",       // no rule -> allowed
      "https://other.com/priv/x"))// no rules for domain -> allowed
    assert(got("https://d.com/priv/x") == ("Disallow", "/priv", false))
    assert(got("https://d.com/priv/ok/x") == ("Allow", "/priv/ok", true))
    assert(got("https://d.com/tmp/y") == ("Allow", "/tmp", true))
    assert(got("https://d.com/open") == ("", "", true))
    assert(got("https://other.com/priv/x") == ("", "", true))
  }

  test("empty path maps to '/' and root rules catch it") {
    val got = runGate(Seq("d.com" -> "Disallow: /"), Seq("https://d.com", "https://d.com/x"))
    assert(got("https://d.com") == ("Disallow", "/", false))
    assert(got("https://d.com/x") == ("Disallow", "/", false))
  }

  test("matches a plain-Scala reference on randomized rules and paths") {
    val rnd = new scala.util.Random(53)
    val segs = Vector("/a", "/b", "/c")
    def randPath(n: Int): String = (1 to n).map(_ => segs(rnd.nextInt(segs.size))).mkString
    val domains = Vector("d0.com", "d1.com")
    val rules: Seq[(String, String, String)] = (1 to 12).map { _ =>
      (domains(rnd.nextInt(2)),
        if (rnd.nextBoolean()) "Allow" else "Disallow",
        randPath(1 + rnd.nextInt(3)))
    }.distinct
    val robots = rules.groupBy(_._1).toSeq.map { case (d, rs) =>
      d -> rs.map { case (_, t, p) => s"$t: $p" }.mkString("\n")
    }
    val urls = (1 to 60).map(i => s"https://${domains(i % 2)}${randPath(1 + rnd.nextInt(4))}?q=$i")
    def ref(url: String): (String, String, Boolean) = {
      val d = url.drop("https://".length).takeWhile(c => c != '/' && c != '?')
      // rules see path+query (fragment-free); these URLs have no fragment
      val rest = url.drop("https://".length + d.length)
      val path = if (rest.isEmpty) "/" else rest
      val ms = rules.filter(r => r._1 == d && path.startsWith(r._3))
      if (ms.isEmpty) ("", "", true)
      else {
        val best = ms.minBy { case (_, t, p) => (-p.length, t, p) }
        (best._2, best._3, best._2 != "Disallow")
      }
    }
    val got = runGate(robots, urls)
    urls.foreach { u => assert(got(u) == ref(u), s"url $u") }
  }
}
