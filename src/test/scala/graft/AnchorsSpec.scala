package graft

import graft.operators.Anchors

/** Specs for anchor-text aggregation (C87). */
class AnchorsSpec extends SparkSpec {
  import spark.implicits._

  private def run(pages: Seq[String], m: Int = 3): Map[String, (Long, Long, String)] =
    Anchors.anchorAgg(pages.toDF("html"), "html", m)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  test("extracts every anchor of a page, both quote styles, entities unescaped") {
    val page = "<p>x</p><a href='https://a.com/1'>one &amp; only</a>" +
      "<div><a href=\"https://a.com/2\" rel=\"nofollow\">two</a></div>"
    val got = run(Seq(page))
    assert(got == Map(
      "https://a.com/1" -> (1L, 1L, "one & only"),
      "https://a.com/2" -> (1L, 1L, "two")))
  }

  test("surface variants of one target merge under canonicalization") {
    val pages = Seq(
      "<a href='HTTP://A.com/t?utm_source=x'>alpha</a>",
      "<a href='http://a.com/t/'>alpha</a>",
      "<a href='http://a.com:80/t#frag'>beta</a>")
    val got = run(pages)
    assert(got == Map("http://a.com/t" -> (3L, 2L, "alpha|beta")))
  }

  test("top-m picks by (count desc, text asc) and cuts at m; counts cover ALL texts") {
    // target T: 3x"c", 2x"a", 2x"b", 1x"d"  ->  top-3 = c|a|b, n=8, texts=4
    val anchors = Seq.fill(3)("c") ++ Seq.fill(2)("a") ++ Seq.fill(2)("b") ++ Seq("d")
    val pages = anchors.map(t => s"<a href='https://t.com/x'>$t</a>")
    val got = run(pages, m = 3)
    assert(got == Map("https://t.com/x" -> (8L, 4L, "c|a|b")))
    val got1 = run(pages, m = 1)
    assert(got1 == Map("https://t.com/x" -> (8L, 4L, "c")))
  }

  test("anchorless pages and empty texts contribute nothing") {
    val got = run(Seq("<p>no links</p>", "<a href='https://a.com/1'></a>",
      "<a href='https://a.com/1'>kept</a>"))
    assert(got == Map("https://a.com/1" -> (1L, 1L, "kept")))
  }

  test("m bound rejected") {
    intercept[IllegalArgumentException] {
      Anchors.anchorAgg(Seq("x").toDF("html"), "html", m = 0)
    }
  }
}
