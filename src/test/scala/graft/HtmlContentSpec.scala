package graft

import org.apache.spark.sql.functions._

import graft.functions.Html
import graft.operators.TextDemos

/** C65 main-content extraction: hand-built block cases for each gate
  * (length, link density), plus the demo-level reconstruction
  * property against driver string math. */
class HtmlContentSpec extends SparkSpec {
  import spark.implicits._

  private def mc(html: String): (String, Long, Long) = {
    val r = Seq(html).toDF("h")
      .select(Html.mainContent(col("h")).as("m"))
      .select(col("m.main_text"), col("m.n_blocks"), col("m.n_kept"))
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("nav and footer drop; the article block survives intact") {
    val page =
      "<div><a href=\"/\">Start here</a> <a href=\"/x\">About this site</a></div>" +
        "<p>This is the real article body with plenty of visible text.</p>" +
        "<div><a href=\"/p\">Privacy policy</a> <a href=\"/t\">Terms of use</a></div>"
    val (text, nBlocks, nKept) = mc(page)
    assert(text == "This is the real article body with plenty of visible text.")
    assert(nBlocks == 3 && nKept == 1)
  }

  test("a long but link-dense block drops; a plain block of the same length stays") {
    val links = (1 to 8).map(i => s"""<a href="/$i">Category number $i</a>""").mkString(" ")
    val plain = "Plain prose sentence that is comfortably longer than the gate."
    val (text, nBlocks, nKept) = mc(s"<p>$links</p><p>$plain</p>")
    assert(text == plain, s"got '$text'")
    assert(nBlocks == 2 && nKept == 1)
  }

  test("uppercase and multiline anchors still count as link chars (case/DOTALL)") {
    // regression: a case-sensitive anchor pattern scored '<A HREF>'
    // navs as zero link chars and waved them through the density gate
    val upper = "<DIV><A HREF=\"/\">Start here now</A> <A HREF=\"/x\">About this site</A></DIV>"
    val multi = "<div><a href=\"/y\">line one\nline two of the anchor</a></div>"
    val (text, nBlocks, nKept) = mc(upper + multi)
    assert(nBlocks == 2 && nKept == 0, s"'$text' ($nBlocks blocks, $nKept kept)")
    assert(text == "")
  }

  test("the 25-char length gate is inclusive") {
    val at = "x" * 25
    val under = "y" * 24
    val (text, _, nKept) = mc(s"<p>$at</p><p>$under</p>")
    assert(text == at && nKept == 1)
  }

  test("inline anchors inside an article block count toward density but keep their text") {
    // one inline link in a long paragraph: density well under 0.33,
    // block kept, anchor TEXT preserved in the output
    val page = "<p>Read the <a href=\"/ref\">reference manual</a> before " +
      "filing a support ticket about the deployment pipeline.</p>"
    val (text, _, nKept) = mc(page)
    assert(nKept == 1)
    assert(text.contains("reference manual") && !text.contains("<a"))
  }

  test("demo reconstructs exactly the two article halves for every document") {
    val got = TextDemos.htmlMainContent(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars").collect()
    assert(got.size == docs.length)
    docs.foreach { r =>
      val (id, text, n) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(n == text.length, s"fixture assumption: n_chars is the char count ($id)")
      val h = (n / 2).toInt
      val halves = Seq(text.substring(0, h), text.substring(h)).map(_.trim)
      val kept = halves.filter(_.length >= 25) // plain text: density 0
      val want = kept.mkString("\n")
      val (mainText, nBlocks, nKept) = got(id)
      assert(nBlocks == 4, s"doc $id: nav + 2 paragraphs + footer, got $nBlocks")
      assert(nKept == kept.size, s"doc $id")
      assert(mainText == want, s"doc $id: '$mainText' vs '$want'")
    }
  }
}
