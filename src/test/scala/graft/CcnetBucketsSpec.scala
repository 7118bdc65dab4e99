package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** C78 CCNet head/middle/tail spec: exact-thirds closed forms, the
  * on-bar tie convention, per-language independence, and the demo
  * row's monotone-bucket invariant. */
class CcnetBucketsSpec extends SparkSpec {
  import spark.implicits._

  private def buckets(rows: (Long, String, Double)*) =
    Curation.perplexityBuckets(
        rows.toDF("doc_id", "pred_lang", "ppl"), "doc_id", "pred_lang", "ppl")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))

  test("nine distinct scores split into exact thirds") {
    val got = buckets((1L to 9L).map(i => (i, "en", i.toDouble)): _*)
    val want = (1L to 3L).map((_, "en", "head")) ++
      (4L to 6L).map((_, "en", "middle")) ++ (7L to 9L).map((_, "en", "tail"))
    assert(got.toSeq === want)
  }

  test("a doc exactly on a bar stays in the LOWER bucket") {
    // n=4: fr=0 at both cuts, so the bars ARE the 2nd and 3rd values
    val got = buckets((1L, "en", 10.0), (2L, "en", 20.0),
      (3L, "en", 30.0), (4L, "en", 40.0)).map(x => x._1 -> x._3).toMap
    assert(got === Map(1L -> "head", 2L -> "head", 3L -> "middle", 4L -> "tail"))
  }

  test("languages bucket independently — scales never mix") {
    // 'fr' scores are all worse than every 'en' score; per-language
    // bars still give each language its own head
    val rows = (1L to 6L).map(i => (i, "en", i.toDouble)) ++
      (11L to 16L).map(i => (i, "fr", 100.0 + i))
    val got = buckets(rows: _*)
    Seq("en", "fr").foreach { l =>
      val b = got.filter(_._2 == l).map(_._3)
      assert(b.count(_ == "head") == 2 && b.count(_ == "middle") == 2 &&
        b.count(_ == "tail") == 2, s"$l: ${b.mkString(",")}")
    }
  }

  test("tied scores share a bucket") {
    val got = buckets((1L, "en", 1.0), (2L, "en", 1.0), (3L, "en", 1.0),
      (4L, "en", 9.0), (5L, "en", 9.0), (6L, "en", 9.0))
    val byId = got.map(x => x._1 -> x._3).toMap
    assert(byId(1L) === byId(2L) && byId(2L) === byId(3L))
    assert(byId(4L) === byId(5L) && byId(5L) === byId(6L))
    assert(byId(1L) !== byId(4L))
  }

  test("C78 demo row: near-thirds per language, buckets monotone in ppl") {
    val df = graft.operators.TextDemos.ccnetBuckets(spark, sfDir)
    val rows = df.collect().map(r =>
      (r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val n = rs.length
      if (n >= 9) {
        val counts = rs.groupBy(_._3).view.mapValues(_.length).toMap
        Seq("head", "middle", "tail").foreach { b =>
          val c = counts.getOrElse(b, 0)
          assert(math.abs(c - n / 3.0) <= 2, s"$lang/$b: $c of $n")
        }
      }
      // bucket assignment is a threshold on ppl: head ≤ middle ≤ tail
      def ppls(b: String) = rs.filter(_._3 == b).map(_._2)
      for {
        (lo, hi) <- Seq("head" -> "middle", "middle" -> "tail")
        if ppls(lo).nonEmpty && ppls(hi).nonEmpty
      } assert(ppls(lo).max <= ppls(hi).min, s"$lang: $lo overlaps $hi")
    }
  }
}
