package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDemos

/** C100 dup_rate_by_source: planted per-source redundancy on a closed
  * form, and the composition identity against the independently-proven
  * C1/C2 demos on sf0.001.
  */
class DupRateSpec extends SparkSpec {
  import spark.implicits._

  test("closed form: exact dups, near dups, and clean sources score separately") {
    val dir = tempDir("dup_rate")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      // source a: two identical docs (exact AND near), one unique
      (1L, base, "a"),
      (2L, base, "a"),
      (3L, "totally different words that resemble nothing else here", "a"),
      // source b: a near-dup pair (one token appended: J = 8/9), no exact dups
      (4L, base + " lambda", "b"),
      (5L, "completely separate content again with its own wording", "b"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val got = TextDemos.dupRateBySource(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    graft.util.CacheRegistry.releaseAll()
    // docs 1,2 are exact dups; near-dup pairs: (1,2) certainly, and
    // doc 4 pairs with 1 and/or 2 (J=8/9 over the banding threshold)
    val (nA, exA, nrA, exRateA, _) = got("a")
    assert((nA, exA) == ((3L, 2L)) && exRateA == 2.0 / 3.0, got("a").toString)
    assert(nrA >= 2L, "the identical pair must be near-dups too")
    val (nB, exB, nrB, exRateB, nrRateB) = got("b")
    assert((nB, exB, exRateB) == ((2L, 0L, 0.0)), got("b").toString)
    assert(nrB == 1L && nrRateB == 0.5, "doc 4 near-dups across sources; doc 5 is clean")
  }

  test("composition identity: rates equal the C1/C2 demos' memberships on sf0.001") {
    val rows = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val docs = rows.map(r => r._1 -> r._2).toMap
    // exact membership = sharing a text with any other doc (grouping
    // by the raw text is membership-equivalent to grouping by md5)
    val exactGroups: Long => Boolean = rows.groupBy(_._3).values
      .filter(_.length > 1).flatMap(_.map(_._1)).toSet
    val nearIds = TextDemos.dedupMinhashLsh(spark, sfDir).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    graft.util.CacheRegistry.releaseAll()
    val got = TextDemos.dupRateBySource(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    graft.util.CacheRegistry.releaseAll()
    val bySource = docs.groupBy(_._2)
    bySource.foreach { case (src, m) =>
      val ids = m.keys.toSet
      val (n, ex, nr) = got(src)
      assert(n == ids.size.toLong, s"$src n_docs")
      assert(ex == ids.count(exactGroups), s"$src exact membership")
      assert(nr == ids.count(nearIds), s"$src near membership")
    }
    assert(got.keySet == bySource.keySet)
  }
}
