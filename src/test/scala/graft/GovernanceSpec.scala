package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Governance}

/** C103/C105/C106/C107: takedown propagation through near-dup clusters,
  * mojibake scoring, the k-anonymity ladder, and join-key skew
  * diagnosis — each on closed-form fixtures where the right answer is
  * computable by hand.
  */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  // ---- C103 takedown_propagate -------------------------------------

  private val clusters = Seq(
    // cluster 1: {1,2,3} (2 and 3 are near-copies of 1)
    (1L, 1L), (2L, 1L), (3L, 1L),
    // cluster 4: {4} singleton
    (4L, 4L),
    // cluster 5: {5,6}
    (5L, 5L), (6L, 5L)).toDF("doc_id", "cluster")

  test("C103 takedown sweeps the whole cluster, labels listed vs swept") {
    val listed = Seq(2L, 4L).toDF("doc_id")
    val got = Governance.takedownPropagate(clusters, listed, "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 2 listed -> cluster 1 entirely removed; 4 listed -> singleton;
    // cluster 5 untouched
    assert(got.toSeq == Seq(
      (1L, 1L, "cluster"), (2L, 1L, "listed"), (3L, 1L, "cluster"),
      (4L, 4L, "listed")))
  }

  test("C103 empty delete list removes nothing; full list removes all as listed") {
    val none = Governance.takedownPropagate(
      clusters, Seq.empty[Long].toDF("doc_id"), "doc_id")
    assert(none.count() == 0)
    val all = Governance.takedownPropagate(
      clusters, clusters.select("doc_id"), "doc_id")
    assert(all.count() == 6)
    assert(all.filter(col("reason") =!= "listed").count() == 0)
  }

  // ---- C105 mojibake_score -----------------------------------------

  test("C105 counts each pattern by literal replace-delta; clean text scores 0") {
    val df = Seq(
      (1L, "clean ascii text"),
      (2L, "caf" + "Ã©" + " ok"),              // one Ã©
      (3L, "a" + Curation.MojibakePlant13),              // Ã©, â€, Ã¯
      (4L, "x�y�z"),                           // two U+FFFD
      (5L, "")).toDF("doc_id", "text")
    val out = Curation.mojibakeScore(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, false), (2L, 1L, true), (3L, 3L, true),
      (4L, 2L, true), (5L, 0L, false)))
  }

  test("C105 score normalizes by length; exact on a hand case") {
    // 10 chars, 1 hit of a 2-char pattern
    val df = Seq((1L, "12345678" + "Ã©")).toDF("doc_id", "text")
    val r = Curation.mojibakeScore(df, "doc_id", "text").collect()(0)
    assert(r.getLong(1) == 10L)       // n_chars
    assert(r.getLong(2) == 1L)        // hits
    assert(math.abs(r.getDouble(3) - 0.1) < 1e-9)
  }

  // ---- C106 kanon_generalize ---------------------------------------

  test("C106 ladder admits on residual mass, not raw group counts") {
    // k=3. (en, a): 3 rows -> level 0. (en, b): 1 row — lang en has 4
    // rows total, but the PUBLISHED (en, *) cell would hold only this
    // one residual row, so level 1 must NOT admit. (fr, d/e/f):
    // three 1-row cells -> fr residual = 3 >= k -> level 1 admits all
    // three. The global residual is {en:1, xx:1} = 2 < 3 -> rows 4 and
    // 8 are suppressed (level 3, null keys), not hidden in a 2-row
    // (*, *) cell.
    val df = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "en", "b"),
      (5L, "fr", "d"), (6L, "fr", "e"), (7L, "fr", "f"),
      (8L, "xx", "c")).toDF("doc_id", "lang", "source")
    val got = Governance.kanonGeneralize(df, "doc_id", "lang", "source", k = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, "en", "a", 0), (2L, "en", "a", 0), (3L, "en", "a", 0),
      (4L, null, null, 3),
      (5L, "fr", "*", 1), (6L, "fr", "*", 1), (7L, "fr", "*", 1),
      (8L, null, null, 3)))
  }

  test("C106 a thick global residual lands in (*, *) at level 2") {
    // k=3: three languages with one thin 1-row cell each; every lang
    // residual is 1 < k, but the global residual is 3 >= k, so the
    // (*, *) cell publishes all three.
    val df = Seq(
      (1L, "en", "a"), (2L, "fr", "b"), (3L, "xx", "c"))
      .toDF("doc_id", "lang", "source")
    val got = Governance.kanonGeneralize(df, "doc_id", "lang", "source", k = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, "*", "*", 2), (2L, "*", "*", 2), (3L, "*", "*", 2)))
  }

  test("C106 EVERY published (anon_lang, anon_source) cell holds >= k rows") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val k = 5L
    val out = Governance.kanonGeneralize(docs, "doc_id", "lang", "source", k)
    val cells = out.filter(col("level") <= 2)
      .groupBy("anon_lang", "anon_source", "level")
      .count().collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getLong(3) >= k,
        s"cell ${r.getString(0)}/${r.getString(1)} level ${r.getInt(2)} " +
          s"has ${r.getLong(3)} < $k")
    }
  }

  // ---- C117 dp_release ---------------------------------------------

  test("C117 thresholds partition [0, 2^60) and widths decay by e^-eps both ways") {
    val eps = 1.0; val b = 40
    val th = Governance.geometricThresholds(eps, b)
    assert(th.size == 2 * b)
    // the extreme-k cumulative saturates to exactly 2^60 in double
    // (mass ~e^-37) — a truncation artifact, not a mapping hole: a
    // saturated threshold never counts for any u < 2^60
    assert(th == th.sorted && th.head > 0L && th.last <= (1L << 60))
    // interval widths are the pmf: w_k/w_0 must track e^{-eps*|k|};
    // check the DP ratio on adjacent intervals around the center
    val widths = (0L +: th :+ (1L << 60)).sliding(2).map(p => p(1) - p(0)).toSeq
    val center = widths(b) // noise 0
    assert(math.abs(widths(b + 1).toDouble / center - math.exp(-eps)) < 1e-6)
    assert(math.abs(widths(b - 1).toDouble / center - math.exp(-eps)) < 1e-6)
  }

  test("C117 released counts are deterministic, nonnegative, within the bound") {
    val df = (1L to 300L).map(i => (i, s"l${i % 5}", s"s${i % 7}"))
      .toDF("doc_id", "lang", "source")
    val truth = df.groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def run() = Governance.dpRelease(df, "lang", "source",
        epsilon = 1.0, bound = 40, seed = 23)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val a = run(); val b = run()
    assert(a == b) // reproducible release
    a.foreach { case (k, released) =>
      assert(released >= 0L)
      assert(math.abs(released - truth(k)) <= 40L, s"$k: $released vs ${truth(k)}")
    }
  }

  test("C117 empirical noise distribution matches the geometric pmf") {
    // many synthetic 1-row cells -> the released-minus-true values ARE
    // noise draws; P(noise = 0) = (1-a)/(1+a) ~ 0.462 at eps = 1
    val df = (1L to 4000L).map(i => (i, s"k$i", "x")).toDF("doc_id", "lang", "source")
    val noise = Governance.dpRelease(df.withColumn("pad", lit(1)),
        "lang", "source", epsilon = 1.0, bound = 40, seed = 7)
      .collect().map(_.getLong(2) - 1L) // true count is 1 per cell; floor at -1 ok
    val p0 = noise.count(_ == 0L).toDouble / noise.length
    assert(p0 > 0.40 && p0 < 0.52, s"P(noise=0) = $p0")
  }

  // ---- C107 skew_diagnose ------------------------------------------

  test("C107 flags a key that overflows saltFactor fair partitions, exact shares") {
    // 100 rows: key 'hot' 60, 'warm' 30, 'cold' 10; partitions=10,
    // saltFactor=2 -> fair partition = 10 rows; flag iff cnt*10 > 100*2
    // i.e. cnt > 20: hot and warm flag, cold doesn't
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      Seq.fill(10)("cold")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
    val got = Governance.skewDiagnose(df, "key", topN = 10,
        partitions = 10, saltFactor = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("hot", 60L, 0.6, 1.8, true),
      ("warm", 30L, 0.3, 0.9, true),
      ("cold", 10L, 0.1, 0.3, false)))
  }

  test("C107 topN truncates to the heaviest keys") {
    val df = (1 to 26).flatMap(i => Seq.fill(i)(('a' + i - 1).toChar.toString))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
    val got = Governance.skewDiagnose(df, "key", topN = 3).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("z", "y", "x"))
  }
}
