package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** C45 — the in-engine logistic-regression trainer, checked against a
  * plain-Scala reference running the identical rounded-decimal GD
  * algebra, plus learnability and invariance properties.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def md560(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def r(d: Double, scale: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(d).setScale(scale, java.math.RoundingMode.HALF_UP)

  /** the Spark loop's algebra, sequentially: binary features, rounded
    * 9-place decimal term sums, 6-place sigmoid, mean gradient,
    * 6-place weight rounds. */
  private def refScores(docs: Seq[(Long, String, Boolean)], buckets: Int,
                        rounds: Int, lr: Double): Map[Long, Double] = {
    val fx: Seq[(Long, Double, Long)] = docs.flatMap { case (id, text, y) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) Seq.empty
      else {
        val bs = toks.map(t => md560(t) % buckets).distinct.toSeq
        (bs :+ -1L).map(b => (id, if (y) 1.0 else 0.0, b))
      }
    }
    val n = fx.count(_._3 == -1L)
    var w = fx.map(_._3).distinct.map(_ -> 0.0).toMap
    def margins(wm: Map[Long, Double]): Map[Long, (Double, Double)] =
      fx.groupBy(_._1).map { case (id, rows) =>
        val m = rows.map(t => r(wm(t._3) * 1.0, 9))
          .reduce(_ add _).doubleValue
        id -> (rows.head._2, m)
      }
    for (_ <- 1 to rounds) {
      val p = margins(w).map { case (id, (y, m)) =>
        id -> (y, r(1.0 / (1.0 + math.exp(-m)), 6).doubleValue)
      }
      val g = fx.groupBy(_._3).map { case (b, rows) =>
        b -> rows.map { case (id, y, _) => r(1.0 * (y - p(id)._2), 9) }
          .reduce(_ add _).doubleValue / n
      }
      w = w.map { case (b, wv) => b -> r(wv + lr * g(b), 6).doubleValue }
    }
    margins(w).map { case (id, (_, m)) =>
      id -> r(1.0 / (1.0 + math.exp(-m)), 6).doubleValue }
  }

  private val corpus: Seq[(Long, String, Boolean)] = {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1L to 40L).map { id =>
      val pos = id % 2 == 0
      val base = IndexedSeq.fill(6)(vocab(rnd.nextInt(vocab.size)))
      val toks = if (pos) base :+ "marker" else base
      (id, toks.mkString(" "), pos)
    }
  }

  test("logregScore matches the sequential rounded-decimal reference exactly") {
    val want = refScores(corpus, buckets = 32, rounds = 8, lr = 5.0)
    val got = Classifier.logregScore(corpus.toDF("doc_id", "text", "y"),
        "doc_id", "text", col("y"), buckets = 32, rounds = 8, lr = 5.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, s) =>
      assert(got(id) == s, s"doc $id: got ${got(id)} want $s") }
  }

  test("a separable marker token trains to full separation") {
    val out = Classifier.logregScore(corpus.toDF("doc_id", "text", "y"),
        "doc_id", "text", col("y"), buckets = 256, rounds = 20, lr = 10.0)
      .collect().map(r => (r.getBoolean(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.forall { case (y, _, pred) => y == pred })
    val pos = out.filter(_._1).map(_._2); val neg = out.filterNot(_._1).map(_._2)
    assert(pos.min > 0.9 && neg.max < 0.1,
      s"weak separation: pos.min=${pos.min} neg.max=${neg.max}")
  }

  test("training is partitioning-invariant and tokenless docs drop") {
    val withEmpty = corpus :+ ((41L, "", false))
    val a = Classifier.logregScore(withEmpty.toDF("doc_id", "text", "y"),
        "doc_id", "text", col("y"), buckets = 32, rounds = 4, lr = 5.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = Classifier.logregScore(
        withEmpty.toDF("doc_id", "text", "y").repartition(7),
        "doc_id", "text", col("y"), buckets = 32, rounds = 4, lr = 5.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
    assert(!a.contains(41L))
  }

  test("logregTrain exposes the weight table with the bias bucket") {
    val w = Classifier.logregTrain(corpus.toDF("doc_id", "text", "y"),
        "doc_id", "text", col("y"), buckets = 32, rounds = 4, lr = 5.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.contains(-1L))
    assert(w.values.exists(_ != 0.0))
  }

  test("driver-local and distributed GD loops are bit-identical") {
    val df = corpus.toDF("doc_id", "text", "y")
    def run(): (Map[Long, Double], Map[Long, Double]) = {
      val w = Classifier.logregTrain(df, "doc_id", "text", col("y"),
          buckets = 64, rounds = 6, lr = 8.0)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val s = Classifier.logregScore(df, "doc_id", "text", col("y"),
          buckets = 64, rounds = 6, lr = 8.0)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      graft.util.CacheRegistry.releaseAll()
      (w, s)
    }
    val (wLocal, sLocal) = run() // corpus ≤ threshold → local path
    spark.conf.set(Classifier.LocalTrainThresholdKey, "0") // force distributed
    try {
      val (wDist, sDist) = run()
      assert(wLocal == wDist, "weights must match bit-for-bit")
      assert(sLocal == sDist, "scores must match bit-for-bit")
    } finally spark.conf.unset(Classifier.LocalTrainThresholdKey)
  }
}
