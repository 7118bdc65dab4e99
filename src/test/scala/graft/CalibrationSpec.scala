package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** C81 calibration-curve spec: closed-form bins, the top-edge fold,
  * a randomized driver recompute, and the demo's near-perfect
  * reliability shape. */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def calib(rows: Seq[(Double, Boolean)], nBins: Int = 10) =
    Classifier.calibration(rows.toDF("score", "is_target"),
        "score", "is_target", nBins)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

  test("closed form: counts, mean scores and positive rates per bin") {
    val got = calib(Seq(
      (0.05, false), (0.05, false), (0.15, true),
      (0.85, true), (0.95, true), (0.95, false)))
    assert(got.toSeq === Seq(
      (0L, 2L, 0.05, 0.0),
      (1L, 1L, 0.15, 1.0),
      (8L, 1L, 0.85, 1.0),
      (9L, 2L, 0.95, 0.5)))
  }

  test("a score of exactly 1.0 folds into the top bin") {
    val got = calib(Seq((1.0, true), (0.0, false)))
    assert(got.map(_._1).toSeq === Seq(0L, 9L))
    assert(got.last === ((9L, 1L, 1.0, 1.0)))
  }

  test("scores outside [0,1] fail loudly instead of folding into edge bins") {
    val e = intercept[Exception] { calib(Seq((3.7, true), (0.5, false))) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("probabilities required")), e.toString)
  }

  test("nBins must be at least 2") {
    intercept[IllegalArgumentException] {
      Classifier.calibration(Seq((0.5, true)).toDF("score", "is_target"),
        "score", "is_target", nBins = 1)
    }
  }

  test("randomized: equals a driver reference") {
    val rnd = new scala.util.Random(81L)
    val rows = Seq.fill(500)((math.rint(rnd.nextDouble() * 1e6) / 1e6,
      rnd.nextBoolean()))
    val got = calib(rows)
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = rows.groupBy { case (s, _) =>
        math.min(math.floor(s * 10).toLong, 9L) }
      .toSeq.sortBy(_._1)
      .map { case (b, rs) =>
        val mean = rs.map(r => BigDecimal(java.math.BigDecimal.valueOf(r6(r._1)))
          .setScale(6)).sum
        (b, rs.size.toLong,
          r6(mean.toDouble / rs.size),
          r6(rs.count(_._2).toDouble / rs.size))
      }
    assert(got.toSeq === want)
  }

  test("C81 demo row: recomputes from the classifier's own scored table") {
    // the diagram must be EXACTLY the binned view of logregScore's
    // output — no assumption about how well calibrated the demo
    // classifier is (at this spec scale it is honestly overconfident,
    // which is precisely what the artifact exists to expose)
    val rows = graft.operators.TextDemos.qualityCalibration(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val scored = graft.operators.Classifier.logregScore(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
        label = array_contains(graft.functions.Text.wsTokens(col("text")), "key"))
      .select("score", "is_target").collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = scored.groupBy { case (s, _) =>
        math.min(math.floor(s * 10).toLong, 9L) }
      .toSeq.sortBy(_._1)
      .map { case (b, rs) =>
        (b, rs.length.toLong,
          r6(rs.map(r => BigDecimal(java.math.BigDecimal.valueOf(r6(r._1)))
            .setScale(6)).sum.toDouble / rs.length),
          r6(rs.count(_._2).toDouble / rs.length))
      }
    assert(rows.toSeq === want)
    assert(rows.map(_._2).sum === scored.length.toLong)
  }
}
