package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** C77 DoReMi-step spec: closed-form weight identities, clamping and
  * smoothing bounds, and a randomized driver-reference recompute of
  * the full rounding discipline. */
class MixtureReweightSpec extends SparkSpec {
  import spark.implicits._

  private def domains(rows: (String, Double, Double)*) =
    rows.toDF("source", "proxy_loss", "ref_loss")

  private def weights(df: org.apache.spark.sql.DataFrame,
                      eta: Double = 50.0, s: Double = 0.2) =
    Sampling.mixtureReweight(df, "source", "proxy_loss", "ref_loss", eta, s)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))

  test("equal losses give the uniform mixture at any eta and smoothing") {
    val w = weights(domains(("a", 2.0, 1.5), ("b", 2.0, 1.5),
      ("c", 2.0, 1.5), ("d", 2.0, 1.5)))
    assert(w.forall(_._3 === 0.25), w.mkString(", "))
  }

  test("below-reference domains clamp to zero excess, tied at the floor weight") {
    val w = weights(domains(("cold", 0.5, 1.0), ("zero", 1.0, 1.0),
      ("hot", 1.2, 1.0))).map(x => x._1 -> x).toMap
    assert(w("cold")._2 === 0.0 && w("zero")._2 === 0.0)
    assert(w("cold")._3 === w("zero")._3) // clamped = genuinely-zero excess
    assert(w("hot")._3 > w("cold")._3)
  }

  test("weights are monotone in excess and sum to 1 within rounding") {
    val w = weights(domains(("a", 1.0, 1.0), ("b", 1.01, 1.0),
      ("c", 1.02, 1.0), ("d", 1.05, 1.0)))
    assert(w.sliding(2).forall { case Array(x, y) => x._3 < y._3 })
    assert(math.abs(w.map(_._3).sum - 1.0) < w.length * 5e-7)
  }

  test("smoothing floors every weight at s/n; s=0 removes the floor") {
    val skew = domains(("tiny", 1.0, 1.0), ("huge", 2.0, 1.0))
    val floored = weights(skew, eta = 50.0, s = 0.2)
    assert(floored.forall(_._3 >= 0.2 / 2 - 5e-7), floored.mkString(", "))
    val raw = weights(skew, eta = 50.0, s = 0.0)
    // exp(50) dwarfs exp(0): the cold domain rounds to the 6-place floor
    assert(raw.find(_._1 == "tiny").get._3 === 0.0)
    assert(raw.find(_._1 == "huge").get._3 === 1.0)
  }

  test("randomized: equals the sequential rounded-decimal reference") {
    val rnd = new scala.util.Random(77L)
    val rows = (0 until 30).map(i =>
      (f"s$i%02d", 1.0 + rnd.nextDouble() * 0.1, 1.03))
    val eta = 40.0; val s = 0.15
    val got = weights(domains(rows: _*), eta, s)

    def r(x: Double, places: Int) =
      BigDecimal(java.math.BigDecimal.valueOf(x))
        .setScale(places, BigDecimal.RoundingMode.HALF_UP)
    val excess = rows.map { case (n, p, rf) => n -> r(math.max(p - rf, 0.0), 6) }
    val mx = excess.map(_._2.toDouble).max
    val w9 = excess.map { case (n, e) => n -> r(math.exp(eta * (e.toDouble - mx)), 9) }
    val denom = w9.map(_._2).sum.toDouble
    val n = rows.size
    val want = w9.map { case (name, w) =>
      (name, excess.toMap.apply(name).toDouble,
        r((1.0 - s) * (w.toDouble / denom) + s / n, 6).toDouble)
    }.sortBy(_._1)
    assert(got.toSeq === want)
  }

  test("C77 demo row: a proper mixture, hardest source on top, floor held") {
    val df = graft.operators.TextDemos.mixtureReweightDemo(spark, sfDir)
    val rows = df.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._4).sum - 1.0) < rows.length * 5e-7)
    assert(rows.forall(_._4 >= 0.2 / rows.length - 5e-7))
    val maxExcess = rows.maxBy(_._3)
    val maxWeight = rows.maxBy(_._4)
    assert(maxExcess._1 === maxWeight._1,
      s"hardest source ${maxExcess._1} should carry the max weight, got ${maxWeight._1}")
  }
}
