package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Norm, Text}
import graft.operators.MergeOps

/** Property-style specs using raw seeded ScalaCheck generators (the
  * scalatest bridge isn't in the offline dep set). Seeds are fixed, so
  * the samples — and therefore the suite — are deterministic. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("phoneDigits yields digits only, idempotently") {
    val strs = samples(Gen.listOfN(30, Gen.asciiPrintableChar).map(_.mkString), 20)
    val rows = strs.toDF("p")
      .select(Norm.phoneDigits(col("p")).as("d"))
      .select(col("d"), Norm.phoneDigits(col("d")).as("dd"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0).forall(_.isDigit))
      assert(r.getString(0) == r.getString(1))
    }
  }

  test("fingerprint is stable and within the modulus") {
    val strs = samples(Gen.alphaNumStr.map(_.take(99)), 20)
    val fp = (strs ++ strs).toDF("t")
      .select(col("t"), Text.fingerprint(col("t")).as("f")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val byText = fp.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    byText.foreach { case (_, vs) => assert(vs.length == 1) }
    fp.foreach { case (_, v) => assert(v >= 0 && v < 1000000007L) }
  }

  test("token counts: ws tokens <= bpe tokens for alphabetic text") {
    val strs = samples(Gen.listOf(Gen.alphaStr.suchThat(_.nonEmpty)).map(_.mkString(" ")), 20)
    val rows = strs.toDF("t")
      .select(Text.tokenCount(col("t")), Text.bpeTokenCount(col("t"))).collect()
    rows.foreach(r => assert(r.getLong(0) <= r.getLong(1)))
  }

  test("mergeMax is symmetric in its inputs") {
    val rowGen = Gen.listOfN(12, Gen.zip(Gen.choose(1, 4), Gen.choose(0.0, 100.0), Gen.oneOf(true, false)))
    samples(rowGen, 5).zip(samples(rowGen, 5).reverse).foreach { case (l1, l2) =>
      val a = l1.toDF("k", "v", "f")
      val b = l2.toDF("k", "v", "f")
      val ab = MergeOps.mergeMax(a, b, Seq("k"), Seq("v"), Seq("f"))
        .collect().map(_.toString).sorted
      val ba = MergeOps.mergeMax(b, a, Seq("k"), Seq("v"), Seq("f"))
        .collect().map(_.toString).sorted
      assert(ab.sameElements(ba))
    }
  }

  test("zh numeral round-trip for all 1..99 (exhaustive)") {
    val digits = Seq("", "一", "二", "三", "四", "五", "六", "七", "八", "九")
    def zh(n: Int): String = {
      val t = n / 10; val o = n % 10
      (if (t == 0) "" else if (t == 1) "十" else digits(t) + "十") +
        (if (o == 0) "" else digits(o))
    }
    val df = (1 to 99).map(n => (n, zh(n) + "巷")).toDF("n", "s")
    val bad = df.select(col("n"),
        Norm.zhStreetNumeralToArabic(col("s")).as("conv"))
      .filter(col("conv") =!= concat(col("n").cast("string"), lit("巷")))
      .count()
    assert(bad == 0L)
  }
}
