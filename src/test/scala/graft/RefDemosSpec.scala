package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, MergeOps, RefDemos, Validate}
import graft.functions.{Html, Norm}

class RefDemosSpec extends SparkSpec {
  import spark.implicits._

  test("A2 anchor parsing extracts href and unescaped text") {
    val df = Seq("<a href='https://x.org/1'>A &amp; B</a>", "no anchor &amp; here")
      .toDF("html")
      .select(Html.anchorHref(col("html")).as("href"), Html.anchorText(col("html")).as("text"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "https://x.org/1" && rows(0).getString(1) == "A & B")
    assert(rows(1).getString(0) == "" && rows(1).getString(1) == "no anchor & here")
  }

  test("A3 first-per-key dedup keeps one row per key") {
    val out = RefDemos.dedupFirstPerKey(spark, sfDir)
    assert(out.groupBy("l_orderkey").count().filter(col("count") > 1).isEmpty)
  }

  test("A4 merge-max takes max and boolean OR across the union") {
    val yes = Seq((1, 10.0, true), (2, 5.0, false)).toDF("k", "v", "f")
    val no  = Seq((1, 7.0, false), (3, 1.0, true)).toDF("k", "v", "f")
    val m = MergeOps.mergeMax(yes, no, Seq("k"), Seq("v"), Seq("f")).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(m(1) == ((10.0, true)) && m(2) == ((5.0, false)) && m(3) == ((1.0, true)))
  }

  test("A5 diff-merge carries by priority and flags the delta") {
    val today = Seq((1, 100), (2, 200), (3, 300)).toDF("id", "grp")
    val prev = Seq((1, 100, 5.0)).toDF("p_id", "p_grp", "geo")
    val out = MergeOps.diffMergeCarry(today, prev,
      Seq(("id", "p_id"), ("grp", "p_grp")), Seq("geo")).collect()
      .map(r => r.getInt(0) -> ((Option(r.get(2)), r.getAs[String]("matched_by"), r.getAs[Boolean]("needs_recompute")))).toMap
    assert(out(1) == ((Some(5.0), "id", false)))    // exact key
    assert(out(2) == ((None, null, true)))          // no match -> delta
  }

  test("A6 fallback ladder resolves every row with a level tag") {
    val rows = RefDemos.fallbackResolve(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("exact", "group", "global")))
    assert(rows.map(_.getAs[Long]("n")).sum == graft.sources.Tables.lineitem(spark, sfDir).count())
  }

  test("Norm.safeLong: full Long range parses, overflow and garbage null out") {
    val rows = Seq(
      "9223372036854775807",   // Long.MaxValue (19 digits)
      "-9223372036854775808",  // Long.MinValue
      "1000000000000000000",   // 19 digits, in range
      "9223372036854775808",   // Long.MaxValue + 1 -> null
      "12345678901234567890",  // 20 digits -> null
      "12.5", "", "abc",       // non-integral forms -> null
      "-0")
      .toDF("s").select(Norm.safeLong(col("s")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows(0).contains(Long.MaxValue))
    assert(rows(1).contains(Long.MinValue))
    assert(rows(2).contains(1000000000000000000L))
    assert(rows(3).isEmpty && rows(4).isEmpty)
    assert(rows(5).isEmpty && rows(6).isEmpty && rows(7).isEmpty)
    assert(rows(8).contains(0L))
  }

  test("A7-A9 normalization functions") {
    val df = Seq(("(02) 2345-678", "https://www.foo.tw/a", "104 台北市（備註）中山北路三十五巷7號9樓"))
      .toDF("phone", "url", "addr")
    val r = df.select(
      Norm.phoneDigits(col("phone")),
      Norm.urlDomain(col("url")),
      Norm.normalizeAddress(col("addr")),
      Norm.zhStreetNumeralToArabic(lit("二十五巷3號"))).head
    assert(r.getString(0) == "022345678")
    assert(r.getString(1) == "foo.tw")
    assert(r.getString(2) == "臺北市中山北路三十五巷7號")
    assert(r.getString(3) == "25巷3號")
  }

  test("A10 constraint report counts violations per rule") {
    val df = Seq((1, -5.0), (2, 3.0)).toDF("id", "v")
    val rep = Validate.constraintReport(df, Seq("neg_v" -> (col("v") < 0))).collect()
    assert(rep.length == 1 && rep(0).getString(0) == "neg_v" && rep(0).getLong(1) == 1L)
  }

  test("A11 check-total flags only inconsistent groups") {
    val out = RefDemos.checkTotal(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(r => r.getAs[Long]("o_custkey") % 7 == 0))
    assert(out.forall(_.getAs[Long]("diff") == 1L))
  }

  test("A11b fix-totals rewrites bad/missing declared totals, leaves good ones") {
    import spark.implicits._
    import graft.operators.Validate
    val df = Seq(
      (1L, Some(2L)), (1L, Some(2L)),   // declared correct (2 rows)
      (2L, Some(9L)),                    // declared wrong
      (3L, None)                         // no declared total
    ).toDF("k", "declared")
    val out = Validate.fixTotals(df, "k", "declared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.filter(_._1 == 1L).forall { case (_, d, f) => d == 2L && !f })
    assert(out.filter(_._1 == 2L).forall { case (_, d, f) => d == 1L && f })
    assert(out.filter(_._1 == 3L).forall { case (_, d, f) => d == 1L && f })
    val fixedAgg = RefDemos.checkTotalFix(spark, sfDir).collect()
    assert(fixedAgg.map(_.getBoolean(0)).toSet == Set(true, false))
  }

  test("C1 exact dedup groups identical texts under one hash") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactByHash(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }
}
