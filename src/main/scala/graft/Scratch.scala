package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Norm

// temporary profiling probe — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $tag pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n)")
      }

    // the geocode demo's synthesized addresses (RefDemos.geocodeCandidates)
    val k = col("c_custkey"); val n = col("c_nationkey")
    val raw = concat(
      when(k % 3 === 0, lit("106 ")).otherwise(lit("")),
      when(k % 4 === 0, lit("台北市")).when(k % 4 === 1, lit("臺中市"))
        .when(k % 4 === 2, lit("高雄市")).otherwise(lit("")),
      when(n % 3 === 0, lit("大安區")).when(n % 3 === 1, lit("信義區"))
        .otherwise(lit("")),
      when(k % 5 === 0, lit("關東里")).otherwise(lit("")),
      when(k % 7 === 0, concat(repeat(lit("龍"), 125), lit("路")))
        .when(n % 2 === 0, lit("和平東路")).otherwise(lit("中山北路")))
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
      .repartition(spark.sparkContext.defaultParallelism)
    val base = cust.select(col("c_custkey").as("id"), concat(raw,
      when(k % 2 === 0, lit("三段")).otherwise(lit("")),
      when(k % 6 === 0, lit("12巷")).otherwise(lit("")),
      when(k % 9 === 0, lit("5弄")).otherwise(lit("")),
      (k % 200 + 1).cast("string"),
      when(k % 11 === 0, concat(lit("-"), (k % 3 + 1).cast("string"))).otherwise(lit("")),
      lit("號")).as("addr"))
    base.count()
    time("base") { base.count() }

    // stage 1-2: normalize + split + region parse
    val pre = Norm.stripCountry(Norm.foldTai(Norm.stripSpaces(
      Norm.stripPostal(Norm.stripParens(col("addr"))))))
    val s1 = base.select(col("id"), pre.as("_pre"))
    time("s1-normalize") { s1.count() }
    val head = regexp_extract(col("_pre"), "^[^;；]*", 0)
    val s2 = s1.select(col("id"), col("_pre"),
      Norm.removeLi(Norm.removeLi(head)).as("_head"))
    time("s2-removeLi") { s2.count() }
    val s3 = s2.select(col("id"),
      Norm.parseCounty(col("_pre")).as("_cty"),
      Norm.parseDistrict(col("_pre")).as("_dst"),
      posexplode(filter(split(regexp_replace(
        regexp_replace(col("_head"), lit("[，,。.]"), lit("、")),
        lit("號[及和與]"), lit("號、")), "、"), s => s =!= ""))
        .as(Seq("_segi", "_seg")))
    time("s3-split") { s3.count() }
    val segr = when(Norm.hasRegionInfo(col("_seg")), col("_seg"))
      .otherwise(concat(col("_cty"), col("_dst"), col("_seg")))
    val s4 = s3.select(col("id"), col("_cty"), col("_dst"),
      col("_segi"), Norm.trimToHouseNo(segr).as("_b0"))
    time("s4-trim") { s4.count() }
    val s5 = s4.withColumn("_b1", Norm.sectionArabic(col("_b0")))
    time("s5-sectionArabic-once") { s5.count() }
    val hCols = for (bi <- 0 to 1; hi <- 0 to 2) yield {
      val b = col(s"_b$bi")
      val h = hi match {
        case 0 => b
        case 1 => Norm.hyphenToZhi(b)
        case 2 => Norm.hyphenDropSub(b)
      }
      h.as(s"_h${bi}$hi")
    }
    val s6 = s5.select(Seq(col("id"), col("_cty"), col("_dst"), col("_segi")) ++ hCols: _*)
    time("s6-hyphen") { s6.count() }
    val hNames = for (bi <- 0 to 1; hi <- 0 to 2) yield s"_h${bi}$hi"
    val secCols = hNames.map(h => Norm.sectionArabic(col(h)).as(s"${h}s"))
    val s6b = s6.select(s6.columns.map(col) ++ secCols: _*)
    time("s6b-sectionArabic-x6") { s6b.count() }
    val derived = hNames.flatMap { h =>
      Seq(Norm.dropNong(col(h)).as(s"${h}n"),
          Norm.dropXiang(col(h)).as(s"${h}x"),
          Norm.dropXiangNong(col(h)).as(s"${h}z"),
          Norm.roadOnlyOfSection(col(s"${h}s")).as(s"${h}r"))
    }
    val s7 = s6b.select(s6b.columns.map(col) ++ derived: _*)
    time("s7-degrade-roadonly") { s7.count() }
    val full = graft.operators.Geocode.expand(base, "id", "addr")
    time("full-expand") { full.count() }
    spark.stop()
  }
}
