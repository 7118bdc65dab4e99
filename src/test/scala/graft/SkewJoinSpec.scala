package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, SkewJoin}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of facts share one key — the skew scenario
    val facts = (1 to 1000).map(i => (if (i <= 900) 1 else i % 50, s"f$i")).toDF("k", "v")
    val dims = (0 to 60).map(i => (i, s"d$i")).toDF("dk", "dv")
    val plain = facts.join(dims, facts("k") === dims("dk"))
      .select("k", "v", "dv").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(facts, dims, "k", "dk", factor = 8)
      .select("k", "v", "dv").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("skew bench pair: salted arm returns exactly the plain arm's rows") {
    val plain = Analytics.skewJoinPlain(spark, sfDir).collect().map(_.toString)
    val salted = Analytics.skewJoinSalted(spark, sfDir).collect().map(_.toString)
    assert(plain.nonEmpty && salted.sameElements(plain))
  }

  test("salting bounds the hot key's largest reducer group by the factor") {
    // the structural 100 TB claim: unsalted, the dominant key's rows all
    // meet in ONE reducer group; salted (factor 16), the largest group
    // shrinks by ~the factor. Deterministic — no timing, no AQE
    // dependence (at local scale AQE's skew split equalizes wall-clock;
    // the salt's guarantee is the bounded group size itself).
    val (facts, _) = Analytics.skewFixture(spark, sfDir)
    val hot = facts.filter(col("k") === 1).count()
    val saltedMax = facts
      .withColumn("_salt", // saltedJoin's default carriers: all fact columns
        pmod(xxhash64(facts.columns.map(col): _*), lit(16)))
      .filter(col("k") === 1)
      .groupBy(col("_salt")).count()
      .agg(max("count")).head().getLong(0)
    assert(hot > 1000, s"fixture must actually be skewed, hot=$hot")
    assert(saltedMax <= hot / 16 * 3 / 2,
      s"largest salted group $saltedMax vs hot key $hot at factor 16")
  }

  test("salt spreads the hot key over multiple values") {
    val facts = (1 to 500).map(i => (1, s"f$i")).toDF("k", "v")
    val salts = facts
      .withColumn("_salt", pmod(xxhash64(col("k"), col("v")), lit(8)))
      .select("_salt").distinct().count()
    assert(salts >= 6) // 500 rows over 8 salts: all or nearly all present
  }

  test("B10/B11 semi and anti joins partition the customer space") {
    val semi = Analytics.semiJoinExists(spark, sfDir)
    assert(semi.agg(sum("n_orders")).head.getLong(0) > 0)
    val anti = Analytics.antiJoinNoOrders(spark, sfDir).count()
    val total = graft.sources.Tables.customer(spark, sfDir).count()
    assert(anti < total) // some customers do have recent orders
  }

  test("B12 distinct counts bounded by table cardinalities") {
    val rows = Analytics.distinctCount(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("n_parts") <= r.getAs[Long]("n_rows")))
  }
}
