package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic aggregation helpers.
  *
  * Floating-point SUM is order-dependent; on a cluster the partial-agg
  * order is nondeterministic, so money/metric sums are accumulated in
  * decimal (exact, overflow-safe) and only the final result is cast to
  * double. Oracle SQL mirrors the same cast discipline, so results are
  * bit-identical across engines.
  */
object Agg {
  val Money: DecimalType = DecimalType(18, 4)

  /** exact decimal sum of a double column, returned as double */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** exact decimal sum of a * (1 - b) (revenue idiom), as double */
  def dsumRevenue(a: Column, b: Column): Column =
    sum(a.cast(Money) * (lit(BigDecimal(1)).cast(Money) - b.cast(Money))).cast("double")

  /** deterministic average: exact decimal sum cast to double over count */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Deterministic 2-decimal half-up rounding: floor(x*100 + 0.5)/100
    * with plain IEEE ops, identical in any engine. Engine round()
    * implementations disagree on boundary doubles (Spark rounds the
    * exact decimal expansion via BigDecimal; DuckDB rounds the
    * shortest decimal representation — 52724.2449999999953 rounds to
    * .24 vs .25). Positive inputs only. */
  def round2(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("double") / lit(100)

  /** Exact interpolated percentiles per group, computed relationally so
    * any engine reproduces them bit-for-bit.
    *
    * Built-in exact percentile aggregates interpolate with
    * engine-specific fp op order (Spark `percentile` vs DuckDB
    * `quantile_cont` differ by 1 ulp on real data, which flips a
    * subsequent round() at a .xx5 boundary). Here the order statistics
    * come from a rank window and the interpolation is the explicit
    * `lo + (hi - lo) * frac` with frac = (n-1)q - floor((n-1)q) —
    * the same IEEE ops in the same order on both engines.
    *
    * Note: exact per-group percentiles inherently concentrate each
    * group on one sort partition (so does the built-in, which collects
    * the group into one aggregation buffer); the sketch path
    * (approx_percentile) is the scale escape hatch. */
  def interpolatedPercentiles(df: org.apache.spark.sql.DataFrame,
                              keyCol: String, valCol: String,
                              qs: Seq[(String, Double)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col(keyCol))
    val ranked = df.select(col(keyCol), col(valCol).cast("double").as("_v"))
      .withColumn("_rn", row_number().over(byKey.orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over(byKey))
    val aggs = qs.flatMap { case (name, q) =>
      val pos = (col("_n") - 1).cast("double") * lit(q)
      val li = floor(pos)
      Seq(
        max(when(col("_rn") === li + 1, col("_v"))).as(s"_lo_$name"),
        max(when(col("_rn") === least(li + 2, col("_n")), col("_v"))).as(s"_hi_$name"),
        max(when(col("_rn") === 1, pos - li)).as(s"_fr_$name"))
    }
    ranked.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(keyCol) +: qs.map { case (name, _) =>
        (col(s"_lo_$name") +
          (col(s"_hi_$name") - col(s"_lo_$name")) * col(s"_fr_$name")).as(name)
      }: _*)
  }
}
