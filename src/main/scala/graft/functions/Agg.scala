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
}
