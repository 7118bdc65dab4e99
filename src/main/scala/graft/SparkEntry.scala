package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> (Analytics.q1PricingSummary(_, _)),
    "q3_shipping_priority" -> (Analytics.q3ShippingPriority(_, _)),
    "q5_local_supplier"    -> (Analytics.q5LocalSupplier(_, _)),
    "window_rank"          -> (Analytics.windowRank(_, _)),
    "rollup_agg"           -> (Analytics.rollupAgg(_, _)),
    "json_extract"         -> (Analytics.jsonExtract(_, _)),
    "time_window_agg"      -> (Analytics.timeWindowAgg(_, _)),
    "sessionize"           -> (Analytics.sessionize(_, _)),
    "topk_per_group"       -> (Analytics.topkPerGroup(_, _)),
  )

  // Shared SQL fragments for the oracle (DuckDB) side. The cast discipline
  // mirrors graft.functions.Agg: decimal-exact sums cast to double.
  private def dsum(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"
  private def drev =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)"
  private def davg(c: String) = s"${dsum(c)} / COUNT($c)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  $drev AS sum_disc_price,
         |  ${davg("l_quantity")} AS avg_qty,
         |  ${davg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $drev AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      s"""SELECT n_name, $drev AS revenue
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(RANK() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,

    "rollup_agg" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |       COALESCE(o_orderpriority, 'ALL') AS priority,
         |       COUNT(*) AS n_orders,
         |       ${dsum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,

    "json_extract" ->
      """SELECT event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "time_window_agg" ->
      s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |       COUNT(*) AS n_events, ${dsum("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    "sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "topk_per_group" ->
      """SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice, rn
        |FROM (
        |  SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY l_partkey
        |              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
        |  FROM lineitem)
        |WHERE rn <= 2
        |ORDER BY l_partkey, rn""".stripMargin,
  )
}
