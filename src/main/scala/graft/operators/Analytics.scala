package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Agg._
import graft.sources.Tables

/** Generic query-engine surface (SURVEY §2B): the relational capability
  * set the reference exercises implicitly (scan/filter/agg/join/window/
  * rollup/json/time windows), expressed as declarative DataFrame plans so
  * Catalyst handles pushdown, pruning, join selection and AQE.
  *
  * Scale notes: dimension joins (region/nation/supplier) broadcast; fact
  * joins shuffle only pruned columns; aggregates are map-side combinable;
  * windows partition on high-cardinality keys; top-k per group uses
  * row_number (partition-local sort), never a global sort.
  */
object Analytics {

  /** B1: scan + filter + groupBy agg (TPC-H Q1 family). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** B2: 3-way join + agg + deterministic top-k (TPC-H Q3 family). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val orders   = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val lineitem = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** B3: multi-way join with broadcast dims + agg (TPC-H Q5 family). */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    val nation = broadcast(Tables.nation(spark, dir))
    val supplier = broadcast(Tables.supplier(spark, dir))
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val lineitem = Tables.lineitem(spark, dir)
    region
      .join(nation, col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
                      col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** B4: window functions — rank per group. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
  }

  /** B5: rollup aggregates with ALL-sentinel for subtotal rows. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** B21: CUBE aggregate — all four grouping sets of
    * (status, order-year) computed in ONE scan (Catalyst expands the
    * cube into a single Expand + hash-aggregate; four separate
    * groupBys would read the table four times and shuffle four
    * times). Unlike B5's NULL-coalesce sentinel, subtotal provenance
    * is carried by GROUPING() flags, so a genuine NULL group value
    * and a subtotal row stay distinguishable — the contract that
    * matters once a grouping column is nullable. Exact-decimal money
    * sums (Agg.dsum); flags cast to long for oracle portability.
    *
    * 100 TB: Expand multiplies scan rows ×4 BEFORE the shuffle, but
    * partial aggregation collapses them map-side to (statuses ×
    * years) cardinality per task — the shuffle carries group-scale
    * rows, not 4× corpus. That partial-agg collapse is the whole
    * scale story for cube/rollup; verified by the B5/B21 plan shape
    * (Expand under partial HashAggregate). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_totalprice"))
      .cube(col("o_orderstatus"), col("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_year")).cast("long").as("g_year"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_year"), lit(-1L)).as("o_year"),
        col("g_status"), col("g_year"), col("n_orders"), col("sum_price"))
      .orderBy(col("g_status"), col("g_year"), col("status"), col("o_year"))

  /** B6: JSON column parsing + agg. A `$.k` value that isn't an
    * in-range integer yields NULL (and drops out of the aggregates) —
    * under ANSI mode a bare cast of a garbage or overflowing string
    * would fail the job; Norm.safeLong range-checks through decimal
    * staging so every valid long (19-digit included) parses. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("_ks", get_json_object(col("props"), "$.k"))
      .withColumn("k", graft.functions.Norm.safeLong(col("_ks")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** B22: time-RANGE moving window — per user, each event carries the
    * count and exact-decimal value sum of that user's events in the
    * PRECEDING HOUR (frame inclusive of the current row and its
    * same-microsecond peers). RANGE frames are the one sliding-window
    * form that is ORDER-DETERMINISTIC under ties: a ROWS frame over
    * tied timestamps depends on which peer sorts first, a RANGE frame
    * includes all peers in every peer's frame, so the answer is a pure
    * function of the data — which is why this surface gets its own row
    * rather than riding B4/B8's row-frame windows. Ordering key is
    * integer unix MICROS (the ns→µs truncating read both engines
    * share), never a double epoch.
    *
    * 100 TB: one hash exchange on user_id, then per-partition sort +
    * a single sliding two-pointer pass inside Spark's window exec —
    * no self-join, no explode-per-frame (the naive time-range
    * self-join shuffles |events| × avg-frame rows; this shuffles
    * |events| exactly once). Skewed users are real at scale (bots):
    * the B13 salting pattern applies if one user dominates a
    * partition. */
  def movingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    movingWindow(Tables.events(spark, dir)).orderBy("event_id")

  /** B22 core on any (event_id, user_id, ts, value) frame — split out
    * so the one-exchange plan claim is pinned directly (PlanShapeSpec). */
  def movingWindow(events: DataFrame, windowUs: Long = 3600L * 1000 * 1000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_us"))
      .rangeBetween(-windowUs, 0)
    events
      .withColumn("_us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_hour"),
        sum(col("value").cast(graft.functions.Agg.Money)).over(w)
          .cast("double").as("sum_value_hour"))
  }

  /** B7: event-time tumbling-window aggregation (batch twin of the
    * Structured Streaming D1 operator). */
  def timeWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** B8: gap-based sessionization (30-min inactivity) via lag + running
    * sum; partitioned by user_id so state never concentrates. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** B10: existence semi-join (TPC-H Q4 family) — orders with at least
    * one late lineitem, counted by priority. leftsemi never widens rows. */
  def semiJoinExists(spark: SparkSession, dir: String): DataFrame = {
    val lateLines = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(lateLines, col("o_orderkey") === col("l_orderkey"), "leftsemi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** B11: anti-join — customers with no orders in the window. */
  def antiJoinNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(spark, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "leftanti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** B12: distinct counting per group (exact; the approx path is
    * approx_count_distinct, same plan shape with an HLL sketch). */
  def distinctCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** B19: pivot — order counts and decimal-exact revenue per priority,
    * pivoted wide on order status. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"),
        col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** B17: exact percentiles per group, via the relational interpolation
    * (Agg.interpolatedPercentiles) — bit-identical across engines at
    * every scale factor, unlike the built-in aggregates whose fp op
    * order differs by 1 ulp and flips round() at .xx5 boundaries. */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pct = graft.functions.Agg.interpolatedPercentiles(li,
      "l_returnflag", "l_extendedprice",
      Seq("p50_price" -> 0.5, "p95_price" -> 0.95))
    val counts = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_rows"))
    pct.join(counts, "l_returnflag")
      .select(col("l_returnflag"),
        graft.functions.Agg.round2(col("p50_price")).as("p50_price"),
        graft.functions.Agg.round2(col("p95_price")).as("p95_price"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** B18: sketch aggregates — HLL distinct + approximate quantiles.
    * Sketch internals differ per engine, so the oracle-comparable
    * surface is: the exact answers plus booleans asserting the sketch
    * stays within its error bound (HLL default rsd 5% → 15% = 3σ;
    * approx_percentile accuracy 1000 → 5% on value for these
    * distributions). DuckDB emits the same exact values with literal
    * TRUE bounds — a sketch drifting out of bounds hash-mismatches
    * the row and fails the gate. */
  def approxSketches(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p50 = graft.functions.Agg.interpolatedPercentiles(li,
      "l_returnflag", "l_extendedprice", Seq("_p50_raw" -> 0.5))
    li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("_approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("_approx_p50"),
        count(lit(1)).as("n_rows"))
      .join(p50, "l_returnflag")
      .withColumn("exact_p50", graft.functions.Agg.round2(col("_p50_raw")))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_p50"),
        col("n_rows"),
        (abs(col("_approx_parts") - col("exact_parts")) /
          col("exact_parts") <= 0.15).as("parts_within_bound"),
        (abs(col("_approx_p50") - col("exact_p50")) /
          col("exact_p50") <= 0.05).as("p50_within_bound"))
      .orderBy(col("l_returnflag"))
  }

  /** B14: as-of join — each error event picks up the value of the same
    * user's latest prior purchase (null if none). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    TemporalJoin.asofLastBefore(errors, purchases,
        Seq("user_id"), "ts", "p_ts", Seq("p_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** B14b: the same as-of join through the custom broadcast physical
    * operator (graft.plans.BroadcastAsofJoin) — zero shuffle of the
    * fact side; results must be identical to [[asofJoin]]. */
  def asofJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    TemporalJoin.asofBroadcast(errors, purchases,
        Seq("user_id"), "ts", "p_ts", Seq("p_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** B15: range join via binning — lineitem unit prices matched into
    * part price bands, counted per part. */
  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    val points = Tables.lineitem(spark, dir)
      .select((col("l_extendedprice") / col("l_quantity")).as("unit_price"))
    val intervals = Tables.part(spark, dir)
      .select(col("p_partkey"),
        (col("p_retailprice") - 5).as("lo"), (col("p_retailprice") + 5).as("hi"))
    TemporalJoin.rangeBinned(points, intervals, "unit_price", "lo", "hi", binWidth = 10.0)
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("p_partkey"))
  }

  /** B9: top-k per group without a global sort (row_number, partition-
    * local ordering; only k rows per key survive the window filter). */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("rn"))
      .orderBy(col("l_partkey"), col("rn"))
  }

  /** B20: bloom-pruned semi-join — lineitems of size-1 parts, counted
    * per return flag. The Bloom filter of the selective part-key set
    * evaluates on the fact side BEFORE the join shuffle; the exact
    * semi-join after it removes false positives, so the oracle is the
    * plain IN-subquery. */
  def bloomSemiJoinDemo(spark: SparkSession, dir: String): DataFrame =
    BloomJoin.bloomSemiJoin(
        Tables.lineitem(spark, dir),
        Tables.part(spark, dir).filter(col("p_size") === 1).select(col("p_partkey")),
        "l_partkey", "p_partkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** B2 + B20 fused: q3 with explicit Bloom pre-pruning on BOTH fact
    * sides — orders pre-filtered by a bloom of the BUILDING customers'
    * keys, lineitem pre-filtered by a bloom of the surviving orders'
    * keys — each `might_contain` evaluating BELOW that side's join
    * exchange (plan shape spec-gated in BloomJoinSpec), so only
    * probable matches shuffle. False positives die in the exact joins:
    * the result, and therefore the oracle, is exactly q3's. At 100 TB
    * this is the flagship shuffle-reduction shape: the demo's measured
    * delta at sf0.1 is recorded in SURVEY §5. */
  def q3ShippingPriorityBloom(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val orders   = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val lineitem = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    // adaptive: each bloom builds only while its build side's estimated
    // size stays under the threshold (both do at test SFs; at a scale
    // where surviving orders outgrow it, the lineitem bloom drops out
    // and the exact join carries on unfiltered — same result)
    val ordersB = BloomJoin.bloomFilteredAdaptive(orders,
      customer.select(col("c_custkey")), "o_custkey", "c_custkey")
    val lineitemB = BloomJoin.bloomFilteredAdaptive(lineitem,
      ordersB.select(col("o_orderkey")), "l_orderkey", "o_orderkey")
    customer
      .join(ordersB, col("c_custkey") === col("o_custkey"))
      .join(lineitemB, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Deterministic dominant-key fixture for the skew bench: 90% of
    * lineitem rows land on key 1, the rest spread over 1k keys; the
    * dim side is hinted off the broadcast path (a dim small enough to
    * broadcast never needs salting — the bench measures the SHUFFLE
    * join a 100 TB dim would force). */
  private[graft] def skewFixture(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // l_orderkey/l_linenumber ride along as high-cardinality salt
    // carriers — a salt hashed from low-cardinality columns would spread
    // the hot key over a handful of lumpy buckets, not `factor` even ones
    val facts = Tables.lineitem(spark, dir).select(
      when(pmod(col("l_orderkey"), lit(10)) < 9, 1L)
        .otherwise(pmod(xxhash64(col("l_orderkey")), lit(1000L))).as("k"),
      col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val dims = spark.range(0, 1000).select(col("id").as("dk"),
      (col("id") % 7).as("w")).hint("shuffle_hash")
    (facts, dims)
  }

  /** skew bench, unsalted arm: the dominant key's rows all meet in one
    * reducer (modulo AQE's skew split). */
  def skewJoinPlain(spark: SparkSession, dir: String): DataFrame = {
    val (facts, dims) = skewFixture(spark, dir)
    facts.join(dims, facts("k") === dims("dk"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("w"))
  }

  /** skew bench, salted arm: same fixture through SkewJoin.saltedJoin
    * (factor 16) — the dominant key spreads over 16 reducers. */
  def skewJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val (facts, dims) = skewFixture(spark, dir)
    SkewJoin.saltedJoin(facts, dims, "k", "dk", factor = 16)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("w"))
  }

  /** B13 oracle demo: the salted join's RESULT equals the plain join —
    * the salt is pure partitioning mechanics (each hot key spread over
    * `factor` reducers), so the oracle is the unsalted DuckDB join.
    * lineitem × supplier on suppkey, aggregated per nation. */
  def saltedSkewJoinDemo(spark: SparkSession, dir: String): DataFrame =
    SkewJoin.saltedJoin(
        Tables.lineitem(spark, dir).select(col("l_suppkey"), col("l_quantity")),
        Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        "l_suppkey", "s_suppkey", factor = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("s_nationkey"))

  /** B16 oracle demo: both join sides written bucketed + sorted on the
    * join key, then joined back from the catalog — the sort-merge join
    * runs bucket-to-bucket with no exchange and no sort (plan shape
    * asserted by BucketingSpec; the merge hint keeps a small SF from
    * taking the broadcast path instead of the one under test). The
    * oracle is the plain DuckDB join: bucketing must not change the
    * result. The bucketed copies are run-scoped fixtures
    * ([[graft.util.Fixtures]]): path and table names carry the run id
    * (no cross-run collisions), the write happens ONCE per (run, SF) —
    * bucketing pre-pays the shuffle at write time by design, so the
    * bench's repeated passes time the zero-exchange join, not the
    * fixture write — and the janitor drops both at end of run. */
  def bucketedColocatedJoin(spark: SparkSession, dir: String): DataFrame = {
    val sf = new java.io.File(dir).getName
    val base = graft.util.Fixtures.dir(s"bucketed_$sf")
    val ordersT = graft.util.Fixtures.tableName(s"bco_orders_$sf")
    val lineitemT = graft.util.Fixtures.tableName(s"bco_lineitem_$sf")
    graft.util.Fixtures.buildOnce(base) {
      graft.io.Bucketing.writeBucketed(
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")),
        ordersT, Seq("o_orderkey"), 8, Seq("o_orderkey"),
        Some(s"$base/orders"))
      graft.io.Bucketing.writeBucketed(
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity")),
        lineitemT, Seq("l_orderkey"), 8, Seq("l_orderkey"),
        Some(s"$base/lineitem"))
    }
    spark.table(ordersT).hint("merge")
      .join(spark.table(lineitemT), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** A18: SCD2 history fold — each user's event-type change log becomes
    * interval rows (valid_from/valid_to/is_current). Duplicate (user,
    * ts) rows collapse to min(event_type) first so history order is
    * deterministic. */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    MergeOps.scd2(
        Tables.events(spark, dir)
          // one shuffle for the whole history fold: hash(user_id)
          // satisfies the (user_id, ts) dedup grouping AND both scd2
          // windows, so nothing re-exchanges downstream
          .repartition(col("user_id"))
          .groupBy(col("user_id"), col("ts"))
          .agg(min(col("event_type")).as("status")),
        Seq("user_id"), "ts", Seq("status"))
      .orderBy(col("user_id"), col("valid_from"))
}
