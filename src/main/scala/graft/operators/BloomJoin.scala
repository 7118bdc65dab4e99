package graft.operators

import org.apache.spark.sql.{DataFrame, GraftDataset}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter => LFilter}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (SURVEY §2 B20) — the standard 100 TB
  * shuffle-reduction move: when a big fact table joins a selective key
  * set that is still too large (or too late-computed) to broadcast-join
  * directly, build a Bloom filter of the keys, evaluate it against the
  * fact side BEFORE the join's exchange, and let only probable matches
  * shuffle. Rows that fail the filter are definite non-matches; false
  * positives are removed by the exact join that follows, so results
  * are bit-identical to the unfiltered join.
  *
  * Spark-native construction: reuses Catalyst's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions (the
  * machinery behind `spark.sql.optimizer.runtime.bloomFilter`, which
  * only auto-injects under specific selectivity heuristics) with the
  * filter side delivered as a scalar subquery — exactly the plan shape
  * Spark's InjectRuntimeFilter rule produces, but available explicitly
  * and composably. Keys of any type normalize through xxhash64.
  */
object BloomJoin {

  /** `large` filtered to rows whose `largeKey` PROBABLY appears in
    * `small`'s `smallKey` set (no false negatives). `numBits` sizes the
    * filter: ~8 bits/expected item ≈ 3% false positives. */
  def bloomFiltered(large: DataFrame, small: DataFrame,
                    largeKey: String, smallKey: String,
                    estItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val keyHashes = small
      .select(xxhash64(col(smallKey)).as("_h"))
      .queryExecution.analyzed
    val bloomAgg = Aggregate(Nil, Seq(
      Alias(new BloomFilterAggregate(keyHashes.output.head,
        Literal(estItems), Literal(numBits)).toAggregateExpression(), "_bloom")()),
      keyHashes)
    val largePlan = large.queryExecution.analyzed
    val keyAttr = largePlan.output.find(_.name == largeKey).getOrElse(
      throw new IllegalArgumentException(
        s"bloomFiltered: column '$largeKey' not found on the large side " +
          s"(available: ${largePlan.output.map(_.name).mkString(", ")})"))
    val cond = BloomFilterMightContain(
      ScalarSubquery(bloomAgg), new XxHash64(Seq(keyAttr)))
    GraftDataset.ofPlan(large.sparkSession, LFilter(cond, largePlan))
  }

  /** [[bloomFiltered]] gated on the build side's size, the way
    * Catalyst's own InjectRuntimeFilter gates on
    * `runtime.bloomFilter.creationSideThreshold`: building a bloom
    * means an extra full scan + aggregation of the build side, which
    * only pays off while that side is small relative to the probe
    * side's saved shuffle. When the build side's estimated plan size
    * exceeds `maxBuildBytes`, the probe side is returned UNCHANGED (no
    * filter, no build scan) — results are identical either way because
    * the bloom only ever pre-prunes an exact join that follows.
    *
    * The estimate is Catalyst's `LogicalPlan.stats.sizeInBytes`
    * (file-size × selectivity propagation — available without ANALYZE
    * stats), read at plan-composition time; no job runs. Default 64 MB:
    * past that a bloom of useful FPP needs enough bits that shipping
    * it to every task rivals a broadcast join of the keys themselves. */
  def bloomFilteredAdaptive(large: DataFrame, small: DataFrame,
                            largeKey: String, smallKey: String,
                            estItems: Long = 1000000L, numBits: Long = 8388608L,
                            maxBuildBytes: Long = 64L * 1024 * 1024): DataFrame = {
    val buildSize = small.queryExecution.optimizedPlan.stats.sizeInBytes
    if (buildSize > maxBuildBytes) large
    else bloomFiltered(large, small, largeKey, smallKey, estItems, numBits)
  }

  /** Exact semi-join with Bloom pre-pruning: semantically identical to
    * `large.join(small, largeKey === smallKey, "leftsemi")`, but only
    * probable matches reach the join's shuffle. */
  def bloomSemiJoin(large: DataFrame, small: DataFrame,
                    largeKey: String, smallKey: String,
                    estItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val pre = bloomFiltered(large, small, largeKey, smallKey, estItems, numBits)
    // resolve the join key against each side explicitly: a bare
    // col(smallKey) is ambiguous whenever largeKey == smallKey
    val rhs = small.select(col(smallKey))
    pre.join(rhs, pre(largeKey) === rhs(smallKey), "leftsemi")
  }
}
