package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** Dataset splitting and sampling for training pipelines (SURVEY §2 C).
  *
  * [[hashSplit]] assigns rows to named splits by hashing a stable key —
  * fully deterministic (re-runs, retries and different partitionings
  * all agree), the property random() sampling lacks and exactly how
  * production corpora pin their train/val/test membership.
  *
  * [[stratified]] wraps per-stratum Bernoulli sampling (seeded) for
  * data mixing; proportions are approximate by nature.
  */
object Sampling {

  /** split assignment from percentage cut points, e.g.
    * Seq("train" -> 80, "val" -> 10, "test" -> 10). Buckets come from
    * `hash(key) mod 100`; the hash is pluggable (engine-portable md5-60
    * by default so an external system can reproduce membership). */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Int)],
                hash: Column => Column = Vec.md5Hash60): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val bucket = pmod(hash(col(keyCol).cast("string")), lit(100))
    val cuts = splits.scanLeft(0) { case (acc, (_, pct)) => acc + pct }.tail
    val assign = splits.zip(cuts).foldRight(lit(null).cast("string")) {
      case (((name, _), cut), els) => when(bucket < cut, lit(name)).otherwise(els)
    }
    df.withColumn("split", assign)
  }

  /** C38 — deterministic EXACT-k per-group sample (the bottom-k /
    * priority-sampling sketch): each row's priority is a seed-keyed
    * engine-portable md5-60 hash of its id, and the k smallest
    * priorities per group are a uniform k-sample — re-running with
    * the same seed reproduces membership bit-for-bit (the property
    * `TABLESAMPLE`/`rand()` lack), a new seed redraws it, and groups
    * smaller than k survive whole. Selection rides
    * [[graft.expressions.BoundedTopK]] with a CONSTANT sim and the
    * (priority, id) pair as the orderable tie-break id, so ordering
    * is exact 60-bit integer comparison (a double sim would round
    * above 2^53) and at most k rows per partition per group reach the
    * shuffle — no per-group window sort ever materializes a full
    * group in one task. Output: (group, id, rank), rank 1..k by
    * (priority, id). */
  def groupSample(df: DataFrame, groupCol: String, idCol: String,
                  k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"groupSample: k must be >= 1, got $k")
    val pri = Vec.md5Hash60(concat(col(idCol).cast("string"), lit("_" + seed)))
    df.select(col(groupCol), col(idCol), pri.as("_pri"))
      .groupBy(col(groupCol))
      .agg(call_function("graft_topk",
        struct(lit(0.0).as("sim"),
          struct(col("_pri").as("pri"), col(idCol).as("id")).as("id")),
        lit(k)).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(groupCol), col("t.id.id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** seeded per-stratum sampling (approximate fractions). */
  def stratified(df: DataFrame, strataCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Temperature-scaled source mixing (C44) — the multinomial
    * flattening of the GPT-3 / PaLM / mT5 data recipes: target source
    * probabilities q_s ∝ p_s^α with p_s the corpus shares and
    * α ∈ (0, 1] the temperature (α = 1 keeps the natural mix, α → 0
    * approaches uniform). Downsample-only: the largest total
    * consistent with q is kept, which reduces to per-source keep
    * fraction f_s = (n_s / n_min)^(α−1) — the SMALLEST source
    * survives whole and larger sources flatten toward it; the
    * normalization constant cancels, so no Σ q_s is ever computed.
    * (Upsampling, the other half of the published recipes, is epoch
    * repetition at training time, not a corpus transform.)
    *
    * Same scale shape as [[sourceMix]]: one count aggregation reduces
    * to a broadcast per-source fraction table, membership is
    * deterministic key-hash thresholding, and the corpus itself never
    * shuffles. Adds `keep_frac` to surviving rows. */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
                     alpha: Double,
                     hash: Column => Column = Vec.md5Hash60): DataFrame =
    mixWithFracs(df, temperatureFracs(df, sourceCol, alpha), sourceCol, keyCol, hash)

  /** the sampling half of [[temperatureMix]] against an already-computed
    * fracs table, so summary views don't pay the corpus-scale count
    * aggregation twice. */
  private def mixWithFracs(df: DataFrame, fracs: DataFrame, sourceCol: String,
                           keyCol: String, hash: Column => Column): DataFrame =
    df.join(broadcast(fracs.drop("_n")), sourceCol)
      .filter(pmod(hash(col(keyCol).cast("string")), lit(1000000)).cast("double") <
        col("keep_frac") * 1000000.0)

  /** per-source release-note accounting for [[temperatureMix]]:
    * (source, n_before, n_kept, keep_frac). The spine is the frac
    * table, so a source whose sample kept ZERO rows still reports
    * (source, n, 0, frac) instead of vanishing — a release note that
    * omits its most aggressively downsampled sources is unreadable
    * exactly where it matters. */
  def temperatureMixSummary(df: DataFrame, sourceCol: String, keyCol: String,
                            alpha: Double,
                            hash: Column => Column = Vec.md5Hash60): DataFrame = {
    // One fracs plan feeds both the spine and the sample: persist it so
    // the corpus-scale count aggregation runs once, not twice. Registered
    // so Verify/Bench's per-query releaseAll() frees it (the contract for
    // operator persists consumed after return).
    val fracs = graft.util.CacheRegistry.register(
      temperatureFracs(df, sourceCol, alpha)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val after = mixWithFracs(df, fracs, sourceCol, keyCol, hash)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_kept"))
    fracs.join(after, Seq(sourceCol), "left")
      .select(col(sourceCol), col("_n").as("n_before"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        round(col("keep_frac"), 6).as("keep_frac"))
  }

  /** the per-source (n, keep_frac) table behind [[temperatureMix]] —
    * exposed so summary views (C79's release-note accounting) can
    * report sources whose sample kept ZERO rows instead of dropping
    * them. */
  def temperatureFracs(df: DataFrame, sourceCol: String,
                       alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"temperatureMix: alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
    val nMin = counts.agg(min(col("_n")).as("_nmin"))
    counts.crossJoin(broadcast(nMin))
      .select(col(sourceCol), col("_n"),
        pow(col("_n").cast("double") / col("_nmin").cast("double"),
          lit(alpha - 1.0)).as("keep_frac"))
  }

  /** Mixture rebalancing for training-data composition: given target
    * weights per source, keep the LARGEST total consistent with the
    * weights — T = min over sources of n_s/w_s, per-source keep
    * fraction w_s·T/n_s — then sample each source down by
    * deterministic key-hash thresholding (same retry/partition
    * invariance as [[hashSplit]]; unlisted sources drop). One count
    * aggregation + a broadcast fraction table; the corpus itself never
    * shuffles. Adds `keep_frac` to surviving rows. */
  def sourceMix(df: DataFrame, sourceCol: String, keyCol: String,
                weights: Seq[(String, Double)],
                hash: Column => Column = Vec.md5Hash60): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "sourceMix: weights must be positive")
    val wExpr = weights.foldRight(lit(0.0)) { case ((s, w), els) =>
      when(col(sourceCol) === s, lit(w)).otherwise(els)
    }
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", wExpr)
      .filter(col("_w") > 0)
    val tMax = counts.agg(min(col("_n").cast("double") / col("_w")).as("_T"))
    val fracs = counts.crossJoin(broadcast(tMax))
      .select(col(sourceCol),
        least(lit(1.0), col("_w") * col("_T") / col("_n").cast("double"))
          .as("keep_frac"))
    df.join(broadcast(fracs), sourceCol)
      .filter(pmod(hash(col(keyCol).cast("string")), lit(1000000)).cast("double") <
        col("keep_frac") * 1000000.0)
  }

  /** C54 — per-source quality-quantile gate (the FineWeb/CCNet curation
    * step "keep each source's best fraction", without cross-source
    * score calibration: a boilerplate-heavy source and a book corpus
    * get their own bars). Threshold = the exact interpolated q-quantile
    * of `scoreCol` WITHIN each source ([[graft.functions.Agg
    * .interpolatedPercentiles]] — engine-bit-exact interpolation), kept
    * rows are `score >= threshold`.
    *
    * Scale shape: the threshold pass shuffles only (source, score)
    * pairs and yields one row per source, which then BROADCASTS into a
    * map-side filter of the corpus — the corpus itself never shuffles;
    * it is read twice, the dsir lesson (a second scan beats a
    * corpus-scale persist under an exchange-reuse subtree). Exact
    * per-source quantiles sort within source partitions; the
    * approx_percentile sketch is the documented escape hatch when a
    * single source outgrows a sort (B18's machinery). */
  /** C77 — DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * one exponentiated-gradient update of per-domain mixture weights
    * from per-domain excess loss. Domains where the proxy loss exceeds
    * the reference loss — intrinsically hard, under-learned domains —
    * are upweighted; the uniform-smoothing term keeps every domain's
    * weight bounded away from zero so no domain starves.
    *
    *   excess_i = max(0, proxy_i − ref_i)            (rounded 6)
    *   w_i      ∝ exp(η · (excess_i − max_j excess_j))  (rounded 9 → decimal)
    *   weight_i = (1−s) · w_i / Σw + s / n           (rounded 6)
    *
    * The softmax is max-stabilized (the ratio is unchanged; every term
    * lands in (0,1]) so no η·excess can overflow the exact-decimal
    * normalizer — terms below 5e-10 round to zero and the smoothing
    * floor is all that keeps such a domain alive, exactly the
    * semantics DoReMi's smoothing exists for.
    *
    * Scale shape: the input is the per-DOMAIN loss table — dimension-
    * scale by construction (domains number in the hundreds, not the
    * billions) — so the normalizer is a one-row aggregate broadcast
    * back by crossJoin; no driver traffic, no corpus access. The
    * rounded-exp terms sum through decimal (the lm_score discipline)
    * so the normalizer is partial-agg-order-proof.
    *
    * Determinism: excess subtracts two already-deterministic doubles;
    * exp is the only transcendental and rounds to 9 before the exact
    * decimal sum; the final weight divides two identical doubles in
    * both engines, then rounds 6.
    */
  def mixtureReweight(perDomain: DataFrame, sourceCol: String,
                      proxyCol: String, refCol: String,
                      eta: Double, smoothing: Double): DataFrame = {
    require(eta > 0, s"mixtureReweight: eta=$eta must be positive")
    require(smoothing >= 0 && smoothing < 1,
      s"mixtureReweight: smoothing=$smoothing outside [0,1)")
    val excess = perDomain.select(
      col(sourceCol), col(proxyCol),
      round(greatest(col(proxyCol) - col(refCol), lit(0.0)), 6).as("excess"))
    val peak = excess.agg(max(col("excess")).as("_mx"))
    val scored = excess.crossJoin(broadcast(peak))
      .withColumn("_w", round(exp(lit(eta) * (col("excess") - col("_mx"))), 9)
        .cast("decimal(27,9)"))
    val norm = scored.agg(
      sum(col("_w")).as("_denom"), count(lit(1)).as("_n"))
    scored.crossJoin(broadcast(norm))
      .select(col(sourceCol), col(proxyCol), col("excess"),
        round(lit(1.0 - smoothing)
            * (col("_w").cast("double") / col("_denom").cast("double"))
          + lit(smoothing) / col("_n"), 6).as("weight"))
  }

  def sourceQuantileFilter(df: DataFrame, idCol: String, scoreCol: String,
                           sourceCol: String, q: Double): DataFrame = {
    require(q > 0 && q < 1, s"sourceQuantileFilter: q=$q outside (0,1)")
    val thr = graft.functions.Agg.interpolatedPercentiles(
      df.select(col(sourceCol), col(scoreCol)), sourceCol, scoreCol,
      Seq("threshold" -> q))
    df.join(broadcast(thr), Seq(sourceCol))
      .filter(col(scoreCol) >= col("threshold"))
      .select(col(idCol), col(sourceCol), col(scoreCol), col("threshold"))
  }

  /** C85 — token-budget greedy selection: keep the best-scoring
    * documents, in (score desc, id asc) order, until the cumulative
    * token count reaches `floor(budgetFrac * total_tokens)` — the
    * "fill the training run's token budget with the best data"
    * primitive every curation pipeline ends with.
    *
    * The semantics are a running sum over a GLOBAL total order, which
    * a naive window (`ORDER BY score DESC` with no PARTITION BY)
    * computes on ONE task — a guaranteed straggler at corpus scale.
    * This runs it as the classic two-phase scan instead:
    *
    *  1. range-repartition on the order key, so partition i holds a
    *     contiguous, disjoint key range and partition order = global
    *     order (persisted: the range boundaries come from sampling,
    *     and both downstream jobs must see the SAME partitioning);
    *  2. one tiny job aggregates per-partition token subtotals —
    *     numPartitions rows to the driver, a prefix scan over them
    *     yields each partition's global offset;
    *  3. a per-partition window (partitionBy the partition id) adds
    *     the local running sum to the broadcast offset — every
    *     partition computes its slice of the global cumsum in
    *     parallel, bit-identically to the single-task form.
    *
    * Output: (idCol, score, toks, cum_tokens) for the selected rows.
    * Exact at any scale: token counts are integers, so the running sum
    * is order-free arithmetic once the total order is fixed; score
    * ties break on id.
    *
    * PRECONDITION: `idCol` must be unique. The order key is
    * (score desc, id) — duplicate ids with equal scores leave the
    * running sum's tie order undefined across partitionings, which
    * makes the cut point (and therefore the selected SET)
    * nondeterministic across runs. [[shardBalance]] shares the
    * requirement (it orders by id alone). */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: Column,
                   tokCol: Column, budgetFrac: Double,
                   partitions: Int = 0): DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac <= 1.0,
      s"budgetSelect: budgetFrac must be in (0,1], got $budgetFrac")
    val scored = df.select(col(idCol), scoreCol.as("score"),
      coalesce(tokCol.cast("long"), lit(0L)).as("toks"))
    cumsumByRange(scored, Seq(col("score").desc, col(idCol)), partitions) match {
      case None => scored.withColumn("cum_tokens", lit(0L)).limit(0)
      case Some((cum, total)) =>
        val budget = math.floor(total * budgetFrac).toLong
        cum.withColumnRenamed("cum", "cum_tokens")
          .filter(col("cum_tokens") <= budget)
          .select(col(idCol), col("score"), col("toks"), col("cum_tokens"))
    }
  }

  /** The shared two-phase distributed cumsum (the scale-safe global
    * running sum): range-partition by `order`, per-partition window,
    * broadcast prefix offsets — numPartitions-scale driver work, never
    * a single-task global window. Input must carry a non-null long
    * `toks` column; returns the input plus `cum` (inclusive running
    * sum of toks in global `order`) and the driver-known grand total,
    * or None for an empty input. */
  private def cumsumByRange(scored: DataFrame, order: Seq[Column],
                            partitions: Int): Option[(DataFrame, Long)] = {
    val spark = scored.sparkSession
    val nPart = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = graft.util.CacheRegistry.register(
      scored.repartitionByRange(nPart, order: _*)
        .withColumn("_pid", spark_partition_id())
        .persist())
    // numPartitions-scale driver work: subtotals -> prefix offsets;
    // the grand total is their sum — no separate whole-input pass
    val partTotals = ranged.groupBy("_pid").agg(sum("toks").as("pt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (partTotals.isEmpty) return None
    val total = partTotals.map(_._2).sum
    var acc = 0L
    val offsets = partTotals.map { case (pid, pt) =>
      val o = (pid, acc); acc += pt; o
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy("_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Some((ranged.join(broadcast(offDf), "_pid")
      .withColumn("cum", sum("toks").over(w) + col("_off")), total))
  }

  /** Token-balanced training shards: every document lands in one of
    * `nShards` CONTIGUOUS (in id order) shards of near-equal token
    * mass — the layout a trainer wants when each worker streams one
    * shard (equal-token shards equalize step counts; equal-DOC shards
    * don't, because document lengths are heavy-tailed). Assignment is
    * by starting offset: shard = ⌊prev_cum · S / total⌋ capped at
    * S−1, so each shard's mass misses the ideal total/S by at most
    * one document — and a document LARGER than total/S leaves its
    * neighbors' shards empty rather than splitting (shard ids may
    * skip; ≤ S output rows, documented behavior).
    *
    * Scale shape: the cumulative sum is [[budgetSelect]]'s two-phase
    * range-partitioned scan (per-partition window + broadcast prefix
    * offsets), never a single-task global window; the summary groupBy
    * collapses to ≤ S rows map-side. Returns one row per non-empty
    * shard: (shard, n_docs, shard_tokens, min_doc, max_doc, rel_dev)
    * where rel_dev = shard_tokens·S/total − 1 (round 6), the
    * imbalance a trainer reads.
    *
    * PRECONDITION: `idCol` must be unique — the cumsum's total order
    * is the id alone, so duplicate ids make shard assignment (and the
    * contiguity guarantee above) nondeterministic across runs and
    * partitionings. */
  def shardBalance(df: DataFrame, idCol: String, tokCol: Column,
                   nShards: Int, partitions: Int = 0): DataFrame = {
    require(nShards >= 1, s"shardBalance: nShards must be >= 1, got $nShards")
    // null token counts coalesce to 0: a null riding into the boundary
    // algebra would null the shard id and least() would silently park
    // the doc in the LAST shard, breaking contiguity
    val scored = df.select(col(idCol),
      coalesce(tokCol.cast("long"), lit(0L)).as("toks"))
    cumsumByRange(scored, Seq(col(idCol)), partitions) match {
      case Some((cum, total)) if total > 0L =>
        // total is a driver-known scalar, so the shard boundary rides
        // the plan as a literal (exact integer algebra — `div`, not fp).
        // Fail FAST on the boundary product's overflow edge: at
        // total·nShards >= 2^63 the per-row (cum−toks)·nShards would
        // abort mid-job under ANSI mode; total is driver-known, so the
        // plan refuses to build instead
        require(total <= Long.MaxValue / nShards,
          s"shardBalance: total_tokens ($total) * nShards ($nShards) " +
            "overflows the Long boundary algebra; shard in two tiers or " +
            "rescale the token unit")
        cum.withColumn("shard",
            least(expr(s"((cum - toks) * $nShards) div ${total}L"),
              lit(nShards - 1L)))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("shard_tokens"),
            min(col(idCol)).as("min_doc"), max(col(idCol)).as("max_doc"))
          .withColumn("rel_dev",
            round((col("shard_tokens") * nShards).cast("double") /
              lit(total).cast("double") - 1.0, 6))
          .select(col("shard"), col("n_docs"), col("shard_tokens"),
            col("min_doc"), col("max_doc"), col("rel_dev"))
      case _ =>
        // empty corpus (or all-empty docs): one degenerate shard 0
        scored.agg(count(lit(1)).as("n_docs"),
            coalesce(sum("toks"), lit(0L)).as("shard_tokens"),
            min(col(idCol)).as("min_doc"), max(col(idCol)).as("max_doc"))
          .filter(col("n_docs") > 0)
          .select(lit(0L).as("shard"), col("n_docs"), col("shard_tokens"),
            col("min_doc"), col("max_doc"), lit(0.0).as("rel_dev"))
    }
  }

  /** C101 — deterministic weighted sampling WITHOUT replacement: draw
    * `m` rows with inclusion proportional to an integer weight — the
    * selection step DSIR-style importance weighting (C41 scores, this
    * draws), domain rebalancing, and weighted eval-set construction
    * all end with. Spark's `sample()` is Bernoulli, unweighted, and
    * partitioning-dependent; this is the A-Res weighted-reservoir
    * scheme (Efraimidis & Spirakis, IPL 2006) made exact and
    * engine-reproducible by discretizing the key race to INTEGER
    * arithmetic: each row enters the race with `w` deterministic
    * 60-bit hash tickets (md5 of "id#r", r = 1..w) and its key is the
    * MINIMUM ticket — P(key_A < key_B) = w_A/(w_A + w_B) exactly (up
    * to 2⁻⁶⁰ collision mass), the exponential-race order statistic
    * with no ln/pow libm call to diverge between engines. Global
    * top-m on (key, id).
    *
    * Weights clamp to [1, maxWeight] (null/0/negative → 1): the
    * ticket array is a per-row EXPRESSION of bounded length, so the
    * key costs ≤ maxWeight hashes map-side — quantize real-valued
    * importance weights onto that integer grid (fidelity knob, the
    * int8-quantization trade C48 makes for vectors). Scale shape: one
    * map-only pass + TakeOrdered(m); nothing shuffles but the m
    * winners per partition. Output (rank, id, weight, race_key),
    * rank 1..m in race order. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     m: Int, maxWeight: Int = 64): DataFrame = {
    require(m >= 1, s"weightedSample: m must be >= 1, got $m")
    require(maxWeight >= 1 && maxWeight <= 4096,
      s"weightedSample: maxWeight must be in [1, 4096], got $maxWeight")
    val w = least(greatest(coalesce(weightCol.cast("long"), lit(1L)), lit(1L)),
      lit(maxWeight.toLong))
    val key = array_min(transform(sequence(lit(1L), w),
      r => Vec.md5Hash60(concat(col(idCol).cast("string"), lit("#"),
        r.cast("string")))))
    val winners = df
      .select(col(idCol), w.as("weight"), key.as("race_key"))
      .orderBy(col("race_key"), col(idCol))
      .limit(m)
    // rank window runs over the m winners only (post-limit), never the corpus
    winners.withColumn("rank",
        row_number().over(Window.orderBy(col("race_key"), col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col("weight"), col("race_key"))
  }

  /** C102 — UniMax language allocation (Chung et al., "UniMax: Fairer
    * and More Effective Language Sampling", ICLR 2023): split a token
    * budget `B` across languages as UNIFORMLY as possible, but never
    * draw more than `maxEpochs` passes over any language's data — the
    * mixing policy that replaced temperature sampling (C44) for
    * massively-multilingual pretraining, because temperature still
    * over-epochs tail languages while UniMax caps them explicitly.
    *
    * The sequential water-fill ("give every remaining language an equal
    * share; languages whose full cap is below the share take the cap
    * and leave the rest to the pool") has a closed form over languages
    * sorted by cap = tokens·maxEpochs ascending: a language caps out
    * iff cap_i·(n−i+1) ≤ B − cum_{i−1}, the predicate is monotone (once
    * a language takes the fair share, all larger ones do too), so the
    * capped set is a prefix and every uncapped language gets
    * θ = (B − Σ_capped cap) / (n − k). All comparisons run in
    * DECIMAL(38,0) — exact at any corpus size, no Long-overflow edge in
    * cap·(n−i+1) — and θ is ONE ieee754 division of driver-independent
    * exact integers, so the result is bit-reproducible across engines.
    *
    * Scale shape: one groupBy(lang) token sum with map-side partials
    * (the aggregate is language-cardinality — dozens of rows), then
    * windows over a coalesce(1) single partition of that TINY table;
    * the corpus itself is scanned once and never shuffles beyond the
    * lang-keyed partial agg. Output per language: token count, cap,
    * capped flag, allocated tokens (display double `alloc` + exact
    * Long `alloc_exact` — downstream cuts join on the exact one),
    * epochs = alloc/tokens, and the sampling weight alloc/B a data
    * loader consumes. If B ≥ Σcap every language caps and Σweight <
    * 1 — the honest "corpus exhausted at maxEpochs" signal, not an
    * error. */
  def unimaxMix(df: DataFrame, langCol: String, tokCol: Column,
                budget: Long, maxEpochs: Int): DataFrame = {
    require(budget >= 0, s"unimaxMix: budget must be >= 0, got $budget")
    require(maxEpochs >= 1, s"unimaxMix: maxEpochs must be >= 1, got $maxEpochs")
    val dec = "decimal(38,0)"
    val perLang = df.groupBy(col(langCol).as("lang"))
      .agg(sum(tokCol.cast("long")).as("lang_tokens"))
      .withColumn("cap",
        (col("lang_tokens").cast(dec) * lit(maxEpochs)).cast(dec))
      .coalesce(1) // language-cardinality: global windows on <100 rows
    val ord = Window.orderBy(col("cap"), col("lang"))
    val all = Window.partitionBy(lit(0))
    val b = lit(budget).cast(dec)
    val staged = perLang
      .withColumn("_i", row_number().over(ord))
      .withColumn("_cum", sum(col("cap")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast(dec))
      .withColumn("_n", count(lit(1)).over(all))
      // capped iff taking the full cap beats the fair share of what is
      // left when this language's turn comes (prefix-monotone, so the
      // flag needs no recurrence)
      .withColumn("capped",
        col("cap") * (col("_n") - col("_i") + 1).cast(dec) <=
          b - (col("_cum") - col("cap")))
      .withColumn("_k", sum(col("capped").cast("long")).over(all))
      .withColumn("_cum_capped", coalesce(
        sum(when(col("capped"), col("cap"))).over(all).cast(dec),
        lit(0).cast(dec)))
    val theta = (b - col("_cum_capped")).cast("double") /
      (col("_n") - col("_k")).cast("double")
    staged
      .withColumn("alloc",
        round(when(col("capped"), col("cap").cast("double"))
          .otherwise(theta), 6))
      // exact integer allocation alongside the display double: the
      // residual B − Σ_capped cap is ≤ B (a Long) by the water-fill
      // invariant, so Long `div` is exact at any corpus size — the
      // double `alloc` loses exactness above 2^53 tokens and must
      // never drive a budget cut (C115 joins on THIS column)
      .withColumn("_resid", (b - col("_cum_capped")).cast("long"))
      .withColumn("_nuncap", (col("_n") - col("_k")).cast("long"))
      .withColumn("alloc_exact",
        when(col("capped"), col("cap").cast("long"))
          .otherwise(expr("_resid div _nuncap")))
      .withColumn("epochs",
        round(col("alloc") / col("lang_tokens").cast("double"), 6))
      .withColumn("weight",
        when(lit(budget) === 0L, lit(0.0))
          .otherwise(round(col("alloc") / lit(budget).cast("double"), 6)))
      .select(col("lang"), col("lang_tokens"), col("cap").cast("long").as("cap"),
        col("capped"), col("alloc"), col("alloc_exact"), col("epochs"),
        col("weight"))
  }

  /** C115 — apply a [[unimaxMix]] allocation: per language, select
    * documents by a seeded deterministic hash race until the
    * language's allocated token budget is spent — the step that turns
    * the C102 POLICY (tokens per language) into the concrete document
    * SET a data loader reads. Selection is take-while-fits (a doc is
    * kept iff it fits wholly under the budget, the [[budgetSelect]]
    * rule — under-fill is at most one document per language); capped
    * languages (alloc = full capacity) keep every document, and the
    * >1-epoch repetition the cap implies is the loader's job, not a
    * row-duplication here. Membership is seed-keyed and
    * partitioning-independent (the [[groupSample]] hash-race
    * discipline).
    *
    * Scale shape: ONE exchange keyed by language (the cumsum window);
    * the allocation table is language-cardinality and broadcasts. The
    * budget cut joins on [[unimaxMix]]'s exact Long `alloc_exact` (the
    * rounded display double loses exactness above 2^53 tokens), so the
    * cut is exact integer algebra at any corpus size. A single
    * language at 100 TB outgrows one window task — range-split the
    * language on the hash prefix first (the C104 stratum note). */
  def unimaxApply(df: DataFrame, langCol: String, idCol: String,
                  tokCol: Column, alloc: DataFrame, seed: Long): DataFrame = {
    val pri = Vec.md5Hash60(concat(col(idCol).cast("string"), lit("#" + seed)))
    val w = Window.partitionBy(col(langCol)).orderBy(pri, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = broadcast(alloc.select(col("lang").as(langCol),
      col("alloc_exact").cast("long").as("_budget")))
    df.select(col(langCol), col(idCol),
        coalesce(tokCol.cast("long"), lit(0L)).as("toks"))
      .withColumn("cum_tokens", sum(col("toks")).over(w))
      .join(budget, Seq(langCol))
      .filter(col("cum_tokens") <= col("_budget"))
      .select(col(langCol), col(idCol), col("toks"), col("cum_tokens"))
  }

  /** C120 — epoch repetition plan: turn a [[unimaxMix]] allocation into
    * the EXACT per-document repetition counts a data loader executes —
    * C115 selects the one-epoch document SET; this is the multi-epoch
    * generalization a capped language actually trains under (alloc >
    * corpus ⇒ some documents repeat). Each language's exact budget
    * splits as alloc_exact = full·lang_tokens + rem (Long div/mod):
    * every document repeats `full` times, and the documents in the
    * seeded hash-race prefix whose cumulative tokens fit `rem` (the
    * C85/C115 take-while-fits rule) repeat once more — so
    * Σ n_reps·toks ≤ alloc_exact with under-fill < one document per
    * language, all exact integer algebra. Membership is seed-keyed and
    * partitioning-independent; re-runs produce the identical plan
    * (loaders shard by it, so plan drift = silent data skew).
    *
    * Scale shape: ONE exchange keyed by language (the same cumsum
    * window as C115); the allocation table broadcasts at language
    * cardinality. Output: (lang, id, toks, cum_tokens, n_reps),
    * n_reps ≥ 0 (a language allocated less than one full pass keeps
    * only its fractional-prefix docs — n_reps 1 — and drops the rest
    * at 0, the honest subsample). */
  def epochPlan(df: DataFrame, langCol: String, idCol: String,
                tokCol: Column, alloc: DataFrame, seed: Long): DataFrame = {
    val pri = Vec.md5Hash60(concat(col(idCol).cast("string"), lit("#" + seed)))
    val w = Window.partitionBy(col(langCol)).orderBy(pri, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = broadcast(alloc.select(col("lang").as(langCol),
      col("alloc_exact").cast("long").as("_alloc"),
      col("lang_tokens").cast("long").as("_lt")))
    df.select(col(langCol), col(idCol),
        coalesce(tokCol.cast("long"), lit(0L)).as("toks"))
      .withColumn("cum_tokens", sum(col("toks")).over(w))
      .join(budget, Seq(langCol))
      // greatest(,1): a zero-token language has alloc_exact = 0 anyway
      .withColumn("_full", expr("_alloc div greatest(_lt, 1L)"))
      .withColumn("_rem", col("_alloc") - col("_full") * col("_lt"))
      .select(col(langCol), col(idCol), col("toks"), col("cum_tokens"),
        (col("_full") +
          when(col("cum_tokens") <= col("_rem"), 1L).otherwise(0L)).as("n_reps"))
  }

  /** C104 — EXACT-count stratified split: within every stratum, order
    * rows by a seeded engine-portable hash of the id and send the first
    * ⌊n·testFrac⌋ to `test`, the rest to `train` — the eval-set
    * constructor. [[hashSplit]] (C20) gives proportions only in
    * expectation (each row flips an independent 100-sided coin), which
    * at stratum sizes of hundreds leaves ±10 % wobble — unacceptable
    * when the contract is "exactly 10 % of EVERY (lang, source) cell is
    * held out". Membership is deterministic and seed-keyed: re-runs
    * agree bit-for-bit, a new seed redraws.
    *
    * Scale shape: ONE shuffle keyed by the strata (the row_number and
    * count windows share the same partitioning, so Catalyst plans a
    * single exchange); no global ordering exists anywhere. Strata are
    * quasi-identifier-sized groups — if one stratum is a scale hazard
    * (billions of rows in one cell) the window sort within it pages
    * through one task; split such a cell on a salt of the id first.
    * ⌊n·testFrac⌋ carries the house epsilon guard: n·frac in binary
    * can land 1 ulp under an exact integer and silently shrink the
    * test cell by one row vs the oracle's algebra. */
  def stratifiedSplit(df: DataFrame, strataCols: Seq[String], idCol: String,
                      testFrac: Double, seed: Long): DataFrame = {
    require(testFrac >= 0.0 && testFrac <= 1.0,
      s"stratifiedSplit: testFrac must be in [0,1], got $testFrac")
    val strata = strataCols.map(col)
    val pri = Vec.md5Hash60(concat(col(idCol).cast("string"), lit("#" + seed)))
    val w = Window.partitionBy(strata: _*).orderBy(pri, col(idCol))
    val cnt = Window.partitionBy(strata: _*)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(cnt))
      .withColumn("split",
        when(col("_rn") <=
          floor(col("_n").cast("double") * testFrac + 1e-9), lit("test"))
          .otherwise(lit("train")))
      .drop("_rn", "_n")
  }

  /** C108 — curriculum ordering: assign every document to one of
    * `nStages` difficulty stages (stage 1 = easiest nth of the corpus,
    * by (difficulty, id) global rank) and give it a deterministic
    * shuffled position WITHIN its stage — the read order a
    * curriculum-learning trainer consumes (easy→hard across stages,
    * unbiased within each stage; Bengio et al., ICML 2009).
    *
    * Stage boundaries are exact even-spread quantile slices — stage
    * assignment is ⌊(rank−1)·k / n⌋ + 1, so stage s covers global
    * ranks [⌈(s−1)·n/k⌉+1, ⌈s·n/k⌉] and remainder rows spread EVENLY
    * across stages (unlike SQL NTILE's front-loading; sizes differ by
    * at most one either way, and the oracle mirrors this exact
    * formula) — computed WITHOUT a global window: the global
    * difficulty rank comes from the two-phase range-partitioned
    * cumsum ([[budgetSelect]]'s machinery with toks = 1). The
    * within-stage position reuses the same machinery ordered by
    * (stage, shuffle-hash, id) and subtracts the stage's start offset
    * ⌈(s−1)·n/k⌉ — again pure integer algebra on driver-known n, k.
    * Two range shuffles total; no task ever sees more than its range
    * slice, at any corpus size.
    *
    * PRECONDITION: `idCol` unique (shared with [[shardBalance]] — the
    * cumsum's tie order is the id). Output:
    * (id, difficulty, stage, stage_order), stage 1..k. */
  def curriculumOrder(df: DataFrame, idCol: String, difficultyCol: Column,
                      nStages: Int, seed: Long,
                      partitions: Int = 0): DataFrame = {
    require(nStages >= 1, s"curriculumOrder: nStages must be >= 1, got $nStages")
    val scored = df.select(col(idCol),
      coalesce(difficultyCol.cast("long"), lit(0L)).as("difficulty"),
      lit(1L).as("toks"))
    cumsumByRange(scored, Seq(col("difficulty"), col(idCol)), partitions) match {
      case None => scored.select(col(idCol), col("difficulty"))
        .withColumn("stage", lit(0L)).withColumn("stage_order", lit(0L))
        .limit(0)
      case Some((ranked, n)) =>
        val k = nStages.toLong
        val staged = ranked
          .withColumn("stage", expr(s"((cum - 1) * ${k}L) div ${n}L") + 1L)
          .select(col(idCol), col("difficulty"), col("stage"),
            Vec.md5Hash60(concat(col(idCol).cast("string"),
              lit("#" + seed))).as("_shuf"),
            lit(1L).as("toks"))
        // stage s (1-based) starts after ⌈(s-1)·n/k⌉ rows — the exact
        // prefix of the even-spread slices ⌊(rank−1)·k/n⌋ produces
        // (NOT NTILE's (s-1)·⌊n/k⌋ + min(s-1, n mod k): that
        // front-loads remainders and drifts from these slices whenever
        // n mod k ≥ 2 — the r13 property test caught exactly this)
        cumsumByRange(staged,
          Seq(col("stage"), col("_shuf"), col(idCol)), partitions) match {
          case None => staged.select(col(idCol), col("difficulty"),
            col("stage")).withColumn("stage_order", lit(0L)).limit(0)
          case Some((pos, _)) =>
            pos.withColumn("stage_order",
                col("cum") - expr(s"((stage - 1L) * ${n}L + ${k - 1}L) div ${k}L"))
              .select(col(idCol), col("difficulty"), col("stage"),
                col("stage_order"))
        }
    }
  }
}
