package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Text, Vec}

/** Exact set-similarity joins via prefix filtering (the
  * AllPairs/PPJoin family; distributed formulation after Vernica,
  * Carey & Li, SIGMOD 2010).
  *
  * Complements the sketch-based near-dup family: MinHash-LSH (C2)
  * trades recall for cost, while these operators return EVERY pair at
  * Jaccard >= t, exactly — the verification tool you run over a
  * candidate slice, or the primary join when the threshold is high
  * enough that prefixes prune hard.
  *
  * Why it scales: order every document's distinct shingle-hash set by
  * global rarity (document frequency asc, hash asc). A pair at
  * Jaccard >= t must share an element inside each side's first
  * `s - ceil(t*s) + 1` elements under ANY shared total order (the
  * prefix-filtering lemma), so only PREFIX tokens are exploded into
  * the candidate join — rare tokens almost everywhere, so posting
  * lists stay short and the quadratic blowup concentrates exactly
  * where real near-dups are. Two further exact prunes run inside the
  * join before any pair materializes:
  *
  *  - length filter: J(A,B) >= t forces min(|A|,|B|) >= t*max(|A|,|B|);
  *  - positional filter (PPJoin): a token at 1-based rarity positions
  *    (pa, pb) bounds the remaining overlap by 1 + min(sa-pa, sb-pb),
  *    which must reach ceil(t/(1+t) * (sa+sb)) — this is what kills
  *    candidates that share only a HOT token late in their prefixes.
  *
  * Shuffle economics at 100 TB: shingles ride as md5-60 longs (8-byte
  * keys, engine-portable so the DuckDB oracle reproduces them; swap in
  * xxhash64 for production), the df count and the candidate join both
  * hash-partition on the token hash, and verification joins full sets
  * back by doc id — pair-local array intersection, never a global
  * cross product. Every stage is a plain shuffle-on-key aggregate or
  * join that AQE can re-plan; nothing is driver-side.
  */
object SetSim {

  /** distinct hashed shingle set per doc; order inside the array is
    * irrelevant (every consumer is order-free) */
  private def hashedSets(docs: DataFrame, idCol: String, textCol: String,
                         shingleN: Int, tokenHash: Column => Column): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        array_distinct(transform(Text.shingles(col(textCol), shingleN), tokenHash))
          .as("hset"))
      .filter(size(col("hset")) > 0)

  /** per-doc token array in the shared total order (df asc, hash
    * asc). Tokens absent from `dfCounts` order FIRST (df 0 —
    * "rarest"): for the R-S form the index side's frequencies are the
    * shared dictionary and a probe-only token is by definition rare
    * there. Returns (doc_id, otoks, s). */
  private def orderedTokens(sets: DataFrame, dfCounts: DataFrame): DataFrame = {
    val ex = sets.select(col("doc_id"), explode(col("hset")).as("h"))
    ex.join(dfCounts, Seq("h"), "left")
      .select(col("doc_id"), col("h"), coalesce(col("df"), lit(0L)).as("df"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"))
      .select(col("doc_id"),
        transform(col("ord"), e => e.getField("h")).as("otoks"),
        size(col("ord")).cast("long").as("s"))
  }

  /** the first `prefixLen(s)` ordered tokens exploded with 1-based
    * positions — the probing prefix of the filtering lemma */
  private def prefixExploded(sets: DataFrame, dfCounts: DataFrame,
                             prefixLen: Column => Column): DataFrame =
    orderedTokens(sets, dfCounts)
      .select(col("doc_id"), col("s"),
        posexplode(slice(col("otoks"), lit(1), prefixLen(col("s")).cast("int")))
          .as(Seq("pos0", "h")))
      .select(col("doc_id"), col("s"),
        (col("pos0") + 1).cast("long").as("pos"), col("h"))

  /** ceil with an epsilon guard — every overlap requirement α in this
    * family is mathematically ceil(t·s) over EXACT rationals, but t·s
    * computes in binary doubles: a threshold whose product lands 1 ulp
    * ABOVE an exact integer (e.g. a t encoding slightly high) would
    * inflate α by 1 and turn a lossless prune into a completeness
    * hole the round-6 verify can't repair. Subtracting 1e-9 (≫ the
    * ~1e-11 worst-case product error at corpus-scale s, ≪ the 1/s gap
    * to the next rational) restores the exact-arithmetic value; an
    * error in the OTHER direction only weakens the prune — safe, the
    * verify step discards the extra candidates. The oracle SQL mirrors
    * the same guard so both engines prune identically. */
  private def ceilEps(x: Column): Column = ceil(x - lit(1e-9))

  /** a set needing overlap >= ceil(t*s) can miss at most
    * s - ceil(t*s) tokens, so its first s - ceil(t*s) + 1 ordered
    * tokens must contain a shared one (the prefix-filtering lemma) —
    * the formula BOTH the Jaccard and the containment probe sides use */
  private def lemmaPrefix(threshold: Double)(s: Column): Column =
    s - ceilEps(s.cast("double") * threshold).cast("long") + 1

  /** candidate pairs from two prefix tables: shared prefix token, then
    * the two exact prunes. The positional filter is valid for a pair's
    * EARLIEST shared token; later shared tokens only shrink the bound,
    * so keeping a pair if ANY of its shared-token rows passes is a
    * safe superset. `pairPred` restricts the pairing (id_a < id_b for
    * the self-join; everything for R-S). */
  private def candidates(lhsPrefix: DataFrame, rhsPrefix: DataFrame,
                         threshold: Double, pairPred: Column): DataFrame = {
    val ratio = threshold / (1.0 + threshold)
    val lhs = lhsPrefix.select(col("doc_id").as("id_a"), col("s").as("s_a"),
      col("pos").as("p_a"), col("h"))
    val rhs = rhsPrefix.select(col("doc_id").as("id_b"), col("s").as("s_b"),
      col("pos").as("p_b"), col("h"))
    lhs.join(rhs, "h")
      .filter(pairPred)
      .filter(least(col("s_a"), col("s_b")).cast("double") >=
        greatest(col("s_a"), col("s_b")).cast("double") * threshold)
      .filter((lit(1L) + least(col("s_a") - col("p_a"), col("s_b") - col("p_b")))
        .cast("double") >= ceilEps((col("s_a") + col("s_b")).cast("double") * ratio))
      .select("id_a", "id_b")
      .distinct()
  }

  /** verify candidates with exact Jaccard over the full hashed sets —
    * pair-local array intersection */
  private def verified(cands: DataFrame, setsA: DataFrame, setsB: DataFrame,
                       threshold: Double): DataFrame = {
    val a = setsA.select(col("doc_id").as("id_a"), col("hset").as("set_a"),
      size(col("hset")).cast("long").as("sz_a"))
    val b = setsB.select(col("doc_id").as("id_b"), col("hset").as("set_b"),
      size(col("hset")).cast("long").as("sz_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("overlap", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("union_size", col("sz_a") + col("sz_b") - col("overlap"))
      .withColumn("jaccard", round(col("overlap").cast("double") / col("union_size"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "overlap", "union_size", "jaccard")
  }

  /** All pairs (id_a < id_b) with exact Jaccard(shingleSets) >= t.
    * Output: (id_a, id_b, overlap, union_size, jaccard round-6),
    * one row per qualifying pair.
    *
    * @param threshold  Jaccard threshold in (0, 1); higher prunes harder
    * @param shingleN   word-shingle width for the set elements
    * @param tokenHash  string->int64 column hash (default md5-60 for
    *                   oracle parity; production: xxhash64)
    */
  def prefixJaccardJoin(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleN: Int = 3,
                        tokenHash: Column => Column = Vec.md5Hash60): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0,
      s"prefixJaccardJoin: threshold must be in (0,1), got $threshold")
    // sets feeds four subtrees (df count, the prefix ordering, both
    // verify sides) and is a map-only subtree Spark has no exchange to
    // reuse — without the persist the corpus re-tokenizes/re-hashes
    // per consumer; prefix likewise feeds both candidate-join sides
    val sets = graft.util.CacheRegistry.register(
      hashedSets(docs, idCol, textCol, shingleN, tokenHash).persist())
    val ex = sets.select(col("doc_id"), explode(col("hset")).as("h"))
    val dfCounts = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val prefix = graft.util.CacheRegistry.register(
      prefixExploded(sets, dfCounts, lemmaPrefix(threshold)).persist())
    val cands = candidates(prefix, prefix, threshold, col("id_a") < col("id_b"))
    verified(cands, sets, sets, threshold)
  }

  /** The R-S (probe-vs-index) form — the INCREMENTAL shape: today's
    * batch against the landed corpus, pairs (probe id_a, index id_b)
    * only, never probe×probe or index×index. The shared total order
    * is the INDEX side's token frequencies (the stable dictionary a
    * landed corpus maintains anyway); probe-only tokens order first
    * as df-0 — rare by definition there, which is exactly where the
    * prefix filter wants them. At 100 TB this is the join you run
    * per ingest batch: cost scales with the DELTA's candidates, and
    * the index-side prefix table is computed once per dictionary
    * version, not per batch. */
  def prefixJaccardJoinRS(probe: DataFrame, index: DataFrame,
                          idCol: String, textCol: String,
                          threshold: Double, shingleN: Int = 3,
                          tokenHash: Column => Column = Vec.md5Hash60): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0,
      s"prefixJaccardJoinRS: threshold must be in (0,1), got $threshold")
    // each side's hashed sets feed 2-3 subtrees (df / prefix / verify)
    val probeSets = graft.util.CacheRegistry.register(
      hashedSets(probe, idCol, textCol, shingleN, tokenHash).persist())
    val indexSets = graft.util.CacheRegistry.register(
      hashedSets(index, idCol, textCol, shingleN, tokenHash).persist())
    val dfCounts = indexSets.select(col("doc_id"), explode(col("hset")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
    val probePrefix = prefixExploded(probeSets, dfCounts, lemmaPrefix(threshold))
    val indexPrefix = prefixExploded(indexSets, dfCounts, lemmaPrefix(threshold))
    val cands = candidates(probePrefix, indexPrefix, threshold, lit(true))
    verified(cands, probeSets, indexSets, threshold)
  }

  /** All ORDERED pairs (id_a, id_b), id_a ≠ id_b, with containment
    * |A∩B| / |A| >= t — the ASYMMETRIC complement of
    * [[prefixJaccardJoin]]: a short doc quoted whole inside a 10×
    * longer one has Jaccard ~0.1 (invisible to every symmetric dedup
    * in the library) but containment 1.0, and subset duplication —
    * quote expansions, page-of-pages aggregators, shingled excerpts —
    * is exactly what this join surfaces.
    *
    * Filtering math (overlap requirement α = ceil(t·|A|), which
    * depends only on the CONTAINED side): A probes with the standard
    * lemma prefix |A| − α + 1; B cannot be prefix-pruned (the shared
    * token pigeonholed into A's prefix can sit ANYWHERE in B), so the
    * B side explodes in full — the same (token, doc) table the df
    * count already shuffles, joined only against A's RARE prefix
    * tokens, so posting lists stay short where it matters. Exact
    * prunes inside the join: |B| >= α (length), and the positional
    * bound 1 + min(|A|−p_a, |B|−p_b) >= α for the earliest shared
    * token (any-row-passes is a safe superset). Survivors verify with
    * pair-local exact intersection.
    *
    * Output: (id_a, id_b, overlap, sz_a, sz_b, containment round-6),
    * one row per ordered qualifying pair (an exact dup qualifies in
    * both directions). threshold may be 1.0: exact subset — the
    * probing prefix degenerates to the single rarest token. */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, shingleN: Int = 3,
                      tokenHash: Column => Column = Vec.md5Hash60): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containmentJoin: threshold must be in (0,1], got $threshold")
    val sets = graft.util.CacheRegistry.register(
      hashedSets(docs, idCol, textCol, shingleN, tokenHash).persist())
    val ex = sets.select(col("doc_id"), explode(col("hset")).as("h"))
    val dfCounts = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val lhs = prefixExploded(sets, dfCounts, lemmaPrefix(threshold))
      .select(col("doc_id").as("id_a"), col("s").as("s_a"),
        col("pos").as("p_a"), col("h"))
    val rhs = prefixExploded(sets, dfCounts, s => s) // full: no B-side prefix
      .select(col("doc_id").as("id_b"), col("s").as("s_b"),
        col("pos").as("p_b"), col("h"))
    val need = ceilEps(col("s_a").cast("double") * threshold)
    val cands = lhs.join(rhs, "h")
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("s_b").cast("double") >= need)
      .filter((lit(1L) + least(col("s_a") - col("p_a"), col("s_b") - col("p_b")))
        .cast("double") >= need)
      .select("id_a", "id_b")
      .distinct()
    val a = sets.select(col("doc_id").as("id_a"), col("hset").as("set_a"),
      size(col("hset")).cast("long").as("sz_a"))
    val b = sets.select(col("doc_id").as("id_b"), col("hset").as("set_b"),
      size(col("hset")).cast("long").as("sz_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("overlap",
        size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("containment",
        round(col("overlap").cast("double") / col("sz_a").cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "overlap", "sz_a", "sz_b", "containment")
  }
}
