package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Text, Vec}

/** Corpus-curation scoring operators (SURVEY §2C): DSIR importance
  * weights and winnowing fingerprints. Both follow the lm_score
  * determinism discipline — per-feature terms round to 6 places and
  * accumulate in decimal, so partial-aggregation order can never shift
  * a score and results hash-match the DuckDB oracle bit-for-bit.
  */
object Curation {

  /** C71 — corpus version diff: per document id, how version 2 of a
    * corpus differs from version 1 (`added` / `removed` / `changed` /
    * `unchanged`) — the release-audit step behind every dated corpus
    * snapshot ("what moved between v2024-10 and v2024-12?"), and the
    * input a change-gated republish ([[graft.io.WrappedJsonDataSource]]'s
    * publishIfChanged) generalizes from.
    *
    * Scale shape: each side reduces to (id, 128-bit content hash)
    * BEFORE the join — the shuffle carries 24-byte rows, never text —
    * then one full-outer join on the id resolves all four states. At
    * 100 TB write both versions bucketed by id and the join is
    * co-located (io/Bucketing); the diff is then a zero-shuffle
    * zip of bucket pairs. */
  def corpusDiff(v1: DataFrame, v2: DataFrame,
                 idCol: String, textCol: String): DataFrame =
    v1.select(col(idCol), md5(col(textCol)).as("_h1"))
      .join(v2.select(col(idCol), md5(col(textCol)).as("_h2")),
        Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_h1").isNull, "added")
          .when(col("_h2").isNull, "removed")
          .when(col("_h1") === col("_h2"), "unchanged")
          .otherwise("changed").as("status"))

  /** The 100 TB form of [[corpusDiff]]: both versions land as
    * (id, content-hash) tables BUCKETED on the id (io.Bucketing — the
    * B16 discipline), so the full-outer join is bucket-to-bucket with
    * ZERO exchanges: corpus versions are exactly the recurring-join
    * case bucketing exists for (every release diffs against the
    * last), and the hash projection means the landed tables are
    * 24-byte rows, not corpora. `tablePrefix` must be run-unique
    * (Fixtures.tableName). BucketingSpec-proven shuffle-free. */
  def corpusDiffBucketed(v1: DataFrame, v2: DataFrame,
                         idCol: String, textCol: String,
                         tablePrefix: String, numBuckets: Int = 8): DataFrame = {
    val spark = v1.sparkSession
    def land(df: DataFrame, side: String, hCol: String): DataFrame = {
      val name = s"${tablePrefix}_$side"
      graft.io.Bucketing.writeBucketed(
        df.select(col(idCol), md5(col(textCol)).as(hCol)),
        name, bucketCols = Seq(idCol), numBuckets = numBuckets,
        sortCols = Seq(idCol))
      spark.table(name)
    }
    land(v1, "v1", "_h1")
      .join(land(v2, "v2", "_h2"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_h1").isNull, "added")
          .when(col("_h2").isNull, "removed")
          .when(col("_h1") === col("_h2"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** [[corpusDiff]] rolled up to the release-note summary (one row per
    * status, map-side combinable). */
  def corpusDiffSummary(v1: DataFrame, v2: DataFrame,
                        idCol: String, textCol: String): DataFrame =
    corpusDiff(v1, v2, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** DSIR importance weight (C41) — Data Selection via Importance
    * Resampling (Xie et al. 2023, arXiv:2302.03169): score every raw
    * document by how much more likely its hashed-feature bag is under
    * the TARGET distribution than under the RAW distribution,
    * log w(x) = Σ_f log( p_target(f) / p_raw(f) ),
    * with hashed unigram features (md5-60 mod `buckets` — the paper's
    * hashed n-grams; swap the token expr for bigrams) and add-0.5
    * smoothing over the bucket space on both sides. Selecting the
    * top-weighted documents (or hash-resampling ∝ w) tilts the corpus
    * toward the target domain.
    *
    * Scale shape: ONE corpus tokenize pass reduces to the per-(doc,
    * bucket) tf table — the only corpus-scale shuffle; bucket counts
    * for both distributions reduce from it in the SAME aggregate (no
    * second pass over the target side); the λ table is `buckets` rows
    * — dimension-scale, broadcast — so scoring is a map-side-combinable
    * per-doc sum. `isTarget` marks the in-domain rows (a boolean
    * Column over the doc's columns), so target membership never joins.
    *
    * Returns (doc_id, n_tokens, dsir_logweight, selected) with
    * `selected` = logweight at or above the corpus's `selectQ`
    * interpolated quantile — the deterministic stand-in for the
    * paper's importance resampling: the kept fraction is exactly
    * 1 − selectQ. The threshold reduces to ONE broadcast row
    * ([[graft.functions.Agg.interpolatedPercentiles]], the
    * outlier_bounds_filter discipline), so selection adds no
    * corpus-scale shuffle; at 100 TB swap in approx_percentile for
    * the exact order statistic, same plan shape. */
  /** C78 — CCNet perplexity bucketing (Wenzek et al. 2020 §4.3, the
    * head/middle/tail split behind CCNet and most LLaMA-era web
    * corpora): within each LANGUAGE, split documents at the 1/3 and
    * 2/3 perplexity quantiles — `head` (cleanest third, lowest
    * perplexity under the reference LM), `middle`, `tail` (usually
    * dropped). Per-language bars, never global: perplexity scales are
    * not comparable across languages, which is the paper's own reason
    * for bucketing per language.
    *
    * Scale shape: the input is the already-scored (id, lang, ppl)
    * table; bars reduce to one row PER LANGUAGE
    * ([[graft.functions.Agg.interpolatedPercentiles]] — exact order
    * statistics, sorting within language partitions, the C54
    * discipline) and broadcast into a map-side bucket assignment — the
    * corpus never shuffles. A single language at 100 TB outgrows an
    * exact sort; approx_percentile (B18) swaps in with the same plan
    * shape, the documented escape hatch.
    *
    * Bucket edges use `<=` (a doc exactly on a bar stays in the lower
    * bucket) so ties resolve identically in both engines on the
    * engine-bit-exact interpolated bars. */
  def perplexityBuckets(scored: DataFrame, idCol: String, langCol: String,
                        pplCol: String): DataFrame = {
    val bars = graft.functions.Agg.interpolatedPercentiles(
      scored.select(col(langCol), col(pplCol)), langCol, pplCol,
      Seq("b_head" -> (1.0 / 3), "b_middle" -> (2.0 / 3)))
    scored.join(broadcast(bars), Seq(langCol))
      .select(col(idCol), col(langCol), col(pplCol),
        when(col(pplCol) <= col("b_head"), "head")
          .when(col(pplCol) <= col("b_middle"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** C80 — distribution drift between two corpus versions: the
    * Population Stability Index over fixed score buckets, the drift
    * gate a release pipeline runs NEXT TO the id-level diff (C71 says
    * WHICH docs moved; this says whether the corpus's score
    * DISTRIBUTION moved — a release can change zero ids and still
    * shift quality mass, or change half its ids and stay
    * distributionally identical).
    *
    *   psi_b = (p_b − q_b) · ln(p_b / q_b),  summed over buckets
    *
    * with Laplace-smoothed proportions p = (n+1)/(N+B) so an empty
    * bucket contributes a finite, deterministic term instead of ±∞
    * (the standard PSI smoothing). Fixed caller-supplied edges, not
    * version-derived quantiles: the bucketing must not itself drift
    * between releases, or the gate measures its own edges.
    *
    * Scale shape: each version reduces map-side to a B-row bucket
    * histogram (one pass, map-side combine, B ≈ tens); the spine
    * join, totals and PSI algebra are all bucket-scale. Nothing
    * corpus-sized survives the first aggregation.
    *
    * Output: one row per bucket (bucket, n_v1, n_v2, psi) — the
    * summary Σpsi is the sum of the psi column (rounded terms, so the
    * sum is reproducible in any engine). */
  def distributionDrift(v1: DataFrame, v2: DataFrame, valueCol: String,
                        edges: Seq[Double]): DataFrame =
    driftFromHistograms(
      driftHistogram(v1, valueCol, edges),
      driftHistogram(v2, valueCol, edges), edges.size + 1)

  /** the map-side half: fixed-edge bucket assignment + a B-row count
    * histogram. Stateless per row, so it runs unchanged as a STREAMING
    * aggregation (D11 maintains it as data arrives — state is B
    * counters). */
  def driftHistogram(v: DataFrame, valueCol: String,
                     edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty, "driftHistogram: need at least one edge")
    require(edges == edges.sorted && edges.distinct == edges,
      s"driftHistogram: edges must be strictly increasing: $edges")
    val bucketOf =
      edges.map(e => when(col(valueCol) >= lit(e), 1).otherwise(0))
        .reduce(_ + _).cast("long").as("bucket")
    v.select(bucketOf).groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** the bucket-scale half: spine + totals + the Laplace-smoothed PSI
    * terms, over two (bucket, n) histograms. */
  def driftFromHistograms(h1: DataFrame, h2: DataFrame,
                          nBuckets: Int): DataFrame = {
    val spine = h1.sparkSession.range(0, nBuckets)
      .select(col("id").as("bucket"))
    val j = spine
      .join(h1.withColumnRenamed("n", "n_v1"), Seq("bucket"), "left")
      .join(h2.withColumnRenamed("n", "n_v2"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_v1", "n_v2"))
    val totals = j.agg(sum(col("n_v1")).as("_t1"), sum(col("n_v2")).as("_t2"))
    val p = (col("n_v1") + lit(1.0)) / (col("_t1") + lit(nBuckets.toDouble))
    val q = (col("n_v2") + lit(1.0)) / (col("_t2") + lit(nBuckets.toDouble))
    j.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_v1"), col("n_v2"),
        round((p - q) * log(p / q), 6).as("psi"))
  }

  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
                isTarget: Column, buckets: Int = 1024,
                selectQ: Double = 0.8): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = docs.select(col(idCol), isTarget.as("_t"),
        explode(Text.wsTokens(col(textCol))).as("_tok"))
      .select(col(idCol), col("_t"),
        pmod(Vec.md5Hash60(col("_tok")), lit(buckets.toLong)).as("_b"))
    val tf = toks.groupBy(col(idCol), col("_t"), col("_b"))
      .agg(count(lit(1)).as("_tf"))
    val counts = tf.groupBy(col("_b")).agg(
      sum(when(col("_t"), col("_tf")).otherwise(0L)).as("_ct"),
      sum(col("_tf")).as("_cr"))
    val totals = counts.agg(sum(col("_ct")).as("_tt"), sum(col("_cr")).as("_tr"))
    // λ_b = ln(p_target(b) / p_raw(b)), both add-0.5 smoothed over the
    // full bucket space; rounded to 6 and held in decimal so the
    // per-doc sum is order-free. Division order matters for bit parity
    // — the oracle writes the identical expression.
    val half = lit(0.5)
    val halfB = lit(0.5 * buckets)
    val lam = counts.crossJoin(broadcast(totals))
      .select(col("_b"),
        round(log(((col("_ct") + half) / (col("_tt") + halfB)) /
                  ((col("_cr") + half) / (col("_tr") + halfB))), 6)
          .cast("decimal(27,6)").as("_lam"))
    // scored feeds BOTH the threshold reduction and the output join;
    // no persist on purpose: the two consumers share the aggregation
    // subtree and Spark's ReusedExchange serves the second from the
    // first's shuffle files (measured faster than a persist here)
    val scored = tf.join(broadcast(lam), "_b")
      .groupBy(col(idCol))
      .agg(sum(col("_tf")).as("n_tokens"),
        sum(col("_lam") * col("_tf")).cast("double").as("dsir_logweight"))
    val thr = graft.functions.Agg.interpolatedPercentiles(
      scored.select(lit(1).as("_g"), col("dsir_logweight")),
      "_g", "dsir_logweight", Seq("_sel_thr" -> selectQ)).drop("_g")
    scored.crossJoin(broadcast(thr))
      .withColumn("selected", col("dsir_logweight") >= col("_sel_thr"))
      .drop("_sel_thr")
  }

  /** Positions fit in this many bits of the winnowing packed key; the
    * 40-bit hash uses the rest of the long. */
  private val PosBits = 23
  private val PosCap = 1L << PosBits

  /** Winnowing document fingerprints (C42) — Schleimer, Wilkerson &
    * Aiken, SIGMOD'03 (the MOSS algorithm): hash every `k`-token gram
    * positionally, slide a window of `w` consecutive gram hashes, and
    * in each window select the RIGHTMOST minimal hash; the distinct
    * selected (pos, hash) set is the document's fingerprint. The
    * guarantee: any shared run of at least w + k - 1 tokens between
    * two documents shares at least one fingerprint — so fingerprint
    * intersection detects overlap at ~1/w the storage of C30's
    * every-window set, with C11's single rolling hash as the
    * degenerate w = ∞ case.
    *
    * The rightmost-min rule is encoded ARITHMETICALLY: each gram's
    * comparable key is hash40 · 2^23 + (2^23 − 1 − pos), so a plain
    * integer MIN over the window frame is simultaneously the minimal
    * hash and, among equal hashes, the maximal position — no struct
    * ordering, identical semantics in any engine. Costs: docs cap at
    * 2^23 grams (8.4M tokens — far beyond any training document; the
    * operator fails loudly past it) and the hash narrows to 40 bits
    * (md5 prefix), which only makes fingerprints slightly denser on
    * collision — winnowing is sampling, not identity.
    *
    * Scale shape: ONE shuffle on hash(doc) carrying (doc, pos, token)
    * rows; grams assemble AFTER it via `lead(tok, j)` over the per-doc
    * ordered window, so the md5 runs in a codegen'd projection between
    * the two WindowExecs (same partitioning + ordering — the lead pass
    * and the min pass share one exchange and one sort). The original
    * map-side formulation (per-gram `slice`+`concat_ws`+`md5` inside a
    * `transform` lambda) evaluates INTERPRETED — Spark doesn't codegen
    * higher-order functions — and stage-split measurement at sf0.1 put
    * it at 0.81 s of the row's 1.04 s wall (78%); the lead form hashes
    * the same gram strings codegen'd at ~⅓ that cost. The shuffle
    * carries ~8-byte tokens instead of 8-byte gram hashes — same order
    * of bytes, gram count ≈ token count either way. Distinct is
    * per-doc and map-side combinable. Docs shorter than k + w − 1
    * tokens have no full window and emit nothing (documented MOSS
    * behavior — whole-doc matching below that is C1's job). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    val toks = docs
      .select(col(idCol), Text.wsTokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= k)
      .select(col(idCol), posexplode(col("_toks")).as(Seq("_pos", "_tok")))
    // gram at p = tok_p .. tok_{p+k-1}; lead(k-1) is null past the last
    // full gram, which is exactly the "positions 0..n-k" bound
    val gramParts = (0 until k).map(j =>
      if (j == 0) col("_tok") else lead(col("_tok"), j).over(byDoc))
    val grams = toks
      .withColumn("_gram", concat_ws(" ", gramParts: _*))
      .withColumn("_last", if (k == 1) col("_tok") else
        lead(col("_tok"), k - 1).over(byDoc))
      .filter(col("_last").isNotNull)
      .withColumn("_h40",
        call_function("graft_md5_prefix", col("_gram"), lit(10)))
    val guarded = grams.select(col(idCol), col("_pos"),
      when(col("_pos") < PosCap,
        col("_h40") * PosCap + (lit(PosCap - 1) - col("_pos")))
        .otherwise(raise_error(lit(
          s"winnowFingerprints: document exceeds 2^$PosBits grams")))
        .as("_key"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
      .rowsBetween(-(w - 1), 0)
    guarded
      .withColumn("_mkey", min(col("_key")).over(win))
      .filter(col("_pos") >= w - 1) // full windows only
      .select(col(idCol),
        (lit(PosCap - 1) - pmod(col("_mkey"), lit(PosCap))).as("pos"),
        // integer div — a double-path `/` would corrupt the 63-bit key
        // (53-bit mantissa)
        expr(s"_mkey div ${PosCap}L").as("hash"))
      .distinct()
  }

  /** Tell-tale byte sequences of encoding damage, each a literal string
    * (NOT a regex): UTF-8 text decoded as Latin-1/cp1252 and re-encoded
    * ("mojibake") leaves `Ã`+diacritic pairs for Latin letters and
    * `â€`-prefixed triples for punctuation; U+FFFD is a decoder's
    * explicit "byte salad" marker. Literal substring counting is
    * deliberately regex-free — Java regex works on UTF-16, RE2 engines
    * on UTF-8 bytes, and a character-class over multibyte chars is
    * where cross-engine counts drift; `replace` + length delta counts
    * identically everywhere. */
  val MojibakePatterns: Seq[String] = Seq(
    "Ã©", // Ã© — é through a Latin-1 round trip
    "Ã¯", // Ã¯ — ï
    "Ã¼", // Ã¼ — ü
    "Ã¤", // Ã¤ — ä
    "â€", // â€ — prefix of every double-encoded curly quote/dash
    "�")       // U+FFFD replacement char — a decoder gave up

  /** Deterministic mojibake plant for the C105 demo/oracle: docs with
    * id % 13 == 0 get a double-encoded suffix, id % 29 == 0 a U+FFFD —
    * the synthetic corpus is clean ASCII, so the demo must seed the
    * damage it detects. Shared with OracleGen so the two sides can
    * never drift. */
  val MojibakePlant13: String =
    " cafÃ© â€” naÃ¯ve"
  val MojibakePlant29: String = " bad�scan"

  /** C105 — encoding-damage (mojibake) score: per document, how many
    * tell-tale double-encoding sequences it contains, normalized by
    * length — the filter that catches the crawl segments whose
    * Content-Type header lied before they poison a tokenizer's
    * character distribution (a corpus with 0.1 % mojibake docs trains a
    * vocab with `Ã©` merges). Patterns are counted by
    * length-delta-after-replace: exact, codegen'd, engine-portable.
    *
    * Scale shape: map-only — a handful of `replace`+`length` column
    * expressions inside one whole-stage-codegen projection; nothing
    * shuffles, the filter pushes to the scan consumer. Score is one
    * IEEE division of exact ints (hits / chars), deterministic across
    * engines. Output: (id, n_chars, hits, mojibake_score, flagged).
    */
  def mojibakeScore(df: DataFrame, idCol: String, textCol: String,
                    patterns: Seq[String] = MojibakePatterns,
                    keepCols: Seq[String] = Nil): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "mojibakeScore: patterns must be non-empty strings")
    val t = col(textCol)
    val hits = patterns.map { p =>
      // occurrences of p = (len(text) − len(text with p removed)) / len(p);
      // string_replace is LITERAL (no regex), division exact by construction
      ((length(t) - length(call_function("replace", t, lit(p), lit(""))))
        / lit(p.length)).cast("long")
    }.reduce(_ + _)
    df.select(col(idCol) +: keepCols.map(col) :+
        length(t).cast("long").as("n_chars") :+ hits.as("hits"): _*)
      .withColumn("mojibake_score",
        round(col("hits").cast("double") /
          greatest(col("n_chars"), lit(1L)).cast("double"), 6))
      .withColumn("flagged", col("hits") >= 1L)
  }

  /** The C109 repair table: each complete double-encoded sequence and
    * the character it decodes back to (the cp1252→UTF-8 round trip
    * inverted), plus U+FFFD → dropped. Keys are pairwise
    * non-overlapping (full triples for the â€ punctuation family, so
    * replacement order cannot change the result) and SHARED with
    * OracleGen — the two sides cannot drift. The bare `â€` prefix is
    * deliberately NOT repaired: an incomplete artifact stays visible
    * (and keeps scoring under C105) instead of being guessed at. */
  val MojibakeRepairs: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "Ã¯" -> "ï", "Ã¼" -> "ü", "Ã¤" -> "ä",
    "â€™" -> "’", "â€œ" -> "“", "â€\u009d" -> "”", // third char is the INVISIBLE cp1252-unmapped 0x9D
    "â€”" -> "—", "â€“" -> "–",
    "�" -> "")

  /** C109 — mojibake REPAIR (the fix half of C105's detector): invert
    * the Latin-1/cp1252 round trip for every complete artifact in
    * [[MojibakeRepairs]] and drop U+FFFD markers — recovering a
    * salvageable document beats discarding it, and crawl pipelines run
    * exactly this pass (ftfy's core loop) between language ID and
    * quality scoring. Counting happens BEFORE repair (replace-delta,
    * C105's algebra); keys don't overlap, so the sequential replace
    * chain is order-independent and deterministic.
    *
    * Scale shape: map-only — one projection of chained literal
    * `replace` calls inside whole-stage codegen; nothing shuffles.
    * Output: (id, text [repaired], n_repairs, repaired flag). */
  def mojibakeRepair(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = MojibakeRepairs.map { case (p, _) =>
      ((length(t) - length(call_function("replace", t, lit(p), lit(""))))
        / lit(p.length)).cast("long")
    }.reduce(_ + _)
    val repaired = MojibakeRepairs.foldLeft(t) { case (c, (p, r)) =>
      call_function("replace", c, lit(p), lit(r))
    }
    df.select(col(idCol), repaired.as(textCol), counts.as("n_repairs"))
      .withColumn("repaired", col("n_repairs") >= 1L)
  }

  /** C111 — vocabulary coverage by language: fix the top-`v` corpus
    * words (by occurrence count, ties on the word) as the vocabulary
    * and report, per language, what fraction of word OCCURRENCES and
    * word TYPES it covers — the table a tokenizer/vocab decision reads
    * next to C93's fertility: a language whose occurrence coverage
    * lags the corpus average is the one the shared vocab is
    * under-serving (the multilingual-vocab allocation problem UniMax's
    * budget, C102, only half-solves).
    *
    * Scale shape: one (lang, word) count agg with map-side partials
    * (vocabulary-cardinality output, NOT corpus rows), the top-v
    * vocab via TakeOrdered(v) re-broadcast as a membership join, then
    * a lang-cardinality final agg. The corpus text is scanned once;
    * nothing document-sized ever shuffles. Exact integer sums; the
    * two rates are single IEEE divisions rounded to 6. */
  def vocabCoverage(df: DataFrame, langCol: String, textCol: String,
                    v: Int): DataFrame = {
    require(v >= 1, s"vocabCoverage: v must be >= 1, got $v")
    val words = df.select(col(langCol).as("lang"),
        explode(Text.wsTokens(col(textCol))).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("occ"))
    val vocab = words.groupBy("word").agg(sum("occ").as("tot"))
      .orderBy(col("tot").desc, col("word")).limit(v)
      .select(col("word"), lit(true).as("in_vocab"))
    words.join(broadcast(vocab), Seq("word"), "left")
      .groupBy("lang")
      .agg(sum("occ").as("n_occurrences"),
        count(lit(1)).as("n_types"),
        coalesce(sum(when(col("in_vocab"), col("occ"))), lit(0L))
          .as("occ_covered"),
        coalesce(sum(when(col("in_vocab"), 1L)), lit(0L))
          .as("types_covered"))
      .withColumn("occ_coverage",
        round(col("occ_covered").cast("double") /
          greatest(col("n_occurrences"), lit(1L)).cast("double"), 6))
      .withColumn("type_coverage",
        round(col("types_covered").cast("double") /
          greatest(col("n_types"), lit(1L)).cast("double"), 6))
  }

  /** C122 — n-gram novelty of candidate documents against an existing
    * corpus: the fraction of a candidate's k-token windows never seen
    * in the reference — the "does this batch add anything" gate a
    * continual-pretraining pipeline runs before paying to train on a
    * new crawl (novelty ≈ 0 ⇒ the batch is re-crawl/memorized
    * material; the complement of the C21 contamination direction,
    * which asks the same question about EVAL sets). Same window
    * algebra as [[Dedup.splitLeakage]] (k-gram windows WITH duplicates,
    * pluggable token hash).
    *
    * Shape: the reference reduces to its DISTINCT window-hash set
    * (8-byte hashes, content-scale but hash-only — at 100 TB this is
    * the landed dimension a daily delta joins against, persisted/
    * bucketed by hash once, not rebuilt per batch); candidate windows
    * left-join it on the hash and ONE map-side-combinable count pair
    * per doc folds the verdict. Docs with fewer than k tokens have no
    * windows and are absent (novelty is undefined, not zero — a
    * pipeline gates them on length first).
    *
    * Output: (id, n_windows, n_novel, novelty round-6). */
  def ngramNovelty(candidates: DataFrame, reference: DataFrame,
                   idCol: String, textCol: String, k: Int = 8,
                   tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(k >= 1, s"ngramNovelty: k must be >= 1, got $k")
    ngramNoveltyAgainstSeen(candidates,
      seenWindowHashes(reference, textCol, k, tokenHash),
      idCol, textCol, k, tokenHash)
  }

  /** a corpus reduced to its DISTINCT k-token-window hash set — the
    * landed dimension [[ngramNovelty]] joins against (column `h`). At
    * 100 TB this is written bucketed by `h` ONCE and extended
    * incrementally (streaming/NoveltyAdmit), never rebuilt per batch. */
  def seenWindowHashes(corpus: DataFrame, textCol: String, k: Int,
                       tokenHash: Column => Column = xxhash64(_)): DataFrame =
    corpus.select(explode(Text.shinglesWithDuplicates(col(textCol), k)).as("w"))
      .select(tokenHash(col("w")).as("h")).distinct()

  /** [[ngramNovelty]] with the reference pre-reduced to its window-hash
    * dimension (`h`) — the form every incremental caller uses, since
    * landing the hash set once is the whole point of the shape. */
  def ngramNoveltyAgainstSeen(candidates: DataFrame, seenHashes: DataFrame,
                              idCol: String, textCol: String, k: Int = 8,
                              tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(k >= 1, s"ngramNovelty: k must be >= 1, got $k")
    val cw = candidates.select(col(idCol),
        explode(Text.shinglesWithDuplicates(col(textCol), k)).as("w"))
      .select(col(idCol), tokenHash(col("w")).as("h"))
    val seen = seenHashes.select(col("h")).withColumn("_seen", lit(1L))
    cw.join(seen, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_windows"), 6))
  }

  /** C123 — preference-pair curation (DPO/reward-model data prep):
    * the validation-and-dedup pass a pairwise-preference dataset goes
    * through before training, applied to rows of
    * (id, prompt, response A, response B, score A, score B).
    *
    * Per pair, in order:
    *  1. ORIENTATION repair — chosen = the higher-scored response
    *     (`swapped` records when that was B). A flipped pair is label
    *     noise only if left unrepaired, so it is fixed, not dropped.
    *     Score ties keep A (deterministic, no coin-flip).
    *  2. `ok_distinct` — chosen ≠ rejected byte-wise: an identical
    *     pair carries zero preference signal.
    *  3. `ok_margin` — margin = chosen − rejected score ≥ minMargin:
    *     near-tie pairs are annotator noise amplified by the DPO loss.
    *  4. `ok_len_ratio` — longer/shorter whitespace-token ratio ≤
    *     maxLenRatio (short side floored at 1 token): reward models
    *     latch onto length when one side is structurally longer, the
    *     documented RLHF length-bias failure.
    *  5. PROMPT DEDUP — among pairs passing 2–4, exactly one pair
    *     per distinct prompt survives (lowest id wins): repeated
    *     prompts over-weight their gradient and leak between train/
    *     eval splits. Failing pairs never block a passing duplicate.
    *
    * Output: one row per input pair with the repaired orientation
    * flag, each check's verdict, round-6 margin and length ratio,
    * and `kept` = passes 2–4 AND wins the dedup — row-per-input
    * (like C94's SFT validation) so the audit trail shows WHY each
    * pair dropped (all checks true + kept false ⇒ a dedup loser).
    *
    * Scale shape: stages 1–4 are map-only (whole-stage codegen, no
    * UDFs); stage 5 is one hash-partitioned window over the prompt —
    * the only shuffle, carrying (prompt-hash, id, flags) rows, never
    * response text. No all-pairs anywhere. */
  def prefPairPrep(pairs: DataFrame, idCol: String, promptCol: String,
                   respACol: String, respBCol: String,
                   scoreACol: String, scoreBCol: String,
                   minMargin: Double = 0.05,
                   maxLenRatio: Double = 3.0): DataFrame = {
    val swapped = col(scoreBCol) > col(scoreACol)
    val scored = pairs.select(col(idCol), col(promptCol),
        swapped.as("swapped"),
        when(swapped, col(respBCol)).otherwise(col(respACol)).as("_chosen"),
        when(swapped, col(respACol)).otherwise(col(respBCol)).as("_rejected"),
        when(swapped, col(scoreBCol)).otherwise(col(scoreACol)).as("_cs"),
        when(swapped, col(scoreACol)).otherwise(col(scoreBCol)).as("_rs"))
      .withColumn("_clen",
        greatest(size(Text.wsTokens(col("_chosen"))).cast("double"), lit(1.0)))
      .withColumn("_rlen",
        greatest(size(Text.wsTokens(col("_rejected"))).cast("double"), lit(1.0)))
      .withColumn("margin", col("_cs") - col("_rs"))
      .withColumn("len_ratio",
        greatest(col("_clen"), col("_rlen")) / least(col("_clen"), col("_rlen")))
      .withColumn("ok_distinct", col("_chosen") =!= col("_rejected"))
      .withColumn("ok_margin", col("margin") >= minMargin)
      .withColumn("ok_len_ratio", col("len_ratio") <= maxLenRatio)
      .withColumn("_row_ok",
        col("ok_distinct") && col("ok_margin") && col("ok_len_ratio"))
    scored
      .withColumn("_rk",
        row_number().over(Window.partitionBy(col(promptCol))
          .orderBy(when(col("_row_ok"), 0).otherwise(1), col(idCol))))
      .withColumn("kept", col("_row_ok") && col("_rk") === 1)
      .select(col(idCol), col("swapped"), col("ok_distinct"),
        col("ok_margin"), col("ok_len_ratio"), col("kept"),
        round(col("margin"), 6).as("margin"),
        round(col("len_ratio"), 6).as("len_ratio"))
  }
}
