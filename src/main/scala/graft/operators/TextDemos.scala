package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** SURVEY §2C demos: LLM-training-data operators on the documents and
  * embeddings tables. */
object TextDemos {

  /** C10 — whitespace + BPE-ish token counting. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      Text.tokenCount(col("text")).as("ws_tokens"),
      Text.bpeTokenCount(col("text")).as("bpe_tokens"))
      .orderBy("doc_id")

  /** C9 — composite quality score (length/stopword/alpha ratios). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), Text.qualityScore(col("text")).as("score"))
      .orderBy("doc_id")

  /** C-pipeline E2E — the whole corpus-cleaning chain as ONE
    * driver-checked query, composed from the library's own stages in
    * production order: domain blocklist (broadcast anti-join, corpus
    * never shuffles) → token-length outlier trim (one broadcast bounds
    * row) → exact dedup (first-wins per text hash) → deterministic
    * 80/10/10 hash split → per-(split, source) summary. Every stage is
    * an independently-oracled operator; this row proves the
    * COMPOSITION — what a user actually runs — stays value-exact
    * end-to-end. */
  def llmPipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).withColumn("url",
      concat(lit("https://www."), col("source"), lit(".example.com/doc/"),
        col("doc_id").cast("string")))
    val blocked = Seq("src3.example.com", "src7.example.com", "src11.example.com")
      .toDF("domain")
    val kept = Filtering.urlBlocklist(docs, blocked, "url")
      .withColumn("n_tokens", Text.tokenCount(col("text")))
    val trimmed = Filtering.quantileOutliers(kept, "n_tokens", 0.05, 0.95)
      .filter(!col("is_outlier"))
      .drop("lo_bound", "hi_bound", "is_outlier")
    val keepIds = trimmed
      .groupBy(md5(col("text")).as("_h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = trimmed.join(keepIds, Seq("doc_id"), "leftsemi")
    Sampling.hashSplit(deduped, "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("split"), col("source"))
  }

  /** C28 — the Gopher quality rules (Rae et al. 2021, §A1.1) as a
    * per-document filter report: word-count bounds, mean-word-length
    * bounds, symbol-to-word ratio, alphabetic-word fraction, and
    * required-stopword presence — the standard pre-training heuristic
    * filter battery, each rule a codegen'd Column over one tokenize
    * pass (no UDFs; at 100 TB this is a map-only scan). Divisions are
    * exact-int-over-int IEEE ops identical in any engine, so the
    * doubles oracle-match without rounding. */
  def gopherQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val nWords = size(toks).cast("long")
    val totalChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val meanLen = when(nWords > 0, totalChars.cast("double") / nWords).otherwise(0.0)
    val symbolHits = size(filter(toks,
      t => t.contains("#") || t.contains("..."))).cast("long")
    val symbolRatio = when(nWords > 0, symbolHits.cast("double") / nWords).otherwise(0.0)
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val alphaFrac = when(nWords > 0, alphaWords.cast("double") / nWords).otherwise(0.0)
    val stopList = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = size(filter(
      array(stopList.map(lit): _*), s => array_contains(toks, s))).cast("long")
    val passes = nWords.between(50, 100000) &&
      meanLen.between(3.0, 10.0) &&
      symbolRatio <= 0.1 && alphaFrac >= 0.8 && stopHits >= 2
    Tables.documents(spark, dir).select(
      col("doc_id"), nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
      stopHits.as("n_stop_hits"), passes.as("passes"))
      .orderBy("doc_id")
  }

  /** C8 — stopword-profile language ID. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val (pred, hits) = Text.langId(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"), pred.as("pred_lang"), hits.as("profile_hits"))
      .orderBy("doc_id")
  }

  /** C121 — language-ID confusion matrix: detected language vs the
    * metadata lang column, one row per (actual, predicted) cell with
    * the cell's share of its actual-language row — the audit that
    * says WHERE the detector and the crawl metadata disagree before
    * anyone keys a mixture policy (C27/C102) on either. Diagonal
    * share = per-language recall of the detector against metadata;
    * off-diagonal mass names the confusion pairs. Scale shape: one
    * map-side-combined count to (actual, predicted) cells
    * (language²-cardinality), actual totals reduce from the CELLS and
    * broadcast back — the corpus is scanned once. */
  def langConfusionDemo(spark: SparkSession, dir: String): DataFrame = {
    val (pred, _) = Text.langId(col("text"))
    val cells = Tables.documents(spark, dir)
      .select(col("lang").as("actual"), pred.as("predicted"))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = cells.groupBy(col("actual")).agg(sum(col("n_docs")).as("_t"))
    cells.join(broadcast(totals), Seq("actual"))
      .select(col("actual"), col("predicted"), col("n_docs"),
        round(col("n_docs").cast("double") / col("_t"), 6).as("actual_frac"))
      .orderBy("actual", "predicted")
  }

  /** C72 — the dataset-card mixture table keyed by DETECTED language
    * (C62 keys on the metadata lang column; this is the honest
    * version — crawl metadata lies, detection doesn't): per
    * (pred_lang, source), doc count, whitespace-token mass, char
    * mass, and chars-per-token (the fertility proxy tokenizer teams
    * read per language — CJK ≪ latin). One map-side-combined
    * aggregation; the ratio is an exact-int IEEE division. */
  def tokenStatsByLang(spark: SparkSession, dir: String): DataFrame = {
    val (pred, _) = Text.langId(col("text"))
    Tables.documents(spark, dir)
      .select(col("source"), pred.as("pred_lang"),
        Text.tokenCount(col("text")).as("toks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("pred_lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        sum(col("chars")).as("total_chars"))
      .withColumn("chars_per_token",
        when(col("total_tokens") > 0,
          col("total_chars").cast("double") / col("total_tokens")).otherwise(0.0))
      .orderBy("pred_lang", "source")
  }

  /** C74 — the crawl ingest ladder end-to-end, as an auditable
    * funnel: real WARC shards (the C69 fixture) → language gate (C8,
    * keep detected-en) → exact dedup (C1, min-id per content hash) →
    * decontamination gate (C21, vs the %20 benchmark slice of the
    * full crawl). Output = one (stage, n_docs) row per funnel stage —
    * the drop accounting every corpus release publishes. Each stage
    * composes the existing operator; no stage rescans what a prior
    * stage computed beyond its own inputs (dedup shuffles 16-byte
    * hashes, contamination shuffles 8-byte shingle hashes). */
  def crawlIngestE2e(spark: SparkSession, dir: String): DataFrame = {
    val warcDir = RefDemos.warcFixtureDir(spark, dir)
    val ingested = graft.util.CacheRegistry.register(
      spark.read.format("graft-warc").load(warcDir)
        .filter(col("warc_type") === "resource")
        .select(
          regexp_extract(col("target_uri"), "(\\d+)$", 1).cast("long").as("doc_id"),
          col("payload").cast("string").as("text"))
        .persist())
    val (pred, _) = Text.langId(col("text"))
    val en = graft.util.CacheRegistry.register(
      ingested.withColumn("pred_lang", pred)
        .filter(col("pred_lang") === "en").drop("pred_lang").persist())
    val survivors = Dedup.exactByHash(en, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    // contamination is computed over the FULL ingested crawl (the
    // benchmark slice is defined corpus-wide), then gates survivors
    val cont = Dedup.contaminationCheck(ingested,
        ingested.filter(col("doc_id") % 20 === 0), "doc_id", "text",
        shingleN = 3, flagThreshold = 0.2,
        tokenHash = graft.functions.Vec.md5Hash60)
      .select(col("doc_id"), col("contamination"))
    val clean = survivors.join(cont, Seq("doc_id"), "left")
      .filter(coalesce(col("contamination"), lit(0.0)) < 0.2)
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
    stage("f0_ingested", ingested)
      .unionAll(stage("f1_lang_en", en))
      .unionAll(stage("f2_deduped", survivors))
      .unionAll(stage("f3_decontaminated", clean))
      .orderBy("stage")
  }

  /** C75 — centrality-weighted curation gate: the composition C68's
    * doc promises — PageRank centrality over the document graph fed
    * into C54's per-source quantile-gate machinery ("keep each
    * source's most corpus-central half", each source its own bar; the
    * graph analog of FineWeb's per-source quality gating). Pure
    * composition: the centrality table is (id, long) rows, the
    * per-source thresholds broadcast, the corpus never shuffles.
    * rank_e15 ≤ 10^15 < 2^53 casts to double exactly, so the
    * interpolated quantile is engine-bit-exact. */
  def centralityGate(spark: SparkSession, dir: String): DataFrame = {
    // the UNsorted rank recurrence: pagerankCentrality's orderBy("id")
    // is presentation for its own row — inside the gate it would be a
    // full extra sort exchange feeding a quantile agg + join that are
    // both order-indifferent
    val pr = pagerankOverKnn(spark, dir, iters = 6)
      .select(col("id").as("doc_id"), col("rank_e15").cast("double").as("centrality"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    Sampling.sourceQuantileFilter(
        docs.join(pr, Seq("doc_id")), "doc_id", "centrality", "source", q = 0.5)
      .orderBy("doc_id")
  }

  /** C11 — rolling-hash document fingerprint. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** C4 — exact n-gram Jaccard over adjacent-id candidate pairs. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
    Dedup.ngramJaccard(docs, pairs, "doc_id", "text", n = 3)
      .orderBy("id_a")
  }

  /** C2 — MinHash-LSH near-dup candidates (32 perms, 8 bands). The demo
    * uses the engine-portable md5-60 token hash + string band keys so
    * the DuckDB oracle reproduces it exactly; production default is
    * xxhash64 + hashed keys. */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, dir), "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
        tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = false)
      .orderBy("id_a", "id_b")

  /** C2 at production STRUCTURE, oracle-gated (r14 verdict task 4):
    * hashed band keys — the production shuffle-width optimization the
    * md5 demo above turns off — with the engine-portable md5-60 token
    * hash, so the full production code path (hashed 8-byte band keys
    * through the bucket self-join, est-sim verify) answers the same
    * DuckDB mirror as the demo: band-key hashing cannot change the
    * pair set short of a 2⁻⁶⁴ collision, so equal output IS the gate
    * (the r12 geocode_provider_chain full-width-equivalence trick).
    * The xxhash64 token-hash variant below keeps the raw-speed bench
    * row — tokenHash is the ONLY line it changes, and it is a Spark
    * built-in, not engine code. */
  def dedupMinhashProd(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, dir), "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
        tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = true)
      .orderBy("id_a", "id_b")

  /** the raw-throughput production hash point (xxhash64 tokens, no
    * DuckDB counterpart) — bench-only; the structural path above is
    * the oracle gate. */
  def dedupMinhashProdXxhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, dir), "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, minEstSim = 0.25)
      .orderBy("id_a", "id_b")

  /** C3 — SimHash near-dup pairs (hamming <= 16 on 60 verifiable bits). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir), "doc_id", "text",
        maxHamming = 16, tokenHash = graft.functions.Vec.md5Hash60, bits = 60)
      .orderBy("id_a", "id_b")

  /** C13 — near-dup clustering: connected components over the MinHash
    * candidate pairs; every doc labeled with its component's min id. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
      tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = false)
    Dedup.connectedComponents(docs, pairs, "doc_id")
      .orderBy("doc_id")
  }

  /** C5 — brute-force cosine top-k (queries: vec_id < 5). */
  def embedCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    Similarity.bruteTopK(queries, corpus, k = 5)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("query_id", "rank")
  }

  /** C6 — LSH-bucketed approximate top-k (scale path of C5). */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    Similarity.lshTopK(queries, corpus, k = 5, nPlanes = 8, dim = 64, probeBits = 1)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("query_id", "rank")
  }

  /** C76 — retrieval evaluation as the A/B gate it exists for: the
    * exact dense baseline and the C6 approximate run, both graded
    * against exact ground truth (brute-force top-10, gain 11 − rank) —
    * recall@5, MRR@5, nDCG@5 per (run, query). The exact arm scores
    * 0.5/1/1 by construction (it IS the truth's head); the lsh arm's
    * near-zeros are the honest verdict on an 8-plane single-probe
    * index at this scale — exactly the regression the gate is built
    * to catch before an index config ships. Metric-scale joins only;
    * the corpus appears once per run, never in the eval algebra. */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val exact = Similarity.bruteTopK(queries, corpus, k = 10)
      .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
    val qrels = exact.select(col("query_id"), col("doc_id"),
      (lit(11L) - col("rank")).as("rel"))
    val lsh = Similarity.lshTopK(queries, corpus, k = 5,
        nPlanes = 8, dim = 64, probeBits = 1)
      .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
    val arms = Seq("exact" -> exact.filter(col("rank") <= 5), "lsh" -> lsh)
    arms.map { case (name, run) =>
      RankEval.rankMetrics(run, qrels, k = 5)
        .select(lit(name).as("run_name"), col("query_id"),
          col("recall_at_k"), col("mrr"), col("ndcg_at_k"))
    }.reduce(_ unionByName _).orderBy("run_name", "query_id")
  }

  /** C20 — deterministic hash-based train/val/test split: per-split
    * document counts (membership is a pure function of doc_id). */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    Sampling.hashSplit(Tables.documents(spark, dir), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
      .orderBy("split")

  /** C18 — intra-document repetition score (the "repetition filter" of
    * web-scale corpus cleaning): fraction of duplicated 3-gram
    * shingles; docs above threshold get flagged. */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.functions.Text.shinglesWithDuplicates(col("text"), 3)
    Tables.documents(spark, dir)
      .select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id"),
        size(col("sh")).cast("long").as("n_shingles"),
        size(array_distinct(col("sh"))).cast("long").as("n_distinct"))
      .withColumn("dup_ratio",
        when(col("n_shingles") > 0,
          (col("n_shingles") - col("n_distinct")).cast("double") / col("n_shingles"))
          .otherwise(0.0))
      .withColumn("flagged", col("dup_ratio") > 0.5)
      .orderBy("doc_id")
  }

  /** C19 — PII/URL scrubbing: redact emails, URLs and long digit runs
    * with typed placeholder tokens; report replacement counts. Inputs
    * are synthesized onto the docs so the oracle sees identical text. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@mail.example or call 09123456"),
      col("doc_id").cast("string"), lit(" or visit https://site"),
      col("doc_id").cast("string"), lit(".example/page now"))
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val urlPat = "https?://[^\\s]+"
    val digitPat = "[0-9]{6,}"
    Tables.documents(spark, dir)
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("dirty"),
          emailPat, "<EMAIL>"), urlPat, "<URL>"), digitPat, "<NUM>").as("scrubbed"),
        size(regexp_extract_all(col("dirty"), lit(emailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("dirty"), lit(urlPat), lit(0))).cast("long").as("n_urls"))
      .orderBy("doc_id")
  }

  /** C16 — document-frequency vocabulary filter (the min_df/max_df
    * pruning of TF-IDF pipelines): drop tokens present in more than
    * 60% of documents, rebuild each document preserving token order.
    * Fully relational: posexplode + distinct DF count + join + ordered
    * re-aggregation — one pattern that scales to any corpus size. */
  def docFreqFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      posexplode(graft.functions.Text.wsTokens(col("text"))).as(Seq("pos", "tok")))
    val df = toks.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val kept = toks.join(broadcast(df), "tok")
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n_docs") * 0.6)
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("filtered_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("filtered_text"), lit("")).as("filtered_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("doc_id")
  }

  /** C17 — TF-IDF top terms per document (tf * ln(N/df), top 3;
    * rounded score ranking with term tie-break for determinism). */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.Text.wsTokens(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // tf rows ARE the distinct (doc, token) pairs: derive df from tf
    // instead of re-exploding + re-distincting the token stream (halves
    // the explode work and drops a full-width shuffle)
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("tok"), col("score"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  /** C14 — IVF coarse quantizer: per-cluster centroids (long form).
    * Rounded to 12 digits for the oracle: decimal->double conversion
    * may differ by 1 ulp between engines. */
  def ivfCentroids(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfCentroids(Tables.embeddings(spark, dir), "embedding", "label")
      .select(col("label"), col("pos"), round(col("centroid"), 12).as("centroid"))
      .orderBy("label", "pos")

  /** C15 — IVF assignment: each query probes its nearest centroid. */
  def ivfAssign(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Similarity.ivfAssign(queries,
        Similarity.ivfCentroids(emb, "embedding", "label"))
      .orderBy("query_id")
  }

  /** C14+C15 closed loop — IVF end-to-end top-k: each query probes its
    * assigned centroid's posting list only (the actual point of IVF),
    * ranked by the bounded top-k aggregate. */
  def ivfTopk(spark: SparkSession, dir: String): DataFrame =
    ivfTopkOver(spark, dir, lit(true))

  /** the shared C15b/C82 demo body: IVF top-5 over the embeddings
    * split, with `candFilter` restricting the candidate side (C82's
    * query-time predicate; `lit(true)` = the unfiltered C15b row). */
  private def ivfTopkOver(spark: SparkSession, dir: String,
                          candFilter: Column): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.filter(col("vec_id") >= 5 && candFilter)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("label"))
    Similarity.ivfTopK(queries, corpus,
        Similarity.ivfCentroids(emb, "embedding", "label"), k = 5)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("query_id", "rank")
  }

  /** C82 — filtered vector search (the pre-filter semantics every
    * production vector store leads with): an IVF query restricted to
    * a metadata predicate, with the predicate applied to the
    * CANDIDATE side before scoring — the index and centroids stay
    * built over the full corpus and the filter costs only the scan it
    * prunes. Within the PROBED clusters the query draws its full k
    * from surviving candidates, where post-filtering an unfiltered
    * top-k silently returns fewer (the deficit FilteredAnnSpec
    * demonstrates). The guarantee is nprobe-bounded — the caveat every
    * IVF store documents: a highly selective filter can starve the
    * probed cluster even when other clusters hold matches, and the
    * remedy is raising nprobe with filter selectivity (ivfTopK's knob;
    * FilteredAnnSpec pins both the starvation and the nprobe=2
    * recovery). On a label-partitioned landed index the predicate
    * reaches the parquet scan as a pushed filter (spec-pinned). */
  def annFilteredTopk(spark: SparkSession, dir: String): DataFrame =
    ivfTopkOver(spark, dir, col("vec_id") % 3 =!= 0)

  /** C34a — PQ corpus compression: 64-dim embeddings encoded to m=8
    * one-byte codes each (32× smaller than the floats), codebooks
    * bootstrap-trained by the table's label column (the oracle-exact
    * configuration; kmeansFit-per-subspace is the self-trained path,
    * spec-gated like IVF's). */
  def pqEncodeDemo(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val books = Similarity.pqCodebooks(emb, "embedding", "label", m = 8, dim = 64)
    Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", books, m = 8, dim = 64)
      .orderBy("vec_id", "subspace")
  }

  /** the PQ codebooks persisted: dimension-scale (m × codes × d/m =
    * 640 rows), but its SUBTREE is a corpus aggregation — without the
    * persist every broadcast branch that joins the books would re-run
    * that corpus scan independently. */
  private def pqBooksCached(emb: DataFrame): DataFrame =
    graft.util.CacheRegistry.register(
      Similarity.pqCodebooks(emb, "embedding", "label", m = 8, dim = 64).persist())

  /** The trained PQ index as a PERSISTED run-scoped artifact —
    * codebooks + encoded corpus codes landed as parquet once per run
    * ([[graft.util.Fixtures.buildOnce]]), read back by both PQ rows.
    * This is the honest production split the r8 judge asked for: an
    * ANN service trains/encodes once and serves many searches, so the
    * timed search row must read a persisted index, not re-train per
    * query (the bpe_train / bpe_encode precedent). Candidate split
    * (vec_id ≥ 5 encoded, < 5 querying) is pinned to the oracle's. */
  private def pqIndexDirs(spark: SparkSession, dir: String): (String, String) = {
    val base = graft.util.Fixtures.buildOnce(
      graft.util.Fixtures.dir(s"pq_${new java.io.File(dir).getName}")) {
      val emb = Tables.embeddings(spark, dir)
      val books = pqBooksCached(emb)
      val p = graft.util.Fixtures.dir(s"pq_${new java.io.File(dir).getName}")
      books.write.mode("overwrite").parquet(s"$p/books")
      Similarity.pqEncode(
          emb.filter(col("vec_id") >= 5)
            .select(col("vec_id").as("cand_id"), col("embedding")),
          "cand_id", "embedding", books, m = 8, dim = 64)
        .write.mode("overwrite").parquet(s"$p/codes")
    }
    (s"$base/books", s"$base/codes")
  }

  /** C34a' — PQ training: the per-subspace codebooks (the trained
    * artifact an ANN service ships), built from one corpus pass and
    * landed with the encoded codes as the persisted index
    * [[pqTopkDemo]] serves from. Centroids round to 12 places for the
    * cross-engine hash (the ivf_centroids discipline). */
  def pqTrainDemo(spark: SparkSession, dir: String): DataFrame = {
    val (booksDir, _) = pqIndexDirs(spark, dir)
    spark.read.parquet(booksDir)
      .select(col("subspace"), col("code"), col("subpos"),
        round(col("centroid"), 12).as("centroid"))
      .orderBy("subspace", "code", "subpos")
  }

  /** C34b — PQ asymmetric-distance top-k: queries (vec_id < 5, as the
    * IVF demos) search ONLY the persisted index — codebooks broadcast
    * from the parquet artifact, the compressed codes table is the one
    * corpus-scale scan, raw candidate vectors never load at query
    * time. Training/encoding cost lives in [[pqTrainDemo]]'s row. */
  def pqTopkDemo(spark: SparkSession, dir: String): DataFrame = {
    val (booksDir, codesDir) = pqIndexDirs(spark, dir)
    val books = spark.read.parquet(booksDir)
    val codes = spark.read.parquet(codesDir)
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Similarity.pqTopK(queries, codes, books, k = 5, m = 8, dim = 64)
      .orderBy("query_id", "rank")
  }

  /** The IVF-PQ index as a persisted run-scoped artifact (the
    * pq_train/pq_topk split): coarse centroids (label bootstrap, the
    * ivf demos' quantizer), residual codebooks (id-mod bootstrap), and
    * the label-carrying codes, landed once; the search row serves from
    * the artifact. Candidate split (vec_id ≥ 5 indexed, < 5 querying)
    * pinned to the oracle's. */
  private def ivfPqIndexDirs(spark: SparkSession, dir: String): (String, String, String) = {
    val base = graft.util.Fixtures.buildOnce(
      graft.util.Fixtures.dir(s"ivfpq_${new java.io.File(dir).getName}")) {
      val emb = Tables.embeddings(spark, dir)
      val p = graft.util.Fixtures.dir(s"ivfpq_${new java.io.File(dir).getName}")
      val cents = graft.util.CacheRegistry.register(
        Similarity.ivfCentroids(emb, "embedding", "label").persist())
      cents.write.mode("overwrite").parquet(s"$p/centroids")
      val resid = Similarity.ivfPqResiduals(
        emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("embedding"), col("label")),
        "cand_id", "embedding", "label", cents, m = 8, dim = 64)
      val residC = graft.util.CacheRegistry.register(resid.persist())
      val books = graft.util.CacheRegistry.register(
        Similarity.ivfPqBooks(residC, "cand_id", bits = 4).persist())
      books.write.mode("overwrite").parquet(s"$p/books")
      Similarity.ivfPqEncode(residC, "cand_id", "label", books)
        .write.mode("overwrite").parquet(s"$p/codes")
    }
    (s"$base/centroids", s"$base/books", s"$base/codes")
  }

  /** C64 — IVF-PQ asymmetric-distance search: the billion-scale ANN
    * layout (coarse pruning × 32× code compression) served from the
    * persisted index; only the codes table is corpus-scale at query
    * time (see [[Similarity.ivfPqTopK]]). */
  def ivfPqTopkDemo(spark: SparkSession, dir: String): DataFrame = {
    val (centsDir, booksDir, codesDir) = ivfPqIndexDirs(spark, dir)
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Similarity.ivfPqTopK(queries,
        spark.read.parquet(codesDir), spark.read.parquet(booksDir),
        spark.read.parquet(centsDir), k = 5, m = 8, dim = 64, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  /** C73 — exact rerank over the C64 IVF-PQ candidates: ADC top-20
    * per query, exact-cosine rescored and cut to top-5 (see
    * [[Similarity.ivfPqRerank]]). Same run-scoped landed index as
    * ivfpq_topk — the row times rerank, not index build. */
  def ivfPqRerankDemo(spark: SparkSession, dir: String): DataFrame = {
    val (centsDir, booksDir, codesDir) = ivfPqIndexDirs(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    Similarity.ivfPqRerank(queries,
        emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"), col("embedding").as("cv")),
        spark.read.parquet(codesDir), spark.read.parquet(booksDir),
        spark.read.parquet(centsDir),
        k = 5, kCand = 20, m = 8, dim = 64, nprobe = 2)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("query_id", "rank")
  }

  /** C35 — BPE vocabulary training: 12 merge rules learned from the
    * corpus' distinct-word frequency table (one corpus pass, then
    * vocabulary-scale rounds — see [[Bpe]] for the 100 TB posture).
    * The merge table IS the trained artifact a tokenizer ships. */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    Bpe.trainDf(Tables.documents(spark, dir), "text", nMerges = 12)
      .orderBy("rank")

  /** C36 — the corpus segmented by the C35-trained vocabulary: per
    * doc, the BPE token stream and count. Train once at vocab scale,
    * then ONE dictionary join over the corpus (see [[Bpe.encode]]). */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    Bpe.encode(Tables.documents(spark, dir), "doc_id", "text", nMerges = 12)
      .orderBy("doc_id")

  /** The landed BM25 inverted index over the full documents table,
    * built once per run ([[graft.util.Fixtures.buildOnce]] — the
    * pq_train/pq_topk precedent): the retrieval rows time SEARCH
    * against the artifact, and [[bm25Index]]'s row owns the build
    * cost. `variant` keys the corpus shape ("docs" = full documents;
    * "joined" = the id-aligned documents ⋈ embeddings slice the C52/
    * C56 rows rank over — different corpus stats, different index). */
  private def bm25IndexDir(spark: SparkSession, dir: String, variant: String)
                          (corpus: => DataFrame): String =
    graft.util.Fixtures.buildOnce(
      graft.util.Fixtures.dir(s"bm25_${variant}_${new java.io.File(dir).getName}")) {
      Bm25.buildIndex(corpus, "doc_id", "text",
        graft.util.Fixtures.dir(s"bm25_${variant}_${new java.io.File(dir).getName}").toString)
    }.toString

  /** first-8-words self-retrieval queries over `corpus` — shared by
    * every BM25 demo row so index and query sides always agree. */
  private def bm25Queries(corpus: DataFrame): DataFrame =
    corpus.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("query_id"),
        slice(Text.wsTokens(col("text")), 1, 8).as("terms"))

  /** C37 — BM25 top-10 lexical retrieval: queries are the first 8
    * words of every 97th document (self-retrieval doubles as a sanity
    * check — a query's own doc must score). Searches the run-scoped
    * landed index ([[bm25IndexDir]]) — query-time work only. */
  def bm25Topk(spark: SparkSession, dir: String): DataFrame = {
    val idx = bm25IndexDir(spark, dir, "docs")(Tables.documents(spark, dir))
    Bm25.searchIndex(spark, idx, bm25Queries(Tables.documents(spark, dir)), k = 10)
      .orderBy("query_id", "rank")
  }

  /** C37' — the BM25 index BUILD, timed as its own row: rebuilds and
    * LANDS the precomputed-impact artifact from the corpus fresh each
    * invocation (no fixture — this row owns the cost the three search
    * rows amortize) and returns the per-term artifact summary (df +
    * exact impact mass) that pins the whole tokenize → posting →
    * impact-precompute chain. Unlike the oracle's in-memory mirror,
    * this row also pays the parquet landing — the honest build cost. */
  def bm25Index(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Fixtures
      .dir(s"bm25_build_${new java.io.File(dir).getName}").toString
    Bm25.buildIndex(Tables.documents(spark, dir), "doc_id", "text", out)
    spark.read.parquet(s"$out/impacts")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("w_e6")).as("sum_w_e6"))
      .orderBy("term")
  }

  /** C37'' — INCREMENTAL index growth: build from the even-id half of
    * the corpus, [[Bm25.appendIndex]] the odd half (tokenizing ONLY
    * it), and emit the same per-term summary as [[bm25Index]]. The
    * oracle is the FULL-corpus index SQL, so the driver's DuckDB gate
    * itself proves append ≡ from-scratch — impacts recompute from the
    * landed postings (they bake in corpus-wide df/avgdl/n) but the old
    * half is never re-tokenized. */
  def bm25IndexAppend(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Fixtures
      .dir(s"bm25_append_${new java.io.File(dir).getName}").toString
    val docs = Tables.documents(spark, dir)
    Bm25.buildIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", out)
    Bm25.appendIndex(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", out)
    spark.read.parquet(s"$out/impacts")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("w_e6")).as("sum_w_e6"))
      .orderBy("term")
  }

  /** C114 — index COMPACTION, driver-gated like the append row: build
    * from the even-id half, append the odd half (two committed
    * batches), compact to a single fresh-generation batch, and emit
    * the same per-term summary as [[bm25Index]]. The oracle is the
    * FULL-corpus index SQL, so the driver's DuckDB gate itself proves
    * compact ≡ append ≡ from-scratch. */
  def bm25IndexCompact(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Fixtures
      .dir(s"bm25_compact_${new java.io.File(dir).getName}").toString
    val docs = Tables.documents(spark, dir)
    Bm25.buildIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", out)
    Bm25.appendIndex(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", out)
    Bm25.compactIndex(spark, out)
    spark.read.parquet(s"$out/impacts")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("w_e6")).as("sum_w_e6"))
      .orderBy("term")
  }

  /** C55 — URL canonicalization: messy source URLs synthesized onto
    * the docs (the C23 convention — the table has no URL column, so
    * both engines see identical inputs) covering every rule: mixed
    * case scheme/host, default + explicit ports, trailing slashes,
    * tracking params in shuffled positions, fragments. */
  def urlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val i = col("doc_id")
    val url = concat(
      when(i % 2 === 0, "HTTP://").otherwise("https://"),
      lit("WWW.Src"), col("source"), lit(".Example.COM"),
      when(i % 3 === 0, when(i % 2 === 0, ":80").otherwise(":443"))
        .when(i % 5 === 0, ":8080").otherwise(""),
      lit("/Doc/"), i.cast("string"),
      when(i % 4 === 0, "/").otherwise(""),
      when(i % 2 === 0,
          concat(lit("?utm_source=feed&id="), i.cast("string"), lit("&utm_campaign=x&b=2")))
        .otherwise(concat(lit("?b=2&gclid=abc&id="), i.cast("string"))),
      when(i % 3 === 0, concat(lit("#sec"), i.cast("string"))).otherwise(""))
    Tables.documents(spark, dir)
      .select(col("doc_id"), url.as("url"))
      .withColumn("canon_url", graft.functions.Norm.canonicalizeUrl(col("url")))
      .withColumn("host", regexp_extract(col("canon_url"),
        "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1))
      .orderBy("doc_id")
  }

  /** C54 — per-source quality-quantile gate: keep each source's
    * above-median-quality half, with per-source bars (no cross-source
    * score calibration). */
  def sourceQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), Text.qualityScore(col("text")).as("score"))
    Sampling.sourceQuantileFilter(scored, "doc_id", "score", "source", q = 0.5)
      .orderBy("doc_id")
  }

  /** the id-aligned (documents ⋈ embeddings) corpus the hybrid rows
    * rank over. */
  private def joinedCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .join(Tables.embeddings(spark, dir).withColumnRenamed("vec_id", "doc_id"),
        Seq("doc_id"))

  /** C52 — hybrid retrieval: BM25 and dense cosine rankings over the
    * id-aligned corpus slice (documents that carry an embedding),
    * fused by integer Reciprocal Rank Fusion. The lexical leg searches
    * the run-scoped landed "joined" index ([[bm25IndexDir]] — shared
    * with C56, built once); one corpus persist feeds the dense
    * candidates and both query sides. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val idx = bm25IndexDir(spark, dir, "joined")(joinedCorpus(spark, dir))
    val corpus = graft.util.CacheRegistry.register(
      joinedCorpus(spark, dir).persist())
    val queries = corpus.filter(col("doc_id") % 97 === 0)
    val lex = Bm25.searchIndex(spark, idx, bm25Queries(queries), k = 20)
      .select("query_id", "doc_id", "rank")
    val dense = Similarity.bruteTopK(
        queries.select(col("doc_id").as("query_id"), col("embedding").as("qv")),
        corpus.select(col("doc_id").as("cand_id"), col("embedding").as("cv")),
        k = 20)
      .select(col("query_id"), col("cand_id").as("doc_id"), col("rank"))
    Fusion.rrf(Seq(lex, dense), k = 10)
      .orderBy("query_id", "rank")
  }

  /** C53 — MMR diversity rerank over a dense first-stage top-20:
    * greedy λ·rel − (1−λ)·max-sim-to-selected picks, 5 rounds. */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val cand = Similarity.bruteTopK(queries, corpus, k = 20)
      .select(col("query_id"), col("cand_id").as("doc_id"),
        round(col("sim"), 6).as("rel"))
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding").as("vec")),
        Seq("doc_id"))
    Mmr.rerank(cand, k = 5, lambda = 0.7)
      .orderBy("query_id", "mmr_round")
  }

  /** C57 — canonical text + the dedup key it exists for: NFC (native
    * codegen'd expression) → casefold → punctuation/whitespace
    * collapse → md5 key. */
  def textCanonicalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), Text.canonicalText(col("text")).as("canon"))
      .withColumn("canon_key", md5(col("canon")))
      .orderBy("doc_id")

  /** C56 — hard-negative mining (the DPR/contrastive-training recipe:
    * documents that MATCH the query lexically but are NOT among its
    * semantic neighbors make the hardest negatives): BM25 top-20 with
    * the dense cosine top-5 anti-joined away, over the same id-aligned
    * corpus as C52. The query document itself lands in dense top-1
    * (sim 1.0), so the anti-join also guarantees no query leaks into
    * its own negative set. Pure composition of C37 + C5 — the rankings
    * are dimension-scale, the anti-join touches only them. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val idx = bm25IndexDir(spark, dir, "joined")(joinedCorpus(spark, dir))
    val corpus = graft.util.CacheRegistry.register(
      joinedCorpus(spark, dir).persist())
    val queries = corpus.filter(col("doc_id") % 97 === 0)
    val lex = Bm25.searchIndex(spark, idx, bm25Queries(queries), k = 20)
      .select(col("query_id"), col("doc_id"), col("score"),
        col("rank").as("bm25_rank"))
    val dense = Similarity.bruteTopK(
        queries.select(col("doc_id").as("query_id"), col("embedding").as("qv")),
        corpus.select(col("doc_id").as("cand_id"), col("embedding").as("cv")),
        k = 5)
      .select(col("query_id"), col("cand_id").as("doc_id"))
    lex.join(dense, Seq("query_id", "doc_id"), "left_anti")
      .orderBy("query_id", "bm25_rank")
  }

  /** C7 — embedding-cosine near-duplicate pairs via shared LSH buckets. */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDup(Tables.embeddings(spark, dir),
        "vec_id", "embedding", threshold = 0.2, nPlanes = 8, dim = 64)
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("id_a", "id_b")

  /** C21 — benchmark-contamination scan: every 20th document doubles
    * as the "benchmark" set, so those docs read fully contaminated and
    * everything else reports its true shingle overlap. md5-60 hashing
    * for oracle parity (production default: xxhash64). */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.contaminationCheck(docs, docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleN = 3, flagThreshold = 0.2,
        tokenHash = graft.functions.Vec.md5Hash60)
      .orderBy("doc_id")
  }

  /** C58 — KMV corpus-overlap triage over the C21 fixture: the
    * non-benchmark corpus vs the benchmark slice (doc_id % 20), k=1024
    * sketches of their 3-shingle md5-60 hash sets, one summary row of
    * cardinality/Jaccard/intersection estimates. The scale gate that
    * decides whether the exact contamination scan is worth its
    * shuffle. md5-60 for oracle parity (production: xxhash64). */
  def corpusOverlapKmv(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.corpusOverlapKmv(
      docs.filter(col("doc_id") % 20 =!= 0), docs.filter(col("doc_id") % 20 === 0),
      "text", shingleN = 3, k = 1024,
      tokenHash = graft.functions.Vec.md5Hash60,
      hashLo = 0.0, hashSpan = 1.152921504606846976E18)
  }

  /** C71 — corpus version diff: v1 = docs without the %7 slice
    * (later re-added), v2 = docs without the %5 slice (removed) with
    * the %11 slice's text edited — all four states exercised
    * deterministically; per-doc status + the summary counts appended
    * (status='total:<s>' rows), one oracle gating both shapes. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val v1 = docs.filter(col("doc_id") % 7 =!= 0)
    val v2 = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2-edit")))
          .otherwise(col("text")))
    // ONE diff plan feeds both branches (the summary aggregates the
    // per-doc result rather than re-hashing and re-joining both
    // corpora — review finding; the identical subplans also collapse
    // under exchange reuse)
    val d = Curation.corpusDiff(v1, v2, "doc_id", "text")
    d.unionAll(
        d.groupBy(col("status")).agg(count(lit(1)).as("n"))
          .select(lit(-1L).as("doc_id"),
            concat(lit("total:"), col("status"), lit("="), col("n")).as("status")))
      .orderBy("doc_id", "status")
  }

  /** C80 — PSI drift gate over the C71 version fixture: v1/v2 under
    * the same synthesis the id-diff uses, scored by the C9 quality
    * score, bucketed at fixed 0.1-wide edges. The %11 text edits and
    * the %5/%7 slices shift a little quality mass between buckets —
    * exactly the distribution-level movement the id-level diff cannot
    * see. */
  def corpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val v1 = docs.filter(col("doc_id") % 7 =!= 0)
    val v2 = docs.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2-edit")))
          .otherwise(col("text")))
    def scored(df: DataFrame) = df.select(Text.qualityScore(col("text")).as("q"))
    Curation.distributionDrift(scored(v1), scored(v2), "q",
        edges = (1 to 9).map(_ / 10.0))
      .orderBy("bucket")
  }

  /** C70 — the C4 cleaning rules over synthesized pages (the C23/C55
    * convention — the corpus has no line structure, so both engines
    * see identical built pages): 7-word lines with a deterministic
    * punctuation cycle (every third line unterminated → line-dropped),
    * a "javascript" mention on the %13 docs' first line (punctuated
    * but still line-dropped), a lorem-ipsum tail line on the %17 docs
    * and a code-brace tail on the %19 docs (both pass the LINE rules —
    * only the PAGE rules can kill them). */
  /** the C70/D9 page synthesis: (doc_id, source, page) — shared by the
    * batch demo and the D9 streaming gate so both answer to mirrored
    * oracles over identical built pages. */
  private[graft] def c4SynthPages(docs: DataFrame): DataFrame = {
    val toks = Text.wsTokens(col("text"))
    val nLines = ceil(size(toks) / lit(7.0)).cast("int")
    val lines = when(size(toks) >= 1,
      transform(sequence(lit(0), nLines - 1), i =>
        concat(
          concat_ws(" ", slice(toks, i * 7 + 1, lit(7))),
          when(i === 0 && col("doc_id") % 13 === 0, " javascript").otherwise(""),
          when(i % 3 === 0, ".").when(i % 3 === 1, "!").otherwise(""))))
      .otherwise(array().cast("array<string>"))
    val page = concat(
      array_join(lines, "\n"),
      when(col("doc_id") % 17 === 0, "\nlorem ipsum dolor sit amet.").otherwise(""),
      // 5 words + terminal punctuation: the brace tail must PASS the
      // line rules so only the page-level "{" check can kill the page
      // (4 words would die at the word-count line rule and never
      // exercise the page rule — review finding)
      when(col("doc_id") % 19 === 0, "\n{ \"config\": 1 } end.").otherwise(""))
    docs.select(col("doc_id"), col("source"), page.as("page"))
  }

  def c4FiltersDemo(spark: SparkSession, dir: String): DataFrame =
    Filtering.c4Filters(c4SynthPages(Tables.documents(spark, dir)),
        "doc_id", "page")
      .select(col("doc_id"), col("n_lines").cast("long").as("n_lines"),
        col("n_lines_kept").cast("long").as("n_lines_kept"),
        col("kept"), col("clean_text"))
      .orderBy("doc_id")

  /** C22 — concat-and-chunk sequence packing into 2048-token context
    * windows, independently per shard (doc_id % 4 stands in for the
    * hash-split shard key). */
  def sequencePack(spark: SparkSession, dir: String): DataFrame =
    Packing.sequencePack(
        Tables.documents(spark, dir).select(col("doc_id"),
          (col("doc_id") % 4).as("shard"),
          Text.tokenCount(col("text")).as("toks")),
        "shard", "doc_id", "toks", capacity = 2048)
      .orderBy("shard", "doc_id")

  /** C26 — corpus-LM quality score (the perplexity filter of
    * CCNet-style cleaning, with the corpus's own unigram model as the
    * LM): per-document mean token log-likelihood under corpus token
    * frequencies. Per-token scores round to 6 places (absorbing
    * sub-ulp libm differences, as tfidf does) and aggregate through
    * decimal so partial-agg order can't shift the mean. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir).select(col("doc_id"),
      explode(Text.wsTokens(col("text"))).as("tok"))
    // tf-weighted form: the vocabulary join touches DISTINCT (doc, tok)
    // pairs, not every token instance — the join/shuffle input shrinks
    // by the in-doc repetition factor. Exactness: lp casts to decimal
    // BEFORE the integer tf multiply, so tf·lp equals lp summed tf
    // times (a double-side multiply would not).
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val counts = tf.groupBy(col("tok")).agg(sum(col("tf")).as("ctf"))
    // n_total folds over the vocabulary-sized counts table, not a third
    // pass over the corpus-sized tf table
    val total = counts.agg(sum(col("ctf")).as("n_total"))
    // no broadcast hint on counts: the unigram vocabulary is
    // corpus-sized, not dimension-sized — at 100 TB it must be free to
    // shuffle-join (Catalyst/AQE still broadcasts it at demo scale)
    tf.join(counts, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"),
        round(log(col("ctf").cast("double") / col("n_total")), 6)
          .cast("decimal(27,6)").as("_lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        (sum(col("_lp") * col("tf")).cast("double") / sum(col("tf")))
          .as("avg_logprob"))
      .withColumn("flagged", col("avg_logprob") < -6.0)
      .orderBy("doc_id")
  }

  /** C77 — DoReMi-style mixture reweighting over the corpus sources:
    * per-source cross-entropy proxy loss = −mean of the C26 unigram
    * avg_logprob across the source's docs; reference loss = the same
    * over the whole corpus (a global scalar, broadcast). Sources the
    * corpus-wide unigram model finds surprising — the hard domains —
    * earn excess loss and upweight; η = 50 (one EG step sized to
    * express a visible tilt on the demo corpus), 20% uniform smoothing.
    * The per-doc LM table joins documents on doc_id for the source
    * column (id-keyed; bucketed at 100 TB); per-source means go
    * through rounded-decimal sums so the dimension-scale loss table
    * is deterministic, and the reweight itself never touches the
    * corpus. */
  def mixtureReweightDemo(spark: SparkSession, dir: String): DataFrame = {
    val lm = lmScore(spark, dir).select(col("doc_id"), col("avg_logprob"))
    val bySource = lm
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .withColumn("_nl", round(-col("avg_logprob"), 6).cast("decimal(27,6)"))
    val perSource = bySource.groupBy(col("source")).agg(
      round(sum(col("_nl")).cast("double") / count(lit(1)), 6).as("proxy_loss"))
    val ref = bySource.agg(
      round(sum(col("_nl")).cast("double") / count(lit(1)), 6).as("ref_loss"))
    Sampling.mixtureReweight(
        perSource.crossJoin(broadcast(ref)),
        "source", "proxy_loss", "ref_loss", eta = 50.0, smoothing = 0.2)
      .orderBy("source")
  }

  /** C78 — CCNet head/middle/tail: per detected language, bucket docs
    * at the 1/3 and 2/3 quantiles of their LM cross-entropy (the
    * monotone log of perplexity — bucket membership is identical, and
    * the rounded-decimal C26 machinery already makes it
    * engine-deterministic). Composes the C26 scorer, the C8 detector
    * and the shared per-key quantile bars; the bucket assignment
    * itself is a broadcast-join map-side CASE. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val lm = lmScore(spark, dir)
      .select(col("doc_id"), round(-col("avg_logprob"), 6).as("ppl"))
    val (pred, _) = Text.langId(col("text"))
    val lang = Tables.documents(spark, dir)
      .select(col("doc_id"), pred.as("pred_lang"))
    Curation.perplexityBuckets(lm.join(lang, Seq("doc_id")),
        "doc_id", "pred_lang", "ppl")
      .orderBy("doc_id")
  }

  /** C79 — cluster-balanced sampling (the DINOv2/SemDeDup-era curation
    * move): flatten TOPIC skew by temperature-resampling over LEARNED
    * embedding clusters instead of metadata sources — crawl metadata
    * lies about topical balance the same way it lies about language
    * (C72's argument); the cluster assignment doesn't. Every vector
    * assigns to its nearest centroid (broadcast dimension-scale
    * centroid table, map-side argmax — the C15 path over the full
    * corpus), then the C44 keep rule runs per cluster: keep_frac =
    * (n_c/n_min)^(α−1), membership a pure hash of the id —
    * deterministic, rerun-stable, no corpus shuffle beyond the
    * cluster-count aggregate. Output is the release-note view: per
    * cluster, size before, size kept, keep fraction. */
  def clusterBalance(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = Similarity.ivfCentroids(emb, "embedding", "label")
    val assigned = Similarity.ivfAssign(
        emb.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        centroids)
      .select(col("query_id").as("vec_id"), col("label").as("cluster"))
    Sampling.temperatureMixSummary(assigned, "cluster", "vec_id", alpha = 0.5)
      .orderBy("cluster")
  }

  /** C39 — bigram LM quality score (the KenLM-perplexity-proxy filter
    * one order up from [[lmScore]]): per doc, mean log P(w_i | w_{i-1})
    * under corpus bigram counts with add-0.5 smoothing over the
    * unigram vocabulary. Bigrams never cross document boundaries.
    * Scale shape mirrors lmScore: the per-doc bigram tf table is the
    * only corpus-scale shuffle; corpus bigram counts reduce from it,
    * prefix counts reduce from THOSE (vocabulary² scale, one hop
    * each, no extra corpus pass); V is one count-distinct; no
    * broadcast hints on corpus-derived tables. Same 6-place-round +
    * decimal-agg determinism. Docs with fewer than two tokens have no
    * bigram and drop. */
  def bigramLmScore(spark: SparkSession, dir: String): DataFrame =
    bigramLmScoreOn(Tables.documents(spark, dir))

  /** [[bigramLmScore]]'s computation over any (doc_id, text) frame —
    * separate so specs score literal corpora through the same code. */
  def bigramLmScoreOn(docs: DataFrame): DataFrame =
    bigramLp(docs, carryTokens = false)
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        (sum(col("_lp") * col("tf")).cast("double") / sum(col("tf")))
          .as("avg_logprob"))
      .withColumn("flagged", col("avg_logprob") < -7.0)
      .orderBy("doc_id")

  /** the shared C39/C112 core: per (doc, bigram) the occurrence count
    * and the add-0.5-smoothed corpus-LM log-probability, quantized to
    * decimal(27,6) (the lm_score determinism discipline).
    *
    * FIXED-WIDTH JOIN KEYS (r16, guide §2.3 — the minhash_lsh_eval
    * xxhash64 discipline): the corpus-bigram-scale aggregations and
    * joins key on `ab = xxhash64(a, b)` / `ah = xxhash64(a)` — 8-byte
    * fixed-width keys instead of UTF8 string pairs, so the
    * corpus-scale exchanges hash/compare/sort machine words.
    * Injective at 2⁻⁶⁴ collision odds on any real vocabulary; the
    * DuckDB oracle recomputes every consumer row FROM the strings and
    * still hash-matches (197/197), which is the equivalence proof.
    *
    * `carryTokens=false` (the per-doc score consumers, which never
    * look at the tokens again): the strings are hashed in the explode
    * projection and NEVER cross an exchange — the (doc, bigram) tf
    * aggregation keys on (doc_id, ab, ah), 24-byte rows.
    * `carryTokens=true` (mink's rank window orders by (lp, a, b)):
    * the tf aggregation keeps its string keys, but every join above
    * it runs on the hashes. */
  private def bigramLp(docs: DataFrame, carryTokens: Boolean = true): DataFrame = {
    val ws = docs
      .select(col("doc_id"), Text.wsTokens(col("text")).as("ws"))
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1), i =>
          struct(element_at(col("ws"), i).as("a"),
            element_at(col("ws"), i + 1).as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val tf2 =
      if (carryTokens)
        bg.groupBy(col("doc_id"), col("a"), col("b")).agg(count(lit(1)).as("tf"))
          .withColumn("ab", xxhash64(col("a"), col("b")))
          .withColumn("ah", xxhash64(col("a")))
      else
        bg.select(col("doc_id"), xxhash64(col("a"), col("b")).as("ab"),
            xxhash64(col("a")).as("ah"))
          .groupBy(col("doc_id"), col("ab"), col("ah"))
          .agg(count(lit(1)).as("tf"))
    val cb = tf2.groupBy(col("ab"))
      .agg(sum(col("tf")).as("cb"), min(col("ah")).as("_ah"))
    val cu = cb.groupBy(col("_ah").as("ah")).agg(sum(col("cb")).as("cu"))
    val v = ws.select(explode(col("ws")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val keep = (if (carryTokens) Seq(col("doc_id"), col("a"), col("b"))
                else Seq(col("doc_id"))) ++ Seq(col("tf"),
      round(log((col("cb") + lit(0.5)) / (col("cu") + lit(0.5) * col("v"))), 6)
        .cast("decimal(27,6)").as("_lp"))
    tf2.join(cb.select(col("ab"), col("cb")), Seq("ab"))
      .join(cu, Seq("ah")).crossJoin(broadcast(v))
      .select(keep: _*)
  }

  /** C119 — interpolated Kneser-Ney bigram scoring (Kneser & Ney,
    * ICASSP 1995; the smoothing KenLM implements — i.e. the actual
    * model behind CCNet's perplexity filter, where C39's add-k is the
    * textbook stand-in): P(b|a) = (max(c(a,b) − d, 0) + d · N1+(a·) ·
    * P_cont(b)) / c(a·) with P_cont(b) = N1+(·b) / N1+(··) — the
    * continuation distribution asks "how many CONTEXTS does b follow?"
    * rather than "how often does b occur?", which is what stops
    * high-frequency-but-one-context tokens (the "Francisco" problem)
    * from soaking up backoff mass. Discount d = 0.75, the standard
    * fixed choice.
    *
    * Scale shape = exactly C39's: the per-doc bigram tf table is the
    * only corpus-scale shuffle; corpus bigram counts reduce from it;
    * prefix totals, prefix continuation fan-out N1+(a·), continuation
    * counts N1+(·b), and the bigram-type total all reduce from THOSE
    * (vocabulary²-scale, one hop each, no extra corpus pass). Same
    * 6-place-round + decimal-agg determinism (the ln rides round(·,6),
    * the house libm posture). Self-scored corpus ⇒ every scored bigram
    * has c(a,b) ≥ 1, so the max() never clips here; the backoff term
    * still differentiates KN from MLE on every row. */
  def knLmScoreOn(docs: DataFrame, discount: Double = 0.75,
                  flagBelow: Double = -6.0): DataFrame = {
    require(discount > 0 && discount < 1,
      s"knLmScoreOn: discount in (0,1), got $discount")
    // fixed-width join keys throughout (r16): the KN chain never looks
    // at the token strings after the explode, so they are hashed in the
    // explode projection and never cross an exchange — see [[bigramLp]]
    // for the injectivity/oracle-equivalence argument
    val ws = docs.select(col("doc_id"), Text.wsTokens(col("text")).as("ws"))
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1), i =>
          struct(element_at(col("ws"), i).as("a"),
            element_at(col("ws"), i + 1).as("b")))).as("p"))
      .select(col("doc_id"), xxhash64(col("p.a"), col("p.b")).as("ab"),
        xxhash64(col("p.a")).as("ah"), xxhash64(col("p.b")).as("bh"))
    val tf2 = bg.groupBy(col("doc_id"), col("ab"), col("ah"), col("bh"))
      .agg(count(lit(1)).as("tf"))
    val cb = tf2.groupBy(col("ab")).agg(sum(col("tf")).as("cb"),
      min(col("ah")).as("_ah"), min(col("bh")).as("_bh"))
    val cu = cb.groupBy(col("_ah").as("ah"))
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1p_pre"))
    val cont = cb.groupBy(col("_bh").as("bh")).agg(count(lit(1)).as("n1p_cont"))
    val tt = cb.agg(count(lit(1)).as("tt"))
    tf2.join(cb.select(col("ab"), col("cb")), Seq("ab"))
      .join(cu, Seq("ah")).join(cont, Seq("bh"))
      .crossJoin(broadcast(tt))
      .select(col("doc_id"), col("tf"),
        round(log(
          (greatest(col("cb") - discount, lit(0.0)) +
            lit(discount) * col("n1p_pre") * col("n1p_cont") / col("tt")) /
            col("cu")), 6)
          .cast("decimal(27,6)").as("_lp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        (sum(col("_lp") * col("tf")).cast("double") / sum(col("tf")))
          .as("kn_logprob"))
      .withColumn("flagged", col("kn_logprob") < flagBelow)
      .orderBy("doc_id")
  }

  /** C119 demo — KN-smoothed self-scoring of the document corpus. */
  def knLmScoreDemo(spark: SparkSession, dir: String): DataFrame =
    knLmScoreOn(Tables.documents(spark, dir))

  /** C112 — Min-K% probability (Shi et al. 2024, "Detecting
    * Pretraining Data from Large Language Models"): per document, the
    * mean log-probability of its LOWEST k% token transitions under the
    * corpus LM. The membership/memorization signal behind benchmark
    * decontamination sweeps: a document whose RAREST transitions are
    * still high-probability is one the model (here: the corpus
    * statistics) has effectively seen — averaging over all tokens
    * (C39) washes that out, because even memorized text is mostly
    * ordinary transitions. High mink = suspicious; C39's low-avg flags
    * junk instead.
    *
    * Exact relational form of "lowest k% occurrences": bigram rows
    * carry (tf, lp); sorting by (lp, a, b) per doc and cumsumming tf
    * picks whole bigram groups while they fit and a PARTIAL weight for
    * the group that straddles the cut — weight algebra is all integer
    * (m = max(1, ⌊n·k+ε⌋)), the lp sum decimal-exact, one IEEE
    * division at the end. One shuffle keyed by doc beyond the shared
    * LM build: the rank window, the per-doc totals window, and the
    * final aggregation all share the one doc-keyed exchange. */
  def minkScoreOn(docs: DataFrame, kFrac: Double = 0.2,
                  flagAbove: Double = -3.4): DataFrame = {
    require(kFrac > 0 && kFrac <= 1, s"minkScoreOn: kFrac in (0,1], got $kFrac")
    val lp = bigramLp(docs)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("_lp"), col("a"), col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-doc totals ride a second window over the SAME doc partition
    // spec (r15): the old shape aggregated a separate `n` table and
    // joined it back by doc — which re-ran the whole bigramLp chain
    // (corpus explode + two aggregation levels) a second time and paid
    // a doc-keyed join, for numbers the window partition already holds
    lp.withColumn("cum", sum(col("tf")).over(w))
      .withColumn("n_bigrams",
        sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("m", greatest(lit(1L),
        floor(col("n_bigrams").cast("double") * kFrac + 1e-9).cast("long")))
      .filter(col("cum") - col("tf") < col("m"))
      .withColumn("wt", least(col("tf"), col("m") - (col("cum") - col("tf"))))
      .groupBy(col("doc_id"), col("n_bigrams"), col("m"))
      .agg(sum(col("_lp") * col("wt")).as("_s"))
      .select(col("doc_id"), col("n_bigrams"), col("m"),
        (col("_s").cast("double") / col("m").cast("double")).as("mink_logprob"))
      .withColumn("flagged", col("mink_logprob") > flagAbove)
      .orderBy("doc_id")
  }

  /** C112 demo — min-20% transition probability over the corpus, with
    * PLANTED memorization: every doc with id % 31 == 0 is replaced by
    * one shared high-frequency passage (the same 24 words), so its
    * rare-transition tail is the corpus's most common bigrams and the
    * mink flag fires exactly on the plants. */
  def minkScoreDemo(spark: SparkSession, dir: String): DataFrame =
    minkScoreOn(minkPlanted(spark, dir))

  /** the C112 plant text — SHARED with OracleGen.minkSql so the two
    * sides cannot drift. */
  private[graft] val MinkPassage: String =
    "the quick brown fox jumps over the lazy dog " +
      "and the quick brown fox jumps over the lazy dog again and again"

  /** the C112 fixture: docs with id % 31 == 0 replaced by a shared
    * repeated passage (memorization stand-in; 17 copies at sf0.01). */
  private def minkPlanted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(31)) === 0, lit(MinkPassage))
        .otherwise(col("text")).as("text"))

  /** C113 — SFT packing with loss masks over the C94-validated
    * conversations (capacity 512, shard = conv % 2): per turn, the
    * global token offset, chunk span, and whether the turn trains. */
  def sftPackDemo(spark: SparkSession, dir: String): DataFrame = {
    val turns = sftSynthTurns(Tables.documents(spark, dir))
    val valid = Sft.validateConversations(turns,
        "conv_id", "turn_idx", "role", "content")
      .filter(col("valid")).select("conv_id")
    Sft.packConversations(turns.join(valid, Seq("conv_id"), "left_semi"),
        "conv_id", "turn_idx", "role", "content",
        shardOf = c => pmod(c, lit(2L)), capacity = 512)
      .orderBy("shard", "conv_id", "turn_idx")
  }

  /** C27 — mixture rebalancing: documents sampled to a 3:1:1
    * src0/src1/src2 target composition by deterministic hash
    * thresholding (md5-60 for oracle parity); other sources drop. */
  def sourceMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.sourceMix(Tables.documents(spark, dir), "source", "doc_id",
        Seq("src0" -> 3.0, "src1" -> 1.0, "src2" -> 1.0))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), round(min(col("keep_frac")), 6).as("keep_frac"))
      .orderBy("source")

  /** C50 — exact-phrase blocklist scan: every occurrence of three
    * listed token phrases across the corpus, at token granularity
    * (see [[Filtering.phraseMatches]]). */
  def phraseBlocklistScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val phrases = Seq("the part", "window spark", "customer query line")
      .toDF("phrase")
    Filtering.phraseMatches(Tables.documents(spark, dir), "doc_id", "text", phrases)
      .orderBy("doc_id", "pos", "phrase")
  }

  /** C49 — content-defined chunk dedup: CDC boundaries at
    * hash(token) ≡ 0 (mod 8), every chunk flagged when its hash
    * occurs in ≥ 2 distinct docs — the shift-robust boilerplate scan
    * (see [[Dedup.cdcChunks]]). md5-60 hashing for oracle parity
    * (production default: xxhash64). */
  def cdcChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    // is_dup = "this chunk's hash occurs in ≥ 2 DISTINCT docs", which
    // is exactly min(doc_id) ≠ max(doc_id) over the chunk_hash window
    // — so the dedup half is ONE exchange on the 8-byte hash with a
    // single consumer of the chunking subtree. The previous
    // distinct → groupBy → join formulation read the chunk table twice
    // (a corpus-scale persist) across THREE exchanges; stage-split
    // measurement at sf0.1 priced that half at 0.60 s of the row's
    // 1.34 s wall — the window form removes the persist and two of the
    // exchanges. Skew boundary (documented, not silent): a chunk hash
    // shared by a large fraction of the corpus concentrates its rows
    // in one window group, which AQE cannot split the way it splits a
    // skewed join; at that skew swap back to the agg+join form (whose
    // min/max pre-aggregate map-side) and accept the second chunking
    // pass — boilerplate that hot should be killed by the df-capped
    // chunkDedup path first anyway.
    val byHash = Window.partitionBy(col("chunk_hash"))
    Dedup.cdcChunks(Tables.documents(spark, dir), "doc_id", "text",
        divisor = 8, tokenHash = graft.functions.Vec.md5Hash60)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tokens"), col("chunk_hash"),
        (min(col("doc_id")).over(byHash) =!=
          max(col("doc_id")).over(byHash)).as("is_dup"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** C47 — sliding-window chunking at size 64 / stride 48 (25%
    * overlap, the RAG convention): every doc in overlapping 64-token
    * windows (see [[Packing.chunkOverlap]]). */
  def chunkOverlapDemo(spark: SparkSession, dir: String): DataFrame =
    Packing.chunkOverlap(Tables.documents(spark, dir), "doc_id", "text",
        size = 64, stride = 48)
      .orderBy("doc_id", "chunk_idx")

  /** C48 — symmetric int8 quantization of the embeddings table: 4×
    * smaller vectors with per-vector scale and a bounded
    * reconstruction error (see [[Similarity.quantizeInt8]]). */
  def vecQuantizeDemo(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(spark, dir), "vec_id", "embedding")
      .orderBy("vec_id")

  /** C46 — mutual-kNN graph over the embeddings table: each vector's
    * LSH-restricted top-5 neighbors, symmetrized to the undirected
    * mutual edge set (see [[Similarity.knnGraph]]). The symmetrization
    * persists the ranking internally (r9: moved into the operator so
    * every caller gets the one-computation guarantee). */
  def knnGraphDemo(spark: SparkSession, dir: String): DataFrame =
    Similarity.mutualKnnEdges(
        Similarity.knnGraph(Tables.embeddings(spark, dir),
          "vec_id", "embedding", k = 5, nPlanes = 8, dim = 64))
      .withColumn("sim", round(col("sim"), 6))
      .orderBy("id_a", "id_b")

  /** C68 — PageRank centrality over the C46 mutual-kNN document graph
    * (the in-corpus analog of CCNet-class link-centrality source
    * weighting): undirected edges walked both ways, 6 fixed rounds of
    * [[Graph.pageRank]]'s exact scaled-integer recurrence — one lazy
    * DAG, no per-round driver barrier. Hubs score high (corpus-
    * representative), isolated vectors keep only teleport mass. */
  def pagerankCentrality(spark: SparkSession, dir: String): DataFrame =
    pagerankOverKnn(spark, dir, iters = 6).orderBy("id")

  /** the C68 graph construction + rank recurrence with the round count
    * as the one knob — shared by the demo (6 rounds) and ScaleSmoke's
    * 2×-iterations variant, so the smoke can never silently measure a
    * DIFFERENT graph than the demo it claims to double. */
  private[graft] def pagerankOverKnn(spark: SparkSession, dir: String,
                                     iters: Int): DataFrame = {
    val mut = graft.util.CacheRegistry.register(
      Similarity.mutualKnnEdges(
        Similarity.knnGraph(Tables.embeddings(spark, dir),
          "vec_id", "embedding", k = 5, nPlanes = 8, dim = 64))
        .select(col("id_a"), col("id_b")).persist())
    val directed = mut.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(mut.select(col("id_b").as("src"), col("id_a").as("dst")))
    Graph.pageRank(Tables.embeddings(spark, dir).select(col("vec_id")),
      directed, "vec_id", iters = iters)
  }

  /** C121 — label-propagation communities over the C46 mutual-kNN
    * graph ([[Graph.labelPropagation]], 4 synchronous rounds): the
    * finer-grained companion to C13's connected components — CC merges
    * any touching chain into one blob, LPA keeps densely-linked
    * pockets apart, which is the grouping a topic-pocket sampler or a
    * near-dup REVIEW queue actually wants. Same edge chain as C68 so
    * the oracle reuses the proven kNN CTEs. */
  def labelPropagationDemo(spark: SparkSession, dir: String): DataFrame = {
    val mut = graft.util.CacheRegistry.register(
      Similarity.mutualKnnEdges(
        Similarity.knnGraph(Tables.embeddings(spark, dir),
          "vec_id", "embedding", k = 5, nPlanes = 8, dim = 64))
        .select(col("id_a"), col("id_b")).persist())
    val directed = mut.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(mut.select(col("id_b").as("src"), col("id_a").as("dst")))
    Graph.labelPropagation(Tables.embeddings(spark, dir).select(col("vec_id")),
        directed, "vec_id", iters = 4)
      .select(col("id").as("vec_id"), col("community"))
      .orderBy("vec_id")
  }

  /** C45 — in-engine quality classifier: logistic regression on 1024
    * hashed binary unigram buckets, trained by 12 relational
    * full-batch GD rounds at lr 20, then every doc scored by the
    * trained weights (see [[Classifier]]). The reference-class label here is a
    * marker-token membership (`key` ∈ tokens) — the synthetic corpus
    * has no curated/crawl divide, and a text-derived label makes the
    * learned boundary independently checkable (the demo trains to
    * ~100% accuracy); in production the label is the curated-vs-crawl
    * flag of the GPT-3/CCNet recipe and the operator is label-
    * agnostic. */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    Classifier.logregScore(Tables.documents(spark, dir), "doc_id", "text",
        label = array_contains(Text.wsTokens(col("text")), "key"))
      .orderBy("doc_id")

  /** C81 — calibration curve of the C45 classifier: the trained
    * scores binned at fixed width 0.1, per occupied bin the mean
    * predicted probability vs the empirical positive rate. The demo
    * classifier separates its text-derived class almost perfectly, so
    * the diagram shows exactly two occupied extreme bins with tiny
    * calibration gaps — the shape a threshold-based keep rule wants
    * to see before it trusts the threshold. */
  def qualityCalibration(spark: SparkSession, dir: String): DataFrame =
    Classifier.calibration(
        Classifier.logregScore(Tables.documents(spark, dir), "doc_id", "text",
          label = array_contains(Text.wsTokens(col("text")), "key")),
        "score", "is_target", nBins = 10)
      .orderBy("bin")

  /** C44 — temperature-scaled source mixing at α = 0.5: large groups
    * flatten toward the smallest (f_s = (n_s/n_min)^−0.5), the
    * smallest survives whole — the GPT-3/PaLM multinomial recipe as a
    * deterministic downsample. Mixes by `lang` (the skewed grouping on
    * this corpus — `source` is uniform at sf0.01, which would make
    * every keep_frac 1). */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMix(Tables.documents(spark, dir), "lang", "doc_id",
        alpha = 0.5)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), round(min(col("keep_frac")), 6).as("keep_frac"))
      .orderBy("lang")

  /** C38 — deterministic exact-k per-source sample: the 10 docs per
    * source with the smallest seed-17 hash priorities (uniform,
    * reproducible, redrawn by seed — see [[Sampling.groupSample]]). */
  def groupSampleDemo(spark: SparkSession, dir: String): DataFrame =
    Sampling.groupSample(Tables.documents(spark, dir), "source", "doc_id",
        k = 10, seed = 17)
      .orderBy("source", "rank")

  /** C23 — URL/domain blocklist filter: source URLs synthesized onto
    * the docs (the documents table has no URL column) so Spark and the
    * oracle see identical inputs; every doc from a blocked source
    * domain drops via a broadcast anti-join. */
  def urlBlocklistFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(lit("https://www."), col("source"), lit(".example.com/doc/"),
        col("doc_id").cast("string")).as("url"))
    val blocked = Seq("src3.example.com", "src7.example.com", "src11.example.com")
      .toDF("domain")
    Filtering.urlBlocklist(docs, blocked, "url")
      .select(col("doc_id"), col("source"), col("url"))
      .orderBy("doc_id")
  }

  /** C24 — quantile outlier trim: docs outside the [p05, p95]
    * token-count bounds get flagged (the length filter of corpus
    * cleaning). Bounds are the deterministic interpolated quantiles,
    * broadcast back over the corpus. */
  def outlierBoundsFilter(spark: SparkSession, dir: String): DataFrame =
    Filtering.quantileOutliers(
        Tables.documents(spark, dir)
          .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tokens")),
        "n_tokens", loQ = 0.05, hiQ = 0.95)
      .select(col("doc_id"), col("n_tokens"),
        col("lo_bound"), col("hi_bound"), col("is_outlier"))
      .orderBy("doc_id")

  /** C25 — cross-document repeated-chunk removal ("line dedup"):
    * 8-token chunks occurring in more than 2 distinct docs are dropped
    * everywhere and the text is rebuilt. A shared boilerplate banner is
    * synthesized onto every 10th doc so the corpus actually exercises
    * the drop path; md5-60 chunk hashing for oracle parity (production
    * default: xxhash64). */
  def lineDedup(spark: SparkSession, dir: String): DataFrame = {
    val banner = "subscribe to our newsletter accept all cookies now"
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 10 === 0, concat(lit(banner + " "), col("text")))
        .otherwise(col("text")).as("text"))
    Dedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 8, maxDocs = 2,
        tokenHash = graft.functions.Vec.md5Hash60)
      .orderBy("doc_id")
  }

  /** C31 — dedup survivor selection: the minhash clusters (C13's exact
    * config) scored by whitespace token count; the longest member of
    * each cluster is canonical (ties to the lowest id), everything
    * else is the drop set. */
  def dedupCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
      tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = false)
    val clusters = Dedup.connectedComponents(docs, pairs, "doc_id")
    Dedup.canonicalPerCluster(clusters,
        docs.select(col("doc_id"), Text.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens")
      .orderBy("doc_id")
  }

  /** C32 — deterministic training-order shuffle: a seed-keyed
    * pseudo-random permutation of the corpus WITHOUT a global sort —
    * hash the id with the seed, shard by the hash, order within the
    * shard. Reading shards in (shard, pos) order replays the exact
    * epoch order on any cluster size; reshuffling is a seed change.
    * md5-60 keys for oracle parity (production: xxhash64). */
  def trainingShuffle(spark: SparkSession, dir: String): DataFrame = {
    val seed = "42"
    val key = graft.functions.Vec.md5Hash60(
      concat(col("doc_id").cast("string"), lit("_" + seed)))
    val byShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), key.as("k"))
      .withColumn("shard", pmod(col("k"), lit(8L)))
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")
  }

  /** C33 — the training-prep TAIL end-to-end (the publish twin of C29's
    * cleaning pipeline): dedup survivor selection (C31, minhash
    * clusters scored by length) → seed-keyed epoch shuffle of the
    * survivors (C32) → concat-and-chunk packing of the survivor token
    * stream in epoch order (C22). Each stage is independently oracled;
    * this row proves the COMPOSITION stays value-exact — survivors
    * feed the shuffle, the shuffle's (shard, pos) drives the pack
    * cumsum, and a drift anywhere (a lost survivor, a reordered pack)
    * shifts every downstream offset and fails the hash gate. Scale
    * shape is inherited: cluster-bounded rank window, sort-free
    * hash sharding, per-shard pack cumsum — no stage adds a global
    * sort or corpus-scale cache. */
  def trainingPrepTail(spark: SparkSession, dir: String): DataFrame = {
    val survivors = dedupCanonicalize(spark, dir)
      .filter(col("is_canonical"))
      .select(col("doc_id"), col("n_tokens"))
    val key = graft.functions.Vec.md5Hash60(
      concat(col("doc_id").cast("string"), lit("_42")))
    val byShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    val epoch = survivors
      .withColumn("k", key)
      .withColumn("shard", pmod(col("k"), lit(8L)))
      .withColumn("pos", row_number().over(byShard).cast("long"))
    // doc_id rides through the pack as a carry column: joining the
    // packed result back to `epoch` would execute the canonicalize
    // fixpoint subtree twice (once per join side)
    Packing.sequencePack(
        epoch.select(col("shard"), col("pos"), col("n_tokens"), col("doc_id")),
        "shard", "pos", "n_tokens", capacity = 2048, carryCols = Seq("doc_id"))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        col("start_off"), col("first_chunk"), col("last_chunk"), col("n_chunks"))
      .orderBy("doc_id")
  }

  /** C30 — exact duplicate-span detection (Lee et al. substring dedup):
    * 8-token sliding windows shared by ≥2 distinct docs, merged into
    * maximal per-doc token intervals. md5-60 window hashing for oracle
    * parity (production default: xxhash64). */
  def dupSpanDetect(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpans(Tables.documents(spark, dir), "doc_id", "text",
        k = 8, minDocs = 2, tokenHash = graft.functions.Vec.md5Hash60)
      .orderBy("doc_id", "span_start")

  /** C30b — the scrub half: duplicated spans removed, text rebuilt
    * order-preserving, every doc kept (empty when fully duplicated). */
  def dupSpanScrub(spark: SparkSession, dir: String): DataFrame =
    Dedup.scrubDuplicateSpans(Tables.documents(spark, dir), "doc_id", "text",
        k = 8, minDocs = 2, tokenHash = graft.functions.Vec.md5Hash60)
      .orderBy("doc_id")

  /** C83 — surgical decontamination over the C21 fixture: the %20
    * slice is the benchmark, the rest is training; every verbatim
    * 8-gram overlap with the benchmark located per training doc as
    * maximal token intervals. */
  def contaminationSpansDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.contaminationSpans(
        docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 20 === 0), "text",
        k = 8, tokenHash = graft.functions.Vec.md5Hash60)
      .orderBy("doc_id", "span_start")
  }

  /** C83b — the scrub half: the leaked benchmark text removed, the
    * rest of every training doc kept (vs C21's drop-the-doc flag). */
  def contaminationScrubDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.scrubContamination(
        docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 20 === 0), "text",
        k = 8, tokenHash = graft.functions.Vec.md5Hash60)
      .orderBy("doc_id")
  }

  /** C40 — SemDeDup semantic deduplication over the embeddings table:
    * label-bootstrap clusters (the oracle-exact configuration, as
    * C14/C34; kmeansFit is the self-trained path), within-cluster
    * near-dups at cosine ≥ 0.25 (the top ~1% of within-cluster pair
    * sims on this corpus) resolved by the paper's
    * keep-the-least-central rule. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(spark, dir),
        "vec_id", "embedding", "label", threshold = 0.25)
      .orderBy("vec_id")

  /** C41 — DSIR importance weights with English as the target domain:
    * every doc scored by Σ_f ln(p_en(f)/p_raw(f)) over 1024 hashed
    * unigram buckets. English docs should tilt positive, the rest
    * negative — the selection signal DSIR resamples by. */
  def dsirScore(spark: SparkSession, dir: String): DataFrame =
    Curation.dsirScore(Tables.documents(spark, dir), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 1024)
      .orderBy("doc_id")

  /** C42 — winnowing fingerprints (MOSS): 4-token grams, window 5 —
    * any shared run of ≥ 8 tokens between documents is guaranteed a
    * shared fingerprint at ~1/5 the storage of the full window set. */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    Curation.winnowFingerprints(Tables.documents(spark, dir),
        "doc_id", "text", k = 4, w = 5)
      .orderBy("doc_id", "pos")

  /** C58 — keep-best dedup: the minhash-LSH connected components of
    * C13, refined from "keep the smallest id" to "keep the
    * highest-quality member" (argmax [[Text.qualityScore]], ties to
    * the smallest doc_id). The cluster labels and scores are both
    * id-keyed 16-byte tables; the struct-max aggregate reduces
    * map-side, so no window ever collects a cluster (see
    * [[Dedup.clusterRepresentatives]]). */
  def clusterRepresentative(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
      tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = false)
    val clusters = Dedup.connectedComponents(docs, pairs, "doc_id")
    val scored = docs.select(col("doc_id"),
      Text.qualityScore(col("text")).as("score"))
    Dedup.clusterRepresentatives(clusters, scored, "doc_id", "score")
      .withColumnRenamed("rep_id", "rep_doc_id")
      .orderBy("cluster")
  }

  /** C60 — corpus heavy hitters: the 25 most frequent word trigrams
    * with occurrence and document counts — the boilerplate radar every
    * crawl pipeline runs (a trigram in 30% of documents is a nav bar,
    * not language). Shape: the codegen'd shingler explodes the scan,
    * the count is map-side-combinable on the trigram key, and the
    * global top-25 rides TakeOrdered (per-partition top-25, driver
    * merge) — no full sort, no single-task collapse. The exact
    * distinct-doc count adds one Expand pass (count + count-distinct
    * in one agg); at 100 TB swap in approx_count_distinct and drop the
    * Expand — noted, not silently capped. */
  def topkNgrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(call_function("graft_shingles",
        col("text"), lit(3), lit(false))).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(25)

  /** C61 — PMI collocations: word pairs that co-occur as bigrams far
    * more often than independence predicts, ranked by the PMI RATIO
    * n·c(a,b) / (c(a)·c(b)) (the log is monotone — reporting the
    * rational keeps every value an exact-int IEEE division any engine
    * reproduces bit-for-bit). Min support 5 kills the noise floor.
    * Shape: bigram and unigram counts are two map-side-combined
    * aggregations of one tokenized scan; the two count joins key on
    * words (vocab-scale tables, Zipf-headed — AQE handles the skewed
    * head), and the total-token count is a one-row broadcast. */
  def pmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(call_function("graft_shingles",
        col("text"), lit(2), lit(false))).as("bigram"))
    val pairs = toks.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
      .select(substring_index(col("bigram"), " ", 1).as("w1"),
        substring_index(col("bigram"), " ", -1).as("w2"), col("c_ab"))
    val words = Tables.documents(spark, dir)
      .select(explode(Text.wsTokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val total = words.agg(sum(col("c_w")).as("n_total"))
    pairs
      .join(words.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
      .join(words.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_ab"),
        ((col("c_ab") * col("n_total")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")).as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1"), col("w2"))
      .limit(25)
  }

  /** C62 — dataset card: the per-(source, language) mixture table
    * every corpus release documents — doc counts, token mass, char
    * bounds, and each cell's share of the corpus token budget (the
    * number source_mix/temperature_mix consume as input). One
    * map-side-combined aggregation of one scan; the corpus total joins
    * back as a one-row broadcast, so the share column costs no second
    * scan. All ratios are exact-int IEEE divisions. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        Text.tokenCount(col("text")).as("ws_tokens"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("sum_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
    val total = per.agg(sum(col("sum_tokens")).as("corpus_tokens"))
    per.crossJoin(broadcast(total))
      .withColumn("token_share",
        col("sum_tokens").cast("double") / col("corpus_tokens").cast("double"))
      .drop("corpus_tokens")
      .orderBy("source", "lang")
  }

  /** C66 — LSH quality evaluation: measured precision/recall of the
    * C2 minhash-LSH configuration against EXACT shingle Jaccard
    * ground truth — the "measure, don't guess" companion to
    * [[Dedup.lshTune]]'s analytic S-curve (the tuner predicts the
    * banding's selectivity; this row measures it on the corpus).
    * Ground truth is relational, not quadratic: only pairs SHARING a
    * shingle can have Jaccard > 0, so the candidate universe is the
    * shingle self-join.
    *
    * **Hot-shingle df cap (the 100 TB guard, measured not prose).** A
    * boilerplate shingle with document frequency d mints d·(d−1)/2
    * candidate pairs — THE quadratic blowup of the truth self-join at
    * scale — while certifying almost nothing: sizes stay exact under
    * the cap and intersections only lose hot shingles, so the capped
    * Jaccard ĵ of a pair sharing h hot shingles with union u obeys
    * j − h/u ≤ ĵ ≤ j. Every true pair whose similarity is carried by
    * ≥ t·u non-hot shingles survives; a missed pair must owe more
    * than (j−t)·u of its intersection to shingles hot across the
    * whole corpus — boilerplate glue, which dedup exists to ignore.
    * The row measures BOTH truths in one self-join (df rides the left
    * side; the capped intersection is a conditional count, so the cap
    * costs one df aggregation, not a second join): `df_cap` =
    * max(5, n_docs/100), `n_hot` shingles capped, and
    * precision/recall against each truth. At production scale the
    * capped universe joins only kept shingles — the hot rows never
    * enter the shuffle. One summary row; exact-int IEEE divisions. */
  def minhashLshEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // The truth side works over 64-bit HASHES of the shingles, not the
    // shingle strings (r15): per-doc shingle sets are distinct, so an
    // injective map leaves sizes, intersections, df and every count
    // identical — and xxhash64 at 2⁻⁶⁴ collision odds is injective on
    // any real corpus (the gate re-proves it: the DuckDB oracle
    // computes the same row FROM THE STRINGS and the hashes must still
    // match). This is also the standard at-scale representation: the
    // self-join is THE shuffle of this row, and 8-byte fixed-width
    // keys exchange, hash-partition, compare and aggregate for a
    // fraction of a UTF8 string's cost (measured 8.1 → 3.5 s warm on
    // this row). Still NOT persisted (the r14 measurement stands): the
    // explode+hash is a cheap codegen map, and a persisted table's
    // four consumers are independent AQE stages that race to fill the
    // cold cache — recompute is both cheaper and race-free.
    val sh = docs.select(col("doc_id"), explode(call_function("graft_shingles",
        col("text"), lit(3), lit(true))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val nD = docs.agg(count(lit(1)).as("n_docs"))
      .select(greatest(lit(5L), expr("n_docs div 100")).as("df_cap"))
    val dfTab = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // the self-join sides, the df attach and the size attaches are all
    // CORPUS-scale — they must NEVER broadcast, at any scale. Spark's
    // size estimate is blind after the explode+hash (guide §3.1:
    // "estimates are often badly wrong after filters or UDFs"), and at
    // the 10× smoke it estimated the exploded shingle table under the
    // broadcast threshold and shipped GIGABYTES as a hashed relation —
    // SparkOutOfMemoryError (r16, caught by adding this row to
    // ScaleSmoke). `shuffle_hash` hints pin the shuffled hash strategy (guide §3.1:
    // per-partition builds, no corpus sort, no driver-side relation), and AQE's skew-join can split a hot shingle's
    // partition, which a broadcast join never could. The one-row
    // aggregates keep their broadcasts.
    val inter = sh.select(col("doc_id").as("id_a"), col("sh"))
      .join(dfTab.hint("shuffle_hash"), Seq("sh"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh")).hint("shuffle_hash"), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .crossJoin(broadcast(nD))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("i"),
        sum(when(col("df") <= col("df_cap"), 1L).otherwise(0L)).as("ic"))
    val both = inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sza")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("szb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") /
          (col("sza") + col("szb") - col("i")).cast("double") >= 0.25).as("t_u"),
        (col("ic").cast("double") /
          (col("sza") + col("szb") - col("ic")).cast("double") >= 0.25).as("t_c"))
    val truth = both.filter(col("t_u")).select(col("id_a"), col("id_b"))
    val truthC = both.filter(col("t_c")).select(col("id_a"), col("id_b"))
    val pred = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
        tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = false)
      .select(col("id_a"), col("id_b"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val nTruthC = truthC.agg(count(lit(1)).as("n_truth_capped"))
    val nPred = pred.agg(count(lit(1)).as("n_pred"))
    val nHit = pred.join(truth, Seq("id_a", "id_b")).agg(count(lit(1)).as("n_hit"))
    val nHitC = pred.join(truthC, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_hit_capped"))
    val nHot = dfTab.crossJoin(broadcast(nD)).filter(col("df") > col("df_cap"))
      .agg(count(lit(1)).as("n_hot"))
    nTruth.crossJoin(nPred).crossJoin(nHit)
      .crossJoin(nTruthC).crossJoin(nHitC).crossJoin(nHot).crossJoin(nD)
      .select(
        col("n_truth"), col("n_pred"), col("n_hit"),
        when(col("n_pred") > 0,
          col("n_hit").cast("double") / col("n_pred").cast("double"))
          .otherwise(0.0).as("precision"),
        when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth").cast("double"))
          .otherwise(0.0).as("recall"),
        col("df_cap"), col("n_hot"), col("n_truth_capped"), col("n_hit_capped"),
        when(col("n_pred") > 0,
          col("n_hit_capped").cast("double") / col("n_pred").cast("double"))
          .otherwise(0.0).as("precision_capped"),
        when(col("n_truth_capped") > 0,
          col("n_hit_capped").cast("double") / col("n_truth_capped").cast("double"))
          .otherwise(0.0).as("recall_capped"))
  }

  /** C65 — main-content extraction (boilerplate removal): each doc
    * wrapped into a synthetic page — anchor-dense nav, two content
    * paragraphs, anchor-dense footer (the C23/C55 synthesis
    * convention) — then the jusText-style block gate recovers the
    * article text: block split, visible-length + link-density
    * scoring, short/link-heavy blocks dropped (see
    * [[graft.functions.Html.mainContent]]). Map-only Column algebra;
    * the oracle rebuilds the same page and applies the same regex
    * algebra. */
  def htmlMainContent(spark: SparkSession, dir: String): DataFrame = {
    val page = concat(
      lit("<div><a href=\"/\">Start here</a> <a href=\"/a\">About us</a> " +
        "<a href=\"/c\">Contact page</a> <a href=\"/l\">Member login</a></div>"),
      lit("<p>"), expr("substr(text, 1, CAST(n_chars div 2 AS INT))"),
      lit("</p><p>"), expr("substr(text, CAST(n_chars div 2 AS INT) + 1)"),
      lit("</p>"),
      lit("<div><a href=\"/p\">Privacy policy</a> <a href=\"/t\">Terms of use</a></div>"))
    val mc = graft.functions.Html.mainContent(page)
    Tables.documents(spark, dir).select(
        col("doc_id"), mc.getField("main_text").as("main_text"),
        mc.getField("n_blocks").as("n_blocks"),
        mc.getField("n_kept").as("n_kept"))
      .orderBy("doc_id")
  }

  /** C59 — integer-exact JL sign projection of the embeddings table:
    * 64 floats → 16 longs, map-only (see
    * [[Similarity.randProjectInt]]). */
  def randProjReduce(spark: SparkSession, dir: String): DataFrame =
    Similarity.randProjectInt(Tables.embeddings(spark, dir),
        "vec_id", "embedding", dim = 64, outDim = 16)
      .orderBy("vec_id")

  /** C63 — PCA reduction of the embeddings table: one VecGram moment
    * pass fits the 8-component basis (driver-side Jacobi on the 64×64
    * covariance), then a map-only codegen'd projection. Rounded to 6
    * places for display stability; the spec checks the exact
    * contract (orthonormality, variance accounting, projection ==
    * naive driver math). */
  def pcaReduce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val model = Similarity.pcaFit(emb, "embedding", dim = 64, k = 8)
    val proj = Similarity.pcaProject(emb, "vec_id", "embedding", model)
    proj.select(col("vec_id") +:
        (0 until 8).map(j => round(col(s"p$j"), 6).as(s"p$j")): _*)
      .orderBy("vec_id")
  }

  /** C84 — exact set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family, [[SetSim.prefixJaccardJoin]]): EVERY pair
    * of documents whose distinct 3-shingle sets meet Jaccard >= 0.5,
    * exactly — the guaranteed-recall complement to the MinHash sketch
    * (C2), priced by rarity-ordered prefixes instead of banding.
    * md5-60 shingle hashes for oracle parity (production: xxhash64). */
  def setsimJoin(spark: SparkSession, dir: String): DataFrame =
    SetSim.prefixJaccardJoin(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.5, shingleN = 3)
      .orderBy("id_a", "id_b")

  /** C85 — token-budget greedy selection
    * ([[Sampling.budgetSelect]]): the best-quality documents, in
    * (score desc, doc_id) order, until 25% of the corpus's tokens are
    * spent. The cumulative sum runs as the scalable two-phase
    * range-partitioned scan, not a single-task global window. */
  def budgetSelectDemo(spark: SparkSession, dir: String): DataFrame =
    Sampling.budgetSelect(Tables.documents(spark, dir), "doc_id",
        Text.qualityScore(col("text")), Text.tokenCount(col("text")),
        budgetFrac = 0.25)
      .orderBy("cum_tokens")

  /** C86 — margin-based bitext mining ([[BitextMine.mine]], the
    * Artetxe & Schwenk ratio margin): English documents as the source
    * side, every other language as the target side, best target per
    * source where the pair stands out of BOTH k=4 cosine
    * neighborhoods at margin >= 1.1. */
  def bitextMineDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val joined = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), docs("lang"), emb("embedding"))
    BitextMine.mine(joined.filter(col("lang") === "en"),
        joined.filter(col("lang") =!= "en"), "doc_id", "embedding",
        k = 4, marginThreshold = 1.1)
      .orderBy("src_id")
  }

  /** C86's corpus-scale form ([[BitextMine.mineAnn]]): the same
    * margin algebra over LSH-bucketed candidates instead of the cross
    * product — bench/smoke surface (LSH buckets have no SQL mirror;
    * the exhaustive demo above carries the oracle row, and
    * BitextMineSpec pins mineAnn ≡ mine at full probe width). */
  def bitextMineAnn(spark: SparkSession, dir: String): DataFrame =
    bitextMineAnnAt(spark, dir, probeBits = 2)

  /** C86's scale form ORACLE-GATED at full probe width (r14 verdict
    * task 4, the r12 geocode_provider_chain trick): probeBits =
    * nPlanes makes the multi-probe Hamming ball enumerate every
    * bucket, the deduped candidate set is exactly src × tgt, and
    * [[BitextMine.mineAnn]]'s output equals [[BitextMine.mine]]'s —
    * so the production code path (probe explode, bucket join, pair
    * dedup, margin algebra) answers the bitext_mine oracle VERBATIM.
    * The pruned probeBits=2 point stays the smoke/bench surface for
    * the candidate-narrowing claim. */
  def bitextMineAnnFull(spark: SparkSession, dir: String): DataFrame =
    bitextMineAnnAt(spark, dir, probeBits = 8)

  private def bitextMineAnnAt(spark: SparkSession, dir: String,
                              probeBits: Int): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val joined = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), docs("lang"), emb("embedding"))
    BitextMine.mineAnn(joined.filter(col("lang") === "en"),
        joined.filter(col("lang") =!= "en"), "doc_id", "embedding",
        k = 4, marginThreshold = 1.1, nPlanes = 8, dim = 64,
        probeBits = probeBits)
      .orderBy("src_id")
  }

  /** C87 — anchor-text aggregation ([[Anchors.anchorAgg]]): pages
    * synthesized onto the docs (the C55 convention) with THREE anchors
    * each — a tracking-params/mixed-case form, a trailing-slash form,
    * and a fragment form (fragment stripped; its target differs from
    * the first's by scheme and the kept q param) — inverted into
    * per-canonical-target anchor profiles (total anchors, distinct
    * texts, top-3 texts by count). */
  def anchorAggDemo(spark: SparkSession, dir: String): DataFrame = {
    val i = col("doc_id")
    val firstTok = coalesce(element_at(Text.wsTokens(col("text")), 1), lit("x"))
    val html = concat(
      lit("<div><a href='HTTP://Example.COM/t/"), (i % 97).cast("string"),
      lit("?utm_source=x&q=1'>link &amp; "), col("source"), lit("</a> "),
      lit("<a href=\"https://example.com/t/"), ((i * 7) % 97).cast("string"),
      lit("/\">"), firstTok, lit("</a> "),
      lit("<a href='https://example.com/t/"), (i % 97).cast("string"),
      lit("#frag'>read more</a></div>"))
    Anchors.anchorAgg(
        Tables.documents(spark, dir).select(html.as("html")), "html", m = 3)
      .orderBy("target_url")
  }

  /** C88 — Matryoshka truncation evaluation
    * ([[Similarity.matryoshkaEval]]): recall@5 of serving only the
    * first 16/32 dims of the 64-dim embeddings, against the full-dim
    * truth (the %97 query slice, the retrieval_eval convention);
    * dim=64 rides along as the recall=1 sanity row. */
  def matryoshkaEvalDemo(spark: SparkSession, dir: String): DataFrame =
    Similarity.matryoshkaEval(Tables.embeddings(spark, dir),
        "vec_id", "embedding", dims = Seq(16, 32, 64), fullDim = 64,
        k = 5, queryPred = col("vec_id") % 97 === 0)
      .orderBy("dim")

  /** C89 — robots.txt gating ([[Robots.gate]]): per-source robots
    * bodies synthesized onto the doc corpus (even-numbered sources
    * publish a plain private/tmp/search policy, odd ones add a short
    * `Disallow: /p` that outranks nothing but catches /pub), URLs
    * spread over five path families so every precedence rule fires:
    * longest-match Disallow, the longer Allow carve-out winning over
    * it, the no-rule default, a `Disallow: /search?` rule that only
    * matches because rules see path+QUERY, a lowercase+inline-comment
    * directive parsing anyway, and non-rule lines (Crawl-delay, empty
    * Allow) dropping in the parse. */
  def robotsGateDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val even = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") % 2 === 0
    val content = concat(lit("User-agent: *\nDisallow: /private\n" +
        "Allow: /private/ok\ndisallow: /tmp # scratch space\n" +
        "Disallow: /search?\nAllow:\nCrawl-delay: 5"),
      when(even, lit("")).otherwise(lit("\nDisallow: /p")))
    val robots = docs.select(col("source")).distinct()
      .select(concat(col("source"), lit(".example.com")).as("domain"),
        content.as("content"))
    val i = col("doc_id")
    val path = when(i % 5 === 0, concat(lit("/private/doc"), i.cast("string")))
      .when(i % 5 === 1, concat(lit("/private/ok/doc"), i.cast("string")))
      .when(i % 5 === 2, concat(lit("/pub/doc"), i.cast("string")))
      .when(i % 5 === 3, concat(lit("/tmp/x"), i.cast("string")))
      .otherwise(concat(lit("/search?q="), i.cast("string")))
    val urls = docs.select(
      concat(lit("https://"), col("source"), lit(".example.com"), path).as("url"))
    Robots.gate(urls, Robots.parseRules(robots, "domain", "content"), "url")
      .orderBy("url")
  }

  /** C84's incremental R-S form ([[SetSim.prefixJaccardJoinRS]]): the
    * %7 slice as today's ingest batch probed against the rest as the
    * landed corpus — pairs (batch, corpus) only, index-side token
    * frequencies as the shared rarity dictionary. */
  def setsimJoinRs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    SetSim.prefixJaccardJoinRS(docs.filter(col("doc_id") % 7 === 0),
        docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
        threshold = 0.5, shingleN = 3)
      .orderBy("id_a", "id_b")
  }

  /** C63's SQL-expressible half under the DuckDB gate: the FIT stays
    * spec-gated (eigendecomposition has no SQL mirror — PcaSpec pins
    * it against hand math and known eigenpairs), but the PROJECTION
    * against a fitted basis is literal algebra, so the fitted
    * components interpolate into the oracle exactly as
    * [[randProjReduce]] interpolates its ±1 matrix. The demo records
    * the model for [[graft.oracle.OracleGen.pcaProjectSql]];
    * `Verify` dumps oracle SQL AFTER queries run, so the recorded
    * basis is the one this row's parquet was computed with. The
    * oracle then verifies bit-for-bit what production relies on: the
    * centered codegen'd float-dot projection (ordered double fold,
    * exact float→double widening, round 6). */
  def pcaProjectOracle(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val model = Similarity.pcaFit(emb, "embedding", dim = 64, k = 8)
    graft.oracle.OracleGen.recordPcaModel(model)
    Similarity.pcaProject(emb, "vec_id", "embedding", model)
      .select(col("vec_id") +:
        (0 until 8).map(j => round(col(s"p$j"), 6).as(s"p$j")): _*)
      .orderBy("vec_id")
  }

  /** C98 — token-balanced shard layout ([[Sampling.shardBalance]]):
    * the doc corpus split into 8 contiguous shards of near-equal
    * token mass, with per-shard counts, id ranges, and the relative
    * deviation from ideal a trainer reads before wiring one worker
    * per shard. */
  def shardBalanceDemo(spark: SparkSession, dir: String): DataFrame =
    Sampling.shardBalance(Tables.documents(spark, dir), "doc_id",
        Text.tokenCount(col("text")), nShards = 8)
      .orderBy("shard")

  /** C101 demo: 200 documents drawn ∝ a length-derived integer weight
    * (1 + n_chars/100, clamped to the default 64-ticket grid) — the
    * "sample the corpus toward long documents" draw, determinstic to
    * the bit (the race keys are md5 tickets both engines recompute). */
  def weightedSampleDemo(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(Tables.documents(spark, dir), "doc_id",
      lit(1L) + expr("n_chars div 100"), m = 200)

  /** C100 — the per-source duplication scorecard every corpus release
    * publishes next to its size table: per source, the doc count, how
    * many docs share an EXACT text hash with another doc (C1's
    * algebra), how many participate in a NEAR-dup pair (C2's minhash
    * banding at the library config), and the two rates — the number
    * that tells you which ingest feed is re-crawling itself before
    * you pay to train on it (C62's dataset card reports shares and
    * sizes; this reports redundancy). Dup-id sets are pair-scale, so
    * the joins back to the corpus carry small broadcastable sides;
    * the corpus aggregates once by source. Exact-int IEEE rates. */
  def dupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val multi = Dedup.exactByHash(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).select(col("text_hash"))
    val exactIds = docs.select(col("doc_id"), md5(col("text")).as("text_hash"))
      .join(multi, Seq("text_hash"))
      .select(col("doc_id")).withColumn("is_exact", lit(true))
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
      tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = false)
    val nearIds = pairs.select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct().withColumn("is_near", lit(true))
    docs.select(col("doc_id"), col("source"))
      .join(exactIds, Seq("doc_id"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("is_exact"), 1L)), lit(0L)).as("n_exact_dup"),
        coalesce(sum(when(col("is_near"), 1L)), lit(0L)).as("n_near_dup"))
      .select(col("source"), col("n_docs"), col("n_exact_dup"), col("n_near_dup"),
        (col("n_exact_dup").cast("double") / col("n_docs").cast("double"))
          .as("exact_rate"),
        (col("n_near_dup").cast("double") / col("n_docs").cast("double"))
          .as("near_rate"))
      .orderBy("source")
  }

  /** C99 — the hyperplane-LSH recall/cost curve, C97's twin for the
    * OTHER ANN index: recall@5 vs the brute truth and the exact
    * corpus-fraction scanned per probeBits ∈ {0, 1, 2, 8} on the
    * 8-plane index — the measurement behind C6's probe knob (C76's
    * eval row showed the 1-probe config near zero recall at this
    * scale; this row prices the remedy instead of guessing it).
    * probeBits = nPlanes probes every one of the 2⁸ buckets and rides
    * as the sanity row — recall and scan_frac both exactly 1.0. The
    * XOR probe masks are distinct, so probed buckets per query are
    * distinct by construction and the scan cost is the plain sum of
    * probed bucket sizes; the bucket index builds ONCE (persisted,
    * the lshBucketTable serve discipline) and every probe width
    * reuses it. One row per width; exact-int IEEE divisions.
    *
    * ONE probe pass, not four (r15 — the same fusion the r13 ivf
    * twin got, here in Hamming space): width pb's probe set is
    * EXACTLY the buckets within Hamming distance pb of the query's
    * bucket, the probe sets nest across widths, and truth is the
    * global top-5 under the SAME (sim, id) total order the probed
    * top-5 uses — so a truth pair is retrieved at width pb iff
    * hamming(query bucket, candidate bucket) <= pb (probed ⊆ corpus
    * can only IMPROVE a truth pair's rank). Every width's hit count
    * is then one conditional sum over truth rows tagged with that
    * Hamming distance, and every width's scan cost one conditional
    * sum over the (query × occupied-bucket) distance table — the
    * per-width lshTopKWithIndex re-plans (4 probe joins + 4 bounded
    * top-k passes + 4 truth joins, 78 jobs measured) collapse into
    * two tiny aggregates. Gated: LshRecallCurveSpec's full-width
    * sanity, monotonicity, and independent pb=1 agreement pins, plus
    * the unchanged DuckDB mirror of the literal per-width sweep. */
  def lshRecallCurve(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = graft.util.CacheRegistry.register(emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")).persist())
    val corpus = graft.util.CacheRegistry.register(emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv")).persist())
    val index = graft.util.CacheRegistry.register(
      Similarity.lshBucketTable(corpus, nPlanes = 8, dim = 64).persist())
    val truth = graft.util.CacheRegistry.register(
      Similarity.bruteTopK(queries, corpus, k = 5)
        .select(col("query_id"), col("cand_id")).persist())
    val widths = Seq(0, 1, 2, 8)
    val bSizes = index.groupBy(col("bucket")).agg(count(lit(1)).as("n_cand"))
    val nQ = queries.agg(count(lit(1)).as("n_q"))
    val nC = corpus.agg(count(lit(1)).as("n_c"))
    val planes = graft.functions.Vec.hyperplanes(8, 64)
    val qb = queries.select(col("query_id"),
      graft.functions.Vec.lshBucket(col("qv"), planes).as("qb"))
    // each truth pair tagged with its retrieval width = the Hamming
    // distance between its query's and its candidate's bucket
    val truthHd = truth
      .join(index.select(col("cand_id"), col("bucket")), Seq("cand_id"))
      .join(qb, Seq("query_id"))
      .select(bit_count(col("qb").bitwiseXOR(col("bucket"))).as("hd"))
    val hits = truthHd.agg(
      count(lit(1)).as("n_truth"),
      widths.map(pb => coalesce(sum(when(col("hd") <= pb, 1L).otherwise(0L)),
        lit(0L)).as(s"_h$pb")): _*)
    // scan cost per width: occupied buckets within pb of each query
    val scans = qb.crossJoin(bSizes)
      .select(bit_count(col("qb").bitwiseXOR(col("bucket"))).as("hd"), col("n_cand"))
      .agg(
        coalesce(sum(when(col("hd") <= widths.head, col("n_cand"))
          .otherwise(0L)), lit(0L)).as(s"_s${widths.head}"),
        widths.tail.map(pb => coalesce(sum(when(col("hd") <= pb, col("n_cand"))
          .otherwise(0L)), lit(0L)).as(s"_s$pb")): _*)
    // all four width rows explode out of the ONE joined summary row —
    // a per-width union would re-evaluate the join chain per branch
    hits.crossJoin(scans).crossJoin(nQ).crossJoin(nC)
      .select(explode(array(widths.map { pb =>
        struct(lit(pb).as("probe_bits"), col("n_truth"),
          col(s"_h$pb").as("n_hits"),
          when(col("n_truth") > 0,
            col(s"_h$pb").cast("double") / col("n_truth").cast("double"))
            .otherwise(0.0).as("recall"),
          (col(s"_s$pb").cast("double") /
            (col("n_q") * col("n_c")).cast("double")).as("scan_frac"))
      }: _*)).as("r"))
      .select(col("r.probe_bits"), col("r.n_truth"), col("r.n_hits"),
        col("r.recall"), col("r.scan_frac"))
      .orderBy("probe_bits")
  }

  /** C97 — the IVF recall/cost curve: recall@5 against the brute
    * exact truth AND the exact fraction of the corpus scanned, per
    * nprobe ∈ {1, 2, 4, 10} — the measurement that picks the nprobe
    * knob (C15b fixes nprobe=1; C82's starvation remedy says "raise
    * nprobe" — this row prices that advice), completing the eval
    * family: C66/C90 measure the dedup sketches, C88 the serving
    * dims, this the posting-list probe width. nprobe=10 probes every
    * cluster and rides as the sanity row: recall and scan_frac both
    * exactly 1.0 — IVF at full probe width IS brute force, measured.
    *
    * ONE probe pass, not four (the r12 verdict's 12.6× row): the
    * probed-cluster sets nest across widths, so each truth hit is
    * tagged with the MIN nprobe that retrieves it — the rank of its
    * candidate's cluster in the query's centroid ordering. That rank
    * decides membership exactly because truth IS the global top-5
    * under the same (sim, cand_id) total order the probe ranking
    * uses: a truth pair whose cluster is probed ranks at least as
    * high among the probed subset as globally, so it is ALWAYS in
    * the probed top-5 (IvfRecallCurveSpec proves the identity
    * against the literal per-width ivfTopK sweep). All four widths'
    * hit and scan counts then fall out of one conditional aggregate
    * over (truth ⋈ cluster rank) and (cluster rank ⋈ posting sizes)
    * — truth computes once (brute top-5, persisted), the centroid
    * ranking is queries × clusters (dimension-scale), and no width
    * ever re-probes the corpus. One row per nprobe (inline of one
    * aggregated row — a single job); exact-int IEEE divisions. */
  def ivfRecallCurve(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = graft.util.CacheRegistry.register(emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")).persist())
    val corpus = graft.util.CacheRegistry.register(emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("label"))
      .persist())
    val cents = Similarity.ivfCentroids(emb, "embedding", "label")
    val truth = Similarity.bruteTopK(queries, corpus, k = 5)
      .select(col("query_id"), col("cand_id"))
    // every cluster ranked per query (nprobe = MaxValue keeps all ranks;
    // the table is queries × clusters — dimension-scale, broadcastable)
    val ranked = graft.util.CacheRegistry.register(
      Similarity.ivfAssignN(queries, cents, nprobe = Int.MaxValue)
        .select(col("query_id"), col("label"), col("probe_rank")).persist())
    val labelSizes = corpus.groupBy(col("label")).agg(count(lit(1)).as("n_cand"))
    val probes = Seq(1, 2, 4, 10)
    // per truth pair: the min nprobe that retrieves it (see scaladoc)
    val truthRank = truth
      .join(corpus.select(col("cand_id"), col("label")), "cand_id")
      .join(broadcast(ranked), Seq("query_id", "label"))
    val hitCols = count(lit(1)).as("n_truth") +:
      probes.map(p => sum(when(col("probe_rank") <= p, 1L).otherwise(0L)).as(s"h$p"))
    val hitAgg = truthRank.agg(hitCols.head, hitCols.tail: _*)
    // per (query, probed cluster): posting size — scanned(p) is the sum
    // over ranks <= p, again one aggregate over a dimension-scale table
    val scanCols = probes.map(p =>
      coalesce(sum(when(col("probe_rank") <= p, col("n_cand"))), lit(0L)).as(s"s$p"))
    val scanAgg = ranked.join(labelSizes, "label").agg(scanCols.head, scanCols.tail: _*)
    val nQ = queries.agg(count(lit(1)).as("n_q"))
    val nC = corpus.agg(count(lit(1)).as("n_c"))
    hitAgg.crossJoin(scanAgg).crossJoin(nQ).crossJoin(nC)
      .select(inline(array(probes.map(p => struct(
        lit(p).as("nprobe"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col(s"h$p"), lit(0L)).as("n_hits"),
        when(col("n_truth") > 0,
          col(s"h$p").cast("double") / col("n_truth").cast("double"))
          .otherwise(0.0).as("recall"),
        (col(s"s$p").cast("double") /
          (col("n_q") * col("n_c")).cast("double")).as("scan_frac"))): _*)))
      .orderBy("nprobe")
  }

  /** C96 — tokenizer distribution quality: Shannon and Rényi (α=2.5)
    * entropy of the corpus token-frequency distribution, per tokenizer
    * (whitespace words vs the C35 12-merge BPE), plus the Rényi
    * EFFICIENCY H₂.₅/log₂V — the "Tokenization and the Noiseless
    * Channel" (Zouhar et al., ACL 2023) measure that predicts
    * downstream quality better than vocab size or fertility: a
    * tokenizer whose token mass concentrates on few types wastes its
    * vocabulary (efficiency → 0), one that spreads uniformly uses it
    * fully (→ 1). Complements C93: fertility prices the SEQUENCE cost,
    * this scores the DISTRIBUTION.
    *
    * Determinism at scale: the Σp·log₂p and Σp^α sums run over the
    * vocabulary in arbitrary partition order, so each term is
    * quantized to DECIMAL(38,12) and summed EXACTLY (the Agg.dsum
    * discipline, scale chosen so a 1-ulp libm pow/log2 difference
    * cannot flip a quantization boundary: the grid step is ~1e6 ulps
    * at these magnitudes, and terms below 5e-13 truncate to a defined
    * zero). Frequency tables are one shuffle each; the totals join
    * broadcasts two rows. */
  def tokenizerEntropy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val ws = docs.select(explode(Text.wsTokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .select(lit("ws").as("tokenizer"), col("c"))
    val bpe = Bpe.encode(docs, "doc_id", "text", nMerges = 12)
      .select(explode(split(col("bpe_text"), Bpe.Sep)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .select(lit("bpe12").as("tokenizer"), col("c"))
    val freq = ws.unionByName(bpe)
    val tot = freq.groupBy("tokenizer").agg(
      count(lit(1)).as("vocab_size"), sum(col("c")).as("total_tokens"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val p = col("c").cast("double") / col("total_tokens").cast("double")
    val sums = freq.join(broadcast(tot), "tokenizer")
      .select(col("tokenizer"),
        (p * log2(p)).cast(dec).as("tsh"),
        pow(p, lit(2.5)).cast(dec).as("tr"))
      .groupBy("tokenizer")
      .agg(sum(col("tsh")).cast("double").as("ssh"),
        sum(col("tr")).cast("double").as("sr"))
    val renyi = log2(col("sr")) / lit(-1.5)
    tot.join(sums, "tokenizer")
      .select(col("tokenizer"), col("vocab_size"), col("total_tokens"),
        round(-col("ssh"), 6).as("shannon_bits"),
        round(renyi, 6).as("renyi25_bits"),
        when(col("vocab_size") > 1,
          round(renyi / log2(col("vocab_size").cast("double")), 6))
          .otherwise(0.0).as("renyi_efficiency"))
      .orderBy("tokenizer")
  }

  /** C95 — containment join ([[SetSim.containmentJoin]]): every
    * ORDERED pair where ≥ 80 % of the left doc's distinct 3-shingles
    * sit inside the right doc — subset duplication (quotes swallowed
    * whole, excerpt pages, expanded revisions) that symmetric Jaccard
    * structurally misses when the containing side is much larger.
    * md5-60 shingle hashes for oracle parity (production: xxhash64). */
  def containJoinDemo(spark: SparkSession, dir: String): DataFrame =
    SetSim.containmentJoin(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.8, shingleN = 3)
      .orderBy("id_a", "id_b")

  /** C94 — SFT chat-format validation ([[Sft.validateConversations]]):
    * conversations synthesized onto the doc corpus (the C55/C87
    * convention) with PLANTED violations so every check fires — docs
    * group into 40 conversations ordered by doc_id, roles alternate
    * user/assistant by turn parity EXCEPT every %17 doc is forced
    * 'user' (consecutive-role violations wherever that lands on an odd
    * turn), every %23 doc's content is blanked (empty-turn violations),
    * and odd-length conversations naturally end on 'user' (ends-check
    * violations) — then each conversation gets its four verdicts and
    * the conjunction. */
  def sftValidateDemo(spark: SparkSession, dir: String): DataFrame =
    Sft.validateConversations(sftSynthTurns(Tables.documents(spark, dir)),
        "conv_id", "turn_idx", "role", "content")
      .orderBy("conv_id")

  /** the C94/D13 shared fixture: the doc corpus folded into 40
    * conversations with the planted violations described on
    * [[sftValidateDemo]] */
  private[graft] def sftSynthTurns(docs: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("conv_id")).orderBy(col("doc_id"))
    docs.select((col("doc_id") % 40).as("conv_id"),
        col("doc_id"), col("text"))
      .withColumn("turn_idx", row_number().over(wOrd).cast("long") - 1)
      .select(col("conv_id"), col("turn_idx"),
        when(col("doc_id") % 17 === 0, lit("user"))
          .when(col("turn_idx") % 2 === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        when(col("doc_id") % 23 === 0, lit("")).otherwise(col("text")).as("content"))
  }

  /** C93 — subword fertility by language: BPE tokens per whitespace
    * word and characters per BPE token, per metadata lang — THE
    * numbers a tokenizer team reads before fixing a vocabulary (high
    * fertility on a language = that language pays more sequence
    * positions per word = effectively less context and more compute;
    * cf. C72, which proxies fertility with chars-per-WHITESPACE-token
    * and needs no trained vocab). Uses the C35/C36 pipeline: train the
    * 12-merge vocabulary on the corpus ([[Bpe.trainDf]] pricing
    * discipline — train at vocab scale, encode via ONE dictionary
    * join), then one groupBy(lang) whose partial aggs collapse to
    * lang-cardinality rows map-side. Exact-int sums; IEEE divisions on
    * the exact totals. */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val enc = Bpe.encode(docs, "doc_id", "text", nMerges = 12)
    docs.select(col("doc_id"), col("lang"),
        Text.tokenCount(col("text")).as("words"),
        length(col("text")).cast("long").as("chars"))
      .join(enc.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("words")).as("total_words"),
        sum(col("n_tokens")).as("total_bpe_tokens"),
        sum(col("chars")).as("total_chars"))
      .select(col("lang"), col("n_docs"), col("total_words"),
        col("total_bpe_tokens"), col("total_chars"),
        when(col("total_words") > 0,
          col("total_bpe_tokens").cast("double") / col("total_words").cast("double"))
          .otherwise(0.0).as("fertility"),
        when(col("total_bpe_tokens") > 0,
          col("total_chars").cast("double") / col("total_bpe_tokens").cast("double"))
          .otherwise(0.0).as("chars_per_token"))
      .orderBy("lang")
  }

  /** C92 — per-document character-distribution Shannon entropy (bits)
    * — the junk filter the length/stopword heuristics (C9/C28) can't
    * express: repeated-character spam and single-symbol padding score
    * near 0 bits regardless of length, natural prose sits ~4–4.5, and
    * random-symbol noise pushes toward log₂|alphabet|. The gate keeps
    * entropy ≥ 2 (low side only: large-alphabet scripts like CJK
    * legitimately run HIGH, so a high-side cut would gate languages,
    * not junk — pair with C8's lang_id if encoded-binary detection is
    * needed). Characters are code points ([[Text.charTokens]],
    * surrogate-safe — an astral emoji is one symbol, matching the
    * oracle's split), per-doc counts fold in sorted-character order so
    * the double sum is deterministic and engine-identical, and the
    * shuffle carries at most |alphabet| rows per doc (the per-partition
    * partial agg collapses to distinct (doc, char) first) — map-side
    * bounded at any corpus size. Empty docs survive with (0, 0, 0.0,
    * false) through the left join back. */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cnt = docs.select(col("doc_id"),
        explode(Text.charTokens(col("text"))).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val agg = cnt.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_total"),
      count(lit(1)).as("n_distinct"),
      sort_array(collect_list(struct(col("ch"), col("c")))).as("cs"))
    val ent = round(-aggregate(col("cs"), lit(0.0), (acc, s) => {
      val pr = s.getField("c").cast("double") / col("n_total").cast("double")
      acc + pr * log2(pr)
    }), 6)
    val scored = agg.select(col("doc_id"), col("n_total"),
      col("n_distinct"), ent.as("entropy"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"),
        (coalesce(col("entropy"), lit(0.0)) >= 2.0).as("keep"))
      .orderBy("doc_id")
  }

  /** C91 — greedy k-center coreset selection over the embeddings
    * table ([[Similarity.kcenterSelect]]): the 8 most mutually-distant
    * vectors, seeded at the smallest id — the diverse-subset primitive
    * behind coreset curation and annotation budgeting (k-center picks
    * the points that COVER the space; contrast C85's budget_select,
    * which picks the points that SCORE best). The oracle replays the
    * same greedy argmax as a materialized CTE chain, one step per
    * center. */
  def kcenterSelectDemo(spark: SparkSession, dir: String): DataFrame =
    Similarity.kcenterSelect(Tables.embeddings(spark, dir),
        "vec_id", "embedding", k = 8)
      .orderBy("rank")

  /** C90 — measured precision/recall of the C3 simhash banding, the
    * Hamming-space companion to [[minhashLshEval]] (C66): the 4×15-bit
    * production banding evaluated against an EXACT hamming ≤ 6 truth.
    * The truth is not a second heuristic: seven DISJOINT bands (6×8
    * bits + one 12-bit remainder) cover all 60 signature bits, so any
    * pair within hamming 6 has at least one clean band by pigeonhole —
    * the 7-band candidate join followed by the exact hamming filter IS
    * the exact truth set, relationally, with no quadratic all-pairs
    * scan. The same theorem says the 4-band production config is
    * lossless through hamming 3, so the row reports the ≤3 split too:
    * `n_hit_le3 == n_truth_le3` is a measured invariant, and recall
    * loss can only live in the 4..6 ring. Precision here prices the
    * verify stage: candidates the banding surfaces that exact hamming
    * then rejects are the wasted bucket-join work.
    *
    * Scale posture: truth-band keys are 8 bits wide, so truth buckets
    * grow as n/2⁸ — at 100 TB this measurement runs on a uniform
    * doc_id-hash sample (P/R is a statistic; sampling is the honest
    * estimator), while the 15-bit production banding being measured
    * runs corpus-wide. One summary row; exact-int IEEE divisions. */
  def simhashEval(spark: SparkSession, dir: String): DataFrame = {
    val maxH = 6
    val docs = Tables.documents(spark, dir)
    val banded = graft.util.CacheRegistry.register(
      Dedup.simhashBandedSignatures(docs, "doc_id", "text",
        graft.functions.Vec.md5Hash60, bits = 60).persist())
    val sigs = banded.filter(col("band") === 0).select(col("doc_id"), col("sh"))
    // 7 disjoint truth bands: j<6 → bits [8j, 8j+8), j=6 → bits [48, 60)
    val truthKeys = (0 until 6).map(j =>
      shiftright(col("sh"), j * 8).bitwiseAND(lit(255L))) :+
      shiftright(col("sh"), 48).bitwiseAND(lit((1L << 12) - 1L))
    val tb = sigs.select(col("doc_id"), col("sh"),
      posexplode(array(truthKeys: _*)).as(Seq("band", "key")))
    val truth = tb.select(col("band"), col("key"),
        col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .join(tb.select(col("band"), col("key"),
        col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.Vec.hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxH)
    // production candidates BEFORE the verify filter (maxHamming=60 is
    // a no-op on a 60-bit signature): what the 4-band join surfaces
    val cand = Dedup.simhashCandidates(banded, banded, "doc_id",
      maxHamming = 60, symmetric = true)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"),
      coalesce(sum(when(col("hamming") <= 3, 1L).otherwise(0L)), lit(0L))
        .as("n_truth_le3"))
    val nCand = cand.agg(count(lit(1)).as("n_cand"),
      coalesce(sum(when(col("hamming") <= maxH, 1L).otherwise(0L)), lit(0L))
        .as("n_hit"),
      coalesce(sum(when(col("hamming") <= 3, 1L).otherwise(0L)), lit(0L))
        .as("n_hit_le3"))
    nDocs.crossJoin(nTruth).crossJoin(nCand)
      .select(col("n_docs"), col("n_truth"), col("n_cand"), col("n_hit"),
        col("n_truth_le3"), col("n_hit_le3"),
        when(col("n_cand") > 0,
          col("n_hit").cast("double") / col("n_cand").cast("double"))
          .otherwise(0.0).as("precision"),
        when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth").cast("double"))
          .otherwise(0.0).as("recall"))
  }

  /** C102 — UniMax allocation over the document corpus: budget = 1.5×
    * the corpus's whitespace-token total (3T div 2, exact integer),
    * maxEpochs = 2 — small languages cap out at two passes, the
    * dominant ones split the rest evenly. The total is ONE scalar
    * collected driver-side (the house dimension-scale-collect pattern)
    * so the budget rides the plan as a literal. */
  def unimaxMixDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val total = docs.agg(coalesce(sum(Text.tokenCount(col("text"))), lit(0L)))
      .first().getLong(0)
    Sampling.unimaxMix(docs, "lang", Text.tokenCount(col("text")),
        budget = 3L * total / 2L, maxEpochs = 2)
      .orderBy("lang")
  }

  /** C115 — the C102 allocation applied: per language, the seed-5
    * hash race selects documents until the UniMax budget (1.5× corpus
    * tokens, maxEpochs 2) is spent — capped languages keep everything,
    * the dominant ones are subsampled to the fair share. */
  def unimaxApplyDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val total = docs.agg(coalesce(sum(Text.tokenCount(col("text"))), lit(0L)))
      .first().getLong(0)
    val alloc = Sampling.unimaxMix(docs, "lang", Text.tokenCount(col("text")),
      budget = 3L * total / 2L, maxEpochs = 2)
    Sampling.unimaxApply(docs, "lang", "doc_id",
        Text.tokenCount(col("text")), alloc, seed = 5)
      .orderBy("lang", "cum_tokens")
  }

  /** C120 — the C102 allocation as an exact per-document repetition
    * plan (budget 1.5× corpus tokens, maxEpochs 2, seed 5): capped
    * languages read full 2-epoch repetition, the dominant ones a
    * 1-epoch pass plus a fractional hash-race prefix. */
  def epochPlanDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val total = docs.agg(coalesce(sum(Text.tokenCount(col("text"))), lit(0L)))
      .first().getLong(0)
    val alloc = Sampling.unimaxMix(docs, "lang", Text.tokenCount(col("text")),
      budget = 3L * total / 2L, maxEpochs = 2)
    Sampling.epochPlan(docs, "lang", "doc_id",
        Text.tokenCount(col("text")), alloc, seed = 5)
      .orderBy("lang", "cum_tokens")
  }

  /** C116 — split-leakage audit of the C20 hash split: test docs
    * sharing a verbatim 8-gram window with any train doc (the near-dup
    * clusters that straddle the 80/10/10 boundary). */
  def splitLeakageDemo(spark: SparkSession, dir: String): DataFrame =
    Dedup.splitLeakage(
        Sampling.hashSplit(Tables.documents(spark, dir), "doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10)),
        "doc_id", "text", "split", k = 8,
        tokenHash = graft.functions.Vec.md5Hash60)
      .orderBy("doc_id")

  /** C122 — n-gram novelty gate ([[Curation.ngramNovelty]]): odd-id
    * docs are the arriving candidate batch, even-id docs the existing
    * corpus; the planted near-dup families make real low-novelty rows
    * (a re-crawl reads ≈ 0 here before anyone pays to train on it). */
  def ngramNoveltyDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Curation.ngramNovelty(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", k = 8,
        tokenHash = graft.functions.Vec.md5Hash60)
      .orderBy("doc_id")
  }

  /** C123 — preference-pair curation ([[Curation.prefPairPrep]]):
    * consecutive docs pair up (even doc_id = response A, odd = B,
    * pair_id = doc_id div 2), the prompt is A's first-12-token prefix
    * (the corpus's planted near-dup families make ORGANIC duplicate
    * prompts), scores are C9's quality score, and two violations are
    * planted so every check demonstrably fires: every %41 pair's B is
    * overwritten with A (identical pair, zero margin) and every %37
    * pair's prompt is forced to one shared string (guaranteed dedup
    * group). Real margins/length ratios from the real corpus exercise
    * the other two gates. */
  def prefPairPrepDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val a = docs.filter(col("doc_id") % 2 === 0)
      .select(expr("doc_id div 2").as("pair_id"), col("text").as("resp_a"))
    val b = docs.filter(col("doc_id") % 2 === 1)
      .select(expr("(doc_id - 1) div 2").as("pair_id"), col("text").as("resp_b"))
    val pairs = a.join(b, "pair_id")
      .withColumn("resp_b",
        when(col("pair_id") % 41 === 0, col("resp_a")).otherwise(col("resp_b")))
      .withColumn("prompt",
        when(col("pair_id") % 37 === 0, lit("PLANTED duplicate prompt"))
          .otherwise(array_join(slice(Text.wsTokens(col("resp_a")), 1, 12), " ")))
      .withColumn("score_a", Text.qualityScore(col("resp_a")))
      .withColumn("score_b", Text.qualityScore(col("resp_b")))
    Curation.prefPairPrep(pairs, "pair_id", "prompt",
        "resp_a", "resp_b", "score_a", "score_b")
      .orderBy("pair_id")
  }

  /** C103 — takedown propagation: the delete list is every doc with
    * id % 29 == 0 (request-scale, and it hits four real near-dup
    * clusters at sf0.01 so the sweep half actually fires); clusters are
    * C13's connected components over the md5-60 MinHash candidate
    * pairs. Output is the audit trail: every removed doc with its
    * cluster and whether it was listed itself or swept in as a
    * near-copy. */
  def takedownPropagateDemo(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, minEstSim = 0.25,
      tokenHash = graft.functions.Vec.md5Hash60, hashBandKeys = false)
    val clusters = Dedup.connectedComponents(docs, pairs, "doc_id")
    val listed = docs.filter(pmod(col("doc_id"), lit(29)) === 0)
      .select("doc_id")
    Governance.takedownPropagate(clusters, listed, "doc_id")
      .orderBy("doc_id")
  }

  /** C104 — exact stratified split: hold out ⌊n·0.2⌋ docs of every
    * (lang, source) cell, membership keyed by seed 7. */
  def stratifiedSplitDemo(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSplit(Tables.documents(spark, dir),
        Seq("lang", "source"), "doc_id", testFrac = 0.2, seed = 7)
      .select("doc_id", "lang", "source", "split")
      .orderBy("doc_id")

  /** C105 — mojibake scoring over a deterministically damaged corpus:
    * the synthetic docs are clean ASCII, so the demo plants the
    * double-encoding artifacts it detects (id % 13 → a Latin-1
    * round-trip suffix, id % 29 → a U+FFFD) and scores every doc. */
  def mojibakeScoreDemo(spark: SparkSession, dir: String): DataFrame =
    Curation.mojibakeScore(mojibakePlanted(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** C106 — k-anonymity generalization at k = 8 over (lang, source):
    * big cells publish as-is (level 0), thin ones fall back to
    * (lang, *) (every language holds ≥ 8 docs here), demonstrating the
    * ladder without suppression. */
  def kanonGeneralizeDemo(spark: SparkSession, dir: String): DataFrame =
    Governance.kanonGeneralize(Tables.documents(spark, dir),
        "doc_id", "lang", "source", k = 8L)
      .orderBy("doc_id")

  /** C107 — skew diagnosis of events.event_type as a join key: a
    * handful of values over 10k+ rows, so every hitter overflows a
    * fair partition and the salt recommendation fires — exactly the
    * report that says "don't key the shuffle on this, or salt it". */
  def skewDiagnoseDemo(spark: SparkSession, dir: String): DataFrame =
    Governance.skewDiagnose(Tables.events(spark, dir), "event_type",
      topN = 10, partitions = 32, saltFactor = 4)

  /** C108 — curriculum ordering by whitespace-token difficulty into 4
    * stages, seed-11 shuffle within each stage. */
  def curriculumOrderDemo(spark: SparkSession, dir: String): DataFrame =
    Sampling.curriculumOrder(Tables.documents(spark, dir), "doc_id",
        Text.tokenCount(col("text")), nStages = 4, seed = 11)
      .orderBy("stage", "stage_order")

  /** the C105/C109 shared fixture: the clean synthetic corpus with
    * deterministic mojibake planted (id % 13 → a Latin-1 round-trip
    * suffix, id % 29 → a U+FFFD). */
  private[graft] def mojibakePlanted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).withColumn("text",
      concat(col("text"),
        when(pmod(col("doc_id"), lit(13)) === 0,
          lit(Curation.MojibakePlant13)).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(29)) === 0,
          lit(Curation.MojibakePlant29)).otherwise(lit(""))))

  /** C109 — mojibake repair over the same planted corpus C105 scores:
    * the planted docs come back with their suffix decoded (café — naïve)
    * and the U+FFFD markers dropped. */
  def mojibakeRepairDemo(spark: SparkSession, dir: String): DataFrame =
    Curation.mojibakeRepair(mojibakePlanted(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** C110 — packing-efficiency sweep over candidate context lengths
    * {512, 1024, 2048, 4096} on the C22 shard layout (doc_id % 4). */
  def packingSweepDemo(spark: SparkSession, dir: String): DataFrame =
    Packing.packingSweep(
      Tables.documents(spark, dir).select(col("doc_id"),
        (col("doc_id") % 4).as("shard"),
        Text.tokenCount(col("text")).as("toks")),
      "shard", "doc_id", "toks", capacities = Seq(512, 1024, 2048, 4096))

  /** C111 — vocabulary coverage per language against the top-500
    * corpus words: the table that shows which languages a shared vocab
    * under-serves (en dominates the corpus, so its coverage leads). */
  def vocabCoverageDemo(spark: SparkSession, dir: String): DataFrame =
    Curation.vocabCoverage(Tables.documents(spark, dir), "lang", "text",
        v = 500)
      .orderBy("lang")

  /** C117 — ε-DP released (lang, source) counts at ε=1, ±40
    * truncation, seed 23: the reproducible noisy dataset-card cells. */
  def dpReleaseDemo(spark: SparkSession, dir: String): DataFrame =
    Governance.dpRelease(Tables.documents(spark, dir), "lang", "source",
        epsilon = 1.0, bound = 40, seed = 23)
      .orderBy("lang", "source")

  /** C118 — T5 span corruption at grid 7, maxMask 3, seed 17: every
    * document becomes a (sentinel input, span target) denoising pair. */
  def spanCorruptDemo(spark: SparkSession, dir: String): DataFrame =
    Packing.spanCorrupt(Tables.documents(spark, dir), "doc_id", "text",
        grid = 7, maxMask = 3, seed = 17)
      .orderBy("doc_id")
}
