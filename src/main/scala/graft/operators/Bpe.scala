package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training, relationally (SURVEY §2
  * C35) — the missing trainer behind the pipeline's token counting:
  * learn the merge table FROM the corpus instead of assuming one.
  *
  * Scale shape — the part worth getting right at 100 TB:
  *
  *  1. ONE corpus pass reduces the input to the distinct-word
  *     frequency table (`groupBy(word).count`, map-side combinable).
  *     Everything after operates at VOCABULARY scale: classic BPE
  *     training is O(distinct words), the corpus only ever contributes
  *     integer counts. A 100 TB corpus with a 10M-word vocabulary
  *     trains on 10M rows.
  *  2. The merge rounds are vocabulary-scale arithmetic with a
  *     sequential dependency between rounds, so by default they run
  *     IN THE DRIVER over the collected (word, freq) table — the
  *     design every production tokenizer trainer uses, because a
  *     distributed round loop pays nMerges job-scheduling floors for
  *     sub-second compute. A vocabulary over the collect threshold
  *     (~2M words) falls back to the per-round distributed loop:
  *     ONE shuffle per round (adjacent-pair count), argmax by
  *     (count desc, pair asc) — a deterministic total order — and
  *     greedy rule application as a map-only per-word left fold
  *     (see [[applyRule]]): zero shuffles, because greedy
  *     application never looks outside one word. The DuckDB oracle
  *     computes the identical semantics with the island-trick
  *     window algebra (runs of overlapping matches keep even offsets
  *     — equivalent to the fold's consume-next flag).
  *  3. Driver traffic is the vocabulary table once (local path,
  *     bounded by the threshold) or ONE RULE ROW per round
  *     (distributed path, the dimension-scale collect discipline of
  *     the k-means seeds, with `localCheckpoint` per round cutting
  *     lineage exactly as [[Dedup.connectedComponents]] does).
  *
  * Determinism: integer counts, string tie-breaks — bit-exact across
  * engines by construction.
  */
object Bpe {

  /** One trained merge rule. */
  final case class Merge(rank: Long, left: String, right: String, n_occurrences: Long)

  /** [[encode]]'s token separator in `bpe_text`: U+0001 — a control
    * char no whitespace-split token contains, so the joined stream is
    * losslessly splittable (the DuckDB oracle writes it as chr(1)). */
  val Sep: String = "\u0001"

  /** distinct-word frequency table from a corpus text column: ONE
    * corpus pass; `word` doubles as the stable row key. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.Text.wsTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train `nMerges` BPE rules over the corpus' distinct words.
    * Returns the ordered merge table (rank, left, right,
    * n_occurrences) — the artifact a tokenizer ships. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] =
    trainWithVocab(docs, textCol, nMerges)._1

  /** Vocabularies at or under this many distinct words train in the
    * DRIVER after the one corpus-reduction pass (override via the
    * `spark.graft.bpe.localVocabThreshold` conf; 0 forces the
    * distributed loop). 2M words × ~100 B of symbol state ≈ 200 MB —
    * comfortable driver heap; a corpus whose vocabulary exceeds it
    * falls back to the per-round distributed loop below. */
  val LocalVocabThresholdKey = "spark.graft.bpe.localVocabThreshold"
  private val DefaultLocalVocabThreshold = 2000000

  /** [[train]], also returning the post-training vocabulary symbol
    * table (word, freq, syms) — every distinct corpus word already
    * segmented by all learned rules. This IS the tokenizer's
    * dictionary: [[encode]] segments the corpus by joining words to
    * it instead of replaying the merge loop per document.
    *
    * Two-tier merge loop, picked by vocabulary size:
    *
    *  - LOCAL (the default): after the one corpus pass reduces the
    *    input to (word, freq), the merge rounds are pure
    *    vocabulary-scale arithmetic with a sequential dependency
    *    between rounds — exactly the shape a distributed round loop
    *    is worst at (12 rounds × job-scheduling floor for sub-second
    *    compute). Every production tokenizer trainer runs this loop
    *    in memory over the aggregated counts, and so do we: ONE
    *    `limit(threshold+1).collect()` fetches the word table (the
    *    limit caps driver exposure — an over-threshold vocabulary
    *    never ships), then all rounds run in-process, bit-identical
    *    to the distributed formulation (same overlap-counting pair
    *    sum, same (count desc, pair asc-by-UTF-8-bytes) argmax, same
    *    greedy consume-next fold; BpeSpec pins local ≡ distributed).
    *  - DISTRIBUTED (vocab > threshold): the r8 per-round loop — one
    *    shuffle per round over the symed word table, one rule row
    *    collected per round, `localCheckpoint` per round to cut
    *    lineage. A 100 TB corpus with a >2M-word vocabulary trains
    *    here; the rounds cost job floors but the state never has to
    *    fit one machine. */
  def trainWithVocab(docs: DataFrame, textCol: String,
      nMerges: Int): (Seq[Merge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    // persisted: the probe's all-partition limit computes the FULL
    // word table (only the shipped rows are capped), so an
    // over-threshold vocabulary would otherwise pay the corpus
    // tokenize+shuffle a second time inside trainDistributed
    val wf = wordFreq(docs, textCol).persist()
    val threshold = spark.conf.getOption(LocalVocabThresholdKey)
      .map(_.toInt).getOrElse(DefaultLocalVocabThreshold)
    val head = if (threshold > 0) {
      // CollectLimit's incremental partition fetch (1, then 4, then 16…
      // partitions per job) pays one job floor per escalation when the
      // limit is never reached — the common case here, since the limit
      // is a driver-safety cap, not an expected row count. Fetch every
      // partition in the FIRST job; the cap still bounds shipped rows.
      val key = "spark.sql.limit.initialNumPartitions"
      val was = spark.conf.getOption(key)
      spark.conf.set(key, spark.conf.get("spark.sql.shuffle.partitions"))
      try wf.limit(threshold + 1).collect()
      finally was.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    } else Array.empty[org.apache.spark.sql.Row]
    try {
      if (threshold > 0 && head.length <= threshold)
        trainLocal(spark, head, nMerges)
      else trainDistributed(wf, nMerges)
    } finally wf.unpersist() // both paths are done with the plan:
    // local trains from the collected rows; distributed checkpoints
    // its working copy before its first round
  }

  /** The in-driver merge loop over the collected (word, freq) table.
    * Symbol state starts as the word's code points (matching the
    * distributed path's character-wise `substring` split); each round
    * counts every adjacent pair occurrence (overlaps included, as the
    * posexplode does), picks argmax by (count desc, pair asc in
    * UTF-8 byte order — UTF8String's comparison, NOT Java's UTF-16
    * `compareTo`, so non-BMP tie-breaks agree with the engine), and
    * applies the rule with the same greedy consume-next walk as
    * [[applyRule]]'s fold. */
  private def trainLocal(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row],
      nMerges: Int): (Seq[Merge], DataFrame) = {
    import spark.implicits._
    val freqs = rows.map(_.getLong(1))
    val syms = rows.map(r => codePoints(r.getString(0)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var w = 0
      while (w < syms.length) {
        val s = syms(w); val f = freqs(w)
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
        w += 1
      }
      if (counts.isEmpty) exhausted = true // every word is one symbol
      else {
        var bestP: (String, String) = null
        var bestC = Long.MinValue
        counts.foreach { case (p, c) =>
          if (bestP == null || c > bestC || (c == bestC && pairLt(p, bestP))) {
            bestP = p; bestC = c
          }
        }
        val (a, b) = bestP
        merges += Merge((r + 1).toLong, a, b, bestC)
        var j = 0
        while (j < syms.length) { syms(j) = applyRuleLocal(syms(j), a, b); j += 1 }
        r += 1
      }
    }
    val vocab = rows.indices
      .map(i => (rows(i).getString(0), freqs(i), syms(i).toSeq))
      .toDF("word", "freq", "syms")
    (merges.toSeq, vocab)
  }

  /** split into per-code-point strings — the driver-side equivalent
    * of `substring(word, i, 1)`'s character semantics. */
  private def codePoints(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** greedy consume-next application, local form: a match at i emits
    * `a + b` and skips i+1 — positionally identical to [[applyRule]]'s
    * skip-flag fold. */
  private def applyRuleLocal(s: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** (a, b) pair order: a first then b, each compared as unsigned
    * UTF-8 bytes — the engine's string sort order. */
  private def pairLt(x: (String, String), y: (String, String)): Boolean = {
    val c = utf8Compare(x._1, y._1)
    if (c != 0) c < 0 else utf8Compare(x._2, y._2) < 0
  }

  private def utf8Compare(x: String, y: String): Int = {
    val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(xb.length, yb.length)
    while (i < n) {
      val d = (xb(i) & 0xff) - (yb(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    xb.length - yb.length
  }

  /** The per-round distributed loop — the over-threshold path. One
    * shuffle per round (the adjacent-pair count), one collected rule
    * row per round, `localCheckpoint` per round to cut the growing
    * lineage (the [[Dedup.connectedComponents]] discipline). */
  private def trainDistributed(wf: DataFrame,
      nMerges: Int): (Seq[Merge], DataFrame) = {
    var words = wf
      .select(col("word"), col("freq"),
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val pairs = adjacentPairs(words)
        .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect() // ONE rule row — dimension-scale driver traffic
      if (pairs.isEmpty) exhausted = true // every word is one symbol
      else {
        val (a, b, cnt) = (pairs(0).getString(0), pairs(0).getString(1), pairs(0).getLong(2))
        merges += Merge((r + 1).toLong, a, b, cnt)
        words = applyRule(words, a, b).localCheckpoint()
        r += 1
      }
    }
    (merges.toSeq, words)
  }

  /** Segment the corpus with the trained vocabulary: per document,
    * the BPE token stream ([[Sep]]-joined, word order preserved) and
    * its token count. The corpus-scale work is ONE posexplode + ONE
    * dictionary join + ONE per-doc agg: every distinct word was
    * already segmented at vocabulary scale during training, so no
    * merge logic ever touches a document. The join is declared plain
    * and Catalyst broadcasts the vocab side while it fits
    * (vocabulary ≪ corpus); past the broadcast threshold AQE picks
    * the shuffle join — the right behavior for a 10M-word vocab on a
    * real cluster, no hint needed. Documents with no words survive
    * with an empty stream: `posexplode_outer` emits their one null
    * word row through the left vocab join (null never matches), so
    * the whole operator is ONE corpus scan and ONE per-doc shuffle —
    * no second corpus join to re-attach wordless docs. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame =
    encodeWith(docs, idCol, textCol, trainWithVocab(docs, textCol, nMerges)._2)

  /** [[encode]] with an ALREADY-trained vocabulary symbol table
    * (word, syms) — the deployment path: train once
    * ([[trainWithVocab]]), persist the dictionary, segment any number
    * of corpora without replaying the merge rounds. Words absent from
    * the vocabulary are skipped (same null-join path as wordless
    * docs); retrain or extend the dictionary to cover them. */
  def encodeWith(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val docWords = docs.select(col(idCol),
      posexplode_outer(graft.functions.Text.wsTokens(col(textCol))).as(Seq("pos", "word")))
    docWords
      .join(vocab.select(col("word"), col("syms")), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(
        coalesce(sum(when(col("syms").isNotNull, size(col("syms")))), lit(0L))
          .as("n_tokens"),
        // a wordless doc's lone null-syms row nulls the flatten — the
        // coalesce is exactly its empty stream
        coalesce(concat_ws(Sep,
          flatten(transform(array_sort(collect_list(struct(col("pos"), col("syms")))),
            x => x.getField("syms")))), lit("")).as("bpe_text"))
  }

  /** (word, freq, pos, a, b) — every adjacent symbol pair, by array
    * indexing (words shorter than two symbols contribute nothing; the
    * guard matters because Spark's `sequence(0, -1)` counts DOWN). */
  private def adjacentPairs(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("word"), col("freq"),
        posexplode(transform(sequence(lit(0), size(col("syms")) - 2), i =>
          struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b"))))
          .as(Seq("pos", "p")))
      .select(col("word"), col("freq"), col("pos"), col("p.a").as("a"), col("p.b").as("b"))

  /** greedy left-to-right application of rule (a, b) to every word.
    * Greedy application is per-word-LOCAL, so it is one map-only left
    * fold over the symbol array (`functions.aggregate`) — NO shuffle:
    * walk positions carrying (rebuilt array, consumed-next flag); a
    * match at i emits `a ++ b` and consumes i+1 (which also makes
    * overlap chains — only possible when a == b — keep even run
    * offsets, the textbook greedy). `try_element_at(syms, i + 2)` past
    * the end is NULL (plain element_at THROWS under Spark 4's default
    * ANSI mode) and a NULL comparison is never a match, so the last
    * position needs no guard. Interpreted-HOF CPU (see the C34 note)
    * is irrelevant here: the fold runs at VOCABULARY scale, not corpus
    * scale. */
  private[operators] def applyRule(words: DataFrame, a: String, b: String): DataFrame = {
    val init = struct(
      array().cast("array<string>").as("acc"), lit(false).as("skip"))
    val folded = aggregate(
      sequence(lit(0), size(col("syms")) - 1),
      init,
      (st, i) => {
        val acc = st.getField("acc")
        val cur = element_at(col("syms"), i + 1)
        val nxt = try_element_at(col("syms"), i + 2)
        when(st.getField("skip"),
          struct(acc.as("acc"), lit(false).as("skip")))
          .when(cur === lit(a) && nxt === lit(b),
            struct(concat(acc, array(lit(a + b))).as("acc"), lit(true).as("skip")))
          .otherwise(
            struct(concat(acc, array(cur)).as("acc"), lit(false).as("skip")))
      },
      st => st.getField("acc"))
    words.select(col("word"), col("freq"), folded.as("syms"))
  }

  /** the trained table as a DataFrame (for the oracle row). */
  def trainDf(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, nMerges).toDF()
  }
}
