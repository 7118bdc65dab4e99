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
  *  2. Each merge round costs ONE shuffle (the adjacent-pair count
  *     via array indexing + groupBy); the argmax rule is picked by
  *     (count desc, pair asc) — a deterministic total order — and the
  *     greedy left-to-right application of the rule is a map-only
  *     per-word left fold (see [[applyRule]]): zero shuffles, because
  *     greedy application never looks outside one word. The DuckDB
  *     oracle computes the identical semantics with the island-trick
  *     window algebra (runs of overlapping matches keep even offsets
  *     — equivalent to the fold's consume-next flag).
  *  3. The only driver traffic is ONE RULE ROW per round (the
  *     dimension-scale collect discipline of the k-means seeds);
  *     `localCheckpoint` per round cuts the growing lineage exactly
  *     as [[Dedup.connectedComponents]] does.
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

  /** [[train]], also returning the post-training vocabulary symbol
    * table (word, freq, syms) — every distinct corpus word already
    * segmented by all learned rules. This IS the tokenizer's
    * dictionary: [[encode]] segments the corpus by joining words to
    * it instead of replaying the merge loop per document. */
  def trainWithVocab(docs: DataFrame, textCol: String,
      nMerges: Int): (Seq[Merge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var words = wordFreq(docs, textCol)
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
