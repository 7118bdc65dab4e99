package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  *  2. Each merge round is relational: adjacent-pair counts via array
  *     indexing (no window over the corpus), the argmax rule by
  *     (count desc, pair asc) — a deterministic total order — and the
  *     greedy left-to-right application of the rule is the SAME
  *     island-detection window used by [[Dedup.duplicateSpans]]: for
  *     a rule (a,a) overlapping matches form runs, and greedy keeps
  *     every other position from each run's start. No UDFs, no
  *     per-row loops — the DuckDB oracle runs the identical algebra.
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

  /** distinct-word frequency table from a corpus text column: ONE
    * corpus pass; `word` doubles as the stable row key. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.Text.wsTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train `nMerges` BPE rules over the corpus' distinct words.
    * Returns the ordered merge table (rank, left, right,
    * n_occurrences) — the artifact a tokenizer ships. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
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
    merges.toSeq
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

  /** greedy left-to-right application of rule (a, b) to every word:
    * match positions that overlap-chain (only possible when a == b)
    * form runs of consecutive positions, and greedy keeps the even
    * offsets within each run — the island trick. The survivors merge
    * `a ++ b`; positions directly after a kept match drop; everything
    * else passes through, order preserved via the sorted rebuild. */
  private[operators] def applyRule(words: DataFrame, a: String, b: String): DataFrame = {
    val ex = words.select(col("word"), col("freq"),
      posexplode(col("syms")).as(Seq("pos", "s")))
    val matches = adjacentPairs(words)
      .filter(col("a") === lit(a) && col("b") === lit(b))
      .select(col("word"), col("pos"))
    val byWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    val keep = matches
      .withColumn("_grp", col("pos") - row_number().over(byWord))
      .withColumn("_run0", min(col("pos")).over(
        Window.partitionBy(col("word"), col("_grp"))))
      .filter((col("pos") - col("_run0")) % 2 === 0)
      .select(col("word"), col("pos"))
    val k = keep.select(col("word").as("_kword"), col("pos").as("_kpos"))
    ex
      .join(k, ex("word") === col("_kword") && (ex("pos") === col("_kpos") ||
        ex("pos") === col("_kpos") + 1), "left")
      .filter(col("_kpos").isNull || col("pos") === col("_kpos")) // drop the consumed right side
      .select(col("word"), col("freq"), col("pos"),
        when(col("_kpos").isNotNull, lit(a + b)).otherwise(col("s")).as("s"))
      .groupBy(col("word"))
      .agg(min(col("freq")).as("freq"),
        transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          x => x.getField("s")).as("syms"))
  }

  /** the trained table as a DataFrame (for the oracle row). */
  def trainDf(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, nMerges).toDF()
  }
}
