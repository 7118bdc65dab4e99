package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Text, Vec}

/** In-engine quality classification (C45): logistic regression over
  * hashed bag-of-words features, TRAINED relationally by full-batch
  * gradient descent — the fasttext-style quality filter of the
  * GPT-3 / CCNet lineage (score documents by "does this look like the
  * curated reference class"), without leaving the engine.
  *
  * Determinism is the bpe_train discipline: every corpus-scale sum
  * rounds its terms to a fixed scale and accumulates in DECIMAL (so
  * partial-agg order cannot shift a value), weights round to 6 places
  * per round, and the DuckDB oracle unrolls the identical algebra
  * round by round — scores hash-match bit-for-bit.
  *
  * Scale shape per GD round: the (doc, bucket, x) feature table is
  * built ONCE (one tokenize pass) and persisted at docs×features
  * scale (the LSH-signature-cache class, never the raw text); each
  * round is feature-table ⋈ broadcast weight table (dimension-scale:
  * `buckets`+1 rows) → per-doc margin agg → per-bucket gradient agg —
  * two bounded-key shuffles, both map-side combinable; the only
  * driver traffic is the `buckets`+1 weight rows per round (the
  * kppSeeds / BPE-rule-row discipline).
  */
object Classifier {

  /** Hashed BINARY-presence unigram features (x = 1 for every bucket
    * the doc touches — the bag-of-hashed-words simplification; an
    * L1-normalized tf variant scales each feature by ~1/doc_len,
    * which starves per-feature gradients against the bias) + a bias
    * pseudo-feature (bucket −1, x = 1). Tokenless docs have no
    * features and drop — the dsirScore convention. */
  private def featureTable(docs: DataFrame, idCol: String, textCol: String,
                           label: Column, buckets: Int): DataFrame = {
    val present = docs.select(col(idCol), label.cast("double").as("_y"),
        explode(Text.wsTokens(col(textCol))).as("_tok"))
      .select(col(idCol), col("_y"),
        pmod(Vec.md5Hash60(col("_tok")), lit(buckets.toLong)).as("_b"))
      .distinct()
      .withColumn("_x", lit(1.0))
    val bias = present.select(col(idCol), col("_y")).distinct()
      .select(col(idCol), col("_y"), lit(-1L).as("_b"), lit(1.0).as("_x"))
    present.unionByName(bias)
  }

  /** The GD loop over a prepared (persisted) feature table. Weights
    * start at 0 (so round 1 sees σ = 0.5 exactly), update
    * w ← round(w + lr·grad, 6) with grad_b = (1/N)·Σ_d x_db·(y_d − σ_d)
    * and σ = round(logistic(margin), 6). All Σ are rounded-term
    * decimal sums. Returns the final weights (bucket −1 = bias). */
  private def trainOn(feats: DataFrame, idCol: String, rounds: Int,
                      lr: Double): Map[Long, Double] = {
    val spark = feats.sparkSession
    import spark.implicits._
    // weight support = the buckets that occur (matches the oracle's
    // DISTINCT-from-tf w0); absent buckets never receive gradient
    var weights: Map[Long, Double] =
      feats.select(col("_b")).distinct().collect()
        .map(_.getLong(0) -> 0.0).toMap
    // one bias row per doc, so the bias bucket's support counts docs
    val nDocs = feats.filter(col("_b") === -1L).count()
    for (_ <- 1 to rounds) {
      val wdf = weights.toSeq.toDF("_b", "_w")
      val margins = feats.join(broadcast(wdf), "_b")
        .groupBy(col(idCol), col("_y"))
        .agg(sum(round(col("_w") * col("_x"), 9).cast("decimal(27,9)"))
          .cast("double").as("_m"))
        .select(col(idCol), col("_y"),
          round(lit(1.0) / (lit(1.0) + exp(-col("_m"))), 6).as("_p"))
      // MEAN gradient (sum / corpus size): an unnormalized full-batch
      // sum scales the step with N and saturates every sigmoid within
      // a round or two — the mean keeps the step size N-invariant,
      // which is also what makes one lr work at any corpus scale
      val grads = feats.join(margins.select(col(idCol), col("_p")), idCol)
        .groupBy(col("_b"))
        .agg((sum(round(col("_x") * (col("_y") - col("_p")), 9)
          .cast("decimal(27,9)")).cast("double") / lit(nDocs)).as("_g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      weights = weights.map { case (b, w) =>
        b -> BigDecimal(w + lr * grads.getOrElse(b, 0.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    weights
  }

  /** the shared feature-table preparation: hash-partitioned by doc id
    * once, so HashPartitioning(id) satisfies the per-doc margin
    * aggregation's ClusteredDistribution((id, y)) and every GD round's
    * margin agg reads the cache with NO exchange — only the
    * bucket-scale gradient agg shuffles per round. */
  private def prepareFeats(docs: DataFrame, idCol: String, textCol: String,
                           label: Column, buckets: Int): DataFrame =
    graft.util.CacheRegistry.register(
      featureTable(docs, idCol, textCol, label, buckets)
        .repartition(col(idCol)).persist())

  def logregTrain(docs: DataFrame, idCol: String, textCol: String,
                  label: Column, buckets: Int = 1024, rounds: Int = 12,
                  lr: Double = 20.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = prepareFeats(docs, idCol, textCol, label, buckets)
    trainOn(feats, idCol, rounds, lr).toSeq.toDF("bucket", "weight")
  }

  /** Train + score in one call: every doc's final-round probability
    * and ≥ 0.5 prediction, with its training label echoed. The scoring
    * pass reuses the persisted feature table — one extra broadcast
    * join over it, no re-tokenize. */
  def logregScore(docs: DataFrame, idCol: String, textCol: String,
                  label: Column, buckets: Int = 1024, rounds: Int = 12,
                  lr: Double = 20.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = prepareFeats(docs, idCol, textCol, label, buckets)
    val w = trainOn(feats, idCol, rounds, lr).toSeq.toDF("_b", "_w")
    feats.join(broadcast(w), "_b")
      .groupBy(col(idCol), col("_y"))
      .agg(sum(round(col("_w") * col("_x"), 9).cast("decimal(27,9)"))
        .cast("double").as("_m"))
      .select(col(idCol), (col("_y") === 1.0).as("is_target"),
        round(lit(1.0) / (lit(1.0) + exp(-col("_m"))), 6).as("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }
}
