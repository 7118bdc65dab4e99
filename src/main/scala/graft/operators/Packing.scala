package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training (SURVEY §2 C22).
  *
  * GPT-style pretraining concatenates tokenized documents in a
  * deterministic order and slices the stream into fixed-capacity
  * context windows ("chunks"); a document spans every chunk its token
  * range overlaps. That concat-and-chunk layout is a pure function of
  * the per-shard running token offset, so it is fully relational: a
  * window cumsum gives each doc its [start, end) token span, and
  * integer division by the capacity gives its first/last chunk.
  *
  * Scale shape: packing is per SHARD (training shards are independent
  * by construction — compose with Sampling.hashSplit), so the cumsum
  * window partitions by shard: bounded state per key, no global
  * single-task window. Chunk ids are deterministic functions of
  * (shard order, token counts) — invariant to partitioning and
  * retries, the same discipline as hash_split.
  */
object Packing {

  /** Assign each document its chunk span under concat-and-chunk
    * packing with `capacity` tokens per chunk, packing independently
    * within each `shardCol` group in ascending `orderCol` order.
    *
    * Output: input keys + token span (start_off) + first_chunk /
    * last_chunk / n_chunks. Zero-token docs occupy no span: they
    * report first_chunk = last_chunk = the chunk at their offset and
    * n_chunks = 0.
    *
    * `carryCols` ride through unchanged (appended after last_chunk) —
    * callers that need extra identity columns (e.g. doc_id) pass them
    * here instead of re-joining the packed result back to the input,
    * which would execute the input subtree twice. */
  def sequencePack(df: DataFrame, shardCol: String, orderCol: String,
                   tokensCol: String, capacity: Int,
                   carryCols: Seq[String] = Nil): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val carry = carryCols.map(col)
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val endOff = sum(col(tokensCol)).over(w)
    df.select(col(shardCol) +: col(orderCol) +: col(tokensCol).as("n_tokens") +:
        (endOff - col(tokensCol)).as("start_off") +: endOff.as("_end") +: carry: _*)
      .select(col(shardCol) +: col(orderCol) +: col("n_tokens") +: col("start_off") +:
        floor(col("start_off") / capacity).as("first_chunk") +:
        when(col("n_tokens") > 0, floor((col("_end") - 1) / capacity))
          .otherwise(floor(col("start_off") / capacity)).as("last_chunk") +: carry: _*)
      .withColumn("n_chunks",
        when(col("n_tokens") > 0, col("last_chunk") - col("first_chunk") + 1)
          .otherwise(lit(0L)))
  }

  /** Per-chunk occupancy summary: how many docs touch each chunk and
    * how many of its `capacity` token slots are filled (the tail chunk
    * of a shard may be partial). Explodes each doc onto the chunks it
    * spans — bounded by n_tokens/capacity + 1 rows per doc. */
  def chunkOccupancy(packed: DataFrame, shardCol: String,
                     capacity: Int): DataFrame =
    packed.filter(col("n_tokens") > 0)
      .select(col(shardCol), col("n_tokens"), col("start_off"),
        explode(sequence(col("first_chunk"), col("last_chunk"))).as("chunk"))
      .withColumn("_chunk_start", col("chunk") * capacity)
      .withColumn("_in_chunk",
        least(col("start_off") + col("n_tokens"), col("_chunk_start") + capacity) -
          greatest(col("start_off"), col("_chunk_start")))
      .groupBy(col(shardCol), col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_in_chunk")).as("tokens_filled"))

  /** Sliding-window document chunking (C47) — the retrieval/embedding
    *-pipeline precursor: each doc splits into windows of `size`
    * tokens starting every `stride` tokens (stride < size overlaps,
    * the RAG convention that keeps sentences intact across chunk
    * boundaries; stride = size is disjoint chunking). Every start
    * below the token count emits, so the tail chunk may be short and
    * a doc shorter than `size` yields exactly one chunk of itself;
    * tokenless docs emit nothing.
    *
    * Map-only at any scale: chunk starts are a per-row `sequence` over
    * the token array, exploded — no shuffle, no window function, and
    * chunk ids are pure functions of the doc so the output is
    * partitioning/retry-invariant. Output: (id, chunk_idx, start_tok,
    * n_tokens, chunk_text). */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"chunkOverlap: size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"chunkOverlap: stride must be in [1, size], got $stride")
    docs
      .select(col(idCol), graft.functions.Text.wsTokens(col(textCol)).as("_toks"))
      .filter(size_(col("_toks")) >= 1)
      .select(col(idCol), col("_toks"),
        // sequence(0, n-1, stride) = every chunk start below the token
        // count, directly — no div/mod arithmetic to mirror in SQL
        posexplode(sequence(lit(0), size_(col("_toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(size), size_(col("_toks")) - col("start_tok")).cast("long")
          .as("n_tokens"),
        concat_ws(" ", slice(col("_toks"), col("start_tok") + 1, lit(size)))
          .as("chunk_text"))
  }

  // functions.size is shadowed by the `size` parameter above
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** C110 — context-length sweep: the packing-efficiency table read
    * when choosing a training context length. For each candidate
    * capacity, the [[sequencePack]] layout is summarized to the four
    * numbers that trade off against each other: `n_chunks` (= training
    * steps per epoch), `docs_split`/`boundary_crossings` (documents
    * broken across context windows — cross-attention contamination a
    * longer context reduces), `tail_waste` (pad tokens in each shard's
    * final partial chunk — the only waste in concat-and-chunk packing,
    * which a SHORTER context reduces), and the resulting `fill_rate`.
    *
    * Scale shape: one shard-windowed pass per capacity (sequencePack's
    * single exchange), each reduced shard-locally to shard-cardinality
    * rows before a final tiny agg — k capacities cost k passes over
    * the token-count projection (never the text), by design: the
    * sweep is a one-off planning query, and fusing the capacities into
    * one pass would trade k cheap column scans for a k-wide row
    * explosion. All counts are exact integer algebra; `fill_rate` is
    * one IEEE division, rounded 6. */
  /** C118 — T5-style span corruption (Raffel et al. 2020 §3.1.4): mask
    * token spans and emit the (input with sentinels, target with the
    * masked spans) pair a denoising trainer consumes — the step that
    * turns curated text into seq2seq pretraining examples. Masking is
    * BLOCK-GRIDDED: tokens partition into fixed `grid`-token blocks and
    * a seeded hash of (id, block, seed) masks the block's first
    * 0..`maxMask` tokens — the relational formulation of span
    * corruption (T5's sequential greedy draw needs a per-token running
    * fold; the grid keeps spans non-overlapping BY CONSTRUCTION with
    * the same expected mask rate, E[min(L, rem)]/grid ≈ 21 % at the
    * demo's grid=7, maxMask=3). Masked span k reads `<extra_id_k>` in
    * the input; the target is the T5 convention `<extra_id_0> span
    * <extra_id_1> span …`. Deterministic, seed-keyed,
    * partitioning-invariant (the hash-race discipline).
    *
    * Scale shape: pure higher-order Column algebra over the token
    * array — map-only whole-stage codegen, no explode, no shuffle, no
    * UDF; corpus-parallel at any scale. Output: (id, n_tokens,
    * n_masked, input_text, target_text). */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  grid: Int, maxMask: Int, seed: Long): DataFrame = {
    require(grid >= 1 && maxMask >= 0 && maxMask <= grid,
      s"spanCorrupt: need grid >= 1 and 0 <= maxMask <= grid, got ($grid, $maxMask)")
    def maskLen(b: Column, n: Column): Column = least(
      pmod(graft.functions.Vec.md5Hash60(concat(
        col(idCol).cast("string"), lit("#"), b.cast("string"), lit("#" + seed))),
        lit(maxMask + 1L)),
      n - b * grid)
    def sentinel(i: Column): Column =
      concat(lit("<extra_id_"), i.cast("string"), lit(">"))
    val toks = graft.functions.Text.wsTokens(col(textCol))
    val out = docs
      .select(col(idCol), toks.as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      // sequence(0, -1) would infer step -1; guard the tokenless case.
      // `div`, not `/`: Long / Int promotes to double division
      .withColumn("_blocks", when(col("_n") > 0,
        sequence(lit(0L), expr(s"(_n + ${grid - 1}) div $grid") - 1))
        .otherwise(array().cast("array<bigint>")))
      .withColumn("_masked",
        filter(col("_blocks"), b => maskLen(b, col("_n")) >= 1))
    out.select(col(idCol), col("_n").as("n_tokens"),
      coalesce(aggregate(col("_masked"), lit(0L),
        (acc, b) => acc + maskLen(b, col("_n"))), lit(0L)).as("n_masked"),
      concat_ws(" ", flatten(transform(col("_blocks"), b => {
        val l = maskLen(b, col("_n"))
        val rest = slice(col("_toks"), b * grid + l + 1, lit(grid) - l)
        when(l >= 1, concat(
          array(sentinel(array_position(col("_masked"), b) - 1)), rest))
          .otherwise(rest)
      }))).as("input_text"),
      concat_ws(" ", flatten(transform(col("_masked"), (b, i) =>
        concat(array(sentinel(i)),
          slice(col("_toks"), b * grid + 1, maskLen(b, col("_n")))))))
        .as("target_text"))
  }

  def packingSweep(df: DataFrame, shardCol: String, orderCol: String,
                   tokensCol: String, capacities: Seq[Int]): DataFrame = {
    require(capacities.nonEmpty && capacities.forall(_ > 0),
      "packingSweep: capacities must be positive")
    capacities.map { c =>
      val packed = sequencePack(df, shardCol, orderCol, tokensCol, c)
      val perShard = packed.groupBy(col(shardCol))
        .agg(sum("n_tokens").as("toks"), count(lit(1)).as("docs"),
          sum(when(col("n_chunks") >= 2, 1L).otherwise(0L)).as("splits"),
          sum(when(col("n_chunks") >= 2, col("n_chunks") - 1L)
            .otherwise(0L)).as("crossings"))
        .withColumn("chunks",
          when(col("toks") > 0, expr(s"(toks + ${c - 1}) div $c"))
            .otherwise(lit(0L)))
      perShard.agg(sum("docs").as("n_docs"), sum("toks").as("total_tokens"),
          sum("chunks").as("n_chunks"), sum("splits").as("docs_split"),
          sum("crossings").as("boundary_crossings"))
        .select(lit(c).as("capacity"), col("n_docs"), col("total_tokens"),
          col("n_chunks"), col("docs_split"), col("boundary_crossings"),
          (col("n_chunks") * c - col("total_tokens")).as("tail_waste"),
          round(when(col("n_chunks") > 0,
            col("total_tokens").cast("double") /
              (col("n_chunks") * c).cast("double")).otherwise(0.0), 6)
            .as("fill_rate"))
    }.reduce(_ unionByName _).orderBy("capacity")
  }
}
