package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline (SURVEY §2C),
  * all pure Column expressions over built-in higher-order functions —
  * no UDFs, so everything stays inside whole-stage codegen and scales
  * linearly with tokens per row.
  */
object Text {

  /** whitespace tokens, empties dropped */
  def wsTokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** whitespace token count (long) */
  def tokenCount(c: Column): Column = size(wsTokens(c)).cast("long")

  /** BPE-ish subword proxy: alpha runs, single digits, single symbols */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0))).cast("long")

  /** small fixed stopword list used by quality scoring + language ID */
  val EnStops = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")

  def stopwordHits(tokens: Column, stops: Seq[String]): Column =
    size(filter(tokens, t => t.isin(stops.map(s => s: Any): _*))).cast("long")

  /** composite quality score in [0,1]: length saturation + stopword
    * ratio + alpha ratio. Single deterministic expression tree so the
    * DuckDB oracle reproduces it bit-exactly. */
  def qualityScore(c: Column): Column = {
    val toks = wsTokens(c)
    val nTok = size(toks).cast("double")
    val stopRatio = when(nTok > 0, stopwordHits(toks, EnStops).cast("double") / nTok).otherwise(0.0)
    val alphaHits = size(regexp_extract_all(c, lit("[A-Za-z]"), lit(0))).cast("double")
    val alphaRatio = when(length(c) > 0, alphaHits / length(c).cast("double")).otherwise(0.0)
    lit(0.4) * least(nTok / 100.0, lit(1.0)) + lit(0.3) * stopRatio + lit(0.3) * alphaRatio
  }

  /** Canonical text for dedup keys (SURVEY §2 C57) — the normalization
    * every near-dup family here keys on, folding the three equivalence
    * classes that defeat byte-level hashing: Unicode canonical
    * equivalence (NFC via the codegen'd [[graft.expressions
    * .NfcNormalize]] — precomposed é vs e+combining-accent), case, and
    * punctuation/whitespace variation (non-letter/digit runs → one
    * space, collapsed, trimmed). Stays inside whole-stage codegen
    * end-to-end; map-only at any scale. */
  def canonicalText(c: Column): Column = {
    val folded = lower(call_function("graft_nfc", c))
    trim(regexp_replace(
      regexp_replace(folded, "[^\\p{L}\\p{N}\\s]+", " "), "\\s+", " "))
  }

  /** per-language stopword profiles for the n-gram/stopword language ID */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  /** (predicted language, hit count of the winning profile); ties break
    * by profile order, zero hits -> "und" */
  def langId(c: Column): (Column, Column) = {
    val toks = wsTokens(lower(c))
    val hits = LangProfiles.map { case (lang, stops) => lang -> stopwordHits(toks, stops) }
    val mx = greatest(hits.map(_._2): _*)
    // first profile in declaration order wins ties, matching the oracle CASE
    val pred = hits.foldRight(lit("und")) { case ((lang, h), els) =>
      when(h === mx && mx > 0, lit(lang)).otherwise(els)
    }
    (pred, mx)
  }

  /** polynomial rolling hash (base 131 mod 1e9+7) over characters —
    * the document fingerprint (deterministic, oracle-reproducible) */
  def fingerprint(c: Column): Column = {
    val codes = transform(regexp_extract_all(c, lit("."), lit(0)), ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L), (h, code) => (h * 131L + code) % 1000000007L)
  }

  /** word n-gram shingles INCLUDING duplicates (for repetition stats).
    * Native one-pass codegen expression
    * ([[graft.expressions.WordShingles]]); semantics identical to the
    * HOF chain `transform(sequence, i -> concat_ws(" ", slice(toks, i, n)))`
    * it replaces — which ran interpreted and dominated every shingle
    * pipeline's cost. */
  def shinglesWithDuplicates(c: Column, n: Int): Column =
    call_function("graft_shingles", c, lit(n), lit(false))

  /** word n-gram shingles (distinct, first-occurrence order), space-
    * joined — the native form of the HOF chain + array_distinct. */
  def shingles(c: Column, n: Int): Column =
    call_function("graft_shingles", c, lit(n), lit(true))

  /** character n-gram shingles (distinct, first-occurrence order) —
    * the CJK configuration of near-dup hashing: unspaced scripts have
    * no word boundaries, so shingle code points instead
    * ([[graft.expressions.CharShingles]], surrogate-pair safe). */
  def charShingles(c: Column, n: Int): Column =
    call_function("graft_char_shingles", c, lit(n), lit(true))

  /** [[charShingles]] INCLUDING duplicates (CJK repetition stats) */
  def charShinglesWithDuplicates(c: Column, n: Int): Column =
    call_function("graft_char_shingles", c, lit(n), lit(false))

  /** code points as single-char tokens — the CJK tokenizer for
    * simhash-style per-token hashing over unspaced scripts */
  def charTokens(c: Column): Column =
    call_function("graft_char_shingles", c, lit(1), lit(false))

  /** the interpreted HOF formulation of [[shingles]] — kept as the
    * semantics reference; specs assert bit-equality with the native
    * expression. */
  def shinglesHof(c: Column, n: Int): Column = {
    val toks = wsTokens(c)
    // sequence(1, k) descends when k < 1, so guard short docs explicitly
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }
}
