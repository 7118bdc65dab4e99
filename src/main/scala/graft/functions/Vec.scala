package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector and hashing primitives for similarity search and near-dup
  * detection (SURVEY §2C), as Column expressions over higher-order
  * functions. Dot products fold left with a 0.0 init so the DuckDB
  * oracle's `list_reduce` reproduces the exact summation order
  * (bit-identical doubles, no approximate compare needed).
  */
object Vec {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** left-fold sum of an array<double> */
  def fsum(v: Column): Column = aggregate(v, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(toDouble(a), toDouble(b), (x, y) => x * y))

  def norm2(a: Column): Column = fsum(transform(toDouble(a), x => x * x))

  /** cosine similarity, computed as dot / (sqrt(na) * sqrt(nb)) */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** codegen'd dot product (graft.expressions.DotProduct, registered by
    * GraftExtensions) — same left-fold order as [[dot]], bit-identical
    * results, ~no interpretation overhead. Requires a session built via
    * GraftSession (or spark.sql.extensions=graft.GraftExtensions). */
  def dotFast(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** cosine over [[dotFast]]; bit-identical to [[cosine]] */
  def cosineFast(a: Column, b: Column): Column =
    dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b)))

  // ---- MinHash ----------------------------------------------------------

  val MinhashPrime = 2038074743L // large prime < 2^31 so a*h+b stays in i64

  /** 60-bit token hash reproducible across engines (md5 hex prefix as
    * int), equal to `conv(substring(md5(c), 1, 15), 16, 10)` — served
    * by the native [[graft.expressions.Md5Prefix]] (thread-local
    * digest, no hex/conv round-trip; requires a GraftSession, the
    * dotFast convention). Slower than xxhash64 — use for cross-engine
    * verification; production paths default to xxhash64. */
  def md5Hash60(c: Column): Column =
    call_function("graft_md5_prefix", c, lit(15))

  /** base hashes for minhashing: xxhash64 mod p per token. Materialize
    * this as its own projected column BEFORE calling
    * [[minhashSignature]] — otherwise every permutation re-hashes every
    * token (k× the work). */
  def minhashBaseHashes(tokens: Column): Column =
    transform(tokens, t => pmod(xxhash64(t), lit(MinhashPrime)))

  /** k minhash values over pre-hashed tokens ([[minhashBaseHashes]]).
    * Permutation i is (a_i * h + b_i) mod p with deterministic a_i, b_i. */
  def minhashSignature(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val a = i * 2 + 1
      val b = pmod(i * 2654435761L, lit(MinhashPrime))
      aggregate(hashes, lit(MinhashPrime),
        (m, h) => least(m, pmod(a * h + b, lit(MinhashPrime))))
    })

  /** band hashes for LSH: split the signature into `bands` equal bands,
    * hash each band to one long -> array of (band keys). */
  def lshBandKeys(signature: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",", transform(slice(signature, b * rows + 1, lit(rows)), x => x.cast("string"))), b))
  }

  /** string band keys (no hashing) — more shuffle bytes but exactly
    * reproducible in a SQL oracle; pair with posexplode band index. */
  def lshBandKeyStrings(signature: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(",", transform(slice(signature, b * rows + 1, lit(rows)), x => x.cast("string"))))
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit simhash over a token array: bit j is the sign of the vote
    * sum of bit j across xxhash64(token). The bit loop is unrolled
    * Scala-side (shift amounts must be literals), giving one wide but
    * fully codegen'd expression. */
  def simhash(tokens: Column): Column =
    (0 until 64).map { j =>
      val vote = aggregate(tokens, lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** hamming distance between two 64-bit hashes */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  /** 4 equal bit-bands of a simhash (banded near-dup candidates: low-
    * hamming pairs share at least one band). `bits` must divide by 4. */
  def simhashBands(h: Column, bits: Int = 64): Column = {
    val w = bits / 4
    val mask = (1L << w) - 1
    array((0 until 4).map(b => shiftright(h, b * w).bitwiseAND(mask)): _*)
  }

  // ---- Random-hyperplane LSH for embeddings ----------------------------

  /** deterministic pseudo-random hyperplanes (seeded, fixed across runs) */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** sign-bit bucket id of a vector under the given hyperplanes */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val dv = toDouble(v)
    planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      val d = fsum(zip_with(dv, planeCol, (x, w) => x * w))
      when(d > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
