package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scan-friendly file layout (SURVEY §2 A12 adjunct): range-partitioned,
  * sorted-within-partition parquet writes.
  *
  * `repartitionByRange` gives every output file a DISJOINT key range
  * (sampled range boundaries, so files are also size-balanced under
  * skew), and the in-partition sort tightens each file's min/max
  * footer stats to its true range. Any engine that reads parquet
  * statistics — Spark's own scan included — then skips every file
  * whose range misses the predicate: at 100 TB this is the difference
  * between touching one file and scanning a directory. The same write
  * discipline is what makes the bucketed-join path (io.Bucketing)
  * and snapshot reads (WrappedExport) cheap to consume. */
object Layout {

  /** write `df` as `nFiles` sorted, range-disjoint parquet files. */
  def writeSorted(df: DataFrame, sortCols: Seq[String], nFiles: Int,
                  outPath: String): Unit =
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(outPath)

  /** bit-interleave the low `bits` of two non-negative long columns:
    * the Morton (Z-order) index */
  private def interleaveBits(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Z-ORDER write layout: cluster files along the Morton curve of TWO
    * numeric keys, so a range predicate on EITHER key prunes files via
    * parquet min/max stats. [[writeSorted]] on (a, b) prunes only on
    * `a` — every file spans all of `b`; interleaving the keys' bits
    * makes each file a compact 2-D block, so an `nFiles`-file layout
    * touches ~sqrt(nFiles) files for a narrow slab in either dimension.
    * The per-key [min, max] scaling reduces to ONE broadcast row (the
    * quantileOutliers discipline — no driver collect), the z-index is
    * a pure codegen'd bit expression, and the data shuffles exactly
    * once (range partition on z). This is the two-key file-pruning
    * layout Delta/Iceberg OPTIMIZE ZORDER applies, as a plain
    * parquet-write discipline. */
  def writeZOrdered(df: DataFrame, keyA: String, keyB: String, nFiles: Int,
                    outPath: String, bits: Int = 16): Unit = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val maxRank = (1L << bits) - 1
    val mm = df.agg(
      min(col(keyA)).cast("double").as("_alo"), max(col(keyA)).cast("double").as("_ahi"),
      min(col(keyB)).cast("double").as("_blo"), max(col(keyB)).cast("double").as("_bhi"))
    def rank(c: String, lo: Column, hi: Column): Column =
      when(hi > lo,
        floor((col(c).cast("double") - lo) / (hi - lo) * maxRank).cast("long"))
        .otherwise(lit(0L))
    df.crossJoin(broadcast(mm))
      .withColumn("_z", interleaveBits(
        rank(keyA, col("_alo"), col("_ahi")),
        rank(keyB, col("_blo"), col("_bhi")), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
      .write.mode(SaveMode.Overwrite).parquet(outPath)
  }
}
