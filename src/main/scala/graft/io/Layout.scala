package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
}
