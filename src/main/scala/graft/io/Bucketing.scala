package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables for co-located joins (SURVEY §5 / §2 B16).
  *
  * Writing both sides of a recurring fact-fact join bucketed (and
  * sorted) on the join key pre-pays the shuffle once at write time:
  * every subsequent join on that key sort-merge-joins bucket-to-bucket
  * with NO exchange. At 100 TB this is the difference between a nightly
  * pipeline re-shuffling the same fact table per query and reading it
  * join-ready. Bucket counts should divide evenly into executor
  * parallelism; pick them per expected table size, not per cluster.
  */
object Bucketing {

  /** DESTRUCTIVE drop-first contract: any existing table named `table`
    * is dropped before the write (Overwrite alone refuses a
    * location/schema change on an existing external table definition),
    * so a failure mid-write leaves NO table, and an unrelated table of
    * the same name is destroyed. Callers own name uniqueness — the
    * in-repo demos take run-unique names from [[graft.util.Fixtures]]
    * and write each at most once per run. */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], numBuckets: Int,
                    sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val w0 = df.write.mode(SaveMode.Overwrite)
    val w = path.fold(w0)(p => w0.option("path", p))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
