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

  /** Overwrite `table` via write-to-temp + catalog swap: the (long)
    * write runs against `{table}__swap`, so a mid-write failure leaves
    * any existing `table` fully queryable; only after the temp commits
    * is the old table dropped and the temp renamed over it. The rename
    * is a catalog metadata op (it relocates a MANAGED table's
    * directory — cheap on HDFS-like stores; on an object store prefer
    * the external-location form below). The exposure window shrinks
    * from the whole write to the drop→rename pair; a crash exactly
    * there loses the NAME binding but never the data (the committed
    * swap table remains, and the next call clears it).
    *
    * With `path` (external location) the swap is unavailable — two
    * tables cannot own one directory — so the old DESTRUCTIVE
    * drop-first contract applies: failure mid-write leaves NO table,
    * and an unrelated same-named table is destroyed. Callers own name
    * uniqueness — the in-repo demos take run-unique names from
    * [[graft.util.Fixtures]] and write each at most once per run. */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], numBuckets: Int,
                    sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    val spark = df.sparkSession
    def write(name: String): Unit = {
      val w0 = df.write.mode(SaveMode.Overwrite)
      val w = path.fold(w0)(p => w0.option("path", p))
        .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
        .saveAsTable(name)
    }
    // a CTAS that dies MID-WRITE leaves its managed location on disk
    // with NO catalog entry; DROP TABLE can't clear what was never
    // cataloged, and the next CTAS on the name then refuses with
    // LOCATION_ALREADY_EXISTS. This was the r10 intermittent
    // full-suite BucketingSpec flake: under load, the failed write's
    // task-abort cleanup sometimes loses the race and strands the
    // directory. Sweep the orphan location explicitly whenever the
    // name is uncataloged.
    def clearOrphanLocation(name: String): Unit = {
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
      if (!spark.sessionState.catalog.tableExists(ident)) {
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.defaultTablePath(ident))
        val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(loc)) fs.delete(loc, true)
      }
    }
    if (path.isDefined) {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      write(table)
    } else {
      val swap = s"${table}__swap"
      spark.sql(s"DROP TABLE IF EXISTS `$swap`") // a crashed prior attempt
      clearOrphanLocation(swap) // ...and its stranded managed dir
      write(swap) // failure HERE leaves the existing `table` untouched
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      clearOrphanLocation(table)
      spark.sql(s"ALTER TABLE `$swap` RENAME TO `$table`")
    }
  }
}
