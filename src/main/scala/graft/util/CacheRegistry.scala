package graft.util

import org.apache.spark.sql.Dataset

/** Session-wide registry of persisted intermediates.
  *
  * Operators that `persist()` a table consumed lazily by their caller
  * (the banded LSH tables in [[graft.operators.Dedup]] /
  * [[graft.operators.Similarity]]) cannot unpersist it themselves — the
  * consuming action happens after they return. Without cleanup, a
  * long-lived session running many queries accumulates cached
  * partitions without bound (the reference symptom: `CacheManager:
  * Asked to cache already cached data` on every rerun).
  *
  * Contract: operators register each persisted table; the driver loop
  * (Verify / Bench / any long-lived service) calls [[releaseAll]] after
  * materializing each query's output. Unpersisting is non-blocking and
  * safe at any point — worst case the table recomputes.
  */
object CacheRegistry {

  private val tables = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Track a persisted dataset for later release; returns it unchanged. */
  def register[T](ds: Dataset[T]): Dataset[T] = { tables.add(ds); ds }

  /** Unpersist (non-blocking) everything registered since the last call. */
  def releaseAll(): Unit = {
    var ds = tables.poll()
    while (ds != null) { ds.unpersist(blocking = false); ds = tables.poll() }
  }
}
