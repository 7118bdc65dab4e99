package graft.util

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession

/** Run-scoped demo fixtures: unique tmp directories and catalog table
  * names, plus the end-of-run janitor.
  *
  * Some oracle demos must BUILD their input before exercising the
  * operator under test (paged_ingest writes page_N.json files,
  * bucketed_colocated_join writes bucketed table copies, the streaming
  * parity rows stage file-source input). Two problems with fixed tmp
  * paths keyed only by SF:
  *
  *  - two concurrent runs at the same SF race on the shared dir and on
  *    global catalog table names;
  *  - repeated driver runs accumulate fixture state forever (tmpdir
  *    and spark-warehouse grow per run).
  *
  * So every fixture path/table carries [[runId]] — unique per JVM — and
  * registers here; [[sweep]] (called by Verify/Bench after the last
  * query, the same place CacheRegistry releases) deletes the lot.
  * WITHIN a run, a fixture keyed by (name, SF) is built once and reused:
  * the bench's three passes then time the operator, not the fixture
  * write ([[buildOnce]]).
  */
object Fixtures {

  /** unique per JVM: concurrent runs at the same SF never share paths */
  val runId: String = java.util.UUID.randomUUID().toString.take(8)

  // ConcurrentHashMap-backed sets: registration is one atomic O(1)
  // `add` (the previous queue's check-then-act contains+add could
  // double-register under concurrency and scanned O(n) per call)
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private val tables = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // exit-only paths (session warehouses): deleted by the JVM hook but
  // NEVER by sweep() — sweep runs while the owning session may still
  // be live, and wiping its warehouse mid-run would break the catalog
  private val atExit = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  // last-resort dir cleanup for JVMs that never reach an explicit
  // sweep() (test runs, aborted mains). Tables need no hook: they live
  // in the session warehouse, itself an [[atExit]] path here.
  // Registration must survive being first-touched FROM another
  // shutdown hook: addShutdownHook throws IllegalStateException
  // mid-shutdown, and an uncaught throw here would fail this object's
  // static init — every later reference becomes NoClassDefFoundError.
  try Runtime.getRuntime.addShutdownHook(new Thread(() => {
    Seq(dirs, atExit).foreach { set =>
      val it = set.iterator()
      while (it.hasNext) {
        try deleteRecursively(it.next()) catch { case _: Exception => () }
        it.remove()
      }
    }
  })) catch { case _: IllegalStateException => () }

  /** run-unique tmp dir for fixture `key`; registered for [[sweep]].
    * Stable within the run — same key, same path. */
  def dir(key: String): Path = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_${key}_$runId")
    dirs.add(p)
    p
  }

  /** run-unique catalog table name; registered for [[sweep]]. The key
    * is sanitized to identifier characters — a dot (e.g. an "sf0.01"
    * basename) would parse as a schema separator in saveAsTable. */
  def tableName(key: String): String = {
    val n = s"graft_${key.replaceAll("[^A-Za-z0-9_]", "_")}_$runId"
    tables.add(n)
    n
  }

  /** register a path for deletion at JVM exit ONLY (not by [[sweep]]):
    * the janitor home for per-session state like GraftSession's
    * warehouse dir, replacing one shutdown-hook thread per session. */
  def registerPath(p: Path): Unit = atExit.add(p)

  /** Build the fixture under `path` exactly once per run: `build` runs
    * only when no committed marker exists, then the marker commits it.
    * Callers re-invoking the same demo (bench pass 2/3) skip straight
    * to the operator under test. The marker is written AFTER the build
    * completes, so a crashed half-build is rebuilt, never trusted. */
  def buildOnce(path: Path)(build: => Unit): Path = {
    val marker = path.resolve("_GRAFT_BUILT")
    if (!Files.exists(marker)) {
      Files.createDirectories(path)
      build
      Files.createFile(marker)
    }
    path
  }

  /** End-of-run janitor: drop registered tables, delete registered
    * dirs. Idempotent; failures are logged, not thrown — cleanup must
    * never fail the run that produced correct results. */
  def sweep(spark: SparkSession): Unit = {
    val ti = tables.iterator()
    while (ti.hasNext) {
      val t = ti.next()
      try spark.sql(s"DROP TABLE IF EXISTS `$t`")
      catch { case e: Exception =>
        Console.err.println(s"[fixtures] drop $t failed: ${e.getMessage}") }
      ti.remove()
    }
    val di = dirs.iterator()
    while (di.hasNext) {
      val d = di.next()
      try deleteRecursively(d)
      catch { case e: Exception =>
        Console.err.println(s"[fixtures] delete $d failed: ${e.getMessage}") }
      di.remove()
    }
  }

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p) && !Files.isSymbolicLink(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively(_)) finally children.close()
      }
      Files.deleteIfExists(p)
    }
}
