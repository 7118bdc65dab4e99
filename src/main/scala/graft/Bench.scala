package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * One untimed warmup pass runs first (JIT + codegen compilation are
  * one-time JVM costs, not per-query plan costs — a 1000-executor run
  * amortizes them to nothing), then `SPARK_GRAFT_PASSES` (default 3)
  * timed passes per query, reported as the MEDIAN with min/max spread —
  * a single pass cannot tell a plan regression from a GC pause, and
  * round-3's "regressions" (time_window_agg 0.30→0.88s) turned out to
  * be exactly that. Passes run back-to-back per query (not pass-major)
  * so each query's samples share the same JVM/GC context.
  * Set SPARK_GRAFT_WARMUP=0 to skip the warmup for cold numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt.max(1)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = SparkEntry.queries ++ SparkEntry.benchExtras
    if (warmup) {
      all.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        graft.util.CacheRegistry.releaseAll()
      }
      spark.sharedState.cacheManager.clearCache() // no data-cache carryover
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Right(pass times) on success, Left(exception class) on failure — a
    // broken query must surface as "error", never bench as a fast success.
    val results = all.map { case (name, fn) =>
      val r = try Right((1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.util.CacheRegistry.releaseAll()
        sec
      }) catch {
        case e: Throwable =>
          graft.util.CacheRegistry.releaseAll()
          Left(e.getClass.getSimpleName)
      }
      name -> r
    }
    val qs = results.map {
      case (k, Right(ts)) => "\"" + k + "\":" + median(ts)
      case (k, Left(err)) => "\"" + k + "\":\"error:" + err + "\""
    }.mkString("{", ",", "}")
    val spread = results.collect { case (k, Right(ts)) =>
      "\"" + k + "\":{\"median\":" + median(ts) + ",\"min\":" + ts.min +
        ",\"max\":" + ts.max + "}"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.collect { case Right(ts) => median(ts) }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"passes":$passes,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // the driver's artifact pipeline has head-truncated long bench lines
    // (BENCH_r03/r04); keep the complete record in the repo as well
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"${System.getProperty("user.dir")}/BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Exception =>
      Console.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    // append-only history so every run stays machine-comparable across
    // rounds even when the driver's per-round tail capture truncates
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${System.getProperty("user.dir")}/BENCH_HISTORY.jsonl"),
      json + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Exception =>
      Console.err.println(s"[bench] could not append history: ${e.getMessage}") }
    // fixture janitor: drop run-scoped demo tables + tmp dirs so
    // repeated bench runs leave tmpdir/spark-warehouse flat
    graft.util.Fixtures.sweep(spark)
    spark.stop()
  }
}
