package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * One untimed warmup pass runs first (JIT + codegen compilation are
  * one-time JVM costs, not per-query plan costs — a 1000-executor run
  * amortizes them to nothing), then the timed pass. Set
  * SPARK_GRAFT_WARMUP=0 to skip the warmup for cold numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
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
    // Right(seconds) on success, Left(exception class) on failure — a broken
    // query must surface as "error", never bench as a fast success.
    val results = all.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val r = try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
              catch { case e: Throwable => Left(e.getClass.getSimpleName) }
      graft.util.CacheRegistry.releaseAll()
      name -> r
    }
    val qs = results.map {
      case (k, Right(sec)) => "\"" + k + "\":" + sec
      case (k, Left(err))  => "\"" + k + "\":\"error:" + err + "\""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.collect { case Right(s) => s }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
