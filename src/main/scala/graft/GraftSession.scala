package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-minded defaults.
  *
  * Local runs use `local[N]` with `spark.sql.shuffle.partitions` sized to
  * the core count (not the 200 default); on a real cluster the same confs
  * apply with AQE coalescing post-shuffle partitions at runtime.
  */
object GraftSession {

  def local(appName: String = "graft",
            cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            shufflePartitions: Int = 32): SparkSession = {
    val warehousePath = java.nio.file.Files.createTempDirectory("graft_warehouse")
    // session-unique warehouse (concurrent local sessions must not share
    // catalog state), removed at JVM exit so repeated runs leave tmpdir
    // flat. Routed through the single Fixtures janitor hook rather than
    // one hook per session: a long-lived process creating many short
    // sessions must not accumulate hook threads, and Fixtures already
    // survives first-touch during shutdown (d353d84).
    graft.util.Fixtures.registerPath(warehousePath)
    val warehouse = warehousePath.toString
    val spark = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.warehouse.dir", warehouse)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the testdata events table carries parquet TIMESTAMP(NANOS); read
      // as long nanos and convert explicitly (Spark has no ns timestamps)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft's conf set to an externally-built session builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
