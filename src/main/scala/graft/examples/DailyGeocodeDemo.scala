package graft.examples

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Geocode
import graft.util.RateLimited

/** The reference's daily incremental geocode job end-to-end
  * (geocode.js:542-549 write-back loop): day 1 geocodes the roster and
  * appends every hit to the cache snapshot; day 2 re-runs the SAME
  * roster plus a delta — only the delta reaches the (rate-limited)
  * resolver stage. Run:
  * `sbt "runMain graft.examples.DailyGeocodeDemo [cacheDir]"` */
object DailyGeocodeDemo {
  def main(args: Array[String]): Unit = {
    val cacheDir = args.headOption
      .getOrElse(Files.createTempDirectory("graft_geo_cache").toString)
    val spark = GraftSession.local("graft-daily-geocode", "8", 8)
    import spark.implicits._

    // stand-in external geocoder: per-partition rate-limited calls
    // (A14), deterministic hash coordinates; a real deployment swaps
    // the body for the HTTP client + backoff
    def resolver(cands: org.apache.spark.sql.DataFrame) = {
      val withNo = cands.filter(col("candidate").rlike("\\d+號$"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("candidate",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lat",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("lng",
          org.apache.spark.sql.types.DoubleType)))
      val queries = withNo.select(col("candidate")).distinct()
      queries.mapPartitions { it =>
        RateLimited.mapRateLimited(it, minIntervalMs = 1) { r =>
          val q = r.getString(0)
          val h = scala.util.hashing.MurmurHash3.stringHash(q)
          org.apache.spark.sql.Row(q,
            22.0 + (math.abs(h) % 1000) / 1000.0,
            120.0 + (math.abs(h / 7) % 1000) / 1000.0)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    }

    val day1 = Seq(
      (1L, "台北市大安區和平東路12巷34號"),
      (2L, "高雄市左營區中山路5號"),
      (3L, "臺中市北區三民路三段129號")).toDF("id", "addr")
    val r1 = Geocode.dailyGeocode(day1, "id", "addr", cacheDir, 0L)(resolver)
    println(s"[daily-geocode] day 1: " + r1.groupBy("source").count().collect()
      .map(r => s"${r.get(0)}=${r.getLong(1)}").sorted.mkString(" "))
    graft.util.CacheRegistry.releaseAll()

    val day2 = day1.unionByName(Seq(
      (4L, "臺南市安平區育平路77號")).toDF("id", "addr"))
    val r2 = Geocode.dailyGeocode(day2, "id", "addr", cacheDir, 1L)(resolver)
    println(s"[daily-geocode] day 2: " + r2.groupBy("source").count().collect()
      .map(r => s"${r.get(0)}=${r.getLong(1)}").sorted.mkString(" "))
    graft.util.CacheRegistry.releaseAll()
    println(s"[daily-geocode] cache snapshot rows: " +
      graft.streaming.EventStream.readLatestState(spark, cacheDir).count())
    println(s"[daily-geocode] cache at $cacheDir")
    spark.stop()
  }
}
