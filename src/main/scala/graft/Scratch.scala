package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vec}
import graft.sources.Tables

// temporary profiling probe — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $tag pass $i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n)")
      }

    val docs = Tables.documents(spark, sfDir)
    docs.count()

    val explodedHof = docs
      .select(col("doc_id"), explode(Text.wsTokens(col("text"))).as("t"))
    time("tokens-hof-filter") { explodedHof.count() }

    val explodedRel = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    time("tokens-explode-where") { explodedRel.count() }

    val hashed = explodedRel.select(col("doc_id"), Vec.md5Hash60(col("t")).as("h"))
    time("md5-hash60") { hashed.count() }

    val bits = 60
    val votes = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"_v$j")
    }
    val agg = hashed.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    time("simhash-votes-60agg") { agg.count() }
    spark.stop()
  }
}
