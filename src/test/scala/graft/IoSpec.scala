package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.WrappedExport
import graft.sources.PagedIngest
import graft.util.RateLimited

class IoSpec extends SparkSpec {
  import spark.implicits._

  def tmp(): String = tempDir("graft_io")

  test("A12 wrapped frame: {group, total, rows} with total == |rows|") {
    val df = Seq(("tw", 1, "a"), ("tw", 2, "b"), ("jp", 3, "c")).toDF("county", "id", "v")
    val rows = WrappedExport.wrappedFrame(df, "county").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("total") == r.getSeq[Any](r.fieldIndex("rows")).size)
    }
  }

  test("A12 wrapped JSON round-trips and partitioned CSV preserves rows") {
    val df = Seq(("tw", 1, "a,b"), ("tw", 2, "c\"d"), ("jp", 3, "e")).toDF("county", "id", "v")
    val j = tmp(); val c = tmp()
    WrappedExport.wrappedJson(df, "county", j)
    val back = spark.read.json(j)
    assert(back.count() == 2)
    assert(back.filter(col("county") === "tw").head.getAs[Long]("total") == 2)
    WrappedExport.partitionedCsv(df, "county", c)
    val csvBack = spark.read.option("header", "true").csv(c)
    assert(csvBack.count() == 3)
    assert(csvBack.filter(col("v") === "c\"d").count() == 1) // quoting survived
  }

  test("A12 snapshot keeps dated copies and re-points current") {
    val base = tmp()
    WrappedExport.snapshot(Seq((1, "x")).toDF("id", "v"), base, "20260101T000000Z")
    WrappedExport.snapshot(Seq((2, "y")).toDF("id", "v"), base, "20260102T000000Z")
    assert(spark.read.parquet(s"$base/current").head.getInt(0) == 2)
    assert(spark.read.parquet(s"$base/snapshots/20260101T000000Z").head.getInt(0) == 1)
  }

  test("A12 snapshot retention keeps only the newest N dated dirs") {
    val base = tmp()
    for (d <- 1 to 5)
      WrappedExport.snapshot(Seq((d, "x")).toDF("id", "v"), base,
        f"2026010${d}T000000Z", retain = 2)
    val kept = new java.io.File(s"$base/snapshots").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(kept.sameElements(Array("20260104T000000Z", "20260105T000000Z")), kept.toSeq)
    assert(spark.read.parquet(s"$base/current").head.getInt(0) == 5)
    intercept[IllegalArgumentException] {
      WrappedExport.snapshot(Seq((9, "x")).toDF("id", "v"), base,
        "20260106T000000Z", retain = 0)
    }
    // a crashed PARTIAL snapshot (no _SUCCESS) must not occupy a
    // retention slot (which would evict a good snapshot) and must not
    // be deleted (it is crash debris for the operator, not ours)
    val partial = new java.io.File(s"$base/snapshots/20260106T000000Z")
    partial.mkdirs()
    WrappedExport.snapshot(Seq((7, "x")).toDF("id", "v"), base,
      "20260107T000000Z", retain = 2)
    val after = new java.io.File(s"$base/snapshots").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(after.sameElements(Array(
      "20260105T000000Z", "20260106T000000Z", "20260107T000000Z")), after.toSeq)
  }

  test("A12 readSnapshotOrEmpty: empty frame with schema on first run, data after") {
    val base = tmp()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val empty = WrappedExport.readSnapshotOrEmpty(spark, s"$base/current", schema)
    assert(empty.count() == 0 && empty.schema == schema)
    WrappedExport.snapshot(Seq((7, "z")).toDF("id", "v"), base, "20260103T000000Z")
    val loaded = WrappedExport.readSnapshotOrEmpty(spark, s"$base/current", schema)
    assert(loaded.count() == 1 && loaded.head.getInt(0) == 7)
  }

  test("A13 paged ingest unions page files with provenance") {
    val dir = tmp()
    Files.writeString(java.nio.file.Path.of(dir, "page_0001.json"),
      """[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]""")
    Files.writeString(java.nio.file.Path.of(dir, "page_0002.json"),
      """[{"id": 3, "name": "c"}]""")
    Files.writeString(java.nio.file.Path.of(dir, "other.txt"), "ignored")
    // passes the page_*.json glob but has no page NUMBER: under ANSI
    // mode ''.cast(int) throws, so this must yield _page = null, not
    // fail the scan; same for an int-overflowing digit run
    Files.writeString(java.nio.file.Path.of(dir, "page_final.json"),
      """[{"id": 9, "name": "tail"}]""")
    Files.writeString(java.nio.file.Path.of(dir, "page_99999999999.json"),
      """[{"id": 10, "name": "huge"}]""")
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val df = PagedIngest.readPages(spark, dir, schema)
    assert(df.count() == 5)
    assert(df.filter(col("_page").isNull).select("id").collect()
      .map(_.getLong(0)).sorted.sameElements(Array(9L, 10L)))
    val pages = df.filter(col("_page").isNotNull)
    assert(pages.select("_page").distinct().collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2)))
    assert(PagedIngest.totalMatches(df, 5) && !PagedIngest.totalMatches(df, 4))
  }

  test("A13 permissive ingest: corrupt pages surface as _corrupt rows, good pages parse") {
    val dir = tmp()
    Files.writeString(java.nio.file.Path.of(dir, "page_0001.json"),
      """[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]""")
    Files.writeString(java.nio.file.Path.of(dir, "page_0002.json"),
      """{"id": 3, "name": TRUNCATED GARBAGE""")
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    // Spark disallows projecting ONLY the corrupt column from raw JSON
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN): materialize the full rows once
    val rows = PagedIngest.readPagesPermissive(spark, dir, schema).collect()
    val (bad, good) = rows.partition(r => r.getAs[String]("_corrupt") != null)
    assert(good.map(_.getAs[Long]("id")).sorted.sameElements(Array(1L, 2L)))
    assert(bad.length == 1 && bad(0).getAs[Int]("_page") == 2,
      "the corrupt page must be identifiable for re-fetch")
    assert(bad(0).getAs[String]("_corrupt").contains("GARBAGE"))
  }

  test("A14 retry: flaky call succeeds, non-retriable surfaces, retries exhaust") {
    var calls = 0
    val out = RateLimited.withRetry(maxRetries = 3, sleep = _ => ()) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("503") else "ok"
    }
    assert(out == "ok" && calls == 3)

    intercept[IllegalArgumentException] {
      RateLimited.withRetry(maxRetries = 3, sleep = _ => (),
        isRetriable = !_.isInstanceOf[IllegalArgumentException]) { () =>
        throw new IllegalArgumentException("400")
      }
    }

    var n = 0
    intercept[RuntimeException] {
      RateLimited.withRetry(maxRetries = 2, sleep = _ => ()) { () =>
        n += 1; throw new RuntimeException("always")
      }
    }
    assert(n == 3) // initial + 2 retries
  }

  test("A14 rate-limited mapPartitions body paces calls") {
    val t0 = System.nanoTime()
    val out = RateLimited.mapRateLimited(Iterator(1, 2, 3), minIntervalMs = 30)(_ * 2).toList
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out == List(2, 4, 6))
    assert(elapsedMs >= 60, s"3 calls at 30ms spacing took ${elapsedMs}ms") // 2 waits
  }

  test("A13 parseTotalPages: explicit 共N頁 wins, record-count estimates, floor of 1") {
    import graft.sources.PagedIngest.parseTotalPages
    assert(parseTotalPages("共 12 頁") == 12)
    assert(parseTotalPages("顯示1到10,共95記錄") == 10)  // ceil(95/10)
    assert(parseTotalPages("顯示1到10,共95記錄 共 3 頁") == 3) // explicit wins
    assert(parseTotalPages("no pager text here") == 1)
    assert(parseTotalPages("共100記錄", pageSize = 25) == 4)
    assert(parseTotalPages("顯示1到10,共1,234記錄") == 124) // thousands separator
    assert(parseTotalPages("共 99999999999999 頁") == Int.MaxValue) // clamp, no throw
  }

  test("Layout.writeSorted: output files carry disjoint, internally sorted key ranges") {
    val dir = tmp()
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("l_partkey"),
        org.apache.spark.sql.functions.col("l_orderkey"))
    graft.io.Layout.writeSorted(li, Seq("l_partkey"), nFiles = 4, outPath = dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    val ranges = files.map { f =>
      val keys = spark.read.parquet(f.getAbsolutePath)
        .select("l_partkey").collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), s"${f.getName} not sorted within file")
      (keys.min, keys.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"file ranges overlap: hi=$hi lo=$lo — data skipping impossible")
      case _ =>
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("Layout.writeZOrdered: a 2-D predicate prunes files on BOTH keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two decorrelated keys: a linear sort on x leaves every file
    // spanning all of y, so only the z-order layout can prune both
    val df = (0 until 1024).map(x => (x.toLong, (x.toLong * 37) % 1024)).toDF("x", "y")
    val zDir = tmp(); val linDir = tmp()
    graft.io.Layout.writeZOrdered(df, "x", "y", nFiles = 16, outPath = zDir)
    graft.io.Layout.writeSorted(df, Seq("x"), nFiles = 16, outPath = linDir)
    def ranges(dir: String): Array[((Long, Long), (Long, Long))] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map { f =>
          val rows = spark.read.parquet(f.getAbsolutePath)
            .select(col("x"), col("y")).collect()
          val xs = rows.map(_.getLong(0)); val ys = rows.map(_.getLong(1))
          ((xs.min, xs.max), (ys.min, ys.max))
        }
    // files whose stats range overlaps a narrow slab [lo, hi) in one dim
    def overlapping(rs: Array[((Long, Long), (Long, Long))],
                    dim: Int, lo: Long, hi: Long): Int =
      rs.count { case ((xlo, xhi), (ylo, yhi)) =>
        val (l, h) = if (dim == 0) (xlo, xhi) else (ylo, yhi)
        l < hi && h >= lo
      }
    val z = ranges(zDir); val lin = ranges(linDir)
    assert(z.length == 16 && lin.length == 16)
    // the x-sorted layout prunes x but spans all of y in EVERY file
    assert(overlapping(lin, 0, 100, 164) <= 3)
    assert(overlapping(lin, 1, 100, 164) == 16, "linear layout cannot prune on y")
    // the z-order layout prunes BOTH: a 1/16-wide slab in either
    // dimension touches ~sqrt(16)=4 of 16 files (block-diagonal
    // curve chunks; margin for sampled range boundaries)
    assert(overlapping(z, 0, 100, 164) <= 8, s"x slab hit ${overlapping(z, 0, 100, 164)}/16 files")
    assert(overlapping(z, 1, 100, 164) <= 8, s"y slab hit ${overlapping(z, 1, 100, 164)}/16 files")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(zDir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(linDir))
  }
}
