package graft

import org.apache.spark.sql.functions._

/** A12's wrapped publish as a DSv2 sink (`graft-wrapped`): layout +
  * content parity with the wrappedFrame contract, the sink-declared
  * clustering (RequiresDistributionAndOrdering), commit-protocol
  * atomicity on failure, overwrite/append semantics, and input
  * validation. */
class WrappedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def sampleDf = Seq(
    ("north", 1L, "alice", 1.5), ("south", 2L, "bob", 2.5),
    ("north", 3L, "carol", 3.5), ("west", 4L, "dan", 4.5),
    ("south", 5L, "erin", 5.5), ("north", 6L, "frank", 6.5)
  ).toDF("county", "id", "name", "score")

  private def readWrapped(dir: String) = {
    val schema = "county string, total long, rows array<struct<id:long,name:string,score:double>>"
    spark.read.schema(schema).json(s"$dir/*.json")
  }

  test("A12 DSv2 sink: per-group wrapped files from ROUND-ROBIN input (sink plans its own shuffle)") {
    val dir = tempDir("wrapped_sink")
    // repartition(5) scatters every group across partitions — if the
    // sink's declared clustering were not enforced, two partitions
    // would emit the same group file and the driver commit would
    // refuse the duplicate. Success here IS the distribution proof.
    sampleDf.repartition(5).write.format("graft-wrapped")
      .option("groupCol", "county").mode("append").save(dir)
    val files = new java.io.File(dir).list().sorted.toSeq
    assert(files.filter(_.endsWith(".json")) == Seq("north.json", "south.json", "west.json"))
    assert(files.contains("_SUCCESS"))
    assert(!files.exists(_.startsWith("_temporary")), files)
    val back = readWrapped(dir).orderBy("county").collect()
    assert(back.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("north", 3L), ("south", 2L), ("west", 1L)))
    // row content parity with the wrappedFrame contract (sets: intra-
    // group order is the shuffle's, not part of the contract)
    val northRows = back(0).getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(northRows == Set((1L, "alice", 1.5), (3L, "carol", 3.5), (6L, "frank", 6.5)))
    // _SUCCESS manifest lists the group files
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_SUCCESS")), "UTF-8").trim.split("\n").toSeq
    assert(manifest == Seq("north.json", "south.json", "west.json"))
  }

  test("A12 DSv2 sink: overwrite truncates atomically; append onto an existing group refuses") {
    val dir = tempDir("wrapped_over")
    sampleDf.write.format("graft-wrapped")
      .option("groupCol", "county").mode("append").save(dir)
    // re-publishing the same groups without overwrite must refuse
    val e = intercept[Exception] {
      sampleDf.write.format("graft-wrapped")
        .option("groupCol", "county").mode("append").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("overwrite")), msgs(e))
    // overwrite with a DIFFERENT group set: old group files must be gone
    sampleDf.filter(col("county") =!= "west").write.format("graft-wrapped")
      .option("groupCol", "county").mode("overwrite").save(dir)
    val files = new java.io.File(dir).list().filter(_.endsWith(".json")).sorted.toSeq
    assert(files == Seq("north.json", "south.json"), files)
    assert(readWrapped(dir).count() == 2)
  }

  test("A12 DSv2 sink: a failing task aborts the job without touching the final layout") {
    val dir = tempDir("wrapped_abort")
    sampleDf.write.format("graft-wrapped")
      .option("groupCol", "county").mode("append").save(dir)
    val before = new java.io.File(dir).list().sorted.toSeq
    // a poisoned row detonates mid-write, after other groups' temp
    // files may already exist — the published layout must not change
    // and no temp debris may survive the abort
    val poisoned = sampleDf.withColumn("name",
      when(col("name") === "erin", raise_error(lit("boom"))).otherwise(col("name")))
    intercept[Exception] {
      poisoned.write.format("graft-wrapped")
        .option("groupCol", "county").mode("overwrite").save(dir)
    }
    val after = new java.io.File(dir).list().sorted.toSeq
    assert(after == before, s"layout changed: $before -> $after")
    assert(readWrapped(dir).count() == 3, "previous publish still reads back whole")
  }

  test("A12 DSv2 sink: append keeps prior groups in the manifest; null vs literal \"__null__\"; NaN stays valid JSON") {
    val dir = tempDir("wrapped_edge")
    sampleDf.write.format("graft-wrapped")
      .option("groupCol", "county").mode("append").save(dir)
    // appending a DISJOINT group must not erase prior manifest entries
    Seq(("east", 9L, "zed", Double.NaN)).toDF("county", "id", "name", "score")
      .write.format("graft-wrapped").option("groupCol", "county")
      .mode("append").save(dir)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_SUCCESS")), "UTF-8").trim.split("\n").toSeq
    assert(manifest == Seq("east.json", "north.json", "south.json", "west.json"), manifest)
    // NaN serialized QUOTED: strict JSON parsers accept the file
    val east = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "east.json")), "UTF-8")
    assert(east.contains("\"score\": \"NaN\""), east)
    val parsed = spark.read.json(s"$dir/east.json")
    assert(!parsed.columns.contains("_corrupt_record"), parsed.columns.toSeq)
    // a null group and a doc whose group is literally the STRING
    // "__null__" are different groups: distinct files, no silent merge
    val dir2 = tempDir("wrapped_nullstr")
    Seq((Option.empty[String], 1L), (Option("__null__"), 2L), (Option.empty[String], 3L))
      .toDF("grp", "v").write.format("graft-wrapped")
      .option("groupCol", "grp").mode("append").save(dir2)
    val files2 = new java.io.File(dir2).list().filter(_.endsWith(".json")).sorted.toSeq
    assert(files2.size == 2, files2)
    assert(files2.contains("__null__.json"))
    val litFile = files2.filterNot(_ == "__null__.json").head
    assert(litFile.startsWith("__null__-"), s"literal string must hash-disambiguate: $litFile")
    val nullObj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir2, "__null__.json")), "UTF-8")
    assert(nullObj.contains("\"grp\": null") && nullObj.contains("\"total\": 2"), nullObj)
    val litObj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir2, litFile)), "UTF-8")
    assert(litObj.contains("\"grp\": \"__null__\"") && litObj.contains("\"total\": 1"), litObj)
  }

  test("A12 DSv2 sink streaming: per-epoch snapshots, current pointer, retention") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tempDir("wrapped_stream")
    val ckpt = tempDir("wrapped_stream_ckpt")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val agg = ms.toDF.toDF("county", "v").groupBy("county")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val q = agg.writeStream.format("graft-wrapped")
      .option("groupCol", "county").option("retain", "2")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start(dir)
    try {
      ms.addData(("north", 1L), ("south", 2L)); q.processAllAvailable()
      ms.addData(("north", 3L)); q.processAllAvailable()
      ms.addData(("west", 4L)); q.processAllAvailable()
    } finally q.stop()
    // three epochs published, retain=2 keeps the newest two committed
    val snaps = new java.io.File(dir, "snapshots").list().sorted.toSeq
    assert(snaps.size == 2, snaps)
    assert(snaps.forall(n => new java.io.File(s"$dir/snapshots/$n/_SUCCESS").exists()))
    // the current pointer names the newest snapshot
    val ptr = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "current")), "UTF-8").trim
    assert(ptr == snaps.last, s"pointer $ptr vs ${snaps.last}")
    // complete-mode republish: the pointed snapshot carries ALL state
    val schema = "county string, total long, rows array<struct<n:long,s:long>>"
    val cur = spark.read.schema(schema).json(s"$dir/snapshots/$ptr/*.json")
      .orderBy("county").collect()
    assert(cur.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("north", 1L), ("south", 1L), ("west", 1L)))
    val north = cur(0).getSeq[org.apache.spark.sql.Row](2).head
    assert(north.getLong(0) == 2L && north.getLong(1) == 4L, north) // n=2 rows, sum=1+3
    // no temp debris
    assert(!new java.io.File(dir, "_temporary").exists())
  }

  test("A12 DSv2 sink streaming: a replayed epoch is a no-op — the first commit wins") {
    import org.apache.spark.sql.types._
    val dir = tempDir("wrapped_replay")
    spark.range(1).count() // ensure an active session for the sink's conf capture
    val schema = new StructType().add("grp", StringType).add("v", LongType)
    val w = new graft.io.WrappedJsonWrite(dir, schema, "grp", "q1", false)
    val sw = w.toStreaming
    def stageTemp(content: String): String = {
      val t = java.nio.file.Paths.get(dir, "_temporary/q1/ep7/p0-t0-g.json")
      java.nio.file.Files.createDirectories(t.getParent)
      java.nio.file.Files.write(t, content.getBytes("UTF-8"))
      t.toString
    }
    val first = stageTemp("""{"grp": "g", "total": 1, "rows": [{"v": 1}]}""")
    sw.commit(7L, Array(graft.io.WrappedCommit(Seq(first -> "g.json"))))
    val snap = new java.io.File(dir, "snapshots").list().head
    val out = java.nio.file.Paths.get(dir, s"snapshots/$snap/g.json")
    val committed = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    // recovery replays epoch 7 with DIFFERENT bytes: must be ignored
    val replay = stageTemp("""{"grp": "g", "total": 99, "rows": []}""")
    sw.commit(7L, Array(graft.io.WrappedCommit(Seq(replay -> "g.json"))))
    assert(new String(java.nio.file.Files.readAllBytes(out), "UTF-8") == committed,
      "replayed epoch must not overwrite the committed snapshot")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_temporary/q1/ep7")),
      "replay temps are swept")
    assert(new java.io.File(dir, "snapshots").list().length == 1)
  }

  test("A12 DSv2 sink: null + unsafe group values, option and schema validation") {
    val dir = tempDir("wrapped_names")
    Seq((Option("a/b"), 1L), (Option.empty[String], 2L), (Option("ok"), 3L))
      .toDF("grp", "v").write.format("graft-wrapped")
      .option("groupCol", "grp").mode("append").save(dir)
    val files = new java.io.File(dir).list().filter(_.endsWith(".json")).sorted.toSeq
    assert(files.contains("ok.json"))
    assert(files.contains("__null__.json"))
    // "a/b" sanitizes with a disambiguating hash, never a subdirectory
    assert(files.exists(f => f.startsWith("a_b-") && f.endsWith(".json")), files)
    assert(!new java.io.File(dir, "a").exists())
    val nullObj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "__null__.json")), "UTF-8")
    assert(nullObj.contains("\"grp\": null"), nullObj)
    // missing groupCol and nested columns are named in the refusal
    val e1 = intercept[Exception] {
      sampleDf.write.format("graft-wrapped").mode("append").save(tempDir("wrapped_e1"))
    }
    assert(e1.getMessage.contains("groupCol"), e1.getMessage)
    val e2 = intercept[Exception] {
      sampleDf.withColumn("nested", array(col("id")))
        .write.format("graft-wrapped").option("groupCol", "county")
        .mode("append").save(tempDir("wrapped_e2"))
    }
    assert(e2.getMessage.contains("nested"), e2.getMessage)
  }
}
