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
