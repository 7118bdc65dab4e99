package graft

import graft.streaming.EventStream

/** Round-5 scale hygiene for the streaming sinks: snapshot retention
  * (upsertBatch) and signature/pairs archive compaction
  * (minhashDedupBatch) — a long stream must keep a BOUNDED directory
  * count, and replay safety must survive both. */
class StreamCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def dirs(path: String, pat: String): Seq[String] = {
    val fs = new java.io.File(path)
    Option(fs.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches(pat)).map(_.getName).toSeq
  }

  test("snapshot retention bounds the snapshot count; replay of the current epoch survives pruning") {
    val dir = tempDir("graft_retain")
    def batch(i: Int) = Seq((s"k$i", i.toLong)).toDF("k", "n")
    (0 to 4).foreach { i =>
      EventStream.upsertBatch(dir, Seq("k"), retainSnapshots = 2)(batch(i), i.toLong)
      assert(dirs(s"$dir/snapshots", "\\d+").size <= 2,
        s"after batch $i: ${dirs(s"$dir/snapshots", "\\d+")}")
    }
    assert(dirs(s"$dir/snapshots", "\\d+").toSet == Set("3", "4"))
    // state carried through every pruned merge
    def state() = EventStream.readLatestState(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state() == (0 to 4).map(i => s"k$i" -> i.toLong).toMap)
    // replay of the newest epoch needs snapshot 3 — retained by the >=2 floor
    EventStream.upsertBatch(dir, Seq("k"), retainSnapshots = 2)(batch(4), 4L)
    assert(state() == (0 to 4).map(i => s"k$i" -> i.toLong).toMap)
    // a retention floor below 2 would delete the replay anchor: rejected
    intercept[IllegalArgumentException] {
      EventStream.upsertBatch(dir, Seq("k"), retainSnapshots = 1)(batch(9), 9L)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("change-gated upsert: a no-delta batch writes no snapshot; a real delta still publishes") {
    val dir = tempDir("graft_upsert_gate")
    def put(rows: Seq[(String, Long)], id: Long): Unit =
      EventStream.upsertBatch(dir, Seq("k"), retainSnapshots = Int.MaxValue,
        publishIfChanged = true)(rows.toDF("k", "n"), id)
    put(Seq("a" -> 1L, "b" -> 2L), 0L)
    assert(dirs(s"$dir/snapshots", "\\d+") == Seq("0"))
    // batch 1 re-delivers state already present identically: no new
    // snapshot dir, pointer untouched (CHANGE_COUNT = 0 skip)
    put(Seq("a" -> 1L), 1L)
    assert(dirs(s"$dir/snapshots", "\\d+") == Seq("0"), "no-delta batch minted a snapshot")
    // replay of the skipped batch: deterministic re-skip
    put(Seq("a" -> 1L), 1L)
    assert(dirs(s"$dir/snapshots", "\\d+") == Seq("0"))
    // a changed value publishes, and later reads see it
    put(Seq("a" -> 9L), 2L)
    assert(dirs(s"$dir/snapshots", "\\d+").toSet == Set("0", "2"))
    val state = EventStream.readLatestState(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state == Map("a" -> 9L, "b" -> 2L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("signature archive compaction: bounded dirs, identical pairs, replay + future batches intact") {
    val dir = tempDir("graft_compact")
    val tA = "the quick brown fox jumps over the lazy dog again and again today"
    val tA2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val tB = "completely different words describing some other topic entirely here now"
    val tB2 = "completely different words describing some other topic entirely here too"
    val tC = "unrelated fresh content with nothing shared against anything else at all"
    def run(docs: Seq[Doc], id: Long): Unit =
      EventStream.minhashDedupBatch(dir, "doc_id", "text", minEstSim = 0.25)(
        docs.toDF(), id)
    def pairs() = EventStream.readAllPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    run(Seq(Doc(10, tA), Doc(20, tB)), 0L)
    run(Seq(Doc(5, tA2)), 1L)
    run(Seq(Doc(99, tB2)), 2L)
    run(Seq(Doc(7, tC)), 3L)
    val before = pairs()
    assert(before == Set((5L, 10L), (20L, 99L)), s"got $before")
    assert(dirs(s"$dir/signatures", "\\d+").size == 4)

    // compact: everything below the newest batch coalesces to one segment
    assert(EventStream.compactSignatures(spark, dir, nFiles = 2))
    assert(dirs(s"$dir/signatures", ".*").toSet == Set("0-2", "3"),
      s"got ${dirs(s"$dir/signatures", ".*")}")
    assert(dirs(s"$dir/pairs", ".*").toSet == Set("0-2", "3"))
    assert(pairs() == before, "compaction must not change the recorded pairs")
    // an immediate re-compaction has nothing to coalesce
    assert(!EventStream.compactSignatures(spark, dir))

    // a replay of a COVERED batch is recognized as committed and skipped
    run(Seq(Doc(5, tA2)), 1L)
    assert(pairs() == before)

    // crash replay of the NEWEST (uncompacted) epoch still works: its
    // signature dir is lost mid-write, the re-run checks the compacted
    // index and rewrites identical output
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/signatures/3"))
    run(Seq(Doc(7, tC)), 3L)
    assert(pairs() == before)
    assert(new java.io.File(s"$dir/signatures/3/_SUCCESS").exists())

    // the compacted index serves future batches: near-dups of a
    // compacted doc (10/5 in the segment) AND of the plain dir's doc (7)
    run(Seq(Doc(42, tC + " extra"),
            Doc(33, "the quick brown fox jumps over the lazy dog again and again forever")), 4L)
    assert(pairs().contains((7L, 42L)), s"got ${pairs()}")
    assert(pairs().exists(p => p._2 == 33L && (p._1 == 5L || p._1 == 10L)),
      s"got ${pairs()}")

    // second sweep widens the segment and sweeps the old one
    assert(EventStream.compactSignatures(spark, dir, nFiles = 2))
    assert(dirs(s"$dir/signatures", ".*").toSet == Set("0-3", "4"),
      s"got ${dirs(s"$dir/signatures", ".*")}")

    // crash-path sweep: a compaction that died between its segment
    // commit and its member deletes leaves covered dirs behind —
    // simulate the leftover (a committed plain dir inside the segment
    // range) and assert the next compaction call sweeps it even though
    // there is nothing new to coalesce
    val leftover = new java.io.File(s"$dir/signatures/2")
    leftover.mkdirs()
    new java.io.File(leftover, "_SUCCESS").createNewFile()
    assert(!EventStream.compactSignatures(spark, dir)) // nothing to coalesce...
    assert(!leftover.exists(), "covered leftover dir must be swept")
    assert(dirs(s"$dir/signatures", ".*").toSet == Set("0-3", "4"))
    assert(pairs().contains((7L, 42L)), "sweep must not touch live data")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("gap batch ids: a new id inside a compacted segment's range still runs and survives sweeps") {
    val dir = tempDir("graft_gapid")
    val tA = "the quick brown fox jumps over the lazy dog again and again today"
    val tA2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val tB = "completely different words describing some other topic entirely here now"
    val tB2 = "completely different words describing some other topic entirely here too"
    val tC = "unrelated fresh content with nothing shared against anything else at all"
    def run(docs: Seq[Doc], id: Long): Unit =
      EventStream.minhashDedupBatch(dir, "doc_id", "text", minEstSim = 0.25)(
        docs.toDF(), id)
    def pairs() = EventStream.readAllPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batches 0, 5, 9 (gaps are legal — ids only need to be unique)
    run(Seq(Doc(10, tA)), 0L)
    run(Seq(Doc(20, tC)), 5L)
    run(Seq(Doc(30, tC + " indeed")), 9L)
    assert(EventStream.compactSignatures(spark, dir, nFiles = 2))
    // the segment is named by its id RANGE (0-5) but carries only the
    // ids that actually ran
    assert(new java.io.File(s"$dir/signatures/0-5/_MEMBERS").exists())
    // id 7 never ran: inside the range, NOT a member — it must process,
    // not silently skip as a "replay". Its near-dups must surface
    // against the WHOLE committed archive: doc 10 sits in the compacted
    // segment, doc 30 in a plain batch with a HIGHER id — membership,
    // not id ordering, defines the index
    run(Seq(Doc(40, tA2), Doc(41, tC + " indeed also")), 7L)
    assert(pairs().contains((10L, 40L)), s"got ${pairs()}")
    assert(pairs().contains((30L, 41L)), s"gap batch must see higher-id batches: ${pairs()}")
    // the next compaction folds the gap id in as a member (7 extends
    // the range: segment 0-7), and the sweep keeps the pair set intact
    run(Seq(Doc(50, tB)), 3L)
    assert(EventStream.compactSignatures(spark, dir, nFiles = 2))
    def segs() = Option(new java.io.File(s"$dir/signatures").listFiles()).get
      .filter(f => f.getName.matches("\\d+-\\d+")).map(_.getName).toSet
    assert(segs() == Set("0-7"), s"got ${segs()}")
    assert(pairs().contains((10L, 40L)) && pairs().contains((30L, 41L)))
    // a true replay of a folded/committed gap id is skipped
    run(Seq(Doc(40, tA2), Doc(41, tC + " indeed also")), 7L)
    assert(pairs().contains((10L, 40L)))
    // an id strictly INSIDE the folded range (members {0,3,5,7} + new 6
    // still name 0-7): the same-name guard must SKIP the fold — never
    // overwrite a segment with a write that reads it — and leave the
    // new dir plain and live
    run(Seq(Doc(70, tB2)), 6L)
    assert(pairs().contains((50L, 70L)), s"inside-range id sees the archive: ${pairs()}")
    assert(!EventStream.compactSignatures(spark, dir, nFiles = 2))
    assert(new java.io.File(s"$dir/signatures/6/_SUCCESS").exists(),
      "inside-range gap dir stays plain, never lost")
    assert(pairs().contains((50L, 70L)))
    // once a later batch extends the range past hi, everything folds
    run(Seq(Doc(80, tA + " anew")), 12L)
    assert(EventStream.compactSignatures(spark, dir, nFiles = 2))
    assert(segs() == Set("0-9"), s"got ${segs()}")
    assert(pairs().contains((10L, 40L)) && pairs().contains((30L, 41L)) &&
      pairs().contains((50L, 70L)), s"got ${pairs()}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
