package graft

import graft.operators.Curation
import graft.streaming.EventStream

/** D15 noveltyAdmitBatch: sequential admission semantics on closed-form
  * batches — the archive grows only by ADMITTED docs' new hashes, later
  * batches are gated against it, replay is idempotent at both crash
  * points. */
class NoveltyAdmitSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val Tau = 0.5

  private def refHashes(texts: Seq[String]) =
    Curation.seenWindowHashes(
      texts.zipWithIndex.map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text"),
      "text", K)

  private def put(dir: String, ref: org.apache.spark.sql.DataFrame,
                  rows: Seq[(Long, String)], id: Long): Unit =
    EventStream.noveltyAdmitBatch(dir, ref, "doc_id", "text", k = K, tau = Tau)(
      rows.toDF("doc_id", "text"), id)

  private def verdicts(dir: String): Map[Long, (Long, Long, Double, Boolean, Long)] =
    EventStream.readAllVerdicts(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"), r.getAs[Boolean]("admitted"),
          r.getAs[Long]("batch_id"))))
      .toMap

  test("admitted docs gate later batches; rejected docs leave no trace in the archive") {
    val dir = tempDir("graft_nov_admit")
    val ref = refHashes(Seq("a b c d e"))
    // batch 0: doc 1 verbatim ref copy (novelty 0, rejected),
    //          doc 2 disjoint (novelty 1, admitted)
    put(dir, ref, Seq((1L, "a b c d e"), (2L, "x y z w")), 0L)
    // batch 1: doc 3 copies ADMITTED doc 2 -> rejected by the archive
    //          (the signal the batch form cannot see);
    //          doc 4 copies REJECTED doc 1 -> still measured vs ref only
    //          (rejected docs never entered the archive), 0 -> rejected;
    //          doc 5 fresh -> admitted
    put(dir, ref, Seq((3L, "x y z w"), (4L, "a b c d e"), (5L, "p q r s")), 1L)
    val got = verdicts(dir)
    assert(got(1L) == ((3L, 0L, 0.0, false, 0L)), s"got $got")
    assert(got(2L) == ((2L, 2L, 1.0, true, 0L)), s"got $got")
    assert(got(3L) == ((2L, 0L, 0.0, false, 1L)), s"got $got")
    assert(got(4L) == ((3L, 0L, 0.0, false, 1L)), s"got $got")
    assert(got(5L) == ((2L, 2L, 1.0, true, 1L)), s"got $got")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("within-batch blindness is defined semantics: identical novel docs both admit") {
    val dir = tempDir("graft_nov_twin")
    val ref = refHashes(Seq("a b c d e"))
    put(dir, ref, Seq((1L, "m n o p"), (2L, "m n o p")), 0L)
    val got = verdicts(dir)
    assert(got(1L)._4 && got(2L)._4, s"both same-batch twins admit: $got")
    // but the SECOND batch seeing the same text is gated
    put(dir, ref, Seq((3L, "m n o p")), 1L)
    assert(!verdicts(dir)(3L)._4)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("partial novelty crosses tau inclusively; sub-k docs are absent") {
    val dir = tempDir("graft_nov_tau")
    val ref = refHashes(Seq("a b c d"))
    // doc 1: windows {abc(seen), bcd(seen), cde, def} -> 2/4 = 0.5 >= tau: admit
    // doc 2: one token, no windows -> absent from verdicts
    put(dir, ref, Seq((1L, "a b c d e f"), (2L, "q")), 0L)
    val got = verdicts(dir)
    assert(got(1L) == ((4L, 2L, 0.5, true, 0L)), s"got $got")
    assert(!got.contains(2L), s"sub-k doc must be absent: $got")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("compaction folds seen+verdict dirs below the newest batch and changes no answer") {
    val dir = tempDir("graft_nov_compact")
    val ref = refHashes(Seq("a b c d e"))
    put(dir, ref, Seq((1L, "x y z w")), 0L)       // admitted
    put(dir, ref, Seq((2L, "p q r s")), 1L)       // admitted
    put(dir, ref, Seq((3L, "j k l m")), 2L)       // admitted
    val before = verdicts(dir)
    assert(EventStream.compactSeen(spark, dir, nFiles = 2))
    assert(verdicts(dir) == before)
    def names(sub: String) = Option(new java.io.File(s"$dir/$sub").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    // 0 and 1 folded into one segment; the newest stays plain (its
    // crash replay must see the world it committed against)
    assert(names("seen") == Set("0-1", "2"), s"seen: ${names("seen")}")
    assert(names("verdicts") == Set("0-1", "2"), s"verdicts: ${names("verdicts")}")
    // a later batch still gates through the segment
    put(dir, ref, Seq((4L, "x y z w")), 3L)
    assert(!verdicts(dir)(4L)._4, "batch-0 admission must gate through the compacted segment")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("replay is idempotent: committed batches return, a crash before the seen commit re-derives identically") {
    val dir = tempDir("graft_nov_replay")
    val ref = refHashes(Seq("a b c d e"))
    put(dir, ref, Seq((1L, "x y z w")), 0L)
    put(dir, ref, Seq((2L, "x y z w")), 1L)
    val before = verdicts(dir)
    // committed replay: a changed payload must be IGNORED (the batch
    // already ran to completion durably)
    put(dir, ref, Seq((2L, "totally different text")), 1L)
    assert(verdicts(dir) == before)
    // crash replay: seen/1 never committed -> batch 1 re-runs against
    // the same prior archive and re-lands byte-identical verdicts
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/seen/1"))
    put(dir, ref, Seq((2L, "x y z w")), 1L)
    assert(verdicts(dir) == before)
    assert(new java.io.File(s"$dir/seen/1/_SUCCESS").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
