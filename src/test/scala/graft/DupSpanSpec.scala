package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** C30 duplicate-span detection + scrub (Lee et al. substring dedup):
  * sliding-window hash semantics on hand-crafted docs where the
  * expected intervals are known exactly. */
class DupSpanSpec extends SparkSpec {
  import spark.implicits._

  // a 10-token passage embedded mid-document in two different docs at
  // DIFFERENT alignments — the case disjoint-chunk dedup misses
  private val passage = "the shared quoted passage repeats verbatim across both documents here"
  private val docs = Seq(
    (1L, s"alpha beta gamma $passage tail one two"),
    (2L, s"x $passage y z w v u t"),
    (3L, "an entirely unrelated document with its own words only right")
  ).toDF("doc_id", "text")

  test("C30: shared passage found at any alignment, merged to one maximal interval per doc") {
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: passage tokens occupy positions 3..12 (10 tokens); the six
    // 5-token windows starting at 3..8 overlap-merge into [3, 12]
    // doc 2: same passage at positions 1..10 -> [1, 10]
    assert(spans == Set((1L, 3L, 12L), (2L, 1L, 10L)), s"got $spans")
  }

  test("C30: within-doc repetition does not count toward minDocs (distinct docs)") {
    val selfRep = Seq(
      (7L, "again and again and again and again and again and again"),
      (8L, "totally different content that shares nothing with the other")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(selfRep, "doc_id", "text", k = 4, minDocs = 2).isEmpty)
  }

  test("C30b: scrub removes exactly the covered tokens, keeps every doc, order intact") {
    val out = Dedup.scrubDuplicateSpans(docs, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "alpha beta gamma tail one two")
    assert(out(2L) == "x y z w v u t")
    assert(out(3L) == "an entirely unrelated document with its own words only right")
    // fully-duplicated docs survive as empty rows (keep-the-row posture)
    val twins = Seq((1L, passage), (2L, passage)).toDF("doc_id", "text")
    val scrubbed = Dedup.scrubDuplicateSpans(twins, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrubbed == Map(1L -> "", 2L -> ""))
  }

  test("C30: randomized corpus matches a brute-force span computation exactly") {
    // tiny vocabulary forces genuine cross-doc k-gram collisions
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rnd = new scala.util.Random(20260813L)
    val corpus = (0L until 40L).map { id =>
      id -> Vector.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val k = 3; val minDocs = 2
    def brute: Set[(Long, Long, Long, Long)] = {
      val wins = corpus.flatMap { case (id, t) =>
        t.split("\\s+").filter(_.nonEmpty).sliding(k).zipWithIndex
          .collect { case (w, p) if w.length == k => (id, p, w.mkString(" ")) }
      }
      val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= minDocs).keySet
      wins.filter(w => dup(w._3)).groupBy(_._1).flatMap { case (id, ws) =>
        val starts = ws.map(_._2).sorted
        val islands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
        var (s, e, n) = (starts.head, starts.head + k - 1, 1)
        starts.tail.foreach { p =>
          if (p <= e + 1) { e = math.max(e, p + k - 1); n += 1 }
          else { islands += ((s, e, n)); s = p; e = p + k - 1; n = 1 }
        }
        islands += ((s, e, n))
        islands.map { case (a, b, c) => (id, a.toLong, b.toLong, c.toLong) }
      }.toSet
    }
    val got = Dedup.duplicateSpans(corpus.toDF("doc_id", "text"), "doc_id", "text",
        k = k, minDocs = minDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute, s"diff: extra=${got -- brute} missing=${brute -- got}")
    graft.util.CacheRegistry.releaseAll()
  }

  test("C31: survivor selection picks the highest score per cluster, ties to lowest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L)).toDF("doc_id", "cluster")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (9L, 1L)).toDF("doc_id", "score")
    val out = Dedup.canonicalPerCluster(clusters, scores, "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // cluster 1: docs 2 and 3 tie at 9 -> lowest id (2) wins; singleton 9 survives
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 9L -> true), out)
  }

  test("C32: training shuffle is a complete, collision-free, deterministic permutation") {
    val a = graft.operators.TextDemos.trainingShuffle(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(a.length == docs, "every doc gets a slot")
    assert(a.map(x => (x._2, x._3)).distinct.length == a.length, "(shard, pos) is unique")
    // pos is dense 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    val b = graft.operators.TextDemos.trainingShuffle(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b), "same seed, same order")
    // and it is not the identity order: ids sorted by (shard, pos) differ
    // from plain id order somewhere
    val shuffled = a.sortBy(x => (x._2, x._3)).map(_._1)
    assert(!shuffled.sameElements(shuffled.sorted), "order is actually permuted")
  }

  test("C30: detect plan is hash-join + window island merge, no string self-join") {
    val plan = Dedup.duplicateSpans(docs, "doc_id", "text", k = 5, minDocs = 2)
      .queryExecution.optimizedPlan.toString
    // duplicate detection joins 8-byte hashes; the window strings never
    // reach a join condition (they reduce to `h` before the shuffle)
    val joins = plan.linesIterator.filter(_.contains("Join ")).toSeq
    assert(joins.nonEmpty && joins.forall(l => l.contains("h#") && !l.contains("w#")),
      s"join should be on the window hash only:\n${joins.mkString("\n")}")
    graft.util.CacheRegistry.releaseAll()
  }

  test("C30: detect never caches a corpus-scale intermediate (two-scan plan)") {
    // r6 verdict item 2: the per-token window set must not be persisted —
    // the plan re-derives it in a second scan instead of pinning a
    // corpus-sized cache. No InMemoryRelation anywhere; the input
    // relation is scanned exactly twice (detection + join-back).
    val qe = Dedup.duplicateSpans(docs, "doc_id", "text", k = 5, minDocs = 2)
      .queryExecution
    assert(!qe.optimizedPlan.toString.contains("InMemoryRelation"),
      "duplicateSpans must not persist any intermediate")
    val scans = qe.optimizedPlan.collectLeaves().size
    assert(scans == 2, s"expected the two-scan shape, got $scans leaves")
  }
}
