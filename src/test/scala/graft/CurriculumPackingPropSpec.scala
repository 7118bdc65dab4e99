package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, Sampling}

/** C108/C110 property tests (r13 verdict task 7): the curriculum and
  * packing operators lean on cumsum/partial-offset integer algebra
  * whose boundary behavior already bit once (the n mod k ≥ 2 stage
  * offset, fixed post-hoc in 6df9ac7). Two layers of defense:
  *
  *  1. the OFFSET ALGEBRA at thousands of (n, k) shapes as pure
  *     arithmetic — every stage's start offset ⌈(s−1)·n/k⌉ must be
  *     exactly the count of ranks the slice formula ⌊(r−1)·k/n⌋+1
  *     assigns to earlier stages, for ALL n ≤ 240, k ≤ 12;
  *  2. the OPERATORS end-to-end against brute-force driver folds on
  *     randomized + adversarial corpora (ties, all-equal difficulty,
  *     n < k, zero-token docs, capacity 1, capacity ≥ corpus).
  */
class CurriculumPackingPropSpec extends SparkSpec {
  import spark.implicits._

  // ---- C108 layer 1: the stage/offset algebra, 2880 (n, k) shapes ----

  test("C108 stage slices and start offsets agree for every n <= 240, k <= 12") {
    var cases = 0
    (1 to 240).foreach { n =>
      (1 to 12).foreach { k =>
        val stages = (1 to n).map(r => ((r - 1).toLong * k / n) + 1)
        (1 to k).foreach { s =>
          val start = ((s - 1).toLong * n + k - 1) / k // ⌈(s−1)·n/k⌉
          assert(stages.count(_ < s) == start,
            s"n=$n k=$k stage $s: offset $start vs ${stages.count(_ < s)}")
        }
        // even spread: stage sizes differ by at most one
        val sizes = (1 to k).map(s => stages.count(_ == s))
        assert(sizes.max - sizes.min <= 1, s"n=$n k=$k sizes=$sizes")
        cases += 1
      }
    }
    assert(cases == 2880)
  }

  // ---- shared: the engine-portable 60-bit md5 the operators shuffle by ----

  private def md560(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  // ---- C108 layer 2: operator vs brute-force fold on adversarial shapes ----

  private def refCurriculum(rows: Seq[(Long, Long)], k: Int, seed: Long)
      : Map[Long, (Long, Long)] = {
    val n = rows.size
    val ranked = rows.sortBy { case (id, d) => (d, id) }.zipWithIndex
      .map { case ((id, d), i) => (id, d, (i.toLong * k / n) + 1) }
    ranked.groupBy(_._3).flatMap { case (stage, members) =>
      members.sortBy { case (id, _, _) => (md560(s"$id#$seed"), id) }
        .zipWithIndex.map { case ((id, _, _), j) => id -> (stage, j + 1L) }
    }
  }

  test("C108 curriculumOrder == brute fold on randomized + adversarial draws") {
    val rnd = new scala.util.Random(41)
    // adversarial shapes first: all-tied difficulty, n < k, n mod k in
    // {1, k-1}, singleton; then randomized draws
    val shapes = Seq((12, 4, true), (3, 7, false), (13, 4, false),
      (15, 4, false), (1, 3, false)) ++
      (1 to 20).map(_ => (1 + rnd.nextInt(60), 1 + rnd.nextInt(7), rnd.nextBoolean()))
    shapes.zipWithIndex.foreach { case ((n, k, tied), i) =>
      val seed = rnd.nextInt(100).toLong
      val rows = (1 to n).map(j =>
        (j.toLong, if (tied) 5L else rnd.nextInt(10).toLong))
      val want = refCurriculum(rows, k, seed)
      val got = Sampling.curriculumOrder(rows.toDF("doc_id", "d"), "doc_id",
          col("d"), nStages = k, seed = seed)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      assert(got == want, s"draw $i n=$n k=$k tied=$tied seed=$seed")
    }
  }

  // ---- C110: packingSweep vs brute-force fold ----

  private def refSweep(rows: Seq[(String, Long, Long)], c: Int)
      : (Long, Long, Long, Long, Long, Long) = {
    // (n_docs, total_tokens, n_chunks, docs_split, crossings, tail_waste)
    var docs = 0L; var toks = 0L; var chunks = 0L
    var splits = 0L; var crossings = 0L
    rows.groupBy(_._1).foreach { case (_, members) =>
      var off = 0L
      members.sortBy(_._2).foreach { case (_, _, t) =>
        docs += 1; toks += t
        if (t > 0) {
          val first = off / c; val last = (off + t - 1) / c
          if (last > first) { splits += 1; crossings += last - first }
        }
        off += t
      }
      chunks += (off + c - 1) / c
    }
    (docs, toks, chunks, splits, crossings, chunks * c - toks)
  }

  test("C110 packingSweep == brute fold on randomized + adversarial draws") {
    val rnd = new scala.util.Random(43)
    // adversarial: zero-token docs, all-zero shard, capacity 1,
    // capacity >= corpus; then randomized
    val fixed = Seq(
      (Seq(("a", 1L, 0L), ("a", 2L, 5L), ("a", 3L, 0L), ("b", 1L, 0L)), Seq(1, 3, 100)),
      (Seq(("a", 1L, 7L)), Seq(7, 8, 6)))
    val draws = fixed ++ (1 to 12).map { _ =>
      val nShards = 1 + rnd.nextInt(3)
      val rows = (1 to 5 + rnd.nextInt(30)).map(j =>
        (s"s${rnd.nextInt(nShards)}", j.toLong, rnd.nextInt(20).toLong))
      (rows, Seq(1 + rnd.nextInt(30), 1 + rnd.nextInt(30)).distinct)
    }
    draws.zipWithIndex.foreach { case ((rows, caps), i) =>
      val df = rows.toDF("shard", "ord", "toks")
      val got = Packing.packingSweep(df, "shard", "ord", "toks", caps)
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6))).toMap
      caps.foreach { c =>
        assert(got(c) == refSweep(rows, c), s"draw $i capacity $c")
      }
    }
  }

  test("C110 fill_rate is exactly total/(chunks*capacity) rounded 6") {
    val rows = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("b", 1L, 3L))
    val out = Packing.packingSweep(rows.toDF("shard", "ord", "toks"),
        "shard", "ord", "toks", Seq(8))
      .collect()(0)
    // shard a: 14 toks -> 2 chunks; shard b: 3 toks -> 1 chunk
    assert(out.getLong(3) == 3L) // n_chunks
    assert(out.getDouble(7) ==
      BigDecimal(17.0 / 24.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
