package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Packing}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("C47 chunk overlap matches a sliding-window reference; edges hold") {
    val rnd = new scala.util.Random(5)
    val docs = (1L to 25L).map { id =>
      val n = rnd.nextInt(30) // 0..29 tokens; size=8, stride=5
      (id, IndexedSeq.tabulate(n)(i => s"t${id}_$i"))
    }
    val out = Packing.chunkOverlap(
        docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text"),
        "doc_id", "text", size = 8, stride = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    val want = docs.flatMap { case (id, ts) =>
      Iterator.from(0).map(_ * 5).takeWhile(_ < ts.size).zipWithIndex.map {
        case (s, k) =>
          val chunk = ts.slice(s, s + 8)
          (id, k.toLong) -> (s.toLong, chunk.size.toLong, chunk.mkString(" "))
      }
    }.toMap
    assert(out == want)
    // a doc shorter than size yields exactly one whole-doc chunk;
    // tokenless docs yield none
    assert(docs.filter(d => d._2.nonEmpty && d._2.size <= 5)
      .forall(d => out((d._1, 0L))._3 == d._2.mkString(" ")))
    assert(!docs.filter(_._2.isEmpty).exists(d => out.keys.exists(_._1 == d._1)))
    // stride = size is disjoint full coverage
    val disjoint = Packing.chunkOverlap(
        Seq((1L, (1 to 20).map("w" + _).mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", size = 8, stride = 8)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(disjoint.toSeq.sorted == Seq((0L, 8L), (8L, 8L), (16L, 4L)))
  }

  test("C22 concat-and-chunk packing: spans, chunk ids, zero-token docs") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 950L), ("a", 3L, 0L), ("a", 4L, 2000L),
      ("b", 1L, 1024L), ("b", 2L, 1024L)
    ).toDF("shard", "doc_id", "toks")
    val out = Packing.sequencePack(docs, "shard", "doc_id", "toks", capacity = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // shard a: offsets 0,100,1050,1050 — doc 2 spans the 0/1 boundary
    assert(out(("a", 1L)) == ((0L, 0L, 0L, 1L)))
    assert(out(("a", 2L)) == ((100L, 0L, 1L, 2L)))      // straddles chunks 0-1
    assert(out(("a", 3L)) == ((1050L, 1L, 1L, 0L)))     // zero tokens: no span
    assert(out(("a", 4L)) == ((1050L, 1L, 2L, 2L)))
    // shard b: exact-capacity docs tile chunks 0 and 1
    assert(out(("b", 1L)) == ((0L, 0L, 0L, 1L)))
    assert(out(("b", 2L)) == ((1024L, 1L, 1L, 1L)))
  }

  test("C22 chunk occupancy conserves tokens and caps fill at capacity") {
    val docs = Seq(("a", 1L, 700L), ("a", 2L, 700L), ("a", 3L, 700L))
      .toDF("shard", "doc_id", "toks")
    val packed = Packing.sequencePack(docs, "shard", "doc_id", "toks", capacity = 1024)
    val occ = Packing.chunkOccupancy(packed, "shard", capacity = 1024)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(occ.values.map(_._2).sum == 2100L)            // all tokens placed
    assert(occ.values.forall(_._2 <= 1024L))             // no chunk over capacity
    assert(occ(0L) == ((2L, 1024L)) && occ(2L) == ((1L, 52L))) // tail partial
  }

  test("C21 contamination: benchmark members read 1.0, disjoint docs 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),     // dup of benchmark doc
      (3L, "one two three four five six seven"),       // disjoint
      (4L, "alpha beta gamma nine ten eleven twelve")  // partial overlap
    ).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 1L)
    val out = Dedup.contaminationCheck(docs, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((1.0, true)) && out(2L) == ((1.0, true)))
    assert(out(3L) == ((0.0, false)))
    assert(out(4L)._1 > 0.0 && out(4L)._1 < 1.0) // only 'alpha beta gamma' shared
  }

  // ---- C118 span_corrupt ---------------------------------------------

  private def md560(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** plain-Scala mirror of the block-gridded span-corruption algebra */
  private def refSpanCorrupt(id: Long, text: String, grid: Int, maxMask: Int,
                             seed: Long): (Long, Long, String, String) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val n = toks.length
    val nb = (n + grid - 1) / grid
    def len(b: Int): Int =
      math.min(md560(s"$id#$b#$seed") % (maxMask + 1), (n - b * grid).toLong).toInt
    val masked = (0 until nb).filter(len(_) >= 1)
    val input = (0 until nb).flatMap { b =>
      val rest = toks.slice(b * grid + len(b), math.min(n, b * grid + grid))
      if (len(b) >= 1) s"<extra_id_${masked.indexOf(b)}>" +: rest else rest
    }.mkString(" ")
    val target = masked.zipWithIndex.flatMap { case (b, i) =>
      s"<extra_id_$i>" +: toks.slice(b * grid, b * grid + len(b))
    }.mkString(" ")
    (n.toLong, masked.map(len(_).toLong).sum, input, target)
  }

  test("C118 span corruption == plain-Scala reference on 120 random docs") {
    val rnd = new scala.util.Random(19)
    val docs = (1L to 120L).map { id =>
      // lengths 1..40 hit every partial-last-block shape at grid 7
      (id, IndexedSeq.tabulate(1 + rnd.nextInt(40))(i => s"w${id}_$i").mkString(" "))
    }
    val got = Packing.spanCorrupt(docs.toDF("doc_id", "text"),
        "doc_id", "text", grid = 7, maxMask = 3, seed = 17)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refSpanCorrupt(id, text, 7, 3, 17), s"doc $id: '$text'")
    }
  }

  test("C118 sentinel interleave round-trips to the original text") {
    val docs = (1L to 40L).map(id =>
      (id, (0 until 23).map(i => s"t$i").mkString(" ")))
    Packing.spanCorrupt(docs.toDF("doc_id", "text"), "doc_id", "text",
        grid = 5, maxMask = 2, seed = 3)
      .collect().foreach { r =>
      val (input, target) = (r.getString(3), r.getString(4))
      // parse the target into span k -> tokens, then substitute
      val spans = target.split("<extra_id_").filter(_.nonEmpty).map { part =>
        val Array(k, rest) = part.split(">", 2)
        k.toInt -> rest.trim
      }.toMap
      val rebuilt = "<extra_id_(\\d+)>".r.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(spans(m.group(1).toInt)))
        .replaceAll("  +", " ").trim
      assert(rebuilt == (0 until 23).map(i => s"t$i").mkString(" "),
        s"doc ${r.getLong(0)}")
    }
  }

  test("C118 mask rate sits near the analytic expectation") {
    // full blocks mask E[L] = mean(0..maxMask) of grid tokens
    val docs = (1L to 200L).map(id =>
      (id, (0 until 70).map(i => s"x$i").mkString(" "))) // 10 full blocks
    val out = Packing.spanCorrupt(docs.toDF("doc_id", "text"),
        "doc_id", "text", grid = 7, maxMask = 3, seed = 11)
      .agg(sum("n_masked"), sum("n_tokens")).collect()(0)
    val rate = out.getLong(0).toDouble / out.getLong(1)
    assert(math.abs(rate - 1.5 / 7) < 0.02, s"mask rate $rate")
  }
}
